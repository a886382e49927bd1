"""Pallas TPU kernels for the reconstruction hot path.

The XLA-compiled pipeline already fuses well; these kernels exist to (a) own
the exact tiling/fusion of the hottest op — dequantize + IDCT over every block
of a component as MXU matmuls with the dequantize and the round/bias/clamp
epilogue fused in VMEM — and (b) serve as the foundation for deeper fusions
(plane assembly + upsample + color) in later rounds.

Enabled via `use_pallas=True` on the fast-precision path (or the
default on TPU backends, JPEG_TPU_USE_PALLAS=0 opts out); bit-identical to the jnp fast
path on TPU up to MXU f32 matmul accumulation (same contract).
"""

from __future__ import annotations

import functools

import numpy as np

from .idct import _IDCT_M64_T

BLOCK_TILE = 1024  # blocks per grid step: [1024, 64] tiles feed the MXU well


@functools.lru_cache(maxsize=None)
def _kernel_fn():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def dequant_idct_kernel(dense_ref, qt_ref, m_ref, out_ref):
        # dense_ref: int16 [T, 64] natural-order coefficients (VMEM)
        # qt_ref:    float32 [1, 64] dequantization row (VMEM)
        # m_ref:     float32 [64, 64] IDCT basis, coef -> pixel (VMEM)
        # out_ref:   uint8 [T, 64] pixel block rows (VMEM)
        s = dense_ref[:].astype(jnp.float32) * qt_ref[:]
        y = jax.lax.dot_general(
            s, m_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        clipped = jnp.clip(jnp.floor(y + jnp.float32(128.5)), 0, 255)
        # Mosaic has no direct f32->u8 cast; hop through int32.
        out_ref[:] = clipped.astype(jnp.int32).astype(jnp.uint8)

    return dequant_idct_kernel


def _tail_color(jnp, transform: str, chans):
    """Per-tile color math on int32 channel planes (0..255 range). Mirrors
    ops/color.py::color_convert_image exactly (same x2^20 constants/rounding,
    `/root/reference/src/decoder.rs:1391-1474`). Returns uint8 planes."""
    def cl20(v):
        return jnp.clip(v >> 20, 0, 255).astype(jnp.int32).astype(jnp.uint8)

    def u8(v):
        return v.astype(jnp.int32).astype(jnp.uint8)

    if transform == "ycbcr" or transform == "ycck":
        c1402, c0344, c0714, c1772 = 1470104, 360857, 748830, 1858077
        yy = chans[0] * (1 << 20) + (1 << 19)
        cb = chans[1] - 128
        cr = chans[2] - 128
        rgb = [cl20(yy + c1402 * cr),
               cl20(yy - c0344 * cb - c0714 * cr),
               cl20(yy + c1772 * cb)]
        if transform == "ycck":
            # `/root/reference/src/decoder.rs:1439-1456`: YCbCr on the first
            # three channels, K inverted.
            rgb.append(u8(255 - chans[3]))
        return rgb
    if transform == "cmyk":
        # Inverted Adobe (`/root/reference/src/decoder.rs:1458-1474`).
        return [u8(255 - c) for c in chans]
    raise AssertionError(transform)


@functools.lru_cache(maxsize=None)
def _fused_tail_kernel(kinds: tuple, transform: str, h2: bool, kw: int = 0):
    """Kernel over one row tile: per-component upsample + color conversion.

    kinds[i]: "full" (component already at output resolution) or "up"
    (vertical near/far row pair supplied; triangle taps applied in-kernel).
    h2=True: the horizontal resolution doubles for "up" components — the
    kernel computes output-column parity pairs (lane-dim interleave is XLA's
    job); "full" components then arrive pre-split by column parity.
    h2=False: all components share one horizontal resolution.

    kw > 0: input refs may be WIDER than the output (uncropped component
    planes — TPU block specs demand lane dims equal the array's); each is
    lane-sliced to kw in VMEM, an offset-0 slice that costs nothing. This
    keeps the column crop out of XLA, where slicing a u8 plane's lane dim
    forces a full-array HBM retiling (+1.09 ms/large_image, round 4).

    Feeding near == far collapses the vertical taps to identity exactly
    ((4c + 2) >> 2 == c), which is how V1 modes reuse the V2 kernel; the
    same identity collapses the H2 triangle taps to the reference's H2V1
    formula (t = 4c ⇒ (3t + t_prev + 8) >> 4 == (3c + c_prev + 2) >> 2,
    edges included; `/root/reference/src/upsampler.rs:134-163` vs `:191-228`).
    """
    import jax.numpy as jnp

    def ld(ref):
        return ref[:, :kw] if kw and ref.shape[1] != kw else ref[:]

    def h2taps(near, far):
        # H2V2 horizontal taps (/root/reference/src/upsampler.rs:215-227),
        # returning (even, odd) output-column planes, 0..255.
        t = 3 * near.astype(jnp.int32) + far.astype(jnp.int32)
        t_prev = jnp.concatenate([t[:, :1], t[:, :-1]], axis=1)
        t_next = jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)
        even = (3 * t + t_prev + 8) >> 4
        odd = (3 * t + t_next + 8) >> 4
        # Edge samples use the quarter-weight formula.
        first = (t[:, :1] + 2) >> 2
        last = (t[:, -1:] + 2) >> 2
        even = jnp.concatenate([first, even[:, 1:]], axis=1)
        odd = jnp.concatenate([odd[:, :-1], last], axis=1)
        return even, odd

    def kernel(*refs):
        out_ref = refs[-1]
        idx = 0
        if h2:
            pairs = []
            for kind in kinds:
                a, b = refs[idx], refs[idx + 1]
                idx += 2
                if kind == "full":
                    pairs.append((ld(a).astype(jnp.int32),
                                  ld(b).astype(jnp.int32)))
                else:
                    pairs.append(h2taps(ld(a), ld(b)))
            for p in (0, 1):
                outs = _tail_color(jnp, transform, [pr[p] for pr in pairs])
                for c, o in enumerate(outs):
                    out_ref[2 * c + p, :, :] = o
        else:
            chans = []
            for kind in kinds:
                if kind == "full":
                    chans.append(ld(refs[idx]).astype(jnp.int32))
                    idx += 1
                else:
                    n, f = refs[idx], refs[idx + 1]
                    idx += 2
                    # V2 vertical triangle taps
                    # (/root/reference/src/upsampler.rs:166-188).
                    chans.append(
                        (3 * ld(n).astype(jnp.int32) + ld(f).astype(jnp.int32)
                         + 2) >> 2)
            outs = _tail_color(jnp, transform, chans)
            for c, o in enumerate(outs):
                out_ref[c, :, :] = o

    return kernel


def fused_tail_pallas(planes, comp_modes, chroma_dims, transform: str,
                      out_h: int, out_w: int, row_tile: int = 256,
                      interpret: bool = False):
    """Fused upsample + color tail over output row tiles. `planes` are the
    assembled component planes; comp_modes[i] in {"h1v1","h1v2","h2v1",
    "h2v2"}; chroma_dims = (hc, wc) shared by every subsampled component
    (None when all are full-res). Returns planar uint8 [C_out, out_h, out_w].

    V2 vertical near/far pairs are materialized by XLA with the gather-free
    repeat/shift formulation; V1/identity modes feed near == far (see
    _fused_tail_kernel for the exactness argument). Bit-exact vs the
    reference taps + ops/color.py math for every mode combination.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    h2 = any(m in ("h2v1", "h2v2") for m in comp_modes)
    kinds = tuple("up" if (h2 and m.startswith("h2")) or m == "h1v2" else "full"
                  for m in comp_modes)
    hc, wc = chroma_dims if chroma_dims is not None else (out_h, out_w)
    full_w = 2 * wc if h2 else out_w

    # Column crops happen in the pallas_call's input DMA (block width kw
    # over wider arrays), never as a jnp minor-dim slice: slicing a u8
    # plane's lane dimension forces a full-array relayout (measured
    # +1.09 ms/large_image — the single largest recon cost, round 4).
    # Only row ops (major-dim, free) and the h2 parity split stay in XLA.
    def near_far(p, v2: bool):
        p2 = p[:hc]
        if not v2:
            near = p2[:out_h]
            return near, near
        near = jnp.repeat(p2, 2, axis=0)[:out_h]
        down = jnp.concatenate([p2[:1], p2[:-1]], axis=0)
        up = jnp.concatenate([p2[1:], p2[-1:]], axis=0)
        far = jnp.stack([down, up], axis=1).reshape(2 * hc, -1)[:out_h]
        return near, far

    def full_res(p):
        p = p[:out_h]
        if h2:
            if p.shape[1] < full_w:
                p = jnp.concatenate(
                    [p, jnp.zeros((out_h, full_w - p.shape[1]), p.dtype)],
                    axis=1)
            # Column-parity split (strided slices are XLA's job); pad the odd
            # half when full_w is odd.
            return p[:, 0::2], p[:, 1::2]
        return (p,)

    inputs = []
    for plane, mode, kind in zip(planes, comp_modes, kinds):
        if kind == "full":
            inputs.extend(full_res(plane))
        else:
            inputs.extend(near_far(plane, mode.endswith("v2")))

    h_pad = -(-out_h // row_tile) * row_tile

    def pad(a):
        return jnp.concatenate(
            [a, jnp.zeros((h_pad - a.shape[0],) + a.shape[1:], a.dtype)],
            axis=0)

    inputs = [pad(a) for a in inputs]
    kw = wc if h2 else out_w
    n_out = len(planes) * (2 if h2 else 1)

    grid = (h_pad // row_tile,)
    # Per-input block widths span each FULL (possibly wider-than-kw) array —
    # TPU block specs demand the lane dim divide 128 or equal the array's —
    # and the kernel lane-slices to kw in VMEM (see _fused_tail_kernel.ld).
    in_specs = [pl.BlockSpec((row_tile, int(a.shape[1])), lambda i: (i, 0))
                for a in inputs]
    out = pl.pallas_call(
        _fused_tail_kernel(kinds, transform, h2, kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_out, row_tile, kw), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_out, h_pad, kw), jnp.uint8),
        interpret=interpret,
    )(*inputs)

    out = out[:, :out_h, :]
    if not h2:
        return out[:, :, :out_w]
    # XLA-side column interleave of the (even, odd) pairs per channel.
    chans = [
        jnp.stack([out[2 * c], out[2 * c + 1]], axis=-1).reshape(out_h, 2 * wc)
        for c in range(len(planes))
    ]
    return jnp.stack(chans, axis=0)[:, :, :out_w]


def fused_h2v2_ycbcr_pallas(y_plane, cb_plane, cr_plane, out_h: int, out_w: int,
                            chroma_h: int, chroma_w: int, row_tile: int = 256,
                            interpret: bool = False, v_mode: str = "v2"):
    """Fused 4:2:0 / 4:2:2 YCbCr tail (the original hot path, now a
    fused_tail_pallas instance)."""
    mode = "h2v2" if v_mode == "v2" else "h2v1"
    return fused_tail_pallas(
        (y_plane, cb_plane, cr_plane), ("h1v1", mode, mode),
        (chroma_h, chroma_w), "ycbcr", out_h, out_w, row_tile=row_tile,
        interpret=interpret)


_TAIL_TRANSFORMS = {"YCbCr": "ycbcr", "CMYK": "cmyk", "YCCK": "ycck"}


def pallas_tail_mode(geometry):
    """Fully-Pallas planar tail support. Returns "gray" (single component,
    crop only), "stack" (RGB / full-res raw interleave: no kernel needed,
    the planar layout is the IDCT output itself), "fused" (the
    upsample+color kernel covers it), or None (XLA fallback)."""
    from .color import ColorTransform

    comps = geometry.components
    if len(comps) == 1 and geometry.transform is None:
        return "gray"
    if geometry.transform == ColorTransform.RGB \
            and all(c.upsampler_mode == "h1v1" for c in comps):
        return "stack"
    name = getattr(geometry.transform, "value", None)
    transform = _TAIL_TRANSFORMS.get(name)
    if transform is None:
        return None
    if any(c.upsampler_mode not in ("h1v1", "h1v2", "h2v1", "h2v2")
           for c in comps):
        return None
    # All subsampled components must share one chroma geometry, and mixing
    # h2 with h1v2 would give the "full" components two different parity
    # layouts — reject to the XLA tail.
    h2 = any(c.upsampler_mode.startswith("h2") for c in comps)
    sub_dims = set()
    for c in comps:
        if c.upsampler_mode != "h1v1":
            if h2 and c.upsampler_mode == "h1v2":
                return None
            sub_dims.add((c.size_height, c.size_width))
    if len(sub_dims) > 1:
        return None
    return "fused"


def is_420_ycbcr(geometry) -> bool:
    """Back-compat predicate: any geometry the Pallas planar tail covers."""
    return pallas_tail_mode(geometry) is not None


def reconstruct_planar_pallas(geometry, stores, qts, interpret=None):
    """Planar reconstruction with the Pallas tail: MXU IDCT kernel per
    component, then the fused upsample + color kernel (YCbCr / CMYK / YCCK,
    any H1/H2 x V1/V2 chroma) or a plain crop (grayscale, RGB 4:4:4).
    Traceable under jit; the decode-to-device layout for model consumers."""
    import jax.numpy as jnp

    from .idct import blocks_to_plane

    mode = pallas_tail_mode(geometry)
    assert mode is not None
    if interpret is None:
        import jax
        interpret = jax.default_backend() != "tpu"  # interpret off-TPU (tests)
    comps = geometry.components
    planes = []
    for comp, store, qt in zip(comps, stores, qts):
        pixels = dequantize_and_idct_blocks_pallas(
            store, qt, interpret=interpret, scale=comp.dct_scale)
        planes.append(blocks_to_plane(pixels, comp.blocks_wide,
                                      comp.blocks_high, xp=jnp))
    if mode == "gray":
        comp = comps[0]
        return planes[0][:comp.size_height, :comp.size_width]
    if mode == "stack":
        return jnp.stack(
            [p[:geometry.out_height, :geometry.out_width] for p in planes],
            axis=0)
    chroma_dims = None
    for comp in comps:
        if comp.upsampler_mode != "h1v1":
            chroma_dims = (comp.size_height, comp.size_width)
            break
    return fused_tail_pallas(
        planes, tuple(c.upsampler_mode for c in comps), chroma_dims,
        _TAIL_TRANSFORMS[geometry.transform.value],
        geometry.out_height, geometry.out_width, interpret=interpret)


@functools.lru_cache(maxsize=None)
def _basis_padded(scale: int) -> np.ndarray:
    """IDCT basis as a [64, 64] matrix regardless of scale: for scale < 8
    the scaled_idct_basis columns are zero-padded so the kernel keeps one
    shape (the MXU runs the same 64x64 matmul either way; callers slice the
    first scale*scale pixel columns)."""
    if scale == 8:
        return _IDCT_M64_T
    from .idct import scaled_idct_basis
    m = np.zeros((64, 64), np.float32)
    m[:, :scale * scale] = scaled_idct_basis(scale)
    return m


def dequantize_and_idct_blocks_pallas(dense, qt, interpret: bool = False,
                                      scale: int = 8):
    """Pallas dequant+IDCT: int16 [N, 64] + uint16[64] -> uint8
    [N, scale, scale]. scale < 8 runs the Dugad-Ahuja linearization
    (fast-tier contract, see ops/idct.py::scaled_idct_basis).

    N is padded to the block tile internally; callers pass any N.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = dense.shape[0]
    n_pad = -(-n // BLOCK_TILE) * BLOCK_TILE
    if n_pad != n:
        dense = jnp.concatenate(
            [dense, jnp.zeros((n_pad - n, 64), jnp.int16)], axis=0)

    qt_row = qt.astype(jnp.float32).reshape(1, 64)
    m = jnp.asarray(_basis_padded(scale))

    grid = (n_pad // BLOCK_TILE,)
    out = pl.pallas_call(
        _kernel_fn(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_TILE, 64), lambda i: (i, 0)),
            pl.BlockSpec((1, 64), lambda i: (0, 0)),
            pl.BlockSpec((64, 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_TILE, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 64), jnp.uint8),
        interpret=interpret,
    )(dense, qt_row, m)

    return out[:n, :scale * scale].reshape(n, scale, scale)
