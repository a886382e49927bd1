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


@functools.lru_cache(maxsize=None)
def _h2v2_color_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ye_ref, yo_ref, cbn_ref, cbf_ref, crn_ref, crf_ref, out_ref):
        # ye/yo: uint8 [TR, Wc] luma at even/odd output columns
        # c*n/c*f: uint8 [TR, Wc] chroma near/far rows (pre-gathered verticals)
        # out: uint8 [6, TR, Wc] — (channel, parity) planar pairs; the caller
        # interleaves columns in XLA (lane-dim shape casts don't lower in
        # Mosaic, and the color math is per-pixel so parity split is free).
        def h2(near, far):
            # H2V2 horizontal taps (/root/reference/src/upsampler.rs:215-227)
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
            return even - 128, odd - 128

        cb_e, cb_o = h2(cbn_ref[:], cbf_ref[:])
        cr_e, cr_o = h2(crn_ref[:], crf_ref[:])
        c1402, c0344, c0714, c1772 = 1470104, 360857, 748830, 1858077

        def cl(v):
            return jnp.clip(v >> 20, 0, 255).astype(jnp.int32).astype(jnp.uint8)

        for p, (y_ref, cb, cr) in enumerate(
                [(ye_ref, cb_e, cr_e), (yo_ref, cb_o, cr_o)]):
            yy = y_ref[:].astype(jnp.int32) * (1 << 20) + (1 << 19)
            out_ref[0 + p, :, :] = cl(yy + c1402 * cr)
            out_ref[2 + p, :, :] = cl(yy - c0344 * cb - c0714 * cr)
            out_ref[4 + p, :, :] = cl(yy + c1772 * cb)

    return kernel


def fused_h2v2_ycbcr_pallas(y_plane, cb_plane, cr_plane, out_h: int, out_w: int,
                            chroma_h: int, chroma_w: int, row_tile: int = 256,
                            interpret: bool = False, v_mode: str = "v2"):
    """Fused 4:2:0 / 4:2:2 tail: H2Vx chroma upsample + BT.601 color as one
    Pallas kernel over output row tiles. Returns planar uint8 [3, out_h, out_w]
    (the decode-to-device layout; models consume planar directly).

    v_mode "v2": the V2 vertical near/far pairs are materialized by XLA with
    the gather-free repeat/shift formulation. v_mode "v1" (4:2:2 H2V1): the
    vertical pass is identity, and feeding near == far makes the kernel's
    triangle taps collapse EXACTLY to the H2V1 formula —
    t = 4c ⇒ (3t + t_prev + 8) >> 4 == (3c + c_prev + 2) >> 2, edges
    included (`/root/reference/src/upsampler.rs:134-163` vs `:191-228`).
    Bit-exact vs the reference taps either way.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    hc, wc = chroma_h, chroma_w

    def near_far(p):
        p2 = p[:hc, :wc]
        if v_mode == "v1":
            near = p2[:out_h]
            return near, near
        near = jnp.repeat(p2, 2, axis=0)[:out_h]
        down = jnp.concatenate([p2[:1], p2[:-1]], axis=0)
        up = jnp.concatenate([p2[1:], p2[-1:]], axis=0)
        far = jnp.stack([down, up], axis=1).reshape(2 * hc, wc)[:out_h]
        return near, far

    cbn, cbf = near_far(cb_plane)
    crn, crf = near_far(cr_plane)

    # Luma split by output-column parity (strided slices are XLA's job).
    y = y_plane[:out_h, :2 * wc]
    if y.shape[1] < 2 * wc:
        y = jnp.concatenate(
            [y, jnp.zeros((out_h, 2 * wc - y.shape[1]), y.dtype)], axis=1)
    ye, yo = y[:, 0::2], y[:, 1::2]

    # Pad rows to the tile.
    h_pad = -(-out_h // row_tile) * row_tile
    def pad(a):
        return jnp.concatenate(
            [a, jnp.zeros((h_pad - a.shape[0],) + a.shape[1:], a.dtype)], axis=0)
    ye, yo, cbn, cbf, crn, crf = map(pad, (ye, yo, cbn, cbf, crn, crf))

    grid = (h_pad // row_tile,)
    spec = pl.BlockSpec((row_tile, wc), lambda i: (i, 0))
    out = pl.pallas_call(
        _h2v2_color_kernel(),
        grid=grid,
        in_specs=[spec] * 6,
        out_specs=pl.BlockSpec((6, row_tile, wc), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((6, h_pad, wc), jnp.uint8),
        interpret=interpret,
    )(ye, yo, cbn, cbf, crn, crf)

    # XLA-side column interleave of the (even, odd) pairs per channel.
    out = out[:, :out_h, :]
    chans = [
        jnp.stack([out[2 * c], out[2 * c + 1]], axis=-1).reshape(out_h, 2 * wc)
        for c in range(3)
    ]
    return jnp.stack(chans, axis=0)[:, :, :out_w]


def pallas_tail_mode(geometry):
    """Fully-Pallas planar tail support: "420" (H2V2 chroma), "422" (H2V1
    chroma), "gray" (single component, crop only), or None."""
    from .color import ColorTransform

    comps = geometry.components
    if len(comps) == 1 and geometry.transform is None \
            and comps[0].dct_scale == 8:
        return "gray"
    if (len(comps) == 3
            and geometry.transform == ColorTransform.YCBCR
            and all(c.dct_scale == 8 for c in comps)
            and comps[0].upsampler_mode == "h1v1"
            and comps[1].upsampler_mode == comps[2].upsampler_mode):
        if comps[1].upsampler_mode == "h2v2":
            return "420"
        if comps[1].upsampler_mode == "h2v1":
            return "422"
    return None


def is_420_ycbcr(geometry) -> bool:
    """Back-compat predicate: any geometry the Pallas planar tail covers."""
    return pallas_tail_mode(geometry) is not None


def reconstruct_planar_pallas(geometry, stores, qts, interpret=None):
    """Planar reconstruction with the Pallas tail: MXU IDCT kernel per
    component, then the fused H2Vx-upsample + color kernel (4:2:0 / 4:2:2) or
    a plain crop (grayscale). Traceable under jit; the decode-to-device
    layout for model consumers."""
    from .idct import blocks_to_plane

    mode = pallas_tail_mode(geometry)
    assert mode is not None
    if interpret is None:
        import jax
        interpret = jax.default_backend() != "tpu"  # interpret off-TPU (tests)
    comps = geometry.components
    planes = []
    for comp, store, qt in zip(comps, stores, qts):
        pixels = dequantize_and_idct_blocks_pallas(store, qt, interpret=interpret)
        import jax.numpy as jnp
        planes.append(blocks_to_plane(pixels, comp.blocks_wide,
                                      comp.blocks_high, xp=jnp))
    if mode == "gray":
        comp = comps[0]
        return planes[0][:comp.size_height, :comp.size_width]
    chroma = comps[1]
    return fused_h2v2_ycbcr_pallas(
        planes[0], planes[1], planes[2],
        geometry.out_height, geometry.out_width,
        chroma.size_height, chroma.size_width, interpret=interpret,
        v_mode="v1" if mode == "422" else "v2")


def dequantize_and_idct_blocks_pallas(dense, qt, interpret: bool = False):
    """Pallas dequant+IDCT: int16 [N, 64] + uint16[64] -> uint8 [N, 8, 8].

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
    m = jnp.asarray(_IDCT_M64_T)

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

    return out[:n].reshape(n, 8, 8)
