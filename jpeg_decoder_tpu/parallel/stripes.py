"""MCU-row stripe parallelism: one large image sharded over the mesh.

The sequence-parallel analog for decode (SURVEY.md §2a/§5): the image's MCU
rows are split into contiguous stripes, one per device. Dequant+IDCT is purely
local; the only cross-stripe dependency is the V2 vertical chroma filter,
whose `row_far` can reach one plane row into the neighboring stripe
(`/root/reference/src/upsampler.rs:174-177`). That 1-row halo is exchanged
with `jax.lax.ppermute` over the "stripe" mesh axis (ICI traffic: one chroma
row per neighbor per component), after which upsample + color conversion are
local again. Output rows come back sharded by stripe.

Bit-exactness: every device evaluates the same integer filter taps over
globally-indexed near/far rows; padding stripes (when MCU rows don't divide
evenly) produce rows that are cropped off on the host.
"""

from __future__ import annotations

import functools

import numpy as np

from ..ops.color import color_convert_image
from ..ops.idct import blocks_to_plane, dequantize_and_idct_blocks
from ..ops.pipeline import ImageGeometry
from ..ops.upsample import (GENERIC, H1V1, H1V2, H2V1, H2V2, _h2_horizontal,
                            h1v2_combine, h2v2_combine)


def _shard_map():
    import jax
    if hasattr(jax, "shard_map"):
        return jax.shard_map
    from jax.experimental.shard_map import shard_map
    return shard_map


def _shard_map_uncheck_kwargs(shard_map):
    """Kwargs disabling shard_map's replication/VMA verifier, for bodies
    containing a pallas_call: pl.pallas_call builds its out avals from
    ShapeDtypeStructs that carry no `vma` annotation, which jax >= 0.7
    rejects at trace time under the default check_vma=True (observed on
    hardware; the CPU suite only traces the XLA mesh bodies). The kwarg
    was named check_rep before the VMA rework — probe the signature."""
    import inspect
    params = inspect.signature(shard_map).parameters
    if "check_vma" in params:
        return {"check_vma": False}
    if "check_rep" in params:
        return {"check_rep": False}
    return {}


def build_stripe_local_recon(geometry: ImageGeometry, mcu_rows: int,
                             n_stripes: int, stripe_axis: str = "stripe"):
    """Per-device reconstruction body for one MCU-row stripe: dequant+IDCT,
    1-row V2 chroma halo exchange (ppermute over `stripe_axis`), upsample,
    color. Must run inside shard_map over that axis. Returns
    local_fn(stores_tuple, qts_tuple) -> uint8 [R, out_w(, C)] where
    stores are per-component [k_mcu * v_i * blocks_wide, 64] int16 for this
    stripe. Shared by the store-level stripe pipeline (make_stripe_pipeline)
    and the stripe-sharded bits pipeline (parallel/stripe_bits.py), which
    fuses it behind the on-device entropy decode."""
    import jax.numpy as jnp
    from jax import lax

    comps = geometry.components
    # v_i = block rows per MCU row; derive from block grid vs MCU rows.
    k_mcu = -(-mcu_rows // n_stripes)            # MCU rows per stripe
    v = [c.blocks_high // mcu_rows for c in comps]
    v_max = max(v)
    scale = comps[0].dct_scale
    R = k_mcu * v_max * scale                    # output rows per stripe
    lp = [k_mcu * vi * scale for vi in v]        # local plane rows per component

    fwd = [(i, i + 1) for i in range(n_stripes - 1)]   # send down (recv from prev)
    bwd = [(i + 1, i) for i in range(n_stripes - 1)]   # send up (recv from next)

    def local_fn(stores, qts):
        d = lax.axis_index(stripe_axis)

        out_w = geometry.out_width
        channels = []
        for ci, (comp, store, qt) in enumerate(zip(comps, stores, qts)):
            pixels = dequantize_and_idct_blocks(store, qt, comp.dct_scale, xp=jnp)
            plane = blocks_to_plane(
                pixels, comp.blocks_wide, k_mcu * v[ci], xp=jnp)  # [lp, bw*scale]

            mode = comp.upsampler_mode
            iw = comp.size_width
            ih = comp.size_height

            if mode == H1V1:
                channels.append(plane[:R, :out_w])
            elif mode == H2V1:
                rows = plane[:R, :iw].astype(jnp.uint32)
                channels.append(_h2_horizontal(jnp, rows, iw)[:, :out_w].astype(jnp.uint8))
            elif mode in (H1V2, H2V2):
                # 1-row halo exchange over ICI.
                halo_top = lax.ppermute(plane[-1:, :], stripe_axis, fwd)
                halo_bot = lax.ppermute(plane[:1, :], stripe_axis, bwd)
                ext = jnp.concatenate([halo_top, plane, halo_bot], axis=0)

                r_g = d * R + jnp.arange(R)
                near_g = r_g // 2
                far_g = jnp.where(r_g % 2 == 0, near_g - 1, near_g + 1)
                far_g = jnp.clip(far_g, 0, ih - 1)
                base = d * lp[ci]
                near_l = jnp.clip(near_g - base + 1, 0, lp[ci] + 1)
                far_l = jnp.clip(far_g - base + 1, 0, lp[ci] + 1)

                width = out_w if mode == H1V2 else iw
                near_rows = ext[near_l, :width].astype(jnp.uint32)
                far_rows = ext[far_l, :width].astype(jnp.uint32)
                if mode == H1V2:
                    channels.append(h1v2_combine(jnp, near_rows, far_rows))
                else:
                    channels.append(
                        h2v2_combine(jnp, near_rows, far_rows, iw)[:, :out_w])
            else:  # GENERIC nearest-neighbor: vertically local by construction
                r_g = d * R + jnp.arange(R)
                src_l = r_g // comp.v_scale - d * lp[ci]
                gathered = plane[src_l, :iw]
                out = jnp.repeat(gathered, comp.h_scale, axis=-1)
                channels.append(out[:, :out_w])

        if geometry.transform is None:
            comp = comps[0]
            return channels[0]
        return color_convert_image(channels, geometry.transform, xp=jnp)

    return local_fn


@functools.lru_cache(maxsize=32)
def make_stripe_pipeline(geometry: ImageGeometry, mcu_rows: int, n_stripes: int,
                         mesh, stripe_axis: str = "stripe",
                         data_axis: str = None):
    """Compile the striped reconstruction.

    Expects per-component stores padded to `ceil(mcu_rows/n) * n` MCU rows.
    Returns fn(stores, qts) -> uint8 [n*R, W(, C)] sharded on rows, where
    R = stripe output rows.

    With `data_axis` set, inputs carry a leading batch dimension sharded over
    that mesh axis and each image's rows are striped over `stripe_axis` —
    batch DP and stripe SP composed in one program (halo ppermutes ride the
    stripe axis; the data axis needs no collectives).
    """
    import jax

    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)
    from jax.sharding import PartitionSpec as P

    comps = geometry.components
    recon = build_stripe_local_recon(geometry, mcu_rows, n_stripes,
                                     stripe_axis)

    def local_fn(*args):
        return recon(args[:len(comps)], args[len(comps):])

    shard_map = _shard_map()
    if data_axis is None:
        spec_in = tuple(P(stripe_axis) for _ in comps) + tuple(P() for _ in comps)
        mapped = shard_map(
            local_fn, mesh=mesh, in_specs=spec_in, out_specs=P(stripe_axis))
    else:
        # Batched: leading dim sharded over the data axis; per-image local_fn
        # vmapped over the local batch (collectives stay on the stripe axis).
        spec_in = (tuple(P(data_axis, stripe_axis) for _ in comps)
                   + tuple(P() for _ in comps))
        batched_local = jax.vmap(
            local_fn, in_axes=(0,) * len(comps) + (None,) * len(comps))
        mapped = shard_map(
            batched_local, mesh=mesh, in_specs=spec_in,
            out_specs=P(data_axis, stripe_axis))

    def run(stores, qts):
        return mapped(*stores, *qts)

    return jax.jit(run)


def decode_striped(geometry: ImageGeometry, stores, qts, mesh, mcu_rows: int,
                   stripe_axis: str = "stripe"):
    """Decode one image with its MCU rows sharded over `mesh`'s stripe axis.

    stores: list of np.int16 [blocks_high_i * blocks_wide_i, 64] (full grids).
    Returns np.uint8 image cropped to the geometry's output size.
    """
    n = mesh.shape[stripe_axis]
    k = -(-mcu_rows // n)
    comps = geometry.components

    padded = []
    for c, store in zip(comps, stores):
        vi = c.blocks_high // mcu_rows
        want_rows = k * n * vi
        blocks = np.asarray(store).reshape(c.blocks_high, c.blocks_wide, 64)
        if want_rows > c.blocks_high:
            pad = np.zeros((want_rows - c.blocks_high, c.blocks_wide, 64), np.int16)
            blocks = np.concatenate([blocks, pad], axis=0)
        padded.append(blocks.reshape(-1, 64))

    fn = make_stripe_pipeline(geometry, mcu_rows, n, mesh, stripe_axis)
    out = np.asarray(fn(tuple(padded), tuple(np.asarray(q) for q in qts)))

    if geometry.transform is None:
        comp = comps[0]
        return out[:comp.size_height, :comp.size_width]
    return out[:geometry.out_height]


def decode_striped_batch(geometry: ImageGeometry, stores_batched, qts, mesh,
                         mcu_rows: int, data_axis: str = "data",
                         stripe_axis: str = "stripe"):
    """Batch of same-geometry images, each striped: DP x SP in one program.

    stores_batched: list of np.int16 [B, blocks_high_i * blocks_wide_i, 64].
    Returns np.uint8 [B, ...] cropped to the geometry's output size.
    """
    n = mesh.shape[stripe_axis]
    k = -(-mcu_rows // n)
    comps = geometry.components

    padded = []
    for c, store in zip(comps, stores_batched):
        vi = c.blocks_high // mcu_rows
        want_rows = k * n * vi
        b = store.shape[0]
        blocks = np.asarray(store).reshape(b, c.blocks_high, c.blocks_wide, 64)
        if want_rows > c.blocks_high:
            pad = np.zeros((b, want_rows - c.blocks_high, c.blocks_wide, 64),
                           np.int16)
            blocks = np.concatenate([blocks, pad], axis=1)
        padded.append(blocks.reshape(b, -1, 64))

    fn = make_stripe_pipeline(geometry, mcu_rows, n, mesh, stripe_axis,
                              data_axis=data_axis)
    out = np.asarray(fn(tuple(padded), tuple(np.asarray(q) for q in qts)))

    if geometry.transform is None:
        comp = comps[0]
        return out[:, :comp.size_height, :comp.size_width]
    return out[:, :geometry.out_height]
