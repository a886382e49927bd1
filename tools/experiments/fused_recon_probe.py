#!/usr/bin/env python
"""Feasibility probe for a single fused recon kernel (round 4): stores
[nb, 64] -> final planar [3, H, W] u8 in ONE pallas_call (HWC minor-dim-3 out blocks crash the remote Mosaic compiler), removing the two
XLA materializations (blocks_to_plane transpose ~ +1.1 ms, HWC output)
between the assembly gather and the pixels.

The open question is the in-VMEM cost of the block->raster shuffle
(y [284, 64] -> (8, 2272)) that Mosaic must run per grid step. Stages:

  P0  copy-through kernel (read [1,284,64] i16 x3, write (8,2268,3) u8
      WITHOUT the shuffle — DMA + convert floor)
  P1  P0 + IDCT matmul per comp (f32 MXU, no shuffle: writes garbage order)
  P2  P1 + the shuffle (reshape/swapaxes to raster order) + color = the
      REAL fused recon candidate, output exact vs the XLA recon
  X   current XLA recon from the same stores (reference cost)

All in chained fori_loops over device-resident stores.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from jpeg_decoder_tpu.models.stream import stage_host_bits
    from jpeg_decoder_tpu.ops.color import ycbcr_to_rgb
    from jpeg_decoder_tpu.ops.idct import _IDCT_M64_T, blocks_to_plane
    from jpeg_decoder_tpu.ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)

    assert jax.default_backend() == "tpu", jax.default_backend()
    data = open("/root/reference/benches/large_image.jpg", "rb").read()
    st = stage_host_bits(data)
    g = st.geometry
    bh, bw = g.components[0].blocks_high, g.components[0].blocks_wide
    H, W = g.out_height, g.out_width
    Wp = bw * 8
    qts = [np.asarray(q, np.float32) for q in st.qts]

    from jpeg_decoder_tpu.decoder import Decoder
    d = Decoder(data, backend="numpy")
    d._decode_entropy_only()
    stores = [np.asarray(d._pending_render[i][0], np.int16).reshape(bh, bw, 64)
              for i in range(3)]
    sa = [jax.device_put(s) for s in stores]
    sb = [jax.device_put(s) for s in stores]
    basis = jnp.asarray(_IDCT_M64_T)  # [64, 64]
    qt_rows = [jnp.asarray(q.reshape(1, 64)) for q in qts]

    C1, C2, C3, C4 = 1470104, 360857, 748830, 1858077

    def make_kernel(stage: int):
        def kernel(y_ref, cb_ref, cr_ref, qt_ref, basis_ref, o_ref):
            outs = []
            for ci, ref in enumerate((y_ref, cb_ref, cr_ref)):
                s = ref[0].astype(jnp.float32)          # [284, 64]
                if stage >= 1:
                    # HIGHEST keeps the MXU f32 path full-precision (the
                    # fast-tier exactness contract, see ops/idct.py).
                    s = jax.lax.dot(
                        s * qt_ref[ci, :].reshape(1, 64), basis_ref[...],
                        precision=jax.lax.Precision.HIGHEST)
                    px = jnp.clip(jnp.floor(s + jnp.float32(128.5)), 0, 255)
                else:
                    px = jnp.clip(s, 0, 255)
                if stage >= 2:
                    # block->raster: [284(b), 64(h*8+w)] -> (8, 2272).
                    # i32 + sublane count padded to x8 (288) — the f32
                    # rank-3 swapaxes spelling crashes the remote Mosaic
                    # compiler at this shape.
                    pi = px.astype(jnp.int32)
                    bw8 = -(-bw // 8) * 8
                    if bw8 != bw:
                        pi = jnp.concatenate(
                            [pi, jnp.zeros((bw8 - bw, 64), jnp.int32)],
                            axis=0)
                    pi = pi.reshape(bw8, 8, 8).swapaxes(0, 1)
                    px = pi.reshape(8, bw8 * 8)[:, :W]
                else:
                    # no shuffle: the first 8 block rows as a stand-in
                    px = px[:8, :1] + jnp.zeros((8, W), px.dtype)
                outs.append(px.astype(jnp.int32))
            if stage >= 2:
                yy = outs[0] * (1 << 20) + (1 << 19)
                cbv = outs[1] - 128
                crv = outs[2] - 128
                rgb = [jnp.clip((yy + C1 * crv) >> 20, 0, 255),
                       jnp.clip((yy - C2 * cbv - C3 * crv) >> 20, 0, 255),
                       jnp.clip((yy + C4 * cbv) >> 20, 0, 255)]
            else:
                rgb = outs
            o_ref[...] = jnp.stack(
                [v.astype(jnp.uint8) for v in rgb], axis=0)
        return kernel

    qt_mat = jnp.asarray(np.stack(qts))     # [3, 64] f32
    basis_np = jnp.asarray(_IDCT_M64_T)

    def build(stage):
        in_spec = pl.BlockSpec((1, bw, 64), lambda r: (r, 0, 0))
        rep2 = pl.BlockSpec((3, 64), lambda r: (0, 0))
        rep3 = pl.BlockSpec((64, 64), lambda r: (0, 0))
        call = pl.pallas_call(
            make_kernel(stage),
            grid=(bh,),
            in_specs=[in_spec] * 3 + [rep2, rep3],
            out_specs=pl.BlockSpec((3, 8, W), lambda r: (0, r, 0)),
            out_shape=jax.ShapeDtypeStruct((3, bh * 8, W), jnp.uint8),
        )
        return lambda y, cb, cr: call(y, cb, cr, qt_mat, basis_np)

    def xla_recon(ss):
        from jpeg_decoder_tpu.ops.pallas_kernels import (
            dequantize_and_idct_blocks_pallas)
        planes = []
        for s, q, c in zip(ss, st.qts, g.components):
            px = dequantize_and_idct_blocks_pallas(
                s.reshape(-1, 64), jnp.asarray(q), scale=8)
            planes.append(blocks_to_plane(px, bw, bh, xp=jnp)[:H, :W])
        r, gg, b = ycbcr_to_rgb(*planes, xp=jnp)
        return jnp.stack([r, gg, b], axis=0)

    n = 48

    def chained(f):
        @jax.jit
        def run(aa, ab):
            def body(i, acc):
                ss = [jnp.where(i % 2 == 0, a, b) for a, b in zip(aa, ab)]
                return acc + f(ss).astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return run

    def floor_f(ss):
        return sum(s.astype(jnp.int32) for s in ss).astype(jnp.uint8)

    cases = [("floor(sum)", lambda ss: floor_f(ss))]
    for stage in (0, 1, 2):
        fn = build(stage)
        cases.append((f"P{stage}", lambda ss, fn=fn: fn(*ss)))
    cases.append(("X xla-recon", xla_recon))

    for name, f in cases:
        try:
            run = chained(f)
            int(jax.device_get(run(sa, sb)))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                int(jax.device_get(run(sa, sb)))
                best = min(best, (time.perf_counter() - t0) / n)
            print(f"{name}: {best * 1e3:6.2f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # Exactness: P2 output vs the host-oracle fast recon
    try:
        fn2 = build(2)
        got = np.asarray(jax.device_get(fn2(*sa)))[:, :H]
        ref = np.asarray(jax.device_get(xla_recon(sa)))
        diff = int(np.abs(got.astype(int) - ref.astype(int)).max())
        print("P2 vs XLA recon max |diff|:", diff, flush=True)
    except Exception as e:
        print("parity FAIL", type(e).__name__, str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
