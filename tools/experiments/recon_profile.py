#!/usr/bin/env python
"""Profile the reconstruction tail (dequant/IDCT -> plane -> color) on real
TPU hardware, the stage the round-4 device-resident measurement exposed:
decode+assembly runs 4.85 ms/large_image but the full pipeline 16.4 ms, so
~11.6 ms hides in reconstruction that the async burst pipeline never showed.

Cumulative fori_loop stages (phase-immune: ONE dispatch, parity-alternated
device-resident inputs so XLA can't hoist):

  A  sum(stores)                      (loop floor)
  B  A + dequant+IDCT x3              (Pallas kernel, block pixels)
  C  B + blocks_to_plane x3           ([nb,8,8] u8 -> [H,W] transpose)
  D  C + YCbCr->RGB, interleaved      (production default: [H,W,3])
  E  C + YCbCr->RGB, planar stack     ([3,H,W] — no minor-dim-3 layout)
  F  full reconstruct_planar_pallas   (fused Pallas tail, layout=planar-pallas)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from jpeg_decoder_tpu.models.stream import stage_host_bits
    from jpeg_decoder_tpu.ops.color import ycbcr_to_rgb
    from jpeg_decoder_tpu.ops.idct import blocks_to_plane
    from jpeg_decoder_tpu.ops.pallas_kernels import (
        dequantize_and_idct_blocks_pallas, reconstruct_planar_pallas)
    from jpeg_decoder_tpu.ops.pipeline import _enable_compile_cache

    assert jax.default_backend() == "tpu", jax.default_backend()
    _enable_compile_cache(jax)
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/benches/large_image.jpg"
    data = open(path, "rb").read()

    st = stage_host_bits(data)
    g = st.geometry
    mpix = st.mpix
    # Host-decoded stores (numpy oracle) — this harness times recon only.
    from jpeg_decoder_tpu.decoder import Decoder
    d = Decoder(data, backend="numpy")
    d._decode_entropy_only()
    stores_np = [d._pending_render[i][0] for i in range(len(g.components))]
    qts = st.qts

    def put2(x):
        return jax.device_put(x), jax.device_put(x)

    sa, sb = zip(*[put2(np.asarray(s, np.int16).reshape(-1, 64))
                   for s in stores_np])

    def idct3(stores):
        return [dequantize_and_idct_blocks_pallas(
            s, jnp.asarray(q), scale=c.dct_scale)
            for s, q, c in zip(stores, qts, g.components)]

    def planes3(stores):
        return [blocks_to_plane(p, c.blocks_wide, c.blocks_high, xp=jnp)
                for p, c in zip(idct3(stores), g.components)]

    def crop3(stores):
        return [p[:g.out_height, :g.out_width] for p in planes3(stores)]

    def f_a(stores):
        return sum(s.astype(jnp.int32).sum() for s in stores)

    def f_b(stores):
        return sum(p.astype(jnp.int32).sum() for p in idct3(stores))

    def f_c(stores):
        return sum(p.astype(jnp.int32).sum() for p in planes3(stores))

    def f_d(stores):
        r, gg, b = ycbcr_to_rgb(*crop3(stores), xp=jnp)
        return jnp.stack([r, gg, b], axis=-1).astype(jnp.int32).sum()

    def f_e(stores):
        r, gg, b = ycbcr_to_rgb(*crop3(stores), xp=jnp)
        return jnp.stack([r, gg, b], axis=0).astype(jnp.int32).sum()

    def f_f(stores):
        out = reconstruct_planar_pallas(g, list(stores), qts)
        return out.astype(jnp.int32).sum()

    stages = [("A stores-sum", f_a), ("B +idct", f_b), ("C +plane", f_c),
              ("D +color HWC", f_d), ("E +color CHW", f_e),
              ("F planar-pallas", f_f)]

    n = 32

    def chained(f):
        @jax.jit
        def run(aa, ab):
            def body(i, acc):
                s = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(i % 2 == 0, a, b), aa, ab)
                return acc + f(tuple(s))
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return run

    fns = [(name, chained(f)) for name, f in stages]
    results = []
    for name, fn in fns:
        try:
            int(jax.device_get(fn(sa, sb)))  # warm/compile
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                int(jax.device_get(fn(sa, sb)))
                best = min(best, (time.perf_counter() - t0) / n)
            results.append((name, best))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            results.append((name, None))

    prev = 0.0
    for name, per in results:
        if per is None:
            continue
        print(f"{name}: {per * 1e3:7.2f} ms  (+{(per - prev) * 1e3:6.2f})  "
              f"{mpix / per:5.0f} Mpix/s")
        if name[0] in "ABC":
            prev = per


if __name__ == "__main__":
    main()
