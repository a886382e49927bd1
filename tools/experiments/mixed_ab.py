#!/usr/bin/env python
"""Mixed-size batched-bits A/B (round-3, verdict item 7).

A realistic stream mixes image sizes; before round 3 the batched-bits merge
only engaged for identical plans, so a mixed stream degenerated to per-image
dispatches. The heterogeneous merge (_decode_group_bits_hetero) runs ONE
kernel sweep over the merged chunk packs plus one assembly/reconstruct
dispatch per distinct plan. This harness measures images/s on a mixed
0.08-3.4 Mpix stream:

  1. hetero merge (default)           — 1 sweep + #plans reconstructs
  2. per-key dispatch (JPEG_TPU_HETERO_BITS=0) — the round-2 behavior
  3. mesh(1-dev) XLA vs Pallas engines on uniform groups — the verdict's
     "heterogeneous-group penalty" datum for the mesh path (mixed-plan mesh
     groups stack per-image arrays and take the XLA engine).

TPU only (compiled Pallas). Timing is dependency-chained per dispatch group.

NB: the hetero-vs-per-key comparison is RTT-COUNT sensitive — hetero issues
1 sweep + #plans reconstruct dispatches (plus separate H2D puts) where
per-key issues #plans fused pipelines. In a degraded relay phase (per-RPC
RTT observed 4-65 ms vs nominal ~0.1 ms) the extra dispatches dominate and
hetero measures slower (0.85x on 2026-08-19); compare only in a nominal
phase (check bench.py link_h2d_* first).

Usage: python tools/experiments/mixed_ab.py [repeat]
"""

from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def synth(w, h, seed):
    from PIL import Image
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=88, subsampling=2)
    return buf.getvalue()


def timed_stream(dec, imgs, batch_size, jax, jnp):
    t0 = time.perf_counter()
    outs = dec.decode_stream(imgs, batch_size=batch_size)
    acc = outs[0].astype(jnp.int32).sum() + outs[-1].astype(jnp.int32).sum()
    int(jax.device_get(acc))
    return time.perf_counter() - t0, outs


def main(repeat: int = 3) -> int:
    import jax
    import jax.numpy as jnp

    import jpeg_decoder_tpu.models.stream as S

    assert jax.default_backend() == "tpu", jax.default_backend()

    # Mixed stream: 2 plans x interleaved order (the case round-2 grouping
    # could never merge), ~5.3 Mpix total.
    sizes = [(320, 256, 1), (1024, 768, 2), (320, 256, 3), (1024, 768, 4),
             (320, 256, 5), (640, 512, 6), (640, 512, 7), (320, 256, 8)]
    imgs = [synth(w, h, s) for (w, h, s) in sizes]
    mpix = sum(w * h for (w, h, _s) in sizes) / 1e6
    print(f"mixed stream: {len(imgs)} imgs, {mpix:.2f} Mpix, "
          f"{len({(w, h) for (w, h, _s) in sizes})} plans")

    results = {}
    for tag, env in (("hetero", "999"), ("per-key", "0")):
        os.environ["JPEG_TPU_HETERO_BITS"] = env
        dec = S.DeviceStreamDecoder(host_threads=4, interchange="bits")
        timed_stream(dec, imgs, 8, jax, jnp)  # warm: compiles
        best = min(timed_stream(dec, imgs, 8, jax, jnp)[0]
                   for _ in range(repeat))
        results[tag] = best
        print(f"{tag:>8}: {len(imgs) / best:6.1f} img/s  "
              f"{mpix / best:6.1f} Mpix/s  ({best * 1e3:.0f} ms)")
    os.environ.pop("JPEG_TPU_HETERO_BITS", None)
    print(f"hetero vs per-key: {results['per-key'] / results['hetero']:.2f}x")

    # Scenario 2 — many SMALL mixed images (the merge's motivating case:
    # dispatch-count amortization; same-key merging measured 1.65x here in
    # round 2, mixed sizes previously degenerated to per-plan groups).
    sizes2 = [(192, 160), (256, 224), (320, 256), (384, 320)] * 8
    imgs2 = [synth(w, h, 100 + i) for i, (w, h) in enumerate(sizes2)]
    mpix2 = sum(w * h for (w, h) in sizes2) / 1e6
    print(f"small-mixed stream: {len(imgs2)} imgs, {mpix2:.2f} Mpix, "
          f"{len(set(sizes2))} plans")
    for tag, env in (("hetero", "999"), ("per-key", "0")):
        os.environ["JPEG_TPU_HETERO_BITS"] = env
        dec = S.DeviceStreamDecoder(host_threads=4, interchange="bits")
        timed_stream(dec, imgs2, 32, jax, jnp)  # warm
        best = min(timed_stream(dec, imgs2, 32, jax, jnp)[0]
                   for _ in range(repeat))
        results["s2-" + tag] = best
        print(f"{tag:>8}: {len(imgs2) / best:6.1f} img/s  "
              f"{mpix2 / best:6.1f} Mpix/s  ({best * 1e3:.0f} ms)")
    os.environ.pop("JPEG_TPU_HETERO_BITS", None)
    print(f"small-mixed hetero vs per-key: "
          f"{results['s2-per-key'] / results['s2-hetero']:.2f}x")

    # Scenario 3 (round-4 verdict item 8 — SECOND mixed profile): serving
    # thumbnails alongside 2 Mpix hero images. Validates the size-aware
    # threshold on a distribution shaped unlike scenario 1/2: with the
    # default policy the heroes dispatch per-key fused pipelines while the
    # thumbnails hetero-merge; "always" forces the heroes into the sweep
    # too; "never" is the round-2 per-plan behavior.
    sizes3 = ([(160, 120)] * 6 + [(1600, 1280)] + [(208, 160)] * 6
              + [(1600, 1280)] + [(160, 120)] * 6 + [(1600, 1280)])
    imgs3 = [synth(w, h, 200 + i) for i, (w, h) in enumerate(sizes3)]
    mpix3 = sum(w * h for (w, h) in sizes3) / 1e6
    print(f"thumbs+hero stream: {len(imgs3)} imgs, {mpix3:.2f} Mpix, "
          f"{len(set(sizes3))} plans")
    for tag, env in (("default", None), ("always", "999"), ("never", "0")):
        if env is None:
            os.environ.pop("JPEG_TPU_HETERO_BITS", None)
        else:
            os.environ["JPEG_TPU_HETERO_BITS"] = env
        dec = S.DeviceStreamDecoder(host_threads=4, interchange="bits")
        timed_stream(dec, imgs3, 32, jax, jnp)  # warm
        best = min(timed_stream(dec, imgs3, 32, jax, jnp)[0]
                   for _ in range(repeat))
        results["s3-" + tag] = best
        print(f"{tag:>8}: {len(imgs3) / best:6.1f} img/s  "
              f"{mpix3 / best:6.1f} Mpix/s  ({best * 1e3:.0f} ms)")
    os.environ.pop("JPEG_TPU_HETERO_BITS", None)

    # Mesh engines on a uniform group: Pallas engine vs forced-XLA
    # (what a heterogeneous mesh group falls back to).
    from jpeg_decoder_tpu.parallel import make_mesh
    mesh = make_mesh({"data": 1}, jax.devices()[:1])
    uni = [imgs[0]] * 8
    for tag, env in (("mesh-pallas", "1"), ("mesh-xla", "0")):
        os.environ["JPEG_TPU_BITS_PALLAS"] = env
        dec = S.DeviceStreamDecoder(host_threads=4, interchange="bits",
                                    mesh=mesh)
        timed_stream(dec, uni, 8, jax, jnp)
        best = min(timed_stream(dec, uni, 8, jax, jnp)[0]
                   for _ in range(repeat))
        results[tag] = best
        print(f"{tag:>12}: {len(uni) / best:6.1f} img/s ({best * 1e3:.0f} ms)")
    os.environ.pop("JPEG_TPU_BITS_PALLAS", None)
    print(f"mesh hetero-group penalty (XLA vs Pallas engine): "
          f"{results['mesh-xla'] / results['mesh-pallas']:.2f}x slower")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 3))
