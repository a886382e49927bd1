#!/usr/bin/env python
"""A/B the burst decode-to-device rate across host staging thread counts.

The burst pipeline (prefix wire) is staging-bound: ~11 ms/img serial C++
entropy+prefix emission, /3 threads ~= 3.7 ms/img vs ~2.3 ms H2D and
~2 ms device compute. CLAUDE.md's "use ~3 staging threads" guidance dates
from round 1; this harness measures 3/4/5 worker pools head-to-head on the
real link (the relay process competes for the 4 host cores — whether a 4th
worker pays for itself is an empirical question, not a sizing rule).

Usage: python tools/experiments/threads_ab.py  (TPU required)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def burst(dec, data, mpix, n_images=24, trials=3):
    best = 0.0
    for t in range(trials):
        t0 = time.perf_counter()
        outs = dec.decode_stream([data] * n_images)
        for o in outs:
            o.block_until_ready()
        dt = time.perf_counter() - t0
        del outs
        best = max(best, n_images * mpix / dt)
        time.sleep(2)
    return best


def main():
    import jax
    assert jax.default_backend() == "tpu", jax.default_backend()
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder

    data = open("/root/reference/benches/large_image.jpg", "rb").read()
    mpix = 2268 * 1512 / 1e6

    # Label the relay phase: the optimum shifts when the link degrades
    # (bench.py picks 5 healthy / 3 degraded from this harness's columns).
    from bench import _link_probe_mb_s
    log(f"link probe: {_link_probe_mb_s()} MB/s")

    # Full published sweep (BASELINE.md cites healthy-phase 3->674, 4->712,
    # 5->762, 6->753, 8->653 Mpix/s from this harness).
    results = {}
    for nt in (3, 4, 5, 6, 8):
        dec = DeviceStreamDecoder(host_threads=nt)
        dec.decode_stream([data] * 2)  # warm compile + pools
        r = burst(dec, data, mpix)
        results[nt] = r
        log(f"host_threads={nt}: burst {r:.0f} Mpix/s")
        del dec
    best = max(results, key=results.get)
    log(f"BEST host_threads={best} ({results[best]:.0f} Mpix/s)")
    log(f"link probe after: {_link_probe_mb_s()} MB/s")


if __name__ == "__main__":
    main()
