#!/usr/bin/env python
"""One-line relay link health probe — run BEFORE any timing A/B.

The TPU tunnel's phase swings wildly (measured 2026-08-19: H2D 14-70 MB/s,
per-dispatch RTT 0.1-65 ms, random 20-70 s stalls on individual dispatches).
Every dispatch-count- or byte-count-sensitive comparison is only meaningful
within one phase; this probe stamps the phase as machine-readable JSON.

Usage: python tools/relay_probe.py [h2d_mb]
"""
import json
import sys
import time


def main(h2d_mb: int = 4) -> int:
    import numpy as np
    import jax

    t0 = time.perf_counter()
    dev = jax.devices()[0]
    init_s = time.perf_counter() - t0

    f = jax.jit(lambda a: a.sum())
    x = jax.device_put(np.ones(1024, np.float32))
    f(x).block_until_ready()  # compile
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        rtts.append(time.perf_counter() - t0)
    rtts.sort()

    buf = np.zeros(h2d_mb << 20, np.uint8)
    t0 = time.perf_counter()
    jax.device_put(buf).block_until_ready()
    h2d_s = time.perf_counter() - t0

    print(json.dumps({
        "device": str(dev),
        "session_init_s": round(init_s, 2),
        "rtt_ms_median": round(rtts[len(rtts) // 2] * 1e3, 2),
        "rtt_ms_max": round(rtts[-1] * 1e3, 2),
        "h2d_mb_s": round(h2d_mb / h2d_s, 1),
        "h2d_probe_mb": h2d_mb,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 4))
