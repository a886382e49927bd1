#!/usr/bin/env python
"""A/B the host anchored-span prefix staging against the serial kernel on
THIS host's core count (no TPU needed — prefix staging is host-only).

Context: `_anchored_enabled()` gates the anchored path to >=6 cores based on
a round-2 measurement where the prescan alone cost ~7.5 ms (prescan walk
~0.8x a serial decode, so <6 threads lost). Round 3's speculative self-sync
split cut the prescan to ~3 ms on 4 threads — this harness re-measures the
break-even with the split active, on a non-DRI baseline stream
(large_image.jpg).

Usage: python tools/experiments/anchored4_ab.py [repeats]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(data, label, repeats):
    from jpeg_decoder_tpu.models.stream import stage_host
    st = stage_host(data)
    if hasattr(st, "release"):
        st.release()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        st = stage_host(data)
        ts.append((time.perf_counter() - t0) * 1e3)
        if hasattr(st, "release"):
            st.release()
    ts.sort()
    print(f"{label}: median {ts[len(ts)//2]:.2f} ms  min {ts[0]:.2f}")
    return ts[len(ts)//2]


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    data = open("/root/reference/benches/large_image.jpg", "rb").read()
    print(f"host cores: {os.cpu_count()}")

    os.environ["JPEG_TPU_ANCHORED"] = "0"
    serial = measure(data, "serial prefix staging  (JPEG_TPU_ANCHORED=0)",
                     repeats)

    # Fresh process state isn't needed: the gate is read per staging call.
    os.environ["JPEG_TPU_ANCHORED"] = "1"
    anchored = measure(data, "anchored prefix staging (JPEG_TPU_ANCHORED=1)",
                       repeats)

    print(f"speedup: {serial / anchored:.2f}x "
          f"({'anchored wins' if anchored < serial else 'serial wins'})")


if __name__ == "__main__":
    main()
