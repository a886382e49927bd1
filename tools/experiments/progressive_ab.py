#!/usr/bin/env python
"""A/B the progressive-image stream path on real TPU hardware:
bits interchange (host decode + transcode re-encode, device Huffman) vs the
round-1 prefix interchange (dense coefficient shipping).

Generates a progressive variant of large_image.jpg (same pixels, PIL q95
progressive — matching the original's ~0.87 B/px coefficient density; q85
re-encoding collapses it to 0.08 B/px and mutes the interchange difference),
then reports per-path host staging time, H2D bytes/pixel, and the sustained
(post-burst) stream rate through the relay's throttled link — the metric the
transcode path exists to move.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np

PROG_PATH = "/tmp/jpeg_tpu_large_progressive.jpg"


def make_progressive() -> bytes:
    if os.path.exists(PROG_PATH):
        return open(PROG_PATH, "rb").read()
    from PIL import Image

    from jpeg_decoder_tpu import Decoder
    d = Decoder("/root/reference/benches/large_image.jpg")
    px = np.frombuffer(d.decode(), np.uint8)
    info = d.info()
    arr = px.reshape(info.height, info.width, 3)
    Image.fromarray(arr, "RGB").save(PROG_PATH, "JPEG", quality=95,
                                     progressive=True)
    return open(PROG_PATH, "rb").read()


def main():
    import jax

    from bench import _deadline, _measure_sustained
    from jpeg_decoder_tpu.entropy.pallas_decode import combine_packs, pack_classes
    from jpeg_decoder_tpu.models.stream import (DeviceStreamDecoder,
                                                StagedBits, stage_host,
                                                stage_host_bits)

    assert jax.default_backend() == "tpu", jax.default_backend()
    data = make_progressive()
    from jpeg_decoder_tpu import Decoder
    probe = Decoder(data)
    probe.read_info()
    info = probe.info()
    mpix = info.width * info.height / 1e6
    px = info.width * info.height
    print(f"progressive large_image: {len(data)} B source "
          f"({len(data) / px:.3f} B/px), {mpix:.2f} Mpix")

    # Host staging + wire cost.
    for name, fn in (("bits(transcode)", stage_host_bits), ("prefix", stage_host)):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            st = fn(data)
            ts.append(time.perf_counter() - t0)
        if isinstance(st, StagedBits):
            scan, _ = st.scans[0]
            packs = pack_classes(scan)
            s, m, b = combine_packs(packs)
            h2d = s.nbytes + m.nbytes + b.nbytes
        else:
            h2d = (st.dc.nbytes + st.ac.nbytes + st.resid_idx.nbytes
                   + st.resid_vals.nbytes)
        print(f"{name:>16}: stage {min(ts) * 1e3:6.0f} ms, "
              f"H2D {h2d / px:.3f} B/px")

    # Sustained stream rate, both measured past the burst window (see
    # bench._measure_sustained). The relay's throttle drifts between runs;
    # pass "--reverse" to swap measurement order and bound the drift.
    order = [("bits", "bits"), ("prefix", "prefix")]
    if "--reverse" in sys.argv:
        order.reverse()
    results = {}
    for name, interchange in order:
        dec = DeviceStreamDecoder(host_threads=3, interchange=interchange)
        dec.decode_stream([data] * 2)  # warm compile + pools
        with _deadline(300):
            results[name] = _measure_sustained(dec, data, mpix, budget_s=20.0)
        print(f"sustained {name}: {results.get(name, 0.0):.1f} Mpix/s")
    if results.get("prefix"):
        print(f"speedup: {results['bits'] / results['prefix']:.2f}x")


if __name__ == "__main__":
    main()
