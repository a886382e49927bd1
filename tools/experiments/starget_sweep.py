#!/usr/bin/env python
"""Offline (CPU, no device) sweep of the anchoring budget S_TARGET for the
wire="words" interchange.

The words wire ships the compressed stream once plus per-chunk metadata
(12 B, or 8 B packed), so — unlike the slots wire the current S_TARGET=96
was tuned for — raising S_TARGET cuts BOTH remaining cost terms at once:

  wire metadata   = n_chunks * {12, 8} B     (~25% of the wire at S=96)
  kernel emission = n_chunks * K_CAP * 64    (the Mosaic op histogram puts
                                              dense emission at ~90% of the
                                              kernel body; see CLAUDE.md)
  kernel walk     = sum(class items * s_max)

The only cost that RISES with S_TARGET is per-chunk walk length (s_max
buckets), whose overhead fraction 66/S_TARGET actually falls. This script
measures the host-visible terms across candidates so the TPU A/B
(tools/experiments/kcap_ab.py-style) only has to confirm kernel timing.

Usage: python tools/experiments/starget_sweep.py [image ...]
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np

DEFAULT_IMAGES = [
    "/root/reference/benches/large_image.jpg",
    "/root/reference/tests/reftest/images/rgb.jpg",
    "/root/reference/tests/reftest/images/mozilla/jpg-progressive.jpg",
]

CANDIDATES = (96, 128, 160, 192, 256)
K_CAP = 24


def stage_with(data, s_target):
    from jpeg_decoder_tpu.entropy import device_scan
    old = (device_scan.S_TARGET, device_scan.S_MAX)
    device_scan.S_TARGET = s_target
    device_scan.S_MAX = s_target + 66
    try:
        from jpeg_decoder_tpu.models.stream import stage_host_bits
        return stage_host_bits(data)
    finally:
        device_scan.S_TARGET, device_scan.S_MAX = old


def main():
    os.environ.setdefault("JPEG_TPU_WIRE", "words-packed")
    # Wire-size measurement needs the pack layout, not a TPU: bypass the
    # backend gate so _attach_pallas runs on CPU too.
    from jpeg_decoder_tpu.models import stream
    stream._bits_pallas_enabled = lambda: True
    images = sys.argv[1:] or DEFAULT_IMAGES
    for img in images:
        data = open(img, "rb").read()
        from jpeg_decoder_tpu import Decoder
        probe = Decoder(data)
        probe.read_info()
        info = probe.info()
        px = info.width * info.height
        print(f"\n== {os.path.basename(img)}  {info.width}x{info.height} "
              f"({px/1e6:.2f} Mpix, {len(data)} B source = "
              f"{len(data)/px:.3f} B/px)")
        print(f"{'S_tgt':>6} {'chunks':>8} {'blk/ch':>7} {'wireB':>9} "
              f"{'B/px':>7} {'emit(Melem)':>12} {'walk(Mstep)':>12}")
        for s in CANDIDATES:
            try:
                st = stage_with(data, s)
            except Exception as e:
                print(f"{s:>6} stage failed: {e}")
                continue
            if not getattr(st, "pallas", None) or any(
                    e is None for e in st.pallas):
                print(f"{s:>6} Pallas-ineligible")
                continue
            wire = sum(a.nbytes for e in st.pallas for a in e[0])
            chunks = emit = walk = blocks = 0
            for (combined, shapes, eff_wire) in st.pallas:
                for (sw, sm, nbuk, ni) in shapes:
                    chunks += ni
                    emit += nbuk * K_CAP * 64
                    walk += nbuk * sm
            for scan, _kept in st.scans:
                blocks += scan.n_blocks
            print(f"{s:>6} {chunks:>8} {blocks/max(chunks,1):>7.1f} "
                  f"{wire:>9} {wire/px:>7.3f} {emit/1e6:>12.2f} "
                  f"{walk/1e6:>12.2f}")


if __name__ == "__main__":
    main()
