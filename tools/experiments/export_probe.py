#!/usr/bin/env python
"""Probe: export the Pallas decode kernel for TPU WITHOUT hardware and
extract the Mosaic op histogram (round-2 trick, CLAUDE.md Pallas gotchas).
Feasibility probe for the default-suite TPU-lowering smoke test."""

import base64
import collections
import re
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.entropy import pallas_decode as pd
    from test_device_entropy import AnchorCapture

    path = "/root/reference/tests/reftest/images/mozilla/jpg-size-16x16.jpg"
    d = Decoder(path)
    cap = AnchorCapture()
    d._prefix_capture = cap
    d._decode_entropy_only()
    staged = cap.scans[0][0]

    packed = pd.pack_delta(staged)
    assert packed is not None
    combined, shapes = packed
    fn = pd.build_pallas_decoder(
        staged.plan, tuple(s[:3] for s in shapes),
        len(staged.tab_maxcode), comp_to_upair=staged.comp_to_upair,
        device_slots="delta")

    args = (combined, staged.tab_maxcode, staged.tab_delta,
            staged.tab_values.view(np.int32))
    t0 = time.time()
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    t1 = time.time()
    print(f"export took {t1-t0:.1f}s", flush=True)
    mlir = exp.mlir_module()
    print("mlir module length:", len(mlir))
    # Find tpu_custom_call backend configs
    mm = re.findall(r'tpu_custom_call', mlir)
    print("tpu_custom_call occurrences:", len(mm))
    # backend_config containing the serialized Mosaic kernel
    cfgs = re.findall(r'backend_config\s*=\s*"((?:[^"\\]|\\.)*)"', mlir)
    print("backend_configs:", [len(c) for c in cfgs])
    for c in cfgs:
        if len(c) < 1000:
            print("short cfg:", c[:500])
            continue
        # typically a JSON with base64 "module"
        m = re.search(r'module\\?":\s*\\?"([A-Za-z0-9+/=]+)', c)
        if m:
            body = base64.b64decode(m.group(1))
        else:
            body = c.encode()
        print("decoded body bytes:", len(body), "head:", body[:64])
        txt = body.decode("utf-8", errors="replace")
        ops = re.findall(r'(?:^|\s)(?:%\S+\s*=\s*)?"?([a-z_]+\.[a-z_0-9]+)"?\(',
                         txt)
        hist = collections.Counter(ops)
        print("op histogram (top 25):")
        for k, v in hist.most_common(25):
            print(f"  {k:40s} {v}")


if __name__ == "__main__":
    main()
