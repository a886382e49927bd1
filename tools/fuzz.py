#!/usr/bin/env python
"""Mutation fuzzer for the decode engine — the AFL/libfuzzer analog.

The reference ships libfuzzer targets (differential vs mozjpeg, regression
vs previous versions) and AFL decode/info targets (`/root/reference/fuzz/`,
`/root/reference/fuzz-afl/`). This harness covers the same robustness
capability in-environment (zero-egress, no external fuzzer): seeded random
byte mutations of corpus images, decoded with both the native and oracle
entropy engines.

Invariants checked per mutant:
  1. decode() either succeeds or raises a typed JpegError — never any other
     exception, never a hang (alarm guard).
  2. native and oracle engines agree: same pixels or both error.

Usage: python tools/fuzz.py [iterations] [seed]
"""

from __future__ import annotations

import os
import random
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = [
    "/root/reference/tests/reftest/images/rgb.jpg",
    "/root/reference/tests/reftest/images/mozilla/jpg-progressive.jpg",
    "/root/reference/tests/reftest/images/restarts.jpg",
    "/root/reference/tests/reftest/images/mozilla/jpg-cmyk-1.jpg",
    "/root/reference/tests/reftest/images/lossless/1/jpeg_lossless_sel1.jpg",
    "/root/reference/tests/reftest/images/grayscale_16x24_sampling2x2.jpg",
]


def mutate(data: bytes, rng: random.Random) -> bytes:
    buf = bytearray(data)
    n_mut = rng.randint(1, 8)
    for _ in range(n_mut):
        op = rng.random()
        if op < 0.6 and buf:  # flip bytes
            i = rng.randrange(len(buf))
            buf[i] = rng.randrange(256)
        elif op < 0.8 and buf:  # truncate
            buf = buf[:rng.randrange(1, len(buf) + 1)]
        else:  # duplicate a slice
            if len(buf) > 4:
                a = rng.randrange(len(buf) - 2)
                b = min(len(buf), a + rng.randrange(1, 64))
                buf[a:a] = buf[a:b]
    return bytes(buf)


def run(iterations: int = 500, seed: int = 0, timeout_s: int = 20) -> int:
    from jpeg_decoder_tpu import Decoder, JpegError

    rng = random.Random(seed)
    seeds = [open(p, "rb").read() for p in SEEDS if os.path.exists(p)]
    failures = 0

    def decode(data: bytes, disable_native: bool):
        import jpeg_decoder_tpu.entropy.native as native_mod
        if disable_native:
            os.environ["JPEG_TPU_DISABLE_NATIVE"] = "1"
        else:
            os.environ.pop("JPEG_TPU_DISABLE_NATIVE", None)
        native_mod.reset_native_cache()
        try:
            return Decoder(data).decode()
        except JpegError as e:
            return f"ERR:{type(e).__name__}"

    for i in range(iterations):
        data = mutate(rng.choice(seeds), rng)
        signal.alarm(timeout_s)
        try:
            a = decode(data, disable_native=False)
            b = decode(data, disable_native=True)
        except Exception as e:  # noqa: BLE001 — any non-JpegError is a bug
            failures += 1
            path = f"/tmp/fuzz_crash_{i}.jpg"
            open(path, "wb").write(data)
            print(f"[{i}] CRASH {type(e).__name__}: {e} -> {path}")
            continue
        finally:
            signal.alarm(0)
        if a != b:
            failures += 1
            path = f"/tmp/fuzz_diff_{i}.jpg"
            open(path, "wb").write(data)
            print(f"[{i}] NATIVE/ORACLE DIVERGENCE -> {path}")
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{iterations} done, {failures} failures")

    print(f"fuzz complete: {iterations} mutants, {failures} failures")
    return failures


if __name__ == "__main__":
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sys.exit(1 if run(iters, seed) else 0)
