"""One-shot TPU validation queue for the round-2 wire work.

Phases (each independently try/except'd so later ones still run):
  1. single-image words + words-packed parity vs slots (large_image, on-device compare)
  2. batched (batch-4) parity: slots == words == words-packed (rgb.jpg)
  3. sustained A/B words vs words-packed (large_image, 15s windows)
  4. bench.py-shaped warm: prefix + bits pipelines for the driver's run
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def fresh(wire):
    os.environ["JPEG_TPU_WIRE"] = wire
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder
    return DeviceStreamDecoder(host_threads=3, interchange="bits",
                               precision="exact")


def main():
    import jax
    import jax.numpy as jnp
    assert jax.default_backend() == "tpu", jax.default_backend()
    large = open("/root/reference/benches/large_image.jpg", "rb").read()
    rgb = open("/root/reference/tests/reftest/images/rgb.jpg", "rb").read()

    # 1. single-image parity on large_image
    try:
        outs = {}
        for wire in ("slots", "words", "words-packed"):
            t0 = time.time()
            o = fresh(wire).decode_stream([large])[0]
            o.block_until_ready()
            log(f"single {wire}: {time.time()-t0:.1f}s")
            outs[wire] = o
        for w in ("words", "words-packed"):
            same = bool(jnp.array_equal(outs["slots"], outs[w]))
            log(f"PARITY single slots=={w}: {same}")
            assert same
        del outs
    except Exception as e:
        log("phase1 FAIL:", repr(e))

    # 2. batched parity on rgb (batch-4)
    try:
        outs = {}
        for wire in ("slots", "words", "words-packed"):
            t0 = time.time()
            os_ = fresh(wire).decode_stream([rgb] * 4, batch_size=4)
            jax.block_until_ready(os_)
            log(f"batch4 {wire}: {time.time()-t0:.1f}s")
            outs[wire] = os_
        for w in ("words", "words-packed"):
            for i, (a, b) in enumerate(zip(outs["slots"], outs[w])):
                assert bool(jnp.array_equal(a, b)), (w, i)
            log(f"PARITY batch4 slots=={w}: True")
        del outs
    except Exception as e:
        log("phase2 FAIL:", repr(e))

    # 3. sustained A/B words vs words-packed
    try:
        from bench import _deadline, _measure_sustained
        from jpeg_decoder_tpu import Decoder
        probe = Decoder(large)
        probe.read_info()
        info = probe.info()
        mpix = info.width * info.height / 1e6
        for wire in ("words", "words-packed"):
            dec = fresh(wire)
            dec.decode_stream([large] * 2)
            r = 0.0
            with _deadline(240):
                r = _measure_sustained(dec, large, mpix, budget_s=15.0)
            log(f"sustained {wire}: {r:.1f} Mpix/s")
    except Exception as e:
        log("phase3 FAIL:", repr(e))

    # 4. warm the exact bench.py shapes (default env: prefix + bits words)
    try:
        os.environ.pop("JPEG_TPU_WIRE", None)
        from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder
        pre = DeviceStreamDecoder(host_threads=3)
        jax.block_until_ready(pre.decode_stream([large] * 2))
        log("warm prefix x2 ok")
        bits = DeviceStreamDecoder(host_threads=3, interchange="bits")
        jax.block_until_ready(bits.decode_stream([large] * 2))
        log("warm bits x2 ok")
        jax.block_until_ready(bits.decode_stream([large] * 8))
        log("warm bits x8 ok")
        jax.block_until_ready(pre.decode_stream([large] * 24))
        log("warm prefix x24 ok")
        jax.block_until_ready(bits.decode_stream([large] * 24))
        log("warm bits x24 ok")
    except Exception as e:
        log("phase4 FAIL:", repr(e))

    log("queue done")


if __name__ == "__main__":
    main()
