"""Benchmark: sustained decode throughput on large_image.jpg-class inputs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is the ratio against the 500 Mpix/s/chip north-star target from
BASELINE.md (the reference publishes no absolute numbers; see BASELINE.md §1).

The measured configuration is the production serving shape: host threads run
the entropy stage while the device runs the fused reconstruction pipeline,
pipelined across a stream of images (mirrors `benches/large_image.rs:13-16`
but at sustained throughput rather than single-image latency).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

LARGE_IMAGE = "/root/reference/benches/large_image.jpg"
TARGET_MPIX_S = 500.0


def main() -> None:
    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.models.service import BatchDecodeService

    data = open(LARGE_IMAGE, "rb").read()

    probe = Decoder(data)
    probe.read_info()
    info = probe.info()
    mpix = info.width * info.height / 1e6

    backend = "jax"
    try:
        import jax
        jax.devices()
    except Exception:
        backend = "numpy"

    service = BatchDecodeService(mesh=None, host_threads=4, backend=backend)

    # Warm-up: compile the pipeline and touch the device.
    service.decode_all([data])

    # Measure sustained throughput over a stream of images.
    n_images = 8
    t0 = time.perf_counter()
    results = service.decode_all([data] * n_images)
    elapsed = time.perf_counter() - t0
    assert all(r is not None and r.shape[:2] == (info.height, info.width)
               for r in results)

    throughput = n_images * mpix / elapsed
    print(json.dumps({
        "metric": "decode_throughput_large_image",
        "value": round(throughput, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(throughput / TARGET_MPIX_S, 4),
    }))


if __name__ == "__main__":
    main()
