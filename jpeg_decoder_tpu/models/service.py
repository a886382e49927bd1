"""Batch decode service: host entropy workers feeding device batch pipelines.

The production serving shape: a pool of host threads runs the bit-serial
entropy stage (C++ kernel releases the GIL; Python oracle degrades gracefully),
images are bucketed by reconstruction geometry, and each bucket's coefficient
tensors are decoded in one sharded device program (`parallel/batch.py`).

This replaces — at datacenter scale — the reference's per-image worker threads
(`/root/reference/src/worker/multithreaded.rs`): instead of 4 threads inside
one image, it's N host cores × M devices across images.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Sequence

import numpy as np

from ..decoder import Decoder
from ..ops.pipeline import geometry_from_frame, reconstruct_image
from ..parallel.batch import decode_batch_sharded


def _host_stage(source, scale_to=None):
    """Run parse + entropy for one image; return (geometry, stores, qts)."""
    d = Decoder(source, backend="numpy")
    if scale_to is not None:
        d.scale(*scale_to)
    d._decode_entropy_only()
    n = len(d.frame.components)
    stores = [d._pending_render[i][0].reshape(-1, 64) for i in range(n)]
    qts = [d._pending_render[i][1] for i in range(n)]
    transform = None if n == 1 else d._determine_color_transform()
    return geometry_from_frame(d.frame, transform), stores, qts


class BatchDecodeService:
    """Decode many images: threaded host entropy + geometry-bucketed device batches."""

    def __init__(self, mesh=None, host_threads: int = 4, backend: str = "jax"):
        self.mesh = mesh
        self.host_threads = host_threads
        self.backend = backend

    def decode_all(self, sources: Sequence, scale_to=None):
        """Decode all sources; returns list of np.uint8 arrays (order preserved)."""
        with cf.ThreadPoolExecutor(max_workers=self.host_threads) as pool:
            staged = list(pool.map(lambda s: _host_stage(s, scale_to), sources))

        # Bucket by geometry.
        buckets: dict = {}
        for idx, (geometry, stores, qts) in enumerate(staged):
            buckets.setdefault(geometry, []).append((idx, stores, qts))

        results: list = [None] * len(staged)
        for geometry, items in buckets.items():
            if self.mesh is not None and len(items) > 1:
                batched = [
                    np.stack([stores[c] for _, stores, _ in items])
                    for c in range(len(geometry.components))
                ]
                qts = items[0][2]  # same-geometry bucket shares table *shapes*;
                # distinct tables per image still possible — guard:
                same_tables = all(
                    all((q1 == q2).all() for q1, q2 in zip(qts, it[2]))
                    for it in items)
                if same_tables:
                    out = decode_batch_sharded(geometry, batched, qts, self.mesh)
                    for (idx, _, _), img in zip(items, out):
                        results[idx] = img
                    continue
            for idx, stores, qts in items:
                results[idx] = reconstruct_image(
                    geometry, stores, qts, backend=self.backend)
        return results


def decode_many(sources: Sequence, mesh=None, host_threads: int = 4,
                backend: str = "jax"):
    return BatchDecodeService(mesh, host_threads, backend).decode_all(sources)
