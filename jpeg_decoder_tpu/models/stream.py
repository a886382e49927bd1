"""Decode-to-device streaming: the production TPU ingestion pipeline.

Decoded images stay in device HBM (where a training/serving model consumes
them); the host never reads pixels back. Per image the host runs the
bit-serial entropy stage and ships coefficients in a *zigzag-prefix* format:

- a dense int16 [blocks, K] tensor holding each block's first K coefficients
  in zigzag order (JPEG energy concentrates there), rebuilt on device with a
  static column permutation — no scatter;
- a small COO residual for nonzeros beyond the prefix, applied with one
  (tiny) scatter-add.

This keeps host->device bytes within ~1.2x of pure sparse COO while replacing
the large random scatter (the dominant device cost for COO) with a shuffle.
Stages are overlapped: host thread-pool entropy, async device_put, async jit
dispatch. Sustained throughput = slowest stage, not the sum.
"""

from __future__ import annotations

import concurrent.futures as cf
import contextlib
import dataclasses
import functools
import os
import threading
from typing import Iterable

import numpy as np

from ..decoder import Decoder
from ..entropy.scan_python import UNZIGZAG
from ..ops.pipeline import ImageGeometry, _reconstruct, geometry_from_frame
from ..parser import CodingProcess

PREFIX_K = 16


def _tune_malloc() -> None:
    """Keep multi-MB numpy buffers on the heap instead of per-allocation mmap.

    glibc mmaps allocations above ~128KB and munmaps them on free, so every
    per-image tensor (prefix, residuals) pays full page-fault cost again —
    measured at 100+ ms per large_image-class decode. Raising the mmap
    threshold (and disabling trim) makes the heap retain and reuse the pages.
    """
    import ctypes
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass


_tune_malloc()

# Natural index -> zigzag position (inverse of UNZIGZAG).
_ZIGZAG_OF_NATURAL = np.zeros(64, np.int32)
for _z, _n in enumerate(UNZIGZAG):
    _ZIGZAG_OF_NATURAL[_n] = _z


def _bucket(n: int, floor: int = 2048) -> int:
    """Round up to a compile-friendly bucket (1.3x geometric steps)."""
    size = floor
    while size < n:
        size = int(size * 1.3) + (-int(size * 1.3) % 256)
    return size


@functools.lru_cache(maxsize=256)
def _compiled_prefix_pipeline(geometry: ImageGeometry, resid_bucket: int,
                              layout: str = "interleaved"):
    import jax
    import jax.numpy as jnp

    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)

    comps = geometry.components
    nblocks = [c.blocks_high * c.blocks_wide for c in comps]
    sizes = [n * 64 for n in nblocks]
    offsets = np.cumsum([0] + sizes)[:-1]
    total = int(sum(sizes))
    perm = tuple(int(x) for x in _ZIGZAG_OF_NATURAL)

    def run(dc, ac, resid_idx, resid_vals, qts):
        # dc: int16 [sum(nblocks)]; ac: int8 [sum(nblocks), K-1] (zigzag
        # slots 1..K-1, saturated; corrections ride the residual).
        padded = jnp.concatenate(
            [dc[:, None], ac.astype(jnp.int16),
             jnp.zeros((dc.shape[0], 64 - PREFIX_K), jnp.int16)], axis=1)
        dense_blocks = padded[:, jnp.asarray(perm)]       # natural order
        dense = dense_blocks.reshape(-1)
        dense = dense.at[resid_idx].add(resid_vals, mode="drop")
        stores = [
            dense[int(o):int(o) + int(s)].reshape(-1, 64)
            for o, s in zip(offsets, sizes)
        ]
        if layout == "planar-pallas":
            from ..ops.pallas_kernels import reconstruct_planar_pallas
            return reconstruct_planar_pallas(geometry, stores, qts)
        out = _reconstruct(geometry, stores, qts, jnp)
        if layout == "planar" and out.ndim == 3:
            return jnp.transpose(out, (2, 0, 1))
        return out

    return jax.jit(run)


@functools.lru_cache(maxsize=128)
def _compiled_prefix_pipeline_batched(geometry: ImageGeometry, resid_bucket: int,
                                      batch: int, mesh=None,
                                      data_axis: str = "data",
                                      layout: str = "interleaved"):
    """vmapped variant of the prefix pipeline: one dispatch decodes `batch`
    same-geometry images (amortizes per-call RPC/dispatch overhead, which
    dominates sub-megapixel images).

    With `mesh`, the batch axis is sharded over `data_axis` — the streaming
    service's data-parallel scale-out path (SURVEY.md §2a DP): every input
    and the output pixel batch carry NamedShardings, XLA inserts no
    collectives, and each chip decodes its shard of the image batch."""
    import jax
    import jax.numpy as jnp

    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)

    comps = geometry.components
    nblocks = [c.blocks_high * c.blocks_wide for c in comps]
    sizes = [n * 64 for n in nblocks]
    offsets = np.cumsum([0] + sizes)[:-1]
    total = int(sum(sizes))
    perm = tuple(int(x) for x in _ZIGZAG_OF_NATURAL)

    def run_one(dc, ac, resid_idx, resid_vals, qts):
        padded = jnp.concatenate(
            [dc[:, None], ac.astype(jnp.int16),
             jnp.zeros((dc.shape[0], 64 - PREFIX_K), jnp.int16)], axis=1)
        dense = padded[:, jnp.asarray(perm)].reshape(-1)
        dense = dense.at[resid_idx].add(resid_vals, mode="drop")
        stores = [dense[int(o):int(o) + int(s)].reshape(-1, 64)
                  for o, s in zip(offsets, sizes)]
        if layout == "planar-pallas":
            from ..ops.pallas_kernels import reconstruct_planar_pallas
            return reconstruct_planar_pallas(geometry, stores, qts)
        out = _reconstruct(geometry, stores, qts, jnp)
        if layout == "planar" and out.ndim == 3:
            return jnp.transpose(out, (2, 0, 1))
        return out

    batched = jax.vmap(run_one, in_axes=(0, 0, 0, 0, 0))
    if mesh is None:
        return jax.jit(batched)

    from jax.sharding import NamedSharding, PartitionSpec as PS
    sharded = NamedSharding(mesh, PS(data_axis))
    ncomp = len(comps)
    return jax.jit(
        batched,
        in_shardings=(sharded, sharded, sharded, sharded, (sharded,) * ncomp),
        out_shardings=sharded)


def _bits_pallas_mode() -> str:
    """Pallas kernel path for the bits interchange: "on" by default for TPU
    backends; JPEG_TPU_BITS_PALLAS=0 opts out; JPEG_TPU_BITS_PALLAS=interpret
    forces the path on any backend in Pallas interpret mode (pure-jax kernel
    emulation — slow; CPU test harnesses only)."""
    import os
    v = os.environ.get("JPEG_TPU_BITS_PALLAS", "1")
    if v == "0":
        return "off"
    if v == "interpret":
        return "interpret"
    try:
        import jax
        return "on" if jax.default_backend() == "tpu" else "off"
    except Exception:
        return "off"


def _bits_pallas_enabled() -> bool:
    return _bits_pallas_mode() != "off"


def _anchored_enabled() -> bool:
    """Host-parallel anchored entropy decode for non-DRI baseline scans
    (entropy.cc jt_decode_scan_dct_prefix_anchored): prescan walk + N-thread
    re-decode from MCU-aligned anchors. Round 2 gated this to >=6 cores
    (the prescan walk alone cost ~0.8x a serial decode); the round-3
    speculative prescan split changed the economics — re-measured 1.64x on
    THIS 4-core host (tools/experiments/anchored4_ab.py: 11.7 -> 7.1 ms
    serial prefix staging), so default-on at >=4 cores now.
    JPEG_TPU_ANCHORED=1 forces it on (0 off) regardless."""
    import os
    v = os.environ.get("JPEG_TPU_ANCHORED")
    if v is not None:
        return v not in ("0", "", "off")
    return (os.cpu_count() or 1) >= 4


def _batch_bucket(n: int) -> int:
    size = 1
    while size < n:
        size *= 2
    return size


@dataclasses.dataclass
class StagedImage:
    geometry: ImageGeometry
    dc: np.ndarray          # int16 [sum_blocks]
    ac: np.ndarray          # int8 [sum_blocks, K-1], saturated zigzag slots
    resid_idx: np.ndarray   # int32 [resid_bucket]; padding -> out of range (dropped)
    resid_vals: np.ndarray  # int16 [resid_bucket]
    qts: tuple
    total_coeffs: int
    mpix: float


class _BufferPool:
    """Reusable host buffers keyed by (dtype, size). Large per-image numpy
    allocations hit mmap/page-fault churn (~100s of ms for 20MB-class
    tensors); pooling keeps the pages resident across images.

    Bounded: at most `depth` buffers per (dtype, size) and `budget` total
    bytes — a long-lived service decoding diverse image sizes must not grow
    without limit. Eviction drops the least-recently-released size class."""

    def __init__(self, depth: int = 8, budget: int = 1 << 30):
        self._lock = threading.Lock()
        self._free: dict = {}
        self._depth = depth
        self._budget = budget
        self._bytes = 0

    def acquire(self, size: int, dtype) -> np.ndarray:
        key = (np.dtype(dtype).str, size)
        with self._lock:
            stack = self._free.get(key)
            if stack:
                arr = stack.pop()
                self._bytes -= arr.nbytes
                return arr
        return np.empty(size, dtype=dtype)

    def release(self, arr: np.ndarray) -> None:
        key = (arr.dtype.str, arr.size)
        with self._lock:
            stack = self._free.setdefault(key, [])
            if len(stack) >= self._depth:
                return  # drop: per-class cap
            stack.append(arr)
            self._free[key] = stack
            # Move to MRU position for budget eviction order.
            self._free.pop(key)
            self._free[key] = stack
            self._bytes += arr.nbytes
            while self._bytes > self._budget and len(self._free) > 1:
                old_key = next(iter(self._free))
                if old_key == key:
                    break
                for dropped in self._free.pop(old_key):
                    self._bytes -= dropped.nbytes


_pool = _BufferPool()


class PrefixCapture:
    """Receives baseline scan output in the device interchange format straight
    from the native entropy kernel — no dense 64-coefficient stores ever exist
    on the host, roughly quartering per-image host memory traffic (the staging
    stage is DRAM-bandwidth-bound at multi-worker rates)."""

    def __init__(self, native, k: int = PREFIX_K, pool_width: int = 1):
        self.native = native
        self.k = k
        self.pool_width = max(1, pool_width)
        self.prefix_arrays: dict = {}   # frame comp index -> int16 [nblocks, K]
        self.bases: list = []
        self.sizes: list = []
        self.total = 0
        self.resid_idx = None
        self.resid_vals = None
        self.resid_count = 0
        self.used = False

    def wants(self, frame) -> bool:
        return True

    def _ensure_layout(self, frame) -> None:
        if self.bases:
            return
        self.sizes = [c.block_size.width * c.block_size.height * 64
                      for c in frame.components]
        self.bases = list(np.cumsum([0] + self.sizes)[:-1])
        self.total = int(sum(self.sizes))
        self.resid_idx = _pool.acquire(self.total, np.int32)
        self.resid_vals = _pool.acquire(self.total, np.int16)

    def _prefix_for(self, comp_i: int, frame):
        pair = self.prefix_arrays.get(comp_i)
        if pair is None:
            nblocks = self.sizes[comp_i] // 64
            dc = _pool.acquire(nblocks, np.int16)
            ac_flat = _pool.acquire(nblocks * (self.k - 1), np.int8)
            self.native.zero_buffer(dc)
            self.native.zero_buffer(ac_flat)
            pair = (dc, ac_flat.reshape(nblocks, self.k - 1))
            self.prefix_arrays[comp_i] = pair
        return pair

    def decode_scan(self, decoder, frame, scan, finished):
        self._ensure_layout(frame)
        self.used = True
        dcs, acs, bases = [], [], []
        for pos, comp_i in enumerate(scan.component_indices):
            if finished[pos]:
                dc, ac = self._prefix_for(comp_i, frame)
                dcs.append(dc)
                acs.append(ac)
                qt = decoder._quantization_tables[
                    frame.components[comp_i].quantization_table_index]
                decoder._pending_render[comp_i] = (None, qt.copy())
            else:
                dcs.append(None)  # dummy-block case
                acs.append(None)
            bases.append(self.bases[comp_i])

        anchored = self._try_anchored(decoder, frame, scan, dcs, acs, bases)
        if anchored is not None:
            return anchored[0]

        marker, self.resid_count = self.native.decode_scan_dct_prefix(
            decoder._cursor, frame, scan,
            decoder._dc_huffman_tables, decoder._ac_huffman_tables,
            decoder._restart_interval, dcs, acs, bases, self.k,
            self.resid_idx, self.resid_vals, self.resid_count)
        return marker

    def _try_anchored(self, decoder, frame, scan, dcs, acs, bases):
        """Prescan + multi-thread anchored decode of one baseline scan.
        Returns (marker,) on success (cursor already past the scan) or None
        to run the serial path — on kernel fallback the cursor is restored
        and the prefix outputs are re-zeroed by the kernel itself."""
        import os

        from ..parser import CodingProcess
        if not _anchored_enabled():
            return None
        if frame.coding_process == CodingProcess.DCT_PROGRESSIVE:
            return None
        if (decoder._restart_interval > 0
                or scan.spectral_selection_start != 0
                or scan.spectral_selection_end != 64
                or scan.successive_approximation_high != 0
                or scan.successive_approximation_low != 0):
            return None
        if not hasattr(self.native, "decode_scan_dct_prefix_anchored"):
            return None

        from ..entropy.device_scan import (K_CAP, S_MAX, S_TARGET,
                                           _prescan_geometry,
                                           scan_decode_luts)
        geometry = _prescan_geometry(frame, scan, 0)
        # Cores available to THIS image's intra-image threads: siblings in
        # the staging pool already decode other images concurrently, and
        # oversubscribing on top measurably loses (pooled 5-worker burst
        # 678 -> 464 Mpix/s with anchored forced on, 4 cores).
        nt = min((os.cpu_count() or 1) // self.pool_width, 8)
        n_mcus = geometry["est_blocks"] // len(geometry["pattern"])
        if nt < 2 or n_mcus < 8 * nt:
            return None

        luts = scan_decode_luts(scan, decoder._dc_huffman_tables,
                                decoder._ac_huffman_tables)
        if luts is None:
            return None

        cursor = decoder._cursor
        pos0 = cursor.pos
        res = self.native.prescan_baseline(cursor, luts, geometry,
                                           S_TARGET, K_CAP, S_MAX)
        if res is None:
            cursor.pos = pos0
            return None
        out_bytes, a_bits, a_block, a_slot, _n_blocks, pending, _, _ = res
        count = self.native.decode_scan_dct_prefix_anchored(
            cursor, frame, scan, decoder._dc_huffman_tables,
            decoder._ac_huffman_tables, dcs, acs, bases, self.k,
            self.resid_idx, self.resid_vals, self.resid_count,
            out_bytes, a_bits, a_block, a_slot)
        if count is None:
            cursor.pos = pos0
            return None
        self.resid_count = count
        return (pending,)

    def release(self) -> None:
        for dc, ac in self.prefix_arrays.values():
            _pool.release(dc)
            _pool.release(ac.reshape(-1))
        if self.resid_idx is not None:
            _pool.release(self.resid_idx)
            _pool.release(self.resid_vals)


def _staged_from_capture(d: Decoder, capture: PrefixCapture, precision: str,
                         pooled: list) -> StagedImage:
    from ..errors import FormatError

    frame = d.frame
    n = len(frame.components)
    if any(i not in d._pending_render for i in range(n)):
        capture.release()
        for buf in pooled:
            _pool.release(buf)
        raise FormatError("not all components have data")

    transform = None if n == 1 else d._determine_color_transform()
    geometry = geometry_from_frame(frame, transform, precision=precision)
    qts = tuple(d._pending_render[i][1] for i in range(n))

    total_blocks = capture.total // 64
    dc = np.empty(total_blocks, np.int16)
    ac = np.empty((total_blocks, capture.k - 1), np.int8)
    row = 0
    for i in range(n):
        nblocks = capture.sizes[i] // 64
        pair = capture.prefix_arrays.get(i)
        if pair is None:
            dc[row:row + nblocks] = 0
            ac[row:row + nblocks] = 0
        else:
            dc[row:row + nblocks] = pair[0]
            ac[row:row + nblocks] = pair[1]
        row += nblocks

    r = capture.resid_count
    bucket = _bucket(r)
    resid_idx = np.full(bucket, capture.total, np.int32)
    resid_vals = np.zeros(bucket, np.int16)
    resid_idx[:r] = capture.resid_idx[:r]
    resid_vals[:r] = capture.resid_vals[:r]

    capture.release()
    for buf in pooled:
        _pool.release(buf)

    info = d.info()
    return StagedImage(geometry, dc, ac, resid_idx, resid_vals, qts,
                       capture.total, info.width * info.height / 1e6)


def stage_host(source, scale_to=None, precision: str = "fast",
               timer=None, pool_width: int = 1) -> StagedImage:
    """Host stages for one image: parse + entropy + prefix/residual pack.

    `timer` (a `utils.timing.StageTimer`) records this as the "host_stage"
    stage — the per-stage observability layer the reference lacks
    (SURVEY.md §5). `pool_width` tells the anchored intra-image threads how
    many sibling staging workers share the cores (see _try_anchored)."""
    if timer is not None:
        with timer.stage("host_stage"):
            return stage_host(source, scale_to, precision, None, pool_width)
    from ..entropy.native import get_native
    native = get_native()

    d = Decoder(source, backend="numpy")
    pooled: list = []
    capture = None
    if native is not None:
        def alloc(size: int) -> np.ndarray:
            buf = _pool.acquire(size, np.int16)
            native.zero_buffer(buf)
            pooled.append(buf)
            return buf
        d._store_allocator = alloc
        capture = PrefixCapture(native, pool_width=pool_width)
        d._prefix_capture = capture
    ll_cap = _LosslessCapture()
    d._lossless_capture = ll_cap

    if scale_to is not None:
        d.scale(*scale_to)
    d._decode_entropy_only()

    if ll_cap.scans:
        for buf in pooled:
            _pool.release(buf)
        return _staged_lossless_from_capture(d, ll_cap)
    if capture is not None and capture.used:
        return _staged_from_capture(d, capture, precision, pooled)

    n_comp = len(d.frame.components) if d.frame is not None else 0
    if n_comp == 0 or any(i not in d._pending_render for i in range(n_comp)):
        for buf in pooled:
            _pool.release(buf)
        from ..errors import FormatError
        raise FormatError("not all components have data")
    n = len(d.frame.components)
    stores = [d._pending_render[i][0].reshape(-1) for i in range(n)]
    qts = tuple(d._pending_render[i][1] for i in range(n))
    transform = None if n == 1 else d._determine_color_transform()
    geometry = geometry_from_frame(d.frame, transform, precision=precision)

    nblocks = [s.size // 64 for s in stores]
    total_blocks = sum(nblocks)
    total = total_blocks * 64

    dc = np.empty(total_blocks, np.int16)
    ac = np.empty((total_blocks, PREFIX_K - 1), np.int8)
    scratch_idx = _pool.acquire(total, np.int32)
    scratch_vals = _pool.acquire(total, np.int16)

    r = 0
    brow = 0
    base = 0
    if native is not None:
        for s, nb in zip(stores, nblocks):
            r += native.pack_prefix(s, nb, PREFIX_K, base,
                                    dc[brow:brow + nb], ac[brow:brow + nb],
                                    scratch_idx[r:], scratch_vals[r:])
            brow += nb
            base += s.size
    else:
        zz = np.asarray(UNZIGZAG)
        for s, nb in zip(stores, nblocks):
            blocks = s.reshape(nb, 64)
            zzb = blocks[:, zz].astype(np.int32)
            dc[brow:brow + nb] = zzb[:, 0].astype(np.int16)
            sat = np.clip(zzb[:, 1:PREFIX_K], -128, 127)
            ac[brow:brow + nb] = sat.astype(np.int8)
            # int8 saturation corrections ride the residual.
            ebi, ezi = np.nonzero(zzb[:, 1:PREFIX_K] != sat)
            cnt = len(ebi)
            scratch_idx[r:r + cnt] = base + ebi * 64 + zz[1 + ezi]
            scratch_vals[r:r + cnt] = (zzb[:, 1:PREFIX_K] - sat)[ebi, ezi]
            r += cnt
            tail = zzb[:, PREFIX_K:]
            bi, zi = np.nonzero(tail)
            cnt = len(bi)
            scratch_idx[r:r + cnt] = base + bi * 64 + zz[PREFIX_K + zi]
            scratch_vals[r:r + cnt] = tail[bi, zi]
            r += cnt
            brow += nb
            base += s.size

    bucket = _bucket(r)
    resid_idx = np.full(bucket, total, np.int32)  # out-of-range: dropped
    resid_vals = np.zeros(bucket, np.int16)
    resid_idx[:r] = scratch_idx[:r]
    resid_vals[:r] = scratch_vals[:r]
    _pool.release(scratch_idx)
    _pool.release(scratch_vals)
    for buf in pooled:
        _pool.release(buf)

    info = d.info()
    return StagedImage(geometry, dc, ac, resid_idx, resid_vals, qts, total,
                       info.width * info.height / 1e6)


@dataclasses.dataclass
class StagedBits:
    """One image staged in the compressed-bits interchange: the entropy-coded
    bytes themselves plus anchors; Huffman decode runs on device
    (entropy/device_scan.py). ~0.2-0.4 B/px of H2D traffic vs ~0.9 for the
    prefix interchange — the sustained-throughput lever."""
    geometry: ImageGeometry
    scans: tuple      # ((AnchoredScan, kept_comp_indices), ...)
    qts: tuple
    mpix: float
    # Pre-packed Pallas class layout per scan: (combined_arrays, class_shapes)
    # or None — built in the staging thread pool so the dispatch thread only
    # does device_put + dispatch.
    pallas: tuple = None


class BitstreamCapture:
    """Decoder hook staging baseline scans as anchored bitstreams. Raises
    PrescanFallback (caught by stage_host) when any scan needs host
    semantics — the whole image then restages through the prefix path."""

    def __init__(self):
        self.scans: list = []
        self.used = False

    def wants(self, frame) -> bool:
        return True

    def decode_scan(self, decoder, frame, scan, finished):
        from ..entropy.device_scan import prescan_baseline

        marker, staged = prescan_baseline(
            decoder._cursor, frame, scan,
            decoder._dc_huffman_tables, decoder._ac_huffman_tables,
            decoder._restart_interval)
        self.used = True
        kept = []
        for pos, comp_i in enumerate(scan.component_indices):
            if finished[pos]:
                kept.append((pos, comp_i))
                qt = decoder._quantization_tables[
                    frame.components[comp_i].quantization_table_index]
                decoder._pending_render[comp_i] = (None, qt.copy())
        self.scans.append((staged, tuple(kept)))
        return marker


def stage_host_bits(source, scale_to=None, precision: str = "fast",
                    timer=None, pool_width: int = 1):
    """Stage one image in the compressed-bits interchange; falls back to the
    prefix interchange (stage_host) when the stream needs host entropy
    semantics (progressive, lossless, malformed, quirk paths). `pool_width`
    reaches the fallback's anchored-thread gate (see stage_host)."""
    from ..entropy.device_scan import PrescanFallback
    from ..errors import FormatError

    if timer is not None:
        with timer.stage("host_stage"):
            return stage_host_bits(source, scale_to, precision, None,
                                   pool_width)

    d = Decoder(source, backend="numpy")
    capture = BitstreamCapture()
    d._prefix_capture = capture
    ll_cap = _LosslessCapture()
    d._lossless_capture = ll_cap
    try:
        if scale_to is not None:
            d.scale(*scale_to)
        d._decode_entropy_only()
    except PrescanFallback:
        # Quirk baseline stream: re-decode on the host (oracle semantics),
        # then re-encode the stores into the bits format (transcode). Only
        # when that fails too does the image ship as prefix coefficients.
        return _stage_host_decoded_bits(source, scale_to, precision)
    if ll_cap.scans:
        # Lossless frame: ship the difference planes, reconstruct on device.
        return _staged_lossless_from_capture(d, ll_cap)
    if not capture.used:
        if d.frame is not None and d.frame.coding_process \
                == CodingProcess.DCT_PROGRESSIVE:
            # Progressive image: the host oracle already decoded it into
            # dense stores — transcode them into the bits format.
            from ..entropy.transcode import transcode_decoded
            st = transcode_decoded(d, precision)
            if st is not None:
                return _attach_pallas(st)
        return stage_host(source, scale_to, precision,
                          pool_width=pool_width)

    frame = d.frame
    n = len(frame.components)
    if any(i not in d._pending_render for i in range(n)):
        raise FormatError("not all components have data")
    transform = None if n == 1 else d._determine_color_transform()
    geometry = geometry_from_frame(frame, transform, precision=precision)
    qts = tuple(d._pending_render[i][1] for i in range(n))
    info = d.info()

    return _attach_pallas(StagedBits(geometry, tuple(capture.scans), qts,
                                     info.width * info.height / 1e6))


@dataclasses.dataclass
class StagedLossless:
    """Lossless (SOF3) image staged for device reconstruction: the host runs
    only the Huffman difference decode (C++ jt_decode_scan_lossless); the
    predictor recurrences run on device (ops/predictors.py closed forms, or
    the anti-diagonal wavefront for predictors 5-7 / point transforms),
    bit-identical to /root/reference/src/decoder/lossless.rs:108-226.

    The wire is the difference plane reduced mod 2^16 (uint16, 2 B/sample):
    every predictor computes (prediction + diff) & 0xFFFF, so only the
    diff's low 16 bits can reach the output."""
    diffs: np.ndarray       # uint16 [ncomp, H, W]
    predictor: int
    point_transform: int
    precision: int
    restart_all: bool       # the reference's stale phase-2 restart flag
    out_width: int
    out_height: int
    mpix: float

    @property
    def group_key(self) -> tuple:
        return ("lossless", self.diffs.shape, self.predictor,
                self.point_transform, self.precision, self.restart_all,
                self.out_width, self.out_height)


class _LosslessCapture:
    """Decoder hook (decoder.py _process_scan_lossless): captures the decoded
    difference planes instead of reconstructing them on the host."""

    def __init__(self):
        self.scans = []

    def wants(self, frame, scan) -> bool:
        return True

    def capture_scan(self, decoder, frame, scan, diffs, restart_all, marker):
        self.scans.append((frame, scan, diffs, restart_all))
        return marker


def _staged_lossless_from_capture(d: Decoder, cap: _LosslessCapture
                                  ) -> StagedLossless:
    from ..errors import FormatError
    from ..parser import Predictor

    if len(cap.scans) != 1:
        raise FormatError("multi-scan lossless stays host-side")
    frame, scan, diffs, restart_all = cap.scans[0]
    if len(scan.component_indices) != len(frame.components):
        raise FormatError("partial-component lossless scan stays host-side")
    predictor = scan.predictor_selection
    pt = scan.point_transform
    if predictor == Predictor.RA and pt != 0:
        # The reference's Ra fast path has its own dispatch-order semantics
        # and the pt != 0 windowed chain has no device form — host oracle
        # owns this rare configuration (see decoder._reconstruct_lossless_device).
        raise FormatError("Ra with point transform stays host-side")
    out_w = frame.output_size.width
    out_h = frame.output_size.height
    ncomp = diffs.shape[0]
    if ncomp == 1 and diffs.shape[1:] != (out_h, out_w):
        raise FormatError("scaled single-component lossless stays host-side")
    info = d.info()
    return StagedLossless(
        diffs=(diffs & 0xFFFF).astype(np.uint16),
        predictor=int(predictor), point_transform=pt,
        precision=frame.precision, restart_all=bool(restart_all),
        out_width=out_w, out_height=out_h,
        mpix=info.width * info.height / 1e6)


def stage_host_lossless(source, scale_to=None, precision: str = "fast",
                        timer=None) -> StagedLossless:
    """Host stages for one lossless image: parse + Huffman difference decode.
    Raises a typed FormatError for configurations the device path declines
    (multi-scan, partial-component, Ra with point transform)."""
    from ..errors import FormatError

    if timer is not None:
        with timer.stage("host_stage"):
            return stage_host_lossless(source, scale_to, precision, None)
    d = Decoder(source, backend="numpy")
    cap = _LosslessCapture()
    d._lossless_capture = cap
    if scale_to is not None:
        d.scale(*scale_to)
    d._decode_entropy_only()
    if not cap.scans:
        raise FormatError("not a lossless stream")
    return _staged_lossless_from_capture(d, cap)


@functools.lru_cache(maxsize=32)
def _compiled_lossless_pipeline(ncomp: int, predictor_val: int, pt: int,
                                precision: int, restart_all: bool,
                                out_w: int, out_h: int,
                                batch, mesh=None, data_axis: str = "data"):
    """Device lossless reconstruction: per-component predictor recurrence +
    interleave/narrow assembly (decoder.py _compute_image_lossless semantics,
    /root/reference/src/decoder/lossless.rs:228-260), vmapped over the batch
    and optionally sharded over a mesh data axis."""
    import jax
    import jax.numpy as jnp

    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)
    from ..ops.predictors import (device_supported,
                                  reconstruct_lossless_device,
                                  reconstruct_lossless_wavefront)
    from ..parser import Predictor
    predictor = Predictor(predictor_val)

    def recon(plane):
        if (predictor == Predictor.RA or restart_all
                or device_supported(predictor, pt)):
            return reconstruct_lossless_device(plane, predictor, pt,
                                               precision, restart_all, jnp)
        return reconstruct_lossless_wavefront(plane, predictor, pt,
                                              precision, jnp)

    def run_one(diffs):
        planes = [recon(diffs[i]) for i in range(ncomp)]
        if ncomp == 1:
            img = planes[0]
        else:
            # Element-count-bound interleave (row-major prefix when scaling
            # shrank output_size), mirroring lossless.rs:240-246.
            count = out_w * out_h
            flats = [p.reshape(-1)[:count] for p in planes]
            img = jnp.stack(flats, axis=-1).reshape(out_h, out_w, ncomp)
        if precision == 8:
            return img.astype(jnp.uint8)
        return img

    if batch is None:
        return jax.jit(run_one)
    batched = jax.vmap(run_one)
    if mesh is None:
        return jax.jit(batched)
    from jax.sharding import NamedSharding, PartitionSpec as PS
    sharded = NamedSharding(mesh, PS(data_axis))
    return jax.jit(batched, in_shardings=(sharded,), out_shardings=sharded)


def _bits_wire() -> str:
    """Interchange wire format for the Pallas bits path: "slots" ships the
    host-packed slot tiles (~1.5-1.7x the compressed stream — overlap +
    class padding); "words" ships the compressed words once plus 12 B/chunk
    and materialises the tiles on device (a row gather + shift);
    "words-packed" packs the chunk metadata into 8 B (entry bit +
    budget|slot0|base<<9, reconstructed on device); "delta" (default since
    round 4: the sustained metric tracks wire bytes 1:1) packs it into
    4 B — anchor-bit delta | budget | slot0 in one u32, everything else
    rebuilt on device by cumsum/argsort (pack_delta). Scans a narrower
    wire can't encode degrade to the next wider one per scan. All wires
    are bit-exact vs the prefix path on hardware
    (tools/experiments/tpu_queue.py, wire_ab.py)."""
    return os.environ.get("JPEG_TPU_WIRE", "delta")


def _wire_flag(wire: str):
    """Map a wire name to build_pallas_sweep's device_slots parameter
    (legacy bool for slots/words wires, the string for delta)."""
    return "delta" if wire == "delta" else wire.startswith("words")


def _put_recorded(arrs) -> tuple:
    """device_put a tuple of arrays, folding the observed transfer rate
    into utils.link's EMA when the payload is big enough to time bandwidth.
    Never adds a sync: where device_put is asynchronous the elapsed time is
    ~0 and the sample is ignored by construction (record_transfer's rate is
    then absurd-high and only nudges the EMA toward "healthy", the default
    belief); through the blocking relay of this environment the put call
    itself waits on the wire, so the sample is the real link rate."""
    import time as _time

    import jax

    from ..utils import link as _link
    nbytes = sum(a.nbytes for a in arrs)
    t0 = _time.perf_counter()
    out = tuple(jax.device_put(a) for a in arrs)
    if nbytes >= (4 << 20):
        _link.record_transfer(nbytes, _time.perf_counter() - t0)
    return out


def _attach_pallas(st: "StagedBits") -> "StagedBits":
    """Pre-pack the Pallas class layout for every scan (runs in the staging
    thread pool so the dispatch thread only does device_put + dispatch)."""
    if not _bits_pallas_enabled():
        return st
    from ..entropy.pallas_decode import (combine_packs, combine_packs_words,
                                         pack_classes, pack_delta)
    wire = _bits_wire()
    words_wire = wire.startswith("words") or wire == "delta"
    # base<<9 must stay within the uint32 wrap discipline incl. batch-merge
    # offsets (23 bits); effectively unreachable (8.3M blocks = 530 Mpix)
    # but a quirk-size stream degrades gracefully to the 12 B/chunk wire.
    per_scan = []
    for scan, _kept in st.scans:
        if wire == "delta":
            packed = pack_delta(scan)
            if packed is not None:
                per_scan.append((packed[0], packed[1], "delta"))
                continue
            # Delta-ineligible scan (overflowing field / quirk spans):
            # degrade this scan to the 8 B/chunk wire.
        packs = pack_classes(scan, wire="words" if words_wire else "slots")
        if packs is None:
            per_scan.append(None)
        else:
            shapes = tuple(
                (p.slot_words, p.s_max, p.meta.size, p.n_items)
                for p in packs)
            if words_wire:
                want_packed = wire in ("words-packed", "delta")
                compact = want_packed and scan.n_blocks < (1 << 22)
                eff_wire = "words-packed" if compact else "words"
                combined = combine_packs_words(packs, scan.words,
                                               scan.n_words,
                                               compact=compact)
            else:
                eff_wire = wire
                combined = combine_packs(packs)
            per_scan.append((combined, shapes, eff_wire))
    st.pallas = tuple(per_scan)
    return st


def _stage_host_decoded_bits(source, scale_to, precision: str):
    """Full host decode into dense stores, then transcode into the bits
    interchange; prefix fallback when the transcoder declines."""
    from ..entropy.transcode import transcode_decoded

    d = Decoder(source, backend="numpy")
    if scale_to is not None:
        d.scale(*scale_to)
    d._decode_entropy_only()
    st = transcode_decoded(d, precision)
    if st is not None:
        return _attach_pallas(st)
    return stage_host(source, scale_to, precision)


@functools.lru_cache(maxsize=128)
def _compiled_bits_pipeline(plans_with_comps: tuple, ncomp: int,
                            geometry: ImageGeometry, layout: str,
                            pallas_shapes: tuple = None,
                            interpret: bool = False,
                            pack16: bool = None):
    """Fused device dispatch: anchored entropy decode for every scan +
    dequant/IDCT/upsample/color — one jit, pixels stay in HBM.

    `pallas_shapes`: per scan, either None (XLA lax.scan decoder) or
    (class_shapes, n_tab, comp_to_upair, device_slots) for the Pallas kernel
    path (entropy/pallas_decode.py) — same assembler, bit-identical
    stores. device_slots: the wire carries compressed words; slot tiles are
    materialised on device (wire="words")."""
    import jax
    import jax.numpy as jnp

    from ..entropy.device_scan import build_anchored_decoder
    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)

    decoders = []
    for i, (plan, _kept) in enumerate(plans_with_comps):
        pshape = pallas_shapes[i] if pallas_shapes else None
        if pshape is not None:
            from ..entropy.pallas_decode import build_pallas_decoder
            class_shapes, n_tab, comp_to_upair, device_slots = pshape
            decoders.append(("pallas", build_pallas_decoder(
                plan, class_shapes, n_tab, flat_stores=False,
                interpret=interpret,
                comp_to_upair=comp_to_upair, device_slots=device_slots,
                pack16=pack16)))
        else:
            decoders.append(("xla", build_anchored_decoder(
                plan, flat_stores=False)))

    def run(scan_args, qts):
        stores = [None] * ncomp
        for (kind, decoder_fn), (plan, kept), args in zip(
                decoders, plans_with_comps, scan_args):
            scan_stores = decoder_fn(*args)
            for pos, comp_i in kept:
                stores[comp_i] = scan_stores[pos]
        if layout == "planar-pallas":
            from ..ops.pallas_kernels import reconstruct_planar_pallas
            return reconstruct_planar_pallas(geometry, stores, qts,
                                             interpret=interpret or None)
        out = _reconstruct(geometry, stores, qts, jnp)
        if layout == "planar" and out.ndim == 3:
            return jnp.transpose(out, (2, 0, 1))
        return out

    return jax.jit(run)


@functools.lru_cache(maxsize=128)
def _compiled_bits_pipeline_batched(plan, n_images: int, class_shapes: tuple,
                                    n_tab: int, comp_to_upair: tuple,
                                    geometry: ImageGeometry, layout: str,
                                    device_slots: bool = False,
                                    interpret: bool = False,
                                    pack16: bool = None):
    """Batched bits-interchange dispatch: one merged Pallas chunk sweep over
    n_images same-plan images (merge_image_packs), vmapped assembly +
    reconstruction. Sub-megapixel images are dominated by per-dispatch
    RPC/launch overhead; this amortizes it across the group."""
    import jax
    import jax.numpy as jnp

    from ..entropy.pallas_decode import build_pallas_decoder
    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)

    decoder = build_pallas_decoder(plan, class_shapes, n_tab,
                                   flat_stores=False,
                                   interpret=interpret,
                                   comp_to_upair=comp_to_upair,
                                   n_images=n_images,
                                   device_slots=device_slots,
                                   pack16=pack16)

    def recon_one(stores, qts):
        if layout == "planar-pallas":
            from ..ops.pallas_kernels import reconstruct_planar_pallas
            return reconstruct_planar_pallas(geometry, stores, qts,
                                             interpret=interpret or None)
        out = _reconstruct(geometry, stores, qts, jnp)
        if layout == "planar" and out.ndim == 3:
            return jnp.transpose(out, (2, 0, 1))
        return out

    def run(combined, mc, dl, vv, qts_b):
        stores_b = decoder(combined, mc, dl, vv)  # per comp [N, nb_c, 64]
        return jax.vmap(recon_one)(tuple(stores_b), qts_b)

    return jax.jit(run)


@functools.lru_cache(maxsize=64)
def _compiled_bits_sweep(class_shapes: tuple, n_tab: int, pattern: tuple,
                         n_blocks: int, device_slots: bool, interpret: bool,
                         pack16: bool = None):
    """One jitted kernel sweep over a (possibly mixed-plan) merged pack:
    returns the stream-order [n_blocks, 64] int16 coefficient tensor.
    Keyed only by bucketed shapes — a mixed stream's composition never
    recompiles the sweep."""
    import jax

    from ..entropy.pallas_decode import build_pallas_sweep
    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)
    return jax.jit(build_pallas_sweep(class_shapes, n_tab, pattern, n_blocks,
                                      device_slots=device_slots,
                                      interpret=interpret,
                                      pack16=pack16))


@functools.lru_cache(maxsize=64)
def _compiled_nat_reconstruct(plan, count_bucket: int,
                              geometry: ImageGeometry, layout: str,
                              interpret: bool):
    """Assembly + reconstruction of `count_bucket` same-plan images from a
    dynamic slice of the heterogeneous sweep's coefficient tensor. The slice
    offset is a runtime scalar, so compile keys depend only on
    (plan, bucketed count) — not on where the images sit in the merge."""
    import jax
    import jax.numpy as jnp

    from ..entropy.pallas_decode import build_assembler_nat
    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)

    assemble = build_assembler_nat(plan, flat_stores=False)

    def recon_one(stores, qts):
        if layout == "planar-pallas":
            from ..ops.pallas_kernels import reconstruct_planar_pallas
            return reconstruct_planar_pallas(geometry, stores, qts,
                                             interpret=interpret or None)
        out = _reconstruct(geometry, stores, qts, jnp)
        if layout == "planar" and out.ndim == 3:
            return jnp.transpose(out, (2, 0, 1))
        return out

    nb = plan.n_blocks

    def run(nat, off, qts_b):
        seg = jax.lax.dynamic_slice(nat, (off, 0), (count_bucket * nb, 64))
        stores_b = jax.vmap(assemble)(seg.reshape(count_bucket, nb, 64))
        return jax.vmap(recon_one)(tuple(stores_b), qts_b)

    return jax.jit(run)


def _bits_hetero_key(st: "StagedBits"):
    """Images sharing this key can merge into ONE kernel sweep even with
    different plans/geometries (mixed sizes from the same encoder): the
    sweep's kernels depend only on the mapped slot pattern and the Huffman
    tables; per-plan assembly/reconstruction run from slices of the sweep
    output (_decode_group_bits_hetero). A superset of _bits_group_key —
    same-plan members still take the uniform vmapped path."""
    if len(st.scans) != 1:
        return None
    scan, kept = st.scans[0]
    if len(kept) != len(st.qts):
        return None
    if not st.pallas or st.pallas[0] is None:
        return None
    plan = scan.plan
    mapped_pattern = tuple(scan.comp_to_upair[c] for c in plan.pattern)
    return (mapped_pattern, kept, len(st.qts), st.pallas[0][2],
            scan.tab_maxcode.tobytes(), scan.tab_delta.tobytes(),
            scan.tab_values.tobytes())


def _bits_group_key(st: "StagedBits", mesh_mode: bool = False):
    """Images sharing this key can merge into one batched bits dispatch:
    single scan covering every component, same geometry, same Huffman
    tables (one table set binds the whole dispatch), same kept-component
    mapping. None = dispatch singly.

    mesh_mode (DeviceStreamDecoder(mesh=...)): the batch stacks the
    bucket-padded per-image anchor arrays and shards them over the data
    axis, so the FULL plan (bucket sizes included) must match; the
    single-device merge only needs the bucket-independent plan shape plus
    Pallas-eligible packs."""
    if len(st.scans) != 1:
        return None
    scan, kept = st.scans[0]
    if len(kept) != len(st.qts):
        return None
    if mesh_mode:
        if scan.luts is None:
            return None
        # Key on the actual LUT bytes (cached on the scan) — a 64-bit hash
        # collision would silently decode a group with the wrong tables.
        lkey = getattr(scan, "_luts_key", None)
        if lkey is None:
            lkey = scan.luts.tobytes()
            scan._luts_key = lkey
        return (st.geometry, scan.plan, kept, len(st.qts), lkey)
    if not st.pallas or st.pallas[0] is None:
        return None
    # st.pallas[0][2] is the wire format the image was staged with: the
    # staging pool reads JPEG_TPU_WIRE per image, so a mid-stream flip (the
    # A/B harness does exactly this) must not merge slots- and words-staged
    # images into one batch — their combined-array layouts differ.
    return (st.geometry, scan.plan._key[:-3], kept, scan.comp_to_upair,
            len(st.qts), st.pallas[0][2],
            scan.tab_maxcode.tobytes(), scan.tab_delta.tobytes(),
            scan.tab_values.tobytes(), scan.luts.shape)


@functools.lru_cache(maxsize=64)
def _compiled_bits_pipeline_mesh_pallas(plan, kept: tuple, batch: int,
                                        class_shapes: tuple, n_tab: int,
                                        comp_to_upair: tuple, ncomp: int,
                                        geometry: ImageGeometry, layout: str,
                                        device_slots: bool, n_combined: int,
                                        mesh, data_axis: str,
                                        interpret: bool = False,
                                        pack16: bool = None):
    """Mesh-sharded batched bits dispatch on the PALLAS engine: per-image
    packed class buffers stack along the image axis and shard over
    `data_axis`; inside shard_map each device runs the single-image Pallas
    pipeline over its local shard (a static loop — pallas_call stays
    un-vmapped). Requires every image in the group to share the bucketed
    class shapes and wire format (heterogeneous groups take the XLA mesh
    path). Tables are replicated."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec

    from ..entropy.pallas_decode import build_pallas_decoder
    from ..ops.pipeline import _enable_compile_cache
    from ..parallel.stripes import _shard_map, _shard_map_uncheck_kwargs
    _enable_compile_cache(jax)
    shard_map = _shard_map()

    decoder = build_pallas_decoder(plan, class_shapes, n_tab,
                                   flat_stores=False, interpret=interpret,
                                   comp_to_upair=comp_to_upair,
                                   device_slots=device_slots,
                                   pack16=pack16)
    ndev = int(mesh.shape[data_axis])
    local_b = batch // ndev

    def recon_one(stores, qts):
        if layout == "planar-pallas":
            from ..ops.pallas_kernels import reconstruct_planar_pallas
            return reconstruct_planar_pallas(geometry, stores, qts,
                                             interpret=interpret or None)
        out = _reconstruct(geometry, stores, qts, jnp)
        if layout == "planar" and out.ndim == 3:
            return jnp.transpose(out, (2, 0, 1))
        return out

    def shard_fn(combined_l, mc, dl, vv, qts_l):
        outs = []
        for i in range(local_b):
            scan_stores = decoder(tuple(a[i] for a in combined_l),
                                  mc, dl, vv)
            stores = [None] * ncomp
            for pos, comp_i in kept:
                stores[comp_i] = scan_stores[pos]
            outs.append(recon_one(tuple(stores),
                                  tuple(q[i] for q in qts_l)))
        return jnp.stack(outs)

    data = PartitionSpec(data_axis)
    repl = PartitionSpec()
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=((data,) * n_combined, repl, repl, repl,
                             (data,) * ncomp),
                   out_specs=data,
                   **_shard_map_uncheck_kwargs(shard_map))
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _compiled_bits_pipeline_batched_mesh(plan, kept: tuple, batch: int,
                                         ncomp: int, geometry: ImageGeometry,
                                         layout: str, mesh, data_axis: str):
    """Mesh-sharded batched bits dispatch: the XLA anchored decoder (whose
    per-image arrays are bucket-stable, so images stack) vmapped over the
    image axis and sharded over `data_axis` — each chip Huffman-decodes and
    reconstructs its shard of the batch from ~0.2-0.4 B/px of compressed
    input. LUTs are replicated (shipped once via the device cache)."""
    import jax
    import jax.numpy as jnp

    from ..entropy.device_scan import build_anchored_decoder
    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)

    decoder = build_anchored_decoder(plan, flat_stores=False)

    def run_one(words, a_bits, a_block, a_slot, qts, luts):
        scan_stores = decoder(words, a_bits, a_block, a_slot, luts)
        stores = [None] * ncomp
        for pos, comp_i in kept:
            stores[comp_i] = scan_stores[pos]
        if layout == "planar-pallas":
            from ..ops.pallas_kernels import reconstruct_planar_pallas
            return reconstruct_planar_pallas(geometry, stores, qts)
        out = _reconstruct(geometry, stores, qts, jnp)
        if layout == "planar" and out.ndim == 3:
            return jnp.transpose(out, (2, 0, 1))
        return out

    batched = jax.vmap(run_one, in_axes=(0, 0, 0, 0, 0, None))
    from jax.sharding import NamedSharding, PartitionSpec as PS
    sharded = NamedSharding(mesh, PS(data_axis))
    repl = NamedSharding(mesh, PS())
    return jax.jit(
        batched,
        in_shardings=(sharded, sharded, sharded, sharded,
                      (sharded,) * ncomp, repl),
        out_shardings=sharded)


class DeviceStreamDecoder:
    """Streaming decode-to-device: returns device arrays, never reads back."""

    def __init__(self, host_threads: int = 4, precision: str = "fast",
                 layout: str = "interleaved", timer=None,
                 interchange: str = "prefix", mesh=None,
                 data_axis: str = "data"):
        """layout: "interleaved" ([H, W, C]); "planar" ([C, H, W], device
        transpose); "planar-pallas" ([C, H, W] via the fully-Pallas 4:2:0
        tail — MXU IDCT + fused upsample/color kernels — falling back to
        "planar" for unsupported geometries).

        `interchange`: "prefix" ships decoded coefficients (~0.9 B/px,
        round-1 format); "bits" ships the entropy-coded bytes themselves
        (~0.2 B/px) and runs Huffman decode on the device — the sustained-
        throughput path. Images the device engine can't take (progressive,
        lossless, quirk streams) transparently restage through "prefix".

        `mesh`: optional `jax.sharding.Mesh`; batched dispatches shard the
        image-batch axis over `data_axis` (mesh data parallelism composed
        with the streaming service — decoded batches live sharded in the
        mesh's HBM). Use batch_size >= mesh data-axis size.

        `timer`: optional `utils.timing.StageTimer`; records "host_stage"
        (parse + entropy/prescan + pack, per image), "h2d_submit"
        (device_put submission) and "device_dispatch" (async jit dispatch).
        Device execution itself is asynchronous — end-to-end wall time is
        the caller's to measure after block_until_ready."""
        if interchange not in ("prefix", "bits"):
            raise ValueError(f"unknown interchange {interchange!r}")
        self.pool = cf.ThreadPoolExecutor(max_workers=host_threads)
        self.host_threads = host_threads
        self.precision = precision
        self.layout = layout
        self.timer = timer
        self.interchange = interchange
        self.mesh = mesh
        self.data_axis = data_axis

    @contextlib.contextmanager
    def _stage(self, name: str):
        if self.timer is None:
            yield
        else:
            with self.timer.stage(name):
                yield

    def _effective_layout(self, geometry) -> str:
        """planar-pallas downgrades to plain planar for geometries the fused
        Pallas tail doesn't cover — one rule for every dispatch shape."""
        if self.layout == "planar-pallas":
            from ..ops.pallas_kernels import is_420_ycbcr
            if not is_420_ycbcr(geometry):
                return "planar"
        return self.layout

    def decode_striped(self, source, scale_to=None,
                       stripe_axis: str = "stripe", engine: str = None):
        """Decode ONE image with its MCU rows — entropy decode included —
        sharded over the mesh's `stripe_axis` (parallel/stripe_bits.py):
        each device Huffman-decodes its stripe's anchored chunks, assembles
        with the DC seam carry, and reconstructs behind a 1-row halo
        exchange. The pod-scale path for images too large for one chip.
        Returns the device pixel array (rows sharded over the stripe axis);
        falls back to the single-device pipeline when the mesh has no such
        axis or the image isn't stripe-eligible. Reconstruction runs the
        exact integer kernels (same contract as parallel/stripes.py)."""
        staged = stage_host_bits(source, scale_to, self.precision,
                                 timer=self.timer)
        if (self.mesh is not None and stripe_axis in self.mesh.shape
                and isinstance(staged, StagedBits)):
            from ..parallel.stripe_bits import decode_bits_striped
            with self._stage("device_dispatch"):
                out = decode_bits_striped(staged, self.mesh, stripe_axis,
                                          engine=engine)
            if out is not None:
                return out
        return self.decode_one(staged)

    def decode_one(self, staged):
        if isinstance(staged, StagedBits):
            return self._decode_one_bits(staged)
        if isinstance(staged, StagedLossless):
            return self._decode_one_lossless(staged)
        import jax
        layout = self._effective_layout(staged.geometry)
        fn = _compiled_prefix_pipeline(staged.geometry, len(staged.resid_idx),
                                       layout)
        with self._stage("h2d_submit"):
            args = (jax.device_put(staged.dc),
                    jax.device_put(staged.ac),
                    jax.device_put(staged.resid_idx),
                    jax.device_put(staged.resid_vals))
        with self._stage("device_dispatch"):
            return fn(*args, staged.qts)

    def _decode_one_lossless(self, st: "StagedLossless"):
        import jax
        fn = _compiled_lossless_pipeline(
            st.diffs.shape[0], st.predictor, st.point_transform,
            st.precision, st.restart_all, st.out_width, st.out_height,
            batch=None)
        with self._stage("h2d_submit"):
            d = jax.device_put(st.diffs)
        with self._stage("device_dispatch"):
            return fn(d)

    def _decode_group_lossless(self, group: list) -> list:
        """One vmapped (optionally mesh-sharded) dispatch for a group of
        same-key lossless images — the batch-DP composition the lossless
        path previously had zero leverage from."""
        import jax

        n = len(group)
        if n == 1 and self.mesh is None:
            return [self.decode_one(group[0])]
        batch = _batch_bucket(n)
        if self.mesh is not None:
            ndev = int(self.mesh.shape[self.data_axis])
            if batch % ndev:
                batch = -(-batch // ndev) * ndev
        st0 = group[0]
        diffs = np.stack([st.diffs for st in group]
                         + [group[-1].diffs] * (batch - n))
        fn = _compiled_lossless_pipeline(
            st0.diffs.shape[0], st0.predictor, st0.point_transform,
            st0.precision, st0.restart_all, st0.out_width, st0.out_height,
            batch=batch, mesh=self.mesh, data_axis=self.data_axis)
        with self._stage("h2d_submit"):
            d = jax.device_put(diffs) if self.mesh is None else diffs
        with self._stage("device_dispatch"):
            out = fn(d)
        return [out[i] for i in range(n)]

    # Device-resident LUT cache: Huffman tables repeat across images from the
    # same encoder; keyed by content so the 1MB-class LUT array ships once.
    _lut_cache: dict = {}

    def _put_luts(self, luts):
        return self._put_cached(luts)

    def _put_cached(self, arr):
        import jax
        key = (arr.shape, str(arr.dtype), hash(arr.tobytes()))
        dev = self._lut_cache.get(key)
        if dev is None:
            dev = jax.device_put(arr)
            if len(self._lut_cache) > 64:
                self._lut_cache.clear()
            self._lut_cache[key] = dev
        return dev

    def _bits_fn_args(self, staged: StagedBits):
        """Compiled full-pipeline fn + device-resident arguments for one
        bits-staged image. Shared by the dispatch path and the
        device-resident benchmark (device_resident_rate)."""
        import jax

        layout = self._effective_layout(staged.geometry)
        plans_with_comps = tuple(
            (scan.plan, kept) for scan, kept in staged.scans)

        per_scan = staged.pallas or (None,) * len(staged.scans)
        pallas_shapes = []
        for (scan, _kept), entry in zip(staged.scans, per_scan):
            if entry is None:
                pallas_shapes.append(None)
            else:
                # Strip content-dependent n_items from the compile key —
                # only the bucketed (slot_words, s_max, n_bucket) shape
                # determines the trace.
                pallas_shapes.append((tuple(s[:3] for s in entry[1]),
                                      len(scan.tab_maxcode),
                                      scan.comp_to_upair,
                                      _wire_flag(entry[2])))

        from ..entropy.pallas_decode import _pack16_enabled
        fn = _compiled_bits_pipeline(
            plans_with_comps, len(staged.qts), staged.geometry, layout,
            tuple(pallas_shapes),
            interpret=_bits_pallas_mode() == "interpret",
            pack16=_pack16_enabled())
        with self._stage("h2d_submit"):
            scan_args = []
            for (scan, _kept), entry in zip(staged.scans, per_scan):
                if entry is not None:
                    combined, _shapes, _wire = entry
                    scan_args.append((
                        _put_recorded(combined),
                        self._put_cached(scan.tab_maxcode),
                        self._put_cached(scan.tab_delta),
                        self._put_cached(scan.tab_values.view(np.int32)),
                    ))
                else:
                    scan_args.append((
                        jax.device_put(scan.words),
                        jax.device_put(scan.anchor_bits),
                        jax.device_put(scan.anchor_block),
                        jax.device_put(scan.anchor_slot),
                        self._put_luts(scan.luts)))
            scan_args = tuple(scan_args)
        return fn, scan_args

    def _decode_one_bits(self, staged: StagedBits):
        fn, scan_args = self._bits_fn_args(staged)
        with self._stage("device_dispatch"):
            return fn(scan_args, staged.qts)

    def device_resident_rate(self, source, iters: int = 64, scale_to=None,
                             reps: int = 3, pad_output: bool = False,
                             batch: int = 1):
        """Relay-phase-immune chip rate for the FULL device pipeline (entropy
        kernel + assembly + dequant/IDCT/upsample/color): `iters` decodes run
        inside ONE jitted lax.fori_loop over device-resident inputs, so a
        single dispatch RTT is amortized over all iterations and degraded
        relay round-trips (observed 4-65 ms each) cannot pollute the number.
        Two device copies of the wire alternate by iteration parity so XLA
        cannot hoist the loop-invariant decode out of the loop (see
        BASELINE.md round-3: dispatch-loop 76 ms/iter vs fori_loop 5.88 in
        the same degraded phase).

        Accepts any source the stream accepts: baseline rides the bits wire,
        progressive rides the transcode wire, lossless rides the diff wire.

        pad_output=True keeps the block-padded physical width (no exact
        crop) — measured ~neutral on v5e (the output materialization costs
        the same either way); kept for layout experiments. batch>1 merges
        `batch` copies into one kernel sweep + vmapped recon per iteration
        (the serving shape; amortizes the single-image pipeline's small
        per-class kernel grids).
        Returns {"ms_per_image", "mpix_s", "interchange"} (per image)."""
        import dataclasses as _dc
        import time as _time

        import jax
        import jax.numpy as jnp

        staged = stage_host_bits(source, scale_to, self.precision,
                                 pool_width=self.host_threads)
        if pad_output and isinstance(staged, StagedBits):
            g = staged.geometry
            wp = min(c.blocks_wide * c.dct_scale * c.h_scale
                     for c in g.components)
            hp = min(c.blocks_high * c.dct_scale * c.v_scale
                     for c in g.components)
            if (wp, hp) != (g.out_width, g.out_height):
                staged = _dc.replace(
                    staged, geometry=_dc.replace(
                        g, out_width=wp, out_height=hp,
                        components=tuple(
                            _dc.replace(c, size_width=min(
                                c.size_width + 7 & ~7, c.blocks_wide
                                * c.dct_scale),
                                size_height=min(
                                    c.size_height + 7 & ~7, c.blocks_high
                                    * c.dct_scale))
                            for c in g.components)))
        if batch > 1 and isinstance(staged, StagedBits) \
                and staged.pallas and staged.pallas[0] is not None \
                and len(staged.scans) == 1:
            # Batched variant (the serving shape): `batch` copies merged into
            # ONE kernel sweep + vmapped assembly/recon per iteration —
            # amortizes the single-image pipeline's small per-class grids.
            from ..entropy.pallas_decode import (merge_image_packs,
                                                 merge_image_packs_delta,
                                                 merge_image_packs_words)
            scan0, _kept = staged.scans[0]
            entry = staged.pallas[0]
            wire = entry[2]
            merge = (merge_image_packs_delta if wire == "delta"
                     else merge_image_packs_words if wire.startswith("words")
                     else merge_image_packs)
            combined, shapes = merge([entry[:2]] * batch,
                                     scan0.plan.n_blocks)
            layout = self._effective_layout(staged.geometry)
            from ..entropy.pallas_decode import _pack16_enabled
            fn = _compiled_bits_pipeline_batched(
                scan0.plan, batch, tuple(s[:3] for s in shapes),
                len(scan0.tab_maxcode), scan0.comp_to_upair,
                staged.geometry, layout, device_slots=_wire_flag(wire),
                interpret=_bits_pallas_mode() == "interpret",
                pack16=_pack16_enabled())
            ncomp = len(staged.qts)
            qts_b = tuple(np.stack([staged.qts[c]] * batch)
                          for c in range(ncomp))
            mc = self._put_cached(scan0.tab_maxcode)
            dl = self._put_cached(scan0.tab_delta)
            vv = self._put_cached(scan0.tab_values.view(np.int32))
            args_a = tuple(jax.device_put(a) for a in combined)
            args_b = tuple(jax.device_put(a) for a in combined)
            call = lambda args: fn(args, mc, dl, vv, qts_b)  # noqa: E731
            kind = f"bits-batch{batch}"
            eff_batch = batch
        elif isinstance(staged, StagedBits):
            fn, args_a = self._bits_fn_args(staged)
            _, args_b = self._bits_fn_args(staged)
            qts = staged.qts
            call = lambda args: fn(args, qts)  # noqa: E731
            kind = "bits"
            eff_batch = 1       # batch>1 request was ineligible: honest solo
        elif isinstance(staged, StagedLossless):
            fn = _compiled_lossless_pipeline(
                staged.diffs.shape[0], staged.predictor,
                staged.point_transform, staged.precision,
                staged.restart_all, staged.out_width, staged.out_height,
                batch=None)
            args_a = jax.device_put(staged.diffs)
            args_b = jax.device_put(staged.diffs)
            call = fn
            kind = "lossless"
            eff_batch = 1
        else:  # StagedImage — prefix coefficients
            layout = self._effective_layout(staged.geometry)
            fn = _compiled_prefix_pipeline(
                staged.geometry, len(staged.resid_idx), layout)
            mk = lambda: tuple(jax.device_put(x) for x in (  # noqa: E731
                staged.dc, staged.ac, staged.resid_idx, staged.resid_vals))
            args_a, args_b = mk(), mk()
            qts = staged.qts
            call = lambda args: fn(*args, qts)  # noqa: E731
            kind = "prefix"
            eff_batch = 1

        @jax.jit
        def chained(aa, ab):
            def body(i, acc):
                args = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(i % 2 == 0, a, b), aa, ab)
                out = call(args)
                return acc + out.astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        int(jax.device_get(chained(args_a, args_b)))  # warm (compile)
        best = float("inf")
        for _ in range(reps):
            t0 = _time.perf_counter()
            int(jax.device_get(chained(args_a, args_b)))
            best = min(best, (_time.perf_counter() - t0) / iters)
        per_image = best / eff_batch
        return {"ms_per_image": round(per_image * 1e3, 3),
                "mpix_s": round(staged.mpix / per_image, 1),
                "interchange": kind, "batch": eff_batch}

    def decode_stream(self, sources: Iterable, scale_to=None,
                      batch_size: int = 1, on_error: str = "raise") -> list:
        """Decode all sources; returns a list of device uint8 arrays.

        batch_size > 1 groups consecutive same-geometry images into one
        vmapped device dispatch — essential for sub-megapixel images, where
        per-dispatch overhead otherwise dominates.

        on_error: "raise" propagates the first failure; "none" isolates
        per-item failures (malformed inputs in a production stream must not
        poison the batch) and yields None in that slot.
        """
        from ..errors import JpegError

        if self.interchange == "bits":
            staged_futures = [self.pool.submit(stage_host_bits, s, scale_to,
                                               self.precision, self.timer,
                                               self.host_threads)
                              for s in sources]
        else:
            # pool_width gates the intra-image anchored threads: 5 workers
            # x 4 anchored threads thrash 4 cores (pooled burst measured
            # 678 -> 464 Mpix/s with anchored forced on).
            staged_futures = [self.pool.submit(stage_host, s, scale_to,
                                               self.precision, self.timer,
                                               self.host_threads)
                              for s in sources]

        def resolve(fut):
            if on_error == "raise":
                return fut.result()
            try:
                return fut.result()
            except JpegError:
                return None

        if batch_size <= 1:
            return [self.decode_one(st) if st is not None else None
                    for st in map(resolve, staged_futures)]

        outputs: list = []
        group: list = []
        bits_group: list = []
        ll_group: list = []
        bits_key = [None]

        def flush():
            if not group:
                return
            outputs.extend(self._decode_group(group))
            group.clear()

        def flush_bits():
            if not bits_group:
                return
            outputs.extend(self._decode_group_bits(bits_group))
            bits_group.clear()

        def flush_ll():
            if not ll_group:
                return
            outputs.extend(self._decode_group_lossless(ll_group))
            ll_group.clear()

        for fut in staged_futures:
            st = resolve(fut)
            if st is None:
                flush()
                flush_bits()
                flush_ll()
                outputs.append(None)
                continue
            if isinstance(st, StagedLossless):
                flush()
                flush_bits()
                if ll_group and (st.group_key != ll_group[0].group_key
                                 or len(ll_group) >= batch_size):
                    flush_ll()
                ll_group.append(st)
                continue
            flush_ll()
            if isinstance(st, StagedBits):
                flush()
                # Non-mesh groups merge across plans (mixed sizes) on the
                # hetero key — but only for small images: the merge's extra
                # intermediate (the stream-order coefficient tensor written
                # between sweep and reconstructs) plus the extra dispatches
                # beat per-plan fused pipelines only when dispatch
                # amortization dominates. Measured (mixed_ab.py, nominal
                # relay phase): 1.12x on a 32-image <=0.12 Mpix mixed
                # stream, 0.84x with >=0.5 Mpix members. The mesh path
                # still needs exact-plan stacks. JPEG_TPU_HETERO_BITS:
                # ''/'1' = default (<=0.25 Mpix merge across plans),
                # '0' = exact-key only, other float = Mpix threshold,
                # 'auto' = link-aware: exact-key only while the observed
                # H2D link is degraded (utils/link EMA — hetero's extra
                # dispatches lose when per-RPC RTT dominates; mixed_ab
                # round-4/5 phase tables). NOT the default: the degraded-
                # phase optimum is stream-shape dependent (interleaved
                # mixed streams still favor hetero's fewer group flushes,
                # scenario 3) and the nominal-phase policy is measured.
                if self.mesh is not None:
                    key = _bits_group_key(st, True)
                else:
                    v = os.environ.get("JPEG_TPU_HETERO_BITS", "1")
                    if v == "auto":
                        from ..utils import link as _link
                        thr = 0.0 if _link.degraded() else 0.25
                    else:
                        thr = 0.0 if v == "0" else (0.25 if v in ("", "1")
                                                    else float(v))
                    key = (_bits_hetero_key(st) if st.mpix <= thr
                           else _bits_group_key(st))
                if key is None:
                    # Multi-scan or Pallas-ineligible: per-image dispatch.
                    flush_bits()
                    outputs.append(self.decode_one(st))
                    continue
                if bits_group and (key != bits_key[0]
                                   or len(bits_group) >= batch_size):
                    flush_bits()
                bits_key[0] = key
                bits_group.append(st)
                continue
            flush_bits()
            if group and (st.geometry != group[0].geometry
                          or len(group) >= batch_size):
                flush()
            group.append(st)
        flush()
        flush_bits()
        flush_ll()
        return outputs

    def _decode_group_bits(self, group: list) -> list:
        """One merged device dispatch for a group of same-key StagedBits
        (see _bits_group_key): merge_image_packs concatenates the per-image
        chunk packs with block-base offsets, one kernel sweep decodes them
        all, assembly/reconstruction are vmapped."""
        import jax

        if self.mesh is not None:
            return self._decode_group_bits_mesh(group)
        if len(group) == 1:
            return [self.decode_one(group[0])]
        from ..entropy.pallas_decode import (merge_image_packs,
                                             merge_image_packs_delta,
                                             merge_image_packs_words)

        scan0, _kept = group[0].scans[0]
        n = len(group)
        if len({_bits_group_key(st) for st in group}) > 1:
            # Same hetero key, different plans: one sweep, per-plan assembly.
            return self._decode_group_bits_hetero(group)
        batch = _batch_bucket(n)
        entries = [st.pallas[0] for st in group]
        entries = entries + [entries[-1]] * (batch - n)
        wire = entries[0][2]
        merge = (merge_image_packs_delta if wire == "delta"
                 else merge_image_packs_words if wire.startswith("words")
                 else merge_image_packs)
        merged = merge([e[:2] for e in entries], scan0.plan.n_blocks)
        if merged is None:
            # Delta merge overflowed an image-boundary field: decode singly
            # (each image's own wire is already validated).
            return [self.decode_one(st) for st in group]
        combined, shapes = merged

        layout = self._effective_layout(group[0].geometry)
        # n_items varies per group; the compiled shape doesn't depend on it.
        shapes_key = tuple(s[:3] for s in shapes)
        from ..entropy.pallas_decode import _pack16_enabled
        fn = _compiled_bits_pipeline_batched(
            scan0.plan, batch, shapes_key, len(scan0.tab_maxcode),
            scan0.comp_to_upair, group[0].geometry, layout,
            device_slots=_wire_flag(wire),
            interpret=_bits_pallas_mode() == "interpret",
            pack16=_pack16_enabled())

        ncomp = len(group[0].qts)
        qts_b = tuple(
            np.stack([st.qts[c] for st in group]
                     + [group[-1].qts[c]] * (batch - n))
            for c in range(ncomp))
        with self._stage("h2d_submit"):
            dev = _put_recorded(combined)
            mc = self._put_cached(scan0.tab_maxcode)
            dl = self._put_cached(scan0.tab_delta)
            vv = self._put_cached(scan0.tab_values.view(np.int32))
        with self._stage("device_dispatch"):
            out = fn(dev, mc, dl, vv, qts_b)
        return [out[i] for i in range(n)]

    def _decode_group_bits_hetero(self, group: list) -> list:
        """Mixed-plan batched bits dispatch (round-3, verdict item 7): ONE
        kernel sweep decodes every image's chunks (the per-class merge is
        size-agnostic — chunk metadata carries absolute block bases), then
        per-plan assemblers/reconstructors consume dynamic slices of the
        sweep's stream-order coefficient tensor. Dispatches: 1 sweep +
        #distinct-plans reconstructs, vs #images full pipelines before.

        Compile-key discipline: the sweep is keyed by bucketed class shapes
        + a bucketed total block count; each reconstruct by (plan, bucketed
        count) — a mixed stream's composition order never recompiles.
        Reconstruct slices may overrun into the next plan's rows (count
        padding); those padding images decode garbage and are discarded."""
        import jax

        from ..entropy.pallas_decode import (merge_image_packs,
                                             merge_image_packs_delta,
                                             merge_image_packs_words)

        scan0, _ = group[0].scans[0]
        wire = group[0].pallas[0][2]
        merge = (merge_image_packs_delta if wire == "delta"
                 else merge_image_packs_words if wire.startswith("words")
                 else merge_image_packs)

        # Group members by plan (first-seen order), remembering stream order.
        plan_groups: dict = {}
        for idx, st in enumerate(group):
            scan, _kept = st.scans[0]
            plan_groups.setdefault(
                (scan.plan, st.geometry), []).append((idx, st))

        ordered = [m for members in plan_groups.values() for m in members]
        entries = [st.pallas[0] for _i, st in ordered]
        nbs = [st.scans[0][0].plan.n_blocks for _i, st in ordered]
        merged = merge([e[:2] for e in entries], nbs)
        if merged is None:
            return [self.decode_one(st) for st in group]
        combined, shapes = merged

        # Sweep sized to cover every (count-bucketed) reconstruct slice.
        padded_total = sum(
            _batch_bucket(len(members)) * plan.n_blocks
            for (plan, _g), members in plan_groups.items())
        nb_bucket = _bucket(padded_total, floor=4096)
        mapped_pattern = tuple(
            scan0.comp_to_upair[c] for c in scan0.plan.pattern)
        interpret = _bits_pallas_mode() == "interpret"
        from ..entropy.pallas_decode import _pack16_enabled
        sweep = _compiled_bits_sweep(
            tuple(s[:3] for s in shapes), len(scan0.tab_maxcode),
            mapped_pattern, nb_bucket, _wire_flag(wire), interpret,
            pack16=_pack16_enabled())

        with self._stage("h2d_submit"):
            dev = _put_recorded(combined)
            mc = self._put_cached(scan0.tab_maxcode)
            dl = self._put_cached(scan0.tab_delta)
            vv = self._put_cached(scan0.tab_values.view(np.int32))
        results: list = [None] * len(group)
        with self._stage("device_dispatch"):
            nat = sweep(dev, mc, dl, vv)
            off = 0
            for (plan, geometry), members in plan_groups.items():
                cnt = len(members)
                cb = _batch_bucket(cnt)
                layout = self._effective_layout(geometry)
                fn = _compiled_nat_reconstruct(plan, cb, geometry, layout,
                                               interpret)
                ncomp = len(members[0][1].qts)
                qts_b = tuple(
                    np.stack([st.qts[c] for _i, st in members]
                             + [members[-1][1].qts[c]] * (cb - cnt))
                    for c in range(ncomp))
                out = fn(nat, off, qts_b)
                for j, (idx, _st) in enumerate(members):
                    results[idx] = out[j]
                off += plan.n_blocks * cnt
        return results

    def _decode_group_bits_mesh(self, group: list) -> list:
        """Mesh-sharded batched bits dispatch: stack the bucket-padded
        per-image anchor arrays along an image axis sharded over the data
        axis (see _compiled_bits_pipeline_batched_mesh). When every image
        in the group carries Pallas packs of the same bucketed class shapes
        and wire, the shards run the Pallas kernel engine instead
        (_compiled_bits_pipeline_mesh_pallas)."""
        import jax

        scan0, kept = group[0].scans[0]
        n = len(group)
        ndev = int(self.mesh.shape[self.data_axis])
        batch = _batch_bucket(n)
        if batch % ndev:
            # Round UP to a multiple of the axis size (doubling a power of
            # two never reaches divisibility for ndev like 3 or 6).
            batch = -(-batch // ndev) * ndev
        pad = batch - n

        entries = [st.pallas[0] if st.pallas else None for st in group]
        if _bits_pallas_enabled() and all(e is not None for e in entries):
            # Stacking needs every per-image buffer shape equal, not just
            # the bucketed class shapes (word/delta array buckets vary).
            keys = {(tuple(s[:3] for s in e[1]), e[2],
                     tuple(a.shape for a in e[0]))
                    for e in entries}
            if len(keys) == 1:
                return self._decode_group_bits_mesh_pallas(
                    group, entries, batch, kept)
        scans = [st.scans[0][0] for st in group] + [scan0] * pad
        words = np.stack([s.words for s in scans])
        a_bits = np.stack([s.anchor_bits for s in scans])
        a_block = np.stack([s.anchor_block for s in scans])
        a_slot = np.stack([s.anchor_slot for s in scans])
        ncomp = len(group[0].qts)
        qts_b = tuple(
            np.stack([st.qts[c] for st in group]
                     + [group[0].qts[c]] * pad)
            for c in range(ncomp))

        layout = self._effective_layout(group[0].geometry)
        fn = _compiled_bits_pipeline_batched_mesh(
            scan0.plan, kept, batch, ncomp, group[0].geometry, layout,
            self.mesh, self.data_axis)
        with self._stage("h2d_submit"):
            args = (jax.device_put(words), jax.device_put(a_bits),
                    jax.device_put(a_block), jax.device_put(a_slot))
            luts = self._put_luts(scan0.luts)
        with self._stage("device_dispatch"):
            out = fn(*args, qts_b, luts)
        return [out[i] for i in range(n)]

    def _decode_group_bits_mesh_pallas(self, group: list, entries: list,
                                       batch: int, kept: tuple) -> list:
        """Pallas engine over the mesh: stack each image's packed class
        buffers (uniform shapes — checked by the caller) on a sharded image
        axis; every shard decodes its images with the single-image Pallas
        pipeline."""
        import jax

        scan0, _ = group[0].scans[0]
        n = len(group)
        pad = batch - n
        n_combined = len(entries[0][0])
        stacked = tuple(
            np.stack([e[0][j] for e in entries]
                     + [entries[-1][0][j]] * pad)
            for j in range(n_combined))
        ncomp = len(group[0].qts)
        qts_b = tuple(
            np.stack([st.qts[c] for st in group]
                     + [group[-1].qts[c]] * pad)
            for c in range(ncomp))
        shapes_key = tuple(s[:3] for s in entries[0][1])
        wire = entries[0][2]
        layout = self._effective_layout(group[0].geometry)
        from ..entropy.pallas_decode import _pack16_enabled
        fn = _compiled_bits_pipeline_mesh_pallas(
            scan0.plan, kept, batch, shapes_key, len(scan0.tab_maxcode),
            scan0.comp_to_upair, ncomp, group[0].geometry, layout,
            _wire_flag(wire), n_combined, self.mesh, self.data_axis,
            interpret=_bits_pallas_mode() == "interpret",
            pack16=_pack16_enabled())
        with self._stage("h2d_submit"):
            dev = _put_recorded(stacked)
            mc = self._put_cached(scan0.tab_maxcode)
            dl = self._put_cached(scan0.tab_delta)
            vv = self._put_cached(scan0.tab_values.view(np.int32))
        with self._stage("device_dispatch"):
            out = fn(dev, mc, dl, vv, qts_b)
        return [out[i] for i in range(n)]

    def _decode_group(self, group: list) -> list:
        import jax

        n = len(group)
        if n == 1 and self.mesh is None:
            return [self.decode_one(group[0])]
        resid_bucket = _bucket(max(len(st.resid_idx) for st in group))
        batch = _batch_bucket(n)
        if self.mesh is not None:
            ndev = int(self.mesh.shape[self.data_axis])
            if batch % ndev:
                batch = -(-batch // ndev) * ndev

        def pad_resid(st):
            idx = np.full(resid_bucket, st.total_coeffs, np.int32)
            vals = np.zeros(resid_bucket, np.int16)
            k = len(st.resid_idx)
            idx[:k] = st.resid_idx
            vals[:k] = st.resid_vals
            return idx, vals

        resids = [pad_resid(st) for st in group]
        pad_with = group[-1]
        dc = np.stack([st.dc for st in group]
                      + [pad_with.dc] * (batch - n))
        ac = np.stack([st.ac for st in group]
                      + [pad_with.ac] * (batch - n))
        ri = np.stack([r[0] for r in resids] + [resids[-1][0]] * (batch - n))
        rv = np.stack([r[1] for r in resids] + [resids[-1][1]] * (batch - n))

        # Per-image quantization tables (same geometry does not imply same
        # tables), stacked and vmapped alongside the coefficients.
        ncomp = len(group[0].qts)
        qts_b = tuple(
            np.stack([st.qts[c] for st in group]
                     + [pad_with.qts[c]] * (batch - n))
            for c in range(ncomp))

        layout = self._effective_layout(group[0].geometry)
        fn = _compiled_prefix_pipeline_batched(
            group[0].geometry, resid_bucket, batch, self.mesh, self.data_axis,
            layout)
        with self._stage("h2d_submit"):
            args = (jax.device_put(dc), jax.device_put(ac),
                    jax.device_put(ri), jax.device_put(rv))
        with self._stage("device_dispatch"):
            out = fn(*args, qts_b)
        return [out[i] for i in range(n)]
