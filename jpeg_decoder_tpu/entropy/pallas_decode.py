"""Pallas TPU kernel for the anchored Huffman decode (the fast device path).

The XLA `lax.scan` formulation (device_scan.build_anchored_decoder) is
gather-rate-bound (~100M XLA gathers/s on v5e ⇒ >100ms per megapixel-class
image). This kernel keeps every per-symbol operation inside one Mosaic
program using only constructs the VPU executes natively:

- bit-window fetch: each chunk's bytes live in a per-item *slot*; a slot tile
  is held as `slot_w` (8,128) vregs and the per-lane word select is a
  compare/select chain over those vregs (no gather).
- code length: canonical F.16 maxcode comparison chain, fully unrolled over
  the 16 code lengths (`/root/reference/src/huffman.rs:31-58` semantics via
  this repo's oracle).
- symbol value and VALPTR/MINCODE deltas: `tpu.dynamic_gather` — the
  hardware sublane gather, reached through `jnp.take_along_axis` on (8,128)
  vregs — over broadcast table chunks (8 entries per vreg).
- emission: coefficients accumulate one-hot into a dense per-chunk
  [K_CAP*64] output region in VMEM (K_CAP is small for exactly this
  reason), so the XLA element scatter — measured at ~10ms per
  megapixel-class image, dominating the pipeline — disappears. Assembly
  compacts the padded regions with one i32 row gather (~19 GB/s measured)
  driven by a device-computed row map (per-class cummax propagation).

Chunks are packed by the host into size classes (64..512-byte slots) so H2D
bytes track the compressed stream (~1.3x) rather than the worst-case span.
Scans that exceed the class limits or use more than two distinct Huffman
table pairs fall back to the XLA decoder — output is bit-identical either
way (both feed the shared assembler in device_scan.py).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .device_scan import (AnchoredScan, ScanPlan, UNZIGZAG,
                          build_assembler_nat)

SLOT_CLASSES = (32, 48, 64, 96, 128, 256, 512)   # slot bytes
SYM_BUCKETS = (32, 64, 96, 128, 176, 224)
MAX_TABS = 4                          # <= 2 distinct (dc, ac) pairs
SENTINEL = 1 << 30


@dataclasses.dataclass
class ClassPack:
    """One slot-size class of chunks, padded to the kernel grid.

    wire="slots": H2D per item = slot bytes + 8 (meta + block base): meta
    packs the entry bit offset (3b), MCU-pattern slot (4b) and block budget
    (5b — K_CAP up to 31) into one int32; the block-base array doubles as
    the rowmap's `starts`.

    wire="words": slots_t stays None and `ab` holds each chunk's absolute
    entry BIT offset into the scan's word stream; the device materialises
    the slot tiles itself (row gather + constant shift —
    build_pallas_decoder device_slots=True), so the wire carries the
    compressed words ONCE plus 12 bytes/chunk (8 with compact metadata —
    combine_packs_words) instead of the overlapping, class-padded slot
    copies (~1.5-1.7x the stream)."""
    slot_words: int
    s_max: int
    n_items: int            # real items
    slots_t: np.ndarray     # int32 [slot_words, G, 8, 128] tile-aligned slots
    meta: np.ndarray        # int32 [G, 8, 128] bit0 | slot0<<3 | budget<<7
    block_base: np.ndarray  # int32 [G, 8, 128] (pad: n_blocks — rowmap drop)
    ab: np.ndarray = None   # int32 [G, 8, 128] entry bit offset (wire="words")


def _class_collapse_enabled() -> bool:
    """Single-class packing (see pack_classes/pack_delta): every chunk of
    a scan goes in the single widest REQUIRED slot class. The slot-class
    machinery was a wire-size economy for the round-2 slots wire; on the
    words/delta wires (stream shipped once) it only splits the kernel into
    per-class launches with padded last tiles — and the collapsed
    s_max_max run measured FASTER at every scale on v5e (2026-08-20/21
    A/Bs, delta wire solo): tower 0.26 Mpix 1.377 -> 0.855 ms (1.61x),
    rgb 0.17 Mpix 1.227 -> 0.890 (1.38x), 0.39 Mpix synth 1.447 -> 1.238
    (1.17x), large_image 3.43 Mpix 5.147 -> **4.329 ms = 792 Mpix/s**
    (1.19x; 13k chunks, so this is not just launch overhead — full tiles
    and one program beat five partially-padded classes). The prescan
    bounds every chunk at S_MAX=162 symbols, so the collapsed step count
    never exceeds the 176 bucket. Default ON; JPEG_TPU_CLASS_COLLAPSE=0
    restores the span classes."""
    import os
    return os.environ.get("JPEG_TPU_CLASS_COLLAPSE", "1") not in ("0",
                                                                  "off")


# Chunk-count ceiling for collapse: effectively unlimited (measured winning
# at 13k chunks); JPEG_TPU_COLLAPSE_MAX tunes for re-measurement.
import os as _os

try:
    COLLAPSE_MAX = int(_os.environ.get("JPEG_TPU_COLLAPSE_MAX") or (1 << 30))
except ValueError:
    COLLAPSE_MAX = 1 << 30


def _bucket_items(n: int) -> int:
    """1024-granular bucket with 1.3x geometric steps (pow2 wastes up to 2x
    in kernel lane-slots; tiles are 1024 items)."""
    size = 1024
    while size < n:
        size = -(-int(size * 1.3) // 1024) * 1024
    return size


def pack_classes(staged: AnchoredScan, wire: str = "slots"):
    """Partition chunks into slot-size classes; None if Pallas-ineligible.

    wire="words" skips the host slot fill entirely (see ClassPack.ab)."""
    if staged.chunk_end is None or staged.tab_maxcode is None:
        return None
    if len(staged.tab_maxcode) > MAX_TABS:
        return None
    n = staged.n_items
    if n == 0:
        return None
    a = staged.anchor_bits[:n].astype(np.int64)
    end = staged.chunk_end[:n].astype(np.int64)
    syms = staged.chunk_syms[:n]
    start_byte = a >> 3
    # Window reads reach 8 bytes past the final symbol's start (64-bit loads
    # in spirit; the kernel reads words widx and widx+1 of a 32-bit window).
    span = (end >> 3) - start_byte + 9
    if int(span.max()) > SLOT_CLASSES[-1]:
        return None

    words_u32 = bytes_arr = None
    if wire == "slots":
        from .native import get_native
        native = get_native()
        if native is None or not hasattr(native, "pack_slots"):
            sbytes = np.asarray(staged.words, dtype=">u4").tobytes()
            bytes_arr = np.frombuffer(sbytes, np.uint8)
        else:
            words_u32 = np.ascontiguousarray(staged.words, dtype=np.uint32)
    budgets = (staged.anchor_block[1:n + 1] - staged.anchor_block[:n])

    collapse = None
    if _class_collapse_enabled() and n <= COLLAPSE_MAX:
        # NB: collapse applies to wire="slots" too, though it inflates that
        # wire's H2D (it ships the class-padded slot copies; every chunk
        # now pads to the widest class). slots is the legacy/A-B wire —
        # keeping one class layout across wires preserves the
        # words==slots parity net (test_words_wire_*); a deployment that
        # actually ships wire=slots should set JPEG_TPU_CLASS_COLLAPSE=0.
        collapse = int(np.searchsorted(np.asarray(SLOT_CLASSES),
                                       int(span.max()), side="left"))

    packs = []
    for ci, cls in enumerate(SLOT_CLASSES):
        if collapse is not None and ci != collapse:
            continue
        if collapse is not None:
            sel = np.arange(n)
        else:
            lo = 0 if cls == SLOT_CLASSES[0] else SLOT_CLASSES[
                SLOT_CLASSES.index(cls) - 1]
            sel = np.flatnonzero((span > lo) & (span <= cls))
        if len(sel) == 0:
            continue
        nb = _bucket_items(len(sel))
        cls_syms = int(syms[sel].max())
        if cls_syms > SYM_BUCKETS[-1]:
            # Unreachable under the shipped anchoring (S_MAX = S_TARGET + 66
            # = 162 < 224) but an anchoring retune must degrade to the XLA
            # decoder, not StopIteration (found by tools/experiments/
            # starget_sweep.py at S_TARGET >= 192).
            return None
        s_max = next(b for b in SYM_BUCKETS if cls_syms <= b)
        G = nb // 1024

        def pad(arr, fill=0):
            out = np.full(nb, fill, np.int32)
            out[:len(sel)] = arr[sel]
            return out.reshape(G, 8, 128)

        # Tile-aligned VMEM layout: loads inside the kernel must map to whole
        # (8,128) vregs — a [1, n] row slice of a 2D array forces a Mosaic
        # relayout (~microseconds per access, measured) and dominates runtime.
        slots4 = ab4 = None
        if wire == "words":
            # No host slot fill: the device rebuilds the tiles from the
            # compressed words at each chunk's entry bit offset.
            ab4 = pad(staged.anchor_bits[:n].astype(np.uint32)
                      .view(np.int32))
        elif words_u32 is not None:
            # Native transposed fill: two word loads + a constant shift per
            # slot word — replaces the numpy byte gather (~7ms/Mpix image).
            out = np.empty((cls // 4, nb), np.uint32)
            native.pack_slots(words_u32, np.ascontiguousarray(start_byte[sel]),
                              nb, cls // 4, out)
            slots4 = out.reshape(cls // 4, G, 8, 128).view(np.int32)
        else:
            idx = start_byte[sel][:, None] + np.arange(cls)[None, :]
            sl = np.zeros((nb, cls), np.uint8)
            valid = idx < len(bytes_arr)
            sl[:len(sel)] = np.where(valid, bytes_arr[np.minimum(
                idx, len(bytes_arr) - 1)], 0)
            w = sl.reshape(nb, cls // 4, 4).astype(np.uint32)
            slots = ((w[..., 0] << 24) | (w[..., 1] << 16)
                     | (w[..., 2] << 8) | w[..., 3])
            slots4 = np.ascontiguousarray(
                slots.T.reshape(cls // 4, G, 8, 128).view(np.int32))

        # bit0(3b) | slot0(4b) | budget(5b — K_CAP up to 31)
        meta = ((a & 7).astype(np.int32)
                | (staged.anchor_slot[:n].astype(np.int32) << 3)
                | (budgets.astype(np.int32) << 7))
        packs.append(ClassPack(
            slot_words=cls // 4, s_max=s_max, n_items=len(sel),
            slots_t=slots4,
            meta=pad(meta),
            block_base=pad(staged.anchor_block[:n].astype(np.int32),
                           fill=staged.n_blocks),
            ab=ab4,
        ))
    return packs


def combine_packs(packs):
    """Flatten a class list into the three combined H2D arrays."""
    slots_all = np.concatenate([p.slots_t.reshape(-1) for p in packs])
    meta_all = np.concatenate([p.meta.reshape(-1) for p in packs])
    base_all = np.concatenate([p.block_base.reshape(-1) for p in packs])
    return slots_all, meta_all, base_all


WORDS_PAD = SLOT_CLASSES[-1] // 4 + 1   # row-gather slack: max slot_words + 1


def _bucket_words(n: int) -> int:
    """Word-count buckets for the wire: finer-grained than the 1.3x staging
    bucket because these bytes ride the throttled link — but each distinct
    padded length keys a fresh compile of the whole fused pipeline, so the
    step is a compromise (1.125x: ~6% mean zero-pad, half the executables
    of the 1.0625x it replaced)."""
    from .device_scan import _bucket_up
    return _bucket_up(n, floor=1024, factor=1.125)


def combine_packs_words(packs, words, n_words: int = 0,
                        compact: bool = False):
    """Flatten a wire="words" class list into the combined H2D arrays: the
    compressed words themselves (padded so every device row gather stays
    in bounds, bucketed for shape stability) plus per-chunk metadata.

    `n_words`: true content length of `words` (AnchoredScan.n_words) — the
    staging array is already bucket-padded (~30% worst case) and shipping
    that padding would silently give back the wire savings this format
    exists for; every chunk's gather window lies within the content, so
    trimming to n_words + WORDS_PAD keeps PROMISE_IN_BOUNDS honest.

    `compact`: pack the metadata into 8 B/chunk instead of 12 — (entry bit
    offset, budget | slot0<<5 | base<<9); the device reconstructs
    sb/meta/base with a few elementwise ops (build_pallas_decoder
    distinguishes the wires by tuple arity). Caller must ensure
    base << 9 stays meaningful under the uint32 wrap discipline (base
    fits 23 bits: < 8.3M blocks incl. batch-merge offsets)."""
    if n_words:
        words = words[:n_words]
    wpad = np.zeros(_bucket_words(len(words) + WORDS_PAD), np.uint32)
    wpad[:len(words)] = np.ascontiguousarray(words, dtype=np.uint32)
    ab_all = np.concatenate([p.ab.reshape(-1) for p in packs])
    meta_all = np.concatenate([p.meta.reshape(-1) for p in packs])
    base_all = np.concatenate([p.block_base.reshape(-1) for p in packs])
    if compact:
        m = meta_all.view(np.uint32)
        pk = (((m >> 7) & 0x1F) | (((m >> 3) & 0xF) << 5)
              | (base_all.view(np.uint32) << 9))
        return wpad.view(np.int32), ab_all, pk.view(np.int32)
    sb_all = (ab_all.view(np.uint32) >> 3).view(np.int32)
    return wpad.view(np.int32), sb_all, meta_all, base_all


def _block_offsets(entries, nb_image):
    """Per-image block offsets: `nb_image` is either the uniform per-image
    block count (same-plan merge) or a sequence of per-image counts
    (heterogeneous merge — one kernel sweep over mixed-size images)."""
    if isinstance(nb_image, (int, np.integer)):
        nbs = [int(nb_image)] * len(entries)
    else:
        nbs = [int(x) for x in nb_image]
        assert len(nbs) == len(entries)
    offs = np.cumsum([0] + nbs)
    return offs[:-1], int(offs[-1])


def merge_image_packs(entries, nb_image):
    """Merge per-image packed classes into one multi-image pack.

    entries: per image ((slots_all, meta_all, base_all), shapes) where
    shapes = ((slot_words, s_max, n_bucket, n_items), ...) as produced by
    stage_host_bits. Image i's block bases shift by its cumulative block
    offset (`nb_image`: uniform count or per-image sequence), so the merged
    pack decodes as one scan of sum-of-blocks — chunk decode is per-item,
    and per-class item order stays monotone in start block (per-image packs
    are stream-ordered, images concatenate in order), which the rowmap's
    cummax propagation requires.

    Returns (combined_arrays, merged_shapes) in the combine_packs layout.
    Padding items get meta 0 (budget 0: kernel no-op) and base =
    total_blocks (rowmap scatter drop)."""
    offs, total_blocks = _block_offsets(entries, nb_image)
    per_class: dict = {}
    for i, ((sl, me, ba), shapes) in enumerate(entries):
        so = io = 0
        for (sw, sm, nb, ni) in shapes:
            slots = sl[so:so + sw * nb].reshape(sw, nb)[:, :ni]
            meta = me[io:io + nb][:ni]
            base = ba[io:io + nb][:ni] + offs[i]
            per_class.setdefault(sw, []).append((slots, meta, base, sm))
            so += sw * nb
            io += nb
    slots_parts, meta_parts, base_parts, shapes_out = [], [], [], []
    for sw in sorted(per_class):
        lst = per_class[sw]
        ni_tot = sum(x[0].shape[1] for x in lst)
        nb2 = _bucket_items(ni_tot)
        sm = max(x[3] for x in lst)
        slots = np.zeros((sw, nb2), np.int32)
        meta = np.zeros(nb2, np.int32)
        base = np.full(nb2, total_blocks, np.int32)
        k = 0
        for s, m, b, _sm in lst:
            n = s.shape[1]
            slots[:, k:k + n] = s
            meta[k:k + n] = m
            base[k:k + n] = b
            k += n
        shapes_out.append((sw, sm, nb2, ni_tot))
        slots_parts.append(slots.reshape(-1))
        meta_parts.append(meta)
        base_parts.append(base)
    combined = (np.concatenate(slots_parts), np.concatenate(meta_parts),
                np.concatenate(base_parts))
    return combined, tuple(shapes_out)


def merge_image_packs_words(entries, nb_image):
    """wire="words" variant of merge_image_packs: the per-image word streams
    concatenate (each keeps its own gather pad, so in-bounds holds), chunk
    entry offsets shift by the image's word base, block bases by the image's
    cumulative block offset (`nb_image`: uniform count or per-image
    sequence). entries: ((words, *items), shapes) per image where items
    is (sb, meta, base) for the 12 B/chunk wire or (ab, packed) for the
    compact 8 B/chunk wire (arity distinguishes; see combine_packs_words)."""
    compact = len(entries[0][0]) == 3
    boffs, total_blocks = _block_offsets(entries, nb_image)
    word_total = sum(len(e[0][0]) for e in entries)
    assert word_total < (1 << 27), "merged word stream exceeds 512 MB"
    if compact and total_blocks >= (1 << 23):
        # Batch offsets would push base past its 23 compact bits and wrap
        # mod 2^23 into wrong-but-valid block indices — degrade the merge
        # to the 12 B/chunk layout (the host unpack mirrors the device's).
        def _to_legacy(items):
            ab, pk = items
            abu, pku = ab.view(np.uint32), pk.view(np.uint32)
            return ((abu >> 3).view(np.int32),
                    ((abu & 7) | (((pku >> 5) & 0xF) << 3)
                     | ((pku & 0x1F) << 7)).view(np.int32),
                    (pku >> 9).view(np.int32))
        entries = [((e[0][0], *_to_legacy(e[0][1:])), e[1]) for e in entries]
        compact = False
    if compact:
        # entry bit offset (wraps like uint32) / budget|slot0|base<<9
        shift = lambda arrs, i, off: (  # noqa: E731
            (arrs[0].view(np.uint32) + np.uint32(off * 32)).view(np.int32),
            (arrs[1].view(np.uint32)
             + (np.uint32(boffs[i]) << np.uint32(9))).view(np.int32))
        fills = (0, total_blocks << 9)
    else:
        shift = lambda arrs, i, off: (  # noqa: E731
            arrs[0] + off * 4, arrs[1], arrs[2] + boffs[i])
        fills = (0, 0, total_blocks)

    per_class: dict = {}
    words_parts = []
    word_off = 0
    for i, ((words, *items), shapes) in enumerate(entries):
        words_parts.append(words)
        io = 0
        for (sw, sm, nb, ni) in shapes:
            cut = tuple(a[io:io + nb][:ni] for a in items)
            per_class.setdefault(sw, []).append(
                (shift(cut, i, word_off), sm))
            io += nb
        word_off += len(words)

    parts = [[] for _ in fills]
    shapes_out = []
    for sw in sorted(per_class):
        lst = per_class[sw]
        ni_tot = sum(len(x[0][0]) for x in lst)
        nb2 = _bucket_items(ni_tot)
        sm = max(x[1] for x in lst)
        outs = [np.full(nb2, f & 0xFFFFFFFF, np.uint32).view(np.int32)
                for f in fills]
        k = 0
        for arrs, _sm in lst:
            nn = len(arrs[0])
            for o, a in zip(outs, arrs):
                o[k:k + nn] = a
            k += nn
        shapes_out.append((sw, sm, nb2, ni_tot))
        for p, o in zip(parts, outs):
            p.append(o)

    wcat = np.zeros(_bucket_words(word_off), np.int32)
    pos = 0
    for w in words_parts:
        wcat[pos:pos + len(w)] = w
        pos += len(w)
    combined = (wcat, *(np.concatenate(p) for p in parts))
    return combined, tuple(shapes_out)


DELTA_BITS = 23   # anchor-bit delta field of the 4 B/chunk wire


def pack_delta(staged: AnchoredScan):
    """wire="delta": 4 B/chunk metadata — ONE uint32 per chunk, in stream
    order: anchor-bit delta (23b) | block budget (5b) | entry slot (4b).
    The device reconstructs everything else with vector ops
    (build_pallas_sweep): absolute anchor bits = cumsum of deltas, block
    bases = exclusive cumsum of budgets (chunks partition the scan's
    blocks), slot-size class membership from the span implied by the NEXT
    delta, and the per-class stream-ordered partition with one stable
    argsort + row gather. Halves the words-packed chunk metadata — the
    sustained H2D metric tracks wire bytes 1:1 (BASELINE.md).

    Returns ((words, dm, cnts), shapes) or None when the scan is
    Pallas-ineligible or any field would overflow (callers degrade to the
    words-packed wire): words int32 [bucketed] — the compressed stream;
    dm int32 [n_pad] — the per-chunk words, entry n = a budget-0
    terminator carrying the closing delta (the last real chunk's span),
    then zeros; cnts int32 [n_classes] — per-class real-item counts
    (runtime values; the bucketed shapes are the static compile key).
    shapes: ((slot_words, s_max, n_bucket, n_items), ...) ascending class.
    """
    if staged.chunk_end is None or staged.tab_maxcode is None:
        return None
    if len(staged.tab_maxcode) > MAX_TABS:
        return None
    n = staged.n_items
    if n == 0:
        return None
    if staged.n_words >= (1 << 26):
        # Absolute anchor bits must fit the device's int32 cumsum (the
        # prescan's own uint32 guard allows scans up to 512 MB).
        return None

    from .native import get_native
    native = get_native()
    if native is not None and hasattr(native, "pack_delta_meta"):
        dm_head = np.empty(n + 1, np.uint32)
        res = native.pack_delta_meta(
            staged.anchor_bits[:n], staged.anchor_block[:n + 1],
            staged.anchor_slot[:n], staged.chunk_end[:n],
            staged.chunk_syms[:n], n, dm_head)
        if res is None:
            return None
        cls_count, cls_maxsyms = res
    else:
        out = pack_delta_meta_np(staged)
        if out is None:
            return None
        dm_head, cls_count, cls_maxsyms = out

    if _class_collapse_enabled() and n <= COLLAPSE_MAX:
        # Small-scan collapse (see pack_classes): one class = one grid-1
        # kernel launch. The device partition skips the span rule when a
        # single class is present (unpack_delta_classes), so host and
        # device agree by construction.
        top = max(ci for ci in range(len(SLOT_CLASSES)) if cls_count[ci])
        ms = max(int(cls_maxsyms[ci]) for ci in range(len(SLOT_CLASSES)))
        if ms > SYM_BUCKETS[-1]:
            return None
        s_max = next(b for b in SYM_BUCKETS if ms <= b)
        cls_count = [0] * len(SLOT_CLASSES)
        cls_count[top] = n
        cls_maxsyms = [0] * len(SLOT_CLASSES)
        cls_maxsyms[top] = ms

    shapes = []
    cnts = []
    cum = 0
    max_need = 0
    for ci, cbytes in enumerate(SLOT_CLASSES):
        cnt = int(cls_count[ci])
        if cnt == 0:
            continue
        ms = int(cls_maxsyms[ci])
        if ms > SYM_BUCKETS[-1]:
            return None
        s_max = next(b for b in SYM_BUCKETS if ms <= b)
        nb = _bucket_items(cnt)
        shapes.append((cbytes // 4, s_max, nb, cnt))
        cnts.append(cnt)
        max_need = max(max_need, cum + nb)
        cum += cnt
    # dm must cover the terminator AND every class's [off, off + nb)
    # dynamic-slice window (padded tails read dead rows, masked on device).
    n_pad = _bucket_items(max(n + 1, max_need))
    dm = np.empty(n_pad, np.uint32)
    dm[:n + 1] = dm_head
    dm[n + 1:] = 0
    nw = staged.n_words
    wpad = np.empty(_bucket_words(nw + WORDS_PAD), np.uint32)
    wpad[:nw] = staged.words[:nw]
    wpad[nw:] = 0
    return ((wpad.view(np.int32), dm.view(np.int32),
             np.asarray(cnts, np.int32)), tuple(shapes))


def pack_delta_meta_np(staged: AnchoredScan):
    """Numpy mirror of entropy.cc jt_pack_delta (the ABI-15 one-pass native
    emitter): the per-chunk u32 words incl. terminator plus per-class
    (count, max symbols). Byte-identical outputs (differentially tested) —
    the fallback when the native library is unavailable and the oracle the
    native pass is pinned against. Returns (dm[n+1] uint32, cls_count[8],
    cls_syms[8]) or None on fallback."""
    n = staged.n_items
    ab = staged.anchor_bits[:n].astype(np.int64)
    end_last = int(staged.chunk_end[:n][-1])
    budgets = (staged.anchor_block[1:n + 1]
               - staged.anchor_block[:n]).astype(np.int64)
    slot0 = staged.anchor_slot[:n].astype(np.int64)
    d = np.empty(n + 1, np.int64)
    d[0] = ab[0]
    d[1:n] = ab[1:] - ab[:-1]
    d[n] = end_last - ab[-1]
    if d.min() < 0 or d.max() >= (1 << DELTA_BITS):
        return None
    if budgets.min() < 1 or budgets.max() > 31 \
            or slot0.min() < 0 or slot0.max() > 15:
        return None
    if int(staged.anchor_block[0]) != 0:
        # Device bases come from the budget cumsum, which assumes chunk 0
        # starts at block 0.
        return None
    # Span EXACTLY as the device computes it: from consecutive anchor
    # deltas, not chunk_end — for non-final chunks the next anchor can sit
    # past this chunk's last symbol (restart gaps), which only widens the
    # window (a chunk may land one class up; both sides agree).
    span = ((ab + d[1:]) >> 3) - (ab >> 3) + 9
    if span.max() > SLOT_CLASSES[-1]:
        return None
    # The delta-implied window must cover every chunk's true symbol span
    # (the kernel reads up to chunk_end + 8 bytes); violated only if a
    # chunk's recorded end ran PAST the next anchor — degrade, don't risk.
    true_span = (staged.chunk_end[:n].astype(np.int64) >> 3) - (ab >> 3) + 9
    if (span < true_span).any():
        return None
    syms = staged.chunk_syms[:n]
    cls_idx = np.searchsorted(np.asarray(SLOT_CLASSES), span)
    cls_count = np.bincount(cls_idx, minlength=8).astype(np.int32)
    cls_syms = np.zeros(8, np.int32)
    np.maximum.at(cls_syms, cls_idx, syms)
    dm = np.empty(n + 1, np.uint32)
    dm[:n] = ((d[:n].astype(np.uint32) << 9)
              | (budgets.astype(np.uint32) << 4)
              | slot0.astype(np.uint32))
    dm[n] = d[n].astype(np.uint32) << 9   # terminator: budget 0 = dead
    return dm, cls_count, cls_syms


def merge_image_packs_delta(entries, nb_image):
    """wire="delta" merge: per-image word streams concatenate (each keeps
    its gather pad); the per-chunk delta arrays concatenate with each
    image's FIRST delta rebased to the absolute gap from the previous
    image's terminator (word offsets are whole words, so every span — and
    with it the class partition and counts — is invariant). Block bases
    need no explicit offsets at all: each image's budgets sum to its block
    count, so the device's global budget cumsum lands image i's chunks at
    its cumulative block offset by construction. `nb_image` is accepted
    for signature parity with the other merges and only sanity-checked.

    Returns ((words, dm, cnts), shapes) or None on delta overflow at an
    image boundary / oversize merged stream (callers degrade the group to
    the words-packed merge).

    Class collapse (pack_delta under JPEG_TPU_CLASS_COLLAPSE): a collapsed
    input's host counts do NOT follow the span rule the merged device
    partition re-derives, so merging them under span classes decodes
    garbage. All-single-class inputs (collapsed or genuinely one-class)
    merge into ONE union class — the device's single-class shortcut keeps
    stream order, matching the summed counts for either kind. A mix of
    single- and multi-class inputs is declined when the single-class ones
    could be collapsed (callers decode those images singly)."""
    word_total = sum(len(e[0][0]) for e in entries)
    if word_total >= (1 << 26):
        # Absolute anchor bits must fit the device's int32 cumsum.
        return None
    single = [len(shapes) == 1 for (_c, shapes) in entries]
    collapse_merge = all(single)
    if not collapse_merge and any(
            s and _class_collapse_enabled() and shapes[0][3] <= COLLAPSE_MAX
            for s, (_c, shapes) in zip(single, entries)):
        return None
    per_class: dict = {}
    dm_parts = []
    word_off = 0
    prev_end = 0
    words_parts = []
    total_real = 0
    for (words, dm, cnts), shapes in entries:
        dmu = dm.view(np.uint32)
        n = int(cnts.sum())
        d = (dmu[:n + 1] >> 9).astype(np.int64)
        rest = dmu[:n + 1] & 0x1FF
        first_abs = d[0] + word_off * 32
        d0 = first_abs - prev_end
        if d0 < 0 or d0 >= (1 << DELTA_BITS):
            return None
        dd = d.copy()
        dd[0] = d0
        dm_parts.append(((dd.astype(np.uint32) << 9)
                         | rest.astype(np.uint32)))
        prev_end = first_abs + int(d[1:].sum())
        total_real += n
        for (sw, sm, _nb, ni) in shapes:
            key = 0 if collapse_merge else sw
            c0, s0, w0 = per_class.get(key, (0, 0, 0))
            per_class[key] = (c0 + ni, max(s0, sm), max(w0, sw))
        words_parts.append(words)
        word_off += len(words)

    shapes_out = []
    cnts_out = []
    cum = 0
    max_need = 0
    for key in sorted(per_class):
        cnt, sm, sw_max = per_class[key]
        sw = sw_max if collapse_merge else key
        nb = _bucket_items(cnt)
        shapes_out.append((sw, sm, nb, cnt))
        cnts_out.append(cnt)
        max_need = max(max_need, cum + nb)
        cum += cnt
    dm_real = np.concatenate(dm_parts)
    n_pad = _bucket_items(max(len(dm_real), max_need))
    dm_all = np.zeros(n_pad, np.uint32)
    dm_all[:len(dm_real)] = dm_real
    wcat = np.zeros(_bucket_words(word_off), np.int32)
    pos = 0
    for w in words_parts:
        wcat[pos:pos + len(w)] = w
        pos += len(w)
    return ((wcat, dm_all.view(np.int32), np.asarray(cnts_out, np.int32)),
            tuple(shapes_out))


def unpack_delta_classes(combined, class_shapes: tuple, n_blocks: int):
    """Device-side reconstruction of the 4 B/chunk delta wire (pack_delta):
    returns per present class (sb [nb], meta [nb], base [nb]) vectors in the
    host-packed layout (pad rows: sb 0 / meta 0 / base n_blocks — kernel
    no-op + rowmap drop).

    All vector ops: absolute anchor bits = cumsum of deltas; block bases =
    exclusive cumsum of budgets (chunks partition the blocks, so
    image-merge offsets emerge for free); class membership from the span
    implied by the NEXT delta (the same rule pack_delta classified with);
    the per-class stream-ordered partition = ONE stable argsort (budget-0
    terminators/pads sort past every class) + ONE 4-lane row gather +
    per-class dynamic slices at runtime count offsets."""
    import jax
    import jax.numpy as jnp

    _words, dm, cnts = combined
    d = jax.lax.shift_right_logical(dm, 9)
    budget = jax.lax.shift_right_logical(dm, 4) & 0x1F
    sl0 = dm & 0xF
    ab = jnp.cumsum(d, dtype=jnp.int32)
    sbv = jax.lax.shift_right_logical(ab, 3)
    if len(class_shapes) == 1:
        # Collapsed pack (or a genuinely single-class scan): every live
        # chunk belongs to the one class — skip the span rule (which would
        # re-derive the REAL classes and disagree with the host's counts
        # under JPEG_TPU_CLASS_COLLAPSE); dead/pad entries still sort last.
        cls = jnp.zeros_like(budget)
    else:
        d_next = jnp.concatenate([d[1:], jnp.zeros((1,), d.dtype)])
        spanb = jax.lax.shift_right_logical(ab + d_next, 3) - sbv + 9
        cls = sum((spanb > c).astype(jnp.int32) for c in SLOT_CLASSES)
    order = jnp.argsort(   # jnp.argsort is stable — within-class stream
        jnp.where(budget > 0, cls,   # order survives, which the rowmap's
                  jnp.int32(len(SLOT_CLASSES) + 1)))  # cummax requires
    basev = jnp.cumsum(budget, dtype=jnp.int32) - budget
    metav = (ab & 7) | (sl0 << 3) | (budget << 7)
    M = jnp.stack([sbv, metav, basev, jnp.zeros_like(sbv)], axis=1)
    Ms = jnp.take(M, order, axis=0)
    coff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts, dtype=jnp.int32)])
    out = []
    for ci, (_sw, _sm, nb) in enumerate(tuple(c[:3] for c in class_shapes)):
        seg = jax.lax.dynamic_slice(Ms, (coff[ci], 0), (nb, 4))
        real = jnp.arange(nb, dtype=jnp.int32) < cnts[ci]
        out.append((jnp.where(real, seg[:, 0], 0),
                    jnp.where(real, seg[:, 1], 0),
                    jnp.where(real, seg[:, 2], jnp.int32(n_blocks))))
    return out


def materialize_slots(words, sb, sw: int):
    """Build one class's slot words on device from the compressed stream —
    exactly the host jt_pack_slots layout (pad items read window 0, dropped
    by base=n_blocks). Returns [sw, nb]; the caller tiles to the kernel's
    (sw, G, 8, 128) layout.

    Formulation (round 4): the obvious [nb, sw+1] XLA gather over the 1-D
    word stream lowers to the per-element gather path (~26M elem/s measured
    on v5e = 9 ms/large_image — slower than the decode kernel it feeds).
    Instead: (1) ONE fast row gather of the aligned 64-word rows covering
    each chunk's window from the [R, 64]-reshaped stream (2 rows for
    classes up to 256 B, 3 for the 512 B class), (2) a 6-stage barrel
    rotate (select + static lane roll, o = start & 63) aligns the window
    to lane 0 — row count is chosen so o + sw < n_rows * 64 and
    wrap-around lanes are never read, (3) the constant per-chunk
    byte-misalignment shift. ~0.3 ms/large_image (was 9 ms as a 1-D XLA
    gather); bit-identical output (tested against the host-packed tiles by
    tests/test_pallas_decode.py, including a synthetic 512 B-class case).
    """
    import jax
    import jax.numpy as jnp

    b0 = jax.lax.shift_right_logical(sb, 2)
    n = words.shape[0]
    # Enough 64-word rows that a window starting at lane offset <= 63 still
    # fits: 63 + (sw + 1) <= n_rows * 64 (sw up to 128 for the 512 B class).
    n_rows = -(-(sw + 65) // 64)
    rows = -(-n // 64) + n_rows - 1
    w2 = jnp.concatenate(
        [words, jnp.zeros((rows * 64 - n,), words.dtype)]).reshape(rows, 64)
    # Real windows always satisfy r0 + n_rows - 1 <= rows - 1 (the wire pads
    # WORDS_PAD words past the last window, and `rows` adds n_rows - 1 rows
    # of zeros); the clip only sanitizes pad items' don't-care starts.
    r0 = jnp.minimum(jax.lax.shift_right_logical(b0, 6), rows - n_rows)
    idx = r0[:, None] + jnp.arange(n_rows, dtype=b0.dtype)[None, :]
    cat = jnp.take(w2, idx, axis=0, mode="clip").reshape(-1, n_rows * 64)
    o = b0 & 63
    for bshift in (32, 16, 8, 4, 2, 1):
        cat = jnp.where((o & bshift)[:, None] != 0,
                        jnp.roll(cat, -bshift, axis=1), cat)
    win = cat[:, :sw + 1]
    m = ((sb & 3) * 8)[:, None]
    hi = jax.lax.shift_left(win[:, :sw], m)
    lo = jax.lax.shift_right_logical(win[:, 1:], (32 - m) & 31)
    return jnp.transpose(hi | jnp.where(m > 0, lo, 0))


def _pack16_enabled() -> bool:
    """Packed dense emission (round 4): two natural coefficient positions
    per int32 dense row (wrap16 value in each 16-bit half), OR-accumulated.
    Sound because every (block, position) is written at most once per
    baseline scan (DC once at k==0; AC positions strictly increase and the
    k>=64 clamp fires `done` before a second write can land on 63), so OR
    == assignment and an emitted 0 coincides with "never written" (both
    decode to 0). Halves the dominant kernel cost (K_CAP*64 -> K_CAP*32
    read-modify-write vreg rows per symbol step) AND halves the dense
    array the layout-forced dense->rows transpose must move (hardware A/B
    tools/experiments/pack16_ab.py: kernel 2.51 -> 1.78 ms, decode+
    assembly 5.01 -> 4.26 ms/large_image). JPEG_TPU_PACK16=0 opts out;
    set-but-empty means default-on (the repo-wide '' convention)."""
    import os
    return os.environ.get("JPEG_TPU_PACK16", "1") not in ("0", "off")


def _build_decode_kernel(slot_w: int, s_max: int, n_tab: int,
                         pattern: tuple, interpret: bool,
                         pack16: bool = False):
    """pallas_call-able decode kernel for one class shape."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plen = max(len(pattern), 1)
    pat = list(pattern) if pattern else [0]
    unzig = [int(x) for x in UNZIGZAG]
    UNZ_INV = [0] * 64
    for _z, _n in enumerate(UNZIGZAG):
        UNZ_INV[_n] = _z
    from .device_scan import K_CAP as KCAP

    def kernel(slots_ref, meta_ref, base_ref, mc_ref, dl_ref, vv_ref,
               dense_ref):
        shp = (8, 128)

        meta = meta_ref[0]
        base = base_ref[0]
        bit0 = meta & 7
        slot0 = jax.lax.shift_right_logical(meta, 3) & 0x0F
        budget = jax.lax.shift_right_logical(meta, 7) & 0x1F

        # Hoisted scalar tables (loop-invariant).
        mc = [[mc_ref[t, l] for l in range(16)] for t in range(n_tab)]

        # Broadcast vreg chunks for delta (16 entries -> 2 chunks) and packed
        # values (64 words -> 8 chunks), per table.
        def chunks(ref, t, n_entries):
            out = []
            row = ref[t, :].reshape(1, n_entries).astype(jnp.int32)
            rowb = jnp.broadcast_to(row.T[:, :1], (n_entries, 128))
            for c in range(n_entries // 8):
                out.append(rowb[c * 8:(c + 1) * 8, :])
            return out

        dl_chunks = [chunks(dl_ref, t, 16) for t in range(n_tab)]
        vv_chunks = [chunks(vv_ref, t, 64) for t in range(n_tab)]

        def gather8(chunk, sub):
            return jnp.take_along_axis(chunk, sub, axis=0)

        def table_lookup(chunk_list, idx):
            """idx in [0, 8*len(chunk_list)): compose sublane gathers."""
            sub = idx & 7
            hi = idx >> 3
            acc = gather8(chunk_list[0], sub)
            for c in range(1, len(chunk_list)):
                acc = jnp.where(hi == c, gather8(chunk_list[c], sub), acc)
            return acc

        def tab_select(per_tab, tab):
            acc = per_tab[0]
            for t in range(1, n_tab):
                acc = jnp.where(tab == t, per_tab[t], acc)
            return acc

        zero = jnp.zeros(shp, jnp.int32)
        n_rows = KCAP * (32 if pack16 else 64)
        for r0 in range(n_rows):
            dense_ref[r0, 0] = zero

        def body(t, carry):
            p, k, blk, slot = carry
            active = blk < budget

            # --- bit window: select the two words covering position p ---
            widx = jax.lax.shift_right_logical(p, 5)
            b = p & 31
            w0 = zero
            w1 = zero
            for w in range(slot_w):
                row = slots_ref[w, 0]
                w0 = jnp.where(widx == w, row, w0)
                if w > 0:
                    w1 = jnp.where(widx == w - 1, row, w1)
            win = jnp.where(
                b == 0, w0,
                jax.lax.shift_left(w0, b)
                | jax.lax.shift_right_logical(w1, 32 - jnp.maximum(b, 1)))
            win16 = jax.lax.shift_right_logical(win, 16)

            # --- table id: (pair of current slot) * 2 + is_ac ---
            is_dc = k == 0
            pair = zero
            for s_i in range(plen):
                if pat[s_i]:
                    pair = jnp.where(slot == s_i, pat[s_i], pair)
            tab = pair * 2 + jnp.where(is_dc, 0, 1)

            # --- code length: F.16 maxcode chain ---
            run_fail = None
            length = jnp.ones(shp, jnp.int32)
            for L in range(1, 17):
                code_L = jax.lax.shift_right_logical(win16, 16 - L)
                mcv = tab_select([mc[t][L - 1] + zero for t in range(n_tab)],
                                 tab)
                fail = code_L > mcv
                run_fail = fail if run_fail is None else (run_fail & fail)
                length = length + run_fail.astype(jnp.int32)
            length = jnp.minimum(length, 16)

            # --- symbol value: values[code + delta[len]] ---
            code = jax.lax.shift_right_logical(win16, 16 - length)
            delta = tab_select(
                [table_lookup(dl_chunks[t], length - 1) for t in range(n_tab)],
                tab)
            vidx = jnp.clip(code + delta, 0, 255)
            word = tab_select(
                [table_lookup(vv_chunks[t],
                              jax.lax.shift_right_logical(vidx, 2))
                 for t in range(n_tab)], tab)
            value = jax.lax.shift_right_logical(
                word, 8 * (vidx & 3)) & 0xFF

            # --- receive/extend ---
            r = jax.lax.shift_right_logical(value, 4)
            s = value & 0x0F
            mag = jnp.where(is_dc, value, s)
            magm = jnp.maximum(mag, 1)
            mshift = jnp.maximum(32 - length - magm, 0)
            mbits = jax.lax.shift_right_logical(win, mshift) \
                & ((1 << magm) - 1)
            half = jax.lax.shift_left(jnp.ones(shp, jnp.int32), magm - 1)
            ext = jnp.where(mbits < half, mbits - 2 * half + 1, mbits)
            ext = jnp.where(mag == 0, 0, ext)

            # --- classify / emit ---
            is_zrl = (~is_dc) & (s == 0) & (r == 15)
            is_eob = (~is_dc) & (s == 0) & (r != 15)
            k_coeff = jnp.where(is_dc, 0, jnp.minimum(k + r, 63))
            emits = active & (is_dc | ((~is_zrl) & (~is_eob)))
            extm = jnp.where(emits, ext, 0)

            if pack16:
                # Packed dense emission: natural positions 2cp/2cp+1 ride
                # the low/high 16-bit halves of row j*32+cp as plain wrap16
                # values, OR-accumulated — write-once per (block, position)
                # makes OR == assignment, and an emitted 0 coincides with
                # "never written" exactly (both must decode to 0), so no
                # written-bit is needed. wrap16 at emission == the unpacked
                # path's i16 narrow at the transpose, for ALL i32 ext
                # values including +-32768 mod 2^16 DC deltas.
                enc = extm & 0xFFFF
                valp = []
                for cp in range(32):
                    lo = jnp.where(k_coeff == UNZ_INV[2 * cp], enc, 0)
                    hi = jnp.where(k_coeff == UNZ_INV[2 * cp + 1], enc, 0)
                    valp.append(lo | jax.lax.shift_left(hi, 16))
                for j in range(KCAP):
                    bj = blk == j
                    for cp in range(32):
                        dense_ref[j * 32 + cp, 0] = (
                            dense_ref[j * 32 + cp, 0]
                            | jnp.where(bj, valp[cp], zero))
            else:
                # Dense one-hot accumulation into the chunk's [K_CAP, 64]
                # output region (factored: 64 position selects + K_CAP row
                # masks).
                valc = [jnp.where(k_coeff == UNZ_INV[c], extm, 0)
                        for c in range(64)]
                for j in range(KCAP):
                    bj = blk == j
                    for c in range(64):
                        dense_ref[j * 64 + c, 0] = (
                            dense_ref[j * 64 + c, 0]
                            + jnp.where(bj, valc[c], zero))

            # --- state update ---
            consumed = jnp.where(active, length + mag, 0)
            k_next = jnp.where(
                is_dc, 1,
                jnp.where(is_zrl, k + 16,
                          jnp.where(is_eob, 64, k + r + 1)))
            done = active & (is_eob | (k_next >= 64))
            p = p + consumed
            k = jnp.where(active, jnp.where(done, 0, k_next), k)
            blk = blk + done.astype(jnp.int32)
            slot_next = slot + done.astype(jnp.int32)
            slot = jnp.where(slot_next >= plen, 0, slot_next)
            return (p, k, blk, slot)

        jax.lax.fori_loop(0, s_max, body,
                          (bit0, zero, zero, slot0))

    out_rows = KCAP * (32 if pack16 else 64)

    def call(slots_t, meta, base, mc, dl, vv):
        grid = slots_t.shape[1]
        tile = pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((slot_w, 1, 8, 128), lambda g: (0, g, 0, 0),
                             memory_space=pltpu.VMEM),
                tile, tile,
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((out_rows, 1, 8, 128),
                                   lambda g: (0, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((out_rows, grid, 8, 128),
                                           jnp.int32),
            interpret=interpret,
        )(slots_t, meta, base, mc, dl, vv)

    return call


def _nat_mxu() -> bool:
    """Dense->nat transpose strategy. MEASURED DEAD END on v5e (hardware
    A/B, tools/experiments/nat_mxu_ab.py 2026-08-20): the dot(X, I)
    formulation is 0.96x at DEFAULT matmul precision AND wrong — TPU
    f32 matmuls decompose to bf16 passes by default, rounding the 17-bit
    coefficient range; HIGHEST (6-pass) costs ~3x the FLOPs and loses
    worse. The vreg transpose stays the default; the flag remains for
    re-measurement on other generations (JPEG_TPU_NAT_MXU=1 forces)."""
    import os
    return os.environ.get("JPEG_TPU_NAT_MXU", "0") not in ("0", "", "off")


def unpack16_rows(dense, xp=np):
    """Unpack a pack16 kernel's dense output [K_CAP*32, G, 8, 128] i32 into
    rows [-1, 64] i16 in the same (chunk-region, natural position) order the
    unpacked transpose produces. Row j*32+cp packs natural positions 2cp
    (low 16-bit half) / 2cp+1 (high half) as plain wrap16 values (see the
    kernel's emit comment: write-once makes OR == assignment and 0 needs
    no written-bit). The halves interleave along the MAJOR (row) axis
    before the one transpose — row (j*32+cp)*2+half == j*64 + 2cp + half —
    so the interleave is pure addressing fused into the transpose read,
    never a minor-dim element shuffle (a post-transpose axis=-1 stack
    measured 2.5x SLOWER end-to-end than the unpacked baseline)."""
    import jax

    lo = (dense & 0xFFFF).astype(xp.int16)  # integer casts wrap (mod 2^16)
    if xp is np:
        hi = ((dense >> 16) & 0xFFFF).astype(xp.int16)
    else:
        hi = jax.lax.shift_right_logical(dense, 16).astype(xp.int16)
    d64 = xp.stack([lo, hi], axis=1).reshape(-1, *dense.shape[1:])
    return xp.transpose(d64, (1, 2, 3, 0)).reshape(-1, 64)


def build_pallas_sweep(class_shapes: tuple, n_tab: int, pattern: tuple,
                       n_blocks: int, device_slots: bool = False,
                       interpret: bool = False, raw: bool = False,
                       pack16: bool = None):
    """The per-class Pallas kernel sweep + rowmap compaction, independent of
    any per-image plan: returns fn(combined, mc, dl, vv) -> nat, an int16
    [n_blocks, 64] coefficient tensor in stream block order. Shared by the
    uniform batched decoder below and the heterogeneous (mixed-size) merge,
    where one sweep decodes every image's chunks and per-plan assemblers
    consume slices of `nat`.

    `pattern` is the per-MCU slot pattern already mapped through
    comp_to_upair; `n_blocks` may exceed the real merged block count (shape
    bucketing) — padding block positions gather garbage rows (clamped
    in-bounds) that callers never assemble.

    `pack16=None` snapshots the env flag at build time; lru-cached callers
    must snapshot it themselves and pass it through as part of their cache
    key (a stale cached decoder with the other emission layout decodes
    garbage, not an error).
    """
    import jax
    import jax.numpy as jnp

    from .device_scan import K_CAP

    class_shapes = tuple(c[:3] for c in class_shapes)
    if pack16 is None:
        pack16 = _pack16_enabled()
    kernels = [
        _build_decode_kernel(sw, sm, n_tab, pattern, interpret,
                             pack16=pack16)
        for (sw, sm, _nb) in class_shapes]

    # Static padded-row base of each class's region in the concatenated rows.
    class_row_base = []
    base = 0
    for (_sw, _sm, nb) in class_shapes:
        class_row_base.append(base)
        base += nb * K_CAP
    rows_total = base

    # Static split offsets for the combined H2D buffers (one device_put for
    # all classes' slots / meta / bases — per-call RPC overhead through the
    # host link is ~1ms, so per-class arrays would dominate small images).
    slot_off = []
    item_off = []
    so = io = 0
    for (sw, _sm, nb) in class_shapes:
        slot_off.append(so)
        item_off.append(io)
        so += sw * nb
        io += nb

    def run(combined, mc, dl, vv):
        per_class_delta = None
        if device_slots == "delta":
            per_class_delta = unpack_delta_classes(combined, class_shapes,
                                                   n_blocks)
            words = combined[0]
        elif device_slots and len(combined) == 3:
            # Compact 8 B/chunk metadata: (entry bit, budget|slot0<<5|base<<9)
            # — reconstruct the kernel's sb/meta/base with elementwise ops
            # (all shifts logical; values ride the uint32 wrap discipline).
            words, ab_all, pk_all = combined
            sb_all = jax.lax.shift_right_logical(ab_all, 3)
            meta_all = ((ab_all & 7)
                        | ((jax.lax.shift_right_logical(pk_all, 5) & 0xF) << 3)
                        | ((pk_all & 0x1F) << 7))
            base_all = jax.lax.shift_right_logical(pk_all, 9)
        elif device_slots:
            words, sb_all, meta_all, base_all = combined
        else:
            slots_all, meta_all, base_all = combined
        rows = []
        first_blks = []
        base_rows_all = []
        arange_b = jnp.arange(n_blocks, dtype=jnp.int32)
        for ci, (kern, (sw, _sm, nb), row0, so, io) in enumerate(zip(
                kernels, class_shapes, class_row_base, slot_off, item_off)):
            G = nb // 1024
            if device_slots == "delta":
                sb, meta, base = per_class_delta[ci]
                meta = meta.reshape(G, 8, 128)
                base = base.reshape(G, 8, 128)
                slots_t = materialize_slots(words, sb, sw).reshape(
                    sw, G, 8, 128)
            elif device_slots:
                sb = jax.lax.dynamic_slice(sb_all, (io,), (nb,))
                slots_t = materialize_slots(words, sb, sw).reshape(
                    sw, G, 8, 128)
                meta = jax.lax.dynamic_slice(
                    meta_all, (io,), (nb,)).reshape(G, 8, 128)
                base = jax.lax.dynamic_slice(
                    base_all, (io,), (nb,)).reshape(G, 8, 128)
            else:
                slots_t = jax.lax.dynamic_slice(
                    slots_all, (so,), (sw * nb,)).reshape(sw, G, 8, 128)
                meta = jax.lax.dynamic_slice(
                    meta_all, (io,), (nb,)).reshape(G, 8, 128)
                base = jax.lax.dynamic_slice(
                    base_all, (io,), (nb,)).reshape(G, 8, 128)
            starts = base.reshape(-1)
            dense = kern(slots_t, meta, base, mc, dl, vv)  # [K_CAP*64, G, 8, 128]
            # Narrow to int16 at the transpose (fused by XLA): every value is
            # exact in wrap-16 (AC coefficients directly; DC diffs modulo
            # 2^16, which the assembler's wrapping prefix sum preserves) and
            # the transpose write + rowmap gather traffic halves.
            if pack16:
                rows.append(unpack16_rows(dense, xp=jnp))
            elif _nat_mxu():
                # Transpose on the MXU: X^T as dot(X, I) with the shared
                # axis contracted — |values| < 2^17 are exact in f32, and
                # the wrap-16 narrow goes through int32 (f32->i16 would
                # CLAMP, not wrap). A vreg-layout relayout at ~25 GB/s
                # (2.69 ms/large_image measured) becomes a ~24 GFLOP
                # matmul; backend-measured default (see _nat_mxu).
                df = dense.reshape(dense.shape[0], -1).astype(jnp.float32)
                eye = jnp.eye(dense.shape[0], dtype=jnp.float32)
                natm = jax.lax.dot_general(
                    df, eye, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                rows.append(natm.reshape(-1, 64)
                            .astype(jnp.int32).astype(jnp.int16))
            else:
                rows.append(jnp.transpose(dense, (1, 2, 3, 0))
                            .reshape(-1, 64).astype(jnp.int16))

            # Per-class propagation: this class's items are stream-ordered,
            # so (start block, padded base) both increase — cummax fills
            # every block position with the class's latest start/base.
            # Stripe-shard mode (parallel/stripe_bits.py) rebases block
            # indices per stripe, so the FIRST chunk's start can be
            # NEGATIVE (it straddles the stripe entry): scatter its VALUE
            # at position 0 (`.at[]` would WRAP a negative position, not
            # drop it) and keep the init sentinel below any legal start.
            pb = jnp.arange(nb, dtype=jnp.int32) * K_CAP + row0
            pos = jnp.maximum(starts, 0)
            fb = jnp.full(n_blocks, -(1 << 30), jnp.int32).at[pos].set(
                starts, mode="drop")
            br = jnp.zeros(n_blocks, jnp.int32).at[pos].set(
                pb, mode="drop")
            fb = jax.lax.cummax(fb)
            br = jax.lax.cummax(br)
            first_blks.append(fb)
            base_rows_all.append(br)

        # Combine classes: each block belongs to the class whose chunk
        # started latest at or before it.
        best_fb = first_blks[0]
        best_br = base_rows_all[0]
        for fb, br in zip(first_blks[1:], base_rows_all[1:]):
            better = fb > best_fb
            best_br = jnp.where(better, br, best_br)
            best_fb = jnp.where(better, fb, best_fb)
        # Clamp: padding block positions (bucketed n_blocks) can extrapolate
        # past a class's real rows; real blocks are in-bounds by construction.
        rowmap = jnp.clip(best_br + (arange_b - best_fb), 0, rows_total - 1)

        all_rows = jnp.concatenate(rows)
        if raw:
            # Fused-assembly mode: the consumer composes its per-component
            # stream maps into `rowmap` and gathers straight off the padded
            # rows (build_assembler_fused) — no nat materialization.
            return all_rows, rowmap
        return jnp.take(all_rows, rowmap, axis=0)

    return run


def build_pallas_decoder(plan: ScanPlan, class_shapes: tuple,
                         n_tab: int, flat_stores: bool = True,
                         interpret: bool = False,
                         comp_to_upair: tuple = None,
                         n_images: int = 1, device_slots: bool = False,
                         pack16: bool = None):
    """Traceable decoder using per-class Pallas kernels + shared assembly.

    class_shapes: tuple of (slot_words, s_max, n_bucket[, n_items]) per class
    present. Returns fn(class_inputs, tab_mc, tab_dl, tab_vv) -> stores where
    class_inputs is a tuple of (slots_t, bit0, base, budget, slot0, starts).

    Each kernel emits dense [K_CAP*64] regions per chunk; the padded regions
    compact into stream block order with one i32 row gather driven by a
    rowmap built from per-class cummax propagation of (start block ->
    padded row base) — no element scatter anywhere (build_pallas_sweep).

    n_images > 1: the inputs are a merge_image_packs merge of same-plan
    images; one kernel sweep decodes every image's chunks, the rowmap spans
    n_images * plan.n_blocks blocks, and per-image assembly is vmapped —
    stores gain a leading image axis.
    """
    import jax

    # Map the per-MCU slot pattern (component positions) to unique pairs.
    if comp_to_upair is None:
        comp_to_upair = tuple(range(max(plan.pattern or [0]) + 1))
    pattern = tuple(comp_to_upair[c] for c in plan.pattern)
    n_blocks = plan.n_blocks * n_images

    from .device_scan import _fused_asm_enabled, build_assembler_fused
    if plan.structured is not None and _fused_asm_enabled():
        # Fused assembly (round 4): the sweep hands back (rows, rowmap)
        # and the assembler composes the structured stream maps into the
        # rowmap — one gather per component, no nat intermediate.
        sweep = build_pallas_sweep(class_shapes, n_tab, pattern, n_blocks,
                                   device_slots=device_slots,
                                   interpret=interpret, raw=True,
                                   pack16=pack16)
        assemble = build_assembler_fused(plan, flat_stores)

        def run(combined, mc, dl, vv):
            rows, rowmap = sweep(combined, mc, dl, vv)
            if n_images > 1:
                rm = rowmap.reshape(n_images, plan.n_blocks)
                return jax.vmap(lambda r: assemble(rows, r))(rm)
            return assemble(rows, rowmap)

        return run

    sweep = build_pallas_sweep(class_shapes, n_tab, pattern, n_blocks,
                               device_slots=device_slots, interpret=interpret,
                               pack16=pack16)
    assemble_nat = build_assembler_nat(plan, flat_stores)

    def run(combined, mc, dl, vv):
        nat = sweep(combined, mc, dl, vv)
        if n_images > 1:
            nat = nat.reshape(n_images, plan.n_blocks, 64)
            return jax.vmap(assemble_nat)(nat)
        return assemble_nat(nat)

    return run


@functools.lru_cache(maxsize=64)
def _compiled_pallas_decoder_cached(plan: ScanPlan, class_shapes: tuple,
                                    n_tab: int, interpret: bool,
                                    comp_to_upair: tuple,
                                    device_slots, pack16: bool):
    import jax

    from ..ops.pipeline import _enable_compile_cache
    _enable_compile_cache(jax)
    return jax.jit(build_pallas_decoder(plan, class_shapes, n_tab,
                                        interpret=interpret,
                                        comp_to_upair=comp_to_upair,
                                        device_slots=device_slots,
                                        pack16=pack16))


def _compiled_pallas_decoder(plan: ScanPlan, class_shapes: tuple, n_tab: int,
                             interpret: bool, comp_to_upair: tuple,
                             device_slots=False):
    """lru-cached compiled decoder. The pack16 env flag is snapshotted HERE
    and made part of the cache key — the kernel layout is baked in at build
    time, so a flip of JPEG_TPU_PACK16 in-process must miss the cache
    (ADVICE round 4)."""
    return _compiled_pallas_decoder_cached(plan, class_shapes, n_tab,
                                           interpret, comp_to_upair,
                                           device_slots, _pack16_enabled())


_compiled_pallas_decoder.cache_clear = _compiled_pallas_decoder_cached.cache_clear


def decode_anchored_pallas(staged: AnchoredScan, interpret: bool = False,
                           device_slots: bool = False,
                           compact: bool = False, wire: str = None):
    """Standalone: stores via the Pallas kernels; None if ineligible.
    `wire` overrides the legacy bool flags: "slots" | "words" |
    "words-packed" | "delta"."""
    if wire is None:
        wire = (("words-packed" if compact else "words") if device_slots
                else "slots")
    if wire == "delta":
        packed = pack_delta(staged)
        if packed is None:
            return None
        combined, shapes = packed
        fn = _compiled_pallas_decoder(
            staged.plan, tuple(s[:3] for s in shapes),
            len(staged.tab_maxcode), interpret, staged.comp_to_upair,
            "delta")
        return fn(combined, staged.tab_maxcode, staged.tab_delta,
                  staged.tab_values.view(np.int32))
    packs = pack_classes(staged, wire="words" if wire.startswith("words")
                         else "slots")
    if packs is None:
        return None
    shapes = tuple((p.slot_words, p.s_max, p.meta.size) for p in packs)
    fn = _compiled_pallas_decoder(
        staged.plan, shapes, len(staged.tab_maxcode), interpret,
        staged.comp_to_upair, wire.startswith("words"))
    combined = (combine_packs_words(packs, staged.words, staged.n_words,
                                    compact=wire == "words-packed")
                if wire.startswith("words") else combine_packs(packs))
    return fn(combined, staged.tab_maxcode, staged.tab_delta,
              staged.tab_values.view(np.int32))
