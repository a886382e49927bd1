"""Stripe-sharded bits pipeline: one image's device entropy decode +
assembly + reconstruction across N mesh devices (parallel/stripe_bits.py).

Bit-exactness bar: pixels equal the numpy oracle decode exactly (the stripe
recon runs the exact integer kernels), across geometries that exercise every
seam mechanism — the straddling chunk (anchors never land on MCU-row
boundaries), the cross-stripe DC carry, aligned restart segmentation, and
the V2 chroma halo. The XLA engine runs compiled here (8-device virtual CPU
mesh); the Pallas engine's kernel is interpret-only on CPU (slow-gated walk
below, ci_matrix) — its stripe-specific host packing is pinned against
pack_classes per stripe in test_stripe_packer_matches_pack_classes.
"""

import io
import os

import numpy as np
import pytest

from jpeg_decoder_tpu import Decoder
from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder, stage_host_bits
from jpeg_decoder_tpu.parallel.stripe_bits import (
    decode_bits_striped,
    split_anchored_stripes,
)

PIL = pytest.importorskip("PIL.Image")


def _mesh(n):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]).reshape(n), ("stripe",))


def _jpeg(h, w, mode="RGB", seed=0, **save_kw):
    rng = np.random.default_rng(seed)
    if mode == "L":
        im = PIL.fromarray(rng.integers(0, 255, (h, w)).astype(np.uint8), "L")
    else:
        im = PIL.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
    b = io.BytesIO()
    im.save(b, format="JPEG", quality=80, **save_kw)
    return b.getvalue()


CASES = [
    # (name, seed, h, w, mode, n_stripes, save_kw) — heights deliberately
    # not multiples of the stripe extent so the crop region and the
    # truncated final chunk are exercised. Seeds are FIXED integers so a
    # failure reproduces across processes (hash() is salted per process).
    ("420", 101, 488, 648, "RGB", 8, dict(subsampling=2)),
    ("444", 102, 333, 500, "RGB", 8, dict(subsampling=0)),
    ("422", 103, 256, 256, "RGB", 8, dict(subsampling=1)),
    ("gray", 104, 300, 400, "L", 8, {}),
    ("420-dri-aligned", 105, 512, 512, "RGB", 4,
     dict(subsampling=2, restart_marker_blocks=4)),
    # One restart segment per stripe exactly (seg_blocks == n_c): DC resets
    # AT the stripe entry, so the seam carry must be suppressed — round-5
    # review-confirmed bug, wrong in every structured/fused assembler
    # before the fix.
    ("420-dri-one-seg-per-stripe", 106, 512, 512, "RGB", 4,
     dict(subsampling=2, restart_marker_blocks=256)),
    ("444-small", 107, 64, 64, "RGB", 8, dict(subsampling=0)),
    ("420-mesh4-odd", 108, 100, 90, "RGB", 4, dict(subsampling=2)),
]


@pytest.mark.parametrize("name,seed,h,w,mode,n,save_kw",
                         CASES, ids=[c[0] for c in CASES])
def test_striped_bits_matches_oracle(name, seed, h, w, mode, n, save_kw):
    data = _jpeg(h, w, mode, seed=seed, **save_kw)
    mesh = _mesh(n)
    st = stage_host_bits(data)
    out = decode_bits_striped(st, mesh, engine="xla")
    assert out is not None, "expected stripe-eligible image"
    px = np.asarray(out)
    gold = Decoder(data, backend="numpy").decode_array()
    assert px.shape == gold.shape
    bad = np.flatnonzero(px != gold)
    assert bad.size == 0, f"{bad.size} pixel mismatches"


def test_giant_image_30mpix():
    """The capability the stripe path exists for: a >=30 Mpix baseline JPEG
    decodes with its entropy decode sharded across 8 devices, bit-exact vs
    the single-device oracle (VERDICT round-4 item 1's done-bar). Smooth
    synthesized content keeps the host staging/oracle cost test-sized."""
    h, w = 4800, 6400                                  # 30.7 Mpix
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (h // 16, w // 16, 3)).astype(np.uint8)
    arr = np.asarray(PIL.fromarray(base).resize((w, h), PIL.BILINEAR))
    b = io.BytesIO()
    PIL.fromarray(arr).save(b, format="JPEG", quality=85, subsampling=2)
    data = b.getvalue()

    mesh = _mesh(8)
    st = stage_host_bits(data)
    out = decode_bits_striped(st, mesh, engine="xla")
    assert out is not None
    gold = Decoder(data, backend="numpy").decode_array()
    assert np.array_equal(np.asarray(out), gold)


def test_unaligned_dri_declines():
    """Restart segments that would straddle a stripe must decline (the DC
    reset position would be mis-modeled by the local segmented prefix sum).
    Ri=3 MCUs over 32-MCU rows with 8-row stripes never aligns."""
    data = _jpeg(512, 512, "RGB", seed=11, subsampling=2,
                 restart_marker_blocks=3)
    st = stage_host_bits(data)
    assert split_anchored_stripes(st.scans[0][0], 4) is None


def test_decoder_method_and_fallback():
    """DeviceStreamDecoder.decode_striped routes eligible images through
    the stripe pipeline and falls back to the single-device path (same
    pixels, unsharded) for ineligible ones."""
    mesh = _mesh(4)
    dec = DeviceStreamDecoder(host_threads=1, interchange="bits", mesh=mesh)
    data = _jpeg(200, 240, "RGB", seed=3, subsampling=2)
    out = np.asarray(dec.decode_striped(data, stripe_axis="stripe",
                                        engine="xla"))
    gold = Decoder(data, backend="numpy").decode_array()
    assert np.array_equal(out, gold)

    # Ineligible (16x16: fewer MCU rows than stripes) -> falls back to the
    # single-device pipeline, still correct within fast-precision tolerance.
    data2 = _jpeg(16, 16, "RGB", seed=4, subsampling=2)
    st2 = stage_host_bits(data2)
    from jpeg_decoder_tpu.parallel.stripe_bits import split_anchored_stripes
    assert split_anchored_stripes(st2.scans[0][0], 4) is None
    out2 = np.asarray(dec.decode_striped(data2))
    gold2 = Decoder(data2, backend="numpy").decode_array()
    assert out2.shape == gold2.shape
    assert np.abs(out2.astype(int) - gold2.astype(int)).max() <= 3


def test_dp_sp_bits_batch():
    """Full DP x SP composition on the bits path: a batch of same-layout
    images sharded over the data axis, each image's entropy decode striped
    over the stripe axis — bit-exact per image vs the oracle."""
    import jax
    from jax.sharding import Mesh

    from jpeg_decoder_tpu.parallel.stripe_bits import decode_bits_striped_batch

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("data", "stripe"))
    datas = [_jpeg(360, 480, "RGB", seed=200 + i, subsampling=2)
             for i in range(4)]
    st = [stage_host_bits(d) for d in datas]
    out = decode_bits_striped_batch(st, mesh)
    assert out is not None
    for i, d in enumerate(datas):
        gold = Decoder(d, backend="numpy").decode_array()
        assert np.array_equal(np.asarray(out[i]), gold), f"image {i}"


def test_stripe_packer_matches_pack_classes(monkeypatch):
    """The stripe words-wire packer must agree, per stripe, with
    pack_classes(wire="words") run on that stripe's rebased sub-scan —
    same class rule, same meta packing, same bases — for every real chunk.
    (Buckets differ by construction: the stripe packer buckets globally so
    one shard_map program covers every stripe; class collapse is pinned off
    — the stripe packer keeps the span classes so its layout stays uniform
    across stripes.)"""
    monkeypatch.setenv("JPEG_TPU_CLASS_COLLAPSE", "0")
    from types import SimpleNamespace

    from jpeg_decoder_tpu.entropy.pallas_decode import pack_classes
    from jpeg_decoder_tpu.parallel.stripe_bits import (_pack_stripes_words,
                                                       _stripe_ranges)

    data = _jpeg(488, 648, "RGB", seed=7, subsampling=2)
    st = stage_host_bits(data)
    scan0, _ = st.scans[0]
    n_stripes = 8
    split = split_anchored_stripes(scan0, n_stripes)
    assert split is not None and split.pallas is not None
    (sb_s, meta_s, base_s), class_shapes = split.pallas
    nb_local = split.n_blocks_local

    n = scan0.n_items
    blk = scan0.anchor_block[:n].astype(np.int64)
    ranges = _stripe_ranges(blk, n, nb_local, n_stripes, scan0.n_blocks)

    for d, (i0, i1) in enumerate(ranges):
        if i1 <= i0:
            continue
        b0 = d * nb_local
        m = i1 - i0
        w0 = int(scan0.anchor_bits[i0]) >> 5
        fill = int(min(nb_local, max(scan0.n_blocks - b0, 0)))
        ablk = np.full(m + 1, b0 + fill, np.int64)
        ablk[:m] = blk[i0:i1]
        sub = SimpleNamespace(
            n_items=m,
            anchor_bits=(scan0.anchor_bits[i0:i1].astype(np.int64)
                         - (w0 << 5)).astype(np.uint32),
            chunk_end=(scan0.chunk_end[i0:i1].astype(np.int64)
                       - (w0 << 5)).astype(np.uint32),
            chunk_syms=scan0.chunk_syms[i0:i1],
            anchor_block=(ablk - b0).astype(np.int32),
            anchor_slot=scan0.anchor_slot[i0:i1],
            n_blocks=nb_local,
            tab_maxcode=scan0.tab_maxcode,
            words=scan0.words,
        )
        packs = pack_classes(sub, wire="words")
        assert packs is not None
        # Reference layout per class from pack_classes (real items only).
        ref = {p.slot_words: p for p in packs}
        off = 0
        for (sw, _sm, nb) in class_shapes:
            got_sb = sb_s[d, off:off + nb]
            got_meta = meta_s[d, off:off + nb]
            got_base = base_s[d, off:off + nb]
            p = ref.get(sw)
            if p is None:
                assert not np.any(got_meta), "phantom chunks in empty class"
                off += nb
                continue
            k = p.n_items
            assert np.array_equal(got_meta[:k], p.meta.reshape(-1)[:k])
            assert np.array_equal(got_base[:k],
                                  p.block_base.reshape(-1)[:k])
            assert np.array_equal(got_sb[:k],
                                  (p.ab.reshape(-1)[:k].view(np.uint32)
                                   >> 3).view(np.int32))
            assert not np.any(got_meta[k:nb])
            off += nb


slow = pytest.mark.skipif(
    not os.environ.get("JPEG_TPU_SLOW_TESTS"),
    reason="interpret-mode kernel walk is minutes-slow (ci_matrix runs it); "
           "compiled Pallas stripe parity needs a multi-chip TPU mesh")


@slow
def test_pallas_stripe_engine_interpret():
    """Full Pallas stripe pipeline (words wire + fused assembly with the DC
    seam carry + halo recon) in interpret mode on a 2-stripe mesh."""
    mesh = _mesh(2)
    data = _jpeg(32, 32, "RGB", seed=9, subsampling=2)
    st = stage_host_bits(data)
    out = decode_bits_striped(st, mesh, engine="pallas", interpret=True)
    assert out is not None
    gold = Decoder(data, backend="numpy").decode_array()
    assert np.array_equal(np.asarray(out), gold)
