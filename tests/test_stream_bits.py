"""Compressed-bits interchange through the streaming decoder.

`DeviceStreamDecoder(interchange="bits")` ships entropy-coded bytes + anchors
and Huffman-decodes on device (entropy/device_scan.py); output must be
bit-identical to the prefix interchange (which ships host-decoded
coefficients) for every image, with transparent prefix fallback for
progressive/lossless/quirk streams.
"""

import numpy as np
import pytest

from conftest import REFTEST_IMAGES, reftest_files

from jpeg_decoder_tpu import CodingProcess, Decoder
from jpeg_decoder_tpu.models.stream import (
    DeviceStreamDecoder,
    StagedBits,
    stage_host_bits,
)

NAMES = [
    "rgb.jpg",
    "restarts.jpg",
    "grayscale_16x24_sampling2x2.jpg",
    "mjpeg.jpg",
    "ycck.jpg",
    "16bit-qtables.jpg",
    "mozilla/jpg-progressive.jpg",     # falls back to prefix staging
    "mozilla/jpg-cmyk-1.jpg",
]


@pytest.fixture(scope="module")
def decoders():
    return (DeviceStreamDecoder(host_threads=2, interchange="prefix"),
            DeviceStreamDecoder(host_threads=2, interchange="bits"))


def test_mesh_sharded_bits_stream():
    """Bits interchange composed with mesh DP: stacked bucket-padded anchor
    arrays shard over the data axis (XLA anchored decoder vmapped per image);
    output must equal the single-device bits path, including heterogeneous
    streams (group flush on key change / ineligible images)."""
    import jax

    from jpeg_decoder_tpu.parallel import make_mesh

    mesh = make_mesh({"data": 8}, jax.devices("cpu"))
    rgb = (REFTEST_IMAGES / "rgb.jpg").read_bytes()
    prog = (REFTEST_IMAGES / "mozilla/jpg-progressive.jpg").read_bytes()

    plain = DeviceStreamDecoder(host_threads=1, interchange="bits")
    sharded = DeviceStreamDecoder(host_threads=1, interchange="bits",
                                  mesh=mesh)
    stream = [rgb] * 9 + [prog] + [rgb] * 3   # 8-group, 1-tail, fallback, 3
    ref = [np.asarray(o) for o in plain.decode_stream(stream)]
    got = sharded.decode_stream(stream, batch_size=8)
    assert len(got) == len(ref)
    for i, (a, b) in enumerate(zip(ref, got)):
        assert np.array_equal(a, np.asarray(b)), i


@pytest.mark.parametrize("name", NAMES)
def test_bits_matches_prefix(decoders, name):
    path = REFTEST_IMAGES / name
    if not path.exists():
        pytest.skip()
    prefix, bits = decoders
    data = path.read_bytes()
    a = np.asarray(prefix.decode_stream([data])[0])
    b = np.asarray(bits.decode_stream([data])[0])
    assert a.shape == b.shape
    assert (a == b).all()


def test_baseline_images_actually_stage_as_bits():
    staged = stage_host_bits(str(REFTEST_IMAGES / "rgb.jpg"))
    assert isinstance(staged, StagedBits)
    # H2D payload tracks the *compressed* size (bucketing + anchors within
    # ~45%), not the pixel count — that is the entire point.
    nbytes = sum(s.words.nbytes + s.anchor_bits.nbytes + s.anchor_block.nbytes
                 + s.anchor_slot.nbytes for s, _ in staged.scans)
    compressed = (REFTEST_IMAGES / "rgb.jpg").stat().st_size
    assert nbytes < 1.45 * compressed, f"{nbytes} vs {compressed}"


def test_large_image_bytes_per_pixel():
    staged = stage_host_bits("/root/reference/benches/large_image.jpg")
    assert isinstance(staged, StagedBits)
    nbytes = sum(s.words.nbytes + s.anchor_bits.nbytes + s.anchor_block.nbytes
                 + s.anchor_slot.nbytes for s, _ in staged.scans)
    px = staged.mpix * 1e6
    # vs ~0.9 B/px for the prefix interchange on the same content.
    assert nbytes / px < 0.3, f"{nbytes / px:.3f} B/px"


def test_group_key_separates_wire_formats(monkeypatch):
    """Images staged under different JPEG_TPU_WIRE values must never merge
    into one batched dispatch: their combined-array layouts differ and the
    words/slots mergers unpack different tuple shapes."""
    import jpeg_decoder_tpu.models.stream as S

    monkeypatch.setattr(S, "_bits_pallas_enabled", lambda: True)
    data = (REFTEST_IMAGES / "rgb.jpg").read_bytes()
    staged = {}
    for wire in ("slots", "words", "words-packed", "delta"):
        monkeypatch.setenv("JPEG_TPU_WIRE", wire)
        staged[wire] = stage_host_bits(data)
        assert staged[wire].pallas[0] is not None
        assert staged[wire].pallas[0][2] == wire
    # combined-array arity per wire: slots 3 (tiles), words 4, packed 3,
    # delta 3 (words + per-chunk u32 + class counts) — the group key's wire
    # string, not arity, keeps same-arity wires apart.
    assert len(staged["slots"].pallas[0][0]) == 3
    assert len(staged["words"].pallas[0][0]) == 4
    assert len(staged["words-packed"].pallas[0][0]) == 3
    assert len(staged["delta"].pallas[0][0]) == 3
    keys = [S._bits_group_key(staged[w])
            for w in ("slots", "words", "words-packed", "delta")]
    assert all(k is not None for k in keys)
    assert len(set(keys)) == 4
    k_words = keys[1]
    # and a same-wire restage still groups
    monkeypatch.setenv("JPEG_TPU_WIRE", "words")
    again = stage_host_bits(data)
    assert S._bits_group_key(again) == k_words


def test_progressive_transcodes_to_bits():
    """Progressive images re-encode into the bits interchange (transcode.py)
    rather than shipping prefix coefficients."""
    staged = stage_host_bits(str(REFTEST_IMAGES / "mozilla" / "jpg-progressive.jpg"))
    assert isinstance(staged, StagedBits)


def test_lossless_stages_for_device():
    """Lossless frames stage as StagedLossless (round 3): the host ships only
    the Huffman-decoded differences (mod-2^16 uint16 wire) and the predictor
    recurrence runs on device."""
    import pytest

    from jpeg_decoder_tpu.models.stream import StagedLossless

    path = REFTEST_IMAGES / "lossless" / "1" / "jpeg_lossless_sel1.jpg"
    if not path.exists():
        pytest.skip("lossless corpus image missing")
    st = stage_host_bits(str(path))
    assert isinstance(st, StagedLossless)
    assert st.diffs.dtype == np.uint16


def _lossless_corpus():
    root = REFTEST_IMAGES / "lossless"
    return sorted(root.rglob("*.jpg")) if root.exists() else []


def test_lossless_stream_corpus_bit_exact(decoders):
    """Every lossless corpus image (predictors sel1-7, 8/12/16-bit, DICOM
    MR4/XA1) through the streaming service == host oracle, bit-exact
    (/root/reference/src/decoder/lossless.rs semantics; the reftest bar for
    lossless is diff == 0). No host-side fallbacks allowed on this corpus."""
    prefix, bits = decoders
    files = _lossless_corpus()
    if not files:
        import pytest
        pytest.skip("lossless corpus missing")
    for f in files:
        data = f.read_bytes()
        ref = Decoder(data, backend="numpy").decode_array()
        for dec in (prefix, bits):
            got = np.asarray(dec.decode_stream([data])[0])
            assert got.shape == ref.shape, f.name
            assert (got == ref).all(), \
                f"{f.name}: {int((got != ref).sum())} mismatches"


def test_lossless_batch_and_mesh_parity(decoders):
    """Same-geometry lossless batches merge into one vmapped device dispatch
    (and shard over a mesh data axis), bit-exact vs the host oracle."""
    prefix, _ = decoders
    files = _lossless_corpus()
    if not files:
        import pytest
        pytest.skip("lossless corpus missing")
    data = files[0].read_bytes()
    ref = Decoder(data, backend="numpy").decode_array()
    outs = prefix.decode_stream([data] * 5, batch_size=4)
    assert len(outs) == 5
    for o in outs:
        assert (np.asarray(o) == ref).all()

    import jax
    if len(jax.devices()) >= 4:
        from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder
        from jpeg_decoder_tpu.parallel.mesh import make_mesh
        mesh = make_mesh({"data": 4})
        sharded = DeviceStreamDecoder(host_threads=2, mesh=mesh)
        outs = sharded.decode_stream([data] * 4, batch_size=4)
        for o in outs:
            assert (np.asarray(o) == ref).all()


def test_corpus_stream_bits_sweep(decoders):
    """Every reftest image through the bits stream == prefix stream."""
    prefix, bits = decoders
    checked = 0
    for jpg in reftest_files():
        probe = Decoder(str(jpg))
        try:
            probe.read_info()
        except Exception:  # noqa: BLE001
            continue
        info = probe.info()
        if info is None or info.coding_process == CodingProcess.LOSSLESS:
            continue  # lossless renders host-side, not via the DCT stream
        data = jpg.read_bytes()
        try:
            a = prefix.decode_stream([data])[0]
        except Exception:  # noqa: BLE001 — stream-ineligible image
            continue
        b = bits.decode_stream([data])[0]
        assert (np.asarray(a) == np.asarray(b)).all(), jpg.name
        checked += 1
    assert checked >= 30


def test_scaled_decode_bits(decoders):
    """IDCT-domain scaling through the bits interchange (dct_scale < 8)."""
    prefix, bits = decoders
    data = (REFTEST_IMAGES / "rgb.jpg").read_bytes()
    a = prefix.decode_stream([data], scale_to=(125, 84))[0]
    b = bits.decode_stream([data], scale_to=(125, 84))[0]
    assert np.asarray(a).shape == (84, 125, 3)
    assert (np.asarray(a) == np.asarray(b)).all()


@pytest.mark.parametrize("name,scale_to", [
    ("rgb.jpg", (60, 60)),                    # dct_scale 4, H2V2 chroma
    ("rgb.jpg", (30, 30)),                    # dct_scale 2
    ("rgb.jpg", (8, 8)),                      # dct_scale 1 (DC only)
    ("grayscale_square.jpg", (40, 40)),       # single-component
    ("ycck.jpg", (40, 40)),                   # 4-component YCCK
    ("restarts.jpg", (20, 20)),               # restart-interval stream
])
def test_scaled_decode_bits_small_scales(decoders, name, scale_to):
    """Scaled bits decode at genuine 4x4/2x2/1x1 Dugad-Ahuja kernel sizes
    (`/root/reference/src/idct.rs:454-565`) must match the numpy oracle
    within the fast-tier tolerance (the fast scaled basis is the float
    linearization of the exact integer kernels)."""
    _prefix, bits = decoders
    path = REFTEST_IMAGES / name
    d = Decoder(str(path), backend="numpy")
    d.scale(*scale_to)
    ref = d.decode_array()
    got = np.asarray(bits.decode_stream([path.read_bytes()],
                                        scale_to=scale_to)[0])
    assert got.shape == ref.shape
    assert int(np.abs(got.astype(int) - ref.astype(int)).max()) <= 3


def test_mesh_pallas_pipeline_traces(monkeypatch):
    """Trace-level regression for the shard_map + pallas_call composition:
    jax's VMA verifier (check_vma, default on) rejects pallas_call
    out_shapes inside a shard_map body at TRACE time — found on hardware
    (tools/tpu_validate.py mesh section aborted), invisible to the routing
    spy below. eval_shape drives the exact product builder through the
    trace without executing the (far too slow) interpret-mode kernel."""
    import jax

    import jpeg_decoder_tpu.models.stream as S
    from jpeg_decoder_tpu.parallel import make_mesh

    monkeypatch.setenv("JPEG_TPU_BITS_PALLAS", "interpret")
    data = (REFTEST_IMAGES / "rgb.jpg").read_bytes()
    st = stage_host_bits(data)
    assert st.pallas and st.pallas[0] is not None
    scan0, kept = st.scans[0]
    entry = st.pallas[0]
    batch = ndev = 4

    n_combined = len(entry[0])
    stacked = tuple(np.stack([entry[0][j]] * batch)
                    for j in range(n_combined))
    ncomp = len(st.qts)
    qts_b = tuple(np.stack([st.qts[c]] * batch) for c in range(ncomp))

    mesh = make_mesh({"data": ndev}, jax.devices("cpu")[:ndev])
    fn = S._compiled_bits_pipeline_mesh_pallas(
        scan0.plan, kept, batch, tuple(s[:3] for s in entry[1]),
        len(scan0.tab_maxcode), scan0.comp_to_upair, ncomp, st.geometry,
        "interleaved", S._wire_flag(entry[2]), n_combined,
        mesh, "data", interpret=True)
    out = jax.eval_shape(fn, stacked, scan0.tab_maxcode, scan0.tab_delta,
                         scan0.tab_values.view(np.int32), qts_b)
    assert out.shape[0] == batch and out.dtype == np.uint8


def test_mesh_bits_routes_to_pallas_engine(monkeypatch):
    """Mesh DP routing for the Pallas engine: when every image in a mesh
    group carries Pallas packs of one bucketed shape+wire, the dispatcher
    must take _decode_group_bits_mesh_pallas (per-image packed buffers
    stacked on the sharded image axis). The kernel execution itself is
    hardware-validated (tools/tpu_validate.py mesh section) — interpret
    mode is far too slow for CI — so this test spies on the route and
    checks outputs through the per-image fallback."""
    import jax

    import jpeg_decoder_tpu.models.stream as S
    from jpeg_decoder_tpu.parallel import make_mesh

    monkeypatch.setenv("JPEG_TPU_BITS_PALLAS", "interpret")
    data = (REFTEST_IMAGES / "rgb.jpg").read_bytes()

    st = stage_host_bits(data)
    assert st.pallas and st.pallas[0] is not None  # staging attaches packs

    called = {}

    def spy(self, group, entries, batch, kept):
        called.setdefault("groups", []).append(len(group))
        called.setdefault("batches", []).append(batch)
        called.setdefault("shapes", set()).update(
            (tuple(s[:3] for s in e[1]), e[2]) for e in entries)
        outs = []
        for g in group:   # XLA per-image fallback for output correctness
            g.pallas = None
            outs.append(self.decode_one(g))
        return outs

    monkeypatch.setattr(S.DeviceStreamDecoder,
                        "_decode_group_bits_mesh_pallas", spy)
    mesh = make_mesh({"data": 4}, jax.devices("cpu")[:4])
    sharded = S.DeviceStreamDecoder(host_threads=1, interchange="bits",
                                    mesh=mesh)
    plain = S.DeviceStreamDecoder(host_threads=1, interchange="prefix")
    ref = np.asarray(plain.decode_stream([data])[0])
    got = sharded.decode_stream([data] * 5, batch_size=4)
    assert called["groups"] == [4, 1]   # full group + tail, both routed
    assert all(b % 4 == 0 for b in called["batches"])
    assert len(called["shapes"]) == 1   # uniformity precondition held
    assert len(got) == 5
    for out in got:
        assert np.array_equal(ref, np.asarray(out))
