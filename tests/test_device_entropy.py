"""Device-side anchored entropy decode vs the host oracle — bit-exact stores.

The anchored engine (entropy/device_scan.py) must produce coefficient stores
byte-identical to `decode_scan_dct` (the oracle mirroring
`/root/reference/src/decoder.rs:863-1172`) for every baseline scan it accepts.
"""

import os

import numpy as np
import pytest

from conftest import REFTEST_IMAGES, reftest_files

from jpeg_decoder_tpu import CodingProcess, Decoder
from jpeg_decoder_tpu.entropy.device_scan import (
    PrescanFallback,
    decode_anchored_device,
    prescan_baseline,
)


class AnchorCapture:
    """Decoder hook staging every baseline scan for the device engine."""

    def __init__(self):
        self.scans = []   # (AnchoredScan, component_indices)
        self.used = False

    def wants(self, frame) -> bool:
        return True

    def decode_scan(self, decoder, frame, scan, finished):
        marker, staged = prescan_baseline(
            decoder._cursor, frame, scan,
            decoder._dc_huffman_tables, decoder._ac_huffman_tables,
            decoder._restart_interval)
        self.used = True
        self.scans.append((staged, list(scan.component_indices)))
        for pos, comp_i in enumerate(scan.component_indices):
            if finished[pos]:
                qt = decoder._quantization_tables[
                    frame.components[comp_i].quantization_table_index]
                decoder._pending_render[comp_i] = (None, qt.copy())
        return marker


def oracle_stores(path):
    d = Decoder(str(path))
    d._decode_entropy_only()
    n = len(d.frame.components)
    return [np.asarray(d._pending_render[i][0]) for i in range(n)], d


def device_stores(path):
    d = Decoder(str(path))
    cap = AnchorCapture()
    d._prefix_capture = cap
    d._decode_entropy_only()
    n = len(d.frame.components)
    out = [None] * n
    for staged, comp_indices in cap.scans:
        stores = decode_anchored_device(staged)
        for pos, comp_i in enumerate(comp_indices):
            out[comp_i] = np.asarray(stores[pos])
    return out, d


BASELINE_IMAGES = [
    "rgb.jpg",                            # 4:4:4-ish color
    "grayscale_square.jpg",
    "grayscale_16x24_sampling2x2.jpg",    # 2x2-sampled odd geometry
    "grayscale_24x16_sampling2x2.jpg",
    "restarts.jpg",                       # DRI segments
    "mjpeg.jpg",                          # AVI1 default tables
    "16bit-qtables.jpg",
    "extraneous-data.jpg",
    "mozilla/jpg-size-1x1.jpg",
    "mozilla/jpg-size-33x33.jpg",
    "mozilla/jpg-gray.jpg",
    "mozilla/jpg-cmyk-1.jpg",             # 4 components
    "ycck.jpg",
]


@pytest.mark.parametrize("name", BASELINE_IMAGES)
def test_device_stores_bit_exact(name):
    path = REFTEST_IMAGES / name
    if not path.exists():
        pytest.skip(f"{name} not in corpus")
    try:
        dev, _ = device_stores(path)
    except PrescanFallback as e:
        pytest.fail(f"prescan fell back on valid baseline image: {e}")
    gold, _ = oracle_stores(path)
    assert len(dev) == len(gold)
    for c, (a, b) in enumerate(zip(dev, gold)):
        assert a is not None, f"component {c} missing"
        assert a.dtype == np.int16
        bad = np.flatnonzero(a != b)
        assert bad.size == 0, (
            f"component {c}: {bad.size} coefficient mismatches, "
            f"first at {bad[:5]} dev={a[bad[:5]]} gold={b[bad[:5]]}")


def test_full_corpus_baseline_sweep():
    """Every sequential-DCT reftest image: anchored stores == oracle stores."""
    ran = 0
    for jpg in reftest_files():
        probe = Decoder(str(jpg))
        try:
            probe.read_info()
        except Exception:  # noqa: BLE001
            continue
        info = probe.info()
        if info is None or info.coding_process != CodingProcess.DCT_SEQUENTIAL:
            continue
        try:
            dev, _ = device_stores(jpg)
        except PrescanFallback:
            continue
        gold, _ = oracle_stores(jpg)
        for c, (a, b) in enumerate(zip(dev, gold)):
            assert a is not None and (a == b).all(), f"{jpg.name} comp {c}"
        ran += 1
    assert ran >= 25, f"only {ran} baseline images exercised the device engine"


def test_structured_assembler_matches_gather(monkeypatch):
    """The structured (reshape/slice/transpose/pad) assembler must equal the
    general gather assembler bit for bit on random natural-order tensors —
    for every reftest plan shape, including DRI segmentation and int32
    values that only agree modulo 2^16 (the wrap-16 DC contract)."""
    import jax

    # An ambient JPEG_TPU_STRUCT_ASM=0 (or a TPU default backend, where
    # gather is the measured default) would make both builders return the
    # gather assembler and the comparison vacuous — force the structured one.
    monkeypatch.setenv("JPEG_TPU_STRUCT_ASM", "1")

    from jpeg_decoder_tpu.entropy.device_scan import build_assembler_nat

    rng = np.random.default_rng(42)
    plans = []
    for name in ("rgb.jpg", "restarts.jpg", "mjpeg.jpg", "ycck.jpg",
                 "grayscale_16x24_sampling2x2.jpg"):
        cap = AnchorCapture()
        d = Decoder(str(REFTEST_IMAGES / name))
        d._prefix_capture = cap
        try:
            d._decode_entropy_only()
        except PrescanFallback:
            continue
        plans.extend(st.plan for st, _ in cap.scans)
    assert plans and all(p.structured is not None for p in plans)

    for plan in plans:
        nat = rng.integers(-70000, 70000,
                           (plan.n_blocks, 64)).astype(np.int32)
        structured_fn = build_assembler_nat(plan)
        # Force the gather path by temporarily hiding the spec.
        spec, plan.structured = plan.structured, None
        gather_fn = build_assembler_nat(plan)
        plan.structured = spec
        a = jax.jit(structured_fn)(nat)
        b = jax.jit(gather_fn)(nat)
        for c, (x, y) in enumerate(zip(a, b)):
            assert x.dtype == y.dtype == np.int16
            assert (np.asarray(x) == np.asarray(y)).all(), \
                f"comp {c} of plan {plan._key}"


def test_fused_assembler_matches_nat():
    """build_assembler_fused (rows+rowmap composition, the TPU default
    since round 4) must equal build_assembler_nat(take(rows, rowmap))
    bit-for-bit on every structured corpus plan — random padded rows and
    a realistic rowmap stress pad/clamp rows, DC segmentation (DRI
    plans), and multi-block-per-MCU patterns."""
    import jax.numpy as jnp
    from conftest import reftest_files
    from jpeg_decoder_tpu.entropy.device_scan import (build_assembler_fused,
                                                      build_assembler_nat)

    rng = np.random.default_rng(42)
    covered = 0
    for path in list(reftest_files())[:40]:
        if "lossless" in str(path):
            continue
        try:
            d = Decoder(str(path))
            cap = AnchorCapture()
            d._prefix_capture = cap
            d._decode_entropy_only()
            scans = [s for s, _c in cap.scans]
        except Exception:
            continue
        for staged in scans:
            plan = staged.plan
            if plan.structured is None or plan.n_blocks == 0:
                continue
            covered += 1
            nb = plan.n_blocks
            rows_total = nb + 37   # padded rows, incl. never-addressed pad
            rows = rng.integers(-32768, 32768,
                                (rows_total, 64)).astype(np.int16)
            # realistic-ish rowmap: blocks point anywhere into the rows
            rowmap = rng.integers(0, rows_total, nb).astype(np.int32)
            fused = build_assembler_fused(plan, flat_stores=False)
            nat_fn = build_assembler_nat(plan, flat_stores=False)
            nat = jnp.take(jnp.asarray(rows), jnp.asarray(rowmap), axis=0)
            a = fused(jnp.asarray(rows), jnp.asarray(rowmap))
            b = nat_fn(nat)
            assert len(a) == len(b)
            for c, (x, y) in enumerate(zip(a, b)):
                assert np.array_equal(np.asarray(x), np.asarray(y)), (
                    path, c)
            # Round-5 fused-raster strategy (raster placement composed
            # into the one gather) must be bit-identical too.
            prev = os.environ.get("JPEG_TPU_FUSED_RASTER")
            os.environ["JPEG_TPU_FUSED_RASTER"] = "1"
            try:
                fr = build_assembler_fused(plan, flat_stores=False)
            finally:
                if prev is None:
                    del os.environ["JPEG_TPU_FUSED_RASTER"]
                else:
                    os.environ["JPEG_TPU_FUSED_RASTER"] = prev
            c2 = fr(jnp.asarray(rows), jnp.asarray(rowmap))
            for c, (x, y) in enumerate(zip(c2, b)):
                assert np.array_equal(np.asarray(x), np.asarray(y)), (
                    "fused-raster", path, c)
        if covered >= 25:
            break
    assert covered >= 10, covered
