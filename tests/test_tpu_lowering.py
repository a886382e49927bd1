"""Hardware-free TPU-lowering smoke for the Pallas decode kernel.

`jax.export(platforms=["tpu"])` runs the full Mosaic lowering on CPU in
seconds; interpret-mode *execution* of the same kernel is minutes-to-hours
(BASELINE round-4 "CPU kernel-parity smoke"), so this is the only
default-suite gate that touches the compiled kernel structure at all. Two
assertions per config:

1. The kernel LOWERS — a Pallas-only regression (bad layout, unsupported
   op, shape that crashes Mosaic) fails here instead of on hardware.
2. The Mosaic op histogram matches a committed golden within tolerance —
   a material change to the kernel body (lost fusion, emission blow-up)
   moves the dominant counts far beyond the 15% drift budget.

Regenerate goldens after an INTENTIONAL kernel change with
    JPEG_TPU_REGEN_GOLDENS=1 python -m pytest tests/test_tpu_lowering.py
then re-validate bit-exactness on hardware (tools/tpu_validate.py).
"""

import json
import os

import numpy as np
import pytest

from conftest import REFTEST_IMAGES

from jpeg_decoder_tpu import Decoder
from jpeg_decoder_tpu.entropy import pallas_decode as pd
from jpeg_decoder_tpu.entropy.mosaic_export import (
    compare_histograms,
    export_tpu_mlir,
    mosaic_op_histogram,
)

from test_device_entropy import AnchorCapture

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                           "mosaic_histograms.json")
CASE_IMAGE = "mozilla/jpg-size-16x16.jpg"


def _staged():
    path = REFTEST_IMAGES / CASE_IMAGE
    if not path.exists():
        pytest.skip("reference corpus unavailable")
    d = Decoder(str(path))
    cap = AnchorCapture()
    d._prefix_capture = cap
    d._decode_entropy_only()
    return cap.scans[0][0]


def _export_histogram(staged, pack16: bool):
    packed = pd.pack_delta(staged)
    assert packed is not None
    combined, shapes = packed
    fn = pd.build_pallas_decoder(
        staged.plan, tuple(s[:3] for s in shapes), len(staged.tab_maxcode),
        comp_to_upair=staged.comp_to_upair, device_slots="delta",
        pack16=pack16)
    args = (combined, staged.tab_maxcode, staged.tab_delta,
            staged.tab_values.view(np.int32))
    mlir = export_tpu_mlir(fn, args)
    hist = mosaic_op_histogram(mlir)
    assert hist, "no Mosaic kernel body found in the exported module"
    return hist


@pytest.fixture(scope="module")
def histograms():
    staged = _staged()
    return {
        "delta-pack16": _export_histogram(staged, pack16=True),
        "delta-unpacked": _export_histogram(staged, pack16=False),
    }


def test_kernel_lowers_and_matches_golden(histograms):
    if os.environ.get("JPEG_TPU_REGEN_GOLDENS"):
        with open(GOLDEN_PATH, "w") as f:
            json.dump(histograms, f, indent=1, sort_keys=True)
        pytest.skip(f"goldens regenerated at {GOLDEN_PATH}")
    if not os.path.exists(GOLDEN_PATH):
        pytest.fail(f"golden missing: regenerate with "
                    f"JPEG_TPU_REGEN_GOLDENS=1 ({GOLDEN_PATH})")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    for key, hist in histograms.items():
        problems = compare_histograms(golden[key], hist)
        assert not problems, (
            f"Mosaic op histogram drifted for {key} (intentional kernel "
            f"change? regenerate goldens + revalidate on hardware):\n  "
            + "\n  ".join(problems))


def test_pack16_halves_emission(histograms):
    """The defining structural property of pack16: the dense-emission
    read-modify-write dominates the body, so packing two positions per
    row must cut the total vector load/store volume by roughly half."""
    def loadstore(h):
        return sum(v for k, v in h.items()
                   if k.endswith("vector.load") or k.endswith("vector.store"))

    packed = loadstore(histograms["delta-pack16"])
    unpacked = loadstore(histograms["delta-unpacked"])
    assert packed < 0.7 * unpacked, (packed, unpacked)
