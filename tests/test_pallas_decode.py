"""Pallas anchored-decode kernel vs the XLA decoder — bit-exact stores.

Interpret mode on CPU (compiled-mode parity runs on real TPU via
tools/tpu_validate.py). Both paths feed the shared assembler, so store
equality proves the kernel's symbol walk (window fetch, F.16 maxcode chain,
sublane-gather value lookups, state machine) matches the oracle semantics.
"""

import os

import numpy as np
import pytest

from conftest import REFTEST_IMAGES

from jpeg_decoder_tpu import Decoder
from jpeg_decoder_tpu.entropy.device_scan import decode_anchored_device
from jpeg_decoder_tpu.entropy.pallas_decode import (
    decode_anchored_pallas,
    pack_classes,
)

from test_device_entropy import AnchorCapture

# Interpret mode executes the kernel body per step in Python (~1k traced ops
# per symbol step), so only tiny images are tractable here; real-image parity
# (rgb.jpg, restarts.jpg, large_image, corpus spots) runs compiled on actual
# TPU via tools/tpu_validate.py.
CASES = [
    "mozilla/jpg-size-1x1.jpg",
    "mozilla/jpg-size-8x8.jpg",
    "mozilla/jpg-size-16x16.jpg",
]


def _staged_scans(path):
    d = Decoder(str(path))
    cap = AnchorCapture()
    d._prefix_capture = cap
    d._decode_entropy_only()
    return [s for s, _ in cap.scans]


slow = pytest.mark.skipif(
    not os.environ.get("JPEG_TPU_SLOW_TESTS"),
    reason="interpret-mode kernel walk is minutes-slow; set "
           "JPEG_TPU_SLOW_TESTS=1 (tools/ci_matrix.sh does) or use "
           "tools/tpu_validate.py for compiled parity")


@slow
@pytest.mark.parametrize("name", CASES)
def test_pallas_matches_xla_decoder(name):
    path = REFTEST_IMAGES / name
    if not path.exists():
        pytest.skip()
    for staged in _staged_scans(path):
        dev = decode_anchored_pallas(staged, interpret=True)
        assert dev is not None, "expected Pallas-eligible scan"
        gold = decode_anchored_device(staged)
        for c, (a, b) in enumerate(zip(dev, gold)):
            bad = np.flatnonzero(np.asarray(a) != np.asarray(b))
            assert bad.size == 0, (
                f"{name} comp {c}: {bad.size} mismatches at {bad[:5]}")


def test_class_packing_budget():
    """Slot classes track the compressed size, not worst-case spans."""
    staged = _staged_scans(REFTEST_IMAGES / "rgb.jpg")[0]
    packs = pack_classes(staged)
    assert packs is not None
    slot_bytes = sum(p.n_items * p.slot_words * 4 for p in packs)
    stream_bytes = staged.words.nbytes
    assert slot_bytes < 3 * stream_bytes, (slot_bytes, stream_bytes)
    # Every chunk lands in exactly one class.
    assert sum(p.n_items for p in packs) == staged.n_items
