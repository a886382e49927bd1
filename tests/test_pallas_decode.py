"""Pallas anchored-decode kernel vs the XLA decoder — bit-exact stores.

Interpret mode on CPU (compiled-mode parity runs on real TPU via
tools/tpu_validate.py). Both paths feed the shared assembler, so store
equality proves the kernel's symbol walk (window fetch, F.16 maxcode chain,
sublane-gather value lookups, state machine) matches the oracle semantics.
"""

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

CASES = [
    "rgb.jpg",                          # two table pairs, dense 4:4:4-class
    "restarts.jpg",                     # DRI-forced anchors
    "mjpeg.jpg",                        # OpenDML default tables
    "grayscale_16x24_sampling2x2.jpg",  # single pair, odd geometry
    "mozilla/jpg-size-33x33.jpg",
    "ycck.jpg",                         # 4 components sharing chroma pair
]


def _staged_scans(path):
    d = Decoder(str(path))
    cap = AnchorCapture()
    d._prefix_capture = cap
    d._decode_entropy_only()
    return [s for s, _ in cap.scans]


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
