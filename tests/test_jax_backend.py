"""The jitted JAX pipeline must be bit-identical to the numpy oracle.

Runs on CPU (conftest pins jax_platforms=cpu); the same pipeline code is the
TPU path. Covers every upsampler mode, progressive, restarts, CMYK, grayscale,
and scaled decode.
"""

import pytest

from conftest import REFTEST_IMAGES

from jpeg_decoder_tpu import Decoder

CASES = [
    "rgb.jpg",                          # 4:2:0 YCbCr (H2V2)
    "mozilla/jpg-progressive.jpg",      # progressive
    "mozilla/jpg-cmyk-1.jpg",           # CMYK
    "grayscale_16x24_sampling2x2.jpg",  # 1-comp, non-trivial sampling
    "restarts.jpg",                     # restart intervals
    "mjpeg.jpg",                        # MJPEG default tables, 4:2:2 (H2V1)
    "extraneous-data.jpg",
    "mozilla/jpg-size-7x7.jpg",         # odd tiny size
]


@pytest.mark.parametrize("name", CASES)
def test_jax_matches_numpy(name):
    path = str(REFTEST_IMAGES / name)
    assert Decoder(path, backend="jax").decode() == Decoder(path, backend="numpy").decode()


@pytest.mark.parametrize("size", [(250, 167), (125, 84), (63, 42)])
def test_jax_matches_numpy_scaled(size):
    outs = []
    for backend in ("jax", "numpy"):
        d = Decoder(str(REFTEST_IMAGES / "rgb.jpg"), backend=backend)
        d.scale(*size)
        outs.append(d.decode())
    assert outs[0] == outs[1]
