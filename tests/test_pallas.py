"""Pallas kernel parity (interpret mode on CPU; real-TPU parity is checked in
the perf harness since tests run on the CPU mesh)."""

import numpy as np

from conftest import REFTEST_IMAGES

from jpeg_decoder_tpu.ops.idct import dequantize_and_idct_blocks_fast


def test_pallas_dequant_idct_matches_fast():
    import jax.numpy as jnp
    from jpeg_decoder_tpu.ops.pallas_kernels import dequantize_and_idct_blocks_pallas

    rng = np.random.default_rng(42)
    dense = rng.integers(-1000, 1000, (1500, 64)).astype(np.int16)
    qt = rng.integers(1, 255, 64).astype(np.uint16)

    a = np.asarray(dequantize_and_idct_blocks_pallas(
        jnp.asarray(dense), jnp.asarray(qt), interpret=True))
    b = dequantize_and_idct_blocks_fast(dense, qt, xp=np)
    assert (a == b).all()


def test_pallas_handles_nonmultiple_block_counts():
    import jax.numpy as jnp
    from jpeg_decoder_tpu.ops.pallas_kernels import dequantize_and_idct_blocks_pallas

    rng = np.random.default_rng(7)
    dense = rng.integers(-100, 100, (37, 64)).astype(np.int16)
    qt = np.full(64, 16, np.uint16)
    a = np.asarray(dequantize_and_idct_blocks_pallas(
        jnp.asarray(dense), jnp.asarray(qt), interpret=True))
    b = dequantize_and_idct_blocks_fast(dense, qt, xp=np)
    assert a.shape == (37, 8, 8)
    assert (a == b).all()


def test_fused_h2v2_ycbcr_matches_oracle():
    import jax.numpy as jnp
    from jpeg_decoder_tpu.ops.pallas_kernels import fused_h2v2_ycbcr_pallas
    from jpeg_decoder_tpu.ops.upsample import upsample_component
    from jpeg_decoder_tpu.ops.color import ycbcr_to_rgb

    rng = np.random.default_rng(3)
    out_h, out_w = 100, 166          # odd-ish sizes, not tile multiples
    hc, wc = 50, 83
    y = rng.integers(0, 256, (out_h + 4, out_w + 2)).astype(np.uint8)
    cb = rng.integers(0, 256, (hc + 4, wc + 1)).astype(np.uint8)
    cr = rng.integers(0, 256, (hc + 4, wc + 1)).astype(np.uint8)

    out = np.asarray(fused_h2v2_ycbcr_pallas(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
        out_h, out_w, hc, wc, row_tile=32, interpret=True))

    cbu = upsample_component(cb, "h2v2", input_width=wc, input_height=hc,
                             out_rows=out_h, out_width=out_w, xp=np)
    cru = upsample_component(cr, "h2v2", input_width=wc, input_height=hc,
                             out_rows=out_h, out_width=out_w, xp=np)
    r, g, b = ycbcr_to_rgb(y[:out_h, :out_w], cbu, cru, xp=np)

    assert (out[0] == r).all() and (out[1] == g).all() and (out[2] == b).all()


def test_planar_pallas_stream_matches_fast_decode():
    """The fully-Pallas planar 4:2:0 tail through the stream pipeline equals
    the fast-precision interleaved decode, transposed."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder

    path = "/root/reference/tests/reftest/images/rgb.jpg"
    data = open(path, "rb").read()
    golden = Decoder(data, precision="fast").decode_array()  # [H, W, 3]

    dec = DeviceStreamDecoder(host_threads=1, layout="planar-pallas")
    out = np.asarray(dec.decode_stream([data])[0])           # [3, H, W]
    assert out.shape == (3,) + golden.shape[:2]
    assert (out == golden.transpose(2, 0, 1)).all()


def test_fused_h2v1_tail_matches_oracle():
    """4:2:2 planar-pallas tail (near==far collapses to the H2V1 taps):
    interpret-mode output == the oracle pipeline, bit-exact."""
    import jax.numpy as jnp

    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.ops.pallas_kernels import (pallas_tail_mode,
                                                     reconstruct_planar_pallas)
    from jpeg_decoder_tpu.ops.pipeline import geometry_from_frame, _reconstruct

    path = str(REFTEST_IMAGES / "mjpeg.jpg")   # 4:2:2 H2V1 chroma
    d = Decoder(path)
    d._decode_entropy_only()
    n = len(d.frame.components)
    stores = [jnp.asarray(d._pending_render[i][0].reshape(-1, 64))
              for i in range(n)]
    qts = [jnp.asarray(d._pending_render[i][1]) for i in range(n)]
    geometry = geometry_from_frame(
        d.frame, d._determine_color_transform(), precision="fast")
    assert pallas_tail_mode(geometry) == "422"

    got = np.asarray(reconstruct_planar_pallas(geometry, stores, qts,
                                               interpret=True))
    want = np.asarray(_reconstruct(geometry, stores, qts, jnp))
    assert (got == np.transpose(want, (2, 0, 1))).all()


def test_fused_gray_tail_matches_oracle():
    import jax.numpy as jnp

    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.ops.pallas_kernels import (pallas_tail_mode,
                                                     reconstruct_planar_pallas)
    from jpeg_decoder_tpu.ops.pipeline import geometry_from_frame, _reconstruct

    path = str(REFTEST_IMAGES / "grayscale_square.jpg")
    d = Decoder(path)
    d._decode_entropy_only()
    stores = [jnp.asarray(d._pending_render[0][0].reshape(-1, 64))]
    qts = [jnp.asarray(d._pending_render[0][1])]
    geometry = geometry_from_frame(d.frame, None, precision="fast")
    assert pallas_tail_mode(geometry) == "gray"

    got = np.asarray(reconstruct_planar_pallas(geometry, stores, qts,
                                               interpret=True))
    want = np.asarray(_reconstruct(geometry, stores, qts, jnp))
    assert (got == want).all()


def test_stream_planar_pallas_422_and_gray():
    """The planar-pallas stream layout now reaches 4:2:2 and grayscale."""
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder

    pp = DeviceStreamDecoder(host_threads=1, layout="planar-pallas")
    pl_ = DeviceStreamDecoder(host_threads=1, layout="planar")
    for name in ("mjpeg.jpg", "grayscale_square.jpg"):
        data = (REFTEST_IMAGES / name).read_bytes()
        a = np.asarray(pp.decode_stream([data])[0])
        b = np.asarray(pl_.decode_stream([data])[0])
        assert a.shape == b.shape and (a == b).all(), name
