"""Pallas kernel parity (interpret mode on CPU; real-TPU parity is checked in
the perf harness since tests run on the CPU mesh)."""

import numpy as np
import pytest

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
