"""Pallas TPU kernels for the reconstruction hot path.

The XLA-compiled pipeline already fuses well; these kernels exist to (a) own
the exact tiling/fusion of the hottest op — dequantize + IDCT over every block
of a component as MXU matmuls with the dequantize and the round/bias/clamp
epilogue fused in VMEM — and (b) serve as the foundation for deeper fusions
(plane assembly + upsample + color) in later rounds.

Enabled via `use_pallas=True` on the fast-precision path (or the
JPEG_TPU_USE_PALLAS=1 environment variable); bit-identical to the jnp fast
path on TPU up to MXU f32 matmul accumulation (same contract).
"""

from __future__ import annotations

import functools

import numpy as np

from .idct import _IDCT_M64_T

BLOCK_TILE = 1024  # blocks per grid step: [1024, 64] tiles feed the MXU well


@functools.lru_cache(maxsize=None)
def _kernel_fn():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def dequant_idct_kernel(dense_ref, qt_ref, m_ref, out_ref):
        # dense_ref: int16 [T, 64] natural-order coefficients (VMEM)
        # qt_ref:    float32 [1, 64] dequantization row (VMEM)
        # m_ref:     float32 [64, 64] IDCT basis, coef -> pixel (VMEM)
        # out_ref:   uint8 [T, 64] pixel block rows (VMEM)
        s = dense_ref[:].astype(jnp.float32) * qt_ref[:]
        y = jax.lax.dot_general(
            s, m_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        clipped = jnp.clip(jnp.floor(y + jnp.float32(128.5)), 0, 255)
        # Mosaic has no direct f32->u8 cast; hop through int32.
        out_ref[:] = clipped.astype(jnp.int32).astype(jnp.uint8)

    return dequant_idct_kernel


def dequantize_and_idct_blocks_pallas(dense, qt, interpret: bool = False):
    """Pallas dequant+IDCT: int16 [N, 64] + uint16[64] -> uint8 [N, 8, 8].

    N is padded to the block tile internally; callers pass any N.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = dense.shape[0]
    n_pad = -(-n // BLOCK_TILE) * BLOCK_TILE
    if n_pad != n:
        dense = jnp.concatenate(
            [dense, jnp.zeros((n_pad - n, 64), jnp.int16)], axis=0)

    qt_row = qt.astype(jnp.float32).reshape(1, 64)
    m = jnp.asarray(_IDCT_M64_T)

    grid = (n_pad // BLOCK_TILE,)
    out = pl.pallas_call(
        _kernel_fn(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_TILE, 64), lambda i: (i, 0)),
            pl.BlockSpec((1, 64), lambda i: (0, 0)),
            pl.BlockSpec((64, 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_TILE, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 64), jnp.uint8),
        interpret=interpret,
    )(dense, qt_row, m)

    return out[:n].reshape(n, 8, 8)
