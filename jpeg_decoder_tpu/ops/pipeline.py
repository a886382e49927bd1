"""Fused, jitted device pipeline: coefficient stores -> final image tensor.

This is the TPU execution path. Where the reference dispatches per-MCU-row
worker tasks (`/root/reference/src/worker/rayon.rs:140-219`), here the entire
per-image reconstruction — dequantize + IDCT of every block of every component,
chroma upsampling, and color conversion — is traced once per image *geometry*
and compiled by XLA into a single fused device program. Host work per image is
just the entropy stage and one int16 host->device transfer per component.

Geometry (shapes, sampling, scale, transform) is static under jit; pipelines
are cached per geometry so repeated decodes of same-shaped images (the serving
case) reuse the compiled executable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

from .color import ColorTransform, color_convert_image
from .idct import blocks_to_plane, dequantize_and_idct_blocks
from .upsample import upsample_component


@dataclasses.dataclass(frozen=True)
class ComponentGeometry:
    """Static per-component reconstruction parameters."""

    blocks_wide: int
    blocks_high: int
    dct_scale: int
    size_width: int
    size_height: int
    upsampler_mode: str
    h_scale: int
    v_scale: int


@dataclasses.dataclass(frozen=True)
class ImageGeometry:
    """Static per-image reconstruction parameters (the jit cache key)."""

    components: Tuple[ComponentGeometry, ...]
    out_width: int
    out_height: int
    transform: Optional[ColorTransform]  # None for single-component crop path
    # "exact": bit-identical integer kernels (the reference's
    # platform_independent contract). "fast": fp32 MXU IDCT, within reftest
    # tolerance (the reference's default-SIMD contract).
    precision: str = "exact"


import os

# Pallas kernel tier for the fast path (see ops/pallas_kernels.py): DEFAULT ON
# for TPU backends (bit-exact vs the jnp formulation, validated on v5e);
# JPEG_TPU_USE_PALLAS=0 opts out. CPU runs always use the jnp/XLA kernels
# (pallas_call is interpret-only there).
_USE_PALLAS = os.environ.get("JPEG_TPU_USE_PALLAS", "1") != "0"


def _pallas_tier_available(xp) -> bool:
    if not _USE_PALLAS or xp is np:
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _reconstruct(geometry: ImageGeometry, stores, qts, xp):
    """Trace the full reconstruction. `stores` are int16 [N_i, 64] per
    component, `qts` uint16[64] per component (natural order)."""
    from .idct import dequantize_and_idct_blocks_fast

    planes = []
    for comp, store, qt in zip(geometry.components, stores, qts):
        if geometry.precision == "fast":
            if _pallas_tier_available(xp):
                from .pallas_kernels import dequantize_and_idct_blocks_pallas
                pixels = dequantize_and_idct_blocks_pallas(
                    xp.asarray(store), xp.asarray(qt), scale=comp.dct_scale)
            else:
                pixels = dequantize_and_idct_blocks_fast(
                    store, qt, xp=xp, scale=comp.dct_scale)
        else:
            pixels = dequantize_and_idct_blocks(store, qt, comp.dct_scale, xp=xp)
        planes.append(blocks_to_plane(pixels, comp.blocks_wide, comp.blocks_high, xp=xp))

    if geometry.transform is None:
        comp = geometry.components[0]
        return planes[0][:comp.size_height, :comp.size_width]

    channels = [
        upsample_component(
            plane, comp.upsampler_mode,
            input_width=comp.size_width, input_height=comp.size_height,
            out_rows=geometry.out_height, out_width=geometry.out_width,
            h_scale=comp.h_scale, v_scale=comp.v_scale, xp=xp)
        for comp, plane in zip(geometry.components, planes)
    ]
    return color_convert_image(channels, geometry.transform, xp=xp)


def _enable_compile_cache(jax) -> None:
    """Persistent XLA compile cache: first-compile latency in this environment
    is seconds-to-minutes (remote compile through the TPU tunnel), so caching
    across processes matters for every tool/bench invocation."""
    import os
    if jax.config.jax_compilation_cache_dir:
        return
    try:
        # CPU compiles are fast and the cache is machine-feature-sensitive
        # (a cached CPU artifact from a different feature-detection pass can
        # SIGILL); only the remote TPU compiles are worth persisting.
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jpeg_tpu_jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


@functools.lru_cache(maxsize=256)
def _compiled_pipeline(geometry: ImageGeometry):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache(jax)

    def run(stores, qts):
        return _reconstruct(geometry, stores, qts, jnp)

    return jax.jit(run)


def reconstruct_image(geometry: ImageGeometry, stores, qts, backend: str = "numpy"):
    """Run the reconstruction pipeline.

    backend "numpy": host oracle. backend "jax": jitted device pipeline
    (compiled once per geometry, cached).
    Returns a numpy uint8 array ([H, W] or [H, W, C], or [H, W*C] for the
    raw/None transform layout).
    """
    if backend == "jax":
        out = _compiled_pipeline(geometry)(tuple(stores), tuple(qts))
        return np.asarray(out)
    if geometry.precision == "exact":
        native_out = _reconstruct_native_host(geometry, stores, qts)
        if native_out is not None:
            return native_out
    return _reconstruct(geometry, stores, qts, np)


def _reconstruct_native_host(geometry: ImageGeometry, stores, qts):
    """C++ host reconstruction (exact mode): scalar kernels bit-identical to
    the vectorized oracle, threaded over blocks/rows. Returns None when the
    native library is unavailable (callers fall back to numpy)."""
    from ..entropy.native import get_native
    native = get_native()
    if native is None or not hasattr(native, "idct_component"):
        return None

    planes = []
    for comp, store, qt in zip(geometry.components, stores, qts):
        store = np.ascontiguousarray(store, np.int16)
        planes.append(native.idct_component(
            store, qt, comp.blocks_wide, comp.blocks_high, comp.dct_scale))

    if geometry.transform is None:
        comp = geometry.components[0]
        return planes[0][:comp.size_height, :comp.size_width]

    # Raise the same errors the vectorized path would for invalid pairs.
    from .color import validate_transform
    validate_transform(len(planes), geometry.transform)
    tname = geometry.transform.value
    if tname not in ("None", "RGB", "YCbCr", "CMYK", "YCCK"):
        return None

    specs = [
        (comp.size_width, comp.size_height, comp.upsampler_mode,
         comp.h_scale, comp.v_scale)
        for comp in geometry.components
    ]
    return native.upsample_color(planes, specs, tname, geometry.out_width,
                                 geometry.out_height, len(planes))


def geometry_from_frame(frame, transform: Optional[ColorTransform],
                        precision: str = "exact") -> ImageGeometry:
    """Distill a parsed FrameInfo into the static geometry key."""
    from .upsample import choose_upsampler

    h_max = max(c.horizontal_sampling_factor for c in frame.components)
    v_max = max(c.vertical_sampling_factor for c in frame.components)
    out_w = frame.output_size.width
    out_h = frame.output_size.height

    comps = []
    for c in frame.components:
        if transform is None:
            mode, hs, vs = "h1v1", 1, 1
        else:
            mode, hs, vs = choose_upsampler(
                (c.horizontal_sampling_factor, c.vertical_sampling_factor),
                (h_max, v_max), out_w, out_h)
        comps.append(ComponentGeometry(
            blocks_wide=c.block_size.width,
            blocks_high=c.block_size.height,
            dct_scale=c.dct_scale,
            size_width=c.size.width,
            size_height=c.size.height,
            upsampler_mode=mode,
            h_scale=hs,
            v_scale=vs,
        ))

    return ImageGeometry(
        components=tuple(comps),
        out_width=out_w,
        out_height=out_h,
        transform=transform,
        precision=precision,
    )
