"""Hardware-free structural introspection of the Pallas decode kernels.

`jax.export(platforms=["tpu"])` lowers a jitted function all the way through
Mosaic WITHOUT a TPU attached: the StableHLO module embeds each kernel as a
`tpu_custom_call` whose backend_config carries the serialized (MLIR bytecode)
Mosaic module. Deserializing that body and histogramming its ops gives a
fast, deterministic structural fingerprint of the kernel — the same trick
that produced the round-2 kernel cost model (CLAUDE.md, Pallas gotchas).

Used by `tests/test_tpu_lowering.py` as the default-suite kernel smoke: a
Mosaic-kernel-only regression (lowering failure, or a material change in the
emission structure) fails in seconds on CPU, where interpret-mode execution
is minutes-to-hours (BASELINE round-4 "CPU kernel-parity smoke").
"""

from __future__ import annotations

import base64
import collections
import json
import re


def export_tpu_mlir(fn, args) -> str:
    """Lower `fn(*args)` for the TPU platform (no hardware needed) and
    return the StableHLO module text."""
    import jax

    exported = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    return exported.mlir_module()


def _unescape_mlir_string(s: str) -> str:
    # MLIR text escapes non-printable/quote bytes as \XX hex pairs.
    return re.sub(r"\\([0-9A-Fa-f]{2})",
                  lambda m: chr(int(m.group(1), 16)), s)


def extract_mosaic_modules(mlir_text: str) -> list:
    """Return the deserialized Mosaic kernel bodies (MLIR text, one per
    tpu_custom_call) embedded in an exported StableHLO module."""
    from jax._src.lib.mlir import ir
    from jaxlib.mosaic.python import tpu as tpu_dialect

    bodies = []
    for cfg in re.findall(r'backend_config\s*=\s*"((?:[^"\\]|\\.)*)"',
                          mlir_text):
        if "custom_call_config" not in cfg:
            continue
        payload = json.loads(_unescape_mlir_string(cfg))
        body_b64 = payload.get("custom_call_config", {}).get("body")
        if not body_b64:
            continue
        data = base64.b64decode(body_b64)
        ctx = ir.Context()
        ctx.allow_unregistered_dialects = True
        tpu_dialect.register_dialect(ctx)
        bodies.append(str(ir.Module.parse(data, ctx)))
    return bodies


def mosaic_op_histogram(mlir_text: str) -> dict:
    """Op-name -> count over every Mosaic kernel body in the exported
    module (generic-form ops: `"stable_mosaic.arith.addi"(...)`)."""
    hist = collections.Counter()
    for body in extract_mosaic_modules(mlir_text):
        hist.update(re.findall(r'"(stable_mosaic\.[A-Za-z_0-9.]+)"\(', body))
    return dict(hist)


def compare_histograms(golden: dict, got: dict,
                       rel_tol: float = 0.15, abs_tol: int = 8) -> list:
    """Differences that exceed tolerance, as human-readable strings.

    Counts may drift a little across jax/Mosaic versions (canonicalization
    choices); a material kernel change (e.g. the pack16 emission halving,
    or a lost fusion) moves the dominant op counts far beyond 15%.
    """
    problems = []
    for op in sorted(set(golden) | set(got)):
        a, b = golden.get(op, 0), got.get(op, 0)
        if abs(a - b) <= abs_tol:
            continue
        if a == 0 or b == 0 or abs(a - b) / max(a, b) > rel_tol:
            problems.append(f"{op}: golden {a} vs got {b}")
    return problems
