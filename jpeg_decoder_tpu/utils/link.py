"""Observed host->device link state, shared by throughput policies.

The TPU tunnel in this environment has strongly phase-dependent H2D
bandwidth (~1.3 GB/s burst, ~40 MB/s throttled, tens-of-MB/s degraded
phases lasting minutes — BASELINE.md) and per-dispatch RTTs observed from
0.1 ms to tens of seconds. Two consumers key decisions on it:

- `bench.py` caps its burst-trial budget when a probe shows the phase is
  hopeless (a burst number then times the relay, not the pipeline).
- `models/stream.py` keys the heterogeneous-merge policy on it: hetero
  merging trades MORE dispatches (1 sweep + #plans reconstructs vs #plans
  fused pipelines) for kernel-sweep amortization, which inverts when
  per-dispatch RTT dominates (mixed_ab round-4 degraded-phase data).

State is fed two ways: opportunistic EMA updates from real transfers
(`record_transfer`) and an explicit probe (`probe`, TTL-cached) when
nothing has been observed recently. `JPEG_TPU_LINK_MB_S` overrides both
(A/B harnesses pin the policy regardless of the live phase).
"""

from __future__ import annotations

import os
import time

# EMA of observed H2D rate and the wall-clock of the last update.
_state = {"mb_s": None, "t": 0.0}

DEGRADED_MB_S = 120.0     # below: per-dispatch RTT dominates small batches
_TTL_S = 60.0
_EMA = 0.3


def record_transfer(nbytes: int, seconds: float) -> None:
    """Fold a real observed H2D transfer into the EMA (cheap; called from
    the stream's h2d_submit paths for multi-MB puts only — small puts time
    dispatch overhead, not bandwidth)."""
    if seconds <= 0 or nbytes < (1 << 20):
        return
    rate = nbytes / 1e6 / seconds
    if rate > 5000.0:
        # Faster than the link can physically move bytes: the put returned
        # asynchronously and we timed enqueue, not transfer — no signal.
        return
    cur = _state["mb_s"]
    _state["mb_s"] = rate if cur is None else (1 - _EMA) * cur + _EMA * rate
    _state["t"] = time.monotonic()


def probe(n_mb: int = 2) -> float:
    """Measure the link directly with one device_put round-trip and fold it
    into the EMA. ~25 ms healthy / ~1 s degraded for 2 MB."""
    import numpy as np

    import jax

    buf = np.empty(n_mb << 20, np.uint8)
    t0 = time.perf_counter()
    jax.device_put(buf).block_until_ready()
    dt = time.perf_counter() - t0
    record_transfer(n_mb << 20, dt)
    return (n_mb << 20) / 1e6 / max(dt, 1e-9)


def link_mb_s(allow_probe: bool = True) -> float:
    """Current belief about the H2D link rate in MB/s. Env override first;
    then the EMA if fresh; else one probe (TTL-cached). Returns +inf when
    probing is disallowed and nothing has been observed (policies then
    behave as in a healthy phase — the round-3 default)."""
    v = os.environ.get("JPEG_TPU_LINK_MB_S")
    if v:
        try:
            return float(v)
        except ValueError:
            pass
    fresh = time.monotonic() - _state["t"] < _TTL_S
    if _state["mb_s"] is not None and fresh:
        return _state["mb_s"]
    if allow_probe:
        try:
            return probe()
        except Exception:
            pass
    return _state["mb_s"] if _state["mb_s"] is not None else float("inf")


def degraded(allow_probe: bool = False) -> bool:
    """True when the observed link is in a degraded phase. Defaults to NOT
    probing (policy checks must not add synchronous RTTs to the hot path);
    with no observations yet this answers False (healthy-phase behavior)."""
    return link_mb_s(allow_probe=allow_probe) < DEGRADED_MB_S
