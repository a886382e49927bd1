#!/usr/bin/env python
"""Re-sweep the anchored-chunk shape knobs (K_CAP, S_TARGET) under the
round-4 regime, on real TPU hardware.

Round 2 chose (K_CAP=16, S_TARGET=96) when each extra chunk cost 8-12 B of
wire. The delta wire (4 B/chunk) halves that marginal cost, and the kernel
emission total scales as n_blocks * 64 * s_max_bucket — smaller chunks mean
a smaller symbol bucket, so denser anchoring now buys KERNEL time nearly
free. Methodology fixes vs kcap_ab: ONE jitted fori_loop per config
(phase-immune, parity-alternated inputs) and the consumer sums EVERY
component's stores (summing one component lets XLA dead-code the other
components' assembly — the round-4 "4.85 ms" trap, CLAUDE.md).

Reports device ms/iter (decode+assembly, all comps), chunk count, wire
B/px, and the implied full-pipeline estimate.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np

# Round-4 swept DOWNWARD (denser anchoring) and found ~neutral — the
# per-class s_max buckets stayed high regardless. Under the round-5
# UNLIMITED class collapse the work model is tiles x s_max_bucket, which
# favors LARGER chunks: lane-steps/symbol ~ (S_TARGET + 66 bucketed) /
# S_TARGET. Sweep upward too (budget field caps K_CAP at 31; the 224
# step-bucket caps S_TARGET at 158).
CONFIGS = ((24, 96), (16, 96), (12, 64),
           (24, 128), (24, 144), (31, 144), (31, 158))


def main():
    import jax
    import jax.numpy as jnp

    import jpeg_decoder_tpu.entropy.device_scan as ds
    from jpeg_decoder_tpu.entropy import pallas_decode as pd
    from tpu_validate import staged_scans

    assert jax.default_backend() == "tpu", jax.default_backend()
    path = "/root/reference/benches/large_image.jpg"
    mpix = 3.43
    defaults = (ds.K_CAP, ds.S_TARGET, ds.S_MAX)

    setups = []
    for kcap, s_target in CONFIGS:
        ds.K_CAP, ds.S_TARGET, ds.S_MAX = kcap, s_target, s_target + 66
        try:
            st = staged_scans(path)[0]
            packed = pd.pack_delta(st)
            if packed is None:
                print(f"K_CAP={kcap} S_TARGET={s_target}: delta INELIGIBLE")
                continue
            combined, shapes = packed
            fn = pd._compiled_pallas_decoder(
                st.plan, tuple(s[:3] for s in shapes),
                len(st.tab_maxcode), False, st.comp_to_upair, "delta")
            ca = tuple(jax.device_put(a) for a in combined)
            cb = tuple(jax.device_put(a) for a in combined)
            tabs = tuple(jax.device_put(x) for x in (
                st.tab_maxcode, st.tab_delta, st.tab_values.view(np.int32)))
            jax.block_until_ready(fn(ca, *tabs))  # compile
        except Exception as e:
            print(f"K_CAP={kcap} S_TARGET={s_target}: FAIL "
                  f"({type(e).__name__}: {str(e)[:140]})")
            continue
        finally:
            ds.K_CAP, ds.S_TARGET, ds.S_MAX = defaults
        h2d = sum(a.nbytes for a in combined)
        smaxes = tuple(s[1] for s in shapes)
        setups.append(((kcap, s_target), fn, ca, cb, tabs, h2d,
                       st.n_items, smaxes))

    n = 32

    def chained(fn):
        @jax.jit
        def run(ca, cb, t0, t1, t2):
            def body(i, acc):
                c = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(i % 2 == 0, a, b), ca, cb)
                outs = fn(c, t0, t1, t2)
                return acc + sum(o.astype(jnp.int32).sum() for o in outs)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return run

    runs = [(cfg, chained(fn), ca, cb, tabs, h2d, nc, sm)
            for (cfg, fn, ca, cb, tabs, h2d, nc, sm) in setups]
    for (cfg, run, ca, cb, tabs, *_rest) in runs:   # warm/compile
        int(jax.device_get(run(ca, cb, *tabs)))
    for (cfg, run, ca, cb, tabs, h2d, nc, sm) in runs:
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            int(jax.device_get(run(ca, cb, *tabs)))
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"K_CAP={cfg[0]:>2} S_TARGET={cfg[1]:>3}: "
              f"{best * 1e3:6.2f} ms/iter ({mpix / best:4.0f} Mpix/s "
              f"decode+assembly), {nc} chunks, s_max {sm}, "
              f"{h2d / (mpix * 1e6):.4f} B/px")


if __name__ == "__main__":
    main()
