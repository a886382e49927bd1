#!/usr/bin/env python
"""Hardware A/B for the fused-raster assembly strategy (round 5).

JPEG_TPU_FUSED_RASTER=1 composes the raster placement into the fused
assembler's one gather (build_assembler_fused): the stream-ordered
[n_c, 64] intermediate (a full row gather + its materialization per
component) disappears; the DC diffs ride the inverse/forward raster
transforms as vector ops. Bit-exactness is pinned on CPU corpus-wide
(tests/test_device_entropy.py::test_fused_assembler_matches_nat); this
measures decode+assembly per strategy in ONE jitted fori_loop
(phase-immune, parity-alternated inputs, ALL components consumed).

The flag is read at assembler BUILD time; this harness clears the compiled
decoder cache between variants (flip-at-process-start discipline, same as
JPEG_TPU_STRUCT_ASM).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np


def build(pd, st):
    import jax
    pd._compiled_pallas_decoder.cache_clear()
    packed = pd.pack_delta(st)
    assert packed is not None
    combined, shapes = packed
    fn = pd._compiled_pallas_decoder(
        st.plan, tuple(s[:3] for s in shapes),
        len(st.tab_maxcode), False, st.comp_to_upair, "delta")
    ca = tuple(jax.device_put(a) for a in combined)
    cb = tuple(jax.device_put(a) for a in combined)
    tabs = tuple(jax.device_put(x) for x in (
        st.tab_maxcode, st.tab_delta, st.tab_values.view(np.int32)))
    return fn, ca, cb, tabs


def main():
    import jax
    import jax.numpy as jnp

    from jpeg_decoder_tpu.entropy import pallas_decode as pd
    from tpu_validate import staged_scans

    assert jax.default_backend() == "tpu", jax.default_backend()
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/benches/large_image.jpg"
    st = staged_scans(path)[0]
    mpix = st.plan.n_blocks * 64 / 3e6

    os.environ["JPEG_TPU_FUSED_ASM"] = "1"   # force the fused assembler
    variants = []
    for name, flag in (("two-gather", "0"), ("fused-raster", "1")):
        os.environ["JPEG_TPU_FUSED_RASTER"] = flag
        try:
            fn, ca, cb, tabs = build(pd, st)
            outs = fn(ca, *tabs)
            outs = [np.asarray(jax.device_get(o)) for o in outs]
            variants.append((name, fn, ca, cb, tabs, outs))
            print(f"{name}: built, stores shapes "
                  f"{[o.shape for o in outs]}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    os.environ.pop("JPEG_TPU_FUSED_RASTER", None)
    pd._compiled_pallas_decoder.cache_clear()

    if len(variants) == 2:
        ref, got = variants[0][5], variants[1][5]
        ok = all(np.array_equal(a, b) for a, b in zip(ref, got))
        print("stores bit-exact:", ok, flush=True)
        if not ok:
            return 1

    n = 48

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

    for (name, fn, ca, cb, tabs, _o) in variants:
        run = chained(fn)
        int(jax.device_get(run(ca, cb, *tabs)))  # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(jax.device_get(run(ca, cb, *tabs)))
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"{name}: {best * 1e3:6.2f} ms/iter "
              f"({mpix / best:6.1f} Mpix/s decode+assembly)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
