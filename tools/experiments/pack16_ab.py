#!/usr/bin/env python
"""Hardware A/B for the packed dense emission (JPEG_TPU_PACK16).

The decode kernel's dominant cost is the dense one-hot emission:
K_CAP*64 read-modify-write vreg rows per symbol step (round-2 op-model,
CLAUDE.md). pack16 packs two natural positions per int32 row
(plain wrap16 16-bit halves, OR-accumulated; write-once per block makes
OR == assignment and an emitted 0 coincide with "unwritten" — a bias
encoding would alias ±32768-mod-2^16 DC deltas), halving both the
emission op count and the bytes the layout-forced dense->rows transpose
moves.

Checks bit-exactness of the packed path's stores against the unpacked
path (itself oracle-proven corpus-wide), then times decode+assembly for
both in ONE jitted fori_loop (phase-immune, parity-alternated inputs,
ALL components consumed — the round-4 DCE trap).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np


def build(pd, st, wire="delta"):
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
    mpix = st.plan.n_blocks * 64 / 3e6  # ~px per image (3 comps 4:4:4)

    variants = []
    for name, flag in (("unpacked", "0"), ("pack16", "1")):
        os.environ["JPEG_TPU_PACK16"] = flag
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
    os.environ["JPEG_TPU_PACK16"] = "0"
    pd._compiled_pallas_decoder.cache_clear()

    if len(variants) == 2:
        ref, got = variants[0][5], variants[1][5]
        ok = all(np.array_equal(a, b) for a, b in zip(ref, got))
        print("stores bit-exact:", ok, flush=True)
        if not ok:
            for i, (a, b) in enumerate(zip(ref, got)):
                d = (a.astype(np.int32) != b.astype(np.int32))
                print(f"  comp {i}: {int(d.sum())} mismatches of {a.size}; "
                      f"first {np.argwhere(d)[:3].tolist()}")

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
              f"({mpix / best:6.1f} Mpix/s decode+assembly)",
              flush=True)

    # Attribution: kernel-only (sum the dense output, no unpack/assembly)
    # and kernel+rows (through unpack16_rows / the transpose) per variant.
    packed = pd.pack_delta(st)
    combined, shapes = packed
    cshapes = tuple(s[:3] for s in shapes)
    n_blocks = st.plan.n_blocks
    pattern = tuple(st.comp_to_upair[c] for c in st.plan.pattern)
    n_tab = len(st.tab_maxcode)
    ca = tuple(jax.device_put(a) for a in combined)
    cb = tuple(jax.device_put(a) for a in combined)
    tabs = tuple(jax.device_put(x) for x in (
        st.tab_maxcode, st.tab_delta, st.tab_values.view(np.int32)))

    def stage_fn(pack16, through_rows):
        kerns = [pd._build_decode_kernel(sw, sm, n_tab, pattern, False,
                                         pack16=pack16)
                 for (sw, sm, _nb) in cshapes]

        def f(c, mc, dl, vv):
            import jax.numpy as jnp
            per = pd.unpack_delta_classes(c, cshapes, n_blocks)
            words = c[0]
            acc = jnp.int32(0)
            for kern, (sw, _sm, nb), (sb, meta, base) in zip(
                    kerns, cshapes, per):
                G = nb // 1024
                slots_t = pd.materialize_slots(words, sb, sw).reshape(
                    sw, G, 8, 128)
                dense = kern(slots_t, meta.reshape(G, 8, 128),
                             base.reshape(G, 8, 128), mc, dl, vv)
                if through_rows:
                    r = (pd.unpack16_rows(dense, xp=jnp) if pack16 else
                         jnp.transpose(dense, (1, 2, 3, 0))
                         .reshape(-1, 64).astype(jnp.int16))
                    acc = acc + r.astype(jnp.int32).sum()
                else:
                    acc = acc + dense.sum()
            return acc
        return f

    for pack16 in (False, True):
        for through_rows in (False, True):
            label = (f"{'pack16' if pack16 else 'unpacked'}"
                     f"[{'rows' if through_rows else 'kernel'}]")
            try:
                f = stage_fn(pack16, through_rows)

                @jax.jit
                def run(ca, cb, t0, t1, t2, f=f):
                    def body(i, acc):
                        c = jax.tree_util.tree_map(
                            lambda a, b: jnp.where(i % 2 == 0, a, b), ca, cb)
                        return acc + f(c, t0, t1, t2)
                    return jax.lax.fori_loop(0, n, body, jnp.int32(0))

                int(jax.device_get(run(ca, cb, *tabs)))
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(jax.device_get(run(ca, cb, *tabs)))
                    best = min(best, (time.perf_counter() - t0) / n)
                print(f"{label}: {best * 1e3:6.2f} ms/iter", flush=True)
            except Exception as e:
                print(f"{label}: FAIL {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
