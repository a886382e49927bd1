#!/usr/bin/env python
"""Profile the Pallas bits pipeline's assembly tail on real TPU hardware.

The kcap_ab fit says the decode kernel is ~3 ms/large_image and the XLA
assembly/reconstruction tail ~3.5 ms; this harness splits the tail into
cumulative pipelines (each stage's output feeds the real next op, so XLA
cannot elide work) and attributes cost by delta:

  A  kernel only                       (sum of dense chunk regions)
  B  A + transpose + rowmap + gather   (nat: [n_blocks, 64] stream order)
  C  B + assemble_nat                  (per-comp stream gather, DC cumsum,
                                        raster gather, i16 cast)

Dependency-chained timing per CLAUDE.md (scalar accumulator across
iterations, one D2H at the end); device-resident inputs; a throwaway warm
pass first (the first timed loop in a process runs ~7x slow through the
relay).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from jpeg_decoder_tpu.entropy import pallas_decode as pd
    from jpeg_decoder_tpu.entropy.device_scan import K_CAP, build_assembler_nat
    from tpu_validate import staged_scans

    assert jax.default_backend() == "tpu", jax.default_backend()
    path = "/root/reference/benches/large_image.jpg"
    mpix = 3.43

    st = staged_scans(path)[0]
    plan = st.plan
    packs = pd.pack_classes(st)
    shapes = tuple((p.slot_words, p.s_max, p.slots_t.shape[1] * 1024)
                   for p in packs)
    comp_to_upair = st.comp_to_upair
    pattern = tuple(comp_to_upair[c] for c in plan.pattern)
    n_tab = len(st.tab_maxcode)
    kernels = [pd._build_decode_kernel(sw, sm, n_tab, pattern, False)
               for (sw, sm, _nb) in shapes]
    # C must be the STRUCTURED assembler regardless of the backend-measured
    # default (gather on TPU since this harness's own numbers) — force it.
    os.environ["JPEG_TPU_STRUCT_ASM"] = "1"
    assemble_nat = build_assembler_nat(plan, True)
    del os.environ["JPEG_TPU_STRUCT_ASM"]
    n_blocks = plan.n_blocks

    class_row_base, slot_off, item_off = [], [], []
    base0 = so = io = 0
    for (sw, _sm, nb) in shapes:
        class_row_base.append(base0)
        slot_off.append(so)
        item_off.append(io)
        base0 += nb * K_CAP
        so += sw * nb
        io += nb

    def run_kernels(combined, mc, dl, vv):
        slots_all, meta_all, base_all = combined
        denses, starts_l = [], []
        for kern, (sw, _sm, nb), so_, io_ in zip(kernels, shapes, slot_off,
                                                 item_off):
            G = nb // 1024
            slots_t = lax.dynamic_slice(
                slots_all, (so_,), (sw * nb,)).reshape(sw, G, 8, 128)
            meta = lax.dynamic_slice(meta_all, (io_,), (nb,)).reshape(G, 8, 128)
            base = lax.dynamic_slice(base_all, (io_,), (nb,)).reshape(G, 8, 128)
            denses.append(kern(slots_t, meta, base, mc, dl, vv))
            starts_l.append(base.reshape(-1))
        return denses, starts_l

    def to_nat(denses, starts_l):
        rows, first_blks, base_rows_all = [], [], []
        arange_b = jnp.arange(n_blocks, dtype=jnp.int32)
        for dense, starts, (sw, _sm, nb), row0 in zip(
                denses, starts_l, shapes, class_row_base):
            rows.append(jnp.transpose(dense, (1, 2, 3, 0))
                        .reshape(-1, 64).astype(jnp.int16))  # as shipped
            pb = jnp.arange(nb, dtype=jnp.int32) * K_CAP + row0
            fb = jnp.full(n_blocks, -1, jnp.int32).at[starts].set(
                starts, mode="drop")
            br = jnp.zeros(n_blocks, jnp.int32).at[starts].set(
                pb, mode="drop")
            first_blks.append(lax.cummax(fb))
            base_rows_all.append(lax.cummax(br))
        best_fb, best_br = first_blks[0], base_rows_all[0]
        for fb, br in zip(first_blks[1:], base_rows_all[1:]):
            better = fb > best_fb
            best_br = jnp.where(better, br, best_br)
            best_fb = jnp.where(better, fb, best_fb)
        rowmap = best_br + (arange_b - best_fb)
        return jnp.take(jnp.concatenate(rows), rowmap, axis=0)

    def f_a(combined, mc, dl, vv):
        denses, _ = run_kernels(combined, mc, dl, vv)
        return sum(d.sum() for d in denses)

    def f_b1(combined, mc, dl, vv):
        # transpose + i16 narrow only (no rowmap, no gather)
        denses, _ = run_kernels(combined, mc, dl, vv)
        return sum(jnp.transpose(d, (1, 2, 3, 0)).reshape(-1, 64)
                   .astype(jnp.int16).astype(jnp.int32).sum()
                   for d in denses)

    def f_b2(combined, mc, dl, vv):
        # transpose + the rowmap build (scatter + cummax + merge), no gather
        denses, starts_l = run_kernels(combined, mc, dl, vv)
        tsum = sum(jnp.transpose(d, (1, 2, 3, 0)).reshape(-1, 64)
                   .astype(jnp.int16).astype(jnp.int32).sum()
                   for d in denses)
        first_blks, base_rows_all = [], []
        for starts, (sw, _sm, nb), row0 in zip(starts_l, shapes,
                                               class_row_base):
            pb = jnp.arange(nb, dtype=jnp.int32) * K_CAP + row0
            fb = jnp.full(n_blocks, -1, jnp.int32).at[starts].set(
                starts, mode="drop")
            br = jnp.zeros(n_blocks, jnp.int32).at[starts].set(
                pb, mode="drop")
            first_blks.append(lax.cummax(fb))
            base_rows_all.append(lax.cummax(br))
        best_fb, best_br = first_blks[0], base_rows_all[0]
        for fb, br in zip(first_blks[1:], base_rows_all[1:]):
            better = fb > best_fb
            best_br = jnp.where(better, br, best_br)
            best_fb = jnp.where(better, fb, best_fb)
        rowmap = best_br + (jnp.arange(n_blocks, dtype=jnp.int32) - best_fb)
        return tsum + rowmap.sum()

    def f_b(combined, mc, dl, vv):
        denses, starts_l = run_kernels(combined, mc, dl, vv)
        return to_nat(denses, starts_l).sum()

    # Both assembler strategies (structured reshape/transpose vs general
    # gathers) for the same plan — C/D attribute the difference.
    assert plan.structured is not None
    spec, plan.structured = plan.structured, None
    assemble_gather = build_assembler_nat(plan, True)
    plan.structured = spec

    def f_c(combined, mc, dl, vv):
        denses, starts_l = run_kernels(combined, mc, dl, vv)
        stores = assemble_nat(to_nat(denses, starts_l))
        return sum(s.astype(jnp.int32).sum() for s in stores)

    def f_d(combined, mc, dl, vv):
        denses, starts_l = run_kernels(combined, mc, dl, vv)
        stores = assemble_gather(to_nat(denses, starts_l))
        return sum(s.astype(jnp.int32).sum() for s in stores)

    combined = jax.device_put(pd.combine_packs(packs))
    tabs = (jax.device_put(st.tab_maxcode), jax.device_put(st.tab_delta),
            jax.device_put(st.tab_values.view(np.int32)))

    stages = [("A kernel", jax.jit(f_a)),
              ("B1 +transpose", jax.jit(f_b1)),
              ("B2 +rowmap", jax.jit(f_b2)),
              ("B +nat", jax.jit(f_b)),
              ("C +assemble[struct]", jax.jit(f_c)),
              ("D +assemble[gather]", jax.jit(f_d))]
    for name, fn in stages:
        jax.block_until_ready(fn(combined, *tabs))

    def timed(fn, n=15):
        acc = None
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(combined, *tabs).astype(jnp.int64)
            acc = s if acc is None else acc + s
        int(jax.device_get(acc))
        return (time.perf_counter() - t0) / n

    for name, fn in stages:   # throwaway warm pass
        timed(fn, n=3)
    results = dict((name, timed(fn)) for name, fn in stages)
    baseline_of = {"A kernel": None, "B1 +transpose": "A kernel",
                   "B2 +rowmap": "A kernel", "B +nat": "A kernel",
                   "C +assemble[struct]": "B +nat",
                   "D +assemble[gather]": "B +nat"}
    for name, _fn in stages:
        per = results[name]
        prev = results.get(baseline_of[name], 0.0) if baseline_of[name] \
            else 0.0
        print(f"{name}: {per * 1e3:7.2f} ms  (+{(per - prev) * 1e3:6.2f})  "
              f"{mpix / per:5.0f} Mpix/s")


if __name__ == "__main__":
    main()
