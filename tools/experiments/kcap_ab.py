#!/usr/bin/env python
"""A/B the anchored-chunk block budget (K_CAP) on real TPU hardware.

Stages large_image at each K_CAP, uploads the packed class buffers ONCE,
then times the jitted Pallas decoder with device-resident inputs
(dependency-chained per CLAUDE.md timing rules). Reports device ms/iter,
chunk count, and H2D payload bytes per pixel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))) + "/repo")
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import jpeg_decoder_tpu.entropy.device_scan as ds
    from jpeg_decoder_tpu.entropy import pallas_decode as pd
    sys.path.insert(0, "/root/repo/tools")
    from tpu_validate import staged_scans

    assert jax.default_backend() == "tpu", jax.default_backend()
    path = "/root/reference/benches/large_image.jpg"
    mpix = 3.43

    import itertools
    for kcap, s_target in ((16, 96), (24, 96), (31, 96), (16, 64), (16, 144),
                           (24, 144)):
        ds.K_CAP = kcap
        ds.S_TARGET = s_target
        ds.S_MAX = s_target + 66
        st = staged_scans(path)[0]
        packs = pd.pack_classes(st)
        if packs is None:
            print(f"K_CAP={kcap} S_TARGET={s_target}: pallas INELIGIBLE")
            continue
        shapes = tuple((p.slot_words, p.s_max, p.slots_t.shape[1] * 1024)
                       for p in packs)
        fn = pd._compiled_pallas_decoder(
            st.plan, shapes, len(st.tab_maxcode), False, st.comp_to_upair)
        combined = jax.device_put(pd.combine_packs(packs))
        tm = jax.device_put(st.tab_maxcode)
        td = jax.device_put(st.tab_delta)
        tv = jax.device_put(st.tab_values.view(np.int32))

        h2d = sum(int(np.asarray(c).nbytes) for c in
                  jax.tree_util.tree_leaves(pd.combine_packs(packs)))
        nchunks = st.n_items

        outs = fn(combined, tm, td, tv)  # warm (compile cached from validate)
        jax.block_until_ready(outs)
        acc = None
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            outs = fn(combined, tm, td, tv)
            s = outs[0].astype(jnp.int32).sum()
            acc = s if acc is None else acc + s
        int(jax.device_get(acc))
        per = (time.perf_counter() - t0) / n
        print(f"K_CAP={kcap} S_TARGET={s_target}: {per*1e3:.2f} ms/img device "
              f"({mpix/per:.0f} Mpix/s), chunks={nchunks}, "
              f"h2d={h2d} B ({h2d/(mpix*1e6):.3f} B/px)")


if __name__ == "__main__":
    main()
