#!/usr/bin/env python
"""Compiled-mode TPU validation of the device entropy engines.

Runs on real TPU hardware (the test suite pins itself to CPU, where Pallas
only interprets): for a corpus spot-check plus large_image, asserts

  1. Pallas dense-kernel stores == XLA lax.scan decoder stores (bit-exact),
  2. bits-interchange stream output == prefix-interchange output on device,

and reports device-only decode times. Usage: python tools/tpu_validate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASES = [
    "/root/reference/tests/reftest/images/rgb.jpg",
    "/root/reference/tests/reftest/images/restarts.jpg",
    "/root/reference/tests/reftest/images/mjpeg.jpg",
    "/root/reference/tests/reftest/images/ycck.jpg",
    "/root/reference/tests/reftest/images/grayscale_16x24_sampling2x2.jpg",
    "/root/reference/benches/tower.jpg",
    "/root/reference/benches/large_image.jpg",
]


def staged_scans(path):
    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.entropy.device_scan import prescan_baseline

    scans = []

    class Cap:
        def wants(self, f):
            return True

        def decode_scan(self, dec, frame, scan, fin):
            m, st = prescan_baseline(
                dec._cursor, frame, scan, dec._dc_huffman_tables,
                dec._ac_huffman_tables, dec._restart_interval)
            scans.append(st)
            for pos, ci in enumerate(scan.component_indices):
                qt = dec._quantization_tables[
                    frame.components[ci].quantization_table_index]
                dec._pending_render[ci] = (None, qt.copy())
            return m

    d = Decoder(path)
    d._prefix_capture = Cap()
    d._decode_entropy_only()
    return scans


TAIL_CASES = [
    # (path, expected pallas_tail_mode) — one exemplar per fused-tail
    # geometry family (test_pallas.py runs these interpret-mode on CPU; here
    # they compile through Mosaic on the real chip).
    ("/root/reference/tests/reftest/images/ycck.jpg", "fused"),
    ("/root/reference/tests/reftest/images/mozilla/jpg-cmyk-1.jpg", "fused"),
    ("/root/reference/tests/reftest/images/mozilla/jpg-cmyk-2.jpg", "fused"),
    ("/root/reference/tests/reftest/images/16bit-qtables.jpg", "fused"),
    ("/root/reference/tests/reftest/images/mjpeg.jpg", "fused"),
    ("/root/reference/tests/reftest/images/rgb.jpg", "stack"),
    ("/root/reference/tests/reftest/images/grayscale_square.jpg", "gray"),
    ("/root/reference/benches/tower.jpg", "fused"),
]


def validate_planar_tails(jax, jnp) -> int:
    """Compiled-mode parity of the fused Pallas tails vs the XLA pipeline,
    one geometry family per case; equality reduced on device (D2H is
    scalar-only through the relay)."""
    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.ops.pallas_kernels import (pallas_tail_mode,
                                                     reconstruct_planar_pallas)
    from jpeg_decoder_tpu.ops.pipeline import _reconstruct, geometry_from_frame

    failures = 0
    for path, want_mode in TAIL_CASES:
        if not os.path.exists(path):
            continue
        name = os.path.basename(path)
        d = Decoder(path)
        d._decode_entropy_only()
        n = len(d.frame.components)
        stores = tuple(
            jax.device_put(d._pending_render[i][0].reshape(-1, 64))
            for i in range(n))
        qts = tuple(jax.device_put(d._pending_render[i][1]) for i in range(n))
        transform = None if n == 1 else d._determine_color_transform()
        geometry = geometry_from_frame(d.frame, transform, precision="fast")
        mode = pallas_tail_mode(geometry)
        if mode != want_mode:
            print(f"{name}: tail mode {mode} != {want_mode} MISMATCH")
            failures += 1
            continue

        def run(stores, qts, geometry=geometry):
            got = reconstruct_planar_pallas(geometry, stores, qts,
                                            interpret=False)
            want = _reconstruct(geometry, stores, qts, jnp)
            if want.ndim == 3:
                want = jnp.transpose(want, (2, 0, 1))
            return jnp.sum(got != want)

        bad = int(jax.device_get(jax.jit(run)(stores, qts)))
        if bad:
            print(f"{name} [{mode}]: {bad} MISMATCHES")
            failures += 1
        else:
            print(f"{name}: planar tail [{mode}] OK")
    return failures


def validate_transcode(jax, jnp) -> int:
    """Transcoded scans (synthesized tables, DC categories to 16) through the
    compiled Pallas kernel: stores must equal both the XLA decoder and the
    host oracle; progressive stream output must equal the prefix path."""
    import io

    from PIL import Image

    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.entropy.device_scan import decode_anchored_device
    from jpeg_decoder_tpu.entropy.pallas_decode import decode_anchored_pallas
    from jpeg_decoder_tpu.entropy.transcode import transcode_scan
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder

    failures = 0
    tc_cases = [
        "/root/reference/tests/reftest/images/rgb.jpg",
        "/root/reference/tests/reftest/images/progressive3.jpg",
        "/root/reference/tests/reftest/images/mozilla/jpg-cmyk-1.jpg",
    ]
    for path in tc_cases:
        name = os.path.basename(path)
        d = Decoder(path)
        d._decode_entropy_only()
        n = len(d.frame.components)
        stores = [np.asarray(d._pending_render[i][0]).reshape(-1)
                  for i in range(n)]
        _, st = transcode_scan(d.frame, stores)
        dev = decode_anchored_pallas(st)
        if dev is None:
            print(f"transcode {name}: pallas INELIGIBLE")
            failures += 1
            continue
        gold = decode_anchored_device(st)
        for c, (a, b) in enumerate(zip(dev, gold)):
            bad = int((np.asarray(a) != np.asarray(b)).sum())
            host_bad = int((np.asarray(a) != stores[c]).sum())
            if bad or host_bad:
                failures += 1
                print(f"transcode {name} comp {c}: {bad} vs XLA, "
                      f"{host_bad} vs host MISMATCHES")
        print(f"transcode {name}: pallas==xla==host stores OK")

    # Extreme-value store: the extended alphabet's edge categories compiled.
    rng = np.random.default_rng(7)
    arr = np.zeros((32, 48), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "L").save(buf, "JPEG", quality=95)
    d = Decoder(buf.getvalue())
    d._decode_entropy_only()
    nb = d.frame.components[0].block_size.width \
        * d.frame.components[0].block_size.height
    store = rng.integers(-32767, 32768, (nb, 64), np.int64).astype(np.int16)
    store[0, 0] = -32768
    _, st = transcode_scan(d.frame, [store.reshape(-1)])
    dev = decode_anchored_pallas(st)
    bad = 0 if dev is None else int((np.asarray(dev[0])
                                     != store.reshape(-1)).sum())
    if dev is None or bad:
        failures += 1
    print(f"transcode extreme-value store: "
          f"{'OK' if dev is not None and bad == 0 else f'{bad} MISMATCHES'}")

    # Stream-level: progressive through transcode+Pallas vs prefix path.
    prog = "/root/reference/tests/reftest/images/progressive3.jpg"
    bits = DeviceStreamDecoder(host_threads=3, interchange="bits")
    prefix = DeviceStreamDecoder(host_threads=3, interchange="prefix")
    a = bits.decode_stream([prog])[0]
    b = prefix.decode_stream([prog])[0]
    diff = int(jax.device_get(
        jnp.abs(a.astype(jnp.int16) - b.astype(jnp.int16)).max()))
    print(f"progressive3 stream bits(transcode)==prefix on TPU: max diff {diff}")
    failures += diff != 0
    return failures


SCALED_CASES = [
    # (path, scale_to) — one per Dugad-Ahuja kernel size; compiled through
    # Mosaic on the real chip (the fast tier's scaled_idct_basis matmul +
    # scaled Pallas IDCT), compared on device vs the host numpy oracle.
    ("/root/reference/tests/reftest/images/rgb.jpg", (60, 60)),    # 4x4
    ("/root/reference/tests/reftest/images/rgb.jpg", (30, 30)),    # 2x2
    ("/root/reference/tests/reftest/images/rgb.jpg", (8, 8)),      # 1x1
    ("/root/reference/tests/reftest/images/grayscale_square.jpg", (40, 40)),
]


def validate_scaled(jax, jnp) -> int:
    """Scaled decode (dct_scale < 8) through the bits stream on device vs
    the host numpy oracle (fast-tier tolerance <= 3). The oracle pixels are
    device_put (scaled outputs are tiny) and compared on device."""
    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder

    failures = 0
    bits = DeviceStreamDecoder(host_threads=2, interchange="bits")
    for path, scale_to in SCALED_CASES:
        name = os.path.basename(path)
        d = Decoder(path, backend="numpy")
        d.scale(*scale_to)
        ref = d.decode_array()
        got = bits.decode_stream([open(path, "rb").read()],
                                 scale_to=scale_to)[0]
        ref_dev = jax.device_put(ref.reshape(got.shape).astype(np.int16))
        diff = int(jax.device_get(
            jnp.abs(got.astype(jnp.int16) - ref_dev).max()))
        ok = diff <= 3
        print(f"{name} scaled {scale_to}: max diff {diff} "
              f"{'OK' if ok else 'MISMATCH'}")
        failures += not ok

    # Fused Pallas tail at scaled geometry (planar-pallas layout compiles
    # fused_tail_pallas for dct_scale < 8 plane shapes through Mosaic —
    # interpret-mode parity is in test_pallas.py, this is the compiled run).
    planar = DeviceStreamDecoder(host_threads=2, interchange="bits",
                                 layout="planar-pallas")
    for path, scale_to in (SCALED_CASES[0], SCALED_CASES[1]):
        name = os.path.basename(path)
        d = Decoder(path, backend="numpy")
        d.scale(*scale_to)
        ref = d.decode_array()
        got = planar.decode_stream([open(path, "rb").read()],
                                   scale_to=scale_to)[0]
        ref_p = np.transpose(ref, (2, 0, 1)) if ref.ndim == 3 else ref
        ref_dev = jax.device_put(ref_p.reshape(got.shape).astype(np.int16))
        diff = int(jax.device_get(
            jnp.abs(got.astype(jnp.int16) - ref_dev).max()))
        ok = diff <= 3
        print(f"{name} scaled {scale_to} [planar-pallas]: max diff {diff} "
              f"{'OK' if ok else 'MISMATCH'}")
        failures += not ok
    return failures


def validate_mesh_pallas(jax, jnp) -> int:
    """Mesh-sharded bits dispatch on the Pallas engine, compiled through
    Mosaic under shard_map (a 1-device mesh on the real chip — the multi-
    chip shape is the same program over more shards; the routing/stacking
    logic is CPU-tested). Output must equal the single-device bits path."""
    import jpeg_decoder_tpu.models.stream as S
    from jpeg_decoder_tpu.parallel import make_mesh

    mesh = make_mesh({"data": 1}, jax.devices()[:1])
    data = open("/root/reference/tests/reftest/images/rgb.jpg", "rb").read()
    plain = S.DeviceStreamDecoder(host_threads=2, interchange="bits")
    ref = plain.decode_stream([data])[0]
    sharded = S.DeviceStreamDecoder(host_threads=2, interchange="bits",
                                    mesh=mesh)
    routed = {}
    orig = S.DeviceStreamDecoder._decode_group_bits_mesh_pallas

    def spy(self, group, entries, batch, kept):
        routed["n"] = len(group)
        return orig(self, group, entries, batch, kept)

    S.DeviceStreamDecoder._decode_group_bits_mesh_pallas = spy
    try:
        outs = sharded.decode_stream([data] * 3, batch_size=2)
    finally:
        S.DeviceStreamDecoder._decode_group_bits_mesh_pallas = orig
    if "n" not in routed:
        print("mesh-pallas: NOT ROUTED (fell back to XLA mesh path)")
        return 1
    bad = 0
    for out in outs:
        bad += int(jax.device_get(jnp.sum(out != ref)))
    print(f"rgb.jpg x3 mesh(1-dev) pallas == single: "
          f"{'OK' if bad == 0 else f'{bad} MISMATCHES'}")
    return bad != 0


def validate_hetero_bits(jax, jnp) -> int:
    """Mixed-size batched-bits merge (round 3): one kernel sweep + per-plan
    assembly slices. A synthesized same-encoder mixed stream must route
    through _decode_group_bits_hetero and match per-image bits decodes."""
    import io

    from PIL import Image

    import jpeg_decoder_tpu.models.stream as S

    def synth(w, h, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=88, subsampling=2)
        return buf.getvalue()

    imgs = [synth(320, 240, 1), synth(640, 480, 2), synth(320, 240, 3),
            synth(1024, 768, 4)]
    plain = S.DeviceStreamDecoder(host_threads=2, interchange="bits")
    refs = [plain.decode_stream([d])[0] for d in imgs]

    routed = {}
    orig = S.DeviceStreamDecoder._decode_group_bits_hetero

    def spy(self, group):
        routed["n"] = len(group)
        return orig(self, group)

    # The default policy is size-aware (hetero merge only <= 0.25 Mpix,
    # measured in tools/experiments/mixed_ab.py); force the threshold up so
    # this section exercises the full mixed-plan sweep + slice machinery.
    os.environ["JPEG_TPU_HETERO_BITS"] = "999"
    S.DeviceStreamDecoder._decode_group_bits_hetero = spy
    try:
        dec = S.DeviceStreamDecoder(host_threads=2, interchange="bits")
        outs = dec.decode_stream(imgs, batch_size=8)
    finally:
        S.DeviceStreamDecoder._decode_group_bits_hetero = orig
        os.environ.pop("JPEG_TPU_HETERO_BITS", None)
    if routed.get("n") != 4:
        print(f"hetero-bits: NOT ROUTED (group={routed.get('n')})")
        return 1
    bad = 0
    for out, ref in zip(outs, refs):
        bad += int(jax.device_get(jnp.sum(out != ref)))
    print(f"mixed-size x4 hetero sweep == per-image bits: "
          f"{'OK' if bad == 0 else f'{bad} MISMATCHES'}")
    return bad != 0


def validate_lossless_stream(jax, jnp) -> int:
    """Lossless through the stream (round 3): device predictor closed forms /
    wavefront vs the host oracle, bit-exact, single + batched."""
    import glob

    from jpeg_decoder_tpu import Decoder
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder

    files = sorted(glob.glob(
        "/root/reference/tests/reftest/images/lossless/**/*.jpg",
        recursive=True))
    if not files:
        return 0
    dec = DeviceStreamDecoder(host_threads=2)
    bad_total = 0
    for f in files:
        data = open(f, "rb").read()
        ref = Decoder(data, backend="numpy").decode_array()
        out = dec.decode_stream([data])[0]
        bad = int(jax.device_get(jnp.sum(out != jnp.asarray(ref))))
        if bad:
            print(f"lossless {os.path.basename(f)}: {bad} MISMATCHES")
            bad_total += 1
    data = open(files[0], "rb").read()
    ref = Decoder(data, backend="numpy").decode_array()
    outs = dec.decode_stream([data] * 5, batch_size=4)
    for out in outs:
        bad_total += int(jax.device_get(jnp.sum(out != jnp.asarray(ref)))) != 0
    print(f"lossless stream on TPU: {len(files)} singles + batch x5 "
          f"{'OK' if bad_total == 0 else f'{bad_total} FAILURES'}")
    return bad_total != 0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from jpeg_decoder_tpu.entropy.device_scan import decode_anchored_device
    from jpeg_decoder_tpu.entropy.pallas_decode import decode_anchored_pallas
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder

    assert jax.default_backend() == "tpu", jax.default_backend()
    failures = 0

    for path in CASES:
        if not os.path.exists(path):
            continue
        name = os.path.basename(path)
        for i, st in enumerate(staged_scans(path)):
            dev = decode_anchored_pallas(st)
            if dev is None:
                print(f"{name} scan {i}: pallas INELIGIBLE")
                continue
            gold = decode_anchored_device(st)
            for c, (a, b) in enumerate(zip(dev, gold)):
                bad = int((np.asarray(a) != np.asarray(b)).sum())
                if bad:
                    failures += 1
                    print(f"{name} scan {i} comp {c}: {bad} MISMATCHES")
        print(f"{name}: pallas==xla stores OK")

    failures += validate_planar_tails(jax, jnp)
    failures += validate_transcode(jax, jnp)
    failures += validate_scaled(jax, jnp)
    failures += validate_mesh_pallas(jax, jnp)
    failures += validate_hetero_bits(jax, jnp)
    failures += validate_lossless_stream(jax, jnp)

    # Stream-level: bits(pallas) vs prefix, on device — every wire format.
    data = open(CASES[-1], "rb").read()
    prefix = DeviceStreamDecoder(host_threads=3, interchange="prefix")
    b = prefix.decode_stream([data])[0]
    for wire in ("slots", "words", "words-packed", "delta"):
        os.environ["JPEG_TPU_WIRE"] = wire
        bits = DeviceStreamDecoder(host_threads=3, interchange="bits")
        a = bits.decode_stream([data])[0]
        diff = int(jax.device_get(
            jnp.abs(a.astype(jnp.int16) - b.astype(jnp.int16)).max()))
        print(f"large_image stream bits({wire})==prefix on TPU: "
              f"max diff {diff}")
        failures += diff != 0
    os.environ.pop("JPEG_TPU_WIRE", None)
    bits = DeviceStreamDecoder(host_threads=3, interchange="bits")

    # Batched bits dispatch: merged multi-image chunk sweep + vmapped
    # assembly/reconstruction must equal the per-image path.
    small = "/root/reference/tests/reftest/images/rgb.jpg"
    sdata = open(small, "rb").read()
    grouped = bits.decode_stream([sdata] * 5, batch_size=4)
    single = bits.decode_stream([sdata])[0]
    gbad = 0
    for out in grouped:
        gbad += int(jax.device_get(jnp.sum(out != single)))
    print(f"rgb.jpg x5 batched bits == single: {'OK' if gbad == 0 else f'{gbad} MISMATCHES'}")
    failures += gbad != 0

    # Device-only decode rate (dependency-chained, device-resident inputs —
    # numpy inputs would re-upload through the throttled relay every call
    # and time the link, not the kernel).
    from jpeg_decoder_tpu.entropy.pallas_decode import (_compiled_pallas_decoder,
                                                        combine_packs,
                                                        pack_classes)
    st = staged_scans(CASES[-1])[0]
    packs = pack_classes(st)
    shapes = tuple((p.slot_words, p.s_max, p.slots_t.shape[1] * 1024)
                   for p in packs)
    fn = _compiled_pallas_decoder(st.plan, shapes, len(st.tab_maxcode),
                                  False, st.comp_to_upair)
    combined = jax.device_put(combine_packs(packs))
    tabs = (jax.device_put(st.tab_maxcode), jax.device_put(st.tab_delta),
            jax.device_put(st.tab_values.view(np.int32)))
    jax.block_until_ready(fn(combined, *tabs))  # warm
    acc = None
    t0 = time.perf_counter()
    n = 15
    for _ in range(n):
        outs = fn(combined, *tabs)
        s = outs[0].astype(jnp.int32).sum()
        acc = s if acc is None else acc + s
    int(jax.device_get(acc))
    per = (time.perf_counter() - t0) / n
    print(f"large_image pallas decode+assembly: {per * 1e3:.2f} ms "
          f"({3.43 / per:.0f} Mpix/s, device-resident)")

    # Relay-phase-immune variant: the SAME n iterations inside one jitted
    # fori_loop — a single dispatch RPC, so degraded relay round-trips
    # (observed 4-65 ms each, which poisons the loop above) cannot pollute
    # the number. Two device copies of the inputs alternate by iteration
    # parity so XLA cannot hoist the loop-invariant decode out of the loop.
    ca = combined
    cb = jax.device_put(combine_packs(packs))

    @jax.jit
    def chained(ca, cb, mc, dl, vv):
        def body(i, acc):
            c = jax.tree_util.tree_map(
                lambda a, b: jnp.where(i % 2 == 0, a, b), ca, cb)
            outs = fn(c, mc, dl, vv)
            return acc + outs[0].astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    int(jax.device_get(chained(ca, cb, *tabs)))  # warm (compile)
    t0 = time.perf_counter()
    int(jax.device_get(chained(ca, cb, *tabs)))
    per1 = (time.perf_counter() - t0) / n
    print(f"large_image pallas decode+assembly (1-dispatch fori_loop): "
          f"{per1 * 1e3:.2f} ms ({3.43 / per1:.0f} Mpix/s, device-resident)")

    print("TPU VALIDATION:", "FAIL" if failures else "OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
