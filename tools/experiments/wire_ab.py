#!/usr/bin/env python
"""A/B the bits-interchange wire format on real TPU hardware:

  slots: host-packed slot tiles (~1.5-1.7x the compressed stream on the wire)
  words: compressed words shipped once + 12 B/chunk; slot tiles materialised
         on device by a row gather + constant shift (build_pallas_decoder
         device_slots=True).
  words-packed: 8 B/chunk compact metadata.
  delta: 4 B/chunk (round 4) — anchor-bit delta | budget | slot0 in one u32,
         everything else rebuilt on device (pack_delta/unpack_delta_classes).

Reports per-path wire bytes/pixel, device-decode parity (on-device compare,
D2H scalars only), and the sustained (post-burst) stream rate through the
relay's throttled link — the metric the words wire exists to move.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np

IMG = "/root/reference/benches/large_image.jpg"


def fresh_decoder(wire):
    os.environ["JPEG_TPU_WIRE"] = wire
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder
    return DeviceStreamDecoder(host_threads=3, interchange="bits")


def wire_bytes(data, wire):
    os.environ["JPEG_TPU_WIRE"] = wire
    from jpeg_decoder_tpu.models.stream import stage_host_bits
    st = stage_host_bits(data)
    if not getattr(st, "pallas", None):
        sys.exit(f"stream is Pallas-ineligible under wire={wire} "
                 "(progressive/lossless/quirk, or the Pallas gate is off)")
    total = 0
    for entry in st.pallas:
        if entry is None:
            sys.exit(f"scan is Pallas-ineligible under wire={wire}")
        combined = entry[0]
        total += sum(a.nbytes for a in combined)
    return total


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    data = open(IMG, "rb").read()

    from jpeg_decoder_tpu import Decoder
    probe = Decoder(data)
    probe.read_info()
    info = probe.info()
    px = info.width * info.height
    mpix = px / 1e6
    print(f"large_image: {len(data)} B source ({len(data) / px:.3f} B/px), "
          f"{mpix:.2f} Mpix")

    WIRES = ("slots", "words", "words-packed", "delta")
    for wire in WIRES:
        wb = wire_bytes(data, wire)
        print(f"wire={wire}: H2D {wb} B = {wb / px:.3f} B/px")

    # Parity: decode through both wires, compare ON DEVICE.
    outs = {}
    for wire in WIRES:
        dec = fresh_decoder(wire)
        t0 = time.perf_counter()
        outs[wire] = dec.decode_stream([data])[0]
        outs[wire].block_until_ready()
        print(f"wire={wire}: first decode (incl compile) "
              f"{time.perf_counter() - t0:.1f}s")
    for wire in WIRES[1:]:
        same = bool(jnp.array_equal(outs["slots"], outs[wire]))
        print(f"parity slots == {wire}:", same)
        if not same:
            diff = int(jnp.abs(outs["slots"].astype(jnp.int32)
                               - outs[wire].astype(jnp.int32)).max())
            print("MAX DIFF:", diff)
            sys.exit(1)
    del outs

    from bench import _deadline, _measure_sustained
    order = ["delta", "words-packed", "slots"]
    if "--reverse" in sys.argv:
        order.reverse()
    results = {}
    for wire in order:
        dec = fresh_decoder(wire)
        dec.decode_stream([data] * 2)  # warm pools
        with _deadline(300):
            results[wire] = _measure_sustained(dec, data, mpix, budget_s=20.0)
        print(f"sustained {wire}: {results.get(wire, 0.0):.1f} Mpix/s")
    if results.get("slots"):
        print(f"delta vs slots: {results['delta'] / results['slots']:.2f}x; "
              f"delta vs words-packed: "
              f"{results['delta'] / results['words-packed']:.2f}x")


if __name__ == "__main__":
    main()
