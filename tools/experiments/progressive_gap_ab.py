#!/usr/bin/env python
"""Progressive device-class gap A/B (round-4 verdict item 4 -> round 5).

tower_progressive's device-resident rate trailed tower's by ~18% on
identical pixels (BENCH_r04). Round-5 attribution (CPU class dump): the
transcoder anchored every ~160 symbols, bucketing chunks to s_max 224 and
spilling 233 chunks into the 256-byte slot class — the kernel's per-class
fori_loop runs s_max steps, so the transcoded stream simply ran more
steps. S_TARGET_TC now defaults to 96 (same anchoring as the prescan);
this harness measures the full device-resident pipeline for tower vs
tower_progressive at both targets on hardware.
"""

import os
import sys

sys.path.insert(0, "/root/repo")


def rate(path, **kw):
    from jpeg_decoder_tpu.models.stream import DeviceStreamDecoder
    dec = DeviceStreamDecoder(host_threads=2, interchange="bits")
    return dec.device_resident_rate(open(path, "rb").read(), **kw)


def main():
    import jax
    assert jax.default_backend() == "tpu", jax.default_backend()
    tower = "/root/reference/benches/tower.jpg"
    prog = "/root/reference/benches/tower_progressive.jpg"

    base = rate(tower)
    print(f"tower                 : {base}", flush=True)
    for target in ("96", "160"):
        os.environ["JPEG_TPU_TRANSCODE_STARGET"] = target
        # S_TARGET_TC is read at import; reload the module constant.
        import importlib

        from jpeg_decoder_tpu.entropy import transcode
        importlib.reload(transcode)
        r = rate(prog)
        gap = r["ms_per_image"] / base["ms_per_image"] - 1
        print(f"progressive @ S={target:>3}: {r}  (+{gap * 100:.1f}% vs tower)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
