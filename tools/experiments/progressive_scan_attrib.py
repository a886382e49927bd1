#!/usr/bin/env python
"""Attribute progressive host-entropy time by scan kind (round-4 verdict
item 5): DC first-pass / AC first-pass / refinement, per scan, on the
PIL-progressive large_image (10 scans). First-pass scans (Ah=0) are
history-free and self-sync-splittable exactly like baseline segments
(entropy.cc spec_walk_span); refinement scans are the analyzed dead end
(each correction bit's position depends on the full store state). This
harness decides whether splitting first-pass scans is worth building.

CPU-only (host entropy). Usage: python tools/experiments/progressive_scan_attrib.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo/tools/experiments")


def main():
    from progressive_ab import make_progressive

    import jpeg_decoder_tpu.decoder as D
    from jpeg_decoder_tpu import Decoder

    data = make_progressive()

    records = []
    real = D.decode_scan_dct

    def spy(cursor, frame, scan, dc, ac, ri, stores):
        t0 = time.perf_counter()
        out = real(cursor, frame, scan, dc, ac, ri, stores)
        records.append((scan.spectral_selection_start,
                        scan.spectral_selection_end,
                        scan.successive_approximation_high,
                        scan.successive_approximation_low,
                        tuple(scan.component_indices),
                        time.perf_counter() - t0))
        return out

    D.decode_scan_dct = spy
    try:
        best = None
        for _ in range(5):
            records.clear()
            t0 = time.perf_counter()
            d = Decoder(data, backend="numpy")
            d._decode_entropy_only()
            total = time.perf_counter() - t0
            if best is None or total < best[0]:
                best = (total, list(records))
    finally:
        D.decode_scan_dct = real

    total, recs = best
    kinds = {}
    print(f"{'scan':>4} {'kind':<14} {'ss..se':>7} {'Ah/Al':>5} "
          f"{'comps':<8} {'ms':>7}")
    for i, (ss, se, ah, al, comps, dt) in enumerate(recs):
        kind = ("DC first" if ss == 0 and ah == 0 else
                "DC refine" if ss == 0 else
                "AC first" if ah == 0 else "AC refine")
        kinds[kind] = kinds.get(kind, 0.0) + dt
        print(f"{i:>4} {kind:<14} {ss:>3}..{se:<3} {ah}/{al:<3} "
              f"{str(list(comps)):<8} {dt * 1e3:7.2f}")
    print(f"\nentropy total: {total * 1e3:.1f} ms; by kind:")
    for kind, dt in sorted(kinds.items(), key=lambda kv: -kv[1]):
        print(f"  {kind:<12} {dt * 1e3:7.2f} ms ({dt / total * 100:4.1f}%)")
    fp = kinds.get("DC first", 0.0) + kinds.get("AC first", 0.0)
    print(f"\nfirst-pass (history-free, spec-splittable) total: "
          f"{fp * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
