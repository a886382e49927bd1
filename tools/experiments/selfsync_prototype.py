#!/usr/bin/env python
"""Prototype: self-synchronizing parallel Huffman decode (round-2 phase A/B).

Validates the core claim of docs/device_entropy_design.md on real JPEG Huffman
tables: a bitstream chopped into fixed W-bit chunks can be entry-aligned in
parallel, because each chunk's "entry offset -> exit offset" behavior is a
small transfer function (codeword+magnitude length is bounded by B bits, so
the entry domain per chunk is [0, B)) and transfer functions compose
associatively — alignment for every chunk falls out of one parallel prefix
scan instead of a sequential decode.

Pipeline proven here (numpy, exhaustive checks):
  1. encode random baseline blocks with the OpenDML K.3 tables (tiny encoder);
  2. per chunk, brute-force the transfer table f_c: entry in [0,B) ->
     exit in [0,B) of the next chunk (phase A analog — embarrassingly
     parallel);
  3. associative scan composes f_0..f_{c-1} to recover every chunk's true
     entry offset (phase B — the 26-element-domain monoid);
  4. compare against ground-truth chunk-crossing offsets from a sequential
     decode. Must match exactly for every chunk.

Usage: python tools/experiments/selfsync_prototype.py [blocks] [chunk_bits]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from jpeg_decoder_tpu.huffman import (HuffmanTable, _MJPEG_AC_LUMA_BITS,
                                      _MJPEG_AC_LUMA_VALUES,
                                      _MJPEG_DC_LUMA_BITS,
                                      _MJPEG_DC_LUMA_VALUES)

# Max bits consumed by one decode step: 16-bit code + 15 magnitude bits.
B = 32  # entry-offset domain bound (covers one full symbol of slack)


class BitWriter:
    def __init__(self):
        self.bits: list = []

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)


def build_encoder(bits, values):
    """value -> (code, size) from a DHT spec (Annex C, forward direction)."""
    sizes = []
    for i, count in enumerate(bits):
        sizes.extend([i + 1] * count)
    codes = {}
    code = 0
    prev = sizes[0]
    for v, s in zip(values, sizes):
        while prev < s:
            code <<= 1
            prev += 1
        codes[v] = (code, s)
        code += 1
    return codes


def encode_blocks(rng, n_blocks):
    """Encode random sparse baseline blocks (DC diff + AC RLE) to a bit list."""
    dc_codes = build_encoder(_MJPEG_DC_LUMA_BITS, _MJPEG_DC_LUMA_VALUES)
    ac_codes = build_encoder(_MJPEG_AC_LUMA_BITS, _MJPEG_AC_LUMA_VALUES)
    w = BitWriter()
    for _ in range(n_blocks):
        # DC
        diff = int(rng.integers(-255, 256))
        cat = diff.bit_length() if diff != 0 else 0
        code, size = dc_codes[cat]
        w.put(code, size)
        if cat:
            v = diff if diff > 0 else diff + (1 << cat) - 1
            w.put(v, cat)
        # a few AC runs then EOB
        pos = 0
        for _ in range(int(rng.integers(0, 6))):
            run = int(rng.integers(0, 6))
            if pos + run + 1 > 63:
                break
            pos += run + 1
            val = int(rng.integers(1, 64)) * (1 if rng.random() < 0.5 else -1)
            mag = abs(val).bit_length()
            sym = (run << 4) | mag
            if sym not in ac_codes:
                continue
            code, size = ac_codes[sym]
            w.put(code, size)
            v = val if val > 0 else val + (1 << mag) - 1
            w.put(v, mag)
        if pos < 63:
            code, size = ac_codes[0x00]  # EOB
            w.put(code, size)
    return np.asarray(w.bits, dtype=np.uint8)


def make_decoder_step(dc_table, ac_table):
    """One decode step at bit position p: returns bits consumed (code+magnitude),
    treating the stream as a flat sequence of symbols (alignment semantics only
    — value reconstruction is phase C, not needed to prove alignment)."""
    def decode_len(bits, p, table):
        # canonical maxcode/delta walk on up to 16 bits
        window = 0
        for i in range(16):
            window = (window << 1) | (int(bits[p + i]) if p + i < len(bits) else 0)
            if table.maxcode[i] >= 0 and window <= int(table.maxcode[i]):
                idx = window + int(table.delta[i])
                if idx < 0 or idx >= len(table.values):
                    # Only reachable from garbage (misaligned) windows.
                    raise ValueError("bad code")
                return i + 1, int(table.values[idx])
        raise ValueError("bad code")
    return decode_len


def main(n_blocks=400, chunk_bits=512, seed=0):
    rng = np.random.default_rng(seed)
    bits = encode_blocks(rng, n_blocks)
    dc = HuffmanTable.build(_MJPEG_DC_LUMA_BITS, _MJPEG_DC_LUMA_VALUES, is_ac=False)
    ac = HuffmanTable.build(_MJPEG_AC_LUMA_BITS, _MJPEG_AC_LUMA_VALUES, is_ac=True)
    decode_len = make_decoder_step(dc, ac)

    # The alignment automaton ignores DC/AC context by treating every symbol
    # as "try DC, else AC" — for THIS experiment we instead track the true
    # (in_block_pos) context alongside, proving context also re-synchronizes.
    def step(p, ctx):
        # ctx: position in block 0..63 (0 => next symbol is DC)
        table = dc if ctx == 0 else ac
        n, value = decode_len(bits, p, table)
        if ctx == 0:
            mag = value
            return p + n + mag, 1
        run, mag = value >> 4, value & 0x0F
        if mag == 0:
            if run == 15:
                return p + n, min(ctx + 16, 63) if ctx + 16 < 64 else 0
            return p + n, 0  # EOB
        nxt = ctx + run + 1
        return p + n + mag, 0 if nxt >= 64 else nxt

    # Ground truth: sequential decode, record (bit offset, ctx) at each chunk
    # boundary crossing.
    total = len(bits)
    n_chunks = (total + chunk_bits - 1) // chunk_bits
    truth = {}
    p, ctx = 0, 0
    while p < total:
        c = p // chunk_bits
        if c not in truth:
            truth[c] = (p - c * chunk_bits, ctx)
        try:
            p, ctx = step(p, ctx)
        except ValueError:
            break

    # Phase A: per chunk, transfer table over (entry_offset in [0,B),
    # entry_ctx in {0..63}) -> (exit_offset, exit_ctx) of the NEXT chunk.
    # Self-synchronization makes most entries converge, so the table is
    # highly degenerate in practice; we store it densely here.
    CTXS = 64
    f_off = np.zeros((n_chunks, B, CTXS), np.int32)
    f_ctx = np.zeros((n_chunks, B, CTXS), np.int32)
    for c in range(n_chunks):
        base = c * chunk_bits
        for o in range(B):
            for x in range(CTXS):
                p2, ctx2 = base + o, x
                ok = True
                while p2 < base + chunk_bits:
                    try:
                        p2, ctx2 = step(p2, ctx2)
                    except ValueError:
                        ok = False
                        break
                f_off[c, o, x] = (p2 - (base + chunk_bits)) if ok else -1
                f_ctx[c, o, x] = ctx2 if ok else -1

    # Phase B: sequential compose here (the monoid structure is what matters;
    # on device this becomes jax.lax.associative_scan over the (off, ctx)
    # transfer arrays).
    o, x = truth[0]
    mismatches = 0
    for c in range(n_chunks - 1):
        if o >= B:
            print(f"chunk {c}: entry offset {o} exceeds domain B={B} "
                  f"(symbol longer than slack) — would need wider B")
            return 1
        no, nx = int(f_off[c, o, x]), int(f_ctx[c, o, x])
        if no < 0:
            print(f"chunk {c}: decode error in transfer table")
            return 1
        want = truth.get(c + 1)
        if want != (no, nx):
            mismatches += 1
            print(f"chunk {c+1}: resolved ({no},{nx}) truth {want}")
        o, x = no, nx

    print(f"self-sync prototype: {n_chunks} chunks of {chunk_bits} bits, "
          f"{n_blocks} blocks, {total} bits; "
          f"alignment mismatches: {mismatches}")

    # Convergence statistic: how degenerate are the transfer functions?
    # (number of distinct outputs per chunk across all 32*64 entries)
    distinct = [len({(int(f_off[c, o, x]), int(f_ctx[c, o, x]))
                     for o in range(B) for x in range(CTXS)})
                for c in range(min(n_chunks, 32))]
    print(f"distinct exit states per chunk (first 32): "
          f"mean {np.mean(distinct):.1f} of {B * CTXS} possible entries")
    return 0 if mismatches == 0 else 1


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    sys.exit(main(n, w))
