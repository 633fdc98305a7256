"""Gorilla XOR float compression (lossless, bit-exact round trip).

Scheme from the public Gorilla paper (Pelkonen et al., VLDB 2015, §4.1.2):
  * first value: 64 raw bits;
  * each next value XORed with its predecessor:
      - XOR == 0            -> control bit '0'
      - fits predecessor's  -> '10' + meaningful bits in the previous
        leading/length window
      - else                -> '11' + 5b leading-zero count + 6b meaningful
        length + meaningful bits.
Not in the diive reference at all (BASELINE.json north_rule addition); NaNs
round-trip bit-exactly because everything operates on the raw float64 bit
pattern (``view('uint64')``).

Encoding is numpy-vectorized: XORs, leading/trailing-zero counts and the
window-fit decision are computed array-wise, then emitted through
:func:`diive_spark.compression.bitpack.pack_fields`. The control decision
for "fits previous window" depends on the previous emitted window, which is
inherently sequential — that single scalar recurrence runs over a compact
numpy loop (cheap relative to Arrow transfer; measured in bench).
"""

from __future__ import annotations

import numpy as np

from diive_spark.compression.bitpack import BitReader, pack_fields


def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 array (64 for zero)."""
    # float64 trick is unsafe near 2^53; use bit_length via log-free method:
    out = np.full(x.shape, 64, dtype=np.int64)
    v = x.copy()
    shift = np.int64(32)
    n = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        mask = v >> np.uint64(s) != 0
        n = np.where(mask, n + s, n)
        v = np.where(mask, v >> np.uint64(s), v)
    # n = floor(log2(x)) for x>0
    nz = x != 0
    out[nz] = 63 - n[nz]
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 array (64 for zero)."""
    lsb = x & (~x + np.uint64(1))
    return np.where(x == 0, 64, 63 - _clz64(lsb))


def encode_floats(values: np.ndarray) -> bytes:
    """Compress a float64 array; returns packed bytes. Empty -> b''."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    if n == 0:
        return b""
    xor = np.concatenate([v[:1], v[1:] ^ v[:-1]])
    lead = np.minimum(_clz64(xor), 31)  # 5-bit field
    trail = _ctz64(xor)
    mlen = 64 - lead - trail  # meaningful bits (xor != 0)

    # hoist numpy->int conversions out of the loop (np scalar indexing is
    # ~10x a list index; the loop is the encode hot path)
    xor_l = xor.tolist()
    lead_l = lead.tolist()
    mlen_l = mlen.tolist()

    fields_v: list[int] = [int(v[0])]
    fields_b: list[int] = [64]
    prev_lead, prev_mlen = -1, -1  # no reusable window initially
    for i in range(1, n):
        x = xor_l[i]
        if x == 0:
            fields_v.append(0)
            fields_b.append(1)
            continue
        li, mi = lead_l[i], mlen_l[i]
        if (
            prev_lead >= 0
            and li >= prev_lead
            and (64 - li - mi) >= (64 - prev_lead - prev_mlen)
        ):
            # '10' + meaningful bits inside the previous window
            # (two fields: control alone, then payload — a single field
            # could exceed 64 bits when prev_mlen == 64)
            meaningful = x >> (64 - prev_lead - prev_mlen)
            fields_v.extend([0b10, meaningful])
            fields_b.extend([2, prev_mlen])
        else:
            # '11' + 5b lead + 6b (mlen-1, covering 1..64) + payload
            meaningful = x >> (64 - li - mi)
            header = ((0b11 << 5) | li) << 6 | (mi - 1)
            fields_v.extend([header, meaningful])
            fields_b.extend([2 + 5 + 6, mi])
            prev_lead, prev_mlen = li, mi
    return pack_fields(
        np.array(fields_v, dtype=np.uint64), np.array(fields_b, dtype=np.int64)
    )


def decode_floats(buf: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`encode_floats`; ``n`` = number of points."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = BitReader(buf)
    prev = r.read(64)
    out[0] = prev
    lead, mlen = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            meaningful = r.read(mlen)
            x = meaningful << (64 - lead - mlen)
        else:  # '11' new window
            lead = r.read(5)
            mlen = r.read(6) + 1
            meaningful = r.read(mlen)
            x = meaningful << (64 - lead - mlen)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)
