"""Delta-of-delta timestamp compression (Gorilla paper §4.1.1).

Timestamps are int64 epoch-microseconds per series block, sorted ascending.
  * header: first timestamp, 64 raw bits; first delta, 64 raw bits
    (the paper uses a 14-bit aligned first delta for fixed 2h blocks; the
    engine's blocks are arbitrary so the header is kept wide — amortized
    over the block);
  * each next point stores D = (t_n - t_{n-1}) - (t_{n-1} - t_{n-2}):
      D == 0            -> '0'
      [-63, 64]         -> '10'  + 7 bits (zigzag offset)
      [-255, 256]       -> '110' + 9 bits
      [-2047, 2048]     -> '1110'+ 12 bits
      else              -> '1111'+ 64 bits raw
On a perfectly regular grid every point after the second costs 1 bit.
"""

from __future__ import annotations

import numpy as np

from diive_spark.compression.bitpack import BitReader, pack_fields

_RANGES = (
    (64, 7, 0b10, 2),
    (256, 9, 0b110, 3),
    (2048, 12, 0b1110, 4),
)


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    t = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = len(t)
    if n == 0:
        return b""
    fields_v: list[int] = [int(np.uint64(t[0]))]
    fields_b: list[int] = [64]
    if n == 1:
        return pack_fields(
            np.array(fields_v, dtype=np.uint64), np.array(fields_b, dtype=np.int64)
        )
    delta = np.diff(t)
    fields_v.append(int(np.uint64(delta[0])))
    fields_b.append(64)
    dod = np.diff(delta)
    for d in dod.tolist():
        if d == 0:
            fields_v.append(0)
            fields_b.append(1)
            continue
        for lim, bits, ctrl, ctrl_bits in _RANGES:
            if -lim + 1 <= d <= lim:
                # store d + (lim - 1) as unsigned in `bits` bits
                fields_v.extend([ctrl, d + lim - 1])
                fields_b.extend([ctrl_bits, bits])
                break
        else:
            fields_v.extend([0b1111, int(np.uint64(np.int64(d)))])
            fields_b.extend([4, 64])
    return pack_fields(
        np.array(fields_v, dtype=np.uint64), np.array(fields_b, dtype=np.int64)
    )


def decode_timestamps(buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = BitReader(buf)
    out[0] = np.int64(np.uint64(r.read(64)))
    if n == 1:
        return out
    delta = np.int64(np.uint64(r.read(64)))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            d = 0
        elif r.read(1) == 0:
            d = r.read(7) - 63
        elif r.read(1) == 0:
            d = r.read(9) - 255
        elif r.read(1) == 0:
            d = r.read(12) - 2047
        else:
            d = int(np.int64(np.uint64(r.read(64))))
        delta = delta + d
        out[i] = out[i - 1] + delta
    return out
