"""Vectorized variable-width bit packing/unpacking (numpy).

The writer takes parallel arrays (field values as uint64, field widths in
bits) and emits a packed byte buffer; encoding is O(total bits) with numpy,
no per-field Python loop. The reader is a sequential bit cursor (decode is
off the hot path — it runs only in round-trip verification and tier
rebuilds)."""

from __future__ import annotations

import numpy as np


def pack_fields(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack ``values[i]`` (low ``nbits[i]`` bits, MSB-first) contiguously."""
    values = values.astype(np.uint64)
    nbits = nbits.astype(np.int64)
    if len(values) == 0:
        return b""
    maxb = int(nbits.max())
    # bit matrix: row i holds the nbits[i] MSB-first bits of values[i]
    shifts = (nbits[:, None] - 1 - np.arange(maxb)[None, :]).astype(np.int64)
    valid = shifts >= 0
    shifts_c = np.where(valid, shifts, 0).astype(np.uint64)
    bits = ((values[:, None] >> shifts_c) & np.uint64(1)).astype(np.uint8)
    flat = bits[valid]  # row-major: fields concatenated in order
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(flat).tobytes()


class BitReader:
    """Sequential MSB-first bit cursor over a packed buffer."""

    __slots__ = ("bits", "pos")

    def __init__(self, buf: bytes):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        out = 0
        bits = self.bits
        p = self.pos
        for i in range(n):
            out = (out << 1) | int(bits[p + i])
        self.pos = p + n
        return out

    def remaining(self) -> int:
        return len(self.bits) - self.pos
