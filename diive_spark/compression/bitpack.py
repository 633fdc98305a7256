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
    values = np.asarray(values, dtype=np.uint64)  # no copy when already u64
    nbits = np.asarray(nbits, dtype=np.int64)
    if len(values) == 0:
        return b""
    # scatter per DISTINCT width: work is proportional to the bits actually
    # written (the previous n x max-width bit matrix wrote ~18x more cells
    # for Gorilla streams, whose fields are mostly 1-bit controls)
    offsets = np.empty(len(nbits), dtype=np.int64)
    offsets[0] = 0
    np.cumsum(nbits[:-1], out=offsets[1:])
    total = int(offsets[-1] + nbits[-1])
    flat = np.zeros(total, dtype=np.uint8)
    for w in np.unique(nbits):
        w = int(w)
        if w == 0:
            continue
        rows = nbits == w
        sh = np.arange(w - 1, -1, -1, dtype=np.uint64)
        bits = ((values[rows][:, None] >> sh[None, :]) & np.uint64(1)).astype(
            np.uint8
        )
        pos = offsets[rows][:, None] + np.arange(w)[None, :]
        flat[pos.ravel()] = bits.ravel()
    pad = (-total) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(flat).tobytes()


class BitReader:
    """Sequential MSB-first bit cursor over a packed buffer.

    ``read`` slices the (at most 9-byte) window containing the requested
    bits and decodes it with int ops — O(1) per call regardless of n≤64.
    The previous per-bit numpy-indexing loop cost ~13 µs per decoded
    Gorilla value; this is ~4x faster and is the hot path of tier reads."""

    __slots__ = ("buf", "nbits", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.nbits = len(buf) * 8
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        if n == 0:
            return 0
        end_bit = p + n
        byte0 = p >> 3
        byte1 = (end_bit + 7) >> 3
        window = int.from_bytes(self.buf[byte0:byte1], "big")
        drop = (byte1 << 3) - end_bit
        return (window >> drop) & ((1 << n) - 1)

    def remaining(self) -> int:
        return self.nbits - self.pos
