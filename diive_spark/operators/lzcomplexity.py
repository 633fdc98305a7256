"""Lempel-Ziv (LZ76) sequence complexity, per series.

Kaspar & Schuster (Phys Rev A 36, 1987) production-counting form of
the Lempel-Ziv 1976 complexity: the number of phrases in the
exhaustive history of a symbol sequence, normalized by n / log2(n)
(the asymptotic count for an i.i.d. equiprobable binary source), so
c_norm ~ 1 for noise and << 1 for regular/periodic series.  The
series is binarized at its own median (above/below) — the standard
coarse-graining for LZ on continuous data.

diive counterpart: none — diive's regularity toolbox stops at
spectral/ACF diagnostics; LZ complexity is the compression-side twin
of sample_entropy (both detect determinism, one by matching templates,
one by parsing novel phrases).

Scale shape: one grouped Arrow kernel per key (`kernel_partition`);
the parse is O(n^2) worst case on the BOUNDED per-key hourly grid
(calendar-sized, not data-sized), with O(n) state.

Not SQL-expressible: the LZ phrase parse is an inherently sequential
scan with data-dependent jumps — no prefix-sum/window decomposition —
so this ships as a rows-only kernel pinned by tests/test_lz76.py
against an independent brute-force substring oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["lz76_phrase_count", "lz76_complexity"]


def lz76_phrase_count(bits: np.ndarray) -> int:
    """Kaspar-Schuster production count of a 0/1 sequence."""
    s = np.asarray(bits, dtype=np.int8)
    n = len(s)
    if n == 0:
        return 0
    if n == 1:
        return 1
    c = 1
    l = 1
    i = 0
    k = 1
    k_max = 1
    while True:
        if s[i + k - 1] == s[l + k - 1]:
            k += 1
            if l + k > n:
                c += 1
                break
        else:
            if k > k_max:
                k_max = k
            i += 1
            if i == l:
                c += 1
                l += k_max
                if l + 1 > n:
                    break
                i = 0
                k = 1
                k_max = 1
            else:
                k = 1
    return c


def lz76_complexity(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_s: int,
    key_type: str = "string",
    fill: float = 0.0,
) -> DataFrame:
    """Per key: LZ76 phrase count and normalized complexity of the
    median-binarized gridded series.  ``ts_col`` holds epoch seconds;
    the kernel regrids onto the ``step_s`` lattice (missing -> fill)."""
    schema = (
        f"{key_col} {key_type}, n long, ones long, phrases long, "
        "c_norm double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        from diive_spark.operators.matrixprofile import regrid

        pdf = pdf.sort_values(ts_col).dropna(subset=[value_col])
        y = pdf[value_col].to_numpy(dtype=np.float64)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        if len(y):
            _, y = regrid(ts, y, int(step_s), fill)
        n = len(y)
        if n < 4:
            return pd.DataFrame(
                {
                    key_col: [pdf[key_col].iloc[0]],
                    "n": [n],
                    "ones": [0],
                    "phrases": [0],
                    "c_norm": [float("nan")],
                }
            )
        bits = (y > np.median(y)).astype(np.int8)
        c = lz76_phrase_count(bits)
        c_norm = c * np.log2(n) / n
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [n],
                "ones": [int(bits.sum())],
                "phrases": [c],
                "c_norm": [float(c_norm)],
            }
        )

    return (
        kernel_partition(df.select(key_col, ts_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
