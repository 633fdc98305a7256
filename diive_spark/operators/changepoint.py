"""Multi-changepoint detection by binary segmentation (Scott & Knott
1974; the standard first tool before PELT), per series.

Extends the single-shift CUSUM operator (operators/seasonal.py): binseg
finds the split maximizing the SSE reduction

    gain(t) = n_l·n_r/n · (mean_l − mean_r)²
            = (c_t·n − t·T)² / (n·t·(n−t))      (prefix-sum form)

then recurses into both halves with a FIXED structure (root, left child,
right child, ...), which keeps the search deterministic and lets a SQL
oracle unroll it exactly.

Engine-exactness: on integer-valued inputs (the house centivalue
pre-scaling) the numerator (c_t·n − t·T)² is EXACT int64 (|c_t·n| well
under 2³¹·2³¹), so the gain is one correctly-rounded division of exact
integers — bit-identical in numpy and DuckDB, which makes the argmax
(ties broken toward the smallest t) engine-stable with no tolerance.

Scale shape: one grouped Arrow kernel per key (`kernel_partition`) — the
candidate-gain scan is a vectorized prefix-sum pass per segment, O(n)
per split, nothing quadratic; a series too big for one task goes through
a coarser rollup first (tier engine), as with the other per-series
kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.session import kernel_partition

__all__ = ["binseg_kernel", "binseg_changepoints"]


def _best_split(
    v: np.ndarray, lo: int, hi: int, min_size: int
) -> tuple[int, float] | None:
    """(absolute split index, gain) for segment [lo, hi), or None when the
    segment cannot host two min_size halves.  Split index t means the
    right half starts at t."""
    n = hi - lo
    if n < 2 * min_size:
        return None
    seg = v[lo:hi].astype(np.int64)
    c = np.cumsum(seg)
    total = int(c[-1])
    t = np.arange(min_size, n - min_size + 1, dtype=np.int64)
    # ADVICE r3: guard the INPUTS before the int64 products — with huge
    # cumsums c[t-1]*n can wrap in int64 first, and a wrapped value can
    # slip under the |num| bound below.  Python ints are exact, so check
    # max|c|·n (an upper bound on both products) against 2^62 up front.
    if int(np.abs(c).max(initial=0)) * n >= 2**62:
        raise ValueError(
            "binseg gain numerator products would overflow int64 — "
            "rescale values (coarser centi-units) or shorten the series"
        )
    num = c[t - 1] * np.int64(n) - t * np.int64(total)
    # num² must stay exact in int64 (numpy would wrap SILENTLY; the SQL
    # twin would error loudly) — |num| ≤ 2·|c|·n, so guard the bound
    if np.abs(num).max(initial=0) >= 3_000_000_000:
        raise ValueError(
            "binseg gain numerator would overflow int64 — rescale values "
            "(coarser centi-units) or shorten the series"
        )
    gain = (num * num).astype(np.float64) / (
        np.int64(n) * t * (np.int64(n) - t)
    ).astype(np.float64)
    j = int(np.argmax(gain))  # first occurrence == smallest t
    return lo + int(t[j]), float(gain[j])


def binseg_kernel(
    v: np.ndarray, depth: int = 2, min_size: int = 5
) -> list[tuple[int, int, float]]:
    """Fixed-structure binary segmentation: (node_id, split_idx, gain)
    rows; node 1 = whole series, node 2k/2k+1 = left/right child of node
    k (heap numbering).  A node is absent when its segment is too short."""
    out: list[tuple[int, int, float]] = []
    segments = {1: (0, len(v))}
    max_node = 2 ** depth - 1
    for node in range(1, max_node + 1):
        if node not in segments:
            continue
        lo, hi = segments[node]
        r = _best_split(v, lo, hi, min_size)
        if r is None:
            continue
        cp, gain = r
        out.append((node, cp, gain))
        if 2 * node <= max_node:
            segments[2 * node] = (lo, cp)
            segments[2 * node + 1] = (cp, hi)
    return out


def binseg_changepoints(
    df: DataFrame,
    key_col: str = "key",
    ts_s_col: str = "ts_s",
    value_col: str = "value",
    depth: int = 2,
    min_size: int = 5,
) -> DataFrame:
    """Per-key binseg over (key, ts, value): one row per found split with
    the heap node id, the timestamp the right segment starts at, and the
    SSE-reduction gain."""
    schema = (
        f"{key_col} long, node long, cp_idx long, cp_t long, gain double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_s_col, kind="mergesort")
        v = pdf[value_col].to_numpy(dtype=np.int64)
        t = pdf[ts_s_col].to_numpy(dtype=np.int64)
        rows = binseg_kernel(v, depth=depth, min_size=min_size)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[0],
                "node": [r[0] for r in rows],
                "cp_idx": [r[1] for r in rows],
                "cp_t": [int(t[r[1]]) for r in rows],
                "gain": [r[2] for r in rows],
            }
        )

    return (
        kernel_partition(
            df.select(
                F.col(key_col).cast("long").alias(key_col),
                F.col(ts_s_col).cast("long").alias(ts_s_col),
                F.col(value_col).cast("long").alias(value_col),
            ),
            key_col,
        )
        .groupBy(key_col)
        .applyInPandas(apply, schema)
    )
