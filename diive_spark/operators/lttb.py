"""Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013).

The visualization-grade downsampler: reduce each series to ``n_out``
points while preserving visual shape (extremes survive; a mean-based
resample flattens them).  diive downsamples by aggregation only
(`resample`); a rollup/downsample engine serving dashboards over 10^12
points needs the shape-preserving variant at the last mile.

Scale shape: one grouped Arrow kernel per key (`applyInPandas` via
``kernel_partition`` — width pinned against AQE byte-coalescing).

Why there is deliberately NO halo-chunked variant (round-4 audit, same
verdict as Holt-Winters): LTTB's recurrence is unbounded — the anchor of
every triangle is the PREVIOUS selected point, which transitively
depends on every pick back to the first bucket, so no finite halo makes
a chunked run bit-equal to the whole-series run (operators/chunking.py's
pattern requires a bounded dependency radius, like Hampel's window).
The honest monster-series story is upstream: downsample input is
normally a tier rollup (1m/1h), already orders of magnitude smaller than
raw — a 10⁹-point single key should be pre-aggregated by the tier
cascade first, after which one series fits one task by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.session import kernel_partition

__all__ = ["lttb_kernel", "lttb_downsample"]


def lttb_kernel(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points (sorted x assumed).  Returns
    all indices when the series already fits in ``n_out``."""
    n = len(x)
    if n_out >= n:
        return np.arange(n)
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first + last + 1 bucket)")
    # bucket boundaries over the interior points (first/last are pinned)
    bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    idxs = [0]
    a = 0
    for b in range(n_out - 2):
        lo, hi = bounds[b], bounds[b + 1]
        nlo, nhi = bounds[b + 1], (bounds[b + 2] if b + 2 < n_out - 1 else n)
        # average of the NEXT bucket (last bucket's "next" is the final pt)
        ax_, ay_ = x[a], y[a]
        nx = x[nlo:nhi].mean() if nhi > nlo else x[n - 1]
        ny = y[nlo:nhi].mean() if nhi > nlo else y[n - 1]
        sx, sy = x[lo:hi], y[lo:hi]
        area = np.abs(
            (ax_ - nx) * (sy - ay_) - (ax_ - sx) * (ny - ay_)
        )
        a = lo + int(np.argmax(area))
        idxs.append(a)
    idxs.append(n - 1)
    return np.asarray(idxs, dtype=np.int64)


def lttb_downsample(
    df: DataFrame,
    key_col: str = "key",
    x_col: str = "ts_s",
    y_col: str = "value",
    n_out: int = 100,
) -> DataFrame:
    """Per-key LTTB: (key, x, y) in, at most ``n_out`` rows per key out,
    original x/y values preserved (LTTB selects, never interpolates)."""
    schema = f"{key_col} long, {x_col} long, {y_col} double"

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col, kind="mergesort")
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        idx = lttb_kernel(x, y, n_out)
        return pdf.iloc[idx][[key_col, x_col, y_col]]

    return (
        kernel_partition(
            df.select(
                F.col(key_col).cast("long").alias(key_col),
                F.col(x_col).cast("long").alias(x_col),
                F.col(y_col).cast("double").alias(y_col),
            ),
            key_col,
        )
        .groupBy(key_col)
        .applyInPandas(apply, schema)
    )
