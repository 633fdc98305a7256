"""Matrix profile (STOMP) — motif + discord discovery per series.

Public algorithm: Zhu et al., "Matrix Profile II: Exploiting a Novel
Algorithm and GPUs to Break the One Hundred Million Barrier for Time
Series Motifs and Joins" (ICDM 2016).  The matrix profile of a series is,
for every length-``m`` subsequence, the z-normalized euclidean distance
to its nearest non-trivial neighbour; its minimum marks the top motif
pair and its maximum the top discord (anomaly).  diive has no
counterpart (its outlier tier is point-wise: zScore / Hampel /
LocalSD, diive/pkgs/outlierdetection) — the matrix profile is the
subsequence-shaped complement a monitoring engine needs.

STOMP computes all n-m+1 distance profiles in O(n^2) total by updating
the sliding dot products QT incrementally (one O(n) vector op per row)
instead of O(n log n) FFTs per row.

Scale shape: one grouped Arrow kernel per key (`applyInPandas` via
``kernel_partition``).  O(n^2) per key is the algorithm's intrinsic cost
— the published scale path (SCAMP/GPU tiling) shards the QT matrix into
tiles; here the honest posture is the same as LTTB's: series at raw
resolution should first pass the tier cascade (1m/1h rollups), after
which n per key is bounded by retention and one series fits one task.
Trivial-match exclusion zone: |i - j| <= m // 2 (the standard setting).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["matrix_profile_kernel", "matrix_profile"]


def matrix_profile_kernel(
    y: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray]:
    """(profile, profile_index) for one series.

    profile[i] = min z-normalized euclidean distance from subsequence
    i..i+m to any subsequence j..j+m with |i-j| > m//2; profile_index[i]
    is the argmin j.  Constant subsequences (sigma == 0) are handled per
    the MP convention: two constants are distance 0, constant-vs-moving
    is sqrt(m).
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    k = n - m + 1  # number of subsequences
    if k < 2 or m < 3:
        raise ValueError("series too short for window m")
    # rolling mean / std via cumsums (stable enough for test scales;
    # SCAMP uses the same formulation with periodic refresh)
    c = np.concatenate(([0.0], np.cumsum(y)))
    c2 = np.concatenate(([0.0], np.cumsum(y * y)))
    mu = (c[m:] - c[:-m]) / m
    var = (c2[m:] - c2[:-m]) / m - mu * mu
    var = np.maximum(var, 0.0)
    sig = np.sqrt(var)
    const = sig < 1e-13

    excl = m // 2
    prof = np.full(k, np.inf)
    pidx = np.zeros(k, dtype=np.int64)

    # first row: QT[0, j] = dot(y[0:m], y[j:j+m]) via correlate
    qt = np.correlate(y, y[:m], mode="valid")  # length k
    qt_first = qt.copy()  # QT[j, 0] by symmetry == QT[0, j]
    for i in range(k):
        if i > 0:
            # QT[i, j] = QT[i-1, j-1] - y[i-1]*y[j-1] + y[i+m-1]*y[j+m-1]
            qt[1:] = qt[:-1] - y[i - 1] * y[: k - 1] + y[i + m - 1] * y[m:n]
            qt[0] = qt_first[i]
        # z-normalized distance profile
        if const[i]:
            d = np.where(const, 0.0, np.sqrt(m))
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                corr = (qt - m * mu[i] * mu) / (m * sig[i] * sig)
            d = np.sqrt(np.maximum(2.0 * m * (1.0 - corr), 0.0))
            d[const] = np.sqrt(m)
        lo, hi = max(0, i - excl), min(k, i + excl + 1)
        d[lo:hi] = np.inf
        j = int(np.argmin(d))
        prof[i] = d[j]
        pidx[i] = j
    return prof, pidx


def regrid(
    ts_s: np.ndarray, y: np.ndarray, step_s: int, fill: float | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """In-kernel grid reindex (the repo's grid_step pattern — never build
    time grids with sequence/explode+join upstream of a grouped kernel).
    Returns (grid_start_seconds, full gridded values); missing slots get
    ``fill`` (None => series median)."""
    slots = (ts_s // step_s).astype(np.int64)
    lo, hi = int(slots.min()), int(slots.max())
    full = np.full(hi - lo + 1, np.nan)
    full[slots - lo] = y
    if fill is None:
        fill = float(np.nanmedian(y))
    full[np.isnan(full)] = fill
    return np.int64(lo) * step_s, full


def matrix_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    m: int,
    key_type: str = "string",
    grid_step_s: int | None = None,
    fill: float | None = None,
) -> DataFrame:
    """Per-key matrix profile summary: the top discord (max profile) and
    top motif (min profile) subsequence start epoch-seconds + distances.
    ``ts_col`` holds epoch seconds; with ``grid_step_s`` the kernel
    regrids first (missing slots -> ``fill``, default series median)."""
    schema = (
        f"{key_col} {key_type}, discord_s long, discord_d double, "
        f"motif_s long, motif_d double, n long"
    )
    cols = [key_col, "discord_s", "discord_d", "motif_s", "motif_d", "n"]

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).dropna(subset=[value_col])
        y = pdf[value_col].to_numpy(dtype=np.float64)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        if grid_step_s is not None and len(y):
            t0, y = regrid(ts, y, grid_step_s, fill)
            ts = t0 + np.arange(len(y), dtype=np.int64) * grid_step_s
        if len(y) < max(2 * m, m + 2):
            return pd.DataFrame(columns=cols)
        prof, _ = matrix_profile_kernel(y, m)
        fin = np.isfinite(prof)
        if not fin.any():
            return pd.DataFrame(columns=cols)
        di = int(np.argmax(np.where(fin, prof, -np.inf)))
        mi = int(np.argmin(np.where(fin, prof, np.inf)))
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "discord_s": [int(ts[di])],
                "discord_d": [float(prof[di])],
                "motif_s": [int(ts[mi])],
                "motif_d": [float(prof[mi])],
                "n": [len(y)],
            }
        )

    return (
        kernel_partition(df.select(key_col, ts_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
