"""Local Outlier Factor flag (SURVEY §2.8 F9).

The reference wraps sklearn's ``LocalOutlierFactor`` over the 1-D series
values (/root/reference/diive/pkgs/outlierdetection/lof.py:44-225,
``LocalOutlierFactorAllData`` / ``...DaytimeNighttime``), flagging the
``contamination`` fraction with the worst outlier factor.  sklearn is not
available in this container, so the kernel implements the standard LOF
definition (Breunig et al. 2000) directly in numpy — for 1-D values the
k-nearest neighbours of a point are always among its 2k sorted-order
neighbours, giving an O(n log n) exact kNN instead of a KD-tree.

Execution shape: one series per group via ``applyInPandas`` (Arrow
batches) — embarrassingly parallel across series, one shuffle, no
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ByteType, DoubleType, StructField, StructType

from diive_spark.session import kernel_partition


def lof_scores_1d(values: np.ndarray, k: int = 20) -> np.ndarray:
    """Exact LOF scores for 1-D points.

    Returns an array of LOF values (~1 inlier, >1 outlier). Duplicate-heavy
    neighbourhoods (zero reach distance) get lrd=inf and LOF collapses to 1
    for identical duplicates — matching sklearn's handling.
    """
    n = len(values)
    k = max(1, min(k, n - 1))
    order = np.argsort(values, kind="mergesort")
    sv = values[order]

    # candidate neighbours: 2k window around each sorted position;
    # out-of-range and self candidates are masked with inf distance so the
    # k nearest are always k DISTINCT real neighbours
    idx = np.arange(n)
    cand_offsets = np.arange(-k, k + 1)
    cand = idx[:, None] + cand_offsets[None, :]
    invalid = (cand < 0) | (cand >= n)
    cand_cl = np.clip(cand, 0, n - 1)
    dists = np.abs(sv[cand_cl] - sv[:, None])
    dists[invalid] = np.inf
    dists[cand_cl == idx[:, None]] = np.inf  # self
    part = np.argpartition(dists, k - 1, axis=1)[:, :k]
    rows = idx[:, None]
    knn_dist = dists[rows, part]  # distances to the k nearest
    knn_idx = cand_cl[rows, part]  # sorted-space neighbour indices
    kdist = knn_dist.max(axis=1)

    # reachability distance: max(kdist(neighbour), d(p, neighbour))
    reach = np.maximum(kdist[knn_idx], knn_dist)
    mean_reach = reach.mean(axis=1)
    with np.errstate(divide="ignore"):
        lrd = np.where(mean_reach > 0, 1.0 / mean_reach, np.inf)

    lrd_neighbors = lrd[knn_idx]
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = lrd_neighbors / lrd[:, None]
        # inf/inf (duplicate clusters) -> 1, matching sklearn
        ratio[np.isnan(ratio)] = 1.0
        lof_sorted = ratio.mean(axis=1)

    out = np.empty(n)
    out[order] = lof_sorted
    return out


def lof_flag_kernel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_neighbors: int = 20,
    contamination: float = 0.01,
    flag_col: str = "flag_lof",
) -> DataFrame:
    """Per-series LOF flag: 2 for the ``contamination`` fraction with the
    highest LOF (ties broken toward lower LOF kept), 0 otherwise, null
    values 0 (lof.py:93-225 semantics: test runs on the dropna subset)."""
    schema = StructType(
        [
            df.schema[key_col],
            df.schema[ts_col],
            StructField(value_col, DoubleType()),
            StructField(flag_col, ByteType()),
            StructField("lof", DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        flags = np.zeros(len(pdf), dtype=np.int8)
        lofs = np.full(len(pdf), np.nan)
        mask = pdf[value_col].notna().to_numpy()
        vals = pdf.loc[mask, value_col].to_numpy(dtype=np.float64)
        if len(vals) > n_neighbors:
            scores = lof_scores_1d(vals, k=n_neighbors)
            n_out = int(np.ceil(len(vals) * contamination))
            if n_out > 0:
                thresh = np.partition(scores, -n_out)[-n_out]
                reject = scores >= max(thresh, 1.0 + 1e-12)
                f = np.zeros(len(vals), dtype=np.int8)
                f[reject] = 2
                flags[mask] = f
            lofs[mask] = scores
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                ts_col: pdf[ts_col],
                value_col: pdf[value_col],
                flag_col: flags,
                "lof": lofs,
            }
        )

    return kernel_partition(
        df.select(key_col, ts_col, value_col), key_col
    ).groupBy(key_col).applyInPandas(kernel, schema)
