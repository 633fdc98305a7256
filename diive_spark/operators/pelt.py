"""PELT — Pruned Exact Linear Time changepoint detection, per series.

Public algorithm: Killick, Fearnhead & Eckley, "Optimal Detection of
Changepoints With a Linear Computational Cost" (JASA 2012).  Unlike
binary segmentation (operators/changepoint.py), which is greedy and can
miss the optimal segmentation, PELT minimizes the EXACT penalized cost

    sum_seg C(seg) + beta * n_changepoints,   C = within-segment SSE

over all segmentations, pruning candidate changepoints that can never
be optimal (valid because C is additive-concave; Killick Thm 3.1 with
K = 0 for SSE).  With the default beta = 2 * sigma^2 * log(n) (BIC for
a mean-shift with known variance; sigma estimated by the MAD of first
differences / sqrt(2), Hampel-robust) the expected runtime is O(n) on
series whose changepoint count grows with n.

diive counterpart: none (diive flags level shifts only via manual
thresholds); the engine needs it for crawl-rate regime changes.

Scale shape: one grouped Arrow kernel per key (`kernel_partition`),
bounded state (cumsum arrays + the pruned candidate list).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["pelt_kernel", "optimal_partition_kernel", "pelt_changepoints"]


def _seg_cost_factory(y: np.ndarray):
    """SSE cost of segment [i, j) in O(1) via cumulative sums."""
    c1 = np.concatenate(([0.0], np.cumsum(y)))
    c2 = np.concatenate(([0.0], np.cumsum(y * y)))

    def cost(i: int, j: int) -> float:
        n = j - i
        s = c1[j] - c1[i]
        return float(c2[j] - c2[i] - s * s / n)

    return cost


def default_penalty(y: np.ndarray) -> float:
    """2 * sigma_hat^2 * ln(n); sigma from the MAD of first differences
    (robust to the changepoints themselves inflating the variance)."""
    n = len(y)
    d = np.diff(y)
    sigma = 1.4826 * np.median(np.abs(d - np.median(d))) / np.sqrt(2.0)
    sigma = max(float(sigma), 1e-12)
    return 2.0 * sigma * sigma * np.log(max(n, 2))


def pelt_kernel(
    y: np.ndarray, beta: float | None = None, min_size: int = 2
) -> list[int]:
    """Changepoint indices (segment START positions, excluding 0) of the
    exact penalized-SSE optimum."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 2 * min_size:
        return []
    if beta is None:
        beta = default_penalty(y)
    c1 = np.concatenate(([0.0], np.cumsum(y)))
    c2 = np.concatenate(([0.0], np.cumsum(y * y)))
    f = np.full(n + 1, np.inf)
    f[0] = -beta
    last = np.zeros(n + 1, dtype=np.int64)
    cands = np.array([0], dtype=np.int64)
    for t in range(min_size, n + 1):
        live = cands[t - cands >= min_size]
        s = c1[t] - c1[live]
        cost_st = c2[t] - c2[live] - s * s / (t - live)
        v = f[live] + cost_st
        i = int(np.argmin(v))
        f[t] = v[i] + beta
        last[t] = live[i]
        # prune: s can never be optimal for t' > t if
        # f[s] + C(s, t) + K > f[t]  (K = 0 for SSE); too-young
        # candidates (t - s < min_size) are kept — not yet testable
        keep = cands[t - cands < min_size]
        cands = np.concatenate(
            (live[v <= f[t]], keep, [t - min_size + 1])
        )
    # backtrack
    cps = []
    t = n
    while t > 0:
        s = last[t]
        if s > 0:
            cps.append(int(s))
        t = s
    return sorted(cps)


def optimal_partition_kernel(
    y: np.ndarray, beta: float | None = None, min_size: int = 2
) -> list[int]:
    """Unpruned O(n^2) optimal partitioning — the exactness oracle for
    :func:`pelt_kernel` (identical output by Killick Thm 3.1)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 2 * min_size:
        return []
    if beta is None:
        beta = default_penalty(y)
    cost = _seg_cost_factory(y)
    f = np.full(n + 1, np.inf)
    f[0] = -beta
    last = np.zeros(n + 1, dtype=np.int64)
    for t in range(min_size, n + 1):
        best, barg = np.inf, 0
        for s in range(0, t - min_size + 1):
            if s != 0 and s < min_size:
                continue
            v = f[s] + cost(s, t) + beta
            if v < best:
                best, barg = v, s
        f[t] = best
        last[t] = barg
    cps = []
    t = n
    while t > 0:
        s = last[t]
        if s > 0:
            cps.append(int(s))
        t = s
    return sorted(cps)


def pelt_changepoints(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    beta: float | None = None,
    min_size: int = 2,
    key_type: str = "string",
) -> DataFrame:
    """One row per detected changepoint: (key, cp_no, ts_s, mean_before,
    mean_after).  ``ts_col`` holds epoch seconds, sorted per key."""
    schema = (
        f"{key_col} {key_type}, cp_no long, ts_s long, "
        "mean_before double, mean_after double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).dropna(subset=[value_col])
        y = pdf[value_col].to_numpy(dtype=np.float64)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        cps = pelt_kernel(y, beta=beta, min_size=min_size)
        bounds = [0] + cps + [len(y)]
        rows = []
        for i, cp in enumerate(cps):
            rows.append(
                (
                    pdf[key_col].iloc[0],
                    i + 1,
                    int(ts[cp]),
                    float(y[bounds[i]:bounds[i + 1]].mean()),
                    float(y[bounds[i + 1]:bounds[i + 2]].mean()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[key_col, "cp_no", "ts_s", "mean_before", "mean_after"],
        )

    return (
        kernel_partition(df.select(key_col, ts_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
