"""Jenks-Fisher optimal 1-D classification (natural breaks): the
exact dynamic program that minimizes within-class sum of squared
errors over k contiguous classes of the sorted data — the optimal
choropleth/binning partition (Fisher 1958, Jenks 1967).

DP: cost(i, j) = SSE of x[i..j] from prefix sums; dp[c][j] =
min_i dp[c-1][i-1] + cost(i, j), first-occurrence argmin so the
break set is deterministic under ties.

diive counterpart: none (diive stops at equal-width/quantile bins;
otsu_threshold is the k=2 between-class special case).  Scale shape:
per-key Arrow batch over the bounded hourly grid; O(k n^2) time with
vectorized inner minimization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["jenks_breaks", "jenks_frame"]


def _sse_matrix(x: np.ndarray) -> np.ndarray:
    """sse[i, j] = SSE of x[i..j] (inclusive), upper triangle."""
    n = len(x)
    c1 = np.concatenate([[0.0], np.cumsum(x)])
    c2 = np.concatenate([[0.0], np.cumsum(x * x)])
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    cnt = (j - i + 1).astype(np.float64)
    s = c1[j + 1] - c1[i]
    ss = c2[j + 1] - c2[i]
    with np.errstate(invalid="ignore", divide="ignore"):
        sse = ss - s * s / cnt
    sse[j < i] = np.inf
    return np.maximum(sse, 0.0)


def jenks_breaks(x: np.ndarray, k: int) -> tuple[np.ndarray, float]:
    """Optimal k-class breaks of the SORTED data.

    Returns (break upper-bound values of classes 1..k-1, total
    within-class SSE)."""
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = len(x)
    if n <= k:
        return x[: max(0, k - 1)], 0.0
    sse = _sse_matrix(x)
    dp = sse[0].copy()  # 1 class over x[0..j]
    back: list[np.ndarray] = []
    for _c in range(1, k):
        nxt = np.full(n, np.inf)
        arg = np.zeros(n, dtype=np.int64)
        for j in range(_c, n):
            cand = dp[_c - 1 : j] + sse[_c : j + 1, j]
            a = int(np.argmin(cand))
            nxt[j] = cand[a]
            arg[j] = a + _c  # start index of the last class
        back.append(arg)
        dp = nxt
    total = float(dp[n - 1])
    bounds = []
    j = n - 1
    for c in range(k - 1, 0, -1):
        start = int(back[c - 1][j])
        bounds.append(x[start - 1])  # upper value of the previous class
        j = start - 1
    return np.array(bounds[::-1]), total


def jenks_frame(
    df: DataFrame, key_col: str, value_col: str, k: int = 4
) -> DataFrame:
    """Per key: optimal k-class natural breaks and the goodness of
    variance fit GVF = 1 - SSE_within/SSE_total (rows-only kernel)."""
    schema = (
        f"{key_col} string, n long, k long, b1 double, b2 double,"
        " b3 double, gvf double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.float64)
        br, sse_w = jenks_breaks(x, k)
        sse_t = float(np.sum((x - x.mean()) ** 2)) if len(x) else 0.0
        gvf = 1.0 - sse_w / sse_t if sse_t > 0 else float("nan")
        b = list(br) + [float("nan")] * 3
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [len(x)],
                "k": [k],
                "b1": [b[0]],
                "b2": [b[1]],
                "b3": [b[2]],
                "gvf": [gvf],
            }
        )

    return (
        kernel_partition(df.select(key_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
