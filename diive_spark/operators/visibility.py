"""Horizontal visibility graph (Luque, Lacasa, Ballesteros, Luque,
PRE 2009): map a series to a graph where points i < j are linked iff
every point strictly between them lies strictly below both
(y_k < min(y_i, y_j)).  The degree distribution separates chaos from
noise (iid series give P(k) = (1/3)(2/3)^(k-2), mean degree -> 4).

Construction is the O(n) monotonic-stack sweep: each new point links
to every popped smaller predecessor plus the first >= predecessor;
an EQUAL predecessor also stops visibility (strict inequality), so it
is popped after linking without linking anything earlier.

diive counterpart: none.  Scale shape: per-key Arrow batch over the
bounded hourly grid (seqkernels posture).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["hvg_degrees", "hvg_frame"]


def hvg_degrees(y: np.ndarray) -> np.ndarray:
    """Degree of each node in the horizontal visibility graph."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    deg = np.zeros(n, dtype=np.int64)
    stack: list[int] = []
    for t in range(n):
        while stack and y[stack[-1]] < y[t]:
            j = stack.pop()
            deg[j] += 1
            deg[t] += 1
        if stack:
            j = stack[-1]
            deg[j] += 1
            deg[t] += 1
            if y[j] == y[t]:
                stack.pop()
        stack.append(t)
    return deg


def hvg_frame(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Per key: HVG size, mean/max degree and degree entropy of the
    time-ordered series (rows-only kernel)."""
    schema = (
        f"{key_col} string, n long, n_edges long, mean_degree double,"
        " max_degree long, degree_entropy double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        deg = hvg_degrees(y)
        n = len(y)
        edges = int(deg.sum()) // 2
        if n:
            vals, cnts = np.unique(deg, return_counts=True)
            p = cnts / n
            ent = float(-(p * np.log(p)).sum())
        else:
            ent = float("nan")
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [n],
                "n_edges": [edges],
                "mean_degree": [float(deg.mean()) if n else float("nan")],
                "max_degree": [int(deg.max()) if n else 0],
                "degree_entropy": [ent],
            }
        )

    return (
        kernel_partition(df.select(key_col, ts_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
