"""LOF kernel tests (SURVEY §2.8 F9) — brute-force O(n^2) oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from diive_spark.operators.lof import lof_flag_kernel, lof_scores_1d


def brute_lof(values: np.ndarray, k: int) -> np.ndarray:
    """Textbook LOF (Breunig et al. 2000) with exactly-k neighbours,
    O(n^2), ties broken identically to the kernel (stable partition on
    distance)."""
    n = len(values)
    d = np.abs(values[:, None] - values[None, :])
    np.fill_diagonal(d, np.inf)
    knn = np.argpartition(d, k - 1, axis=1)[:, :k]
    rows = np.arange(n)[:, None]
    kdist = d[rows, knn].max(axis=1)
    reach = np.maximum(kdist[knn], d[rows, knn])
    lrd = 1.0 / reach.mean(axis=1)
    return (lrd[knn] / lrd[:, None]).mean(axis=1)


def test_lof_scores_match_bruteforce():
    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.normal(0, 1, 300), [8.0, -7.5, 9.1]])
    got = lof_scores_1d(vals, k=15)
    exp = brute_lof(vals, k=15)
    np.testing.assert_allclose(got, exp, rtol=1e-10)


def test_lof_flags_outliers(spark):
    rng = np.random.RandomState(11)
    base = rng.normal(10, 1, 500)
    base[100] = 50.0  # gross outlier
    base[400] = -40.0
    pdf = pd.DataFrame({"k": "s", "t": np.arange(500), "v": base})
    out = (
        lof_flag_kernel(
            spark.createDataFrame(pdf), "k", "t", "v",
            n_neighbors=20, contamination=0.005,
        )
        .orderBy("t")
        .toPandas()
    )
    flagged = set(out.index[out["flag_lof"] == 2])
    assert {100, 400} <= flagged
    assert len(flagged) <= 4  # ceil(500*0.005)=3 at most plus ties guard


def test_lof_nulls_unflagged(spark):
    pdf = pd.DataFrame(
        {
            "k": "s",
            "t": np.arange(60),
            "v": [np.nan if i % 7 == 0 else float(i % 5) for i in range(60)],
        }
    )
    out = (
        lof_flag_kernel(
            spark.createDataFrame(pdf), "k", "t", "v", n_neighbors=5,
            contamination=0.05,
        )
        .orderBy("t")
        .toPandas()
    )
    assert (out.loc[out["v"].isna(), "flag_lof"] == 0).all()
