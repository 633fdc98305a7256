"""Isolation Forest (ml/iforest.py): distributed scoring == local numpy
scoring of the same model; planted outliers score above the bulk; the
registry query is deterministic across runs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from diive_spark.ml.iforest import (
    iforest_fit,
    iforest_score,
    iforest_score_np,
)


def _data(seed=3, n=2000):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (n, 2))
    X[:20] += rng.choice([-8, 8], size=(20, 2))  # planted outliers
    return X


def test_outliers_score_higher():
    X = _data()
    model = iforest_fit(X, n_trees=100, psi=256, seed=1)
    s = iforest_score_np(model, X)
    assert s[:20].mean() > s[20:].mean() + 0.15
    # paper's calibration: scores in (0, 1]; bulk well under 0.6
    assert 0 < s.min() and s.max() <= 1.0
    assert np.median(s[20:]) < 0.6 < np.median(s[:20])


def test_distributed_equals_local(spark):
    X = _data(seed=5, n=1500)
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(X)]
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double")
    out = iforest_score(
        df, feature_cols=["f1", "f2"], id_cols=["id"],
        n_trees=40, psi=128, seed=11,
    )
    got = {r["id"]: r["iforest_score"] for r in out.collect()}

    # rebuild the identical model locally: same hash-rank pool, same seed
    pool = (
        df.select(
            "f1", "f2",
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
            .cast("bigint").alias("_hr"),
        )
        .orderBy("_hr").limit(4 * 128).collect()
    )
    X_pool = np.array([[r["f1"], r["f2"]] for r in pool])
    model = iforest_fit(X_pool, n_trees=40, psi=128, seed=11)
    want = iforest_score_np(model, X)
    for i in range(len(X)):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_query_deterministic(spark, sf_dir):
    from diive_spark.queries_ml import q_flag_iforest

    a = q_flag_iforest(spark, sf_dir).collect()
    b = q_flag_iforest(spark, sf_dir).collect()
    assert a == b
    assert len(a) > 0
