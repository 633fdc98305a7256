"""Distributed PCA (ml/pca.py) vs plain numpy PCA of the same data:
Gram partials, explained variance, and projected coordinates (after the
shared sign canonicalization)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from diive_spark.ml.pca import pca_fit, pca_project


def _numpy_pca(X: np.ndarray, k: int):
    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    vals = np.maximum(vals[order], 0.0)
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, vals / np.trace(cov), (X - mu) @ comps.T


def _df(spark, X):
    rows = [(i, [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pca_matches_numpy(spark):
    rng = np.random.default_rng(3)
    # anisotropic cloud: a few dominant directions
    basis = rng.normal(0, 1, (6, 16))
    X = rng.normal(0, 1, (400, 6)) @ basis + rng.normal(0, 0.05, (400, 16))
    df = _df(spark, X).repartition(7)
    model = pca_fit(df, "embedding", k=4)
    mu, comps, evr, P = _numpy_pca(X, 4)
    assert model["n"] == 400
    assert np.allclose(model["mean"], mu, atol=1e-9)
    assert np.allclose(model["evr"], evr, atol=1e-9)
    assert np.allclose(model["components"], comps, atol=1e-7)
    got = {
        r["vec_id"]: r["pca"]
        for r in pca_project(df, model, "embedding").collect()
    }
    for i in range(400):
        assert np.allclose(got[i], P[i], atol=1e-7)


def test_pca_partition_invariance(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(0, 2, (300, 8))
    m1 = pca_fit(_df(spark, X).repartition(3), "embedding", k=3)
    m2 = pca_fit(_df(spark, X).repartition(13), "embedding", k=3)
    assert np.allclose(m1["components"], m2["components"], atol=1e-9)
    assert np.allclose(m1["evr"], m2["evr"], atol=1e-12)


def test_pca_query_runs(spark, sf_dir):
    from diive_spark.queries_ml import q_embedding_pca

    out = q_embedding_pca(spark, sf_dir).collect()
    assert len(out) > 0
    # deterministic across invocations
    out2 = q_embedding_pca(spark, sf_dir).collect()
    assert out == out2
