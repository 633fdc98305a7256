"""Tree-ensemble regressors (ml/forest.py) + their gap-fill / M4 wiring.

No sklearn in the container, so correctness is established from first
principles: exact recovery of piecewise-constant targets, monotone
boosting improvement, nonlinear targets where OLS provably fails,
min_samples_leaf enforcement, determinism, and Spark-kernel ==
standalone-function agreement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from diive_spark.ml.forest import (
    _build_tree,
    _quantile_bin,
    _tree_predict,
    fit_forest,
    fit_gbt,
    predict,
)


def test_single_tree_fits_step_function_exactly():
    # discrete feature values: every distinct value gets its own
    # quantile bin, so the two step thresholds are representable splits
    # (with continuous x the cut can only land on a bin edge — the
    # defining approximation of histogram trees)
    rng = np.random.default_rng(0)
    x = (rng.integers(0, 10, (2000, 1)) / 10.0).astype(float)
    y = np.where(x[:, 0] > 0.5, 3.0, -1.0) + np.where(x[:, 0] > 0.8, 2.0, 0.0)
    codes, _ = _quantile_bin(x)
    tree = _build_tree(codes, y, np.ones(len(y)), np.array([0]), 3, 1)
    assert np.abs(_tree_predict(codes, tree) - y).max() < 1e-12


def test_min_samples_leaf_respected():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (500, 1))
    y = rng.normal(0, 1, 500)
    codes, _ = _quantile_bin(x)
    tree = _build_tree(codes, y, np.ones(500), np.array([0]), 8, 50)
    leaves = _tree_predict(codes, tree)
    # every distinct leaf must hold >= 50 samples
    _, counts = np.unique(leaves, return_counts=True)
    assert counts.min() >= 50


def test_forest_beats_ols_on_nonlinear_target():
    rng = np.random.default_rng(2)
    n = 3000
    X = rng.uniform(0, 10, (n, 2))
    y = np.sin(X[:, 0]) * 3 + np.cos(X[:, 1] * 0.7) + rng.normal(0, 0.2, n)

    def r2(pred):
        return 1 - np.sum((y - pred) ** 2) / np.sum((y - y.mean()) ** 2)

    A = np.column_stack([np.ones(n), X])
    ols = A @ np.linalg.lstsq(A, y, rcond=None)[0]
    rf = predict(fit_forest(X, y, n_estimators=20, max_depth=8, seed=3), X)
    gbt = predict(fit_gbt(X, y, n_estimators=80, max_depth=4, seed=3), X)
    assert r2(ols) < 0.2  # OLS cannot express the target
    assert r2(rf) > 0.9
    assert r2(gbt) > 0.95


def test_gbt_training_error_monotone_in_estimators():
    rng = np.random.default_rng(4)
    X = rng.uniform(0, 5, (1000, 2))
    y = X[:, 0] * X[:, 1] + rng.normal(0, 0.1, 1000)
    errs = []
    for n_est in (5, 20, 60):
        p = predict(fit_gbt(X, y, n_estimators=n_est, max_depth=3, seed=5), X)
        errs.append(np.mean((y - p) ** 2))
    assert errs[0] > errs[1] > errs[2]


def test_determinism_and_seed_sensitivity():
    rng = np.random.default_rng(6)
    X = rng.uniform(0, 1, (800, 3))
    y = rng.normal(0, 1, 800)
    a = predict(fit_forest(X, y, n_estimators=5, seed=9), X)
    b = predict(fit_forest(X, y, n_estimators=5, seed=9), X)
    c = predict(fit_forest(X, y, n_estimators=5, seed=10), X)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_colsample_bynode_diversifies_root_splits():
    """Per-split feature sampling (sklearn max_features semantics): with
    mtry=1 of 2 features, roots must sometimes split on the weaker
    feature; without it, every root picks the dominant one.  1.0 and
    None are byte-identical (the mask path is skipped entirely)."""
    rng = np.random.default_rng(13)
    n = 2000
    X = np.column_stack([
        rng.uniform(0, 1, n),           # dominant: clean step
        rng.uniform(0, 1, n),           # weak: noisy step
    ])
    y = np.where(X[:, 0] > 0.5, 4.0, 0.0) + np.where(X[:, 1] > 0.5, 0.5, 0.0)

    def root_feats(model):
        return {int(t[0][0]) for t in model["trees"]}

    plain = fit_forest(X, y, n_estimators=20, max_depth=4, colsample=1.0, seed=14)
    assert root_feats(plain) == {0}

    mixed = fit_forest(
        X, y, n_estimators=20, max_depth=4, colsample=1.0,
        colsample_bynode=0.5, seed=14,
    )
    assert root_feats(mixed) == {0, 1}
    # still a usable fit, and deterministic
    p = predict(mixed, X)
    r2 = 1 - np.sum((y - p) ** 2) / np.sum((y - y.mean()) ** 2)
    assert r2 > 0.9
    again = fit_forest(
        X, y, n_estimators=20, max_depth=4, colsample=1.0,
        colsample_bynode=0.5, seed=14,
    )
    np.testing.assert_array_equal(p, predict(again, X))

    # colsample_bynode=1.0 must not perturb the rng stream vs None
    a = fit_forest(X, y, n_estimators=5, seed=15)
    b = fit_forest(X, y, n_estimators=5, colsample_bynode=1.0, seed=15)
    np.testing.assert_array_equal(predict(a, X), predict(b, X))

    # gbt accepts it too and still converges
    g = predict(
        fit_gbt(X, y, n_estimators=40, max_depth=3, colsample_bynode=0.5, seed=16), X
    )
    r2g = 1 - np.sum((y - g) ** 2) / np.sum((y - y.mean()) ** 2)
    assert r2g > 0.95


def test_max_features_sklearn_alias():
    """The kwarg name reference users actually pass (randomforest_ts.py
    feeds **kwargs to RandomForestRegressor): float / int / 'sqrt' /
    'log2' all map onto per-split sampling over ALL features."""
    rng = np.random.default_rng(21)
    n = 1500
    X = rng.uniform(0, 1, (n, 4))
    y = np.where(X[:, 0] > 0.5, 4.0, 0.0) + X[:, 1]

    # float fraction == explicit colsample_bynode with colsample=1.0
    a = fit_forest(X, y, n_estimators=8, max_features=0.5, seed=3)
    b = fit_forest(
        X, y, n_estimators=8, colsample=1.0, colsample_bynode=0.5, seed=3
    )
    np.testing.assert_array_equal(predict(a, X), predict(b, X))

    # int count: 2 of 4 == 0.5
    c = fit_forest(X, y, n_estimators=8, max_features=2, seed=3)
    np.testing.assert_array_equal(predict(a, X), predict(c, X))

    # 'sqrt' of 4 features == 2 == 0.5; 'log2' of 4 == 2 as well
    d = fit_forest(X, y, n_estimators=8, max_features="sqrt", seed=3)
    e = fit_forest(X, y, n_estimators=8, max_features="log2", seed=3)
    np.testing.assert_array_equal(predict(a, X), predict(d, X))
    np.testing.assert_array_equal(predict(a, X), predict(e, X))

    # 1.0 == all features == no mask perturbation
    f = fit_forest(X, y, n_estimators=8, max_features=1.0, seed=3)
    g = fit_forest(X, y, n_estimators=8, colsample=1.0, seed=3)
    np.testing.assert_array_equal(predict(f, X), predict(g, X))


def test_predict_on_unseen_rows_uses_frozen_bins():
    rng = np.random.default_rng(7)
    X = rng.uniform(0, 1, (1000, 1))
    y = np.where(X[:, 0] > 0.5, 1.0, 0.0)
    model = fit_forest(X, y, n_estimators=10, max_depth=4, seed=8)
    Xnew = np.array([[0.1], [0.9], [-5.0], [5.0]])  # incl. out-of-range
    p = predict(model, Xnew)
    assert p[0] < 0.2 and p[2] < 0.2
    assert p[1] > 0.8 and p[3] > 0.8


def test_gapfill_rf_kernel_matches_standalone(spark):
    """Spark kernel == standalone fill_series_pdf with the same crc32 seed,
    and RF-filled values stay inside the observed value envelope (tree
    means cannot extrapolate, unlike OLS)."""
    import zlib

    from diive_spark.ml.gapfill import fill_series_pdf, ml_gapfill

    rng = np.random.default_rng(11)
    n = 600
    ts = 1704067200 + np.arange(n) * 1800
    v = np.sin(np.arange(n) * 0.1) * 10 + rng.normal(0, 0.5, n)
    v[rng.choice(n, 60, replace=False)] = np.nan
    pdf = pd.DataFrame({"key": 3, "ts_s": ts, "value": v})

    seed = zlib.crc32(b"3") % (2**31)
    want = fill_series_pdf(
        pdf[["ts_s", "value"]], n_lags=1, regressor="rf", seed=seed,
        n_estimators=10, max_depth=5,
    )
    got = (
        ml_gapfill(
            spark.createDataFrame(pdf), "key", "ts_s", "value",
            n_lags=1, regressor="rf", n_estimators=10, max_depth=5,
        )
        .orderBy("ts_s")
        .toPandas()
    )
    np.testing.assert_allclose(got["value_filled"], want["value_filled"])
    np.testing.assert_array_equal(got["flag_fill"], want["flag_fill"])
    filled = got.loc[got["flag_fill"] > 0, "value_filled"]
    lo, hi = np.nanmin(v), np.nanmax(v)
    assert filled.between(lo, hi).all()


def test_optimize_params_returns_sane_grid_point(spark):
    from diive_spark.ml.gapfill import PARAM_GRID_DEFAULT, ml_optimize_params

    rng = np.random.default_rng(12)
    n = 500
    ts = 1704067200 + np.arange(n) * 1800
    v = np.sin(np.arange(n) * 0.05) * 5 + rng.normal(0, 0.3, n)
    pdf = pd.DataFrame({"key": 1, "ts_s": ts, "value": v})
    row = (
        ml_optimize_params(
            spark.createDataFrame(pdf), "key", "ts_s", "value", n_splits=3
        )
        .toPandas()
        .iloc[0]
    )
    assert row["best_n_estimators"] in PARAM_GRID_DEFAULT["n_estimators"]
    assert row["best_max_depth"] in PARAM_GRID_DEFAULT["max_depth"]
    assert row["best_min_samples_leaf"] in PARAM_GRID_DEFAULT["min_samples_leaf"]
    assert row["n_folds"] == 3
    assert row["cv_neg_mse"] <= 0.0
    assert row["test_r2"] > 0.5  # smooth signal: any grid point fits decently


def test_prefix_and_depth_truncation_exact():
    """One (max trees, max depth) rf fit answers the whole grid: trees[:k]
    == a k-tree fit (shared rng prefix) and depth-truncated traversal ==
    a shallower fit — the optimize_params fast path's correctness."""
    rng = np.random.RandomState(3)
    X = rng.normal(0, 1, (300, 4))
    y = np.sin(X[:, 0]) + 0.3 * X[:, 1] ** 2 + rng.normal(0, 0.1, 300)
    Xq = rng.normal(0, 1, (80, 4))
    big = fit_forest(X, y, n_estimators=10, max_depth=5,
                     min_samples_leaf=2, seed=7)
    for ne in (3, 5, 10):
        for md in (2, 3, 5):
            small = fit_forest(X, y, n_estimators=ne, max_depth=md,
                               min_samples_leaf=2, seed=7)
            np.testing.assert_array_equal(
                predict(big, Xq, n_trees=ne, depth=md), predict(small, Xq)
            )


def test_optimize_params_fast_path_matches_naive():
    """The shared-fit CV must reproduce the per-combo loop exactly."""
    import pandas as pd

    from diive_spark.ml.gapfill import _fit_predict, optimize_params_pdf

    rng = np.random.RandomState(5)
    n = 400
    ts = np.arange(n) * 1800
    v = np.sin(ts / 40000.0) * 5 + rng.normal(0, 0.5, n)
    v[rng.choice(n, 30, replace=False)] = np.nan
    pdf = pd.DataFrame({"ts_s": ts, "value": v})
    out = optimize_params_pdf(pdf, n_lags=1, n_splits=3, regressor="rf")
    # naive re-run of the same CV, literal per-combo fits
    from itertools import product

    from diive_spark.ml.gapfill import PARAM_GRID_DEFAULT

    pdf2 = pdf.sort_values("ts_s").reset_index(drop=True)
    vv = pdf2["value"].to_numpy()
    recno = np.arange(n, dtype=np.float64)
    tod = (pdf2["ts_s"].to_numpy() % 86400) / 86400.0
    lag = np.roll(vv, 1); lag[:1] = np.nan
    lead = np.roll(vv, -1); lead[-1:] = np.nan
    X = np.column_stack([recno, tod, lag, lead])
    ok = ~np.isnan(vv) & ~np.isnan(X).any(axis=1)
    Xc, yc = X[ok], vv[ok]
    m = len(yc)
    n_test = max(1, int(round(m * 0.25)))
    Xtr, ytr = Xc[: m - n_test], yc[: m - n_test]
    ntr = len(ytr)
    fold = ntr // 4
    best = (None, -np.inf)
    for vals in product(*PARAM_GRID_DEFAULT.values()):
        params = dict(zip(PARAM_GRID_DEFAULT.keys(), vals))
        errs = []
        for i in range(1, 4):
            tr_end = fold * i + ntr % 4
            va_end = min(tr_end + fold, ntr)
            pred = _fit_predict(Xtr[:tr_end], ytr[:tr_end],
                                Xtr[tr_end:va_end], regressor="rf",
                                seed=0, **params)
            errs.append(float(np.mean((pred - ytr[tr_end:va_end]) ** 2)))
        score = -float(np.mean(errs))
        if score > best[1]:
            best = (params, score)
    assert out["cv_neg_mse"].iloc[0] == best[1]
    assert out["best_n_estimators"].iloc[0] == best[0]["n_estimators"]
    assert out["best_max_depth"].iloc[0] == best[0]["max_depth"]
    assert out["best_min_samples_leaf"].iloc[0] == best[0]["min_samples_leaf"]
