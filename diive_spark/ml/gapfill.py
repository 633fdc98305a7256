"""ML gap-filling (SURVEY §2.10 M1/M2): per-series model-based gap fill
re-expressing the RandomForestTS pipeline shape
(/root/reference/diive/pkgs/gapfilling/randomforest_ts.py:160-898):

  1. assemble features per series: lagged copies (T8), calendar features,
     record number (randomforest_ts.py:719-724 + times.py:515-599),
  2. fit on rows where target + all features are present,
  3. predict gaps where features are present -> flag 1,
  4. FALLBACK model on timestamp-only features for remaining gaps
     -> flag 2 (randomforest_ts.py:813-872),
  5. observed rows keep their value -> flag 0,
  6. cumulative sum of the filled series (randomforest_ts.py:838-839).

Model family: the reference uses sklearn RandomForestRegressor; sklearn is
not available in this container, so the kernel's regressor is pluggable
(:func:`_fit_predict`): deterministic OLS, or the numpy histogram random
forest / gradient-boosted trees from :mod:`diive_spark.ml.forest` (the
reference's actual model families for M1-M3 and M5).  M4's grid search is
:func:`ml_optimize_params`.

Execution shape: one series per group via ``applyInPandas`` (Arrow
batches). Each series is independent => embarrassingly parallel across the
cluster, no shuffle beyond the initial groupBy — the same shape diive runs
single-threaded, scaled out per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from diive_spark.session import kernel_partition

FILL_SCHEMA_FIELDS = [
    StructField("ts_s", LongType()),
    StructField("value", DoubleType()),
    StructField("value_filled", DoubleType()),
    StructField("flag_fill", ByteType()),
    StructField("cumsum_filled", DoubleType()),
]


def _fit_predict(
    X_train: np.ndarray,
    y_train: np.ndarray,
    X_pred: np.ndarray,
    regressor: str = "ols",
    seed: int = 0,
    **params,
) -> np.ndarray:
    """Pluggable per-series regressor.

    ``ols`` — deterministic least squares (the round-1 stand-in, kept as
    the fast/linear option); ``rf`` — numpy histogram random forest
    (the reference's actual model family, ml/forest.py); ``gbt`` —
    gradient-boosted trees (the XGBoostTS analog, M5).
    """
    if regressor == "ols":
        A = np.column_stack([np.ones(len(X_train)), X_train])
        coef, *_ = np.linalg.lstsq(A, y_train, rcond=None)
        return np.column_stack([np.ones(len(X_pred)), X_pred]) @ coef
    from diive_spark.ml import forest

    if regressor == "rf":
        model = forest.fit_forest(X_train, y_train, seed=seed, **params)
    elif regressor == "gbt":
        model = forest.fit_gbt(X_train, y_train, seed=seed, **params)
    else:
        raise ValueError(f"unknown regressor {regressor!r}")
    return forest.predict(model, X_pred)


def fill_series_pdf(
    pdf: pd.DataFrame,
    n_lags: int = 1,
    grid_step: int | None = None,
    regressor: str = "ols",
    seed: int = 0,
    **reg_params,
) -> pd.DataFrame:
    """Gap-fill ONE series (pandas frame with ts_s, value sorted later).
    This is both the Spark kernel body and the test oracle — identical code
    runs per group in executors and standalone in tests.

    ``grid_step`` (seconds): reindex onto the complete [min, max] grid
    INSIDE the kernel before filling — the reference's
    ``reindex(hires_index)`` (randomforest_ts.py:807). Building the grid
    here instead of with sequence/explode + join upstream removes two
    cluster-level shuffles and a 2x-row join from the plan (the grid never
    exists as distributed rows)."""
    pdf = pdf.sort_values("ts_s").reset_index(drop=True)
    if grid_step is not None and len(pdf):
        full = np.arange(
            int(pdf["ts_s"].iloc[0]),
            int(pdf["ts_s"].iloc[-1]) + grid_step,
            grid_step,
            dtype=np.int64,
        )
        pdf = (
            pdf.set_index("ts_s")
            .reindex(full)
            .rename_axis("ts_s")
            .reset_index()
        )
    v = pdf["value"].to_numpy(dtype=np.float64)
    n = len(pdf)
    recno = np.arange(n, dtype=np.float64)
    day_s = 86400.0
    tod = (pdf["ts_s"].to_numpy() % 86400) / day_s  # time-of-day fraction
    feats = [recno, tod]
    for k in range(1, n_lags + 1):
        lag = np.roll(v, k)
        lag[:k] = np.nan
        lead = np.roll(v, -k)
        lead[-k:] = np.nan
        feats.extend([lag, lead])
    X = np.column_stack(feats)
    ts_feats = np.column_stack([recno, tod])

    obs = ~np.isnan(v)
    full_feat = ~np.isnan(X).any(axis=1)
    filled = v.copy()
    flag = np.zeros(n, dtype=np.int8)

    fit_mask = obs & full_feat
    pred_mask = (~obs) & full_feat
    if fit_mask.sum() >= X.shape[1] + 1 and pred_mask.any():
        filled[pred_mask] = _fit_predict(
            X[fit_mask], v[fit_mask], X[pred_mask],
            regressor=regressor, seed=seed, **reg_params,
        )
        flag[pred_mask] = 1
    rest = (~obs) & np.isnan(filled)
    if obs.sum() >= ts_feats.shape[1] + 1 and rest.any():
        filled[rest] = _fit_predict(
            ts_feats[obs], v[obs], ts_feats[rest],
            regressor=regressor, seed=seed, **reg_params,
        )
        flag[rest] = 2
    out = pd.DataFrame(
        {
            "ts_s": pdf["ts_s"].to_numpy(),
            "value": v,
            "value_filled": filled,
            "flag_fill": flag,
            "cumsum_filled": np.nancumsum(filled),
        }
    )
    return out


def ml_gapfill(
    df: DataFrame,
    key_col: str,
    ts_s_col: str,
    value_col: str,
    n_lags: int = 1,
    grid_step: int | None = None,
    regressor: str = "ols",
    **reg_params,
) -> DataFrame:
    """Distributed per-key gap fill. Input: long frame with an epoch-second
    grid column and a nullable value; output adds filled value + 0/1/2 flag
    + cumulative sum. With ``grid_step`` the full grid is materialized
    inside the kernel (sparse input rows suffice — no upstream grid join).
    ``regressor``: 'ols' | 'rf' | 'gbt' (see :func:`_fit_predict`); tree
    models seed per key (crc32) so results are partitioning-independent."""
    key_field = [f for f in df.schema.fields if f.name == key_col][0]
    schema = StructType([key_field] + FILL_SCHEMA_FIELDS)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import zlib

        key = pdf[key_col].iloc[0]
        seed = zlib.crc32(str(key).encode()) % (2**31)
        out = fill_series_pdf(
            pdf.rename(columns={ts_s_col: "ts_s", value_col: "value"}),
            n_lags=n_lags,
            grid_step=grid_step,
            regressor=regressor,
            seed=seed,
            **reg_params,
        )
        out.insert(0, key_col, key)
        return out

    sel = kernel_partition(df.select(key_col, ts_s_col, value_col), key_col)
    return sel.groupBy(key_col).applyInPandas(kernel, schema)


def year_pools(years) -> list[tuple[int, int, int]]:
    """(center_year, pool_min, pool_max) per year — the year and its two
    nearest neighboring years, replicating ``neighboring_years``
    (/root/reference/diive/core/times/neighbors.py:6-46) including the
    ``find_nearest_val`` argmin-first tie-break (funcs.py:44-48): for a
    year with both adjacent neighbors present the EARLIER year wins the
    tie, so pools match the reference's 2013->[2013..2015],
    2014->[2013..2015], 2015->[2014..2016] pattern.  The pool is the
    [min, max] year RANGE (the reference's ``_limit_yearpool_data``
    slices by range, not by membership)."""
    ys = sorted({int(y) for y in years})
    out = []
    for y in ys:
        rest = [u for u in ys if u != y]
        pool = [y]
        for _ in range(2):
            if not rest:
                break
            nearest = min(rest, key=lambda u: (abs(u - y), u))
            pool.append(nearest)
            rest.remove(nearest)
        out.append((y, min(pool), max(pool)))
    return out


def ml_gapfill_longterm(
    df: DataFrame,
    key_col: str,
    ts_s_col: str,
    value_col: str,
    n_lags: int = 1,
    grid_step: int | None = None,
) -> DataFrame:
    """M3 ``LongTermRandomForestTS`` (randomforest_ts.py:948-1095): each
    year is gap-filled by a model trained on the year plus its two
    nearest neighboring years; only the center year's rows are kept from
    each pool run (the reference's ``keepyear`` collect).

    Distributed shape: rows are replicated into every pool whose
    [ymin, ymax] range covers their year (<= 3x fan-out — the standard
    halo trick), then ONE grouped kernel per (key, center_year) trains
    and fills; each output row is emitted exactly once, by its own
    year's pool.  Parallelism is keys x years instead of the reference's
    sequential per-year loop; per-task memory is bounded by one series'
    3-year pool."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType

    key_field = [f for f in df.schema.fields if f.name == key_col][0]
    d = df.select(
        F.col(key_col),
        F.col(ts_s_col).alias("ts_s"),
        F.col(value_col).alias("value"),
        F.year(F.timestamp_seconds(F.col(ts_s_col))).cast("int").alias("_yr"),
    )
    ylist = (
        d.select(key_col, "_yr")
        .distinct()
        .groupBy(key_col)
        .agg(F.sort_array(F.collect_list("_yr")).alias("_years"))
    )
    pool_schema = StructType(
        [
            key_field,
            StructField("_cy", IntegerType()),
            StructField("_ymin", IntegerType()),
            StructField("_ymax", IntegerType()),
        ]
    )

    def pools(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k, years in zip(pdf[key_col], pdf["_years"]):
                for c, mn, mx in year_pools(years):
                    rows.append((k, c, mn, mx))
            yield pd.DataFrame(rows, columns=[key_col, "_cy", "_ymin", "_ymax"])

    pools_df = ylist.mapInPandas(pools, pool_schema)
    tagged = d.join(pools_df, on=key_col).filter(
        (F.col("_yr") >= F.col("_ymin")) & (F.col("_yr") <= F.col("_ymax"))
    )

    schema = StructType(
        [key_field, StructField("center_year", IntegerType())] + FILL_SCHEMA_FIELDS
    )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        k, cy = key[0], key[1]
        out = fill_series_pdf(
            pdf[["ts_s", "value"]], n_lags=n_lags, grid_step=grid_step
        )
        yrs = pd.to_datetime(out["ts_s"], unit="s").dt.year
        out = out[yrs == cy].reset_index(drop=True)
        out.insert(0, "center_year", np.int32(cy))
        out.insert(0, key_col, k)
        return out

    return kernel_partition(tagged, key_col, "_cy").groupBy(key_col, "_cy").applyInPandas(kernel, schema)


def train_report_pdf(
    pdf: pd.DataFrame,
    n_lags: int = 1,
    test_size: float = 0.25,
    perm_n_repeats: int = 10,
    seed: int = 42,
    regressor: str = "ols",
    **reg_params,
) -> pd.DataFrame:
    """M1 model-quality report for ONE series (reference
    ``RandomForestTS.trainmodel`` + ``_permutation_importance``,
    randomforest_ts.py:431-495,682-710): deterministic train/test split,
    fit on train, score on test (R2 / MAE / RMSE / MedAE — the
    reference's ``prediction_scores_regr`` set), and sklearn-style
    permutation importance (importance = baseline R2 minus the R2 with
    ONE feature column shuffled, mean/std over ``perm_n_repeats``
    seeded repeats).  One output row per feature."""
    pdf = pdf.sort_values("ts_s").reset_index(drop=True)
    v = pdf["value"].to_numpy(dtype=np.float64)
    n = len(pdf)
    recno = np.arange(n, dtype=np.float64)
    tod = (pdf["ts_s"].to_numpy() % 86400) / 86400.0
    feats, names = [recno, tod], ["recno", "tod"]
    for k in range(1, n_lags + 1):
        lag = np.roll(v, k)
        lag[:k] = np.nan
        lead = np.roll(v, -k)
        lead[-k:] = np.nan
        feats.extend([lag, lead])
        names.extend([f"lag{k}", f"lead{k}"])
    X = np.column_stack(feats)
    ok = ~np.isnan(v) & ~np.isnan(X).any(axis=1)  # complete rows only
    X, y = X[ok], v[ok]

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(y))
    n_test = int(round(len(y) * test_size))
    test_idx, train_idx = perm[:n_test], perm[n_test:]
    Xtr, ytr, Xte, yte = X[train_idx], y[train_idx], X[test_idx], y[test_idx]

    if regressor == "ols":
        A = np.column_stack([np.ones(len(Xtr)), Xtr])
        coef, *_ = np.linalg.lstsq(A, ytr, rcond=None)

        def predict(Xp: np.ndarray) -> np.ndarray:
            return np.column_stack([np.ones(len(Xp)), Xp]) @ coef

    else:  # rf | gbt: fit once, permutation repeats reuse the model
        from diive_spark.ml import forest

        fit = forest.fit_forest if regressor == "rf" else forest.fit_gbt
        model = fit(Xtr, ytr, seed=seed, **reg_params)

        def predict(Xp: np.ndarray) -> np.ndarray:
            return forest.predict(model, Xp)

    def r2(y_true: np.ndarray, y_pred: np.ndarray) -> float:
        ss_res = np.sum((y_true - y_pred) ** 2)
        ss_tot = np.sum((y_true - y_true.mean()) ** 2)
        return 1.0 - ss_res / ss_tot

    pred = predict(Xte)
    base_r2 = r2(yte, pred)
    mae = float(np.mean(np.abs(yte - pred)))
    rmse = float(np.sqrt(np.mean((yte - pred) ** 2)))
    medae = float(np.median(np.abs(yte - pred)))

    rows = []
    for j, name in enumerate(names):
        drops = []
        for _ in range(perm_n_repeats):
            Xp = Xte.copy()
            Xp[:, j] = Xp[rng.permutation(len(Xp)), j]
            drops.append(base_r2 - r2(yte, predict(Xp)))
        rows.append(
            {
                "feature": name,
                "perm_importance": float(np.mean(drops)),
                "perm_sd": float(np.std(drops)),
                "r2": float(base_r2),
                "mae": mae,
                "rmse": rmse,
                "medae": medae,
                "n_train": len(train_idx),
                "n_test": len(test_idx),
            }
        )
    return pd.DataFrame(rows)


def ml_train_report(
    df: DataFrame,
    key_col: str,
    ts_s_col: str,
    value_col: str,
    n_lags: int = 1,
    test_size: float = 0.25,
    perm_n_repeats: int = 10,
    regressor: str = "ols",
    **reg_params,
) -> DataFrame:
    """Distributed per-key model-quality report (one kernel per key,
    deterministic per-key crc32 seed)."""
    from pyspark.sql.types import DoubleType, IntegerType, StringType

    key_field = [f for f in df.schema.fields if f.name == key_col][0]
    schema = StructType(
        [
            key_field,
            StructField("feature", StringType()),
            StructField("perm_importance", DoubleType()),
            StructField("perm_sd", DoubleType()),
            StructField("r2", DoubleType()),
            StructField("mae", DoubleType()),
            StructField("rmse", DoubleType()),
            StructField("medae", DoubleType()),
            StructField("n_train", IntegerType()),
            StructField("n_test", IntegerType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import zlib

        key = pdf[key_col].iloc[0]
        seed = zlib.crc32(str(key).encode()) % (2**31)
        out = train_report_pdf(
            pdf.rename(columns={ts_s_col: "ts_s", value_col: "value"}),
            n_lags=n_lags, test_size=test_size,
            perm_n_repeats=perm_n_repeats, seed=seed,
            regressor=regressor, **reg_params,
        )
        out = out.astype({"n_train": "int32", "n_test": "int32"})
        out.insert(0, key_col, key)
        return out

    sel = kernel_partition(df.select(key_col, ts_s_col, value_col), key_col)
    return sel.groupBy(key_col).applyInPandas(kernel, schema)


PARAM_GRID_DEFAULT = {
    "n_estimators": [5, 10],
    "max_depth": [3, 5],
    "min_samples_leaf": [1, 3],
}

OPT_SCHEMA_FIELDS = [
    StructField("best_n_estimators", LongType()),
    StructField("best_max_depth", LongType()),
    StructField("best_min_samples_leaf", LongType()),
    StructField("cv_neg_mse", DoubleType()),
    StructField("n_folds", LongType()),
    StructField("test_mse", DoubleType()),
    StructField("test_mae", DoubleType()),
    StructField("test_r2", DoubleType()),
]


def optimize_params_pdf(
    pdf: pd.DataFrame,
    n_lags: int = 1,
    param_grid: dict | None = None,
    n_splits: int = 5,
    test_size: float = 0.25,
    regressor: str = "rf",
    seed: int = 0,
) -> pd.DataFrame:
    """M4 ``OptimizeParamsRFTS.optimize`` for ONE series
    (/root/reference/diive/pkgs/gapfilling/randomforest_ts.py:119-156):
    grid search scored by negative MSE under time-series CV, then
    test-set scores for the winning params.

    Deviations (documented): the train/test split is CHRONOLOGICAL
    (last ``test_size`` fraction) instead of sklearn's shuffled
    ``random_state=42`` split — deterministic and leakage-free for time
    series; the estimator is ml/forest.py's numpy forest, not sklearn.
    The CV follows sklearn ``TimeSeriesSplit``: data in ``n_splits + 1``
    chronological blocks, fold i trains on blocks[0..i] and validates on
    block i+1 (expanding window).
    """
    from itertools import product

    grid = param_grid or PARAM_GRID_DEFAULT
    pdf = pdf.sort_values("ts_s").reset_index(drop=True)
    v = pdf["value"].to_numpy(dtype=np.float64)
    n = len(pdf)
    recno = np.arange(n, dtype=np.float64)
    tod = (pdf["ts_s"].to_numpy() % 86400) / 86400.0
    feats = [recno, tod]
    for k in range(1, n_lags + 1):
        lag = np.roll(v, k)
        lag[:k] = np.nan
        lead = np.roll(v, -k)
        lead[-k:] = np.nan
        feats.extend([lag, lead])
    X = np.column_stack(feats)
    ok = ~np.isnan(v) & ~np.isnan(X).any(axis=1)
    Xc, yc = X[ok], v[ok]
    m = len(yc)
    n_test = max(1, int(round(m * test_size)))
    Xtr, ytr = Xc[: m - n_test], yc[: m - n_test]
    Xte, yte = Xc[m - n_test :], yc[m - n_test :]

    ntr = len(ytr)
    # sklearn TimeSeriesSplit boundaries: test blocks of size
    # ntr // (n_splits + 1), training always starts at 0
    fold = ntr // (n_splits + 1)
    combos = [
        dict(zip(grid.keys(), vals)) for vals in product(*grid.values())
    ]
    # rf grid fast path: one (max trees, max depth) fit per
    # (fold, min_samples_leaf) answers EVERY (n_estimators, max_depth)
    # combo exactly via ensemble-prefix + depth-truncated prediction
    # (ml/forest.py::predict) — tree t's rng draws depend only on t, and
    # level-wise splits never look at the depth limit, so the shared fit
    # is bit-identical to per-combo fits (pinned in tests/test_forest.py).
    rf_fast = regressor == "rf" and set(grid.keys()) <= {
        "n_estimators", "max_depth", "min_samples_leaf"
    }
    errs_by_combo: list[list[float]] = [[] for _ in combos]
    for i in range(1, n_splits + 1):
        tr_end = fold * i + ntr % (n_splits + 1)
        va_end = min(tr_end + fold, ntr)
        if tr_end < 2 or va_end <= tr_end:
            continue
        Xf, yf, Xv, yv = (
            Xtr[:tr_end], ytr[:tr_end], Xtr[tr_end:va_end], ytr[tr_end:va_end]
        )
        if rf_fast:
            from diive_spark.ml import forest

            max_ne = max(c.get("n_estimators", 20) for c in combos)
            max_md = max(c.get("max_depth", 5) for c in combos)
            for leaf in sorted({c.get("min_samples_leaf", 3) for c in combos}):
                model = forest.fit_forest(
                    Xf, yf, n_estimators=max_ne, max_depth=max_md,
                    min_samples_leaf=leaf, seed=seed,
                )
                for ci, c in enumerate(combos):
                    if c.get("min_samples_leaf", 3) != leaf:
                        continue
                    pred = forest.predict(
                        model, Xv,
                        n_trees=c.get("n_estimators", 20),
                        depth=c.get("max_depth", 5),
                    )
                    errs_by_combo[ci].append(float(np.mean((pred - yv) ** 2)))
        else:
            for ci, params in enumerate(combos):
                pred = _fit_predict(
                    Xf, yf, Xv, regressor=regressor, seed=seed, **params
                )
                errs_by_combo[ci].append(float(np.mean((pred - yv) ** 2)))
    results = [
        -float(np.mean(e)) if e else -np.inf for e in errs_by_combo
    ]
    best_i = int(np.argmax(results))
    best = combos[best_i]
    pred_te = _fit_predict(
        Xtr, ytr, Xte, regressor=regressor, seed=seed, **best
    )
    mse = float(np.mean((pred_te - yte) ** 2))
    mae = float(np.mean(np.abs(pred_te - yte)))
    ss = float(np.sum((yte - yte.mean()) ** 2))
    r2 = 1.0 - float(np.sum((pred_te - yte) ** 2)) / ss if ss > 0 else np.nan
    return pd.DataFrame(
        {
            "best_n_estimators": [int(best["n_estimators"])],
            "best_max_depth": [int(best["max_depth"])],
            "best_min_samples_leaf": [int(best["min_samples_leaf"])],
            "cv_neg_mse": [results[best_i]],
            "n_folds": [int(n_splits)],
            "test_mse": [mse],
            "test_mae": [mae],
            "test_r2": [r2],
        }
    )


def ml_optimize_params(
    df: DataFrame,
    key_col: str,
    ts_s_col: str,
    value_col: str,
    n_lags: int = 1,
    param_grid: dict | None = None,
    n_splits: int = 5,
    regressor: str = "rf",
) -> DataFrame:
    """Distributed M4: one grid-search kernel per series (embarrassingly
    parallel — the reference runs GridSearchCV single-node with
    n_jobs=-1; here every series' whole grid is one task)."""
    key_field = [f for f in df.schema.fields if f.name == key_col][0]
    schema = StructType([key_field] + OPT_SCHEMA_FIELDS)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import zlib

        key = pdf[key_col].iloc[0]
        seed = zlib.crc32(str(key).encode()) % (2**31)
        out = optimize_params_pdf(
            pdf.rename(columns={ts_s_col: "ts_s", value_col: "value"}),
            n_lags=n_lags, param_grid=param_grid, n_splits=n_splits,
            regressor=regressor, seed=seed,
        )
        out.insert(0, key_col, key)
        return out

    sel = kernel_partition(df.select(key_col, ts_s_col, value_col), key_col)
    return sel.groupBy(key_col).applyInPandas(kernel, schema)
