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
not available in this container, so the kernel uses deterministic ordinary
least squares (numpy ``lstsq``). The PIPELINE semantics (feature set,
fit/predict masks, two-stage fallback, 0/1/2 flags) match; the regressor
is pluggable — swap ``_fit_predict`` for sklearn in production.

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

FILL_SCHEMA_FIELDS = [
    StructField("ts_s", LongType()),
    StructField("value", DoubleType()),
    StructField("value_filled", DoubleType()),
    StructField("flag_fill", ByteType()),
    StructField("cumsum_filled", DoubleType()),
]


def _fit_predict(
    X_train: np.ndarray, y_train: np.ndarray, X_pred: np.ndarray
) -> np.ndarray:
    """Deterministic OLS with intercept (production slot for sklearn RF)."""
    A = np.column_stack([np.ones(len(X_train)), X_train])
    coef, *_ = np.linalg.lstsq(A, y_train, rcond=None)
    return np.column_stack([np.ones(len(X_pred)), X_pred]) @ coef


def fill_series_pdf(
    pdf: pd.DataFrame, n_lags: int = 1, grid_step: int | None = None
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
        filled[pred_mask] = _fit_predict(X[fit_mask], v[fit_mask], X[pred_mask])
        flag[pred_mask] = 1
    rest = (~obs) & np.isnan(filled)
    if obs.sum() >= ts_feats.shape[1] + 1 and rest.any():
        filled[rest] = _fit_predict(ts_feats[obs], v[obs], ts_feats[rest])
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
) -> DataFrame:
    """Distributed per-key gap fill. Input: long frame with an epoch-second
    grid column and a nullable value; output adds filled value + 0/1/2 flag
    + cumulative sum. With ``grid_step`` the full grid is materialized
    inside the kernel (sparse input rows suffice — no upstream grid join)."""
    key_field = [f for f in df.schema.fields if f.name == key_col][0]
    schema = StructType([key_field] + FILL_SCHEMA_FIELDS)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        out = fill_series_pdf(
            pdf.rename(columns={ts_s_col: "ts_s", value_col: "value"}),
            n_lags=n_lags,
            grid_step=grid_step,
        )
        out.insert(0, key_col, key)
        return out

    sel = df.select(key_col, ts_s_col, value_col)
    return sel.groupBy(key_col).applyInPandas(kernel, schema)
