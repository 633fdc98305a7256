"""Holt–Winters additive triple exponential smoothing per key — the
forecasting companion to the tier rollups (classical_decompose gives the
retrospective split; this gives the forward view a retention-tier
dashboard plots past the last rollup point).

Recurrence (additive seasonality, period m; Hyndman & Athanasopoulos,
"Forecasting: Principles and Practice" §8.3 — public textbook form):

    l_t = α (y_t − s_{t−m}) + (1 − α)(l_{t−1} + b_{t−1})
    b_t = β (l_t − l_{t−1}) + (1 − β) b_{t−1}
    s_t = γ (y_t − l_{t−1} − b_{t−1}) + (1 − γ) s_{t−m}
    ŷ_{t+h} = l_t + h·b_t + s_{t+h−m⌈h/m⌉}

Initialization: l_0 = mean of the first season, b_0 = (mean of season 2 −
mean of season 1)/m, s_j = y_j − l_0 for the first season — the standard
"simple" initialization, deterministic and replicated exactly by the
pytest numpy oracle.

The recursion is inherently sequential per key (each level feeds the
next step), so this is a grouped Arrow kernel (applyInPandas) — the
documented last-resort tier of the operator hierarchy.  State is O(m)
per key and the kernel streams one series per group; partition width is
pinned with session.kernel_partition by the caller, and
operators/chunking.py's halo pattern does NOT apply (the dependency
chain spans the whole series by definition — a 10⁹-point single key
should be pre-aggregated to a coarser tier first, which is exactly what
the tier cascade provides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["holt_winters", "hw_fit_numpy"]


def hw_fit_numpy(
    y: np.ndarray,
    period: int,
    alpha: float,
    beta: float,
    gamma: float,
    horizon: int,
):
    """Reference-grade plain-numpy Holt–Winters: returns (fitted, forecast).

    ``fitted[t]`` is the one-step-ahead prediction of y_t made at t−1
    (NaN for the first season used by initialization).
    """
    n = len(y)
    if n < 2 * period:
        raise ValueError("need >= 2 seasons of data")
    lvl = float(np.mean(y[:period]))
    trend = float((np.mean(y[period : 2 * period]) - np.mean(y[:period])) / period)
    season = (y[:period] - lvl).astype("float64").copy()
    fitted = np.full(n, np.nan)
    for t in range(period, n):
        s_prev = season[t % period]
        fitted[t] = lvl + trend + s_prev
        # ADVICE r3: the seasonal update must use the PRIOR trend b_{t-1}
        # (Hyndman §8.3 form cited in the module docstring), not the
        # just-updated b_t — save both priors before updating.
        l_prev, b_prev = lvl, trend
        lvl = alpha * (y[t] - s_prev) + (1 - alpha) * (lvl + trend)
        trend = beta * (lvl - l_prev) + (1 - beta) * trend
        season[t % period] = gamma * (y[t] - l_prev - b_prev) + (1 - gamma) * s_prev
    fc = np.array(
        [
            lvl + h * trend + season[(n + h - 1) % period]
            for h in range(1, horizon + 1)
        ]
    )
    return fitted, fc


def holt_winters(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 24,
    step: int | None = None,
) -> DataFrame:
    """Per-key fitted values + ``horizon`` forecast rows.

    Output: key cols + (ts, kind, y, yhat) where kind is 'fit' for
    observed timestamps (y present, yhat = one-step-ahead prediction) and
    'fc' for the forecast horizon (y null); forecast timestamps continue
    at ``step`` (default: the series' modal spacing).
    """
    from diive_spark.session import kernel_partition

    key_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"{c} {key_types[c]}" for c in key_cols]
        + [f"{ts_col} long", "kind string", "y double", "yhat double"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype="float64")
        ts = pdf[ts_col].to_numpy(dtype="int64")
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        if len(y) < 2 * period:
            return pd.DataFrame(
                columns=[*key_cols, ts_col, "kind", "y", "yhat"]
            ).astype({ts_col: "int64"})
        fitted, fc = hw_fit_numpy(y, period, alpha, beta, gamma, horizon)
        dt = step or int(pd.Series(np.diff(ts)).mode().iloc[0])
        fit_rows = pd.DataFrame(
            {**keys, ts_col: ts, "kind": "fit", "y": y, "yhat": fitted}
        )
        fc_rows = pd.DataFrame(
            {
                **keys,
                ts_col: ts[-1] + dt * np.arange(1, horizon + 1),
                "kind": "fc",
                "y": np.nan,
                "yhat": fc,
            }
        )
        return pd.concat([fit_rows, fc_rows], ignore_index=True)

    pinned = kernel_partition(df.select(*key_cols, ts_col, value_col), *key_cols)
    return pinned.groupBy(*key_cols).applyInPandas(fn, schema=schema)
