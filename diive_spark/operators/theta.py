"""Theta-method forecasting (Assimakopoulos & Nikolopoulos 2000).

The M3-competition-winning Theta method with the standard two theta
lines (0, 2) is EXACTLY simple exponential smoothing with an added
drift of half the OLS trend slope (Hyndman & Billah 2003, "Unmasking
the Theta method", IJF 19(2), eq. 2):

    yhat_{T+h} = l_T + (b/2) * (h - 1 + 1/a - (1-a)^T / a)

where ``b`` is the least-squares slope of ``y`` on ``1..T`` and ``l_T``
the SES level at the end of the sample.  This closed form is what makes
the operator ORACLE-EXPRESSIBLE: the SES recursion

    l_t = a*y_t + (1-a)*l_{t-1},   l_1 = y_1

unrolls to the finite weighted sum

    l_T = sum_{t=2..T} a*(1-a)^(T-t) * y_t  +  (1-a)^(T-1) * y_1

— no recursion left, just one per-key aggregate.  With ``alpha=0.5``
every weight is an exact power of two, so the only cross-engine
divergence is double-summation order (~1 ulp), absorbed by the e4
floor-scale.

Scale notes: two exchanges total — one per-key window (row_number +
max) and one per-key aggregate; the horizon fan-out explodes a
constant-size array on the tiny per-key result.  No collect, no
iteration (unlike Holt-Winters, which stays a kernel).

Reference parity: complements `hw_forecast` (rows-only kernel) with a
declarative, oracle-checkable forecaster, per SURVEY §2.11.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["theta_forecast"]


def theta_forecast(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    horizon: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-key Theta(0,2) forecasts for ``h = 1..horizon``.

    Output: key cols + ``h`` (BIGINT), ``yhat_e4`` (floor-scaled
    forecast), ``n_obs`` (series length used).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    wk = Window.partitionBy(*keys)
    b = df.select(
        *keys,
        F.col(value_col).alias("_y"),
        F.row_number().over(w).alias("_rn"),
    ).withColumn("_T", F.max("_rn").over(wk))
    a = F.lit(float(alpha))
    one_m_a = F.lit(1.0 - alpha)
    # SES unrolled: weight(rn) = a*(1-a)^(T-rn) for rn>=2, (1-a)^(T-1) for rn=1
    weight = F.when(
        F.col("_rn") == 1, F.pow(one_m_a, F.col("_T") - 1)
    ).otherwise(a * F.pow(one_m_a, F.col("_T") - F.col("_rn")))
    fit = b.groupBy(*keys).agg(
        F.sum(weight * F.col("_y")).alias("_level"),
        F.regr_slope(F.col("_y"), F.col("_rn").cast("double")).alias("_b"),
        F.max("_rn").cast("long").alias("n_obs"),
    )
    h = F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h")
    out = fit.select(*keys, "_level", "_b", "n_obs", h)
    yhat = F.col("_level") + (F.col("_b") / F.lit(2.0)) * (
        F.col("h") - 1
        + F.lit(1.0) / a
        - F.pow(one_m_a, F.col("n_obs")) / a
    )
    return out.select(
        *keys,
        F.col("h").cast("long").alias("h"),
        F.floor(yhat * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("yhat_e4"),
        "n_obs",
    )
