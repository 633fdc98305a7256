"""Rolling-origin forecast backtesting for tier rollup series.

Hyndman & Athanasopoulos §5.8 "time series cross-validation": evaluate a
forecaster by walking the origin forward and scoring each one-step-ahead
prediction against the realized value.  Here the two classical
zero-parameter baselines every forecasting study must beat:

* seasonal naive  ŷ_t = y_{t−season}   (e.g. same hour yesterday)
* naive-1         ŷ_t = y_{t−step}     (last observation)

and the MASE-style skill ratio MAE_seasonal / MAE_naive1 (< 1 means the
seasonal structure is real).  The Holt-Winters kernel gives the model
forecast; this gives the evaluation harness and its baselines.

Wall-time formulation: predictions come from EQUI-JOINS on (key,
t − season) / (key, t − step), not row-offset lags — a gappy rollup
series stays correct (a missing yesterday-hour simply yields no eval
row).  Both engines therefore see the identical eval set: rows where
BOTH baselines have a source observation.

Scale: two self-equi-joins on (key, shifted time) + one
map-side-combinable agg per key — Catalyst plans them as ordinary hash
joins on the rollup table (rows ∝ time span per key, not event volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["seasonal_naive_backtest"]


def seasonal_naive_backtest(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    season_s: int = 86_400,
    step_s: int = 3_600,
) -> DataFrame:
    """Per-key MAE/RMSE of the seasonal-naive and naive-1 baselines over
    the common eval set, plus the skill ratio (round(4) emits).

    Output: keys + n_evals, mae_seasonal, rmse_seasonal, mae_naive1,
    rmse_naive1, skill (mae_seasonal / mae_naive1).
    """
    cur = df.select(*key_cols, F.col(t_col).alias("_t"), F.col(v_col).alias("_y"))
    season = df.select(
        *key_cols,
        (F.col(t_col) + F.lit(season_s)).alias("_t"),
        F.col(v_col).alias("_yhat_s"),
    )
    naive = df.select(
        *key_cols,
        (F.col(t_col) + F.lit(step_s)).alias("_t"),
        F.col(v_col).alias("_yhat_1"),
    )
    j = cur.join(season, [*key_cols, "_t"]).join(naive, [*key_cols, "_t"])
    es = F.col("_y") - F.col("_yhat_s")
    e1 = F.col("_y") - F.col("_yhat_1")
    out = j.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_evals"),
        F.avg(F.abs(es)).alias("_mae_s"),
        F.sqrt(F.avg(es * es)).alias("_rmse_s"),
        F.avg(F.abs(e1)).alias("_mae_1"),
        F.sqrt(F.avg(e1 * e1)).alias("_rmse_1"),
    )
    return out.select(
        *key_cols,
        "n_evals",
        F.round("_mae_s", 4).alias("mae_seasonal"),
        F.round("_rmse_s", 4).alias("rmse_seasonal"),
        F.round("_mae_1", 4).alias("mae_naive1"),
        F.round("_rmse_1", 4).alias("rmse_naive1"),
        F.round(F.col("_mae_s") / F.col("_mae_1"), 4).alias("skill"),
    )
