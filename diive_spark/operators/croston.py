"""Croston's method for intermittent series, in closed form.

Croston (Operational Research Quarterly 23(3), 1972) forecasts an
intermittent demand stream by running TWO simple exponential smoothers —
one over the non-zero demand sizes z_j, one over the inter-arrival gaps
p_j (in steps) — and forecasting demand-per-step as ẑ/p̂.

SES after m observations has the closed form

    l_m = (1−α)^(m−1)·x_1 + α·Σ_{j=2..m} (1−α)^(m−j)·x_j

so the whole method is ONE weighted aggregate per key: no recursion, no
kernel, no driver loop — the same closed-form-SES device the theta
forecaster in this repo uses (operators/theta.py pattern).  Weights decay
geometrically, so terms older than ~-53/log2(1−α) steps underflow to
exact 0.0 identically in both engines.

diive counterpart: none — diive's gap-filling assumes dense sensor
series; a crawl/event stream where most steps carry no demand (purchases
among views) is the intermittent case Croston was built for.

Scale shape: two `row_number` windows per key (event step index, demand
index — the repo-standard per-key series order) and one combinable
groupBy.  State per key is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["croston"]


def croston(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    demand_col: str,
    alpha: float = 0.2,
) -> DataFrame:
    """Per key: n_demands m, SES'd demand size ẑ, SES'd inter-arrival
    gap p̂ (steps), and the Croston forecast ẑ/p̂ (demand per step).
    ``demand_col`` is NULL/0 on non-demand steps.  Keys with m < 2 are
    dropped (no interval to smooth)."""
    wall = Window.partitionBy(key_col).orderBy(*order_cols)
    stepped = df.select(
        key_col,
        F.row_number().over(wall).alias("step"),
        F.col(demand_col).alias("z"),
    )
    dem = stepped.where(F.col("z").isNotNull() & (F.col("z") != 0))
    wd = Window.partitionBy(key_col).orderBy("step")
    dem = dem.select(
        key_col,
        "z",
        F.row_number().over(wd).alias("j"),
        (F.col("step") - F.lag("step").over(wd)).alias("p"),
        F.count("*").over(Window.partitionBy(key_col)).alias("m"),
    ).where(F.col("m") >= 2)
    om = F.lit(1.0 - alpha)
    a = F.lit(float(alpha))
    wz = F.when(
        F.col("j") == 1, F.pow(om, F.col("m") - 1)
    ).otherwise(a * F.pow(om, F.col("m") - F.col("j")))
    # gaps exist for j >= 2 (m−1 of them); the smoother starts at j=2
    wp = F.when(
        F.col("j") == 2, F.pow(om, F.col("m") - 2)
    ).when(F.col("j") >= 3, a * F.pow(om, F.col("m") - F.col("j")))
    out = dem.groupBy(key_col).agg(
        F.max("m").cast("long").alias("m"),
        F.sum(wz * F.col("z")).alias("zhat"),
        F.sum(wp * F.col("p")).alias("phat"),
    )
    return out.select(
        key_col,
        "m",
        F.floor(F.col("zhat") * 100 + F.lit(0.5)).cast("long").alias(
            "zhat_e2"
        ),
        F.floor(F.col("phat") * 1e4 + F.lit(0.5)).cast("long").alias(
            "phat_e4"
        ),
        F.floor(F.col("zhat") / F.col("phat") * 1e4 + F.lit(0.5))
        .cast("long")
        .alias("forecast_e4"),
    )
