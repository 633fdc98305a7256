"""Burstiness and memory of inter-event time sequences.

Goh & Barabasi (EPL 2008) characterize an event stream by two numbers
over its inter-event gap sequence g_1..g_m:

    B = (sigma - mu) / (sigma + mu)        burstiness, in [-1, 1]
        (-1 periodic, 0 Poisson, ->1 extremely bursty)
    M = corr(g_i, g_{i+1})                 memory coefficient

Both are the first diagnostics for crawl/recrawl scheduling and event
tier sizing (how bursty is each key's write pattern).  The reference's
closest operator is the gap-length analysis in GapFinder
(``core/times/gapfinder.py``), which reports gap runs but no
distributional summary.

Exactness posture: gaps are INTEGER seconds, so every moment the two
statistics need (sum, sum of squares, lagged cross products) is an
exact BIGINT aggregate — B and M are then single double expressions
over exact integers, bit-identical across engines (the same trick as
operators/multires.py).

Scale posture: one per-key ordered window (lag) producing the gap and
its successor, then one combinable groupBy — no partition-less window,
state bounded per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def burstiness_memory(
    df: DataFrame,
    key_col: str,
    ts_s_col: str,
    order_cols: list[str] | None = None,
    min_gaps: int = 3,
) -> DataFrame:
    """Per-key burstiness B and memory M over integer-second gaps.

    ``order_cols`` breaks timestamp ties deterministically (defaults to
    the timestamp alone).  Keys with fewer than ``min_gaps`` gaps are
    dropped; M is null when either lagged series is constant.

    Returns ``(key, n_gaps, b, m)`` — b/m doubles computed from exact
    integer moments.
    """
    order = order_cols or [ts_s_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    # _i is the deterministic event sequence index — BOTH windows order by
    # it (timestamps can tie within a key; order_cols break the tie once).
    t = F.col(ts_s_col).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        F.row_number().over(w).alias("_i"),
        (t - F.lag(t).over(w)).alias("_g"),
    )
    gaps = base.filter(F.col("_g").isNotNull())
    wg = Window.partitionBy("key").orderBy("_i")
    lagged = gaps.withColumn("_gn", F.lead("_g").over(wg))
    agg = lagged.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("_g").alias("_s"),
        F.sum(F.col("_g") * F.col("_g")).alias("_q"),
        # lag-1 pair moments (pairs where a successor exists)
        F.count("_gn").alias("_m"),
        F.sum(F.when(F.col("_gn").isNotNull(), F.col("_g"))).alias("_sx"),
        F.sum("_gn").alias("_sy"),
        F.sum(
            F.when(F.col("_gn").isNotNull(), F.col("_g") * F.col("_g"))
        ).alias("_qx"),
        F.sum(F.col("_gn") * F.col("_gn")).alias("_qy"),
        F.sum(F.col("_g") * F.col("_gn")).alias("_pxy"),
    )
    n = F.col("n_gaps").cast("double")
    mu = F.col("_s") / n
    var = F.col("_q") / n - mu * mu
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    m = F.col("_m").cast("double")
    cov = F.col("_pxy") / m - (F.col("_sx") / m) * (F.col("_sy") / m)
    vx = F.col("_qx") / m - (F.col("_sx") / m) * (F.col("_sx") / m)
    vy = F.col("_qy") / m - (F.col("_sy") / m) * (F.col("_sy") / m)
    return (
        agg.filter(F.col("n_gaps") >= min_gaps)
        .select(
            "key",
            "n_gaps",
            F.when(sd + mu > 0, (sd - mu) / (sd + mu)).alias("b"),
            F.when(
                (F.col("_m") >= 2) & (vx > 0) & (vy > 0),
                cov / F.sqrt(vx * vy),
            ).alias("m"),
        )
    )
