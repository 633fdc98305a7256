"""Lookup-table gap-fill registry: MDS over the hourly purchase series.

Target = hourly mean purchase value on the COMPLETE hour grid (the
sf0.01 events table leaves ~47 of 720 hours with no purchase — natural
gaps); covariates = hourly click/view means (the 'meteo drivers').
Hourly means are pre-rounded to 4 decimals so the tolerance-band
candidate sets are comparisons of identical doubles on both engines;
the filled value floor-scales at e2 (mean-of-means, coarser per
working-notes convention).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diive_spark.operators.mds import mds_gapfill


def _epoch_s(col: str) -> F.Column:
    return F.floor(
        F.unix_micros(F.col(col).cast("timestamp")) / 1_000_000
    ).cast("long")


_TOL = 10.0
_W1 = 72    # ±3 days (hours)
_W2 = 168   # ±7 days


def q_mds_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hr = F.floor(_epoch_s("ts") / 3600).cast("long").alias("hr")
    # target carried as an exact e4 INTEGER (sf0.001 sweep): the fill is
    # avg(tgt) over a candidate set, and engine avg() over doubles differs
    # by a sum-order ulp exactly at the .xx5 floor boundary the e2 output
    # lands on.  Over BIGINTs both engines compute exact-sum/count — one
    # correctly-rounded division, bit-identical.
    h = ev.groupBy(hr).agg(
        F.round(
            F.round(
                F.avg(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                ),
                4,
            )
            * 10000
        )
        .cast("long")
        .alias("tgt"),
        F.round(F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 4)
        .alias("cov1"),
        F.round(F.avg(F.when(F.col("event_type") == "view", F.col("value"))), 4)
        .alias("cov2"),
    )
    rng = h.agg(F.min("hr").alias("_lo"), F.max("hr").alias("_hi"))
    grid = rng.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("hr")
    )
    g = grid.join(h, "hr", "left")
    out = mds_gapfill(
        g,
        key_cols=[],
        ts_col="hr",
        target_col="tgt",
        cov_cols=["cov1", "cov2"],
        tolerances=[_TOL, _TOL],
        window_1=_W1,
        window_2=_W2,
        cycle=24,
        min_n=2,
    )
    return out.select(
        (F.col("hr") * 3600).cast("long").alias("ts_s"),
        # y is in e4-integer target scale; e2 output = y / 100
        F.floor(F.col("y") / F.lit(100.0) + F.lit(0.5)).cast("long").alias("y_e2"),
        "mds_flag",
        "n_used",
    ).orderBy("ts_s")


SQL_MDS_GAPFILL = f"""
WITH h AS (
  -- tgt as exact e4 BIGINT, mirrors Spark (see query docstring)
  SELECT CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS hr,
         CAST(round(round(avg(CASE WHEN event_type = 'purchase'
                               THEN value END), 4) * 10000)
              AS BIGINT) AS tgt,
         round(avg(CASE WHEN event_type = 'click' THEN value END), 4) AS cov1,
         round(avg(CASE WHEN event_type = 'view' THEN value END), 4) AS cov2
  FROM events GROUP BY 1
), grid AS (
  SELECT UNNEST(range((SELECT min(hr) FROM h), (SELECT max(hr) FROM h) + 1)) AS hr
), g AS (
  SELECT grid.hr, h.tgt, h.cov1, h.cov2 FROM grid LEFT JOIN h ON h.hr = grid.hr
), obs AS (SELECT * FROM g WHERE tgt IS NOT NULL),
gaps AS (SELECT * FROM g WHERE tgt IS NULL),
t1 AS (
  SELECT ga.hr, avg(o.tgt) AS f1, CAST(count(*) AS BIGINT) AS n1
  FROM gaps ga JOIN obs o ON abs(ga.hr - o.hr) <= {_W1}
   AND abs(ga.cov1 - o.cov1) <= {_TOL} AND abs(ga.cov2 - o.cov2) <= {_TOL}
  GROUP BY 1
), t2 AS (
  SELECT ga.hr, avg(o.tgt) AS f2, CAST(count(*) AS BIGINT) AS n2
  FROM gaps ga JOIN obs o ON abs(ga.hr - o.hr) <= {_W2}
   AND abs(ga.cov1 - o.cov1) <= {_TOL} AND abs(ga.cov2 - o.cov2) <= {_TOL}
  GROUP BY 1
), t3 AS (
  SELECT ga.hr, avg(o.tgt) AS f3, CAST(count(*) AS BIGINT) AS n3
  FROM gaps ga JOIN obs o ON abs(ga.hr - o.hr) <= {_W1}
   AND abs(ga.cov1 - o.cov1) <= {_TOL}
  GROUP BY 1
), t4 AS (
  SELECT ga.hr, avg(o.tgt) AS f4, CAST(count(*) AS BIGINT) AS n4
  FROM gaps ga JOIN obs o ON abs(ga.hr - o.hr) <= {_W2}
   AND ((ga.hr % 24 - o.hr % 24 + 24) % 24) IN (0, 1, 23)
  GROUP BY 1
)
SELECT g.hr * 3600 AS ts_s,
       CAST(floor((CASE WHEN g.tgt IS NOT NULL THEN CAST(g.tgt AS DOUBLE)
            WHEN n1 >= 2 THEN f1 WHEN n2 >= 2 THEN f2
            WHEN n3 >= 2 THEN f3 WHEN n4 >= 2 THEN f4 END)
            / 100.0 + 0.5) AS BIGINT) AS y_e2,
       CAST(CASE WHEN g.tgt IS NOT NULL THEN 0
            WHEN n1 >= 2 THEN 1 WHEN n2 >= 2 THEN 2
            WHEN n3 >= 2 THEN 3 WHEN n4 >= 2 THEN 4 ELSE 9 END AS INT) AS mds_flag,
       CAST(CASE WHEN g.tgt IS NOT NULL THEN 0
            WHEN n1 >= 2 THEN n1 WHEN n2 >= 2 THEN n2
            WHEN n3 >= 2 THEN n3 WHEN n4 >= 2 THEN n4 ELSE 0 END AS BIGINT) AS n_used
FROM g
LEFT JOIN t1 ON t1.hr = g.hr
LEFT JOIN t2 ON t2.hr = g.hr
LEFT JOIN t3 ON t3.hr = g.hr
LEFT JOIN t4 ON t4.hr = g.hr
ORDER BY ts_s
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "mds_gapfill": q_mds_gapfill,
}

ORACLE_SQL: dict[str, str] = {
    "mds_gapfill": SQL_MDS_GAPFILL,
}
