"""Declarative forecasting + multi-resolution OLAP rollup registry.

``theta_forecast`` — the M3-winning Theta method as a pure DataFrame
job (operators/theta.py; closed-form SES + half-slope drift), the
oracle-checkable complement to the sequential `hw_forecast` kernel.

``rollup_sources`` — one-pass multi-resolution continuous aggregate
over the documents corpus via ROLLUP grouping sets (source×lang →
source → grand total), the classic hypertable rollup shape: Spark
computes all three resolutions in a single exchange (Expand + one
hash aggregate), instead of three scans.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diive_spark.operators.theta import theta_forecast


def _epoch_s(col: str) -> F.Column:
    return F.floor(
        F.unix_micros(F.col(col).cast("timestamp")) / 1_000_000
    ).cast("long")


# ---------------------------------------------------------------------------
# theta_forecast — 24-step Theta(0,2) per event type over hourly means
# ---------------------------------------------------------------------------

_THETA_H = 24


def q_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        F.floor(_epoch_s("ts") / 3600).cast("long").alias("hr"),
    ).agg(F.round(F.avg("value"), 4).alias("y"))
    out = theta_forecast(
        hourly, ["event_type"], ts_col="hr", value_col="y",
        horizon=_THETA_H, alpha=0.5,
    )
    return out.orderBy("event_type", "h")


SQL_THETA_FORECAST = f"""
WITH h AS (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS hr,
         round(avg(value), 4) AS y
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn,
         count(*) OVER (PARTITION BY event_type) AS T
  FROM h
), fit AS (
  SELECT event_type,
         sum((CASE WHEN rn = 1 THEN pow(0.5, T - 1)
              ELSE 0.5 * pow(0.5, T - rn) END) * y) AS lvl,
         regr_slope(y, CAST(rn AS DOUBLE)) AS b,
         CAST(max(rn) AS BIGINT) AS n_obs
  FROM r GROUP BY 1
)
SELECT event_type, CAST(hs.h AS BIGINT) AS h,
       CAST(floor((lvl + (b / 2.0) * (hs.h - 1 + 1.0 / 0.5 - pow(0.5, n_obs) / 0.5))
            * 10000.0 + 0.5) AS BIGINT) AS yhat_e4,
       n_obs
FROM fit, (SELECT UNNEST(range(1, {_THETA_H + 1})) AS h) hs
ORDER BY event_type, h
"""


# ---------------------------------------------------------------------------
# rollup_sources — source×lang / source / total corpus stats in ONE pass
# ---------------------------------------------------------------------------

def q_rollup_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.rollup("source", "lang").agg(
        (F.grouping("source") * 2 + F.grouping("lang")).cast("int").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.floor(F.sum("n_chars") * F.lit(100.0) / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("avg_chars_e2"),
    )
    return out.select(
        F.coalesce("source", F.lit("<all>")).alias("source"),
        F.coalesce("lang", F.lit("<all>")).alias("lang"),
        "gid", "n_docs", "sum_chars", "avg_chars_e2",
    ).orderBy("gid", "source", "lang")


SQL_ROLLUP_SOURCES = """
SELECT COALESCE(source, '<all>') AS source,
       COALESCE(lang, '<all>') AS lang,
       CAST(GROUPING(source) * 2 + GROUPING(lang) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(floor(sum(n_chars) * 100.0 / count(*) + 0.5) AS BIGINT) AS avg_chars_e2
FROM documents
GROUP BY ROLLUP (source, lang)
ORDER BY gid, source, lang
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "theta_forecast": q_theta_forecast,
    "rollup_sources": q_rollup_sources,
}

ORACLE_SQL: dict[str, str] = {
    "theta_forecast": SQL_THETA_FORECAST,
    "rollup_sources": SQL_ROLLUP_SOURCES,
}
