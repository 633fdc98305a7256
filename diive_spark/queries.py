"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB-runnable ANSI-SQL
oracle string with IDENTICAL column names and (rounded) values.

Conventions for driver-compare robustness:
  * window/bucket timestamps are emitted as BIGINT epoch seconds
    (``*_s`` columns) — avoids timestamp-type mismatches across engines;
  * every float column is ``round(x, N)`` in BOTH engines (aggregation order
    differs, so raw float bits may differ at ~1e-15 relative);
  * counts are cast to BIGINT explicitly.

Each query's docstring cites the reference operator it re-expresses
(SURVEY.md §2 row ids).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.operators.resample import resample_gated
from diive_spark.operators.sanitize import dedup_keep_last

EPS = 1e-9


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _epoch_s(col) -> F.Column:
    """Epoch seconds (floor) of a timestamp column — engine-portable."""
    return F.floor(F.unix_micros(F.col(col).cast("timestamp")) / 1_000_000)


# ---------------------------------------------------------------------------
# A1/A2 — min-count-gated resample (resampling.py:13-132)
# ---------------------------------------------------------------------------

def q_resample_30min_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min downsample of event values per user with the reference's
    min-count gate (SURVEY §2.3 A1; mincounts_perc=0.25 as used by
    meteoscreening.py:485)."""
    ev = _events(spark, sf_dir).select(
        F.col("user_id").cast("long").alias("user_id"), "ts", "value"
    )
    out = resample_gated(
        ev,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        bucket_seconds=1800,
        mincounts_perc=0.25,
    )
    return out.select(
        "user_id",
        _epoch_s("window_end").cast("long").alias("window_end_s"),
        F.round("agg_mean", 4).alias("agg_mean"),
        F.round("agg_sum", 4).alias("agg_sum"),
        F.col("n_vals").cast("long").alias("n_vals"),
    )


SQL_RESAMPLE_30MIN = """
WITH binned AS (
  SELECT user_id,
         (CAST(floor(epoch(ts) / 1800) AS BIGINT) + 1) * 1800 AS window_end_s,
         value
  FROM events
), agg AS (
  SELECT user_id, window_end_s,
         avg(value) AS agg_mean,
         sum(value) AS agg_sum,
         count(value) AS n_vals,
         count(*) AS n_slots
  FROM binned GROUP BY 1, 2
), gated AS (
  SELECT *, max(n_slots) OVER (PARTITION BY user_id) AS maxcount FROM agg
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       window_end_s,
       round(agg_mean, 4) AS agg_mean,
       round(agg_sum, 4) AS agg_sum,
       CAST(n_vals AS BIGINT) AS n_vals
FROM gated
WHERE n_vals >= CASE WHEN floor(maxcount * 0.25) < 3 THEN 1
                     ELSE floor(maxcount * 0.25) END
"""


# ---------------------------------------------------------------------------
# P6 — dedup keep-last (times.py:804-821)
# ---------------------------------------------------------------------------

def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp dedup, keep the record with the highest ingest order
    (event_id as file order) per (user_id, ts) (SURVEY §2.2 P6)."""
    ev = _events(spark, sf_dir)
    out = dedup_keep_last(ev, "user_id", "ts", order_col="event_id")
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        _epoch_s("ts").cast("long").alias("ts_s"),
        F.round("value", 4).alias("value"),
    )


SQL_DEDUP_KEEP_LAST = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
       round(value, 4) AS value
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# A6 — per-series summary stats (stats.py:70-103)
# ---------------------------------------------------------------------------

def q_sstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series summary statistics: count/mean/std/var/sum/median/min/max
    + exact percentiles (SURVEY §2.3 A6 `sstats`)."""
    ev = _events(spark, sf_dir)
    out = ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count("value").cast("long").alias("n_vals"),
        F.round(F.avg("value"), 4).alias("mean"),
        F.round(F.stddev_samp("value"), 4).alias("sd"),
        F.round(F.var_samp("value"), 4).alias("var"),
        F.round(F.sum("value"), 4).alias("sum"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median"),
        F.round(F.min("value"), 4).alias("min"),
        F.round(F.max("value"), 4).alias("max"),
        F.round(F.expr("percentile(value, 0.05)"), 4).alias("p05"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )
    return out


SQL_SSTATS = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(value) AS BIGINT) AS n_vals,
       round(avg(value), 4) AS mean,
       round(stddev_samp(value), 4) AS sd,
       round(var_samp(value), 4) AS var,
       round(sum(value), 4) AS sum,
       round(quantile_cont(value, 0.5), 4) AS median,
       round(min(value), 4) AS min,
       round(max(value), 4) AS max,
       round(quantile_cont(value, 0.05), 4) AS p05,
       round(quantile_cont(value, 0.95), 4) AS p95
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "resample_30min_gated": q_resample_30min_gated,
    "dedup_keep_last": q_dedup_keep_last,
    "sstats": q_sstats,
}

ORACLE_SQL: dict[str, str] = {
    "resample_30min_gated": SQL_RESAMPLE_30MIN,
    "dedup_keep_last": SQL_DEDUP_KEEP_LAST,
    "sstats": SQL_SSTATS,
}
