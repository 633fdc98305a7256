"""Time-series query registry, part 2: as-of join, LTTB downsampling,
and mergeable-sketch distinct tiers — the ts-engine surface beyond the
reference's own pipeline (kdb `aj` / TimescaleDB `time_bucket` world).

The as-of oracle uses DuckDB's NATIVE ``ASOF JOIN`` — a completely
independent implementation of the same semantics, so the compare
validates the union+carry-forward formulation, not shared code.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diive_spark.operators.asofjoin import asof_join_backward


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _epoch_s(col: str) -> F.Column:
    return F.floor(
        F.unix_micros(F.col(col).cast("timestamp")) / 1_000_000
    ).cast("long")


# ---------------------------------------------------------------------------
# asof_join_events — for each click, the latest at-or-before view per user
# ---------------------------------------------------------------------------

_ASOF_TOL_S = 3600  # 1 h


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", _epoch_s("ts").alias("ts_s"),
        "event_type", "value",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_s", "event_id", F.col("value").alias("click_value")
    )
    # right side must be unique per (user, second): keep the max event_id
    # (second-truncation can collide micro-distinct rows)
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts_s")
        .agg(
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    out = asof_join_backward(
        clicks,
        views,
        on="ts_s",
        by="user_id",
        value_cols=["view_value"],
        tolerance=_ASOF_TOL_S,
    )
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "ts_s",
        F.round("click_value", 4).alias("click_value"),
        F.round("asof_view_value", 4).alias("asof_view_value"),
        F.col("asof_ts_s").cast("long").alias("asof_ts_s"),
    ).orderBy("event_id")


SQL_ASOF_JOIN = f"""
WITH ev AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_type, value
  FROM events
), clicks AS (
  SELECT user_id, ts_s, event_id, value AS click_value FROM ev
  WHERE event_type = 'click'
), views AS (
  SELECT user_id, ts_s, max_by(value, event_id) AS view_value
  FROM ev WHERE event_type = 'view' GROUP BY user_id, ts_s
), j AS (
  SELECT c.event_id, c.user_id, c.ts_s, c.click_value,
         v.view_value, v.ts_s AS v_ts_s
  FROM clicks c ASOF LEFT JOIN views v
    ON c.user_id = v.user_id AND c.ts_s >= v.ts_s
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id, ts_s,
       round(click_value, 4) AS click_value,
       CASE WHEN v_ts_s IS NOT NULL AND ts_s - v_ts_s <= {_ASOF_TOL_S}
            THEN round(view_value, 4) END AS asof_view_value,
       CASE WHEN v_ts_s IS NOT NULL AND ts_s - v_ts_s <= {_ASOF_TOL_S}
            THEN CAST(v_ts_s AS BIGINT) END AS asof_ts_s
FROM j ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# lttb_downsample — shape-preserving visualization downsample (rows-only:
# the pick-dependent selection loop is not SQL-expressible; exactness is
# pinned kernel==distributed in tests/test_lttb_hll.py)
# ---------------------------------------------------------------------------

def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.lttb import lttb_downsample

    ev = _events(spark, sf_dir).select(
        F.col("user_id"), _epoch_s("ts").alias("ts_s"), "value"
    )
    out = lttb_downsample(
        ev, key_col="user_id", x_col="ts_s", y_col="value", n_out=20
    )
    return out.select(
        "user_id", "ts_s", F.round("value", 4).alias("value")
    ).orderBy("user_id", "ts_s")


# ---------------------------------------------------------------------------
# tier_distinct_hll — mergeable-sketch distinct counts per tier (rows-only:
# the sketch estimate is engine-specific; the mergeability contract —
# union of minute partials == direct hour sketch, within 2% of exact —
# is asserted in tests/test_lttb_hll.py)
# ---------------------------------------------------------------------------

def q_tier_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        (F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 60_000_000
        )).alias("m"),
        "user_id",
    )
    minute = ev.groupBy("m").agg(F.hll_sketch_agg("user_id").alias("sk"))
    hour = (
        minute.withColumn("h", F.floor(F.col("m") / 60))
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_minutes"),
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("distinct_users_est"),
        )
    )
    return hour.select(
        F.col("h").cast("long").alias("hour_idx"),
        "n_minutes",
        "distinct_users_est",
    ).orderBy("hour_idx")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "asof_join_events": q_asof_join,
    "lttb_downsample": q_lttb_downsample,
    "tier_distinct_hll": q_tier_distinct_hll,
}

ORACLE_SQL: dict[str, str] = {
    "asof_join_events": SQL_ASOF_JOIN,
}
