"""Gap-timeout sessionization — the classic web-log time-series operator
(TimescaleDB ``session``-gap pattern; no diive analog — part of the
web-scale surface the north rule adds on top of the reference pipeline).

Fully declarative: one window pass assigns session indexes (lag → gap
flag → running sum), one grouped aggregation produces per-session stats.
Both stages shuffle once on the session key and stay inside whole-stage
codegen — no Python, no collects; at 10^12 rows the cost is one shuffle
partitioned by ``key_col``, which is the minimum any sessionizer pays.

Skew note: a single hot key (one bot user with 10^9 events) serializes
its own window chain by definition (sessions are a per-key prefix scan).
For that regime pre-split hot keys by day first (sessions never span a
day at sane timeouts) — the same (day, key) sharding the tier store uses
(plans/tiers.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    timeout: float,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign 1-based session indexes per key: a new session starts when
    the gap to the previous event of the same key exceeds ``timeout``
    (same unit as ``ts_col``, typically epoch seconds).

    Ties on ``ts_col`` within a key never split a session (gap 0).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    is_new = F.when(
        gap.isNull() | (gap > F.lit(timeout)), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    timeout: float,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Sessionize then roll up one row per (key, session):
    start/end/duration/n_events plus any caller aggregates."""
    s = sessionize(df, key_col, ts_col, timeout)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ]
    if extra_aggs:
        aggs.extend(extra_aggs)
    return s.groupBy(key_col, "session_idx").agg(*aggs)
