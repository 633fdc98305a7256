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

from diive_spark.operators import flags as FL
from diive_spark.operators import gapfill as GF
from diive_spark.operators import outliers as OU
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


# Same rollup through the SALTED two-phase aggregation (SURVEY §4.1 item 5,
# the hot-key skew path). MUST produce identical results — the oracle is the
# same SQL as the unsalted query, so the driver verifies the skew plan's
# correctness, not just its existence.
def q_resample_30min_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        salt_buckets=8,
    )
    return out.select(
        "user_id",
        _epoch_s("window_end").cast("long").alias("window_end_s"),
        F.round("agg_mean", 4).alias("agg_mean"),
        F.round("agg_sum", 4).alias("agg_sum"),
        F.col("n_vals").cast("long").alias("n_vals"),
    )


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
    + exact percentiles (SURVEY §2.3 A6 `sstats`).

    sf0.1-sweep hardening: the SUM-based columns (mean/sd/var/sum) used
    to be round(avg(value), 4) over raw doubles — engine summation order
    differs by an ulp and 1-in-100k rows land on the round boundary.
    They now derive from exact e4-integer sums (v4 = floor(value*1e4 +
    1/pi)) with floor-scaled integer output, bit-identical at any scale.
    Selection-based columns (min/max/median/percentiles) keep the raw
    metric: their inputs are identical doubles in both engines.
    """
    off = 0.31830988618367
    ev = _events(spark, sf_dir).withColumn(
        "v4", F.floor(F.col("value") * 10_000 + F.lit(off)).cast("long")
    )
    out = ev.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count("value").cast("long").alias("n_vals"),
        F.sum("v4").alias("_s1"),
        F.sum(F.col("v4") * F.col("v4")).alias("_s2"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median"),
        F.round(F.min("value"), 4).alias("min"),
        F.round(F.max("value"), 4).alias("max"),
        F.round(F.expr("percentile(value, 0.05)"), 4).alias("p05"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )
    nd = F.col("n_vals").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    var4 = (s2 - s1 * s1 / nd) / (nd - 1.0) / 10_000.0
    return out.select(
        "user_id",
        "n_vals",
        F.floor(s1 / nd + F.lit(off)).cast("long").alias("mean_e4"),
        F.floor(F.sqrt(var4) * 10_000 + F.lit(off)).cast("long").alias(
            "sd_e4"
        ),
        F.floor(var4 + F.lit(off)).cast("long").alias("var_e4"),
        F.col("_s1").alias("sum_e4"),
        "median", "min", "max", "p05", "p95",
    )


SQL_SSTATS = """
WITH b AS (
  SELECT user_id, value,
         CAST(floor(value * 10000 + 0.31830988618367) AS BIGINT) AS v4
  FROM events
), g AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(count(value) AS BIGINT) AS n_vals,
         CAST(sum(v4) AS BIGINT) AS s1,
         CAST(sum(v4 * v4) AS BIGINT) AS s2,
         round(quantile_cont(value, 0.5), 4) AS median,
         round(min(value), 4) AS min,
         round(max(value), 4) AS max,
         round(quantile_cont(value, 0.05), 4) AS p05,
         round(quantile_cont(value, 0.95), 4) AS p95
  FROM b GROUP BY 1
)
SELECT user_id, n_vals,
       CAST(floor(CAST(s1 AS DOUBLE) / n_vals + 0.31830988618367)
            AS BIGINT) AS mean_e4,
       CAST(floor(sqrt((CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * s1 / n_vals)
                       / (n_vals - 1.0) / 10000.0) * 10000
                  + 0.31830988618367) AS BIGINT) AS sd_e4,
       CAST(floor((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * s1 / n_vals)
                  / (n_vals - 1.0) / 10000.0 + 0.31830988618367)
            AS BIGINT) AS var_e4,
       s1 AS sum_e4,
       median, min, max, p05, p95
FROM g
"""


# ---------------------------------------------------------------------------
# gridded 30-min series (shared input of the flag/gap-fill queries):
# per-user mean per 30-min slot on a continuous grid; empty slots -> null.
# Re-expresses the reference's regularization (times.py:824-849) over bins.
# ---------------------------------------------------------------------------

def _gridded_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    # slot mean from exact e4-integer sums (sf0.1 sweep): raw avg(value)
    # is summation-order-dependent, and downstream round(.,4) consumers
    # (interp_linear) flipped at .xxxx5 boundaries.  The e4-floored mean
    # is bit-identical in both engines; all SQL twins share SQL_GRIDDED.
    ev = _events(spark, sf_dir)
    binned = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        ((F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_800_000_000) + 1)
         * 1800).cast("long").alias("slot_s"),
        "value",
        F.floor(F.col("value") * 10_000 + F.lit(0.31830988618367))
        .cast("long")
        .alias("_v4"),
    )
    agg = binned.groupBy("user_id", "slot_s").agg(
        (
            F.floor(
                F.sum("_v4").cast("double") / F.count("value")
                + F.lit(0.31830988618367)
            )
            / 10_000.0
        ).alias("v")
    )
    bounds = agg.groupBy("user_id").agg(
        F.min("slot_s").alias("t0"), F.max("slot_s").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.lit(1800))).alias("slot_s"),
    )
    return grid.join(agg, ["user_id", "slot_s"], "left")


SQL_GRIDDED = """
binned AS (
  -- exact e4-integer slot mean, mirrors _gridded_30min
  SELECT user_id,
         (CAST(floor(epoch(ts) / 1800) AS BIGINT) + 1) * 1800 AS slot_s,
         value,
         CAST(floor(value * 10000 + 0.31830988618367) AS BIGINT) AS v4
  FROM events
), agg AS (
  SELECT user_id, slot_s,
         floor(CAST(sum(v4) AS DOUBLE) / count(value)
               + 0.31830988618367) / 10000.0 AS v
  FROM binned GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(slot_s) AS t0, max(slot_s) AS t1 FROM agg GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, 1800)) AS slot_s FROM bounds
), g AS (
  SELECT CAST(grid.user_id AS BIGINT) AS user_id, grid.slot_s, agg.v
  FROM grid LEFT JOIN agg ON grid.user_id = agg.user_id AND grid.slot_s = agg.slot_s
)
"""


# F8 + F5 + C3 + F11 — flag family + QCF ladder (qcf.py:241-292)
def q_qcf_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flags (missing F8, absolute limits F5, soft threshold-clamp flag C3)
    combined into the reference QCF ladder + quality-filtered series."""
    g = _gridded_30min(spark, sf_dir)
    d = FL.flag_missing(g, "v")
    d = FL.flag_abslim(d, "v", minval=2.0, maxval=90.0)
    d = FL.setto_threshold(d, "v", threshold=80.0, mode="above", out_col="v_clamped")
    d = FL.add_qcf(d, ["flag_missing", "flag_abslim", "flag_setto"], value_col="v")
    return d.select(
        "user_id",
        "slot_s",
        F.col("flag_missing").cast("int").alias("flag_missing"),
        F.col("flag_abslim").cast("int").alias("flag_abslim"),
        F.col("flag_setto").cast("int").alias("flag_setto"),
        F.col("sum_hardflags").cast("int").alias("sum_hardflags"),
        F.col("sum_softflags").cast("int").alias("sum_softflags"),
        F.col("qcf").cast("int").alias("qcf"),
        F.round("v_qcf", 4).alias("v_qcf"),
        F.round("v_qcf0", 4).alias("v_qcf0"),
    )


SQL_QCF_PIPELINE = f"""
WITH {SQL_GRIDDED}
, flagged AS (
  SELECT user_id, slot_s, v,
         CASE WHEN v IS NULL THEN 2 ELSE 0 END AS flag_missing,
         CASE WHEN v IS NULL THEN 0
              WHEN v < 2.0 OR v > 90.0 THEN 2 ELSE 0 END AS flag_abslim,
         CASE WHEN v IS NOT NULL AND v > 80.0 THEN 1 ELSE 0 END AS flag_setto
  FROM g
), sums AS (
  SELECT *,
         (CASE WHEN flag_missing = 2 THEN 2 ELSE 0 END
          + CASE WHEN flag_abslim = 2 THEN 2 ELSE 0 END
          + CASE WHEN flag_setto = 2 THEN 2 ELSE 0 END) AS sum_hardflags,
         (CASE WHEN flag_missing = 1 THEN 1 ELSE 0 END
          + CASE WHEN flag_abslim = 1 THEN 1 ELSE 0 END
          + CASE WHEN flag_setto = 1 THEN 1 ELSE 0 END) AS sum_softflags
  FROM flagged
), laddered AS (
  SELECT *,
         CASE WHEN sum_softflags BETWEEN 1 AND 3 AND sum_hardflags = 0 THEN 1
              WHEN sum_hardflags >= 2 OR sum_softflags > 3 THEN 2
              WHEN sum_hardflags + sum_softflags = 0 THEN 0
         END AS qcf
  FROM sums
)
SELECT user_id, slot_s,
       CAST(flag_missing AS INT) AS flag_missing,
       CAST(flag_abslim AS INT) AS flag_abslim,
       CAST(flag_setto AS INT) AS flag_setto,
       CAST(sum_hardflags AS INT) AS sum_hardflags,
       CAST(sum_softflags AS INT) AS sum_softflags,
       CAST(qcf AS INT) AS qcf,
       round(CASE WHEN qcf = 2 THEN NULL ELSE v END, 4) AS v_qcf,
       round(CASE WHEN qcf > 0 THEN NULL ELSE v END, 4) AS v_qcf0
FROM laddered
"""


# F3 — single-pass z-score flag (funcs.py:37-41, zscore.py:140-204)
def q_flag_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "value",
    )
    out = OU.zscore_flag_expr(ev, "user_id", "value", thres_zscore=2.5)
    return out.select(
        "event_id", "user_id", F.col("flag_zscore").cast("int").alias("flag_zscore")
    )


SQL_FLAG_ZSCORE = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(CASE WHEN value IS NOT NULL
                  AND abs((value - avg(value) OVER w) / stddev_pop(value) OVER w) > 2.5
            THEN 2 ELSE 0 END AS INT) AS flag_zscore
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


# T2 — z-score on increments (incremental.py:62-88)
def q_flag_zscore_increments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        "value",
    )
    out = OU.zscore_increments_flag_expr(
        ev, "user_id", "ts", "value", thres_zscore=2.5, order_cols=["ts", "event_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("flag_zscore_incr").cast("int").alias("flag_zscore_incr"),
    )


SQL_FLAG_ZSCORE_INCR = """
WITH inc AS (
  SELECT event_id, user_id,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(CASE WHEN i IS NOT NULL
                  AND abs((i - avg(i) OVER w) / stddev_pop(i) OVER w) > 2.5
            THEN 2 ELSE 0 END AS INT) AS flag_zscore_incr
FROM inc
WINDOW w AS (PARTITION BY user_id)
"""


# T1 scale path — single-pass Hampel via exact percentile window
def q_flag_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _gridded_30min(spark, sf_dir)
    out = OU.hampel_flag_expr(g, "user_id", "slot_s", "v", winsize=15, n_sd=3.0)
    return out.select(
        "user_id", "slot_s", F.col("flag_hampel").cast("int").alias("flag_hampel")
    )


SQL_FLAG_HAMPEL = f"""
WITH {SQL_GRIDDED}
, nn AS (SELECT * FROM g WHERE v IS NOT NULL),
scored AS (
  SELECT user_id, slot_s, v,
         median(v) OVER w AS med,
         stddev_samp(v) OVER w AS sd,
         count(v) OVER w AS cnt
  FROM nn
  WINDOW w AS (PARTITION BY user_id ORDER BY slot_s
               ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)
)
SELECT user_id, slot_s,
       CAST(CASE WHEN cnt >= 3 AND (v > med + 3.0 * sd OR v < med - 3.0 * sd)
            THEN 2 ELSE 0 END AS INT) AS flag_hampel
FROM scored
UNION ALL
SELECT user_id, slot_s, CAST(0 AS INT) AS flag_hampel FROM g WHERE v IS NULL
"""


# A5 — gap run-length encoding (gapfinder.py:58-117)
def q_gap_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _gridded_30min(spark, sf_dir)
    runs = GF.gap_runs(g, "user_id", "slot_s", "v", limit=12)
    return runs.select(
        "user_id",
        F.col("gap_start").cast("long").alias("gap_start_s"),
        F.col("gap_end").cast("long").alias("gap_end_s"),
        F.col("gap_len").cast("long").alias("gap_len"),
    )


SQL_GAP_RUNS = f"""
WITH {SQL_GRIDDED}
, runs AS (
  SELECT user_id, slot_s, v,
         count(v) OVER (PARTITION BY user_id ORDER BY slot_s
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM g
)
SELECT user_id,
       min(slot_s) AS gap_start_s,
       max(slot_s) AS gap_end_s,
       CAST(count(*) AS BIGINT) AS gap_len
FROM runs WHERE v IS NULL
GROUP BY user_id, run_id
HAVING count(*) <= 12
"""


# T3 — linear interpolation with gap-length limit (interpolate.py:8-36)
def q_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _gridded_30min(spark, sf_dir)
    out = GF.linear_interp_limited(
        g, "user_id", "slot_s", "v", gap_limit=3, out_col="v_filled"
    )
    return out.select(
        "user_id",
        "slot_s",
        # floor-offset, not round(.,4): interpolants of 4-decimal slot
        # means land EXACTLY on .xxxx5 midpoints where Spark BigDecimal
        # HALF_UP and DuckDB disagree (sf0.1 sweep)
        (
            F.floor(F.col("v_filled") * 10_000 + F.lit(0.31830988618367))
            / 10_000.0
        ).alias("v_filled"),
        F.col("flag_gapfilled").cast("int").alias("flag_gapfilled"),
    )


SQL_INTERP_LINEAR = f"""
WITH {SQL_GRIDDED}
, pos AS (
  SELECT user_id, slot_s, v,
         row_number() OVER (PARTITION BY user_id ORDER BY slot_s) AS p,
         count(v) OVER (PARTITION BY user_id ORDER BY slot_s
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM g
), ctx AS (
  SELECT *,
         last_value(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY slot_s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
         last_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY slot_s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_p,
         first_value(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY slot_s
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY slot_s
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p,
         sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, run_id) AS gap_len
  FROM pos
)
SELECT user_id, slot_s,
       floor((CASE WHEN v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
                   AND gap_len <= 3
                  THEN prev_v + (next_v - prev_v) * (p - prev_p) / (next_p - prev_p)
                  ELSE v END) * 10000 + 0.31830988618367) / 10000.0
         AS v_filled,
       CAST(CASE WHEN v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
                  AND gap_len <= 3 THEN 1 ELSE 0 END AS INT) AS flag_gapfilled
FROM ctx
"""


# T4 — limited forward/backward fill (meteoscreening.py:571-631)
def q_ffill_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _gridded_30min(spark, sf_dir)
    out = GF.ffill_limited(g, "user_id", "slot_s", "v", limit=3, out_col="v_ffill")
    out = GF.bfill_limited(out, "user_id", "slot_s", "v", limit=3, out_col="v_bfill")
    return out.select(
        "user_id",
        "slot_s",
        F.round("v_ffill", 4).alias("v_ffill"),
        F.round("v_bfill", 4).alias("v_bfill"),
    )


SQL_FFILL_BFILL = f"""
WITH {SQL_GRIDDED}
SELECT user_id, slot_s,
       round(coalesce(v, last_value(v IGNORE NULLS) OVER
         (PARTITION BY user_id ORDER BY slot_s
          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)), 4) AS v_ffill,
       round(coalesce(v, first_value(v IGNORE NULLS) OVER
         (PARTITION BY user_id ORDER BY slot_s
          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)), 4) AS v_bfill
FROM g
"""


# A1-A4 cascade — multi-resolution continuous aggregates (1h + 1d tiers)
def q_tier_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup: the reference re-runs the gated resample per
    resolution (SURVEY §2.3 note after A17); one row set per tier, tagged."""
    # sf0.1-sweep hardening: the operator is fed e4-INTEGER-valued
    # doubles (floor(value*1e4 + 1/pi)) so its internal avg() sums are
    # integral at every partial — exact in ANY summation order — and the
    # emitted mean is one correctly-rounded division presented back at
    # value scale.  The gated-resample operator itself stays under test.
    off = 0.31830988618367
    ev = _events(spark, sf_dir).select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.floor(F.col("value") * 10_000 + F.lit(off))
        .cast("double")
        .alias("value"),
    )
    outs = []
    for tier_name, secs in (("1h", 3600), ("1d", 86400)):
        t = resample_gated(
            ev, "user_id", "ts", "value", bucket_seconds=secs, mincounts_perc=0.9
        ).select(
            F.lit(tier_name).alias("tier"),
            "user_id",
            _epoch_s("window_end").cast("long").alias("window_end_s"),
            (F.floor(F.col("agg_mean") + F.lit(off)) / 10_000.0).alias(
                "agg_mean"
            ),
            F.col("n_vals").cast("long").alias("n_vals"),
        )
        outs.append(t)
    return outs[0].unionByName(outs[1])


def _sql_tier(tier_name: str, secs: int) -> str:
    # e4-integer mean, mirrors Spark (see q_tier_cascade comment)
    return f"""
SELECT '{tier_name}' AS tier, CAST(user_id AS BIGINT) AS user_id,
       window_end_s,
       floor(agg_mean + 0.31830988618367) / 10000.0 AS agg_mean,
       CAST(n_vals AS BIGINT) AS n_vals
FROM (
  SELECT *, max(n_slots) OVER (PARTITION BY user_id) AS maxcount
  FROM (
    SELECT user_id,
           (CAST(floor(epoch(ts) / {secs}) AS BIGINT) + 1) * {secs} AS window_end_s,
           avg(CAST(floor(value * 10000 + 0.31830988618367) AS BIGINT))
             AS agg_mean,
           count(value) AS n_vals, count(*) AS n_slots
    FROM events GROUP BY 1, 2
  )
)
WHERE n_vals >= CASE WHEN floor(maxcount * 0.9) < 3 THEN 1
                     ELSE floor(maxcount * 0.9) END
"""


SQL_TIER_CASCADE = _sql_tier("1h", 3600) + " UNION ALL " + _sql_tier("1d", 86400)


# ---------------------------------------------------------------------------
# E1 — the full north-rule meteoscreening pipeline as ONE lazy DAG
# (meteoscreening.py stages 1-5, SURVEY §3 E1): gridded series -> flags
# (missing F8, abslim F5, z-score F3) -> QCF ladder -> threshold-clamp
# correction C3 -> min-count-gated hourly rollup A1. One registry entry so
# the driver verifies the COMPOSITE, not just the pieces.
# ---------------------------------------------------------------------------

E1_ABS = (2.0, 90.0)
E1_Z = 3.0
E1_CLAMP = 85.0
E1_MINC = 0.9


def q_meteoscreening_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _gridded_30min(spark, sf_dir)
    d = FL.flag_missing(g, "v")
    d = FL.flag_abslim(d, "v", minval=E1_ABS[0], maxval=E1_ABS[1])
    d = OU.zscore_flag_expr(d, "user_id", "v", thres_zscore=E1_Z)
    d = FL.add_qcf(d, ["flag_missing", "flag_abslim", "flag_zscore"], value_col="v")
    # guard: least() skips nulls in both engines — QCF-rejected rows must
    # stay null through the correction
    d = d.withColumn(
        "v_corr",
        F.when(F.col("v_qcf").isNull(), F.lit(None)).otherwise(
            F.least(F.col("v_qcf"), F.lit(E1_CLAMP))
        ),
    )
    hourly = resample_gated(
        d.withColumn("ts", F.timestamp_seconds(F.col("slot_s"))),
        key_col="user_id",
        ts_col="ts",
        value_col="v_corr",
        bucket_seconds=3600,
        mincounts_perc=E1_MINC,
    )
    return hourly.select(
        "user_id",
        _epoch_s("window_end").cast("long").alias("hour_end_s"),
        F.round("agg_mean", 4).alias("agg_mean"),
        F.col("n_vals").cast("long").alias("n_vals"),
    )


SQL_METEOSCREENING = f"""
WITH {SQL_GRIDDED}
, flagged AS (
  SELECT user_id, slot_s, v,
         CASE WHEN v IS NULL THEN 2 ELSE 0 END AS f_miss,
         CASE WHEN v IS NULL THEN 0
              WHEN v < {E1_ABS[0]} OR v > {E1_ABS[1]} THEN 2 ELSE 0 END AS f_abs,
         CASE WHEN v IS NOT NULL
               AND abs((v - avg(v) OVER wk) / stddev_pop(v) OVER wk) > {E1_Z}
              THEN 2 ELSE 0 END AS f_z
  FROM g
  WINDOW wk AS (PARTITION BY user_id)
), qcfd AS (
  SELECT *,
         (CASE WHEN f_miss = 2 THEN 2 ELSE 0 END
          + CASE WHEN f_abs = 2 THEN 2 ELSE 0 END
          + CASE WHEN f_z = 2 THEN 2 ELSE 0 END) AS hard
  FROM flagged
), corrected AS (
  SELECT user_id, slot_s,
         CASE WHEN hard >= 2 OR v IS NULL THEN NULL
              ELSE least(v, {E1_CLAMP}) END AS v_corr
  FROM qcfd
), hourly AS (
  SELECT user_id,
         (CAST(floor(slot_s / 3600) AS BIGINT) + 1) * 3600 AS hour_end_s,
         avg(v_corr) AS agg_mean,
         count(v_corr) AS n_vals,
         count(*) AS n_slots
  FROM corrected GROUP BY 1, 2
), gated AS (
  SELECT *, max(n_slots) OVER (PARTITION BY user_id) AS maxcount FROM hourly
)
SELECT CAST(user_id AS BIGINT) AS user_id, hour_end_s,
       round(agg_mean, 4) AS agg_mean, CAST(n_vals AS BIGINT) AS n_vals
FROM gated
WHERE n_vals >= CASE WHEN floor(maxcount * {E1_MINC}) < 3 THEN 1
                     ELSE floor(maxcount * {E1_MINC}) END
"""


# F2+F3 / T1 — reference-exact iterated kernels (non-SQL-expressible loops:
# rows-only driver check; exactness asserted in pytest vs the pandas oracle).
# The kernels take the SPARSE per-slot aggregate and reindex onto the full
# grid in-kernel (grid_step) — no distributed sequence/explode + join.
def _sparse_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    binned = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        ((F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_800_000_000) + 1)
         * 1800).cast("long").alias("slot_s"),
        "value",
    )
    return binned.groupBy("user_id", "slot_s").agg(F.avg("value").alias("v"))


def q_flag_zscore_iterated(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _sparse_30min(spark, sf_dir)
    out = OU.zscore_flag_iterated(
        g, "user_id", "slot_s", "v", thres_zscore=2.5, grid_step=1800
    )
    return out.select(
        "user_id", "slot_s", F.col("flag_zscore").cast("int").alias("flag_zscore")
    )


def q_flag_localsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _sparse_30min(spark, sf_dir)
    out = OU.localsd_flag_kernel(
        g, "user_id", "slot_s", "v", n_sd=3.0, winsize=21, grid_step=1800
    )
    return out.select(
        "user_id", "slot_s", F.col("flag_localsd").cast("int").alias("flag_localsd")
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

from diive_spark import queries_text as _qt  # noqa: E402

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "resample_30min_gated": q_resample_30min_gated,
    "resample_30min_salted": q_resample_30min_salted,
    "meteoscreening_pipeline": q_meteoscreening_pipeline,
    "dedup_keep_last": q_dedup_keep_last,
    "sstats": q_sstats,
    "qcf_pipeline": q_qcf_pipeline,
    "flag_zscore": q_flag_zscore,
    "flag_zscore_increments": q_flag_zscore_increments,
    "flag_hampel": q_flag_hampel,
    "gap_runs": q_gap_runs,
    "interp_linear": q_interp_linear,
    "ffill_bfill": q_ffill_bfill,
    "flag_zscore_iterated": q_flag_zscore_iterated,
    "flag_localsd": q_flag_localsd,
    "tier_cascade": q_tier_cascade,
}

ORACLE_SQL: dict[str, str] = {
    "resample_30min_gated": SQL_RESAMPLE_30MIN,
    # the salted two-phase plan must match the SAME oracle as the plain plan
    "resample_30min_salted": SQL_RESAMPLE_30MIN,
    "meteoscreening_pipeline": SQL_METEOSCREENING,
    "dedup_keep_last": SQL_DEDUP_KEEP_LAST,
    "sstats": SQL_SSTATS,
    "qcf_pipeline": SQL_QCF_PIPELINE,
    "flag_zscore": SQL_FLAG_ZSCORE,
    "flag_zscore_increments": SQL_FLAG_ZSCORE_INCR,
    "flag_hampel": SQL_FLAG_HAMPEL,
    "gap_runs": SQL_GAP_RUNS,
    "interp_linear": SQL_INTERP_LINEAR,
    "ffill_bfill": SQL_FFILL_BFILL,
    "tier_cascade": SQL_TIER_CASCADE,
    # flag_zscore_iterated / flag_localsd: iterate-until-converged loops are
    # not SQL-expressible; rows-only check (pytest covers exactness).
}

QUERIES.update(_qt.QUERIES)
ORACLE_SQL.update(_qt.ORACLE_SQL)

from diive_spark import queries_analytics as _qa  # noqa: E402
from diive_spark import queries_features as _qf  # noqa: E402

QUERIES.update(_qa.QUERIES)
ORACLE_SQL.update(_qa.ORACLE_SQL)
QUERIES.update(_qf.QUERIES)
ORACLE_SQL.update(_qf.ORACLE_SQL)

from diive_spark import queries_ml as _qm  # noqa: E402

QUERIES.update(_qm.QUERIES)
ORACLE_SQL.update(_qm.ORACLE_SQL)

from diive_spark import queries_meteo as _qmet  # noqa: E402

QUERIES.update(_qmet.QUERIES)
ORACLE_SQL.update(_qmet.ORACLE_SQL)

from diive_spark import queries_analytics2 as _qa2  # noqa: E402

QUERIES.update(_qa2.QUERIES)
ORACLE_SQL.update(_qa2.ORACLE_SQL)

from diive_spark import queries_uncertainty as _qu  # noqa: E402

QUERIES.update(_qu.QUERIES)
ORACLE_SQL.update(_qu.ORACLE_SQL)

from diive_spark import queries_text2 as _qt2  # noqa: E402

QUERIES.update(_qt2.QUERIES)
ORACLE_SQL.update(_qt2.ORACLE_SQL)

from diive_spark import queries_timeseries as _qts  # noqa: E402

QUERIES.update(_qts.QUERIES)
ORACLE_SQL.update(_qts.ORACLE_SQL)

from diive_spark import queries_trend as _qtr  # noqa: E402

QUERIES.update(_qtr.QUERIES)
ORACLE_SQL.update(_qtr.ORACLE_SQL)

from diive_spark import queries_spectral as _qsp  # noqa: E402

QUERIES.update(_qsp.QUERIES)
ORACLE_SQL.update(_qsp.ORACLE_SQL)

from diive_spark import queries_drift as _qd  # noqa: E402

QUERIES.update(_qd.QUERIES)
ORACLE_SQL.update(_qd.ORACLE_SQL)

from diive_spark import queries_olap as _qo  # noqa: E402

QUERIES.update(_qo.QUERIES)
ORACLE_SQL.update(_qo.ORACLE_SQL)

from diive_spark import queries_gapfill as _qg  # noqa: E402

QUERIES.update(_qg.QUERIES)
ORACLE_SQL.update(_qg.ORACLE_SQL)

from diive_spark import queries_multires as _qmr  # noqa: E402

QUERIES.update(_qmr.QUERIES)
ORACLE_SQL.update(_qmr.ORACLE_SQL)

from diive_spark import queries_stats as _qst  # noqa: E402

QUERIES.update(_qst.QUERIES)
ORACLE_SQL.update(_qst.ORACLE_SQL)

from diive_spark import queries_stats2 as _qst2  # noqa: E402

QUERIES.update(_qst2.QUERIES)
ORACLE_SQL.update(_qst2.ORACLE_SQL)

from diive_spark import queries_stats3 as _qst3  # noqa: E402

QUERIES.update(_qst3.QUERIES)
ORACLE_SQL.update(_qst3.ORACLE_SQL)

from diive_spark import queries_text3 as _qtx3  # noqa: E402

QUERIES.update(_qtx3.QUERIES)
ORACLE_SQL.update(_qtx3.ORACLE_SQL)

from diive_spark import queries_stats4 as _qst4  # noqa: E402

QUERIES.update(_qst4.QUERIES)
ORACLE_SQL.update(_qst4.ORACLE_SQL)

from diive_spark import queries_text4 as _qtx4  # noqa: E402

QUERIES.update(_qtx4.QUERIES)
ORACLE_SQL.update(_qtx4.ORACLE_SQL)

from diive_spark import queries_stats5 as _qst5  # noqa: E402

QUERIES.update(_qst5.QUERIES)
ORACLE_SQL.update(_qst5.ORACLE_SQL)

from diive_spark import queries_stats6 as _qst6  # noqa: E402

QUERIES.update(_qst6.QUERIES)
ORACLE_SQL.update(_qst6.ORACLE_SQL)

from diive_spark import queries_stats7 as _qst7  # noqa: E402

QUERIES.update(_qst7.QUERIES)
ORACLE_SQL.update(_qst7.ORACLE_SQL)

from diive_spark import queries_stats8 as _qst8  # noqa: E402

QUERIES.update(_qst8.QUERIES)
ORACLE_SQL.update(_qst8.ORACLE_SQL)

from diive_spark import queries_stats9 as _qst9  # noqa: E402

QUERIES.update(_qst9.QUERIES)
ORACLE_SQL.update(_qst9.ORACLE_SQL)

from diive_spark import queries_stats10 as _qst10  # noqa: E402

QUERIES.update(_qst10.QUERIES)
ORACLE_SQL.update(_qst10.ORACLE_SQL)

from diive_spark import queries_stats11 as _qst11  # noqa: E402

QUERIES.update(_qst11.QUERIES)
ORACLE_SQL.update(_qst11.ORACLE_SQL)

from diive_spark import queries_stats12 as _qst12  # noqa: E402

QUERIES.update(_qst12.QUERIES)
ORACLE_SQL.update(_qst12.ORACLE_SQL)

from diive_spark import queries_meteo2 as _qmet2  # noqa: E402

QUERIES.update(_qmet2.QUERIES)
ORACLE_SQL.update(_qmet2.ORACLE_SQL)

from diive_spark import queries_stats13 as _qst13  # noqa: E402

QUERIES.update(_qst13.QUERIES)
ORACLE_SQL.update(_qst13.ORACLE_SQL)

from diive_spark import queries_text5 as _qt5  # noqa: E402

QUERIES.update(_qt5.QUERIES)
ORACLE_SQL.update(_qt5.ORACLE_SQL)

from diive_spark import queries_embeddings as _qemb  # noqa: E402

QUERIES.update(_qemb.QUERIES)
ORACLE_SQL.update(_qemb.ORACLE_SQL)

from diive_spark import queries_olap2 as _qo2  # noqa: E402

QUERIES.update(_qo2.QUERIES)
ORACLE_SQL.update(_qo2.ORACLE_SQL)

from diive_spark import queries_stats14 as _qst14  # noqa: E402

QUERIES.update(_qst14.QUERIES)
ORACLE_SQL.update(_qst14.ORACLE_SQL)

from diive_spark import queries_stats15 as _qst15  # noqa: E402

QUERIES.update(_qst15.QUERIES)
ORACLE_SQL.update(_qst15.ORACLE_SQL)

from diive_spark import queries_stats16 as _qst16  # noqa: E402

QUERIES.update(_qst16.QUERIES)
ORACLE_SQL.update(_qst16.ORACLE_SQL)

from diive_spark import queries_stats17 as _qst17  # noqa: E402

QUERIES.update(_qst17.QUERIES)
ORACLE_SQL.update(_qst17.ORACLE_SQL)

from diive_spark import queries_stats18 as _qst18  # noqa: E402

QUERIES.update(_qst18.QUERIES)
ORACLE_SQL.update(_qst18.ORACLE_SQL)

from diive_spark import queries_stats19 as _qst19  # noqa: E402

QUERIES.update(_qst19.QUERIES)
ORACLE_SQL.update(_qst19.ORACLE_SQL)

from diive_spark import queries_stats20 as _qst20  # noqa: E402

QUERIES.update(_qst20.QUERIES)
ORACLE_SQL.update(_qst20.ORACLE_SQL)

# Driver-window ordering: the driver records correctness rows for exactly the
# first 50 registry entries.  Round-5 rotation (VERDICT r4 #1/#8): registry
# FROZEN — every slot retires verification debt.  44 never-driver-checked
# oracle queries, risk-ranked per the verdict (cross-engine-numerics-heaviest
# first: the stats20 kernel audits just touched by the ADVICE fixes, then
# meteo2, embeddings, text5, the stats17 Newton/EM/special-function twins,
# and the stats19/20 kernel audits), plus the 6 LLM-pipeline-heart re-checks
# whose last driver row was r03 (VERDICT r4 #8).
_FRONT = [
    # --- 5 ADVICE-fix verifications (stats20, oracle/semantics changed
    #     this round — never driver-checked AND just modified) ---
    "adjusted_rand_index",
    "v_measure_clustering",
    "kemeny_ranking",
    "apsp_closeness",
    "ucc_key_audit",
    # --- meteo2 battery (8, never checked) ---
    "energy_balance_closure",
    "degree_days",
    "penman_monteith_et0",
    "lloyd_taylor_grid",
    "stability_parameter",
    "footprint_schuepp",
    "wpl_correction",
    "bowen_ratio_profile",
    # --- embeddings audits (7, never checked) ---
    "knn_loo_accuracy",
    "hyperplane_lsh_audit",
    "embedding_norm_profile",
    "centroid_gram",
    "ndcg_mrr_at5",
    "schilling_knn",
    "cka_halves",
    # --- text5 battery (5, never checked) ---
    "symspell_neighbors",
    "craigs_zeta",
    "oov_rate",
    "cooccurrence_jaccard",
    "fairness_metrics",
    # --- stats17 numerics-heaviest twins (12: Newton GLMs, EM, special
    #     functions, extreme-value tails — the class most exposed to
    #     cross-engine double drift) ---
    "poisson_glm_newton",
    "logistic_glm_newton",
    "cox_ph_newton",
    "gmm2_em",
    "kde_silverman",
    "pot_return_level",
    "crps_climatology",
    "winkler_interval_score",
    "thurstone_case_v",
    "plackett_luce_mm",
    "bradley_terry_mm",
    "llc_panel_unit_root",
    # --- stats19/20 kernel audits (7, never checked) ---
    "fellegi_sunter_em",
    "geometric_median_weiszfeld",
    "mewma_t2",
    "mic_equipartition",
    "fd_violation_audit",
    "ind_coverage_audit",
    "core_periphery_fit",
    # --- 6 LLM-pipeline-heart re-checks (last driver row r03) ---
    "dedup_incremental",
    "semantic_dedup",
    "ann_cosine_ivf_trained",
    "nb_langid_train",
    "curation_pipeline",
    "dedup_clusters",
]
_front = {k: QUERIES[k] for k in _FRONT if k in QUERIES}
QUERIES = {
    **_front,
    **{k: v for k, v in QUERIES.items() if k not in _front and k in ORACLE_SQL},
    **{k: v for k, v in QUERIES.items() if k not in ORACLE_SQL},
}
