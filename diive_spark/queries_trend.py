"""Oracle-backed queries: trend tests, M4 downsampling, hysteresis
episodes, count-min-sketch tiers, temperature resampling.

Engine-stability conventions (BASELINE.md round-half notes): series values
are pre-scaled to exact integers (``floor(avg·100 + 1/pi)``) before any
sign/threshold comparison, so cross-engine ulp drift in aggregation order
cannot flip a pairwise sign or a threshold crossing; medians are LOWER
medians (exact element picks); derived doubles are emitted floor-scaled.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diive_spark.operators.cms import cms_build, cms_estimate
from diive_spark.operators.downsample import m4_downsample
from diive_spark.operators.hysteresis import hysteresis_episodes
from diive_spark.operators.trend import mann_kendall_trend
from diive_spark.text.curation import temperature_resample

_OFF = 0.31830988618367  # 1/pi — the house irrational floor offset

# hourly per-user series with exact-integer centivalues
_HOURLY_SQL = f"""
hourly AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS t,
         CAST(floor(avg(value) * 100 + {_OFF}) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
)
"""


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            "user_id",
            (
                F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000)
                * 3600
            ).cast("long").alias("t"),
        )
        .agg(
            F.floor(F.avg("value") * 100 + F.lit(_OFF))
            .cast("double")
            .alias("v")
        )
    )


# ---------------------------------------------------------------------------
# trend_mann_kendall — MK S/var/z + Theil-Sen slope per user series
# ---------------------------------------------------------------------------


def q_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = mann_kendall_trend(_hourly(spark, sf_dir), "user_id", "t", "v")
    return out.select(
        "user_id",
        "n",
        "s",
        # var_s·18 is an exact integer (the tie-corrected formula is a
        # ratio of integers over 18) — emit it unscaled and unrounded
        F.round(F.col("var_s") * 18).cast("long").alias("var_s18"),
        F.floor(F.col("z") * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        F.floor(F.col("sen_slope") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("slope_e6"),
        F.floor(F.col("sen_intercept") + F.lit(_OFF)).cast("long").alias("icept_e0"),
    ).orderBy("user_id")


SQL_TREND_MK = f"""
WITH {_HOURLY_SQL},
pairs AS (
  SELECT a.user_id,
         CAST(sign(b.v - a.v) AS BIGINT) AS sg,
         (b.v - a.v) / (b.t - a.t) AS slope
  FROM hourly a JOIN hourly b
    ON a.user_id = b.user_id AND b.t > a.t
), stats AS (
  SELECT user_id, sum(sg) AS s, count(*) AS m FROM pairs GROUP BY 1
), nn AS (
  SELECT user_id, count(*) AS n FROM hourly GROUP BY 1
), ties AS (
  SELECT user_id, sum(c * (c - 1) * (2 * c + 5)) AS tie
  FROM (SELECT user_id, v, count(*) AS c FROM hourly GROUP BY 1, 2)
  GROUP BY 1
), sl AS (
  SELECT user_id, slope FROM (
    SELECT user_id, slope,
           row_number() OVER (PARTITION BY user_id ORDER BY slope) AS rn,
           count(*) OVER (PARTITION BY user_id) AS m
    FROM pairs
  ) WHERE rn = (m - 1) // 2 + 1
), ic AS (
  SELECT user_id, r AS icept FROM (
    SELECT h.user_id, h.v - sl.slope * h.t AS r,
           row_number() OVER (PARTITION BY h.user_id
                              ORDER BY h.v - sl.slope * h.t) AS rn,
           count(*) OVER (PARTITION BY h.user_id) AS n
    FROM hourly h JOIN sl USING (user_id)
  ) WHERE rn = (n - 1) // 2 + 1
), agg AS (
  SELECT nn.user_id, nn.n, coalesce(stats.s, 0) AS s,
         (nn.n * (nn.n - 1) * (2 * nn.n + 5) - coalesce(ties.tie, 0)) AS v18i
  FROM nn LEFT JOIN stats USING (user_id) LEFT JOIN ties USING (user_id)
)
SELECT agg.user_id, agg.n, agg.s,
       agg.v18i AS var_s18,
       CAST(floor(
         CASE WHEN agg.v18i <= 0 OR agg.s = 0 THEN 0.0
              WHEN agg.s > 0 THEN (agg.s - 1) / sqrt(agg.v18i / 18.0)
              ELSE (agg.s + 1) / sqrt(agg.v18i / 18.0)
         END * 10000 + {_OFF}) AS BIGINT) AS z_e4,
       CAST(floor(sl.slope * 1000000 + {_OFF}) AS BIGINT) AS slope_e6,
       CAST(floor(ic.icept + {_OFF}) AS BIGINT) AS icept_e0
FROM agg LEFT JOIN sl USING (user_id) LEFT JOIN ic USING (user_id)
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# m4_hourly — width-aware 4-point downsample per (user, 6 h pixel column)
# ---------------------------------------------------------------------------


def q_m4_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("x_us"),
        "value",
    )
    out = m4_downsample(ev, "user_id", "x_us", "value", bucket_s=21_600_000_000)
    return out.select(
        "user_id",
        "bucket",
        "x_first", "y_first", "x_last", "y_last",
        "x_ymin", "y_min", "x_ymax", "y_max",
        "n_in",
    ).orderBy("user_id", "bucket")


SQL_M4_HOURLY = """
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS x, value AS y FROM events
), a AS (
  SELECT user_id, CAST(floor(x / 21600000000) AS BIGINT) AS bucket,
         min(x) AS xf, max(x) AS xl, min(y) AS ymn, max(y) AS ymx,
         count(*) AS n_in
  FROM pts GROUP BY 1, 2
)
SELECT a.user_id AS user_id, a.bucket AS bucket,
       a.xf AS x_first,
       min(CASE WHEN p.x = a.xf THEN p.y END) AS y_first,
       a.xl AS x_last,
       max(CASE WHEN p.x = a.xl THEN p.y END) AS y_last,
       min(CASE WHEN p.y = a.ymn THEN p.x END) AS x_ymin,
       a.ymn AS y_min,
       max(CASE WHEN p.y = a.ymx THEN p.x END) AS x_ymax,
       a.ymx AS y_max,
       a.n_in
FROM a JOIN pts p
  ON p.user_id = a.user_id
 AND CAST(floor(p.x / 21600000000) AS BIGINT) = a.bucket
GROUP BY a.user_id, a.bucket, a.xf, a.xl, a.ymn, a.ymx, a.n_in
ORDER BY user_id, bucket
"""


# ---------------------------------------------------------------------------
# hysteresis_alerts — Schmitt-trigger episodes over the hourly centivalue
# series: open at v_e2 >= 120, close below 80 (dead-band chatter ignored)
# ---------------------------------------------------------------------------

_HYST_HI = 120.0
_HYST_LO = 80.0


def q_hysteresis_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = hysteresis_episodes(
        _hourly(spark, sf_dir), "user_id", "t", "v", hi=_HYST_HI, lo=_HYST_LO
    )
    return out.select(
        "user_id",
        "episode_no",
        F.col("start_s").alias("start_s"),
        F.col("end_s").alias("end_s"),
        F.col("peak").cast("long").alias("peak_e2"),
        "n_rows",
    ).orderBy("user_id", "episode_no")


SQL_HYSTERESIS = f"""
WITH {_HOURLY_SQL},
sig AS (
  SELECT user_id, t, v,
         CASE WHEN v >= {_HYST_HI} THEN 1
              WHEN v < {_HYST_LO} THEN 0 END AS sg
  FROM hourly
), st AS (
  SELECT user_id, t, v,
         coalesce(last_value(sg IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS state
  FROM sig
), op AS (
  SELECT *, CASE WHEN state = 1 AND
                  coalesce(lag(state) OVER (PARTITION BY user_id ORDER BY t), 0) = 0
             THEN 1 ELSE 0 END AS opened
  FROM st
), epi AS (
  SELECT *, sum(opened) OVER (PARTITION BY user_id ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS episode_no
  FROM op
)
SELECT user_id, episode_no, min(t) AS start_s, max(t) AS end_s,
       CAST(max(v) AS BIGINT) AS peak_e2, count(*) AS n_rows
FROM epi WHERE state = 1
GROUP BY 1, 2 ORDER BY user_id, episode_no
"""


# ---------------------------------------------------------------------------
# cms_user_freq — count-min sketch tier: hourly sketches merged to daily,
# per-user frequency estimates read from the DAILY tier only
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 512


def q_cms_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.cms import cms_merge

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("item"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).select("item", (F.col("us") / 1_000_000).cast("long").alias("ts_s"))
    hourly = cms_build(ev, "item", "ts_s", bucket_s=3600, depth=_CMS_D, width=_CMS_W)
    daily = cms_merge(hourly, 24)
    probes = ev.select("item").distinct()
    est = cms_estimate(daily, probes, "item", depth=_CMS_D, width=_CMS_W)
    return est.select(
        F.col("item").cast("long").alias("user_id"),
        F.col("bucket").alias("day_bucket"),
        "est",
    ).orderBy("user_id", "day_bucket")


def _duck_cell(item: str, r: int) -> str:
    from diive_spark.text.hashing import MERSENNE, PERM_A, PERM_B, duck_h60

    return (
        f"(({PERM_A[r]} * ({duck_h60(item)} % {MERSENNE}) + {PERM_B[r]})"
        f" % {MERSENNE}) % {_CMS_W}"
    )


def _sql_cms() -> str:
    rows = " UNION ALL ".join(
        f"SELECT item, day_bucket, {r} AS r, {_duck_cell('item', r)} AS col FROM obs"
        for r in range(_CMS_D)
    )
    return f"""
WITH obs AS (
  SELECT CAST(user_id AS VARCHAR) AS item,
         -- nested floors mirror the engine: hour bucket, then merge /24
         CAST(floor(CAST(floor(
           CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) / 3600
         ) AS BIGINT) / 24) AS BIGINT) AS day_bucket
  FROM events
), cells AS ({rows}),
sketch AS (
  SELECT day_bucket, r, col, count(*) AS cnt FROM cells GROUP BY 1, 2, 3
), probes AS (
  SELECT DISTINCT item FROM obs
), pcells AS (
  {" UNION ALL ".join(
    f"SELECT item, {r} AS r, {_duck_cell('item', r)} AS col FROM probes"
    for r in range(_CMS_D)
  )}
)
SELECT CAST(p.item AS BIGINT) AS user_id, s.day_bucket,
       CASE WHEN count(*) = {_CMS_D} THEN min(s.cnt) ELSE 0 END AS est
FROM pcells p JOIN sketch s ON p.r = s.r AND p.col = s.col
GROUP BY 1, 2 ORDER BY user_id, day_bucket
"""


# ---------------------------------------------------------------------------
# lang_temperature_sample — alpha=0.5 multilingual rebalancing of documents
# ---------------------------------------------------------------------------


def q_lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    out = temperature_resample(d, "lang", "doc_id", alpha=0.5, salt="temp")
    return out.select("doc_id", "lang", "n_stratum", "rate_e6").orderBy("doc_id")


SQL_LANG_TEMPERATURE = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_stratum FROM documents GROUP BY 1
), rates AS (
  SELECT lang, n_stratum,
         CAST(floor(sqrt((min(n_stratum) OVER ()) * 1.0 / n_stratum)
              * 1000000 + {_OFF}) AS BIGINT) AS rate_e6
  FROM counts
)
SELECT d.doc_id, d.lang, r.n_stratum, r.rate_e6
FROM documents d JOIN rates r USING (lang)
WHERE (CAST('0x' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 15)
        AS BIGINT)) % 1000000 < r.rate_e6
ORDER BY d.doc_id
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "trend_mann_kendall": q_trend_mann_kendall,
    "m4_hourly": q_m4_hourly,
    "hysteresis_alerts": q_hysteresis_alerts,
    "cms_user_freq": q_cms_user_freq,
    "lang_temperature_sample": q_lang_temperature_sample,
}

ORACLE_SQL: dict[str, str] = {
    "trend_mann_kendall": SQL_TREND_MK,
    "m4_hourly": SQL_M4_HOURLY,
    "hysteresis_alerts": SQL_HYSTERESIS,
    "cms_user_freq": _sql_cms(),
    "lang_temperature_sample": SQL_LANG_TEMPERATURE,
}
