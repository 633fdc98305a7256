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
SELECT agg.user_id, agg.n, CAST(agg.s AS BIGINT) AS s,
       CAST(agg.v18i AS BIGINT) AS var_s18,
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
SELECT user_id, CAST(episode_no AS BIGINT) AS episode_no,
       min(t) AS start_s, max(t) AS end_s,
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


# ---------------------------------------------------------------------------
# trapezoid_hourly — time_weight('linear') tier: per (user, hour) integral
# of the linear interpolant, segments split exactly at bucket edges.
# Input samples are per-(user, second) max_by-deduped so (key, ts) is
# unique (the operator's contract).
# ---------------------------------------------------------------------------


def q_trapezoid_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.counters import trapezoid_integral

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
            .cast("long")
            .alias("ts_s"),
            "event_id",
            "value",
        )
        .groupBy("user_id", "ts_s")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    out = trapezoid_integral(ev, ["user_id"], "ts_s", "value", bucket_s=3600)
    return out.select(
        "user_id",
        "bucket",
        F.floor(F.col("integral") / 3600 * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("integral_h_e4"),
        F.col("covered_s").cast("long").alias("covered_s"),
        F.floor(F.col("twa_linear") * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("twa_e4"),
    ).orderBy("user_id", "bucket")


SQL_TRAPEZOID = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         max_by(value, event_id) AS value
  FROM events GROUP BY 1, 2
), seg AS (
  SELECT user_id, ts_s AS t0, value AS v0,
         LEAD(ts_s) OVER w AS t1, LEAD(value) OVER w AS v1
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
), segs AS (
  SELECT * FROM seg WHERE t1 > t0
), pieces AS (
  SELECT s.user_id, b.bucket,
         greatest(CAST(s.t0 AS DOUBLE), CAST(b.bucket * 3600 AS DOUBLE)) AS a,
         least(CAST(s.t1 AS DOUBLE), CAST((b.bucket + 1) * 3600 AS DOUBLE)) AS b2,
         s.t0, s.v0, s.t1, s.v1
  FROM segs s,
       LATERAL (
         SELECT UNNEST(generate_series(
           CAST(floor(s.t0 / 3600) AS BIGINT),
           CASE WHEN s.t1 - CAST(floor(s.t1 / 3600) AS BIGINT) * 3600 = 0
                THEN CAST(floor(s.t1 / 3600) AS BIGINT) - 1
                ELSE CAST(floor(s.t1 / 3600) AS BIGINT) END
         )) AS bucket
       ) b
), areas AS (
  SELECT user_id, bucket,
         ((v0 + (a - t0) * ((v1 - v0) / CAST(t1 - t0 AS DOUBLE)))
          + (v0 + (b2 - t0) * ((v1 - v0) / CAST(t1 - t0 AS DOUBLE))))
         / 2 * (b2 - a) AS area,
         b2 - a AS len
  FROM pieces
), agg AS (
  SELECT user_id, bucket, sum(area) AS integral, sum(len) AS covered_s
  FROM areas GROUP BY 1, 2
)
SELECT user_id, bucket,
       CAST(floor(integral / 3600 * 10000 + {_OFF}) AS BIGINT)
         AS integral_h_e4,
       CAST(covered_s AS BIGINT) AS covered_s,
       CAST(floor(integral / covered_s * 10000 + {_OFF}) AS BIGINT) AS twa_e4
FROM agg ORDER BY user_id, bucket
"""


# ---------------------------------------------------------------------------
# binseg_changepoints — fixed-structure depth-2 binary segmentation over
# the hourly centivalue series (root split + one split per half).  The
# oracle unrolls the identical search: integer-exact gain numerators make
# the per-candidate gains bit-identical, so the argmax agrees with no
# tolerance.
# ---------------------------------------------------------------------------

_BS_MIN = 12  # half a day of hourly slots


def q_binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.changepoint import binseg_changepoints

    out = binseg_changepoints(
        _hourly(spark, sf_dir), "user_id", "t", "v", depth=2, min_size=_BS_MIN
    )
    return out.select(
        "user_id",
        "node",
        "cp_idx",
        "cp_t",
        F.floor(F.col("gain") + F.lit(_OFF)).cast("long").alias("gain_e0"),
    ).orderBy("user_id", "node")


def _sql_binseg() -> str:
    m = _BS_MIN

    def best(cand: str, name: str) -> str:
        return f"""{name} AS (
  SELECT user_id, tsplit, gain FROM (
    SELECT user_id, tsplit, gain,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY gain DESC, tsplit ASC) AS rk
    FROM {cand}
  ) WHERE rk = 1
)"""

    return f"""
WITH {_HOURLY_SQL},
idx AS (
  SELECT user_id, t, CAST(v AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY t) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n,
         sum(CAST(v AS BIGINT)) OVER (PARTITION BY user_id ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM hourly
), tots AS (
  SELECT user_id, max(n) AS n, sum(v) AS tot FROM idx GROUP BY 1
), cand1 AS (
  SELECT i.user_id, i.rn AS tsplit,
         ((i.c * s.n - i.rn * s.tot) * (i.c * s.n - i.rn * s.tot))
           / (s.n * i.rn * (s.n - i.rn)) AS gain
  FROM idx i JOIN tots s USING (user_id)
  WHERE i.rn >= {m} AND i.rn <= s.n - {m}
), {best("cand1", "b1")},
cp1 AS (
  SELECT b1.user_id, b1.tsplit AS cp, b1.gain, i.c AS c_cp
  FROM b1 JOIN idx i ON i.user_id = b1.user_id AND i.rn = b1.tsplit
), cand2 AS (
  -- left child: segment rows rn in [1, cp], length m2 = cp
  SELECT i.user_id, i.rn AS tsplit,
         ((i.c * p.cp - i.rn * p.c_cp) * (i.c * p.cp - i.rn * p.c_cp))
           / (p.cp * i.rn * (p.cp - i.rn)) AS gain
  FROM idx i JOIN cp1 p USING (user_id)
  WHERE i.rn >= {m} AND i.rn <= p.cp - {m}
), {best("cand2", "b2")},
cand3 AS (
  -- right child: rows rn in (cp, n], relative t = rn - cp, length n - cp
  SELECT i.user_id, i.rn AS tsplit,
         (((i.c - p.c_cp) * (s.n - p.cp) - (i.rn - p.cp) * (s.tot - p.c_cp))
          * ((i.c - p.c_cp) * (s.n - p.cp) - (i.rn - p.cp) * (s.tot - p.c_cp)))
           / ((s.n - p.cp) * (i.rn - p.cp) * (s.n - i.rn)) AS gain
  FROM idx i JOIN cp1 p USING (user_id) JOIN tots s USING (user_id)
  WHERE i.rn - p.cp >= {m} AND i.rn <= s.n - {m}
), {best("cand3", "b3")},
nodes AS (
  SELECT user_id, 1 AS node, tsplit FROM b1
  UNION ALL SELECT user_id, 2 AS node, tsplit FROM b2
  UNION ALL SELECT user_id, 3 AS node, tsplit FROM b3
), gains AS (
  SELECT user_id, 1 AS node, gain FROM b1
  UNION ALL SELECT user_id, 2 AS node, gain FROM b2
  UNION ALL SELECT user_id, 3 AS node, gain FROM b3
)
SELECT n.user_id AS user_id, CAST(n.node AS BIGINT) AS node,
       CAST(n.tsplit AS BIGINT) AS cp_idx,
       i.t AS cp_t,
       CAST(floor(g.gain + {_OFF}) AS BIGINT) AS gain_e0
FROM nodes n
JOIN gains g USING (user_id, node)
JOIN idx i ON i.user_id = n.user_id AND i.rn = n.tsplit + 1
ORDER BY user_id, node
"""


# ---------------------------------------------------------------------------
# tier_coverage — gap-aware data-quality metric per retention window: how
# many of the expected grid slots actually hold data (Timescale
# heartbeat_agg / diive GapFinder turned into a rollup column).  Expected
# slots per (user, day) are bounded by the user's own observation span, so
# partial first/last days are not penalized.
# ---------------------------------------------------------------------------


def q_tier_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly(spark, sf_dir).select(
        "user_id", "t", (F.col("t") - F.pmod(F.col("t"), F.lit(86400))).alias("day_s")
    )
    span = h.groupBy("user_id").agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    per_day = h.groupBy("user_id", "day_s").agg(
        F.countDistinct("t").cast("long").alias("observed")
    )
    j = per_day.join(span, "user_id")
    # expected = hourly slots of the day clipped to [t0, t1]
    lo = F.greatest(F.col("day_s"), F.col("t0"))
    hi = F.least(F.col("day_s") + 86400 - 3600, F.col("t1"))
    expected = ((hi - lo) / 3600 + 1).cast("long")
    return (
        j.select(
            "user_id",
            "day_s",
            "observed",
            expected.alias("expected"),
            F.floor(F.col("observed") / expected * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("coverage_e4"),
        )
        .orderBy("user_id", "day_s")
    )


SQL_TIER_COVERAGE = f"""
WITH {_HOURLY_SQL},
h AS (
  SELECT user_id, t, t - (((t % 86400) + 86400) % 86400) AS day_s FROM hourly
), span AS (
  SELECT user_id, min(t) AS t0, max(t) AS t1 FROM h GROUP BY 1
), per_day AS (
  SELECT user_id, day_s, count(DISTINCT t) AS observed FROM h GROUP BY 1, 2
)
SELECT p.user_id AS user_id, p.day_s AS day_s, p.observed AS observed,
       CAST((least(p.day_s + 86400 - 3600, s.t1)
             - greatest(p.day_s, s.t0)) / 3600 + 1 AS BIGINT) AS expected,
       CAST(floor(p.observed
            / ((least(p.day_s + 86400 - 3600, s.t1)
                - greatest(p.day_s, s.t0)) / 3600 + 1)
            * 10000 + {_OFF}) AS BIGINT) AS coverage_e4
FROM per_day p JOIN span s USING (user_id)
ORDER BY user_id, day_s
"""


# ---------------------------------------------------------------------------
# baseline_anomaly — seasonal-baseline deviation flags: each hourly point is
# compared to the LOWER-median of its (day-of-week, hour-of-day) bucket for
# that user; deviations beyond 3 robust sigmas (1.4826·MAD, lower-median)
# flag.  The monitoring-at-scale twin of flag_zscore_daynight: the baseline
# is a seasonal profile, not a global moment, so diurnal/weekly structure
# doesn't masquerade as anomaly.  Two window passes, no join back (the
# profile is computed over the same partitioning it is applied to).
# ---------------------------------------------------------------------------


def q_baseline_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    h = _hourly(spark, sf_dir).withColumn(
        "how", F.pmod(F.floor(F.col("t") / 3600), F.lit(168))
    )
    wp = Window.partitionBy("user_id", "how")
    # lower median via sorted rank: element at index (n-1)//2 — rank/count
    # are materialized first, then the pick is a windowed max over the same
    # partitioning (Catalyst keeps it all in one exchange)
    h1 = h.withColumn("rn", F.row_number().over(wp.orderBy("v"))).withColumn(
        "n", F.count(F.lit(1)).over(wp)
    )
    h1 = h1.withColumn(
        "base",
        F.max(
            F.when(F.col("rn") - 1 == F.floor((F.col("n") - 1) / 2), F.col("v"))
        ).over(wp),
    ).withColumn("absdev", F.abs(F.col("v") - F.col("base")))
    h2 = h1.withColumn("rn2", F.row_number().over(wp.orderBy("absdev")))
    h2 = h2.withColumn(
        "mad",
        F.max(
            F.when(
                F.col("rn2") - 1 == F.floor((F.col("n") - 1) / 2),
                F.col("absdev"),
            )
        ).over(wp),
    )
    sigma = F.col("mad") * 1.4826
    out = h2.withColumn("sigma", sigma).select(
        "user_id",
        "t",
        F.col("v").cast("long").alias("v_e2"),
        F.col("base").cast("long").alias("base_e2"),
        F.floor(F.col("sigma") * 100 + F.lit(_OFF)).cast("long").alias("sigma_e4"),
        (F.col("absdev") > F.lit(3.0) * F.col("sigma"))
        .cast("long")
        .alias("flag_anomaly"),
    )
    return out.filter(F.col("flag_anomaly") == 1).orderBy("user_id", "t")


SQL_BASELINE_ANOMALY = f"""
WITH {_HOURLY_SQL},
h AS (
  SELECT user_id, t, v,
         ((CAST(floor(t / 3600) AS BIGINT) % 168) + 168) % 168 AS how
  FROM hourly
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, how ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY user_id, how) AS n
  FROM h
), based AS (
  SELECT user_id, how, max(CASE WHEN rn - 1 = (n - 1) // 2 THEN v END) AS base
  FROM ranked GROUP BY 1, 2
), dev AS (
  SELECT h.user_id, h.t, h.v, h.how, b.base, abs(h.v - b.base) AS absdev
  FROM h JOIN based b USING (user_id, how)
), rdev AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, how ORDER BY absdev) AS rn,
         count(*) OVER (PARTITION BY user_id, how) AS n
  FROM dev
), mads AS (
  SELECT user_id, how,
         max(CASE WHEN rn - 1 = (n - 1) // 2 THEN absdev END) AS mad
  FROM rdev GROUP BY 1, 2
)
SELECT d.user_id AS user_id, d.t AS t,
       CAST(d.v AS BIGINT) AS v_e2,
       CAST(d.base AS BIGINT) AS base_e2,
       CAST(floor(m.mad * 1.4826 * 100 + {_OFF}) AS BIGINT) AS sigma_e4,
       CAST(d.absdev > 3.0 * (m.mad * 1.4826) AS BIGINT) AS flag_anomaly
FROM dev d JOIN mads m USING (user_id, how)
WHERE d.absdev > 3.0 * (m.mad * 1.4826)
ORDER BY user_id, t
"""


# ---------------------------------------------------------------------------
# heatmap_datetime — the data side of diive's HeatmapDateTime plot
# (/root/reference/diive/core/plotting/heatmap_datetime.py: pivot a series
# into a date × time-of-day value matrix).  The pivot compiles to ONE
# groupBy with 24 conditional aggregates (no join, no shuffle per column);
# at dashboard scale the matrix per key-month is bounded (31×24), so the
# export stays tiny however large the raw table is.
# ---------------------------------------------------------------------------

_HEAT_USERS = 40


def q_heatmap_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly(spark, sf_dir).filter(F.col("user_id") < _HEAT_USERS)
    h = h.select(
        "user_id",
        (F.col("t") - F.pmod(F.col("t"), F.lit(86400))).alias("day_s"),
        (F.pmod(F.col("t"), F.lit(86400)) / 3600).cast("int").alias("hod"),
        "v",
    )
    piv = (
        h.groupBy("user_id", "day_s")
        .pivot("hod", list(range(24)))
        .agg(F.first("v"))
    )
    cols = [F.col(str(i)).cast("long").alias(f"h{i:02d}") for i in range(24)]
    return piv.select("user_id", "day_s", *cols).orderBy("user_id", "day_s")


_HEAT_COLS = ",\n       ".join(
    f"CAST(min(CASE WHEN hod = {i} THEN v END) AS BIGINT) AS h{i:02d}"
    for i in range(24)
)

SQL_HEATMAP = f"""
WITH {_HOURLY_SQL},
h AS (
  SELECT user_id, t - (((t % 86400) + 86400) % 86400) AS day_s,
         CAST((((t % 86400) + 86400) % 86400) / 3600 AS INTEGER) AS hod, v
  FROM hourly WHERE user_id < {_HEAT_USERS}
)
SELECT user_id, day_s,
       {_HEAT_COLS}
FROM h GROUP BY 1, 2 ORDER BY user_id, day_s
"""


# ---------------------------------------------------------------------------
# heavy_hitters_verified — the sketch-then-verify pattern (the counting
# analog of LSH-then-verify dedup): CMS candidates (estimate ≥ K, a
# SUPERSET — the sketch never underestimates, so recall is guaranteed) are
# exactly re-counted; only candidate rows reach the exact aggregation.
# At 100 TB the first pass is bounded by the sketch size and the second
# by the (rare) heavy rows; the oracle is the plain GROUP BY ... HAVING —
# same answer, which is the point.
# ---------------------------------------------------------------------------

_HH_K = 5


def q_heavy_hitters_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.cms import cms_merge

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("item"),
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("ts_s"),
    )
    hourly = cms_build(ev, "item", "ts_s", bucket_s=3600, depth=_CMS_D, width=_CMS_W)
    daily = cms_merge(hourly, 24)
    probes = ev.select("item").distinct()
    est = cms_estimate(daily, probes, "item", depth=_CMS_D, width=_CMS_W)
    cands = est.filter(F.col("est") >= _HH_K).select(
        "item", F.col("bucket").alias("day_bucket")
    )
    withday = ev.withColumn(
        "day_bucket",
        F.floor(F.floor(F.col("ts_s") / 3600) / 24).cast("long"),
    )
    verified = (
        withday.join(
            F.broadcast(cands), ["item", "day_bucket"], "left_semi"
        )
        .groupBy("item", "day_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .filter(F.col("n_exact") >= _HH_K)
    )
    return verified.select(
        F.col("item").cast("long").alias("user_id"), "day_bucket", "n_exact"
    ).orderBy("user_id", "day_bucket")


SQL_HEAVY_HITTERS = f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(floor(CAST(floor(
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) / 3600
       ) AS BIGINT) / 24) AS BIGINT) AS day_bucket,
       count(*) AS n_exact
FROM events
GROUP BY 1, 2 HAVING count(*) >= {_HH_K}
ORDER BY user_id, day_bucket
"""


# ---------------------------------------------------------------------------
# time_in_state_median — duration-WEIGHTED lower median per event type: the
# value that held for at least half the observed time (each sample weighted
# by its LOCF duration, i.e. seconds until the user's next sample, capped).
# The robust sibling of time_weighted_hourly's mean: one lag window for the
# durations, one sort-by-value window with a cumulative-weight pick — an
# exact element, no interpolation, engine-stable.
# ---------------------------------------------------------------------------

_TIS_CAP_S = 3600  # cap a gap's weight at an hour (sparse series guard)


def q_time_in_state_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("ts_s"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v_e2"),
    )
    wu = Window.partitionBy("user_id").orderBy("ts_s")
    weighted = ev.withColumn(
        "w_s",
        F.least(
            F.coalesce(F.lead("ts_s").over(wu) - F.col("ts_s"), F.lit(0)),
            F.lit(_TIS_CAP_S),
        ),
    ).filter(F.col("w_s") > 0)
    wo = Window.partitionBy("event_type").orderBy("v_e2", "user_id", "ts_s")
    wt = Window.partitionBy("event_type")
    ranked = weighted.withColumn(
        "cumw", F.sum("w_s").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("totw", F.sum("w_s").over(wt))
    picked = ranked.filter(F.col("cumw") * 2 >= F.col("totw")).groupBy(
        "event_type"
    ).agg(
        F.min("v_e2").alias("median_v_e2"),
        F.min("totw").cast("long").alias("total_weight_s"),
    )
    return picked.orderBy("event_type")


SQL_TIME_IN_STATE_MEDIAN = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v_e2
  FROM events
), weighted AS (
  SELECT *, least(coalesce(LEAD(ts_s) OVER w - ts_s, 0), {_TIS_CAP_S}) AS w_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
), pos AS (
  SELECT * FROM weighted WHERE w_s > 0
), ranked AS (
  SELECT *,
         sum(w_s) OVER (PARTITION BY event_type ORDER BY v_e2, user_id, ts_s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         sum(w_s) OVER (PARTITION BY event_type) AS totw
  FROM pos
)
SELECT event_type, min(v_e2) AS median_v_e2,
       CAST(min(totw) AS BIGINT) AS total_weight_s
FROM ranked WHERE cumw * 2 >= totw
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# asap_smoothing — ASAP auto-chosen moving-average window per user series
# (operators/asap.py; Rong & Bailis VLDB'17): smoothest candidate window
# whose smoothed series preserves kurtosis.  Fully declarative; the SQL
# twin unrolls the same candidate grid into one union arm per window.
# ---------------------------------------------------------------------------

_ASAP_W = [1, 2, 4, 8, 12, 24]


def q_asap_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators import asap as ASAP

    h = _hourly(spark, sf_dir)
    out = ASAP.asap_select(h, ["user_id"], "t", "v", candidates=_ASAP_W)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("w_opt").cast("long").alias("w_opt"),
        "n_pts",
        "roughness",
        "kurtosis",
        "kurt_raw",
    ).orderBy("user_id")


def _sql_asap() -> str:
    arms = "\n  UNION ALL\n".join(
        f"""  SELECT * FROM (
    SELECT user_id, {w} AS w, s,
           s - lag(s) OVER (PARTITION BY user_id ORDER BY t) AS d
    FROM (
      SELECT user_id, t,
             avg(v) OVER (PARTITION BY user_id ORDER BY t
                          ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS s,
             count(v) OVER (PARTITION BY user_id ORDER BY t
                            ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
               AS cnt
      FROM hourly
    ) WHERE cnt = {w}
  ) WHERE d IS NOT NULL"""
        for w in _ASAP_W
    )
    return f"""
WITH {_HOURLY_SQL},
arms AS (
{arms}
), met AS (
  SELECT user_id, w, count(*) AS n_pts,
         avg(s) AS m1, avg(s*s) AS m2, avg(s*s*s) AS m3,
         avg(s*s*s*s) AS m4,
         avg(d) AS d1, avg(d*d) AS d2
  FROM arms GROUP BY 1, 2
), met2 AS (
  SELECT user_id, w, n_pts,
         round(sqrt(greatest(d2 - d1*d1, 0.0)), 4) AS roughness,
         round((m4 - 4*m3*m1 + 6*m2*m1*m1 - 3*power(m1, 4))
               / power(m2 - m1*m1, 2), 4) AS kurtosis
  FROM met
), base AS (
  SELECT user_id, kurtosis AS kurt_raw FROM met2 WHERE w = 1
), sel AS (
  SELECT m.*, b.kurt_raw,
         row_number() OVER (
           PARTITION BY m.user_id
           ORDER BY CASE WHEN m.kurtosis >= b.kurt_raw THEN 1 ELSE 0 END DESC,
                    m.roughness ASC, m.w ASC) AS rn
  FROM met2 m JOIN base b USING (user_id)
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(w AS BIGINT) AS w_opt,
       n_pts, roughness, kurtosis, kurt_raw
FROM sel WHERE rn = 1 ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# backtest_seasonal_naive — rolling-origin evaluation of the seasonal-naive
# and naive-1 baselines over the hourly tier (operators/backtest.py)
# ---------------------------------------------------------------------------

def q_backtest_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.backtest import seasonal_naive_backtest

    h = _hourly(spark, sf_dir)
    out = seasonal_naive_backtest(
        h, ["user_id"], "t", "v", season_s=86_400, step_s=3_600
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "n_evals",
        "mae_seasonal",
        "rmse_seasonal",
        "mae_naive1",
        "rmse_naive1",
        "skill",
    ).orderBy("user_id")


SQL_BACKTEST_SN = f"""
WITH {_HOURLY_SQL},
j AS (
  SELECT c.user_id, c.v AS y, s.v AS yhat_s, n1.v AS yhat_1
  FROM hourly c
  JOIN hourly s  ON s.user_id = c.user_id AND s.t = c.t - 86400
  JOIN hourly n1 ON n1.user_id = c.user_id AND n1.t = c.t - 3600
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_evals,
       round(avg(abs(y - yhat_s)), 4) AS mae_seasonal,
       round(sqrt(avg((y - yhat_s) * (y - yhat_s))), 4) AS rmse_seasonal,
       round(avg(abs(y - yhat_1)), 4) AS mae_naive1,
       round(sqrt(avg((y - yhat_1) * (y - yhat_1))), 4) AS rmse_naive1,
       round(avg(abs(y - yhat_s)) / avg(abs(y - yhat_1)), 4) AS skill
FROM j GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# sax_symbols — SAX symbolic discretization of the hourly series
# (operators/sax.py; Lin et al. DMKD'03): z-normalize, PAA frames of 4,
# alphabet 4 via the paper's N(0,1) breakpoint table.
# ---------------------------------------------------------------------------

_SAX_FRAME, _SAX_A = 4, 4


def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.sax import sax_symbols

    h = _hourly(spark, sf_dir)
    out = sax_symbols(
        h, ["user_id"], "t", "v", frame=_SAX_FRAME, alphabet=_SAX_A
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "frame_id",
        "n_in_frame",
        "paa_z",
        "symbol",
    ).orderBy("user_id", "frame_id")


SQL_SAX = f"""
WITH {_HOURLY_SQL},
stats AS (
  SELECT user_id, avg(v) AS mu, stddev_pop(v) AS sd
  FROM hourly GROUP BY 1
), rn AS (
  SELECT user_id, v,
         (row_number() OVER (PARTITION BY user_id ORDER BY t) - 1)
           // {_SAX_FRAME} AS fid
  FROM hourly
), fr AS (
  SELECT user_id, fid, count(*) AS n_in_frame, avg(v) AS paa_raw
  FROM rn GROUP BY 1, 2
), z AS (
  SELECT f.user_id, f.fid, f.n_in_frame,
         CASE WHEN s.sd > 0 THEN (f.paa_raw - s.mu) / s.sd ELSE 0.0 END AS zz
  FROM fr f JOIN stats s USING (user_id)
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(fid AS BIGINT) AS frame_id,
       CAST(n_in_frame AS BIGINT) AS n_in_frame,
       round(zz, 4) + 0.0 AS paa_z,
       CAST((CASE WHEN zz > -0.67 THEN 1 ELSE 0 END
             + CASE WHEN zz > 0.0 THEN 1 ELSE 0 END
             + CASE WHEN zz > 0.67 THEN 1 ELSE 0 END) AS BIGINT) AS symbol
FROM z ORDER BY user_id, frame_id
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "trend_mann_kendall": q_trend_mann_kendall,
    "asap_smoothing": q_asap_smoothing,
    "backtest_seasonal_naive": q_backtest_seasonal_naive,
    "sax_symbols": q_sax_symbols,
    "m4_hourly": q_m4_hourly,
    "hysteresis_alerts": q_hysteresis_alerts,
    "cms_user_freq": q_cms_user_freq,
    "lang_temperature_sample": q_lang_temperature_sample,
    "tier_coverage": q_tier_coverage,
    "baseline_anomaly": q_baseline_anomaly,
    "trapezoid_hourly": q_trapezoid_hourly,
    "binseg_changepoints": q_binseg_changepoints,
    "heatmap_datetime": q_heatmap_datetime,
    "heavy_hitters_verified": q_heavy_hitters_verified,
    "time_in_state_median": q_time_in_state_median,
}

ORACLE_SQL: dict[str, str] = {
    "trend_mann_kendall": SQL_TREND_MK,
    "asap_smoothing": _sql_asap(),
    "backtest_seasonal_naive": SQL_BACKTEST_SN,
    "sax_symbols": SQL_SAX,
    "m4_hourly": SQL_M4_HOURLY,
    "hysteresis_alerts": SQL_HYSTERESIS,
    "cms_user_freq": _sql_cms(),
    "lang_temperature_sample": SQL_LANG_TEMPERATURE,
    "tier_coverage": SQL_TIER_COVERAGE,
    "baseline_anomaly": SQL_BASELINE_ANOMALY,
    "trapezoid_hourly": SQL_TRAPEZOID,
    "binseg_changepoints": _sql_binseg(),
    "heatmap_datetime": SQL_HEATMAP,
    "heavy_hitters_verified": SQL_HEAVY_HITTERS,
    "time_in_state_median": SQL_TIME_IN_STATE_MEDIAN,
}
