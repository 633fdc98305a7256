"""Round-4 continuation registry: ordinal-pattern complexity, spatial/
temporal structure functions, circular uniformity, and intervention
analysis — Bandt-Pompe permutation entropy, the empirical variogram
profile, the Rayleigh test on diel phase, and interrupted time-series
segmented regression.

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)``, derived
doubles floor-scaled with the house 1/pi offset; entropy-style ln sums
over bounded term sets (<= 6 patterns, 24 hours) use half-up scaling.
The trigonometric Rayleigh oracle avoids cross-engine libm drift by
embedding ONE shared integer cos/sin table (1e-9 resolution) rendered
from the same Python list into both the Spark plan and the SQL twin.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF

# ---------------------------------------------------------------------------
# permutation_entropy — Bandt-Pompe order-3 ordinal pattern entropy
# ---------------------------------------------------------------------------
# Bandt & Pompe (PRL 88:174102, 2002): entropy of the distribution of
# ordinal patterns of embedded triples.  Series = hourly event counts
# per event_type, triples are consecutive rows in time order (gaps
# documented as row-adjacency, the standard practice for sparse
# grids).  Ties broken by temporal order (stable ranking): position of
# element i within the triple = #{j: x_j < x_i} + #{j < i: x_j = x_i},
# giving 6 valid codes — pure integer CASE logic, identical in both
# engines.  The <= 6-term ln sum is half-up scaled (house convention
# for bounded entropy sums, cf. diel_jsd).


def q_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000))
        .cast("long")
        .alias("t"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("t")
    tri = (
        hourly.withColumn("b", F.lead("c", 1).over(wo))
        .withColumn("cc", F.lead("c", 2).over(wo))
        .filter(F.col("cc").isNotNull())
    )
    a, b, c = F.col("c"), F.col("b"), F.col("cc")
    lt = lambda x, y: F.when(x < y, 1).otherwise(0)  # noqa: E731
    eq = lambda x, y: F.when(x == y, 1).otherwise(0)  # noqa: E731
    pos_a = lt(b, a) + lt(c, a)
    pos_b = lt(a, b) + lt(c, b) + eq(a, b)
    pos_c = lt(a, c) + lt(b, c) + eq(a, c) + eq(b, c)
    pat = tri.select(
        "event_type", (pos_a * 9 + pos_b * 3 + pos_c).alias("code")
    )
    counts = pat.groupBy("event_type", "code").agg(
        F.count(F.lit(1)).alias("k")
    )
    wn = Window.partitionBy("event_type")
    t = counts.withColumn("n", F.sum("k").over(wn))
    p = F.col("k").cast("double") / F.col("n")
    agg = t.groupBy("event_type").agg(
        F.max("n").alias("n_triples"),
        F.count(F.lit(1)).alias("n_patterns"),
        F.sum(-p * F.log(p)).alias("h"),
    )
    return (
        agg.filter(F.col("n_triples") >= 6)
        .select(
            "event_type",
            F.col("n_triples").cast("long").alias("n_triples"),
            F.col("n_patterns").cast("long").alias("n_patterns"),
            F.floor(F.col("h") * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("h_e6"),
            F.floor(F.col("h") / math.log(6.0) * 10_000 + F.lit(0.5))
            .cast("long")
            .alias("hnorm_e4"),
        )
        .orderBy("event_type")
    )


SQL_PERMUTATION_ENTROPY = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         count(*) AS c
  FROM events GROUP BY 1, 2
), tri AS (
  SELECT event_type, c AS a,
         lead(c, 1) OVER (PARTITION BY event_type ORDER BY t) AS b,
         lead(c, 2) OVER (PARTITION BY event_type ORDER BY t) AS cc
  FROM hourly
), pat AS (
  SELECT event_type,
         ((CASE WHEN b < a THEN 1 ELSE 0 END
           + CASE WHEN cc < a THEN 1 ELSE 0 END) * 9
          + (CASE WHEN a < b THEN 1 ELSE 0 END
             + CASE WHEN cc < b THEN 1 ELSE 0 END
             + CASE WHEN a = b THEN 1 ELSE 0 END) * 3
          + (CASE WHEN a < cc THEN 1 ELSE 0 END
             + CASE WHEN b < cc THEN 1 ELSE 0 END
             + CASE WHEN a = cc THEN 1 ELSE 0 END
             + CASE WHEN b = cc THEN 1 ELSE 0 END)) AS code
  FROM tri WHERE cc IS NOT NULL
), counts AS (
  SELECT event_type, code, count(*) AS k FROM pat GROUP BY 1, 2
), t AS (
  SELECT event_type, k, sum(k) OVER (PARTITION BY event_type) AS n
  FROM counts
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_triples,
       CAST(count(*) AS BIGINT) AS n_patterns,
       CAST(floor(sum(-(CAST(k AS DOUBLE) / n)
                      * ln(CAST(k AS DOUBLE) / n)) * 1000000 + 0.5)
            AS BIGINT) AS h_e6,
       CAST(floor(sum(-(CAST(k AS DOUBLE) / n)
                      * ln(CAST(k AS DOUBLE) / n)) / ln(6.0)
                  * 10000 + 0.5) AS BIGINT) AS hnorm_e4
FROM t
GROUP BY event_type
HAVING max(n) >= 6
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# variogram_profile — empirical temporal variogram (structure function)
# ---------------------------------------------------------------------------
# Matheron (Econ. Geol. 58, 1963): gamma(h) = E[(v_{t+h} - v_t)^2] / 2.
# Series = hourly mean centivalues (exact floor-scaled BIGINTs), lags
# h in {1, 2, 3, 6, 12, 24} hours via an equi-join on (event_type,
# t + h*3600) — co-partitioned on the grouping key, never a theta
# join; the 6-row lag table broadcasts.  Sum of squared integer diffs
# is an exact BIGINT (|v| <= ~5.7e4 centi at benchmark SFs, bound
# ~3.3e9/pair — safe past 1e8 pairs); one division at the end.


def q_variogram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            * 3600
        )
        .cast("long")
        .alias("t"),
    ).agg(
        F.floor(F.avg("value") * 100 + F.lit(_OFF)).cast("long").alias("v")
    )
    left = hourly.withColumn(
        "lag_h",
        F.explode(F.array(*[F.lit(h) for h in (1, 2, 3, 6, 12, 24)])),
    ).withColumn("t2", F.col("t") + F.col("lag_h") * 3600)
    right = hourly.select(
        F.col("event_type").alias("event_type_r"),
        F.col("t").alias("t_r"),
        F.col("v").alias("v2"),
    )
    pairs = left.join(
        right,
        (F.col("event_type") == F.col("event_type_r"))
        & (F.col("t2") == F.col("t_r")),
    )
    d = F.col("v2") - F.col("v")
    agg = pairs.groupBy("event_type", "lag_h").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(d * d).alias("ss"),
    )
    return agg.select(
        "event_type",
        F.col("lag_h").cast("long").alias("lag_h"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.floor(
            F.col("ss").cast("double") / (2.0 * F.col("n_pairs"))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("gamma_c2"),
    ).orderBy("event_type", "lag_h")


SQL_VARIOGRAM = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS t,
         CAST(floor(avg(value) * 100 + {_OFF}) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), lags AS (
  SELECT * FROM (VALUES (1), (2), (3), (6), (12), (24)) AS l(lag_h)
), pairs AS (
  SELECT a.event_type, l.lag_h, a.v, b.v AS v2
  FROM hourly a
  CROSS JOIN lags l
  JOIN hourly b
    ON b.event_type = a.event_type AND b.t = a.t + l.lag_h * 3600
)
SELECT event_type, CAST(lag_h AS BIGINT) AS lag_h,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(floor(CAST(sum((v2 - v) * (v2 - v)) AS DOUBLE)
                  / (2.0 * count(*)) + {_OFF}) AS BIGINT) AS gamma_c2
FROM pairs
GROUP BY 1, 2
ORDER BY event_type, lag_h
"""


# ---------------------------------------------------------------------------
# rayleigh_diel — Rayleigh test of diel-phase uniformity
# ---------------------------------------------------------------------------
# Mardia & Jupp (Directional Statistics, 2000 §6.3): with phase
# theta_i = 2*pi*hour/24, R = |sum e^{i theta}| / n and z = n R^2; a
# large z rejects uniform diel spread.  Because hour has only 24
# values, the resultant reduces to 24 exact integer terms
# count_h * C_h with C_h = floor(cos(2*pi*h/24) * 1e9) — the SAME
# Python-rendered table is embedded in the Spark plan and the SQL
# twin, so cross-engine libm drift in cos/sin cannot occur.  x, y are
# exact BIGINTs (|x| <= n * 1e9, safe to n ~ 9e9 rows/key); the final
# sqrt/div chain is a fixed-order deterministic double expression.

_COS9 = [int(math.floor(math.cos(2.0 * math.pi * h / 24.0) * 1e9)) for h in range(24)]
_SIN9 = [int(math.floor(math.sin(2.0 * math.pi * h / 24.0) * 1e9)) for h in range(24)]


def q_rayleigh_diel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hr = F.hour(F.col("ts").cast("timestamp")).cast("int")
    cos_t = F.element_at(
        F.array(*[F.lit(v) for v in _COS9]), hr + 1
    ).cast("long")
    sin_t = F.element_at(
        F.array(*[F.lit(v) for v in _SIN9]), hr + 1
    ).cast("long")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cos_t).alias("x"),
        F.sum(sin_t).alias("y"),
    )
    xd = F.col("x").cast("double")
    yd = F.col("y").cast("double")
    nd = F.col("n").cast("double")
    r = F.sqrt(xd * xd + yd * yd) / (nd * 1e9)
    z = (xd * xd + yd * yd) / (nd * 1e18)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias("r_e6"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


_COS9_SQL = "[" + ", ".join(str(v) for v in _COS9) + "]"
_SIN9_SQL = "[" + ", ".join(str(v) for v in _SIN9) + "]"

SQL_RAYLEIGH = f"""
WITH terms AS (
  SELECT event_type,
         {_COS9_SQL}[hour(ts) + 1] AS ct,
         {_SIN9_SQL}[hour(ts) + 1] AS st
  FROM events
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ct) AS BIGINT) AS x, CAST(sum(st) AS BIGINT) AS y
  FROM terms GROUP BY 1
)
SELECT event_type, n,
       CAST(floor(sqrt(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                       + CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
                  / (CAST(n AS DOUBLE) * 1e9) * 1000000 + {_OFF})
            AS BIGINT) AS r_e6,
       CAST(floor((CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                   + CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
                  / (CAST(n AS DOUBLE) * 1e18) * 10000 + {_OFF})
            AS BIGINT) AS z_e4
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# its_segmented — interrupted time-series segmented regression
# ---------------------------------------------------------------------------
# Wagner, Soumerai, Zhang & Ross-Degnan (J Clin Pharm Ther 27, 2002):
# fit separate OLS lines to the daily-count series before and after an
# intervention day and report the slope change and the level jump at
# the break.  Break day t0 = integer midpoint of the observed day
# span (deterministic, no order statistic needed).  Each segment's
# OLS comes from exact BIGINT sums (n, St, Sy, Stt, Sty on days
# rebased to the segment-local origin) — the slope/intercept/jump
# chain is a fixed-order double expression evaluated identically in
# both engines.


def q_its_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wn = Window.partitionBy("event_type")
    d = (
        daily.withColumn("mn", F.min("day").over(wn))
        .withColumn("mx", F.max("day").over(wn))
        .withColumn(
            "t0", F.floor((F.col("mn") + F.col("mx")) / 2).cast("long")
        )
        .withColumn("tau", F.col("day") - F.col("mn"))
        .withColumn("seg", (F.col("day") > F.col("t0")).cast("int"))
    )
    seg = d.groupBy("event_type", "seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("tau").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("tau") * F.col("tau")).alias("stt"),
        F.sum(F.col("tau") * F.col("y")).alias("sty"),
        F.max("t0").alias("t0"),
        F.max("mn").alias("mn"),
    )
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    slope = (
        (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast("double")
        / den.cast("double")
    )
    icept = (F.col("sy").cast("double") - slope * F.col("st").cast("double")) / F.col(
        "n"
    ).cast("double")
    s = seg.filter(den > 0).select(
        "event_type",
        "seg",
        "n",
        "t0",
        "mn",
        slope.alias("b"),
        icept.alias("a"),
    )
    pre = s.filter(F.col("seg") == 0).select(
        "event_type",
        F.col("n").alias("n_pre"),
        F.col("b").alias("b1"),
        F.col("a").alias("a1"),
        "t0",
        "mn",
    )
    post = s.filter(F.col("seg") == 1).select(
        F.col("event_type").alias("event_type_p"),
        F.col("n").alias("n_post"),
        F.col("b").alias("b2"),
        F.col("a").alias("a2"),
    )
    j = pre.join(
        post, pre.event_type == post.event_type_p
    ).withColumn("tauj", (F.col("t0") - F.col("mn") + 1).cast("double"))
    jump = (
        F.col("a2")
        + F.col("b2") * F.col("tauj")
        - (F.col("a1") + F.col("b1") * F.col("tauj"))
    )
    return j.select(
        "event_type",
        F.col("n_pre").cast("long").alias("n_pre"),
        F.col("n_post").cast("long").alias("n_post"),
        F.floor(F.col("b1") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("slope_pre_e6"),
        F.floor(F.col("b2") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("slope_post_e6"),
        F.floor(jump * 10_000 + F.lit(_OFF)).cast("long").alias("jump_e4"),
    ).orderBy("event_type")


SQL_ITS = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day, y,
         min(day) OVER (PARTITION BY event_type) AS mn,
         CAST(floor((min(day) OVER (PARTITION BY event_type)
                     + max(day) OVER (PARTITION BY event_type)) / 2.0)
              AS BIGINT) AS t0
  FROM daily
), seg AS (
  SELECT event_type,
         CASE WHEN day > t0 THEN 1 ELSE 0 END AS seg,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(day - mn) AS BIGINT) AS st,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum((day - mn) * (day - mn)) AS BIGINT) AS stt,
         CAST(sum((day - mn) * y) AS BIGINT) AS sty,
         max(t0) AS t0, max(mn) AS mn
  FROM d GROUP BY 1, 2
), fit AS (
  SELECT event_type, seg, n, t0, mn,
         CAST(n * sty - st * sy AS DOUBLE)
           / CAST(n * stt - st * st AS DOUBLE) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(n * sty - st * sy AS DOUBLE)
             / CAST(n * stt - st * st AS DOUBLE))
            * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS a
  FROM seg WHERE n * stt - st * st > 0
)
SELECT pre.event_type, pre.n AS n_pre, post.n AS n_post,
       CAST(floor(pre.b * 1000000 + {_OFF}) AS BIGINT) AS slope_pre_e6,
       CAST(floor(post.b * 1000000 + {_OFF}) AS BIGINT) AS slope_post_e6,
       CAST(floor((post.a + post.b * CAST(pre.t0 - pre.mn + 1 AS DOUBLE)
                   - (pre.a + pre.b * CAST(pre.t0 - pre.mn + 1 AS DOUBLE)))
                  * 10000 + {_OFF}) AS BIGINT) AS jump_e4
FROM fit pre JOIN fit post
  ON post.event_type = pre.event_type AND pre.seg = 0 AND post.seg = 1
ORDER BY pre.event_type
"""


# ---------------------------------------------------------------------------
# ad_two_sample — two-sample Anderson-Darling, day vs night hourly counts
# ---------------------------------------------------------------------------
# Pettitt (Biometrika 63, 1976) / Scholz & Stephens (JASA 82, 1987):
# the right-continuous-ECDF variant on the pooled distinct-value
# support, A2 = (1/(n1*n2)) * sum_j l_j (N*M_j - n1*B_j)^2 /
# (B_j (N - B_j)) over pooled values with B_j < N (documented variant
# — no midrank continuity term).  M_j, B_j, l_j are exact BIGINT
# cumulatives; each term's single division is evaluated in double and
# floor-scaled to an e6 BIGINT BEFORE summing, so the cross-engine sum
# is an exact integer regardless of accumulation order.  Day hours =
# [6, 18), the repo's diel convention.


def q_ad_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(ts) / 3_600_000_000)).cast("long").alias("t"),
        ((F.hour(ts) >= 6) & (F.hour(ts) < 18)).cast("int").alias("is_day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    cells = hourly.groupBy("event_type", "c").agg(
        F.sum(F.when(F.col("is_day") == 1, 1).otherwise(0)).alias("l1"),
        F.count(F.lit(1)).alias("l"),
    )
    wo = Window.partitionBy("event_type").orderBy("c")
    wn = Window.partitionBy("event_type")
    t = (
        cells.withColumn(
            "m", F.sum("l1").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn(
            "bb", F.sum("l").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("n1", F.sum("l1").over(wn))
        .withColumn("nn", F.sum("l").over(wn))
    )
    dev = (
        F.col("nn") * F.col("m") - F.col("n1") * F.col("bb")
    ).cast("double")
    term = (
        F.col("l").cast("double")
        * dev
        * dev
        / (F.col("bb").cast("double") * (F.col("nn") - F.col("bb")).cast("double"))
    )
    t = t.withColumn(
        "term_e6",
        F.when(
            F.col("bb") < F.col("nn"),
            F.floor(term * 1_000_000 + F.lit(_OFF)).cast("long"),
        ).otherwise(F.lit(0)),
    )
    agg = t.groupBy("event_type").agg(
        F.max("n1").alias("n1"),
        F.max("nn").alias("nn"),
        F.sum("term_e6").alias("s6"),
    )
    n2 = F.col("nn") - F.col("n1")
    a2 = F.col("s6").cast("double") / 1e6 / (F.col("n1") * n2).cast("double")
    return (
        agg.filter((F.col("n1") > 0) & (n2 > 0))
        .select(
            "event_type",
            F.col("n1").cast("long").alias("n_day"),
            n2.cast("long").alias("n_night"),
            F.floor(a2 * 10_000 + F.lit(_OFF)).cast("long").alias("a2_e4"),
        )
        .orderBy("event_type")
    )


SQL_AD_TWO_SAMPLE = f"""
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CASE WHEN hour(ts) >= 6 AND hour(ts) < 18 THEN 1 ELSE 0 END
           AS is_day,
         count(*) AS c
  FROM events GROUP BY 1, 2, 3
), cells AS (
  SELECT event_type, c,
         CAST(sum(CASE WHEN is_day = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l1,
         CAST(count(*) AS BIGINT) AS l
  FROM hourly GROUP BY 1, 2
), t AS (
  SELECT event_type, c, l1, l,
         CAST(sum(l1) OVER (PARTITION BY event_type ORDER BY c
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS m,
         CAST(sum(l) OVER (PARTITION BY event_type ORDER BY c
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS bb,
         CAST(sum(l1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
         CAST(sum(l) OVER (PARTITION BY event_type) AS BIGINT) AS nn
  FROM cells
), terms AS (
  SELECT event_type, n1, nn,
         CASE WHEN bb < nn THEN
           CAST(floor(CAST(l AS DOUBLE)
                      * CAST(nn * m - n1 * bb AS DOUBLE)
                      * CAST(nn * m - n1 * bb AS DOUBLE)
                      / (CAST(bb AS DOUBLE) * CAST(nn - bb AS DOUBLE))
                      * 1000000 + {_OFF}) AS BIGINT)
         ELSE 0 END AS term_e6
  FROM t
)
SELECT event_type,
       CAST(max(n1) AS BIGINT) AS n_day,
       CAST(max(nn) - max(n1) AS BIGINT) AS n_night,
       CAST(floor(CAST(sum(term_e6) AS DOUBLE) / 1e6
                  / CAST(max(n1) * (max(nn) - max(n1)) AS DOUBLE)
                  * 10000 + {_OFF}) AS BIGINT) AS a2_e4
FROM terms
GROUP BY event_type
HAVING max(n1) > 0 AND max(nn) - max(n1) > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# url_depth_profile — URL structure profile over the canonical corpus URLs
# ---------------------------------------------------------------------------
# Crawl-frontier shape audit (cf. Cho & Garcia-Molina, VLDB 2000
# frontier statistics): bucket the synthetic corpus URLs (the SAME
# generator as url_canon_dedup) by path depth, query-parameter count,
# and fragment presence; per bucket report URL count, distinct hosts,
# and the mean document length.  Pure string ops with identical
# regex/replace semantics in both engines; means floor-scaled.

from diive_spark.queries_text import _URL_SYNTH_SQL, _url_synth_col  # noqa: E402

_HOSTSTRIP = "^HTTPS://WWW\\.[A-Z0-9]+\\.Example\\.COM:443"


def q_url_depth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    d = _documents(spark, sf_dir).select(
        "doc_id", "n_chars", _url_synth_col().alias("url")
    )
    nofrag = F.regexp_replace(F.col("url"), "#.*", "")
    rest = F.regexp_replace(nofrag, _HOSTSTRIP, "")
    path = F.regexp_replace(rest, "\\?.*", "")
    qry = F.when(
        F.instr(rest, "?") > 0, F.substring_index(rest, "?", -1)
    ).otherwise(F.lit(""))
    depth = (
        F.length(path) - F.length(F.regexp_replace(path, "/", ""))
    ).cast("long")
    n_params = F.when(F.length(qry) == 0, F.lit(0)).otherwise(
        F.length(qry) - F.length(F.regexp_replace(qry, "&", "")) + 1
    ).cast("long")
    has_frag = F.col("url").contains("#").cast("int")
    b = d.select(
        depth.alias("depth"),
        n_params.alias("n_params"),
        has_frag.alias("has_frag"),
        "n_chars",
    )
    agg = b.groupBy("depth", "n_params", "has_frag").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("n_chars").alias("schars"),
    )
    return agg.select(
        "depth",
        "n_params",
        F.col("has_frag").cast("long").alias("has_frag"),
        F.col("n_urls").cast("long").alias("n_urls"),
        F.floor(
            F.col("schars").cast("double") / F.col("n_urls") * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_chars_e2"),
    ).orderBy("depth", "n_params", "has_frag")


SQL_URL_DEPTH = f"""
WITH raw AS (
  SELECT doc_id, n_chars, {_URL_SYNTH_SQL} AS url FROM documents
), parts AS (
  SELECT n_chars,
         CASE WHEN url LIKE '%#%' THEN 1 ELSE 0 END AS has_frag,
         regexp_replace(regexp_replace(url, '#.*', ''),
                        '{_HOSTSTRIP}', '') AS rest
  FROM raw
), fields AS (
  SELECT n_chars, has_frag,
         regexp_replace(rest, '\\?.*', '') AS path,
         CASE WHEN position('?' IN rest) > 0
              THEN substr(rest, position('?' IN rest) + 1)
              ELSE '' END AS qry
  FROM parts
), b AS (
  SELECT CAST(length(path) - length(replace(path, '/', '')) AS BIGINT)
           AS depth,
         CAST(CASE WHEN length(qry) = 0 THEN 0
              ELSE length(qry) - length(replace(qry, '&', '')) + 1
              END AS BIGINT) AS n_params,
         CAST(has_frag AS BIGINT) AS has_frag,
         n_chars
  FROM fields
)
SELECT depth, n_params, has_frag,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 100 + {_OFF})
            AS BIGINT) AS mean_chars_e2
FROM b
GROUP BY 1, 2, 3
ORDER BY depth, n_params, has_frag
"""


# ---------------------------------------------------------------------------
# theil_decomposition — Theil T inequality of document length by source
# ---------------------------------------------------------------------------
# Theil (Economics and Information Theory, 1967): T = (1/n) sum
# (x/mu) ln(x/mu) decomposes into between-group + within-group parts.
# Per source g: within T_g from per-doc terms floor-scaled to e9
# BIGINTs before summing (order-free cross-engine sums; drift bound
# n_g * 1e-9 documented), plus that source's between-group
# contribution (n_g/n)(mu_g/mu) ln(mu_g/mu) — a fixed-order double
# expression off exact integer sums.


def q_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    d = _documents(spark, sf_dir).select("source", "n_chars")
    d = d.filter(F.col("n_chars") > 0)
    # group means via a broadcast-joined 1-row-per-source aggregate (and a
    # 1-row global total) — NEVER a partition-less window over the corpus
    grp = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("ng"), F.sum("n_chars").alias("sg")
    )
    tot = grp.agg(
        F.sum("ng").alias("n"), F.sum("sg").alias("s")
    )
    t = d.join(F.broadcast(grp), "source")
    mug = F.col("sg").cast("double") / F.col("ng")
    x = F.col("n_chars").cast("double")
    term = (x / mug) * F.log(x / mug)
    t = t.withColumn(
        "term_e9", F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
    )
    agg = (
        t.groupBy("source")
        .agg(
            F.max("ng").alias("ng"),
            F.max("sg").alias("sg"),
            F.sum("term_e9").alias("s9"),
        )
        .crossJoin(F.broadcast(tot))
    )
    mug2 = F.col("sg").cast("double") / F.col("ng")
    mu = F.col("s").cast("double") / F.col("n")
    t_within = F.col("s9").cast("double") / 1e9 / F.col("ng").cast("double")
    between = (
        (F.col("ng").cast("double") / F.col("n"))
        * (mug2 / mu)
        * F.log(mug2 / mu)
    )
    return agg.select(
        "source",
        F.col("ng").cast("long").alias("n_docs"),
        F.floor(mug2 * 100 + F.lit(_OFF)).cast("long").alias("mean_chars_e2"),
        F.floor(t_within * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("theil_within_e6"),
        F.floor(between * 1e9 + F.lit(_OFF)).cast("long").alias(
            "between_contrib_e9"
        ),
    ).orderBy("source")


SQL_THEIL = f"""
WITH d AS (
  SELECT source, n_chars FROM documents WHERE n_chars > 0
), t AS (
  SELECT source, n_chars,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ng,
         CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS sg,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(sum(n_chars) OVER () AS BIGINT) AS s
  FROM d
), terms AS (
  SELECT source, ng, sg, n, s,
         CAST(floor((CAST(n_chars AS DOUBLE)
                     / (CAST(sg AS DOUBLE) / ng))
                    * ln(CAST(n_chars AS DOUBLE)
                         / (CAST(sg AS DOUBLE) / ng)) * 1e9 + {_OFF})
              AS BIGINT) AS term_e9
  FROM t
), agg AS (
  SELECT source, max(ng) AS ng, max(sg) AS sg, max(n) AS n, max(s) AS s,
         CAST(sum(term_e9) AS BIGINT) AS s9
  FROM terms GROUP BY 1
)
SELECT source,
       CAST(ng AS BIGINT) AS n_docs,
       CAST(floor(CAST(sg AS DOUBLE) / ng * 100 + {_OFF}) AS BIGINT)
         AS mean_chars_e2,
       CAST(floor(CAST(s9 AS DOUBLE) / 1e9 / CAST(ng AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS theil_within_e6,
       CAST(floor((CAST(ng AS DOUBLE) / n)
                  * ((CAST(sg AS DOUBLE) / ng) / (CAST(s AS DOUBLE) / n))
                  * ln((CAST(sg AS DOUBLE) / ng)
                       / (CAST(s AS DOUBLE) / n)) * 1e9 + {_OFF})
            AS BIGINT) AS between_contrib_e9
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# weibull_gap_fit — Weibull fit of inter-event gaps by rank regression
# ---------------------------------------------------------------------------
# Regression on order statistics with Benard's median ranks
# F_i = (i - 0.3)/(n + 0.4): ln(-ln(1 - F_i)) is linear in ln(t) with
# slope = the Weibull shape k (k = 1 reduces to the exponential — the
# companion exp_gap_fit); intercept a gives ln(scale) = -a/k.  Gaps
# are exact integer microseconds off a (ts, event_id)-ordered lag;
# per-gap x = ln(gap_us) and y = ln(-ln(1-F)) and their products are
# floor-scaled to e9 BIGINTs per row before summing, so the OLS input
# sums are exact integers in both engines.  Tied gaps are
# rank-assignment-invariant: x is constant within a tie group and y
# depends only on i, so every sum is independent of tie order.


def q_weibull_gap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wo = Window.partitionBy("event_type").orderBy("tsu", "event_id")
    g = (
        ev.select(
            "event_type",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
        )
        .withColumn("nxt", F.lead("tsu").over(wo))
        .filter(F.col("nxt").isNotNull() & (F.col("nxt") > F.col("tsu")))
        .select("event_type", (F.col("nxt") - F.col("tsu")).alias("gap_us"))
    )
    wr = Window.partitionBy("event_type").orderBy("gap_us")
    wn = Window.partitionBy("event_type")
    r = g.withColumn("i", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    fi = (F.col("i").cast("double") - 0.3) / (F.col("n").cast("double") + 0.4)
    x = F.log(F.col("gap_us").cast("double"))
    y = F.log(-F.log(1.0 - fi))
    r = (
        r.withColumn("x9", F.floor(x * 1e9 + F.lit(_OFF)).cast("long"))
        .withColumn("y9", F.floor(y * 1e9 + F.lit(_OFF)).cast("long"))
    )
    xd = F.col("x9").cast("double") / 1e9
    yd = F.col("y9").cast("double") / 1e9
    r = (
        r.withColumn(
            "xy9", F.floor(xd * yd * 1e9 + F.lit(_OFF)).cast("long")
        )
        .withColumn("xx9", F.floor(xd * xd * 1e9 + F.lit(_OFF)).cast("long"))
    )
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
        F.sum("xy9").alias("sxy"),
        F.sum("xx9").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / 1e9
    sy = F.col("sy").cast("double") / 1e9
    sxy = F.col("sxy").cast("double") / 1e9
    sxx = F.col("sxx").cast("double") / 1e9
    k = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    a = (sy - k * sx) / nd
    lnscale = -(a / k)
    return (
        agg.filter(F.col("n") >= 10)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_gaps"),
            F.floor(k * 10_000 + F.lit(_OFF)).cast("long").alias("shape_e4"),
            F.floor(lnscale * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("lnscale_us_e4"),
        )
        .orderBy("event_type")
    )


SQL_WEIBULL = f"""
WITH g AS (
  SELECT event_type,
         lead(CAST(epoch_us(ts) AS BIGINT))
           OVER (PARTITION BY event_type
                 ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
           - CAST(epoch_us(ts) AS BIGINT) AS gap_us
  FROM events
), gg AS (
  SELECT event_type, gap_us FROM g
  WHERE gap_us IS NOT NULL AND gap_us > 0
), r AS (
  SELECT event_type, gap_us,
         row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS i,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM gg
), s9 AS (
  SELECT event_type, n,
         CAST(floor(ln(CAST(gap_us AS DOUBLE)) * 1e9 + {_OFF}) AS BIGINT)
           AS x9,
         CAST(floor(ln(-ln(1.0 - (CAST(i AS DOUBLE) - 0.3)
                              / (CAST(n AS DOUBLE) + 0.4))) * 1e9 + {_OFF})
              AS BIGINT) AS y9
  FROM r
), p9 AS (
  SELECT event_type, n, x9, y9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9)
                    * (CAST(y9 AS DOUBLE) / 1e9) * 1e9 + {_OFF})
              AS BIGINT) AS xy9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9)
                    * (CAST(x9 AS DOUBLE) / 1e9) * 1e9 + {_OFF})
              AS BIGINT) AS xx9
  FROM s9
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x9) AS BIGINT) AS sx, CAST(sum(y9) AS BIGINT) AS sy,
         CAST(sum(xy9) AS BIGINT) AS sxy, CAST(sum(xx9) AS BIGINT) AS sxx
  FROM p9 GROUP BY 1
), fit AS (
  SELECT event_type, n,
         (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
          - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
         / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
            - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9)) AS k,
         CAST(sx AS DOUBLE) / 1e9 AS sxd, CAST(sy AS DOUBLE) / 1e9 AS syd
  FROM agg
)
SELECT event_type, n AS n_gaps,
       CAST(floor(k * 10000 + {_OFF}) AS BIGINT) AS shape_e4,
       CAST(floor(-(((syd - k * sxd) / CAST(n AS DOUBLE)) / k) * 10000
                  + {_OFF}) AS BIGINT) AS lnscale_us_e4
FROM fit
WHERE n >= 10
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cronbach_alpha — internal consistency of the diel profile (hours as items)
# ---------------------------------------------------------------------------
# Cronbach (Psychometrika 16, 1951): alpha = k/(k-1) * (1 - sum_i
# var_i / var_total), here with the 24 hours of day as "items" and
# days as "subjects" (scores = hourly event counts; absent cells are
# true zeros, folded in exactly because sums over observed cells equal
# sums with zeros and n = distinct observed days).  Population
# variances share the n^2 denominator, so the ratio sum var_i /
# var_total = sum_i (n*Sxx_i - Sx_i^2) / (n*Stt - St^2) is a ratio of
# exact BIGINTs — alpha has exactly ONE floating division.


def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    cells = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(ts) / 86_400_000_000)).cast("long").alias("day"),
        F.hour(ts).cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    nd = (
        cells.groupBy("event_type")
        .agg(F.countDistinct("day").alias("n"))
    )
    item = (
        cells.groupBy("event_type", "hr")
        .agg(
            F.sum("c").alias("sx"),
            F.sum(F.col("c") * F.col("c")).alias("sxx"),
        )
        .join(F.broadcast(nd), "event_type")
        .select(
            "event_type",
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
                "vnum"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("vnum").alias("svnum"),
        )
    )
    tot = (
        cells.groupBy("event_type", "day")
        .agg(F.sum("c").alias("t"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("t").alias("st"),
            F.sum(F.col("t") * F.col("t")).alias("stt"),
        )
        .select(
            "event_type",
            "n",
            (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).alias(
                "vtot"
            ),
        )
    )
    j = item.join(tot, "event_type")
    alpha = (
        F.col("k").cast("double")
        / (F.col("k") - 1).cast("double")
        * (1.0 - F.col("svnum").cast("double") / F.col("vtot").cast("double"))
    )
    return (
        j.filter((F.col("k") >= 2) & (F.col("vtot") > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("k").cast("long").alias("k_items"),
            F.floor(alpha * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("alpha_e6"),
        )
        .orderBy("event_type")
    )


SQL_CRONBACH = f"""
WITH cells AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         hour(ts) AS hr, count(*) AS c
  FROM events GROUP BY 1, 2, 3
), nd AS (
  SELECT event_type, CAST(count(DISTINCT day) AS BIGINT) AS n
  FROM cells GROUP BY 1
), item AS (
  SELECT c.event_type, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n * sxx - sx * sx) AS BIGINT) AS svnum
  FROM (
    SELECT event_type, hr, CAST(sum(c) AS BIGINT) AS sx,
           CAST(sum(c * c) AS BIGINT) AS sxx
    FROM cells GROUP BY 1, 2
  ) c JOIN nd ON nd.event_type = c.event_type
  GROUP BY 1
), tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) * sum(t * t) - sum(t) * sum(t) AS BIGINT) AS vtot
  FROM (
    SELECT event_type, day, CAST(sum(c) AS BIGINT) AS t
    FROM cells GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT item.event_type, tot.n AS n_days, item.k AS k_items,
       CAST(floor(CAST(item.k AS DOUBLE) / (item.k - 1)
                  * (1.0 - CAST(svnum AS DOUBLE) / CAST(vtot AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS alpha_e6
FROM item JOIN tot ON tot.event_type = item.event_type
WHERE item.k >= 2 AND vtot > 0
ORDER BY item.event_type
"""


# ---------------------------------------------------------------------------
# cox_stuart — Cox-Stuart paired-sign trend test on daily counts
# ---------------------------------------------------------------------------
# Cox & Stuart (Biometrika 42, 1955): pair day i with day i + h
# (h = floor((n+1)/2)), count strict sign changes; under H0 the
# positive count is Binomial(m', 1/2).  z = (2*S+ - m') / sqrt(m')
# with ties dropped — everything an exact integer until the one sqrt.


def q_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wn = Window.partitionBy("event_type")
    r = daily.withColumn("i", F.row_number().over(wo)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    h = F.floor((F.col("n") + 1) / 2).cast("long")
    left = r.filter(F.col("i") <= F.floor(F.col("n") / 2)).select(
        "event_type", (F.col("i") + h).alias("j"), F.col("y").alias("y1")
    )
    right = r.select(
        F.col("event_type").alias("event_type_r"),
        F.col("i").alias("i_r"),
        F.col("y").alias("y2"),
    )
    p = left.join(
        right,
        (F.col("event_type") == F.col("event_type_r"))
        & (F.col("j") == F.col("i_r")),
    )
    agg = p.groupBy("event_type").agg(
        F.sum(F.when(F.col("y2") > F.col("y1"), 1).otherwise(0)).alias(
            "s_plus"
        ),
        F.sum(F.when(F.col("y2") < F.col("y1"), 1).otherwise(0)).alias(
            "s_minus"
        ),
    )
    m = F.col("s_plus") + F.col("s_minus")
    z = (2 * F.col("s_plus") - m).cast("double") / F.sqrt(m.cast("double"))
    return (
        agg.filter(m > 0)
        .select(
            "event_type",
            F.col("s_plus").cast("long").alias("s_plus"),
            F.col("s_minus").cast("long").alias("s_minus"),
            F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        )
        .orderBy("event_type")
    )


SQL_COX_STUART = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS y
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
), p AS (
  SELECT a.event_type, a.y AS y1, b.y AS y2
  FROM r a JOIN r b
    ON b.event_type = a.event_type
   AND b.i = a.i + CAST(floor((a.n + 1) / 2.0) AS BIGINT)
  WHERE a.i <= CAST(floor(a.n / 2.0) AS BIGINT)
), agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS BIGINT) AS s_plus,
         CAST(sum(CASE WHEN y2 < y1 THEN 1 ELSE 0 END) AS BIGINT) AS s_minus
  FROM p GROUP BY 1
)
SELECT event_type, s_plus, s_minus,
       CAST(floor(CAST(2 * s_plus - (s_plus + s_minus) AS DOUBLE)
                  / sqrt(CAST(s_plus + s_minus AS DOUBLE)) * 10000 + {_OFF})
            AS BIGINT) AS z_e4
FROM agg
WHERE s_plus + s_minus > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# hodges_lehmann — Hodges-Lehmann pseudo-median of daily counts
# ---------------------------------------------------------------------------
# Hodges & Lehmann (Ann. Math. Stat. 34, 1963): the median of the
# Walsh averages (x_i + x_j)/2, i <= j.  The pair set is day-grid
# bounded (n(n+1)/2 per key on the DAILY grid — the medcouple/
# theil_sen bound, documented as the acceptable quadratic-in-days
# envelope); the output is the exact integer LOW-MEDIAN of the pair
# sums s = x_i + x_j (hl = s/2 exactly, reported as hl_x2 so the
# result never leaves BIGINT).


def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    b = daily.select(
        F.col("event_type").alias("event_type_r"),
        F.col("day").alias("day_r"),
        F.col("y").alias("y2"),
    )
    pairs = daily.join(
        b,
        (F.col("event_type") == F.col("event_type_r"))
        & (F.col("day") <= F.col("day_r")),
    ).select("event_type", (F.col("y") + F.col("y2")).alias("s"))
    wo = Window.partitionBy("event_type").orderBy("s")
    wn = Window.partitionBy("event_type")
    r = pairs.withColumn("i", F.row_number().over(wo)).withColumn(
        "m", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(F.col("i") == F.floor((F.col("m") + 1) / 2))
    return med.select(
        "event_type",
        F.col("m").cast("long").alias("n_pairs"),
        F.col("s").cast("long").alias("hl_x2"),
    ).orderBy("event_type")


SQL_HODGES_LEHMANN = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS y
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, CAST(a.y + b.y AS BIGINT) AS s
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND a.day <= b.day
), r AS (
  SELECT event_type, s,
         row_number() OVER (PARTITION BY event_type ORDER BY s) AS i,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
  FROM pairs
)
SELECT event_type, m AS n_pairs, s AS hl_x2
FROM r
WHERE i = CAST(floor((m + 1) / 2.0) AS BIGINT)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# diel_phase_drift — week-over-week drift of the circular diel phase
# ---------------------------------------------------------------------------
# Fisher (Statistical Analysis of Circular Data, 1993 §2.3): the
# weekly mean diel phase is atan2 of the integer resultant (the SAME
# shared cos/sin table as rayleigh_diel), unwrapped across weeks by
# mapping successive differences into (-pi, pi].  The unwrapped phase
# is floor-scaled to an e9 BIGINT per week, so the OLS drift slope
# (radians/week) comes from exact integer sums; weeks are indexed from
# the per-key min day (no ISO-week engine dependence).

_TWO_PI = 6.283185307179586


def q_diel_phase_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    hr = F.hour(ts).cast("int")
    cos_t = F.element_at(F.array(*[F.lit(v) for v in _COS9]), hr + 1).cast(
        "long"
    )
    sin_t = F.element_at(F.array(*[F.lit(v) for v in _SIN9]), hr + 1).cast(
        "long"
    )
    d = ev.select(
        "event_type",
        (F.floor(F.unix_micros(ts) / 86_400_000_000)).cast("long").alias("day"),
        cos_t.alias("ct"),
        sin_t.alias("st"),
    )
    wn = Window.partitionBy("event_type")
    d = d.withColumn("mn", F.min("day").over(wn))
    wk = d.groupBy(
        "event_type",
        F.floor((F.col("day") - F.col("mn")) / 7).cast("long").alias("w"),
    ).agg(F.sum("ct").alias("x"), F.sum("st").alias("y"))
    ang = F.atan2(F.col("y").cast("double"), F.col("x").cast("double"))
    wk = wk.withColumn("ang", ang)
    wo = Window.partitionBy("event_type").orderBy("w")
    wk = wk.withColumn("prev", F.lag("ang").over(wo))
    delta = F.col("ang") - F.col("prev")
    delta = (
        F.when(delta > F.lit(_TWO_PI / 2), delta - F.lit(_TWO_PI))
        .when(delta <= F.lit(-_TWO_PI / 2), delta + F.lit(_TWO_PI))
        .otherwise(delta)
    )
    wk = wk.withColumn(
        "d", F.when(F.col("prev").isNull(), F.col("ang")).otherwise(delta)
    )
    wk = wk.withColumn(
        "ph",
        F.sum("d").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wk = wk.withColumn(
        "p9", F.floor(F.col("ph") * 1e9 + F.lit(_OFF)).cast("long")
    )
    agg = wk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("sw"),
        F.sum("p9").alias("sp"),
        F.sum(F.col("w") * F.col("p9")).alias("swp"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
    )
    den = F.col("n") * F.col("sww") - F.col("sw") * F.col("sw")
    slope = (
        (F.col("n") * F.col("swp") - F.col("sw") * F.col("sp")).cast("double")
        / den.cast("double")
        / 1e9
    )
    return (
        agg.filter(den > 0)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_weeks"),
            F.floor(slope * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("drift_e6"),
        )
        .orderBy("event_type")
    )


SQL_PHASE_DRIFT = f"""
WITH d AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         {_COS9_SQL}[hour(ts) + 1] AS ct,
         {_SIN9_SQL}[hour(ts) + 1] AS st
  FROM events
), dm AS (
  SELECT event_type, day, ct, st,
         min(day) OVER (PARTITION BY event_type) AS mn
  FROM d
), wk AS (
  SELECT event_type,
         CAST(floor((day - mn) / 7.0) AS BIGINT) AS w,
         CAST(sum(ct) AS BIGINT) AS x, CAST(sum(st) AS BIGINT) AS y
  FROM dm GROUP BY 1, 2
), a AS (
  SELECT event_type, w,
         atan2(CAST(y AS DOUBLE), CAST(x AS DOUBLE)) AS ang,
         lag(atan2(CAST(y AS DOUBLE), CAST(x AS DOUBLE)))
           OVER (PARTITION BY event_type ORDER BY w) AS prev
  FROM wk
), dd AS (
  SELECT event_type, w,
         CASE WHEN prev IS NULL THEN ang
              WHEN ang - prev > {_TWO_PI / 2} THEN ang - prev - {_TWO_PI}
              WHEN ang - prev <= {-_TWO_PI / 2} THEN ang - prev + {_TWO_PI}
              ELSE ang - prev END AS d
  FROM a
), ph AS (
  SELECT event_type, w,
         CAST(floor(sum(d) OVER (PARTITION BY event_type ORDER BY w
                                 ROWS UNBOUNDED PRECEDING) * 1e9 + {_OFF})
              AS BIGINT) AS p9
  FROM dd
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(w) AS BIGINT) AS sw, CAST(sum(p9) AS BIGINT) AS sp,
         CAST(sum(w * p9) AS BIGINT) AS swp,
         CAST(sum(w * w) AS BIGINT) AS sww
  FROM ph GROUP BY 1
)
SELECT event_type, n AS n_weeks,
       CAST(floor(CAST(n * swp - sw * sp AS DOUBLE)
                  / CAST(n * sww - sw * sw AS DOUBLE) / 1e9
                  * 1000000 + {_OFF}) AS BIGINT) AS drift_e6
FROM agg
WHERE n * sww - sw * sw > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# burrows_delta — Burrows' Delta stylometric distance between sources
# ---------------------------------------------------------------------------
# Burrows (LLC 17, 2002): z-score the relative frequencies of the k
# most frequent words across the source population, then Delta(s1,s2)
# = mean_w |z_{w,s1} - z_{w,s2}|.  Top-k selection is a deterministic
# total order (count DESC, word ASC) via TakeOrdered limit (partial
# per-partition top-k — no global window); the word x source grid is
# densified with a broadcast cross join (absent words are true f = 0
# cells).  Relative frequencies and their squares are e12-floored
# BIGINTs, per-word moments are fixed-order doubles off those ints,
# and the per-pair |z| terms are e9-floored before summing — every
# cross-engine sum is an exact integer.

_DELTA_K = 30


def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.groupBy("w")
        .agg(F.sum("c").alias("gc"))
        .orderBy(F.desc("gc"), F.asc("w"))
        .limit(_DELTA_K)
        .select("w")
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    grid = tot.crossJoin(F.broadcast(vocab)).join(
        cnt, ["source", "w"], "left"
    ).fillna(0, subset=["c"])
    f = F.col("c").cast("double") / F.col("t").cast("double")
    grid = grid.withColumn(
        "f12", F.floor(f * 1e12 + F.lit(_OFF)).cast("long")
    )
    fd = F.col("f12").cast("double") / 1e12
    grid = grid.withColumn(
        "ff12", F.floor(fd * fd * 1e12 + F.lit(_OFF)).cast("long")
    )
    mom = grid.groupBy("w").agg(
        F.count(F.lit(1)).alias("s"),
        F.sum("f12").alias("sf"),
        F.sum("ff12").alias("sff"),
    )
    mu = F.col("sf").cast("double") / (F.col("s").cast("double") * 1e12)
    var = (
        F.col("sff").cast("double") / (F.col("s").cast("double") * 1e12)
        - mu * mu
    )
    mom = mom.select(
        "w", mu.alias("mu"), F.sqrt(var).alias("sigma")
    ).filter(F.col("sigma") > 0)
    z = grid.join(F.broadcast(mom), "w").select(
        "w",
        "source",
        (
            (F.col("f12").cast("double") / 1e12 - F.col("mu"))
            / F.col("sigma")
        ).alias("z"),
    )
    z2 = z.select(
        F.col("w").alias("w_r"),
        F.col("source").alias("s2"),
        F.col("z").alias("z2"),
    )
    pairs = z.join(
        z2,
        (F.col("w") == F.col("w_r")) & (F.col("source") < F.col("s2")),
    ).select(
        F.col("source").alias("s1"),
        "s2",
        F.floor(F.abs(F.col("z") - F.col("z2")) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("d9"),
    )
    agg = pairs.groupBy("s1", "s2").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("d9").alias("sd9"),
    )
    delta = F.col("sd9").cast("double") / 1e9 / F.col("n_words").cast("double")
    return agg.select(
        "s1",
        "s2",
        F.col("n_words").cast("long").alias("n_words"),
        F.floor(delta * 10_000 + F.lit(_OFF)).cast("long").alias("delta_e4"),
    ).orderBy("s1", "s2")


SQL_BURROWS_DELTA = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), cnt AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
), vocab AS (
  SELECT w FROM (
    SELECT w, CAST(sum(c) AS BIGINT) AS gc FROM cnt GROUP BY 1
  ) ORDER BY gc DESC, w ASC LIMIT {_DELTA_K}
), tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1
), grid AS (
  SELECT tot.source, vocab.w, tot.t, COALESCE(cnt.c, 0) AS c
  FROM tot CROSS JOIN vocab
  LEFT JOIN cnt ON cnt.source = tot.source AND cnt.w = vocab.w
), g12 AS (
  SELECT source, w,
         CAST(floor(CAST(c AS DOUBLE) / CAST(t AS DOUBLE) * 1e12 + {_OFF})
              AS BIGINT) AS f12
  FROM grid
), g24 AS (
  SELECT source, w, f12,
         CAST(floor((CAST(f12 AS DOUBLE) / 1e12)
                    * (CAST(f12 AS DOUBLE) / 1e12) * 1e12 + {_OFF})
              AS BIGINT) AS ff12
  FROM g12
), mom AS (
  SELECT w,
         CAST(sum(f12) AS BIGINT) / (CAST(count(*) AS DOUBLE) * 1e12) AS mu,
         sqrt(CAST(sum(ff12) AS BIGINT)
                / (CAST(count(*) AS DOUBLE) * 1e12)
              - (CAST(sum(f12) AS BIGINT)
                 / (CAST(count(*) AS DOUBLE) * 1e12))
                * (CAST(sum(f12) AS BIGINT)
                   / (CAST(count(*) AS DOUBLE) * 1e12))) AS sigma
  FROM g24 GROUP BY 1
), z AS (
  SELECT g.source, g.w,
         (CAST(g.f12 AS DOUBLE) / 1e12 - mom.mu) / mom.sigma AS z
  FROM g12 g JOIN mom ON mom.w = g.w
  WHERE mom.sigma > 0
), pairs AS (
  SELECT a.source AS s1, b.source AS s2,
         CAST(floor(abs(a.z - b.z) * 1e9 + {_OFF}) AS BIGINT) AS d9
  FROM z a JOIN z b ON b.w = a.w AND a.source < b.source
)
SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_words,
       CAST(floor(CAST(sum(d9) AS DOUBLE) / 1e9 / count(*) * 10000 + {_OFF})
            AS BIGINT) AS delta_e4
FROM pairs
GROUP BY 1, 2
ORDER BY s1, s2
"""


# ---------------------------------------------------------------------------
# recurrence_rate — recurrence rate + determinism (RQA) on daily counts
# ---------------------------------------------------------------------------
# Webber & Zbilut (J Appl Physiol 76, 1994): fraction of pairs
# (i < j) with |x_i - x_j| <= eps (recurrence rate), and the share of
# recurrent pairs whose diagonal successor (i+1, j+1) is also
# recurrent (a determinism proxy).  eps = max(1, floor(0.1 * range))
# per key — all integer logic on the day grid; the pair set is the
# documented quadratic-in-days envelope.


def q_recurrence_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wn = Window.partitionBy("event_type")
    d = daily.withColumn(
        "eps",
        F.greatest(
            F.lit(1),
            F.floor(
                (F.max("y").over(wn) - F.min("y").over(wn)).cast("double")
                * 0.1
            ).cast("long"),
        ),
    )
    b = d.select(
        F.col("event_type").alias("event_type_r"),
        F.col("day").alias("day_r"),
        F.col("y").alias("y2"),
    )
    pairs = d.join(
        b,
        (F.col("event_type") == F.col("event_type_r"))
        & (F.col("day") < F.col("day_r")),
    ).select(
        "event_type",
        "day",
        "day_r",
        (F.abs(F.col("y") - F.col("y2")) <= F.col("eps")).cast("int").alias(
            "rec"
        ),
    )
    recs = pairs.filter(F.col("rec") == 1).select(
        "event_type", "day", "day_r"
    )
    nxt = recs.select(
        F.col("event_type").alias("et_n"),
        (F.col("day") - 1).alias("day_p"),
        (F.col("day_r") - 1).alias("day_rp"),
    )
    diag = recs.join(
        nxt,
        (F.col("event_type") == F.col("et_n"))
        & (F.col("day") == F.col("day_p"))
        & (F.col("day_r") == F.col("day_rp")),
        "left_semi",
    )
    base = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("rec").alias("n_rec"),
    )
    dd = diag.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_diag"))
    j = base.join(dd, "event_type", "left").fillna(0, subset=["n_diag"])
    rr = F.col("n_rec").cast("double") / F.col("n_pairs").cast("double")
    det = F.col("n_diag").cast("double") / F.col("n_rec").cast("double")
    return (
        j.filter(F.col("n_rec") > 0)
        .select(
            "event_type",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_rec").cast("long").alias("n_rec"),
            F.floor(rr * 10_000 + F.lit(_OFF)).cast("long").alias("rec_e4"),
            F.floor(det * 10_000 + F.lit(_OFF)).cast("long").alias("det_e4"),
        )
        .orderBy("event_type")
    )


SQL_RECURRENCE = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day, y,
         greatest(1, CAST(floor(
           CAST(max(y) OVER (PARTITION BY event_type)
                - min(y) OVER (PARTITION BY event_type) AS DOUBLE) * 0.1)
           AS BIGINT)) AS eps
  FROM daily
), pairs AS (
  SELECT a.event_type, a.day, b.day AS day_r,
         CASE WHEN abs(a.y - b.y) <= a.eps THEN 1 ELSE 0 END AS rec
  FROM d a JOIN d b
    ON b.event_type = a.event_type AND a.day < b.day
), recs AS (
  SELECT event_type, day, day_r FROM pairs WHERE rec = 1
), diag AS (
  SELECT r.event_type, count(*) AS n_diag
  FROM recs r
  WHERE EXISTS (
    SELECT 1 FROM recs n
    WHERE n.event_type = r.event_type
      AND n.day = r.day + 1 AND n.day_r = r.day_r + 1
  )
  GROUP BY 1
), base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(rec) AS BIGINT) AS n_rec
  FROM pairs GROUP BY 1
)
SELECT base.event_type, n_pairs, n_rec,
       CAST(floor(CAST(n_rec AS DOUBLE) / n_pairs * 10000 + {_OFF})
            AS BIGINT) AS rec_e4,
       CAST(floor(CAST(COALESCE(n_diag, 0) AS DOUBLE) / n_rec * 10000
                  + {_OFF}) AS BIGINT) AS det_e4
FROM base LEFT JOIN diag ON diag.event_type = base.event_type
WHERE n_rec > 0
ORDER BY base.event_type
"""


# ---------------------------------------------------------------------------
# poincare_sd — Poincare plot SD1/SD2 of the daily-count series
# ---------------------------------------------------------------------------
# Brennan, Palaniswami & Kamen (IEEE TBME 48, 2001): SD1^2 =
# var(x_{t+1} - x_t)/2 (short-term variability), SD2^2 =
# var(x_{t+1} + x_t)/2 (long-term), on successive pairs.  Population
# variances off exact BIGINT sums share the n^2 denominator; the only
# floating ops are two sqrt and the ratio.


def q_poincare_sd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wo = Window.partitionBy("event_type").orderBy("day")
    p = (
        daily.withColumn("y2", F.lead("y").over(wo))
        .filter(F.col("y2").isNotNull())
        .select(
            "event_type",
            (F.col("y2") - F.col("y")).alias("d"),
            (F.col("y2") + F.col("y")).alias("s"),
        )
    )
    agg = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum("s").alias("ss"),
        F.sum(F.col("s") * F.col("s")).alias("sss"),
    )
    nd = F.col("n").cast("double")
    vard = (F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")).cast(
        "double"
    ) / (nd * nd)
    vars_ = (F.col("n") * F.col("sss") - F.col("ss") * F.col("ss")).cast(
        "double"
    ) / (nd * nd)
    sd1 = F.sqrt(vard / 2.0)
    sd2 = F.sqrt(vars_ / 2.0)
    return (
        agg.filter((F.col("n") >= 2) & (vars_ > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_pairs"),
            F.floor(sd1 * 10_000 + F.lit(_OFF)).cast("long").alias("sd1_e4"),
            F.floor(sd2 * 10_000 + F.lit(_OFF)).cast("long").alias("sd2_e4"),
            F.floor(sd1 / sd2 * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("ratio_e4"),
        )
        .orderBy("event_type")
    )


SQL_POINCARE = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS y
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type,
         lead(y) OVER (PARTITION BY event_type ORDER BY day) - y AS d,
         lead(y) OVER (PARTITION BY event_type ORDER BY day) + y AS s
  FROM daily
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d * d) AS BIGINT) AS sdd,
         CAST(sum(s) AS BIGINT) AS ss, CAST(sum(s * s) AS BIGINT) AS sss
  FROM p WHERE d IS NOT NULL GROUP BY 1
)
SELECT event_type, n AS n_pairs,
       CAST(floor(sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 2.0)
                  * 10000 + {_OFF}) AS BIGINT) AS sd1_e4,
       CAST(floor(sqrt(CAST(n * sss - ss * ss AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 2.0)
                  * 10000 + {_OFF}) AS BIGINT) AS sd2_e4,
       CAST(floor(sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 2.0)
                  / sqrt(CAST(n * sss - ss * ss AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 2.0)
                  * 10000 + {_OFF}) AS BIGINT) AS ratio_e4
FROM agg
WHERE n >= 2 AND n * sss - ss * ss > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# fano_factor — Fano factor (variance-to-mean) across block sizes
# ---------------------------------------------------------------------------
# Fano (Phys Rev 72, 1947) / spike-train practice (Teich 1989): the
# index of dispersion of block counts at block sizes 1 h, 6 h, 24 h.
# Blocks derive from ONE shared hourly agg (never re-scanning events
# per size); empty blocks inside the span are true zeros, folded in
# exactly because count sums over observed blocks equal sums with
# zeros and n_blocks = span/size.  F = (n*Scc - Sc^2) / (n*Sc) — a
# single division of exact BIGINTs.


def q_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000))
        .cast("long")
        .alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    sized = hourly.withColumn(
        "size_h", F.explode(F.array(F.lit(1), F.lit(6), F.lit(24)))
    )
    blocks = sized.groupBy(
        "event_type",
        "size_h",
        F.floor(F.col("h") / F.col("size_h")).cast("long").alias("b"),
    ).agg(F.sum("c").alias("cb"))
    agg = blocks.groupBy("event_type", "size_h").agg(
        (F.max("b") - F.min("b") + 1).alias("n"),
        F.sum("cb").alias("sc"),
        F.sum(F.col("cb") * F.col("cb")).alias("scc"),
    )
    fano = (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")).cast(
        "double"
    ) / (F.col("n") * F.col("sc")).cast("double")
    return (
        agg.filter(F.col("sc") > 0)
        .select(
            "event_type",
            F.col("size_h").cast("long").alias("block_h"),
            F.col("n").cast("long").alias("n_blocks"),
            F.floor(fano * 10_000 + F.lit(_OFF)).cast("long").alias(
                "fano_e4"
            ),
        )
        .orderBy("event_type", "block_h")
    )


SQL_FANO = f"""
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         count(*) AS c
  FROM events GROUP BY 1, 2
), sized AS (
  SELECT event_type, h, c, s.size_h
  FROM hourly CROSS JOIN (VALUES (1), (6), (24)) AS s(size_h)
), blocks AS (
  SELECT event_type, size_h,
         CAST(floor(CAST(h AS DOUBLE) / size_h) AS BIGINT) AS b,
         CAST(sum(c) AS BIGINT) AS cb
  FROM sized GROUP BY 1, 2, 3
), agg AS (
  SELECT event_type, size_h,
         CAST(max(b) - min(b) + 1 AS BIGINT) AS n,
         CAST(sum(cb) AS BIGINT) AS sc,
         CAST(sum(cb * cb) AS BIGINT) AS scc
  FROM blocks GROUP BY 1, 2
)
SELECT event_type, CAST(size_h AS BIGINT) AS block_h, n AS n_blocks,
       CAST(floor(CAST(n * scc - sc * sc AS DOUBLE)
                  / CAST(n * sc AS DOUBLE) * 10000 + {_OFF}) AS BIGINT)
         AS fano_e4
FROM agg
WHERE sc > 0
ORDER BY event_type, block_h
"""


# ---------------------------------------------------------------------------
# rfm_segments — RFM (recency/frequency/monetary) quintile segmentation
# ---------------------------------------------------------------------------
# Hughes (Strategic Database Marketing, 1994): score every user 1-5 on
# recency, frequency, and monetary value, then profile the segments.
# Monetary sums are exact (per-event centivalues floored BEFORE the
# sum); each quintile is assigned on the VALUE-DOMAIN count table
# (bucket = floor(5 * prev / tot) + 1 at the value's first rank), so
# ties share a bucket deterministically and no corpus-sized window
# exists — the three domain maps are tiny and broadcast back.


def _rfm_bucket(per_user: DataFrame, col: str, out: str) -> DataFrame:
    cnt = per_user.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy(col)
    cum = cnt.withColumn(
        "cum", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("c").over(Window.partitionBy()))
    return cum.select(
        col,
        (F.floor(5 * (F.col("cum") - F.col("c")) / F.col("tot")) + 1)
        .cast("int")
        .alias(out),
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    base = ev.select(
        "user_id",
        (F.floor(F.unix_micros(ts) / 86_400_000_000)).cast("long").alias(
            "day"
        ),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("cv"),
    )
    horizon = base.agg(F.max("day").alias("hz"))
    per_user = (
        base.groupBy("user_id")
        .agg(
            F.max("day").alias("last_day"),
            F.count(F.lit(1)).alias("fr"),
            F.sum("cv").alias("mo"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            (F.col("hz") - F.col("last_day")).alias("rec"),
            "fr",
            "mo",
            # whole-unit resolution for the monetary DOMAIN map — keeps the
            # bucket table value-range-bounded instead of per-user-unique
            F.floor(F.col("mo") / 100).cast("long").alias("mo_u"),
        )
    )
    rb = _rfm_bucket(per_user, "rec", "r_q")
    fb = _rfm_bucket(per_user, "fr", "f_q")
    mb = _rfm_bucket(per_user, "mo_u", "m_q")
    seg = (
        per_user.join(F.broadcast(rb), "rec")
        .join(F.broadcast(fb), "fr")
        .join(F.broadcast(mb), "mo_u")
    )
    agg = seg.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("mo").alias("smo"),
    )
    return agg.select(
        F.col("r_q").cast("long").alias("r_q"),
        F.col("f_q").cast("long").alias("f_q"),
        F.col("m_q").cast("long").alias("m_q"),
        F.col("n_users").cast("long").alias("n_users"),
        F.floor(
            F.col("smo").cast("double") / F.col("n_users") / 100.0
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_monetary"),
    ).orderBy("r_q", "f_q", "m_q")


SQL_RFM = f"""
WITH base AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS cv
  FROM events
), per_user AS (
  SELECT user_id,
         (SELECT max(day) FROM base) - max(day) AS rec,
         CAST(count(*) AS BIGINT) AS fr,
         CAST(sum(cv) AS BIGINT) AS mo,
         CAST(floor(CAST(sum(cv) AS BIGINT) / 100.0) AS BIGINT) AS mo_u
  FROM base GROUP BY user_id
), rb AS (
  SELECT rec, CAST(floor(5.0 * (cum - c) / tot) + 1 AS INT) AS r_q FROM (
    SELECT rec, c, sum(c) OVER (ORDER BY rec) AS cum,
           sum(c) OVER () AS tot
    FROM (SELECT rec, count(*) AS c FROM per_user GROUP BY 1)
  )
), fb AS (
  SELECT fr, CAST(floor(5.0 * (cum - c) / tot) + 1 AS INT) AS f_q FROM (
    SELECT fr, c, sum(c) OVER (ORDER BY fr) AS cum,
           sum(c) OVER () AS tot
    FROM (SELECT fr, count(*) AS c FROM per_user GROUP BY 1)
  )
), mb AS (
  SELECT mo_u, CAST(floor(5.0 * (cum - c) / tot) + 1 AS INT) AS m_q FROM (
    SELECT mo_u, c, sum(c) OVER (ORDER BY mo_u) AS cum,
           sum(c) OVER () AS tot
    FROM (SELECT mo_u, count(*) AS c FROM per_user GROUP BY 1)
  )
)
SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
       CAST(m_q AS BIGINT) AS m_q,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(floor(CAST(sum(mo) AS DOUBLE) / count(*) / 100.0 + {_OFF})
            AS BIGINT) AS mean_monetary
FROM per_user
JOIN rb USING (rec) JOIN fb USING (fr) JOIN mb USING (mo_u)
GROUP BY 1, 2, 3
ORDER BY r_q, f_q, m_q
"""


# ---------------------------------------------------------------------------
# bass_diffusion — Bass model fit on per-type adoption curves
# ---------------------------------------------------------------------------
# Bass (Management Science 15, 1969), conditional-rate form: with M =
# observed total adopters, n_t / (M - N_{t-1}) = p + q * N_{t-1} / M.
# Adoption day = each user's FIRST event day per type; the per-day
# rate y and regressor x are e9-floored BIGINTs, so the 2-var OLS
# sums are exact integers (the weibull_gap_fit discipline); one
# division chain at the end yields p and q.


def q_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    first = ev.groupBy("event_type", "user_id").agg(
        F.min(
            (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
            .cast("long")
        ).alias("day")
    )
    daily = first.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("nt")
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    wn = Window.partitionBy("event_type")
    d = daily.withColumn(
        "cum", F.sum("nt").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("m", F.sum("nt").over(wn))
    d = d.withColumn("nprev", F.col("cum") - F.col("nt")).filter(
        F.col("nprev") < F.col("m")
    )
    y = F.col("nt").cast("double") / (F.col("m") - F.col("nprev")).cast(
        "double"
    )
    x = F.col("nprev").cast("double") / F.col("m").cast("double")
    d = d.withColumn(
        "x9", F.floor(x * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn("y9", F.floor(y * 1e9 + F.lit(_OFF)).cast("long"))
    xd = F.col("x9").cast("double") / 1e9
    yd = F.col("y9").cast("double") / 1e9
    d = d.withColumn(
        "xy9", F.floor(xd * yd * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn("xx9", F.floor(xd * xd * 1e9 + F.lit(_OFF)).cast("long"))
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("m").alias("m"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
        F.sum("xy9").alias("sxy"),
        F.sum("xx9").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / 1e9
    sy = F.col("sy").cast("double") / 1e9
    sxy = F.col("sxy").cast("double") / 1e9
    sxx = F.col("sxx").cast("double") / 1e9
    q_ = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    p_ = (sy - q_ * sx) / nd
    return (
        agg.filter((nd * sxx - sx * sx) > 0)
        .select(
            "event_type",
            F.col("m").cast("long").alias("m_adopters"),
            F.col("n").cast("long").alias("n_days"),
            F.floor(p_ * 1_000_000 + F.lit(_OFF)).cast("long").alias("p_e6"),
            F.floor(q_ * 1_000_000 + F.lit(_OFF)).cast("long").alias("q_e6"),
        )
        .orderBy("event_type")
    )


SQL_BASS = f"""
WITH first_day AS (
  SELECT event_type, user_id,
         min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS day
  FROM events GROUP BY 1, 2
), daily AS (
  SELECT event_type, day, count(*) AS nt FROM first_day GROUP BY 1, 2
), d AS (
  SELECT event_type, day, nt,
         CAST(sum(nt) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(nt) OVER (PARTITION BY event_type) AS BIGINT) AS m
  FROM daily
), s9 AS (
  SELECT event_type, m,
         CAST(floor(CAST(cum - nt AS DOUBLE) / m * 1e9 + {_OFF})
              AS BIGINT) AS x9,
         CAST(floor(CAST(nt AS DOUBLE) / (m - (cum - nt)) * 1e9 + {_OFF})
              AS BIGINT) AS y9
  FROM d WHERE cum - nt < m
), p9 AS (
  SELECT event_type, m, x9, y9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9)
                    * (CAST(y9 AS DOUBLE) / 1e9) * 1e9 + {_OFF})
              AS BIGINT) AS xy9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9)
                    * (CAST(x9 AS DOUBLE) / 1e9) * 1e9 + {_OFF})
              AS BIGINT) AS xx9
  FROM s9
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, max(m) AS m,
         CAST(sum(x9) AS BIGINT) AS sx, CAST(sum(y9) AS BIGINT) AS sy,
         CAST(sum(xy9) AS BIGINT) AS sxy, CAST(sum(xx9) AS BIGINT) AS sxx
  FROM p9 GROUP BY 1
), fit AS (
  SELECT event_type, m, n,
         (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
          - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
         / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
            - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9)) AS q,
         CAST(sx AS DOUBLE) / 1e9 AS sxd, CAST(sy AS DOUBLE) / 1e9 AS syd,
         CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
           - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9) AS den
  FROM agg
)
SELECT event_type, m AS m_adopters, n AS n_days,
       CAST(floor((syd - q * sxd) / CAST(n AS DOUBLE) * 1000000 + {_OFF})
            AS BIGINT) AS p_e6,
       CAST(floor(q * 1000000 + {_OFF}) AS BIGINT) AS q_e6
FROM fit
WHERE den > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# conversion_lag — view -> purchase latency quantiles (value-domain exact)
# ---------------------------------------------------------------------------
# Attribution-lag analysis: per user, the delay from FIRST view to
# FIRST subsequent purchase, in whole minutes.  p25/p50/p75/p90 as
# exact inverse-CDF order statistics on the (lag_min, count) DOMAIN
# table — the window is bounded by the minute domain (span-capped:
# ~43 k values per observed month, independent of row count), the
# sentence_length_quantiles discipline.


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    per = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", tsu)).alias("tv"),
            F.min(F.when(F.col("event_type") == "purchase", tsu)).alias(
                "tp"
            ),
        )
        .filter(
            F.col("tv").isNotNull()
            & F.col("tp").isNotNull()
            & (F.col("tp") > F.col("tv"))
        )
        .select(
            F.floor((F.col("tp") - F.col("tv")) / 60_000_000)
            .cast("long")
            .alias("lag_min")
        )
    )
    cnt = per.groupBy("lag_min").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy("lag_min")
    cum = cnt.withColumn(
        "cum", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("c").over(Window.partitionBy()))
    qs = cum.withColumn(
        "q_pct",
        F.explode(F.array(F.lit(25), F.lit(50), F.lit(75), F.lit(90))),
    )
    k = F.expr("((tot - 1) * q_pct) div 100") + 1
    hit = qs.filter(((F.col("cum") - F.col("c")) < k) & (k <= F.col("cum")))
    return hit.select(
        F.col("q_pct").cast("long").alias("q_pct"),
        F.col("tot").cast("long").alias("n_users"),
        F.col("lag_min").cast("long").alias("lag_min"),
    ).orderBy("q_pct")


SQL_CONVERSION_LAG = """
WITH per AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view'
                  THEN CAST(epoch_us(ts) AS BIGINT) END) AS tv,
         min(CASE WHEN event_type = 'purchase'
                  THEN CAST(epoch_us(ts) AS BIGINT) END) AS tp
  FROM events
  WHERE event_type IN ('view', 'purchase')
  GROUP BY user_id
), lags AS (
  SELECT CAST(floor(CAST(tp - tv AS DOUBLE) / 60000000) AS BIGINT)
           AS lag_min
  FROM per
  WHERE tv IS NOT NULL AND tp IS NOT NULL AND tp > tv
), cnt AS (
  SELECT lag_min, count(*) AS c FROM lags GROUP BY 1
), cum AS (
  SELECT lag_min, c,
         sum(c) OVER (ORDER BY lag_min) AS cum,
         sum(c) OVER () AS tot
  FROM cnt
), qs AS (
  SELECT lag_min, cum, cum - c AS prev, tot, q_pct,
         ((tot - 1) * q_pct) // 100 + 1 AS k
  FROM cum, (VALUES (25), (50), (75), (90)) q(q_pct)
)
SELECT CAST(q_pct AS BIGINT) AS q_pct, CAST(tot AS BIGINT) AS n_users,
       CAST(lag_min AS BIGINT) AS lag_min
FROM qs
WHERE prev < k AND k <= cum
ORDER BY q_pct
"""


# ---------------------------------------------------------------------------
# user_lifetime_profile — lifetime span / active-day / intensity quantiles
# ---------------------------------------------------------------------------
# Cohort-lifetime shape audit: per user, the active span in days
# (last - first + 1), the count of distinct active days, and the
# events-per-active-day intensity (integer div, exact).  Each metric's
# p50/p90 come off its own value-domain count table (spans and day
# counts are span-capped domains; intensity is count-capped) — exact
# order statistics, no corpus-sized windows.


def q_user_lifetime_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
    ).cast("long")
    per = ev.groupBy("user_id").agg(
        (F.max(day) - F.min(day) + 1).alias("span_d"),
        F.countDistinct(day).alias("active_d"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    per = per.withColumn(
        "intensity", F.floor(F.col("n_ev") / F.col("active_d")).cast("long")
    )
    metrics = per.select(
        F.explode(
            F.create_map(
                F.lit("span_d"),
                F.col("span_d").cast("long"),
                F.lit("active_d"),
                F.col("active_d").cast("long"),
                F.lit("intensity"),
                F.col("intensity"),
            )
        ).alias("metric", "v")
    )
    cnt = metrics.groupBy("metric", "v").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("metric").orderBy("v")
    wn = Window.partitionBy("metric")
    cum = cnt.withColumn(
        "cum", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("c").over(wn))
    qs = cum.withColumn(
        "q_pct", F.explode(F.array(F.lit(50), F.lit(90)))
    )
    k = F.expr("((tot - 1) * q_pct) div 100") + 1
    hit = qs.filter(((F.col("cum") - F.col("c")) < k) & (k <= F.col("cum")))
    return hit.select(
        "metric",
        F.col("q_pct").cast("long").alias("q_pct"),
        F.col("tot").cast("long").alias("n_users"),
        F.col("v").cast("long").alias("v"),
    ).orderBy("metric", "q_pct")


SQL_LIFETIME = """
WITH per AS (
  SELECT user_id,
         max(CAST(floor(epoch(ts) / 86400) AS BIGINT))
           - min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) + 1 AS span_d,
         CAST(count(DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT))
              AS BIGINT) AS active_d,
         CAST(count(*) AS BIGINT) AS n_ev
  FROM events GROUP BY user_id
), metrics AS (
  SELECT 'span_d' AS metric, span_d AS v FROM per
  UNION ALL
  SELECT 'active_d' AS metric, active_d AS v FROM per
  UNION ALL
  SELECT 'intensity' AS metric, n_ev // active_d AS v FROM per
), cnt AS (
  SELECT metric, v, count(*) AS c FROM metrics GROUP BY 1, 2
), cum AS (
  SELECT metric, v, c,
         sum(c) OVER (PARTITION BY metric ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY metric) AS tot
  FROM cnt
), qs AS (
  SELECT metric, v, cum, cum - c AS prev, tot, q_pct,
         ((tot - 1) * q_pct) // 100 + 1 AS k
  FROM cum, (VALUES (50), (90)) q(q_pct)
)
SELECT metric, CAST(q_pct AS BIGINT) AS q_pct, CAST(tot AS BIGINT)
         AS n_users, CAST(v AS BIGINT) AS v
FROM qs
WHERE prev < k AND k <= cum
ORDER BY metric, q_pct
"""


# ---------------------------------------------------------------------------
# gpd_fit — peaks-over-threshold GPD fit by method of moments
# ---------------------------------------------------------------------------
# Pickands (Ann Stat 3, 1975) / Hosking & Wallis (Technometrics 29,
# 1987 MoM): over exceedances e = y - u above the exact p90 day-count
# threshold, xi = (1 - mean^2/var) / 2 and beta = mean (mean^2/var
# + 1) / 2.  The threshold is an exact inverse-CDF order statistic on
# the (key, count) value-domain table; exceedance moments are exact
# BIGINT sums (population variance, documented); the xi/beta chain is
# fixed-order doubles.


def q_gpd_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    cnt = daily.groupBy("event_type", "y").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("y")
    wn = Window.partitionBy("event_type")
    cum = cnt.withColumn(
        "cum", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("c").over(wn))
    k = F.expr("((tot - 1) * 90) div 100") + 1
    u = (
        cum.filter(((F.col("cum") - F.col("c")) < k) & (k <= F.col("cum")))
        .select("event_type", F.col("y").alias("u"))
    )
    exc = daily.join(F.broadcast(u), "event_type").filter(
        F.col("y") > F.col("u")
    )
    agg = exc.groupBy("event_type").agg(
        F.max("u").alias("u"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y") - F.col("u")).alias("se"),
        F.sum((F.col("y") - F.col("u")) * (F.col("y") - F.col("u"))).alias(
            "see"
        ),
    )
    nd = F.col("n").cast("double")
    mean = F.col("se").cast("double") / nd
    var = (F.col("n") * F.col("see") - F.col("se") * F.col("se")).cast(
        "double"
    ) / (nd * nd)
    ratio = mean * mean / var
    xi = 0.5 * (1.0 - ratio)
    beta = 0.5 * mean * (ratio + 1.0)
    return (
        agg.filter((F.col("n") >= 3) & (var > 0))
        .select(
            "event_type",
            F.col("u").cast("long").alias("u"),
            F.col("n").cast("long").alias("n_exc"),
            F.floor(xi * 10_000 + F.lit(_OFF)).cast("long").alias("xi_e4"),
            F.floor(beta * 10_000 + F.lit(_OFF)).cast("long").alias(
                "beta_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_GPD = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS y
  FROM events GROUP BY 1, 2
), cnt AS (
  SELECT event_type, y, count(*) AS c FROM daily GROUP BY 1, 2
), cum AS (
  SELECT event_type, y, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY y) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS tot
  FROM cnt
), u AS (
  SELECT event_type, y AS u
  FROM cum
  WHERE cum - c < ((tot - 1) * 90) // 100 + 1
    AND ((tot - 1) * 90) // 100 + 1 <= cum
), agg AS (
  SELECT d.event_type, max(u.u) AS u, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d.y - u.u) AS BIGINT) AS se,
         CAST(sum((d.y - u.u) * (d.y - u.u)) AS BIGINT) AS see
  FROM daily d JOIN u ON u.event_type = d.event_type
  WHERE d.y > u.u
  GROUP BY 1
)
SELECT event_type, CAST(u AS BIGINT) AS u, n AS n_exc,
       CAST(floor(0.5 * (1.0 - (CAST(se AS DOUBLE) / n)
                               * (CAST(se AS DOUBLE) / n)
                               / (CAST(n * see - se * se AS DOUBLE)
                                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                  * 10000 + {_OFF}) AS BIGINT) AS xi_e4,
       CAST(floor(0.5 * (CAST(se AS DOUBLE) / n)
                  * ((CAST(se AS DOUBLE) / n) * (CAST(se AS DOUBLE) / n)
                     / (CAST(n * see - se * se AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) + 1.0)
                  * 10000 + {_OFF}) AS BIGINT) AS beta_e4
FROM agg
WHERE n >= 3 AND n * see - se * se > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# variance_time_plot — aggregated-variance LRD estimator (variance-time)
# ---------------------------------------------------------------------------
# Beran (Statistics for Long-Memory Processes, 1994 §4.4) / Leland et
# al. (ToN 2, 1994): the variance of m-block means decays like
# m^(2H - 2); the log-log slope over block sizes {1,3,6,12,24} h gives
# H = 1 + slope/2.  Block moments reuse the fano_factor discipline
# (one shared hourly agg, span-derived n folds empty blocks exactly);
# per-size ln(var) and ln(m) are e9-floored BIGINTs, so the 5-point
# OLS runs on exact integer sums.


def q_variance_time_plot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000))
        .cast("long")
        .alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    sized = hourly.withColumn(
        "m",
        F.explode(
            F.array(F.lit(1), F.lit(3), F.lit(6), F.lit(12), F.lit(24))
        ),
    )
    blocks = sized.groupBy(
        "event_type",
        "m",
        F.floor(F.col("h") / F.col("m")).cast("long").alias("b"),
    ).agg(F.sum("c").alias("cb"))
    per = blocks.groupBy("event_type", "m").agg(
        (F.max("b") - F.min("b") + 1).alias("n"),
        F.sum("cb").alias("sc"),
        F.sum(F.col("cb") * F.col("cb")).alias("scc"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    varm = (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")).cast(
        "double"
    ) / (nd * nd * md * md)
    per = per.filter(
        (F.col("n") >= 2)
        & ((F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")) > 0)
    ).select(
        "event_type",
        F.floor(F.log(md) * 1e9 + F.lit(_OFF)).cast("long").alias("x9"),
        F.floor(F.log(varm) * 1e9 + F.lit(_OFF)).cast("long").alias("y9"),
    )
    xd = F.col("x9").cast("double") / 1e9
    yd = F.col("y9").cast("double") / 1e9
    per = per.withColumn(
        "xy9", F.floor(xd * yd * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn("xx9", F.floor(xd * xd * 1e9 + F.lit(_OFF)).cast("long"))
    agg = per.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
        F.sum("xy9").alias("sxy"),
        F.sum("xx9").alias("sxx"),
    )
    n2 = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / 1e9
    sy = F.col("sy").cast("double") / 1e9
    sxy = F.col("sxy").cast("double") / 1e9
    sxx = F.col("sxx").cast("double") / 1e9
    slope = (n2 * sxy - sx * sy) / (n2 * sxx - sx * sx)
    hurst = 1.0 + slope / 2.0
    return (
        agg.filter((n2 * sxx - sx * sx) > 0)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_sizes"),
            F.floor(slope * 10_000 + F.lit(_OFF)).cast("long").alias(
                "slope_e4"
            ),
            F.floor(hurst * 10_000 + F.lit(_OFF)).cast("long").alias(
                "hurst_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_VARIANCE_TIME = f"""
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         count(*) AS c
  FROM events GROUP BY 1, 2
), sized AS (
  SELECT event_type, h, c, s.m
  FROM hourly CROSS JOIN (VALUES (1), (3), (6), (12), (24)) AS s(m)
), blocks AS (
  SELECT event_type, m,
         CAST(floor(CAST(h AS DOUBLE) / m) AS BIGINT) AS b,
         CAST(sum(c) AS BIGINT) AS cb
  FROM sized GROUP BY 1, 2, 3
), per AS (
  SELECT event_type, m,
         CAST(max(b) - min(b) + 1 AS BIGINT) AS n,
         CAST(sum(cb) AS BIGINT) AS sc,
         CAST(sum(cb * cb) AS BIGINT) AS scc
  FROM blocks GROUP BY 1, 2
), pts AS (
  SELECT event_type,
         CAST(floor(ln(CAST(m AS DOUBLE)) * 1e9 + {_OFF}) AS BIGINT) AS x9,
         CAST(floor(ln(CAST(n * scc - sc * sc AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
                    * 1e9 + {_OFF}) AS BIGINT) AS y9
  FROM per
  WHERE n >= 2 AND n * scc - sc * sc > 0
), p9 AS (
  SELECT event_type, x9, y9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9)
                    * (CAST(y9 AS DOUBLE) / 1e9) * 1e9 + {_OFF})
              AS BIGINT) AS xy9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9)
                    * (CAST(x9 AS DOUBLE) / 1e9) * 1e9 + {_OFF})
              AS BIGINT) AS xx9
  FROM pts
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x9) AS BIGINT) AS sx, CAST(sum(y9) AS BIGINT) AS sy,
         CAST(sum(xy9) AS BIGINT) AS sxy, CAST(sum(xx9) AS BIGINT) AS sxx
  FROM p9 GROUP BY 1
)
SELECT event_type, n AS n_sizes,
       CAST(floor((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                   - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
                  / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                     - (CAST(sx AS DOUBLE) / 1e9)
                       * (CAST(sx AS DOUBLE) / 1e9))
                  * 10000 + {_OFF}) AS BIGINT) AS slope_e4,
       CAST(floor((1.0 + (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                          - (CAST(sx AS DOUBLE) / 1e9)
                            * (CAST(sy AS DOUBLE) / 1e9))
                         / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                            - (CAST(sx AS DOUBLE) / 1e9)
                              * (CAST(sx AS DOUBLE) / 1e9)) / 2.0)
                  * 10000 + {_OFF}) AS BIGINT) AS hurst_e4
FROM agg
WHERE CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
      - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9) > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# dup_family_sizes — exact-duplicate family-size histogram
# ---------------------------------------------------------------------------
# The dedup economics complement to dedup_savings (which reports
# per-lang savings): the SIZE DISTRIBUTION of exact-hash duplicate
# families over the whole corpus — how much of the corpus sits in
# families of size 1, 2, 3, ...  One combinable md5 groupBy then a
# histogram groupBy; share is the only division.


def q_dup_family_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    d = _documents(spark, sf_dir).select("text")
    fam = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    hist = fam.groupBy("sz").agg(F.count(F.lit(1)).alias("n_families"))
    tot = hist.agg(
        F.sum(F.col("sz") * F.col("n_families")).alias("n_total")
    )
    out = hist.crossJoin(F.broadcast(tot))
    share = (F.col("sz") * F.col("n_families")).cast("double") / F.col(
        "n_total"
    ).cast("double")
    return out.select(
        F.col("sz").cast("long").alias("family_size"),
        F.col("n_families").cast("long").alias("n_families"),
        (F.col("sz") * F.col("n_families")).cast("long").alias("n_docs"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "share_e6"
        ),
    ).orderBy("family_size")


SQL_DUP_FAMILY = f"""
WITH fam AS (
  SELECT md5(text) AS h, count(*) AS sz FROM documents GROUP BY 1
), hist AS (
  SELECT sz, CAST(count(*) AS BIGINT) AS n_families FROM fam GROUP BY 1
), tot AS (
  SELECT CAST(sum(sz * n_families) AS BIGINT) AS n_total FROM hist
)
SELECT CAST(sz AS BIGINT) AS family_size, n_families,
       CAST(sz * n_families AS BIGINT) AS n_docs,
       CAST(floor(CAST(sz * n_families AS DOUBLE) / n_total * 1000000
                  + {_OFF}) AS BIGINT) AS share_e6
FROM hist CROSS JOIN tot
ORDER BY family_size
"""


# ---------------------------------------------------------------------------
# twonn_intrinsic_dim — TwoNN intrinsic dimension per embedding label
# ---------------------------------------------------------------------------
# Facco, d'Errico, Rodriguez & Laio (Sci Rep 7, 2017): with r1, r2 the
# 1st/2nd-NN distances of each point, ID = n / sum ln(r2/r1).  NN
# search is BLOCKED on the label column (per-cluster ID, the house
# never-all-pairs posture); squared distances ride the Arrow-batch
# einsum kernel and are rounded to 6 dp BEFORE ranking (the
# ann_cosine_topk tie discipline), so NN choice and the e9-floored
# ln-ratio terms are engine-deterministic.


def q_twonn_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round-4 bench-tail repair: shared _l2_topk_rows kernel (raw
    # einsum distances, slack preselect), rounded ordering unchanged.
    from diive_spark.queries_embeddings import _l2_topk_rows

    pairs = _l2_topk_rows(spark, sf_dir, 2).select(
        "label",
        "vec_id",
        "cand_id",
        F.round(F.col("d2raw"), 6).alias("d2"),
    )
    wo = Window.partitionBy("label", "vec_id").orderBy(
        F.col("d2").asc(), F.col("cand_id").asc()
    )
    nn = pairs.withColumn("rk", F.row_number().over(wo)).filter(
        F.col("rk") <= 2
    )
    two = (
        nn.groupBy("label", "vec_id")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("d2"))).alias("d1"),
            F.min(F.when(F.col("rk") == 2, F.col("d2"))).alias("d2nd"),
        )
        .filter((F.col("d1") > 0) & F.col("d2nd").isNotNull())
    )
    two = two.withColumn(
        "t9",
        F.floor(0.5 * F.log(F.col("d2nd") / F.col("d1")) * 1e9 + F.lit(_OFF))
        .cast("long"),
    )
    agg = two.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t9").alias("s9"),
    )
    idim = F.col("n").cast("double") / (F.col("s9").cast("double") / 1e9)
    return (
        agg.filter((F.col("n") >= 10) & (F.col("s9") > 0))
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("n").cast("long").alias("n_points"),
            F.floor(idim * 10_000 + F.lit(_OFF)).cast("long").alias(
                "id_e4"
            ),
        )
        .orderBy("label")
    )


SQL_TWONN = f"""
WITH pairs AS (
  SELECT a.label, a.vec_id, b.vec_id AS cand_id,
         round(list_sum(list_transform(
           generate_series(1, len(a.embedding)),
           i -> (CAST(a.embedding[i] AS DOUBLE)
                 - CAST(b.embedding[i] AS DOUBLE))
                * (CAST(a.embedding[i] AS DOUBLE)
                   - CAST(b.embedding[i] AS DOUBLE)))), 6) AS d2
  FROM embeddings a JOIN embeddings b
    ON b.label = a.label AND b.vec_id <> a.vec_id
), nn AS (
  SELECT label, vec_id, d2,
         row_number() OVER (PARTITION BY label, vec_id
                            ORDER BY d2 ASC, cand_id ASC) AS rk
  FROM pairs
), two AS (
  SELECT label, vec_id,
         min(CASE WHEN rk = 1 THEN d2 END) AS d1,
         min(CASE WHEN rk = 2 THEN d2 END) AS d2nd
  FROM nn WHERE rk <= 2 GROUP BY 1, 2
), terms AS (
  SELECT label,
         CAST(floor(0.5 * ln(d2nd / d1) * 1e9 + {_OFF}) AS BIGINT) AS t9
  FROM two WHERE d1 > 0 AND d2nd IS NOT NULL
), agg AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t9) AS BIGINT) AS s9
  FROM terms GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label, n AS n_points,
       CAST(floor(CAST(n AS DOUBLE) / (CAST(s9 AS DOUBLE) / 1e9)
                  * 10000 + {_OFF}) AS BIGINT) AS id_e4
FROM agg
WHERE n >= 10 AND s9 > 0
ORDER BY label
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "permutation_entropy": q_permutation_entropy,
    "variogram_profile": q_variogram_profile,
    "rayleigh_diel": q_rayleigh_diel,
    "its_segmented": q_its_segmented,
    "ad_two_sample": q_ad_two_sample,
    "url_depth_profile": q_url_depth_profile,
    "theil_decomposition": q_theil_decomposition,
    "weibull_gap_fit": q_weibull_gap_fit,
    "cronbach_alpha": q_cronbach_alpha,
    "cox_stuart": q_cox_stuart,
    "hodges_lehmann": q_hodges_lehmann,
    "diel_phase_drift": q_diel_phase_drift,
    "burrows_delta": q_burrows_delta,
    "recurrence_rate": q_recurrence_rate,
    "poincare_sd": q_poincare_sd,
    "fano_factor": q_fano_factor,
    "rfm_segments": q_rfm_segments,
    "bass_diffusion": q_bass_diffusion,
    "conversion_lag": q_conversion_lag,
    "user_lifetime_profile": q_user_lifetime_profile,
    "gpd_fit": q_gpd_fit,
    "variance_time_plot": q_variance_time_plot,
    "dup_family_sizes": q_dup_family_sizes,
    "twonn_intrinsic_dim": q_twonn_intrinsic_dim,
}

ORACLE_SQL: dict[str, str] = {
    "permutation_entropy": SQL_PERMUTATION_ENTROPY,
    "variogram_profile": SQL_VARIOGRAM,
    "rayleigh_diel": SQL_RAYLEIGH,
    "its_segmented": SQL_ITS,
    "ad_two_sample": SQL_AD_TWO_SAMPLE,
    "url_depth_profile": SQL_URL_DEPTH,
    "theil_decomposition": SQL_THEIL,
    "weibull_gap_fit": SQL_WEIBULL,
    "cronbach_alpha": SQL_CRONBACH,
    "cox_stuart": SQL_COX_STUART,
    "hodges_lehmann": SQL_HODGES_LEHMANN,
    "diel_phase_drift": SQL_PHASE_DRIFT,
    "burrows_delta": SQL_BURROWS_DELTA,
    "recurrence_rate": SQL_RECURRENCE,
    "poincare_sd": SQL_POINCARE,
    "fano_factor": SQL_FANO,
    "rfm_segments": SQL_RFM,
    "bass_diffusion": SQL_BASS,
    "conversion_lag": SQL_CONVERSION_LAG,
    "user_lifetime_profile": SQL_LIFETIME,
    "gpd_fit": SQL_GPD,
    "variance_time_plot": SQL_VARIANCE_TIME,
    "dup_family_sizes": SQL_DUP_FAMILY,
    "twonn_intrinsic_dim": SQL_TWONN,
}
