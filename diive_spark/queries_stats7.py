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
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(h) for h in (1, 2, 3, 6, 12, 24)])).alias(
            "lag_h"
        )
    )
    left = hourly.crossJoin(F.broadcast(lags)).withColumn(
        "t2", F.col("t") + F.col("lag_h") * 3600
    )
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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "permutation_entropy": q_permutation_entropy,
    "variogram_profile": q_variogram_profile,
    "rayleigh_diel": q_rayleigh_diel,
    "its_segmented": q_its_segmented,
}

ORACLE_SQL: dict[str, str] = {
    "permutation_entropy": SQL_PERMUTATION_ENTROPY,
    "variogram_profile": SQL_VARIOGRAM,
    "rayleigh_diel": SQL_RAYLEIGH,
    "its_segmented": SQL_ITS,
}
