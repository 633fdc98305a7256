"""Round-4k query registry: variance changepoints, rank randomness,
unseen-vocabulary extrapolation, and diversity profiles — CUSUM of
squares, the Bartels rank von Neumann ratio, the Good-Toulmin doubling
estimate, and Hill numbers (q = 0, 1, 2).

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)``, derived
doubles floor-scaled with the house 1/pi offset; entropy-style ln sums
over bounded term sets use half-up scaling with the documented n*ulp
margin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF, _documents

# ---------------------------------------------------------------------------
# cusum_squares — Brown-Durbin-Evans CUSUM-of-squares variance break
# ---------------------------------------------------------------------------
# Brown, Durbin & Evans (JRSS-B 1975): the excursion of the cumulative
# squared-deviation share from the uniform line flags VARIANCE breaks
# that a mean-CUSUM misses.  With u_t = (n*c_t - S)^2 exact BIGINTs,
# the statistic max_t |U*cum_t(u) - t*U_tot| / (U_tot) ... kept exact:
# argmax over D_t = |n_obs * cum_t - t * U_tot| (scale-free integer),
# the reported excursion one division.  Break day = earliest argmax.


def q_cusum_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wn = Window.partitionBy("event_type")
    d = daily.withColumn("n", F.count(F.lit(1)).over(wn)).withColumn(
        "s", F.sum("c").over(wn)
    )
    d = d.withColumn(
        "u",
        (F.col("n") * F.col("c") - F.col("s"))
        * (F.col("n") * F.col("c") - F.col("s")),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    d = (
        d.withColumn("t", F.row_number().over(wo))
        .withColumn(
            "cum",
            F.sum("u").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("utot", F.sum("u").over(wn))
    )
    d = d.withColumn(
        "dev", F.abs(F.col("n") * F.col("cum") - F.col("t") * F.col("utot"))
    )
    d = d.withColumn("mx", F.max("dev").over(wn))
    top = (
        d.filter(F.col("dev") == F.col("mx"))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.min("day").alias("break_day"),
            F.max("mx").alias("mx"),
            F.max("utot").alias("utot"),
        )
    )
    exc = F.col("mx").cast("double") / (
        F.col("n").cast("double") * F.col("utot").cast("double")
    )
    return (
        top.filter(F.col("utot") > 0)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("break_day").cast("long").alias("break_day"),
            F.floor(exc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "excursion_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_CUSUM_SQ = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day, c,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS s
  FROM daily
), u AS (
  SELECT event_type, day, n, (n * c - s) * (n * c - s) AS u FROM d
), cumt AS (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         sum(u) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(u) OVER (PARTITION BY event_type) AS utot
  FROM u
), dev AS (
  SELECT event_type, day, n, utot,
         abs(n * cum - t * utot) AS dev,
         max(abs(n * cum - t * utot))
           OVER (PARTITION BY event_type) AS mx
  FROM cumt
), top AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         min(day) AS break_day, CAST(max(mx) AS BIGINT) AS mx,
         CAST(max(utot) AS BIGINT) AS utot
  FROM dev WHERE dev = mx GROUP BY 1
)
SELECT event_type, n, CAST(break_day AS BIGINT) AS break_day,
       CAST(floor(CAST(mx AS DOUBLE) / (CAST(n AS DOUBLE) * utot)
                  * 1000000 + {_OFF}) AS BIGINT) AS excursion_e6
FROM top
WHERE utot > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# bartels_rvn — Bartels rank von Neumann randomness test
# ---------------------------------------------------------------------------
# Bartels (JASA 1982): the rank version of the von Neumann ratio, RVN
# = sum (r_t - r_{t+1})^2 / sum (r_t - rbar)^2 on day-ordered average
# ranks.  With the exact 2*avgrank integer q_t: numerator sum
# (q_t - q_{t+1})^2 and denominator sum (q_t - qbar)^2 = sum q^2 -
# (sum q)^2/n are EXACT up to the single final division (qbar = n+1
# exactly, sum q = n(n+1)).


def q_bartels_rvn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wr = Window.partitionBy("event_type").orderBy("c")
    wt = Window.partitionBy("event_type", "c")
    r = daily.withColumn("minrk", F.rank().over(wr)).withColumn(
        "tie", F.count(F.lit(1)).over(wt)
    )
    r = r.withColumn("q", 2 * F.col("minrk") + F.col("tie") - 1)
    wo = Window.partitionBy("event_type").orderBy("day")
    p = r.withColumn("q_nxt", F.lead("q").over(wo))
    agg = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(
            F.when(
                F.col("q_nxt").isNotNull(),
                (F.col("q") - F.col("q_nxt")) * (F.col("q") - F.col("q_nxt")),
            ).otherwise(F.lit(0))
        ).alias("num"),
    )
    den = (F.col("sqq") - (F.col("sq") * F.col("sq")) / F.col("n")).cast(
        "double"
    )
    rvn = F.col("num").cast("double") / den
    return (
        agg.filter((F.col("n") >= 10) & (den > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("num").cast("long").alias("num4"),
            F.floor(rvn * 10_000 + F.lit(_OFF)).cast("long").alias(
                "rvn_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_BARTELS = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, day,
         2 * rank() OVER (PARTITION BY event_type ORDER BY c)
           + count(*) OVER (PARTITION BY event_type, c) - 1 AS q
  FROM daily
), p AS (
  SELECT event_type, q,
         lead(q) OVER (PARTITION BY event_type ORDER BY day) AS q_nxt
  FROM r
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(q) AS BIGINT) AS sq,
         CAST(sum(q * q) AS BIGINT) AS sqq,
         CAST(sum(CASE WHEN q_nxt IS NOT NULL
                       THEN (q - q_nxt) * (q - q_nxt) ELSE 0 END)
              AS BIGINT) AS num
  FROM p GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n, num AS num4,
       CAST(floor(CAST(num AS DOUBLE)
                  / CAST(sqq - CAST(sq * sq AS DOUBLE) / n AS DOUBLE)
                  * 10000 + {_OFF}) AS BIGINT) AS rvn_e4
FROM agg
WHERE n >= 10 AND sqq - CAST(sq * sq AS DOUBLE) / n > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# good_toulmin — unseen-vocabulary extrapolation at corpus doubling
# ---------------------------------------------------------------------------
# Good & Toulmin (Biometrika 1956): the expected NEW vocabulary when
# the corpus doubles is the alternating frequency-spectrum sum
# sum_{k>=1} (-1)^{k+1} V_k, truncated at K = 10 (the standard
# Efron-Thisted truncation at this scale) — exact integers end to end;
# complements chao1_richness / good_turing's unseen-mass estimate.

_GT_K = 10


def q_good_toulmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    freq = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    spec = freq.filter(F.col("m") <= _GT_K).groupBy("lang", "m").agg(
        F.count(F.lit(1)).alias("vk")
    )
    sign = F.when(F.col("m") % 2 == 1, F.col("vk")).otherwise(-F.col("vk"))
    agg = spec.groupBy("lang").agg(F.sum(sign).alias("delta_v"))
    tot = freq.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v"), F.sum("m").alias("n")
    )
    j = tot.join(agg, "lang", "left").fillna(0, subset=["delta_v"])
    growth = F.col("delta_v").cast("double") / F.col("v").cast("double")
    return j.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("v").cast("long").alias("v"),
        F.col("delta_v").cast("long").alias("delta_v"),
        F.floor(growth * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "growth_e6"
        ),
    ).orderBy("lang")


SQL_GOOD_TOULMIN = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), freq AS (
  SELECT lang, w, count(*) AS m FROM toks GROUP BY 1, 2
), spec AS (
  SELECT lang, m, count(*) AS vk
  FROM freq WHERE m <= {_GT_K} GROUP BY 1, 2
), alt AS (
  SELECT lang,
         CAST(sum(CASE WHEN m % 2 = 1 THEN vk ELSE -vk END) AS BIGINT)
           AS delta_v
  FROM spec GROUP BY 1
), tot AS (
  SELECT lang, count(*) AS v, CAST(sum(m) AS BIGINT) AS n
  FROM freq GROUP BY 1
)
SELECT tot.lang, n, CAST(v AS BIGINT) AS v,
       coalesce(delta_v, 0) AS delta_v,
       CAST(floor(CAST(coalesce(delta_v, 0) AS DOUBLE) / v * 1000000
                  + {_OFF}) AS BIGINT) AS growth_e6
FROM tot LEFT JOIN alt ON alt.lang = tot.lang
ORDER BY tot.lang
"""


# ---------------------------------------------------------------------------
# hill_numbers — vocabulary diversity profile (Hill 1973): q = 0, 1, 2
# ---------------------------------------------------------------------------
# D0 = richness (exact), D1 = exp(Shannon entropy) (ln fold over the
# vocabulary — n*ulp against the e2 grid, documented), D2 = inverse
# Simpson = N^2 / sum m^2 (exact rational).  The ecology-standard
# diversity profile on the term distribution per language.


def q_hill_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    freq = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    wn = Window.partitionBy("lang")
    t = freq.withColumn("n", F.sum("m").over(wn))
    p = F.col("m").cast("double") / F.col("n").cast("double")
    agg = t.groupBy("lang").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("d0"),
        F.sum(-p * F.log(p)).alias("h"),
        F.sum(F.col("m") * F.col("m")).alias("s2"),
    )
    d1 = F.exp(F.col("h"))
    d2 = F.col("n").cast("double") * F.col("n") / F.col("s2")
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("d0").cast("long").alias("d0"),
        F.floor(d1 * 100 + F.lit(0.5)).cast("long").alias("d1_e2"),
        F.floor(d2 * 100 + F.lit(0.5)).cast("long").alias("d2_e2"),
    ).orderBy("lang")


SQL_HILL_NUMBERS = """
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), freq AS (
  SELECT lang, w, count(*) AS m FROM toks GROUP BY 1, 2
), t AS (
  SELECT lang, m, sum(m) OVER (PARTITION BY lang) AS n FROM freq
), agg AS (
  SELECT lang, CAST(max(n) AS BIGINT) AS n, count(*) AS d0,
         sum(-(CAST(m AS DOUBLE) / n) * ln(CAST(m AS DOUBLE) / n)) AS h,
         CAST(sum(m * m) AS BIGINT) AS s2
  FROM t GROUP BY 1
)
SELECT lang, n, CAST(d0 AS BIGINT) AS d0,
       CAST(floor(exp(h) * 100 + 0.5) AS BIGINT) AS d1_e2,
       CAST(floor(CAST(n AS DOUBLE) * n / s2 * 100 + 0.5) AS BIGINT)
         AS d2_e2
FROM agg
ORDER BY lang
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cusum_squares": q_cusum_squares,
    "bartels_rvn": q_bartels_rvn,
    "good_toulmin": q_good_toulmin,
    "hill_numbers": q_hill_numbers,
}

ORACLE_SQL: dict[str, str] = {
    "cusum_squares": SQL_CUSUM_SQ,
    "bartels_rvn": SQL_BARTELS,
    "good_toulmin": SQL_GOOD_TOULMIN,
    "hill_numbers": SQL_HILL_NUMBERS,
}
