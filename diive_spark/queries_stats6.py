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


# ---------------------------------------------------------------------------
# transfer_entropy — lag-1 binary transfer entropy between type pairs
# ---------------------------------------------------------------------------
# Schreiber (PRL 2000) on above-median day states: TE(B->A) =
# sum p(a', a, b) * ln[ p(a'|a,b) / p(a'|a) ] over the 8 joint cells —
# every probability an exact integer ratio off the day-grid join, the
# ln arguments exact rationals (c_aab * c_a) / (c_ab * c_aa'); asym-
# metric, both directions emitted.


def q_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.partitionBy("event_type").orderBy("c", "day")
    wn = Window.partitionBy("event_type")
    r = daily.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(
        F.col("rk") == F.floor((F.col("nn") - 1) / 2) + 1
    ).select("event_type", F.col("c").alias("med"))
    st = daily.join(F.broadcast(med), "event_type").select(
        "event_type", "day", (F.col("c") > F.col("med")).cast("long").alias("s")
    )
    a = st.alias("a")
    b = st.alias("b")
    an = st.select(
        F.col("event_type").alias("ta"),
        (F.col("day") - 1).alias("day"),
        F.col("s").alias("a_nxt"),
    ).alias("an")
    trip = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .join(
            an,
            (F.col("an.ta") == F.col("a.event_type"))
            & (F.col("an.day") == F.col("a.day")),
        )
        .select(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
            F.col("a.s").alias("sa"),
            F.col("b.s").alias("sb"),
            F.col("a_nxt").alias("sn"),
        )
    )
    cells = trip.groupBy("ta", "tb", "sa", "sb", "sn").agg(
        F.count(F.lit(1)).alias("c3")
    )
    wp = Window.partitionBy("ta", "tb")
    t = (
        cells.withColumn("n", F.sum("c3").over(wp))
        .withColumn(
            "c_ab", F.sum("c3").over(Window.partitionBy("ta", "tb", "sa", "sb"))
        )
        .withColumn(
            "c_a", F.sum("c3").over(Window.partitionBy("ta", "tb", "sa"))
        )
        .withColumn(
            "c_an", F.sum("c3").over(Window.partitionBy("ta", "tb", "sa", "sn"))
        )
    )
    term = (
        F.col("c3").cast("double")
        / F.col("n")
        * F.log(
            F.col("c3").cast("double")
            * F.col("c_a")
            / (F.col("c_ab").cast("double") * F.col("c_an"))
        )
    )
    agg = t.groupBy("ta", "tb").agg(
        F.max("n").alias("n"), F.sum(term).alias("te")
    )
    return (
        agg.filter(F.col("n") >= 10)
        .select(
            "ta",
            "tb",
            F.col("n").cast("long").alias("n"),
            F.floor(F.col("te") * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("te_e6"),
        )
        .orderBy("ta", "tb")
    )


SQL_TRANSFER_ENTROPY = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM daily
), med AS (
  SELECT event_type, c AS med FROM r WHERE rk = (nn - 1) // 2 + 1
), st AS (
  SELECT daily.event_type, daily.day,
         CASE WHEN daily.c > med.med THEN 1 ELSE 0 END AS s
  FROM daily JOIN med ON med.event_type = daily.event_type
), trip AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         a.s AS sa, b.s AS sb, an.s AS sn
  FROM st a
  JOIN st b ON b.day = a.day AND b.event_type <> a.event_type
  JOIN st an ON an.event_type = a.event_type AND an.day = a.day + 1
), cells AS (
  SELECT ta, tb, sa, sb, sn, count(*) AS c3
  FROM trip GROUP BY 1, 2, 3, 4, 5
), t AS (
  SELECT ta, tb, c3,
         sum(c3) OVER (PARTITION BY ta, tb) AS n,
         sum(c3) OVER (PARTITION BY ta, tb, sa, sb) AS c_ab,
         sum(c3) OVER (PARTITION BY ta, tb, sa) AS c_a,
         sum(c3) OVER (PARTITION BY ta, tb, sa, sn) AS c_an
  FROM cells
)
SELECT ta, tb, CAST(max(n) AS BIGINT) AS n,
       CAST(floor(sum(CAST(c3 AS DOUBLE) / n
                      * ln(CAST(c3 AS DOUBLE) * c_a
                           / (CAST(c_ab AS DOUBLE) * c_an)))
                  * 1000000 + 0.5) AS BIGINT) AS te_e6
FROM t
GROUP BY 1, 2
HAVING max(n) >= 10
ORDER BY ta, tb
"""


# ---------------------------------------------------------------------------
# rate_ratio — weekday/weekend Poisson rate ratio with log-normal CI
# ---------------------------------------------------------------------------
# The epidemiology standard (Rothman): RR = (s1/n1)/(s2/n2), 95% CI
# exp(ln RR +- 1.96*sqrt(1/s1 + 1/s2)) — all inputs exact integers,
# one expression, z literal identical on both engines.


def q_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lab = daily.withColumn(
        "wkend", (((F.col("day") + 3) % 7) >= 5).cast("long")
    )
    g = lab.groupBy("event_type", "wkend").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
    )
    a = g.filter(F.col("wkend") == 0).select(
        "event_type", F.col("n").alias("n1"), F.col("s").alias("s1")
    )
    b = g.filter(F.col("wkend") == 1).select(
        "event_type", F.col("n").alias("n2"), F.col("s").alias("s2")
    )
    j = a.join(b, "event_type")
    rr = (
        F.col("s1").cast("double") / F.col("n1")
    ) / (F.col("s2").cast("double") / F.col("n2"))
    se = F.sqrt(
        1.0 / F.col("s1").cast("double") + 1.0 / F.col("s2").cast("double")
    )
    lo = F.exp(F.log(rr) - 1.96 * se)
    hi = F.exp(F.log(rr) + 1.96 * se)
    return (
        j.filter((F.col("s1") > 0) & (F.col("s2") > 0))
        .select(
            "event_type",
            F.col("s1").cast("long").alias("s1"),
            F.col("s2").cast("long").alias("s2"),
            F.floor(rr * 10_000 + F.lit(_OFF)).cast("long").alias("rr_e4"),
            F.floor(lo * 10_000 + F.lit(0.5)).cast("long").alias("lo_e4"),
            F.floor(hi * 10_000 + F.lit(0.5)).cast("long").alias("hi_e4"),
        )
        .orderBy("event_type")
    )


SQL_RATE_RATIO = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), lab AS (
  SELECT event_type, c,
         CASE WHEN (day + 3) % 7 >= 5 THEN 1 ELSE 0 END AS wkend
  FROM daily
), g AS (
  SELECT event_type, wkend, count(*) AS n, CAST(sum(c) AS BIGINT) AS s
  FROM lab GROUP BY 1, 2
), j AS (
  SELECT a.event_type, a.n AS n1, a.s AS s1, b.n AS n2, b.s AS s2
  FROM g a JOIN g b ON b.event_type = a.event_type
  WHERE a.wkend = 0 AND b.wkend = 1
), t AS (
  SELECT event_type, s1, s2,
         (CAST(s1 AS DOUBLE) / n1) / (CAST(s2 AS DOUBLE) / n2) AS rr,
         sqrt(1.0 / s1 + 1.0 / s2) AS se
  FROM j WHERE s1 > 0 AND s2 > 0
)
SELECT event_type, s1, s2,
       CAST(floor(rr * 10000 + {_OFF}) AS BIGINT) AS rr_e4,
       CAST(floor(exp(ln(rr) - 1.96 * se) * 10000 + 0.5) AS BIGINT)
         AS lo_e4,
       CAST(floor(exp(ln(rr) + 1.96 * se) * 10000 + 0.5) AS BIGINT)
         AS hi_e4
FROM t
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# uniqueness_risk — k-anonymity of the (favorite type, favorite block)
# ---------------------------------------------------------------------------
# Privacy-risk screening (Sweeney 2002): treat each user's (most-
# frequent event type, most-frequent 6h diel block) as a quasi-
# identifier; report the k-anonymity histogram — share of users in
# equivalence classes of size 1 (unique!), 2-5, and >5.  Favorites are
# deterministic (count desc, value asc); everything exact.


def q_uniqueness_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        (F.hour(F.col("ts").cast("timestamp")) / 6).cast("long").alias("blk"),
    )
    ft = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wt = Window.partitionBy("user_id").orderBy(
        F.desc("c"), F.asc("event_type")
    )
    fav_t = ft.withColumn("rk", F.row_number().over(wt)).filter(
        F.col("rk") == 1
    ).select("user_id", F.col("event_type").alias("fav_type"))
    fb = ev.groupBy("user_id", "blk").agg(F.count(F.lit(1)).alias("c"))
    wb = Window.partitionBy("user_id").orderBy(F.desc("c"), F.asc("blk"))
    fav_b = fb.withColumn("rk", F.row_number().over(wb)).filter(
        F.col("rk") == 1
    ).select("user_id", F.col("blk").alias("fav_blk"))
    qi = fav_t.join(fav_b, "user_id")
    cls = qi.groupBy("fav_type", "fav_blk").agg(
        F.count(F.lit(1)).alias("k")
    )
    agg = cls.groupBy().agg(
        F.sum("k").alias("n_users"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).alias("n_unique"),
        F.sum(
            F.when((F.col("k") >= 2) & (F.col("k") <= 5), F.col("k")).otherwise(
                0
            )
        ).alias("u_2_5"),
        F.sum(F.when(F.col("k") > 5, F.col("k")).otherwise(0)).alias("u_gt5"),
    )
    risk = F.col("n_unique").cast("double") / F.col("n_users").cast("double")
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_classes").cast("long").alias("n_classes"),
        F.col("n_unique").cast("long").alias("n_unique"),
        F.col("u_2_5").cast("long").alias("u_2_5"),
        F.col("u_gt5").cast("long").alias("u_gt5"),
        F.floor(risk * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "risk_e6"
        ),
    )


SQL_UNIQUENESS = f"""
WITH ev AS (
  SELECT user_id, event_type, hour(ts) // 6 AS blk FROM events
), ft AS (
  SELECT user_id, event_type, count(*) AS c FROM ev GROUP BY 1, 2
), fav_t AS (
  SELECT user_id, event_type AS fav_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY c DESC, event_type ASC) AS rk
    FROM ft
  ) WHERE rk = 1
), fb AS (
  SELECT user_id, blk, count(*) AS c FROM ev GROUP BY 1, 2
), fav_b AS (
  SELECT user_id, blk AS fav_blk FROM (
    SELECT user_id, blk,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY c DESC, blk ASC) AS rk
    FROM fb
  ) WHERE rk = 1
), cls AS (
  SELECT fav_type, fav_blk, count(*) AS k
  FROM fav_t JOIN fav_b USING (user_id)
  GROUP BY 1, 2
)
SELECT CAST(sum(k) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN k BETWEEN 2 AND 5 THEN k ELSE 0 END) AS BIGINT)
         AS u_2_5,
       CAST(sum(CASE WHEN k > 5 THEN k ELSE 0 END) AS BIGINT) AS u_gt5,
       CAST(floor(CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                  / sum(k) * 1000000 + {_OFF}) AS BIGINT) AS risk_e6
FROM cls
"""


# ---------------------------------------------------------------------------
# load_profile — peak/mean hourly load structure per event type
# ---------------------------------------------------------------------------
# The capacity-planning readout: hourly event counts per type; peak
# hour (earliest argmax), peak count, mean hourly count over the
# OBSERVED span (distinct hours), and load factor = mean/peak — all
# exact integers plus one division.


def q_load_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
        )
        .cast("long")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wn = Window.partitionBy("event_type")
    t = (
        hourly.withColumn("mx", F.max("c").over(wn))
        .withColumn("nh", F.count(F.lit(1)).over(wn))
        .withColumn("tot", F.sum("c").over(wn))
    )
    top = (
        t.filter(F.col("c") == F.col("mx"))
        .groupBy("event_type")
        .agg(
            F.min("hr").alias("peak_hr"),
            F.max("mx").alias("peak"),
            F.max("nh").alias("n_hours"),
            F.max("tot").alias("tot"),
        )
    )
    lf = F.col("tot").cast("double") / (
        F.col("n_hours").cast("double") * F.col("peak").cast("double")
    )
    return top.select(
        "event_type",
        F.col("n_hours").cast("long").alias("n_hours"),
        F.col("peak_hr").cast("long").alias("peak_hr"),
        F.col("peak").cast("long").alias("peak"),
        F.col("tot").cast("long").alias("tot"),
        F.floor(lf * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "load_factor_e6"
        ),
    ).orderBy("event_type")


SQL_LOAD_PROFILE = f"""
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         count(*) AS c
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, hr, c,
         max(c) OVER (PARTITION BY event_type) AS mx,
         count(*) OVER (PARTITION BY event_type) AS nh,
         sum(c) OVER (PARTITION BY event_type) AS tot
  FROM hourly
), top AS (
  SELECT event_type, min(hr) AS peak_hr, CAST(max(mx) AS BIGINT) AS peak,
         CAST(max(nh) AS BIGINT) AS n_hours,
         CAST(max(tot) AS BIGINT) AS tot
  FROM t WHERE c = mx GROUP BY 1
)
SELECT event_type, n_hours, CAST(peak_hr AS BIGINT) AS peak_hr, peak, tot,
       CAST(floor(CAST(tot AS DOUBLE) / (CAST(n_hours AS DOUBLE) * peak)
                  * 1000000 + {_OFF}) AS BIGINT) AS load_factor_e6
FROM top
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# boilerplate_prefixes — shared 5-token prefix clusters per source
# ---------------------------------------------------------------------------
# Template/boilerplate detection: docs that open with the SAME 5
# tokens form a prefix cluster; report per source the cluster count
# (size >= 2), the largest cluster, and the share of docs sitting in
# boilerplate clusters — the removal-candidate mass.  Exact integers;
# the prefix key is one slice, no self-join (hash-group on the prefix).


def q_boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "source", F.split(F.trim("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= 5)
    pre = d.select(
        "source",
        F.concat_ws(" ", F.slice("toks", 1, 5)).alias("prefix"),
    )
    cl = pre.groupBy("source", "prefix").agg(F.count(F.lit(1)).alias("sz"))
    agg = cl.groupBy("source").agg(
        F.sum("sz").alias("n_docs"),
        F.sum((F.col("sz") >= 2).cast("long")).alias("n_clusters"),
        F.max("sz").alias("max_cluster"),
        F.sum(F.when(F.col("sz") >= 2, F.col("sz")).otherwise(0)).alias(
            "n_boiler"
        ),
    )
    share = F.col("n_boiler").cast("double") / F.col("n_docs").cast("double")
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        F.col("max_cluster").cast("long").alias("max_cluster"),
        F.col("n_boiler").cast("long").alias("n_boiler"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "boiler_share_e6"
        ),
    ).orderBy("source")


SQL_BOILERPLATE = f"""
WITH d AS (
  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), pre AS (
  SELECT source,
         array_to_string(toks[1:5], ' ') AS prefix
  FROM d WHERE len(toks) >= 5
), cl AS (
  SELECT source, prefix, count(*) AS sz FROM pre GROUP BY 1, 2
), agg AS (
  SELECT source, CAST(sum(sz) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clusters,
         CAST(max(sz) AS BIGINT) AS max_cluster,
         CAST(sum(CASE WHEN sz >= 2 THEN sz ELSE 0 END) AS BIGINT)
           AS n_boiler
  FROM cl GROUP BY 1
)
SELECT source, n_docs, n_clusters, max_cluster, n_boiler,
       CAST(floor(CAST(n_boiler AS DOUBLE) / n_docs * 1000000 + {_OFF})
            AS BIGINT) AS boiler_share_e6
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# mad_outlier_rate — MAD-z length outlier rate per language
# ---------------------------------------------------------------------------
# The robust outlier screen as an EXACT INTEGER INEQUALITY: flag docs
# with |x - med| * 10000 > 44478 * MAD (3 * 1.4826 = 4.4478 — the
# normal-consistency factor as the same scaled-integer literal on both
# engines), so the flag — and therefore the rate — is exact.


def q_mad_outlier_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    r = d.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(
        F.col("rk") == F.floor((F.col("nn") - 1) / 2) + 1
    ).select("lang", F.col("n_chars").alias("med"))
    dev = d.join(F.broadcast(med), "lang").withColumn(
        "ad", F.abs(F.col("n_chars") - F.col("med"))
    )
    wad = Window.partitionBy("lang").orderBy("ad", "doc_id")
    rad = dev.withColumn("rk", F.row_number().over(wad)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    mad = rad.filter(
        F.col("rk") == F.floor((F.col("nn") - 1) / 2) + 1
    ).select("lang", F.col("ad").alias("mad"))
    lab = dev.join(F.broadcast(mad), "lang").withColumn(
        "out", (F.col("ad") * 10_000 > 44_478 * F.col("mad")).cast("long")
    )
    agg = lab.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("med").alias("med"),
        F.max("mad").alias("mad"),
        F.sum("out").alias("n_out"),
    )
    rate = F.col("n_out").cast("double") / F.col("n").cast("double")
    return agg.filter(F.col("mad") > 0).select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("med").cast("long").alias("med"),
        F.col("mad").cast("long").alias("mad"),
        F.col("n_out").cast("long").alias("n_out"),
        F.floor(rate * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rate_e6"
        ),
    ).orderBy("lang")


SQL_MAD_OUTLIER = f"""
WITH r AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
           AS rk,
         count(*) OVER (PARTITION BY lang) AS nn
  FROM documents
), med AS (
  SELECT lang, n_chars AS med FROM r WHERE rk = (nn - 1) // 2 + 1
), dev AS (
  SELECT d.lang, d.doc_id, abs(d.n_chars - med.med) AS ad, med.med
  FROM documents d JOIN med ON med.lang = d.lang
), rad AS (
  SELECT lang, ad,
         row_number() OVER (PARTITION BY lang ORDER BY ad, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS nn
  FROM dev
), mad AS (
  SELECT lang, ad AS mad FROM rad WHERE rk = (nn - 1) // 2 + 1
), lab AS (
  SELECT dev.lang, dev.med, mad.mad,
         CASE WHEN dev.ad * 10000 > 44478 * mad.mad THEN 1 ELSE 0 END
           AS o
  FROM dev JOIN mad ON mad.lang = dev.lang
), agg AS (
  SELECT lang, count(*) AS n, max(med) AS med, max(mad) AS mad,
         CAST(sum(o) AS BIGINT) AS n_out
  FROM lab GROUP BY 1
)
SELECT lang, CAST(n AS BIGINT) AS n, CAST(med AS BIGINT) AS med,
       CAST(mad AS BIGINT) AS mad, n_out,
       CAST(floor(CAST(n_out AS DOUBLE) / n * 1000000 + {_OFF}) AS BIGINT)
         AS rate_e6
FROM agg
WHERE mad > 0
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# charset_coverage — distinct-character inventory per language
# ---------------------------------------------------------------------------
# Alphabet forensics: distinct characters used, how many are ASCII
# printable (0x20-0x7E), and the share of the 95-char printable set
# covered — exact distinct counts off one char explode.


def q_charset_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    dist = ch.groupBy("lang", "ch").agg(F.count(F.lit(1)).alias("c"))
    is_print = (F.ascii("ch") >= 32) & (F.ascii("ch") <= 126)
    agg = dist.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(is_print.cast("long")).alias("n_printable"),
        F.sum(F.when(is_print, F.lit(0)).otherwise(F.col("c"))).alias(
            "nonprint_mass"
        ),
    )
    cov = F.col("n_printable").cast("double") / 95.0
    return agg.select(
        "lang",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_printable").cast("long").alias("n_printable"),
        F.col("nonprint_mass").cast("long").alias("nonprint_mass"),
        F.floor(cov * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "printable_cov_e6"
        ),
    ).orderBy("lang")


SQL_CHARSET = f"""
WITH ch AS (
  SELECT lang, unnest(string_split_regex(text, '')) AS ch FROM documents
), dist AS (
  SELECT lang, ch, count(*) AS c FROM ch WHERE ch <> '' GROUP BY 1, 2
), agg AS (
  SELECT lang, count(*) AS n_distinct,
         CAST(sum(CASE WHEN ascii(ch) BETWEEN 32 AND 126 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_printable,
         CAST(sum(CASE WHEN ascii(ch) BETWEEN 32 AND 126 THEN 0 ELSE c END)
              AS BIGINT) AS nonprint_mass
  FROM dist GROUP BY 1
)
SELECT lang, CAST(n_distinct AS BIGINT) AS n_distinct, n_printable,
       nonprint_mass,
       CAST(floor(CAST(n_printable AS DOUBLE) / 95.0 * 1000000 + {_OFF})
            AS BIGINT) AS printable_cov_e6
FROM agg
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# core_vocab_coverage — token-mass coverage of the global top-1000 vocab
# ---------------------------------------------------------------------------
# Tokenizer design readout: what share of each language's token MASS
# does a shared 1000-term core vocabulary capture (count-desc/term-asc
# exact top-k via the TakeOrderedAndProject rewrite, §52)?  Exact
# integer masses; low coverage = the language needs its own vocab.

_CORE_K = 1000


def q_core_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    gcnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("gc"))
    wv = Window.orderBy(F.desc("gc"), F.asc("w"))
    vocab = (
        gcnt.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= _CORE_K)
        .select("w")
    )
    per = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    cov = per.join(F.broadcast(vocab), "w", "left_semi").groupBy("lang").agg(
        F.sum("c").alias("core_mass"), F.count(F.lit(1)).alias("core_types")
    )
    tot = per.groupBy("lang").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    j = tot.join(cov, "lang", "left").fillna(
        0, subset=["core_mass", "core_types"]
    )
    share = F.col("core_mass").cast("double") / F.col("n").cast("double")
    return j.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("v").cast("long").alias("v"),
        F.col("core_types").cast("long").alias("core_types"),
        F.col("core_mass").cast("long").alias("core_mass"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "coverage_e6"
        ),
    ).orderBy("lang")


SQL_CORE_VOCAB = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), gcnt AS (
  SELECT w, count(*) AS gc FROM toks GROUP BY 1
), vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY gc DESC, w ASC) AS rk FROM gcnt
  ) WHERE rk <= {_CORE_K}
), per AS (
  SELECT lang, w, count(*) AS c FROM toks GROUP BY 1, 2
), cov AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS core_mass,
         count(*) AS core_types
  FROM per WHERE w IN (SELECT w FROM vocab)
  GROUP BY 1
), tot AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n, count(*) AS v
  FROM per GROUP BY 1
)
SELECT tot.lang, n, CAST(v AS BIGINT) AS v,
       CAST(coalesce(core_types, 0) AS BIGINT) AS core_types,
       coalesce(core_mass, 0) AS core_mass,
       CAST(floor(CAST(coalesce(core_mass, 0) AS DOUBLE) / n * 1000000
                  + {_OFF}) AS BIGINT) AS coverage_e6
FROM tot LEFT JOIN cov ON cov.lang = tot.lang
ORDER BY tot.lang
"""


# ---------------------------------------------------------------------------
# extremal_index — runs-declustering extremal index of daily exceedances
# ---------------------------------------------------------------------------
# EVT clustering (Smith & Weissman JRSS-B 1994, runs method, r = 2):
# theta ~ #clusters / #exceedances over the p90 threshold, a cluster
# starting whenever the previous exceedance is > r days back.  Also
# reports the mean inter-exceedance gap.  Thresholds exact order
# statistics; everything else exact integers off day-ordered lags.

_EI_RUN = 2


def q_extremal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.partitionBy("event_type").orderBy("c", "day")
    wn = Window.partitionBy("event_type")
    r = daily.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    p90 = r.filter(
        F.col("rk") == F.expr("((nn - 1) * 90) div 100") + 1
    ).select("event_type", F.col("c").alias("thr"))
    exc = (
        daily.join(F.broadcast(p90), "event_type")
        .filter(F.col("c") > F.col("thr"))
        .select("event_type", "day")
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    g = exc.withColumn("prev", F.lag("day").over(wo)).withColumn(
        "gap", F.col("day") - F.col("prev")
    )
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exc"),
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("gap") > _EI_RUN), 1
            ).otherwise(0)
        ).alias("n_clusters"),
        F.sum("gap").alias("gap_sum"),
        F.sum(F.col("gap").isNotNull().cast("long")).alias("n_gaps"),
    )
    theta = F.col("n_clusters").cast("double") / F.col("n_exc").cast(
        "double"
    )
    mean_gap = F.col("gap_sum").cast("double") / F.col("n_gaps").cast(
        "double"
    )
    return (
        agg.filter(F.col("n_exc") >= 2)
        .select(
            "event_type",
            F.col("n_exc").cast("long").alias("n_exc"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            F.floor(theta * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "theta_e6"
            ),
            F.floor(mean_gap * 10_000 + F.lit(_OFF)).cast("long").alias(
                "mean_gap_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_EXTREMAL = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM daily
), p90 AS (
  SELECT event_type, c AS thr FROM r WHERE rk = ((nn - 1) * 90) // 100 + 1
), exc AS (
  SELECT daily.event_type, daily.day
  FROM daily JOIN p90 ON p90.event_type = daily.event_type
  WHERE daily.c > p90.thr
), g AS (
  SELECT event_type, day,
         day - lag(day) OVER (PARTITION BY event_type ORDER BY day)
           AS gap
  FROM exc
), agg AS (
  SELECT event_type, count(*) AS n_exc,
         CAST(sum(CASE WHEN gap IS NULL OR gap > {_EI_RUN}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_clusters,
         CAST(sum(gap) AS BIGINT) AS gap_sum,
         CAST(sum(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_gaps
  FROM g GROUP BY 1
)
SELECT event_type, CAST(n_exc AS BIGINT) AS n_exc, n_clusters,
       CAST(floor(CAST(n_clusters AS DOUBLE) / n_exc * 1000000 + {_OFF})
            AS BIGINT) AS theta_e6,
       CAST(floor(CAST(gap_sum AS DOUBLE) / n_gaps * 10000 + {_OFF})
            AS BIGINT) AS mean_gap_e4
FROM agg
WHERE n_exc >= 2
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# vocab_gini — Gini concentration of term frequencies per language
# ---------------------------------------------------------------------------
# How unequal is vocabulary usage?  G = (2 * sum i*m_(i)) / (V * N)
# - (V + 1) / V over ascending-sorted term counts — the rank weights
# ride ONE per-lang rank window (value-deterministic under ties), all
# sums exact BIGINTs, G one expression.


def q_vocab_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    freq = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    w = Window.partitionBy("lang").orderBy("m", "w")
    r = freq.withColumn("i", F.row_number().over(w))
    agg = r.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("m").alias("n"),
        F.sum(F.col("i") * F.col("m")).alias("im"),
    )
    vd = F.col("v").cast("double")
    gini = (
        2.0 * F.col("im").cast("double") / (vd * F.col("n").cast("double"))
        - (vd + 1.0) / vd
    )
    return agg.select(
        "lang",
        F.col("v").cast("long").alias("v"),
        F.col("n").cast("long").alias("n"),
        F.floor(gini * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "gini_e6"
        ),
    ).orderBy("lang")


SQL_VOCAB_GINI = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), freq AS (
  SELECT lang, w, count(*) AS m FROM toks GROUP BY 1, 2
), r AS (
  SELECT lang, m,
         row_number() OVER (PARTITION BY lang ORDER BY m, w) AS i
  FROM freq
), agg AS (
  SELECT lang, count(*) AS v, CAST(sum(m) AS BIGINT) AS n,
         CAST(sum(i * m) AS BIGINT) AS im
  FROM r GROUP BY 1
)
SELECT lang, CAST(v AS BIGINT) AS v, n,
       CAST(floor((2.0 * im / (CAST(v AS DOUBLE) * n)
                   - (CAST(v AS DOUBLE) + 1.0) / v) * 1000000 + {_OFF})
            AS BIGINT) AS gini_e6
FROM agg
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# exp_gap_fit — exponential fit + KS on per-user inter-event gaps
# ---------------------------------------------------------------------------
# Queueing diagnosis: are arrivals memoryless?  Per-user consecutive
# gaps in whole minutes pooled per type; lambda = 1/mean QUANTIZED to
# an exact e9 rational (CUPED discipline), then the exact-CDF KS
# D = max |F_emp - (1 - exp(-lambda*g))| over the (type, gap) count
# table — domain-bounded windows throughout.


def q_exp_gap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "user_id",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 60_000_000)
        .cast("long")
        .alias("mn"),
    )
    wo = Window.partitionBy("event_type", "user_id").orderBy("mn", "mn")
    g = ev.withColumn("prev", F.lag("mn").over(wo)).filter(
        F.col("prev").isNotNull()
    ).select("event_type", (F.col("mn") - F.col("prev")).alias("gap"))
    g = g.filter(F.col("gap") > 0)
    cnt = g.groupBy("event_type", "gap").agg(F.count(F.lit(1)).alias("c"))
    wn = Window.partitionBy("event_type")
    t = cnt.withColumn("n", F.sum("c").over(wn)).withColumn(
        "s", F.sum(F.col("gap") * F.col("c")).over(wn)
    )
    # lambda quantized: lam_e9 = floor(n/s * 1e9 + 0.5) — identical ints
    lam = F.floor(
        F.col("n").cast("double") / F.col("s") * 1e9 + F.lit(0.5)
    ).cast("long")
    t = t.withColumn("lam_e9", lam)
    w = Window.partitionBy("event_type").orderBy("gap")
    t = t.withColumn(
        "cum", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    fhat = 1.0 - F.exp(
        -F.col("lam_e9").cast("double") / 1e9 * F.col("gap").cast("double")
    )
    dks = F.greatest(
        F.abs(F.col("cum").cast("double") / F.col("n") - fhat),
        F.abs((F.col("cum") - F.col("c")).cast("double") / F.col("n") - fhat),
    )
    agg = t.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("lam_e9").alias("lam_e9"),
        F.max(dks).alias("ks"),
    )
    return (
        agg.filter(F.col("n") >= 10)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("lam_e9").cast("long").alias("lam_e9"),
            F.floor(F.col("ks") * 10_000 + F.lit(0.5)).cast("long").alias(
                "ks_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_EXP_GAP = """
WITH ev AS (
  SELECT event_type, user_id,
         CAST(floor(epoch(ts) / 60) AS BIGINT) AS mn
  FROM events
), g AS (
  SELECT event_type,
         mn - lag(mn) OVER (PARTITION BY event_type, user_id
                            ORDER BY mn, mn) AS gap
  FROM ev
), gg AS (
  SELECT event_type, gap FROM g WHERE gap IS NOT NULL AND gap > 0
), cnt AS (
  SELECT event_type, gap, count(*) AS c FROM gg GROUP BY 1, 2
), t AS (
  SELECT event_type, gap, c,
         sum(c) OVER (PARTITION BY event_type) AS n,
         sum(gap * c) OVER (PARTITION BY event_type) AS s,
         sum(c) OVER (PARTITION BY event_type ORDER BY gap) AS cum
  FROM cnt
), t2 AS (
  SELECT event_type, gap, c, n, cum,
         CAST(floor(CAST(n AS DOUBLE) / s * 1e9 + 0.5) AS BIGINT)
           AS lam_e9
  FROM t
), pt AS (
  SELECT event_type, c, n, cum, lam_e9,
         1.0 - exp(-(CAST(lam_e9 AS DOUBLE) / 1e9)
                   * CAST(gap AS DOUBLE)) AS fhat
  FROM t2
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n, max(lam_e9) AS lam_e9,
       CAST(floor(max(greatest(abs(CAST(cum AS DOUBLE) / n - fhat),
                               abs(CAST(cum - c AS DOUBLE) / n - fhat)))
                  * 10000 + 0.5) AS BIGINT) AS ks_e4
FROM pt
GROUP BY 1
HAVING max(n) >= 10
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# word_length_profile — word-length distribution stats per language
# ---------------------------------------------------------------------------
# Mean word length (exact rational), the length-distribution entropy
# (bounded length domain), and the long-word (> 7 chars) rate — the
# classic lang-ID/readability inputs, all off one (lang, len) count
# table.


def q_word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    wl = toks.select("lang", F.length("w").alias("wl")).filter(
        F.col("wl") > 0
    )
    cnt = wl.groupBy("lang", "wl").agg(F.count(F.lit(1)).alias("c"))
    wn = Window.partitionBy("lang")
    t = cnt.withColumn("n", F.sum("c").over(wn))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    agg = t.groupBy("lang").agg(
        F.max("n").alias("n"),
        F.sum(F.col("wl") * F.col("c")).alias("lsum"),
        F.sum(-p * F.log(p)).alias("h"),
        F.sum(F.when(F.col("wl") > 7, F.col("c")).otherwise(0)).alias(
            "n_long"
        ),
    )
    mean = F.col("lsum").cast("double") / F.col("n").cast("double")
    rate = F.col("n_long").cast("double") / F.col("n").cast("double")
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.floor(mean * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mean_len_e4"
        ),
        F.floor(F.col("h") * 10_000 + F.lit(0.5)).cast("long").alias(
            "entropy_e4"
        ),
        F.floor(rate * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "long_rate_e6"
        ),
    ).orderBy("lang")


SQL_WORD_LENGTH = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), wl AS (
  SELECT lang, len(w) AS wl FROM toks WHERE len(w) > 0
), cnt AS (
  SELECT lang, wl, count(*) AS c FROM wl GROUP BY 1, 2
), t AS (
  SELECT lang, wl, c, sum(c) OVER (PARTITION BY lang) AS n FROM cnt
), agg AS (
  SELECT lang, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(wl * c) AS BIGINT) AS lsum,
         sum(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) AS h,
         CAST(sum(CASE WHEN wl > 7 THEN c ELSE 0 END) AS BIGINT) AS n_long
  FROM t GROUP BY 1
)
SELECT lang, n,
       CAST(floor(CAST(lsum AS DOUBLE) / n * 10000 + {_OFF}) AS BIGINT)
         AS mean_len_e4,
       CAST(floor(h * 10000 + 0.5) AS BIGINT) AS entropy_e4,
       CAST(floor(CAST(n_long AS DOUBLE) / n * 1000000 + {_OFF}) AS BIGINT)
         AS long_rate_e6
FROM agg
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# habit_strength — lag-7 activity persistence (phi + odds ratio)
# ---------------------------------------------------------------------------
# Habit formation readout: over all (user, day) cells in each user's
# observed span, cross-tabulate "active on day d" x "active on day
# d+7"; phi coefficient and the Haldane-corrected odds ratio — all
# exact integers off the user-day DISTINCT boundary; the 2x2 comes
# from set joins, never a dense calendar materialization per user:
# n11 by a (user, day+7) self-join, margins from per-user span counts.


def q_habit_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
        )
        .cast("long")
        .alias("d"),
    ).distinct()
    span = ud.groupBy("user_id").agg(
        F.min("d").alias("d0"),
        F.max("d").alias("d1"),
        F.count(F.lit(1)).alias("n_active"),
    ).filter(F.col("d1") - F.col("d0") >= 7)
    # pairs considered: d in [d0, d1-7]; active(d) x active(d+7)
    a = ud.join(span, "user_id").filter(F.col("d") <= F.col("d1") - 7)
    b = ud.select("user_id", (F.col("d") - 7).alias("d"))
    n11 = (
        a.join(b, ["user_id", "d"], "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n11"))
    )
    act_lo = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("r1"))
    act_hi = (
        ud.join(span, "user_id")
        .filter(F.col("d") >= F.col("d0") + 7)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    base = span.select(
        "user_id", (F.col("d1") - F.col("d0") - 6).alias("m")
    )
    j = (
        base.join(act_lo, "user_id", "left")
        .join(act_hi, "user_id", "left")
        .join(n11, "user_id", "left")
        .fillna(0, subset=["r1", "c1", "n11"])
    )
    agg = j.groupBy().agg(
        F.sum("m").alias("m"),
        F.sum("r1").alias("r1"),
        F.sum("c1").alias("c1"),
        F.sum("n11").alias("n11"),
        F.count(F.lit(1)).alias("n_users"),
    )
    n11c = F.col("n11").cast("double")
    n10 = (F.col("r1") - F.col("n11")).cast("double")
    n01 = (F.col("c1") - F.col("n11")).cast("double")
    n00 = (F.col("m") - F.col("r1") - F.col("c1") + F.col("n11")).cast(
        "double"
    )
    md = F.col("m").cast("double")
    phi = (n11c * n00 - n10 * n01) / F.sqrt(
        (n11c + n10) * (n01 + n00) * (n11c + n01) * (n10 + n00)
    )
    lor = F.log(
        ((n11c + 0.5) * (n00 + 0.5)) / ((n10 + 0.5) * (n01 + 0.5))
    )
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("m").cast("long").alias("m"),
        F.col("n11").cast("long").alias("n11"),
        F.floor(phi * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "phi_e6"
        ),
        F.floor(lor * 10_000 + F.lit(0.5)).cast("long").alias("lor_e4"),
    )


SQL_HABIT = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
  FROM events
), span AS (
  SELECT user_id, min(d) AS d0, max(d) AS d1
  FROM ud GROUP BY 1 HAVING max(d) - min(d) >= 7
), a AS (
  SELECT ud.user_id, ud.d
  FROM ud JOIN span ON span.user_id = ud.user_id
  WHERE ud.d <= span.d1 - 7
), n11 AS (
  SELECT a.user_id, count(*) AS n11
  FROM a SEMI JOIN ud b ON b.user_id = a.user_id AND b.d = a.d + 7
  GROUP BY 1
), act_lo AS (
  SELECT user_id, count(*) AS r1 FROM a GROUP BY 1
), act_hi AS (
  SELECT ud.user_id, count(*) AS c1
  FROM ud JOIN span ON span.user_id = ud.user_id
  WHERE ud.d >= span.d0 + 7
  GROUP BY 1
), base AS (
  SELECT user_id, d1 - d0 - 6 AS m FROM span
), j AS (
  SELECT base.user_id, base.m,
         coalesce(act_lo.r1, 0) AS r1,
         coalesce(act_hi.c1, 0) AS c1,
         coalesce(n11.n11, 0) AS n11
  FROM base
  LEFT JOIN act_lo ON act_lo.user_id = base.user_id
  LEFT JOIN act_hi ON act_hi.user_id = base.user_id
  LEFT JOIN n11 ON n11.user_id = base.user_id
), agg AS (
  SELECT CAST(sum(m) AS BIGINT) AS m, CAST(sum(r1) AS BIGINT) AS r1,
         CAST(sum(c1) AS BIGINT) AS c1, CAST(sum(n11) AS BIGINT) AS n11,
         count(*) AS n_users
  FROM j
)
SELECT CAST(n_users AS BIGINT) AS n_users, m, n11,
       CAST(floor((CAST(n11 AS DOUBLE) * (m - r1 - c1 + n11)
                   - CAST(r1 - n11 AS DOUBLE) * (c1 - n11))
                  / sqrt(CAST(r1 AS DOUBLE) * (m - r1)
                         * c1 * (m - c1))
                  * 1000000 + {_OFF}) AS BIGINT) AS phi_e6,
       CAST(floor(ln(((CAST(n11 AS DOUBLE) + 0.5)
                      * (CAST(m - r1 - c1 + n11 AS DOUBLE) + 0.5))
                     / ((CAST(r1 - n11 AS DOUBLE) + 0.5)
                        * (CAST(c1 - n11 AS DOUBLE) + 0.5)))
                  * 10000 + 0.5) AS BIGINT) AS lor_e4
FROM agg
"""


# ---------------------------------------------------------------------------
# dow_anova — one-way ANOVA of daily counts by weekday per event type
# ---------------------------------------------------------------------------
# Is the day-of-week effect significant?  The anova_event_types
# exact-integer expansion with groups = the 7 weekdays on the daily
# grid — SSB/SSW from BIGINT sums, <=7 double terms per type.


def q_dow_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    daily = daily.withColumn("dow", ((F.col("day") + 3) % 7).cast("long"))
    g = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("c").alias("sg"),
        F.sum(F.col("c") * F.col("c")).alias("qg"),
    )
    agg = g.groupBy("event_type").agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(
            F.col("sg").cast("double") * F.col("sg") / F.col("ng")
        ).alias("w"),
    )
    ssb = F.col("w") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("w")
    fstat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    eta2 = ssb / (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n"))
    return (
        agg.filter((F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k"),
            F.floor(fstat * 10_000 + F.lit(_OFF)).cast("long").alias(
                "f_e4"
            ),
            F.floor(eta2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "eta2_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_DOW_ANOVA = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, (day + 3) % 7 AS dow, c FROM daily
), g AS (
  SELECT event_type, dow, count(*) AS ng,
         CAST(sum(c) AS BIGINT) AS sg, CAST(sum(c * c) AS BIGINT) AS qg
  FROM d GROUP BY 1, 2
), agg AS (
  SELECT event_type, CAST(sum(ng) AS BIGINT) AS n, count(*) AS k,
         CAST(sum(sg) AS BIGINT) AS s, CAST(sum(qg) AS BIGINT) AS q,
         sum(CAST(sg AS DOUBLE) * sg / ng) AS w
  FROM g GROUP BY 1
)
SELECT event_type, n, CAST(k AS BIGINT) AS k,
       CAST(floor(
         ((w - CAST(s AS DOUBLE) * s / n) / (k - 1))
         / ((q - w) / (n - k)) * 10000 + {_OFF}) AS BIGINT) AS f_e4,
       CAST(floor((w - CAST(s AS DOUBLE) * s / n)
                  / (q - CAST(s AS DOUBLE) * s / n) * 1000000 + {_OFF})
            AS BIGINT) AS eta2_e6
FROM agg
WHERE k >= 2 AND n > k AND q - w > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# peak_week — max/min 7-day rolling event load per type
# ---------------------------------------------------------------------------
# Capacity planning on the rolling week: RANGE frame over the day
# VALUE (gap-correct — missing days shrink the window's content, not
# its span); exact integer sums, earliest-day argmax/argmin.


def q_peak_week(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wr = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-6, 0)
    )
    wn = Window.partitionBy("event_type")
    d = daily.withColumn("wk7", F.sum("c").over(wr))
    d = d.withColumn("mx", F.max("wk7").over(wn)).withColumn(
        "mn", F.min("wk7").over(wn)
    )
    top = (
        d.filter(F.col("wk7") == F.col("mx"))
        .groupBy("event_type")
        .agg(F.min("day").alias("peak_end_day"), F.max("mx").alias("peak"))
    )
    bot = (
        d.filter(F.col("wk7") == F.col("mn"))
        .groupBy("event_type")
        .agg(
            F.min("day").alias("trough_end_day"),
            F.max("mn").alias("trough"),
        )
    )
    j = top.join(bot, "event_type")
    ratio = F.col("peak").cast("double") / F.col("trough").cast("double")
    return j.select(
        "event_type",
        F.col("peak_end_day").cast("long").alias("peak_end_day"),
        F.col("peak").cast("long").alias("peak"),
        F.col("trough_end_day").cast("long").alias("trough_end_day"),
        F.col("trough").cast("long").alias("trough"),
        F.floor(ratio * 10_000 + F.lit(_OFF)).cast("long").alias(
            "ratio_e4"
        ),
    ).orderBy("event_type")


SQL_PEAK_WEEK = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day,
         sum(c) OVER (PARTITION BY event_type ORDER BY day
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS wk7
  FROM daily
), m AS (
  SELECT event_type, day, wk7,
         max(wk7) OVER (PARTITION BY event_type) AS mx,
         min(wk7) OVER (PARTITION BY event_type) AS mn
  FROM d
), top AS (
  SELECT event_type, min(day) AS peak_end_day,
         CAST(max(mx) AS BIGINT) AS peak
  FROM m WHERE wk7 = mx GROUP BY 1
), bot AS (
  SELECT event_type, min(day) AS trough_end_day,
         CAST(max(mn) AS BIGINT) AS trough
  FROM m WHERE wk7 = mn GROUP BY 1
)
SELECT top.event_type, CAST(peak_end_day AS BIGINT) AS peak_end_day, peak,
       CAST(trough_end_day AS BIGINT) AS trough_end_day, trough,
       CAST(floor(CAST(peak AS DOUBLE) / trough * 10000 + {_OFF})
            AS BIGINT) AS ratio_e4
FROM top JOIN bot ON bot.event_type = top.event_type
ORDER BY top.event_type
"""


# ---------------------------------------------------------------------------
# cvm_two_sample — exact two-sample Cramer-von Mises (weekday/weekend)
# ---------------------------------------------------------------------------
# T = n*m/N^2 * sum_j l_j * (F1(x_j) - F2(x_j))^2 over the pooled
# support (Anderson 1962, tie-weighted form) — kept EXACT: the inner
# sum scaled by (n*m)^2 is sum l_j * (cum1*m - cum2*n)^2, a BIGINT on
# the daily-count value domain (counts <= ~1e4 at benchmarked SFs,
# bound documented); one division at the end.


def q_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lab = daily.withColumn(
        "g", (((F.col("day") + 3) % 7) >= 5).cast("long")
    )
    cnt = lab.groupBy("event_type", "c").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c2"),
    )
    w = Window.partitionBy("event_type").orderBy("c")
    wn = Window.partitionBy("event_type")
    t = (
        cnt.withColumn(
            "cum1",
            F.sum("c1").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "cum2",
            F.sum("c2").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("n1", F.sum("c1").over(wn))
        .withColumn("n2", F.sum("c2").over(wn))
    )
    term = (F.col("c1") + F.col("c2")) * (
        F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
    ) * (F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    agg = t.groupBy("event_type").agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(term).alias("s"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    # T = n1*n2/N^2 * S / (n1*n2)^2 = S / (N^2 * n1 * n2)
    tstat = F.col("s").cast("double") / (nd * nd * n1d * n2d)
    return (
        agg.filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "event_type",
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("s").cast("long").alias("s"),
            F.floor(tstat * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "t_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_CVM = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), lab AS (
  SELECT event_type, c,
         CASE WHEN (day + 3) % 7 >= 5 THEN 1 ELSE 0 END AS g
  FROM daily
), cnt AS (
  SELECT event_type, c,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM lab GROUP BY 1, 2
), t AS (
  SELECT event_type, c1, c2,
         sum(c1) OVER (PARTITION BY event_type ORDER BY c) AS cum1,
         sum(c2) OVER (PARTITION BY event_type ORDER BY c) AS cum2,
         sum(c1) OVER (PARTITION BY event_type) AS n1,
         sum(c2) OVER (PARTITION BY event_type) AS n2
  FROM cnt
), agg AS (
  SELECT event_type, CAST(max(n1) AS BIGINT) AS n1,
         CAST(max(n2) AS BIGINT) AS n2,
         CAST(sum((c1 + c2) * (cum1 * n2 - cum2 * n1)
                  * (cum1 * n2 - cum2 * n1)) AS BIGINT) AS s
  FROM t GROUP BY 1
)
SELECT event_type, n1, n2, s,
       CAST(floor(CAST(s AS DOUBLE)
                  / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2)
                     * n1 * n2)
                  * 1000000 + {_OFF}) AS BIGINT) AS t_e6
FROM agg
WHERE n1 > 0 AND n2 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# sample_entropy — SampEn(m=1, r=0.2*sd) with EXACT integer matching
# ---------------------------------------------------------------------------
# Richman & Moorman (Am J Physiol 2000).  The tolerance test
# |x_i - x_j| <= 0.2*sd is kept EXACT: d^2 * 25 * n(n-1) <=
# n*S2 - S^2 is an integer inequality (both sides BIGINT), so the
# template-match counts B (length 1) and A (length 2) are exact and
# SampEn = ln(B/A) is ONE ln of an exact ratio.  Pairs ride the
# day-grid self-join (i < j, the theil_sen bound).


def q_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wo = Window.partitionBy("event_type").orderBy("day")
    wn = Window.partitionBy("event_type")
    d = (
        daily.withColumn("i", F.row_number().over(wo))
        .withColumn("nxt", F.lead("c").over(wo))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("s", F.sum("c").over(wn))
        .withColumn("q", F.sum(F.col("c") * F.col("c")).over(wn))
    )
    a = d.alias("a")
    b = d.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.i") > F.col("a.i")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.c").alias("xa"),
        F.col("b.c").alias("xb"),
        F.col("a.nxt").alias("na_"),
        F.col("b.nxt").alias("nb_"),
        F.col("a.n").alias("n"),
        F.col("a.s").alias("s"),
        F.col("a.q").alias("q"),
    )
    var_num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    nn1 = F.col("n") * (F.col("n") - 1)
    m1 = (
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) * 25 * nn1
        <= var_num
    ).cast("long")
    m2 = (
        F.col("na_").isNotNull()
        & F.col("nb_").isNotNull()
        & (
            (F.col("na_") - F.col("nb_"))
            * (F.col("na_") - F.col("nb_"))
            * 25
            * nn1
            <= var_num
        )
    ).cast("long")
    agg = p.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(m1).alias("bb"),
        F.sum(m1 * m2).alias("aa"),
    )
    se = F.log(F.col("bb").cast("double") / F.col("aa"))
    return (
        agg.filter((F.col("aa") > 0) & (F.col("bb") > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("bb").cast("long").alias("b_m"),
            F.col("aa").cast("long").alias("a_m1"),
            F.floor(se * 10_000 + F.lit(0.5)).cast("long").alias(
                "sampen_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_SAMPEN = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         lead(c) OVER (PARTITION BY event_type ORDER BY day) AS nxt,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS s,
         sum(c * c) OVER (PARTITION BY event_type) AS q
  FROM daily
), p AS (
  SELECT a.event_type, a.n,
         CASE WHEN (a.c - b.c) * (a.c - b.c) * 25 * a.n * (a.n - 1)
                   <= a.n * a.q - a.s * a.s THEN 1 ELSE 0 END AS m1,
         CASE WHEN a.nxt IS NOT NULL AND b.nxt IS NOT NULL
                   AND (a.nxt - b.nxt) * (a.nxt - b.nxt) * 25
                       * a.n * (a.n - 1)
                       <= a.n * a.q - a.s * a.s THEN 1 ELSE 0 END AS m2
  FROM d a JOIN d b ON b.event_type = a.event_type AND b.i > a.i
), agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(m1) AS BIGINT) AS bb,
         CAST(sum(m1 * m2) AS BIGINT) AS aa
  FROM p GROUP BY 1
)
SELECT event_type, n, bb AS b_m, aa AS a_m1,
       CAST(floor(ln(CAST(bb AS DOUBLE) / aa) * 10000 + 0.5) AS BIGINT)
         AS sampen_e4
FROM agg
WHERE aa > 0 AND bb > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# time_reversal_asymmetry — trev statistic on daily count diffs
# ---------------------------------------------------------------------------
# The tsfeatures/hctsa trev: E[d^3] / E[d^2]^(3/2) over lag-1 diffs —
# zero for time-reversible processes.  Cube and square sums are exact
# BIGINTs (|d| <= ~1e4 daily keeps d^3 * n <= ~1e14); one expression.


def q_time_reversal_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wo = Window.partitionBy("event_type").orderBy("day")
    d = daily.withColumn("prev", F.lag("c").over(wo)).filter(
        F.col("prev").isNotNull()
    ).select("event_type", (F.col("c") - F.col("prev")).alias("d"))
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("d") * F.col("d")).alias("s2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).alias("s3"),
    )
    md = F.col("m").cast("double")
    e2 = F.col("s2").cast("double") / md
    e3 = F.col("s3").cast("double") / md
    trev = e3 / F.sqrt(e2 * e2 * e2)
    return (
        agg.filter((F.col("m") >= 5) & (F.col("s2") > 0))
        .select(
            "event_type",
            F.col("m").cast("long").alias("m"),
            F.col("s2").cast("long").alias("s2"),
            F.col("s3").cast("long").alias("s3"),
            F.floor(trev * 10_000 + F.lit(_OFF)).cast("long").alias(
                "trev_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_TREV = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type,
         c - lag(c) OVER (PARTITION BY event_type ORDER BY day) AS d
  FROM daily
), dd AS (
  SELECT event_type, d FROM d WHERE d IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS m,
         CAST(sum(d * d) AS BIGINT) AS s2,
         CAST(sum(d * d * d) AS BIGINT) AS s3
  FROM dd GROUP BY 1
)
SELECT event_type, CAST(m AS BIGINT) AS m, s2, s3,
       CAST(floor((CAST(s3 AS DOUBLE) / m)
                  / sqrt((CAST(s2 AS DOUBLE) / m) * (CAST(s2 AS DOUBLE) / m)
                         * (CAST(s2 AS DOUBLE) / m))
                  * 10000 + {_OFF}) AS BIGINT) AS trev_e4
FROM agg
WHERE m >= 5 AND s2 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cohens_h — arcsine effect size of diel-composition drift per type
# ---------------------------------------------------------------------------
# Cohen (1988): h = 2*asin(sqrt(p1)) - 2*asin(sqrt(p2)) — the
# variance-stabilized effect size for two proportions; here p = night
# share in the first vs second half of each type's observed day span
# (split at the midpoint day, floor-division both engines).


def q_cohens_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    d = ev.select(
        "event_type",
        (F.floor(F.unix_micros(ts) / 86_400_000_000)).cast("long").alias(
            "day"
        ),
        (F.hour(ts) < 6).cast("long").alias("night"),
    )
    wn = Window.partitionBy("event_type")
    d = d.withColumn("d0", F.min("day").over(wn)).withColumn(
        "d1", F.max("day").over(wn)
    )
    d = d.withColumn(
        "half",
        (F.col("day") > F.col("d0") + F.expr("(d1 - d0) div 2")).cast(
            "long"
        ),
    )
    g = d.groupBy("event_type", "half").agg(
        F.count(F.lit(1)).alias("n"), F.sum("night").alias("k")
    )
    a = g.filter(F.col("half") == 0).select(
        "event_type", F.col("n").alias("n1"), F.col("k").alias("k1")
    )
    b = g.filter(F.col("half") == 1).select(
        "event_type", F.col("n").alias("n2"), F.col("k").alias("k2")
    )
    j = a.join(b, "event_type")
    p1 = F.col("k1").cast("double") / F.col("n1")
    p2 = F.col("k2").cast("double") / F.col("n2")
    h = 2.0 * F.asin(F.sqrt(p1)) - 2.0 * F.asin(F.sqrt(p2))
    return (
        j.filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "event_type",
            F.col("n1").cast("long").alias("n1"),
            F.col("k1").cast("long").alias("k1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("k2").cast("long").alias("k2"),
            F.floor(h * 10_000 + F.lit(0.5)).cast("long").alias("h_e4"),
        )
        .orderBy("event_type")
    )


SQL_COHENS_H = """
WITH d AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END AS night
  FROM events
), sp AS (
  SELECT event_type, night,
         CASE WHEN day > min(day) OVER (PARTITION BY event_type)
                        + (max(day) OVER (PARTITION BY event_type)
                           - min(day) OVER (PARTITION BY event_type)) // 2
              THEN 1 ELSE 0 END AS half
  FROM d
), g AS (
  SELECT event_type, half, count(*) AS n, CAST(sum(night) AS BIGINT) AS k
  FROM sp GROUP BY 1, 2
), j AS (
  SELECT a.event_type, a.n AS n1, a.k AS k1, b.n AS n2, b.k AS k2
  FROM g a JOIN g b ON b.event_type = a.event_type
  WHERE a.half = 0 AND b.half = 1
)
SELECT event_type, CAST(n1 AS BIGINT) AS n1, k1,
       CAST(n2 AS BIGINT) AS n2, k2,
       CAST(floor((2.0 * asin(sqrt(CAST(k1 AS DOUBLE) / n1))
                   - 2.0 * asin(sqrt(CAST(k2 AS DOUBLE) / n2)))
                  * 10000 + 0.5) AS BIGINT) AS h_e4
FROM j
WHERE n1 > 0 AND n2 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# diel_jsd — Jensen-Shannon divergence of weekday vs weekend diel shape
# ---------------------------------------------------------------------------
# Does the 24-bin hourly profile change on weekends?  JSD over the
# bounded 24-cell distributions: every p an exact integer ratio, the
# ln fold has <= 48 terms (lang_jsd discipline), sqrt(JSD) is the
# metric form.


def q_diel_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    d = ev.select(
        "event_type",
        F.hour(ts).cast("long").alias("hr"),
        (
            ((F.floor(F.unix_micros(ts) / 86_400_000_000) + 3) % 7) >= 5
        ).cast("long").alias("wkend"),
    )
    cells = d.groupBy("event_type", "hr").agg(
        F.sum(F.when(F.col("wkend") == 0, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("wkend") == 1, 1).otherwise(0)).alias("b"),
    )
    wn = Window.partitionBy("event_type")
    t = cells.withColumn("na", F.sum("a").over(wn)).withColumn(
        "nb", F.sum("b").over(wn)
    )
    pa = F.col("a").cast("double") / F.col("na")
    pb = F.col("b").cast("double") / F.col("nb")
    m = (pa + pb) / 2.0
    term = (
        F.when(F.col("a") > 0, 0.5 * pa * F.log(pa / m)).otherwise(0.0)
        + F.when(F.col("b") > 0, 0.5 * pb * F.log(pb / m)).otherwise(0.0)
    )
    agg = t.filter((F.col("na") > 0) & (F.col("nb") > 0)).groupBy(
        "event_type"
    ).agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum(term).alias("jsd"),
    )
    return agg.select(
        "event_type",
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.floor(F.col("jsd") * 1_000_000 + F.lit(0.5)).cast("long").alias(
            "jsd_e6"
        ),
        F.floor(F.sqrt(F.col("jsd")) * 10_000 + F.lit(0.5))
        .cast("long")
        .alias("dist_e4"),
    ).orderBy("event_type")


SQL_DIEL_JSD = """
WITH d AS (
  SELECT event_type, hour(ts) AS hr,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) + 3) % 7 >= 5
              THEN 1 ELSE 0 END AS wkend
  FROM events
), cells AS (
  SELECT event_type, hr,
         CAST(sum(CASE WHEN wkend = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN wkend = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM d GROUP BY 1, 2
), t AS (
  SELECT event_type, a, b,
         sum(a) OVER (PARTITION BY event_type) AS na,
         sum(b) OVER (PARTITION BY event_type) AS nb
  FROM cells
), terms AS (
  SELECT event_type, na, nb,
         (CASE WHEN a > 0
               THEN 0.5 * (CAST(a AS DOUBLE) / na)
                    * ln((CAST(a AS DOUBLE) / na)
                         / ((CAST(a AS DOUBLE) / na
                             + CAST(b AS DOUBLE) / nb) / 2.0))
               ELSE 0.0 END
          + CASE WHEN b > 0
                 THEN 0.5 * (CAST(b AS DOUBLE) / nb)
                      * ln((CAST(b AS DOUBLE) / nb)
                           / ((CAST(a AS DOUBLE) / na
                               + CAST(b AS DOUBLE) / nb) / 2.0))
                 ELSE 0.0 END) AS term
  FROM t WHERE na > 0 AND nb > 0
)
SELECT event_type, CAST(max(na) AS BIGINT) AS na,
       CAST(max(nb) AS BIGINT) AS nb,
       CAST(floor(sum(term) * 1000000 + 0.5) AS BIGINT) AS jsd_e6,
       CAST(floor(sqrt(sum(term)) * 10000 + 0.5) AS BIGINT) AS dist_e4
FROM terms
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# l_moments — Hosking L-moment ratios of daily counts per type
# ---------------------------------------------------------------------------
# Hosking (JRSS-B 1990): with B_r = sum_i C(i-1, r) * x_(i) (EXACT
# BIGINTs off one rank window; the binomial weights are integer
# polynomials in the rank), b_r = B_r / (n * C(n-1, r)) and the
# lambda/tau ladder is one double expression.  L-CV, L-skew and
# L-kurtosis are the robust shape trio for heavy-tailed counts.


def q_l_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.partitionBy("event_type").orderBy("c", "day")
    r = daily.withColumn("i", F.row_number().over(w))
    i1 = F.col("i") - 1
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("b0n"),
        F.sum(i1 * F.col("c")).alias("b1n"),
        F.sum(i1 * (i1 - 1) * F.col("c")).alias("b2n2"),
        F.sum(i1 * (i1 - 1) * (i1 - 2) * F.col("c")).alias("b3n6"),
    )
    nd = F.col("n").cast("double")
    b0 = F.col("b0n").cast("double") / nd
    b1 = F.col("b1n").cast("double") / (nd * (nd - 1))
    b2 = F.col("b2n2").cast("double") / (nd * (nd - 1) * (nd - 2))
    b3 = F.col("b3n6").cast("double") / (
        nd * (nd - 1) * (nd - 2) * (nd - 3)
    )
    l1 = b0
    l2 = 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    return (
        agg.filter((F.col("n") >= 8) & (l2 > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.floor(l1 * 100 + F.lit(_OFF)).cast("long").alias("l1_e2"),
            F.floor(l2 * 100 + F.lit(_OFF)).cast("long").alias("l2_e2"),
            F.floor(l2 / l1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "lcv_e6"
            ),
            F.floor(l3 / l2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "lskew_e6"
            ),
            F.floor(l4 / l2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "lkurt_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_LMOMENTS = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS i
  FROM daily
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(c) AS BIGINT) AS b0n,
         CAST(sum((i - 1) * c) AS BIGINT) AS b1n,
         CAST(sum((i - 1) * (i - 2) * c) AS BIGINT) AS b2n2,
         CAST(sum((i - 1) * (i - 2) * (i - 3) * c) AS BIGINT) AS b3n6
  FROM r GROUP BY 1
), lm AS (
  SELECT event_type, n,
         CAST(b0n AS DOUBLE) / n AS b0,
         CAST(b1n AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)) AS b1,
         CAST(b2n2 AS DOUBLE)
           / (CAST(n AS DOUBLE) * (n - 1) * (n - 2)) AS b2,
         CAST(b3n6 AS DOUBLE)
           / (CAST(n AS DOUBLE) * (n - 1) * (n - 2) * (n - 3)) AS b3
  FROM agg
), l AS (
  SELECT event_type, n, b0 AS l1,
         2 * b1 - b0 AS l2,
         6 * b2 - 6 * b1 + b0 AS l3,
         20 * b3 - 30 * b2 + 12 * b1 - b0 AS l4
  FROM lm
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(l1 * 100 + {_OFF}) AS BIGINT) AS l1_e2,
       CAST(floor(l2 * 100 + {_OFF}) AS BIGINT) AS l2_e2,
       CAST(floor(l2 / l1 * 1000000 + {_OFF}) AS BIGINT) AS lcv_e6,
       CAST(floor(l3 / l2 * 1000000 + {_OFF}) AS BIGINT) AS lskew_e6,
       CAST(floor(l4 / l2 * 1000000 + {_OFF}) AS BIGINT) AS lkurt_e6
FROM l
WHERE n >= 8 AND l2 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# zero_inflation — van den Broek score test on the hourly grid
# ---------------------------------------------------------------------------
# Are there more empty hours than Poisson predicts?  Zeros = span
# hours minus observed hours (exact); lambda = tot/span exact
# rational; the score z (van den Broek, Biometrics 1995) is one
# expression with a single exp on both engines.


def q_zero_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
        )
        .cast("long")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"),
        F.max("hr").alias("h1"),
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("c").alias("tot"),
    )
    span = (F.col("h1") - F.col("h0") + 1).cast("long")
    agg = agg.withColumn("span", span).withColumn(
        "n0", span - F.col("n_obs")
    )
    nd = F.col("span").cast("double")
    lam = F.col("tot").cast("double") / nd
    p0 = F.exp(-lam)
    num = F.col("n0").cast("double") - nd * p0
    den = F.sqrt(nd * p0 * (1.0 - p0) - nd * lam * p0 * p0)
    z = num / den
    return (
        agg.filter((F.col("span") >= 10) & (den > 0))
        .select(
            "event_type",
            F.col("span").cast("long").alias("span"),
            F.col("n0").cast("long").alias("n0"),
            F.col("tot").cast("long").alias("tot"),
            F.floor(z * 10_000 + F.lit(0.5)).cast("long").alias("z_e4"),
        )
        .orderBy("event_type")
    )


SQL_ZERO_INFL = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         count(*) AS c
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type, max(hr) - min(hr) + 1 AS span,
         max(hr) - min(hr) + 1 - count(*) AS n0,
         CAST(sum(c) AS BIGINT) AS tot
  FROM hourly GROUP BY 1
), t AS (
  SELECT event_type, span, n0, tot,
         CAST(tot AS DOUBLE) / span AS lam,
         exp(-(CAST(tot AS DOUBLE) / span)) AS p0
  FROM agg
)
SELECT event_type, CAST(span AS BIGINT) AS span, CAST(n0 AS BIGINT) AS n0,
       tot,
       CAST(floor((CAST(n0 AS DOUBLE) - span * p0)
                  / sqrt(CAST(span AS DOUBLE) * p0 * (1.0 - p0)
                         - CAST(span AS DOUBLE) * lam * p0 * p0)
                  * 10000 + 0.5) AS BIGINT) AS z_e4
FROM t
WHERE span >= 10
  AND CAST(span AS DOUBLE) * p0 * (1.0 - p0)
      - CAST(span AS DOUBLE) * lam * p0 * p0 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# laplace_trend — Laplace trend test on event arrival times per type
# ---------------------------------------------------------------------------
# The reliability-engineering standard (Cox & Lewis 1966): for event
# times u_i in (0, T), z = (mean(u)/T - 1/2) * sqrt(12 n) detects
# intensity trend in a point process.  Exact integer second sums; one
# expression.


def q_laplace_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("sec"),
    )
    wn = Window.partitionBy("event_type")
    d = ev.withColumn("t0", F.min("sec").over(wn)).withColumn(
        "t1", F.max("sec").over(wn)
    )
    d = d.withColumn("u", F.col("sec") - F.col("t0"))
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("su"),
        F.max(F.col("t1") - F.col("t0")).alias("tt"),
    )
    nd = F.col("n").cast("double")
    z = (
        F.col("su").cast("double") / nd / F.col("tt").cast("double") - 0.5
    ) * F.sqrt(12.0 * nd)
    return (
        agg.filter((F.col("tt") > 0) & (F.col("n") >= 10))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("tt").cast("long").alias("span_s"),
            F.floor(z * 10_000 + F.lit(0.5)).cast("long").alias("z_e4"),
        )
        .orderBy("event_type")
    )


SQL_LAPLACE = """
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
), d AS (
  SELECT event_type, sec,
         min(sec) OVER (PARTITION BY event_type) AS t0,
         max(sec) OVER (PARTITION BY event_type) AS t1
  FROM ev
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(sec - t0) AS BIGINT) AS su,
         CAST(max(t1 - t0) AS BIGINT) AS tt
  FROM d GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n, tt AS span_s,
       CAST(floor((CAST(su AS DOUBLE) / n / tt - 0.5)
                  * sqrt(12.0 * n) * 10000 + 0.5) AS BIGINT) AS z_e4
FROM agg
WHERE tt > 0 AND n >= 10
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# caps_profile — capitalization structure per language
# ---------------------------------------------------------------------------
# Curation signals: Title-Case word rate, ALL-CAPS word rate (len >=
# 2), and the uppercase-letter share — pure regexp codegen, exact
# integers.


def q_caps_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
        F.regexp_count(
            F.col("text"), F.lit(r"(^|\s)[A-Z][a-z]+")
        ).alias("n_title"),
        F.regexp_count(
            F.col("text"), F.lit(r"(^|\s)[A-Z]{2,}(\s|$)")
        ).alias("n_allcaps"),
        F.regexp_count(F.col("text"), F.lit("[A-Z]")).alias("n_upper"),
        F.regexp_count(F.col("text"), F.lit("[A-Za-z]")).alias("n_alpha"),
    )
    agg = d.groupBy("lang").agg(
        F.sum("n_words").alias("n_words"),
        F.sum("n_title").alias("n_title"),
        F.sum("n_allcaps").alias("n_allcaps"),
        F.sum("n_upper").alias("n_upper"),
        F.sum("n_alpha").alias("n_alpha"),
    )
    tr = F.col("n_title").cast("double") / F.col("n_words").cast("double")
    ar = F.col("n_allcaps").cast("double") / F.col("n_words").cast("double")
    ur = F.col("n_upper").cast("double") / F.col("n_alpha").cast("double")
    return agg.filter((F.col("n_words") > 0) & (F.col("n_alpha") > 0)).select(
        "lang",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_title").cast("long").alias("n_title"),
        F.col("n_allcaps").cast("long").alias("n_allcaps"),
        F.floor(tr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "title_rate_e6"
        ),
        F.floor(ar * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "allcaps_rate_e6"
        ),
        F.floor(ur * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "upper_share_e6"
        ),
    ).orderBy("lang")


SQL_CAPS = f"""
WITH d AS (
  SELECT lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
         len(regexp_extract_all(text, '(^|\\s)[A-Z][a-z]+')) AS n_title,
         len(regexp_extract_all(text, '(^|\\s)[A-Z]{{2,}}(\\s|$)'))
           AS n_allcaps,
         len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
         len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
  FROM documents
), agg AS (
  SELECT lang, CAST(sum(n_words) AS BIGINT) AS n_words,
         CAST(sum(n_title) AS BIGINT) AS n_title,
         CAST(sum(n_allcaps) AS BIGINT) AS n_allcaps,
         CAST(sum(n_upper) AS BIGINT) AS n_upper,
         CAST(sum(n_alpha) AS BIGINT) AS n_alpha
  FROM d GROUP BY 1
)
SELECT lang, n_words, n_title, n_allcaps,
       CAST(floor(CAST(n_title AS DOUBLE) / n_words * 1000000 + {_OFF})
            AS BIGINT) AS title_rate_e6,
       CAST(floor(CAST(n_allcaps AS DOUBLE) / n_words * 1000000 + {_OFF})
            AS BIGINT) AS allcaps_rate_e6,
       CAST(floor(CAST(n_upper AS DOUBLE) / n_alpha * 1000000 + {_OFF})
            AS BIGINT) AS upper_share_e6
FROM agg
WHERE n_words > 0 AND n_alpha > 0
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# kpss_level — KPSS level-stationarity statistic (lag-0) per type
# ---------------------------------------------------------------------------
# Kwiatkowski-Phillips-Schmidt-Shin (J. Econometrics 1992), short-run
# variance at lag 0: with partial sums of the demeaned series kept
# exact as n*cum_t - t*S, the statistic is
# sum(n*cum - t*S)^2 / (n^2 * (n*S2 - S^2)) — exact BIGINTs, one
# division.  The unit-root companion to variance_ratio and the trend
# battery.


def q_kpss_level(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wo = Window.partitionBy("event_type").orderBy("day")
    wn = Window.partitionBy("event_type")
    d = (
        daily.withColumn("t", F.row_number().over(wo))
        .withColumn(
            "cum",
            F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("s", F.sum("c").over(wn))
        .withColumn("q", F.sum(F.col("c") * F.col("c")).over(wn))
    )
    part = F.col("n") * F.col("cum") - F.col("t") * F.col("s")
    agg = d.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.max("q").alias("q"),
        F.sum(part * part).alias("ss"),
    )
    den = F.col("n") * F.col("n") * (
        F.col("n") * F.col("q") - F.col("s") * F.col("s")
    )
    eta = F.col("ss").cast("double") / den.cast("double")
    return (
        agg.filter((F.col("n") >= 10) & (den > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("ss").cast("long").alias("ss"),
            F.floor(eta * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "eta_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_KPSS = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         sum(c) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS cum,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS s,
         sum(c * c) OVER (PARTITION BY event_type) AS q
  FROM daily
), agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(max(s) AS BIGINT) AS s, CAST(max(q) AS BIGINT) AS q,
         CAST(sum((n * cum - t * s) * (n * cum - t * s)) AS BIGINT) AS ss
  FROM d GROUP BY 1
)
SELECT event_type, n, ss,
       CAST(floor(CAST(ss AS DOUBLE)
                  / (CAST(n AS DOUBLE) * n * (n * q - s * s))
                  * 1000000 + {_OFF}) AS BIGINT) AS eta_e6
FROM agg
WHERE n >= 10 AND n * q - s * s > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# user_specialization — event-type HHI distribution across users
# ---------------------------------------------------------------------------
# Per-user Herfindahl over event types (HHI = sum share^2, exact
# rational sum(c^2)/total^2); report per event-grid: mean HHI,
# specialist share (HHI > 1/2, an exact integer inequality
# 2*sum c^2 > total^2), and the user count.


def q_user_specialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    u = per.groupBy("user_id").agg(
        F.sum("c").alias("tot"),
        F.sum(F.col("c") * F.col("c")).alias("c2"),
        F.count(F.lit(1)).alias("k"),
    )
    hhi = F.col("c2").cast("double") / (
        F.col("tot").cast("double") * F.col("tot")
    )
    spec = (2 * F.col("c2") > F.col("tot") * F.col("tot")).cast("long")
    agg = u.select(hhi.alias("hhi"), spec.alias("spec"), "k").groupBy().agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("spec").alias("n_specialists"),
        F.sum("hhi").alias("hhi_sum"),
        F.sum("k").alias("k_sum"),
    )
    mean_hhi = F.col("hhi_sum") / F.col("n_users").cast("double")
    spec_share = F.col("n_specialists").cast("double") / F.col(
        "n_users"
    ).cast("double")
    mean_k = F.col("k_sum").cast("double") / F.col("n_users").cast("double")
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_specialists").cast("long").alias("n_specialists"),
        F.floor(mean_hhi * 1_000_000 + F.lit(0.5)).cast("long").alias(
            "mean_hhi_e6"
        ),
        F.floor(spec_share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "spec_share_e6"
        ),
        F.floor(mean_k * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mean_k_e4"
        ),
    )


SQL_SPECIALIZATION = f"""
WITH per AS (
  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
), u AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS tot,
         CAST(sum(c * c) AS BIGINT) AS c2, count(*) AS k
  FROM per GROUP BY 1
), t AS (
  SELECT CAST(c2 AS DOUBLE) / (CAST(tot AS DOUBLE) * tot) AS hhi,
         CASE WHEN 2 * c2 > tot * tot THEN 1 ELSE 0 END AS spec,
         k
  FROM u
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(spec) AS BIGINT) AS n_specialists,
       CAST(floor(sum(hhi) / count(*) * 1000000 + 0.5) AS BIGINT)
         AS mean_hhi_e6,
       CAST(floor(CAST(sum(spec) AS DOUBLE) / count(*) * 1000000 + {_OFF})
            AS BIGINT) AS spec_share_e6,
       CAST(floor(CAST(sum(k) AS DOUBLE) / count(*) * 10000 + {_OFF})
            AS BIGINT) AS mean_k_e4
FROM t
"""


# ---------------------------------------------------------------------------
# medcouple — robust skewness of daily counts (strict-pair kernel)
# ---------------------------------------------------------------------------
# Brys, Hubert & Struyf (JCGS 2004): MC = median over pairs x_i < med
# < x_j of h = ((x_j - med) - (med - x_i)) / (x_j - x_i) — restricted
# to STRICT pairs (the med-equal kernel special cases are excluded;
# documented deviation, exact on tie-free grids).  Each h is one IEEE
# division of exact integers; low-median selection of identical
# doubles is deterministic.


def q_medcouple(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.partitionBy("event_type").orderBy("c", "day")
    wn = Window.partitionBy("event_type")
    r = daily.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(
        F.col("rk") == F.floor((F.col("nn") - 1) / 2) + 1
    ).select("event_type", F.col("c").alias("med"))
    lo = daily.join(F.broadcast(med), "event_type").filter(
        F.col("c") < F.col("med")
    ).select("event_type", F.col("c").alias("xi"), "med")
    hi = daily.join(F.broadcast(med), "event_type").filter(
        F.col("c") > F.col("med")
    ).select(F.col("event_type").alias("et2"), F.col("c").alias("xj"))
    p = lo.join(hi, lo.event_type == hi.et2).select(
        "event_type",
        (
            ((F.col("xj") - F.col("med")) - (F.col("med") - F.col("xi")))
            .cast("double")
            / (F.col("xj") - F.col("xi")).cast("double")
        ).alias("h"),
    )
    wr = Window.partitionBy("event_type").orderBy("h")
    wc = Window.partitionBy("event_type")
    rr = p.withColumn("rk", F.row_number().over(wr)).withColumn(
        "np", F.count(F.lit(1)).over(wc)
    )
    sel = rr.filter(F.col("rk") == F.floor((F.col("np") - 1) / 2) + 1)
    return sel.select(
        "event_type",
        F.col("np").cast("long").alias("n_pairs"),
        F.floor(F.col("h") * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "mc_e6"
        ),
    ).orderBy("event_type")


SQL_MEDCOUPLE = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM daily
), med AS (
  SELECT event_type, c AS med FROM r WHERE rk = (nn - 1) // 2 + 1
), lo AS (
  SELECT daily.event_type, daily.c AS xi, med.med
  FROM daily JOIN med ON med.event_type = daily.event_type
  WHERE daily.c < med.med
), hi AS (
  SELECT daily.event_type, daily.c AS xj
  FROM daily JOIN med ON med.event_type = daily.event_type
  WHERE daily.c > med.med
), p AS (
  SELECT lo.event_type,
         CAST((xj - med) - (med - xi) AS DOUBLE) / (xj - xi) AS h
  FROM lo JOIN hi ON hi.event_type = lo.event_type
), rr AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk,
         count(*) OVER (PARTITION BY event_type) AS np
  FROM p
)
SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
       CAST(floor(h * 1000000 + {_OFF}) AS BIGINT) AS mc_e6
FROM rr
WHERE rk = (np - 1) // 2 + 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ulcer_index — Martin's ulcer index of the daily count series
# ---------------------------------------------------------------------------
# Martin (1987): UI = sqrt(mean over days of pct-drawdown^2), with
# drawdown against the RUNNING max (day-ordered cumulative max —
# deterministic); the per-day percentage is one division of exact
# integers; the squared fold is day-bounded (anova grid argument).


def q_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wo = Window.partitionBy("event_type").orderBy("day")
    d = daily.withColumn(
        "rmax",
        F.max("c").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    dd = (
        (F.col("rmax") - F.col("c")).cast("double")
        / F.col("rmax").cast("double")
        * 100.0
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dd * dd).alias("sdd"),
        F.max("rmax").alias("peak"),
    )
    ui = F.sqrt(F.col("sdd") / F.col("n").cast("double"))
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("peak").cast("long").alias("peak"),
        F.floor(ui * 10_000 + F.lit(0.5)).cast("long").alias("ui_e4"),
    ).orderBy("event_type")


SQL_ULCER = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, c,
         max(c) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS rmax
  FROM daily
), t AS (
  SELECT event_type,
         (CAST(rmax - c AS DOUBLE) / rmax * 100.0) AS dd, rmax
  FROM d
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(max(rmax) AS BIGINT) AS peak,
       CAST(floor(sqrt(sum(dd * dd) / count(*)) * 10000 + 0.5) AS BIGINT)
         AS ui_e4
FROM t
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# expected_shortfall — lower-tail ES (worst 5% of days) per type
# ---------------------------------------------------------------------------
# The coherent risk measure (Acerbi & Tasche 2002) applied to traffic
# drops: k = max(1, n//20) worst days; VaR = k-th order statistic,
# ES = mean of the k worst — exact integers off one ascending rank
# window.


def q_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.partitionBy("event_type").orderBy("c", "day")
    wn = Window.partitionBy("event_type")
    r = daily.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    k = F.greatest(F.lit(1), F.expr("nn div 20"))
    agg = r.groupBy("event_type").agg(
        F.max("nn").alias("n"),
        F.max(k).alias("k"),
        F.sum(F.when(F.col("rk") <= k, F.col("c")).otherwise(0)).alias(
            "tail_sum"
        ),
        F.max(F.when(F.col("rk") == k, F.col("c"))).alias("var_k"),
    )
    es = F.col("tail_sum").cast("double") / F.col("k").cast("double")
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.col("var_k").cast("long").alias("var_k"),
        F.floor(es * 10_000 + F.lit(_OFF)).cast("long").alias("es_e4"),
    ).orderBy("event_type")


SQL_ES = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM daily
)
SELECT event_type, CAST(max(nn) AS BIGINT) AS n,
       CAST(max(greatest(1, nn // 20)) AS BIGINT) AS k,
       CAST(max(CASE WHEN rk = greatest(1, nn // 20) THEN c END)
            AS BIGINT) AS var_k,
       CAST(floor(CAST(sum(CASE WHEN rk <= greatest(1, nn // 20)
                                THEN c ELSE 0 END) AS DOUBLE)
                  / max(greatest(1, nn // 20)) * 10000 + {_OFF})
            AS BIGINT) AS es_e4
FROM r
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# median_ci — distribution-free binomial CI for the median
# ---------------------------------------------------------------------------
# The classic order-statistic interval (Hahn & Meeker 1991): ranks
# l = floor((n - 1.96*sqrt(n))/2), u = n + 1 - l clamped to [1, n];
# the interval is (x_(l), x_(u)) — rank arithmetic uses the same 1.96
# literal and floor on both engines, selections are exact order
# statistics of daily counts.


def q_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.partitionBy("event_type").orderBy("c", "day")
    wn = Window.partitionBy("event_type")
    r = daily.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    nd = F.col("nn").cast("double")
    lo_rk = F.greatest(
        F.lit(1), F.floor((nd - 1.96 * F.sqrt(nd)) / 2.0).cast("long")
    )
    hi_rk = F.least(F.col("nn"), F.col("nn") + 1 - lo_rk)
    med_rk = F.floor((F.col("nn") - 1) / 2) + 1
    r = r.withColumn("lo_rk", lo_rk).withColumn("hi_rk", hi_rk).withColumn(
        "med_rk", med_rk
    )
    agg = r.groupBy("event_type").agg(
        F.max("nn").alias("n"),
        F.max(F.when(F.col("rk") == F.col("lo_rk"), F.col("c"))).alias("lo"),
        F.max(F.when(F.col("rk") == F.col("med_rk"), F.col("c"))).alias(
            "med"
        ),
        F.max(F.when(F.col("rk") == F.col("hi_rk"), F.col("c"))).alias("hi"),
    )
    return (
        agg.filter(F.col("n") >= 6)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("lo").cast("long").alias("lo"),
            F.col("med").cast("long").alias("med"),
            F.col("hi").cast("long").alias("hi"),
        )
        .orderBy("event_type")
    )


SQL_MEDIAN_CI = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM daily
), t AS (
  SELECT event_type, c, rk, nn,
         greatest(1, CAST(floor((nn - 1.96 * sqrt(CAST(nn AS DOUBLE)))
                                / 2.0) AS BIGINT)) AS lo_rk,
         (nn - 1) // 2 + 1 AS med_rk
  FROM r
)
SELECT event_type, CAST(max(nn) AS BIGINT) AS n,
       CAST(max(CASE WHEN rk = lo_rk THEN c END) AS BIGINT) AS lo,
       CAST(max(CASE WHEN rk = med_rk THEN c END) AS BIGINT) AS med,
       CAST(max(CASE WHEN rk = least(nn, nn + 1 - lo_rk) THEN c END)
            AS BIGINT) AS hi
FROM t
GROUP BY 1
HAVING max(nn) >= 6
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# max_outage — longest silent stretch on the hourly grid per type
# ---------------------------------------------------------------------------
# Availability readout: gaps between consecutive OBSERVED hours;
# longest silence (gap - 1 hours), count of silences >= 3 h, and total
# silent hours within the span — all exact integers off one
# day-ordered lag.


def q_max_outage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
        )
        .cast("long")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("hr")
    g = hourly.withColumn("prev", F.lag("hr").over(wo)).withColumn(
        "silent", F.col("hr") - F.col("prev") - 1
    )
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.max("silent").alias("max_silent"),
        F.sum(
            F.when(F.col("silent") >= 3, 1).otherwise(0)
        ).alias("n_outages_3h"),
        F.sum(F.coalesce(F.col("silent"), F.lit(0))).alias("total_silent"),
    )
    return agg.select(
        "event_type",
        F.col("n_hours").cast("long").alias("n_hours"),
        F.coalesce(F.col("max_silent"), F.lit(0)).cast("long").alias(
            "max_silent"
        ),
        F.col("n_outages_3h").cast("long").alias("n_outages_3h"),
        F.col("total_silent").cast("long").alias("total_silent"),
    ).orderBy("event_type")


SQL_MAX_OUTAGE = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         count(*) AS c
  FROM events GROUP BY 1, 2
), g AS (
  SELECT event_type,
         hr - lag(hr) OVER (PARTITION BY event_type ORDER BY hr) - 1
           AS silent
  FROM hourly
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
       CAST(coalesce(max(silent), 0) AS BIGINT) AS max_silent,
       CAST(sum(CASE WHEN silent >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outages_3h,
       CAST(sum(coalesce(silent, 0)) AS BIGINT) AS total_silent
FROM g
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# diel_fwhm — full-width-at-half-max of the diel profile per type
# ---------------------------------------------------------------------------
# Peak sharpness: 24-bin hourly profile; peak count, hours at or above
# half the peak (the FWHM analogue on a cyclic 24-bin histogram), and
# the peak-to-mean ratio — exact integers, the half-max test as the
# integer inequality 2*c >= peak.


def q_diel_fwhm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    prof = ev.groupBy(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wn = Window.partitionBy("event_type")
    t = prof.withColumn("peak", F.max("c").over(wn)).withColumn(
        "tot", F.sum("c").over(wn)
    ).withColumn("nh", F.count(F.lit(1)).over(wn))
    agg = t.groupBy("event_type").agg(
        F.max("peak").alias("peak"),
        F.max("tot").alias("tot"),
        F.max("nh").alias("nh"),
        F.sum((2 * F.col("c") >= F.col("peak")).cast("long")).alias(
            "fwhm_hours"
        ),
        F.min(F.when(F.col("c") == F.col("peak"), F.col("hr"))).alias(
            "peak_hr"
        ),
    )
    pmr = (
        F.col("peak").cast("double")
        * F.col("nh").cast("double")
        / F.col("tot").cast("double")
    )
    return agg.select(
        "event_type",
        F.col("peak_hr").cast("long").alias("peak_hr"),
        F.col("peak").cast("long").alias("peak"),
        F.col("fwhm_hours").cast("long").alias("fwhm_hours"),
        F.floor(pmr * 10_000 + F.lit(_OFF)).cast("long").alias(
            "peak_mean_ratio_e4"
        ),
    ).orderBy("event_type")


SQL_DIEL_FWHM = f"""
WITH prof AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS c
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, hr, c,
         max(c) OVER (PARTITION BY event_type) AS peak,
         sum(c) OVER (PARTITION BY event_type) AS tot,
         count(*) OVER (PARTITION BY event_type) AS nh
  FROM prof
)
SELECT event_type,
       CAST(min(CASE WHEN c = peak THEN hr END) AS BIGINT) AS peak_hr,
       CAST(max(peak) AS BIGINT) AS peak,
       CAST(sum(CASE WHEN 2 * c >= peak THEN 1 ELSE 0 END) AS BIGINT)
         AS fwhm_hours,
       CAST(floor(CAST(max(peak) AS DOUBLE) * max(nh) / max(tot)
                  * 10000 + {_OFF}) AS BIGINT) AS peak_mean_ratio_e4
FROM t
GROUP BY 1
ORDER BY event_type
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cusum_squares": q_cusum_squares,
    "bartels_rvn": q_bartels_rvn,
    "good_toulmin": q_good_toulmin,
    "hill_numbers": q_hill_numbers,
    "transfer_entropy": q_transfer_entropy,
    "rate_ratio": q_rate_ratio,
    "uniqueness_risk": q_uniqueness_risk,
    "load_profile": q_load_profile,
    "boilerplate_prefixes": q_boilerplate_prefixes,
    "mad_outlier_rate": q_mad_outlier_rate,
    "charset_coverage": q_charset_coverage,
    "core_vocab_coverage": q_core_vocab_coverage,
    "extremal_index": q_extremal_index,
    "vocab_gini": q_vocab_gini,
    "exp_gap_fit": q_exp_gap_fit,
    "word_length_profile": q_word_length_profile,
    "habit_strength": q_habit_strength,
    "dow_anova": q_dow_anova,
    "peak_week": q_peak_week,
    "cvm_two_sample": q_cvm_two_sample,
    "sample_entropy": q_sample_entropy,
    "time_reversal_asymmetry": q_time_reversal_asymmetry,
    "cohens_h": q_cohens_h,
    "diel_jsd": q_diel_jsd,
    "l_moments": q_l_moments,
    "zero_inflation": q_zero_inflation,
    "laplace_trend": q_laplace_trend,
    "caps_profile": q_caps_profile,
    "kpss_level": q_kpss_level,
    "user_specialization": q_user_specialization,
    "medcouple": q_medcouple,
    "ulcer_index": q_ulcer_index,
    "expected_shortfall": q_expected_shortfall,
    "median_ci": q_median_ci,
    "max_outage": q_max_outage,
    "diel_fwhm": q_diel_fwhm,
}

ORACLE_SQL: dict[str, str] = {
    "cusum_squares": SQL_CUSUM_SQ,
    "bartels_rvn": SQL_BARTELS,
    "good_toulmin": SQL_GOOD_TOULMIN,
    "hill_numbers": SQL_HILL_NUMBERS,
    "transfer_entropy": SQL_TRANSFER_ENTROPY,
    "rate_ratio": SQL_RATE_RATIO,
    "uniqueness_risk": SQL_UNIQUENESS,
    "load_profile": SQL_LOAD_PROFILE,
    "boilerplate_prefixes": SQL_BOILERPLATE,
    "mad_outlier_rate": SQL_MAD_OUTLIER,
    "charset_coverage": SQL_CHARSET,
    "core_vocab_coverage": SQL_CORE_VOCAB,
    "extremal_index": SQL_EXTREMAL,
    "vocab_gini": SQL_VOCAB_GINI,
    "exp_gap_fit": SQL_EXP_GAP,
    "word_length_profile": SQL_WORD_LENGTH,
    "habit_strength": SQL_HABIT,
    "dow_anova": SQL_DOW_ANOVA,
    "peak_week": SQL_PEAK_WEEK,
    "cvm_two_sample": SQL_CVM,
    "sample_entropy": SQL_SAMPEN,
    "time_reversal_asymmetry": SQL_TREV,
    "cohens_h": SQL_COHENS_H,
    "diel_jsd": SQL_DIEL_JSD,
    "l_moments": SQL_LMOMENTS,
    "zero_inflation": SQL_ZERO_INFL,
    "laplace_trend": SQL_LAPLACE,
    "caps_profile": SQL_CAPS,
    "kpss_level": SQL_KPSS,
    "user_specialization": SQL_SPECIALIZATION,
    "medcouple": SQL_MEDCOUPLE,
    "ulcer_index": SQL_ULCER,
    "expected_shortfall": SQL_ES,
    "median_ci": SQL_MEDIAN_CI,
    "max_outage": SQL_MAX_OUTAGE,
    "diel_fwhm": SQL_DIEL_FWHM,
}
