"""Round-4 continuation registry (eighth stats battery): welfare-style
inequality (Atkinson), corpus-linguistics dispersion (Juilland's D),
blocked edit-distance near-dup verification, and the two-sample
log-rank survival test.

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)``, derived
doubles floor-scaled with the house 1/pi offset; per-row transcendental
terms (ln, reciprocals, divisions) are floor-scaled to integers BEFORE
any aggregate sum so the cross-engine sum order can never matter.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _HOURLY_SQL, _OFF, _documents

# ---------------------------------------------------------------------------
# atkinson_index — Atkinson inequality indices A(1) and A(2) per source
# ---------------------------------------------------------------------------
# Atkinson (JET 2, 1970): A(eps) = 1 - EDE/mean where the equally-
# distributed equivalent is the geometric mean at eps=1 and the
# harmonic mean at eps=2.  Series = document lengths (n_chars > 0) per
# source.  Per-doc ln(x) is e9-floored and 1/x is e12-floored before
# summing (order-free exact BIGINT sums); sum(x) is exact BIGINT, so
# the two index chains are fixed-order doubles off exact integers.
# Complements theil_decomposition (queries_stats7) and gini_sources:
# one combinable groupBy, no window, no join — the 100 TB plan is a
# single map-side-combined aggregation.


def q_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).filter(F.col("n_chars") > 0)
    x = F.col("n_chars").cast("double")
    terms = d.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.floor(F.log(x) * 1e9 + F.lit(_OFF)).cast("long").alias("l9"),
        F.floor(F.lit(1e12) / x + F.lit(_OFF)).cast("long").alias("r12"),
    )
    agg = terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("l9").alias("sl9"),
        F.sum("r12").alias("sr12"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / nd
    geo = F.exp(F.col("sl9").cast("double") / 1e9 / nd)
    harm = nd / (F.col("sr12").cast("double") / 1e12)
    return (
        agg.filter(F.col("n") >= 2)
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.floor((1.0 - geo / mean) * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("atk1_e6"),
            F.floor((1.0 - harm / mean) * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("atk2_e6"),
        )
        .orderBy("source")
    )


SQL_ATKINSON = f"""
WITH terms AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 1e9 + {_OFF})
              AS BIGINT) AS l9,
         CAST(floor(1e12 / CAST(n_chars AS DOUBLE) + {_OFF})
              AS BIGINT) AS r12
  FROM documents WHERE n_chars > 0
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(l9) AS BIGINT) AS sl9,
         CAST(sum(r12) AS BIGINT) AS sr12
  FROM terms GROUP BY 1
)
SELECT source, n AS n_docs,
       CAST(floor((1.0 - exp(CAST(sl9 AS DOUBLE) / 1e9 / n)
                         / (CAST(sx AS DOUBLE) / n))
                  * 1000000 + {_OFF}) AS BIGINT) AS atk1_e6,
       CAST(floor((1.0 - (CAST(n AS DOUBLE)
                          / (CAST(sr12 AS DOUBLE) / 1e12))
                         / (CAST(sx AS DOUBLE) / n))
                  * 1000000 + {_OFF}) AS BIGINT) AS atk2_e6
FROM agg
WHERE n >= 2
ORDER BY source
"""


# ---------------------------------------------------------------------------
# juilland_d — Juilland's dispersion D of the top-30 corpus words
# ---------------------------------------------------------------------------
# Juilland & Chang-Rodriguez (Frequency Dictionary of Spanish Words,
# 1964): D = 1 - CV / sqrt(k - 1) over a word's relative frequencies
# in the k corpus parts (sources); D = 1 means perfectly even use,
# D -> 0 means concentration in one part.  Reuses the burrows_delta
# grid discipline (queries_stats7): deterministic top-30 vocabulary
# (global count desc, word asc), dense word x source grid via a 30-row
# broadcast cross join, f and f^2 e12-floored per cell so the CV comes
# off exact BIGINT sums.  Population CV, documented.


_D_K = 30


def q_juilland_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.groupBy("w")
        .agg(F.sum("c").alias("gc"))
        .orderBy(F.desc("gc"), F.asc("w"))
        .limit(_D_K)
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    grid = (
        tot.crossJoin(F.broadcast(vocab))
        .join(cnt, ["source", "w"], "left")
        .fillna(0, subset=["c"])
    )
    f = F.col("c").cast("double") / F.col("t").cast("double")
    grid = grid.withColumn(
        "f12", F.floor(f * 1e12 + F.lit(_OFF)).cast("long")
    )
    fd = F.col("f12").cast("double") / 1e12
    grid = grid.withColumn(
        "ff12", F.floor(fd * fd * 1e12 + F.lit(_OFF)).cast("long")
    )
    mom = grid.groupBy("w").agg(
        F.max("gc").alias("gc"),
        F.count(F.lit(1)).alias("k"),
        F.sum("f12").alias("sf"),
        F.sum("ff12").alias("sff"),
    )
    kd = F.col("k").cast("double")
    mu = F.col("sf").cast("double") / (kd * 1e12)
    var = F.col("sff").cast("double") / (kd * 1e12) - mu * mu
    d = 1.0 - F.sqrt(var) / mu / F.sqrt(kd - 1.0)
    return (
        mom.filter((F.col("k") >= 2) & (F.col("sf") > 0))
        .select(
            "w",
            F.col("gc").cast("long").alias("gc"),
            F.col("k").cast("long").alias("k_sources"),
            F.floor(d * 1_000_000 + F.lit(_OFF)).cast("long").alias("d_e6"),
        )
        .orderBy("w")
    )


SQL_JUILLAND = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), cnt AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
), vocab AS (
  SELECT w, gc FROM (
    SELECT w, CAST(sum(c) AS BIGINT) AS gc FROM cnt GROUP BY 1
  ) ORDER BY gc DESC, w ASC LIMIT {_D_K}
), tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1
), grid AS (
  SELECT tot.source, vocab.w, vocab.gc, tot.t, COALESCE(cnt.c, 0) AS c
  FROM tot CROSS JOIN vocab
  LEFT JOIN cnt ON cnt.source = tot.source AND cnt.w = vocab.w
), g12 AS (
  SELECT source, w, gc,
         CAST(floor(CAST(c AS DOUBLE) / CAST(t AS DOUBLE) * 1e12 + {_OFF})
              AS BIGINT) AS f12
  FROM grid
), g24 AS (
  SELECT source, w, gc, f12,
         CAST(floor((CAST(f12 AS DOUBLE) / 1e12)
                    * (CAST(f12 AS DOUBLE) / 1e12) * 1e12 + {_OFF})
              AS BIGINT) AS ff12
  FROM g12
), mom AS (
  SELECT w, CAST(max(gc) AS BIGINT) AS gc,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(f12) AS BIGINT) AS sf,
         CAST(sum(ff12) AS BIGINT) AS sff
  FROM g24 GROUP BY 1
)
SELECT w, gc, k AS k_sources,
       CAST(floor((1.0 - sqrt(CAST(sff AS DOUBLE) / (k * 1e12)
                              - (CAST(sf AS DOUBLE) / (k * 1e12))
                                * (CAST(sf AS DOUBLE) / (k * 1e12)))
                         / (CAST(sf AS DOUBLE) / (k * 1e12))
                         / sqrt(CAST(k AS DOUBLE) - 1.0))
                  * 1000000 + {_OFF}) AS BIGINT) AS d_e6
FROM mom
WHERE k >= 2 AND sf > 0
ORDER BY w
"""


# ---------------------------------------------------------------------------
# title_edit_dedup — blocked Levenshtein profile over title prefixes
# ---------------------------------------------------------------------------
# The edit-distance verify stage of a title-dedup pipeline (Navarro,
# ACM Comp Surv 33, 2001 for the DP distance): candidate pairs are
# BLOCKED on (lang, n_chars div 64) — the house never-all-pairs
# posture; in production this stage runs AFTER a cheaper signature
# blocking (cf. dedup_simhash), here the length band IS the blocking
# demo.  Distance = levenshtein over the 40-char title prefix; both
# engines implement the standard unit-cost DP on Unicode codepoints,
# so the values are identical integers and every output is exact
# (mean distance is scaled from exact BIGINT sums).


def q_title_edit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 64).cast("long").alias("band"),
        F.substring(F.trim("text"), 1, 40).alias("title"),
    )
    b = d.select(
        F.col("lang").alias("lang_r"),
        F.col("band").alias("band_r"),
        F.col("doc_id").alias("doc_r"),
        F.col("title").alias("title_r"),
    )
    pairs = d.join(
        b,
        (F.col("lang") == F.col("lang_r"))
        & (F.col("band") == F.col("band_r"))
        & (F.col("doc_id") < F.col("doc_r")),
    ).select(
        "lang",
        "band",
        F.levenshtein("title", "title_r").alias("dist"),
    )
    agg = pairs.groupBy("lang", "band").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("dist").alias("min_dist"),
        F.sum(F.col("dist").cast("long")).alias("sd"),
        F.sum(F.when(F.col("dist") <= 5, 1).otherwise(0)).alias("n_near"),
    )
    meand = F.col("sd").cast("double") / F.col("n_pairs").cast("double")
    return agg.select(
        "lang",
        "band",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("min_dist").cast("long").alias("min_dist"),
        F.floor(meand * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mean_dist_e4"
        ),
        F.col("n_near").cast("long").alias("n_near"),
    ).orderBy("lang", "band")


SQL_TITLE_EDIT = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(floor(n_chars / 64.0) AS BIGINT) AS band,
         substr(trim(text), 1, 40) AS title
  FROM documents
), pairs AS (
  SELECT a.lang, a.band, levenshtein(a.title, b.title) AS dist
  FROM d a JOIN d b
    ON b.lang = a.lang AND b.band = a.band AND a.doc_id < b.doc_id
)
SELECT lang, band, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(dist) AS BIGINT) AS min_dist,
       CAST(floor(CAST(sum(dist) AS DOUBLE) / count(*) * 10000 + {_OFF})
            AS BIGINT) AS mean_dist_e4,
       CAST(sum(CASE WHEN dist <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_near
FROM pairs
GROUP BY 1, 2
ORDER BY lang, band
"""


# ---------------------------------------------------------------------------
# logrank_test — two-sample log-rank on user lifetimes (day vs night)
# ---------------------------------------------------------------------------
# Mantel (Cancer Chemother Rep 50, 1966) / Peto & Peto (JRSS A 135,
# 1972): groups = users whose FIRST event lands in day hours [8, 20)
# vs night; event time = lifetime in days (last day - first day + 1),
# all failures observed (no censoring at this horizon, documented).
# At each distinct lifetime t: O1 += d1, E1 += d*n1/n, V += d*(n1/n)*
# (1 - n1/n)*(n - d)/(n - 1).  Risk sets come off suffix sums over the
# BOUNDED lifetime value domain (<= series span in days — the house
# value-domain posture, cf. hodges_lehmann); d/n divisions are
# e9-floored per t before summing, so the chain is order-free.


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
    per = ev.groupBy("user_id").agg(
        F.min(F.floor(sec).cast("long")).alias("first_s"),
        F.min(F.floor(sec / 86_400).cast("long")).alias("d0"),
        F.max(F.floor(sec / 86_400).cast("long")).alias("d1"),
    )
    per = per.select(
        (F.col("d1") - F.col("d0") + 1).alias("t"),
        F.when(
            ((F.col("first_s") % 86_400) / 3_600).cast("long").between(8, 19),
            1,
        )
        .otherwise(0)
        .alias("g1"),
    )
    dt = per.groupBy("t").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("g1").alias("d1"),
    )
    wo = Window.orderBy(F.col("t").desc())
    # suffix sums over the bounded lifetime value domain (<= span days)
    risk = dt.withColumn(
        "n", F.sum("d").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "n1", F.sum("d1").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    nd = F.col("n").cast("double")
    p1 = F.col("n1").cast("double") / nd
    e_t = F.col("d").cast("double") * p1
    v_t = (
        F.col("d").cast("double")
        * p1
        * (1.0 - p1)
        * (F.col("n") - F.col("d")).cast("double")
        / (nd - 1.0)
    )
    terms = risk.filter(F.col("n") > 1).select(
        F.col("d1").alias("o1t"),
        F.floor(e_t * 1e9 + F.lit(_OFF)).cast("long").alias("e9"),
        F.floor(v_t * 1e9 + F.lit(_OFF)).cast("long").alias("v9"),
    )
    agg = terms.agg(
        F.sum("o1t").alias("o1"),
        F.sum("e9").alias("se9"),
        F.sum("v9").alias("sv9"),
    ).crossJoin(
        F.broadcast(
            per.agg(
                F.count(F.lit(1)).alias("n_users"),
                F.sum("g1").alias("n_day"),
            )
        )
    )
    e1 = F.col("se9").cast("double") / 1e9
    v = F.col("sv9").cast("double") / 1e9
    chi = (F.col("o1").cast("double") - e1) * (
        F.col("o1").cast("double") - e1
    ) / v
    return agg.filter(F.col("sv9") > 0).select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_day").cast("long").alias("n_day"),
        F.col("o1").cast("long").alias("o1"),
        F.floor(e1 * 10_000 + F.lit(_OFF)).cast("long").alias("e1_e4"),
        F.floor(v * 10_000 + F.lit(_OFF)).cast("long").alias("v_e4"),
        F.floor(chi * 10_000 + F.lit(_OFF)).cast("long").alias("chi2_e4"),
    )


SQL_LOGRANK = f"""
WITH per AS (
  SELECT CAST(max(floor(epoch(ts) / 86400))
              - min(floor(epoch(ts) / 86400)) + 1 AS BIGINT) AS t,
         CASE WHEN CAST(floor((CAST(min(floor(epoch(ts))) AS BIGINT) % 86400)
                              / 3600) AS BIGINT) BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS g1
  FROM events GROUP BY user_id
), dt AS (
  SELECT t, CAST(count(*) AS BIGINT) AS d,
         CAST(sum(g1) AS BIGINT) AS d1
  FROM per GROUP BY 1
), risk AS (
  SELECT t, d, d1,
         CAST(sum(d) OVER (ORDER BY t DESC) AS BIGINT) AS n,
         CAST(sum(d1) OVER (ORDER BY t DESC) AS BIGINT) AS n1
  FROM dt
), terms AS (
  SELECT d1 AS o1t,
         CAST(floor(d * (CAST(n1 AS DOUBLE) / n) * 1e9 + {_OFF})
              AS BIGINT) AS e9,
         CAST(floor(d * (CAST(n1 AS DOUBLE) / n)
                      * (1.0 - CAST(n1 AS DOUBLE) / n)
                      * CAST(n - d AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)
                      * 1e9 + {_OFF}) AS BIGINT) AS v9
  FROM risk WHERE n > 1
), agg AS (
  SELECT CAST(sum(o1t) AS BIGINT) AS o1,
         CAST(sum(e9) AS BIGINT) AS se9,
         CAST(sum(v9) AS BIGINT) AS sv9
  FROM terms
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(g1) AS BIGINT) AS n_day
  FROM per
)
SELECT n_users, n_day, o1,
       CAST(floor(CAST(se9 AS DOUBLE) / 1e9 * 10000 + {_OFF})
            AS BIGINT) AS e1_e4,
       CAST(floor(CAST(sv9 AS DOUBLE) / 1e9 * 10000 + {_OFF})
            AS BIGINT) AS v_e4,
       CAST(floor((CAST(o1 AS DOUBLE) - CAST(se9 AS DOUBLE) / 1e9)
                  * (CAST(o1 AS DOUBLE) - CAST(se9 AS DOUBLE) / 1e9)
                  / (CAST(sv9 AS DOUBLE) / 1e9) * 10000 + {_OFF})
            AS BIGINT) AS chi2_e4
FROM agg CROSS JOIN tot
WHERE sv9 > 0
"""




# ---------------------------------------------------------------------------
# lorenz_asymmetry — Lorenz asymmetry coefficient S per source
# ---------------------------------------------------------------------------
# Damgaard & Weiner (Ecology 81, 2000): S = F(mu) + L(mu) with the
# interpolated point where the Lorenz curve has slope 1; S < 1 means
# inequality is driven by many small units, S > 1 by a few large ones.
# Series = doc lengths per source.  m, L_m, x_m, x_{m+1} are exact
# order statistics found by the division-free comparison x*n < sum(x)
# (never a double threshold), so everything up to the final delta
# interpolation is exact BIGINT; the S chain is fixed-order doubles.


def q_lorenz_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    tot = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    j = d.join(F.broadcast(tot), "source")
    below = F.col("x") * F.col("n") < F.col("sx")
    agg = j.groupBy("source").agg(
        F.max("n").alias("n"),
        F.max("sx").alias("sx"),
        F.sum(F.when(below, 1).otherwise(0)).alias("m"),
        F.sum(F.when(below, F.col("x")).otherwise(0)).alias("lm"),
        F.max(F.when(below, F.col("x"))).alias("xm"),
        F.min(F.when(~below, F.col("x"))).alias("xm1"),
    )
    mu = F.col("sx").cast("double") / F.col("n").cast("double")
    delta = (mu - F.col("xm").cast("double")) / (
        F.col("xm1") - F.col("xm")
    ).cast("double")
    f_mu = (F.col("m").cast("double") + delta) / F.col("n").cast("double")
    l_mu = (
        F.col("lm").cast("double") + delta * F.col("xm1").cast("double")
    ) / F.col("sx").cast("double")
    return (
        agg.filter(
            (F.col("n") >= 2)
            & (F.col("m") >= 1)
            & (F.col("xm1") > F.col("xm"))
        )
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.col("m").cast("long").alias("m_below"),
            F.floor(f_mu * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "f_mu_e6"
            ),
            F.floor(l_mu * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "l_mu_e6"
            ),
            F.floor((f_mu + l_mu) * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("s_e6"),
        )
        .orderBy("source")
    )


SQL_LORENZ_ASYM = f"""
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents
), tot AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx
  FROM d GROUP BY 1
), agg AS (
  SELECT d.source, max(tot.n) AS n, max(tot.sx) AS sx,
         CAST(sum(CASE WHEN d.x * tot.n < tot.sx THEN 1 ELSE 0 END)
              AS BIGINT) AS m,
         CAST(sum(CASE WHEN d.x * tot.n < tot.sx THEN d.x ELSE 0 END)
              AS BIGINT) AS lm,
         max(CASE WHEN d.x * tot.n < tot.sx THEN d.x END) AS xm,
         min(CASE WHEN d.x * tot.n >= tot.sx THEN d.x END) AS xm1
  FROM d JOIN tot ON tot.source = d.source
  GROUP BY 1
)
SELECT source, n AS n_docs, m AS m_below,
       CAST(floor((CAST(m AS DOUBLE)
                   + (CAST(sx AS DOUBLE) / n - CAST(xm AS DOUBLE))
                     / CAST(xm1 - xm AS DOUBLE))
                  / CAST(n AS DOUBLE) * 1000000 + {_OFF})
            AS BIGINT) AS f_mu_e6,
       CAST(floor((CAST(lm AS DOUBLE)
                   + (CAST(sx AS DOUBLE) / n - CAST(xm AS DOUBLE))
                     / CAST(xm1 - xm AS DOUBLE) * CAST(xm1 AS DOUBLE))
                  / CAST(sx AS DOUBLE) * 1000000 + {_OFF})
            AS BIGINT) AS l_mu_e6,
       CAST(floor(((CAST(m AS DOUBLE)
                    + (CAST(sx AS DOUBLE) / n - CAST(xm AS DOUBLE))
                      / CAST(xm1 - xm AS DOUBLE))
                   / CAST(n AS DOUBLE)
                   + (CAST(lm AS DOUBLE)
                      + (CAST(sx AS DOUBLE) / n - CAST(xm AS DOUBLE))
                        / CAST(xm1 - xm AS DOUBLE) * CAST(xm1 AS DOUBLE))
                     / CAST(sx AS DOUBLE)) * 1000000 + {_OFF})
            AS BIGINT) AS s_e6
FROM agg
WHERE n >= 2 AND m >= 1 AND xm1 > xm
ORDER BY source
"""


# ---------------------------------------------------------------------------
# icc_oneway — one-way random-effects intraclass correlation ICC(1,1)
# ---------------------------------------------------------------------------
# Shrout & Fleiss (Psych Bull 86, 1979) with the unbalanced-groups k0
# of the one-way ANOVA (days = groups, hourly centivalues = ratings):
# ICC = (MSB - MSW) / (MSB + (k0 - 1) MSW), k0 = (N - sum n_j^2 / N)
# / (k - 1).  v is the house exact-integer centivalue, so N, S, sum
# v^2, per-day S_j and n_j are exact BIGINT; the only order-sensitive
# division S_j^2/n_j is e6-floored per day before summing (bounded
# number of days).  One groupBy cascade, no window, no join.


def q_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _hourly

    h = _hourly(spark, sf_dir).select(
        "user_id",
        F.floor(F.col("t") / 86_400).cast("long").alias("day"),
        F.col("v").cast("long").alias("v"),
    )
    per_day = h.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("nj"),
        F.sum("v").alias("sj"),
        F.sum(F.col("v") * F.col("v")).alias("sjj"),
    )
    rat = (F.col("sj") * F.col("sj")).cast("double") / F.col("nj").cast(
        "double"
    )
    per_day = per_day.withColumn(
        "r6", F.floor(rat * 1e6 + F.lit(_OFF)).cast("long")
    )
    agg = per_day.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("nj").alias("nn"),
        F.sum("sj").alias("s"),
        F.sum("sjj").alias("svv"),
        F.sum("r6").alias("sr6"),
        F.sum(F.col("nj") * F.col("nj")).alias("snn2"),
    )
    nd = F.col("nn").cast("double")
    kd = F.col("k").cast("double")
    grp = F.col("sr6").cast("double") / 1e6
    ssb = grp - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ssw = F.col("svv").cast("double") - grp
    msb = ssb / (kd - 1.0)
    msw = ssw / (nd - kd)
    k0 = (nd - F.col("snn2").cast("double") / nd) / (kd - 1.0)
    icc = (msb - msw) / (msb + (k0 - 1.0) * msw)
    return (
        agg.filter((F.col("k") >= 2) & (F.col("nn") > F.col("k")))
        .filter(ssw > 0)
        .select(
            "user_id",
            F.col("k").cast("long").alias("n_days"),
            F.col("nn").cast("long").alias("n_hours"),
            F.floor(k0 * 10_000 + F.lit(_OFF)).cast("long").alias("k0_e4"),
            F.floor(icc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "icc_e6"
            ),
        )
        .orderBy("user_id")
    )


SQL_ICC = f"""
WITH {_HOURLY_SQL},
hv AS (
  SELECT user_id, CAST(floor(t / 86400.0) AS BIGINT) AS day,
         CAST(v AS BIGINT) AS v
  FROM hourly
), per_day AS (
  SELECT user_id, day, CAST(count(*) AS BIGINT) AS nj,
         CAST(sum(v) AS BIGINT) AS sj,
         CAST(sum(v * v) AS BIGINT) AS sjj
  FROM hv GROUP BY 1, 2
), r AS (
  SELECT user_id, nj, sj, sjj,
         CAST(floor(CAST(sj * sj AS DOUBLE) / nj * 1e6 + {_OFF})
              AS BIGINT) AS r6
  FROM per_day
), agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(nj) AS BIGINT) AS nn,
         CAST(sum(sj) AS BIGINT) AS s,
         CAST(sum(sjj) AS BIGINT) AS svv,
         CAST(sum(r6) AS BIGINT) AS sr6,
         CAST(sum(nj * nj) AS BIGINT) AS snn2
  FROM r GROUP BY 1
)
SELECT user_id, k AS n_days, nn AS n_hours,
       CAST(floor((CAST(nn AS DOUBLE) - CAST(snn2 AS DOUBLE) / nn)
                  / (CAST(k AS DOUBLE) - 1.0) * 10000 + {_OFF})
            AS BIGINT) AS k0_e4,
       CAST(floor(((CAST(sr6 AS DOUBLE) / 1e6
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nn)
                   / (CAST(k AS DOUBLE) - 1.0)
                   - (CAST(svv AS DOUBLE) - CAST(sr6 AS DOUBLE) / 1e6)
                     / (CAST(nn AS DOUBLE) - k))
                  / ((CAST(sr6 AS DOUBLE) / 1e6
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / nn)
                     / (CAST(k AS DOUBLE) - 1.0)
                     + ((CAST(nn AS DOUBLE) - CAST(snn2 AS DOUBLE) / nn)
                        / (CAST(k AS DOUBLE) - 1.0) - 1.0)
                       * (CAST(svv AS DOUBLE) - CAST(sr6 AS DOUBLE) / 1e6)
                       / (CAST(nn AS DOUBLE) - k))
                  * 1000000 + {_OFF}) AS BIGINT) AS icc_e6
FROM agg
WHERE k >= 2 AND nn > k
  AND CAST(svv AS DOUBLE) - CAST(sr6 AS DOUBLE) / 1e6 > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# adf_test — augmented Dickey-Fuller unit-root test, lag 1, per user
# ---------------------------------------------------------------------------
# Dickey & Fuller (JASA 74, 1979): regress dy_t on [1, y_{t-1},
# dy_{t-1}] and report the t-statistic of the y_{t-1} coefficient
# (compared against the DF distribution, not Student t — reported as
# a statistic, the house posture for test batteries).  Series = hourly
# exact-integer centivalues, row-adjacent lags (documented).  ALL nine
# cross-moment sums are exact BIGINT; the 3x3 Cramer solve, RSS and
# t-stat are fixed-order double chains off those integers (and sqrt is
# IEEE-correctly-rounded), so both engines are bit-identical with no
# scaled refloors needed anywhere.


def q_adf_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _hourly

    h = _hourly(spark, sf_dir).select(
        "user_id", "t", F.col("v").cast("long").alias("v")
    )
    wo = Window.partitionBy("user_id").orderBy("t")
    r = (
        h.withColumn("y1", F.lag("v", 1).over(wo))
        .withColumn("y2", F.lag("v", 2).over(wo))
        .filter(F.col("y2").isNotNull())
        .select(
            "user_id",
            (F.col("v") - F.col("y1")).alias("d"),
            F.col("y1").alias("y1"),
            (F.col("y1") - F.col("y2")).alias("d1"),
        )
    )
    agg = r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y1").alias("sy1"),
        F.sum("d1").alias("sd1"),
        F.sum("d").alias("sd"),
        F.sum(F.col("y1") * F.col("y1")).alias("syy"),
        F.sum(F.col("d1") * F.col("d1")).alias("sdd1"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("y1") * F.col("d1")).alias("sy1d1"),
        F.sum(F.col("y1") * F.col("d")).alias("sy1d"),
        F.sum(F.col("d1") * F.col("d")).alias("sd1d"),
    )
    n = F.col("n").cast("double")
    sy1 = F.col("sy1").cast("double")
    sd1 = F.col("sd1").cast("double")
    sd = F.col("sd").cast("double")
    syy = F.col("syy").cast("double")
    sdd1 = F.col("sdd1").cast("double")
    sdd = F.col("sdd").cast("double")
    sy1d1 = F.col("sy1d1").cast("double")
    sy1d = F.col("sy1d").cast("double")
    sd1d = F.col("sd1d").cast("double")
    det = (
        n * (syy * sdd1 - sy1d1 * sy1d1)
        - sy1 * (sy1 * sdd1 - sy1d1 * sd1)
        + sd1 * (sy1 * sy1d1 - syy * sd1)
    )
    det_a = (
        sd * (syy * sdd1 - sy1d1 * sy1d1)
        - sy1 * (sy1d * sdd1 - sy1d1 * sd1d)
        + sd1 * (sy1d * sy1d1 - syy * sd1d)
    )
    det_b = (
        n * (sy1d * sdd1 - sy1d1 * sd1d)
        - sd * (sy1 * sdd1 - sy1d1 * sd1)
        + sd1 * (sy1 * sd1d - sy1d * sd1)
    )
    det_g = (
        n * (syy * sd1d - sy1d * sy1d1)
        - sy1 * (sy1 * sd1d - sy1d * sd1)
        + sd * (sy1 * sy1d1 - syy * sd1)
    )
    alpha = det_a / det
    beta = det_b / det
    gamma = det_g / det
    rss = sdd - (alpha * sd + beta * sy1d + gamma * sd1d)
    c22 = (n * sdd1 - sd1 * sd1) / det
    tstat = beta / F.sqrt(rss / (n - 3.0) * c22)
    return (
        agg.filter((F.col("n") >= 12) & (det > 0) & (rss > 0) & (c22 > 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_obs"),
            F.floor(beta * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "beta_e6"
            ),
            F.floor(tstat * 10_000 + F.lit(_OFF)).cast("long").alias(
                "tstat_e4"
            ),
        )
        .orderBy("user_id")
    )


SQL_ADF = f"""
WITH {{_HOURLY}},
hv AS (
  SELECT user_id, t, CAST(v AS BIGINT) AS v FROM hourly
), lagged AS (
  SELECT user_id,
         v - lag(v, 1) OVER (PARTITION BY user_id ORDER BY t) AS d,
         lag(v, 1) OVER (PARTITION BY user_id ORDER BY t) AS y1,
         lag(v, 1) OVER (PARTITION BY user_id ORDER BY t)
           - lag(v, 2) OVER (PARTITION BY user_id ORDER BY t) AS d1,
         lag(v, 2) OVER (PARTITION BY user_id ORDER BY t) AS y2
  FROM hv
), r AS (
  SELECT user_id, d, y1, d1 FROM lagged WHERE y2 IS NOT NULL
), agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y1) AS BIGINT) AS sy1,
         CAST(sum(d1) AS BIGINT) AS sd1,
         CAST(sum(d) AS BIGINT) AS sd,
         CAST(sum(y1 * y1) AS BIGINT) AS syy,
         CAST(sum(d1 * d1) AS BIGINT) AS sdd1,
         CAST(sum(d * d) AS BIGINT) AS sdd,
         CAST(sum(y1 * d1) AS BIGINT) AS sy1d1,
         CAST(sum(y1 * d) AS BIGINT) AS sy1d,
         CAST(sum(d1 * d) AS BIGINT) AS sd1d
  FROM r GROUP BY 1
), solved AS (
  SELECT user_id, n,
         CAST(n AS DOUBLE) * (CAST(syy AS DOUBLE) * sdd1
                              - CAST(sy1d1 AS DOUBLE) * sy1d1)
           - CAST(sy1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sdd1
                                    - CAST(sy1d1 AS DOUBLE) * sd1)
           + CAST(sd1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sy1d1
                                    - CAST(syy AS DOUBLE) * sd1) AS det,
         CAST(sd AS DOUBLE) * (CAST(syy AS DOUBLE) * sdd1
                               - CAST(sy1d1 AS DOUBLE) * sy1d1)
           - CAST(sy1 AS DOUBLE) * (CAST(sy1d AS DOUBLE) * sdd1
                                    - CAST(sy1d1 AS DOUBLE) * sd1d)
           + CAST(sd1 AS DOUBLE) * (CAST(sy1d AS DOUBLE) * sy1d1
                                    - CAST(syy AS DOUBLE) * sd1d) AS det_a,
         CAST(n AS DOUBLE) * (CAST(sy1d AS DOUBLE) * sdd1
                              - CAST(sy1d1 AS DOUBLE) * sd1d)
           - CAST(sd AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sdd1
                                   - CAST(sy1d1 AS DOUBLE) * sd1)
           + CAST(sd1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sd1d
                                    - CAST(sy1d AS DOUBLE) * sd1) AS det_b,
         CAST(n AS DOUBLE) * (CAST(syy AS DOUBLE) * sd1d
                              - CAST(sy1d AS DOUBLE) * sy1d1)
           - CAST(sy1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sd1d
                                    - CAST(sy1d AS DOUBLE) * sd1)
           + CAST(sd AS DOUBLE) * (CAST(sy1 AS DOUBLE) * sy1d1
                                   - CAST(syy AS DOUBLE) * sd1) AS det_g,
         CAST(sd AS DOUBLE) AS sdf, CAST(sy1d AS DOUBLE) AS sy1df,
         CAST(sd1d AS DOUBLE) AS sd1df, CAST(sdd AS DOUBLE) AS sddf,
         CAST(n * sdd1 - sd1 * sd1 AS DOUBLE) AS c22n
  FROM agg
), fin AS (
  SELECT user_id, n, det, det_b / det AS beta,
         sddf - ((det_a / det) * sdf + (det_b / det) * sy1df
                 + (det_g / det) * sd1df) AS rss,
         c22n / det AS c22
  FROM solved
)
SELECT user_id, n AS n_obs,
       CAST(floor(beta * 1000000 + {{OFF}}) AS BIGINT) AS beta_e6,
       CAST(floor(beta / sqrt(rss / (CAST(n AS DOUBLE) - 3.0) * c22)
                  * 10000 + {{OFF}}) AS BIGINT) AS tstat_e4
FROM fin
WHERE n >= 12 AND det > 0 AND rss > 0 AND c22 > 0
ORDER BY user_id
""".format(_HOURLY=_HOURLY_SQL, OFF=_OFF)


# ---------------------------------------------------------------------------
# dfa_alpha — detrended fluctuation analysis (DFA-1) scaling exponent
# ---------------------------------------------------------------------------
# Peng et al. (Phys Rev E 49, 1994): integrate the mean-subtracted
# hourly count series, split into non-overlapping windows of m rows,
# detrend each by per-window OLS, and fit ln F^2(m) ~ 2 alpha ln m
# over m in {4, 8, 16, 32}.  Exactness: the profile is kept DIVISION-
# FREE as P_i = n*cumsum - i*total (exact BIGINT), then rescaled once
# by the single deterministic division floor(P/n); all per-window OLS
# sums (Sy, Sxy, Syy) are exact BIGINT with closed-form Sx/Sxx, the
# per-window RSS is a fixed-order double chain, e6-floored per window
# before the F^2 mean; ln points e9-floored before the 4-point OLS
# (the variance_time_plot discipline, queries_stats7).  Magnitudes:
# |floor(P/n)| <= total events per key, safe in BIGINT products up to
# ~sf10; rescale the profile coarser for larger corpora (documented).


_DFA_SIZES = (4, 8, 16, 32)


def q_dfa_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000))
        .cast("long")
        .alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("h")
    wall = Window.partitionBy("event_type")
    prof = (
        hourly.withColumn("i", F.row_number().over(wo))
        .withColumn(
            "cum", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("s", F.sum("c").over(wall))
    )
    # division-free exact profile, then ONE deterministic rescale
    p = F.col("cum") * F.col("n") - F.col("i") * F.col("s")
    prof = prof.select(
        "event_type",
        "i",
        F.floor(p.cast("double") / F.col("n").cast("double"))
        .cast("long")
        .alias("y"),
    )
    sized = prof.withColumn(
        "m",
        F.explode(F.array(*[F.lit(m) for m in _DFA_SIZES])),
    ).select(
        "event_type",
        "m",
        ((F.col("i") - 1) / F.col("m")).cast("long").alias("seg"),
        ((F.col("i") - 1) % F.col("m")).alias("x"),
        "y",
    )
    win = sized.groupBy("event_type", "m", "seg").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    md = F.col("m").cast("double")
    sx = md * (md - 1.0) / 2.0
    sxx = (md - 1.0) * md * (2.0 * md - 1.0) / 6.0
    dd = md * sxx - sx * sx
    num = md * F.col("sxy").cast("double") - sx * F.col("sy").cast("double")
    rss = (
        (md * F.col("syy").cast("double")
         - F.col("sy").cast("double") * F.col("sy").cast("double")) * dd
        - num * num
    ) / (md * dd)
    win = win.filter(F.col("cnt") == F.col("m")).select(
        "event_type",
        "m",
        F.floor(rss / md * 1e6 + F.lit(_OFF)).cast("long").alias("r6"),
    )
    per = win.groupBy("event_type", "m").agg(
        F.count(F.lit(1)).alias("nseg"),
        F.sum("r6").alias("sr6"),
    )
    f2 = F.col("sr6").cast("double") / 1e6 / F.col("nseg").cast("double")
    pts = per.filter((F.col("nseg") >= 2) & (F.col("sr6") > 0)).select(
        "event_type",
        F.floor(F.log(F.col("m").cast("double")) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("x9"),
        F.floor(F.log(f2) * 1e9 + F.lit(_OFF)).cast("long").alias("y9"),
    )
    xd = F.col("x9").cast("double") / 1e9
    yd = F.col("y9").cast("double") / 1e9
    pts = pts.withColumn(
        "xy9", F.floor(xd * yd * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn("xx9", F.floor(xd * xd * 1e9 + F.lit(_OFF)).cast("long"))
    agg = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x9").alias("sx9"),
        F.sum("y9").alias("sy9"),
        F.sum("xy9").alias("sxy9"),
        F.sum("xx9").alias("sxx9"),
    )
    n2 = F.col("np").cast("double")
    sxp = F.col("sx9").cast("double") / 1e9
    syp = F.col("sy9").cast("double") / 1e9
    sxyp = F.col("sxy9").cast("double") / 1e9
    sxxp = F.col("sxx9").cast("double") / 1e9
    slope = (n2 * sxyp - sxp * syp) / (n2 * sxxp - sxp * sxp)
    return (
        agg.filter((F.col("np") >= 3) & ((n2 * sxxp - sxp * sxp) > 0))
        .select(
            "event_type",
            F.col("np").cast("long").alias("n_sizes"),
            F.floor(slope / 2.0 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "alpha_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_DFA = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), prof0 AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY h) AS BIGINT)
           AS cum,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS s
  FROM hourly
), prof AS (
  SELECT event_type, i,
         CAST(floor(CAST(cum * n - i * s AS DOUBLE) / n) AS BIGINT) AS y
  FROM prof0
), sized AS (
  SELECT p.event_type, p.i, p.y, sz.m,
         CAST((p.i - 1) // sz.m AS BIGINT) AS seg,
         CAST((p.i - 1) % sz.m AS BIGINT) AS x
  FROM prof p CROSS JOIN (VALUES (4), (8), (16), (32)) AS sz(m)
), win AS (
  SELECT event_type, m, seg,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM sized GROUP BY 1, 2, 3
), rs AS (
  SELECT event_type, m,
         CAST(floor(((CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                     * (CAST(m AS DOUBLE)
                        * ((m - 1.0) * m * (2.0 * m - 1.0) / 6.0)
                        - (m * (m - 1.0) / 2.0) * (m * (m - 1.0) / 2.0))
                     - (CAST(m AS DOUBLE) * sxy
                        - (m * (m - 1.0) / 2.0) * CAST(sy AS DOUBLE))
                       * (CAST(m AS DOUBLE) * sxy
                          - (m * (m - 1.0) / 2.0) * CAST(sy AS DOUBLE)))
                    / (CAST(m AS DOUBLE)
                       * (CAST(m AS DOUBLE)
                          * ((m - 1.0) * m * (2.0 * m - 1.0) / 6.0)
                          - (m * (m - 1.0) / 2.0) * (m * (m - 1.0) / 2.0)))
                    / CAST(m AS DOUBLE) * 1e6 + {OFF}) AS BIGINT) AS r6
  FROM win WHERE cnt = m
), per AS (
  SELECT event_type, m, CAST(count(*) AS BIGINT) AS nseg,
         CAST(sum(r6) AS BIGINT) AS sr6
  FROM rs GROUP BY 1, 2
), pts0 AS (
  SELECT event_type,
         CAST(floor(ln(CAST(m AS DOUBLE)) * 1e9 + {OFF}) AS BIGINT) AS x9,
         CAST(floor(ln(CAST(sr6 AS DOUBLE) / 1e6 / nseg) * 1e9 + {OFF})
              AS BIGINT) AS y9
  FROM per WHERE nseg >= 2 AND sr6 > 0
), pts AS (
  SELECT event_type, x9, y9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9) * (CAST(y9 AS DOUBLE) / 1e9)
                    * 1e9 + {OFF}) AS BIGINT) AS xy9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9) * (CAST(x9 AS DOUBLE) / 1e9)
                    * 1e9 + {OFF}) AS BIGINT) AS xx9
  FROM pts0
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS np,
         CAST(sum(x9) AS BIGINT) AS sx9, CAST(sum(y9) AS BIGINT) AS sy9,
         CAST(sum(xy9) AS BIGINT) AS sxy9, CAST(sum(xx9) AS BIGINT) AS sxx9
  FROM pts GROUP BY 1
)
SELECT event_type, np AS n_sizes,
       CAST(floor((CAST(np AS DOUBLE) * (CAST(sxy9 AS DOUBLE) / 1e9)
                   - (CAST(sx9 AS DOUBLE) / 1e9) * (CAST(sy9 AS DOUBLE) / 1e9))
                  / (CAST(np AS DOUBLE) * (CAST(sxx9 AS DOUBLE) / 1e9)
                     - (CAST(sx9 AS DOUBLE) / 1e9)
                       * (CAST(sx9 AS DOUBLE) / 1e9))
                  / 2.0 * 10000 + {OFF}) AS BIGINT) AS alpha_e4
FROM agg
WHERE np >= 3
  AND CAST(np AS DOUBLE) * (CAST(sxx9 AS DOUBLE) / 1e9)
      - (CAST(sx9 AS DOUBLE) / 1e9) * (CAST(sx9 AS DOUBLE) / 1e9) > 0
ORDER BY event_type
""".format(OFF=_OFF)



# ---------------------------------------------------------------------------
# gwet_ac1 — Gwet's AC1 chance-corrected agreement per language
# ---------------------------------------------------------------------------
# Gwet (Br J Math Stat Psychol 61, 2008): AC1 = (po - pe)/(1 - pe) with
# pe = 2 pi (1 - pi), pi = (pa + pb)/2 — robust to the kappa paradox
# under prevalence skew.  Same two in-engine binary labelers as
# cohens_kappa / mcnemar_labelers (doc length / TTR above the exact
# per-language lower medians, queries_stats5._kappa_labels); every
# input is an exact integer and the statistic is one fixed-order
# rational chain.


def q_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats5 import _kappa_labels

    lab = _kappa_labels(spark, sf_dir)
    agg = lab.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("a") == F.col("b")).cast("long")).alias("n_agree"),
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
    )
    nd = F.col("n").cast("double")
    po = F.col("n_agree").cast("double") / nd
    pi = (F.col("na") + F.col("nb")).cast("double") / (2.0 * nd)
    pe = 2.0 * pi * (1.0 - pi)
    ac1 = (po - pe) / (1.0 - pe)
    return (
        agg.filter((F.col("n") >= 4) & (pe < 1.0))
        .select(
            "lang",
            F.col("n").cast("long").alias("n"),
            F.floor(po * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "po_e6"
            ),
            F.floor(pe * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "pe_e6"
            ),
            F.floor(ac1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "ac1_e6"
            ),
        )
        .orderBy("lang")
    )


from diive_spark.queries_stats5 import _SQL_LABELS  # noqa: E402

SQL_GWET = (
    _SQL_LABELS
    + f""", agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         CAST(sum(a) AS BIGINT) AS na,
         CAST(sum(b) AS BIGINT) AS nb
  FROM lab GROUP BY 1
)
SELECT lang, n,
       CAST(floor(CAST(n_agree AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS po_e6,
       CAST(floor(2.0 * (CAST(na + nb AS DOUBLE) / (2.0 * n))
                      * (1.0 - CAST(na + nb AS DOUBLE) / (2.0 * n))
                  * 1000000 + {_OFF}) AS BIGINT) AS pe_e6,
       CAST(floor((CAST(n_agree AS DOUBLE) / n
                   - 2.0 * (CAST(na + nb AS DOUBLE) / (2.0 * n))
                         * (1.0 - CAST(na + nb AS DOUBLE) / (2.0 * n)))
                  / (1.0 - 2.0 * (CAST(na + nb AS DOUBLE) / (2.0 * n))
                               * (1.0 - CAST(na + nb AS DOUBLE) / (2.0 * n)))
                  * 1000000 + {_OFF}) AS BIGINT) AS ac1_e6
FROM agg
WHERE n >= 4
  AND 2.0 * (CAST(na + nb AS DOUBLE) / (2.0 * n))
        * (1.0 - CAST(na + nb AS DOUBLE) / (2.0 * n)) < 1.0
ORDER BY lang
"""
)


# ---------------------------------------------------------------------------
# pacf_profile — partial autocorrelation at lags 1-3 (Durbin-Levinson)
# ---------------------------------------------------------------------------
# Box & Jenkins (1970) via the Durbin-Levinson recursion on the biased
# ACF estimates r1..r3 (row-adjacent hourly centivalues, the house lag
# convention): phi11 = r1, phi22 = (r2 - r1^2)/(1 - r1^2), phi33 from
# the order-2 prediction coefficients.  The three lag cross-products
# and truncated-edge sums are exact BIGINTs off ONE window with three
# leads; every downstream step is a fixed-order double chain, so both
# engines are bit-identical with no refloors (the adf_test posture).


def q_pacf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _hourly

    h = _hourly(spark, sf_dir).select(
        "user_id", "t", F.col("v").cast("long").alias("v")
    )
    wo = Window.partitionBy("user_id").orderBy("t")
    r = (
        h.withColumn("v1", F.lead("v", 1).over(wo))
        .withColumn("v2", F.lead("v", 2).over(wo))
        .withColumn("v3", F.lead("v", 3).over(wo))
    )
    agg = r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum(F.col("v") * F.col("v1")).alias("p1"),
        F.sum(F.col("v") * F.col("v2")).alias("p2"),
        F.sum(F.col("v") * F.col("v3")).alias("p3"),
        F.sum(F.when(F.col("v1").isNotNull(), F.col("v"))).alias("a1"),
        F.sum(F.when(F.col("v2").isNotNull(), F.col("v"))).alias("a2"),
        F.sum(F.when(F.col("v3").isNotNull(), F.col("v"))).alias("a3"),
        F.sum("v1").alias("b1"),
        F.sum("v2").alias("b2"),
        F.sum("v3").alias("b3"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s").cast("double") / nd
    c0 = (F.col("svv").cast("double") - nd * mu * mu) / nd

    def ck(p, a, b, k):
        return (
            F.col(p).cast("double")
            - mu * (F.col(a) + F.col(b)).cast("double")
            + (nd - float(k)) * mu * mu
        ) / nd

    r1 = ck("p1", "a1", "b1", 1) / c0
    r2 = ck("p2", "a2", "b2", 2) / c0
    r3 = ck("p3", "a3", "b3", 3) / c0
    phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    phi21 = r1 * (1.0 - phi22)
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1.0 - phi21 * r1 - phi22 * r2)
    return (
        agg.filter((F.col("n") >= 10) & (c0 > 0))
        .filter((1.0 - r1 * r1) != 0.0)
        .filter((1.0 - phi21 * r1 - phi22 * r2) != 0.0)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_obs"),
            F.floor(r1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "pacf1_e6"
            ),
            F.floor(phi22 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "pacf2_e6"
            ),
            F.floor(phi33 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "pacf3_e6"
            ),
        )
        .orderBy("user_id")
    )


SQL_PACF = """
WITH {_HOURLY},
hv AS (
  SELECT user_id, t, CAST(v AS BIGINT) AS v FROM hourly
), led AS (
  SELECT user_id, v,
         lead(v, 1) OVER (PARTITION BY user_id ORDER BY t) AS v1,
         lead(v, 2) OVER (PARTITION BY user_id ORDER BY t) AS v2,
         lead(v, 3) OVER (PARTITION BY user_id ORDER BY t) AS v3
  FROM hv
), agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(v * v1) AS BIGINT) AS p1,
         CAST(sum(v * v2) AS BIGINT) AS p2,
         CAST(sum(v * v3) AS BIGINT) AS p3,
         CAST(sum(CASE WHEN v1 IS NOT NULL THEN v END) AS BIGINT) AS a1,
         CAST(sum(CASE WHEN v2 IS NOT NULL THEN v END) AS BIGINT) AS a2,
         CAST(sum(CASE WHEN v3 IS NOT NULL THEN v END) AS BIGINT) AS a3,
         CAST(sum(v1) AS BIGINT) AS b1,
         CAST(sum(v2) AS BIGINT) AS b2,
         CAST(sum(v3) AS BIGINT) AS b3
  FROM led GROUP BY 1
), acf AS (
  SELECT user_id, n,
         (CAST(svv AS DOUBLE)
          - n * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
           / CAST(n AS DOUBLE) AS c0,
         (CAST(p1 AS DOUBLE)
          - (CAST(s AS DOUBLE) / n) * CAST(a1 + b1 AS DOUBLE)
          + (CAST(n AS DOUBLE) - 1.0) * (CAST(s AS DOUBLE) / n)
            * (CAST(s AS DOUBLE) / n)) / CAST(n AS DOUBLE) AS c1,
         (CAST(p2 AS DOUBLE)
          - (CAST(s AS DOUBLE) / n) * CAST(a2 + b2 AS DOUBLE)
          + (CAST(n AS DOUBLE) - 2.0) * (CAST(s AS DOUBLE) / n)
            * (CAST(s AS DOUBLE) / n)) / CAST(n AS DOUBLE) AS c2,
         (CAST(p3 AS DOUBLE)
          - (CAST(s AS DOUBLE) / n) * CAST(a3 + b3 AS DOUBLE)
          + (CAST(n AS DOUBLE) - 3.0) * (CAST(s AS DOUBLE) / n)
            * (CAST(s AS DOUBLE) / n)) / CAST(n AS DOUBLE) AS c3
  FROM agg
), rr AS (
  SELECT user_id, n, c0, c1 / c0 AS r1, c2 / c0 AS r2, c3 / c0 AS r3
  FROM acf WHERE n >= 10 AND c0 > 0
), dl AS (
  SELECT user_id, n, r1, r2, r3,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22,
         r1 * (1.0 - (r2 - r1 * r1) / (1.0 - r1 * r1)) AS phi21
  FROM rr WHERE 1.0 - r1 * r1 <> 0.0
)
SELECT user_id, n AS n_obs,
       CAST(floor(r1 * 1000000 + {OFF}) AS BIGINT) AS pacf1_e6,
       CAST(floor(phi22 * 1000000 + {OFF}) AS BIGINT) AS pacf2_e6,
       CAST(floor((r3 - phi21 * r2 - phi22 * r1)
                  / (1.0 - phi21 * r1 - phi22 * r2) * 1000000 + {OFF})
            AS BIGINT) AS pacf3_e6
FROM dl
WHERE 1.0 - phi21 * r1 - phi22 * r2 <> 0.0
ORDER BY user_id
""".format(_HOURLY=_HOURLY_SQL, OFF=_OFF)



# ---------------------------------------------------------------------------
# hotelling_t2 — Hotelling T^2 multivariate control chart over daily 2-D
# ---------------------------------------------------------------------------
# Hotelling (Techniques of Statistical Analysis, 1947): per user, each
# day is the 2-vector (hours active, sum of hourly centivalues); T^2_d
# = z' S^-1 z against the per-user sample covariance, alarms at the
# chi2(2, .999) = 13.8155 line.  All five moment sums are exact
# BIGINTs; the closed-form 2x2 inverse and per-day T^2 are fixed-order
# double chains (bit-identical, the adf_test posture), so the alarm
# count and e4-floored max are engine-exact.


def q_hotelling_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _hourly

    h = _hourly(spark, sf_dir).select(
        "user_id",
        F.floor(F.col("t") / 86_400).cast("long").alias("day"),
        F.col("v").cast("long").alias("v"),
    )
    daily = h.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("x1"), F.sum("v").alias("x2")
    )
    mom = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
    )
    j = daily.join(mom, "user_id")
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd
    c11 = (F.col("s11").cast("double") - nd * m1 * m1) / (nd - 1.0)
    c22 = (F.col("s22").cast("double") - nd * m2 * m2) / (nd - 1.0)
    c12 = (F.col("s12").cast("double") - nd * m1 * m2) / (nd - 1.0)
    det = c11 * c22 - c12 * c12
    z1 = F.col("x1").cast("double") - m1
    z2 = F.col("x2").cast("double") - m2
    t2 = (c22 * z1 * z1 - 2.0 * c12 * z1 * z2 + c11 * z2 * z2) / det
    per = j.filter((F.col("n") >= 5) & (det > 0)).select(
        "user_id",
        F.col("n").alias("n"),
        F.floor(t2 * 10_000 + F.lit(_OFF)).cast("long").alias("t2_e4"),
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.sum((F.col("t2_e4") > 138_155).cast("long")).alias("n_alarm"),
            F.max("t2_e4").alias("max_t2_e4"),
        )
        .orderBy("user_id")
    )


SQL_HOTELLING = """
WITH {_HOURLY},
hv AS (
  SELECT user_id, CAST(floor(t / 86400.0) AS BIGINT) AS day,
         CAST(v AS BIGINT) AS v
  FROM hourly
), daily AS (
  SELECT user_id, day, CAST(count(*) AS BIGINT) AS x1,
         CAST(sum(v) AS BIGINT) AS x2
  FROM hv GROUP BY 1, 2
), mom AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(x1 * x2) AS BIGINT) AS s12
  FROM daily GROUP BY 1
), cov AS (
  SELECT user_id, n,
         CAST(s1 AS DOUBLE) / n AS m1, CAST(s2 AS DOUBLE) / n AS m2,
         (CAST(s11 AS DOUBLE)
          - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
           / (CAST(n AS DOUBLE) - 1.0) AS c11,
         (CAST(s22 AS DOUBLE)
          - n * (CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n))
           / (CAST(n AS DOUBLE) - 1.0) AS c22,
         (CAST(s12 AS DOUBLE)
          - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n))
           / (CAST(n AS DOUBLE) - 1.0) AS c12
  FROM mom
), per AS (
  SELECT d.user_id, cov.n,
         CAST(floor((cov.c22 * (CAST(d.x1 AS DOUBLE) - cov.m1)
                              * (CAST(d.x1 AS DOUBLE) - cov.m1)
                     - 2.0 * cov.c12 * (CAST(d.x1 AS DOUBLE) - cov.m1)
                                     * (CAST(d.x2 AS DOUBLE) - cov.m2)
                     + cov.c11 * (CAST(d.x2 AS DOUBLE) - cov.m2)
                               * (CAST(d.x2 AS DOUBLE) - cov.m2))
                    / (cov.c11 * cov.c22 - cov.c12 * cov.c12)
                    * 10000 + {OFF}) AS BIGINT) AS t2_e4
  FROM daily d JOIN cov ON cov.user_id = d.user_id
  WHERE cov.n >= 5 AND cov.c11 * cov.c22 - cov.c12 * cov.c12 > 0
)
SELECT user_id, CAST(max(n) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN t2_e4 > 138155 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarm,
       CAST(max(t2_e4) AS BIGINT) AS max_t2_e4
FROM per
GROUP BY 1
ORDER BY user_id
""".format(_HOURLY=_HOURLY_SQL, OFF=_OFF)


# ---------------------------------------------------------------------------
# trend_ols_hc0 — OLS hourly trend with White-robust (HC0) t-statistic
# ---------------------------------------------------------------------------
# White (Econometrica 48, 1980): se_HC0^2 = sum(xt^2 e^2) / (sum
# xt^2)^2 vs the classic homoskedastic se; reported side by side so
# the ratio exposes heteroskedastic keys.  x = per-user row index
# (row_number, the house row-adjacency convention); all OLS moment
# sums are exact BIGINT, b/a are exact-rational fixed-order doubles,
# and the ONLY order-sensitive reduction — the per-row xt^2 e^2 sum —
# is unit-floored per row first (magnitude ~1e14, double noise ~1e-2,
# far below the floor).


def q_trend_ols_hc0(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _hourly

    h = _hourly(spark, sf_dir).select(
        "user_id", "t", F.col("v").cast("long").alias("y")
    )
    wo = Window.partitionBy("user_id").orderBy("t")
    r = h.withColumn("x", F.row_number().over(wo).cast("long"))
    mom = r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    j = r.join(mom, "user_id")
    nd = F.col("n").cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    b = num / den
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / nd
    xt = F.col("x").cast("double") - F.col("sx").cast("double") / nd
    e = F.col("y").cast("double") - a - b * F.col("x").cast("double")
    per = j.filter((F.col("n") >= 10) & (den > 0)).select(
        "user_id",
        F.floor(xt * xt * e * e + F.lit(_OFF)).cast("long").alias("q0"),
    )
    agg = per.groupBy("user_id").agg(F.sum("q0").alias("sq")).join(
        mom, "user_id"
    )
    den2 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    num2 = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    nd2 = F.col("n").cast("double")
    b2 = num2 / den2
    a2 = (F.col("sy").cast("double") - b2 * F.col("sx").cast("double")) / nd2
    rss = (
        F.col("syy").cast("double")
        - a2 * F.col("sy").cast("double")
        - b2 * F.col("sxy").cast("double")
    )
    sxt2 = den2 / nd2
    se_cl = F.sqrt(rss / (nd2 - 2.0) / sxt2)
    se_h = F.sqrt(F.col("sq").cast("double") / (sxt2 * sxt2))
    return (
        agg.filter((rss > 0) & (F.col("sq") > 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_obs"),
            F.floor(b2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "slope_e6"
            ),
            F.floor(b2 / se_cl * 10_000 + F.lit(_OFF)).cast("long").alias(
                "t_classic_e4"
            ),
            F.floor(b2 / se_h * 10_000 + F.lit(_OFF)).cast("long").alias(
                "t_hc0_e4"
            ),
        )
        .orderBy("user_id")
    )


SQL_TREND_HC0 = """
WITH {_HOURLY},
r AS (
  SELECT user_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY t)
              AS BIGINT) AS x,
         CAST(v AS BIGINT) AS y
  FROM hourly
), mom AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM r GROUP BY 1
), per AS (
  SELECT r.user_id,
         CAST(floor((CAST(r.x AS DOUBLE) - CAST(m.sx AS DOUBLE) / m.n)
                    * (CAST(r.x AS DOUBLE) - CAST(m.sx AS DOUBLE) / m.n)
                    * (CAST(r.y AS DOUBLE)
                       - (CAST(m.sy AS DOUBLE)
                          - CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                            / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
                            * CAST(m.sx AS DOUBLE)) / m.n
                       - CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                         / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
                         * CAST(r.x AS DOUBLE))
                    * (CAST(r.y AS DOUBLE)
                       - (CAST(m.sy AS DOUBLE)
                          - CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                            / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
                            * CAST(m.sx AS DOUBLE)) / m.n
                       - CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                         / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
                         * CAST(r.x AS DOUBLE))
                    + {OFF}) AS BIGINT) AS q0
  FROM r JOIN mom m ON m.user_id = r.user_id
  WHERE m.n >= 10 AND m.n * m.sxx - m.sx * m.sx > 0
), agg AS (
  SELECT p.user_id, CAST(sum(p.q0) AS BIGINT) AS sq
  FROM per p GROUP BY 1
), fin AS (
  SELECT m.user_id, m.n, a.sq,
         CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
           / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE) AS b,
         (CAST(m.sy AS DOUBLE)
          - CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
            / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
            * CAST(m.sx AS DOUBLE)) / m.n AS a2,
         CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
           / CAST(m.n AS DOUBLE) AS sxt2,
         CAST(m.syy AS DOUBLE) AS syyf, CAST(m.sy AS DOUBLE) AS syf,
         CAST(m.sxy AS DOUBLE) AS sxyf
  FROM mom m JOIN agg a ON a.user_id = m.user_id
)
SELECT user_id, n AS n_obs,
       CAST(floor(b * 1000000 + {OFF}) AS BIGINT) AS slope_e6,
       CAST(floor(b / sqrt((syyf - a2 * syf - b * sxyf)
                           / (CAST(n AS DOUBLE) - 2.0) / sxt2)
                  * 10000 + {OFF}) AS BIGINT) AS t_classic_e4,
       CAST(floor(b / sqrt(CAST(sq AS DOUBLE) / (sxt2 * sxt2))
                  * 10000 + {OFF}) AS BIGINT) AS t_hc0_e4
FROM fin
WHERE syyf - a2 * syf - b * sxyf > 0 AND sq > 0
ORDER BY user_id
""".format(_HOURLY=_HOURLY_SQL, OFF=_OFF)



# ---------------------------------------------------------------------------
# char_bigram_entropy — conditional character entropy H(c2|c1) per lang
# ---------------------------------------------------------------------------
# Shannon (BSTJ 30, 1951, "Prediction and entropy of printed English"):
# H(c2|c1) = H(bigram) - H(first char), both estimated from the
# character-bigram table.  Bigrams use the rankprofile construction —
# transform(sequence(1, greatest(len-1, 0)), i -> substring(text, i, 2))
# with the length-2 filter guarding Spark's DESCENDING sequence(1, 0)
# (text/rankprofile.py) — identical in both engines; the prefix
# marginal is the bigram table re-grouped by its first character, so
# the two entropies share one count table.  Each p ln(1/p) term is
# e9-floored before summing (order-free).


def q_char_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    # trim hoisted out of the lambda (round-5 profile; O(len^2) -> O(len))
    bg = d.select("lang", F.expr("trim(text)").alias("_t")).select(
        "lang",
        F.explode(
            F.expr(
                "filter(transform(sequence(1, greatest(length(_t) - 1, 0)),"
                " i -> substring(_t, i, 2)), x -> length(x) = 2)"
            )
        ).alias("bg"),
    )
    cnt = bg.groupBy("lang", "bg").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("t"))
    j = cnt.join(F.broadcast(tot), "lang")
    term = (
        F.col("c").cast("double")
        / F.col("t").cast("double")
        * F.log(F.col("t").cast("double") / F.col("c").cast("double"))
    )
    h12 = (
        j.select(
            "lang",
            F.floor(term * 1e9 + F.lit(_OFF)).cast("long").alias("e9"),
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("e9").alias("s12"))
    )
    pre = cnt.groupBy("lang", F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("c").alias("c")
    )
    jp = pre.join(F.broadcast(tot), "lang")
    term1 = (
        F.col("c").cast("double")
        / F.col("t").cast("double")
        * F.log(F.col("t").cast("double") / F.col("c").cast("double"))
    )
    h1 = (
        jp.select(
            "lang",
            F.floor(term1 * 1e9 + F.lit(_OFF)).cast("long").alias("e9"),
        )
        .groupBy("lang")
        .agg(F.sum("e9").alias("s1"))
    )
    out = h12.join(h1, "lang")
    return out.select(
        "lang",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.floor(F.col("s12").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("h12_e6"),
        F.floor(F.col("s1").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("h1_e6"),
        F.floor(
            (F.col("s12") - F.col("s1")).cast("double") / 1e9 * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("hcond_e6"),
    ).orderBy("lang")


SQL_CHAR_BIGRAM = f"""
WITH bg AS (
  SELECT lang, unnest(list_filter(list_transform(
           generate_series(1, greatest(len(trim(text)) - 1, 0)),
           i -> substr(trim(text), i, 2)), x -> len(x) = 2)) AS bg
  FROM documents
), cnt AS (
  SELECT lang, bg, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
), tot AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1
), h12 AS (
  SELECT cnt.lang, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(CAST(floor(CAST(cnt.c AS DOUBLE) / tot.t
                             * ln(CAST(tot.t AS DOUBLE) / cnt.c)
                             * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT) AS s12
  FROM cnt JOIN tot ON tot.lang = cnt.lang
  GROUP BY 1
), pre AS (
  SELECT lang, substr(bg, 1, 1) AS c1, CAST(sum(c) AS BIGINT) AS c
  FROM cnt GROUP BY 1, 2
), h1 AS (
  SELECT pre.lang,
         CAST(sum(CAST(floor(CAST(pre.c AS DOUBLE) / tot.t
                             * ln(CAST(tot.t AS DOUBLE) / pre.c)
                             * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT) AS s1
  FROM pre JOIN tot ON tot.lang = pre.lang
  GROUP BY 1
)
SELECT h12.lang, h12.n_bigrams,
       CAST(floor(CAST(s12 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS h12_e6,
       CAST(floor(CAST(s1 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS h1_e6,
       CAST(floor(CAST(s12 - s1 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS hcond_e6
FROM h12 JOIN h1 ON h1.lang = h12.lang
ORDER BY h12.lang
"""


# ---------------------------------------------------------------------------
# silhouette_centroid — simplified (centroid) silhouette per label
# ---------------------------------------------------------------------------
# Rousseeuw (J Comput Appl Math 20, 1987), the centroid-based
# "simplified silhouette" variant used at scale (one pass, k
# centroids, never point-pairs): s_i = (b_i - a_i)/max(a_i, b_i) with
# a = squared distance to own centroid, b = min over other centroids.
# Centroids come from e6-floored components (exact BIGINT sums, one
# deterministic division); point-to-centroid distances ride the Arrow
# einsum kernel vs DuckDB list arithmetic and are rounded to 6 dp
# BEFORE the min/compare (the twonn/ann tie discipline — the engines'
# sum-order drift is ~1e-12 of O(1) values); per-point s e6-floored
# before the label mean.


def q_silhouette_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.similarity import l2sq_pair_udf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    comp = emb.select(
        "label",
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "label",
        "d",
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("x6"),
    )
    cmom = comp.groupBy("label", "d").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x6").alias("s6")
    )
    cent = cmom.groupBy("label").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("d"), F.col("s6"), F.col("n")))
            ),
            lambda s: s["s6"].cast("double")
            / (s["n"].cast("double") * 1e6),
        ).alias("carr")
    )
    pairs = emb.crossJoin(
        F.broadcast(
            cent.select(F.col("label").alias("label_c"), "carr")
        )
    ).select(
        "vec_id",
        "label",
        "label_c",
        F.round(l2sq_pair_udf(F.col("embedding"), F.col("carr")), 6).alias(
            "d2"
        ),
    )
    per = pairs.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("label") == F.col("label_c"), F.col("d2"))).alias(
            "a"
        ),
        F.min(F.when(F.col("label") != F.col("label_c"), F.col("d2"))).alias(
            "b"
        ),
    )
    s = (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
    per = per.filter(
        F.col("a").isNotNull()
        & F.col("b").isNotNull()
        & (F.greatest(F.col("a"), F.col("b")) > 0)
    ).select(
        "label",
        F.floor(s * 1_000_000 + F.lit(_OFF)).cast("long").alias("s6"),
    )
    agg = per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("s6").alias("ss6")
    )
    mean = F.col("ss6").cast("double") / 1e6 / F.col("n").cast("double")
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").cast("long").alias("n_points"),
        F.floor(mean * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mean_sil_e4"
        ),
    ).orderBy("label")


SQL_SILHOUETTE = f"""
WITH comp0 AS (
  SELECT label,
         unnest(list_transform(generate_series(1, len(embedding)),
           i -> struct_pack(d := i,
                x6 := CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6
                                 + {_OFF}) AS BIGINT)))) AS u
  FROM embeddings
), comp AS (
  SELECT label, u.d AS d, u.x6 AS x6 FROM comp0
), cmom AS (
  SELECT label, d, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x6) AS BIGINT) AS s6
  FROM comp GROUP BY 1, 2
), cent AS (
  SELECT label AS label_c,
         list(CAST(s6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)
              ORDER BY d) AS carr
  FROM cmom GROUP BY 1
), pairs AS (
  SELECT e.vec_id, e.label, c.label_c,
         round(list_sum(list_transform(
           generate_series(1, len(e.embedding)),
           i -> (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])
                * (CAST(e.embedding[i] AS DOUBLE) - c.carr[i]))), 6) AS d2
  FROM embeddings e CROSS JOIN cent c
), per AS (
  SELECT vec_id, label,
         min(CASE WHEN label = label_c THEN d2 END) AS a,
         min(CASE WHEN label <> label_c THEN d2 END) AS b
  FROM pairs GROUP BY 1, 2
), s AS (
  SELECT label,
         CAST(floor((b - a) / greatest(a, b) * 1000000 + {_OFF})
              AS BIGINT) AS s6
  FROM per
  WHERE a IS NOT NULL AND b IS NOT NULL AND greatest(a, b) > 0
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(floor(CAST(sum(s6) AS DOUBLE) / 1e6 / count(*) * 10000 + {_OFF})
            AS BIGINT) AS mean_sil_e4
FROM s
GROUP BY 1
ORDER BY label
"""


# ---------------------------------------------------------------------------
# kendall_w — Kendall's coefficient of concordance over source rankings
# ---------------------------------------------------------------------------
# Kendall & Babington Smith (Ann Math Stat 10, 1939): do the m sources
# agree on the ordering of the n = 20 top corpus words?  Each source
# ranks the dense word grid by (count desc, word asc) — row_number,
# so NO ties and the whole statistic stays exact integer: using
# doubled deviations, S4 = sum_j (2 R_j - m(n+1))^2 and W = 3 S4 /
# (m^2 (n^3 - n)); chi2 = m (n - 1) W.  One global row.


_W_K = 20


def q_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.groupBy("w")
        .agg(F.sum("c").alias("gc"))
        .orderBy(F.desc("gc"), F.asc("w"))
        .limit(_W_K)
        .select("w")
    )
    srcs = cnt.select("source").distinct()
    grid = (
        srcs.crossJoin(F.broadcast(vocab))
        .join(cnt, ["source", "w"], "left")
        .fillna(0, subset=["c"])
    )
    wr = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("w"))
    ranked = grid.withColumn("r", F.row_number().over(wr))
    rj = ranked.groupBy("w").agg(F.sum("r").alias("rj"))
    stats = rj.crossJoin(
        F.broadcast(
            ranked.agg(
                F.countDistinct("source").alias("m"),
                F.countDistinct("w").alias("n"),
            )
        )
    )
    dev = 2 * F.col("rj") - F.col("m") * (F.col("n") + 1)
    agg = stats.agg(
        F.max("m").alias("m"),
        F.max("n").alias("n"),
        F.sum(dev * dev).alias("s4"),
    )
    md = F.col("m").cast("double")
    nd = F.col("n").cast("double")
    w_stat = 3.0 * F.col("s4").cast("double") / (
        md * md * (nd * nd * nd - nd)
    )
    return agg.select(
        F.col("m").cast("long").alias("m_sources"),
        F.col("n").cast("long").alias("n_words"),
        F.col("s4").cast("long").alias("s4"),
        F.floor(w_stat * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "w_e6"
        ),
        F.floor(md * (nd - 1.0) * w_stat * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("chi2_e4"),
    )


SQL_KENDALL_W = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), cnt AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
), vocab AS (
  SELECT w FROM (
    SELECT w, CAST(sum(c) AS BIGINT) AS gc FROM cnt GROUP BY 1
  ) ORDER BY gc DESC, w ASC LIMIT {_W_K}
), srcs AS (
  SELECT DISTINCT source FROM cnt
), grid AS (
  SELECT srcs.source, vocab.w, COALESCE(cnt.c, 0) AS c
  FROM srcs CROSS JOIN vocab
  LEFT JOIN cnt ON cnt.source = srcs.source AND cnt.w = vocab.w
), ranked AS (
  SELECT source, w,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY c DESC, w ASC) AS BIGINT) AS r
  FROM grid
), rj AS (
  SELECT w, CAST(sum(r) AS BIGINT) AS rj FROM ranked GROUP BY 1
), mn AS (
  SELECT CAST(count(DISTINCT source) AS BIGINT) AS m,
         CAST(count(DISTINCT w) AS BIGINT) AS n
  FROM ranked
), agg AS (
  SELECT max(mn.m) AS m, max(mn.n) AS n,
         CAST(sum((2 * rj.rj - mn.m * (mn.n + 1))
                  * (2 * rj.rj - mn.m * (mn.n + 1))) AS BIGINT) AS s4
  FROM rj CROSS JOIN mn
)
SELECT m AS m_sources, n AS n_words, s4,
       CAST(floor(3.0 * s4 / (CAST(m AS DOUBLE) * m
                              * (CAST(n AS DOUBLE) * n * n - n))
                  * 1000000 + {_OFF}) AS BIGINT) AS w_e6,
       CAST(floor(CAST(m AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                  * (3.0 * s4 / (CAST(m AS DOUBLE) * m
                                 * (CAST(n AS DOUBLE) * n * n - n)))
                  * 10000 + {_OFF}) AS BIGINT) AS chi2_e4
FROM agg
"""


# ---------------------------------------------------------------------------
# morisita_horn — Morisita-Horn abundance overlap between source pairs
# ---------------------------------------------------------------------------
# Horn (Am Nat 100, 1966) simplification of Morisita (1959): C_H =
# 2 sum(x_i y_i) / ((D_x + D_y) X Y) with D = sum x_i^2 / X^2 —
# abundance-weighted overlap, complementing the set-based
# source_overlap / audience_jaccard.  The word-level pair join is
# bounded by vocab x sources^2 (documented envelope, cf. burrows
# pairs); every sum is exact BIGINT and C_H is one fixed-order chain.


def q_morisita_horn(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    stats = cnt.groupBy("source").agg(
        F.sum("c").alias("x"),
        F.sum(F.col("c") * F.col("c")).alias("dx"),
    )
    b = cnt.select(
        F.col("source").alias("s2"),
        F.col("w").alias("w_r"),
        F.col("c").alias("c2"),
    )
    pairs = cnt.join(
        b, (F.col("w") == F.col("w_r")) & (F.col("source") < F.col("s2"))
    )
    sxy = pairs.groupBy(F.col("source").alias("s1"), "s2").agg(
        F.sum(F.col("c") * F.col("c2")).alias("sxy")
    )
    sa = stats.select(
        F.col("source").alias("s1"),
        F.col("x").alias("xa"),
        F.col("dx").alias("da"),
    )
    sb = stats.select(
        F.col("source").alias("s2"),
        F.col("x").alias("xb"),
        F.col("dx").alias("db"),
    )
    j = sxy.join(F.broadcast(sa), "s1").join(F.broadcast(sb), "s2")
    xa = F.col("xa").cast("double")
    xb = F.col("xb").cast("double")
    ch = (
        2.0
        * F.col("sxy").cast("double")
        / (
            (
                F.col("da").cast("double") / (xa * xa)
                + F.col("db").cast("double") / (xb * xb)
            )
            * xa
            * xb
        )
    )
    return j.select(
        "s1",
        "s2",
        F.col("sxy").cast("long").alias("sxy"),
        F.floor(ch * 1_000_000 + F.lit(_OFF)).cast("long").alias("ch_e6"),
    ).orderBy("s1", "s2")


SQL_MORISITA = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), cnt AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
), stats AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS x,
         CAST(sum(c * c) AS BIGINT) AS dx
  FROM cnt GROUP BY 1
), sxy AS (
  SELECT a.source AS s1, b.source AS s2,
         CAST(sum(a.c * b.c) AS BIGINT) AS sxy
  FROM cnt a JOIN cnt b ON b.w = a.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s1, s2, sxy,
       CAST(floor(2.0 * sxy
                  / ((CAST(sa.dx AS DOUBLE)
                      / (CAST(sa.x AS DOUBLE) * sa.x)
                      + CAST(sb.dx AS DOUBLE)
                        / (CAST(sb.x AS DOUBLE) * sb.x))
                     * CAST(sa.x AS DOUBLE) * CAST(sb.x AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS ch_e6
FROM sxy
JOIN stats sa ON sa.source = sxy.s1
JOIN stats sb ON sb.source = sxy.s2
ORDER BY s1, s2
"""



# ---------------------------------------------------------------------------
# modularity_q — Newman modularity of the LPA community partition
# ---------------------------------------------------------------------------
# Newman & Girvan (Phys Rev E 69, 2004): Q = sum_c [ W_in,c / (2m) -
# (deg_c / (2m))^2 ] on the weighted undirected crawl-order domain
# graph, with the communities from the SAME fixed-4-round
# deterministic LPA as label_propagation (queries_stats2) — both
# engines recompute the identical partition, so Q and the per-
# community decomposition are engine-exact integers until the final
# two divisions per community (bounded #communities).  W_in,c counts
# the symmetrized within-community weight (self-inverse convention:
# 2m = total sym weight).


def q_modularity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.graph import label_propagation

    d = _documents(spark, sf_dir).select("doc_id", "lang", "source")
    w = Window.partitionBy("lang").orderBy("doc_id")
    edges = (
        d.withColumn("_nxt", F.lead("source").over(w))
        .filter(F.col("_nxt").isNotNull())
        .select(F.col("source").alias("src"), F.col("_nxt").alias("dst"))
    )
    sym = (
        edges.select(F.col("src").alias("s"), F.col("dst").alias("d"))
        .union(
            edges.select(F.col("dst").alias("s"), F.col("src").alias("d"))
        )
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    lab = label_propagation(edges, "src", "dst", n_iter=4)
    ls = lab.select(F.col("node").alias("s"), F.col("label").alias("cs"))
    ld = lab.select(F.col("node").alias("d"), F.col("label").alias("cd"))
    e = sym.join(F.broadcast(ls), "s").join(F.broadcast(ld), "d")
    deg = e.groupBy("cs").agg(F.sum("w").alias("deg_w"))
    win = (
        e.filter(F.col("cs") == F.col("cd"))
        .groupBy("cs")
        .agg(F.sum("w").alias("win_w"))
    )
    nsz = lab.groupBy(F.col("label").alias("cs")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    tot = sym.agg(F.sum("w").alias("m2"))
    out = (
        deg.join(win, "cs", "left")
        .fillna(0, subset=["win_w"])
        .join(F.broadcast(nsz), "cs")
        .crossJoin(F.broadcast(tot))
    )
    m2 = F.col("m2").cast("double")
    contrib = F.col("win_w").cast("double") / m2 - (
        F.col("deg_w").cast("double") / m2
    ) * (F.col("deg_w").cast("double") / m2)
    return out.select(
        F.col("cs").alias("community"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("win_w").cast("long").alias("win_w"),
        F.col("deg_w").cast("long").alias("deg_w"),
        F.floor(contrib * 1e9 + F.lit(_OFF)).cast("long").alias(
            "contrib_e9"
        ),
    ).orderBy("community")


def _sql_modularity() -> str:
    from diive_spark.queries_stats2 import _sql_lpa

    return f"""
WITH lab AS ({_sql_lpa()}),
e0 AS (
  SELECT source AS src,
         lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS dst
  FROM documents QUALIFY dst IS NOT NULL
), symg AS (
  SELECT s, d, CAST(count(*) AS BIGINT) AS w FROM (
    SELECT src AS s, dst AS d FROM e0
    UNION ALL
    SELECT dst AS s, src AS d FROM e0
  ) GROUP BY 1, 2
), degc AS (
  SELECT l.label AS community, CAST(sum(e.w) AS BIGINT) AS deg_w
  FROM symg e JOIN lab l ON l.node = e.s
  GROUP BY 1
), winc AS (
  SELECT ls.label AS community, CAST(sum(e.w) AS BIGINT) AS win_w
  FROM symg e
  JOIN lab ls ON ls.node = e.s
  JOIN lab ld ON ld.node = e.d
  WHERE ls.label = ld.label
  GROUP BY 1
), nsz AS (
  SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes
  FROM lab GROUP BY 1
), tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS m2 FROM symg
)
SELECT d.community, nsz.n_nodes,
       CAST(COALESCE(w.win_w, 0) AS BIGINT) AS win_w, d.deg_w,
       CAST(floor((CAST(COALESCE(w.win_w, 0) AS DOUBLE) / tot.m2
                   - (CAST(d.deg_w AS DOUBLE) / tot.m2)
                     * (CAST(d.deg_w AS DOUBLE) / tot.m2))
                  * 1e9 + {_OFF}) AS BIGINT) AS contrib_e9
FROM degc d
LEFT JOIN winc w ON w.community = d.community
JOIN nsz ON nsz.community = d.community
CROSS JOIN tot
ORDER BY d.community
"""



# ---------------------------------------------------------------------------
# rich_club — rich-club coefficient profile on the domain graph
# ---------------------------------------------------------------------------
# Zhou & Mondragon (IEEE Comm Lett 8, 2004): phi(k) = 2 E_{>k} /
# (N_{>k} (N_{>k} - 1)) — the edge density among nodes of degree > k,
# for k in {1, 2, 4, 8}.  Simple undirected graph = distinct sym
# pairs; degrees = distinct-neighbor counts.  Everything is exact
# integer counting; the k fan-out is a 4-literal explode against the
# (tiny) degree table, never a rescan of edges per k.


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "lang", "source")
    w = Window.partitionBy("lang").orderBy("doc_id")
    edges = (
        d.withColumn("_nxt", F.lead("source").over(w))
        .filter(F.col("_nxt").isNotNull() & (F.col("_nxt") != F.col("source")))
        .select(
            F.least("source", "_nxt").alias("a"),
            F.greatest("source", "_nxt").alias("b"),
        )
        .distinct()
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .union(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    ks = deg.withColumn(
        "kth", F.explode(F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8)))
    ).filter(F.col("k") > F.col("kth"))
    nk = ks.groupBy("kth").agg(F.count(F.lit(1)).alias("n_nodes"))
    da = ks.select(F.col("v").alias("a"), "kth")
    db = ks.select(F.col("v").alias("b"), "kth")
    ek = (
        edges.join(F.broadcast(da), "a")
        .join(F.broadcast(db), ["b", "kth"])
        .groupBy("kth")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    out = nk.join(ek, "kth", "left").fillna(0, subset=["n_edges"])
    phi = (
        2.0
        * F.col("n_edges").cast("double")
        / (
            F.col("n_nodes").cast("double")
            * (F.col("n_nodes").cast("double") - 1.0)
        )
    )
    return (
        out.filter(F.col("n_nodes") >= 2)
        .select(
            F.col("kth").cast("long").alias("k"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.floor(phi * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "phi_e6"
            ),
        )
        .orderBy("k")
    )


SQL_RICH_CLUB = f"""
WITH e0 AS (
  SELECT source AS src,
         lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS dst
  FROM documents QUALIFY dst IS NOT NULL AND dst <> source
), edges AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0
), deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS k FROM (
    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
  ) GROUP BY 1
), ks AS (
  SELECT deg.v, deg.k, t.kth
  FROM deg CROSS JOIN (VALUES (1), (2), (4), (8)) AS t(kth)
  WHERE deg.k > t.kth
), nk AS (
  SELECT kth, CAST(count(*) AS BIGINT) AS n_nodes FROM ks GROUP BY 1
), ek AS (
  SELECT ka.kth, CAST(count(*) AS BIGINT) AS n_edges
  FROM edges e
  JOIN ks ka ON ka.v = e.a
  JOIN ks kb ON kb.v = e.b AND kb.kth = ka.kth
  GROUP BY 1
)
SELECT CAST(nk.kth AS BIGINT) AS k, nk.n_nodes,
       CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
       CAST(floor(2.0 * COALESCE(ek.n_edges, 0)
                  / (CAST(nk.n_nodes AS DOUBLE)
                     * (CAST(nk.n_nodes AS DOUBLE) - 1.0))
                  * 1000000 + {_OFF}) AS BIGINT) AS phi_e6
FROM nk LEFT JOIN ek ON ek.kth = nk.kth
WHERE nk.n_nodes >= 2
ORDER BY k
"""


# ---------------------------------------------------------------------------
# zipf_abbreviation — Zipf's law of abbreviation per language
# ---------------------------------------------------------------------------
# Zipf (The Psycho-Biology of Language, 1935): frequent words are
# short — the correlation between word frequency and word length over
# the vocabulary.  Pearson r from exact BIGINT cross-moments of
# (count, length); also the ln-frequency variant's OLS slope with
# per-word e9-floored ln terms.  One vocab groupBy then one combinable
# moment agg per lang — no window, no join.


def q_zipf_abbreviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    voc = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    voc = voc.select(
        "lang",
        F.col("c").cast("long").alias("c"),
        F.length("w").cast("long").alias("l"),
        F.floor(F.log(F.col("c").cast("double")) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("lc9"),
    )
    lcd = F.col("lc9").cast("double") / 1e9
    ld = F.col("l").cast("double")
    voc = voc.withColumn(
        "xy9", F.floor(lcd * ld * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn("xx9", F.floor(lcd * lcd * 1e9 + F.lit(_OFF)).cast("long"))
    agg = voc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum("l").alias("sl"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
        F.sum(F.col("l") * F.col("l")).alias("sll"),
        F.sum(F.col("c") * F.col("l")).alias("scl"),
        F.sum("lc9").alias("sx"),
        F.sum("xy9").alias("sxy"),
        F.sum("xx9").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    covn = (F.col("n") * F.col("scl") - F.col("sc") * F.col("sl")).cast(
        "double"
    )
    vc = (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")).cast(
        "double"
    )
    vl = (F.col("n") * F.col("sll") - F.col("sl") * F.col("sl")).cast(
        "double"
    )
    r = covn / F.sqrt(vc * vl)
    sx = F.col("sx").cast("double") / 1e9
    sxy = F.col("sxy").cast("double") / 1e9
    sxx = F.col("sxx").cast("double") / 1e9
    sl = F.col("sl").cast("double")
    slope = (nd * sxy - sx * sl) / (nd * sxx - sx * sx)
    return (
        agg.filter((F.col("n") >= 5) & (vc > 0) & (vl > 0))
        .filter((nd * sxx - sx * sx) > 0)
        .select(
            "lang",
            F.col("n").cast("long").alias("n_words"),
            F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "pearson_e6"
            ),
            F.floor(slope * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "lnslope_e6"
            ),
        )
        .orderBy("lang")
    )


SQL_ZIPF_ABBREV = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), voc AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS c,
         CAST(len(w) AS BIGINT) AS l,
         CAST(floor(ln(CAST(count(*) AS DOUBLE)) * 1e9 + {_OFF})
              AS BIGINT) AS lc9
  FROM toks GROUP BY lang, w
), v2 AS (
  SELECT lang, c, l, lc9,
         CAST(floor((CAST(lc9 AS DOUBLE) / 1e9) * l * 1e9 + {_OFF})
              AS BIGINT) AS xy9,
         CAST(floor((CAST(lc9 AS DOUBLE) / 1e9)
                    * (CAST(lc9 AS DOUBLE) / 1e9) * 1e9 + {_OFF})
              AS BIGINT) AS xx9
  FROM voc
), agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS sc, CAST(sum(l) AS BIGINT) AS sl,
         CAST(sum(c * c) AS BIGINT) AS scc,
         CAST(sum(l * l) AS BIGINT) AS sll,
         CAST(sum(c * l) AS BIGINT) AS scl,
         CAST(sum(lc9) AS BIGINT) AS sx,
         CAST(sum(xy9) AS BIGINT) AS sxy,
         CAST(sum(xx9) AS BIGINT) AS sxx
  FROM v2 GROUP BY 1
)
SELECT lang, n AS n_words,
       CAST(floor(CAST(n * scl - sc * sl AS DOUBLE)
                  / sqrt(CAST(n * scc - sc * sc AS DOUBLE)
                         * CAST(n * sll - sl * sl AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS pearson_e6,
       CAST(floor((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                   - (CAST(sx AS DOUBLE) / 1e9) * CAST(sl AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                     - (CAST(sx AS DOUBLE) / 1e9)
                       * (CAST(sx AS DOUBLE) / 1e9))
                  * 1000000 + {_OFF}) AS BIGINT) AS lnslope_e6
FROM agg
WHERE n >= 5 AND n * scc - sc * sc > 0 AND n * sll - sl * sl > 0
  AND CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
      - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9) > 0
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# menzerath_altmann — Menzerath-Altmann law fit per language
# ---------------------------------------------------------------------------
# Altmann (Glottometrika 2, 1980): the larger the construct (document,
# in tokens), the smaller its constituents (mean word length) —
# fitted as ln(meanlen) = a + b ln(n_tokens).  Per-doc ln terms are
# e9-floored (order-free); the 2-point moments xy/xx are refloored per
# doc, so the per-lang OLS runs on exact BIGINT sums (variance_time
# discipline).


def q_menzerath_altmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("nt"),
        F.length(F.regexp_replace(F.trim("text"), r"\s+", "")).cast(
            "long"
        ).alias("nc"),
    ).filter((F.col("nt") >= 2) & (F.col("nc") > 0))
    x = F.floor(
        F.log(F.col("nt").cast("double")) * 1e9 + F.lit(_OFF)
    ).cast("long")
    y = F.floor(
        F.log(F.col("nc").cast("double") / F.col("nt").cast("double")) * 1e9
        + F.lit(_OFF)
    ).cast("long")
    pts = d.select("lang", x.alias("x9"), y.alias("y9"))
    xd = F.col("x9").cast("double") / 1e9
    yd = F.col("y9").cast("double") / 1e9
    pts = pts.withColumn(
        "xy9", F.floor(xd * yd * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn("xx9", F.floor(xd * xd * 1e9 + F.lit(_OFF)).cast("long"))
    agg = pts.groupBy("lang").agg(
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
    den = nd * sxx - sx * sx
    slope = (nd * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / nd
    return (
        agg.filter((F.col("n") >= 5) & (den > 0))
        .select(
            "lang",
            F.col("n").cast("long").alias("n_docs"),
            F.floor(slope * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "b_e6"
            ),
            F.floor(intercept * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "a_e6"
            ),
        )
        .orderBy("lang")
    )


SQL_MENZERATH = f"""
WITH d AS (
  SELECT lang,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS nt,
         CAST(len(regexp_replace(trim(text), '\\s+', '', 'g')) AS BIGINT)
           AS nc
  FROM documents
), f AS (
  SELECT lang,
         CAST(floor(ln(CAST(nt AS DOUBLE)) * 1e9 + {_OFF}) AS BIGINT) AS x9,
         CAST(floor(ln(CAST(nc AS DOUBLE) / nt) * 1e9 + {_OFF})
              AS BIGINT) AS y9
  FROM d WHERE nt >= 2 AND nc > 0
), pts AS (
  SELECT lang, x9, y9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9) * (CAST(y9 AS DOUBLE) / 1e9)
                    * 1e9 + {_OFF}) AS BIGINT) AS xy9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9) * (CAST(x9 AS DOUBLE) / 1e9)
                    * 1e9 + {_OFF}) AS BIGINT) AS xx9
  FROM f
), agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x9) AS BIGINT) AS sx, CAST(sum(y9) AS BIGINT) AS sy,
         CAST(sum(xy9) AS BIGINT) AS sxy, CAST(sum(xx9) AS BIGINT) AS sxx
  FROM pts GROUP BY 1
)
SELECT lang, n AS n_docs,
       CAST(floor((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                   - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
                  / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                     - (CAST(sx AS DOUBLE) / 1e9)
                       * (CAST(sx AS DOUBLE) / 1e9))
                  * 1000000 + {_OFF}) AS BIGINT) AS b_e6,
       CAST(floor(((CAST(sy AS DOUBLE) / 1e9)
                   - (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                      - (CAST(sx AS DOUBLE) / 1e9)
                        * (CAST(sy AS DOUBLE) / 1e9))
                     / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                        - (CAST(sx AS DOUBLE) / 1e9)
                          * (CAST(sx AS DOUBLE) / 1e9))
                     * (CAST(sx AS DOUBLE) / 1e9))
                  / CAST(n AS DOUBLE) * 1000000 + {_OFF})
            AS BIGINT) AS a_e6
FROM agg
WHERE n >= 5
  AND CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
      - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9) > 0
ORDER BY lang
"""



# ---------------------------------------------------------------------------
# eb_shrinkage — empirical-Bayes beta-binomial shrinkage of activity rates
# ---------------------------------------------------------------------------
# Robbins (Proc 3rd Berkeley Symp, 1956) / standard beta-binomial MoM:
# every user shares the SAME trial count n (days in the global span),
# so the cross-user moments of p_i = x_i / n come off exact BIGINT
# sums of x and x^2; alpha + beta = m(1 - m)/v - 1 and the shrunk
# rate (x + alpha)/(n + alpha + beta) are fixed-order double chains —
# bit-identical, zero refloors (the adf_test posture).


def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
    per = ev.select("user_id", day.cast("long").alias("day"))
    x = per.groupBy("user_id").agg(
        F.countDistinct("day").alias("x")
    )
    span = per.agg(
        (F.max("day") - F.min("day") + 1).alias("n"),
    )
    mom = x.agg(
        F.count(F.lit(1)).alias("u"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    j = x.crossJoin(F.broadcast(span)).crossJoin(F.broadcast(mom))
    ud = F.col("u").cast("double")
    nd = F.col("n").cast("double")
    m = F.col("sx").cast("double") / (ud * nd)
    v = (
        F.col("sxx").cast("double") / ud
        - (F.col("sx").cast("double") / ud)
        * (F.col("sx").cast("double") / ud)
    ) / (nd * nd)
    ab = m * (1.0 - m) / v - 1.0
    alpha = m * ab
    shrunk = (F.col("x").cast("double") + alpha) / (nd + ab)
    return (
        j.filter((v > 0) & (ab > 0))
        .select(
            "user_id",
            F.col("x").cast("long").alias("x_days"),
            F.col("n").cast("long").alias("n_days"),
            F.floor(
                F.col("x").cast("double") / nd * 1_000_000 + F.lit(_OFF)
            )
            .cast("long")
            .alias("raw_e6"),
            F.floor(shrunk * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "shrunk_e6"
            ),
        )
        .orderBy("user_id")
    )


SQL_EB_SHRINK = f"""
WITH per AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), x AS (
  SELECT user_id, CAST(count(DISTINCT day) AS BIGINT) AS x
  FROM per GROUP BY 1
), span AS (
  SELECT CAST(max(day) - min(day) + 1 AS BIGINT) AS n FROM per
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS u, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM x
), fin AS (
  SELECT x.user_id, x.x, span.n,
         CAST(sx AS DOUBLE) / (CAST(u AS DOUBLE) * span.n) AS m,
         (CAST(sxx AS DOUBLE) / u
          - (CAST(sx AS DOUBLE) / u) * (CAST(sx AS DOUBLE) / u))
           / (CAST(span.n AS DOUBLE) * span.n) AS v
  FROM x CROSS JOIN span CROSS JOIN mom
)
SELECT user_id, x AS x_days, n AS n_days,
       CAST(floor(CAST(x AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS raw_e6,
       CAST(floor((CAST(x AS DOUBLE) + m * (m * (1.0 - m) / v - 1.0))
                  / (CAST(n AS DOUBLE) + m * (1.0 - m) / v - 1.0)
                  * 1000000 + {_OFF}) AS BIGINT) AS shrunk_e6
FROM fin
WHERE v > 0 AND m * (1.0 - m) / v - 1.0 > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# hash_collision_audit — birthday-collision audit of truncated hashes
# ---------------------------------------------------------------------------
# The dedup-engineering question "how wide must the signature be":
# observed colliding pairs among DISTINCT texts under 16/24/32-bit
# md5 prefixes vs the birthday expectation C(N,2)/2^b (Chen-Stein
# Poisson regime).  Observed = sum C(c, 2) per bucket — exact
# integers; expected is one closed-form division.  One distinct, one
# groupBy per width via explode (never a rescan per width).


def q_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("text").distinct()
    h = d.select(F.md5("text").alias("h"))
    sized = h.withColumn(
        "bits", F.explode(F.array(F.lit(16), F.lit(24), F.lit(32)))
    ).select(
        "bits",
        F.substring("h", 1, (F.col("bits") / 4).cast("int")).alias("pre"),
    )
    buck = sized.groupBy("bits", "pre").agg(F.count(F.lit(1)).alias("c"))
    obs = buck.groupBy("bits").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias(
            "obs_pairs"
        ),
    )
    nd = F.col("n").cast("double")
    exp_pairs = nd * (nd - 1.0) / 2.0 / F.pow(F.lit(2.0), F.col("bits"))
    return obs.select(
        F.col("bits").cast("long").alias("bits"),
        F.col("n").cast("long").alias("n_distinct"),
        "obs_pairs",
        F.floor(exp_pairs * 10_000 + F.lit(_OFF)).cast("long").alias(
            "exp_pairs_e4"
        ),
    ).orderBy("bits")


SQL_HASH_AUDIT = f"""
WITH d AS (
  SELECT DISTINCT text FROM documents
), h AS (
  SELECT md5(text) AS h FROM d
), sized AS (
  SELECT t.bits, substr(h.h, 1, t.bits // 4) AS pre
  FROM h CROSS JOIN (VALUES (16), (24), (32)) AS t(bits)
), buck AS (
  SELECT bits, pre, CAST(count(*) AS BIGINT) AS c
  FROM sized GROUP BY 1, 2
), obs AS (
  SELECT bits, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * (c - 1) // 2) AS BIGINT) AS obs_pairs
  FROM buck GROUP BY 1
)
SELECT CAST(bits AS BIGINT) AS bits, n AS n_distinct, obs_pairs,
       CAST(floor(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                  / pow(2.0, bits) * 10000 + {_OFF})
            AS BIGINT) AS exp_pairs_e4
FROM obs
ORDER BY bits
"""


# ---------------------------------------------------------------------------
# geometric_fit_gof — geometric fit + chi-square GoF on session lengths
# ---------------------------------------------------------------------------
# Feller (Vol I, ch. XI): session click-counts under a memoryless
# model are Geometric(p) on {1, 2, ...}; p-hat = 1/mean, then a
# chi-square GoF over cells {1, .., 6, 7+}.  Sessions use the house
# 1800 s gap rule (queries_timeseries sessionize); observed cell
# counts are exact integers, expected counts and the chi-square are
# fixed-order double chains per cell, e6-floored per cell before the
# (bounded, 7-cell) sum.


def q_geometric_fit_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = (
        ev.select("user_id", "event_id", sec.cast("long").alias("s"))
        .withColumn("prev", F.lag("s").over(wo))
        .withColumn(
            "brk",
            (
                F.col("prev").isNull()
                | ((F.col("s") - F.col("prev")) > 1800)
            ).cast("long"),
        )
        .withColumn(
            "sid",
            F.sum("brk").over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    ln = g.groupBy("user_id", "sid").agg(F.count(F.lit(1)).alias("len"))
    cell = ln.select(
        F.least(F.col("len"), F.lit(7)).alias("cell")
    ).groupBy("cell").agg(F.count(F.lit(1)).alias("obs"))
    tot = ln.agg(
        F.count(F.lit(1)).alias("ns"), F.sum("len").alias("sl")
    )
    j = cell.crossJoin(F.broadcast(tot))
    p = F.col("ns").cast("double") / F.col("sl").cast("double")
    k = F.col("cell").cast("double")
    prob = F.when(
        F.col("cell") < 7, F.pow(1.0 - p, k - 1.0) * p
    ).otherwise(F.pow(1.0 - p, F.lit(6.0)))
    exp = F.col("ns").cast("double") * prob
    chi = (F.col("obs").cast("double") - exp) * (
        F.col("obs").cast("double") - exp
    ) / exp
    cells = j.select(
        "cell",
        "obs",
        F.floor(exp * 10_000 + F.lit(_OFF)).cast("long").alias("exp_e4"),
        F.floor(chi * 1_000_000 + F.lit(_OFF)).cast("long").alias("chi6"),
    )
    return cells.select(
        F.col("cell").cast("long").alias("cell"),
        F.col("obs").cast("long").alias("obs"),
        "exp_e4",
        F.floor(F.col("chi6").cast("double") / 100.0 + F.lit(_OFF))
        .cast("long")
        .alias("chi_e4"),
    ).orderBy("cell")


SQL_GEOMETRIC = f"""
WITH g AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev
  FROM events
), b AS (
  SELECT user_id,
         CAST(sum(CASE WHEN prev IS NULL OR s - prev > 1800
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, event_id)
              AS BIGINT) AS sid
  FROM g
), ln AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS len
  FROM b GROUP BY 1, 2
), cell AS (
  SELECT least(len, 7) AS cell, CAST(count(*) AS BIGINT) AS obs
  FROM ln GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS ns, CAST(sum(len) AS BIGINT) AS sl
  FROM ln
), j AS (
  SELECT cell, obs, ns,
         CASE WHEN cell < 7
              THEN pow(1.0 - CAST(ns AS DOUBLE) / sl, cell - 1.0)
                   * (CAST(ns AS DOUBLE) / sl)
              ELSE pow(1.0 - CAST(ns AS DOUBLE) / sl, 6.0)
         END AS prob
  FROM cell CROSS JOIN tot
)
SELECT CAST(cell AS BIGINT) AS cell, obs,
       CAST(floor(CAST(ns AS DOUBLE) * prob * 10000 + {_OFF})
            AS BIGINT) AS exp_e4,
       CAST(floor(CAST(floor((CAST(obs AS DOUBLE) - ns * prob)
                             * (CAST(obs AS DOUBLE) - ns * prob)
                             / (ns * prob) * 1000000 + {_OFF}) AS BIGINT)
                  / 100.0 + {_OFF}) AS BIGINT) AS chi_e4
FROM j
ORDER BY cell
"""


# ---------------------------------------------------------------------------
# bimodality_coeff — Sarle's bimodality coefficient of doc lengths
# ---------------------------------------------------------------------------
# Sarle (SAS Technical Report A-108, 1983) / Pfister et al. (Front
# Psychol 4, 2013): BC = (g1^2 + 1) / (g2 + 3 (n-1)^2 / ((n-2)(n-3)))
# with sample skewness g1 and excess kurtosis g2; BC > 5/9 hints
# bimodality.  Raw power sums up to x^4 are exact BIGINT (n_chars <=
# ~1e3, x^4 <= 1e12 x corpus rows — safe through sf10); central
# moments and the g1/g2/BC chain are fixed-order doubles.


def q_bimodality_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "lang", F.col("n_chars").cast("long").alias("x")
    )
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias(
            "s4"
        ),
    )
    nd = F.col("n").cast("double")
    m = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd - m * m
    m3 = (
        F.col("s3").cast("double") / nd
        - 3.0 * m * (F.col("s2").cast("double") / nd)
        + 2.0 * m * m * m
    )
    m4 = (
        F.col("s4").cast("double") / nd
        - 4.0 * m * (F.col("s3").cast("double") / nd)
        + 6.0 * m * m * (F.col("s2").cast("double") / nd)
        - 3.0 * m * m * m * m
    )
    g1 = (
        F.sqrt(nd * (nd - 1.0))
        / (nd - 2.0)
        * (m3 / F.pow(m2, F.lit(1.5)))
    )
    g2 = (
        (nd - 1.0)
        / ((nd - 2.0) * (nd - 3.0))
        * ((nd + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0)
    )
    bc = (g1 * g1 + 1.0) / (
        g2 + 3.0 * (nd - 1.0) * (nd - 1.0) / ((nd - 2.0) * (nd - 3.0))
    )
    return (
        agg.filter((F.col("n") >= 5) & (m2 > 0))
        .select(
            "lang",
            F.col("n").cast("long").alias("n_docs"),
            F.floor(g1 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "skew_e4"
            ),
            F.floor(g2 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "exkurt_e4"
            ),
            F.floor(bc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "bc_e6"
            ),
        )
        .orderBy("lang")
    )


SQL_BIMODALITY = f"""
WITH agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2,
         CAST(sum(n_chars * n_chars * n_chars) AS BIGINT) AS s3,
         CAST(sum(n_chars * n_chars * n_chars * n_chars) AS BIGINT) AS s4
  FROM documents GROUP BY 1
), c AS (
  SELECT lang, n,
         CAST(s1 AS DOUBLE) / n AS m,
         CAST(s2 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) AS m3,
         CAST(s4 AS DOUBLE) / n
           - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
           + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s2 AS DOUBLE) / n)
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM agg
), g AS (
  SELECT lang, n,
         sqrt(CAST(n AS DOUBLE) * (n - 1.0)) / (CAST(n AS DOUBLE) - 2.0)
           * (m3 / pow(m2, 1.5)) AS g1,
         (CAST(n AS DOUBLE) - 1.0)
           / ((CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0))
           * ((CAST(n AS DOUBLE) + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0)
           AS g2,
         m2
  FROM c
)
SELECT lang, n AS n_docs,
       CAST(floor(g1 * 10000 + {_OFF}) AS BIGINT) AS skew_e4,
       CAST(floor(g2 * 10000 + {_OFF}) AS BIGINT) AS exkurt_e4,
       CAST(floor((g1 * g1 + 1.0)
                  / (g2 + 3.0 * (CAST(n AS DOUBLE) - 1.0)
                           * (CAST(n AS DOUBLE) - 1.0)
                           / ((CAST(n AS DOUBLE) - 2.0)
                              * (CAST(n AS DOUBLE) - 3.0)))
                  * 1000000 + {_OFF}) AS BIGINT) AS bc_e6
FROM g
WHERE n >= 5 AND m2 > 0
ORDER BY lang
"""



# ---------------------------------------------------------------------------
# newey_west_se — HAC (Newey-West, lag 2) standard error of the mean
# ---------------------------------------------------------------------------
# Newey & West (Econometrica 55, 1987): long-run variance = g0 +
# 2 sum_k (1 - k/(K+1)) g_k with Bartlett weights, K = 2; the ratio
# se_NW / se_iid exposes serial correlation in hourly centivalues.
# Same exact-BIGINT truncated-edge autocovariance construction as
# pacf_profile (two leads on ONE window); the whole chain after the
# integer sums is fixed-order doubles — bit-identical, zero refloors.


def q_newey_west_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _hourly

    h = _hourly(spark, sf_dir).select(
        "user_id", "t", F.col("v").cast("long").alias("v")
    )
    wo = Window.partitionBy("user_id").orderBy("t")
    r = h.withColumn("v1", F.lead("v", 1).over(wo)).withColumn(
        "v2", F.lead("v", 2).over(wo)
    )
    agg = r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum(F.col("v") * F.col("v1")).alias("p1"),
        F.sum(F.col("v") * F.col("v2")).alias("p2"),
        F.sum(F.when(F.col("v1").isNotNull(), F.col("v"))).alias("a1"),
        F.sum(F.when(F.col("v2").isNotNull(), F.col("v"))).alias("a2"),
        F.sum("v1").alias("b1"),
        F.sum("v2").alias("b2"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s").cast("double") / nd
    g0 = (F.col("svv").cast("double") - nd * mu * mu) / nd
    g1 = (
        F.col("p1").cast("double")
        - mu * (F.col("a1") + F.col("b1")).cast("double")
        + (nd - 1.0) * mu * mu
    ) / nd
    g2 = (
        F.col("p2").cast("double")
        - mu * (F.col("a2") + F.col("b2")).cast("double")
        + (nd - 2.0) * mu * mu
    ) / nd
    lrv = g0 + 2.0 * (2.0 / 3.0) * g1 + 2.0 * (1.0 / 3.0) * g2
    se_iid = F.sqrt(g0 / nd)
    se_nw = F.sqrt(lrv / nd)
    return (
        agg.filter((F.col("n") >= 10) & (g0 > 0) & (lrv > 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_obs"),
            F.floor(mu * 100 + F.lit(_OFF)).cast("long").alias("mean_e2"),
            F.floor(se_iid * 10_000 + F.lit(_OFF)).cast("long").alias(
                "se_iid_e4"
            ),
            F.floor(se_nw * 10_000 + F.lit(_OFF)).cast("long").alias(
                "se_nw_e4"
            ),
            F.floor(se_nw / se_iid * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("ratio_e4"),
        )
        .orderBy("user_id")
    )


SQL_NEWEY_WEST = """
WITH {_HOURLY},
hv AS (
  SELECT user_id, t, CAST(v AS BIGINT) AS v FROM hourly
), led AS (
  SELECT user_id, v,
         lead(v, 1) OVER (PARTITION BY user_id ORDER BY t) AS v1,
         lead(v, 2) OVER (PARTITION BY user_id ORDER BY t) AS v2
  FROM hv
), agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(v * v1) AS BIGINT) AS p1,
         CAST(sum(v * v2) AS BIGINT) AS p2,
         CAST(sum(CASE WHEN v1 IS NOT NULL THEN v END) AS BIGINT) AS a1,
         CAST(sum(CASE WHEN v2 IS NOT NULL THEN v END) AS BIGINT) AS a2,
         CAST(sum(v1) AS BIGINT) AS b1,
         CAST(sum(v2) AS BIGINT) AS b2
  FROM led GROUP BY 1
), g AS (
  SELECT user_id, n,
         CAST(s AS DOUBLE) / n AS mu,
         (CAST(svv AS DOUBLE)
          - n * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
           / CAST(n AS DOUBLE) AS g0,
         (CAST(p1 AS DOUBLE)
          - (CAST(s AS DOUBLE) / n) * CAST(a1 + b1 AS DOUBLE)
          + (CAST(n AS DOUBLE) - 1.0) * (CAST(s AS DOUBLE) / n)
            * (CAST(s AS DOUBLE) / n)) / CAST(n AS DOUBLE) AS g1,
         (CAST(p2 AS DOUBLE)
          - (CAST(s AS DOUBLE) / n) * CAST(a2 + b2 AS DOUBLE)
          + (CAST(n AS DOUBLE) - 2.0) * (CAST(s AS DOUBLE) / n)
            * (CAST(s AS DOUBLE) / n)) / CAST(n AS DOUBLE) AS g2
  FROM agg
), fin AS (
  SELECT user_id, n, mu, g0,
         g0 + 2.0 * (2.0 / 3.0) * g1 + 2.0 * (1.0 / 3.0) * g2 AS lrv
  FROM g
)
SELECT user_id, n AS n_obs,
       CAST(floor(mu * 100 + {OFF}) AS BIGINT) AS mean_e2,
       CAST(floor(sqrt(g0 / n) * 10000 + {OFF}) AS BIGINT) AS se_iid_e4,
       CAST(floor(sqrt(lrv / n) * 10000 + {OFF}) AS BIGINT) AS se_nw_e4,
       CAST(floor(sqrt(lrv / n) / sqrt(g0 / n) * 10000 + {OFF})
            AS BIGINT) AS ratio_e4
FROM fin
WHERE n >= 10 AND g0 > 0 AND lrv > 0
ORDER BY user_id
""".format(_HOURLY=_HOURLY_SQL, OFF=_OFF)


# ---------------------------------------------------------------------------
# fisher_g_test — Fisher's g-test for a hidden periodicity
# ---------------------------------------------------------------------------
# Fisher (Proc R Soc A 125, 1929): g = max_j I_j / sum_j I_j over the
# periodogram at the Fourier frequencies j = 1..(n-1)/2 of the hourly
# count series (row-index grid), p ~ m (1 - g)^(m - 1).  On the
# COMPLETE index grid the exact-frequency DFT needs no mean
# subtraction (sum of e^{-iwt} vanishes); angles reduce to the n-point
# lattice 2 pi ((j t) mod n)/n.  Each ordinate is e3-floored before
# the max/sum (trig libm drift is ~1e-10 absolute here, 7 orders
# below the floor), so argmax, g and the p chain are engine-exact.
# Cost envelope: n x m ~ span^2/2 rows — bounded by the CALENDAR, not
# the data volume; cap m for decade spans (documented knob).


def q_fisher_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000))
        .cast("long")
        .alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("h")
    wn = Window.partitionBy("event_type")
    base = (
        hourly.withColumn("t", F.row_number().over(wo) - 1)
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("n") >= 8)
    )
    m = F.floor((F.col("n") - 1) / 2).cast("long")
    fan = base.select(
        "event_type",
        "t",
        "c",
        "n",
        F.explode(F.sequence(F.lit(1), m)).alias("j"),
    )
    k = (F.col("j") * F.col("t")) % F.col("n")
    ang = (
        F.lit(2.0)
        * F.lit(math.pi)
        * k.cast("double")
        / F.col("n").cast("double")
    )
    trig = fan.select(
        "event_type",
        "j",
        "n",
        (F.col("c").cast("double") * F.cos(ang)).alias("ca"),
        (F.col("c").cast("double") * F.sin(ang)).alias("sa"),
    )
    ords = trig.groupBy("event_type", "j").agg(
        F.max("n").alias("n"),
        F.sum("ca").alias("a"),
        F.sum("sa").alias("b"),
    )
    i_j = (F.col("a") * F.col("a") + F.col("b") * F.col("b")) / F.col(
        "n"
    ).cast("double")
    ords = ords.select(
        "event_type",
        "j",
        "n",
        F.floor(i_j * 1_000 + F.lit(_OFF)).cast("long").alias("i3"),
    )
    wmax = Window.partitionBy("event_type").orderBy(
        F.col("i3").desc(), F.col("j").asc()
    )
    agg = (
        ords.withColumn("rk", F.row_number().over(wmax))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).alias("m"),
            F.sum("i3").alias("si3"),
            F.max(F.when(F.col("rk") == 1, F.col("i3"))).alias("imax3"),
            F.max(F.when(F.col("rk") == 1, F.col("j"))).alias("peak_j"),
        )
    )
    g = F.col("imax3").cast("double") / F.col("si3").cast("double")
    md = F.col("m").cast("double")
    logp = F.log(md) + (md - 1.0) * F.log(1.0 - g)
    return (
        agg.filter((F.col("si3") > 0) & (g < 1.0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_hours"),
            F.col("m").cast("long").alias("m_ords"),
            F.col("peak_j").cast("long").alias("peak_j"),
            F.floor(
                F.col("n").cast("double") / F.col("peak_j").cast("double")
                * 100
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("peak_period_h_e2"),
            F.floor(g * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "g_e6"
            ),
            F.floor(logp * 10_000 + F.lit(_OFF)).cast("long").alias(
                "logp_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_FISHER_G = f"""
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), base AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY h) - 1 AS t,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM hourly
), fan AS (
  SELECT event_type, t, c, n,
         unnest(generate_series(1, CAST((n - 1) // 2 AS BIGINT))) AS j
  FROM base WHERE n >= 8
), trig AS (
  SELECT event_type, j, n,
         CAST(c AS DOUBLE)
           * cos(2 * pi() * CAST((j * t) % n AS DOUBLE) / n) AS ca,
         CAST(c AS DOUBLE)
           * sin(2 * pi() * CAST((j * t) % n AS DOUBLE) / n) AS sa
  FROM fan
), ords AS (
  SELECT event_type, j, max(n) AS n,
         CAST(floor((sum(ca) * sum(ca) + sum(sa) * sum(sa))
                    / max(n) * 1000 + {_OFF}) AS BIGINT) AS i3
  FROM trig GROUP BY 1, 2
), ranked AS (
  SELECT event_type, j, n, i3,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY i3 DESC, j ASC) AS rk
  FROM ords
), agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS m,
         CAST(sum(i3) AS BIGINT) AS si3,
         CAST(max(CASE WHEN rk = 1 THEN i3 END) AS BIGINT) AS imax3,
         CAST(max(CASE WHEN rk = 1 THEN j END) AS BIGINT) AS peak_j
  FROM ranked GROUP BY 1
)
SELECT event_type, n AS n_hours, m AS m_ords, peak_j,
       CAST(floor(CAST(n AS DOUBLE) / peak_j * 100 + {_OFF})
            AS BIGINT) AS peak_period_h_e2,
       CAST(floor(CAST(imax3 AS DOUBLE) / si3 * 1000000 + {_OFF})
            AS BIGINT) AS g_e6,
       CAST(floor((ln(CAST(m AS DOUBLE))
                   + (CAST(m AS DOUBLE) - 1.0)
                     * ln(1.0 - CAST(imax3 AS DOUBLE) / si3))
                  * 10000 + {_OFF}) AS BIGINT) AS logp_e4
FROM agg
WHERE si3 > 0 AND imax3 < si3
ORDER BY event_type
"""



# ---------------------------------------------------------------------------
# davies_bouldin / calinski_harabasz — internal clustering validity
# ---------------------------------------------------------------------------
# Davies & Bouldin (IEEE TPAMI 1, 1979): DB = (1/k) sum_i max_{j != i}
# (s_i + s_j)/d_ij with s = mean point-to-own-centroid distance.
# Calinski & Harabasz (Comm Stat 3, 1974): CH = (BSS/(k-1)) /
# (WSS/(N-k)).  Both reuse the silhouette_centroid machinery:
# e6-floored centroid components (exact BIGINT sums); point distances
# ride the Arrow einsum kernel, 6-dp rounded, then sqrt/e6-floored per
# point before label means; the k x k centroid-pair block and the
# global-centroid distances are tiny fixed-order chains.


def _centroids(emb):
    comp = emb.select(
        "label", F.posexplode("embedding").alias("d", "x")
    ).select(
        "label",
        "d",
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("x6"),
    )
    cmom = comp.groupBy("label", "d").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x6").alias("s6")
    )
    return cmom.groupBy("label").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("d"), F.col("s6"), F.col("n")))
            ),
            lambda s: s["s6"].cast("double") / (s["n"].cast("double") * 1e6),
        ).alias("carr")
    )


def q_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.similarity import l2sq_pair_udf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    cent = _centroids(emb)
    own = emb.join(F.broadcast(cent), "label").select(
        "label",
        F.floor(
            F.sqrt(F.round(l2sq_pair_udf(F.col("embedding"), F.col("carr")), 6))
            * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("r6"),
    )
    s = own.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("r6").alias("sr6")
    ).select(
        "label",
        (F.col("sr6").cast("double") / 1e6 / F.col("n").cast("double")).alias(
            "s"
        ),
    )
    c2 = cent.select(
        F.col("label").alias("label_r"), F.col("carr").alias("carr_r")
    )
    dpair = (
        cent.crossJoin(F.broadcast(c2))
        .filter(F.col("label") != F.col("label_r"))
        .select(
            "label",
            "label_r",
            F.sqrt(
                F.round(l2sq_pair_udf(F.col("carr"), F.col("carr_r")), 6)
            ).alias("dij"),
        )
    )
    sj = s.select(F.col("label").alias("label_r"), F.col("s").alias("s_r"))
    ratio = (
        dpair.join(F.broadcast(s), "label")
        .join(F.broadcast(sj), "label_r")
        .filter(F.col("dij") > 0)
        .select(
            "label",
            F.floor(
                (F.col("s") + F.col("s_r")) / F.col("dij") * 1e6
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("r6"),
        )
    )
    peri = ratio.groupBy("label").agg(F.max("r6").alias("ri6"))
    agg = peri.agg(
        F.count(F.lit(1)).alias("k"), F.sum("ri6").alias("sri6")
    )
    db = F.col("sri6").cast("double") / 1e6 / F.col("k").cast("double")
    return agg.select(
        F.col("k").cast("long").alias("k_labels"),
        F.floor(db * 10_000 + F.lit(_OFF)).cast("long").alias("db_e4"),
    )


_SQL_CENT = f"""
comp0 AS (
  SELECT label,
         unnest(list_transform(generate_series(1, len(embedding)),
           i -> struct_pack(d := i,
                x6 := CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6
                                 + {_OFF}) AS BIGINT)))) AS u
  FROM embeddings
), comp AS (
  SELECT label, u.d AS d, u.x6 AS x6 FROM comp0
), cmom AS (
  SELECT label, d, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x6) AS BIGINT) AS s6
  FROM comp GROUP BY 1, 2
), cent AS (
  SELECT label,
         list(CAST(s6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)
              ORDER BY d) AS carr
  FROM cmom GROUP BY 1
)"""


SQL_DAVIES_BOULDIN = f"""
WITH {_SQL_CENT},
own AS (
  SELECT e.label,
         CAST(floor(sqrt(round(list_sum(list_transform(
                generate_series(1, len(e.embedding)),
                i -> (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])
                     * (CAST(e.embedding[i] AS DOUBLE) - c.carr[i]))), 6))
                    * 1e6 + {_OFF}) AS BIGINT) AS r6
  FROM embeddings e JOIN cent c ON c.label = e.label
), s AS (
  SELECT label,
         CAST(sum(r6) AS DOUBLE) / 1e6 / count(*) AS s
  FROM own GROUP BY 1
), dpair AS (
  SELECT a.label, b.label AS label_r,
         sqrt(round(list_sum(list_transform(
           generate_series(1, len(a.carr)),
           i -> (a.carr[i] - b.carr[i]) * (a.carr[i] - b.carr[i]))), 6))
           AS dij
  FROM cent a CROSS JOIN cent b
  WHERE a.label <> b.label
), ratio AS (
  SELECT d.label,
         CAST(floor((sa.s + sb.s) / d.dij * 1e6 + {_OFF})
              AS BIGINT) AS r6
  FROM dpair d
  JOIN s sa ON sa.label = d.label
  JOIN s sb ON sb.label = d.label_r
  WHERE d.dij > 0
), peri AS (
  SELECT label, CAST(max(r6) AS BIGINT) AS ri6 FROM ratio GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS k_labels,
       CAST(floor(CAST(sum(ri6) AS DOUBLE) / 1e6 / count(*) * 10000
                  + {_OFF}) AS BIGINT) AS db_e4
FROM peri
"""


def q_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.similarity import l2sq_pair_udf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    cent = _centroids(emb)
    gcomp = emb.select(F.posexplode("embedding").alias("d", "x")).select(
        "d",
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("x6"),
    )
    gcent = (
        gcomp.groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x6").alias("s6"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("d"), F.col("s6"), F.col("n"))
                    )
                ),
                lambda s: s["s6"].cast("double")
                / (s["n"].cast("double") * 1e6),
            ).alias("garr")
        )
    )
    own = emb.join(F.broadcast(cent), "label").select(
        "label",
        F.floor(
            F.round(l2sq_pair_udf(F.col("embedding"), F.col("carr")), 6)
            * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("w6"),
    )
    wss = own.agg(
        F.count(F.lit(1)).alias("nn"), F.sum("w6").alias("sw6")
    )
    sz = emb.groupBy("label").agg(F.count(F.lit(1)).alias("nl"))
    bterm = (
        cent.join(F.broadcast(sz), "label")
        .crossJoin(F.broadcast(gcent))
        .select(
            F.floor(
                F.col("nl").cast("double")
                * F.round(l2sq_pair_udf(F.col("carr"), F.col("garr")), 6)
                * 1e6
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("b6"),
        )
    )
    bss = bterm.agg(
        F.count(F.lit(1)).alias("k"), F.sum("b6").alias("sb6")
    )
    j = wss.crossJoin(F.broadcast(bss))
    nn = F.col("nn").cast("double")
    kd = F.col("k").cast("double")
    ch = (F.col("sb6").cast("double") / (kd - 1.0)) / (
        F.col("sw6").cast("double") / (nn - kd)
    )
    return j.filter((F.col("k") >= 2) & (F.col("sw6") > 0)).select(
        F.col("nn").cast("long").alias("n_points"),
        F.col("k").cast("long").alias("k_labels"),
        F.floor(
            F.col("sw6").cast("double") / 1e6 * 100 + F.lit(_OFF)
        )
        .cast("long")
        .alias("wss_e2"),
        F.floor(
            F.col("sb6").cast("double") / 1e6 * 100 + F.lit(_OFF)
        )
        .cast("long")
        .alias("bss_e2"),
        F.floor(ch * 10_000 + F.lit(_OFF)).cast("long").alias("ch_e4"),
    )


SQL_CALINSKI = f"""
WITH {_SQL_CENT},
gcomp0 AS (
  SELECT unnest(list_transform(generate_series(1, len(embedding)),
           i -> struct_pack(d := i,
                x6 := CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6
                                 + {_OFF}) AS BIGINT)))) AS u
  FROM embeddings
), gcomp AS (
  SELECT u.d AS d, u.x6 AS x6 FROM gcomp0
), gcent AS (
  SELECT list(CAST(s6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)
              ORDER BY d) AS garr
  FROM (
    SELECT d, CAST(count(*) AS BIGINT) AS n, CAST(sum(x6) AS BIGINT) AS s6
    FROM gcomp GROUP BY 1
  )
), own AS (
  SELECT CAST(floor(round(list_sum(list_transform(
                generate_series(1, len(e.embedding)),
                i -> (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])
                     * (CAST(e.embedding[i] AS DOUBLE) - c.carr[i]))), 6)
                    * 1e6 + {_OFF}) AS BIGINT) AS w6
  FROM embeddings e JOIN cent c ON c.label = e.label
), wss AS (
  SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(w6) AS BIGINT) AS sw6
  FROM own
), sz AS (
  SELECT label, CAST(count(*) AS BIGINT) AS nl
  FROM embeddings GROUP BY 1
), bterm AS (
  SELECT CAST(floor(sz.nl * round(list_sum(list_transform(
                generate_series(1, len(c.carr)),
                i -> (c.carr[i] - g.garr[i])
                     * (c.carr[i] - g.garr[i]))), 6)
                    * 1e6 + {_OFF}) AS BIGINT) AS b6
  FROM cent c JOIN sz ON sz.label = c.label CROSS JOIN gcent g
), bss AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(b6) AS BIGINT) AS sb6
  FROM bterm
)
SELECT nn AS n_points, k AS k_labels,
       CAST(floor(CAST(sw6 AS DOUBLE) / 1e6 * 100 + {_OFF})
            AS BIGINT) AS wss_e2,
       CAST(floor(CAST(sb6 AS DOUBLE) / 1e6 * 100 + {_OFF})
            AS BIGINT) AS bss_e2,
       CAST(floor((CAST(sb6 AS DOUBLE) / 1e6 / (CAST(k AS DOUBLE) - 1.0))
                  / (CAST(sw6 AS DOUBLE) / 1e6
                     / (CAST(nn AS DOUBLE) - k))
                  * 10000 + {_OFF}) AS BIGINT) AS ch_e4
FROM wss CROSS JOIN bss
WHERE k >= 2 AND sw6 > 0
"""



# ---------------------------------------------------------------------------
# pinball_loss — quantile-forecast backtest with pinball loss + coverage
# ---------------------------------------------------------------------------
# Koenker & Bassett (Econometrica 46, 1978) check loss / the M4
# competition's quantile eval: split daily counts 70/30 by calendar,
# forecast the q10/q50/q90 of the test days by the TRAIN empirical
# quantiles (exact inverse-CDF order statistics on the value domain),
# and score pinball loss plus central-interval coverage.  With integer
# weights (w, 10 - w) the per-day pinball x10 is an exact integer, so
# every mean is scaled from exact BIGINT sums.


def q_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    split = F.col("d0") + F.floor((F.col("d1") - F.col("d0")) * 7 / 10) + 1
    daily = daily.join(F.broadcast(span), "event_type").withColumn(
        "is_train", (F.col("day") < split).cast("long")
    )
    tr = daily.filter(F.col("is_train") == 1)
    cnt = tr.groupBy("event_type", "y").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("y")
    wn = Window.partitionBy("event_type")
    cum = cnt.withColumn(
        "cum", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("c").over(wn))
    qs = None
    for name, num in (("q10", 10), ("q50", 50), ("q90", 90)):
        k = F.expr(f"((tot - 1) * {num}) div 100") + 1
        sel = cum.filter(
            ((F.col("cum") - F.col("c")) < k) & (k <= F.col("cum"))
        ).select("event_type", F.col("y").alias(name))
        qs = sel if qs is None else qs.join(sel, "event_type")
    te = daily.filter(F.col("is_train") == 0).join(
        F.broadcast(qs), "event_type"
    )

    def pb(f, w):
        return F.when(
            F.col("y") >= F.col(f), (F.col("y") - F.col(f)) * w
        ).otherwise((F.col(f) - F.col("y")) * (10 - w))

    agg = te.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.max("q10").alias("q10"),
        F.max("q50").alias("q50"),
        F.max("q90").alias("q90"),
        F.sum(pb("q10", 1)).alias("p1"),
        F.sum(pb("q50", 5)).alias("p5"),
        F.sum(pb("q90", 9)).alias("p9"),
        F.sum(
            (
                (F.col("y") >= F.col("q10")) & (F.col("y") <= F.col("q90"))
            ).cast("long")
        ).alias("nc"),
    )
    nt = F.col("n_test").cast("double")
    return agg.filter(F.col("n_test") >= 2).select(
        "event_type",
        F.col("n_test").cast("long").alias("n_test"),
        F.col("q10").cast("long").alias("q10"),
        F.col("q50").cast("long").alias("q50"),
        F.col("q90").cast("long").alias("q90"),
        F.floor(F.col("p1").cast("double") / 10.0 / nt * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("pb10_e4"),
        F.floor(F.col("p5").cast("double") / 10.0 / nt * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("pb50_e4"),
        F.floor(F.col("p9").cast("double") / 10.0 / nt * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("pb90_e4"),
        F.floor(F.col("nc").cast("double") / nt * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("cover_e6"),
    ).orderBy("event_type")


SQL_PINBALL = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), span AS (
  SELECT event_type, min(day) AS d0, max(day) AS d1
  FROM daily GROUP BY 1
), lab AS (
  SELECT d.event_type, d.day, d.y,
         CASE WHEN d.day < s.d0 + (s.d1 - s.d0) * 7 // 10 + 1
              THEN 1 ELSE 0 END AS is_train
  FROM daily d JOIN span s ON s.event_type = d.event_type
), cnt AS (
  SELECT event_type, y, count(*) AS c FROM lab WHERE is_train = 1
  GROUP BY 1, 2
), cum AS (
  SELECT event_type, y, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY y) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS tot
  FROM cnt
), q AS (
  SELECT event_type,
         max(CASE WHEN cum - c < ((tot - 1) * 10) // 100 + 1
                   AND ((tot - 1) * 10) // 100 + 1 <= cum
                  THEN y END) AS q10,
         max(CASE WHEN cum - c < ((tot - 1) * 50) // 100 + 1
                   AND ((tot - 1) * 50) // 100 + 1 <= cum
                  THEN y END) AS q50,
         max(CASE WHEN cum - c < ((tot - 1) * 90) // 100 + 1
                   AND ((tot - 1) * 90) // 100 + 1 <= cum
                  THEN y END) AS q90
  FROM cum GROUP BY 1
), te AS (
  SELECT l.event_type, l.y, q.q10, q.q50, q.q90
  FROM lab l JOIN q ON q.event_type = l.event_type
  WHERE l.is_train = 0
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_test,
         CAST(max(q10) AS BIGINT) AS q10,
         CAST(max(q50) AS BIGINT) AS q50,
         CAST(max(q90) AS BIGINT) AS q90,
         CAST(sum(CASE WHEN y >= q10 THEN (y - q10) * 1
                       ELSE (q10 - y) * 9 END) AS BIGINT) AS p1,
         CAST(sum(CASE WHEN y >= q50 THEN (y - q50) * 5
                       ELSE (q50 - y) * 5 END) AS BIGINT) AS p5,
         CAST(sum(CASE WHEN y >= q90 THEN (y - q90) * 9
                       ELSE (q90 - y) * 1 END) AS BIGINT) AS p9,
         CAST(sum(CASE WHEN y >= q10 AND y <= q90 THEN 1 ELSE 0 END)
              AS BIGINT) AS nc
  FROM te GROUP BY 1
)
SELECT event_type, n_test, q10, q50, q90,
       CAST(floor(CAST(p1 AS DOUBLE) / 10.0 / n_test * 10000 + {_OFF})
            AS BIGINT) AS pb10_e4,
       CAST(floor(CAST(p5 AS DOUBLE) / 10.0 / n_test * 10000 + {_OFF})
            AS BIGINT) AS pb50_e4,
       CAST(floor(CAST(p9 AS DOUBLE) / 10.0 / n_test * 10000 + {_OFF})
            AS BIGINT) AS pb90_e4,
       CAST(floor(CAST(nc AS DOUBLE) / n_test * 1000000 + {_OFF})
            AS BIGINT) AS cover_e6
FROM agg
WHERE n_test >= 2
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# local_maxima_stats — strict local maxima of the hourly series
# ---------------------------------------------------------------------------
# Peak census on the row-adjacent hourly count grid: c > prev AND
# c > next (strict, so no tie ambiguity); reports peak count, rate,
# mean height and mean spacing — all exact integers off one window
# with two lags (the spacing uses min/max peak index, exact).


def q_local_maxima_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000))
        .cast("long")
        .alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("h")
    r = (
        hourly.withColumn("i", F.row_number().over(wo))
        .withColumn("pv", F.lag("c").over(wo))
        .withColumn("nx", F.lead("c").over(wo))
    )
    pk = (F.col("pv").isNotNull() & F.col("nx").isNotNull()
          & (F.col("c") > F.col("pv")) & (F.col("c") > F.col("nx")))
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pk.cast("long")).alias("n_peaks"),
        F.sum(F.when(pk, F.col("c"))).alias("sh"),
        F.min(F.when(pk, F.col("i"))).alias("i0"),
        F.max(F.when(pk, F.col("i"))).alias("i1"),
    )
    npk = F.col("n_peaks").cast("double")
    return (
        agg.filter(F.col("n_peaks") >= 2)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_hours"),
            F.col("n_peaks").cast("long").alias("n_peaks"),
            F.floor(npk / F.col("n").cast("double") * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("rate_e6"),
            F.floor(F.col("sh").cast("double") / npk * 100 + F.lit(_OFF))
            .cast("long")
            .alias("mean_height_e2"),
            F.floor(
                (F.col("i1") - F.col("i0")).cast("double") / (npk - 1.0) * 100
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("mean_spacing_e2"),
        )
        .orderBy("event_type")
    )


SQL_LOCAL_MAXIMA = f"""
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
         lag(c) OVER (PARTITION BY event_type ORDER BY h) AS pv,
         lead(c) OVER (PARTITION BY event_type ORDER BY h) AS nx
  FROM hourly
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
                        AND c > pv AND c > nx THEN 1 ELSE 0 END)
              AS BIGINT) AS n_peaks,
         CAST(sum(CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
                        AND c > pv AND c > nx THEN c END)
              AS BIGINT) AS sh,
         CAST(min(CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
                        AND c > pv AND c > nx THEN i END)
              AS BIGINT) AS i0,
         CAST(max(CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
                        AND c > pv AND c > nx THEN i END)
              AS BIGINT) AS i1
  FROM r GROUP BY 1
)
SELECT event_type, n AS n_hours, n_peaks,
       CAST(floor(CAST(n_peaks AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS rate_e6,
       CAST(floor(CAST(sh AS DOUBLE) / n_peaks * 100 + {_OFF})
            AS BIGINT) AS mean_height_e2,
       CAST(floor(CAST(i1 - i0 AS DOUBLE) / (CAST(n_peaks AS DOUBLE) - 1.0)
                  * 100 + {_OFF}) AS BIGINT) AS mean_spacing_e2
FROM agg
WHERE n_peaks >= 2
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# gini_drift — weekly Gini of per-user activity, with OLS drift slope
# ---------------------------------------------------------------------------
# Inequality dynamics: the per-week Gini over user event-counts via
# the sorted-rank identity G = (2 sum i x_(i) - (n+1) sum x)/(n sum x)
# — tie assignments cancel, so row_number ranks keep it EXACT
# rational; the week-over-week OLS slope runs on e9-floored per-week
# Gini (variance_time discipline) and is reported as a constant column
# alongside the weekly rows.


def q_gini_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    week = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / (86_400_000_000 * 7)
    )
    per = ev.groupBy(week.cast("long").alias("wk"), "user_id").agg(
        F.count(F.lit(1)).alias("x")
    )
    wr = Window.partitionBy("wk").orderBy("x", "user_id")
    r = per.withColumn("i", F.row_number().over(wr))
    agg = r.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    g = (
        (2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
        / (F.col("n") * F.col("sx")).cast("double")
    )
    wkly = agg.filter((F.col("n") >= 2) & (F.col("sx") > 0)).select(
        "wk",
        F.col("n").cast("long").alias("n_users"),
        F.col("sx").cast("long").alias("n_events"),
        F.floor(g * 1e9 + F.lit(_OFF)).cast("long").alias("g9"),
    )
    xd = F.col("wk").cast("double")
    yd = F.col("g9").cast("double") / 1e9
    pts = wkly.select(
        "wk",
        "n_users",
        "n_events",
        "g9",
        F.floor(xd * yd * 1e9 + F.lit(_OFF)).cast("long").alias("xy9"),
        (F.col("wk") * F.col("wk")).alias("xx"),
    )
    ols = pts.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("wk").alias("sw"),
        F.sum("g9").alias("sg9"),
        F.sum("xy9").alias("sxy9"),
        F.sum("xx").alias("sxx"),
    )
    md = F.col("m").cast("double")
    sw = F.col("sw").cast("double")
    sg = F.col("sg9").cast("double") / 1e9
    sxy = F.col("sxy9").cast("double") / 1e9
    sxx = F.col("sxx").cast("double")
    den = md * sxx - sw * sw
    slope = (md * sxy - sw * sg) / den
    ols = ols.select(
        F.when(den > 0, F.floor(slope * 1e9 + F.lit(_OFF)))
        .otherwise(F.lit(None))
        .cast("long")
        .alias("slope_e9")
    )
    return (
        pts.crossJoin(F.broadcast(ols))
        .select(
            F.col("wk").cast("long").alias("wk"),
            "n_users",
            "n_events",
            F.floor(F.col("g9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("gini_e6"),
            "slope_e9",
        )
        .orderBy("wk")
    )


SQL_GINI_DRIFT = f"""
WITH per AS (
  SELECT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk, user_id,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), r AS (
  SELECT wk, x,
         CAST(row_number() OVER (PARTITION BY wk ORDER BY x, user_id)
              AS BIGINT) AS i
  FROM per
), agg AS (
  SELECT wk, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(i * x) AS BIGINT) AS six
  FROM r GROUP BY 1
), wkly AS (
  SELECT wk, n, sx,
         CAST(floor(CAST(2 * six - (n + 1) * sx AS DOUBLE)
                    / CAST(n * sx AS DOUBLE) * 1e9 + {_OFF})
              AS BIGINT) AS g9
  FROM agg WHERE n >= 2 AND sx > 0
), pts AS (
  SELECT wk, n, sx, g9,
         CAST(floor(wk * (CAST(g9 AS DOUBLE) / 1e9) * 1e9 + {_OFF})
              AS BIGINT) AS xy9,
         CAST(wk * wk AS BIGINT) AS xx
  FROM wkly
), ols AS (
  SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(wk) AS BIGINT) AS sw,
         CAST(sum(g9) AS BIGINT) AS sg9,
         CAST(sum(xy9) AS BIGINT) AS sxy9,
         CAST(sum(xx) AS BIGINT) AS sxx
  FROM pts
), sl AS (
  SELECT CASE WHEN CAST(m AS DOUBLE) * sxx - CAST(sw AS DOUBLE) * sw > 0
              THEN CAST(floor((CAST(m AS DOUBLE)
                               * (CAST(sxy9 AS DOUBLE) / 1e9)
                               - CAST(sw AS DOUBLE)
                                 * (CAST(sg9 AS DOUBLE) / 1e9))
                              / (CAST(m AS DOUBLE) * sxx
                                 - CAST(sw AS DOUBLE) * sw)
                              * 1e9 + {_OFF}) AS BIGINT)
         END AS slope_e9
  FROM ols
)
SELECT pts.wk, pts.n AS n_users, pts.sx AS n_events,
       CAST(floor(CAST(pts.g9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS gini_e6,
       sl.slope_e9
FROM pts CROSS JOIN sl
ORDER BY pts.wk
"""


# ---------------------------------------------------------------------------
# gap_entropy — Shannon entropy of power-of-two binned inter-event gaps
# ---------------------------------------------------------------------------
# Multi-scale temporal texture: integer-second gaps fall into bins
# [2^k, 2^(k+1)) found by an EXACT integer range join against a
# 40-row broadcast power-of-two table (never floor(log2 .) — libm
# log2 sits exactly on bin edges at powers of two); zero gaps are
# counted separately.  Bin entropy terms e9-floored (bounded <= 40
# bins).


def q_gap_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("event_type").orderBy("s", "event_id")
    g = (
        ev.select("event_type", "event_id", sec.cast("long").alias("s"))
        .withColumn("prev", F.lag("s").over(wo))
        .filter(F.col("prev").isNotNull())
        .select("event_type", (F.col("s") - F.col("prev")).alias("gap"))
    )
    pows = spark.range(0, 40).select(
        F.col("id").cast("long").alias("k"),
        F.pow(F.lit(2.0), F.col("id")).cast("long").alias("lo"),
        F.pow(F.lit(2.0), F.col("id") + 1).cast("long").alias("hi"),
    )
    binned = g.filter(F.col("gap") > 0).join(
        F.broadcast(pows),
        (F.col("gap") >= F.col("lo")) & (F.col("gap") < F.col("hi")),
    )
    cnt = binned.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum((F.col("gap") == 0).cast("long")).alias("n_zero"),
    )
    j = cnt.join(F.broadcast(tot), "event_type")
    t = (F.col("n_gaps") - F.col("n_zero")).cast("double")
    term = (
        F.col("c").cast("double") / t * F.log(t / F.col("c").cast("double"))
    )
    e = j.select(
        "event_type",
        F.floor(term * 1e9 + F.lit(_OFF)).cast("long").alias("e9"),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_bins"), F.sum("e9").alias("s9")
    )
    out = e.join(F.broadcast(tot), "event_type")
    return out.select(
        "event_type",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.col("n_zero").cast("long").alias("n_zero"),
        F.col("n_bins").cast("long").alias("n_bins"),
        F.floor(F.col("s9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("h_e6"),
    ).orderBy("event_type")


SQL_GAP_ENTROPY = f"""
WITH g AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY event_type
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
           AS gap
  FROM events QUALIFY gap IS NOT NULL
), pows AS (
  SELECT k, CAST(pow(2.0, k) AS BIGINT) AS lo,
         CAST(pow(2.0, k + 1) AS BIGINT) AS hi
  FROM (SELECT unnest(generate_series(0, 39)) AS k)
), binned AS (
  SELECT g.event_type, p.k
  FROM g JOIN pows p ON g.gap >= p.lo AND g.gap < p.hi
  WHERE g.gap > 0
), cnt AS (
  SELECT event_type, k, CAST(count(*) AS BIGINT) AS c
  FROM binned GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(CASE WHEN gap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
  FROM g GROUP BY 1
), e AS (
  SELECT cnt.event_type, CAST(count(*) AS BIGINT) AS n_bins,
         CAST(sum(CAST(floor(CAST(cnt.c AS DOUBLE)
                             / (tot.n_gaps - tot.n_zero)
                             * ln(CAST(tot.n_gaps - tot.n_zero AS DOUBLE)
                                  / cnt.c)
                             * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT) AS s9
  FROM cnt JOIN tot ON tot.event_type = cnt.event_type
  GROUP BY 1
)
SELECT e.event_type, tot.n_gaps, tot.n_zero, e.n_bins,
       CAST(floor(CAST(s9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS h_e6
FROM e JOIN tot ON tot.event_type = e.event_type
ORDER BY e.event_type
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "atkinson_index": q_atkinson_index,
    "juilland_d": q_juilland_d,
    "title_edit_dedup": q_title_edit_dedup,
    "logrank_test": q_logrank_test,
    "lorenz_asymmetry": q_lorenz_asymmetry,
    "icc_oneway": q_icc_oneway,
    "adf_test": q_adf_test,
    "dfa_alpha": q_dfa_alpha,
    "gwet_ac1": q_gwet_ac1,
    "pacf_profile": q_pacf_profile,
    "hotelling_t2": q_hotelling_t2,
    "trend_ols_hc0": q_trend_ols_hc0,
    "char_bigram_entropy": q_char_bigram_entropy,
    "silhouette_centroid": q_silhouette_centroid,
    "kendall_w": q_kendall_w,
    "morisita_horn": q_morisita_horn,
    "modularity_q": q_modularity_q,
    "rich_club": q_rich_club,
    "zipf_abbreviation": q_zipf_abbreviation,
    "menzerath_altmann": q_menzerath_altmann,
    "eb_shrinkage": q_eb_shrinkage,
    "hash_collision_audit": q_hash_collision_audit,
    "geometric_fit_gof": q_geometric_fit_gof,
    "bimodality_coeff": q_bimodality_coeff,
    "newey_west_se": q_newey_west_se,
    "fisher_g_test": q_fisher_g_test,
    "davies_bouldin": q_davies_bouldin,
    "calinski_harabasz": q_calinski_harabasz,
    "pinball_loss": q_pinball_loss,
    "local_maxima_stats": q_local_maxima_stats,
    "gini_drift": q_gini_drift,
    "gap_entropy": q_gap_entropy,
}

ORACLE_SQL: dict[str, str] = {
    "atkinson_index": SQL_ATKINSON,
    "juilland_d": SQL_JUILLAND,
    "title_edit_dedup": SQL_TITLE_EDIT,
    "logrank_test": SQL_LOGRANK,
    "lorenz_asymmetry": SQL_LORENZ_ASYM,
    "icc_oneway": SQL_ICC,
    "adf_test": SQL_ADF,
    "dfa_alpha": SQL_DFA,
    "gwet_ac1": SQL_GWET,
    "pacf_profile": SQL_PACF,
    "hotelling_t2": SQL_HOTELLING,
    "trend_ols_hc0": SQL_TREND_HC0,
    "char_bigram_entropy": SQL_CHAR_BIGRAM,
    "silhouette_centroid": SQL_SILHOUETTE,
    "kendall_w": SQL_KENDALL_W,
    "morisita_horn": SQL_MORISITA,
    "modularity_q": _sql_modularity(),
    "rich_club": SQL_RICH_CLUB,
    "zipf_abbreviation": SQL_ZIPF_ABBREV,
    "menzerath_altmann": SQL_MENZERATH,
    "eb_shrinkage": SQL_EB_SHRINK,
    "hash_collision_audit": SQL_HASH_AUDIT,
    "geometric_fit_gof": SQL_GEOMETRIC,
    "bimodality_coeff": SQL_BIMODALITY,
    "newey_west_se": SQL_NEWEY_WEST,
    "fisher_g_test": SQL_FISHER_G,
    "davies_bouldin": SQL_DAVIES_BOULDIN,
    "calinski_harabasz": SQL_CALINSKI,
    "pinball_loss": SQL_PINBALL,
    "local_maxima_stats": SQL_LOCAL_MAXIMA,
    "gini_drift": SQL_GINI_DRIFT,
    "gap_entropy": SQL_GAP_ENTROPY,
}
