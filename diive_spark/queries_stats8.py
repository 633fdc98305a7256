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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF, _documents

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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "atkinson_index": q_atkinson_index,
    "juilland_d": q_juilland_d,
    "title_edit_dedup": q_title_edit_dedup,
    "logrank_test": q_logrank_test,
}

ORACLE_SQL: dict[str, str] = {
    "atkinson_index": SQL_ATKINSON,
    "juilland_d": SQL_JUILLAND,
    "title_edit_dedup": SQL_TITLE_EDIT,
    "logrank_test": SQL_LOGRANK,
}
