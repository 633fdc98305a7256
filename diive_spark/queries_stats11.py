"""Round-4 continuation registry (eleventh battery): extreme-value
tail estimators beyond Hill, KMV distinct sketching against the shared
md5-based 60-bit hash, and survey-design allocation.

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)``, derived
doubles floor-scaled with the house 1/pi offset; order statistics are
exact lower/upper picks on aggregated value domains; shared constants
(hash formula, z literals) enter both engines verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF

# ---------------------------------------------------------------------------
# dekkers_moment — Dekkers-Einmahl-de Haan moment tail estimator
# ---------------------------------------------------------------------------
# Dekkers, Einmahl & de Haan (Ann. Stat. 1989): gamma-hat = M1 + 1 -
# 0.5 / (1 - M1^2/M2) with M_r the r-th moment of log exceedances over
# the k-th upper order statistic — valid for ALL gamma (Hill only for
# gamma > 0).  k = 100; the top-(k+1) ranks ride WindowGroupLimit;
# each row's ln ratio and its square are e9-floored so both moment
# sums are exact integers.


_DM_K = 100


def q_dekkers_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
        "event_id",
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("v").desc(), F.col("event_id").asc()
    )
    top = ev.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= _DM_K + 1
    )
    xk = top.filter(F.col("rk") == _DM_K + 1).select(
        "event_type", F.col("v").alias("xk")
    )
    t = (
        top.filter(F.col("rk") <= _DM_K)
        .join(F.broadcast(xk), "event_type")
        .filter((F.col("v") > 0) & (F.col("xk") > 0))
        .withColumn(
            "l", F.log(F.col("v").cast("double") / F.col("xk"))
        )
        .withColumn(
            "l9", F.floor(F.col("l") * 1e9 + F.lit(_OFF)).cast("long")
        )
        .withColumn(
            "q9",
            F.floor(F.col("l") * F.col("l") * 1e9 + F.lit(_OFF)).cast(
                "long"
            ),
        )
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.max("xk").alias("xk"),
        F.sum("l9").alias("s1"),
        F.sum("q9").alias("s2"),
    )
    m1 = F.col("s1").cast("double") / 1e9 / F.col("k")
    m2 = F.col("s2").cast("double") / 1e9 / F.col("k")
    gamma = m1 + 1.0 - 0.5 / (1.0 - m1 * m1 / m2)
    return (
        agg.filter((F.col("k") == _DM_K) & (F.col("s2") > 0))
        .select(
            "event_type",
            F.col("k").cast("long").alias("k"),
            F.col("xk").cast("long").alias("threshold_centi"),
            F.floor(m1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "m1_e6"
            ),
            F.floor(m2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "m2_e6"
            ),
            F.floor(gamma * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "gamma_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_DEKKERS = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), top AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v DESC, event_id ASC) AS rk
  FROM ev QUALIFY rk <= {_DM_K + 1}
), xk AS (
  SELECT event_type, v AS xk FROM top WHERE rk = {_DM_K + 1}
), t AS (
  SELECT top.event_type, xk.xk,
         ln(CAST(top.v AS DOUBLE) / xk.xk) AS l
  FROM top JOIN xk ON xk.event_type = top.event_type
  WHERE rk <= {_DM_K} AND top.v > 0 AND xk.xk > 0
), agg AS (
  SELECT event_type, count(*) AS k, max(xk) AS xk,
         CAST(sum(CAST(floor(l * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS s1,
         CAST(sum(CAST(floor(l * l * 1e9 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s2
  FROM t GROUP BY 1
), m AS (
  SELECT event_type, k, xk,
         CAST(s1 AS DOUBLE) / 1e9 / k AS m1,
         CAST(s2 AS DOUBLE) / 1e9 / k AS m2, s2
  FROM agg
)
SELECT event_type, CAST(k AS BIGINT) AS k, xk AS threshold_centi,
       CAST(floor(m1 * 1000000 + {_OFF}) AS BIGINT) AS m1_e6,
       CAST(floor(m2 * 1000000 + {_OFF}) AS BIGINT) AS m2_e6,
       CAST(floor((m1 + 1.0 - 0.5 / (1.0 - m1 * m1 / m2)) * 1000000
                  + {_OFF}) AS BIGINT) AS gamma_e6
FROM m
WHERE k = {_DM_K} AND s2 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# pickands_gamma — Pickands quantile-spacing tail estimator
# ---------------------------------------------------------------------------
# Pickands (Ann. Stat. 1975): gamma-hat = ln((x_(k) - x_(2k)) /
# (x_(2k) - x_(4k))) / ln 2 from three upper order statistics, k =
# max(1, n // 40) — location-invariant and valid for all gamma.  The
# three picks come off the descending domain cumulative (exact); one
# ln at the end with the shared ln 2 literal.


import math as _math

_LN2 = _math.log(2.0)


def q_pickands_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    dom = ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    d = dom.withColumn("cc", F.sum("c").over(wo)).withColumn(
        "n", F.sum("c").over(wt)
    )
    k = F.greatest(F.lit(1), F.floor(F.col("n") / 40)).cast("long")
    picks = d.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(k).alias("k"),
        # descending cumulative: cc >= k holds from the k-th largest
        # DOWNWARD, so the pick is the MAX qualifying value
        F.max(F.when(F.col("cc") >= k, F.col("v"))).alias("xk"),
        F.max(F.when(F.col("cc") >= 2 * k, F.col("v"))).alias("x2k"),
        F.max(F.when(F.col("cc") >= 4 * k, F.col("v"))).alias("x4k"),
    )
    num = (F.col("xk") - F.col("x2k")).cast("double")
    den = (F.col("x2k") - F.col("x4k")).cast("double")
    gamma = F.log(num / den) / _LN2
    return (
        picks.filter(
            (F.col("n") >= 4 * F.col("k"))
            & (F.col("xk") > F.col("x2k"))
            & (F.col("x2k") > F.col("x4k"))
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k"),
            F.col("xk").cast("long").alias("xk_centi"),
            F.col("x2k").cast("long").alias("x2k_centi"),
            F.col("x4k").cast("long").alias("x4k_centi"),
            F.floor(gamma * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "gamma_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_PICKANDS = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dom AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), d AS (
  SELECT event_type, v,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v DESC)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dom
), d2 AS (
  SELECT event_type, v, cc, n,
         greatest(1, n // 40) AS k
  FROM d
), picks AS (
  SELECT event_type, max(n) AS n, max(k) AS k,
         max(CASE WHEN cc >= k THEN v END) AS xk,
         max(CASE WHEN cc >= 2 * k THEN v END) AS x2k,
         max(CASE WHEN cc >= 4 * k THEN v END) AS x4k
  FROM d2 GROUP BY 1
)
SELECT event_type, n, k, xk AS xk_centi, x2k AS x2k_centi,
       x4k AS x4k_centi,
       CAST(floor(ln(CAST(xk - x2k AS DOUBLE) / (x2k - x4k))
                  / {_LN2!r} * 1000000 + {_OFF}) AS BIGINT)
         AS gamma_e6
FROM picks
WHERE n >= 4 * k AND xk > x2k AND x2k > x4k
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# kmv_distinct — k-minimum-values distinct sketch vs exact
# ---------------------------------------------------------------------------
# Bar-Yossef et al. (RANDOM 2002): with k minimum hash values over a
# 2^60 hash space, D-hat = (k-1) 2^60 / h_(k).  The hash is the
# repo's shared md5-based 60-bit formula (text/dedup.py::_h60 and its
# DuckDB twin), so both engines sketch IDENTICAL hash streams — the
# estimate, the exact distinct count and the relative error are all
# deterministic.  k = 32.


_KMV_K = 32
_H60_SPACE = float(1 << 60)


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.dedup import _h60

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    hashed = ev.select(
        "event_type", _h60(F.col("uid")).alias("h")
    ).distinct()
    wr = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    kth = (
        hashed.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == _KMV_K)
        .select("event_type", F.col("h").alias("hk"))
    )
    exact = hashed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    j = exact.join(kth, "event_type")
    est = (_KMV_K - 1) * _H60_SPACE / F.col("hk").cast("double")
    err = (est - F.col("exact_distinct").cast("double")) / F.col(
        "exact_distinct"
    )
    return j.select(
        "event_type",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.col("hk").cast("long").alias("h_k"),
        F.floor(est * 100 + F.lit(_OFF)).cast("long").alias(
            "kmv_est_e2"
        ),
        F.floor(err * 10_000 + F.lit(_OFF)).cast("long").alias(
            "err_e4"
        ),
    ).orderBy("event_type")


SQL_KMV = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
  FROM events
), kth AS (
  SELECT event_type, h AS hk
  FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h ASC)
             AS rk
    FROM hashed
  ) WHERE rk = {_KMV_K}
), exact AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS exact_distinct
  FROM hashed GROUP BY 1
)
SELECT exact.event_type, exact_distinct, hk AS h_k,
       CAST(floor({_KMV_K - 1} * {_H60_SPACE!r}
                  / CAST(hk AS DOUBLE) * 100 + {_OFF}) AS BIGINT)
         AS kmv_est_e2,
       CAST(floor(({_KMV_K - 1} * {_H60_SPACE!r}
                   / CAST(hk AS DOUBLE) - exact_distinct)
                  / exact_distinct * 10000 + {_OFF}) AS BIGINT)
         AS err_e4
FROM exact JOIN kth ON kth.event_type = exact.event_type
ORDER BY exact.event_type
"""


# ---------------------------------------------------------------------------
# neyman_allocation — optimal stratified-sample allocation by source
# ---------------------------------------------------------------------------
# Neyman (JRSS 1934): for a fixed budget n, allocate n_h proportional
# to N_h S_h — the design a 100 TB corpus sampler runs before drawing
# a quality-audit sample.  Strata = sources, variable = n_chars.
# N_h S_h terms are e2-floored per stratum so the total is an exact
# integer sum; budget 1000.


_NEYMAN_BUDGET = 1000


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    nd = F.col("nh").cast("double")
    sd = F.sqrt(
        (
            nd * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (nd * (nd - 1.0))
    )
    agg = agg.filter(F.col("nh") >= 2).withColumn(
        "w2", F.floor(nd * sd * 100 + F.lit(_OFF)).cast("long")
    )
    wall = Window.partitionBy()
    agg = agg.withColumn("tot2", F.sum("w2").over(wall))
    alloc = (
        F.col("w2").cast("double")
        / F.col("tot2")
        * float(_NEYMAN_BUDGET)
    )
    return agg.select(
        "source",
        F.col("nh").cast("long").alias("n_docs"),
        F.floor(sd * 100 + F.lit(_OFF)).cast("long").alias("sd_e2"),
        F.col("w2").cast("long").alias("nh_sh_e2"),
        F.floor(alloc * 100 + F.lit(_OFF)).cast("long").alias(
            "alloc_e2"
        ),
    ).orderBy("source")


SQL_NEYMAN = f"""
WITH agg AS (
  SELECT source, count(*) AS nh,
         CAST(sum(n_chars) AS BIGINT) AS s,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS q
  FROM documents GROUP BY 1
), f AS (
  SELECT source, nh,
         sqrt((CAST(nh AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
              / (CAST(nh AS DOUBLE) * (nh - 1.0))) AS sd
  FROM agg WHERE nh >= 2
), w AS (
  SELECT source, nh, sd,
         CAST(floor(CAST(nh AS DOUBLE) * sd * 100 + {_OFF}) AS BIGINT)
           AS w2
  FROM f
), t AS (
  SELECT source, nh, sd, w2,
         CAST(sum(w2) OVER () AS BIGINT) AS tot2
  FROM w
)
SELECT source, CAST(nh AS BIGINT) AS n_docs,
       CAST(floor(sd * 100 + {_OFF}) AS BIGINT) AS sd_e2,
       w2 AS nh_sh_e2,
       CAST(floor(CAST(w2 AS DOUBLE) / tot2 * {_NEYMAN_BUDGET}.0 * 100
                  + {_OFF}) AS BIGINT) AS alloc_e2
FROM t
ORDER BY source
"""


# ---------------------------------------------------------------------------
# morph_productivity — Baayen's productivity P for common suffixes
# ---------------------------------------------------------------------------
# Baayen (Linguistics 1992): P = n1 / N — the share of hapax
# legomena among a suffix's tokens estimates how productive the
# morphological process still is.  Suffix family {'ing', 'ed', 'ly',
# 'er', 's'} with longest-match-first assignment (literal CASE
# ladder, identical in both engines); exact counting throughout.


def q_morph_productivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") >= 4)
    w = F.lower(F.col("w"))
    suf = (
        F.when(w.endswith("ing"), F.lit("ing"))
        .when(w.endswith("ed"), F.lit("ed"))
        .when(w.endswith("ly"), F.lit("ly"))
        .when(w.endswith("er"), F.lit("er"))
        .when(w.endswith("s"), F.lit("s"))
    )
    t = toks.withColumn("suffix", suf).filter(
        F.col("suffix").isNotNull()
    )
    freq = t.groupBy("lang", "suffix", w.alias("wl")).agg(
        F.count(F.lit(1)).alias("m")
    )
    agg = freq.groupBy("lang", "suffix").agg(
        F.sum("m").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("m") == 1).cast("long")).alias("n_hapax"),
    )
    p = F.col("n_hapax").cast("double") / F.col("n_tokens")
    return agg.select(
        "lang",
        "suffix",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_hapax").cast("long").alias("n_hapax"),
        F.floor(p * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "productivity_e6"
        ),
    ).orderBy("lang", "suffix")


SQL_MORPH = f"""
WITH toks AS (
  SELECT lang,
         lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS w
  FROM documents
), t AS (
  SELECT lang, w,
         CASE WHEN w LIKE '%ing' THEN 'ing'
              WHEN w LIKE '%ed' THEN 'ed'
              WHEN w LIKE '%ly' THEN 'ly'
              WHEN w LIKE '%er' THEN 'er'
              WHEN w LIKE '%s' THEN 's' END AS suffix
  FROM toks WHERE len(w) >= 4
), f AS (
  SELECT lang, suffix, w, count(*) AS m
  FROM t WHERE suffix IS NOT NULL
  GROUP BY 1, 2, 3
), agg AS (
  SELECT lang, suffix,
         CAST(sum(m) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax
  FROM f GROUP BY 1, 2
)
SELECT lang, suffix, n_tokens, n_types, n_hapax,
       CAST(floor(CAST(n_hapax AS DOUBLE) / n_tokens * 1000000
                  + {_OFF}) AS BIGINT) AS productivity_e6
FROM agg
ORDER BY lang, suffix
"""


# ---------------------------------------------------------------------------
# concentration_index — value concentration over the activity ranking
# ---------------------------------------------------------------------------
# The health-economics concentration index (Kakwani; Wagstaff et al.
# 1991): C = 2 sum(r_i y_i) / (n sum y) - (n + 1)/n with users RANKED
# BY EVENT COUNT (not by y) — is value concentrated among the most
# active users?  Tie-safe via exact 2x midranks on the count domain
# (the kruskal_wallis discipline); everything before the final
# expression is exact BIGINT.


def q_concentration_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = ev.groupBy(
        F.col("user_id").cast("long").alias("user_id")
    ).agg(
        F.count(F.lit(1)).alias("a"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("y"),
    )
    wr = Window.orderBy("a")
    wt = Window.partitionBy("a")
    r = per.withColumn("minrk", F.rank().over(wr)).withColumn(
        "t", F.count(F.lit(1)).over(wt)
    )
    r = r.withColumn("rk2", 2 * F.col("minrk") + F.col("t") - 1)
    agg = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("rk2") * F.col("y")).alias("sry2"),
    )
    nd = F.col("n").cast("double")
    c = F.col("sry2").cast("double") / (
        nd * F.col("sy").cast("double")
    ) - (nd + 1.0) / nd
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("sy").cast("long").alias("total_value_centi"),
        F.floor(c * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "conc_index_e6"
        ),
    )


SQL_CONCENTRATION = f"""
WITH per AS (
  SELECT user_id, count(*) AS a,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS y
  FROM events GROUP BY 1
), r AS (
  SELECT y,
         2 * rank() OVER (ORDER BY a)
           + count(*) OVER (PARTITION BY a) - 1 AS rk2
  FROM per
), agg AS (
  SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(rk2 * y) AS BIGINT) AS sry2
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_users, sy AS total_value_centi,
       CAST(floor((CAST(sry2 AS DOUBLE) / (CAST(n AS DOUBLE) * sy)
                   - (n + 1.0) / n) * 1000000 + {_OFF}) AS BIGINT)
         AS conc_index_e6
FROM agg
"""


# ---------------------------------------------------------------------------
# map_at_k — mean average precision@5 of label retrieval
# ---------------------------------------------------------------------------
# The IR view of embedding quality: treat each point's label-blocked…
# no — each point queries the FULL corpus (blocked by nothing would be
# all-pairs); instead each point's candidate set is its own label plus
# the nearest rival label's points via centroids?  To stay in the
# audited all-pairs-free posture, candidates are the point's own label
# and the centroid-nearest OTHER label (two blocks), ranked by 6-dp
# distance with the cand_id tie-break; AP@5 uses the label-match
# indicator.  Per-point AP is e6-floored; per-label mAP is an exact
# integer mean.


_MAP_K = 5


def q_map_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats8 import _centroids
    from diive_spark.text.similarity import l2sq_pair_udf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    cent = _centroids(emb)
    c2 = cent.select(
        F.col("label").alias("label_r"), F.col("carr").alias("carr_r")
    )
    rival = (
        cent.crossJoin(F.broadcast(c2))
        .filter(F.col("label") != F.col("label_r"))
        .select(
            "label",
            "label_r",
            F.round(
                l2sq_pair_udf(F.col("carr"), F.col("carr_r")), 6
            ).alias("cd"),
        )
    )
    wrv = Window.partitionBy("label").orderBy(
        F.col("cd").asc(), F.col("label_r").asc()
    )
    nearest = (
        rival.withColumn("rk", F.row_number().over(wrv))
        .filter(F.col("rk") == 1)
        .select("label", F.col("label_r").alias("rival"))
    )
    # round-4 bench-tail repair: candidates (own + rival label) come
    # from the shared _l2_topk_rows kernel with an allowed-labels map
    # (rival rows are a bounded k-row collect); the rounded ordering
    # below and the oracle are unchanged.
    from diive_spark.queries_embeddings import _l2_topk_rows

    rmap = {
        int(r["label"]): (int(r["label"]), int(r["rival"]))
        for r in nearest.collect()
    }
    pairs = _l2_topk_rows(
        spark, sf_dir, _MAP_K, allowed=rmap
    ).select(
        "label",
        "vec_id",
        "cand_id",
        F.col("cand_label").alias("clabel"),
        F.round(F.col("d2raw"), 6).alias("d2"),
    )
    wo = Window.partitionBy("label", "vec_id").orderBy(
        F.col("d2").asc(), F.col("cand_id").asc()
    )
    topk = pairs.withColumn("rk", F.row_number().over(wo)).filter(
        F.col("rk") <= _MAP_K
    )
    wk = Window.partitionBy("label", "vec_id").orderBy("rk")
    topk = topk.withColumn(
        "hit", (F.col("clabel") == F.col("label")).cast("long")
    ).withColumn(
        "cumhit",
        F.sum("hit").over(
            wk.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    perq = topk.groupBy("label", "vec_id").agg(
        F.sum("hit").alias("nrel"),
        F.sum(
            F.when(
                F.col("hit") == 1,
                F.col("cumhit").cast("double") / F.col("rk"),
            ).otherwise(F.lit(0.0))
        ).alias("apsum"),
        F.count(F.lit(1)).alias("kk"),
    )
    ap6 = F.floor(
        F.when(
            F.col("nrel") > 0, F.col("apsum") / F.col("nrel")
        ).otherwise(F.lit(0.0))
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    agg = perq.filter(F.col("kk") == _MAP_K).select(
        "label", ap6.alias("ap6")
    ).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("ap6").alias("sap6"),
    )
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("n_queries").cast("long").alias("n_queries"),
        F.floor(
            F.col("sap6").cast("double") / F.col("n_queries")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("map_e6"),
    ).orderBy("label")


SQL_MAP_AT_K = f"""
WITH {{cent}},
rival AS (
  SELECT label, rival FROM (
    SELECT a.label, b.label AS rival,
           row_number() OVER (
             PARTITION BY a.label
             ORDER BY round(list_sum(list_transform(
               generate_series(1, len(a.carr)),
               i -> (a.carr[i] - b.carr[i]) * (a.carr[i] - b.carr[i])
             )), 6) ASC, b.label ASC) AS rk
    FROM cent a JOIN cent b ON b.label <> a.label
  ) WHERE rk = 1
), pairs AS (
  SELECT e.label, e.vec_id, c.vec_id AS cand_id, c.label AS clabel,
         round(list_sum(list_transform(
           generate_series(1, len(e.embedding)),
           i -> (CAST(e.embedding[i] AS DOUBLE)
                 - CAST(c.embedding[i] AS DOUBLE))
                * (CAST(e.embedding[i] AS DOUBLE)
                   - CAST(c.embedding[i] AS DOUBLE)))), 6) AS d2
  FROM embeddings e
  JOIN rival ON rival.label = e.label
  JOIN embeddings c
    ON (c.label = e.label OR c.label = rival.rival)
   AND c.vec_id <> e.vec_id
), topk AS (
  SELECT label, vec_id, clabel,
         row_number() OVER (PARTITION BY label, vec_id
                            ORDER BY d2 ASC, cand_id ASC) AS rk
  FROM pairs QUALIFY rk <= {_MAP_K}
), hits AS (
  SELECT label, vec_id, rk,
         CASE WHEN clabel = label THEN 1 ELSE 0 END AS hit,
         CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END)
              OVER (PARTITION BY label, vec_id ORDER BY rk)
              AS BIGINT) AS cumhit
  FROM topk
), perq AS (
  SELECT label, vec_id,
         CAST(sum(hit) AS BIGINT) AS nrel,
         sum(CASE WHEN hit = 1
                  THEN CAST(cumhit AS DOUBLE) / rk ELSE 0.0 END)
           AS apsum,
         count(*) AS kk
  FROM hits GROUP BY 1, 2
), ap AS (
  SELECT label,
         CAST(floor(CASE WHEN nrel > 0 THEN apsum / nrel
                         ELSE 0.0 END * 1e6 + {_OFF}) AS BIGINT)
           AS ap6
  FROM perq WHERE kk = {_MAP_K}
), agg AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_queries,
         CAST(sum(ap6) AS BIGINT) AS sap6
  FROM ap GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label, n_queries,
       CAST(floor(CAST(sap6 AS DOUBLE) / n_queries + {_OFF})
            AS BIGINT) AS map_e6
FROM agg
ORDER BY label
"""


# ---------------------------------------------------------------------------
# trie_branching — character-trie branching factors per language
# ---------------------------------------------------------------------------
# Vocabulary-structure census: the average branching factor at trie
# depth d is |distinct (d+1)-prefixes| / |distinct d-prefixes| over
# the word types — a compact signature of orthographic entropy
# (complements char_entropy_lang, which is token-weighted).  Exact
# distinct counting at depths 1-3.


def q_trie_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = (
        _documents(spark, sf_dir)
        .select(
            "lang",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w0"),
        )
        .select("lang", F.lower("w0").alias("w"))
        .filter(F.length("w") >= 4)
        .distinct()
    )
    agg = toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.countDistinct(F.substring("w", 1, 1)).alias("p1"),
        F.countDistinct(F.substring("w", 1, 2)).alias("p2"),
        F.countDistinct(F.substring("w", 1, 3)).alias("p3"),
        F.countDistinct(F.substring("w", 1, 4)).alias("p4"),
    )
    return agg.select(
        "lang",
        F.col("n_types").cast("long").alias("n_types"),
        F.col("p1").cast("long").alias("p1"),
        F.col("p2").cast("long").alias("p2"),
        F.col("p3").cast("long").alias("p3"),
        F.floor(
            F.col("p2").cast("double") / F.col("p1") * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("b1_e4"),
        F.floor(
            F.col("p3").cast("double") / F.col("p2") * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("b2_e4"),
        F.floor(
            F.col("p4").cast("double") / F.col("p3") * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("b3_e4"),
    ).orderBy("lang")


SQL_TRIE = f"""
WITH toks AS (
  SELECT DISTINCT lang,
         lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS w
  FROM documents
), f AS (
  SELECT lang, w FROM toks WHERE len(w) >= 4
), agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(count(DISTINCT substr(w, 1, 1)) AS BIGINT) AS p1,
         CAST(count(DISTINCT substr(w, 1, 2)) AS BIGINT) AS p2,
         CAST(count(DISTINCT substr(w, 1, 3)) AS BIGINT) AS p3,
         CAST(count(DISTINCT substr(w, 1, 4)) AS BIGINT) AS p4
  FROM f GROUP BY 1
)
SELECT lang, n_types, p1, p2, p3,
       CAST(floor(CAST(p2 AS DOUBLE) / p1 * 10000 + {_OFF}) AS BIGINT)
         AS b1_e4,
       CAST(floor(CAST(p3 AS DOUBLE) / p2 * 10000 + {_OFF}) AS BIGINT)
         AS b2_e4,
       CAST(floor(CAST(p4 AS DOUBLE) / p3 * 10000 + {_OFF}) AS BIGINT)
         AS b3_e4
FROM agg
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# gesd_outliers — generalized ESD statistics, 3 unrolled rounds
# ---------------------------------------------------------------------------
# Rosner (Technometrics 1983): iteratively remove the most extreme
# point and recompute R_r = max |x - mean| / sd — the multi-outlier
# fix for Grubbs' masking problem.  THREE fixed rounds by contract
# (markov_stationary unrolled-iteration precedent); argmax tie-break
# by day; means/sds off exact integer sums of the shrinking set.
# Critical values need t-quantiles (unavailable in-engine), so the
# census reports the R statistics themselves.


def q_gesd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    out_rows = []
    cur = daily
    for r in range(1, 4):
        wt = Window.partitionBy("event_type")
        d = (
            cur.withColumn("n", F.count(F.lit(1)).over(wt))
            .withColumn("s", F.sum("y").over(wt))
            .withColumn("q", F.sum(F.col("y") * F.col("y")).over(wt))
        )
        nd = F.col("n").cast("double")
        mean = F.col("s").cast("double") / nd
        sd = F.sqrt(
            (
                nd * F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double")
            )
            / (nd * (nd - 1.0))
        )
        d = d.withColumn("dev", F.abs(F.col("y").cast("double") - mean))
        wr = Window.partitionBy("event_type").orderBy(
            F.col("dev").desc(), F.col("day").asc()
        )
        d = d.withColumn("rk", F.row_number().over(wr)).withColumn(
            "rstat", F.col("dev") / sd
        )
        hit = d.filter(F.col("rk") == 1).select(
            "event_type",
            F.lit(r).cast("long").alias("round"),
            F.col("day").alias("day"),
            F.col("y").cast("long").alias("y"),
            F.floor(F.col("rstat") * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("r_e4"),
        )
        out_rows.append(hit)
        cur = d.filter(F.col("rk") > 1).select("event_type", "day", "y")
    out = out_rows[0]
    for h in out_rows[1:]:
        out = out.unionByName(h)
    return out.orderBy("event_type", "round")


def _gesd_round_sql(src: str, r: int) -> str:
    return f"""
stat{r} AS (
  SELECT event_type, day, y,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS s,
         CAST(sum(y * y) OVER (PARTITION BY event_type) AS BIGINT)
           AS q
  FROM {src}
), dev{r} AS (
  SELECT event_type, day, y,
         abs(y - CAST(s AS DOUBLE) / n) AS dev,
         sqrt((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
              / (CAST(n AS DOUBLE) * (n - 1.0))) AS sd,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(y - CAST(s AS DOUBLE) / n)
                                     DESC, day ASC) AS rk
  FROM stat{r}
), hit{r} AS (
  SELECT event_type, CAST({r} AS BIGINT) AS round, day,
         CAST(y AS BIGINT) AS y,
         CAST(floor(dev / sd * 10000 + {_OFF}) AS BIGINT) AS r_e4
  FROM dev{r} WHERE rk = 1
), rest{r} AS (
  SELECT event_type, day, y FROM dev{r} WHERE rk > 1
)"""


SQL_GESD = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
{_gesd_round_sql('daily', 1)},
{_gesd_round_sql('rest1', 2)},
{_gesd_round_sql('rest2', 3)}
SELECT * FROM hit1
UNION ALL SELECT * FROM hit2
UNION ALL SELECT * FROM hit3
ORDER BY event_type, round
"""


# ---------------------------------------------------------------------------
# ttt_statistic — total-time-on-test exponentiality / IFR test
# ---------------------------------------------------------------------------
# Barlow & Campo (1975) / Epstein: the scaled TTT statistic V = sum_j
# TTT_j / TTT_n over j = 1..n-1 equals (n-1)/2 in expectation under
# the exponential renewal null; V >> implies increasing failure rate
# of inter-event gaps.  TTT_j = sum_{{i<=j}} x_(i) + (n-j) x_(j) is
# exact-integer off the ascending gap domain; the cumulative-of-
# cumulatives folds exactly; one division at the end.


def q_ttt_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
        "event_id",
    )
    wo = Window.partitionBy("event_type").orderBy("s", "event_id")
    g = ev.withColumn("g", F.col("s") - F.lag("s").over(wo)).filter(
        F.col("g").isNotNull() & (F.col("g") > 0)
    )
    dom = g.groupBy("event_type", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    d = (
        dom.withColumn("cc", F.sum("c").over(wv))
        .withColumn("cs", F.sum(F.col("c") * F.col("g")).over(wv))
        .withColumn("n", F.sum("c").over(wt))
        .withColumn("tot", F.sum(F.col("c") * F.col("g")).over(wt))
    )
    # TTT at the END of each tie block j (rank cc): cs + (n - cc) g.
    # Within a tie block of c equal gaps the TTT values at the c
    # interior ranks are cs_prev + m g + (n - cc_prev - m) g ... all
    # equal to cs_prev + (n - cc_prev) g ... no: TTT_j at rank
    # j = cc_prev + m is cs_prev + m g + (n - j) g = cs_prev +
    # (n - cc_prev) g for every m — constant within the block, so
    # the block contributes c * (cs_prev + (n - cc_prev) g) with the
    # LAST block dropping its final rank (j runs to n-1).
    blk = (
        F.col("cs")
        - F.col("c") * F.col("g")
        + (F.col("n") - F.col("cc") + F.col("c")) * F.col("g")
    )
    cnt_eff = F.when(
        F.col("cc") == F.col("n"), F.col("c") - 1
    ).otherwise(F.col("c"))
    agg = d.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("tot").alias("tot"),
        F.sum(cnt_eff * blk).alias("sttt"),
    )
    v = F.col("sttt").cast("double") / F.col("tot")
    e = (F.col("n") - 1).cast("double") / 2.0
    # Var(V) = (n-1)/12 under the exponential null
    z = (v - e) / F.sqrt((F.col("n") - 1).cast("double") / 12.0)
    return (
        agg.filter(F.col("n") >= 3)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_gaps"),
            F.col("tot").cast("long").alias("ttt_total_s"),
            F.floor(v * 10_000 + F.lit(_OFF)).cast("long").alias(
                "v_e4"
            ),
            F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias(
                "z_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_TTT = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id
  FROM events
), gaps AS (
  SELECT event_type,
         s - lag(s) OVER (PARTITION BY event_type
                          ORDER BY s, event_id) AS g
  FROM ev
), dom AS (
  SELECT event_type, g, CAST(count(*) AS BIGINT) AS c
  FROM gaps WHERE g IS NOT NULL AND g > 0
  GROUP BY 1, 2
), d AS (
  SELECT event_type, g, c,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY g)
              AS BIGINT) AS cc,
         CAST(sum(c * g) OVER (PARTITION BY event_type ORDER BY g)
              AS BIGINT) AS cs,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(sum(c * g) OVER (PARTITION BY event_type) AS BIGINT)
           AS tot
  FROM dom
), agg AS (
  SELECT event_type, max(n) AS n, max(tot) AS tot,
         CAST(sum((CASE WHEN cc = n THEN c - 1 ELSE c END)
                  * (cs - c * g + (n - cc + c) * g)) AS BIGINT)
           AS sttt
  FROM d GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       tot AS ttt_total_s,
       CAST(floor(CAST(sttt AS DOUBLE) / tot * 10000 + {_OFF})
            AS BIGINT) AS v_e4,
       CAST(floor((CAST(sttt AS DOUBLE) / tot - (n - 1.0) / 2.0)
                  / sqrt((n - 1.0) / 12.0) * 10000 + {_OFF})
            AS BIGINT) AS z_e4
FROM agg
WHERE n >= 3
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# last_digit_bias — terminal-digit uniformity (rounding forensics)
# ---------------------------------------------------------------------------
# The classic data-entry / rounding tripwire (complement to the
# Benford family, which tests LEADING digits): the final centivalue
# digit should be uniform on 0-9; chi-square against 1/10 plus the
# 0/5 round-number excess share.  Pure exact counting.


def q_last_digit_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long") % 10
        ).alias("d"),
    )
    cnt = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("c")
    )
    wt = Window.partitionBy("event_type")
    cnt = cnt.withColumn("n", F.sum("c").over(wt))
    e = F.col("n").cast("double") / 10.0
    chi6 = F.floor(
        (F.col("c").cast("double") - e) * (F.col("c") - e) / e * 1e6
        + F.lit(_OFF)
    ).cast("long")
    agg = cnt.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(chi6).alias("chi6"),
        F.sum(
            F.when(F.col("d").isin(0, 5), F.col("c")).otherwise(0)
        ).alias("round05"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("chi6").cast("double") / 100.0 + F.lit(_OFF))
        .cast("long")
        .alias("chi2_e4"),
        F.col("round05").cast("long").alias("n_digit_0_or_5"),
        F.floor(
            F.col("round05").cast("double") / F.col("n") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("round_share_e6"),
    ).orderBy("event_type")


SQL_LAST_DIGIT = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) % 10 AS d
  FROM events
), cnt AS (
  SELECT event_type, d, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(count(*)) OVER (PARTITION BY event_type) AS BIGINT)
           AS n
  FROM ev GROUP BY 1, 2
), agg AS (
  SELECT event_type, max(n) AS n,
         CAST(sum(CAST(floor((c - CAST(n AS DOUBLE) / 10.0)
                             * (c - CAST(n AS DOUBLE) / 10.0)
                             / (CAST(n AS DOUBLE) / 10.0) * 1e6
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS chi6,
         CAST(sum(CASE WHEN d IN (0, 5) THEN c ELSE 0 END) AS BIGINT)
           AS round05
  FROM cnt GROUP BY 1
)
SELECT event_type, n,
       CAST(floor(CAST(chi6 AS DOUBLE) / 100.0 + {_OFF}) AS BIGINT)
         AS chi2_e4,
       round05 AS n_digit_0_or_5,
       CAST(floor(CAST(round05 AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS round_share_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# shorrocks_mobility — weekly activity-quintile mobility index
# ---------------------------------------------------------------------------
# Shorrocks (Econometrica 1978): M = (k - trace(P)) / (k - 1) on the
# quintile transition matrix — how much users move between weekly
# activity quintiles.  Quintiles are exact rank arithmetic per week
# (ceil(5 rank / n), rank by (count, user_id) — deterministic
# tie-break); transition counts exact; the trace ratio per row is the
# only division.


def q_shorrocks_mobility(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
            / 7
        )
        .cast("long")
        .alias("week"),
    )
    per = ev.groupBy("week", "user_id").agg(
        F.count(F.lit(1)).alias("a")
    )
    wr = Window.partitionBy("week").orderBy("a", "user_id")
    wn = Window.partitionBy("week")
    q = per.withColumn("rk", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    ).withColumn(
        "quint",
        F.ceil(5.0 * F.col("rk") / F.col("n")).cast("long"),
    )
    nxt = q.select(
        (F.col("week") - 1).alias("week"),
        "user_id",
        F.col("quint").alias("quint_next"),
    )
    tr = q.join(nxt, ["week", "user_id"]).groupBy(
        "quint", "quint_next"
    ).agg(F.count(F.lit(1)).alias("c"))
    wall = Window.partitionBy()
    agg = tr.agg(
        F.sum("c").alias("n_trans"),
        F.sum(
            F.when(F.col("quint") == F.col("quint_next"), F.col("c"))
            .otherwise(0)
        ).alias("n_stay"),
    )
    # trace(P) = sum_q P_qq needs row-normalized shares; fold per-row
    rows = tr.groupBy("quint").agg(F.sum("c").alias("rowsum"))
    diag = tr.filter(F.col("quint") == F.col("quint_next")).select(
        "quint", F.col("c").alias("cdiag")
    )
    pq = rows.join(diag, "quint", "left").fillna(0, ["cdiag"])
    pq6 = pq.select(
        F.floor(
            F.col("cdiag").cast("double") / F.col("rowsum") * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("p6")
    )
    trace = pq6.agg(
        F.count(F.lit(1)).alias("k"), F.sum("p6").alias("tr6")
    )
    j = agg.crossJoin(F.broadcast(trace))
    kd = F.col("k").cast("double")
    m = (kd - F.col("tr6").cast("double") / 1e6) / (kd - 1.0)
    return j.select(
        F.col("n_trans").cast("long").alias("n_transitions"),
        F.col("n_stay").cast("long").alias("n_stay"),
        F.col("k").cast("long").alias("k_quintiles"),
        F.floor(F.col("tr6").cast("double") / 100.0 + F.lit(_OFF))
        .cast("long")
        .alias("trace_e4"),
        F.floor(m * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "shorrocks_e6"
        ),
    )


SQL_SHORROCKS = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS week
  FROM events
), per AS (
  SELECT week, user_id, CAST(count(*) AS BIGINT) AS a
  FROM ev GROUP BY 1, 2
), q AS (
  SELECT week, user_id,
         CAST(ceil(5.0 * row_number()
                   OVER (PARTITION BY week ORDER BY a, user_id)
                   / count(*) OVER (PARTITION BY week)) AS BIGINT)
           AS quint
  FROM per
), tr AS (
  SELECT a.quint, b.quint AS quint_next, CAST(count(*) AS BIGINT) AS c
  FROM q a JOIN q b
    ON b.user_id = a.user_id AND b.week = a.week + 1
  GROUP BY 1, 2
), agg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_trans,
         CAST(sum(CASE WHEN quint = quint_next THEN c ELSE 0 END)
              AS BIGINT) AS n_stay
  FROM tr
), rows_ AS (
  SELECT quint, CAST(sum(c) AS BIGINT) AS rowsum FROM tr GROUP BY 1
), diag AS (
  SELECT quint, c AS cdiag FROM tr WHERE quint = quint_next
), pq AS (
  SELECT rows_.quint, rowsum, COALESCE(cdiag, 0) AS cdiag
  FROM rows_ LEFT JOIN diag ON diag.quint = rows_.quint
), trace_ AS (
  SELECT count(*) AS k,
         CAST(sum(CAST(floor(CAST(cdiag AS DOUBLE) / rowsum * 1e6
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS tr6
  FROM pq
)
SELECT n_trans AS n_transitions, n_stay,
       CAST(k AS BIGINT) AS k_quintiles,
       CAST(floor(CAST(tr6 AS DOUBLE) / 100.0 + {_OFF}) AS BIGINT)
         AS trace_e4,
       CAST(floor((k - CAST(tr6 AS DOUBLE) / 1e6) / (k - 1.0)
                  * 1000000 + {_OFF}) AS BIGINT) AS shorrocks_e6
FROM agg CROSS JOIN trace_
"""


# ---------------------------------------------------------------------------
# gehan_wilcoxon — Gehan-Breslow weighted logrank (weight = n at risk)
# ---------------------------------------------------------------------------
# Gehan (Biometrika 1965) / Breslow (1970): the early-difference-
# sensitive weighted logrank, on EXACTLY the logrank_test setup
# (lifetime = span days + 1, group = daytime-first-seen).  With
# weight n_t the score U = sum (n d1 - d n1) is an EXACT BIGINT (the
# n cancels the hypergeometric mean's denominator); per-term
# variances d n1 (n - n1)(n - d)/(n - 1) are e6-floored rationals.


def q_gehan_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            ((F.col("first_s") % 86_400) / 3_600)
            .cast("long")
            .between(8, 19),
            1,
        )
        .otherwise(0)
        .alias("g1"),
    )
    dt = per.groupBy("t").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("g1").alias("d1"),
    )
    wo = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = dt.withColumn("n", F.sum("d").over(wo)).withColumn(
        "n1", F.sum("d1").over(wo)
    )
    u_t = F.col("n") * F.col("d1") - F.col("d") * F.col("n1")
    v6 = F.floor(
        F.col("d").cast("double")
        * F.col("n1")
        * (F.col("n") - F.col("n1"))
        * (F.col("n") - F.col("d"))
        / (F.col("n") - 1).cast("double")
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    agg = risk.filter(F.col("n") > 1).agg(
        F.sum("d").alias("n_subjects"),
        F.sum("d1").alias("n_group1"),
        F.sum(u_t).alias("u"),
        F.sum(v6).alias("v6"),
    )
    z = F.col("u").cast("double") / F.sqrt(
        F.col("v6").cast("double") / 1e6
    )
    return agg.select(
        F.col("n_subjects").cast("long").alias("n_subjects"),
        F.col("n_group1").cast("long").alias("n_daytime"),
        F.col("u").cast("long").alias("gehan_u"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    )


SQL_GEHAN = f"""
WITH per AS (
  SELECT user_id,
         min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_s,
         min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS d0,
         max(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS d1
  FROM events GROUP BY 1
), life AS (
  SELECT d1 - d0 + 1 AS t,
         CASE WHEN CAST(floor((first_s % 86400) / 3600) AS BIGINT)
                   BETWEEN 8 AND 19 THEN 1 ELSE 0 END AS g1
  FROM per
), dt AS (
  SELECT t, CAST(count(*) AS BIGINT) AS d,
         CAST(sum(g1) AS BIGINT) AS d1
  FROM life GROUP BY 1
), risk AS (
  SELECT t, d, d1,
         CAST(sum(d) OVER (ORDER BY t DESC) AS BIGINT) AS n,
         CAST(sum(d1) OVER (ORDER BY t DESC) AS BIGINT) AS n1
  FROM dt
), agg AS (
  SELECT CAST(sum(d) AS BIGINT) AS n_subjects,
         CAST(sum(d1) AS BIGINT) AS n_group1,
         CAST(sum(n * d1 - d * n1) AS BIGINT) AS u,
         CAST(sum(CAST(floor(CAST(d AS DOUBLE) * n1 * (n - n1)
                             * (n - d) / (n - 1.0) * 1e6 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS v6
  FROM risk WHERE n > 1
)
SELECT n_subjects, n_group1 AS n_daytime, u AS gehan_u,
       CAST(floor(CAST(u AS DOUBLE) / sqrt(CAST(v6 AS DOUBLE) / 1e6)
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg
"""


# ---------------------------------------------------------------------------
# cvm_exponential — one-sample Cramer-von Mises vs fitted exponential
# ---------------------------------------------------------------------------
# W^2 = sum (F(x_(i)) - (2i - 1)/(2n))^2 + 1/(12n) against the
# mean-fitted exponential F(x) = 1 - exp(-x / mean) — the goodness-
# of-fit companion to exp_gap_fit.  On the gap DOMAIN tie blocks
# share F, so the block sum telescopes: sum over ranks i in the block
# of (F - (2i-1)/2n)^2 has a closed quadratic form in the exact
# integers (lo, hi]; each block's value is e9-floored before the fold.


def q_cvm_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
        "event_id",
    )
    wo = Window.partitionBy("event_type").orderBy("s", "event_id")
    g = ev.withColumn("g", F.col("s") - F.lag("s").over(wo)).filter(
        F.col("g").isNotNull() & (F.col("g") > 0)
    )
    dom = g.groupBy("event_type", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    d = (
        dom.withColumn("hi", F.sum("c").over(wv))
        .withColumn("n", F.sum("c").over(wt))
        .withColumn("tot", F.sum(F.col("c") * F.col("g")).over(wt))
        .withColumn("lo", F.col("hi") - F.col("c"))
    )
    nd = F.col("n").cast("double")
    mean = F.col("tot").cast("double") / nd
    ff = 1.0 - F.exp(-F.col("g").cast("double") / mean)
    # sum_{i=lo+1..hi} (F - (2i-1)/(2n))^2
    #   = c F^2 - 2F (hi^2 - lo^2)/(2n)·... closed form with
    # S1 = sum(2i-1) = hi^2 - lo^2, S2 = sum(2i-1)^2
    s1 = (F.col("hi") * F.col("hi") - F.col("lo") * F.col("lo")).cast(
        "double"
    )
    # sum_{i=a..b} (2i-1)^2 = (2b-1)(2b)(2b+1)/6 - (2a-3)(2a-2)(2a-1)/6
    # with a = lo+1, b = hi  (sum of odd squares via consecutive cubes)
    b2 = 2 * F.col("hi")
    a2 = 2 * F.col("lo")
    s2 = (
        ((b2 - 1) * b2 * (b2 + 1)).cast("double")
        - ((a2 - 1) * a2 * (a2 + 1)).cast("double")
    ) / 6.0
    blk = (
        F.col("c").cast("double") * ff * ff
        - ff * s1 / nd
        + s2 / (4.0 * nd * nd)
    )
    b9 = F.floor(blk * 1e9 + F.lit(_OFF)).cast("long")
    agg = d.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("tot").alias("tot"),
        F.sum(b9).alias("s9"),
    )
    w2 = F.col("s9").cast("double") / 1e9 + 1.0 / (
        12.0 * F.col("n").cast("double")
    )
    return (
        agg.filter(F.col("n") >= 3)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_gaps"),
            F.floor(
                F.col("tot").cast("double") / F.col("n") * 100
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("mean_gap_e2"),
            F.floor(w2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "w2_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_CVM_EXP = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id
  FROM events
), gaps AS (
  SELECT event_type,
         s - lag(s) OVER (PARTITION BY event_type
                          ORDER BY s, event_id) AS g
  FROM ev
), dom AS (
  SELECT event_type, g, CAST(count(*) AS BIGINT) AS c
  FROM gaps WHERE g IS NOT NULL AND g > 0
  GROUP BY 1, 2
), d AS (
  SELECT event_type, g, c,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY g)
              AS BIGINT) AS hi,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(sum(c * g) OVER (PARTITION BY event_type) AS BIGINT)
           AS tot
  FROM dom
), blk AS (
  SELECT event_type, n, tot,
         CAST(floor((
           c * (1.0 - exp(-CAST(g AS DOUBLE)
                          / (CAST(tot AS DOUBLE) / n)))
             * (1.0 - exp(-CAST(g AS DOUBLE)
                          / (CAST(tot AS DOUBLE) / n)))
           - (1.0 - exp(-CAST(g AS DOUBLE)
                        / (CAST(tot AS DOUBLE) / n)))
             * CAST(hi * hi - (hi - c) * (hi - c) AS DOUBLE)
             / n
           + (CAST((2 * hi - 1) * (2 * hi) * (2 * hi + 1) AS DOUBLE)
              - CAST((2 * (hi - c) - 1) * (2 * (hi - c))
                     * (2 * (hi - c) + 1) AS DOUBLE)) / 6.0
             / (4.0 * CAST(n AS DOUBLE) * n)
         ) * 1e9 + {_OFF}) AS BIGINT) AS b9
  FROM d
), agg AS (
  SELECT event_type, max(n) AS n, max(tot) AS tot,
         CAST(sum(b9) AS BIGINT) AS s9
  FROM blk GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST(floor(CAST(tot AS DOUBLE) / n * 100 + {_OFF}) AS BIGINT)
         AS mean_gap_e2,
       CAST(floor((CAST(s9 AS DOUBLE) / 1e9 + 1.0 / (12.0 * n))
                  * 1000000 + {_OFF}) AS BIGINT) AS w2_e6
FROM agg
WHERE n >= 3
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# chao_shen_entropy — coverage-adjusted Shannon entropy per language
# ---------------------------------------------------------------------------
# Chao & Shen (EEST 2003): H-hat = -sum (C p) ln(C p) / (1 - (1 -
# C p)^n) with Good's coverage C = 1 - f1/n — the Horvitz-Thompson
# entropy estimator that fixes the plug-in's undercount on unseen
# vocabulary.  Per-word terms e9-floored before the fold; pow/ln are
# row-level on identical operands.


def q_chao_shen_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    freq = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    wt = Window.partitionBy("lang")
    d = freq.withColumn("n", F.sum("m").over(wt)).withColumn(
        "f1", F.sum((F.col("m") == 1).cast("long")).over(wt)
    )
    nd = F.col("n").cast("double")
    cgood = 1.0 - F.col("f1").cast("double") / nd
    cp = cgood * F.col("m").cast("double") / nd
    t9 = F.floor(
        -cp
        * F.log(cp)
        / (1.0 - F.pow(1.0 - cp, nd))
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    plug9 = F.floor(
        -(F.col("m").cast("double") / nd)
        * F.log(F.col("m").cast("double") / nd)
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = d.filter(F.col("f1") < F.col("n")).groupBy("lang").agg(
        F.max("n").alias("n_tokens"),
        F.max("f1").alias("f1"),
        F.sum(t9).alias("h9"),
        F.sum(plug9).alias("p9"),
    )
    return agg.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("f1").cast("long").alias("f1"),
        F.floor(F.col("p9").cast("double") / 1000.0 + F.lit(_OFF))
        .cast("long")
        .alias("h_plugin_e6"),
        F.floor(F.col("h9").cast("double") / 1000.0 + F.lit(_OFF))
        .cast("long")
        .alias("h_chao_shen_e6"),
    ).orderBy("lang")


SQL_CHAO_SHEN = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), freq AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS m
  FROM toks WHERE len(w) > 0 GROUP BY 1, 2
), d AS (
  SELECT lang, m,
         CAST(sum(m) OVER (PARTITION BY lang) AS BIGINT) AS n,
         CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END)
              OVER (PARTITION BY lang) AS BIGINT) AS f1
  FROM freq
), t AS (
  SELECT lang, n, f1,
         CAST(floor(
           -((1.0 - CAST(f1 AS DOUBLE) / n) * m / n)
           * ln((1.0 - CAST(f1 AS DOUBLE) / n) * m / n)
           / (1.0 - pow(1.0 - (1.0 - CAST(f1 AS DOUBLE) / n) * m / n,
                        CAST(n AS DOUBLE)))
           * 1e9 + {_OFF}) AS BIGINT) AS t9,
         CAST(floor(
           -(CAST(m AS DOUBLE) / n) * ln(CAST(m AS DOUBLE) / n)
           * 1e9 + {_OFF}) AS BIGINT) AS p9
  FROM d WHERE f1 < n
), agg AS (
  SELECT lang, max(n) AS n_tokens, max(f1) AS f1,
         CAST(sum(t9) AS BIGINT) AS h9,
         CAST(sum(p9) AS BIGINT) AS p9s
  FROM t GROUP BY 1
)
SELECT lang, n_tokens, f1,
       CAST(floor(CAST(p9s AS DOUBLE) / 1000.0 + {_OFF}) AS BIGINT)
         AS h_plugin_e6,
       CAST(floor(CAST(h9 AS DOUBLE) / 1000.0 + {_OFF}) AS BIGINT)
         AS h_chao_shen_e6
FROM agg
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# cmh_test — Cochran-Mantel-Haenszel across weekly strata
# ---------------------------------------------------------------------------
# Mantel & Haenszel (JNCI 1959) / Cochran (1954): the stratified 2x2
# test of exposure (weekend) vs outcome (purchase) controlling for
# week — CMH = (|sum a_k - sum E_k|)^2 / sum V_k with the
# hypergeometric mean/variance per stratum.  E terms are exact
# rationals e9-floored; V terms e9-floored; counts exact.


def q_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
            / 7
        )
        .cast("long")
        .alias("week"),
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("we"),
        (F.col("event_type") == "purchase").cast("long").alias("p"),
    )
    per = ev.groupBy("week").agg(
        F.sum(F.col("we") * F.col("p")).alias("a"),
        F.sum(F.col("we") * (1 - F.col("p"))).alias("b"),
        F.sum((1 - F.col("we")) * F.col("p")).alias("c"),
        F.sum((1 - F.col("we")) * (1 - F.col("p"))).alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    r1 = F.col("a") + F.col("b")
    c1 = F.col("a") + F.col("c")
    e9 = F.floor(
        r1.cast("double") * c1 / n * 1e9 + F.lit(_OFF)
    ).cast("long")
    v9 = F.floor(
        r1.cast("double")
        * (F.col("c") + F.col("d"))
        * c1
        * (F.col("b") + F.col("d"))
        / (n.cast("double") * n * (n - 1))
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = per.filter(n > 1).agg(
        F.count(F.lit(1)).alias("k_strata"),
        F.sum("a").alias("sa"),
        F.sum(e9).alias("se9"),
        F.sum(v9).alias("sv9"),
    )
    num = F.col("sa").cast("double") - F.col("se9").cast("double") / 1e9
    cmh = num * num / (F.col("sv9").cast("double") / 1e9)
    return agg.select(
        F.col("k_strata").cast("long").alias("k_strata"),
        F.col("sa").cast("long").alias("sum_a"),
        F.floor(F.col("se9").cast("double") / 1e5 + F.lit(_OFF))
        .cast("long")
        .alias("sum_e_e4"),
        F.floor(cmh * 10_000 + F.lit(_OFF)).cast("long").alias(
            "cmh_e4"
        ),
    )


SQL_CMH = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS week,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
  FROM events
), per AS (
  SELECT week,
         CAST(sum(we * p) AS BIGINT) AS a,
         CAST(sum(we * (1 - p)) AS BIGINT) AS b,
         CAST(sum((1 - we) * p) AS BIGINT) AS c,
         CAST(sum((1 - we) * (1 - p)) AS BIGINT) AS d
  FROM ev GROUP BY 1
), t AS (
  SELECT a, b, c, d, a + b + c + d AS n,
         a + b AS r1, a + c AS c1
  FROM per
), f AS (
  SELECT a,
         CAST(floor(CAST(r1 AS DOUBLE) * c1 / n * 1e9 + {_OFF})
              AS BIGINT) AS e9,
         CAST(floor(CAST(r1 AS DOUBLE) * (c + d) * c1 * (b + d)
                    / (CAST(n AS DOUBLE) * n * (n - 1)) * 1e9
                    + {_OFF}) AS BIGINT) AS v9
  FROM t WHERE n > 1
), agg AS (
  SELECT count(*) AS k_strata, CAST(sum(a) AS BIGINT) AS sa,
         CAST(sum(e9) AS BIGINT) AS se9,
         CAST(sum(v9) AS BIGINT) AS sv9
  FROM f
)
SELECT CAST(k_strata AS BIGINT) AS k_strata, sa AS sum_a,
       CAST(floor(CAST(se9 AS DOUBLE) / 1e5 + {_OFF}) AS BIGINT)
         AS sum_e_e4,
       CAST(floor((sa - CAST(se9 AS DOUBLE) / 1e9)
                  * (sa - CAST(se9 AS DOUBLE) / 1e9)
                  / (CAST(sv9 AS DOUBLE) / 1e9) * 10000 + {_OFF})
            AS BIGINT) AS cmh_e4
FROM agg
"""


# ---------------------------------------------------------------------------
# arrival_uniformity — conditional-uniformity KS of arrival times
# ---------------------------------------------------------------------------
# The classic Poisson-process check (Cox & Lewis 1966): conditional
# on N events in the span, arrival times are iid U(span) — KS of the
# normalized arrivals against uniform per type.  D+ / D- are exact
# integer suprema on the second domain (the kuiper machinery, but on
# the FULL span, not time-of-day); span endpoints exact.


def q_arrival_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
    )
    wt = Window.partitionBy("event_type")
    d0 = ev.withColumn("s0", F.min("s").over(wt)).withColumn(
        "s1", F.max("s").over(wt)
    )
    dom = d0.groupBy(
        "event_type", "s", "s0", "s1"
    ).agg(F.count(F.lit(1)).alias("c"))
    wo = (
        Window.partitionBy("event_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = dom.withColumn("cc", F.sum("c").over(wo)).withColumn(
        "n", F.sum("c").over(wt)
    )
    span = F.col("s1") - F.col("s0")
    u_num = F.col("s") - F.col("s0")  # u = u_num / span
    dplus = F.col("cc") * span - u_num * F.col("n")
    dminus = u_num * F.col("n") - (F.col("cc") - F.col("c")) * span
    agg = d.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(span).alias("span_s"),
        F.max(dplus).alias("dp"),
        F.max(dminus).alias("dm"),
    )
    nd = F.col("n").cast("double")
    ks = F.greatest(F.col("dp"), F.col("dm")).cast("double") / (
        nd * F.col("span_s").cast("double")
    )
    return (
        agg.filter((F.col("span_s") > 0) & (F.col("n") >= 3))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("span_s").cast("long").alias("span_s"),
            F.floor(ks * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "ks_e6"
            ),
            F.floor(ks * F.sqrt(nd) * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("ks_scaled_e4"),
        )
        .orderBy("event_type")
    )


SQL_ARRIVAL = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
), d0 AS (
  SELECT event_type, s,
         min(s) OVER (PARTITION BY event_type) AS s0,
         max(s) OVER (PARTITION BY event_type) AS s1
  FROM ev
), dom AS (
  SELECT event_type, s, s0, s1, CAST(count(*) AS BIGINT) AS c
  FROM d0 GROUP BY 1, 2, 3, 4
), d AS (
  SELECT event_type, s, s0, s1, c,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY s)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dom
), agg AS (
  SELECT event_type, max(n) AS n, max(s1 - s0) AS span_s,
         CAST(max(cc * (s1 - s0) - (s - s0) * n) AS BIGINT) AS dp,
         CAST(max((s - s0) * n - (cc - c) * (s1 - s0)) AS BIGINT)
           AS dm
  FROM d GROUP BY 1
)
SELECT event_type, n, span_s,
       CAST(floor(CAST(greatest(dp, dm) AS DOUBLE)
                  / (CAST(n AS DOUBLE) * span_s) * 1000000 + {_OFF})
            AS BIGINT) AS ks_e6,
       CAST(floor(CAST(greatest(dp, dm) AS DOUBLE)
                  / (CAST(n AS DOUBLE) * span_s)
                  * sqrt(CAST(n AS DOUBLE)) * 10000 + {_OFF})
            AS BIGINT) AS ks_scaled_e4
FROM agg
WHERE span_s > 0 AND n >= 3
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ratio_estimators — ratio-of-means vs mean-of-ratios vs Hartley-Ross
# ---------------------------------------------------------------------------
# The survey-sampling classic (Cochran ch. 6): estimating value-per-
# event across users, R1 = sum y / sum n (combined), R2 = mean of
# per-user ratios (biased), and the Hartley-Ross (1954) unbiased
# correction R_HR = R2 + (n_u - 1)/(n_u n-bar) (y-bar - R2 n-bar) —
# the audit that shows WHICH ratio a rollup tier should store.
# Per-user ratios e6-floored before the fold; everything else exact.


def q_ratio_estimators(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = ev.groupBy(
        F.col("user_id").cast("long").alias("user_id")
    ).agg(
        F.count(F.lit(1)).alias("a"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("y"),
    )
    r6 = F.floor(
        F.col("y").cast("double") / F.col("a") * 1e6 + F.lit(_OFF)
    ).cast("long")
    agg = per.select("a", "y", r6.alias("r6")).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("a").alias("sa"),
        F.sum("y").alias("sy"),
        F.sum("r6").alias("sr6"),
    )
    kd = F.col("k").cast("double")
    r1 = F.col("sy").cast("double") / F.col("sa")
    r2 = F.col("sr6").cast("double") / 1e6 / kd
    nbar = F.col("sa").cast("double") / kd
    ybar = F.col("sy").cast("double") / kd
    # infinite-population Hartley-Ross: r-bar + n/((n-1) x-bar)
    # (y-bar - r-bar x-bar)
    rhr = r2 + kd / (kd - 1.0) * (ybar - r2 * nbar) / nbar
    return agg.select(
        F.col("k").cast("long").alias("n_users"),
        F.col("sa").cast("long").alias("n_events"),
        F.floor(r1 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "ratio_of_means_e4"
        ),
        F.floor(r2 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mean_of_ratios_e4"
        ),
        F.floor(rhr * 10_000 + F.lit(_OFF)).cast("long").alias(
            "hartley_ross_e4"
        ),
    )


SQL_RATIO_EST = f"""
WITH per AS (
  SELECT user_id, count(*) AS a,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS y
  FROM events GROUP BY 1
), t AS (
  SELECT a, y,
         CAST(floor(CAST(y AS DOUBLE) / a * 1e6 + {_OFF}) AS BIGINT)
           AS r6
  FROM per
), agg AS (
  SELECT count(*) AS k, CAST(sum(a) AS BIGINT) AS sa,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(r6) AS BIGINT) AS sr6
  FROM t
)
SELECT CAST(k AS BIGINT) AS n_users, sa AS n_events,
       CAST(floor(CAST(sy AS DOUBLE) / sa * 10000 + {_OFF})
            AS BIGINT) AS ratio_of_means_e4,
       CAST(floor(CAST(sr6 AS DOUBLE) / 1e6 / k * 10000 + {_OFF})
            AS BIGINT) AS mean_of_ratios_e4,
       CAST(floor((CAST(sr6 AS DOUBLE) / 1e6 / k
                   + k / (k - 1.0)
                     * (CAST(sy AS DOUBLE) / k
                        - CAST(sr6 AS DOUBLE) / 1e6 / k
                          * (CAST(sa AS DOUBLE) / k))
                     / (CAST(sa AS DOUBLE) / k))
                  * 10000 + {_OFF}) AS BIGINT) AS hartley_ross_e4
FROM agg
"""


# ---------------------------------------------------------------------------
# moran_calendar — Moran's I on the calendar lattice of daily counts
# ---------------------------------------------------------------------------
# Moran (Biometrika 1950) with rook adjacency on the (week, dow)
# calendar lattice: neighbours are consecutive days (lag 1) and the
# same weekday a week apart (lag 7) — does the daily total cluster in
# calendar space beyond its mean?  With Z_i = n y_i - S the n-scale
# cancels in I = (n / S0) * sum w Z Z / sum Z^2, so the whole
# statistic is a ratio of exact BIGINTs; E[I] = -1/(n-1) exact.


def q_moran_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wall = Window.partitionBy()
    d = daily.withColumn("n", F.count(F.lit(1)).over(wall)).withColumn(
        "s", F.sum("y").over(wall)
    )
    d = d.withColumn("z", F.col("n") * F.col("y") - F.col("s"))
    zz = d.agg(
        F.max("n").alias("n"),
        F.sum(F.col("z") * F.col("z")).alias("sz2"),
    )
    b1 = d.select(
        (F.col("day") - 1).alias("day"), F.col("z").alias("z1")
    )
    b7 = d.select(
        (F.col("day") - 7).alias("day"), F.col("z").alias("z7")
    )
    e1 = d.join(b1, "day").select((F.col("z") * F.col("z1")).alias("p"))
    e7 = d.join(b7, "day").select((F.col("z") * F.col("z7")).alias("p"))
    edges = e1.unionByName(e7).agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("p").alias("szz"),
    )
    j = zz.crossJoin(F.broadcast(edges))
    nd = F.col("n").cast("double")
    s0 = 2.0 * F.col("n_edges").cast("double")
    i = (
        nd
        / s0
        * (2.0 * F.col("szz").cast("double"))
        / F.col("sz2").cast("double")
    )
    ei = -1.0 / (nd - 1.0)
    return j.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.floor(i * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "moran_i_e6"
        ),
        F.floor(ei * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "e_i_e6"
        ),
    )


SQL_MORAN = f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), d AS (
  SELECT day, y,
         count(*) OVER () AS n,
         CAST(sum(y) OVER () AS BIGINT) AS s
  FROM daily
), z AS (
  SELECT day, n * y - s AS z, n FROM d
), zz AS (
  SELECT max(n) AS n, CAST(sum(z * z) AS BIGINT) AS sz2 FROM z
), e1 AS (
  SELECT a.z * b.z AS p FROM z a JOIN z b ON b.day = a.day + 1
), e7 AS (
  SELECT a.z * b.z AS p FROM z a JOIN z b ON b.day = a.day + 7
), edges AS (
  SELECT count(*) AS n_edges, CAST(sum(p) AS BIGINT) AS szz
  FROM (SELECT p FROM e1 UNION ALL SELECT p FROM e7)
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(floor(CAST(n AS DOUBLE) / (2.0 * n_edges)
                  * (2.0 * CAST(szz AS DOUBLE))
                  / CAST(sz2 AS DOUBLE) * 1000000 + {_OFF})
            AS BIGINT) AS moran_i_e6,
       CAST(floor(-1.0 / (n - 1.0) * 1000000 + {_OFF}) AS BIGINT)
         AS e_i_e6
FROM zz CROSS JOIN edges
"""


# ---------------------------------------------------------------------------
# inspection_paradox — length-biased vs plain mean inter-event gap
# ---------------------------------------------------------------------------
# The renewal-theory inspection paradox: a random TIME falls in a gap
# of expected length E[g^2]/E[g] = mean (1 + CV^2) — the factor by
# which naive "time between events at a random moment" overestimates
# the plain mean.  Both means and the paradox factor come from exact
# BIGINT gap moments.


def q_inspection_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
        "event_id",
    )
    wo = Window.partitionBy("event_type").orderBy("s", "event_id")
    g = ev.withColumn("g", F.col("s") - F.lag("s").over(wo)).filter(
        F.col("g").isNotNull() & (F.col("g") > 0)
    )
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("qg"),
    )
    mean = F.col("sg").cast("double") / F.col("n")
    lb = F.col("qg").cast("double") / F.col("sg")
    factor = lb / mean
    return (
        agg.filter(F.col("n") >= 2)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_gaps"),
            F.floor(mean * 100 + F.lit(_OFF)).cast("long").alias(
                "mean_gap_e2"
            ),
            F.floor(lb * 100 + F.lit(_OFF)).cast("long").alias(
                "length_biased_e2"
            ),
            F.floor(factor * 10_000 + F.lit(_OFF)).cast("long").alias(
                "paradox_factor_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_INSPECTION = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id
  FROM events
), gaps AS (
  SELECT event_type,
         s - lag(s) OVER (PARTITION BY event_type
                          ORDER BY s, event_id) AS g
  FROM ev
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(g) AS BIGINT) AS sg,
         CAST(sum(g * g) AS BIGINT) AS qg
  FROM gaps WHERE g IS NOT NULL AND g > 0
  GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST(floor(CAST(sg AS DOUBLE) / n * 100 + {_OFF}) AS BIGINT)
         AS mean_gap_e2,
       CAST(floor(CAST(qg AS DOUBLE) / sg * 100 + {_OFF}) AS BIGINT)
         AS length_biased_e2,
       CAST(floor((CAST(qg AS DOUBLE) / sg)
                  / (CAST(sg AS DOUBLE) / n) * 10000 + {_OFF})
            AS BIGINT) AS paradox_factor_e4
FROM agg
WHERE n >= 2
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# qn_scale — Rousseeuw-Croux Qn robust scale on daily counts
# ---------------------------------------------------------------------------
# Rousseeuw & Croux (JASA 1993): Qn = d * {{|x_i - x_j|, i < j}}_(k)
# with k = C(h, 2), h = n//2 + 1 — a 50% breakdown scale with 82%
# Gaussian efficiency (far above MAD's 37%).  The pair fan-out is
# bounded by span-days^2 per key; the k-th order statistic is an
# exact rank pick with (diff, day-pair) tie-break; d = 2.2219 is the
# shared consistency literal.


_QN_D = 2.2219


def q_qn_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    b = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("day_b"),
        F.col("y").alias("y_b"),
    )
    pairs = daily.join(
        b,
        (F.col("event_type") == F.col("et"))
        & (F.col("day") < F.col("day_b")),
    ).select(
        "event_type",
        "day",
        "day_b",
        F.abs(F.col("y_b") - F.col("y")).alias("ad"),
    )
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(
        "ad", "day", "day_b"
    )
    r = pairs.withColumn("npairs", F.count(F.lit(1)).over(wt)).withColumn(
        "rk", F.row_number().over(wr)
    )
    # n from npairs: n(n-1)/2 = npairs; h = n//2 + 1; k = h(h-1)/2
    n = F.floor(
        (1.0 + F.sqrt(1.0 + 8.0 * F.col("npairs").cast("double"))) / 2.0
    ).cast("long")
    h = F.floor(n / 2).cast("long") + 1
    kk = (h * (h - 1) / 2).cast("long")
    picked = r.withColumn("n", n).withColumn("kk", kk).filter(
        F.col("rk") == F.col("kk")
    )
    return picked.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("kk").cast("long").alias("k"),
        F.col("ad").cast("long").alias("kth_absdiff"),
        F.floor(F.col("ad").cast("double") * _QN_D * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("qn_e4"),
    ).orderBy("event_type")


SQL_QN = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, a.day, b.day AS day_b,
         abs(b.y - a.y) AS ad
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND a.day < b.day
), r AS (
  SELECT event_type, ad,
         count(*) OVER (PARTITION BY event_type) AS npairs,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ad, day, day_b) AS rk
  FROM pairs
), p2 AS (
  SELECT event_type, ad, rk,
         CAST(floor((1.0 + sqrt(1.0 + 8.0 * npairs)) / 2.0) AS BIGINT)
           AS n
  FROM r
), p3 AS (
  SELECT event_type, ad, rk, n,
         (n // 2 + 1) * (n // 2) // 2 AS kk
  FROM p2
)
SELECT event_type, n AS n_days, kk AS k, ad AS kth_absdiff,
       CAST(floor(CAST(ad AS DOUBLE) * {_QN_D!r} * 10000 + {_OFF})
            AS BIGINT) AS qn_e4
FROM p3
WHERE rk = kk
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# flatline_runs — stuck-sensor run census on the hourly series
# ---------------------------------------------------------------------------
# The sensor-QC complement to flag_localsd (which needs a window of
# low variance): exact runs of IDENTICAL consecutive hourly values
# per user — max run length and the count of runs >= 3, the classic
# stuck-value tripwire.  One lag window + exact run-id cumulative.


def q_flatline_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = ev.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
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
    wo = Window.partitionBy("user_id").orderBy("t")
    d = h.withColumn(
        "brk",
        (
            F.lag("v").over(wo).isNull()
            | (F.col("v") != F.lag("v").over(wo))
        ).cast("long"),
    ).withColumn(
        "rid",
        F.sum("brk").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = d.groupBy("user_id", "rid").agg(
        F.count(F.lit(1)).alias("len")
    )
    agg = runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max("len").alias("max_run"),
        F.sum((F.col("len") >= 3).cast("long")).alias("runs_ge3"),
        F.sum("len").alias("n_points"),
    )
    return agg.select(
        "user_id",
        F.col("n_points").cast("long").alias("n_points"),
        F.col("n_runs").cast("long").alias("n_runs"),
        F.col("max_run").cast("long").alias("max_run"),
        F.col("runs_ge3").cast("long").alias("runs_ge3"),
    ).orderBy("user_id")


SQL_FLATLINE = f"""
WITH hourly AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS t,
         CAST(floor(avg(value) * 100 + {_OFF}) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), d AS (
  SELECT user_id, t, v,
         CASE WHEN lag(v) OVER w IS NULL
                OR v <> lag(v) OVER w THEN 1 ELSE 0 END AS brk
  FROM hourly
  WINDOW w AS (PARTITION BY user_id ORDER BY t)
), rid AS (
  SELECT user_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t)
              AS BIGINT) AS rid
  FROM d
), runs AS (
  SELECT user_id, rid, count(*) AS len
  FROM rid GROUP BY 1, 2
), agg AS (
  SELECT user_id, count(*) AS n_runs,
         CAST(max(len) AS BIGINT) AS max_run,
         CAST(sum(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS runs_ge3,
         CAST(sum(len) AS BIGINT) AS n_points
  FROM runs GROUP BY 1
)
SELECT user_id, n_points, CAST(n_runs AS BIGINT) AS n_runs,
       max_run, runs_ge3
FROM agg
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# norm_anova — one-way ANOVA of L1 norms by label
# ---------------------------------------------------------------------------
# The corpus embeddings are L2-normalized (squared norms are constant
# by construction — verified), so the informative magnitude signal is
# the L1 norm: for unit vectors ||x||_1 measures how SPREAD the mass
# is across dimensions (sqrt(dim) for diffuse, 1 for axis-aligned).
# L1 norms are EXACT BIGINTs off the e6 component table (no flooring
# at all); F = MSB/MSW via exact per-group terms (the cancellation-
# free (sg n - s ng)^2 form — the naive w - s^2/n form collapses
# catastrophically).


def q_norm_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    comp = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "vec_id",
        "label",
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("x6"),
    )
    norms = comp.groupBy("vec_id", "label").agg(
        F.floor(
            F.sum(F.abs(F.col("x6"))).cast("double") / 100.0
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("n2"),
    )
    g = norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("n2").alias("sg"),
        F.sum(F.col("n2") * F.col("n2")).alias("qg"),
    )
    wall = Window.partitionBy()
    g = g.withColumn("n", F.sum("ng").over(wall)).withColumn(
        "s", F.sum("sg").over(wall)
    )
    # the naive w - s^2/n form cancels catastrophically (w ~ 1e18,
    # ssb ~ 1e1) and the two engines' sum orders diverge — instead
    # fold EXACT per-group terms: ssb_g = (sg n - s ng)^2 / (ng n^2),
    # ssw_g = (ng qg - sg^2) / ng, each e4-floored
    dd = F.col("sg") * F.col("n") - F.col("s") * F.col("ng")
    ssb4 = F.floor(
        dd.cast("double")
        * dd.cast("double")
        / (
            F.col("ng").cast("double")
            * F.col("n").cast("double")
            * F.col("n")
        )
        * 1e4
        + F.lit(_OFF)
    ).cast("long")
    ssw4 = F.floor(
        (
            F.col("ng") * F.col("qg") - F.col("sg") * F.col("sg")
        ).cast("double")
        / F.col("ng")
        * 1e4
        + F.lit(_OFF)
    ).cast("long")
    tot = g.groupBy("n").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(ssb4).alias("sb4"),
        F.sum(ssw4).alias("sw4"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    f = (F.col("sb4").cast("double") / (kd - 1.0)) / (
        F.col("sw4").cast("double") / (nd - kd)
    )
    tot = tot.filter(F.col("sw4") > 0)
    return tot.select(
        F.col("n").cast("long").alias("n_points"),
        F.col("k").cast("long").alias("k_labels"),
        F.floor(
            F.col("sb4").cast("double") / 1e4 / nd * 100 + F.lit(_OFF)
        )
        .cast("long")
        .alias("msb_scaled_e2"),
        F.floor(f * 10_000 + F.lit(_OFF)).cast("long").alias("f_e4"),
    )


SQL_NORM_ANOVA = f"""
WITH comp0 AS (
  SELECT vec_id, label,
         unnest(list_transform(generate_series(1, len(embedding)),
           i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6
                           + {_OFF}) AS BIGINT))) AS x6
  FROM embeddings
), norms AS (
  SELECT vec_id, label,
         CAST(floor(CAST(sum(abs(x6)) AS DOUBLE) / 100.0 + {_OFF})
              AS BIGINT) AS n2
  FROM comp0 GROUP BY 1, 2
), g AS (
  SELECT label, count(*) AS ng,
         CAST(sum(n2) AS BIGINT) AS sg,
         CAST(sum(n2 * n2) AS BIGINT) AS qg
  FROM norms GROUP BY 1
), w AS (
  SELECT label, ng, sg, qg,
         CAST(sum(ng) OVER () AS BIGINT) AS n,
         CAST(sum(sg) OVER () AS BIGINT) AS s
  FROM g
), terms AS (
  SELECT n,
         CAST(floor(CAST(sg * n - s * ng AS DOUBLE)
                    * CAST(sg * n - s * ng AS DOUBLE)
                    / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE) * n)
                    * 1e4 + {_OFF}) AS BIGINT) AS ssb4,
         CAST(floor(CAST(ng * qg - sg * sg AS DOUBLE) / ng * 1e4
                    + {_OFF}) AS BIGINT) AS ssw4
  FROM w
), tot AS (
  SELECT n, count(*) AS k,
         CAST(sum(ssb4) AS BIGINT) AS sb4,
         CAST(sum(ssw4) AS BIGINT) AS sw4
  FROM terms GROUP BY 1
)
SELECT CAST(n AS BIGINT) AS n_points, CAST(k AS BIGINT) AS k_labels,
       CAST(floor(CAST(sb4 AS DOUBLE) / 1e4 / n * 100 + {_OFF})
            AS BIGINT) AS msb_scaled_e2,
       CAST(floor((CAST(sb4 AS DOUBLE) / (k - 1.0))
                  / (CAST(sw4 AS DOUBLE) / (CAST(n AS DOUBLE) - k))
                  * 10000 + {_OFF}) AS BIGINT) AS f_e4
FROM tot
WHERE sw4 > 0
"""


# ---------------------------------------------------------------------------
# session_flow — hourly session start/end flow balance
# ---------------------------------------------------------------------------
# Ops flow-conservation audit on the house 1800 s sessionize: how
# many sessions START vs END in each hour of day, the net flow, and
# the start share — peak-hour capacity planning numbers.  Exact
# counting end to end (two rank windows per session).


def q_session_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
    )
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = (
        ev.withColumn("prev", F.lag("s").over(wo))
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
    ses = g.groupBy("user_id", "sid").agg(
        F.min("s").alias("t0"), F.max("s").alias("t1")
    )
    starts = ses.groupBy(
        ((F.col("t0") % 86_400) / 3_600).cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_starts"))
    ends = ses.groupBy(
        ((F.col("t1") % 86_400) / 3_600).cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_ends"))
    j = starts.join(ends, "hour", "full_outer").fillna(
        0, ["n_starts", "n_ends"]
    )
    wall = Window.partitionBy()
    j = j.withColumn("tot", F.sum("n_starts").over(wall))
    return j.select(
        F.col("hour").cast("long").alias("hour"),
        F.col("n_starts").cast("long").alias("n_starts"),
        F.col("n_ends").cast("long").alias("n_ends"),
        (F.col("n_starts") - F.col("n_ends")).cast("long").alias(
            "net_flow"
        ),
        F.floor(
            F.col("n_starts").cast("double") / F.col("tot") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("start_share_e6"),
    ).orderBy("hour")


SQL_SESSION_FLOW = f"""
WITH ev AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
), g AS (
  SELECT user_id, event_id, s,
         lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
           AS prev
  FROM ev
), b AS (
  SELECT user_id, s,
         CAST(sum(CASE WHEN prev IS NULL OR s - prev > 1800
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, event_id)
              AS BIGINT) AS sid
  FROM g
), ses AS (
  SELECT user_id, sid, min(s) AS t0, max(s) AS t1
  FROM b GROUP BY 1, 2
), starts AS (
  SELECT CAST(floor((t0 % 86400) / 3600) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n_starts
  FROM ses GROUP BY 1
), ends AS (
  SELECT CAST(floor((t1 % 86400) / 3600) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n_ends
  FROM ses GROUP BY 1
), j AS (
  SELECT COALESCE(starts.hour, ends.hour) AS hour,
         COALESCE(n_starts, 0) AS n_starts,
         COALESCE(n_ends, 0) AS n_ends
  FROM starts FULL OUTER JOIN ends ON ends.hour = starts.hour
)
SELECT hour, n_starts, n_ends, n_starts - n_ends AS net_flow,
       CAST(floor(CAST(n_starts AS DOUBLE)
                  / (CAST(sum(n_starts) OVER () AS BIGINT))
                  * 1000000 + {_OFF}) AS BIGINT) AS start_share_e6
FROM j
ORDER BY hour
"""


# ---------------------------------------------------------------------------
# tost_equivalence — two one-sided tests of weekday/weekend mean value
# ---------------------------------------------------------------------------
# Schuirmann (1987): equivalence is shown when BOTH one-sided t
# statistics clear the margin — here +-5% of the pooled mean value per
# type, the reverse question of every difference test in the
# registry.  Welch SEs off exact centivalue moments; margins exact
# rationals; both t's and the equivalent flag (|t| >= 1.644854 each
# side, the shared z-approx literal) are emitted.


_TOST_Z = 1.644854


def q_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("we"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("event_type", "we").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    a = g.filter(F.col("we") == 0).select(
        "event_type",
        F.col("n").alias("n0"),
        F.col("s").alias("s0"),
        F.col("q").alias("q0"),
    )
    b = g.filter(F.col("we") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("q").alias("q1"),
    )
    j = a.join(b, "event_type")
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    m0 = F.col("s0").cast("double") / n0
    m1 = F.col("s1").cast("double") / n1
    v0 = (
        n0 * F.col("q0").cast("double")
        - F.col("s0").cast("double") * F.col("s0").cast("double")
    ) / (n0 * (n0 - 1.0))
    v1 = (
        n1 * F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (n1 * (n1 - 1.0))
    se = F.sqrt(v0 / n0 + v1 / n1)
    pooled = (F.col("s0") + F.col("s1")).cast("double") / (n0 + n1)
    margin = 0.05 * pooled
    diff = m1 - m0
    t_lo = (diff + margin) / se
    t_hi = (diff - margin) / se
    equiv = (
        (t_lo >= _TOST_Z) & (t_hi <= -_TOST_Z)
    ).cast("long")
    return j.select(
        "event_type",
        F.col("n0").cast("long").alias("n_weekday"),
        F.col("n1").cast("long").alias("n_weekend"),
        F.floor(diff * 100 + F.lit(_OFF)).cast("long").alias(
            "diff_e2"
        ),
        F.floor(margin * 100 + F.lit(_OFF)).cast("long").alias(
            "margin_e2"
        ),
        F.floor(t_lo * 10_000 + F.lit(_OFF)).cast("long").alias(
            "t_lower_e4"
        ),
        F.floor(t_hi * 10_000 + F.lit(_OFF)).cast("long").alias(
            "t_upper_e4"
        ),
        equiv.alias("equivalent"),
    ).orderBy("event_type")


SQL_TOST = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT event_type, we, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS q
  FROM ev GROUP BY 1, 2
), j AS (
  SELECT a.event_type,
         a.n AS n0, a.s AS s0, a.q AS q0,
         b.n AS n1, b.s AS s1, b.q AS q1
  FROM g a JOIN g b
    ON b.event_type = a.event_type AND a.we = 0 AND b.we = 1
), t AS (
  SELECT event_type, n0, n1,
         CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS diff,
         0.05 * (CAST(s0 + s1 AS DOUBLE) / (n0 + n1)) AS margin,
         sqrt((CAST(n0 AS DOUBLE) * q0 - CAST(s0 AS DOUBLE) * s0)
              / (CAST(n0 AS DOUBLE) * (n0 - 1.0)) / n0
              + (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
                / (CAST(n1 AS DOUBLE) * (n1 - 1.0)) / n1) AS se
  FROM j
)
SELECT event_type, CAST(n0 AS BIGINT) AS n_weekday,
       CAST(n1 AS BIGINT) AS n_weekend,
       CAST(floor(diff * 100 + {_OFF}) AS BIGINT) AS diff_e2,
       CAST(floor(margin * 100 + {_OFF}) AS BIGINT) AS margin_e2,
       CAST(floor((diff + margin) / se * 10000 + {_OFF}) AS BIGINT)
         AS t_lower_e4,
       CAST(floor((diff - margin) / se * 10000 + {_OFF}) AS BIGINT)
         AS t_upper_e4,
       CAST(CASE WHEN (diff + margin) / se >= {_TOST_Z!r}
                  AND (diff - margin) / se <= -{_TOST_Z!r}
                 THEN 1 ELSE 0 END AS BIGINT) AS equivalent
FROM t
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# mde_power — post-hoc minimum detectable effect at 80% power
# ---------------------------------------------------------------------------
# The experiment-design readout: with the observed group sizes and
# variances, the smallest weekday/weekend mean difference detectable
# at alpha = .05 (two-sided) and 80% power is (z_a + z_b) SE — the
# honest "what could this data even see" number.  z literals shared;
# SE off exact moments; also emitted relative to the pooled mean.


_MDE_ZA = 1.959964
_MDE_ZB = 0.841621


def q_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("we"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("event_type", "we").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    a = g.filter(F.col("we") == 0).select(
        "event_type",
        F.col("n").alias("n0"),
        F.col("s").alias("s0"),
        F.col("q").alias("q0"),
    )
    b = g.filter(F.col("we") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("q").alias("q1"),
    )
    j = a.join(b, "event_type")
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    v0 = (
        n0 * F.col("q0").cast("double")
        - F.col("s0").cast("double") * F.col("s0").cast("double")
    ) / (n0 * (n0 - 1.0))
    v1 = (
        n1 * F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (n1 * (n1 - 1.0))
    se = F.sqrt(v0 / n0 + v1 / n1)
    mde = (_MDE_ZA + _MDE_ZB) * se
    pooled = (F.col("s0") + F.col("s1")).cast("double") / (n0 + n1)
    return j.select(
        "event_type",
        F.col("n0").cast("long").alias("n_weekday"),
        F.col("n1").cast("long").alias("n_weekend"),
        F.floor(se * 10_000 + F.lit(_OFF)).cast("long").alias(
            "se_e4"
        ),
        F.floor(mde * 100 + F.lit(_OFF)).cast("long").alias(
            "mde_centi_e2"
        ),
        F.floor(mde / pooled * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("mde_rel_e6"),
    ).orderBy("event_type")


SQL_MDE = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT event_type, we, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS q
  FROM ev GROUP BY 1, 2
), j AS (
  SELECT a.event_type,
         a.n AS n0, a.s AS s0, a.q AS q0,
         b.n AS n1, b.s AS s1, b.q AS q1
  FROM g a JOIN g b
    ON b.event_type = a.event_type AND a.we = 0 AND b.we = 1
), t AS (
  SELECT event_type, n0, n1,
         sqrt((CAST(n0 AS DOUBLE) * q0 - CAST(s0 AS DOUBLE) * s0)
              / (CAST(n0 AS DOUBLE) * (n0 - 1.0)) / n0
              + (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
                / (CAST(n1 AS DOUBLE) * (n1 - 1.0)) / n1) AS se,
         CAST(s0 + s1 AS DOUBLE) / (n0 + n1) AS pooled
  FROM j
)
SELECT event_type, CAST(n0 AS BIGINT) AS n_weekday,
       CAST(n1 AS BIGINT) AS n_weekend,
       CAST(floor(se * 10000 + {_OFF}) AS BIGINT) AS se_e4,
       CAST(floor(({_MDE_ZA!r} + {_MDE_ZB!r}) * se * 100 + {_OFF})
            AS BIGINT) AS mde_centi_e2,
       CAST(floor(({_MDE_ZA!r} + {_MDE_ZB!r}) * se / pooled * 1000000
                  + {_OFF}) AS BIGINT) AS mde_rel_e6
FROM t
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# price_indexes — Laspeyres / Paasche / Fisher week-over-week
# ---------------------------------------------------------------------------
# Index-number theory (Fisher 1922): with event types as the basket,
# p = mean value (e4-floored per (week, type) — the quoted "price")
# and q = event count, the three classic indexes decompose weekly
# value change into price and quantity moves.  All basket sums are
# exact BIGINTs (p4 x q products); Fisher is the geometric mean.


def q_price_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wk = ev.groupBy(
        F.floor(
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
            / 7
        )
        .cast("long")
        .alias("week"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("qty"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("val"),
    )
    wk = wk.withColumn(
        "p4",
        F.floor(
            F.col("val").cast("double") / F.col("qty") * 100
            + F.lit(_OFF)
        ).cast("long"),
    )
    nxt = wk.select(
        (F.col("week") - 1).alias("week"),
        "event_type",
        F.col("qty").alias("q1"),
        F.col("p4").alias("p1"),
    )
    j = wk.join(nxt, ["week", "event_type"])
    agg = j.groupBy("week").agg(
        F.count(F.lit(1)).alias("k_types"),
        F.sum(F.col("p4") * F.col("qty")).alias("p0q0"),
        F.sum(F.col("p1") * F.col("qty")).alias("p1q0"),
        F.sum(F.col("p4") * F.col("q1")).alias("p0q1"),
        F.sum(F.col("p1") * F.col("q1")).alias("p1q1"),
    )
    lasp = F.col("p1q0").cast("double") / F.col("p0q0")
    paas = F.col("p1q1").cast("double") / F.col("p0q1")
    fisher = F.sqrt(lasp * paas)
    return (
        agg.filter((F.col("p0q0") > 0) & (F.col("p0q1") > 0))
        .select(
            "week",
            F.col("k_types").cast("long").alias("k_types"),
            F.floor(lasp * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "laspeyres_e6"
            ),
            F.floor(paas * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "paasche_e6"
            ),
            F.floor(fisher * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("fisher_e6"),
        )
        .orderBy("week")
    )


SQL_PRICE_INDEXES = f"""
WITH wk AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS week,
         event_type,
         CAST(count(*) AS BIGINT) AS qty,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS val
  FROM events GROUP BY 1, 2
), p AS (
  SELECT week, event_type, qty,
         CAST(floor(CAST(val AS DOUBLE) / qty * 100 + {_OFF})
              AS BIGINT) AS p4
  FROM wk
), j AS (
  SELECT a.week, a.event_type,
         a.qty AS q0, a.p4 AS p0, b.qty AS q1, b.p4 AS p1
  FROM p a JOIN p b
    ON b.event_type = a.event_type AND b.week = a.week + 1
), agg AS (
  SELECT week, count(*) AS k_types,
         CAST(sum(p0 * q0) AS BIGINT) AS p0q0,
         CAST(sum(p1 * q0) AS BIGINT) AS p1q0,
         CAST(sum(p0 * q1) AS BIGINT) AS p0q1,
         CAST(sum(p1 * q1) AS BIGINT) AS p1q1
  FROM j GROUP BY 1
)
SELECT week, CAST(k_types AS BIGINT) AS k_types,
       CAST(floor(CAST(p1q0 AS DOUBLE) / p0q0 * 1000000 + {_OFF})
            AS BIGINT) AS laspeyres_e6,
       CAST(floor(CAST(p1q1 AS DOUBLE) / p0q1 * 1000000 + {_OFF})
            AS BIGINT) AS paasche_e6,
       CAST(floor(sqrt(CAST(p1q0 AS DOUBLE) / p0q0
                       * (CAST(p1q1 AS DOUBLE) / p0q1))
                  * 1000000 + {_OFF}) AS BIGINT) AS fisher_e6
FROM agg
WHERE p0q0 > 0 AND p0q1 > 0
ORDER BY week
"""


# ---------------------------------------------------------------------------
# systematic_sample_audit — every-10th-event estimator bias check
# ---------------------------------------------------------------------------
# Survey-sampling QC: systematic sampling (every k-th record) is only
# unbiased when the frame order carries no periodicity — this audit
# takes every 10th event in (ts, event_id) order per type and
# compares the sample mean value against the full mean, with the
# SRS-based z for the observed deviation.  Exact integer sums
# everywhere; the sampler is a deterministic rank filter.


def q_systematic_sample_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.col("ts").cast("timestamp").alias("tts"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wo = Window.partitionBy("event_type").orderBy("tts", "event_id")
    d = ev.withColumn("rk", F.row_number().over(wo))
    full = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    samp = d.filter(F.col("rk") % 10 == 1).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("v").alias("sm"),
    )
    j = full.join(samp, "event_type")
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    mean_full = F.col("s").cast("double") / nd
    mean_samp = F.col("sm").cast("double") / md
    var = (
        nd * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (nd * (nd - 1.0))
    z = (mean_samp - mean_full) / F.sqrt(var / md)
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("m").cast("long").alias("n_sampled"),
        F.floor(mean_full * 100 + F.lit(_OFF)).cast("long").alias(
            "mean_full_e2"
        ),
        F.floor(mean_samp * 100 + F.lit(_OFF)).cast("long").alias(
            "mean_sample_e2"
        ),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


SQL_SYSTEMATIC = f"""
WITH ev AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), d AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rk
  FROM ev
), full_ AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS q
  FROM d GROUP BY 1
), samp AS (
  SELECT event_type, count(*) AS m,
         CAST(sum(v) AS BIGINT) AS sm
  FROM d WHERE rk % 10 = 1 GROUP BY 1
)
SELECT f.event_type, CAST(n AS BIGINT) AS n,
       CAST(m AS BIGINT) AS n_sampled,
       CAST(floor(CAST(s AS DOUBLE) / n * 100 + {_OFF}) AS BIGINT)
         AS mean_full_e2,
       CAST(floor(CAST(sm AS DOUBLE) / m * 100 + {_OFF}) AS BIGINT)
         AS mean_sample_e2,
       CAST(floor((CAST(sm AS DOUBLE) / m - CAST(s AS DOUBLE) / n)
                  / sqrt((CAST(n AS DOUBLE) * q
                          - CAST(s AS DOUBLE) * s)
                         / (CAST(n AS DOUBLE) * (n - 1.0)) / m)
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM full_ f JOIN samp ON samp.event_type = f.event_type
ORDER BY f.event_type
"""


# ---------------------------------------------------------------------------
# pr_auc — tie-aware average precision of value as a purchase score
# ---------------------------------------------------------------------------
# The PR-curve companion to length_auc_langid's exact ROC AUC: rank
# events by value (descending) and score how well value retrieves
# purchases.  Ties are handled at BLOCK level by contract: each
# distinct value contributes pos_v * (cumpos / cumall) at its
# inclusive cumulative — deterministic in both engines, never a
# per-row rank shuffle.  Everything is exact integers until the
# per-block division, which is e9-floored before the fold.


def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    dom = ev.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("p")
    )
    wo = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    d = (
        dom.withColumn("cc", F.sum("c").over(wo))
        .withColumn("cp", F.sum("p").over(wo))
        .withColumn("n", F.sum("c").over(wall))
        .withColumn("np", F.sum("p").over(wall))
    )
    t9 = F.floor(
        F.col("p").cast("double")
        * F.col("cp")
        / F.col("cc")
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = d.agg(
        F.max("n").alias("n"),
        F.max("np").alias("np"),
        F.sum(t9).alias("s9"),
    )
    ap = F.col("s9").cast("double") / 1e9 / F.col("np")
    base = F.col("np").cast("double") / F.col("n")
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("np").cast("long").alias("n_pos"),
        F.floor(base * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "baseline_e6"
        ),
        F.floor(ap * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "ap_e6"
        ),
    )


SQL_PR_AUC = f"""
WITH ev AS (
  SELECT CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(pos) AS BIGINT) AS p
  FROM ev GROUP BY 1
), d AS (
  SELECT v, c, p,
         CAST(sum(c) OVER (ORDER BY v DESC) AS BIGINT) AS cc,
         CAST(sum(p) OVER (ORDER BY v DESC) AS BIGINT) AS cp,
         CAST(sum(c) OVER () AS BIGINT) AS n,
         CAST(sum(p) OVER () AS BIGINT) AS np
  FROM dom
), agg AS (
  SELECT max(n) AS n, max(np) AS np,
         CAST(sum(CAST(floor(CAST(p AS DOUBLE) * cp / cc * 1e9
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS s9
  FROM d
)
SELECT CAST(n AS BIGINT) AS n, CAST(np AS BIGINT) AS n_pos,
       CAST(floor(CAST(np AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS baseline_e6,
       CAST(floor(CAST(s9 AS DOUBLE) / 1e9 / np * 1000000 + {_OFF})
            AS BIGINT) AS ap_e6
FROM agg
"""


# ---------------------------------------------------------------------------
# gains_deciles — decile gains / lift table for value vs purchase
# ---------------------------------------------------------------------------
# The marketing-science standard: bucket events into value deciles
# (exact rank arithmetic on the descending cumulative — decile =
# ceil(10 cc / n) at block level by contract), then purchase rate,
# cumulative capture and lift per decile.  Exact counting; three
# divisions at the end per row.


def q_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    dom = ev.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("p")
    )
    wo = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    d = (
        dom.withColumn("cc", F.sum("c").over(wo))
        .withColumn("n", F.sum("c").over(wall))
        .withColumn(
            "dec",
            F.ceil(
                10.0 * F.col("cc").cast("double") / F.col("n")
            ).cast("long"),
        )
    )
    per = d.groupBy("dec").agg(
        F.sum("c").alias("n_events"),
        F.sum("p").alias("n_pos"),
    )
    wd = Window.orderBy("dec").rowsBetween(
        Window.unboundedPreceding, 0
    )
    per = (
        per.withColumn("cum_pos", F.sum("n_pos").over(wd))
        .withColumn("tot_pos", F.sum("n_pos").over(wall))
        .withColumn("cum_n", F.sum("n_events").over(wd))
        .withColumn("tot_n", F.sum("n_events").over(wall))
    )
    rate = F.col("n_pos").cast("double") / F.col("n_events")
    capture = F.col("cum_pos").cast("double") / F.col("tot_pos")
    lift = (
        F.col("cum_pos").cast("double") / F.col("cum_n")
    ) / (F.col("tot_pos").cast("double") / F.col("tot_n"))
    return per.select(
        F.col("dec").cast("long").alias("decile"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.floor(rate * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rate_e6"
        ),
        F.floor(capture * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "capture_e6"
        ),
        F.floor(lift * 10_000 + F.lit(_OFF)).cast("long").alias(
            "lift_e4"
        ),
    ).orderBy("decile")


SQL_GAINS = f"""
WITH ev AS (
  SELECT CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(pos) AS BIGINT) AS p
  FROM ev GROUP BY 1
), d AS (
  SELECT v, c, p,
         CAST(ceil(10.0 * CAST(sum(c) OVER (ORDER BY v DESC)
                                AS BIGINT)
                   / CAST(sum(c) OVER () AS BIGINT)) AS BIGINT)
           AS dec
  FROM dom
), per AS (
  SELECT dec, CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(p) AS BIGINT) AS n_pos
  FROM d GROUP BY 1
), cum AS (
  SELECT dec, n_events, n_pos,
         CAST(sum(n_pos) OVER (ORDER BY dec) AS BIGINT) AS cum_pos,
         CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos,
         CAST(sum(n_events) OVER (ORDER BY dec) AS BIGINT) AS cum_n,
         CAST(sum(n_events) OVER () AS BIGINT) AS tot_n
  FROM per
)
SELECT dec AS decile, n_events, n_pos,
       CAST(floor(CAST(n_pos AS DOUBLE) / n_events * 1000000 + {_OFF})
            AS BIGINT) AS rate_e6,
       CAST(floor(CAST(cum_pos AS DOUBLE) / tot_pos * 1000000
                  + {_OFF}) AS BIGINT) AS capture_e6,
       CAST(floor((CAST(cum_pos AS DOUBLE) / cum_n)
                  / (CAST(tot_pos AS DOUBLE) / tot_n) * 10000
                  + {_OFF}) AS BIGINT) AS lift_e4
FROM cum
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# session_fatigue — within-session value decline census
# ---------------------------------------------------------------------------
# Does engagement value decay within a session?  For every session
# with >= 4 events (house 1800 s rule), compare the mean centivalue
# of the first half vs the second half (exact integer split by event
# rank), then census: share of declining sessions with the sign-test
# z (ties dropped), and the mean paired difference (per-session
# diffs e2-floored before the fold).


def q_session_fatigue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = (
        ev.withColumn("prev", F.lag("s").over(wo))
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
    ws = Window.partitionBy("user_id", "sid").orderBy("s", "event_id")
    wsc = Window.partitionBy("user_id", "sid")
    r = g.withColumn("rk", F.row_number().over(ws)).withColumn(
        "m", F.count(F.lit(1)).over(wsc)
    ).filter(F.col("m") >= 4)
    half = F.floor(F.col("m") / 2).cast("long")
    per = r.groupBy("user_id", "sid").agg(
        F.max("m").alias("m"),
        F.sum(
            F.when(F.col("rk") <= half, F.col("v")).otherwise(0)
        ).alias("s1"),
        F.sum(
            F.when(F.col("rk") > F.col("m") - half, F.col("v")).otherwise(
                0
            )
        ).alias("s2"),
        F.max(half).alias("h"),
    )
    d2 = F.floor(
        (
            F.col("s2").cast("double") - F.col("s1").cast("double")
        )
        / F.col("h")
        * 100
        + F.lit(_OFF)
    ).cast("long")
    scored = per.select(
        d2.alias("d2"),
        (F.col("s2") < F.col("s1")).cast("long").alias("dec"),
        (F.col("s2") > F.col("s1")).cast("long").alias("inc"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("dec").alias("n_declining"),
        F.sum("inc").alias("n_increasing"),
        F.sum("d2").alias("sd2"),
    )
    nd = (F.col("n_declining") + F.col("n_increasing")).cast("double")
    z = (
        F.col("n_declining").cast("double")
        - F.col("n_increasing")
    ) / F.sqrt(nd)
    return agg.select(
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.col("n_declining").cast("long").alias("n_declining"),
        F.col("n_increasing").cast("long").alias("n_increasing"),
        F.floor(
            F.col("sd2").cast("double") / F.col("n_sessions") + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_diff_e2"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias(
            "sign_z_e4"
        ),
    )


SQL_SESSION_FATIGUE = f"""
WITH ev AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT user_id, event_id, s, v,
         lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
           AS prev
  FROM ev
), b AS (
  SELECT user_id, s, v, event_id,
         CAST(sum(CASE WHEN prev IS NULL OR s - prev > 1800
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, event_id)
              AS BIGINT) AS sid
  FROM g
), r AS (
  SELECT user_id, sid, v,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY s, event_id) AS rk,
         count(*) OVER (PARTITION BY user_id, sid) AS m
  FROM b
), per AS (
  SELECT user_id, sid, max(m) AS m, max(m // 2) AS h,
         CAST(sum(CASE WHEN rk <= m // 2 THEN v ELSE 0 END)
              AS BIGINT) AS s1,
         CAST(sum(CASE WHEN rk > m - m // 2 THEN v ELSE 0 END)
              AS BIGINT) AS s2
  FROM r WHERE m >= 4 GROUP BY 1, 2
), scored AS (
  SELECT CAST(floor((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)) / h
                    * 100 + {_OFF}) AS BIGINT) AS d2,
         CASE WHEN s2 < s1 THEN 1 ELSE 0 END AS dec,
         CASE WHEN s2 > s1 THEN 1 ELSE 0 END AS inc
  FROM per
), agg AS (
  SELECT count(*) AS n_sessions,
         CAST(sum(dec) AS BIGINT) AS n_declining,
         CAST(sum(inc) AS BIGINT) AS n_increasing,
         CAST(sum(d2) AS BIGINT) AS sd2
  FROM scored
)
SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
       n_declining, n_increasing,
       CAST(floor(CAST(sd2 AS DOUBLE) / n_sessions + {_OFF})
            AS BIGINT) AS mean_diff_e2,
       CAST(floor((n_declining - CAST(n_increasing AS DOUBLE))
                  / sqrt(CAST(n_declining + n_increasing AS DOUBLE))
                  * 10000 + {_OFF}) AS BIGINT) AS sign_z_e4
FROM agg
"""


# ---------------------------------------------------------------------------
# parity_split_audit — even/odd-second thinning independence check
# ---------------------------------------------------------------------------
# Poisson thinning says a split on an independent coin (here the
# parity of the epoch second) yields two processes whose daily counts
# correlate only through the common rate.  The audit reports the
# even/odd share (should be ~1/2) and the daily-count Pearson r
# between the halves — a clock-artifact tripwire.  Exact moments.


def q_parity_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
            )
            % 2
        )
        .cast("long")
        .alias("par"),
    )
    daily = ev.groupBy("day").agg(
        F.sum(1 - F.col("par")).alias("x"),
        F.sum("par").alias("y"),
    )
    agg = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    dx = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    dy = nd * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    r = num / F.sqrt(dx * dy)
    share = F.col("sx").cast("double") / (
        F.col("sx") + F.col("sy")
    ).cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("sx").cast("long").alias("n_even"),
        F.col("sy").cast("long").alias("n_odd"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "even_share_e6"
        ),
        F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "r_e6"
        ),
    )


SQL_PARITY = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(epoch(ts)) AS BIGINT) % 2 AS par
  FROM events
), daily AS (
  SELECT day,
         CAST(sum(1 - par) AS BIGINT) AS x,
         CAST(sum(par) AS BIGINT) AS y
  FROM ev GROUP BY 1
), agg AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM daily
)
SELECT CAST(n AS BIGINT) AS n_days, sx AS n_even, sy AS n_odd,
       CAST(floor(CAST(sx AS DOUBLE) / (sx + sy) * 1000000 + {_OFF})
            AS BIGINT) AS even_share_e6,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / sqrt((CAST(n AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx)
                         * (CAST(n AS DOUBLE) * syy
                            - CAST(sy AS DOUBLE) * sy))
                  * 1000000 + {_OFF}) AS BIGINT) AS r_e6
FROM agg
"""


# ---------------------------------------------------------------------------
# source_clarity — IR clarity score (KL from the corpus LM) per source
# ---------------------------------------------------------------------------
# Cronen-Townsend et al. (SIGIR 2002): clarity = KL(source LM ||
# corpus LM) over the source's own support — how topically focused a
# source is.  MLE unigram models (no smoothing needed on the source
# support since p_c > 0 wherever p_s > 0); per-word terms e9-floored
# before the fold.


def q_source_clarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("a"))
    wterm = Window.partitionBy("w")
    wsrc = Window.partitionBy("source")
    wall = Window.partitionBy()
    d = (
        cnt.withColumn("tw", F.sum("a").over(wterm))
        .withColumn("ns", F.sum("a").over(wsrc))
        .withColumn("nn", F.sum("a").over(wall))
    )
    # p_s = a/ns ; p_c = tw/nn ; term = p_s ln(p_s/p_c)
    t9 = F.floor(
        F.col("a").cast("double")
        / F.col("ns")
        * F.log(
            F.col("a").cast("double")
            * F.col("nn")
            / (F.col("ns").cast("double") * F.col("tw"))
        )
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = d.groupBy("source").agg(
        F.max("ns").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(t9).alias("s9"),
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.floor(F.col("s9").cast("double") / 1000.0 + F.lit(_OFF))
        .cast("long")
        .alias("clarity_e6"),
    ).orderBy("source")


SQL_CLARITY = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), cnt AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS a
  FROM toks WHERE len(w) > 0 GROUP BY 1, 2
), d AS (
  SELECT source, w, a,
         CAST(sum(a) OVER (PARTITION BY w) AS BIGINT) AS tw,
         CAST(sum(a) OVER (PARTITION BY source) AS BIGINT) AS ns,
         CAST(sum(a) OVER () AS BIGINT) AS nn
  FROM cnt
), agg AS (
  SELECT source, max(ns) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CAST(floor(CAST(a AS DOUBLE) / ns
                             * ln(CAST(a AS DOUBLE) * nn
                                  / (CAST(ns AS DOUBLE) * tw))
                             * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS s9
  FROM d GROUP BY 1
)
SELECT source, n_tokens, n_types,
       CAST(floor(CAST(s9 AS DOUBLE) / 1000.0 + {_OFF}) AS BIGINT)
         AS clarity_e6
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# detailed_balance — reversibility test of the type transition chain
# ---------------------------------------------------------------------------
# A stationary reversible chain satisfies n_ab ~ n_ba; the Bowker-form
# statistic sum_{{a<b}} (n_ab - n_ba)^2 / (n_ab + n_ba) on the FULL
# per-user consecutive-event transition counts tests detailed balance
# (bowker_symmetry tests only the first-vs-last marginal).  Exact
# counting; per-pair contributions e6-floored; df = non-empty pairs.


def q_detailed_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("tts"),
        "event_id",
    )
    wo = Window.partitionBy("user_id").orderBy("tts", "event_id")
    tr = (
        ev.withColumn("prev", F.lag("event_type").over(wo))
        .filter(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("a"),
            F.col("event_type").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    rev = tr.select(
        F.col("a").alias("b"),
        F.col("b").alias("a"),
        F.col("n_ab").alias("n_ba"),
    )
    pairs = (
        tr.join(rev, ["a", "b"], "full_outer")
        .fillna(0, ["n_ab", "n_ba"])
        .filter(F.col("a") < F.col("b"))
        .filter(F.col("n_ab") + F.col("n_ba") > 0)
    )
    contrib = F.floor(
        (F.col("n_ab") - F.col("n_ba")).cast("double")
        * (F.col("n_ab") - F.col("n_ba"))
        / (F.col("n_ab") + F.col("n_ba"))
        * 1_000_000
        + F.lit(_OFF)
    ).cast("long")
    out = pairs.select(
        "a",
        "b",
        F.col("n_ab").cast("long").alias("n_ab"),
        F.col("n_ba").cast("long").alias("n_ba"),
        contrib.alias("contrib_e6"),
    )
    wall = Window.partitionBy()
    return (
        out.withColumn(
            "chi2_e6", F.sum("contrib_e6").over(wall).cast("long")
        )
        .withColumn("df", F.count(F.lit(1)).over(wall).cast("long"))
        .orderBy("a", "b")
    )


SQL_DETAILED_BALANCE = f"""
WITH ev AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), tr AS (
  SELECT prev AS a, event_type AS b, CAST(count(*) AS BIGINT) AS n_ab
  FROM ev WHERE prev IS NOT NULL GROUP BY 1, 2
), pairs AS (
  SELECT COALESCE(x.a, y.b) AS a, COALESCE(x.b, y.a) AS b,
         COALESCE(x.n_ab, 0) AS n_ab, COALESCE(y.n_ab, 0) AS n_ba
  FROM tr x FULL OUTER JOIN tr y
    ON y.a = x.b AND y.b = x.a
  WHERE COALESCE(x.a, y.b) < COALESCE(x.b, y.a)
    AND COALESCE(x.n_ab, 0) + COALESCE(y.n_ab, 0) > 0
), c AS (
  SELECT a, b, n_ab, n_ba,
         CAST(floor(CAST(n_ab - n_ba AS DOUBLE) * (n_ab - n_ba)
                    / (n_ab + n_ba) * 1000000 + {_OFF}) AS BIGINT)
           AS contrib_e6
  FROM pairs
)
SELECT a, b, n_ab, n_ba, contrib_e6,
       CAST(sum(contrib_e6) OVER () AS BIGINT) AS chi2_e6,
       CAST(count(*) OVER () AS BIGINT) AS df
FROM c
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# ams_f2 — AMS second-moment sketch vs the exact F2
# ---------------------------------------------------------------------------
# Alon, Matias & Szegedy (STOC 1996): F2 = sum c_u^2 is estimated by
# Z^2 with Z = sum s(u) c_u, s(u) = +-1 from a hash bit — here bit 0
# of the repo's shared md5 h60, with bits 1-3 selecting one of 8
# independent estimators whose MEAN is reported against the exact F2.
# Identical hash streams in both engines; everything exact integer
# until the final ratio.


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.dedup import _h60

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id")
    )
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    h = per.withColumn(
        "hh", _h60(F.col("user_id").cast("string"))
    ).withColumn(
        "sgn", (F.col("hh") % 2) * 2 - 1
    ).withColumn(
        "grp", F.floor(F.col("hh") / 2).cast("long") % 8
    )
    z = h.groupBy("grp").agg(
        F.sum(F.col("sgn") * F.col("c")).alias("z")
    )
    est = z.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("z") * F.col("z")).alias("sz2"),
    )
    exact = per.agg(
        F.sum(F.col("c") * F.col("c")).alias("f2"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    j = exact.crossJoin(F.broadcast(est))
    mean_est = F.col("sz2").cast("double") / F.col("k")
    err = (mean_est - F.col("f2").cast("double")) / F.col("f2")
    return j.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("f2").cast("long").alias("f2_exact"),
        F.col("k").cast("long").alias("k_estimators"),
        F.floor(mean_est + F.lit(_OFF)).cast("long").alias(
            "f2_ams_est"
        ),
        F.floor(err * 10_000 + F.lit(_OFF)).cast("long").alias(
            "err_e4"
        ),
    )


SQL_AMS = f"""
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), h AS (
  SELECT c,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS hh
  FROM per
), s AS (
  SELECT c, (hh % 2) * 2 - 1 AS sgn,
         CAST(floor(hh / 2.0) AS BIGINT) % 8 AS grp
  FROM h
), z AS (
  SELECT grp, CAST(sum(sgn * c) AS BIGINT) AS z FROM s GROUP BY 1
), est AS (
  SELECT count(*) AS k, CAST(sum(z * z) AS BIGINT) AS sz2 FROM z
), exact AS (
  SELECT CAST(sum(c * c) AS BIGINT) AS f2,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM per
)
SELECT n_keys, f2 AS f2_exact, CAST(k AS BIGINT) AS k_estimators,
       CAST(floor(CAST(sz2 AS DOUBLE) / k + {_OFF}) AS BIGINT)
         AS f2_ams_est,
       CAST(floor((CAST(sz2 AS DOUBLE) / k - f2) / f2 * 10000
                  + {_OFF}) AS BIGINT) AS err_e4
FROM exact CROSS JOIN est
"""


# ---------------------------------------------------------------------------
# huber_location — Huber M-estimate via 3 unrolled IRLS rounds
# ---------------------------------------------------------------------------
# Huber (Ann. Math. Stat. 1964): the location M-estimator with the
# clip constant k = 1.345 * (MAD / 0.6745).  Start at the exact
# domain median, scale from the exact MAD pick, then THREE fixed
# Winsorized-mean rounds (gesd fixed-iteration precedent): each round
# clamps values to mu +- k and refits the mean; clamped values are
# e2-floored per row so every round's sum is exact integer.


def q_huber_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    dom = ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    d = dom.withColumn("cc", F.sum("c").over(wo)).withColumn(
        "n", F.sum("c").over(wt)
    )
    med = d.filter(F.col("cc") * 2 >= F.col("n")).groupBy(
        "event_type"
    ).agg(F.min("v").alias("med"), F.max("n").alias("n"))
    dd = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("v") - F.col("med"))
    )
    dom2 = dd.groupBy("event_type", "ad").agg(
        F.count(F.lit(1)).alias("c")
    )
    wo2 = (
        Window.partitionBy("event_type")
        .orderBy("ad")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d2 = dom2.withColumn("cc", F.sum("c").over(wo2)).withColumn(
        "n", F.sum("c").over(wt)
    )
    mad = d2.filter(F.col("cc") * 2 >= F.col("n")).groupBy(
        "event_type"
    ).agg(F.min("ad").alias("mad"))
    base = ev.join(
        F.broadcast(med.select("event_type", "med", "n")), "event_type"
    ).join(F.broadcast(mad), "event_type")
    kclip = 1.345 / 0.6745
    mus = med.select(
        "event_type", F.col("med").cast("double").alias("mu")
    )
    for _ in range(3):
        joined = base.join(F.broadcast(mus), "event_type")
        lo = F.col("mu") - kclip * F.col("mad").cast("double")
        hi = F.col("mu") + kclip * F.col("mad").cast("double")
        w2 = F.floor(
            F.greatest(F.least(F.col("v").cast("double"), hi), lo)
            * 100
            + F.lit(_OFF)
        ).cast("long")
        mus = joined.groupBy("event_type").agg(
            (
                F.sum(w2).cast("double") / 100.0 / F.count(F.lit(1))
            ).alias("mu")
        )
    out = (
        med.select("event_type", "med", "n")
        .join(mad, "event_type")
        .join(mus, "event_type")
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("med").cast("long").alias("median_centi"),
        F.col("mad").cast("long").alias("mad_centi"),
        F.floor(F.col("mu") * 100 + F.lit(_OFF)).cast("long").alias(
            "huber_e2"
        ),
    ).orderBy("event_type")


def _huber_round_sql(prev_mu: str, r: int) -> str:
    k = 1.345 / 0.6745
    return f"""
w{r} AS (
  SELECT b.event_type,
         CAST(sum(CAST(floor(greatest(least(CAST(v AS DOUBLE),
                    {prev_mu} + {k!r} * mad),
                    {prev_mu} - {k!r} * mad) * 100 + {_OFF})
               AS BIGINT)) AS BIGINT) AS sw,
         count(*) AS m
  FROM base b {"JOIN mu" + str(r - 1) + " USING (event_type)" if r > 1 else ""}
  GROUP BY 1
), mu{r} AS (
  SELECT event_type, CAST(sw AS DOUBLE) / 100.0 / m AS mu
  FROM w{r}
)"""


SQL_HUBER = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dom AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), d AS (
  SELECT event_type, v,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dom
), med AS (
  SELECT event_type, min(v) AS med, max(n) AS n
  FROM d WHERE cc * 2 >= n GROUP BY 1
), ad AS (
  SELECT ev.event_type, abs(v - med) AS ad
  FROM ev JOIN med ON med.event_type = ev.event_type
), dom2 AS (
  SELECT event_type, ad, CAST(count(*) AS BIGINT) AS c
  FROM ad GROUP BY 1, 2
), d2 AS (
  SELECT event_type, ad,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY ad)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dom2
), madt AS (
  SELECT event_type, min(ad) AS mad
  FROM d2 WHERE cc * 2 >= n GROUP BY 1
), base AS MATERIALIZED (
  SELECT ev.event_type, v, med, n, mad
  FROM ev
  JOIN med ON med.event_type = ev.event_type
  JOIN madt ON madt.event_type = ev.event_type
),
{_huber_round_sql('CAST(med AS DOUBLE)', 1)},
{_huber_round_sql('mu', 2)},
{_huber_round_sql('mu', 3)}
SELECT b.event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(max(med) AS BIGINT) AS median_centi,
       CAST(max(mad) AS BIGINT) AS mad_centi,
       CAST(floor(max(mu3.mu) * 100 + {_OFF}) AS BIGINT) AS huber_e2
FROM base b JOIN mu3 USING (event_type)
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# expectiles — tau = 0.25 / 0.75 expectiles via 3 unrolled ALS rounds
# ---------------------------------------------------------------------------
# Newey & Powell (Econometrica 1987): the expectile e_tau is the
# asymmetric-least-squares location; the fixed point e = [tau S+ +
# (1-tau) S-] / [tau n+ + (1-tau) n-] (S+/n+ sums/counts above e)
# converges monotonically — THREE fixed rounds from the mean by
# contract.  Each round's split sums are exact integers (the split
# point is the same double in both engines); tau enters as exact
# dyadic literals.


def q_expectiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    out_cols = {}
    for tau_e2, tau in ((25, 0.25), (75, 0.75)):
        mus = base.select(
            "event_type",
            (F.col("s").cast("double") / F.col("n")).alias("mu"),
        )
        for _ in range(3):
            joined = ev.join(F.broadcast(mus), "event_type")
            above = (F.col("v").cast("double") > F.col("mu")).cast(
                "long"
            )
            stats = joined.groupBy("event_type").agg(
                F.sum(F.col("v") * above).alias("sp"),
                F.sum(above).alias("np"),
                F.sum(F.col("v") * (1 - above)).alias("sm"),
                F.sum(1 - above).alias("nm"),
            )
            mus = stats.select(
                "event_type",
                (
                    (
                        tau * F.col("sp").cast("double")
                        + (1.0 - tau) * F.col("sm").cast("double")
                    )
                    / (
                        tau * F.col("np").cast("double")
                        + (1.0 - tau) * F.col("nm").cast("double")
                    )
                ).alias("mu"),
            )
        out_cols[tau_e2] = mus.select(
            "event_type", F.col("mu").alias(f"e{tau_e2}")
        )
    j = base.join(out_cols[25], "event_type").join(
        out_cols[75], "event_type"
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("e25") * 100 + F.lit(_OFF)).cast("long").alias(
            "expectile25_e2"
        ),
        F.floor(
            F.col("s").cast("double") / F.col("n") * 100 + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_e2"),
        F.floor(F.col("e75") * 100 + F.lit(_OFF)).cast("long").alias(
            "expectile75_e2"
        ),
    ).orderBy("event_type")


def _expectile_rounds_sql(tau: float, tag: str) -> str:
    blocks = []
    prev = "CAST(s AS DOUBLE) / n"
    src = "base"
    for r in range(1, 4):
        blocks.append(f"""
st{tag}{r} AS (
  SELECT ev.event_type,
         CAST(sum(CASE WHEN CAST(v AS DOUBLE) > {prev} THEN v
                       ELSE 0 END) AS BIGINT) AS sp,
         CAST(sum(CASE WHEN CAST(v AS DOUBLE) > {prev} THEN 1
                       ELSE 0 END) AS BIGINT) AS np,
         CAST(sum(CASE WHEN CAST(v AS DOUBLE) > {prev} THEN 0
                       ELSE v END) AS BIGINT) AS sm,
         CAST(sum(CASE WHEN CAST(v AS DOUBLE) > {prev} THEN 0
                       ELSE 1 END) AS BIGINT) AS nm
  FROM ev JOIN {src} USING (event_type)
  GROUP BY 1
), mu{tag}{r} AS (
  SELECT event_type,
         ({tau!r} * CAST(sp AS DOUBLE)
          + {1.0 - tau!r} * CAST(sm AS DOUBLE))
         / ({tau!r} * CAST(np AS DOUBLE)
            + {1.0 - tau!r} * CAST(nm AS DOUBLE)) AS mu
  FROM st{tag}{r}
)""")
        prev = "mu"
        src = f"mu{tag}{r}"
    return ",".join(blocks)


SQL_EXPECTILES = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), base AS (
  SELECT event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS s
  FROM ev GROUP BY 1
),
{_expectile_rounds_sql(0.25, 'a')},
{_expectile_rounds_sql(0.75, 'b')}
SELECT base.event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(mua3.mu * 100 + {_OFF}) AS BIGINT)
         AS expectile25_e2,
       CAST(floor(CAST(s AS DOUBLE) / n * 100 + {_OFF}) AS BIGINT)
         AS mean_e2,
       CAST(floor(mub3.mu * 100 + {_OFF}) AS BIGINT)
         AS expectile75_e2
FROM base
JOIN mua3 USING (event_type)
JOIN mub3 USING (event_type)
ORDER BY base.event_type
"""


# ---------------------------------------------------------------------------
# palma_ratio — top-10% / bottom-40% value share ratio per type
# ---------------------------------------------------------------------------
# Palma (2011) / Cobham & Sumner: inequality as the ratio of the top
# decile's share to the bottom four deciles' share of per-user value
# — the policy-world alternative to Gini.  Boundary tie blocks are
# split EXACTLY (the pareto_ratio fractional-block interpolation);
# everything is exact BIGINT until the final ratio.


def q_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = ev.groupBy("user_id").agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("y")
    )
    dom = per.groupBy("y").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    d = (
        dom.withColumn("cc", F.sum("c").over(wo))
        .withColumn("cv", F.sum(F.col("c") * F.col("y")).over(wo))
        .withColumn("n", F.sum("c").over(wall))
        .withColumn("tv", F.sum(F.col("c") * F.col("y")).over(wall))
    )
    # bottom 40%: k40 = floor(0.4 n) users (ascending) with fractional
    # last block; top 10%: k10 = floor(0.1 n) users (descending)
    k40 = F.floor(F.col("n") * 2 / 5).cast("long")
    b40 = d.filter(
        ((F.col("cc") - F.col("c")) < k40) & (k40 <= F.col("cc"))
    ).select(
        "n",
        "tv",
        (
            F.col("cv")
            - F.col("c") * F.col("y")
            + (k40 - (F.col("cc") - F.col("c"))) * F.col("y")
        ).alias("v40"),
    )
    k10 = F.floor(F.col("n") / 10).cast("long")
    # descending: users above rank n-k10
    t10 = d.filter(
        ((F.col("n") - F.col("cc")) < k10)
        & (k10 <= F.col("n") - F.col("cc") + F.col("c"))
    ).select(
        (
            F.col("tv")
            - F.col("cv")
            + (k10 - (F.col("n") - F.col("cc"))) * F.col("y")
        ).alias("v10"),
    )
    j = b40.crossJoin(F.broadcast(t10))
    palma = F.col("v10").cast("double") / F.col("v40")
    return j.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("v40").cast("long").alias("bottom40_value"),
        F.col("v10").cast("long").alias("top10_value"),
        F.floor(
            F.col("v10").cast("double") / F.col("tv") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("top10_share_e6"),
        F.floor(palma * 10_000 + F.lit(_OFF)).cast("long").alias(
            "palma_e4"
        ),
    )


SQL_PALMA = f"""
WITH per AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS y
  FROM events GROUP BY 1
), dom AS (
  SELECT y, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY 1
), d AS (
  SELECT y, c,
         CAST(sum(c) OVER (ORDER BY y) AS BIGINT) AS cc,
         CAST(sum(c * y) OVER (ORDER BY y) AS BIGINT) AS cv,
         CAST(sum(c) OVER () AS BIGINT) AS n,
         CAST(sum(c * y) OVER () AS BIGINT) AS tv
  FROM dom
), b40 AS (
  SELECT n, tv,
         cv - c * y + (n * 2 // 5 - (cc - c)) * y AS v40
  FROM d
  WHERE cc - c < n * 2 // 5 AND n * 2 // 5 <= cc
), t10 AS (
  SELECT tv - cv + (n // 10 - (n - cc)) * y AS v10
  FROM d
  WHERE n - cc < n // 10 AND n // 10 <= n - cc + c
)
SELECT n AS n_users, v40 AS bottom40_value, v10 AS top10_value,
       CAST(floor(CAST(v10 AS DOUBLE) / tv * 1000000 + {_OFF})
            AS BIGINT) AS top10_share_e6,
       CAST(floor(CAST(v10 AS DOUBLE) / v40 * 10000 + {_OFF})
            AS BIGINT) AS palma_e4
FROM b40 CROSS JOIN t10
"""


# ---------------------------------------------------------------------------
# quadrant_corr — Blomqvist's beta (medial correlation) per type pair
# ---------------------------------------------------------------------------
# Blomqvist (Ann. Math. Stat. 1950): beta = (n_concordant -
# n_discordant) / (n_concordant + n_discordant) counting quadrants
# around the coordinate-wise medians — the maximally robust
# correlation sign.  Daily count pairs; medians are exact lower
# domain picks; points ON a median line are dropped by contract.


def q_quadrant_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats10 import _daily_pairs

    p = _daily_pairs(spark, sf_dir)
    dx = p.groupBy("type_a", "type_b", "x").agg(
        F.count(F.lit(1)).alias("c")
    )
    wox = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("type_a", "type_b")
    mx = (
        dx.withColumn("cc", F.sum("c").over(wox))
        .withColumn("n", F.sum("c").over(wt))
        .filter(F.col("cc") * 2 >= F.col("n"))
        .groupBy("type_a", "type_b")
        .agg(F.min("x").alias("medx"))
    )
    dy = p.groupBy("type_a", "type_b", "y").agg(
        F.count(F.lit(1)).alias("c")
    )
    woy = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    my = (
        dy.withColumn("cc", F.sum("c").over(woy))
        .withColumn("n", F.sum("c").over(wt))
        .filter(F.col("cc") * 2 >= F.col("n"))
        .groupBy("type_a", "type_b")
        .agg(F.min("y").alias("medy"))
    )
    j = p.join(F.broadcast(mx), ["type_a", "type_b"]).join(
        F.broadcast(my), ["type_a", "type_b"]
    )
    sx = F.when(F.col("x") > F.col("medx"), 1).when(
        F.col("x") < F.col("medx"), -1
    ).otherwise(0)
    sy = F.when(F.col("y") > F.col("medy"), 1).when(
        F.col("y") < F.col("medy"), -1
    ).otherwise(0)
    agg = j.select(
        "type_a", "type_b", (sx * sy).alias("q")
    ).groupBy("type_a", "type_b").agg(
        F.sum((F.col("q") == 1).cast("long")).alias("nc"),
        F.sum((F.col("q") == -1).cast("long")).alias("nd"),
        F.count(F.lit(1)).alias("n"),
    )
    beta = (F.col("nc") - F.col("nd")).cast("double") / (
        F.col("nc") + F.col("nd")
    )
    return (
        agg.filter(F.col("nc") + F.col("nd") > 0)
        .select(
            "type_a",
            "type_b",
            F.col("n").cast("long").alias("n_days"),
            F.col("nc").cast("long").alias("n_concordant"),
            F.col("nd").cast("long").alias("n_discordant"),
            F.floor(beta * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("beta_e6"),
        )
        .orderBy("type_a", "type_b")
    )


from diive_spark.queries_stats10 import _DAILY_PAIRS_SQL as _DP_SQL11

SQL_QUADRANT = f"""
WITH {_DP_SQL11},
mx AS (
  SELECT type_a, type_b, min(x) AS medx
  FROM (
    SELECT type_a, type_b, x,
           CAST(sum(count(*)) OVER (PARTITION BY type_a, type_b
                                    ORDER BY x) AS BIGINT) AS cc,
           CAST(sum(count(*)) OVER (PARTITION BY type_a, type_b)
                AS BIGINT) AS n
    FROM pairs GROUP BY 1, 2, 3
  ) WHERE cc * 2 >= n GROUP BY 1, 2
), my AS (
  SELECT type_a, type_b, min(y) AS medy
  FROM (
    SELECT type_a, type_b, y,
           CAST(sum(count(*)) OVER (PARTITION BY type_a, type_b
                                    ORDER BY y) AS BIGINT) AS cc,
           CAST(sum(count(*)) OVER (PARTITION BY type_a, type_b)
                AS BIGINT) AS n
    FROM pairs GROUP BY 1, 2, 3
  ) WHERE cc * 2 >= n GROUP BY 1, 2
), q AS (
  SELECT p.type_a, p.type_b,
         (CASE WHEN x > medx THEN 1 WHEN x < medx THEN -1 ELSE 0 END)
         * (CASE WHEN y > medy THEN 1 WHEN y < medy THEN -1
                 ELSE 0 END) AS q
  FROM pairs p
  JOIN mx ON mx.type_a = p.type_a AND mx.type_b = p.type_b
  JOIN my ON my.type_a = p.type_a AND my.type_b = p.type_b
), agg AS (
  SELECT type_a, type_b, count(*) AS n,
         CAST(sum(CASE WHEN q = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS nc,
         CAST(sum(CASE WHEN q = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS nd
  FROM q GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
       nc AS n_concordant, nd AS n_discordant,
       CAST(floor(CAST(nc - nd AS DOUBLE) / (nc + nd) * 1000000
                  + {_OFF}) AS BIGINT) AS beta_e6
FROM agg
WHERE nc + nd > 0
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# youden_threshold — Youden's J optimal decision threshold
# ---------------------------------------------------------------------------
# Youden (Cancer 1950): the threshold maximizing J = TPR - FPR for
# classifying purchases from value — the decision-theory complement
# to otsu_threshold (variance split) and the exact ROC machinery.
# TPR/FPR are exact integer ratios on the descending value domain;
# the argmax tie-breaks to the smallest threshold via the exact
# integer cross-multiplied J numerator.


def q_youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    dom = ev.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("p")
    )
    wo = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    d = (
        dom.withColumn("cp", F.sum("p").over(wo))
        .withColumn("cn", F.sum(F.col("c") - F.col("p")).over(wo))
        .withColumn("np", F.sum("p").over(wall))
        .withColumn("nn", F.sum(F.col("c") - F.col("p")).over(wall))
    )
    # J numerator at threshold >= v: cp * nn - cn * np (exact ints,
    # common denominator np * nn)
    jnum = F.col("cp") * F.col("nn") - F.col("cn") * F.col("np")
    wr = Window.orderBy(F.col("_jnum").desc(), F.col("v").asc())
    best = (
        d.withColumn("_jnum", jnum)
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
    )
    jd = F.col("_jnum").cast("double") / (
        F.col("np").cast("double") * F.col("nn")
    )
    return best.select(
        F.col("v").cast("long").alias("threshold_centi"),
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        F.floor(
            F.col("cp").cast("double") / F.col("np") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("tpr_e6"),
        F.floor(
            F.col("cn").cast("double") / F.col("nn") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("fpr_e6"),
        F.floor(jd * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "j_e6"
        ),
    )


SQL_YOUDEN = f"""
WITH ev AS (
  SELECT CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(pos) AS BIGINT) AS p
  FROM ev GROUP BY 1
), d AS (
  SELECT v,
         CAST(sum(p) OVER (ORDER BY v DESC) AS BIGINT) AS cp,
         CAST(sum(c - p) OVER (ORDER BY v DESC) AS BIGINT) AS cn,
         CAST(sum(p) OVER () AS BIGINT) AS np,
         CAST(sum(c - p) OVER () AS BIGINT) AS nn
  FROM dom
), best AS (
  SELECT v, cp, cn, np, nn,
         row_number() OVER (ORDER BY cp * nn - cn * np DESC,
                            v ASC) AS rk
  FROM d
)
SELECT v AS threshold_centi, np AS n_pos, nn AS n_neg,
       CAST(floor(CAST(cp AS DOUBLE) / np * 1000000 + {_OFF})
            AS BIGINT) AS tpr_e6,
       CAST(floor(CAST(cn AS DOUBLE) / nn * 1000000 + {_OFF})
            AS BIGINT) AS fpr_e6,
       CAST(floor(CAST(cp * nn - cn * np AS DOUBLE)
                  / (CAST(np AS DOUBLE) * nn) * 1000000 + {_OFF})
            AS BIGINT) AS j_e6
FROM best
WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# ripley_k — 1-D Ripley's K at 60 s / 600 s / 3600 s radii per type
# ---------------------------------------------------------------------------
# Ripley (JRSS-B 1977) in one dimension: K(t) = span * E[#neighbours
# within t] / (n - 1); under CSR, K(t) = 2t.  Pair counts within t
# ride the house ASOF operator (operators/asofjoin.py — the union +
# carry-forward plan, NEVER a range join): for each distinct second
# v the neighbour count to the right is C(v + t) - C(v), an as-of
# lookup of the cumulative at the largest second <= v + t; the DuckDB
# twin uses native ASOF JOIN (asof_join_events precedent).  All pair
# counts exact BIGINT; K and the CSR reference hit doubles at the
# end.


_RIPLEY_RADII = [60, 600, 3600]


def q_ripley_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.asofjoin import asof_join_backward

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
    )
    dom = ev.groupBy("event_type", "s").agg(
        F.count(F.lit(1)).alias("c")
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    d = (
        dom.withColumn("cc", F.sum("c").over(wo))
        .withColumn("n", F.sum("c").over(wt))
        .withColumn("s0", F.min("s").over(wt))
        .withColumn("s1", F.max("s").over(wt))
    )
    radii = spark.createDataFrame(
        [(r,) for r in _RIPLEY_RADII], "r long"
    )
    left = d.crossJoin(F.broadcast(radii)).select(
        F.concat_ws("#", F.col("event_type"), F.col("r")).alias("key"),
        "event_type",
        "r",
        "c",
        F.col("cc").alias("cc_own"),
        (F.col("s") + F.col("r")).alias("pos"),
        "n",
        (F.col("s1") - F.col("s0")).alias("span"),
    )
    right = d.crossJoin(F.broadcast(radii)).select(
        F.concat_ws("#", F.col("event_type"), F.col("r")).alias("key"),
        F.col("s").alias("pos"),
        F.col("cc").alias("cc_r"),
    )
    j = asof_join_backward(
        left, right, on="pos", by="key", value_cols=["cc_r"]
    )
    # cross pairs to the right within r, plus same-second pairs
    cross = F.col("asof_cc_r") - F.col("cc_own")
    internal = F.col("c") * (F.col("c") - 1) / 2
    agg = j.groupBy("event_type", "r").agg(
        F.max("n").alias("n"),
        F.max("span").alias("span"),
        F.sum(F.col("c") * cross).alias("pc"),
        F.sum(internal).alias("pi"),
    )
    p = F.col("pc") + F.col("pi").cast("long")
    nd = F.col("n").cast("double")
    k = (
        F.col("span").cast("double")
        * 2.0
        * p.cast("double")
        / (nd * (nd - 1.0))
    )
    return (
        agg.filter(F.col("n") >= 2)
        .select(
            "event_type",
            F.col("r").cast("long").alias("radius_s"),
            F.col("n").cast("long").alias("n"),
            p.cast("long").alias("n_pairs"),
            F.floor(k * 100 + F.lit(_OFF)).cast("long").alias("k_e2"),
            (2 * F.col("r")).cast("long").alias("csr_expected"),
        )
        .orderBy("event_type", "radius_s")
    )


SQL_RIPLEY = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
), dom AS (
  SELECT event_type, s, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), d AS (
  SELECT event_type, s, c,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY s)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         max(s) OVER (PARTITION BY event_type)
           - min(s) OVER (PARTITION BY event_type) AS span
  FROM dom
), lr AS (
  SELECT d.*, r, s + r AS pos FROM d
  CROSS JOIN (SELECT unnest([{", ".join(str(r) for r in _RIPLEY_RADII)}])
                AS r)
), j AS (
  SELECT a.event_type, a.r, a.n, a.span, a.c,
         b.cc AS cc_match, a.cc AS cc_own
  FROM lr a
  ASOF JOIN d b
    ON a.event_type = b.event_type AND a.pos >= b.s
), agg AS (
  SELECT event_type, r, max(n) AS n, max(span) AS span,
         CAST(sum(c * (cc_match - cc_own)) AS BIGINT) AS pc,
         CAST(sum(c * (c - 1) // 2) AS BIGINT) AS pi
  FROM j GROUP BY 1, 2
)
SELECT event_type, CAST(r AS BIGINT) AS radius_s,
       CAST(n AS BIGINT) AS n, pc + pi AS n_pairs,
       CAST(floor(CAST(span AS DOUBLE) * 2.0 * (pc + pi)
                  / (CAST(n AS DOUBLE) * (n - 1.0)) * 100 + {_OFF})
            AS BIGINT) AS k_e2,
       CAST(2 * r AS BIGINT) AS csr_expected
FROM agg
WHERE n >= 2
ORDER BY event_type, radius_s
"""


# ---------------------------------------------------------------------------
# collision_audit — same-second collision excess vs Poisson baseline
# ---------------------------------------------------------------------------
# The birthday-paradox QC: within each hour with n events, uniform
# placement over 3600 s expects C(n, 2)/3600 same-second pairs;
# observed pairs come from exact per-second counts.  Excess ratio
# flags clock quantization or batching artifacts.  Exact integers;
# the expectation is an exact rational folded at e6 per hour.


def q_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
    )
    per_s = ev.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    obs = per_s.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("obs_pairs"),
        F.sum("c").alias("n"),
    )
    per_h = ev.groupBy(
        F.floor(F.col("s") / 3600).alias("h")
    ).agg(F.count(F.lit(1)).alias("nh"))
    exp6 = F.floor(
        F.col("nh").cast("double")
        * (F.col("nh") - 1)
        / 2.0
        / 3600.0
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    expd = per_h.agg(F.sum(exp6).alias("e6"))
    j = obs.crossJoin(F.broadcast(expd))
    ratio = (
        F.col("obs_pairs").cast("double")
        / (F.col("e6").cast("double") / 1e6)
    )
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("obs_pairs").cast("long").alias("obs_pairs"),
        F.floor(F.col("e6").cast("double") / 1e4 + F.lit(_OFF))
        .cast("long")
        .alias("exp_pairs_e2"),
        F.floor(ratio * 10_000 + F.lit(_OFF)).cast("long").alias(
            "excess_ratio_e4"
        ),
    )


SQL_COLLISION = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
), per_s AS (
  SELECT s, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1
), obs AS (
  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS obs_pairs,
         CAST(sum(c) AS BIGINT) AS n
  FROM per_s
), per_h AS (
  SELECT s // 3600 AS h, CAST(count(*) AS BIGINT) AS nh
  FROM ev GROUP BY 1
), expd AS (
  SELECT CAST(sum(CAST(floor(CAST(nh AS DOUBLE) * (nh - 1) / 2.0
                             / 3600.0 * 1e6 + {_OFF}) AS BIGINT))
              AS BIGINT) AS e6
  FROM per_h
)
SELECT n, obs_pairs,
       CAST(floor(CAST(e6 AS DOUBLE) / 1e4 + {_OFF}) AS BIGINT)
         AS exp_pairs_e2,
       CAST(floor(CAST(obs_pairs AS DOUBLE)
                  / (CAST(e6 AS DOUBLE) / 1e6) * 10000 + {_OFF})
            AS BIGINT) AS excess_ratio_e4
FROM obs CROSS JOIN expd
"""


# ---------------------------------------------------------------------------
# nchars_audit — n_chars metadata-vs-payload consistency per source
# ---------------------------------------------------------------------------
# The bread-and-butter ingestion audit: the n_chars column must equal
# length(text).  Census of exact matches, drift magnitude, and the
# worst offender per source.  Pure exact counting.


def q_nchars_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source",
        "doc_id",
        (F.length("text") - F.col("n_chars")).alias("delta"),
    )
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("delta") == 0).cast("long")).alias("n_exact"),
        F.sum(F.abs("delta")).alias("sum_abs_delta"),
        F.max(F.abs("delta")).alias("max_abs_delta"),
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("sum_abs_delta").cast("long").alias("sum_abs_delta"),
        F.col("max_abs_delta").cast("long").alias("max_abs_delta"),
        F.floor(
            F.col("n_exact").cast("double") / F.col("n_docs") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("exact_rate_e6"),
    ).orderBy("source")


SQL_NCHARS = f"""
WITH d AS (
  SELECT source, doc_id,
         CAST(len(text) AS BIGINT) - n_chars AS delta
  FROM documents
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact,
         CAST(sum(abs(delta)) AS BIGINT) AS sum_abs_delta,
         CAST(max(abs(delta)) AS BIGINT) AS max_abs_delta
  FROM d GROUP BY 1
)
SELECT source, n_docs, n_exact, sum_abs_delta, max_abs_delta,
       CAST(floor(CAST(n_exact AS DOUBLE) / n_docs * 1000000 + {_OFF})
            AS BIGINT) AS exact_rate_e6
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# loo_influence — leave-one-source-out influence on mean doc length
# ---------------------------------------------------------------------------
# Case-deletion diagnostics at the SOURCE grain: how much does the
# corpus mean document length move when each source is removed?  The
# closed form needs only per-source and global sums — one combinable
# aggregate, no re-scan per deletion.  Exact integers until the final
# divisions.


def q_loo_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("nh"), F.sum("x").alias("sh")
    )
    wall = Window.partitionBy()
    per = per.withColumn("n", F.sum("nh").over(wall)).withColumn(
        "s", F.sum("sh").over(wall)
    )
    full_mean = F.col("s").cast("double") / F.col("n")
    loo_mean = (F.col("s") - F.col("sh")).cast("double") / (
        F.col("n") - F.col("nh")
    )
    infl = loo_mean - full_mean
    return per.select(
        "source",
        F.col("nh").cast("long").alias("n_docs"),
        F.floor(full_mean * 100 + F.lit(_OFF)).cast("long").alias(
            "mean_full_e2"
        ),
        F.floor(loo_mean * 100 + F.lit(_OFF)).cast("long").alias(
            "mean_loo_e2"
        ),
        F.floor(infl * 10_000 + F.lit(_OFF)).cast("long").alias(
            "influence_e4"
        ),
    ).orderBy("source")


SQL_LOO = f"""
WITH per AS (
  SELECT source, count(*) AS nh,
         CAST(sum(n_chars) AS BIGINT) AS sh
  FROM documents GROUP BY 1
), t AS (
  SELECT source, nh, sh,
         CAST(sum(nh) OVER () AS BIGINT) AS n,
         CAST(sum(sh) OVER () AS BIGINT) AS s
  FROM per
)
SELECT source, CAST(nh AS BIGINT) AS n_docs,
       CAST(floor(CAST(s AS DOUBLE) / n * 100 + {_OFF}) AS BIGINT)
         AS mean_full_e2,
       CAST(floor(CAST(s - sh AS DOUBLE) / (n - nh) * 100 + {_OFF})
            AS BIGINT) AS mean_loo_e2,
       CAST(floor((CAST(s - sh AS DOUBLE) / (n - nh)
                   - CAST(s AS DOUBLE) / n) * 10000 + {_OFF})
            AS BIGINT) AS influence_e4
FROM t
ORDER BY source
"""


# ---------------------------------------------------------------------------
# activity_persistence — day-over-day active-user persistence lift
# ---------------------------------------------------------------------------
# The DAU stickiness number: P(user active on d+1 | active on d)
# against the base rate P(active) over each user's span — lift > 1 is
# habit, < 1 is burst-and-churn.  Exact counting on the distinct
# (user, day) grid; base rate uses user-span-days as the exposure.


def q_activity_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    )
    ud = ev.distinct()
    nxt = ud.select(
        "user_id", (F.col("day") - 1).alias("day")
    ).withColumn("nx", F.lit(1))
    j = ud.join(nxt, ["user_id", "day"], "left").fillna(0, ["nx"])
    spans = ud.groupBy("user_id").agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.count(F.lit(1)).alias("adays"),
    )
    # pairs eligible: days strictly before the user's last day
    el = j.join(F.broadcast(spans), "user_id").filter(
        F.col("day") < F.col("d1")
    )
    agg = el.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("nx").alias("n_retained"),
    )
    base = spans.agg(
        F.sum("adays").alias("sa"),
        F.sum(F.col("d1") - F.col("d0") + 1).alias("sspan"),
    )
    o = agg.crossJoin(F.broadcast(base))
    p_cond = F.col("n_retained").cast("double") / F.col("n_pairs")
    p_base = F.col("sa").cast("double") / F.col("sspan")
    return o.select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_retained").cast("long").alias("n_retained"),
        F.floor(p_cond * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "p_next_e6"
        ),
        F.floor(p_base * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "p_base_e6"
        ),
        F.floor(p_cond / p_base * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("lift_e4"),
    )


SQL_PERSISTENCE = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), spans AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1,
         CAST(count(*) AS BIGINT) AS adays
  FROM ud GROUP BY 1
), el AS (
  SELECT a.user_id, a.day,
         CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS nx
  FROM ud a
  JOIN spans ON spans.user_id = a.user_id
  LEFT JOIN ud b ON b.user_id = a.user_id AND b.day = a.day + 1
  WHERE a.day < spans.d1
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(nx) AS BIGINT) AS n_retained
  FROM el
), base AS (
  SELECT CAST(sum(adays) AS BIGINT) AS sa,
         CAST(sum(d1 - d0 + 1) AS BIGINT) AS sspan
  FROM spans
)
SELECT n_pairs, n_retained,
       CAST(floor(CAST(n_retained AS DOUBLE) / n_pairs * 1000000
                  + {_OFF}) AS BIGINT) AS p_next_e6,
       CAST(floor(CAST(sa AS DOUBLE) / sspan * 1000000 + {_OFF})
            AS BIGINT) AS p_base_e6,
       CAST(floor((CAST(n_retained AS DOUBLE) / n_pairs)
                  / (CAST(sa AS DOUBLE) / sspan) * 10000 + {_OFF})
            AS BIGINT) AS lift_e4
FROM agg CROSS JOIN base
"""


# ---------------------------------------------------------------------------
# null_census — column null/blank completeness audit
# ---------------------------------------------------------------------------
# The first query every ingestion pipeline runs: per-column null and
# blank counts over events and documents, one row per (table,
# column).  Pure exact counting; literal unpivot.


def q_null_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("user_id"),
        F.sum(F.col("event_type").isNull().cast("long")).alias(
            "event_type"
        ),
        F.sum(F.col("value").isNull().cast("long")).alias("value"),
        F.sum(
            (
                F.col("props").isNull() | (F.length("props") == 0)
            ).cast("long")
        ).alias("props"),
    )
    d = dc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                F.col("text").isNull() | (F.length("text") == 0)
            ).cast("long")
        ).alias("text"),
        F.sum(F.col("lang").isNull().cast("long")).alias("lang"),
        F.sum(F.col("source").isNull().cast("long")).alias("source"),
    )
    rows = []
    for tbl, df, cols in (
        ("events", e, ["user_id", "event_type", "value", "props"]),
        ("documents", d, ["text", "lang", "source"]),
    ):
        for c in cols:
            rows.append(
                df.select(
                    F.lit(tbl).alias("tbl"),
                    F.lit(c).alias("col"),
                    F.col("n").cast("long").alias("n_rows"),
                    F.col(c).cast("long").alias("n_null_or_blank"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("tbl", "col")


SQL_NULL_CENSUS = """
WITH e AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS user_id,
         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS event_type,
         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS value,
         CAST(sum(CASE WHEN props IS NULL OR len(props) = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS props
  FROM events
), d AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN text IS NULL OR len(text) = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS text,
         CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS lang,
         CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS source
  FROM documents
)
SELECT 'documents' AS tbl, 'lang' AS col, n AS n_rows,
       lang AS n_null_or_blank FROM d
UNION ALL
SELECT 'documents', 'source', n, source FROM d
UNION ALL
SELECT 'documents', 'text', n, text FROM d
UNION ALL
SELECT 'events', 'event_type', n, event_type FROM e
UNION ALL
SELECT 'events', 'props', n, props FROM e
UNION ALL
SELECT 'events', 'user_id', n, user_id FROM e
UNION ALL
SELECT 'events', 'value', n, value FROM e
ORDER BY tbl, col
"""


# ---------------------------------------------------------------------------
# time_heaping — round-timestamp heaping audit (minute/5-min/hour)
# ---------------------------------------------------------------------------
# Digit-preference for TIME: human-entered or batch-written events
# heap on round marks.  Observed shares at s % 60 = 0, % 300 = 0,
# % 3600 = 0 against the uniform 1/60, 1/300, 1/3600 baselines with
# binomial z — the temporal twin of last_digit_bias.  Exact counts;
# z from exact rationals.


def q_time_heaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
    )
    agg = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("s") % 60 == 0).cast("long")).alias("m60"),
        F.sum((F.col("s") % 300 == 0).cast("long")).alias("m300"),
        F.sum((F.col("s") % 3600 == 0).cast("long")).alias("m3600"),
    )
    rows = []
    for mark, cnt in ((60, "m60"), (300, "m300"), (3600, "m3600")):
        p0 = 1.0 / mark
        nd = F.col("n").cast("double")
        obs = F.col(cnt).cast("double") / nd
        z = (obs - p0) / F.sqrt(p0 * (1.0 - p0) / nd)
        rows.append(
            agg.select(
                F.lit(mark).cast("long").alias("mark_s"),
                F.col("n").cast("long").alias("n"),
                F.col(cnt).cast("long").alias("n_on_mark"),
                F.floor(obs * 1e9 + F.lit(_OFF)).cast("long").alias(
                    "share_e9"
                ),
                F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias(
                    "z_e4"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("mark_s")


def _heap_sql(mark: int, cnt: str) -> str:
    p0 = 1.0 / mark
    return f"""
SELECT CAST({mark} AS BIGINT) AS mark_s, n, {cnt} AS n_on_mark,
       CAST(floor(CAST({cnt} AS DOUBLE) / n * 1e9 + {_OFF})
            AS BIGINT) AS share_e9,
       CAST(floor((CAST({cnt} AS DOUBLE) / n - {p0!r})
                  / sqrt({p0!r} * (1.0 - {p0!r})
                         / CAST(n AS DOUBLE)) * 10000 + {_OFF})
            AS BIGINT) AS z_e4
FROM agg"""


SQL_TIME_HEAPING = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN s % 60 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS m60,
         CAST(sum(CASE WHEN s % 300 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS m300,
         CAST(sum(CASE WHEN s % 3600 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS m3600
  FROM ev
)
{_heap_sql(60, 'm60')}
UNION ALL
{_heap_sql(300, 'm300')}
UNION ALL
{_heap_sql(3600, 'm3600')}
ORDER BY mark_s
"""


# ---------------------------------------------------------------------------
# anova_effect_sizes — eta^2 / omega^2 / epsilon^2 for type means
# ---------------------------------------------------------------------------
# The effect-size ladder (Hays; Olejnik & Algina 2003) for the value-
# by-type one-way design: eta^2 (biased), epsilon^2 and omega^2 (both
# bias-corrected) — anova_event_types reports the F, this reports HOW
# MUCH variance types actually explain.  SSB from the cancellation-
# free per-group form (norm_anova precedent); everything else exact.


def q_anova_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("v").alias("sg"),
        F.sum(F.col("v") * F.col("v")).alias("qg"),
    )
    wall = Window.partitionBy()
    g = g.withColumn("n", F.sum("ng").over(wall)).withColumn(
        "s", F.sum("sg").over(wall)
    )
    dd = F.col("sg") * F.col("n") - F.col("s") * F.col("ng")
    ssb4 = F.floor(
        dd.cast("double")
        * dd.cast("double")
        / (
            F.col("ng").cast("double")
            * F.col("n").cast("double")
            * F.col("n")
        )
        * 1e4
        + F.lit(_OFF)
    ).cast("long")
    ssw4 = F.floor(
        (
            F.col("ng") * F.col("qg") - F.col("sg") * F.col("sg")
        ).cast("double")
        / F.col("ng")
        * 1e4
        + F.lit(_OFF)
    ).cast("long")
    tot = g.groupBy("n").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(ssb4).alias("sb4"),
        F.sum(ssw4).alias("sw4"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    ssb = F.col("sb4").cast("double")
    ssw = F.col("sw4").cast("double")
    sst = ssb + ssw
    msw = ssw / (nd - kd)
    eta2 = ssb / sst
    eps2 = (ssb - (kd - 1.0) * msw) / sst
    omega2 = (ssb - (kd - 1.0) * msw) / (sst + msw)
    return tot.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k_types"),
        F.floor(eta2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "eta2_e6"
        ),
        F.floor(eps2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "epsilon2_e6"
        ),
        F.floor(omega2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "omega2_e6"
        ),
    )


SQL_ANOVA_EFFECTS = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT event_type, count(*) AS ng,
         CAST(sum(v) AS BIGINT) AS sg,
         CAST(sum(v * v) AS BIGINT) AS qg
  FROM ev GROUP BY 1
), w AS (
  SELECT event_type, ng, sg, qg,
         CAST(sum(ng) OVER () AS BIGINT) AS n,
         CAST(sum(sg) OVER () AS BIGINT) AS s
  FROM g
), terms AS (
  SELECT n,
         CAST(floor(CAST(sg * n - s * ng AS DOUBLE)
                    * CAST(sg * n - s * ng AS DOUBLE)
                    / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE) * n)
                    * 1e4 + {_OFF}) AS BIGINT) AS ssb4,
         CAST(floor(CAST(ng * qg - sg * sg AS DOUBLE) / ng * 1e4
                    + {_OFF}) AS BIGINT) AS ssw4
  FROM w
), tot AS (
  SELECT n, count(*) AS k,
         CAST(sum(ssb4) AS BIGINT) AS sb4,
         CAST(sum(ssw4) AS BIGINT) AS sw4
  FROM terms GROUP BY 1
)
SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_types,
       CAST(floor(CAST(sb4 AS DOUBLE) / (sb4 + sw4) * 1000000
                  + {_OFF}) AS BIGINT) AS eta2_e6,
       CAST(floor((sb4 - (k - 1.0) * (sw4 / (CAST(n AS DOUBLE) - k)))
                  / (CAST(sb4 + sw4 AS DOUBLE)) * 1000000 + {_OFF})
            AS BIGINT) AS epsilon2_e6,
       CAST(floor((sb4 - (k - 1.0) * (sw4 / (CAST(n AS DOUBLE) - k)))
                  / (sb4 + sw4
                     + sw4 / (CAST(n AS DOUBLE) - k)) * 1000000
                  + {_OFF}) AS BIGINT) AS omega2_e6
FROM tot
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dekkers_moment": q_dekkers_moment,
    "pickands_gamma": q_pickands_gamma,
    "kmv_distinct": q_kmv_distinct,
    "neyman_allocation": q_neyman_allocation,
    "morph_productivity": q_morph_productivity,
    "concentration_index": q_concentration_index,
    "map_at_k": q_map_at_k,
    "trie_branching": q_trie_branching,
    "gesd_outliers": q_gesd_outliers,
    "ttt_statistic": q_ttt_statistic,
    "last_digit_bias": q_last_digit_bias,
    "shorrocks_mobility": q_shorrocks_mobility,
    "gehan_wilcoxon": q_gehan_wilcoxon,
    "cvm_exponential": q_cvm_exponential,
    "chao_shen_entropy": q_chao_shen_entropy,
    "cmh_test": q_cmh_test,
    "arrival_uniformity": q_arrival_uniformity,
    "ratio_estimators": q_ratio_estimators,
    "moran_calendar": q_moran_calendar,
    "inspection_paradox": q_inspection_paradox,
    "qn_scale": q_qn_scale,
    "flatline_runs": q_flatline_runs,
    "norm_anova": q_norm_anova,
    "session_flow": q_session_flow,
    "tost_equivalence": q_tost_equivalence,
    "mde_power": q_mde_power,
    "price_indexes": q_price_indexes,
    "systematic_sample_audit": q_systematic_sample_audit,
    "pr_auc": q_pr_auc,
    "gains_deciles": q_gains_deciles,
    "session_fatigue": q_session_fatigue,
    "parity_split_audit": q_parity_split_audit,
    "source_clarity": q_source_clarity,
    "detailed_balance": q_detailed_balance,
    "ams_f2": q_ams_f2,
    "huber_location": q_huber_location,
    "expectiles": q_expectiles,
    "palma_ratio": q_palma_ratio,
    "quadrant_corr": q_quadrant_corr,
    "youden_threshold": q_youden_threshold,
    "ripley_k": q_ripley_k,
    "collision_audit": q_collision_audit,
    "nchars_audit": q_nchars_audit,
    "loo_influence": q_loo_influence,
    "activity_persistence": q_activity_persistence,
    "null_census": q_null_census,
    "time_heaping": q_time_heaping,
    "anova_effect_sizes": q_anova_effect_sizes,
}

ORACLE_SQL: dict[str, str] = {
    "dekkers_moment": SQL_DEKKERS,
    "pickands_gamma": SQL_PICKANDS,
    "kmv_distinct": SQL_KMV,
    "neyman_allocation": SQL_NEYMAN,
    "morph_productivity": SQL_MORPH,
    "concentration_index": SQL_CONCENTRATION,
    "map_at_k": SQL_MAP_AT_K,
    "trie_branching": SQL_TRIE,
    "gesd_outliers": SQL_GESD,
    "ttt_statistic": SQL_TTT,
    "last_digit_bias": SQL_LAST_DIGIT,
    "shorrocks_mobility": SQL_SHORROCKS,
    "gehan_wilcoxon": SQL_GEHAN,
    "cvm_exponential": SQL_CVM_EXP,
    "chao_shen_entropy": SQL_CHAO_SHEN,
    "cmh_test": SQL_CMH,
    "arrival_uniformity": SQL_ARRIVAL,
    "ratio_estimators": SQL_RATIO_EST,
    "moran_calendar": SQL_MORAN,
    "inspection_paradox": SQL_INSPECTION,
    "qn_scale": SQL_QN,
    "flatline_runs": SQL_FLATLINE,
    "norm_anova": SQL_NORM_ANOVA,
    "session_flow": SQL_SESSION_FLOW,
    "tost_equivalence": SQL_TOST,
    "mde_power": SQL_MDE,
    "price_indexes": SQL_PRICE_INDEXES,
    "systematic_sample_audit": SQL_SYSTEMATIC,
    "pr_auc": SQL_PR_AUC,
    "gains_deciles": SQL_GAINS,
    "session_fatigue": SQL_SESSION_FATIGUE,
    "parity_split_audit": SQL_PARITY,
    "source_clarity": SQL_CLARITY,
    "detailed_balance": SQL_DETAILED_BALANCE,
    "ams_f2": SQL_AMS,
    "huber_location": SQL_HUBER,
    "expectiles": SQL_EXPECTILES,
    "palma_ratio": SQL_PALMA,
    "quadrant_corr": SQL_QUADRANT,
    "youden_threshold": SQL_YOUDEN,
    "ripley_k": SQL_RIPLEY,
    "collision_audit": SQL_COLLISION,
    "nchars_audit": SQL_NCHARS,
    "loo_influence": SQL_LOO,
    "activity_persistence": SQL_PERSISTENCE,
    "null_census": SQL_NULL_CENSUS,
    "time_heaping": SQL_TIME_HEAPING,
    "anova_effect_sizes": SQL_ANOVA_EFFECTS,
}

# shared centroid CTE block (stats8 discipline)
from diive_spark.queries_stats8 import _SQL_CENT as _SQL_CENT11  # noqa: E402

ORACLE_SQL["map_at_k"] = SQL_MAP_AT_K.format(cent=_SQL_CENT11)
