"""Round-4 continuation registry (ninth battery): embedding-space
pathology audits (hubness, anisotropy), distribution overlap, and
ecological turnover.

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)``, derived
doubles floor-scaled with the house 1/pi offset; per-row divisions /
transcendentals floor-scaled BEFORE aggregate sums (order-free);
embedding kernels 6-dp rounded before any compare (the twonn/ann tie
discipline).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF

# ---------------------------------------------------------------------------
# hubness_skew — k-occurrence skewness of label-blocked 5-NN lists
# ---------------------------------------------------------------------------
# Radovanovic, Nanopoulos & Ivanovic (JMLR 11, 2010): in high
# dimensions some points become "hubs" that appear in many k-NN lists;
# the skewness of the k-occurrence distribution N_k measures it.  NN
# search is BLOCKED on the label column (the twonn posture, never
# all-pairs); squared distances ride the Arrow einsum kernel, 6-dp
# rounded BEFORE ranking; N_k (including zero-occurrence points via a
# left join) is exact integer, and the skewness chain runs off exact
# BIGINT power sums.


_HUB_K = 5


def q_hubness_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.similarity import l2sq_pair_udf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    b = emb.select(
        F.col("label").alias("label_r"),
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("emb_r"),
    )
    pairs = emb.join(
        b,
        (F.col("label") == F.col("label_r"))
        & (F.col("vec_id") != F.col("cand_id")),
    ).select(
        "label",
        "vec_id",
        "cand_id",
        F.round(l2sq_pair_udf(F.col("embedding"), F.col("emb_r")), 6).alias(
            "d2"
        ),
    )
    wo = Window.partitionBy("label", "vec_id").orderBy(
        F.col("d2").asc(), F.col("cand_id").asc()
    )
    nn = pairs.withColumn("rk", F.row_number().over(wo)).filter(
        F.col("rk") <= _HUB_K
    )
    occ = nn.groupBy("label", F.col("cand_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("nk")
    )
    full = emb.select("label", "vec_id").join(
        occ, ["label", "vec_id"], "left"
    ).fillna(0, subset=["nk"])
    agg = full.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nk").alias("s1"),
        F.sum(F.col("nk") * F.col("nk")).alias("s2"),
        F.sum(F.col("nk") * F.col("nk") * F.col("nk")).alias("s3"),
        F.max("nk").alias("max_nk"),
    )
    nd = F.col("n").cast("double")
    m = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd - m * m
    m3 = (
        F.col("s3").cast("double") / nd
        - 3.0 * m * (F.col("s2").cast("double") / nd)
        + 2.0 * m * m * m
    )
    skew = m3 / F.pow(m2, F.lit(1.5))
    return (
        agg.filter((F.col("n") >= 10) & (m2 > 0))
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("n").cast("long").alias("n_points"),
            F.col("max_nk").cast("long").alias("max_nk"),
            F.floor(skew * 10_000 + F.lit(_OFF)).cast("long").alias(
                "skew_e4"
            ),
        )
        .orderBy("label")
    )


SQL_HUBNESS = f"""
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
  SELECT label, vec_id, cand_id,
         row_number() OVER (PARTITION BY label, vec_id
                            ORDER BY d2 ASC, cand_id ASC) AS rk
  FROM pairs
), occ AS (
  SELECT label, cand_id AS vec_id, CAST(count(*) AS BIGINT) AS nk
  FROM nn WHERE rk <= {_HUB_K} GROUP BY 1, 2
), filled AS (
  SELECT e.label, e.vec_id, COALESCE(occ.nk, 0) AS nk
  FROM embeddings e
  LEFT JOIN occ ON occ.label = e.label AND occ.vec_id = e.vec_id
), agg AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(nk) AS BIGINT) AS s1,
         CAST(sum(nk * nk) AS BIGINT) AS s2,
         CAST(sum(nk * nk * nk) AS BIGINT) AS s3,
         CAST(max(nk) AS BIGINT) AS max_nk
  FROM filled GROUP BY 1
), c AS (
  SELECT label, n, max_nk,
         CAST(s1 AS DOUBLE) / n AS m,
         CAST(s2 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             * (CAST(s1 AS DOUBLE) / n) AS m3
  FROM agg
)
SELECT CAST(label AS BIGINT) AS label, n AS n_points, max_nk,
       CAST(floor(m3 / pow(m2, 1.5) * 10000 + {_OFF})
            AS BIGINT) AS skew_e4
FROM c
WHERE n >= 10 AND m2 > 0
ORDER BY label
"""


# ---------------------------------------------------------------------------
# embedding_anisotropy — norm profile + mean-vector concentration
# ---------------------------------------------------------------------------
# Ethayarajh (EMNLP 2019): contextual embedding spaces are anisotropic
# — vectors crowd a narrow cone, so the global mean vector keeps a
# large norm relative to the mean vector norm.  Reported per label:
# mean ||x||, ||mean x||, and the concentration ratio ||mean x|| /
# mean ||x|| (1 = fully collapsed, ~0 = isotropic).  Component sums
# are exact BIGINT via the e6-floor trick; per-point norms ride one
# posexplode pass with per-point e6 floors (order-free within the
# bounded dim fold is avoided entirely — the dim-sum is an exact
# integer sum of x6*x6 products).


def q_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    comp = emb.select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "label",
        "vec_id",
        "d",
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("x6"),
    )
    pernorm = comp.groupBy("label", "vec_id").agg(
        F.sum(F.col("x6") * F.col("x6")).alias("ss12")
    )
    pernorm = pernorm.select(
        "label",
        F.floor(
            F.sqrt(F.col("ss12").cast("double")) / 1e6 * 1e6 + F.lit(_OFF)
        )
        .cast("long")
        .alias("norm6"),
    )
    nstats = pernorm.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("norm6").alias("sn6")
    )
    cm = comp.groupBy("label", "d").agg(F.sum("x6").alias("s6"))
    cnorm = cm.groupBy("label").agg(
        F.sum(F.col("s6") * F.col("s6")).alias("css")
    )
    j = nstats.join(cnorm, "label")
    nd = F.col("n").cast("double")
    mean_norm = F.col("sn6").cast("double") / 1e6 / nd
    mean_vec_norm = F.sqrt(F.col("css").cast("double")) / (nd * 1e6)
    ratio = mean_vec_norm / mean_norm
    return j.filter(F.col("sn6") > 0).select(
        F.col("label").cast("long").alias("label"),
        F.col("n").cast("long").alias("n_points"),
        F.floor(mean_norm * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "mean_norm_e6"
        ),
        F.floor(mean_vec_norm * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("meanvec_norm_e6"),
        F.floor(ratio * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "concentration_e6"
        ),
    ).orderBy("label")


SQL_ANISOTROPY = f"""
WITH comp0 AS (
  SELECT label, vec_id,
         unnest(list_transform(generate_series(1, len(embedding)),
           i -> struct_pack(d := i,
                x6 := CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6
                                 + {_OFF}) AS BIGINT)))) AS u
  FROM embeddings
), comp AS (
  SELECT label, vec_id, u.d AS d, u.x6 AS x6 FROM comp0
), pernorm AS (
  SELECT label,
         CAST(floor(sqrt(CAST(sum(x6 * x6) AS DOUBLE)) / 1e6 * 1e6
                    + {_OFF}) AS BIGINT) AS norm6
  FROM comp GROUP BY label, vec_id
), nstats AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(norm6) AS BIGINT) AS sn6
  FROM pernorm GROUP BY 1
), cm AS (
  SELECT label, d, CAST(sum(x6) AS BIGINT) AS s6
  FROM comp GROUP BY 1, 2
), cnorm AS (
  SELECT label, CAST(sum(s6 * s6) AS BIGINT) AS css
  FROM cm GROUP BY 1
)
SELECT CAST(ns.label AS BIGINT) AS label, ns.n AS n_points,
       CAST(floor(CAST(sn6 AS DOUBLE) / 1e6 / n * 1000000 + {_OFF})
            AS BIGINT) AS mean_norm_e6,
       CAST(floor(sqrt(CAST(css AS DOUBLE)) / (CAST(n AS DOUBLE) * 1e6)
                  * 1000000 + {_OFF}) AS BIGINT) AS meanvec_norm_e6,
       CAST(floor(sqrt(CAST(css AS DOUBLE)) / (CAST(n AS DOUBLE) * 1e6)
                  / (CAST(sn6 AS DOUBLE) / 1e6 / n)
                  * 1000000 + {_OFF}) AS BIGINT) AS concentration_e6
FROM nstats ns JOIN cnorm cn ON cn.label = ns.label
WHERE sn6 > 0
ORDER BY ns.label
"""


# ---------------------------------------------------------------------------
# ovl_coefficient — distribution overlap between event-type pairs
# ---------------------------------------------------------------------------
# Weitzman (US Bureau of the Census, 1970): OVL = sum_v min(p_a(v),
# p_b(v)) over the shared support — here the distribution of DAILY
# event counts per type, a pure value-domain object.  The min of two
# fractions is decided by the exact integer cross-compare c_a * T_b
# vs c_b * T_a (never a double threshold); the chosen fraction is
# e9-floored per cell before the (bounded) sum.


def q_ovl_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    cnt = daily.groupBy("event_type", "y").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cnt.groupBy("event_type").agg(F.sum("c").alias("t"))
    cj = cnt.join(F.broadcast(tot), "event_type")
    b = cj.select(
        F.col("event_type").alias("et2"),
        F.col("y").alias("y_r"),
        F.col("c").alias("c2"),
        F.col("t").alias("t2"),
    )
    pairs = cj.join(
        b,
        (F.col("y") == F.col("y_r"))
        & (F.col("event_type") < F.col("et2")),
    )
    minp = F.when(
        F.col("c") * F.col("t2") <= F.col("c2") * F.col("t"),
        F.col("c").cast("double") / F.col("t").cast("double"),
    ).otherwise(F.col("c2").cast("double") / F.col("t2").cast("double"))
    terms = pairs.select(
        F.col("event_type").alias("et1"),
        "et2",
        F.floor(minp * 1e9 + F.lit(_OFF)).cast("long").alias("m9"),
    )
    agg = terms.groupBy("et1", "et2").agg(
        F.count(F.lit(1)).alias("n_shared"),
        F.sum("m9").alias("s9"),
    )
    return agg.select(
        "et1",
        "et2",
        F.col("n_shared").cast("long").alias("n_shared"),
        F.floor(F.col("s9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("ovl_e6"),
    ).orderBy("et1", "et2")


SQL_OVL = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), cnt AS (
  SELECT event_type, y, CAST(count(*) AS BIGINT) AS c
  FROM daily GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1
), cj AS (
  SELECT cnt.event_type, cnt.y, cnt.c, tot.t
  FROM cnt JOIN tot ON tot.event_type = cnt.event_type
), pairs AS (
  SELECT a.event_type AS et1, b.event_type AS et2,
         CAST(floor(CASE WHEN a.c * b.t <= b.c * a.t
                         THEN CAST(a.c AS DOUBLE) / a.t
                         ELSE CAST(b.c AS DOUBLE) / b.t END
                    * 1e9 + {_OFF}) AS BIGINT) AS m9
  FROM cj a JOIN cj b ON b.y = a.y AND a.event_type < b.event_type
)
SELECT et1, et2, CAST(count(*) AS BIGINT) AS n_shared,
       CAST(floor(CAST(sum(m9) AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS ovl_e6
FROM pairs
GROUP BY 1, 2
ORDER BY et1, et2
"""


# ---------------------------------------------------------------------------
# whittaker_beta — week-over-week user turnover (Whittaker beta)
# ---------------------------------------------------------------------------
# Whittaker (Ecol Monogr 30, 1960): beta_w = S / alpha-bar - 1 with
# S the union richness and alpha-bar the mean per-sample richness —
# here consecutive calendar weeks with "species" = active users.
# Union = s1 + s2 - shared, all exact integers off one distinct
# (week, user) table self-joined on adjacent weeks.


def q_whittaker_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wk = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / (86_400_000_000 * 7)
    )
    act = ev.select(wk.cast("long").alias("wk"), "user_id").distinct()
    rich = act.groupBy("wk").agg(F.count(F.lit(1)).alias("s"))
    b = act.select((F.col("wk") - 1).alias("wk"), F.col("user_id"))
    shared = act.join(b, ["wk", "user_id"]).groupBy("wk").agg(
        F.count(F.lit(1)).alias("sh")
    )
    r2 = rich.select(
        (F.col("wk") - 1).alias("wk"), F.col("s").alias("s2")
    )
    j = (
        rich.join(r2, "wk")
        .join(shared, "wk", "left")
        .fillna(0, subset=["sh"])
    )
    union = F.col("s") + F.col("s2") - F.col("sh")
    abar = (F.col("s") + F.col("s2")).cast("double") / 2.0
    beta = union.cast("double") / abar - 1.0
    return j.select(
        F.col("wk").cast("long").alias("wk"),
        F.col("s").cast("long").alias("s_this"),
        F.col("s2").cast("long").alias("s_next"),
        F.col("sh").cast("long").alias("shared"),
        F.floor(beta * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "beta_e6"
        ),
    ).orderBy("wk")


SQL_WHITTAKER = f"""
WITH act AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk,
         user_id
  FROM events
), rich AS (
  SELECT wk, CAST(count(*) AS BIGINT) AS s FROM act GROUP BY 1
), shared AS (
  SELECT a.wk, CAST(count(*) AS BIGINT) AS sh
  FROM act a JOIN act b ON b.wk = a.wk + 1 AND b.user_id = a.user_id
  GROUP BY 1
)
SELECT r1.wk, r1.s AS s_this, r2.s AS s_next,
       CAST(COALESCE(sh.sh, 0) AS BIGINT) AS shared,
       CAST(floor((CAST(r1.s + r2.s - COALESCE(sh.sh, 0) AS DOUBLE)
                   / (CAST(r1.s + r2.s AS DOUBLE) / 2.0) - 1.0) * 1000000
                  + {_OFF}) AS BIGINT) AS beta_e6
FROM rich r1
JOIN rich r2 ON r2.wk = r1.wk + 1
LEFT JOIN shared sh ON sh.wk = r1.wk
ORDER BY r1.wk
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "hubness_skew": q_hubness_skew,
    "embedding_anisotropy": q_embedding_anisotropy,
    "ovl_coefficient": q_ovl_coefficient,
    "whittaker_beta": q_whittaker_beta,
}

ORACLE_SQL: dict[str, str] = {
    "hubness_skew": SQL_HUBNESS,
    "embedding_anisotropy": SQL_ANISOTROPY,
    "ovl_coefficient": SQL_OVL,
    "whittaker_beta": SQL_WHITTAKER,
}
