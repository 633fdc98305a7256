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

from diive_spark.queries_stats2 import _HOURLY_SQL as _HOURLY_SQL_S9
from diive_spark.queries_stats2 import _OFF, _documents

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
    # round-4 bench-tail repair: the within-label pair join + pandas
    # UDF is now the shared _l2_topk_rows Arrow kernel (raw einsum
    # distances, slack-20 preselect); the rounded ordering below is
    # unchanged, so the oracle stays byte-identical.
    from diive_spark.queries_embeddings import _l2_topk_rows

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    pairs = _l2_topk_rows(spark, sf_dir, _HUB_K).select(
        "label",
        "vec_id",
        "cand_id",
        F.round(F.col("d2raw"), 6).alias("d2"),
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



# ---------------------------------------------------------------------------
# term_position_bias — where do the top-20 corpus terms sit inside docs?
# ---------------------------------------------------------------------------
# Boilerplate and navigation chrome concentrate at document heads, so
# a term whose mean normalized position is far below 0.5 is a
# boilerplate suspect (the rationale behind position-aware extraction,
# cf. Kohlschutter boilerpipe, WSDM 2010).  Positions come from ONE
# posexplode of the token split; the per-occurrence normalized
# position is e9-floored before summing (order-free), the vocabulary
# is the deterministic top-20 broadcast.


def q_term_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "w"),
    )
    nt = toks.groupBy("doc_id").agg(F.max("pos").alias("maxpos"))
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("gc"))
        .orderBy(F.desc("gc"), F.asc("w"))
        .limit(20)
    )
    j = (
        toks.join(F.broadcast(vocab.select("w")), "w")
        .join(F.broadcast(nt), "doc_id")
        .filter(F.col("maxpos") > 0)
    )
    relpos = F.col("pos").cast("double") / F.col("maxpos").cast("double")
    terms = j.select(
        "w",
        F.floor(relpos * 1e9 + F.lit(_OFF)).cast("long").alias("p9"),
    )
    agg = terms.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_occ"), F.sum("p9").alias("sp9")
    )
    mean = F.col("sp9").cast("double") / 1e9 / F.col("n_occ").cast("double")
    out = agg.join(F.broadcast(vocab), "w")
    return out.select(
        "w",
        F.col("gc").cast("long").alias("gc"),
        F.col("n_occ").cast("long").alias("n_occ"),
        F.floor(mean * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "mean_pos_e6"
        ),
    ).orderBy("w")


SQL_TERM_POSITION = f"""
WITH toks AS (
  SELECT doc_id, u.w, u.pos
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             regexp_split_to_array(trim(text), '\\s+'),
             (x, i) -> struct_pack(w := x, pos := i - 1))) AS u
    FROM documents
  )
), nt AS (
  SELECT doc_id, CAST(max(pos) AS BIGINT) AS maxpos
  FROM toks GROUP BY 1
), vocab AS (
  SELECT w, gc FROM (
    SELECT w, CAST(count(*) AS BIGINT) AS gc FROM toks GROUP BY 1
  ) ORDER BY gc DESC, w ASC LIMIT 20
), j AS (
  SELECT t.w,
         CAST(floor(CAST(t.pos AS DOUBLE) / nt.maxpos * 1e9 + {_OFF})
              AS BIGINT) AS p9
  FROM toks t
  JOIN vocab v ON v.w = t.w
  JOIN nt ON nt.doc_id = t.doc_id
  WHERE nt.maxpos > 0
), agg AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_occ,
         CAST(sum(p9) AS BIGINT) AS sp9
  FROM j GROUP BY 1
)
SELECT agg.w, vocab.gc, agg.n_occ,
       CAST(floor(CAST(sp9 AS DOUBLE) / 1e9 / n_occ * 1000000 + {_OFF})
            AS BIGINT) AS mean_pos_e6
FROM agg JOIN vocab ON vocab.w = agg.w
ORDER BY agg.w
"""


# ---------------------------------------------------------------------------
# gibrat_law — is user growth independent of size? (Gibrat 1931)
# ---------------------------------------------------------------------------
# Gibrat's law of proportionate effect: regress ln(x2/x1) on ln(x1)
# over users active in both calendar halves; beta < 0 is the standard
# mean-reversion finding.  Halves split the day span at its midpoint
# (integer arithmetic); per-user ln terms e9-floored, xy/xx refloored
# (variance_time discipline), OLS + Pearson r off exact BIGINT sums.


def q_gibrat_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
    ).cast("long")
    d = ev.select("user_id", day.alias("day"))
    span = d.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    j = d.crossJoin(F.broadcast(span))
    half = F.col("day") < (
        F.col("d0") + F.floor((F.col("d1") - F.col("d0")) / 2) + 1
    )
    per = j.groupBy("user_id").agg(
        F.sum(half.cast("long")).alias("x1"),
        F.sum((~half).cast("long")).alias("x2"),
    ).filter((F.col("x1") > 0) & (F.col("x2") > 0))
    x = F.floor(
        F.log(F.col("x1").cast("double")) * 1e9 + F.lit(_OFF)
    ).cast("long")
    y = F.floor(
        F.log(F.col("x2").cast("double") / F.col("x1").cast("double")) * 1e9
        + F.lit(_OFF)
    ).cast("long")
    pts = per.select(x.alias("x9"), y.alias("y9"))
    xd = F.col("x9").cast("double") / 1e9
    yd = F.col("y9").cast("double") / 1e9
    pts = pts.withColumn(
        "xy9", F.floor(xd * yd * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "xx9", F.floor(xd * xd * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "yy9", F.floor(yd * yd * 1e9 + F.lit(_OFF)).cast("long")
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
        F.sum("xy9").alias("sxy"),
        F.sum("xx9").alias("sxx"),
        F.sum("yy9").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / 1e9
    sy = F.col("sy").cast("double") / 1e9
    sxy = F.col("sxy").cast("double") / 1e9
    sxx = F.col("sxx").cast("double") / 1e9
    syy = F.col("syy").cast("double") / 1e9
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    cov = nd * sxy - sx * sy
    beta = cov / vx
    r = cov / F.sqrt(vx * vy)
    return agg.filter((F.col("n") >= 10) & (vx > 0) & (vy > 0)).select(
        F.col("n").cast("long").alias("n_users"),
        F.floor(beta * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "beta_e6"
        ),
        F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias("r_e6"),
    )


SQL_GIBRAT = f"""
WITH d AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), span AS (
  SELECT min(day) AS d0, max(day) AS d1 FROM d
), per AS (
  SELECT d.user_id,
         CAST(sum(CASE WHEN d.day < s.d0 + (s.d1 - s.d0) // 2 + 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS x1,
         CAST(sum(CASE WHEN d.day < s.d0 + (s.d1 - s.d0) // 2 + 1
                       THEN 0 ELSE 1 END) AS BIGINT) AS x2
  FROM d CROSS JOIN span s
  GROUP BY 1
), pts AS (
  SELECT CAST(floor(ln(CAST(x1 AS DOUBLE)) * 1e9 + {_OFF}) AS BIGINT) AS x9,
         CAST(floor(ln(CAST(x2 AS DOUBLE) / x1) * 1e9 + {_OFF})
              AS BIGINT) AS y9
  FROM per WHERE x1 > 0 AND x2 > 0
), p2 AS (
  SELECT x9, y9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9) * (CAST(y9 AS DOUBLE) / 1e9)
                    * 1e9 + {_OFF}) AS BIGINT) AS xy9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9) * (CAST(x9 AS DOUBLE) / 1e9)
                    * 1e9 + {_OFF}) AS BIGINT) AS xx9,
         CAST(floor((CAST(y9 AS DOUBLE) / 1e9) * (CAST(y9 AS DOUBLE) / 1e9)
                    * 1e9 + {_OFF}) AS BIGINT) AS yy9
  FROM pts
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x9) AS BIGINT) AS sx, CAST(sum(y9) AS BIGINT) AS sy,
         CAST(sum(xy9) AS BIGINT) AS sxy, CAST(sum(xx9) AS BIGINT) AS sxx,
         CAST(sum(yy9) AS BIGINT) AS syy
  FROM p2
), f AS (
  SELECT n,
         CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
           - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9) AS vx,
         CAST(n AS DOUBLE) * (CAST(syy AS DOUBLE) / 1e9)
           - (CAST(sy AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9) AS vy,
         CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
           - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9) AS cov
  FROM agg
)
SELECT n AS n_users,
       CAST(floor(cov / vx * 1000000 + {_OFF}) AS BIGINT) AS beta_e6,
       CAST(floor(cov / sqrt(vx * vy) * 1000000 + {_OFF})
            AS BIGINT) AS r_e6
FROM f
WHERE n >= 10 AND vx > 0 AND vy > 0
"""


# ---------------------------------------------------------------------------
# spectral_flatness — Wiener entropy of the hourly periodogram
# ---------------------------------------------------------------------------
# Gray & Markel (IEEE TASSP 22, 1974): flatness = geometric mean /
# arithmetic mean of the power spectrum; 1 = white noise, -> 0 =
# strongly tonal.  Shares the fisher_g_test DFT construction
# (complete-grid Fourier frequencies, ordinates e3-floored); the
# geometric mean adds per-ordinate e9-floored ln terms over the
# FLOORED integer ordinates, so both engines fold identical integers.


def q_spectral_flatness(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _m

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
        "event_type", "t", "c", "n",
        F.explode(F.sequence(F.lit(1), m)).alias("j"),
    )
    k = (F.col("j") * F.col("t")) % F.col("n")
    ang = (
        F.lit(2.0) * F.lit(_m.pi) * k.cast("double")
        / F.col("n").cast("double")
    )
    trig = fan.select(
        "event_type", "j", "n",
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
        F.floor(i_j * 1_000 + F.lit(_OFF)).cast("long").alias("i3"),
    ).filter(F.col("i3") > 0)
    lnterm = F.floor(
        F.log(F.col("i3").cast("double") / 1e3) * 1e9 + F.lit(_OFF)
    ).cast("long")
    agg = ords.select("event_type", "i3", lnterm.alias("l9")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("i3").alias("si3"),
        F.sum("l9").alias("sl9"),
    )
    md = F.col("m").cast("double")
    geo = F.exp(F.col("sl9").cast("double") / 1e9 / md)
    amean = F.col("si3").cast("double") / 1e3 / md
    return agg.filter(F.col("si3") > 0).select(
        "event_type",
        F.col("m").cast("long").alias("m_ords"),
        F.floor(geo / amean * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "flatness_e6"
        ),
    ).orderBy("event_type")


SQL_SPECTRAL_FLATNESS = f"""
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
  SELECT event_type,
         CAST(floor((sum(ca) * sum(ca) + sum(sa) * sum(sa))
                    / max(n) * 1000 + {_OFF}) AS BIGINT) AS i3
  FROM trig GROUP BY event_type, j
), pos AS (
  SELECT event_type, i3,
         CAST(floor(ln(CAST(i3 AS DOUBLE) / 1e3) * 1e9 + {_OFF})
              AS BIGINT) AS l9
  FROM ords WHERE i3 > 0
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(i3) AS BIGINT) AS si3,
         CAST(sum(l9) AS BIGINT) AS sl9
  FROM pos GROUP BY 1
)
SELECT event_type, m AS m_ords,
       CAST(floor(exp(CAST(sl9 AS DOUBLE) / 1e9 / m)
                  / (CAST(si3 AS DOUBLE) / 1e3 / m)
                  * 1000000 + {_OFF}) AS BIGINT) AS flatness_e6
FROM agg
WHERE si3 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# precedence_matrix — which event type comes first within a session?
# ---------------------------------------------------------------------------
# Behavioral ordering: over sessions (house 1800 s gap rule) where
# both types of a pair occur, the share where a precedes b — the
# precedence matrix behind funnel hypotheses.  First-occurrence times
# per (session, type) are exact integers (ties broken by event_id
# min, documented); the pair compare and shares are exact counting.


def q_precedence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = (
        ev.select(
            "user_id", "event_id", "event_type", sec.cast("long").alias("s")
        )
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
            F.sum("brk").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    first = g.groupBy("user_id", "sid", "event_type").agg(
        F.min(F.struct(F.col("s"), F.col("event_id"))).alias("f")
    )
    b = first.select(
        F.col("user_id").alias("user_id"),
        F.col("sid").alias("sid"),
        F.col("event_type").alias("et2"),
        F.col("f").alias("f2"),
    )
    pairs = first.join(b, ["user_id", "sid"]).filter(
        F.col("event_type") < F.col("et2")
    )
    agg = pairs.groupBy(
        F.col("event_type").alias("et1"), "et2"
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("f") < F.col("f2")).cast("long")).alias("n_first"),
    )
    share = F.col("n_first").cast("double") / F.col("n_sessions").cast(
        "double"
    )
    return agg.select(
        "et1",
        "et2",
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.col("n_first").cast("long").alias("n_first"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "share_first_e6"
        ),
    ).orderBy("et1", "et2")


SQL_PRECEDENCE = f"""
WITH g AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev
  FROM events
), sb AS (
  SELECT user_id, event_id, event_type, s,
         CAST(sum(CASE WHEN prev IS NULL OR s - prev > 1800
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, event_id)
              AS BIGINT) AS sid
  FROM g
), first AS (
  SELECT user_id, sid, event_type,
         min(s * 100000000 + event_id) AS fkey
  FROM sb GROUP BY 1, 2, 3
), pairs AS (
  SELECT a.event_type AS et1, b.event_type AS et2,
         CASE WHEN a.fkey < b.fkey THEN 1 ELSE 0 END AS afirst
  FROM first a
  JOIN first b ON b.user_id = a.user_id AND b.sid = a.sid
  WHERE a.event_type < b.event_type
)
SELECT et1, et2, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(afirst) AS BIGINT) AS n_first,
       CAST(floor(CAST(sum(afirst) AS DOUBLE) / count(*) * 1000000
                  + {_OFF}) AS BIGINT) AS share_first_e6
FROM pairs
GROUP BY 1, 2
ORDER BY et1, et2
"""



# ---------------------------------------------------------------------------
# adjacent_containment — 5-gram containment of crawl-adjacent doc pairs
# ---------------------------------------------------------------------------
# Crawl streams emit near-duplicate RUNS (pagination, template
# variants), so containment |S_a cap S_b| / |S_a| between CONSECUTIVE
# docs (doc_id order per source) is the cheap first-pass dup signal
# (Broder, SEQUENCES 1997 containment; complements the blocked
# source_containment).  Pairs are adjacency-bounded (n-1 per source,
# never quadratic); word-5-gram sets via the rankprofile slice
# construction; all counts exact.


def q_adjacent_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("source", "doc_id", "text")
    w = Window.partitionBy("source").orderBy("doc_id")
    d = d.withColumn("nxt", F.lead("doc_id").over(w))
    sh = (
        # hoist the tokenization OUT of the lambda (round-5 profile): the
        # inline form re-ran split(trim(text)) for every i — O(tokens^2)
        # splits per doc, 2.7 s for this stage alone at sf0.1; hoisted
        # it is 0.57 s
        d.withColumn("toks", F.expr("split(trim(text), '\\\\s+')"))
        .select(
            "source",
            "doc_id",
            F.explode(
                F.array_distinct(
                    # sequence(1, 0) DESCENDS and slice() rejects start 0
                    # (house trap, cf. text/rankprofile.py) — gate on token
                    # count instead of filtering after the fact
                    F.expr(
                        "CASE WHEN size(toks) >= 5 THEN"
                        " transform(sequence(1, size(toks) - 4),"
                        " i -> array_join(slice(toks, i, 5), ' '))"
                        " ELSE array() END"
                    )
                )
            ).alias("g"),
        )
    )
    sz = sh.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("na")
    )
    pairs = d.filter(F.col("nxt").isNotNull()).select(
        "source", "doc_id", "nxt"
    )
    rhs = sh.select(
        F.col("source").alias("source"),
        F.col("doc_id").alias("nxt"),
        F.col("g").alias("g"),
    )
    inter = (
        sh.join(pairs, ["source", "doc_id"])
        .join(rhs, ["source", "nxt", "g"])
        .groupBy("source", "doc_id")
        .agg(F.count(F.lit(1)).alias("ninter"))
    )
    per = (
        pairs.join(sz, ["source", "doc_id"])
        .join(inter, ["source", "doc_id"], "left")
        .fillna(0, subset=["ninter"])
    )
    cont = F.col("ninter").cast("double") / F.col("na").cast("double")
    per = per.filter(F.col("na") > 0).select(
        "source",
        F.floor(cont * 1e9 + F.lit(_OFF)).cast("long").alias("c9"),
    )
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("c9").alias("sc9"),
        F.max("c9").alias("max_c9"),
        F.sum((F.col("c9") >= 500_000_000).cast("long")).alias("n_half"),
    )
    return agg.select(
        "source",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.floor(
            F.col("sc9").cast("double") / 1e9
            / F.col("n_pairs").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_cont_e6"),
        F.floor(F.col("max_c9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("max_cont_e6"),
        F.col("n_half").cast("long").alias("n_over_half"),
    ).orderBy("source")


SQL_ADJ_CONTAINMENT = f"""
WITH d AS (
  SELECT source, doc_id, text,
         lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS nxt
  FROM documents
), sh AS (
  SELECT source, doc_id, unnest(list_distinct(list_filter(
           list_transform(
             generate_series(1, greatest(
               len(regexp_split_to_array(trim(text), '\\s+')) - 4, 0)),
             i -> array_to_string(
                    regexp_split_to_array(trim(text), '\\s+')[i:i+4],
                    ' ')),
           x -> x <> ''))) AS g
  FROM d
), sz AS (
  SELECT source, doc_id, CAST(count(*) AS BIGINT) AS na
  FROM sh GROUP BY 1, 2
), pairs AS (
  SELECT source, doc_id, nxt FROM d WHERE nxt IS NOT NULL
), inter AS (
  SELECT p.source, p.doc_id, CAST(count(*) AS BIGINT) AS ninter
  FROM pairs p
  JOIN sh a ON a.source = p.source AND a.doc_id = p.doc_id
  JOIN sh b ON b.source = p.source AND b.doc_id = p.nxt AND b.g = a.g
  GROUP BY 1, 2
), per AS (
  SELECT p.source,
         CAST(floor(CAST(COALESCE(i.ninter, 0) AS DOUBLE) / sz.na * 1e9
                    + {_OFF}) AS BIGINT) AS c9
  FROM pairs p
  JOIN sz ON sz.source = p.source AND sz.doc_id = p.doc_id
  LEFT JOIN inter i ON i.source = p.source AND i.doc_id = p.doc_id
  WHERE sz.na > 0
)
SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(floor(CAST(sum(c9) AS DOUBLE) / 1e9 / count(*) * 1000000
                  + {_OFF}) AS BIGINT) AS mean_cont_e6,
       CAST(floor(CAST(max(c9) AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS max_cont_e6,
       CAST(sum(CASE WHEN c9 >= 500000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_half
FROM per
GROUP BY 1
ORDER BY source
"""


# ---------------------------------------------------------------------------
# cochran_armitage — trend in the weekly purchase share
# ---------------------------------------------------------------------------
# Cochran (Biometrics 10, 1954) / Armitage (Biometrics 11, 1955):
# trend test for proportions across ordered groups — here the share
# of purchase events across calendar weeks with the week index as
# score.  T = sum w_k (x_k - n_k p-bar), Var = p-bar (1 - p-bar)
# (sum n w^2 - (sum n w)^2 / N): every sum is an exact BIGINT, the
# z chain is fixed-order (zero refloors).


def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wk = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / (86_400_000_000 * 7)
    )
    per = ev.groupBy(wk.cast("long").alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("x"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("x").alias("xx"),
        F.sum(F.col("w") * F.col("x")).alias("swx"),
        F.sum(F.col("w") * F.col("n")).alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n")).alias("swwn"),
    )
    nn = F.col("nn").cast("double")
    pbar = F.col("xx").cast("double") / nn
    t = F.col("swx").cast("double") - pbar * F.col("swn").cast("double")
    varr = (
        pbar
        * (1.0 - pbar)
        * (
            F.col("swwn").cast("double")
            - F.col("swn").cast("double")
            * F.col("swn").cast("double")
            / nn
        )
    )
    z = t / F.sqrt(varr)
    return agg.filter((F.col("k") >= 3) & (varr > 0)).select(
        F.col("k").cast("long").alias("n_weeks"),
        F.col("nn").cast("long").alias("n_events"),
        F.col("xx").cast("long").alias("n_purchase"),
        F.floor(pbar * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "pbar_e6"
        ),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    )


SQL_COCHRAN_ARMITAGE = f"""
WITH per AS (
  SELECT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(x) AS BIGINT) AS xx,
         CAST(sum(w * x) AS BIGINT) AS swx,
         CAST(sum(w * n) AS BIGINT) AS swn,
         CAST(sum(w * w * n) AS BIGINT) AS swwn
  FROM per
), f AS (
  SELECT k, nn, xx,
         CAST(xx AS DOUBLE) / nn AS pbar,
         CAST(swx AS DOUBLE) - (CAST(xx AS DOUBLE) / nn)
           * CAST(swn AS DOUBLE) AS t,
         (CAST(xx AS DOUBLE) / nn) * (1.0 - CAST(xx AS DOUBLE) / nn)
           * (CAST(swwn AS DOUBLE)
              - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE) / nn) AS varr
  FROM agg
)
SELECT k AS n_weeks, nn AS n_events, xx AS n_purchase,
       CAST(floor(pbar * 1000000 + {_OFF}) AS BIGINT) AS pbar_e6,
       CAST(floor(t / sqrt(varr) * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM f
WHERE k >= 3 AND varr > 0
"""


# ---------------------------------------------------------------------------
# welch_anova — heteroskedastic one-way Welch ANOVA across event types
# ---------------------------------------------------------------------------
# Welch (Biometrika 38, 1951): F* over k groups without the equal-
# variance assumption, with Satterthwaite-style df2.  Groups = event
# types, observations = daily counts; per-group n / sum / sum-sq are
# exact BIGINT; the weight chain w_j = n_j / s_j^2 and the F*/df2
# assembly run over the BOUNDED group table (k rows, e9-floored per
# group before cross-group sums — order-free).


def q_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    ).filter(F.col("n") >= 3)
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
        / (nd * (nd - 1.0))
    )
    wcol = nd / var
    g = g.filter(var > 0).select(
        "event_type",
        F.col("n").alias("n"),
        F.floor(wcol * 1e9 + F.lit(_OFF)).cast("long").alias("w9"),
        F.floor(wcol * mean * 1e9 + F.lit(_OFF)).cast("long").alias("wm9"),
        F.floor(wcol * mean * mean * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("wmm9"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("w9").alias("sw9"),
        F.sum("wm9").alias("swm9"),
        F.sum("wmm9").alias("swmm9"),
    )
    j = g.crossJoin(F.broadcast(tot))
    kd = F.col("k").cast("double")
    w = F.col("w9").cast("double") / 1e9
    sw = F.col("sw9").cast("double") / 1e9
    term = (1.0 - w / sw) * (1.0 - w / sw) / (F.col("n").cast("double") - 1.0)
    lam = j.select(
        "k",
        "sw9",
        "swm9",
        "swmm9",
        F.floor(term * 1e9 + F.lit(_OFF)).cast("long").alias("t9"),
    ).groupBy("k", "sw9", "swm9", "swmm9").agg(F.sum("t9").alias("st9"))
    kd = F.col("k").cast("double")
    sw = F.col("sw9").cast("double") / 1e9
    swm = F.col("swm9").cast("double") / 1e9
    swmm = F.col("swmm9").cast("double") / 1e9
    lt = F.col("st9").cast("double") / 1e9
    gbar = swm / sw
    num = (swmm - sw * gbar * gbar) / (kd - 1.0)
    den = 1.0 + 2.0 * (kd - 2.0) / (kd * kd - 1.0) * lt
    fstar = num / den
    df2 = (kd * kd - 1.0) / (3.0 * lt)
    return lam.filter((F.col("k") >= 3) & (F.col("st9") > 0)).select(
        F.col("k").cast("long").alias("k_groups"),
        F.floor(fstar * 10_000 + F.lit(_OFF)).cast("long").alias(
            "fstar_e4"
        ),
        F.floor(df2 * 100 + F.lit(_OFF)).cast("long").alias("df2_e2"),
    )


SQL_WELCH_ANOVA = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), g0 AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(y * y) AS BIGINT) AS ss
  FROM daily GROUP BY 1
), g AS (
  SELECT event_type, n,
         CAST(floor(CAST(n AS DOUBLE)
                    / (CAST(n * ss - s * s AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1.0)))
                    * 1e9 + {_OFF}) AS BIGINT) AS w9,
         CAST(floor(CAST(n AS DOUBLE)
                    / (CAST(n * ss - s * s AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1.0)))
                    * (CAST(s AS DOUBLE) / n) * 1e9 + {_OFF})
              AS BIGINT) AS wm9,
         CAST(floor(CAST(n AS DOUBLE)
                    / (CAST(n * ss - s * s AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1.0)))
                    * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
                    * 1e9 + {_OFF}) AS BIGINT) AS wmm9
  FROM g0
  WHERE n >= 3 AND n * ss - s * s > 0
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(w9) AS BIGINT) AS sw9,
         CAST(sum(wm9) AS BIGINT) AS swm9,
         CAST(sum(wmm9) AS BIGINT) AS swmm9
  FROM g
), lam AS (
  SELECT tot.k, tot.sw9, tot.swm9, tot.swmm9,
         CAST(sum(CAST(floor((1.0 - (CAST(g.w9 AS DOUBLE) / 1e9)
                                    / (CAST(tot.sw9 AS DOUBLE) / 1e9))
                             * (1.0 - (CAST(g.w9 AS DOUBLE) / 1e9)
                                      / (CAST(tot.sw9 AS DOUBLE) / 1e9))
                             / (CAST(g.n AS DOUBLE) - 1.0) * 1e9 + {_OFF})
                        AS BIGINT)) AS BIGINT) AS st9
  FROM g CROSS JOIN tot
  GROUP BY 1, 2, 3, 4
)
SELECT k AS k_groups,
       CAST(floor(((CAST(swmm9 AS DOUBLE) / 1e9
                    - (CAST(sw9 AS DOUBLE) / 1e9)
                      * ((CAST(swm9 AS DOUBLE) / 1e9)
                         / (CAST(sw9 AS DOUBLE) / 1e9))
                      * ((CAST(swm9 AS DOUBLE) / 1e9)
                         / (CAST(sw9 AS DOUBLE) / 1e9)))
                   / (CAST(k AS DOUBLE) - 1.0))
                  / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
                         / (CAST(k AS DOUBLE) * k - 1.0)
                         * (CAST(st9 AS DOUBLE) / 1e9))
                  * 10000 + {_OFF}) AS BIGINT) AS fstar_e4,
       CAST(floor((CAST(k AS DOUBLE) * k - 1.0)
                  / (3.0 * (CAST(st9 AS DOUBLE) / 1e9)) * 100 + {_OFF})
            AS BIGINT) AS df2_e2
FROM lam
WHERE k >= 3 AND st9 > 0
"""


# ---------------------------------------------------------------------------
# markov_stationary — power-iteration stationary law vs empirical mix
# ---------------------------------------------------------------------------
# The stationary distribution of the event-type transition chain
# (3 unrolled power iterations from uniform — the fixed-iteration
# SQL-expressible design of domain_pagerank) compared to the
# empirical type mix: a large gap flags non-ergodic sampling.
# Transition probabilities are e9-floored integers; the state vector
# is REFLOORED to e9 after every iteration, so the <= k-term fold can
# never leak sum-order noise.


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    tr = (
        ev.select(
            "user_id", "event_id", "event_type", sec.cast("long").alias("s")
        )
        .withColumn("nxt", F.lead("event_type").over(wo))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rowtot = tr.groupBy("a").agg(F.sum("c").alias("t"))
    pmat = tr.join(F.broadcast(rowtot), "a").select(
        "a",
        "b",
        F.floor(
            F.col("c").cast("double") / F.col("t").cast("double") * 1e9
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("p9"),
    )
    states = rowtot.select(F.col("a").alias("st"))
    nstates = states.count()
    v = states.select(
        "st",
        F.lit(int(round(1e9 / nstates))).alias("v9"),
    )
    for _ in range(3):
        v = (
            pmat.join(v.withColumnRenamed("st", "a"), "a")
            .groupBy(F.col("b").alias("st"))
            .agg(
                F.floor(
                    F.sum(
                        F.col("p9").cast("double")
                        * F.col("v9").cast("double")
                        / 1e9
                    )
                    + F.lit(_OFF)
                )
                .cast("long")
                .alias("v9")
            )
        )
    emp = ev.groupBy(F.col("event_type").alias("st")).agg(
        F.count(F.lit(1)).alias("c")
    )
    etot = emp.agg(F.sum("c").alias("t"))
    emp = emp.crossJoin(F.broadcast(etot)).select(
        "st",
        F.floor(
            F.col("c").cast("double") / F.col("t").cast("double") * 1e9
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("e9"),
    )
    out = v.join(emp, "st")
    return out.select(
        F.col("st").alias("event_type"),
        F.floor(F.col("v9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("stationary_e6"),
        F.floor(F.col("e9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("empirical_e6"),
        F.floor(
            F.abs(F.col("v9") - F.col("e9")).cast("double")
            / 1e9
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("absdiff_e6"),
    ).orderBy("event_type")


def _sql_markov_stationary() -> str:
    iters = []
    prev = "v0"
    for i in range(1, 4):
        iters.append(f"""
v{i} AS MATERIALIZED (
  SELECT p.b AS st,
         CAST(floor(sum(CAST(p.p9 AS DOUBLE) * v.v9 / 1e9) + {{OFF}})
              AS BIGINT) AS v9
  FROM pmat p JOIN {prev} v ON v.st = p.a
  GROUP BY 1
)""")
        prev = f"v{i}"
    chain = ",".join(iters)
    return f"""
WITH tr AS (
  SELECT event_type AS a,
         lead(event_type) OVER (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS b
  FROM events QUALIFY b IS NOT NULL
), cnt AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2
), rowtot AS (
  SELECT a, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1
), pmat AS MATERIALIZED (
  SELECT cnt.a, cnt.b,
         CAST(floor(CAST(cnt.c AS DOUBLE) / rowtot.t * 1e9 + {{OFF}})
              AS BIGINT) AS p9
  FROM cnt JOIN rowtot ON rowtot.a = cnt.a
), nst AS (
  SELECT CAST(count(*) AS BIGINT) AS k FROM rowtot
), v0 AS (
  SELECT a AS st,
         CAST(round(1e9 / (SELECT k FROM nst)) AS BIGINT) AS v9
  FROM rowtot
),{chain},
emp AS (
  SELECT event_type AS st,
         CAST(floor(CAST(count(*) AS DOUBLE)
                    / (SELECT count(*) FROM events) * 1e9 + {{OFF}})
              AS BIGINT) AS e9
  FROM events GROUP BY 1
)
SELECT v.st AS event_type,
       CAST(floor(CAST(v.v9 AS DOUBLE) / 1e9 * 1000000 + {{OFF}})
            AS BIGINT) AS stationary_e6,
       CAST(floor(CAST(emp.e9 AS DOUBLE) / 1e9 * 1000000 + {{OFF}})
            AS BIGINT) AS empirical_e6,
       CAST(floor(CAST(abs(v.v9 - emp.e9) AS DOUBLE) / 1e9 * 1000000
                  + {{OFF}}) AS BIGINT) AS absdiff_e6
FROM {prev} v JOIN emp ON emp.st = v.st
ORDER BY event_type
""".format(OFF=_OFF)



# ---------------------------------------------------------------------------
# topk_tenure — tenure distribution of weekly top-10 users
# ---------------------------------------------------------------------------
# Leaderboard persistence: for every user who EVER enters the weekly
# top-10 (by event count, ties -> user_id asc), how many weeks do they
# hold a slot?  Complements topk_churn (which measures set turnover)
# with the per-member tenure histogram.  Rank windows are per-week
# (bounded); everything is exact counting.


def q_topk_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wk = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / (86_400_000_000 * 7)
    )
    per = ev.groupBy(wk.cast("long").alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    wr = Window.partitionBy("w").orderBy(F.desc("c"), F.asc("user_id"))
    top = per.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 10
    )
    ten = top.groupBy("user_id").agg(F.count(F.lit(1)).alias("tenure"))
    hist = ten.groupBy("tenure").agg(F.count(F.lit(1)).alias("n_users"))
    tot = hist.agg(F.sum("n_users").alias("t"))
    out = hist.crossJoin(F.broadcast(tot))
    return out.select(
        F.col("tenure").cast("long").alias("tenure_weeks"),
        F.col("n_users").cast("long").alias("n_users"),
        F.floor(
            F.col("n_users").cast("double") / F.col("t").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("share_e6"),
    ).orderBy("tenure_weeks")


SQL_TOPK_TENURE = f"""
WITH per AS (
  SELECT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w, user_id,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), top AS (
  SELECT user_id FROM (
    SELECT w, user_id,
           row_number() OVER (PARTITION BY w
                              ORDER BY c DESC, user_id ASC) AS rk
    FROM per
  ) WHERE rk <= 10
), ten AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS tenure
  FROM top GROUP BY 1
), hist AS (
  SELECT tenure, CAST(count(*) AS BIGINT) AS n_users
  FROM ten GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_users) AS BIGINT) AS t FROM hist
)
SELECT tenure AS tenure_weeks, n_users,
       CAST(floor(CAST(n_users AS DOUBLE) / t * 1000000 + {_OFF})
            AS BIGINT) AS share_e6
FROM hist CROSS JOIN tot
ORDER BY tenure_weeks
"""


# ---------------------------------------------------------------------------
# nested_variance_components — day-within-week variance decomposition
# ---------------------------------------------------------------------------
# Searle, Casella & McCulloch (Variance Components, 1992 ch. 3): the
# two-level nested random model hourly = mu + week + day(week) + e,
# estimated by the ANOVA method of moments on the GLOBAL hourly count
# series.  All sums of squares come from exact BIGINT sums with the
# per-group S^2/n terms e6-floored (bounded group tables); the
# coefficient chain (unbalanced k-factors) is fixed-order.


def q_nested_variance_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hr = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
    ).cast("long")
    h = ev.groupBy(hr.alias("h")).agg(F.count(F.lit(1)).alias("y"))
    h = h.select(
        (F.floor(F.col("h") / 168)).cast("long").alias("wk"),
        (F.floor(F.col("h") / 24)).cast("long").alias("day"),
        "y",
    )
    dayg = h.groupBy("wk", "day").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("y").alias("sd"),
    )
    rat_d = (F.col("sd") * F.col("sd")).cast("double") / F.col("nd").cast(
        "double"
    )
    dayg = dayg.withColumn(
        "r6", F.floor(rat_d * 1e6 + F.lit(_OFF)).cast("long")
    )
    wkg = dayg.groupBy("wk").agg(
        F.sum("nd").alias("nw"),
        F.sum("sd").alias("sw"),
        F.sum("r6").alias("rd6"),
        F.sum(F.col("nd") * F.col("nd")).alias("snd2"),
        F.count(F.lit(1)).alias("days_in_wk"),
    )
    rat_w = (F.col("sw") * F.col("sw")).cast("double") / F.col("nw").cast(
        "double"
    )
    wkg = wkg.withColumn(
        "rw6", F.floor(rat_w * 1e6 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "k6",
        F.floor(
            F.col("snd2").cast("double") / F.col("nw").cast("double") * 1e6
            + F.lit(_OFF)
        ).cast("long"),
    )
    tot = h.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    lv = wkg.agg(
        F.count(F.lit(1)).alias("a"),
        F.sum("days_in_wk").alias("b"),
        F.sum("rw6").alias("srw6"),
        F.sum("rd6").alias("srd6"),
        F.sum("k6").alias("sk6"),
        F.sum("snd2").alias("snd2"),
        F.sum((F.col("nw") * F.col("nw")).cast("long")).alias("snw2"),
    )
    j = tot.crossJoin(F.broadcast(lv))
    nd = F.col("n").cast("double")
    cf = F.col("s").cast("double") * F.col("s").cast("double") / nd
    ssw = F.col("srw6").cast("double") / 1e6 - cf
    ssd = (F.col("srd6") - F.col("srw6")).cast("double") / 1e6
    sse = F.col("syy").cast("double") - F.col("srd6").cast("double") / 1e6
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    msw = ssw / (a - 1.0)
    msd = ssd / (b - a)
    mse = sse / (nd - b)
    k1 = (nd - F.col("sk6").cast("double") / 1e6) / (b - a)
    k2 = (
        F.col("sk6").cast("double") / 1e6
        - F.col("snd2").cast("double") / nd
    ) / (a - 1.0)
    k3 = (nd - F.col("snw2").cast("double") / nd) / (a - 1.0)
    var_e = mse
    var_d = (msd - mse) / k1
    var_w = (msw - mse - k2 * var_d) / k3
    return j.filter(
        (F.col("a") >= 2) & (b > a) & (nd > b)
    ).select(
        F.col("a").cast("long").alias("n_weeks"),
        F.col("b").cast("long").alias("n_days"),
        F.col("n").cast("long").alias("n_hours"),
        F.floor(var_w * 100 + F.lit(_OFF)).cast("long").alias("var_week_e2"),
        F.floor(var_d * 100 + F.lit(_OFF)).cast("long").alias("var_day_e2"),
        F.floor(var_e * 100 + F.lit(_OFF)).cast("long").alias(
            "var_resid_e2"
        ),
    )


SQL_NESTED_VAR = f"""
WITH h AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hh,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), lv AS (
  SELECT CAST(floor(hh / 168.0) AS BIGINT) AS wk,
         CAST(floor(hh / 24.0) AS BIGINT) AS day, y
  FROM h
), dayg AS (
  SELECT wk, day, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(y) AS BIGINT) AS sd
  FROM lv GROUP BY 1, 2
), dayg6 AS (
  SELECT wk, day, nd, sd,
         CAST(floor(CAST(sd * sd AS DOUBLE) / nd * 1e6 + {_OFF})
              AS BIGINT) AS r6
  FROM dayg
), wkg AS (
  SELECT wk, CAST(sum(nd) AS BIGINT) AS nw,
         CAST(sum(sd) AS BIGINT) AS sw,
         CAST(sum(r6) AS BIGINT) AS rd6,
         CAST(sum(nd * nd) AS BIGINT) AS snd2,
         CAST(count(*) AS BIGINT) AS days_in_wk
  FROM dayg6 GROUP BY 1
), wkg6 AS (
  SELECT wk, nw, sw, rd6, snd2, days_in_wk,
         CAST(floor(CAST(sw * sw AS DOUBLE) / nw * 1e6 + {_OFF})
              AS BIGINT) AS rw6,
         CAST(floor(CAST(snd2 AS DOUBLE) / nw * 1e6 + {_OFF})
              AS BIGINT) AS k6
  FROM wkg
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM lv
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS a,
         CAST(sum(days_in_wk) AS BIGINT) AS b,
         CAST(sum(rw6) AS BIGINT) AS srw6,
         CAST(sum(rd6) AS BIGINT) AS srd6,
         CAST(sum(k6) AS BIGINT) AS sk6,
         CAST(sum(snd2) AS BIGINT) AS snd2,
         CAST(sum(nw * nw) AS BIGINT) AS snw2
  FROM wkg6
), f AS (
  SELECT tot.n, tot.s, tot.syy, agg.*,
         (CAST(srw6 AS DOUBLE) / 1e6
          - CAST(s AS DOUBLE) * s / n) / (CAST(a AS DOUBLE) - 1.0) AS msw,
         (CAST(srd6 - srw6 AS DOUBLE) / 1e6)
           / (CAST(b AS DOUBLE) - a) AS msd,
         (CAST(syy AS DOUBLE) - CAST(srd6 AS DOUBLE) / 1e6)
           / (CAST(n AS DOUBLE) - b) AS mse,
         (CAST(n AS DOUBLE) - CAST(sk6 AS DOUBLE) / 1e6)
           / (CAST(b AS DOUBLE) - a) AS k1,
         (CAST(sk6 AS DOUBLE) / 1e6 - CAST(snd2 AS DOUBLE) / n)
           / (CAST(a AS DOUBLE) - 1.0) AS k2,
         (CAST(n AS DOUBLE) - CAST(snw2 AS DOUBLE) / n)
           / (CAST(a AS DOUBLE) - 1.0) AS k3
  FROM tot CROSS JOIN agg
)
SELECT a AS n_weeks, b AS n_days, n AS n_hours,
       CAST(floor((msw - mse - k2 * ((msd - mse) / k1)) / k3 * 100
                  + {_OFF}) AS BIGINT) AS var_week_e2,
       CAST(floor((msd - mse) / k1 * 100 + {_OFF}) AS BIGINT)
         AS var_day_e2,
       CAST(floor(mse * 100 + {_OFF}) AS BIGINT) AS var_resid_e2
FROM f
WHERE a >= 2 AND b > a AND n > b
"""


# ---------------------------------------------------------------------------
# diel_amplitude_drift — week-over-week drift of the diel peak/mean ratio
# ---------------------------------------------------------------------------
# The amplitude companion to diel_phase_drift (queries_stats7): per
# week, the diel profile's max-hour share over its mean-hour share
# (peak-to-mean ratio, exact rational off hourly integer counts);
# then the OLS drift across weeks on e9-floored weekly ratios.


def q_diel_amplitude_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.unix_micros(F.col("ts").cast("timestamp"))
    per = ev.groupBy(
        "event_type",
        F.floor(sec / (86_400_000_000 * 7)).cast("long").alias("wk"),
        (F.floor(sec / 3_600_000_000) % 24).cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wkly = per.groupBy("event_type", "wk").agg(
        F.max("c").alias("peak"),
        F.sum("c").alias("tot"),
        F.count(F.lit(1)).alias("n_hrs"),
    )
    ratio = (
        F.col("peak").cast("double")
        * F.col("n_hrs").cast("double")
        / F.col("tot").cast("double")
    )
    wkly = wkly.filter(F.col("tot") > 0).select(
        "event_type",
        "wk",
        F.floor(ratio * 1e9 + F.lit(_OFF)).cast("long").alias("r9"),
    )
    yd = F.col("r9").cast("double") / 1e9
    pts = wkly.select(
        "event_type",
        "wk",
        "r9",
        F.floor(F.col("wk").cast("double") * yd * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("xy9"),
        (F.col("wk") * F.col("wk")).alias("xx"),
    )
    agg = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("wk").alias("sw"),
        F.sum("r9").alias("sr9"),
        F.sum("xy9").alias("sxy9"),
        F.sum("xx").alias("sxx"),
    )
    md = F.col("m").cast("double")
    sw = F.col("sw").cast("double")
    sr = F.col("sr9").cast("double") / 1e9
    sxy = F.col("sxy9").cast("double") / 1e9
    sxx = F.col("sxx").cast("double")
    den = md * sxx - sw * sw
    slope = (md * sxy - sw * sr) / den
    return agg.filter((F.col("m") >= 3) & (den > 0)).select(
        "event_type",
        F.col("m").cast("long").alias("n_weeks"),
        F.floor(sr / md * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mean_ratio_e4"
        ),
        F.floor(slope * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "slope_e6"
        ),
    ).orderBy("event_type")


SQL_DIEL_AMPLITUDE = f"""
WITH per AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
), wkly AS (
  SELECT event_type, wk,
         CAST(floor(CAST(max(c) AS DOUBLE) * count(*) / sum(c) * 1e9
                    + {_OFF}) AS BIGINT) AS r9
  FROM per GROUP BY 1, 2 HAVING sum(c) > 0
), pts AS (
  SELECT event_type, wk, r9,
         CAST(floor(CAST(wk AS DOUBLE) * (CAST(r9 AS DOUBLE) / 1e9) * 1e9
                    + {_OFF}) AS BIGINT) AS xy9,
         CAST(wk * wk AS BIGINT) AS xx
  FROM wkly
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(wk) AS BIGINT) AS sw,
         CAST(sum(r9) AS BIGINT) AS sr9,
         CAST(sum(xy9) AS BIGINT) AS sxy9,
         CAST(sum(xx) AS BIGINT) AS sxx
  FROM pts GROUP BY 1
)
SELECT event_type, m AS n_weeks,
       CAST(floor((CAST(sr9 AS DOUBLE) / 1e9) / m * 10000 + {_OFF})
            AS BIGINT) AS mean_ratio_e4,
       CAST(floor((CAST(m AS DOUBLE) * (CAST(sxy9 AS DOUBLE) / 1e9)
                   - CAST(sw AS DOUBLE) * (CAST(sr9 AS DOUBLE) / 1e9))
                  / (CAST(m AS DOUBLE) * sxx
                     - CAST(sw AS DOUBLE) * sw)
                  * 1000000 + {_OFF}) AS BIGINT) AS slope_e6
FROM agg
WHERE m >= 3
  AND CAST(m AS DOUBLE) * sxx - CAST(sw AS DOUBLE) * sw > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# transition_predictability — modal next-event hit rate per user
# ---------------------------------------------------------------------------
# Song, Qu, Blumm & Barabasi (Science 327, 2010) operationalized as
# the 1-step Markov hit rate: for each user and current type, the
# MODAL next type (ties -> lexicographically smallest) predicts; the
# hit rate is the summed modal counts over total transitions — pure
# exact counting with deterministic tie-breaks.


def q_transition_predictability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    tr = (
        ev.select(
            "user_id", "event_id", "event_type", sec.cast("long").alias("s")
        )
        .withColumn("nxt", F.lead("event_type").over(wo))
        .filter(F.col("nxt").isNotNull())
        .groupBy("user_id", F.col("event_type").alias("a"), F.col("nxt"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wm = Window.partitionBy("user_id", "a").orderBy(
        F.desc("c"), F.asc("nxt")
    )
    modal = tr.withColumn("rk", F.row_number().over(wm)).filter(
        F.col("rk") == 1
    )
    hits = modal.groupBy("user_id").agg(F.sum("c").alias("hit"))
    tots = tr.groupBy("user_id").agg(F.sum("c").alias("tot"))
    j = hits.join(tots, "user_id").filter(F.col("tot") >= 10)
    rate = F.col("hit").cast("double") / F.col("tot").cast("double")
    return j.select(
        "user_id",
        F.col("tot").cast("long").alias("n_transitions"),
        F.col("hit").cast("long").alias("n_hits"),
        F.floor(rate * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "hit_rate_e6"
        ),
    ).orderBy("user_id")


SQL_PREDICTABILITY = f"""
WITH tr0 AS (
  SELECT user_id, event_type AS a,
         lead(event_type) OVER (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS nxt
  FROM events QUALIFY nxt IS NOT NULL
), tr AS (
  SELECT user_id, a, nxt, CAST(count(*) AS BIGINT) AS c
  FROM tr0 GROUP BY 1, 2, 3
), modal AS (
  SELECT user_id, c FROM (
    SELECT user_id, a, c,
           row_number() OVER (PARTITION BY user_id, a
                              ORDER BY c DESC, nxt ASC) AS rk
    FROM tr
  ) WHERE rk = 1
), hits AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS hit FROM modal GROUP BY 1
), tots AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS tot FROM tr GROUP BY 1
)
SELECT h.user_id, t.tot AS n_transitions, h.hit AS n_hits,
       CAST(floor(CAST(h.hit AS DOUBLE) / t.tot * 1000000 + {_OFF})
            AS BIGINT) AS hit_rate_e6
FROM hits h JOIN tots t ON t.user_id = h.user_id
WHERE t.tot >= 10
ORDER BY h.user_id
"""



# ---------------------------------------------------------------------------
# fleiss_kappa — multi-rater agreement over three in-engine labelers
# ---------------------------------------------------------------------------
# Fleiss (Psych Bull 76, 1971): kappa for m = 3 raters x binary
# categories per language.  Raters: doc length, TTR (the shared
# cohens_kappa pair) plus type count, each split at its exact
# per-language lower median.  P-bar and Pe-bar are exact rationals:
# per-doc agreement pairs sum_j n_ij (n_ij - 1) are integers, and the
# category shares come off exact counts — one fixed-order chain.


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "lang",
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias(
            "n_types"
        ),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks"),
    )
    d = d.withColumn(
        "ttr_e6",
        F.floor(
            F.col("n_types").cast("double") / F.col("n_toks") * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    wn = Window.partitionBy("lang")
    r = d
    for col, rcol in (
        ("n_chars", "r_len"),
        ("ttr_e6", "r_ttr"),
        ("n_types", "r_typ"),
    ):
        w = Window.partitionBy("lang").orderBy(col, "doc_id")
        r = r.withColumn(rcol, F.row_number().over(w))
    r = r.withColumn("nn", F.count(F.lit(1)).over(wn))
    med = F.floor((F.col("nn") - 1) / 2) + 1
    meds = r.groupBy("lang").agg(
        F.max(F.when(F.col("r_len") == med, F.col("n_chars"))).alias(
            "m_len"
        ),
        F.max(F.when(F.col("r_ttr") == med, F.col("ttr_e6"))).alias(
            "m_ttr"
        ),
        F.max(F.when(F.col("r_typ") == med, F.col("n_types"))).alias(
            "m_typ"
        ),
    )
    lab = d.join(F.broadcast(meds), "lang").select(
        "lang",
        (
            (F.col("n_chars") > F.col("m_len")).cast("long")
            + (F.col("ttr_e6") > F.col("m_ttr")).cast("long")
            + (F.col("n_types") > F.col("m_typ")).cast("long")
        ).alias("k1"),
    )
    # per-doc: k1 raters said 1, (3 - k1) said 0; pair-agreement count
    pairs = lab.select(
        "lang",
        "k1",
        (
            F.col("k1") * (F.col("k1") - 1)
            + (3 - F.col("k1")) * (2 - F.col("k1"))
        ).alias("agree2"),
    )
    agg = pairs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("agree2").alias("sa"),
        F.sum("k1").alias("s1"),
    )
    nd = F.col("n").cast("double")
    pbar = F.col("sa").cast("double") / (nd * 6.0)
    p1 = F.col("s1").cast("double") / (nd * 3.0)
    pe = p1 * p1 + (1.0 - p1) * (1.0 - p1)
    kappa = (pbar - pe) / (1.0 - pe)
    return agg.filter((F.col("n") >= 4) & (pe < 1.0)).select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.floor(pbar * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "pbar_e6"
        ),
        F.floor(pe * 1_000_000 + F.lit(_OFF)).cast("long").alias("pe_e6"),
        F.floor(kappa * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "kappa_e6"
        ),
    ).orderBy("lang")


SQL_FLEISS = f"""
WITH d AS (
  SELECT lang, doc_id, n_chars,
         len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
           AS n_types,
         CAST(floor(CAST(len(list_distinct(
                  regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE)
                    / len(regexp_split_to_array(trim(text), '\\s+'))
                    * 1000000 + {_OFF}) AS BIGINT) AS ttr_e6
  FROM documents
), r AS (
  SELECT lang, doc_id, n_chars, ttr_e6, n_types,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS r_len,
         row_number() OVER (PARTITION BY lang
                            ORDER BY ttr_e6, doc_id) AS r_ttr,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_types, doc_id) AS r_typ,
         count(*) OVER (PARTITION BY lang) AS nn
  FROM d
), meds AS (
  SELECT lang,
         max(CASE WHEN r_len = (nn - 1) // 2 + 1 THEN n_chars END) AS m_len,
         max(CASE WHEN r_ttr = (nn - 1) // 2 + 1 THEN ttr_e6 END) AS m_ttr,
         max(CASE WHEN r_typ = (nn - 1) // 2 + 1 THEN n_types END) AS m_typ
  FROM r GROUP BY 1
), lab AS (
  SELECT d.lang,
         (CASE WHEN d.n_chars > m.m_len THEN 1 ELSE 0 END
          + CASE WHEN d.ttr_e6 > m.m_ttr THEN 1 ELSE 0 END
          + CASE WHEN d.n_types > m.m_typ THEN 1 ELSE 0 END) AS k1
  FROM d JOIN meds m ON m.lang = d.lang
), agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(k1 * (k1 - 1) + (3 - k1) * (2 - k1)) AS BIGINT) AS sa,
         CAST(sum(k1) AS BIGINT) AS s1
  FROM lab GROUP BY 1
), f AS (
  SELECT lang, n,
         CAST(sa AS DOUBLE) / (CAST(n AS DOUBLE) * 6.0) AS pbar,
         (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0))
           * (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0))
         + (1.0 - CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0))
           * (1.0 - CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 3.0)) AS pe
  FROM agg
)
SELECT lang, n AS n_docs,
       CAST(floor(pbar * 1000000 + {_OFF}) AS BIGINT) AS pbar_e6,
       CAST(floor(pe * 1000000 + {_OFF}) AS BIGINT) AS pe_e6,
       CAST(floor((pbar - pe) / (1.0 - pe) * 1000000 + {_OFF})
            AS BIGINT) AS kappa_e6
FROM f
WHERE n >= 4 AND pe < 1.0
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# burst_excitation — short-horizon clustering vs the memoryless bar
# ---------------------------------------------------------------------------
# A one-number self-excitation screen (the Hawkes intuition without
# the fit): the observed share of inter-event gaps <= 60 s against
# the exponential null 1 - exp(-60 / mean-gap).  Gaps are exact
# integer seconds off one per-type lag; the null needs one exp().


def q_burst_excitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("event_type").orderBy("s", "event_id")
    g = (
        ev.select("event_type", "event_id", sec.cast("long").alias("s"))
        .withColumn("prev", F.lag("s").over(wo))
        .filter(F.col("prev").isNotNull())
        .select("event_type", (F.col("s") - F.col("prev")).alias("gap"))
    )
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("sg"),
        F.sum((F.col("gap") <= 60).cast("long")).alias("n60"),
    )
    nd = F.col("n").cast("double")
    obs = F.col("n60").cast("double") / nd
    mean_gap = F.col("sg").cast("double") / nd
    expv = 1.0 - F.exp(-60.0 / mean_gap)
    return agg.filter((F.col("n") >= 10) & (F.col("sg") > 0)).select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.floor(obs * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "obs_share_e6"
        ),
        F.floor(expv * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "null_share_e6"
        ),
        F.floor(obs / expv * 10_000 + F.lit(_OFF)).cast("long").alias(
            "excitation_e4"
        ),
    ).orderBy("event_type")


SQL_BURST_EXCITATION = f"""
WITH g AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY event_type
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
           AS gap
  FROM events QUALIFY gap IS NOT NULL
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(gap) AS BIGINT) AS sg,
         CAST(sum(CASE WHEN gap <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS n60
  FROM g GROUP BY 1
)
SELECT event_type, n AS n_gaps,
       CAST(floor(CAST(n60 AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS obs_share_e6,
       CAST(floor((1.0 - exp(-60.0 / (CAST(sg AS DOUBLE) / n)))
                  * 1000000 + {_OFF}) AS BIGINT) AS null_share_e6,
       CAST(floor((CAST(n60 AS DOUBLE) / n)
                  / (1.0 - exp(-60.0 / (CAST(sg AS DOUBLE) / n)))
                  * 10000 + {_OFF}) AS BIGINT) AS excitation_e4
FROM agg
WHERE n >= 10 AND sg > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# type_run_lengths — run-length census of the per-user event-type stream
# ---------------------------------------------------------------------------
# Mood (Ann Math Stat 11, 1940) runs machinery applied to the symbol
# stream: per event type, the distribution of consecutive-repeat run
# lengths across users (runs via the lag != current break trick, all
# exact integers).


def q_type_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = (
        ev.select(
            "user_id", "event_id", "event_type", sec.cast("long").alias("s")
        )
        .withColumn("prev_t", F.lag("event_type").over(wo))
        .withColumn(
            "brk",
            (
                F.col("prev_t").isNull()
                | (F.col("prev_t") != F.col("event_type"))
            ).cast("long"),
        )
        .withColumn(
            "rid",
            F.sum("brk").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    runs = g.groupBy("user_id", "rid", "event_type").agg(
        F.count(F.lit(1)).alias("len")
    )
    agg = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.sum("len").alias("sl"),
        F.max("len").alias("max_len"),
        F.sum((F.col("len") >= 3).cast("long")).alias("n_ge3"),
    )
    mean = F.col("sl").cast("double") / F.col("n_runs").cast("double")
    return agg.select(
        "event_type",
        F.col("n_runs").cast("long").alias("n_runs"),
        F.floor(mean * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mean_len_e4"
        ),
        F.col("max_len").cast("long").alias("max_len"),
        F.col("n_ge3").cast("long").alias("n_ge3"),
    ).orderBy("event_type")


SQL_TYPE_RUNS = f"""
WITH g AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(event_type) OVER (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev_t
  FROM events
), b AS (
  SELECT user_id, event_type,
         CAST(sum(CASE WHEN prev_t IS NULL OR prev_t <> event_type
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, event_id)
              AS BIGINT) AS rid
  FROM g
), runs AS (
  SELECT user_id, rid, event_type, CAST(count(*) AS BIGINT) AS len
  FROM b GROUP BY 1, 2, 3
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_runs,
       CAST(floor(CAST(sum(len) AS DOUBLE) / count(*) * 10000 + {_OFF})
            AS BIGINT) AS mean_len_e4,
       CAST(max(len) AS BIGINT) AS max_len,
       CAST(sum(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge3
FROM runs
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# winsor_impact — how much does winsorizing move the mean?
# ---------------------------------------------------------------------------
# Dixon (Ann Math Stat 31, 1960) winsorized means as a robustness
# audit: per event type, the mean of centivalues vs the mean after
# clipping at the exact (p01, p99), (p05, p95), (p10, p90) order
# statistics of the centivalue domain.  Quantiles are exact inverse-
# CDF order stats on the integer value domain; clipped sums are exact
# BIGINT (clamp then sum).


def q_winsor_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cnt = v.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    cum = cnt.withColumn(
        "cum", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("c").over(wn))
    qs = None
    for nm, pct in (
        ("q01", 1), ("q05", 5), ("q10", 10),
        ("q90", 90), ("q95", 95), ("q99", 99),
    ):
        k = F.expr(f"((tot - 1) * {pct}) div 100") + 1
        sel = cum.filter(
            ((F.col("cum") - F.col("c")) < k) & (k <= F.col("cum"))
        ).select("event_type", F.col("v").alias(nm))
        qs = sel if qs is None else qs.join(sel, "event_type")
    j = v.join(F.broadcast(qs), "event_type")

    def clip(lo, hi):
        return F.greatest(F.least(F.col("v"), F.col(hi)), F.col(lo))

    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s0"),
        F.sum(clip("q01", "q99")).alias("s1"),
        F.sum(clip("q05", "q95")).alias("s5"),
        F.sum(clip("q10", "q90")).alias("s10"),
    )
    nd = F.col("n").cast("double")

    def m(c):
        return F.floor(
            F.col(c).cast("double") / nd / 100.0 * 10_000 + F.lit(_OFF)
        ).cast("long")

    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        m("s0").alias("mean_e4"),
        m("s1").alias("w01_mean_e4"),
        m("s5").alias("w05_mean_e4"),
        m("s10").alias("w10_mean_e4"),
    ).orderBy("event_type")


SQL_WINSOR = f"""
WITH v AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cnt AS (
  SELECT event_type, v, count(*) AS c FROM v GROUP BY 1, 2
), cum AS (
  SELECT event_type, v, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS tot
  FROM cnt
), q AS (
  SELECT event_type,
         max(CASE WHEN cum - c < ((tot - 1) * 1) // 100 + 1
                   AND ((tot - 1) * 1) // 100 + 1 <= cum THEN v END) AS q01,
         max(CASE WHEN cum - c < ((tot - 1) * 5) // 100 + 1
                   AND ((tot - 1) * 5) // 100 + 1 <= cum THEN v END) AS q05,
         max(CASE WHEN cum - c < ((tot - 1) * 10) // 100 + 1
                   AND ((tot - 1) * 10) // 100 + 1 <= cum THEN v END) AS q10,
         max(CASE WHEN cum - c < ((tot - 1) * 90) // 100 + 1
                   AND ((tot - 1) * 90) // 100 + 1 <= cum THEN v END) AS q90,
         max(CASE WHEN cum - c < ((tot - 1) * 95) // 100 + 1
                   AND ((tot - 1) * 95) // 100 + 1 <= cum THEN v END) AS q95,
         max(CASE WHEN cum - c < ((tot - 1) * 99) // 100 + 1
                   AND ((tot - 1) * 99) // 100 + 1 <= cum THEN v END) AS q99
  FROM cum GROUP BY 1
), agg AS (
  SELECT v.event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v.v) AS BIGINT) AS s0,
         CAST(sum(greatest(least(v.v, q.q99), q.q01)) AS BIGINT) AS s1,
         CAST(sum(greatest(least(v.v, q.q95), q.q05)) AS BIGINT) AS s5,
         CAST(sum(greatest(least(v.v, q.q90), q.q10)) AS BIGINT) AS s10
  FROM v JOIN q ON q.event_type = v.event_type
  GROUP BY 1
)
SELECT event_type, n,
       CAST(floor(CAST(s0 AS DOUBLE) / n / 100.0 * 10000 + {_OFF})
            AS BIGINT) AS mean_e4,
       CAST(floor(CAST(s1 AS DOUBLE) / n / 100.0 * 10000 + {_OFF})
            AS BIGINT) AS w01_mean_e4,
       CAST(floor(CAST(s5 AS DOUBLE) / n / 100.0 * 10000 + {_OFF})
            AS BIGINT) AS w05_mean_e4,
       CAST(floor(CAST(s10 AS DOUBLE) / n / 100.0 * 10000 + {_OFF})
            AS BIGINT) AS w10_mean_e4
FROM agg
ORDER BY event_type
"""



# ---------------------------------------------------------------------------
# id_gap_audit — doc_id continuity audit per source (ingestion loss)
# ---------------------------------------------------------------------------
# Crawl/ingest pipelines assign monotone ids, so holes in the per-
# source doc_id sequence measure loss: missing = span - count, plus
# the largest single hole (max consecutive-id gap - 1, off one lag).
# All exact integers.


def q_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("source", "doc_id")
    wo = Window.partitionBy("source").orderBy("doc_id")
    g = d.withColumn("prev", F.lag("doc_id").over(wo))
    agg = g.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.max(F.col("doc_id") - F.col("prev")).alias("maxstep"),
    )
    span = F.col("hi") - F.col("lo") + 1
    missing = span - F.col("n")
    share = missing.cast("double") / span.cast("double")
    return agg.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        span.cast("long").alias("span"),
        missing.cast("long").alias("n_missing"),
        (F.col("maxstep") - 1).cast("long").alias("max_hole"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "missing_share_e6"
        ),
    ).orderBy("source")


SQL_ID_GAP = f"""
WITH g AS (
  SELECT source, doc_id,
         lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS prev
  FROM documents
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(min(doc_id) AS BIGINT) AS lo,
         CAST(max(doc_id) AS BIGINT) AS hi,
         CAST(max(doc_id - prev) AS BIGINT) AS maxstep
  FROM g GROUP BY 1
)
SELECT source, n AS n_docs,
       CAST(hi - lo + 1 AS BIGINT) AS span,
       CAST(hi - lo + 1 - n AS BIGINT) AS n_missing,
       CAST(maxstep - 1 AS BIGINT) AS max_hole,
       CAST(floor(CAST(hi - lo + 1 - n AS DOUBLE) / (hi - lo + 1)
                  * 1000000 + {_OFF}) AS BIGINT) AS missing_share_e6
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# lang_mix_drift — language-mix shift between corpus halves
# ---------------------------------------------------------------------------
# Streaming-ingest drift check: the language shares in the first vs
# second half of the doc_id RANGE (ids are the monotone ingest order,
# so the range midpoint is the scale-clean split — no partition-less
# window over the corpus), with the 2 x k chi-square of homogeneity.
# Expected counts and chi terms are per-lang (bounded).


def q_lang_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "lang")
    span = d.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    half = d.crossJoin(F.broadcast(span)).select(
        "lang",
        (
            F.col("doc_id") * 2 <= F.col("lo") + F.col("hi")
        ).cast("long").alias("h1"),
    )
    per = half.groupBy("lang").agg(
        F.sum("h1").alias("a"),
        F.sum(1 - F.col("h1")).alias("b"),
    )
    t = per.agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    j = per.crossJoin(F.broadcast(t))
    n = (F.col("ta") + F.col("tb")).cast("double")
    rowt = (F.col("a") + F.col("b")).cast("double")
    ea = rowt * F.col("ta").cast("double") / n
    eb = rowt * F.col("tb").cast("double") / n
    chi = (
        (F.col("a").cast("double") - ea) * (F.col("a").cast("double") - ea)
        / ea
        + (F.col("b").cast("double") - eb)
        * (F.col("b").cast("double") - eb)
        / eb
    )
    share1 = F.col("a").cast("double") / F.col("ta").cast("double")
    share2 = F.col("b").cast("double") / F.col("tb").cast("double")
    return j.filter((ea > 0) & (eb > 0)).select(
        "lang",
        F.col("a").cast("long").alias("n_first"),
        F.col("b").cast("long").alias("n_second"),
        F.floor(share1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "share1_e6"
        ),
        F.floor(share2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "share2_e6"
        ),
        F.floor(chi * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "chi_e6"
        ),
    ).orderBy("lang")


SQL_LANG_MIX = f"""
WITH span AS (
  SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents
), half AS (
  SELECT lang,
         CASE WHEN doc_id * 2 <= span.lo + span.hi THEN 1 ELSE 0 END AS h1
  FROM documents CROSS JOIN span
), per AS (
  SELECT lang, CAST(sum(h1) AS BIGINT) AS a,
         CAST(sum(1 - h1) AS BIGINT) AS b
  FROM half GROUP BY 1
), t AS (
  SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
  FROM per
)
SELECT lang, a AS n_first, b AS n_second,
       CAST(floor(CAST(a AS DOUBLE) / ta * 1000000 + {_OFF})
            AS BIGINT) AS share1_e6,
       CAST(floor(CAST(b AS DOUBLE) / tb * 1000000 + {_OFF})
            AS BIGINT) AS share2_e6,
       CAST(floor(((CAST(a AS DOUBLE)
                    - CAST(a + b AS DOUBLE) * ta / (ta + tb))
                   * (CAST(a AS DOUBLE)
                      - CAST(a + b AS DOUBLE) * ta / (ta + tb))
                   / (CAST(a + b AS DOUBLE) * ta / (ta + tb))
                   + (CAST(b AS DOUBLE)
                      - CAST(a + b AS DOUBLE) * tb / (ta + tb))
                     * (CAST(b AS DOUBLE)
                        - CAST(a + b AS DOUBLE) * tb / (ta + tb))
                     / (CAST(a + b AS DOUBLE) * tb / (ta + tb)))
                  * 1000000 + {_OFF}) AS BIGINT) AS chi_e6
FROM per CROSS JOIN t
WHERE CAST(a + b AS DOUBLE) * ta / (ta + tb) > 0
  AND CAST(a + b AS DOUBLE) * tb / (ta + tb) > 0
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# modal_hour_stability — does the diel peak hour move week to week?
# ---------------------------------------------------------------------------
# Per event type: the modal hour of each week (ties -> earliest hour)
# and the share of weeks whose modal hour equals the global modal
# hour — a robust, exact-integer companion to diel_phase_drift.


def q_modal_hour_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.unix_micros(F.col("ts").cast("timestamp"))
    cells = ev.groupBy(
        "event_type",
        F.floor(sec / (86_400_000_000 * 7)).cast("long").alias("wk"),
        (F.floor(sec / 3_600_000_000) % 24).cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    ww = Window.partitionBy("event_type", "wk").orderBy(
        F.desc("c"), F.asc("hr")
    )
    wmod = cells.withColumn("rk", F.row_number().over(ww)).filter(
        F.col("rk") == 1
    )
    gcells = cells.groupBy("event_type", "hr").agg(F.sum("c").alias("c"))
    wg = Window.partitionBy("event_type").orderBy(F.desc("c"), F.asc("hr"))
    gmod = gcells.withColumn("rk", F.row_number().over(wg)).filter(
        F.col("rk") == 1
    ).select("event_type", F.col("hr").alias("g_hr"))
    j = wmod.join(F.broadcast(gmod), "event_type")
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.max("g_hr").alias("global_modal_hr"),
        F.sum((F.col("hr") == F.col("g_hr")).cast("long")).alias(
            "n_match"
        ),
    )
    share = F.col("n_match").cast("double") / F.col("n_weeks").cast(
        "double"
    )
    return agg.select(
        "event_type",
        F.col("n_weeks").cast("long").alias("n_weeks"),
        F.col("global_modal_hr").cast("long").alias("global_modal_hr"),
        F.col("n_match").cast("long").alias("n_match"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "stability_e6"
        ),
    ).orderBy("event_type")


SQL_MODAL_HOUR = f"""
WITH cells AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
), wmod AS (
  SELECT event_type, wk, hr FROM (
    SELECT event_type, wk, hr,
           row_number() OVER (PARTITION BY event_type, wk
                              ORDER BY c DESC, hr ASC) AS rk
    FROM cells
  ) WHERE rk = 1
), gmod AS (
  SELECT event_type, hr AS g_hr FROM (
    SELECT event_type, hr,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY sum(c) DESC, hr ASC) AS rk
    FROM cells GROUP BY event_type, hr
  ) WHERE rk = 1
)
SELECT w.event_type, CAST(count(*) AS BIGINT) AS n_weeks,
       CAST(max(g.g_hr) AS BIGINT) AS global_modal_hr,
       CAST(sum(CASE WHEN w.hr = g.g_hr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(floor(CAST(sum(CASE WHEN w.hr = g.g_hr THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*) * 1000000 + {_OFF})
            AS BIGINT) AS stability_e6
FROM wmod w JOIN gmod g ON g.event_type = w.event_type
GROUP BY 1
ORDER BY w.event_type
"""


# ---------------------------------------------------------------------------
# footrule_weekly — Spearman footrule between consecutive weekly top-20s
# ---------------------------------------------------------------------------
# Diaconis & Graham (JRSS B 39, 1977): the footrule sum |r1 - r2| over
# users present in BOTH weekly top-20 leaderboards, normalized by the
# shared count; plus the overlap size — a heavier-tailed companion to
# rbo_sources.  Ranks are row_number (count desc, user asc): exact.


def q_footrule_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wk = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / (86_400_000_000 * 7)
    )
    per = ev.groupBy(wk.cast("long").alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    wr = Window.partitionBy("w").orderBy(F.desc("c"), F.asc("user_id"))
    top = per.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 20
    ).select("w", "user_id", "rk")
    nxt = top.select(
        (F.col("w") - 1).alias("w"),
        F.col("user_id"),
        F.col("rk").alias("rk2"),
    )
    j = top.join(nxt, ["w", "user_id"])
    agg = j.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_shared"),
        F.sum(F.abs(F.col("rk") - F.col("rk2"))).alias("fr"),
    )
    norm = F.col("fr").cast("double") / F.col("n_shared").cast("double")
    return agg.select(
        F.col("w").cast("long").alias("wk"),
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("fr").cast("long").alias("footrule"),
        F.floor(norm * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mean_disp_e4"
        ),
    ).orderBy("wk")


SQL_FOOTRULE = f"""
WITH per AS (
  SELECT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w, user_id,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), top AS (
  SELECT w, user_id, rk FROM (
    SELECT w, user_id,
           CAST(row_number() OVER (PARTITION BY w
                ORDER BY c DESC, user_id ASC) AS BIGINT) AS rk
    FROM per
  ) WHERE rk <= 20
), j AS (
  SELECT a.w, a.rk, b.rk AS rk2
  FROM top a JOIN top b ON b.w = a.w + 1 AND b.user_id = a.user_id
)
SELECT w AS wk, CAST(count(*) AS BIGINT) AS n_shared,
       CAST(sum(abs(rk - rk2)) AS BIGINT) AS footrule,
       CAST(floor(CAST(sum(abs(rk - rk2)) AS DOUBLE) / count(*) * 10000
                  + {_OFF}) AS BIGINT) AS mean_disp_e4
FROM j
GROUP BY 1
ORDER BY wk
"""



import math as _math

_H1C = [int(_math.floor(_math.cos(2.0 * _math.pi * h / 24.0) * 1e9)) for h in range(24)]
_H1S = [int(_math.floor(_math.sin(2.0 * _math.pi * h / 24.0) * 1e9)) for h in range(24)]
_H2C = [int(_math.floor(_math.cos(4.0 * _math.pi * h / 24.0) * 1e9)) for h in range(24)]
_H2S = [int(_math.floor(_math.sin(4.0 * _math.pi * h / 24.0) * 1e9)) for h in range(24)]


# ---------------------------------------------------------------------------
# hill_k_sweep — Hill tail-index stability across k
# ---------------------------------------------------------------------------
# Hill (Ann Stat 3, 1975) with the standard k-sweep diagnostic
# (Drees-de Haan-Resnick "Hill horror plot" antidote): alpha-hat at
# k in {10, 25, 50, 100} over per-user event counts.  Order stats by
# ONE descending rank window; per-order-statistic ln terms e9-floored;
# the k fan-out filters the ranked table (never a rescan).


def q_hill_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    wr = Window.orderBy(F.desc("x"), F.asc("user_id"))
    r = per.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 101
    )
    r = r.withColumn(
        "l9",
        F.floor(F.log(F.col("x").cast("double")) * 1e9 + F.lit(_OFF))
        .cast("long"),
    )
    ks = r.withColumn(
        "k",
        F.explode(
            F.array(F.lit(10), F.lit(25), F.lit(50), F.lit(100))
        ),
    )
    top = ks.filter(F.col("rk") <= F.col("k")).groupBy("k").agg(
        F.sum("l9").alias("sl9")
    )
    thr = ks.filter(F.col("rk") == F.col("k") + 1).select(
        "k", F.col("l9").alias("lthr9")
    )
    j = top.join(thr, "k")
    kd = F.col("k").cast("double")
    mean_excess = (
        F.col("sl9").cast("double") / 1e9 / kd
        - F.col("lthr9").cast("double") / 1e9
    )
    alpha = 1.0 / mean_excess
    return j.filter(mean_excess > 0).select(
        F.col("k").cast("long").alias("k"),
        F.floor(alpha * 10_000 + F.lit(_OFF)).cast("long").alias(
            "alpha_e4"
        ),
    ).orderBy("k")


SQL_HILL_SWEEP = f"""
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
), r AS (
  SELECT x, row_number() OVER (ORDER BY x DESC, user_id ASC) AS rk
  FROM per QUALIFY rk <= 101
), l AS (
  SELECT rk,
         CAST(floor(ln(CAST(x AS DOUBLE)) * 1e9 + {_OFF}) AS BIGINT) AS l9
  FROM r
), ks AS (
  SELECT l.rk, l.l9, t.k
  FROM l CROSS JOIN (VALUES (10), (25), (50), (100)) AS t(k)
), top AS (
  SELECT k, CAST(sum(l9) AS BIGINT) AS sl9
  FROM ks WHERE rk <= k GROUP BY 1
), thr AS (
  SELECT k, l9 AS lthr9 FROM ks WHERE rk = k + 1
)
SELECT CAST(top.k AS BIGINT) AS k,
       CAST(floor(1.0 / (CAST(sl9 AS DOUBLE) / 1e9 / top.k
                         - CAST(lthr9 AS DOUBLE) / 1e9)
                  * 10000 + {_OFF}) AS BIGINT) AS alpha_e4
FROM top JOIN thr ON thr.k = top.k
WHERE CAST(sl9 AS DOUBLE) / 1e9 / top.k - CAST(lthr9 AS DOUBLE) / 1e9 > 0
ORDER BY k
"""


# ---------------------------------------------------------------------------
# diel_harmonics — two-harmonic regression on the diel profile
# ---------------------------------------------------------------------------
# Bloomfield (Fourier Analysis of Time Series, 2000 ch. 2): on the
# COMPLETE 24-point hour-of-day grid the harmonic regressors are
# orthogonal, so coefficients are direct sums a_k = (1/12) sum y_h
# cos_k(h) — computed with SHARED integer trig tables (the rayleigh
# discipline, 1e-9 resolution rendered identically into both
# engines), making every harmonic sum an exact BIGINT; R^2 and the
# amplitude ratios are fixed-order.


def q_diel_harmonics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hr = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000)
        % 24
    ).cast("int")
    prof = ev.groupBy("event_type", hr.alias("h")).agg(
        F.count(F.lit(1)).alias("y")
    )

    def tab(vals):
        return F.element_at(
            F.array(*[F.lit(v) for v in vals]), F.col("h") + 1
        ).cast("long")

    agg = prof.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y") * tab(_H1C)).alias("a1"),
        F.sum(F.col("y") * tab(_H1S)).alias("b1"),
        F.sum(F.col("y") * tab(_H2C)).alias("a2"),
        F.sum(F.col("y") * tab(_H2S)).alias("b2"),
    )
    sd = F.col("s").cast("double")
    sst = F.col("syy").cast("double") - sd * sd / 24.0
    e1 = (
        F.col("a1").cast("double") * F.col("a1").cast("double")
        + F.col("b1").cast("double") * F.col("b1").cast("double")
    ) / (12.0 * 1e18)
    e2 = (
        F.col("a2").cast("double") * F.col("a2").cast("double")
        + F.col("b2").cast("double") * F.col("b2").cast("double")
    ) / (12.0 * 1e18)
    mean = sd / 24.0
    amp1 = F.sqrt(e1 / 12.0)
    return (
        agg.filter((F.col("n_cells") == 24) & (sst > 0))
        .select(
            "event_type",
            F.col("s").cast("long").alias("n_events"),
            F.floor((e1 + e2) / sst * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("r2_e6"),
            F.floor(e1 / sst * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "r2_h1_e6"
            ),
            F.floor(amp1 / mean * 10_000 + F.lit(_OFF)).cast("long").alias(
                "amp1_ratio_e4"
            ),
        )
        .orderBy("event_type")
    )


_T1C = "[" + ", ".join(str(v) for v in _H1C) + "]"
_T1S = "[" + ", ".join(str(v) for v in _H1S) + "]"
_T2C = "[" + ", ".join(str(v) for v in _H2C) + "]"
_T2S = "[" + ", ".join(str(v) for v in _H2S) + "]"

SQL_DIEL_HARMONICS = f"""
WITH prof AS (
  SELECT event_type,
         CAST(CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS INT) AS h,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(y * {_T1C}[h + 1]) AS BIGINT) AS a1,
         CAST(sum(y * {_T1S}[h + 1]) AS BIGINT) AS b1,
         CAST(sum(y * {_T2C}[h + 1]) AS BIGINT) AS a2,
         CAST(sum(y * {_T2S}[h + 1]) AS BIGINT) AS b2
  FROM prof GROUP BY 1
), f AS (
  SELECT event_type, n_cells, s,
         CAST(syy AS DOUBLE) - CAST(s AS DOUBLE) * s / 24.0 AS sst,
         (CAST(a1 AS DOUBLE) * a1 + CAST(b1 AS DOUBLE) * b1)
           / (12.0 * 1e18) AS e1,
         (CAST(a2 AS DOUBLE) * a2 + CAST(b2 AS DOUBLE) * b2)
           / (12.0 * 1e18) AS e2
  FROM agg
)
SELECT event_type, s AS n_events,
       CAST(floor((e1 + e2) / sst * 1000000 + {_OFF})
            AS BIGINT) AS r2_e6,
       CAST(floor(e1 / sst * 1000000 + {_OFF}) AS BIGINT) AS r2_h1_e6,
       CAST(floor(sqrt(e1 / 12.0) / (CAST(s AS DOUBLE) / 24.0) * 10000
                  + {_OFF}) AS BIGINT) AS amp1_ratio_e4
FROM f
WHERE n_cells = 24 AND sst > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# growth_accounting — weekly new / retained / resurrected / churned
# ---------------------------------------------------------------------------
# The standard growth-accounting identity (popularized by Social
# Capital's "accounting for growth"): active(w) = new + retained +
# resurrected, churned(w) = active(w-1) - retained(w); quick ratio =
# (new + resurrected) / churned.  All exact counting off one distinct
# (week, user) table, its adjacency self-join, and first-week minima.


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wk = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / (86_400_000_000 * 7)
    )
    act = ev.select(wk.cast("long").alias("wk"), "user_id").distinct()
    fw = act.groupBy("user_id").agg(F.min("wk").alias("fw"))
    prev = act.select(
        (F.col("wk") + 1).alias("wk"), F.col("user_id"), F.lit(1).alias("p")
    )
    j = act.join(F.broadcast(fw), "user_id").join(
        prev, ["wk", "user_id"], "left"
    )
    per = j.groupBy("wk").agg(
        F.count(F.lit(1)).alias("active"),
        F.sum((F.col("fw") == F.col("wk")).cast("long")).alias("new"),
        F.sum(F.col("p").isNotNull().cast("long")).alias("retained"),
        F.sum(
            (
                (F.col("fw") < F.col("wk")) & F.col("p").isNull()
            ).cast("long")
        ).alias("resurrected"),
    )
    pa = per.select(
        (F.col("wk") + 1).alias("wk"),
        F.col("active").alias("prev_active"),
    )
    out = per.join(pa, "wk")
    churned = F.col("prev_active") - F.col("retained")
    qr = (F.col("new") + F.col("resurrected")).cast("double") / churned.cast(
        "double"
    )
    return out.select(
        F.col("wk").cast("long").alias("wk"),
        F.col("active").cast("long").alias("active"),
        F.col("new").cast("long").alias("new"),
        F.col("retained").cast("long").alias("retained"),
        F.col("resurrected").cast("long").alias("resurrected"),
        churned.cast("long").alias("churned"),
        F.when(
            churned > 0,
            F.floor(qr * 10_000 + F.lit(_OFF)),
        )
        .cast("long")
        .alias("quick_ratio_e4"),
    ).orderBy("wk")


SQL_GROWTH = f"""
WITH act AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk, user_id
  FROM events
), fw AS (
  SELECT user_id, min(wk) AS fw FROM act GROUP BY 1
), per AS (
  SELECT a.wk, CAST(count(*) AS BIGINT) AS active,
         CAST(sum(CASE WHEN f.fw = a.wk THEN 1 ELSE 0 END) AS BIGINT)
           AS new,
         CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS retained,
         CAST(sum(CASE WHEN f.fw < a.wk AND p.user_id IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
  FROM act a
  JOIN fw f ON f.user_id = a.user_id
  LEFT JOIN act p ON p.user_id = a.user_id AND p.wk = a.wk - 1
  GROUP BY 1
)
SELECT cur.wk, cur.active, cur.new, cur.retained, cur.resurrected,
       CAST(prv.active - cur.retained AS BIGINT) AS churned,
       CASE WHEN prv.active - cur.retained > 0
            THEN CAST(floor(CAST(cur.new + cur.resurrected AS DOUBLE)
                            / (prv.active - cur.retained) * 10000
                            + {_OFF}) AS BIGINT)
       END AS quick_ratio_e4
FROM per cur JOIN per prv ON prv.wk = cur.wk - 1
ORDER BY cur.wk
"""


# ---------------------------------------------------------------------------
# masd_volatility — robust vs rms successive-difference volatility
# ---------------------------------------------------------------------------
# von Neumann successive differences with a robust twist: per user,
# the LOW MEDIAN of |delta v| (exact order statistic via one rank
# window, deterministic ties) against the rms delta; the ratio flags
# heavy-tailed increment distributions.  All inputs exact integer
# centivalues.


def q_masd_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _hourly

    h = _hourly(spark, sf_dir).select(
        "user_id", "t", F.col("v").cast("long").alias("v")
    )
    wo = Window.partitionBy("user_id").orderBy("t")
    d = (
        h.withColumn("pv", F.lag("v").over(wo))
        .filter(F.col("pv").isNotNull())
        .select(
            "user_id",
            "t",
            F.abs(F.col("v") - F.col("pv")).alias("ad"),
        )
    )
    wr = Window.partitionBy("user_id").orderBy("ad", "t")
    wn = Window.partitionBy("user_id")
    r = d.withColumn("rk", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(
        F.col("rk") == F.floor((F.col("n") - 1) / 2) + 1
    ).select("user_id", F.col("ad").alias("med_ad"))
    mom = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ad") * F.col("ad")).alias("sdd"),
    )
    j = mom.join(med, "user_id")
    rms = F.sqrt(F.col("sdd").cast("double") / F.col("n").cast("double"))
    return (
        j.filter((F.col("n") >= 10) & (F.col("med_ad") > 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_diffs"),
            F.col("med_ad").cast("long").alias("med_absdiff_c"),
            F.floor(rms * 100 + F.lit(_OFF)).cast("long").alias(
                "rms_diff_e2"
            ),
            F.floor(
                rms / F.col("med_ad").cast("double") * 10_000 + F.lit(_OFF)
            )
            .cast("long")
            .alias("tail_ratio_e4"),
        )
        .orderBy("user_id")
    )


SQL_MASD = """
WITH {_HOURLY},
d AS (
  SELECT user_id, t,
         abs(CAST(v AS BIGINT)
             - lag(CAST(v AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY t)) AS ad
  FROM hourly QUALIFY ad IS NOT NULL
), r AS (
  SELECT user_id, ad,
         row_number() OVER (PARTITION BY user_id ORDER BY ad, t) AS rk,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM d
), med AS (
  SELECT user_id, ad AS med_ad FROM r WHERE rk = (n - 1) // 2 + 1
), mom AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ad * ad) AS BIGINT) AS sdd
  FROM d GROUP BY 1
)
SELECT m.user_id, m.n AS n_diffs,
       CAST(med.med_ad AS BIGINT) AS med_absdiff_c,
       CAST(floor(sqrt(CAST(m.sdd AS DOUBLE) / m.n) * 100 + {OFF})
            AS BIGINT) AS rms_diff_e2,
       CAST(floor(sqrt(CAST(m.sdd AS DOUBLE) / m.n) / med.med_ad * 10000
                  + {OFF}) AS BIGINT) AS tail_ratio_e4
FROM mom m JOIN med ON med.user_id = m.user_id
WHERE m.n >= 10 AND med.med_ad > 0
ORDER BY m.user_id
""".format(_HOURLY=_HOURLY_SQL_S9, OFF=_OFF)



# ---------------------------------------------------------------------------
# type_quantile_shift — Doksum shift function: purchase vs view values
# ---------------------------------------------------------------------------
# Doksum (Ann Stat 2, 1974): the quantile-wise difference between two
# distributions — here event values of 'purchase' vs 'view' at the
# deciles, as exact centivalue-domain order statistics (inverse-CDF,
# the house quantile discipline); differences stay exact integers.


def q_type_quantile_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = ev.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cnt = v.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    cum = cnt.withColumn(
        "cum", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("c").over(wn))
    dec = cum.withColumn(
        "q", F.explode(F.sequence(F.lit(1), F.lit(9)))
    )
    k = F.expr("((tot - 1) * q * 10) div 100") + 1
    sel = dec.filter(
        ((F.col("cum") - F.col("c")) < k) & (k <= F.col("cum"))
    ).select("event_type", "q", F.col("v").alias("qv"))
    a = sel.filter(F.col("event_type") == "purchase").select(
        "q", F.col("qv").alias("q_purchase")
    )
    b = sel.filter(F.col("event_type") == "view").select(
        "q", F.col("qv").alias("q_view")
    )
    j = a.join(b, "q")
    return j.select(
        (F.col("q") * 10).cast("long").alias("pct"),
        F.col("q_purchase").cast("long").alias("q_purchase_c"),
        F.col("q_view").cast("long").alias("q_view_c"),
        (F.col("q_purchase") - F.col("q_view")).cast("long").alias(
            "shift_c"
        ),
    ).orderBy("pct")


SQL_TYPE_SHIFT = f"""
WITH v AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events WHERE event_type IN ('purchase', 'view')
), cnt AS (
  SELECT event_type, v, count(*) AS c FROM v GROUP BY 1, 2
), cum AS (
  SELECT event_type, v, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS tot
  FROM cnt
), dec AS (
  SELECT event_type, v, c, cum, tot, q.q
  FROM cum CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS q) q
), sel AS (
  SELECT event_type, q, v AS qv
  FROM dec
  WHERE cum - c < ((tot - 1) * q * 10) // 100 + 1
    AND ((tot - 1) * q * 10) // 100 + 1 <= cum
)
SELECT CAST(a.q * 10 AS BIGINT) AS pct,
       CAST(a.qv AS BIGINT) AS q_purchase_c,
       CAST(b.qv AS BIGINT) AS q_view_c,
       CAST(a.qv - b.qv AS BIGINT) AS shift_c
FROM sel a JOIN sel b ON b.q = a.q
WHERE a.event_type = 'purchase' AND b.event_type = 'view'
ORDER BY pct
"""


# ---------------------------------------------------------------------------
# gph_estimator — GPH log-periodogram long-memory estimator
# ---------------------------------------------------------------------------
# Geweke & Porter-Hudak (J Time Ser Anal 4, 1983): regress ln I_j on
# -ln(4 sin^2(w_j / 2)) over the lowest m ~ sqrt(n) Fourier ordinates;
# the slope estimates the fractional order d (H = d + 1/2).  Completes
# the LRD battery (hurst_rs, variance_time_plot, dfa_alpha) on a
# FOURTH methodology.  Shares the complete-grid DFT (ordinates
# e3-floored); the regressor is e9-floored per ordinate, OLS off exact
# sums.


def q_gph_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _m

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
        .filter(F.col("n") >= 16)
    )
    m = F.floor(F.sqrt(F.col("n").cast("double"))).cast("long")
    fan = base.select(
        "event_type", "t", "c", "n",
        F.explode(F.sequence(F.lit(1), m)).alias("j"),
    )
    k = (F.col("j") * F.col("t")) % F.col("n")
    ang = (
        F.lit(2.0) * F.lit(_m.pi) * k.cast("double")
        / F.col("n").cast("double")
    )
    trig = fan.select(
        "event_type", "j", "n",
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
    ).filter(F.col("i3") > 0)
    wj = (
        F.lit(2.0) * F.lit(_m.pi) * F.col("j").cast("double")
        / F.col("n").cast("double")
    )
    x9 = F.floor(
        -F.log(4.0 * F.sin(wj / 2.0) * F.sin(wj / 2.0)) * 1e9 + F.lit(_OFF)
    ).cast("long")
    y9 = F.floor(
        F.log(F.col("i3").cast("double") / 1e3) * 1e9 + F.lit(_OFF)
    ).cast("long")
    pts = ords.select("event_type", x9.alias("x9"), y9.alias("y9"))
    xd = F.col("x9").cast("double") / 1e9
    yd = F.col("y9").cast("double") / 1e9
    pts = pts.withColumn(
        "xy9", F.floor(xd * yd * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn("xx9", F.floor(xd * xd * 1e9 + F.lit(_OFF)).cast("long"))
    agg = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
        F.sum("xy9").alias("sxy"),
        F.sum("xx9").alias("sxx"),
    )
    md = F.col("m").cast("double")
    sx = F.col("sx").cast("double") / 1e9
    sy = F.col("sy").cast("double") / 1e9
    sxy = F.col("sxy").cast("double") / 1e9
    sxx = F.col("sxx").cast("double") / 1e9
    den = md * sxx - sx * sx
    d = (md * sxy - sx * sy) / den
    return agg.filter((F.col("m") >= 4) & (den > 0)).select(
        "event_type",
        F.col("m").cast("long").alias("m_ords"),
        F.floor(d * 10_000 + F.lit(_OFF)).cast("long").alias("d_e4"),
        F.floor((d + 0.5) * 10_000 + F.lit(_OFF)).cast("long").alias(
            "h_e4"
        ),
    ).orderBy("event_type")


SQL_GPH = f"""
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
         unnest(generate_series(1,
           CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT))) AS j
  FROM base WHERE n >= 16
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
), pts AS (
  SELECT event_type,
         CAST(floor(-ln(4.0 * sin(pi() * j / n) * sin(pi() * j / n))
                    * 1e9 + {_OFF}) AS BIGINT) AS x9,
         CAST(floor(ln(CAST(i3 AS DOUBLE) / 1e3) * 1e9 + {_OFF})
              AS BIGINT) AS y9
  FROM ords WHERE i3 > 0
), p2 AS (
  SELECT event_type, x9, y9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9) * (CAST(y9 AS DOUBLE) / 1e9)
                    * 1e9 + {_OFF}) AS BIGINT) AS xy9,
         CAST(floor((CAST(x9 AS DOUBLE) / 1e9) * (CAST(x9 AS DOUBLE) / 1e9)
                    * 1e9 + {_OFF}) AS BIGINT) AS xx9
  FROM pts
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x9) AS BIGINT) AS sx, CAST(sum(y9) AS BIGINT) AS sy,
         CAST(sum(xy9) AS BIGINT) AS sxy, CAST(sum(xx9) AS BIGINT) AS sxx
  FROM p2 GROUP BY 1
)
SELECT event_type, m AS m_ords,
       CAST(floor((CAST(m AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                   - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
                  / (CAST(m AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                     - (CAST(sx AS DOUBLE) / 1e9)
                       * (CAST(sx AS DOUBLE) / 1e9))
                  * 10000 + {_OFF}) AS BIGINT) AS d_e4,
       CAST(floor(((CAST(m AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                    - (CAST(sx AS DOUBLE) / 1e9)
                      * (CAST(sy AS DOUBLE) / 1e9))
                   / (CAST(m AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                      - (CAST(sx AS DOUBLE) / 1e9)
                        * (CAST(sx AS DOUBLE) / 1e9)) + 0.5)
                  * 10000 + {_OFF}) AS BIGINT) AS h_e4
FROM agg
WHERE m >= 4
  AND CAST(m AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
      - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9) > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# activity_block_entropy — 3-day activity-pattern block entropy
# ---------------------------------------------------------------------------
# Behavioral regularity: each user's active/inactive day string,
# chopped into overlapping 3-day blocks (8 possible patterns); the
# Shannon entropy of the pooled pattern distribution per USER COHORT
# (split by total активity tercile) measures schedule regularity.
# Day grid is span-complete per user (missing days are genuine 0s via
# the day-domain left join on the bounded calendar); entropy terms
# half-up scaled over the <= 8-pattern set.


def q_activity_block_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
    ).cast("long")
    act = ev.select("user_id", day.alias("day")).distinct()
    span = act.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    users = act.groupBy("user_id").agg(F.count(F.lit(1)).alias("ndays"))
    grid = users.crossJoin(F.broadcast(span)).select(
        "user_id",
        "ndays",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
    )
    g = grid.join(
        act.withColumn("on", F.lit(1)), ["user_id", "day"], "left"
    ).fillna(0, subset=["on"])
    wo = Window.partitionBy("user_id").orderBy("day")
    pat = (
        g.withColumn("b1", F.lead("on", 1).over(wo))
        .withColumn("b2", F.lead("on", 2).over(wo))
        .filter(F.col("b2").isNotNull())
        .select(
            "user_id",
            "ndays",
            (F.col("on") * 4 + F.col("b1") * 2 + F.col("b2")).alias("pat"),
        )
    )
    terc = F.when(F.col("ndays") >= 10, 2).when(
        F.col("ndays") >= 4, 1
    ).otherwise(0)
    cnt = pat.groupBy(terc.alias("cohort"), "pat").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cnt.groupBy("cohort").agg(F.sum("c").alias("t"))
    j = cnt.join(F.broadcast(tot), "cohort")
    term = (
        F.col("c").cast("double")
        / F.col("t").cast("double")
        * F.log(F.col("t").cast("double") / F.col("c").cast("double"))
    )
    e = j.select(
        "cohort",
        F.floor(term * 1e9 + F.lit(_OFF)).cast("long").alias("e9"),
    ).groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_patterns"),
        F.sum("e9").alias("s9"),
    )
    out = e.join(F.broadcast(tot), "cohort")
    return out.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("t").cast("long").alias("n_blocks"),
        F.col("n_patterns").cast("long").alias("n_patterns"),
        F.floor(F.col("s9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("h_e6"),
    ).orderBy("cohort")


SQL_BLOCK_ENTROPY = f"""
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), span AS (
  SELECT min(day) AS d0, max(day) AS d1 FROM act
), users AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS ndays FROM act GROUP BY 1
), grid AS (
  SELECT u.user_id, u.ndays, g.day
  FROM users u CROSS JOIN span s,
       unnest(generate_series(s.d0, s.d1)) AS g(day)
), gg AS (
  SELECT g.user_id, g.ndays, g.day,
         CASE WHEN a.user_id IS NULL THEN 0 ELSE 1 END AS onb
  FROM grid g
  LEFT JOIN act a ON a.user_id = g.user_id AND a.day = g.day
), pat AS (
  SELECT user_id, ndays,
         onb * 4
           + lead(onb, 1) OVER (PARTITION BY user_id ORDER BY day) * 2
           + lead(onb, 2) OVER (PARTITION BY user_id ORDER BY day) AS pat
  FROM gg QUALIFY pat IS NOT NULL
), cnt AS (
  SELECT CASE WHEN ndays >= 10 THEN 2
              WHEN ndays >= 4 THEN 1 ELSE 0 END AS cohort,
         pat, CAST(count(*) AS BIGINT) AS c
  FROM pat GROUP BY 1, 2
), tot AS (
  SELECT cohort, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1
), e AS (
  SELECT cnt.cohort, CAST(count(*) AS BIGINT) AS n_patterns,
         CAST(sum(CAST(floor(CAST(cnt.c AS DOUBLE) / tot.t
                             * ln(CAST(tot.t AS DOUBLE) / cnt.c)
                             * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT) AS s9
  FROM cnt JOIN tot ON tot.cohort = cnt.cohort
  GROUP BY 1
)
SELECT CAST(e.cohort AS BIGINT) AS cohort, tot.t AS n_blocks,
       e.n_patterns,
       CAST(floor(CAST(s9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS h_e6
FROM e JOIN tot ON tot.cohort = e.cohort
ORDER BY cohort
"""


# ---------------------------------------------------------------------------
# cohort_half_life — retention half-life per signup-week cohort
# ---------------------------------------------------------------------------
# Exponential-decay reading of the cohort retention triangle: per
# first-week cohort, OLS of ln(retention at week offset k) on k
# (k >= 1), half-life = ln 2 / (-slope).  Retention shares are exact
# rationals; ln terms e9-floored, OLS off exact sums.


def q_cohort_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wk = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / (86_400_000_000 * 7)
    )
    act = ev.select(wk.cast("long").alias("wk"), "user_id").distinct()
    fw = act.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    sz = fw.groupBy("cohort").agg(F.count(F.lit(1)).alias("n0"))
    ret = (
        act.join(F.broadcast(fw), "user_id")
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("k"))
        .agg(F.count(F.lit(1)).alias("nk"))
        .filter(F.col("k") >= 1)
    )
    j = ret.join(F.broadcast(sz), "cohort")
    y = F.floor(
        F.log(F.col("nk").cast("double") / F.col("n0").cast("double")) * 1e9
        + F.lit(_OFF)
    ).cast("long")
    pts = j.select("cohort", F.col("k").alias("k"), y.alias("y9"))
    yd = F.col("y9").cast("double") / 1e9
    pts = pts.withColumn(
        "xy9",
        F.floor(F.col("k").cast("double") * yd * 1e9 + F.lit(_OFF)).cast(
            "long"
        ),
    ).withColumn("xx", F.col("k") * F.col("k"))
    agg = pts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("k").alias("sk"),
        F.sum("y9").alias("sy9"),
        F.sum("xy9").alias("sxy9"),
        F.sum("xx").alias("sxx"),
    )
    md = F.col("m").cast("double")
    sk = F.col("sk").cast("double")
    sy = F.col("sy9").cast("double") / 1e9
    sxy = F.col("sxy9").cast("double") / 1e9
    sxx = F.col("sxx").cast("double")
    den = md * sxx - sk * sk
    slope = (md * sxy - sk * sy) / den
    hl = F.log(F.lit(2.0)) / (-slope)
    return agg.filter((F.col("m") >= 2) & (den > 0)).select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("m").cast("long").alias("n_offsets"),
        F.floor(slope * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "slope_e6"
        ),
        F.when(slope < 0, F.floor(hl * 10_000 + F.lit(_OFF)))
        .cast("long")
        .alias("half_life_wk_e4"),
    ).orderBy("cohort")


SQL_COHORT_HL = f"""
WITH act AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk, user_id
  FROM events
), fw AS (
  SELECT user_id, min(wk) AS cohort FROM act GROUP BY 1
), sz AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS n0 FROM fw GROUP BY 1
), ret AS (
  SELECT f.cohort, a.wk - f.cohort AS k, CAST(count(*) AS BIGINT) AS nk
  FROM act a JOIN fw f ON f.user_id = a.user_id
  GROUP BY 1, 2 HAVING a.wk - f.cohort >= 1
), pts AS (
  SELECT r.cohort, r.k,
         CAST(floor(ln(CAST(r.nk AS DOUBLE) / sz.n0) * 1e9 + {_OFF})
              AS BIGINT) AS y9
  FROM ret r JOIN sz ON sz.cohort = r.cohort
), p2 AS (
  SELECT cohort, k, y9,
         CAST(floor(CAST(k AS DOUBLE) * (CAST(y9 AS DOUBLE) / 1e9) * 1e9
                    + {_OFF}) AS BIGINT) AS xy9,
         CAST(k * k AS BIGINT) AS xx
  FROM pts
), agg AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(y9) AS BIGINT) AS sy9,
         CAST(sum(xy9) AS BIGINT) AS sxy9,
         CAST(sum(xx) AS BIGINT) AS sxx
  FROM p2 GROUP BY 1
), f AS (
  SELECT cohort, m,
         (CAST(m AS DOUBLE) * (CAST(sxy9 AS DOUBLE) / 1e9)
          - CAST(sk AS DOUBLE) * (CAST(sy9 AS DOUBLE) / 1e9))
           / (CAST(m AS DOUBLE) * sxx - CAST(sk AS DOUBLE) * sk) AS slope,
         CAST(m AS DOUBLE) * sxx - CAST(sk AS DOUBLE) * sk AS den
  FROM agg
)
SELECT cohort, m AS n_offsets,
       CAST(floor(slope * 1000000 + {_OFF}) AS BIGINT) AS slope_e6,
       CASE WHEN slope < 0
            THEN CAST(floor(ln(2.0) / (-slope) * 10000 + {_OFF}) AS BIGINT)
       END AS half_life_wk_e4
FROM f
WHERE m >= 2 AND den > 0
ORDER BY cohort
"""



# ---------------------------------------------------------------------------
# freq_spectrum_fit — Zipf's second law on the frequency spectrum
# ---------------------------------------------------------------------------
# Zipf's law of frequencies (1935) / the Karlin-Rouault regime: the
# number of words occurring exactly m times should follow V_m ~
# V_1 / (m (m + 1)).  Observed V_m for m = 1..5 per language are exact
# counts; expectations and chi contributions are fixed-order.


def q_freq_spectrum_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    freq = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    spec = freq.filter(F.col("m") <= 5).groupBy("lang", "m").agg(
        F.count(F.lit(1)).alias("vm")
    )
    v1 = spec.filter(F.col("m") == 1).select(
        "lang", F.col("vm").alias("v1")
    )
    j = spec.join(F.broadcast(v1), "lang")
    exp = F.col("v1").cast("double") / (
        F.col("m").cast("double") * (F.col("m").cast("double") + 1.0)
    )
    chi = (F.col("vm").cast("double") - exp) * (
        F.col("vm").cast("double") - exp
    ) / exp
    return j.filter(F.col("v1") > 0).select(
        "lang",
        F.col("m").cast("long").alias("m"),
        F.col("vm").cast("long").alias("v_m"),
        F.floor(exp * 10_000 + F.lit(_OFF)).cast("long").alias(
            "expected_e4"
        ),
        F.floor(chi * 10_000 + F.lit(_OFF)).cast("long").alias("chi_e4"),
    ).orderBy("lang", "m")


SQL_FREQ_SPECTRUM = f"""
WITH freq AS (
  SELECT lang, w, count(*) AS m
  FROM (SELECT lang,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents)
  GROUP BY 1, 2
), spec AS (
  SELECT lang, m, CAST(count(*) AS BIGINT) AS vm
  FROM freq WHERE m <= 5 GROUP BY 1, 2
), v1 AS (
  SELECT lang, vm AS v1 FROM spec WHERE m = 1
)
SELECT s.lang, CAST(s.m AS BIGINT) AS m, s.vm AS v_m,
       CAST(floor(CAST(v1.v1 AS DOUBLE)
                  / (CAST(s.m AS DOUBLE) * (CAST(s.m AS DOUBLE) + 1.0))
                  * 10000 + {_OFF}) AS BIGINT) AS expected_e4,
       CAST(floor((CAST(s.vm AS DOUBLE)
                   - CAST(v1.v1 AS DOUBLE)
                     / (CAST(s.m AS DOUBLE) * (CAST(s.m AS DOUBLE) + 1.0)))
                  * (CAST(s.vm AS DOUBLE)
                     - CAST(v1.v1 AS DOUBLE)
                       / (CAST(s.m AS DOUBLE)
                          * (CAST(s.m AS DOUBLE) + 1.0)))
                  / (CAST(v1.v1 AS DOUBLE)
                     / (CAST(s.m AS DOUBLE) * (CAST(s.m AS DOUBLE) + 1.0)))
                  * 10000 + {_OFF}) AS BIGINT) AS chi_e4
FROM spec s JOIN v1 ON v1.lang = s.lang
WHERE v1.v1 > 0
ORDER BY s.lang, s.m
"""


# ---------------------------------------------------------------------------
# hourly_conversion_wilson — purchase share by hour with Wilson bands
# ---------------------------------------------------------------------------
# Wilson (JASA 22, 1927) score interval on the hour-of-day purchase
# share — the diel conversion profile with honest small-sample bands.
# Counts exact; the Wilson chain (z = 1.96 literal) is fixed-order.


def q_hourly_conversion_wilson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hr = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000)
        % 24
    ).cast("long")
    per = ev.groupBy(hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "x"
        ),
    )
    nd = F.col("n").cast("double")
    ph = F.col("x").cast("double") / nd
    z2 = 1.96 * 1.96
    center = (ph + z2 / (2.0 * nd)) / (1.0 + z2 / nd)
    half = (
        1.96
        * F.sqrt(ph * (1.0 - ph) / nd + z2 / (4.0 * nd * nd))
        / (1.0 + z2 / nd)
    )
    return per.filter(F.col("n") > 0).select(
        "hr",
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("n_purchase"),
        F.floor(ph * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "share_e6"
        ),
        F.floor((center - half) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("wilson_lo_e6"),
        F.floor((center + half) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("wilson_hi_e6"),
    ).orderBy("hr")


SQL_HOURLY_WILSON = f"""
WITH per AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hr,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1
), f AS (
  SELECT hr, n, x,
         CAST(x AS DOUBLE) / n AS ph,
         1.96 * 1.96 AS z2
  FROM per WHERE n > 0
)
SELECT hr, n, x AS n_purchase,
       CAST(floor(ph * 1000000 + {_OFF}) AS BIGINT) AS share_e6,
       CAST(floor(((ph + z2 / (2.0 * n)) / (1.0 + z2 / n)
                   - 1.96 * sqrt(ph * (1.0 - ph) / n
                                 + z2 / (4.0 * CAST(n AS DOUBLE) * n))
                     / (1.0 + z2 / n)) * 1000000 + {_OFF})
            AS BIGINT) AS wilson_lo_e6,
       CAST(floor(((ph + z2 / (2.0 * n)) / (1.0 + z2 / n)
                   + 1.96 * sqrt(ph * (1.0 - ph) / n
                                 + z2 / (4.0 * CAST(n AS DOUBLE) * n))
                     / (1.0 + z2 / n)) * 1000000 + {_OFF})
            AS BIGINT) AS wilson_hi_e6
FROM f
ORDER BY hr
"""


# ---------------------------------------------------------------------------
# prefix_mean_stability — running-mean convergence of doc lengths
# ---------------------------------------------------------------------------
# An LLN-style ingest audit: per source, the maximum deviation of the
# prefix mean of n_chars (in doc_id order) from the final mean, and
# where it happens.  Prefix sums ride one per-source window; each
# prefix deviation is e6-floored BEFORE the max (max is order-free),
# and the arg-position tie-breaks to the earliest prefix.


def q_prefix_mean_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("source", "doc_id", "n_chars")
    wo = Window.partitionBy("source").orderBy("doc_id")
    wn = Window.partitionBy("source")
    r = (
        d.withColumn("i", F.row_number().over(wo))
        .withColumn(
            "cs",
            F.sum("n_chars").over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("s", F.sum("n_chars").over(wn))
    )
    dev = F.abs(
        F.col("cs").cast("double") / F.col("i").cast("double")
        - F.col("s").cast("double") / F.col("n").cast("double")
    )
    r = r.select(
        "source",
        "i",
        "n",
        F.floor(dev * 1e6 + F.lit(_OFF)).cast("long").alias("d6"),
    )
    wmax = Window.partitionBy("source").orderBy(
        F.col("d6").desc(), F.col("i").asc()
    )
    top = r.withColumn("rk", F.row_number().over(wmax)).filter(
        F.col("rk") == 1
    )
    return top.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("d6").cast("long").alias("max_dev_e6"),
        F.col("i").cast("long").alias("at_prefix"),
        F.floor(
            F.col("i").cast("double") / F.col("n").cast("double") * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("at_frac_e4"),
    ).orderBy("source")


SQL_PREFIX_MEAN = f"""
WITH r AS (
  SELECT source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id) AS cs,
         count(*) OVER (PARTITION BY source) AS n,
         sum(n_chars) OVER (PARTITION BY source) AS s
  FROM documents
), d AS (
  SELECT source, i, n,
         CAST(floor(abs(CAST(cs AS DOUBLE) / i
                        - CAST(s AS DOUBLE) / n) * 1e6 + {_OFF})
              AS BIGINT) AS d6
  FROM r
), top AS (
  SELECT source, i, n, d6,
         row_number() OVER (PARTITION BY source
                            ORDER BY d6 DESC, i ASC) AS rk
  FROM d
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       d6 AS max_dev_e6,
       CAST(i AS BIGINT) AS at_prefix,
       CAST(floor(CAST(i AS DOUBLE) / n * 10000 + {_OFF})
            AS BIGINT) AS at_frac_e4
FROM top
WHERE rk = 1
ORDER BY source
"""


# ---------------------------------------------------------------------------
# participation_ratio — effective dimensionality without an eigensolve
# ---------------------------------------------------------------------------
# Gao et al. (bioRxiv 2017) / standard physics PR: PR = (tr C)^2 /
# tr(C^2) with tr(C^2) = sum_ij C_ij^2 — NO eigendecomposition needed,
# so the whole statistic reduces to exact component cross-moments:
# C_ij numerators are exact BIGINT off the e6-floored components; the
# 64^2 per-label C_ij^2 terms are e6-floored before the (bounded)
# fold.  Pairs with twonn_intrinsic_dim (geometry) as the variance
# reading of effective dimension.


def q_participation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    b = comp.select(
        F.col("label").alias("label"),
        F.col("vec_id").alias("vec_id"),
        F.col("d").alias("d2"),
        F.col("x6").alias("y6"),
    )
    cross = comp.join(b, ["label", "vec_id"]).filter(
        F.col("d") <= F.col("d2")
    )
    mom = cross.groupBy("label", "d", "d2").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
    )
    sums = comp.groupBy("label", "d").agg(F.sum("x6").alias("sx"))
    sa = sums.select("label", F.col("d").alias("d"), F.col("sx").alias("sxa"))
    sb = sums.select(
        "label", F.col("d").alias("d2"), F.col("sx").alias("sxb")
    )
    j = mom.join(sa, ["label", "d"]).join(sb, ["label", "d2"])
    nd = F.col("n").cast("double")
    cij = (
        F.col("sxy").cast("double")
        - F.col("sxa").cast("double") * F.col("sxb").cast("double") / nd
    ) / nd / 1e12
    terms = j.select(
        "label",
        (F.col("d") == F.col("d2")).cast("long").alias("diag"),
        F.floor(cij * 1e9 + F.lit(_OFF)).cast("long").alias("c9"),
    )
    c9d = F.col("c9").cast("double") / 1e9
    wfac = F.when(F.col("diag") == 1, 1.0).otherwise(2.0)
    terms = terms.withColumn(
        "cc6", F.floor(wfac * c9d * c9d * 1e6 + F.lit(_OFF)).cast("long")
    )
    agg = terms.groupBy("label").agg(
        F.sum(F.when(F.col("diag") == 1, F.col("c9"))).alias("tr9"),
        F.sum("cc6").alias("tr2_6"),
    )
    tr = F.col("tr9").cast("double") / 1e9
    tr2 = F.col("tr2_6").cast("double") / 1e6
    pr = tr * tr / tr2
    return agg.filter(F.col("tr2_6") > 0).select(
        F.col("label").cast("long").alias("label"),
        F.floor(tr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "trace_e6"
        ),
        F.floor(pr * 10_000 + F.lit(_OFF)).cast("long").alias("pr_e4"),
    ).orderBy("label")


SQL_PARTICIPATION = f"""
WITH comp0 AS (
  SELECT label, vec_id,
         unnest(list_transform(generate_series(1, len(embedding)),
           i -> struct_pack(d := i,
                x6 := CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6
                                 + {_OFF}) AS BIGINT)))) AS u
  FROM embeddings
), comp AS (
  SELECT label, vec_id, u.d AS d, u.x6 AS x6 FROM comp0
), cross0 AS (
  SELECT a.label, a.d, b.d AS d2, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.x6 * b.x6) AS BIGINT) AS sxy
  FROM comp a
  JOIN comp b ON b.label = a.label AND b.vec_id = a.vec_id
              AND a.d <= b.d
  GROUP BY 1, 2, 3
), sums AS (
  SELECT label, d, CAST(sum(x6) AS BIGINT) AS sx
  FROM comp GROUP BY 1, 2
), cij AS (
  SELECT c.label, c.d, c.d2,
         CAST(floor((CAST(c.sxy AS DOUBLE)
                     - CAST(sa.sx AS DOUBLE) * sb.sx / c.n)
                    / c.n / 1e12 * 1e9 + {_OFF}) AS BIGINT) AS c9
  FROM cross0 c
  JOIN sums sa ON sa.label = c.label AND sa.d = c.d
  JOIN sums sb ON sb.label = c.label AND sb.d = c.d2
), terms AS (
  SELECT label,
         CASE WHEN d = d2 THEN c9 END AS diag9,
         CAST(floor((CASE WHEN d = d2 THEN 1.0 ELSE 2.0 END)
                    * (CAST(c9 AS DOUBLE) / 1e9)
                    * (CAST(c9 AS DOUBLE) / 1e9) * 1e6 + {_OFF})
              AS BIGINT) AS cc6
  FROM cij
), agg AS (
  SELECT label, CAST(sum(diag9) AS BIGINT) AS tr9,
         CAST(sum(cc6) AS BIGINT) AS tr2_6
  FROM terms GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(floor(CAST(tr9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS trace_e6,
       CAST(floor((CAST(tr9 AS DOUBLE) / 1e9)
                  * (CAST(tr9 AS DOUBLE) / 1e9)
                  / (CAST(tr2_6 AS DOUBLE) / 1e6) * 10000 + {_OFF})
            AS BIGINT) AS pr_e4
FROM agg
WHERE tr2_6 > 0
ORDER BY label
"""



# ---------------------------------------------------------------------------
# how_surprise — Poisson surprise census over the hour-of-week profile
# ---------------------------------------------------------------------------
# SPC on the 168-cell hour-of-week heatmap: under a homogeneous
# Poisson row the cell deviation z = (c - mu)/sqrt(mu) with mu the
# per-type cell mean; the census counts |z| > 3 cells and reports the
# worst cell.  Counts exact; mu is one division; per-cell z is
# fixed-order and e6-floored before the order-free max/argmax.


def q_how_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.unix_micros(F.col("ts").cast("timestamp"))
    how = (F.floor(sec / 3_600_000_000) % 168).cast("long")
    cells = ev.groupBy("event_type", how.alias("hw")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("c").alias("s"), F.count(F.lit(1)).alias("ncells")
    )
    j = cells.join(F.broadcast(tot), "event_type")
    mu = F.col("s").cast("double") / F.col("ncells").cast("double")
    z = (F.col("c").cast("double") - mu) / F.sqrt(mu)
    j = j.select(
        "event_type",
        "hw",
        F.floor(F.abs(z) * 1e6 + F.lit(_OFF)).cast("long").alias("az6"),
    )
    wmax = Window.partitionBy("event_type").orderBy(
        F.col("az6").desc(), F.col("hw").asc()
    )
    r = j.withColumn("rk", F.row_number().over(wmax))
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum((F.col("az6") > 3_000_000).cast("long")).alias("n_over3"),
        F.max(F.when(F.col("rk") == 1, F.col("az6"))).alias("max_az6"),
        F.max(F.when(F.col("rk") == 1, F.col("hw"))).alias("worst_hw"),
    )
    return agg.select(
        "event_type",
        F.col("n_cells").cast("long").alias("n_cells"),
        F.col("n_over3").cast("long").alias("n_over3"),
        F.col("worst_hw").cast("long").alias("worst_hw"),
        F.floor(F.col("max_az6").cast("double") / 100.0 + F.lit(_OFF))
        .cast("long")
        .alias("max_absz_e4"),
    ).orderBy("event_type")


SQL_HOW_SURPRISE = f"""
WITH cells AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 168 AS hw,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS ncells
  FROM cells GROUP BY 1
), z AS (
  SELECT c.event_type, c.hw,
         CAST(floor(abs((CAST(c.c AS DOUBLE)
                         - CAST(t.s AS DOUBLE) / t.ncells)
                        / sqrt(CAST(t.s AS DOUBLE) / t.ncells)) * 1e6
                    + {_OFF}) AS BIGINT) AS az6
  FROM cells c JOIN tot t ON t.event_type = c.event_type
), r AS (
  SELECT event_type, hw, az6,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY az6 DESC, hw ASC) AS rk
  FROM z
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(CASE WHEN az6 > 3000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over3,
       CAST(max(CASE WHEN rk = 1 THEN hw END) AS BIGINT) AS worst_hw,
       CAST(floor(CAST(max(CASE WHEN rk = 1 THEN az6 END) AS DOUBLE)
                  / 100.0 + {_OFF}) AS BIGINT) AS max_absz_e4
FROM r
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# sq8_error_audit — 8-bit scalar-quantization reconstruction error
# ---------------------------------------------------------------------------
# The standard SQ8 vector-compression audit (cf. Faiss SQ8): per-dim
# min/max over the corpus define the 255-step grid; code = round
# ((x - lo)/(hi - lo) * 255), reconstruction lo + code*step.  Per-dim
# ranges are exact e6 integers, codes are deterministic single
# divisions; squared per-element errors are e12-floored before the
# label sums, so MSE and the max element error are engine-exact.


def q_sq8_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    rng = comp.groupBy("d").agg(
        F.min("x6").alias("lo6"), F.max("x6").alias("hi6")
    ).filter(F.col("hi6") > F.col("lo6"))
    j = comp.join(F.broadcast(rng), "d")
    step = (F.col("hi6") - F.col("lo6")).cast("double") / 255.0
    code = F.round(
        (F.col("x6") - F.col("lo6")).cast("double") / step, 0
    )
    err = (
        F.col("x6").cast("double")
        - (F.col("lo6").cast("double") + code * step)
    ) / 1e6
    terms = j.select(
        "label",
        F.floor(err * err * 1e12 + F.lit(_OFF)).cast("long").alias(
            "e12"
        ),
    )
    agg = terms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_el"),
        F.sum("e12").alias("se12"),
        F.max("e12").alias("mx12"),
    )
    mse = F.col("se12").cast("double") / 1e12 / F.col("n_el").cast(
        "double"
    )
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("n_el").cast("long").alias("n_elements"),
        F.floor(mse * 1e9 + F.lit(_OFF)).cast("long").alias("mse_e9"),
        F.col("mx12").cast("long").alias("max_sqerr_e12"),
    ).orderBy("label")


SQL_SQ8 = f"""
WITH comp0 AS (
  SELECT label, vec_id,
         unnest(list_transform(generate_series(1, len(embedding)),
           i -> struct_pack(d := i,
                x6 := CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6
                                 + {_OFF}) AS BIGINT)))) AS u
  FROM embeddings
), comp AS (
  SELECT label, vec_id, u.d AS d, u.x6 AS x6 FROM comp0
), rng AS (
  SELECT d, CAST(min(x6) AS BIGINT) AS lo6,
         CAST(max(x6) AS BIGINT) AS hi6
  FROM comp GROUP BY 1 HAVING max(x6) > min(x6)
), terms AS (
  SELECT c.label,
         CAST(floor(((CAST(c.x6 AS DOUBLE)
                      - (CAST(r.lo6 AS DOUBLE)
                         + round((c.x6 - r.lo6)
                                 / (CAST(r.hi6 - r.lo6 AS DOUBLE) / 255.0),
                                 0)
                           * (CAST(r.hi6 - r.lo6 AS DOUBLE) / 255.0)))
                     / 1e6)
                    * ((CAST(c.x6 AS DOUBLE)
                        - (CAST(r.lo6 AS DOUBLE)
                           + round((c.x6 - r.lo6)
                                   / (CAST(r.hi6 - r.lo6 AS DOUBLE)
                                      / 255.0), 0)
                             * (CAST(r.hi6 - r.lo6 AS DOUBLE) / 255.0)))
                       / 1e6)
                    * 1e12 + {_OFF}) AS BIGINT) AS e12
  FROM comp c JOIN rng r ON r.d = c.d
), agg AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_el,
         CAST(sum(e12) AS BIGINT) AS se12,
         CAST(max(e12) AS BIGINT) AS mx12
  FROM terms GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label, n_el AS n_elements,
       CAST(floor(CAST(se12 AS DOUBLE) / 1e12 / n_el * 1e9 + {_OFF})
            AS BIGINT) AS mse_e9,
       mx12 AS max_sqerr_e12
FROM agg
ORDER BY label
"""


# ---------------------------------------------------------------------------
# think_time_quantiles — within-session gap quantiles
# ---------------------------------------------------------------------------
# The think-time distribution (within-session inter-click gaps under
# the house 1800 s rule) at exact quartiles + p90 on the integer-
# second gap value domain — the behavioral companion to
# conversion_lag's value-domain discipline.


def q_think_time_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = (
        ev.select("user_id", "event_id", sec.cast("long").alias("s"))
        .withColumn("prev", F.lag("s").over(wo))
        .filter(
            F.col("prev").isNotNull()
            & ((F.col("s") - F.col("prev")) <= 1800)
        )
        .select((F.col("s") - F.col("prev")).alias("gap"))
    )
    cnt = g.groupBy("gap").agg(F.count(F.lit(1)).alias("c"))
    wo2 = Window.orderBy("gap")
    cum = cnt.withColumn(
        "cum", F.sum("c").over(wo2.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("c").over(Window.partitionBy()))
    qs = cum.withColumn(
        "pct",
        F.explode(
            F.array(F.lit(25), F.lit(50), F.lit(75), F.lit(90))
        ),
    )
    k = F.expr("((tot - 1) * pct) div 100") + 1
    sel = qs.filter(
        ((F.col("cum") - F.col("c")) < k) & (k <= F.col("cum"))
    )
    return sel.select(
        F.col("pct").cast("long").alias("pct"),
        F.col("gap").cast("long").alias("gap_s"),
        F.col("tot").cast("long").alias("n_gaps"),
    ).orderBy("pct")


SQL_THINK_TIME = """
WITH g AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
           AS gap
  FROM events QUALIFY gap IS NOT NULL AND gap <= 1800
), cnt AS (
  SELECT gap, count(*) AS c FROM g GROUP BY 1
), cum AS (
  SELECT gap, c,
         sum(c) OVER (ORDER BY gap) AS cum,
         sum(c) OVER () AS tot
  FROM cnt
), qs AS (
  SELECT cum.*, p.pct
  FROM cum CROSS JOIN (VALUES (25), (50), (75), (90)) AS p(pct)
)
SELECT CAST(pct AS BIGINT) AS pct, CAST(gap AS BIGINT) AS gap_s,
       CAST(tot AS BIGINT) AS n_gaps
FROM qs
WHERE cum - c < ((tot - 1) * pct) // 100 + 1
  AND ((tot - 1) * pct) // 100 + 1 <= cum
ORDER BY pct
"""


# ---------------------------------------------------------------------------
# trend_direction_census — population census of per-user trend t-stats
# ---------------------------------------------------------------------------
# The meta-analytic reading of trend_ols: how many users trend
# significantly up / down / flat at |t| > 1.96 (classic OLS t on the
# hourly centivalue series, row-index regressor — the trend_ols_hc0
# moment chain without the HC0 second pass).  All moment sums exact
# BIGINT; per-user t fixed-order; the census is exact counting.


def q_trend_direction_census(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    ).filter(F.col("n") >= 10)
    nd = F.col("n").cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    b = num / den
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / nd
    rss = (
        F.col("syy").cast("double")
        - a * F.col("sy").cast("double")
        - b * F.col("sxy").cast("double")
    )
    tstat = b / F.sqrt(rss / (nd - 2.0) / (den / nd))
    per = mom.filter((den > 0) & (rss > 0)).select(
        F.floor(tstat * 10_000 + F.lit(_OFF)).cast("long").alias("t4")
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum((F.col("t4") > 19_600).cast("long")).alias("n_up"),
        F.sum((F.col("t4") < -19_600).cast("long")).alias("n_down"),
    )
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_up").cast("long").alias("n_up"),
        F.col("n_down").cast("long").alias("n_down"),
        (F.col("n_users") - F.col("n_up") - F.col("n_down"))
        .cast("long")
        .alias("n_flat"),
        F.floor(
            F.col("n_up").cast("double")
            / F.col("n_users").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("up_share_e6"),
    )


SQL_TREND_CENSUS = """
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
  FROM r GROUP BY 1 HAVING count(*) >= 10
), f AS (
  SELECT n,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
         (CAST(sy AS DOUBLE)
          - CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / n AS a,
         CAST(syy AS DOUBLE) AS syyf, CAST(sy AS DOUBLE) AS syf,
         CAST(sxy AS DOUBLE) AS sxyf,
         CAST(n * sxx - sx * sx AS DOUBLE) AS den
  FROM mom
  WHERE n * sxx - sx * sx > 0
), t AS (
  SELECT CAST(floor(b / sqrt((syyf - a * syf - b * sxyf)
                             / (CAST(n AS DOUBLE) - 2.0)
                             / (den / n)) * 10000 + {OFF})
              AS BIGINT) AS t4
  FROM f
  WHERE syyf - a * syf - b * sxyf > 0
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN t4 > 19600 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_up,
         CAST(sum(CASE WHEN t4 < -19600 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_down
  FROM t
)
SELECT n_users, n_up, n_down,
       CAST(n_users - n_up - n_down AS BIGINT) AS n_flat,
       CAST(floor(CAST(n_up AS DOUBLE) / n_users * 1000000 + {OFF})
            AS BIGINT) AS up_share_e6
FROM agg
""".format(_HOURLY=_HOURLY_SQL_S9, OFF=_OFF)



# ---------------------------------------------------------------------------
# bounce_rate_hourly — single-event-session share by start hour
# ---------------------------------------------------------------------------
# The classic web bounce rate on the house 1800 s sessionization,
# sliced by session START hour-of-day; pure exact counting (session
# start = min (s, event_id) key per sid).


def q_bounce_rate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.sum("brk").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    per = g.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("s").alias("start_s"),
    )
    hr = ((F.col("start_s") % 86_400) / 3_600).cast("long")
    agg = per.groupBy(hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("len") == 1).cast("long")).alias("n_bounce"),
    )
    rate = F.col("n_bounce").cast("double") / F.col("n_sessions").cast(
        "double"
    )
    return agg.select(
        "hr",
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.col("n_bounce").cast("long").alias("n_bounce"),
        F.floor(rate * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "bounce_e6"
        ),
    ).orderBy("hr")


SQL_BOUNCE = f"""
WITH g AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev
  FROM events
), b AS (
  SELECT user_id, s,
         CAST(sum(CASE WHEN prev IS NULL OR s - prev > 1800
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, event_id)
              AS BIGINT) AS sid
  FROM g
), per AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS len,
         CAST(min(s) AS BIGINT) AS start_s
  FROM b GROUP BY 1, 2
), agg AS (
  SELECT CAST(floor((start_s % 86400) / 3600.0) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounce
  FROM per GROUP BY 1
)
SELECT hr, n_sessions, n_bounce,
       CAST(floor(CAST(n_bounce AS DOUBLE) / n_sessions * 1000000
                  + {_OFF}) AS BIGINT) AS bounce_e6
FROM agg
ORDER BY hr
"""


# ---------------------------------------------------------------------------
# daily_span_quantiles — time-on-platform proxy: daily activity span
# ---------------------------------------------------------------------------
# Per (user, day): span minutes between first and last event; exact
# quartiles + p90 on the minute value domain (conversion_lag
# discipline).


def q_daily_span_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    per = ev.groupBy(
        "user_id",
        F.floor(sec / 86_400).cast("long").alias("day"),
    ).agg(
        (
            F.floor((F.max(sec) - F.min(sec)) / 60)
        ).cast("long").alias("span_min")
    )
    cnt = per.groupBy("span_min").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy("span_min")
    cum = cnt.withColumn(
        "cum", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("c").over(Window.partitionBy()))
    qs = cum.withColumn(
        "pct",
        F.explode(
            F.array(F.lit(25), F.lit(50), F.lit(75), F.lit(90))
        ),
    )
    k = F.expr("((tot - 1) * pct) div 100") + 1
    sel = qs.filter(
        ((F.col("cum") - F.col("c")) < k) & (k <= F.col("cum"))
    )
    return sel.select(
        F.col("pct").cast("long").alias("pct"),
        F.col("span_min").cast("long").alias("span_min"),
        F.col("tot").cast("long").alias("n_user_days"),
    ).orderBy("pct")


SQL_DAILY_SPAN = """
WITH per AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor((max(CAST(floor(epoch(ts)) AS BIGINT))
                     - min(CAST(floor(epoch(ts)) AS BIGINT))) / 60.0)
              AS BIGINT) AS span_min
  FROM events GROUP BY 1, 2
), cnt AS (
  SELECT span_min, count(*) AS c FROM per GROUP BY 1
), cum AS (
  SELECT span_min, c,
         sum(c) OVER (ORDER BY span_min) AS cum,
         sum(c) OVER () AS tot
  FROM cnt
), qs AS (
  SELECT cum.*, p.pct
  FROM cum CROSS JOIN (VALUES (25), (50), (75), (90)) AS p(pct)
)
SELECT CAST(pct AS BIGINT) AS pct, CAST(span_min AS BIGINT) AS span_min,
       CAST(tot AS BIGINT) AS n_user_days
FROM qs
WHERE cum - c < ((tot - 1) * pct) // 100 + 1
  AND ((tot - 1) * pct) // 100 + 1 <= cum
ORDER BY pct
"""


# ---------------------------------------------------------------------------
# type_phi_matrix — phi association between heavy-usage type pairs
# ---------------------------------------------------------------------------
# Yule's phi (2x2 Pearson) over users with "heavy user of type T" =
# per-user count STRICTLY above the type's exact p75 over users (the
# value-domain order stat), which guarantees non-degenerate margins.
# All cells exact counts off one per-(user, type) table and a pair
# self-join bounded by types^2; phi is one fixed-order chain.


def q_type_phi_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    cnt = per.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).alias("k")
    )
    wo = Window.partitionBy("event_type").orderBy("c")
    wn = Window.partitionBy("event_type")
    cum = cnt.withColumn(
        "cum", F.sum("k").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("k").over(wn))
    kth = F.expr("((tot - 1) * 75) div 100") + 1
    q75 = cum.filter(
        ((F.col("cum") - F.col("k")) < kth) & (kth <= F.col("cum"))
    ).select("event_type", F.col("c").alias("p75"))
    heavy = per.join(F.broadcast(q75), "event_type").filter(
        F.col("c") > F.col("p75")
    ).select("user_id", "event_type")
    tot_u = per.select("user_id").distinct().count()
    marg = heavy.groupBy("event_type").agg(F.count(F.lit(1)).alias("na"))
    b = heavy.select(
        F.col("user_id"), F.col("event_type").alias("et2")
    )
    both = (
        heavy.join(b, "user_id")
        .filter(F.col("event_type") < F.col("et2"))
        .groupBy(F.col("event_type").alias("et1"), "et2")
        .agg(F.count(F.lit(1)).alias("n11"))
    )
    ma = marg.select(F.col("event_type").alias("et1"), F.col("na").alias("na"))
    mb = marg.select(F.col("event_type").alias("et2"), F.col("na").alias("nb"))
    j = both.join(F.broadcast(ma), "et1").join(F.broadcast(mb), "et2")
    n = F.lit(float(tot_u))
    n11 = F.col("n11").cast("double")
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    num = n11 * n - na * nb
    den = F.sqrt(na * (n - na) * nb * (n - nb))
    return j.filter(den > 0).select(
        "et1",
        "et2",
        F.col("n11").cast("long").alias("n_both"),
        F.floor(num / den * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "phi_e6"
        ),
    ).orderBy("et1", "et2")


SQL_TYPE_PHI = f"""
WITH per AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), cnt AS (
  SELECT event_type, c, count(*) AS k FROM per GROUP BY 1, 2
), cum AS (
  SELECT event_type, c, k,
         sum(k) OVER (PARTITION BY event_type ORDER BY c) AS cum,
         sum(k) OVER (PARTITION BY event_type) AS tot
  FROM cnt
), q75 AS (
  SELECT event_type, c AS p75
  FROM cum
  WHERE cum - k < ((tot - 1) * 75) // 100 + 1
    AND ((tot - 1) * 75) // 100 + 1 <= cum
), heavy AS (
  SELECT per.user_id, per.event_type
  FROM per JOIN q75 ON q75.event_type = per.event_type
  WHERE per.c > q75.p75
), totu AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM per
), marg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS na
  FROM heavy GROUP BY 1
), pairboth AS (
  SELECT a.event_type AS et1, b.event_type AS et2,
         CAST(count(*) AS BIGINT) AS n11
  FROM heavy a JOIN heavy b
    ON b.user_id = a.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT et1, et2, n11 AS n_both,
       CAST(floor((CAST(n11 AS DOUBLE) * totu.n
                   - CAST(ma.na AS DOUBLE) * mb.na)
                  / sqrt(CAST(ma.na AS DOUBLE) * (totu.n - ma.na)
                         * mb.na * (totu.n - mb.na))
                  * 1000000 + {_OFF}) AS BIGINT) AS phi_e6
FROM pairboth
JOIN marg ma ON ma.event_type = pairboth.et1
JOIN marg mb ON mb.event_type = pairboth.et2
CROSS JOIN totu
WHERE CAST(ma.na AS DOUBLE) * (totu.n - ma.na)
      * mb.na * (totu.n - mb.na) > 0
ORDER BY et1, et2
"""


# ---------------------------------------------------------------------------
# volume_value_corr — does busy mean cheap? daily count vs mean value
# ---------------------------------------------------------------------------
# Pearson correlation between a type's daily event count and its
# daily MEAN value (volume-value decoupling).  Daily means are the
# house coarse centivalue floor (2-decimal aggregate-mean convention);
# cross-moments then run on exact integers.


def q_volume_value_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.floor(F.avg("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "mv"
        ),
    )
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum("mv").alias("sm"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
        F.sum(F.col("mv") * F.col("mv")).alias("smm"),
        F.sum(F.col("c") * F.col("mv")).alias("scm"),
    )
    vc = (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")).cast(
        "double"
    )
    vm = (F.col("n") * F.col("smm") - F.col("sm") * F.col("sm")).cast(
        "double"
    )
    cov = (F.col("n") * F.col("scm") - F.col("sc") * F.col("sm")).cast(
        "double"
    )
    r = cov / F.sqrt(vc * vm)
    return agg.filter((F.col("n") >= 5) & (vc > 0) & (vm > 0)).select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias("r_e6"),
    ).orderBy("event_type")


SQL_VOLUME_VALUE = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c,
         CAST(floor(avg(value) * 100 + {_OFF}) AS BIGINT) AS mv
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS sc, CAST(sum(mv) AS BIGINT) AS sm,
         CAST(sum(c * c) AS BIGINT) AS scc,
         CAST(sum(mv * mv) AS BIGINT) AS smm,
         CAST(sum(c * mv) AS BIGINT) AS scm
  FROM daily GROUP BY 1
)
SELECT event_type, n AS n_days,
       CAST(floor(CAST(n * scm - sc * sm AS DOUBLE)
                  / sqrt(CAST(n * scc - sc * sc AS DOUBLE)
                         * CAST(n * smm - sm * sm AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS r_e6
FROM agg
WHERE n >= 5 AND n * scc - sc * sc > 0 AND n * smm - sm * sm > 0
ORDER BY event_type
"""



# ---------------------------------------------------------------------------
# otsu_threshold — Otsu's between-class variance split of the value mix
# ---------------------------------------------------------------------------
# Otsu (IEEE TSMC 9, 1979): the threshold maximizing between-class
# variance w0 w1 (mu0 - mu1)^2 over the centivalue histogram — the
# classic unsupervised 2-mixture split, run per event type on the
# exact integer value domain.  The objective is evaluated per
# candidate cut from exact prefix sums and e6-floored BEFORE the
# order-free argmax (ties -> lowest threshold).


def q_otsu_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cnt = v.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    cum = (
        cnt.withColumn(
            "cw",
            F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "cs",
            F.sum(F.col("c") * F.col("v")).over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("tw", F.sum("c").over(wn))
        .withColumn(
            "ts", F.sum(F.col("c") * F.col("v")).over(wn)
        )
    )
    cand = cum.filter(F.col("cw") < F.col("tw"))
    w0 = F.col("cw").cast("double")
    w1 = (F.col("tw") - F.col("cw")).cast("double")
    mu0 = F.col("cs").cast("double") / w0
    mu1 = (F.col("ts") - F.col("cs")).cast("double") / w1
    obj = w0 * w1 * (mu0 - mu1) * (mu0 - mu1) / (
        F.col("tw").cast("double") * F.col("tw").cast("double")
    )
    cand = cand.select(
        "event_type",
        "v",
        F.floor(obj * 1e6 + F.lit(_OFF)).cast("long").alias("o6"),
        F.floor(
            w0 / F.col("tw").cast("double") * 1_000_000 + F.lit(_OFF)
        ).cast("long").alias("w0_e6"),
    )
    wmax = Window.partitionBy("event_type").orderBy(
        F.col("o6").desc(), F.col("v").asc()
    )
    top = cand.withColumn("rk", F.row_number().over(wmax)).filter(
        F.col("rk") == 1
    )
    return top.select(
        "event_type",
        F.col("v").cast("long").alias("threshold_c"),
        F.col("o6").cast("long").alias("between_var_e6"),
        F.col("w0_e6").cast("long").alias("low_share_e6"),
    ).orderBy("event_type")


SQL_OTSU = f"""
WITH v AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cnt AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
  FROM v GROUP BY 1, 2
), cum AS (
  SELECT event_type, v, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cw,
         sum(c * v) OVER (PARTITION BY event_type ORDER BY v) AS cs,
         sum(c) OVER (PARTITION BY event_type) AS tw,
         sum(c * v) OVER (PARTITION BY event_type) AS ts
  FROM cnt
), cand AS (
  SELECT event_type, v,
         CAST(floor(CAST(cw AS DOUBLE) * (tw - cw)
                    * (CAST(cs AS DOUBLE) / cw
                       - CAST(ts - cs AS DOUBLE) / (tw - cw))
                    * (CAST(cs AS DOUBLE) / cw
                       - CAST(ts - cs AS DOUBLE) / (tw - cw))
                    / (CAST(tw AS DOUBLE) * tw) * 1e6 + {_OFF})
              AS BIGINT) AS o6,
         CAST(floor(CAST(cw AS DOUBLE) / tw * 1000000 + {_OFF})
              AS BIGINT) AS w0_e6
  FROM cum WHERE cw < tw
), top AS (
  SELECT event_type, v, o6, w0_e6,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY o6 DESC, v ASC) AS rk
  FROM cand
)
SELECT event_type, CAST(v AS BIGINT) AS threshold_c,
       o6 AS between_var_e6, w0_e6 AS low_share_e6
FROM top
WHERE rk = 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# length_auc_langid — ROC AUC of doc length as an is-English classifier
# ---------------------------------------------------------------------------
# AUC = P(X_pos > X_neg) + P(=)/2, computed EXACTLY via the tie-
# corrected Mann-Whitney rank-sum identity on the n_chars value
# domain: AUC = (R_pos - n_pos (n_pos + 1)/2) / (n_pos n_neg) with
# midranks — everything an exact rational off integer counts (the 2x
# scaling keeps midranks integral).


def q_length_auc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        (F.col("lang") == "en").cast("long").alias("pos"),
        F.col("n_chars").cast("long").alias("x"),
    )
    cnt = d.groupBy("x").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("pos").alias("cp"),
    )
    wo = Window.orderBy("x")
    cum = cnt.withColumn(
        "cumc",
        F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # doubled midrank of the tied block at value x: (prev + 1) + cumc
    r2 = cum.select(
        "x",
        "c",
        "cp",
        (F.col("cumc") - F.col("c") + 1 + F.col("cumc")).alias("mr2"),
    )
    agg = r2.agg(
        F.sum("cp").alias("npos"),
        F.sum(F.col("c") - F.col("cp")).alias("nneg"),
        F.sum(F.col("cp") * F.col("mr2")).alias("rp2"),
    )
    npos = F.col("npos").cast("double")
    nneg = F.col("nneg").cast("double")
    auc = (
        F.col("rp2").cast("double") / 2.0
        - npos * (npos + 1.0) / 2.0
    ) / (npos * nneg)
    return agg.filter((F.col("npos") > 0) & (F.col("nneg") > 0)).select(
        F.col("npos").cast("long").alias("n_pos"),
        F.col("nneg").cast("long").alias("n_neg"),
        F.floor(auc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "auc_e6"
        ),
    )


SQL_LENGTH_AUC = f"""
WITH d AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         CAST(n_chars AS BIGINT) AS x
  FROM documents
), cnt AS (
  SELECT x, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(pos) AS BIGINT) AS cp
  FROM d GROUP BY 1
), cum AS (
  SELECT x, c, cp,
         sum(c) OVER (ORDER BY x) AS cumc
  FROM cnt
), agg AS (
  SELECT CAST(sum(cp) AS BIGINT) AS npos,
         CAST(sum(c - cp) AS BIGINT) AS nneg,
         CAST(sum(cp * (cumc - c + 1 + cumc)) AS BIGINT) AS rp2
  FROM cum
)
SELECT npos AS n_pos, nneg AS n_neg,
       CAST(floor((CAST(rp2 AS DOUBLE) / 2.0
                   - CAST(npos AS DOUBLE) * (npos + 1.0) / 2.0)
                  / (CAST(npos AS DOUBLE) * nneg) * 1000000 + {_OFF})
            AS BIGINT) AS auc_e6
FROM agg
WHERE npos > 0 AND nneg > 0
"""


# ---------------------------------------------------------------------------
# page_trend_test — Page's L for ordered weekly alternatives
# ---------------------------------------------------------------------------
# Page (JASA 58, 1963): with event types as blocks and weeks as the
# ordered treatments, rank each type's weekly daily-mean within the
# block (row_number, count desc ties -> week asc, documented) and
# L = sum_w w_idx R_w; z uses the exact null moments.  Everything up
# to z is exact integer.


def q_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.unix_micros(F.col("ts").cast("timestamp"))
    wkcell = ev.groupBy(
        "event_type",
        F.floor(sec / (86_400_000_000 * 7)).cast("long").alias("wk"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wmin = wkcell.agg(F.min("wk").alias("w0"))
    wkcell = wkcell.crossJoin(F.broadcast(wmin)).select(
        "event_type",
        (F.col("wk") - F.col("w0") + 1).alias("widx"),
        "c",
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.asc("c"), F.asc("widx")
    )
    ranked = wkcell.withColumn("r", F.row_number().over(wr))
    rw = ranked.groupBy("widx").agg(
        F.sum("r").alias("rw"),
        F.count(F.lit(1)).alias("m"),
    )
    agg = rw.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("m").alias("m"),
        F.sum(F.col("widx") * F.col("rw")).alias("l_stat"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    el = md * nd * (nd + 1.0) * (nd + 1.0) / 4.0
    vl = (
        md
        * nd
        * nd
        * (nd + 1.0)
        * (nd * nd - 1.0)
        * (nd + 1.0)
        / 144.0
    )
    z = (F.col("l_stat").cast("double") - el) / F.sqrt(vl)
    return agg.filter((F.col("n") >= 3) & (vl > 0)).select(
        F.col("m").cast("long").alias("n_blocks"),
        F.col("n").cast("long").alias("n_weeks"),
        F.col("l_stat").cast("long").alias("l_stat"),
        F.floor(el * 100 + F.lit(_OFF)).cast("long").alias("e_l_e2"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    )


SQL_PAGE_TREND = f"""
WITH wkcell AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), wmin AS (
  SELECT min(wk) AS w0 FROM wkcell
), idx AS (
  SELECT event_type, wk - w0 + 1 AS widx, c
  FROM wkcell CROSS JOIN wmin
), ranked AS (
  SELECT event_type, widx,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY c ASC, widx ASC) AS BIGINT) AS r
  FROM idx
), rw AS (
  SELECT widx, CAST(sum(r) AS BIGINT) AS rw,
         CAST(count(*) AS BIGINT) AS m
  FROM ranked GROUP BY 1
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(m) AS BIGINT) AS m,
         CAST(sum(widx * rw) AS BIGINT) AS l_stat
  FROM rw
)
SELECT m AS n_blocks, n AS n_weeks, l_stat,
       CAST(floor(CAST(m AS DOUBLE) * n * (n + 1.0) * (n + 1.0) / 4.0
                  * 100 + {_OFF}) AS BIGINT) AS e_l_e2,
       CAST(floor((CAST(l_stat AS DOUBLE)
                   - CAST(m AS DOUBLE) * n * (n + 1.0) * (n + 1.0) / 4.0)
                  / sqrt(CAST(m AS DOUBLE) * n * n * (n + 1.0)
                         * (CAST(n AS DOUBLE) * n - 1.0) * (n + 1.0)
                         / 144.0)
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg
WHERE n >= 3
  AND CAST(m AS DOUBLE) * n * n * (n + 1.0)
      * (CAST(n AS DOUBLE) * n - 1.0) * (n + 1.0) / 144.0 > 0
"""


# ---------------------------------------------------------------------------
# char_drift_kl — add-one-smoothed char KL between id-range halves
# ---------------------------------------------------------------------------
# Content drift at the character level: per language, KL(first-half
# char dist || second-half) with add-one smoothing over the UNION
# charset — the fine-grained companion to lang_mix_drift (which only
# sees labels).  Chars via the rankprofile 1-gram construction; the
# id-range midpoint split (no corpus window); per-char terms
# e9-floored before the sum.


def q_char_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "lang", "text")
    span = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    d = d.crossJoin(F.broadcast(span)).select(
        "lang",
        (F.col("doc_id") * 2 <= F.col("lo") + F.col("hi"))
        .cast("long")
        .alias("h1"),
        "text",
    )
    # trim hoisted out of the lambda (round-5 profile; O(len^2) -> O(len))
    ch = d.select(
        "lang", "h1", F.expr("trim(text)").alias("_t")
    ).select(
        "lang",
        "h1",
        F.explode(
            F.expr(
                "filter(transform(sequence(1, greatest(length(_t),"
                " 0)), i -> substring(_t, i, 1)), x -> x <> '')"
            )
        ).alias("ch"),
    )
    cnt = ch.groupBy("lang", "ch").agg(
        F.sum("h1").alias("a"),
        F.sum(1 - F.col("h1")).alias("b"),
    )
    tot = cnt.groupBy("lang").agg(
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.count(F.lit(1)).alias("k"),
    )
    j = cnt.join(F.broadcast(tot), "lang")
    pa = (F.col("a") + 1).cast("double") / (F.col("ta") + F.col("k")).cast(
        "double"
    )
    pb = (F.col("b") + 1).cast("double") / (F.col("tb") + F.col("k")).cast(
        "double"
    )
    term = pa * F.log(pa / pb)
    e = j.select(
        "lang",
        F.floor(term * 1e9 + F.lit(_OFF)).cast("long").alias("e9"),
    ).groupBy("lang").agg(
        F.count(F.lit(1)).alias("k_chars"),
        F.sum("e9").alias("s9"),
    )
    return e.select(
        "lang",
        F.col("k_chars").cast("long").alias("k_chars"),
        F.floor(F.col("s9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("kl_e6"),
    ).orderBy("lang")


SQL_CHAR_DRIFT = f"""
WITH span AS (
  SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents
), d AS (
  SELECT lang,
         CASE WHEN doc_id * 2 <= span.lo + span.hi THEN 1 ELSE 0 END AS h1,
         text
  FROM documents CROSS JOIN span
), ch AS (
  SELECT lang, h1,
         unnest(list_filter(list_transform(
           generate_series(1, greatest(len(trim(text)), 0)),
           i -> substr(trim(text), i, 1)), x -> x <> '')) AS ch
  FROM d
), cnt AS (
  SELECT lang, ch, CAST(sum(h1) AS BIGINT) AS a,
         CAST(sum(1 - h1) AS BIGINT) AS b
  FROM ch GROUP BY 1, 2
), tot AS (
  SELECT lang, CAST(sum(a) AS BIGINT) AS ta,
         CAST(sum(b) AS BIGINT) AS tb,
         CAST(count(*) AS BIGINT) AS k
  FROM cnt GROUP BY 1
), e AS (
  SELECT cnt.lang, CAST(count(*) AS BIGINT) AS k_chars,
         CAST(sum(CAST(floor((CAST(cnt.a + 1 AS DOUBLE) / (tot.ta + tot.k))
                             * ln((CAST(cnt.a + 1 AS DOUBLE)
                                   / (tot.ta + tot.k))
                                  / (CAST(cnt.b + 1 AS DOUBLE)
                                     / (tot.tb + tot.k)))
                             * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT) AS s9
  FROM cnt JOIN tot ON tot.lang = cnt.lang
  GROUP BY 1
)
SELECT lang, k_chars,
       CAST(floor(CAST(s9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS kl_e6
FROM e
ORDER BY lang
"""



# ---------------------------------------------------------------------------
# pareto_ratio — value concentration: top-20% share and the 80% point
# ---------------------------------------------------------------------------
# The iconic Pareto numbers on per-user total centivalue, computed on
# the DISTINCT-VALUE domain (cumulative windows over distinct v, the
# house value-domain posture — never a corpus-wide per-user window):
# the top-20% cutoff and the 80%-of-value crossing both land inside a
# tied value block, resolved by EXACT integer interpolation (k20 users
# at v* contribute (k20 - prev_users) * v*; the 80% crossing rank is
# an integer ceiling).


def q_pareto_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")).alias(
            "v"
        )
    )
    dom = per.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy(F.desc("v"))
    wall = Window.partitionBy()
    cum = (
        dom.withColumn(
            "cc", F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn(
            "cv",
            F.sum(F.col("c") * F.col("v")).over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("n", F.sum("c").over(wall))
        .withColumn("tv", F.sum(F.col("c") * F.col("v")).over(wall))
    )
    k20 = F.floor((F.col("n") + 4) / 5)
    blk20 = cum.filter(
        ((F.col("cc") - F.col("c")) < k20) & (k20 <= F.col("cc"))
    ).select(
        "n",
        "tv",
        (
            F.col("cv")
            - F.col("c") * F.col("v")
            + (k20 - (F.col("cc") - F.col("c"))) * F.col("v")
        ).alias("v20"),
    )
    # 80% crossing: first block where cv*10 >= tv*8; rank inside it
    blk80 = cum.filter(
        (F.col("cv") * 10 >= F.col("tv") * 8)
        & ((F.col("cv") - F.col("c") * F.col("v")) * 10 < F.col("tv") * 8)
    ).select(
        (
            F.col("cc")
            - F.col("c")
            + F.ceil(
                (
                    F.col("tv") * 8
                    - (F.col("cv") - F.col("c") * F.col("v")) * 10
                ).cast("double")
                / (F.col("v") * 10).cast("double")
            )
        ).alias("k80")
    )
    j = blk20.crossJoin(F.broadcast(blk80))
    return j.select(
        F.col("n").cast("long").alias("n_users"),
        F.floor(
            F.col("v20").cast("double") / F.col("tv").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("top20_value_share_e6"),
        F.floor(
            F.col("k80").cast("double") / F.col("n").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("users_for_80pct_e6"),
    )


SQL_PARETO = f"""
WITH per AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS v
  FROM events GROUP BY 1
), dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY 1
), cum AS (
  SELECT v, c,
         sum(c) OVER (ORDER BY v DESC) AS cc,
         sum(c * v) OVER (ORDER BY v DESC) AS cv,
         sum(c) OVER () AS n,
         sum(c * v) OVER () AS tv
  FROM dom
), blk20 AS (
  SELECT n, tv,
         cv - c * v + ((n + 4) // 5 - (cc - c)) * v AS v20
  FROM cum
  WHERE cc - c < (n + 4) // 5 AND (n + 4) // 5 <= cc
), blk80 AS (
  SELECT cc - c + CAST(ceil(CAST(tv * 8 - (cv - c * v) * 10 AS DOUBLE)
                            / (CAST(v AS DOUBLE) * 10)) AS BIGINT) AS k80
  FROM cum
  WHERE cv * 10 >= tv * 8 AND (cv - c * v) * 10 < tv * 8
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(floor(CAST(v20 AS DOUBLE) / tv * 1000000 + {_OFF})
            AS BIGINT) AS top20_value_share_e6,
       CAST(floor(CAST(k80 AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS users_for_80pct_e6
FROM blk20 CROSS JOIN blk80
"""


# ---------------------------------------------------------------------------
# session_type_diversity — distinct event types per session
# ---------------------------------------------------------------------------
# Session breadth census on the house 1800 s rule: the distribution
# of DISTINCT types per session (mean, share single-type, share
# full-width) — exact counting end to end.


def q_session_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = (
        ev.select(
            "user_id", "event_id", "event_type", sec.cast("long").alias("s")
        )
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
            F.sum("brk").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    per = g.groupBy("user_id", "sid").agg(
        F.countDistinct("event_type").alias("k"),
        F.count(F.lit(1)).alias("len"),
    )
    hist = per.groupBy("k").agg(F.count(F.lit(1)).alias("n_sessions"))
    tot = hist.agg(
        F.sum("n_sessions").alias("t"),
        F.sum(F.col("k") * F.col("n_sessions")).alias("sk"),
    )
    out = hist.crossJoin(F.broadcast(tot))
    return out.select(
        F.col("k").cast("long").alias("n_types"),
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.floor(
            F.col("n_sessions").cast("double")
            / F.col("t").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("share_e6"),
        F.floor(
            F.col("sk").cast("double") / F.col("t").cast("double") * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_types_e4"),
    ).orderBy("n_types")


SQL_SESSION_DIVERSITY = f"""
WITH g AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev
  FROM events
), b AS (
  SELECT user_id, event_type, s,
         CAST(sum(CASE WHEN prev IS NULL OR s - prev > 1800
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, event_id)
              AS BIGINT) AS sid
  FROM g
), per AS (
  SELECT user_id, sid,
         CAST(count(DISTINCT event_type) AS BIGINT) AS k
  FROM b GROUP BY 1, 2
), hist AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_sessions
  FROM per GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_sessions) AS BIGINT) AS t,
         CAST(sum(k * n_sessions) AS BIGINT) AS sk
  FROM hist
)
SELECT k AS n_types, n_sessions,
       CAST(floor(CAST(n_sessions AS DOUBLE) / t * 1000000 + {_OFF})
            AS BIGINT) AS share_e6,
       CAST(floor(CAST(sk AS DOUBLE) / t * 10000 + {_OFF})
            AS BIGINT) AS mean_types_e4
FROM hist CROSS JOIN tot
ORDER BY n_types
"""


# ---------------------------------------------------------------------------
# dow_adjusted_outliers — day-of-week-adjusted daily outlier census
# ---------------------------------------------------------------------------
# Seasonal SPC: daily totals z-scored WITHIN their day-of-week group
# (removing the weekly cycle before flagging), census of |z| > 2 days
# per event type.  Group moments exact BIGINT; per-day z fixed-order;
# the census is exact counting.


def q_dow_adjusted_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    daily = daily.withColumn("dow", F.col("day") % 7)
    mom = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    ).filter(F.col("n") >= 2)
    j = daily.join(mom, ["event_type", "dow"])
    nd = F.col("n").cast("double")
    mu = F.col("s").cast("double") / nd
    var = (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
        "double"
    ) / (nd * (nd - 1.0))
    z = (F.col("y").cast("double") - mu) / F.sqrt(var)
    per = j.filter(var > 0).select(
        "event_type",
        F.floor(F.abs(z) * 1e6 + F.lit(_OFF)).cast("long").alias("az6"),
    )
    agg = per.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum((F.col("az6") > 2_000_000).cast("long")).alias("n_out"),
        F.max("az6").alias("max_az6"),
    )
    return agg.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_out").cast("long").alias("n_outliers"),
        F.floor(F.col("max_az6").cast("double") / 100.0 + F.lit(_OFF))
        .cast("long")
        .alias("max_absz_e4"),
    ).orderBy("event_type")


SQL_DOW_OUTLIERS = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), dd AS (
  SELECT event_type, day % 7 AS dow, y FROM daily
), mom AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(y * y) AS BIGINT) AS ss
  FROM dd GROUP BY 1, 2 HAVING count(*) >= 2
), per AS (
  SELECT dd.event_type,
         CAST(floor(abs((CAST(dd.y AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
                        / sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE)
                               / (CAST(m.n AS DOUBLE) * (m.n - 1.0))))
                    * 1e6 + {_OFF}) AS BIGINT) AS az6
  FROM dd JOIN mom m ON m.event_type = dd.event_type AND m.dow = dd.dow
  WHERE m.n * m.ss - m.s * m.s > 0
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN az6 > 2000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(floor(CAST(max(az6) AS DOUBLE) / 100.0 + {_OFF})
            AS BIGINT) AS max_absz_e4
FROM per
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# depth_purchase_hazard — P(purchase at step k | reached step k)
# ---------------------------------------------------------------------------
# The discrete funnel hazard over within-session event depth (house
# 1800 s sessions): at each step k = 1..8, among sessions reaching
# step k, the share whose k-th event is a purchase.  Step indices via
# one per-session row_number; everything exact counting.


def q_depth_purchase_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = (
        ev.select(
            "user_id", "event_id", "event_type", sec.cast("long").alias("s")
        )
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
            F.sum("brk").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("s", "event_id")
    step = g.withColumn("k", F.row_number().over(ws)).filter(
        F.col("k") <= 8
    )
    agg = step.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "n_purchase"
        ),
    )
    hz = F.col("n_purchase").cast("double") / F.col("n_reached").cast(
        "double"
    )
    return agg.select(
        F.col("k").cast("long").alias("step"),
        F.col("n_reached").cast("long").alias("n_reached"),
        F.col("n_purchase").cast("long").alias("n_purchase"),
        F.floor(hz * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "hazard_e6"
        ),
    ).orderBy("step")


SQL_DEPTH_HAZARD = f"""
WITH g AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev
  FROM events
), b AS (
  SELECT user_id, event_type, s, event_id,
         CAST(sum(CASE WHEN prev IS NULL OR s - prev > 1800
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, event_id)
              AS BIGINT) AS sid
  FROM g
), step AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY s, event_id) AS k
  FROM b QUALIFY k <= 8
)
SELECT CAST(k AS BIGINT) AS step,
       CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(floor(CAST(sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*) * 1000000 + {_OFF}) AS BIGINT) AS hazard_e6
FROM step
GROUP BY 1
ORDER BY step
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "hubness_skew": q_hubness_skew,
    "embedding_anisotropy": q_embedding_anisotropy,
    "ovl_coefficient": q_ovl_coefficient,
    "whittaker_beta": q_whittaker_beta,
    "term_position_bias": q_term_position_bias,
    "gibrat_law": q_gibrat_law,
    "spectral_flatness": q_spectral_flatness,
    "precedence_matrix": q_precedence_matrix,
    "adjacent_containment": q_adjacent_containment,
    "cochran_armitage": q_cochran_armitage,
    "welch_anova": q_welch_anova,
    "markov_stationary": q_markov_stationary,
    "topk_tenure": q_topk_tenure,
    "nested_variance_components": q_nested_variance_components,
    "diel_amplitude_drift": q_diel_amplitude_drift,
    "transition_predictability": q_transition_predictability,
    "fleiss_kappa": q_fleiss_kappa,
    "burst_excitation": q_burst_excitation,
    "type_run_lengths": q_type_run_lengths,
    "winsor_impact": q_winsor_impact,
    "id_gap_audit": q_id_gap_audit,
    "lang_mix_drift": q_lang_mix_drift,
    "modal_hour_stability": q_modal_hour_stability,
    "footrule_weekly": q_footrule_weekly,
    "hill_k_sweep": q_hill_k_sweep,
    "diel_harmonics": q_diel_harmonics,
    "growth_accounting": q_growth_accounting,
    "masd_volatility": q_masd_volatility,
    "type_quantile_shift": q_type_quantile_shift,
    "gph_estimator": q_gph_estimator,
    "activity_block_entropy": q_activity_block_entropy,
    "cohort_half_life": q_cohort_half_life,
    "freq_spectrum_fit": q_freq_spectrum_fit,
    "hourly_conversion_wilson": q_hourly_conversion_wilson,
    "prefix_mean_stability": q_prefix_mean_stability,
    "participation_ratio": q_participation_ratio,
    "how_surprise": q_how_surprise,
    "sq8_error_audit": q_sq8_error_audit,
    "think_time_quantiles": q_think_time_quantiles,
    "trend_direction_census": q_trend_direction_census,
    "bounce_rate_hourly": q_bounce_rate_hourly,
    "daily_span_quantiles": q_daily_span_quantiles,
    "type_phi_matrix": q_type_phi_matrix,
    "volume_value_corr": q_volume_value_corr,
    "otsu_threshold": q_otsu_threshold,
    "length_auc_langid": q_length_auc_langid,
    "page_trend_test": q_page_trend_test,
    "char_drift_kl": q_char_drift_kl,
    "pareto_ratio": q_pareto_ratio,
    "session_type_diversity": q_session_type_diversity,
    "dow_adjusted_outliers": q_dow_adjusted_outliers,
    "depth_purchase_hazard": q_depth_purchase_hazard,
}

ORACLE_SQL: dict[str, str] = {
    "hubness_skew": SQL_HUBNESS,
    "embedding_anisotropy": SQL_ANISOTROPY,
    "ovl_coefficient": SQL_OVL,
    "whittaker_beta": SQL_WHITTAKER,
    "term_position_bias": SQL_TERM_POSITION,
    "gibrat_law": SQL_GIBRAT,
    "spectral_flatness": SQL_SPECTRAL_FLATNESS,
    "precedence_matrix": SQL_PRECEDENCE,
    "adjacent_containment": SQL_ADJ_CONTAINMENT,
    "cochran_armitage": SQL_COCHRAN_ARMITAGE,
    "welch_anova": SQL_WELCH_ANOVA,
    "markov_stationary": _sql_markov_stationary(),
    "topk_tenure": SQL_TOPK_TENURE,
    "nested_variance_components": SQL_NESTED_VAR,
    "diel_amplitude_drift": SQL_DIEL_AMPLITUDE,
    "transition_predictability": SQL_PREDICTABILITY,
    "fleiss_kappa": SQL_FLEISS,
    "burst_excitation": SQL_BURST_EXCITATION,
    "type_run_lengths": SQL_TYPE_RUNS,
    "winsor_impact": SQL_WINSOR,
    "id_gap_audit": SQL_ID_GAP,
    "lang_mix_drift": SQL_LANG_MIX,
    "modal_hour_stability": SQL_MODAL_HOUR,
    "footrule_weekly": SQL_FOOTRULE,
    "hill_k_sweep": SQL_HILL_SWEEP,
    "diel_harmonics": SQL_DIEL_HARMONICS,
    "growth_accounting": SQL_GROWTH,
    "masd_volatility": SQL_MASD,
    "type_quantile_shift": SQL_TYPE_SHIFT,
    "gph_estimator": SQL_GPH,
    "activity_block_entropy": SQL_BLOCK_ENTROPY,
    "cohort_half_life": SQL_COHORT_HL,
    "freq_spectrum_fit": SQL_FREQ_SPECTRUM,
    "hourly_conversion_wilson": SQL_HOURLY_WILSON,
    "prefix_mean_stability": SQL_PREFIX_MEAN,
    "participation_ratio": SQL_PARTICIPATION,
    "how_surprise": SQL_HOW_SURPRISE,
    "sq8_error_audit": SQL_SQ8,
    "think_time_quantiles": SQL_THINK_TIME,
    "trend_direction_census": SQL_TREND_CENSUS,
    "bounce_rate_hourly": SQL_BOUNCE,
    "daily_span_quantiles": SQL_DAILY_SPAN,
    "type_phi_matrix": SQL_TYPE_PHI,
    "volume_value_corr": SQL_VOLUME_VALUE,
    "otsu_threshold": SQL_OTSU,
    "length_auc_langid": SQL_LENGTH_AUC,
    "page_trend_test": SQL_PAGE_TREND,
    "char_drift_kl": SQL_CHAR_DRIFT,
    "pareto_ratio": SQL_PARETO,
    "session_type_diversity": SQL_SESSION_DIVERSITY,
    "dow_adjusted_outliers": SQL_DOW_OUTLIERS,
    "depth_purchase_hazard": SQL_DEPTH_HAZARD,
}
