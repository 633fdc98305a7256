"""Round-4 continuation registry (fifteenth battery): EXACT
small-sample tests — Fisher's exact 2x2, the exact binomial sign test,
hypergeometric term-enrichment (the GSEA primitive), and Tukey-Kramer
HSD — all previously absent because they need log-factorials, which
neither engine shares as a builtin (Spark has no lgamma).  The unlock:
ln Gamma via the SAME Lanczos g=5 series written verbatim in both
engines (the gev_lmom_fit precedent), making every hypergeometric /
binomial term an identical double that is e12-floored before exact
integer summation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF


def _lngamma(x: Column) -> Column:
    """Lanczos g=5 ln Gamma(x), x > 0 — verbatim twin of _LNGAMMA_SQL."""
    ser = (
        F.lit(1.000000000190015)
        + 76.18009172947146 / (x + 1)
        - 86.50532032941677 / (x + 2)
        + 24.01409824083091 / (x + 3)
        - 1.231739572450155 / (x + 4)
        + 0.1208650973866179e-2 / (x + 5)
        - 0.5395239384953e-5 / (x + 6)
    )
    return (
        (x + 0.5) * F.log(x + 5.5)
        - (x + 5.5)
        + F.log(F.lit(2.5066282746310005) * ser / x)
    )


def _lngamma_sql(x: str) -> str:
    return (
        f"((({x}) + 0.5) * ln(({x}) + 5.5) - (({x}) + 5.5)"
        f" + ln(2.5066282746310005 * (1.000000000190015"
        f"   + 76.18009172947146 / (({x}) + 1)"
        f"   - 86.50532032941677 / (({x}) + 2)"
        f"   + 24.01409824083091 / (({x}) + 3)"
        f"   - 1.231739572450155 / (({x}) + 4)"
        f"   + 0.1208650973866179e-2 / (({x}) + 5)"
        f"   - 0.5395239384953e-5 / (({x}) + 6)) / ({x})))"
    )


def _lnchoose(n: Column, k: Column) -> Column:
    return (
        _lngamma(n + 1.0) - _lngamma(k + 1.0) - _lngamma(n - k + 1.0)
    )


def _lnchoose_sql(n: str, k: str) -> str:
    return (
        f"({_lngamma_sql(f'({n}) + 1.0')}"
        f" - {_lngamma_sql(f'({k}) + 1.0')}"
        f" - {_lngamma_sql(f'({n}) - ({k}) + 1.0')})"
    )


# ---------------------------------------------------------------------------
# fisher_exact_2x2 — Fisher's exact test (1935) of lang = zh vs
# source group (src0-9 vs src10-19), two-sided by probability ordering
# ---------------------------------------------------------------------------
# All tables with P(k) <= P(a_obs) (1e-7 slack) contribute; per-table
# probabilities are identical doubles via the shared Lanczos lnGamma,
# e12-floored before the exact sum.


def q_fisher_exact_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        (F.col("lang") == "zh").cast("long").alias("is_zh"),
        (
            F.regexp_replace("source", "src", "").cast("long") < 10
        ).cast("long").alias("g1"),
    )
    cell = d.groupBy().agg(
        F.sum(F.col("is_zh") * F.col("g1")).alias("a"),
        F.sum(F.col("is_zh") * (1 - F.col("g1"))).alias("b"),
        F.sum((1 - F.col("is_zh")) * F.col("g1")).alias("c"),
        F.sum((1 - F.col("is_zh")) * (1 - F.col("g1"))).alias("d"),
    )
    ks = spark.range(0, 600).select(F.col("id").cast("long").alias("k"))
    t = cell.crossJoin(ks)
    r1 = (F.col("a") + F.col("b")).cast("double")
    r2 = (F.col("c") + F.col("d")).cast("double")
    c1 = (F.col("a") + F.col("c")).cast("double")
    nn = r1 + r2
    kd = F.col("k").cast("double")
    valid = (kd <= F.least(r1, c1)) & (c1 - kd <= r2)
    lnp = (
        _lnchoose(r1, kd)
        + _lnchoose(r2, c1 - kd)
        - _lnchoose(nn, c1)
    )
    lnp_obs = (
        _lnchoose(r1, F.col("a").cast("double"))
        + _lnchoose(r2, c1 - F.col("a").cast("double"))
        - _lnchoose(nn, c1)
    )
    term = F.when(
        valid & (lnp <= lnp_obs + 1e-7), F.exp(lnp)
    ).otherwise(F.lit(0.0))
    t = t.withColumn(
        "term_e12", F.floor(term * 1e12 + F.lit(_OFF)).cast("long")
    )
    agg = t.groupBy("a", "b", "c", "d").agg(
        F.sum("term_e12").alias("p_e12")
    )
    return agg.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.floor(F.col("p_e12").cast("double") / 1000 + F.lit(_OFF))
        .cast("long")
        .alias("p_two_e9"),
    )


SQL_FISHER_EXACT = f"""
WITH d AS (
  SELECT CASE WHEN lang = 'zh' THEN 1 ELSE 0 END AS is_zh,
         CASE WHEN CAST(replace(source, 'src', '') AS BIGINT) < 10
              THEN 1 ELSE 0 END AS g1
  FROM documents
), cell AS (
  SELECT CAST(sum(is_zh * g1) AS BIGINT) AS a,
         CAST(sum(is_zh * (1 - g1)) AS BIGINT) AS b,
         CAST(sum((1 - is_zh) * g1) AS BIGINT) AS c,
         CAST(sum((1 - is_zh) * (1 - g1)) AS BIGINT) AS d
  FROM d
), t AS (
  SELECT cell.*, CAST(k AS DOUBLE) AS kd,
         CAST(a + b AS DOUBLE) AS r1,
         CAST(c + d AS DOUBLE) AS r2,
         CAST(a + c AS DOUBLE) AS c1,
         CAST(a + b + c + d AS DOUBLE) AS nn
  FROM cell, unnest(generate_series(0, 599)) AS g(k)
), valid AS (
  SELECT * FROM t
  WHERE kd <= least(r1, c1) AND c1 - kd <= r2
), lp AS (
  SELECT *,
         ({_lnchoose_sql('r1', 'kd')}
          + {_lnchoose_sql('r2', 'c1 - kd')}
          - {_lnchoose_sql('nn', 'c1')}) AS lnp,
         ({_lnchoose_sql('r1', 'CAST(a AS DOUBLE)')}
          + {_lnchoose_sql('r2', 'c1 - CAST(a AS DOUBLE)')}
          - {_lnchoose_sql('nn', 'c1')}) AS lnp_obs
  FROM valid
), terms AS (
  SELECT a, b, c, d,
         CAST(floor(CASE WHEN lnp <= lnp_obs + 1e-7
                         THEN exp(lnp) ELSE 0.0 END * 1e12 + {_OFF})
              AS BIGINT) AS term_e12
  FROM lp
)
SELECT a, b, c, d,
       CAST(floor(CAST(sum(term_e12) AS DOUBLE) / 1000 + {_OFF}) AS BIGINT)
         AS p_two_e9
FROM terms
GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# binomial_exact_test — exact two-sided binomial sign test on the
# daily purchase-vs-click comparison (Arbuthnott 1710, exact form)
# ---------------------------------------------------------------------------
# p = 2 * min(P(X <= k), P(X >= k)) under Binomial(n, 1/2); the
# cross-multiplied daily signs are exact, the binomial pmf terms come
# from the shared lnGamma and are e12-floored before summation.


def q_binomial_exact_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = ev.groupBy("day").agg(
        F.sum(F.when(F.col("event_type") == "purchase", F.col("v"))).alias(
            "sp"
        ),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np"),
        F.sum(F.when(F.col("event_type") == "click", F.col("v"))).alias("sc"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("nc"),
    ).filter((F.col("np") > 0) & (F.col("nc") > 0))
    lhs = F.col("sp") * F.col("nc")
    rhs = F.col("sc") * F.col("np")
    s = d.groupBy().agg(
        F.sum(F.when(lhs > rhs, 1).otherwise(0)).alias("k_plus"),
        F.sum(F.when(lhs != rhs, 1).otherwise(0)).alias("n"),
    )
    js = s.sparkSession.range(0, 64).select(
        F.col("id").cast("long").alias("j")
    )
    t = s.crossJoin(F.broadcast(js)).filter(F.col("j") <= F.col("n"))
    nd = F.col("n").cast("double")
    jd = F.col("j").cast("double")
    lnpmf = _lnchoose(nd, jd) - nd * F.log(F.lit(2.0))
    t = t.withColumn(
        "pmf_e12", F.floor(F.exp(lnpmf) * 1e12 + F.lit(_OFF)).cast("long")
    )
    agg = t.groupBy("k_plus", "n").agg(
        F.sum(
            F.when(F.col("j") <= F.col("k_plus"), F.col("pmf_e12")).otherwise(
                0
            )
        ).alias("p_le"),
        F.sum(
            F.when(F.col("j") >= F.col("k_plus"), F.col("pmf_e12")).otherwise(
                0
            )
        ).alias("p_ge"),
    )
    p2 = F.least(
        F.lit(1_000_000_000_000).cast("long"),
        2 * F.least(F.col("p_le"), F.col("p_ge")),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_informative"),
        F.col("k_plus").cast("long").alias("k_plus"),
        F.floor(p2.cast("double") / 1000 + F.lit(_OFF)).cast("long").alias(
            "p_two_e9"
        ),
    )


SQL_BINOM_EXACT = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
  WHERE event_type IN ('purchase', 'click')
), d AS (
  SELECT day,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN v END) AS BIGINT)
           AS sp,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS np,
         CAST(sum(CASE WHEN event_type = 'click' THEN v END) AS BIGINT)
           AS sc,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS nc
  FROM ev GROUP BY 1
  HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
     AND count(CASE WHEN event_type = 'click' THEN 1 END) > 0
), s AS (
  SELECT CAST(sum(CASE WHEN sp * nc > sc * np THEN 1 ELSE 0 END) AS BIGINT)
           AS k_plus,
         CAST(sum(CASE WHEN sp * nc <> sc * np THEN 1 ELSE 0 END) AS BIGINT)
           AS n
  FROM d
), t AS (
  SELECT s.*, CAST(j AS DOUBLE) AS jd, CAST(n AS DOUBLE) AS nd,
         CAST(j AS BIGINT) AS j
  FROM s, unnest(generate_series(0, 63)) AS g(j)
  WHERE j <= n
), pmf AS (
  SELECT *,
         CAST(floor(exp({_lnchoose_sql('nd', 'jd')} - nd * ln(2.0))
                    * 1e12 + {_OFF}) AS BIGINT) AS pmf_e12
  FROM t
), agg AS (
  SELECT k_plus, n,
         CAST(sum(CASE WHEN j <= k_plus THEN pmf_e12 ELSE 0 END)
              AS BIGINT) AS p_le,
         CAST(sum(CASE WHEN j >= k_plus THEN pmf_e12 ELSE 0 END)
              AS BIGINT) AS p_ge
  FROM pmf GROUP BY 1, 2
)
SELECT n AS n_informative,
       k_plus,
       CAST(floor(CAST(least(1000000000000,
                             2 * least(p_le, p_ge)) AS DOUBLE) / 1000
                  + {_OFF}) AS BIGINT) AS p_two_e9
FROM agg
"""


# ---------------------------------------------------------------------------
# term_enrichment_exact — hypergeometric upper-tail enrichment of the
# top-10 terms in English docs (the GSEA / over-representation
# primitive, Fisher 1935 one-sided)
# ---------------------------------------------------------------------------
# P(X >= a) = sum_{k=a}^{min(m, K)} C(K,k) C(N-K, m-k) / C(N, m); the
# per-term k-series is a bounded explode, terms e12-floored.


def q_term_enrichment_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = d.select(
        "doc_id",
        (F.col("lang") == "en").cast("long").alias("is_en"),
        F.explode(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias(
            "w"
        ),
    ).filter(F.length("w") > 0)
    tot = d.groupBy().agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum((F.col("lang") == "en").cast("long")).alias("kk"),
    )
    df = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("is_en").alias("a"),
    )
    wtop = Window.orderBy(F.col("m").desc(), F.col("w"))
    top = df.withColumn("rk", F.row_number().over(wtop)).filter(
        F.col("rk") <= 10
    )
    # k-grid ANCHORED at the observed count a (sf0.1 sweep): the old
    # absolute grid 0..599 broke as soon as a > 599 (bench-scale document
    # frequencies), leaving no valid term and engine-divergent empty-tail
    # handling.  The upper tail sums k = a .. a+599; the hypergeometric
    # pmf decays geometrically long before 600 steps at any corpus size,
    # and both engines truncate IDENTICALLY so parity is exact.
    ks = d.sparkSession.range(0, 600).select(
        F.col("id").cast("long").alias("j")
    )
    t = top.crossJoin(F.broadcast(tot)).crossJoin(ks).withColumn(
        "k", F.col("a") + F.col("j")
    )
    kd = F.col("k").cast("double")
    Kd = F.col("kk").cast("double")
    Nd = F.col("nn").cast("double")
    md = F.col("m").cast("double")
    valid = (kd <= F.least(md, Kd)) & (md - kd <= Nd - Kd)
    lnp = (
        _lnchoose(Kd, kd)
        + _lnchoose(Nd - Kd, md - kd)
        - _lnchoose(Nd, md)
    )
    term = F.when(valid, F.exp(lnp)).otherwise(F.lit(0.0))
    t = t.withColumn(
        "term_e12", F.floor(term * 1e12 + F.lit(_OFF)).cast("long")
    )
    agg = t.groupBy("w", "m", "a").agg(F.sum("term_e12").alias("p_e12"))
    return agg.select(
        "w",
        F.col("m").cast("long").alias("df_total"),
        F.col("a").cast("long").alias("df_en"),
        F.floor(F.col("p_e12").cast("double") / 1000 + F.lit(_OFF))
        .cast("long")
        .alias("p_upper_e9"),
    ).orderBy("w")


SQL_ENRICH = f"""
WITH words AS (
  SELECT DISTINCT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en, w
  FROM documents,
       unnest(string_split_regex(trim(text), '\\s+')) AS u(w)
  WHERE length(w) > 0
), tot AS (
  SELECT count(*) AS nn,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS kk
  FROM documents
), df AS (
  SELECT w, count(*) AS m, CAST(sum(is_en) AS BIGINT) AS a
  FROM words GROUP BY 1
), top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY m DESC, w) AS rk FROM df) s
  WHERE rk <= 10
), t AS (
  -- k-grid anchored at a, mirrors Spark (see query docstring)
  SELECT top.w, top.m, top.a,
         CAST(top.a + j AS DOUBLE) AS kd,
         CAST(kk AS DOUBLE) AS capk, CAST(nn AS DOUBLE) AS capn,
         CAST(m AS DOUBLE) AS dm
  FROM top CROSS JOIN tot, unnest(generate_series(0, 599)) AS g(j)
), valid AS (
  SELECT * FROM t
  WHERE kd <= least(dm, capk) AND dm - kd <= capn - capk
), terms AS (
  SELECT w, m, a,
         CAST(floor(exp({_lnchoose_sql('capk', 'kd')}
                        + {_lnchoose_sql('capn - capk', 'dm - kd')}
                        - {_lnchoose_sql('capn', 'dm')})
                    * 1e12 + {_OFF}) AS BIGINT)
           AS term_e12
  FROM valid
), psum AS (
  SELECT w, CAST(sum(term_e12) AS BIGINT) AS p_e12
  FROM terms GROUP BY 1
)
SELECT top.w,
       CAST(top.m AS BIGINT) AS df_total,
       top.a AS df_en,
       CAST(floor(CAST(coalesce(psum.p_e12, 0) AS DOUBLE) / 1000 + {_OFF})
            AS BIGINT) AS p_upper_e9
FROM top LEFT JOIN psum ON psum.w = top.w
ORDER BY top.w
"""


# ---------------------------------------------------------------------------
# tukey_hsd_q — Tukey-Kramer studentized-range statistics for all
# event-type pairs (Tukey 1953; Kramer 1956)
# ---------------------------------------------------------------------------
# q_ij = |mean_i - mean_j| / sqrt(MSE/2 (1/n_i + 1/n_j)) with the
# pooled one-way MSE from exact sums.


def q_tukey_hsd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    nd = F.col("n").cast("double")
    ssw = F.col("q").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ).cast("double") / nd
    g = g.withColumn("ssw", ssw)
    pooled = g.groupBy().agg(
        F.sum("ssw").alias("sse"),
        F.sum("n").alias("ntot"),
        F.count(F.lit(1)).alias("kk"),
    )
    a = g.select(
        F.col("event_type").alias("ta"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = g.select(
        F.col("event_type").alias("tb"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    pr = a.join(b, F.col("ta") < F.col("tb")).crossJoin(F.broadcast(pooled))
    mse = F.col("sse") / (F.col("ntot") - F.col("kk")).cast("double")
    diff = F.abs(
        F.col("sa").cast("double") / F.col("na").cast("double")
        - F.col("sb").cast("double") / F.col("nb").cast("double")
    )
    se = F.sqrt(
        mse
        / 2.0
        * (
            1.0 / F.col("na").cast("double")
            + 1.0 / F.col("nb").cast("double")
        )
    )
    return pr.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.floor(diff + F.lit(_OFF)).cast("long").alias("diff_centi"),
        F.floor(diff / se * 10_000 + F.lit(_OFF)).cast("long").alias(
            "q_e4"
        ),
    ).orderBy("type_a", "type_b")


SQL_HSD = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS q
  FROM ev GROUP BY 1
), w AS (
  SELECT *,
         CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n AS ssw
  FROM g
), pooled AS (
  SELECT sum(ssw) AS sse,
         CAST(sum(n) AS BIGINT) AS ntot,
         count(*) AS kk
  FROM w
)
SELECT a.event_type AS type_a,
       b.event_type AS type_b,
       CAST(a.n AS BIGINT) AS n_a,
       CAST(b.n AS BIGINT) AS n_b,
       CAST(floor(abs(CAST(a.s AS DOUBLE) / a.n
                      - CAST(b.s AS DOUBLE) / b.n) + {_OFF}) AS BIGINT)
         AS diff_centi,
       CAST(floor(abs(CAST(a.s AS DOUBLE) / a.n
                      - CAST(b.s AS DOUBLE) / b.n)
                  / sqrt(sse / (ntot - kk) / 2.0
                         * (1.0 / a.n + 1.0 / b.n)) * 10000 + {_OFF})
            AS BIGINT) AS q_e4
FROM w a JOIN w b ON a.event_type < b.event_type
CROSS JOIN pooled
ORDER BY type_a, type_b
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "fisher_exact_2x2": q_fisher_exact_2x2,
    "binomial_exact_test": q_binomial_exact_test,
    "term_enrichment_exact": q_term_enrichment_exact,
    "tukey_hsd_q": q_tukey_hsd_q,
}

ORACLE_SQL: dict[str, str] = {
    "fisher_exact_2x2": SQL_FISHER_EXACT,
    "binomial_exact_test": SQL_BINOM_EXACT,
    "term_enrichment_exact": SQL_ENRICH,
    "tukey_hsd_q": SQL_HSD,
}


# ---------------------------------------------------------------------------
# life_table — actuarial life table over user lifetimes (survival_km's
# classical presentation: qx, lx, and expectation of life ex)
# ---------------------------------------------------------------------------
# Lifetimes/censoring follow the survival_km construction; qx =
# d_x / n_x (exact), lx via the e12-floored ln cumsum (KM pattern),
# L_x = (l_x + l_{x+1})/2, e_x = T_x / l_x with T_x a reverse cumsum of
# e9-floored L terms.  Global windows bounded by distinct durations.


def q_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        .cast("long")
        .alias("day"),
    )
    u = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    horizon = u.agg(F.max("d1").alias("hmax"))
    t = u.crossJoin(F.broadcast(horizon)).select(
        (F.col("d1") - F.col("d0")).alias("dur"),
        (F.col("d1") <= F.col("hmax") - 7).cast("long").alias("observed"),
    )
    per = t.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("observed").alias("d"),
    )
    w_risk = Window.orderBy("dur").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_prior = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_rev = Window.orderBy("dur").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    per = per.withColumn("n_risk", F.sum("n_at").over(w_risk))
    qx = F.col("d").cast("double") / F.col("n_risk").cast("double")
    lnterm = F.when(
        F.col("d") < F.col("n_risk"), F.log(F.lit(1.0) - qx)
    ).otherwise(F.lit(0.0))
    per = per.withColumn(
        "ln_e12", F.floor(lnterm * 1e12 + F.lit(_OFF)).cast("long")
    )
    per = per.withColumn(
        "lx",
        F.exp(
            F.coalesce(F.sum("ln_e12").over(w_prior), F.lit(0)).cast(
                "double"
            )
            / 1e12
        ),
    )
    per = per.withColumn(
        "lnext",
        F.col("lx") * (F.lit(1.0) - qx),
    )
    per = per.withColumn(
        "bigl_e9",
        F.floor(
            (F.col("lx") + F.col("lnext")) / 2.0 * 1e9 + F.lit(_OFF)
        ).cast("long"),
    )
    per = per.withColumn("tx_e9", F.sum("bigl_e9").over(w_rev))
    ex = F.col("tx_e9").cast("double") / 1e9 / F.col("lx")
    return per.select(
        F.col("dur").cast("long").alias("dur"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("deaths"),
        F.floor(qx * 1_000_000 + F.lit(_OFF)).cast("long").alias("qx_e6"),
        F.floor(F.col("lx") * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "lx_e6"
        ),
        F.floor(ex * 10_000 + F.lit(_OFF)).cast("long").alias("ex_e4"),
    ).orderBy("dur")


SQL_LIFE_TABLE = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), u AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1
  FROM ev GROUP BY 1
), h AS (
  SELECT max(d1) AS hmax FROM u
), t AS (
  SELECT d1 - d0 AS dur,
         CASE WHEN d1 <= hmax - 7 THEN 1 ELSE 0 END AS observed
  FROM u CROSS JOIN h
), per AS (
  SELECT dur, count(*) AS n_at,
         CAST(sum(observed) AS BIGINT) AS d
  FROM t GROUP BY 1
), r AS (
  SELECT *,
         CAST(sum(n_at) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW AND
                              UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
  FROM per
), l AS (
  SELECT *,
         CAST(floor(CASE WHEN d < n_risk
                         THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                         ELSE 0.0 END * 1e12 + {_OFF}) AS BIGINT) AS ln_e12
  FROM r
), s AS (
  SELECT *,
         exp(CAST(COALESCE(sum(ln_e12) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS DOUBLE) / 1e12) AS lx
  FROM l
), bl AS (
  SELECT *,
         CAST(floor((lx + lx * (1.0 - CAST(d AS DOUBLE) / n_risk)) / 2.0
                    * 1e9 + {_OFF}) AS BIGINT) AS bigl_e9
  FROM s
), tx AS (
  SELECT *,
         CAST(sum(bigl_e9) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
               AND UNBOUNDED FOLLOWING) AS BIGINT) AS tx_e9
  FROM bl
)
SELECT CAST(dur AS BIGINT) AS dur,
       CAST(n_risk AS BIGINT) AS n_risk,
       d AS deaths,
       CAST(floor(CAST(d AS DOUBLE) / n_risk * 1000000 + {_OFF}) AS BIGINT)
         AS qx_e6,
       CAST(floor(lx * 1000000 + {_OFF}) AS BIGINT) AS lx_e6,
       CAST(floor(CAST(tx_e9 AS DOUBLE) / 1e9 / lx * 10000 + {_OFF})
            AS BIGINT) AS ex_e4
FROM tx
ORDER BY dur
"""


# ---------------------------------------------------------------------------
# chain_ladder — loss-development triangle + chain-ladder ultimates
# (Mack 1993 deterministic core) on weekly purchase cohorts
# ---------------------------------------------------------------------------
# Cohort i = first-activity week, development lag j = weeks since; the
# cumulative triangle is exact counts; development factors f_j =
# sum C_{i,j+1} / sum C_{i,j} over rows with both cells; ultimates
# chain the (at most 3) remaining factors — closed doubles.


def q_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        .cast("long")
        .alias("day"),
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    pur = ev.filter(F.col("event_type") == "purchase").join(first, "user_id")
    base = first.agg(F.min("d0").alias("day0"))
    t = pur.crossJoin(F.broadcast(base)).select(
        F.floor((F.col("d0") - F.col("day0")) / 7).cast("int").alias("cohort"),
        F.floor((F.col("day") - F.col("d0")) / 7).cast("int").alias("lag"),
    ).filter((F.col("cohort") <= 3) & (F.col("lag") <= 3))
    inc = t.groupBy("cohort", "lag").agg(F.count(F.lit(1)).alias("x"))
    wcum = Window.partitionBy("cohort").orderBy("lag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = inc.withColumn("c", F.sum("x").over(wcum))
    # observable cells: lag <= 3 - cohort (calendar cut)
    cum = cum.filter(F.col("lag") <= 3 - F.col("cohort"))
    a = cum.select(
        F.col("cohort").alias("ci"), F.col("lag").alias("lj"), F.col("c").alias("cj")
    )
    b = cum.select(
        F.col("cohort").alias("ci2"),
        F.col("lag").alias("lj2"),
        F.col("c").alias("cj2"),
    )
    fpairs = a.join(
        b,
        (F.col("ci") == F.col("ci2")) & (F.col("lj2") == F.col("lj") + 1),
    )
    f = fpairs.groupBy("lj").agg(
        F.sum("cj2").alias("num"), F.sum("cj").alias("den")
    ).withColumn(
        "f", F.col("num").cast("double") / F.col("den").cast("double")
    )
    fs = {r["lj"]: r["f"] for r in []}  # factors joined via crossJoin below
    fw = f.select(F.col("lj").alias("fl"), "f")
    latest = cum.withColumn(
        "is_latest", (F.col("lag") == 3 - F.col("cohort")).cast("int")
    ).filter(F.col("is_latest") == 1)
    # chain remaining factors lag..2 via up-to-3 broadcast joins
    f0 = fw.filter(F.col("fl") == 0).select(F.col("f").alias("f0"))
    f1 = fw.filter(F.col("fl") == 1).select(F.col("f").alias("f1"))
    f2 = fw.filter(F.col("fl") == 2).select(F.col("f").alias("f2"))
    j = (
        latest.crossJoin(F.broadcast(f0))
        .crossJoin(F.broadcast(f1))
        .crossJoin(F.broadcast(f2))
    )
    chain = (
        F.when(F.col("lag") <= 0, F.col("f0")).otherwise(F.lit(1.0))
        * F.when(F.col("lag") <= 1, F.col("f1")).otherwise(F.lit(1.0))
        * F.when(F.col("lag") <= 2, F.col("f2")).otherwise(F.lit(1.0))
    )
    ult = F.col("c").cast("double") * chain
    return j.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("lag").cast("long").alias("latest_lag"),
        F.col("c").cast("long").alias("latest_cum"),
        F.floor(ult * 10_000 + F.lit(_OFF)).cast("long").alias(
            "ultimate_e4"
        ),
    ).orderBy("cohort")


SQL_CHAIN_LADDER = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), first AS (
  SELECT user_id, min(day) AS d0 FROM ev GROUP BY 1
), base AS (
  SELECT min(d0) AS day0 FROM first
), t AS (
  SELECT CAST(floor((f.d0 - day0) / 7.0) AS INT) AS cohort,
         CAST(floor((e.day - f.d0) / 7.0) AS INT) AS lag
  FROM ev e
  JOIN first f ON f.user_id = e.user_id
  CROSS JOIN base
  WHERE e.event_type = 'purchase'
    AND floor((f.d0 - day0) / 7.0) <= 3
    AND floor((e.day - f.d0) / 7.0) <= 3
), inc AS (
  SELECT cohort, lag, count(*) AS x
  FROM t GROUP BY 1, 2
), cum0 AS (
  SELECT cohort, lag,
         CAST(sum(x) OVER (PARTITION BY cohort ORDER BY lag
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS c
  FROM inc
), cum AS (
  SELECT * FROM cum0 WHERE lag <= 3 - cohort
), f AS (
  SELECT a.lag AS fl,
         CAST(sum(b.c) AS DOUBLE) / sum(a.c) AS f
  FROM cum a JOIN cum b ON b.cohort = a.cohort AND b.lag = a.lag + 1
  GROUP BY 1
), latest AS (
  SELECT * FROM cum WHERE lag = 3 - cohort
), wide AS (
  SELECT latest.*,
         (SELECT f FROM f WHERE fl = 0) AS f0,
         (SELECT f FROM f WHERE fl = 1) AS f1,
         (SELECT f FROM f WHERE fl = 2) AS f2
  FROM latest
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST(lag AS BIGINT) AS latest_lag,
       CAST(c AS BIGINT) AS latest_cum,
       CAST(floor(CAST(c AS DOUBLE)
                  * (CASE WHEN lag <= 0 THEN f0 ELSE 1.0 END)
                  * (CASE WHEN lag <= 1 THEN f1 ELSE 1.0 END)
                  * (CASE WHEN lag <= 2 THEN f2 ELSE 1.0 END)
                  * 10000 + {_OFF}) AS BIGINT) AS ultimate_e4
FROM wide
ORDER BY cohort
"""


# ---------------------------------------------------------------------------
# buhlmann_credibility — Buhlmann (1967) credibility factors for
# per-user daily activity counts within each event_type
# ---------------------------------------------------------------------------
# EPV = mean within-user variance, VHM = variance of user means minus
# EPV/nbar (the classical estimators on balanced-ish panels); k =
# EPV/VHM, Z = nbar/(nbar + k).  All moments from exact integer sums.


def q_buhlmann_credibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    c = ev.groupBy("event_type", "user_id", "day").agg(
        F.count(F.lit(1)).alias("k")
    )
    peru = c.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
    ).filter(F.col("m") > 1)
    md = F.col("m").cast("double")
    uvar = (
        md * F.col("skk").cast("double")
        - F.col("sk").cast("double") * F.col("sk").cast("double")
    ) / (md * (md - 1))
    umean = F.col("sk").cast("double") / md
    peru = peru.withColumn(
        "uvar_e6", F.floor(uvar * 1_000_000 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "umean_e6", F.floor(umean * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    g = peru.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("r"),
        F.sum("m").alias("sm"),
        F.sum("uvar_e6").alias("s_uvar"),
        F.sum("umean_e6").alias("s_umean"),
        F.sum(F.col("umean_e6") * F.col("umean_e6")).alias("s_umean2"),
    )
    r = F.col("r").cast("double")
    nbar = F.col("sm").cast("double") / r
    epv = F.col("s_uvar").cast("double") / r / 1e6
    vom = (
        r * F.col("s_umean2").cast("double")
        - F.col("s_umean").cast("double") * F.col("s_umean").cast("double")
    ) / (r * (r - 1)) / 1e12
    vhm = F.greatest(F.lit(1e-9), vom - epv / nbar)
    k = epv / vhm
    z = nbar / (nbar + k)
    return g.select(
        "event_type",
        F.col("r").cast("long").alias("n_users"),
        F.floor(nbar * 10_000 + F.lit(_OFF)).cast("long").alias("nbar_e4"),
        F.floor(epv * 10_000 + F.lit(_OFF)).cast("long").alias("epv_e4"),
        F.floor(vhm * 10_000 + F.lit(_OFF)).cast("long").alias("vhm_e4"),
        F.floor(z * 1_000_000 + F.lit(_OFF)).cast("long").alias("z_e6"),
    ).orderBy("event_type")


SQL_BUHLMANN = f"""
WITH ev AS (
  SELECT event_type, user_id, CAST(ts AS DATE) AS day
  FROM events
), c AS (
  SELECT event_type, user_id, day, count(*) AS k
  FROM ev GROUP BY 1, 2, 3
), peru AS (
  SELECT event_type, user_id, count(*) AS m,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS skk
  FROM c GROUP BY 1, 2
  HAVING count(*) > 1
), fl AS (
  SELECT event_type, m,
         CAST(floor((CAST(m AS DOUBLE) * skk - CAST(sk AS DOUBLE) * sk)
                    / (CAST(m AS DOUBLE) * (m - 1)) * 1000000 + {_OFF})
              AS BIGINT) AS uvar_e6,
         CAST(floor(CAST(sk AS DOUBLE) / m * 1000000 + {_OFF}) AS BIGINT)
           AS umean_e6
  FROM peru
), g AS (
  SELECT event_type, count(*) AS r,
         CAST(sum(m) AS BIGINT) AS sm,
         CAST(sum(uvar_e6) AS BIGINT) AS s_uvar,
         CAST(sum(umean_e6) AS BIGINT) AS s_umean,
         CAST(sum(umean_e6 * umean_e6) AS BIGINT) AS s_umean2
  FROM fl GROUP BY 1
), f AS (
  SELECT event_type, r,
         CAST(sm AS DOUBLE) / r AS nbar,
         CAST(s_uvar AS DOUBLE) / r / 1e6 AS epv,
         greatest(1e-9,
           (CAST(r AS DOUBLE) * s_umean2
            - CAST(s_umean AS DOUBLE) * s_umean)
           / (CAST(r AS DOUBLE) * (r - 1)) / 1e12
           - CAST(s_uvar AS DOUBLE) / r / 1e6 / (CAST(sm AS DOUBLE) / r))
           AS vhm
  FROM g
)
SELECT event_type,
       CAST(r AS BIGINT) AS n_users,
       CAST(floor(nbar * 10000 + {_OFF}) AS BIGINT) AS nbar_e4,
       CAST(floor(epv * 10000 + {_OFF}) AS BIGINT) AS epv_e4,
       CAST(floor(vhm * 10000 + {_OFF}) AS BIGINT) AS vhm_e4,
       CAST(floor(nbar / (nbar + epv / vhm) * 1000000 + {_OFF}) AS BIGINT)
         AS z_e6
FROM f
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# gompertz_fit — Gompertz (1825) log-hazard line on the life-table
# discrete hazards
# ---------------------------------------------------------------------------
# ln(qx) is linear in duration under Gompertz mortality; the fit uses
# the same life-table construction, keeps durations with 0 < qx < 1,
# e6-floors ln(qx), and runs the exact-sum OLS.  Slope ln(c) > 0 means
# aging (rising hazard).


def q_gompertz_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        .cast("long")
        .alias("day"),
    )
    u = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    horizon = u.agg(F.max("d1").alias("hmax"))
    t = u.crossJoin(F.broadcast(horizon)).select(
        (F.col("d1") - F.col("d0")).alias("dur"),
        (F.col("d1") <= F.col("hmax") - 7).cast("long").alias("observed"),
    )
    per = t.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"), F.sum("observed").alias("d")
    )
    w_risk = Window.orderBy("dur").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    per = per.withColumn("n_risk", F.sum("n_at").over(w_risk))
    per = per.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
    lnq = F.log(F.col("d").cast("double") / F.col("n_risk").cast("double"))
    per = per.withColumn(
        "y", F.floor(lnq * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    g = per.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dur").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("dur") * F.col("dur")).alias("sxx"),
        F.sum(F.col("dur") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    b = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / nd
    return g.select(
        F.col("n").cast("long").alias("n_durations"),
        F.floor(b + F.lit(_OFF)).cast("long").alias("ln_c_e6"),
        F.floor(a + F.lit(_OFF)).cast("long").alias("ln_b_e6"),
    )


SQL_GOMPERTZ = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), u AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1
  FROM ev GROUP BY 1
), h AS (
  SELECT max(d1) AS hmax FROM u
), t AS (
  SELECT d1 - d0 AS dur,
         CASE WHEN d1 <= hmax - 7 THEN 1 ELSE 0 END AS observed
  FROM u CROSS JOIN h
), per AS (
  SELECT dur, count(*) AS n_at,
         CAST(sum(observed) AS BIGINT) AS d
  FROM t GROUP BY 1
), r AS (
  SELECT *,
         CAST(sum(n_at) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW AND
                              UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
  FROM per
), v AS (
  SELECT dur,
         CAST(floor(ln(CAST(d AS DOUBLE) / n_risk) * 1000000 + {_OFF})
              AS BIGINT) AS y
  FROM r WHERE d > 0 AND d < n_risk
), g AS (
  SELECT count(*) AS n,
         CAST(sum(dur) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(dur * dur) AS BIGINT) AS sxx,
         CAST(sum(dur * y) AS BIGINT) AS sxy
  FROM v
)
SELECT CAST(n AS BIGINT) AS n_durations,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  + {_OFF}) AS BIGINT) AS ln_c_e6,
       CAST(floor((CAST(sy AS DOUBLE)
                   - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * sx) / n + {_OFF}) AS BIGINT) AS ln_b_e6
FROM g
"""


QUERIES.update(
    {
        "life_table": q_life_table,
        "chain_ladder": q_chain_ladder,
        "buhlmann_credibility": q_buhlmann_credibility,
        "gompertz_fit": q_gompertz_fit,
    }
)

ORACLE_SQL.update(
    {
        "life_table": SQL_LIFE_TABLE,
        "chain_ladder": SQL_CHAIN_LADDER,
        "buhlmann_credibility": SQL_BUHLMANN,
        "gompertz_fit": SQL_GOMPERTZ,
    }
)


# ---------------------------------------------------------------------------
# wilks_tolerance — distribution-free two-sided tolerance interval
# (Wilks 1941): smallest symmetric trim r with >= 95% confidence of
# covering 90% of the population
# ---------------------------------------------------------------------------
# Confidence(r) = P(Beta-binomial coverage) = 1 - sum_{j=n-2r+1}^{n}
# C(n,j) g^j (1-g)^(n-j) with g = 0.9 — binomial terms via the shared
# Lanczos lnGamma, e12-floored; the interval endpoints are exact order
# statistics at the chosen r.


def q_wilks_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wn = Window.partitionBy("event_type")
    sizes = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    rs = ev.sparkSession.range(1, 11).select(
        F.col("id").cast("long").alias("r")
    )
    js = ev.sparkSession.range(0, 25).select(
        F.col("id").cast("long").alias("jj")
    )
    grid = sizes.crossJoin(F.broadcast(rs)).crossJoin(F.broadcast(js))
    # tail term index j = n - 2r + 1 + jj, valid while j <= n
    j = F.col("n") - 2 * F.col("r") + 1 + F.col("jj")
    nd = F.col("n").cast("double")
    jd = j.cast("double")
    G = 0.9
    import math

    lnpmf = (
        _lnchoose(nd, jd)
        + jd * math.log(G)
        + (nd - jd) * math.log(1 - G)
    )
    term = F.when((j >= 0) & (j <= F.col("n")), F.exp(lnpmf)).otherwise(
        F.lit(0.0)
    )
    grid = grid.withColumn(
        "term_e12", F.floor(term * 1e12 + F.lit(_OFF)).cast("long")
    )
    conf = grid.groupBy("event_type", "n", "r").agg(
        (F.lit(1_000_000_000_000) - F.sum("term_e12")).alias("conf_e12")
    )
    pick = conf.filter(F.col("conf_e12") >= 950_000_000_000).groupBy(
        "event_type", "n"
    ).agg(F.max("r").alias("r_star"), F.max_by(
        F.col("conf_e12"), -F.col("r")
    ).alias("conf_e12"))
    wq = Window.partitionBy("event_type").orderBy("v", "event_id")
    t = ev.withColumn("rk", F.row_number().over(wq)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    lo = t.join(
        pick.select("event_type", F.col("r_star")), "event_type"
    ).filter(F.col("rk") == F.col("r_star")).select(
        "event_type", F.col("v").alias("lower_c")
    )
    hi = t.join(
        pick.select("event_type", F.col("r_star").alias("r2")), "event_type"
    ).filter(F.col("rk") == F.col("nn") - F.col("r2") + 1).select(
        "event_type", F.col("v").alias("upper_c")
    )
    out = (
        pick.join(lo, "event_type")
        .join(hi, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("r_star").cast("long").alias("r_trim"),
            F.floor(F.col("conf_e12").cast("double") / 1e6 + F.lit(_OFF))
            .cast("long")
            .alias("conf_e6"),
            F.col("lower_c").cast("long").alias("lower_c"),
            F.col("upper_c").cast("long").alias("upper_c"),
        )
    )
    return out.orderBy("event_type")


SQL_WILKS = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), sizes AS (
  SELECT event_type, count(*) AS n FROM ev GROUP BY 1
), grid AS (
  SELECT event_type, n,
         CAST(r AS BIGINT) AS r, CAST(jj AS BIGINT) AS jj
  FROM sizes, unnest(generate_series(1, 10)) AS gr(r),
       unnest(generate_series(0, 24)) AS gj(jj)
), terms AS (
  SELECT event_type, n, r,
         CAST(floor(CASE WHEN n - 2 * r + 1 + jj >= 0
                          AND n - 2 * r + 1 + jj <= n
                         THEN exp({_lnchoose_sql(
                             'CAST(n AS DOUBLE)',
                             'CAST(n - 2 * r + 1 + jj AS DOUBLE)')}
                                  + (n - 2 * r + 1 + jj) * ln(0.9)
                                  + (n - (n - 2 * r + 1 + jj)) * ln(0.1))
                         ELSE 0.0 END * 1e12 + {_OFF}) AS BIGINT)
           AS term_e12
  FROM grid
), conf AS (
  SELECT event_type, n, r,
         1000000000000 - CAST(sum(term_e12) AS BIGINT) AS conf_e12
  FROM terms GROUP BY 1, 2, 3
), pick AS (
  SELECT event_type, n, max(r) AS r_star,
         max_by(conf_e12, -r) AS conf_e12
  FROM conf WHERE conf_e12 >= 950000000000
  GROUP BY 1, 2
), rk AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM ev
), lo AS (
  SELECT rk.event_type, v AS lower_c
  FROM rk JOIN pick ON pick.event_type = rk.event_type
  WHERE rk.rk = pick.r_star
), hi AS (
  SELECT rk.event_type, v AS upper_c
  FROM rk JOIN pick ON pick.event_type = rk.event_type
  WHERE rk.rk = rk.nn - pick.r_star + 1
)
SELECT pick.event_type,
       CAST(n AS BIGINT) AS n,
       r_star AS r_trim,
       CAST(floor(CAST(conf_e12 AS DOUBLE) / 1e6 + {_OFF}) AS BIGINT)
         AS conf_e6,
       CAST(lower_c AS BIGINT) AS lower_c,
       CAST(upper_c AS BIGINT) AS upper_c
FROM pick
JOIN lo ON lo.event_type = pick.event_type
JOIN hi ON hi.event_type = pick.event_type
ORDER BY pick.event_type
"""


# ---------------------------------------------------------------------------
# split_conformal_audit — split conformal prediction intervals with
# empirical coverage (Papadopoulos 2002; Vovk 2005; Lei 2018)
# ---------------------------------------------------------------------------
# Train (days 1-10): per-(type, hour) mean predictor from exact sums.
# Calibrate (days 11-20): nonconformity |v - pred| (exact ints), q =
# the ceil((n_cal + 1) * 0.9)-th order statistic.  Test (days 21-30):
# empirical coverage of pred +- q — the finite-sample 90% guarantee
# audited end-to-end.


def q_split_conformal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    train = ev.filter(F.col("dom") <= 10)
    calib = ev.filter((F.col("dom") > 10) & (F.col("dom") <= 20))
    test = ev.filter(F.col("dom") > 20)
    pred = train.groupBy("event_type", "hh").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("yhat")
    )
    cal = calib.join(F.broadcast(pred), ["event_type", "hh"]).withColumn(
        "score", F.abs(F.col("v") - F.col("yhat"))
    )
    wq = Window.partitionBy("event_type").orderBy("score", "event_id")
    wn = Window.partitionBy("event_type")
    cal = cal.withColumn("rk", F.row_number().over(wq)).withColumn(
        "nc", F.count(F.lit(1)).over(wn)
    )
    q = cal.filter(
        F.col("rk")
        == F.ceil((F.col("nc") + 1).cast("double") * 0.9).cast("int")
    ).select("event_type", F.col("score").alias("q"), F.col("nc"))
    tst = test.join(F.broadcast(pred), ["event_type", "hh"]).join(
        F.broadcast(q), "event_type"
    )
    cov = (F.abs(F.col("v") - F.col("yhat")) <= F.col("q")).cast("long")
    out = tst.groupBy("event_type").agg(
        F.max("nc").alias("n_cal"),
        F.max("q").alias("q_centi"),
        F.count(F.lit(1)).alias("n_test"),
        F.sum(cov).alias("n_covered"),
    )
    return out.select(
        "event_type",
        F.col("n_cal").cast("long").alias("n_cal"),
        F.col("q_centi").cast("long").alias("q_centi"),
        F.col("n_test").cast("long").alias("n_test"),
        F.col("n_covered").cast("long").alias("n_covered"),
        F.floor(
            F.col("n_covered").cast("double")
            / F.col("n_test").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("coverage_e6"),
    ).orderBy("event_type")


SQL_CONFORMAL = f"""
WITH ev AS (
  SELECT event_type, event_id,
         EXTRACT(day FROM ts) AS dom,
         EXTRACT(hour FROM ts) AS hh,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), pred AS (
  SELECT event_type, hh,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + {_OFF}) AS BIGINT)
           AS yhat
  FROM ev WHERE dom <= 10
  GROUP BY 1, 2
), cal AS (
  SELECT ev.event_type, ev.event_id,
         abs(v - yhat) AS score
  FROM ev JOIN pred ON pred.event_type = ev.event_type
                   AND pred.hh = ev.hh
  WHERE dom > 10 AND dom <= 20
), rk AS (
  SELECT event_type, score,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY score, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nc
  FROM cal
), q AS (
  SELECT event_type, score AS q, nc
  FROM rk WHERE rk = CAST(ceil((nc + 1) * 0.9) AS INT)
), tst AS (
  SELECT ev.event_type,
         CASE WHEN abs(v - yhat) <= q.q THEN 1 ELSE 0 END AS cov
  FROM ev
  JOIN pred ON pred.event_type = ev.event_type AND pred.hh = ev.hh
  JOIN q ON q.event_type = ev.event_type
  WHERE dom > 20
)
SELECT tst.event_type,
       CAST(max(q.nc) AS BIGINT) AS n_cal,
       CAST(max(q.q) AS BIGINT) AS q_centi,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(cov) AS BIGINT) AS n_covered,
       CAST(floor(CAST(sum(cov) AS DOUBLE) / count(*) * 1000000 + {_OFF})
            AS BIGINT) AS coverage_e6
FROM tst JOIN q ON q.event_type = tst.event_type
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# target_encoding_audit — leakage audit: naive vs leave-one-out target
# encoding (the Micci-Barreca 2001 encoder, LOO variant)
# ---------------------------------------------------------------------------
# Category = user_id, target = centi-value.  Naive encoding includes
# the row's own target (leaks); LOO removes it: (sum - v)/(n - 1).
# The audit reports the correlation of each encoding with the target —
# the naive-minus-LOO gap IS the leakage.  Encodings e4-floored before
# the exact correlation sums; users with n = 1 dropped (LOO undefined).


def q_target_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).filter(F.col("n") > 1)
    t = ev.join(g, "user_id")
    enc_n = F.floor(
        F.col("s").cast("double") / F.col("n").cast("double") * 100
        + F.lit(_OFF)
    ).cast("long")
    enc_l = F.floor(
        (F.col("s") - F.col("v")).cast("double")
        / (F.col("n") - 1).cast("double")
        * 100
        + F.lit(_OFF)
    ).cast("long")
    t = t.withColumn("en", enc_n).withColumn("el", enc_l)
    agg = t.groupBy().agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum("en").alias("sen"),
        F.sum(F.col("en") * F.col("en")).alias("senn"),
        F.sum(F.col("v") * F.col("en")).alias("sven"),
        F.sum("el").alias("sel"),
        F.sum(F.col("el") * F.col("el")).alias("sell"),
        F.sum(F.col("v") * F.col("el")).alias("svel"),
    )
    m = F.col("m").cast("double")

    def corr(sx, sxx, sxy):
        num = m * F.col(sxy).cast("double") - F.col(sx).cast(
            "double"
        ) * F.col("sv").cast("double")
        den = F.sqrt(
            (
                m * F.col(sxx).cast("double")
                - F.col(sx).cast("double") * F.col(sx).cast("double")
            )
            * (
                m * F.col("svv").cast("double")
                - F.col("sv").cast("double") * F.col("sv").cast("double")
            )
        )
        return num / den

    r_n = corr("sen", "senn", "sven")
    r_l = corr("sel", "sell", "svel")
    return agg.select(
        F.col("m").cast("long").alias("n_rows"),
        F.floor(r_n * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "r_naive_e6"
        ),
        F.floor(r_l * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "r_loo_e6"
        ),
        F.floor((r_n - r_l) * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "leakage_gap_e6"
        ),
    )


SQL_TARGET_ENC = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT user_id, count(*) AS n, CAST(sum(v) AS BIGINT) AS s
  FROM ev GROUP BY 1
  HAVING count(*) > 1
), t AS (
  SELECT ev.v,
         CAST(floor(CAST(s AS DOUBLE) / n * 100 + {_OFF}) AS BIGINT) AS en,
         CAST(floor(CAST(s - ev.v AS DOUBLE) / (n - 1) * 100 + {_OFF})
              AS BIGINT) AS el
  FROM ev JOIN g ON g.user_id = ev.user_id
), agg AS (
  SELECT count(*) AS m,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(en) AS BIGINT) AS sen,
         CAST(sum(en * en) AS BIGINT) AS senn,
         CAST(sum(v * en) AS BIGINT) AS sven,
         CAST(sum(el) AS BIGINT) AS sel,
         CAST(sum(el * el) AS BIGINT) AS sell,
         CAST(sum(v * el) AS BIGINT) AS svel
  FROM t
), f AS (
  SELECT m,
         (CAST(m AS DOUBLE) * sven - CAST(sen AS DOUBLE) * sv)
           / sqrt((CAST(m AS DOUBLE) * senn - CAST(sen AS DOUBLE) * sen)
                  * (CAST(m AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv))
           AS r_n,
         (CAST(m AS DOUBLE) * svel - CAST(sel AS DOUBLE) * sv)
           / sqrt((CAST(m AS DOUBLE) * sell - CAST(sel AS DOUBLE) * sel)
                  * (CAST(m AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv))
           AS r_l
  FROM agg
)
SELECT CAST(m AS BIGINT) AS n_rows,
       CAST(floor(r_n * 1000000 + {_OFF}) AS BIGINT) AS r_naive_e6,
       CAST(floor(r_l * 1000000 + {_OFF}) AS BIGINT) AS r_loo_e6,
       CAST(floor((r_n - r_l) * 1000000 + {_OFF}) AS BIGINT)
         AS leakage_gap_e6
FROM f
"""


# ---------------------------------------------------------------------------
# delong_auc_ci — AUC with the DeLong (1988) standard error for the
# value-predicts-weekend classifier
# ---------------------------------------------------------------------------
# Placement values via per-key cumulative value-domain counts (exact
# midrank machinery); V10 = placement of each positive among negatives
# (e6-floored), V01 symmetric; SE^2 = S10/(m(m-1) m?) — the standard
# var(V10)/m + var(V01)/n form, moments from exact sums.


def q_delong_auc_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("pos"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cells = ev.groupBy("event_type", "v").agg(
        F.sum(F.col("pos").cast("long")).alias("cp"),
        F.sum((1 - F.col("pos")).cast("long")).alias("cn"),
    )
    wv = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wt = Window.partitionBy("event_type")
    t = (
        cells.withColumn(
            "ln_", F.coalesce(F.sum("cn").over(wv), F.lit(0))
        )
        .withColumn(
            "lp_", F.coalesce(F.sum("cp").over(wv), F.lit(0))
        )
        .withColumn("tn", F.sum("cn").over(wt))
        .withColumn("tp", F.sum("cp").over(wt))
    )
    # doubled placement of a positive at value v among negatives:
    # 2*#less + #ties; per-cell aggregate carries cp copies
    v10x2 = 2 * F.col("ln_") + F.col("cn")
    v01x2 = 2 * (F.col("tp") - F.col("lp_") - F.col("cp")) + F.col("cp")
    t = t.withColumn(
        "p10_e6",
        F.floor(
            v10x2.cast("double")
            / (2.0 * F.col("tn").cast("double"))
            * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    ).withColumn(
        "p01_e6",
        F.floor(
            v01x2.cast("double")
            / (2.0 * F.col("tp").cast("double"))
            * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    agg = t.groupBy("event_type").agg(
        F.max("tp").alias("m"),
        F.max("tn").alias("n"),
        F.sum(F.col("cp") * F.col("p10_e6")).alias("s10"),
        F.sum(F.col("cp") * F.col("p10_e6") * F.col("p10_e6")).alias("s10q"),
        F.sum(F.col("cn") * F.col("p01_e6")).alias("s01"),
        F.sum(F.col("cn") * F.col("p01_e6") * F.col("p01_e6")).alias("s01q"),
    )
    m = F.col("m").cast("double")
    n = F.col("n").cast("double")
    auc = F.col("s10").cast("double") / m / 1e6
    v10var = (
        m * F.col("s10q").cast("double")
        - F.col("s10").cast("double") * F.col("s10").cast("double")
    ) / (m * (m - 1)) / 1e12
    v01var = (
        n * F.col("s01q").cast("double")
        - F.col("s01").cast("double") * F.col("s01").cast("double")
    ) / (n * (n - 1)) / 1e12
    se = F.sqrt(v10var / m + v01var / n)
    return agg.select(
        "event_type",
        F.col("m").cast("long").alias("n_pos"),
        F.col("n").cast("long").alias("n_neg"),
        F.floor(auc * 1_000_000 + F.lit(_OFF)).cast("long").alias("auc_e6"),
        F.floor(se * 1_000_000 + F.lit(_OFF)).cast("long").alias("se_e6"),
    ).orderBy("event_type")


SQL_DELONG = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS pos,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cells AS (
  SELECT event_type, v,
         CAST(sum(pos) AS BIGINT) AS cp,
         CAST(sum(1 - pos) AS BIGINT) AS cn
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT *,
         CAST(COALESCE(sum(cn) OVER w, 0) AS BIGINT) AS ln_,
         CAST(COALESCE(sum(cp) OVER w, 0) AS BIGINT) AS lp_,
         CAST(sum(cn) OVER (PARTITION BY event_type) AS BIGINT) AS tn,
         CAST(sum(cp) OVER (PARTITION BY event_type) AS BIGINT) AS tp
  FROM cells
  WINDOW w AS (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), pl AS (
  SELECT *,
         CAST(floor(CAST(2 * ln_ + cn AS DOUBLE) / (2.0 * tn) * 1000000
                    + {_OFF}) AS BIGINT) AS p10_e6,
         CAST(floor(CAST(2 * (tp - lp_ - cp) + cp AS DOUBLE) / (2.0 * tp)
                    * 1000000 + {_OFF}) AS BIGINT) AS p01_e6
  FROM cum
), agg AS (
  SELECT event_type, max(tp) AS m, max(tn) AS n,
         CAST(sum(cp * p10_e6) AS BIGINT) AS s10,
         CAST(sum(cp * p10_e6 * p10_e6) AS BIGINT) AS s10q,
         CAST(sum(cn * p01_e6) AS BIGINT) AS s01,
         CAST(sum(cn * p01_e6 * p01_e6) AS BIGINT) AS s01q
  FROM pl GROUP BY 1
)
SELECT event_type,
       CAST(m AS BIGINT) AS n_pos,
       CAST(n AS BIGINT) AS n_neg,
       CAST(floor(CAST(s10 AS DOUBLE) / m / 1e6 * 1000000 + {_OFF})
            AS BIGINT) AS auc_e6,
       CAST(floor(sqrt(
              ((CAST(m AS DOUBLE) * s10q - CAST(s10 AS DOUBLE) * s10)
               / (CAST(m AS DOUBLE) * (m - 1)) / 1e12) / m
              + ((CAST(n AS DOUBLE) * s01q - CAST(s01 AS DOUBLE) * s01)
                 / (CAST(n AS DOUBLE) * (n - 1)) / 1e12) / n)
            * 1000000 + {_OFF}) AS BIGINT) AS se_e6
FROM agg
ORDER BY event_type
"""


QUERIES.update(
    {
        "wilks_tolerance": q_wilks_tolerance,
        "split_conformal_audit": q_split_conformal_audit,
        "target_encoding_audit": q_target_encoding_audit,
        "delong_auc_ci": q_delong_auc_ci,
    }
)

ORACLE_SQL.update(
    {
        "wilks_tolerance": SQL_WILKS,
        "split_conformal_audit": SQL_CONFORMAL,
        "target_encoding_audit": SQL_TARGET_ENC,
        "delong_auc_ci": SQL_DELONG,
    }
)


# ---------------------------------------------------------------------------
# greedy_replay_regret — offline policy replay (Li et al. WSDM 2011):
# greedy argmax-of-running-mean vs uniform vs per-day oracle
# ---------------------------------------------------------------------------
# Daily per-type exact means (e6 ints); the greedy arm at day d is the
# argmax of the cumulative mean through d-1 (tie -> type name); all
# three value streams are exact integer sums of the picked day-means.


def q_greedy_replay_regret(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = ev.groupBy("day", "event_type").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    d = d.withColumn(
        "m_e6",
        F.floor(
            F.col("s").cast("double") / F.col("n").cast("double") * 10_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    wcum = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    d = d.withColumn("cs", F.sum("s").over(wcum)).withColumn(
        "cn", F.sum("n").over(wcum)
    )
    # greedy pick at day d: argmax cumulative mean (cross-multiplied
    # rational compare via row_number on the floored cum mean)
    d = d.withColumn(
        "cm_e6",
        F.when(
            F.col("cn").isNotNull() & (F.col("cn") > 0),
            F.floor(
                F.col("cs").cast("double") / F.col("cn").cast("double")
                * 10_000
                + F.lit(_OFF)
            ).cast("long"),
        ),
    )
    wpick = Window.partitionBy("day").orderBy(
        F.col("cm_e6").desc_nulls_last(), F.col("event_type")
    )
    worc = Window.partitionBy("day").orderBy(
        F.col("m_e6").desc(), F.col("event_type")
    )
    d = d.withColumn("rk_g", F.row_number().over(wpick)).withColumn(
        "rk_o", F.row_number().over(worc)
    )
    valid = d.filter(F.col("cm_e6").isNotNull())
    greedy = valid.filter(F.col("rk_g") == 1).select(
        "day", F.col("m_e6").alias("r_greedy")
    )
    oracle = d.filter(F.col("rk_o") == 1).select(
        "day", F.col("m_e6").alias("r_oracle")
    )
    uniform = d.groupBy("day").agg(
        F.floor(
            F.sum("m_e6").cast("double") / F.count(F.lit(1)).cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("r_uniform"),
        F.count(F.lit(1)).alias("k_arms"),
    )
    j = greedy.join(oracle, "day").join(uniform, "day")
    agg = j.groupBy().agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("r_greedy").alias("v_greedy"),
        F.sum("r_uniform").alias("v_uniform"),
        F.sum("r_oracle").alias("v_oracle"),
    )
    return agg.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("v_greedy").cast("long").alias("v_greedy_e6"),
        F.col("v_uniform").cast("long").alias("v_uniform_e6"),
        F.col("v_oracle").cast("long").alias("v_oracle_e6"),
        (F.col("v_oracle") - F.col("v_greedy")).cast("long").alias(
            "regret_e6"
        ),
    )


SQL_REPLAY = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), d AS (
  SELECT day, event_type,
         CAST(sum(v) AS BIGINT) AS s, count(*) AS n,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 10000 + {_OFF})
              AS BIGINT) AS m_e6
  FROM ev GROUP BY 1, 2
), c AS (
  SELECT *,
         CAST(sum(s) OVER w AS BIGINT) AS cs,
         CAST(sum(n) OVER w AS BIGINT) AS cn
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), cm AS (
  SELECT *,
         CASE WHEN cn IS NOT NULL AND cn > 0
              THEN CAST(floor(CAST(cs AS DOUBLE) / cn * 10000 + {_OFF})
                        AS BIGINT) END AS cm_e6
  FROM c
), rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY day
                            ORDER BY cm_e6 DESC NULLS LAST, event_type)
           AS rk_g,
         row_number() OVER (PARTITION BY day
                            ORDER BY m_e6 DESC, event_type) AS rk_o
  FROM cm
), greedy AS (
  SELECT day, m_e6 AS r_greedy FROM rk
  WHERE rk_g = 1 AND cm_e6 IS NOT NULL
), oracle AS (
  SELECT day, m_e6 AS r_oracle FROM rk WHERE rk_o = 1
), uni AS (
  SELECT day,
         CAST(floor(CAST(sum(m_e6) AS DOUBLE) / count(*) + {_OFF})
              AS BIGINT) AS r_uniform
  FROM d GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(r_greedy) AS BIGINT) AS v_greedy_e6,
       CAST(sum(r_uniform) AS BIGINT) AS v_uniform_e6,
       CAST(sum(r_oracle) AS BIGINT) AS v_oracle_e6,
       CAST(sum(r_oracle) - sum(r_greedy) AS BIGINT) AS regret_e6
FROM greedy
JOIN oracle USING (day)
JOIN uni USING (day)
"""


# ---------------------------------------------------------------------------
# qini_uplift — uplift-by-decile and Qini-style summary per event_type
# (Radcliffe 2007), treatment = weekend, response = above-median value
# ---------------------------------------------------------------------------
# Deciles are PER-TYPE rank windows (never a global sort); uplift_d =
# rt/nt - rc/nc per decile from exact counts.


def q_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        (F.dayofweek("ts").isin(1, 7)).cast("long").alias("tr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wm = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.withColumn("rk", F.row_number().over(wm)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(
        F.col("rk") == F.floor((F.col("n") + 1) / 2).cast("int")
    ).select("event_type", F.col("v").alias("med"))
    t = r.join(F.broadcast(med), "event_type").withColumn(
        "resp", (F.col("v") > F.col("med")).cast("long")
    ).withColumn(
        "dec",
        F.least(
            F.lit(9), F.floor((F.col("rk") - 1) * 10 / F.col("n")).cast("int")
        ),
    )
    cell = t.groupBy("event_type", "dec").agg(
        F.sum("tr").alias("nt"),
        F.sum(F.col("tr") * F.col("resp")).alias("rt"),
        F.sum(1 - F.col("tr")).alias("nc"),
        F.sum((1 - F.col("tr")) * F.col("resp")).alias("rc"),
    )
    up = (
        F.col("rt").cast("double") / F.col("nt").cast("double")
        - F.col("rc").cast("double") / F.col("nc").cast("double")
    )
    cell = cell.withColumn(
        "up_e6", F.floor(up * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    agg = cell.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k_dec"),
        F.sum(F.abs(F.col("up_e6"))).alias("sum_abs_uplift_e6"),
        F.max_by(F.col("dec"), F.struct(F.col("up_e6"), -F.col("dec"))).alias(
            "best_dec"
        ),
        F.max("up_e6").alias("max_uplift_e6"),
    )
    return agg.select(
        "event_type",
        F.col("k_dec").cast("long").alias("k_deciles"),
        F.col("sum_abs_uplift_e6").cast("long").alias("sum_abs_uplift_e6"),
        F.col("best_dec").cast("long").alias("best_decile"),
        F.col("max_uplift_e6").cast("long").alias("max_uplift_e6"),
    ).orderBy("event_type")


SQL_QINI = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS tr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY v, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
), med AS (
  SELECT event_type, v AS med FROM r
  WHERE rk = CAST(floor((n + 1) / 2) AS INT)
), t AS (
  SELECT r.event_type, r.tr,
         CASE WHEN r.v > med.med THEN 1 ELSE 0 END AS resp,
         least(9, CAST(floor((r.rk - 1) * 10.0 / r.n) AS INT)) AS dec
  FROM r JOIN med ON med.event_type = r.event_type
), cell AS (
  SELECT event_type, dec,
         CAST(sum(tr) AS BIGINT) AS nt,
         CAST(sum(tr * resp) AS BIGINT) AS rt,
         CAST(sum(1 - tr) AS BIGINT) AS nc,
         CAST(sum((1 - tr) * resp) AS BIGINT) AS rc
  FROM t GROUP BY 1, 2
), up AS (
  SELECT event_type, dec,
         CAST(floor((CAST(rt AS DOUBLE) / nt - CAST(rc AS DOUBLE) / nc)
                    * 1000000 + {_OFF}) AS BIGINT) AS up_e6
  FROM cell
), best AS (
  SELECT event_type, dec AS best_decile
  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY up_e6 DESC, dec) AS rk
        FROM up) s
  WHERE rk = 1
)
SELECT up.event_type,
       CAST(count(*) AS BIGINT) AS k_deciles,
       CAST(sum(abs(up_e6)) AS BIGINT) AS sum_abs_uplift_e6,
       CAST(max(best.best_decile) AS BIGINT) AS best_decile,
       CAST(max(up_e6) AS BIGINT) AS max_uplift_e6
FROM up JOIN best ON best.event_type = up.event_type
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# shapley_r2_lmg — LMG / Shapley decomposition of R^2 over the three
# calendar features hour, dow, minute (Lindeman-Merenda-Gold 1980;
# the Shapley value of the R^2 game)
# ---------------------------------------------------------------------------
# All seven subset R^2 values are closed forms on centered covariance
# entries (numerator-trick exact BIGINTs; 2x2 and cofactor 3x3
# inverses); phi_i = (1/3) R2(i) + (1/6) sum_j [R2(ij) - R2(j)]
# + (1/3) [R2(123) - R2(jk)].  phi sums to the full R^2 by
# construction — reported for audit.


def q_shapley_r2_lmg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.hour("ts").cast("long").alias("x1"),
        F.dayofweek("ts").cast("long").alias("x2"),
        F.minute("ts").cast("long").alias("x3"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("y"),
    )
    cols = ["x1", "x2", "x3", "y"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(c).alias(f"s_{c}"))
    for i in range(4):
        for j in range(i, 4):
            a, b = cols[i], cols[j]
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"p_{a}{b}"))
    g = ev.groupBy("event_type").agg(*aggs)
    n = F.col("n").cast("double")

    def cov(a, b):
        key = f"p_{a}{b}" if f"p_{a}{b}" in g.columns else f"p_{b}{a}"
        return n * F.col(key).cast("double") - F.col(f"s_{a}").cast(
            "double"
        ) * F.col(f"s_{b}").cast("double")

    c11, c12, c13 = cov("x1", "x1"), cov("x1", "x2"), cov("x1", "x3")
    c22, c23, c33 = cov("x2", "x2"), cov("x2", "x3"), cov("x3", "x3")
    b1, b2, b3 = cov("x1", "y"), cov("x2", "y"), cov("x3", "y")
    vy = cov("y", "y")

    def r2_1(cii, bi):
        return bi * bi / (cii * vy)

    def r2_2(cii, cjj, cij, bi, bj):
        det = cii * cjj - cij * cij
        return (cjj * bi * bi - 2 * cij * bi * bj + cii * bj * bj) / (
            det * vy
        )

    det3 = (
        c11 * (c22 * c33 - c23 * c23)
        - c12 * (c12 * c33 - c23 * c13)
        + c13 * (c12 * c23 - c22 * c13)
    )
    # C^{-1} c via cofactors
    i11 = c22 * c33 - c23 * c23
    i12 = -(c12 * c33 - c13 * c23)
    i13 = c12 * c23 - c13 * c22
    i22 = c11 * c33 - c13 * c13
    i23 = -(c11 * c23 - c12 * c13)
    i33 = c11 * c22 - c12 * c12
    quad = (
        b1 * (i11 * b1 + i12 * b2 + i13 * b3)
        + b2 * (i12 * b1 + i22 * b2 + i23 * b3)
        + b3 * (i13 * b1 + i23 * b2 + i33 * b3)
    )
    r2_123 = quad / (det3 * vy)
    r2a = r2_1(c11, b1)
    r2b = r2_1(c22, b2)
    r2c = r2_1(c33, b3)
    r2ab = r2_2(c11, c22, c12, b1, b2)
    r2ac = r2_2(c11, c33, c13, b1, b3)
    r2bc = r2_2(c22, c33, c23, b2, b3)
    phi1 = (
        r2a / 3.0
        + ((r2ab - r2b) + (r2ac - r2c)) / 6.0
        + (r2_123 - r2bc) / 3.0
    )
    phi2 = (
        r2b / 3.0
        + ((r2ab - r2a) + (r2bc - r2c)) / 6.0
        + (r2_123 - r2ac) / 3.0
    )
    phi3 = (
        r2c / 3.0
        + ((r2ac - r2a) + (r2bc - r2b)) / 6.0
        + (r2_123 - r2ab) / 3.0
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(r2_123 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "r2_full_e6"
        ),
        F.floor(phi1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "phi_hour_e6"
        ),
        F.floor(phi2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "phi_dow_e6"
        ),
        F.floor(phi3 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "phi_minute_e6"
        ),
    ).orderBy("event_type")


SQL_SHAPLEY = f"""
WITH ev AS (
  SELECT event_type,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x1,
         CAST(dayofweek(ts) + 1 AS BIGINT) AS x2,
         CAST(EXTRACT(minute FROM ts) AS BIGINT) AS x3,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS y
  FROM events
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x3) AS BIGINT) AS s3, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS p11,
         CAST(sum(x1 * x2) AS BIGINT) AS p12,
         CAST(sum(x1 * x3) AS BIGINT) AS p13,
         CAST(sum(x2 * x2) AS BIGINT) AS p22,
         CAST(sum(x2 * x3) AS BIGINT) AS p23,
         CAST(sum(x3 * x3) AS BIGINT) AS p33,
         CAST(sum(x1 * y) AS BIGINT) AS py1,
         CAST(sum(x2 * y) AS BIGINT) AS py2,
         CAST(sum(x3 * y) AS BIGINT) AS py3,
         CAST(sum(y * y) AS BIGINT) AS pyy
  FROM ev GROUP BY 1
), c AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) * p11 - CAST(s1 AS DOUBLE) * s1 AS c11,
         CAST(n AS DOUBLE) * p12 - CAST(s1 AS DOUBLE) * s2 AS c12,
         CAST(n AS DOUBLE) * p13 - CAST(s1 AS DOUBLE) * s3 AS c13,
         CAST(n AS DOUBLE) * p22 - CAST(s2 AS DOUBLE) * s2 AS c22,
         CAST(n AS DOUBLE) * p23 - CAST(s2 AS DOUBLE) * s3 AS c23,
         CAST(n AS DOUBLE) * p33 - CAST(s3 AS DOUBLE) * s3 AS c33,
         CAST(n AS DOUBLE) * py1 - CAST(s1 AS DOUBLE) * sy AS b1,
         CAST(n AS DOUBLE) * py2 - CAST(s2 AS DOUBLE) * sy AS b2,
         CAST(n AS DOUBLE) * py3 - CAST(s3 AS DOUBLE) * sy AS b3,
         CAST(n AS DOUBLE) * pyy - CAST(sy AS DOUBLE) * sy AS vy
  FROM g
), r AS (
  SELECT event_type, n,
         b1 * b1 / (c11 * vy) AS r2a,
         b2 * b2 / (c22 * vy) AS r2b,
         b3 * b3 / (c33 * vy) AS r2c,
         (c22 * b1 * b1 - 2 * c12 * b1 * b2 + c11 * b2 * b2)
           / ((c11 * c22 - c12 * c12) * vy) AS r2ab,
         (c33 * b1 * b1 - 2 * c13 * b1 * b3 + c11 * b3 * b3)
           / ((c11 * c33 - c13 * c13) * vy) AS r2ac,
         (c33 * b2 * b2 - 2 * c23 * b2 * b3 + c22 * b3 * b3)
           / ((c22 * c33 - c23 * c23) * vy) AS r2bc,
         (b1 * ((c22 * c33 - c23 * c23) * b1
                + (-(c12 * c33 - c13 * c23)) * b2
                + (c12 * c23 - c13 * c22) * b3)
          + b2 * ((-(c12 * c33 - c13 * c23)) * b1
                  + (c11 * c33 - c13 * c13) * b2
                  + (-(c11 * c23 - c12 * c13)) * b3)
          + b3 * ((c12 * c23 - c13 * c22) * b1
                  + (-(c11 * c23 - c12 * c13)) * b2
                  + (c11 * c22 - c12 * c12) * b3))
         / ((c11 * (c22 * c33 - c23 * c23)
             - c12 * (c12 * c33 - c23 * c13)
             + c13 * (c12 * c23 - c22 * c13)) * vy) AS r2f
  FROM c
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(r2f * 1000000 + {_OFF}) AS BIGINT) AS r2_full_e6,
       CAST(floor((r2a / 3.0 + ((r2ab - r2b) + (r2ac - r2c)) / 6.0
                   + (r2f - r2bc) / 3.0) * 1000000 + {_OFF}) AS BIGINT)
         AS phi_hour_e6,
       CAST(floor((r2b / 3.0 + ((r2ab - r2a) + (r2bc - r2c)) / 6.0
                   + (r2f - r2ac) / 3.0) * 1000000 + {_OFF}) AS BIGINT)
         AS phi_dow_e6,
       CAST(floor((r2c / 3.0 + ((r2ac - r2a) + (r2bc - r2b)) / 6.0
                   + (r2f - r2ab) / 3.0) * 1000000 + {_OFF}) AS BIGINT)
         AS phi_minute_e6
FROM r
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# weighted_kappa — quadratic-weighted Cohen's kappa (Cohen 1968)
# between each user's first and last diel bucket
# ---------------------------------------------------------------------------
# kappa_w = 1 - sum O_ij (i-j)^2 / sum E_ij (i-j)^2 with E from the
# margins; everything exact integers except the final ratio.


def q_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.hour("ts") / 6).cast("int").alias("b"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    t = ev.withColumn("rf", F.row_number().over(wo)).withColumn(
        "rl", F.row_number().over(wd)
    )
    first = t.filter(F.col("rf") == 1).select(
        "user_id", F.col("b").alias("bi")
    )
    last = t.filter(F.col("rl") == 1).select(
        "user_id", F.col("b").alias("bj")
    )
    pairs = first.join(last, "user_id")
    o = pairs.groupBy("bi", "bj").agg(F.count(F.lit(1)).alias("o"))
    ri = o.groupBy("bi").agg(F.sum("o").alias("ri"))
    cj = o.groupBy("bj").agg(F.sum("o").alias("cj"))
    nn = o.groupBy().agg(F.sum("o").alias("nn"))
    # observed weighted disagreement (exact BIGINT)
    od = o.select(
        (F.col("o") * (F.col("bi") - F.col("bj")) * (F.col("bi") - F.col("bj")))
        .alias("t")
    ).groupBy().agg(F.sum("t").alias("o_w"))
    # expected: sum_ij ri*cj*(i-j)^2 (exact BIGINT), scaled by 1/n
    grid = ri.crossJoin(cj)
    ed = grid.select(
        (F.col("ri") * F.col("cj") * (F.col("bi") - F.col("bj"))
         * (F.col("bi") - F.col("bj"))).alias("t")
    ).groupBy().agg(F.sum("t").alias("e_w"))
    j = od.crossJoin(F.broadcast(ed)).crossJoin(F.broadcast(nn))
    kappa = 1.0 - F.col("o_w").cast("double") * F.col("nn").cast(
        "double"
    ) / F.col("e_w").cast("double")
    return j.select(
        F.col("nn").cast("long").alias("n_users"),
        F.col("o_w").cast("long").alias("o_weighted"),
        F.col("e_w").cast("long").alias("e_weighted_xn"),
        F.floor(kappa * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "kappa_w_e6"
        ),
    )


SQL_WKAPPA = f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS b
  FROM events
), t AS (
  SELECT user_id, b,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rl
  FROM ev
), pairs AS (
  SELECT f.user_id, f.b AS bi, l.b AS bj
  FROM (SELECT user_id, b FROM t WHERE rf = 1) f
  JOIN (SELECT user_id, b FROM t WHERE rl = 1) l
    ON l.user_id = f.user_id
), o AS (
  SELECT bi, bj, count(*) AS o FROM pairs GROUP BY 1, 2
), ri AS (
  SELECT bi, CAST(sum(o) AS BIGINT) AS ri FROM o GROUP BY 1
), cj AS (
  SELECT bj, CAST(sum(o) AS BIGINT) AS cj FROM o GROUP BY 1
), nn AS (
  SELECT CAST(sum(o) AS BIGINT) AS nn FROM o
), od AS (
  SELECT CAST(sum(o * (bi - bj) * (bi - bj)) AS BIGINT) AS o_w FROM o
), ed AS (
  SELECT CAST(sum(ri * cj * (bi - bj) * (bi - bj)) AS BIGINT) AS e_w
  FROM ri CROSS JOIN cj
)
SELECT nn AS n_users,
       o_w AS o_weighted,
       e_w AS e_weighted_xn,
       CAST(floor((1.0 - CAST(o_w AS DOUBLE) * nn / e_w) * 1000000
                  + {_OFF}) AS BIGINT) AS kappa_w_e6
FROM od CROSS JOIN ed CROSS JOIN nn
"""


QUERIES.update(
    {
        "greedy_replay_regret": q_greedy_replay_regret,
        "qini_uplift": q_qini_uplift,
        "shapley_r2_lmg": q_shapley_r2_lmg,
        "weighted_kappa": q_weighted_kappa,
    }
)

ORACLE_SQL.update(
    {
        "greedy_replay_regret": SQL_REPLAY,
        "qini_uplift": SQL_QINI,
        "shapley_r2_lmg": SQL_SHAPLEY,
        "weighted_kappa": SQL_WKAPPA,
    }
)


# ---------------------------------------------------------------------------
# prequential_model_select — progressive-validation (Dawid 1984;
# Blum-Kalai-Langford 1999) MAE duel: global running mean vs
# hour-of-day running mean
# ---------------------------------------------------------------------------
# Both predictors use only STRICTLY PRIOR data (cumulative windows per
# key / per (key, hour)); absolute errors are floored per row and
# summed exactly.  The winner column makes the model selection audit
# explicit.


def q_prequential_model_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        "ts",
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wg = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wh = Window.partitionBy("event_type", "hh").orderBy(
        "ts", "event_id"
    ).rowsBetween(Window.unboundedPreceding, -1)
    t = (
        ev.withColumn("cs_g", F.sum("v").over(wg))
        .withColumn("cn_g", F.count(F.lit(1)).over(wg))
        .withColumn("cs_h", F.sum("v").over(wh))
        .withColumn("cn_h", F.count(F.lit(1)).over(wh))
        .filter((F.col("cn_g") > 0) & (F.col("cn_h") > 0))
    )
    pred_g = F.col("cs_g").cast("double") / F.col("cn_g").cast("double")
    pred_h = F.col("cs_h").cast("double") / F.col("cn_h").cast("double")
    t = t.withColumn(
        "e_g",
        F.floor(F.abs(F.col("v").cast("double") - pred_g) + F.lit(_OFF)).cast(
            "long"
        ),
    ).withColumn(
        "e_h",
        F.floor(F.abs(F.col("v").cast("double") - pred_h) + F.lit(_OFF)).cast(
            "long"
        ),
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("e_g").alias("s_eg"),
        F.sum("e_h").alias("s_eh"),
    )
    return agg.select(
        "event_type",
        F.col("n_scored").cast("long").alias("n_scored"),
        F.floor(
            F.col("s_eg").cast("double") / F.col("n_scored").cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mae_global_centi"),
        F.floor(
            F.col("s_eh").cast("double") / F.col("n_scored").cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mae_hourly_centi"),
        F.when(F.col("s_eh") < F.col("s_eg"), F.lit("hourly"))
        .when(F.col("s_eh") > F.col("s_eg"), F.lit("global"))
        .otherwise(F.lit("tie"))
        .alias("winner"),
    ).orderBy("event_type")


SQL_PREQUENTIAL = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         EXTRACT(hour FROM ts) AS hh,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT *,
         CAST(sum(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS cs_g,
         count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cn_g,
         CAST(sum(v) OVER (PARTITION BY event_type, hh
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS cs_h,
         count(*) OVER (PARTITION BY event_type, hh ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cn_h
  FROM ev
), e AS (
  SELECT event_type,
         CAST(floor(abs(CAST(v AS DOUBLE)
                        - CAST(cs_g AS DOUBLE) / cn_g) + {_OFF}) AS BIGINT)
           AS e_g,
         CAST(floor(abs(CAST(v AS DOUBLE)
                        - CAST(cs_h AS DOUBLE) / cn_h) + {_OFF}) AS BIGINT)
           AS e_h
  FROM t WHERE cn_g > 0 AND cn_h > 0
), agg AS (
  SELECT event_type, count(*) AS n_scored,
         CAST(sum(e_g) AS BIGINT) AS s_eg,
         CAST(sum(e_h) AS BIGINT) AS s_eh
  FROM e GROUP BY 1
)
SELECT event_type,
       CAST(n_scored AS BIGINT) AS n_scored,
       CAST(floor(CAST(s_eg AS DOUBLE) / n_scored + {_OFF}) AS BIGINT)
         AS mae_global_centi,
       CAST(floor(CAST(s_eh AS DOUBLE) / n_scored + {_OFF}) AS BIGINT)
         AS mae_hourly_centi,
       CASE WHEN s_eh < s_eg THEN 'hourly'
            WHEN s_eh > s_eg THEN 'global'
            ELSE 'tie' END AS winner
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# srm_check — sample-ratio-mismatch guardrail (the experimentation
# platform pre-check; Fabijan et al. 2019): weekend-hour share vs the
# calendar expectation, chi-square with 1 df per event_type
# ---------------------------------------------------------------------------
# Expected weekend share = weekend hours / total hours in the window
# (exact calendar integers — Jan 2024 has 8 weekend days); chi2 from
# exact counts.


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.dayofweek("ts").isin(1, 7)).cast("long").alias("wk"),
        F.to_date("ts").alias("day"),
    )
    cal = ev.select("day").distinct().select(
        F.sum(
            (F.dayofweek("day").isin(1, 7)).cast("long")
        ).alias("wk_days"),
        F.count(F.lit(1)).alias("n_days"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("wk").alias("n_wk"),
    )
    j = g.crossJoin(F.broadcast(cal))
    p0 = F.col("wk_days").cast("double") / F.col("n_days").cast("double")
    exp_wk = F.col("n").cast("double") * p0
    exp_wd = F.col("n").cast("double") * (1 - p0)
    obs_wd = (F.col("n") - F.col("n_wk")).cast("double")
    chi2 = (
        F.pow(F.col("n_wk").cast("double") - exp_wk, 2) / exp_wk
        + F.pow(obs_wd - exp_wd, 2) / exp_wd
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("n_wk").cast("long").alias("n_weekend"),
        F.floor(exp_wk * 10_000 + F.lit(_OFF)).cast("long").alias(
            "expected_weekend_e4"
        ),
        F.floor(chi2 * 10_000 + F.lit(_OFF)).cast("long").alias("chi2_e4"),
        (chi2 > 3.841).cast("long").alias("srm_flag"),
    ).orderBy("event_type")


SQL_SRM = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk,
         CAST(ts AS DATE) AS day
  FROM events
), cal AS (
  SELECT CAST(sum(CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END)
              AS BIGINT) AS wk_days,
         count(*) AS n_days
  FROM (SELECT DISTINCT day FROM ev)
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(wk) AS BIGINT) AS n_wk
  FROM ev GROUP BY 1
), f AS (
  SELECT event_type, n, n_wk,
         CAST(n AS DOUBLE) * wk_days / n_days AS exp_wk,
         CAST(n AS DOUBLE) * (1.0 - CAST(wk_days AS DOUBLE) / n_days)
           AS exp_wd
  FROM g CROSS JOIN cal
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       n_wk AS n_weekend,
       CAST(floor(exp_wk * 10000 + {_OFF}) AS BIGINT)
         AS expected_weekend_e4,
       CAST(floor(((n_wk - exp_wk) ^ 2 / exp_wk
                   + ((n - n_wk) - exp_wd) ^ 2 / exp_wd) * 10000 + {_OFF})
            AS BIGINT) AS chi2_e4,
       CAST(CASE WHEN ((n_wk - exp_wk) ^ 2 / exp_wk
                       + ((n - n_wk) - exp_wd) ^ 2 / exp_wd) > 3.841
                 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM f
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# hausman_test — Hausman (1978) specification test: pooled OLS vs
# within (fixed-effects) slope of value on hour over user panels
# ---------------------------------------------------------------------------
# Within slope = sum_u (Sxy_u - Sx_u Sy_u / n_u) / sum_u (Sxx_u -
# Sx_u^2 / n_u) — per-user numerators e4-floored before exact sums;
# the pooled slope and both sampling variances come from the same
# moment machinery; H = (b_fe - b_ols)^2 / (V_fe - V_ols).


def q_hausman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.hour("ts").cast("long").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("y"),
    )
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).filter(F.col("m") > 1)
    md = F.col("m").cast("double")
    wxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / md
    wxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / md
    wyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double") / md
    u = (
        u.withColumn("wxy_e4", F.floor(wxy * 100 + F.lit(_OFF)).cast("long"))
        .withColumn("wxx_e4", F.floor(wxx * 100 + F.lit(_OFF)).cast("long"))
        .withColumn("wyy_e4", F.floor(wyy * 100 + F.lit(_OFF)).cast("long"))
    )
    agg = u.groupBy().agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("m").alias("nt"),
        F.sum("wxy_e4").alias("swxy"),
        F.sum("wxx_e4").alias("swxx"),
        F.sum("wyy_e4").alias("swyy"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
        F.sum("syy").alias("tsyy"),
    )
    ntd = F.col("nt").cast("double")
    b_fe = F.col("swxy").cast("double") / F.col("swxx").cast("double")
    pxx = F.col("tsxx").cast("double") - F.col("tsx").cast("double") * F.col(
        "tsx"
    ).cast("double") / ntd
    pxy = F.col("tsxy").cast("double") - F.col("tsx").cast("double") * F.col(
        "tsy"
    ).cast("double") / ntd
    pyy = F.col("tsyy").cast("double") - F.col("tsy").cast("double") * F.col(
        "tsy"
    ).cast("double") / ntd
    b_ols = pxy / pxx
    k_users = F.col("n_users").cast("double")
    sse_fe = (
        F.col("swyy").cast("double")
        - b_fe * F.col("swxy").cast("double")
    ) / 100.0
    v_fe = sse_fe / (ntd - k_users - 1) / (
        F.col("swxx").cast("double") / 100.0
    )
    sse_ols = pyy - b_ols * pxy
    v_ols = sse_ols / (ntd - 2) / pxx
    h = F.pow(b_fe - b_ols, 2) / F.abs(v_fe - v_ols)
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("nt").cast("long").alias("n_obs"),
        F.floor(b_fe * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "b_within_e6"
        ),
        F.floor(b_ols * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "b_pooled_e6"
        ),
        F.floor(h * 10_000 + F.lit(_OFF)).cast("long").alias("h_e4"),
    )


SQL_HAUSMAN = f"""
WITH ev AS (
  SELECT user_id,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS y
  FROM events
), u AS (
  SELECT user_id, count(*) AS m,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM ev GROUP BY 1
  HAVING count(*) > 1
), fl AS (
  SELECT m, sx, sy, sxx, sxy, syy,
         CAST(floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / m)
                    * 100 + {_OFF}) AS BIGINT) AS wxy_e4,
         CAST(floor((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / m)
                    * 100 + {_OFF}) AS BIGINT) AS wxx_e4,
         CAST(floor((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / m)
                    * 100 + {_OFF}) AS BIGINT) AS wyy_e4
  FROM u
), agg AS (
  SELECT count(*) AS n_users,
         CAST(sum(m) AS BIGINT) AS nt,
         CAST(sum(wxy_e4) AS BIGINT) AS swxy,
         CAST(sum(wxx_e4) AS BIGINT) AS swxx,
         CAST(sum(wyy_e4) AS BIGINT) AS swyy,
         CAST(sum(sx) AS BIGINT) AS tsx,
         CAST(sum(sy) AS BIGINT) AS tsy,
         CAST(sum(sxx) AS BIGINT) AS tsxx,
         CAST(sum(sxy) AS BIGINT) AS tsxy,
         CAST(sum(syy) AS BIGINT) AS tsyy
  FROM fl
), f AS (
  SELECT n_users, nt,
         CAST(swxy AS DOUBLE) / swxx AS b_fe,
         (CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) * tsy / nt)
           / (CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE) * tsx / nt)
           AS b_ols,
         (CAST(swyy AS DOUBLE)
          - CAST(swxy AS DOUBLE) / swxx * swxy) / 100.0
           / (nt - n_users - 1)
           / (CAST(swxx AS DOUBLE) / 100.0) AS v_fe,
         ((CAST(tsyy AS DOUBLE) - CAST(tsy AS DOUBLE) * tsy / nt)
          - (CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) * tsy / nt)
            * ((CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) * tsy / nt)
               / (CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE) * tsx / nt)))
           / (nt - 2)
           / (CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE) * tsx / nt)
           AS v_ols
  FROM agg
)
SELECT CAST(n_users AS BIGINT) AS n_users,
       nt AS n_obs,
       CAST(floor(b_fe * 1000000 + {_OFF}) AS BIGINT) AS b_within_e6,
       CAST(floor(b_ols * 1000000 + {_OFF}) AS BIGINT) AS b_pooled_e6,
       CAST(floor((b_fe - b_ols) ^ 2 / abs(v_fe - v_ols) * 10000 + {_OFF})
            AS BIGINT) AS h_e4
FROM f
"""


# ---------------------------------------------------------------------------
# mincer_zarnowitz — forecast rationality regression (Mincer &
# Zarnowitz 1969): actual on forecast, H0: intercept 0, slope 1
# ---------------------------------------------------------------------------
# Forecast = per-(type, hour) mean from days 1-15; evaluation on days
# 16-30; OLS from exact sums with t statistics for a = 0 and b = 1.


def q_mincer_zarnowitz(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    train = ev.filter(F.col("dom") <= 15)
    test = ev.filter(F.col("dom") > 15)
    fc = train.groupBy("event_type", "hh").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("f")
    )
    t = test.join(F.broadcast(fc), ["event_type", "hh"])
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("f").alias("sx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("f") * F.col("f")).alias("sxx"),
        F.sum(F.col("f") * F.col("v")).alias("sxy"),
        F.sum(F.col("v") * F.col("v")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxx_c = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / nd
    sxy_c = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    syy_c = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    b = sxy_c / sxx_c
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / nd
    sse = syy_c - b * sxy_c
    s2 = sse / (nd - 2)
    se_b = F.sqrt(s2 / sxx_c)
    se_a = F.sqrt(
        s2 * (1.0 / nd + (F.col("sx").cast("double") / nd)
              * (F.col("sx").cast("double") / nd) / sxx_c)
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(a + F.lit(_OFF)).cast("long").alias("a_centi"),
        F.floor(b * 1_000_000 + F.lit(_OFF)).cast("long").alias("b_e6"),
        F.floor(a / se_a * 10_000 + F.lit(_OFF)).cast("long").alias(
            "t_a0_e4"
        ),
        F.floor((b - 1.0) / se_b * 10_000 + F.lit(_OFF)).cast("long").alias(
            "t_b1_e4"
        ),
    ).orderBy("event_type")


SQL_MZ = f"""
WITH ev AS (
  SELECT event_type,
         EXTRACT(day FROM ts) AS dom,
         EXTRACT(hour FROM ts) AS hh,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), fc AS (
  SELECT event_type, hh,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + {_OFF}) AS BIGINT)
           AS f
  FROM ev WHERE dom <= 15
  GROUP BY 1, 2
), t AS (
  SELECT ev.event_type, f, v
  FROM ev JOIN fc ON fc.event_type = ev.event_type AND fc.hh = ev.hh
  WHERE dom > 15
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(f) AS BIGINT) AS sx,
         CAST(sum(v) AS BIGINT) AS sy,
         CAST(sum(f * f) AS BIGINT) AS sxx,
         CAST(sum(f * v) AS BIGINT) AS sxy,
         CAST(sum(v * v) AS BIGINT) AS syy
  FROM t GROUP BY 1
), c AS (
  SELECT event_type, n,
         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS sxx_c,
         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS sxy_c,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS syy_c,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM g
), f2 AS (
  SELECT event_type, n, sxx_c,
         sxy_c / sxx_c AS b,
         (syd - sxy_c / sxx_c * sxd) / n AS a,
         (syy_c - sxy_c / sxx_c * sxy_c) / (n - 2) AS s2,
         sxd / n AS xbar
  FROM c
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(a + {_OFF}) AS BIGINT) AS a_centi,
       CAST(floor(b * 1000000 + {_OFF}) AS BIGINT) AS b_e6,
       CAST(floor(a / sqrt(s2 * (1.0 / n + xbar * xbar / sxx_c)) * 10000
                  + {_OFF}) AS BIGINT) AS t_a0_e4,
       CAST(floor((b - 1.0) / sqrt(s2 / sxx_c) * 10000 + {_OFF}) AS BIGINT)
         AS t_b1_e4
FROM f2
ORDER BY event_type
"""


QUERIES.update(
    {
        "prequential_model_select": q_prequential_model_select,
        "srm_check": q_srm_check,
        "hausman_test": q_hausman_test,
        "mincer_zarnowitz": q_mincer_zarnowitz,
    }
)

ORACLE_SQL.update(
    {
        "prequential_model_select": SQL_PREQUENTIAL,
        "srm_check": SQL_SRM,
        "hausman_test": SQL_HAUSMAN,
        "mincer_zarnowitz": SQL_MZ,
    }
)
