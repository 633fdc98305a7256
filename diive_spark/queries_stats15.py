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
    ks = d.sparkSession.range(0, 600).select(
        F.col("id").cast("long").alias("k")
    )
    t = top.crossJoin(F.broadcast(tot)).crossJoin(ks)
    kd = F.col("k").cast("double")
    Kd = F.col("kk").cast("double")
    Nd = F.col("nn").cast("double")
    md = F.col("m").cast("double")
    valid = (
        (F.col("k") >= F.col("a"))
        & (kd <= F.least(md, Kd))
        & (md - kd <= Nd - Kd)
    )
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
  SELECT top.w, top.m, top.a,
         CAST(k AS DOUBLE) AS kd, CAST(k AS BIGINT) AS k,
         CAST(kk AS DOUBLE) AS capk, CAST(nn AS DOUBLE) AS capn,
         CAST(m AS DOUBLE) AS dm
  FROM top CROSS JOIN tot, unnest(generate_series(0, 599)) AS g(k)
), valid AS (
  SELECT * FROM t
  WHERE k >= a AND kd <= least(dm, capk) AND dm - kd <= capn - capk
), terms AS (
  SELECT w, m, a,
         CAST(floor(exp({_lnchoose_sql('capk', 'kd')}
                        + {_lnchoose_sql('capn - capk', 'dm - kd')}
                        - {_lnchoose_sql('capn', 'dm')})
                    * 1e12 + {_OFF}) AS BIGINT)
           AS term_e12
  FROM valid
)
SELECT w,
       CAST(m AS BIGINT) AS df_total,
       a AS df_en,
       CAST(floor(CAST(sum(term_e12) AS DOUBLE) / 1000 + {_OFF}) AS BIGINT)
         AS p_upper_e9
FROM terms
GROUP BY 1, 2, 3
ORDER BY w
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
