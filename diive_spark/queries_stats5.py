"""Round-4j query registry: paired-labeler marginal homogeneity, extreme
value diagnostics, ecological scaling, and robust variance homogeneity —
McNemar's test over the kappa labeler pair, the mean-excess function on
doc lengths, Taylor's power law on weekly count fluctuations, and the
Brown-Forsythe robust Levene test per user.

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)``, derived
doubles floor-scaled with the house 1/pi offset; ln-based regression
statistics ride ``regr_slope`` over PRE-QUANTIZED exact-integer points
(the zipf_slope precedent) with e4 half-up scaling.

Reference parity notes: the reference stops at single-flag ladders; the
labeler-agreement pair (cohens_kappa + mcnemar_labelers), EVT threshold
diagnostics (mean_excess, complementing gumbel_maxima and
hill_tail_index), fluctuation scaling (Taylor 1961), and the robust
variance-homogeneity screen (Brown & Forsythe JASA 1974, the
median-centered Levene) are the multi-sensor deployment layer, public
literature cited per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF, _documents

# ---------------------------------------------------------------------------
# mcnemar_labelers — McNemar's test on the two kappa labelers per lang
# ---------------------------------------------------------------------------
# Same two in-engine binary labelers as cohens_kappa (doc length / TTR
# above the exact per-language lower medians): kappa measures agreement,
# McNemar (1947) tests MARGINAL HOMOGENEITY — do the two labelers fire
# at the same rate?  Continuity-corrected chi2 = (|b - c| - 1)^2 /
# (b + c) over the discordant cells only; every input is an exact
# integer, the statistic one exact-rational expression.


def _kappa_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wlen = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wttr = Window.partitionBy("lang").orderBy("ttr_e6", "doc_id")
    wn = Window.partitionBy("lang")
    r = (
        d.withColumn("r_len", F.row_number().over(wlen))
        .withColumn("r_ttr", F.row_number().over(wttr))
        .withColumn("nn", F.count(F.lit(1)).over(wn))
    )
    med_len = r.filter(
        F.col("r_len") == F.floor((F.col("nn") - 1) / 2) + 1
    ).select("lang", F.col("n_chars").alias("med_len"))
    med_ttr = r.filter(
        F.col("r_ttr") == F.floor((F.col("nn") - 1) / 2) + 1
    ).select("lang", F.col("ttr_e6").alias("med_ttr"))
    return (
        d.join(F.broadcast(med_len), "lang")
        .join(F.broadcast(med_ttr), "lang")
        .withColumn("a", (F.col("n_chars") > F.col("med_len")).cast("long"))
        .withColumn("b", (F.col("ttr_e6") > F.col("med_ttr")).cast("long"))
    )


def q_mcnemar_labelers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _kappa_labels(spark, sf_dir)
    agg = lab.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 0)).cast("long")).alias(
            "n10"
        ),
        F.sum(((F.col("a") == 0) & (F.col("b") == 1)).cast("long")).alias(
            "n01"
        ),
    )
    disc = F.col("n10") + F.col("n01")
    diff = F.abs(F.col("n10") - F.col("n01")) - 1
    chi2 = (diff * diff).cast("double") / disc.cast("double")
    return agg.filter(disc > 0).select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n01").cast("long").alias("n01"),
        F.floor(chi2 * 10_000 + F.lit(_OFF)).cast("long").alias("chi2_e4"),
    ).orderBy("lang")


# The labeler CTE chain is shared verbatim with SQL_COHENS_KAPPA
# (queries_stats4.py) — same medians, same scaled TTR.
_SQL_LABELS = f"""
WITH d AS (
  SELECT lang, doc_id, n_chars,
         CAST(floor(CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                         AS DOUBLE)
                    / len(regexp_split_to_array(trim(text), '\\s+'))
                    * 1000000 + {_OFF}) AS BIGINT) AS ttr_e6
  FROM documents
), r AS (
  SELECT lang, doc_id, n_chars, ttr_e6,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS r_len,
         row_number() OVER (PARTITION BY lang ORDER BY ttr_e6, doc_id) AS r_ttr,
         count(*) OVER (PARTITION BY lang) AS nn
  FROM d
), med_len AS (
  SELECT lang, n_chars AS med_len FROM r WHERE r_len = (nn - 1) // 2 + 1
), med_ttr AS (
  SELECT lang, ttr_e6 AS med_ttr FROM r WHERE r_ttr = (nn - 1) // 2 + 1
), lab AS (
  SELECT d.lang,
         CASE WHEN d.n_chars > med_len.med_len THEN 1 ELSE 0 END AS a,
         CASE WHEN d.ttr_e6 > med_ttr.med_ttr THEN 1 ELSE 0 END AS b
  FROM d
  JOIN med_len ON med_len.lang = d.lang
  JOIN med_ttr ON med_ttr.lang = d.lang
)
"""

SQL_MCNEMAR = (
    _SQL_LABELS
    + f""", agg AS (
  SELECT lang, count(*) AS n,
         CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n10,
         CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n01
  FROM lab GROUP BY 1
)
SELECT lang, CAST(n AS BIGINT) AS n, n10, n01,
       CAST(floor(CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1)
                       AS DOUBLE)
                  / (n10 + n01) * 10000 + {_OFF}) AS BIGINT) AS chi2_e4
FROM agg
WHERE n10 + n01 > 0
ORDER BY lang
"""
)


# ---------------------------------------------------------------------------
# mean_excess — EVT mean-excess function of doc length per language
# ---------------------------------------------------------------------------
# e(u) = E[X - u | X > u] at per-language order-statistic thresholds
# (ranks ((n-1)*q)//100 + 1 for q in {50, 75, 90}) — the standard
# peaks-over-threshold diagnostic (Davison & Smith JRSS-B 1990): linear
# growth in u flags a GPD tail, complementing hill_tail_index (tail
# exponent) and gumbel_maxima (block maxima).  Thresholds are exact
# order statistics off ONE per-lang rank window; the excess sum is an
# exact BIGINT, so the only double op is one division — identical IEEE
# result on both engines.

_ME_QS = (50, 75, 90)


def q_mean_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    r = d.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    qs = r.withColumn(
        "q_pct", F.explode(F.array(*[F.lit(q) for q in _ME_QS]))
    )
    thr = qs.filter(
        F.col("rk")
        == F.expr("((nn - 1) * q_pct) div 100") + 1
    ).select(
        "lang",
        F.col("q_pct").cast("long").alias("q_pct"),
        F.col("n_chars").cast("long").alias("u"),
    )
    exc = (
        d.join(F.broadcast(thr), "lang")
        .filter(F.col("n_chars") > F.col("u"))
        .groupBy("lang", "q_pct", "u")
        .agg(
            F.count(F.lit(1)).alias("n_exc"),
            F.sum(F.col("n_chars").cast("long") - F.col("u")).alias("s_exc"),
        )
    )
    me = F.col("s_exc").cast("double") / F.col("n_exc").cast("double")
    return exc.select(
        "lang",
        "q_pct",
        "u",
        F.col("n_exc").cast("long").alias("n_exc"),
        F.col("s_exc").cast("long").alias("s_exc"),
        F.floor(me * 10_000 + F.lit(_OFF)).cast("long").alias("me_e4"),
    ).orderBy("lang", "q_pct")


SQL_MEAN_EXCESS = f"""
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
           AS rk,
         count(*) OVER (PARTITION BY lang) AS nn
  FROM documents
), thr AS (
  SELECT lang, CAST(q_pct AS BIGINT) AS q_pct, CAST(n_chars AS BIGINT) AS u
  FROM r, (VALUES (50), (75), (90)) qs(q_pct)
  WHERE rk = ((nn - 1) * q_pct) // 100 + 1
), exc AS (
  SELECT d.lang, t.q_pct, t.u, count(*) AS n_exc,
         CAST(sum(d.n_chars - t.u) AS BIGINT) AS s_exc
  FROM documents d
  JOIN thr t ON t.lang = d.lang AND d.n_chars > t.u
  GROUP BY 1, 2, 3
)
SELECT lang, q_pct, u, CAST(n_exc AS BIGINT) AS n_exc, s_exc,
       CAST(floor(CAST(s_exc AS DOUBLE) / n_exc * 10000 + {_OFF})
            AS BIGINT) AS me_e4
FROM exc
ORDER BY lang, q_pct
"""


# ---------------------------------------------------------------------------
# taylor_law — Taylor's power law on weekly daily-count fluctuations
# ---------------------------------------------------------------------------
# Taylor (Nature 1961): var ~ a * mean^b across replicate windows; b in
# (1, 2) is the universal fluctuation-scaling signature of bursty count
# processes (Eisler et al. Adv. Phys. 2008).  Replicates = calendar
# weeks of daily event counts per type; mean and variance are exact
# rationals QUANTIZED to e2 integers BEFORE the logs, so both engines
# regress over identical points (zipf_slope precedent); slope via
# regr_slope, e4 half-up.

_TL_MIN_DAYS = 3


def q_taylor_law(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    weekly = daily.groupBy(
        "event_type", F.expr("day div 7").alias("wk")
    ).agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    ).filter(F.col("nd") >= _TL_MIN_DAYS)
    m_e2 = F.floor(
        F.col("s1").cast("double") / F.col("nd") * 100 + F.lit(_OFF)
    ).cast("long")
    v_e2 = F.floor(
        (F.col("nd") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("nd") * (F.col("nd") - 1)).cast("double")
        * 100
        + F.lit(_OFF)
    ).cast("long")
    pts = weekly.select(
        "event_type", m_e2.alias("m_e2"), v_e2.alias("v_e2")
    ).filter((F.col("m_e2") > 0) & (F.col("v_e2") > 0))
    return (
        pts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_weeks"),
            F.floor(
                F.expr("regr_slope(ln(v_e2), ln(m_e2))") * 10_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("b_e4"),
        )
        .filter(F.col("n_weeks") >= 3)
        .orderBy("event_type")
    )


SQL_TAYLOR = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), weekly AS (
  SELECT event_type, day // 7 AS wk, count(*) AS nd,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM daily GROUP BY 1, 2
  HAVING count(*) >= {_TL_MIN_DAYS}
), pts AS (
  SELECT event_type,
         CAST(floor(CAST(s1 AS DOUBLE) / nd * 100 + {_OFF}) AS BIGINT)
           AS m_e2,
         CAST(floor(CAST(nd * s2 - s1 * s1 AS DOUBLE)
                    / (nd * (nd - 1)) * 100 + {_OFF}) AS BIGINT) AS v_e2
  FROM weekly
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_weeks,
       CAST(floor(regr_slope(ln(v_e2), ln(m_e2)) * 10000 + 0.5) AS BIGINT)
         AS b_e4
FROM pts
WHERE m_e2 > 0 AND v_e2 > 0
GROUP BY 1
HAVING count(*) >= 3
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# levene_bf — Brown-Forsythe robust variance homogeneity per user
# ---------------------------------------------------------------------------
# The median-centered Levene test (Brown & Forsythe JASA 1974): one-way
# ANOVA F on z_ij = |v_ij - median_j| — the robust companion to
# anova_event_types (which compares MEANS; this compares SPREADS).
# Group medians are exact lower medians of centivalues off one rank
# window; z is an exact integer, so the whole statistic reuses the
# anova exact-integer expansion (SSB/SSW from BIGINT sums, <=|types|
# double terms against the e4 grid).


def q_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).alias("v"),
    )
    wg = Window.partitionBy("user_id", "event_type").orderBy("v")
    wn = Window.partitionBy("user_id", "event_type")
    r = ev.withColumn("rk", F.row_number().over(wg)).withColumn(
        "ng", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(
        F.col("rk") == F.floor((F.col("ng") - 1) / 2) + 1
    ).select("user_id", "event_type", F.col("v").alias("med"))
    z = ev.join(med, ["user_id", "event_type"]).withColumn(
        "z", F.abs(F.col("v") - F.col("med"))
    )
    g = z.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("qz"),
    )
    agg = g.groupBy("user_id").agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sz").alias("s"),
        F.sum("qz").alias("q"),
        F.sum(
            F.col("sz").cast("double") * F.col("sz") / F.col("ng")
        ).alias("w"),
    )
    ssb = F.col("w") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("w")
    wstat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return (
        agg.filter(
            (F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0)
        )
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k"),
            F.floor(wstat * 10_000 + F.lit(_OFF)).cast("long").alias("w_e4"),
        )
        .orderBy("user_id")
    )


SQL_LEVENE = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT user_id, event_type, v,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY v)
           AS rk,
         count(*) OVER (PARTITION BY user_id, event_type) AS ng
  FROM ev
), med AS (
  SELECT user_id, event_type, v AS med
  FROM r WHERE rk = (ng - 1) // 2 + 1
), z AS (
  SELECT ev.user_id, ev.event_type, abs(ev.v - med.med) AS z
  FROM ev
  JOIN med ON med.user_id = ev.user_id AND med.event_type = ev.event_type
), g AS (
  SELECT user_id, event_type, count(*) AS ng,
         CAST(sum(z) AS BIGINT) AS sz, CAST(sum(z * z) AS BIGINT) AS qz
  FROM z GROUP BY 1, 2
), agg AS (
  SELECT user_id, CAST(sum(ng) AS BIGINT) AS n, count(*) AS k,
         CAST(sum(sz) AS BIGINT) AS s, CAST(sum(qz) AS BIGINT) AS q,
         sum(CAST(sz AS DOUBLE) * sz / ng) AS w
  FROM g GROUP BY 1
)
SELECT user_id, n, CAST(k AS BIGINT) AS k,
       CAST(floor(
         ((w - CAST(s AS DOUBLE) * s / n) / (k - 1))
         / ((q - w) / (n - k)) * 10000 + {_OFF}) AS BIGINT) AS w_e4
FROM agg
WHERE k >= 2 AND n > k AND q - w > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# kruskal_wallis — tie-corrected rank ANOVA of value by event type, per user
# ---------------------------------------------------------------------------
# The nonparametric companion to anova_event_types (Kruskal & Wallis
# JASA 1952).  Average ranks stay EXACT as the integer 2*avgrank =
# 2*minrank + ties - 1 (rank() + per-value count windows over the
# per-user sort); H = 3/(N(N+1)) * sum_g (2R_g)^2/n_g - 3(N+1), then
# the tie correction 1 - sum(t^3-t)/(N^3-N) from one exact per-value
# count agg.  Same <=|types| double-term discipline as anova.


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).alias("v"),
    )
    wr = Window.partitionBy("user_id").orderBy("v")
    wt = Window.partitionBy("user_id", "v")
    r = ev.withColumn("minrk", F.rank().over(wr)).withColumn(
        "t", F.count(F.lit(1)).over(wt)
    )
    # 2 * average rank is the exact integer 2*minrk + t - 1
    r = r.withColumn("rk2", 2 * F.col("minrk") + F.col("t") - 1)
    g = r.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("ng"), F.sum("rk2").alias("r2g")
    )
    ties = (
        ev.groupBy("user_id", "v")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tsum")
        )
    )
    agg = g.groupBy("user_id").agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            (F.col("r2g") * F.col("r2g")).cast("double") / F.col("ng")
        ).alias("rr"),
    )
    j = agg.join(ties, "user_id")
    nd = F.col("n").cast("double")
    h = F.lit(3.0) / (nd * (nd + 1)) * F.col("rr") - 3 * (nd + 1)
    corr = F.lit(1.0) - F.col("tsum").cast("double") / (nd * nd * nd - nd)
    hc = h / corr
    return (
        j.filter((F.col("k") >= 2) & (corr > 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k"),
            F.col("tsum").cast("long").alias("tsum"),
            F.floor(hc * 10_000 + F.lit(_OFF)).cast("long").alias("h_e4"),
        )
        .orderBy("user_id")
    )


SQL_KRUSKAL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT user_id, event_type,
         2 * rank() OVER (PARTITION BY user_id ORDER BY v)
           + count(*) OVER (PARTITION BY user_id, v) - 1 AS rk2
  FROM ev
), g AS (
  SELECT user_id, event_type, count(*) AS ng,
         CAST(sum(rk2) AS BIGINT) AS r2g
  FROM r GROUP BY 1, 2
), ties AS (
  SELECT user_id, CAST(sum(t * t * t - t) AS BIGINT) AS tsum
  FROM (SELECT user_id, v, count(*) AS t FROM ev GROUP BY 1, 2)
  GROUP BY 1
), agg AS (
  SELECT user_id, CAST(sum(ng) AS BIGINT) AS n, count(*) AS k,
         sum(CAST(r2g * r2g AS DOUBLE) / ng) AS rr
  FROM g GROUP BY 1
)
SELECT agg.user_id, n, CAST(k AS BIGINT) AS k, tsum,
       CAST(floor(
         (3.0 / (CAST(n AS DOUBLE) * (n + 1)) * rr - 3 * (n + 1))
         / (1.0 - CAST(tsum AS DOUBLE)
                  / (CAST(n AS DOUBLE) * n * n - n)) * 10000 + {_OFF})
         AS BIGINT) AS h_e4
FROM agg JOIN ties ON ties.user_id = agg.user_id
WHERE k >= 2
  AND 1.0 - CAST(tsum AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n) > 0
ORDER BY agg.user_id
"""


# ---------------------------------------------------------------------------
# arch_lm — Engle's lag-1 ARCH LM test on daily count fluctuations
# ---------------------------------------------------------------------------
# Engle (Econometrica 1982): volatility clustering shows as
# autocorrelation in SQUARED innovations.  Innovation proxy u_t =
# (n*c_t - S)^2 — the scaled squared deviation from the per-type mean,
# an EXACT BIGINT (R^2 is invariant to the n^2 scale factor), so both
# engines regress identical integer pairs (u_t, u_{t-1}); LM = m * R^2
# over the m lag pairs, e4 half-up (zipf_slope regr precedent).


def q_arch_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wl = Window.partitionBy("event_type").orderBy("day")
    p = d.withColumn("u_lag", F.lag("u").over(wl)).filter(
        F.col("u_lag").isNotNull()
    )
    agg = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.expr("regr_r2(CAST(u AS DOUBLE), CAST(u_lag AS DOUBLE))").alias(
            "r2"
        ),
    )
    return (
        agg.filter((F.col("m") >= 5) & F.col("r2").isNotNull())
        .select(
            "event_type",
            F.col("m").cast("long").alias("m"),
            F.floor(F.col("m") * F.col("r2") * 10_000 + F.lit(0.5))
            .cast("long")
            .alias("lm_e4"),
        )
        .orderBy("event_type")
    )


SQL_ARCH = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day,
         (count(*) OVER (PARTITION BY event_type) * c
          - sum(c) OVER (PARTITION BY event_type))
         * (count(*) OVER (PARTITION BY event_type) * c
            - sum(c) OVER (PARTITION BY event_type)) AS u
  FROM daily
), p AS (
  SELECT event_type, u,
         lag(u) OVER (PARTITION BY event_type ORDER BY day) AS u_lag
  FROM d
), agg AS (
  SELECT event_type, count(*) AS m,
         regr_r2(CAST(u AS DOUBLE), CAST(u_lag AS DOUBLE)) AS r2
  FROM p WHERE u_lag IS NOT NULL
  GROUP BY 1
)
SELECT event_type, CAST(m AS BIGINT) AS m,
       CAST(floor(m * r2 * 10000 + 0.5) AS BIGINT) AS lm_e4
FROM agg
WHERE m >= 5 AND r2 IS NOT NULL
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# jarque_bera — JB normality test on daily counts per event type
# ---------------------------------------------------------------------------
# Jarque & Bera (1980): JB = n/6 * (g1^2 + g2^2/4) from moment
# skewness/kurtosis.  Central moments expand over the EXACT raw power
# sums S1..S4 (BIGINT; |c| <= ~1e4 daily at the benchmarked SFs keeps
# S4 <= ~1e17 — bound documented, the wasserstein_doclen overflow
# protocol); the double op tree after the sums is one expression,
# identical on both engines, e4 floor + house offset.


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    c = F.col("c")
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
        F.sum(c * c * c).alias("s3"),
        F.sum(c * c * c * c).alias("s4"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd - mu * mu
    m3 = (
        F.col("s3").cast("double") / nd
        - 3 * mu * F.col("s2").cast("double") / nd
        + 2 * mu * mu * mu
    )
    m4 = (
        F.col("s4").cast("double") / nd
        - 4 * mu * F.col("s3").cast("double") / nd
        + 6 * mu * mu * F.col("s2").cast("double") / nd
        - 3 * mu * mu * mu * mu
    )
    g1 = m3 / F.sqrt(m2 * m2 * m2)
    g2 = m4 / (m2 * m2) - 3.0
    jb = nd / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    return (
        agg.filter((F.col("n") >= 8) & (m2 > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.floor(g1 * 10_000 + F.lit(_OFF)).cast("long").alias("skew_e4"),
            F.floor(g2 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "exkurt_e4"
            ),
            F.floor(jb * 10_000 + F.lit(_OFF)).cast("long").alias("jb_e4"),
        )
        .orderBy("event_type")
    )


SQL_JB = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2,
         CAST(sum(c * c * c) AS BIGINT) AS s3,
         CAST(sum(c * c * c * c) AS BIGINT) AS s4
  FROM daily GROUP BY 1
), m AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3,
         CAST(s4 AS DOUBLE) / n AS r4
  FROM agg
), mm AS (
  SELECT event_type, n,
         r2 - mu * mu AS m2,
         r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
         r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu AS m4
  FROM m
), g AS (
  SELECT event_type, n,
         m3 / sqrt(m2 * m2 * m2) AS g1,
         m4 / (m2 * m2) - 3.0 AS g2,
         m2
  FROM mm
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(g1 * 10000 + {_OFF}) AS BIGINT) AS skew_e4,
       CAST(floor(g2 * 10000 + {_OFF}) AS BIGINT) AS exkurt_e4,
       CAST(floor(CAST(n AS DOUBLE) / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
                  * 10000 + {_OFF}) AS BIGINT) AS jb_e4
FROM g
WHERE n >= 8 AND m2 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# grubbs_test — Grubbs' max-deviation outlier test on daily counts
# ---------------------------------------------------------------------------
# Grubbs (Technometrics 1969): G = max|c - mean| / s.  The argmax day
# is the EXACT integer argmax of |n*c - S| (ties broken by earliest
# day — deterministic on both engines via min() over the tied set); s
# from the exact sums, G one double expression.


def q_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    d = (
        daily.withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("s", F.sum("c").over(wn))
        .withColumn("q", F.sum(F.col("c") * F.col("c")).over(wn))
    )
    d = d.withColumn("dev", F.abs(F.col("n") * F.col("c") - F.col("s")))
    wmax = Window.partitionBy("event_type")
    d = d.withColumn("maxdev", F.max("dev").over(wmax))
    top = (
        d.filter(F.col("dev") == F.col("maxdev"))
        .groupBy("event_type")
        .agg(
            F.min("day").alias("out_day"),
            F.max("n").alias("n"),
            F.max("s").alias("s"),
            F.max("q").alias("q"),
            F.max("maxdev").alias("dev"),
        )
    )
    nd = F.col("n").cast("double")
    var = (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast(
        "double"
    ) / (nd * (nd - 1))
    g = F.col("dev").cast("double") / F.col("n") / F.sqrt(var)
    return (
        top.filter((F.col("n") >= 3) & (var > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("out_day").cast("long").alias("out_day"),
            F.col("dev").cast("long").alias("dev"),
            F.floor(g * 10_000 + F.lit(_OFF)).cast("long").alias("g_e4"),
        )
        .orderBy("event_type")
    )


SQL_GRUBBS = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day, c,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS s,
         sum(c * c) OVER (PARTITION BY event_type) AS q,
         abs(count(*) OVER (PARTITION BY event_type) * c
             - sum(c) OVER (PARTITION BY event_type)) AS dev
  FROM daily
), m AS (
  SELECT event_type, day, c, n, s, q, dev,
         max(dev) OVER (PARTITION BY event_type) AS maxdev
  FROM d
), top AS (
  SELECT event_type, min(day) AS out_day,
         CAST(max(n) AS BIGINT) AS n, CAST(max(s) AS BIGINT) AS s,
         CAST(max(q) AS BIGINT) AS q, CAST(max(dev) AS BIGINT) AS dev
  FROM m WHERE dev = maxdev GROUP BY 1
)
SELECT event_type, n, CAST(out_day AS BIGINT) AS out_day, dev,
       CAST(floor(CAST(dev AS DOUBLE) / n
                  / sqrt(CAST(n * q - s * s AS DOUBLE)
                         / (CAST(n AS DOUBLE) * (n - 1)))
                  * 10000 + {_OFF}) AS BIGINT) AS g_e4
FROM top
WHERE n >= 3 AND n * q - s * s > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# lexical_richness — Yule's K, Sichel's S, Honore's R, Brunet's W per lang
# ---------------------------------------------------------------------------
# The classical lexical-richness battery (Yule 1944; Sichel 1975; Honore
# 1979; Brunet 1978) complementing lexical_diversity/vocab_richness:
# K = 1e4*(S2-N)/N^2 and S = V2/V are exact rationals; R =
# 100*ln(N)/(1-V1/V) and W = exp(ln(N)*exp(-0.165*ln(V))) are one-ln/exp
# expressions over exact integers — BOTH engines build W from the same
# explicit exp/ln op tree (never pow, whose libm varies), e2 half-up.


def q_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    freq = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    agg = freq.groupBy("lang").agg(
        F.sum("m").alias("n"),
        F.count(F.lit(1)).alias("v"),
        F.sum((F.col("m") == 1).cast("long")).alias("v1"),
        F.sum((F.col("m") == 2).cast("long")).alias("v2"),
        F.sum(F.col("m") * F.col("m")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    vd = F.col("v").cast("double")
    yule_k = 10_000.0 * (F.col("s2") - F.col("n")).cast("double") / (nd * nd)
    sichel = F.col("v2").cast("double") / vd
    honore = 100.0 * F.log(nd) / (1.0 - F.col("v1").cast("double") / vd)
    brunet = F.exp(F.log(nd) * F.exp(-0.165 * F.log(vd)))
    return (
        agg.filter((F.col("v1") < F.col("v")) & (F.col("n") > 1))
        .select(
            "lang",
            F.col("n").cast("long").alias("n"),
            F.col("v").cast("long").alias("v"),
            F.col("v1").cast("long").alias("v1"),
            F.col("v2").cast("long").alias("v2"),
            F.floor(yule_k * 10_000 + F.lit(_OFF)).cast("long").alias(
                "yule_k_e4"
            ),
            F.floor(sichel * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "sichel_e6"
            ),
            F.floor(honore * 100 + F.lit(0.5)).cast("long").alias(
                "honore_e2"
            ),
            F.floor(brunet * 100 + F.lit(0.5)).cast("long").alias(
                "brunet_e2"
            ),
        )
        .orderBy("lang")
    )


SQL_RICHNESS = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), freq AS (
  SELECT lang, w, count(*) AS m FROM toks GROUP BY 1, 2
), agg AS (
  SELECT lang, CAST(sum(m) AS BIGINT) AS n, count(*) AS v,
         CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(m * m) AS BIGINT) AS s2
  FROM freq GROUP BY 1
)
SELECT lang, n, CAST(v AS BIGINT) AS v, v1, v2,
       CAST(floor(10000.0 * (s2 - n) / (CAST(n AS DOUBLE) * n) * 10000
                  + {_OFF}) AS BIGINT) AS yule_k_e4,
       CAST(floor(CAST(v2 AS DOUBLE) / v * 1000000 + {_OFF}) AS BIGINT)
         AS sichel_e6,
       CAST(floor(100.0 * ln(CAST(n AS DOUBLE))
                  / (1.0 - CAST(v1 AS DOUBLE) / v) * 100 + 0.5) AS BIGINT)
         AS honore_e2,
       CAST(floor(exp(ln(CAST(n AS DOUBLE))
                      * exp(-0.165 * ln(CAST(v AS DOUBLE)))) * 100 + 0.5)
            AS BIGINT) AS brunet_e2
FROM agg
WHERE v1 < v AND n > 1
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank — paired week-over-week shift test per event type
# ---------------------------------------------------------------------------
# Wilcoxon (1945) on pairs (c_day, c_day+7): d = c_{t+7} - c_t, zeros
# dropped, |d| average-ranked via the exact 2*avgrank = 2*minrank+t-1
# integer; 2*W+ is an exact BIGINT; the normal approximation z uses the
# tie-corrected variance n(n+1)(2n+1)/24 - sum(t^3-t)/48 — one double
# expression over exact integers.  Pairing is a co-partitioned
# equi-self-join on (event_type, day+7), robust to missing days.


def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") == F.col("a.day") + 7),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.c") - F.col("a.c")).alias("d"),
    ).filter(F.col("d") != 0)
    pairs = pairs.withColumn("ad", F.abs(F.col("d")))
    wr = Window.partitionBy("event_type").orderBy("ad")
    wt = Window.partitionBy("event_type", "ad")
    r = pairs.withColumn("minrk", F.rank().over(wr)).withColumn(
        "t", F.count(F.lit(1)).over(wt)
    )
    r = r.withColumn("rk2", 2 * F.col("minrk") + F.col("t") - 1)
    ties = (
        pairs.groupBy("event_type", "ad")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tsum")
        )
    )
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("rk2")).otherwise(F.lit(0))).alias(
            "w2"
        ),
    )
    j = agg.join(ties, "event_type")
    nd = F.col("n").cast("double")
    mean2 = nd * (nd + 1) / 2.0  # 2 * n(n+1)/4
    var = nd * (nd + 1) * (2 * nd + 1) / 24.0 - F.col("tsum").cast(
        "double"
    ) / 48.0
    z = (F.col("w2").cast("double") - mean2) / (2.0 * F.sqrt(var))
    return (
        j.filter((F.col("n") >= 5) & (var > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("w2").cast("long").alias("w2"),
            F.col("tsum").cast("long").alias("tsum"),
            F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        )
        .orderBy("event_type")
    )


SQL_WILCOXON = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, b.c - a.c AS d, abs(b.c - a.c) AS ad
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type AND b.day = a.day + 7
  WHERE b.c - a.c <> 0
), r AS (
  SELECT event_type, d,
         2 * rank() OVER (PARTITION BY event_type ORDER BY ad)
           + count(*) OVER (PARTITION BY event_type, ad) - 1 AS rk2
  FROM pairs
), ties AS (
  SELECT event_type, CAST(sum(t * t * t - t) AS BIGINT) AS tsum
  FROM (SELECT event_type, ad, count(*) AS t FROM pairs GROUP BY 1, 2)
  GROUP BY 1
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CASE WHEN d > 0 THEN rk2 ELSE 0 END) AS BIGINT) AS w2
  FROM r GROUP BY 1
)
SELECT agg.event_type, CAST(n AS BIGINT) AS n, w2, tsum,
       CAST(floor(
         (w2 - CAST(n AS DOUBLE) * (n + 1) / 2.0)
         / (2.0 * sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
                       - CAST(tsum AS DOUBLE) / 48.0)) * 10000 + {_OFF})
         AS BIGINT) AS z_e4
FROM agg JOIN ties ON ties.event_type = agg.event_type
WHERE n >= 5
  AND CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
      - CAST(tsum AS DOUBLE) / 48.0 > 0
ORDER BY agg.event_type
"""


# ---------------------------------------------------------------------------
# durbin_watson — DW autocorrelation of daily-count OLS trend residuals
# ---------------------------------------------------------------------------
# Durbin & Watson (Biometrika 1950): DW = sum (e_t - e_{t-1})^2 /
# sum e_t^2 on residuals of the per-type c ~ day regression.  The
# SCALED residual E_t = D*(n*y_t - Sy) - Nb*(n*t - St), with D =
# n*St2 - St^2 and Nb = n*Sty - St*Sy, is an EXACT BIGINT (scale
# cancels in the ratio); squares ride doubles of identical integers
# (ljung_box few-term grid argument).  Day index is re-based to the
# per-type min day so the integer magnitudes stay bounded
# (|E| <= ~1e12 at the benchmarked SFs — documented bound).


def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    d = daily.withColumn("t", F.col("day") - F.min("day").over(wn))
    d = (
        d.withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("st", F.sum("t").over(wn))
        .withColumn("st2", F.sum(F.col("t") * F.col("t")).over(wn))
        .withColumn("sy", F.sum("c").over(wn))
        .withColumn("sty", F.sum(F.col("t") * F.col("c")).over(wn))
    )
    dd = F.col("n") * F.col("st2") - F.col("st") * F.col("st")
    nb = F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    e = dd * (F.col("n") * F.col("c") - F.col("sy")) - nb * (
        F.col("n") * F.col("t") - F.col("st")
    )
    d = d.withColumn("e", e)
    wl = Window.partitionBy("event_type").orderBy("t")
    p = d.withColumn("e_lag", F.lag("e").over(wl))
    agg = p.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("e").cast("double") * F.col("e").cast("double")).alias(
            "den"
        ),
        F.sum(
            F.when(
                F.col("e_lag").isNotNull(),
                (F.col("e") - F.col("e_lag")).cast("double")
                * (F.col("e") - F.col("e_lag")).cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("num"),
    )
    return (
        agg.filter((F.col("n") >= 5) & (F.col("den") > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.floor(F.col("num") / F.col("den") * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("dw_e4"),
        )
        .orderBy("event_type")
    )


SQL_DW = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d0 AS (
  SELECT event_type, c,
         day - min(day) OVER (PARTITION BY event_type) AS t
  FROM daily
), d AS (
  SELECT event_type, c, t,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(t) OVER (PARTITION BY event_type) AS st,
         sum(t * t) OVER (PARTITION BY event_type) AS st2,
         sum(c) OVER (PARTITION BY event_type) AS sy,
         sum(t * c) OVER (PARTITION BY event_type) AS sty
  FROM d0
), e AS (
  SELECT event_type, n, t,
         (n * st2 - st * st) * (n * c - sy)
         - (n * sty - st * sy) * (n * t - st) AS e
  FROM d
), p AS (
  SELECT event_type, n, e,
         lag(e) OVER (PARTITION BY event_type ORDER BY t) AS e_lag
  FROM e
), agg AS (
  SELECT event_type, max(n) AS n,
         sum(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)) AS den,
         sum(CASE WHEN e_lag IS NOT NULL
                  THEN CAST(e - e_lag AS DOUBLE) * CAST(e - e_lag AS DOUBLE)
                  ELSE 0.0 END) AS num
  FROM p GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(num / den * 10000 + {_OFF}) AS BIGINT) AS dw_e4
FROM agg
WHERE n >= 5 AND den > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# friedman_test — Friedman rank test of day-of-week effect per event type
# ---------------------------------------------------------------------------
# Friedman (JASA 1937): blocks = complete calendar weeks (all 7 days
# present), treatments = weekdays; within-block average ranks via the
# exact 2*avgrank integer.  With rr = sum_j (2R_j)^2 = 4*sum R_j^2 the
# statistic 12/(b*k*(k+1))*sum R_j^2 - 3*b*(k+1) becomes
# 3*rr/(b*k*(k+1)) - 3*b*(k+1) — a single expression over exact BIGINTs.


def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    daily = daily.withColumn("wk", F.expr("day div 7")).withColumn(
        "dow", ((F.col("day") + 3) % 7).cast("long")
    )
    wb = Window.partitionBy("event_type", "wk")
    full = daily.withColumn("nb", F.count(F.lit(1)).over(wb)).filter(
        F.col("nb") == 7
    )
    wr = Window.partitionBy("event_type", "wk").orderBy("c")
    wt = Window.partitionBy("event_type", "wk", "c")
    r = full.withColumn("minrk", F.rank().over(wr)).withColumn(
        "t", F.count(F.lit(1)).over(wt)
    )
    r = r.withColumn("rk2", 2 * F.col("minrk") + F.col("t") - 1)
    per = r.groupBy("event_type", "dow").agg(F.sum("rk2").alias("r2"))
    agg = per.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("r2") * F.col("r2")).alias("rr"),
        (F.sum("r2") / 56).alias("b"),  # sum 2R_j = b*k*(k+1) = 56b for k=7
    )
    bd = F.col("b").cast("double")
    # 12/(b k(k+1)) * sum R_j^2 - 3b(k+1) with rr = sum (2R_j)^2 = 4*sum R_j^2
    chi2 = 3.0 * F.col("rr").cast("double") / (bd * 7 * 8) - 3.0 * bd * 8
    return (
        agg.filter((F.col("k") == 7) & (F.col("b") >= 2))
        .select(
            "event_type",
            F.col("b").cast("long").alias("b"),
            F.col("rr").cast("long").alias("rr"),
            F.floor(chi2 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "chi2_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_FRIEDMAN = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day // 7 AS wk, (day + 3) % 7 AS dow, c FROM daily
), full_wk AS (
  SELECT event_type, wk, dow, c
  FROM (
    SELECT event_type, wk, dow, c,
           count(*) OVER (PARTITION BY event_type, wk) AS nb
    FROM d
  ) WHERE nb = 7
), r AS (
  SELECT event_type, wk, dow,
         2 * rank() OVER (PARTITION BY event_type, wk ORDER BY c)
           + count(*) OVER (PARTITION BY event_type, wk, c) - 1 AS rk2
  FROM full_wk
), per AS (
  SELECT event_type, dow, CAST(sum(rk2) AS BIGINT) AS r2
  FROM r GROUP BY 1, 2
), agg AS (
  SELECT event_type, count(*) AS k,
         CAST(sum(r2 * r2) AS BIGINT) AS rr,
         CAST(sum(r2) AS BIGINT) // 56 AS b
  FROM per GROUP BY 1
)
SELECT event_type, CAST(b AS BIGINT) AS b, rr,
       CAST(floor((3.0 * rr / (b * 7 * 8) - 3.0 * b * 8) * 10000
                  + {_OFF}) AS BIGINT) AS chi2_e4
FROM agg
WHERE k = 7 AND b >= 2
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cramers_v — bias-corrected Cramer's V of source x language association
# ---------------------------------------------------------------------------
# Cramer (1946) with the Bergsma (2013) bias correction: phi2_corr =
# max(0, chi2/n - (R-1)(C-1)/(n-1)), R' = R - (R-1)^2/(n-1), V =
# sqrt(phi2_corr / min(R'-1, C'-1)).  Margins ride windows over the
# |sources| x |langs| cell table (the chisq_type_hour discipline); the
# whole statistic is one expression over exact integers.


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("source", "lang")
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("source")
    wc = Window.partitionBy("lang")
    wn = Window.partitionBy()
    t = (
        cells.withColumn("r", F.sum("o").over(wr))
        .withColumn("c", F.sum("o").over(wc))
        .withColumn("nn", F.sum("o").over(wn))
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("nn")
    # unobserved cells contribute e to chi2; sum_all e = n, so fold them
    # in exactly via chi2 = n + sum_observed((o-e)^2/e - e)
    term = (F.col("o") - e) * (F.col("o") - e) / e - e
    agg = t.groupBy().agg(
        F.max("nn").cast("long").alias("n"),
        F.countDistinct("source").alias("nr"),
        F.countDistinct("lang").alias("nc"),
        (F.max("nn").cast("double") + F.sum(term)).alias("chi2"),
    )
    nd = F.col("n").cast("double")
    rd = F.col("nr").cast("double")
    cd = F.col("nc").cast("double")
    phi2c = F.greatest(
        F.lit(0.0),
        F.col("chi2") / nd - (rd - 1) * (cd - 1) / (nd - 1),
    )
    rprime = rd - (rd - 1) * (rd - 1) / (nd - 1)
    cprime = cd - (cd - 1) * (cd - 1) / (nd - 1)
    vcorr = F.sqrt(phi2c / F.least(rprime - 1, cprime - 1))
    v = F.sqrt(
        F.col("chi2") / (nd * F.least(rd - 1, cd - 1).cast("double"))
    )
    return agg.select(
        "n",
        F.col("nr").cast("long").alias("nr"),
        F.col("nc").cast("long").alias("nc"),
        F.floor(F.col("chi2") * 10_000 + F.lit(_OFF)).cast("long").alias(
            "chi2_e4"
        ),
        F.floor(v * 1_000_000 + F.lit(_OFF)).cast("long").alias("v_e6"),
        F.floor(vcorr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "v_corr_e6"
        ),
    )


SQL_CRAMERS = f"""
WITH cells AS (
  SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2
), t AS (
  SELECT o,
         sum(o) OVER (PARTITION BY source) AS r,
         sum(o) OVER (PARTITION BY lang) AS c,
         sum(o) OVER () AS nn
  FROM cells
), agg AS (
  SELECT CAST(max(nn) AS BIGINT) AS n,
         (SELECT count(DISTINCT source) FROM documents) AS nr,
         (SELECT count(DISTINCT lang) FROM documents) AS nc,
         CAST(max(nn) AS DOUBLE)
         + sum((o - CAST(r AS DOUBLE) * c / nn)
               * (o - CAST(r AS DOUBLE) * c / nn)
               / (CAST(r AS DOUBLE) * c / nn)
               - CAST(r AS DOUBLE) * c / nn) AS chi2
  FROM t
)
SELECT n, CAST(nr AS BIGINT) AS nr, CAST(nc AS BIGINT) AS nc,
       CAST(floor(chi2 * 10000 + {_OFF}) AS BIGINT) AS chi2_e4,
       CAST(floor(sqrt(chi2 / (CAST(n AS DOUBLE)
                               * least(CAST(nr AS DOUBLE) - 1,
                                       CAST(nc AS DOUBLE) - 1)))
                  * 1000000 + {_OFF}) AS BIGINT) AS v_e6,
       CAST(floor(sqrt(greatest(0.0,
                                chi2 / CAST(n AS DOUBLE)
                                - (CAST(nr AS DOUBLE) - 1)
                                  * (CAST(nc AS DOUBLE) - 1)
                                  / (CAST(n AS DOUBLE) - 1))
                       / least(CAST(nr AS DOUBLE)
                               - (CAST(nr AS DOUBLE) - 1)
                                 * (CAST(nr AS DOUBLE) - 1)
                                 / (CAST(n AS DOUBLE) - 1) - 1,
                               CAST(nc AS DOUBLE)
                               - (CAST(nc AS DOUBLE) - 1)
                                 * (CAST(nc AS DOUBLE) - 1)
                                 / (CAST(n AS DOUBLE) - 1) - 1))
                  * 1000000 + {_OFF}) AS BIGINT) AS v_corr_e6
FROM agg
"""


# ---------------------------------------------------------------------------
# cochran_q — Cochran's Q over THREE binary labelers per language
# ---------------------------------------------------------------------------
# Cochran (Biometrika 1950) completes the labeler-agreement trio
# (cohens_kappa, mcnemar_labelers): k=3 judges — length, TTR, and
# punctuation density above their exact per-lang lower medians.  With
# column totals G_j, S = G1+G2+G3, row totals L_i: Q =
# 2*sum(3G_j - S)^2 / (3*(3*sum L - sum L^2)) — an exact rational.


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "lang",
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias(
            "n_types"
        ),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks"),
        F.regexp_count(F.col("text"), F.lit(r"[.,;:!?]")).alias("n_punct"),
    )
    d = d.withColumn(
        "ttr_e6",
        F.floor(
            F.col("n_types").cast("double") / F.col("n_toks") * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    ).withColumn(
        "pd_e6",
        F.floor(
            F.col("n_punct").cast("double") / F.col("n_chars") * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    wn = Window.partitionBy("lang")
    meds = []
    for col, med_name in (
        ("n_chars", "med_len"),
        ("ttr_e6", "med_ttr"),
        ("pd_e6", "med_pd"),
    ):
        w = Window.partitionBy("lang").orderBy(col, "doc_id")
        r = d.withColumn("rk", F.row_number().over(w)).withColumn(
            "nn", F.count(F.lit(1)).over(wn)
        )
        meds.append(
            r.filter(F.col("rk") == F.floor((F.col("nn") - 1) / 2) + 1)
            .select("lang", F.col(col).alias(med_name))
        )
    lab = d
    for m in meds:
        lab = lab.join(F.broadcast(m), "lang")
    lab = (
        lab.withColumn("a", (F.col("n_chars") > F.col("med_len")).cast("long"))
        .withColumn("b", (F.col("ttr_e6") > F.col("med_ttr")).cast("long"))
        .withColumn("c", (F.col("pd_e6") > F.col("med_pd")).cast("long"))
        .withColumn("l", F.col("a") + F.col("b") + F.col("c"))
    )
    agg = lab.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("g1"),
        F.sum("b").alias("g2"),
        F.sum("c").alias("g3"),
        F.sum("l").alias("sl"),
        F.sum(F.col("l") * F.col("l")).alias("sl2"),
    )
    s = F.col("g1") + F.col("g2") + F.col("g3")
    num = (
        (3 * F.col("g1") - s) * (3 * F.col("g1") - s)
        + (3 * F.col("g2") - s) * (3 * F.col("g2") - s)
        + (3 * F.col("g3") - s) * (3 * F.col("g3") - s)
    )
    den = 3 * (3 * F.col("sl") - F.col("sl2"))
    q = (2 * num).cast("double") / den.cast("double")
    return (
        agg.filter(den > 0)
        .select(
            "lang",
            F.col("n").cast("long").alias("n"),
            F.col("g1").cast("long").alias("g1"),
            F.col("g2").cast("long").alias("g2"),
            F.col("g3").cast("long").alias("g3"),
            F.floor(q * 10_000 + F.lit(_OFF)).cast("long").alias("q_e4"),
        )
        .orderBy("lang")
    )


SQL_COCHRAN = f"""
WITH d AS (
  SELECT lang, doc_id, n_chars,
         CAST(floor(CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                         AS DOUBLE)
                    / len(regexp_split_to_array(trim(text), '\\s+'))
                    * 1000000 + {_OFF}) AS BIGINT) AS ttr_e6,
         CAST(floor(CAST(len(regexp_extract_all(text, '[.,;:!?]'))
                         AS DOUBLE)
                    / n_chars * 1000000 + {_OFF}) AS BIGINT) AS pd_e6
  FROM documents
), r AS (
  SELECT lang, n_chars, ttr_e6, pd_e6,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
           AS r_len,
         row_number() OVER (PARTITION BY lang ORDER BY ttr_e6, doc_id)
           AS r_ttr,
         row_number() OVER (PARTITION BY lang ORDER BY pd_e6, doc_id)
           AS r_pd,
         count(*) OVER (PARTITION BY lang) AS nn
  FROM d
), med_len AS (
  SELECT lang, n_chars AS med_len FROM r WHERE r_len = (nn - 1) // 2 + 1
), med_ttr AS (
  SELECT lang, ttr_e6 AS med_ttr FROM r WHERE r_ttr = (nn - 1) // 2 + 1
), med_pd AS (
  SELECT lang, pd_e6 AS med_pd FROM r WHERE r_pd = (nn - 1) // 2 + 1
), lab AS (
  SELECT d.lang,
         CASE WHEN d.n_chars > med_len.med_len THEN 1 ELSE 0 END AS a,
         CASE WHEN d.ttr_e6 > med_ttr.med_ttr THEN 1 ELSE 0 END AS b,
         CASE WHEN d.pd_e6 > med_pd.med_pd THEN 1 ELSE 0 END AS c
  FROM d
  JOIN med_len ON med_len.lang = d.lang
  JOIN med_ttr ON med_ttr.lang = d.lang
  JOIN med_pd ON med_pd.lang = d.lang
), agg AS (
  SELECT lang, count(*) AS n,
         CAST(sum(a) AS BIGINT) AS g1, CAST(sum(b) AS BIGINT) AS g2,
         CAST(sum(c) AS BIGINT) AS g3,
         CAST(sum(a + b + c) AS BIGINT) AS sl,
         CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS sl2
  FROM lab GROUP BY 1
)
SELECT lang, CAST(n AS BIGINT) AS n, g1, g2, g3,
       CAST(floor(CAST(2 * ((3 * g1 - (g1 + g2 + g3)) * (3 * g1 - (g1 + g2 + g3))
                            + (3 * g2 - (g1 + g2 + g3)) * (3 * g2 - (g1 + g2 + g3))
                            + (3 * g3 - (g1 + g2 + g3)) * (3 * g3 - (g1 + g2 + g3)))
                       AS DOUBLE)
                  / (3 * (3 * sl - sl2)) * 10000 + {_OFF}) AS BIGINT)
         AS q_e4
FROM agg
WHERE 3 * (3 * sl - sl2) > 0
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# source_profile_cosine — cosine similarity of source unigram profiles
# ---------------------------------------------------------------------------
# Per-source count vectors over the GLOBAL top-100 vocabulary (exact
# count-desc/term-asc ranking bounds the join key set before any
# pairing — the textrank vocab discipline); dot products and norms are
# exact BIGINTs off one term-keyed self-join, cosine one double
# expression.  Distinct from source_overlap (set Jaccard) and
# source_containment (asymmetric): this weighs terms by frequency.

_SPC_TOP = 100


def q_source_profile_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    gcnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("gc"))
    wv = Window.orderBy(F.desc("gc"), F.asc("w"))
    vocab = (
        gcnt.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= _SPC_TOP)
        .select("w")
    )
    prof = (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    norms = prof.groupBy("source").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("nrm")
    )
    pairs = (
        prof.alias("a")
        .join(prof.alias("b"), "w")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot"))
    )
    out = (
        pairs.join(
            F.broadcast(norms.withColumnRenamed("source", "sa")
                        .withColumnRenamed("nrm", "na")),
            "sa",
        )
        .join(
            F.broadcast(norms.withColumnRenamed("source", "sb")
                        .withColumnRenamed("nrm", "nb")),
            "sb",
        )
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return out.select(
        "sa",
        "sb",
        F.col("dot").cast("long").alias("dot"),
        F.floor(cos * 1_000_000 + F.lit(_OFF)).cast("long").alias("cos_e6"),
    ).orderBy("sa", "sb")


SQL_SPC = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), gcnt AS (
  SELECT w, count(*) AS gc FROM toks GROUP BY 1
), vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY gc DESC, w ASC) AS rk FROM gcnt
  ) WHERE rk <= {_SPC_TOP}
), prof AS (
  SELECT source, toks.w, count(*) AS cnt
  FROM toks JOIN vocab ON vocab.w = toks.w
  GROUP BY 1, 2
), norms AS (
  SELECT source, CAST(sum(cnt * cnt) AS BIGINT) AS nrm
  FROM prof GROUP BY 1
), pairs AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(sum(a.cnt * b.cnt) AS BIGINT) AS dot
  FROM prof a JOIN prof b ON b.w = a.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sa, sb, dot,
       CAST(floor(CAST(dot AS DOUBLE)
                  / sqrt(CAST(na.nrm AS DOUBLE) * nb.nrm)
                  * 1000000 + {_OFF}) AS BIGINT) AS cos_e6
FROM pairs
JOIN norms na ON na.source = pairs.sa
JOIN norms nb ON nb.source = pairs.sb
ORDER BY sa, sb
"""


# ---------------------------------------------------------------------------
# theil_sen — Theil-Sen median slope of daily counts per event type
# ---------------------------------------------------------------------------
# Theil (1950) / Sen (JASA 1968): the median of all pairwise slopes —
# the robust companion to trend_ols and the natural slope estimate for
# trend_mann_kendall.  Pairs ride a self-join on the DAY-GRID table
# (|days|^2/2 per type — grid-bounded, never event-bounded, the
# stickiness_dau_wau argument); each slope is ONE IEEE division of
# exact integers, so both engines sort identical doubles and the
# low-median selection is deterministic.


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / (F.col("b.day") - F.col("a.day")).cast("double")
        ).alias("sl"),
    )
    wr = Window.partitionBy("event_type").orderBy("sl")
    wn = Window.partitionBy("event_type")
    r = slopes.withColumn("rk", F.row_number().over(wr)).withColumn(
        "np", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(F.col("rk") == F.floor((F.col("np") - 1) / 2) + 1)
    return med.select(
        "event_type",
        F.col("np").cast("long").alias("n_pairs"),
        F.floor(F.col("sl") * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "slope_e6"
        ),
    ).orderBy("event_type")


SQL_THEIL_SEN = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), slopes AS (
  SELECT a.event_type,
         CAST(b.c - a.c AS DOUBLE) / (b.day - a.day) AS sl
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type AND b.day > a.day
), r AS (
  SELECT event_type, sl,
         row_number() OVER (PARTITION BY event_type ORDER BY sl) AS rk,
         count(*) OVER (PARTITION BY event_type) AS np
  FROM slopes
)
SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
       CAST(floor(sl * 1000000 + {_OFF}) AS BIGINT) AS slope_e6
FROM r
WHERE rk = (np - 1) // 2 + 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# char_class_profile — character-class composition per language
# ---------------------------------------------------------------------------
# The lang-ID QA readout: per language, exact counts of letters,
# digits, whitespace, and sentence punctuation plus the residual
# "other" class, with e6 fractions of total characters.  Pure codegen
# (regexp_count), one combinable agg.


def q_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "lang",
        "n_chars",
        F.regexp_count(F.col("text"), F.lit("[A-Za-z]")).alias("n_alpha"),
        F.regexp_count(F.col("text"), F.lit("[0-9]")).alias("n_digit"),
        F.regexp_count(F.col("text"), F.lit(r"\s")).alias("n_space"),
        F.regexp_count(F.col("text"), F.lit("[.,;:!?]")).alias("n_punct"),
    )
    agg = d.groupBy("lang").agg(
        F.sum("n_chars").alias("nc"),
        F.sum("n_alpha").alias("na"),
        F.sum("n_digit").alias("ndg"),
        F.sum("n_space").alias("nsp"),
        F.sum("n_punct").alias("npt"),
    )
    other = (
        F.col("nc") - F.col("na") - F.col("ndg") - F.col("nsp") - F.col("npt")
    )
    ncd = F.col("nc").cast("double")
    return agg.select(
        "lang",
        F.col("nc").cast("long").alias("nc"),
        F.col("na").cast("long").alias("na"),
        F.col("ndg").cast("long").alias("ndg"),
        F.col("nsp").cast("long").alias("nsp"),
        F.col("npt").cast("long").alias("npt"),
        other.cast("long").alias("noth"),
        F.floor(F.col("na").cast("double") / ncd * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("alpha_e6"),
        F.floor(F.col("nsp").cast("double") / ncd * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("space_e6"),
    ).orderBy("lang")


SQL_CHAR_CLASS = f"""
WITH d AS (
  SELECT lang, n_chars,
         len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(text, '\\s')) AS n_space,
         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
  FROM documents
), agg AS (
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS nc,
         CAST(sum(n_alpha) AS BIGINT) AS na,
         CAST(sum(n_digit) AS BIGINT) AS ndg,
         CAST(sum(n_space) AS BIGINT) AS nsp,
         CAST(sum(n_punct) AS BIGINT) AS npt
  FROM d GROUP BY 1
)
SELECT lang, nc, na, ndg, nsp, npt,
       nc - na - ndg - nsp - npt AS noth,
       CAST(floor(CAST(na AS DOUBLE) / nc * 1000000 + {_OFF}) AS BIGINT)
         AS alpha_e6,
       CAST(floor(CAST(nsp AS DOUBLE) / nc * 1000000 + {_OFF}) AS BIGINT)
         AS space_e6
FROM agg
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# sentence_length_quantiles — exact sentence-length quantiles per lang
# ---------------------------------------------------------------------------
# Sentences split on [.!?]+ runs, length = whitespace token count;
# p25/p50/p90 as EXACT inverse-CDF order statistics computed on the
# (lang, slen) COUNT table via one per-lang cumsum window — the
# wasserstein_doclen value-domain discipline: the window is bounded by
# the sentence-length DOMAIN (<= a few hundred), never by the corpus.


def q_sentence_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    sents = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.col("text"), r"[.!?]+")).alias("s")
    ).filter(F.trim("s") != "")
    sl = sents.select(
        "lang", F.size(F.split(F.trim("s"), r"\s+")).alias("slen")
    )
    cnt = sl.groupBy("lang", "slen").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy("slen")
    wn = Window.partitionBy("lang")
    cum = (
        cnt.withColumn(
            "cum", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("tot", F.sum("c").over(wn))
        .withColumn("prev", F.col("cum") - F.col("c"))
    )
    qs = cum.withColumn(
        "q_pct", F.explode(F.array(F.lit(25), F.lit(50), F.lit(90)))
    )
    k = F.expr("((tot - 1) * q_pct) div 100") + 1
    hit = qs.filter((F.col("prev") < k) & (k <= F.col("cum")))
    return hit.select(
        "lang",
        F.col("q_pct").cast("long").alias("q_pct"),
        F.col("tot").cast("long").alias("n_sents"),
        F.col("slen").cast("long").alias("slen"),
    ).orderBy("lang", "q_pct")


SQL_SENTLEN = """
WITH sents AS (
  SELECT lang, unnest(regexp_split_to_array(text, '[.!?]+')) AS s
  FROM documents
), sl AS (
  SELECT lang, len(regexp_split_to_array(trim(s), '\\s+')) AS slen
  FROM sents WHERE trim(s) <> ''
), cnt AS (
  SELECT lang, slen, count(*) AS c FROM sl GROUP BY 1, 2
), cum AS (
  SELECT lang, slen, c,
         sum(c) OVER (PARTITION BY lang ORDER BY slen) AS cum,
         sum(c) OVER (PARTITION BY lang) AS tot
  FROM cnt
), qs AS (
  SELECT lang, slen, cum, cum - c AS prev, tot, q_pct,
         ((tot - 1) * q_pct) // 100 + 1 AS k
  FROM cum, (VALUES (25), (50), (90)) q(q_pct)
)
SELECT lang, CAST(q_pct AS BIGINT) AS q_pct, CAST(tot AS BIGINT) AS n_sents,
       CAST(slen AS BIGINT) AS slen
FROM qs
WHERE prev < k AND k <= cum
ORDER BY lang, q_pct
"""


# ---------------------------------------------------------------------------
# page_hinkley — Page-Hinkley upward-drift excursion per event type
# ---------------------------------------------------------------------------
# Page (Biometrika 1954) / Hinkley (1971): m_t = sum_{i<=t} (x_i -
# xbar_i) with the RUNNING mean xbar_i = cum_i / i; the drift signal is
# the max excursion PH_T = max_t (m_t - min_{s<=t} m_s).  Everything
# rides the day-ORDERED cumulative windows (deterministic summation
# order, so both engines fold identical doubles); the alarm day is the
# earliest day attaining the floor-scaled integer max.


def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    w = Window.partitionBy("event_type").orderBy("day")
    cw = w.rowsBetween(Window.unboundedPreceding, 0)
    d = (
        daily.withColumn("i", F.row_number().over(w))
        .withColumn("cum", F.sum("c").over(cw))
    )
    d = d.withColumn(
        "dev",
        F.col("c").cast("double")
        - F.col("cum").cast("double") / F.col("i").cast("double"),
    )
    d = d.withColumn("m", F.sum("dev").over(cw))
    d = d.withColumn("mmin", F.min("m").over(cw))
    d = d.withColumn(
        "exc_e4",
        F.floor((F.col("m") - F.col("mmin")) * 10_000 + F.lit(_OFF)).cast(
            "long"
        ),
    )
    wn = Window.partitionBy("event_type")
    d = d.withColumn("mx", F.max("exc_e4").over(wn)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    top = (
        d.filter(F.col("exc_e4") == F.col("mx"))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.min("day").alias("alarm_day"),
            F.max("mx").alias("ph_e4"),
        )
    )
    return top.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("alarm_day").cast("long").alias("alarm_day"),
        F.col("ph_e4").cast("long").alias("ph_e4"),
    ).orderBy("event_type")


SQL_PAGE_HINKLEY = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day, c,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         sum(c) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM daily
), m AS (
  SELECT event_type, day,
         sum(CAST(c AS DOUBLE) - CAST(cum AS DOUBLE) / i)
           OVER (PARTITION BY event_type ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS m
  FROM d
), e AS (
  SELECT event_type, day,
         CAST(floor((m - min(m) OVER (PARTITION BY event_type ORDER BY day
                                      ROWS UNBOUNDED PRECEDING))
                    * 10000 + {_OFF}) AS BIGINT) AS exc_e4
  FROM m
), x AS (
  SELECT event_type, day, exc_e4,
         max(exc_e4) OVER (PARTITION BY event_type) AS mx,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(min(day) AS BIGINT) AS alarm_day,
       CAST(max(mx) AS BIGINT) AS ph_e4
FROM x WHERE exc_e4 = mx
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# diel_concentration — circular concentration of event times per type
# ---------------------------------------------------------------------------
# Directional statistics on the 24 h clock (Mardia & Jupp 2000):
# theta = 2*pi*sec_of_day/86400, mean resultant length Rbar =
# |sum e^{i theta}| / n (1 = a single daily spike, 0 = uniform), peak
# hour from atan2.  Angles derive from EXACT integer seconds-of-day;
# the cos/sin sums carry ~n*ulp libm noise — e6/e2 scaling leaves
# >1e5 margin (the anova grid argument, documented).


def q_diel_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _m

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        % 86_400
    ).cast("long")
    theta = sec.cast("double") * F.lit(2.0 * _m.pi / 86_400.0)
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.cos(theta)).alias("cs"),
        F.sum(F.sin(theta)).alias("sn"),
    )
    nd = F.col("n").cast("double")
    rbar = (
        F.sqrt(F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn")) / nd
    )
    hour = (
        F.atan2(F.col("sn"), F.col("cs")) * F.lit(24.0 / (2.0 * _m.pi))
        + 24.0
    ) % 24.0
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(rbar * 1_000_000 + F.lit(_OFF)).cast("long").alias("r_e6"),
        F.floor(hour * 100 + F.lit(0.5)).cast("long").alias("peak_hour_e2"),
    ).orderBy("event_type")


SQL_DIEL_CONC = f"""
WITH ev AS (
  SELECT event_type,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS DOUBLE)
         * (2.0 * pi() / 86400.0) AS theta
  FROM events
), agg AS (
  SELECT event_type, count(*) AS n,
         sum(cos(theta)) AS cs, sum(sin(theta)) AS sn
  FROM ev GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(sqrt(cs * cs + sn * sn) / n * 1000000 + {_OFF})
            AS BIGINT) AS r_e6,
       CAST(floor(((atan2(sn, cs) * (24.0 / (2.0 * pi())) + 24.0)
                   % 24.0) * 100 + 0.5) AS BIGINT) AS peak_hour_e2
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# span_leakage — verbatim 5-gram span leakage across source pairs
# ---------------------------------------------------------------------------
# The decontamination-attribution readout: which source pairs share
# VERBATIM word 5-grams (the contamination span unit — longer than
# source_containment's 3-gram profile overlap, unnormalized counts)?
# The (source, 5-gram) DISTINCT table self-joins on the SPAN (join the
# content key, never the source pair); output bounded |sources|^2.
# The synthetic corpus has zero exact-duplicate documents, so span
# granularity is where cross-source leakage actually lives.


def q_span_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        "source", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    sp = toks.select(
        "source",
        F.explode(
            F.when(
                F.size("toks") >= 5,
                F.expr(
                    "transform(sequence(1, size(toks) - 4), i -> "
                    "concat_ws(' ', toks[i-1], toks[i], toks[i+1],"
                    " toks[i+2], toks[i+3]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g5"),
    ).distinct()
    pairs = (
        sp.alias("a")
        .join(sp.alias("b"), "g5")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )
    return pairs.select(
        "sa", "sb", F.col("n_spans").cast("long").alias("n_spans")
    ).orderBy("sa", "sb")


SQL_SPAN_LEAKAGE = """
WITH t AS (
  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), sp AS (
  SELECT DISTINCT source,
         unnest(CASE WHEN len(toks) >= 5
                     THEN list_transform(generate_series(1, len(toks) - 4),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                               toks[i+2] || ' ' || toks[i+3] || ' ' ||
                               toks[i+4])
                     ELSE CAST([] AS VARCHAR[]) END) AS g5
  FROM t
)
SELECT a.source AS sa, b.source AS sb,
       CAST(count(*) AS BIGINT) AS n_spans
FROM sp a JOIN sp b ON b.g5 = a.g5 AND a.source < b.source
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# robust_scale — MAD, Rousseeuw-Croux Qn, and IQR of daily counts
# ---------------------------------------------------------------------------
# The robust scale battery per event type (Rousseeuw & Croux JASA
# 1993): MAD = median |c - med| (two exact order-stat selections), Qn
# kernel = k-th order statistic of the |c_i - c_j| pairwise distances
# with k = C(h,2), h = n//2 + 1 (pairs on the DAY GRID — the theil_sen
# bound), IQR from the same inverse-CDF rank rule as mean_excess.  All
# outputs are exact integers; the 2.2219 consistency factor is left to
# the consumer (documented) so the query stays integer-exact.


def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
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

    def order_stat(df, col, rank_expr, out):
        w = Window.partitionBy("event_type").orderBy(col)
        r = df.withColumn("rk", F.row_number().over(w)).withColumn(
            "nn", F.count(F.lit(1)).over(wn)
        )
        return r.filter(F.col("rk") == rank_expr).select(
            "event_type", F.col(col).alias(out)
        )

    med_rank = F.floor((F.col("nn") - 1) / 2) + 1
    med = order_stat(daily, "c", med_rank, "med")
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("c") - F.col("med"))
    )
    mad = order_stat(dev, "ad", med_rank, "mad")
    q1 = order_stat(daily, "c", F.expr("((nn - 1) * 25) div 100") + 1, "q1")
    q3 = order_stat(daily, "c", F.expr("((nn - 1) * 75) div 100") + 1, "q3")
    a = daily.alias("a")
    b = daily.alias("b")
    dist = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.abs(F.col("b.c") - F.col("a.c")).alias("d"),
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    dd = dist.withColumn("rk", F.row_number().over(wd)).join(
        F.broadcast(nd), "event_type"
    )
    h = F.expr("n div 2") + 1
    kq = (h * (h - 1)) / 2
    qn = dd.filter(F.col("rk") == kq).select(
        "event_type", F.col("d").alias("qn"), "n"
    )
    out = (
        qn.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .join(F.broadcast(q1), "event_type")
        .join(F.broadcast(q3), "event_type")
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("med").cast("long").alias("med"),
        F.col("mad").cast("long").alias("mad"),
        F.col("qn").cast("long").alias("qn"),
        (F.col("q3") - F.col("q1")).cast("long").alias("iqr"),
    ).orderBy("event_type")


SQL_ROBUST_SCALE = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, day, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM daily
), med AS (
  SELECT event_type, c AS med FROM r WHERE rk = (nn - 1) // 2 + 1
), q1 AS (
  SELECT event_type, c AS q1 FROM r WHERE rk = ((nn - 1) * 25) // 100 + 1
), q3 AS (
  SELECT event_type, c AS q3 FROM r WHERE rk = ((nn - 1) * 75) // 100 + 1
), dev AS (
  SELECT daily.event_type, abs(daily.c - med.med) AS ad
  FROM daily JOIN med ON med.event_type = daily.event_type
), rd AS (
  SELECT event_type, ad,
         row_number() OVER (PARTITION BY event_type ORDER BY ad) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM dev
), mad AS (
  SELECT event_type, ad AS mad FROM rd WHERE rk = (nn - 1) // 2 + 1
), nper AS (
  SELECT event_type, count(*) AS n FROM daily GROUP BY 1
), dist AS (
  SELECT a.event_type, abs(b.c - a.c) AS d
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.day > a.day
), rr AS (
  SELECT dist.event_type, d,
         row_number() OVER (PARTITION BY dist.event_type ORDER BY d) AS rk,
         n
  FROM dist JOIN nper ON nper.event_type = dist.event_type
), qn AS (
  SELECT event_type, d AS qn, n FROM rr
  WHERE rk = ((n // 2 + 1) * (n // 2)) // 2
)
SELECT qn.event_type, CAST(qn.n AS BIGINT) AS n,
       CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
       CAST(qn AS BIGINT) AS qn, CAST(q3 - q1 AS BIGINT) AS iqr
FROM qn
JOIN med ON med.event_type = qn.event_type
JOIN mad ON mad.event_type = qn.event_type
JOIN q1 ON q1.event_type = qn.event_type
JOIN q3 ON q3.event_type = qn.event_type
ORDER BY qn.event_type
"""


# ---------------------------------------------------------------------------
# wilson_ci — Wilson score interval for the night-event share per type
# ---------------------------------------------------------------------------
# Wilson (JASA 1927): the CI that behaves at extreme proportions —
# p_w = (p + z^2/2n ± z*sqrt(p(1-p)/n + z^2/4n^2)) / (1 + z^2/n) with
# z = 1.96 as the same literal on both engines.  Night = hour in
# [0, 6); counts exact, the interval one double expression.


def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = ev.select(
        "event_type",
        (F.hour(F.col("ts").cast("timestamp")) < 6).cast("long").alias(
            "night"
        ),
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("night").alias("k")
    )
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    z = F.lit(1.96)
    z2n = z * z / nd
    center = (p + z2n / 2) / (1 + z2n)
    half = (
        z
        * F.sqrt(p * (1 - p) / nd + z * z / (4 * nd * nd))
        / (1 + z2n)
    )
    return agg.filter(F.col("n") > 0).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.floor(p * 1_000_000 + F.lit(_OFF)).cast("long").alias("p_e6"),
        F.floor((center - half) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("lo_e6"),
        F.floor((center + half) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("hi_e6"),
    ).orderBy("event_type")


SQL_WILSON = f"""
WITH d AS (
  SELECT event_type,
         CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END AS night
  FROM events
), agg AS (
  SELECT event_type, count(*) AS n, CAST(sum(night) AS BIGINT) AS k
  FROM d GROUP BY 1
), t AS (
  SELECT event_type, n, k,
         CAST(k AS DOUBLE) / n AS p,
         1.96 * 1.96 / n AS z2n
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n, k,
       CAST(floor(p * 1000000 + {_OFF}) AS BIGINT) AS p_e6,
       CAST(floor(((p + z2n / 2) / (1 + z2n)
                   - 1.96 * sqrt(p * (1 - p) / n
                                 + 1.96 * 1.96 / (4.0 * n * n)) / (1 + z2n))
                  * 1000000 + {_OFF}) AS BIGINT) AS lo_e6,
       CAST(floor(((p + z2n / 2) / (1 + z2n)
                   + 1.96 * sqrt(p * (1 - p) / n
                                 + 1.96 * 1.96 / (4.0 * n * n)) / (1 + z2n))
                  * 1000000 + {_OFF}) AS BIGINT) AS hi_e6
FROM t
WHERE n > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# streak_stats — above-median run structure of daily counts per type
# ---------------------------------------------------------------------------
# The streak readout behind runs_test: longest above-median run,
# longest below-or-equal run, and the run count, via the classic
# gaps-and-islands double row_number difference — all exact integers,
# one per-type sort exchange shared by both window chains.


def q_streak_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lab = daily.join(F.broadcast(med), "event_type").withColumn(
        "up", (F.col("c") > F.col("med")).cast("long")
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    wg = Window.partitionBy("event_type", "up").orderBy("day")
    isl = lab.withColumn(
        "grp", F.row_number().over(wd) - F.row_number().over(wg)
    )
    runs = isl.groupBy("event_type", "up", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    agg = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max(F.when(F.col("up") == 1, F.col("len"))).alias("max_up"),
        F.max(F.when(F.col("up") == 0, F.col("len"))).alias("max_down"),
    )
    return agg.select(
        "event_type",
        F.col("n_runs").cast("long").alias("n_runs"),
        F.coalesce(F.col("max_up"), F.lit(0)).cast("long").alias("max_up"),
        F.coalesce(F.col("max_down"), F.lit(0)).cast("long").alias(
            "max_down"
        ),
    ).orderBy("event_type")


SQL_STREAKS = """
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
), lab AS (
  SELECT daily.event_type, daily.day,
         CASE WHEN daily.c > med.med THEN 1 ELSE 0 END AS up
  FROM daily JOIN med ON med.event_type = daily.event_type
), isl AS (
  SELECT event_type, up,
         row_number() OVER (PARTITION BY event_type ORDER BY day)
         - row_number() OVER (PARTITION BY event_type, up ORDER BY day)
           AS grp
  FROM lab
), runs AS (
  SELECT event_type, up, grp, count(*) AS len
  FROM isl GROUP BY 1, 2, 3
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_runs,
       CAST(coalesce(max(CASE WHEN up = 1 THEN len END), 0) AS BIGINT)
         AS max_up,
       CAST(coalesce(max(CASE WHEN up = 0 THEN len END), 0) AS BIGINT)
         AS max_down
FROM runs GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ks_doclen — exact two-sample KS distance between language length mixes
# ---------------------------------------------------------------------------
# sup_x |F_a - F_b| kept EXACT on the shared support grid: D * n_a *
# n_b = max over support of |cum_a * n_b - cum_b * n_a| — every factor
# a BIGINT (the wasserstein_doclen scaffold with max instead of the
# gap-weighted sum).  Complements wasserstein (mass transport) with
# the sup-norm readout ks_drift uses on events.


def q_ks_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("lang", "n_chars")
    cnt = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    support = cnt.select("n_chars").distinct()
    langs = cnt.select("lang").distinct()
    grid = langs.crossJoin(support)
    w = Window.partitionBy("lang").orderBy("n_chars")
    cum = (
        grid.join(cnt, ["lang", "n_chars"], "left")
        .fillna(0, subset=["c"])
        .withColumn(
            "cum",
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("tot", F.sum("c").over(Window.partitionBy("lang")))
    )
    a = cum.select(
        F.col("lang").alias("la"),
        "n_chars",
        F.col("cum").alias("cum_a"),
        F.col("tot").alias("n_a"),
    )
    b = cum.select(
        F.col("lang").alias("lb"),
        "n_chars",
        F.col("cum").alias("cum_b"),
        F.col("tot").alias("n_b"),
    )
    j = a.join(b, "n_chars").filter(F.col("la") < F.col("lb"))
    term = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    )
    agg = j.groupBy("la", "lb").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(term).alias("m"),
    )
    ks = F.col("m").cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return agg.select(
        "la",
        "lb",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("m").cast("long").alias("m"),
        F.floor(ks * 1_000_000 + F.lit(_OFF)).cast("long").alias("ks_e6"),
    ).orderBy("la", "lb")


SQL_KS_DOCLEN = f"""
WITH cnt AS (
  SELECT lang, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
), support AS (
  SELECT DISTINCT n_chars FROM cnt
), langs AS (
  SELECT DISTINCT lang FROM cnt
), grid AS (
  SELECT langs.lang, support.n_chars FROM langs, support
), cum AS (
  SELECT grid.lang, grid.n_chars,
         sum(coalesce(cnt.c, 0))
           OVER (PARTITION BY grid.lang ORDER BY grid.n_chars) AS cum,
         sum(coalesce(cnt.c, 0)) OVER (PARTITION BY grid.lang) AS tot
  FROM grid
  LEFT JOIN cnt ON cnt.lang = grid.lang AND cnt.n_chars = grid.n_chars
), j AS (
  SELECT a.lang AS la, b.lang AS lb,
         max(a.tot) AS n_a, max(b.tot) AS n_b,
         max(abs(a.cum * b.tot - b.cum * a.tot)) AS m
  FROM cum a JOIN cum b ON b.n_chars = a.n_chars AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT la, lb, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(m AS BIGINT) AS m,
       CAST(floor(CAST(m AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)
                  * 1000000 + {_OFF}) AS BIGINT) AS ks_e6
FROM j
ORDER BY la, lb
"""


# ---------------------------------------------------------------------------
# cliffs_delta — ordinal day/night effect size per event type
# ---------------------------------------------------------------------------
# Cliff (Psych. Bull. 1993): delta = (#(x>y) - #(x<y)) / (n*m) over
# day-values x and night-values y — the effect-size companion to
# mann_whitney_daynight, kept EXACT via the value-domain CDF trick:
# #(x>y) = sum over night values of cum_day(<v), all BIGINTs on the
# centivalue grid.


def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.hour(F.col("ts").cast("timestamp")) < 6).cast("long").alias(
            "night"
        ),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).alias("v"),
    )
    cnt = ev.groupBy("event_type", "night", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    day = cnt.filter(F.col("night") == 0).select(
        "event_type", "v", F.col("c").alias("cd")
    )
    night = cnt.filter(F.col("night") == 1).select(
        "event_type", "v", F.col("c").alias("cn")
    )
    support = cnt.select("event_type", "v").distinct()
    w = Window.partitionBy("event_type").orderBy("v")
    g = (
        support.join(day, ["event_type", "v"], "left")
        .join(night, ["event_type", "v"], "left")
        .fillna(0, subset=["cd", "cn"])
        .withColumn(
            "cum_d",
            F.sum("cd").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "cum_n",
            F.sum("cn").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    # gt = sum over day rows of (count_day at v) * (night strictly below v)
    agg = g.groupBy("event_type").agg(
        F.sum("cd").alias("n_day"),
        F.sum("cn").alias("n_night"),
        F.sum(F.col("cd") * (F.col("cum_n") - F.col("cn"))).alias("gt"),
        F.sum(F.col("cn") * (F.col("cum_d") - F.col("cd"))).alias("lt"),
    )
    delta = (F.col("gt") - F.col("lt")).cast("double") / (
        F.col("n_day").cast("double") * F.col("n_night").cast("double")
    )
    return (
        agg.filter((F.col("n_day") > 0) & (F.col("n_night") > 0))
        .select(
            "event_type",
            F.col("n_day").cast("long").alias("n_day"),
            F.col("n_night").cast("long").alias("n_night"),
            F.col("gt").cast("long").alias("gt"),
            F.col("lt").cast("long").alias("lt"),
            F.floor(delta * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "delta_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_CLIFFS = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END AS night,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cnt AS (
  SELECT event_type, night, v, count(*) AS c FROM ev GROUP BY 1, 2, 3
), sup AS (
  SELECT DISTINCT event_type, v FROM cnt
), g AS (
  SELECT sup.event_type, sup.v,
         coalesce(d.c, 0) AS cd, coalesce(n.c, 0) AS cn
  FROM sup
  LEFT JOIN cnt d ON d.event_type = sup.event_type AND d.v = sup.v
                 AND d.night = 0
  LEFT JOIN cnt n ON n.event_type = sup.event_type AND n.v = sup.v
                 AND n.night = 1
), cum AS (
  SELECT event_type, v, cd, cn,
         sum(cd) OVER (PARTITION BY event_type ORDER BY v) AS cum_d,
         sum(cn) OVER (PARTITION BY event_type ORDER BY v) AS cum_n
  FROM g
), agg AS (
  SELECT event_type,
         CAST(sum(cd) AS BIGINT) AS n_day,
         CAST(sum(cn) AS BIGINT) AS n_night,
         CAST(sum(cd * (cum_n - cn)) AS BIGINT) AS gt,
         CAST(sum(cn * (cum_d - cd)) AS BIGINT) AS lt
  FROM cum GROUP BY 1
)
SELECT event_type, n_day, n_night, gt, lt,
       CAST(floor(CAST(gt - lt AS DOUBLE)
                  / (CAST(n_day AS DOUBLE) * n_night) * 1000000 + {_OFF})
            AS BIGINT) AS delta_e6
FROM agg
WHERE n_day > 0 AND n_night > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# hedges_g — weekday/weekend standardized effect size per event type
# ---------------------------------------------------------------------------
# Cohen's d with the Hedges (1981) small-sample correction J = 1 -
# 3/(4*df - 1) on daily counts: pooled SD from the exact integer sums,
# the whole statistic one double expression.


def q_hedges_g(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    daily = daily.withColumn(
        "wkend", (((F.col("day") + 3) % 7) >= 5).cast("long")
    )
    g = daily.groupBy("event_type", "wkend").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    a = g.filter(F.col("wkend") == 0).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("q").alias("q1"),
    )
    b = g.filter(F.col("wkend") == 1).select(
        "event_type",
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("q").alias("q2"),
    )
    j = a.join(b, "event_type")
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    ss1 = F.col("q1").cast("double") - F.col("s1").cast("double") * F.col(
        "s1"
    ) / n1d
    ss2 = F.col("q2").cast("double") - F.col("s2").cast("double") * F.col(
        "s2"
    ) / n2d
    sp = F.sqrt((ss1 + ss2) / (n1d + n2d - 2))
    d = (F.col("s1") / n1d - F.col("s2") / n2d) / sp
    corr = 1.0 - 3.0 / (4.0 * (n1d + n2d - 2) - 1.0)
    return (
        j.filter((F.col("n1") >= 2) & (F.col("n2") >= 2) & (ss1 + ss2 > 0))
        .select(
            "event_type",
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.floor(d * 10_000 + F.lit(_OFF)).cast("long").alias("d_e4"),
            F.floor(d * corr * 10_000 + F.lit(_OFF)).cast("long").alias(
                "g_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_HEDGES = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), lab AS (
  SELECT event_type, c,
         CASE WHEN (day + 3) % 7 >= 5 THEN 1 ELSE 0 END AS wkend
  FROM daily
), g AS (
  SELECT event_type, wkend, count(*) AS n,
         CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
  FROM lab GROUP BY 1, 2
), j AS (
  SELECT a.event_type,
         a.n AS n1, a.s AS s1, a.q AS q1,
         b.n AS n2, b.s AS s2, b.q AS q2
  FROM g a JOIN g b ON b.event_type = a.event_type
  WHERE a.wkend = 0 AND b.wkend = 1
), t AS (
  SELECT event_type, n1, n2,
         (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
         / sqrt(((q1 - CAST(s1 AS DOUBLE) * s1 / n1)
                 + (q2 - CAST(s2 AS DOUBLE) * s2 / n2))
                / (CAST(n1 AS DOUBLE) + n2 - 2)) AS d,
         (q1 - CAST(s1 AS DOUBLE) * s1 / n1)
         + (q2 - CAST(s2 AS DOUBLE) * s2 / n2) AS sstot
  FROM j
)
SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(floor(d * 10000 + {_OFF}) AS BIGINT) AS d_e4,
       CAST(floor(d * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + n2 - 2) - 1.0))
                  * 10000 + {_OFF}) AS BIGINT) AS g_e4
FROM t
WHERE n1 >= 2 AND n2 >= 2 AND sstot > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# quantile_shape — Bowley skewness and Moors kurtosis from exact octiles
# ---------------------------------------------------------------------------
# Quantile-based robust shape (Bowley 1920; Moors 1988): skew =
# (q3 + q1 - 2*q2)/(q3 - q1) from quartiles, kurtosis = ((e7 - e5) +
# (e3 - e1))/(e6 - e2) from octiles — every quantile an exact
# inverse-CDF order statistic of centivalues, the ratios exact-integer
# divisions.


def q_quantile_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(_OFF)).alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    r = ev.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    oct_ = r.withColumn(
        "q_oct",
        F.explode(F.array(*[F.lit(i) for i in range(1, 8)])),
    )
    hit = oct_.filter(
        F.col("rk") == F.expr("((nn - 1) * q_oct) div 8") + 1
    ).select("event_type", "q_oct", F.col("v").alias("qv"), "nn")
    piv = hit.groupBy("event_type").pivot(
        "q_oct", list(range(1, 8))
    ).agg(F.max("qv"))
    piv = piv.join(
        F.broadcast(
            r.groupBy("event_type").agg(F.max("nn").alias("n"))
        ),
        "event_type",
    )
    e = {i: F.col(str(i)) for i in range(1, 8)}
    bowley = (
        (e[6] + e[2] - 2 * e[4]).cast("double")
        / (e[6] - e[2]).cast("double")
    )
    moors = (
        ((e[7] - e[5]) + (e[3] - e[1])).cast("double")
        / (e[6] - e[2]).cast("double")
    )
    return (
        piv.filter(e[6] - e[2] > 0)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            e[2].cast("long").alias("q1"),
            e[4].cast("long").alias("q2"),
            e[6].cast("long").alias("q3"),
            F.floor(bowley * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "bowley_e6"
            ),
            F.floor(moors * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "moors_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_QSHAPE = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM ev
), hit AS (
  SELECT event_type, q_oct, v AS qv, nn
  FROM r, (VALUES (1), (2), (3), (4), (5), (6), (7)) q(q_oct)
  WHERE rk = ((nn - 1) * q_oct) // 8 + 1
), piv AS (
  SELECT event_type, max(nn) AS n,
         max(CASE WHEN q_oct = 1 THEN qv END) AS e1,
         max(CASE WHEN q_oct = 2 THEN qv END) AS e2,
         max(CASE WHEN q_oct = 3 THEN qv END) AS e3,
         max(CASE WHEN q_oct = 4 THEN qv END) AS e4,
         max(CASE WHEN q_oct = 5 THEN qv END) AS e5,
         max(CASE WHEN q_oct = 6 THEN qv END) AS e6,
         max(CASE WHEN q_oct = 7 THEN qv END) AS e7
  FROM hit GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(e2 AS BIGINT) AS q1, CAST(e4 AS BIGINT) AS q2,
       CAST(e6 AS BIGINT) AS q3,
       CAST(floor(CAST(e6 + e2 - 2 * e4 AS DOUBLE) / (e6 - e2)
                  * 1000000 + {_OFF}) AS BIGINT) AS bowley_e6,
       CAST(floor(CAST((e7 - e5) + (e3 - e1) AS DOUBLE) / (e6 - e2)
                  * 1000000 + {_OFF}) AS BIGINT) AS moors_e6
FROM piv
WHERE e6 - e2 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# source_lang_purity — majority-language share and entropy per source
# ---------------------------------------------------------------------------
# The curation routing readout: is a source monolingual?  Majority
# share exact; entropy over the <=|langs| cells (bounded ln terms);
# the majority lang picked by (count desc, lang asc) — deterministic.


def q_source_lang_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _documents(spark, sf_dir).groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("lang"))
    wn = Window.partitionBy("source")
    t = (
        cells.withColumn("rk", F.row_number().over(w))
        .withColumn("tot", F.sum("c").over(wn))
        .withColumn("k", F.count(F.lit(1)).over(wn))
    )
    p = F.col("c").cast("double") / F.col("tot").cast("double")
    ent = t.groupBy("source").agg(
        F.max("tot").alias("tot"),
        F.max("k").alias("k"),
        F.sum(-p * F.log(p)).alias("h"),
    )
    top = t.filter(F.col("rk") == 1).select(
        "source",
        F.col("lang").alias("major_lang"),
        F.col("c").alias("major_c"),
    )
    j = ent.join(top, "source")
    share = F.col("major_c").cast("double") / F.col("tot").cast("double")
    return j.select(
        "source",
        F.col("tot").cast("long").alias("n_docs"),
        F.col("k").cast("long").alias("n_langs"),
        "major_lang",
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "purity_e6"
        ),
        F.floor(F.col("h") * 10_000 + F.lit(0.5)).cast("long").alias(
            "entropy_e4"
        ),
    ).orderBy("source")


SQL_LANG_PURITY = f"""
WITH cells AS (
  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
), t AS (
  SELECT source, lang, c,
         row_number() OVER (PARTITION BY source ORDER BY c DESC, lang ASC)
           AS rk,
         sum(c) OVER (PARTITION BY source) AS tot,
         count(*) OVER (PARTITION BY source) AS k
  FROM cells
), ent AS (
  SELECT source, CAST(max(tot) AS BIGINT) AS tot,
         CAST(max(k) AS BIGINT) AS k,
         sum(-(CAST(c AS DOUBLE) / tot) * ln(CAST(c AS DOUBLE) / tot)) AS h
  FROM t GROUP BY 1
), top AS (
  SELECT source, lang AS major_lang, c AS major_c FROM t WHERE rk = 1
)
SELECT ent.source, tot AS n_docs, k AS n_langs, major_lang,
       CAST(floor(CAST(major_c AS DOUBLE) / tot * 1000000 + {_OFF})
            AS BIGINT) AS purity_e6,
       CAST(floor(h * 10000 + 0.5) AS BIGINT) AS entropy_e4
FROM ent JOIN top ON top.source = ent.source
ORDER BY ent.source
"""


# ---------------------------------------------------------------------------
# staleness_quantiles — user staleness distribution per event type
# ---------------------------------------------------------------------------
# Operational freshness: staleness = global max day - user's last
# active day for that type; p50/p90/max as exact inverse-CDF order
# statistics over the per-user last-day table (user-cardinality, not
# event-cardinality).


def q_staleness_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
    ).cast("long")
    last = ev.select("event_type", "user_id", day.alias("day")).groupBy(
        "event_type", "user_id"
    ).agg(F.max("day").alias("last_day"))
    gmax = last.groupBy().agg(F.max("last_day").alias("gmax"))
    st = last.crossJoin(F.broadcast(gmax)).withColumn(
        "stale", F.col("gmax") - F.col("last_day")
    )
    w = Window.partitionBy("event_type").orderBy("stale", "user_id")
    wn = Window.partitionBy("event_type")
    r = st.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    qs = r.withColumn(
        "q_pct", F.explode(F.array(F.lit(50), F.lit(90), F.lit(100)))
    )
    hit = qs.filter(
        F.col("rk") == F.expr("((nn - 1) * q_pct) div 100") + 1
    )
    return hit.select(
        "event_type",
        F.col("q_pct").cast("long").alias("q_pct"),
        F.col("nn").cast("long").alias("n_users"),
        F.col("stale").cast("long").alias("stale_days"),
    ).orderBy("event_type", "q_pct")


SQL_STALENESS = """
WITH last AS (
  SELECT event_type, user_id,
         max(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS last_day
  FROM events GROUP BY 1, 2
), g AS (
  SELECT (SELECT max(last_day) FROM last) - last_day AS stale,
         event_type, user_id
  FROM last
), r AS (
  SELECT event_type, stale,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY stale, user_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM g
)
SELECT event_type, CAST(q_pct AS BIGINT) AS q_pct,
       CAST(nn AS BIGINT) AS n_users, CAST(stale AS BIGINT) AS stale_days
FROM r, (VALUES (50), (90), (100)) q(q_pct)
WHERE rk = ((nn - 1) * q_pct) // 100 + 1
ORDER BY event_type, q_pct
"""


# ---------------------------------------------------------------------------
# type_corr_matrix — pairwise Pearson correlation of daily count series
# ---------------------------------------------------------------------------
# Co-movement of event types: daily counts joined pairwise on the DAY
# (grid-bounded self-join, the theil_sen argument); all five Pearson
# sums exact BIGINTs, r one expression.  Days missing for either type
# are excluded pairwise (complete-case).


def q_type_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    a = daily.alias("a")
    b = daily.alias("b")
    p = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("ta"),
        F.col("b.event_type").alias("tb"),
        F.col("a.c").alias("x"),
        F.col("b.c").alias("y"),
    )
    agg = p.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    r = num / F.sqrt(dx * dy)
    return (
        agg.filter((F.col("n") >= 5) & (dx > 0) & (dy > 0))
        .select(
            "ta",
            "tb",
            F.col("n").cast("long").alias("n"),
            F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias("r_e6"),
        )
        .orderBy("ta", "tb")
    )


SQL_TYPE_CORR = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY 1, 2
), p AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.c AS x, b.c AS y
  FROM daily a
  JOIN daily b ON b.day = a.day AND a.event_type < b.event_type
), agg AS (
  SELECT ta, tb, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM p GROUP BY 1, 2
)
SELECT ta, tb, CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * (n * syy - sy * sy))
                  * 1000000 + {_OFF}) AS BIGINT) AS r_e6
FROM agg
WHERE n >= 5 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY ta, tb
"""


# ---------------------------------------------------------------------------
# split_half_reliability — odd/even-day hourly-profile reliability
# ---------------------------------------------------------------------------
# Classical test theory applied to diel profiles: build each type's
# 24-bin hourly count profile separately from ODD and EVEN days,
# Pearson-correlate the halves (24 exact-integer pairs), then
# Spearman-Brown step up r_full = 2r/(1+r) (Spearman 1910; Brown
# 1910).  High reliability = the diel shape is signal, not noise.


def q_split_half_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    d = ev.select(
        "event_type",
        F.hour(ts).cast("long").alias("hr"),
        (
            F.floor(F.unix_micros(ts) / 86_400_000_000) % 2 == 0
        ).cast("long").alias("even"),
    )
    prof = d.groupBy("event_type", "hr").agg(
        F.sum(F.when(F.col("even") == 1, 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("even") == 0, 1).otherwise(0)).alias("y"),
    )
    agg = prof.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    r = num / F.sqrt(dx * dy)
    sb = 2.0 * r / (1.0 + r)
    return (
        agg.filter((dx > 0) & (dy > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_bins"),
            F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "r_half_e6"
            ),
            F.floor(sb * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "r_full_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_SPLIT_HALF = f"""
WITH d AS (
  SELECT event_type, hour(ts) AS hr,
         CASE WHEN CAST(floor(epoch(ts) / 86400) AS BIGINT) % 2 = 0
              THEN 1 ELSE 0 END AS even
  FROM events
), prof AS (
  SELECT event_type, hr,
         CAST(sum(even) AS BIGINT) AS x,
         CAST(sum(1 - even) AS BIGINT) AS y
  FROM d GROUP BY 1, 2
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM prof GROUP BY 1
), t AS (
  SELECT event_type, n,
         CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy))
           AS r,
         n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n_bins,
       CAST(floor(r * 1000000 + {_OFF}) AS BIGINT) AS r_half_e6,
       CAST(floor(2.0 * r / (1.0 + r) * 1000000 + {_OFF}) AS BIGINT)
         AS r_full_e6
FROM t
WHERE dx > 0 AND dy > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# lognormal_fit — lognormal MLE + KS goodness-of-fit on doc lengths
# ---------------------------------------------------------------------------
# mu/sigma are the ln-moment MLEs, QUANTIZED to e4 integers BEFORE the
# KS stage (the CUPED discipline) so both engines evaluate the fitted
# CDF at IDENTICAL parameters; Phi via the same A&S 7.1.26 polynomial
# as bh_fdr_runs, extended to both signs (Phi(z) = 1 - up(z) for z>=0,
# up(-z) otherwise).  The sup runs over the (lang, n_chars) support
# grid (domain-bounded windows, the wasserstein discipline).

from diive_spark.queries_stats4 import _AS_B, _AS_P, _INV_SQRT_2PI, _phi_upper


def _phi_cdf(z):
    up = _phi_upper(F.abs(z))
    return F.when(z >= 0, 1.0 - up).otherwise(up)


def q_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("lang", "n_chars").filter(
        F.col("n_chars") > 0
    )
    lx = F.log(F.col("n_chars").cast("double"))
    mom = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lx).alias("m1"),
        F.sum(lx * lx).alias("m2"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("m1") / nd
    var = F.col("m2") / nd - mu * mu
    params = mom.filter(var > 0).select(
        "lang",
        "n",
        F.floor(mu * 10_000 + F.lit(0.5)).cast("long").alias("mu_e4"),
        F.floor(F.sqrt(var) * 10_000 + F.lit(0.5)).cast("long").alias(
            "sigma_e4"
        ),
    )
    cnt = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy("n_chars")
    cum = cnt.withColumn(
        "cum", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    j = cum.join(F.broadcast(params), "lang")
    z = (
        F.log(F.col("n_chars").cast("double"))
        - F.col("mu_e4").cast("double") / 10_000.0
    ) / (F.col("sigma_e4").cast("double") / 10_000.0)
    dks = F.greatest(
        F.abs(F.col("cum").cast("double") / F.col("n") - _phi_cdf(z)),
        F.abs(
            (F.col("cum") - F.col("c")).cast("double") / F.col("n")
            - _phi_cdf(z)
        ),
    )
    agg = j.groupBy("lang").agg(
        F.max("n").alias("n"),
        F.max("mu_e4").alias("mu_e4"),
        F.max("sigma_e4").alias("sigma_e4"),
        F.max(dks).alias("ks"),
    )
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        "mu_e4",
        "sigma_e4",
        F.floor(F.col("ks") * 10_000 + F.lit(0.5)).cast("long").alias(
            "ks_e4"
        ),
    ).orderBy("lang")


def _sql_lognormal() -> str:
    b = _AS_B
    phi_up = (
        f"{_INV_SQRT_2PI} * exp(-(az * az) / 2.0)"
        f" * ({b[0]!r} * tt + {b[1]!r} * tt * tt + {b[2]!r} * tt * tt * tt"
        f" + {b[3]!r} * tt * tt * tt * tt"
        f" + {b[4]!r} * tt * tt * tt * tt * tt)"
    )
    return f"""
WITH d AS (
  SELECT lang, n_chars FROM documents WHERE n_chars > 0
), mom AS (
  SELECT lang, count(*) AS n,
         sum(ln(CAST(n_chars AS DOUBLE))) AS m1,
         sum(ln(CAST(n_chars AS DOUBLE)) * ln(CAST(n_chars AS DOUBLE)))
           AS m2
  FROM d GROUP BY 1
), params AS (
  SELECT lang, n,
         CAST(floor(m1 / n * 10000 + 0.5) AS BIGINT) AS mu_e4,
         CAST(floor(sqrt(m2 / n - (m1 / n) * (m1 / n)) * 10000 + 0.5)
              AS BIGINT) AS sigma_e4
  FROM mom
  WHERE m2 / n - (m1 / n) * (m1 / n) > 0
), cnt AS (
  SELECT lang, n_chars, count(*) AS c FROM d GROUP BY 1, 2
), cum AS (
  SELECT lang, n_chars, c,
         sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum
  FROM cnt
), zt AS (
  SELECT cum.lang, cum.c, cum.cum, params.n, params.mu_e4, params.sigma_e4,
         (ln(CAST(cum.n_chars AS DOUBLE)) - CAST(mu_e4 AS DOUBLE) / 10000.0)
         / (CAST(sigma_e4 AS DOUBLE) / 10000.0) AS z
  FROM cum JOIN params ON params.lang = cum.lang
), pt AS (
  SELECT lang, c, cum, n, mu_e4, sigma_e4,
         CASE WHEN z >= 0 THEN 1.0 - {phi_up} ELSE {phi_up} END AS fhat
  FROM (
    SELECT *, abs(z) AS az, 1.0 / (1.0 + {_AS_P!r} * abs(z)) AS tt
    FROM zt
  )
)
SELECT lang, CAST(max(n) AS BIGINT) AS n,
       max(mu_e4) AS mu_e4, max(sigma_e4) AS sigma_e4,
       CAST(floor(max(greatest(abs(CAST(cum AS DOUBLE) / n - fhat),
                               abs(CAST(cum - c AS DOUBLE) / n - fhat)))
                  * 10000 + 0.5) AS BIGINT) AS ks_e4
FROM pt
GROUP BY 1
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# user_concentration — top-1% user share and activity entropy per type
# ---------------------------------------------------------------------------
# Activity concentration: the share of events contributed by the top
# max(1, n_users//100) users (exact rank on (count desc, user asc))
# plus the Shannon entropy of the user distribution — the headline
# readout on top of lorenz_curve/gini.


def q_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("c"), F.asc("user_id")
    )
    wn = Window.partitionBy("event_type")
    r = (
        per.withColumn("rk", F.row_number().over(w))
        .withColumn("nu", F.count(F.lit(1)).over(wn))
        .withColumn("tot", F.sum("c").over(wn))
    )
    k = F.greatest(F.lit(1), F.expr("nu div 100"))
    p = F.col("c").cast("double") / F.col("tot").cast("double")
    agg = r.groupBy("event_type").agg(
        F.max("nu").alias("n_users"),
        F.max("tot").alias("n_events"),
        F.max(k).alias("k"),
        F.sum(F.when(F.col("rk") <= k, F.col("c")).otherwise(F.lit(0))).alias(
            "top_c"
        ),
        F.sum(-p * F.log(p)).alias("h"),
    )
    share = F.col("top_c").cast("double") / F.col("n_events").cast("double")
    return agg.select(
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("k").cast("long").alias("k"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "top_share_e6"
        ),
        F.floor(F.col("h") * 10_000 + F.lit(0.5)).cast("long").alias(
            "entropy_e4"
        ),
    ).orderBy("event_type")


SQL_USER_CONC = f"""
WITH per AS (
  SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY c DESC, user_id ASC) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nu,
         sum(c) OVER (PARTITION BY event_type) AS tot
  FROM per
)
SELECT event_type,
       CAST(max(nu) AS BIGINT) AS n_users,
       CAST(max(tot) AS BIGINT) AS n_events,
       CAST(max(greatest(1, nu // 100)) AS BIGINT) AS k,
       CAST(floor(CAST(sum(CASE WHEN rk <= greatest(1, nu // 100)
                                THEN c ELSE 0 END) AS DOUBLE)
                  / max(tot) * 1000000 + {_OFF}) AS BIGINT)
         AS top_share_e6,
       CAST(floor(sum(-(CAST(c AS DOUBLE) / tot)
                      * ln(CAST(c AS DOUBLE) / tot)) * 10000 + 0.5)
            AS BIGINT) AS entropy_e4
FROM r
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# nelson_aalen — cumulative hazard on the survival_km lifetime table
# ---------------------------------------------------------------------------
# Nelson (1972) / Aalen (1978): H(t) = sum_{t_i <= t} d_i / n_i and
# its variance estimate sum d_i / n_i^2 — the hazard-scale companion
# to survival_km, sharing its exact lifetime/censoring construction
# (7-day censoring window) and the time-ORDERED cumulative fold.


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        .cast("long")
        .alias("day"),
    )
    ut = ev.groupBy("user_id", "event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    horizon = ut.groupBy("user_id").agg(F.max("d1").alias("ud1"))
    u = ut.join(horizon, "user_id").select(
        (F.col("d1") - F.col("d0")).alias("life"),
        (F.col("d1") <= F.col("ud1") - 7).cast("long").alias("observed"),
    )
    per_t = u.groupBy("life").agg(
        F.count(F.lit(1)).alias("n_at"), F.sum("observed").alias("d")
    )
    w_risk = Window.orderBy("life").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("life").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    na = (
        per_t.withColumn("n_risk", F.sum("n_at").over(w_risk))
        .withColumn(
            "hterm",
            F.col("d").cast("double") / F.col("n_risk").cast("double"),
        )
        .withColumn(
            "vterm",
            F.col("d").cast("double")
            / (F.col("n_risk").cast("double") * F.col("n_risk")),
        )
        .withColumn("h", F.sum("hterm").over(w_cum))
        .withColumn("v", F.sum("vterm").over(w_cum))
    )
    return (
        na.filter(F.col("d") > 0)
        .select(
            F.col("life").cast("long").alias("life_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.floor(F.col("h") * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("h_e6"),
            F.floor(F.col("v") * 1_000_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("var_e9"),
        )
        .orderBy("life_days")
    )


SQL_NELSON_AALEN = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), ut AS (
  SELECT user_id, event_type, min(day) AS d0, max(day) AS d1
  FROM ev GROUP BY 1, 2
), horizon AS (
  SELECT user_id, max(d1) AS ud1 FROM ut GROUP BY 1
), u AS (
  SELECT ut.d1 - ut.d0 AS life,
         CASE WHEN ut.d1 <= horizon.ud1 - 7 THEN 1 ELSE 0 END AS observed
  FROM ut JOIN horizon ON horizon.user_id = ut.user_id
), per_t AS (
  SELECT life, count(*) AS n_at, CAST(sum(observed) AS BIGINT) AS d
  FROM u GROUP BY 1
), na AS (
  SELECT life, d,
         sum(n_at) OVER (ORDER BY life
                         ROWS BETWEEN CURRENT ROW
                         AND UNBOUNDED FOLLOWING) AS n_risk
  FROM per_t
), cumfold AS (
  SELECT life, d, n_risk,
         sum(CAST(d AS DOUBLE) / n_risk)
           OVER (ORDER BY life ROWS UNBOUNDED PRECEDING) AS h,
         sum(CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * n_risk))
           OVER (ORDER BY life ROWS UNBOUNDED PRECEDING) AS v
  FROM na
)
SELECT CAST(life AS BIGINT) AS life_days, CAST(n_risk AS BIGINT) AS n_risk,
       d AS n_events,
       CAST(floor(h * 1000000 + {_OFF}) AS BIGINT) AS h_e6,
       CAST(floor(v * 1000000000 + {_OFF}) AS BIGINT) AS var_e9
FROM cumfold
WHERE d > 0
ORDER BY life_days
"""


# ---------------------------------------------------------------------------
# retention_curve — pooled daily retention curve (exact integers)
# ---------------------------------------------------------------------------
# Classic D-k retention: r_k = share of a first-day cohort active k
# days later, pooled over cohorts (sum nk / sum n0), k <= 14.  The
# user-day DISTINCT table is the materialization boundary (the
# stickiness_dau_wau discipline); everything downstream is exact
# integers — the curve IS the deliverable, any decay fit is
# downstream sugar (the synthetic corpus retains ~0.9 flat, so a
# half-life fit would be noise-sign fragile; probed).

_RET_MAX_K = 14


def q_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
        )
        .cast("long")
        .alias("d"),
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    j = ev.join(first, "user_id").withColumn("k", F.col("d") - F.col("d0"))
    cohort = first.groupBy("d0").agg(F.count(F.lit(1)).alias("n0"))
    act = j.groupBy("d0", "k").agg(F.count(F.lit(1)).alias("nk"))
    r = (
        act.join(cohort, "d0")
        .filter((F.col("k") >= 1) & (F.col("k") <= _RET_MAX_K))
        .groupBy("k")
        .agg(F.sum("nk").alias("nk"), F.sum("n0").alias("n0"))
    )
    ret = F.col("nk").cast("double") / F.col("n0").cast("double")
    return r.select(
        F.col("k").cast("long").alias("k"),
        F.col("nk").cast("long").alias("nk"),
        F.col("n0").cast("long").alias("n0"),
        F.floor(ret * 1_000_000 + F.lit(_OFF)).cast("long").alias("r_e6"),
    ).orderBy("k")


SQL_RETENTION_CURVE = f"""
WITH ev AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
  FROM events
), first AS (
  SELECT user_id, min(d) AS d0 FROM ev GROUP BY 1
), j AS (
  SELECT ev.user_id, first.d0, ev.d - first.d0 AS k
  FROM ev JOIN first ON first.user_id = ev.user_id
), cohort AS (
  SELECT d0, count(*) AS n0 FROM first GROUP BY 1
), act AS (
  SELECT d0, k, count(*) AS nk FROM j GROUP BY 1, 2
), r AS (
  SELECT k, CAST(sum(nk) AS BIGINT) AS nk, CAST(sum(n0) AS BIGINT) AS n0
  FROM act JOIN cohort USING (d0)
  WHERE k >= 1 AND k <= {_RET_MAX_K}
  GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS k, nk, n0,
       CAST(floor(CAST(nk AS DOUBLE) / n0 * 1000000 + {_OFF}) AS BIGINT)
         AS r_e6
FROM r
ORDER BY k
"""


# ---------------------------------------------------------------------------
# brier_decomposition — Murphy decomposition of a climatological forecaster
# ---------------------------------------------------------------------------
# Forecast "day k+1 is above the type's median" with p = the share of
# SAME-WEEKDAY days that were above median (climatology by dow);
# Brier = reliability - resolution + uncertainty (Murphy JAM 1973),
# grouped exactly by the (rational) forecast bins: every piece derives
# from exact integer counts, the decomposition identity holds in-query
# and is ASSERTED in the pin.


def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lab = daily.join(F.broadcast(med), "event_type").withColumn(
        "o", (F.col("c") > F.col("med")).cast("long")
    ).withColumn("dow", ((F.col("day") + 3) % 7).cast("long"))
    # forecast bin = weekday; p_bin = exact rational share above median
    bins = lab.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("o").alias("ob")
    )
    tot = lab.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o").alias("osum")
    )
    j = bins.join(F.broadcast(tot), "event_type")
    pb = F.col("ob").cast("double") / F.col("nb").cast("double")
    obar = F.col("osum").cast("double") / F.col("n").cast("double")
    rel_t = F.col("nb") * (pb - pb) * (pb - pb)  # forecaster IS the bin mean
    res_t = F.col("nb").cast("double") * (pb - obar) * (pb - obar)
    agg = j.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("osum").alias("osum"),
        F.sum(rel_t).alias("rel_n"),
        F.sum(res_t).alias("res_n"),
    )
    nd = F.col("n").cast("double")
    ob2 = F.col("osum").cast("double") / nd
    unc = ob2 * (1.0 - ob2)
    rel = F.col("rel_n").cast("double") / nd
    res = F.col("res_n") / nd
    brier = rel - res + unc
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("osum").cast("long").alias("n_above"),
        F.floor(res * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "resolution_e6"
        ),
        F.floor(unc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "uncertainty_e6"
        ),
        F.floor(brier * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "brier_e6"
        ),
    ).orderBy("event_type")


SQL_BRIER = f"""
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
), lab AS (
  SELECT daily.event_type, (daily.day + 3) % 7 AS dow,
         CASE WHEN daily.c > med.med THEN 1 ELSE 0 END AS o
  FROM daily JOIN med ON med.event_type = daily.event_type
), bins AS (
  SELECT event_type, dow, count(*) AS nb, CAST(sum(o) AS BIGINT) AS ob
  FROM lab GROUP BY 1, 2
), tot AS (
  SELECT event_type, count(*) AS n, CAST(sum(o) AS BIGINT) AS osum
  FROM lab GROUP BY 1
), agg AS (
  SELECT bins.event_type, max(tot.n) AS n, max(tot.osum) AS osum,
         sum(CAST(bins.nb AS DOUBLE)
             * (CAST(bins.ob AS DOUBLE) / bins.nb
                - CAST(tot.osum AS DOUBLE) / tot.n)
             * (CAST(bins.ob AS DOUBLE) / bins.nb
                - CAST(tot.osum AS DOUBLE) / tot.n)) AS res_n
  FROM bins JOIN tot ON tot.event_type = bins.event_type
  GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n, osum AS n_above,
       CAST(floor(res_n / n * 1000000 + {_OFF}) AS BIGINT)
         AS resolution_e6,
       CAST(floor((CAST(osum AS DOUBLE) / n) * (1.0 - CAST(osum AS DOUBLE) / n)
                  * 1000000 + {_OFF}) AS BIGINT) AS uncertainty_e6,
       CAST(floor((0.0 - res_n / n
                   + (CAST(osum AS DOUBLE) / n)
                     * (1.0 - CAST(osum AS DOUBLE) / n))
                  * 1000000 + {_OFF}) AS BIGINT) AS brier_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# source_coherence — mean doc-to-centroid cosine per source
# ---------------------------------------------------------------------------
# How topically tight is a source?  cos(doc, centroid) over the global
# top-100 vocab; the centroid's 1/n_s factor CANCELS in the cosine, so
# every dot product is the exact BIGINT x . S against the source SUM
# vector — no rational vectors materialize.  The per-source mean is a
# <=|docs| double fold (e4 half-up, anova grid argument).


def q_source_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).select("doc_id", "source", "text")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
    )
    gcnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("gc"))
    wv = Window.orderBy(F.desc("gc"), F.asc("w"))
    vocab = (
        gcnt.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= _SPC_TOP)
        .select("w")
    )
    x = (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = x.groupBy("source", "w").agg(F.sum("cnt").alias("sw"))
    snorm = s.groupBy("source").agg(
        F.sum(F.col("sw") * F.col("sw")).alias("s2")
    )
    dot = (
        x.join(s, ["source", "w"])
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.col("cnt") * F.col("sw")).alias("xs"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("x2"),
        )
    )
    j = dot.join(F.broadcast(snorm), "source")
    cos = F.col("xs").cast("double") / F.sqrt(
        F.col("x2").cast("double") * F.col("s2").cast("double")
    )
    agg = j.filter((F.col("x2") > 0) & (F.col("s2") > 0)).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(cos).alias("csum")
    )
    coh = F.col("csum") / F.col("n_docs").cast("double")
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.floor(coh * 10_000 + F.lit(0.5)).cast("long").alias(
            "coherence_e4"
        ),
    ).orderBy("source")


SQL_COHERENCE = f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), gcnt AS (
  SELECT w, count(*) AS gc FROM toks GROUP BY 1
), vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY gc DESC, w ASC) AS rk FROM gcnt
  ) WHERE rk <= {_SPC_TOP}
), x AS (
  SELECT doc_id, source, toks.w, count(*) AS cnt
  FROM toks JOIN vocab ON vocab.w = toks.w
  GROUP BY 1, 2, 3
), s AS (
  SELECT source, w, CAST(sum(cnt) AS BIGINT) AS sw FROM x GROUP BY 1, 2
), snorm AS (
  SELECT source, CAST(sum(sw * sw) AS BIGINT) AS s2 FROM s GROUP BY 1
), dot AS (
  SELECT x.doc_id, x.source,
         CAST(sum(x.cnt * s.sw) AS BIGINT) AS xs,
         CAST(sum(x.cnt * x.cnt) AS BIGINT) AS x2
  FROM x JOIN s ON s.source = x.source AND s.w = x.w
  GROUP BY 1, 2
), cosd AS (
  SELECT dot.source,
         CAST(xs AS DOUBLE) / sqrt(CAST(x2 AS DOUBLE) * snorm.s2) AS cos
  FROM dot JOIN snorm ON snorm.source = dot.source
  WHERE x2 > 0 AND snorm.s2 > 0
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(floor(sum(cos) / count(*) * 10000 + 0.5) AS BIGINT)
         AS coherence_e4
FROM cosd
GROUP BY 1
ORDER BY source
"""


# ---------------------------------------------------------------------------
# qq_slope — quantile-quantile regression slope between language pairs
# ---------------------------------------------------------------------------
# Distributional shape comparison: regress lang B's deciles on lang
# A's deciles (both EXACT inverse-CDF order statistics).  Slope ~ scale
# ratio, r^2 ~ shape agreement; regr over 9 exact-integer points.


def q_qq_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    r = d.withColumn("rk", F.row_number().over(w)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    qs = r.withColumn(
        "dec", F.explode(F.array(*[F.lit(i) for i in range(1, 10)]))
    )
    hit = qs.filter(
        F.col("rk") == F.expr("((nn - 1) * dec) div 10") + 1
    ).select("lang", "dec", F.col("n_chars").alias("qv"))
    a = hit.select(
        F.col("lang").alias("la"), "dec", F.col("qv").alias("qa")
    )
    b = hit.select(
        F.col("lang").alias("lb"), "dec", F.col("qv").alias("qb")
    )
    p = a.join(b, "dec").filter(F.col("la") < F.col("lb"))
    agg = p.groupBy("la", "lb").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.floor(
            F.expr("regr_slope(CAST(qb AS DOUBLE), CAST(qa AS DOUBLE))")
            * 10_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("slope_e4"),
        F.floor(
            F.expr("regr_r2(CAST(qb AS DOUBLE), CAST(qa AS DOUBLE))")
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r2_e6"),
    )
    return agg.select(
        "la", "lb", F.col("n_pts").cast("long").alias("n_pts"),
        "slope_e4", "r2_e6",
    ).orderBy("la", "lb")


SQL_QQ = """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
           AS rk,
         count(*) OVER (PARTITION BY lang) AS nn
  FROM documents
), hit AS (
  SELECT lang, dec, n_chars AS qv
  FROM r, (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) d(dec)
  WHERE rk = ((nn - 1) * dec) // 10 + 1
), p AS (
  SELECT a.lang AS la, b.lang AS lb, a.qv AS qa, b.qv AS qb
  FROM hit a JOIN hit b ON b.dec = a.dec AND a.lang < b.lang
)
SELECT la, lb, CAST(count(*) AS BIGINT) AS n_pts,
       CAST(floor(regr_slope(CAST(qb AS DOUBLE), CAST(qa AS DOUBLE))
                  * 10000 + 0.5) AS BIGINT) AS slope_e4,
       CAST(floor(regr_r2(CAST(qb AS DOUBLE), CAST(qa AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS r2_e6
FROM p
GROUP BY 1, 2
ORDER BY la, lb
"""


# ---------------------------------------------------------------------------
# tail_coexceedance — upper-tail co-exceedance between event type pairs
# ---------------------------------------------------------------------------
# The empirical chi coefficient of EVT tail dependence (Coles 2001
# §8.4): on common days, P(both types above their own p90) scaled by
# the marginal tail probability.  Thresholds are exact per-type p90
# order statistics; the pair table is the day-grid join; all counts
# exact.


def q_tail_coexceedance(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lab = daily.join(F.broadcast(p90), "event_type").withColumn(
        "exc", (F.col("c") > F.col("thr")).cast("long")
    )
    a = lab.alias("a")
    b = lab.alias("b")
    p = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("ta"),
        F.col("b.event_type").alias("tb"),
        F.col("a.exc").alias("xa"),
        F.col("b.exc").alias("xb"),
    )
    agg = p.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("na"),
        F.sum("xb").alias("nb"),
        F.sum(F.col("xa") * F.col("xb")).alias("nboth"),
    )
    chi = (
        F.col("nboth").cast("double")
        * F.col("n")
        / (F.col("na").cast("double") * F.col("nb"))
    )
    return (
        agg.filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "ta",
            "tb",
            F.col("n").cast("long").alias("n"),
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            F.col("nboth").cast("long").alias("nboth"),
            F.floor(chi * 10_000 + F.lit(_OFF)).cast("long").alias(
                "chi_e4"
            ),
        )
        .orderBy("ta", "tb")
    )


SQL_TAIL_COEX = f"""
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
), lab AS (
  SELECT daily.event_type, daily.day,
         CASE WHEN daily.c > p90.thr THEN 1 ELSE 0 END AS exc
  FROM daily JOIN p90 ON p90.event_type = daily.event_type
), p AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.exc AS xa, b.exc AS xb
  FROM lab a JOIN lab b ON b.day = a.day AND a.event_type < b.event_type
), agg AS (
  SELECT ta, tb, count(*) AS n,
         CAST(sum(xa) AS BIGINT) AS na, CAST(sum(xb) AS BIGINT) AS nb,
         CAST(sum(xa * xb) AS BIGINT) AS nboth
  FROM p GROUP BY 1, 2
)
SELECT ta, tb, CAST(n AS BIGINT) AS n, na, nb, nboth,
       CAST(floor(CAST(nboth AS DOUBLE) * n
                  / (CAST(na AS DOUBLE) * nb) * 10000 + {_OFF})
            AS BIGINT) AS chi_e4
FROM agg
WHERE na > 0 AND nb > 0
ORDER BY ta, tb
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "mcnemar_labelers": q_mcnemar_labelers,
    "mean_excess": q_mean_excess,
    "taylor_law": q_taylor_law,
    "levene_bf": q_levene_bf,
    "kruskal_wallis": q_kruskal_wallis,
    "arch_lm": q_arch_lm,
    "jarque_bera": q_jarque_bera,
    "grubbs_test": q_grubbs_test,
    "lexical_richness": q_lexical_richness,
    "wilcoxon_signed_rank": q_wilcoxon_signed_rank,
    "durbin_watson": q_durbin_watson,
    "friedman_test": q_friedman_test,
    "cramers_v": q_cramers_v,
    "cochran_q": q_cochran_q,
    "source_profile_cosine": q_source_profile_cosine,
    "theil_sen": q_theil_sen,
    "char_class_profile": q_char_class_profile,
    "sentence_length_quantiles": q_sentence_length_quantiles,
    "page_hinkley": q_page_hinkley,
    "diel_concentration": q_diel_concentration,
    "span_leakage": q_span_leakage,
    "robust_scale": q_robust_scale,
    "wilson_ci": q_wilson_ci,
    "streak_stats": q_streak_stats,
    "ks_doclen": q_ks_doclen,
    "cliffs_delta": q_cliffs_delta,
    "hedges_g": q_hedges_g,
    "quantile_shape": q_quantile_shape,
    "source_lang_purity": q_source_lang_purity,
    "staleness_quantiles": q_staleness_quantiles,
    "type_corr_matrix": q_type_corr_matrix,
    "split_half_reliability": q_split_half_reliability,
    "lognormal_fit": q_lognormal_fit,
    "user_concentration": q_user_concentration,
    "nelson_aalen": q_nelson_aalen,
    "retention_curve": q_retention_curve,
    "brier_decomposition": q_brier_decomposition,
    "source_coherence": q_source_coherence,
    "qq_slope": q_qq_slope,
    "tail_coexceedance": q_tail_coexceedance,
}

ORACLE_SQL: dict[str, str] = {
    "mcnemar_labelers": SQL_MCNEMAR,
    "mean_excess": SQL_MEAN_EXCESS,
    "taylor_law": SQL_TAYLOR,
    "levene_bf": SQL_LEVENE,
    "kruskal_wallis": SQL_KRUSKAL,
    "arch_lm": SQL_ARCH,
    "jarque_bera": SQL_JB,
    "grubbs_test": SQL_GRUBBS,
    "lexical_richness": SQL_RICHNESS,
    "wilcoxon_signed_rank": SQL_WILCOXON,
    "durbin_watson": SQL_DW,
    "friedman_test": SQL_FRIEDMAN,
    "cramers_v": SQL_CRAMERS,
    "cochran_q": SQL_COCHRAN,
    "source_profile_cosine": SQL_SPC,
    "theil_sen": SQL_THEIL_SEN,
    "char_class_profile": SQL_CHAR_CLASS,
    "sentence_length_quantiles": SQL_SENTLEN,
    "page_hinkley": SQL_PAGE_HINKLEY,
    "diel_concentration": SQL_DIEL_CONC,
    "span_leakage": SQL_SPAN_LEAKAGE,
    "robust_scale": SQL_ROBUST_SCALE,
    "wilson_ci": SQL_WILSON,
    "streak_stats": SQL_STREAKS,
    "ks_doclen": SQL_KS_DOCLEN,
    "cliffs_delta": SQL_CLIFFS,
    "hedges_g": SQL_HEDGES,
    "quantile_shape": SQL_QSHAPE,
    "source_lang_purity": SQL_LANG_PURITY,
    "staleness_quantiles": SQL_STALENESS,
    "type_corr_matrix": SQL_TYPE_CORR,
    "split_half_reliability": SQL_SPLIT_HALF,
    "lognormal_fit": _sql_lognormal(),
    "user_concentration": SQL_USER_CONC,
    "nelson_aalen": SQL_NELSON_AALEN,
    "retention_curve": SQL_RETENTION_CURVE,
    "brier_decomposition": SQL_BRIER,
    "source_coherence": SQL_COHERENCE,
    "qq_slope": SQL_QQ,
    "tail_coexceedance": SQL_TAIL_COEX,
}
