"""Round-4 continuation registry (eighteenth battery): LEXICAL-RICHNESS
constants from the word-frequency spectrum — the classical stylometry
family (Yule 1944, Honoré 1979, Sichel 1975, Brunet 1978, Guiraud 1954)
that complements the corpus-growth laws already in the registry
(heaps_law, herdan_c, zipf_mandelbrot, good_turing).

All queries share ONE scaffold: tokens -> (lang, word) counts (a single
combinable agg shuffling on the composite key) -> per-lang scalars
(N = sum cnt, V = count, V1/V2 = hapax/dis-legomena counts,
S2 = sum cnt^2).  Every scalar is an EXACT INTEGER in both engines, so
the final richness constants are single deterministic double
expressions floored to BIGINT with the house 1/pi offset.

Scale posture: the only shuffle is the (lang, word) count — map-side
combinable, the same cost as word_count; the spectrum collapse is a
second combinable agg onto the lang domain (a handful of rows).  No
windows, no joins, no pair blowups; at 100 TB this is two shuffles of
strictly decreasing size.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF, _documents

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _word_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, N, V, V1, V2, S2) — exact-integer frequency-spectrum
    scalars per language."""
    toks = (
        _documents(spark, sf_dir)
        .select(
            "lang",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
        )
        .filter(F.length("w") > 0)
    )
    cnt = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("lang").agg(
        F.sum("c").alias("n_tok"),
        F.count(F.lit(1)).alias("v_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("v1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("v2"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )


_SPECTRUM_CTE = """
WITH toks AS (
  SELECT lang,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), cnt AS (
  SELECT lang, w, count(*) AS c
  FROM toks WHERE len(w) > 0
  GROUP BY 1, 2
), spec AS (
  SELECT lang,
         CAST(sum(c) AS BIGINT) AS n_tok,
         CAST(count(*) AS BIGINT) AS v_types,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM cnt GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# yules_k — Yule's characteristic K (repeat-rate of vocabulary)
# ---------------------------------------------------------------------------
# Yule (1944): K = 1e4 * (sum_m m^2 V(m) - N) / N^2, where
# sum_m m^2 V(m) equals sum over types of freq^2 (= S2).  K is
# length-invariant for large N and measures lexical repetitiveness.


def q_yules_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _word_spectrum(spark, sf_dir)
    nd = F.col("n_tok").cast("double")
    k = (
        F.lit(10_000.0)
        * (F.col("s2").cast("double") - nd)
        / (nd * nd)
    )
    return (
        spec.filter(F.col("n_tok") >= 2)
        .select(
            "lang",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.col("v_types").cast("long").alias("v_types"),
            F.floor(k * 10_000 + F.lit(_OFF)).cast("long").alias(
                "k_e4"
            ),
        )
        .orderBy("lang")
    )


SQL_YULES_K = f"""{_SPECTRUM_CTE}
SELECT lang, n_tok, v_types,
       CAST(floor(10000.0 * (CAST(s2 AS DOUBLE) - n_tok)
                  / (CAST(n_tok AS DOUBLE) * n_tok) * 10000
                  + {_OFF}) AS BIGINT) AS k_e4
FROM spec
WHERE n_tok >= 2
ORDER BY lang
"""

QUERIES["yules_k"] = q_yules_k
ORACLE_SQL["yules_k"] = SQL_YULES_K


# ---------------------------------------------------------------------------
# honore_r — Honoré's R (hapax-legomena richness)
# ---------------------------------------------------------------------------
# Honoré (1979): R = 100 * ln(N) / (1 - V1/V).  Undefined when every
# type is a hapax (V1 = V); those languages are filtered, matching the
# convention in Tweedie & Baayen (1998).


def q_honore_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _word_spectrum(spark, sf_dir)
    nd = F.col("n_tok").cast("double")
    frac = F.col("v1").cast("double") / F.col("v_types").cast(
        "double"
    )
    r = F.lit(100.0) * F.log(nd) / (F.lit(1.0) - frac)
    return (
        spec.filter(
            (F.col("n_tok") >= 2) & (F.col("v1") < F.col("v_types"))
        )
        .select(
            "lang",
            F.col("v1").cast("long").alias("v1"),
            F.col("v_types").cast("long").alias("v_types"),
            F.floor(r * 10_000 + F.lit(_OFF)).cast("long").alias(
                "r_e4"
            ),
        )
        .orderBy("lang")
    )


SQL_HONORE_R = f"""{_SPECTRUM_CTE}
SELECT lang, v1, v_types,
       CAST(floor(100.0 * ln(CAST(n_tok AS DOUBLE))
                  / (1.0 - CAST(v1 AS DOUBLE) / v_types) * 10000
                  + {_OFF}) AS BIGINT) AS r_e4
FROM spec
WHERE n_tok >= 2 AND v1 < v_types
ORDER BY lang
"""

QUERIES["honore_r"] = q_honore_r
ORACLE_SQL["honore_r"] = SQL_HONORE_R


# ---------------------------------------------------------------------------
# sichel_brunet — Sichel's S, Brunet's W, Guiraud's R in one pass
# ---------------------------------------------------------------------------
# Sichel (1975): S = V2/V (dis-legomena proportion, near-constant in N).
# Brunet (1978): W = N^(V^-a) with a = 0.172; computed as
# exp(exp(-a ln V) * ln N) so both engines follow the identical
# libm exp/ln path rather than an engine-specific pow.
# Guiraud (1954): R = V / sqrt(N).


def q_sichel_brunet(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _word_spectrum(spark, sf_dir)
    nd = F.col("n_tok").cast("double")
    vd = F.col("v_types").cast("double")
    s = F.col("v2").cast("double") / vd
    w = F.exp(F.exp(F.lit(-0.172) * F.log(vd)) * F.log(nd))
    g = vd / F.sqrt(nd)
    return (
        spec.filter((F.col("n_tok") >= 2) & (F.col("v_types") >= 2))
        .select(
            "lang",
            F.floor(s * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "sichel_e6"
            ),
            F.floor(w * 10_000 + F.lit(_OFF)).cast("long").alias(
                "brunet_e4"
            ),
            F.floor(g * 10_000 + F.lit(_OFF)).cast("long").alias(
                "guiraud_e4"
            ),
        )
        .orderBy("lang")
    )


SQL_SICHEL_BRUNET = f"""{_SPECTRUM_CTE}
SELECT lang,
       CAST(floor(CAST(v2 AS DOUBLE) / v_types * 1000000 + {_OFF})
            AS BIGINT) AS sichel_e6,
       CAST(floor(exp(exp(-0.172 * ln(CAST(v_types AS DOUBLE)))
                      * ln(CAST(n_tok AS DOUBLE))) * 10000 + {_OFF})
            AS BIGINT) AS brunet_e4,
       CAST(floor(CAST(v_types AS DOUBLE)
                  / sqrt(CAST(n_tok AS DOUBLE)) * 10000 + {_OFF})
            AS BIGINT) AS guiraud_e4
FROM spec
WHERE n_tok >= 2 AND v_types >= 2
ORDER BY lang
"""

QUERIES["sichel_brunet"] = q_sichel_brunet
ORACLE_SQL["sichel_brunet"] = SQL_SICHEL_BRUNET


# ===========================================================================
# Battery B — diversity / dissimilarity profiles (ecology-style indices
# over the word-count tables).
#
# Scale posture: everything rides the (key, word) count table.  The
# diversity profile collapses to the (source, c) FREQUENCY-SPECTRUM
# domain before any float math (hundreds of rows); the pairwise
# dissimilarities are inner self-joins ON WORD (co-partitioned,
# vocab-sized — never a pair-of-rows blowup), with union-side masses
# recovered from per-key scalars instead of a full-outer join:
#   sum_union |x-y|      = (Na + Nb) - 2 * sum_inter min(x, y)
#   canberra over union  = sum_inter |x-y|/(x+y) + (Va - Vint) + (Vb - Vint)
#   JSD zero-side terms  = (1 - mass_inter)/2 * ln 2  (per side, exact
#                          rational masses)
# House exactness: per-term floats are floored to BIGINT per
# spectrum/word row so cross-engine sums are exact-integer.
# ===========================================================================


def _word_counts(spark: SparkSession, sf_dir: str, key: str) -> DataFrame:
    return (
        _documents(spark, sf_dir)
        .select(
            key,
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
        )
        .filter(F.length("w") > 0)
        .groupBy(key, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _counts_cte(key: str) -> str:
    return f"""
WITH toks AS (
  SELECT {key},
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), cnt AS (
  SELECT {key}, w, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE len(w) > 0
  GROUP BY 1, 2
)"""


# ---------------------------------------------------------------------------
# diversity_profile — Shannon H, Pielou J, Simpson D, Berger-Parker d
# ---------------------------------------------------------------------------
# Classic ecology indices (Magurran 2004) of the word distribution per
# source.  H is summed over the frequency-spectrum domain (m types at
# count c contribute m*(c/N)*ln(N/c)), each spectrum term e9-floored so
# the cross-engine sum is an exact integer; Simpson = S2/N^2 and
# Berger-Parker = cmax/N are exact rationals.


def q_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cnt = _word_counts(spark, sf_dir, "source")
    spec = cnt.groupBy("source", "c").agg(
        F.count(F.lit(1)).alias("m")
    )
    w = Window.partitionBy("source")
    spec = (
        spec.withColumn("n_tok", F.sum(F.col("c") * F.col("m")).over(w))
        .withColumn("v_types", F.sum("m").over(w))
        .withColumn("s2", F.sum(F.col("c") * F.col("c") * F.col("m")).over(w))
        .withColumn("cmax", F.max("c").over(w))
    )
    nd = F.col("n_tok").cast("double")
    term = (
        F.col("m").cast("double")
        * (F.col("c").cast("double") / nd)
        * F.log(nd / F.col("c").cast("double"))
    )
    spec = spec.withColumn(
        "t9", F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
    )
    agg = spec.groupBy("source").agg(
        F.sum("t9").alias("h9"),
        F.max("n_tok").alias("n_tok"),
        F.max("v_types").alias("v_types"),
        F.max("s2").alias("s2"),
        F.max("cmax").alias("cmax"),
    )
    h = F.col("h9").cast("double") / 1e9
    nd2 = F.col("n_tok").cast("double")
    return (
        agg.filter(F.col("v_types") >= 2)
        .select(
            "source",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.col("v_types").cast("long").alias("v_types"),
            F.floor(h * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "shannon_e6"
            ),
            F.floor(
                h / F.log(F.col("v_types").cast("double")) * 1_000_000
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("pielou_e6"),
            F.floor(
                F.col("s2").cast("double") / (nd2 * nd2) * 1_000_000_000
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("simpson_e9"),
            F.floor(
                F.col("cmax").cast("double") / nd2 * 1_000_000
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("berger_e6"),
        )
        .orderBy("source")
    )


SQL_DIVERSITY = f"""{_counts_cte("source")}
, spec AS (
  SELECT source, c, CAST(count(*) AS BIGINT) AS m
  FROM cnt GROUP BY 1, 2
), spec2 AS (
  SELECT source, c, m,
         CAST(sum(c * m) OVER (PARTITION BY source) AS BIGINT) AS n_tok,
         CAST(sum(m) OVER (PARTITION BY source) AS BIGINT) AS v_types,
         CAST(sum(c * c * m) OVER (PARTITION BY source) AS BIGINT) AS s2,
         max(c) OVER (PARTITION BY source) AS cmax
  FROM spec
), terms AS (
  SELECT source, n_tok, v_types, s2, cmax,
         CAST(floor(CAST(m AS DOUBLE) * (CAST(c AS DOUBLE) / n_tok)
                    * ln(CAST(n_tok AS DOUBLE) / c) * 1e9 + {_OFF})
              AS BIGINT) AS t9
  FROM spec2
), agg AS (
  SELECT source, CAST(sum(t9) AS BIGINT) AS h9,
         max(n_tok) AS n_tok, max(v_types) AS v_types,
         max(s2) AS s2, max(cmax) AS cmax
  FROM terms GROUP BY 1
)
SELECT source, n_tok, v_types,
       CAST(floor(CAST(h9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS shannon_e6,
       CAST(floor(CAST(h9 AS DOUBLE) / 1e9
                  / ln(CAST(v_types AS DOUBLE)) * 1000000 + {_OFF})
            AS BIGINT) AS pielou_e6,
       CAST(floor(CAST(s2 AS DOUBLE)
                  / (CAST(n_tok AS DOUBLE) * n_tok) * 1000000000
                  + {_OFF}) AS BIGINT) AS simpson_e9,
       CAST(floor(CAST(cmax AS DOUBLE) / n_tok * 1000000 + {_OFF})
            AS BIGINT) AS berger_e6
FROM agg
WHERE v_types >= 2
ORDER BY source
"""

QUERIES["diversity_profile"] = q_diversity_profile
ORACLE_SQL["diversity_profile"] = SQL_DIVERSITY


# ---------------------------------------------------------------------------
# bray_curtis_langs — Bray-Curtis dissimilarity between language
# word-count profiles
# ---------------------------------------------------------------------------
# BC(a,b) = sum_union |x-y| / sum_union (x+y)
#         = 1 - 2 * sum_inter min(x,y) / (Na + Nb)
# — the min-sum identity means the union never has to be materialized:
# one inner join on word plus two per-lang scalars, all exact integers.


def q_bray_curtis_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnt = _word_counts(spark, sf_dir, "lang")
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("n_tok"))
    a = cnt.select(
        F.col("lang").alias("lang_a"), "w", F.col("c").alias("ca")
    )
    b = cnt.select(
        F.col("lang").alias("lang_b"), "w", F.col("c").alias("cb")
    )
    pairs = a.join(b, "w").filter(F.col("lang_a") < F.col("lang_b"))
    smin = pairs.groupBy("lang_a", "lang_b").agg(
        F.sum(F.least("ca", "cb")).alias("smin"),
        F.count(F.lit(1)).alias("n_common"),
    )
    ta = tot.select(
        F.col("lang").alias("lang_a"), F.col("n_tok").alias("na")
    )
    tb = tot.select(
        F.col("lang").alias("lang_b"), F.col("n_tok").alias("nb")
    )
    out = smin.join(F.broadcast(ta), "lang_a").join(
        F.broadcast(tb), "lang_b"
    )
    bc = F.lit(1.0) - 2.0 * F.col("smin").cast("double") / (
        F.col("na") + F.col("nb")
    ).cast("double")
    return out.select(
        "lang_a",
        "lang_b",
        F.col("n_common").cast("long").alias("n_common"),
        F.floor(bc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "bc_e6"
        ),
    ).orderBy("lang_a", "lang_b")


SQL_BRAY_CURTIS = f"""{_counts_cte("lang")}
, tot AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n_tok FROM cnt GROUP BY 1
), pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(sum(least(a.c, b.c)) AS BIGINT) AS smin,
         CAST(count(*) AS BIGINT) AS n_common
  FROM cnt a JOIN cnt b ON a.w = b.w AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT p.lang_a, p.lang_b, p.n_common,
       CAST(floor((1.0 - 2.0 * CAST(p.smin AS DOUBLE)
                   / (ta.n_tok + tb.n_tok)) * 1000000 + {_OFF})
            AS BIGINT) AS bc_e6
FROM pairs p
JOIN tot ta ON ta.lang = p.lang_a
JOIN tot tb ON tb.lang = p.lang_b
ORDER BY p.lang_a, p.lang_b
"""

QUERIES["bray_curtis_langs"] = q_bray_curtis_langs
ORACLE_SQL["bray_curtis_langs"] = SQL_BRAY_CURTIS


# ---------------------------------------------------------------------------
# jensen_shannon_langs — Jensen-Shannon divergence between language
# unigram distributions (nats)
# ---------------------------------------------------------------------------
# JSD(P,Q) = H(M) - (H(P)+H(Q))/2 with M = (P+Q)/2; computed in the
# pointwise form JSD = sum_w [p/2 ln(p/m) + q/2 ln(q/m)].  Words
# present on only one side contribute (p/2) ln 2, so the union
# collapses to the inner join plus per-side intersection masses:
#   JSD = sum_inter terms + (1 - massP)/2 ln2 + (1 - massQ)/2 ln2
# where massP = sum_inter ca / Na is an exact rational.  Per-word
# terms are e12-floored so the cross-engine sum is exact-integer;
# the log argument p/m is spelled 2*ca*Nb / (ca*Nb + cb*Na) in exact
# double products so both engines feed libm the identical bits.


def q_jensen_shannon_langs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cnt = _word_counts(spark, sf_dir, "lang")
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("n_tok"))
    a = cnt.select(
        F.col("lang").alias("lang_a"), "w", F.col("c").alias("ca")
    )
    b = cnt.select(
        F.col("lang").alias("lang_b"), "w", F.col("c").alias("cb")
    )
    ta = tot.select(
        F.col("lang").alias("lang_a"), F.col("n_tok").alias("na")
    )
    tb = tot.select(
        F.col("lang").alias("lang_b"), F.col("n_tok").alias("nb")
    )
    pairs = (
        a.join(b, "w")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .join(F.broadcast(ta), "lang_a")
        .join(F.broadcast(tb), "lang_b")
    )
    cad = F.col("ca").cast("double")
    cbd = F.col("cb").cast("double")
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    p = cad / nad
    q = cbd / nbd
    ratio_p = 2.0 * cad * nbd / (cad * nbd + cbd * nad)
    ratio_q = 2.0 * cbd * nad / (cad * nbd + cbd * nad)
    term = p / 2.0 * F.log(ratio_p) + q / 2.0 * F.log(ratio_q)
    pairs = pairs.withColumn(
        "t12", F.floor(term * 1e12 + F.lit(_OFF)).cast("long")
    )
    agg = pairs.groupBy("lang_a", "lang_b").agg(
        F.sum("t12").alias("s12"),
        F.sum("ca").alias("ca_int"),
        F.sum("cb").alias("cb_int"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.count(F.lit(1)).alias("n_common"),
    )
    mass_p = F.col("ca_int").cast("double") / F.col("na").cast("double")
    mass_q = F.col("cb_int").cast("double") / F.col("nb").cast("double")
    ln2 = 0.6931471805599453
    jsd = (
        F.col("s12").cast("double") / 1e12
        + (F.lit(1.0) - mass_p) / 2.0 * F.lit(ln2)
        + (F.lit(1.0) - mass_q) / 2.0 * F.lit(ln2)
    )
    return agg.select(
        "lang_a",
        "lang_b",
        F.col("n_common").cast("long").alias("n_common"),
        F.floor(jsd * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "jsd_e6"
        ),
    ).orderBy("lang_a", "lang_b")


SQL_JENSEN_SHANNON = f"""{_counts_cte("lang")}
, tot AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n_tok FROM cnt GROUP BY 1
), pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, a.c AS ca, b.c AS cb,
         ta.n_tok AS na, tb.n_tok AS nb
  FROM cnt a
  JOIN cnt b ON a.w = b.w AND a.lang < b.lang
  JOIN tot ta ON ta.lang = a.lang
  JOIN tot tb ON tb.lang = b.lang
), terms AS (
  SELECT lang_a, lang_b, ca, cb, na, nb,
         CAST(floor((CAST(ca AS DOUBLE) / na / 2.0
                     * ln(2.0 * CAST(ca AS DOUBLE) * nb
                          / (CAST(ca AS DOUBLE) * nb
                             + CAST(cb AS DOUBLE) * na))
                     + CAST(cb AS DOUBLE) / nb / 2.0
                     * ln(2.0 * CAST(cb AS DOUBLE) * na
                          / (CAST(ca AS DOUBLE) * nb
                             + CAST(cb AS DOUBLE) * na)))
                    * 1e12 + {_OFF}) AS BIGINT) AS t12
  FROM pairs
), agg AS (
  SELECT lang_a, lang_b,
         CAST(sum(t12) AS BIGINT) AS s12,
         CAST(sum(ca) AS BIGINT) AS ca_int,
         CAST(sum(cb) AS BIGINT) AS cb_int,
         max(na) AS na, max(nb) AS nb,
         CAST(count(*) AS BIGINT) AS n_common
  FROM terms GROUP BY 1, 2
)
SELECT lang_a, lang_b, n_common,
       CAST(floor((CAST(s12 AS DOUBLE) / 1e12
                   + (1.0 - CAST(ca_int AS DOUBLE) / na) / 2.0
                     * 0.6931471805599453
                   + (1.0 - CAST(cb_int AS DOUBLE) / nb) / 2.0
                     * 0.6931471805599453) * 1000000 + {_OFF})
            AS BIGINT) AS jsd_e6
FROM agg
ORDER BY lang_a, lang_b
"""

QUERIES["jensen_shannon_langs"] = q_jensen_shannon_langs
ORACLE_SQL["jensen_shannon_langs"] = SQL_JENSEN_SHANNON


# ---------------------------------------------------------------------------
# canberra_sources — normalized Canberra distance between source
# word-count profiles
# ---------------------------------------------------------------------------
# Canberra(a,b) = sum_union |x-y|/(x+y).  A word absent on one side
# contributes exactly 1, so the union decomposes as
#   sum_inter |x-y|/(x+y) + (Va - Vint) + (Vb - Vint),
# needing only the inner join plus per-source vocabulary sizes.
# Reported normalized by the union size (Lance-Williams form).


def q_canberra_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnt = _word_counts(spark, sf_dir, "source")
    voc = cnt.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = cnt.select(
        F.col("source").alias("src_a"), "w", F.col("c").alias("ca")
    )
    b = cnt.select(
        F.col("source").alias("src_b"), "w", F.col("c").alias("cb")
    )
    pairs = a.join(b, "w").filter(F.col("src_a") < F.col("src_b"))
    term = (
        F.abs(F.col("ca") - F.col("cb")).cast("double")
        / (F.col("ca") + F.col("cb")).cast("double")
    )
    pairs = pairs.withColumn(
        "t9", F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
    )
    agg = pairs.groupBy("src_a", "src_b").agg(
        F.sum("t9").alias("s9"),
        F.count(F.lit(1)).alias("v_int"),
    )
    va = voc.select(
        F.col("source").alias("src_a"), F.col("v").alias("va")
    )
    vb = voc.select(
        F.col("source").alias("src_b"), F.col("v").alias("vb")
    )
    out = agg.join(F.broadcast(va), "src_a").join(
        F.broadcast(vb), "src_b"
    )
    dist = (
        F.col("s9").cast("double") / 1e9
        + (F.col("va") - F.col("v_int")).cast("double")
        + (F.col("vb") - F.col("v_int")).cast("double")
    )
    n_union = (
        F.col("va") + F.col("vb") - F.col("v_int")
    ).cast("double")
    return out.select(
        "src_a",
        "src_b",
        (F.col("va") + F.col("vb") - F.col("v_int"))
        .cast("long")
        .alias("n_union"),
        F.floor(dist / n_union * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("canberra_e6"),
    ).orderBy("src_a", "src_b")


SQL_CANBERRA = f"""{_counts_cte("source")}
, voc AS (
  SELECT source, CAST(count(*) AS BIGINT) AS v FROM cnt GROUP BY 1
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(sum(CAST(floor(CAST(abs(a.c - b.c) AS DOUBLE)
                             / (a.c + b.c) * 1e9 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS s9,
         CAST(count(*) AS BIGINT) AS v_int
  FROM cnt a JOIN cnt b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b,
       CAST(va.v + vb.v - p.v_int AS BIGINT) AS n_union,
       CAST(floor((CAST(p.s9 AS DOUBLE) / 1e9
                   + (va.v - p.v_int) + (vb.v - p.v_int))
                  / (va.v + vb.v - p.v_int) * 1000000 + {_OFF})
            AS BIGINT) AS canberra_e6
FROM pairs p
JOIN voc va ON va.source = p.src_a
JOIN voc vb ON vb.source = p.src_b
ORDER BY p.src_a, p.src_b
"""

QUERIES["canberra_sources"] = q_canberra_sources
ORACLE_SQL["canberra_sources"] = SQL_CANBERRA


# ===========================================================================
# Battery C — spatial/temporal dispersion (quadrat-count ecology) and
# binomial overdispersion over the events stream.
#
# Quadrats are deterministic cells (user_id % 16 buckets x day, or
# calendar hours), so zero cells never need materializing: with B
# quadrats and nonzero-cell sums s1 = sum c, s2 = sum c^2, the moments
# are m = s1/B and var = (s2 - s1^2/B)/(B-1) — all exact integers in
# both engines until the final division.
# ===========================================================================

_EVENTS_DAY_BUCKET_CTE = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         user_id % 16 AS bucket
  FROM events
), cells AS (
  SELECT event_type, day, bucket, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2, 3
)"""


def _event_day_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
        (F.col("user_id") % 16).alias("bucket"),
    ).groupBy("event_type", "day", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


# ---------------------------------------------------------------------------
# iwao_patchiness — Iwao's mean-crowding regression (m* on m)
# ---------------------------------------------------------------------------
# Lloyd (1967) mean crowding m* = m + s^2/m - 1 per (type, day) over
# the 16 user-bucket quadrats; Iwao (1968) regresses m* on m across
# days: intercept alpha = index of basic contagion, slope beta =
# density-contagion coefficient.  (m, m*) pairs are e6-floored before
# the exact-integer OLS (the herdan_c discipline).


def q_iwao_patchiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _event_day_cells(spark, sf_dir)
    day = cells.groupBy("event_type", "day").agg(
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    b = F.lit(16.0)
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    m = s1d / b
    var = (s2d - s1d * s1d / b) / (b - 1.0)
    mstar = m + var / m - 1.0
    pts = day.filter(F.col("s1") >= 2).select(
        "event_type",
        F.floor(m * 1e6 + F.lit(_OFF)).cast("long").alias("x6"),
        F.floor(mstar * 1e6 + F.lit(_OFF)).cast("long").alias("y6"),
    )
    agg = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").alias("sx"),
        F.sum("y6").alias("sy"),
        F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
        F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    beta = num / den
    alpha = (
        F.col("sy").cast("double") / 1e6
        - beta * F.col("sx").cast("double") / 1e6
    ) / nd
    return (
        agg.filter((F.col("n") >= 3) & (den > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.floor(alpha * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("alpha_e6"),
            F.floor(beta * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("beta_e6"),
        )
        .orderBy("event_type")
    )


SQL_IWAO = f"""{_EVENTS_DAY_BUCKET_CTE}
, day AS (
  SELECT event_type, day,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM cells GROUP BY 1, 2
), pts AS (
  SELECT event_type,
         CAST(floor(CAST(s1 AS DOUBLE) / 16.0 * 1e6 + {_OFF})
              AS BIGINT) AS x6,
         CAST(floor((CAST(s1 AS DOUBLE) / 16.0
                     + ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
                         / 16.0) / 15.0)
                       / (CAST(s1 AS DOUBLE) / 16.0)
                     - 1.0) * 1e6 + {_OFF}) AS BIGINT) AS y6
  FROM day WHERE s1 >= 2
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
         CAST(sum(x6 * y6) AS BIGINT) AS sxy,
         CAST(sum(x6 * x6) AS BIGINT) AS sxx
  FROM pts GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor((CAST(sy AS DOUBLE) / 1e6
                   - (CAST(n AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx)
                     * CAST(sx AS DOUBLE) / 1e6)
                  / n * 1000000 + {_OFF}) AS BIGINT) AS alpha_e6,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * 1000000 + {_OFF}) AS BIGINT) AS beta_e6
FROM agg
WHERE n >= 3
  AND CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
ORDER BY event_type
"""

QUERIES["iwao_patchiness"] = q_iwao_patchiness
ORACLE_SQL["iwao_patchiness"] = SQL_IWAO


# ---------------------------------------------------------------------------
# lloyd_green_dispersion — Lloyd patchiness index + Green's coefficient
# ---------------------------------------------------------------------------
# Hourly quadrats per event_type over the type's own calendar span
# (B = hmax - hmin + 1 grid hours, zero cells implicit).  Lloyd
# patchiness P = m*/m; Green Cx = (s^2/m - 1)/(N - 1) — 0 for random
# (Poisson), 1 for maximally clumped.


def q_lloyd_green_dispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = ev.select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        )
        .cast("long")
        .alias("slot"),
    ).groupBy("event_type", "slot").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = cells.groupBy("event_type").agg(
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.min("slot").alias("hmin"),
        F.max("slot").alias("hmax"),
    )
    b = (F.col("hmax") - F.col("hmin") + 1).cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    m = s1d / b
    var = (s2d - s1d * s1d / b) / (b - 1.0)
    mstar = m + var / m - 1.0
    lloyd = mstar / m
    green = (var / m - 1.0) / (s1d - 1.0)
    return (
        agg.filter((F.col("s1") >= 2) & (F.col("hmax") > F.col("hmin")))
        .select(
            "event_type",
            (F.col("hmax") - F.col("hmin") + 1)
            .cast("long")
            .alias("n_quadrats"),
            F.col("s1").cast("long").alias("n_events"),
            F.floor(lloyd * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("lloyd_e6"),
            F.floor(green * 1_000_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("green_e9"),
        )
        .orderBy("event_type")
    )


SQL_LLOYD_GREEN = f"""
WITH cells AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2,
         min(slot) AS hmin, max(slot) AS hmax
  FROM cells GROUP BY 1
), m AS (
  SELECT event_type, s1, s2,
         CAST(hmax - hmin + 1 AS BIGINT) AS nq,
         CAST(s1 AS DOUBLE) / (hmax - hmin + 1) AS mm,
         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
          / (hmax - hmin + 1)) / (hmax - hmin + 1 - 1.0) AS vv
  FROM agg WHERE s1 >= 2 AND hmax > hmin
)
SELECT event_type, nq AS n_quadrats, s1 AS n_events,
       CAST(floor((mm + vv / mm - 1.0) / mm * 1000000 + {_OFF})
            AS BIGINT) AS lloyd_e6,
       CAST(floor((vv / mm - 1.0) / (CAST(s1 AS DOUBLE) - 1.0)
                  * 1000000000 + {_OFF}) AS BIGINT) AS green_e9
FROM m
ORDER BY event_type
"""

QUERIES["lloyd_green_dispersion"] = q_lloyd_green_dispersion
ORACLE_SQL["lloyd_green_dispersion"] = SQL_LLOYD_GREEN


# ---------------------------------------------------------------------------
# beta_binomial_mom — intra-day clustering of binary outcomes
# ---------------------------------------------------------------------------
# Days are clusters; success = value > 50.  The ANOVA method of
# moments for clustered binary data (Kleinman 1973):
#   MSB = sum n_i (p_i - pbar)^2 / (k-1)
#   MSW = sum n_i p_i (1-p_i) / sum (n_i - 1)
#   n_c = (N - sum n_i^2 / N) / (k-1)
#   rho = (MSB - MSW) / (MSB + (n_c - 1) MSW)
# Every sum is over exact integers (x_i, n_i), so MSB/MSW are
# deterministic doubles: n_i p_i(1-p_i) = x_i(n_i-x_i)/n_i and
# n_i(p_i-pbar)^2 = (x_i - n_i pbar)^2 / n_i with pbar = X/N exact.


def q_beta_binomial_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = ev.select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("s"),
    ).groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("x"),
    )
    tot = day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("x").alias("xx"),
        F.sum(F.col("n") * F.col("n")).alias("sn2"),
    )
    joined = day.join(
        F.broadcast(
            tot.select(
                "event_type",
                (F.col("xx").cast("double") / F.col("nn").cast("double"))
                .alias("pbar"),
            )
        ),
        "event_type",
    )
    xd = F.col("x").cast("double")
    ndc = F.col("n").cast("double")
    bsum = joined.groupBy("event_type").agg(
        F.sum(
            F.floor(
                (xd - ndc * F.col("pbar"))
                * (xd - ndc * F.col("pbar"))
                / ndc
                * 1e6
                + F.lit(_OFF)
            ).cast("long")
        ).alias("ssb6"),
        F.sum(
            F.floor(xd * (ndc - xd) / ndc * 1e6 + F.lit(_OFF)).cast(
                "long"
            )
        ).alias("ssw6"),
    )
    out = tot.join(bsum, "event_type")
    kd = F.col("k").cast("double")
    nd2 = F.col("nn").cast("double")
    msb = F.col("ssb6").cast("double") / 1e6 / (kd - 1.0)
    msw = F.col("ssw6").cast("double") / 1e6 / (nd2 - kd)
    nc = (nd2 - F.col("sn2").cast("double") / nd2) / (kd - 1.0)
    rho = (msb - msw) / (msb + (nc - 1.0) * msw)
    return (
        out.filter((F.col("k") >= 3) & (F.col("nn") > F.col("k")))
        .select(
            "event_type",
            F.col("k").cast("long").alias("n_days"),
            F.floor(
                F.col("xx").cast("double") / nd2 * 1_000_000
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("pbar_e6"),
            F.floor(rho * 1_000_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("rho_e9"),
        )
        .orderBy("event_type")
    )


SQL_BETA_BINOM = f"""
WITH day AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(x) AS BIGINT) AS xx,
         CAST(sum(n * n) AS BIGINT) AS sn2
  FROM day GROUP BY 1
), bsum AS (
  SELECT d.event_type,
         CAST(sum(CAST(floor((d.x - d.n * (CAST(t.xx AS DOUBLE) / t.nn))
                             * (d.x - d.n * (CAST(t.xx AS DOUBLE) / t.nn))
                             / d.n * 1e6 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ssb6,
         CAST(sum(CAST(floor(CAST(d.x AS DOUBLE) * (d.n - d.x) / d.n
                             * 1e6 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ssw6
  FROM day d JOIN tot t ON t.event_type = d.event_type
  GROUP BY 1
)
SELECT t.event_type, t.k AS n_days,
       CAST(floor(CAST(t.xx AS DOUBLE) / t.nn * 1000000 + {_OFF})
            AS BIGINT) AS pbar_e6,
       CAST(floor((CAST(b.ssb6 AS DOUBLE) / 1e6 / (t.k - 1.0)
                   - CAST(b.ssw6 AS DOUBLE) / 1e6
                     / (t.nn - CAST(t.k AS DOUBLE)))
                  / (CAST(b.ssb6 AS DOUBLE) / 1e6 / (t.k - 1.0)
                     + (((t.nn - CAST(t.sn2 AS DOUBLE) / t.nn)
                         / (t.k - 1.0)) - 1.0)
                       * (CAST(b.ssw6 AS DOUBLE) / 1e6
                          / (t.nn - CAST(t.k AS DOUBLE))))
                  * 1000000000 + {_OFF}) AS BIGINT) AS rho_e9
FROM tot t JOIN bsum b ON b.event_type = t.event_type
WHERE t.k >= 3 AND t.nn > t.k
ORDER BY t.event_type
"""

QUERIES["beta_binomial_mom"] = q_beta_binomial_mom
ORACLE_SQL["beta_binomial_mom"] = SQL_BETA_BINOM


# ===========================================================================
# Battery D — regression extensions: closed-form ridge, the Rainbow
# linearity test, and a Gamma GLM with log link by two unrolled
# Fisher-scoring steps (the poisson/logistic_glm_newton posture:
# cells x broadcast(param row), fixed iteration count, no driver loop).
# ===========================================================================


# ---------------------------------------------------------------------------
# ridge_regression — L2-regularized two-predictor linear model
# ---------------------------------------------------------------------------
# y = daily mean centi-value; x1 = day index (trend), x2 = day-of-week
# weekend flag, both standardized; lambda = 1.0.  beta =
# (X'X + n*lambda*I)^-1 X'y with the 2x2 inverse in closed form.
# All cross-moments are exact integers (x1 integer days, x2 binary,
# y e2-floored), so the solve is a deterministic double expression.


def q_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    daily = daily.withColumn(
        "x2", ((F.col("day") + 4) % 7 >= 5).cast("long")
    )
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").alias("s1"),
        F.sum(F.col("day") * F.col("day")).alias("s11"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("day") * F.col("x2")).alias("s12"),
        F.sum("y").alias("sy"),
        F.sum(F.col("day") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd
    my = F.col("sy").cast("double") / nd
    v1 = F.col("s11").cast("double") / nd - m1 * m1
    v2 = F.col("s22").cast("double") / nd - m2 * m2
    sd1 = F.sqrt(v1)
    sd2 = F.sqrt(v2)
    # standardized centered cross-moments
    c11 = nd  # sum z1^2 = n when dividing by population sd
    c22 = nd
    c12 = (F.col("s12").cast("double") - nd * m1 * m2) / (sd1 * sd2)
    c1y = (F.col("s1y").cast("double") - nd * m1 * my) / sd1
    c2y = (F.col("s2y").cast("double") - nd * m2 * my) / sd2
    lam = nd * 1.0
    a11 = c11 + lam
    a22 = c22 + lam
    det = a11 * a22 - c12 * c12
    b1 = (a22 * c1y - c12 * c2y) / det
    b2 = (a11 * c2y - c12 * c1y) / det
    return (
        agg.filter((F.col("n") >= 3) & (v1 > 0) & (v2 > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.floor(b1 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "beta_trend_e4"
            ),
            F.floor(b2 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "beta_weekend_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_RIDGE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d2 AS (
  SELECT *, CASE WHEN (day + 4) % 7 >= 5 THEN 1 ELSE 0 END AS x2
  FROM daily
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(day) AS BIGINT) AS s1,
         CAST(sum(day * day) AS BIGINT) AS s11,
         CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(day * x2) AS BIGINT) AS s12,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(day * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y
  FROM d2 GROUP BY 1
), m AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS m1, CAST(s2 AS DOUBLE) / n AS m2,
         CAST(sy AS DOUBLE) / n AS my,
         CAST(s11 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS v1,
         CAST(s22 AS DOUBLE) / n
           - (CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n) AS v2,
         CAST(s12 AS DOUBLE) AS s12d, CAST(s1y AS DOUBLE) AS s1yd,
         CAST(s2y AS DOUBLE) AS s2yd
  FROM agg
), z AS (
  SELECT event_type, n, v1, v2,
         (s12d - n * m1 * m2) / (sqrt(v1) * sqrt(v2)) AS c12,
         (s1yd - n * m1 * my) / sqrt(v1) AS c1y,
         (s2yd - n * m2 * my) / sqrt(v2) AS c2y,
         CAST(n AS DOUBLE) + n * 1.0 AS a11,
         CAST(n AS DOUBLE) + n * 1.0 AS a22
  FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor((a22 * c1y - c12 * c2y) / (a11 * a22 - c12 * c12)
                  * 10000 + {_OFF}) AS BIGINT) AS beta_trend_e4,
       CAST(floor((a11 * c2y - c12 * c1y) / (a11 * a22 - c12 * c12)
                  * 10000 + {_OFF}) AS BIGINT) AS beta_weekend_e4
FROM z
WHERE n >= 3 AND v1 > 0 AND v2 > 0
ORDER BY event_type
"""

QUERIES["ridge_regression"] = q_ridge_regression
ORACLE_SQL["ridge_regression"] = SQL_RIDGE


# ---------------------------------------------------------------------------
# rainbow_test — Utts (1982) linearity test
# ---------------------------------------------------------------------------
# Fit daily-mean ~ day by OLS on the FULL span and on the MIDDLE HALF
# (days within the central 50% by day index, a calendar predicate —
# no sort needed).  F = ((RSS_full - RSS_mid)/(n - n_mid)) /
# (RSS_mid/(n_mid - 2)).  RSS computed from exact integer moments via
# RSS = Syy - Sxy^2/Sxx on centered sums.


def q_rainbow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    j = daily.join(F.broadcast(bounds), "event_type")
    span = F.col("dmax") - F.col("dmin")
    lo = F.col("dmin").cast("double") + 0.25 * span.cast("double")
    hi = F.col("dmin").cast("double") + 0.75 * span.cast("double")
    mid = (F.col("day") >= lo) & (F.col("day") <= hi)

    def olsagg(df, flag, tag):
        src = df.filter(flag) if flag is not None else df
        return src.groupBy("event_type").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum("day").alias(f"sx_{tag}"),
            F.sum(F.col("day") * F.col("day")).alias(f"sxx_{tag}"),
            F.sum("y").alias(f"sy_{tag}"),
            F.sum(F.col("day") * F.col("y")).alias(f"sxy_{tag}"),
            F.sum(F.col("y") * F.col("y")).alias(f"syy_{tag}"),
        )

    full = olsagg(j, None, "f")
    mida = olsagg(j, mid, "m")
    out = full.join(mida, "event_type")

    def rss(tag):
        n = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        sxy = F.col(f"sxy_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        cxx = sxx - sx * sx / n
        cxy = sxy - sx * sy / n
        cyy = syy - sy * sy / n
        return cyy - cxy * cxy / cxx

    rf = rss("f")
    rm = rss("m")
    nf = F.col("n_f").cast("double")
    nm = F.col("n_m").cast("double")
    fstat = ((rf - rm) / (nf - nm)) / (rm / (nm - 2.0))
    return (
        out.filter(
            (F.col("n_m") >= 3) & (F.col("n_f") > F.col("n_m")) & (rm > 0)
        )
        .select(
            "event_type",
            F.col("n_f").cast("long").alias("n_days"),
            F.col("n_m").cast("long").alias("n_mid"),
            F.floor(fstat * 10_000 + F.lit(_OFF)).cast("long").alias(
                "f_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_RAINBOW = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(day) AS dmin, max(day) AS dmax
  FROM daily GROUP BY 1
), j AS (
  SELECT d.*,
         CASE WHEN d.day >= b.dmin + 0.25 * (b.dmax - b.dmin)
               AND d.day <= b.dmin + 0.75 * (b.dmax - b.dmin)
              THEN 1 ELSE 0 END AS in_mid
  FROM daily d JOIN bounds b ON b.event_type = d.event_type
), agg AS (
  SELECT event_type,
         count(*) AS n_f,
         CAST(sum(day) AS BIGINT) AS sx_f,
         CAST(sum(day * day) AS BIGINT) AS sxx_f,
         CAST(sum(y) AS BIGINT) AS sy_f,
         CAST(sum(day * y) AS BIGINT) AS sxy_f,
         CAST(sum(y * y) AS BIGINT) AS syy_f,
         CAST(sum(in_mid) AS BIGINT) AS n_m,
         CAST(sum(CASE WHEN in_mid = 1 THEN day ELSE 0 END)
              AS BIGINT) AS sx_m,
         CAST(sum(CASE WHEN in_mid = 1 THEN day * day ELSE 0 END)
              AS BIGINT) AS sxx_m,
         CAST(sum(CASE WHEN in_mid = 1 THEN y ELSE 0 END)
              AS BIGINT) AS sy_m,
         CAST(sum(CASE WHEN in_mid = 1 THEN day * y ELSE 0 END)
              AS BIGINT) AS sxy_m,
         CAST(sum(CASE WHEN in_mid = 1 THEN y * y ELSE 0 END)
              AS BIGINT) AS syy_m
  FROM j GROUP BY 1
), r AS (
  SELECT event_type, n_f, n_m,
         (CAST(syy_f AS DOUBLE) - CAST(sy_f AS DOUBLE) * sy_f / n_f)
         - (CAST(sxy_f AS DOUBLE) - CAST(sx_f AS DOUBLE) * sy_f / n_f)
           * (CAST(sxy_f AS DOUBLE) - CAST(sx_f AS DOUBLE) * sy_f / n_f)
           / (CAST(sxx_f AS DOUBLE) - CAST(sx_f AS DOUBLE) * sx_f / n_f)
           AS rf,
         (CAST(syy_m AS DOUBLE) - CAST(sy_m AS DOUBLE) * sy_m / n_m)
         - (CAST(sxy_m AS DOUBLE) - CAST(sx_m AS DOUBLE) * sy_m / n_m)
           * (CAST(sxy_m AS DOUBLE) - CAST(sx_m AS DOUBLE) * sy_m / n_m)
           / (CAST(sxx_m AS DOUBLE) - CAST(sx_m AS DOUBLE) * sx_m / n_m)
           AS rm
  FROM agg
)
SELECT event_type, CAST(n_f AS BIGINT) AS n_days,
       CAST(n_m AS BIGINT) AS n_mid,
       CAST(floor(((rf - rm) / (n_f - CAST(n_m AS DOUBLE)))
                  / (rm / (n_m - 2.0)) * 10000 + {_OFF})
            AS BIGINT) AS f_e4
FROM r
WHERE n_m >= 3 AND n_f > n_m AND rm > 0
ORDER BY event_type
"""

QUERIES["rainbow_test"] = q_rainbow_test
ORACLE_SQL["rainbow_test"] = SQL_RAINBOW


# ---------------------------------------------------------------------------
# gamma_glm_newton — Gamma GLM, log link, two unrolled Fisher-scoring
# steps: value ~ standardized hour-of-day
# ---------------------------------------------------------------------------
# With log link the working update is beta += (X'WX)^-1 X'(y/mu - 1)
# with W = I (Fisher weights are constant for Gamma/log), so each step
# needs only the per-hour sufficient statistics (n_h, S_h = sum y):
# sum_i in h (y_i/mu_h - 1) = S_h/mu_h - n_h.  The 24-row hour domain
# collapses the corpus before ANY float math; per-hour step terms are
# e6-floored so both engines take identical Newton paths.  Start at
# (ln ybar, 0) — the null model.


def q_gamma_glm_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("h"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "yv"
        ),
    ).groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("yv").alias("s_h"),
    )
    mom = cells.groupBy("event_type").agg(
        F.sum("n_h").alias("n"),
        F.sum("s_h").alias("sy"),
        F.sum(F.col("n_h") * F.col("h")).alias("sh"),
        F.sum(F.col("n_h") * F.col("h") * F.col("h")).alias("shh"),
    )
    nd = F.col("n").cast("double")
    mh = F.col("sh").cast("double") / nd
    vh = F.col("shh").cast("double") / nd - mh * mh
    mom = mom.select(
        "event_type",
        "n",
        mh.alias("mh"),
        F.sqrt(vh).alias("sdh"),
        F.log(F.col("sy").cast("double") / 100.0 / nd).alias("a0"),
    ).filter((F.col("sy") > 0) & (vh > 0))

    def step(params: DataFrame, acol: str, bcol: str, tag: str):
        j = cells.join(F.broadcast(params), "event_type")
        x = (F.col("h").cast("double") - F.col("mh")) / F.col("sdh")
        mu = F.exp(F.col(acol) + F.col(bcol) * x)
        g = F.col("s_h").cast("double") / 100.0 / mu - F.col(
            "n_h"
        ).cast("double")
        nhd = F.col("n_h").cast("double")
        t = j.select(
            "event_type",
            acol,
            bcol,
            "mh",
            "sdh",
            F.floor(g * 1e6 + F.lit(_OFF)).cast("long").alias("g1"),
            F.floor(x * g * 1e6 + F.lit(_OFF)).cast("long").alias("g2"),
            F.floor(nhd * x * 1e9 + F.lit(_OFF)).cast("long").alias(
                "sx9"
            ),
            F.floor(nhd * x * x * 1e9 + F.lit(_OFF))
            .cast("long")
            .alias("sxx9"),
            F.col("n_h").alias("n_h"),
        )
        agg = t.groupBy("event_type", acol, bcol, "mh", "sdh").agg(
            F.sum("g1").alias("sg1"),
            F.sum("g2").alias("sg2"),
            F.sum("sx9").alias("ssx"),
            F.sum("sxx9").alias("ssxx"),
            F.sum("n_h").alias("s0"),
        )
        g1 = F.col("sg1").cast("double") / 1e6
        g2 = F.col("sg2").cast("double") / 1e6
        s0 = F.col("s0").cast("double")
        sx = F.col("ssx").cast("double") / 1e9
        sxx = F.col("ssxx").cast("double") / 1e9
        det = s0 * sxx - sx * sx
        return agg.select(
            "event_type",
            "mh",
            "sdh",
            (F.col(acol) + (sxx * g1 - sx * g2) / det).alias(f"a{tag}"),
            (F.col(bcol) + (s0 * g2 - sx * g1) / det).alias(f"b{tag}"),
        )

    p0 = mom.select(
        "event_type", "mh", "sdh", F.col("a0"), F.lit(0.0).alias("b0")
    )
    p1 = step(p0, "a0", "b0", "1")
    p2 = step(p1, "a1", "b1", "2")
    out = p2.join(F.broadcast(mom.select("event_type", "n")), "event_type")
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("a2") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("alpha_e6"),
        F.floor(F.col("b2") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("beta_e6"),
    ).orderBy("event_type")


def _gg_step_sql(prev: str, acol: str, bcol: str, tag: str) -> str:
    x = f"((c.h - p.mh) / p.sdh)"
    mu = f"exp(p.{acol} + p.{bcol} * {x})"
    g = f"(CAST(c.s_h AS DOUBLE) / 100.0 / {mu} - c.n_h)"
    return f""",
  t{tag} AS (
    SELECT c.event_type, p.{acol}, p.{bcol}, p.mh, p.sdh,
           CAST(floor({g} * 1e6 + {_OFF}) AS BIGINT) AS g1,
           CAST(floor({x} * {g} * 1e6 + {_OFF}) AS BIGINT) AS g2,
           CAST(floor(c.n_h * {x} * 1e9 + {_OFF}) AS BIGINT) AS sx9,
           CAST(floor(c.n_h * {x} * {x} * 1e9 + {_OFF})
                AS BIGINT) AS sxx9,
           c.n_h
    FROM cells c JOIN {prev} p ON p.event_type = c.event_type
  ), s{tag} AS (
    SELECT event_type, {acol}, {bcol}, mh, sdh,
           CAST(sum(g1) AS BIGINT) AS sg1,
           CAST(sum(g2) AS BIGINT) AS sg2,
           CAST(sum(sx9) AS BIGINT) AS ssx,
           CAST(sum(sxx9) AS BIGINT) AS ssxx,
           CAST(sum(n_h) AS BIGINT) AS s0
    FROM t{tag} GROUP BY 1, 2, 3, 4, 5
  ), p{tag} AS (
    SELECT event_type, mh, sdh,
           {acol} + (CAST(ssxx AS DOUBLE) / 1e9
                     * (CAST(sg1 AS DOUBLE) / 1e6)
                     - CAST(ssx AS DOUBLE) / 1e9
                       * (CAST(sg2 AS DOUBLE) / 1e6))
                    / (CAST(s0 AS DOUBLE) * (CAST(ssxx AS DOUBLE) / 1e9)
                       - (CAST(ssx AS DOUBLE) / 1e9)
                         * (CAST(ssx AS DOUBLE) / 1e9)) AS a{tag},
           {bcol} + (CAST(s0 AS DOUBLE)
                     * (CAST(sg2 AS DOUBLE) / 1e6)
                     - CAST(ssx AS DOUBLE) / 1e9
                       * (CAST(sg1 AS DOUBLE) / 1e6))
                    / (CAST(s0 AS DOUBLE) * (CAST(ssxx AS DOUBLE) / 1e9)
                       - (CAST(ssx AS DOUBLE) / 1e9)
                         * (CAST(ssx AS DOUBLE) / 1e9)) AS b{tag}
    FROM s{tag}
  )"""


SQL_GAMMA_GLM = f"""
WITH cells AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s_h
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT event_type,
         CAST(sum(n_h) AS BIGINT) AS n,
         CAST(sum(s_h) AS BIGINT) AS sy,
         CAST(sum(n_h * h) AS BIGINT) AS sh,
         CAST(sum(n_h * h * h) AS BIGINT) AS shh
  FROM cells GROUP BY 1
), p0 AS (
  SELECT event_type,
         CAST(sh AS DOUBLE) / n AS mh,
         sqrt(CAST(shh AS DOUBLE) / n
              - (CAST(sh AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n))
           AS sdh,
         ln(CAST(sy AS DOUBLE) / 100.0 / n) AS a0,
         0.0 AS b0, n
  FROM mom
  WHERE sy > 0
    AND CAST(shh AS DOUBLE) / n
        - (CAST(sh AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n) > 0
){_gg_step_sql("p0", "a0", "b0", "1")}{_gg_step_sql("p1", "a1", "b1", "2")}
SELECT p2.event_type, p0.n AS n,
       CAST(floor(p2.a2 * 1000000 + {_OFF}) AS BIGINT) AS alpha_e6,
       CAST(floor(p2.b2 * 1000000 + {_OFF}) AS BIGINT) AS beta_e6
FROM p2 JOIN p0 ON p0.event_type = p2.event_type
ORDER BY p2.event_type
"""

QUERIES["gamma_glm_newton"] = q_gamma_glm_newton
ORACLE_SQL["gamma_glm_newton"] = SQL_GAMMA_GLM


# ===========================================================================
# Battery E — robust association / robust ANOVA / MANOVA extremes:
# Blomqvist's medial correlation, the Alexander-Govern heteroscedastic
# one-way test, and Roy's largest root for the diel 3-group MANOVA
# (the eigen sibling of pillai_manova / wilks_lambda).
# ===========================================================================


# ---------------------------------------------------------------------------
# blomqvist_beta — quadrant (medial) correlation between daily mean
# value and daily event count
# ---------------------------------------------------------------------------
# Blomqvist (1950): beta = (n_concordant - n_discordant)/n relative to
# the coordinatewise medians.  Lower medians are picked by rank over
# the BOUNDED day domain (deterministic total order with day as
# tie-break); days sitting exactly on a median are excluded (the
# classical treatment of ties).


def q_blomqvist_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    wn = Window.partitionBy("event_type")
    wy = Window.partitionBy("event_type").orderBy("y", "day")
    wc = Window.partitionBy("event_type").orderBy("c", "day")
    d2 = (
        daily.withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("ry", F.row_number().over(wy))
        .withColumn("rc", F.row_number().over(wc))
    )
    med_pos = F.floor((F.col("n") + 1) / 2).cast("long")
    my = d2.filter(F.col("ry") == med_pos).select(
        "event_type", F.col("y").alias("my")
    )
    mc = d2.filter(F.col("rc") == med_pos).select(
        "event_type", F.col("c").alias("mc")
    )
    j = daily.join(F.broadcast(my), "event_type").join(
        F.broadcast(mc), "event_type"
    )
    j = j.filter((F.col("y") != F.col("my")) & (F.col("c") != F.col("mc")))
    conc = (
        ((F.col("y") > F.col("my")) & (F.col("c") > F.col("mc")))
        | ((F.col("y") < F.col("my")) & (F.col("c") < F.col("mc")))
    ).cast("long")
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(conc).alias("n_conc"),
    )
    beta = (
        2.0 * F.col("n_conc").cast("double")
        - F.col("n_used").cast("double")
    ) / F.col("n_used").cast("double")
    return (
        agg.filter(F.col("n_used") >= 4)
        .select(
            "event_type",
            F.col("n_used").cast("long").alias("n_used"),
            F.floor(beta * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("beta_e6"),
        )
        .orderBy("event_type")
    )


SQL_BLOMQVIST = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *,
         count(*) OVER (PARTITION BY event_type) AS n,
         row_number() OVER (PARTITION BY event_type ORDER BY y, day)
           AS ry,
         row_number() OVER (PARTITION BY event_type ORDER BY c, day)
           AS rc
  FROM daily
), my AS (
  SELECT event_type, y AS my FROM r WHERE ry = CAST(floor((n + 1) / 2.0) AS BIGINT)
), mc AS (
  SELECT event_type, c AS mc FROM r WHERE rc = CAST(floor((n + 1) / 2.0) AS BIGINT)
), j AS (
  SELECT d.event_type, d.y, d.c, my.my, mc.mc
  FROM daily d
  JOIN my ON my.event_type = d.event_type
  JOIN mc ON mc.event_type = d.event_type
  WHERE d.y <> my.my AND d.c <> mc.mc
), agg AS (
  SELECT event_type, count(*) AS n_used,
         CAST(sum(CASE WHEN (y > my AND c > mc) OR (y < my AND c < mc)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_conc
  FROM j GROUP BY 1
)
SELECT event_type, CAST(n_used AS BIGINT) AS n_used,
       CAST(floor((2.0 * n_conc - n_used) / n_used * 1000000 + {_OFF})
            AS BIGINT) AS beta_e6
FROM agg
WHERE n_used >= 4
ORDER BY event_type
"""

QUERIES["blomqvist_beta"] = q_blomqvist_beta
ORACLE_SQL["blomqvist_beta"] = SQL_BLOMQVIST


# ---------------------------------------------------------------------------
# alexander_govern — heteroscedastic one-way test across day-of-week
# groups (Alexander & Govern 1994)
# ---------------------------------------------------------------------------
# Per group: t_j = (mean_j - yhat)/se_j with yhat the inverse-variance
# weighted grand mean; Hill's normalizing transform
#   a = nu - 0.5, b = 48 a^2, c = sqrt(a ln(1 + t^2/nu))
#   z = c + (c^3 + 3c)/b - (4c^7 + 33c^5 + 240c^3 + 855c)
#       / (10 b^2 + 8 b c^4 + 1000 b)
# A = sum z_j^2 ~ chi2(k-1).  Group moments are exact integers; z^2
# terms are e9-floored before the cross-engine sum.


def q_alexander_govern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    ).filter(F.col("n") >= 3)
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd / 100.0
    var = (
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / nd
        )
        / (nd - 1.0)
        / 10_000.0
    )
    se2 = var / nd
    g = g.select(
        "event_type", "dow", "n", mean.alias("m"), se2.alias("se2")
    ).filter(F.col("se2") > 0)
    tot = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.floor(1.0 / F.col("se2") * 1e9 + F.lit(_OFF)).cast(
                "long"
            )
        ).alias("sw9"),
        F.sum(
            F.floor(F.col("m") / F.col("se2") * 1e9 + F.lit(_OFF))
            .cast("long")
        ).alias("swm9"),
    )
    j = g.join(F.broadcast(tot), "event_type")
    yhat = F.col("swm9").cast("double") / F.col("sw9").cast("double")
    t = (F.col("m") - yhat) / F.sqrt(F.col("se2"))
    nu = (F.col("n") - 1).cast("double")
    a = nu - 0.5
    b = 48.0 * a * a
    c = F.sqrt(a * F.log(1.0 + t * t / nu))
    z = (
        c
        + (c * c * c + 3.0 * c) / b
        - (
            4.0 * F.pow(c, 7)
            + 33.0 * F.pow(c, 5)
            + 240.0 * c * c * c
            + 855.0 * c
        )
        / (10.0 * b * b + 8.0 * b * F.pow(c, 4) + 1000.0 * b)
    )
    zsq = F.when(t < 0, z * z).otherwise(z * z)  # z^2 is sign-free
    j = j.withColumn(
        "z9", F.floor(zsq * 1e9 + F.lit(_OFF)).cast("long")
    )
    agg = j.groupBy("event_type").agg(
        F.max("k").alias("k"), F.sum("z9").alias("a9")
    )
    return (
        agg.filter(F.col("k") >= 2)
        .select(
            "event_type",
            F.col("k").cast("long").alias("k_groups"),
            F.floor(
                F.col("a9").cast("double") / 1e9 * 10_000 + F.lit(_OFF)
            )
            .cast("long")
            .alias("a_e4"),
        )
        .orderBy("event_type")
    )


SQL_ALEXANDER = f"""
WITH g AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ss
  FROM events GROUP BY 1, 2
  HAVING count(*) >= 3
), m AS (
  SELECT event_type, dow, n,
         CAST(s AS DOUBLE) / n / 100.0 AS m,
         ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1.0)
          / 10000.0) / n AS se2
  FROM g
), m2 AS (
  SELECT * FROM m WHERE se2 > 0
), tot AS (
  SELECT event_type, count(*) AS k,
         CAST(sum(CAST(floor(1.0 / se2 * 1e9 + {_OFF}) AS BIGINT))
              AS BIGINT) AS sw9,
         CAST(sum(CAST(floor(m / se2 * 1e9 + {_OFF}) AS BIGINT))
              AS BIGINT) AS swm9
  FROM m2 GROUP BY 1
), z AS (
  SELECT m2.event_type, t.k,
         CAST(floor(
           (c + (c*c*c + 3.0*c) / b
              - (4.0*c*c*c*c*c*c*c + 33.0*c*c*c*c*c + 240.0*c*c*c
                 + 855.0*c)
                / (10.0*b*b + 8.0*b*c*c*c*c + 1000.0*b))
           * (c + (c*c*c + 3.0*c) / b
              - (4.0*c*c*c*c*c*c*c + 33.0*c*c*c*c*c + 240.0*c*c*c
                 + 855.0*c)
                / (10.0*b*b + 8.0*b*c*c*c*c + 1000.0*b))
           * 1e9 + {_OFF}) AS BIGINT) AS z9
  FROM (
    SELECT m2.*, t.k,
           sqrt((n - 1.5)
                * ln(1.0 + ((m - CAST(t.swm9 AS DOUBLE) / t.sw9)
                            / sqrt(se2))
                           * ((m - CAST(t.swm9 AS DOUBLE) / t.sw9)
                              / sqrt(se2))
                           / (n - 1.0))) AS c,
           48.0 * (n - 1.5) * (n - 1.5) AS b
    FROM m2 JOIN tot t ON t.event_type = m2.event_type
  ) m2
  JOIN tot t ON t.event_type = m2.event_type
), agg AS (
  SELECT event_type, max(k) AS k, CAST(sum(z9) AS BIGINT) AS a9
  FROM z GROUP BY 1
)
SELECT event_type, CAST(k AS BIGINT) AS k_groups,
       CAST(floor(CAST(a9 AS DOUBLE) / 1e9 * 10000 + {_OFF})
            AS BIGINT) AS a_e4
FROM agg
WHERE k >= 2
ORDER BY event_type
"""

QUERIES["alexander_govern"] = q_alexander_govern
ORACLE_SQL["alexander_govern"] = SQL_ALEXANDER


# ---------------------------------------------------------------------------
# roys_largest_root — Roy's greatest characteristic root for the diel
# 3-group MANOVA on (centi-value, second-of-hour)
# ---------------------------------------------------------------------------
# The eigen sibling of pillai_manova: lambda_max of E^-1 H from the
# 2x2 characteristic quadratic lambda^2 - tr(M) lambda + det(M) = 0,
# theta = lambda_max/(1+lambda_max).  THREE diel groups (night /
# morning / evening) so H has rank 2 and the quadratic is
# non-degenerate.  SSCP blocks come from exact integer sums; the
# between-group rationals s_i s_j / n_g are per-group exact doubles
# summed over the 3-row group domain (floored e6 per group first).


def q_roys_largest_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.when(F.hour("ts") < 8, 0)
        .when(F.hour("ts") < 16, 1)
        .otherwise(2)
        .alias("g"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "y1"
        ),
        (F.minute("ts") * 60 + F.second("ts")).cast("long").alias("y2"),
    )
    gm = ev.groupBy("event_type", "g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y1").alias("s1"),
        F.sum("y2").alias("s2"),
        F.sum(F.col("y1") * F.col("y1")).alias("s11"),
        F.sum(F.col("y2") * F.col("y2")).alias("s22"),
        F.sum(F.col("y1") * F.col("y2")).alias("s12"),
    )
    b11t = F.floor(
        F.col("s1").cast("double") * F.col("s1").cast("double")
        / F.col("n")
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    b22t = F.floor(
        F.col("s2").cast("double") * F.col("s2").cast("double")
        / F.col("n")
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    b12t = F.floor(
        F.col("s1").cast("double") * F.col("s2").cast("double")
        / F.col("n")
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    tot = gm.groupBy("event_type").agg(
        F.sum("n").alias("nt"),
        F.count(F.lit(1)).alias("k"),
        F.sum("s1").alias("t1"),
        F.sum("s2").alias("t2"),
        F.sum("s11").alias("t11"),
        F.sum("s22").alias("t22"),
        F.sum("s12").alias("t12"),
        F.sum(b11t).alias("b11i"),
        F.sum(b22t).alias("b22i"),
        F.sum(b12t).alias("b12i"),
    )
    nt = F.col("nt").cast("double")
    tt11 = F.col("t11").cast("double") - F.col("t1").cast(
        "double"
    ) * F.col("t1").cast("double") / nt
    tt22 = F.col("t22").cast("double") - F.col("t2").cast(
        "double"
    ) * F.col("t2").cast("double") / nt
    tt12 = F.col("t12").cast("double") - F.col("t1").cast(
        "double"
    ) * F.col("t2").cast("double") / nt
    h11 = F.col("b11i").cast("double") / 1e6 - F.col("t1").cast(
        "double"
    ) * F.col("t1").cast("double") / nt
    h22 = F.col("b22i").cast("double") / 1e6 - F.col("t2").cast(
        "double"
    ) * F.col("t2").cast("double") / nt
    h12 = F.col("b12i").cast("double") / 1e6 - F.col("t1").cast(
        "double"
    ) * F.col("t2").cast("double") / nt
    e11 = tt11 - h11
    e22 = tt22 - h22
    e12 = tt12 - h12
    dete = e11 * e22 - e12 * e12
    m11 = (e22 * h11 - e12 * h12) / dete
    m12 = (e22 * h12 - e12 * h22) / dete
    m21 = (e11 * h12 - e12 * h11) / dete
    m22 = (e11 * h22 - e12 * h12) / dete
    tr = m11 + m22
    dt = m11 * m22 - m12 * m21
    disc = tr * tr - 4.0 * dt
    lmax = (tr + F.sqrt(F.when(disc > 0, disc).otherwise(0.0))) / 2.0
    theta = lmax / (1.0 + lmax)
    return (
        tot.filter((F.col("k") == 3) & (dete > 0) & (F.col("nt") > 6))
        .select(
            "event_type",
            F.col("nt").cast("long").alias("n"),
            F.floor(lmax * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("lambda_e6"),
            F.floor(theta * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("theta_e6"),
        )
        .orderBy("event_type")
    )


SQL_ROYS = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN EXTRACT(hour FROM ts) < 8 THEN 0
              WHEN EXTRACT(hour FROM ts) < 16 THEN 1
              ELSE 2 END AS g,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS y1,
         CAST(EXTRACT(minute FROM ts) * 60 + EXTRACT(second FROM ts)
              AS BIGINT) AS y2
  FROM events
), gm AS (
  SELECT event_type, g,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y1) AS BIGINT) AS s1,
         CAST(sum(y2) AS BIGINT) AS s2,
         CAST(sum(y1 * y1) AS BIGINT) AS s11,
         CAST(sum(y2 * y2) AS BIGINT) AS s22,
         CAST(sum(y1 * y2) AS BIGINT) AS s12
  FROM ev GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         CAST(sum(n) AS BIGINT) AS nt,
         count(*) AS k,
         CAST(sum(s1) AS BIGINT) AS t1,
         CAST(sum(s2) AS BIGINT) AS t2,
         CAST(sum(s11) AS BIGINT) AS t11,
         CAST(sum(s22) AS BIGINT) AS t22,
         CAST(sum(s12) AS BIGINT) AS t12,
         CAST(sum(CAST(floor(CAST(s1 AS DOUBLE) * s1 / n * 1e6 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS b11i,
         CAST(sum(CAST(floor(CAST(s2 AS DOUBLE) * s2 / n * 1e6 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS b22i,
         CAST(sum(CAST(floor(CAST(s1 AS DOUBLE) * s2 / n * 1e6 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS b12i
  FROM gm GROUP BY 1
), m AS (
  SELECT event_type, nt, k,
         CAST(t11 AS DOUBLE) - CAST(t1 AS DOUBLE) * t1 / nt AS tt11,
         CAST(t22 AS DOUBLE) - CAST(t2 AS DOUBLE) * t2 / nt AS tt22,
         CAST(t12 AS DOUBLE) - CAST(t1 AS DOUBLE) * t2 / nt AS tt12,
         CAST(b11i AS DOUBLE) / 1e6
           - CAST(t1 AS DOUBLE) * t1 / nt AS h11,
         CAST(b22i AS DOUBLE) / 1e6
           - CAST(t2 AS DOUBLE) * t2 / nt AS h22,
         CAST(b12i AS DOUBLE) / 1e6
           - CAST(t1 AS DOUBLE) * t2 / nt AS h12
  FROM tot
), e AS (
  SELECT event_type, nt, k, h11, h22, h12,
         tt11 - h11 AS e11, tt22 - h22 AS e22, tt12 - h12 AS e12
  FROM m
), mm AS (
  SELECT event_type, nt, k,
         e11 * e22 - e12 * e12 AS dete,
         (e22 * h11 - e12 * h12) / (e11 * e22 - e12 * e12) AS m11,
         (e22 * h12 - e12 * h22) / (e11 * e22 - e12 * e12) AS m12,
         (e11 * h12 - e12 * h11) / (e11 * e22 - e12 * e12) AS m21,
         (e11 * h22 - e12 * h12) / (e11 * e22 - e12 * e12) AS m22
  FROM e
), lam AS (
  SELECT event_type, nt, k, dete,
         (m11 + m22
          + sqrt(CASE WHEN (m11 + m22) * (m11 + m22)
                           - 4.0 * (m11 * m22 - m12 * m21) > 0
                      THEN (m11 + m22) * (m11 + m22)
                           - 4.0 * (m11 * m22 - m12 * m21)
                      ELSE 0.0 END)) / 2.0 AS lmax
  FROM mm
)
SELECT event_type, nt AS n,
       CAST(floor(lmax * 1000000 + {_OFF}) AS BIGINT) AS lambda_e6,
       CAST(floor(lmax / (1.0 + lmax) * 1000000 + {_OFF})
            AS BIGINT) AS theta_e6
FROM lam
WHERE k = 3 AND dete > 0 AND nt > 6
ORDER BY event_type
"""

QUERIES["roys_largest_root"] = q_roys_largest_root
ORACLE_SQL["roys_largest_root"] = SQL_ROYS


# ===========================================================================
# Battery F — multiple-comparison post-hocs, round 2: Steel-Dwass
# pairwise joint-rank z (the nonparametric Tukey analog), Dunnett
# many-to-one t statistics vs a control group, and the Scheffe
# contrast test for weekend-vs-weekday.
# ===========================================================================


# ---------------------------------------------------------------------------
# steel_dwass — pairwise two-sample rank z over all event-type pairs
# with JOINT (per-pair) ranking and tie correction
# ---------------------------------------------------------------------------
# For each pair the rank-sum is computed on the collapsed value
# domain: 2R_a = sum_v ca(v) * (2 cumbefore(v) + t(v) + 1) — an exact
# integer; Var(R) carries the tie term sum t(t^2-1).  Each count row
# joins the broadcast 10-row pair table (explodes into at most 4
# pairs), so the only window runs over (pair, value) — bounded by the
# centi-value domain, never by row count.


def q_steel_dwass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    types = cnt.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    tagged = cnt.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("ta"))
        | (F.col("event_type") == F.col("tb")),
    ).select(
        "ta",
        "tb",
        "v",
        F.when(F.col("event_type") == F.col("ta"), F.col("c"))
        .otherwise(0)
        .alias("ca"),
        F.when(F.col("event_type") == F.col("tb"), F.col("c"))
        .otherwise(0)
        .alias("cb"),
    )
    pv = tagged.groupBy("ta", "tb", "v").agg(
        F.sum("ca").alias("ca"), F.sum("cb").alias("cb")
    )
    w = (
        Window.partitionBy("ta", "tb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pv = pv.withColumn(
        "cumbefore",
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)),
    )
    t = F.col("ca") + F.col("cb")
    agg = pv.groupBy("ta", "tb").agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("ca") * (2 * F.col("cumbefore") + t + 1)
        ).alias("r2a"),
        F.sum(t * (t * t - 1)).alias("ties"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    nn = na + nb
    r_a = F.col("r2a").cast("double") / 2.0
    mean_r = na * (nn + 1.0) / 2.0
    var_r = (
        na
        * nb
        / 12.0
        * (
            (nn + 1.0)
            - F.col("ties").cast("double") / (nn * (nn - 1.0))
        )
    )
    z = (r_a - mean_r) / F.sqrt(var_r)
    return (
        agg.filter((F.col("na") >= 2) & (F.col("nb") >= 2) & (var_r > 0))
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            (F.col("na") + F.col("nb")).cast("long").alias("n"),
            F.floor(z * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "z_e6"
            ),
        )
        .orderBy("type_a", "type_b")
    )


SQL_STEEL_DWASS = f"""
WITH cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), types AS (
  SELECT DISTINCT event_type FROM cnt
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a, types b WHERE a.event_type < b.event_type
), tagged AS (
  SELECT p.ta, p.tb, c.v,
         CASE WHEN c.event_type = p.ta THEN c.c ELSE 0 END AS ca,
         CASE WHEN c.event_type = p.tb THEN c.c ELSE 0 END AS cb
  FROM cnt c JOIN pairs p
    ON c.event_type = p.ta OR c.event_type = p.tb
), pv AS (
  SELECT ta, tb, v,
         CAST(sum(ca) AS BIGINT) AS ca,
         CAST(sum(cb) AS BIGINT) AS cb
  FROM tagged GROUP BY 1, 2, 3
), cum AS (
  SELECT *,
         CAST(coalesce(sum(ca + cb) OVER (
                PARTITION BY ta, tb ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumbefore
  FROM pv
), agg AS (
  SELECT ta, tb,
         CAST(sum(ca) AS BIGINT) AS na,
         CAST(sum(cb) AS BIGINT) AS nb,
         CAST(sum(ca * (2 * cumbefore + ca + cb + 1)) AS BIGINT) AS r2a,
         CAST(sum((ca + cb) * ((ca + cb) * (ca + cb) - 1))
              AS BIGINT) AS ties
  FROM cum GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b,
       CAST(na + nb AS BIGINT) AS n,
       CAST(floor((CAST(r2a AS DOUBLE) / 2.0
                   - na * (na + nb + 1.0) / 2.0)
                  / sqrt(CAST(na AS DOUBLE) * nb / 12.0
                         * ((na + nb + 1.0)
                            - CAST(ties AS DOUBLE)
                              / ((na + CAST(nb AS DOUBLE))
                                 * (na + nb - 1.0))))
                  * 1000000 + {_OFF}) AS BIGINT) AS z_e6
FROM agg
WHERE na >= 2 AND nb >= 2
  AND CAST(na AS DOUBLE) * nb / 12.0
      * ((na + nb + 1.0)
         - CAST(ties AS DOUBLE)
           / ((na + CAST(nb AS DOUBLE)) * (na + nb - 1.0))) > 0
ORDER BY type_a, type_b
"""

QUERIES["steel_dwass"] = q_steel_dwass
ORACLE_SQL["steel_dwass"] = SQL_STEEL_DWASS


# ---------------------------------------------------------------------------
# dunnett_control — many-to-one comparisons vs the 'click' control
# ---------------------------------------------------------------------------
# Dunnett (1955) t_i = (m_i - m_0) / sqrt(s2_p (1/n_i + 1/n_0)) with
# the pooled within-group variance over ALL groups.  Group moments are
# exact integers; s2_p numerator terms are per-group exact rationals
# e6-floored before the k-row sum.


def q_dunnett_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    ssw6 = F.floor(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n")
        )
        / 10_000.0
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    g2 = g.withColumn("ssw6", ssw6)
    tot = g2.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum("ssw6").alias("sswt"),
    )
    ctrl = g2.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n0"), F.col("s").alias("s0")
    )
    j = g2.filter(F.col("event_type") != "click").crossJoin(
        F.broadcast(tot)
    ).crossJoin(F.broadcast(ctrl))
    s2p = (
        F.col("sswt").cast("double")
        / 1e6
        / (F.col("nn") - F.col("k")).cast("double")
    )
    mi = F.col("s").cast("double") / F.col("n") / 100.0
    m0 = F.col("s0").cast("double") / F.col("n0") / 100.0
    t = (mi - m0) / F.sqrt(
        s2p * (1.0 / F.col("n") + 1.0 / F.col("n0"))
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor((mi - m0) * 10_000 + F.lit(_OFF)).cast("long").alias(
            "diff_e4"
        ),
        F.floor(t * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "t_e6"
        ),
    ).orderBy("event_type")


SQL_DUNNETT = f"""
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ss
  FROM events GROUP BY 1
), g2 AS (
  SELECT *,
         CAST(floor((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                    / 10000.0 * 1e6 + {_OFF}) AS BIGINT) AS ssw6
  FROM g
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k,
         CAST(sum(ssw6) AS BIGINT) AS sswt
  FROM g2
), ctrl AS (
  SELECT n AS n0, s AS s0 FROM g2 WHERE event_type = 'click'
)
SELECT g2.event_type, g2.n,
       CAST(floor((CAST(g2.s AS DOUBLE) / g2.n / 100.0
                   - CAST(c.s0 AS DOUBLE) / c.n0 / 100.0) * 10000
                  + {_OFF}) AS BIGINT) AS diff_e4,
       CAST(floor((CAST(g2.s AS DOUBLE) / g2.n / 100.0
                   - CAST(c.s0 AS DOUBLE) / c.n0 / 100.0)
                  / sqrt((CAST(t.sswt AS DOUBLE) / 1e6 / (t.nn - t.k))
                         * (1.0 / g2.n + 1.0 / c.n0))
                  * 1000000 + {_OFF}) AS BIGINT) AS t_e6
FROM g2, tot t, ctrl c
WHERE g2.event_type <> 'click'
ORDER BY g2.event_type
"""

QUERIES["dunnett_control"] = q_dunnett_control
ORACLE_SQL["dunnett_control"] = SQL_DUNNETT


# ---------------------------------------------------------------------------
# scheffe_contrast — Scheffe test for the weekend-vs-weekday contrast
# across the 7 day-of-week groups
# ---------------------------------------------------------------------------
# Contrast c_j = 1/2 (Sat, Sun), -1/5 (Mon..Fri); estimate L = sum c_j
# m_j; S^2 = L^2 / (s2_p sum c_j^2/n_j); Scheffe compares S^2/(k-1) to
# F(k-1, N-k).  Spelled with integer numerators (c_j = w_j/10 with
# w in {5, -2}) so L is a deterministic rational of exact moments.


def q_scheffe_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    ).filter(F.col("n") >= 2)
    wgt = F.when(F.col("dow").isin(1, 7), F.lit(5)).otherwise(
        F.lit(-2)
    )
    ssw6 = F.floor(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n")
        )
        / 10_000.0
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    lterm9 = F.floor(
        wgt.cast("double")
        / 10.0
        * F.col("s").cast("double")
        / F.col("n")
        / 100.0
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    cn9 = F.floor(
        wgt.cast("double")
        * wgt.cast("double")
        / 100.0
        / F.col("n")
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = g.select(
        "event_type",
        F.col("n"),
        ssw6.alias("ssw6"),
        lterm9.alias("l9"),
        cn9.alias("cn9"),
    ).groupBy("event_type").agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum("ssw6").alias("sswt"),
        F.sum("l9").alias("l9"),
        F.sum("cn9").alias("cn9"),
    )
    s2p = (
        F.col("sswt").cast("double")
        / 1e6
        / (F.col("nn") - F.col("k")).cast("double")
    )
    ll = F.col("l9").cast("double") / 1e9
    cn = F.col("cn9").cast("double") / 1e9
    ssq = ll * ll / (s2p * cn)
    kd = F.col("k").cast("double")
    return (
        agg.filter((F.col("k") == 7) & (F.col("nn") > F.col("k")))
        .select(
            "event_type",
            F.col("nn").cast("long").alias("n"),
            F.floor(ll * 10_000 + F.lit(_OFF)).cast("long").alias(
                "contrast_e4"
            ),
            F.floor(ssq / (kd - 1.0) * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("f_e4"),
        )
        .orderBy("event_type")
    )


SQL_SCHEFFE = f"""
WITH g AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ss
  FROM events GROUP BY 1, 2
  HAVING count(*) >= 2
), t AS (
  SELECT event_type, n,
         CASE WHEN dow IN (0, 6) THEN 5 ELSE -2 END AS wgt,
         CAST(floor((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                    / 10000.0 * 1e6 + {_OFF}) AS BIGINT) AS ssw6,
         CAST(floor((CASE WHEN dow IN (0, 6) THEN 5 ELSE -2 END)
                    / 10.0 * CAST(s AS DOUBLE) / n / 100.0 * 1e9
                    + {_OFF}) AS BIGINT) AS l9,
         CAST(floor((CASE WHEN dow IN (0, 6) THEN 5 ELSE -2 END)
                    * (CASE WHEN dow IN (0, 6) THEN 5.0 ELSE -2.0 END)
                    / 100.0 / n * 1e9 + {_OFF}) AS BIGINT) AS cn9
  FROM g
), agg AS (
  SELECT event_type,
         CAST(sum(n) AS BIGINT) AS nn, count(*) AS k,
         CAST(sum(ssw6) AS BIGINT) AS sswt,
         CAST(sum(l9) AS BIGINT) AS l9,
         CAST(sum(cn9) AS BIGINT) AS cn9
  FROM t GROUP BY 1
)
SELECT event_type, nn AS n,
       CAST(floor(CAST(l9 AS DOUBLE) / 1e9 * 10000 + {_OFF})
            AS BIGINT) AS contrast_e4,
       CAST(floor((CAST(l9 AS DOUBLE) / 1e9)
                  * (CAST(l9 AS DOUBLE) / 1e9)
                  / ((CAST(sswt AS DOUBLE) / 1e6 / (nn - k))
                     * (CAST(cn9 AS DOUBLE) / 1e9))
                  / (k - 1.0) * 10000 + {_OFF}) AS BIGINT) AS f_e4
FROM agg
WHERE k = 7 AND nn > k
ORDER BY event_type
"""

QUERIES["scheffe_contrast"] = q_scheffe_contrast
ORACLE_SQL["scheffe_contrast"] = SQL_SCHEFFE


# ===========================================================================
# Battery G — probit GLM by two unrolled Fisher-scoring steps (the
# erf/Acklam-twin sibling of logistic_glm_newton), the Epps-Pulley
# characteristic-function normality statistic on the bounded daily
# domain, and Mandel's h/k interlaboratory consistency statistics.
# ===========================================================================


# ---------------------------------------------------------------------------
# probit_glm_newton — weekend ~ standardized centi-value with a probit
# link, two Fisher-scoring steps from (probit(pbar), 0)
# ---------------------------------------------------------------------------
# Working quantities per collapsed value cell: Phi via the shared A&S
# erf twin (sign-folded), phi = exp(-z^2/2)/sqrt(2pi); score r =
# (y - n Phi) phi/(Phi(1-Phi)), info w = n phi^2/(Phi(1-Phi)).  z is
# clamped to [-6, 6] in BOTH engines so Phi(1-Phi) never underflows.
# Start intercept = Acklam probit of the pooled rate (stats17 twin).


def q_probit_glm_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats16 import _erf
    from diive_spark.queries_stats17 import _probit

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.dayofweek("ts").isin(1, 7)).cast("long").alias("pos"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    )
    cells = ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("nv"), F.sum("pos").alias("yv")
    )
    mom = cells.groupBy("event_type").agg(
        F.sum("nv").alias("n"),
        F.sum("yv").alias("y"),
        F.sum(F.col("nv") * F.col("v")).alias("sv"),
        F.sum(F.col("nv") * F.col("v") * F.col("v")).alias("svv"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("sv").cast("double") / nd
    sd = F.sqrt((F.col("svv").cast("double") - nd * mu * mu) / nd)
    mom = mom.select(
        "event_type",
        "n",
        "y",
        mu.alias("mv"),
        sd.alias("sdv"),
        _probit(
            F.col("y").cast("double") / F.col("n").cast("double")
        ).alias("a0"),
    ).filter((F.col("y") > 0) & (F.col("y") < F.col("n")) & (sd > 0))

    inv_sqrt2 = 0.7071067811865476
    inv_sqrt2pi = 0.3989422804014327

    def step(params: DataFrame, acol: str, bcol: str, tag: str):
        j = cells.join(F.broadcast(params), "event_type")
        x = (F.col("v").cast("double") - F.col("mv")) / F.col("sdv")
        zraw = F.col(acol) + F.col(bcol) * x
        z = F.greatest(F.least(zraw, F.lit(6.0)), F.lit(-6.0))
        phi_cap = F.when(
            z >= 0,
            0.5 * (1.0 + _erf(z * inv_sqrt2)),
        ).otherwise(0.5 * (1.0 - _erf(-z * inv_sqrt2)))
        pdf = F.exp(-z * z / 2.0) * inv_sqrt2pi
        den = phi_cap * (1.0 - phi_cap)
        nvd = F.col("nv").cast("double")
        yvd = F.col("yv").cast("double")
        r = (yvd - nvd * phi_cap) * pdf / den
        w = nvd * pdf * pdf / den
        t = j.select(
            "event_type",
            acol,
            bcol,
            "mv",
            "sdv",
            F.floor(r * 1e6 + F.lit(_OFF)).cast("long").alias("g1"),
            F.floor(x * r * 1e6 + F.lit(_OFF)).cast("long").alias("g2"),
            F.floor(w * 1e6 + F.lit(_OFF)).cast("long").alias("h11"),
            F.floor(x * w * 1e6 + F.lit(_OFF)).cast("long").alias(
                "h12"
            ),
            F.floor(x * x * w * 1e6 + F.lit(_OFF)).cast("long").alias(
                "h22"
            ),
        )
        agg = t.groupBy("event_type", acol, bcol, "mv", "sdv").agg(
            F.sum("g1").alias("sg1"),
            F.sum("g2").alias("sg2"),
            F.sum("h11").alias("sh11"),
            F.sum("h12").alias("sh12"),
            F.sum("h22").alias("sh22"),
        )
        g1 = F.col("sg1").cast("double")
        g2 = F.col("sg2").cast("double")
        h11 = F.col("sh11").cast("double")
        h12 = F.col("sh12").cast("double")
        h22 = F.col("sh22").cast("double")
        det = h11 * h22 - h12 * h12
        return agg.select(
            "event_type",
            "mv",
            "sdv",
            (F.col(acol) + (h22 * g1 - h12 * g2) / det).alias(f"a{tag}"),
            (F.col(bcol) + (h11 * g2 - h12 * g1) / det).alias(f"b{tag}"),
        )

    p0 = mom.select(
        "event_type", "mv", "sdv", "a0", F.lit(0.0).alias("b0")
    )
    p1 = step(p0, "a0", "b0", "1")
    p2 = step(p1, "a1", "b1", "2")
    out = p2.join(F.broadcast(mom.select("event_type", "n", "y")),
                  "event_type")
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("y").cast("long").alias("n_pos"),
        F.floor(F.col("a2") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("alpha_e6"),
        F.floor(F.col("b2") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("beta_e6"),
    ).orderBy("event_type")


def _pg_step_sql(prev: str, acol: str, bcol: str, tag: str) -> str:
    from diive_spark.queries_stats16 import _erf_sql

    zc = (
        f"greatest(least(p.{acol} + p.{bcol}"
        f" * ((c.v - p.mv) / p.sdv), 6.0), -6.0)"
    )
    return f""",
  z{tag} AS (
    SELECT c.event_type, p.{acol}, p.{bcol}, p.mv, p.sdv,
           c.nv, c.yv, (c.v - p.mv) / p.sdv AS x,
           {zc} AS z
    FROM cells c JOIN {prev} p ON p.event_type = c.event_type
  ), u{tag} AS (
    SELECT *,
           CASE WHEN z >= 0
                THEN 0.5 * (1.0 + {_erf_sql('z * 0.7071067811865476')})
                ELSE 0.5 * (1.0 - {_erf_sql('-z * 0.7071067811865476')})
           END AS cap,
           exp(-z * z / 2.0) * 0.3989422804014327 AS pdf
    FROM z{tag}
  ), t{tag} AS (
    SELECT event_type, {acol}, {bcol}, mv, sdv,
           CAST(floor((yv - nv * cap) * pdf / (cap * (1.0 - cap))
                      * 1e6 + {_OFF}) AS BIGINT) AS g1,
           CAST(floor(x * (yv - nv * cap) * pdf / (cap * (1.0 - cap))
                      * 1e6 + {_OFF}) AS BIGINT) AS g2,
           CAST(floor(nv * pdf * pdf / (cap * (1.0 - cap)) * 1e6
                      + {_OFF}) AS BIGINT) AS h11,
           CAST(floor(x * nv * pdf * pdf / (cap * (1.0 - cap)) * 1e6
                      + {_OFF}) AS BIGINT) AS h12,
           CAST(floor(x * x * nv * pdf * pdf / (cap * (1.0 - cap))
                      * 1e6 + {_OFF}) AS BIGINT) AS h22
    FROM u{tag}
  ), s{tag} AS (
    SELECT event_type, {acol}, {bcol}, mv, sdv,
           CAST(sum(g1) AS BIGINT) AS sg1,
           CAST(sum(g2) AS BIGINT) AS sg2,
           CAST(sum(h11) AS BIGINT) AS sh11,
           CAST(sum(h12) AS BIGINT) AS sh12,
           CAST(sum(h22) AS BIGINT) AS sh22
    FROM t{tag} GROUP BY 1, 2, 3, 4, 5
  ), p{tag} AS (
    SELECT event_type, mv, sdv,
           {acol} + (CAST(sh22 AS DOUBLE) * sg1
                     - CAST(sh12 AS DOUBLE) * sg2)
                    / (CAST(sh11 AS DOUBLE) * sh22
                       - CAST(sh12 AS DOUBLE) * sh12) AS a{tag},
           {bcol} + (CAST(sh11 AS DOUBLE) * sg2
                     - CAST(sh12 AS DOUBLE) * sg1)
                    / (CAST(sh11 AS DOUBLE) * sh22
                       - CAST(sh12 AS DOUBLE) * sh12) AS b{tag}
    FROM s{tag}
  )"""


def _probit_glm_sql() -> str:
    from diive_spark.queries_stats17 import _probit_sql

    return f"""
WITH cells AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS nv,
         CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
              AS BIGINT) AS yv
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT event_type,
         CAST(sum(nv) AS BIGINT) AS n,
         CAST(sum(yv) AS BIGINT) AS y,
         CAST(sum(nv * v) AS DOUBLE) / sum(nv) AS mv,
         sqrt((CAST(sum(nv * v * v) AS DOUBLE)
               - sum(nv) * (CAST(sum(nv * v) AS DOUBLE) / sum(nv))
                         * (CAST(sum(nv * v) AS DOUBLE) / sum(nv)))
              / sum(nv)) AS sdv
  FROM cells GROUP BY 1
), p0 AS (
  SELECT event_type, n, y, mv, sdv,
         {_probit_sql('CAST(y AS DOUBLE) / n')} AS a0,
         0.0 AS b0
  FROM mom
  WHERE y > 0 AND y < n AND sdv > 0
){_pg_step_sql("p0", "a0", "b0", "1")}{_pg_step_sql("p1", "a1", "b1", "2")}
SELECT p2.event_type, p0.n, p0.y AS n_pos,
       CAST(floor(p2.a2 * 1000000 + {_OFF}) AS BIGINT) AS alpha_e6,
       CAST(floor(p2.b2 * 1000000 + {_OFF}) AS BIGINT) AS beta_e6
FROM p2 JOIN p0 ON p0.event_type = p2.event_type
ORDER BY p2.event_type
"""


QUERIES["probit_glm_newton"] = q_probit_glm_newton
ORACLE_SQL["probit_glm_newton"] = _probit_glm_sql()


# ---------------------------------------------------------------------------
# epps_pulley — characteristic-function normality test (Epps & Pulley
# 1983, Henze 1990 representation) on the daily-mean series
# ---------------------------------------------------------------------------
# TEP = 1 + n/sqrt(3) + (2/n) sum_{j<k} exp(-(y_j-y_k)^2/2)
#       - sqrt(2) sum_j exp(-y_j^2/4),  y = (x - xbar)/sqrt(m2).
# The pair sum runs over the BOUNDED day domain (calendar-sized
# self-join per type, never raw rows); pair terms use (x_j-x_k)/s
# directly so the mean cancels exactly.  All exp terms e12-floored.


def q_epps_pulley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sy").cast("double") / nd
    m2 = F.col("syy").cast("double") / nd - mean * mean
    mom = mom.select(
        "event_type", "n", mean.alias("mean"), F.sqrt(m2).alias("s")
    ).filter((F.col("n") >= 4) & (m2 > 0))
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("y").alias("ya")
    )
    b = daily.select(
        "event_type", F.col("day").alias("db"), F.col("y").alias("yb")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .join(F.broadcast(mom), "event_type")
    )
    d = (F.col("ya") - F.col("yb")).cast("double") / F.col("s")
    pterm = pairs.select(
        "event_type",
        F.floor(F.exp(-d * d / 2.0) * 1e12 + F.lit(_OFF))
        .cast("long")
        .alias("t12"),
    ).groupBy("event_type").agg(F.sum("t12").alias("pair12"))
    singles = daily.join(F.broadcast(mom), "event_type")
    yz = (F.col("y").cast("double") - F.col("mean")) / F.col("s")
    sterm = singles.select(
        "event_type",
        F.floor(F.exp(-yz * yz / 4.0) * 1e12 + F.lit(_OFF))
        .cast("long")
        .alias("s12"),
    ).groupBy("event_type").agg(F.sum("s12").alias("single12"))
    out = mom.join(pterm, "event_type").join(sterm, "event_type")
    nd2 = F.col("n").cast("double")
    tep = (
        1.0
        + nd2 * F.lit(0.5773502691896258)
        + 2.0 / nd2 * F.col("pair12").cast("double") / 1e12
        - F.lit(1.4142135623730951) * F.col("single12").cast("double") / 1e12
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(tep * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "tep_e6"
        ),
    ).orderBy("event_type")


SQL_EPPS = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(y) AS DOUBLE) / count(*) AS mean,
         sqrt(CAST(sum(y * y) AS DOUBLE) / count(*)
              - (CAST(sum(y) AS DOUBLE) / count(*))
                * (CAST(sum(y) AS DOUBLE) / count(*))) AS s
  FROM daily GROUP BY 1
  HAVING count(*) >= 4
     AND CAST(sum(y * y) AS DOUBLE) / count(*)
         - (CAST(sum(y) AS DOUBLE) / count(*))
           * (CAST(sum(y) AS DOUBLE) / count(*)) > 0
), pterm AS (
  SELECT a.event_type,
         CAST(sum(CAST(floor(exp(-((a.y - b.y) / m.s)
                                 * ((a.y - b.y) / m.s) / 2.0) * 1e12
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS pair12
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type AND a.day < b.day
  JOIN mom m ON m.event_type = a.event_type
  GROUP BY 1
), sterm AS (
  SELECT d.event_type,
         CAST(sum(CAST(floor(exp(-((d.y - m.mean) / m.s)
                                 * ((d.y - m.mean) / m.s) / 4.0) * 1e12
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS single12
  FROM daily d JOIN mom m ON m.event_type = d.event_type
  GROUP BY 1
)
SELECT m.event_type, CAST(m.n AS BIGINT) AS n_days,
       CAST(floor((1.0 + m.n * 0.5773502691896258
                   + 2.0 / m.n * (CAST(p.pair12 AS DOUBLE) / 1e12)
                   - 1.4142135623730951 * (CAST(s.single12 AS DOUBLE) / 1e12))
                  * 1000000 + {_OFF}) AS BIGINT) AS tep_e6
FROM mom m
JOIN pterm p ON p.event_type = m.event_type
JOIN sterm s ON s.event_type = m.event_type
ORDER BY m.event_type
"""

QUERIES["epps_pulley"] = q_epps_pulley
ORACLE_SQL["epps_pulley"] = SQL_EPPS


# ---------------------------------------------------------------------------
# mandel_hk — Mandel's between-lab h and within-lab k consistency
# statistics (ISO 5725-2), labs = user_id % 8, materials = event types
# ---------------------------------------------------------------------------
# h_i = (m_i - mbar) / s_m (s_m = sd of lab means, n-1 denominator);
# k_i = s_i / s_r with s_r^2 the unweighted mean of lab variances.
# Lab means / variances are exact rationals e6-floored before the
# 8-row cross-lab sums, so both engines share exact integers.


def q_mandel_hk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cell = ev.select(
        "event_type",
        (F.col("user_id") % 8).alias("lab"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "lab").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    ).filter(F.col("n") >= 2)
    nd = F.col("n").cast("double")
    m6 = F.floor(
        F.col("s").cast("double") / nd / 100.0 * 1e6 + F.lit(_OFF)
    ).cast("long")
    v6 = F.floor(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / nd
        )
        / (nd - 1.0)
        / 10_000.0
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    cell = cell.select(
        "event_type", "lab", "n", m6.alias("m6"), v6.alias("v6")
    )
    tot = cell.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("p"),
        F.sum("m6").alias("sm"),
        F.sum(F.col("m6") * F.col("m6")).alias("smm"),
        F.sum("v6").alias("sv"),
    )
    pd_ = F.col("p").cast("double")
    mbar = F.col("sm").cast("double") / pd_ / 1e6
    sm2 = (
        (
            F.col("smm").cast("double")
            - F.col("sm").cast("double") * F.col("sm").cast("double")
            / pd_
        )
        / (pd_ - 1.0)
        / 1e12
    )
    sr2 = F.col("sv").cast("double") / pd_ / 1e6
    tot = tot.select(
        "event_type",
        "p",
        mbar.alias("mbar"),
        F.sqrt(sm2).alias("sm"),
        F.sqrt(sr2).alias("sr"),
    ).filter((F.col("p") >= 3) & (sm2 > 0) & (sr2 > 0))
    j = cell.join(F.broadcast(tot), "event_type")
    h = (F.col("m6").cast("double") / 1e6 - F.col("mbar")) / F.col(
        "sm"
    )
    k = F.sqrt(F.col("v6").cast("double") / 1e6) / F.col("sr")
    return j.select(
        "event_type",
        F.col("lab").cast("long").alias("lab"),
        F.col("n").cast("long").alias("n"),
        F.floor(h * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "h_e6"
        ),
        F.floor(k * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "k_e6"
        ),
    ).orderBy("event_type", "lab")


SQL_MANDEL = f"""
WITH cell AS (
  SELECT event_type, user_id % 8 AS lab,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ss
  FROM events GROUP BY 1, 2
  HAVING count(*) >= 2
), c2 AS (
  SELECT event_type, lab, n,
         CAST(floor(CAST(s AS DOUBLE) / n / 100.0 * 1e6 + {_OFF})
              AS BIGINT) AS m6,
         CAST(floor((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                    / (n - 1.0) / 10000.0 * 1e6 + {_OFF})
              AS BIGINT) AS v6
  FROM cell
), tot AS (
  SELECT event_type, count(*) AS p,
         CAST(sum(m6) AS BIGINT) AS sm,
         CAST(sum(m6 * m6) AS BIGINT) AS smm,
         CAST(sum(v6) AS BIGINT) AS sv
  FROM c2 GROUP BY 1
), t2 AS (
  SELECT event_type, p,
         CAST(sm AS DOUBLE) / p / 1e6 AS mbar,
         sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * sm / p)
              / (p - 1.0) / 1e12) AS smv,
         sqrt(CAST(sv AS DOUBLE) / p / 1e6) AS sr
  FROM tot
  WHERE p >= 3
    AND (CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * sm / p) > 0
    AND sv > 0
)
SELECT c.event_type, CAST(c.lab AS BIGINT) AS lab, c.n,
       CAST(floor((CAST(c.m6 AS DOUBLE) / 1e6 - t.mbar) / t.smv
                  * 1000000 + {_OFF}) AS BIGINT) AS h_e6,
       CAST(floor(sqrt(CAST(c.v6 AS DOUBLE) / 1e6) / t.sr * 1000000
                  + {_OFF}) AS BIGINT) AS k_e6
FROM c2 c JOIN t2 t ON t.event_type = c.event_type
ORDER BY c.event_type, c.lab
"""

QUERIES["mandel_hk"] = q_mandel_hk
ORACLE_SQL["mandel_hk"] = SQL_MANDEL


# ===========================================================================
# Battery H — multivariate skewness (the pair-sum sibling of
# mardia_kurtosis), a k-anonymity / l-diversity privacy audit over the
# documents corpus, and empirical tail-dependence coefficients between
# event-type daily series (the copula-diagnostics complement of
# copula_tail_fit).
# ===========================================================================


# ---------------------------------------------------------------------------
# mardia_skewness — Mardia's multivariate skewness b1,2 of the daily
# (mean centi-value, count) vectors
# ---------------------------------------------------------------------------
# b1,p = (1/n^2) sum_ij [(y_i-ybar)' S^-1 (y_j-ybar)]^3 with S the MLE
# covariance; A = n b1,p / 6 ~ chi2(p(p+1)(p+2)/6) = chi2(4) for p=2.
# The pair sum is day x day PER TYPE (calendar^2-bounded); S and ybar
# come from exact integer moments; per-pair cubes are e9-floored.


def q_mardia_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s1"),
        F.sum("c").alias("s2"),
        F.sum(F.col("y") * F.col("y")).alias("s11"),
        F.sum(F.col("c") * F.col("c")).alias("s22"),
        F.sum(F.col("y") * F.col("c")).alias("s12"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd
    c11 = F.col("s11").cast("double") / nd - m1 * m1
    c22 = F.col("s22").cast("double") / nd - m2 * m2
    c12 = F.col("s12").cast("double") / nd - m1 * m2
    det = c11 * c22 - c12 * c12
    mom = mom.select(
        "event_type",
        "n",
        m1.alias("m1"),
        m2.alias("m2"),
        (c22 / det).alias("i11"),
        (c11 / det).alias("i22"),
        (-c12 / det).alias("i12"),
    ).filter((F.col("n") >= 4) & (det > 0))
    a = daily.select(
        "event_type",
        F.col("day").alias("da"),
        F.col("y").alias("ya"),
        F.col("c").alias("ca"),
    )
    b = daily.select(
        "event_type",
        F.col("day").alias("db"),
        F.col("y").alias("yb"),
        F.col("c").alias("cb"),
    )
    p = a.join(b, "event_type").join(F.broadcast(mom), "event_type")
    u1 = F.col("ya").cast("double") - F.col("m1")
    u2 = F.col("ca").cast("double") - F.col("m2")
    v1 = F.col("yb").cast("double") - F.col("m1")
    v2 = F.col("cb").cast("double") - F.col("m2")
    d = (
        u1 * (F.col("i11") * v1 + F.col("i12") * v2)
        + u2 * (F.col("i12") * v1 + F.col("i22") * v2)
    )
    terms = p.select(
        "event_type",
        F.floor(d * d * d * 1e9 + F.lit(_OFF)).cast("long").alias(
            "t9"
        ),
    ).groupBy("event_type").agg(F.sum("t9").alias("s9"))
    out = mom.join(terms, "event_type")
    nd2 = F.col("n").cast("double")
    b12 = F.col("s9").cast("double") / 1e9 / (nd2 * nd2)
    stat = nd2 * b12 / 6.0
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(b12 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "b1p_e6"
        ),
        F.floor(stat * 10_000 + F.lit(_OFF)).cast("long").alias(
            "a_e4"
        ),
    ).orderBy("event_type")


SQL_MARDIA_SKEW = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(y) AS DOUBLE) / count(*) AS m1,
         CAST(sum(c) AS DOUBLE) / count(*) AS m2,
         CAST(sum(y * y) AS DOUBLE) / count(*)
           - (CAST(sum(y) AS DOUBLE) / count(*))
             * (CAST(sum(y) AS DOUBLE) / count(*)) AS c11,
         CAST(sum(c * c) AS DOUBLE) / count(*)
           - (CAST(sum(c) AS DOUBLE) / count(*))
             * (CAST(sum(c) AS DOUBLE) / count(*)) AS c22,
         CAST(sum(y * c) AS DOUBLE) / count(*)
           - (CAST(sum(y) AS DOUBLE) / count(*))
             * (CAST(sum(c) AS DOUBLE) / count(*)) AS c12
  FROM daily GROUP BY 1
), mi AS (
  SELECT event_type, n, m1, m2,
         c22 / (c11 * c22 - c12 * c12) AS i11,
         c11 / (c11 * c22 - c12 * c12) AS i22,
         -c12 / (c11 * c22 - c12 * c12) AS i12
  FROM mom
  WHERE n >= 4 AND c11 * c22 - c12 * c12 > 0
), terms AS (
  SELECT a.event_type,
         CAST(sum(CAST(floor(
           ((a.y - m.m1) * (m.i11 * (b.y - m.m1)
                            + m.i12 * (b.c - m.m2))
            + (a.c - m.m2) * (m.i12 * (b.y - m.m1)
                              + m.i22 * (b.c - m.m2)))
           * ((a.y - m.m1) * (m.i11 * (b.y - m.m1)
                              + m.i12 * (b.c - m.m2))
              + (a.c - m.m2) * (m.i12 * (b.y - m.m1)
                                + m.i22 * (b.c - m.m2)))
           * ((a.y - m.m1) * (m.i11 * (b.y - m.m1)
                              + m.i12 * (b.c - m.m2))
              + (a.c - m.m2) * (m.i12 * (b.y - m.m1)
                                + m.i22 * (b.c - m.m2)))
           * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT) AS s9
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type
  JOIN mi m ON m.event_type = a.event_type
  GROUP BY 1
)
SELECT m.event_type, CAST(m.n AS BIGINT) AS n_days,
       CAST(floor(CAST(t.s9 AS DOUBLE) / 1e9
                  / (CAST(m.n AS DOUBLE) * m.n) * 1000000 + {_OFF})
            AS BIGINT) AS b1p_e6,
       CAST(floor(m.n * (CAST(t.s9 AS DOUBLE) / 1e9
                         / (CAST(m.n AS DOUBLE) * m.n)) / 6.0 * 10000
                  + {_OFF}) AS BIGINT) AS a_e4
FROM mi m JOIN terms t ON t.event_type = m.event_type
ORDER BY m.event_type
"""

QUERIES["mardia_skewness"] = q_mardia_skewness
ORACLE_SQL["mardia_skewness"] = SQL_MARDIA_SKEW


# ---------------------------------------------------------------------------
# k_anonymity_audit — k-anonymity and l-diversity of the documents
# corpus under the (source, length-bucket) quasi-identifier
# ---------------------------------------------------------------------------
# Equivalence classes = (source, floor(n_chars/100)); sensitive
# attribute = lang.  Reports per source: the k of the weakest class,
# the fraction of docs in classes with k < 5, and the minimum
# l-diversity (distinct langs) across classes — the Sweeney/Machanava-
# jjhala audit pair a release pipeline runs before publishing shards.


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    cls = docs.select(
        "source",
        F.floor(F.col("n_chars") / 100).cast("long").alias("lb"),
        "lang",
    ).groupBy("source", "lb").agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("lang").alias("l"),
    )
    agg = cls.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_docs"),
        F.min("k").alias("min_k"),
        F.min("l").alias("min_l"),
        F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0)).alias(
            "below"
        ),
    )
    frac = F.col("below").cast("double") / F.col("n_docs").cast(
        "double"
    )
    return agg.select(
        "source",
        F.col("n_classes").cast("long").alias("n_classes"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("min_k").cast("long").alias("min_k"),
        F.col("min_l").cast("long").alias("min_l"),
        F.floor(frac * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "frac_below5_e6"
        ),
    ).orderBy("source")


SQL_KANON = f"""
WITH cls AS (
  SELECT source, CAST(floor(n_chars / 100.0) AS BIGINT) AS lb,
         CAST(count(*) AS BIGINT) AS k,
         CAST(count(DISTINCT lang) AS BIGINT) AS l
  FROM documents GROUP BY 1, 2
), agg AS (
  SELECT source,
         count(*) AS n_classes,
         CAST(sum(k) AS BIGINT) AS n_docs,
         min(k) AS min_k, min(l) AS min_l,
         CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
           AS below
  FROM cls GROUP BY 1
)
SELECT source, CAST(n_classes AS BIGINT) AS n_classes, n_docs,
       min_k, min_l,
       CAST(floor(CAST(below AS DOUBLE) / n_docs * 1000000 + {_OFF})
            AS BIGINT) AS frac_below5_e6
FROM agg
ORDER BY source
"""

QUERIES["k_anonymity_audit"] = q_k_anonymity_audit
ORACLE_SQL["k_anonymity_audit"] = SQL_KANON


# ---------------------------------------------------------------------------
# tail_dependence — empirical upper/lower tail-dependence coefficients
# between event-type pairs' daily mean series
# ---------------------------------------------------------------------------
# lambda_U(q) = P(U > q, V > q)/(1-q), lambda_L(q) = P(U <= 1-q,
# V <= 1-q)/(1-q) at q = 0.8, with U = rank/(n+1) per series.  Ranks
# are deterministic (value, day) orderings over the bounded day
# domain; the threshold r/(n+1) > q is the integer inequality
# 5 r > 4 (n+1), so the tail counts are exact in both engines.


def q_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    w = Window.partitionBy("event_type").orderBy("y", "day")
    d2 = daily.withColumn("r", F.row_number().over(w))
    a = d2.select(
        F.col("event_type").alias("ta"),
        "day",
        F.col("r").alias("ra"),
    )
    b = d2.select(
        F.col("event_type").alias("tb"),
        "day",
        F.col("r").alias("rb"),
    )
    j = a.join(b, "day").filter(F.col("ta") < F.col("tb"))
    cnt = j.groupBy("ta", "tb").agg(F.count(F.lit(1)).alias("n"))
    j2 = j.join(F.broadcast(cnt), ["ta", "tb"])
    up = (
        (5 * F.col("ra") > 4 * (F.col("n") + 1))
        & (5 * F.col("rb") > 4 * (F.col("n") + 1))
    ).cast("long")
    lo = (
        (5 * F.col("ra") <= F.col("n") + 1)
        & (5 * F.col("rb") <= F.col("n") + 1)
    ).cast("long")
    out = j2.groupBy("ta", "tb").agg(
        F.max("n").alias("n"),
        F.sum(up).alias("cu"),
        F.sum(lo).alias("cl"),
    )
    nd = F.col("n").cast("double")
    lu = F.col("cu").cast("double") / nd / 0.2
    ll = F.col("cl").cast("double") / nd / 0.2
    return (
        out.filter(F.col("n") >= 10)
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("n").cast("long").alias("n_days"),
            F.floor(lu * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "lambda_u_e6"
            ),
            F.floor(ll * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "lambda_l_e6"
            ),
        )
        .orderBy("type_a", "type_b")
    )


SQL_TAILDEP = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, day,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY y, day) AS BIGINT) AS r
  FROM daily
), j AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.day,
         a.r AS ra, b.r AS rb
  FROM r a JOIN r b ON b.day = a.day AND a.event_type < b.event_type
), cnt AS (
  SELECT ta, tb, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1, 2
), agg AS (
  SELECT j.ta, j.tb, max(c.n) AS n,
         CAST(sum(CASE WHEN 5 * j.ra > 4 * (c.n + 1)
                        AND 5 * j.rb > 4 * (c.n + 1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS cu,
         CAST(sum(CASE WHEN 5 * j.ra <= c.n + 1
                        AND 5 * j.rb <= c.n + 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS cl
  FROM j JOIN cnt c ON c.ta = j.ta AND c.tb = j.tb
  GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b, CAST(n AS BIGINT) AS n_days,
       CAST(floor(CAST(cu AS DOUBLE) / n / 0.2 * 1000000 + {_OFF})
            AS BIGINT) AS lambda_u_e6,
       CAST(floor(CAST(cl AS DOUBLE) / n / 0.2 * 1000000 + {_OFF})
            AS BIGINT) AS lambda_l_e6
FROM agg
WHERE n >= 10
ORDER BY type_a, type_b
"""

QUERIES["tail_dependence"] = q_tail_dependence
ORACLE_SQL["tail_dependence"] = SQL_TAILDEP


# ===========================================================================
# Battery I — multiscale entropy (coarse-grained SampEn, Costa 2002),
# the Hopkins clustering-tendency statistic over the embedding space,
# and a CUBE grouping-sets rollup (the missing member of the OLAP
# rollup family).
# ===========================================================================


# ---------------------------------------------------------------------------
# multiscale_entropy — SampEn(m=1, r=0.2 sd) of the daily-count series
# coarse-grained at scales 1, 2, 3 (non-overlapping block SUMS, which
# keep every quantity an exact integer)
# ---------------------------------------------------------------------------
# Costa, Goldberger & Peng (PRL 2002).  Rides the sample_entropy
# machinery: the tolerance test is the integer inequality
# (xa-xb)^2 * 25 * n(n-1) <= n S2 - S^2 per (type, scale); template
# extension via lead() over the block index.  Block sums (not means)
# are used so the inequality stays integral — SampEn is scale-free
# under the matching r.


def q_multiscale_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(wo))
    scales = idx.crossJoin(
        F.broadcast(
            idx.sparkSession.range(1, 4).select(
                F.col("id").alias("scale")
            )
        )
    )
    blk = scales.groupBy(
        "event_type",
        "scale",
        F.floor((F.col("i") - 1) / F.col("scale")).alias("b"),
    ).agg(F.sum("c").alias("x"), F.count(F.lit(1)).alias("m"))
    blk = blk.filter(F.col("m") == F.col("scale"))
    wb = Window.partitionBy("event_type", "scale").orderBy("b")
    wn = Window.partitionBy("event_type", "scale")
    d = (
        blk.withColumn("j", F.row_number().over(wb))
        .withColumn("nxt", F.lead("x").over(wb))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("s", F.sum("x").over(wn))
        .withColumn("q", F.sum(F.col("x") * F.col("x")).over(wn))
    )
    a = d.alias("a")
    b = d.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.scale") == F.col("b.scale"))
        & (F.col("b.j") > F.col("a.j")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.scale").alias("scale"),
        F.col("a.x").alias("xa"),
        F.col("b.x").alias("xb"),
        F.col("a.nxt").alias("na_"),
        F.col("b.nxt").alias("nb_"),
        F.col("a.n").alias("n"),
        F.col("a.s").alias("s"),
        F.col("a.q").alias("q"),
    )
    var_num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    nn1 = F.col("n") * (F.col("n") - 1)
    m1 = (
        (F.col("xa") - F.col("xb"))
        * (F.col("xa") - F.col("xb"))
        * 25
        * nn1
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
    agg = p.groupBy("event_type", "scale").agg(
        F.max("n").alias("n"),
        F.sum(m1).alias("bb"),
        F.sum(m1 * m2).alias("aa"),
    )
    se = F.log(F.col("bb").cast("double") / F.col("aa"))
    return (
        agg.filter((F.col("aa") > 0) & (F.col("bb") > 0))
        .select(
            "event_type",
            F.col("scale").cast("long").alias("scale"),
            F.col("n").cast("long").alias("n_blocks"),
            F.floor(se * 10_000 + F.lit(_OFF)).cast("long").alias(
                "sampen_e4"
            ),
        )
        .orderBy("event_type", "scale")
    )


SQL_MSE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                                    ORDER BY day) AS BIGINT) AS i
  FROM daily
), sc AS (
  SELECT i.*, s.scale
  FROM idx i, (SELECT unnest([1, 2, 3]) AS scale) s
), blk AS (
  SELECT event_type, CAST(scale AS BIGINT) AS scale,
         CAST(floor((i - 1.0) / scale) AS BIGINT) AS b,
         CAST(sum(c) AS BIGINT) AS x,
         count(*) AS m
  FROM sc GROUP BY 1, 2, 3
  HAVING count(*) = CAST(scale AS BIGINT)
), d AS (
  SELECT event_type, scale, b, x,
         CAST(row_number() OVER (PARTITION BY event_type, scale
                                 ORDER BY b) AS BIGINT) AS j,
         lead(x) OVER (PARTITION BY event_type, scale ORDER BY b)
           AS nxt,
         CAST(count(*) OVER (PARTITION BY event_type, scale)
              AS BIGINT) AS n,
         CAST(sum(x) OVER (PARTITION BY event_type, scale)
              AS BIGINT) AS s,
         CAST(sum(x * x) OVER (PARTITION BY event_type, scale)
              AS BIGINT) AS q
  FROM blk
), p AS (
  SELECT a.event_type, a.scale, a.n,
         CASE WHEN (a.x - b.x) * (a.x - b.x) * 25 * a.n * (a.n - 1)
                   <= a.n * a.q - a.s * a.s
              THEN 1 ELSE 0 END AS m1,
         CASE WHEN a.nxt IS NOT NULL AND b.nxt IS NOT NULL
               AND (a.nxt - b.nxt) * (a.nxt - b.nxt) * 25
                   * a.n * (a.n - 1)
                   <= a.n * a.q - a.s * a.s
              THEN 1 ELSE 0 END AS m2
  FROM d a
  JOIN d b ON b.event_type = a.event_type AND b.scale = a.scale
          AND b.j > a.j
), agg AS (
  SELECT event_type, scale, max(n) AS n,
         CAST(sum(m1) AS BIGINT) AS bb,
         CAST(sum(m1 * m2) AS BIGINT) AS aa
  FROM p GROUP BY 1, 2
)
SELECT event_type, scale, CAST(n AS BIGINT) AS n_blocks,
       CAST(floor(ln(CAST(bb AS DOUBLE) / aa) * 10000 + {_OFF})
            AS BIGINT) AS sampen_e4
FROM agg
WHERE aa > 0 AND bb > 0
ORDER BY event_type, scale
"""

QUERIES["multiscale_entropy"] = q_multiscale_entropy
ORACLE_SQL["multiscale_entropy"] = SQL_MSE


# ---------------------------------------------------------------------------
# hopkins_statistic — clustering tendency of the embedding cloud
# (Hopkins & Skellam 1954; Lawson & Jurs distance form)
# ---------------------------------------------------------------------------
# H = sum u_i / (sum u_i + sum w_i): w_i = NN distance of each probe
# (vec_id % 10 == 0, self excluded) to the corpus; u_i = NN distance
# of a matched DETERMINISTIC pseudo-uniform point to the corpus.
# Synthetic coordinates are integers in the per-dim [min, max] box:
# emin + floor(h * (emax - emin) / 1000003) with the LCG-style hash
# h = (vec_id * 2654435761 + pos * 40503) % 1000003 — identical BIGINT
# arithmetic in both engines, so every squared distance is an exact
# BIGINT and the min/argmin is unambiguous.  H ~ 0.5 for CSR data,
# -> 1 for clustered data.  Probe-side joins are sample x corpus (the
# knn_loo posture), never corpus x corpus.


def q_hopkins_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = d.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("x").cast("double") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("e"),
    )
    box = t.groupBy("pos").agg(
        F.min("e").alias("emin"), F.max("e").alias("emax")
    )
    probes = t.filter(F.col("vec_id") % 10 == 0)
    # real-probe NN
    q = probes.select(
        F.col("vec_id").alias("qid"), "pos", F.col("e").alias("eq")
    )
    dreal = (
        q.join(t, "pos")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(
                (F.col("eq") - F.col("e")) * (F.col("eq") - F.col("e"))
            ).alias("d2")
        )
        .groupBy("qid")
        .agg(F.min("d2").alias("w2"))
    )
    # synthetic pseudo-uniform points on the same probe ids
    synth = (
        probes.select("vec_id", "pos")
        .join(F.broadcast(box), "pos")
        .select(
            F.col("vec_id").alias("qid"),
            "pos",
            (
                F.col("emin")
                + F.floor(
                    (
                        (
                            F.col("vec_id") * F.lit(2654435761)
                            + F.col("pos") * F.lit(40503)
                        )
                        % 1000003
                    )
                    * (F.col("emax") - F.col("emin"))
                    / 1000003
                )
            )
            .cast("long")
            .alias("eq"),
        )
    )
    dsyn = (
        synth.join(t, "pos")
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(
                (F.col("eq") - F.col("e")) * (F.col("eq") - F.col("e"))
            ).alias("d2")
        )
        .groupBy("qid")
        .agg(F.min("d2").alias("u2"))
    )
    both = dreal.join(dsyn, "qid").select(
        "qid",
        F.floor(F.sqrt(F.col("w2").cast("double")) + F.lit(_OFF))
        .cast("long")
        .alias("w"),
        F.floor(F.sqrt(F.col("u2").cast("double")) + F.lit(_OFF))
        .cast("long")
        .alias("u"),
    )
    agg = both.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("w").alias("sw"),
        F.sum("u").alias("su"),
    )
    h = F.col("su").cast("double") / (
        F.col("su") + F.col("sw")
    ).cast("double")
    return agg.select(
        F.col("m").cast("long").alias("m_probes"),
        F.floor(h * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "h_e6"
        ),
    )


SQL_HOPKINS = f"""
WITH t AS (
  SELECT vec_id, u.i - 1 AS pos,
         CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000000 + {_OFF})
              AS BIGINT) AS e
  FROM embeddings,
       unnest(generate_series(1, len(embedding))) AS u(i)
), box AS (
  SELECT pos, min(e) AS emin, max(e) AS emax FROM t GROUP BY 1
), probes AS (
  SELECT * FROM t WHERE vec_id % 10 = 0
), dreal AS (
  SELECT q.vec_id AS qid, r.vec_id,
         CAST(sum((q.e - r.e) * (q.e - r.e)) AS BIGINT) AS d2
  FROM probes q JOIN t r ON r.pos = q.pos AND r.vec_id <> q.vec_id
  GROUP BY 1, 2
), wmin AS (
  SELECT qid, min(d2) AS w2 FROM dreal GROUP BY 1
), synth AS (
  SELECT p.vec_id AS qid, p.pos,
         CAST(b.emin
              + floor(((p.vec_id * 2654435761 + p.pos * 40503)
                       % 1000003)
                      * (b.emax - b.emin) / 1000003.0)
              AS BIGINT) AS eq
  FROM probes p JOIN box b ON b.pos = p.pos
), dsyn AS (
  SELECT s.qid, r.vec_id,
         CAST(sum((s.eq - r.e) * (s.eq - r.e)) AS BIGINT) AS d2
  FROM synth s JOIN t r ON r.pos = s.pos
  GROUP BY 1, 2
), umin AS (
  SELECT qid, min(d2) AS u2 FROM dsyn GROUP BY 1
), bw AS (
  SELECT w.qid,
         CAST(floor(sqrt(CAST(w.w2 AS DOUBLE)) + {_OFF})
              AS BIGINT) AS w,
         CAST(floor(sqrt(CAST(u.u2 AS DOUBLE)) + {_OFF})
              AS BIGINT) AS u
  FROM wmin w JOIN umin u ON u.qid = w.qid
), agg AS (
  SELECT count(*) AS m, CAST(sum(w) AS BIGINT) AS sw,
         CAST(sum(u) AS BIGINT) AS su
  FROM bw
)
SELECT CAST(m AS BIGINT) AS m_probes,
       CAST(floor(CAST(su AS DOUBLE) / (su + sw) * 1000000 + {_OFF})
            AS BIGINT) AS h_e6
FROM agg
"""

QUERIES["hopkins_statistic"] = q_hopkins_statistic
ORACLE_SQL["hopkins_statistic"] = SQL_HOPKINS


# ---------------------------------------------------------------------------
# cube_type_dow — full CUBE grouping sets over (event_type, dow)
# ---------------------------------------------------------------------------
# The missing member of the OLAP rollup family (queries_olap has
# ROLLUP): all four grouping sets — (type, dow), (type), (dow), () —
# in one pass via Spark's cube() operator / DuckDB GROUP BY CUBE.
# Margins are labeled 'ALL' so the output schema is plain strings;
# value sums ride e2-floored integers.


def q_cube_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    )
    out = ev.cube("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").alias("sum_v2"),
    )
    return out.select(
        F.coalesce(F.col("event_type"), F.lit("ALL")).alias("etype"),
        F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias(
            "dow"
        ),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_v2").cast("long").alias("sum_v2"),
    ).orderBy("etype", "dow")


SQL_CUBE = f"""
WITH ev AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), c AS (
  SELECT event_type, dow,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(v) AS BIGINT) AS sum_v2
  FROM ev
  GROUP BY CUBE (event_type, dow)
)
SELECT coalesce(event_type, 'ALL') AS etype,
       coalesce(CAST(dow AS VARCHAR), 'ALL') AS dow,
       n_events, sum_v2
FROM c
ORDER BY etype, dow
"""

QUERIES["cube_type_dow"] = q_cube_type_dow
ORACLE_SQL["cube_type_dow"] = SQL_CUBE


# ===========================================================================
# Battery J — circular ANOVA (Watson-Williams), the German-tank
# serial-number estimator, Swamy's random-coefficients heterogeneity
# test, and McKay's CV confidence interval with Wilson-Hilferty chi2
# quantiles driven by the Acklam probit twin.
# ===========================================================================

_TWO_PI = 6.283185307179586


# ---------------------------------------------------------------------------
# watson_williams — equality of mean event time-of-day directions
# across event types
# ---------------------------------------------------------------------------
# Watson & Williams (1956): F = (N-k)(sum R_i - R) / ((k-1)(N - sum
# R_i)) on resultant lengths.  Events collapse to the bounded
# second-of-day domain first; cos/sin terms are e6-floored per
# distinct second so the resultant components are exact integers.


def q_watson_williams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sod = ev.select(
        "event_type",
        (
            F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
        ).cast("long").alias("sod"),
    ).groupBy("event_type", "sod").agg(
        F.count(F.lit(1)).alias("c")
    )
    ang = F.col("sod").cast("double") / 86_400.0 * _TWO_PI
    terms = sod.select(
        "event_type",
        "c",
        F.floor(F.cos(ang) * F.col("c") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("co6"),
        F.floor(F.sin(ang) * F.col("c") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("si6"),
    )
    grp = terms.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum("co6").alias("cc"),
        F.sum("si6").alias("ss"),
    )
    r_i = F.sqrt(
        F.col("cc").cast("double") * F.col("cc").cast("double")
        + F.col("ss").cast("double") * F.col("ss").cast("double")
    ) / 1e6
    g2 = grp.select(
        "event_type",
        "n",
        F.floor(r_i * 1e6 + F.lit(_OFF)).cast("long").alias("ri6"),
        "cc",
        "ss",
    )
    tot = g2.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("ri6").alias("sri6"),
        F.sum("cc").alias("tc"),
        F.sum("ss").alias("ts"),
    )
    rr = F.sqrt(
        F.col("tc").cast("double") * F.col("tc").cast("double")
        + F.col("ts").cast("double") * F.col("ts").cast("double")
    ) / 1e6
    sri = F.col("sri6").cast("double") / 1e6
    nd = F.col("nn").cast("double")
    kd = F.col("k").cast("double")
    fstat = (nd - kd) * (sri - rr) / ((kd - 1.0) * (nd - sri))
    rbar = rr / nd
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n"),
        F.floor(rbar * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rbar_e6"
        ),
        F.floor(fstat * 10_000 + F.lit(_OFF)).cast("long").alias(
            "f_e4"
        ),
    )


SQL_WATSON_WILLIAMS = f"""
WITH sod AS (
  SELECT event_type,
         CAST(EXTRACT(hour FROM ts) * 3600
              + EXTRACT(minute FROM ts) * 60
              + EXTRACT(second FROM ts) AS BIGINT) AS sod,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), terms AS (
  SELECT event_type, c,
         CAST(floor(cos(sod / 86400.0 * {_TWO_PI}) * c * 1e6 + {_OFF})
              AS BIGINT) AS co6,
         CAST(floor(sin(sod / 86400.0 * {_TWO_PI}) * c * 1e6 + {_OFF})
              AS BIGINT) AS si6
  FROM sod
), grp AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(co6) AS BIGINT) AS cc,
         CAST(sum(si6) AS BIGINT) AS ss
  FROM terms GROUP BY 1
), g2 AS (
  SELECT event_type, n, cc, ss,
         CAST(floor(sqrt(CAST(cc AS DOUBLE) * cc
                         + CAST(ss AS DOUBLE) * ss) / 1e6 * 1e6
                    + {_OFF}) AS BIGINT) AS ri6
  FROM grp
), tot AS (
  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(ri6) AS BIGINT) AS sri6,
         CAST(sum(cc) AS BIGINT) AS tc,
         CAST(sum(ss) AS BIGINT) AS ts
  FROM g2
)
SELECT CAST(k AS BIGINT) AS k_groups, nn AS n,
       CAST(floor(sqrt(CAST(tc AS DOUBLE) * tc + CAST(ts AS DOUBLE) * ts)
                  / 1e6 / nn * 1000000 + {_OFF}) AS BIGINT) AS rbar_e6,
       CAST(floor((nn - CAST(k AS DOUBLE))
                  * (CAST(sri6 AS DOUBLE) / 1e6
                     - sqrt(CAST(tc AS DOUBLE) * tc
                            + CAST(ts AS DOUBLE) * ts) / 1e6)
                  / ((k - 1.0)
                     * (nn - CAST(sri6 AS DOUBLE) / 1e6))
                  * 10000 + {_OFF}) AS BIGINT) AS f_e4
FROM tot
"""

QUERIES["watson_williams"] = q_watson_williams
ORACLE_SQL["watson_williams"] = SQL_WATSON_WILLIAMS


# ---------------------------------------------------------------------------
# german_tank — serial-number (maximum-spacing) population estimates
# from the user ids seen per event type
# ---------------------------------------------------------------------------
# With k distinct 1-based serials and observed maximum M, the MVUE is
# N^ = M + M/k - 1; also reported: the moment estimator 2*mean - 1.
# Exact integers throughout until the final rationals.


def q_german_tank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        "event_type", (F.col("user_id") + 1).alias("serial")
    ).groupBy("event_type").agg(
        F.countDistinct("serial").alias("k"),
        F.max("serial").alias("m"),
        F.sum(F.col("serial")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    md = F.col("m").cast("double")
    kd = F.col("k").cast("double")
    nhat = md + md / kd - 1.0
    mom = 2.0 * F.col("s").cast("double") / F.col("n").cast(
        "double"
    ) - 1.0
    return g.select(
        "event_type",
        F.col("k").cast("long").alias("k_distinct"),
        F.col("m").cast("long").alias("max_serial"),
        F.floor(nhat * 10_000 + F.lit(_OFF)).cast("long").alias(
            "nhat_mvue_e4"
        ),
        F.floor(mom * 10_000 + F.lit(_OFF)).cast("long").alias(
            "nhat_moment_e4"
        ),
    ).orderBy("event_type")


SQL_GERMAN_TANK = f"""
WITH g AS (
  SELECT event_type,
         CAST(count(DISTINCT user_id + 1) AS BIGINT) AS k,
         CAST(max(user_id + 1) AS BIGINT) AS m,
         CAST(sum(user_id + 1) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT event_type, k AS k_distinct, m AS max_serial,
       CAST(floor((CAST(m AS DOUBLE) + CAST(m AS DOUBLE) / k - 1.0)
                  * 10000 + {_OFF}) AS BIGINT) AS nhat_mvue_e4,
       CAST(floor((2.0 * CAST(s AS DOUBLE) / n - 1.0) * 10000 + {_OFF})
            AS BIGINT) AS nhat_moment_e4
FROM g
ORDER BY event_type
"""

QUERIES["german_tank"] = q_german_tank
ORACLE_SQL["german_tank"] = SQL_GERMAN_TANK


# ---------------------------------------------------------------------------
# swamy_random_coefficients — Swamy (1970) slope-heterogeneity S
# across the event-type panels (daily mean ~ day index)
# ---------------------------------------------------------------------------
# Per panel: OLS slope b_i, Var(b_i) = s_i^2 / Sxx_i; the
# precision-weighted pooled slope bbar = sum(b_i/v_i)/sum(1/v_i);
# S = sum (b_i - bbar)^2 / v_i ~ chi2(k-1) under homogeneity.
# Panel moments are exact integers; per-panel (b, v) doubles are
# combined over the 5-row panel domain with e9-floored S terms.


def q_swamy_random_coefficients(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").alias("sx"),
        F.sum(F.col("day") * F.col("day")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("day") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double") / nd
    cxy = F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double") / nd
    cyy = F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double") / nd
    b = cxy / cxx
    s2 = (cyy - b * cxy) / (nd - 2.0)
    v = s2 / cxx
    p = agg.filter((F.col("n") >= 4) & (cxx > 0)).select(
        "event_type", "n", b.alias("b"), v.alias("v")
    ).filter(F.col("v") > 0)
    tot = p.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.floor(1.0 / F.col("v") * 1e9 + F.lit(_OFF)).cast("long")
        ).alias("sw9"),
        F.sum(
            F.floor(F.col("b") / F.col("v") * 1e9 + F.lit(_OFF)).cast(
                "long"
            )
        ).alias("swb9"),
    )
    j = p.crossJoin(F.broadcast(tot))
    bbar = F.col("swb9").cast("double") / F.col("sw9").cast("double")
    term = (F.col("b") - bbar) * (F.col("b") - bbar) / F.col("v")
    j = j.withColumn(
        "t9", F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
    )
    out = j.groupBy("k").agg(F.sum("t9").alias("s9"))
    return out.select(
        F.col("k").cast("long").alias("k_panels"),
        F.floor(
            F.col("s9").cast("double") / 1e9 * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("s_e4"),
    )


SQL_SWAMY = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(day) AS BIGINT) AS sx,
         CAST(sum(day * day) AS BIGINT) AS sxx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(day * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM daily GROUP BY 1
), p AS (
  SELECT event_type, n,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
         / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS b,
         ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
          - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
            * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n))
         / (n - 2.0)
         / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS v
  FROM agg
  WHERE n >= 4
    AND CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n > 0
), p2 AS (
  SELECT * FROM p WHERE v > 0
), tot AS (
  SELECT count(*) AS k,
         CAST(sum(CAST(floor(1.0 / v * 1e9 + {_OFF}) AS BIGINT))
              AS BIGINT) AS sw9,
         CAST(sum(CAST(floor(b / v * 1e9 + {_OFF}) AS BIGINT))
              AS BIGINT) AS swb9
  FROM p2
), terms AS (
  SELECT t.k,
         CAST(floor((p2.b - CAST(t.swb9 AS DOUBLE) / t.sw9)
                    * (p2.b - CAST(t.swb9 AS DOUBLE) / t.sw9)
                    / p2.v * 1e9 + {_OFF}) AS BIGINT) AS t9
  FROM p2, tot t
)
SELECT CAST(k AS BIGINT) AS k_panels,
       CAST(floor(CAST(sum(t9) AS DOUBLE) / 1e9 * 10000 + {_OFF})
            AS BIGINT) AS s_e4
FROM terms GROUP BY k
"""

QUERIES["swamy_random_coefficients"] = q_swamy_random_coefficients
ORACLE_SQL["swamy_random_coefficients"] = SQL_SWAMY


# ---------------------------------------------------------------------------
# mckay_cv_ci — McKay (1932) confidence interval for the coefficient
# of variation, Vangel (1996) form, with Wilson-Hilferty chi-square
# quantiles
# ---------------------------------------------------------------------------
# limit(theta) = K * [ (theta/(nu+1) - 1) K^2 + theta/nu ]^(-1/2) with
# theta = chi2 quantile at 1-alpha/2 (lower) / alpha/2 (upper),
# approximated by the Wilson-Hilferty cube
#   chi2_q(p, nu) = nu (1 - 2/(9 nu) + z_p sqrt(2/(9 nu)))^3,
# z_{0.975} spelled as the same literal in both engines.  Sample
# moments are exact integers.


def q_mckay_cv_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    nd = F.col("n").cast("double")
    m = F.col("s").cast("double") / nd
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - 1.0)
    k = F.sqrt(var) / m
    nu = nd - 1.0
    z = 1.959963984540054

    def chi2q(zp):
        base = 1.0 - 2.0 / (9.0 * nu) + zp * F.sqrt(2.0 / (9.0 * nu))
        return nu * base * base * base

    def limit(theta):
        return k / F.sqrt(
            (theta / (nu + 1.0) - 1.0) * k * k + theta / nu
        )

    lo = limit(chi2q(F.lit(z)))
    hi = limit(chi2q(F.lit(-z)))
    return (
        g.filter((F.col("n") >= 3) & (F.col("s") > 0) & (var > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.floor(k * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "cv_e6"
            ),
            F.floor(lo * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "lo_e6"
            ),
            F.floor(hi * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "hi_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_MCKAY = f"""
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ss
  FROM events GROUP BY 1
), m AS (
  SELECT event_type, n,
         sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
              / (n - 1.0))
         / (CAST(s AS DOUBLE) / n) AS k,
         n - 1.0 AS nu, s,
         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
         / (n - 1.0) AS var
  FROM g
), q AS (
  SELECT event_type, n, k, nu,
         nu * (1.0 - 2.0 / (9.0 * nu)
               + 1.959963984540054 * sqrt(2.0 / (9.0 * nu)))
            * (1.0 - 2.0 / (9.0 * nu)
               + 1.959963984540054 * sqrt(2.0 / (9.0 * nu)))
            * (1.0 - 2.0 / (9.0 * nu)
               + 1.959963984540054 * sqrt(2.0 / (9.0 * nu))) AS th_hi,
         nu * (1.0 - 2.0 / (9.0 * nu)
               - 1.959963984540054 * sqrt(2.0 / (9.0 * nu)))
            * (1.0 - 2.0 / (9.0 * nu)
               - 1.959963984540054 * sqrt(2.0 / (9.0 * nu)))
            * (1.0 - 2.0 / (9.0 * nu)
               - 1.959963984540054 * sqrt(2.0 / (9.0 * nu))) AS th_lo
  FROM m
  WHERE n >= 3 AND s > 0 AND var > 0
)
SELECT event_type, n,
       CAST(floor(k * 1000000 + {_OFF}) AS BIGINT) AS cv_e6,
       CAST(floor(k / sqrt((th_hi / (nu + 1.0) - 1.0) * k * k
                           + th_hi / nu) * 1000000 + {_OFF})
            AS BIGINT) AS lo_e6,
       CAST(floor(k / sqrt((th_lo / (nu + 1.0) - 1.0) * k * k
                           + th_lo / nu) * 1000000 + {_OFF})
            AS BIGINT) AS hi_e6
FROM q
ORDER BY event_type
"""

QUERIES["mckay_cv_ci"] = q_mckay_cv_ci
ORACLE_SQL["mckay_cv_ci"] = SQL_MCKAY


# ===========================================================================
# Battery K — epidemiology-style rate standardization, the Theta
# forecasting method (Assimakopoulos & Nikolopoulos 2000), a
# Kulldorff-style Poisson scan statistic over diel windows, and the
# Hamilton (2018) regression filter.
# ===========================================================================


# ---------------------------------------------------------------------------
# rate_standardization — direct and indirect standardization of
# per-user event rates across hour-of-day strata
# ---------------------------------------------------------------------------
# Strata = hour of day; 'population' at risk per (type, hour) = the
# distinct users active; standard population = the all-types hour
# profile.  Direct: sum_h rate_th * N_h / sum_h N_h; Indirect SMR:
# observed_t / sum_h (overall rate_h * n_th).  All rates are exact
# rationals; stratum terms e9-floored before the 24-row sums.


def q_rate_standardization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cell = ev.select(
        "event_type", F.hour("ts").cast("long").alias("h"), "user_id"
    ).groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("c"),
        F.countDistinct("user_id").alias("u"),
    )
    std = cell.groupBy("h").agg(
        F.sum("c").alias("ch"), F.sum("u").alias("uh")
    )
    j = cell.join(F.broadcast(std), "h")
    direct9 = F.floor(
        F.col("c").cast("double")
        / F.col("u").cast("double")
        * F.col("uh").cast("double")
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    expect9 = F.floor(
        F.col("ch").cast("double")
        / F.col("uh").cast("double")
        * F.col("u").cast("double")
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = j.groupBy("event_type").agg(
        F.sum("c").alias("obs"),
        F.sum("u").alias("n_at_risk"),
        F.sum(direct9).alias("d9"),
        F.sum(expect9).alias("e9"),
        F.sum("uh").alias("std_pop"),
    )
    crude = F.col("obs").cast("double") / F.col("n_at_risk").cast(
        "double"
    )
    direct = (
        F.col("d9").cast("double") / 1e9 / F.col("std_pop").cast(
            "double"
        )
    )
    smr = F.col("obs").cast("double") / (
        F.col("e9").cast("double") / 1e9
    )
    return agg.select(
        "event_type",
        F.col("obs").cast("long").alias("observed"),
        F.floor(crude * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "crude_rate_e6"
        ),
        F.floor(direct * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "direct_rate_e6"
        ),
        F.floor(smr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "smr_e6"
        ),
    ).orderBy("event_type")


SQL_RATE_STD = f"""
WITH cell AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS c,
         CAST(count(DISTINCT user_id) AS BIGINT) AS u
  FROM events GROUP BY 1, 2
), std AS (
  SELECT h, CAST(sum(c) AS BIGINT) AS ch,
         CAST(sum(u) AS BIGINT) AS uh
  FROM cell GROUP BY 1
), j AS (
  SELECT c.event_type, c.c, c.u, s.ch, s.uh,
         CAST(floor(CAST(c.c AS DOUBLE) / c.u * s.uh * 1e9 + {_OFF})
              AS BIGINT) AS d9,
         CAST(floor(CAST(s.ch AS DOUBLE) / s.uh * c.u * 1e9 + {_OFF})
              AS BIGINT) AS e9
  FROM cell c JOIN std s ON s.h = c.h
), agg AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS obs,
         CAST(sum(u) AS BIGINT) AS n_at_risk,
         CAST(sum(d9) AS BIGINT) AS d9,
         CAST(sum(e9) AS BIGINT) AS e9,
         CAST(sum(uh) AS BIGINT) AS std_pop
  FROM j GROUP BY 1
)
SELECT event_type, obs AS observed,
       CAST(floor(CAST(obs AS DOUBLE) / n_at_risk * 1000000 + {_OFF})
            AS BIGINT) AS crude_rate_e6,
       CAST(floor(CAST(d9 AS DOUBLE) / 1e9 / std_pop * 1000000
                  + {_OFF}) AS BIGINT) AS direct_rate_e6,
       CAST(floor(CAST(obs AS DOUBLE) / (CAST(e9 AS DOUBLE) / 1e9)
                  * 1000000 + {_OFF}) AS BIGINT) AS smr_e6
FROM agg
ORDER BY event_type
"""

QUERIES["rate_standardization"] = q_rate_standardization
ORACLE_SQL["rate_standardization"] = SQL_RATE_STD


# ---------------------------------------------------------------------------
# poisson_scan_statistic — Kulldorff Poisson scan over diel windows
# ---------------------------------------------------------------------------
# Zones = circular hour windows of length 1..6 (24 starts x 6 lengths
# = 144 zones); LLR(z) = c ln(c/e) + (C-c) ln((C-c)/(C-e)) when c > e
# else 0, with e = C * zone_hours/24-weighted baseline from the
# all-type profile.  The zone domain is a broadcast 144-row table; the
# per-type hour profile (24 rows) joins it — everything after the
# first agg is constant-size at any corpus scale.


def q_poisson_scan_statistic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hp = ev.select(
        "event_type", F.hour("ts").cast("long").alias("h")
    ).groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("c"))
    base = hp.groupBy("h").agg(F.sum("c").alias("bh"))
    spark_ = hp.sparkSession
    zones = (
        spark_.range(0, 24)
        .select(F.col("id").alias("start"))
        .crossJoin(
            spark_.range(1, 7).select(F.col("id").alias("length"))
        )
    )
    zh = zones.join(
        spark_.range(0, 6).select(F.col("id").alias("off")),
        F.col("off") < F.col("length"),
    ).select(
        "start", "length", ((F.col("start") + F.col("off")) % 24).alias("h")
    )
    jz = zh.join(hp, "h").join(F.broadcast(base), "h")
    z = jz.groupBy("event_type", "start", "length").agg(
        F.sum("c").alias("cz"),
        F.sum("bh").alias("bz"),
    )
    tot = hp.groupBy("event_type").agg(F.sum("c").alias("ct"))
    btot = base.agg(F.sum("bh").alias("bt"))
    z = z.join(F.broadcast(tot), "event_type").crossJoin(
        F.broadcast(btot)
    )
    cz = F.col("cz").cast("double")
    ct = F.col("ct").cast("double")
    e = ct * F.col("bz").cast("double") / F.col("bt").cast("double")
    llr = F.when(
        (cz > e) & (F.col("ct") > F.col("cz")),
        cz * F.log(cz / e)
        + (ct - cz) * F.log((ct - cz) / (ct - e)),
    ).otherwise(0.0)
    scored = z.withColumn(
        "llr6", F.floor(llr * 1e6 + F.lit(_OFF)).cast("long")
    )
    best = scored.groupBy("event_type").agg(
        F.max_by(
            F.struct("start", "length", "llr6"),
            F.struct(
                F.col("llr6"), -F.col("length"), -F.col("start")
            ),
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.start").cast("long").alias("best_start"),
        F.col("b.length").cast("long").alias("best_length"),
        F.col("b.llr6").alias("llr_e6"),
    ).orderBy("event_type")


SQL_SCAN = f"""
WITH hp AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), base AS (
  SELECT h, CAST(sum(c) AS BIGINT) AS bh FROM hp GROUP BY 1
), zones AS (
  SELECT s.start, l.length, (s.start + o.off) % 24 AS h
  FROM (SELECT unnest(generate_series(0, 23)) AS start) s,
       (SELECT unnest(generate_series(1, 6)) AS length) l,
       (SELECT unnest(generate_series(0, 5)) AS off) o
  WHERE o.off < l.length
), z AS (
  SELECT p.event_type, zo.start, zo.length,
         CAST(sum(p.c) AS BIGINT) AS cz,
         CAST(sum(b.bh) AS BIGINT) AS bz
  FROM zones zo
  JOIN hp p ON p.h = zo.h
  JOIN base b ON b.h = zo.h
  GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS ct FROM hp GROUP BY 1
), bt AS (
  SELECT CAST(sum(bh) AS BIGINT) AS bt FROM base
), scored AS (
  SELECT z.event_type, z.start, z.length,
         CASE WHEN CAST(z.cz AS DOUBLE)
                   > t.ct * (CAST(z.bz AS DOUBLE) / b.bt)
               AND t.ct > z.cz
              THEN CAST(floor(
                (z.cz * ln(CAST(z.cz AS DOUBLE)
                           / (t.ct * (CAST(z.bz AS DOUBLE) / b.bt)))
                 + (t.ct - z.cz)
                   * ln((t.ct - CAST(z.cz AS DOUBLE))
                        / (t.ct - t.ct * (CAST(z.bz AS DOUBLE)
                                          / b.bt))))
                * 1e6 + {_OFF}) AS BIGINT)
              ELSE CAST(floor(0.0 * 1e6 + {_OFF}) AS BIGINT)
         END AS llr6
  FROM z, bt b
  JOIN tot t ON t.event_type = z.event_type
), rk AS (
  SELECT *, row_number() OVER (
           PARTITION BY event_type
           ORDER BY llr6 DESC, length ASC, start ASC) AS r
  FROM scored
)
SELECT event_type,
       CAST(start AS BIGINT) AS best_start,
       CAST(length AS BIGINT) AS best_length,
       llr6 AS llr_e6
FROM rk WHERE r = 1
ORDER BY event_type
"""

QUERIES["poisson_scan_statistic"] = q_poisson_scan_statistic
ORACLE_SQL["poisson_scan_statistic"] = SQL_SCAN


# ---------------------------------------------------------------------------
# theta_method_forecast — the Theta method (Assimakopoulos &
# Nikolopoulos 2000, M3 winner) on daily means, alpha = 0.5
# ---------------------------------------------------------------------------
# Theta0 = OLS trend line; Theta2 = 2y - trend; SES(alpha=1/2) level
# of Theta2 as a closed-form weighted sum (w_j = 0.5^(n-j+1), j >= 2;
# w_1 = 0.5^(n-1)), each weight spelled exp(k * ln(1/2)) with the same
# literal in both engines; forecast(h) = (trend(n+h) + level)/2.
# Weighted terms are e9-floored so the cross-engine sum is exact.


def q_theta_method_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    ln_half = -0.6931471805599453
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(wo))
    mom = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("i").alias("sx"),
        F.sum(F.col("i") * F.col("i")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("i") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double") / nd
    cxy = F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double") / nd
    b = cxy / cxx
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / nd
    mom = mom.filter((F.col("n") >= 10) & (cxx > 0)).select(
        "event_type", "n", a.alias("a"), b.alias("b")
    )
    j = idx.join(F.broadcast(mom), "event_type")
    z = 2.0 * F.col("y").cast("double") - (
        F.col("a") + F.col("b") * F.col("i").cast("double")
    )
    k = F.when(
        F.col("i") == 1, (F.col("n") - 1).cast("double")
    ).otherwise((F.col("n") - F.col("i") + 1).cast("double"))
    w = F.exp(k * F.lit(ln_half))
    j = j.withColumn(
        "t9", F.floor(w * z * 1e9 + F.lit(_OFF)).cast("long")
    )
    lev = j.groupBy("event_type").agg(F.sum("t9").alias("l9"))
    out = mom.join(lev, "event_type")
    level = F.col("l9").cast("double") / 1e9
    fc = (
        F.col("a")
        + F.col("b") * (F.col("n").cast("double") + 7.0)
        + level
    ) / 2.0 / 100.0
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(F.col("b") * 10_000 + F.lit(_OFF)).cast("long").alias(
            "trend_e4"
        ),
        F.floor(level / 100.0 * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("level_e4"),
        F.floor(fc * 10_000 + F.lit(_OFF)).cast("long").alias(
            "forecast7_e4"
        ),
    ).orderBy("event_type")


SQL_THETA = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                                    ORDER BY day) AS BIGINT) AS i
  FROM daily
), mom AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(i) AS BIGINT) AS sx,
         CAST(sum(i * i) AS BIGINT) AS sxx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(i * y) AS BIGINT) AS sxy
  FROM idx GROUP BY 1
), p AS (
  SELECT event_type, n,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
         / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
            * sx) / n AS a
  FROM mom
  WHERE n >= 10
    AND CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n > 0
), terms AS (
  SELECT i.event_type,
         CAST(floor(exp((CASE WHEN i.i = 1 THEN p.n - 1.0
                              ELSE p.n - i.i + 1.0 END)
                        * -0.6931471805599453)
                    * (2.0 * i.y - (p.a + p.b * i.i)) * 1e9 + {_OFF})
              AS BIGINT) AS t9
  FROM idx i JOIN p ON p.event_type = i.event_type
), lev AS (
  SELECT event_type, CAST(sum(t9) AS BIGINT) AS l9
  FROM terms GROUP BY 1
)
SELECT p.event_type, CAST(p.n AS BIGINT) AS n_days,
       CAST(floor(p.b * 10000 + {_OFF}) AS BIGINT) AS trend_e4,
       CAST(floor(CAST(l.l9 AS DOUBLE) / 1e9 / 100.0 * 10000 + {_OFF})
            AS BIGINT) AS level_e4,
       CAST(floor((p.a + p.b * (p.n + 7.0)
                   + CAST(l.l9 AS DOUBLE) / 1e9) / 2.0 / 100.0 * 10000
                  + {_OFF}) AS BIGINT) AS forecast7_e4
FROM p JOIN lev l ON l.event_type = p.event_type
ORDER BY p.event_type
"""

QUERIES["theta_method_forecast"] = q_theta_method_forecast
ORACLE_SQL["theta_method_forecast"] = SQL_THETA


# ---------------------------------------------------------------------------
# hamilton_filter — Hamilton (2018) regression filter: the cycle is
# the residual of y_{t} on (1, y_{t-8}, y_{t-9})
# ---------------------------------------------------------------------------
# "Why you should never use the HP filter": regress h=8 steps ahead on
# p=2 most recent observations.  Lags ride the consecutive day INDEX
# (gaps closed by indexing); the 3x3 normal equations are solved by
# Cramer determinants of exact integer moments; cycle sd from the
# closed-form SSR = Syy - b'X'y.


def q_hamilton_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    d = daily.withColumn("x1", F.lag("y", 8).over(wo)).withColumn(
        "x2", F.lag("y", 9).over(wo)
    ).filter(F.col("x2").isNotNull())
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    sy = F.col("sy").cast("double")
    s11 = F.col("s11").cast("double")
    s22 = F.col("s22").cast("double")
    s12 = F.col("s12").cast("double")
    s1y = F.col("s1y").cast("double")
    s2y = F.col("s2y").cast("double")
    syy = F.col("syy").cast("double")

    def det3(a, bq, c, dd, e, f, g, h, i):
        return (
            a * (e * i - f * h) - bq * (dd * i - f * g)
            + c * (dd * h - e * g)
        )

    dd = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    d0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    d2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    b0 = d0 / dd
    b1 = d1 / dd
    b2 = d2 / dd
    ssr = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    sd = F.sqrt(ssr / (n - 3.0)) / 100.0
    return (
        agg.filter((F.col("n") >= 12) & (dd > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_used"),
            F.floor(b1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "b1_e6"
            ),
            F.floor(b2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "b2_e6"
            ),
            F.floor(sd * 10_000 + F.lit(_OFF)).cast("long").alias(
                "cycle_sd_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_HAMILTON = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, y,
         lag(y, 8) OVER (PARTITION BY event_type ORDER BY day) AS x1,
         lag(y, 9) OVER (PARTITION BY event_type ORDER BY day) AS x2
  FROM daily
), d2 AS (
  SELECT * FROM d WHERE x2 IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x1) AS BIGINT) AS s1,
         CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM d2 GROUP BY 1
), m AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
         CAST(s2 AS DOUBLE) AS s2d, CAST(sy AS DOUBLE) AS syd,
         CAST(s11 AS DOUBLE) AS s11d, CAST(s22 AS DOUBLE) AS s22d,
         CAST(s12 AS DOUBLE) AS s12d, CAST(s1y AS DOUBLE) AS s1yd,
         CAST(s2y AS DOUBLE) AS s2yd, CAST(syy AS DOUBLE) AS syyd
  FROM agg
), det AS (
  SELECT *,
         nd * (s11d * s22d - s12d * s12d)
         - s1d * (s1d * s22d - s12d * s2d)
         + s2d * (s1d * s12d - s11d * s2d) AS dd,
         syd * (s11d * s22d - s12d * s12d)
         - s1d * (s1yd * s22d - s12d * s2yd)
         + s2d * (s1yd * s12d - s11d * s2yd) AS d0,
         nd * (s1yd * s22d - s12d * s2yd)
         - syd * (s1d * s22d - s12d * s2d)
         + s2d * (s1d * s2yd - s1yd * s2d) AS d1,
         nd * (s11d * s2yd - s1yd * s12d)
         - s1d * (s1d * s2yd - s1yd * s2d)
         + syd * (s1d * s12d - s11d * s2d) AS d2
  FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n_used,
       CAST(floor(d1 / dd * 1000000 + {_OFF}) AS BIGINT) AS b1_e6,
       CAST(floor(d2 / dd * 1000000 + {_OFF}) AS BIGINT) AS b2_e6,
       CAST(floor(sqrt((syyd - (d0 / dd * syd + d1 / dd * s1yd
                                + d2 / dd * s2yd)) / (nd - 3.0))
                  / 100.0 * 10000 + {_OFF}) AS BIGINT) AS cycle_sd_e4
FROM det
WHERE n >= 12 AND dd > 0
ORDER BY event_type
"""

QUERIES["hamilton_filter"] = q_hamilton_filter
ORACLE_SQL["hamilton_filter"] = SQL_HAMILTON


# ===========================================================================
# Battery L — distance-based two-sample testing (Szekely energy
# distance), the Rousseeuw-Croux Sn robust scale, and bias-corrected
# Cramer's V for the type x day-of-week contingency table.
# ===========================================================================


# ---------------------------------------------------------------------------
# energy_distance — Szekely-Rizzo two-sample energy statistic between
# day (hour 8-19) and night values
# ---------------------------------------------------------------------------
# E = 2 E|X-Y| - E|X-X'| - E|Y-Y'| with U-statistic pair means; every
# pairwise |.| sum comes from the value-domain prefix cumulative
# (the gmd/CRPS discipline) — ZERO pair joins:
#   sum_{x<y} (y-x) = sum_v c(v) * (v * cumcnt<(v) - cumsum<(v)).
# T = nA nB/(nA+nB) * E is the test statistic.  All sums exact BIGINT.


def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
        F.when(F.hour("ts").between(8, 19), 1).otherwise(0).alias("g"),
    ).groupBy("event_type", "v").agg(
        F.sum("g").alias("ca"),
        F.sum(1 - F.col("g")).alias("cb"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = (
        cnt.withColumn(
            "cuma", F.coalesce(F.sum("ca").over(w), F.lit(0))
        )
        .withColumn(
            "cumsa",
            F.coalesce(F.sum(F.col("ca") * F.col("v")).over(w), F.lit(0)),
        )
        .withColumn(
            "cumb", F.coalesce(F.sum("cb").over(w), F.lit(0))
        )
        .withColumn(
            "cumsb",
            F.coalesce(F.sum(F.col("cb") * F.col("v")).over(w), F.lit(0)),
        )
    )
    sab = (
        F.col("cb") * (F.col("v") * F.col("cuma") - F.col("cumsa"))
        + F.col("ca") * (F.col("v") * F.col("cumb") - F.col("cumsb"))
    )
    saa = F.col("ca") * (F.col("v") * F.col("cuma") - F.col("cumsa"))
    sbb = F.col("cb") * (F.col("v") * F.col("cumb") - F.col("cumsb"))
    agg = c.groupBy("event_type").agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(sab).alias("sab"),
        F.sum(saa).alias("saa"),
        F.sum(sbb).alias("sbb"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    exy = F.col("sab").cast("double") / (na * nb)
    exx = 2.0 * F.col("saa").cast("double") / (na * (na - 1.0))
    eyy = 2.0 * F.col("sbb").cast("double") / (nb * (nb - 1.0))
    e = (2.0 * exy - exx - eyy) / 100.0
    t = na * nb / (na + nb) * e
    return (
        agg.filter((F.col("na") >= 2) & (F.col("nb") >= 2))
        .select(
            "event_type",
            (F.col("na") + F.col("nb")).cast("long").alias("n"),
            F.floor(e * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "e_dist_e6"
            ),
            F.floor(t * 10_000 + F.lit(_OFF)).cast("long").alias(
                "t_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_ENERGY = f"""
WITH cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(sum(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
                       THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
                       THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM events GROUP BY 1, 2
), c AS (
  SELECT *,
         CAST(coalesce(sum(ca) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cuma,
         CAST(coalesce(sum(ca * v) OVER (PARTITION BY event_type
                ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumsa,
         CAST(coalesce(sum(cb) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumb,
         CAST(coalesce(sum(cb * v) OVER (PARTITION BY event_type
                ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumsb
  FROM cnt
), agg AS (
  SELECT event_type,
         CAST(sum(ca) AS BIGINT) AS na,
         CAST(sum(cb) AS BIGINT) AS nb,
         CAST(sum(cb * (v * cuma - cumsa)
                  + ca * (v * cumb - cumsb)) AS BIGINT) AS sab,
         CAST(sum(ca * (v * cuma - cumsa)) AS BIGINT) AS saa,
         CAST(sum(cb * (v * cumb - cumsb)) AS BIGINT) AS sbb
  FROM c GROUP BY 1
)
SELECT event_type, CAST(na + nb AS BIGINT) AS n,
       CAST(floor((2.0 * CAST(sab AS DOUBLE) / (CAST(na AS DOUBLE) * nb)
                   - 2.0 * CAST(saa AS DOUBLE)
                     / (CAST(na AS DOUBLE) * (na - 1.0))
                   - 2.0 * CAST(sbb AS DOUBLE)
                     / (CAST(nb AS DOUBLE) * (nb - 1.0))) / 100.0
                  * 1000000 + {_OFF}) AS BIGINT) AS e_dist_e6,
       CAST(floor(CAST(na AS DOUBLE) * nb / (na + nb)
                  * ((2.0 * CAST(sab AS DOUBLE)
                      / (CAST(na AS DOUBLE) * nb)
                      - 2.0 * CAST(saa AS DOUBLE)
                        / (CAST(na AS DOUBLE) * (na - 1.0))
                      - 2.0 * CAST(sbb AS DOUBLE)
                        / (CAST(nb AS DOUBLE) * (nb - 1.0))) / 100.0)
                  * 10000 + {_OFF}) AS BIGINT) AS t_e4
FROM agg
WHERE na >= 2 AND nb >= 2
ORDER BY event_type
"""

QUERIES["energy_distance_daynight"] = q_energy_distance
ORACLE_SQL["energy_distance_daynight"] = SQL_ENERGY


# ---------------------------------------------------------------------------
# sn_scale — Rousseeuw-Croux Sn robust scale of the daily-mean series
# ---------------------------------------------------------------------------
# Sn = 1.1926 * med_i med_{j != i} |x_i - x_j| (lower-median
# convention at both levels, deterministic day tie-breaks).  Pairs
# ride the bounded day x day self-join; medians are rank windows over
# the pair/day domains.


def q_sn_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    a = daily.select(
        "event_type", F.col("day").alias("di"), F.col("y").alias("yi")
    )
    b = daily.select(
        "event_type", F.col("day").alias("dj"), F.col("y").alias("yj")
    )
    p = a.join(b, "event_type").filter(F.col("di") != F.col("dj"))
    p = p.withColumn("d", F.abs(F.col("yi") - F.col("yj")))
    wi = Window.partitionBy("event_type", "di").orderBy("d", "dj")
    wni = Window.partitionBy("event_type", "di")
    inner = (
        p.withColumn("r", F.row_number().over(wi))
        .withColumn("m", F.count(F.lit(1)).over(wni))
        .filter(
            F.col("r")
            == F.floor((F.col("m") + 1) / 2).cast("long")
        )
        .select("event_type", "di", F.col("d").alias("dmed"))
    )
    wo = Window.partitionBy("event_type").orderBy("dmed", "di")
    wno = Window.partitionBy("event_type")
    outer = (
        inner.withColumn("r", F.row_number().over(wo))
        .withColumn("n", F.count(F.lit(1)).over(wno))
        .filter(
            F.col("r")
            == F.floor((F.col("n") + 1) / 2).cast("long")
        )
    )
    sn = F.col("dmed").cast("double") / 100.0 * 1.1926
    return outer.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(sn * 10_000 + F.lit(_OFF)).cast("long").alias(
            "sn_e4"
        ),
    ).orderBy("event_type")


SQL_SN = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), p AS (
  SELECT a.event_type, a.day AS di, b.day AS dj,
         abs(a.y - b.y) AS d
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type AND a.day <> b.day
), inner_med AS (
  SELECT event_type, di, d AS dmed
  FROM (
    SELECT *,
           row_number() OVER (PARTITION BY event_type, di
                              ORDER BY d, dj) AS r,
           count(*) OVER (PARTITION BY event_type, di) AS m
    FROM p
  ) t
  WHERE r = CAST(floor((m + 1) / 2.0) AS BIGINT)
), outer_med AS (
  SELECT event_type, dmed,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY dmed, di) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM inner_med
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(CAST(dmed AS DOUBLE) / 100.0 * 1.1926 * 10000
                  + {_OFF}) AS BIGINT) AS sn_e4
FROM outer_med
WHERE r = CAST(floor((n + 1) / 2.0) AS BIGINT)
ORDER BY event_type
"""

QUERIES["sn_scale"] = q_sn_scale
ORACLE_SQL["sn_scale"] = SQL_SN


# ---------------------------------------------------------------------------
# cramers_v_corrected — Cramer's V with the Bergsma (2013) bias
# correction for the event_type x day-of-week table
# ---------------------------------------------------------------------------
# phi2 = chi2/N; phi2corr = max(0, phi2 - (r-1)(c-1)/(N-1));
# rcorr = r - (r-1)^2/(N-1), ccorr likewise;
# Vcorr = sqrt(phi2corr / min(rcorr-1, ccorr-1)).  Cell chi2 terms are
# e6-floored; margins exact integers.


def q_cramers_v_corrected(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cell = ev.select(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("c"))
    rows = cell.groupBy("event_type").agg(F.sum("c").alias("rc"))
    cols = cell.groupBy("dow").agg(F.sum("c").alias("cc"))
    tot = cell.agg(
        F.sum("c").alias("nn"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("cdim"),
    )
    j = (
        cell.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "dow")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("rc").cast("double") * F.col("cc").cast("double") / F.col(
        "nn"
    ).cast("double")
    term = (F.col("c").cast("double") - e) * (
        F.col("c").cast("double") - e
    ) / e
    j = j.withColumn(
        "t6", F.floor(term * 1e6 + F.lit(_OFF)).cast("long")
    )
    agg = j.groupBy("nn", "r", "cdim").agg(F.sum("t6").alias("chi6"))
    nd = F.col("nn").cast("double")
    rd = F.col("r").cast("double")
    cd = F.col("cdim").cast("double")
    chi2 = F.col("chi6").cast("double") / 1e6
    phi2 = chi2 / nd
    phi2c = F.greatest(
        phi2 - (rd - 1.0) * (cd - 1.0) / (nd - 1.0), F.lit(0.0)
    )
    rcorr = rd - (rd - 1.0) * (rd - 1.0) / (nd - 1.0)
    ccorr = cd - (cd - 1.0) * (cd - 1.0) / (nd - 1.0)
    v = F.sqrt(chi2 / (nd * F.least(rd - 1.0, cd - 1.0)))
    vc = F.sqrt(phi2c / F.least(rcorr - 1.0, ccorr - 1.0))
    return agg.select(
        F.col("nn").cast("long").alias("n"),
        F.floor(chi2 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "chi2_e4"
        ),
        F.floor(v * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "v_e6"
        ),
        F.floor(vc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "v_corr_e6"
        ),
    )


SQL_CRAMERS_V = f"""
WITH cell AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), rows_ AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS rc
  FROM cell GROUP BY 1
), cols_ AS (
  SELECT dow, CAST(sum(c) AS BIGINT) AS cc FROM cell GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS nn,
         CAST(count(DISTINCT event_type) AS BIGINT) AS r,
         CAST(count(DISTINCT dow) AS BIGINT) AS cdim
  FROM cell
), terms AS (
  SELECT t.nn, t.r, t.cdim,
         CAST(floor((ce.c - CAST(ro.rc AS DOUBLE) * co.cc / t.nn)
                    * (ce.c - CAST(ro.rc AS DOUBLE) * co.cc / t.nn)
                    / (CAST(ro.rc AS DOUBLE) * co.cc / t.nn) * 1e6
                    + {_OFF}) AS BIGINT) AS t6
  FROM cell ce
  JOIN rows_ ro ON ro.event_type = ce.event_type
  JOIN cols_ co ON co.dow = ce.dow
  CROSS JOIN tot t
), agg AS (
  SELECT nn, r, cdim, CAST(sum(t6) AS BIGINT) AS chi6
  FROM terms GROUP BY 1, 2, 3
)
SELECT nn AS n,
       CAST(floor(CAST(chi6 AS DOUBLE) / 1e6 * 10000 + {_OFF})
            AS BIGINT) AS chi2_e4,
       CAST(floor(sqrt(CAST(chi6 AS DOUBLE) / 1e6
                       / (nn * least(r - 1.0, cdim - 1.0))) * 1000000
                  + {_OFF}) AS BIGINT) AS v_e6,
       CAST(floor(sqrt(greatest(CAST(chi6 AS DOUBLE) / 1e6 / nn
                                - (r - 1.0) * (cdim - 1.0) / (nn - 1.0),
                                0.0)
                       / least(r - (r - 1.0) * (r - 1.0) / (nn - 1.0)
                               - 1.0,
                               cdim - (cdim - 1.0) * (cdim - 1.0)
                               / (nn - 1.0) - 1.0)) * 1000000
                  + {_OFF}) AS BIGINT) AS v_corr_e6
FROM agg
"""

QUERIES["cramers_v_corrected"] = q_cramers_v_corrected
ORACLE_SQL["cramers_v_corrected"] = SQL_CRAMERS_V


# ===========================================================================
# Battery M — microstructure & volatility, wave 2 (complements
# amihud_illiquidity / roll_spread / capm_beta): Kyle's lambda price
# impact, bipower-variation jump detection, RiskMetrics EWMA VaR, and
# the Gatev pairs-trading SSD distance.
# ===========================================================================


# ---------------------------------------------------------------------------
# kyle_lambda — price-impact regression Delta p ~ signed flow
# ---------------------------------------------------------------------------
# Kyle (1985): lambda = cov(dp, q)/var(q) with dp = change in daily
# mean centi-value, q = change in daily event count (signed flow
# proxy).  Day-lag differences over the bounded day domain; exact
# integer cross-moments.


def q_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    d = (
        daily.withColumn("dp", F.col("y") - F.lag("y").over(wo))
        .withColumn("q", F.col("c") - F.lag("c").over(wo))
        .filter(F.col("dp").isNotNull())
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum("dp").alias("sp"),
        F.sum(F.col("q") * F.col("dp")).alias("sqp"),
    )
    nd = F.col("n").cast("double")
    cqq = F.col("sqq").cast("double") - F.col("sq").cast(
        "double"
    ) * F.col("sq").cast("double") / nd
    cqp = F.col("sqp").cast("double") - F.col("sq").cast(
        "double"
    ) * F.col("sp").cast("double") / nd
    lam = cqp / cqq
    return (
        agg.filter((F.col("n") >= 3) & (cqq > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.floor(lam * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("lambda_e6"),
        )
        .orderBy("event_type")
    )


SQL_KYLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type,
         y - lag(y) OVER (PARTITION BY event_type ORDER BY day) AS dp,
         c - lag(c) OVER (PARTITION BY event_type ORDER BY day) AS q
  FROM daily
), d2 AS (
  SELECT * FROM d WHERE dp IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(q) AS BIGINT) AS sq,
         CAST(sum(q * q) AS BIGINT) AS sqq,
         CAST(sum(dp) AS BIGINT) AS sp,
         CAST(sum(q * dp) AS BIGINT) AS sqp
  FROM d2 GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor((CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * sp / n)
                  / (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n)
                  * 1000000 + {_OFF}) AS BIGINT) AS lambda_e6
FROM agg
WHERE n >= 3
  AND CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n > 0
ORDER BY event_type
"""

QUERIES["kyle_lambda"] = q_kyle_lambda
ORACLE_SQL["kyle_lambda"] = SQL_KYLE


# ---------------------------------------------------------------------------
# bipower_jump_ratio — realized variance vs bipower variation on
# hourly returns (Barndorff-Nielsen & Shephard 2004)
# ---------------------------------------------------------------------------
# RV = sum r^2; BV = (pi/2) sum |r_t||r_{t-1}|; the relative jump
# component J = max(0, 1 - BV/RV) isolates the squared-jump share.
# Hourly returns are integer diffs over the consecutive hour INDEX;
# |r||r'| products stay exact BIGINT — pi/2 enters once at the end.


def q_bipower_jump_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        )
        .cast("long")
        .alias("slot"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    wo = Window.partitionBy("event_type").orderBy("slot")
    r = hourly.withColumn(
        "r", F.col("y") - F.lag("y").over(wo)
    ).filter(F.col("r").isNotNull())
    r = r.withColumn("rp", F.abs(F.lag("r").over(wo)))
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r") * F.col("r")).alias("rv_i"),
        F.sum(
            F.when(
                F.col("rp").isNotNull(), F.abs(F.col("r")) * F.col("rp")
            ).otherwise(0)
        ).alias("bp_i"),
    )
    half_pi = 1.5707963267948966
    rv = F.col("rv_i").cast("double") / 10_000.0
    bv = F.lit(half_pi) * F.col("bp_i").cast("double") / 10_000.0
    jr = F.greatest(F.lit(0.0), 1.0 - bv / rv)
    return (
        agg.filter((F.col("n") >= 10) & (F.col("rv_i") > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_returns"),
            F.floor(rv * 10_000 + F.lit(_OFF)).cast("long").alias(
                "rv_e4"
            ),
            F.floor(bv * 10_000 + F.lit(_OFF)).cast("long").alias(
                "bv_e4"
            ),
            F.floor(jr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "jump_ratio_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_BIPOWER = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, slot,
         y - lag(y) OVER (PARTITION BY event_type ORDER BY slot) AS r
  FROM hourly
), r2 AS (
  SELECT event_type, r,
         abs(lag(r) OVER (PARTITION BY event_type ORDER BY slot))
           AS rp
  FROM r WHERE r IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(r * r) AS BIGINT) AS rv_i,
         CAST(sum(CASE WHEN rp IS NOT NULL THEN abs(r) * rp
                       ELSE 0 END) AS BIGINT) AS bp_i
  FROM r2 GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_returns,
       CAST(floor(CAST(rv_i AS DOUBLE) / 10000.0 * 10000 + {_OFF})
            AS BIGINT) AS rv_e4,
       CAST(floor(1.5707963267948966 * bp_i / 10000.0 * 10000 + {_OFF})
            AS BIGINT) AS bv_e4,
       CAST(floor(greatest(0.0,
                           1.0 - 1.5707963267948966 * bp_i
                                 / CAST(rv_i AS DOUBLE)) * 1000000
                  + {_OFF}) AS BIGINT) AS jump_ratio_e6
FROM agg
WHERE n >= 10 AND rv_i > 0
ORDER BY event_type
"""

QUERIES["bipower_jump_ratio"] = q_bipower_jump_ratio
ORACLE_SQL["bipower_jump_ratio"] = SQL_BIPOWER


# ---------------------------------------------------------------------------
# riskmetrics_var — EWMA (lambda = 0.94) volatility and 95% VaR of
# daily returns (J.P. Morgan RiskMetrics 1996)
# ---------------------------------------------------------------------------
# sigma^2 = sum_k w_k r_{n-k}^2 with w_k = lambda^k (1-lambda) /
# (1 - lambda^m) normalized over the m available returns; weights are
# exp(k ln 0.94) with the shared literal; terms e6-floored.
# VaR95 = 1.6448536269514722 * sigma.


def q_riskmetrics_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ln_lam = -0.06187540371808753  # ln(0.94)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    r = daily.withColumn(
        "r", F.col("y") - F.lag("y").over(wo)
    ).filter(F.col("r").isNotNull())
    r = r.withColumn("j", F.row_number().over(wo))
    wn = Window.partitionBy("event_type")
    r = r.withColumn("m", F.count(F.lit(1)).over(wn))
    k = (F.col("m") - F.col("j")).cast("double")
    w = F.exp(k * F.lit(ln_lam)) * F.lit(0.06)
    term = w * F.col("r").cast("double") * F.col("r").cast("double")
    r = r.withColumn(
        "t6", F.floor(term * 1e6 + F.lit(_OFF)).cast("long")
    )
    agg = r.groupBy("event_type").agg(
        F.max("m").alias("m"), F.sum("t6").alias("s6")
    )
    md = F.col("m").cast("double")
    norm = 1.0 - F.exp(md * F.lit(ln_lam))
    sig = F.sqrt(F.col("s6").cast("double") / 1e6 / norm) / 100.0
    var95 = F.lit(1.6448536269514722) * sig
    return agg.select(
        "event_type",
        F.col("m").cast("long").alias("n_returns"),
        F.floor(sig * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "sigma_e6"
        ),
        F.floor(var95 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "var95_e6"
        ),
    ).orderBy("event_type")


SQL_RISKMETRICS = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, day,
         y - lag(y) OVER (PARTITION BY event_type ORDER BY day) AS r
  FROM daily
), r2 AS (
  SELECT event_type, r,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS j,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM r WHERE r IS NOT NULL
), t AS (
  SELECT event_type, m,
         CAST(floor(exp((m - j) * -0.06187540371808753) * 0.06
                    * r * r * 1e6 + {_OFF}) AS BIGINT) AS t6
  FROM r2
), agg AS (
  SELECT event_type, max(m) AS m, CAST(sum(t6) AS BIGINT) AS s6
  FROM t GROUP BY 1
)
SELECT event_type, CAST(m AS BIGINT) AS n_returns,
       CAST(floor(sqrt(CAST(s6 AS DOUBLE) / 1e6
                       / (1.0 - exp(m * -0.06187540371808753)))
                  / 100.0 * 1000000 + {_OFF}) AS BIGINT) AS sigma_e6,
       CAST(floor(1.6448536269514722
                  * sqrt(CAST(s6 AS DOUBLE) / 1e6
                         / (1.0 - exp(m * -0.06187540371808753)))
                  / 100.0 * 1000000 + {_OFF}) AS BIGINT) AS var95_e6
FROM agg
ORDER BY event_type
"""

QUERIES["riskmetrics_var"] = q_riskmetrics_var
ORACLE_SQL["riskmetrics_var"] = SQL_RISKMETRICS


# ---------------------------------------------------------------------------
# gatev_pairs_distance — pairs-trading formation-period SSD between
# normalized type series (Gatev, Goetzmann & Rouwenhorst 2006)
# ---------------------------------------------------------------------------
# Each type's daily mean is normalized by its first-day value (e6
# fixed-point integers), pairs join on day, SSD = sum (pa - pb)^2 —
# exact BIGINT; smaller SSD = better pair candidate.


def q_gatev_pairs_distance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    d = daily.withColumn("y0", F.first("y").over(wo))
    d = d.withColumn(
        "p",
        F.floor(
            F.col("y").cast("double")
            / F.col("y0").cast("double")
            * 1e6
            + F.lit(_OFF)
        ).cast("long"),
    )
    a = d.select(
        F.col("event_type").alias("ta"), "day", F.col("p").alias("pa")
    )
    b = d.select(
        F.col("event_type").alias("tb"), "day", F.col("p").alias("pb")
    )
    j = a.join(b, "day").filter(F.col("ta") < F.col("tb"))
    agg = j.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("pa") - F.col("pb")) * (F.col("pa") - F.col("pb"))
        ).alias("ssd"),
    )
    ssd = F.col("ssd").cast("double") / 1e12
    return (
        agg.filter(F.col("n") >= 10)
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("n").cast("long").alias("n_days"),
            F.floor(ssd * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("ssd_e6"),
        )
        .orderBy("type_a", "type_b")
    )


SQL_GATEV = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day,
         CAST(floor(CAST(y AS DOUBLE)
                    / first_value(y) OVER (PARTITION BY event_type
                                           ORDER BY day)
                    * 1e6 + {_OFF}) AS BIGINT) AS p
  FROM daily
), j AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.day,
         a.p AS pa, b.p AS pb
  FROM d a JOIN d b ON b.day = a.day AND a.event_type < b.event_type
), agg AS (
  SELECT ta, tb, count(*) AS n,
         CAST(sum((pa - pb) * (pa - pb)) AS BIGINT) AS ssd
  FROM j GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b, CAST(n AS BIGINT) AS n_days,
       CAST(floor(CAST(ssd AS DOUBLE) / 1e12 * 1000000 + {_OFF})
            AS BIGINT) AS ssd_e6
FROM agg
WHERE n >= 10
ORDER BY type_a, type_b
"""

QUERIES["gatev_pairs_distance"] = q_gatev_pairs_distance
ORACLE_SQL["gatev_pairs_distance"] = SQL_GATEV


# ===========================================================================
# Battery N — non-Gaussianity (FastICA negentropy approximation),
# Taguchi signal-to-noise ratios, and SAX symbolic motif mining.
# ===========================================================================


# ---------------------------------------------------------------------------
# negentropy_approx — Hyvarinen (1998) negentropy approximation of the
# standardized daily-mean distribution
# ---------------------------------------------------------------------------
# J ~ k1 (E[y exp(-y^2/2)])^2 + k2 (E[exp(-y^2/2)] - sqrt(1/2))^2 with
# k1 = 36/(8 sqrt3 - 9), k2 = 24/(16 sqrt3 - 27) — the FastICA
# contrast pair.  Day-domain expectations with e12-floored terms.


def q_negentropy_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    k1 = 7.412888621904903   # 36/(8*sqrt(3)-9)
    k2 = 33.67480105770059   # 24/(16*sqrt(3)-27)
    sqrt_half = 0.7071067811865476
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sy").cast("double") / nd
    var = F.col("syy").cast("double") / nd - mean * mean
    mom = mom.select(
        "event_type", "n", mean.alias("mean"), F.sqrt(var).alias("s")
    ).filter((F.col("n") >= 4) & (var > 0))
    j = daily.join(F.broadcast(mom), "event_type")
    z = (F.col("y").cast("double") - F.col("mean")) / F.col("s")
    g = F.exp(-z * z / 2.0)
    j = j.withColumn(
        "t1", F.floor(z * g * 1e12 + F.lit(_OFF)).cast("long")
    ).withColumn("t2", F.floor(g * 1e12 + F.lit(_OFF)).cast("long"))
    agg = j.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("t1").alias("s1"),
        F.sum("t2").alias("s2"),
    )
    nd2 = F.col("n").cast("double")
    e1 = F.col("s1").cast("double") / 1e12 / nd2
    e2 = F.col("s2").cast("double") / 1e12 / nd2
    jn = F.lit(k1) * e1 * e1 + F.lit(k2) * (
        e2 - F.lit(sqrt_half)
    ) * (e2 - F.lit(sqrt_half))
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(e1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "skew_term_e6"
        ),
        F.floor(e2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "kurt_term_e6"
        ),
        F.floor(jn * 1_000_000_000 + F.lit(_OFF)).cast("long").alias(
            "negentropy_e9"
        ),
    ).orderBy("event_type")


SQL_NEGENTROPY = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(y) AS DOUBLE) / count(*) AS mean,
         sqrt(CAST(sum(y * y) AS DOUBLE) / count(*)
              - (CAST(sum(y) AS DOUBLE) / count(*))
                * (CAST(sum(y) AS DOUBLE) / count(*))) AS s
  FROM daily GROUP BY 1
  HAVING count(*) >= 4
     AND CAST(sum(y * y) AS DOUBLE) / count(*)
         - (CAST(sum(y) AS DOUBLE) / count(*))
           * (CAST(sum(y) AS DOUBLE) / count(*)) > 0
), t AS (
  SELECT d.event_type, m.n,
         CAST(floor(((d.y - m.mean) / m.s)
                    * exp(-((d.y - m.mean) / m.s)
                          * ((d.y - m.mean) / m.s) / 2.0) * 1e12
                    + {_OFF}) AS BIGINT) AS t1,
         CAST(floor(exp(-((d.y - m.mean) / m.s)
                        * ((d.y - m.mean) / m.s) / 2.0) * 1e12
                    + {_OFF}) AS BIGINT) AS t2
  FROM daily d JOIN mom m ON m.event_type = d.event_type
), agg AS (
  SELECT event_type, max(n) AS n,
         CAST(sum(t1) AS BIGINT) AS s1,
         CAST(sum(t2) AS BIGINT) AS s2
  FROM t GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(CAST(s1 AS DOUBLE) / 1e12 / n * 1000000 + {_OFF})
            AS BIGINT) AS skew_term_e6,
       CAST(floor(CAST(s2 AS DOUBLE) / 1e12 / n * 1000000 + {_OFF})
            AS BIGINT) AS kurt_term_e6,
       CAST(floor((7.412888621904903
                   * (CAST(s1 AS DOUBLE) / 1e12 / n)
                   * (CAST(s1 AS DOUBLE) / 1e12 / n)
                   + 33.67480105770059
                     * (CAST(s2 AS DOUBLE) / 1e12 / n
                        - 0.7071067811865476)
                     * (CAST(s2 AS DOUBLE) / 1e12 / n
                        - 0.7071067811865476)) * 1000000000 + {_OFF})
            AS BIGINT) AS negentropy_e9
FROM agg
ORDER BY event_type
"""

QUERIES["negentropy_approx"] = q_negentropy_approx
ORACLE_SQL["negentropy_approx"] = SQL_NEGENTROPY


# ---------------------------------------------------------------------------
# taguchi_sn — Taguchi signal-to-noise ratios (larger-better,
# smaller-better, nominal-best) of event values per type
# ---------------------------------------------------------------------------
# SN_L = -10 log10(mean 1/y^2); SN_S = -10 log10(mean y^2);
# SN_N = 10 log10(ybar^2 / s^2).  1/y^2 collapses to the distinct
# centi-value domain with e12-floored reciprocal terms; everything
# else is exact moments.  log10 = ln / ln(10) with the shared literal.


def q_taguchi_sn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ln10 = 2.302585092994046
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).filter(F.col("v") > 0).groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    vd = F.col("v").cast("double") / 100.0
    rec12 = F.floor(
        F.col("c").cast("double") / (vd * vd) * 1e12 + F.lit(_OFF)
    ).cast("long")
    agg = cnt.select(
        "event_type", "c", "v", rec12.alias("r12")
    ).groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("v")).alias("sv"),
        F.sum(F.col("c") * F.col("v") * F.col("v")).alias("svv"),
        F.sum("r12").alias("sr12"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sv").cast("double") / nd / 100.0
    msq = F.col("svv").cast("double") / nd / 10_000.0
    var = (
        (
            F.col("svv").cast("double")
            - F.col("sv").cast("double") * F.col("sv").cast("double")
            / nd
        )
        / (nd - 1.0)
        / 10_000.0
    )
    mrec = F.col("sr12").cast("double") / 1e12 / nd
    sn_l = -10.0 * F.log(mrec) / F.lit(ln10)
    sn_s = -10.0 * F.log(msq) / F.lit(ln10)
    sn_n = 10.0 * F.log(mean * mean / var) / F.lit(ln10)
    return (
        agg.filter((F.col("n") >= 3) & (var > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.floor(sn_l * 10_000 + F.lit(_OFF)).cast("long").alias(
                "sn_larger_e4"
            ),
            F.floor(sn_s * 10_000 + F.lit(_OFF)).cast("long").alias(
                "sn_smaller_e4"
            ),
            F.floor(sn_n * 10_000 + F.lit(_OFF)).cast("long").alias(
                "sn_nominal_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_TAGUCHI = f"""
WITH cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events
  WHERE CAST(floor(value * 100 + {_OFF}) AS BIGINT) > 0
  GROUP BY 1, 2
), t AS (
  SELECT event_type, c, v,
         CAST(floor(CAST(c AS DOUBLE)
                    / ((v / 100.0) * (v / 100.0)) * 1e12 + {_OFF})
              AS BIGINT) AS r12
  FROM cnt
), agg AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * v) AS BIGINT) AS sv,
         CAST(sum(c * v * v) AS BIGINT) AS svv,
         CAST(sum(r12) AS BIGINT) AS sr12
  FROM t GROUP BY 1
), m AS (
  SELECT event_type, n,
         CAST(sv AS DOUBLE) / n / 100.0 AS mean,
         CAST(svv AS DOUBLE) / n / 10000.0 AS msq,
         (CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n)
         / (n - 1.0) / 10000.0 AS var,
         CAST(sr12 AS DOUBLE) / 1e12 / n AS mrec
  FROM agg
)
SELECT event_type, n,
       CAST(floor(-10.0 * ln(mrec) / 2.302585092994046 * 10000
                  + {_OFF}) AS BIGINT) AS sn_larger_e4,
       CAST(floor(-10.0 * ln(msq) / 2.302585092994046 * 10000
                  + {_OFF}) AS BIGINT) AS sn_smaller_e4,
       CAST(floor(10.0 * ln(mean * mean / var) / 2.302585092994046
                  * 10000 + {_OFF}) AS BIGINT) AS sn_nominal_e4
FROM m
WHERE n >= 3 AND var > 0
ORDER BY event_type
"""

QUERIES["taguchi_sn"] = q_taguchi_sn
ORACLE_SQL["taguchi_sn"] = SQL_TAGUCHI


# ---------------------------------------------------------------------------
# sax_motifs — SAX symbolic trigram motifs of the daily-mean series
# (Lin, Keogh, Lonardi & Chiu 2003)
# ---------------------------------------------------------------------------
# Standardized daily means discretized to {a, b, c} at the Gaussian
# tertile breakpoints +-0.4307272992954576; trigrams via two lags over
# the day index; top-3 motifs per type with (count desc, motif asc)
# tie-break.


def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    bp = 0.4307272992954576
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.floor(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sy").cast("double") / nd
    var = F.col("syy").cast("double") / nd - mean * mean
    mom = mom.select(
        "event_type", mean.alias("mean"), F.sqrt(var).alias("s")
    ).filter(var > 0)
    j = daily.join(F.broadcast(mom), "event_type")
    z = (F.col("y").cast("double") - F.col("mean")) / F.col("s")
    sym = (
        F.when(z < -bp, F.lit("a"))
        .when(z > bp, F.lit("c"))
        .otherwise(F.lit("b"))
    )
    j = j.withColumn("sym", sym)
    wo = Window.partitionBy("event_type").orderBy("day")
    tri = j.withColumn(
        "motif",
        F.concat(
            F.lag("sym", 2).over(wo), F.lag("sym", 1).over(wo),
            F.col("sym"),
        ),
    ).filter(F.col("motif").isNotNull())
    cnt = tri.groupBy("event_type", "motif").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("motif")
    )
    top = cnt.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 3
    )
    return top.select(
        "event_type",
        F.col("rk").cast("long").alias("rank"),
        "motif",
        F.col("cnt").cast("long").alias("cnt"),
    ).orderBy("event_type", "rank")


SQL_SAX = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT event_type,
         CAST(sum(y) AS DOUBLE) / count(*) AS mean,
         sqrt(CAST(sum(y * y) AS DOUBLE) / count(*)
              - (CAST(sum(y) AS DOUBLE) / count(*))
                * (CAST(sum(y) AS DOUBLE) / count(*))) AS s
  FROM daily GROUP BY 1
  HAVING CAST(sum(y * y) AS DOUBLE) / count(*)
         - (CAST(sum(y) AS DOUBLE) / count(*))
           * (CAST(sum(y) AS DOUBLE) / count(*)) > 0
), sym AS (
  SELECT d.event_type, d.day,
         CASE WHEN (d.y - m.mean) / m.s < -0.4307272992954576 THEN 'a'
              WHEN (d.y - m.mean) / m.s > 0.4307272992954576 THEN 'c'
              ELSE 'b' END AS sym
  FROM daily d JOIN mom m ON m.event_type = d.event_type
), tri AS (
  SELECT event_type,
         lag(sym, 2) OVER (PARTITION BY event_type ORDER BY day)
         || lag(sym, 1) OVER (PARTITION BY event_type ORDER BY day)
         || sym AS motif
  FROM sym
), cnt AS (
  SELECT event_type, motif, CAST(count(*) AS BIGINT) AS cnt
  FROM tri WHERE motif IS NOT NULL
  GROUP BY 1, 2
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY cnt DESC, motif) AS rk
  FROM cnt
)
SELECT event_type, CAST(rk AS BIGINT) AS rank, motif, cnt
FROM rk WHERE rk <= 3
ORDER BY event_type, rank
"""

QUERIES["sax_motifs"] = q_sax_motifs
ORACLE_SQL["sax_motifs"] = SQL_SAX
