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
