"""Round-4 continuation registry (sixteenth battery): probability
CALIBRATION auditing — the model-monitoring layer every production
scoring pipeline needs and the registry previously lacked.  A
deterministic in-engine "model" (per-(type, hour) base rate fitted on
days 1-15) is scored on days 16-30 and audited three ways: the
Hosmer-Lemeshow grouped chi-square, Spiegelhalter's (1986) exact-
variance Z, and the reliability-diagram summary (ECE/MCE).  Plus the
Kish (1965) design effect of unequal weights — the survey-sampling
twin of the autocorrelation ESS already in stats10.

House exactness rules (CLAUDE.md): every per-row double is floored to
a scaled BIGINT (offset 1/pi) BEFORE aggregation, so cross-engine
sums are exact-integer and the final doubles are bit-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Shared fitted-model scaffold: binary outcome y = (centi-value above
# the type's train-half integer mean), predicted probability p =
# train-half per-(type, hour) mean of y, e6-floored to an integer so
# every downstream sum is exact.
# ---------------------------------------------------------------------------


def _scored_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    train = ev.filter(F.col("dom") <= 15)
    thr = train.groupBy("event_type").agg(
        F.floor(F.sum("v") / F.count(F.lit(1))).cast("long").alias("thr")
    )
    ty = train.join(F.broadcast(thr), "event_type").withColumn(
        "y", (F.col("v") > F.col("thr")).cast("long")
    )
    rate = ty.groupBy("event_type", "hh").agg(
        F.floor(
            F.sum("y").cast("double")
            / F.count(F.lit(1)).cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("p_e6")
    )
    test = (
        ev.filter(F.col("dom") > 15)
        .join(F.broadcast(thr), "event_type")
        .withColumn("y", (F.col("v") > F.col("thr")).cast("long"))
        .join(F.broadcast(rate), ["event_type", "hh"])
    )
    return test.select("event_type", "y", "p_e6")


_SQL_SCORED = f"""
  ev AS (
    SELECT event_type,
           EXTRACT(day FROM ts) AS dom,
           EXTRACT(hour FROM ts) AS hh,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
    FROM events
  ), thr AS (
    SELECT event_type,
           CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS thr
    FROM ev WHERE dom <= 15 GROUP BY 1
  ), rate AS (
    SELECT ev.event_type, hh,
           CAST(floor(CAST(sum(CASE WHEN v > thr THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*) * 1000000 + {_OFF})
                AS BIGINT) AS p_e6
    FROM ev JOIN thr ON thr.event_type = ev.event_type
    WHERE dom <= 15 GROUP BY 1, 2
  ), scored AS (
    SELECT ev.event_type,
           CASE WHEN v > thr THEN 1 ELSE 0 END AS y,
           p_e6
    FROM ev
    JOIN thr ON thr.event_type = ev.event_type
    JOIN rate ON rate.event_type = ev.event_type AND rate.hh = ev.hh
    WHERE dom > 15
  )
"""


# ---------------------------------------------------------------------------
# hosmer_lemeshow — grouped goodness-of-fit chi-square (Hosmer &
# Lemeshow 1980), fixed-width probability bins (the HL-H variant:
# bin = floor(10 p), deterministic and rank-free)
# ---------------------------------------------------------------------------
# chi2 = sum_bins (O1-E1)^2/E1 + (O0-E0)^2/E0 over bins with both
# expected counts positive; E1 is the exact integer sum of p_e6.


def q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _scored_test(spark, sf_dir).withColumn(
        "b", F.least(F.floor(F.col("p_e6") / 100_000), F.lit(9)).cast("long")
    )
    g = t.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("y").alias("o1"),
        F.sum("p_e6").alias("e1_e6"),
    )
    e1 = F.col("e1_e6").cast("double") / 1e6
    e0 = F.col("nb").cast("double") - e1
    o1 = F.col("o1").cast("double")
    o0 = (F.col("nb") - F.col("o1")).cast("double")
    term = F.pow(o1 - e1, 2) / e1 + F.pow(o0 - e0, 2) / e0
    kept = g.filter((F.col("e1_e6") > 0) & (e0 > 0)).withColumn(
        "term_e6", F.floor(term * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.sum("nb").cast("long").alias("n_test"),
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum("o1").cast("long").alias("observed_pos"),
            F.floor(
                F.sum("e1_e6").cast("double") / 1e6 + F.lit(_OFF)
            )
            .cast("long")
            .alias("expected_pos"),
            F.sum("term_e6").cast("long").alias("hl_chi2_e6"),
        )
        .orderBy("event_type")
    )


SQL_HL = f"""
WITH {_SQL_SCORED}, binned AS (
  SELECT event_type,
         least(CAST(floor(p_e6 / 100000) AS BIGINT), 9) AS b,
         y, p_e6
  FROM scored
), g AS (
  SELECT event_type, b, count(*) AS nb,
         CAST(sum(y) AS BIGINT) AS o1,
         CAST(sum(p_e6) AS BIGINT) AS e1_e6
  FROM binned GROUP BY 1, 2
), kept AS (
  SELECT event_type, nb, o1, e1_e6,
         CAST(floor(((o1 - e1_e6 / 1e6) ^ 2 / (e1_e6 / 1e6)
                     + ((nb - o1) - (nb - e1_e6 / 1e6)) ^ 2
                       / (nb - e1_e6 / 1e6)) * 1000000 + {_OFF})
              AS BIGINT) AS term_e6
  FROM g WHERE e1_e6 > 0 AND nb - e1_e6 / 1e6 > 0
)
SELECT event_type,
       CAST(sum(nb) AS BIGINT) AS n_test,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(o1) AS BIGINT) AS observed_pos,
       CAST(floor(CAST(sum(e1_e6) AS DOUBLE) / 1e6 + {_OFF}) AS BIGINT)
         AS expected_pos,
       CAST(sum(term_e6) AS BIGINT) AS hl_chi2_e6
FROM kept GROUP BY 1 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# spiegelhalter_z — exact-variance calibration Z (Spiegelhalter 1986):
# Z = sum (y-p)(1-2p) / sqrt(sum (1-2p)^2 p (1-p))
# ---------------------------------------------------------------------------
# Per-row numerator/variance terms e9-floored (|term| <= 1, n ~ 1e4
# per key at sf0.01 -> sums < 1e13, safely BIGINT), then exact sums.


def q_spiegelhalter_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _scored_test(spark, sf_dir)
    p = F.col("p_e6").cast("double") / 1e6
    num = (F.col("y").cast("double") - p) * (1.0 - 2.0 * p)
    var = F.pow(1.0 - 2.0 * p, 2) * p * (1.0 - p)
    t = t.filter((F.col("p_e6") > 0) & (F.col("p_e6") < 1_000_000)).select(
        "event_type",
        F.floor(num * 1e9 + F.lit(_OFF)).cast("long").alias("num_e9"),
        F.floor(var * 1e9 + F.lit(_OFF)).cast("long").alias("var_e9"),
    )
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("num_e9").alias("sn"),
        F.sum("var_e9").alias("sv"),
    )
    z = F.col("sn").cast("double") / F.sqrt(F.col("sv").cast("double") * 1e9)
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_scored"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        (F.abs(z) > 1.959964).cast("long").alias("miscalibrated"),
    ).orderBy("event_type")


SQL_SPIEGEL = f"""
WITH {_SQL_SCORED}, terms AS (
  SELECT event_type,
         CAST(floor((y - p_e6 / 1e6) * (1.0 - 2.0 * p_e6 / 1e6) * 1e9
                    + {_OFF}) AS BIGINT) AS num_e9,
         CAST(floor((1.0 - 2.0 * p_e6 / 1e6) ^ 2 * (p_e6 / 1e6)
                    * (1.0 - p_e6 / 1e6) * 1e9 + {_OFF}) AS BIGINT)
           AS var_e9
  FROM scored WHERE p_e6 > 0 AND p_e6 < 1000000
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(num_e9) AS BIGINT) AS sn,
         CAST(sum(var_e9) AS BIGINT) AS sv
  FROM terms GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_scored,
       CAST(floor(sn / sqrt(CAST(sv AS DOUBLE) * 1e9) * 10000 + {_OFF})
            AS BIGINT) AS z_e4,
       CAST(CASE WHEN abs(sn / sqrt(CAST(sv AS DOUBLE) * 1e9)) > 1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS miscalibrated
FROM g ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ece_audit — reliability-diagram summary: expected / maximum
# calibration error over 10 fixed-width bins (Naeini et al. 2015)
# ---------------------------------------------------------------------------
# ECE = sum_b (n_b / n) |ybar_b - pbar_b|; MCE = max_b |.|; both from
# exact integer bin sums.


def q_ece_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _scored_test(spark, sf_dir).withColumn(
        "b", F.least(F.floor(F.col("p_e6") / 100_000), F.lit(9)).cast("long")
    )
    g = t.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("y").alias("sy"),
        F.sum("p_e6").alias("sp_e6"),
    )
    gap = F.abs(
        F.col("sy").cast("double") / F.col("nb").cast("double")
        - F.col("sp_e6").cast("double") / 1e6 / F.col("nb").cast("double")
    )
    g = g.withColumn(
        "w_gap_e6",
        F.floor(gap * F.col("nb").cast("double") * 1_000_000 + F.lit(_OFF))
        .cast("long"),
    ).withColumn(
        "gap_e6", F.floor(gap * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    out = g.groupBy("event_type").agg(
        F.sum("nb").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum("w_gap_e6").alias("sw"),
        F.max("gap_e6").cast("long").alias("mce_e6"),
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n_scored"),
        "n_bins_used",
        F.floor(
            F.col("sw").cast("double") / F.col("n").cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("ece_e6"),
        "mce_e6",
    ).orderBy("event_type")


SQL_ECE = f"""
WITH {_SQL_SCORED}, binned AS (
  SELECT event_type,
         least(CAST(floor(p_e6 / 100000) AS BIGINT), 9) AS b,
         y, p_e6
  FROM scored
), g AS (
  SELECT event_type, b, count(*) AS nb,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(p_e6) AS BIGINT) AS sp_e6
  FROM binned GROUP BY 1, 2
), t AS (
  SELECT event_type, nb,
         CAST(floor(abs(CAST(sy AS DOUBLE) / nb
                        - CAST(sp_e6 AS DOUBLE) / 1e6 / nb)
                    * nb * 1000000 + {_OFF}) AS BIGINT) AS w_gap_e6,
         CAST(floor(abs(CAST(sy AS DOUBLE) / nb
                        - CAST(sp_e6 AS DOUBLE) / 1e6 / nb)
                    * 1000000 + {_OFF}) AS BIGINT) AS gap_e6
  FROM g
)
SELECT event_type,
       CAST(sum(nb) AS BIGINT) AS n_scored,
       CAST(count(*) AS BIGINT) AS n_bins_used,
       CAST(floor(CAST(sum(w_gap_e6) AS DOUBLE) / sum(nb) + {_OFF})
            AS BIGINT) AS ece_e6,
       CAST(max(gap_e6) AS BIGINT) AS mce_e6
FROM t GROUP BY 1 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# kish_deff — Kish (1965) design effect of unequal weights:
# deff = n sum(w^2) / (sum w)^2, n_eff = n / deff
# ---------------------------------------------------------------------------
# Weights = centi-value integers (strictly positive in this corpus),
# so both moments are exact BIGINTs; the survey-sampling complement to
# the autocorrelation ESS (stats10).


def q_kish_deff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("w"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
    )
    deff = (
        F.col("n").cast("double")
        * F.col("sww").cast("double")
        / F.pow(F.col("sw").cast("double"), 2)
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(deff * 10_000 + F.lit(_OFF)).cast("long").alias("deff_e4"),
        F.floor(F.col("n").cast("double") / deff + F.lit(_OFF))
        .cast("long")
        .alias("n_eff"),
        F.floor(
            (F.sqrt(
                F.col("n").cast("double")
                * F.col("sww").cast("double")
                / F.pow(F.col("sw").cast("double"), 2)
                - 1.0
            ))
            * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("cv_w_e4"),
    ).orderBy("event_type")


SQL_KISH = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS w
  FROM events
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(w) AS BIGINT) AS sw,
         CAST(sum(w * w) AS BIGINT) AS sww
  FROM ev GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(n AS DOUBLE) * sww / (CAST(sw AS DOUBLE) ^ 2)
                  * 10000 + {_OFF}) AS BIGINT) AS deff_e4,
       CAST(floor(CAST(n AS DOUBLE)
                  / (CAST(n AS DOUBLE) * sww / (CAST(sw AS DOUBLE) ^ 2))
                  + {_OFF}) AS BIGINT) AS n_eff,
       CAST(floor(sqrt(CAST(n AS DOUBLE) * sww / (CAST(sw AS DOUBLE) ^ 2)
                       - 1.0) * 10000 + {_OFF}) AS BIGINT) AS cv_w_e4
FROM g ORDER BY event_type
"""


QUERIES.update(
    {
        "hosmer_lemeshow": q_hosmer_lemeshow,
        "spiegelhalter_z": q_spiegelhalter_z,
        "ece_audit": q_ece_audit,
        "kish_deff": q_kish_deff,
    }
)

ORACLE_SQL.update(
    {
        "hosmer_lemeshow": SQL_HL,
        "spiegelhalter_z": SQL_SPIEGEL,
        "ece_audit": SQL_ECE,
        "kish_deff": SQL_KISH,
    }
)
