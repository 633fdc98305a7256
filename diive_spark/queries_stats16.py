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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# Forecast-evaluation scaffold: two competing in-engine forecasts on
# the test half (days 16-30) — f1 = per-(type, hour) train mean
# ("hourly model"), f2 = per-type train mean ("climatology") — with
# exact centi-integer errors.
# ---------------------------------------------------------------------------


def _forecast_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    train = ev.filter(F.col("dom") <= 15)
    f1 = train.groupBy("event_type", "hh").agg(
        F.floor(F.sum("v") / F.count(F.lit(1))).cast("long").alias("f1")
    )
    f2 = train.groupBy("event_type").agg(
        F.floor(F.sum("v") / F.count(F.lit(1))).cast("long").alias("f2")
    )
    t = (
        ev.filter(F.col("dom") > 15)
        .join(F.broadcast(f1), ["event_type", "hh"])
        .join(F.broadcast(f2), "event_type")
    )
    return t.select(
        "event_type",
        (F.col("v") - F.col("f1")).alias("e1"),
        (F.col("v") - F.col("f2")).alias("e2"),
        (F.col("f1") - F.col("f2")).alias("x"),
    )


_SQL_FCERR = f"""
  ev AS (
    SELECT event_type,
           EXTRACT(day FROM ts) AS dom,
           EXTRACT(hour FROM ts) AS hh,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
    FROM events
  ), f1 AS (
    SELECT event_type, hh,
           CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS f1
    FROM ev WHERE dom <= 15 GROUP BY 1, 2
  ), f2 AS (
    SELECT event_type,
           CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS f2
    FROM ev WHERE dom <= 15 GROUP BY 1
  ), errs AS (
    SELECT ev.event_type, v - f1.f1 AS e1, v - f2.f2 AS e2,
           f1.f1 - f2.f2 AS x
    FROM ev
    JOIN f1 ON f1.event_type = ev.event_type AND f1.hh = ev.hh
    JOIN f2 ON f2.event_type = ev.event_type
    WHERE dom > 15
  )
"""


# ---------------------------------------------------------------------------
# diebold_mariano — equal-predictive-accuracy test (Diebold & Mariano
# 1995), squared-error loss, 1-step variance
# ---------------------------------------------------------------------------
# Loss differential d = e1^2 - e2^2 is an EXACT integer per row; the
# statistic is computed on d/1e4 (centi^2 -> value^2 scale), whose
# per-row floor keeps sum(dk^2) inside BIGINT at any realistic SF.
# DM = dbar / sqrt(var(d)/n); negative favors the hourly model.


def q_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _forecast_errors(spark, sf_dir).select(
        "event_type",
        F.floor(
            (
                F.col("e1") * F.col("e1") - F.col("e2") * F.col("e2")
            ).cast("double")
            / 10_000.0
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("dk"),
    )
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dk").alias("sd"),
        F.sum(F.col("dk") * F.col("dk")).alias("sdd"),
    )
    nd = F.col("n").cast("double")
    dbar = F.col("sd").cast("double") / nd
    vard = (
        F.col("sdd").cast("double") - nd * dbar * dbar
    ) / (nd - 1.0)
    dm = dbar / F.sqrt(vard / nd)
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_test"),
        F.floor(dbar * 100 + F.lit(_OFF)).cast("long").alias("dbar_centi"),
        F.floor(dm * 10_000 + F.lit(_OFF)).cast("long").alias("dm_e4"),
        (dm < -1.959964).cast("long").alias("hourly_wins"),
    ).orderBy("event_type")


SQL_DM = f"""
WITH {_SQL_FCERR}, d AS (
  SELECT event_type,
         CAST(floor(CAST(e1 * e1 - e2 * e2 AS DOUBLE) / 10000.0 + {_OFF})
              AS BIGINT) AS dk
  FROM errs
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(dk) AS BIGINT) AS sd,
         CAST(sum(dk * dk) AS BIGINT) AS sdd
  FROM d GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_test,
       CAST(floor(CAST(sd AS DOUBLE) / n * 100 + {_OFF}) AS BIGINT)
         AS dbar_centi,
       CAST(floor(CAST(sd AS DOUBLE) / n
                  / sqrt(((sdd - CAST(sd AS DOUBLE) * sd / n) / (n - 1.0))
                         / n) * 10000 + {_OFF}) AS BIGINT) AS dm_e4,
       CAST(CASE WHEN CAST(sd AS DOUBLE) / n
                      / sqrt(((sdd - CAST(sd AS DOUBLE) * sd / n)
                              / (n - 1.0)) / n) < -1.959964
                 THEN 1 ELSE 0 END AS BIGINT) AS hourly_wins
FROM g ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# forecast_encompassing — does the hourly model encompass climatology?
# (Harvey-Leybourne-Newbold 1998 regression form): e1 on (f1 - f2)
# ---------------------------------------------------------------------------
# lambda = sum(e1 x)/sum(x^2) with x = f1 - f2; t-stat from the OLS
# through-origin SE.  All moments exact BIGINT.  lambda near 0 =>
# climatology adds nothing.


def q_forecast_encompassing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _forecast_errors(spark, sf_dir)
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("e1") * F.col("x")).alias("sex"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("e1") * F.col("e1")).alias("see"),
    )
    lam = F.col("sex").cast("double") / F.col("sxx").cast("double")
    sse = F.col("see").cast("double") - lam * F.col("sex").cast("double")
    se = F.sqrt(
        sse / (F.col("n").cast("double") - 1.0)
        / F.col("sxx").cast("double")
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_test"),
        F.floor(lam * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "lambda_e6"
        ),
        F.floor(lam / se * 10_000 + F.lit(_OFF)).cast("long").alias(
            "t_e4"
        ),
        (F.abs(lam / se) > 1.959964).cast("long").alias(
            "climatology_adds_info"
        ),
    ).orderBy("event_type")


SQL_ENC = f"""
WITH {_SQL_FCERR}, g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(e1 * x) AS BIGINT) AS sex,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(e1 * e1) AS BIGINT) AS see
  FROM errs GROUP BY 1
), f AS (
  SELECT event_type, n,
         CAST(sex AS DOUBLE) / sxx AS lam,
         sqrt((see - CAST(sex AS DOUBLE) / sxx * sex) / (n - 1.0) / sxx)
           AS se
  FROM g
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_test,
       CAST(floor(lam * 1000000 + {_OFF}) AS BIGINT) AS lambda_e6,
       CAST(floor(lam / se * 10000 + {_OFF}) AS BIGINT) AS t_e4,
       CAST(CASE WHEN abs(lam / se) > 1.959964 THEN 1 ELSE 0 END AS BIGINT)
         AS climatology_adds_info
FROM f ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# bates_granger_combo — optimal linear forecast combination (Bates &
# Granger 1969): weight on climatology and the combined MSE
# ---------------------------------------------------------------------------
# w* = (s11 - s12) / (s11 + s22 - 2 s12); MSE_c = s11 - (s11-s12)^2 /
# (s11 + s22 - 2 s12).  Error moments are exact BIGINTs.


def q_bates_granger_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _forecast_errors(spark, sf_dir)
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("e1") * F.col("e1")).alias("s11"),
        F.sum(F.col("e2") * F.col("e2")).alias("s22"),
        F.sum(F.col("e1") * F.col("e2")).alias("s12"),
    )
    nd = F.col("n").cast("double")
    s11 = F.col("s11").cast("double") / nd
    s22 = F.col("s22").cast("double") / nd
    s12 = F.col("s12").cast("double") / nd
    den = s11 + s22 - 2.0 * s12
    w = (s11 - s12) / den
    msec = s11 - F.pow(s11 - s12, 2) / den
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_test"),
        F.floor(w * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "w_climatology_e6"
        ),
        F.floor(s11 / 10_000.0 + F.lit(_OFF)).cast("long").alias("mse_hourly"),
        F.floor(s22 / 10_000.0 + F.lit(_OFF)).cast("long").alias(
            "mse_climatology"
        ),
        F.floor(msec / 10_000.0 + F.lit(_OFF)).cast("long").alias(
            "mse_combined"
        ),
    ).orderBy("event_type")


SQL_BG = f"""
WITH {_SQL_FCERR}, g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(e1 * e1) AS BIGINT) AS s11,
         CAST(sum(e2 * e2) AS BIGINT) AS s22,
         CAST(sum(e1 * e2) AS BIGINT) AS s12
  FROM errs GROUP BY 1
), m AS (
  SELECT event_type, n,
         CAST(s11 AS DOUBLE) / n AS m11,
         CAST(s22 AS DOUBLE) / n AS m22,
         CAST(s12 AS DOUBLE) / n AS m12
  FROM g
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_test,
       CAST(floor((m11 - m12) / (m11 + m22 - 2.0 * m12) * 1000000 + {_OFF})
            AS BIGINT) AS w_climatology_e6,
       CAST(floor(m11 / 10000.0 + {_OFF}) AS BIGINT) AS mse_hourly,
       CAST(floor(m22 / 10000.0 + {_OFF}) AS BIGINT) AS mse_climatology,
       CAST(floor((m11 - (m11 - m12) ^ 2 / (m11 + m22 - 2.0 * m12))
                  / 10000.0 + {_OFF}) AS BIGINT) AS mse_combined
FROM m ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# pesaran_timmermann — directional forecast accuracy test (Pesaran &
# Timmermann 1992) on the test-half daily-mean series
# ---------------------------------------------------------------------------
# Actual direction: day-over-day daily-mean change, compared EXACTLY
# by integer cross-multiplication (s_t * n_{t-1} > s_{t-1} * n_t).
# Forecast direction: the train-half day-of-week mean profile applied
# to the same day pairs, compared the same exact way.  PT statistic
# from the 1992 closed form with independence variance.


def q_pesaran_timmermann(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.dayofweek("ts").alias("dow"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    dowp = ev.filter(F.col("dom") <= 15).groupBy("event_type", "dow").agg(
        F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pn")
    )
    daily = (
        ev.filter(F.col("dom") > 15)
        .groupBy("event_type", "dom", "dow")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(dowp), ["event_type", "dow"])
    )
    w = Window.partitionBy("event_type").orderBy("dom")
    d = (
        daily.withColumn("ls", F.lag("s").over(w))
        .withColumn("ln", F.lag("n").over(w))
        .withColumn("lps", F.lag("ps").over(w))
        .withColumn("lpn", F.lag("pn").over(w))
        .filter(F.col("ls").isNotNull())
    )
    x = (F.col("s") * F.col("ln") > F.col("ls") * F.col("n")).cast("long")
    y = (F.col("ps") * F.col("lpn") > F.col("lps") * F.col("pn")).cast(
        "long"
    )
    d = d.select("event_type", x.alias("x"), y.alias("y"))
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(
            (F.col("x") == F.col("y")).cast("long")
        ).alias("hits"),
    )
    nd = F.col("n").cast("double")
    px = F.col("sx").cast("double") / nd
    py = F.col("sy").cast("double") / nd
    phat = F.col("hits").cast("double") / nd
    pstar = px * py + (1.0 - px) * (1.0 - py)
    vhat = pstar * (1.0 - pstar) / nd
    vstar = (
        F.pow(2.0 * py - 1.0, 2) * px * (1.0 - px) / nd
        + F.pow(2.0 * px - 1.0, 2) * py * (1.0 - py) / nd
        + 4.0 * px * py * (1.0 - px) * (1.0 - py) / (nd * nd)
    )
    pt = (phat - pstar) / F.sqrt(vhat - vstar)
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        F.col("hits").cast("long").alias("n_hits"),
        F.floor(pstar * 10_000 + F.lit(_OFF)).cast("long").alias(
            "pstar_e4"
        ),
        F.floor(pt * 10_000 + F.lit(_OFF)).cast("long").alias("pt_e4"),
    ).orderBy("event_type")


SQL_PT = f"""
WITH ev AS (
  SELECT event_type,
         EXTRACT(day FROM ts) AS dom,
         dayofweek(ts) AS dow,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dowp AS (
  SELECT event_type, dow,
         CAST(sum(v) AS BIGINT) AS ps, count(*) AS pn
  FROM ev WHERE dom <= 15 GROUP BY 1, 2
), daily AS (
  SELECT ev.event_type, dom, ev.dow,
         CAST(sum(v) AS BIGINT) AS s, count(*) AS n,
         any_value(ps) AS ps, any_value(pn) AS pn
  FROM ev JOIN dowp ON dowp.event_type = ev.event_type
                   AND dowp.dow = ev.dow
  WHERE dom > 15 GROUP BY 1, 2, 3
), lagged AS (
  SELECT event_type, s, n, ps, pn,
         lag(s) OVER w AS ls, lag(n) OVER w AS ln,
         lag(ps) OVER w AS lps, lag(pn) OVER w AS lpn
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY dom)
), d AS (
  SELECT event_type,
         CASE WHEN s * ln > ls * n THEN 1 ELSE 0 END AS x,
         CASE WHEN ps * lpn > lps * pn THEN 1 ELSE 0 END AS y
  FROM lagged WHERE ls IS NOT NULL
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CASE WHEN x = y THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM d GROUP BY 1
), f AS (
  SELECT event_type, n, hits,
         CAST(sx AS DOUBLE) / n AS px,
         CAST(sy AS DOUBLE) / n AS py,
         CAST(hits AS DOUBLE) / n AS phat
  FROM g
), f2 AS (
  SELECT event_type, n, hits, px, py, phat,
         px * py + (1.0 - px) * (1.0 - py) AS pstar,
         (px * py + (1.0 - px) * (1.0 - py))
           * (1.0 - px * py - (1.0 - px) * (1.0 - py)) / n AS vhat,
         (2.0 * py - 1.0) ^ 2 * px * (1.0 - px) / n
           + (2.0 * px - 1.0) ^ 2 * py * (1.0 - py) / n
           + 4.0 * px * py * (1.0 - px) * (1.0 - py)
             / (CAST(n AS DOUBLE) * n) AS vstar
  FROM f
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_pairs,
       hits AS n_hits,
       CAST(floor(pstar * 10000 + {_OFF}) AS BIGINT) AS pstar_e4,
       CAST(floor((phat - pstar) / sqrt(vhat - vstar) * 10000 + {_OFF})
            AS BIGINT) AS pt_e4
FROM f2 ORDER BY event_type
"""


QUERIES.update(
    {
        "diebold_mariano": q_diebold_mariano,
        "pesaran_timmermann": q_pesaran_timmermann,
        "forecast_encompassing": q_forecast_encompassing,
        "bates_granger_combo": q_bates_granger_combo,
    }
)

ORACLE_SQL.update(
    {
        "diebold_mariano": SQL_DM,
        "pesaran_timmermann": SQL_PT,
        "forecast_encompassing": SQL_ENC,
        "bates_granger_combo": SQL_BG,
    }
)


# ---------------------------------------------------------------------------
# kulldorff_hour_scan — Kulldorff (1997) Poisson scan statistic over
# circular hour-of-day windows (width 1..12): which window of the day
# over-represents each event type vs the all-types baseline?
# ---------------------------------------------------------------------------
# Candidate windows are enumerated as a tiny (24 x 12) dimension and
# broadcast; counts are exact integers, the high-side condition c/E>1
# is the exact integer cross-product c*B > C*b, and ties break by
# (llr desc, width asc, start asc) through an integer rank.


def q_kulldorff_hour_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.hour("ts").alias("hh")
    )
    hc = ev.groupBy("event_type", "hh").agg(
        F.count(F.lit(1)).alias("c_th")
    )
    tot_h = ev.groupBy("hh").agg(F.count(F.lit(1)).alias("n_h"))
    wins = (
        spark.range(24)
        .select(F.col("id").cast("int").alias("start"))
        .crossJoin(
            spark.range(1, 13).select(F.col("id").cast("int").alias("width"))
        )
    )
    memb = F.pmod(F.col("hh") - F.col("start") + 24, F.lit(24)) < F.col(
        "width"
    )
    cases = (
        hc.crossJoin(F.broadcast(wins))
        .filter(memb)
        .groupBy("event_type", "start", "width")
        .agg(F.sum("c_th").alias("c"))
    )
    base = (
        tot_h.crossJoin(F.broadcast(wins))
        .filter(memb)
        .groupBy("start", "width")
        .agg(F.sum("n_h").alias("b"))
    )
    totals = hc.groupBy("event_type").agg(F.sum("c_th").alias("ctot"))
    big = ev.groupBy().agg(F.count(F.lit(1)).alias("btot"))
    t = (
        cases.join(F.broadcast(base), ["start", "width"])
        .join(F.broadcast(totals), "event_type")
        .crossJoin(F.broadcast(big))
    )
    c = F.col("c").cast("double")
    ctot = F.col("ctot").cast("double")
    e = ctot * F.col("b").cast("double") / F.col("btot").cast("double")
    high = F.col("c") * F.col("btot") > F.col("ctot") * F.col("b")
    llr = F.when(
        high,
        c * F.log(c / e)
        + F.when(
            F.col("c") < F.col("ctot"),
            (ctot - c) * F.log((ctot - c) / (ctot - e)),
        ).otherwise(F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    t = t.withColumn(
        "llr_e6", F.floor(llr * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("llr_e6").desc(), F.col("width").asc(), F.col("start").asc()
    )
    return (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("start").cast("long").alias("win_start_hh"),
            F.col("width").cast("long").alias("win_width_h"),
            F.col("c").cast("long").alias("cases_in_win"),
            F.floor(e + F.lit(_OFF)).cast("long").alias("expected_in_win"),
            F.col("llr_e6").alias("llr_e6"),
        )
        .orderBy("event_type")
    )


SQL_KULLDORFF = f"""
WITH ev AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hh FROM events
), hc AS (
  SELECT event_type, hh, count(*) AS c_th FROM ev GROUP BY 1, 2
), tot_h AS (
  SELECT hh, count(*) AS n_h FROM ev GROUP BY 1
), wins AS (
  SELECT s.s AS start, w.w AS width
  FROM generate_series(0, 23) AS s(s), generate_series(1, 12) AS w(w)
), cases AS (
  SELECT event_type, start, width, CAST(sum(c_th) AS BIGINT) AS c
  FROM hc, wins
  WHERE ((hh - start + 24) % 24) < width
  GROUP BY 1, 2, 3
), base AS (
  SELECT start, width, CAST(sum(n_h) AS BIGINT) AS b
  FROM tot_h, wins
  WHERE ((hh - start + 24) % 24) < width
  GROUP BY 1, 2
), totals AS (
  SELECT event_type, CAST(sum(c_th) AS BIGINT) AS ctot FROM hc GROUP BY 1
), big AS (
  SELECT count(*) AS btot FROM ev
), t AS (
  SELECT cases.event_type, cases.start, cases.width, c, b, ctot, btot,
         CAST(ctot AS DOUBLE) * b / btot AS e
  FROM cases
  JOIN base USING (start, width)
  JOIN totals ON totals.event_type = cases.event_type
  CROSS JOIN big
), scored AS (
  SELECT event_type, start, width, c, e,
         CAST(floor(CASE WHEN c * btot > ctot * b THEN
                 c * ln(CAST(c AS DOUBLE) / e)
                 + CASE WHEN c < ctot
                        THEN (ctot - c) * ln((ctot - c) / (ctot - e))
                        ELSE 0.0 END
               ELSE 0.0 END * 1000000 + {_OFF}) AS BIGINT) AS llr_e6
  FROM t
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY llr_e6 DESC, width ASC, start ASC) AS rn
  FROM scored
)
SELECT event_type,
       CAST(start AS BIGINT) AS win_start_hh,
       CAST(width AS BIGINT) AS win_width_h,
       c AS cases_in_win,
       CAST(floor(e + {_OFF}) AS BIGINT) AS expected_in_win,
       llr_e6
FROM ranked WHERE rn = 1 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# sokolove_bushell — chi-square periodogram (Sokolove & Bushell 1978):
# Qp over candidate periods 12..36 h on the hourly-count series
# ---------------------------------------------------------------------------
# Qp = N * sum_h K_h (M_h - Mbar)^2 / sum_i (x_i - Mbar)^2 with phase
# h = t mod p.  Per-phase and per-row squared terms are e6-floored
# before exact summation; the winner is Qp normalized by df = p - 1.


def q_sokolove_bushell(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.dayofmonth("ts").cast("long") * 24
            + F.hour("ts").cast("long")
        ).alias("t"),
    )
    x = ev.groupBy("event_type", "t").agg(F.count(F.lit(1)).alias("x"))
    g = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    xg = x.join(F.broadcast(g), "event_type")
    mbar = F.col("s").cast("double") / F.col("n").cast("double")
    den = xg.select(
        "event_type",
        F.floor(F.pow(F.col("x").cast("double") - mbar, 2) * 1_000_000
                + F.lit(_OFF)).cast("long").alias("d_e6"),
    ).groupBy("event_type").agg(F.sum("d_e6").alias("den_e6"))
    periods = spark.range(12, 37).select(
        F.col("id").cast("int").alias("p")
    )
    ph = (
        x.crossJoin(F.broadcast(periods))
        .withColumn("h", F.pmod(F.col("t"), F.col("p")))
        .groupBy("event_type", "p", "h")
        .agg(F.count(F.lit(1)).alias("k"), F.sum("x").alias("sh"))
        .join(F.broadcast(g), "event_type")
    )
    term = (
        F.col("k").cast("double")
        * F.pow(
            F.col("sh").cast("double") / F.col("k").cast("double")
            - F.col("s").cast("double") / F.col("n").cast("double"),
            2,
        )
    )
    num = ph.select(
        "event_type",
        "p",
        F.floor(term * 1_000_000 + F.lit(_OFF)).cast("long").alias("t_e6"),
    ).groupBy("event_type", "p").agg(F.sum("t_e6").alias("num_e6"))
    q = (
        num.join(F.broadcast(den), "event_type")
        .join(F.broadcast(g), "event_type")
        .withColumn(
            "qp_e4",
            F.floor(
                F.col("n").cast("double")
                * F.col("num_e6").cast("double")
                / F.col("den_e6").cast("double")
                * 10_000
                + F.lit(_OFF)
            ).cast("long"),
        )
        .withColumn(
            "qpn_e4",
            F.floor(
                F.col("n").cast("double")
                * F.col("num_e6").cast("double")
                / F.col("den_e6").cast("double")
                / (F.col("p").cast("double") - 1.0)
                * 10_000
                + F.lit(_OFF)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("qpn_e4").desc(), F.col("p").asc()
    )
    return (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("p").cast("long").alias("best_period_h"),
            "qp_e4",
            "qpn_e4",
        )
        .orderBy("event_type")
    )


SQL_SB = f"""
WITH ev AS (
  SELECT event_type,
         EXTRACT(day FROM ts) * 24 + EXTRACT(hour FROM ts) AS t
  FROM events
), x AS (
  SELECT event_type, t, count(*) AS x FROM ev GROUP BY 1, 2
), g AS (
  SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
  FROM x GROUP BY 1
), den AS (
  SELECT x.event_type,
         CAST(sum(CAST(floor((x - CAST(s AS DOUBLE) / n) ^ 2 * 1000000
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS den_e6
  FROM x JOIN g ON g.event_type = x.event_type
  GROUP BY 1
), ph AS (
  SELECT x.event_type, p.p AS p, x.t % p.p AS h,
         count(*) AS k, CAST(sum(x) AS BIGINT) AS sh
  FROM x, generate_series(12, 36) AS p(p)
  GROUP BY 1, 2, 3
), num AS (
  SELECT ph.event_type, p,
         CAST(sum(CAST(floor(k * (CAST(sh AS DOUBLE) / k
                                  - CAST(s AS DOUBLE) / n) ^ 2 * 1000000
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS num_e6
  FROM ph JOIN g ON g.event_type = ph.event_type
  GROUP BY 1, 2
), q AS (
  SELECT num.event_type, p,
         CAST(floor(n * CAST(num_e6 AS DOUBLE) / den_e6 * 10000 + {_OFF})
              AS BIGINT) AS qp_e4,
         CAST(floor(n * CAST(num_e6 AS DOUBLE) / den_e6 / (p - 1.0)
                    * 10000 + {_OFF}) AS BIGINT) AS qpn_e4
  FROM num
  JOIN den ON den.event_type = num.event_type
  JOIN g ON g.event_type = num.event_type
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY qpn_e4 DESC, p ASC) AS rn
  FROM q
)
SELECT event_type,
       CAST(p AS BIGINT) AS best_period_h,
       qp_e4, qpn_e4
FROM ranked WHERE rn = 1 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# foster_stuart — records-based trend test (Foster & Stuart 1954) on
# the daily-max series: D = upper - lower records, S = both
# ---------------------------------------------------------------------------
# Records via cumulative max/min windows on exact daily-max integers;
# Var(D) = 2 * sum_{t=2..n} 1/t (independence null), z = D/sqrt(var).


def q_foster_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    daily = ev.groupBy("event_type", "dom").agg(F.max("v").alias("mx"))
    w = Window.partitionBy("event_type").orderBy("dom")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    d = (
        daily.withColumn("pmax", F.max("mx").over(prior))
        .withColumn("pmin", F.min("mx").over(prior))
        .withColumn("t", F.row_number().over(w))
        .filter(F.col("t") >= 2)
        .withColumn("u", (F.col("mx") > F.col("pmax")).cast("long"))
        .withColumn("l", (F.col("mx") < F.col("pmin")).cast("long"))
    )
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("npairs"),
        F.sum(F.col("u") - F.col("l")).alias("dstat"),
        F.sum(F.col("u") + F.col("l")).alias("sstat"),
        F.sum(2.0 / F.col("t").cast("double")).alias("vard"),
    )
    z = F.col("dstat").cast("double") / F.sqrt(F.col("vard"))
    return g.select(
        "event_type",
        (F.col("npairs") + 1).cast("long").alias("n_days"),
        F.col("dstat").cast("long").alias("d_stat"),
        F.col("sstat").cast("long").alias("s_stat"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


SQL_FS = f"""
WITH ev AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), daily AS (
  SELECT event_type, dom, max(v) AS mx FROM ev GROUP BY 1, 2
), d AS (
  SELECT event_type, mx,
         max(mx) OVER w AS pmax,
         min(mx) OVER w AS pmin,
         row_number() OVER (PARTITION BY event_type ORDER BY dom) AS t
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY dom
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), r AS (
  SELECT event_type, t,
         CASE WHEN mx > pmax THEN 1 ELSE 0 END AS u,
         CASE WHEN mx < pmin THEN 1 ELSE 0 END AS l
  FROM d WHERE t >= 2
), g AS (
  SELECT event_type, count(*) AS npairs,
         CAST(sum(u - l) AS BIGINT) AS dstat,
         CAST(sum(u + l) AS BIGINT) AS sstat,
         sum(2.0 / t) AS vard
  FROM r GROUP BY 1
)
SELECT event_type,
       CAST(npairs + 1 AS BIGINT) AS n_days,
       dstat AS d_stat,
       sstat AS s_stat,
       CAST(floor(dstat / sqrt(vard) * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM g ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# mantel_corr — Mantel (1967) correlation between two inter-type
# distance matrices: hourly-profile L1 distance vs |mean-value gap|
# ---------------------------------------------------------------------------
# Upper-triangle pairs only (10 pairs over 5 types); both distances
# are e6 integers from exact count/sum arithmetic, the Pearson r over
# pairs from exact integer moments.


def q_mantel_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    prof = ev.groupBy("event_type", "hh").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    p = prof.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hh",
        F.floor(
            F.col("c").cast("double") / F.col("n").cast("double") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("share_e6"),
    )
    a = p.alias("a")
    b = p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.hh") == F.col("b.hh"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).groupBy(
        F.col("a.event_type").alias("t1"),
        F.col("b.event_type").alias("t2"),
    ).agg(
        F.sum(F.abs(F.col("a.share_e6") - F.col("b.share_e6"))).alias(
            "d1_e6"
        )
    )
    ta = tot.alias("ta")
    tb = tot.alias("tb")
    mg = ta.join(
        tb, F.col("ta.event_type") < F.col("tb.event_type")
    ).select(
        F.col("ta.event_type").alias("t1"),
        F.col("tb.event_type").alias("t2"),
        F.floor(
            F.abs(
                F.col("ta.s").cast("double") / F.col("ta.n").cast("double")
                - F.col("tb.s").cast("double") / F.col("tb.n").cast("double")
            )
            * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("d2_e4"),
    )
    t = pairs.join(mg, ["t1", "t2"])
    g = t.groupBy().agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("d1_e6").alias("s1"),
        F.sum("d2_e4").alias("s2"),
        F.sum(F.col("d1_e6") * F.col("d1_e6")).alias("s11"),
        F.sum(F.col("d2_e4") * F.col("d2_e4")).alias("s22"),
        F.sum(F.col("d1_e6") * F.col("d2_e4")).alias("s12"),
    )
    md = F.col("m").cast("double")
    cov = F.col("s12").cast("double") - F.col("s1").cast("double") * F.col(
        "s2"
    ).cast("double") / md
    v1 = F.col("s11").cast("double") - F.pow(
        F.col("s1").cast("double"), 2
    ) / md
    v2 = F.col("s22").cast("double") - F.pow(
        F.col("s2").cast("double"), 2
    ) / md
    r = cov / F.sqrt(v1 * v2)
    return g.select(
        F.col("m").cast("long").alias("n_pairs"),
        F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "mantel_r_e6"
        ),
    )


SQL_MANTEL = f"""
WITH ev AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hh,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), prof AS (
  SELECT event_type, hh, count(*) AS c FROM ev GROUP BY 1, 2
), tot AS (
  SELECT event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS s
  FROM ev GROUP BY 1
), p AS (
  SELECT prof.event_type, hh,
         CAST(floor(CAST(c AS DOUBLE) / n * 1000000 + {_OFF}) AS BIGINT)
           AS share_e6
  FROM prof JOIN tot ON tot.event_type = prof.event_type
), pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2,
         CAST(sum(abs(a.share_e6 - b.share_e6)) AS BIGINT) AS d1_e6
  FROM p a JOIN p b ON a.hh = b.hh AND a.event_type < b.event_type
  GROUP BY 1, 2
), mg AS (
  SELECT ta.event_type AS t1, tb.event_type AS t2,
         CAST(floor(abs(CAST(ta.s AS DOUBLE) / ta.n
                        - CAST(tb.s AS DOUBLE) / tb.n) * 100 + {_OFF})
              AS BIGINT) AS d2_e4
  FROM tot ta JOIN tot tb ON ta.event_type < tb.event_type
), t AS (
  SELECT pairs.t1, pairs.t2, d1_e6, d2_e4
  FROM pairs JOIN mg ON mg.t1 = pairs.t1 AND mg.t2 = pairs.t2
), g AS (
  SELECT count(*) AS m,
         CAST(sum(d1_e6) AS BIGINT) AS s1,
         CAST(sum(d2_e4) AS BIGINT) AS s2,
         CAST(sum(d1_e6 * d1_e6) AS BIGINT) AS s11,
         CAST(sum(d2_e4 * d2_e4) AS BIGINT) AS s22,
         CAST(sum(d1_e6 * d2_e4) AS BIGINT) AS s12
  FROM t
)
SELECT CAST(m AS BIGINT) AS n_pairs,
       CAST(floor((s12 - CAST(s1 AS DOUBLE) * s2 / m)
                  / sqrt((s11 - CAST(s1 AS DOUBLE) ^ 2 / m)
                         * (s22 - CAST(s2 AS DOUBLE) ^ 2 / m))
                  * 1000000 + {_OFF}) AS BIGINT) AS mantel_r_e6
FROM g
"""


QUERIES.update(
    {
        "kulldorff_hour_scan": q_kulldorff_hour_scan,
        "sokolove_bushell": q_sokolove_bushell,
        "foster_stuart": q_foster_stuart,
        "mantel_corr": q_mantel_corr,
    }
)

ORACLE_SQL.update(
    {
        "kulldorff_hour_scan": SQL_KULLDORFF,
        "sokolove_bushell": SQL_SB,
        "foster_stuart": SQL_FS,
        "mantel_corr": SQL_MANTEL,
    }
)


# ---------------------------------------------------------------------------
# mardia_kurtosis — Mardia (1970) multivariate kurtosis b2 of the
# (value, hour) pair per event type, with the asymptotic z
# ---------------------------------------------------------------------------
# 2x2 covariance inverted in closed form; the per-row Mahalanobis
# quadratic q is squared, e6-floored, and exactly summed.  z =
# (b2 - d(d+2)) / sqrt(8 d (d+2) / n), d = 2.


def q_mardia_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("x"),
        F.hour("ts").cast("long").alias("y"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    t = ev.join(F.broadcast(g), "event_type")
    nd = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / nd
    my = F.col("sy").cast("double") / nd
    c11 = (F.col("sxx").cast("double") - nd * mx * mx) / nd
    c22 = (F.col("syy").cast("double") - nd * my * my) / nd
    c12 = (F.col("sxy").cast("double") - nd * mx * my) / nd
    det = c11 * c22 - c12 * c12
    dx = F.col("x").cast("double") - mx
    dy = F.col("y").cast("double") - my
    q = (c22 * dx * dx - 2.0 * c12 * dx * dy + c11 * dy * dy) / det
    t = t.select(
        "event_type",
        F.floor(q * q * 1_000_000 + F.lit(_OFF)).cast("long").alias("qq_e6"),
    )
    out = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("qq_e6").alias("sq")
    )
    b2 = F.col("sq").cast("double") / 1e6 / F.col("n").cast("double")
    z = (b2 - 8.0) / F.sqrt(64.0 / F.col("n").cast("double"))
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(b2 * 10_000 + F.lit(_OFF)).cast("long").alias("b2_e4"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


SQL_MARDIA = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS x,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y
  FROM events
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM ev GROUP BY 1
), c AS (
  SELECT event_type, n,
         CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my,
         (sxx - CAST(sx AS DOUBLE) * sx / n) / n AS c11,
         (syy - CAST(sy AS DOUBLE) * sy / n) / n AS c22,
         (sxy - CAST(sx AS DOUBLE) * sy / n) / n AS c12
  FROM g
), t AS (
  SELECT ev.event_type,
         CAST(floor(((c22 * (x - mx) ^ 2 - 2.0 * c12 * (x - mx) * (y - my)
                      + c11 * (y - my) ^ 2)
                     / (c11 * c22 - c12 * c12)) ^ 2 * 1000000 + {_OFF})
              AS BIGINT) AS qq_e6
  FROM ev JOIN c ON c.event_type = ev.event_type
), o AS (
  SELECT event_type, count(*) AS n, CAST(sum(qq_e6) AS BIGINT) AS sq
  FROM t GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(sq AS DOUBLE) / 1e6 / n * 10000 + {_OFF}) AS BIGINT)
         AS b2_e4,
       CAST(floor((CAST(sq AS DOUBLE) / 1e6 / n - 8.0) / sqrt(64.0 / n)
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM o ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# box_m — Box (1949) M test for homogeneity of the (value, hour)
# covariance matrices across event types
# ---------------------------------------------------------------------------
# Per-type central-SS matrices are e4-floored integers so the pooled
# matrix is an exact sum; 2x2 log-determinants in closed form; the
# chi-square approximation uses Box's small-sample scaling.


def q_box_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("x"),
        F.hour("ts").cast("long").alias("y"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    a11 = F.col("sxx").cast("double") - F.pow(F.col("sx").cast("double"), 2) / nd
    a22 = F.col("syy").cast("double") - F.pow(F.col("sy").cast("double"), 2) / nd
    a12 = (
        F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double") / nd
    )
    dfi = nd - 1.0
    lndet_i = F.log(
        (a11 / dfi) * (a22 / dfi) - F.pow(a12 / dfi, 2)
    )
    per = g.select(
        "event_type",
        F.col("n"),
        F.floor(a11 * 10_000 + F.lit(_OFF)).cast("long").alias("a11_e4"),
        F.floor(a22 * 10_000 + F.lit(_OFF)).cast("long").alias("a22_e4"),
        F.floor(a12 * 10_000 + F.lit(_OFF)).cast("long").alias("a12_e4"),
        F.floor(dfi * lndet_i * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("wld_e6"),
        F.floor(1.0 / dfi * 1e12 + F.lit(_OFF)).cast("long").alias(
            "invdf_e12"
        ),
    )
    agg = per.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("bign"),
        F.sum("a11_e4").alias("p11"),
        F.sum("a22_e4").alias("p22"),
        F.sum("a12_e4").alias("p12"),
        F.sum("wld_e6").alias("swld"),
        F.sum("invdf_e12").alias("sinv"),
    )
    kd = F.col("k").cast("double")
    nk = (F.col("bign") - F.col("k")).cast("double")
    sp11 = F.col("p11").cast("double") / 1e4 / nk
    sp22 = F.col("p22").cast("double") / 1e4 / nk
    sp12 = F.col("p12").cast("double") / 1e4 / nk
    lndet_p = F.log(sp11 * sp22 - sp12 * sp12)
    m = nk * lndet_p - F.col("swld").cast("double") / 1e6
    cfac = (F.col("sinv").cast("double") / 1e12 - 1.0 / nk) * (
        (2.0 * 4.0 + 3.0 * 2.0 - 1.0) / (6.0 * 3.0 * (kd - 1.0))
    )
    chi2 = m * (1.0 - cfac)
    df = (kd - 1.0) * 3.0
    return agg.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("bign").cast("long").alias("n_total"),
        F.floor(m * 10_000 + F.lit(_OFF)).cast("long").alias("box_m_e4"),
        F.floor(chi2 * 10_000 + F.lit(_OFF)).cast("long").alias("chi2_e4"),
        df.cast("long").alias("df"),
    )


SQL_BOXM = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS x,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y
  FROM events
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM ev GROUP BY 1
), per AS (
  SELECT event_type, n,
         CAST(floor((sxx - CAST(sx AS DOUBLE) ^ 2 / n) * 10000 + {_OFF})
              AS BIGINT) AS a11_e4,
         CAST(floor((syy - CAST(sy AS DOUBLE) ^ 2 / n) * 10000 + {_OFF})
              AS BIGINT) AS a22_e4,
         CAST(floor((sxy - CAST(sx AS DOUBLE) * sy / n) * 10000 + {_OFF})
              AS BIGINT) AS a12_e4,
         CAST(floor((n - 1.0) * ln(
             ((sxx - CAST(sx AS DOUBLE) ^ 2 / n) / (n - 1.0))
             * ((syy - CAST(sy AS DOUBLE) ^ 2 / n) / (n - 1.0))
             - ((sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1.0)) ^ 2)
             * 1000000 + {_OFF}) AS BIGINT) AS wld_e6,
         CAST(floor(1.0 / (n - 1.0) * 1e12 + {_OFF}) AS BIGINT)
           AS invdf_e12
  FROM g
), agg AS (
  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS bign,
         CAST(sum(a11_e4) AS BIGINT) AS p11,
         CAST(sum(a22_e4) AS BIGINT) AS p22,
         CAST(sum(a12_e4) AS BIGINT) AS p12,
         CAST(sum(wld_e6) AS BIGINT) AS swld,
         CAST(sum(invdf_e12) AS BIGINT) AS sinv
  FROM per
), f AS (
  SELECT k, bign,
         (bign - k) * ln(
             (CAST(p11 AS DOUBLE) / 1e4 / (bign - k))
             * (CAST(p22 AS DOUBLE) / 1e4 / (bign - k))
             - (CAST(p12 AS DOUBLE) / 1e4 / (bign - k)) ^ 2)
           - CAST(swld AS DOUBLE) / 1e6 AS m,
         (CAST(sinv AS DOUBLE) / 1e12 - 1.0 / (bign - k))
           * ((2.0 * 4.0 + 3.0 * 2.0 - 1.0) / (6.0 * 3.0 * (k - 1.0)))
           AS cfac
  FROM agg
)
SELECT CAST(k AS BIGINT) AS n_groups,
       bign AS n_total,
       CAST(floor(m * 10000 + {_OFF}) AS BIGINT) AS box_m_e4,
       CAST(floor(m * (1.0 - cfac) * 10000 + {_OFF}) AS BIGINT) AS chi2_e4,
       CAST((k - 1.0) * 3.0 AS BIGINT) AS df
FROM f
"""


# ---------------------------------------------------------------------------
# hamed_rao_mk — Mann-Kendall trend with the Hamed-Rao (1998)
# autocorrelation variance correction (lags 1-3 on rank series)
# ---------------------------------------------------------------------------
# Daily e4-mean integers make every comparison exact; S from the
# triangular self-join; min-ranks feed lag-1..3 autocorrelations
# (per-term e6 floors); tie-corrected base variance inflated by n/n*.


def q_hamed_rao_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    daily = ev.groupBy("event_type", "dom").agg(
        F.floor(F.sum("v") * 10_000 / F.count(F.lit(1)))
        .cast("long")
        .alias("dm")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.dom") < F.col("b.dom")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.signum(
                    (F.col("b.dm") - F.col("a.dm")).cast("double")
                ).cast("long")
            ).alias("s")
        )
    )
    wr = Window.partitionBy("event_type").orderBy("dm")
    wo = Window.partitionBy("event_type").orderBy("dom")
    r = daily.withColumn("r", F.rank().over(wr)).withColumn(
        "rl1", F.lag("r", 1).over(wo)
    ).withColumn("rl2", F.lag("r", 2).over(wo)).withColumn(
        "rl3", F.lag("r", 3).over(wo)
    )
    rb = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("r").alias("sr")
    )
    rj = r.join(F.broadcast(rb), "event_type")
    rbar = F.col("sr").cast("double") / F.col("n").cast("double")
    dev = F.col("r").cast("double") - rbar
    terms = rj.select(
        "event_type",
        F.floor(dev * dev * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "d0"
        ),
        *[
            F.when(
                F.col(f"rl{k}").isNotNull(),
                F.floor(
                    dev
                    * (F.col(f"rl{k}").cast("double") - rbar)
                    * 1_000_000
                    + F.lit(_OFF)
                ).cast("long"),
            ).alias(f"d{k}")
            for k in (1, 2, 3)
        ],
    )
    ac = terms.groupBy("event_type").agg(
        F.sum("d0").alias("s0"),
        F.sum("d1").alias("s1"),
        F.sum("d2").alias("s2"),
        F.sum("d3").alias("s3"),
    )
    ties = (
        daily.groupBy("event_type", "dm")
        .agg(F.count(F.lit(1)).alias("tj"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("tj") * (F.col("tj") - 1) * (2 * F.col("tj") + 5)
            ).alias("tie_adj")
        )
    )
    t = (
        s.join(ac, "event_type")
        .join(ties, "event_type")
        .join(F.broadcast(rb.select("event_type", "n")), "event_type")
    )
    nd = F.col("n").cast("double")
    var0 = (
        nd * (nd - 1.0) * (2.0 * nd + 5.0)
        - F.col("tie_adj").cast("double")
    ) / 18.0
    corr = F.lit(1.0)
    for k in (1, 2, 3):
        rk = F.col(f"s{k}").cast("double") / F.col("s0").cast("double")
        corr = corr + (
            2.0
            / (nd * (nd - 1.0) * (nd - 2.0))
            * (nd - k)
            * (nd - k - 1.0)
            * (nd - k - 2.0)
            * rk
        )
    vs = var0 * corr
    sd = F.col("s").cast("double")
    z = F.when(F.col("s") > 0, (sd - 1.0) / F.sqrt(vs)).when(
        F.col("s") < 0, (sd + 1.0) / F.sqrt(vs)
    ).otherwise(F.lit(0.0))
    return t.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s_stat"),
        F.floor(corr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "var_inflation_e6"
        ),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


SQL_HAMED_RAO = f"""
WITH ev AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), daily AS (
  SELECT event_type, dom,
         CAST(floor(CAST(sum(v) AS DOUBLE) * 10000 / count(*)) AS BIGINT)
           AS dm
  FROM ev GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.dm > a.dm THEN 1
                       WHEN b.dm < a.dm THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.dom < b.dom
  GROUP BY 1
), r AS (
  SELECT event_type, dom, dm,
         rank() OVER (PARTITION BY event_type ORDER BY dm) AS r
  FROM daily
), rl AS (
  SELECT event_type, r,
         lag(r, 1) OVER w AS rl1,
         lag(r, 2) OVER w AS rl2,
         lag(r, 3) OVER w AS rl3
  FROM r WINDOW w AS (PARTITION BY event_type ORDER BY dom)
), rb AS (
  SELECT event_type, count(*) AS n, CAST(sum(r) AS BIGINT) AS sr
  FROM r GROUP BY 1
), terms AS (
  SELECT rl.event_type,
         CAST(floor((r - CAST(sr AS DOUBLE) / n) ^ 2 * 1000000 + {_OFF})
              AS BIGINT) AS d0,
         CASE WHEN rl1 IS NOT NULL THEN
           CAST(floor((r - CAST(sr AS DOUBLE) / n)
                      * (rl1 - CAST(sr AS DOUBLE) / n) * 1000000 + {_OFF})
                AS BIGINT) END AS d1,
         CASE WHEN rl2 IS NOT NULL THEN
           CAST(floor((r - CAST(sr AS DOUBLE) / n)
                      * (rl2 - CAST(sr AS DOUBLE) / n) * 1000000 + {_OFF})
                AS BIGINT) END AS d2,
         CASE WHEN rl3 IS NOT NULL THEN
           CAST(floor((r - CAST(sr AS DOUBLE) / n)
                      * (rl3 - CAST(sr AS DOUBLE) / n) * 1000000 + {_OFF})
                AS BIGINT) END AS d3
  FROM rl JOIN rb ON rb.event_type = rl.event_type
), ac AS (
  SELECT event_type,
         CAST(sum(d0) AS BIGINT) AS s0, CAST(sum(d1) AS BIGINT) AS s1,
         CAST(sum(d2) AS BIGINT) AS s2, CAST(sum(d3) AS BIGINT) AS s3
  FROM terms GROUP BY 1
), ties AS (
  SELECT event_type,
         CAST(sum(tj * (tj - 1) * (2 * tj + 5)) AS BIGINT) AS tie_adj
  FROM (SELECT event_type, dm, count(*) AS tj FROM daily GROUP BY 1, 2)
  GROUP BY 1
), t AS (
  SELECT s.event_type, s.s, n, tie_adj,
         (n * (n - 1.0) * (2.0 * n + 5.0) - tie_adj) / 18.0 AS var0,
         1.0
         + 2.0 / (n * (n - 1.0) * (n - 2.0))
           * ((n - 1) * (n - 2.0) * (n - 3.0) * (CAST(s1 AS DOUBLE) / s0)
              + (n - 2) * (n - 3.0) * (n - 4.0) * (CAST(s2 AS DOUBLE) / s0)
              + (n - 3) * (n - 4.0) * (n - 5.0) * (CAST(s3 AS DOUBLE) / s0))
           AS corr
  FROM s
  JOIN ac ON ac.event_type = s.event_type
  JOIN ties ON ties.event_type = s.event_type
  JOIN rb ON rb.event_type = s.event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       s AS s_stat,
       CAST(floor(corr * 1000000 + {_OFF}) AS BIGINT) AS var_inflation_e6,
       CAST(floor(CASE WHEN s > 0 THEN (s - 1.0) / sqrt(var0 * corr)
                       WHEN s < 0 THEN (s + 1.0) / sqrt(var0 * corr)
                       ELSE 0.0 END * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM t ORDER BY event_type
"""


QUERIES.update(
    {
        "mardia_kurtosis": q_mardia_kurtosis,
        "box_m": q_box_m,
        "hamed_rao_mk": q_hamed_rao_mk,
    }
)

ORACLE_SQL.update(
    {
        "mardia_kurtosis": SQL_MARDIA,
        "box_m": SQL_BOXM,
        "hamed_rao_mk": SQL_HAMED_RAO,
    }
)


# ---------------------------------------------------------------------------
# rarefaction_curve — hypergeometric vocabulary rarefaction (Hurlbert
# 1971 / Heck 1975): expected distinct-word richness per source at
# 10% / 25% / 50% token subsamples
# ---------------------------------------------------------------------------
# E[S_m] = sum_w (1 - C(N - N_w, m) / C(N, m)); every binomial ratio
# goes through the shared Lanczos lnGamma twins (stats15), per-word
# contributions e9-floored before exact summation.  Words with
# N_w > N - m contribute exactly 1 (certain to appear).

from diive_spark.queries_stats15 import _lnchoose, _lnchoose_sql


def q_rarefaction_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    wc = docs.groupBy("source", "w").agg(F.count(F.lit(1)).alias("nw"))
    tot = wc.groupBy("source").agg(
        F.sum("nw").alias("n"), F.count(F.lit(1)).alias("vocab")
    )
    t = wc.join(F.broadcast(tot), "source")
    cols = {}
    for name, frac in (("s10", 10), ("s25", 4), ("s50", 2)):
        m = F.floor(F.col("n") / frac).cast("long")
        nn = F.col("n").cast("double")
        nwd = F.col("nw").cast("double")
        md = m.cast("double")
        ln_ratio = _lnchoose(nn - nwd, md) - _lnchoose(nn, md)
        contrib = F.when(
            F.col("nw") > F.col("n") - m, F.lit(1.0)
        ).otherwise(1.0 - F.exp(ln_ratio))
        cols[name] = F.floor(contrib * 1e9 + F.lit(_OFF)).cast("long")
    t = t.select(
        "source", cols["s10"].alias("c10"), cols["s25"].alias("c25"),
        cols["s50"].alias("c50"),
    )
    out = t.groupBy("source").agg(
        F.sum("c10").alias("e10"),
        F.sum("c25").alias("e25"),
        F.sum("c50").alias("e50"),
    ).join(F.broadcast(tot), "source")
    return out.select(
        "source",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.floor(F.col("e10").cast("double") / 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("e_richness_10pct"),
        F.floor(F.col("e25").cast("double") / 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("e_richness_25pct"),
        F.floor(F.col("e50").cast("double") / 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("e_richness_50pct"),
    ).orderBy("source")


def _rare_sql_term(frac: int) -> str:
    m = f"CAST(floor(CAST(n AS DOUBLE) / {frac}) AS BIGINT)"
    ln_ratio = (
        f"({_lnchoose_sql(f'CAST(n AS DOUBLE) - nw', f'CAST({m} AS DOUBLE)')}"
        f" - {_lnchoose_sql('CAST(n AS DOUBLE)', f'CAST({m} AS DOUBLE)')})"
    )
    return (
        f"CAST(floor((CASE WHEN nw > n - {m} THEN 1.0"
        f" ELSE 1.0 - exp({ln_ratio}) END) * 1e9 + {{off}}) AS BIGINT)"
    )


SQL_RAREFACTION = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), wc AS (
  SELECT source, w, count(*) AS nw FROM toks GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(sum(nw) AS BIGINT) AS n, count(*) AS vocab
  FROM wc GROUP BY 1
), t AS (
  SELECT wc.source,
         {_rare_sql_term(10).format(off=_OFF)} AS c10,
         {_rare_sql_term(4).format(off=_OFF)} AS c25,
         {_rare_sql_term(2).format(off=_OFF)} AS c50
  FROM wc JOIN tot ON tot.source = wc.source
), agg AS (
  SELECT source,
         CAST(sum(c10) AS BIGINT) AS e10,
         CAST(sum(c25) AS BIGINT) AS e25,
         CAST(sum(c50) AS BIGINT) AS e50
  FROM t GROUP BY 1
)
SELECT agg.source,
       n AS n_tokens,
       CAST(vocab AS BIGINT) AS vocab,
       CAST(floor(CAST(e10 AS DOUBLE) / 1e9 + {_OFF}) AS BIGINT)
         AS e_richness_10pct,
       CAST(floor(CAST(e25 AS DOUBLE) / 1e9 + {_OFF}) AS BIGINT)
         AS e_richness_25pct,
       CAST(floor(CAST(e50 AS DOUBLE) / 1e9 + {_OFF}) AS BIGINT)
         AS e_richness_50pct
FROM agg JOIN tot ON tot.source = agg.source
ORDER BY agg.source
"""


QUERIES.update({"rarefaction_curve": q_rarefaction_curve})
ORACLE_SQL.update({"rarefaction_curve": SQL_RAREFACTION})


# ---------------------------------------------------------------------------
# Parametric-fit battery 2 (complements lognormal/Weibull/GEV/GPD/
# negbin/ZTP/von Mises/Gompertz): gamma by method of moments, inverse
# Gaussian by closed-form MLE, Laplace by median/MAD MLE, logistic by
# MoM — each with a moment-diagnostic lack-of-fit check (implied vs
# sample higher moment), since neither engine ships the incomplete
# gamma / erf needed for CDF-based GOF.
# ---------------------------------------------------------------------------


def _vals16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )


_SQL_VALS16 = f"""
  vals AS (
    SELECT event_type,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
    FROM events
  )
"""


def _moments16(df: DataFrame) -> DataFrame:
    x = F.col("v").cast("double") / 100.0
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.floor(x * x * x * 100 + F.lit(_OFF)).cast("long")).alias(
            "s3_e2"
        ),
        F.sum(F.floor(x * x * x * x + F.lit(_OFF)).cast("long")).alias(
            "s4_e0"
        ),
        F.sum(
            F.floor(1e9 / F.col("v").cast("double") + F.lit(_OFF)).cast(
                "long"
            )
        ).alias("sinv_e9x100"),
    )


_SQL_MOM16 = f"""
  mom AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(v) AS BIGINT) AS s1,
           CAST(sum(v * v) AS BIGINT) AS s2,
           CAST(sum(CAST(floor((v / 100.0) ^ 3 * 100 + {_OFF}) AS BIGINT))
                AS BIGINT) AS s3_e2,
           CAST(sum(CAST(floor((v / 100.0) ^ 4 + {_OFF}) AS BIGINT))
                AS BIGINT) AS s4_e0,
           CAST(sum(CAST(floor(1e9 / v + {_OFF}) AS BIGINT)) AS BIGINT)
             AS sinv_e9x100
    FROM vals GROUP BY 1
  )
"""


def _central16(nd, m1, m2, m3, m4):
    """Central moments mu2..mu4 from raw value-unit moments."""
    mu2 = m2 - m1 * m1
    mu3 = m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1
    mu4 = (
        m4
        - 4.0 * m1 * m3
        + 6.0 * m1 * m1 * m2
        - 3.0 * m1 * m1 * m1 * m1
    )
    return mu2, mu3, mu4


def q_gamma_fit_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _moments16(_vals16(spark, sf_dir))
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / 100.0 / nd
    m2 = F.col("s2").cast("double") / 10_000.0 / nd
    m3 = F.col("s3_e2").cast("double") / 100.0 / nd
    m4 = F.col("s4_e0").cast("double") / nd
    mu2, mu3, _ = _central16(nd, m1, m2, m3, m4)
    shape = m1 * m1 / mu2
    scale = mu2 / m1
    skew_sample = mu3 / F.pow(mu2, 1.5)
    skew_implied = 2.0 / F.sqrt(shape)
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(shape * 10_000 + F.lit(_OFF)).cast("long").alias(
            "shape_e4"
        ),
        F.floor(scale * 10_000 + F.lit(_OFF)).cast("long").alias(
            "scale_e4"
        ),
        F.floor(skew_sample * 10_000 + F.lit(_OFF)).cast("long").alias(
            "skew_sample_e4"
        ),
        F.floor(skew_implied * 10_000 + F.lit(_OFF)).cast("long").alias(
            "skew_implied_e4"
        ),
    ).orderBy("event_type")


SQL_GAMMA = f"""
WITH {_SQL_VALS16}, {_SQL_MOM16}, c AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / 100.0 / n AS m1,
         CAST(s2 AS DOUBLE) / 10000.0 / n AS m2,
         CAST(s3_e2 AS DOUBLE) / 100.0 / n AS m3
  FROM mom
), f AS (
  SELECT event_type, n, m1,
         m2 - m1 * m1 AS mu2,
         m3 - 3.0 * m1 * m2 + 2.0 * m1 ^ 3 AS mu3
  FROM c
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(m1 * m1 / mu2 * 10000 + {_OFF}) AS BIGINT) AS shape_e4,
       CAST(floor(mu2 / m1 * 10000 + {_OFF}) AS BIGINT) AS scale_e4,
       CAST(floor(mu3 / mu2 ^ 1.5 * 10000 + {_OFF}) AS BIGINT)
         AS skew_sample_e4,
       CAST(floor(2.0 / sqrt(m1 * m1 / mu2) * 10000 + {_OFF}) AS BIGINT)
         AS skew_implied_e4
FROM f ORDER BY event_type
"""


def q_invgauss_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # degenerate guard (sf0.1 sweep): the IG harmonic-mean term 1/v blows
    # up on zero-cent observations; the distribution's support is (0, inf),
    # so zero values are excluded from the fit in BOTH engines.
    g = _moments16(_vals16(spark, sf_dir).filter(F.col("v") > 0))
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / 100.0 / nd
    m2 = F.col("s2").cast("double") / 10_000.0 / nd
    m3 = F.col("s3_e2").cast("double") / 100.0 / nd
    m4 = F.col("s4_e0").cast("double") / nd
    mu2, mu3, _ = _central16(nd, m1, m2, m3, m4)
    sinv = F.col("sinv_e9x100").cast("double") / 1e9 * 100.0
    lam = nd / (sinv - nd / m1)
    var_implied = F.pow(m1, 3) / lam
    skew_sample = mu3 / F.pow(mu2, 1.5)
    skew_implied = 3.0 * F.sqrt(m1 / lam)
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(m1 * 10_000 + F.lit(_OFF)).cast("long").alias("mu_e4"),
        F.floor(lam * 10_000 + F.lit(_OFF)).cast("long").alias(
            "lambda_e4"
        ),
        F.floor((var_implied - mu2) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("var_gap_e4"),
        F.floor((skew_implied - skew_sample) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("skew_gap_e4"),
    ).orderBy("event_type")


SQL_INVGAUSS = f"""
WITH {_SQL_VALS16},
-- IG support is (0, inf): zero-cent observations excluded, mirrors Spark
mom AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(v) AS BIGINT) AS s1,
           CAST(sum(v * v) AS BIGINT) AS s2,
           CAST(sum(CAST(floor((v / 100.0) ^ 3 * 100 + {_OFF}) AS BIGINT))
                AS BIGINT) AS s3_e2,
           CAST(sum(CAST(floor((v / 100.0) ^ 4 + {_OFF}) AS BIGINT))
                AS BIGINT) AS s4_e0,
           CAST(sum(CAST(floor(1e9 / v + {_OFF}) AS BIGINT)) AS BIGINT)
             AS sinv_e9x100
    FROM vals WHERE v > 0 GROUP BY 1
), c AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / 100.0 / n AS m1,
         CAST(s2 AS DOUBLE) / 10000.0 / n AS m2,
         CAST(s3_e2 AS DOUBLE) / 100.0 / n AS m3,
         CAST(sinv_e9x100 AS DOUBLE) / 1e9 * 100.0 AS sinv
  FROM mom
), f AS (
  SELECT event_type, n, m1,
         m2 - m1 * m1 AS mu2,
         m3 - 3.0 * m1 * m2 + 2.0 * m1 ^ 3 AS mu3,
         n / (sinv - n / m1) AS lam
  FROM c
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(m1 * 10000 + {_OFF}) AS BIGINT) AS mu_e4,
       CAST(floor(lam * 10000 + {_OFF}) AS BIGINT) AS lambda_e4,
       CAST(floor((m1 ^ 3 / lam - mu2) * 10000 + {_OFF}) AS BIGINT)
         AS var_gap_e4,
       CAST(floor((3.0 * sqrt(m1 / lam) - mu3 / mu2 ^ 1.5) * 10000 + {_OFF})
            AS BIGINT) AS skew_gap_e4
FROM f ORDER BY event_type
"""


def q_laplace_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _vals16(spark, sf_dir)
    v = v.withColumn(
        "rn0",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("v")
        ),
    )
    cnt = v.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    med = (
        v.join(F.broadcast(cnt), "event_type")
        .filter(
            (F.col("rn0") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn0") == F.floor(F.col("n") / 2) + 1)
        )
        .groupBy("event_type")
        .agg(F.floor(F.avg("v")).cast("long").alias("med"))
    )
    t = v.join(F.broadcast(med), "event_type")
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(F.col("v") - F.col("med"))).alias("sad"),
        F.sum(
            (F.col("v") - F.col("med")) * (F.col("v") - F.col("med"))
        ).alias("ssq"),
        F.max("med").alias("med"),
    )
    nd = F.col("n").cast("double")
    b = F.col("sad").cast("double") / 100.0 / nd
    var_m = F.col("ssq").cast("double") / 10_000.0 / nd
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("med").cast("double") / 100.0 * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("loc_e4"),
        F.floor(b * 10_000 + F.lit(_OFF)).cast("long").alias("b_e4"),
        F.floor((2.0 * b * b - var_m) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("var_gap_e4"),
    ).orderBy("event_type")


SQL_LAPLACE = f"""
WITH {_SQL_VALS16}, r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn0,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM vals
), med AS (
  SELECT event_type, CAST(floor(avg(v)) AS BIGINT) AS med
  FROM r
  WHERE rn0 = CAST(floor((n + 1) / 2.0) AS BIGINT)
     OR rn0 = CAST(floor(n / 2.0) AS BIGINT) + 1
  GROUP BY 1
), g AS (
  SELECT vals.event_type, count(*) AS n,
         CAST(sum(abs(v - med)) AS BIGINT) AS sad,
         CAST(sum((v - med) * (v - med)) AS BIGINT) AS ssq,
         max(med) AS med
  FROM vals JOIN med ON med.event_type = vals.event_type
  GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(med / 100.0 * 10000 + {_OFF}) AS BIGINT) AS loc_e4,
       CAST(floor(CAST(sad AS DOUBLE) / 100.0 / n * 10000 + {_OFF})
            AS BIGINT) AS b_e4,
       CAST(floor((2.0 * (CAST(sad AS DOUBLE) / 100.0 / n) ^ 2
                   - CAST(ssq AS DOUBLE) / 10000.0 / n) * 10000 + {_OFF})
            AS BIGINT) AS var_gap_e4
FROM g ORDER BY event_type
"""


def q_logistic_fit_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _moments16(_vals16(spark, sf_dir))
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / 100.0 / nd
    m2 = F.col("s2").cast("double") / 10_000.0 / nd
    m3 = F.col("s3_e2").cast("double") / 100.0 / nd
    m4 = F.col("s4_e0").cast("double") / nd
    mu2, _, mu4 = _central16(nd, m1, m2, m3, m4)
    s = F.sqrt(3.0 * mu2) / 3.141592653589793
    exkurt = mu4 / (mu2 * mu2) - 3.0
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(m1 * 10_000 + F.lit(_OFF)).cast("long").alias("mu_e4"),
        F.floor(s * 10_000 + F.lit(_OFF)).cast("long").alias("s_e4"),
        F.floor(exkurt * 10_000 + F.lit(_OFF)).cast("long").alias(
            "exkurt_sample_e4"
        ),
        F.lit(12_000).cast("long").alias("exkurt_implied_e4"),
    ).orderBy("event_type")


SQL_LOGISTIC = f"""
WITH {_SQL_VALS16}, {_SQL_MOM16}, c AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / 100.0 / n AS m1,
         CAST(s2 AS DOUBLE) / 10000.0 / n AS m2,
         CAST(s3_e2 AS DOUBLE) / 100.0 / n AS m3,
         CAST(s4_e0 AS DOUBLE) / n AS m4
  FROM mom
), f AS (
  SELECT event_type, n, m1,
         m2 - m1 * m1 AS mu2,
         m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 ^ 4 AS mu4
  FROM c
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(m1 * 10000 + {_OFF}) AS BIGINT) AS mu_e4,
       CAST(floor(sqrt(3.0 * mu2) / 3.141592653589793 * 10000 + {_OFF})
            AS BIGINT) AS s_e4,
       CAST(floor((mu4 / (mu2 * mu2) - 3.0) * 10000 + {_OFF}) AS BIGINT)
         AS exkurt_sample_e4,
       CAST(12000 AS BIGINT) AS exkurt_implied_e4
FROM f ORDER BY event_type
"""


QUERIES.update(
    {
        "gamma_fit_mom": q_gamma_fit_mom,
        "invgauss_fit": q_invgauss_fit,
        "laplace_fit": q_laplace_fit,
        "logistic_fit_mom": q_logistic_fit_mom,
    }
)

ORACLE_SQL.update(
    {
        "gamma_fit_mom": SQL_GAMMA,
        "invgauss_fit": SQL_INVGAUSS,
        "laplace_fit": SQL_LAPLACE,
        "logistic_fit_mom": SQL_LOGISTIC,
    }
)


# ---------------------------------------------------------------------------
# Queueing / capacity battery: each event is a job whose service time
# is value/100 hours; the arrival rate is events per hour over the
# 30-day window.  Erlang sums a^k/k! go through the shared Lanczos
# lnGamma (k! = Gamma(k+1)) with per-term e9 floors, enumerated over a
# tiny broadcast k-range — the classic workforce-management math as
# distributed DataFrame plans.
# ---------------------------------------------------------------------------

from diive_spark.queries_stats15 import _lngamma, _lngamma_sql


def _offered_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
        F.unix_timestamp("ts").alias("t_s"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        ((F.max("t_s") - F.min("t_s")).cast("double") / 3600.0).alias(
            "span_h"
        ),
    )


_SQL_LOAD = f"""
  ev AS (
    SELECT event_type,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
           CAST(floor(epoch(ts)) AS BIGINT) AS t_s
    FROM events
  ), load AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(v) AS BIGINT) AS s1,
           CAST(sum(v * v) AS BIGINT) AS s2,
           (max(t_s) - min(t_s)) / 3600.0 AS span_h
    FROM ev GROUP BY 1
  )
"""

_A_EXPR_SQL = "(n / span_h) * (CAST(s1 AS DOUBLE) / n / 100.0 / 100.0)"


def _a_expr():
    lam = F.col("n").cast("double") / F.col("span_h")
    sbar_h = (
        F.col("s1").cast("double") / F.col("n").cast("double") / 100.0 / 100.0
    )
    return lam * sbar_h


def q_erlang_c_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _offered_load(spark, sf_dir).withColumn("a", _a_expr()).withColumn(
        "c", (F.floor(F.col("a")) + 1).cast("long")
    )
    ks = spark.range(0, 61).select(F.col("id").cast("long").alias("k"))
    t = g.crossJoin(F.broadcast(ks)).filter(F.col("k") < F.col("c"))
    term = F.exp(
        F.col("k").cast("double") * F.log(F.col("a"))
        - _lngamma(F.col("k").cast("double") + 1.0)
    )
    partial = t.withColumn(
        "term_e9", F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
    ).groupBy("event_type").agg(F.sum("term_e9").alias("s0_e9"))
    f = g.join(partial, "event_type")
    a = F.col("a")
    c = F.col("c").cast("double")
    top = F.exp(c * F.log(a) - _lngamma(c + 1.0)) * (c / (c - a))
    s0 = F.col("s0_e9").cast("double") / 1e9
    pw = top / (s0 + top)
    sbar_s = F.col("s1").cast("double") / F.col("n").cast("double") / 100.0 * 36.0
    wq_s = pw * sbar_s / (c - a)
    return f.select(
        "event_type",
        F.floor(a * 10_000 + F.lit(_OFF)).cast("long").alias("load_e4"),
        F.col("c").alias("servers"),
        F.floor(pw * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "p_wait_e6"
        ),
        F.floor(wq_s * 1_000 + F.lit(_OFF)).cast("long").alias("wq_ms"),
    ).orderBy("event_type")


SQL_ERLANG_C = f"""
WITH {_SQL_LOAD}, base AS (
  SELECT event_type, n, s1, span_h,
         {_A_EXPR_SQL} AS a,
         CAST(floor({_A_EXPR_SQL}) + 1 AS BIGINT) AS c
  FROM load
), partial AS (
  SELECT event_type,
         CAST(sum(CAST(floor(exp(k * ln(a) -
             {_lngamma_sql('k + 1.0')}) * 1e9 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s0_e9
  FROM base, generate_series(0, 60) AS ks(k)
  WHERE k < c
  GROUP BY 1
), f AS (
  SELECT base.event_type, a, c, n, s1,
         exp(c * ln(a) - {_lngamma_sql('c + 1.0')}) * (c / (c - a)) AS top,
         CAST(s0_e9 AS DOUBLE) / 1e9 AS s0
  FROM base JOIN partial ON partial.event_type = base.event_type
)
SELECT event_type,
       CAST(floor(a * 10000 + {_OFF}) AS BIGINT) AS load_e4,
       c AS servers,
       CAST(floor(top / (s0 + top) * 1000000 + {_OFF}) AS BIGINT)
         AS p_wait_e6,
       CAST(floor(top / (s0 + top)
                  * (CAST(s1 AS DOUBLE) / n / 100.0 * 36.0)
                  / (c - a) * 1000 + {_OFF}) AS BIGINT) AS wq_ms
FROM f ORDER BY event_type
"""


def q_erlang_b_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _offered_load(spark, sf_dir).withColumn("a", _a_expr()).withColumn(
        "c", (F.floor(F.col("a")) + 1).cast("long")
    )
    ks = spark.range(0, 62).select(F.col("id").cast("long").alias("k"))
    t = g.crossJoin(F.broadcast(ks)).filter(F.col("k") <= F.col("c"))
    term = F.exp(
        F.col("k").cast("double") * F.log(F.col("a"))
        - _lngamma(F.col("k").cast("double") + 1.0)
    )
    partial = t.withColumn(
        "term_e9", F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
    ).groupBy("event_type").agg(F.sum("term_e9").alias("den_e9"))
    f = g.join(partial, "event_type")
    a = F.col("a")
    c = F.col("c").cast("double")
    top = F.exp(c * F.log(a) - _lngamma(c + 1.0))
    b = top / (F.col("den_e9").cast("double") / 1e9)
    carried = a * (1.0 - b)
    return f.select(
        "event_type",
        F.floor(a * 10_000 + F.lit(_OFF)).cast("long").alias("load_e4"),
        F.col("c").alias("trunks"),
        F.floor(b * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "p_block_e6"
        ),
        F.floor(carried * 10_000 + F.lit(_OFF)).cast("long").alias(
            "carried_load_e4"
        ),
    ).orderBy("event_type")


SQL_ERLANG_B = f"""
WITH {_SQL_LOAD}, base AS (
  SELECT event_type, n, s1, span_h,
         {_A_EXPR_SQL} AS a,
         CAST(floor({_A_EXPR_SQL}) + 1 AS BIGINT) AS c
  FROM load
), partial AS (
  SELECT event_type,
         CAST(sum(CAST(floor(exp(k * ln(a) -
             {_lngamma_sql('k + 1.0')}) * 1e9 + {_OFF}) AS BIGINT))
              AS BIGINT) AS den_e9
  FROM base, generate_series(0, 61) AS ks(k)
  WHERE k <= c
  GROUP BY 1
), f AS (
  SELECT base.event_type, a, c,
         exp(c * ln(a) - {_lngamma_sql('c + 1.0')})
           / (CAST(den_e9 AS DOUBLE) / 1e9) AS b
  FROM base JOIN partial ON partial.event_type = base.event_type
)
SELECT event_type,
       CAST(floor(a * 10000 + {_OFF}) AS BIGINT) AS load_e4,
       c AS trunks,
       CAST(floor(b * 1000000 + {_OFF}) AS BIGINT) AS p_block_e6,
       CAST(floor(a * (1.0 - b) * 10000 + {_OFF}) AS BIGINT)
         AS carried_load_e4
FROM f ORDER BY event_type
"""


def q_staffing_min_servers(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _offered_load(spark, sf_dir).withColumn("a", _a_expr())
    cs = spark.range(1, 61).select(F.col("id").cast("long").alias("c"))
    ks = spark.range(0, 61).select(F.col("id").cast("long").alias("k"))
    cand = g.crossJoin(F.broadcast(cs)).filter(
        F.col("c").cast("double") > F.col("a")
    )
    t = cand.join(F.broadcast(ks), F.col("k") < F.col("c"))
    term = F.exp(
        F.col("k").cast("double") * F.log(F.col("a"))
        - _lngamma(F.col("k").cast("double") + 1.0)
    )
    partial = t.withColumn(
        "term_e9", F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
    ).groupBy("event_type", "c", "a").agg(
        F.sum("term_e9").alias("s0_e9")
    )
    a = F.col("a")
    c = F.col("c").cast("double")
    top = F.exp(c * F.log(a) - _lngamma(c + 1.0)) * (c / (c - a))
    pw = top / (F.col("s0_e9").cast("double") / 1e9 + top)
    scored = partial.withColumn(
        "pw_e9", F.floor(pw * 1e9 + F.lit(_OFF)).cast("long")
    ).filter(F.col("pw_e9") <= 200_000_000)
    w = Window.partitionBy("event_type").orderBy(F.col("c").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.floor(F.col("a") * 10_000 + F.lit(_OFF)).cast("long").alias(
                "load_e4"
            ),
            F.col("c").alias("min_servers"),
            F.floor(
                F.col("pw_e9").cast("double") / 1000.0 + F.lit(_OFF)
            )
            .cast("long")
            .alias("p_wait_e6"),
        )
        .orderBy("event_type")
    )


SQL_STAFFING = f"""
WITH {_SQL_LOAD}, base AS (
  SELECT event_type, {_A_EXPR_SQL} AS a
  FROM load
), partial AS (
  SELECT event_type, c, a,
         CAST(sum(CAST(floor(exp(k * ln(a) -
             {_lngamma_sql('k + 1.0')}) * 1e9 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s0_e9
  FROM base, generate_series(1, 60) AS cs(c),
       generate_series(0, 60) AS ks(k)
  WHERE c > a AND k < c
  GROUP BY 1, 2, 3
), scored AS (
  SELECT event_type, c, a,
         CAST(floor(
           (exp(c * ln(a) - {_lngamma_sql('c + 1.0')}) * (c / (c - a)))
           / (CAST(s0_e9 AS DOUBLE) / 1e9
              + exp(c * ln(a) - {_lngamma_sql('c + 1.0')})
                * (c / (c - a))) * 1e9 + {_OFF}) AS BIGINT) AS pw_e9
  FROM partial
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY c ASC)
           AS rn
  FROM scored WHERE pw_e9 <= 200000000
)
SELECT event_type,
       CAST(floor(a * 10000 + {_OFF}) AS BIGINT) AS load_e4,
       CAST(c AS BIGINT) AS min_servers,
       CAST(floor(pw_e9 / 1000.0 + {_OFF}) AS BIGINT) AS p_wait_e6
FROM ranked WHERE rn = 1 ORDER BY event_type
"""


def q_pollaczek_khinchine(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _offered_load(spark, sf_dir)
    nd = F.col("n").cast("double")
    lam_s = nd / (F.col("span_h") * 3600.0)
    es = F.col("s1").cast("double") / nd / 100.0
    es2 = F.col("s2").cast("double") / nd / 10_000.0
    rho = lam_s * es
    wq = lam_s * es2 / (2.0 * (1.0 - rho))
    lq = lam_s * wq
    cv2 = (es2 - es * es) / (es * es)
    return g.select(
        "event_type",
        F.floor(rho * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rho_e6"
        ),
        F.floor(cv2 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "service_cv2_e4"
        ),
        F.floor(wq * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "wq_us"
        ),
        F.floor(lq * 1_000_000_000 + F.lit(_OFF)).cast("long").alias(
            "lq_e9"
        ),
    ).orderBy("event_type")


SQL_PK = f"""
WITH {_SQL_LOAD}, f AS (
  SELECT event_type,
         n / (span_h * 3600.0) AS lam_s,
         CAST(s1 AS DOUBLE) / n / 100.0 AS es,
         CAST(s2 AS DOUBLE) / n / 10000.0 AS es2
  FROM load
)
SELECT event_type,
       CAST(floor(lam_s * es * 1000000 + {_OFF}) AS BIGINT) AS rho_e6,
       CAST(floor((es2 - es * es) / (es * es) * 10000 + {_OFF}) AS BIGINT)
         AS service_cv2_e4,
       CAST(floor(lam_s * es2 / (2.0 * (1.0 - lam_s * es)) * 1000000
                  + {_OFF}) AS BIGINT) AS wq_us,
       CAST(floor(lam_s * lam_s * es2 / (2.0 * (1.0 - lam_s * es))
                  * 1000000000 + {_OFF}) AS BIGINT) AS lq_e9
FROM f ORDER BY event_type
"""


QUERIES.update(
    {
        "erlang_c_wait": q_erlang_c_wait,
        "erlang_b_blocking": q_erlang_b_blocking,
        "staffing_min_servers": q_staffing_min_servers,
        "pollaczek_khinchine": q_pollaczek_khinchine,
    }
)

ORACLE_SQL.update(
    {
        "erlang_c_wait": SQL_ERLANG_C,
        "erlang_b_blocking": SQL_ERLANG_B,
        "staffing_min_servers": SQL_STAFFING,
        "pollaczek_khinchine": SQL_PK,
    }
)


# ---------------------------------------------------------------------------
# Privacy-release auditing (Machanavajjhala 2007; Li/Li/Venkatasubramanian
# 2007): quasi-identifier cells are (day, hour); the sensitive
# attribute is event_type.  l_diversity_audit reports distinct- and
# entropy-l floors per day-of-week; t_closeness_audit the worst
# total-variation gap between any cell's sensitive distribution and
# the global one.
# ---------------------------------------------------------------------------


def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.dayofweek("ts").alias("dow"),
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hh"),
        "event_type",
    )
    cell = ev.groupBy("dow", "dom", "hh", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    grp = cell.groupBy("dow", "dom", "hh").agg(
        F.count(F.lit(1)).alias("l_distinct"),
        F.sum("c").alias("n"),
        F.sum(
            F.floor(
                -(F.col("c").cast("double"))
                * F.log(F.col("c").cast("double"))
                * 1_000_000
                + F.lit(_OFF)
            ).cast("long")
        ).alias("sclogc_e6"),
    )
    ent = (
        F.col("sclogc_e6").cast("double") / 1e6
        / F.col("n").cast("double")
        + F.log(F.col("n").cast("double"))
    )
    grp = grp.withColumn(
        "expent_e4",
        F.floor(F.exp(ent) * 10_000 + F.lit(_OFF)).cast("long"),
    )
    out = grp.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.min("l_distinct").cast("long").alias("min_l_distinct"),
        F.min("expent_e4").cast("long").alias("min_entropy_l_e4"),
        F.sum((F.col("l_distinct") >= 3).cast("long"))
        .cast("long")
        .alias("cells_l_ge_3"),
    )
    return out.select(
        F.col("dow").cast("long").alias("dow_spark"),
        "n_cells",
        "min_l_distinct",
        "min_entropy_l_e4",
        "cells_l_ge_3",
    ).orderBy("dow_spark")


SQL_LDIV = f"""
WITH ev AS (
  SELECT dayofweek(ts) + 1 AS dow, EXTRACT(day FROM ts) AS dom,
         EXTRACT(hour FROM ts) AS hh, event_type
  FROM events
), cell AS (
  SELECT dow, dom, hh, event_type, count(*) AS c
  FROM ev GROUP BY 1, 2, 3, 4
), grp AS (
  SELECT dow, dom, hh,
         count(*) AS l_distinct,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CAST(floor(-c * ln(CAST(c AS DOUBLE)) * 1000000 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS sclogc_e6
  FROM cell GROUP BY 1, 2, 3
), scored AS (
  SELECT dow, l_distinct,
         CAST(floor(exp(CAST(sclogc_e6 AS DOUBLE) / 1e6 / n
                        + ln(CAST(n AS DOUBLE))) * 10000 + {_OFF})
              AS BIGINT) AS expent_e4
  FROM grp
)
SELECT CAST(dow AS BIGINT) AS dow_spark,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(min(l_distinct) AS BIGINT) AS min_l_distinct,
       CAST(min(expent_e4) AS BIGINT) AS min_entropy_l_e4,
       CAST(sum(CASE WHEN l_distinct >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS cells_l_ge_3
FROM scored GROUP BY 1 ORDER BY dow_spark
"""


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hh"),
        "event_type",
    )
    cell = ev.groupBy("dom", "hh", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    gl = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("gc"))
    big = ev.groupBy().agg(F.count(F.lit(1)).alias("gn"))
    cn = cell.groupBy("dom", "hh").agg(F.sum("c").alias("n"))
    t = (
        cell.join(F.broadcast(gl), "event_type")
        .join(F.broadcast(cn), ["dom", "hh"])
        .crossJoin(F.broadcast(big))
    )
    gap = F.abs(
        F.col("c").cast("double") / F.col("n").cast("double")
        - F.col("gc").cast("double") / F.col("gn").cast("double")
    )
    # present-type gaps plus the missing-type mass (types absent from
    # the cell contribute their full global share to the L1 distance)
    tv = t.groupBy("dom", "hh").agg(
        F.sum(F.floor(gap * 1e9 + F.lit(_OFF)).cast("long")).alias(
            "stv_e9"
        ),
        F.sum("gc").alias("gc_present"),
        F.max("gn").alias("gn"),
    )
    missing = (
        F.col("gn") - F.col("gc_present")
    ).cast("double") / F.col("gn").cast("double")
    tv = tv.withColumn(
        "tv_e9",
        F.floor(
            (
                F.col("stv_e9").cast("double")
                + F.floor(missing * 1e9 + F.lit(_OFF))
            )
            / 2.0
        ).cast("long"),
    )
    return tv.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.max("tv_e9").cast("long").alias("max_tv_e9"),
        F.sum((F.col("tv_e9") <= 200_000_000).cast("long"))
        .cast("long")
        .alias("cells_t_le_02"),
    )


SQL_TCLOSE = f"""
WITH ev AS (
  SELECT EXTRACT(day FROM ts) AS dom, EXTRACT(hour FROM ts) AS hh,
         event_type
  FROM events
), cell AS (
  SELECT dom, hh, event_type, count(*) AS c FROM ev GROUP BY 1, 2, 3
), gl AS (
  SELECT event_type, count(*) AS gc FROM ev GROUP BY 1
), big AS (SELECT count(*) AS gn FROM ev),
cn AS (
  SELECT dom, hh, CAST(sum(c) AS BIGINT) AS n FROM cell GROUP BY 1, 2
), t AS (
  SELECT cell.dom, cell.hh,
         CAST(sum(CAST(floor(abs(CAST(c AS DOUBLE) / n
                                 - CAST(gc AS DOUBLE) / gn) * 1e9 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS stv_e9,
         CAST(sum(gc) AS BIGINT) AS gc_present,
         max(gn) AS gn
  FROM cell
  JOIN gl USING (event_type)
  JOIN cn ON cn.dom = cell.dom AND cn.hh = cell.hh
  CROSS JOIN big
  GROUP BY 1, 2
), tv AS (
  SELECT dom, hh,
         CAST(floor((stv_e9
                     + floor(CAST(gn - gc_present AS DOUBLE) / gn * 1e9
                             + {_OFF})) / 2.0) AS BIGINT) AS tv_e9
  FROM t
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(max(tv_e9) AS BIGINT) AS max_tv_e9,
       CAST(sum(CASE WHEN tv_e9 <= 200000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS cells_t_le_02
FROM tv
"""


QUERIES.update(
    {
        "l_diversity_audit": q_l_diversity_audit,
        "t_closeness_audit": q_t_closeness_audit,
    }
)

ORACLE_SQL.update(
    {
        "l_diversity_audit": SQL_LDIV,
        "t_closeness_audit": SQL_TCLOSE,
    }
)


# ---------------------------------------------------------------------------
# bayesian_ab_prob — exact posterior P(p_weekend > p_weekday) under
# independent Beta(1,1) priors (Evan Miller's closed form / Raiffa-
# Schlaifer): P = sum_{i=0}^{aA-1} exp(lnB(aB+i, bA+bB) - ln(bA+i)
# - lnB(1+i, bA) - lnB(aB, bB)), A = weekend arm
# ---------------------------------------------------------------------------
# Conversion = centi-value above the type's integer mean.  The i-sum
# is DATA-SIZED (successes on the weekend arm) and runs distributed:
# a broadcast range cross-joined and filtered, per-term e12 floors,
# one exact integer sum — no driver loop at any SF.


def _lnbeta(x, y):
    return _lngamma(x) + _lngamma(y) - _lngamma(x + y)


def _lnbeta_sql(x: str, y: str) -> str:
    return (
        f"({_lngamma_sql(x)} + {_lngamma_sql(y)}"
        f" - {_lngamma_sql(f'({x}) + ({y})')})"
    )


def q_bayesian_ab_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofweek("ts").isin(1, 7).cast("long").alias("wk"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    thr = ev.groupBy("event_type").agg(
        F.floor(F.sum("v") / F.count(F.lit(1))).cast("long").alias("thr")
    )
    t = ev.join(F.broadcast(thr), "event_type").withColumn(
        "y", (F.col("v") > F.col("thr")).cast("long")
    )
    arms = t.groupBy("event_type").agg(
        (F.sum(F.col("wk") * F.col("y")) + 1).alias("aa"),
        (F.sum(F.col("wk") * (1 - F.col("y"))) + 1).alias("ba"),
        (F.sum((1 - F.col("wk")) * F.col("y")) + 1).alias("ab"),
        (F.sum((1 - F.col("wk")) * (1 - F.col("y"))) + 1).alias("bb"),
    )
    mx = arms.groupBy().agg(F.max("aa").alias("m")).collect()[0]["m"]
    ks = spark.range(0, int(mx)).select(F.col("id").alias("i"))
    grid = arms.join(F.broadcast(ks), F.col("i") < F.col("aa"))
    i = F.col("i").cast("double")
    ab = F.col("ab").cast("double")
    bb = F.col("bb").cast("double")
    ba = F.col("ba").cast("double")
    lnterm = (
        _lnbeta(ab + i, ba + bb)
        - F.log(ba + i)
        - _lnbeta(1.0 + i, ba)
        - _lnbeta(ab, bb)
    )
    g = grid.withColumn(
        "t_e12", F.floor(F.exp(lnterm) * 1e12 + F.lit(_OFF)).cast("long")
    ).groupBy("event_type", "aa", "ba", "ab", "bb").agg(
        F.sum("t_e12").alias("p_e12")
    )
    return g.select(
        "event_type",
        (F.col("aa") - 1).cast("long").alias("conv_weekend"),
        (F.col("ab") - 1).cast("long").alias("conv_weekday"),
        F.floor(F.col("p_e12").cast("double") / 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("p_weekend_better_e6"),
    ).orderBy("event_type")


SQL_BAYES_AB = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), thr AS (
  SELECT event_type,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS thr
  FROM ev GROUP BY 1
), t AS (
  SELECT ev.event_type, wk,
         CASE WHEN v > thr THEN 1 ELSE 0 END AS y
  FROM ev JOIN thr ON thr.event_type = ev.event_type
), arms AS (
  SELECT event_type,
         CAST(sum(wk * y) + 1 AS BIGINT) AS aa,
         CAST(sum(wk * (1 - y)) + 1 AS BIGINT) AS ba,
         CAST(sum((1 - wk) * y) + 1 AS BIGINT) AS ab,
         CAST(sum((1 - wk) * (1 - y)) + 1 AS BIGINT) AS bb
  FROM t GROUP BY 1
), ks AS (
  SELECT CAST(row_number() OVER () AS BIGINT) - 1 AS i FROM events
), grid AS (
  SELECT event_type, aa, ba, ab, bb, i
  FROM arms JOIN ks ON i < aa
), terms AS (
  SELECT event_type, aa, ab,
         CAST(floor(exp(
             {_lnbeta_sql('ab + CAST(i AS DOUBLE)', 'ba + bb')}
             - ln(ba + CAST(i AS DOUBLE))
             - {_lnbeta_sql('1.0 + CAST(i AS DOUBLE)', 'CAST(ba AS DOUBLE)')}
             - {_lnbeta_sql('CAST(ab AS DOUBLE)', 'CAST(bb AS DOUBLE)')})
             * 1e12 + {_OFF}) AS BIGINT) AS t_e12
  FROM grid
)
SELECT event_type,
       CAST(aa - 1 AS BIGINT) AS conv_weekend,
       CAST(ab - 1 AS BIGINT) AS conv_weekday,
       CAST(floor(CAST(sum(t_e12) AS DOUBLE) / 1e6 + {_OFF}) AS BIGINT)
         AS p_weekend_better_e6
FROM terms GROUP BY 1, 2, 3 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# hoover_index — Robin Hood / Hoover concentration index per source:
# H = sum|x_i - mu| / (2 sum x_i) over document lengths
# ---------------------------------------------------------------------------
# The share of total "mass" that would have to move to equalize; the
# deviation sum uses the exact integer mean-comparison n*x_i vs S.


def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", F.col("n_chars").alias("x")
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    t = d.join(F.broadcast(g), "source")
    dev = F.abs(F.col("n") * F.col("x") - F.col("s"))
    out = t.groupBy("source").agg(
        F.sum(dev).alias("sdev"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
    )
    h = F.col("sdev").cast("double") / (
        2.0 * F.col("n").cast("double") * F.col("s").cast("double")
    )
    return out.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.floor(h * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "hoover_e6"
        ),
    ).orderBy("source")


SQL_HOOVER = f"""
WITH d AS (
  SELECT source, n_chars AS x FROM documents
), g AS (
  SELECT source, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
  FROM d GROUP BY 1
), t AS (
  SELECT d.source,
         CAST(sum(abs(n * x - s)) AS BIGINT) AS sdev,
         max(n) AS n, max(s) AS s
  FROM d JOIN g ON g.source = d.source
  GROUP BY 1
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(floor(CAST(sdev AS DOUBLE) / (2.0 * n * s) * 1000000 + {_OFF})
            AS BIGINT) AS hoover_e6
FROM t ORDER BY source
"""


QUERIES.update(
    {
        "bayesian_ab_prob": q_bayesian_ab_prob,
        "hoover_index": q_hoover_index,
    }
)

ORACLE_SQL.update(
    {
        "bayesian_ab_prob": SQL_BAYES_AB,
        "hoover_index": SQL_HOOVER,
    }
)


# ---------------------------------------------------------------------------
# Operations-research battery: absorbing-chain time-to-purchase,
# Syntetos-Boylan demand classification, safety-stock / reorder-point
# dimensioning, and the newsvendor quantile — the inventory/funnel
# math a commerce event stream feeds.
# ---------------------------------------------------------------------------


_ABS_TARGET = "purchase"
_ABS_H = 30


def q_absorbing_markov_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected steps to absorption (capped at H=30) into 'purchase'
    from each starting event type, over the per-user event-sequence
    Markov chain.  The distribution vector iterates as e9 integers so
    every step is bit-identical cross-engine (IEEE division of exact
    integers); absorbing mass is dropped each step and the survival
    sum IS the truncated expectation (E[min(T, H)] = sum_k P(T > k)).
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("i"), F.col("nxt").alias("j"))
        .agg(F.count(F.lit(1)).alias("cij"))
    )
    ci = pairs.groupBy("i").agg(F.sum("cij").alias("ci"))
    p = pairs.join(ci, "i").filter(F.col("i") != _ABS_TARGET)
    # The Markov MODEL is k x k (k = #event types) — a bounded-size
    # object, so the H-step vector iteration runs on the COLLECTED
    # matrix (the house k-row-collect rule: k centroids, BPE merges,
    # manifest rows).  The original DataFrame-loop formulation built a
    # 29-join lineage for 16 rows of state and cost ~50 s at sf0.1 in
    # pure plan overhead (BENCH round-4 tail audit).  Arithmetic is
    # REPLICATED bit-for-bit: per-edge floor(double(m) * cij / ci),
    # then integer sums — identical to the oracle's recursive CTE.
    import math

    edges = p.select("i", "j", "cij", "ci").collect()  # k*k rows max
    trans: dict[str, list[tuple[str, int, int]]] = {}
    starts: set[str] = set()
    for r in edges:
        trans.setdefault(r["i"], []).append((r["j"], r["cij"], r["ci"]))
        starts.add(r["i"])
    rows = []
    for start in sorted(starts):
        m = {start: 10**9}
        total = 10**9  # k = 0 survival mass
        for _ in range(_ABS_H - 1):
            nxt: dict[str, int] = {}
            for state, mass in m.items():
                for j, cij, cci in trans.get(state, []):
                    if j == _ABS_TARGET:
                        continue
                    contrib = math.floor(float(mass) * cij / cci)
                    nxt[j] = nxt.get(j, 0) + contrib
            m = nxt
            total += sum(m.values())
        rows.append(
            (start, math.floor(total / 1e5 + _OFF))
        )
    return spark.createDataFrame(
        rows, "event_type string, e_steps_capped_e4 long"
    ).orderBy("event_type")


SQL_ABSORB = f"""
WITH RECURSIVE ev AS (
  SELECT user_id, ts, event_id, event_type FROM events
), seq AS (
  SELECT event_type AS i,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS j
  FROM ev
), pairs AS (
  SELECT i, j, count(*) AS cij FROM seq WHERE j IS NOT NULL GROUP BY 1, 2
), ci AS (
  SELECT i, CAST(sum(cij) AS BIGINT) AS ci FROM pairs GROUP BY 1
), p AS (
  SELECT pairs.i, j, cij, ci
  FROM pairs JOIN ci USING (i)
  WHERE pairs.i <> '{_ABS_TARGET}'
), states AS (
  SELECT i AS start FROM ci WHERE i <> '{_ABS_TARGET}'
), walk AS (
  SELECT start, start AS state, CAST(1000000000 AS BIGINT) AS m_e9,
         0 AS k
  FROM states
  UNION ALL
  SELECT start, state, CAST(sum(m_e9) AS BIGINT) AS m_e9, k FROM (
    SELECT w.start, p.j AS state,
           CAST(floor(CAST(w.m_e9 AS DOUBLE) * p.cij / p.ci) AS BIGINT)
             AS m_e9,
           w.k + 1 AS k
    FROM walk w JOIN p ON p.i = w.state
    WHERE w.k < {_ABS_H - 1}
  ) stepped
  WHERE state <> '{_ABS_TARGET}'
  GROUP BY 1, 2, 4
), surv AS (
  SELECT start, k, CAST(sum(m_e9) AS BIGINT) AS s_e9
  FROM walk GROUP BY 1, 2
)
SELECT start AS event_type,
       CAST(floor(CAST(sum(s_e9) AS DOUBLE) / 1e5 + {_OFF}) AS BIGINT)
         AS e_steps_capped_e4
FROM surv GROUP BY 1 ORDER BY event_type
"""


def _daily_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == _ABS_TARGET)
        .groupBy(
            F.col("user_id") % 10,
            F.dayofmonth("ts").alias("dom"),
        )
        .agg(
            F.count(F.lit(1)).alias("d"),
        )
        .withColumnRenamed("(user_id % 10)", "cohort")
    )


def q_demand_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan (2005) demand-pattern quadrants per user cohort
    (user_id % 10): ADI = days-with-window / demand-days, CV^2 of
    daily demand sizes; cutoffs ADI 1.32, CV^2 0.49."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == _ABS_TARGET)
        .select(
            (F.col("user_id") % 10).alias("cohort"),
            F.dayofmonth("ts").alias("dom"),
        )
    )
    daily = ev.groupBy("cohort", "dom").agg(F.count(F.lit(1)).alias("d"))
    span = ev.groupBy("cohort").agg(
        (F.max("dom") - F.min("dom") + 1).alias("span_days")
    )
    g = daily.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("d").alias("s"),
        F.sum(F.col("d") * F.col("d")).alias("ss"),
    ).join(F.broadcast(span), "cohort")
    nd = F.col("nd").cast("double")
    adi = F.col("span_days").cast("double") / nd
    mean = F.col("s").cast("double") / nd
    var = (F.col("ss").cast("double") - nd * mean * mean) / nd
    cv2 = var / (mean * mean)
    cls = (
        F.when((adi < 1.32) & (cv2 < 0.49), F.lit("smooth"))
        .when((adi < 1.32) & (cv2 >= 0.49), F.lit("erratic"))
        .when((adi >= 1.32) & (cv2 < 0.49), F.lit("intermittent"))
        .otherwise(F.lit("lumpy"))
    )
    return g.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("nd").cast("long").alias("demand_days"),
        F.floor(adi * 10_000 + F.lit(_OFF)).cast("long").alias("adi_e4"),
        F.floor(cv2 * 10_000 + F.lit(_OFF)).cast("long").alias("cv2_e4"),
        cls.alias("pattern"),
    ).orderBy("cohort")


SQL_DEMAND_CLASS = f"""
WITH ev AS (
  SELECT user_id % 10 AS cohort, EXTRACT(day FROM ts) AS dom
  FROM events WHERE event_type = '{_ABS_TARGET}'
), daily AS (
  SELECT cohort, dom, count(*) AS d FROM ev GROUP BY 1, 2
), span AS (
  SELECT cohort, max(dom) - min(dom) + 1 AS span_days FROM ev GROUP BY 1
), g AS (
  SELECT daily.cohort, count(*) AS nd,
         CAST(sum(d) AS BIGINT) AS s,
         CAST(sum(d * d) AS BIGINT) AS ss,
         max(span_days) AS span_days
  FROM daily JOIN span ON span.cohort = daily.cohort
  GROUP BY 1
), f AS (
  SELECT cohort, nd,
         CAST(span_days AS DOUBLE) / nd AS adi,
         ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / nd) / nd)
           / ((CAST(s AS DOUBLE) / nd) ^ 2) AS cv2
  FROM g
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST(nd AS BIGINT) AS demand_days,
       CAST(floor(adi * 10000 + {_OFF}) AS BIGINT) AS adi_e4,
       CAST(floor(cv2 * 10000 + {_OFF}) AS BIGINT) AS cv2_e4,
       CASE WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
            WHEN adi < 1.32 AND cv2 >= 0.49 THEN 'erratic'
            WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
            ELSE 'lumpy' END AS pattern
FROM f ORDER BY cohort
"""


def q_safety_stock_rop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic (mu, sigma) safety stock at 95% cycle service (z =
    1.6449) with a 3-day lead time, from exact per-type daily demand
    counts: SS = z * sigma_d * sqrt(LT), ROP = mu_d * LT + SS."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.dayofmonth("ts").alias("dom")
    )
    daily = ev.groupBy("event_type", "dom").agg(
        F.count(F.lit(1)).alias("d")
    )
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("d").alias("s"),
        F.sum(F.col("d") * F.col("d")).alias("ss"),
    )
    nd = F.col("nd").cast("double")
    mu = F.col("s").cast("double") / nd
    sd = F.sqrt(
        (F.col("ss").cast("double") - nd * mu * mu) / (nd - 1.0)
    )
    ss95 = 1.6449 * sd * F.sqrt(F.lit(3.0))
    rop = mu * 3.0 + ss95
    return g.select(
        "event_type",
        F.floor(mu * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mu_daily_e4"
        ),
        F.floor(sd * 10_000 + F.lit(_OFF)).cast("long").alias(
            "sigma_daily_e4"
        ),
        F.floor(ss95 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "safety_stock_e4"
        ),
        F.floor(rop * 10_000 + F.lit(_OFF)).cast("long").alias(
            "reorder_point_e4"
        ),
    ).orderBy("event_type")


SQL_SAFETY = f"""
WITH ev AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom FROM events
), daily AS (
  SELECT event_type, dom, count(*) AS d FROM ev GROUP BY 1, 2
), g AS (
  SELECT event_type, count(*) AS nd,
         CAST(sum(d) AS BIGINT) AS s,
         CAST(sum(d * d) AS BIGINT) AS ss
  FROM daily GROUP BY 1
), f AS (
  SELECT event_type, nd,
         CAST(s AS DOUBLE) / nd AS mu,
         sqrt((ss - CAST(s AS DOUBLE) * s / nd) / (nd - 1.0)) AS sd
  FROM g
)
SELECT event_type,
       CAST(floor(mu * 10000 + {_OFF}) AS BIGINT) AS mu_daily_e4,
       CAST(floor(sd * 10000 + {_OFF}) AS BIGINT) AS sigma_daily_e4,
       CAST(floor(1.6449 * sd * sqrt(3.0) * 10000 + {_OFF}) AS BIGINT)
         AS safety_stock_e4,
       CAST(floor((mu * 3.0 + 1.6449 * sd * sqrt(3.0)) * 10000 + {_OFF})
            AS BIGINT) AS reorder_point_e4
FROM f ORDER BY event_type
"""


def q_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor optimal stock = the ceil(q*n)-th order statistic of
    daily demand at critical ratio q = cu/(cu+co) = 3/4 (underage 3,
    overage 1), exact by rank — no interpolation ambiguity."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.dayofmonth("ts").alias("dom")
    )
    daily = ev.groupBy("event_type", "dom").agg(
        F.count(F.lit(1)).alias("d")
    )
    w = Window.partitionBy("event_type").orderBy("d", "dom")
    r = daily.withColumn("rn", F.row_number().over(w))
    cnt = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("nd"))
    t = r.join(F.broadcast(cnt), "event_type").filter(
        F.col("rn") == F.ceil(F.col("nd").cast("double") * 0.75)
    )
    g = daily.groupBy("event_type").agg(
        F.sum("d").alias("s"), F.count(F.lit(1)).alias("nd")
    )
    return (
        t.select("event_type", F.col("d").alias("q75"))
        .join(g, "event_type")
        .select(
            "event_type",
            F.col("nd").cast("long").alias("n_days"),
            F.floor(
                F.col("s").cast("double") / F.col("nd").cast("double")
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("mean_daily"),
            F.col("q75").cast("long").alias("optimal_stock"),
        )
        .orderBy("event_type")
    )


SQL_NEWSVENDOR = f"""
WITH ev AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom FROM events
), daily AS (
  SELECT event_type, dom, count(*) AS d FROM ev GROUP BY 1, 2
), r AS (
  SELECT event_type, d,
         row_number() OVER (PARTITION BY event_type ORDER BY d, dom)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM daily
), pick AS (
  SELECT event_type, d AS q75
  FROM r WHERE rn = CAST(ceil(nd * 0.75) AS BIGINT)
), g AS (
  SELECT event_type, CAST(sum(d) AS BIGINT) AS s, count(*) AS nd
  FROM daily GROUP BY 1
)
SELECT pick.event_type,
       CAST(nd AS BIGINT) AS n_days,
       CAST(floor(CAST(s AS DOUBLE) / nd + {_OFF}) AS BIGINT)
         AS mean_daily,
       CAST(q75 AS BIGINT) AS optimal_stock
FROM pick JOIN g ON g.event_type = pick.event_type
ORDER BY pick.event_type
"""


QUERIES.update(
    {
        "absorbing_markov_time": q_absorbing_markov_time,
        "demand_classification": q_demand_classification,
        "safety_stock_rop": q_safety_stock_rop,
        "newsvendor_quantile": q_newsvendor_quantile,
    }
)

ORACLE_SQL.update(
    {
        "absorbing_markov_time": SQL_ABSORB,
        "demand_classification": SQL_DEMAND_CLASS,
        "safety_stock_rop": SQL_SAFETY,
        "newsvendor_quantile": SQL_NEWSVENDOR,
    }
)


# ---------------------------------------------------------------------------
# Panel econometrics battery 2 (completes the stats15 Hausman trio):
# Fama-MacBeth two-pass slopes, the between estimator, Mundlak's
# (1978) augmented regression, and one-regressor cluster-robust
# (CR1, clustered by user) standard errors vs the naive OLS SE.
# Regression: centi-value on hour-of-day.
# ---------------------------------------------------------------------------


def _panel16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "user_id",
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").cast("long").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("y"),
    )


_SQL_PANEL16 = f"""
  panel AS (
    SELECT event_type, user_id,
           EXTRACT(day FROM ts) AS dom,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS y
    FROM events
  )
"""


def q_fama_macbeth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fama-MacBeth (1973): cross-sectional OLS slope each day, then
    the time-series mean and SE of the 30 daily slopes.  Daily slopes
    are e6-floored integers so the second pass is exact."""
    p = _panel16(spark, sf_dir)
    d = p.groupBy("event_type", "dom").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    den = F.col("sxx").cast("double") - F.pow(
        F.col("sx").cast("double"), 2
    ) / nd
    d = d.filter(den > 0).select(
        "event_type",
        F.floor(num / den * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "b_e6"
        ),
    )
    # degenerate guard (sf0.001 sweep): a near-singular daily cross-
    # section (2-3 points, den ~ eps) yields astronomically scaled
    # slopes whose squares overflow the exact BIGINT second pass.  A
    # daily |slope| >= 500 (b_e6 >= 5e8) is a degenerate-fit artifact,
    # not a signal — drop it in BOTH engines (<= 31 days x (5e8)^2
    # stays inside int64).
    d = d.filter(F.abs(F.col("b_e6")) < 500_000_000)
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("b_e6").alias("sb"),
        F.sum(F.col("b_e6") * F.col("b_e6")).alias("sbb"),
    )
    td = F.col("t").cast("double")
    bbar = F.col("sb").cast("double") / td / 1e6
    varb = (
        F.col("sbb").cast("double") / 1e12
        - td * bbar * bbar
    ) / (td - 1.0)
    tstat = bbar / F.sqrt(varb / td)
    return g.filter(F.col("t") >= 2).select(
        "event_type",
        F.col("t").cast("long").alias("n_days"),
        F.floor(bbar * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "fm_slope_e6"
        ),
        # a zero slope variance (or t<2) leaves the t-stat undefined
        F.when(
            varb > 0,
            F.floor(tstat * 10_000 + F.lit(_OFF)).cast("long"),
        ).alias("fm_t_e4"),
    ).orderBy("event_type")


SQL_FM = f"""
WITH {_SQL_PANEL16}, d AS (
  SELECT event_type, dom, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM panel GROUP BY 1, 2
), slopes AS (
  SELECT event_type,
         CAST(floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) ^ 2 / n)
                    * 1000000 + {_OFF}) AS BIGINT) AS b_e6
  FROM d
  WHERE CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) ^ 2 / n > 0
), g AS (
  SELECT event_type, count(*) AS t,
         CAST(sum(b_e6) AS BIGINT) AS sb,
         CAST(sum(b_e6 * b_e6) AS BIGINT) AS sbb
  FROM slopes
  WHERE abs(b_e6) < 500000000  -- degenerate-fit guard, mirrors Spark
  GROUP BY 1
), f AS (
  SELECT event_type, t,
         CAST(sb AS DOUBLE) / t / 1e6 AS bbar,
         (CAST(sbb AS DOUBLE) / 1e12
          - t * (CAST(sb AS DOUBLE) / t / 1e6) ^ 2) / (t - 1.0) AS varb
  FROM g WHERE t >= 2
)
SELECT event_type,
       CAST(t AS BIGINT) AS n_days,
       CAST(floor(bbar * 1000000 + {_OFF}) AS BIGINT) AS fm_slope_e6,
       CAST(CASE WHEN varb > 0
            THEN floor(bbar / sqrt(varb / t) * 10000 + {_OFF})
            END AS BIGINT) AS fm_t_e4
FROM f ORDER BY event_type
"""


def q_panel_between_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between estimator: OLS on user means (e4-floored exact
    integers), the cross-sectional complement of the stats15 within
    estimator."""
    p = _panel16(spark, sf_dir)
    u = p.groupBy("event_type", "user_id").agg(
        F.floor(F.sum("x") * 10_000 / F.count(F.lit(1)))
        .cast("long")
        .alias("xb_e4"),
        F.floor(F.sum("y") * 10_000 / F.count(F.lit(1)))
        .cast("long")
        .alias("yb_e4"),
    )
    g = u.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xb_e4").alias("sx"),
        F.sum("yb_e4").alias("sy"),
        F.sum(F.col("xb_e4") * F.col("xb_e4")).alias("sxx"),
        F.sum(F.col("xb_e4") * F.col("yb_e4")).alias("sxy"),
        F.sum(F.col("yb_e4") * F.col("yb_e4")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxx_c = F.col("sxx").cast("double") - F.pow(
        F.col("sx").cast("double"), 2
    ) / nd
    sxy_c = F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double") / nd
    syy_c = F.col("syy").cast("double") - F.pow(
        F.col("sy").cast("double"), 2
    ) / nd
    b = sxy_c / sxx_c
    r2 = sxy_c * sxy_c / (sxx_c * syy_c)
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.floor(b * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "b_between_e6"
        ),
        F.floor(r2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "r2_between_e6"
        ),
    ).orderBy("event_type")


SQL_BETWEEN = f"""
WITH {_SQL_PANEL16}, u AS (
  SELECT event_type, user_id,
         CAST(floor(CAST(sum(x) AS DOUBLE) * 10000 / count(*)) AS BIGINT)
           AS xb_e4,
         CAST(floor(CAST(sum(y) AS DOUBLE) * 10000 / count(*)) AS BIGINT)
           AS yb_e4
  FROM panel GROUP BY 1, 2
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(xb_e4) AS BIGINT) AS sx,
         CAST(sum(yb_e4) AS BIGINT) AS sy,
         CAST(sum(xb_e4 * xb_e4) AS BIGINT) AS sxx,
         CAST(sum(xb_e4 * yb_e4) AS BIGINT) AS sxy,
         CAST(sum(yb_e4 * yb_e4) AS BIGINT) AS syy
  FROM u GROUP BY 1
), f AS (
  SELECT event_type, n,
         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS sxy_c,
         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) ^ 2 / n AS sxx_c,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) ^ 2 / n AS syy_c
  FROM g
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_users,
       CAST(floor(sxy_c / sxx_c * 1000000 + {_OFF}) AS BIGINT)
         AS b_between_e6,
       CAST(floor(sxy_c * sxy_c / (sxx_c * syy_c) * 1000000 + {_OFF})
            AS BIGINT) AS r2_between_e6
FROM f ORDER BY event_type
"""


def q_mundlak_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mundlak (1978) device: regress y on (x, user-mean-of-x); the
    coefficient on the group mean tests random- vs fixed-effects
    (gamma = b_between - b_within).  2x2 normal equations in closed
    form from exact centered moments."""
    p = _panel16(spark, sf_dir)
    um = p.groupBy("event_type", "user_id").agg(
        F.floor(F.sum("x") * 10_000 / F.count(F.lit(1)))
        .cast("long")
        .alias("xm_e4")
    )
    t = p.join(um, ["event_type", "user_id"]).select(
        "event_type",
        (F.col("x") * 10_000).alias("x1"),
        F.col("xm_e4").alias("x2"),
        F.col("y").alias("y"),
    )
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    nd = F.col("n").cast("double")
    c11 = F.col("s11").cast("double") - F.pow(
        F.col("s1").cast("double"), 2
    ) / nd
    c12 = F.col("s12").cast("double") - F.col("s1").cast(
        "double"
    ) * F.col("s2").cast("double") / nd
    c22 = F.col("s22").cast("double") - F.pow(
        F.col("s2").cast("double"), 2
    ) / nd
    c1y = F.col("s1y").cast("double") - F.col("s1").cast(
        "double"
    ) * F.col("sy").cast("double") / nd
    c2y = F.col("s2y").cast("double") - F.col("s2").cast(
        "double"
    ) * F.col("sy").cast("double") / nd
    det = c11 * c22 - c12 * c12
    beta = (c22 * c1y - c12 * c2y) / det
    gamma = (c11 * c2y - c12 * c1y) / det
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_obs"),
        F.floor(beta * 10_000 * 100 + F.lit(_OFF)).cast("long").alias(
            "beta_within_e6"
        ),
        F.floor(gamma * 10_000 * 100 + F.lit(_OFF)).cast("long").alias(
            "gamma_mundlak_e6"
        ),
    ).orderBy("event_type")


SQL_MUNDLAK = f"""
WITH {_SQL_PANEL16}, um AS (
  SELECT event_type, user_id,
         CAST(floor(CAST(sum(x) AS DOUBLE) * 10000 / count(*)) AS BIGINT)
           AS xm_e4
  FROM panel GROUP BY 1, 2
), t AS (
  SELECT panel.event_type, x * 10000 AS x1, xm_e4 AS x2, y
  FROM panel JOIN um ON um.event_type = panel.event_type
                    AND um.user_id = panel.user_id
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y
  FROM t GROUP BY 1
), c AS (
  SELECT event_type, n,
         CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) ^ 2 / n AS c11,
         CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS c12,
         CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) ^ 2 / n AS c22,
         CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS c1y,
         CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS c2y
  FROM g
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_obs,
       CAST(floor((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12)
                  * 10000 * 100 + {_OFF}) AS BIGINT) AS beta_within_e6,
       CAST(floor((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12)
                  * 10000 * 100 + {_OFF}) AS BIGINT) AS gamma_mundlak_e6
FROM c ORDER BY event_type
"""


def q_cluster_robust_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-regressor OLS of centi-value on hour with naive vs CR1
    user-clustered SEs (Liang-Zeger 1986; small-sample G/(G-1) *
    (N-1)/(N-2)).  Cluster score sums are exact integers because the
    residual numerator is carried unscaled: e_i = y - a - b x with
    a, b rationals applied per cluster via exact sums."""
    p = _panel16(spark, sf_dir)
    g = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxx_c = F.col("sxx").cast("double") - F.pow(
        F.col("sx").cast("double"), 2
    ) / nd
    sxy_c = F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double") / nd
    syy_c = F.col("syy").cast("double") - F.pow(
        F.col("sy").cast("double"), 2
    ) / nd
    stats = g.select(
        "event_type",
        "n",
        (F.col("sx").cast("double") / nd).alias("xbar"),
        (sxy_c / sxx_c).alias("b"),
        (
            (F.col("sy").cast("double") - sxy_c / sxx_c
             * F.col("sx").cast("double")) / nd
        ).alias("a"),
        sxx_c.alias("sxx_c"),
        ((syy_c - sxy_c * sxy_c / sxx_c) / (nd - 2.0)).alias("s2"),
    )
    t = p.join(F.broadcast(stats), "event_type")
    score = (
        (F.col("x").cast("double") - F.col("xbar"))
        * (
            F.col("y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("x").cast("double")
        )
    )
    cl = t.groupBy("event_type", "user_id").agg(
        F.sum(
            F.floor(score * 100 + F.lit(_OFF)).cast("long")
        ).alias("u_e2"),
        F.max("n").alias("n"),
        F.max("sxx_c").alias("sxx_c"),
        F.max("s2").alias("s2"),
    )
    out = cl.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("gn"),
        F.sum(F.col("u_e2") * F.col("u_e2")).alias("suu"),
        F.max("n").alias("n"),
        F.max("sxx_c").alias("sxx_c"),
        F.max("s2").alias("s2"),
    )
    gd = F.col("gn").cast("double")
    nd2 = F.col("n").cast("double")
    meat = F.col("suu").cast("double") / 1e4
    vcl = (
        gd / (gd - 1.0) * (nd2 - 1.0) / (nd2 - 2.0) * meat
        / F.pow(F.col("sxx_c"), 2)
    )
    se_naive = F.sqrt(F.col("s2") / F.col("sxx_c"))
    return out.select(
        "event_type",
        F.col("gn").cast("long").alias("n_clusters"),
        F.floor(se_naive * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "se_naive_e6"
        ),
        F.floor(F.sqrt(vcl) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("se_cluster_e6"),
        F.floor(F.sqrt(vcl) / se_naive * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("inflation_e4"),
    ).orderBy("event_type")


SQL_CRSE = f"""
WITH {_SQL_PANEL16}, g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM panel GROUP BY 1
), stats AS (
  SELECT event_type, n,
         CAST(sx AS DOUBLE) / n AS xbar,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) ^ 2 / n) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) ^ 2 / n) * sx)
           / n AS a,
         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) ^ 2 / n AS sxx_c,
         ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) ^ 2 / n)
          - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) ^ 2
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) ^ 2 / n))
           / (n - 2.0) AS s2
  FROM g
), cl AS (
  SELECT panel.event_type, user_id,
         CAST(sum(CAST(floor((x - xbar) * (y - a - b * x) * 100 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS u_e2,
         max(n) AS n, max(sxx_c) AS sxx_c, max(s2) AS s2
  FROM panel JOIN stats ON stats.event_type = panel.event_type
  GROUP BY 1, 2
), o AS (
  SELECT event_type, count(*) AS gn,
         CAST(sum(u_e2 * u_e2) AS BIGINT) AS suu,
         max(n) AS n, max(sxx_c) AS sxx_c, max(s2) AS s2
  FROM cl GROUP BY 1
), f AS (
  SELECT event_type, gn,
         sqrt(s2 / sxx_c) AS se_naive,
         sqrt(CAST(gn AS DOUBLE) / (gn - 1.0) * (n - 1.0) / (n - 2.0)
              * (CAST(suu AS DOUBLE) / 1e4) / (sxx_c * sxx_c)) AS se_cl
  FROM o
)
SELECT event_type,
       CAST(gn AS BIGINT) AS n_clusters,
       CAST(floor(se_naive * 1000000 + {_OFF}) AS BIGINT) AS se_naive_e6,
       CAST(floor(se_cl * 1000000 + {_OFF}) AS BIGINT) AS se_cluster_e6,
       CAST(floor(se_cl / se_naive * 10000 + {_OFF}) AS BIGINT)
         AS inflation_e4
FROM f ORDER BY event_type
"""


QUERIES.update(
    {
        "fama_macbeth": q_fama_macbeth,
        "panel_between_estimator": q_panel_between_estimator,
        "mundlak_test": q_mundlak_test,
        "cluster_robust_se": q_cluster_robust_se,
    }
)

ORACLE_SQL.update(
    {
        "fama_macbeth": SQL_FM,
        "panel_between_estimator": SQL_BETWEEN,
        "mundlak_test": SQL_MUNDLAK,
        "cluster_robust_se": SQL_CRSE,
    }
)


# ---------------------------------------------------------------------------
# Multiple-testing battery over the 24 per-hour mean tests within each
# event type.  The unlock is a shared erf twin (Abramowitz & Stegun
# 7.1.26, |err| < 1.5e-7) written verbatim in both engines — the same
# trick as the Lanczos lnGamma — giving identical normal-CDF p-values
# as e9 integers, on which Holm, Benjamini-Yekutieli, Storey's pi0,
# and Fisher's combined statistic (Wilson-Hilferty normalized) are
# exact integer programs.
# ---------------------------------------------------------------------------


def _erf(x):
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (
        t
        * (
            0.254829592
            + t
            * (
                -0.284496736
                + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
            )
        )
    )
    return 1.0 - poly * F.exp(-x * x)


def _erf_sql(x: str) -> str:
    t = f"(1.0 / (1.0 + 0.3275911 * ({x})))"
    return (
        f"(1.0 - {t} * (0.254829592 + {t} * (-0.284496736 + {t}"
        f" * (1.421413741 + {t} * (-1.453152027 + {t} * 1.061405429))))"
        f" * exp(-({x}) * ({x})))"
    )


def _hour_pvals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch z of each hour's mean vs the rest of the type, two-sided
    p as an e9 integer (floored at 1)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    h = ev.groupBy("event_type", "hh").agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("q1"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nt"),
        F.sum("v").alias("st"),
        F.sum(F.col("v") * F.col("v")).alias("qt"),
    )
    t = h.join(F.broadcast(g), "event_type")
    n1 = F.col("n1").cast("double")
    n2 = (F.col("nt") - F.col("n1")).cast("double")
    s2v = (F.col("st") - F.col("s1")).cast("double")
    q2v = (F.col("qt") - F.col("q1")).cast("double")
    m1 = F.col("s1").cast("double") / n1
    m2 = s2v / n2
    v1 = (F.col("q1").cast("double") - n1 * m1 * m1) / (n1 - 1.0)
    v2 = (q2v - n2 * m2 * m2) / (n2 - 1.0)
    z = (m1 - m2) / F.sqrt(v1 / n1 + v2 / n2)
    az = F.abs(z) / F.sqrt(F.lit(2.0))
    p = 1.0 - _erf(az)
    return t.select(
        "event_type",
        "hh",
        F.greatest(
            F.floor(p * 1e9 + F.lit(_OFF)).cast("long"), F.lit(1)
        ).alias("p_e9"),
    )


_SQL_HOUR_P = f"""
  ev AS (
    SELECT event_type, EXTRACT(hour FROM ts) AS hh,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
    FROM events
  ), h AS (
    SELECT event_type, hh, count(*) AS n1,
           CAST(sum(v) AS BIGINT) AS s1,
           CAST(sum(v * v) AS BIGINT) AS q1
    FROM ev GROUP BY 1, 2
  ), g AS (
    SELECT event_type, count(*) AS nt,
           CAST(sum(v) AS BIGINT) AS st,
           CAST(sum(v * v) AS BIGINT) AS qt
    FROM ev GROUP BY 1
  ), zsc AS (
    SELECT h.event_type, hh,
           (CAST(s1 AS DOUBLE) / n1 - CAST(st - s1 AS DOUBLE) / (nt - n1))
           / sqrt(
               ((CAST(q1 AS DOUBLE) - n1 * (CAST(s1 AS DOUBLE) / n1) ^ 2)
                / (n1 - 1.0)) / n1
               + ((CAST(qt - q1 AS DOUBLE)
                   - (nt - n1) * (CAST(st - s1 AS DOUBLE) / (nt - n1)) ^ 2)
                  / (nt - n1 - 1.0)) / (nt - n1)) AS z
    FROM h JOIN g ON g.event_type = h.event_type
  ), pv AS (
    SELECT event_type, hh,
           greatest(CAST(floor(
             (1.0 - {_erf_sql('abs(z) / sqrt(2.0)')}) * 1e9 + {_OFF})
             AS BIGINT), 1) AS p_e9
    FROM zsc
  )
"""


def q_holm_bonferroni_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _hour_pvals(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("p_e9", "hh")
    cnt = Window.partitionBy("event_type")
    t = p.withColumn("rn", F.row_number().over(w)).withColumn(
        "m", F.count(F.lit(1)).over(cnt)
    )
    alpha_num = F.lit(50_000_000)  # 0.05 * 1e9
    ok = F.col("p_e9") * (F.col("m") - F.col("rn") + 1) <= alpha_num
    t = t.withColumn("fail_rn", F.when(~ok, F.col("rn")))
    out = t.groupBy("event_type").agg(
        F.max("m").cast("long").alias("m_tests"),
        F.min("p_e9").cast("long").alias("min_p_e9"),
        (
            F.coalesce(F.min("fail_rn"), F.max("m") + 1) - 1
        ).cast("long").alias("holm_rejections"),
        F.sum(
            (F.col("p_e9") * F.col("m") <= alpha_num).cast("long")
        ).cast("long").alias("bonferroni_rejections"),
    )
    return out.orderBy("event_type")


SQL_HOLM = f"""
WITH {_SQL_HOUR_P}, r AS (
  SELECT event_type, hh, p_e9,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY p_e9, hh) AS rn,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM pv
)
SELECT event_type,
       CAST(max(m) AS BIGINT) AS m_tests,
       CAST(min(p_e9) AS BIGINT) AS min_p_e9,
       CAST(coalesce(min(CASE WHEN p_e9 * (m - rn + 1) > 50000000
                               THEN rn END), max(m) + 1) - 1 AS BIGINT)
         AS holm_rejections,
       CAST(sum(CASE WHEN p_e9 * m <= 50000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS bonferroni_rejections
FROM r GROUP BY 1 ORDER BY event_type
"""


def q_by_fdr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli (2001) FDR under arbitrary dependence:
    the BH step-up with the harmonic penalty c(m); the BH count is
    reported alongside.  The step-up max is the exact integer
    comparison p * m * cm_e9 <= rn * alpha * 1e9."""
    p = _hour_pvals(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("p_e9", "hh")
    cnt = Window.partitionBy("event_type")
    t = p.withColumn("rn", F.row_number().over(w)).withColumn(
        "m", F.count(F.lit(1)).over(cnt)
    )
    cm = t.groupBy("event_type").agg(
        F.sum(
            F.floor(1e9 / F.col("rn").cast("double") + F.lit(_OFF)).cast(
                "long"
            )
        ).alias("cm_e9")
    )
    t = t.join(F.broadcast(cm), "event_type")
    bh_ok = (
        F.col("p_e9").cast("double") * F.col("m").cast("double")
        <= F.col("rn").cast("double") * 5e7
    )
    by_ok = (
        F.col("p_e9").cast("double")
        * F.col("m").cast("double")
        * F.col("cm_e9").cast("double")
        <= F.col("rn").cast("double") * 5e7 * 1e9
    )
    out = t.groupBy("event_type").agg(
        F.max("m").cast("long").alias("m_tests"),
        F.coalesce(
            F.max(F.when(bh_ok, F.col("rn"))), F.lit(0)
        ).cast("long").alias("bh_rejections"),
        F.coalesce(
            F.max(F.when(by_ok, F.col("rn"))), F.lit(0)
        ).cast("long").alias("by_rejections"),
        F.floor(
            F.max("cm_e9").cast("double") / 1e5 + F.lit(_OFF)
        ).cast("long").alias("cm_e4"),
    )
    return out.orderBy("event_type")


SQL_BY = f"""
WITH {_SQL_HOUR_P}, r AS (
  SELECT event_type, hh, p_e9,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY p_e9, hh) AS rn,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM pv
), cm AS (
  SELECT event_type,
         CAST(sum(CAST(floor(1e9 / rn + {_OFF}) AS BIGINT)) AS BIGINT)
           AS cm_e9
  FROM r GROUP BY 1
)
SELECT r.event_type,
       CAST(max(m) AS BIGINT) AS m_tests,
       CAST(coalesce(max(CASE WHEN CAST(p_e9 AS DOUBLE) * m
                                   <= rn * 5e7 THEN rn END), 0) AS BIGINT)
         AS bh_rejections,
       CAST(coalesce(max(CASE WHEN CAST(p_e9 AS DOUBLE) * m
                                     * CAST(cm_e9 AS DOUBLE)
                                   <= rn * 5e7 * 1e9 THEN rn END), 0)
            AS BIGINT) AS by_rejections,
       CAST(floor(CAST(max(cm_e9) AS DOUBLE) / 1e5 + {_OFF}) AS BIGINT)
         AS cm_e4
FROM r JOIN cm ON cm.event_type = r.event_type
GROUP BY 1 ORDER BY r.event_type
"""


def q_storey_pi0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storey (2002) null-proportion estimate at lambda = 0.5:
    pi0 = #{p > 0.5} / ((1 - 0.5) m), clipped to 1; plus the
    implied q-value floor min(p) * m * pi0."""
    p = _hour_pvals(spark, sf_dir)
    g = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum((F.col("p_e9") > 500_000_000).cast("long")).alias("nbig"),
        F.min("p_e9").alias("minp"),
    )
    pi0 = F.least(
        F.col("nbig").cast("double")
        / (0.5 * F.col("m").cast("double")),
        F.lit(1.0),
    )
    return g.select(
        "event_type",
        F.col("m").cast("long").alias("m_tests"),
        F.col("nbig").cast("long").alias("n_p_gt_half"),
        F.floor(pi0 * 10_000 + F.lit(_OFF)).cast("long").alias("pi0_e4"),
        F.floor(
            F.least(
                F.col("minp").cast("double")
                * F.col("m").cast("double")
                * pi0,
                F.lit(1e9),
            )
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("min_q_e9"),
    ).orderBy("event_type")


SQL_STOREY = f"""
WITH {_SQL_HOUR_P}, agg AS (
  SELECT event_type, count(*) AS m,
         CAST(sum(CASE WHEN p_e9 > 500000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS nbig,
         CAST(min(p_e9) AS BIGINT) AS minp
  FROM pv GROUP BY 1
)
SELECT event_type,
       CAST(m AS BIGINT) AS m_tests,
       nbig AS n_p_gt_half,
       CAST(floor(least(nbig / (0.5 * m), 1.0) * 10000 + {_OFF})
            AS BIGINT) AS pi0_e4,
       CAST(floor(least(CAST(minp AS DOUBLE) * m
                        * least(nbig / (0.5 * m), 1.0), 1e9) + {_OFF})
            AS BIGINT) AS min_q_e9
FROM agg ORDER BY event_type
"""


def q_fisher_combined_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's combined probability X = -2 sum ln p over the 24 hour
    tests, with the Wilson-Hilferty cube-root normal approximation of
    the chi-square(2m) tail as the headline z."""
    p = _hour_pvals(spark, sf_dir)
    term = -2.0 * F.log(F.col("p_e9").cast("double") / 1e9)
    g = p.select(
        "event_type",
        F.floor(term * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "t_e6"
        ),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"), F.sum("t_e6").alias("sx")
    )
    x = F.col("sx").cast("double") / 1e6
    dfree = 2.0 * F.col("m").cast("double")
    wh = (
        (F.pow(x / dfree, 1.0 / 3.0) - (1.0 - 2.0 / (9.0 * dfree)))
        / F.sqrt(2.0 / (9.0 * dfree))
    )
    return g.select(
        "event_type",
        (2 * F.col("m")).cast("long").alias("df"),
        F.floor(x * 10_000 + F.lit(_OFF)).cast("long").alias(
            "fisher_x_e4"
        ),
        F.floor(wh * 10_000 + F.lit(_OFF)).cast("long").alias("wh_z_e4"),
    ).orderBy("event_type")


SQL_FISHER_META = f"""
WITH {_SQL_HOUR_P}, agg AS (
  SELECT event_type, count(*) AS m,
         CAST(sum(CAST(floor(-2.0 * ln(p_e9 / 1e9) * 1000000 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS sx
  FROM pv GROUP BY 1
), f AS (
  SELECT event_type, m, CAST(sx AS DOUBLE) / 1e6 AS x,
         2.0 * m AS dfree
  FROM agg
)
SELECT event_type,
       CAST(2 * m AS BIGINT) AS df,
       CAST(floor(x * 10000 + {_OFF}) AS BIGINT) AS fisher_x_e4,
       CAST(floor(((x / dfree) ^ (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * dfree)))
                  / sqrt(2.0 / (9.0 * dfree)) * 10000 + {_OFF}) AS BIGINT)
         AS wh_z_e4
FROM f ORDER BY event_type
"""


QUERIES.update(
    {
        "holm_bonferroni_audit": q_holm_bonferroni_audit,
        "by_fdr_audit": q_by_fdr_audit,
        "storey_pi0": q_storey_pi0,
        "fisher_combined_meta": q_fisher_combined_meta,
    }
)

ORACLE_SQL.update(
    {
        "holm_bonferroni_audit": SQL_HOLM,
        "by_fdr_audit": SQL_BY,
        "storey_pi0": SQL_STOREY,
        "fisher_combined_meta": SQL_FISHER_META,
    }
)
