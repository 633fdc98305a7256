"""Round-4 continuation registry (seventeenth battery): NORMAL-SCORES
rank tests — the classical nonparametric family that needs an inverse
normal CDF, which the registry could not express until now.  The
unlock is a shared probit twin (Acklam's rational approximation,
|rel err| < 1.15e-9) written verbatim in both engines, the same trick
as the Lanczos lnGamma (stats15) and the A&S erf (stats16).

Queries: van der Waerden two-sample (day vs night), van der Waerden
k-sample (day-of-week), Fligner-Killeen scale test, and the
Ryan-Joiner normality correlation (Blom scores).

Scale posture: NO per-row rank windows.  All ranks come from the
value-domain CDF trick (counts per (type, value) + a window over the
tiny distinct-value domain), so the only windows run over hundreds of
distinct centi-values per type, never over raw rows.  Ryan-Joiner
needs per-position Blom scores; positions are regenerated from the
rank blocks via sequence-explode (rows are produced map-side from the
collapsed domain — no global sort).

House exactness rules (CLAUDE.md): average ranks are carried as the
exact integer 2*rank_min + ties - 1; probit scores are floored to e6
BIGINTs before any aggregation, so cross-engine sums are exact-integer
and the final doubles are bit-identical under the 1/pi floor offset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Shared probit twin — Acklam's inverse-normal rational approximation.
# Identical double arithmetic in both engines; inputs are exact
# rationals built from integer ranks, so branch selection agrees.
# ---------------------------------------------------------------------------

_PA = (
    -3.969683028665376e01,
    2.209460984245205e02,
    -2.759285104469687e02,
    1.383577518672690e02,
    -3.066479806614716e01,
    2.506628277459239e00,
)
_PB = (
    -5.447609879822406e01,
    1.615858368580409e02,
    -1.556989798598866e02,
    6.680131188771972e01,
    -1.328068155288572e01,
)
_PC = (
    -7.784894002430293e-03,
    -3.223964580411365e-01,
    -2.400758277161838e00,
    -2.549732539343734e00,
    4.374664141464968e00,
    2.938163982698783e00,
)
_PD = (
    7.784695709041462e-03,
    3.224671290700398e-01,
    2.445134137142996e00,
    3.754408661907416e00,
)
_PLOW = 0.02425


def _probit_tail(q: Column) -> Column:
    num = (
        ((((_PC[0] * q + _PC[1]) * q + _PC[2]) * q + _PC[3]) * q + _PC[4]) * q
        + _PC[5]
    )
    den = (((_PD[0] * q + _PD[1]) * q + _PD[2]) * q + _PD[3]) * q + 1.0
    return num / den


def _probit(u: Column) -> Column:
    """Acklam inverse normal CDF of an exact-rational u in (0, 1)."""
    ql = F.sqrt(-2.0 * F.log(u))
    qu = F.sqrt(-2.0 * F.log(1.0 - u))
    q = u - 0.5
    r = q * q
    num = (
        ((((_PA[0] * r + _PA[1]) * r + _PA[2]) * r + _PA[3]) * r + _PA[4]) * r
        + _PA[5]
    ) * q
    den = ((((_PB[0] * r + _PB[1]) * r + _PB[2]) * r + _PB[3]) * r + _PB[4]) * r + 1.0
    return (
        F.when(u < _PLOW, _probit_tail(ql))
        .when(u > 1.0 - _PLOW, -_probit_tail(qu))
        .otherwise(num / den)
    )


def _probit_tail_sql(q: str) -> str:
    return (
        f"((((({_PC[0]!r} * {q} + {_PC[1]!r}) * {q} + {_PC[2]!r}) * {q}"
        f" + {_PC[3]!r}) * {q} + {_PC[4]!r}) * {q} + {_PC[5]!r})"
        f" / ((((({_PD[0]!r} * {q} + {_PD[1]!r}) * {q} + {_PD[2]!r}) * {q}"
        f" + {_PD[3]!r}) * {q} + 1.0))"
    )


def _probit_sql(u: str) -> str:
    ql = f"sqrt(-2.0 * ln({u}))"
    qu = f"sqrt(-2.0 * ln(1.0 - ({u})))"
    num = (
        f"((((({_PA[0]!r} * (({u}) - 0.5) * (({u}) - 0.5) + {_PA[1]!r})"
        f" * (({u}) - 0.5) * (({u}) - 0.5) + {_PA[2]!r})"
        f" * (({u}) - 0.5) * (({u}) - 0.5) + {_PA[3]!r})"
        f" * (({u}) - 0.5) * (({u}) - 0.5) + {_PA[4]!r})"
        f" * (({u}) - 0.5) * (({u}) - 0.5) + {_PA[5]!r}) * (({u}) - 0.5)"
    )
    den = (
        f"(((({_PB[0]!r} * (({u}) - 0.5) * (({u}) - 0.5) + {_PB[1]!r})"
        f" * (({u}) - 0.5) * (({u}) - 0.5) + {_PB[2]!r})"
        f" * (({u}) - 0.5) * (({u}) - 0.5) + {_PB[3]!r})"
        f" * (({u}) - 0.5) * (({u}) - 0.5) + {_PB[4]!r})"
        f" * (({u}) - 0.5) * (({u}) - 0.5) + 1.0"
    )
    return (
        f"(CASE WHEN ({u}) < {_PLOW!r} THEN {_probit_tail_sql(ql)}"
        f" WHEN ({u}) > 1.0 - {_PLOW!r} THEN -({_probit_tail_sql(qu)})"
        f" ELSE ({num}) / ({den}) END)"
    )


# ---------------------------------------------------------------------------
# Value-domain scaffold: counts per (event_type, dow, is_day, v) — the
# whole rank machinery runs over this collapsed domain, never raw rows.
# ---------------------------------------------------------------------------


def _typed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        (
            (F.hour("ts") >= 6) & (F.hour("ts") < 18)
        ).cast("long").alias("is_day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    return ev.groupBy("event_type", "dow", "is_day", "v").agg(
        F.count(F.lit(1)).alias("cnt")
    )


_SQL_COUNTS = f"""
  c0 AS (
    SELECT event_type,
           dayofweek(ts) + 1 AS dow,
           CASE WHEN EXTRACT(hour FROM ts) >= 6
                 AND EXTRACT(hour FROM ts) < 18 THEN 1 ELSE 0 END AS is_day,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
           count(*) AS cnt
    FROM events GROUP BY 1, 2, 3, 4
  )
"""


def _ranked_values(c0: DataFrame) -> DataFrame:
    """Per (event_type, v): tie count, doubled average rank
    r2 = 2*rank_min + ties - 1, and the type total n — all exact ints,
    windowed over the distinct-value domain only."""
    cv = c0.groupBy("event_type", "v").agg(F.sum("cnt").alias("tcnt"))
    wo = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    return (
        cv.withColumn("cum", F.sum("tcnt").over(wo))
        .withColumn("r2", 2 * F.col("cum") - F.col("tcnt") + 1)
        .withColumn("n", F.sum("tcnt").over(wn))
    )


_SQL_RANKED = """
  cv AS (
    SELECT event_type, v, CAST(sum(cnt) AS BIGINT) AS tcnt
    FROM c0 GROUP BY 1, 2
  ), rv AS (
    SELECT event_type, v, tcnt,
           2 * CAST(sum(tcnt) OVER (PARTITION BY event_type ORDER BY v)
                    AS BIGINT) - tcnt + 1 AS r2,
           CAST(sum(tcnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM cv
  )
"""


# ---------------------------------------------------------------------------
# van_der_waerden — two-sample normal-scores test, day vs night
# (van der Waerden 1952).  s_i = probit(avg_rank/(n+1)); with average
# ranks the tie-corrected statistic is
#   z = (T1 - n1*sbar) / sqrt(n1 n2 / (n (n-1)) * sum (s_i - sbar)^2)
# where T1 sums day scores.  Scores floored to e6 per DISTINCT value.
# ---------------------------------------------------------------------------


def q_van_der_waerden(spark: SparkSession, sf_dir: str) -> DataFrame:
    c0 = _typed_counts(spark, sf_dir)
    rv = _ranked_values(c0).withColumn(
        "s_e6",
        F.floor(
            _probit(F.col("r2").cast("double") / (2.0 * (F.col("n") + 1)))
            * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    per_grp = (
        c0.groupBy("event_type", "v", "is_day")
        .agg(F.sum("cnt").alias("gcnt"))
        .join(rv.select("event_type", "v", "s_e6", "n"), ["event_type", "v"])
    )
    agg = per_grp.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("is_day") == 1, F.col("gcnt")).otherwise(0)).alias(
            "n1"
        ),
        F.sum(
            F.when(F.col("is_day") == 1, F.col("gcnt") * F.col("s_e6")).otherwise(
                0
            )
        ).alias("t1"),
        F.sum(F.col("gcnt") * F.col("s_e6")).alias("st"),
        F.sum(F.col("gcnt") * F.col("s_e6") * F.col("s_e6")).alias("sq"),
    )
    n = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    n2 = n - n1
    st = F.col("st").cast("double")
    varsum = F.col("sq").cast("double") - st * st / n
    z = (F.col("t1").cast("double") - n1 * st / n) / F.sqrt(
        n1 * n2 / (n * (n - 1.0)) * varsum
    )
    return agg.select(
        "event_type",
        F.col("n1").cast("long").alias("n1"),
        (F.col("n") - F.col("n1")).cast("long").alias("n2"),
        F.col("t1").cast("long").alias("t1_e6"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


SQL_VDW = f"""
WITH {_SQL_COUNTS}, {_SQL_RANKED}, sc AS (
  SELECT event_type, v, n,
         CAST(floor({_probit_sql("CAST(r2 AS DOUBLE) / (2.0 * (n + 1))")}
                    * 1000000 + {_OFF}) AS BIGINT) AS s_e6
  FROM rv
), pg AS (
  SELECT c.event_type, c.v, c.is_day,
         CAST(sum(cnt) AS BIGINT) AS gcnt
  FROM c0 c GROUP BY 1, 2, 3
), agg AS (
  SELECT pg.event_type,
         CAST(max(n) AS BIGINT) AS n,
         CAST(sum(CASE WHEN is_day = 1 THEN gcnt ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN is_day = 1 THEN gcnt * s_e6 ELSE 0 END)
              AS BIGINT) AS t1,
         CAST(sum(gcnt * s_e6) AS BIGINT) AS st,
         CAST(sum(gcnt * s_e6 * s_e6) AS BIGINT) AS sq
  FROM pg JOIN sc ON sc.event_type = pg.event_type AND sc.v = pg.v
  GROUP BY 1
)
SELECT event_type, n1, n - n1 AS n2, t1 AS t1_e6,
       CAST(floor(
         (CAST(t1 AS DOUBLE)
          - CAST(n1 AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(n1 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE))
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                * (CAST(sq AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                     / CAST(n AS DOUBLE)))
         * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# waerden_ksample — k-sample normal-scores test across day-of-week
# (Conover 1999 §5.10): X2 = (n-1) * (sum_g S_g^2/n_g - ST^2/n)
#                             / (SQ - ST^2/n),  df = k-1.
# ---------------------------------------------------------------------------


def q_waerden_ksample(spark: SparkSession, sf_dir: str) -> DataFrame:
    c0 = _typed_counts(spark, sf_dir)
    rv = _ranked_values(c0).withColumn(
        "s_e6",
        F.floor(
            _probit(F.col("r2").cast("double") / (2.0 * (F.col("n") + 1)))
            * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    per_grp = (
        c0.groupBy("event_type", "v", "dow")
        .agg(F.sum("cnt").alias("gcnt"))
        .join(rv.select("event_type", "v", "s_e6", "n"), ["event_type", "v"])
    )
    grp = per_grp.groupBy("event_type", "dow").agg(
        F.max("n").alias("n"),
        F.sum("gcnt").alias("ng"),
        F.sum(F.col("gcnt") * F.col("s_e6")).alias("sg"),
        F.sum(F.col("gcnt") * F.col("s_e6") * F.col("s_e6")).alias("qg"),
    )
    agg = grp.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.col("sg").cast("double")
            * F.col("sg").cast("double")
            / F.col("ng").cast("double")
        ).alias("ssg"),
        F.sum("sg").alias("st"),
        F.sum("qg").alias("sq"),
    )
    n = F.col("n").cast("double")
    st = F.col("st").cast("double")
    varsum = F.col("sq").cast("double") - st * st / n
    x2 = (n - 1.0) * (F.col("ssg") - st * st / n) / varsum
    return agg.select(
        "event_type",
        (F.col("k") - 1).cast("long").alias("df"),
        F.floor(x2 * 10_000 + F.lit(_OFF)).cast("long").alias("x2_e4"),
    ).orderBy("event_type")


SQL_VDW_K = f"""
WITH {_SQL_COUNTS}, {_SQL_RANKED}, sc AS (
  SELECT event_type, v, n,
         CAST(floor({_probit_sql("CAST(r2 AS DOUBLE) / (2.0 * (n + 1))")}
                    * 1000000 + {_OFF}) AS BIGINT) AS s_e6
  FROM rv
), pg AS (
  SELECT c.event_type, c.v, c.dow, CAST(sum(cnt) AS BIGINT) AS gcnt
  FROM c0 c GROUP BY 1, 2, 3
), grp AS (
  SELECT pg.event_type, dow,
         CAST(max(n) AS BIGINT) AS n,
         CAST(sum(gcnt) AS BIGINT) AS ng,
         CAST(sum(gcnt * s_e6) AS BIGINT) AS sg,
         CAST(sum(gcnt * s_e6 * s_e6) AS BIGINT) AS qg
  FROM pg JOIN sc ON sc.event_type = pg.event_type AND sc.v = pg.v
  GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n,
         count(*) AS k,
         sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
           AS ssg,
         CAST(sum(sg) AS BIGINT) AS st,
         CAST(sum(qg) AS BIGINT) AS sq
  FROM grp GROUP BY 1
)
SELECT event_type,
       CAST(k - 1 AS BIGINT) AS df,
       CAST(floor(
         (CAST(n AS DOUBLE) - 1.0)
         * (ssg - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(sq AS DOUBLE)
            - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
         * 10000 + {_OFF}) AS BIGINT) AS x2_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# fligner_killeen — k-sample scale test across day-of-week (Fligner &
# Killeen 1976; Conover/Johnson/Johnson 1981 normal-scores form).
# a_i = |v - lower-median(group)|, scores probit(1/2 + avgrank/(2(n+1)))
# on the POOLED a within type; same quadratic form as waerden_ksample.
# The group lower-median comes from the value-domain CDF (2*cum >= n_g).
# ---------------------------------------------------------------------------


def q_fligner_killeen(spark: SparkSession, sf_dir: str) -> DataFrame:
    c0 = (
        _typed_counts(spark, sf_dir)
        .groupBy("event_type", "dow", "v")
        .agg(F.sum("cnt").alias("cnt"))
    )
    wg = Window.partitionBy("event_type", "dow").orderBy("v")
    wng = Window.partitionBy("event_type", "dow")
    med = (
        c0.withColumn("cum", F.sum("cnt").over(wg))
        .withColumn("ng", F.sum("cnt").over(wng))
        .filter(2 * F.col("cum") >= F.col("ng"))
        .groupBy("event_type", "dow")
        .agg(F.min("v").alias("med"))
    )
    av = c0.join(med, ["event_type", "dow"]).select(
        "event_type",
        "dow",
        F.abs(F.col("v") - F.col("med")).alias("a"),
        "cnt",
    )
    ca = av.groupBy("event_type", "a").agg(F.sum("cnt").alias("tcnt"))
    wo = Window.partitionBy("event_type").orderBy("a")
    wn = Window.partitionBy("event_type")
    sc = (
        ca.withColumn("cum", F.sum("tcnt").over(wo))
        .withColumn("r2", 2 * F.col("cum") - F.col("tcnt") + 1)
        .withColumn("n", F.sum("tcnt").over(wn))
        .withColumn(
            "s_e6",
            F.floor(
                _probit(
                    0.5 + F.col("r2").cast("double") / (4.0 * (F.col("n") + 1))
                )
                * 1_000_000
                + F.lit(_OFF)
            ).cast("long"),
        )
    )
    per_grp = (
        av.groupBy("event_type", "a", "dow")
        .agg(F.sum("cnt").alias("gcnt"))
        .join(sc.select("event_type", "a", "s_e6", "n"), ["event_type", "a"])
    )
    grp = per_grp.groupBy("event_type", "dow").agg(
        F.max("n").alias("n"),
        F.sum("gcnt").alias("ng"),
        F.sum(F.col("gcnt") * F.col("s_e6")).alias("sg"),
        F.sum(F.col("gcnt") * F.col("s_e6") * F.col("s_e6")).alias("qg"),
    )
    agg = grp.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.col("sg").cast("double")
            * F.col("sg").cast("double")
            / F.col("ng").cast("double")
        ).alias("ssg"),
        F.sum("sg").alias("st"),
        F.sum("qg").alias("sq"),
    )
    n = F.col("n").cast("double")
    st = F.col("st").cast("double")
    varsum = F.col("sq").cast("double") - st * st / n
    x2 = (n - 1.0) * (F.col("ssg") - st * st / n) / varsum
    return agg.select(
        "event_type",
        (F.col("k") - 1).cast("long").alias("df"),
        F.floor(x2 * 10_000 + F.lit(_OFF)).cast("long").alias("x2_e4"),
    ).orderBy("event_type")


SQL_FLIGNER = f"""
WITH {_SQL_COUNTS}, cg AS (
  SELECT event_type, dow, v, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM c0 GROUP BY 1, 2, 3
), med AS (
  SELECT event_type, dow, CAST(min(v) AS BIGINT) AS med FROM (
    SELECT event_type, dow, v,
           CAST(sum(cnt) OVER (PARTITION BY event_type, dow ORDER BY v)
                AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY event_type, dow) AS BIGINT) AS ng
    FROM cg
  ) WHERE 2 * cum >= ng GROUP BY 1, 2
), av AS (
  SELECT cg.event_type, cg.dow, abs(v - med) AS a, cnt
  FROM cg JOIN med ON med.event_type = cg.event_type AND med.dow = cg.dow
), ca AS (
  SELECT event_type, a, CAST(sum(cnt) AS BIGINT) AS tcnt
  FROM av GROUP BY 1, 2
), rv AS (
  SELECT event_type, a, tcnt,
         2 * CAST(sum(tcnt) OVER (PARTITION BY event_type ORDER BY a)
                  AS BIGINT) - tcnt + 1 AS r2,
         CAST(sum(tcnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM ca
), sc AS (
  SELECT event_type, a, n,
         CAST(floor(
           {_probit_sql("0.5 + CAST(r2 AS DOUBLE) / (4.0 * (n + 1))")}
           * 1000000 + {_OFF}) AS BIGINT) AS s_e6
  FROM rv
), pg AS (
  SELECT event_type, a, dow, CAST(sum(cnt) AS BIGINT) AS gcnt
  FROM av GROUP BY 1, 2, 3
), grp AS (
  SELECT pg.event_type, dow,
         CAST(max(n) AS BIGINT) AS n,
         CAST(sum(gcnt) AS BIGINT) AS ng,
         CAST(sum(gcnt * s_e6) AS BIGINT) AS sg,
         CAST(sum(gcnt * s_e6 * s_e6) AS BIGINT) AS qg
  FROM pg JOIN sc ON sc.event_type = pg.event_type AND sc.a = pg.a
  GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n,
         count(*) AS k,
         sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
           AS ssg,
         CAST(sum(sg) AS BIGINT) AS st,
         CAST(sum(qg) AS BIGINT) AS sq
  FROM grp GROUP BY 1
)
SELECT event_type,
       CAST(k - 1 AS BIGINT) AS df,
       CAST(floor(
         (CAST(n AS DOUBLE) - 1.0)
         * (ssg - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(sq AS DOUBLE)
            - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
         * 10000 + {_OFF}) AS BIGINT) AS x2_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ryan_joiner — normality correlation (Ryan & Joiner 1976): Pearson r
# between the order statistics and Blom normal scores
# b_i = probit((i - 3/8)/(n + 1/4)).  Positions i are regenerated from
# the collapsed (type, v) rank blocks via sequence-explode; the per-
# block sum of b_i is invariant to tie order since v is constant
# within a block.
# ---------------------------------------------------------------------------


def q_ryan_joiner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c0 = _typed_counts(spark, sf_dir)
    cv = c0.groupBy("event_type", "v").agg(F.sum("cnt").alias("tcnt"))
    wo = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    rv = (
        cv.withColumn("cum", F.sum("tcnt").over(wo))
        .withColumn("n", F.sum("tcnt").over(wn))
        .withColumn("lo", F.col("cum") - F.col("tcnt") + 1)
    )
    ex = rv.select(
        "event_type",
        "v",
        "n",
        F.explode(F.sequence(F.col("lo"), F.col("cum"))).alias("i"),
    ).withColumn(
        "b_e6",
        F.floor(
            _probit((F.col("i") - 0.375) / (F.col("n") + 0.25)) * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    agg = ex.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("sv2"),
        F.sum("b_e6").alias("sb"),
        F.sum(F.col("b_e6") * F.col("b_e6")).alias("sb2"),
        F.sum(F.col("v") * F.col("b_e6")).alias("svb"),
    )
    n = F.col("n").cast("double")
    sv = F.col("sv").cast("double")
    sb = F.col("sb").cast("double")
    r = (n * F.col("svb").cast("double") - sv * sb) / F.sqrt(
        (n * F.col("sv2").cast("double") - sv * sv)
        * (n * F.col("sb2").cast("double") - sb * sb)
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias("rj_r_e6"),
    ).orderBy("event_type")


SQL_RYAN_JOINER = f"""
WITH {_SQL_COUNTS}, cv AS (
  SELECT event_type, v, CAST(sum(cnt) AS BIGINT) AS tcnt
  FROM c0 GROUP BY 1, 2
), rv AS (
  SELECT event_type, v, tcnt,
         CAST(sum(tcnt) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) AS cum,
         CAST(sum(tcnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM cv
), ex AS (
  SELECT event_type, v, n, unnest(generate_series(cum - tcnt + 1, cum)) AS i
  FROM rv
), sc AS (
  SELECT event_type, v,
         CAST(floor({_probit_sql("(i - 0.375) / (n + 0.25)")}
                    * 1000000 + {_OFF}) AS BIGINT) AS b_e6
  FROM ex
), agg AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(v * v) AS BIGINT) AS sv2,
         CAST(sum(b_e6) AS BIGINT) AS sb,
         CAST(sum(b_e6 * b_e6) AS BIGINT) AS sb2,
         CAST(sum(v * b_e6) AS BIGINT) AS svb
  FROM sc GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(
         (n * CAST(svb AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sb AS DOUBLE))
         / sqrt((n * CAST(sv2 AS DOUBLE)
                 - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
                * (n * CAST(sb2 AS DOUBLE)
                   - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
         * 1000000 + {_OFF}) AS BIGINT) AS rj_r_e6
FROM agg ORDER BY event_type
"""


QUERIES.update(
    {
        "van_der_waerden": q_van_der_waerden,
        "waerden_ksample": q_waerden_ksample,
        "fligner_killeen": q_fligner_killeen,
        "ryan_joiner": q_ryan_joiner,
    }
)

ORACLE_SQL.update(
    {
        "van_der_waerden": SQL_VDW,
        "waerden_ksample": SQL_VDW_K,
        "fligner_killeen": SQL_FLIGNER,
        "ryan_joiner": SQL_RYAN_JOINER,
    }
)


# ===========================================================================
# Battery B: one-sample normality GoF — Lilliefors KS, Anderson-Darling,
# Cramer-von Mises, Watson U^2 — via the shared erf twin (stats16).
# All rank-position sums are collapsed to exact integer block moments
# over the distinct-value domain:
#   sum(2i-1)   over a tie block = cum^2 - (cum-tcnt)^2
#   sum(2i-1)^2 over a tie block = (g(cum) - g(cum-tcnt)) / 3,
#                                  g(h) = 4h^3 - h  (3*m2 stays integer)
# so no per-row work and no per-row windows exist anywhere.
# ===========================================================================

from diive_spark.queries_stats16 import _erf, _erf_sql  # noqa: E402


def _phi_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, v): tie count, cumulative count, type total n,
    and the standard-normal CDF of the standardized value as a clamped
    e9 integer (sample mean/sd from exact integer moments)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cv = ev.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("tcnt"))
    wo = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    d = (
        cv.withColumn("cum", F.sum("tcnt").over(wo))
        .withColumn("n", F.sum("tcnt").over(wn))
        .withColumn("sv", F.sum(F.col("tcnt") * F.col("v")).over(wn))
        .withColumn(
            "sv2", F.sum(F.col("tcnt") * F.col("v") * F.col("v")).over(wn)
        )
    )
    n = F.col("n").cast("double")
    mean = F.col("sv").cast("double") / n
    sd = F.sqrt(
        (F.col("sv2").cast("double") - F.col("sv").cast("double") * mean)
        / (n - 1.0)
    )
    z = (F.col("v") - mean) / sd
    phi = 0.5 * (
        1.0
        + F.when(z >= 0, _erf(z / F.sqrt(F.lit(2.0)))).otherwise(
            -_erf(-z / F.sqrt(F.lit(2.0)))
        )
    )
    return d.select(
        "event_type",
        "v",
        "tcnt",
        "cum",
        "n",
        F.greatest(
            F.lit(1),
            F.least(
                F.floor(phi * 1e9 + F.lit(_OFF)).cast("long"),
                F.lit(999_999_999),
            ),
        ).alias("f_e9"),
    )


_PHI_Z = (
    "((v - CAST(sv AS DOUBLE) / n)"
    " / sqrt((CAST(sv2 AS DOUBLE)"
    "         - CAST(sv AS DOUBLE) * (CAST(sv AS DOUBLE) / n)) / (n - 1.0)))"
)
_SQL_PHI = f"""
  ev AS (
    SELECT event_type,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
    FROM events
  ), cv AS (
    SELECT event_type, v, count(*) AS tcnt FROM ev GROUP BY 1, 2
  ), cw AS (
    SELECT event_type, v, tcnt,
           CAST(sum(tcnt) OVER (PARTITION BY event_type ORDER BY v)
                AS BIGINT) AS cum,
           CAST(sum(tcnt) OVER (PARTITION BY event_type) AS BIGINT) AS n,
           CAST(sum(tcnt * v) OVER (PARTITION BY event_type) AS BIGINT) AS sv,
           CAST(sum(tcnt * v * v) OVER (PARTITION BY event_type)
                AS BIGINT) AS sv2
    FROM cv
  ), pb AS (
    SELECT event_type, v, tcnt, cum, n,
           greatest(1, least(CAST(floor(
             0.5 * (1.0 + (CASE WHEN {_PHI_Z} >= 0
                    THEN {_erf_sql(f"{_PHI_Z} / sqrt(2.0)")}
                    ELSE -({_erf_sql(f"-{_PHI_Z} / sqrt(2.0)")}) END))
             * 1e9 + {_OFF}) AS BIGINT), 999999999)) AS f_e9
    FROM cw
  )
"""


# ---------------------------------------------------------------------------
# lilliefors — KS distance to the FITTED normal (Lilliefors 1967).
# D = max_i max(i/n - F_i, F_i - (i-1)/n); per tie block the extremes
# are at i = cum and i = cum - tcnt + 1, so the max is exact per block.
# ---------------------------------------------------------------------------


def q_lilliefors(spark: SparkSession, sf_dir: str) -> DataFrame:
    pb = _phi_blocks(spark, sf_dir)
    f = F.col("f_e9").cast("double") / 1e9
    dterm = F.greatest(
        F.col("cum").cast("double") / F.col("n") - f,
        f - (F.col("cum") - F.col("tcnt")).cast("double") / F.col("n"),
    )
    agg = pb.groupBy("event_type").agg(
        F.max("n").alias("n"), F.max(dterm).alias("d")
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("d") * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "d_e6"
        ),
        F.floor(
            F.sqrt(F.col("n").cast("double")) * F.col("d") * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("ks_e4"),
    ).orderBy("event_type")


SQL_LILLIEFORS = f"""
WITH {_SQL_PHI}, agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         max(greatest(
           CAST(cum AS DOUBLE) / n - CAST(f_e9 AS DOUBLE) / 1e9,
           CAST(f_e9 AS DOUBLE) / 1e9 - CAST(cum - tcnt AS DOUBLE) / n)) AS d
  FROM pb GROUP BY 1
)
SELECT event_type, n,
       CAST(floor(d * 1000000 + {_OFF}) AS BIGINT) AS d_e6,
       CAST(floor(sqrt(CAST(n AS DOUBLE)) * d * 10000 + {_OFF})
            AS BIGINT) AS ks_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ad_normality — one-sample Anderson-Darling vs the fitted normal
# (Anderson & Darling 1954; Stephens 1974 case 3):
#   A2 = -n - (1/n) sum_i [(2i-1) ln F_i + (2(n-i)+1) ln(1-F_i)]
# Block weights are the exact integer moments above; F constant within
# a block makes the per-block contribution exact.
# ---------------------------------------------------------------------------


def q_ad_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    pb = _phi_blocks(spark, sf_dir)
    lo1 = F.col("cum") - F.col("tcnt")  # lo - 1
    w1 = F.col("cum") * F.col("cum") - lo1 * lo1
    # sum over block of (2(n-i)+1) = tcnt*(2n+1) - 2*sum(i)
    w2 = F.col("tcnt") * (2 * F.col("n") + 1) - (
        F.col("cum") * (F.col("cum") + 1) - lo1 * (lo1 + 1)
    )
    lnf = F.log(F.col("f_e9").cast("double") / 1e9)
    ln1mf = F.log(1.0 - F.col("f_e9").cast("double") / 1e9)
    agg = pb.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(
            F.floor(
                (w1.cast("double") * lnf + w2.cast("double") * ln1mf) * 1_000
                + F.lit(_OFF)
            ).cast("long")
        ).alias("s_e3"),
    )
    n = F.col("n").cast("double")
    a2 = -n - F.col("s_e3").cast("double") / 1_000.0 / n
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(a2 * 10_000 + F.lit(_OFF)).cast("long").alias("a2_e4"),
    ).orderBy("event_type")


SQL_AD_NORM = f"""
WITH {_SQL_PHI}, terms AS (
  SELECT event_type, n,
         CAST(floor(
           (CAST(cum * cum - (cum - tcnt) * (cum - tcnt) AS DOUBLE)
              * ln(CAST(f_e9 AS DOUBLE) / 1e9)
            + CAST(tcnt * (2 * n + 1)
                   - (cum * (cum + 1) - (cum - tcnt) * (cum - tcnt + 1))
                   AS DOUBLE)
              * ln(1.0 - CAST(f_e9 AS DOUBLE) / 1e9)) * 1000 + {_OFF})
           AS BIGINT) AS t_e3
  FROM pb
), agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(t_e3) AS BIGINT) AS s_e3
  FROM terms GROUP BY 1
)
SELECT event_type, n,
       CAST(floor((-CAST(n AS DOUBLE)
                   - CAST(s_e3 AS DOUBLE) / 1000.0 / CAST(n AS DOUBLE))
                  * 10000 + {_OFF}) AS BIGINT) AS a2_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cvm_normality — Cramer-von Mises W^2 vs the fitted normal:
#   W2 = 1/(12n) + sum_i (F_i - (2i-1)/(2n))^2
# Per block: tcnt*F^2 - w1*F/n + (3*m2)/3 / (4n^2), with
# 3*m2 = g(cum) - g(cum-tcnt), g(h) = 4h^3 - h (exact integer).
# ---------------------------------------------------------------------------


def q_cvm_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    pb = _phi_blocks(spark, sf_dir)
    lo1 = F.col("cum") - F.col("tcnt")
    w1 = F.col("cum") * F.col("cum") - lo1 * lo1
    m2x3 = (
        4 * F.col("cum") * F.col("cum") * F.col("cum")
        - F.col("cum")
        - (4 * lo1 * lo1 * lo1 - lo1)
    )
    f = F.col("f_e9").cast("double") / 1e9
    n = F.col("n").cast("double")
    term = (
        F.col("tcnt").cast("double") * f * f
        - w1.cast("double") * f / n
        + m2x3.cast("double") / 3.0 / (4.0 * n * n)
    )
    agg = pb.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(
            F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
        ).alias("s_e9"),
    )
    w2 = (
        1.0 / (12.0 * F.col("n").cast("double"))
        + F.col("s_e9").cast("double") / 1e9
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(w2 * 1_000_000 + F.lit(_OFF)).cast("long").alias("w2_e6"),
    ).orderBy("event_type")


_SQL_CVM_TERMS = f"""
  terms AS (
    SELECT event_type, n, tcnt, f_e9,
           CAST(floor(
             (CAST(tcnt AS DOUBLE) * (CAST(f_e9 AS DOUBLE) / 1e9)
                * (CAST(f_e9 AS DOUBLE) / 1e9)
              - CAST(cum * cum - (cum - tcnt) * (cum - tcnt) AS DOUBLE)
                * (CAST(f_e9 AS DOUBLE) / 1e9) / CAST(n AS DOUBLE)
              + CAST(4 * cum * cum * cum - cum
                     - (4 * (cum - tcnt) * (cum - tcnt) * (cum - tcnt)
                        - (cum - tcnt)) AS DOUBLE)
                / 3.0 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             * 1e9 + {_OFF}) AS BIGINT) AS t_e9
    FROM pb
  )
"""

SQL_CVM_NORM = f"""
WITH {_SQL_PHI}, {_SQL_CVM_TERMS}, agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(t_e9) AS BIGINT) AS s_e9
  FROM terms GROUP BY 1
)
SELECT event_type, n,
       CAST(floor((1.0 / (12.0 * CAST(n AS DOUBLE))
                   + CAST(s_e9 AS DOUBLE) / 1e9) * 1000000 + {_OFF})
            AS BIGINT) AS w2_e6
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# watson_normality — Watson's U^2 (1961): the rotation-invariant CvM,
#   U2 = W2 - n (Fbar - 1/2)^2,  Fbar = (1/n) sum_i F_i
# Fbar comes exact from sum(tcnt * f_e9).
# ---------------------------------------------------------------------------


def q_watson_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    pb = _phi_blocks(spark, sf_dir)
    lo1 = F.col("cum") - F.col("tcnt")
    w1 = F.col("cum") * F.col("cum") - lo1 * lo1
    m2x3 = (
        4 * F.col("cum") * F.col("cum") * F.col("cum")
        - F.col("cum")
        - (4 * lo1 * lo1 * lo1 - lo1)
    )
    f = F.col("f_e9").cast("double") / 1e9
    n = F.col("n").cast("double")
    term = (
        F.col("tcnt").cast("double") * f * f
        - w1.cast("double") * f / n
        + m2x3.cast("double") / 3.0 / (4.0 * n * n)
    )
    agg = pb.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.floor(term * 1e9 + F.lit(_OFF)).cast("long")).alias("s_e9"),
        F.sum(F.col("tcnt") * F.col("f_e9")).alias("fb"),
    )
    nn = F.col("n").cast("double")
    w2 = 1.0 / (12.0 * nn) + F.col("s_e9").cast("double") / 1e9
    fbar = F.col("fb").cast("double") / (nn * 1e9)
    u2 = w2 - nn * (fbar - 0.5) * (fbar - 0.5)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(u2 * 1_000_000 + F.lit(_OFF)).cast("long").alias("u2_e6"),
    ).orderBy("event_type")


SQL_WATSON_NORM = f"""
WITH {_SQL_PHI}, {_SQL_CVM_TERMS}, agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(t_e9) AS BIGINT) AS s_e9,
         CAST(sum(tcnt * f_e9) AS BIGINT) AS fb
  FROM terms GROUP BY 1
)
SELECT event_type, n,
       CAST(floor(
         (1.0 / (12.0 * CAST(n AS DOUBLE)) + CAST(s_e9 AS DOUBLE) / 1e9
          - CAST(n AS DOUBLE)
            * (CAST(fb AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) - 0.5)
            * (CAST(fb AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) - 0.5))
         * 1000000 + {_OFF}) AS BIGINT) AS u2_e6
FROM agg ORDER BY event_type
"""


QUERIES.update(
    {
        "lilliefors": q_lilliefors,
        "ad_normality": q_ad_normality,
        "cvm_normality": q_cvm_normality,
        "watson_normality": q_watson_normality,
    }
)

ORACLE_SQL.update(
    {
        "lilliefors": SQL_LILLIEFORS,
        "ad_normality": SQL_AD_NORM,
        "cvm_normality": SQL_CVM_NORM,
        "watson_normality": SQL_WATSON_NORM,
    }
)


# ===========================================================================
# Battery C: post-hoc pairwise multiple comparisons across event types —
# the follow-up layer for the omnibus tests already in the registry
# (anova_event_types, kruskal_wallis, friedman_test).  All four reduce
# to self-joins of a k-row per-type statistics table (k = #types), so
# the pairwise stage is broadcast-trivial at any scale; rank machinery
# stays on the value domain.  The pooled-rank window is ORDER BY v with
# no partition key BY DESIGN: it runs over the distinct centi-value
# domain (bounded by the value range, not the row count).
# ===========================================================================


def _pooled_rank_stats(spark: SparkSession, sf_dir: str):
    """(per-type rank sums, global scalars) over pooled values."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    gv = ev.groupBy("v").agg(F.count(F.lit(1)).alias("tcnt"))
    wo = Window.orderBy("v")
    gv = gv.withColumn("cum", F.sum("tcnt").over(wo)).withColumn(
        "r2", 2 * F.col("cum") - F.col("tcnt") + 1
    )
    glob = gv.agg(
        F.sum("tcnt").alias("n"),
        F.sum(
            F.col("tcnt") * F.col("tcnt") * F.col("tcnt") - F.col("tcnt")
        ).alias("tie3"),
    )
    per_type = (
        ev.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("gcnt"))
        .join(gv.select("v", "r2"), "v")
        .groupBy("event_type")
        .agg(
            F.sum("gcnt").alias("ni"),
            F.sum(F.col("gcnt") * F.col("r2")).alias("si"),
            F.sum(F.col("gcnt") * F.col("r2") * F.col("r2")).alias("qi"),
        )
    )
    return per_type, glob


_SQL_POOLED = f"""
  ev AS (
    SELECT event_type,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
    FROM events
  ), gv AS (
    SELECT v, tcnt,
           2 * CAST(sum(tcnt) OVER (ORDER BY v) AS BIGINT) - tcnt + 1 AS r2
    FROM (SELECT v, count(*) AS tcnt FROM ev GROUP BY 1)
  ), gstats AS (
    SELECT CAST(sum(tcnt) AS BIGINT) AS n,
           CAST(sum(tcnt * tcnt * tcnt - tcnt) AS BIGINT) AS tie3
    FROM gv
  ), per_type AS (
    SELECT event_type,
           CAST(sum(gcnt) AS BIGINT) AS ni,
           CAST(sum(gcnt * r2) AS BIGINT) AS si,
           CAST(sum(gcnt * r2 * r2) AS BIGINT) AS qi
    FROM (
      SELECT event_type, v, count(*) AS gcnt FROM ev GROUP BY 1, 2
    ) t JOIN gv USING (v)
    GROUP BY 1
  )
"""


# ---------------------------------------------------------------------------
# games_howell — pairwise Welch comparisons with Welch-Satterthwaite
# df and the studentized-range statistic q = t*sqrt(2) (Games & Howell
# 1976).  The per-type moment table is k rows; the pair stage is a
# broadcast self-join.
# ---------------------------------------------------------------------------


def q_games_howell(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("sv2"),
    )
    a = st.alias("a")
    b = st.alias("b")
    pr = a.join(
        F.broadcast(b), F.col("a.event_type") < F.col("b.event_type")
    )

    def m(side: str) -> Column:
        return F.col(f"{side}.sv").cast("double") / F.col(f"{side}.n")

    def var(side: str) -> Column:
        n = F.col(f"{side}.n").cast("double")
        return (F.col(f"{side}.sv2").cast("double") - n * m(side) * m(side)) / (
            n - 1.0
        )

    va_n = var("a") / F.col("a.n")
    vb_n = var("b") / F.col("b.n")
    se2 = va_n + vb_n
    q = (m("a") - m("b")) / F.sqrt(se2) * F.sqrt(F.lit(2.0))
    dfw = se2 * se2 / (
        va_n * va_n / (F.col("a.n") - 1.0) + vb_n * vb_n / (F.col("b.n") - 1.0)
    )
    return pr.select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.floor(q * 10_000 + F.lit(_OFF)).cast("long").alias("q_e4"),
        F.floor(dfw * 100 + F.lit(_OFF)).cast("long").alias("df_e2"),
    ).orderBy("type_a", "type_b")


SQL_GAMES_HOWELL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), st AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(v * v) AS BIGINT) AS sv2
  FROM ev GROUP BY 1
), pr AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         (CAST(a.sv2 AS DOUBLE)
          - a.n * (CAST(a.sv AS DOUBLE) / a.n)
                * (CAST(a.sv AS DOUBLE) / a.n)) / (a.n - 1.0) / a.n AS van,
         (CAST(b.sv2 AS DOUBLE)
          - b.n * (CAST(b.sv AS DOUBLE) / b.n)
                * (CAST(b.sv AS DOUBLE) / b.n)) / (b.n - 1.0) / b.n AS vbn,
         CAST(a.sv AS DOUBLE) / a.n - CAST(b.sv AS DOUBLE) / b.n AS md,
         a.n AS na, b.n AS nb
  FROM st a JOIN st b ON a.event_type < b.event_type
)
SELECT type_a, type_b,
       CAST(floor(md / sqrt(van + vbn) * sqrt(2.0) * 10000 + {_OFF})
            AS BIGINT) AS q_e4,
       CAST(floor((van + vbn) * (van + vbn)
                  / (van * van / (na - 1.0) + vbn * vbn / (nb - 1.0))
                  * 100 + {_OFF}) AS BIGINT) AS df_e2
FROM pr ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# dunn_posthoc — Dunn's (1964) pairwise z on pooled average ranks with
# the tie-corrected variance (n(n+1) - tie3/(n-1))/12.
# ---------------------------------------------------------------------------


def q_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_type, glob = _pooled_rank_stats(spark, sf_dir)
    a = per_type.alias("a")
    b = per_type.alias("b")
    pr = a.join(
        F.broadcast(b), F.col("a.event_type") < F.col("b.event_type")
    ).crossJoin(F.broadcast(glob))
    n = F.col("n").cast("double")
    rbar_a = F.col("a.si").cast("double") / (2.0 * F.col("a.ni"))
    rbar_b = F.col("b.si").cast("double") / (2.0 * F.col("b.ni"))
    sig2 = (
        (n * (n + 1.0) - F.col("tie3").cast("double") / (n - 1.0))
        / 12.0
        * (1.0 / F.col("a.ni") + 1.0 / F.col("b.ni"))
    )
    z = (rbar_a - rbar_b) / F.sqrt(sig2)
    return pr.select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.ni").cast("long").alias("n_a"),
        F.col("b.ni").cast("long").alias("n_b"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("type_a", "type_b")


SQL_DUNN = f"""
WITH {_SQL_POOLED}
SELECT a.event_type AS type_a, b.event_type AS type_b,
       a.ni AS n_a, b.ni AS n_b,
       CAST(floor(
         (CAST(a.si AS DOUBLE) / (2.0 * a.ni)
          - CAST(b.si AS DOUBLE) / (2.0 * b.ni))
         / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                 - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)) / 12.0
                * (1.0 / a.ni + 1.0 / b.ni))
         * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM per_type a JOIN per_type b ON a.event_type < b.event_type
CROSS JOIN gstats
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# conover_iman — Conover & Iman (1979) rank t-test after Kruskal-
# Wallis: t = (Rbar_i - Rbar_j) / sqrt(S2 (n-1-H)/(n-k) (1/ni + 1/nj))
# with S2 = (sum R^2 - n(n+1)^2/4)/(n-1) and H the tie-corrected KW
# statistic — every sum an exact integer in doubled-rank units.
# ---------------------------------------------------------------------------


def q_conover_iman(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_type, glob = _pooled_rank_stats(spark, sf_dir)
    kw = per_type.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.col("si").cast("double")
            * F.col("si").cast("double")
            / (4.0 * F.col("ni"))
        ).alias("ssr"),
        F.sum("qi").alias("qtot"),
    )
    a = per_type.alias("a")
    b = per_type.alias("b")
    pr = (
        a.join(F.broadcast(b), F.col("a.event_type") < F.col("b.event_type"))
        .crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(kw))
    )
    n = F.col("n").cast("double")
    h_unc = 12.0 / (n * (n + 1.0)) * F.col("ssr") - 3.0 * (n + 1.0)
    c = 1.0 - F.col("tie3").cast("double") / (n * n * n - n)
    h = h_unc / c
    s2 = (F.col("qtot").cast("double") / 4.0 - n * (n + 1.0) * (n + 1.0) / 4.0) / (
        n - 1.0
    )
    rbar_a = F.col("a.si").cast("double") / (2.0 * F.col("a.ni"))
    rbar_b = F.col("b.si").cast("double") / (2.0 * F.col("b.ni"))
    t = (rbar_a - rbar_b) / F.sqrt(
        s2
        * (n - 1.0 - h)
        / (n - F.col("k"))
        * (1.0 / F.col("a.ni") + 1.0 / F.col("b.ni"))
    )
    return pr.select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.floor(h * 10_000 + F.lit(_OFF)).cast("long").alias("h_e4"),
        F.floor(t * 10_000 + F.lit(_OFF)).cast("long").alias("t_e4"),
    ).orderBy("type_a", "type_b")


SQL_CONOVER_IMAN = f"""
WITH {_SQL_POOLED}, kw AS (
  SELECT count(*) AS k,
         sum(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / (4.0 * ni)) AS ssr,
         CAST(sum(qi) AS BIGINT) AS qtot
  FROM per_type
), sc AS (
  SELECT k, qtot,
         (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * ssr
          - 3.0 * (CAST(n AS DOUBLE) + 1.0))
         / (1.0 - CAST(tie3 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     - CAST(n AS DOUBLE))) AS h,
         (CAST(qtot AS DOUBLE) / 4.0
          - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
            * (CAST(n AS DOUBLE) + 1.0) / 4.0)
         / (CAST(n AS DOUBLE) - 1.0) AS s2,
         CAST(n AS DOUBLE) AS nd
  FROM kw CROSS JOIN gstats
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(floor(h * 10000 + {_OFF}) AS BIGINT) AS h_e4,
       CAST(floor(
         (CAST(a.si AS DOUBLE) / (2.0 * a.ni)
          - CAST(b.si AS DOUBLE) / (2.0 * b.ni))
         / sqrt(s2 * (nd - 1.0 - h) / (nd - k) * (1.0 / a.ni + 1.0 / b.ni))
         * 10000 + {_OFF}) AS BIGINT) AS t_e4
FROM per_type a JOIN per_type b ON a.event_type < b.event_type
CROSS JOIN sc
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# nemenyi_friedman — Nemenyi pairwise q after Friedman over complete
# day blocks: within each day the k types are ranked by their floored
# daily mean (average ranks for ties); q = (Rbar_i - Rbar_j)
# / sqrt(k(k+1)/(12 b)).  Blocks missing a type are dropped (complete-
# block requirement); the rank window is per day over k rows.
# ---------------------------------------------------------------------------


def q_nemenyi_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    daily = ev.groupBy("dom", "event_type").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("mv")
    )
    k_all = daily.select("event_type").distinct().count()
    complete = (
        daily.groupBy("dom")
        .agg(F.count(F.lit(1)).alias("kk"))
        .filter(F.col("kk") == k_all)
        .select("dom")
    )
    d = daily.join(F.broadcast(complete), "dom")
    wr = Window.partitionBy("dom").orderBy("mv")
    wt = Window.partitionBy("dom", "mv")
    r = d.withColumn(
        "r2", 2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
    )
    per_type = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("b"), F.sum("r2").alias("sr2")
    )
    a = per_type.alias("a")
    bb = per_type.alias("b")
    pr = a.join(
        F.broadcast(bb), F.col("a.event_type") < F.col("b.event_type")
    )
    bkd = F.col("a.b").cast("double")
    q = (
        F.col("a.sr2").cast("double") / (2.0 * bkd)
        - F.col("b.sr2").cast("double") / (2.0 * bkd)
    ) / F.sqrt(k_all * (k_all + 1.0) / (12.0 * bkd))
    return pr.select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.b").cast("long").alias("blocks"),
        F.floor(q * 10_000 + F.lit(_OFF)).cast("long").alias("q_e4"),
    ).orderBy("type_a", "type_b")


SQL_NEMENYI = f"""
WITH daily AS (
  SELECT EXTRACT(day FROM ts) AS dom, event_type,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS mv
  FROM events GROUP BY 1, 2
), kk AS (
  SELECT count(DISTINCT event_type) AS k FROM daily
), complete AS (
  SELECT dom FROM daily GROUP BY dom
  HAVING count(*) = (SELECT k FROM kk)
), r AS (
  SELECT event_type,
         2 * rank() OVER (PARTITION BY dom ORDER BY mv)
           + count(*) OVER (PARTITION BY dom, mv) - 1 AS r2
  FROM daily JOIN complete USING (dom)
), per_type AS (
  SELECT event_type, count(*) AS b, CAST(sum(r2) AS BIGINT) AS sr2
  FROM r GROUP BY 1
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(a.b AS BIGINT) AS blocks,
       CAST(floor(
         (CAST(a.sr2 AS DOUBLE) / (2.0 * a.b)
          - CAST(b.sr2 AS DOUBLE) / (2.0 * a.b))
         / sqrt(k * (k + 1.0) / (12.0 * a.b))
         * 10000 + {_OFF}) AS BIGINT) AS q_e4
FROM per_type a JOIN per_type b ON a.event_type < b.event_type
CROSS JOIN kk
ORDER BY type_a, type_b
"""


QUERIES.update(
    {
        "games_howell": q_games_howell,
        "dunn_posthoc": q_dunn_posthoc,
        "conover_iman": q_conover_iman,
        "nemenyi_friedman": q_nemenyi_friedman,
    }
)

ORACLE_SQL.update(
    {
        "games_howell": SQL_GAMES_HOWELL,
        "dunn_posthoc": SQL_DUNN,
        "conover_iman": SQL_CONOVER_IMAN,
        "nemenyi_friedman": SQL_NEMENYI,
    }
)


# ===========================================================================
# Battery D: operations-research / reliability layer — EOQ ordering
# policy, Crow-AMSAA (power-law NHPP) reliability growth, the grouped
# delete-a-day jackknife SE, and the Omega ratio on daily deltas.
# Everything is per-type combinable aggregation; the only windows run
# over ~30 daily rows per type.
# ===========================================================================


# ---------------------------------------------------------------------------
# eoq_policy — classic Wilson EOQ per event type (Harris 1913):
# Q* = sqrt(2 D K / h) with annualized demand D = 12 * monthly count,
# ordering cost K = 100, holding cost h = 25% of the mean unit value.
# ---------------------------------------------------------------------------


def q_eoq_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    d = 12.0 * F.col("n").cast("double")
    k = F.lit(100.0)
    h = 0.25 * (F.col("sv").cast("double") / F.col("n") / 100.0)
    qstar = F.sqrt(2.0 * d * k / h)
    cost = F.sqrt(2.0 * d * k * h)
    return st.select(
        "event_type",
        (12 * F.col("n")).cast("long").alias("d_annual"),
        F.floor(qstar * 10_000 + F.lit(_OFF)).cast("long").alias("q_star_e4"),
        F.floor(cost * 10_000 + F.lit(_OFF)).cast("long").alias("cost_e4"),
        F.floor(d / qstar * 10_000 + F.lit(_OFF)).cast("long").alias(
            "orders_e4"
        ),
    ).orderBy("event_type")


SQL_EOQ = f"""
WITH st AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS sv
  FROM events GROUP BY 1
)
SELECT event_type,
       CAST(12 * n AS BIGINT) AS d_annual,
       CAST(floor(sqrt(2.0 * (12.0 * n) * 100.0
                       / (0.25 * (CAST(sv AS DOUBLE) / n / 100.0)))
                  * 10000 + {_OFF}) AS BIGINT) AS q_star_e4,
       CAST(floor(sqrt(2.0 * (12.0 * n) * 100.0
                       * (0.25 * (CAST(sv AS DOUBLE) / n / 100.0)))
                  * 10000 + {_OFF}) AS BIGINT) AS cost_e4,
       CAST(floor((12.0 * n)
                  / sqrt(2.0 * (12.0 * n) * 100.0
                         / (0.25 * (CAST(sv AS DOUBLE) / n / 100.0)))
                  * 10000 + {_OFF}) AS BIGINT) AS orders_e4
FROM st ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# crow_amsaa — power-law NHPP reliability-growth MLE (Crow 1974;
# AMSAA TR-138): treating each type's events as failure epochs,
# beta = n / sum ln(T / t_i), ln lambda = ln n - beta ln T,
# with t_i measured in microseconds from the global window start
# (+1 s so the first event never hits ln(0)).  Per-row ln terms are
# e6-floored; everything else is exact integer sums.
# ---------------------------------------------------------------------------


def q_crow_amsaa(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    g = ev.agg(
        F.min("us").alias("start_us"), F.max("us").alias("end_us")
    )
    j = ev.crossJoin(F.broadcast(g))
    td = (F.col("end_us") - F.col("start_us") + 1_000_000).cast("double")
    ti = (F.col("us") - F.col("start_us") + 1_000_000).cast("double")
    term = F.floor((F.log(td) - F.log(ti)) * 1_000_000 + F.lit(_OFF)).cast(
        "long"
    )
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(term).alias("s_e6"),
        F.max(td).alias("td"),
    )
    beta = F.col("n").cast("double") / (F.col("s_e6").cast("double") / 1e6)
    lnlam = F.log(F.col("n").cast("double")) - beta * F.log(F.col("td"))
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(beta * 1_000_000 + F.lit(_OFF)).cast("long").alias("beta_e6"),
        F.floor(lnlam * 10_000 + F.lit(_OFF)).cast("long").alias("lnlam_e4"),
    ).orderBy("event_type")


SQL_CROW = f"""
WITH g AS (
  SELECT min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
  FROM events
), terms AS (
  SELECT event_type,
         CAST(floor((ln(CAST(end_us - start_us + 1000000 AS DOUBLE))
                     - ln(CAST(epoch_us(ts) - start_us + 1000000 AS DOUBLE)))
                    * 1000000 + {_OFF}) AS BIGINT) AS t_e6,
         CAST(end_us - start_us + 1000000 AS DOUBLE) AS td
  FROM events CROSS JOIN g
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(t_e6) AS BIGINT) AS s_e6,
         max(td) AS td
  FROM terms GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(n / (CAST(s_e6 AS DOUBLE) / 1e6) * 1000000 + {_OFF})
            AS BIGINT) AS beta_e6,
       CAST(floor((ln(CAST(n AS DOUBLE))
                   - n / (CAST(s_e6 AS DOUBLE) / 1e6) * ln(td))
                  * 10000 + {_OFF}) AS BIGINT) AS lnlam_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# jackknife_day_se — grouped (delete-one-day) jackknife SE of the mean
# (Quenouille 1956; Tukey 1958): theta_(d) = (S - s_d)/(N - n_d),
# SE^2 = (D-1)/D * sum_d (theta_(d) - mean_d theta_(d))^2.
# Leave-one-out estimates are e6-floored integers, so the variance sum
# is exact; the day layer is ~30 rows per type.
# ---------------------------------------------------------------------------


def q_jackknife_day_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    day = ev.groupBy("event_type", "dom").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("v").alias("sd")
    )
    tot = day.groupBy("event_type").agg(
        F.sum("nd").alias("n"), F.sum("sd").alias("s")
    )
    j = day.join(F.broadcast(tot), "event_type")
    theta_d = (F.col("s") - F.col("sd")).cast("double") / (
        F.col("n") - F.col("nd")
    )
    # center at the full-sample mean (integer shift, variance-invariant)
    # so the e6-scaled squares stay far inside int64
    c = F.floor(
        F.col("s").cast("double") / F.col("n") * 1_000_000 + F.lit(_OFF)
    ).cast("long")
    t_e6 = (
        F.floor(theta_d * 1_000_000 + F.lit(_OFF)).cast("long") - c
    )
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.sum(t_e6).alias("st"),
        F.sum(t_e6 * t_e6).alias("sq"),
    )
    dd = F.col("d").cast("double")
    var_e12 = F.col("sq").cast("double") - F.col("st").cast("double") * F.col(
        "st"
    ).cast("double") / dd
    se = F.sqrt((dd - 1.0) / dd * var_e12) / 1e6
    return agg.select(
        "event_type",
        F.col("d").cast("long").alias("d"),
        F.floor(
            F.col("s").cast("double") / F.col("n") * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("theta_e4"),
        F.floor(se * 1_000_000 + F.lit(_OFF)).cast("long").alias("se_e6"),
    ).orderBy("event_type")


SQL_JACKKNIFE = f"""
WITH day AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom, count(*) AS nd,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS sd
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(sum(nd) AS BIGINT) AS n,
         CAST(sum(sd) AS BIGINT) AS s
  FROM day GROUP BY 1
), t AS (
  SELECT day.event_type, n, s,
         CAST(floor(CAST(s - sd AS DOUBLE) / (n - nd) * 1000000 + {_OFF})
              AS BIGINT)
         - CAST(floor(CAST(s AS DOUBLE) / n * 1000000 + {_OFF}) AS BIGINT)
           AS t_e6
  FROM day JOIN tot ON tot.event_type = day.event_type
), agg AS (
  SELECT event_type, count(*) AS d,
         CAST(max(n) AS BIGINT) AS n, CAST(max(s) AS BIGINT) AS s,
         CAST(sum(t_e6) AS BIGINT) AS st,
         CAST(sum(t_e6 * t_e6) AS BIGINT) AS sq
  FROM t GROUP BY 1
)
SELECT event_type, CAST(d AS BIGINT) AS d,
       CAST(floor(CAST(s AS DOUBLE) / n * 10000 + {_OFF}) AS BIGINT)
         AS theta_e4,
       CAST(floor(sqrt((d - 1.0) / d
                       * (CAST(sq AS DOUBLE)
                          - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / d))
                  / 1e6 * 1000000 + {_OFF}) AS BIGINT) AS se_e6
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# omega_ratio — Keating & Shadwick (2002) gain/loss ratio of the daily
# total-value deltas, at threshold 0 and at the mean delta.  Deltas are
# exact integer diffs over the ~30-row day layer per type.
# ---------------------------------------------------------------------------


def q_omega_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    day = ev.groupBy("event_type", "dom").agg(F.sum("v").alias("sd"))
    wd = Window.partitionBy("event_type").orderBy("dom")
    r = day.withColumn("r", F.col("sd") - F.lag("sd").over(wd)).filter(
        F.col("r").isNotNull()
    )
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("r").alias("sr"),
        F.sum(F.greatest(F.col("r"), F.lit(0))).alias("gain0"),
        F.sum(F.greatest(-F.col("r"), F.lit(0))).alias("loss0"),
    )
    mean = F.col("sr").cast("double") / F.col("d")
    rm = r.join(F.broadcast(agg.select("event_type", "d", "sr")), "event_type")
    mu = F.col("sr").cast("double") / F.col("d")
    gm = F.floor(
        F.greatest(F.col("r").cast("double") - mu, F.lit(0.0)) * 100
        + F.lit(_OFF)
    ).cast("long")
    lm = F.floor(
        F.greatest(mu - F.col("r").cast("double"), F.lit(0.0)) * 100
        + F.lit(_OFF)
    ).cast("long")
    mm = rm.groupBy("event_type").agg(
        F.sum(gm).alias("gainm"), F.sum(lm).alias("lossm")
    )
    out = agg.join(mm, "event_type")
    return out.select(
        "event_type",
        F.col("d").cast("long").alias("d"),
        F.floor(
            F.col("gain0").cast("double")
            / F.col("loss0").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("omega0_e6"),
        F.floor(
            F.col("gainm").cast("double")
            / F.col("lossm").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("omegam_e6"),
    ).orderBy("event_type")


SQL_OMEGA = f"""
WITH day AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS sd
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type,
         sd - lag(sd) OVER (PARTITION BY event_type ORDER BY dom) AS r
  FROM day
  QUALIFY r IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS d,
         CAST(sum(r) AS BIGINT) AS sr,
         CAST(sum(greatest(r, 0)) AS BIGINT) AS gain0,
         CAST(sum(greatest(-r, 0)) AS BIGINT) AS loss0
  FROM r GROUP BY 1
), mm AS (
  SELECT r.event_type,
         CAST(sum(CAST(floor(greatest(CAST(r AS DOUBLE)
                                      - CAST(sr AS DOUBLE) / d, 0.0) * 100
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS gainm,
         CAST(sum(CAST(floor(greatest(CAST(sr AS DOUBLE) / d
                                      - CAST(r AS DOUBLE), 0.0) * 100
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS lossm
  FROM r JOIN agg ON agg.event_type = r.event_type
  GROUP BY 1
)
SELECT agg.event_type, CAST(d AS BIGINT) AS d,
       CAST(floor(CAST(gain0 AS DOUBLE) / CAST(loss0 AS DOUBLE) * 1000000
                  + {_OFF}) AS BIGINT) AS omega0_e6,
       CAST(floor(CAST(gainm AS DOUBLE) / CAST(lossm AS DOUBLE) * 1000000
                  + {_OFF}) AS BIGINT) AS omegam_e6
FROM agg JOIN mm ON mm.event_type = agg.event_type
ORDER BY agg.event_type
"""


QUERIES.update(
    {
        "eoq_policy": q_eoq_policy,
        "crow_amsaa": q_crow_amsaa,
        "jackknife_day_se": q_jackknife_day_se,
        "omega_ratio": q_omega_ratio,
    }
)

ORACLE_SQL.update(
    {
        "eoq_policy": SQL_EOQ,
        "crow_amsaa": SQL_CROW,
        "jackknife_day_se": SQL_JACKKNIFE,
        "omega_ratio": SQL_OMEGA,
    }
)


# ===========================================================================
# Battery E: classic rank / specification tests — Siegel-Tukey
# alternating-extreme scale test, Fligner-Policello robust rank-order
# test, Ramsey's RESET, and Durbin's incomplete-block rank test.
# Rank machinery stays on the value domain; Siegel-Tukey regenerates
# positions from rank blocks via sequence-explode (tie-block averages
# are position-set invariant).
# ===========================================================================


# ---------------------------------------------------------------------------
# siegel_tukey — scale test via alternating extreme ranks (Siegel &
# Tukey 1960), day vs night per type.  Position i (of n) gets
#   w = least(2i - [i odd], 2(n+1-i) - [n+1-i even])
# (the valid side is always the smaller); tie blocks use the exact
# block average via the integer block sum of w.  Linear-rank z with
# the general score variance n1 n2/(n(n-1)) sum (a_i - abar)^2.
# ---------------------------------------------------------------------------


def q_siegel_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    c0 = _typed_counts(spark, sf_dir)
    cv = c0.groupBy("event_type", "v").agg(
        F.sum("cnt").alias("tcnt"),
        F.sum(F.when(F.col("is_day") == 1, F.col("cnt")).otherwise(0)).alias(
            "dcnt"
        ),
    )
    wo = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    rv = (
        cv.withColumn("cum", F.sum("tcnt").over(wo))
        .withColumn("n", F.sum("tcnt").over(wn))
        .withColumn("lo", F.col("cum") - F.col("tcnt") + 1)
    )
    ex = rv.select(
        "event_type",
        "v",
        "n",
        F.explode(F.sequence(F.col("lo"), F.col("cum"))).alias("i"),
    )
    j = F.col("n") + 1 - F.col("i")
    bottom = F.when(F.col("i") % 2 == 1, 2 * F.col("i") - 1).otherwise(
        2 * F.col("i")
    )
    top = F.when(j % 2 == 1, 2 * j).otherwise(2 * j - 1)
    sw = ex.withColumn("w", F.least(bottom, top)).groupBy(
        "event_type", "v"
    ).agg(F.sum("w").alias("sw"))
    blk = cv.join(sw, ["event_type", "v"])
    t1_e6 = F.floor(
        F.col("dcnt").cast("double")
        * F.col("sw").cast("double")
        / F.col("tcnt")
        * 1_000_000
        + F.lit(_OFF)
    ).cast("long")
    q_e3 = F.floor(
        F.col("sw").cast("double")
        * F.col("sw").cast("double")
        / F.col("tcnt")
        * 1_000
        + F.lit(_OFF)
    ).cast("long")
    agg = blk.groupBy("event_type").agg(
        F.sum("tcnt").alias("n"),
        F.sum("dcnt").alias("n1"),
        F.sum("sw").alias("sa"),
        F.sum(t1_e6).alias("t1_e6"),
        F.sum(q_e3).alias("sq_e3"),
    )
    n = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    n2 = n - n1
    sa = F.col("sa").cast("double")
    varsum = F.col("sq_e3").cast("double") / 1_000.0 - sa * sa / n
    z = (F.col("t1_e6").cast("double") / 1e6 - n1 * sa / n) / F.sqrt(
        n1 * n2 / (n * (n - 1.0)) * varsum
    )
    return agg.select(
        "event_type",
        F.col("n1").cast("long").alias("n1"),
        (F.col("n") - F.col("n1")).cast("long").alias("n2"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


SQL_SIEGEL_TUKEY = f"""
WITH {_SQL_COUNTS}, cv AS (
  SELECT event_type, v,
         CAST(sum(cnt) AS BIGINT) AS tcnt,
         CAST(sum(CASE WHEN is_day = 1 THEN cnt ELSE 0 END) AS BIGINT)
           AS dcnt
  FROM c0 GROUP BY 1, 2
), rv AS (
  SELECT event_type, v, tcnt, dcnt,
         CAST(sum(tcnt) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) AS cum,
         CAST(sum(tcnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM cv
), ex AS (
  SELECT event_type, v, n,
         unnest(generate_series(cum - tcnt + 1, cum)) AS i
  FROM rv
), sw AS (
  SELECT event_type, v,
         CAST(sum(least(
           CASE WHEN i % 2 = 1 THEN 2 * i - 1 ELSE 2 * i END,
           CASE WHEN (n + 1 - i) % 2 = 1 THEN 2 * (n + 1 - i)
                ELSE 2 * (n + 1 - i) - 1 END)) AS BIGINT) AS sw
  FROM ex GROUP BY 1, 2
), agg AS (
  SELECT rv.event_type,
         CAST(sum(tcnt) AS BIGINT) AS n,
         CAST(sum(dcnt) AS BIGINT) AS n1,
         CAST(sum(sw.sw) AS BIGINT) AS sa,
         CAST(sum(CAST(floor(CAST(dcnt AS DOUBLE) * CAST(sw.sw AS DOUBLE)
                             / tcnt * 1000000 + {_OFF}) AS BIGINT))
              AS BIGINT) AS t1_e6,
         CAST(sum(CAST(floor(CAST(sw.sw AS DOUBLE) * CAST(sw.sw AS DOUBLE)
                             / tcnt * 1000 + {_OFF}) AS BIGINT))
              AS BIGINT) AS sq_e3
  FROM rv JOIN sw ON sw.event_type = rv.event_type AND sw.v = rv.v
  GROUP BY 1
)
SELECT event_type, n1, n - n1 AS n2,
       CAST(floor(
         (CAST(t1_e6 AS DOUBLE) / 1e6
          - CAST(n1 AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(n1 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE))
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                * (CAST(sq_e3 AS DOUBLE) / 1000.0
                   - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                     / CAST(n AS DOUBLE)))
         * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# fligner_policello — robust rank-order test (Fligner & Policello
# 1981), day vs night per type, on placement counts with half-tie
# credit (doubled to stay integer):
#   p2(x) = 2*#{night < x} + #{night = x},  q2 symmetric,
#   U* = (sumP - sumQ) / (2 sqrt(V1 + V2 + Pbar Qbar)).
# Pure value-domain cumulative counts — no explode, no per-row work.
# ---------------------------------------------------------------------------


def q_fligner_policello(spark: SparkSession, sf_dir: str) -> DataFrame:
    c0 = _typed_counts(spark, sf_dir)
    cv = c0.groupBy("event_type", "v").agg(
        F.sum(F.when(F.col("is_day") == 1, F.col("cnt")).otherwise(0)).alias(
            "dcnt"
        ),
        F.sum(F.when(F.col("is_day") == 0, F.col("cnt")).otherwise(0)).alias(
            "ncnt"
        ),
    )
    wo = Window.partitionBy("event_type").orderBy("v")
    rv = cv.withColumn(
        "dlt", F.sum("dcnt").over(wo) - F.col("dcnt")
    ).withColumn("nlt", F.sum("ncnt").over(wo) - F.col("ncnt"))
    p2 = 2 * F.col("nlt") + F.col("ncnt")
    q2 = 2 * F.col("dlt") + F.col("dcnt")
    agg = rv.groupBy("event_type").agg(
        F.sum("dcnt").alias("n1"),
        F.sum("ncnt").alias("n2"),
        F.sum(F.col("dcnt") * p2).alias("sp"),
        F.sum(F.col("ncnt") * q2).alias("sq"),
        F.sum(F.col("dcnt") * p2 * p2).alias("spp"),
        F.sum(F.col("ncnt") * q2 * q2).alias("sqq"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    sp = F.col("sp").cast("double")
    sq = F.col("sq").cast("double")
    v1x4 = F.col("spp").cast("double") - sp * sp / n1
    v2x4 = F.col("sqq").cast("double") - sq * sq / n2
    pq_x4 = sp / n1 * (sq / n2)
    z = (sp - sq) / (4.0 * F.sqrt(v1x4 / 4.0 + v2x4 / 4.0 + pq_x4 / 4.0))
    return agg.select(
        "event_type",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("sp").cast("long").alias("sp2"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


SQL_FLIGNER_POLICELLO = f"""
WITH {_SQL_COUNTS}, cv AS (
  SELECT event_type, v,
         CAST(sum(CASE WHEN is_day = 1 THEN cnt ELSE 0 END) AS BIGINT)
           AS dcnt,
         CAST(sum(CASE WHEN is_day = 0 THEN cnt ELSE 0 END) AS BIGINT)
           AS ncnt
  FROM c0 GROUP BY 1, 2
), rv AS (
  SELECT event_type, dcnt, ncnt,
         CAST(sum(dcnt) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) - dcnt AS dlt,
         CAST(sum(ncnt) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) - ncnt AS nlt
  FROM cv
), agg AS (
  SELECT event_type,
         CAST(sum(dcnt) AS BIGINT) AS n1,
         CAST(sum(ncnt) AS BIGINT) AS n2,
         CAST(sum(dcnt * (2 * nlt + ncnt)) AS BIGINT) AS sp,
         CAST(sum(ncnt * (2 * dlt + dcnt)) AS BIGINT) AS sq,
         CAST(sum(dcnt * (2 * nlt + ncnt) * (2 * nlt + ncnt)) AS BIGINT)
           AS spp,
         CAST(sum(ncnt * (2 * dlt + dcnt) * (2 * dlt + dcnt)) AS BIGINT)
           AS sqq
  FROM rv GROUP BY 1
)
SELECT event_type, n1, n2, sp AS sp2,
       CAST(floor(
         (CAST(sp AS DOUBLE) - CAST(sq AS DOUBLE))
         / (4.0 * sqrt(
             (CAST(spp AS DOUBLE)
              - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n1) / 4.0
             + (CAST(sqq AS DOUBLE)
                - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n2) / 4.0
             + CAST(sp AS DOUBLE) / n1 * (CAST(sq AS DOUBLE) / n2) / 4.0))
         * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# reset_ramsey — Ramsey's (1969) RESET with the squared fitted value:
# stage 1 regresses the centi-value on hour-of-day; stage 2 adds
# z = fitted^2 (value units, e0-floored so second-stage moments are
# exact integers) and reports the t of its coefficient via 2x2
# centered normal equations.
# ---------------------------------------------------------------------------


def q_reset_ramsey(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.hour("ts").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("y"),
    )
    s1 = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    b1 = (nn * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        nn * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    a1 = (F.col("sy").cast("double") - b1 * F.col("sx")) / nn
    st = s1.select("event_type", a1.alias("a"), b1.alias("b"))
    j = ev.join(F.broadcast(st), "event_type")
    fit = (F.col("a") + F.col("b") * F.col("x")) / 100.0
    z = F.floor(fit * fit + F.lit(_OFF)).cast("long")
    m = j.withColumn("z", z).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("z") * F.col("y")).alias("szy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / nd
    czz = F.col("szz").cast("double") - F.col("sz").cast("double") * F.col(
        "sz"
    ).cast("double") / nd
    cxz = F.col("sxz").cast("double") - F.col("sx").cast("double") * F.col(
        "sz"
    ).cast("double") / nd
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    czy = F.col("szy").cast("double") - F.col("sz").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    cyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    det = cxx * czz - cxz * cxz
    bz = (cxx * czy - cxz * cxy) / det
    bx = (czz * cxy - cxz * czy) / det
    sse = cyy - bx * cxy - bz * czy
    s2 = sse / (nd - 3.0)
    tstat = bz / F.sqrt(s2 * cxx / det)
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(tstat * 10_000 + F.lit(_OFF)).cast("long").alias("t_e4"),
        F.floor(tstat * tstat * 10_000 + F.lit(_OFF)).cast("long").alias(
            "f_e4"
        ),
    ).orderBy("event_type")


SQL_RESET = f"""
WITH ev AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS x,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS y
  FROM events
), s1 AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM ev GROUP BY 1
), st AS (
  SELECT event_type,
         (CAST(sy AS DOUBLE)
          - CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) * sx) / n AS a,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b
  FROM s1
), m AS (
  SELECT ev.event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(z) AS BIGINT) AS sz,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(z * z) AS BIGINT) AS szz,
         CAST(sum(x * z) AS BIGINT) AS sxz,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(z * y) AS BIGINT) AS szy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM (
    SELECT ev.event_type, x, y,
           CAST(floor(((a + b * x) / 100.0) * ((a + b * x) / 100.0)
                      + {_OFF}) AS BIGINT) AS z
    FROM ev JOIN st ON st.event_type = ev.event_type
  ) ev GROUP BY 1
), c AS (
  SELECT event_type, CAST(n AS DOUBLE) AS nd,
         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n
           AS cxx,
         CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n
           AS czz,
         CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE) / n
           AS cxz,
         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n
           AS cxy,
         CAST(szy AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE) / n
           AS czy,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n
           AS cyy
  FROM m
), f AS (
  SELECT event_type, CAST(nd AS BIGINT) AS n,
         ((cxx * czy - cxz * cxy) / (cxx * czz - cxz * cxz))
         / sqrt(((cyy - (czz * cxy - cxz * czy) / (cxx * czz - cxz * cxz)
                        * cxy
                      - (cxx * czy - cxz * cxy) / (cxx * czz - cxz * cxz)
                        * czy)
                 / (nd - 3.0))
                * cxx / (cxx * czz - cxz * cxz)) AS t
  FROM c
)
SELECT event_type, n,
       CAST(floor(t * 10000 + {_OFF}) AS BIGINT) AS t_e4,
       CAST(floor(t * t * 10000 + {_OFF}) AS BIGINT) AS f_e4
FROM f ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# durbin_incomplete — Durbin's (1951) rank test for incomplete blocks
# in Conover's (1999) general tie-robust form.  Blocks are (day, hour)
# cells that contain EXACTLY k=3 of the event types (a genuinely
# incomplete design); treatments are ranked within the cell by the
# floored cell mean.  With doubled average ranks everything is exact:
#   T1 = (t-1) * sum_j (R2_j - (k+1) r_j)^2 / (A4 - C4),
#   A4 = sum r2^2,  C4 = b k (k+1)^2.
# ---------------------------------------------------------------------------


def q_durbin_incomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cell = ev.groupBy("dom", "hh", "event_type").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("mv")
    )
    k3 = (
        cell.groupBy("dom", "hh")
        .agg(F.count(F.lit(1)).alias("kk"))
        .filter(F.col("kk") == 3)
        .select("dom", "hh")
    )
    d = cell.join(k3, ["dom", "hh"])
    wr = Window.partitionBy("dom", "hh").orderBy("mv")
    wt = Window.partitionBy("dom", "hh", "mv")
    r = d.withColumn(
        "r2", 2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
    )
    per_j = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("rj"), F.sum("r2").alias("r2j")
    )
    gl = r.agg(
        (F.count(F.lit(1)) / 3).cast("long").alias("b"),
        F.sum(F.col("r2") * F.col("r2")).alias("a4"),
    )
    stat = per_j.crossJoin(F.broadcast(gl)).agg(
        F.count(F.lit(1)).alias("t"),
        F.max("b").alias("b"),
        F.max("a4").alias("a4"),
        F.sum(
            (F.col("r2j") - 4 * F.col("rj")).cast("double")
            * (F.col("r2j") - 4 * F.col("rj")).cast("double")
        ).alias("ss"),
    )
    c4 = F.col("b").cast("double") * 3.0 * 16.0
    d_stat = (
        (F.col("t") - 1).cast("double")
        * F.col("ss")
        / (F.col("a4").cast("double") - c4)
    )
    return stat.select(
        F.col("t").cast("long").alias("t"),
        F.col("b").cast("long").alias("b"),
        (F.col("t") - 1).cast("long").alias("df"),
        F.floor(d_stat * 10_000 + F.lit(_OFF)).cast("long").alias("d_e4"),
    )


SQL_DURBIN = f"""
WITH cell AS (
  SELECT EXTRACT(day FROM ts) AS dom, EXTRACT(hour FROM ts) AS hh,
         event_type,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS mv
  FROM events GROUP BY 1, 2, 3
), k3 AS (
  SELECT dom, hh FROM cell GROUP BY 1, 2 HAVING count(*) = 3
), r AS (
  SELECT event_type,
         2 * rank() OVER (PARTITION BY dom, hh ORDER BY mv)
           + count(*) OVER (PARTITION BY dom, hh, mv) - 1 AS r2
  FROM cell JOIN k3 USING (dom, hh)
), per_j AS (
  SELECT event_type, count(*) AS rj, CAST(sum(r2) AS BIGINT) AS r2j
  FROM r GROUP BY 1
), gl AS (
  SELECT CAST(count(*) / 3 AS BIGINT) AS b,
         CAST(sum(r2 * r2) AS BIGINT) AS a4
  FROM r
)
SELECT CAST(count(*) AS BIGINT) AS t,
       CAST(max(b) AS BIGINT) AS b,
       CAST(count(*) - 1 AS BIGINT) AS df,
       CAST(floor(
         (count(*) - 1.0)
         * sum(CAST(r2j - 4 * rj AS DOUBLE) * CAST(r2j - 4 * rj AS DOUBLE))
         / (CAST(max(a4) AS DOUBLE) - CAST(max(b) AS DOUBLE) * 3.0 * 16.0)
         * 10000 + {_OFF}) AS BIGINT) AS d_e4
FROM per_j CROSS JOIN gl
"""


QUERIES.update(
    {
        "siegel_tukey": q_siegel_tukey,
        "fligner_policello": q_fligner_policello,
        "reset_ramsey": q_reset_ramsey,
        "durbin_incomplete": q_durbin_incomplete,
    }
)

ORACLE_SQL.update(
    {
        "siegel_tukey": SQL_SIEGEL_TUKEY,
        "fligner_policello": SQL_FLIGNER_POLICELLO,
        "reset_ramsey": SQL_RESET,
        "durbin_incomplete": SQL_DURBIN,
    }
)


# ===========================================================================
# Battery F: weighted log-rank family + repeated-measures sphericity +
# tabular CUSUM.  The survival scaffold mirrors logrank_test
# (queries_stats8): user lifetimes in days, groups by first-event hour,
# risk sets from suffix sums over the bounded lifetime domain.
# ===========================================================================


def _survival_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            ((F.col("first_s") % 86_400) / 3_600).cast("long").between(8, 19),
            1,
        )
        .otherwise(0)
        .alias("g1"),
    )
    dt = per.groupBy("t").agg(
        F.count(F.lit(1)).alias("d"), F.sum("g1").alias("d1")
    )
    wo = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return dt.withColumn("n", F.sum("d").over(wo)).withColumn(
        "n1", F.sum("d1").over(wo)
    )


_SQL_RISK = """
  per AS (
    SELECT CAST(max(floor(epoch(ts) / 86400))
                - min(floor(epoch(ts) / 86400)) + 1 AS BIGINT) AS t,
           CASE WHEN CAST(floor((CAST(min(floor(epoch(ts))) AS BIGINT)
                                 % 86400) / 3600) AS BIGINT)
                     BETWEEN 8 AND 19
                THEN 1 ELSE 0 END AS g1
    FROM events GROUP BY user_id
  ), dt AS (
    SELECT t, CAST(count(*) AS BIGINT) AS d, CAST(sum(g1) AS BIGINT) AS d1
    FROM per GROUP BY 1
  ), risk AS (
    SELECT t, d, d1,
           CAST(sum(d) OVER (ORDER BY t DESC) AS BIGINT) AS n,
           CAST(sum(d1) OVER (ORDER BY t DESC) AS BIGINT) AS n1
    FROM dt
  )
"""


# ---------------------------------------------------------------------------
# tarone_ware — weighted log-rank with w_t = sqrt(n_t) (Tarone & Ware
# 1977), between Gehan (w = n) and log-rank (w = 1) already in the
# registry.  Z = sum w (d1 - e) / sqrt(sum w^2 v), per-t terms
# e9-floored so the sums are exact.
# ---------------------------------------------------------------------------


def q_tarone_ware(spark: SparkSession, sf_dir: str) -> DataFrame:
    risk = _survival_risk(spark, sf_dir)
    nd = F.col("n").cast("double")
    p1 = F.col("n1").cast("double") / nd
    e_t = F.col("d").cast("double") * p1
    v_t = (
        F.col("d").cast("double")
        * p1
        * (1.0 - p1)
        * (F.col("n") - F.col("d")).cast("double")
        / (nd - 1.0)
    )
    w = F.sqrt(nd)
    terms = risk.filter(F.col("n") > 1).select(
        F.floor(w * (F.col("d1").cast("double") - e_t) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("num9"),
        F.floor(nd * v_t * 1e9 + F.lit(_OFF)).cast("long").alias("den9"),
    )
    agg = terms.agg(
        F.sum("num9").alias("snum"), F.sum("den9").alias("sden")
    )
    z = (
        F.col("snum").cast("double")
        / 1e9
        / F.sqrt(F.col("sden").cast("double") / 1e9)
    )
    return agg.filter(F.col("sden") > 0).select(
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        F.floor(z * z * 10_000 + F.lit(_OFF)).cast("long").alias("chi2_e4"),
    )


SQL_TARONE_WARE = f"""
WITH {_SQL_RISK}, terms AS (
  SELECT CAST(floor(sqrt(CAST(n AS DOUBLE))
                    * (CAST(d1 AS DOUBLE)
                       - d * (CAST(n1 AS DOUBLE) / n)) * 1e9 + {_OFF})
              AS BIGINT) AS num9,
         CAST(floor(CAST(n AS DOUBLE)
                    * (d * (CAST(n1 AS DOUBLE) / n)
                       * (1.0 - CAST(n1 AS DOUBLE) / n)
                       * CAST(n - d AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0))
                    * 1e9 + {_OFF}) AS BIGINT) AS den9
  FROM risk WHERE n > 1
), agg AS (
  SELECT CAST(sum(num9) AS BIGINT) AS snum,
         CAST(sum(den9) AS BIGINT) AS sden
  FROM terms
)
SELECT CAST(floor(CAST(snum AS DOUBLE) / 1e9
                  / sqrt(CAST(sden AS DOUBLE) / 1e9) * 10000 + {_OFF})
            AS BIGINT) AS z_e4,
       CAST(floor((CAST(snum AS DOUBLE) / 1e9)
                  * (CAST(snum AS DOUBLE) / 1e9)
                  / (CAST(sden AS DOUBLE) / 1e9) * 10000 + {_OFF})
            AS BIGINT) AS chi2_e4
FROM agg WHERE sden > 0
"""


# ---------------------------------------------------------------------------
# peto_peto — Peto-Peto-Prentice weighted log-rank, w_t = the left-
# continuous survivor estimate S~(t) = prod_{t_i <= t} (1 - d_i/(n_i+1)).
# The product is a prefix sum of e9-floored logs (exact integers), so
# the weights are cross-engine identical; then the same Z as above.
# ---------------------------------------------------------------------------


def q_peto_peto(spark: SparkSession, sf_dir: str) -> DataFrame:
    risk = _survival_risk(spark, sf_dir)
    lnterm = F.floor(
        F.log(
            1.0
            - F.col("d").cast("double") / (F.col("n").cast("double") + 1.0)
        )
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    wa = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    r = risk.withColumn("lnw9", F.sum(lnterm).over(wa)).withColumn(
        "w_e6",
        F.floor(
            F.exp(F.col("lnw9").cast("double") / 1e9) * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    nd = F.col("n").cast("double")
    p1 = F.col("n1").cast("double") / nd
    e_t = F.col("d").cast("double") * p1
    v_t = (
        F.col("d").cast("double")
        * p1
        * (1.0 - p1)
        * (F.col("n") - F.col("d")).cast("double")
        / (nd - 1.0)
    )
    w = F.col("w_e6").cast("double") / 1e6
    terms = r.filter(F.col("n") > 1).select(
        F.floor(w * (F.col("d1").cast("double") - e_t) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("num9"),
        F.floor(w * w * v_t * 1e9 + F.lit(_OFF)).cast("long").alias("den9"),
    )
    agg = terms.agg(F.sum("num9").alias("snum"), F.sum("den9").alias("sden"))
    z = (
        F.col("snum").cast("double")
        / 1e9
        / F.sqrt(F.col("sden").cast("double") / 1e9)
    )
    return agg.filter(F.col("sden") > 0).select(
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        F.floor(z * z * 10_000 + F.lit(_OFF)).cast("long").alias("chi2_e4"),
    )


SQL_PETO_PETO = f"""
WITH {_SQL_RISK}, wts AS (
  SELECT t, d, d1, n, n1,
         CAST(floor(exp(CAST(sum(CAST(floor(
             ln(1.0 - CAST(d AS DOUBLE) / (CAST(n AS DOUBLE) + 1.0)) * 1e9
             + {_OFF}) AS BIGINT)) OVER (ORDER BY t) AS DOUBLE) / 1e9)
           * 1000000 + {_OFF}) AS BIGINT) AS w_e6
  FROM risk
), terms AS (
  SELECT CAST(floor((CAST(w_e6 AS DOUBLE) / 1e6)
                    * (CAST(d1 AS DOUBLE)
                       - d * (CAST(n1 AS DOUBLE) / n)) * 1e9 + {_OFF})
              AS BIGINT) AS num9,
         CAST(floor((CAST(w_e6 AS DOUBLE) / 1e6)
                    * (CAST(w_e6 AS DOUBLE) / 1e6)
                    * (d * (CAST(n1 AS DOUBLE) / n)
                       * (1.0 - CAST(n1 AS DOUBLE) / n)
                       * CAST(n - d AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0))
                    * 1e9 + {_OFF}) AS BIGINT) AS den9
  FROM wts WHERE n > 1
), agg AS (
  SELECT CAST(sum(num9) AS BIGINT) AS snum,
         CAST(sum(den9) AS BIGINT) AS sden
  FROM terms
)
SELECT CAST(floor(CAST(snum AS DOUBLE) / 1e9
                  / sqrt(CAST(sden AS DOUBLE) / 1e9) * 10000 + {_OFF})
            AS BIGINT) AS z_e4,
       CAST(floor((CAST(snum AS DOUBLE) / 1e9)
                  * (CAST(snum AS DOUBLE) / 1e9)
                  / (CAST(sden AS DOUBLE) / 1e9) * 10000 + {_OFF})
            AS BIGINT) AS chi2_e4
FROM agg WHERE sden > 0
"""


# ---------------------------------------------------------------------------
# mauchly_sphericity — Mauchly's (1940) W for p = 3 repeated measures
# (8-hour diel blocks per day), on the 2x2 Helmert-contrast covariance:
# W = det(Sc)/(tr(Sc)/2)^2, chi2 = -(n-2) ln W (df = 2; the p = 3
# correction factor is exactly 1).  Covariance from exact integer day
# sums; only complete days (all 3 blocks) enter.
# ---------------------------------------------------------------------------


def q_mauchly_sphericity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        (F.hour("ts") / 8).cast("long").alias("blk"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cell = ev.groupBy("event_type", "dom", "blk").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("mv")
    )
    wide = cell.groupBy("event_type", "dom").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.when(F.col("blk") == 0, F.col("mv")).otherwise(0)).alias(
            "m1"
        ),
        F.sum(F.when(F.col("blk") == 1, F.col("mv")).otherwise(0)).alias(
            "m2"
        ),
        F.sum(F.when(F.col("blk") == 2, F.col("mv")).otherwise(0)).alias(
            "m3"
        ),
    ).filter(F.col("nb") == 3)
    # Helmert contrasts scaled x2 to stay integer: c1x2 = sqrt2*(m1-m2)
    # carried as (m1 - m2) with the 1/2 factor folded analytically;
    # we use unnormalized u = m1 - m2, w = m1 + m2 - 2 m3 and rescale:
    # Sc = diag(1/2, 1/6)-scaled covariance of (u, w) — W is invariant
    # to the joint scale but NOT the relative one, so keep 1/2 and 1/6.
    agg = wide.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum(F.col("m1") - F.col("m2")).alias("su"),
        F.sum(F.col("m1") + F.col("m2") - 2 * F.col("m3")).alias("sw"),
        F.sum(
            (F.col("m1") - F.col("m2")) * (F.col("m1") - F.col("m2"))
        ).alias("suu"),
        F.sum(
            (F.col("m1") + F.col("m2") - 2 * F.col("m3"))
            * (F.col("m1") + F.col("m2") - 2 * F.col("m3"))
        ).alias("sww"),
        F.sum(
            (F.col("m1") - F.col("m2"))
            * (F.col("m1") + F.col("m2") - 2 * F.col("m3"))
        ).alias("suw"),
    )
    nd = F.col("nd").cast("double")
    a = (
        (F.col("suu").cast("double") - F.col("su").cast("double") ** 2 / nd)
        / (nd - 1.0)
        / 2.0
    )
    b = (
        (F.col("sww").cast("double") - F.col("sw").cast("double") ** 2 / nd)
        / (nd - 1.0)
        / 6.0
    )
    c = (
        (
            F.col("suw").cast("double")
            - F.col("su").cast("double") * F.col("sw").cast("double") / nd
        )
        / (nd - 1.0)
        / F.sqrt(F.lit(12.0))
    )
    w_st = (a * b - c * c) / (((a + b) / 2.0) * ((a + b) / 2.0))
    chi2 = -(nd - 2.0) * F.log(w_st)
    return agg.select(
        "event_type",
        F.col("nd").cast("long").alias("n_days"),
        F.floor(w_st * 1_000_000 + F.lit(_OFF)).cast("long").alias("w_e6"),
        F.floor(chi2 * 10_000 + F.lit(_OFF)).cast("long").alias("chi2_e4"),
        F.lit(2).cast("long").alias("df"),
    ).orderBy("event_type")


SQL_MAUCHLY = f"""
WITH cell AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(EXTRACT(hour FROM ts) // 8 AS BIGINT) AS blk,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS mv
  FROM events GROUP BY 1, 2, 3
), wide AS (
  SELECT event_type, dom,
         CAST(sum(CASE WHEN blk = 0 THEN mv ELSE 0 END) AS BIGINT) AS m1,
         CAST(sum(CASE WHEN blk = 1 THEN mv ELSE 0 END) AS BIGINT) AS m2,
         CAST(sum(CASE WHEN blk = 2 THEN mv ELSE 0 END) AS BIGINT) AS m3
  FROM cell GROUP BY 1, 2 HAVING count(*) = 3
), agg AS (
  SELECT event_type, count(*) AS nd,
         CAST(sum(m1 - m2) AS BIGINT) AS su,
         CAST(sum(m1 + m2 - 2 * m3) AS BIGINT) AS sw,
         CAST(sum((m1 - m2) * (m1 - m2)) AS BIGINT) AS suu,
         CAST(sum((m1 + m2 - 2 * m3) * (m1 + m2 - 2 * m3)) AS BIGINT)
           AS sww,
         CAST(sum((m1 - m2) * (m1 + m2 - 2 * m3)) AS BIGINT) AS suw
  FROM wide GROUP BY 1
), sc AS (
  SELECT event_type, CAST(nd AS DOUBLE) AS nd,
         (CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) / nd)
           / (nd - 1.0) / 2.0 AS a,
         (CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / nd)
           / (nd - 1.0) / 6.0 AS b,
         (CAST(suw AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sw AS DOUBLE) / nd)
           / (nd - 1.0) / sqrt(12.0) AS c
  FROM agg
)
SELECT event_type, CAST(nd AS BIGINT) AS n_days,
       CAST(floor((a * b - c * c) / (((a + b) / 2.0) * ((a + b) / 2.0))
                  * 1000000 + {_OFF}) AS BIGINT) AS w_e6,
       CAST(floor(-(nd - 2.0)
                  * ln((a * b - c * c) / (((a + b) / 2.0) * ((a + b) / 2.0)))
                  * 10000 + {_OFF}) AS BIGINT) AS chi2_e4,
       CAST(2 AS BIGINT) AS df
FROM sc ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cusum_tabular — two-sided tabular CUSUM (Page 1954) on daily means
# with k = sigma/2, h = 4 sigma, via the shuffle-free closed form
#   C+_t = S_t - min_{j<=t} S_j,  S_t = prefix sum of (x_t - mu - k)
# (and the mirrored form for C-).  All state is two prefix windows
# over the ~30-row day layer per type; increments are e4-floored ints.
# ---------------------------------------------------------------------------


def q_cusum_tabular(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    day = ev.groupBy("event_type", "dom").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("x")
    )
    st = day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    dd = F.col("d").cast("double")
    mu = F.col("sx").cast("double") / dd
    sig = F.sqrt(
        (F.col("sxx").cast("double") - F.col("sx").cast("double") * mu)
        / (dd - 1.0)
    )
    params = st.select(
        "event_type",
        F.floor(mu * 10_000 + F.lit(_OFF)).cast("long").alias("mu_e4"),
        F.floor(sig / 2.0 * 10_000 + F.lit(_OFF)).cast("long").alias("k_e4"),
        F.floor(sig * 4.0 * 10_000 + F.lit(_OFF)).cast("long").alias("h_e4"),
    )
    j = day.join(F.broadcast(params), "event_type")
    incp = 10_000 * F.col("x") - F.col("mu_e4") - F.col("k_e4")
    incn = F.col("mu_e4") - 10_000 * F.col("x") - F.col("k_e4")
    wo = Window.partitionBy("event_type").orderBy("dom").rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = (
        j.withColumn("sp", F.sum(incp).over(wo))
        .withColumn("sn", F.sum(incn).over(wo))
        .withColumn(
            "cp", F.col("sp") - F.least(F.min("sp").over(wo), F.lit(0))
        )
        .withColumn(
            "cn", F.col("sn") - F.least(F.min("sn").over(wo), F.lit(0))
        )
    )
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum((F.col("cp") > F.col("h_e4")).cast("long")).alias("n_pos"),
        F.sum((F.col("cn") > F.col("h_e4")).cast("long")).alias("n_neg"),
        F.max("cp").alias("cpmax"),
        F.max("cn").alias("cnmax"),
    )
    return agg.select(
        "event_type",
        F.col("d").cast("long").alias("d"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("cpmax").cast("long").alias("cpos_max_e4"),
        F.col("cnmax").cast("long").alias("cneg_max_e4"),
    ).orderBy("event_type")


SQL_CUSUM_TAB = f"""
WITH day AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), st AS (
  SELECT event_type, count(*) AS d,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM day GROUP BY 1
), params AS (
  SELECT event_type,
         CAST(floor(CAST(sx AS DOUBLE) / d * 10000 + {_OFF}) AS BIGINT)
           AS mu_e4,
         CAST(floor(sqrt((CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / d))
                         / (d - 1.0)) / 2.0 * 10000 + {_OFF}) AS BIGINT)
           AS k_e4,
         CAST(floor(sqrt((CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / d))
                         / (d - 1.0)) * 4.0 * 10000 + {_OFF}) AS BIGINT)
           AS h_e4
  FROM st
), s AS (
  SELECT day.event_type, dom, h_e4,
         sum(10000 * x - mu_e4 - k_e4)
           OVER (PARTITION BY day.event_type ORDER BY dom) AS sp,
         sum(mu_e4 - 10000 * x - k_e4)
           OVER (PARTITION BY day.event_type ORDER BY dom) AS sn
  FROM day JOIN params ON params.event_type = day.event_type
), r AS (
  SELECT event_type, h_e4, sp, sn,
         min(sp) OVER (PARTITION BY event_type ORDER BY dom) AS minp,
         min(sn) OVER (PARTITION BY event_type ORDER BY dom) AS minn
  FROM s
), c AS (
  SELECT event_type, h_e4,
         sp - least(minp, 0) AS cp,
         sn - least(minn, 0) AS cn
  FROM r
)
SELECT event_type, CAST(count(*) AS BIGINT) AS d,
       CAST(sum(CASE WHEN cp > h_e4 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN cn > h_e4 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(max(cp) AS BIGINT) AS cpos_max_e4,
       CAST(max(cn) AS BIGINT) AS cneg_max_e4
FROM c GROUP BY 1 ORDER BY event_type
"""


QUERIES.update(
    {
        "tarone_ware": q_tarone_ware,
        "peto_peto": q_peto_peto,
        "mauchly_sphericity": q_mauchly_sphericity,
        "cusum_tabular": q_cusum_tabular,
    }
)

ORACLE_SQL.update(
    {
        "tarone_ware": SQL_TARONE_WARE,
        "peto_peto": SQL_PETO_PETO,
        "mauchly_sphericity": SQL_MAUCHLY,
        "cusum_tabular": SQL_CUSUM_TAB,
    }
)


# ===========================================================================
# Battery G: corpus dispersion (Carroll's D2, Rosengren's S) on the
# documents table — companions to Juilland's D and Gries' DP already
# in the registry — plus Pesaran's CD cross-section-dependence test
# and a closed-form grid search for simple exponential smoothing.
# ===========================================================================

_G_K = 30


def _word_source_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense top-30-word x source grid with per-cell counts and part
    totals — the juilland_d / burrows_delta discipline (stats7/8)."""
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
    )
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.groupBy("w")
        .agg(F.sum("c").alias("gc"))
        .orderBy(F.desc("gc"), F.asc("w"))
        .limit(_G_K)
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    return (
        tot.crossJoin(F.broadcast(vocab))
        .join(cnt, ["source", "w"], "left")
        .fillna(0, subset=["c"])
    )


_SQL_GRID = f"""
  toks AS (
    SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
    FROM documents
  ), cnt AS (
    SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
  ), vocab AS (
    SELECT w, gc FROM (
      SELECT w, CAST(sum(c) AS BIGINT) AS gc FROM cnt GROUP BY 1
    ) ORDER BY gc DESC, w ASC LIMIT {_G_K}
  ), tot AS (
    SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1
  ), grid AS (
    SELECT tot.source, vocab.w, vocab.gc, tot.t, COALESCE(cnt.c, 0) AS c
    FROM tot CROSS JOIN vocab
    LEFT JOIN cnt ON cnt.source = tot.source AND cnt.w = vocab.w
  )
"""


# ---------------------------------------------------------------------------
# carroll_d2 — Carroll's (1970) entropy dispersion: D2 = H / log2(k)
# with H the Shannon entropy of the word's occurrence shares across
# parts (shares are exact integer ratios c_i / gc); zero cells drop out.
# ---------------------------------------------------------------------------


def q_carroll_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = _word_source_grid(spark, sf_dir).filter(F.col("c") > 0)
    p = F.col("c").cast("double") / F.col("gc").cast("double")
    term = F.floor(
        -p * F.log2(p) * 1e9 + F.lit(_OFF)
    ).cast("long")
    agg = grid.groupBy("w").agg(
        F.max("gc").alias("gc"),
        F.count(F.lit(1)).alias("k_used"),
        F.sum(term).alias("h9"),
    )
    kall = grid.select("source").distinct().count()
    d2 = F.col("h9").cast("double") / 1e9 / (
        F.log2(F.lit(float(kall)))
    )
    return agg.select(
        "w",
        F.col("gc").cast("long").alias("gc"),
        F.col("k_used").cast("long").alias("k_used"),
        F.floor(d2 * 1_000_000 + F.lit(_OFF)).cast("long").alias("d2_e6"),
    ).orderBy("w")


SQL_CARROLL_D2 = f"""
WITH {_SQL_GRID}, kk AS (
  SELECT CAST(count(DISTINCT source) AS BIGINT) AS k FROM grid
), terms AS (
  SELECT w, gc,
         CAST(floor(-(CAST(c AS DOUBLE) / gc)
                    * log2(CAST(c AS DOUBLE) / gc) * 1e9 + {_OFF})
              AS BIGINT) AS t9
  FROM grid WHERE c > 0
), agg AS (
  SELECT w, CAST(max(gc) AS BIGINT) AS gc, count(*) AS k_used,
         CAST(sum(t9) AS BIGINT) AS h9
  FROM terms GROUP BY 1
)
SELECT w, gc, CAST(k_used AS BIGINT) AS k_used,
       CAST(floor(CAST(h9 AS DOUBLE) / 1e9 / log2(CAST(k AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS d2_e6
FROM agg CROSS JOIN kk ORDER BY w
"""


# ---------------------------------------------------------------------------
# rosengren_s — Rosengren's (1971) adjusted-frequency dispersion:
# S = (sum_i sqrt(s_i v_i))^2 / f, s_i = part-size share, v_i = count
# in part, f = total count.  Per-cell sqrt terms e6-floored.
# ---------------------------------------------------------------------------


def q_rosengren_s(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = _word_source_grid(spark, sf_dir)
    ttot = grid.select("source", "t").distinct().agg(
        F.sum("t").alias("tt")
    )
    g = grid.crossJoin(F.broadcast(ttot))
    s_i = F.col("t").cast("double") / F.col("tt").cast("double")
    term = F.floor(
        F.sqrt(s_i * F.col("c").cast("double")) * 1_000_000 + F.lit(_OFF)
    ).cast("long")
    agg = g.groupBy("w").agg(
        F.max("gc").alias("gc"), F.sum(term).alias("s6")
    )
    s = F.col("s6").cast("double") / 1e6
    sros = s * s / F.col("gc").cast("double")
    return agg.select(
        "w",
        F.col("gc").cast("long").alias("gc"),
        F.floor(sros * 1_000_000 + F.lit(_OFF)).cast("long").alias("s_e6"),
    ).orderBy("w")


SQL_ROSENGREN = f"""
WITH {_SQL_GRID}, tt AS (
  SELECT CAST(sum(t) AS BIGINT) AS tt
  FROM (SELECT DISTINCT source, t FROM grid)
), terms AS (
  SELECT w, gc,
         CAST(floor(sqrt((CAST(t AS DOUBLE) / tt) * CAST(c AS DOUBLE))
                    * 1000000 + {_OFF}) AS BIGINT) AS t6
  FROM grid CROSS JOIN tt
), agg AS (
  SELECT w, CAST(max(gc) AS BIGINT) AS gc, CAST(sum(t6) AS BIGINT) AS s6
  FROM terms GROUP BY 1
)
SELECT w, gc,
       CAST(floor((CAST(s6 AS DOUBLE) / 1e6) * (CAST(s6 AS DOUBLE) / 1e6)
                  / gc * 1000000 + {_OFF}) AS BIGINT) AS s_e6
FROM agg ORDER BY w
"""


# ---------------------------------------------------------------------------
# pesaran_cd — Pesaran's (2004) cross-section dependence test over the
# k daily series (one per event type):
#   CD = sqrt(2 / (N(N-1))) * sum_{i<j} sqrt(T_ij) rho_ij
# with pairwise Pearson rho from exact integer day sums on common days.
# ---------------------------------------------------------------------------


def q_pesaran_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    day = ev.groupBy("event_type", "dom").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("x")
    )
    a = day.alias("a")
    b = day.alias("b")
    pr = a.join(
        b,
        (F.col("a.dom") == F.col("b.dom"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    )
    mom = pr.groupBy(
        F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
    ).agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("a.x").alias("sx"),
        F.sum("b.x").alias("sy"),
        F.sum(F.col("a.x") * F.col("a.x")).alias("sxx"),
        F.sum(F.col("b.x") * F.col("b.x")).alias("syy"),
        F.sum(F.col("a.x") * F.col("b.x")).alias("sxy"),
    )
    td = F.col("t").cast("double")
    num = td * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = F.sqrt(
        (td * F.col("sxx").cast("double") - F.col("sx").cast("double") ** 2)
        * (td * F.col("syy").cast("double") - F.col("sy").cast("double") ** 2)
    )
    rho = num / den
    terms = mom.select(
        F.floor(F.sqrt(td) * rho * 1e9 + F.lit(_OFF)).cast("long").alias(
            "c9"
        ),
        F.floor(F.abs(rho) * 1e9 + F.lit(_OFF)).cast("long").alias("ar9"),
    )
    n_types = day.select("event_type").distinct().count()
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("c9").alias("sc9"),
        F.sum("ar9").alias("sar9"),
    )
    cd = F.sqrt(F.lit(2.0 / (n_types * (n_types - 1.0)))) * (
        F.col("sc9").cast("double") / 1e9
    )
    return agg.select(
        F.lit(n_types).cast("long").alias("n_types"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.floor(cd * 10_000 + F.lit(_OFF)).cast("long").alias("cd_e4"),
        F.floor(
            F.col("sar9").cast("double") / 1e9 / F.col("n_pairs") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_absrho_e6"),
    )


SQL_PESARAN_CD = f"""
WITH day AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS t,
         CAST(sum(a.x) AS BIGINT) AS sx, CAST(sum(b.x) AS BIGINT) AS sy,
         CAST(sum(a.x * a.x) AS BIGINT) AS sxx,
         CAST(sum(b.x * b.x) AS BIGINT) AS syy,
         CAST(sum(a.x * b.x) AS BIGINT) AS sxy
  FROM day a JOIN day b
    ON a.dom = b.dom AND a.event_type < b.event_type
  GROUP BY 1, 2
), terms AS (
  SELECT CAST(floor(sqrt(CAST(t AS DOUBLE))
                    * ((t * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((t * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (t * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                    * 1e9 + {_OFF}) AS BIGINT) AS c9,
         CAST(floor(abs((t * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / sqrt((t * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                               * (t * CAST(syy AS DOUBLE)
                                  - CAST(sy AS DOUBLE)
                                    * CAST(sy AS DOUBLE))))
                    * 1e9 + {_OFF}) AS BIGINT) AS ar9
  FROM mom
), kk AS (
  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types FROM day
)
SELECT n_types, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(floor(sqrt(2.0 / (n_types * (n_types - 1.0)))
                  * (CAST(sum(c9) AS DOUBLE) / 1e9) * 10000 + {_OFF})
            AS BIGINT) AS cd_e4,
       CAST(floor(CAST(sum(ar9) AS DOUBLE) / 1e9 / count(*) * 1000000
                  + {_OFF}) AS BIGINT) AS mean_absrho_e6
FROM terms CROSS JOIN kk
GROUP BY n_types
"""


# ---------------------------------------------------------------------------
# ses_grid — simple exponential smoothing alpha grid (alpha = 0.1..0.9)
# on the daily-mean layer, with the level UNROLLED to its closed form
#   l_m = sum_{j<=m} w(alpha,m,j) x_j,  w(1) = (1-a)^(m-1),
#                                       w(j) = a (1-a)^(m-j)
# so there is no sequential recursion: the day self-join is ~T^2/2
# pairs on the BOUNDED day layer, never on raw rows.  One-step SSE
# picks the best alpha per type (ties to the smaller alpha).
# ---------------------------------------------------------------------------


def q_ses_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    day = ev.groupBy("event_type", "dom").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("x")
    )
    wt = Window.partitionBy("event_type").orderBy("dom")
    day = day.withColumn("t", F.row_number().over(wt))
    alphas = spark.range(1, 10).select(
        (F.col("id").cast("double") / 10.0).alias("alpha"),
        F.col("id").alias("a10"),
    )
    a = day.alias("a")  # anchor m
    b = day.alias("b")  # contributor j
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.t") <= F.col("a.t")),
        )
        .crossJoin(F.broadcast(alphas))
    )
    w = F.when(
        F.col("b.t") == 1,
        F.pow(1.0 - F.col("alpha"), F.col("a.t").cast("double") - 1.0),
    ).otherwise(
        F.col("alpha")
        * F.pow(
            1.0 - F.col("alpha"),
            (F.col("a.t") - F.col("b.t")).cast("double"),
        )
    )
    lvl = pairs.groupBy(
        F.col("a.event_type").alias("event_type"),
        F.col("a.t").alias("m"),
        "a10",
    ).agg(
        F.sum(
            F.floor(w * F.col("b.x") * 100 + F.lit(_OFF)).cast("long")
        ).alias("l_e2")
    )
    nxt = day.select(
        "event_type", (F.col("t") - 1).alias("m"), "x"
    ).filter(F.col("m") >= 1)
    err = nxt.join(lvl, ["event_type", "m"]).withColumn(
        "e_e2", 100 * F.col("x") - F.col("l_e2")
    )
    sse = err.groupBy("event_type", "a10").agg(
        F.sum(F.col("e_e2") * F.col("e_e2")).alias("sse_e4"),
        F.count(F.lit(1)).alias("h"),
    )
    wbest = Window.partitionBy("event_type").orderBy("sse_e4", "a10")
    best = sse.withColumn("rn", F.row_number().over(wbest)).filter(
        F.col("rn") == 1
    )
    tmax = day.groupBy("event_type").agg(F.max("t").alias("m"))
    fc = best.join(tmax, "event_type").join(
        lvl, ["event_type", "m", "a10"]
    )
    return fc.select(
        "event_type",
        F.col("a10").cast("long").alias("alpha_x10"),
        F.col("sse_e4").cast("long").alias("sse_e4"),
        F.col("l_e2").cast("long").alias("forecast_e2"),
    ).orderBy("event_type")


SQL_SES_GRID = f"""
WITH day0 AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), day AS (
  SELECT event_type, x,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY dom)
              AS BIGINT) AS t
  FROM day0
), alphas AS (
  SELECT CAST(a10 AS DOUBLE) / 10.0 AS alpha, a10
  FROM (SELECT unnest(generate_series(1, 9)) AS a10)
), lvl AS (
  SELECT a.event_type, a.t AS m, a10,
         CAST(sum(CAST(floor(
           (CASE WHEN b.t = 1
                 THEN (1.0 - alpha) ^ (CAST(a.t AS DOUBLE) - 1.0)
                 ELSE alpha * (1.0 - alpha)
                              ^ CAST(a.t - b.t AS DOUBLE) END)
           * b.x * 100 + {_OFF}) AS BIGINT)) AS BIGINT) AS l_e2
  FROM day a
  JOIN day b ON b.event_type = a.event_type AND b.t <= a.t
  CROSS JOIN alphas
  GROUP BY 1, 2, 3
), err AS (
  SELECT day.event_type, a10,
         100 * x - l_e2 AS e_e2
  FROM day JOIN lvl ON lvl.event_type = day.event_type
                   AND lvl.m = day.t - 1 AND lvl.a10 = a10
  WHERE day.t >= 2
), sse AS (
  SELECT event_type, a10,
         CAST(sum(e_e2 * e_e2) AS BIGINT) AS sse_e4
  FROM err GROUP BY 1, 2
), best AS (
  SELECT event_type, a10, sse_e4
  FROM sse
  QUALIFY row_number() OVER (PARTITION BY event_type
                             ORDER BY sse_e4, a10) = 1
), tmax AS (
  SELECT event_type, CAST(max(t) AS BIGINT) AS m FROM day GROUP BY 1
)
SELECT best.event_type,
       CAST(best.a10 AS BIGINT) AS alpha_x10,
       sse_e4,
       l_e2 AS forecast_e2
FROM best
JOIN tmax ON tmax.event_type = best.event_type
JOIN lvl ON lvl.event_type = best.event_type AND lvl.m = tmax.m
        AND lvl.a10 = best.a10
ORDER BY best.event_type
"""


QUERIES.update(
    {
        "carroll_d2": q_carroll_d2,
        "rosengren_s": q_rosengren_s,
        "pesaran_cd": q_pesaran_cd,
        "ses_grid": q_ses_grid,
    }
)

ORACLE_SQL.update(
    {
        "carroll_d2": SQL_CARROLL_D2,
        "rosengren_s": SQL_ROSENGREN,
        "pesaran_cd": SQL_PESARAN_CD,
        "ses_grid": SQL_SES_GRID,
    }
)


# ===========================================================================
# Battery H: superlative price indexes (Törnqvist, Walsh) completing
# the stats11 Laspeyres/Paasche/Fisher family, Knox space-time
# interaction, Chao2/Zelterman incidence richness, and the Gini mean
# difference as a closed-form value-domain scale estimator.
# ===========================================================================


# ---------------------------------------------------------------------------
# tornqvist_walsh — Törnqvist (1936) and Walsh (1901) superlative
# indexes on the weekly (type = basket item) panel, same p4/qty
# scaffold as price_indexes (stats11).  Share-weighted log terms and
# sqrt(q0 q1) baskets are e9-floored per item before the week sum.
# ---------------------------------------------------------------------------


def q_tornqvist_walsh(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.col("val").cast("double") / F.col("qty") * 100 + F.lit(_OFF)
        ).cast("long"),
    )
    nxt = wk.select(
        (F.col("week") - 1).alias("week"),
        "event_type",
        F.col("qty").alias("q1"),
        F.col("p4").alias("p1"),
    )
    j = wk.join(nxt, ["week", "event_type"])
    tot = j.groupBy("week").agg(
        F.sum(F.col("p4") * F.col("qty")).alias("t00"),
        F.sum(F.col("p1") * F.col("q1")).alias("t11"),
    )
    jt = j.join(F.broadcast(tot), "week")
    s0 = (F.col("p4") * F.col("qty")).cast("double") / F.col("t00")
    s1 = (F.col("p1") * F.col("q1")).cast("double") / F.col("t11")
    lt = F.floor(
        (s0 + s1)
        / 2.0
        * F.log(F.col("p1").cast("double") / F.col("p4"))
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    wq = F.sqrt(F.col("qty").cast("double") * F.col("q1"))
    wn = F.floor(F.col("p1") * wq * 100 + F.lit(_OFF)).cast("long")
    wd = F.floor(F.col("p4") * wq * 100 + F.lit(_OFF)).cast("long")
    agg = jt.groupBy("week").agg(
        F.count(F.lit(1)).alias("k_types"),
        F.sum(lt).alias("lt9"),
        F.sum(wn).alias("wn2"),
        F.sum(wd).alias("wd2"),
    )
    return agg.select(
        "week",
        F.col("k_types").cast("long").alias("k_types"),
        F.floor(
            F.exp(F.col("lt9").cast("double") / 1e9) * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("tornqvist_e6"),
        F.floor(
            F.col("wn2").cast("double") / F.col("wd2").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("walsh_e6"),
    ).orderBy("week")


SQL_TORNQVIST = f"""
WITH wk AS (
  SELECT CAST(floor(floor(epoch(ts) / 86400) / 7) AS BIGINT) AS week,
         event_type, count(*) AS qty,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS val
  FROM events GROUP BY 1, 2
), wp AS (
  SELECT week, event_type, qty,
         CAST(floor(CAST(val AS DOUBLE) / qty * 100 + {_OFF}) AS BIGINT)
           AS p4
  FROM wk
), j AS (
  SELECT a.week, a.event_type, a.qty, a.p4, b.qty AS q1, b.p4 AS p1
  FROM wp a JOIN wp b
    ON b.week = a.week + 1 AND b.event_type = a.event_type
), tot AS (
  SELECT week, CAST(sum(p4 * qty) AS BIGINT) AS t00,
         CAST(sum(p1 * q1) AS BIGINT) AS t11
  FROM j GROUP BY 1
), terms AS (
  SELECT j.week,
         CAST(floor((CAST(p4 * qty AS DOUBLE) / t00
                     + CAST(p1 * q1 AS DOUBLE) / t11) / 2.0
                    * ln(CAST(p1 AS DOUBLE) / p4) * 1e9 + {_OFF})
              AS BIGINT) AS lt9,
         CAST(floor(p1 * sqrt(CAST(qty AS DOUBLE) * q1) * 100 + {_OFF})
              AS BIGINT) AS wn2,
         CAST(floor(p4 * sqrt(CAST(qty AS DOUBLE) * q1) * 100 + {_OFF})
              AS BIGINT) AS wd2
  FROM j JOIN tot ON tot.week = j.week
)
SELECT week, CAST(count(*) AS BIGINT) AS k_types,
       CAST(floor(exp(CAST(sum(lt9) AS DOUBLE) / 1e9) * 1000000 + {_OFF})
            AS BIGINT) AS tornqvist_e6,
       CAST(floor(CAST(sum(wn2) AS DOUBLE) / CAST(sum(wd2) AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS walsh_e6
FROM terms GROUP BY 1 ORDER BY week
"""


# ---------------------------------------------------------------------------
# knox_test — Knox (1964) space-time interaction per event type:
# "space-close" = same user, "time-close" = within 1 hour.  The time
# pairing is a BANDED hour-bucket self-join (each unordered pair counted
# once: same-bucket by id order, adjacent-bucket by direction), so the
# pair stage scales with local density, never all-pairs.  z from the
# Poisson approximation X ~ Poisson(Ns Nt / Npairs).
# ---------------------------------------------------------------------------


def q_knox_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).withColumn("b", F.floor(F.col("us") / 3_600_000_000).cast("long"))
    a = ev.select(
        "event_type",
        F.col("user_id").alias("ua"),
        F.col("event_id").alias("ia"),
        F.col("us").alias("usa"),
        F.col("b").alias("ba"),
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("bb"),
    )
    pr = a.join(
        ev.select(
            "event_type",
            F.col("user_id").alias("ub"),
            F.col("event_id").alias("ib"),
            F.col("us").alias("usb"),
            F.col("b").alias("bbr"),
        ),
        ["event_type"],
    ).filter(
        (F.col("bb") == F.col("bbr"))
        & (
            ((F.col("bbr") == F.col("ba")) & (F.col("ia") < F.col("ib")))
            | (F.col("bbr") == F.col("ba") + 1)
        )
        & (F.abs(F.col("usa") - F.col("usb")) <= 3_600_000_000)
    )
    tpairs = pr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nt"),
        F.sum((F.col("ua") == F.col("ub")).cast("long")).alias("x"),
    )
    su = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("nu")
    )
    stats = su.groupBy("event_type").agg(
        F.sum("nu").alias("n"),
        F.sum(F.col("nu") * (F.col("nu") - 1) / 2).cast("long").alias("ns"),
    )
    out = tpairs.join(stats, "event_type")
    npairs = (
        F.col("n").cast("double") * (F.col("n") - 1).cast("double") / 2.0
    )
    e = F.col("ns").cast("double") * F.col("nt").cast("double") / npairs
    z = (F.col("x").cast("double") - e) / F.sqrt(e)
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("nt").cast("long").alias("n_time"),
        F.col("ns").cast("long").alias("n_space"),
        F.col("x").cast("long").alias("x"),
        F.floor(e * 10_000 + F.lit(_OFF)).cast("long").alias("e_e4"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


SQL_KNOX = f"""
WITH e AS (
  SELECT event_type, user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS b
  FROM events
), a AS (
  SELECT event_type, user_id AS ua, event_id AS ia, us AS usa, b AS ba,
         unnest([b, b + 1]) AS bb
  FROM e
), pr AS (
  SELECT a.event_type, ua, e.user_id AS ub
  FROM a JOIN e ON e.event_type = a.event_type AND e.b = a.bb
  WHERE ((e.b = a.ba AND a.ia < e.event_id) OR e.b = a.ba + 1)
    AND abs(a.usa - e.us) <= 3600000000
), tpairs AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nt,
         CAST(sum(CASE WHEN ua = ub THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM pr GROUP BY 1
), su AS (
  SELECT event_type, user_id, count(*) AS nu FROM e GROUP BY 1, 2
), stats AS (
  SELECT event_type, CAST(sum(nu) AS BIGINT) AS n,
         CAST(sum(nu * (nu - 1) // 2) AS BIGINT) AS ns
  FROM su GROUP BY 1
)
SELECT tpairs.event_type, n, nt AS n_time, ns AS n_space, x,
       CAST(floor(CAST(ns AS DOUBLE) * CAST(nt AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)
                  * 10000 + {_OFF}) AS BIGINT) AS e_e4,
       CAST(floor((CAST(x AS DOUBLE)
                   - CAST(ns AS DOUBLE) * CAST(nt AS DOUBLE)
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0))
                  / sqrt(CAST(ns AS DOUBLE) * CAST(nt AS DOUBLE)
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                            / 2.0))
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM tpairs JOIN stats ON stats.event_type = tpairs.event_type
ORDER BY tpairs.event_type
"""


# ---------------------------------------------------------------------------
# chao2_incidence — incidence-based richness of the value support:
# species = distinct centi-values, samples = days (per type).  How many
# distinct values would exhaustive observation reveal?  Bias-corrected
# Chao2 (Chao 1987) from singleton/doubleton day-incidence counts plus
# Zelterman's (1988) truncated-Poisson estimate — the incidence twin
# of chao1_ace (stats10, abundance-based).
# ---------------------------------------------------------------------------


def q_chao2_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.dayofmonth("ts").alias("dom"),
            F.floor(F.col("value") * 100 + F.lit(_OFF))
            .cast("long")
            .alias("v"),
        )
        .distinct()
    )
    inc = ev.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("d"))
    m = ev.groupBy("event_type").agg(F.countDistinct("dom").alias("m"))
    agg = inc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("s_obs"),
        F.sum((F.col("d") == 1).cast("long")).alias("q1"),
        F.sum((F.col("d") == 2).cast("long")).alias("q2"),
    ).join(F.broadcast(m), "event_type")
    md = F.col("m").cast("double")
    q1 = F.col("q1").cast("double")
    q2 = F.col("q2").cast("double")
    chao2 = F.col("s_obs").cast("double") + (md - 1.0) / md * q1 * (
        q1 - 1.0
    ) / (2.0 * (q2 + 1.0))
    zelt = F.col("s_obs").cast("double") / (
        1.0 - F.exp(-2.0 * q2 / q1)
    )
    return agg.filter((F.col("q1") > 0) & (F.col("q2") > 0)).select(
        "event_type",
        F.col("s_obs").cast("long").alias("s_obs"),
        F.col("q1").cast("long").alias("q1"),
        F.col("q2").cast("long").alias("q2"),
        F.col("m").cast("long").alias("m"),
        F.floor(chao2 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "chao2_e4"
        ),
        F.floor(zelt * 10_000 + F.lit(_OFF)).cast("long").alias("zelt_e4"),
    ).orderBy("event_type")


SQL_CHAO2 = f"""
WITH ev AS (
  SELECT DISTINCT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), inc AS (
  SELECT event_type, v, count(*) AS d FROM ev GROUP BY 1, 2
), m AS (
  SELECT event_type, CAST(count(DISTINCT dom) AS BIGINT) AS m
  FROM ev GROUP BY 1
), agg AS (
  SELECT inc.event_type, count(*) AS s_obs,
         CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,
         CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS q2
  FROM inc GROUP BY 1
)
SELECT agg.event_type, CAST(s_obs AS BIGINT) AS s_obs, q1, q2, m,
       CAST(floor((s_obs + (CAST(m AS DOUBLE) - 1.0) / m
                           * q1 * (CAST(q1 AS DOUBLE) - 1.0)
                           / (2.0 * (q2 + 1.0))) * 10000 + {_OFF})
            AS BIGINT) AS chao2_e4,
       CAST(floor(s_obs / (1.0 - exp(-2.0 * CAST(q2 AS DOUBLE) / q1))
                  * 10000 + {_OFF}) AS BIGINT) AS zelt_e4
FROM agg JOIN m ON m.event_type = agg.event_type
WHERE q1 > 0 AND q2 > 0
ORDER BY agg.event_type
"""


# ---------------------------------------------------------------------------
# gmd_scale — Gini mean difference as a robust scale estimator
# (Gini 1912; Yitzhaki 2003) with its relative form (the value Gini):
#   GMD = 2/(n(n-1)) * sum_i x_(i) (2i - n - 1)
# The position sum telescopes per tie block (exact integers on the
# value domain) — no pair join at all.
# ---------------------------------------------------------------------------


def q_gmd_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cv = ev.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("tcnt"))
    wo = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    rv = (
        cv.withColumn("cum", F.sum("tcnt").over(wo))
        .withColumn("n", F.sum("tcnt").over(wn))
    )
    lo1 = F.col("cum") - F.col("tcnt")
    # sum over block of (2i - n - 1) =
    #   cum(cum+1) - lo1(lo1+1) - (n+1) tcnt
    wsum = (
        F.col("cum") * (F.col("cum") + 1)
        - lo1 * (lo1 + 1)
        - (F.col("n") + 1) * F.col("tcnt")
    )
    agg = rv.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("v") * wsum).alias("s"),
        F.sum(F.col("v") * F.col("tcnt")).alias("sv"),
    )
    n = F.col("n").cast("double")
    gmd = 2.0 * F.col("s").cast("double") / (n * (n - 1.0))
    mean = F.col("sv").cast("double") / n
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(gmd * 10_000 + F.lit(_OFF)).cast("long").alias("gmd_e4"),
        F.floor(gmd / (2.0 * mean) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("gini_e6"),
    ).orderBy("event_type")


SQL_GMD = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cv AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS tcnt
  FROM ev GROUP BY 1, 2
), rv AS (
  SELECT event_type, v, tcnt,
         CAST(sum(tcnt) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) AS cum,
         CAST(sum(tcnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM cv
), agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(v * (cum * (cum + 1)
                       - (cum - tcnt) * (cum - tcnt + 1)
                       - (n + 1) * tcnt)) AS BIGINT) AS s,
         CAST(sum(v * tcnt) AS BIGINT) AS sv
  FROM rv GROUP BY 1
)
SELECT event_type, n,
       CAST(floor(2.0 * CAST(s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                  * 10000 + {_OFF}) AS BIGINT) AS gmd_e4,
       CAST(floor(2.0 * CAST(s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                  / (2.0 * CAST(sv AS DOUBLE) / n) * 1000000 + {_OFF})
            AS BIGINT) AS gini_e6
FROM agg ORDER BY event_type
"""


QUERIES.update(
    {
        "tornqvist_walsh": q_tornqvist_walsh,
        "knox_test": q_knox_test,
        "chao2_incidence": q_chao2_incidence,
        "gmd_scale": q_gmd_scale,
    }
)

ORACLE_SQL.update(
    {
        "tornqvist_walsh": SQL_TORNQVIST,
        "knox_test": SQL_KNOX,
        "chao2_incidence": SQL_CHAO2,
        "gmd_scale": SQL_GMD,
    }
)


# ===========================================================================
# Battery I: smooth GoF, Gini correlation, a Poisson GLM via fixed
# Newton steps on the collapsed hour domain, and Kaplan-Meier with the
# Greenwood variance — all on bounded domains (value/hour/day layers).
# ===========================================================================


# ---------------------------------------------------------------------------
# neyman_smooth — Neyman's (1937) smooth test of normality on the PIT
# values u = Phi(z): N4 = sum_k (1/n) (sum_i phi_k(u_i))^2 with the
# orthonormal shifted-Legendre components phi_1..phi_4.  u is constant
# within a tie block, so each component sum collapses to the value
# domain with exact tcnt weights.
# ---------------------------------------------------------------------------


def q_neyman_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    pb = _phi_blocks(spark, sf_dir)
    u = F.col("f_e9").cast("double") / 1e9
    p1 = F.sqrt(F.lit(3.0)) * (2.0 * u - 1.0)
    p2 = F.sqrt(F.lit(5.0)) * (6.0 * u * u - 6.0 * u + 1.0)
    p3 = F.sqrt(F.lit(7.0)) * (
        20.0 * u * u * u - 30.0 * u * u + 12.0 * u - 1.0
    )
    p4 = 3.0 * (
        70.0 * u * u * u * u
        - 140.0 * u * u * u
        + 90.0 * u * u
        - 20.0 * u
        + 1.0
    )
    agg = pb.groupBy("event_type").agg(
        F.max("n").alias("n"),
        *[
            F.sum(
                F.col("tcnt")
                * F.floor(p * 1_000_000 + F.lit(_OFF)).cast("long")
            ).alias(f"s{k}")
            for k, p in [(1, p1), (2, p2), (3, p3), (4, p4)]
        ],
    )
    n = F.col("n").cast("double")
    comps = [
        (F.col(f"s{k}").cast("double") / 1e6)
        * (F.col(f"s{k}").cast("double") / 1e6)
        / n
        for k in (1, 2, 3, 4)
    ]
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        *[
            F.floor(c * 10_000 + F.lit(_OFF)).cast("long").alias(
                f"n{k}_e4"
            )
            for k, c in zip((1, 2, 3, 4), comps)
        ],
        F.floor(
            (comps[0] + comps[1] + comps[2] + comps[3]) * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("total_e4"),
    ).orderBy("event_type")


SQL_NEYMAN = f"""
WITH {_SQL_PHI}, terms AS (
  SELECT event_type, n, tcnt,
         CAST(floor(sqrt(3.0) * (2.0 * (CAST(f_e9 AS DOUBLE) / 1e9) - 1.0)
                    * 1000000 + {_OFF}) AS BIGINT) AS t1,
         CAST(floor(sqrt(5.0) * (6.0 * (CAST(f_e9 AS DOUBLE) / 1e9)
                                     * (CAST(f_e9 AS DOUBLE) / 1e9)
                                 - 6.0 * (CAST(f_e9 AS DOUBLE) / 1e9) + 1.0)
                    * 1000000 + {_OFF}) AS BIGINT) AS t2,
         CAST(floor(sqrt(7.0) * (20.0 * (CAST(f_e9 AS DOUBLE) / 1e9)
                                      * (CAST(f_e9 AS DOUBLE) / 1e9)
                                      * (CAST(f_e9 AS DOUBLE) / 1e9)
                                 - 30.0 * (CAST(f_e9 AS DOUBLE) / 1e9)
                                        * (CAST(f_e9 AS DOUBLE) / 1e9)
                                 + 12.0 * (CAST(f_e9 AS DOUBLE) / 1e9)
                                 - 1.0)
                    * 1000000 + {_OFF}) AS BIGINT) AS t3,
         CAST(floor(3.0 * (70.0 * (CAST(f_e9 AS DOUBLE) / 1e9)
                                * (CAST(f_e9 AS DOUBLE) / 1e9)
                                * (CAST(f_e9 AS DOUBLE) / 1e9)
                                * (CAST(f_e9 AS DOUBLE) / 1e9)
                           - 140.0 * (CAST(f_e9 AS DOUBLE) / 1e9)
                                   * (CAST(f_e9 AS DOUBLE) / 1e9)
                                   * (CAST(f_e9 AS DOUBLE) / 1e9)
                           + 90.0 * (CAST(f_e9 AS DOUBLE) / 1e9)
                                  * (CAST(f_e9 AS DOUBLE) / 1e9)
                           - 20.0 * (CAST(f_e9 AS DOUBLE) / 1e9) + 1.0)
                    * 1000000 + {_OFF}) AS BIGINT) AS t4
  FROM pb
), agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(sum(tcnt * t1) AS BIGINT) AS s1,
         CAST(sum(tcnt * t2) AS BIGINT) AS s2,
         CAST(sum(tcnt * t3) AS BIGINT) AS s3,
         CAST(sum(tcnt * t4) AS BIGINT) AS s4
  FROM terms GROUP BY 1
)
SELECT event_type, n,
       CAST(floor((CAST(s1 AS DOUBLE) / 1e6) * (CAST(s1 AS DOUBLE) / 1e6)
                  / n * 10000 + {_OFF}) AS BIGINT) AS n1_e4,
       CAST(floor((CAST(s2 AS DOUBLE) / 1e6) * (CAST(s2 AS DOUBLE) / 1e6)
                  / n * 10000 + {_OFF}) AS BIGINT) AS n2_e4,
       CAST(floor((CAST(s3 AS DOUBLE) / 1e6) * (CAST(s3 AS DOUBLE) / 1e6)
                  / n * 10000 + {_OFF}) AS BIGINT) AS n3_e4,
       CAST(floor((CAST(s4 AS DOUBLE) / 1e6) * (CAST(s4 AS DOUBLE) / 1e6)
                  / n * 10000 + {_OFF}) AS BIGINT) AS n4_e4,
       CAST(floor(((CAST(s1 AS DOUBLE) / 1e6) * (CAST(s1 AS DOUBLE) / 1e6)
                   / n
                   + (CAST(s2 AS DOUBLE) / 1e6) * (CAST(s2 AS DOUBLE) / 1e6)
                     / n
                   + (CAST(s3 AS DOUBLE) / 1e6) * (CAST(s3 AS DOUBLE) / 1e6)
                     / n
                   + (CAST(s4 AS DOUBLE) / 1e6) * (CAST(s4 AS DOUBLE) / 1e6)
                     / n) * 10000 + {_OFF}) AS BIGINT) AS total_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# gini_correlation — Schechtman & Yitzhaki (1987) Gini correlations
# between type daily series: G(x|y) = cov(x, r(y)) / cov(x, r(x)),
# asymmetric in both directions.  Doubled average ranks per series
# keep every moment an exact integer.
# ---------------------------------------------------------------------------


def q_gini_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    day = ev.groupBy("event_type", "dom").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("x")
    )
    wv = Window.partitionBy("event_type").orderBy("x")
    wt = Window.partitionBy("event_type", "x")
    day = day.withColumn(
        "r2", 2 * F.rank().over(wv) + F.count(F.lit(1)).over(wt) - 1
    )
    a = day.alias("a")
    b = day.alias("b")
    pr = a.join(
        b,
        (F.col("a.dom") == F.col("b.dom"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    )
    mom = pr.groupBy(
        F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
    ).agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("a.x").alias("sxa"),
        F.sum("b.x").alias("sxb"),
        F.sum("a.r2").alias("sra"),
        F.sum("b.r2").alias("srb"),
        F.sum(F.col("a.x") * F.col("b.r2")).alias("sab"),
        F.sum(F.col("a.x") * F.col("a.r2")).alias("saa"),
        F.sum(F.col("b.x") * F.col("a.r2")).alias("sba"),
        F.sum(F.col("b.x") * F.col("b.r2")).alias("sbb"),
    )
    t = F.col("t").cast("double")

    def cov(sxy, sx, sy) -> Column:
        return (
            F.col(sxy).cast("double")
            - F.col(sx).cast("double") * F.col(sy).cast("double") / t
        )

    gab = cov("sab", "sxa", "srb") / cov("saa", "sxa", "sra")
    gba = cov("sba", "sxb", "sra") / cov("sbb", "sxb", "srb")
    return mom.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("t").cast("long").alias("days"),
        F.floor(gab * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "g_ab_e6"
        ),
        F.floor(gba * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "g_ba_e6"
        ),
    ).orderBy("type_a", "type_b")


SQL_GINI_CORR = f"""
WITH day0 AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), day AS (
  SELECT event_type, dom, x,
         2 * rank() OVER (PARTITION BY event_type ORDER BY x)
           + count(*) OVER (PARTITION BY event_type, x) - 1 AS r2
  FROM day0
), mom AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS t,
         CAST(sum(a.x) AS BIGINT) AS sxa,
         CAST(sum(b.x) AS BIGINT) AS sxb,
         CAST(sum(a.r2) AS BIGINT) AS sra,
         CAST(sum(b.r2) AS BIGINT) AS srb,
         CAST(sum(a.x * b.r2) AS BIGINT) AS sab,
         CAST(sum(a.x * a.r2) AS BIGINT) AS saa,
         CAST(sum(b.x * a.r2) AS BIGINT) AS sba,
         CAST(sum(b.x * b.r2) AS BIGINT) AS sbb
  FROM day a JOIN day b
    ON a.dom = b.dom AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b, CAST(t AS BIGINT) AS days,
       CAST(floor((CAST(sab AS DOUBLE)
                   - CAST(sxa AS DOUBLE) * CAST(srb AS DOUBLE) / t)
                  / (CAST(saa AS DOUBLE)
                     - CAST(sxa AS DOUBLE) * CAST(sra AS DOUBLE) / t)
                  * 1000000 + {_OFF}) AS BIGINT) AS g_ab_e6,
       CAST(floor((CAST(sba AS DOUBLE)
                   - CAST(sxb AS DOUBLE) * CAST(sra AS DOUBLE) / t)
                  / (CAST(sbb AS DOUBLE)
                     - CAST(sxb AS DOUBLE) * CAST(srb AS DOUBLE) / t)
                  * 1000000 + {_OFF}) AS BIGINT) AS g_ba_e6
FROM mom ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# poisson_glm_newton — Poisson log-linear GLM of hourly counts on
# centered hour, fitted by TWO explicit Newton-Raphson steps from
# (ln ybar, 0) — deterministic fixed-iteration IRLS with no driver
# loop: each step is one aggregate over the 24-cell hour domain.
# Reports the coefficients and the Pearson chi-square.
# ---------------------------------------------------------------------------


def q_poisson_glm_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.hour("ts").alias("hh")
    )
    cell = ev.groupBy("event_type", "hh").agg(
        F.count(F.lit(1)).alias("y")
    ).withColumn("x", F.col("hh").cast("double") - 11.5)

    def newton(df: DataFrame) -> DataFrame:
        mu = F.exp(F.col("b0") + F.col("b1") * F.col("x"))
        m6 = F.floor(mu * 1_000_000 + F.lit(_OFF)).cast("long")
        g = df.groupBy("event_type", "b0", "b1").agg(
            F.sum(F.col("y") * 1_000_000 - m6).alias("g0"),
            F.sum(
                F.floor(
                    F.col("x") * (F.col("y") * 1_000_000 - m6)
                    + F.lit(_OFF)
                ).cast("long")
            ).alias("g1"),
            F.sum(m6).alias("h00"),
            F.sum(
                F.floor(F.col("x") * m6 + F.lit(_OFF)).cast("long")
            ).alias("h01"),
            F.sum(
                F.floor(F.col("x") * F.col("x") * m6 + F.lit(_OFF)).cast(
                    "long"
                )
            ).alias("h11"),
        )
        det = (
            F.col("h00").cast("double") * F.col("h11").cast("double")
            - F.col("h01").cast("double") * F.col("h01").cast("double")
        )
        nb0 = F.col("b0") + (
            F.col("h11").cast("double") * F.col("g0").cast("double")
            - F.col("h01").cast("double") * F.col("g1").cast("double")
        ) / det
        nb1 = F.col("b1") + (
            F.col("h00").cast("double") * F.col("g1").cast("double")
            - F.col("h01").cast("double") * F.col("g0").cast("double")
        ) / det
        return g.select("event_type", nb0.alias("b0"), nb1.alias("b1"))

    init = cell.groupBy("event_type").agg(
        F.log(
            F.sum("y").cast("double") / F.count(F.lit(1))
        ).alias("b0"),
        F.lit(0.0).alias("b1"),
    )
    p1 = newton(cell.join(F.broadcast(init), "event_type"))
    p2 = newton(cell.join(F.broadcast(p1), "event_type"))
    fin = cell.join(F.broadcast(p2), "event_type")
    mu = F.exp(F.col("b0") + F.col("b1") * F.col("x"))
    chi = F.floor(
        (F.col("y") - mu) * (F.col("y") - mu) / mu * 1_000_000 + F.lit(_OFF)
    ).cast("long")
    out = fin.groupBy("event_type", "b0", "b1").agg(
        F.sum(chi).alias("chi6"), F.count(F.lit(1)).alias("cells")
    )
    return out.select(
        "event_type",
        F.col("cells").cast("long").alias("cells"),
        F.floor(F.col("b0") * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "b0_e6"
        ),
        F.floor(F.col("b1") * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "b1_e6"
        ),
        F.floor(F.col("chi6").cast("double") / 1e6 * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("pearson_e4"),
    ).orderBy("event_type")


def _sql_newton(src: str, out: str) -> str:
    return f"""
  {out} AS (
    SELECT g.event_type,
           b0 + (CAST(h11 AS DOUBLE) * g0 - CAST(h01 AS DOUBLE) * g1)
                / (CAST(h00 AS DOUBLE) * h11
                   - CAST(h01 AS DOUBLE) * h01) AS b0,
           b1 + (CAST(h00 AS DOUBLE) * g1 - CAST(h01 AS DOUBLE) * g0)
                / (CAST(h00 AS DOUBLE) * h11
                   - CAST(h01 AS DOUBLE) * h01) AS b1
    FROM (
      SELECT cell.event_type, b0, b1,
             CAST(sum(y * 1000000
                      - CAST(floor(exp(b0 + b1 * x) * 1000000 + {_OFF})
                             AS BIGINT)) AS BIGINT) AS g0,
             CAST(sum(CAST(floor(x * (y * 1000000
                      - CAST(floor(exp(b0 + b1 * x) * 1000000 + {_OFF})
                             AS BIGINT)) + {_OFF}) AS BIGINT))
                  AS BIGINT) AS g1,
             CAST(sum(CAST(floor(exp(b0 + b1 * x) * 1000000 + {_OFF})
                           AS BIGINT)) AS BIGINT) AS h00,
             CAST(sum(CAST(floor(x * CAST(floor(exp(b0 + b1 * x) * 1000000
                                                + {_OFF}) AS BIGINT)
                                 + {_OFF}) AS BIGINT)) AS BIGINT) AS h01,
             CAST(sum(CAST(floor(x * x * CAST(floor(exp(b0 + b1 * x)
                                                    * 1000000 + {_OFF})
                                               AS BIGINT)
                                 + {_OFF}) AS BIGINT)) AS BIGINT) AS h11
      FROM cell JOIN {src} ON {src}.event_type = cell.event_type
      GROUP BY 1, 2, 3
    ) g
  )
"""


SQL_POISSON_GLM = f"""
WITH cell AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS y,
         EXTRACT(hour FROM ts) - 11.5 AS x
  FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
), init AS (
  SELECT event_type,
         ln(CAST(sum(y) AS DOUBLE) / count(*)) AS b0, 0.0 AS b1
  FROM cell GROUP BY 1
), {_sql_newton("init", "p1")}, {_sql_newton("p1", "p2")}
SELECT cell.event_type,
       CAST(count(*) AS BIGINT) AS cells,
       CAST(floor(b0 * 1000000 + {_OFF}) AS BIGINT) AS b0_e6,
       CAST(floor(b1 * 1000000 + {_OFF}) AS BIGINT) AS b1_e6,
       CAST(floor(CAST(sum(CAST(floor((y - exp(b0 + b1 * x))
                                      * (y - exp(b0 + b1 * x))
                                      / exp(b0 + b1 * x) * 1000000
                                      + {_OFF}) AS BIGINT)) AS DOUBLE)
                  / 1e6 * 10000 + {_OFF}) AS BIGINT) AS pearson_e4
FROM cell JOIN p2 ON p2.event_type = cell.event_type
GROUP BY 1, b0, b1
ORDER BY cell.event_type
"""


# ---------------------------------------------------------------------------
# km_greenwood — Kaplan-Meier survivor curve of user lifetimes with the
# Greenwood (1926) variance: S via prefix sums of e9-floored
# ln(1 - d/n), Var = S^2 * prefix sum of e12-floored d/(n(n-d)),
# plus the linear 95% band (z = 1.96).  All on the bounded lifetime
# domain; censoring-free design documented (shared with logrank_test).
# ---------------------------------------------------------------------------


def q_km_greenwood(spark: SparkSession, sf_dir: str) -> DataFrame:
    risk = _survival_risk(spark, sf_dir).filter(
        F.col("n") > F.col("d")
    )
    lns = F.floor(
        F.log(
            1.0 - F.col("d").cast("double") / F.col("n").cast("double")
        )
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    gw = F.floor(
        F.col("d").cast("double")
        / (
            F.col("n").cast("double")
            * (F.col("n") - F.col("d")).cast("double")
        )
        * 1e12
        + F.lit(_OFF)
    ).cast("long")
    wa = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    r = (
        risk.withColumn("lnS9", F.sum(lns).over(wa))
        .withColumn("gw12", F.sum(gw).over(wa))
    )
    s = F.exp(F.col("lnS9").cast("double") / 1e9)
    se = s * F.sqrt(F.col("gw12").cast("double") / 1e12)
    return r.select(
        "t",
        F.col("d").cast("long").alias("d"),
        F.col("n").cast("long").alias("n_risk"),
        F.floor(s * 1_000_000 + F.lit(_OFF)).cast("long").alias("s_e6"),
        F.floor(se * 1_000_000 + F.lit(_OFF)).cast("long").alias("se_e6"),
        F.floor((s - 1.96 * se) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("lo_e6"),
        F.floor((s + 1.96 * se) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("hi_e6"),
    ).orderBy("t")


SQL_KM_GREENWOOD = f"""
WITH {_SQL_RISK}, pre AS (
  SELECT t, d, n,
         CAST(sum(CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n) * 1e9
                             + {_OFF}) AS BIGINT))
              OVER (ORDER BY t) AS BIGINT) AS lnS9,
         CAST(sum(CAST(floor(CAST(d AS DOUBLE)
                             / (CAST(n AS DOUBLE) * (n - d)) * 1e12
                             + {_OFF}) AS BIGINT))
              OVER (ORDER BY t) AS BIGINT) AS gw12
  FROM risk WHERE n > d
)
SELECT t, d, n AS n_risk,
       CAST(floor(exp(CAST(lnS9 AS DOUBLE) / 1e9) * 1000000 + {_OFF})
            AS BIGINT) AS s_e6,
       CAST(floor(exp(CAST(lnS9 AS DOUBLE) / 1e9)
                  * sqrt(CAST(gw12 AS DOUBLE) / 1e12) * 1000000 + {_OFF})
            AS BIGINT) AS se_e6,
       CAST(floor((exp(CAST(lnS9 AS DOUBLE) / 1e9)
                   - 1.96 * exp(CAST(lnS9 AS DOUBLE) / 1e9)
                     * sqrt(CAST(gw12 AS DOUBLE) / 1e12)) * 1000000
                  + {_OFF}) AS BIGINT) AS lo_e6,
       CAST(floor((exp(CAST(lnS9 AS DOUBLE) / 1e9)
                   + 1.96 * exp(CAST(lnS9 AS DOUBLE) / 1e9)
                     * sqrt(CAST(gw12 AS DOUBLE) / 1e12)) * 1000000
                  + {_OFF}) AS BIGINT) AS hi_e6
FROM pre ORDER BY t
"""


QUERIES.update(
    {
        "neyman_smooth": q_neyman_smooth,
        "gini_correlation": q_gini_correlation,
        "poisson_glm_newton": q_poisson_glm_newton,
        "km_greenwood": q_km_greenwood,
    }
)

ORACLE_SQL.update(
    {
        "neyman_smooth": SQL_NEYMAN,
        "gini_correlation": SQL_GINI_CORR,
        "poisson_glm_newton": SQL_POISSON_GLM,
        "km_greenwood": SQL_KM_GREENWOOD,
    }
)


# ===========================================================================
# Battery J: Fisher k-statistics (unbiased cumulants), Rao's circular
# spacing test on time-of-day, and the two classic count-model
# diagnostics (Hoaglin's Poissonness plot, Ord's ratio plot) on the
# lines-per-order distribution of the TPC-H lineitem table.
# ===========================================================================

from diive_spark.queries_stats15 import _lngamma, _lngamma_sql  # noqa: E402


# ---------------------------------------------------------------------------
# fisher_kstats — Fisher's (1930) unbiased cumulant estimates k1..k4
# and the g1/g2 shape ratios, from exact integer power sums of the
# value-unit deviations dv = floor((v - c)/100) (centered at the
# type's floored mean c so fourth powers stay far inside int64;
# the coarsening to value units is part of the statistic definition).
# ---------------------------------------------------------------------------


def q_fisher_kstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    c = ev.groupBy("event_type").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("c")
    )
    d = ev.join(F.broadcast(c), "event_type").withColumn(
        "dv",
        F.floor((F.col("v") - F.col("c")) / 100.0 + F.lit(_OFF)).cast(
            "long"
        ),
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dv").alias("s1"),
        F.sum(F.col("dv") * F.col("dv")).alias("s2"),
        F.sum(F.col("dv") * F.col("dv") * F.col("dv")).alias("s3"),
        F.sum(
            F.col("dv") * F.col("dv") * F.col("dv") * F.col("dv")
        ).alias("s4"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    k2 = (n * s2 - s1 * s1) / (n * (n - 1.0))
    k3 = (2.0 * s1 * s1 * s1 - 3.0 * n * s1 * s2 + n * n * s3) / (
        n * (n - 1.0) * (n - 2.0)
    )
    k4 = (
        -6.0 * s1 * s1 * s1 * s1
        + 12.0 * n * s1 * s1 * s2
        - 3.0 * n * (n - 1.0) * s2 * s2
        - 4.0 * n * (n + 1.0) * s1 * s3
        + n * n * (n + 1.0) * s4
    ) / (n * (n - 1.0) * (n - 2.0) * (n - 3.0))
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(k2 * 10_000 + F.lit(_OFF)).cast("long").alias("k2_e4"),
        F.floor(k3 * 10_000 + F.lit(_OFF)).cast("long").alias("k3_e4"),
        F.floor(k4 * 10_000 + F.lit(_OFF)).cast("long").alias("k4_e4"),
        F.floor(k3 / F.pow(k2, 1.5) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("g1_e6"),
        F.floor(k4 / (k2 * k2) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("g2_e6"),
    ).orderBy("event_type")


SQL_KSTATS = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), c AS (
  SELECT event_type,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + {_OFF}) AS BIGINT)
           AS c
  FROM ev GROUP BY 1
), d AS (
  SELECT ev.event_type,
         CAST(floor((v - c) / 100.0 + {_OFF}) AS BIGINT) AS dv
  FROM ev JOIN c ON c.event_type = ev.event_type
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(dv) AS BIGINT) AS s1,
         CAST(sum(dv * dv) AS BIGINT) AS s2,
         CAST(sum(dv * dv * dv) AS BIGINT) AS s3,
         CAST(sum(dv * dv * dv * dv) AS BIGINT) AS s4
  FROM d GROUP BY 1
), k AS (
  SELECT event_type, CAST(n AS BIGINT) AS n,
         (n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
           / (n * (n - 1.0)) AS k2,
         (2.0 * CAST(s1 AS DOUBLE) * s1 * s1
          - 3.0 * n * CAST(s1 AS DOUBLE) * s2
          + CAST(n AS DOUBLE) * n * s3)
           / (n * (n - 1.0) * (n - 2.0)) AS k3,
         (-6.0 * CAST(s1 AS DOUBLE) * s1 * s1 * s1
          + 12.0 * n * CAST(s1 AS DOUBLE) * s1 * s2
          - 3.0 * n * (n - 1.0) * CAST(s2 AS DOUBLE) * s2
          - 4.0 * n * (n + 1.0) * CAST(s1 AS DOUBLE) * s3
          + CAST(n AS DOUBLE) * n * (n + 1.0) * s4)
           / (n * (n - 1.0) * (n - 2.0) * (n - 3.0)) AS k4
  FROM agg
)
SELECT event_type, n,
       CAST(floor(k2 * 10000 + {_OFF}) AS BIGINT) AS k2_e4,
       CAST(floor(k3 * 10000 + {_OFF}) AS BIGINT) AS k3_e4,
       CAST(floor(k4 * 10000 + {_OFF}) AS BIGINT) AS k4_e4,
       CAST(floor(k3 / (k2 ^ 1.5) * 1000000 + {_OFF}) AS BIGINT) AS g1_e6,
       CAST(floor(k4 / (k2 * k2) * 1000000 + {_OFF}) AS BIGINT) AS g2_e6
FROM k ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# rao_spacing — Rao's (1976) spacing test of diel uniformity per type:
# U = 1/2 sum |T_i - lambda| over the n circular spacings of the
# time-of-day points (lambda = circle/n).  Tied points contribute
# zero spacings ((n - d) of them, each |0 - lambda|); the d distinct-
# point gaps (incl. the wraparound) come off the bounded second-of-day
# domain.  Reported in degrees.
# ---------------------------------------------------------------------------


def q_rao_spacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
            )
            % 86_400
        ).alias("sod"),
    )
    cv = ev.groupBy("event_type", "sod").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wo = Window.partitionBy("event_type").orderBy("sod")
    g = cv.withColumn("nxt", F.lead("sod").over(wo))
    stats = cv.groupBy("event_type").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("d"),
        F.min("sod").alias("first"),
        F.max("sod").alias("last"),
    )
    lam = F.lit(86_400.0) / F.col("n")
    gaps = g.filter(F.col("nxt").isNotNull()).join(
        F.broadcast(stats.select("event_type", "n")), "event_type"
    )
    term = F.floor(
        F.abs(
            (F.col("nxt") - F.col("sod")).cast("double")
            - F.lit(86_400.0) / F.col("n")
        )
        * 10_000
        + F.lit(_OFF)
    ).cast("long")
    sg = gaps.groupBy("event_type").agg(F.sum(term).alias("sgap4"))
    out = stats.join(sg, "event_type")
    wrap = F.abs(
        (F.col("first") + 86_400 - F.col("last")).cast("double") - lam
    )
    zeros = (F.col("n") - F.col("d")).cast("double") * lam
    u_sec = 0.5 * (
        F.col("sgap4").cast("double") / 1e4 + wrap + zeros
    )
    u_deg = u_sec / 86_400.0 * 360.0
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("d").cast("long").alias("d_distinct"),
        F.floor(u_deg * 10_000 + F.lit(_OFF)).cast("long").alias(
            "u_deg_e4"
        ),
    ).orderBy("event_type")


SQL_RAO = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS sod
  FROM events
), cv AS (
  SELECT event_type, sod, count(*) AS cnt FROM ev GROUP BY 1, 2
), stats AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS d,
         CAST(min(sod) AS BIGINT) AS first,
         CAST(max(sod) AS BIGINT) AS last
  FROM cv GROUP BY 1
), g AS (
  SELECT cv.event_type,
         lead(sod) OVER (PARTITION BY cv.event_type ORDER BY sod) - sod
           AS gap,
         n
  FROM cv JOIN stats ON stats.event_type = cv.event_type
), sg AS (
  SELECT event_type,
         CAST(sum(CAST(floor(abs(CAST(gap AS DOUBLE) - 86400.0 / n)
                             * 10000 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS sgap4
  FROM g WHERE gap IS NOT NULL GROUP BY 1
)
SELECT stats.event_type, n, d AS d_distinct,
       CAST(floor(
         0.5 * (CAST(sgap4 AS DOUBLE) / 1e4
                + abs(CAST(first + 86400 - last AS DOUBLE) - 86400.0 / n)
                + CAST(n - d AS DOUBLE) * (86400.0 / n))
         / 86400.0 * 360.0 * 10000 + {_OFF}) AS BIGINT) AS u_deg_e4
FROM stats JOIN sg ON sg.event_type = stats.event_type
ORDER BY stats.event_type
"""


# ---------------------------------------------------------------------------
# poissonness_lineitems — Hoaglin's (1980) Poissonness plot of the
# lines-per-order distribution: phi(k) = ln(k! n_k / N) is linear in k
# under a Poisson law; the OLS slope estimates ln(lambda), and
# intercept + exp(slope) ~ 0 measures lack of fit.  ln k! rides the
# shared Lanczos lnGamma twin (stats15).
# ---------------------------------------------------------------------------


def q_poissonness_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    nk = per.groupBy("k").agg(F.count(F.lit(1)).alias("n_k"))
    tot = nk.agg(F.sum("n_k").alias("nn"))
    j = nk.crossJoin(F.broadcast(tot))
    phi = _lngamma(F.col("k").cast("double") + 1.0) + F.log(
        F.col("n_k").cast("double") / F.col("nn").cast("double")
    )
    pts = j.select(
        F.col("k").cast("long").alias("k"),
        F.floor(phi * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "phi_e6"
        ),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.sum("phi_e6").alias("sp"),
        F.sum(F.col("k") * F.col("phi_e6")).alias("skp"),
    )
    m = F.col("m").cast("double")
    slope = (
        m * F.col("skp").cast("double")
        - F.col("sk").cast("double") * F.col("sp").cast("double")
    ) / (
        (
            m * F.col("skk").cast("double")
            - F.col("sk").cast("double") * F.col("sk").cast("double")
        )
        * 1e6
    )
    icept = (
        F.col("sp").cast("double") / 1e6 - slope * F.col("sk").cast("double")
    ) / m
    return mom.select(
        F.col("m").cast("long").alias("m_points"),
        F.floor(slope * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "slope_e6"
        ),
        F.floor(F.exp(slope) * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "lambda_e6"
        ),
        F.floor((icept + F.exp(slope)) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("misfit_e6"),
    )


SQL_POISSONNESS = f"""
WITH per AS (
  SELECT l_orderkey, count(*) AS k FROM lineitem GROUP BY 1
), nk AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_k FROM per GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_k) AS BIGINT) AS nn FROM nk
), pts AS (
  SELECT CAST(k AS BIGINT) AS k,
         CAST(floor(({_lngamma_sql("CAST(k AS DOUBLE) + 1.0")}
                     + ln(CAST(n_k AS DOUBLE) / nn)) * 1000000 + {_OFF})
              AS BIGINT) AS phi_e6
  FROM nk CROSS JOIN tot
), mom AS (
  SELECT count(*) AS m,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS skk,
         CAST(sum(phi_e6) AS BIGINT) AS sp,
         CAST(sum(k * phi_e6) AS BIGINT) AS skp
  FROM pts
), fit AS (
  SELECT CAST(m AS BIGINT) AS m_points,
         (m * CAST(skp AS DOUBLE) - CAST(sk AS DOUBLE) * sp)
           / ((m * CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk) * 1e6)
           AS slope,
         CAST(sk AS DOUBLE) AS skd, CAST(sp AS DOUBLE) AS spd,
         CAST(m AS DOUBLE) AS md
  FROM mom
)
SELECT m_points,
       CAST(floor(slope * 1000000 + {_OFF}) AS BIGINT) AS slope_e6,
       CAST(floor(exp(slope) * 1000000 + {_OFF}) AS BIGINT) AS lambda_e6,
       CAST(floor(((spd / 1e6 - slope * skd) / md + exp(slope)) * 1000000
                  + {_OFF}) AS BIGINT) AS misfit_e6
FROM fit
"""


# ---------------------------------------------------------------------------
# ord_plot_lineitems — Ord's (1967) ratio plot on the same counts:
# u_k = k n_k / n_{k-1} is linear in k with (intercept a, slope b)
# signing the family: Poisson (b=0, a=lambda), negative binomial
# (b>0), binomial (b<0).  Unweighted OLS over the observed k points.
# ---------------------------------------------------------------------------


def q_ord_plot_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    nk = per.groupBy("k").agg(F.count(F.lit(1)).alias("n_k"))
    wo = Window.orderBy("k")
    u = nk.withColumn("kprev", F.lag("k").over(wo)).withColumn(
        "nprev", F.lag("n_k").over(wo)
    ).filter(
        F.col("nprev").isNotNull() & (F.col("kprev") == F.col("k") - 1)
    )
    pts = u.select(
        "k",
        F.floor(
            F.col("k").cast("double")
            * F.col("n_k").cast("double")
            / F.col("nprev").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("u_e6"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.sum("u_e6").alias("su"),
        F.sum(F.col("k") * F.col("u_e6")).alias("sku"),
    )
    m = F.col("m").cast("double")
    slope = (
        m * F.col("sku").cast("double")
        - F.col("sk").cast("double") * F.col("su").cast("double")
    ) / (
        (
            m * F.col("skk").cast("double")
            - F.col("sk").cast("double") * F.col("sk").cast("double")
        )
        * 1e6
    )
    icept = (
        F.col("su").cast("double") / 1e6 - slope * F.col("sk").cast("double")
    ) / m
    return mom.select(
        F.col("m").cast("long").alias("m_points"),
        F.floor(slope * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "b_e6"
        ),
        F.floor(icept * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "a_e6"
        ),
    )


SQL_ORD_PLOT = f"""
WITH per AS (
  SELECT l_orderkey, count(*) AS k FROM lineitem GROUP BY 1
), nk AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_k FROM per GROUP BY 1
), u AS (
  SELECT CAST(k AS BIGINT) AS k,
         CAST(floor(CAST(k AS DOUBLE) * n_k
                    / lag(n_k) OVER (ORDER BY k) * 1000000 + {_OFF})
              AS BIGINT) AS u_e6,
         lag(k) OVER (ORDER BY k) AS kprev
  FROM nk
  QUALIFY kprev = k - 1
), mom AS (
  SELECT count(*) AS m,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS skk,
         CAST(sum(u_e6) AS BIGINT) AS su,
         CAST(sum(k * u_e6) AS BIGINT) AS sku
  FROM u
)
SELECT CAST(m AS BIGINT) AS m_points,
       CAST(floor((m * CAST(sku AS DOUBLE) - CAST(sk AS DOUBLE) * su)
                  / ((m * CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk)
                     * 1e6) * 1000000 + {_OFF}) AS BIGINT) AS b_e6,
       CAST(floor((CAST(su AS DOUBLE) / 1e6
                   - (m * CAST(sku AS DOUBLE) - CAST(sk AS DOUBLE) * su)
                     / ((m * CAST(skk AS DOUBLE)
                         - CAST(sk AS DOUBLE) * sk) * 1e6)
                     * CAST(sk AS DOUBLE)) / m * 1000000 + {_OFF})
            AS BIGINT) AS a_e6
FROM mom
"""


QUERIES.update(
    {
        "fisher_kstats": q_fisher_kstats,
        "rao_spacing": q_rao_spacing,
        "poissonness_lineitems": q_poissonness_lineitems,
        "ord_plot_lineitems": q_ord_plot_lineitems,
    }
)

ORACLE_SQL.update(
    {
        "fisher_kstats": SQL_KSTATS,
        "rao_spacing": SQL_RAO,
        "poissonness_lineitems": SQL_POISSONNESS,
        "ord_plot_lineitems": SQL_ORD_PLOT,
    }
)


# ===========================================================================
# Battery K: model-evaluation + agro-meteo layer, following the
# queries_meteo2 convention (physical columns synthesized
# DETERMINISTICALLY from events; identical arithmetic both engines).
# Hydrology-standard skill scores (NSE, KGE, Willmott's d) of the
# cross-type "climatology" model, Stull's wet-bulb approximation, and
# the FAO-56 Hargreaves-Samani ET0 companion to penman_monteith_et0.
# ===========================================================================


def _obs_model_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (type, day): observed daily mean (exact int) and the grand
    cross-type daily mean as the 'climatology' model (exact int)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    obs = ev.groupBy("event_type", "dom").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("o")
    )
    mod = ev.groupBy("dom").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("m")
    )
    return obs.join(F.broadcast(mod), "dom")


_SQL_OBSMOD = f"""
  ev AS (
    SELECT event_type, EXTRACT(day FROM ts) AS dom,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
    FROM events
  ), obs AS (
    SELECT event_type, dom,
           CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + {_OFF})
                AS BIGINT) AS o
    FROM ev GROUP BY 1, 2
  ), mod AS (
    SELECT dom,
           CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + {_OFF})
                AS BIGINT) AS m
    FROM ev GROUP BY 1
  ), om AS (
    SELECT obs.event_type, obs.dom, o, m
    FROM obs JOIN mod ON mod.dom = obs.dom
  )
"""


# ---------------------------------------------------------------------------
# kge_nse — Nash-Sutcliffe efficiency (1970) and Kling-Gupta
# efficiency (Gupta et al. 2009) of the climatology model per type:
# NSE = 1 - SSE/SSO;  KGE = 1 - sqrt((r-1)^2 + (alpha-1)^2 + (beta-1)^2)
# with r Pearson, alpha = sd ratio, beta = mean ratio — every moment
# an exact integer day sum.
# ---------------------------------------------------------------------------


def q_kge_nse(spark: SparkSession, sf_dir: str) -> DataFrame:
    om = _obs_model_days(spark, sf_dir)
    agg = om.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o").alias("so"),
        F.sum("m").alias("sm"),
        F.sum(F.col("o") * F.col("o")).alias("soo"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.col("o") * F.col("m")).alias("som"),
        F.sum(
            (F.col("o") - F.col("m")) * (F.col("o") - F.col("m"))
        ).alias("sse"),
    )
    n = F.col("n").cast("double")
    so = F.col("so").cast("double")
    sm = F.col("sm").cast("double")
    co = F.col("soo").cast("double") - so * so / n
    cm = F.col("smm").cast("double") - sm * sm / n
    com = F.col("som").cast("double") - so * sm / n
    nse = 1.0 - F.col("sse").cast("double") / co
    r = com / F.sqrt(co * cm)
    alpha = F.sqrt(cm / co)
    beta = sm / so
    kge = 1.0 - F.sqrt(
        (r - 1.0) * (r - 1.0)
        + (alpha - 1.0) * (alpha - 1.0)
        + (beta - 1.0) * (beta - 1.0)
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(nse * 1_000_000 + F.lit(_OFF)).cast("long").alias("nse_e6"),
        F.floor(kge * 1_000_000 + F.lit(_OFF)).cast("long").alias("kge_e6"),
        F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias("r_e6"),
        F.floor(alpha * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "alpha_e6"
        ),
        F.floor(beta * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "beta_e6"
        ),
    ).orderBy("event_type")


SQL_KGE = f"""
WITH {_SQL_OBSMOD}, agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(o) AS BIGINT) AS so, CAST(sum(m) AS BIGINT) AS sm,
         CAST(sum(o * o) AS BIGINT) AS soo,
         CAST(sum(m * m) AS BIGINT) AS smm,
         CAST(sum(o * m) AS BIGINT) AS som,
         CAST(sum((o - m) * (o - m)) AS BIGINT) AS sse
  FROM om GROUP BY 1
), c AS (
  SELECT event_type, CAST(n AS BIGINT) AS n_days,
         CAST(soo AS DOUBLE) - CAST(so AS DOUBLE) * so / n AS co,
         CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * sm / n AS cm,
         CAST(som AS DOUBLE) - CAST(so AS DOUBLE) * sm / n AS com,
         CAST(sse AS DOUBLE) AS sse,
         CAST(sm AS DOUBLE) / so AS beta
  FROM agg
)
SELECT event_type, n_days,
       CAST(floor((1.0 - sse / co) * 1000000 + {_OFF}) AS BIGINT) AS nse_e6,
       CAST(floor((1.0 - sqrt((com / sqrt(co * cm) - 1.0)
                              * (com / sqrt(co * cm) - 1.0)
                              + (sqrt(cm / co) - 1.0)
                                * (sqrt(cm / co) - 1.0)
                              + (beta - 1.0) * (beta - 1.0)))
                  * 1000000 + {_OFF}) AS BIGINT) AS kge_e6,
       CAST(floor(com / sqrt(co * cm) * 1000000 + {_OFF}) AS BIGINT)
         AS r_e6,
       CAST(floor(sqrt(cm / co) * 1000000 + {_OFF}) AS BIGINT) AS alpha_e6,
       CAST(floor(beta * 1000000 + {_OFF}) AS BIGINT) AS beta_e6
FROM c ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# willmott_d — Willmott's (1981) index of agreement d and the refined
# absolute-value d1 (1985): per-day potential-error terms are floored
# to e4 integers against the exact rational observed mean So/n.
# ---------------------------------------------------------------------------


def q_willmott_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    om = _obs_model_days(spark, sf_dir)
    tot = om.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o").alias("so")
    )
    j = om.join(F.broadcast(tot), "event_type")
    obar = F.col("so").cast("double") / F.col("n")
    pe = F.abs(F.col("m").cast("double") - obar) + F.abs(
        F.col("o").cast("double") - obar
    )
    pe2_e4 = F.floor(pe * pe * 10_000 + F.lit(_OFF)).cast("long")
    pe1_e4 = F.floor(pe * 10_000 + F.lit(_OFF)).cast("long")
    agg = j.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(
            (F.col("o") - F.col("m")) * (F.col("o") - F.col("m"))
        ).alias("sse"),
        F.sum(F.abs(F.col("o") - F.col("m"))).alias("sae"),
        F.sum(pe2_e4).alias("spe2"),
        F.sum(pe1_e4).alias("spe1"),
    )
    d = 1.0 - F.col("sse").cast("double") / (
        F.col("spe2").cast("double") / 1e4
    )
    d1 = 1.0 - F.col("sae").cast("double") / (
        F.col("spe1").cast("double") / 1e4
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(d * 1_000_000 + F.lit(_OFF)).cast("long").alias("d_e6"),
        F.floor(d1 * 1_000_000 + F.lit(_OFF)).cast("long").alias("d1_e6"),
    ).orderBy("event_type")


SQL_WILLMOTT = f"""
WITH {_SQL_OBSMOD}, tot AS (
  SELECT event_type, count(*) AS n, CAST(sum(o) AS BIGINT) AS so
  FROM om GROUP BY 1
), terms AS (
  SELECT om.event_type, tot.n, o, m,
         abs(CAST(m AS DOUBLE) - CAST(so AS DOUBLE) / n)
         + abs(CAST(o AS DOUBLE) - CAST(so AS DOUBLE) / n) AS pe
  FROM om JOIN tot ON tot.event_type = om.event_type
), agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
         CAST(sum((o - m) * (o - m)) AS BIGINT) AS sse,
         CAST(sum(abs(o - m)) AS BIGINT) AS sae,
         CAST(sum(CAST(floor(pe * pe * 10000 + {_OFF}) AS BIGINT))
              AS BIGINT) AS spe2,
         CAST(sum(CAST(floor(pe * 10000 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS spe1
  FROM terms GROUP BY 1
)
SELECT event_type, n_days,
       CAST(floor((1.0 - CAST(sse AS DOUBLE)
                         / (CAST(spe2 AS DOUBLE) / 1e4)) * 1000000
                  + {_OFF}) AS BIGINT) AS d_e6,
       CAST(floor((1.0 - CAST(sae AS DOUBLE)
                         / (CAST(spe1 AS DOUBLE) / 1e4)) * 1000000
                  + {_OFF}) AS BIGINT) AS d1_e6
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# wetbulb_stull — Stull's (2011, JAMC) wet-bulb temperature
# approximation on the diel cycle: synthetic T (deci-degC) and RH (%)
# per event, aggregated to exact hourly integer means, then one
# closed-form Tw per hour-of-day evaluated identically in both engines.
# ---------------------------------------------------------------------------


def q_wetbulb_stull(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.hour("ts").alias("hh"),
        (
            F.floor(F.col("value") * 3 + F.lit(_OFF)).cast("long")
            + F.col("event_id") % 11
        ).alias("t10"),
        (40 + F.col("event_id") % 55).alias("rh"),
    )
    agg = ev.groupBy("hh").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t10").alias("st"),
        F.sum("rh").alias("srh"),
    )
    t = F.col("st").cast("double") / F.col("n") / 10.0
    rh = F.col("srh").cast("double") / F.col("n")
    tw = (
        t * F.atan(0.151977 * F.sqrt(rh + 8.313659))
        + F.atan(t + rh)
        - F.atan(rh - 1.676331)
        + 0.00391838 * F.pow(rh, 1.5) * F.atan(0.023101 * rh)
        - 4.686035
    )
    return agg.select(
        F.col("hh").cast("long").alias("hh"),
        F.col("n").cast("long").alias("n"),
        F.floor(t * 10_000 + F.lit(_OFF)).cast("long").alias("t_e4"),
        F.floor(rh * 10_000 + F.lit(_OFF)).cast("long").alias("rh_e4"),
        F.floor(tw * 10_000 + F.lit(_OFF)).cast("long").alias("tw_e4"),
    ).orderBy("hh")


SQL_WETBULB = f"""
WITH ev AS (
  SELECT EXTRACT(hour FROM ts) AS hh,
         CAST(floor(value * 3 + {_OFF}) AS BIGINT) + event_id % 11 AS t10,
         40 + event_id % 55 AS rh
  FROM events
), agg AS (
  SELECT hh, count(*) AS n,
         CAST(sum(t10) AS BIGINT) AS st,
         CAST(sum(rh) AS BIGINT) AS srh
  FROM ev GROUP BY 1
), c AS (
  SELECT hh, CAST(n AS BIGINT) AS n,
         CAST(st AS DOUBLE) / n / 10.0 AS t,
         CAST(srh AS DOUBLE) / n AS rh
  FROM agg
)
SELECT hh, n,
       CAST(floor(t * 10000 + {_OFF}) AS BIGINT) AS t_e4,
       CAST(floor(rh * 10000 + {_OFF}) AS BIGINT) AS rh_e4,
       CAST(floor((t * atan(0.151977 * sqrt(rh + 8.313659))
                   + atan(t + rh) - atan(rh - 1.676331)
                   + 0.00391838 * (rh ^ 1.5) * atan(0.023101 * rh)
                   - 4.686035) * 10000 + {_OFF}) AS BIGINT) AS tw_e4
FROM c ORDER BY hh
"""


# ---------------------------------------------------------------------------
# hargreaves_et0 — Hargreaves & Samani (1985) / FAO-56 Eq. 52
# reference ET0, the data-sparse companion to penman_monteith_et0
# (meteo2): ET0 = 0.0023 (Tmean + 17.8) (Tmax - Tmin)^0.5 Ra, with
# extraterrestrial radiation Ra from the FAO-56 day-of-year closed
# form at latitude 47 N.  Daily Tmax/Tmin/Tmean from exact integer
# deci-degC extremes.
# ---------------------------------------------------------------------------

_LAT = 0.8203047484374765  # 47 deg N in radians (exact double literal)


def q_hargreaves_et0(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.dayofyear("ts").alias("doy"),
        (
            F.floor(F.col("value") * 3 + F.lit(_OFF)).cast("long")
            + F.col("event_id") % 11
        ).alias("t10"),
    )
    day = ev.groupBy("doy").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("t10").alias("tmax10"),
        F.min("t10").alias("tmin10"),
        F.sum("t10").alias("st"),
    )
    tmean = F.col("st").cast("double") / F.col("n") / 10.0
    tmax = F.col("tmax10").cast("double") / 10.0
    tmin = F.col("tmin10").cast("double") / 10.0
    d = F.col("doy").cast("double")
    dr = 1.0 + 0.033 * F.cos(2.0 * F.lit(3.141592653589793) / 365.0 * d)
    dec = 0.409 * F.sin(
        2.0 * F.lit(3.141592653589793) / 365.0 * d - 1.39
    )
    ws = F.acos(-F.tan(F.lit(_LAT)) * F.tan(dec))
    ra = (
        24.0
        * 60.0
        / F.lit(3.141592653589793)
        * 0.0820
        * dr
        * (
            ws * F.sin(F.lit(_LAT)) * F.sin(dec)
            + F.cos(F.lit(_LAT)) * F.cos(dec) * F.sin(ws)
        )
    )
    et0 = 0.0023 * (tmean + 17.8) * F.sqrt(tmax - tmin) * ra * 0.408
    return day.select(
        F.col("doy").cast("long").alias("doy"),
        F.floor(ra * 10_000 + F.lit(_OFF)).cast("long").alias("ra_e4"),
        F.floor(tmean * 10_000 + F.lit(_OFF)).cast("long").alias(
            "tmean_e4"
        ),
        F.floor(et0 * 10_000 + F.lit(_OFF)).cast("long").alias("et0_e4"),
    ).orderBy("doy")


SQL_HARGREAVES = f"""
WITH ev AS (
  SELECT EXTRACT(doy FROM ts) AS doy,
         CAST(floor(value * 3 + {_OFF}) AS BIGINT) + event_id % 11 AS t10
  FROM events
), day AS (
  SELECT doy, count(*) AS n,
         CAST(max(t10) AS BIGINT) AS tmax10,
         CAST(min(t10) AS BIGINT) AS tmin10,
         CAST(sum(t10) AS BIGINT) AS st
  FROM ev GROUP BY 1
), c AS (
  SELECT doy, CAST(st AS DOUBLE) / n / 10.0 AS tmean,
         CAST(tmax10 AS DOUBLE) / 10.0 AS tmax,
         CAST(tmin10 AS DOUBLE) / 10.0 AS tmin,
         1.0 + 0.033 * cos(2.0 * 3.141592653589793 / 365.0
                           * CAST(doy AS DOUBLE)) AS dr,
         0.409 * sin(2.0 * 3.141592653589793 / 365.0
                     * CAST(doy AS DOUBLE) - 1.39) AS dec
  FROM day
), r AS (
  SELECT doy, tmean, tmax, tmin, dr, dec,
         acos(-tan({_LAT!r}) * tan(dec)) AS ws
  FROM c
)
SELECT CAST(doy AS BIGINT) AS doy,
       CAST(floor(24.0 * 60.0 / 3.141592653589793 * 0.0820 * dr
                  * (ws * sin({_LAT!r}) * sin(dec)
                     + cos({_LAT!r}) * cos(dec) * sin(ws))
                  * 10000 + {_OFF}) AS BIGINT) AS ra_e4,
       CAST(floor(tmean * 10000 + {_OFF}) AS BIGINT) AS tmean_e4,
       CAST(floor(0.0023 * (tmean + 17.8) * sqrt(tmax - tmin)
                  * (24.0 * 60.0 / 3.141592653589793 * 0.0820 * dr
                     * (ws * sin({_LAT!r}) * sin(dec)
                        + cos({_LAT!r}) * cos(dec) * sin(ws)))
                  * 0.408 * 10000 + {_OFF}) AS BIGINT) AS et0_e4
FROM r ORDER BY doy
"""


QUERIES.update(
    {
        "kge_nse": q_kge_nse,
        "willmott_d": q_willmott_d,
        "wetbulb_stull": q_wetbulb_stull,
        "hargreaves_et0": q_hargreaves_et0,
    }
)

ORACLE_SQL.update(
    {
        "kge_nse": SQL_KGE,
        "willmott_d": SQL_WILLMOTT,
        "wetbulb_stull": SQL_WETBULB,
        "hargreaves_et0": SQL_HARGREAVES,
    }
)


# ===========================================================================
# Battery L: TPC-H-style multi-way join analytics — the registry's
# join-planning showcases have lived in round-1 J1-J6; these add the
# canonical dimensional patterns (Q4/Q5/Q8/Q10 analogs) with every
# dimension broadcast and revenue carried as the exact integer
# p2 * (100 - d2) (cents x discount-hundredths, e4 cents-scale).
# ===========================================================================


def _rev_e4() -> Column:
    p2 = F.floor(F.col("l_extendedprice") * 100 + F.lit(_OFF)).cast("long")
    d2 = F.floor(F.col("l_discount") * 100 + F.lit(_OFF)).cast("long")
    return p2 * (100 - d2)


_SQL_REV = (
    "CAST(floor(l_extendedprice * 100 + {OFF}) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100 + {OFF}) AS BIGINT))"
).format(OFF="0.31830988618367")


# ---------------------------------------------------------------------------
# tpch_q5_local_revenue — TPC-H Q5 analog: revenue by nation for 1996
# orders where the supplier and the customer share the nation, within
# the EUROPE region.  lineitem is the only fact-sized input; orders is
# the one fact-fact shuffle join; customer/supplier/nation/region all
# broadcast.
# ---------------------------------------------------------------------------


def q_tpch_q5_local_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.year("o_orderdate") == 1996
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "EUROPE"
    )
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey)
    )
    agg = j.groupBy("n_name").agg(
        F.sum(_rev_e4()).alias("rev_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return agg.select(
        "n_name",
        F.col("rev_e4").cast("long").alias("revenue_e4"),
        F.col("n_lines").cast("long").alias("n_lines"),
    ).orderBy(F.desc("revenue_e4"), "n_name")


SQL_Q5 = f"""
SELECT n_name,
       CAST(sum({_SQL_REV}) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND EXTRACT(year FROM o_orderdate) = 1996
GROUP BY 1
ORDER BY revenue_e4 DESC, n_name
"""


# ---------------------------------------------------------------------------
# tpch_q8_market_share — Q8 analog: yearly market share of AMERICA-
# nation suppliers within the EUROPE customer market.  The share is an
# exact integer ratio of revenue sums.
# ---------------------------------------------------------------------------


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("c_custkey")
    sn = s.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_regionkey").alias("sn_rkey"),
            )
        ),
        s.s_nationkey == F.col("sn_key"),
    ).join(
        F.broadcast(
            r.select(
                F.col("r_regionkey").alias("sr_key"),
                F.col("r_name").alias("sr_name"),
            )
        ),
        F.col("sn_rkey") == F.col("sr_key"),
    ).select("s_suppkey", "sr_name")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
    )
    agg = j.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.sum(_rev_e4()).alias("tot_e4"),
        F.sum(
            F.when(F.col("sr_name") == "AMERICA", _rev_e4()).otherwise(0)
        ).alias("amer_e4"),
    )
    share = F.col("amer_e4").cast("double") / F.col("tot_e4").cast("double")
    return agg.select(
        F.col("yr").cast("long").alias("yr"),
        F.col("amer_e4").cast("long").alias("america_rev_e4"),
        F.col("tot_e4").cast("long").alias("total_rev_e4"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "share_e6"
        ),
    ).orderBy("yr")


SQL_Q8 = f"""
WITH cn AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), sn AS (
  SELECT s_suppkey, r_name AS sr_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
), agg AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         CAST(sum({_SQL_REV}) AS BIGINT) AS tot_e4,
         CAST(sum(CASE WHEN sr_name = 'AMERICA' THEN {_SQL_REV}
                       ELSE 0 END) AS BIGINT) AS amer_e4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN cn ON o_custkey = c_custkey
  JOIN sn ON l_suppkey = s_suppkey
  GROUP BY 1
)
SELECT CAST(yr AS BIGINT) AS yr,
       amer_e4 AS america_rev_e4,
       tot_e4 AS total_rev_e4,
       CAST(floor(CAST(amer_e4 AS DOUBLE) / CAST(tot_e4 AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS share_e6
FROM agg ORDER BY yr
"""


# ---------------------------------------------------------------------------
# tpch_q10_returned_topk — Q10 analog: top 20 customers by returned-
# item revenue in 1996 H1, deterministic tie-break by custkey.  The
# top-k is a TakeOrderedAndProject (sort-limit), never a global
# row_number window.
# ---------------------------------------------------------------------------


def q_tpch_q10_returned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.year("o_orderdate") == 1996) & (F.month("o_orderdate") <= 6)
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_rev_e4()).alias("rev_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        agg.orderBy(F.desc("rev_e4"), "c_custkey")
        .limit(20)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "n_name",
            F.col("rev_e4").cast("long").alias("revenue_e4"),
            F.col("n_lines").cast("long").alias("n_lines"),
        )
    )


SQL_Q10 = f"""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       CAST(sum({_SQL_REV}) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND EXTRACT(year FROM o_orderdate) = 1996
  AND EXTRACT(month FROM o_orderdate) <= 6
GROUP BY 1, 2, 3
ORDER BY revenue_e4 DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# tpch_q4_priority_semi — Q4 analog: 1996 order counts per priority
# where at least one lineitem shipped after the order date — the
# canonical EXISTS semi-join pattern.
# ---------------------------------------------------------------------------


def q_tpch_q4_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.year("o_orderdate") == 1996
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    late = (
        li.join(
            o.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == o.o_orderkey,
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey")
        .distinct()
    )
    j = o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
    return (
        j.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderpriority",
            F.col("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


SQL_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXTRACT(year FROM o_orderdate) = 1996
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY 1 ORDER BY 1
"""


QUERIES.update(
    {
        "tpch_q5_local_revenue": q_tpch_q5_local_revenue,
        "tpch_q8_market_share": q_tpch_q8_market_share,
        "tpch_q10_returned_topk": q_tpch_q10_returned_topk,
        "tpch_q4_priority_semi": q_tpch_q4_priority_semi,
    }
)

ORACLE_SQL.update(
    {
        "tpch_q5_local_revenue": SQL_Q5,
        "tpch_q8_market_share": SQL_Q8,
        "tpch_q10_returned_topk": SQL_Q10,
        "tpch_q4_priority_semi": SQL_Q4,
    }
)


# ===========================================================================
# Battery M: modern experimentation + reliability layer — the mixture
# SPRT always-valid p-value (Johari et al. 2017), Gamma-Poisson
# empirical-Bayes rate shrinkage, the Hadamard variance (the 3-point
# sibling of allan_variance), and the shifted-Beta-Geometric retention
# fit (Fader & Hardie 2007) with closed-form parameters from the first
# two retention ratios.
# ===========================================================================


# ---------------------------------------------------------------------------
# msprt_always_valid — mixture SPRT on the daily-mean stream per type:
# train on days 1-10 (theta0 = training mean, sigma2 = tau2 = training
# daily variance), monitor days 11-30 with the closed-form normal
# mixture likelihood ratio; always-valid p = 1/max(Lambda) running.
# ---------------------------------------------------------------------------


def q_msprt_always_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("dom"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    day = ev.groupBy("event_type", "dom").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("x")
    )
    tr = day.filter(F.col("dom") <= 10).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n0 = F.col("n0").cast("double")
    th0 = F.col("sx").cast("double") / n0
    s2 = (F.col("sxx").cast("double") - F.col("sx").cast("double") * th0) / (
        n0 - 1.0
    )
    params = tr.select(
        "event_type",
        F.floor(th0 * 10_000 + F.lit(_OFF)).cast("long").alias("th0_e4"),
        F.floor(s2 * 10_000 + F.lit(_OFF)).cast("long").alias("s2_e4"),
    )
    mon = day.filter(F.col("dom") > 10).join(F.broadcast(params), "event_type")
    wc = Window.partitionBy("event_type").orderBy("dom").rowsBetween(
        Window.unboundedPreceding, 0
    )
    mon = mon.withColumn("n", F.count(F.lit(1)).over(wc)).withColumn(
        "sxm", F.sum("x").over(wc)
    )
    nd = F.col("n").cast("double")
    xbar = F.col("sxm").cast("double") / nd
    th = F.col("th0_e4").cast("double") / 1e4
    sig2 = F.col("s2_e4").cast("double") / 1e4
    tau2 = sig2
    lam = F.sqrt(sig2 / (sig2 + nd * tau2)) * F.exp(
        F.least(
            nd * nd * tau2 * (xbar - th) * (xbar - th)
            / (2.0 * sig2 * (sig2 + nd * tau2)),
            F.lit(50.0),
        )
    )
    mon = mon.withColumn(
        "lam_e6", F.floor(lam * 1_000_000 + F.lit(_OFF)).cast("long")
    ).withColumn("lmax", F.max("lam_e6").over(wc))
    p = F.least(
        F.lit(1.0), 1e6 / F.col("lmax").cast("double")
    )
    return mon.select(
        "event_type",
        F.col("dom").cast("long").alias("dom"),
        "lam_e6",
        F.floor(p * 1_000_000 + F.lit(_OFF)).cast("long").alias("p_e6"),
    ).orderBy("event_type", "dom")


SQL_MSPRT = f"""
WITH day AS (
  SELECT event_type, EXTRACT(day FROM ts) AS dom,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), tr AS (
  SELECT event_type,
         CAST(floor(CAST(sum(x) AS DOUBLE) / count(*) * 10000 + {_OFF})
              AS BIGINT) AS th0_e4,
         CAST(floor((CAST(sum(x * x) AS DOUBLE)
                     - CAST(sum(x) AS DOUBLE)
                       * (CAST(sum(x) AS DOUBLE) / count(*)))
                    / (count(*) - 1.0) * 10000 + {_OFF}) AS BIGINT)
           AS s2_e4
  FROM day WHERE dom <= 10 GROUP BY 1
), mon AS (
  SELECT day.event_type, dom, th0_e4, s2_e4,
         count(*) OVER w AS n,
         CAST(sum(x) OVER w AS BIGINT) AS sxm
  FROM day JOIN tr ON tr.event_type = day.event_type
  WHERE dom > 10
  WINDOW w AS (PARTITION BY day.event_type ORDER BY dom)
), lam AS (
  SELECT event_type, dom,
         CAST(floor(sqrt((CAST(s2_e4 AS DOUBLE) / 1e4)
                         / (CAST(s2_e4 AS DOUBLE) / 1e4
                            + n * (CAST(s2_e4 AS DOUBLE) / 1e4)))
                    * exp(least(
                        CAST(n AS DOUBLE) * n
                        * (CAST(s2_e4 AS DOUBLE) / 1e4)
                        * (CAST(sxm AS DOUBLE) / n
                           - CAST(th0_e4 AS DOUBLE) / 1e4)
                        * (CAST(sxm AS DOUBLE) / n
                           - CAST(th0_e4 AS DOUBLE) / 1e4)
                        / (2.0 * (CAST(s2_e4 AS DOUBLE) / 1e4)
                           * (CAST(s2_e4 AS DOUBLE) / 1e4
                              + n * (CAST(s2_e4 AS DOUBLE) / 1e4))),
                        50.0))
                    * 1000000 + {_OFF}) AS BIGINT) AS lam_e6
  FROM mon
)
SELECT event_type, CAST(dom AS BIGINT) AS dom, lam_e6,
       CAST(floor(least(1.0, 1e6 / CAST(max(lam_e6)
                OVER (PARTITION BY event_type ORDER BY dom) AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS p_e6
FROM lam ORDER BY event_type, dom
"""


# ---------------------------------------------------------------------------
# gamma_poisson_eb — empirical-Bayes shrinkage of per-user event rates
# (Gamma prior by method of moments on the user-count distribution;
# posterior rate (alpha + k)/(beta + T), T = 30 days).  The Gamma-
# Poisson twin of eb_shrinkage (beta-binomial).
# ---------------------------------------------------------------------------


def q_gamma_poisson_eb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    ku = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("k")
    )
    agg = ku.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("u"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.max("k").alias("kmax"),
        F.min("k").alias("kmin"),
    )
    u = F.col("u").cast("double")
    m = F.col("sk").cast("double") / u
    v = (F.col("skk").cast("double") - F.col("sk").cast("double") * m) / (
        u - 1.0
    )
    # MoM for k ~ Poisson(lambda*T) with lambda ~ Gamma(alpha, beta):
    # E[k] = T alpha/beta, Var[k] = E[k] + T^2 alpha/beta^2,  T = 30
    beta = 30.0 * m / (v - m)
    alpha = m * beta / 30.0
    hi = (alpha + F.col("kmax").cast("double")) / (beta + 30.0)
    lo = (alpha + F.col("kmin").cast("double")) / (beta + 30.0)
    return agg.filter(v > m).select(
        "event_type",
        F.col("u").cast("long").alias("n_users"),
        F.floor(alpha * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "alpha_e6"
        ),
        F.floor(beta * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "beta_e6"
        ),
        F.floor(hi * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "top_rate_e6"
        ),
        F.floor(lo * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "bot_rate_e6"
        ),
    ).orderBy("event_type")


SQL_GAMMA_EB = f"""
WITH ku AS (
  SELECT event_type, user_id, count(*) AS k FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type, count(*) AS u,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS skk,
         CAST(max(k) AS BIGINT) AS kmax,
         CAST(min(k) AS BIGINT) AS kmin
  FROM ku GROUP BY 1
), c AS (
  SELECT event_type, CAST(u AS BIGINT) AS n_users,
         CAST(sk AS DOUBLE) / u AS m,
         (CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE)
            * (CAST(sk AS DOUBLE) / u)) / (u - 1.0) AS v,
         CAST(kmax AS DOUBLE) AS kmax, CAST(kmin AS DOUBLE) AS kmin
  FROM agg
)
SELECT event_type, n_users,
       CAST(floor(m * (30.0 * m / (v - m)) / 30.0 * 1000000 + {_OFF})
            AS BIGINT) AS alpha_e6,
       CAST(floor(30.0 * m / (v - m) * 1000000 + {_OFF}) AS BIGINT)
         AS beta_e6,
       CAST(floor((m * (30.0 * m / (v - m)) / 30.0 + kmax)
                  / (30.0 * m / (v - m) + 30.0) * 1000000 + {_OFF})
            AS BIGINT) AS top_rate_e6,
       CAST(floor((m * (30.0 * m / (v - m)) / 30.0 + kmin)
                  / (30.0 * m / (v - m) + 30.0) * 1000000 + {_OFF})
            AS BIGINT) AS bot_rate_e6
FROM c WHERE v > m ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# hadamard_variance — the 3-point second-difference variance at octave
# lags (Baugh 1971), drift-immune sibling of allan_variance:
# H(tau) = mean((x_{t+2tau} - 2 x_{t+tau} + x_t)^2) / 6 on the hourly
# grid — two fixed-lag equi-joins per tau on the bounded grid.
# ---------------------------------------------------------------------------


def q_hadamard_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).alias("h"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    hr = ev.groupBy("event_type", "h").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("x")
    )
    taus = spark.range(0, 5).select(
        F.pow(F.lit(2.0), F.col("id").cast("double"))
        .cast("long")
        .alias("tau")
    )
    base = hr.crossJoin(F.broadcast(taus))
    m1 = hr.select(
        F.col("event_type").alias("et1"),
        F.col("h").alias("h1"),
        F.col("x").alias("x1"),
    )
    m2 = hr.select(
        F.col("event_type").alias("et2"),
        F.col("h").alias("h2"),
        F.col("x").alias("x2"),
    )
    j = (
        base.join(
            m1,
            (F.col("et1") == F.col("event_type"))
            & (F.col("h1") == F.col("h") + F.col("tau")),
        )
        .join(
            m2,
            (F.col("et2") == F.col("event_type"))
            & (F.col("h2") == F.col("h") + 2 * F.col("tau")),
        )
    )
    d = F.col("x2") - 2 * F.col("x1") + F.col("x")
    agg = j.groupBy("event_type", "tau").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(d * d).alias("sd2"),
    )
    hv = F.col("sd2").cast("double") / F.col("n_terms") / 6.0
    return agg.select(
        "event_type",
        F.col("tau").cast("long").alias("tau_h"),
        F.col("n_terms").cast("long").alias("n_terms"),
        F.floor(hv * 10_000 + F.lit(_OFF)).cast("long").alias("hvar_e4"),
    ).orderBy("event_type", "tau_h")


SQL_HADAMARD = f"""
WITH hr AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), taus AS (
  SELECT CAST(2 ** u AS BIGINT) AS tau
  FROM (SELECT unnest(generate_series(0, 4)) AS u)
), j AS (
  SELECT a.event_type, tau,
         c.x - 2 * b.x + a.x AS d
  FROM hr a
  CROSS JOIN taus
  JOIN hr b ON b.event_type = a.event_type AND b.h = a.h + tau
  JOIN hr c ON c.event_type = a.event_type AND c.h = a.h + 2 * tau
)
SELECT event_type, tau AS tau_h,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(floor(CAST(sum(d * d) AS DOUBLE) / count(*) / 6.0 * 10000
                  + {_OFF}) AS BIGINT) AS hvar_e4
FROM j GROUP BY 1, 2 ORDER BY event_type, tau_h
"""


# ---------------------------------------------------------------------------
# retention_geom_fit — geometric retention fit of purchase streaks
# (customer = a user's consecutive-day purchase streak; alive at
# period t iff streak length L >= t+1).  The geometric renewal MLE is
# p = (sum L - n)/(sum L) (censoring-free streaks, documented); the
# model curve p^t is compared to the observed survival, and the
# shifted-Beta-Geometric heterogeneity diagnostic r2 - r1 (Fader &
# Hardie 2007: sBG applies iff retention ratios INCREASE) is reported
# alongside — this corpus's streaks are homogeneous (r2 <= r1), so the
# geometric baseline is the correct closed-form model.
# ---------------------------------------------------------------------------


def q_retention_geom_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            ).alias("d"),
        )
        .distinct()
    )
    wu = Window.partitionBy("user_id").orderBy("d")
    wn = Window.partitionBy("user_id")
    st = ev.withColumn("rn", F.row_number().over(wu)).withColumn(
        "fw", F.min("d").over(wn)
    )
    life = st.filter(
        F.col("d") - F.col("fw") == F.col("rn") - 1
    ).groupBy("user_id").agg(F.count(F.lit(1)).alias("life"))
    s = life.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum("life").alias("sl"),
        F.sum((F.col("life") >= 2).cast("long")).alias("s1"),
        F.sum((F.col("life") >= 3).cast("long")).alias("s2"),
    )
    p = (F.col("sl") - F.col("s0")).cast("double") / F.col("sl")
    r1 = F.col("s1").cast("double") / F.col("s0")
    r2 = F.col("s2").cast("double") / F.col("s1")
    params = s.select(
        F.col("s0").cast("long").alias("s0"),
        F.floor(p * 1e9 + F.lit(_OFF)).cast("long").alias("p9"),
        F.floor(r1 * 1_000_000 + F.lit(_OFF)).cast("long").alias("r1_e6"),
        F.floor(r2 * 1_000_000 + F.lit(_OFF)).cast("long").alias("r2_e6"),
        F.floor((r2 - r1) * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "het_e6"
        ),
    )
    grid = spark.range(1, 7).select(F.col("id").alias("t"))
    g = grid.crossJoin(F.broadcast(params))
    smodel = F.pow(F.col("p9").cast("double") / 1e9, F.col("t").cast("double"))
    obs = life.crossJoin(F.broadcast(grid)).groupBy("t").agg(
        F.sum((F.col("life") >= F.col("t") + 1).cast("long")).alias(
            "alive"
        )
    )
    out = g.join(obs, "t")
    return out.select(
        F.col("t").cast("long").alias("t"),
        F.floor(smodel * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "s_model_e6"
        ),
        F.floor(
            F.col("alive").cast("double") / F.col("s0") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("s_obs_e6"),
        "r1_e6",
        "r2_e6",
        "het_e6",
    ).orderBy("t")


SQL_RETENTION_GEOM = f"""
WITH ev AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
  FROM events WHERE event_type = 'purchase'
), st AS (
  SELECT user_id, d,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn,
         min(d) OVER (PARTITION BY user_id) AS fw
  FROM ev
), life AS (
  SELECT user_id, count(*) AS life
  FROM st WHERE d - fw = rn - 1 GROUP BY 1
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS s0,
         CAST(sum(life) AS BIGINT) AS sl,
         CAST(sum(CASE WHEN life >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN life >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS s2
  FROM life
), params AS (
  SELECT s0,
         CAST(floor(CAST(sl - s0 AS DOUBLE) / sl * 1e9 + {_OFF})
              AS BIGINT) AS p9,
         CAST(floor(CAST(s1 AS DOUBLE) / s0 * 1000000 + {_OFF})
              AS BIGINT) AS r1_e6,
         CAST(floor(CAST(s2 AS DOUBLE) / s1 * 1000000 + {_OFF})
              AS BIGINT) AS r2_e6,
         CAST(floor((CAST(s2 AS DOUBLE) / s1 - CAST(s1 AS DOUBLE) / s0)
                    * 1000000 + {_OFF}) AS BIGINT) AS het_e6
  FROM s
), grid AS (
  SELECT unnest(generate_series(1, 6)) AS t
), obs AS (
  SELECT t, CAST(sum(CASE WHEN life >= t + 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS alive
  FROM life CROSS JOIN grid GROUP BY 1
)
SELECT CAST(grid.t AS BIGINT) AS t,
       CAST(floor((CAST(p9 AS DOUBLE) / 1e9) ^ CAST(grid.t AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS s_model_e6,
       CAST(floor(CAST(alive AS DOUBLE) / s0 * 1000000 + {_OFF})
            AS BIGINT) AS s_obs_e6,
       r1_e6, r2_e6, het_e6
FROM grid CROSS JOIN params JOIN obs ON obs.t = grid.t
ORDER BY t
"""


QUERIES.update(
    {
        "msprt_always_valid": q_msprt_always_valid,
        "gamma_poisson_eb": q_gamma_poisson_eb,
        "hadamard_variance": q_hadamard_variance,
        "retention_geom_fit": q_retention_geom_fit,
    }
)

ORACLE_SQL.update(
    {
        "msprt_always_valid": SQL_MSPRT,
        "gamma_poisson_eb": SQL_GAMMA_EB,
        "hadamard_variance": SQL_HADAMARD,
        "retention_geom_fit": SQL_RETENTION_GEOM,
    }
)


# ===========================================================================
# Battery N: the remaining classical linear-rank family — Savage
# (exponential) scores, Klotz squared-normal scores, Mood's squared
# rank deviations — all two-sample day-vs-night per type on the value
# domain, sharing the general score-statistic form
#   z = (T1 - n1 abar) / sqrt(n1 n2/(n(n-1)) sum(a_i - abar)^2)
# — plus a deterministic Poisson-weight cluster bootstrap SE.
# ===========================================================================


def _linear_rank_two_sample(
    rv_scored: DataFrame, c0: DataFrame, score_col: str
) -> DataFrame:
    """Generic two-sample linear-rank z from per-(type, v) e6 scores."""
    per_grp = (
        c0.groupBy("event_type", "v", "is_day")
        .agg(F.sum("cnt").alias("gcnt"))
        .join(
            rv_scored.select("event_type", "v", score_col, "n"),
            ["event_type", "v"],
        )
    )
    s = F.col(score_col)
    agg = per_grp.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("is_day") == 1, F.col("gcnt")).otherwise(0)).alias(
            "n1"
        ),
        F.sum(
            F.when(F.col("is_day") == 1, F.col("gcnt") * s).otherwise(0)
        ).alias("t1"),
        F.sum(F.col("gcnt") * s).alias("st"),
        # sq carried in 128-bit (sf0.1 sweep): Mood's quadratic scores
        # reach (n-1)^2, so gcnt*s^2 overflows int64 at bench-scale group
        # sizes; decimal(38,0) keeps the sum EXACT (DuckDB twin: HUGEINT)
        # and the final cast-to-double is the same correctly-rounded value
        # in both engines.
        F.sum(F.col("gcnt").cast("decimal(38,0)") * s * s).alias("sq"),
    )
    n = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    st = F.col("st").cast("double")
    varsum = F.col("sq").cast("double") - st * st / n
    z = (F.col("t1").cast("double") - n1 * st / n) / F.sqrt(
        (n1 * (n - n1)) / (n * (n - 1.0)) * varsum
    )
    return agg.select(
        "event_type",
        F.col("n1").cast("long").alias("n1"),
        (F.col("n") - F.col("n1")).cast("long").alias("n2"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


_SQL_LINRANK = f"""
  pg AS (
    SELECT c.event_type, c.v, c.is_day,
           CAST(sum(cnt) AS BIGINT) AS gcnt
    FROM c0 c GROUP BY 1, 2, 3
  ), agg AS (
    SELECT pg.event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(sum(CASE WHEN is_day = 1 THEN gcnt ELSE 0 END) AS BIGINT)
             AS n1,
           CAST(sum(CASE WHEN is_day = 1 THEN gcnt * s_e6 ELSE 0 END)
                AS BIGINT) AS t1,
           CAST(sum(gcnt * s_e6) AS BIGINT) AS st,
           -- HUGEINT: mirrors the Spark decimal(38,0) overflow guard
           sum(CAST(gcnt AS HUGEINT) * s_e6 * s_e6) AS sq
    FROM pg JOIN sc ON sc.event_type = pg.event_type AND sc.v = pg.v
    GROUP BY 1
  )
"""

_SQL_LINRANK_OUT = f"""
SELECT event_type, n1, n - n1 AS n2,
       CAST(floor(
         (CAST(t1 AS DOUBLE)
          - CAST(n1 AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(n1 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE))
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                * (CAST(sq AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                     / CAST(n AS DOUBLE)))
         * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# savage_scores — Savage (1956) exponential-scores test in Peto's PIT
# form: a_i = -ln(1 - u_i), u = avgrank/(n+1) — the locally most
# powerful rank test against exponential-scale alternatives (the
# log-rank test's rank-statistic ancestor).
# ---------------------------------------------------------------------------


def q_savage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    c0 = _typed_counts(spark, sf_dir)
    rv = _ranked_values(c0).withColumn(
        "s_e6",
        F.floor(
            -F.log(
                1.0
                - F.col("r2").cast("double") / (2.0 * (F.col("n") + 1))
            )
            * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    return _linear_rank_two_sample(rv, c0, "s_e6")


SQL_SAVAGE = f"""
WITH {_SQL_COUNTS}, {_SQL_RANKED}, sc AS (
  SELECT event_type, v, n,
         CAST(floor(-ln(1.0 - CAST(r2 AS DOUBLE) / (2.0 * (n + 1)))
                    * 1000000 + {_OFF}) AS BIGINT) AS s_e6
  FROM rv
), {_SQL_LINRANK}
{_SQL_LINRANK_OUT}
"""


# ---------------------------------------------------------------------------
# klotz_scale — Klotz (1962) squared-normal-scores scale test:
# a_i = probit(u_i)^2 — the normal-scores twin of Mood's scale test,
# riding the shared Acklam probit.
# ---------------------------------------------------------------------------


def q_klotz_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    c0 = _typed_counts(spark, sf_dir)
    pb = _probit(F.col("r2").cast("double") / (2.0 * (F.col("n") + 1)))
    rv = _ranked_values(c0).withColumn(
        "s_e6",
        F.floor(pb * pb * 1_000_000 + F.lit(_OFF)).cast("long"),
    )
    return _linear_rank_two_sample(rv, c0, "s_e6")


_KLOTZ_P = "CAST(r2 AS DOUBLE) / (2.0 * (n + 1))"
SQL_KLOTZ = f"""
WITH {_SQL_COUNTS}, {_SQL_RANKED}, sc AS (
  SELECT event_type, v, n,
         CAST(floor({_probit_sql(_KLOTZ_P)} * {_probit_sql(_KLOTZ_P)}
                    * 1000000 + {_OFF}) AS BIGINT) AS s_e6
  FROM rv
), {_SQL_LINRANK}
{_SQL_LINRANK_OUT}
"""


# ---------------------------------------------------------------------------
# mood_scale — Mood's (1954) squared rank-deviation scale test:
# a_i = (avgrank - (n+1)/2)^2; with doubled ranks the score
# (r2 - (n+1))^2 / 4 is exact in quarter units (kept x4 as integers).
# ---------------------------------------------------------------------------


def q_mood_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    c0 = _typed_counts(spark, sf_dir)
    rv = _ranked_values(c0).withColumn(
        "s_e6",
        (F.col("r2") - (F.col("n") + 1))
        * (F.col("r2") - (F.col("n") + 1)),
    )
    return _linear_rank_two_sample(rv, c0, "s_e6")


SQL_MOOD_SCALE = f"""
WITH {_SQL_COUNTS}, {_SQL_RANKED}, sc AS (
  SELECT event_type, v, n,
         (r2 - (n + 1)) * (r2 - (n + 1)) AS s_e6
  FROM rv
), {_SQL_LINRANK}
{_SQL_LINRANK_OUT}
"""


# ---------------------------------------------------------------------------
# cluster_bootstrap_se — deterministic Poisson(1)-weight cluster
# bootstrap (users are the clusters; Owen & Eckles 2012 online
# bootstrap) with B = 50 replicates.  Weights come from a pure
# arithmetic multiplicative hash evaluated identically in both engines
# (residue thresholds matching the Poisson(1) pmf), so the "random"
# resample is reproducible cross-engine by construction.
# ---------------------------------------------------------------------------

_BOOT_B = 50


def q_cluster_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    per_u = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("nu"), F.sum("v").alias("su")
    )
    reps = spark.range(1, _BOOT_B + 1).select(F.col("id").alias("b"))
    x = per_u.crossJoin(F.broadcast(reps))
    r = (
        F.col("user_id") * 2_654_435_761 + F.col("b") * 40_503
    ) % 1_000_000
    w = (
        F.when(r < 367_879, 0)
        .when(r < 735_758, 1)
        .when(r < 919_698, 2)
        .when(r < 980_998, 3)
        .otherwise(4)
    )
    boot = x.withColumn("w", w).groupBy("event_type", "b").agg(
        F.sum(F.col("w") * F.col("su")).alias("sv"),
        F.sum(F.col("w") * F.col("nu")).alias("sn"),
    ).filter(F.col("sn") > 0)
    m_e6 = F.floor(
        F.col("sv").cast("double") / F.col("sn") * 1_000_000 + F.lit(_OFF)
    ).cast("long")
    # m_e6 ~ mean*1e6 can reach 1e11, so m_e6^2 would overflow int64;
    # center each replicate on the per-group integer mean first (exact
    # in both engines: sm <= 50*1e11 is exact in a double) so the
    # squared deviations stay small-integer.
    means = boot.select("event_type", m_e6.alias("m_e6"))
    gm = (
        means.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("bb"), F.sum("m_e6").alias("sm"))
        .withColumn(
            "m0", F.floor(F.col("sm") / F.col("bb")).cast("long")
        )
    )
    agg = (
        means.join(F.broadcast(gm), "event_type")
        .withColumn("d", F.col("m_e6") - F.col("m0"))
        .groupBy("event_type")
        .agg(
            F.max("bb").alias("bb"),
            F.sum("d").alias("sd1"),
            F.sum(F.col("d") * F.col("d")).alias("sdd"),
        )
    )
    bbd = F.col("bb").cast("double")
    sd_e6 = F.sqrt(
        (
            F.col("sdd").cast("double")
            - F.col("sd1").cast("double")
            * F.col("sd1").cast("double")
            / bbd
        )
        / (bbd - 1.0)
    )
    full = per_u.groupBy("event_type").agg(
        (F.sum("su").cast("double") / F.sum("nu")).alias("mean")
    )
    out = agg.join(full, "event_type")
    return out.select(
        "event_type",
        F.col("bb").cast("long").alias("b_reps"),
        F.floor(F.col("mean") * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mean_e4"
        ),
        F.floor(sd_e6 + F.lit(_OFF)).cast("long").alias("boot_se_e6"),
    ).orderBy("event_type")


SQL_CLUSTER_BOOT = f"""
WITH per_u AS (
  SELECT event_type, user_id, count(*) AS nu,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS su
  FROM events GROUP BY 1, 2
), reps AS (
  SELECT unnest(generate_series(1, {_BOOT_B})) AS b
), x AS (
  SELECT event_type, b, nu, su,
         (user_id * 2654435761 + b * 40503) % 1000000 AS r
  FROM per_u CROSS JOIN reps
), boot AS (
  SELECT event_type, b,
         CAST(sum((CASE WHEN r < 367879 THEN 0
                        WHEN r < 735758 THEN 1
                        WHEN r < 919698 THEN 2
                        WHEN r < 980998 THEN 3
                        ELSE 4 END) * su) AS BIGINT) AS sv,
         CAST(sum((CASE WHEN r < 367879 THEN 0
                        WHEN r < 735758 THEN 1
                        WHEN r < 919698 THEN 2
                        WHEN r < 980998 THEN 3
                        ELSE 4 END) * nu) AS BIGINT) AS sn
  FROM x GROUP BY 1, 2
), means AS (
  SELECT event_type,
         CAST(floor(CAST(sv AS DOUBLE) / sn * 1000000 + {_OFF})
              AS BIGINT) AS m_e6
  FROM boot WHERE sn > 0
), gm AS (
  SELECT event_type, count(*) AS bb,
         CAST(sum(m_e6) AS BIGINT) AS sm
  FROM means GROUP BY 1
), gm2 AS (
  SELECT event_type, bb,
         CAST(floor(CAST(sm AS DOUBLE) / bb) AS BIGINT) AS m0
  FROM gm
), agg AS (
  SELECT means.event_type, CAST(max(bb) AS BIGINT) AS bb,
         CAST(sum(m_e6 - m0) AS BIGINT) AS sd1,
         CAST(sum((m_e6 - m0) * (m_e6 - m0)) AS BIGINT) AS sdd
  FROM means JOIN gm2 ON gm2.event_type = means.event_type
  GROUP BY 1
), fl AS (
  SELECT event_type, CAST(sum(su) AS DOUBLE) / sum(nu) AS mean
  FROM per_u GROUP BY 1
)
SELECT agg.event_type, CAST(bb AS BIGINT) AS b_reps,
       CAST(floor(mean * 10000 + {_OFF}) AS BIGINT) AS mean_e4,
       CAST(floor(sqrt((CAST(sdd AS DOUBLE)
                        - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE) / bb)
                       / (bb - 1.0)) + {_OFF})
            AS BIGINT) AS boot_se_e6
FROM agg JOIN fl ON fl.event_type = agg.event_type
ORDER BY agg.event_type
"""


QUERIES.update(
    {
        "savage_scores": q_savage_scores,
        "klotz_scale": q_klotz_scale,
        "mood_scale": q_mood_scale,
        "cluster_bootstrap_se": q_cluster_bootstrap_se,
    }
)

ORACLE_SQL.update(
    {
        "savage_scores": SQL_SAVAGE,
        "klotz_scale": SQL_KLOTZ,
        "mood_scale": SQL_MOOD_SCALE,
        "cluster_bootstrap_se": SQL_CLUSTER_BOOT,
    }
)


# ===========================================================================
# Battery O: market-microstructure / portfolio diagnostics on the
# daily total-value layer — CAPM beta/alpha vs the all-type "market",
# Treynor + information ratios, Amihud illiquidity, and Roll's
# implied spread from negative first-order return autocovariance.
# Shared scaffold: per-(type, day) integer value sums; daily
# log-returns e6-floored so every second moment is an exact BIGINT.
# ===========================================================================


def _daily_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("vv"),
        F.count(F.lit(1)).alias("cnt"),
    )


def _daily_returns(daily: DataFrame) -> DataFrame:
    """e6-floored daily log-returns per type (positive-value guard)."""
    wo = Window.partitionBy("event_type").orderBy("day")
    r = daily.withColumn("vp", F.lag("vv").over(wo)).filter(
        F.col("vp").isNotNull() & (F.col("vp") > 0) & (F.col("vv") > 0)
    )
    return r.select(
        "event_type",
        "day",
        "cnt",
        F.floor(
            F.log(F.col("vv").cast("double") / F.col("vp")) * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("r6"),
    )


def _market_returns(daily: DataFrame) -> DataFrame:
    """e6-floored daily log-returns of the all-type market total."""
    mkt = daily.groupBy("day").agg(F.sum("vv").alias("mv"))
    wo = Window.orderBy("day")
    m = mkt.withColumn("mp", F.lag("mv").over(wo)).filter(
        F.col("mp").isNotNull() & (F.col("mp") > 0) & (F.col("mv") > 0)
    )
    return m.select(
        "day",
        F.floor(
            F.log(F.col("mv").cast("double") / F.col("mp")) * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("m6"),
    )


_SQL_DAILY_VC = f"""
  daily AS (
    SELECT event_type,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
             AS day,
           CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                AS BIGINT) AS vv,
           count(*) AS cnt
    FROM events GROUP BY 1, 2
  )
"""

_SQL_TYPE_RET = """
  tr AS (
    SELECT event_type, day, cnt, vv,
           lag(vv) OVER (PARTITION BY event_type ORDER BY day) AS vp
    FROM daily
  ), rr AS (
    SELECT event_type, day, cnt,
           CAST(floor(ln(CAST(vv AS DOUBLE) / vp) * 1e6 + {off})
                AS BIGINT) AS r6
    FROM tr WHERE vp IS NOT NULL AND vp > 0 AND vv > 0
  )
""".format(off=_OFF)

_SQL_MKT_RET = """
  mkt AS (
    SELECT day, CAST(sum(vv) AS BIGINT) AS mv FROM daily GROUP BY 1
  ), mk2 AS (
    SELECT day, mv, lag(mv) OVER (ORDER BY day) AS mp FROM mkt
  ), mr AS (
    SELECT day,
           CAST(floor(ln(CAST(mv AS DOUBLE) / mp) * 1e6 + {off})
                AS BIGINT) AS m6
    FROM mk2 WHERE mp IS NOT NULL AND mp > 0 AND mv > 0
  )
""".format(off=_OFF)


# ---------------------------------------------------------------------------
# capm_beta — single-index market-model OLS per type: r_t = alpha +
# beta m_t + e.  The market factor is the all-type daily total (a
# 1-row-per-day table, broadcast to the type series).  Sharpe (1963).
# ---------------------------------------------------------------------------


def q_capm_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value_counts(spark, sf_dir)
    j = _daily_returns(daily).join(
        F.broadcast(_market_returns(daily)), "day"
    )
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("m6").alias("sx"),
        F.sum("r6").alias("sy"),
        F.sum(F.col("m6") * F.col("m6")).alias("sxx"),
        F.sum(F.col("m6") * F.col("r6")).alias("sxy"),
        F.sum(F.col("r6") * F.col("r6")).alias("syy"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    vx = F.col("sxx").cast("double") - sx * sx / n
    vy = F.col("syy").cast("double") - sy * sy / n
    cxy = F.col("sxy").cast("double") - sx * sy / n
    beta = cxy / vx
    alpha6 = (sy - beta * sx) / n
    r2 = cxy * cxy / (vx * vy)
    return (
        agg.filter((F.col("n_days") > 2))
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.floor(beta * 10_000 + F.lit(_OFF)).cast("long").alias(
                "beta_e4"
            ),
            F.floor(alpha6 * 100 + F.lit(_OFF)).cast("long").alias(
                "alpha_e8"
            ),
            F.floor(r2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "r2_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_CAPM = f"""
WITH {_SQL_DAILY_VC}, {_SQL_TYPE_RET}, {_SQL_MKT_RET}, j AS (
  SELECT rr.event_type, rr.r6, mr.m6
  FROM rr JOIN mr ON mr.day = rr.day
), agg AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(m6) AS BIGINT) AS sx,
         CAST(sum(r6) AS BIGINT) AS sy,
         CAST(sum(m6 * m6) AS BIGINT) AS sxx,
         CAST(sum(m6 * r6) AS BIGINT) AS sxy,
         CAST(sum(r6 * r6) AS BIGINT) AS syy
  FROM j GROUP BY 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n_days)
                  / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n_days)
                  * 10000 + {_OFF}) AS BIGINT) AS beta_e4,
       CAST(floor((CAST(sy AS DOUBLE)
                   - (CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * sy / n_days)
                     / (CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * sx / n_days) * sx)
                  / n_days * 100 + {_OFF}) AS BIGINT) AS alpha_e8,
       CAST(floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n_days)
                  * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n_days)
                  / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n_days)
                     * (CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * sy / n_days))
                  * 1000000 + {_OFF}) AS BIGINT) AS r2_e6
FROM agg WHERE n_days > 2
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# treynor_information — Treynor ratio (mean return per unit market
# beta) and the information ratio mean(r - m)/sd(r - m) of each type
# against the market factor (Treynor 1965; Goodwin 1998).
# ---------------------------------------------------------------------------


def q_treynor_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value_counts(spark, sf_dir)
    j = _daily_returns(daily).join(
        F.broadcast(_market_returns(daily)), "day"
    )
    d = j.withColumn("d6", F.col("r6") - F.col("m6"))
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("m6").alias("sx"),
        F.sum("r6").alias("sy"),
        F.sum(F.col("m6") * F.col("m6")).alias("sxx"),
        F.sum(F.col("m6") * F.col("r6")).alias("sxy"),
        F.sum("d6").alias("sd1"),
        F.sum(F.col("d6") * F.col("d6")).alias("sdd"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    beta = (F.col("sxy").cast("double") - sx * sy / n) / (
        F.col("sxx").cast("double") - sx * sx / n
    )
    treynor = sy / n / 1e6 / beta
    sd1 = F.col("sd1").cast("double")
    sdd = F.col("sdd").cast("double")
    ir = (sd1 / n) / F.sqrt((sdd - sd1 * sd1 / n) / (n - 1.0))
    return (
        agg.filter(F.col("n_days") > 2)
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.floor(treynor * 1e8 + F.lit(_OFF)).cast("long").alias(
                "treynor_e8"
            ),
            F.floor(ir * 10_000 + F.lit(_OFF)).cast("long").alias(
                "info_ratio_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_TREYNOR = f"""
WITH {_SQL_DAILY_VC}, {_SQL_TYPE_RET}, {_SQL_MKT_RET}, j AS (
  SELECT rr.event_type, rr.r6, mr.m6, rr.r6 - mr.m6 AS d6
  FROM rr JOIN mr ON mr.day = rr.day
), agg AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(m6) AS BIGINT) AS sx,
         CAST(sum(r6) AS BIGINT) AS sy,
         CAST(sum(m6 * m6) AS BIGINT) AS sxx,
         CAST(sum(m6 * r6) AS BIGINT) AS sxy,
         CAST(sum(d6) AS BIGINT) AS sd1,
         CAST(sum(d6 * d6) AS BIGINT) AS sdd
  FROM j GROUP BY 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(floor(CAST(sy AS DOUBLE) / n_days / 1e6
                  / ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n_days)
                     / (CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * sx / n_days))
                  * 1e8 + {_OFF}) AS BIGINT) AS treynor_e8,
       CAST(floor((CAST(sd1 AS DOUBLE) / n_days)
                  / sqrt((CAST(sdd AS DOUBLE)
                          - CAST(sd1 AS DOUBLE) * sd1 / n_days)
                         / (n_days - 1.0))
                  * 10000 + {_OFF}) AS BIGINT) AS info_ratio_e4
FROM agg WHERE n_days > 2
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# amihud_illiquidity — Amihud (2002) ILLIQ: mean over days of
# |daily return| / daily volume (event count as the volume proxy).
# Per-day terms e9-floored integers so the day mean is exact.
# ---------------------------------------------------------------------------


def q_amihud_illiquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value_counts(spark, sf_dir)
    r = _daily_returns(daily)
    # |r6|/1e6 / cnt * 1e9 = |r6| * 1000 / cnt, floored per day
    term = F.floor(
        F.abs(F.col("r6")).cast("double") * 1000.0 / F.col("cnt")
        + F.lit(_OFF)
    ).cast("long")
    agg = r.select("event_type", term.alias("t9")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("t9").alias("st")
    )
    illiq = F.col("st").cast("double") / F.col("n_days").cast("double")
    return agg.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.floor(illiq + F.lit(_OFF)).cast("long").alias("illiq_e9"),
    ).orderBy("event_type")


SQL_AMIHUD = f"""
WITH {_SQL_DAILY_VC}, {_SQL_TYPE_RET}, terms AS (
  SELECT event_type,
         CAST(floor(CAST(abs(r6) AS DOUBLE) * 1000.0 / cnt + {_OFF})
              AS BIGINT) AS t9
  FROM rr
), agg AS (
  SELECT event_type, count(*) AS n_days, CAST(sum(t9) AS BIGINT) AS st
  FROM terms GROUP BY 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(floor(CAST(st AS DOUBLE) / n_days + {_OFF}) AS BIGINT)
         AS illiq_e9
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# roll_spread — Roll (1984) implied effective spread from the
# first-order serial covariance of consecutive-day returns:
# s = 2 sqrt(-cov(r_t, r_{t-1})) when the covariance is negative
# (bid-ask bounce signature); cov >= 0 reports spread 0 + flag.
# ---------------------------------------------------------------------------


def q_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value_counts(spark, sf_dir)
    r = _daily_returns(daily)
    wo = Window.partitionBy("event_type").orderBy("day")
    p = r.withColumn("r6p", F.lag("r6").over(wo)).filter(
        F.col("r6p").isNotNull()
    )
    agg = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("r6").alias("sa"),
        F.sum("r6p").alias("sb"),
        F.sum(F.col("r6") * F.col("r6p")).alias("sab"),
    )
    n = F.col("np").cast("double")
    cov = (
        F.col("sab").cast("double")
        - F.col("sa").cast("double") * F.col("sb").cast("double") / n
    ) / n
    neg = cov < 0
    spread6 = F.when(neg, 2.0 * F.sqrt(-cov)).otherwise(F.lit(0.0))
    return (
        agg.filter(F.col("np") > 2)
        .select(
            "event_type",
            F.col("np").cast("long").alias("n_pairs"),
            F.floor(cov + F.lit(_OFF)).cast("long").alias("autocov_e12"),
            F.when(neg, F.lit(1)).otherwise(F.lit(0))
            .cast("long")
            .alias("bounce_flag"),
            F.floor(spread6 + F.lit(_OFF)).cast("long").alias(
                "spread_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_ROLL = f"""
WITH {_SQL_DAILY_VC}, {_SQL_TYPE_RET}, p AS (
  SELECT event_type, r6,
         lag(r6) OVER (PARTITION BY event_type ORDER BY day) AS r6p
  FROM rr
), p2 AS (
  SELECT * FROM p WHERE r6p IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS np,
         CAST(sum(r6) AS BIGINT) AS sa,
         CAST(sum(r6p) AS BIGINT) AS sb,
         CAST(sum(r6 * r6p) AS BIGINT) AS sab
  FROM p2 GROUP BY 1
), cv AS (
  SELECT event_type, np,
         (CAST(sab AS DOUBLE)
          - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / np) / np AS cov
  FROM agg WHERE np > 2
)
SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
       CAST(floor(cov + {_OFF}) AS BIGINT) AS autocov_e12,
       CAST(CASE WHEN cov < 0 THEN 1 ELSE 0 END AS BIGINT) AS bounce_flag,
       CAST(floor(CASE WHEN cov < 0 THEN 2.0 * sqrt(-cov) ELSE 0.0 END
                  + {_OFF}) AS BIGINT) AS spread_e6
FROM cv ORDER BY event_type
"""


QUERIES.update(
    {
        "capm_beta": q_capm_beta,
        "treynor_information": q_treynor_information,
        "amihud_illiquidity": q_amihud_illiquidity,
        "roll_spread": q_roll_spread,
    }
)

ORACLE_SQL.update(
    {
        "capm_beta": SQL_CAPM,
        "treynor_information": SQL_TREYNOR,
        "amihud_illiquidity": SQL_AMIHUD,
        "roll_spread": SQL_ROLL,
    }
)


# ===========================================================================
# Battery P: semiparametric survival + A/B ratio metrics + non-nested
# model choice — Cox proportional hazards by two explicit Newton steps
# on the Breslow partial likelihood (riding the logrank risk-set
# scaffold, cf. queries_stats8.py::q_logrank_test), the Schoenfeld
# residual-vs-time PH check, the delta-method / cluster-linearized SE
# of an A/B ratio metric, and a Vuong-style non-nested LR z comparing
# Poisson vs negative-binomial plug-in fits.
# ===========================================================================

from diive_spark.queries_stats15 import _lngamma, _lngamma_sql


def _cox_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t, d, d1, n, n1) risk table on user lifetimes, day vs night.

    Same group/time construction as q_logrank_test: group = first
    event in [8, 20) local hours; t = lifetime span in days; suffix
    sums over the BOUNDED lifetime domain give the risk sets.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
    per = ev.groupBy("user_id").agg(
        F.min(F.floor(sec).cast("long")).alias("first_s"),
        F.min(F.floor(sec / 86_400).cast("long")).alias("d0"),
        F.max(F.floor(sec / 86_400).cast("long")).alias("d1x"),
    )
    per = per.select(
        (F.col("d1x") - F.col("d0") + 1).alias("t"),
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
        F.count(F.lit(1)).alias("d"), F.sum("g1").alias("d1")
    )
    wo = Window.orderBy(F.col("t").desc())
    return (
        dt.withColumn(
            "n",
            F.sum("d").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "n1",
            F.sum("d1").over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("n") > 1)
    )


_SQL_COX_RISK = """
  per AS (
    SELECT CAST(max(floor(epoch(ts) / 86400))
                - min(floor(epoch(ts) / 86400)) + 1 AS BIGINT) AS t,
           CASE WHEN CAST(floor((CAST(min(floor(epoch(ts))) AS BIGINT)
                                 % 86400) / 3600) AS BIGINT)
                     BETWEEN 8 AND 19
                THEN 1 ELSE 0 END AS g1
    FROM events GROUP BY user_id
  ), dt AS (
    SELECT t, CAST(count(*) AS BIGINT) AS d,
           CAST(sum(g1) AS BIGINT) AS d1
    FROM per GROUP BY 1
  ), risk AS (
    SELECT t, d, d1,
           CAST(sum(d) OVER (ORDER BY t DESC) AS BIGINT) AS n,
           CAST(sum(d1) OVER (ORDER BY t DESC) AS BIGINT) AS n1
    FROM dt
  ), risk2 AS (
    SELECT * FROM risk WHERE n > 1
  )
"""


# ---------------------------------------------------------------------------
# cox_ph_newton — Cox (1972) PH model, one binary covariate (day vs
# night first-event cohort), Breslow tie handling, exactly TWO Newton
# steps from beta = 0 (no driver loop; step 1 is the classical
# logrank-score step U(0)/I(0)).  Per-time score/information terms
# are e9-floored so both engines iterate from identical rationals.
# ---------------------------------------------------------------------------


def q_cox_ph_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    risk = _cox_risk(spark, sf_dir)
    d = F.col("d").cast("double")
    n1 = F.col("n1").cast("double")
    n0 = (F.col("n") - F.col("n1")).cast("double")
    nn = F.col("n").cast("double")
    s0 = risk.select(
        F.col("d1").alias("d1"),
        F.floor((F.col("d1") - d * n1 / nn) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("u9"),
        F.floor(d * n1 * n0 / (nn * nn) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("i9"),
    ).agg(F.sum("u9").alias("su"), F.sum("i9").alias("si"))
    b1c = F.col("su").cast("double") / F.col("si").cast("double")
    step1 = s0.select(b1c.alias("b1"))
    r2 = risk.crossJoin(F.broadcast(step1))
    eb = F.exp(F.col("b1"))
    den = n0 + n1 * eb
    p1 = n1 * eb / den
    s1 = r2.select(
        F.col("b1"),
        F.floor((F.col("d1") - d * p1) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("u9"),
        F.floor(d * n0 * n1 * eb / (den * den) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("i9"),
    ).groupBy("b1").agg(F.sum("u9").alias("su"), F.sum("i9").alias("si"))
    b2 = F.col("b1") + F.col("su").cast("double") / F.col(
        "si"
    ).cast("double")
    info = F.col("si").cast("double") / 1e9
    se = 1.0 / F.sqrt(info)
    return s1.select(
        F.floor(F.col("b1") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("beta1_e6"),
        F.floor(b2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "beta2_e6"
        ),
        F.floor(F.exp(b2) * 10_000 + F.lit(_OFF)).cast("long").alias(
            "hr_e4"
        ),
        F.floor(se * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "se_e6"
        ),
        F.floor(b2 / se * 10_000 + F.lit(_OFF)).cast("long").alias(
            "wald_z_e4"
        ),
    )


SQL_COX = f"""
WITH {_SQL_COX_RISK}, s0 AS (
  SELECT CAST(sum(CAST(floor((d1 - CAST(d AS DOUBLE) * n1 / n) * 1e9
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS su,
         CAST(sum(CAST(floor(CAST(d AS DOUBLE) * n1 * (n - n1)
                             / (CAST(n AS DOUBLE) * n) * 1e9 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS si
  FROM risk2
), step1 AS (
  SELECT CAST(su AS DOUBLE) / si AS b1 FROM s0
), s1 AS (
  SELECT b1,
         CAST(sum(CAST(floor(
           (d1 - CAST(d AS DOUBLE)
                 * (n1 * exp(b1))
                 / ((n - n1) + n1 * exp(b1))) * 1e9 + {_OFF})
           AS BIGINT)) AS BIGINT) AS su,
         CAST(sum(CAST(floor(
           CAST(d AS DOUBLE) * (n - n1) * n1 * exp(b1)
           / (((n - n1) + n1 * exp(b1))
              * ((n - n1) + n1 * exp(b1))) * 1e9 + {_OFF})
           AS BIGINT)) AS BIGINT) AS si
  FROM risk2 CROSS JOIN step1
  GROUP BY b1
)
SELECT CAST(floor(b1 * 1000000 + {_OFF}) AS BIGINT) AS beta1_e6,
       CAST(floor((b1 + CAST(su AS DOUBLE) / si) * 1000000 + {_OFF})
            AS BIGINT) AS beta2_e6,
       CAST(floor(exp(b1 + CAST(su AS DOUBLE) / si) * 10000 + {_OFF})
            AS BIGINT) AS hr_e4,
       CAST(floor(1.0 / sqrt(CAST(si AS DOUBLE) / 1e9) * 1000000
                  + {_OFF}) AS BIGINT) AS se_e6,
       CAST(floor((b1 + CAST(su AS DOUBLE) / si)
                  / (1.0 / sqrt(CAST(si AS DOUBLE) / 1e9)) * 10000
                  + {_OFF}) AS BIGINT) AS wald_z_e4
FROM s1
"""


# ---------------------------------------------------------------------------
# schoenfeld_trend — proportional-hazards check: Pearson correlation
# of per-time (summed) Schoenfeld residuals d1 - d*pi(beta2) with the
# event time, at the two-step Breslow beta from cox_ph_newton
# (Schoenfeld 1982; the informal residual-vs-time PH scatter test).
# Residuals are e3-floored so second moments over the bounded
# lifetime domain stay far inside int64.
# ---------------------------------------------------------------------------


def q_schoenfeld_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    risk = _cox_risk(spark, sf_dir)
    d = F.col("d").cast("double")
    n1 = F.col("n1").cast("double")
    n0 = (F.col("n") - F.col("n1")).cast("double")
    nn = F.col("n").cast("double")
    s0 = risk.select(
        F.floor((F.col("d1") - d * n1 / nn) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("u9"),
        F.floor(d * n1 * n0 / (nn * nn) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("i9"),
    ).agg(
        (F.sum("u9").cast("double") / F.sum("i9").cast("double")).alias(
            "b1"
        )
    )
    r1 = risk.crossJoin(F.broadcast(s0))
    eb1 = F.exp(F.col("b1"))
    den1 = n0 + n1 * eb1
    s1 = r1.select(
        F.col("b1"),
        F.floor(
            (F.col("d1") - d * n1 * eb1 / den1) * 1e9 + F.lit(_OFF)
        )
        .cast("long")
        .alias("u9"),
        F.floor(d * n0 * n1 * eb1 / (den1 * den1) * 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("i9"),
    ).groupBy("b1").agg(F.sum("u9").alias("su"), F.sum("i9").alias("si"))
    b2df = s1.select(
        (
            F.col("b1")
            + F.col("su").cast("double") / F.col("si").cast("double")
        ).alias("b2")
    )
    r2 = risk.crossJoin(F.broadcast(b2df))
    eb2 = F.exp(F.col("b2"))
    den2 = n0 + n1 * eb2
    res = r2.select(
        F.col("t"),
        F.floor(
            (F.col("d1") - d * n1 * eb2 / den2) * 1000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("r3"),
    )
    agg = res.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum("r3").alias("sr"),
        F.sum(F.col("r3") * F.col("r3")).alias("srr"),
        F.sum(F.col("t") * F.col("r3")).alias("str"),
    )
    md = F.col("m").cast("double")
    vt = F.col("stt").cast("double") - F.col("st").cast(
        "double"
    ) * F.col("st").cast("double") / md
    vr = F.col("srr").cast("double") - F.col("sr").cast(
        "double"
    ) * F.col("sr").cast("double") / md
    ctr = F.col("str").cast("double") - F.col("st").cast(
        "double"
    ) * F.col("sr").cast("double") / md
    corr = ctr / F.sqrt(vt * vr)
    slope = ctr / vt
    return agg.filter((F.col("m") > 2)).select(
        F.col("m").cast("long").alias("n_times"),
        F.floor(corr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "corr_e6"
        ),
        F.floor(slope * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "slope_e6"
        ),
    )


SQL_SCHOENFELD = f"""
WITH {_SQL_COX_RISK}, s0 AS (
  SELECT CAST(sum(CAST(floor((d1 - CAST(d AS DOUBLE) * n1 / n) * 1e9
                             + {_OFF}) AS BIGINT)) AS DOUBLE)
         / sum(CAST(floor(CAST(d AS DOUBLE) * n1 * (n - n1)
                          / (CAST(n AS DOUBLE) * n) * 1e9 + {_OFF})
                    AS BIGINT)) AS b1
  FROM risk2
), s1 AS (
  SELECT b1,
         CAST(sum(CAST(floor(
           (d1 - CAST(d AS DOUBLE) * (n1 * exp(b1))
                 / ((n - n1) + n1 * exp(b1))) * 1e9 + {_OFF})
           AS BIGINT)) AS BIGINT) AS su,
         CAST(sum(CAST(floor(
           CAST(d AS DOUBLE) * (n - n1) * n1 * exp(b1)
           / (((n - n1) + n1 * exp(b1))
              * ((n - n1) + n1 * exp(b1))) * 1e9 + {_OFF})
           AS BIGINT)) AS BIGINT) AS si
  FROM risk2 CROSS JOIN s0
  GROUP BY b1
), b2t AS (
  SELECT b1 + CAST(su AS DOUBLE) / si AS b2 FROM s1
), res AS (
  SELECT t,
         CAST(floor((d1 - CAST(d AS DOUBLE) * (n1 * exp(b2))
                          / ((n - n1) + n1 * exp(b2))) * 1000
                    + {_OFF}) AS BIGINT) AS r3
  FROM risk2 CROSS JOIN b2t
), agg AS (
  SELECT count(*) AS m,
         CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(t * t) AS BIGINT) AS stt,
         CAST(sum(r3) AS BIGINT) AS sr,
         CAST(sum(r3 * r3) AS BIGINT) AS srr,
         CAST(sum(t * r3) AS BIGINT) AS str
  FROM res
)
SELECT CAST(m AS BIGINT) AS n_times,
       CAST(floor((CAST(str AS DOUBLE) - CAST(st AS DOUBLE) * sr / m)
                  / sqrt((CAST(stt AS DOUBLE)
                          - CAST(st AS DOUBLE) * st / m)
                         * (CAST(srr AS DOUBLE)
                            - CAST(sr AS DOUBLE) * sr / m))
                  * 1000000 + {_OFF}) AS BIGINT) AS corr_e6,
       CAST(floor((CAST(str AS DOUBLE) - CAST(st AS DOUBLE) * sr / m)
                  / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / m)
                  * 1000000 + {_OFF}) AS BIGINT) AS slope_e6
FROM agg WHERE m > 2
"""


# ---------------------------------------------------------------------------
# delta_method_ratio — cluster-linearized (delta-method) SE of the
# A/B ratio metric sum(value)/count with users as clusters (Deng,
# Knoblich & Lu, KDD 2018).  Arms = day vs night first-event cohorts.
# R = Y/N is an exact integer ratio; per-user linearization terms
# (y_u - R n_u)^2 are floored to integers before the cluster sum.
# ---------------------------------------------------------------------------


def q_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
    arm = ev.groupBy("user_id").agg(
        F.min(F.floor(sec).cast("long")).alias("first_s")
    ).select(
        "user_id",
        F.when(
            ((F.col("first_s") % 86_400) / 3_600)
            .cast("long")
            .between(8, 19),
            1,
        )
        .otherwise(0)
        .alias("arm"),
    )
    per = ev.groupBy("event_type", "user_id").agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("yu"),
        F.count(F.lit(1)).alias("nu"),
    ).join(arm, "user_id")
    tot = per.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("yu").alias("yy"),
        F.sum("nu").alias("nn"),
    ).withColumn(
        "r", F.col("yy").cast("double") / F.col("nn").cast("double")
    )
    terms = per.join(
        F.broadcast(tot.select("event_type", "arm", "k", "nn", "r")),
        ["event_type", "arm"],
    ).select(
        "event_type",
        "arm",
        "k",
        "nn",
        "r",
        F.floor(
            (F.col("yu") - F.col("r") * F.col("nu"))
            * (F.col("yu") - F.col("r") * F.col("nu"))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("t2"),
    )
    g = terms.groupBy("event_type", "arm", "k", "nn", "r").agg(
        F.sum("t2").alias("s2")
    )
    kd = F.col("k").cast("double")
    nd = F.col("nn").cast("double")
    se = F.sqrt(
        F.col("s2").cast("double") * kd / (kd - 1.0)
    ) / nd
    g2 = g.select(
        "event_type",
        "arm",
        F.col("k").cast("long").alias("k"),
        F.col("r").alias("r"),
        se.alias("se"),
    )
    dda = g2.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("k").alias("k_day"),
        F.col("r").alias("rd"),
        F.col("se").alias("sed"),
    )
    ddn = g2.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("k").alias("k_night"),
        F.col("r").alias("rn"),
        F.col("se").alias("sen"),
    )
    j = dda.join(ddn, "event_type")
    z = (F.col("rd") - F.col("rn")) / F.sqrt(
        F.col("sed") * F.col("sed") + F.col("sen") * F.col("sen")
    )
    return j.select(
        "event_type",
        F.col("k_day").cast("long").alias("k_day"),
        F.col("k_night").cast("long").alias("k_night"),
        F.floor(F.col("rd") * 100 + F.lit(_OFF)).cast("long").alias(
            "r_day_e4"
        ),
        F.floor(F.col("rn") * 100 + F.lit(_OFF)).cast("long").alias(
            "r_night_e4"
        ),
        F.floor(F.col("sed") * 10_000 + F.lit(_OFF)).cast("long").alias(
            "se_day_e6"
        ),
        F.floor(F.col("sen") * 10_000 + F.lit(_OFF)).cast("long").alias(
            "se_night_e6"
        ),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("event_type")


SQL_DELTA_RATIO = f"""
WITH arm AS (
  SELECT user_id,
         CASE WHEN CAST(floor((CAST(min(floor(epoch(ts))) AS BIGINT)
                               % 86400) / 3600) AS BIGINT)
                   BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS arm
  FROM events GROUP BY user_id
), per AS (
  SELECT e.event_type, e.user_id, a.arm,
         CAST(sum(CAST(floor(e.value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS yu,
         count(*) AS nu
  FROM events e JOIN arm a ON a.user_id = e.user_id
  GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type, arm, count(*) AS k,
         CAST(sum(yu) AS BIGINT) AS yy,
         CAST(sum(nu) AS BIGINT) AS nn
  FROM per GROUP BY 1, 2
), tr AS (
  SELECT event_type, arm, k, nn,
         CAST(yy AS DOUBLE) / nn AS r
  FROM tot
), terms AS (
  SELECT p.event_type, p.arm, t.k, t.nn, t.r,
         CAST(floor((p.yu - t.r * p.nu) * (p.yu - t.r * p.nu)
                    + {_OFF}) AS BIGINT) AS t2
  FROM per p JOIN tr t
    ON t.event_type = p.event_type AND t.arm = p.arm
), g AS (
  SELECT event_type, arm, k, nn, r,
         CAST(sum(t2) AS BIGINT) AS s2
  FROM terms GROUP BY 1, 2, 3, 4, 5
), g2 AS (
  SELECT event_type, arm, k, r,
         sqrt(CAST(s2 AS DOUBLE) * k / (k - 1.0)) / nn AS se
  FROM g
)
SELECT d.event_type,
       CAST(d.k AS BIGINT) AS k_day,
       CAST(n.k AS BIGINT) AS k_night,
       CAST(floor(d.r * 100 + {_OFF}) AS BIGINT) AS r_day_e4,
       CAST(floor(n.r * 100 + {_OFF}) AS BIGINT) AS r_night_e4,
       CAST(floor(d.se * 10000 + {_OFF}) AS BIGINT) AS se_day_e6,
       CAST(floor(n.se * 10000 + {_OFF}) AS BIGINT) AS se_night_e6,
       CAST(floor((d.r - n.r) / sqrt(d.se * d.se + n.se * n.se)
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM g2 d JOIN g2 n
  ON n.event_type = d.event_type AND d.arm = 1 AND n.arm = 0
ORDER BY d.event_type
"""


# ---------------------------------------------------------------------------
# vuong_poisson_negbin — Vuong (Econometrica 1989) non-nested LR z
# between Poisson(lambda = xbar) and the MoM negative binomial on
# per-user event counts (zeros from the user grid).  The ln k! terms
# cancel inside the per-observation log-lik difference; what remains
# needs only the shared Lanczos lnGamma twin.  Differences collapse
# onto the bounded count domain (e3-floored so n_k-weighted squares
# stay well inside int64); z > 0 favours the negative binomial.
# ---------------------------------------------------------------------------


def q_vuong_poisson_negbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("x")
    )
    grid = (
        types.crossJoin(users)
        .join(per, ["event_type", "user_id"], "left")
        .fillna(0, ["x"])
    )
    kdom = grid.groupBy("event_type", "x").agg(
        F.count(F.lit(1)).alias("nk")
    )
    mom = kdom.groupBy("event_type").agg(
        F.sum("nk").alias("n"),
        F.sum(F.col("nk") * F.col("x")).alias("s1"),
        F.sum(F.col("nk") * F.col("x") * F.col("x")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    m = F.col("s1").cast("double") / nd
    s2v = (F.col("s2").cast("double") - nd * m * m) / (nd - 1.0)
    mom = mom.select(
        "event_type",
        F.col("n"),
        m.alias("lam"),
        (m / s2v).alias("p"),
        (m * m / (s2v - m)).alias("r"),
        (s2v > m).alias("overd"),
    ).filter(F.col("overd"))
    j = kdom.join(F.broadcast(mom), "event_type")
    k = F.col("x").cast("double")
    mterm = (
        _lngamma(k + F.col("r"))
        - _lngamma(F.col("r"))
        + F.col("r") * F.log(F.col("p"))
        + k * F.log(1.0 - F.col("p"))
        + F.col("lam")
        - k * F.log(F.col("lam"))
    )
    t = j.select(
        "event_type",
        "n",
        F.col("nk"),
        F.floor(mterm * 1000 + F.lit(_OFF)).cast("long").alias("m3"),
    )
    agg = t.groupBy("event_type", "n").agg(
        F.sum(F.col("nk") * F.col("m3")).alias("sm"),
        F.sum(F.col("nk") * F.col("m3") * F.col("m3")).alias("smm"),
    )
    mean3 = F.col("sm").cast("double") / nd
    var3 = F.col("smm").cast("double") / nd - mean3 * mean3
    z = F.sqrt(nd) * mean3 / F.sqrt(var3)
    return agg.filter(var3 > 0).select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.floor(mean3 * 1000 + F.lit(_OFF)).cast("long").alias(
            "mean_llr_e6"
        ),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias(
            "vuong_z_e4"
        ),
    ).orderBy("event_type")


_VG_K = "CAST(x AS DOUBLE)"
SQL_VUONG = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
types AS (SELECT DISTINCT event_type FROM events),
per AS (
  SELECT event_type, user_id, count(*) AS x
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, u.user_id, COALESCE(p.x, 0) AS x
  FROM types t CROSS JOIN users u
  LEFT JOIN per p
    ON p.event_type = t.event_type AND p.user_id = u.user_id
), kdom AS (
  SELECT event_type, x, count(*) AS nk FROM grid GROUP BY 1, 2
), mom AS (
  SELECT event_type,
         CAST(sum(nk) AS BIGINT) AS n,
         CAST(sum(nk * x) AS DOUBLE) / sum(nk) AS lam,
         (CAST(sum(nk * x * x) AS DOUBLE)
          - sum(nk) * (CAST(sum(nk * x) AS DOUBLE) / sum(nk))
                    * (CAST(sum(nk * x) AS DOUBLE) / sum(nk)))
           / (sum(nk) - 1.0) AS s2v
  FROM kdom GROUP BY 1
), momp AS (
  SELECT event_type, n, lam, lam / s2v AS p,
         lam * lam / (s2v - lam) AS r
  FROM mom WHERE s2v > lam
), t AS (
  SELECT k.event_type, m.n, k.nk,
         CAST(floor((
           {_lngamma_sql(f"{_VG_K} + r")}
           - {_lngamma_sql("r")}
           + r * ln(p) + {_VG_K} * ln(1.0 - p)
           + lam - {_VG_K} * ln(lam)) * 1000 + {_OFF})
           AS BIGINT) AS m3
  FROM kdom k JOIN momp m ON m.event_type = k.event_type
), agg AS (
  SELECT event_type, n,
         CAST(sum(nk * m3) AS BIGINT) AS sm,
         CAST(sum(nk * m3 * m3) AS BIGINT) AS smm
  FROM t GROUP BY 1, 2
)
SELECT event_type, CAST(n AS BIGINT) AS n_users,
       CAST(floor(CAST(sm AS DOUBLE) / n * 1000 + {_OFF}) AS BIGINT)
         AS mean_llr_e6,
       CAST(floor(sqrt(CAST(n AS DOUBLE))
                  * (CAST(sm AS DOUBLE) / n)
                  / sqrt(CAST(smm AS DOUBLE) / n
                         - (CAST(sm AS DOUBLE) / n)
                           * (CAST(sm AS DOUBLE) / n))
                  * 10000 + {_OFF}) AS BIGINT) AS vuong_z_e4
FROM agg
WHERE CAST(smm AS DOUBLE) / n
      - (CAST(sm AS DOUBLE) / n) * (CAST(sm AS DOUBLE) / n) > 0
ORDER BY event_type
"""


QUERIES.update(
    {
        "cox_ph_newton": q_cox_ph_newton,
        "schoenfeld_trend": q_schoenfeld_trend,
        "delta_method_ratio": q_delta_method_ratio,
        "vuong_poisson_negbin": q_vuong_poisson_negbin,
    }
)

ORACLE_SQL.update(
    {
        "cox_ph_newton": SQL_COX,
        "schoenfeld_trend": SQL_SCHOENFELD,
        "delta_method_ratio": SQL_DELTA_RATIO,
        "vuong_poisson_negbin": SQL_VUONG,
    }
)


# ===========================================================================
# Battery Q: GLM calibration, keyword extraction, compositional
# geometry, and second-order periodicity — logistic GLM by two
# explicit Newton steps (Bernoulli sibling of poisson_glm_newton),
# RAKE keyword scores over stopword-delimited phrases, Aitchison CLR
# total variance of the diel composition, and Whittle's second-peak
# periodogram test after removing Fisher's top ordinate.
# ===========================================================================


# ---------------------------------------------------------------------------
# logistic_glm_newton — weekend ~ standardized centi-value, fitted by
# exactly two Newton-Raphson steps from (logit(pbar), 0) on the
# collapsed value domain (IRLS with fixed iteration count — no driver
# loop; cf. poisson_glm_newton).  Gradient/Hessian terms e6-floored
# per distinct value so both engines step from identical rationals.
# ---------------------------------------------------------------------------


def _logit_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.dayofweek("ts").isin(1, 7)).cast("long").alias("pos"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    return ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("nv"), F.sum("pos").alias("yv")
    )


def q_logistic_glm_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _logit_cells(spark, sf_dir)
    mom = cells.groupBy("event_type").agg(
        F.sum("nv").alias("n"),
        F.sum("yv").alias("y"),
        F.sum(F.col("nv") * F.col("v")).alias("sv"),
        F.sum(F.col("nv") * F.col("v") * F.col("v")).alias("svv"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("sv").cast("double") / nd
    sd = F.sqrt(
        (F.col("svv").cast("double") - nd * mu * mu) / nd
    )
    mom = mom.select(
        "event_type",
        "n",
        "y",
        mu.alias("mv"),
        sd.alias("sdv"),
        F.log(
            F.col("y").cast("double")
            / (F.col("n") - F.col("y")).cast("double")
        ).alias("a0"),
    ).filter((F.col("y") > 0) & (F.col("y") < F.col("n")) & (sd > 0))

    def newton(cells_j: DataFrame, acol: str, bcol: str, tag: str):
        x = (F.col("v").cast("double") - F.col("mv")) / F.col("sdv")
        z = F.col(acol) + F.col(bcol) * x
        muz = 1.0 / (1.0 + F.exp(-z))
        w = muz * (1.0 - muz)
        nvd = F.col("nv").cast("double")
        yvd = F.col("yv").cast("double")
        t = cells_j.select(
            "event_type",
            acol,
            bcol,
            F.floor((yvd - nvd * muz) * 1e6 + F.lit(_OFF))
            .cast("long")
            .alias("g1"),
            F.floor(x * (yvd - nvd * muz) * 1e6 + F.lit(_OFF))
            .cast("long")
            .alias("g2"),
            F.floor(nvd * w * 1e6 + F.lit(_OFF)).cast("long").alias(
                "h11"
            ),
            F.floor(x * nvd * w * 1e6 + F.lit(_OFF)).cast("long").alias(
                "h12"
            ),
            F.floor(x * x * nvd * w * 1e6 + F.lit(_OFF))
            .cast("long")
            .alias("h22"),
        )
        agg = t.groupBy("event_type", acol, bcol).agg(
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
            (F.col(acol) + (h22 * g1 - h12 * g2) / det).alias(
                f"a{tag}"
            ),
            (F.col(bcol) + (h11 * g2 - h12 * g1) / det).alias(
                f"b{tag}"
            ),
        )

    j0 = cells.join(
        F.broadcast(
            mom.select("event_type", "mv", "sdv", "a0").withColumn(
                "b0", F.lit(0.0)
            )
        ),
        "event_type",
    )
    p1 = newton(j0, "a0", "b0", "1")
    j1 = cells.join(
        F.broadcast(
            mom.select("event_type", "mv", "sdv").join(p1, "event_type")
        ),
        "event_type",
    )
    p2 = newton(j1, "a1", "b1", "2")
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


_LG_CELLS = f"""
  cells AS (
    SELECT event_type,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
           count(*) AS nv,
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
  ), momf AS (
    SELECT *, ln(CAST(y AS DOUBLE) / (n - y)) AS a0, 0.0 AS b0
    FROM mom
    WHERE y > 0 AND y < n AND sdv > 0
  )
"""


def _lg_step_sql(prev: str, acol: str, bcol: str, tag: str) -> str:
    return f"""
  t{tag} AS (
    SELECT c.event_type, p.{acol}, p.{bcol}, p.mv, p.sdv,
           CAST(floor((c.yv - c.nv
                       / (1.0 + exp(-(p.{acol} + p.{bcol}
                            * ((c.v - p.mv) / p.sdv))))) * 1e6 + {_OFF})
                AS BIGINT) AS g1,
           CAST(floor(((c.v - p.mv) / p.sdv)
                      * (c.yv - c.nv
                         / (1.0 + exp(-(p.{acol} + p.{bcol}
                              * ((c.v - p.mv) / p.sdv))))) * 1e6 + {_OFF})
                AS BIGINT) AS g2,
           CAST(floor(c.nv
                      * (1.0 / (1.0 + exp(-(p.{acol} + p.{bcol}
                           * ((c.v - p.mv) / p.sdv)))))
                      * (1.0 - 1.0 / (1.0 + exp(-(p.{acol} + p.{bcol}
                           * ((c.v - p.mv) / p.sdv))))) * 1e6 + {_OFF})
                AS BIGINT) AS h11,
           CAST(floor(((c.v - p.mv) / p.sdv) * c.nv
                      * (1.0 / (1.0 + exp(-(p.{acol} + p.{bcol}
                           * ((c.v - p.mv) / p.sdv)))))
                      * (1.0 - 1.0 / (1.0 + exp(-(p.{acol} + p.{bcol}
                           * ((c.v - p.mv) / p.sdv))))) * 1e6 + {_OFF})
                AS BIGINT) AS h12,
           CAST(floor(((c.v - p.mv) / p.sdv) * ((c.v - p.mv) / p.sdv)
                      * c.nv
                      * (1.0 / (1.0 + exp(-(p.{acol} + p.{bcol}
                           * ((c.v - p.mv) / p.sdv)))))
                      * (1.0 - 1.0 / (1.0 + exp(-(p.{acol} + p.{bcol}
                           * ((c.v - p.mv) / p.sdv))))) * 1e6 + {_OFF})
                AS BIGINT) AS h22
    FROM cells c JOIN {prev} p ON p.event_type = c.event_type
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
  )
"""


SQL_LOGISTIC_GLM = f"""
WITH {_LG_CELLS}, {_lg_step_sql("momf", "a0", "b0", "1")},
{_lg_step_sql("p1", "a1", "b1", "2")}
SELECT p2.event_type, m.n, m.y AS n_pos,
       CAST(floor(a2 * 1000000 + {_OFF}) AS BIGINT) AS alpha_e6,
       CAST(floor(b2 * 1000000 + {_OFF}) AS BIGINT) AS beta_e6
FROM p2 JOIN momf m ON m.event_type = p2.event_type
ORDER BY p2.event_type
"""


# ---------------------------------------------------------------------------
# aitchison_clr — compositional total variance (Aitchison 1986) of
# the 24-hour diel activity composition per type.  CLR(p)_h = ln p_h
# - mean_h ln p_h, and because the mean is removed the shared ln N
# cancels — the statistic needs only ln of the raw hourly counts,
# e6-floored, so the 24-part variance is exact-integer arithmetic.
# ---------------------------------------------------------------------------


def q_aitchison_clr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hc = ev.groupBy(
        "event_type", F.hour("ts").alias("hh")
    ).agg(F.count(F.lit(1)).alias("c"))
    l6 = F.floor(
        F.log(F.col("c").cast("double")) * 1_000_000 + F.lit(_OFF)
    ).cast("long")
    t = hc.select("event_type", "hh", "c", l6.alias("l6"))
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("l6").alias("sl"),
        F.sum(F.col("l6") * F.col("l6")).alias("sll"),
        F.max_by(
            "hh", F.col("c") * 100 + (23 - F.col("hh"))
        ).alias("peak_hh"),
    )
    kd = F.col("k").cast("double")
    var = (
        F.col("sll").cast("double")
        - F.col("sl").cast("double") * F.col("sl").cast("double") / kd
    ) / kd / 1e12
    return agg.filter(F.col("k") == 24).select(
        "event_type",
        F.col("k").cast("long").alias("n_parts"),
        F.col("peak_hh").cast("long").alias("peak_hour"),
        F.floor(var * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "clr_totvar_e6"
        ),
    ).orderBy("event_type")


SQL_AITCHISON = f"""
WITH hc AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hh,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, hh, c,
         CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + {_OFF})
              AS BIGINT) AS l6
  FROM hc
), agg AS (
  SELECT event_type, count(*) AS k,
         CAST(sum(l6) AS BIGINT) AS sl,
         CAST(sum(l6 * l6) AS BIGINT) AS sll,
         arg_max(hh, c * 100 + (23 - hh)) AS peak_hh
  FROM t GROUP BY 1
)
SELECT event_type, CAST(k AS BIGINT) AS n_parts,
       CAST(peak_hh AS BIGINT) AS peak_hour,
       CAST(floor((CAST(sll AS DOUBLE)
                   - CAST(sl AS DOUBLE) * sl / k) / k / 1e12
                  * 1000000 + {_OFF}) AS BIGINT) AS clr_totvar_e6
FROM agg WHERE k = 24
ORDER BY event_type
"""


QUERIES.update(
    {
        "logistic_glm_newton": q_logistic_glm_newton,
        "aitchison_clr": q_aitchison_clr,
    }
)

ORACLE_SQL.update(
    {
        "logistic_glm_newton": SQL_LOGISTIC_GLM,
        "aitchison_clr": SQL_AITCHISON,
    }
)


# ---------------------------------------------------------------------------
# rake_keywords — RAKE (Rose et al. 2010) keyword extraction per lang:
# candidate phrases are maximal runs of non-stopword tokens; for each
# word, freq = occurrences and degree = sum of the lengths of the
# phrases containing it; score = degree/freq.  Top-5 words per lang
# by (floored e6 score, word) — exact integer ordering in both
# engines.  The phrase segmentation is a per-document prefix count of
# stop/boundary markers (doc-bounded window, parallel across docs).
# ---------------------------------------------------------------------------

_RAKE_STOP = (
    "the", "of", "and", "a", "in", "to", "is", "for", "on", "with",
    "as", "by", "at", "it", "that", "this", "are", "be", "or", "an",
    "was", "from", "we", "you", "not", "have", "has", "but", "they",
    "their",
)


def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", F.lower(F.col("text")).alias("lt")
    )
    words = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.col("lt"), "[^a-z0-9]+")).alias(
            "pos", "w"
        ),
    ).withColumn(
        "stop",
        (F.col("w") == "") | F.col("w").isin(*_RAKE_STOP),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seg = words.withColumn(
        "pid", F.sum(F.col("stop").cast("long")).over(wdoc)
    ).filter(~F.col("stop"))
    ph = seg.groupBy("doc_id", "lang", "pid").agg(
        F.count(F.lit(1)).alias("plen")
    )
    wp = seg.join(ph, ["doc_id", "lang", "pid"])
    sc = wp.groupBy("lang", "w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    ).filter(F.col("freq") >= 3)
    r6 = F.floor(
        F.col("deg").cast("double") * 1_000_000 / F.col("freq")
    ).cast("long")
    ranked = sc.select(
        "lang", "w", "freq", "deg", r6.alias("score_e6")
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.col("score_e6").desc(), F.col("w").asc()
            )
        ),
    )
    return (
        ranked.filter(F.col("rk") <= 5)
        .select(
            "lang",
            F.col("rk").cast("long").alias("rk"),
            "w",
            F.col("freq").cast("long").alias("freq"),
            F.col("deg").cast("long").alias("deg"),
            "score_e6",
        )
        .orderBy("lang", "rk")
    )


_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOP)
SQL_RAKE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         string_split_regex(lower(text), '[^a-z0-9]+') AS l
  FROM documents
), words AS (
  SELECT doc_id, lang, u.i AS pos, l[u.i] AS w,
         CASE WHEN l[u.i] = ''
                   OR l[u.i] IN ({_RAKE_STOP_SQL})
              THEN 1 ELSE 0 END AS stop
  FROM toks, unnest(generate_series(1, len(l))) AS u(i)
), seg AS (
  SELECT doc_id, lang, w,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS pid,
         stop
  FROM words
), nw AS (
  SELECT doc_id, lang, w, pid FROM seg WHERE stop = 0
), ph AS (
  SELECT doc_id, lang, pid, count(*) AS plen
  FROM nw GROUP BY 1, 2, 3
), wp AS (
  SELECT nw.lang, nw.w, ph.plen
  FROM nw JOIN ph ON ph.doc_id = nw.doc_id AND ph.pid = nw.pid
), sc AS (
  SELECT lang, w, count(*) AS freq,
         CAST(sum(plen) AS BIGINT) AS deg
  FROM wp GROUP BY 1, 2
  HAVING count(*) >= 3
), ranked AS (
  SELECT lang, w, freq, deg,
         CAST(floor(CAST(deg AS DOUBLE) * 1000000 / freq) AS BIGINT)
           AS score_e6,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY CAST(floor(CAST(deg AS DOUBLE) * 1000000 / freq)
                         AS BIGINT) DESC, w ASC) AS rk
  FROM sc
)
SELECT lang, CAST(rk AS BIGINT) AS rk, w,
       CAST(freq AS BIGINT) AS freq, deg, score_e6
FROM ranked WHERE rk <= 5
ORDER BY lang, rk
"""


# ---------------------------------------------------------------------------
# whittle_second_peak — Whittle's (1952) sequential extension of
# Fisher's g: after removing the largest periodogram ordinate, test
# the SECOND peak with g2 = I_(2) / (sum I - I_(1)) and
# log p2 = ln(m - 1) + (m - 2) ln(1 - g2) — is there a second hidden
# periodicity beyond the diel peak?  Same exact-lattice DFT scaffold
# as fisher_g_test (e3-floored ordinates, bounded by the calendar).
# ---------------------------------------------------------------------------


def q_whittle_second_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / 3_600_000_000
            )
        )
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
        "event_type",
        "t",
        "c",
        "n",
        F.explode(F.sequence(F.lit(1), m)).alias("j"),
    )
    k = (F.col("j") * F.col("t")) % F.col("n")
    ang = (
        F.lit(2.0)
        * F.lit(math.pi)
        * k.cast("double")
        / F.col("n").cast("double")
    )
    trig = fan.select(
        "event_type",
        "j",
        "n",
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
    )
    wmax = Window.partitionBy("event_type").orderBy(
        F.col("i3").desc(), F.col("j").asc()
    )
    agg = (
        ords.withColumn("rk", F.row_number().over(wmax))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).alias("m"),
            F.sum("i3").alias("si3"),
            F.max(F.when(F.col("rk") == 1, F.col("i3"))).alias("i1"),
            F.max(F.when(F.col("rk") == 2, F.col("i3"))).alias("i2"),
            F.max(F.when(F.col("rk") == 2, F.col("j"))).alias(
                "second_j"
            ),
        )
    )
    g2 = F.col("i2").cast("double") / (
        F.col("si3") - F.col("i1")
    ).cast("double")
    md = F.col("m").cast("double")
    logp = F.log(md - 1.0) + (md - 2.0) * F.log(1.0 - g2)
    return (
        agg.filter(
            (F.col("si3") > F.col("i1"))
            & (F.col("i2") < (F.col("si3") - F.col("i1")))
            & (F.col("m") > 2)
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_hours"),
            F.col("m").cast("long").alias("m_ords"),
            F.col("second_j").cast("long").alias("second_j"),
            F.floor(
                F.col("n").cast("double")
                / F.col("second_j").cast("double")
                * 100
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("second_period_h_e2"),
            F.floor(g2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "g2_e6"
            ),
            F.floor(logp * 10_000 + F.lit(_OFF)).cast("long").alias(
                "logp2_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_WHITTLE = f"""
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
  SELECT event_type, j, max(n) AS n,
         CAST(floor((sum(ca) * sum(ca) + sum(sa) * sum(sa))
                    / max(n) * 1000 + {_OFF}) AS BIGINT) AS i3
  FROM trig GROUP BY 1, 2
), ranked AS (
  SELECT event_type, j, n, i3,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY i3 DESC, j ASC) AS rk
  FROM ords
), agg AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS m,
         CAST(sum(i3) AS BIGINT) AS si3,
         CAST(max(CASE WHEN rk = 1 THEN i3 END) AS BIGINT) AS i1,
         CAST(max(CASE WHEN rk = 2 THEN i3 END) AS BIGINT) AS i2,
         CAST(max(CASE WHEN rk = 2 THEN j END) AS BIGINT) AS second_j
  FROM ranked GROUP BY 1
)
SELECT event_type, n AS n_hours, m AS m_ords, second_j,
       CAST(floor(CAST(n AS DOUBLE) / second_j * 100 + {_OFF})
            AS BIGINT) AS second_period_h_e2,
       CAST(floor(CAST(i2 AS DOUBLE) / (si3 - i1) * 1000000 + {_OFF})
            AS BIGINT) AS g2_e6,
       CAST(floor((ln(CAST(m AS DOUBLE) - 1.0)
                   + (CAST(m AS DOUBLE) - 2.0)
                     * ln(1.0 - CAST(i2 AS DOUBLE) / (si3 - i1)))
                  * 10000 + {_OFF}) AS BIGINT) AS logp2_e4
FROM agg
WHERE si3 > i1 AND i2 < si3 - i1 AND m > 2
ORDER BY event_type
"""


QUERIES.update(
    {
        "rake_keywords": q_rake_keywords,
        "whittle_second_peak": q_whittle_second_peak,
    }
)

ORACLE_SQL.update(
    {
        "rake_keywords": SQL_RAKE,
        "whittle_second_peak": SQL_WHITTLE,
    }
)


# ===========================================================================
# Battery R: fixed-point estimation + shrinkage + model selection +
# instrumental variables — a two-step EM Gaussian mixture on the
# collapsed value domain, the James-Stein shrinkage of hourly means,
# AIC selection of the daily-trend polynomial degree, and the Wald IV
# estimator with a delta-method SE.
# ===========================================================================


# ---------------------------------------------------------------------------
# gmm2_em — 2-component Gaussian mixture per type fitted by exactly
# TWO EM steps (Dempster, Laird & Rubin 1977) from the deterministic
# quantile init (mu = q25/q75, unit sigmas on standardized values,
# pi = 0.5).  E-step responsibilities are e9-floored per distinct
# value; M-step moment terms e6-floored — so both engines walk the
# identical fixed-point path with exact-integer aggregation.  Reports
# Ashman's D separation.  No driver loop: the two steps are unrolled.
# ---------------------------------------------------------------------------


def _gmm_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    return ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("nv")
    )


def q_gmm2_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _gmm_cells(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    wc = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c2 = (
        cells.withColumn("cum", F.sum("nv").over(wc))
        .withColumn("n", F.sum("nv").over(wt))
        .withColumn("sv", F.sum(F.col("nv") * F.col("v")).over(wt))
        .withColumn(
            "svv", F.sum(F.col("nv") * F.col("v") * F.col("v")).over(wt)
        )
    )
    init = c2.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("sv").alias("svt"),
        F.max("svv").alias("svvt"),
        F.min(F.when(4 * F.col("cum") >= F.col("n"), F.col("v"))).alias(
            "q25"
        ),
        F.min(
            F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("v"))
        ).alias("q75"),
    )
    nd = F.col("n").cast("double")
    mv = F.col("svt").cast("double") / nd
    sdv = F.sqrt(
        (F.col("svvt").cast("double") - nd * mv * mv) / nd
    )
    init = init.select(
        "event_type",
        "n",
        mv.alias("mv"),
        sdv.alias("sdv"),
        ((F.col("q25").cast("double") - mv) / sdv).alias("mu1"),
        ((F.col("q75").cast("double") - mv) / sdv).alias("mu2"),
        F.lit(1.0).alias("s1"),
        F.lit(1.0).alias("s2"),
        F.lit(0.5).alias("pi"),
    ).filter(sdv > 0)

    def em_step(params: DataFrame) -> DataFrame:
        j = cells.join(F.broadcast(params), "event_type")
        x = (F.col("v").cast("double") - F.col("mv")) / F.col("sdv")
        d1 = (x - F.col("mu1")) / F.col("s1")
        d2 = (x - F.col("mu2")) / F.col("s2")
        a1 = F.col("pi") / F.col("s1") * F.exp(-d1 * d1 / 2.0)
        a2 = (1.0 - F.col("pi")) / F.col("s2") * F.exp(-d2 * d2 / 2.0)
        r = a1 / (a1 + a2)
        nvd = F.col("nv").cast("double")
        t = j.select(
            "event_type",
            "n",
            "mv",
            "sdv",
            F.floor(nvd * r * 1e6 + F.lit(_OFF)).cast("long").alias(
                "w1"
            ),
            F.floor(nvd * r * x * 1e6 + F.lit(_OFF)).cast("long").alias(
                "x1"
            ),
            F.floor(nvd * r * x * x * 1e6 + F.lit(_OFF))
            .cast("long")
            .alias("xx1"),
            F.floor(nvd * (1.0 - r) * 1e6 + F.lit(_OFF))
            .cast("long")
            .alias("w2"),
            F.floor(nvd * (1.0 - r) * x * 1e6 + F.lit(_OFF))
            .cast("long")
            .alias("x2"),
            F.floor(nvd * (1.0 - r) * x * x * 1e6 + F.lit(_OFF))
            .cast("long")
            .alias("xx2"),
        )
        agg = t.groupBy("event_type", "n", "mv", "sdv").agg(
            F.sum("w1").alias("sw1"),
            F.sum("x1").alias("sx1"),
            F.sum("xx1").alias("sxx1"),
            F.sum("w2").alias("sw2"),
            F.sum("x2").alias("sx2"),
            F.sum("xx2").alias("sxx2"),
        )
        w1 = F.col("sw1").cast("double")
        w2 = F.col("sw2").cast("double")
        m1 = F.col("sx1").cast("double") / w1
        m2 = F.col("sx2").cast("double") / w2
        v1 = F.col("sxx1").cast("double") / w1 - m1 * m1
        v2 = F.col("sxx2").cast("double") / w2 - m2 * m2
        return agg.filter(
            (F.col("sw1") > 0) & (F.col("sw2") > 0) & (v1 > 0) & (v2 > 0)
        ).select(
            "event_type",
            "n",
            "mv",
            "sdv",
            m1.alias("mu1"),
            m2.alias("mu2"),
            F.sqrt(v1).alias("s1"),
            F.sqrt(v2).alias("s2"),
            (w1 / (w1 + w2)).alias("pi"),
        )

    p2 = em_step(em_step(init))
    sep = F.abs(F.col("mu2") - F.col("mu1")) / F.sqrt(
        (F.col("s1") * F.col("s1") + F.col("s2") * F.col("s2")) / 2.0
    )
    return p2.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("pi") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("pi_e6"),
        F.floor(
            (F.col("mv") + F.col("sdv") * F.col("mu1")) * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mu1_e4"),
        F.floor(
            (F.col("mv") + F.col("sdv") * F.col("mu2")) * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mu2_e4"),
        F.floor(F.col("sdv") * F.col("s1") * 100 + F.lit(_OFF))
        .cast("long")
        .alias("sd1_e4"),
        F.floor(F.col("sdv") * F.col("s2") * 100 + F.lit(_OFF))
        .cast("long")
        .alias("sd2_e4"),
        F.floor(sep * 10_000 + F.lit(_OFF)).cast("long").alias(
            "ashman_d_e4"
        ),
    ).orderBy("event_type")


def _gmm_estep_sql(prev: str, tag: str) -> str:
    x = "((c.v - p.mv) / p.sdv)"
    d1 = f"(({x} - p.mu1) / p.s1)"
    d2 = f"(({x} - p.mu2) / p.s2)"
    a1 = f"(p.pi / p.s1 * exp(-{d1} * {d1} / 2.0))"
    a2 = f"((1.0 - p.pi) / p.s2 * exp(-{d2} * {d2} / 2.0))"
    r = f"({a1} / ({a1} + {a2}))"
    return f"""
  t{tag} AS (
    SELECT c.event_type, p.n, p.mv, p.sdv,
           CAST(floor(c.nv * {r} * 1e6 + {_OFF}) AS BIGINT) AS w1,
           CAST(floor(c.nv * {r} * {x} * 1e6 + {_OFF}) AS BIGINT) AS x1,
           CAST(floor(c.nv * {r} * {x} * {x} * 1e6 + {_OFF})
                AS BIGINT) AS xx1,
           CAST(floor(c.nv * (1.0 - {r}) * 1e6 + {_OFF}) AS BIGINT)
             AS w2,
           CAST(floor(c.nv * (1.0 - {r}) * {x} * 1e6 + {_OFF})
                AS BIGINT) AS x2,
           CAST(floor(c.nv * (1.0 - {r}) * {x} * {x} * 1e6 + {_OFF})
                AS BIGINT) AS xx2
    FROM cells c JOIN {prev} p ON p.event_type = c.event_type
  ), s{tag} AS (
    SELECT event_type, n, mv, sdv,
           CAST(sum(w1) AS BIGINT) AS sw1,
           CAST(sum(x1) AS BIGINT) AS sx1,
           CAST(sum(xx1) AS BIGINT) AS sxx1,
           CAST(sum(w2) AS BIGINT) AS sw2,
           CAST(sum(x2) AS BIGINT) AS sx2,
           CAST(sum(xx2) AS BIGINT) AS sxx2
    FROM t{tag} GROUP BY 1, 2, 3, 4
  ), p{tag} AS (
    SELECT event_type, n, mv, sdv,
           CAST(sx1 AS DOUBLE) / sw1 AS mu1,
           CAST(sx2 AS DOUBLE) / sw2 AS mu2,
           sqrt(CAST(sxx1 AS DOUBLE) / sw1
                - (CAST(sx1 AS DOUBLE) / sw1)
                  * (CAST(sx1 AS DOUBLE) / sw1)) AS s1,
           sqrt(CAST(sxx2 AS DOUBLE) / sw2
                - (CAST(sx2 AS DOUBLE) / sw2)
                  * (CAST(sx2 AS DOUBLE) / sw2)) AS s2,
           CAST(sw1 AS DOUBLE) / (sw1 + sw2) AS pi
    FROM s{tag}
    WHERE sw1 > 0 AND sw2 > 0
      AND CAST(sxx1 AS DOUBLE) / sw1
          - (CAST(sx1 AS DOUBLE) / sw1) * (CAST(sx1 AS DOUBLE) / sw1)
          > 0
      AND CAST(sxx2 AS DOUBLE) / sw2
          - (CAST(sx2 AS DOUBLE) / sw2) * (CAST(sx2 AS DOUBLE) / sw2)
          > 0
  )
"""


SQL_GMM2 = f"""
WITH cells AS (
  SELECT event_type, CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         count(*) AS nv
  FROM events GROUP BY 1, 2
), c2 AS (
  SELECT event_type, v, nv,
         sum(nv) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum,
         sum(nv) OVER (PARTITION BY event_type) AS n,
         sum(nv * v) OVER (PARTITION BY event_type) AS sv,
         sum(nv * v * v) OVER (PARTITION BY event_type) AS svv
  FROM cells
), initm AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n,
         CAST(max(sv) AS BIGINT) AS svt,
         CAST(max(svv) AS BIGINT) AS svvt,
         CAST(min(CASE WHEN 4 * cum >= n THEN v END) AS BIGINT) AS q25,
         CAST(min(CASE WHEN 4 * cum >= 3 * n THEN v END) AS BIGINT)
           AS q75
  FROM c2 GROUP BY 1
), init AS (
  SELECT event_type, n,
         CAST(svt AS DOUBLE) / n AS mv,
         sqrt((CAST(svvt AS DOUBLE)
               - n * (CAST(svt AS DOUBLE) / n)
                   * (CAST(svt AS DOUBLE) / n)) / n) AS sdv,
         (q25 - CAST(svt AS DOUBLE) / n)
           / sqrt((CAST(svvt AS DOUBLE)
                   - n * (CAST(svt AS DOUBLE) / n)
                       * (CAST(svt AS DOUBLE) / n)) / n) AS mu1,
         (q75 - CAST(svt AS DOUBLE) / n)
           / sqrt((CAST(svvt AS DOUBLE)
                   - n * (CAST(svt AS DOUBLE) / n)
                       * (CAST(svt AS DOUBLE) / n)) / n) AS mu2,
         1.0 AS s1, 1.0 AS s2, 0.5 AS pi
  FROM initm
  WHERE (CAST(svvt AS DOUBLE)
         - n * (CAST(svt AS DOUBLE) / n) * (CAST(svt AS DOUBLE) / n))
        / n > 0
), {_gmm_estep_sql("init", "1")}, {_gmm_estep_sql("p1", "2")}
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(pi * 1000000 + {_OFF}) AS BIGINT) AS pi_e6,
       CAST(floor((mv + sdv * mu1) * 100 + {_OFF}) AS BIGINT)
         AS mu1_e4,
       CAST(floor((mv + sdv * mu2) * 100 + {_OFF}) AS BIGINT)
         AS mu2_e4,
       CAST(floor(sdv * s1 * 100 + {_OFF}) AS BIGINT) AS sd1_e4,
       CAST(floor(sdv * s2 * 100 + {_OFF}) AS BIGINT) AS sd2_e4,
       CAST(floor(abs(mu2 - mu1) / sqrt((s1 * s1 + s2 * s2) / 2.0)
                  * 10000 + {_OFF}) AS BIGINT) AS ashman_d_e4
FROM p2
ORDER BY event_type
"""


QUERIES.update({"gmm2_em": q_gmm2_em})
ORACLE_SQL.update({"gmm2_em": SQL_GMM2})


# ---------------------------------------------------------------------------
# james_stein_hours — positive-part James-Stein (Stein 1961; Efron &
# Morris 1975) shrinkage of the 24 hourly mean values toward the
# unweighted grand hour mean: shrink = max(0, 1 - (K-3) sigma2bar/S)
# with sigma2bar the mean squared SE of the hour means and S the sum
# of squared deviations.  Per-hour terms e4-floored; the Gaussian
# sibling of eb_shrinkage/gamma_poisson_eb.
# ---------------------------------------------------------------------------


def q_james_stein_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    hc = ev.groupBy("event_type", "hh").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("v").alias("sh"),
        F.sum(F.col("v") * F.col("v")).alias("qh"),
    ).filter(F.col("nh") > 1)
    nh = F.col("nh").cast("double")
    xh = F.col("sh").cast("double") / nh
    varh = (
        F.col("qh").cast("double")
        - F.col("sh").cast("double") * F.col("sh").cast("double") / nh
    ) / (nh - 1.0)
    wt = Window.partitionBy("event_type")
    t = hc.select(
        "event_type",
        "hh",
        xh.alias("xh"),
        F.floor(varh / nh * 1e4 + F.lit(_OFF)).cast("long").alias("v4"),
        F.floor(xh * 1e4 + F.lit(_OFF)).cast("long").alias("m4"),
    ).withColumn("k", F.count(F.lit(1)).over(wt)).withColumn(
        "sm4", F.sum("m4").over(wt)
    )
    # grand mean of hour means from the e4-floored hour means (exact)
    xbar = F.col("sm4").cast("double") / F.col("k").cast("double") / 1e4
    t = t.withColumn(
        "d4",
        F.floor(
            (F.col("xh") - xbar) * (F.col("xh") - xbar) * 1e4
            + F.lit(_OFF)
        ).cast("long"),
    )
    agg = t.groupBy("event_type").agg(
        F.max("k").alias("k"),
        F.max("sm4").alias("sm4"),
        F.sum("d4").alias("sd4"),
        F.sum("v4").alias("sv4"),
        F.max_by(
            "m4", F.col("m4") * 100 + (23 - F.col("hh"))
        ).alias("peak_m4"),
    ).filter((F.col("k") == 24) & (F.col("sd4") > 0))
    s = F.col("sd4").cast("double") / 1e4
    s2bar = F.col("sv4").cast("double") / 24.0 / 1e4
    shrink = F.greatest(F.lit(0.0), 1.0 - 21.0 * s2bar / s)
    xb = F.col("sm4").cast("double") / 24.0 / 1e4
    peak = F.col("peak_m4").cast("double") / 1e4
    return agg.select(
        "event_type",
        F.col("k").cast("long").alias("k_hours"),
        F.floor(shrink * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "shrink_e6"
        ),
        F.floor(peak * 100 + F.lit(_OFF)).cast("long").alias(
            "peak_raw_e4"
        ),
        F.floor((xb + shrink * (peak - xb)) * 100 + F.lit(_OFF))
        .cast("long")
        .alias("peak_js_e4"),
    ).orderBy("event_type")


SQL_JAMES_STEIN = f"""
WITH hc AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hh,
         count(*) AS nh,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS sh,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS qh
  FROM events GROUP BY 1, 2
  HAVING count(*) > 1
), t0 AS (
  SELECT event_type, hh,
         CAST(sh AS DOUBLE) / nh AS xh,
         CAST(floor((CAST(qh AS DOUBLE)
                     - CAST(sh AS DOUBLE) * sh / nh) / (nh - 1.0)
                    / nh * 1e4 + {_OFF}) AS BIGINT) AS v4,
         CAST(floor(CAST(sh AS DOUBLE) / nh * 1e4 + {_OFF})
              AS BIGINT) AS m4
  FROM hc
), t1 AS (
  SELECT event_type, hh, xh, v4, m4,
         count(*) OVER (PARTITION BY event_type) AS k,
         CAST(sum(m4) OVER (PARTITION BY event_type) AS BIGINT) AS sm4
  FROM t0
), t2 AS (
  SELECT event_type, v4, m4, k, sm4,
         CAST(floor((xh - CAST(sm4 AS DOUBLE) / k / 1e4)
                    * (xh - CAST(sm4 AS DOUBLE) / k / 1e4) * 1e4
                    + {_OFF}) AS BIGINT) AS d4,
         hh
  FROM t1
), agg AS (
  SELECT event_type, CAST(max(k) AS BIGINT) AS k,
         CAST(max(sm4) AS BIGINT) AS sm4,
         CAST(sum(d4) AS BIGINT) AS sd4,
         CAST(sum(v4) AS BIGINT) AS sv4,
         arg_max(m4, m4 * 100 + (23 - hh)) AS peak_m4
  FROM t2 GROUP BY 1
  HAVING max(k) = 24 AND sum(d4) > 0
)
SELECT event_type, k AS k_hours,
       CAST(floor(greatest(0.0,
                  1.0 - 21.0 * (CAST(sv4 AS DOUBLE) / 24.0 / 1e4)
                        / (CAST(sd4 AS DOUBLE) / 1e4)) * 1000000
                  + {_OFF}) AS BIGINT) AS shrink_e6,
       CAST(floor(CAST(peak_m4 AS DOUBLE) / 1e4 * 100 + {_OFF})
            AS BIGINT) AS peak_raw_e4,
       CAST(floor((CAST(sm4 AS DOUBLE) / 24.0 / 1e4
                   + greatest(0.0,
                     1.0 - 21.0 * (CAST(sv4 AS DOUBLE) / 24.0 / 1e4)
                           / (CAST(sd4 AS DOUBLE) / 1e4))
                     * (CAST(peak_m4 AS DOUBLE) / 1e4
                        - CAST(sm4 AS DOUBLE) / 24.0 / 1e4)) * 100
                  + {_OFF}) AS BIGINT) AS peak_js_e4
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# aic_trend_degree — polynomial trend-degree selection (0/1/2) on the
# per-type daily mean series by AIC = n ln(RSS/n) + 2(k+1) (Akaike
# 1974).  Daily means e4-floored to integers; RSS0/1/2 come from the
# closed-form nested OLS decomposition (2x2 normal equations for the
# quadratic), so no iterative fitting anywhere.
# ---------------------------------------------------------------------------


def q_aic_trend_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("sd"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    t = daily.withColumn("t", F.row_number().over(wo) - 1).select(
        "event_type",
        "t",
        F.floor(
            F.col("sd").cast("double") / F.col("nd") * 100 + F.lit(_OFF)
        )
        .cast("long")
        .alias("y4"),
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y4").alias("sy"),
        F.sum(F.col("y4") * F.col("y4")).alias("syy"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("t") * F.col("t")).alias("st3"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") * F.col("t")
        ).alias("st4"),
        F.sum(F.col("t") * F.col("y4")).alias("sty"),
        F.sum(F.col("t") * F.col("t") * F.col("y4")).alias("stty"),
    )
    n = F.col("n").cast("double")
    sy = F.col("sy").cast("double")
    st = F.col("st").cast("double")
    stt = F.col("stt").cast("double")
    st3 = F.col("st3").cast("double")
    st4 = F.col("st4").cast("double")
    sty = F.col("sty").cast("double")
    stty = F.col("stty").cast("double")
    syy = F.col("syy").cast("double")
    rss0 = syy - sy * sy / n
    suu = stt - st * st / n
    suy = sty - st * sy / n
    rss1 = rss0 - suy * suy / suu
    # centered quadratic regressor w = t^2 - mean(t^2)
    suw = st3 - st * stt / n
    sww = st4 - stt * stt / n
    swy = stty - stt * sy / n
    det = suu * sww - suw * suw
    b1 = (sww * suy - suw * swy) / det
    b2 = (suu * swy - suw * suy) / det
    rss2 = rss0 - (b1 * suy + b2 * swy)
    aic0 = n * F.log(rss0 / n) + 2.0
    aic1 = n * F.log(rss1 / n) + 4.0
    aic2 = n * F.log(rss2 / n) + 6.0
    best = (
        F.when((aic0 <= aic1) & (aic0 <= aic2), F.lit(0))
        .when(aic1 <= aic2, F.lit(1))
        .otherwise(F.lit(2))
    )
    return agg.filter(
        (F.col("n") > 5) & (rss0 > 0) & (rss1 > 0) & (rss2 > 0)
        & (det > 0)
    ).select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(aic0 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "aic0_e4"
        ),
        F.floor(aic1 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "aic1_e4"
        ),
        F.floor(aic2 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "aic2_e4"
        ),
        best.cast("long").alias("best_degree"),
    ).orderBy("event_type")


SQL_AIC_TREND = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS nd,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS sd
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
           AS t,
         CAST(floor(CAST(sd AS DOUBLE) / nd * 100 + {_OFF}) AS BIGINT)
           AS y4
  FROM daily
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(y4) AS BIGINT) AS sy,
         CAST(sum(y4 * y4) AS BIGINT) AS syy,
         CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(t * t) AS BIGINT) AS stt,
         CAST(sum(t * t * t) AS BIGINT) AS st3,
         CAST(sum(t * t * t * t) AS BIGINT) AS st4,
         CAST(sum(t * y4) AS BIGINT) AS sty,
         CAST(sum(t * t * y4) AS BIGINT) AS stty
  FROM t GROUP BY 1
), m AS (
  SELECT event_type, n,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS rss0,
         CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n AS suu,
         CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy / n AS suy,
         CAST(st3 AS DOUBLE) - CAST(st AS DOUBLE) * stt / n AS suw,
         CAST(st4 AS DOUBLE) - CAST(stt AS DOUBLE) * stt / n AS sww,
         CAST(stty AS DOUBLE) - CAST(stt AS DOUBLE) * sy / n AS swy
  FROM agg
), f AS (
  SELECT event_type, n, rss0,
         rss0 - suy * suy / suu AS rss1,
         rss0 - ((sww * suy - suw * swy) / (suu * sww - suw * suw)
                   * suy
                 + (suu * swy - suw * suy) / (suu * sww - suw * suw)
                   * swy) AS rss2,
         suu * sww - suw * suw AS det
  FROM m
), a AS (
  SELECT event_type, n,
         n * ln(rss0 / n) + 2.0 AS aic0,
         n * ln(rss1 / n) + 4.0 AS aic1,
         n * ln(rss2 / n) + 6.0 AS aic2
  FROM f
  WHERE n > 5 AND rss0 > 0 AND rss1 > 0 AND rss2 > 0 AND det > 0
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(aic0 * 10000 + {_OFF}) AS BIGINT) AS aic0_e4,
       CAST(floor(aic1 * 10000 + {_OFF}) AS BIGINT) AS aic1_e4,
       CAST(floor(aic2 * 10000 + {_OFF}) AS BIGINT) AS aic2_e4,
       CAST(CASE WHEN aic0 <= aic1 AND aic0 <= aic2 THEN 0
                 WHEN aic1 <= aic2 THEN 1 ELSE 2 END AS BIGINT)
         AS best_degree
FROM a
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# wald_iv_estimate — the Wald (1940) instrumental-variable estimator:
# instrument z = day/night first-event cohort, treatment d = heavy
# user (per-user event count >= global lower-median count), outcome
# y = per-user mean centi-value.  beta_IV = (ybar1 - ybar0) /
# (dbar1 - dbar0), delta-method SE including the within-group y-d
# covariance.  Per-user y e4-floored; all group moments exact BIGINT.
# ---------------------------------------------------------------------------


def q_wald_iv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sec = F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
    per = ev.groupBy("user_id").agg(
        F.min(F.floor(sec).cast("long")).alias("first_s"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("sv"),
    ).select(
        F.when(
            ((F.col("first_s") % 86_400) / 3_600)
            .cast("long")
            .between(8, 19),
            1,
        )
        .otherwise(0)
        .alias("z"),
        "cnt",
        F.floor(
            F.col("sv").cast("double") / F.col("cnt") * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y4"),
    )
    cdom = per.groupBy("cnt").agg(F.count(F.lit(1)).alias("nc"))
    wcd = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    med = (
        cdom.withColumn("cum", F.sum("nc").over(wcd))
        .withColumn("n", F.sum("nc").over(Window.partitionBy()))
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("cnt").alias("medc"))
    )
    per2 = per.crossJoin(F.broadcast(med)).withColumn(
        "d", (F.col("cnt") >= F.col("medc")).cast("long")
    )
    g = per2.groupBy("z").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("y4").alias("sy"),
        F.sum(F.col("y4") * F.col("y4")).alias("syy"),
        F.sum("d").alias("sd_"),
        F.sum(F.col("d") * F.col("y4")).alias("sdy"),
    )
    ngd = F.col("ng").cast("double")
    ybar = F.col("sy").cast("double") / ngd
    dbar = F.col("sd_").cast("double") / ngd
    vary = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double") / ngd
    ) / (ngd - 1.0)
    vard = dbar * (1.0 - dbar) * ngd / (ngd - 1.0)
    covyd = (
        F.col("sdy").cast("double")
        - F.col("sd_").cast("double") * F.col("sy").cast("double") / ngd
    ) / (ngd - 1.0)
    g2 = g.select(
        "z",
        "ng",
        ybar.alias("ybar"),
        dbar.alias("dbar"),
        (vary / ngd).alias("vy"),
        (vard / ngd).alias("vd"),
        (covyd / ngd).alias("cyd"),
    )
    a = g2.filter(F.col("z") == 1).select(
        F.col("ng").alias("n1"),
        F.col("ybar").alias("y1"),
        F.col("dbar").alias("d1"),
        F.col("vy").alias("vy1"),
        F.col("vd").alias("vd1"),
        F.col("cyd").alias("c1"),
    )
    b = g2.filter(F.col("z") == 0).select(
        F.col("ng").alias("n0"),
        F.col("ybar").alias("y0"),
        F.col("dbar").alias("d0"),
        F.col("vy").alias("vy0"),
        F.col("vd").alias("vd0"),
        F.col("cyd").alias("c0"),
    )
    j = a.crossJoin(b)
    num = F.col("y1") - F.col("y0")
    den = F.col("d1") - F.col("d0")
    w = num / den
    se2 = (
        F.col("vy1")
        + F.col("vy0")
        + w * w * (F.col("vd1") + F.col("vd0"))
        - 2.0 * w * (F.col("c1") + F.col("c0"))
    ) / (den * den)
    return j.filter(den != 0).select(
        F.col("n1").cast("long").alias("n_day"),
        F.col("n0").cast("long").alias("n_night"),
        F.floor(den * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "first_stage_e6"
        ),
        F.floor(w + F.lit(_OFF)).cast("long").alias("wald_iv_e4"),
        F.floor(F.sqrt(se2) + F.lit(_OFF)).cast("long").alias(
            "se_e4"
        ),
        F.floor(w / F.sqrt(se2) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("z_e4"),
    )


SQL_WALD_IV = f"""
WITH per AS (
  SELECT CASE WHEN CAST(floor((CAST(min(floor(epoch(ts))) AS BIGINT)
                               % 86400) / 3600) AS BIGINT)
                   BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS z,
         count(*) AS cnt,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) * 100 + {_OFF}) AS BIGINT) AS y4
  FROM events GROUP BY user_id
), cdom AS (
  SELECT cnt, count(*) AS nc FROM per GROUP BY 1
), medt AS (
  SELECT CAST(min(cnt) AS BIGINT) AS medc
  FROM (
    SELECT cnt,
           sum(nc) OVER (ORDER BY cnt ROWS UNBOUNDED PRECEDING) AS cum,
           sum(nc) OVER () AS n
    FROM cdom
  ) WHERE 2 * cum >= n
), per2 AS (
  SELECT z, y4,
         CASE WHEN cnt >= medc THEN 1 ELSE 0 END AS d
  FROM per CROSS JOIN medt
), g AS (
  SELECT z, count(*) AS ng,
         CAST(sum(y4) AS BIGINT) AS sy,
         CAST(sum(y4 * y4) AS BIGINT) AS syy,
         CAST(sum(d) AS BIGINT) AS sd_,
         CAST(sum(d * y4) AS BIGINT) AS sdy
  FROM per2 GROUP BY 1
), g2 AS (
  SELECT z, ng,
         CAST(sy AS DOUBLE) / ng AS ybar,
         CAST(sd_ AS DOUBLE) / ng AS dbar,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / ng)
           / (ng - 1.0) / ng AS vy,
         (CAST(sd_ AS DOUBLE) / ng) * (1.0 - CAST(sd_ AS DOUBLE) / ng)
           * ng / (ng - 1.0) / ng AS vd,
         (CAST(sdy AS DOUBLE) - CAST(sd_ AS DOUBLE) * sy / ng)
           / (ng - 1.0) / ng AS cyd
  FROM g
)
SELECT CAST(a.ng AS BIGINT) AS n_day,
       CAST(b.ng AS BIGINT) AS n_night,
       CAST(floor((a.dbar - b.dbar) * 1000000 + {_OFF}) AS BIGINT)
         AS first_stage_e6,
       CAST(floor((a.ybar - b.ybar) / (a.dbar - b.dbar) + {_OFF})
            AS BIGINT) AS wald_iv_e4,
       CAST(floor(sqrt((a.vy + b.vy
                        + ((a.ybar - b.ybar) / (a.dbar - b.dbar))
                          * ((a.ybar - b.ybar) / (a.dbar - b.dbar))
                          * (a.vd + b.vd)
                        - 2.0 * ((a.ybar - b.ybar) / (a.dbar - b.dbar))
                          * (a.cyd + b.cyd))
                       / ((a.dbar - b.dbar) * (a.dbar - b.dbar)))
                  + {_OFF}) AS BIGINT) AS se_e4,
       CAST(floor((a.ybar - b.ybar) / (a.dbar - b.dbar)
                  / sqrt((a.vy + b.vy
                          + ((a.ybar - b.ybar) / (a.dbar - b.dbar))
                            * ((a.ybar - b.ybar) / (a.dbar - b.dbar))
                            * (a.vd + b.vd)
                          - 2.0 * ((a.ybar - b.ybar)
                                   / (a.dbar - b.dbar))
                            * (a.cyd + b.cyd))
                         / ((a.dbar - b.dbar) * (a.dbar - b.dbar)))
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM g2 a CROSS JOIN g2 b
WHERE a.z = 1 AND b.z = 0 AND a.dbar <> b.dbar
"""


QUERIES.update(
    {
        "james_stein_hours": q_james_stein_hours,
        "aic_trend_degree": q_aic_trend_degree,
        "wald_iv_estimate": q_wald_iv_estimate,
    }
)

ORACLE_SQL.update(
    {
        "james_stein_hours": SQL_JAMES_STEIN,
        "aic_trend_degree": SQL_AIC_TREND,
        "wald_iv_estimate": SQL_WALD_IV,
    }
)


# ===========================================================================
# Battery S: kernel regression + MANOVA + extremes — Nadaraya-Watson
# and local-linear smoothers of value over the circular hour-of-week,
# the Pillai trace MANOVA for the (value, second-of-hour) pair across
# day/night, and peaks-over-threshold return levels from the MoM GPD
# on value exceedances.
# ===========================================================================


def _how_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(type, hour-of-week) cells with count and centi-value sum."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    how = (
        (F.dayofweek("ts") - 1) * 24 + F.hour("ts")
    ).cast("long")
    return ev.groupBy("event_type", how.alias("x")).agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("sc"),
    )


_SQL_HOW = f"""
  cells AS (
    SELECT event_type,
           CAST(dayofweek(ts) * 24 + EXTRACT(hour FROM ts) AS BIGINT)
             AS x,
           count(*) AS nc,
           CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                AS BIGINT) AS sc
    FROM events GROUP BY 1, 2
  ), grid AS (
    SELECT unnest(generate_series(0, 161, 7)) AS g
  )
"""


# ---------------------------------------------------------------------------
# nadaraya_watson — Gaussian-kernel regression of value on the
# CIRCULAR hour-of-week (Nadaraya 1964; Watson 1964), evaluated on a
# fixed 24-point grid with bandwidth h = 12 h and circular distance
# min(|g-x|, 168-|g-x|).  The smoother collapses to the bounded
# 168-cell domain x 24 grid points; numerator/denominator terms are
# e2/e6-floored so the weighted ratio is exact cross-engine.
# ---------------------------------------------------------------------------


def q_nadaraya_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _how_cells(spark, sf_dir)
    grid = spark.range(0, 162, 7).select(F.col("id").alias("g"))
    j = cells.crossJoin(F.broadcast(grid))
    ad = F.abs(F.col("g") - F.col("x")).cast("double")
    d = F.least(ad, 168.0 - ad)
    kw = F.exp(-d * d / (2.0 * 144.0))
    t = j.select(
        "event_type",
        "g",
        F.floor(kw * F.col("sc").cast("double") * 100 + F.lit(_OFF))
        .cast("long")
        .alias("num2"),
        F.floor(kw * F.col("nc").cast("double") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("den6"),
    )
    agg = t.groupBy("event_type", "g").agg(
        F.sum("num2").alias("sn"), F.sum("den6").alias("sd_")
    )
    m = (
        F.col("sn").cast("double")
        / 100.0
        / (F.col("sd_").cast("double") / 1e6)
    )
    return agg.filter(F.col("sd_") > 0).select(
        "event_type",
        F.col("g").cast("long").alias("g"),
        F.floor(m * 100 + F.lit(_OFF)).cast("long").alias("m_e4"),
    ).orderBy("event_type", "g")


SQL_NW = f"""
WITH {_SQL_HOW}, j AS (
  SELECT c.event_type, g.g, c.nc, c.sc,
         exp(-least(abs(g.g - c.x), 168.0 - abs(g.g - c.x))
             * least(abs(g.g - c.x), 168.0 - abs(g.g - c.x))
             / (2.0 * 144.0)) AS kw
  FROM cells c CROSS JOIN grid g
), t AS (
  SELECT event_type, g,
         CAST(floor(kw * CAST(sc AS DOUBLE) * 100 + {_OFF})
              AS BIGINT) AS num2,
         CAST(floor(kw * CAST(nc AS DOUBLE) * 1e6 + {_OFF})
              AS BIGINT) AS den6
  FROM j
), agg AS (
  SELECT event_type, g,
         CAST(sum(num2) AS BIGINT) AS sn,
         CAST(sum(den6) AS BIGINT) AS sd_
  FROM t GROUP BY 1, 2
)
SELECT event_type, CAST(g AS BIGINT) AS g,
       CAST(floor(CAST(sn AS DOUBLE) / 100.0
                  / (CAST(sd_ AS DOUBLE) / 1e6) * 100 + {_OFF})
            AS BIGINT) AS m_e4
FROM agg WHERE sd_ > 0
ORDER BY event_type, g
"""


# ---------------------------------------------------------------------------
# local_linear_smooth — degree-1 local polynomial (Fan 1992) at the
# same circular grid: solves the 2x2 weighted normal equations with
# SIGNED circular distance dx = ((x - g + 84) mod 168) - 84, which
# removes the Nadaraya-Watson boundary/design bias.  Five kernel-
# moment sums per (type, g), each floored before aggregation.
# ---------------------------------------------------------------------------


def q_local_linear_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _how_cells(spark, sf_dir)
    grid = spark.range(0, 162, 7).select(F.col("id").alias("g"))
    j = cells.crossJoin(F.broadcast(grid))
    dx = (
        ((F.col("x") - F.col("g") + 84 + 168) % 168) - 84
    ).cast("double")
    kw = F.exp(-dx * dx / (2.0 * 144.0))
    ncd = F.col("nc").cast("double")
    scd = F.col("sc").cast("double")
    t = j.select(
        "event_type",
        "g",
        F.floor(kw * ncd * 1e6 + F.lit(_OFF)).cast("long").alias("s0"),
        F.floor(kw * ncd * dx * 1e4 + F.lit(_OFF))
        .cast("long")
        .alias("s1"),
        F.floor(kw * ncd * dx * dx * 1e2 + F.lit(_OFF))
        .cast("long")
        .alias("s2"),
        F.floor(kw * scd * 100 + F.lit(_OFF)).cast("long").alias("t0"),
        F.floor(kw * scd * dx + F.lit(_OFF)).cast("long").alias("t1"),
    )
    agg = t.groupBy("event_type", "g").agg(
        F.sum("s0").alias("a0"),
        F.sum("s1").alias("a1"),
        F.sum("s2").alias("a2"),
        F.sum("t0").alias("b0"),
        F.sum("t1").alias("b1"),
    )
    s0 = F.col("a0").cast("double") / 1e6
    s1 = F.col("a1").cast("double") / 1e4
    s2 = F.col("a2").cast("double") / 1e2
    t0 = F.col("b0").cast("double") / 1e2
    t1 = F.col("b1").cast("double")
    det = s0 * s2 - s1 * s1
    m = (s2 * t0 - s1 * t1) / det
    return agg.filter(
        (F.col("a0") > 0) & (det > 0)
    ).select(
        "event_type",
        F.col("g").cast("long").alias("g"),
        F.floor(m * 100 + F.lit(_OFF)).cast("long").alias("m_e4"),
    ).orderBy("event_type", "g")


SQL_LL = f"""
WITH {_SQL_HOW}, j AS (
  SELECT c.event_type, g.g, c.nc, c.sc,
         CAST(((c.x - g.g + 84 + 168) % 168) - 84 AS DOUBLE) AS dx
  FROM cells c CROSS JOIN grid g
), t AS (
  SELECT event_type, g,
         CAST(floor(exp(-dx * dx / 288.0) * nc * 1e6 + {_OFF})
              AS BIGINT) AS s0,
         CAST(floor(exp(-dx * dx / 288.0) * nc * dx * 1e4 + {_OFF})
              AS BIGINT) AS s1,
         CAST(floor(exp(-dx * dx / 288.0) * nc * dx * dx * 1e2
                    + {_OFF}) AS BIGINT) AS s2,
         CAST(floor(exp(-dx * dx / 288.0) * sc * 100 + {_OFF})
              AS BIGINT) AS t0,
         CAST(floor(exp(-dx * dx / 288.0) * sc * dx + {_OFF})
              AS BIGINT) AS t1
  FROM j
), agg AS (
  SELECT event_type, g,
         CAST(sum(s0) AS BIGINT) AS a0,
         CAST(sum(s1) AS BIGINT) AS a1,
         CAST(sum(s2) AS BIGINT) AS a2,
         CAST(sum(t0) AS BIGINT) AS b0,
         CAST(sum(t1) AS BIGINT) AS b1
  FROM t GROUP BY 1, 2
)
SELECT event_type, CAST(g AS BIGINT) AS g,
       CAST(floor(((CAST(a2 AS DOUBLE) / 1e2) * (CAST(b0 AS DOUBLE) / 1e2)
                   - (CAST(a1 AS DOUBLE) / 1e4) * CAST(b1 AS DOUBLE))
                  / ((CAST(a0 AS DOUBLE) / 1e6)
                       * (CAST(a2 AS DOUBLE) / 1e2)
                     - (CAST(a1 AS DOUBLE) / 1e4)
                       * (CAST(a1 AS DOUBLE) / 1e4))
                  * 100 + {_OFF}) AS BIGINT) AS m_e4
FROM agg
WHERE a0 > 0
  AND (CAST(a0 AS DOUBLE) / 1e6) * (CAST(a2 AS DOUBLE) / 1e2)
      - (CAST(a1 AS DOUBLE) / 1e4) * (CAST(a1 AS DOUBLE) / 1e4) > 0
ORDER BY event_type, g
"""


QUERIES.update(
    {
        "nadaraya_watson": q_nadaraya_watson,
        "local_linear_smooth": q_local_linear_smooth,
    }
)
ORACLE_SQL.update(
    {"nadaraya_watson": SQL_NW, "local_linear_smooth": SQL_LL}
)


# ---------------------------------------------------------------------------
# pillai_manova — one-way MANOVA (2 groups: day/night; 2 responses:
# centi-value, second-of-hour) via the Pillai (1955) trace
# V = tr(H (H + E)^-1).  With 2 groups H has rank 1, so the exact
# F is (n - p - 1)/p * V/(1 - V).  All SSCP entries come from exact
# integer cross-moment sums; the 2x2 inverse is closed-form.
# ---------------------------------------------------------------------------


def q_pillai_manova(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.when(F.hour("ts").between(8, 19), 1).otherwise(0).alias("g"),
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
    tot = gm.groupBy("event_type").agg(
        F.sum("n").alias("nt"),
        F.sum("s1").alias("t1"),
        F.sum("s2").alias("t2"),
        F.sum("s11").alias("t11"),
        F.sum("s22").alias("t22"),
        F.sum("s12").alias("t12"),
        # between-group SSCP: sum_g s_i s_j / n_g (exact rationals)
        F.sum(
            F.col("s1").cast("double")
            * F.col("s1").cast("double")
            / F.col("n")
        ).alias("b11"),
        F.sum(
            F.col("s2").cast("double")
            * F.col("s2").cast("double")
            / F.col("n")
        ).alias("b22"),
        F.sum(
            F.col("s1").cast("double")
            * F.col("s2").cast("double")
            / F.col("n")
        ).alias("b12"),
    )
    nt = F.col("nt").cast("double")
    # T = total SSCP about the grand mean; H = B - correction; E = T - H
    t11 = F.col("t11").cast("double") - F.col("t1").cast(
        "double"
    ) * F.col("t1").cast("double") / nt
    t22 = F.col("t22").cast("double") - F.col("t2").cast(
        "double"
    ) * F.col("t2").cast("double") / nt
    t12 = F.col("t12").cast("double") - F.col("t1").cast(
        "double"
    ) * F.col("t2").cast("double") / nt
    h11 = F.col("b11") - F.col("t1").cast("double") * F.col("t1").cast(
        "double"
    ) / nt
    h22 = F.col("b22") - F.col("t2").cast("double") * F.col("t2").cast(
        "double"
    ) / nt
    h12 = F.col("b12") - F.col("t1").cast("double") * F.col("t2").cast(
        "double"
    ) / nt
    # V = tr(H T^-1) with T = H + E the total SSCP
    dett = t11 * t22 - t12 * t12
    v = (h11 * t22 - 2.0 * h12 * t12 + h22 * t11) / dett
    fstat = (nt - 3.0) / 2.0 * v / (1.0 - v)
    return tot.filter((dett > 0) & (F.col("nt") > 3)).select(
        "event_type",
        F.col("nt").cast("long").alias("n"),
        F.floor(v * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "pillai_e6"
        ),
        F.floor(fstat * 10_000 + F.lit(_OFF)).cast("long").alias(
            "f_e4"
        ),
    ).orderBy("event_type")


SQL_PILLAI = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS g,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS y1,
         CAST(EXTRACT(minute FROM ts) * 60 + EXTRACT(second FROM ts)
              AS BIGINT) AS y2
  FROM events
), gm AS (
  SELECT event_type, g, count(*) AS n,
         CAST(sum(y1) AS BIGINT) AS s1,
         CAST(sum(y2) AS BIGINT) AS s2,
         CAST(sum(y1 * y1) AS BIGINT) AS s11,
         CAST(sum(y2 * y2) AS BIGINT) AS s22,
         CAST(sum(y1 * y2) AS BIGINT) AS s12
  FROM ev GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         CAST(sum(n) AS BIGINT) AS nt,
         CAST(sum(s1) AS BIGINT) AS t1,
         CAST(sum(s2) AS BIGINT) AS t2,
         CAST(sum(s11) AS BIGINT) AS t11,
         CAST(sum(s22) AS BIGINT) AS t22,
         CAST(sum(s12) AS BIGINT) AS t12,
         sum(CAST(s1 AS DOUBLE) * s1 / n) AS b11,
         sum(CAST(s2 AS DOUBLE) * s2 / n) AS b22,
         sum(CAST(s1 AS DOUBLE) * s2 / n) AS b12
  FROM gm GROUP BY 1
), m AS (
  SELECT event_type, nt,
         CAST(t11 AS DOUBLE) - CAST(t1 AS DOUBLE) * t1 / nt AS tt11,
         CAST(t22 AS DOUBLE) - CAST(t2 AS DOUBLE) * t2 / nt AS tt22,
         CAST(t12 AS DOUBLE) - CAST(t1 AS DOUBLE) * t2 / nt AS tt12,
         b11 - CAST(t1 AS DOUBLE) * t1 / nt AS h11,
         b22 - CAST(t2 AS DOUBLE) * t2 / nt AS h22,
         b12 - CAST(t1 AS DOUBLE) * t2 / nt AS h12
  FROM tot
), f AS (
  SELECT event_type, nt,
         (h11 * tt22 - 2.0 * h12 * tt12 + h22 * tt11)
           / (tt11 * tt22 - tt12 * tt12) AS v
  FROM m
  WHERE tt11 * tt22 - tt12 * tt12 > 0 AND nt > 3
)
SELECT event_type, nt AS n,
       CAST(floor(v * 1000000 + {_OFF}) AS BIGINT) AS pillai_e6,
       CAST(floor((nt - 3.0) / 2.0 * v / (1.0 - v) * 10000 + {_OFF})
            AS BIGINT) AS f_e4
FROM f
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# pot_return_level — peaks-over-threshold return levels: threshold
# u = per-type lower q90 of the centi-value domain, exceedances fitted
# by the method-of-moments GPD (xi = (1 - m^2/s^2)/2, sigma =
# m (m^2/s^2 + 1)/2; Hosking & Wallis 1987), and the T-day return
# level u + sigma/xi ((lambda T)^xi - 1) at T = 100 days with lambda
# the exceedances-per-day rate.  The power is an explicit
# exp(xi ln ...) tree.  Companion of the daily-count gpd_fit.
# ---------------------------------------------------------------------------


def q_pot_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    )
    cells = ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("nv")
    )
    wc = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("event_type")
    thr = (
        cells.withColumn("cum", F.sum("nv").over(wc))
        .withColumn("n", F.sum("nv").over(wt))
        .filter(10 * F.col("cum") >= 9 * F.col("n"))
        .groupBy("event_type")
        .agg(F.min("v").alias("u"))
    )
    days = ev.groupBy("event_type").agg(
        (F.max("day") - F.min("day") + 1).alias("span_d")
    )
    exc = ev.join(F.broadcast(thr), "event_type").filter(
        F.col("v") > F.col("u")
    ).select("event_type", "u", (F.col("v") - F.col("u")).alias("y"))
    agg = exc.groupBy("event_type", "u").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).join(F.broadcast(days), "event_type")
    kd = F.col("k").cast("double")
    m = F.col("sy").cast("double") / kd
    s2 = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double") / kd
    ) / (kd - 1.0)
    ratio = m * m / s2
    xi = (1.0 - ratio) / 2.0
    sig = m * (ratio + 1.0) / 2.0
    lam = kd / F.col("span_d").cast("double")
    rl = F.col("u").cast("double") + sig / xi * (
        F.exp(xi * F.log(lam * 100.0)) - 1.0
    )
    return agg.filter(
        (F.col("k") > 5) & (s2 > 0) & (xi != 0) & (lam * 100.0 > 0)
    ).select(
        "event_type",
        F.col("k").cast("long").alias("n_exceed"),
        F.col("u").cast("long").alias("u_e2"),
        F.floor(xi * 10_000 + F.lit(_OFF)).cast("long").alias("xi_e4"),
        F.floor(sig * 100 + F.lit(_OFF)).cast("long").alias(
            "sigma_e4"
        ),
        F.floor(rl * 100 + F.lit(_OFF)).cast("long").alias(
            "rl100_e4"
        ),
    ).orderBy("event_type")


SQL_POT_RL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), cells AS (
  SELECT event_type, v, count(*) AS nv FROM ev GROUP BY 1, 2
), cum AS (
  SELECT event_type, v,
         sum(nv) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum,
         sum(nv) OVER (PARTITION BY event_type) AS n
  FROM cells
), thr AS (
  SELECT event_type, CAST(min(v) AS BIGINT) AS u
  FROM cum WHERE 10 * cum >= 9 * n GROUP BY 1
), days AS (
  SELECT event_type,
         CAST(max(day) - min(day) + 1 AS BIGINT) AS span_d
  FROM ev GROUP BY 1
), exc AS (
  SELECT e.event_type, t.u, e.v - t.u AS y
  FROM ev e JOIN thr t ON t.event_type = e.event_type
  WHERE e.v > t.u
), agg AS (
  SELECT x.event_type, x.u, count(*) AS k,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(max(d.span_d) AS BIGINT) AS span_d
  FROM exc x JOIN days d ON d.event_type = x.event_type
  GROUP BY 1, 2
), f AS (
  SELECT event_type, k, u, span_d,
         CAST(sy AS DOUBLE) / k AS m,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / k)
           / (k - 1.0) AS s2
  FROM agg WHERE k > 5
), p AS (
  SELECT event_type, k, u,
         (1.0 - m * m / s2) / 2.0 AS xi,
         m * (m * m / s2 + 1.0) / 2.0 AS sig,
         CAST(k AS DOUBLE) / span_d AS lam
  FROM f WHERE s2 > 0
)
SELECT event_type, CAST(k AS BIGINT) AS n_exceed, u AS u_e2,
       CAST(floor(xi * 10000 + {_OFF}) AS BIGINT) AS xi_e4,
       CAST(floor(sig * 100 + {_OFF}) AS BIGINT) AS sigma_e4,
       CAST(floor((u + sig / xi * (exp(xi * ln(lam * 100.0)) - 1.0))
                  * 100 + {_OFF}) AS BIGINT) AS rl100_e4
FROM p WHERE xi <> 0 AND lam * 100.0 > 0
ORDER BY event_type
"""


QUERIES.update(
    {
        "pillai_manova": q_pillai_manova,
        "pot_return_level": q_pot_return_level,
    }
)
ORACLE_SQL.update(
    {"pillai_manova": SQL_PILLAI, "pot_return_level": SQL_POT_RL}
)


# ---------------------------------------------------------------------------
# lz76_complexity — rows-only kernel: Lempel-Ziv (1976) phrase-count
# complexity of the median-binarized hourly count series per type
# (Kaspar-Schuster production counting inside a grouped Arrow kernel;
# the parse is inherently sequential, so no SQL twin — exactness is
# pinned in tests/test_lz76.py against a brute-force substring parse).
# The compression-side twin of sample_entropy.
# ---------------------------------------------------------------------------


def q_lz76_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.lzcomplexity import lz76_complexity

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            * 3600
        )
        .cast("long")
        .alias("ts_s"),
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    out = lz76_complexity(
        hourly, "event_type", "ts_s", "cnt", step_s=3600,
        key_type="string",
    )
    return out.select(
        "event_type",
        "n",
        "ones",
        "phrases",
        F.round("c_norm", 4).alias("c_norm"),
    ).orderBy("event_type")


QUERIES.update({"lz76_complexity": q_lz76_complexity})


# ===========================================================================
# Battery T: proper scoring rules + two-sample EDF + multivariate
# label association — CRPS of the climatology forecast by exact
# value-domain telescoping, the Winkler interval score with PICP
# coverage, the Kuiper two-sample statistic via exact integer EDF
# numerators, and the Schilling k-NN label-agreement statistic on the
# embeddings table.
# ===========================================================================


def _split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with (type, day, v) + per-type 70% train split day."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    sp = ev.groupBy("event_type").agg(
        (
            F.min("day")
            + F.floor(
                (F.max("day") - F.min("day") + 1).cast("double")
                * 7.0
                / 10.0
            ).cast("long")
        ).alias("sp")
    )
    return ev.join(F.broadcast(sp), "event_type").withColumn(
        "is_tr", (F.col("day") < F.col("sp")).cast("long")
    )


_SQL_SPLIT = f"""
  ev AS (
    SELECT event_type,
           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
    FROM events
  ), spt AS (
    SELECT event_type,
           CAST(min(day) + floor((max(day) - min(day) + 1) * 7.0 / 10.0)
                AS BIGINT) AS sp
    FROM ev GROUP BY 1
  ), ev2 AS (
    SELECT e.event_type, e.v,
           CASE WHEN e.day < s.sp THEN 1 ELSE 0 END AS is_tr
    FROM ev e JOIN spt s ON s.event_type = e.event_type
  )
"""


# ---------------------------------------------------------------------------
# crps_climatology — continuous ranked probability score of the
# climatology forecast (train-period empirical CDF) against the test
# period, per type: CRPS = E|X - y| - E|X - X'|/2 (Gneiting &
# Raftery 2007), both expectations EXACT via value-domain cumulative
# count/sum telescoping — no pair join, no sampling.
# ---------------------------------------------------------------------------


def q_crps_climatology(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _split_events(spark, sf_dir)
    dom = ev.groupBy("event_type", "v").agg(
        F.sum("is_tr").alias("ct"),
        F.sum(1 - F.col("is_tr")).alias("cy"),
    )
    wv = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wvx = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wt = Window.partitionBy("event_type")
    d2 = (
        dom.withColumn("cle", F.sum("ct").over(wv))
        .withColumn("sle", F.sum(F.col("ct") * F.col("v")).over(wv))
        .withColumn("clt", F.coalesce(F.sum("ct").over(wvx), F.lit(0)))
        .withColumn(
            "slt",
            F.coalesce(F.sum(F.col("ct") * F.col("v")).over(wvx), F.lit(0)),
        )
        .withColumn("ntr", F.sum("ct").over(wt))
        .withColumn("str_", F.sum(F.col("ct") * F.col("v")).over(wt))
        .withColumn("nte", F.sum("cy").over(wt))
    )
    # A(y) = sum_train |x - y|, exact
    a = (
        F.col("v") * F.col("cle")
        - F.col("sle")
        + (F.col("str_") - F.col("sle"))
        - F.col("v") * (F.col("ntr") - F.col("cle"))
    )
    # pair-distance telescoping term: sum_{i<j} |xi - xj|
    pt = F.col("ct") * (F.col("v") * F.col("clt") - F.col("slt"))
    agg = d2.groupBy("event_type", "ntr", "nte").agg(
        F.sum(F.col("cy") * a).alias("t1"),
        F.sum(pt).alias("tp"),
    )
    ntr = F.col("ntr").cast("double")
    nte = F.col("nte").cast("double")
    crps = F.col("t1").cast("double") / (nte * ntr) - F.col("tp").cast(
        "double"
    ) / (ntr * ntr)
    return agg.filter((F.col("ntr") > 0) & (F.col("nte") > 0)).select(
        "event_type",
        F.col("ntr").cast("long").alias("n_train"),
        F.col("nte").cast("long").alias("n_test"),
        F.floor(crps * 100 + F.lit(_OFF)).cast("long").alias(
            "crps_e4"
        ),
    ).orderBy("event_type")


SQL_CRPS = f"""
WITH {_SQL_SPLIT}, dom AS (
  SELECT event_type, v,
         CAST(sum(is_tr) AS BIGINT) AS ct,
         CAST(sum(1 - is_tr) AS BIGINT) AS cy
  FROM ev2 GROUP BY 1, 2
), d2 AS (
  SELECT event_type, v, ct, cy,
         sum(ct) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cle,
         sum(ct * v) OVER (PARTITION BY event_type ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS sle,
         COALESCE(sum(ct) OVER (PARTITION BY event_type ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS clt,
         COALESCE(sum(ct * v) OVER (PARTITION BY event_type ORDER BY v
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS slt,
         sum(ct) OVER (PARTITION BY event_type) AS ntr,
         sum(ct * v) OVER (PARTITION BY event_type) AS str_,
         sum(cy) OVER (PARTITION BY event_type) AS nte
  FROM dom
), agg AS (
  SELECT event_type,
         CAST(max(ntr) AS BIGINT) AS ntr,
         CAST(max(nte) AS BIGINT) AS nte,
         CAST(sum(cy * (v * cle - sle + (str_ - sle)
                        - v * (ntr - cle))) AS BIGINT) AS t1,
         CAST(sum(ct * (v * clt - slt)) AS BIGINT) AS tp
  FROM d2 GROUP BY 1
)
SELECT event_type, ntr AS n_train, nte AS n_test,
       CAST(floor((CAST(t1 AS DOUBLE) / (CAST(nte AS DOUBLE) * ntr)
                   - CAST(tp AS DOUBLE)
                     / (CAST(ntr AS DOUBLE) * ntr)) * 100 + {_OFF})
            AS BIGINT) AS crps_e4
FROM agg WHERE ntr > 0 AND nte > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# winkler_interval_score — Winkler (1972) interval score of the
# train-quantile 90% prediction interval [q05, q95] on test events:
# W = (u - l) + 20 (l - y)+ + 20 (y - u)+ per test point, mean over
# the test period, plus PICP empirical coverage.  All penalties are
# exact integers (alpha = 0.1 => 2/alpha = 20 exactly).
# ---------------------------------------------------------------------------


def q_winkler_interval_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _split_events(spark, sf_dir)
    tr = ev.filter(F.col("is_tr") == 1)
    cells = tr.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("event_type")
    cum = cells.withColumn("cum", F.sum("c").over(wv)).withColumn(
        "n", F.sum("c").over(wt)
    )
    q = cum.groupBy("event_type").agg(
        F.min(
            F.when(20 * F.col("cum") >= F.col("n"), F.col("v"))
        ).alias("l"),
        F.min(
            F.when(20 * F.col("cum") >= 19 * F.col("n"), F.col("v"))
        ).alias("u"),
    )
    te = ev.filter(F.col("is_tr") == 0).join(F.broadcast(q), "event_type")
    w = (
        (F.col("u") - F.col("l"))
        + 20 * F.greatest(F.lit(0), F.col("l") - F.col("v"))
        + 20 * F.greatest(F.lit(0), F.col("v") - F.col("u"))
    )
    hit = (
        (F.col("v") >= F.col("l")) & (F.col("v") <= F.col("u"))
    ).cast("long")
    agg = te.groupBy("event_type", "l", "u").agg(
        F.count(F.lit(1)).alias("nte"),
        F.sum(w).alias("sw"),
        F.sum(hit).alias("nh"),
    )
    nted = F.col("nte").cast("double")
    return agg.select(
        "event_type",
        F.col("nte").cast("long").alias("n_test"),
        F.col("l").cast("long").alias("l_e2"),
        F.col("u").cast("long").alias("u_e2"),
        F.floor(F.col("sw").cast("double") / nted * 100 + F.lit(_OFF))
        .cast("long")
        .alias("winkler_e4"),
        F.floor(
            F.col("nh").cast("double") / nted * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("picp_e6"),
    ).orderBy("event_type")


SQL_WINKLER = f"""
WITH {_SQL_SPLIT}, cells AS (
  SELECT event_type, v, count(*) AS c
  FROM ev2 WHERE is_tr = 1 GROUP BY 1, 2
), cum AS (
  SELECT event_type, v,
         sum(c) OVER (PARTITION BY event_type ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM cells
), q AS (
  SELECT event_type,
         CAST(min(CASE WHEN 20 * cum >= n THEN v END) AS BIGINT) AS l,
         CAST(min(CASE WHEN 20 * cum >= 19 * n THEN v END) AS BIGINT)
           AS u
  FROM cum GROUP BY 1
), te AS (
  SELECT e.event_type, q.l, q.u, e.v
  FROM ev2 e JOIN q ON q.event_type = e.event_type
  WHERE e.is_tr = 0
), agg AS (
  SELECT event_type, l, u, count(*) AS nte,
         CAST(sum((u - l) + 20 * greatest(0, l - v)
                  + 20 * greatest(0, v - u)) AS BIGINT) AS sw,
         CAST(sum(CASE WHEN v >= l AND v <= u THEN 1 ELSE 0 END)
              AS BIGINT) AS nh
  FROM te GROUP BY 1, 2, 3
)
SELECT event_type, CAST(nte AS BIGINT) AS n_test,
       l AS l_e2, u AS u_e2,
       CAST(floor(CAST(sw AS DOUBLE) / nte * 100 + {_OFF}) AS BIGINT)
         AS winkler_e4,
       CAST(floor(CAST(nh AS DOUBLE) / nte * 1000000 + {_OFF})
            AS BIGINT) AS picp_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# kuiper_two_sample — Kuiper's V = D+ + D- between the day and night
# value EDFs per type (rotation-invariant KS sibling; Kuiper 1960).
# The EDF differences are maximized on the exact integer numerator
# c1*n2 - c2*n1 over the value domain, so D+/D- are exact rationals.
# ---------------------------------------------------------------------------


def q_kuiper_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.when(F.hour("ts").between(8, 19), 1).otherwise(0).alias(
            "is_day"
        ),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cells = ev.groupBy("event_type", "v").agg(
        F.sum("is_day").alias("c1"),
        F.sum(1 - F.col("is_day")).alias("c2"),
    )
    wv = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("event_type")
    d2 = (
        cells.withColumn("f1", F.sum("c1").over(wv))
        .withColumn("f2", F.sum("c2").over(wv))
        .withColumn("n1", F.sum("c1").over(wt))
        .withColumn("n2", F.sum("c2").over(wt))
    )
    num = F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
    agg = d2.groupBy("event_type", "n1", "n2").agg(
        F.max(num).alias("mp"), F.max(-num).alias("mn")
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    dplus = F.greatest(F.col("mp").cast("double"), F.lit(0.0)) / (
        n1 * n2
    )
    dminus = F.greatest(F.col("mn").cast("double"), F.lit(0.0)) / (
        n1 * n2
    )
    v = dplus + dminus
    ne = n1 * n2 / (n1 + n2)
    stat = (F.sqrt(ne) + 0.155 + 0.24 / F.sqrt(ne)) * v
    return agg.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        "event_type",
        F.col("n1").cast("long").alias("n_day"),
        F.col("n2").cast("long").alias("n_night"),
        F.floor(dplus * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "dplus_e6"
        ),
        F.floor(dminus * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "dminus_e6"
        ),
        F.floor(stat * 10_000 + F.lit(_OFF)).cast("long").alias(
            "kuiper_stat_e4"
        ),
    ).orderBy("event_type")


SQL_KUIPER2 = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS is_day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cells AS (
  SELECT event_type, v,
         CAST(sum(is_day) AS BIGINT) AS c1,
         CAST(sum(1 - is_day) AS BIGINT) AS c2
  FROM ev GROUP BY 1, 2
), d2 AS (
  SELECT event_type, v,
         sum(c1) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS f1,
         sum(c2) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS f2,
         sum(c1) OVER (PARTITION BY event_type) AS n1,
         sum(c2) OVER (PARTITION BY event_type) AS n2
  FROM cells
), agg AS (
  SELECT event_type,
         CAST(max(n1) AS BIGINT) AS n1,
         CAST(max(n2) AS BIGINT) AS n2,
         CAST(max(f1 * n2 - f2 * n1) AS BIGINT) AS mp,
         CAST(max(-(f1 * n2 - f2 * n1)) AS BIGINT) AS mn
  FROM d2 GROUP BY 1
)
SELECT event_type, n1 AS n_day, n2 AS n_night,
       CAST(floor(greatest(CAST(mp AS DOUBLE), 0.0)
                  / (CAST(n1 AS DOUBLE) * n2) * 1000000 + {_OFF})
            AS BIGINT) AS dplus_e6,
       CAST(floor(greatest(CAST(mn AS DOUBLE), 0.0)
                  / (CAST(n1 AS DOUBLE) * n2) * 1000000 + {_OFF})
            AS BIGINT) AS dminus_e6,
       CAST(floor((sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) + 0.155
                   + 0.24 / sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))
                  * (greatest(CAST(mp AS DOUBLE), 0.0)
                       / (CAST(n1 AS DOUBLE) * n2)
                     + greatest(CAST(mn AS DOUBLE), 0.0)
                       / (CAST(n1 AS DOUBLE) * n2))
                  * 10000 + {_OFF}) AS BIGINT) AS kuiper_stat_e4
FROM agg WHERE n1 > 0 AND n2 > 0
ORDER BY event_type
"""


QUERIES.update(
    {
        "crps_climatology": q_crps_climatology,
        "winkler_interval_score": q_winkler_interval_score,
        "kuiper_two_sample": q_kuiper_two_sample,
    }
)
ORACLE_SQL.update(
    {
        "crps_climatology": SQL_CRPS,
        "winkler_interval_score": SQL_WINKLER,
        "kuiper_two_sample": SQL_KUIPER2,
    }
)


# ===========================================================================
# Battery U: event studies + actuarial priors + ranking models — the
# market-model event study of the Monday calendar effect (MacKinlay
# 1997), the Bornhuetter-Ferguson ultimate composing the chain-ladder
# development pattern with an exposure prior, and a Plackett-Luce
# ranking model fitted by two unrolled MM iterations.
# ===========================================================================


# ---------------------------------------------------------------------------
# event_study_car — market-model event study: estimate (alpha, beta)
# per type on NON-Monday days, compute abnormal returns AR = r - a -
# b m on Mondays, and report AAR, CAR and the t from the estimation
# residual variance (MacKinlay, J Econ Lit 1997 — here the recurring
# "event" is the week boundary, i.e. a Monday-effect study).
# ---------------------------------------------------------------------------


def q_event_study_car(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value_counts(spark, sf_dir)
    r = _daily_returns(daily).join(
        F.broadcast(_market_returns(daily)), "day"
    )
    # day 0 of the unix epoch was a Thursday; (day + 3) % 7 == 0 -> Mon
    r = r.withColumn(
        "is_mon", (((F.col("day") + 3) % 7) == 0).cast("long")
    )
    est = r.filter(F.col("is_mon") == 0)
    agg = est.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ne"),
        F.sum("m6").alias("sx"),
        F.sum("r6").alias("sy"),
        F.sum(F.col("m6") * F.col("m6")).alias("sxx"),
        F.sum(F.col("m6") * F.col("r6")).alias("sxy"),
        F.sum(F.col("r6") * F.col("r6")).alias("syy"),
    )
    ned = F.col("ne").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    vx = F.col("sxx").cast("double") - sx * sx / ned
    cxy = F.col("sxy").cast("double") - sx * sy / ned
    beta = cxy / vx
    alpha = (sy - beta * sx) / ned
    rss = (
        F.col("syy").cast("double")
        - sy * sy / ned
        - cxy * cxy / vx
    )
    s2 = rss / (ned - 2.0)
    params = agg.filter((F.col("ne") > 3) & (vx > 0)).select(
        "event_type",
        "ne",
        alpha.alias("a"),
        beta.alias("b"),
        s2.alias("s2"),
    )
    evt = r.filter(F.col("is_mon") == 1).join(
        F.broadcast(params), "event_type"
    )
    ar = (
        F.col("r6").cast("double")
        - F.col("a")
        - F.col("b") * F.col("m6").cast("double")
    )
    t = evt.select(
        "event_type",
        "ne",
        "s2",
        F.floor(ar * 1000 + F.lit(_OFF)).cast("long").alias("ar3"),
    )
    out = t.groupBy("event_type", "ne", "s2").agg(
        F.count(F.lit(1)).alias("nev"),
        F.sum("ar3").alias("car3"),
    )
    nev = F.col("nev").cast("double")
    aar = F.col("car3").cast("double") / nev / 1000.0
    tstat = aar / F.sqrt(F.col("s2") / nev)
    return out.filter(F.col("nev") > 0).select(
        "event_type",
        F.col("ne").cast("long").alias("n_est"),
        F.col("nev").cast("long").alias("n_event"),
        F.floor(aar + F.lit(_OFF)).cast("long").alias("aar_e6"),
        F.floor(F.col("car3").cast("double") / 1000.0 + F.lit(_OFF))
        .cast("long")
        .alias("car_e6"),
        F.floor(tstat * 10_000 + F.lit(_OFF)).cast("long").alias(
            "t_e4"
        ),
    ).orderBy("event_type")


SQL_EVENT_STUDY = f"""
WITH {_SQL_DAILY_VC}, {_SQL_TYPE_RET}, {_SQL_MKT_RET}, j AS (
  SELECT rr.event_type, rr.day, rr.r6, mr.m6,
         CASE WHEN (rr.day + 3) % 7 = 0 THEN 1 ELSE 0 END AS is_mon
  FROM rr JOIN mr ON mr.day = rr.day
), agg AS (
  SELECT event_type, count(*) AS ne,
         CAST(sum(m6) AS BIGINT) AS sx,
         CAST(sum(r6) AS BIGINT) AS sy,
         CAST(sum(m6 * m6) AS BIGINT) AS sxx,
         CAST(sum(m6 * r6) AS BIGINT) AS sxy,
         CAST(sum(r6 * r6) AS BIGINT) AS syy
  FROM j WHERE is_mon = 0 GROUP BY 1
), params AS (
  SELECT event_type, ne,
         (CAST(sy AS DOUBLE)
          - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / ne)
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / ne)
            * sx) / ne AS a,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / ne)
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / ne) AS b,
         (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / ne
          - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / ne)
            * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / ne)
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / ne))
           / (ne - 2.0) AS s2
  FROM agg
  WHERE ne > 3
    AND CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / ne > 0
), t AS (
  SELECT j.event_type, p.ne, p.s2,
         CAST(floor((j.r6 - p.a - p.b * j.m6) * 1000 + {_OFF})
              AS BIGINT) AS ar3
  FROM j JOIN params p ON p.event_type = j.event_type
  WHERE j.is_mon = 1
), outt AS (
  SELECT event_type, ne, s2, count(*) AS nev,
         CAST(sum(ar3) AS BIGINT) AS car3
  FROM t GROUP BY 1, 2, 3
)
SELECT event_type, CAST(ne AS BIGINT) AS n_est,
       CAST(nev AS BIGINT) AS n_event,
       CAST(floor(CAST(car3 AS DOUBLE) / nev / 1000.0 + {_OFF})
            AS BIGINT) AS aar_e6,
       CAST(floor(CAST(car3 AS DOUBLE) / 1000.0 + {_OFF}) AS BIGINT)
         AS car_e6,
       CAST(floor(CAST(car3 AS DOUBLE) / nev / 1000.0
                  / sqrt(s2 / nev) * 10000 + {_OFF}) AS BIGINT)
         AS t_e4
FROM outt WHERE nev > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# bornhuetter_ferguson — BF (1972) ultimates on the chain-ladder
# triangle: ultimate = C_latest + (1 - 1/CDF_lag) * prior, prior =
# cohort user count x overall purchases-per-user.  Composes the
# chain_ladder development pattern (queries_stats15.py) with an
# exposure prior — the standard stabilization when young cohorts make
# pure chain-ladder ultimates noisy.
# ---------------------------------------------------------------------------


def q_bornhuetter_ferguson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        .cast("long")
        .alias("day"),
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    base = first.agg(F.min("d0").alias("day0"))
    fc = first.crossJoin(F.broadcast(base)).select(
        "user_id",
        F.floor((F.col("d0") - F.col("day0")) / 7)
        .cast("int")
        .alias("cohort"),
    )
    expo = fc.filter(F.col("cohort") <= 3).groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    pur = ev.filter(F.col("event_type") == "purchase").join(
        first, "user_id"
    )
    t = pur.crossJoin(F.broadcast(base)).select(
        F.floor((F.col("d0") - F.col("day0")) / 7)
        .cast("int")
        .alias("cohort"),
        F.floor((F.col("day") - F.col("d0")) / 7)
        .cast("int")
        .alias("lag"),
    ).filter((F.col("cohort") <= 3) & (F.col("lag") <= 3))
    inc = t.groupBy("cohort", "lag").agg(F.count(F.lit(1)).alias("x"))
    wcum = Window.partitionBy("cohort").orderBy("lag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = inc.withColumn("c", F.sum("x").over(wcum)).filter(
        F.col("lag") <= 3 - F.col("cohort")
    )
    a = cum.select(
        F.col("cohort").alias("ci"),
        F.col("lag").alias("lj"),
        F.col("c").alias("cj"),
    )
    b = cum.select(
        F.col("cohort").alias("ci2"),
        F.col("lag").alias("lj2"),
        F.col("c").alias("cj2"),
    )
    f = (
        a.join(
            b,
            (F.col("ci") == F.col("ci2"))
            & (F.col("lj2") == F.col("lj") + 1),
        )
        .groupBy("lj")
        .agg(F.sum("cj2").alias("num"), F.sum("cj").alias("den"))
        .withColumn(
            "f", F.col("num").cast("double") / F.col("den").cast("double")
        )
    )
    f0 = f.filter(F.col("lj") == 0).select(F.col("f").alias("f0"))
    f1 = f.filter(F.col("lj") == 1).select(F.col("f").alias("f1"))
    f2 = f.filter(F.col("lj") == 2).select(F.col("f").alias("f2"))
    latest = cum.filter(F.col("lag") == 3 - F.col("cohort"))
    # overall purchases-per-user prior rate (fully-developed cohort 0)
    rate = (
        latest.filter(F.col("cohort") == 0)
        .join(expo.filter(F.col("cohort") == 0), "cohort")
        .select(
            (
                F.col("c").cast("double")
                / F.col("n_users").cast("double")
            ).alias("elr")
        )
    )
    j = (
        latest.join(expo, "cohort")
        .crossJoin(F.broadcast(f0))
        .crossJoin(F.broadcast(f1))
        .crossJoin(F.broadcast(f2))
        .crossJoin(F.broadcast(rate))
    )
    cdf = (
        F.when(F.col("lag") <= 0, F.col("f0")).otherwise(F.lit(1.0))
        * F.when(F.col("lag") <= 1, F.col("f1")).otherwise(F.lit(1.0))
        * F.when(F.col("lag") <= 2, F.col("f2")).otherwise(F.lit(1.0))
    )
    prior = F.col("n_users").cast("double") * F.col("elr")
    ult_bf = F.col("c").cast("double") + (1.0 - 1.0 / cdf) * prior
    return j.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("n_users").cast("long").alias("n_users"),
        F.col("c").cast("long").alias("latest_cum"),
        F.floor(cdf * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "cdf_e6"
        ),
        F.floor(prior * 10_000 + F.lit(_OFF)).cast("long").alias(
            "prior_e4"
        ),
        F.floor(ult_bf * 10_000 + F.lit(_OFF)).cast("long").alias(
            "ultimate_bf_e4"
        ),
    ).orderBy("cohort")


SQL_BF = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), first AS (
  SELECT user_id, min(day) AS d0 FROM ev GROUP BY 1
), base AS (
  SELECT min(d0) AS day0 FROM first
), fc AS (
  SELECT user_id,
         CAST(floor((d0 - day0) / 7.0) AS INT) AS cohort
  FROM first CROSS JOIN base
), expo AS (
  SELECT cohort, count(*) AS n_users
  FROM fc WHERE cohort <= 3 GROUP BY 1
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
  SELECT cohort, lag, count(*) AS x FROM t GROUP BY 1, 2
), cum0 AS (
  SELECT cohort, lag,
         CAST(sum(x) OVER (PARTITION BY cohort ORDER BY lag
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS c
  FROM inc
), cum AS (
  SELECT * FROM cum0 WHERE lag <= 3 - cohort
), f AS (
  SELECT a.lag AS lj,
         CAST(sum(b.c) AS BIGINT) AS num,
         CAST(sum(a.c) AS BIGINT) AS den
  FROM cum a JOIN cum b
    ON b.cohort = a.cohort AND b.lag = a.lag + 1
  GROUP BY 1
), ff AS (
  SELECT lj, CAST(num AS DOUBLE) / den AS f FROM f
), latest AS (
  SELECT * FROM cum WHERE lag = 3 - cohort
), rate AS (
  SELECT CAST(l.c AS DOUBLE) / e.n_users AS elr
  FROM latest l JOIN expo e ON e.cohort = l.cohort
  WHERE l.cohort = 0
), j AS (
  SELECT l.cohort, l.lag, l.c, e.n_users, r.elr,
         (CASE WHEN l.lag <= 0
               THEN (SELECT f FROM ff WHERE lj = 0) ELSE 1.0 END)
         * (CASE WHEN l.lag <= 1
                 THEN (SELECT f FROM ff WHERE lj = 1) ELSE 1.0 END)
         * (CASE WHEN l.lag <= 2
                 THEN (SELECT f FROM ff WHERE lj = 2) ELSE 1.0 END)
           AS cdf
  FROM latest l
  JOIN expo e ON e.cohort = l.cohort
  CROSS JOIN rate r
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(c AS BIGINT) AS latest_cum,
       CAST(floor(cdf * 1000000 + {_OFF}) AS BIGINT) AS cdf_e6,
       CAST(floor(n_users * elr * 10000 + {_OFF}) AS BIGINT)
         AS prior_e4,
       CAST(floor((c + (1.0 - 1.0 / cdf) * n_users * elr) * 10000
                  + {_OFF}) AS BIGINT) AS ultimate_bf_e4
FROM j
ORDER BY cohort
"""


QUERIES.update(
    {
        "event_study_car": q_event_study_car,
        "bornhuetter_ferguson": q_bornhuetter_ferguson,
    }
)
ORACLE_SQL.update(
    {
        "event_study_car": SQL_EVENT_STUDY,
        "bornhuetter_ferguson": SQL_BF,
    }
)


# ---------------------------------------------------------------------------
# plackett_luce_mm — Plackett-Luce ranking model over the daily
# count-ranking of the 5 event types, fitted by TWO unrolled
# minorize-maximize iterations (Hunter, Ann Stat 2004) from gamma = 1:
# gamma_i' = W_i / sum_days sum_{p <= min(rk_i, k-1)} 1/S_p(day),
# S_p = suffix sum of gamma from position p.  Identification: gamma
# is normalized by the alphabetically-first type, making each update
# an EXACT INTEGER ratio (W_i * den_ref) / (W_ref * den_i) of
# e9-floored denominators — both engines walk the identical MM path.
# Windows run over 5-row per-day rankings only.
# ---------------------------------------------------------------------------


def q_plackett_luce_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wday = Window.partitionBy("day").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    ranks = daily.withColumn("rk", F.row_number().over(wday))
    full = (
        ranks.groupBy("day")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == 5)
        .select("day")
    )
    ranks = ranks.join(full, "day")

    def mm(gamma: DataFrame) -> DataFrame:
        j = ranks.join(F.broadcast(gamma), "event_type")
        wsuf = Window.partitionBy("day").orderBy(
            F.col("rk").desc()
        ).rowsBetween(Window.unboundedPreceding, 0)
        s = j.withColumn("s", F.sum("g").over(wsuf))
        c9 = F.when(
            F.col("rk") <= 4,
            F.floor(1e9 / F.col("s") + F.lit(_OFF)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        wpre = Window.partitionBy("day").orderBy(
            F.col("rk").asc()
        ).rowsBetween(Window.unboundedPreceding, 0)
        p = s.withColumn("c9", c9).withColumn(
            "p9", F.sum("c9").over(wpre)
        )
        den = p.groupBy("event_type").agg(
            F.sum("p9").alias("den9"),
            F.sum((F.col("rk") <= 4).cast("long")).alias("w"),
        )
        ref = (
            den.orderBy("event_type")
            .limit(1)
            .select(
                F.col("den9").alias("dref"), F.col("w").alias("wref")
            )
        )
        out = den.crossJoin(F.broadcast(ref))
        return out.select(
            "event_type",
            "w",
            (
                (F.col("w") * F.col("dref")).cast("double")
                / (F.col("wref") * F.col("den9")).cast("double")
            ).alias("g"),
        )

    g0 = ranks.select("event_type").distinct().withColumn(
        "g", F.lit(1.0)
    )
    g2 = mm(mm(g0).select("event_type", "g"))
    return g2.select(
        "event_type",
        F.col("w").cast("long").alias("wins"),
        F.floor(F.col("g") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("gamma_e6"),
    ).orderBy("event_type")


def _pl_step_sql(prev: str, tag: str) -> str:
    return f"""
  j{tag} AS (
    SELECT r.day, r.event_type, r.rk, p.g
    FROM ranks r JOIN {prev} p ON p.event_type = r.event_type
  ), s{tag} AS (
    SELECT day, event_type, rk,
           sum(g) OVER (PARTITION BY day ORDER BY rk DESC
                        ROWS UNBOUNDED PRECEDING) AS s
    FROM j{tag}
  ), c{tag} AS (
    SELECT day, event_type, rk,
           CASE WHEN rk <= 4
                THEN CAST(floor(1e9 / s + {_OFF}) AS BIGINT)
                ELSE 0 END AS c9
    FROM s{tag}
  ), pp{tag} AS (
    SELECT day, event_type, rk,
           CAST(sum(c9) OVER (PARTITION BY day ORDER BY rk ASC
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS p9
    FROM c{tag}
  ), den{tag} AS (
    SELECT event_type,
           CAST(sum(p9) AS BIGINT) AS den9,
           CAST(sum(CASE WHEN rk <= 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS w
    FROM pp{tag} GROUP BY 1
  ), ref{tag} AS (
    SELECT den9 AS dref, w AS wref
    FROM den{tag} ORDER BY event_type LIMIT 1
  ), g{tag} AS (
    SELECT event_type, w,
           CAST(w * dref AS DOUBLE) / (wref * den9) AS g
    FROM den{tag} CROSS JOIN ref{tag}
  )
"""


SQL_PLACKETT = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
), ranks0 AS (
  SELECT event_type, day, cnt,
         row_number() OVER (PARTITION BY day
                            ORDER BY cnt DESC, event_type ASC) AS rk
  FROM daily
), full_days AS (
  SELECT day FROM ranks0 GROUP BY 1 HAVING count(*) = 5
), ranks AS (
  SELECT r.* FROM ranks0 r JOIN full_days f ON f.day = r.day
), g0 AS (
  SELECT DISTINCT event_type, 1.0 AS g FROM ranks
), {_pl_step_sql("g0", "1")}, {_pl_step_sql("g1", "2")}
SELECT event_type, w AS wins,
       CAST(floor(g * 1000000 + {_OFF}) AS BIGINT) AS gamma_e6
FROM g2
ORDER BY event_type
"""


QUERIES.update({"plackett_luce_mm": q_plackett_luce_mm})
ORACLE_SQL.update({"plackett_luce_mm": SQL_PLACKETT})


# ===========================================================================
# Battery V: paired-comparison models — Bradley-Terry strengths by
# two unrolled MM iterations on daily pairwise count wins, and the
# Thurstone Case V scale from probit win rates (completing the
# ranking-model family next to plackett_luce_mm / borda_condorcet).
# ===========================================================================


def _daily_pair_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, wins, n) for ordered type pairs over complete days."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a = daily.select(
        "day",
        F.col("event_type").alias("i"),
        F.col("cnt").alias("ci"),
    )
    b = daily.select(
        "day",
        F.col("event_type").alias("j"),
        F.col("cnt").alias("cj"),
    )
    p = a.join(b, "day").filter(F.col("i") != F.col("j"))
    # i beats j on a day iff (cnt, type) orders i first — exact total
    # order, no ties possible with the type tiebreak
    win = (
        (F.col("ci") > F.col("cj"))
        | ((F.col("ci") == F.col("cj")) & (F.col("i") < F.col("j")))
    ).cast("long")
    return p.groupBy("i", "j").agg(
        F.sum(win).alias("w"), F.count(F.lit(1)).alias("n")
    )


_SQL_PAIR_WINS = """
  daily AS (
    SELECT event_type,
           CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
           count(*) AS cnt
    FROM events GROUP BY 1, 2
  ), pw AS (
    SELECT a.event_type AS i, b.event_type AS j,
           CAST(sum(CASE WHEN a.cnt > b.cnt
                           OR (a.cnt = b.cnt
                               AND a.event_type < b.event_type)
                     THEN 1 ELSE 0 END) AS BIGINT) AS w,
           count(*) AS n
    FROM daily a JOIN daily b
      ON b.day = a.day AND a.event_type <> b.event_type
    GROUP BY 1, 2
  )
"""


# ---------------------------------------------------------------------------
# bradley_terry_mm — Bradley-Terry (1952) strengths by two unrolled
# MM iterations (Hunter 2004): gamma_i' = W_i / sum_j N_ij /
# (gamma_i + gamma_j), reference-type identified so each update is an
# exact integer ratio of e9-floored denominators (the same discipline
# as plackett_luce_mm — both engines walk the identical MM path).
# ---------------------------------------------------------------------------


def q_bradley_terry_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    pw = _daily_pair_wins(spark, sf_dir)
    wins = pw.groupBy("i").agg(F.sum("w").alias("wi"))

    def mm(gamma: DataFrame) -> DataFrame:
        gi = gamma.select(
            F.col("event_type").alias("i"), F.col("g").alias("gi")
        )
        gj = gamma.select(
            F.col("event_type").alias("j"), F.col("g").alias("gj")
        )
        j = pw.join(F.broadcast(gi), "i").join(F.broadcast(gj), "j")
        t9 = F.floor(
            F.col("n").cast("double")
            * 1e9
            / (F.col("gi") + F.col("gj"))
            + F.lit(_OFF)
        ).cast("long")
        den = j.select("i", t9.alias("t9")).groupBy("i").agg(
            F.sum("t9").alias("den9")
        ).join(F.broadcast(wins), "i")
        ref = (
            den.orderBy("i")
            .limit(1)
            .select(
                F.col("den9").alias("dref"), F.col("wi").alias("wref")
            )
        )
        out = den.crossJoin(F.broadcast(ref))
        return out.select(
            F.col("i").alias("event_type"),
            F.col("wi"),
            (
                (F.col("wi") * F.col("dref")).cast("double")
                / (F.col("wref") * F.col("den9")).cast("double")
            ).alias("g"),
        )

    g0 = pw.select(F.col("i").alias("event_type")).distinct().withColumn(
        "g", F.lit(1.0)
    )
    g2 = mm(mm(g0).select("event_type", "g"))
    return g2.select(
        "event_type",
        F.col("wi").cast("long").alias("wins"),
        F.floor(F.col("g") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("gamma_e6"),
    ).orderBy("event_type")


def _bt_step_sql(prev: str, tag: str) -> str:
    return f"""
  j{tag} AS (
    SELECT pw.i, pw.n,
           CAST(floor(CAST(pw.n AS DOUBLE) * 1e9 / (gi.g + gj.g)
                      + {_OFF}) AS BIGINT) AS t9
    FROM pw
    JOIN {prev} gi ON gi.event_type = pw.i
    JOIN {prev} gj ON gj.event_type = pw.j
  ), den{tag} AS (
    SELECT j{tag}.i, CAST(sum(t9) AS BIGINT) AS den9,
           CAST(max(wins.wi) AS BIGINT) AS wi
    FROM j{tag} JOIN wins ON wins.i = j{tag}.i
    GROUP BY 1
  ), ref{tag} AS (
    SELECT den9 AS dref, wi AS wref FROM den{tag}
    ORDER BY i LIMIT 1
  ), g{tag} AS (
    SELECT i AS event_type, wi,
           CAST(wi * dref AS DOUBLE) / (wref * den9) AS g
    FROM den{tag} CROSS JOIN ref{tag}
  )
"""


SQL_BRADLEY_TERRY = f"""
WITH {_SQL_PAIR_WINS}, wins AS (
  SELECT i, CAST(sum(w) AS BIGINT) AS wi FROM pw GROUP BY 1
), g0 AS (
  SELECT DISTINCT i AS event_type, 1.0 AS g FROM pw
), {_bt_step_sql("g0", "1")}, {_bt_step_sql("g1", "2")}
SELECT event_type, wi AS wins,
       CAST(floor(g * 1000000 + {_OFF}) AS BIGINT) AS gamma_e6
FROM g2
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# thurstone_case_v — Thurstone (1927) Case V scaling: scale_i = mean
# over j of probit(p_ij), with Laplace-smoothed win rates p_ij =
# (w_ij + 0.5)/(n_ij + 1) through the shared Acklam probit twin.
# The pairwise table is k x k (broadcast-sized at any corpus size).
# ---------------------------------------------------------------------------


def q_thurstone_case_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    pw = _daily_pair_wins(spark, sf_dir)
    p = (F.col("w").cast("double") + 0.5) / (
        F.col("n").cast("double") + 1.0
    )
    z6 = F.floor(_probit(p) * 1_000_000 + F.lit(_OFF)).cast("long")
    t = pw.select("i", z6.alias("z6"), F.col("w"))
    agg = t.groupBy("i").agg(
        F.count(F.lit(1)).alias("k1"),
        F.sum("z6").alias("sz"),
        F.sum("w").alias("wins"),
    )
    scale = F.col("sz").cast("double") / (
        F.col("k1").cast("double") + 1.0
    ) / 1e6
    return agg.select(
        F.col("i").alias("event_type"),
        F.col("wins").cast("long").alias("wins"),
        F.floor(scale * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "scale_e6"
        ),
    ).orderBy("event_type")


SQL_THURSTONE = f"""
WITH {_SQL_PAIR_WINS}, t AS (
  SELECT i, w,
         CAST(floor(
           {_probit_sql("(CAST(w AS DOUBLE) + 0.5) / (n + 1.0)")}
           * 1000000 + {_OFF}) AS BIGINT) AS z6
  FROM pw
), agg AS (
  SELECT i, count(*) AS k1,
         CAST(sum(z6) AS BIGINT) AS sz,
         CAST(sum(w) AS BIGINT) AS wins
  FROM t GROUP BY 1
)
SELECT i AS event_type, wins,
       CAST(floor(CAST(sz AS DOUBLE) / (k1 + 1.0) / 1e6 * 1000000
                  + {_OFF}) AS BIGINT) AS scale_e6
FROM agg
ORDER BY event_type
"""


QUERIES.update(
    {
        "bradley_terry_mm": q_bradley_terry_mm,
        "thurstone_case_v": q_thurstone_case_v,
    }
)
ORACLE_SQL.update(
    {
        "bradley_terry_mm": SQL_BRADLEY_TERRY,
        "thurstone_case_v": SQL_THURSTONE,
    }
)


# ---------------------------------------------------------------------------
# elo_daily — rows-only kernel: Elo ratings of the 5 event types from
# daily count standings (batched per-day updates, K = 32).  The
# day-over-day recursion is a non-associative fold, so no SQL twin —
# pinned in tests/test_elo.py against an independent match-by-match
# loop.  Input collapses to the bounded calendar layer upstream.
# ---------------------------------------------------------------------------


def q_elo_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.elo import elo_daily

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        F.col("event_type"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    out = elo_daily(daily, "event_type", "day", "cnt")
    return out.select(
        "event_type", "n_days", F.round("elo", 4).alias("elo")
    ).orderBy("event_type")


QUERIES.update({"elo_daily": q_elo_daily})


# ===========================================================================
# Battery W: density estimation + panel unit roots + representation
# similarity — Gaussian KDE on a Silverman bandwidth over a 10-point
# grid, the Levin-Lin-Chu-style pooled panel unit-root t, and linear
# CKA between the two halves of the embedding space.
# ===========================================================================


# ---------------------------------------------------------------------------
# kde_silverman — Gaussian kernel density of the centi-value at 10
# equally spaced grid points between q05 and q95, bandwidth h = 0.9
# min(sd, IQR/1.34) n^(-1/5) (Silverman 1986 rule of thumb; the power
# is an explicit exp/ln tree).  Kernel sums collapse to the bounded
# value domain x 10 broadcast grid points; terms e9-floored.
# ---------------------------------------------------------------------------


def q_kde_silverman(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _gmm_cells(spark, sf_dir)
    wc = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("event_type")
    c2 = (
        cells.withColumn("cum", F.sum("nv").over(wc))
        .withColumn("n", F.sum("nv").over(wt))
        .withColumn("sv", F.sum(F.col("nv") * F.col("v")).over(wt))
        .withColumn(
            "svv", F.sum(F.col("nv") * F.col("v") * F.col("v")).over(wt)
        )
    )
    mom = c2.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("sv").alias("sv"),
        F.max("svv").alias("svv"),
        F.min(
            F.when(20 * F.col("cum") >= F.col("n"), F.col("v"))
        ).alias("q05"),
        F.min(
            F.when(4 * F.col("cum") >= F.col("n"), F.col("v"))
        ).alias("q25"),
        F.min(
            F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("v"))
        ).alias("q75"),
        F.min(
            F.when(20 * F.col("cum") >= 19 * F.col("n"), F.col("v"))
        ).alias("q95"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("sv").cast("double") / nd
    sd = F.sqrt((F.col("svv").cast("double") - nd * mu * mu) / nd)
    iqr = (F.col("q75") - F.col("q25")).cast("double")
    h = (
        0.9
        * F.least(sd, iqr / 1.34)
        * F.exp(-0.2 * F.log(nd))
    )
    params = mom.filter((sd > 0) & (iqr > 0)).select(
        "event_type", "n", "q05", "q95", h.alias("h")
    )
    grid = spark.range(0, 10).select(F.col("id").alias("k"))
    g = params.crossJoin(F.broadcast(grid)).select(
        "event_type",
        "n",
        "h",
        "k",
        (
            F.col("q05")
            + F.floor(
                F.col("k")
                * (F.col("q95") - F.col("q05")).cast("double")
                / 9.0
            ).cast("long")
        ).alias("g"),
    )
    j = g.join(cells, "event_type")
    u = (F.col("g") - F.col("v")).cast("double") / F.col("h")
    k9 = F.floor(
        F.col("nv").cast("double") * F.exp(-u * u / 2.0) * 1e9
        + F.lit(_OFF)
    ).cast("long")
    t = j.select("event_type", "n", "h", "k", "g", k9.alias("k9"))
    agg = t.groupBy("event_type", "n", "h", "k", "g").agg(
        F.sum("k9").alias("sk9")
    )
    dens = (
        F.col("sk9").cast("double")
        / 1e9
        / (
            F.col("n").cast("double")
            * F.col("h")
            * F.sqrt(F.lit(2.0) * F.lit(3.141592653589793))
        )
    )
    return agg.select(
        "event_type",
        F.col("k").cast("long").alias("k"),
        F.col("g").cast("long").alias("g_e2"),
        F.floor(F.col("h") * 10_000 + F.lit(_OFF)).cast("long").alias(
            "h_e6"
        ),
        F.floor(dens * 1e8 + F.lit(_OFF)).cast("long").alias(
            "dens_e8"
        ),
    ).orderBy("event_type", "k")


SQL_KDE = f"""
WITH cells AS (
  SELECT event_type, CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         count(*) AS nv
  FROM events GROUP BY 1, 2
), c2 AS (
  SELECT event_type, v, nv,
         sum(nv) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum,
         sum(nv) OVER (PARTITION BY event_type) AS n,
         sum(nv * v) OVER (PARTITION BY event_type) AS sv,
         sum(nv * v * v) OVER (PARTITION BY event_type) AS svv
  FROM cells
), mom AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n,
         CAST(max(sv) AS BIGINT) AS sv,
         CAST(max(svv) AS BIGINT) AS svv,
         CAST(min(CASE WHEN 20 * cum >= n THEN v END) AS BIGINT)
           AS q05,
         CAST(min(CASE WHEN 4 * cum >= n THEN v END) AS BIGINT)
           AS q25,
         CAST(min(CASE WHEN 4 * cum >= 3 * n THEN v END) AS BIGINT)
           AS q75,
         CAST(min(CASE WHEN 20 * cum >= 19 * n THEN v END) AS BIGINT)
           AS q95
  FROM c2 GROUP BY 1
), params AS (
  SELECT event_type, n, q05, q95,
         0.9 * least(
           sqrt((CAST(svv AS DOUBLE)
                 - n * (CAST(sv AS DOUBLE) / n)
                     * (CAST(sv AS DOUBLE) / n)) / n),
           CAST(q75 - q25 AS DOUBLE) / 1.34)
         * exp(-0.2 * ln(CAST(n AS DOUBLE))) AS h
  FROM mom
  WHERE (CAST(svv AS DOUBLE)
         - n * (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n))
        / n > 0
    AND q75 > q25
), g AS (
  SELECT event_type, n, h, k.k,
         q05 + CAST(floor(k.k * CAST(q95 - q05 AS DOUBLE) / 9.0)
                    AS BIGINT) AS g
  FROM params
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k) k
), t AS (
  SELECT g.event_type, g.n, g.h, g.k, g.g,
         CAST(floor(c.nv
                    * exp(-(CAST(g.g - c.v AS DOUBLE) / g.h)
                          * (CAST(g.g - c.v AS DOUBLE) / g.h) / 2.0)
                    * 1e9 + {_OFF}) AS BIGINT) AS k9
  FROM g JOIN cells c ON c.event_type = g.event_type
), agg AS (
  SELECT event_type, n, h, k, g,
         CAST(sum(k9) AS BIGINT) AS sk9
  FROM t GROUP BY 1, 2, 3, 4, 5
)
SELECT event_type, CAST(k AS BIGINT) AS k, g AS g_e2,
       CAST(floor(h * 10000 + {_OFF}) AS BIGINT) AS h_e6,
       CAST(floor(CAST(sk9 AS DOUBLE) / 1e9
                  / (n * h * sqrt(2.0 * 3.141592653589793)) * 1e8
                  + {_OFF}) AS BIGINT) AS dens_e8
FROM agg
ORDER BY event_type, k
"""


QUERIES.update({"kde_silverman": q_kde_silverman})
ORACLE_SQL.update({"kde_silverman": SQL_KDE})


# ---------------------------------------------------------------------------
# llc_panel_unit_root — Levin-Lin-Chu-style POOLED Dickey-Fuller t on
# the panel of per-type daily mean values (within-type demeaned, no
# lag augmentation — the LLC pooling idea in its closed-form core;
# Levin, Lin & Chu 2002).  Demeaned values are floor-quantized to
# integers so the pooled cross-products are exact.
# ---------------------------------------------------------------------------


def q_llc_panel_unit_root(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y4"),
    )
    wt = Window.partitionBy("event_type")
    dm = daily.withColumn(
        "d",
        F.floor(
            F.col("y4")
            - F.sum("y4").over(wt).cast("double")
            / F.count(F.lit(1)).over(wt)
            + F.lit(_OFF)
        ).cast("long"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    p = dm.withColumn("dp", F.lag("d").over(wo)).filter(
        F.col("dp").isNotNull()
    )
    agg = p.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("dp") * (F.col("d") - F.col("dp"))).alias("sxy"),
        F.sum(F.col("dp") * F.col("dp")).alias("sxx"),
        F.sum(
            (F.col("d") - F.col("dp")) * (F.col("d") - F.col("dp"))
        ).alias("syy"),
    )
    md = F.col("m").cast("double")
    rho = F.col("sxy").cast("double") / F.col("sxx").cast("double")
    rss = F.col("syy").cast("double") - rho * F.col("sxy").cast(
        "double"
    )
    s2 = rss / (md - 1.0)
    t = rho / F.sqrt(s2 / F.col("sxx").cast("double"))
    return agg.filter((F.col("m") > 2) & (F.col("sxx") > 0)).select(
        F.col("m").cast("long").alias("n_obs"),
        F.floor(rho * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rho_e6"
        ),
        F.floor(t * 10_000 + F.lit(_OFF)).cast("long").alias("t_e4"),
    )


SQL_LLC = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) * 100 + {_OFF}) AS BIGINT) AS y4
  FROM events GROUP BY 1, 2
), dm AS (
  SELECT event_type, day,
         CAST(floor(y4 - CAST(sum(y4) OVER (PARTITION BY event_type)
                              AS DOUBLE)
                         / count(*) OVER (PARTITION BY event_type)
                    + {_OFF}) AS BIGINT) AS d
  FROM daily
), p AS (
  SELECT event_type, d,
         lag(d) OVER (PARTITION BY event_type ORDER BY day) AS dp
  FROM dm
), p2 AS (
  SELECT * FROM p WHERE dp IS NOT NULL
), agg AS (
  SELECT count(*) AS m,
         CAST(sum(dp * (d - dp)) AS BIGINT) AS sxy,
         CAST(sum(dp * dp) AS BIGINT) AS sxx,
         CAST(sum((d - dp) * (d - dp)) AS BIGINT) AS syy
  FROM p2
)
SELECT CAST(m AS BIGINT) AS n_obs,
       CAST(floor(CAST(sxy AS DOUBLE) / sxx * 1000000 + {_OFF})
            AS BIGINT) AS rho_e6,
       CAST(floor(CAST(sxy AS DOUBLE) / sxx
                  / sqrt(((CAST(syy AS DOUBLE)
                           - (CAST(sxy AS DOUBLE) / sxx) * sxy)
                          / (m - 1.0)) / sxx) * 10000 + {_OFF})
            AS BIGINT) AS t_e4
FROM agg WHERE m > 2 AND sxx > 0
"""


QUERIES.update({"llc_panel_unit_root": q_llc_panel_unit_root})
ORACLE_SQL.update({"llc_panel_unit_root": SQL_LLC})
