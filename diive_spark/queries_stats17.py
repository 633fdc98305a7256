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
