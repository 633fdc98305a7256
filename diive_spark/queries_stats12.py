"""Round-4 continuation registry (twelfth battery): modern rank
correlation (Chatterjee's xi), heteroscedasticity split-sample testing
(Goldfeld-Quandt), stratified 2x2 odds-ratio homogeneity (Breslow-Day
with Tarone's correction), and calendar spatial autocorrelation
(Geary's C) — none previously covered by the registry.

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)``, derived
doubles floor-scaled with the house 1/pi offset BEFORE any cross-row
aggregation (so both engines sum exact integers, never doubles), and
shared thresholds/constants entering both engines verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF

# ---------------------------------------------------------------------------
# chatterjee_xi — Chatterjee's rank correlation coefficient (JASA 2021)
# ---------------------------------------------------------------------------
# xi_n(X,Y) = 1 - n * sum_i |r_{i+1} - r_i| / (2 * sum_i l_i (n - l_i))
# with rows sorted by X, r_i = #{j: Y_j <= Y_i}, l_i = #{j: Y_j >= Y_i}
# (the general tie-robust form).  X = arrival order (ts, event_id),
# Y = centi-scaled value.  Both rank vectors are cumulative-count RANGE
# windows partitioned by event_type — every sum is an exact BIGINT, so
# the two engines agree bit-for-bit; the only double is the final ratio.
# xi ~ 0 for independent sequences, 1 for Y a measurable function of X.


def q_chatterjee_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wr = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = (
        Window.partitionBy("event_type")
        .orderBy(F.col("v").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wx = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = (
        ev.withColumn("r", F.count(F.lit(1)).over(wr))
        .withColumn("l", F.count(F.lit(1)).over(wl))
        .withColumn("r_next", F.lead("r").over(wx))
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col("r_next").isNotNull(),
                F.abs(F.col("r_next") - F.col("r")),
            ).otherwise(F.lit(0))
        ).alias("s_abs"),
        F.sum("l").alias("sum_l"),
        F.sum(F.col("l") * F.col("l")).alias("sum_l2"),
    )
    out = (
        agg.withColumn(
            "denom_half",
            F.col("n") * F.col("sum_l") - F.col("sum_l2"),
        )
        .withColumn(
            "xi_e6",
            F.floor(
                (
                    F.lit(1.0)
                    - F.col("n").cast("double")
                    * F.col("s_abs")
                    / (F.lit(2.0) * F.col("denom_half"))
                )
                * 1_000_000
                + F.lit(_OFF)
            ).cast("long"),
        )
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("s_abs").cast("long").alias("s_abs"),
        (F.col("denom_half") * 2).cast("long").alias("denom"),
        "xi_e6",
    ).orderBy("event_type")


SQL_CHATTERJEE = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, event_id, ts, v,
         count(*) OVER (PARTITION BY event_type ORDER BY v
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS r,
         count(*) OVER (PARTITION BY event_type ORDER BY v DESC
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS l
  FROM ev
), tx AS (
  SELECT event_type, r, l,
         lead(r) OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS r_next
  FROM t
), agg AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CASE WHEN r_next IS NOT NULL
                       THEN abs(r_next - r) ELSE 0 END) AS BIGINT) AS s_abs,
         CAST(sum(l) AS BIGINT) AS sum_l,
         CAST(sum(l * l) AS BIGINT) AS sum_l2
  FROM tx GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       s_abs,
       CAST(2 * (n * sum_l - sum_l2) AS BIGINT) AS denom,
       CAST(floor((1.0 - CAST(n AS DOUBLE) * s_abs
                         / (2.0 * (n * sum_l - sum_l2)))
                  * 1000000 + {_OFF}) AS BIGINT) AS xi_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# goldfeld_quandt — split-sample heteroscedasticity F test (JASA 1965)
# ---------------------------------------------------------------------------
# Rows ordered by arrival (ts, event_id) per event_type; the first 40%
# and last 40% (middle fifth dropped) each get a 1-regressor OLS of
# centi-value on the within-segment time index; F = (RSS2/df2)/(RSS1/df1)
# flags variance growth over the crawl.  All OLS sums are exact BIGINTs
# (index <= n, centi-values <= ~5e4); RSS is the standard closed form
# Syy - Sy^2/n - (Sxy - SxSy/n)^2/(Sxx - Sx^2/n) evaluated identically
# in both engines from those integers.


def q_goldfeld_quandt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wx = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wn = Window.partitionBy("event_type")
    t = (
        ev.withColumn("idx", F.row_number().over(wx))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("k", F.floor(F.col("n") * 4 / 10).cast("long"))
        .withColumn(
            "seg",
            F.when(F.col("idx") <= F.col("k"), F.lit(1))
            .when(F.col("idx") > F.col("n") - F.col("k"), F.lit(2))
            .otherwise(F.lit(0)),
        )
        .filter(F.col("seg") > 0)
        .withColumn(
            "x",
            F.when(F.col("seg") == 1, F.col("idx")).otherwise(
                F.col("idx") - (F.col("n") - F.col("k"))
            ),
        )
    )
    seg = t.groupBy("event_type", "seg").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("v")).alias("sxy"),
        F.sum(F.col("v") * F.col("v")).alias("syy"),
    )
    md = F.col("m").cast("double")
    rss = (
        F.col("syy")
        - F.col("sy") * F.col("sy") / md
        - F.pow(F.col("sxy") - F.col("sx") * F.col("sy") / md, 2)
        / (F.col("sxx") - F.col("sx") * F.col("sx") / md)
    )
    seg = seg.withColumn(
        "rss_c2", F.floor(rss + F.lit(_OFF)).cast("long")
    ).withColumn("df", (F.col("m") - 2).cast("long"))
    s1 = seg.filter(F.col("seg") == 1).select(
        "event_type",
        F.col("m").cast("long").alias("n1"),
        F.col("rss_c2").alias("rss1_c2"),
        F.col("df").alias("df1"),
    )
    s2 = seg.filter(F.col("seg") == 2).select(
        "event_type",
        F.col("m").cast("long").alias("n2"),
        F.col("rss_c2").alias("rss2_c2"),
        F.col("df").alias("df2"),
    )
    out = s1.join(s2, "event_type").withColumn(
        "f_e6",
        F.floor(
            (F.col("rss2_c2").cast("double") / F.col("df2"))
            / (F.col("rss1_c2").cast("double") / F.col("df1"))
            * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    return out.select(
        "event_type", "n1", "n2", "rss1_c2", "rss2_c2", "f_e6"
    ).orderBy("event_type")


SQL_GOLDFELD = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t0 AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
), t AS (
  SELECT event_type, v,
         CASE WHEN idx <= k THEN 1
              WHEN idx > n - k THEN 2 ELSE 0 END AS seg,
         CASE WHEN idx <= k THEN idx ELSE idx - (n - k) END AS x
  FROM (SELECT *, CAST(floor(n * 4 / 10) AS BIGINT) AS k FROM t0)
  WHERE idx <= k OR idx > n - k
), seg AS (
  SELECT event_type, seg,
         count(*) AS m,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(v) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * v) AS BIGINT) AS sxy,
         CAST(sum(v * v) AS BIGINT) AS syy
  FROM t GROUP BY 1, 2
), r AS (
  SELECT event_type, seg, m,
         CAST(floor(syy - sy * sy / CAST(m AS DOUBLE)
                    - pow(sxy - sx * sy / CAST(m AS DOUBLE), 2)
                      / (sxx - sx * sx / CAST(m AS DOUBLE))
                    + {_OFF}) AS BIGINT) AS rss_c2,
         CAST(m - 2 AS BIGINT) AS df
  FROM seg
)
SELECT a.event_type,
       CAST(a.m AS BIGINT) AS n1,
       CAST(b.m AS BIGINT) AS n2,
       a.rss_c2 AS rss1_c2,
       b.rss_c2 AS rss2_c2,
       CAST(floor((CAST(b.rss_c2 AS DOUBLE) / b.df)
                  / (CAST(a.rss_c2 AS DOUBLE) / a.df)
                  * 1000000 + {_OFF}) AS BIGINT) AS f_e6
FROM r a JOIN r b ON a.event_type = b.event_type
WHERE a.seg = 1 AND b.seg = 2
ORDER BY a.event_type
"""


# ---------------------------------------------------------------------------
# breslow_day — odds-ratio homogeneity across strata + Tarone correction
# ---------------------------------------------------------------------------
# Strata = ISO day-of-week; exposure = morning arrival (hour < 12);
# outcome = centi-value > 3500 (~ the global median).  The common odds
# ratio is Mantel-Haenszel, with each stratum's a*d/n and b*c/n terms
# e6-floored BEFORE summation so psi is a ratio of exact integers.  Per
# stratum the expected a-cell under psi solves the Breslow-Day quadratic
# (psi-1)E^2 - (psi(n1+m1)+(m1_-col complement))E + psi*n1*m1 = 0 taking
# the root inside (max(0, m1-n2), min(n1, m1)); the chi-square terms and
# Tarone's (sum(a-E))^2 / sum(V) correction are again e6-floored before
# the final sums.  Deterministic-by-construction beats textbook float
# order here (house convention).


_BD_T = 3500  # centi-value outcome threshold (global median ~ 35)


def q_breslow_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.dayofweek("ts").alias("dow"),
        (F.hour("ts") < 12).cast("int").alias("am"),
        (
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            > F.lit(_BD_T)
        )
        .cast("int")
        .alias("hi"),
    )
    cells = ev.groupBy("dow").agg(
        F.sum(F.col("am") * F.col("hi")).alias("a"),
        F.sum(F.col("am") * (1 - F.col("hi"))).alias("b"),
        F.sum((1 - F.col("am")) * F.col("hi")).alias("c"),
        F.sum((1 - F.col("am")) * (1 - F.col("hi"))).alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    cells = cells.withColumn(
        "num_e6",
        F.floor(
            F.col("a") * F.col("d") * F.lit(1_000_000.0) / n + F.lit(_OFF)
        ).cast("long"),
    ).withColumn(
        "den_e6",
        F.floor(
            F.col("b") * F.col("c") * F.lit(1_000_000.0) / n + F.lit(_OFF)
        ).cast("long"),
    )
    mh = cells.agg(
        F.sum("num_e6").alias("mh_num"), F.sum("den_e6").alias("mh_den")
    )
    t = cells.crossJoin(F.broadcast(mh)).withColumn(
        "psi", F.col("mh_num").cast("double") / F.col("mh_den")
    )
    n1 = F.col("a") + F.col("b")
    n2 = F.col("c") + F.col("d")
    m1 = F.col("a") + F.col("c")
    A = F.col("psi") - 1.0
    B = -(F.col("psi") * (n1 + m1) + (n2 - m1))
    C = F.col("psi") * n1 * m1
    disc = F.sqrt(B * B - 4.0 * A * C)
    e1 = (-B - disc) / (2.0 * A)
    e2 = (-B + disc) / (2.0 * A)
    lo = F.greatest(F.lit(0.0), (m1 - n2).cast("double"))
    hi = F.least(n1.cast("double"), m1.cast("double"))
    E = F.when(
        F.abs(A) < 1e-12, n1.cast("double") * m1 / (n1 + n2)
    ).otherwise(
        F.when((e1 > lo) & (e1 < hi), e1).otherwise(e2)
    )
    t = t.withColumn("E", E)
    V = 1.0 / (
        1.0 / F.col("E")
        + 1.0 / (n1 - F.col("E"))
        + 1.0 / (m1 - F.col("E"))
        + 1.0 / (F.col("E") + n2 - m1)
    )
    t = (
        t.withColumn("V", V)
        .withColumn(
            "x2_e6",
            F.floor(
                (F.col("a") - F.col("E"))
                * (F.col("a") - F.col("E"))
                / F.col("V")
                * 1_000_000
                + F.lit(_OFF)
            ).cast("long"),
        )
        .withColumn(
            "dev_e6",
            F.floor(
                (F.col("a") - F.col("E")) * 1_000_000 + F.lit(_OFF)
            ).cast("long"),
        )
        .withColumn(
            "v_e6", F.floor(F.col("V") * 1_000_000 + F.lit(_OFF)).cast("long")
        )
    )
    out = t.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.max(
            F.floor(F.col("psi") * 1_000_000 + F.lit(_OFF)).cast("long")
        ).alias("psi_e6"),
        F.sum("x2_e6").alias("x2_sum_e6"),
        F.sum("dev_e6").alias("dev_sum_e6"),
        F.sum("v_e6").alias("v_sum_e6"),
    )
    return out.select(
        F.col("n_strata").cast("long").alias("n_strata"),
        "psi_e6",
        F.col("x2_sum_e6").cast("long").alias("x2_bd_e6"),
        F.floor(
            F.col("x2_sum_e6")
            - F.col("dev_sum_e6").cast("double")
            * F.col("dev_sum_e6")
            / F.col("v_sum_e6")
            / 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("x2_tarone_e6"),
    )


SQL_BRESLOW = f"""
WITH ev AS (
  SELECT dayofweek(ts) + 1 AS dow,
         CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END AS am,
         CASE WHEN CAST(floor(value * 100 + {_OFF}) AS BIGINT) > {_BD_T}
              THEN 1 ELSE 0 END AS hi
  FROM events
), cells AS (
  SELECT dow,
         CAST(sum(am * hi) AS BIGINT) AS a,
         CAST(sum(am * (1 - hi)) AS BIGINT) AS b,
         CAST(sum((1 - am) * hi) AS BIGINT) AS c,
         CAST(sum((1 - am) * (1 - hi)) AS BIGINT) AS d
  FROM ev GROUP BY 1
), terms AS (
  SELECT *,
         CAST(floor(a * d * 1000000.0 / (a + b + c + d) + {_OFF})
              AS BIGINT) AS num_e6,
         CAST(floor(b * c * 1000000.0 / (a + b + c + d) + {_OFF})
              AS BIGINT) AS den_e6
  FROM cells
), mh AS (
  SELECT CAST(sum(num_e6) AS BIGINT) AS mh_num,
         CAST(sum(den_e6) AS BIGINT) AS mh_den
  FROM terms
), st AS (
  SELECT a, b, c, d,
         CAST(mh_num AS DOUBLE) / mh_den AS psi,
         a + b AS n1, c + d AS n2, a + c AS m1
  FROM terms, mh
), quad AS (
  SELECT *,
         psi - 1.0 AS qa,
         -(psi * (n1 + m1) + (n2 - m1)) AS qb,
         psi * n1 * m1 AS qc
  FROM st
), root AS (
  SELECT *,
         CASE WHEN abs(qa) < 1e-12
              THEN CAST(n1 AS DOUBLE) * m1 / (n1 + n2)
              WHEN (-qb - sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa)
                     > greatest(0.0, CAST(m1 - n2 AS DOUBLE))
               AND (-qb - sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa)
                     < least(CAST(n1 AS DOUBLE), CAST(m1 AS DOUBLE))
              THEN (-qb - sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa)
              ELSE (-qb + sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa)
         END AS E
  FROM quad
), vv AS (
  SELECT *,
         1.0 / (1.0 / E + 1.0 / (n1 - E) + 1.0 / (m1 - E)
                + 1.0 / (E + n2 - m1)) AS V
  FROM root
), fl AS (
  SELECT psi,
         CAST(floor((a - E) * (a - E) / V * 1000000 + {_OFF}) AS BIGINT)
           AS x2_e6,
         CAST(floor((a - E) * 1000000 + {_OFF}) AS BIGINT) AS dev_e6,
         CAST(floor(V * 1000000 + {_OFF}) AS BIGINT) AS v_e6
  FROM vv
)
SELECT CAST(count(*) AS BIGINT) AS n_strata,
       CAST(max(CAST(floor(psi * 1000000 + {_OFF}) AS BIGINT)) AS BIGINT)
         AS psi_e6,
       CAST(sum(x2_e6) AS BIGINT) AS x2_bd_e6,
       CAST(floor(CAST(sum(x2_e6) AS BIGINT)
                  - CAST(CAST(sum(dev_e6) AS BIGINT) AS DOUBLE)
                    * CAST(sum(dev_e6) AS BIGINT)
                    / CAST(sum(v_e6) AS BIGINT) / 1000000
                  + {_OFF}) AS BIGINT) AS x2_tarone_e6
FROM fl
"""


# ---------------------------------------------------------------------------
# geary_c — Geary's contiguity ratio on the daily calendar chain (1954)
# ---------------------------------------------------------------------------
# Daily mean centi-values per event_type form a 1-D lattice whose
# neighbor weights are day-adjacency (|d_i - d_j| = 1 day).  Geary's
# C = (n-1) * sum_pairs (x_i - x_j)^2 / (2 * P * sum_i (x_i - xbar)^2)
# with P the number of adjacent pairs (chain: each unordered pair once;
# the symmetric-weight factors cancel).  Daily means are e2-floored to
# integers, so the numerator is an exact BIGINT; the deviance sum floors
# each squared deviation to e2 before aggregation.  C < 1 = positive
# autocorrelation, > 1 = negative.


def q_geary_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.floor(
            F.sum("v") * F.lit(100.0) / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("m_e2")
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    chain = (
        daily.withColumn("prev_day", F.lag("day").over(wd))
        .withColumn("prev_m", F.lag("m_e2").over(wd))
        .withColumn(
            "is_pair",
            (F.datediff(F.col("day"), F.col("prev_day")) == 1).cast("int"),
        )
    )
    num = chain.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.coalesce(F.col("is_pair"), F.lit(0))).alias("n_pairs"),
        F.sum(
            F.when(
                F.col("is_pair") == 1,
                (F.col("m_e2") - F.col("prev_m"))
                * (F.col("m_e2") - F.col("prev_m")),
            ).otherwise(F.lit(0))
        ).alias("num_e4"),
        F.sum("m_e2").alias("sum_m"),
    )
    dev = (
        daily.join(
            num.select("event_type", "n_days", "sum_m"), "event_type"
        )
        .withColumn(
            "dev_e2",
            F.floor(
                F.pow(
                    F.col("m_e2")
                    - F.col("sum_m").cast("double") / F.col("n_days"),
                    2,
                )
                / 100.0
                + F.lit(_OFF)
            ).cast("long"),
        )
        .groupBy("event_type")
        .agg(F.sum("dev_e2").alias("den_e2"))
    )
    out = num.join(dev, "event_type").withColumn(
        "geary_e6",
        F.floor(
            (F.col("n_days") - 1).cast("double")
            * F.col("num_e4")
            / 100.0
            / (2.0 * F.col("n_pairs") * F.col("den_e2"))
            * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    return out.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("num_e4").cast("long").alias("num_e4"),
        F.col("den_e2").cast("long").alias("den_e2"),
        "geary_e6",
    ).orderBy("event_type")


SQL_GEARY = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), daily AS (
  SELECT event_type, day,
         CAST(floor(CAST(sum(v) AS BIGINT) * 100.0 / count(*) + {_OFF})
              AS BIGINT) AS m_e2
  FROM ev GROUP BY 1, 2
), chain AS (
  SELECT event_type, day, m_e2,
         lag(day) OVER (PARTITION BY event_type ORDER BY day) AS prev_day,
         lag(m_e2) OVER (PARTITION BY event_type ORDER BY day) AS prev_m
  FROM daily
), num AS (
  SELECT event_type,
         count(*) AS n_days,
         CAST(sum(CASE WHEN day - prev_day = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN day - prev_day = 1
                       THEN (m_e2 - prev_m) * (m_e2 - prev_m)
                       ELSE 0 END) AS BIGINT) AS num_e4,
         CAST(sum(m_e2) AS BIGINT) AS sum_m
  FROM chain GROUP BY 1
), dev AS (
  SELECT d.event_type,
         CAST(sum(CAST(floor(pow(d.m_e2 - CAST(n.sum_m AS DOUBLE)
                                            / n.n_days, 2) / 100.0
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS den_e2
  FROM daily d JOIN num n ON n.event_type = d.event_type
  GROUP BY 1
)
SELECT n.event_type,
       CAST(n.n_days AS BIGINT) AS n_days,
       n.n_pairs,
       n.num_e4,
       dev.den_e2,
       CAST(floor(CAST(n.n_days - 1 AS DOUBLE) * n.num_e4 / 100.0
                  / (2.0 * n.n_pairs * dev.den_e2) * 1000000 + {_OFF})
            AS BIGINT) AS geary_e6
FROM num n JOIN dev ON dev.event_type = n.event_type
ORDER BY n.event_type
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "chatterjee_xi": q_chatterjee_xi,
    "goldfeld_quandt": q_goldfeld_quandt,
    "breslow_day": q_breslow_day,
    "geary_c": q_geary_c,
}

ORACLE_SQL: dict[str, str] = {
    "chatterjee_xi": SQL_CHATTERJEE,
    "goldfeld_quandt": SQL_GOLDFELD,
    "breslow_day": SQL_BRESLOW,
    "geary_c": SQL_GEARY,
}


# ---------------------------------------------------------------------------
# lepage_test — combined location-scale two-sample rank test (Lepage 1971)
# ---------------------------------------------------------------------------
# L = B_W + B_A with B = (S - E[S])^2 / Var[S] for the Wilcoxon rank-sum
# (location) and Ansari-Bradley (scale) statistics, weekend vs weekday
# samples per event_type; L ~ chi^2(2) under H0.  Ties are handled with
# doubled midranks (2*midrank = #[v_j < v_i] + #[v_j <= v_i] + 1, an
# exact integer), and BOTH statistics use the general linear-rank-score
# moments E[S] = m*S1/N, Var[S] = m*n*(N*S2 - S1^2)/(N^2*(N-1)) from
# exact integer score sums — tie-robust by construction.


def q_lepage_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofweek("ts").isin(1, 7).cast("int").alias("g1"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wlt = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wle = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    t = (
        ev.withColumn("r2", F.count(F.lit(1)).over(wlt)
                      + F.count(F.lit(1)).over(wle) + 1)
        .withColumn("N", F.count(F.lit(1)).over(wn))
        .withColumn(
            "a2", F.least(F.col("r2"), 2 * (F.col("N") + 1) - F.col("r2"))
        )
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("g1").alias("m"),
        F.sum("r2").alias("sr1"),
        F.sum(F.col("r2") * F.col("r2")).alias("sr2"),
        F.sum("a2").alias("sa1"),
        F.sum(F.col("a2") * F.col("a2")).alias("sa2"),
        F.sum(F.col("g1") * F.col("r2")).alias("w2"),
        F.sum(F.col("g1") * F.col("a2")).alias("aa2"),
    )
    Nd = F.col("N").cast("double")
    md = F.col("m").cast("double")
    nd = (F.col("N") - F.col("m")).cast("double")

    def bstat(s, s1, s2):
        e = md * F.col(s1) / Nd
        var = (
            md
            * nd
            * (Nd * F.col(s2) - F.col(s1) * F.col(s1))
            / (Nd * Nd * (Nd - 1.0))
        )
        return (F.col(s) - e) * (F.col(s) - e) / var

    out = agg.withColumn(
        "lepage_e6",
        F.floor(
            (bstat("w2", "sr1", "sr2") + bstat("aa2", "sa1", "sa2"))
            * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    return out.select(
        "event_type",
        F.col("m").cast("long").alias("m_weekend"),
        (F.col("N") - F.col("m")).cast("long").alias("n_weekday"),
        F.col("w2").cast("long").alias("w2"),
        F.col("aa2").cast("long").alias("a2"),
        "lepage_e6",
    ).orderBy("event_type")


SQL_LEPAGE = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS g1,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, g1,
         count(*) OVER (PARTITION BY event_type ORDER BY v
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         + count(*) OVER (PARTITION BY event_type ORDER BY v
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + 1 AS r2,
         count(*) OVER (PARTITION BY event_type) AS N
  FROM ev
), t2 AS (
  SELECT event_type, g1, r2, N,
         least(r2, 2 * (N + 1) - r2) AS a2
  FROM t
), agg AS (
  SELECT event_type,
         count(*) AS N,
         CAST(sum(g1) AS BIGINT) AS m,
         CAST(sum(r2) AS BIGINT) AS sr1,
         CAST(sum(r2 * r2) AS BIGINT) AS sr2,
         CAST(sum(a2) AS BIGINT) AS sa1,
         CAST(sum(a2 * a2) AS BIGINT) AS sa2,
         CAST(sum(g1 * r2) AS BIGINT) AS w2,
         CAST(sum(g1 * a2) AS BIGINT) AS aa2
  FROM t2 GROUP BY 1
)
SELECT event_type,
       m AS m_weekend,
       CAST(N - m AS BIGINT) AS n_weekday,
       w2,
       aa2 AS a2,
       CAST(floor((
         pow(w2 - CAST(m AS DOUBLE) * sr1 / N, 2)
           / (CAST(m AS DOUBLE) * (N - m)
              * (CAST(N AS DOUBLE) * sr2 - CAST(sr1 AS DOUBLE) * sr1)
              / (CAST(N AS DOUBLE) * N * (N - 1.0)))
         + pow(aa2 - CAST(m AS DOUBLE) * sa1 / N, 2)
           / (CAST(m AS DOUBLE) * (N - m)
              * (CAST(N AS DOUBLE) * sa2 - CAST(sa1 AS DOUBLE) * sa1)
              / (CAST(N AS DOUBLE) * N * (N - 1.0)))
       ) * 1000000 + {_OFF}) AS BIGINT) AS lepage_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cuzick_trend — Wilcoxon-type test for trend across ordered groups
# ---------------------------------------------------------------------------
# Cuzick (Stat. Med. 1985): T = sum_i l_i R_i with group scores l
# (here the four 6-hour diel buckets, ordered 1..4) and global midranks
# R within each event_type.  Doubled midranks keep every sum an exact
# BIGINT; the linear-rank moments E[T2] = Sl*S_r/N and
# Var[T2] = (N*Sll - Sl^2)(N*Srr - Sr^2) / (N^2 (N-1)) are tie-robust.
# z > 0 means value drifts upward across the diel buckets.


def q_cuzick_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.floor(F.hour("ts") / 6) + 1).cast("long").alias("g"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wlt = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wle = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = ev.withColumn(
        "r2",
        F.count(F.lit(1)).over(wlt) + F.count(F.lit(1)).over(wle) + 1,
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("g").alias("sl"),
        F.sum(F.col("g") * F.col("g")).alias("sll"),
        F.sum("r2").alias("sr"),
        F.sum(F.col("r2") * F.col("r2")).alias("srr"),
        F.sum(F.col("g") * F.col("r2")).alias("t2"),
    )
    Nd = F.col("N").cast("double")
    e = F.col("sl").cast("double") * F.col("sr") / Nd
    var = (
        (Nd * F.col("sll") - F.col("sl") * F.col("sl"))
        * (Nd * F.col("srr") - F.col("sr") * F.col("sr"))
        / (Nd * Nd * (Nd - 1.0))
    )
    out = agg.withColumn(
        "z_e6",
        F.floor(
            (F.col("t2") - e) / F.sqrt(var) * 1_000_000 + F.lit(_OFF)
        ).cast("long"),
    )
    return out.select(
        "event_type",
        F.col("N").cast("long").alias("n"),
        F.col("t2").cast("long").alias("t2"),
        "z_e6",
    ).orderBy("event_type")


SQL_CUZICK = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(hour(ts) / 6) + 1 AS BIGINT) AS g,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, g,
         count(*) OVER (PARTITION BY event_type ORDER BY v
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         + count(*) OVER (PARTITION BY event_type ORDER BY v
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + 1 AS r2
  FROM ev
), agg AS (
  SELECT event_type,
         count(*) AS N,
         CAST(sum(g) AS BIGINT) AS sl,
         CAST(sum(g * g) AS BIGINT) AS sll,
         CAST(sum(r2) AS BIGINT) AS sr,
         CAST(sum(r2 * r2) AS BIGINT) AS srr,
         CAST(sum(g * r2) AS BIGINT) AS t2
  FROM t GROUP BY 1
)
SELECT event_type,
       CAST(N AS BIGINT) AS n,
       t2,
       CAST(floor(
         (t2 - CAST(sl AS DOUBLE) * sr / N)
         / sqrt((CAST(N AS DOUBLE) * sll - CAST(sl AS DOUBLE) * sl)
                * (CAST(N AS DOUBLE) * srr - CAST(sr AS DOUBLE) * sr)
                / (CAST(N AS DOUBLE) * N * (N - 1.0)))
         * 1000000 + {_OFF}) AS BIGINT) AS z_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# krippendorff_alpha — chance-corrected agreement (nominal, 2 raters)
# ---------------------------------------------------------------------------
# Rater A = the document's recorded lang; rater B = the majority lang of
# the document's source (ties broken lang-ascending) — i.e. "does a
# source-level prior predict the page language".  Krippendorff's alpha
# (nominal) = 1 - Do/De with Do = mismatch/n and De the pooled-marginal
# pairable disagreement ((2n)^2 - sum_c n_c^2) / (2n(2n-1)); Scott's pi
# uses the squared averaged marginals.  Every term is an exact integer
# count until the final ratios.


def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "lang"
    )
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    wm = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("lang").asc()
    )
    major = (
        counts.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("pred"))
    )
    pairs = docs.join(F.broadcast(major), "source").select(
        "doc_id", "lang", "pred"
    )
    matches = pairs.agg(
        F.sum((F.col("lang") == F.col("pred")).cast("long")).alias(
            "n_match"
        )
    )
    # pooled marginals over both raters' values
    pooled = (
        pairs.select(F.col("lang").alias("val"))
        .unionAll(pairs.select(F.col("pred").alias("val")))
        .groupBy("val")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    marg = pooled.agg(
        F.sum("nc").alias("n2"),
        F.sum(F.col("nc") * F.col("nc")).alias("sum_nc2"),
    ).crossJoin(F.broadcast(matches))
    # per-rater marginals for Scott's pi averaged distribution:
    # pe_pi = sum_c ((nA_c + nB_c) / 2n)^2 = sum_nc2 / (2n)^2
    out = marg.select(
        (F.col("n2") / 2).cast("long").alias("n_docs"),
        F.col("n_match").cast("long").alias("n_match"),
        F.col("sum_nc2").cast("long").alias("pooled_sq"),
        F.floor(
            (
                (F.col("n_match").cast("double") * 2 / F.col("n2")
                 - F.col("sum_nc2").cast("double")
                 / (F.col("n2") * F.col("n2")))
                / (1.0 - F.col("sum_nc2").cast("double")
                   / (F.col("n2") * F.col("n2")))
            )
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("scott_pi_e6"),
        F.floor(
            (
                1.0
                - (1.0 - F.col("n_match").cast("double") * 2 / F.col("n2"))
                / (
                    (F.col("n2") * F.col("n2") - F.col("sum_nc2"))
                    .cast("double")
                    / (F.col("n2") * (F.col("n2") - 1))
                )
            )
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("kripp_alpha_e6"),
    )
    return out


SQL_KRIPPENDORFF = f"""
WITH counts AS (
  SELECT source, lang, count(*) AS c
  FROM documents GROUP BY 1, 2
), major AS (
  SELECT source, lang AS pred,
         row_number() OVER (PARTITION BY source
                            ORDER BY c DESC, lang ASC) AS rk
  FROM counts QUALIFY rk = 1
), pairs AS (
  SELECT d.doc_id, d.lang, m.pred
  FROM documents d JOIN major m ON m.source = d.source
), pooled AS (
  SELECT val, count(*) AS nc FROM (
    SELECT lang AS val FROM pairs
    UNION ALL
    SELECT pred AS val FROM pairs
  ) GROUP BY 1
), marg AS (
  SELECT CAST(sum(nc) AS BIGINT) AS n2,
         CAST(sum(nc * nc) AS BIGINT) AS sum_nc2
  FROM pooled
), matches AS (
  SELECT CAST(count(*) AS BIGINT) AS n_match
  FROM pairs WHERE lang = pred
)
SELECT CAST(n2 / 2 AS BIGINT) AS n_docs,
       n_match,
       sum_nc2 AS pooled_sq,
       CAST(floor((
         (CAST(n_match AS DOUBLE) * 2 / n2
          - CAST(sum_nc2 AS DOUBLE) / (n2 * n2))
         / (1.0 - CAST(sum_nc2 AS DOUBLE) / (n2 * n2))
       ) * 1000000 + {_OFF}) AS BIGINT) AS scott_pi_e6,
       CAST(floor((
         1.0 - (1.0 - CAST(n_match AS DOUBLE) * 2 / n2)
               / (CAST(n2 * n2 - sum_nc2 AS DOUBLE) / (n2 * (n2 - 1)))
       ) * 1000000 + {_OFF}) AS BIGINT) AS kripp_alpha_e6
FROM marg, matches
"""


# ---------------------------------------------------------------------------
# gk_tau — Goodman-Kruskal tau (PRE association, both directions)
# ---------------------------------------------------------------------------
# Completes the Goodman-Kruskal family (gamma and lambda are in
# queries_stats10): tau_{Y|X} = (sum_ij n_ij^2/n_i. - sum_j n_.j^2/n)
# / (n - sum_j n_.j^2/n), the proportional reduction in Gini variation
# when predicting Y from X.  X = event_type, Y = the 6-hour diel bucket.
# Each rational term is e6-floored per conditioning cell before the
# cross-cell sum, so both engines aggregate exact integers.


def q_gk_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("x"),
        F.floor(F.hour("ts") / 6).cast("long").alias("y"),
    )
    cell = ev.groupBy("x", "y").agg(F.count(F.lit(1)).alias("nij"))
    rowm = cell.groupBy("x").agg(F.sum("nij").alias("ni"))
    colm = cell.groupBy("y").agg(F.sum("nij").alias("nj"))
    n = cell.agg(F.sum("nij").alias("n"))
    # per-row conditional concentration, e6-floored per conditioning cell
    yx = (
        cell.join(rowm, "x")
        .groupBy("x")
        .agg(
            F.max("ni").alias("ni"),
            F.sum(F.col("nij") * F.col("nij")).alias("s2"),
        )
        .select(
            F.floor(
                F.col("s2") * F.lit(1_000_000.0) / F.col("ni") + F.lit(_OFF)
            )
            .cast("long")
            .alias("t_e6")
        )
        .agg(F.sum("t_e6").alias("syx_e6"))
    )
    xy = (
        cell.join(colm, "y")
        .groupBy("y")
        .agg(
            F.max("nj").alias("nj"),
            F.sum(F.col("nij") * F.col("nij")).alias("s2"),
        )
        .select(
            F.floor(
                F.col("s2") * F.lit(1_000_000.0) / F.col("nj") + F.lit(_OFF)
            )
            .cast("long")
            .alias("t_e6")
        )
        .agg(F.sum("t_e6").alias("sxy_e6"))
    )
    margy = colm.agg(F.sum(F.col("nj") * F.col("nj")).alias("sy2"))
    margx = rowm.agg(F.sum(F.col("ni") * F.col("ni")).alias("sx2"))
    out = (
        yx.crossJoin(xy)
        .crossJoin(margy)
        .crossJoin(margx)
        .crossJoin(n)
    )
    nd = F.col("n").cast("double")
    base_y = F.col("sy2").cast("double") / nd
    base_x = F.col("sx2").cast("double") / nd
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.floor(
            (F.col("syx_e6") / 1e6 - base_y) / (nd - base_y) * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("tau_yx_e6"),
        F.floor(
            (F.col("sxy_e6") / 1e6 - base_x) / (nd - base_x) * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("tau_xy_e6"),
    )


SQL_GK_TAU = f"""
WITH ev AS (
  SELECT event_type AS x,
         CAST(floor(hour(ts) / 6) AS BIGINT) AS y
  FROM events
), cell AS (
  SELECT x, y, count(*) AS nij FROM ev GROUP BY 1, 2
), rowm AS (
  SELECT x, CAST(sum(nij) AS BIGINT) AS ni FROM cell GROUP BY 1
), colm AS (
  SELECT y, CAST(sum(nij) AS BIGINT) AS nj FROM cell GROUP BY 1
), tot AS (
  SELECT CAST(sum(nij) AS BIGINT) AS n FROM cell
), yx AS (
  SELECT CAST(sum(t_e6) AS BIGINT) AS syx_e6 FROM (
    SELECT CAST(floor(CAST(sum(c.nij * c.nij) AS BIGINT) * 1000000.0
                      / max(r.ni) + {_OFF}) AS BIGINT) AS t_e6
    FROM cell c JOIN rowm r ON r.x = c.x GROUP BY c.x
  )
), xy AS (
  SELECT CAST(sum(t_e6) AS BIGINT) AS sxy_e6 FROM (
    SELECT CAST(floor(CAST(sum(c.nij * c.nij) AS BIGINT) * 1000000.0
                      / max(m.nj) + {_OFF}) AS BIGINT) AS t_e6
    FROM cell c JOIN colm m ON m.y = c.y GROUP BY c.y
  )
), margs AS (
  SELECT CAST(sum(nj * nj) AS BIGINT) AS sy2 FROM colm
), margsx AS (
  SELECT CAST(sum(ni * ni) AS BIGINT) AS sx2 FROM rowm
)
SELECT n,
       CAST(floor((syx_e6 / 1e6 - CAST(sy2 AS DOUBLE) / n)
                  / (CAST(n AS DOUBLE) - CAST(sy2 AS DOUBLE) / n)
                  * 1000000 + {_OFF}) AS BIGINT) AS tau_yx_e6,
       CAST(floor((sxy_e6 / 1e6 - CAST(sx2 AS DOUBLE) / n)
                  / (CAST(n AS DOUBLE) - CAST(sx2 AS DOUBLE) / n)
                  * 1000000 + {_OFF}) AS BIGINT) AS tau_xy_e6
FROM yx, xy, margs, margsx, tot
"""


QUERIES.update(
    {
        "lepage_test": q_lepage_test,
        "cuzick_trend": q_cuzick_trend,
        "krippendorff_alpha": q_krippendorff_alpha,
        "gk_tau": q_gk_tau,
    }
)

ORACLE_SQL.update(
    {
        "lepage_test": SQL_LEPAGE,
        "cuzick_trend": SQL_CUZICK,
        "krippendorff_alpha": SQL_KRIPPENDORFF,
        "gk_tau": SQL_GK_TAU,
    }
)


# ---------------------------------------------------------------------------
# phillips_perron — PP unit-root Z_t with Bartlett long-run variance
# ---------------------------------------------------------------------------
# Hourly mean centi-values per event_type (observation-order series);
# OLS y_t = a + rho*y_{t-1} + u_t from exact integer sums, then
# Hamilton (1994, 17.6.8): Z_t = sqrt(g0/l2)*t_rho - (l2 - g0) * n *
# se(rho) / (2 * sqrt(l2) * s) with l2 the Bartlett(4) long-run
# variance of u.  Residuals are deterministic doubles (coefficients
# come from identical integer sums in both engines); each residual and
# lag product is e2-floored before the cross-row autocovariance sums.


_PP_L = 4


def q_phillips_perron(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    hourly = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("v") * F.lit(100.0) / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )
    wt = Window.partitionBy("event_type").orderBy("hr")
    t = hourly.withColumn("x", F.lag("y").over(wt)).filter(
        F.col("x").isNotNull()
    )
    ols = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    rho = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    ols = ols.withColumn("rho", rho).withColumn(
        "alpha", (F.col("sy") - F.col("rho") * F.col("sx")) / nd
    )
    r = t.join(F.broadcast(ols.select("event_type", "rho", "alpha")),
               "event_type").withColumn(
        "ui",
        F.floor(
            (F.col("y") - F.col("alpha") - F.col("rho") * F.col("x"))
            * 100
            + F.lit(_OFF)
        ).cast("long"),
    )
    lag_cols = [
        F.lag("ui", j).over(wt).alias(f"u{j}") for j in range(1, _PP_L + 1)
    ]
    r = r.select("event_type", "hr", "ui", *lag_cols)
    gam = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ui") * F.col("ui")).alias("g0s"),
        *[
            F.sum(F.col("ui") * F.col(f"u{j}")).alias(f"g{j}s")
            for j in range(1, _PP_L + 1)
        ],
    )
    nd2 = F.col("n").cast("double")
    g0 = F.col("g0s").cast("double") / 1e4 / nd2
    l2 = g0
    for j in range(1, _PP_L + 1):
        w = 1.0 - j / (_PP_L + 1.0)
        l2 = l2 + 2.0 * w * (
            F.coalesce(F.col(f"g{j}s"), F.lit(0)).cast("double")
            / 1e4
            / nd2
        )
    stats = gam.select("event_type", F.col("n").alias("n_res"),
                       g0.alias("g0"), l2.alias("l2"))
    out = (
        ols.join(stats, "event_type")
        .withColumn(
            "sxx_c",
            (nd * F.col("sxx") - F.col("sx") * F.col("sx")) / nd,
        )
        .withColumn(
            "s2", F.col("g0") * nd / (nd - 2.0)
        )
        .withColumn(
            "se", F.sqrt(F.col("s2") / F.col("sxx_c"))
        )
        .withColumn(
            "t_rho", (F.col("rho") - 1.0) / F.col("se")
        )
        .withColumn(
            "zt",
            F.sqrt(F.col("g0") / F.col("l2")) * F.col("t_rho")
            - (F.col("l2") - F.col("g0"))
            * nd
            * F.col("se")
            / (2.0 * F.sqrt(F.col("l2")) * F.sqrt(F.col("s2"))),
        )
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("rho") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("rho_e6"),
        F.floor(F.col("t_rho") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("t_e6"),
        F.floor(F.col("zt") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("zt_e6"),
    ).orderBy("event_type")


SQL_PP = f"""
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), hourly AS (
  SELECT event_type, hr,
         CAST(floor(CAST(sum(v) AS BIGINT) * 100.0 / count(*) + {_OFF})
              AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), t AS (
  SELECT event_type, hr, y,
         lag(y) OVER (PARTITION BY event_type ORDER BY hr) AS x
  FROM hourly QUALIFY x IS NOT NULL
), ols AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM t GROUP BY 1
), coef AS (
  SELECT *,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS rho,
         (sy - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               * sx) / CAST(n AS DOUBLE) AS alpha
  FROM ols
), res AS (
  SELECT t.event_type, t.hr,
         CAST(floor((t.y - c.alpha - c.rho * t.x) * 100 + {_OFF})
              AS BIGINT) AS ui
  FROM t JOIN coef c ON c.event_type = t.event_type
), lags AS (
  SELECT event_type, ui,
         lag(ui, 1) OVER w AS u1, lag(ui, 2) OVER w AS u2,
         lag(ui, 3) OVER w AS u3, lag(ui, 4) OVER w AS u4
  FROM res WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), gam AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(ui * ui) AS BIGINT) AS g0s,
         CAST(sum(ui * u1) AS BIGINT) AS g1s,
         CAST(sum(ui * u2) AS BIGINT) AS g2s,
         CAST(sum(ui * u3) AS BIGINT) AS g3s,
         CAST(sum(ui * u4) AS BIGINT) AS g4s
  FROM lags GROUP BY 1
), st AS (
  SELECT c.event_type, c.n, c.rho, c.sx, c.sxx,
         CAST(g.g0s AS DOUBLE) / 1e4 / g.n AS g0,
         CAST(g.g0s AS DOUBLE) / 1e4 / g.n
         + 2.0 * 0.8 * (COALESCE(g.g1s, 0) / 1e4 / g.n)
         + 2.0 * 0.6 * (COALESCE(g.g2s, 0) / 1e4 / g.n)
         + 2.0 * 0.4 * (COALESCE(g.g3s, 0) / 1e4 / g.n)
         + 2.0 * 0.2 * (COALESCE(g.g4s, 0) / 1e4 / g.n) AS l2
  FROM coef c JOIN gam g ON g.event_type = c.event_type
), fin AS (
  SELECT *,
         (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           / CAST(n AS DOUBLE) AS sxx_c,
         g0 * n / (n - 2.0) AS s2
  FROM st
), fin2 AS (
  SELECT *,
         sqrt(s2 / sxx_c) AS se,
         (rho - 1.0) / sqrt(s2 / sxx_c) AS t_rho
  FROM fin
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(rho * 1000000 + {_OFF}) AS BIGINT) AS rho_e6,
       CAST(floor(t_rho * 1000000 + {_OFF}) AS BIGINT) AS t_e6,
       CAST(floor((sqrt(g0 / l2) * t_rho
                   - (l2 - g0) * n * se / (2.0 * sqrt(l2) * sqrt(s2)))
                  * 1000000 + {_OFF}) AS BIGINT) AS zt_e6
FROM fin2
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# mcleod_li — Ljung-Box portmanteau on squared deviations (ARCH check)
# ---------------------------------------------------------------------------
# McLeod & Li (J. Time Series Anal. 1983): the Ljung-Box Q statistic
# applied to z_t = (v_t - vbar)^2 detects conditional heteroscedasticity
# that the plain ACF misses.  z_t is floored to whole value^2 units
# (exact per row — vbar is the ratio of integer sums), lagged products
# are exact BIGINTs, and Q = n(n+2) sum_k r_k^2/(n-k) over lags 1..5.


_ML_L = 5


def q_mcleod_li(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wn = Window.partitionBy("event_type")
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = ev.withColumn(
        "z",
        F.floor(
            F.pow(
                F.col("v")
                - F.sum("v").over(wn).cast("double")
                / F.count(F.lit(1)).over(wn),
                2,
            )
            / 1e4
            + F.lit(_OFF)
        ).cast("long"),
    )
    # center z by its own mean via the numerator trick: work with
    # d_t = n*z_t - Sz (exact BIGINT), so c_k = sum d_t d_{t-k} / n^2.
    t = t.withColumn(
        "d",
        F.count(F.lit(1)).over(wn) * F.col("z") - F.sum("z").over(wn),
    )
    lag_cols = [
        F.lag("d", k).over(wt).alias(f"d{k}") for k in range(1, _ML_L + 1)
    ]
    t = t.select("event_type", "d", *lag_cols)
    # d up to ~2000*2.4e5 = 5e8; d*d up to 2.5e17 — sum in DOUBLE after
    # per-row e-9 downscale to keep both engines in exact-int range.
    dcols = [(F.col("d").cast("double") * F.col(f"d{k}")).alias(f"p{k}")
             for k in range(1, _ML_L + 1)]
    t = t.select(
        "event_type",
        F.floor(F.col("d").cast("double") * F.col("d") / 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("p0"),
        *[
            F.floor(p / 1e9 + F.lit(_OFF)).cast("long").alias(f"p{k}")
            for k, p in zip(range(1, _ML_L + 1), dcols)
        ],
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p0").alias("c0"),
        *[F.sum(f"p{k}").alias(f"c{k}") for k in range(1, _ML_L + 1)],
    )
    nd = F.col("n").cast("double")
    q = F.lit(0.0)
    for k in range(1, _ML_L + 1):
        rk = F.coalesce(F.col(f"c{k}"), F.lit(0)).cast("double") / F.col(
            "c0"
        )
        q = q + rk * rk / (nd - k)
    q = nd * (nd + 2.0) * q
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("c0").cast("long").alias("c0_e9"),
        F.floor(q * 1_000_000 + F.lit(_OFF)).cast("long").alias("q_e6"),
    ).orderBy("event_type")


SQL_MCLEOD = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), z AS (
  SELECT event_type, event_id, ts,
         CAST(floor(pow(v - CAST(sum(v) OVER w AS DOUBLE)
                            / count(*) OVER w, 2) / 1e4 + {_OFF})
              AS BIGINT) AS z,
         count(*) OVER w AS n
  FROM ev WINDOW w AS (PARTITION BY event_type)
), d AS (
  SELECT event_type, event_id, ts,
         n * z - CAST(sum(z) OVER (PARTITION BY event_type) AS BIGINT)
           AS d
  FROM z
), lags AS (
  SELECT event_type, d,
         lag(d, 1) OVER w AS d1, lag(d, 2) OVER w AS d2,
         lag(d, 3) OVER w AS d3, lag(d, 4) OVER w AS d4,
         lag(d, 5) OVER w AS d5
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), fl AS (
  SELECT event_type,
         CAST(floor(CAST(d AS DOUBLE) * d / 1e9 + {_OFF}) AS BIGINT)
           AS p0,
         CAST(floor(CAST(d AS DOUBLE) * d1 / 1e9 + {_OFF}) AS BIGINT)
           AS p1,
         CAST(floor(CAST(d AS DOUBLE) * d2 / 1e9 + {_OFF}) AS BIGINT)
           AS p2,
         CAST(floor(CAST(d AS DOUBLE) * d3 / 1e9 + {_OFF}) AS BIGINT)
           AS p3,
         CAST(floor(CAST(d AS DOUBLE) * d4 / 1e9 + {_OFF}) AS BIGINT)
           AS p4,
         CAST(floor(CAST(d AS DOUBLE) * d5 / 1e9 + {_OFF}) AS BIGINT)
           AS p5
  FROM lags
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(p0) AS BIGINT) AS c0,
         CAST(sum(p1) AS BIGINT) AS c1,
         CAST(sum(p2) AS BIGINT) AS c2,
         CAST(sum(p3) AS BIGINT) AS c3,
         CAST(sum(p4) AS BIGINT) AS c4,
         CAST(sum(p5) AS BIGINT) AS c5
  FROM fl GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       c0 AS c0_e9,
       CAST(floor(CAST(n AS DOUBLE) * (n + 2.0) * (
           pow(CAST(COALESCE(c1, 0) AS DOUBLE) / c0, 2) / (n - 1)
         + pow(CAST(COALESCE(c2, 0) AS DOUBLE) / c0, 2) / (n - 2)
         + pow(CAST(COALESCE(c3, 0) AS DOUBLE) / c0, 2) / (n - 3)
         + pow(CAST(COALESCE(c4, 0) AS DOUBLE) / c0, 2) / (n - 4)
         + pow(CAST(COALESCE(c5, 0) AS DOUBLE) / c0, 2) / (n - 5)
       ) * 1000000 + {_OFF}) AS BIGINT) AS q_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# conover_scale — Conover squared-ranks test for equality of scale
# ---------------------------------------------------------------------------
# Conover (Practical Nonparametric Statistics): rank |v - median_g| over
# the pooled sample, score a = rank^2, T = sum of group-1 scores; with
# doubled midranks and the tie-robust linear-rank moments E = m*Sa/N,
# Var = m*n*(N*Saa - Sa^2)/(N^2 (N-1)).  Group medians are exact order
# statistics kept integral via the doubled-median trick (med2 = the two
# middle centi-values summed; odd n hits the same row twice).


def q_conover_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.dayofweek("ts").isin(1, 7).cast("int").alias("g1"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wg = Window.partitionBy("event_type", "g1").orderBy("v", "event_id")
    wgn = Window.partitionBy("event_type", "g1")
    t = ev.withColumn("rn", F.row_number().over(wg)).withColumn(
        "ng", F.count(F.lit(1)).over(wgn)
    )
    med = (
        t.withColumn(
            "pick",
            (F.col("rn") == F.floor((F.col("ng") + 1) / 2)).cast("int")
            + (F.col("rn") == F.floor((F.col("ng") + 2) / 2)).cast("int"),
        )
        .groupBy("event_type", "g1")
        .agg(F.sum(F.col("pick") * F.col("v")).alias("med2"))
    )
    dev = ev.join(F.broadcast(med), ["event_type", "g1"]).withColumn(
        "dv", F.abs(2 * F.col("v") - F.col("med2"))
    )
    wlt = (
        Window.partitionBy("event_type")
        .orderBy("dv")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wle = (
        Window.partitionBy("event_type")
        .orderBy("dv")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t2 = dev.withColumn(
        "r2",
        F.count(F.lit(1)).over(wlt) + F.count(F.lit(1)).over(wle) + 1,
    ).withColumn("a", F.col("r2") * F.col("r2"))
    agg = t2.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("g1").alias("m"),
        F.sum("a").alias("sa"),
        F.sum(F.col("a").cast("double") * F.col("a")).alias("saa"),
        F.sum(F.col("g1") * F.col("a")).alias("t_stat"),
    )
    Nd = F.col("N").cast("double")
    md = F.col("m").cast("double")
    nd = (F.col("N") - F.col("m")).cast("double")
    e = md * F.col("sa") / Nd
    var = (
        md
        * nd
        * (Nd * F.col("saa") - F.col("sa").cast("double") * F.col("sa"))
        / (Nd * Nd * (Nd - 1.0))
    )
    out = agg.withColumn(
        "z_e6",
        F.floor(
            (F.col("t_stat") - e) / F.sqrt(var) * 1_000_000 + F.lit(_OFF)
        ).cast("long"),
    )
    return out.select(
        "event_type",
        F.col("m").cast("long").alias("m_weekend"),
        (F.col("N") - F.col("m")).cast("long").alias("n_weekday"),
        F.col("t_stat").cast("long").alias("t_scores"),
        "z_e6",
    ).orderBy("event_type")


SQL_CONOVER = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS g1,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), rn AS (
  SELECT event_type, event_id, g1, v,
         row_number() OVER (PARTITION BY event_type, g1
                            ORDER BY v, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type, g1) AS ng
  FROM ev
), med AS (
  SELECT event_type, g1,
         CAST(sum((CASE WHEN rn = floor((ng + 1) / 2) THEN 1 ELSE 0 END
                   + CASE WHEN rn = floor((ng + 2) / 2) THEN 1 ELSE 0 END)
                  * v) AS BIGINT) AS med2
  FROM rn GROUP BY 1, 2
), dev AS (
  SELECT e.event_type, e.g1, abs(2 * e.v - m.med2) AS dv
  FROM ev e JOIN med m ON m.event_type = e.event_type AND m.g1 = e.g1
), t2 AS (
  SELECT event_type, g1,
         count(*) OVER (PARTITION BY event_type ORDER BY dv
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         + count(*) OVER (PARTITION BY event_type ORDER BY dv
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + 1 AS r2
  FROM dev
), sc AS (
  SELECT event_type, g1, r2 * r2 AS a FROM t2
), agg AS (
  SELECT event_type, count(*) AS N,
         CAST(sum(g1) AS BIGINT) AS m,
         CAST(sum(a) AS BIGINT) AS sa,
         sum(CAST(a AS DOUBLE) * a) AS saa,
         CAST(sum(g1 * a) AS BIGINT) AS t_stat
  FROM sc GROUP BY 1
)
SELECT event_type,
       m AS m_weekend,
       CAST(N - m AS BIGINT) AS n_weekday,
       t_stat AS t_scores,
       CAST(floor(
         (t_stat - CAST(m AS DOUBLE) * sa / N)
         / sqrt(CAST(m AS DOUBLE) * (N - m)
                * (CAST(N AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
                / (CAST(N AS DOUBLE) * N * (N - 1.0)))
         * 1000000 + {_OFF}) AS BIGINT) AS z_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# quade_test — weighted blocked rank ANOVA (Quade 1979)
# ---------------------------------------------------------------------------
# Friedman's sibling that weights blocks by their range: blocks = days
# with all k event_types present, treatments = event_types, values =
# e2-floored daily means.  Doubled within-block midranks r2 and doubled
# cross-block range midranks q2 make S'_ij = q2*(r2-(k+1)) an exact
# integer (4x the textbook S_ij — the scale cancels in F).  F =
# (b-1)*B' / (A'-B') with A' = sum S'^2, B' = sum_j S'_j^2 / b, both
# exact, so F = (b-1)*SB / (b*A' - SB) with SB = sum_j S'_j^2.


def q_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.floor(
            F.sum("v") * F.lit(100.0) / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("m")
    )
    k = daily.select("event_type").distinct().count()
    full = (
        daily.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("kk"),
            F.max("m").alias("mx"),
            F.min("m").alias("mn"),
        )
        .filter(F.col("kk") == k)
        .select("day", (F.col("mx") - F.col("mn")).alias("rng"))
    )
    blocks = daily.join(F.broadcast(full), "day")
    # doubled midranks of m within each block
    wlt = (
        Window.partitionBy("day")
        .orderBy("m")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wle = (
        Window.partitionBy("day")
        .orderBy("m")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocks = blocks.withColumn(
        "r2",
        F.count(F.lit(1)).over(wlt) + F.count(F.lit(1)).over(wle) + 1,
    )
    # doubled midranks of block ranges across blocks (rank the distinct
    # day rows, then join back)
    days = full.select("day", "rng")
    wqlt = Window.orderBy("rng").rangeBetween(Window.unboundedPreceding, -1)
    wqle = Window.orderBy("rng").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    days = days.withColumn(
        "q2",
        F.count(F.lit(1)).over(wqlt) + F.count(F.lit(1)).over(wqle) + 1,
    )
    t = blocks.join(F.broadcast(days.select("day", "q2")), "day").withColumn(
        "s", F.col("q2") * (F.col("r2") - (k + 1))
    )
    per_j = t.groupBy("event_type").agg(
        F.sum("s").alias("sj"),
        F.sum(F.col("s") * F.col("s")).alias("aj"),
        F.count(F.lit(1)).alias("b"),
    )
    tot = per_j.agg(
        F.max("b").alias("b"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("sj") * F.col("sj")).alias("sb"),
        F.sum("aj").alias("aa"),
    )
    bd = F.col("b").cast("double")
    f = (
        (bd - 1.0)
        * F.col("sb").cast("double")
        / (bd * F.col("aa") - F.col("sb"))
    )
    return tot.select(
        F.col("b").cast("long").alias("n_blocks"),
        F.col("k").cast("long").alias("k_treat"),
        F.col("sb").cast("long").alias("sb"),
        F.col("aa").cast("long").alias("a_tot"),
        F.floor(f * 1_000_000 + F.lit(_OFF)).cast("long").alias("f_e6"),
    )


SQL_QUADE = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), daily AS (
  SELECT day, event_type,
         CAST(floor(CAST(sum(v) AS BIGINT) * 100.0 / count(*) + {_OFF})
              AS BIGINT) AS m
  FROM ev GROUP BY 1, 2
), kk AS (
  SELECT count(DISTINCT event_type) AS k FROM daily
), full_blocks AS (
  SELECT day, max(m) - min(m) AS rng
  FROM daily GROUP BY 1
  HAVING count(*) = (SELECT k FROM kk)
), ranked AS (
  SELECT d.day, d.event_type, d.m, f.rng,
         count(*) OVER (PARTITION BY d.day ORDER BY d.m
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         + count(*) OVER (PARTITION BY d.day ORDER BY d.m
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + 1 AS r2
  FROM daily d JOIN full_blocks f ON f.day = d.day
), qr AS (
  SELECT day,
         count(*) OVER (ORDER BY rng
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         + count(*) OVER (ORDER BY rng
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + 1 AS q2
  FROM full_blocks
), s AS (
  SELECT r.event_type,
         q.q2 * (r.r2 - ((SELECT k FROM kk) + 1)) AS s
  FROM ranked r JOIN qr q ON q.day = r.day
), per_j AS (
  SELECT event_type,
         CAST(sum(s) AS BIGINT) AS sj,
         CAST(sum(s * s) AS BIGINT) AS aj,
         count(*) AS b
  FROM s GROUP BY 1
), tot AS (
  SELECT CAST(max(b) AS BIGINT) AS b,
         count(*) AS k,
         CAST(sum(sj * sj) AS BIGINT) AS sb,
         CAST(sum(aj) AS BIGINT) AS aa
  FROM per_j
)
SELECT b AS n_blocks,
       CAST(k AS BIGINT) AS k_treat,
       sb,
       aa AS a_tot,
       CAST(floor((CAST(b AS DOUBLE) - 1.0) * sb
                  / (CAST(b AS DOUBLE) * aa - sb)
                  * 1000000 + {_OFF}) AS BIGINT) AS f_e6
FROM tot
"""


QUERIES.update(
    {
        "phillips_perron": q_phillips_perron,
        "mcleod_li": q_mcleod_li,
        "conover_scale": q_conover_scale,
        "quade_test": q_quade_test,
    }
)

ORACLE_SQL.update(
    {
        "phillips_perron": SQL_PP,
        "mcleod_li": SQL_MCLEOD,
        "conover_scale": SQL_CONOVER,
        "quade_test": SQL_QUADE,
    }
)


# ---------------------------------------------------------------------------
# jaro_winkler_dedup — JW-similarity verify stage, kernel vs native
# ---------------------------------------------------------------------------
# Same blocked-pair shape as title_edit_dedup (lang x 64-char length
# band, 40-char title prefixes), but scored with Jaro-Winkler (Winkler,
# ASA Proc. 1990): prefix bonus up to 4 chars at scale 0.1, applied
# only when jaro > 0.7 (the boost threshold DuckDB's native
# jaro_winkler_similarity uses — verified empirically on
# discriminating cases, e.g. 'abcdxxxxxx' vs 'abcdyyyyyyyyyy' =
# 0.5619 not 0.7371).  The Spark side is an independent Arrow-batched
# pandas_udf kernel (string DP has no vectorized form; the per-pair
# loop is inside the Arrow batch, never per-row Python at the plan
# level), making this a true cross-implementation differential.


def _jaro_winkler_py(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = 0 if i < md else i - md
        hi = min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3
    if jaro <= 0.7:
        return jaro
    p = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        p += 1
    return jaro + p * 0.1 * (1 - jaro)


def q_jaro_winkler_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def _jw(pa: pd.Series, pb: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler_py(a, b) for a, b in zip(pa, pb)],
            dtype="float64",
        )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 64).cast("long").alias("band"),
        F.substring(F.trim("text"), 1, 40).alias("title"),
    )
    b = d.select(
        F.col("lang").alias("lang_r"),
        F.col("band").alias("band_r"),
        F.col("doc_id").alias("doc_r"),
        F.col("title").alias("title_r"),
    )
    pairs = d.join(
        b,
        (F.col("lang") == F.col("lang_r"))
        & (F.col("band") == F.col("band_r"))
        & (F.col("doc_id") < F.col("doc_r")),
    ).select(
        "lang",
        "band",
        F.floor(_jw(F.col("title"), F.col("title_r")) * 1_000_000
                + F.lit(_OFF)).cast("long").alias("jw6"),
    )
    agg = pairs.groupBy("lang", "band").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max("jw6").alias("max_jw_e6"),
        F.sum("jw6").alias("s6"),
        F.sum(F.when(F.col("jw6") >= 850_000, 1).otherwise(0)).alias(
            "n_sim"
        ),
    )
    return agg.select(
        "lang",
        "band",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("max_jw_e6").cast("long").alias("max_jw_e6"),
        F.floor(
            F.col("s6").cast("double") / F.col("n_pairs") + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_jw_e6"),
        F.col("n_sim").cast("long").alias("n_sim"),
    ).orderBy("lang", "band")


SQL_JARO = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(floor(n_chars / 64.0) AS BIGINT) AS band,
         substr(trim(text), 1, 40) AS title
  FROM documents
), pairs AS (
  SELECT a.lang, a.band,
         CAST(floor(jaro_winkler_similarity(a.title, b.title) * 1000000
                    + {_OFF}) AS BIGINT) AS jw6
  FROM d a JOIN d b
    ON b.lang = a.lang AND b.band = a.band AND a.doc_id < b.doc_id
)
SELECT lang, band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(max(jw6) AS BIGINT) AS max_jw_e6,
       CAST(floor(CAST(sum(jw6) AS DOUBLE) / count(*) + {_OFF})
            AS BIGINT) AS mean_jw_e6,
       CAST(sum(CASE WHEN jw6 >= 850000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sim
FROM pairs
GROUP BY 1, 2
ORDER BY lang, band
"""


# ---------------------------------------------------------------------------
# stuart_maxwell — marginal homogeneity of modal activity (k = 3)
# ---------------------------------------------------------------------------
# Stuart (Biometrika 1955) / Maxwell (1970): did users' modal activity
# bucket (browse = click/view, convert = purchase/signup, error) shift
# between the first half of the month and the second?  The k=3 test has
# the closed form chi2 = (S22 d1^2 + S11 d2^2 - 2 S12 d1 d2) /
# (S11 S22 - S12^2) with d_h = row_h - col_h marginal gaps and
# S_hh = row_h + col_h - 2 n_hh, S_12 = -(n_12 + n_21) over categories
# {1, 2} — every term an exact BIGINT from the paired contingency.


def q_stuart_maxwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        (F.dayofmonth("ts") <= 15).cast("int").alias("h1"),
        F.when(F.col("event_type").isin("click", "view"), "browse")
        .when(F.col("event_type").isin("purchase", "signup"), "convert")
        .otherwise("error")
        .alias("bucket"),
    )
    cnt = ev.groupBy("user_id", "h1", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    wm = Window.partitionBy("user_id", "h1").orderBy(
        F.col("c").desc(), F.col("bucket").asc()
    )
    modal = (
        cnt.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("user_id", "h1", "bucket")
    )
    paired = (
        modal.filter(F.col("h1") == 1)
        .select("user_id", F.col("bucket").alias("b1"))
        .join(
            modal.filter(F.col("h1") == 0).select(
                "user_id", F.col("bucket").alias("b2")
            ),
            "user_id",
        )
    )
    cell = paired.groupBy("b1", "b2").agg(F.count(F.lit(1)).alias("n"))

    def pick(b1, b2):
        return F.sum(
            F.when((F.col("b1") == b1) & (F.col("b2") == b2), F.col("n"))
            .otherwise(F.lit(0))
        )

    cats = ["browse", "convert", "error"]
    flat = cell.agg(
        *[
            pick(a, b).alias(f"n{i}{j}")
            for i, a in enumerate(cats, 1)
            for j, b in enumerate(cats, 1)
        ]
    )
    r1 = F.col("n11") + F.col("n12") + F.col("n13")
    r2 = F.col("n21") + F.col("n22") + F.col("n23")
    c1 = F.col("n11") + F.col("n21") + F.col("n31")
    c2 = F.col("n12") + F.col("n22") + F.col("n32")
    d1 = r1 - c1
    d2 = r2 - c2
    s11 = r1 + c1 - 2 * F.col("n11")
    s22 = r2 + c2 - 2 * F.col("n22")
    s12 = -(F.col("n12") + F.col("n21"))
    num = s22 * d1 * d1 + s11 * d2 * d2 - 2 * s12 * d1 * d2
    den = s11 * s22 - s12 * s12
    return flat.select(
        (r1 + r2 + F.col("n31") + F.col("n32") + F.col("n33")).cast(
            "long"
        ).alias("n_users"),
        d1.cast("long").alias("d_browse"),
        d2.cast("long").alias("d_convert"),
        # degenerate guard (sf0.001 sweep): a singular 2x2 covariance
        # (all off-diagonal movement in one direction, or no movement)
        # leaves the statistic undefined -> NULL in both engines
        F.when(
            den != 0,
            F.floor(
                num.cast("double") / den * 1_000_000 + F.lit(_OFF)
            ).cast("long"),
        ).alias("chi2_e6"),
    )


SQL_STUART = f"""
WITH ev AS (
  SELECT user_id,
         CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS h1,
         CASE WHEN event_type IN ('click', 'view') THEN 'browse'
              WHEN event_type IN ('purchase', 'signup') THEN 'convert'
              ELSE 'error' END AS bucket
  FROM events
), cnt AS (
  SELECT user_id, h1, bucket, count(*) AS c
  FROM ev GROUP BY 1, 2, 3
), modal AS (
  SELECT user_id, h1, bucket,
         row_number() OVER (PARTITION BY user_id, h1
                            ORDER BY c DESC, bucket ASC) AS rk
  FROM cnt QUALIFY rk = 1
), paired AS (
  SELECT a.user_id, a.bucket AS b1, b.bucket AS b2
  FROM modal a JOIN modal b
    ON b.user_id = a.user_id AND a.h1 = 1 AND b.h1 = 0
), flat AS (
  SELECT
    CAST(sum(CASE WHEN b1 = 'browse' AND b2 = 'browse' THEN 1 ELSE 0 END) AS BIGINT) AS n11,
    CAST(sum(CASE WHEN b1 = 'browse' AND b2 = 'convert' THEN 1 ELSE 0 END) AS BIGINT) AS n12,
    CAST(sum(CASE WHEN b1 = 'browse' AND b2 = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n13,
    CAST(sum(CASE WHEN b1 = 'convert' AND b2 = 'browse' THEN 1 ELSE 0 END) AS BIGINT) AS n21,
    CAST(sum(CASE WHEN b1 = 'convert' AND b2 = 'convert' THEN 1 ELSE 0 END) AS BIGINT) AS n22,
    CAST(sum(CASE WHEN b1 = 'convert' AND b2 = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n23,
    CAST(sum(CASE WHEN b1 = 'error' AND b2 = 'browse' THEN 1 ELSE 0 END) AS BIGINT) AS n31,
    CAST(sum(CASE WHEN b1 = 'error' AND b2 = 'convert' THEN 1 ELSE 0 END) AS BIGINT) AS n32,
    CAST(sum(CASE WHEN b1 = 'error' AND b2 = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n33
  FROM paired
), terms AS (
  SELECT n11 + n12 + n13 + n21 + n22 + n23 + n31 + n32 + n33 AS n_users,
         (n11 + n12 + n13) - (n11 + n21 + n31) AS d1,
         (n21 + n22 + n23) - (n12 + n22 + n32) AS d2,
         (n11 + n12 + n13) + (n11 + n21 + n31) - 2 * n11 AS s11,
         (n21 + n22 + n23) + (n12 + n22 + n32) - 2 * n22 AS s22,
         -(n12 + n21) AS s12
  FROM flat
)
SELECT CAST(n_users AS BIGINT) AS n_users,
       CAST(d1 AS BIGINT) AS d_browse,
       CAST(d2 AS BIGINT) AS d_convert,
       CAST(CASE WHEN s11 * s22 - s12 * s12 = 0 THEN NULL
            ELSE floor(CAST(s22 * d1 * d1 + s11 * d2 * d2
                            - 2 * s12 * d1 * d2 AS DOUBLE)
                       / (s11 * s22 - s12 * s12) * 1000000 + {_OFF})
            END AS BIGINT) AS chi2_e6
FROM terms
"""


# ---------------------------------------------------------------------------
# fleming_harrington — FH(1,0) weighted log-rank on user lifetimes
# ---------------------------------------------------------------------------
# Harrington & Fleming (Biometrika 1982): the log-rank chain of
# logrank_test (same day-vs-night first-event groups, same lifetime
# clock) with per-time weight w_t = S(t-), the Kaplan-Meier left limit
# — emphasizing EARLY lifetime differences.  S(t-) = exp(cumsum over
# s < t of ln(1 - d/n)) via an ordered strictly-prior window (ordered
# cumulative sums are deterministic in both engines); weighted O-E and
# V terms are e9-floored per t before summing.


def q_fleming_harrington(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.count(F.lit(1)).alias("d"),
        F.sum("g1").alias("d1"),
    )
    wo = Window.orderBy(F.col("t").desc())
    risk = dt.withColumn(
        "n", F.sum("d").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "n1", F.sum("d1").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    wasc = Window.orderBy(F.col("t").asc())
    lnterm = F.when(
        F.col("d") < F.col("n"),
        F.log(1.0 - F.col("d").cast("double") / F.col("n")),
    ).otherwise(F.lit(0.0))
    risk = risk.withColumn("lnt", lnterm).withColumn(
        "w",
        F.exp(
            F.coalesce(
                F.sum("lnt").over(
                    wasc.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            )
        ),
    )
    nd = F.col("n").cast("double")
    p1 = F.col("n1").cast("double") / nd
    z_t = F.col("w") * (F.col("d1").cast("double") - F.col("d") * p1)
    v_t = (
        F.col("w")
        * F.col("w")
        * F.col("d").cast("double")
        * p1
        * (1.0 - p1)
        * (F.col("n") - F.col("d")).cast("double")
        / (nd - 1.0)
    )
    terms = risk.filter(F.col("n") > 1).select(
        F.floor(z_t * 1e9 + F.lit(_OFF)).cast("long").alias("z9"),
        F.floor(v_t * 1e9 + F.lit(_OFF)).cast("long").alias("v9"),
    )
    agg = terms.agg(
        F.sum("z9").alias("sz9"), F.sum("v9").alias("sv9")
    ).crossJoin(
        F.broadcast(
            per.agg(
                F.count(F.lit(1)).alias("n_users"),
                F.sum("g1").alias("n_day"),
            )
        )
    )
    z = F.col("sz9").cast("double") / 1e9
    v = F.col("sv9").cast("double") / 1e9
    return agg.filter(F.col("sv9") > 0).select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_day").cast("long").alias("n_day"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        F.floor(v * 10_000 + F.lit(_OFF)).cast("long").alias("v_e4"),
        F.floor(z * z / v * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("chi2_e4"),
    )


SQL_FLEMING = f"""
WITH per AS (
  SELECT CAST(max(floor(epoch(ts) / 86400))
              - min(floor(epoch(ts) / 86400)) + 1 AS BIGINT) AS t,
         CASE WHEN CAST(floor((CAST(min(floor(epoch(ts))) AS BIGINT) % 86400)
                              / 3600) AS BIGINT) BETWEEN 8 AND 19
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
), wts AS (
  SELECT t, d, d1, n, n1,
         exp(COALESCE(sum(CASE WHEN d < n
                               THEN ln(1.0 - CAST(d AS DOUBLE) / n)
                               ELSE 0.0 END)
                      OVER (ORDER BY t ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0.0)) AS w
  FROM risk
), terms AS (
  SELECT CAST(floor(w * (d1 - d * (CAST(n1 AS DOUBLE) / n)) * 1e9
                    + {_OFF}) AS BIGINT) AS z9,
         CAST(floor(w * w * d * (CAST(n1 AS DOUBLE) / n)
                      * (1.0 - CAST(n1 AS DOUBLE) / n)
                      * CAST(n - d AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)
                      * 1e9 + {_OFF}) AS BIGINT) AS v9
  FROM wts WHERE n > 1
), agg AS (
  SELECT CAST(sum(z9) AS BIGINT) AS sz9,
         CAST(sum(v9) AS BIGINT) AS sv9
  FROM terms
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(g1) AS BIGINT) AS n_day
  FROM per
)
SELECT n_users, n_day,
       CAST(floor(CAST(sz9 AS DOUBLE) / 1e9 * 10000 + {_OFF})
            AS BIGINT) AS z_e4,
       CAST(floor(CAST(sv9 AS DOUBLE) / 1e9 * 10000 + {_OFF})
            AS BIGINT) AS v_e4,
       CAST(floor(pow(CAST(sz9 AS DOUBLE) / 1e9, 2)
                  / (CAST(sv9 AS DOUBLE) / 1e9) * 10000 + {_OFF})
            AS BIGINT) AS chi2_e4
FROM agg CROSS JOIN tot
WHERE sv9 > 0
"""


# ---------------------------------------------------------------------------
# mcc_threshold — Matthews correlation for the fixed-threshold detector
# ---------------------------------------------------------------------------
# Completes the confusion-matrix family (pr_auc, youden_threshold,
# gains_deciles): label = purchase event, prediction = centi-value >
# 3500; phi/MCC = (tp*tn - fp*fn) / sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn))
# from four exact BIGINT counts, with balanced accuracy and F1
# alongside.


def q_mcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        (
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
            > F.lit(_BD_T)
        )
        .cast("int")
        .alias("p"),
    )
    flat = ev.agg(
        F.sum(F.col("y") * F.col("p")).alias("tp"),
        F.sum((1 - F.col("y")) * F.col("p")).alias("fp"),
        F.sum(F.col("y") * (1 - F.col("p"))).alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("p"))).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c).cast("double") for c in
                      ("tp", "fp", "fn", "tn"))
    mcc = (tp * tn - fp * fn) / F.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    bacc = (tp / (tp + fn) + tn / (tn + fp)) / 2.0
    f1 = 2.0 * tp / (2.0 * tp + fp + fn)
    return flat.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.floor(mcc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "mcc_e6"
        ),
        F.floor(bacc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "bacc_e6"
        ),
        F.floor(f1 * 1_000_000 + F.lit(_OFF)).cast("long").alias("f1_e6"),
    )


SQL_MCC = f"""
WITH ev AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN CAST(floor(value * 100 + {_OFF}) AS BIGINT) > {_BD_T}
              THEN 1 ELSE 0 END AS p
  FROM events
), flat AS (
  SELECT CAST(sum(y * p) AS BIGINT) AS tp,
         CAST(sum((1 - y) * p) AS BIGINT) AS fp,
         CAST(sum(y * (1 - p)) AS BIGINT) AS fn,
         CAST(sum((1 - y) * (1 - p)) AS BIGINT) AS tn
  FROM ev
)
SELECT tp, fp, fn, tn,
       CAST(floor((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                  / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                         * (tn + fp) * (tn + fn))
                  * 1000000 + {_OFF}) AS BIGINT) AS mcc_e6,
       CAST(floor((CAST(tp AS DOUBLE) / (tp + fn)
                   + CAST(tn AS DOUBLE) / (tn + fp)) / 2.0
                  * 1000000 + {_OFF}) AS BIGINT) AS bacc_e6,
       CAST(floor(2.0 * tp / (2.0 * CAST(tp AS DOUBLE) + fp + fn)
                  * 1000000 + {_OFF}) AS BIGINT) AS f1_e6
FROM flat
"""


QUERIES.update(
    {
        "jaro_winkler_dedup": q_jaro_winkler_dedup,
        "stuart_maxwell": q_stuart_maxwell,
        "fleming_harrington": q_fleming_harrington,
        "mcc_threshold": q_mcc_threshold,
    }
)

ORACLE_SQL.update(
    {
        "jaro_winkler_dedup": SQL_JARO,
        "stuart_maxwell": SQL_STUART,
        "fleming_harrington": SQL_FLEMING,
        "mcc_threshold": SQL_MCC,
    }
)


# ---------------------------------------------------------------------------
# damerau_levenshtein_dedup — unrestricted DL verify stage, kernel vs native
# ---------------------------------------------------------------------------
# Companion differential to jaro_winkler_dedup: DuckDB's
# damerau_levenshtein is the UNRESTRICTED Lowrance-Wagner distance
# (verified: 'CA' -> 'ABC' = 2, not the OSA 3), so the Spark kernel
# implements the full alphabet-tracking DP.  Distances are exact
# integers — every aggregate is exact.


def _damerau_py(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxd = la + lb
    da: dict[str, int] = {}
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - 1 - k) + 1 + (j - 1 - l),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def q_damerau_levenshtein_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    @F.pandas_udf("long")
    def _dl(pa: pd.Series, pb: pd.Series) -> pd.Series:
        return pd.Series(
            [_damerau_py(a, b) for a, b in zip(pa, pb)], dtype="int64"
        )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 64).cast("long").alias("band"),
        F.substring(F.trim("text"), 1, 32).alias("title"),
    )
    b = d.select(
        F.col("lang").alias("lang_r"),
        F.col("band").alias("band_r"),
        F.col("doc_id").alias("doc_r"),
        F.col("title").alias("title_r"),
    )
    pairs = d.join(
        b,
        (F.col("lang") == F.col("lang_r"))
        & (F.col("band") == F.col("band_r"))
        & (F.col("doc_id") < F.col("doc_r")),
    ).select(
        "lang",
        "band",
        _dl(F.col("title"), F.col("title_r")).alias("dist"),
        F.levenshtein("title", "title_r").alias("lev"),
    )
    agg = pairs.groupBy("lang", "band").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("dist").alias("min_dist"),
        F.sum("dist").alias("sd"),
        F.sum(F.col("lev") - F.col("dist")).alias("transp_gain"),
    )
    return agg.select(
        "lang",
        "band",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("min_dist").cast("long").alias("min_dist"),
        F.floor(
            F.col("sd").cast("double") / F.col("n_pairs") * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_dist_e4"),
        F.col("transp_gain").cast("long").alias("transp_gain"),
    ).orderBy("lang", "band")


SQL_DAMERAU = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(floor(n_chars / 64.0) AS BIGINT) AS band,
         substr(trim(text), 1, 32) AS title
  FROM documents
), pairs AS (
  SELECT a.lang, a.band,
         damerau_levenshtein(a.title, b.title) AS dist,
         levenshtein(a.title, b.title) AS lev
  FROM d a JOIN d b
    ON b.lang = a.lang AND b.band = a.band AND a.doc_id < b.doc_id
)
SELECT lang, band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(dist) AS BIGINT) AS min_dist,
       CAST(floor(CAST(sum(dist) AS DOUBLE) / count(*) * 10000 + {_OFF})
            AS BIGINT) AS mean_dist_e4,
       CAST(sum(lev - dist) AS BIGINT) AS transp_gain
FROM pairs
GROUP BY 1, 2
ORDER BY lang, band
"""


# ---------------------------------------------------------------------------
# hoeffding_d — Hoeffding's omnibus dependence D (Ann. Math. Stat. 1948)
# ---------------------------------------------------------------------------
# Between daily mean value (x) and daily event count (y) per
# event_type: D = 30 * ((n-2)(n-3)D1 + D2 - 2(n-2)D3) /
# (n(n-1)(n-2)(n-3)(n-4)) with D1 = sum (Q-1)(Q-2), D2 = sum
# (R-1)(R-2)(S-1)(S-2), D3 = sum (R-2)(S-2)(Q-1); R, S midranks and
# Q the bivariate rank Q_i = sum_j c(x_i-x_j)c(y_i-y_j) + 3/4 with
# c(0) = 1/2 (self term 1/4, so Q = 1 + #{both strictly less} under
# no ties).  The 30-row-per-type daily grid makes the within-type
# self-join a bounded 900-row block (house small-block posture);
# quadrupled/doubled ranks keep every sum an exact BIGINT.


def q_hoeffding_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.floor(
            F.sum("v") * F.lit(100.0) / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    r = daily.select(
        "event_type",
        F.col("day").alias("day_r"),
        F.col("x").alias("x_r"),
        F.col("y").alias("y_r"),
    )
    phix = (
        F.when(F.col("x") > F.col("x_r"), 2)
        .when(F.col("x") == F.col("x_r"), 1)
        .otherwise(0)
    )
    phiy = (
        F.when(F.col("y") > F.col("y_r"), 2)
        .when(F.col("y") == F.col("y_r"), 1)
        .otherwise(0)
    )
    j = daily.join(r, "event_type").groupBy("event_type", "day").agg(
        F.sum(phix * phiy).alias("q4m"),
        F.sum(phix).alias("rx2m"),
        F.sum(phiy).alias("ry2m"),
        F.count(F.lit(1)).alias("n"),
    )
    # doubled midranks r2 = sum phi + 1; quadrupled Q4 = q4m + 3
    t = j.select(
        "event_type",
        F.col("n"),
        (F.col("q4m") + 3).alias("q4"),
        (F.col("rx2m") + 1).alias("r2"),
        (F.col("ry2m") + 1).alias("s2"),
    )
    d1t = (F.col("q4") - 4) * (F.col("q4") - 8)
    d2t = (
        (F.col("r2") - 2)
        * (F.col("r2") - 4)
        * (F.col("s2") - 2)
        * (F.col("s2") - 4)
    )
    d3t = (F.col("r2") - 4) * (F.col("s2") - 4) * (F.col("q4") - 4)
    agg = t.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(d1t).alias("d1_16"),
        F.sum(d2t).alias("d2_16"),
        F.sum(d3t).alias("d3_16"),
    )
    nd = F.col("n").cast("double")
    dstat = (
        30.0
        * (
            (nd - 2.0) * (nd - 3.0) * F.col("d1_16")
            + F.col("d2_16")
            - 2.0 * (nd - 2.0) * F.col("d3_16")
        )
        / 16.0
        / (nd * (nd - 1.0) * (nd - 2.0) * (nd - 3.0) * (nd - 4.0))
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("d1_16").cast("long").alias("d1_16"),
        F.col("d2_16").cast("long").alias("d2_16"),
        F.col("d3_16").cast("long").alias("d3_16"),
        F.floor(dstat * 100_000_000 + F.lit(_OFF)).cast("long").alias(
            "d_e8"
        ),
    ).orderBy("event_type")


SQL_HOEFFDING = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), daily AS (
  SELECT event_type, day,
         CAST(floor(CAST(sum(v) AS BIGINT) * 100.0 / count(*) + {_OFF})
              AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), j AS (
  SELECT a.event_type, a.day,
         CAST(sum((CASE WHEN a.x > b.x THEN 2
                        WHEN a.x = b.x THEN 1 ELSE 0 END)
                  * (CASE WHEN a.y > b.y THEN 2
                          WHEN a.y = b.y THEN 1 ELSE 0 END))
              AS BIGINT) + 3 AS q4,
         CAST(sum(CASE WHEN a.x > b.x THEN 2
                       WHEN a.x = b.x THEN 1 ELSE 0 END)
              AS BIGINT) + 1 AS r2,
         CAST(sum(CASE WHEN a.y > b.y THEN 2
                       WHEN a.y = b.y THEN 1 ELSE 0 END)
              AS BIGINT) + 1 AS s2,
         count(*) AS n
  FROM daily a JOIN daily b ON b.event_type = a.event_type
  GROUP BY 1, 2
), agg AS (
  SELECT event_type, max(n) AS n,
         CAST(sum((q4 - 4) * (q4 - 8)) AS BIGINT) AS d1_16,
         CAST(sum((r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)) AS BIGINT)
           AS d2_16,
         CAST(sum((r2 - 4) * (s2 - 4) * (q4 - 4)) AS BIGINT) AS d3_16
  FROM j GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       d1_16, d2_16, d3_16,
       CAST(floor(30.0 * ((CAST(n AS DOUBLE) - 2.0) * (n - 3.0) * d1_16
                          + d2_16 - 2.0 * (n - 2.0) * d3_16) / 16.0
                  / (CAST(n AS DOUBLE) * (n - 1.0) * (n - 2.0)
                     * (n - 3.0) * (n - 4.0))
                  * 100000000 + {_OFF}) AS BIGINT) AS d_e8
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# distance_correlation — Szekely's dCor on the daily (mean, count) pairs
# ---------------------------------------------------------------------------
# Szekely, Rizzo & Bakirov (Ann. Stat. 2007): dCov^2 = mean(A o B) of
# the double-centered pairwise |.| distance matrices; dCor = sqrt(
# dCov^2 / sqrt(dVarX dVarY)).  Same bounded 30x30 per-type daily
# block as hoeffding_d; distances and row/grand sums are exact
# BIGINTs, the centered products are e4-floored per pair before the
# final sums (house order-free discipline).  Detects the nonlinear
# dependence the Pearson daily_corr misses.


def q_distance_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.floor(
            F.sum("v") * F.lit(100.0) / F.count(F.lit(1)) + F.lit(_OFF)
        )
        .cast("long")
        .alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    r = daily.select(
        "event_type",
        F.col("day").alias("day_r"),
        F.col("x").alias("x_r"),
        F.col("y").alias("y_r"),
    )
    pairs = daily.join(r, "event_type").select(
        "event_type",
        "day",
        "day_r",
        F.abs(F.col("x") - F.col("x_r")).alias("a"),
        F.abs(F.col("y") - F.col("y_r")).alias("b"),
    )
    rows = pairs.groupBy("event_type", "day").agg(
        F.sum("a").alias("ra"),
        F.sum("b").alias("rb"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = rows.groupBy("event_type").agg(
        F.sum("ra").alias("sa"),
        F.sum("rb").alias("sb"),
        F.max("n").alias("n"),
    )
    rj = rows.select(
        "event_type",
        F.col("day").alias("day_r"),
        F.col("ra").alias("ra_r"),
        F.col("rb").alias("rb_r"),
    )
    cent = (
        pairs.join(rows.select("event_type", "day", "ra", "rb"),
                   ["event_type", "day"])
        .join(rj, ["event_type", "day_r"])
        .join(F.broadcast(tot), "event_type")
    )
    # exact-integer centering (sf0.001 sweep): the old per-term double
    # chain (a - ra/n - ra_r/n + sa/n^2) left engine-associativity ulps
    # that the e4 floor amplified into off-by-one sums.  Multiply through
    # by n^2: U = a*n^2 - (ra + ra_r)*n + sa is an exact BIGINT (bounded
    # by distance-scale * 31^2), and A = U / n^2 is then ONE correctly-
    # rounded IEEE division — bit-identical in both engines.
    n2 = F.col("n") * F.col("n")
    ua = (
        F.col("a") * n2
        - (F.col("ra") + F.col("ra_r")) * F.col("n")
        + F.col("sa")
    )
    ub = (
        F.col("b") * n2
        - (F.col("rb") + F.col("rb_r")) * F.col("n")
        + F.col("sb")
    )
    A = ua.cast("double") / n2.cast("double")
    B = ub.cast("double") / n2.cast("double")
    fl = cent.select(
        "event_type",
        F.col("n"),
        F.floor(A * B * 10_000 + F.lit(_OFF)).cast("long").alias("ab4"),
        F.floor(A * A * 10_000 + F.lit(_OFF)).cast("long").alias("aa4"),
        F.floor(B * B * 10_000 + F.lit(_OFF)).cast("long").alias("bb4"),
    )
    agg = fl.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("ab4").alias("vxy4"),
        F.sum("aa4").alias("vxx4"),
        F.sum("bb4").alias("vyy4"),
    )
    dcor = F.sqrt(
        F.col("vxy4").cast("double")
        / F.sqrt(
            F.col("vxx4").cast("double") * F.col("vyy4").cast("double")
        )
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("vxy4").cast("long").alias("vxy_e4"),
        F.col("vxx4").cast("long").alias("vxx_e4"),
        F.col("vyy4").cast("long").alias("vyy_e4"),
        F.when(F.col("vxy4") > 0,
               F.floor(dcor * 1_000_000 + F.lit(_OFF)).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("dcor_e6"),
    ).orderBy("event_type")


SQL_DCOR = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), daily AS (
  SELECT event_type, day,
         CAST(floor(CAST(sum(v) AS BIGINT) * 100.0 / count(*) + {_OFF})
              AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, a.day, b.day AS day_r,
         abs(a.x - b.x) AS a, abs(a.y - b.y) AS b
  FROM daily a JOIN daily b ON b.event_type = a.event_type
), rows_ AS (
  SELECT event_type, day,
         CAST(sum(a) AS BIGINT) AS ra,
         CAST(sum(b) AS BIGINT) AS rb,
         count(*) AS n
  FROM pairs GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         CAST(sum(ra) AS BIGINT) AS sa,
         CAST(sum(rb) AS BIGINT) AS sb,
         CAST(max(n) AS BIGINT) AS n
  FROM rows_ GROUP BY 1
), cent AS (
  -- exact-integer centering, mirrors Spark (sf0.001 sweep): U is an
  -- exact BIGINT; A = U / n^2 is one correctly-rounded IEEE division
  SELECT p.event_type,
         t.n,
         (CAST(p.a * t.n * t.n - (r1.ra + r2.ra) * t.n + t.sa
               AS DOUBLE) / (t.n * t.n)) AS ca,
         (CAST(p.b * t.n * t.n - (r1.rb + r2.rb) * t.n + t.sb
               AS DOUBLE) / (t.n * t.n)) AS cb
  FROM pairs p
  JOIN rows_ r1 ON r1.event_type = p.event_type AND r1.day = p.day
  JOIN rows_ r2 ON r2.event_type = p.event_type AND r2.day = p.day_r
  JOIN tot t ON t.event_type = p.event_type
), fl AS (
  SELECT event_type, n,
         CAST(floor(ca * cb * 10000 + {_OFF}) AS BIGINT) AS ab4,
         CAST(floor(ca * ca * 10000 + {_OFF}) AS BIGINT) AS aa4,
         CAST(floor(cb * cb * 10000 + {_OFF}) AS BIGINT) AS bb4
  FROM cent
), agg AS (
  SELECT event_type, max(n) AS n,
         CAST(sum(ab4) AS BIGINT) AS vxy4,
         CAST(sum(aa4) AS BIGINT) AS vxx4,
         CAST(sum(bb4) AS BIGINT) AS vyy4
  FROM fl GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       vxy4 AS vxy_e4,
       vxx4 AS vxx_e4,
       vyy4 AS vyy_e4,
       CASE WHEN vxy4 > 0
            THEN CAST(floor(sqrt(CAST(vxy4 AS DOUBLE)
                                 / sqrt(CAST(vxx4 AS DOUBLE) * vyy4))
                            * 1000000 + {_OFF}) AS BIGINT)
            ELSE 0 END AS dcor_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cressie_read — power-divergence family over the type x diel table
# ---------------------------------------------------------------------------
# Cressie & Read (JRSS B 1984): PD(lambda) = 2/(lambda(lambda+1)) *
# sum O [(O/E)^lambda - 1] unifies Pearson X^2 (lambda=1), the G test
# (lambda -> 0 limit, 2 sum O ln(O/E)) and the recommended
# lambda = 2/3 statistic.  E = row*col/n; each cell's contribution is
# e6-floored before the sums so both engines aggregate exact integers.


def q_cressie_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("x"),
        F.floor(F.hour("ts") / 6).cast("long").alias("y"),
    )
    cell = ev.groupBy("x", "y").agg(F.count(F.lit(1)).alias("o"))
    rowm = cell.groupBy("x").agg(F.sum("o").alias("ri"))
    colm = cell.groupBy("y").agg(F.sum("o").alias("cj"))
    tot = cell.agg(F.sum("o").alias("n"))
    t = (
        cell.join(rowm, "x")
        .join(colm, "y")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("ri").cast("double") * F.col("cj") / F.col("n")
    od = F.col("o").cast("double")
    ratio = od / e
    pd1 = od * (ratio - 1.0)  # lambda = 1: 2/(1*2) * sum O(O/E - 1)
    pdg = od * F.log(ratio)  # lambda -> 0: 2 sum O ln(O/E)
    pd23 = od * (F.pow(ratio, 2.0 / 3.0) - 1.0)
    fl = t.select(
        F.floor(pd1 * 1_000_000 + F.lit(_OFF)).cast("long").alias("p1"),
        F.floor(pdg * 1_000_000 + F.lit(_OFF)).cast("long").alias("pg"),
        F.floor(pd23 * 1_000_000 + F.lit(_OFF)).cast("long").alias("p23"),
    )
    agg = fl.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("p1").alias("s1"),
        F.sum("pg").alias("sg"),
        F.sum("p23").alias("s23"),
    )
    return agg.select(
        F.col("n_cells").cast("long").alias("n_cells"),
        F.floor(F.col("s1") * 2.0 / 2.0 / 1e6 * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("pearson_e4"),
        F.floor(F.col("sg") * 2.0 / 1e6 * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("g_e4"),
        F.floor(
            F.col("s23") * 2.0 / (2.0 / 3.0 * 5.0 / 3.0) / 1e6 * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("cr23_e4"),
    )


SQL_CRESSIE = f"""
WITH ev AS (
  SELECT event_type AS x,
         CAST(floor(hour(ts) / 6) AS BIGINT) AS y
  FROM events
), cell AS (
  SELECT x, y, count(*) AS o FROM ev GROUP BY 1, 2
), rowm AS (
  SELECT x, CAST(sum(o) AS BIGINT) AS ri FROM cell GROUP BY 1
), colm AS (
  SELECT y, CAST(sum(o) AS BIGINT) AS cj FROM cell GROUP BY 1
), tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n FROM cell
), fl AS (
  SELECT
    CAST(floor(o * (CAST(o AS DOUBLE)
                    / (CAST(r.ri AS DOUBLE) * c.cj / t.n) - 1.0)
               * 1000000 + {_OFF}) AS BIGINT) AS p1,
    CAST(floor(o * ln(CAST(o AS DOUBLE)
                      / (CAST(r.ri AS DOUBLE) * c.cj / t.n))
               * 1000000 + {_OFF}) AS BIGINT) AS pg,
    CAST(floor(o * (pow(CAST(o AS DOUBLE)
                        / (CAST(r.ri AS DOUBLE) * c.cj / t.n),
                        2.0 / 3.0) - 1.0)
               * 1000000 + {_OFF}) AS BIGINT) AS p23
  FROM cell JOIN rowm r ON r.x = cell.x
            JOIN colm c ON c.y = cell.y
            CROSS JOIN tot t
), agg AS (
  SELECT count(*) AS n_cells,
         CAST(sum(p1) AS BIGINT) AS s1,
         CAST(sum(pg) AS BIGINT) AS sg,
         CAST(sum(p23) AS BIGINT) AS s23
  FROM fl
)
SELECT CAST(n_cells AS BIGINT) AS n_cells,
       CAST(floor(s1 * 2.0 / 2.0 / 1e6 * 10000 + {_OFF}) AS BIGINT)
         AS pearson_e4,
       CAST(floor(sg * 2.0 / 1e6 * 10000 + {_OFF}) AS BIGINT) AS g_e4,
       CAST(floor(s23 * 2.0 / (2.0 / 3.0 * 5.0 / 3.0) / 1e6 * 10000
                  + {_OFF}) AS BIGINT) AS cr23_e4
FROM agg
"""


QUERIES.update(
    {
        "damerau_levenshtein_dedup": q_damerau_levenshtein_dedup,
        "hoeffding_d": q_hoeffding_d,
        "distance_correlation": q_distance_correlation,
        "cressie_read": q_cressie_read,
    }
)

ORACLE_SQL.update(
    {
        "damerau_levenshtein_dedup": SQL_DAMERAU,
        "hoeffding_d": SQL_HOEFFDING,
        "distance_correlation": SQL_DCOR,
        "cressie_read": SQL_CRESSIE,
    }
)


# ---------------------------------------------------------------------------
# cucconi_test — Cucconi's joint location-scale rank test (1968)
# ---------------------------------------------------------------------------
# Older than Lepage and needs no combination of two separate tests:
# U standardizes the sum of squared ranks of sample 1, V the sum of
# squared CONTRARY ranks (N+1-R), and C = (U^2 + V^2 - 2*rho*U*V) /
# (2(1-rho^2)) with rho = 2(N^2-4)/((2N+1)(8N+11)) - 1.  Doubled
# midranks keep both squared-rank sums exact BIGINTs (R^2 = r2^2/4).


def q_cucconi_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofweek("ts").isin(1, 7).cast("int").alias("g1"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wlt = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wle = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    t = ev.withColumn(
        "r2",
        F.count(F.lit(1)).over(wlt) + F.count(F.lit(1)).over(wle) + 1,
    ).withColumn("N", F.count(F.lit(1)).over(wn))
    t = t.withColumn("c2", 2 * (F.col("N") + 1) - F.col("r2"))
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("g1").alias("m"),
        F.sum(F.col("g1") * F.col("r2") * F.col("r2")).alias("sr2q"),
        F.sum(F.col("g1") * F.col("c2") * F.col("c2")).alias("sc2q"),
    )
    Nd = F.col("N").cast("double")
    md = F.col("m").cast("double")
    nd = (F.col("N") - F.col("m")).cast("double")
    denom = F.sqrt(
        md * nd * (Nd + 1.0) * (2.0 * Nd + 1.0) * (8.0 * Nd + 11.0) / 5.0
    )
    u = (
        6.0 * F.col("sr2q").cast("double") / 4.0
        - md * (Nd + 1.0) * (2.0 * Nd + 1.0)
    ) / denom
    v = (
        6.0 * F.col("sc2q").cast("double") / 4.0
        - md * (Nd + 1.0) * (2.0 * Nd + 1.0)
    ) / denom
    rho = 2.0 * (Nd * Nd - 4.0) / ((2.0 * Nd + 1.0) * (8.0 * Nd + 11.0)) - 1.0
    c = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
    out = agg.select(
        "event_type",
        F.col("m").cast("long").alias("m_weekend"),
        (F.col("N") - F.col("m")).cast("long").alias("n_weekday"),
        F.floor(u * 1_000_000 + F.lit(_OFF)).cast("long").alias("u_e6"),
        F.floor(v * 1_000_000 + F.lit(_OFF)).cast("long").alias("v_e6"),
        F.floor(c * 1_000_000 + F.lit(_OFF)).cast("long").alias("c_e6"),
    )
    return out.orderBy("event_type")


SQL_CUCCONI = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS g1,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, g1,
         count(*) OVER (PARTITION BY event_type ORDER BY v
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         + count(*) OVER (PARTITION BY event_type ORDER BY v
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + 1 AS r2,
         count(*) OVER (PARTITION BY event_type) AS N
  FROM ev
), agg AS (
  SELECT event_type, count(*) AS N,
         CAST(sum(g1) AS BIGINT) AS m,
         CAST(sum(g1 * r2 * r2) AS BIGINT) AS sr2q,
         CAST(sum(g1 * (2 * (N + 1) - r2) * (2 * (N + 1) - r2))
              AS BIGINT) AS sc2q
  FROM t GROUP BY 1
), uv AS (
  SELECT event_type, m, N,
         (6.0 * sr2q / 4.0 - CAST(m AS DOUBLE) * (N + 1.0) * (2.0 * N + 1.0))
           / sqrt(CAST(m AS DOUBLE) * (N - m) * (N + 1.0) * (2.0 * N + 1.0)
                  * (8.0 * N + 11.0) / 5.0) AS u,
         (6.0 * sc2q / 4.0 - CAST(m AS DOUBLE) * (N + 1.0) * (2.0 * N + 1.0))
           / sqrt(CAST(m AS DOUBLE) * (N - m) * (N + 1.0) * (2.0 * N + 1.0)
                  * (8.0 * N + 11.0) / 5.0) AS v,
         2.0 * (CAST(N AS DOUBLE) * N - 4.0)
           / ((2.0 * N + 1.0) * (8.0 * N + 11.0)) - 1.0 AS rho
  FROM agg
)
SELECT event_type,
       m AS m_weekend,
       CAST(N - m AS BIGINT) AS n_weekday,
       CAST(floor(u * 1000000 + {_OFF}) AS BIGINT) AS u_e6,
       CAST(floor(v * 1000000 + {_OFF}) AS BIGINT) AS v_e6,
       CAST(floor((u * u + v * v - 2.0 * rho * u * v)
                  / (2.0 * (1.0 - rho * rho)) * 1000000 + {_OFF})
            AS BIGINT) AS c_e6
FROM uv
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# wald_wolfowitz_2s — two-sample runs test on the merged ordering
# ---------------------------------------------------------------------------
# Wald & Wolfowitz (Ann. Math. Stat. 1940): merge both samples sorted
# by value, count runs of the group label; too FEW runs rejects
# identical distributions.  Tie order within equal centi-values is
# fixed by event_id — deterministic in both engines (documented; the
# test classically assumes continuity).  R, m, n exact integers;
# E[R] = 2mn/N + 1, Var = 2mn(2mn-N)/(N^2 (N-1)).


def q_wald_wolfowitz_2s(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.dayofweek("ts").isin(1, 7).cast("int").alias("g1"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wo = Window.partitionBy("event_type").orderBy("v", "event_id")
    t = ev.withColumn("prev", F.lag("g1").over(wo)).withColumn(
        "chg",
        F.when(
            F.col("prev").isNull() | (F.col("prev") != F.col("g1")), 1
        ).otherwise(0),
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("g1").alias("m"),
        F.sum("chg").alias("runs"),
    )
    Nd = F.col("N").cast("double")
    md = F.col("m").cast("double")
    nd = (F.col("N") - F.col("m")).cast("double")
    e = 2.0 * md * nd / Nd + 1.0
    var = (
        2.0
        * md
        * nd
        * (2.0 * md * nd - Nd)
        / (Nd * Nd * (Nd - 1.0))
    )
    return agg.select(
        "event_type",
        F.col("m").cast("long").alias("m_weekend"),
        (F.col("N") - F.col("m")).cast("long").alias("n_weekday"),
        F.col("runs").cast("long").alias("runs"),
        F.floor((F.col("runs") - e) / F.sqrt(var) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("z_e6"),
    ).orderBy("event_type")


SQL_WW2S = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS g1,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, g1,
         lag(g1) OVER (PARTITION BY event_type ORDER BY v, event_id)
           AS prev
  FROM ev
), agg AS (
  SELECT event_type, count(*) AS N,
         CAST(sum(g1) AS BIGINT) AS m,
         CAST(sum(CASE WHEN prev IS NULL OR prev <> g1 THEN 1 ELSE 0 END)
              AS BIGINT) AS runs
  FROM t GROUP BY 1
)
SELECT event_type,
       m AS m_weekend,
       CAST(N - m AS BIGINT) AS n_weekday,
       runs,
       CAST(floor((runs - (2.0 * m * (N - m) / N + 1.0))
                  / sqrt(2.0 * m * (N - m)
                         * (2.0 * CAST(m AS DOUBLE) * (N - m) - N)
                         / (CAST(N AS DOUBLE) * N * (N - 1.0)))
                  * 1000000 + {_OFF}) AS BIGINT) AS z_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# oaxaca_blinder — two-fold decomposition of the purchase-click gap
# ---------------------------------------------------------------------------
# Oaxaca (1973) / Blinder (1973) with a categorical regressor (the
# 6-hour diel bucket): gap = mean_A - mean_B splits into the
# composition (explained) part sum_h (w_Ah - w_Bh) m_Bh and the
# structure (unexplained) part sum_h w_Ah (m_Ah - m_Bh), B-weighted
# reference.  Group means per bucket are ratios of exact integer
# sums; each bucket's contribution is e6-floored before summing.


def q_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            (F.col("event_type") == "purchase").cast("int").alias("a"),
            F.floor(F.hour("ts") / 6).cast("long").alias("h"),
            F.floor(F.col("value") * 100 + F.lit(_OFF))
            .cast("long")
            .alias("v"),
        )
    )
    cell = ev.groupBy("a", "h").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    grp = cell.groupBy("a").agg(
        F.sum("n").alias("ng"), F.sum("sv").alias("svg")
    )
    wide = (
        cell.join(grp, "a")
        .select(
            "h",
            F.when(F.col("a") == 1, F.col("n")).otherwise(0).alias("na"),
            F.when(F.col("a") == 0, F.col("n")).otherwise(0).alias("nb"),
            F.when(F.col("a") == 1, F.col("sv")).otherwise(0).alias("sva"),
            F.when(F.col("a") == 0, F.col("sv")).otherwise(0).alias("svb"),
            F.when(F.col("a") == 1, F.col("ng")).otherwise(0).alias("nga"),
            F.when(F.col("a") == 0, F.col("ng")).otherwise(0).alias("ngb"),
        )
        .groupBy("h")
        .agg(
            F.sum("na").alias("na"),
            F.sum("nb").alias("nb"),
            F.sum("sva").alias("sva"),
            F.sum("svb").alias("svb"),
            F.max("nga").alias("nga"),
            F.max("ngb").alias("ngb"),
        )
    )
    wa = F.col("na").cast("double") / F.col("nga")
    wb = F.col("nb").cast("double") / F.col("ngb")
    ma = F.col("sva").cast("double") / F.col("na")
    mb = F.col("svb").cast("double") / F.col("nb")
    fl = wide.select(
        F.floor((wa - wb) * mb * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("exp6"),
        F.floor(wa * (ma - mb) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("unexp6"),
    )
    parts = fl.agg(
        F.sum("exp6").alias("se6"), F.sum("unexp6").alias("su6")
    )
    gap = grp.select(
        F.when(F.col("a") == 1,
               F.col("svg").cast("double") / F.col("ng"))
        .otherwise(-F.col("svg").cast("double") / F.col("ng"))
        .alias("signed_mean")
    ).agg(F.sum(
        F.floor(F.col("signed_mean") * 1_000_000 + F.lit(_OFF)).cast(
            "long"
        )
    ).alias("gap6"))
    out = parts.crossJoin(F.broadcast(gap))
    return out.select(
        F.col("gap6").cast("long").alias("gap_centi_e6"),
        F.col("se6").cast("long").alias("explained_centi_e6"),
        F.col("su6").cast("long").alias("unexplained_centi_e6"),
    )


SQL_OAXACA = f"""
WITH ev AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
         CAST(floor(hour(ts) / 6) AS BIGINT) AS h,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events WHERE event_type IN ('purchase', 'click')
), cell AS (
  SELECT a, h, count(*) AS n, CAST(sum(v) AS BIGINT) AS sv
  FROM ev GROUP BY 1, 2
), grp AS (
  SELECT a, CAST(sum(n) AS BIGINT) AS ng,
         CAST(sum(sv) AS BIGINT) AS svg
  FROM cell GROUP BY 1
), wide AS (
  SELECT h,
         CAST(sum(CASE WHEN a = 1 THEN n ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN a = 0 THEN n ELSE 0 END) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN a = 1 THEN sv ELSE 0 END) AS BIGINT) AS sva,
         CAST(sum(CASE WHEN a = 0 THEN sv ELSE 0 END) AS BIGINT) AS svb,
         CAST(max(CASE WHEN a = 1 THEN ng ELSE 0 END) AS BIGINT) AS nga,
         CAST(max(CASE WHEN a = 0 THEN ng ELSE 0 END) AS BIGINT) AS ngb
  FROM cell JOIN grp USING (a) GROUP BY 1
), fl AS (
  SELECT
    CAST(floor((CAST(na AS DOUBLE) / nga - CAST(nb AS DOUBLE) / ngb)
               * (CAST(svb AS DOUBLE) / nb) * 1000000 + {_OFF})
         AS BIGINT) AS exp6,
    CAST(floor(CAST(na AS DOUBLE) / nga
               * (CAST(sva AS DOUBLE) / na - CAST(svb AS DOUBLE) / nb)
               * 1000000 + {_OFF}) AS BIGINT) AS unexp6
  FROM wide
), parts AS (
  SELECT CAST(sum(exp6) AS BIGINT) AS se6,
         CAST(sum(unexp6) AS BIGINT) AS su6
  FROM fl
), gap AS (
  SELECT CAST(sum(CAST(floor((CASE WHEN a = 1 THEN 1.0 ELSE -1.0 END)
                             * svg / ng * 1000000 + {_OFF}) AS BIGINT))
              AS BIGINT) AS gap6
  FROM grp
)
SELECT gap6 AS gap_centi_e6,
       se6 AS explained_centi_e6,
       su6 AS unexplained_centi_e6
FROM parts CROSS JOIN gap
"""


# ---------------------------------------------------------------------------
# duncan_dissimilarity — segregation of languages across sources
# ---------------------------------------------------------------------------
# Duncan & Duncan (ASR 1955) dissimilarity D_l = 1/2 sum_s
# |n_sl/N_l - (n_s - n_sl)/(N - N_l)| (share of either group that
# would have to move sources to equalize), plus the isolation index
# P*_ll = sum_s (n_sl/N_l)(n_sl/n_s).  Per-source terms are e6-floored
# before the sums; every input is an exact count.


def q_duncan_dissimilarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "lang"
    )
    cell = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("nsl")
    )
    src = cell.groupBy("source").agg(F.sum("nsl").alias("ns"))
    lng = cell.groupBy("lang").agg(F.sum("nsl").alias("nl"))
    tot = cell.agg(F.sum("nsl").alias("n"))
    # complete lang x source grid (zero cells matter for D)
    grid = src.crossJoin(lng).join(
        cell, ["source", "lang"], "left"
    ).withColumn("nsl", F.coalesce(F.col("nsl"), F.lit(0)))
    t = grid.crossJoin(F.broadcast(tot))
    term_d = F.abs(
        F.col("nsl").cast("double") / F.col("nl")
        - (F.col("ns") - F.col("nsl")).cast("double")
        / (F.col("n") - F.col("nl"))
    )
    term_p = (
        F.col("nsl").cast("double")
        / F.col("nl")
        * F.col("nsl")
        / F.col("ns")
    )
    fl = t.select(
        "lang",
        F.col("nl"),
        F.floor(term_d * 1_000_000 + F.lit(_OFF)).cast("long").alias("d6"),
        F.floor(term_p * 1_000_000 + F.lit(_OFF)).cast("long").alias("p6"),
    )
    agg = fl.groupBy("lang").agg(
        F.max("nl").alias("n_docs"),
        F.sum("d6").alias("sd6"),
        F.sum("p6").alias("sp6"),
    )
    return agg.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.floor(F.col("sd6") / 2.0 + F.lit(_OFF))
        .cast("long")
        .alias("duncan_d_e6"),
        F.col("sp6").cast("long").alias("isolation_e6"),
    ).orderBy("lang")


SQL_DUNCAN = f"""
WITH cell AS (
  SELECT source, lang, count(*) AS nsl
  FROM documents GROUP BY 1, 2
), src AS (
  SELECT source, CAST(sum(nsl) AS BIGINT) AS ns FROM cell GROUP BY 1
), lng AS (
  SELECT lang, CAST(sum(nsl) AS BIGINT) AS nl FROM cell GROUP BY 1
), tot AS (
  SELECT CAST(sum(nsl) AS BIGINT) AS n FROM cell
), grid AS (
  SELECT s.source, l.lang, s.ns, l.nl,
         COALESCE(c.nsl, 0) AS nsl
  FROM src s CROSS JOIN lng l
  LEFT JOIN cell c ON c.source = s.source AND c.lang = l.lang
), fl AS (
  SELECT lang, nl,
         CAST(floor(abs(CAST(nsl AS DOUBLE) / nl
                        - CAST(ns - nsl AS DOUBLE) / (t.n - nl))
                    * 1000000 + {_OFF}) AS BIGINT) AS d6,
         CAST(floor(CAST(nsl AS DOUBLE) / nl * nsl / ns
                    * 1000000 + {_OFF}) AS BIGINT) AS p6
  FROM grid CROSS JOIN tot t
)
SELECT lang,
       CAST(max(nl) AS BIGINT) AS n_docs,
       CAST(floor(CAST(sum(d6) AS BIGINT) / 2.0 + {_OFF}) AS BIGINT)
         AS duncan_d_e6,
       CAST(sum(p6) AS BIGINT) AS isolation_e6
FROM fl
GROUP BY 1
ORDER BY lang
"""


QUERIES.update(
    {
        "cucconi_test": q_cucconi_test,
        "wald_wolfowitz_2s": q_wald_wolfowitz_2s,
        "oaxaca_blinder": q_oaxaca_blinder,
        "duncan_dissimilarity": q_duncan_dissimilarity,
    }
)

ORACLE_SQL.update(
    {
        "cucconi_test": SQL_CUCCONI,
        "wald_wolfowitz_2s": SQL_WW2S,
        "oaxaca_blinder": SQL_OAXACA,
        "duncan_dissimilarity": SQL_DUNCAN,
    }
)
