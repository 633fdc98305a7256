"""Round-4 continuation registry (fourteenth battery): factorial
designs and reliability — balanced two-way ANOVA with interaction,
its nonparametric twin (Scheirer-Ray-Hare on midranks), orthogonal
polynomial contrasts over ordered diel buckets, and the MTBF/MTTR
reliability summary — none previously in the registry (dow_anova /
welch_anova / norm_anova are one-way; max_outage is the single longest
gap, not the renewal summary).

House conventions throughout: exact integers before any cross-row
aggregation (centi values, doubled midranks, microsecond gaps),
deterministic (ts, event_id) trims, BIGINT casts on every DuckDB sum.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF


# ---------------------------------------------------------------------------
# twoway_anova_balanced — 4 (diel bucket) x 2 (weekend) factorial with
# interaction, balanced by deterministic per-cell trimming
# ---------------------------------------------------------------------------
# m = min cell count; each cell keeps its first m rows in (ts,
# event_id) order, so the classical balanced closed forms apply:
# SS_A = sum A_a^2/(b m) - C, SS_cells = sum S_ab^2/m - C,
# SS_AB = SS_cells - SS_A - SS_B, SS_E = SS_tot - SS_cells.  All cell
# sums exact BIGINTs; F ratios are identical doubles.


def q_twoway_anova_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(F.hour("ts") / 6).cast("int").alias("a"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("b"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wcell = Window.partitionBy("a", "b").orderBy("ts", "event_id")
    r = ev.withColumn("rk", F.row_number().over(wcell))
    mrow = r.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cn")).agg(
        F.min("cn").alias("m")
    )
    t = r.crossJoin(F.broadcast(mrow)).filter(F.col("rk") <= F.col("m"))
    cells = t.groupBy("a", "b").agg(
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("sq"),
        F.max("m").alias("m"),
    )
    agg = cells.groupBy().agg(
        F.max("m").alias("m"),
        F.sum("s").alias("g"),
        F.sum("sq").alias("sqt"),
        F.sum(F.col("s") * F.col("s")).alias("scell2"),
    )
    arow = cells.groupBy("a").agg(F.sum("s").alias("sa"))
    brow = cells.groupBy("b").agg(F.sum("s").alias("sb"))
    sa2 = arow.agg(F.sum(F.col("sa") * F.col("sa")).alias("sa2"))
    sb2 = brow.agg(F.sum(F.col("sb") * F.col("sb")).alias("sb2"))
    j = agg.crossJoin(F.broadcast(sa2)).crossJoin(F.broadcast(sb2))
    A, B = 4.0, 2.0
    m = F.col("m").cast("double")
    n = A * B * m
    c = F.col("g").cast("double") * F.col("g").cast("double") / n
    ss_tot = F.col("sqt").cast("double") - c
    ss_a = F.col("sa2").cast("double") / (B * m) - c
    ss_b = F.col("sb2").cast("double") / (A * m) - c
    ss_cells = F.col("scell2").cast("double") / m - c
    ss_ab = ss_cells - ss_a - ss_b
    ss_e = ss_tot - ss_cells
    df_e = A * B * (m - 1)
    f_a = (ss_a / (A - 1)) / (ss_e / df_e)
    f_b = (ss_b / (B - 1)) / (ss_e / df_e)
    f_ab = (ss_ab / ((A - 1) * (B - 1))) / (ss_e / df_e)
    return j.select(
        F.col("m").cast("long").alias("m_per_cell"),
        F.floor(ss_a / 10_000 + F.lit(_OFF)).cast("long").alias("ss_a_dn4"),
        F.floor(ss_b / 10_000 + F.lit(_OFF)).cast("long").alias("ss_b_dn4"),
        F.floor(ss_ab / 10_000 + F.lit(_OFF)).cast("long").alias("ss_ab_dn4"),
        F.floor(ss_e / 10_000 + F.lit(_OFF)).cast("long").alias("ss_e_dn4"),
        F.floor(f_a * 10_000 + F.lit(_OFF)).cast("long").alias("f_a_e4"),
        F.floor(f_b * 10_000 + F.lit(_OFF)).cast("long").alias("f_b_e4"),
        F.floor(f_ab * 10_000 + F.lit(_OFF)).cast("long").alias("f_ab_e4"),
    )


SQL_TWOWAY = f"""
WITH ev AS (
  SELECT CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS a,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS b,
         ts, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY a, b
                               ORDER BY ts, event_id) AS rk
  FROM ev
), mrow AS (
  SELECT min(cn) AS m FROM (
    SELECT a, b, count(*) AS cn FROM r GROUP BY 1, 2)
), t AS (
  SELECT r.*, mrow.m FROM r CROSS JOIN mrow WHERE rk <= m
), cells AS (
  SELECT a, b, CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS sq,
         max(m) AS m
  FROM t GROUP BY 1, 2
), agg AS (
  SELECT max(m) AS m,
         CAST(sum(s) AS BIGINT) AS g,
         CAST(sum(sq) AS BIGINT) AS sqt,
         CAST(sum(s * s) AS BIGINT) AS scell2
  FROM cells
), sa2 AS (
  SELECT CAST(sum(sa * sa) AS BIGINT) AS sa2 FROM (
    SELECT a, CAST(sum(s) AS BIGINT) AS sa FROM cells GROUP BY 1)
), sb2 AS (
  SELECT CAST(sum(sb * sb) AS BIGINT) AS sb2 FROM (
    SELECT b, CAST(sum(s) AS BIGINT) AS sb FROM cells GROUP BY 1)
), f AS (
  SELECT CAST(m AS DOUBLE) AS m, CAST(g AS DOUBLE) AS g,
         CAST(sqt AS DOUBLE) AS sqt, CAST(scell2 AS DOUBLE) AS scell2,
         CAST(sa2 AS DOUBLE) AS sa2, CAST(sb2 AS DOUBLE) AS sb2,
         m AS m_int
  FROM agg CROSS JOIN sa2 CROSS JOIN sb2
), ss AS (
  SELECT m_int, m,
         sa2 / (2.0 * m) - g * g / (8.0 * m) AS ss_a,
         sb2 / (4.0 * m) - g * g / (8.0 * m) AS ss_b,
         scell2 / m - g * g / (8.0 * m) AS ss_cells,
         sqt - g * g / (8.0 * m) AS ss_tot
  FROM f
)
SELECT CAST(m_int AS BIGINT) AS m_per_cell,
       CAST(floor(ss_a / 10000 + {_OFF}) AS BIGINT) AS ss_a_dn4,
       CAST(floor(ss_b / 10000 + {_OFF}) AS BIGINT) AS ss_b_dn4,
       CAST(floor((ss_cells - ss_a - ss_b) / 10000 + {_OFF}) AS BIGINT)
         AS ss_ab_dn4,
       CAST(floor((ss_tot - ss_cells) / 10000 + {_OFF}) AS BIGINT)
         AS ss_e_dn4,
       CAST(floor((ss_a / 3.0) / ((ss_tot - ss_cells) / (8.0 * (m - 1)))
                  * 10000 + {_OFF}) AS BIGINT) AS f_a_e4,
       CAST(floor((ss_b / 1.0) / ((ss_tot - ss_cells) / (8.0 * (m - 1)))
                  * 10000 + {_OFF}) AS BIGINT) AS f_b_e4,
       CAST(floor(((ss_cells - ss_a - ss_b) / 3.0)
                  / ((ss_tot - ss_cells) / (8.0 * (m - 1)))
                  * 10000 + {_OFF}) AS BIGINT) AS f_ab_e4
FROM ss
"""


# ---------------------------------------------------------------------------
# scheirer_ray_hare — nonparametric two-way on midranks (Scheirer,
# Ray & Hare 1976), same trimmed balanced 4x2 design
# ---------------------------------------------------------------------------
# Doubled midranks keep ties exact; H_effect = SS_effect / MS_total
# with MS_total = SS_total/(N-1) over the rank variable.  The /4 from
# doubling cancels in every H ratio.


def q_scheirer_ray_hare(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.hour("ts") / 6).cast("int").alias("a"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("b"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wcell = Window.partitionBy("event_type", "a", "b").orderBy(
        "ts", "event_id"
    )
    r = ev.withColumn("rk", F.row_number().over(wcell))
    mrow = (
        r.groupBy("event_type", "a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
        .groupBy("event_type")
        .agg(F.min("cn").alias("m"))
    )
    t = r.join(F.broadcast(mrow), "event_type").filter(
        F.col("rk") <= F.col("m")
    )
    # doubled midrank of v over the per-type trimmed pool: 2*rank_avg =
    # (#less)*2 + (#eq) + 1 via per-key cumulative counts (never global)
    wv = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    weq = Window.partitionBy("event_type", "v")
    t = (
        t.withColumn("nless", F.coalesce(F.count(F.lit(1)).over(wv), F.lit(0)))
        .withColumn("neq", F.count(F.lit(1)).over(weq))
        .withColumn("r2", 2 * F.col("nless") + F.col("neq") + 1)
    )
    cells = t.groupBy("event_type", "a", "b").agg(
        F.sum("r2").alias("s"),
        F.sum(F.col("r2") * F.col("r2")).alias("sq"),
        F.max("m").alias("m"),
    )
    agg = cells.groupBy("event_type").agg(
        F.max("m").alias("m"),
        F.sum("s").alias("g"),
        F.sum("sq").alias("sqt"),
        F.sum(F.col("s") * F.col("s")).alias("scell2"),
    )
    sa2 = (
        cells.groupBy("event_type", "a")
        .agg(F.sum("s").alias("sa"))
        .groupBy("event_type")
        .agg(F.sum(F.col("sa") * F.col("sa")).alias("sa2"))
    )
    sb2 = (
        cells.groupBy("event_type", "b")
        .agg(F.sum("s").alias("sb"))
        .groupBy("event_type")
        .agg(F.sum(F.col("sb") * F.col("sb")).alias("sb2"))
    )
    j = agg.join(sa2, "event_type").join(sb2, "event_type")
    A, B = 4.0, 2.0
    m = F.col("m").cast("double")
    n = A * B * m
    c = F.col("g").cast("double") * F.col("g").cast("double") / n
    ss_tot = F.col("sqt").cast("double") - c
    ss_a = F.col("sa2").cast("double") / (B * m) - c
    ss_b = F.col("sb2").cast("double") / (A * m) - c
    ss_cells = F.col("scell2").cast("double") / m - c
    ss_ab = ss_cells - ss_a - ss_b
    ms_tot = ss_tot / (n - 1)
    return j.select(
        "event_type",
        F.col("m").cast("long").alias("m_per_cell"),
        F.floor(ss_a / ms_tot * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("h_a_e4"),
        F.floor(ss_b / ms_tot * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("h_b_e4"),
        F.floor(ss_ab / ms_tot * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("h_ab_e4"),
    ).orderBy("event_type")


SQL_SRH = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS a,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS b,
         ts, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, a, b
                               ORDER BY ts, event_id) AS rk
  FROM ev
), mrow AS (
  SELECT event_type, min(cn) AS m FROM (
    SELECT event_type, a, b, count(*) AS cn FROM r GROUP BY 1, 2, 3)
  GROUP BY 1
), t AS (
  SELECT r.* EXCLUDE (rk), mrow.m
  FROM r JOIN mrow ON mrow.event_type = r.event_type
  WHERE rk <= m
), rkd AS (
  SELECT event_type, a, b, m,
         2 * COALESCE(count(*) OVER (PARTITION BY event_type ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + count(*) OVER (PARTITION BY event_type, v) + 1 AS r2
  FROM t
), cells AS (
  SELECT event_type, a, b, CAST(sum(r2) AS BIGINT) AS s,
         CAST(sum(r2 * r2) AS BIGINT) AS sq,
         max(m) AS m
  FROM rkd GROUP BY 1, 2, 3
), agg AS (
  SELECT event_type, max(m) AS m,
         CAST(sum(s) AS BIGINT) AS g,
         CAST(sum(sq) AS BIGINT) AS sqt,
         CAST(sum(s * s) AS BIGINT) AS scell2
  FROM cells GROUP BY 1
), sa2 AS (
  SELECT event_type, CAST(sum(sa * sa) AS BIGINT) AS sa2 FROM (
    SELECT event_type, a, CAST(sum(s) AS BIGINT) AS sa
    FROM cells GROUP BY 1, 2)
  GROUP BY 1
), sb2 AS (
  SELECT event_type, CAST(sum(sb * sb) AS BIGINT) AS sb2 FROM (
    SELECT event_type, b, CAST(sum(s) AS BIGINT) AS sb
    FROM cells GROUP BY 1, 2)
  GROUP BY 1
), f AS (
  SELECT agg.event_type, CAST(agg.m AS DOUBLE) AS m, agg.m AS m_int,
         CAST(g AS DOUBLE) AS g, CAST(sqt AS DOUBLE) AS sqt,
         CAST(scell2 AS DOUBLE) AS scell2,
         CAST(sa2.sa2 AS DOUBLE) AS sa2, CAST(sb2.sb2 AS DOUBLE) AS sb2
  FROM agg
  JOIN sa2 ON sa2.event_type = agg.event_type
  JOIN sb2 ON sb2.event_type = agg.event_type
), ss AS (
  SELECT event_type, m_int, m,
         sa2 / (2.0 * m) - g * g / (8.0 * m) AS ss_a,
         sb2 / (4.0 * m) - g * g / (8.0 * m) AS ss_b,
         scell2 / m - g * g / (8.0 * m) AS ss_cells,
         (sqt - g * g / (8.0 * m)) / (8.0 * m - 1) AS ms_tot
  FROM f
)
SELECT event_type,
       CAST(m_int AS BIGINT) AS m_per_cell,
       CAST(floor(ss_a / ms_tot * 10000 + {_OFF}) AS BIGINT) AS h_a_e4,
       CAST(floor(ss_b / ms_tot * 10000 + {_OFF}) AS BIGINT) AS h_b_e4,
       CAST(floor((ss_cells - ss_a - ss_b) / ms_tot * 10000 + {_OFF})
            AS BIGINT) AS h_ab_e4
FROM ss
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# polynomial_contrasts — orthogonal linear/quadratic/cubic contrasts
# over the 4 ordered diel buckets, per event_type
# ---------------------------------------------------------------------------
# Coefficients (-3,-1,1,3), (1,-1,-1,1), (-1,3,-3,1); psi = sum c_a
# ybar_a with SE^2 = MSE sum c_a^2/n_a; MSE from exact within-group
# sums.  t ratios e4-floored.


def q_polynomial_contrasts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.hour("ts") / 6).cast("int").alias("a"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("event_type", "a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("sq"),
    )
    nd = F.col("n").cast("double")
    g = g.withColumn("mean", F.col("s").cast("double") / nd).withColumn(
        "ssw",
        F.col("sq").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd,
    )
    coefs = {"lin": [-3, -1, 1, 3], "quad": [1, -1, -1, 1], "cub": [-1, 3, -3, 1]}
    psi = {}
    cn = {}
    for name, cs in coefs.items():
        ccol = (
            F.when(F.col("a") == 0, F.lit(cs[0]))
            .when(F.col("a") == 1, F.lit(cs[1]))
            .when(F.col("a") == 2, F.lit(cs[2]))
            .otherwise(F.lit(cs[3]))
            .cast("double")
        )
        psi[name] = F.sum(ccol * F.col("mean"))
        cn[name] = F.sum(ccol * ccol / nd)
    agg = g.groupBy("event_type").agg(
        F.sum("n").alias("n_tot"),
        F.count(F.lit(1)).alias("k"),
        F.sum("ssw").alias("sse"),
        psi["lin"].alias("psi_l"),
        psi["quad"].alias("psi_q"),
        psi["cub"].alias("psi_c"),
        cn["lin"].alias("cn_l"),
        cn["quad"].alias("cn_q"),
        cn["cub"].alias("cn_c"),
    )
    mse = F.col("sse") / (F.col("n_tot") - F.col("k")).cast("double")
    out = agg.select(
        "event_type",
        F.col("n_tot").cast("long").alias("n"),
        F.floor(F.col("psi_l") * 100 + F.lit(_OFF)).cast("long").alias(
            "psi_lin_e4"
        ),
        F.floor(
            F.col("psi_l") / F.sqrt(mse * F.col("cn_l")) * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("t_lin_e4"),
        F.floor(F.col("psi_q") * 100 + F.lit(_OFF)).cast("long").alias(
            "psi_quad_e4"
        ),
        F.floor(
            F.col("psi_q") / F.sqrt(mse * F.col("cn_q")) * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("t_quad_e4"),
        F.floor(F.col("psi_c") * 100 + F.lit(_OFF)).cast("long").alias(
            "psi_cub_e4"
        ),
        F.floor(
            F.col("psi_c") / F.sqrt(mse * F.col("cn_c")) * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("t_cub_e4"),
    )
    return out.orderBy("event_type")


SQL_CONTRASTS = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS a,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT event_type, a, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS sq
  FROM ev GROUP BY 1, 2
), m AS (
  SELECT event_type, a, n,
         CAST(s AS DOUBLE) / n AS mean,
         CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / n AS ssw,
         CASE a WHEN 0 THEN -3 WHEN 1 THEN -1 WHEN 2 THEN 1
                ELSE 3 END AS cl,
         CASE a WHEN 0 THEN 1 WHEN 1 THEN -1 WHEN 2 THEN -1
                ELSE 1 END AS cq,
         CASE a WHEN 0 THEN -1 WHEN 1 THEN 3 WHEN 2 THEN -3
                ELSE 1 END AS cc
  FROM g
), agg AS (
  SELECT event_type,
         CAST(sum(n) AS BIGINT) AS n_tot,
         count(*) AS k,
         sum(ssw) AS sse,
         sum(cl * mean) AS psi_l,
         sum(cq * mean) AS psi_q,
         sum(cc * mean) AS psi_c,
         sum(CAST(cl * cl AS DOUBLE) / n) AS cn_l,
         sum(CAST(cq * cq AS DOUBLE) / n) AS cn_q,
         sum(CAST(cc * cc AS DOUBLE) / n) AS cn_c
  FROM m GROUP BY 1
)
SELECT event_type,
       n_tot AS n,
       CAST(floor(psi_l * 100 + {_OFF}) AS BIGINT) AS psi_lin_e4,
       CAST(floor(psi_l / sqrt(sse / (n_tot - k) * cn_l) * 10000
                  + {_OFF}) AS BIGINT) AS t_lin_e4,
       CAST(floor(psi_q * 100 + {_OFF}) AS BIGINT) AS psi_quad_e4,
       CAST(floor(psi_q / sqrt(sse / (n_tot - k) * cn_q) * 10000
                  + {_OFF}) AS BIGINT) AS t_quad_e4,
       CAST(floor(psi_c * 100 + {_OFF}) AS BIGINT) AS psi_cub_e4,
       CAST(floor(psi_c / sqrt(sse / (n_tot - k) * cn_c) * 10000
                  + {_OFF}) AS BIGINT) AS t_cub_e4
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# mtbf_mttr — renewal reliability summary over error bursts
# ---------------------------------------------------------------------------
# Error events cluster into bursts with the 600 s gap rule (the house
# sessionize machinery on one series); MTTR = mean burst duration,
# MTBF = mean end->next-start gap, availability = 1 - downtime/span.
# Exact microsecond integers; one-row output.


def q_mtbf_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "error"
    ).select(F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    wo = Window.orderBy("us")
    t = ev.withColumn("prev", F.lag("us").over(wo)).withColumn(
        "new_b",
        (
            F.col("prev").isNull() | (F.col("us") - F.col("prev") > 600_000_000)
        ).cast("long"),
    )
    wc = Window.orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = t.withColumn("burst", F.sum("new_b").over(wc))
    b = t.groupBy("burst").agg(
        F.min("us").alias("t0"),
        F.max("us").alias("t1"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    wb = Window.orderBy("burst")
    b = b.withColumn("next_t0", F.lead("t0").over(wb))
    agg = b.agg(
        F.count(F.lit(1)).alias("n_bursts"),
        F.sum("n_ev").alias("n_errors"),
        F.sum(F.col("t1") - F.col("t0")).alias("downtime_us"),
        F.sum(
            F.when(
                F.col("next_t0").isNotNull(), F.col("next_t0") - F.col("t1")
            )
        ).alias("uptime_us"),
        F.min("t0").alias("span0"),
        F.max("t1").alias("span1"),
    )
    mtbf = F.col("uptime_us").cast("double") / (
        F.col("n_bursts") - 1
    ).cast("double")
    mttr = F.col("downtime_us").cast("double") / F.col("n_bursts").cast(
        "double"
    )
    avail = F.lit(1.0) - F.col("downtime_us").cast("double") / (
        F.col("span1") - F.col("span0")
    ).cast("double")
    return agg.select(
        F.col("n_errors").cast("long").alias("n_errors"),
        F.col("n_bursts").cast("long").alias("n_bursts"),
        F.floor(mtbf + F.lit(_OFF)).cast("long").alias("mtbf_us"),
        F.floor(mttr + F.lit(_OFF)).cast("long").alias("mttr_us"),
        F.floor(avail * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "avail_e6"
        ),
    )


SQL_MTBF = f"""
WITH ev AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events WHERE event_type = 'error'
), t AS (
  SELECT us,
         CASE WHEN lag(us) OVER (ORDER BY us) IS NULL
                OR us - lag(us) OVER (ORDER BY us) > 600000000
              THEN 1 ELSE 0 END AS new_b
  FROM ev
), sd AS (
  SELECT us,
         CAST(sum(new_b) OVER (ORDER BY us ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS burst
  FROM t
), b AS (
  SELECT burst, min(us) AS t0, max(us) AS t1, count(*) AS n_ev
  FROM sd GROUP BY 1
), g AS (
  SELECT *, lead(t0) OVER (ORDER BY burst) AS next_t0
  FROM b
), agg AS (
  SELECT count(*) AS n_bursts,
         CAST(sum(n_ev) AS BIGINT) AS n_errors,
         CAST(sum(t1 - t0) AS BIGINT) AS downtime_us,
         CAST(sum(CASE WHEN next_t0 IS NOT NULL
                       THEN next_t0 - t1 END) AS BIGINT) AS uptime_us,
         min(t0) AS span0, max(t1) AS span1
  FROM g
)
SELECT n_errors,
       CAST(n_bursts AS BIGINT) AS n_bursts,
       CAST(floor(CAST(uptime_us AS DOUBLE) / (n_bursts - 1) + {_OFF})
            AS BIGINT) AS mtbf_us,
       CAST(floor(CAST(downtime_us AS DOUBLE) / n_bursts + {_OFF})
            AS BIGINT) AS mttr_us,
       CAST(floor((1.0 - CAST(downtime_us AS DOUBLE) / (span1 - span0))
                  * 1000000 + {_OFF}) AS BIGINT) AS avail_e6
FROM agg
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "twoway_anova_balanced": q_twoway_anova_balanced,
    "scheirer_ray_hare": q_scheirer_ray_hare,
    "polynomial_contrasts": q_polynomial_contrasts,
    "mtbf_mttr": q_mtbf_mttr,
}

ORACLE_SQL: dict[str, str] = {
    "twoway_anova_balanced": SQL_TWOWAY,
    "scheirer_ray_hare": SQL_SRH,
    "polynomial_contrasts": SQL_CONTRASTS,
    "mtbf_mttr": SQL_MTBF,
}


# ---------------------------------------------------------------------------
# lad_regression — exact least-absolute-deviations line on daily means
# ---------------------------------------------------------------------------
# The L1-optimal line passes through two data points (classical LP
# basic-solution fact), so the exhaustive candidate set is the C(30,2)
# pairwise slopes.  For candidate (dy, dx): residual numerators
# r_i = y_i*dx - dy*x_i are exact BIGINTs; the optimal intercept is the
# |dx|-scaled lower median of r_i, the loss is sum|r_i - med| (exact),
# and candidate losses compare by CROSS-MULTIPLICATION loss*|dx'| vs
# loss'*|dx| — the whole argmin is integer-exact, no epsilon anywhere.


def q_lad_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = (
        ev.groupBy("day")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", F.col("v"))).alias(
                "sx"
            ),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("nx"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("v"))
            ).alias("sy"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "ny"
            ),
        )
        .filter((F.col("nx") > 0) & (F.col("ny") > 0))
        .select(
            "day",
            F.floor(
                F.col("sx").cast("double") / F.col("nx").cast("double") * 100
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("x"),
            F.floor(
                F.col("sy").cast("double") / F.col("ny").cast("double") * 100
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("y"),
        )
    )
    a = d.select(
        F.col("day").alias("di"), F.col("x").alias("xi"), F.col("y").alias("yi")
    )
    b = d.select(
        F.col("day").alias("dj"), F.col("x").alias("xj"), F.col("y").alias("yj")
    )
    cand = a.join(b, F.col("di") < F.col("dj")).filter(
        F.col("xj") != F.col("xi")
    ).select(
        "di",
        "dj",
        (F.col("yj") - F.col("yi")).alias("dy"),
        (F.col("xj") - F.col("xi")).alias("dx"),
    )
    # residual numerators per (candidate, point); |dx| normalization kept
    # symbolic until the final cross-multiplied compare
    pts = cand.crossJoin(d).select(
        "di",
        "dj",
        "dy",
        "dx",
        "day",
        (F.col("y") * F.col("dx") - F.col("dy") * F.col("x")).alias("r"),
        F.abs(F.col("dx")).alias("adx"),
    )
    wmed = Window.partitionBy("di", "dj").orderBy("r", "day")
    wn = Window.partitionBy("di", "dj")
    pts = pts.withColumn("rk", F.row_number().over(wmed)).withColumn(
        "np", F.count(F.lit(1)).over(wn)
    )
    med = pts.filter(
        F.col("rk") == F.floor((F.col("np") + 1) / 2).cast("int")
    ).select("di", "dj", F.col("r").alias("med_r"))
    loss = (
        pts.join(med, ["di", "dj"])
        .groupBy("di", "dj", "dy", "dx", "adx", "med_r")
        .agg(F.sum(F.abs(F.col("r") - F.col("med_r"))).alias("l"))
    )
    # integer-exact argmin: compare l/adx via cross-multiplication.
    # adx <= 5e6 and l <= 30*|r| <= ~3e13 => l*adx' <= ~1.5e20 overflows
    # int64, so compare in DOUBLE — products of exact ints are the same
    # doubles in both engines; ties broken by (di, dj).
    scored = loss.select(
        "di",
        "dj",
        "dy",
        "dx",
        "med_r",
        (F.col("l").cast("double") / F.col("adx").cast("double")).alias(
            "nloss"
        ),
    )
    best = scored.orderBy("nloss", "di", "dj").limit(1)
    return best.select(
        F.col("di").cast("string").alias("di"),
        F.col("dj").cast("string").alias("dj"),
        F.floor(
            F.col("dy").cast("double") / F.col("dx").cast("double") * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("slope_e6"),
        F.floor(
            F.col("med_r").cast("double") / F.col("dx").cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("intercept_centi"),
        F.floor(F.col("nloss") + F.lit(_OFF)).cast("long").alias("loss_centi"),
    )


SQL_LAD = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
  WHERE event_type IN ('purchase', 'click')
), d AS (
  SELECT day,
         CAST(floor(CAST(sum(CASE WHEN event_type = 'click' THEN v END)
                         AS DOUBLE)
                    / count(CASE WHEN event_type = 'click' THEN 1 END)
                    * 100 + {_OFF}) AS BIGINT) AS x,
         CAST(floor(CAST(sum(CASE WHEN event_type = 'purchase' THEN v END)
                         AS DOUBLE)
                    / count(CASE WHEN event_type = 'purchase' THEN 1 END)
                    * 100 + {_OFF}) AS BIGINT) AS y
  FROM ev GROUP BY 1
  HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
     AND count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
), cand AS (
  SELECT a.day AS di, b.day AS dj,
         b.y - a.y AS dy, b.x - a.x AS dx, abs(b.x - a.x) AS adx
  FROM d a JOIN d b ON a.day < b.day AND b.x <> a.x
), pts AS (
  SELECT c.di, c.dj, c.dy, c.dx, c.adx, d.day,
         d.y * c.dx - c.dy * d.x AS r
  FROM cand c CROSS JOIN d
), rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY di, dj ORDER BY r, day) AS rk,
         count(*) OVER (PARTITION BY di, dj) AS np
  FROM pts
), med AS (
  SELECT di, dj, r AS med_r FROM rk
  WHERE rk = CAST(floor((np + 1) / 2) AS INT)
), loss AS (
  SELECT p.di, p.dj, p.dy, p.dx, p.adx, m.med_r,
         CAST(sum(abs(p.r - m.med_r)) AS BIGINT) AS l
  FROM pts p JOIN med m ON m.di = p.di AND m.dj = p.dj
  GROUP BY 1, 2, 3, 4, 5, 6
), scored AS (
  SELECT *, CAST(l AS DOUBLE) / adx AS nloss,
         row_number() OVER (ORDER BY CAST(l AS DOUBLE) / adx, di, dj)
           AS rnk
  FROM loss
)
SELECT CAST(di AS VARCHAR) AS di,
       CAST(dj AS VARCHAR) AS dj,
       CAST(floor(CAST(dy AS DOUBLE) / dx * 1e6 + {_OFF}) AS BIGINT)
         AS slope_e6,
       CAST(floor(CAST(med_r AS DOUBLE) / dx + {_OFF}) AS BIGINT)
         AS intercept_centi,
       CAST(floor(nloss + {_OFF}) AS BIGINT) AS loss_centi
FROM scored
WHERE rnk = 1
"""


# ---------------------------------------------------------------------------
# ransac_line — exhaustive-candidate RANSAC consensus line
# (Fischler & Bolles 1981, determinized: every point pair is a
# hypothesis, no sampling)
# ---------------------------------------------------------------------------
# Inlier test |y - (a + b x)| <= tol becomes the exact integer
# comparison |r_i - r_anchor| <= tol * |dx| with r_i = y_i*dx - dy*x_i
# (anchor = the hypothesis pair's own residual numerator).  Best
# hypothesis = max inliers, tie -> (di, dj).  Everything BIGINT.


def q_ransac_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    TOL = 300  # centi-units tolerance band
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = (
        ev.groupBy("day")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", F.col("v"))).alias(
                "sx"
            ),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("nx"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("v"))
            ).alias("sy"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "ny"
            ),
        )
        .filter((F.col("nx") > 0) & (F.col("ny") > 0))
        .select(
            "day",
            F.floor(
                F.col("sx").cast("double") / F.col("nx").cast("double") * 100
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("x"),
            F.floor(
                F.col("sy").cast("double") / F.col("ny").cast("double") * 100
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("y"),
        )
    )
    a = d.select(
        F.col("day").alias("di"), F.col("x").alias("xi"), F.col("y").alias("yi")
    )
    b = d.select(
        F.col("day").alias("dj"), F.col("x").alias("xj"), F.col("y").alias("yj")
    )
    cand = a.join(b, F.col("di") < F.col("dj")).filter(
        F.col("xj") != F.col("xi")
    ).select(
        "di",
        "dj",
        (F.col("yj") - F.col("yi")).alias("dy"),
        (F.col("xj") - F.col("xi")).alias("dx"),
        F.col("xi"),
        F.col("yi"),
    )
    pts = cand.crossJoin(d)
    r = F.col("y") * F.col("dx") - F.col("dy") * F.col("x")
    r0 = F.col("yi") * F.col("dx") - F.col("dy") * F.col("xi")
    inlier = (
        F.abs(r - r0) <= F.lit(TOL) * F.abs(F.col("dx"))
    ).cast("long")
    scored = pts.groupBy("di", "dj", "dy", "dx").agg(
        F.sum(inlier).alias("n_inliers"),
        F.count(F.lit(1)).alias("n_pts"),
    )
    best = scored.orderBy(
        F.col("n_inliers").desc(), "di", "dj"
    ).limit(1)
    return best.select(
        F.col("di").cast("string").alias("di"),
        F.col("dj").cast("string").alias("dj"),
        F.col("n_pts").cast("long").alias("n_pts"),
        F.col("n_inliers").cast("long").alias("n_inliers"),
        F.floor(
            F.col("dy").cast("double") / F.col("dx").cast("double") * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("slope_e6"),
    )


SQL_RANSAC = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
  WHERE event_type IN ('purchase', 'click')
), d AS (
  SELECT day,
         CAST(floor(CAST(sum(CASE WHEN event_type = 'click' THEN v END)
                         AS DOUBLE)
                    / count(CASE WHEN event_type = 'click' THEN 1 END)
                    * 100 + {_OFF}) AS BIGINT) AS x,
         CAST(floor(CAST(sum(CASE WHEN event_type = 'purchase' THEN v END)
                         AS DOUBLE)
                    / count(CASE WHEN event_type = 'purchase' THEN 1 END)
                    * 100 + {_OFF}) AS BIGINT) AS y
  FROM ev GROUP BY 1
  HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
     AND count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
), cand AS (
  SELECT a.day AS di, b.day AS dj,
         b.y - a.y AS dy, b.x - a.x AS dx,
         a.x AS xi, a.y AS yi
  FROM d a JOIN d b ON a.day < b.day AND b.x <> a.x
), scored AS (
  SELECT c.di, c.dj, c.dy, c.dx,
         count(*) AS n_pts,
         CAST(sum(CASE WHEN abs((d.y * c.dx - c.dy * d.x)
                               - (c.yi * c.dx - c.dy * c.xi))
                            <= 300 * abs(c.dx)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
  FROM cand c CROSS JOIN d
  GROUP BY 1, 2, 3, 4
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_inliers DESC, di, dj) AS rk
  FROM scored
)
SELECT CAST(di AS VARCHAR) AS di,
       CAST(dj AS VARCHAR) AS dj,
       CAST(n_pts AS BIGINT) AS n_pts,
       n_inliers,
       CAST(floor(CAST(dy AS DOUBLE) / dx * 1e6 + {_OFF}) AS BIGINT)
         AS slope_e6
FROM ranked
WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# vonmises_fit — von Mises concentration fit on minute-of-day angles
# (Best & Fisher 1981 kappa approximation; Mardia & Jupp 2000)
# ---------------------------------------------------------------------------
# C/S are e6-floored per-row cos/sin sums (exact BIGINTs); Rbar and the
# piecewise Best-Fisher kappa are identical doubles; the mean direction
# comes from atan2 shifted into [0, 2 pi).


def q_vonmises_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (F.hour("ts") * 60 + F.minute("ts")).cast("double")
            * (2.0 * math.pi / 1440.0)
        ).alias("ang"),
    )
    t = ev.withColumn(
        "c_e6", F.floor(F.cos("ang") * 1_000_000 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "s_e6", F.floor(F.sin("ang") * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_e6").alias("c"),
        F.sum("s_e6").alias("s"),
    )
    cd = F.col("c").cast("double")
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    rbar = F.sqrt(cd * cd + sd * sd) / (nd * 1e6)
    kappa = (
        F.when(
            rbar < 0.53,
            2 * rbar + F.pow(rbar, 3) + F.lit(5.0) * F.pow(rbar, 5) / 6.0,
        )
        .when(rbar < 0.85, -0.4 + 1.39 * rbar + 0.43 / (1 - rbar))
        .otherwise(
            1.0 / (F.pow(rbar, 3) - 4 * F.pow(rbar, 2) + 3 * rbar)
        )
    )
    mu = F.atan2(sd, cd)
    mu_pos = F.when(mu < 0, mu + F.lit(2.0 * math.pi)).otherwise(mu)
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(rbar * 1_000_000 + F.lit(_OFF)).cast("long").alias("rbar_e6"),
        F.floor(kappa * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "kappa_e6"
        ),
        F.floor(mu_pos / (2.0 * math.pi) * 1440 + F.lit(_OFF))
        .cast("long")
        .alias("mu_minute"),
    ).orderBy("event_type")


SQL_VONMISES = f"""
WITH ev AS (
  SELECT event_type,
         (EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts))
           * (2 * pi() / 1440.0) AS ang
  FROM events
), t AS (
  SELECT event_type,
         CAST(floor(cos(ang) * 1000000 + {_OFF}) AS BIGINT) AS c_e6,
         CAST(floor(sin(ang) * 1000000 + {_OFF}) AS BIGINT) AS s_e6
  FROM ev
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(c_e6) AS BIGINT) AS c,
         CAST(sum(s_e6) AS BIGINT) AS s
  FROM t GROUP BY 1
), f AS (
  SELECT event_type, n,
         sqrt(CAST(c AS DOUBLE) * c + CAST(s AS DOUBLE) * s)
           / (CAST(n AS DOUBLE) * 1e6) AS rbar,
         atan2(CAST(s AS DOUBLE), CAST(c AS DOUBLE)) AS mu
  FROM g
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(rbar * 1000000 + {_OFF}) AS BIGINT) AS rbar_e6,
       CAST(floor(CASE
              WHEN rbar < 0.53
                THEN 2 * rbar + rbar ^ 3 + 5.0 * rbar ^ 5 / 6.0
              WHEN rbar < 0.85
                THEN -0.4 + 1.39 * rbar + 0.43 / (1 - rbar)
              ELSE 1.0 / (rbar ^ 3 - 4 * rbar ^ 2 + 3 * rbar)
            END * 1000000 + {_OFF}) AS BIGINT) AS kappa_e6,
       CAST(floor((CASE WHEN mu < 0 THEN mu + 2 * pi() ELSE mu END)
                  / (2 * pi()) * 1440 + {_OFF}) AS BIGINT) AS mu_minute
FROM f
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# fisher_lee_circcorr — circular-circular correlation between
# minute-of-day and day-of-month angles (Fisher & Lee 1983)
# ---------------------------------------------------------------------------
# rho_T = sum sin(a - abar) sin(b - bbar) /
#         sqrt(sum sin^2(a - abar) * sum sin^2(b - bbar)); the angular
# means come from exact e6-floored C/S sums (stage 1, broadcast back),
# then stage-2 per-row sin terms are e6-floored before the exact sums.


def q_fisher_lee_circcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (F.hour("ts") * 60 + F.minute("ts")).cast("double")
            * (2.0 * math.pi / 1440.0)
        ).alias("a"),
        (
            (F.dayofmonth("ts") - 1).cast("double")
            * (2.0 * math.pi / 31.0)
        ).alias("b"),
    )
    t = (
        ev.withColumn(
            "ca", F.floor(F.cos("a") * 1_000_000 + F.lit(_OFF)).cast("long")
        )
        .withColumn(
            "sa", F.floor(F.sin("a") * 1_000_000 + F.lit(_OFF)).cast("long")
        )
        .withColumn(
            "cb", F.floor(F.cos("b") * 1_000_000 + F.lit(_OFF)).cast("long")
        )
        .withColumn(
            "sb", F.floor(F.sin("b") * 1_000_000 + F.lit(_OFF)).cast("long")
        )
    )
    g = t.groupBy("event_type").agg(
        F.sum("ca").alias("sca"),
        F.sum("sa").alias("ssa"),
        F.sum("cb").alias("scb"),
        F.sum("sb").alias("ssb"),
    )
    means = g.select(
        "event_type",
        F.atan2(F.col("ssa").cast("double"), F.col("sca").cast("double")).alias(
            "abar"
        ),
        F.atan2(F.col("ssb").cast("double"), F.col("scb").cast("double")).alias(
            "bbar"
        ),
    )
    t2 = t.join(F.broadcast(means), "event_type")
    u = F.sin(F.col("a") - F.col("abar"))
    v = F.sin(F.col("b") - F.col("bbar"))
    t2 = t2.withColumn(
        "u_e6", F.floor(u * 1_000_000 + F.lit(_OFF)).cast("long")
    ).withColumn("v_e6", F.floor(v * 1_000_000 + F.lit(_OFF)).cast("long"))
    agg = t2.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("u_e6") * F.col("v_e6")).alias("suv"),
        F.sum(F.col("u_e6") * F.col("u_e6")).alias("suu"),
        F.sum(F.col("v_e6") * F.col("v_e6")).alias("svv"),
    )
    rho = F.col("suv").cast("double") / F.sqrt(
        F.col("suu").cast("double") * F.col("svv").cast("double")
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("suv").cast("long").alias("suv"),
        F.floor(rho * 1_000_000 + F.lit(_OFF)).cast("long").alias("rho_e6"),
    ).orderBy("event_type")


SQL_FISHER_LEE = f"""
WITH ev AS (
  SELECT event_type,
         (EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts))
           * (2 * pi() / 1440.0) AS a,
         (EXTRACT(day FROM ts) - 1) * (2 * pi() / 31.0) AS b
  FROM events
), t AS (
  SELECT event_type, a, b,
         CAST(floor(cos(a) * 1000000 + {_OFF}) AS BIGINT) AS ca,
         CAST(floor(sin(a) * 1000000 + {_OFF}) AS BIGINT) AS sa,
         CAST(floor(cos(b) * 1000000 + {_OFF}) AS BIGINT) AS cb,
         CAST(floor(sin(b) * 1000000 + {_OFF}) AS BIGINT) AS sb
  FROM ev
), g AS (
  SELECT event_type,
         atan2(CAST(sum(sa) AS DOUBLE), CAST(sum(ca) AS DOUBLE)) AS abar,
         atan2(CAST(sum(sb) AS DOUBLE), CAST(sum(cb) AS DOUBLE)) AS bbar
  FROM t GROUP BY 1
), t2 AS (
  SELECT t.event_type,
         CAST(floor(sin(a - abar) * 1000000 + {_OFF}) AS BIGINT) AS u_e6,
         CAST(floor(sin(b - bbar) * 1000000 + {_OFF}) AS BIGINT) AS v_e6
  FROM t JOIN g ON g.event_type = t.event_type
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(u_e6 * v_e6) AS BIGINT) AS suv,
         CAST(sum(u_e6 * u_e6) AS BIGINT) AS suu,
         CAST(sum(v_e6 * v_e6) AS BIGINT) AS svv
  FROM t2 GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       suv,
       CAST(floor(CAST(suv AS DOUBLE)
                  / sqrt(CAST(suu AS DOUBLE) * svv) * 1000000 + {_OFF})
            AS BIGINT) AS rho_e6
FROM agg
ORDER BY event_type
"""


QUERIES.update(
    {
        "lad_regression": q_lad_regression,
        "ransac_line": q_ransac_line,
        "vonmises_fit": q_vonmises_fit,
        "fisher_lee_circcorr": q_fisher_lee_circcorr,
    }
)

ORACLE_SQL.update(
    {
        "lad_regression": SQL_LAD,
        "ransac_line": SQL_RANSAC,
        "vonmises_fit": SQL_VONMISES,
        "fisher_lee_circcorr": SQL_FISHER_LEE,
    }
)
