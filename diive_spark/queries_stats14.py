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
from diive_spark.queries_stats13 import _rss_sql


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


# ---------------------------------------------------------------------------
# kz_filter — Kolmogorov-Zurbenko KZ(25,3) low-pass on hourly means
# (Zurbenko 1986; the EPA air-quality standard smoother)
# ---------------------------------------------------------------------------
# Three iterated length-25 moving averages.  The key exactness move:
# iterate on NUMERATORS — ma1 = 25-row sum of e4 ints, ma2 = 25-row sum
# of ma1, ma3 = 25-row sum of ma2 — all exact BIGINTs with the constant
# denominator 25^3; only full (valid-mode) windows survive each pass.
# Reported per type: valid length, variance-reduction ratio, max
# smoothed value.


def q_kz_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    M = 25
    H = M // 2
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    hm = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double") * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )
    wo = Window.partitionBy("event_type").orderBy("hr")
    idx = hm.withColumn("i", F.row_number().over(wo)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    wmov = Window.partitionBy("event_type").orderBy("i").rowsBetween(-H, H)
    t = idx.withColumn("m1", F.sum("y").over(wmov)).withColumn(
        "c1", F.count(F.lit(1)).over(wmov)
    )
    t = t.withColumn(
        "m1", F.when(F.col("c1") == M, F.col("m1"))
    )
    t = t.withColumn("m2", F.sum("m1").over(wmov)).withColumn(
        "c2", F.count("m1").over(wmov)
    )
    t = t.withColumn(
        "m2", F.when(F.col("c2") == M, F.col("m2"))
    )
    t = t.withColumn("m3", F.sum("m2").over(wmov)).withColumn(
        "c3", F.count("m2").over(wmov)
    )
    t = t.withColumn(
        "m3", F.when(F.col("c3") == M, F.col("m3"))
    )
    valid = t.filter(F.col("m3").isNotNull())
    agg_raw = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    agg_kz = valid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("m3").alias("sm"),
        # m3 <= 25^3 * 5e6 ~ 7.8e10; m3^2 ~ 6e21 overflows, so sum the
        # denominator-reduced double (identical in both engines after
        # e4 flooring per row)
        F.sum(
            F.floor(
                F.pow(F.col("m3").cast("double") / (M * M * M), 2) / 100.0
                + F.lit(_OFF)
            ).cast("long")
        ).alias("smm_d2"),
        F.max("m3").alias("max_m3"),
    )
    j = agg_raw.join(agg_kz, "event_type")
    nd = F.col("n").cast("double")
    nv = F.col("nv").cast("double")
    var_raw = (
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    ) / (nd * (nd - 1))
    mean_kz = F.col("sm").cast("double") / (M * M * M) / nv
    var_kz = (
        F.col("smm_d2").cast("double") * 100.0 / nv - mean_kz * mean_kz
    ) * nv / (nv - 1)
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("nv").cast("long").alias("n_valid"),
        F.floor(var_kz / var_raw * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("var_ratio_e6"),
        F.floor(
            F.col("max_m3").cast("double") / (M * M * M) + F.lit(_OFF)
        )
        .cast("long")
        .alias("max_kz_e4"),
    ).orderBy("event_type")


SQL_KZ = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), hm AS (
  SELECT event_type, hr,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 100 + {_OFF})
              AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), idx AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM hm
), p1 AS (
  SELECT *,
         CASE WHEN count(*) OVER w = 25
              THEN CAST(sum(y) OVER w AS BIGINT) END AS m1
  FROM idx
  WINDOW w AS (PARTITION BY event_type ORDER BY i
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), p2 AS (
  SELECT *,
         CASE WHEN count(m1) OVER w = 25
              THEN CAST(sum(m1) OVER w AS BIGINT) END AS m2
  FROM p1
  WINDOW w AS (PARTITION BY event_type ORDER BY i
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), p3 AS (
  SELECT *,
         CASE WHEN count(m2) OVER w = 25
              THEN CAST(sum(m2) OVER w AS BIGINT) END AS m3
  FROM p2
  WINDOW w AS (PARTITION BY event_type ORDER BY i
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), agg_raw AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM idx GROUP BY 1
), agg_kz AS (
  SELECT event_type, count(*) AS nv,
         CAST(sum(m3) AS BIGINT) AS sm,
         CAST(sum(CAST(floor((CAST(m3 AS DOUBLE) / 15625) ^ 2 / 100.0
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS smm_d2,
         CAST(max(m3) AS BIGINT) AS max_m3
  FROM p3 WHERE m3 IS NOT NULL
  GROUP BY 1
)
SELECT r.event_type,
       CAST(r.n AS BIGINT) AS n_hours,
       CAST(k.nv AS BIGINT) AS n_valid,
       CAST(floor(
         ((CAST(k.smm_d2 AS DOUBLE) * 100.0 / k.nv
           - (CAST(k.sm AS DOUBLE) / 15625 / k.nv) ^ 2) * k.nv / (k.nv - 1))
         / ((CAST(r.n AS DOUBLE) * r.syy - CAST(r.sy AS DOUBLE) * r.sy)
            / (CAST(r.n AS DOUBLE) * (r.n - 1)))
         * 1000000 + {_OFF}) AS BIGINT) AS var_ratio_e6,
       CAST(floor(CAST(k.max_m3 AS DOUBLE) / 15625 + {_OFF}) AS BIGINT)
         AS max_kz_e4
FROM agg_raw r JOIN agg_kz k ON k.event_type = r.event_type
ORDER BY r.event_type
"""


# ---------------------------------------------------------------------------
# savitzky_golay — quadratic SG(7) smoothing on hourly means
# (Savitzky & Golay 1964; integer coefficients (-2,3,6,7,6,3,-2)/21)
# ---------------------------------------------------------------------------
# The convolution is EXACT: integer coefficient dot products over
# lag/lead values, denominator 21 constant; valid-mode edges.  Reported
# per type: smoothing MSE vs raw and the peak smoothed value.


def q_savitzky_golay(spark: SparkSession, sf_dir: str) -> DataFrame:
    COEF = [-2, 3, 6, 7, 6, 3, -2]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    hm = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double") * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )
    wo = Window.partitionBy("event_type").orderBy("hr")
    t = hm.withColumn("i", F.row_number().over(wo))
    conv = None
    for k, c in enumerate(COEF):
        off = k - 3
        col = (
            F.lag("y", -off).over(wo)
            if off < 0
            else (F.lead("y", off).over(wo) if off > 0 else F.col("y"))
        )
        term = F.lit(c).cast("long") * col
        conv = term if conv is None else conv + term
    t = t.withColumn("sg21", conv)
    valid = t.filter(F.col("sg21").isNotNull())
    # residual in 1/21 units: 21*y - sg21 exact
    agg = valid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum(
            (F.lit(21) * F.col("y") - F.col("sg21"))
            * (F.lit(21) * F.col("y") - F.col("sg21"))
        ).alias("sse441"),
        F.max("sg21").alias("max21"),
    )
    return agg.select(
        "event_type",
        F.col("nv").cast("long").alias("n_valid"),
        F.floor(
            F.col("sse441").cast("double")
            / 441.0
            / F.col("nv").cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mse_e8"),
        F.floor(F.col("max21").cast("double") / 21.0 + F.lit(_OFF))
        .cast("long")
        .alias("max_sg_e4"),
    ).orderBy("event_type")


SQL_SG = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), hm AS (
  SELECT event_type, hr,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 100 + {_OFF})
              AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), t AS (
  SELECT event_type, y,
         -2 * lag(y, 3) OVER w + 3 * lag(y, 2) OVER w
         + 6 * lag(y, 1) OVER w + 7 * y
         + 6 * lead(y, 1) OVER w + 3 * lead(y, 2) OVER w
         - 2 * lead(y, 3) OVER w AS sg21
  FROM hm
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), valid AS (
  SELECT * FROM t WHERE sg21 IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS nv,
         CAST(sum((21 * y - sg21) * (21 * y - sg21)) AS BIGINT) AS sse441,
         CAST(max(sg21) AS BIGINT) AS max21
  FROM valid GROUP BY 1
)
SELECT event_type,
       CAST(nv AS BIGINT) AS n_valid,
       CAST(floor(CAST(sse441 AS DOUBLE) / 441.0 / nv + {_OFF}) AS BIGINT)
         AS mse_e8,
       CAST(floor(CAST(max21 AS DOUBLE) / 21.0 + {_OFF}) AS BIGINT)
         AS max_sg_e4
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ztp_fit — zero-truncated Poisson MLE for events-per-active-day
# (David & Johnson 1952; three unrolled Newton steps, house fixed-point
# pattern)
# ---------------------------------------------------------------------------
# Mean of the ZTP is lambda/(1 - exp(-lambda)); starting from
# lambda0 = mean, three Newton iterations on f(l) = l/(1-exp(-l)) - m
# are the identical double chain from the exact integer count sums.


def q_ztp_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.to_date("ts").alias("day")
    )
    c = ev.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("k"))
    agg = c.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sk"),
        F.sum((F.col("k") == 1).cast("long")).alias("n1"),
    )
    m = F.col("sk").cast("double") / F.col("n").cast("double")
    lam = m
    for _ in range(3):
        e = F.exp(-lam)
        f = lam / (1 - e) - m
        fp = (1 - e - lam * e) / F.pow(1 - e, 2)
        lam = lam - f / fp
    return agg.select(
        F.col("n").cast("long").alias("n_user_days"),
        F.col("sk").cast("long").alias("n_events"),
        F.col("n1").cast("long").alias("n_singletons"),
        F.floor(m * 1_000_000 + F.lit(_OFF)).cast("long").alias("mean_e6"),
        F.floor(lam * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "lambda_e6"
        ),
    )


SQL_ZTP = f"""
WITH c AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS k
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT count(*) AS n,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM c
), it AS (
  SELECT n, sk, n1,
         CAST(sk AS DOUBLE) / n AS m
  FROM agg
), s1 AS (
  SELECT *,
         m - (m / (1 - exp(-m)) - m)
             / ((1 - exp(-m) - m * exp(-m)) / (1 - exp(-m)) ^ 2) AS l1
  FROM it
), s2 AS (
  SELECT *,
         l1 - (l1 / (1 - exp(-l1)) - m)
              / ((1 - exp(-l1) - l1 * exp(-l1)) / (1 - exp(-l1)) ^ 2) AS l2
  FROM s1
), s3 AS (
  SELECT *,
         l2 - (l2 / (1 - exp(-l2)) - m)
              / ((1 - exp(-l2) - l2 * exp(-l2)) / (1 - exp(-l2)) ^ 2) AS l3
  FROM s2
)
SELECT CAST(n AS BIGINT) AS n_user_days,
       sk AS n_events,
       n1 AS n_singletons,
       CAST(floor(m * 1000000 + {_OFF}) AS BIGINT) AS mean_e6,
       CAST(floor(l3 * 1000000 + {_OFF}) AS BIGINT) AS lambda_e6
FROM s3
"""


# ---------------------------------------------------------------------------
# dersimonian_laird — random-effects meta-analysis of the daily
# purchase-click mean difference (DerSimonian & Laird 1986)
# ---------------------------------------------------------------------------
# Each day is a "study": effect = mean difference, variance =
# var_p/n_p + var_c/n_c from exact numerator-trick sums.  Fixed-effect
# weights w = 1/v; Cochran's Q; tau^2 = max(0, (Q - (k-1)) /
# (sum w - sum w^2 / sum w)); random-effects pooled mean with weights
# 1/(v + tau^2).  Per-day terms e9-floored before the exact sums.


def q_dersimonian_laird(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = ev.groupBy("day").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("v"))).alias(
            "sp"
        ),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("v") * F.col("v")
            )
        ).alias("qp"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("nc"),
        F.sum(F.when(F.col("event_type") == "click", F.col("v"))).alias("sc"),
        F.sum(
            F.when(F.col("event_type") == "click", F.col("v") * F.col("v"))
        ).alias("qc"),
    ).filter((F.col("np") > 1) & (F.col("nc") > 1))
    npd = F.col("np").cast("double")
    ncd = F.col("nc").cast("double")
    eff = F.col("sp").cast("double") / npd - F.col("sc").cast("double") / ncd
    varp = (
        npd * F.col("qp").cast("double")
        - F.col("sp").cast("double") * F.col("sp").cast("double")
    ) / (npd * (npd - 1))
    varc = (
        ncd * F.col("qc").cast("double")
        - F.col("sc").cast("double") * F.col("sc").cast("double")
    ) / (ncd * (ncd - 1))
    vi = varp / npd + varc / ncd
    w = 1.0 / vi
    t = d.select(
        F.floor(eff * 1_000_000 + F.lit(_OFF)).cast("long").alias("e_e6"),
        F.floor(w * 1e9 + F.lit(_OFF)).cast("long").alias("w_e9"),
        F.floor(w * w * 1e9 + F.lit(_OFF)).cast("long").alias("w2_e9"),
        F.floor(w * eff * 1e6 + F.lit(_OFF)).cast("long").alias("we_e6"),
        F.floor(w * eff * eff * 1e4 + F.lit(_OFF)).cast("long").alias(
            "wee_e4"
        ),
        F.floor(vi * 1e6 + F.lit(_OFF)).cast("long").alias("v_e6"),
    )
    agg = t.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("w_e9").alias("sw"),
        F.sum("w2_e9").alias("sw2"),
        F.sum("we_e6").alias("swe"),
        F.sum("wee_e4").alias("swee"),
        F.sum("v_e6").alias("sv"),
    )
    kd = F.col("k").cast("double")
    sw = F.col("sw").cast("double") / 1e9
    sw2 = F.col("sw2").cast("double") / 1e9
    swe = F.col("swe").cast("double") / 1e6
    swee = F.col("swee").cast("double") / 1e4
    mu_fe = swe / sw
    q = swee - swe * swe / sw
    tau2 = F.greatest(
        F.lit(0.0), (q - (kd - 1)) / (sw - sw2 / sw)
    )
    # random-effects weights approximated with the mean within-study
    # variance (identical closed chain in both engines)
    vbar = F.col("sv").cast("double") / 1e6 / kd
    mu_re = swe / sw * (vbar / (vbar + tau2)) + mu_fe * (
        tau2 / (vbar + tau2)
    )
    return agg.select(
        F.col("k").cast("long").alias("k_days"),
        F.floor(mu_fe * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mu_fixed_e4"
        ),
        F.floor(q * 10_000 + F.lit(_OFF)).cast("long").alias("q_e4"),
        F.floor(tau2 * 10_000 + F.lit(_OFF)).cast("long").alias("tau2_e4"),
        F.floor(mu_re * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mu_random_e4"
        ),
    )


SQL_DL = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
  WHERE event_type IN ('purchase', 'click')
), d AS (
  SELECT day,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS np,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN v END) AS BIGINT)
           AS sp,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN v * v END)
              AS BIGINT) AS qp,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS nc,
         CAST(sum(CASE WHEN event_type = 'click' THEN v END) AS BIGINT)
           AS sc,
         CAST(sum(CASE WHEN event_type = 'click' THEN v * v END) AS BIGINT)
           AS qc
  FROM ev GROUP BY 1
  HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END) > 1
     AND count(CASE WHEN event_type = 'click' THEN 1 END) > 1
), s AS (
  SELECT day,
         CAST(sp AS DOUBLE) / np - CAST(sc AS DOUBLE) / nc AS eff,
         (CAST(np AS DOUBLE) * qp - CAST(sp AS DOUBLE) * sp)
           / (CAST(np AS DOUBLE) * (np - 1)) / np
         + (CAST(nc AS DOUBLE) * qc - CAST(sc AS DOUBLE) * sc)
           / (CAST(nc AS DOUBLE) * (nc - 1)) / nc AS vi
  FROM d
), t AS (
  SELECT CAST(floor(eff * 1000000 + {_OFF}) AS BIGINT) AS e_e6,
         CAST(floor(1.0 / vi * 1e9 + {_OFF}) AS BIGINT) AS w_e9,
         CAST(floor(1.0 / vi / vi * 1e9 + {_OFF}) AS BIGINT) AS w2_e9,
         CAST(floor(eff / vi * 1e6 + {_OFF}) AS BIGINT) AS we_e6,
         CAST(floor(eff * eff / vi * 1e4 + {_OFF}) AS BIGINT) AS wee_e4,
         CAST(floor(vi * 1e6 + {_OFF}) AS BIGINT) AS v_e6
  FROM s
), agg AS (
  SELECT count(*) AS k,
         CAST(sum(w_e9) AS BIGINT) AS sw,
         CAST(sum(w2_e9) AS BIGINT) AS sw2,
         CAST(sum(we_e6) AS BIGINT) AS swe,
         CAST(sum(wee_e4) AS BIGINT) AS swee,
         CAST(sum(v_e6) AS BIGINT) AS sv
  FROM t
), f AS (
  SELECT CAST(k AS BIGINT) AS k,
         CAST(sw AS DOUBLE) / 1e9 AS sw,
         CAST(sw2 AS DOUBLE) / 1e9 AS sw2,
         CAST(swe AS DOUBLE) / 1e6 AS swe,
         CAST(swee AS DOUBLE) / 1e4 AS swee,
         CAST(sv AS DOUBLE) / 1e6 / k AS vbar
  FROM agg
), g AS (
  SELECT k, swe / sw AS mu_fe,
         swee - swe * swe / sw AS q,
         greatest(0.0, (swee - swe * swe / sw - (k - 1))
                       / (sw - sw2 / sw)) AS tau2,
         vbar, sw, swe
  FROM f
)
SELECT k AS k_days,
       CAST(floor(mu_fe * 10000 + {_OFF}) AS BIGINT) AS mu_fixed_e4,
       CAST(floor(q * 10000 + {_OFF}) AS BIGINT) AS q_e4,
       CAST(floor(tau2 * 10000 + {_OFF}) AS BIGINT) AS tau2_e4,
       CAST(floor((swe / sw * (vbar / (vbar + tau2))
                   + mu_fe * (tau2 / (vbar + tau2))) * 10000 + {_OFF})
            AS BIGINT) AS mu_random_e4
FROM g
"""


QUERIES.update(
    {
        "kz_filter": q_kz_filter,
        "savitzky_golay": q_savitzky_golay,
        "ztp_fit": q_ztp_fit,
        "dersimonian_laird": q_dersimonian_laird,
    }
)

ORACLE_SQL.update(
    {
        "kz_filter": SQL_KZ,
        "savitzky_golay": SQL_SG,
        "ztp_fit": SQL_ZTP,
        "dersimonian_laird": SQL_DL,
    }
)


# ---------------------------------------------------------------------------
# bds_test — BDS correlation-integral independence test, m = 2
# (Brock, Dechert, Scheinkman 1987) on the hourly mean series
# ---------------------------------------------------------------------------
# eps = the integer floor of 0.5 * sd; over the common pair domain
# i < j <= n-1 (both leads present): C1 = #{|y_i - y_j| <= eps}/P,
# C2 = #{jointly close at t and t+1}/P.  All counts exact BIGINTs from
# a bounded per-type pair join (the hourly grid is fixed-size, so the
# join is ~260k rows/key regardless of corpus scale).


def q_bds_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    hm = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double") * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )
    wo = Window.partitionBy("event_type").orderBy("hr")
    t = hm.withColumn("i", F.row_number().over(wo)).withColumn(
        "ynext", F.lead("y").over(wo)
    ).filter(F.col("ynext").isNotNull())
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sd = F.sqrt(
        (
            nd * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
        / (nd * (nd - 1))
    )
    eps = g.select(
        "event_type",
        F.floor(F.lit(0.5) * sd + F.lit(_OFF)).cast("long").alias("eps"),
    )
    a = t.select(
        "event_type",
        F.col("i").alias("ia"),
        F.col("y").alias("ya"),
        F.col("ynext").alias("yna"),
    )
    b = t.select(
        F.col("event_type").alias("et2"),
        F.col("i").alias("ib"),
        F.col("y").alias("yb"),
        F.col("ynext").alias("ynb"),
    )
    pr = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("ia") < F.col("ib"))
    ).join(F.broadcast(eps), "event_type")
    close1 = (F.abs(F.col("ya") - F.col("yb")) <= F.col("eps")).cast("long")
    close2 = (
        (F.abs(F.col("ya") - F.col("yb")) <= F.col("eps"))
        & (F.abs(F.col("yna") - F.col("ynb")) <= F.col("eps"))
    ).cast("long")
    agg = pr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("p"),
        F.sum(close1).alias("k1"),
        F.sum(close2).alias("k2"),
        F.max("eps").alias("eps"),
    )
    c1 = F.col("k1").cast("double") / F.col("p").cast("double")
    c2 = F.col("k2").cast("double") / F.col("p").cast("double")
    return agg.select(
        "event_type",
        F.col("p").cast("long").alias("n_pairs"),
        F.col("eps").cast("long").alias("eps_e4"),
        F.col("k1").cast("long").alias("k1"),
        F.col("k2").cast("long").alias("k2"),
        F.floor((c2 - c1 * c1) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("bds_num_e6"),
    ).orderBy("event_type")


SQL_BDS = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), hm AS (
  SELECT event_type, hr,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 100 + {_OFF})
              AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), t0 AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i,
         lead(y) OVER (PARTITION BY event_type ORDER BY hr) AS ynext
  FROM hm
), t AS (
  SELECT * FROM t0 WHERE ynext IS NOT NULL
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM t GROUP BY 1
), eps AS (
  SELECT event_type,
         CAST(floor(0.5 * sqrt((CAST(n AS DOUBLE) * syy
                                - CAST(sy AS DOUBLE) * sy)
                               / (CAST(n AS DOUBLE) * (n - 1)))
                    + {_OFF}) AS BIGINT) AS eps
  FROM g
), pr AS (
  SELECT a.event_type, e.eps,
         CASE WHEN abs(a.y - b.y) <= e.eps THEN 1 ELSE 0 END AS c1,
         CASE WHEN abs(a.y - b.y) <= e.eps
               AND abs(a.ynext - b.ynext) <= e.eps THEN 1 ELSE 0 END AS c2
  FROM t a
  JOIN t b ON b.event_type = a.event_type AND a.i < b.i
  JOIN eps e ON e.event_type = a.event_type
), agg AS (
  SELECT event_type, count(*) AS p,
         CAST(sum(c1) AS BIGINT) AS k1,
         CAST(sum(c2) AS BIGINT) AS k2,
         max(eps) AS eps
  FROM pr GROUP BY 1
)
SELECT event_type,
       CAST(p AS BIGINT) AS n_pairs,
       CAST(eps AS BIGINT) AS eps_e4,
       k1, k2,
       CAST(floor((CAST(k2 AS DOUBLE) / p
                   - (CAST(k1 AS DOUBLE) / p) ^ 2) * 1000000 + {_OFF})
            AS BIGINT) AS bds_num_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# engle_granger — two-step cointegration test on daily means
# (Engle & Granger 1987)
# ---------------------------------------------------------------------------
# Stage 1: OLS purchase-mean on click-mean from exact sums; residuals
# floored to centi ints.  Stage 2: no-intercept Dickey-Fuller on the
# residuals: rho = sum e_{t-1} de_t / sum e_{t-1}^2 with its t ratio —
# everything from exact BIGINTs.


def q_engle_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    g = d.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    b = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / nd
    coef = g.select(F.lit(1).alias("k"), a.alias("a"), b.alias("b"),
                    F.col("n").alias("n_days"))
    t = d.withColumn("k", F.lit(1)).join(F.broadcast(coef), "k").withColumn(
        "e",
        F.floor(
            F.col("y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("x").cast("double")
            + F.lit(_OFF)
        ).cast("long"),
    )
    wo = Window.orderBy("day")
    t = t.withColumn("eprev", F.lag("e").over(wo)).filter(
        F.col("eprev").isNotNull()
    ).withColumn("de", F.col("e") - F.col("eprev"))
    agg = t.groupBy("n_days").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("eprev") * F.col("de")).alias("sed"),
        F.sum(F.col("eprev") * F.col("eprev")).alias("see"),
        F.sum(F.col("de") * F.col("de")).alias("sdd"),
        F.max("b").alias("b"),
    )
    md = F.col("m").cast("double")
    rho = F.col("sed").cast("double") / F.col("see").cast("double")
    s2 = (
        F.col("sdd").cast("double")
        - rho * F.col("sed").cast("double")
    ) / (md - 1)
    tstat = rho / F.sqrt(s2 / F.col("see").cast("double"))
    return agg.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.floor(F.col("b") * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "beta_e6"
        ),
        F.floor(rho * 1_000_000 + F.lit(_OFF)).cast("long").alias("rho_e6"),
        F.floor(tstat * 10_000 + F.lit(_OFF)).cast("long").alias("t_e4"),
    )


SQL_EG = f"""
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
), g AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM d
), coef AS (
  SELECT n AS n_days,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
           / n AS a
  FROM g
), resid AS (
  SELECT day, n_days, b,
         CAST(floor(CAST(y AS DOUBLE) - a - b * x + {_OFF}) AS BIGINT) AS e
  FROM d CROSS JOIN coef
), lagd AS (
  SELECT n_days, b, e,
         lag(e) OVER (ORDER BY day) AS eprev
  FROM resid
), t AS (
  SELECT n_days, b, eprev, e - eprev AS de
  FROM lagd WHERE eprev IS NOT NULL
), agg AS (
  SELECT n_days, count(*) AS m, max(b) AS b,
         CAST(sum(eprev * de) AS BIGINT) AS sed,
         CAST(sum(eprev * eprev) AS BIGINT) AS see,
         CAST(sum(de * de) AS BIGINT) AS sdd
  FROM t GROUP BY 1
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       CAST(floor(b * 1000000 + {_OFF}) AS BIGINT) AS beta_e6,
       CAST(floor(CAST(sed AS DOUBLE) / see * 1000000 + {_OFF}) AS BIGINT)
         AS rho_e6,
       CAST(floor(CAST(sed AS DOUBLE) / see
                  / sqrt(((CAST(sdd AS DOUBLE)
                           - CAST(sed AS DOUBLE) / see * sed) / (m - 1))
                         / see) * 10000 + {_OFF}) AS BIGINT) AS t_e4
FROM agg
"""


# ---------------------------------------------------------------------------
# var1_fit — bivariate VAR(1) on daily (click, purchase) means with
# stability (spectral radius) check
# ---------------------------------------------------------------------------
# Each equation is a 2-regressor OLS with intercept solved by the 3x3
# Cramer machinery on exact BIGINT lag sums; the spectral radius of the
# companion matrix comes from the closed 2x2 eigen form (complex case
# |eig| = sqrt(det)).


def q_var1_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wo = Window.orderBy("day")
    t = (
        d.withColumn("xl", F.lag("x").over(wo))
        .withColumn("yl", F.lag("y").over(wo))
        .filter(F.col("xl").isNotNull())
    )
    agg = t.groupBy().agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("xl").alias("s1"),
        F.sum("yl").alias("s2"),
        F.sum(F.col("xl") * F.col("xl")).alias("s11"),
        F.sum(F.col("yl") * F.col("yl")).alias("s22"),
        F.sum(F.col("xl") * F.col("yl")).alias("s12"),
        F.sum("x").alias("tx"),
        F.sum(F.col("x") * F.col("xl")).alias("tx1"),
        F.sum(F.col("x") * F.col("yl")).alias("tx2"),
        F.sum("y").alias("ty"),
        F.sum(F.col("y") * F.col("xl")).alias("ty1"),
        F.sum(F.col("y") * F.col("yl")).alias("ty2"),
    )
    m = F.col("m").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s11 = F.col("s11").cast("double")
    s22 = F.col("s22").cast("double")
    s12 = F.col("s12").cast("double")
    det = (
        m * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )

    def solve(c0, c1, c2):
        b1 = (
            m * (c1 * s22 - c2 * s12)
            - c0 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * c2 - s2 * c1)
        ) / det
        b2 = (
            m * (s11 * c2 - s12 * c1)
            - s1 * (s1 * c2 - s2 * c1)
            + c0 * (s1 * s12 - s11 * s2)
        ) / det
        return b1, b2

    a11, a12 = solve(
        F.col("tx").cast("double"),
        F.col("tx1").cast("double"),
        F.col("tx2").cast("double"),
    )
    a21, a22 = solve(
        F.col("ty").cast("double"),
        F.col("ty1").cast("double"),
        F.col("ty2").cast("double"),
    )
    tr = a11 + a22
    dt = a11 * a22 - a12 * a21
    disc = tr * tr - 4 * dt
    rho = F.when(
        disc >= 0,
        F.greatest(
            F.abs((tr + F.sqrt(disc)) / 2), F.abs((tr - F.sqrt(disc)) / 2)
        ),
    ).otherwise(F.sqrt(dt))
    return agg.select(
        F.col("m").cast("long").alias("m_days"),
        F.floor(a11 * 1_000_000 + F.lit(_OFF)).cast("long").alias("a11_e6"),
        F.floor(a12 * 1_000_000 + F.lit(_OFF)).cast("long").alias("a12_e6"),
        F.floor(a21 * 1_000_000 + F.lit(_OFF)).cast("long").alias("a21_e6"),
        F.floor(a22 * 1_000_000 + F.lit(_OFF)).cast("long").alias("a22_e6"),
        F.floor(rho * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "spec_rad_e6"
        ),
    )


SQL_VAR1 = f"""
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
), t AS (
  SELECT x, y,
         lag(x) OVER (ORDER BY day) AS xl,
         lag(y) OVER (ORDER BY day) AS yl
  FROM d
), v AS (
  SELECT * FROM t WHERE xl IS NOT NULL
), agg AS (
  SELECT count(*) AS m,
         CAST(sum(xl) AS BIGINT) AS s1, CAST(sum(yl) AS BIGINT) AS s2,
         CAST(sum(xl * xl) AS BIGINT) AS s11,
         CAST(sum(yl * yl) AS BIGINT) AS s22,
         CAST(sum(xl * yl) AS BIGINT) AS s12,
         CAST(sum(x) AS BIGINT) AS tx,
         CAST(sum(x * xl) AS BIGINT) AS tx1,
         CAST(sum(x * yl) AS BIGINT) AS tx2,
         CAST(sum(y) AS BIGINT) AS ty,
         CAST(sum(y * xl) AS BIGINT) AS ty1,
         CAST(sum(y * yl) AS BIGINT) AS ty2
  FROM v
), f AS (
  SELECT CAST(m AS DOUBLE) AS m, m AS m_int,
         CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
         CAST(s11 AS DOUBLE) AS s11, CAST(s22 AS DOUBLE) AS s22,
         CAST(s12 AS DOUBLE) AS s12,
         CAST(tx AS DOUBLE) AS tx, CAST(tx1 AS DOUBLE) AS tx1,
         CAST(tx2 AS DOUBLE) AS tx2,
         CAST(ty AS DOUBLE) AS ty, CAST(ty1 AS DOUBLE) AS ty1,
         CAST(ty2 AS DOUBLE) AS ty2
  FROM agg
), det AS (
  SELECT *,
         m * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
         + s2 * (s1 * s12 - s11 * s2) AS dt3
  FROM f
), coefs AS (
  SELECT m_int,
         (m * (tx1 * s22 - tx2 * s12) - tx * (s1 * s22 - s12 * s2)
          + s2 * (s1 * tx2 - s2 * tx1)) / dt3 AS a11,
         (m * (s11 * tx2 - s12 * tx1) - s1 * (s1 * tx2 - s2 * tx1)
          + tx * (s1 * s12 - s11 * s2)) / dt3 AS a12,
         (m * (ty1 * s22 - ty2 * s12) - ty * (s1 * s22 - s12 * s2)
          + s2 * (s1 * ty2 - s2 * ty1)) / dt3 AS a21,
         (m * (s11 * ty2 - s12 * ty1) - s1 * (s1 * ty2 - s2 * ty1)
          + ty * (s1 * s12 - s11 * s2)) / dt3 AS a22
  FROM det
)
SELECT CAST(m_int AS BIGINT) AS m_days,
       CAST(floor(a11 * 1000000 + {_OFF}) AS BIGINT) AS a11_e6,
       CAST(floor(a12 * 1000000 + {_OFF}) AS BIGINT) AS a12_e6,
       CAST(floor(a21 * 1000000 + {_OFF}) AS BIGINT) AS a21_e6,
       CAST(floor(a22 * 1000000 + {_OFF}) AS BIGINT) AS a22_e6,
       CAST(floor(CASE
              WHEN (a11 + a22) ^ 2 - 4 * (a11 * a22 - a12 * a21) >= 0
              THEN greatest(
                abs((a11 + a22
                     + sqrt((a11 + a22) ^ 2
                            - 4 * (a11 * a22 - a12 * a21))) / 2),
                abs((a11 + a22
                     - sqrt((a11 + a22) ^ 2
                            - 4 * (a11 * a22 - a12 * a21))) / 2))
              ELSE sqrt(a11 * a22 - a12 * a21)
            END * 1000000 + {_OFF}) AS BIGINT) AS spec_rad_e6
FROM coefs
"""


# ---------------------------------------------------------------------------
# setar_fit — two-regime SETAR(1) with decile-grid threshold search
# (Tong & Lim 1980) on the hourly mean series per event_type
# ---------------------------------------------------------------------------
# Candidate thresholds = the 9 deciles of y_{t-1} (exact order stats);
# for each c the two-regime RSS is closed-form from conditional exact
# sums; argmin (tie -> smaller c) compares identical doubles; the AR(1)
# RSS baseline gives the variance-explained ratio.


def q_setar_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    hm = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double") * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )
    wo = Window.partitionBy("event_type").orderBy("hr")
    t = hm.withColumn("yl", F.lag("y").over(wo)).filter(
        F.col("yl").isNotNull()
    )
    wq = Window.partitionBy("event_type").orderBy("yl", "hr")
    wn = Window.partitionBy("event_type")
    r = t.withColumn("rk", F.row_number().over(wq)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    dec = (
        r.withColumn("dd", F.lit(1))
        .filter(
            F.col("rk").isin(
                *[]
            )
            | (
                F.expr(
                    "rk in (cast(ceil(n*1/10.0) as int),"
                    " cast(ceil(n*2/10.0) as int),"
                    " cast(ceil(n*3/10.0) as int),"
                    " cast(ceil(n*4/10.0) as int),"
                    " cast(ceil(n*5/10.0) as int),"
                    " cast(ceil(n*6/10.0) as int),"
                    " cast(ceil(n*7/10.0) as int),"
                    " cast(ceil(n*8/10.0) as int),"
                    " cast(ceil(n*9/10.0) as int))"
                )
            )
        )
        .select("event_type", F.col("yl").alias("c"))
        .distinct()
    )
    j = t.join(dec, "event_type")
    lo = F.col("yl") <= F.col("c")

    def rss_parts(cond):
        cnt = F.sum(cond.cast("long"))
        sx = F.sum(F.when(cond, F.col("yl")).otherwise(0))
        sy = F.sum(F.when(cond, F.col("y")).otherwise(0))
        sxx = F.sum(F.when(cond, F.col("yl") * F.col("yl")).otherwise(0))
        sxy = F.sum(F.when(cond, F.col("yl") * F.col("y")).otherwise(0))
        syy = F.sum(F.when(cond, F.col("y") * F.col("y")).otherwise(0))
        return cnt, sx, sy, sxx, sxy, syy

    nl, sxl, syl, sxxl, sxyl, syyl = rss_parts(lo)
    nh, sxh, syh, sxxh, sxyh, syyh = rss_parts(~lo)
    agg = j.groupBy("event_type", "c").agg(
        nl.alias("nl"),
        sxl.alias("sxl"),
        syl.alias("syl"),
        sxxl.alias("sxxl"),
        sxyl.alias("sxyl"),
        syyl.alias("syyl"),
        nh.alias("nh"),
        sxh.alias("sxh"),
        syh.alias("syh"),
        sxxh.alias("sxxh"),
        sxyh.alias("sxyh"),
        syyh.alias("syyh"),
    ).filter((F.col("nl") >= 5) & (F.col("nh") >= 5))

    def rss(n, sx, sy, sxx, sxy, syy):
        ndd = n.cast("double")
        return (
            syy.cast("double")
            - sy.cast("double") * sy.cast("double") / ndd
            - F.pow(
                sxy.cast("double") - sx.cast("double") * sy.cast("double") / ndd,
                2,
            )
            / (sxx.cast("double") - sx.cast("double") * sx.cast("double") / ndd)
        )

    rss2 = rss(
        F.col("nl"), F.col("sxl"), F.col("syl"), F.col("sxxl"),
        F.col("sxyl"), F.col("syyl"),
    ) + rss(
        F.col("nh"), F.col("sxh"), F.col("syh"), F.col("sxxh"),
        F.col("sxyh"), F.col("syyh"),
    )
    blow = (
        F.col("nl").cast("double") * F.col("sxyl").cast("double")
        - F.col("sxl").cast("double") * F.col("syl").cast("double")
    ) / (
        F.col("nl").cast("double") * F.col("sxxl").cast("double")
        - F.col("sxl").cast("double") * F.col("sxl").cast("double")
    )
    bhigh = (
        F.col("nh").cast("double") * F.col("sxyh").cast("double")
        - F.col("sxh").cast("double") * F.col("syh").cast("double")
    ) / (
        F.col("nh").cast("double") * F.col("sxxh").cast("double")
        - F.col("sxh").cast("double") * F.col("sxh").cast("double")
    )
    scored = agg.select(
        "event_type",
        "c",
        rss2.alias("rss2"),
        blow.alias("bl"),
        bhigh.alias("bh"),
        (F.col("nl") + F.col("nh")).alias("m"),
    )
    best = scored.groupBy("event_type").agg(
        F.min_by(
            F.struct(F.col("c"), F.col("rss2"), F.col("bl"), F.col("bh"),
                     F.col("m")),
            F.struct(F.col("rss2"), F.col("c")),
        ).alias("b")
    )
    ar1 = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yl").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("yl") * F.col("yl")).alias("sxx"),
        F.sum(F.col("yl") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    rss1 = rss(
        F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"),
        F.col("sxy"), F.col("syy"),
    )
    base = ar1.select("event_type", rss1.alias("rss1"))
    out = best.join(base, "event_type").select(
        "event_type",
        F.col("b.m").cast("long").alias("m"),
        F.col("b.c").cast("long").alias("c_best"),
        F.floor(F.col("b.bl") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("b_low_e6"),
        F.floor(F.col("b.bh") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("b_high_e6"),
        F.floor(
            F.col("b.rss2") / F.col("rss1") * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("rss_ratio_e6"),
    )
    return out.orderBy("event_type")


SQL_SETAR = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), hm AS (
  SELECT event_type, hr,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 100 + {_OFF})
              AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), t AS (
  SELECT event_type, hr, y,
         lag(y) OVER (PARTITION BY event_type ORDER BY hr) AS yl
  FROM hm
), v AS (
  SELECT * FROM t WHERE yl IS NOT NULL
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY yl, hr) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
), dec AS (
  SELECT DISTINCT event_type, yl AS c
  FROM r
  WHERE rk IN (CAST(ceil(n*1/10.0) AS INT), CAST(ceil(n*2/10.0) AS INT),
               CAST(ceil(n*3/10.0) AS INT), CAST(ceil(n*4/10.0) AS INT),
               CAST(ceil(n*5/10.0) AS INT), CAST(ceil(n*6/10.0) AS INT),
               CAST(ceil(n*7/10.0) AS INT), CAST(ceil(n*8/10.0) AS INT),
               CAST(ceil(n*9/10.0) AS INT))
), j AS (
  SELECT v.event_type, dec.c, v.y, v.yl,
         CASE WHEN v.yl <= dec.c THEN 1 ELSE 0 END AS lo
  FROM v JOIN dec ON dec.event_type = v.event_type
), agg AS (
  SELECT event_type, c,
         CAST(sum(lo) AS BIGINT) AS nl,
         CAST(sum(lo * yl) AS BIGINT) AS sxl,
         CAST(sum(lo * y) AS BIGINT) AS syl,
         CAST(sum(lo * yl * yl) AS BIGINT) AS sxxl,
         CAST(sum(lo * yl * y) AS BIGINT) AS sxyl,
         CAST(sum(lo * y * y) AS BIGINT) AS syyl,
         CAST(sum(1 - lo) AS BIGINT) AS nh,
         CAST(sum((1 - lo) * yl) AS BIGINT) AS sxh,
         CAST(sum((1 - lo) * y) AS BIGINT) AS syh,
         CAST(sum((1 - lo) * yl * yl) AS BIGINT) AS sxxh,
         CAST(sum((1 - lo) * yl * y) AS BIGINT) AS sxyh,
         CAST(sum((1 - lo) * y * y) AS BIGINT) AS syyh
  FROM j GROUP BY 1, 2
  HAVING sum(lo) >= 5 AND sum(1 - lo) >= 5
), scored AS (
  SELECT event_type, c, nl + nh AS m,
         ({_rss_sql('nl', 'sxl', 'syl', 'sxxl', 'sxyl', 'syyl')}
          + {_rss_sql('nh', 'sxh', 'syh', 'sxxh', 'sxyh', 'syyh')}) AS rss2,
         (CAST(nl AS DOUBLE) * sxyl - CAST(sxl AS DOUBLE) * syl)
           / (CAST(nl AS DOUBLE) * sxxl - CAST(sxl AS DOUBLE) * sxl) AS bl,
         (CAST(nh AS DOUBLE) * sxyh - CAST(sxh AS DOUBLE) * syh)
           / (CAST(nh AS DOUBLE) * sxxh - CAST(sxh AS DOUBLE) * sxh) AS bh
  FROM agg
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY rss2, c) AS rnk
  FROM scored
), ar1 AS (
  SELECT event_type,
         {_rss_sql('count(*)', 'sum(yl)', 'sum(y)', 'sum(yl * yl)',
                   'sum(yl * y)', 'sum(y * y)')} AS rss1
  FROM v GROUP BY 1
)
SELECT ranked.event_type,
       CAST(m AS BIGINT) AS m,
       CAST(c AS BIGINT) AS c_best,
       CAST(floor(bl * 1000000 + {_OFF}) AS BIGINT) AS b_low_e6,
       CAST(floor(bh * 1000000 + {_OFF}) AS BIGINT) AS b_high_e6,
       CAST(floor(rss2 / rss1 * 1000000 + {_OFF}) AS BIGINT)
         AS rss_ratio_e6
FROM ranked JOIN ar1 ON ar1.event_type = ranked.event_type
WHERE rnk = 1
ORDER BY ranked.event_type
"""


QUERIES.update(
    {
        "bds_test": q_bds_test,
        "engle_granger": q_engle_granger,
        "var1_fit": q_var1_fit,
        "setar_fit": q_setar_fit,
    }
)

ORACLE_SQL.update(
    {
        "bds_test": SQL_BDS,
        "engle_granger": SQL_EG,
        "var1_fit": SQL_VAR1,
        "setar_fit": SQL_SETAR,
    }
)


# ---------------------------------------------------------------------------
# obrien_fleming_looks — group-sequential monitoring at 5 calendar
# looks with O'Brien-Fleming boundaries (O'Brien & Fleming 1979;
# two-sided alpha = 0.05 constants 4.8769/3.3569/2.6803/2.2898/2.0310)
# ---------------------------------------------------------------------------
# Looks = cumulative 6-day windows (no global event sort — day-level
# rollups then a 30-row cumulative); z_k is the Welch z of weekend vs
# weekday centi-values from exact cumulative sums.


def q_obrien_fleming_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.dayofmonth("ts").alias("dom"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = ev.groupBy("dom", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    d = d.withColumn("look", F.ceil(F.col("dom") / 6).cast("int"))
    cum = (
        d.groupBy("look", "grp")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.sum("q").alias("q"),
        )
    )
    wcum = Window.partitionBy("grp").orderBy("look").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        cum.withColumn("cn", F.sum("n").over(wcum))
        .withColumn("cs", F.sum("s").over(wcum))
        .withColumn("cq", F.sum("q").over(wcum))
    )
    e = cum.filter(F.col("grp") == 1).select(
        "look",
        F.col("cn").alias("ne"),
        F.col("cs").alias("se"),
        F.col("cq").alias("qe"),
    )
    c = cum.filter(F.col("grp") == 0).select(
        "look",
        F.col("cn").alias("nc"),
        F.col("cs").alias("sc"),
        F.col("cq").alias("qc"),
    )
    j = e.join(c, "look")
    ned = F.col("ne").cast("double")
    ncd = F.col("nc").cast("double")
    diff = F.col("se").cast("double") / ned - F.col("sc").cast("double") / ncd
    vare = (
        ned * F.col("qe").cast("double")
        - F.col("se").cast("double") * F.col("se").cast("double")
    ) / (ned * (ned - 1))
    varc = (
        ncd * F.col("qc").cast("double")
        - F.col("sc").cast("double") * F.col("sc").cast("double")
    ) / (ncd * (ncd - 1))
    z = diff / F.sqrt(vare / ned + varc / ncd)
    bnd = (
        F.when(F.col("look") == 1, F.lit(4.8769))
        .when(F.col("look") == 2, F.lit(3.3569))
        .when(F.col("look") == 3, F.lit(2.6803))
        .when(F.col("look") == 4, F.lit(2.2898))
        .otherwise(F.lit(2.0310))
    )
    out = j.select(
        F.col("look").cast("long").alias("look"),
        F.col("ne").cast("long").alias("n_wknd"),
        F.col("nc").cast("long").alias("n_wday"),
        F.floor(z * 1_000_000 + F.lit(_OFF)).cast("long").alias("z_e6"),
        F.floor(bnd * 10_000 + F.lit(_OFF)).cast("long").alias(
            "boundary_e4"
        ),
        (F.abs(z) > bnd).cast("long").alias("crossed"),
    )
    return out.orderBy("look")


SQL_OBF = f"""
WITH ev AS (
  SELECT EXTRACT(day FROM ts) AS dom,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), d AS (
  SELECT CAST(ceil(dom / 6.0) AS INT) AS look, grp,
         count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS q
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT look, grp,
         CAST(sum(n) OVER w AS BIGINT) AS cn,
         CAST(sum(s) OVER w AS BIGINT) AS cs,
         CAST(sum(q) OVER w AS BIGINT) AS cq
  FROM d
  WINDOW w AS (PARTITION BY grp ORDER BY look
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), j AS (
  SELECT e.look,
         e.cn AS ne, e.cs AS se, e.cq AS qe,
         c.cn AS nc, c.cs AS sc, c.cq AS qc
  FROM (SELECT * FROM cum WHERE grp = 1) e
  JOIN (SELECT * FROM cum WHERE grp = 0) c ON c.look = e.look
), f AS (
  SELECT look, ne, nc,
         (CAST(se AS DOUBLE) / ne - CAST(sc AS DOUBLE) / nc)
         / sqrt(((CAST(ne AS DOUBLE) * qe - CAST(se AS DOUBLE) * se)
                 / (CAST(ne AS DOUBLE) * (ne - 1))) / ne
                + ((CAST(nc AS DOUBLE) * qc - CAST(sc AS DOUBLE) * sc)
                   / (CAST(nc AS DOUBLE) * (nc - 1))) / nc) AS z,
         CAST(CASE look WHEN 1 THEN 4.8769 WHEN 2 THEN 3.3569
                        WHEN 3 THEN 2.6803 WHEN 4 THEN 2.2898
                        ELSE 2.0310 END AS DOUBLE) AS bnd
  FROM j
)
SELECT CAST(look AS BIGINT) AS look,
       CAST(ne AS BIGINT) AS n_wknd,
       CAST(nc AS BIGINT) AS n_wday,
       CAST(floor(z * 1000000 + {_OFF}) AS BIGINT) AS z_e6,
       CAST(floor(bnd * 10000 + {_OFF}) AS BIGINT) AS boundary_e4,
       CAST(CASE WHEN abs(z) > bnd THEN 1 ELSE 0 END AS BIGINT) AS crossed
FROM f
ORDER BY look
"""


# ---------------------------------------------------------------------------
# concentration_audit — empirical block-mean exceedances vs the
# Hoeffding (1963) bound, the sanity check for sampled estimators
# ---------------------------------------------------------------------------
# 100 deterministic hash blocks (event_id % 100); the exceedance
# |mean_b - mu| >= t is decided by exact cross-multiplication
# |s_b*N - S*n_b| >= t*n_b*N (t = 500 centi); the per-block Hoeffding
# bound 2 exp(-2 n_b t^2 / R^2) uses the exact observed range R.


def q_concentration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("event_id") % 100).alias("blk"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    tot = ev.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum("v").alias("ss"),
        (F.max("v") - F.min("v")).alias("rng"),
    )
    b = ev.groupBy("blk").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("v").alias("sb"),
    )
    T = 500  # centi-units deviation threshold
    j = b.crossJoin(F.broadcast(tot))
    exceed = (
        F.abs(F.col("sb") * F.col("nn") - F.col("ss") * F.col("nb"))
        >= F.lit(T) * F.col("nb") * F.col("nn")
    ).cast("long")
    bound = 2.0 * F.exp(
        -2.0
        * F.col("nb").cast("double")
        * (T * T)
        / (F.col("rng").cast("double") * F.col("rng").cast("double"))
    )
    j = j.withColumn("exceed", exceed).withColumn(
        "bound_e6", F.floor(bound * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    agg = j.groupBy().agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("exceed").alias("n_exceed"),
        F.sum("bound_e6").alias("bound_sum_e6"),
        F.max("rng").alias("range_centi"),
    )
    return agg.select(
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.col("n_exceed").cast("long").alias("n_exceed"),
        F.col("bound_sum_e6").cast("long").alias("bound_sum_e6"),
        F.col("range_centi").cast("long").alias("range_centi"),
    )


SQL_CONC = f"""
WITH ev AS (
  SELECT event_id % 100 AS blk,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), tot AS (
  SELECT count(*) AS nn,
         CAST(sum(v) AS BIGINT) AS ss,
         CAST(max(v) - min(v) AS BIGINT) AS rng
  FROM ev
), b AS (
  SELECT blk, count(*) AS nb, CAST(sum(v) AS BIGINT) AS sb
  FROM ev GROUP BY 1
), j AS (
  SELECT b.*, tot.nn, tot.ss, tot.rng,
         CASE WHEN abs(sb * nn - ss * nb) >= 500 * nb * nn
              THEN 1 ELSE 0 END AS exceed,
         CAST(floor(2.0 * exp(-2.0 * nb * 250000.0
                              / (CAST(rng AS DOUBLE) * rng))
                    * 1000000 + {_OFF}) AS BIGINT) AS bound_e6
  FROM b CROSS JOIN tot
)
SELECT CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(exceed) AS BIGINT) AS n_exceed,
       CAST(sum(bound_e6) AS BIGINT) AS bound_sum_e6,
       CAST(max(rng) AS BIGINT) AS range_centi
FROM j
"""


QUERIES.update(
    {
        "obrien_fleming_looks": q_obrien_fleming_looks,
        "concentration_audit": q_concentration_audit,
    }
)

ORACLE_SQL.update(
    {
        "obrien_fleming_looks": SQL_OBF,
        "concentration_audit": SQL_CONC,
    }
)


# ---------------------------------------------------------------------------
# stratified_ate — direct standardization / stratified average
# treatment effect (Rubin 1977), weekend as treatment, diel bucket as
# the confounder
# ---------------------------------------------------------------------------
# ATE = sum_s (n_s / N) (ybar_1s - ybar_0s) plus the crude difference
# for contrast — strata terms e6-floored before the exact sum.


def q_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(F.hour("ts") / 6).cast("int").alias("s"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("tr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("s", "tr").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    t1 = g.filter(F.col("tr") == 1).select(
        "s", F.col("n").alias("n1"), F.col("sv").alias("s1")
    )
    t0 = g.filter(F.col("tr") == 0).select(
        "s", F.col("n").alias("n0"), F.col("sv").alias("s0")
    )
    j = t1.join(t0, "s")
    diff = F.col("s1").cast("double") / F.col("n1").cast("double") - F.col(
        "s0"
    ).cast("double") / F.col("n0").cast("double")
    j = j.withColumn("ns", F.col("n1") + F.col("n0")).withColumn(
        "term_e6",
        F.floor(
            diff * (F.col("n1") + F.col("n0")).cast("double") * 10_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    crude = ev.groupBy("tr").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    c1 = crude.filter(F.col("tr") == 1).select(
        F.col("n").alias("cn1"), F.col("sv").alias("cs1")
    )
    c0 = crude.filter(F.col("tr") == 0).select(
        F.col("n").alias("cn0"), F.col("sv").alias("cs0")
    )
    agg = j.groupBy().agg(
        F.count(F.lit(1)).alias("k_strata"),
        F.sum("ns").alias("nn"),
        F.sum("term_e6").alias("s_term"),
    ).crossJoin(F.broadcast(c1)).crossJoin(F.broadcast(c0))
    ate = F.col("s_term").cast("double") / F.col("nn").cast("double") / 10_000
    crude_d = F.col("cs1").cast("double") / F.col("cn1").cast(
        "double"
    ) - F.col("cs0").cast("double") / F.col("cn0").cast("double")
    return agg.select(
        F.col("k_strata").cast("long").alias("k_strata"),
        F.col("nn").cast("long").alias("n"),
        F.floor(ate * 10_000 + F.lit(_OFF)).cast("long").alias("ate_e4"),
        F.floor(crude_d * 10_000 + F.lit(_OFF)).cast("long").alias(
            "crude_e4"
        ),
    )


SQL_SATE = f"""
WITH ev AS (
  SELECT CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS s,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS tr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT s, tr, count(*) AS n, CAST(sum(v) AS BIGINT) AS sv
  FROM ev GROUP BY 1, 2
), j AS (
  SELECT a.s, a.n AS n1, a.sv AS s1, b.n AS n0, b.sv AS s0,
         a.n + b.n AS ns,
         CAST(floor((CAST(a.sv AS DOUBLE) / a.n
                     - CAST(b.sv AS DOUBLE) / b.n)
                    * (a.n + b.n) * 10000 + {_OFF}) AS BIGINT) AS term_e6
  FROM (SELECT * FROM g WHERE tr = 1) a
  JOIN (SELECT * FROM g WHERE tr = 0) b ON b.s = a.s
), crude AS (
  SELECT CAST(sum(CASE WHEN tr = 1 THEN v END) AS BIGINT) AS cs1,
         count(CASE WHEN tr = 1 THEN 1 END) AS cn1,
         CAST(sum(CASE WHEN tr = 0 THEN v END) AS BIGINT) AS cs0,
         count(CASE WHEN tr = 0 THEN 1 END) AS cn0
  FROM ev
), agg AS (
  SELECT count(*) AS k_strata,
         CAST(sum(ns) AS BIGINT) AS nn,
         CAST(sum(term_e6) AS BIGINT) AS s_term
  FROM j
)
SELECT CAST(k_strata AS BIGINT) AS k_strata,
       nn AS n,
       CAST(floor(CAST(s_term AS DOUBLE) / nn / 10000 * 10000 + {_OFF})
            AS BIGINT) AS ate_e4,
       CAST(floor((CAST(cs1 AS DOUBLE) / cn1 - CAST(cs0 AS DOUBLE) / cn0)
                  * 10000 + {_OFF}) AS BIGINT) AS crude_e4
FROM agg CROSS JOIN crude
"""


# ---------------------------------------------------------------------------
# simpsons_paradox_audit — aggregation-reversal detector (Simpson 1951)
# ---------------------------------------------------------------------------
# Association = odds ratio of (weekend, above-median value) overall and
# within each diel stratum; the audit counts strata whose log-OR sign
# differs from the pooled sign.  The median is an exact order stat; OR
# comparisons are cross-multiplied integers (ad vs bc), so sign logic
# never touches doubles.


def q_simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        F.floor(F.hour("ts") / 6).cast("int").alias("s"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("tr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wm = Window.orderBy("v", "event_id")
    wn = Window.partitionBy(F.lit(1))
    r = ev.withColumn("rk", F.row_number().over(wm)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(
        F.col("rk") == F.floor((F.col("n") + 1) / 2).cast("int")
    ).select(F.col("v").alias("med"))
    t = ev.crossJoin(F.broadcast(med)).withColumn(
        "hi", (F.col("v") > F.col("med")).cast("long")
    )
    cell = t.groupBy("s").agg(
        F.sum((F.col("tr") * F.col("hi"))).alias("a"),
        F.sum((F.col("tr") * (1 - F.col("hi")))).alias("b"),
        F.sum(((1 - F.col("tr")) * F.col("hi"))).alias("c"),
        F.sum(((1 - F.col("tr")) * (1 - F.col("hi")))).alias("d"),
    )
    pooled = cell.groupBy().agg(
        F.sum("a").alias("pa"),
        F.sum("b").alias("pb"),
        F.sum("c").alias("pc"),
        F.sum("d").alias("pd"),
    )
    j = cell.crossJoin(F.broadcast(pooled))
    sgn_s = F.signum(
        (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    )
    sgn_p = F.signum(
        (F.col("pa") * F.col("pd") - F.col("pb") * F.col("pc")).cast(
            "double"
        )
    )
    j = j.withColumn(
        "reversed", (sgn_s * sgn_p < 0).cast("long")
    ).withColumn(
        "or_e6",
        F.floor(
            (F.col("a") * F.col("d")).cast("double")
            / (F.col("b") * F.col("c")).cast("double")
            * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    agg = j.groupBy().agg(
        F.count(F.lit(1)).alias("k_strata"),
        F.sum("reversed").alias("n_reversed"),
        F.max(
            F.floor(
                (F.col("pa") * F.col("pd")).cast("double")
                / (F.col("pb") * F.col("pc")).cast("double")
                * 1_000_000
                + F.lit(_OFF)
            ).cast("long")
        ).alias("pooled_or_e6"),
        F.min("or_e6").alias("min_or_e6"),
        F.max("or_e6").alias("max_or_e6"),
    )
    return agg.select(
        F.col("k_strata").cast("long").alias("k_strata"),
        F.col("n_reversed").cast("long").alias("n_reversed"),
        "pooled_or_e6",
        "min_or_e6",
        "max_or_e6",
    )


SQL_SIMPSON = f"""
WITH ev AS (
  SELECT event_id,
         CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS s,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS tr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT *, row_number() OVER (ORDER BY v, event_id) AS rk,
         count(*) OVER () AS n
  FROM ev
), med AS (
  SELECT v AS med FROM r WHERE rk = CAST(floor((n + 1) / 2) AS INT)
), t AS (
  SELECT s, tr, CASE WHEN v > med THEN 1 ELSE 0 END AS hi
  FROM ev CROSS JOIN med
), cell AS (
  SELECT s,
         CAST(sum(tr * hi) AS BIGINT) AS a,
         CAST(sum(tr * (1 - hi)) AS BIGINT) AS b,
         CAST(sum((1 - tr) * hi) AS BIGINT) AS c,
         CAST(sum((1 - tr) * (1 - hi)) AS BIGINT) AS d
  FROM t GROUP BY 1
), pooled AS (
  SELECT CAST(sum(a) AS BIGINT) AS pa, CAST(sum(b) AS BIGINT) AS pb,
         CAST(sum(c) AS BIGINT) AS pc, CAST(sum(d) AS BIGINT) AS pd
  FROM cell
), j AS (
  SELECT cell.*, pa, pb, pc, pd,
         CASE WHEN sign(CAST(a * d - b * c AS DOUBLE))
                   * sign(CAST(pa * pd - pb * pc AS DOUBLE)) < 0
              THEN 1 ELSE 0 END AS reversed,
         CAST(floor(CAST(a * d AS DOUBLE) / (b * c) * 1000000 + {_OFF})
              AS BIGINT) AS or_e6
  FROM cell CROSS JOIN pooled
)
SELECT CAST(count(*) AS BIGINT) AS k_strata,
       CAST(sum(reversed) AS BIGINT) AS n_reversed,
       CAST(max(CAST(floor(CAST(pa * pd AS DOUBLE) / (pb * pc) * 1000000
                           + {_OFF}) AS BIGINT)) AS BIGINT)
         AS pooled_or_e6,
       CAST(min(or_e6) AS BIGINT) AS min_or_e6,
       CAST(max(or_e6) AS BIGINT) AS max_or_e6
FROM j
"""


# ---------------------------------------------------------------------------
# sharp_rdd — sharp regression discontinuity at minute 30 of the hour
# (Thistlethwaite & Campbell 1960; local linear, bandwidth 15)
# ---------------------------------------------------------------------------
# Running variable x = minute - 30 in [-15, 15); separate 1-regressor
# OLS on each side from exact sums; the jump is the difference of the
# two intercepts at x = 0.  Per event_type.


def q_sharp_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.minute("ts") - 30).cast("long").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    ).filter((F.col("x") >= -15) & (F.col("x") < 15))
    t = ev.withColumn("side", (F.col("x") >= 0).cast("int"))
    g = t.groupBy("event_type", "side").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("v").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("v")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    b = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / nd
    g = g.withColumn("a0", a).withColumn("b0", b)
    lft = g.filter(F.col("side") == 0).select(
        "event_type",
        F.col("n").alias("n_l"),
        F.col("a0").alias("a_l"),
        F.col("b0").alias("b_l"),
    )
    rgt = g.filter(F.col("side") == 1).select(
        "event_type",
        F.col("n").alias("n_r"),
        F.col("a0").alias("a_r"),
        F.col("b0").alias("b_r"),
    )
    j = lft.join(rgt, "event_type")
    return j.select(
        "event_type",
        F.col("n_l").cast("long").alias("n_left"),
        F.col("n_r").cast("long").alias("n_right"),
        F.floor((F.col("a_r") - F.col("a_l")) * 100 + F.lit(_OFF))
        .cast("long")
        .alias("jump_e4"),
        F.floor(F.col("b_l") * 10_000 + F.lit(_OFF)).cast("long").alias(
            "slope_l_e4"
        ),
        F.floor(F.col("b_r") * 10_000 + F.lit(_OFF)).cast("long").alias(
            "slope_r_e4"
        ),
    ).orderBy("event_type")


SQL_RDD = f"""
WITH ev AS (
  SELECT event_type,
         CAST(EXTRACT(minute FROM ts) - 30 AS BIGINT) AS x,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
  WHERE EXTRACT(minute FROM ts) - 30 >= -15
    AND EXTRACT(minute FROM ts) - 30 < 15
), g AS (
  SELECT event_type,
         CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side,
         count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(v) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * v) AS BIGINT) AS sxy
  FROM ev GROUP BY 1, 2
), f AS (
  SELECT event_type, side, n,
         (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
           / n AS a,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b
  FROM g
)
SELECT l.event_type,
       CAST(l.n AS BIGINT) AS n_left,
       CAST(r.n AS BIGINT) AS n_right,
       CAST(floor((r.a - l.a) * 100 + {_OFF}) AS BIGINT) AS jump_e4,
       CAST(floor(l.b * 10000 + {_OFF}) AS BIGINT) AS slope_l_e4,
       CAST(floor(r.b * 10000 + {_OFF}) AS BIGINT) AS slope_r_e4
FROM (SELECT * FROM f WHERE side = 0) l
JOIN (SELECT * FROM f WHERE side = 1) r ON r.event_type = l.event_type
ORDER BY l.event_type
"""


# ---------------------------------------------------------------------------
# evalue_sensitivity — VanderWeele & Ding (2017) E-value for the
# weekend risk ratio of high-value events
# ---------------------------------------------------------------------------
# RR from exact counts (above-median outcome); E = RR + sqrt(RR(RR-1))
# for RR >= 1, computed on 1/RR otherwise — the minimum confounding
# strength that could explain the association away.


def q_evalue_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "event_type",
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("tr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wm = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.withColumn("rk", F.row_number().over(wm)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    med = r.filter(
        F.col("rk") == F.floor((F.col("n") + 1) / 2).cast("int")
    ).select("event_type", F.col("v").alias("med"))
    t = ev.join(F.broadcast(med), "event_type").withColumn(
        "hi", (F.col("v") > F.col("med")).cast("long")
    )
    g = t.groupBy("event_type").agg(
        F.sum(F.col("tr") * F.col("hi")).alias("a"),
        F.sum(F.col("tr")).alias("n1"),
        F.sum((1 - F.col("tr")) * F.col("hi")).alias("c"),
        F.sum(1 - F.col("tr")).alias("n0"),
    )
    rr = (
        F.col("a").cast("double") / F.col("n1").cast("double")
    ) / (F.col("c").cast("double") / F.col("n0").cast("double"))
    rr_star = F.when(rr >= 1.0, rr).otherwise(1.0 / rr)
    evalue = rr_star + F.sqrt(rr_star * (rr_star - 1.0))
    return g.select(
        "event_type",
        F.col("n1").cast("long").alias("n_wknd"),
        F.col("n0").cast("long").alias("n_wday"),
        F.floor(rr * 1_000_000 + F.lit(_OFF)).cast("long").alias("rr_e6"),
        F.floor(evalue * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "evalue_e6"
        ),
    ).orderBy("event_type")


SQL_EVALUE = f"""
WITH ev AS (
  SELECT event_id, event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS tr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY v, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
), med AS (
  SELECT event_type, v AS med FROM r
  WHERE rk = CAST(floor((n + 1) / 2) AS INT)
), t AS (
  SELECT ev.event_type, tr,
         CASE WHEN v > med THEN 1 ELSE 0 END AS hi
  FROM ev JOIN med ON med.event_type = ev.event_type
), g AS (
  SELECT event_type,
         CAST(sum(tr * hi) AS BIGINT) AS a,
         CAST(sum(tr) AS BIGINT) AS n1,
         CAST(sum((1 - tr) * hi) AS BIGINT) AS c,
         CAST(sum(1 - tr) AS BIGINT) AS n0
  FROM t GROUP BY 1
), f AS (
  SELECT event_type, n1, n0,
         (CAST(a AS DOUBLE) / n1) / (CAST(c AS DOUBLE) / n0) AS rr
  FROM g
), s AS (
  SELECT *, CASE WHEN rr >= 1.0 THEN rr ELSE 1.0 / rr END AS rr_star
  FROM f
)
SELECT event_type,
       n1 AS n_wknd,
       n0 AS n_wday,
       CAST(floor(rr * 1000000 + {_OFF}) AS BIGINT) AS rr_e6,
       CAST(floor((rr_star + sqrt(rr_star * (rr_star - 1.0)))
                  * 1000000 + {_OFF}) AS BIGINT) AS evalue_e6
FROM s
ORDER BY event_type
"""


QUERIES.update(
    {
        "stratified_ate": q_stratified_ate,
        "simpsons_paradox_audit": q_simpsons_paradox_audit,
        "sharp_rdd": q_sharp_rdd,
        "evalue_sensitivity": q_evalue_sensitivity,
    }
)

ORACLE_SQL.update(
    {
        "stratified_ate": SQL_SATE,
        "simpsons_paradox_audit": SQL_SIMPSON,
        "sharp_rdd": SQL_RDD,
        "evalue_sensitivity": SQL_EVALUE,
    }
)


# ---------------------------------------------------------------------------
# tl_moments — trimmed L-moments, t = 1 (Elamir & Seheult 2003)
# ---------------------------------------------------------------------------
# lambda1^(1) = E[X_{2:3}], lambda2^(1) = (E[X_{3:4}] - E[X_{2:4}])/2
# with the unbiased order-statistic estimators; per-row combinatorial
# RATIOS C(i-1,.)C(n-i,.)/C(n,m) are identical doubles from exact
# integer indices (scale-safe at any n, unlike raw weight sums), and
# each x*ratio term is e6-floored before the exact integer sum.
# The robust EVT companion to the registry's l_moments.


def q_tl_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wq = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    t = ev.withColumn("i", F.row_number().over(wq).cast("long")).withColumn(
        "n", F.count(F.lit(1)).over(wn).cast("long")
    )
    i = F.col("i").cast("double")
    n = F.col("n").cast("double")
    x = F.col("v").cast("double")
    c_n3 = n * (n - 1) * (n - 2) / 6.0
    c_n4 = n * (n - 1) * (n - 2) * (n - 3) / 24.0
    r1 = (i - 1) * (n - i) / c_n3
    r34 = (i - 1) * (i - 2) / 2.0 * (n - i) / c_n4
    r24 = (i - 1) * (n - i) * (n - i - 1) / 2.0 / c_n4
    t = t.withColumn(
        "t1_e6", F.floor(x * r1 * 1_000_000 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "t2_e6",
        F.floor(x * (r34 - r24) / 2.0 * 1_000_000 + F.lit(_OFF)).cast(
            "long"
        ),
    )
    agg = t.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("t1_e6").alias("l1_e6"),
        F.sum("t2_e6").alias("l2_e6"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("l1_e6").cast("long").alias("tl1_centi_e6"),
        F.col("l2_e6").cast("long").alias("tl2_centi_e6"),
        F.floor(
            F.col("l2_e6").cast("double") / F.col("l1_e6").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("tl_cv_e6"),
    ).orderBy("event_type")


SQL_TLMOM = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, v,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY v, event_id) AS BIGINT) AS i,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM ev
), terms AS (
  SELECT event_type, n,
         CAST(floor(CAST(v AS DOUBLE)
               * ((i - 1.0) * (n - i)
                  / (CAST(n AS DOUBLE) * (n - 1) * (n - 2) / 6.0))
               * 1000000 + {_OFF}) AS BIGINT) AS t1_e6,
         CAST(floor(CAST(v AS DOUBLE)
               * (((i - 1.0) * (i - 2) / 2.0 * (n - i)
                   / (CAST(n AS DOUBLE) * (n - 1) * (n - 2) * (n - 3)
                      / 24.0))
                  - ((i - 1.0) * (n - i) * (n - i - 1.0) / 2.0
                     / (CAST(n AS DOUBLE) * (n - 1) * (n - 2) * (n - 3)
                        / 24.0))) / 2.0
               * 1000000 + {_OFF}) AS BIGINT) AS t2_e6
  FROM t
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(sum(t1_e6) AS BIGINT) AS tl1_centi_e6,
       CAST(sum(t2_e6) AS BIGINT) AS tl2_centi_e6,
       CAST(floor(CAST(sum(t2_e6) AS DOUBLE) / sum(t1_e6) * 1000000
                  + {_OFF}) AS BIGINT) AS tl_cv_e6
FROM terms
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# baxter_king — BK(6,32,12) bandpass business-cycle filter on hourly
# means (Baxter & King 1999)
# ---------------------------------------------------------------------------
# The 25-tap symmetric FIR weights are CONSTANTS (computed once,
# e9-floored, embedded verbatim in both engines, zero-sum corrected):
# the convolution is an exact BIGINT dot product; reported per type:
# valid length, sum |cycle|, max |cycle|, and the number of cycle
# sign changes (periodicity proxy).


_BK_W = [
    277664849, 220396785, 83757780, -52116317, -118354366, -101234373,
    -42181816, 1613058, 1500836, -27856668, -50142928, -42289343,
    -11925074,
]


def q_baxter_king(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    hm = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double") * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )
    wo = Window.partitionBy("event_type").orderBy("hr")
    conv = F.lit(_BK_W[0]).cast("long") * F.col("y")
    for j in range(1, 13):
        conv = conv + F.lit(_BK_W[j]).cast("long") * (
            F.lag("y", j).over(wo) + F.lead("y", j).over(wo)
        )
    t = hm.withColumn("cyc", conv).filter(F.col("cyc").isNotNull())
    ws = Window.partitionBy("event_type").orderBy("hr")
    t = t.withColumn("prev_cyc", F.lag("cyc").over(ws))
    flip = (
        F.col("prev_cyc").isNotNull()
        & (F.signum(F.col("cyc").cast("double"))
           * F.signum(F.col("prev_cyc").cast("double")) < 0)
    ).cast("long")
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum(F.abs(F.col("cyc"))).alias("sabs"),
        F.max(F.abs(F.col("cyc"))).alias("mx"),
        F.sum(flip).alias("flips"),
    )
    return agg.select(
        "event_type",
        F.col("nv").cast("long").alias("n_valid"),
        F.floor(F.col("sabs").cast("double") / 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("sum_abs_cycle_e4"),
        F.floor(F.col("mx").cast("double") / 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("max_cycle_e4"),
        F.col("flips").cast("long").alias("sign_changes"),
    ).orderBy("event_type")


_BK_SQL_CONV = " + ".join(
    [f"{_BK_W[0]} * y"]
    + [
        f"{_BK_W[j]} * (lag(y, {j}) OVER w + lead(y, {j}) OVER w)"
        for j in range(1, 13)
    ]
)

SQL_BK = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), hm AS (
  SELECT event_type, hr,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 100 + {_OFF})
              AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), conv AS (
  SELECT event_type, hr,
         {_BK_SQL_CONV} AS cyc
  FROM hm
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), t AS (
  SELECT event_type, hr, CAST(cyc AS BIGINT) AS cyc,
         lag(cyc) OVER (PARTITION BY event_type ORDER BY hr) AS prev_cyc
  FROM conv WHERE cyc IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS nv,
         CAST(sum(abs(cyc)) AS BIGINT) AS sabs,
         CAST(max(abs(cyc)) AS BIGINT) AS mx,
         CAST(sum(CASE WHEN prev_cyc IS NOT NULL
                        AND sign(CAST(cyc AS DOUBLE))
                            * sign(CAST(prev_cyc AS DOUBLE)) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS flips
  FROM t GROUP BY 1
)
SELECT event_type,
       CAST(nv AS BIGINT) AS n_valid,
       CAST(floor(CAST(sabs AS DOUBLE) / 1e9 + {_OFF}) AS BIGINT)
         AS sum_abs_cycle_e4,
       CAST(floor(CAST(mx AS DOUBLE) / 1e9 + {_OFF}) AS BIGINT)
         AS max_cycle_e4,
       flips AS sign_changes
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cca_2x2 — first/second canonical correlations between the daily
# (click, view) and (purchase, signup) mean pairs (Hotelling 1936)
# ---------------------------------------------------------------------------
# All covariance entries come from exact BIGINT sums via the numerator
# trick (n*Sxy - SxSy); the 2x2 inverses and the eigenvalues of
# Sxx^-1 Sxy Syy^-1 Syx are closed forms — identical doubles.


def q_cca_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("click", "view", "purchase", "signup")
    ).select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )

    def daily(et, name):
        return [
            F.floor(
                F.sum(F.when(F.col("event_type") == et, F.col("v"))).cast(
                    "double"
                )
                / F.count(F.when(F.col("event_type") == et, 1)).cast(
                    "double"
                )
                * 100
                + F.lit(_OFF)
            )
            .cast("long")
            .alias(name)
        ]

    d = ev.groupBy("day").agg(
        *(
            daily("click", "x1")
            + daily("view", "x2")
            + daily("purchase", "y1")
            + daily("signup", "y2")
        )
    ).filter(
        F.col("x1").isNotNull()
        & F.col("x2").isNotNull()
        & F.col("y1").isNotNull()
        & F.col("y2").isNotNull()
    )
    cols = ["x1", "x2", "y1", "y2"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(c).alias(f"s_{c}"))
    for a_i in range(4):
        for b_i in range(a_i, 4):
            ca, cb = cols[a_i], cols[b_i]
            aggs.append(F.sum(F.col(ca) * F.col(cb)).alias(f"p_{ca}{cb}"))
    g = d.groupBy().agg(*aggs)
    n = F.col("n").cast("double")

    def cov(ca, cb):
        key = f"p_{ca}{cb}" if f"p_{ca}{cb}" in g.columns else f"p_{cb}{ca}"
        return n * F.col(key).cast("double") - F.col(f"s_{ca}").cast(
            "double"
        ) * F.col(f"s_{cb}").cast("double")

    sxx11, sxx12, sxx22 = cov("x1", "x1"), cov("x1", "x2"), cov("x2", "x2")
    syy11, syy12, syy22 = cov("y1", "y1"), cov("y1", "y2"), cov("y2", "y2")
    sxy11, sxy12 = cov("x1", "y1"), cov("x1", "y2")
    sxy21, sxy22 = cov("x2", "y1"), cov("x2", "y2")
    detx = sxx11 * sxx22 - sxx12 * sxx12
    dety = syy11 * syy22 - syy12 * syy12
    # A = Sxx^-1 Sxy, B = Syy^-1 Syx; M = A B (2x2), eigenvalues of M
    a11 = (sxx22 * sxy11 - sxx12 * sxy21) / detx
    a12 = (sxx22 * sxy12 - sxx12 * sxy22) / detx
    a21 = (sxx11 * sxy21 - sxx12 * sxy11) / detx
    a22 = (sxx11 * sxy22 - sxx12 * sxy12) / detx
    b11 = (syy22 * sxy11 - syy12 * sxy12) / dety
    b12 = (syy22 * sxy21 - syy12 * sxy22) / dety
    b21 = (syy11 * sxy12 - syy12 * sxy11) / dety
    b22 = (syy11 * sxy22 - syy12 * sxy21) / dety
    m11 = a11 * b11 + a12 * b21
    m12 = a11 * b12 + a12 * b22
    m21 = a21 * b11 + a22 * b21
    m22 = a21 * b12 + a22 * b22
    tr = m11 + m22
    dt = m11 * m22 - m12 * m21
    disc = F.sqrt(F.greatest(tr * tr - 4 * dt, F.lit(0.0)))
    lam1 = (tr + disc) / 2
    lam2 = (tr - disc) / 2
    return g.select(
        F.col("n").cast("long").alias("n_days"),
        F.floor(F.sqrt(F.greatest(lam1, F.lit(0.0))) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("rho1_e6"),
        F.floor(F.sqrt(F.greatest(lam2, F.lit(0.0))) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("rho2_e6"),
    )


SQL_CCA = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase', 'signup')
), d AS (
  SELECT day,
         CAST(floor(CAST(sum(CASE WHEN event_type = 'click' THEN v END)
               AS DOUBLE) / count(CASE WHEN event_type = 'click' THEN 1 END)
               * 100 + {_OFF}) AS BIGINT) AS x1,
         CAST(floor(CAST(sum(CASE WHEN event_type = 'view' THEN v END)
               AS DOUBLE) / count(CASE WHEN event_type = 'view' THEN 1 END)
               * 100 + {_OFF}) AS BIGINT) AS x2,
         CAST(floor(CAST(sum(CASE WHEN event_type = 'purchase' THEN v END)
               AS DOUBLE)
               / count(CASE WHEN event_type = 'purchase' THEN 1 END)
               * 100 + {_OFF}) AS BIGINT) AS y1,
         CAST(floor(CAST(sum(CASE WHEN event_type = 'signup' THEN v END)
               AS DOUBLE) / count(CASE WHEN event_type = 'signup' THEN 1 END)
               * 100 + {_OFF}) AS BIGINT) AS y2
  FROM ev GROUP BY 1
  HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
     AND count(CASE WHEN event_type = 'view' THEN 1 END) > 0
     AND count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
     AND count(CASE WHEN event_type = 'signup' THEN 1 END) > 0
), g AS (
  SELECT count(*) AS n,
         CAST(sum(x1) AS BIGINT) AS s_x1, CAST(sum(x2) AS BIGINT) AS s_x2,
         CAST(sum(y1) AS BIGINT) AS s_y1, CAST(sum(y2) AS BIGINT) AS s_y2,
         CAST(sum(x1 * x1) AS BIGINT) AS p_x1x1,
         CAST(sum(x1 * x2) AS BIGINT) AS p_x1x2,
         CAST(sum(x2 * x2) AS BIGINT) AS p_x2x2,
         CAST(sum(y1 * y1) AS BIGINT) AS p_y1y1,
         CAST(sum(y1 * y2) AS BIGINT) AS p_y1y2,
         CAST(sum(y2 * y2) AS BIGINT) AS p_y2y2,
         CAST(sum(x1 * y1) AS BIGINT) AS p_x1y1,
         CAST(sum(x1 * y2) AS BIGINT) AS p_x1y2,
         CAST(sum(x2 * y1) AS BIGINT) AS p_x2y1,
         CAST(sum(x2 * y2) AS BIGINT) AS p_x2y2
  FROM d
), c AS (
  SELECT CAST(n AS BIGINT) AS n_int, CAST(n AS DOUBLE) AS n,
         CAST(n AS DOUBLE) * p_x1x1 - CAST(s_x1 AS DOUBLE) * s_x1 AS sxx11,
         CAST(n AS DOUBLE) * p_x1x2 - CAST(s_x1 AS DOUBLE) * s_x2 AS sxx12,
         CAST(n AS DOUBLE) * p_x2x2 - CAST(s_x2 AS DOUBLE) * s_x2 AS sxx22,
         CAST(n AS DOUBLE) * p_y1y1 - CAST(s_y1 AS DOUBLE) * s_y1 AS syy11,
         CAST(n AS DOUBLE) * p_y1y2 - CAST(s_y1 AS DOUBLE) * s_y2 AS syy12,
         CAST(n AS DOUBLE) * p_y2y2 - CAST(s_y2 AS DOUBLE) * s_y2 AS syy22,
         CAST(n AS DOUBLE) * p_x1y1 - CAST(s_x1 AS DOUBLE) * s_y1 AS sxy11,
         CAST(n AS DOUBLE) * p_x1y2 - CAST(s_x1 AS DOUBLE) * s_y2 AS sxy12,
         CAST(n AS DOUBLE) * p_x2y1 - CAST(s_x2 AS DOUBLE) * s_y1 AS sxy21,
         CAST(n AS DOUBLE) * p_x2y2 - CAST(s_x2 AS DOUBLE) * s_y2 AS sxy22
  FROM g
), m AS (
  SELECT n_int,
         ((sxx22 * sxy11 - sxx12 * sxy21) / (sxx11 * sxx22 - sxx12 * sxx12))
           AS a11,
         ((sxx22 * sxy12 - sxx12 * sxy22) / (sxx11 * sxx22 - sxx12 * sxx12))
           AS a12,
         ((sxx11 * sxy21 - sxx12 * sxy11) / (sxx11 * sxx22 - sxx12 * sxx12))
           AS a21,
         ((sxx11 * sxy22 - sxx12 * sxy12) / (sxx11 * sxx22 - sxx12 * sxx12))
           AS a22,
         ((syy22 * sxy11 - syy12 * sxy12) / (syy11 * syy22 - syy12 * syy12))
           AS b11,
         ((syy22 * sxy21 - syy12 * sxy22) / (syy11 * syy22 - syy12 * syy12))
           AS b12,
         ((syy11 * sxy12 - syy12 * sxy11) / (syy11 * syy22 - syy12 * syy12))
           AS b21,
         ((syy11 * sxy22 - syy12 * sxy21) / (syy11 * syy22 - syy12 * syy12))
           AS b22
  FROM c
), e AS (
  SELECT n_int,
         a11 * b11 + a12 * b21 AS m11,
         a11 * b12 + a12 * b22 AS m12,
         a21 * b11 + a22 * b21 AS m21,
         a21 * b12 + a22 * b22 AS m22
  FROM m
), f AS (
  SELECT n_int,
         (m11 + m22
          + sqrt(greatest((m11 + m22) ^ 2
                          - 4 * (m11 * m22 - m12 * m21), 0.0))) / 2 AS lam1,
         (m11 + m22
          - sqrt(greatest((m11 + m22) ^ 2
                          - 4 * (m11 * m22 - m12 * m21), 0.0))) / 2 AS lam2
  FROM e
)
SELECT CAST(n_int AS BIGINT) AS n_days,
       CAST(floor(sqrt(greatest(lam1, 0.0)) * 1000000 + {_OFF}) AS BIGINT)
         AS rho1_e6,
       CAST(floor(sqrt(greatest(lam2, 0.0)) * 1000000 + {_OFF}) AS BIGINT)
         AS rho2_e6
FROM f
"""


# ---------------------------------------------------------------------------
# drawdown_durations — longest underwater spell of the daily cumulative
# value series per event_type (the duration companion to max_drawdown)
# ---------------------------------------------------------------------------
# Daily exact cumulative sums; underwater = cum < running peak; run
# lengths via the day-index minus row_number grouping trick — exact
# integers end-to-end.


def q_drawdown_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.to_date("ts").alias("day"),
        # centered contribution so the cumulative meanders: v - 4900
        (F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long") - 4900)
        .alias("dv"),
    )
    d = ev.groupBy("event_type", "day").agg(F.sum("dv").alias("x"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = (
        d.withColumn("i", F.row_number().over(wo))
        .withColumn("cum", F.sum("x").over(wc))
        .withColumn("peak", F.max(F.sum("x").over(wc)).over(wc))
    )
    t = t.withColumn("uw", (F.col("cum") < F.col("peak")).cast("int"))
    wuw = Window.partitionBy("event_type", "uw").orderBy("i")
    t = t.withColumn(
        "grpkey",
        F.when(F.col("uw") == 1, F.col("i") - F.row_number().over(wuw)),
    )
    runs = (
        t.filter(F.col("uw") == 1)
        .groupBy("event_type", "grpkey")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    longest = runs.groupBy("event_type").agg(
        F.max("len").alias("longest_uw"),
        F.count(F.lit(1)).alias("n_spells"),
    )
    dd = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max(F.col("peak") - F.col("cum")).alias("max_dd"),
    )
    out = dd.join(longest, "event_type", "left").select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("max_dd").cast("long").alias("max_dd_centi"),
        F.coalesce(F.col("longest_uw"), F.lit(0)).cast("long").alias(
            "longest_underwater"
        ),
        F.coalesce(F.col("n_spells"), F.lit(0)).cast("long").alias(
            "n_spells"
        ),
    )
    return out.orderBy("event_type")


SQL_DDUR = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) - 4900 AS dv
  FROM events
), d AS (
  SELECT event_type, day, CAST(sum(dv) AS BIGINT) AS x
  FROM ev GROUP BY 1, 2
), t AS (
  SELECT event_type, day,
         row_number() OVER w AS i,
         CAST(sum(x) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
                           CURRENT ROW) AS BIGINT) AS cum
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), p AS (
  SELECT *,
         CAST(max(cum) OVER (PARTITION BY event_type ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS peak
  FROM t
), u AS (
  SELECT *,
         CASE WHEN cum < peak THEN 1 ELSE 0 END AS uw
  FROM p
), keyed AS (
  SELECT event_type,
         i - row_number() OVER (PARTITION BY event_type, uw
                                ORDER BY i) AS grpkey,
         uw
  FROM u
), runs AS (
  SELECT event_type, grpkey, count(*) AS len
  FROM keyed WHERE uw = 1
  GROUP BY 1, 2
), longest AS (
  SELECT event_type,
         CAST(max(len) AS BIGINT) AS longest_uw,
         CAST(count(*) AS BIGINT) AS n_spells
  FROM runs
  GROUP BY 1
), dd AS (
  SELECT event_type, count(*) AS n_days,
         CAST(max(peak - cum) AS BIGINT) AS max_dd
  FROM u GROUP BY 1
)
SELECT dd.event_type,
       CAST(n_days AS BIGINT) AS n_days,
       max_dd AS max_dd_centi,
       COALESCE(longest.longest_uw, 0) AS longest_underwater,
       COALESCE(longest.n_spells, 0) AS n_spells
FROM dd LEFT JOIN longest ON longest.event_type = dd.event_type
ORDER BY dd.event_type
"""


QUERIES.update(
    {
        "tl_moments": q_tl_moments,
        "baxter_king": q_baxter_king,
        "cca_2x2": q_cca_2x2,
        "drawdown_durations": q_drawdown_durations,
    }
)

ORACLE_SQL.update(
    {
        "tl_moments": SQL_TLMOM,
        "baxter_king": SQL_BK,
        "cca_2x2": SQL_CCA,
        "drawdown_durations": SQL_DDUR,
    }
)


# ---------------------------------------------------------------------------
# cornish_fisher_audit — moments -> quantile expansion vs exact order
# statistics (Cornish & Fisher 1938), the "moment sketch" accuracy
# check
# ---------------------------------------------------------------------------
# Power sums in VALUE units keep v^4 int64-safe to ~10^7 rows/key; the
# CF expansion at z90/z99 (constants embedded verbatim) is compared to
# the exact empirical quantiles (ceil(p n) order stats).


def q_cornish_fisher_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v")).alias("s3"),
        F.sum(F.col("v") * F.col("v") * F.col("v") * F.col("v")).alias("s4"),
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - m1 * m1
    m3 = (
        F.col("s3").cast("double") / n
        - 3 * m1 * F.col("s2").cast("double") / n
        + 2 * m1 * m1 * m1
    )
    m4 = (
        F.col("s4").cast("double") / n
        - 4 * m1 * F.col("s3").cast("double") / n
        + 6 * m1 * m1 * F.col("s2").cast("double") / n
        - 3 * m1 * m1 * m1 * m1
    )
    sd = F.sqrt(m2)
    skew = m3 / F.pow(sd, 3)
    exk = m4 / (m2 * m2) - 3.0

    def cf(z):
        zc = F.lit(z)
        return m1 + sd * (
            zc
            + (zc * zc - 1) * skew / 6.0
            + (zc * zc * zc - 3 * zc) * exk / 24.0
            - (2 * zc * zc * zc - 5 * zc) * skew * skew / 36.0
        )

    coef = g.select(
        "event_type",
        F.col("n").alias("n"),
        F.floor(cf(1.2815515655) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("cf_q90_e4"),
        F.floor(cf(2.3263478740) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("cf_q99_e4"),
    )
    wq = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.withColumn("rk", F.row_number().over(wq)).withColumn(
        "nn", F.count(F.lit(1)).over(wn)
    )
    q90 = r.filter(
        F.col("rk") == F.ceil(F.col("nn") * 0.9).cast("int")
    ).select("event_type", F.col("v").alias("q90_exact"))
    q99 = r.filter(
        F.col("rk") == F.ceil(F.col("nn") * 0.99).cast("int")
    ).select("event_type", F.col("v").alias("q99_exact"))
    out = coef.join(q90, "event_type").join(q99, "event_type")
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("q90_exact").cast("long").alias("q90_exact"),
        "cf_q90_e4",
        F.col("q99_exact").cast("long").alias("q99_exact"),
        "cf_q99_e4",
    ).orderBy("event_type")


SQL_CF_AUDIT = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(value + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s1,
         CAST(sum(v * v) AS BIGINT) AS s2,
         CAST(sum(v * v * v) AS BIGINT) AS s3,
         CAST(sum(v * v * v * v) AS BIGINT) AS s4
  FROM ev GROUP BY 1
), m AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS m1,
         CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) ^ 2 AS m2,
         CAST(s3 AS DOUBLE) / n
           - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
           + 2 * (CAST(s1 AS DOUBLE) / n) ^ 3 AS m3,
         CAST(s4 AS DOUBLE) / n
           - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
           + 6 * (CAST(s1 AS DOUBLE) / n) ^ 2 * (CAST(s2 AS DOUBLE) / n)
           - 3 * (CAST(s1 AS DOUBLE) / n) ^ 4 AS m4
  FROM g
), c AS (
  SELECT event_type, n, m1, sqrt(m2) AS sd,
         m3 / sqrt(m2) ^ 3 AS skew,
         m4 / (m2 * m2) - 3.0 AS exk
  FROM m
), cf AS (
  SELECT event_type, n,
         CAST(floor((m1 + sd * (1.2815515655
                + (1.2815515655 ^ 2 - 1) * skew / 6.0
                + (1.2815515655 ^ 3 - 3 * 1.2815515655) * exk / 24.0
                - (2 * 1.2815515655 ^ 3 - 5 * 1.2815515655)
                  * skew * skew / 36.0)) * 10000 + {_OFF}) AS BIGINT)
           AS cf_q90_e4,
         CAST(floor((m1 + sd * (2.3263478740
                + (2.3263478740 ^ 2 - 1) * skew / 6.0
                + (2.3263478740 ^ 3 - 3 * 2.3263478740) * exk / 24.0
                - (2 * 2.3263478740 ^ 3 - 5 * 2.3263478740)
                  * skew * skew / 36.0)) * 10000 + {_OFF}) AS BIGINT)
           AS cf_q99_e4
  FROM c
), r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM ev
), q90 AS (
  SELECT event_type, v AS q90_exact FROM r
  WHERE rk = CAST(ceil(nn * 0.9) AS INT)
), q99 AS (
  SELECT event_type, v AS q99_exact FROM r
  WHERE rk = CAST(ceil(nn * 0.99) AS INT)
)
SELECT cf.event_type,
       CAST(cf.n AS BIGINT) AS n,
       CAST(q90.q90_exact AS BIGINT) AS q90_exact,
       cf_q90_e4,
       CAST(q99.q99_exact AS BIGINT) AS q99_exact,
       cf_q99_e4
FROM cf
JOIN q90 ON q90.event_type = cf.event_type
JOIN q99 ON q99.event_type = cf.event_type
ORDER BY cf.event_type
"""


# ---------------------------------------------------------------------------
# minhash_accuracy_audit — k=16 MinHash Jaccard estimate vs exact
# Jaccard on within-source doc pairs (Broder 1997)
# ---------------------------------------------------------------------------
# Hashes are the repo's shared md5 h60 with seed mixing (word||'|'||s),
# so both engines sketch IDENTICAL streams; the audit reports the mean
# absolute estimate error per source — the accuracy story behind
# dedup_minhash_lsh.


def q_minhash_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.dedup import _h60

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = d.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias(
            "w"
        ),
    ).filter(F.length("w") > 0)
    seeds = d.sparkSession.range(0, 16).select(
        F.col("id").cast("int").alias("s")
    )
    mins = (
        words.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "source",
            "s",
            _h60(
                F.concat(F.col("w"), F.lit("|"), F.col("s").cast("string"))
            ).alias("h"),
        )
        .groupBy("doc_id", "source", "s")
        .agg(F.min("h").alias("mh"))
    )
    # probe-pair sample (da % 7 == 0; 7 is coprime to the generator's
    # doc_id % 20 source layout, so every source keeps probes): the
    # audit's pair scope is quadratic per source, so at bench/100TB
    # scale it runs on a deterministic ~14% probe side (round-4 tail
    # repair; oracle twin carries the same predicate)
    a = mins.filter(F.col("doc_id") % 7 == 0).select(
        F.col("source"),
        F.col("doc_id").alias("da"),
        "s",
        F.col("mh").alias("ha"),
    )
    b = mins.select(
        F.col("source").alias("src2"),
        F.col("doc_id").alias("db"),
        F.col("s").alias("s2"),
        F.col("mh").alias("hb"),
    )
    est = (
        a.join(
            b,
            (F.col("source") == F.col("src2"))
            & (F.col("da") < F.col("db"))
            & (F.col("s") == F.col("s2")),
        )
        .groupBy("source", "da", "db")
        .agg(F.sum((F.col("ha") == F.col("hb")).cast("long")).alias("match"))
    )
    sizes = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    wa = words.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("da"), "source", "w"
    )
    wb = words.select(F.col("doc_id").alias("db"), F.col("source").alias(
        "src2"
    ), F.col("w").alias("w2"))
    inter = (
        wa.join(
            wb,
            (F.col("source") == F.col("src2"))
            & (F.col("da") < F.col("db"))
            & (F.col("w") == F.col("w2")),
        )
        .groupBy("source", "da", "db")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("szb"))
    j = (
        est.join(inter, ["source", "da", "db"], "left")
        .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
        .join(F.broadcast(sa), "da")
        .join(F.broadcast(sb), "db")
    )
    exact = F.col("inter").cast("double") / (
        F.col("sza") + F.col("szb") - F.col("inter")
    ).cast("double")
    estj = F.col("match").cast("double") / 16.0
    j = j.withColumn(
        "abserr_e6",
        F.floor(F.abs(estj - exact) * 1_000_000 + F.lit(_OFF)).cast("long"),
    )
    out = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("abserr_e6").alias("s_err"),
    )
    return out.select(
        "source",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.floor(
            F.col("s_err").cast("double") / F.col("n_pairs").cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mae_e6"),
    ).orderBy("source")


SQL_MINHASH_AUDIT = f"""
WITH words AS (
  SELECT DISTINCT doc_id, source, w
  FROM documents,
       unnest(string_split_regex(trim(text), '\\s+')) AS u(w)
  WHERE length(w) > 0
), mins AS (
  SELECT doc_id, source, s,
         min(CAST('0x' || substr(md5(w || '|' || CAST(s AS VARCHAR)), 1, 15)
                  AS BIGINT)) AS mh
  FROM words, unnest(generate_series(0, 15)) AS g(s)
  GROUP BY 1, 2, 3
), est AS (
  SELECT a.source, a.doc_id AS da, b.doc_id AS db,
         CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
           AS match
  FROM mins a
  JOIN mins b ON b.source = a.source AND a.doc_id < b.doc_id
             AND b.s = a.s
  WHERE a.doc_id % 7 = 0
  GROUP BY 1, 2, 3
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM words GROUP BY 1
), inter AS (
  SELECT a.source, a.doc_id AS da, b.doc_id AS db,
         count(*) AS inter
  FROM words a
  JOIN words b ON b.source = a.source AND a.doc_id < b.doc_id
             AND b.w = a.w
  WHERE a.doc_id % 7 = 0
  GROUP BY 1, 2, 3
), j AS (
  SELECT est.source, est.da, est.db, est.match,
         COALESCE(inter.inter, 0) AS inter,
         sa.sz AS sza, sb.sz AS szb
  FROM est
  LEFT JOIN inter ON inter.source = est.source
                 AND inter.da = est.da AND inter.db = est.db
  JOIN sizes sa ON sa.doc_id = est.da
  JOIN sizes sb ON sb.doc_id = est.db
), e AS (
  SELECT source,
         CAST(floor(abs(CAST(match AS DOUBLE) / 16.0
                        - CAST(inter AS DOUBLE) / (sza + szb - inter))
                    * 1000000 + {_OFF}) AS BIGINT) AS abserr_e6
  FROM j
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(floor(CAST(sum(abserr_e6) AS DOUBLE) / count(*) + {_OFF})
            AS BIGINT) AS mae_e6
FROM e
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# chisq_posthoc_residuals — standardized Pearson residuals per cell of
# the event_type x diel-bucket table (Haberman 1973 post-hoc)
# ---------------------------------------------------------------------------
# r = (O - E) / sqrt(E (1 - row/N)(1 - col/N)); exact counts, identical
# doubles; cells with |r| > 2 flagged.


def q_chisq_posthoc_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.hour("ts") / 6).cast("int").alias("b"),
    )
    cell = ev.groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("o"))
    row = cell.groupBy("event_type").agg(F.sum("o").alias("rn"))
    col = cell.groupBy("b").agg(F.sum("o").alias("cn"))
    tot = cell.groupBy().agg(F.sum("o").alias("nn"))
    j = (
        cell.join(F.broadcast(row), "event_type")
        .join(F.broadcast(col), "b")
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("nn").cast("double")
    e = F.col("rn").cast("double") * F.col("cn").cast("double") / nd
    r = (F.col("o").cast("double") - e) / F.sqrt(
        e
        * (1 - F.col("rn").cast("double") / nd)
        * (1 - F.col("cn").cast("double") / nd)
    )
    return j.select(
        "event_type",
        F.col("b").cast("long").alias("bucket"),
        F.col("o").cast("long").alias("o"),
        F.floor(e * 10_000 + F.lit(_OFF)).cast("long").alias("e_e4"),
        F.floor(r * 10_000 + F.lit(_OFF)).cast("long").alias("r_e4"),
        (F.abs(r) > 2.0).cast("long").alias("flagged"),
    ).orderBy("event_type", "bucket")


SQL_POSTHOC = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS b
  FROM events
), cell AS (
  SELECT event_type, b, count(*) AS o
  FROM ev GROUP BY 1, 2
), rowm AS (
  SELECT event_type, CAST(sum(o) AS BIGINT) AS rn FROM cell GROUP BY 1
), colm AS (
  SELECT b, CAST(sum(o) AS BIGINT) AS cn FROM cell GROUP BY 1
), tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS nn FROM cell
), j AS (
  SELECT cell.event_type, cell.b, cell.o, rn, cn, nn,
         CAST(rn AS DOUBLE) * cn / nn AS e
  FROM cell
  JOIN rowm ON rowm.event_type = cell.event_type
  JOIN colm ON colm.b = cell.b
  CROSS JOIN tot
)
SELECT event_type,
       CAST(b AS BIGINT) AS bucket,
       CAST(o AS BIGINT) AS o,
       CAST(floor(e * 10000 + {_OFF}) AS BIGINT) AS e_e4,
       CAST(floor((o - e) / sqrt(e * (1 - CAST(rn AS DOUBLE) / nn)
                                   * (1 - CAST(cn AS DOUBLE) / nn))
                  * 10000 + {_OFF}) AS BIGINT) AS r_e4,
       CAST(CASE WHEN abs((o - e) / sqrt(e * (1 - CAST(rn AS DOUBLE) / nn)
                                           * (1 - CAST(cn AS DOUBLE) / nn)))
                      > 2.0
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM j
ORDER BY event_type, bucket
"""


QUERIES.update(
    {
        "cornish_fisher_audit": q_cornish_fisher_audit,
        "minhash_accuracy_audit": q_minhash_accuracy_audit,
        "chisq_posthoc_residuals": q_chisq_posthoc_residuals,
    }
)

ORACLE_SQL.update(
    {
        "cornish_fisher_audit": SQL_CF_AUDIT,
        "minhash_accuracy_audit": SQL_MINHASH_AUDIT,
        "chisq_posthoc_residuals": SQL_POSTHOC,
    }
)


# ---------------------------------------------------------------------------
# gev_lmom_fit — GEV fit by L-moments on daily maxima (Hosking,
# Wallis & Wood 1985); completes the EVT family (gumbel_maxima is the
# k = 0 special case)
# ---------------------------------------------------------------------------
# b0/b1/b2 from per-row order-statistic RATIO terms (e6-floored before
# the exact sums); k = 7.8590c + 2.9554c^2 with c = 2/(3+t3) -
# ln2/ln3; Gamma(1+k) via the SAME Lanczos g=5 series written verbatim
# in both engines (no engine gamma() builtin is used — Spark has none).
# Return level at p = 0.99 from the Hosking quantile form.


def q_gev_lmom_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    mx = ev.groupBy("event_type", "day").agg(F.max("v").alias("x"))
    wq = Window.partitionBy("event_type").orderBy("x", "day")
    wn = Window.partitionBy("event_type")
    t = mx.withColumn("i", F.row_number().over(wq).cast("double")).withColumn(
        "n", F.count(F.lit(1)).over(wn).cast("double")
    )
    x = F.col("x").cast("double")
    i = F.col("i")
    n = F.col("n")
    t = (
        t.withColumn(
            "b0_e6", F.floor(x / n * 1_000_000 + F.lit(_OFF)).cast("long")
        )
        .withColumn(
            "b1_e6",
            F.floor(
                x * (i - 1) / (n - 1) / n * 1_000_000 + F.lit(_OFF)
            ).cast("long"),
        )
        .withColumn(
            "b2_e6",
            F.floor(
                x * (i - 1) * (i - 2) / ((n - 1) * (n - 2)) / n * 1_000_000
                + F.lit(_OFF)
            ).cast("long"),
        )
    )
    agg = t.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("b0_e6").alias("b0"),
        F.sum("b1_e6").alias("b1"),
        F.sum("b2_e6").alias("b2"),
    )
    b0 = F.col("b0").cast("double") / 1e6
    b1 = F.col("b1").cast("double") / 1e6
    b2 = F.col("b2").cast("double") / 1e6
    lam1 = b0
    lam2 = 2 * b1 - b0
    lam3 = 6 * b2 - 6 * b1 + b0
    t3 = lam3 / lam2
    c = 2.0 / (3.0 + t3) - math.log(2) / math.log(3)
    k = 7.8590 * c + 2.9554 * c * c

    def lanczos_gamma(xx):
        # Numerical Recipes g=5 series, valid here for xx in (0.5, 1.5)
        tmp = xx + 5.5
        ser = (
            F.lit(1.000000000190015)
            + 76.18009172947146 / (xx + 1)
            - 86.50532032941677 / (xx + 2)
            + 24.01409824083091 / (xx + 3)
            - 1.231739572450155 / (xx + 4)
            + 0.1208650973866179e-2 / (xx + 5)
            - 0.5395239384953e-5 / (xx + 6)
        )
        return (
            F.exp((xx + 0.5) * F.log(tmp) - tmp)
            * F.lit(2.5066282746310005)
            * ser
            / xx
        )

    gam = lanczos_gamma(F.lit(1.0) + k)
    sigma = lam2 * k / ((1 - F.pow(F.lit(2.0), -k)) * gam)
    mu = lam1 - sigma * (1 - gam) / k
    rl99 = mu + sigma * (1 - F.pow(-F.log(F.lit(0.99)), k)) / k
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(k * 1_000_000 + F.lit(_OFF)).cast("long").alias("k_e6"),
        F.floor(sigma * 100 + F.lit(_OFF)).cast("long").alias("sigma_e4"),
        F.floor(mu * 100 + F.lit(_OFF)).cast("long").alias("mu_e4"),
        F.floor(rl99 * 100 + F.lit(_OFF)).cast("long").alias("rl99_e4"),
    ).orderBy("event_type")


SQL_GEV = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), mx AS (
  SELECT event_type, day, max(v) AS x
  FROM ev GROUP BY 1, 2
), t AS (
  SELECT event_type, x,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY x, day) AS DOUBLE) AS i,
         CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n
  FROM mx
), terms AS (
  SELECT event_type, n,
         CAST(floor(x / n * 1000000 + {_OFF}) AS BIGINT) AS b0_e6,
         CAST(floor(x * (i - 1) / (n - 1) / n * 1000000 + {_OFF})
              AS BIGINT) AS b1_e6,
         CAST(floor(x * (i - 1) * (i - 2) / ((n - 1) * (n - 2)) / n
                    * 1000000 + {_OFF}) AS BIGINT) AS b2_e6
  FROM t
), agg AS (
  SELECT event_type, max(n) AS n,
         CAST(sum(b0_e6) AS BIGINT) AS b0,
         CAST(sum(b1_e6) AS BIGINT) AS b1,
         CAST(sum(b2_e6) AS BIGINT) AS b2
  FROM terms GROUP BY 1
), lm AS (
  SELECT event_type, n,
         CAST(b0 AS DOUBLE) / 1e6 AS lam1,
         2 * CAST(b1 AS DOUBLE) / 1e6 - CAST(b0 AS DOUBLE) / 1e6 AS lam2,
         6 * CAST(b2 AS DOUBLE) / 1e6 - 6 * CAST(b1 AS DOUBLE) / 1e6
           + CAST(b0 AS DOUBLE) / 1e6 AS lam3
  FROM agg
), kk AS (
  SELECT event_type, n, lam1, lam2,
         7.8590 * (2.0 / (3.0 + lam3 / lam2) - ln(2) / ln(3))
         + 2.9554 * (2.0 / (3.0 + lam3 / lam2) - ln(2) / ln(3)) ^ 2 AS k
  FROM lm
), gm AS (
  SELECT event_type, n, lam1, lam2, k,
         exp((1.0 + k + 0.5) * ln(1.0 + k + 5.5) - (1.0 + k + 5.5))
           * 2.5066282746310005
           * (1.000000000190015
              + 76.18009172947146 / (1.0 + k + 1)
              - 86.50532032941677 / (1.0 + k + 2)
              + 24.01409824083091 / (1.0 + k + 3)
              - 1.231739572450155 / (1.0 + k + 4)
              + 0.1208650973866179e-2 / (1.0 + k + 5)
              - 0.5395239384953e-5 / (1.0 + k + 6))
           / (1.0 + k) AS gam
  FROM kk
), f AS (
  SELECT event_type, n, k,
         lam2 * k / ((1 - 2 ^ (-k)) * gam) AS sigma,
         lam1 - lam2 * k / ((1 - 2 ^ (-k)) * gam) * (1 - gam) / k AS mu
  FROM gm
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CAST(floor(k * 1000000 + {_OFF}) AS BIGINT) AS k_e6,
       CAST(floor(sigma * 100 + {_OFF}) AS BIGINT) AS sigma_e4,
       CAST(floor(mu * 100 + {_OFF}) AS BIGINT) AS mu_e4,
       CAST(floor((mu + sigma * (1 - (-ln(0.99)) ^ k) / k) * 100 + {_OFF})
            AS BIGINT) AS rl99_e4
FROM f
ORDER BY event_type
"""


QUERIES.update({"gev_lmom_fit": q_gev_lmom_fit})
ORACLE_SQL.update({"gev_lmom_fit": SQL_GEV})


# ---------------------------------------------------------------------------
# boxcox_grid — Box-Cox (1964) lambda by profile log-likelihood over
# the standard grid {-1, -0.5, 0, 0.5, 1}
# ---------------------------------------------------------------------------
# LL(lambda) = -n/2 ln(sigma2(lambda)) + (lambda - 1) sum ln x; the
# transformed values and ln x are e6-floored per row so every sum is an
# exact BIGINT; argmax compares identical doubles (tie -> smaller
# lambda index).


def q_boxcox_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long") + 1).alias(
            "v"
        ),
    )
    grid = ev.sparkSession.createDataFrame(
        [(0, -1.0), (1, -0.5), (2, 0.0), (3, 0.5), (4, 1.0)],
        ["gi", "lam"],
    )
    t = ev.crossJoin(F.broadcast(grid))
    x = F.col("v").cast("double")
    y = F.when(
        F.col("lam") == 0.0, F.log(x)
    ).otherwise((F.pow(x, F.col("lam")) - 1) / F.col("lam"))
    t = t.withColumn(
        "y_e6", F.floor(y * 1_000 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "lx_e6", F.floor(F.log(x) * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    agg = t.groupBy("event_type", "gi", "lam").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y_e6").alias("sy"),
        F.sum(F.col("y_e6") * F.col("y_e6")).alias("syy"),
        F.sum("lx_e6").alias("slx"),
    )
    n = F.col("n").cast("double")
    var = (
        n * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    ) / (n * n) / 1e6  # y scaled e3 -> var scaled e6
    ll = -n / 2.0 * F.log(var) + (F.col("lam") - 1) * F.col("slx").cast(
        "double"
    ) / 1e6
    scored = agg.withColumn("ll", ll)
    best = scored.groupBy("event_type").agg(
        F.max_by(
            F.struct(F.col("lam"), F.col("ll"), F.col("n")),
            F.struct(F.col("ll"), -F.col("gi")),
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.n").cast("long").alias("n"),
        F.floor(F.col("b.lam") * 10 + F.lit(_OFF)).cast("long").alias(
            "lambda_x10"
        ),
        F.floor(F.col("b.ll") * 100 + F.lit(_OFF)).cast("long").alias(
            "ll_e2"
        ),
    ).orderBy("event_type")


SQL_BOXCOX = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) + 1 AS v
  FROM events
), grid AS (
  SELECT * FROM (VALUES (0, -1.0), (1, -0.5), (2, 0.0), (3, 0.5),
                        (4, 1.0)) AS g(gi, lam)
), t AS (
  SELECT event_type, gi, lam,
         CAST(floor(CASE WHEN lam = 0.0 THEN ln(CAST(v AS DOUBLE))
                         ELSE (CAST(v AS DOUBLE) ^ lam - 1) / lam END
                    * 1000 + {_OFF}) AS BIGINT) AS y_e6,
         CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000 + {_OFF}) AS BIGINT)
           AS lx_e6
  FROM ev CROSS JOIN grid
), agg AS (
  SELECT event_type, gi, lam, count(*) AS n,
         CAST(sum(y_e6) AS BIGINT) AS sy,
         CAST(sum(y_e6 * y_e6) AS BIGINT) AS syy,
         CAST(sum(lx_e6) AS BIGINT) AS slx
  FROM t GROUP BY 1, 2, 3
), scored AS (
  SELECT event_type, gi, lam, n,
         -CAST(n AS DOUBLE) / 2.0
           * ln((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * n) / 1e6)
         + (lam - 1) * CAST(slx AS DOUBLE) / 1e6 AS ll
  FROM agg
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY ll DESC, gi) AS rk
  FROM scored
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(lam * 10 + {_OFF}) AS BIGINT) AS lambda_x10,
       CAST(floor(ll * 100 + {_OFF}) AS BIGINT) AS ll_e2
FROM ranked
WHERE rk = 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# anscombe_vst_audit — Anscombe (1948) variance-stabilizing transform
# check on per-(user, day) Poisson-ish counts
# ---------------------------------------------------------------------------
# If counts are Poisson, 2 sqrt(k + 3/8) has variance ~1; the audit
# reports the per-day variance of the transformed counts (e6-floored
# per row) and the share of days inside [0.5, 2].


def q_anscombe_vst_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.to_date("ts").alias("day")
    )
    c = ev.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("k"))
    z = 2.0 * F.sqrt(F.col("k").cast("double") + 0.375)
    t = c.withColumn(
        "z_e6", F.floor(z * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    d = t.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z_e6").alias("sz"),
        F.sum(F.col("z_e6") * F.col("z_e6")).alias("szz"),
    )
    n = F.col("n").cast("double")
    var = (
        n * F.col("szz").cast("double")
        - F.col("sz").cast("double") * F.col("sz").cast("double")
    ) / (n * (n - 1)) / 1e12
    d = d.withColumn("var_e6", F.floor(var * 1_000_000 + F.lit(_OFF)).cast(
        "long"
    ))
    agg = d.groupBy().agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            (
                (F.col("var_e6") >= 500_000) & (F.col("var_e6") <= 2_000_000)
            ).cast("long")
        ).alias("n_in_band"),
        F.min("var_e6").alias("min_var_e6"),
        F.max("var_e6").alias("max_var_e6"),
    )
    return agg.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_in_band").cast("long").alias("n_in_band"),
        F.col("min_var_e6").cast("long").alias("min_var_e6"),
        F.col("max_var_e6").cast("long").alias("max_var_e6"),
    )


SQL_ANSCOMBE = f"""
WITH c AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS k
  FROM events GROUP BY 1, 2
), t AS (
  SELECT day,
         CAST(floor(2.0 * sqrt(CAST(k AS DOUBLE) + 0.375) * 1000000
                    + {_OFF}) AS BIGINT) AS z_e6
  FROM c
), d AS (
  SELECT day, count(*) AS n,
         CAST(sum(z_e6) AS BIGINT) AS sz,
         CAST(sum(z_e6 * z_e6) AS BIGINT) AS szz
  FROM t GROUP BY 1
), v AS (
  SELECT day,
         CAST(floor((CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)
                    / (CAST(n AS DOUBLE) * (n - 1)) / 1e12 * 1000000
                    + {_OFF}) AS BIGINT) AS var_e6
  FROM d
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN var_e6 BETWEEN 500000 AND 2000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band,
       CAST(min(var_e6) AS BIGINT) AS min_var_e6,
       CAST(max(var_e6) AS BIGINT) AS max_var_e6
FROM v
"""


# ---------------------------------------------------------------------------
# copula_tail_fit — Gumbel/Clayton copula parameters from Kendall's
# tau on daily (click, purchase) means, with implied tail dependence
# (Genest & Rivest 1993 inversion)
# ---------------------------------------------------------------------------
# tau_a from exact concordant/discordant pair counts over the bounded
# daily pair set; Gumbel theta = 1/(1 - tau) with upper tail
# lambda_U = 2 - 2^(1/theta); Clayton theta = 2 tau/(1 - tau) with
# lower tail lambda_L = 2^(-1/theta).


def q_copula_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    pr = a.join(b, F.col("di") < F.col("dj"))
    conc = (
        F.signum((F.col("xj") - F.col("xi")).cast("double"))
        * F.signum((F.col("yj") - F.col("yi")).cast("double"))
    )
    agg = pr.groupBy().agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((conc > 0).cast("long")).alias("nc"),
        F.sum((conc < 0).cast("long")).alias("nd"),
    )
    tau = (F.col("nc") - F.col("nd")).cast("double") / F.col(
        "n_pairs"
    ).cast("double")
    th_g = 1.0 / (1.0 - tau)
    th_c = 2.0 * tau / (1.0 - tau)
    # exponents written via tau directly so the double chain is
    # STRUCTURALLY identical to the SQL twin (1/(1/(1-tau)) can differ
    # from (1-tau) by one ulp)
    lam_u = 2.0 - F.pow(F.lit(2.0), 1.0 - tau)
    lam_l = F.pow(F.lit(2.0), -(1.0 - tau) / (2.0 * tau))
    # degenerate guard (sf0.001 sweep): with a handful of days, tau can
    # reach 1 (all pairs concordant) or drop to <= 0; the Gumbel/Clayton
    # inversions 1/(1-tau), 2tau/(1-tau), 2^(-(1-tau)/(2tau)) then blow
    # past int64 (DuckDB refused a 4e71 cast) or are undefined.  The fits
    # exist only for tau in (0, 1) -> NULL outside, both engines.
    tau_ok = (tau > 0.0) & (tau < 0.999999)
    return agg.select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("nc").cast("long").alias("concordant"),
        F.col("nd").cast("long").alias("discordant"),
        F.floor(tau * 1_000_000 + F.lit(_OFF)).cast("long").alias("tau_e6"),
        F.when(
            tau_ok, F.floor(th_g * 1_000_000 + F.lit(_OFF)).cast("long")
        ).alias("gumbel_theta_e6"),
        F.when(
            tau_ok, F.floor(lam_u * 1_000_000 + F.lit(_OFF)).cast("long")
        ).alias("lambda_upper_e6"),
        F.when(
            tau_ok, F.floor(th_c * 1_000_000 + F.lit(_OFF)).cast("long")
        ).alias("clayton_theta_e6"),
        F.when(
            tau_ok, F.floor(lam_l * 1_000_000 + F.lit(_OFF)).cast("long")
        ).alias("lambda_lower_e6"),
    )


SQL_COPULA = f"""
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
), pr AS (
  SELECT sign(CAST(b.x - a.x AS DOUBLE))
         * sign(CAST(b.y - a.y AS DOUBLE)) AS conc
  FROM d a JOIN d b ON a.day < b.day
), agg AS (
  SELECT count(*) AS n_pairs,
         CAST(sum(CASE WHEN conc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN conc < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd
  FROM pr
), f AS (
  SELECT n_pairs, nc, nd,
         CAST(nc - nd AS DOUBLE) / n_pairs AS tau
  FROM agg
)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       nc AS concordant,
       nd AS discordant,
       CAST(floor(tau * 1000000 + {_OFF}) AS BIGINT) AS tau_e6,
       CAST(CASE WHEN tau > 0.0 AND tau < 0.999999
            THEN floor(1.0 / (1.0 - tau) * 1000000 + {_OFF})
            END AS BIGINT) AS gumbel_theta_e6,
       CAST(CASE WHEN tau > 0.0 AND tau < 0.999999
            THEN floor((2.0 - 2 ^ (1.0 - tau)) * 1000000 + {_OFF})
            END AS BIGINT) AS lambda_upper_e6,
       CAST(CASE WHEN tau > 0.0 AND tau < 0.999999
            THEN floor(2.0 * tau / (1.0 - tau) * 1000000 + {_OFF})
            END AS BIGINT) AS clayton_theta_e6,
       CAST(CASE WHEN tau > 0.0 AND tau < 0.999999
            THEN floor(2 ^ (-(1.0 - tau) / (2.0 * tau)) * 1000000 + {_OFF})
            END AS BIGINT) AS lambda_lower_e6
FROM f
"""


# ---------------------------------------------------------------------------
# tukey_depth_approx — halfspace (Tukey 1975) depth approximated over
# 8 fixed projection directions; the deepest daily point is the
# approximate Tukey median
# ---------------------------------------------------------------------------
# For each direction angle pi*j/8 the projection is e4-floored; 1-D
# rank depth = min(rank, n+1-rank); point depth = min over directions.
# Output: the deepest point (tie -> day) and the depth distribution.


def q_tukey_depth_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

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
    dirs = d.sparkSession.range(0, 8).select(
        F.col("id").cast("int").alias("j")
    )
    t = d.crossJoin(F.broadcast(dirs))
    ang = F.col("j").cast("double") * math.pi / 8.0
    proj = F.floor(
        (
            F.col("x").cast("double") * F.cos(ang)
            + F.col("y").cast("double") * F.sin(ang)
        )
        + F.lit(_OFF)
    ).cast("long")
    t = t.withColumn("p", proj)
    wr = Window.partitionBy("j").orderBy("p", "day")
    wn = Window.partitionBy("j")
    t = t.withColumn("rk", F.row_number().over(wr).cast("long")).withColumn(
        "n", F.count(F.lit(1)).over(wn).cast("long")
    )
    t = t.withColumn(
        "d1", F.least(F.col("rk"), F.col("n") + 1 - F.col("rk"))
    )
    depth = t.groupBy("day").agg(F.min("d1").alias("depth"))
    agg = depth.groupBy().agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max_by(
            F.struct(F.col("day"), F.col("depth")),
            F.struct(F.col("depth"), F.col("day").cast("string")),
        ).alias("b"),
        F.sum("depth").alias("s_depth"),
        F.max("depth").alias("max_depth"),
    )
    return agg.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("b.day").cast("string").alias("median_day"),
        F.col("max_depth").cast("long").alias("max_depth"),
        F.col("s_depth").cast("long").alias("sum_depth"),
    )


SQL_TUKEY_DEPTH = f"""
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
), t AS (
  SELECT day, j,
         CAST(floor(CAST(x AS DOUBLE) * cos(j * pi() / 8.0)
                    + CAST(y AS DOUBLE) * sin(j * pi() / 8.0) + {_OFF})
              AS BIGINT) AS p
  FROM d, unnest(generate_series(0, 7)) AS g(j)
), r AS (
  SELECT day, j,
         CAST(row_number() OVER (PARTITION BY j ORDER BY p, day)
              AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY j) AS BIGINT) AS n
  FROM t
), depth AS (
  SELECT day, min(least(rk, n + 1 - rk)) AS depth
  FROM r GROUP BY 1
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY depth DESC,
                               CAST(day AS VARCHAR) DESC) AS rnk,
         count(*) OVER () AS n_days,
         CAST(sum(depth) OVER () AS BIGINT) AS s_depth,
         CAST(max(depth) OVER () AS BIGINT) AS max_depth
  FROM depth
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       CAST(day AS VARCHAR) AS median_day,
       max_depth,
       s_depth AS sum_depth
FROM ranked
WHERE rnk = 1
"""


QUERIES.update(
    {
        "boxcox_grid": q_boxcox_grid,
        "anscombe_vst_audit": q_anscombe_vst_audit,
        "copula_tail_fit": q_copula_tail_fit,
        "tukey_depth_approx": q_tukey_depth_approx,
    }
)

ORACLE_SQL.update(
    {
        "boxcox_grid": SQL_BOXCOX,
        "anscombe_vst_audit": SQL_ANSCOMBE,
        "copula_tail_fit": SQL_COPULA,
        "tukey_depth_approx": SQL_TUKEY_DEPTH,
    }
)
