"""Round-4 continuation registry (tenth battery): classical
nonparametric inference gaps — ordered-alternative trend (Jonckheere-
Terpstra), median homogeneity (Mood), the Behrens-Fisher rank problem
(Brunner-Munzel), and variance homogeneity (Bartlett).

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)``, derived
doubles floor-scaled with the house 1/pi offset; rank machinery stays
exact-integer on the centivalue domain (the kruskal_wallis 2*midrank
discipline); sums of per-group DOUBLE terms only ever span <= |types|
addends (the anova discipline); per-cell double terms over unbounded
domains are floor-scaled to BIGINT BEFORE the aggregate sum so the
compare is order-free (brunner_munzel S^2 cells).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF

# ---------------------------------------------------------------------------
# jonckheere_terpstra — ordered-alternative trend across diel quarters
# ---------------------------------------------------------------------------
# Jonckheere (Biometrika 1954) / Terpstra (1952): against the ordered
# alternative theta_1 <= ... <= theta_k, JT = sum over group pairs
# i<j of the Mann-Whitney count #(x_i < x_j) + 0.5 #(x_i = x_j).
# Groups here are the four six-hour diel quarters (0-5h, 6-11h,
# 12-17h, 18-23h) per user; values are exact centivalues.  JT rides
# the value DOMAIN, never row pairs: per (user, v) the four group
# counts are pivoted wide, a per-user window over v supplies exclusive
# lower counts, and the pairwise products collapse to one pass —
# O(|domain|) work and one shuffle, the 100 TB posture (row-pair JT
# would be O(N^2)).  2*JT stays an exact BIGINT; the tie-corrected
# null variance (Kendall-form, e.g. Hollander & Wolfe ch. 6) is built
# from exact n_g / t_v power sums; z hits doubles only in the final
# division.  Cubic terms bound the exact range to N ~ 1e6 per user —
# the per-key (not global) N, same posture as the other exact-integer
# test batteries.
def q_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        (
            F.floor(
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
                )
                % 24
                / 6
            )
        )
        .cast("long")
        .alias("g"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cell = ev.groupBy("user_id", "v").agg(
        *[
            F.sum((F.col("g") == i).cast("long")).alias(f"c{i}")
            for i in range(4)
        ]
    )
    wv = (
        Window.partitionBy("user_id")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = cell
    for i in range(4):
        cum = cum.withColumn(
            f"s{i}", F.coalesce(F.sum(f"c{i}").over(wv), F.lit(0))
        )
    lt = (
        F.col("c1") * F.col("s0")
        + F.col("c2") * (F.col("s0") + F.col("s1"))
        + F.col("c3") * (F.col("s0") + F.col("s1") + F.col("s2"))
    )
    eq = (
        F.col("c1") * F.col("c0")
        + F.col("c2") * (F.col("c0") + F.col("c1"))
        + F.col("c3") * (F.col("c0") + F.col("c1") + F.col("c2"))
    )
    tv = F.col("c0") + F.col("c1") + F.col("c2") + F.col("c3")
    per_v = cum.select(
        "user_id",
        (2 * lt + eq).alias("jt2_part"),
        tv.alias("t"),
    )
    byv = per_v.groupBy("user_id").agg(
        F.sum("jt2_part").alias("jt2"),
        F.sum("t").alias("n"),
        F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias(
            "ta"
        ),
        F.sum(
            F.col("t") * (F.col("t") - 1) * (F.col("t") - 2)
        ).alias("tb"),
        F.sum(F.col("t") * (F.col("t") - 1)).alias("tc"),
    )
    byg = (
        ev.groupBy("user_id", "g")
        .agg(F.count(F.lit(1)).alias("ng"))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("ng") * F.col("ng")).alias("n2s"),
            F.sum(
                F.col("ng") * (F.col("ng") - 1) * (2 * F.col("ng") + 5)
            ).alias("ga"),
            F.sum(
                F.col("ng") * (F.col("ng") - 1) * (F.col("ng") - 2)
            ).alias("gb"),
            F.sum(F.col("ng") * (F.col("ng") - 1)).alias("gc"),
        )
    )
    j = byv.join(byg, "user_id")
    nd = F.col("n").cast("double")
    var = (
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("ga")
            - F.col("ta")
        ).cast("double")
        / 72.0
        + F.col("gb").cast("double")
        * F.col("tb").cast("double")
        / (36.0 * nd * (nd - 1) * (nd - 2))
        + F.col("gc").cast("double")
        * F.col("tc").cast("double")
        / (8.0 * nd * (nd - 1))
    )
    num = (
        2 * F.col("jt2") - (F.col("n") * F.col("n") - F.col("n2s"))
    ).cast("double")
    z = num / (4.0 * F.sqrt(var))
    return (
        j.filter((F.col("n") >= 8) & (var > 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.col("jt2").cast("long").alias("jt2"),
            F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        )
        .orderBy("user_id")
    )


SQL_JONCKHEERE = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor((CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) / 6)
              AS BIGINT) AS g,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cell AS (
  SELECT user_id, v,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT user_id, c0, c1, c2, c3,
         COALESCE(CAST(sum(c0) OVER (PARTITION BY user_id ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS s0,
         COALESCE(CAST(sum(c1) OVER (PARTITION BY user_id ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS s1,
         COALESCE(CAST(sum(c2) OVER (PARTITION BY user_id ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS s2
  FROM cell
), byv AS (
  SELECT user_id,
         CAST(sum(2 * (c1 * s0 + c2 * (s0 + s1) + c3 * (s0 + s1 + s2))
                  + (c1 * c0 + c2 * (c0 + c1) + c3 * (c0 + c1 + c2)))
              AS BIGINT) AS jt2,
         CAST(sum(c0 + c1 + c2 + c3) AS BIGINT) AS n,
         CAST(sum((c0 + c1 + c2 + c3) * (c0 + c1 + c2 + c3 - 1)
                  * (2 * (c0 + c1 + c2 + c3) + 5)) AS BIGINT) AS ta,
         CAST(sum((c0 + c1 + c2 + c3) * (c0 + c1 + c2 + c3 - 1)
                  * (c0 + c1 + c2 + c3 - 2)) AS BIGINT) AS tb,
         CAST(sum((c0 + c1 + c2 + c3) * (c0 + c1 + c2 + c3 - 1))
              AS BIGINT) AS tc
  FROM cum GROUP BY 1
), byg AS (
  SELECT user_id,
         CAST(sum(ng * ng) AS BIGINT) AS n2s,
         CAST(sum(ng * (ng - 1) * (2 * ng + 5)) AS BIGINT) AS ga,
         CAST(sum(ng * (ng - 1) * (ng - 2)) AS BIGINT) AS gb,
         CAST(sum(ng * (ng - 1)) AS BIGINT) AS gc
  FROM (SELECT user_id, g, count(*) AS ng FROM ev GROUP BY 1, 2)
  GROUP BY 1
), j AS (
  SELECT byv.user_id, n, jt2, n2s,
         (CAST(n * (n - 1) * (2 * n + 5) - ga - ta AS DOUBLE) / 72.0
          + CAST(gb AS DOUBLE) * CAST(tb AS DOUBLE)
            / (36.0 * n * (n - 1.0) * (n - 2.0))
          + CAST(gc AS DOUBLE) * CAST(tc AS DOUBLE)
            / (8.0 * n * (n - 1.0))) AS var
  FROM byv JOIN byg ON byg.user_id = byv.user_id
)
SELECT user_id, n, jt2,
       CAST(floor(CAST(2 * jt2 - (n * n - n2s) AS DOUBLE)
                  / (4.0 * sqrt(var)) * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM j
WHERE n >= 8 AND var > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# mood_median — median homogeneity of value across event types
# ---------------------------------------------------------------------------
# Mood (Introduction to the Theory of Statistics 1950): classify each
# observation as above / not-above the grand median, then chi-square
# the k x 2 table.  The grand LOWER median comes off the aggregated
# centivalue DOMAIN (a cumulative window over ~|distinct values| rows,
# never the raw table); per-type above/below counts are one combinable
# aggregate.  Each type's chi-square contribution is floor-scaled e6
# BEFORE the k-term total so the cross-engine sum is exact-integer.


def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    dom = ev.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    med = (
        dom.withColumn("cc", F.sum("c").over(wo))
        .withColumn("nn", F.sum("c").over(wall))
        .filter(F.col("cc") * 2 >= F.col("nn") + 1)
        .agg(F.min("v").alias("med"))
    )
    per = ev.crossJoin(F.broadcast(med)).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum((F.col("v") > F.col("med")).cast("long")).alias("ai"),
    )
    tot = per.agg(
        F.sum("ni").alias("n"), F.sum("ai").alias("a")
    )
    j = per.crossJoin(F.broadcast(tot))
    ei = F.col("ni").cast("double") * F.col("a") / F.col("n")
    dev = F.col("ai").cast("double") - ei
    contrib = dev * dev * (
        1.0 / ei + 1.0 / (F.col("ni").cast("double") - ei)
    )
    c6 = F.floor(contrib * 1_000_000 + F.lit(_OFF)).cast("long")
    out = j.select(
        "event_type",
        F.col("ni").cast("long").alias("n"),
        F.col("ai").cast("long").alias("above"),
        (F.col("ni") - F.col("ai")).cast("long").alias("not_above"),
        c6.alias("contrib_e6"),
    )
    wsum = Window.partitionBy()
    return out.withColumn(
        "chi2_e6", F.sum("contrib_e6").over(wsum).cast("long")
    ).orderBy("event_type")


SQL_MOOD = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1
), med AS (
  SELECT min(v) AS med
  FROM (
    SELECT v,
           sum(c) OVER (ORDER BY v) AS cc,
           sum(c) OVER () AS nn
    FROM dom
  )
  WHERE cc * 2 >= nn + 1
), per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS ni,
         CAST(sum(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT) AS ai
  FROM ev CROSS JOIN med GROUP BY 1
), tot AS (
  SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(sum(ai) AS BIGINT) AS a
  FROM per
), c AS (
  SELECT event_type, ni, ai,
         CAST(floor(
           (ai - CAST(ni AS DOUBLE) * a / n)
           * (ai - CAST(ni AS DOUBLE) * a / n)
           * (1.0 / (CAST(ni AS DOUBLE) * a / n)
              + 1.0 / (ni - CAST(ni AS DOUBLE) * a / n))
           * 1000000 + {_OFF}) AS BIGINT) AS contrib_e6
  FROM per CROSS JOIN tot
)
SELECT event_type, ni AS n, ai AS above, ni - ai AS not_above,
       contrib_e6,
       CAST(sum(contrib_e6) OVER () AS BIGINT) AS chi2_e6
FROM c
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# brunner_munzel — weekend-vs-weekday rank Behrens-Fisher test
# ---------------------------------------------------------------------------
# Brunner & Munzel (Biometrical Journal 2000): tests P(X < Y) + 0.5
# P(X = Y) = 0.5 without equal-variance or equal-shape assumptions
# (the statistic scipy ships as ``brunnermunzel``).  Samples are
# weekday vs weekend events (epoch-day mod 7 in {{2, 3}} = Sat/Sun —
# pure integer arithmetic identical in both engines).  All midranks
# live on the centivalue DOMAIN: pooled 2R(v) = 2C(<v) + t_v + 1 and
# within-sample 2R*_s(v) are exact BIGINTs off cumulative windows over
# ~|distinct values| rows, so no per-row rank shuffle exists at any
# scale.  The rank-variance cells t * d^2 (d = D / (2 n_s) with D an
# exact integer) are floor-scaled e2 to BIGINT per cell BEFORE the
# sum, making the aggregate order-free; the statistic, P-hat and the
# Welch-like df then use <= 4 double terms.


def q_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("s"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cell = ev.groupBy("v").agg(
        F.sum((F.col("s") == 0).cast("long")).alias("t0"),
        F.sum((F.col("s") == 1).cast("long")).alias("t1"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = (
        cell.withColumn("lo0", F.coalesce(F.sum("t0").over(wv), F.lit(0)))
        .withColumn("lo1", F.coalesce(F.sum("t1").over(wv), F.lit(0)))
    )
    r2 = 2 * (F.col("lo0") + F.col("lo1")) + F.col("t0") + F.col("t1") + 1
    cum = (
        cum.withColumn("r2", r2)
        .withColumn("rs0", 2 * F.col("lo0") + F.col("t0") + 1)
        .withColumn("rs1", 2 * F.col("lo1") + F.col("t1") + 1)
    )
    tot = cum.agg(
        F.sum("t0").alias("n0"),
        F.sum("t1").alias("n1"),
        F.sum(F.col("t0") * F.col("r2")).alias("tr0"),
        F.sum(F.col("t1") * F.col("r2")).alias("tr1"),
    )
    jj = cum.crossJoin(F.broadcast(tot))
    d0 = (
        F.col("n0") * (F.col("r2") - F.col("rs0"))
        - F.col("tr0")
        + F.col("n0") * (F.col("n0") + 1)
    ).cast("double") / (2.0 * F.col("n0"))
    d1 = (
        F.col("n1") * (F.col("r2") - F.col("rs1"))
        - F.col("tr1")
        + F.col("n1") * (F.col("n1") + 1)
    ).cast("double") / (2.0 * F.col("n1"))
    q = jj.agg(
        F.sum(
            F.floor(F.col("t0") * d0 * d0 * 100 + F.lit(_OFF)).cast("long")
        ).alias("q0"),
        F.sum(
            F.floor(F.col("t1") * d1 * d1 * 100 + F.lit(_OFF)).cast("long")
        ).alias("q1"),
    )
    out = q.crossJoin(F.broadcast(tot))
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    s0 = F.col("q0").cast("double") / 100.0 / (n0d - 1)
    s1 = F.col("q1").cast("double") / 100.0 / (n1d - 1)
    rb0 = F.col("tr0").cast("double") / (2.0 * n0d)
    rb1 = F.col("tr1").cast("double") / (2.0 * n1d)
    vv0 = n0d * s0
    vv1 = n1d * s1
    w = n0d * n1d * (rb1 - rb0) / (n0d + n1d) / F.sqrt(vv0 + vv1)
    phat = (rb1 - (n1d + 1) / 2.0) / n0d
    df = (vv0 + vv1) * (vv0 + vv1) / (
        vv0 * vv0 / (n0d - 1) + vv1 * vv1 / (n1d - 1)
    )
    return out.select(
        F.col("n0").cast("long").alias("n_weekday"),
        F.col("n1").cast("long").alias("n_weekend"),
        F.floor(phat * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "p_hat_e6"
        ),
        F.floor(w * 10_000 + F.lit(_OFF)).cast("long").alias("w_e4"),
        F.floor(df * 100 + F.lit(_OFF)).cast("long").alias("df_e2"),
    )


SQL_BRUNNER = f"""
WITH ev AS (
  SELECT CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS s,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cell AS (
  SELECT v,
         CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t0,
         CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
  FROM ev GROUP BY 1
), cum AS (
  SELECT t0, t1,
         COALESCE(CAST(sum(t0) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS lo0,
         COALESCE(CAST(sum(t1) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS lo1
  FROM cell
), r AS (
  SELECT t0, t1,
         2 * (lo0 + lo1) + t0 + t1 + 1 AS r2,
         2 * lo0 + t0 + 1 AS rs0,
         2 * lo1 + t1 + 1 AS rs1
  FROM cum
), tot AS (
  SELECT CAST(sum(t0) AS BIGINT) AS n0, CAST(sum(t1) AS BIGINT) AS n1,
         CAST(sum(t0 * r2) AS BIGINT) AS tr0,
         CAST(sum(t1 * r2) AS BIGINT) AS tr1
  FROM r
), q AS (
  SELECT
    CAST(sum(CAST(floor(t0
      * (CAST(n0 * (r2 - rs0) - tr0 + n0 * (n0 + 1) AS DOUBLE)
         / (2.0 * n0))
      * (CAST(n0 * (r2 - rs0) - tr0 + n0 * (n0 + 1) AS DOUBLE)
         / (2.0 * n0))
      * 100 + {_OFF}) AS BIGINT)) AS BIGINT) AS q0,
    CAST(sum(CAST(floor(t1
      * (CAST(n1 * (r2 - rs1) - tr1 + n1 * (n1 + 1) AS DOUBLE)
         / (2.0 * n1))
      * (CAST(n1 * (r2 - rs1) - tr1 + n1 * (n1 + 1) AS DOUBLE)
         / (2.0 * n1))
      * 100 + {_OFF}) AS BIGINT)) AS BIGINT) AS q1
  FROM r CROSS JOIN tot
)
SELECT n0 AS n_weekday, n1 AS n_weekend,
       CAST(floor(
         (CAST(tr1 AS DOUBLE) / (2.0 * n1) - (n1 + 1) / 2.0) / n0
         * 1000000 + {_OFF}) AS BIGINT) AS p_hat_e6,
       CAST(floor(
         CAST(n0 AS DOUBLE) * n1
         * (CAST(tr1 AS DOUBLE) / (2.0 * n1)
            - CAST(tr0 AS DOUBLE) / (2.0 * n0))
         / (n0 + n1)
         / sqrt(n0 * (CAST(q0 AS DOUBLE) / 100.0 / (n0 - 1))
                + n1 * (CAST(q1 AS DOUBLE) / 100.0 / (n1 - 1)))
         * 10000 + {_OFF}) AS BIGINT) AS w_e4,
       CAST(floor(
         (n0 * (CAST(q0 AS DOUBLE) / 100.0 / (n0 - 1))
          + n1 * (CAST(q1 AS DOUBLE) / 100.0 / (n1 - 1)))
         * (n0 * (CAST(q0 AS DOUBLE) / 100.0 / (n0 - 1))
            + n1 * (CAST(q1 AS DOUBLE) / 100.0 / (n1 - 1)))
         / ((n0 * (CAST(q0 AS DOUBLE) / 100.0 / (n0 - 1)))
            * (n0 * (CAST(q0 AS DOUBLE) / 100.0 / (n0 - 1))) / (n0 - 1)
            + (n1 * (CAST(q1 AS DOUBLE) / 100.0 / (n1 - 1)))
              * (n1 * (CAST(q1 AS DOUBLE) / 100.0 / (n1 - 1))) / (n1 - 1))
         * 100 + {_OFF}) AS BIGINT) AS df_e2
FROM q CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# bartlett_test — variance homogeneity of value across types, per user
# ---------------------------------------------------------------------------
# Bartlett (Proc. R. Soc. A 1937): T = [(N-k) ln s_p^2 - sum (n_i-1)
# ln s_i^2] / C with the small-sample correction C.  Per-type
# variances come off exact BIGINT centivalue power sums (one
# combinable aggregate, no window at all); the pooled SSE and the
# <= |types| log terms are the only doubles, matching the anova
# discipline.  Zero-variance or singleton groups are excluded (ln
# undefined), k re-counted after the filter.


def q_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("qv"),
    )
    g = g.filter(
        (F.col("ng") >= 2)
        & (F.col("ng") * F.col("qv") - F.col("sv") * F.col("sv") > 0)
    )
    s2 = (F.col("ng") * F.col("qv") - F.col("sv") * F.col("sv")).cast(
        "double"
    ) / (F.col("ng").cast("double") * (F.col("ng") - 1))
    agg = g.groupBy("user_id").agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum((F.col("ng") - 1) * s2).alias("sse"),
        F.sum((F.col("ng") - 1).cast("double") * F.log(s2)).alias("slog"),
        F.sum(1.0 / (F.col("ng") - 1).cast("double")).alias("sinv"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    sp2 = F.col("sse") / (nd - kd)
    t = (nd - kd) * F.log(sp2) - F.col("slog")
    c = 1.0 + (F.col("sinv") - 1.0 / (nd - kd)) / (3.0 * (kd - 1.0))
    return (
        agg.filter((F.col("k") >= 2) & (F.col("n") > F.col("k")))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k"),
            F.floor(t / c * 10_000 + F.lit(_OFF)).cast("long").alias(
                "bartlett_e4"
            ),
        )
        .orderBy("user_id")
    )


SQL_BARTLETT = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT user_id, event_type, count(*) AS ng,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(v * v) AS BIGINT) AS qv
  FROM ev GROUP BY 1, 2
), f AS (
  SELECT user_id, ng,
         CAST(ng * qv - sv * sv AS DOUBLE)
           / (CAST(ng AS DOUBLE) * (ng - 1)) AS s2
  FROM g
  WHERE ng >= 2 AND ng * qv - sv * sv > 0
), agg AS (
  SELECT user_id, CAST(sum(ng) AS BIGINT) AS n, count(*) AS k,
         sum((ng - 1) * s2) AS sse,
         sum((ng - 1) * ln(s2)) AS slog,
         sum(1.0 / (ng - 1)) AS sinv
  FROM f GROUP BY 1
)
SELECT user_id, n, CAST(k AS BIGINT) AS k,
       CAST(floor(
         ((n - CAST(k AS DOUBLE)) * ln(sse / (n - CAST(k AS DOUBLE)))
          - slog)
         / (1.0 + (sinv - 1.0 / (n - CAST(k AS DOUBLE)))
                  / (3.0 * (k - 1.0)))
         * 10000 + {_OFF}) AS BIGINT) AS bartlett_e4
FROM agg
WHERE k >= 2 AND n > k
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# gk_gamma — Goodman-Kruskal gamma between diel quarter and value
# ---------------------------------------------------------------------------
# Goodman & Kruskal (JASA 1954): gamma = (C - D) / (C + D) over
# concordant/discordant pairs of (diel quarter, value), per event
# type.  Pair counting rides the centivalue DOMAIN exactly like
# jonckheere_terpstra (pivot the four quarter counts wide, exclusive
# lower-cumulative window, one multiply-accumulate pass) — O(|domain|)
# and never O(N^2) row pairs.  C and D are exact BIGINTs; gamma hits
# doubles only in the final division.


def _quarter_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.floor(
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 3_600_000_000
                )
                % 24
                / 6
            )
        )
        .cast("long")
        .alias("g"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cell = ev.groupBy("event_type", "v").agg(
        *[
            F.sum((F.col("g") == i).cast("long")).alias(f"c{i}")
            for i in range(4)
        ]
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for i in range(4):
        cell = cell.withColumn(
            f"s{i}", F.coalesce(F.sum(f"c{i}").over(wv), F.lit(0))
        )
    return cell


_CELLS_SQL = f"""
ev AS (
  SELECT event_type,
         CAST(floor((CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) / 6)
              AS BIGINT) AS g,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cell AS (
  SELECT event_type, v,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT event_type, c0, c1, c2, c3,
         COALESCE(CAST(sum(c0) OVER (PARTITION BY event_type ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS s0,
         COALESCE(CAST(sum(c1) OVER (PARTITION BY event_type ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS s1,
         COALESCE(CAST(sum(c2) OVER (PARTITION BY event_type ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS s2,
         COALESCE(CAST(sum(c3) OVER (PARTITION BY event_type ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS s3
  FROM cell
)
"""


def q_gk_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    cell = _quarter_cells(spark, sf_dir)
    conc = (
        F.col("c1") * F.col("s0")
        + F.col("c2") * (F.col("s0") + F.col("s1"))
        + F.col("c3") * (F.col("s0") + F.col("s1") + F.col("s2"))
    )
    disc = (
        F.col("c0") * (F.col("s1") + F.col("s2") + F.col("s3"))
        + F.col("c1") * (F.col("s2") + F.col("s3"))
        + F.col("c2") * F.col("s3")
    )
    agg = cell.groupBy("event_type").agg(
        F.sum(conc).alias("conc"), F.sum(disc).alias("disc")
    )
    gamma = (F.col("conc") - F.col("disc")).cast("double") / (
        F.col("conc") + F.col("disc")
    )
    return (
        agg.filter(F.col("conc") + F.col("disc") > 0)
        .select(
            "event_type",
            F.col("conc").cast("long").alias("conc"),
            F.col("disc").cast("long").alias("disc"),
            F.floor(gamma * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "gamma_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_GK_GAMMA = f"""
WITH {_CELLS_SQL},
agg AS (
  SELECT event_type,
         CAST(sum(c1 * s0 + c2 * (s0 + s1) + c3 * (s0 + s1 + s2))
              AS BIGINT) AS conc,
         CAST(sum(c0 * (s1 + s2 + s3) + c1 * (s2 + s3) + c2 * s3)
              AS BIGINT) AS disc
  FROM cum GROUP BY 1
)
SELECT event_type, conc, disc,
       CAST(floor(CAST(conc - disc AS DOUBLE) / (conc + disc)
                  * 1000000 + {_OFF}) AS BIGINT) AS gamma_e6
FROM agg
WHERE conc + disc > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# somers_d — asymmetric ordinal association (both directions)
# ---------------------------------------------------------------------------
# Somers (ASR 1962): D_yx = (C - D) / (pairs differing on X) and
# D_xy = (C - D) / (pairs differing on Y), X = diel quarter, Y =
# centivalue, per event type.  Same domain-pivot machinery as
# gk_gamma; the two tie totals come from exact per-cell and per-group
# counting identities (T_y-only = sum_v sum_{i<j} c_i c_j; T_x-only =
# sum_i [n_i(n_i-1) - sum_v c_i(c_i-1)] / 2), so everything before
# the final two divisions is BIGINT.


def q_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    cell = _quarter_cells(spark, sf_dir)
    conc = (
        F.col("c1") * F.col("s0")
        + F.col("c2") * (F.col("s0") + F.col("s1"))
        + F.col("c3") * (F.col("s0") + F.col("s1") + F.col("s2"))
    )
    disc = (
        F.col("c0") * (F.col("s1") + F.col("s2") + F.col("s3"))
        + F.col("c1") * (F.col("s2") + F.col("s3"))
        + F.col("c2") * F.col("s3")
    )
    ty = (
        F.col("c0") * F.col("c1")
        + F.col("c0") * F.col("c2")
        + F.col("c0") * F.col("c3")
        + F.col("c1") * F.col("c2")
        + F.col("c1") * F.col("c3")
        + F.col("c2") * F.col("c3")
    )
    tieq = sum(
        F.col(f"c{i}") * (F.col(f"c{i}") - 1) for i in range(4)
    )
    agg = cell.groupBy("event_type").agg(
        F.sum(conc).alias("conc"),
        F.sum(disc).alias("disc"),
        F.sum(ty).alias("ty"),
        F.sum(tieq).alias("qt"),
        *[F.sum(f"c{i}").alias(f"n{i}") for i in range(4)],
    )
    tx = (
        sum(F.col(f"n{i}") * (F.col(f"n{i}") - 1) for i in range(4))
        - F.col("qt")
    ) / 2
    agg = agg.withColumn("tx", tx.cast("long"))
    dyx = (F.col("conc") - F.col("disc")).cast("double") / (
        F.col("conc") + F.col("disc") + F.col("ty")
    )
    dxy = (F.col("conc") - F.col("disc")).cast("double") / (
        F.col("conc") + F.col("disc") + F.col("tx")
    )
    return (
        agg.filter(
            (F.col("conc") + F.col("disc") + F.col("ty") > 0)
            & (F.col("conc") + F.col("disc") + F.col("tx") > 0)
        )
        .select(
            "event_type",
            F.col("conc").cast("long").alias("conc"),
            F.col("disc").cast("long").alias("disc"),
            F.col("ty").cast("long").alias("ty"),
            F.col("tx").cast("long").alias("tx"),
            F.floor(dyx * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "d_yx_e6"
            ),
            F.floor(dxy * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "d_xy_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_SOMERS = f"""
WITH {_CELLS_SQL},
agg AS (
  SELECT event_type,
         CAST(sum(c1 * s0 + c2 * (s0 + s1) + c3 * (s0 + s1 + s2))
              AS BIGINT) AS conc,
         CAST(sum(c0 * (s1 + s2 + s3) + c1 * (s2 + s3) + c2 * s3)
              AS BIGINT) AS disc,
         CAST(sum(c0 * c1 + c0 * c2 + c0 * c3 + c1 * c2 + c1 * c3
                  + c2 * c3) AS BIGINT) AS ty,
         CAST(sum(c0 * (c0 - 1) + c1 * (c1 - 1) + c2 * (c2 - 1)
                  + c3 * (c3 - 1)) AS BIGINT) AS qt,
         CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2, CAST(sum(c3) AS BIGINT) AS n3
  FROM cum GROUP BY 1
), t AS (
  SELECT event_type, conc, disc, ty,
         (n0 * (n0 - 1) + n1 * (n1 - 1) + n2 * (n2 - 1)
          + n3 * (n3 - 1) - qt) // 2 AS tx
  FROM agg
)
SELECT event_type, conc, disc, ty, tx,
       CAST(floor(CAST(conc - disc AS DOUBLE) / (conc + disc + ty)
                  * 1000000 + {_OFF}) AS BIGINT) AS d_yx_e6,
       CAST(floor(CAST(conc - disc AS DOUBLE) / (conc + disc + tx)
                  * 1000000 + {_OFF}) AS BIGINT) AS d_xy_e6
FROM t
WHERE conc + disc + ty > 0 AND conc + disc + tx > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# uncertainty_coeff — Theil's U between hour-of-day and event type
# ---------------------------------------------------------------------------
# Theil (Statistical Decomposition Analysis 1972): U(Y|X) =
# I(X;Y) / H(Y), the fraction of Y's entropy explained by X — the
# normalized cousin of mutual_info (which is per-user raw MI over 6 h
# blocks; this is the GLOBAL hour x type table, both directions).
# Every entropy is a sum of per-cell (p ln 1/p) terms floor-scaled e9
# to BIGINT BEFORE the aggregate, so the cross-engine sums are
# exact-integer (<= 24 x |types| cells); MI = H(X) + H(Y) - H(X,Y)
# then stays in scaled-integer space until the final ratios.


def q_uncertainty_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            % 24
        )
        .cast("long")
        .alias("h"),
    )
    cells = ev.groupBy("h", "event_type").agg(
        F.count(F.lit(1)).alias("o")
    )
    wall = Window.partitionBy()
    cells = cells.withColumn("nn", F.sum("o").over(wall))

    def ent9(cnt: F.Column) -> F.Column:
        # ln(nn/o), never ln(1/(o/nn)) — the two differ in the last ulp
        # and the oracle computes the direct ratio
        p = cnt.cast("double") / F.col("nn")
        q = F.col("nn").cast("double") / cnt
        return F.floor(p * F.log(q) * 1e9 + F.lit(_OFF)).cast("long")

    hxy = cells.select("nn", ent9(F.col("o")).alias("t")).groupBy("nn").agg(
        F.sum("t").alias("hxy9")
    )
    hx = (
        cells.groupBy("h")
        .agg(F.sum("o").alias("oh"), F.max("nn").alias("nn"))
        .select("nn", ent9(F.col("oh")).alias("t"))
        .groupBy("nn")
        .agg(F.sum("t").alias("hx9"))
    )
    hy = (
        cells.groupBy("event_type")
        .agg(F.sum("o").alias("oy"), F.max("nn").alias("nn"))
        .select("nn", ent9(F.col("oy")).alias("t"))
        .groupBy("nn")
        .agg(F.sum("t").alias("hy9"))
    )
    j = hxy.join(hx, "nn").join(hy, "nn")
    mi9 = F.col("hx9") + F.col("hy9") - F.col("hxy9")
    return j.select(
        F.col("nn").cast("long").alias("n"),
        F.col("hx9").cast("long").alias("hx_e9"),
        F.col("hy9").cast("long").alias("hy_e9"),
        F.col("hxy9").cast("long").alias("hxy_e9"),
        F.floor(
            mi9.cast("double") / F.col("hy9") * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("u_yx_e6"),
        F.floor(
            mi9.cast("double") / F.col("hx9") * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("u_xy_e6"),
    )


SQL_UNCERTAINTY = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS h
  FROM events
), cells AS (
  SELECT h, event_type, CAST(count(*) AS BIGINT) AS o,
         CAST(sum(count(*)) OVER () AS BIGINT) AS nn
  FROM ev GROUP BY 1, 2
), hxy AS (
  SELECT nn,
         CAST(sum(CAST(floor(CAST(o AS DOUBLE) / nn
                             * ln(CAST(nn AS DOUBLE) / o) * 1e9 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS hxy9
  FROM cells GROUP BY 1
), hx AS (
  SELECT nn,
         CAST(sum(CAST(floor(CAST(oh AS DOUBLE) / nn
                             * ln(CAST(nn AS DOUBLE) / oh) * 1e9 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS hx9
  FROM (SELECT h, CAST(sum(o) AS BIGINT) AS oh, max(nn) AS nn
        FROM cells GROUP BY 1)
  GROUP BY 1
), hy AS (
  SELECT nn,
         CAST(sum(CAST(floor(CAST(oy AS DOUBLE) / nn
                             * ln(CAST(nn AS DOUBLE) / oy) * 1e9 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS hy9
  FROM (SELECT event_type, CAST(sum(o) AS BIGINT) AS oy, max(nn) AS nn
        FROM cells GROUP BY 1)
  GROUP BY 1
)
SELECT hxy.nn AS n, hx9 AS hx_e9, hy9 AS hy_e9, hxy9 AS hxy_e9,
       CAST(floor(CAST(hx9 + hy9 - hxy9 AS DOUBLE) / hy9 * 1000000
                  + {_OFF}) AS BIGINT) AS u_yx_e6,
       CAST(floor(CAST(hx9 + hy9 - hxy9 AS DOUBLE) / hx9 * 1000000
                  + {_OFF}) AS BIGINT) AS u_xy_e6
FROM hxy
JOIN hx ON hx.nn = hxy.nn
JOIN hy ON hy.nn = hxy.nn
"""


# ---------------------------------------------------------------------------
# gk_lambda — Goodman-Kruskal lambda (proportional reduction in error)
# ---------------------------------------------------------------------------
# Goodman & Kruskal (JASA 1954): lambda(Y|X) = (sum_x max_y n_xy -
# max_y n_y) / (N - max_y n_y) — how much knowing the hour improves a
# modal guess of the event type, and vice versa.  Pure exact-integer
# counting end to end (joint table <= 24 x |types| cells); doubles
# appear only in the final two ratios.


def q_gk_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            % 24
        )
        .cast("long")
        .alias("h"),
    )
    cells = ev.groupBy("h", "event_type").agg(
        F.count(F.lit(1)).alias("o")
    )
    byx = cells.groupBy("h").agg(F.max("o").alias("mx"))
    byx2 = cells.groupBy("h").agg(F.sum("o").alias("nx"))
    tot = cells.agg(F.sum("o").alias("n"))
    sx = byx.agg(F.sum("mx").alias("sum_max_y"))
    sy = (
        cells.groupBy("event_type")
        .agg(F.sum("o").alias("ny"))
        .agg(F.max("ny").alias("max_ny"))
    )
    sxy = (
        cells.groupBy("event_type")
        .agg(F.max("o").alias("my"))
        .agg(F.sum("my").alias("sum_max_x"))
    )
    syx = byx2.agg(F.max("nx").alias("max_nx"))
    j = (
        tot.crossJoin(F.broadcast(sx))
        .crossJoin(F.broadcast(sy))
        .crossJoin(F.broadcast(sxy))
        .crossJoin(F.broadcast(syx))
    )
    lyx = (F.col("sum_max_y") - F.col("max_ny")).cast("double") / (
        F.col("n") - F.col("max_ny")
    )
    lxy = (F.col("sum_max_x") - F.col("max_nx")).cast("double") / (
        F.col("n") - F.col("max_nx")
    )
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("sum_max_y").cast("long").alias("sum_max_y"),
        F.col("max_ny").cast("long").alias("max_ny"),
        F.col("sum_max_x").cast("long").alias("sum_max_x"),
        F.col("max_nx").cast("long").alias("max_nx"),
        F.floor(lyx * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "lambda_yx_e6"
        ),
        F.floor(lxy * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "lambda_xy_e6"
        ),
    )


SQL_GK_LAMBDA = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS h
  FROM events
), cells AS (
  SELECT h, event_type, CAST(count(*) AS BIGINT) AS o
  FROM ev GROUP BY 1, 2
), sx AS (
  SELECT CAST(sum(mx) AS BIGINT) AS sum_max_y
  FROM (SELECT h, max(o) AS mx FROM cells GROUP BY 1)
), sy AS (
  SELECT CAST(max(ny) AS BIGINT) AS max_ny
  FROM (SELECT event_type, CAST(sum(o) AS BIGINT) AS ny
        FROM cells GROUP BY 1)
), sxy AS (
  SELECT CAST(sum(my) AS BIGINT) AS sum_max_x
  FROM (SELECT event_type, max(o) AS my FROM cells GROUP BY 1)
), syx AS (
  SELECT CAST(max(nx) AS BIGINT) AS max_nx
  FROM (SELECT h, CAST(sum(o) AS BIGINT) AS nx FROM cells GROUP BY 1)
), tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n FROM cells
)
SELECT n, sum_max_y, max_ny, sum_max_x, max_nx,
       CAST(floor(CAST(sum_max_y - max_ny AS DOUBLE) / (n - max_ny)
                  * 1000000 + {_OFF}) AS BIGINT) AS lambda_yx_e6,
       CAST(floor(CAST(sum_max_x - max_nx AS DOUBLE) / (n - max_nx)
                  * 1000000 + {_OFF}) AS BIGINT) AS lambda_xy_e6
FROM tot, sx, sy, sxy, syx
"""


# ---------------------------------------------------------------------------
# hjorth_params — Hjorth activity / mobility / complexity per user
# ---------------------------------------------------------------------------
# Hjorth (EEG Clin. Neurophysiol. 1970): activity = var(y), mobility =
# sqrt(var(y') / var(y)), complexity = mobility(y') / mobility(y),
# with y' the first difference of the hourly per-user series (house
# grid; diffs are successive-sample, gaps included by contract).  All
# three variances are POPULATION moments off exact BIGINT power sums
# of centivalues and their lag-1 / lag-2 integer differences — one
# per-user window pass, one combinable aggregate, doubles only in the
# final three expressions.


def _hourly10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            * 3600
        )
        .cast("long")
        .alias("t"),
    ).agg(
        F.floor(F.avg("value") * 100 + F.lit(_OFF)).cast("long").alias("v")
    )


_HOURLY10_SQL = f"""
hourly AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS t,
         CAST(floor(avg(value) * 100 + {_OFF}) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
)
"""


def q_hjorth_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly10(spark, sf_dir)
    wo = Window.partitionBy("user_id").orderBy("t")
    d = (
        h.withColumn("v1", F.lag("v", 1).over(wo))
        .withColumn("v2", F.lag("v", 2).over(wo))
        .withColumn("dy", F.col("v") - F.col("v1"))
        .withColumn("ddy", F.col("v") - 2 * F.col("v1") + F.col("v2"))
    )
    agg = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("v").alias("s0"),
        F.sum(F.col("v") * F.col("v")).alias("q0"),
        F.count("dy").alias("n1"),
        F.sum("dy").alias("s1"),
        F.sum(F.col("dy") * F.col("dy")).alias("q1"),
        F.count("ddy").alias("n2"),
        F.sum("ddy").alias("s2"),
        F.sum(F.col("ddy") * F.col("ddy")).alias("q2"),
    )

    def pvar(n, s, q):
        nd = F.col(n).cast("double")
        return (
            (F.col(n) * F.col(q) - F.col(s) * F.col(s)).cast("double")
            / (nd * nd)
        )

    v0, v1, v2 = (
        pvar("n0", "s0", "q0"),
        pvar("n1", "s1", "q1"),
        pvar("n2", "s2", "q2"),
    )
    mob = F.sqrt(v1 / v0)
    comp = F.sqrt(v2 / v1) / mob
    return (
        agg.filter(
            (F.col("n2") >= 2)
            & (F.col("n0") * F.col("q0") - F.col("s0") * F.col("s0") > 0)
            & (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1") > 0)
        )
        .select(
            "user_id",
            F.col("n0").cast("long").alias("n"),
            F.floor(v0 * 100 + F.lit(_OFF)).cast("long").alias(
                "activity_e2"
            ),
            F.floor(mob * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "mobility_e6"
            ),
            F.floor(comp * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "complexity_e6"
            ),
        )
        .orderBy("user_id")
    )


SQL_HJORTH = f"""
WITH {_HOURLY10_SQL},
d AS (
  SELECT user_id, v,
         v - lag(v, 1) OVER (PARTITION BY user_id ORDER BY t) AS dy,
         v - 2 * lag(v, 1) OVER (PARTITION BY user_id ORDER BY t)
           + lag(v, 2) OVER (PARTITION BY user_id ORDER BY t) AS ddy
  FROM hourly
), agg AS (
  SELECT user_id,
         count(*) AS n0,
         CAST(sum(v) AS BIGINT) AS s0,
         CAST(sum(v * v) AS BIGINT) AS q0,
         count(dy) AS n1,
         CAST(sum(dy) AS BIGINT) AS s1,
         CAST(sum(dy * dy) AS BIGINT) AS q1,
         count(ddy) AS n2,
         CAST(sum(ddy) AS BIGINT) AS s2,
         CAST(sum(ddy * ddy) AS BIGINT) AS q2
  FROM d GROUP BY 1
)
SELECT user_id, CAST(n0 AS BIGINT) AS n,
       CAST(floor(CAST(n0 * q0 - s0 * s0 AS DOUBLE)
                  / (CAST(n0 AS DOUBLE) * n0) * 100 + {_OFF})
            AS BIGINT) AS activity_e2,
       CAST(floor(sqrt((CAST(n1 * q1 - s1 * s1 AS DOUBLE)
                        / (CAST(n1 AS DOUBLE) * n1))
                       / (CAST(n0 * q0 - s0 * s0 AS DOUBLE)
                          / (CAST(n0 AS DOUBLE) * n0)))
                  * 1000000 + {_OFF}) AS BIGINT) AS mobility_e6,
       CAST(floor(sqrt((CAST(n2 * q2 - s2 * s2 AS DOUBLE)
                        / (CAST(n2 AS DOUBLE) * n2))
                       / (CAST(n1 * q1 - s1 * s1 AS DOUBLE)
                          / (CAST(n1 AS DOUBLE) * n1)))
                  / sqrt((CAST(n1 * q1 - s1 * s1 AS DOUBLE)
                          / (CAST(n1 AS DOUBLE) * n1))
                         / (CAST(n0 * q0 - s0 * s0 AS DOUBLE)
                            / (CAST(n0 AS DOUBLE) * n0)))
                  * 1000000 + {_OFF}) AS BIGINT) AS complexity_e6
FROM agg
WHERE n2 >= 2 AND n0 * q0 - s0 * s0 > 0 AND n1 * q1 - s1 * s1 > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# petrosian_fd — Petrosian fractal dimension of the hourly series
# ---------------------------------------------------------------------------
# Petrosian (IEEE CBMS 1995): PFD = log10(n) / (log10(n) +
# log10(n / (n + 0.4 N_delta))) with N_delta the count of strict sign
# changes in the first difference (zero differences break a change by
# contract — the product test d_t * d_{t-1} < 0).  Pure exact-integer
# counting off two lag windows; logs only in the final expression.


def q_petrosian_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly10(spark, sf_dir)
    wo = Window.partitionBy("user_id").orderBy("t")
    d = h.withColumn("dy", F.col("v") - F.lag("v", 1).over(wo))
    d = d.withColumn("dp", F.lag("dy", 1).over(wo))
    agg = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("dy") * F.col("dp")) < 0).cast("long")
        ).alias("nd"),
    )
    nd_ = F.col("n").cast("double")
    pfd = F.log10(nd_) / (
        F.log10(nd_)
        + F.log10(nd_ / (nd_ + 0.4 * F.col("nd").cast("double")))
    )
    return (
        agg.filter(F.col("n") >= 4)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.col("nd").cast("long").alias("n_sign_changes"),
            F.floor(pfd * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "pfd_e6"
            ),
        )
        .orderBy("user_id")
    )


SQL_PETROSIAN = f"""
WITH {_HOURLY10_SQL},
d0 AS (
  SELECT user_id, t,
         v - lag(v, 1) OVER (PARTITION BY user_id ORDER BY t) AS dy
  FROM hourly
), d AS (
  SELECT user_id, dy,
         lag(dy, 1) OVER (PARTITION BY user_id ORDER BY t) AS dp
  FROM d0
), agg AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CASE WHEN dy * dp < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS nd
  FROM d GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n, nd AS n_sign_changes,
       CAST(floor(log10(CAST(n AS DOUBLE))
                  / (log10(CAST(n AS DOUBLE))
                     + log10(CAST(n AS DOUBLE)
                             / (n + 0.4 * CAST(nd AS DOUBLE))))
                  * 1000000 + {_OFF}) AS BIGINT) AS pfd_e6
FROM agg
WHERE n >= 4
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# katz_fd — Katz fractal dimension of the hourly series
# ---------------------------------------------------------------------------
# Katz (Comput. Biol. Med. 1988), in the waveform form standard in the
# EEG feature literature (e.g. the PyEEG implementation): with L =
# sum |dy| (total curve length), d = max |y_i - y_0| (planar extent)
# and m = number of steps, KFD = log10(m) / (log10(m) + log10(d / L)).
# L and d are exact BIGINTs (first_value / lag windows on the integer
# centivalue series); logs only at the end.


def q_katz_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly10(spark, sf_dir)
    wo = Window.partitionBy("user_id").orderBy("t")
    d = h.withColumn(
        "dy", F.abs(F.col("v") - F.lag("v", 1).over(wo))
    ).withColumn(
        "dev",
        F.abs(
            F.col("v")
            - F.first("v").over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            )
        ),
    )
    agg = d.groupBy("user_id").agg(
        F.count("dy").alias("m"),
        F.sum("dy").alias("ll"),
        F.max("dev").alias("dd"),
    )
    md = F.col("m").cast("double")
    kfd = F.log10(md) / (
        F.log10(md)
        + F.log10(F.col("dd").cast("double") / F.col("ll").cast("double"))
    )
    return (
        agg.filter((F.col("ll") > 0) & (F.col("dd") > 0) & (F.col("m") >= 2))
        .select(
            "user_id",
            F.col("m").cast("long").alias("m"),
            F.col("ll").cast("long").alias("curve_len"),
            F.col("dd").cast("long").alias("extent"),
            F.floor(kfd * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "kfd_e6"
            ),
        )
        .orderBy("user_id")
    )


SQL_KATZ = f"""
WITH {_HOURLY10_SQL},
d AS (
  SELECT user_id,
         abs(v - lag(v, 1) OVER (PARTITION BY user_id ORDER BY t)) AS dy,
         abs(v - first_value(v)
               OVER (PARTITION BY user_id ORDER BY t)) AS dev
  FROM hourly
), agg AS (
  SELECT user_id, count(dy) AS m,
         CAST(sum(dy) AS BIGINT) AS ll,
         CAST(max(dev) AS BIGINT) AS dd
  FROM d GROUP BY 1
)
SELECT user_id, CAST(m AS BIGINT) AS m, ll AS curve_len, dd AS extent,
       CAST(floor(log10(CAST(m AS DOUBLE))
                  / (log10(CAST(m AS DOUBLE))
                     + log10(CAST(dd AS DOUBLE) / ll))
                  * 1000000 + {_OFF}) AS BIGINT) AS kfd_e6
FROM agg
WHERE ll > 0 AND dd > 0 AND m >= 2
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# higuchi_fd — Higuchi fractal dimension (kmax = 4) of the hourly series
# ---------------------------------------------------------------------------
# Higuchi (Physica D 1988): for lag k build the k decimated
# sub-series, L_m(k) = [sum |y(m+ik) - y(m+(i-1)k)|] (n-1) /
# (cnt_m k^2), L(k) = mean_m L_m(k); FD = -slope of ln L(k) on ln k,
# k = 1..4.  Decimation is index arithmetic on ONE per-user window
# pass (row_number + lag(v, k)); all |diff| sums and counts stay
# exact BIGINT; each user contributes <= 4+4+4+4 = bounded rows after
# the first aggregate, and the final OLS over the 4 (ln k, ln L)
# points follows the anova small-sum discipline.  Users are kept only
# when every k has all its k sub-series populated (n >= 13 guarantee
# enforced by count).


def q_higuchi_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly10(spark, sf_dir)
    wo = Window.partitionBy("user_id").orderBy("t")
    d = h.withColumn("idx", F.row_number().over(wo))
    for k in range(1, 5):
        d = d.withColumn(f"d{k}", F.abs(F.col("v") - F.lag("v", k).over(wo)))
    # unpivot: one row per (user, k, m) diff
    parts = []
    for k in range(1, 5):
        parts.append(
            d.select(
                "user_id",
                F.lit(k).alias("k"),
                ((F.col("idx") - 1) % k).alias("m"),
                F.col(f"d{k}").alias("ad"),
            ).filter(F.col("ad").isNotNull())
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    n_per = h.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    series = u.groupBy("user_id", "k", "m").agg(
        F.sum("ad").alias("s"), F.count(F.lit(1)).alias("cnt")
    )
    series = series.join(n_per, "user_id")
    lm = series.select(
        "user_id",
        "k",
        (
            F.col("s").cast("double")
            * (F.col("n") - 1)
            / (F.col("cnt").cast("double") * F.col("k") * F.col("k"))
        ).alias("lmk"),
    )
    lk = lm.groupBy("user_id", "k").agg(
        (F.sum("lmk") / F.col("k")).alias("lk"),
        F.count(F.lit(1)).alias("nm"),
    )
    pts = lk.filter((F.col("lk") > 0) & (F.col("nm") == F.col("k"))).select(
        "user_id",
        F.log(F.col("k").cast("double")).alias("x"),
        F.log("lk").alias("y"),
    )
    reg = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("np")
    ) / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("np"))
    return (
        reg.filter(F.col("np") == 4)
        .select(
            "user_id",
            F.floor(-slope * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "hfd_e6"
            ),
        )
        .orderBy("user_id")
    )


SQL_HIGUCHI = f"""
WITH {_HOURLY10_SQL},
idx AS (
  SELECT user_id, v,
         row_number() OVER (PARTITION BY user_id ORDER BY t) AS idx,
         lag(v, 1) OVER (PARTITION BY user_id ORDER BY t) AS l1,
         lag(v, 2) OVER (PARTITION BY user_id ORDER BY t) AS l2,
         lag(v, 3) OVER (PARTITION BY user_id ORDER BY t) AS l3,
         lag(v, 4) OVER (PARTITION BY user_id ORDER BY t) AS l4
  FROM hourly
), u AS (
  SELECT user_id, 1 AS k, (idx - 1) % 1 AS m, abs(v - l1) AS ad
  FROM idx WHERE l1 IS NOT NULL
  UNION ALL
  SELECT user_id, 2 AS k, (idx - 1) % 2 AS m, abs(v - l2) AS ad
  FROM idx WHERE l2 IS NOT NULL
  UNION ALL
  SELECT user_id, 3 AS k, (idx - 1) % 3 AS m, abs(v - l3) AS ad
  FROM idx WHERE l3 IS NOT NULL
  UNION ALL
  SELECT user_id, 4 AS k, (idx - 1) % 4 AS m, abs(v - l4) AS ad
  FROM idx WHERE l4 IS NOT NULL
), n_per AS (
  SELECT user_id, count(*) AS n FROM hourly GROUP BY 1
), series AS (
  SELECT u.user_id, k, m,
         CAST(sum(ad) AS BIGINT) AS s, count(*) AS cnt, max(n) AS n
  FROM u JOIN n_per ON n_per.user_id = u.user_id
  GROUP BY 1, 2, 3
), lk AS (
  SELECT user_id, k,
         sum(CAST(s AS DOUBLE) * (n - 1)
             / (CAST(cnt AS DOUBLE) * k * k)) / k AS lk,
         count(*) AS nm
  FROM series GROUP BY 1, 2
), pts AS (
  SELECT user_id, ln(CAST(k AS DOUBLE)) AS x, ln(lk) AS y
  FROM lk WHERE lk > 0 AND nm = k
), reg AS (
  SELECT user_id, count(*) AS np,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts GROUP BY 1
)
SELECT user_id,
       CAST(floor(-((sxy - sx * sy / np) / (sxx - sx * sx / np))
                  * 1000000 + {_OFF}) AS BIGINT) AS hfd_e6
FROM reg
WHERE np = 4
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# lid_mle — Levina-Bickel local intrinsic dimension (k = 5), per label
# ---------------------------------------------------------------------------
# Levina & Bickel (NIPS 2004): the MLE of local intrinsic dimension at
# x from its k nearest neighbours is (k-1) / sum_{i<k} ln(d_k / d_i).
# NN search is label-BLOCKED (the twonn/hubness posture, never
# all-pairs); squared distances ride the Arrow einsum kernel, 6-dp
# rounded BEFORE ranking with the (d2, cand_id) tie-break.  Each
# ln-ratio term is e9-floored to BIGINT per pair, each point's LID is
# e6-floored, so every aggregate sum is exact-integer and order-free.


_LID_K = 5


def q_lid_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round-4 bench-tail repair: shared _l2_topk_rows kernel (raw
    # einsum distances, slack preselect), rounded ordering unchanged.
    from diive_spark.queries_embeddings import _l2_topk_rows

    pairs = _l2_topk_rows(spark, sf_dir, _LID_K).select(
        "label",
        "vec_id",
        F.round(F.col("d2raw"), 6).alias("d2"),
        "cand_id",
    )
    wo = Window.partitionBy("label", "vec_id").orderBy(
        F.col("d2").asc(), F.col("cand_id").asc()
    )
    nn = pairs.withColumn("rk", F.row_number().over(wo)).filter(
        F.col("rk") <= _LID_K
    )
    dk = (
        nn.filter(F.col("rk") == _LID_K)
        .select("label", "vec_id", F.col("d2").alias("dk"))
    )
    lo = nn.filter(F.col("rk") < _LID_K).join(dk, ["label", "vec_id"])
    t = lo.filter(F.col("d2") > 0).withColumn(
        "t9",
        F.floor(0.5 * F.log(F.col("dk") / F.col("d2")) * 1e9 + F.lit(_OFF))
        .cast("long"),
    )
    per = t.groupBy("label", "vec_id").agg(
        F.count(F.lit(1)).alias("m"), F.sum("t9").alias("s9")
    ).filter((F.col("m") == _LID_K - 1) & (F.col("s9") > 0))
    per = per.withColumn(
        "lid6",
        F.floor(
            (_LID_K - 1) / (F.col("s9").cast("double") / 1e9) * 1e6
            + F.lit(_OFF)
        ).cast("long"),
    )
    agg = per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("lid6").alias("sl6")
    )
    return (
        agg.filter(F.col("n") >= 10)
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("n").cast("long").alias("n_points"),
            F.floor(
                F.col("sl6").cast("double") / 1e6 / F.col("n") * 10_000
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("mean_lid_e4"),
        )
        .orderBy("label")
    )


SQL_LID = f"""
WITH pairs AS (
  SELECT a.label, a.vec_id, b.vec_id AS cand_id,
         round(list_sum(list_transform(
           generate_series(1, len(a.embedding)),
           i -> (CAST(a.embedding[i] AS DOUBLE)
                 - CAST(b.embedding[i] AS DOUBLE))
                * (CAST(a.embedding[i] AS DOUBLE)
                   - CAST(b.embedding[i] AS DOUBLE)))), 6) AS d2
  FROM embeddings a JOIN embeddings b
    ON b.label = a.label AND b.vec_id <> a.vec_id
), nn AS (
  SELECT label, vec_id, d2,
         row_number() OVER (PARTITION BY label, vec_id
                            ORDER BY d2 ASC, cand_id ASC) AS rk
  FROM pairs
), dk AS (
  SELECT label, vec_id, d2 AS dk FROM nn WHERE rk = {_LID_K}
), t AS (
  SELECT nn.label, nn.vec_id,
         CAST(floor(0.5 * ln(dk / d2) * 1e9 + {_OFF}) AS BIGINT) AS t9
  FROM nn JOIN dk ON dk.label = nn.label AND dk.vec_id = nn.vec_id
  WHERE rk < {_LID_K} AND d2 > 0
), per AS (
  SELECT label, vec_id, count(*) AS m, CAST(sum(t9) AS BIGINT) AS s9
  FROM t GROUP BY 1, 2
  HAVING count(*) = {_LID_K - 1} AND CAST(sum(t9) AS BIGINT) > 0
), lid AS (
  SELECT label,
         CAST(floor(({_LID_K} - 1) / (CAST(s9 AS DOUBLE) / 1e9) * 1e6
                    + {_OFF}) AS BIGINT) AS lid6
  FROM per
), agg AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lid6) AS BIGINT) AS sl6
  FROM lid GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label, n AS n_points,
       CAST(floor(CAST(sl6 AS DOUBLE) / 1e6 / n * 10000 + {_OFF})
            AS BIGINT) AS mean_lid_e4
FROM agg
WHERE n >= 10
ORDER BY label
"""


# ---------------------------------------------------------------------------
# dunn_index — centroid-linkage Dunn index over the label clustering
# ---------------------------------------------------------------------------
# Dunn (J. Cybernetics 1974), in the centroid-linkage member of the
# generalized Dunn family (Bezdek & Pal 1998): separation = min
# centroid-pair distance, cohesion = max within-label diameter.
# Within-label diameters are label-BLOCKED pair maxima (the hubness
# posture — never cross-label all-pairs, which is the O(N^2) trap the
# true single-linkage Dunn would require at 100 TB); the k x k
# centroid grid is a broadcast cross join.  Distances are 6-dp rounded
# squared L2; sqrt and the final ratio are the only late doubles.


def q_dunn_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats8 import _centroids
    from diive_spark.text.similarity import l2sq_pair_udf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    b = emb.select(
        F.col("label").alias("label_r"),
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("emb_r"),
    )
    diam = (
        emb.join(
            b,
            (F.col("label") == F.col("label_r"))
            & (F.col("vec_id") < F.col("cand_id")),
        )
        .select(
            "label",
            F.round(
                l2sq_pair_udf(F.col("embedding"), F.col("emb_r")), 6
            ).alias("d2"),
        )
        .groupBy("label")
        .agg(F.max("d2").alias("maxd2"))
        .agg(F.max("maxd2").alias("max_diam2"), F.count(F.lit(1)).alias("k"))
    )
    cent = _centroids(emb)
    c2 = cent.select(
        F.col("label").alias("label_r"), F.col("carr").alias("carr_r")
    )
    sep = (
        cent.crossJoin(F.broadcast(c2))
        .filter(F.col("label") < F.col("label_r"))
        .select(
            F.round(l2sq_pair_udf(F.col("carr"), F.col("carr_r")), 6).alias(
                "c2d"
            )
        )
        .agg(F.min("c2d").alias("min_sep2"))
    )
    j = diam.crossJoin(F.broadcast(sep))
    dunn = F.sqrt(F.col("min_sep2")) / F.sqrt(F.col("max_diam2"))
    return j.select(
        F.col("k").cast("long").alias("k_labels"),
        F.floor(F.sqrt(F.col("min_sep2")) * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("min_sep_e6"),
        F.floor(F.sqrt(F.col("max_diam2")) * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("max_diam_e6"),
        F.floor(dunn * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "dunn_e6"
        ),
    )


SQL_DUNN = f"""
WITH {{cent}},
diam AS (
  SELECT CAST(count(*) AS BIGINT) AS k, max(maxd2) AS max_diam2
  FROM (
    SELECT a.label, max(round(list_sum(list_transform(
             generate_series(1, len(a.embedding)),
             i -> (CAST(a.embedding[i] AS DOUBLE)
                   - CAST(b.embedding[i] AS DOUBLE))
                  * (CAST(a.embedding[i] AS DOUBLE)
                     - CAST(b.embedding[i] AS DOUBLE)))), 6)) AS maxd2
    FROM embeddings a JOIN embeddings b
      ON b.label = a.label AND a.vec_id < b.vec_id
    GROUP BY 1
  )
), sep AS (
  SELECT min(round(list_sum(list_transform(
           generate_series(1, len(a.carr)),
           i -> (a.carr[i] - b.carr[i]) * (a.carr[i] - b.carr[i]))), 6))
         AS min_sep2
  FROM cent a JOIN cent b ON a.label < b.label
)
SELECT k AS k_labels,
       CAST(floor(sqrt(min_sep2) * 1e6 + {_OFF}) AS BIGINT)
         AS min_sep_e6,
       CAST(floor(sqrt(max_diam2) * 1e6 + {_OFF}) AS BIGINT)
         AS max_diam_e6,
       CAST(floor(sqrt(min_sep2) / sqrt(max_diam2) * 1000000 + {_OFF})
            AS BIGINT) AS dunn_e6
FROM diam CROSS JOIN sep
"""


# ---------------------------------------------------------------------------
# mahalanobis_census — diagonal-Mahalanobis outlier census per label
# ---------------------------------------------------------------------------
# Classic multivariate QC with a scale-aware metric: D^2(x) = sum_d
# (x_d - mu_d)^2 / sigma_d^2 against the point's own label, with the
# DIAGONAL covariance (the full-matrix inverse is not expressible as a
# combinable aggregate; the diagonal form is the standard streaming
# variant).  Per-dimension terms are exact rationals ((n x6 - s6)^2 /
# (n (n q6 - s6^2))) e9-floored to BIGINT per (point, dim), so the
# 64-term per-point sum and all label sums are exact-integer.  The
# outlier threshold is the chi-square normal approximation dim + 3
# sqrt(2 dim) on the used-dimension count; zero-variance dims are
# skipped by contract.  No UDF anywhere — pure codegen explode + two
# hash aggregates + one broadcast join.


def q_mahalanobis_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    comp = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "vec_id",
        "label",
        "d",
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("x6"),
    )
    mom = comp.groupBy("label", "d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").alias("s6"),
        F.sum(F.col("x6") * F.col("x6")).alias("q6"),
    )
    mom = mom.withColumn(
        "den", F.col("n") * (F.col("n") * F.col("q6") - F.col("s6") * F.col("s6"))
    ).filter(F.col("den") > 0)
    t = comp.join(F.broadcast(mom), ["label", "d"]).select(
        "vec_id",
        "label",
        F.floor(
            (F.col("n") * F.col("x6") - F.col("s6")).cast("double")
            * (F.col("n") * F.col("x6") - F.col("s6"))
            / F.col("den")
            * F.col("n")
            * 1e9
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("t9"),
    )
    per = t.groupBy("vec_id", "label").agg(
        F.count(F.lit(1)).alias("dims"), F.sum("t9").alias("d29")
    )
    thr = F.col("dims").cast("double") + 3.0 * F.sqrt(
        2.0 * F.col("dims").cast("double")
    )
    agg = per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.max("dims").alias("dims"),
        F.sum("d29").alias("sd29"),
        F.sum(
            ((F.col("d29").cast("double") / 1e9) > thr).cast("long")
        ).alias("n_outliers"),
    )
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("n_pts").cast("long").alias("n_pts"),
        F.col("dims").cast("long").alias("dims"),
        F.floor(
            F.col("sd29").cast("double") / 1e9 / F.col("n_pts") * 10_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_d2_e4"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
    ).orderBy("label")


SQL_MAHALANOBIS = f"""
WITH comp0 AS (
  SELECT vec_id, label,
         unnest(list_transform(generate_series(1, len(embedding)),
           i -> struct_pack(d := i,
                x6 := CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6
                                 + {_OFF}) AS BIGINT)))) AS u
  FROM embeddings
), comp AS (
  SELECT vec_id, label, u.d AS d, u.x6 AS x6 FROM comp0
), mom AS (
  SELECT label, d, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x6) AS BIGINT) AS s6,
         CAST(sum(x6 * x6) AS BIGINT) AS q6
  FROM comp GROUP BY 1, 2
), momf AS (
  SELECT label, d, n, s6, n * (n * q6 - s6 * s6) AS den
  FROM mom WHERE n * (n * q6 - s6 * s6) > 0
), t AS (
  SELECT comp.vec_id, comp.label,
         CAST(floor(CAST(momf.n * comp.x6 - momf.s6 AS DOUBLE)
                    * (momf.n * comp.x6 - momf.s6)
                    / momf.den * momf.n * 1e9 + {_OFF}) AS BIGINT) AS t9
  FROM comp JOIN momf ON momf.label = comp.label AND momf.d = comp.d
), per AS (
  SELECT vec_id, label, count(*) AS dims,
         CAST(sum(t9) AS BIGINT) AS d29
  FROM t GROUP BY 1, 2
), agg AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_pts,
         CAST(max(dims) AS BIGINT) AS dims,
         CAST(sum(d29) AS BIGINT) AS sd29,
         CAST(sum(CASE WHEN CAST(d29 AS DOUBLE) / 1e9
                            > dims + 3.0 * sqrt(2.0 * dims)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM per GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label, n_pts, dims,
       CAST(floor(CAST(sd29 AS DOUBLE) / 1e9 / n_pts * 10000 + {_OFF})
            AS BIGINT) AS mean_d2_e4,
       n_outliers
FROM agg
ORDER BY label
"""


# ---------------------------------------------------------------------------
# xie_beni — Xie-Beni clustering validity index over the labels
# ---------------------------------------------------------------------------
# Xie & Beni (IEEE TPAMI 1991): XB = [sum_x ||x - c(x)||^2] /
# (n min_{i<j} ||c_i - c_j||^2) — compactness over separation.  The
# numerator's per-point squared distances are e6-floored to BIGINT
# before the sum (order-free exactness); the k x k centroid grid is a
# broadcast cross join exactly as in davies_bouldin.


def q_xie_beni(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats8 import _centroids
    from diive_spark.text.similarity import l2sq_pair_udf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    cent = _centroids(emb)
    own = emb.join(F.broadcast(cent), "label").select(
        F.floor(
            F.round(l2sq_pair_udf(F.col("embedding"), F.col("carr")), 6)
            * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("o6"),
    )
    num = own.agg(
        F.count(F.lit(1)).alias("n"), F.sum("o6").alias("so6")
    )
    c2 = cent.select(
        F.col("label").alias("label_r"), F.col("carr").alias("carr_r")
    )
    sep = (
        cent.crossJoin(F.broadcast(c2))
        .filter(F.col("label") < F.col("label_r"))
        .select(
            F.round(l2sq_pair_udf(F.col("carr"), F.col("carr_r")), 6).alias(
                "c2d"
            )
        )
        .agg(F.min("c2d").alias("sep2"), F.count(F.lit(1)).alias("npairs"))
    )
    kcnt = cent.agg(F.count(F.lit(1)).alias("k"))
    j = num.crossJoin(F.broadcast(sep)).crossJoin(F.broadcast(kcnt))
    xb = (
        F.col("so6").cast("double")
        / 1e6
        / (F.col("n").cast("double") * F.col("sep2"))
    )
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k_labels"),
        F.floor(F.col("sep2") * 1e6 + F.lit(_OFF)).cast("long").alias(
            "min_sep2_e6"
        ),
        F.floor(xb * 1_000_000 + F.lit(_OFF)).cast("long").alias("xb_e6"),
    )


SQL_XIE_BENI = f"""
WITH {{cent}},
own AS (
  SELECT CAST(floor(round(list_sum(list_transform(
           generate_series(1, len(e.embedding)),
           i -> (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])
                * (CAST(e.embedding[i] AS DOUBLE) - c.carr[i]))), 6)
           * 1e6 + {_OFF}) AS BIGINT) AS o6
  FROM embeddings e JOIN cent c ON c.label = e.label
), num AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(o6) AS BIGINT) AS so6
  FROM own
), sep AS (
  SELECT min(round(list_sum(list_transform(
           generate_series(1, len(a.carr)),
           i -> (a.carr[i] - b.carr[i]) * (a.carr[i] - b.carr[i]))), 6))
         AS sep2
  FROM cent a JOIN cent b ON a.label < b.label
), kcnt AS (
  SELECT CAST(count(*) AS BIGINT) AS k FROM cent
)
SELECT n, k AS k_labels,
       CAST(floor(sep2 * 1e6 + {_OFF}) AS BIGINT) AS min_sep2_e6,
       CAST(floor(CAST(so6 AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE) * sep2)
                  * 1000000 + {_OFF}) AS BIGINT) AS xb_e6
FROM num CROSS JOIN sep CROSS JOIN kcnt
"""


# ---------------------------------------------------------------------------
# hellinger_drift — Hellinger distance of diel profiles, early vs late
# ---------------------------------------------------------------------------
# H^2 = 1 - sum_h sqrt(p_h q_h) between each event type's hour-of-day
# profile over the FIRST half of its day span and the second half
# (day-midpoint split on exact integer epoch days).  The 24
# sqrt(p q) terms are e9-floored to BIGINT before the sum (order-free
# exactness), so BC and H = sqrt(1 - BC) leave integer space only in
# the final two expressions.


def q_hellinger_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            % 24
        )
        .cast("long")
        .alias("h"),
    )
    spans = ev.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    lab = ev.join(F.broadcast(spans), "event_type").withColumn(
        "late",
        (2 * (F.col("day") - F.col("d0")) > (F.col("d1") - F.col("d0")))
        .cast("long"),
    )
    cells = lab.groupBy("event_type", "h").agg(
        F.sum((F.col("late") == 0).cast("long")).alias("c"),
        F.sum((F.col("late") == 1).cast("long")).alias("d"),
    )
    wt = Window.partitionBy("event_type")
    cells = cells.withColumn("cc", F.sum("c").over(wt)).withColumn(
        "dd", F.sum("d").over(wt)
    )
    t9 = F.floor(
        F.sqrt(
            F.col("c").cast("double")
            / F.col("cc")
            * (F.col("d").cast("double") / F.col("dd"))
        )
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = cells.groupBy("event_type").agg(
        F.max("cc").alias("n_early"),
        F.max("dd").alias("n_late"),
        F.sum(t9).alias("bc9"),
    )
    bc = F.col("bc9").cast("double") / 1e9
    return (
        agg.filter((F.col("n_early") > 0) & (F.col("n_late") > 0))
        .select(
            "event_type",
            F.col("n_early").cast("long").alias("n_early"),
            F.col("n_late").cast("long").alias("n_late"),
            F.floor(bc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "bc_e6"
            ),
            F.floor(
                F.sqrt(F.greatest(1.0 - bc, F.lit(0.0))) * 1_000_000
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("hellinger_e6"),
        )
        .orderBy("event_type")
    )


SQL_HELLINGER = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS h
  FROM events
), spans AS (
  SELECT event_type, min(day) AS d0, max(day) AS d1
  FROM ev GROUP BY 1
), lab AS (
  SELECT ev.event_type, h,
         CASE WHEN 2 * (day - d0) > (d1 - d0) THEN 1 ELSE 0 END AS late
  FROM ev JOIN spans ON spans.event_type = ev.event_type
), cells AS (
  SELECT event_type, h,
         CAST(sum(CASE WHEN late = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN late = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM lab GROUP BY 1, 2
), tot AS (
  SELECT event_type, h, c, d,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS cc,
         CAST(sum(d) OVER (PARTITION BY event_type) AS BIGINT) AS dd
  FROM cells
), agg AS (
  SELECT event_type, max(cc) AS n_early, max(dd) AS n_late,
         CAST(sum(CAST(floor(sqrt(CAST(c AS DOUBLE) / cc
                                  * (CAST(d AS DOUBLE) / dd))
                             * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT) AS bc9
  FROM tot GROUP BY 1
)
SELECT event_type, n_early, n_late,
       CAST(floor(CAST(bc9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS bc_e6,
       CAST(floor(sqrt(greatest(1.0 - CAST(bc9 AS DOUBLE) / 1e9, 0.0))
                  * 1000000 + {_OFF}) AS BIGINT) AS hellinger_e6
FROM agg
WHERE n_early > 0 AND n_late > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# bhattacharyya_pairs — Bhattacharyya distance between type pairs
# ---------------------------------------------------------------------------
# Bhattacharyya (Bull. Calcutta Math. Soc. 1943): BC(p, q) = sum_h
# sqrt(p_h q_h) over the two types' 24-bin diel profiles, D_B =
# -ln BC.  All |types|(|types|-1)/2 pairs via a broadcast self-join of
# the tiny per-type profile table; sqrt terms e9-floored before the
# 24-term sum, exactly as hellinger_drift.


def q_bhattacharyya_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            % 24
        )
        .cast("long")
        .alias("h"),
    )
    prof = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("c")
    )
    wt = Window.partitionBy("event_type")
    prof = prof.withColumn("n", F.sum("c").over(wt))
    b = prof.select(
        F.col("event_type").alias("type_b"),
        F.col("h").alias("h_b"),
        F.col("c").alias("c_b"),
        F.col("n").alias("n_b"),
    )
    pairs = prof.join(
        F.broadcast(b),
        (F.col("h") == F.col("h_b"))
        & (F.col("event_type") < F.col("type_b")),
    )
    t9 = F.floor(
        F.sqrt(
            F.col("c").cast("double")
            / F.col("n")
            * (F.col("c_b").cast("double") / F.col("n_b"))
        )
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = pairs.groupBy("event_type", "type_b").agg(
        F.sum(t9).alias("bc9")
    )
    bc = F.col("bc9").cast("double") / 1e9
    return (
        agg.filter(F.col("bc9") > 0)
        .select(
            F.col("event_type").alias("type_a"),
            "type_b",
            F.floor(bc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "bc_e6"
            ),
            F.floor(-F.log(bc) * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("db_e6"),
        )
        .orderBy("type_a", "type_b")
    )


SQL_BHATTACHARYYA = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS h
  FROM events
), prof AS (
  SELECT event_type, h, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(count(*)) OVER (PARTITION BY event_type) AS BIGINT)
           AS n
  FROM ev GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(floor(sqrt(CAST(a.c AS DOUBLE) / a.n
                         * (CAST(b.c AS DOUBLE) / b.n)) * 1e9 + {_OFF})
              AS BIGINT) AS t9
  FROM prof a JOIN prof b
    ON b.h = a.h AND a.event_type < b.event_type
), agg AS (
  SELECT type_a, type_b, CAST(sum(t9) AS BIGINT) AS bc9
  FROM pairs GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(floor(CAST(bc9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS bc_e6,
       CAST(floor(-ln(CAST(bc9 AS DOUBLE) / 1e9) * 1000000 + {_OFF})
            AS BIGINT) AS db_e6
FROM agg
WHERE bc9 > 0
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# tv_distance — total variation between weekday and weekend profiles
# ---------------------------------------------------------------------------
# TV(p, q) = (1/2) sum_h |p_h - q_h| per event type between the
# weekday and weekend diel profiles — EXACT end to end: with weekday
# counts c_h (total C) and weekend counts d_h (total D), TV =
# sum_h |c_h D - d_h C| / (2 C D), kept as an exact BIGINT numerator
# until one final division.


def q_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("we"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            % 24
        )
        .cast("long")
        .alias("h"),
    )
    cells = ev.groupBy("event_type", "h").agg(
        F.sum((F.col("we") == 0).cast("long")).alias("c"),
        F.sum((F.col("we") == 1).cast("long")).alias("d"),
    )
    wt = Window.partitionBy("event_type")
    cells = cells.withColumn("cc", F.sum("c").over(wt)).withColumn(
        "dd", F.sum("d").over(wt)
    )
    agg = cells.groupBy("event_type").agg(
        F.max("cc").alias("n_weekday"),
        F.max("dd").alias("n_weekend"),
        F.sum(
            F.abs(F.col("c") * F.col("dd") - F.col("d") * F.col("cc"))
        ).alias("num"),
    )
    tv = F.col("num").cast("double") / (
        2.0 * F.col("n_weekday").cast("double") * F.col("n_weekend")
    )
    return (
        agg.filter((F.col("n_weekday") > 0) & (F.col("n_weekend") > 0))
        .select(
            "event_type",
            F.col("n_weekday").cast("long").alias("n_weekday"),
            F.col("n_weekend").cast("long").alias("n_weekend"),
            F.col("num").cast("long").alias("tv_num"),
            F.floor(tv * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "tv_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_TV = """
WITH ev AS (
  SELECT event_type,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS h
  FROM events
), cells AS (
  SELECT event_type, h,
         CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM ev GROUP BY 1, 2
), tot AS (
  SELECT event_type, h, c, d,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS cc,
         CAST(sum(d) OVER (PARTITION BY event_type) AS BIGINT) AS dd
  FROM cells
), agg AS (
  SELECT event_type, max(cc) AS n_weekday, max(dd) AS n_weekend,
         CAST(sum(abs(c * dd - d * cc)) AS BIGINT) AS num
  FROM tot GROUP BY 1
)
SELECT event_type, n_weekday, n_weekend, num AS tv_num,
       CAST(floor(CAST(num AS DOUBLE)
                  / (2.0 * CAST(n_weekday AS DOUBLE) * n_weekend)
                  * 1000000 + {OFF}) AS BIGINT) AS tv_e6
FROM agg
WHERE n_weekday > 0 AND n_weekend > 0
ORDER BY event_type
""".replace("{OFF}", str(_OFF))


# ---------------------------------------------------------------------------
# kuiper_test — Kuiper circular-uniformity test of time-of-day
# ---------------------------------------------------------------------------
# Kuiper (Proc. KNAW 1960): V = D+ + D- over the empirical CDF of
# time-of-day against uniform — the rotation-invariant KS for circular
# data (complements rayleigh_diel, which only sees the first
# harmonic).  Both sup-statistics are EXACT rationals on the
# second-of-day domain: scaling by n * 86400 gives integer numerators
# max(cc * 86400 - s * n) and max(s * n - (cc - c) * 86400), so the
# whole statistic is exact until the final normalization; V* uses the
# Stephens (1970) finite-n factor.


def q_kuiper_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
            )
            % 86_400
        )
        .cast("long")
        .alias("s"),
    )
    dom = ev.groupBy("event_type", "s").agg(F.count(F.lit(1)).alias("c"))
    wo = (
        Window.partitionBy("event_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    d = (
        dom.withColumn("cc", F.sum("c").over(wo))
        .withColumn("n", F.sum("c").over(wt))
    )
    # ECDF convention: after sorting, F_n steps at u_i = (s+1)/86400
    # would be one choice; we test against U(0,1) with u = s/86400 —
    # D+ = max_i (i/n - u_i), D- = max_i (u_i - (i-1)/n), evaluated at
    # block boundaries (the max over a tie block is at its edges).
    agg = d.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(F.col("cc") * 86_400 - F.col("s") * F.col("n")).alias(
            "dplus_num"
        ),
        F.max(
            F.col("s") * F.col("n") - (F.col("cc") - F.col("c")) * 86_400
        ).alias("dminus_num"),
    )
    nd = F.col("n").cast("double")
    v = (F.col("dplus_num") + F.col("dminus_num")).cast("double") / (
        nd * 86_400.0
    )
    vstar = v * (F.sqrt(nd) + 0.155 + 0.24 / F.sqrt(nd))
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("dplus_num").cast("long").alias("dplus_num"),
        F.col("dminus_num").cast("long").alias("dminus_num"),
        F.floor(v * 1_000_000 + F.lit(_OFF)).cast("long").alias("v_e6"),
        F.floor(vstar * 10_000 + F.lit(_OFF)).cast("long").alias(
            "vstar_e4"
        ),
    ).orderBy("event_type")


SQL_KUIPER = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS s
  FROM events
), dom AS (
  SELECT event_type, s, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), d AS (
  SELECT event_type, s, c,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY s)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dom
), agg AS (
  SELECT event_type, max(n) AS n,
         CAST(max(cc * 86400 - s * n) AS BIGINT) AS dplus_num,
         CAST(max(s * n - (cc - c) * 86400) AS BIGINT) AS dminus_num
  FROM d GROUP BY 1
)
SELECT event_type, n, dplus_num, dminus_num,
       CAST(floor(CAST(dplus_num + dminus_num AS DOUBLE)
                  / (CAST(n AS DOUBLE) * 86400.0) * 1000000 + {_OFF})
            AS BIGINT) AS v_e6,
       CAST(floor(CAST(dplus_num + dminus_num AS DOUBLE)
                  / (CAST(n AS DOUBLE) * 86400.0)
                  * (sqrt(CAST(n AS DOUBLE)) + 0.155
                     + 0.24 / sqrt(CAST(n AS DOUBLE)))
                  * 10000 + {_OFF}) AS BIGINT) AS vstar_e4
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# watson_u2 — Watson two-sample U^2, weekday vs weekend time-of-day
# ---------------------------------------------------------------------------
# Watson (Biometrika 1962): the rotation-invariant two-sample test on
# the circle, U^2 = (nm/N^2) [sum_j d_j^2 - (sum_j d_j)^2 / N] with
# d_j the running ECDF difference over the pooled sample.  On the
# second-of-day DOMAIN the difference at value v is the exact integer
# D_v = cc0 m - cc1 n (inclusive cumulatives), each pooled observation
# contributes its tie weight t_v, and U^2 = [N sum t D^2 -
# (sum t D)^2] / (n m N^3) — exact BIGINT until one final division.


def q_watson_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("we"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
            )
            % 86_400
        )
        .cast("long")
        .alias("s"),
    )
    dom = ev.groupBy("event_type", "s").agg(
        F.sum((F.col("we") == 0).cast("long")).alias("t0"),
        F.sum((F.col("we") == 1).cast("long")).alias("t1"),
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    d = (
        dom.withColumn("cc0", F.sum("t0").over(wo))
        .withColumn("cc1", F.sum("t1").over(wo))
        .withColumn("n0", F.sum("t0").over(wt))
        .withColumn("n1", F.sum("t1").over(wt))
    )
    dv = F.col("cc0") * F.col("n1") - F.col("cc1") * F.col("n0")
    t = F.col("t0") + F.col("t1")
    agg = d.groupBy("event_type").agg(
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
        F.sum(t * dv).alias("std"),
        F.sum(t * dv * dv).alias("std2"),
    )
    nn = (F.col("n0") + F.col("n1")).cast("double")
    u2 = (
        nn * F.col("std2").cast("double")
        - F.col("std").cast("double") * F.col("std").cast("double")
    ) / (
        F.col("n0").cast("double")
        * F.col("n1").cast("double")
        * nn
        * nn
        * nn
    )
    return (
        agg.filter((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            "event_type",
            F.col("n0").cast("long").alias("n_weekday"),
            F.col("n1").cast("long").alias("n_weekend"),
            F.floor(u2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "u2_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_WATSON = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we,
         CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS s
  FROM events
), dom AS (
  SELECT event_type, s,
         CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t0,
         CAST(sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
  FROM ev GROUP BY 1, 2
), d AS (
  SELECT event_type, t0, t1,
         CAST(sum(t0) OVER (PARTITION BY event_type ORDER BY s)
              AS BIGINT) AS cc0,
         CAST(sum(t1) OVER (PARTITION BY event_type ORDER BY s)
              AS BIGINT) AS cc1,
         CAST(sum(t0) OVER (PARTITION BY event_type) AS BIGINT) AS n0,
         CAST(sum(t1) OVER (PARTITION BY event_type) AS BIGINT) AS n1
  FROM dom
), agg AS (
  SELECT event_type, max(n0) AS n0, max(n1) AS n1,
         CAST(sum((t0 + t1) * (cc0 * n1 - cc1 * n0)) AS BIGINT) AS std,
         CAST(sum((t0 + t1) * (cc0 * n1 - cc1 * n0)
                  * (cc0 * n1 - cc1 * n0)) AS BIGINT) AS std2
  FROM d GROUP BY 1
)
SELECT event_type, n0 AS n_weekday, n1 AS n_weekend,
       CAST(floor(
         (CAST(n0 + n1 AS DOUBLE) * CAST(std2 AS DOUBLE)
          - CAST(std AS DOUBLE) * CAST(std AS DOUBLE))
         / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
            * CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 AS DOUBLE)
            * CAST(n0 + n1 AS DOUBLE))
         * 1000000 + {_OFF}) AS BIGINT) AS u2_e6
FROM agg
WHERE n0 > 0 AND n1 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# circ_linear_corr — Mardia circular-linear correlation (hour vs value)
# ---------------------------------------------------------------------------
# Mardia (Biometrika 1976) / Johnson & Wehrly: R^2 = (r_xc^2 + r_xs^2
# - 2 r_xc r_xs r_cs) / (1 - r_cs^2) with c = cos(2 pi h / 24), s =
# sin(2 pi h / 24).  Trig values come from the SAME e6-scaled integer
# lookup table embedded in both engines (the rayleigh_diel zero-libm
# discipline), so every moment sum is an exact BIGINT; the three
# Pearson correlations are the statistic ON the quantized angle by
# contract.


import math as _math

_COS6 = [
    int(_math.floor(_math.cos(2.0 * _math.pi * h / 24.0) * 1e6))
    for h in range(24)
]
_SIN6 = [
    int(_math.floor(_math.sin(2.0 * _math.pi * h / 24.0) * 1e6))
    for h in range(24)
]


def q_circ_linear_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hr = (
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        )
        % 24
    ).cast("int")
    d = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("x"),
        F.element_at(F.array(*[F.lit(v) for v in _COS6]), hr + 1)
        .cast("long")
        .alias("c"),
        F.element_at(F.array(*[F.lit(v) for v in _SIN6]), hr + 1)
        .cast("long")
        .alias("s"),
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
        F.sum("s").alias("ss"),
        F.sum(F.col("s") * F.col("s")).alias("sss"),
        F.sum(F.col("x") * F.col("c")).alias("sxc"),
        F.sum(F.col("x") * F.col("s")).alias("sxs"),
        F.sum(F.col("c") * F.col("s")).alias("scs"),
    )

    def corr(sab, sa, sb, saa, sbb):
        num = F.col("n").cast("double") * F.col(sab).cast("double") - F.col(
            sa
        ).cast("double") * F.col(sb).cast("double")
        da = F.col("n").cast("double") * F.col(saa).cast("double") - F.col(
            sa
        ).cast("double") * F.col(sa).cast("double")
        db = F.col("n").cast("double") * F.col(sbb).cast("double") - F.col(
            sb
        ).cast("double") * F.col(sb).cast("double")
        return num / F.sqrt(da * db)

    rxc = corr("sxc", "sx", "sc", "sxx", "scc")
    rxs = corr("sxs", "sx", "ss", "sxx", "sss")
    rcs = corr("scs", "sc", "ss", "scc", "sss")
    r2 = (rxc * rxc + rxs * rxs - 2.0 * rxc * rxs * rcs) / (
        1.0 - rcs * rcs
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(rxc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rxc_e6"
        ),
        F.floor(rxs * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rxs_e6"
        ),
        F.floor(rcs * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rcs_e6"
        ),
        F.floor(r2 * 1_000_000 + F.lit(_OFF)).cast("long").alias("r2_e6"),
    ).orderBy("event_type")


_COS6_SQL = "[" + ", ".join(str(v) for v in _COS6) + "]"
_SIN6_SQL = "[" + ", ".join(str(v) for v in _SIN6) + "]"

SQL_CIRC_LINEAR = f"""
WITH d AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS x,
         CAST({_COS6_SQL}[
           CAST(CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS INTEGER)
           + 1] AS BIGINT) AS c,
         CAST({_SIN6_SQL}[
           CAST(CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS INTEGER)
           + 1] AS BIGINT) AS s
  FROM events
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS scc,
         CAST(sum(s) AS BIGINT) AS ss,
         CAST(sum(s * s) AS BIGINT) AS sss,
         CAST(sum(x * c) AS BIGINT) AS sxc,
         CAST(sum(x * s) AS BIGINT) AS sxs,
         CAST(sum(c * s) AS BIGINT) AS scs
  FROM d GROUP BY 1
), r AS (
  SELECT event_type, n,
         (CAST(n AS DOUBLE) * CAST(sxc AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sc AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
                   - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))) AS rxc,
         (CAST(n AS DOUBLE) * CAST(sxs AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(ss AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sss AS DOUBLE)
                   - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))) AS rxs,
         (CAST(n AS DOUBLE) * CAST(scs AS DOUBLE)
          - CAST(sc AS DOUBLE) * CAST(ss AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
                 - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sss AS DOUBLE)
                   - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))) AS rcs
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(rxc * 1000000 + {_OFF}) AS BIGINT) AS rxc_e6,
       CAST(floor(rxs * 1000000 + {_OFF}) AS BIGINT) AS rxs_e6,
       CAST(floor(rcs * 1000000 + {_OFF}) AS BIGINT) AS rcs_e6,
       CAST(floor((rxc * rxc + rxs * rxs - 2.0 * rxc * rxs * rcs)
                  / (1.0 - rcs * rcs) * 1000000 + {_OFF})
            AS BIGINT) AS r2_e6
FROM r
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# bowker_symmetry — symmetry test of the first-vs-last type table
# ---------------------------------------------------------------------------
# Bowker (JASA 1948): for each user pair up the FIRST and LAST event
# type (ts then event_id order); chi^2 = sum_{{i<j}} (n_ij - n_ji)^2 /
# (n_ij + n_ji) tests whether entry type -> exit type flows are
# symmetric.  Exact integer counting; each unordered pair's
# contribution is e6-floored before the windowed total, df = count of
# non-empty pairs.


def q_bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("tts"),
        "event_id",
    )
    wa = Window.partitionBy("user_id").orderBy("tts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("tts").desc(), F.col("event_id").desc()
    )
    fl = (
        ev.withColumn("ra", F.row_number().over(wa))
        .withColumn("rd", F.row_number().over(wd))
        .filter((F.col("ra") == 1) | (F.col("rd") == 1))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("ra") == 1, F.col("event_type"))).alias(
                "first_type"
            ),
            F.min(F.when(F.col("rd") == 1, F.col("event_type"))).alias(
                "last_type"
            ),
        )
    )
    cnt = fl.groupBy("first_type", "last_type").agg(
        F.count(F.lit(1)).alias("nij")
    )
    rev = cnt.select(
        F.col("first_type").alias("last_type"),
        F.col("last_type").alias("first_type"),
        F.col("nij").alias("nji"),
    )
    pairs = (
        cnt.join(rev, ["first_type", "last_type"], "full_outer")
        .fillna(0, ["nij", "nji"])
        .filter(F.col("first_type") < F.col("last_type"))
        .filter(F.col("nij") + F.col("nji") > 0)
    )
    contrib = F.floor(
        (F.col("nij") - F.col("nji")).cast("double")
        * (F.col("nij") - F.col("nji"))
        / (F.col("nij") + F.col("nji"))
        * 1_000_000
        + F.lit(_OFF)
    ).cast("long")
    out = pairs.select(
        F.col("first_type").alias("type_a"),
        F.col("last_type").alias("type_b"),
        F.col("nij").cast("long").alias("n_ab"),
        F.col("nji").cast("long").alias("n_ba"),
        contrib.alias("contrib_e6"),
    )
    wall = Window.partitionBy()
    return (
        out.withColumn(
            "chi2_e6", F.sum("contrib_e6").over(wall).cast("long")
        )
        .withColumn("df", F.count(F.lit(1)).over(wall).cast("long"))
        .orderBy("type_a", "type_b")
    )


SQL_BOWKER = f"""
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
), fl AS (
  SELECT user_id,
         min(CASE WHEN ra = 1 THEN event_type END) AS first_type,
         min(CASE WHEN rd = 1 THEN event_type END) AS last_type
  FROM ranked WHERE ra = 1 OR rd = 1
  GROUP BY 1
), cnt AS (
  SELECT first_type, last_type, CAST(count(*) AS BIGINT) AS nij
  FROM fl GROUP BY 1, 2
), pairs AS (
  SELECT COALESCE(a.first_type, b.last_type) AS type_a,
         COALESCE(a.last_type, b.first_type) AS type_b,
         COALESCE(a.nij, 0) AS nij, COALESCE(b.nij, 0) AS nji
  FROM cnt a FULL OUTER JOIN cnt b
    ON b.first_type = a.last_type AND b.last_type = a.first_type
  WHERE COALESCE(a.first_type, b.last_type)
        < COALESCE(a.last_type, b.first_type)
    AND COALESCE(a.nij, 0) + COALESCE(b.nij, 0) > 0
), c AS (
  SELECT type_a, type_b, nij AS n_ab, nji AS n_ba,
         CAST(floor(CAST(nij - nji AS DOUBLE) * (nij - nji)
                    / (nij + nji) * 1000000 + {_OFF}) AS BIGINT)
           AS contrib_e6
  FROM pairs
)
SELECT type_a, type_b, n_ab, n_ba, contrib_e6,
       CAST(sum(contrib_e6) OVER () AS BIGINT) AS chi2_e6,
       CAST(count(*) OVER () AS BIGINT) AS df
FROM c
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# chao1_ace — Chao1 and ACE unseen-vocabulary richness per language
# ---------------------------------------------------------------------------
# Chao (Scand. J. Stat. 1984) bias-corrected form V + f1(f1-1) /
# (2(f2+1)), and ACE (Chao & Lee JASA 1992) with the standard rare
# cutoff 10: S_abund + S_rare/C + (f1/C) gamma^2, C = 1 - f1/N_rare,
# gamma^2 = max(S_rare sum i(i-1)f_i / (C N_rare (N_rare-1)) - 1, 0).
# Complements good_toulmin (unseen MASS) and lexical_richness
# (diversity indices) with ESTIMATED RICHNESS.  Everything up to the
# last four arithmetic expressions is exact BIGINT off the word
# frequency table.


def q_chao1_ace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    freq = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    agg = freq.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum((F.col("m") == 1).cast("long")).alias("f1"),
        F.sum((F.col("m") == 2).cast("long")).alias("f2"),
        F.sum((F.col("m") <= 10).cast("long")).alias("s_rare"),
        F.sum(F.when(F.col("m") <= 10, F.col("m")).otherwise(0)).alias(
            "n_rare"
        ),
        F.sum(
            F.when(
                F.col("m") <= 10, F.col("m") * (F.col("m") - 1)
            ).otherwise(0)
        ).alias("sii"),
    )
    chao1 = F.col("v").cast("double") + F.col("f1").cast("double") * (
        F.col("f1") - 1
    ) / (2.0 * (F.col("f2") + 1))
    cace = 1.0 - F.col("f1").cast("double") / F.col("n_rare")
    g2 = F.greatest(
        F.col("s_rare").cast("double")
        * F.col("sii")
        / (
            cace
            * F.col("n_rare").cast("double")
            * (F.col("n_rare") - 1)
        )
        - 1.0,
        F.lit(0.0),
    )
    ace = (
        (F.col("v") - F.col("s_rare")).cast("double")
        + F.col("s_rare").cast("double") / cace
        + F.col("f1").cast("double") / cace * g2
    )
    return (
        agg.filter((F.col("n_rare") > 1) & (F.col("f1") < F.col("n_rare")))
        .select(
            "lang",
            F.col("v").cast("long").alias("v"),
            F.col("f1").cast("long").alias("f1"),
            F.col("f2").cast("long").alias("f2"),
            F.col("s_rare").cast("long").alias("s_rare"),
            F.floor(chao1 * 100 + F.lit(_OFF)).cast("long").alias(
                "chao1_e2"
            ),
            F.floor(ace * 100 + F.lit(_OFF)).cast("long").alias("ace_e2"),
        )
        .orderBy("lang")
    )


SQL_CHAO1 = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), freq AS (
  SELECT lang, w, count(*) AS m FROM toks GROUP BY 1, 2
), agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS v,
         CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         CAST(sum(CASE WHEN m <= 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS s_rare,
         CAST(sum(CASE WHEN m <= 10 THEN m ELSE 0 END) AS BIGINT)
           AS n_rare,
         CAST(sum(CASE WHEN m <= 10 THEN m * (m - 1) ELSE 0 END)
              AS BIGINT) AS sii
  FROM freq GROUP BY 1
)
SELECT lang, v, f1, f2, s_rare,
       CAST(floor((CAST(v AS DOUBLE)
                   + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)))
                  * 100 + {_OFF}) AS BIGINT) AS chao1_e2,
       CAST(floor(
         (CAST(v - s_rare AS DOUBLE)
          + CAST(s_rare AS DOUBLE)
            / (1.0 - CAST(f1 AS DOUBLE) / n_rare)
          + CAST(f1 AS DOUBLE)
            / (1.0 - CAST(f1 AS DOUBLE) / n_rare)
            * greatest(
                CAST(s_rare AS DOUBLE) * sii
                / ((1.0 - CAST(f1 AS DOUBLE) / n_rare)
                   * CAST(n_rare AS DOUBLE) * (n_rare - 1)) - 1.0,
                0.0))
         * 100 + {_OFF}) AS BIGINT) AS ace_e2
FROM agg
WHERE n_rare > 1 AND f1 < n_rare
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# dagostino_k2 — D'Agostino-Pearson omnibus normality test per user
# ---------------------------------------------------------------------------
# D'Agostino, Belanger & D'Agostino Jr (Am. Stat. 1990), the scipy
# ``normaltest`` ladder: Z1 from the skewness transform, Z2 from the
# Anscombe-Glynn kurtosis transform, K^2 = Z1^2 + Z2^2.  Raw power
# sums (up to v^4) ride exact BIGINTs on DECIvalues (floor(value*10)):
# at centivalue scale a single v^4 would overflow; deci bounds the
# per-user quartic sum at ~4e16 for 1e4 rows/user.  Both engines
# evaluate the identical closed-form transform on identical integers.


def q_dagostino_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(F.col("value") * 10 + F.lit(_OFF)).cast("long").alias("v"),
    )
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v")).alias("s3"),
        F.sum(
            F.col("v") * F.col("v") * F.col("v") * F.col("v")
        ).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mu * mu
    m3 = (
        F.col("s3").cast("double") / n
        - 3.0 * mu * (F.col("s2").cast("double") / n)
        + 2.0 * mu * mu * mu
    )
    m4 = (
        F.col("s4").cast("double") / n
        - 4.0 * mu * (F.col("s3").cast("double") / n)
        + 6.0 * mu * mu * (F.col("s2").cast("double") / n)
        - 3.0 * mu * mu * mu * mu
    )
    g1 = m3 / F.sqrt(m2 * m2 * m2)
    b2 = m4 / (m2 * m2)
    # skewtest (D'Agostino 1970)
    y = g1 * F.sqrt((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0)))
    beta2 = (
        3.0
        * (n * n + 27.0 * n - 70.0)
        * (n + 1.0)
        * (n + 3.0)
        / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    )
    w2 = -1.0 + F.sqrt(2.0 * (beta2 - 1.0))
    delta = 1.0 / F.sqrt(0.5 * F.log(w2))
    alpha = F.sqrt(2.0 / (w2 - 1.0))
    ya = y / alpha
    z1 = delta * F.log(ya + F.sqrt(ya * ya + 1.0))
    # kurtosistest (Anscombe & Glynn 1983)
    eb2 = 3.0 * (n - 1.0) / (n + 1.0)
    vb2 = (
        24.0
        * n
        * (n - 2.0)
        * (n - 3.0)
        / ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))
    )
    x = (b2 - eb2) / F.sqrt(vb2)
    sb1 = (
        6.0
        * (n * n - 5.0 * n + 2.0)
        / ((n + 7.0) * (n + 9.0))
        * F.sqrt(
            6.0 * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0))
        )
    )
    a = 6.0 + 8.0 / sb1 * (
        2.0 / sb1 + F.sqrt(1.0 + 4.0 / (sb1 * sb1))
    )
    z2 = (
        (1.0 - 2.0 / (9.0 * a))
        - F.cbrt(
            (1.0 - 2.0 / a) / (1.0 + x * F.sqrt(2.0 / (a - 4.0)))
        )
    ) / F.sqrt(2.0 / (9.0 * a))
    k2 = z1 * z1 + z2 * z2
    return (
        agg.filter((F.col("n") >= 20) & (m2 > 0))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.floor(g1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "g1_e6"
            ),
            F.floor(b2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "b2_e6"
            ),
            F.floor(k2 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "k2_e4"
            ),
        )
        .orderBy("user_id")
    )


SQL_DAGOSTINO = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(value * 10 + {_OFF}) AS BIGINT) AS v
  FROM events
), agg AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s1,
         CAST(sum(v * v) AS BIGINT) AS s2,
         CAST(sum(v * v * v) AS BIGINT) AS s3,
         CAST(sum(v * v * v * v) AS BIGINT) AS s4
  FROM ev GROUP BY 1
), mom AS (
  SELECT user_id, CAST(n AS DOUBLE) AS n,
         CAST(s1 AS DOUBLE) / n AS mu,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3,
         CAST(s4 AS DOUBLE) / n AS r4
  FROM agg
), cm AS (
  SELECT user_id, n,
         r2 - mu * mu AS m2,
         r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
         r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
            - 3.0 * mu * mu * mu * mu AS m4
  FROM mom
), gb AS (
  SELECT user_id, n,
         m3 / sqrt(m2 * m2 * m2) AS g1,
         m4 / (m2 * m2) AS b2, m2
  FROM cm
), z AS (
  SELECT user_id, n, g1, b2, m2,
         g1 * sqrt((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0))) AS y,
         -1.0 + sqrt(2.0 * (3.0 * (n * n + 27.0 * n - 70.0)
                            * (n + 1.0) * (n + 3.0)
                            / ((n - 2.0) * (n + 5.0) * (n + 7.0)
                               * (n + 9.0)) - 1.0)) AS w2,
         (b2 - 3.0 * (n - 1.0) / (n + 1.0))
         / sqrt(24.0 * n * (n - 2.0) * (n - 3.0)
                / ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))) AS x,
         6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7.0) * (n + 9.0))
         * sqrt(6.0 * (n + 3.0) * (n + 5.0)
                / (n * (n - 2.0) * (n - 3.0))) AS sb1
  FROM gb
), z2_ AS (
  SELECT user_id, n, g1, b2, m2, y, w2, x,
         6.0 + 8.0 / sb1 * (2.0 / sb1 + sqrt(1.0 + 4.0 / (sb1 * sb1)))
           AS a
  FROM z
), fin AS (
  SELECT user_id, n, g1, b2, m2,
         (1.0 / sqrt(0.5 * ln(w2)))
         * ln(y / sqrt(2.0 / (w2 - 1.0))
              + sqrt((y / sqrt(2.0 / (w2 - 1.0)))
                     * (y / sqrt(2.0 / (w2 - 1.0))) + 1.0)) AS z1,
         ((1.0 - 2.0 / (9.0 * a))
          - cbrt((1.0 - 2.0 / a)
                 / (1.0 + x * sqrt(2.0 / (a - 4.0)))))
         / sqrt(2.0 / (9.0 * a)) AS z2
  FROM z2_
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(floor(g1 * 1000000 + {_OFF}) AS BIGINT) AS g1_e6,
       CAST(floor(b2 * 1000000 + {_OFF}) AS BIGINT) AS b2_e6,
       CAST(floor((z1 * z1 + z2 * z2) * 10000 + {_OFF}) AS BIGINT)
         AS k2_e4
FROM fin
WHERE n >= 20 AND m2 > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# range_volatility — Parkinson / Garman-Klass / Rogers-Satchell
# ---------------------------------------------------------------------------
# The three classic range-based variance estimators (Parkinson JB
# 1980; Garman & Klass JB 1980; Rogers & Satchell Ann. Appl. Prob.
# 1991) on per-day OHLC of each type's value series — the natural
# rollup companions for tier engines that already keep M4 (min/max/
# first/last) partials.  O/C come from exact rank windows (ts,
# event_id tie-break), H/L from exact max/min centivalues; each day's
# log terms are e9-floored BEFORE the per-type mean so the folds are
# exact-integer.


def q_range_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
        F.col("ts").cast("timestamp").alias("tts"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wa = Window.partitionBy("event_type", "day").orderBy("tts", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("tts").desc(), F.col("event_id").desc()
    )
    r = ev.withColumn("ra", F.row_number().over(wa)).withColumn(
        "rd", F.row_number().over(wd)
    )
    ohlc = r.groupBy("event_type", "day").agg(
        F.min(F.when(F.col("ra") == 1, F.col("v"))).alias("o"),
        F.min(F.when(F.col("rd") == 1, F.col("v"))).alias("c"),
        F.max("v").alias("h"),
        F.min("v").alias("l"),
    )
    # degenerate guard (sf0.1 sweep): a day whose low tick is 0 (value
    # rounds to 0 cents) has no defined log-range — OHLC estimators need
    # strictly positive prices.  Drop such days in BOTH engines.
    ohlc = ohlc.filter(F.col("l") > 0)
    hl = F.log(F.col("h").cast("double") / F.col("l"))
    co = F.log(F.col("c").cast("double") / F.col("o"))
    hc = F.log(F.col("h").cast("double") / F.col("c"))
    ho = F.log(F.col("h").cast("double") / F.col("o"))
    lc = F.log(F.col("l").cast("double") / F.col("c"))
    lo = F.log(F.col("l").cast("double") / F.col("o"))
    ln2 = 0.6931471805599453
    park9 = F.floor(hl * hl / (4.0 * ln2) * 1e9 + F.lit(_OFF)).cast("long")
    gk9 = F.floor(
        (0.5 * hl * hl - (2.0 * ln2 - 1.0) * co * co) * 1e9 + F.lit(_OFF)
    ).cast("long")
    rs9 = F.floor((hc * ho + lc * lo) * 1e9 + F.lit(_OFF)).cast("long")
    agg = ohlc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(park9).alias("p9"),
        F.sum(gk9).alias("g9"),
        F.sum(rs9).alias("r9"),
    )
    return agg.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.floor(
            F.col("p9").cast("double") / F.col("n_days") / 1000.0
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("park_var_e6"),
        F.floor(
            F.col("g9").cast("double") / F.col("n_days") / 1000.0
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("gk_var_e6"),
        F.floor(
            F.col("r9").cast("double") / F.col("n_days") / 1000.0
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("rs_var_e6"),
    ).orderBy("event_type")


SQL_RANGE_VOL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         ts, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT event_type, day, v,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM ev
), ohlc AS (
  SELECT event_type, day,
         min(CASE WHEN ra = 1 THEN v END) AS o,
         min(CASE WHEN rd = 1 THEN v END) AS c,
         max(v) AS h, min(v) AS l
  FROM r GROUP BY 1, 2
), terms AS (
  SELECT event_type,
         CAST(floor(ln(CAST(h AS DOUBLE) / l) * ln(CAST(h AS DOUBLE) / l)
                    / (4.0 * 0.6931471805599453) * 1e9 + {_OFF})
              AS BIGINT) AS park9,
         CAST(floor((0.5 * ln(CAST(h AS DOUBLE) / l)
                         * ln(CAST(h AS DOUBLE) / l)
                     - (2.0 * 0.6931471805599453 - 1.0)
                       * ln(CAST(c AS DOUBLE) / o)
                       * ln(CAST(c AS DOUBLE) / o)) * 1e9 + {_OFF})
              AS BIGINT) AS gk9,
         CAST(floor((ln(CAST(h AS DOUBLE) / c) * ln(CAST(h AS DOUBLE) / o)
                     + ln(CAST(l AS DOUBLE) / c)
                       * ln(CAST(l AS DOUBLE) / o)) * 1e9 + {_OFF})
              AS BIGINT) AS rs9
  FROM ohlc
  WHERE l > 0  -- zero-low days have no defined log-range, mirrors Spark
), agg AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(park9) AS BIGINT) AS p9,
         CAST(sum(gk9) AS BIGINT) AS g9,
         CAST(sum(rs9) AS BIGINT) AS r9
  FROM terms GROUP BY 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(floor(CAST(p9 AS DOUBLE) / n_days / 1000.0 + {_OFF})
            AS BIGINT) AS park_var_e6,
       CAST(floor(CAST(g9 AS DOUBLE) / n_days / 1000.0 + {_OFF})
            AS BIGINT) AS gk_var_e6,
       CAST(floor(CAST(r9 AS DOUBLE) / n_days / 1000.0 + {_OFF})
            AS BIGINT) AS rs_var_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# downside_risk — Sortino ratio and Omega(0) on daily log-returns
# ---------------------------------------------------------------------------
# Sortino & Price (J. Investing 1994) and Keating & Shadwick (2002):
# target-0 downside statistics of each type's daily total-value
# log-returns.  Returns are e6-floored integers r6 = floor(ln(V_d /
# V_{d-1}) 1e6) so the gain/loss split, the downside second moment
# (r6^2 <= 2.5e13 per day — BIGINT-safe where an e9 scale would not
# be) and Omega's two one-sided sums are ALL exact integers; doubles
# appear only in the final three ratios.


def q_downside_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("vv")
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    r = daily.withColumn("vp", F.lag("vv").over(wo)).filter(
        F.col("vp").isNotNull() & (F.col("vp") > 0) & (F.col("vv") > 0)
    )
    r6 = F.floor(
        F.log(F.col("vv").cast("double") / F.col("vp")) * 1e6 + F.lit(_OFF)
    ).cast("long")
    t = r.select("event_type", r6.alias("r6"))
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("r6").alias("sr"),
        F.sum(
            F.when(F.col("r6") < 0, F.col("r6") * F.col("r6")).otherwise(0)
        ).alias("sd2"),
        F.sum(
            F.when(F.col("r6") > 0, F.col("r6")).otherwise(0)
        ).alias("gains"),
        F.sum(
            F.when(F.col("r6") < 0, -F.col("r6")).otherwise(0)
        ).alias("losses"),
    )
    nd = F.col("n_days").cast("double")
    meanr = F.col("sr").cast("double") / nd / 1e6
    ddev = F.sqrt(F.col("sd2").cast("double") / nd) / 1e6
    sortino = meanr / ddev
    omega = F.col("gains").cast("double") / F.col("losses")
    return (
        agg.filter((F.col("sd2") > 0) & (F.col("losses") > 0))
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.floor(meanr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "mean_r_e6"
            ),
            F.floor(ddev * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "downside_dev_e6"
            ),
            F.floor(sortino * 10_000 + F.lit(_OFF)).cast("long").alias(
                "sortino_e4"
            ),
            F.floor(omega * 10_000 + F.lit(_OFF)).cast("long").alias(
                "omega_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_DOWNSIDE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS vv
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, vv,
         lag(vv) OVER (PARTITION BY event_type ORDER BY day) AS vp
  FROM daily
), t AS (
  SELECT event_type,
         CAST(floor(ln(CAST(vv AS DOUBLE) / vp) * 1e6 + {_OFF})
              AS BIGINT) AS r6
  FROM r WHERE vp IS NOT NULL AND vp > 0 AND vv > 0
), agg AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(r6) AS BIGINT) AS sr,
         CAST(sum(CASE WHEN r6 < 0 THEN r6 * r6 ELSE 0 END) AS BIGINT)
           AS sd2,
         CAST(sum(CASE WHEN r6 > 0 THEN r6 ELSE 0 END) AS BIGINT)
           AS gains,
         CAST(sum(CASE WHEN r6 < 0 THEN -r6 ELSE 0 END) AS BIGINT)
           AS losses
  FROM t GROUP BY 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(floor(CAST(sr AS DOUBLE) / n_days / 1e6 * 1000000 + {_OFF})
            AS BIGINT) AS mean_r_e6,
       CAST(floor(sqrt(CAST(sd2 AS DOUBLE) / n_days) / 1e6 * 1000000
                  + {_OFF}) AS BIGINT) AS downside_dev_e6,
       CAST(floor((CAST(sr AS DOUBLE) / n_days / 1e6)
                  / (sqrt(CAST(sd2 AS DOUBLE) / n_days) / 1e6)
                  * 10000 + {_OFF}) AS BIGINT) AS sortino_e4,
       CAST(floor(CAST(gains AS DOUBLE) / losses * 10000 + {_OFF})
            AS BIGINT) AS omega_e4
FROM agg
WHERE sd2 > 0 AND losses > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ansari_bradley — rank scale test, weekday vs weekend, per type
# ---------------------------------------------------------------------------
# Ansari & Bradley (Ann. Math. Stat. 1960): scores a(i) = min(i,
# N+1-i) fold from both ends, so a dispersion shift moves the score
# sum.  Tie blocks live on the centivalue DOMAIN: block score sums
# come from the closed forms f(x) = T(min(x,m)) + [x > m] (T(N-m) -
# T(N-x)) and the square-sum twin with Q(y) = y(y+1)(2y+1)/6 — exact
# BIGINTs.  Tied-average per-block terms (AB contribution and the
# Conover tie-corrected variance) are e6-floored before their sums;
# z uses the exact finite-population moments.


def q_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("we"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    dom = ev.groupBy("event_type", "v").agg(
        F.sum((F.col("we") == 0).cast("long")).alias("t0"),
        F.sum((F.col("we") == 1).cast("long")).alias("t1"),
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    d = (
        dom.withColumn("hi", F.sum(F.col("t0") + F.col("t1")).over(wo))
        .withColumn("nn", F.sum(F.col("t0") + F.col("t1")).over(wt))
        .withColumn("lo", F.col("hi") - F.col("t0") - F.col("t1"))
    )
    m = F.floor((F.col("nn") + 1) / 2).cast("long")

    def tri(x):
        # x(x+1) is even, so the double division is exact (< 2^53 for
        # any per-type N this engine meets below ~1e8 rows per key)
        return x * (x + 1) / 2

    def fsum(x):
        return F.when(x <= m, tri(x)).otherwise(
            tri(m) + tri(F.col("nn") - m) - tri(F.col("nn") - x)
        )

    blk = (fsum(F.col("hi")) - fsum(F.col("lo"))).cast("long")
    t = F.col("t0") + F.col("t1")
    ab6 = F.floor(
        F.col("t1").cast("double") * blk / t * 1e6 + F.lit(_OFF)
    ).cast("long")
    a26 = F.floor(
        blk.cast("double") * blk / t * 1e6 + F.lit(_OFF)
    ).cast("long")
    agg = d.groupBy("event_type").agg(
        F.max("nn").alias("nn"),
        F.sum("t0").alias("n0"),
        F.sum("t1").alias("n1"),
        F.sum(ab6).alias("ab6"),
        F.sum(a26).alias("a26"),
        F.sum(blk).alias("suma"),
    )
    nd = F.col("nn").cast("double")
    ab = F.col("ab6").cast("double") / 1e6
    suma = F.col("suma").cast("double")
    suma2 = F.col("a26").cast("double") / 1e6
    mean = F.col("n1").cast("double") * suma / nd
    var = (
        F.col("n0").cast("double")
        * F.col("n1").cast("double")
        * (nd * suma2 - suma * suma)
        / (nd * nd * (nd - 1.0))
    )
    z = (ab - mean) / F.sqrt(var)
    return (
        agg.filter((F.col("n0") > 0) & (F.col("n1") > 0) & (var > 0))
        .select(
            "event_type",
            F.col("n0").cast("long").alias("n_weekday"),
            F.col("n1").cast("long").alias("n_weekend"),
            F.col("ab6").cast("long").alias("ab_e6"),
            F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        )
        .orderBy("event_type")
    )


SQL_ANSARI = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dom AS (
  SELECT event_type, v,
         CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t0,
         CAST(sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
  FROM ev GROUP BY 1, 2
), d AS (
  SELECT event_type, t0, t1,
         CAST(sum(t0 + t1) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) AS hi,
         CAST(sum(t0 + t1) OVER (PARTITION BY event_type) AS BIGINT)
           AS nn
  FROM dom
), blk AS (
  SELECT event_type, t0, t1, nn, hi - t0 - t1 AS lo, hi,
         (nn + 1) // 2 AS m
  FROM d
), scored AS (
  SELECT event_type, t0, t1, nn,
         (CASE WHEN hi <= m THEN hi * (hi + 1) // 2
               ELSE m * (m + 1) // 2 + (nn - m) * (nn - m + 1) // 2
                    - (nn - hi) * (nn - hi + 1) // 2 END
          - CASE WHEN lo <= m THEN lo * (lo + 1) // 2
                 ELSE m * (m + 1) // 2 + (nn - m) * (nn - m + 1) // 2
                      - (nn - lo) * (nn - lo + 1) // 2 END) AS blk
  FROM blk
), terms AS (
  SELECT event_type, t0, t1, nn, blk,
         CAST(floor(CAST(t1 AS DOUBLE) * blk / (t0 + t1) * 1e6 + {_OFF})
              AS BIGINT) AS ab6,
         CAST(floor(CAST(blk AS DOUBLE) * blk / (t0 + t1) * 1e6
                    + {_OFF}) AS BIGINT) AS a26
  FROM scored
), agg AS (
  SELECT event_type, max(nn) AS nn,
         CAST(sum(t0) AS BIGINT) AS n0,
         CAST(sum(t1) AS BIGINT) AS n1,
         CAST(sum(ab6) AS BIGINT) AS ab6,
         CAST(sum(a26) AS BIGINT) AS a26,
         CAST(sum(blk) AS BIGINT) AS suma
  FROM terms GROUP BY 1
)
SELECT event_type, n0 AS n_weekday, n1 AS n_weekend, ab6 AS ab_e6,
       CAST(floor(
         (CAST(ab6 AS DOUBLE) / 1e6
          - CAST(n1 AS DOUBLE) * suma / nn)
         / sqrt(CAST(n0 AS DOUBLE) * n1
                * (nn * (CAST(a26 AS DOUBLE) / 1e6) - CAST(suma AS
                   DOUBLE) * suma)
                / (CAST(nn AS DOUBLE) * nn * (nn - 1.0)))
         * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg
WHERE n0 > 0 AND n1 > 0
  AND CAST(n0 AS DOUBLE) * n1
      * (nn * (CAST(a26 AS DOUBLE) / 1e6)
         - CAST(suma AS DOUBLE) * suma)
      / (CAST(nn AS DOUBLE) * nn * (nn - 1.0)) > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# theil_u2 — Theil's U accuracy of the seasonal-naive forecast
# ---------------------------------------------------------------------------
# Theil (Applied Economic Forecasting 1966): U2 compares a forecast's
# RMSE to the naive no-change forecast.  Here the lag-7 seasonal-naive
# daily-count forecast is scored against the lag-1 naive per event
# type on the common support (day >= first + 7) — the census
# companion to forecast_mase (which scales by in-sample MAE, not by
# the naive RMSE).  Squared-error sums are exact BIGINTs; U1
# (bounded [0,1] form) and U2 hit doubles only in the final ratios.


def q_theil_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wo = Window.partitionBy("event_type").orderBy("day")
    d = (
        daily.withColumn("y1", F.lag("y", 1).over(wo))
        .withColumn("y7", F.lag("y", 7).over(wo))
        .filter(F.col("y1").isNotNull() & F.col("y7").isNotNull())
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("y7") - F.col("y")) * (F.col("y7") - F.col("y"))
        ).alias("se_f"),
        F.sum(
            (F.col("y1") - F.col("y")) * (F.col("y1") - F.col("y"))
        ).alias("se_n"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
        F.sum(F.col("y7") * F.col("y7")).alias("sf2"),
    )
    nd = F.col("n").cast("double")
    u2 = F.sqrt(F.col("se_f").cast("double") / F.col("se_n"))
    u1 = F.sqrt(F.col("se_f").cast("double") / nd) / (
        F.sqrt(F.col("sy2").cast("double") / nd)
        + F.sqrt(F.col("sf2").cast("double") / nd)
    )
    return (
        agg.filter(F.col("se_n") > 0)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("se_f").cast("long").alias("sse_seasonal"),
            F.col("se_n").cast("long").alias("sse_naive"),
            F.floor(u1 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "u1_e6"
            ),
            F.floor(u2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "u2_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_THEIL_U2 = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, y,
         lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
  FROM daily
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum((y7 - y) * (y7 - y)) AS BIGINT) AS se_f,
         CAST(sum((y1 - y) * (y1 - y)) AS BIGINT) AS se_n,
         CAST(sum(y * y) AS BIGINT) AS sy2,
         CAST(sum(y7 * y7) AS BIGINT) AS sf2
  FROM d WHERE y1 IS NOT NULL AND y7 IS NOT NULL
  GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       se_f AS sse_seasonal, se_n AS sse_naive,
       CAST(floor(sqrt(CAST(se_f AS DOUBLE) / n)
                  / (sqrt(CAST(sy2 AS DOUBLE) / n)
                     + sqrt(CAST(sf2 AS DOUBLE) / n))
                  * 1000000 + {_OFF}) AS BIGINT) AS u1_e6,
       CAST(floor(sqrt(CAST(se_f AS DOUBLE) / se_n) * 1000000 + {_OFF})
            AS BIGINT) AS u2_e6
FROM agg
WHERE se_n > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cochrane_orcutt — AR(1)-corrected trend slope on daily counts
# ---------------------------------------------------------------------------
# Cochrane & Orcutt (JASA 1949): fit OLS, estimate rho from lag-1
# residual autocorrelation, quasi-difference (y_t - rho y_{t-1} on
# x_t - rho x_{t-1}) and refit — the classical serial-correlation
# repair for trend slopes (complements trend_ols_hc0, which fixes the
# SE instead of the estimate).  Stage-1 OLS runs on exact integer
# (day, count) sums; residuals and the transformed pairs are
# e6-floored per row so the stage-2 sums are exact integers again.


def q_cochrane_orcutt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wt = Window.partitionBy("event_type")
    d = daily.withColumn("x", F.col("day") - F.min("day").over(wt))
    agg1 = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    b1 = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    a1 = (F.col("sy").cast("double") - b1 * F.col("sx")) / nd
    fit = agg1.select("event_type", b1.alias("b1"), a1.alias("a1"))
    r = d.join(F.broadcast(fit), "event_type").withColumn(
        "e6",
        F.floor(
            (F.col("y") - F.col("a1") - F.col("b1") * F.col("x")) * 1e6
            + F.lit(_OFF)
        ).cast("long"),
    )
    wo = Window.partitionBy("event_type").orderBy("x")
    rl = r.withColumn("ep6", F.lag("e6").over(wo)).filter(
        F.col("ep6").isNotNull()
    )
    rho_agg = rl.groupBy("event_type").agg(
        F.sum(F.col("e6") * F.col("ep6")).alias("sep"),
        F.sum(F.col("ep6") * F.col("ep6")).alias("spp"),
    )
    rho = (
        F.col("sep").cast("double") / F.col("spp").cast("double")
    )
    rhof = rho_agg.filter(F.col("spp") > 0).select(
        "event_type", rho.alias("rho")
    )
    tr = (
        d.join(F.broadcast(rhof), "event_type")
        .withColumn("yl", F.lag("y").over(wo))
        .withColumn("xl", F.lag("x").over(wo))
        .filter(F.col("yl").isNotNull())
        .select(
            "event_type",
            "rho",
            F.floor(
                (F.col("y") - F.col("rho") * F.col("yl")) * 1e6
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("ys6"),
            F.floor(
                (F.col("x") - F.col("rho") * F.col("xl")) * 1e6
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("xs6"),
        )
    )
    agg2 = tr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.max("rho").alias("rho"),
        F.sum("xs6").alias("sx"),
        F.sum("ys6").alias("sy"),
        # products <= ~2.7e15 and their sums <= ~2.4e18 stay in BIGINT;
        # a double sum here would be order-dependent past 2^53
        F.sum(F.col("xs6") * F.col("ys6")).alias("sxy"),
        F.sum(F.col("xs6") * F.col("xs6")).alias("sxx"),
    )
    md = F.col("m").cast("double")
    b2 = (
        md * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        md * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    j = agg1.select("event_type", F.col("n"), b1.alias("b_ols")).join(
        agg2.select(
            "event_type", F.col("rho"), b2.alias("b_gls")
        ),
        "event_type",
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("b_ols") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("b_ols_e6"),
        F.floor(F.col("rho") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("rho_e6"),
        F.floor(F.col("b_gls") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("b_gls_e6"),
    ).orderBy("event_type")


SQL_COCHRANE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, y,
         day - min(day) OVER (PARTITION BY event_type) AS x
  FROM daily
), agg1 AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM d GROUP BY 1
), fit AS (
  SELECT event_type, n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b1,
         (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            * sx) / n AS a1
  FROM agg1
), r AS (
  SELECT d.event_type, x, y,
         CAST(floor((y - a1 - b1 * x) * 1e6 + {_OFF}) AS BIGINT) AS e6
  FROM d JOIN fit ON fit.event_type = d.event_type
), rl AS (
  SELECT event_type, e6,
         lag(e6) OVER (PARTITION BY event_type ORDER BY x) AS ep6
  FROM r
), rhot AS (
  SELECT event_type,
         CAST(sum(e6 * ep6) AS DOUBLE)
         / CAST(sum(ep6 * ep6) AS DOUBLE) AS rho
  FROM rl WHERE ep6 IS NOT NULL
  GROUP BY 1
  HAVING CAST(sum(ep6 * ep6) AS BIGINT) > 0
), tr AS (
  SELECT d.event_type, rho,
         CAST(floor((y - rho * lag(y)
             OVER (PARTITION BY d.event_type ORDER BY x)) * 1e6
             + {_OFF}) AS BIGINT) AS ys6,
         CAST(floor((x - rho * lag(x)
             OVER (PARTITION BY d.event_type ORDER BY x)) * 1e6
             + {_OFF}) AS BIGINT) AS xs6
  FROM d JOIN rhot ON rhot.event_type = d.event_type
), agg2 AS (
  SELECT event_type, count(*) AS m, max(rho) AS rho,
         CAST(sum(xs6) AS BIGINT) AS sx,
         CAST(sum(ys6) AS BIGINT) AS sy,
         CAST(sum(xs6 * ys6) AS BIGINT) AS sxy,
         CAST(sum(xs6 * xs6) AS BIGINT) AS sxx
  FROM tr WHERE ys6 IS NOT NULL AND xs6 IS NOT NULL
  GROUP BY 1
)
SELECT f.event_type, CAST(f.n AS BIGINT) AS n,
       CAST(floor(b1 * 1000000 + {_OFF}) AS BIGINT) AS b_ols_e6,
       CAST(floor(rho * 1000000 + {_OFF}) AS BIGINT) AS rho_e6,
       CAST(floor((CAST(m AS DOUBLE) * sxy
                   - CAST(sx AS DOUBLE) * sy)
                  / (CAST(m AS DOUBLE) * sxx
                     - CAST(sx AS DOUBLE) * sx)
                  * 1000000 + {_OFF}) AS BIGINT) AS b_gls_e6
FROM fit f JOIN agg2 ON agg2.event_type = f.event_type
ORDER BY f.event_type
"""


# ---------------------------------------------------------------------------
# capture_recapture — Chapman population estimate from week pairs
# ---------------------------------------------------------------------------
# Lincoln-Petersen capture-recapture with the Chapman (1951)
# bias-corrected estimator: treating consecutive ISO-week user sets as
# two capture occasions, N-hat = (n1+1)(n2+1)/(m+1) - 1 estimates the
# active population, with Seber's variance.  Pure exact-integer set
# arithmetic (two distinct aggregates + one equi-join per week pair);
# doubles only in the final two expressions.


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
            / 7
        )
        .cast("long")
        .alias("week"),
    )
    wk = ev.distinct()
    sizes = wk.groupBy("week").agg(F.count(F.lit(1)).alias("n1"))
    nxt = sizes.select(
        (F.col("week") - 1).alias("week"), F.col("n1").alias("n2")
    )
    ovl = (
        wk.alias("a")
        .join(
            wk.select(
                (F.col("week") - 1).alias("week"), "user_id"
            ).alias("b"),
            ["week", "user_id"],
        )
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    j = sizes.join(nxt, "week").join(ovl, "week")
    nhat = (
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        / (F.col("m") + 1)
        - 1.0
    )
    varn = (
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        * (F.col("n1") - F.col("m"))
        * (F.col("n2") - F.col("m"))
        / (
            (F.col("m") + 1).cast("double")
            * (F.col("m") + 1)
            * (F.col("m") + 2)
        )
    )
    return j.select(
        "week",
        F.col("n1").cast("long").alias("n_week"),
        F.col("n2").cast("long").alias("n_next"),
        F.col("m").cast("long").alias("n_both"),
        F.floor(nhat * 100 + F.lit(_OFF)).cast("long").alias("nhat_e2"),
        F.floor(F.sqrt(varn) * 100 + F.lit(_OFF)).cast("long").alias(
            "se_e2"
        ),
    ).orderBy("week")


SQL_CAPTURE = f"""
WITH wk AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS week
  FROM events
), sizes AS (
  SELECT week, CAST(count(*) AS BIGINT) AS n1 FROM wk GROUP BY 1
), ovl AS (
  SELECT a.week, CAST(count(*) AS BIGINT) AS m
  FROM wk a JOIN wk b
    ON b.user_id = a.user_id AND b.week = a.week + 1
  GROUP BY 1
)
SELECT s.week, s.n1 AS n_week, s2.n1 AS n_next, m AS n_both,
       CAST(floor((CAST(s.n1 + 1 AS DOUBLE) * (s2.n1 + 1) / (m + 1)
                   - 1.0) * 100 + {_OFF}) AS BIGINT) AS nhat_e2,
       CAST(floor(sqrt(CAST(s.n1 + 1 AS DOUBLE) * (s2.n1 + 1)
                       * (s.n1 - m) * (s2.n1 - m)
                       / (CAST(m + 1 AS DOUBLE) * (m + 1) * (m + 2)))
                  * 100 + {_OFF}) AS BIGINT) AS se_e2
FROM sizes s
JOIN sizes s2 ON s2.week = s.week + 1
JOIN ovl ON ovl.week = s.week
ORDER BY s.week
"""


# ---------------------------------------------------------------------------
# median_polish — Tukey median polish of the DOW x hour activity grid
# ---------------------------------------------------------------------------
# Tukey (EDA 1977): alternately sweep row and column medians out of a
# two-way table, accumulating row/column effects and an overall term —
# the robust two-way decomposition (the median analogue of the
# dow_seasonal_index mean model).  TWO full sweeps, fixed by contract
# (markov_stationary fixed-round precedent).  All arithmetic stays
# EXACT: the grid enters at 16x integer scale, every even-count median
# is the mean of two order statistics (a provably even sum halved),
# so residuals and effects remain integers at x16 through both
# sweeps; medians are order-statistic picks from sorted collect_list
# arrays (<= 24 elements per group).  Both engines output the full
# 168-cell decomposition.


def q_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
            % 7
        )
        .cast("long")
        .alias("dow"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            % 24
        )
        .cast("long")
        .alias("hour"),
    )
    cnt = ev.groupBy("dow", "hour").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        spark.range(7)
        .select(F.col("id").alias("dow"))
        .crossJoin(spark.range(24).select(F.col("id").alias("hour")))
        .join(cnt, ["dow", "hour"], "left")
        .select(
            "dow",
            "hour",
            (F.coalesce(F.col("c"), F.lit(0)) * 16).alias("v"),
        )
    )

    def med_of(df, key, val, out):
        lo = (F.col("_n") + 1) / 2
        hi = (F.col("_n") + 2) / 2
        g = df.groupBy(key).agg(
            F.sort_array(F.collect_list(val)).alias("_arr"),
            F.count(F.lit(1)).alias("_n"),
        )
        m = (
            F.element_at(F.col("_arr"), F.floor(lo).cast("int"))
            + F.element_at(F.col("_arr"), F.floor(hi).cast("int"))
        ) / 2
        return g.select(key, m.cast("long").alias(out))

    resid = grid
    reff = None  # DataFrame(dow, r)
    ceff = None  # DataFrame(hour, cx)
    overall = 0  # carried as a literal chain via a 1-row DF join
    ov = spark.range(1).select(F.lit(0).cast("long").alias("ov"))
    for _ in range(2):
        rm = med_of(resid, "dow", "v", "rm")
        resid = resid.join(F.broadcast(rm), "dow").select(
            "dow", "hour", (F.col("v") - F.col("rm")).alias("v")
        )
        reff = (
            rm.select("dow", F.col("rm").alias("r"))
            if reff is None
            else reff.join(rm, "dow").select(
                "dow", (F.col("r") + F.col("rm")).alias("r")
            )
        )
        oc = med_of(reff, F.lit(1).alias("one"), "r", "oc").select("oc")
        reff = reff.crossJoin(F.broadcast(oc)).select(
            "dow", (F.col("r") - F.col("oc")).alias("r")
        )
        ov = ov.crossJoin(F.broadcast(oc)).select(
            (F.col("ov") + F.col("oc")).alias("ov")
        )
        cm = med_of(resid, "hour", "v", "cm")
        resid = resid.join(F.broadcast(cm), "hour").select(
            "dow", "hour", (F.col("v") - F.col("cm")).alias("v")
        )
        ceff = (
            cm.select("hour", F.col("cm").alias("cx"))
            if ceff is None
            else ceff.join(cm, "hour").select(
                "hour", (F.col("cx") + F.col("cm")).alias("cx")
            )
        )
        orr = med_of(ceff, F.lit(1).alias("one"), "cx", "orr").select(
            "orr"
        )
        ceff = ceff.crossJoin(F.broadcast(orr)).select(
            "hour", (F.col("cx") - F.col("orr")).alias("cx")
        )
        ov = ov.crossJoin(F.broadcast(orr)).select(
            (F.col("ov") + F.col("orr")).alias("ov")
        )
    out = (
        resid.join(F.broadcast(reff), "dow")
        .join(F.broadcast(ceff), "hour")
        .crossJoin(F.broadcast(ov))
        .select(
            "dow",
            "hour",
            F.col("v").cast("long").alias("resid_x16"),
            F.col("r").cast("long").alias("row_eff_x16"),
            F.col("cx").cast("long").alias("col_eff_x16"),
            F.col("ov").cast("long").alias("overall_x16"),
        )
    )
    return out.orderBy("dow", "hour")


def _mp_sql() -> str:
    # unrolled two-sweep median polish; every median is the mean of the
    # two middle order statistics of a list() sorted pick (exact at the
    # x16 integer scale)
    def med(src, key, val, out):
        return (
            f"SELECT {key}, CAST((list({val} ORDER BY {val})"
            f"[CAST(floor((count(*) + 1) / 2) AS INTEGER)]"
            f" + list({val} ORDER BY {val})"
            f"[CAST(floor((count(*) + 2) / 2) AS INTEGER)]) / 2 AS BIGINT)"
            f" AS {out} FROM {src} GROUP BY 1"
        )

    sql = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hour
  FROM events
), cnt AS (
  SELECT dow, hour, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), grid AS MATERIALIZED (
  SELECT d.dow, h.hour, COALESCE(c, 0) * 16 AS v
  FROM (SELECT unnest(generate_series(0, 6)) AS dow) d
  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hour) h
  LEFT JOIN cnt ON cnt.dow = d.dow AND cnt.hour = h.hour
),
rm1 AS MATERIALIZED ({med('grid', 'dow', 'v', 'rm')}),
res1 AS MATERIALIZED (
  SELECT grid.dow, hour, v - rm AS v
  FROM grid JOIN rm1 ON rm1.dow = grid.dow
),
re1 AS MATERIALIZED (SELECT dow, rm AS r FROM rm1),
oc1 AS MATERIALIZED ({med('re1', '1 AS one', 'r', 'oc')}),
re1b AS MATERIALIZED (SELECT dow, r - oc AS r FROM re1, oc1),
cm1 AS MATERIALIZED ({med('res1', 'hour', 'v', 'cm')}),
res2 AS MATERIALIZED (
  SELECT dow, res1.hour, v - cm AS v
  FROM res1 JOIN cm1 ON cm1.hour = res1.hour
),
ce1 AS MATERIALIZED (SELECT hour, cm AS cx FROM cm1),
or1 AS MATERIALIZED ({med('ce1', '1 AS one', 'cx', 'orr')}),
ce1b AS MATERIALIZED (SELECT hour, cx - orr AS cx FROM ce1, or1),
rm2 AS MATERIALIZED ({med('res2', 'dow', 'v', 'rm')}),
res3 AS MATERIALIZED (
  SELECT res2.dow, hour, v - rm AS v
  FROM res2 JOIN rm2 ON rm2.dow = res2.dow
),
re2 AS MATERIALIZED (
  SELECT re1b.dow, r + rm AS r
  FROM re1b JOIN rm2 ON rm2.dow = re1b.dow
),
oc2 AS MATERIALIZED ({med('re2', '1 AS one', 'r', 'oc')}),
re2b AS MATERIALIZED (SELECT dow, r - oc AS r FROM re2, oc2),
cm2 AS MATERIALIZED ({med('res3', 'hour', 'v', 'cm')}),
res4 AS MATERIALIZED (
  SELECT dow, res3.hour, v - cm AS v
  FROM res3 JOIN cm2 ON cm2.hour = res3.hour
),
ce2 AS MATERIALIZED (
  SELECT ce1b.hour, cx + cm AS cx
  FROM ce1b JOIN cm2 ON cm2.hour = ce1b.hour
),
or2 AS MATERIALIZED ({med('ce2', '1 AS one', 'cx', 'orr')}),
ce2b AS MATERIALIZED (SELECT hour, cx - orr AS cx FROM ce2, or2),
ovr AS MATERIALIZED (
  SELECT oc1.oc + or1.orr + oc2.oc + or2.orr AS ov
  FROM oc1, or1, oc2, or2
)
SELECT res4.dow, res4.hour,
       CAST(v AS BIGINT) AS resid_x16,
       CAST(r AS BIGINT) AS row_eff_x16,
       CAST(cx AS BIGINT) AS col_eff_x16,
       CAST(ov AS BIGINT) AS overall_x16
FROM res4
JOIN re2b ON re2b.dow = res4.dow
JOIN ce2b ON ce2b.hour = res4.hour
CROSS JOIN ovr
ORDER BY res4.dow, res4.hour
"""
    return sql


SQL_MEDIAN_POLISH = _mp_sql()


# ---------------------------------------------------------------------------
# readability_char — Coleman-Liau and ARI per source (char-based)
# ---------------------------------------------------------------------------
# Coleman & Liau (J. Appl. Psych. 1975) and the Automated Readability
# Index (Senter & Smith 1967) need only character / word / sentence
# counts — no syllable heuristic — so unlike q_readability (Flesch)
# they are EXACT integer censuses until the final two linear forms.
# Corpus-level per source: ratios off summed counts.


def q_readability_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    d = _documents(spark, sf_dir).select(
        "source",
        F.regexp_count(F.col("text"), F.lit("[A-Za-z]")).cast("long").alias(
            "letters"
        ),
        F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]"))
        .cast("long")
        .alias("chars"),
        F.regexp_count(F.col("text"), F.lit("[A-Za-z]+"))
        .cast("long")
        .alias("words"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
        )
        .cast("long")
        .alias("sents"),
    ).filter(F.col("words") > 0)
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("letters").alias("letters"),
        F.sum("chars").alias("chars"),
        F.sum("words").alias("words"),
        F.sum("sents").alias("sents"),
    )
    lw = F.col("letters").cast("double") / F.col("words") * 100.0
    sw = F.col("sents").cast("double") / F.col("words") * 100.0
    cli = 0.0588 * lw - 0.296 * sw - 15.8
    ari = (
        4.71 * (F.col("chars").cast("double") / F.col("words"))
        + 0.5 * (F.col("words").cast("double") / F.col("sents"))
        - 21.43
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("letters").cast("long").alias("letters"),
        F.col("words").cast("long").alias("words"),
        F.col("sents").cast("long").alias("sents"),
        F.floor(cli * 10_000 + F.lit(_OFF)).cast("long").alias("cli_e4"),
        F.floor(ari * 10_000 + F.lit(_OFF)).cast("long").alias("ari_e4"),
    ).orderBy("source")


SQL_READABILITY_CHAR = f"""
WITH d AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT)
           AS letters,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]')) AS BIGINT)
           AS chars,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
           AS words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS sents
  FROM documents
), f AS (
  SELECT * FROM d WHERE words > 0
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(letters) AS BIGINT) AS letters,
         CAST(sum(chars) AS BIGINT) AS chars,
         CAST(sum(words) AS BIGINT) AS words,
         CAST(sum(sents) AS BIGINT) AS sents
  FROM f GROUP BY 1
)
SELECT source, n_docs, letters, words, sents,
       CAST(floor((0.0588 * (CAST(letters AS DOUBLE) / words * 100.0)
                   - 0.296 * (CAST(sents AS DOUBLE) / words * 100.0)
                   - 15.8) * 10000 + {_OFF}) AS BIGINT) AS cli_e4,
       CAST(floor((4.71 * (CAST(chars AS DOUBLE) / words)
                   + 0.5 * (CAST(words AS DOUBLE) / sents)
                   - 21.43) * 10000 + {_OFF}) AS BIGINT) AS ari_e4
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# word_shape_entropy — orthographic shape distribution per language
# ---------------------------------------------------------------------------
# The classic NER feature (e.g. Finkel et al. 2005): map characters to
# class symbols (x/X/d/o), collapse same-class runs, and census the
# shape distribution per language — a language/quality signal that
# survives vocabulary shift.  Run collapsing uses four per-class
# regexes (NO backreferences — DuckDB's RE2 has none, so the form is
# chosen to be engine-portable by construction).  Shape entropy terms
# are e9-floored before the sum; top-shape share is exact.


def q_word_shape_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    s = toks.withColumn(
        "sh", F.regexp_replace(F.col("w"), "[a-z]", "x")
    )
    s = s.withColumn("sh", F.regexp_replace(F.col("sh"), "[A-Z]", "X"))
    s = s.withColumn("sh", F.regexp_replace(F.col("sh"), "[0-9]", "d"))
    s = s.withColumn("sh", F.regexp_replace(F.col("sh"), "[^xXd]", "o"))
    for cls in ["x", "X", "d", "o"]:
        s = s.withColumn(
            "sh", F.regexp_replace(F.col("sh"), f"{cls}+", cls)
        )
    cnt = s.groupBy("lang", "sh").agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("lang")
    cnt = cnt.withColumn("n", F.sum("c").over(wt))
    t9 = F.floor(
        F.col("c").cast("double")
        / F.col("n")
        * F.log(F.col("n").cast("double") / F.col("c"))
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = cnt.groupBy("lang").agg(
        F.max("n").alias("n_words"),
        F.count(F.lit(1)).alias("n_shapes"),
        F.sum(t9).alias("h9"),
        F.max("c").alias("top_c"),
    )
    return agg.select(
        "lang",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_shapes").cast("long").alias("n_shapes"),
        F.floor(F.col("h9").cast("double") / 1000.0 + F.lit(_OFF))
        .cast("long")
        .alias("entropy_e6"),
        F.floor(
            F.col("top_c").cast("double") / F.col("n_words") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("top_share_e6"),
    ).orderBy("lang")


SQL_WORD_SHAPE = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), s AS (
  SELECT lang,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(w, '[a-z]', 'x', 'g'),
             '[A-Z]', 'X', 'g'),
             '[0-9]', 'd', 'g'),
             '[^xXd]', 'o', 'g'),
           'x+', 'x', 'g'),
           'X+', 'X', 'g'),
           'd+', 'd', 'g'),
           'o+', 'o', 'g') AS sh
  FROM toks WHERE len(w) > 0
), cnt AS (
  SELECT lang, sh, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(count(*)) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM s GROUP BY 1, 2
), agg AS (
  SELECT lang, max(n) AS n_words, CAST(count(*) AS BIGINT) AS n_shapes,
         CAST(sum(CAST(floor(CAST(c AS DOUBLE) / n
                             * ln(CAST(n AS DOUBLE) / c) * 1e9 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS h9,
         max(c) AS top_c
  FROM cnt GROUP BY 1
)
SELECT lang, n_words, n_shapes,
       CAST(floor(CAST(h9 AS DOUBLE) / 1000.0 + {_OFF}) AS BIGINT)
         AS entropy_e6,
       CAST(floor(CAST(top_c AS DOUBLE) / n_words * 1000000 + {_OFF})
            AS BIGINT) AS top_share_e6
FROM agg
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# wallis_moore — phase-frequency randomness test on daily counts
# ---------------------------------------------------------------------------
# Wallis & Moore (JASA 1941): count PHASES (maximal runs of equal
# difference sign, zero diffs dropped by contract, first and last
# phase excluded), H ~ N((2n-7)/3, (16n-29)/90) under randomness —
# the difference-sign complement to runs_test (above/below median)
# and bartels_rvn (rank vN).  Exact integer counting off two lag
# windows; n is the count of non-zero diffs + 1.


def q_wallis_moore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wo = Window.partitionBy("event_type").orderBy("day")
    d = daily.withColumn("dy", F.col("y") - F.lag("y").over(wo)).filter(
        F.col("dy").isNotNull() & (F.col("dy") != 0)
    )
    d = d.withColumn(
        "sgn", F.when(F.col("dy") > 0, F.lit(1)).otherwise(F.lit(-1))
    )
    d = d.withColumn("sp", F.lag("sgn").over(wo))
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ndiff"),
        F.sum(
            (F.col("sp").isNotNull() & (F.col("sgn") != F.col("sp")))
            .cast("long")
        ).alias("changes"),
    )
    n = (F.col("ndiff") + 1).cast("double")
    h = (F.col("changes") + 1 - 2).cast("double")
    eh = (2.0 * n - 7.0) / 3.0
    vh = (16.0 * n - 29.0) / 90.0
    z = (h - eh) / F.sqrt(vh)
    return (
        agg.filter(F.col("ndiff") >= 3)
        .select(
            "event_type",
            (F.col("ndiff") + 1).cast("long").alias("n"),
            (F.col("changes") - 1).cast("long").alias("phases_inner"),
            F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        )
        .orderBy("event_type")
    )


SQL_WALLIS = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d0 AS (
  SELECT event_type, day,
         y - lag(y) OVER (PARTITION BY event_type ORDER BY day) AS dy
  FROM daily
), d1 AS (
  SELECT event_type, day,
         CASE WHEN dy > 0 THEN 1 ELSE -1 END AS sgn
  FROM d0 WHERE dy IS NOT NULL AND dy <> 0
), d2 AS (
  SELECT event_type, sgn,
         lag(sgn) OVER (PARTITION BY event_type ORDER BY day) AS sp
  FROM d1
), agg AS (
  SELECT event_type, count(*) AS ndiff,
         CAST(sum(CASE WHEN sp IS NOT NULL AND sgn <> sp
                       THEN 1 ELSE 0 END) AS BIGINT) AS changes
  FROM d2 GROUP BY 1
)
SELECT event_type, CAST(ndiff + 1 AS BIGINT) AS n,
       CAST(changes - 1 AS BIGINT) AS phases_inner,
       CAST(floor(
         (CAST(changes - 1 AS DOUBLE)
          - (2.0 * (ndiff + 1) - 7.0) / 3.0)
         / sqrt((16.0 * (ndiff + 1) - 29.0) / 90.0)
         * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg
WHERE ndiff >= 3
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# centroid_purity — nearest-centroid label agreement census
# ---------------------------------------------------------------------------
# The classification view of cluster quality (complement to
# silhouette/DB/CH/Dunn): assign every point to its nearest label
# centroid (6-dp rounded distance, centroid-label tie-break) and
# census per TRUE label the agreement rate and the most attractive
# wrong label.  Points x 10 broadcast centroid rows through the Arrow
# kernel; the argmin is a per-point rank window over 10 rows.


def q_centroid_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats8 import _centroids
    from diive_spark.text.similarity import l2sq_pair_udf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    cent = _centroids(emb).select(
        F.col("label").alias("clabel"), "carr"
    )
    pairs = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(l2sq_pair_udf(F.col("embedding"), F.col("carr")), 6).alias(
            "d2"
        ),
    )
    wo = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("clabel").asc()
    )
    near = pairs.withColumn("rk", F.row_number().over(wo)).filter(
        F.col("rk") == 1
    )
    per = near.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("label") == F.col("clabel")).cast("long")).alias(
            "n_own"
        ),
    )
    wrong = (
        near.filter(F.col("label") != F.col("clabel"))
        .groupBy("label", "clabel")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    ww = Window.partitionBy("label").orderBy(
        F.col("wc").desc(), F.col("clabel").asc()
    )
    top_wrong = (
        wrong.withColumn("rk", F.row_number().over(ww))
        .filter(F.col("rk") == 1)
        .select("label", F.col("clabel").alias("top_other"))
    )
    out = per.join(top_wrong, "label", "left").select(
        F.col("label").cast("long").alias("label"),
        F.col("n").cast("long").alias("n"),
        F.col("n_own").cast("long").alias("n_own"),
        F.floor(
            F.col("n_own").cast("double") / F.col("n") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("purity_e6"),
        F.coalesce(F.col("top_other").cast("long"), F.lit(-1)).alias(
            "top_other"
        ),
    )
    return out.orderBy("label")


SQL_CENTROID_PURITY = f"""
WITH {{cent}},
pairs AS (
  SELECT e.vec_id, e.label, c.label AS clabel,
         round(list_sum(list_transform(
           generate_series(1, len(e.embedding)),
           i -> (CAST(e.embedding[i] AS DOUBLE) - c.carr[i])
                * (CAST(e.embedding[i] AS DOUBLE) - c.carr[i]))), 6)
           AS d2
  FROM embeddings e CROSS JOIN cent c
), near AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, clabel ASC) AS rk
  FROM pairs
), n1 AS (
  SELECT * FROM near WHERE rk = 1
), per AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN label = clabel THEN 1 ELSE 0 END)
              AS BIGINT) AS n_own
  FROM n1 GROUP BY 1
), wrong AS (
  SELECT label, clabel, CAST(count(*) AS BIGINT) AS wc
  FROM n1 WHERE label <> clabel GROUP BY 1, 2
), tw AS (
  SELECT label, clabel AS top_other
  FROM (
    SELECT label, clabel, row_number()
             OVER (PARTITION BY label ORDER BY wc DESC, clabel ASC)
             AS rk
    FROM wrong
  ) WHERE rk = 1
)
SELECT CAST(per.label AS BIGINT) AS label, n, n_own,
       CAST(floor(CAST(n_own AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS purity_e6,
       CAST(COALESCE(top_other, -1) AS BIGINT) AS top_other
FROM per LEFT JOIN tw ON tw.label = per.label
ORDER BY per.label
"""


# ---------------------------------------------------------------------------
# shared daily type-pair table for the method-comparison trio
# ---------------------------------------------------------------------------
# (type_a, type_b, day, x, y) for every unordered type pair on days
# where both types fired — the classic "two methods measuring the same
# day" framing.  Exact integer counts; the self-join is day-equi with
# the a < b triangle filter.


def _daily_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("c").alias("y"),
    )
    return daily.join(
        b,
        (F.col("day") == F.col("day_b"))
        & (F.col("event_type") < F.col("type_b")),
    ).select(
        F.col("event_type").alias("type_a"),
        "type_b",
        "day",
        F.col("c").alias("x"),
        "y",
    )


_DAILY_PAIRS_SQL = """
daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day,
         a.c AS x, b.c AS y
  FROM daily a JOIN daily b
    ON b.day = a.day AND a.event_type < b.event_type
)
"""


# ---------------------------------------------------------------------------
# deming_regression — errors-in-both-variables slope per type pair
# ---------------------------------------------------------------------------
# Deming (Statistical Adjustment of Data 1943), lambda = 1: slope =
# (s_yy - s_xx + sqrt((s_yy - s_xx)^2 + 4 s_xy^2)) / (2 s_xy) — the
# method-comparison regression that OLS gets wrong when x is also
# noisy.  Central moments off exact BIGINT power sums of daily
# counts; closed form only at the end.


def q_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _daily_pairs(spark, sf_dir)
    agg = p.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ) / nd
    cyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ) / nd
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ) / nd
    slope = (
        cyy - cxx + F.sqrt((cyy - cxx) * (cyy - cxx) + 4.0 * cxy * cxy)
    ) / (2.0 * cxy)
    icept = (F.col("sy").cast("double") - slope * F.col("sx")) / nd
    return (
        agg.filter((F.col("n") >= 3) & (F.col("sxy") != 0))
        .select(
            "type_a",
            "type_b",
            F.col("n").cast("long").alias("n_days"),
            F.floor(slope * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "slope_e6"
            ),
            F.floor(icept * 10_000 + F.lit(_OFF)).cast("long").alias(
                "intercept_e4"
            ),
        )
        .orderBy("type_a", "type_b")
    )


SQL_DEMING = f"""
WITH {_DAILY_PAIRS_SQL},
agg AS (
  SELECT type_a, type_b, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY 1, 2
), c AS (
  SELECT type_a, type_b, n, sx, sy, sxy,
         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS cxx,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy,
         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS cxy
  FROM agg
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
       CAST(floor((cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx)
                                    + 4.0 * cxy * cxy))
                  / (2.0 * cxy) * 1000000 + {_OFF}) AS BIGINT)
         AS slope_e6,
       CAST(floor((CAST(sy AS DOUBLE)
                   - (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx)
                                       + 4.0 * cxy * cxy))
                     / (2.0 * cxy) * sx) / n * 10000 + {_OFF})
            AS BIGINT) AS intercept_e4
FROM c
WHERE n >= 3 AND sxy <> 0
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# lin_ccc — Lin's concordance correlation per type pair
# ---------------------------------------------------------------------------
# Lin (Biometrics 1989): CCC = 2 s_xy / (s_xx + s_yy + (mx - my)^2)
# measures agreement with the 45-degree line — precision (Pearson r)
# times accuracy (C_b).  Population moments off the same exact sums
# as deming_regression; three output statistics.


def q_lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _daily_pairs(spark, sf_dir)
    agg = p.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    vx = (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    vy = (
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    cxy = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    dm = F.col("sy").cast("double") - F.col("sx").cast("double")
    # scale-free: ccc = 2 cxy / (vx + vy + dm^2) with everything in
    # the n^2-scaled frame ((mx-my)^2 -> dm^2 since dm = n(my-mx)/1)
    ccc = 2.0 * cxy / (vx + vy + dm * dm)
    r = cxy / F.sqrt(vx * vy)
    return (
        agg.filter((F.col("n") >= 3) & (vx > 0) & (vy > 0))
        .select(
            "type_a",
            "type_b",
            F.col("n").cast("long").alias("n_days"),
            F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "r_e6"
            ),
            F.floor(ccc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "ccc_e6"
            ),
            F.floor(ccc / r * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "cb_e6"
            ),
        )
        .orderBy("type_a", "type_b")
    )


SQL_LIN_CCC = f"""
WITH {_DAILY_PAIRS_SQL},
agg AS (
  SELECT type_a, type_b, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY 1, 2
), c AS (
  SELECT type_a, type_b, n,
         CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS vx,
         CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vy,
         CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cxy,
         CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) AS dm
  FROM agg
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
       CAST(floor(cxy / sqrt(vx * vy) * 1000000 + {_OFF}) AS BIGINT)
         AS r_e6,
       CAST(floor(2.0 * cxy / (vx + vy + dm * dm) * 1000000 + {_OFF})
            AS BIGINT) AS ccc_e6,
       CAST(floor(2.0 * cxy / (vx + vy + dm * dm)
                  / (cxy / sqrt(vx * vy)) * 1000000 + {_OFF})
            AS BIGINT) AS cb_e6
FROM c
WHERE n >= 3 AND vx > 0 AND vy > 0
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# bland_altman — agreement limits per type pair
# ---------------------------------------------------------------------------
# Bland & Altman (Lancet 1986): mean difference, sample-SD limits of
# agreement (+-1.96 s), and the census of days inside the limits.
# Differences are exact integers; the within-LoA comparison tests an
# exact integer against the same double threshold in both engines.


def q_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _daily_pairs(spark, sf_dir).withColumn(
        "d", F.col("x") - F.col("y")
    )
    agg = p.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("qd"),
    )
    nd = F.col("n").cast("double")
    md = F.col("sd").cast("double") / nd
    s2 = (
        F.col("qd").cast("double") - F.col("sd").cast("double") * md
    ) / (nd - 1.0)
    s = F.sqrt(s2)
    lo = md - 1.96 * s
    hi = md + 1.96 * s
    fit = agg.select(
        "type_a", "type_b", F.col("n"), md.alias("md"), s.alias("s"),
        lo.alias("lo"), hi.alias("hi"),
    )
    within = (
        p.join(F.broadcast(fit), ["type_a", "type_b"])
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(
                (
                    (F.col("d").cast("double") >= F.col("lo"))
                    & (F.col("d").cast("double") <= F.col("hi"))
                ).cast("long")
            ).alias("n_within")
        )
    )
    j = fit.join(within, ["type_a", "type_b"])
    return (
        j.filter(F.col("n") >= 3)
        .select(
            "type_a",
            "type_b",
            F.col("n").cast("long").alias("n_days"),
            F.floor(F.col("md") * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("mean_diff_e4"),
            F.floor(F.col("s") * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("sd_diff_e4"),
            F.col("n_within").cast("long").alias("n_within"),
            F.floor(
                F.col("n_within").cast("double") / F.col("n") * 1_000_000
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("pct_within_e6"),
        )
        .orderBy("type_a", "type_b")
    )


SQL_BLAND_ALTMAN = f"""
WITH {_DAILY_PAIRS_SQL},
dd AS (
  SELECT type_a, type_b, x - y AS dv FROM pairs
), agg AS (
  SELECT type_a, type_b, count(*) AS n,
         CAST(sum(dv) AS BIGINT) AS sd,
         CAST(sum(dv * dv) AS BIGINT) AS qd
  FROM dd GROUP BY 1, 2
), fit AS (
  SELECT type_a, type_b, n,
         CAST(sd AS DOUBLE) / n AS md,
         sqrt((CAST(qd AS DOUBLE)
               - CAST(sd AS DOUBLE) * (CAST(sd AS DOUBLE) / n))
              / (n - 1.0)) AS s
  FROM agg
), within AS (
  SELECT dd.type_a, dd.type_b,
         CAST(sum(CASE WHEN CAST(dv AS DOUBLE) >= md - 1.96 * s
                        AND CAST(dv AS DOUBLE) <= md + 1.96 * s
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_within
  FROM dd JOIN fit ON fit.type_a = dd.type_a AND fit.type_b = dd.type_b
  GROUP BY 1, 2
)
SELECT f.type_a, f.type_b, CAST(f.n AS BIGINT) AS n_days,
       CAST(floor(md * 10000 + {_OFF}) AS BIGINT) AS mean_diff_e4,
       CAST(floor(s * 10000 + {_OFF}) AS BIGINT) AS sd_diff_e4,
       n_within,
       CAST(floor(CAST(n_within AS DOUBLE) / f.n * 1000000 + {_OFF})
            AS BIGINT) AS pct_within_e6
FROM fit f JOIN within w
  ON w.type_a = f.type_a AND w.type_b = f.type_b
WHERE f.n >= 3
ORDER BY f.type_a, f.type_b
"""


# ---------------------------------------------------------------------------
# odds_ratio_woolf — weekend odds ratio per type with Woolf CI
# ---------------------------------------------------------------------------
# Woolf (Ann. Hum. Genet. 1955) with the Haldane-Anscombe 0.5
# correction applied unconditionally (documented contract): for each
# type the 2x2 is (this type vs all others) x (weekend vs weekday);
# OR = a'd'/(b'c'), ln-scale CI half-width 1.96 sqrt(sum 1/cell).
# Complements rate_ratio (Poisson RR on exposure-days) with the
# case-control framing.  Exact counts; doubles at the end.


def q_odds_ratio_woolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("we"),
    )
    per = ev.groupBy("event_type").agg(
        F.sum("we").alias("a"),
        F.sum(1 - F.col("we")).alias("b"),
    )
    tot = per.agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    j = per.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "a",
        "b",
        (F.col("ta") - F.col("a")).alias("c"),
        (F.col("tb") - F.col("b")).alias("d"),
    )
    ah = F.col("a").cast("double") + 0.5
    bh = F.col("b").cast("double") + 0.5
    ch = F.col("c").cast("double") + 0.5
    dh = F.col("d").cast("double") + 0.5
    orr = ah * dh / (bh * ch)
    half = 1.96 * F.sqrt(1.0 / ah + 1.0 / bh + 1.0 / ch + 1.0 / dh)
    return j.select(
        "event_type",
        F.col("a").cast("long").alias("n_weekend"),
        F.col("b").cast("long").alias("n_weekday"),
        F.col("c").cast("long").alias("oth_weekend"),
        F.col("d").cast("long").alias("oth_weekday"),
        F.floor(orr * 10_000 + F.lit(_OFF)).cast("long").alias("or_e4"),
        F.floor(F.exp(F.log(orr) - half) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("lo_e4"),
        F.floor(F.exp(F.log(orr) + half) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("hi_e4"),
    ).orderBy("event_type")


SQL_ODDS_RATIO = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we
  FROM events
), per AS (
  SELECT event_type,
         CAST(sum(we) AS BIGINT) AS a,
         CAST(sum(1 - we) AS BIGINT) AS b
  FROM ev GROUP BY 1
), tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
  FROM per
), j AS (
  SELECT event_type, a, b, ta - a AS c, tb - b AS d
  FROM per CROSS JOIN tot
), h AS (
  SELECT event_type, a, b, c, d,
         (a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)) AS orr,
         1.96 * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                     + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)) AS half
  FROM j
)
SELECT event_type, a AS n_weekend, b AS n_weekday,
       c AS oth_weekend, d AS oth_weekday,
       CAST(floor(orr * 10000 + {_OFF}) AS BIGINT) AS or_e4,
       CAST(floor(exp(ln(orr) - half) * 10000 + {_OFF}) AS BIGINT)
         AS lo_e4,
       CAST(floor(exp(ln(orr) + half) * 10000 + {_OFF}) AS BIGINT)
         AS hi_e4
FROM h
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# effective_sample_size — autocorrelation-adjusted ESS per user
# ---------------------------------------------------------------------------
# The MCMC/geostatistics workhorse (e.g. Kass et al. 1998): ESS =
# n / (1 + 2 sum_k rho_k), here with the k = 1..5 window on the
# hourly per-user series.  Every lag covariance is the exact BIGINT
# n^2-scaled form n^2 sum(v_t v_{t-k}) - n S (S_h + S_t) + m S^2, so
# rho_k = num_k / num_0 shares one scale and doubles appear only in
# the final three expressions.


_ESS_K = 5


def q_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly10(spark, sf_dir)
    wo = Window.partitionBy("user_id").orderBy("t")
    d = h
    for k in range(1, _ESS_K + 1):
        d = d.withColumn(f"l{k}", F.lag("v", k).over(wo))
    base = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
        *[
            x
            for k in range(1, _ESS_K + 1)
            for x in (
                F.count(f"l{k}").alias(f"m{k}"),
                F.sum(F.col("v") * F.col(f"l{k}")).alias(f"p{k}"),
                F.sum(
                    F.when(F.col(f"l{k}").isNotNull(), F.col("v"))
                ).alias(f"sh{k}"),
                F.sum(f"l{k}").alias(f"st{k}"),
            )
        ],
    )
    num0 = F.col("n") * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    rhos = []
    for k in range(1, _ESS_K + 1):
        numk = (
            F.col("n") * F.col("n") * F.col(f"p{k}")
            - F.col("n")
            * F.col("s")
            * (F.col(f"sh{k}") + F.col(f"st{k}"))
            + F.col(f"m{k}") * F.col("s") * F.col("s")
        )
        rhos.append(numk.cast("double") / num0.cast("double"))
    tau = 1.0 + 2.0 * sum(rhos)
    ess = F.col("n").cast("double") / tau
    return (
        base.filter(
            (F.col("n") >= 2 * _ESS_K)
            & (F.col("n") * F.col("q") - F.col("s") * F.col("s") > 0)
        )
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.floor(rhos[0] * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("rho1_e6"),
            F.floor(tau * 10_000 + F.lit(_OFF)).cast("long").alias(
                "tau_e4"
            ),
            F.floor(ess * 100 + F.lit(_OFF)).cast("long").alias("ess_e2"),
        )
        .orderBy("user_id")
    )


def _ess_sql() -> str:
    lags = ",\n         ".join(
        f"lag(v, {k}) OVER (PARTITION BY user_id ORDER BY t) AS l{k}"
        for k in range(1, _ESS_K + 1)
    )
    moms = ",\n         ".join(
        f"count(l{k}) AS m{k},\n"
        f"         CAST(sum(v * l{k}) AS BIGINT) AS p{k},\n"
        f"         CAST(sum(CASE WHEN l{k} IS NOT NULL THEN v END)"
        f" AS BIGINT) AS sh{k},\n"
        f"         CAST(sum(l{k}) AS BIGINT) AS st{k}"
        for k in range(1, _ESS_K + 1)
    )
    rhos = " + ".join(
        f"(CAST(n * n * p{k} - n * s * (sh{k} + st{k})"
        f" + m{k} * s * s AS DOUBLE)"
        f" / CAST(n * (n * q - s * s) AS DOUBLE))"
        for k in range(1, _ESS_K + 1)
    )
    rho1 = (
        "CAST(n * n * p1 - n * s * (sh1 + st1) + m1 * s * s AS DOUBLE)"
        " / CAST(n * (n * q - s * s) AS DOUBLE)"
    )
    return f"""
WITH {_HOURLY10_SQL},
d AS (
  SELECT user_id, v,
         {lags}
  FROM hourly
), base AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS q,
         {moms}
  FROM d GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(floor(({rho1}) * 1000000 + {_OFF}) AS BIGINT) AS rho1_e6,
       CAST(floor((1.0 + 2.0 * ({rhos})) * 10000 + {_OFF}) AS BIGINT)
         AS tau_e4,
       CAST(floor(CAST(n AS DOUBLE) / (1.0 + 2.0 * ({rhos})) * 100
                  + {_OFF}) AS BIGINT) AS ess_e2
FROM base
WHERE n >= {2 * _ESS_K} AND n * q - s * s > 0
ORDER BY user_id
"""


SQL_ESS = _ess_sql()


# ---------------------------------------------------------------------------
# partial_corr — partial correlation of click/view given purchase
# ---------------------------------------------------------------------------
# The classical first-order partial r_xy.z = (r_xy - r_xz r_zy) /
# sqrt((1 - r_xz^2)(1 - r_zy^2)) on daily counts (x = click, y =
# view, z = purchase) — does the click/view co-movement survive
# conditioning on purchase volume?  All three Pearson correlations
# from exact BIGINT moment sums on the day-joined triple.


def q_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "view").cast("long")).alias("y"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "z"
        ),
    )
    agg = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
    )
    nd = F.col("n").cast("double")

    def r(sab, sa, sb, saa, sbb):
        num = nd * F.col(sab).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sb).cast("double")
        da = nd * F.col(saa).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sa).cast("double")
        db = nd * F.col(sbb).cast("double") - F.col(sb).cast(
            "double"
        ) * F.col(sb).cast("double")
        return num / F.sqrt(da * db)

    rxy = r("sxy", "sx", "sy", "sxx", "syy")
    rxz = r("sxz", "sx", "sz", "sxx", "szz")
    rzy = r("syz", "sy", "sz", "syy", "szz")
    pc = (rxy - rxz * rzy) / F.sqrt(
        (1.0 - rxz * rxz) * (1.0 - rzy * rzy)
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.floor(rxy * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rxy_e6"
        ),
        F.floor(rxz * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rxz_e6"
        ),
        F.floor(rzy * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rzy_e6"
        ),
        F.floor(pc * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rxy_given_z_e6"
        ),
    )


SQL_PARTIAL = f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS y,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS z
  FROM events GROUP BY 1
), agg AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(z) AS BIGINT) AS sz,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(z * z) AS BIGINT) AS szz,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * z) AS BIGINT) AS sxz,
         CAST(sum(y * z) AS BIGINT) AS syz
  FROM daily
), r AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           AS rxy,
         (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
         / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
           AS rxz,
         (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
         / sqrt((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
           AS rzy
  FROM agg
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(floor(rxy * 1000000 + {_OFF}) AS BIGINT) AS rxy_e6,
       CAST(floor(rxz * 1000000 + {_OFF}) AS BIGINT) AS rxz_e6,
       CAST(floor(rzy * 1000000 + {_OFF}) AS BIGINT) AS rzy_e6,
       CAST(floor((rxy - rxz * rzy)
                  / sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy))
                  * 1000000 + {_OFF}) AS BIGINT) AS rxy_given_z_e6
FROM r
"""


# ---------------------------------------------------------------------------
# breusch_pagan — heteroskedasticity LM test on the daily trend
# ---------------------------------------------------------------------------
# Breusch & Pagan (Econometrica 1979), Koenker's studentized form:
# LM = n R^2 of the auxiliary regression of squared residuals on the
# regressor.  Stage-1 OLS on exact (day-index, count) sums; residuals
# e2-floored per row — e2, not e4/e6, because the auxiliary R^2 needs
# sum(g^2) with g = e^2 and (e4^2)^2 would overflow BIGINT; at e2 the
# quartic sum stays under ~1e18 for daily counts up to ~1e3 per key.


def q_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wt = Window.partitionBy("event_type")
    d = daily.withColumn("x", F.col("day") - F.min("day").over(wt))
    agg1 = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    b1 = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    a1 = (F.col("sy").cast("double") - b1 * F.col("sx")) / nd
    fit = agg1.select("event_type", b1.alias("b1"), a1.alias("a1"))
    r = d.join(F.broadcast(fit), "event_type").withColumn(
        "g",
        F.pow(
            F.floor(
                (F.col("y") - F.col("a1") - F.col("b1") * F.col("x"))
                * 100
                + F.lit(_OFF)
            ),
            2,
        ).cast("long"),
    )
    agg2 = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("g").alias("sg"),
        F.sum(F.col("x") * F.col("g")).alias("sxg"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    num = (
        nd * F.col("sxg").cast("double")
        - F.col("sx").cast("double") * F.col("sg").cast("double")
    )
    dx = (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    dg = (
        nd * F.col("sgg").cast("double")
        - F.col("sg").cast("double") * F.col("sg").cast("double")
    )
    r2 = num * num / (dx * dg)
    return (
        agg2.filter((F.col("n") >= 4) & (dg > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.floor(r2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "r2_e6"
            ),
            F.floor(nd * r2 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "lm_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_BREUSCH = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, y,
         day - min(day) OVER (PARTITION BY event_type) AS x
  FROM daily
), agg1 AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM d GROUP BY 1
), fit AS (
  SELECT event_type,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b1,
         (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            * sx) / n AS a1
  FROM agg1
), r AS (
  SELECT d.event_type, x,
         CAST(floor((y - a1 - b1 * x) * 100 + {_OFF}) AS BIGINT)
         * CAST(floor((y - a1 - b1 * x) * 100 + {_OFF}) AS BIGINT)
           AS g
  FROM d JOIN fit ON fit.event_type = d.event_type
), agg2 AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(g) AS BIGINT) AS sg,
         CAST(sum(x * g) AS BIGINT) AS sxg,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(g * g) AS BIGINT) AS sgg
  FROM r GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor((CAST(n AS DOUBLE) * sxg - CAST(sx AS DOUBLE) * sg)
                  * (CAST(n AS DOUBLE) * sxg - CAST(sx AS DOUBLE) * sg)
                  / ((CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx)
                     * (CAST(n AS DOUBLE) * sgg
                        - CAST(sg AS DOUBLE) * sg))
                  * 1000000 + {_OFF}) AS BIGINT) AS r2_e6,
       CAST(floor(CAST(n AS DOUBLE)
                  * (CAST(n AS DOUBLE) * sxg - CAST(sx AS DOUBLE) * sg)
                  * (CAST(n AS DOUBLE) * sxg - CAST(sx AS DOUBLE) * sg)
                  / ((CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx)
                     * (CAST(n AS DOUBLE) * sgg
                        - CAST(sg AS DOUBLE) * sg))
                  * 10000 + {_OFF}) AS BIGINT) AS lm_e4
FROM agg2
WHERE n >= 4
  AND CAST(n AS DOUBLE) * sgg - CAST(sg AS DOUBLE) * sg > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# chow_test — structural break F-test at the span midpoint
# ---------------------------------------------------------------------------
# Chow (Econometrica 1960): F = [(SSR_pooled - SSR_1 - SSR_2) / k] /
# [(SSR_1 + SSR_2) / (n - 2k)], k = 2, at the KNOWN candidate break
# (the day-span midpoint) — the parametric companion to the
# nonparametric changepoint family (pettitt/binseg/cusum).  Each
# segment's SSR comes from exact BIGINT moment sums via SSR = (A -
# B^2/C) / n in the n^2-scaled frame; one combinable aggregate per
# segment.


def q_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wt = Window.partitionBy("event_type")
    d = (
        daily.withColumn("d0", F.min("day").over(wt))
        .withColumn("d1", F.max("day").over(wt))
        .withColumn("x", F.col("day") - F.col("d0"))
        .withColumn(
            "seg",
            (
                2 * (F.col("day") - F.col("d0"))
                > (F.col("d1") - F.col("d0"))
            ).cast("long"),
        )
    )

    def ssr_cols(pref):
        return [
            F.count(F.lit(1)).alias(f"n{pref}"),
            F.sum("x").alias(f"sx{pref}"),
            F.sum("y").alias(f"sy{pref}"),
            F.sum(F.col("x") * F.col("y")).alias(f"sxy{pref}"),
            F.sum(F.col("x") * F.col("x")).alias(f"sxx{pref}"),
            F.sum(F.col("y") * F.col("y")).alias(f"syy{pref}"),
        ]

    pool = d.groupBy("event_type").agg(*ssr_cols("p"))
    seg0 = d.filter(F.col("seg") == 0).groupBy("event_type").agg(
        *ssr_cols("a")
    )
    seg1 = d.filter(F.col("seg") == 1).groupBy("event_type").agg(
        *ssr_cols("b")
    )
    j = pool.join(seg0, "event_type").join(seg1, "event_type")

    def ssr(pref):
        n = F.col(f"n{pref}").cast("double")
        a = n * F.col(f"syy{pref}").cast("double") - F.col(
            f"sy{pref}"
        ).cast("double") * F.col(f"sy{pref}").cast("double")
        b = n * F.col(f"sxy{pref}").cast("double") - F.col(
            f"sx{pref}"
        ).cast("double") * F.col(f"sy{pref}").cast("double")
        c = n * F.col(f"sxx{pref}").cast("double") - F.col(
            f"sx{pref}"
        ).cast("double") * F.col(f"sx{pref}").cast("double")
        return (a - b * b / c) / n

    sp, sa, sb = ssr("p"), ssr("a"), ssr("b")
    n = F.col("np").cast("double")
    f = ((sp - sa - sb) / 2.0) / ((sa + sb) / (n - 4.0))
    return (
        j.filter(
            (F.col("na") >= 3) & (F.col("nb") >= 3) & (sa + sb > 0)
        )
        .select(
            "event_type",
            F.col("np").cast("long").alias("n"),
            F.col("na").cast("long").alias("n_pre"),
            F.col("nb").cast("long").alias("n_post"),
            F.floor(f * 10_000 + F.lit(_OFF)).cast("long").alias("f_e4"),
        )
        .orderBy("event_type")
    )


def _chow_mom(src: str, pref: str) -> str:
    return (
        f"SELECT event_type, count(*) AS n{pref},\n"
        f"       CAST(sum(x) AS BIGINT) AS sx{pref},\n"
        f"       CAST(sum(y) AS BIGINT) AS sy{pref},\n"
        f"       CAST(sum(x * y) AS BIGINT) AS sxy{pref},\n"
        f"       CAST(sum(x * x) AS BIGINT) AS sxx{pref},\n"
        f"       CAST(sum(y * y) AS BIGINT) AS syy{pref}\n"
        f"FROM {src} GROUP BY 1"
    )


def _chow_ssr(pref: str) -> str:
    n = f"CAST(n{pref} AS DOUBLE)"
    return (
        f"(({n} * syy{pref} - CAST(sy{pref} AS DOUBLE) * sy{pref})"
        f" - ({n} * sxy{pref} - CAST(sx{pref} AS DOUBLE) * sy{pref})"
        f" * ({n} * sxy{pref} - CAST(sx{pref} AS DOUBLE) * sy{pref})"
        f" / ({n} * sxx{pref} - CAST(sx{pref} AS DOUBLE) * sx{pref}))"
        f" / {n}"
    )


SQL_CHOW = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, y,
         day - min(day) OVER (PARTITION BY event_type) AS x,
         CASE WHEN 2 * (day - min(day) OVER (PARTITION BY event_type))
                   > max(day) OVER (PARTITION BY event_type)
                     - min(day) OVER (PARTITION BY event_type)
              THEN 1 ELSE 0 END AS seg
  FROM daily
), pool AS ({_chow_mom('d', 'p')}),
sa AS ({_chow_mom('(SELECT * FROM d WHERE seg = 0)', 'a')}),
sb AS ({_chow_mom('(SELECT * FROM d WHERE seg = 1)', 'b')}),
j AS (
  SELECT pool.event_type, np, na, nb,
         {_chow_ssr('p')} AS ssrp,
         {_chow_ssr('a')} AS ssra,
         {_chow_ssr('b')} AS ssrb
  FROM pool
  JOIN sa ON sa.event_type = pool.event_type
  JOIN sb ON sb.event_type = pool.event_type
)
SELECT event_type, CAST(np AS BIGINT) AS n,
       CAST(na AS BIGINT) AS n_pre, CAST(nb AS BIGINT) AS n_post,
       CAST(floor(((ssrp - ssra - ssrb) / 2.0)
                  / ((ssra + ssrb) / (CAST(np AS DOUBLE) - 4.0))
                  * 10000 + {_OFF}) AS BIGINT) AS f_e4
FROM j
WHERE na >= 3 AND nb >= 3 AND ssra + ssrb > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# bracket_balance — delimiter balance data-quality audit per source
# ---------------------------------------------------------------------------
# The classic extraction-quality tripwire: truncated or mis-parsed
# pages leave unbalanced (), [], {} and odd double-quote counts.
# Pure exact-integer censuses off regexp_count / regexp_extract_all;
# one combinable aggregate per source.


def q_bracket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    d = _documents(spark, sf_dir).select(
        "source",
        (
            F.regexp_count(F.col("text"), F.lit(r"\("))
            - F.regexp_count(F.col("text"), F.lit(r"\)"))
        ).alias("dp"),
        (
            F.regexp_count(F.col("text"), F.lit(r"\["))
            - F.regexp_count(F.col("text"), F.lit(r"\]"))
        ).alias("db"),
        (
            F.regexp_count(F.col("text"), F.lit(r"\{"))
            - F.regexp_count(F.col("text"), F.lit(r"\}"))
        ).alias("dc"),
        (F.regexp_count(F.col("text"), F.lit('"')) % 2).alias("oq"),
    )
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("dp") != 0).cast("long")).alias("paren_bad"),
        F.sum((F.col("db") != 0).cast("long")).alias("bracket_bad"),
        F.sum((F.col("dc") != 0).cast("long")).alias("brace_bad"),
        F.sum((F.col("oq") != 0).cast("long")).alias("quote_bad"),
        F.sum(
            (
                (F.col("dp") == 0)
                & (F.col("db") == 0)
                & (F.col("dc") == 0)
                & (F.col("oq") == 0)
            ).cast("long")
        ).alias("clean"),
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("paren_bad").cast("long").alias("paren_bad"),
        F.col("bracket_bad").cast("long").alias("bracket_bad"),
        F.col("brace_bad").cast("long").alias("brace_bad"),
        F.col("quote_bad").cast("long").alias("quote_bad"),
        F.floor(
            F.col("clean").cast("double") / F.col("n_docs") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("clean_rate_e6"),
    ).orderBy("source")


SQL_BRACKET = f"""
WITH d AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '\\(')) AS BIGINT)
         - CAST(len(regexp_extract_all(text, '\\)')) AS BIGINT) AS dp,
         CAST(len(regexp_extract_all(text, '\\[')) AS BIGINT)
         - CAST(len(regexp_extract_all(text, '\\]')) AS BIGINT) AS db,
         CAST(len(regexp_extract_all(text, '\\{{')) AS BIGINT)
         - CAST(len(regexp_extract_all(text, '\\}}')) AS BIGINT) AS dc,
         CAST(len(regexp_extract_all(text, '"')) AS BIGINT) % 2 AS oq
  FROM documents
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN dp <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS paren_bad,
         CAST(sum(CASE WHEN db <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS bracket_bad,
         CAST(sum(CASE WHEN dc <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS brace_bad,
         CAST(sum(CASE WHEN oq <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS quote_bad,
         CAST(sum(CASE WHEN dp = 0 AND db = 0 AND dc = 0 AND oq = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS clean
  FROM d GROUP BY 1
)
SELECT source, n_docs, paren_bad, bracket_bad, brace_bad, quote_bad,
       CAST(floor(CAST(clean AS DOUBLE) / n_docs * 1000000 + {_OFF})
            AS BIGINT) AS clean_rate_e6
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# herdan_c — Herdan's law (type-token allometry) across docs per lang
# ---------------------------------------------------------------------------
# Herdan (Type-Token Mathematics 1960): ln V = C ln N + b across
# documents — the per-document allometric twin of the corpus-level
# heaps_law curve.  Per-doc (ln N, ln V) pairs are e6-floored to
# BIGINT (e6, not e9 — the cross-moment sums must stay inside
# BIGINT); OLS slope/intercept/R^2 off exact integer sums.


def q_herdan_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "lang",
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    per = toks.groupBy("lang", "doc_id").agg(
        F.count(F.lit(1)).alias("nn"),
        F.countDistinct("w").alias("v"),
    ).filter((F.col("nn") >= 2) & (F.col("v") >= 2))
    pts = per.select(
        "lang",
        F.floor(F.log(F.col("nn").cast("double")) * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("x6"),
        F.floor(F.log(F.col("v").cast("double")) * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("y6"),
    )
    agg = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").alias("sx"),
        F.sum("y6").alias("sy"),
        F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
        F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
        F.sum(F.col("y6") * F.col("y6")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    dx = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    dy = nd * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    c = num / dx
    r2 = num * num / (dx * dy)
    return (
        agg.filter((F.col("n") >= 3) & (dx > 0) & (dy > 0))
        .select(
            "lang",
            F.col("n").cast("long").alias("n_docs"),
            F.floor(c * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "c_e6"
            ),
            F.floor(r2 * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "r2_e6"
            ),
        )
        .orderBy("lang")
    )


SQL_HERDAN = f"""
WITH toks AS (
  SELECT lang, doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), per AS (
  SELECT lang, doc_id, count(*) AS nn,
         CAST(count(DISTINCT w) AS BIGINT) AS v
  FROM toks WHERE len(w) > 0
  GROUP BY 1, 2
  HAVING count(*) >= 2 AND count(DISTINCT w) >= 2
), pts AS (
  SELECT lang,
         CAST(floor(ln(CAST(nn AS DOUBLE)) * 1e6 + {_OFF}) AS BIGINT)
           AS x6,
         CAST(floor(ln(CAST(v AS DOUBLE)) * 1e6 + {_OFF}) AS BIGINT)
           AS y6
  FROM per
), agg AS (
  SELECT lang, count(*) AS n,
         CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
         CAST(sum(x6 * y6) AS BIGINT) AS sxy,
         CAST(sum(x6 * x6) AS BIGINT) AS sxx,
         CAST(sum(y6 * y6) AS BIGINT) AS syy
  FROM pts GROUP BY 1
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * 1000000 + {_OFF}) AS BIGINT) AS c_e6,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / ((CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx)
                     * (CAST(n AS DOUBLE) * syy
                        - CAST(sy AS DOUBLE) * sy))
                  * 1000000 + {_OFF}) AS BIGINT) AS r2_e6
FROM agg
WHERE n >= 3
  AND CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
  AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# mark_gap_corr — marked-point-process mark/gap correlation per type
# ---------------------------------------------------------------------------
# In marked point process terms (Daley & Vere-Jones): does the mark
# (event value) correlate with the preceding inter-event gap?
# Independence of marks and gaps is the standard null for "renewal
# with iid marks".  Gaps are exact integer seconds off one per-type
# lag window; Pearson r from exact BIGINT moment sums.


def q_mark_gap_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        )
        .cast("long")
        .alias("s"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wo = Window.partitionBy("event_type").orderBy("s", "event_id")
    d = ev.withColumn("g", F.col("s") - F.lag("s").over(wo)).filter(
        F.col("g").isNotNull()
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum("g").alias("sg"),
        F.sum(F.col("v") * F.col("g")).alias("svg"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("svg").cast("double") - F.col("sv").cast(
        "double"
    ) * F.col("sg").cast("double")
    dv = nd * F.col("svv").cast("double") - F.col("sv").cast(
        "double"
    ) * F.col("sv").cast("double")
    dg = nd * F.col("sgg").cast("double") - F.col("sg").cast(
        "double"
    ) * F.col("sg").cast("double")
    r = num / F.sqrt(dv * dg)
    return (
        agg.filter((F.col("n") >= 3) & (dv > 0) & (dg > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_gaps"),
            F.floor(
                F.col("sg").cast("double") / F.col("n") * 100 + F.lit(_OFF)
            )
            .cast("long")
            .alias("mean_gap_e2"),
            F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "r_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_MARK_GAP = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), d AS (
  SELECT event_type, v,
         s - lag(s) OVER (PARTITION BY event_type
                          ORDER BY s, event_id) AS g
  FROM ev
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS sv, CAST(sum(g) AS BIGINT) AS sg,
         CAST(sum(v * g) AS BIGINT) AS svg,
         CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(g * g) AS BIGINT) AS sgg
  FROM d WHERE g IS NOT NULL
  GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST(floor(CAST(sg AS DOUBLE) / n * 100 + {_OFF}) AS BIGINT)
         AS mean_gap_e2,
       CAST(floor((CAST(n AS DOUBLE) * svg - CAST(sv AS DOUBLE) * sg)
                  / sqrt((CAST(n AS DOUBLE) * svv
                          - CAST(sv AS DOUBLE) * sv)
                         * (CAST(n AS DOUBLE) * sgg
                            - CAST(sg AS DOUBLE) * sg))
                  * 1000000 + {_OFF}) AS BIGINT) AS r_e6
FROM agg
WHERE n >= 3
  AND CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv > 0
  AND CAST(n AS DOUBLE) * sgg - CAST(sg AS DOUBLE) * sg > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# ecological_corr — Simpson's-paradox audit: pooled vs within vs between
# ---------------------------------------------------------------------------
# Robinson (ASR 1950): the correlation of hour-of-day and value can
# differ between the pooled rows, the within-user centered rows, and
# the between-user means (the ecological fallacy).  Pooled and
# between moments ride exact BIGINTs (user means e6-floored before
# the between sums); the within covariance/variances fold per-user
# exact-rational contributions e6-floored per user.


def q_ecological_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            % 24
        )
        .cast("long")
        .alias("x"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("y"),
    )
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def wscale(expr, s):
        # e2 for the within moments and the y mean, e4 for the x mean —
        # anything finer overflows BIGINT in the between cross-moments
        # (my at e6 is ~5e10; squared-sum over users would pass 9e18)
        return F.floor(expr * s + F.lit(_OFF)).cast("long")

    nd = F.col("n").cast("double")
    within = per.select(
        wscale(
            (
                F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy") / nd
            ),
            100,
        ).alias("wxy6"),
        wscale(
            (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx") / nd
            ),
            100,
        ).alias("wxx6"),
        wscale(
            (
                F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy") / nd
            ),
            100,
        ).alias("wyy6"),
        wscale(F.col("sx").cast("double") / nd, 10_000).alias("mx6"),
        wscale(F.col("sy").cast("double") / nd, 100).alias("my6"),
    )
    tot = within.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("wxy6").alias("wxy"),
        F.sum("wxx6").alias("wxx"),
        F.sum("wyy6").alias("wyy"),
        F.sum("mx6").alias("bmx"),
        F.sum("my6").alias("bmy"),
        F.sum(F.col("mx6") * F.col("my6")).alias("bxy"),
        F.sum(F.col("mx6") * F.col("mx6")).alias("bxx"),
        F.sum(F.col("my6") * F.col("my6")).alias("byy"),
    )
    pool = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    j = pool.crossJoin(F.broadcast(tot))
    npd = F.col("n").cast("double")
    pnum = npd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    pdx = npd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    pdy = npd * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    r_pool = pnum / F.sqrt(pdx * pdy)
    r_within = F.col("wxy").cast("double") / F.sqrt(
        F.col("wxx").cast("double") * F.col("wyy").cast("double")
    )
    kd = F.col("k").cast("double")
    bnum = kd * F.col("bxy").cast("double") - F.col("bmx").cast(
        "double"
    ) * F.col("bmy").cast("double")
    bdx = kd * F.col("bxx").cast("double") - F.col("bmx").cast(
        "double"
    ) * F.col("bmx").cast("double")
    bdy = kd * F.col("byy").cast("double") - F.col("bmy").cast(
        "double"
    ) * F.col("bmy").cast("double")
    r_between = bnum / F.sqrt(bdx * bdy)
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("n_users"),
        F.floor(r_pool * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "r_pooled_e6"
        ),
        F.floor(r_within * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "r_within_e6"
        ),
        F.floor(r_between * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "r_between_e6"
        ),
    )


SQL_ECOLOGICAL = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS x,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS y
  FROM events
), per AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM ev GROUP BY 1
), within AS (
  SELECT
    CAST(floor((CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * sy / n) * 100 + {_OFF})
         AS BIGINT) AS wxy6,
    CAST(floor((CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * sx / n) * 100 + {_OFF})
         AS BIGINT) AS wxx6,
    CAST(floor((CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * sy / n) * 100 + {_OFF})
         AS BIGINT) AS wyy6,
    CAST(floor(CAST(sx AS DOUBLE) / n * 10000 + {_OFF}) AS BIGINT)
      AS mx6,
    CAST(floor(CAST(sy AS DOUBLE) / n * 100 + {_OFF}) AS BIGINT)
      AS my6
  FROM per
), tot AS (
  SELECT count(*) AS k,
         CAST(sum(wxy6) AS BIGINT) AS wxy,
         CAST(sum(wxx6) AS BIGINT) AS wxx,
         CAST(sum(wyy6) AS BIGINT) AS wyy,
         CAST(sum(mx6) AS BIGINT) AS bmx,
         CAST(sum(my6) AS BIGINT) AS bmy,
         CAST(sum(mx6 * my6) AS BIGINT) AS bxy,
         CAST(sum(mx6 * mx6) AS BIGINT) AS bxx,
         CAST(sum(my6 * my6) AS BIGINT) AS byy
  FROM within
), pool AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM ev
)
SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_users,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / sqrt((CAST(n AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx)
                         * (CAST(n AS DOUBLE) * syy
                            - CAST(sy AS DOUBLE) * sy))
                  * 1000000 + {_OFF}) AS BIGINT) AS r_pooled_e6,
       CAST(floor(CAST(wxy AS DOUBLE)
                  / sqrt(CAST(wxx AS DOUBLE) * CAST(wyy AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS r_within_e6,
       CAST(floor((CAST(k AS DOUBLE) * bxy - CAST(bmx AS DOUBLE) * bmy)
                  / sqrt((CAST(k AS DOUBLE) * bxx
                          - CAST(bmx AS DOUBLE) * bmx)
                         * (CAST(k AS DOUBLE) * byy
                            - CAST(bmy AS DOUBLE) * bmy))
                  * 1000000 + {_OFF}) AS BIGINT) AS r_between_e6
FROM pool CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# zipf_mandelbrot — Zipf-Mandelbrot rank-frequency fit per language
# ---------------------------------------------------------------------------
# Mandelbrot (1953) generalizes Zipf with a rank offset: f(r) ~
# (r + beta)^-s.  beta is chosen from the literal grid {0, 1, 2, 5,
# 10} by best OLS R^2 of ln f on ln(r + beta) over the top-100 ranks
# (deterministic grid search — no iterative optimizer), tie-break
# smallest beta.  Ranks ride WindowGroupLimit; per-point lns are
# e6-floored so all regression sums are exact BIGINTs.


_ZM_BETAS = [0, 1, 2, 5, 10]
_ZM_TOP = 100


def q_zipf_mandelbrot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    freq = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("f"))
    wr = Window.partitionBy("lang").orderBy(
        F.col("f").desc(), F.col("w").asc()
    )
    top = freq.withColumn("r", F.row_number().over(wr)).filter(
        F.col("r") <= _ZM_TOP
    )
    pts = top.crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [(b,) for b in _ZM_BETAS], "beta long"
            )
        )
    ).select(
        "lang",
        "beta",
        F.floor(
            F.log((F.col("r") + F.col("beta")).cast("double")) * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("x6"),
        F.floor(F.log(F.col("f").cast("double")) * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("y6"),
    )
    agg = pts.groupBy("lang", "beta").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").alias("sx"),
        F.sum("y6").alias("sy"),
        F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
        F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
        F.sum(F.col("y6") * F.col("y6")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    dx = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    dy = nd * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    scored = agg.filter((dx > 0) & (dy > 0)).select(
        "lang",
        "beta",
        F.col("n"),
        (-num / dx).alias("s"),
        (num * num / (dx * dy)).alias("r2"),
    )
    wb = Window.partitionBy("lang").orderBy(
        F.col("r2").desc(), F.col("beta").asc()
    )
    best = scored.withColumn("rk", F.row_number().over(wb)).filter(
        F.col("rk") == 1
    )
    return best.select(
        "lang",
        F.col("n").cast("long").alias("n_ranks"),
        F.col("beta").cast("long").alias("beta"),
        F.floor(F.col("s") * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "s_e6"
        ),
        F.floor(F.col("r2") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("r2_e6"),
    ).orderBy("lang")


SQL_ZIPF_MANDELBROT = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), freq AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS f
  FROM toks WHERE len(w) > 0 GROUP BY 1, 2
), top AS (
  SELECT lang, f,
         row_number() OVER (PARTITION BY lang
                            ORDER BY f DESC, w ASC) AS r
  FROM freq QUALIFY r <= {_ZM_TOP}
), pts AS (
  SELECT lang, beta,
         CAST(floor(ln(CAST(r + beta AS DOUBLE)) * 1e6 + {_OFF})
              AS BIGINT) AS x6,
         CAST(floor(ln(CAST(f AS DOUBLE)) * 1e6 + {_OFF}) AS BIGINT)
           AS y6
  FROM top CROSS JOIN
       (SELECT unnest([{", ".join(str(b) for b in _ZM_BETAS)}])
          AS beta)
), agg AS (
  SELECT lang, beta, count(*) AS n,
         CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
         CAST(sum(x6 * y6) AS BIGINT) AS sxy,
         CAST(sum(x6 * x6) AS BIGINT) AS sxx,
         CAST(sum(y6 * y6) AS BIGINT) AS syy
  FROM pts GROUP BY 1, 2
), scored AS (
  SELECT lang, beta, n,
         -(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS s,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           AS r2
  FROM agg
  WHERE CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
    AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
), best AS (
  SELECT lang, n, beta, s, r2,
         row_number() OVER (PARTITION BY lang
                            ORDER BY r2 DESC, beta ASC) AS rk
  FROM scored
)
SELECT lang, CAST(n AS BIGINT) AS n_ranks, CAST(beta AS BIGINT) AS beta,
       CAST(floor(s * 1000000 + {_OFF}) AS BIGINT) AS s_e6,
       CAST(floor(r2 * 1000000 + {_OFF}) AS BIGINT) AS r2_e6
FROM best WHERE rk = 1
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# ad_ksample — k-sample Anderson-Darling across event types
# ---------------------------------------------------------------------------
# Scholz & Stephens (JASA 1987), the midrank (ties) version scipy
# ships as ``anderson_ksamp``: A2akN over the k = |types| value
# samples, standardized by the exact variance polynomial in (N, k, H,
# h, g).  Everything heavy rides the centivalue DOMAIN: with 2x-scaled
# midrank cumulatives M2/B2 the per-(sample, value) term is l (N M2 -
# n_i B2)^2 / (B2 (2N - B2) - N l) — exact integers e6-floored per
# cell before the sums.  The harmonic ladders h and g fold an
# e6-quantized 1/i table (exact prefix-sum integers; the statistic is
# defined on that quantized ladder by contract, error < 1e-4 at the
# driver scales).


def q_ad_ksample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cell = ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("fij")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    lj = cell.groupBy("v").agg(F.sum("fij").alias("l"))
    lj = lj.withColumn(
        "b2", 2 * F.coalesce(F.sum("l").over(wv), F.lit(0)) + F.col("l")
    )
    wall = Window.partitionBy()
    lj = lj.withColumn("nn", F.sum("l").over(wall))
    ni = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("ni"))
    # cells where f_ij = 0 still matter in the exact formula — the
    # full sample x value grid comes from a cross join of the (small)
    # per-sample table with the value domain
    grid = ni.crossJoin(lj.select("v", "l", "b2", "nn"))
    mfull = grid.join(
        cell, ["event_type", "v"], "left"
    ).fillna(0, ["fij"])
    wiv2 = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mfull = mfull.withColumn(
        "m2",
        2 * F.coalesce(F.sum("fij").over(wiv2), F.lit(0)) + F.col("fij"),
    )
    tfull = (
        mfull.withColumn(
            "dd",
            F.col("nn") * F.col("m2") - F.col("ni") * F.col("b2"),
        )
        .withColumn(
            "den",
            F.col("b2") * (2 * F.col("nn") - F.col("b2"))
            - F.col("nn") * F.col("l"),
        )
        .filter(F.col("den") > 0)
        .withColumn(
            "t6",
            F.floor(
                F.col("l").cast("double")
                * F.col("dd").cast("double")
                * F.col("dd").cast("double")
                / F.col("den")
                * 1e6
                + F.lit(_OFF)
            ).cast("long"),
        )
    )
    inner = tfull.groupBy("event_type").agg(
        F.max("ni").alias("ni"),
        F.max("nn").alias("nn"),
        F.sum("t6").alias("s6"),
    )
    # A2akN = (N-1)/N * sum_i s_i / n_i (s back from the e6 scale);
    # per-sample terms <= |types| doubles (anova discipline)
    contrib = inner.select(
        "nn",
        (
            F.col("s6").cast("double")
            / 1e6
            / F.col("ni").cast("double")
        ).alias("ci"),
    )
    a2 = contrib.groupBy("nn").agg(
        F.count(F.lit(1)).alias("k"), F.sum("ci").alias("sci")
    )
    # harmonic ladders on the e6-quantized 1/i table; the Scholz-
    # Stephens g = sum_{k=2}^{N-1} (1/k) sum_{j=N+1-k}^{N-1} 1/j is
    # re-indexed as sum over i = N+1-k of u6(i) * suffix-sum R(i)
    hh = (
        a2.select("nn", "k", "sci")
        .withColumn(
            "i", F.explode(F.sequence(F.lit(1), F.col("nn") - 1))
        )
        .withColumn("t6", F.floor(1e6 / F.col("i")).cast("long"))
    )
    wi = Window.partitionBy("nn").orderBy("i")
    hh = hh.withColumn(
        "rsuf",
        F.sum("t6").over(wi.rowsBetween(0, Window.unboundedFollowing)),
    )
    u6 = F.floor(1e6 / (F.col("nn") + 1 - F.col("i"))).cast("long")
    gterm = F.when(
        F.col("i") >= 2,
        F.floor(
            u6.cast("double")
            * F.col("rsuf").cast("double")
            / 1e12
            * 1e9
            + F.lit(_OFF)
        ).cast("long"),
    ).otherwise(F.lit(0))
    lad = hh.groupBy("nn", "k", "sci").agg(
        F.sum("t6").alias("h6"),
        F.sum(gterm).alias("g9"),
    )
    ninv = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ni")
    ).agg(
        F.sum(F.floor(1e6 / F.col("ni")).cast("long")).alias("hcap6")
    )
    j = lad.crossJoin(F.broadcast(ninv))
    nd = F.col("nn").cast("double")
    kd = F.col("k").cast("double")
    hbig = F.col("hcap6").cast("double") / 1e6
    hsm = F.col("h6").cast("double") / 1e6
    g = F.col("g9").cast("double") / 1e9
    a = (4.0 * g - 6.0) * (kd - 1.0) + (10.0 - 6.0 * g) * hbig
    b = (2.0 * g - 4.0) * kd * kd + 8.0 * hsm * kd + (
        2.0 * g - 14.0 * hsm - 4.0
    ) * hbig - 8.0 * hsm + 4.0 * g - 6.0
    c = (6.0 * hsm + 2.0 * g - 2.0) * kd * kd + (
        4.0 * hsm - 4.0 * g + 6.0
    ) * kd + (2.0 * hsm - 6.0) * hbig + 4.0 * hsm
    dterm = (2.0 * hsm + 6.0) * kd * kd - 4.0 * hsm * kd
    var = (
        a * nd * nd * nd + b * nd * nd + c * nd + dterm
    ) / ((nd - 1.0) * (nd - 2.0) * (nd - 3.0))
    # the scipy inner term is (l_j / N) * D^2 / den — the domain sums
    # above carry l_j, so one more /N lands here
    a2akn = (nd - 1.0) / nd * F.col("sci") / nd
    tn = (a2akn - (kd - 1.0)) / F.sqrt(var)
    return j.select(
        F.col("nn").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.floor(a2akn * 10_000 + F.lit(_OFF)).cast("long").alias(
            "a2_e4"
        ),
        F.floor(tn * 10_000 + F.lit(_OFF)).cast("long").alias("tn_e4"),
    )


SQL_AD_KSAMPLE = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cell AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS fij
  FROM ev GROUP BY 1, 2
), lj AS (
  SELECT v, CAST(sum(fij) AS BIGINT) AS l FROM cell GROUP BY 1
), lj2 AS (
  SELECT v, l,
         2 * COALESCE(CAST(sum(l) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS BIGINT), 0) + l AS b2,
         CAST(sum(l) OVER () AS BIGINT) AS nn
  FROM lj
), ni AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS ni FROM ev GROUP BY 1
), grid AS (
  SELECT ni.event_type, ni.ni, lj2.v, lj2.l, lj2.b2, lj2.nn,
         COALESCE(cell.fij, 0) AS fij
  FROM ni CROSS JOIN lj2
  LEFT JOIN cell ON cell.event_type = ni.event_type
               AND cell.v = lj2.v
), m AS (
  SELECT event_type, ni, v, l, b2, nn, fij,
         2 * COALESCE(CAST(sum(fij) OVER (PARTITION BY event_type
             ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING) AS BIGINT), 0) + fij AS m2
  FROM grid
), t AS (
  SELECT event_type, ni, nn,
         CAST(floor(CAST(l AS DOUBLE)
                    * CAST(nn * m2 - ni * b2 AS DOUBLE)
                    * CAST(nn * m2 - ni * b2 AS DOUBLE)
                    / (b2 * (2 * nn - b2) - nn * l) * 1e6 + {_OFF})
              AS BIGINT) AS t6
  FROM m
  WHERE b2 * (2 * nn - b2) - nn * l > 0
), inner_ AS (
  SELECT event_type, max(ni) AS ni, max(nn) AS nn,
         CAST(sum(t6) AS BIGINT) AS s6
  FROM t GROUP BY 1
), a2 AS (
  SELECT nn, count(*) AS k,
         sum(CAST(s6 AS DOUBLE) / 1e6 / ni) AS sci
  FROM inner_ GROUP BY 1
), ladder AS (
  SELECT a2.nn, a2.k, a2.sci,
         i, CAST(floor(1e6 / i) AS BIGINT) AS t6
  FROM a2, unnest(generate_series(1, CAST(a2.nn - 1 AS INTEGER))) AS s(i)
), lad2 AS (
  SELECT nn, k, sci, i, t6,
         CAST(sum(t6) OVER (PARTITION BY nn ORDER BY i
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS rsuf
  FROM ladder
), lad3 AS (
  SELECT nn, k, sci,
         CAST(sum(t6) AS BIGINT) AS h6,
         CAST(sum(CASE WHEN i >= 2 THEN
             CAST(floor(CAST(CAST(floor(1e6 / (nn + 1 - i)) AS BIGINT)
                             AS DOUBLE)
                        * CAST(rsuf AS DOUBLE)
                        / 1e12 * 1e9 + {_OFF}) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS g9
  FROM lad2 GROUP BY 1, 2, 3
), hcap AS (
  SELECT CAST(sum(CAST(floor(1e6 / ni) AS BIGINT)) AS BIGINT) AS hcap6
  FROM ni
), fin AS (
  SELECT nn, k, sci,
         CAST(h6 AS DOUBLE) / 1e6 AS hsm,
         CAST(g9 AS DOUBLE) / 1e9 AS g,
         CAST(hcap6 AS DOUBLE) / 1e6 AS hbig
  FROM lad3 CROSS JOIN hcap
)
SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       CAST(floor((nn - 1.0) / nn * sci / nn * 10000 + {_OFF})
            AS BIGINT) AS a2_e4,
       CAST(floor(((nn - 1.0) / nn * sci / nn - (k - 1.0))
                  / sqrt((((4.0 * g - 6.0) * (k - 1.0)
                           + (10.0 - 6.0 * g) * hbig) * nn * nn * nn
                          + ((2.0 * g - 4.0) * k * k + 8.0 * hsm * k
                             + (2.0 * g - 14.0 * hsm - 4.0) * hbig
                             - 8.0 * hsm + 4.0 * g - 6.0) * nn * nn
                          + ((6.0 * hsm + 2.0 * g - 2.0) * k * k
                             + (4.0 * hsm - 4.0 * g + 6.0) * k
                             + (2.0 * hsm - 6.0) * hbig + 4.0 * hsm)
                            * nn
                          + ((2.0 * hsm + 6.0) * k * k
                             - 4.0 * hsm * k))
                         / ((nn - 1.0) * (nn - 2.0) * (nn - 3.0)))
                  * 10000 + {_OFF}) AS BIGINT) AS tn_e4
FROM fin
"""


# ---------------------------------------------------------------------------
# negbin_fit — negative-binomial method-of-moments fit per type
# ---------------------------------------------------------------------------
# The standard overdispersed-count model: with per-user totals x_u
# (zeros included via the distinct-user grid), MoM gives p = m/s^2,
# r = m^2/(s^2 - m); the implied skewness (2 - p)/sqrt(r(1 - p)) is
# compared against the observed third-moment skewness — a one-pass
# lack-of-fit signal beyond poisson_dispersion.  Power sums exact
# BIGINT; sample variance/skewness closed forms at the end.


def q_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    agg = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
    )
    nd = F.col("n").cast("double")
    m = F.col("s1").cast("double") / nd
    s2 = (
        F.col("s2").cast("double") - nd * m * m
    ) / (nd - 1.0)
    m3 = (
        F.col("s3").cast("double")
        - 3.0 * m * F.col("s2").cast("double")
        + 2.0 * nd * m * m * m
    ) / nd
    skew_obs = m3 / F.sqrt(
        ((F.col("s2").cast("double") - nd * m * m) / nd)
        * ((F.col("s2").cast("double") - nd * m * m) / nd)
        * ((F.col("s2").cast("double") - nd * m * m) / nd)
    )
    p = m / s2
    r = m * m / (s2 - m)
    skew_imp = (2.0 - p) / F.sqrt(r * (1.0 - p))
    return (
        agg.filter(
            (F.col("n") >= 3)
            & (s2 > m)
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_users"),
            F.floor(m * 10_000 + F.lit(_OFF)).cast("long").alias(
                "mean_e4"
            ),
            F.floor(s2 / m * 10_000 + F.lit(_OFF)).cast("long").alias(
                "dispersion_e4"
            ),
            F.floor(r * 10_000 + F.lit(_OFF)).cast("long").alias("r_e4"),
            F.floor(p * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "p_e6"
            ),
            F.floor(skew_obs * 10_000 + F.lit(_OFF)).cast("long").alias(
                "skew_obs_e4"
            ),
            F.floor(skew_imp * 10_000 + F.lit(_OFF)).cast("long").alias(
                "skew_nb_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_NEGBIN = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
types AS (SELECT DISTINCT event_type FROM events),
per AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, u.user_id, COALESCE(per.x, 0) AS x
  FROM types t CROSS JOIN users u
  LEFT JOIN per ON per.event_type = t.event_type
              AND per.user_id = u.user_id
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(sum(x * x) AS BIGINT) AS s2,
         CAST(sum(x * x * x) AS BIGINT) AS s3
  FROM grid GROUP BY 1
), mom AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS m,
         CAST(s2 AS DOUBLE) AS r2, CAST(s3 AS DOUBLE) AS r3,
         CAST(n AS DOUBLE) AS nd
  FROM agg
), fit AS (
  SELECT event_type, n, m,
         (r2 - nd * m * m) / (nd - 1.0) AS s2v,
         (r3 - 3.0 * m * r2 + 2.0 * nd * m * m * m) / nd AS m3,
         (r2 - nd * m * m) / nd AS m2
  FROM mom
)
SELECT event_type, CAST(n AS BIGINT) AS n_users,
       CAST(floor(m * 10000 + {_OFF}) AS BIGINT) AS mean_e4,
       CAST(floor(s2v / m * 10000 + {_OFF}) AS BIGINT)
         AS dispersion_e4,
       CAST(floor(m * m / (s2v - m) * 10000 + {_OFF}) AS BIGINT)
         AS r_e4,
       CAST(floor(m / s2v * 1000000 + {_OFF}) AS BIGINT) AS p_e6,
       CAST(floor(m3 / sqrt(m2 * m2 * m2) * 10000 + {_OFF}) AS BIGINT)
         AS skew_obs_e4,
       CAST(floor((2.0 - m / s2v)
                  / sqrt((m * m / (s2v - m)) * (1.0 - m / s2v))
                  * 10000 + {_OFF}) AS BIGINT) AS skew_nb_e4
FROM fit
WHERE n >= 3 AND s2v > m
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# kupiec_pof — VaR proportion-of-failures backtest per type
# ---------------------------------------------------------------------------
# Kupiec (J. Derivatives 1995): the likelihood-ratio test that the
# (ln 0.95 / ln 0.05 enter BOTH engines as the same Python-computed
# literals — the zero-libm discipline)
# observed VaR breach rate matches the nominal p = 5%.  The VaR
# threshold is the exact lower 5th percentile of FIRST-half daily
# counts (domain-cumulative pick, day-midpoint split); breaches are
# exact counts on the second half; LR closed form with the x = 0
# limit handled by contract.


_LN95 = _math.log(0.95)
_LN05 = _math.log(0.05)


def q_kupiec_pof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wt = Window.partitionBy("event_type")
    d = (
        daily.withColumn("d0", F.min("day").over(wt))
        .withColumn("d1", F.max("day").over(wt))
        .withColumn(
            "late",
            (
                2 * (F.col("day") - F.col("d0"))
                > (F.col("d1") - F.col("d0"))
            ).cast("long"),
        )
    )
    early = d.filter(F.col("late") == 0)
    dom = early.groupBy("event_type", "y").agg(
        F.count(F.lit(1)).alias("c")
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtd = Window.partitionBy("event_type")
    dom = dom.withColumn("cc", F.sum("c").over(wo)).withColumn(
        "m", F.sum("c").over(wtd)
    )
    var_t = (
        dom.filter(F.col("cc") * 20 >= F.col("m"))
        .groupBy("event_type")
        .agg(F.min("y").alias("var_y"))
    )
    late = d.filter(F.col("late") == 1).join(
        F.broadcast(var_t), "event_type"
    )
    agg = late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("var_y").alias("var_y"),
        F.sum((F.col("y") < F.col("var_y")).cast("long")).alias("x"),
    )
    nd = F.col("n").cast("double")
    xd = F.col("x").cast("double")
    l1p = _LN95
    lp = _LN05
    lr = -2.0 * (
        (nd - xd) * l1p
        + xd * lp
        - F.when(
            F.col("x") < F.col("n"),
            (nd - xd) * F.log(1.0 - xd / nd),
        ).otherwise(F.lit(0.0))
        - F.when(F.col("x") > 0, xd * F.log(xd / nd)).otherwise(
            F.lit(0.0)
        )
    )
    return (
        agg.filter(F.col("n") >= 4)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("var_y").cast("long").alias("var_threshold"),
            F.col("x").cast("long").alias("n_breaches"),
            F.floor(lr * 10_000 + F.lit(_OFF)).cast("long").alias(
                "lr_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_KUPIEC = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day, y,
         CASE WHEN 2 * (day - min(day) OVER (PARTITION BY event_type))
                   > max(day) OVER (PARTITION BY event_type)
                     - min(day) OVER (PARTITION BY event_type)
              THEN 1 ELSE 0 END AS late
  FROM daily
), dom AS (
  SELECT event_type, y, CAST(count(*) AS BIGINT) AS c
  FROM d WHERE late = 0 GROUP BY 1, 2
), cum AS (
  SELECT event_type, y,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY y)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS m
  FROM dom
), var_t AS (
  SELECT event_type, min(y) AS var_y
  FROM cum WHERE cc * 20 >= m GROUP BY 1
), agg AS (
  SELECT d.event_type, count(*) AS n, max(var_y) AS var_y,
         CAST(sum(CASE WHEN y < var_y THEN 1 ELSE 0 END) AS BIGINT)
           AS x
  FROM d JOIN var_t ON var_t.event_type = d.event_type
  WHERE late = 1
  GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, var_y AS var_threshold,
       x AS n_breaches,
       CAST(floor(-2.0 * (
           (n - CAST(x AS DOUBLE)) * ({_LN95!r})
           + CAST(x AS DOUBLE) * ({_LN05!r})
           - CASE WHEN x < n THEN (n - CAST(x AS DOUBLE))
                                  * ln(1.0 - CAST(x AS DOUBLE) / n)
                  ELSE 0.0 END
           - CASE WHEN x > 0 THEN CAST(x AS DOUBLE)
                                  * ln(CAST(x AS DOUBLE) / n)
                  ELSE 0.0 END)
           * 10000 + {_OFF}) AS BIGINT) AS lr_e4
FROM agg
WHERE n >= 4
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# sprt_conversion — Wald SPRT trace on the daily purchase share
# ---------------------------------------------------------------------------
# Wald (1945): the sequential test of p0 = 0.04 vs p1 = 0.06 on the
# purchase share, replayed over days — cumulative LLR_d = sum x ln
# (p1/p0) + (n - x) ln((1-p1)/(1-p0)) against the +-ln 19 boundaries
# (alpha = beta = 0.05).  Counts exact; both ln factors enter BOTH
# engines as the same Python literals (zero-libm); the cumulative is
# an exact scaled-integer window over the ~|days| domain.


_SPRT_LR1 = _math.log(0.06 / 0.04)
_SPRT_LR0 = _math.log(0.94 / 0.96)
_SPRT_BOUND = _math.log(19.0)


def q_sprt_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "x"
        ),
    )
    # per-day LLR e9-floored to BIGINT so the cumulative is exact
    llr9 = F.floor(
        (
            F.col("x").cast("double") * _SPRT_LR1
            + (F.col("n") - F.col("x")).cast("double") * _SPRT_LR0
        )
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    d = daily.withColumn("llr9", llr9)
    wo = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    d = d.withColumn("cum9", F.sum("llr9").over(wo))
    bound9 = int(_SPRT_BOUND * 1e9)
    decision = (
        F.when(F.col("cum9") >= bound9, F.lit(1))
        .when(F.col("cum9") <= -bound9, F.lit(-1))
        .otherwise(F.lit(0))
    )
    return d.select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("x"),
        F.floor(F.col("cum9").cast("double") / 1000.0 + F.lit(_OFF))
        .cast("long")
        .alias("cum_llr_e6"),
        decision.cast("long").alias("decision"),
    ).orderBy("day")


SQL_SPRT = f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1
), d AS (
  SELECT day, n, x,
         CAST(floor((CAST(x AS DOUBLE) * ({_SPRT_LR1!r})
                     + CAST(n - x AS DOUBLE) * ({_SPRT_LR0!r}))
                    * 1e9 + {_OFF}) AS BIGINT) AS llr9
  FROM daily
), c AS (
  SELECT day, n, x,
         CAST(sum(llr9) OVER (ORDER BY day) AS BIGINT) AS cum9
  FROM d
)
SELECT day, n, x,
       CAST(floor(CAST(cum9 AS DOUBLE) / 1000.0 + {_OFF}) AS BIGINT)
         AS cum_llr_e6,
       CAST(CASE WHEN cum9 >= {int(_SPRT_BOUND * 1e9)} THEN 1
                 WHEN cum9 <= -{int(_SPRT_BOUND * 1e9)} THEN -1
                 ELSE 0 END AS BIGINT) AS decision
FROM c
ORDER BY day
"""


# ---------------------------------------------------------------------------
# good_turing_counts — Katz/Good-Turing adjusted counts per language
# ---------------------------------------------------------------------------
# Good (Biometrika 1953): r* = (r+1) N_{{r+1}} / N_r re-estimates the
# probability mass of words seen r times (r <= 5, the Katz cutoff) —
# the count-table companion to good_toulmin (which estimates unseen
# MASS under corpus growth).  Pure exact-integer frequency-of-
# frequencies table; doubles only in the final two ratios.


def q_good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    freq = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("m"))
    nr = freq.groupBy("lang", "m").agg(F.count(F.lit(1)).alias("nr"))
    tot = freq.groupBy("lang").agg(F.sum("m").alias("nn"))
    nxt = nr.select(
        "lang", (F.col("m") - 1).alias("m"), F.col("nr").alias("nr1")
    )
    j = (
        nr.join(nxt, ["lang", "m"], "left")
        .join(tot, "lang")
        .filter((F.col("m") >= 1) & (F.col("m") <= 5))
        .fillna(0, ["nr1"])
    )
    rstar = (F.col("m") + 1).cast("double") * F.col("nr1") / F.col("nr")
    return j.select(
        "lang",
        F.col("m").cast("long").alias("r"),
        F.col("nr").cast("long").alias("n_r"),
        F.col("nr1").cast("long").alias("n_r1"),
        F.floor(rstar * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "r_star_e6"
        ),
        F.floor(
            rstar / F.col("nn").cast("double") * 1e9 + F.lit(_OFF)
        )
        .cast("long")
        .alias("p_star_e9"),
    ).orderBy("lang", "r")


SQL_GOOD_TURING = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), freq AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS m
  FROM toks WHERE len(w) > 0 GROUP BY 1, 2
), nr AS (
  SELECT lang, m, CAST(count(*) AS BIGINT) AS nr
  FROM freq GROUP BY 1, 2
), tot AS (
  SELECT lang, CAST(sum(m) AS BIGINT) AS nn FROM freq GROUP BY 1
), j AS (
  SELECT a.lang, a.m, a.nr, COALESCE(b.nr, 0) AS nr1, tot.nn
  FROM nr a
  LEFT JOIN nr b ON b.lang = a.lang AND b.m = a.m + 1
  JOIN tot ON tot.lang = a.lang
  WHERE a.m BETWEEN 1 AND 5
)
SELECT lang, m AS r, nr AS n_r, nr1 AS n_r1,
       CAST(floor(CAST(m + 1 AS DOUBLE) * nr1 / nr * 1000000 + {_OFF})
            AS BIGINT) AS r_star_e6,
       CAST(floor(CAST(m + 1 AS DOUBLE) * nr1 / nr / nn * 1e9 + {_OFF})
            AS BIGINT) AS p_star_e9
FROM j
ORDER BY lang, r
"""


# ---------------------------------------------------------------------------
# dunning_llr — log-likelihood-ratio keyness per source (top 5)
# ---------------------------------------------------------------------------
# Dunning (Comp. Ling. 1993): G^2 = 2 [a ln(a/E1) + b ln(b/E2)]
# flags terms over-represented in one source vs the rest — the
# significance-calibrated companion to log_odds_terms.  Counts exact;
# expectations are rationals of exact integers; 0 ln 0 = 0 by the
# standard convention; top-5 per source through WindowGroupLimit with
# (G^2 desc, term asc) tie-break.


def q_dunning_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("a"))
    wterm = Window.partitionBy("w")
    wall = Window.partitionBy()
    wsrc = Window.partitionBy("source")
    d = (
        cnt.withColumn("tw", F.sum("a").over(wterm))
        .withColumn("n1", F.sum("a").over(wsrc))
        .withColumn("nn", F.sum("a").over(wall))
        .withColumn("b", F.col("tw") - F.col("a"))
        .withColumn("n2", F.col("nn") - F.col("n1"))
    )
    e1 = F.col("tw").cast("double") * F.col("n1") / F.col("nn")
    e2 = F.col("tw").cast("double") * F.col("n2") / F.col("nn")
    g2 = 2.0 * (
        F.when(
            F.col("a") > 0,
            F.col("a").cast("double")
            * F.log(F.col("a").cast("double") / e1),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("b") > 0,
            F.col("b").cast("double")
            * F.log(F.col("b").cast("double") / e2),
        ).otherwise(F.lit(0.0))
    )
    scored = d.withColumn(
        "g2_e4", F.floor(g2 * 10_000 + F.lit(_OFF)).cast("long")
    ).filter(F.col("a").cast("double") > e1)
    wr = Window.partitionBy("source").orderBy(
        F.col("g2_e4").desc(), F.col("w").asc()
    )
    top = scored.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 5
    )
    return top.select(
        "source",
        F.col("rk").cast("long").alias("rank"),
        F.col("w").alias("term"),
        F.col("a").cast("long").alias("count_in"),
        F.col("b").cast("long").alias("count_out"),
        "g2_e4",
    ).orderBy("source", "rank")


SQL_DUNNING = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), cnt AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS a
  FROM toks WHERE len(w) > 0 GROUP BY 1, 2
), d AS (
  SELECT source, w, a,
         CAST(sum(a) OVER (PARTITION BY w) AS BIGINT) AS tw,
         CAST(sum(a) OVER (PARTITION BY source) AS BIGINT) AS n1,
         CAST(sum(a) OVER () AS BIGINT) AS nn
  FROM cnt
), g AS (
  SELECT source, w, a, tw - a AS b, tw, n1, nn - n1 AS n2, nn,
         2.0 * (
           CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
                * ln(CAST(a AS DOUBLE)
                     / (CAST(tw AS DOUBLE) * n1 / nn)) ELSE 0.0 END
           + CASE WHEN tw - a > 0 THEN CAST(tw - a AS DOUBLE)
                  * ln(CAST(tw - a AS DOUBLE)
                       / (CAST(tw AS DOUBLE) * (nn - n1) / nn))
                  ELSE 0.0 END) AS g2
  FROM d
), scored AS (
  SELECT source, w, a, b,
         CAST(floor(g2 * 10000 + {_OFF}) AS BIGINT) AS g2_e4,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(floor(g2 * 10000 + {_OFF}) AS BIGINT) DESC,
                    w ASC) AS rk
  FROM g
  WHERE CAST(a AS DOUBLE) > CAST(tw AS DOUBLE) * n1 / nn
)
SELECT source, CAST(rk AS BIGINT) AS rank, w AS term,
       a AS count_in, b AS count_out, g2_e4
FROM scored
WHERE rk <= 5
ORDER BY source, rank
"""


# ---------------------------------------------------------------------------
# tukey_additivity — one-degree-of-freedom non-additivity test
# ---------------------------------------------------------------------------
# Tukey (Biometrics 1949): in the unreplicated DOW x hour count grid,
# SS_nonadd = [sum r_i c_j y_ij]^2 / (sum r_i^2 sum c_j^2) with 1 df
# against the interaction residual — the parametric complement to
# median_polish on the same two-way table.  Row/column effects ride
# the common x168 integer scale (R_i = 7 S_row - S, C_j = 24 S_col -
# S) so EVERY sum is exact BIGINT and the scale factors cancel in
# both SS ratios.


def q_tukey_additivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
            % 7
        )
        .cast("long")
        .alias("dow"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            % 24
        )
        .cast("long")
        .alias("hour"),
    )
    cnt = ev.groupBy("dow", "hour").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        spark.range(7)
        .select(F.col("id").alias("dow"))
        .crossJoin(spark.range(24).select(F.col("id").alias("hour")))
        .join(cnt, ["dow", "hour"], "left")
        .select(
            "dow", "hour", F.coalesce(F.col("c"), F.lit(0)).alias("y")
        )
    )
    wr = Window.partitionBy("dow")
    wc = Window.partitionBy("hour")
    wall = Window.partitionBy()
    g = (
        grid.withColumn("srow", F.sum("y").over(wr))
        .withColumn("scol", F.sum("y").over(wc))
        .withColumn("s", F.sum("y").over(wall))
        .withColumn("rr", 7 * F.col("srow") - F.col("s"))
        .withColumn("cc", 24 * F.col("scol") - F.col("s"))
    )
    agg = g.agg(
        F.sum(F.col("rr") * F.col("cc") * F.col("y")).alias("num"),
        F.sum(
            F.when(F.col("hour") == 0, F.col("rr") * F.col("rr"))
        ).alias("sr2"),
        F.sum(
            F.when(F.col("dow") == 0, F.col("cc") * F.col("cc"))
        ).alias("sc2"),
        F.sum(
            (
                168 * F.col("y")
                - F.col("s")
                - F.col("rr")
                - F.col("cc")
            )
            * (
                168 * F.col("y")
                - F.col("s")
                - F.col("rr")
                - F.col("cc")
            )
        ).alias("sres2"),
    )
    ss_nonadd = (
        F.col("num").cast("double") * F.col("num").cast("double")
    ) / (F.col("sr2").cast("double") * F.col("sc2").cast("double"))
    ss_resid = F.col("sres2").cast("double") / (168.0 * 168.0)
    df = (7 - 1) * (24 - 1) - 1
    fstat = ss_nonadd / ((ss_resid - ss_nonadd) / float(df))
    return agg.select(
        F.lit(168).cast("long").alias("n_cells"),
        F.floor(ss_nonadd * 100 + F.lit(_OFF)).cast("long").alias(
            "ss_nonadd_e2"
        ),
        F.floor(ss_resid * 100 + F.lit(_OFF)).cast("long").alias(
            "ss_resid_e2"
        ),
        F.floor(fstat * 10_000 + F.lit(_OFF)).cast("long").alias(
            "f_e4"
        ),
    )


SQL_TUKEY_ADD = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hour
  FROM events
), cnt AS (
  SELECT dow, hour, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), grid AS (
  SELECT d.dow, h.hour, COALESCE(c, 0) AS y
  FROM (SELECT unnest(generate_series(0, 6)) AS dow) d
  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hour) h
  LEFT JOIN cnt ON cnt.dow = d.dow AND cnt.hour = h.hour
), g AS (
  SELECT dow, hour, y,
         7 * CAST(sum(y) OVER (PARTITION BY dow) AS BIGINT)
           - CAST(sum(y) OVER () AS BIGINT) AS rr,
         24 * CAST(sum(y) OVER (PARTITION BY hour) AS BIGINT)
           - CAST(sum(y) OVER () AS BIGINT) AS cc,
         CAST(sum(y) OVER () AS BIGINT) AS s
  FROM grid
), agg AS (
  SELECT CAST(sum(rr * cc * y) AS BIGINT) AS num,
         CAST(sum(CASE WHEN hour = 0 THEN rr * rr END) AS BIGINT)
           AS sr2,
         CAST(sum(CASE WHEN dow = 0 THEN cc * cc END) AS BIGINT)
           AS sc2,
         CAST(sum((168 * y - s - rr - cc) * (168 * y - s - rr - cc))
              AS BIGINT) AS sres2
  FROM g
)
SELECT CAST(168 AS BIGINT) AS n_cells,
       CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                  / (CAST(sr2 AS DOUBLE) * CAST(sc2 AS DOUBLE))
                  * 100 + {_OFF}) AS BIGINT) AS ss_nonadd_e2,
       CAST(floor(CAST(sres2 AS DOUBLE) / (168.0 * 168.0) * 100
                  + {_OFF}) AS BIGINT) AS ss_resid_e2,
       CAST(floor((CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                   / (CAST(sr2 AS DOUBLE) * CAST(sc2 AS DOUBLE)))
                  / ((CAST(sres2 AS DOUBLE) / (168.0 * 168.0)
                      - CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                        / (CAST(sr2 AS DOUBLE) * CAST(sc2 AS DOUBLE)))
                     / {(7 - 1) * (24 - 1) - 1}.0)
                  * 10000 + {_OFF}) AS BIGINT) AS f_e4
FROM agg
"""


# ---------------------------------------------------------------------------
# gries_dp — Gries' deviation-of-proportions dispersion, top-10 terms
# ---------------------------------------------------------------------------
# Gries (IJCL 2008): DP = 0.5 sum_i |v_i - s_i| measures how evenly a
# term spreads over corpus parts (sources), weighting parts by size —
# the modern complement to juilland_d.  With the common denominator
# t_w N the deviation sum is the exact BIGINT sum |a_wi N - n_i t_w|;
# the top-10 term grid (term x all sources, zeros included) comes
# from a broadcast cross join.


def q_gries_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    toks = _documents(spark, sf_dir).select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("a"))
    tw = cnt.groupBy("w").agg(F.sum("a").alias("tw"))
    wr = Window.orderBy(F.col("tw").desc(), F.col("w").asc())
    top = tw.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 10
    )
    parts = cnt.groupBy("source").agg(F.sum("a").alias("np"))
    wall = Window.partitionBy()
    parts = parts.withColumn("nn", F.sum("np").over(wall))
    grid = (
        F.broadcast(top)
        .crossJoin(F.broadcast(parts))
        .join(cnt, ["source", "w"], "left")
        .fillna(0, ["a"])
    )
    dev = F.abs(
        F.col("a") * F.col("nn") - F.col("np") * F.col("tw")
    )
    agg = grid.groupBy("w", "rk", "tw", "nn").agg(
        F.sum(dev).alias("num")
    )
    dp = F.col("num").cast("double") / (
        2.0 * F.col("tw").cast("double") * F.col("nn")
    )
    return agg.select(
        F.col("rk").cast("long").alias("rank"),
        F.col("w").alias("term"),
        F.col("tw").cast("long").alias("total_count"),
        F.floor(dp * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "dp_e6"
        ),
    ).orderBy("rank")


SQL_GRIES_DP = f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), cnt AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS a
  FROM toks WHERE len(w) > 0 GROUP BY 1, 2
), tw AS (
  SELECT w, CAST(sum(a) AS BIGINT) AS tw FROM cnt GROUP BY 1
), top AS (
  SELECT w, tw,
         row_number() OVER (ORDER BY tw DESC, w ASC) AS rk
  FROM tw QUALIFY rk <= 10
), parts AS (
  SELECT source, CAST(sum(a) AS BIGINT) AS np,
         CAST(sum(sum(a)) OVER () AS BIGINT) AS nn
  FROM cnt GROUP BY 1
), grid AS (
  SELECT top.w, top.rk, top.tw, parts.source, parts.np, parts.nn,
         COALESCE(cnt.a, 0) AS a
  FROM top CROSS JOIN parts
  LEFT JOIN cnt ON cnt.w = top.w AND cnt.source = parts.source
), agg AS (
  SELECT w, rk, tw, nn,
         CAST(sum(abs(a * nn - np * tw)) AS BIGINT) AS num
  FROM grid GROUP BY 1, 2, 3, 4
)
SELECT CAST(rk AS BIGINT) AS rank, w AS term, tw AS total_count,
       CAST(floor(CAST(num AS DOUBLE)
                  / (2.0 * CAST(tw AS DOUBLE) * nn)
                  * 1000000 + {_OFF}) AS BIGINT) AS dp_e6
FROM agg
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# fisher_score_dims — Fisher discriminant ratio per embedding dim
# ---------------------------------------------------------------------------
# The classic filter feature selector (Duda & Hart): F_d = sum_l n_l
# (mu_ld - mu_d)^2 / sum_l n_l sigma_ld^2 — which embedding
# dimensions separate the labels?  Between terms are exact-integer
# squares in double (bounded < 2^53, documented) floored per (label,
# dim); within terms are exact BIGINT rationals floored per cell; the
# <= |labels| folds per dim are exact integer sums.  Top-10 dims.


def q_fisher_score_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    comp = emb.select(
        "label", F.posexplode("embedding").alias("d", "x")
    ).select(
        "label",
        "d",
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("x6"),
    )
    mom = comp.groupBy("label", "d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").alias("s6"),
        F.sum(F.col("x6") * F.col("x6")).alias("q6"),
    )
    wd = Window.partitionBy("d")
    mom = mom.withColumn("ss", F.sum("s6").over(wd)).withColumn(
        "nn", F.sum("n").over(wd)
    )
    between = F.floor(
        (
            (
                F.col("s6").cast("double") * F.col("nn")
                - F.col("ss").cast("double") * F.col("n")
            )
            * (
                F.col("s6").cast("double") * F.col("nn")
                - F.col("ss").cast("double") * F.col("n")
            )
        )
        / (
            F.col("n").cast("double")
            * F.col("nn").cast("double")
            * F.col("nn")
        )
        + F.lit(_OFF)
    ).cast("long")
    within = F.floor(
        (
            F.col("n").cast("double") * F.col("q6")
            - F.col("s6").cast("double") * F.col("s6")
        )
        / F.col("n")
        + F.lit(_OFF)
    ).cast("long")
    agg = mom.groupBy("d").agg(
        F.sum(between).alias("sb"), F.sum(within).alias("sw")
    )
    fd = F.col("sb").cast("double") / F.col("sw")
    scored = agg.filter(F.col("sw") > 0).select(
        "d", fd.alias("f")
    )
    wr = Window.orderBy(F.col("f").desc(), F.col("d").asc())
    top = scored.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 10
    )
    return top.select(
        F.col("rk").cast("long").alias("rank"),
        # posexplode is 0-indexed; the oracle's generate_series is
        # 1-indexed — emit 1-indexed dims
        (F.col("d") + 1).cast("long").alias("dim"),
        F.floor(F.col("f") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("fisher_e6"),
    ).orderBy("rank")


SQL_FISHER_DIMS = f"""
WITH comp0 AS (
  SELECT label,
         unnest(list_transform(generate_series(1, len(embedding)),
           i -> struct_pack(d := i,
                x6 := CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6
                                 + {_OFF}) AS BIGINT)))) AS u
  FROM embeddings
), comp AS (
  SELECT label, u.d AS d, u.x6 AS x6 FROM comp0
), mom AS (
  SELECT label, d, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x6) AS BIGINT) AS s6,
         CAST(sum(x6 * x6) AS BIGINT) AS q6
  FROM comp GROUP BY 1, 2
), wide AS (
  SELECT label, d, n, s6, q6,
         CAST(sum(s6) OVER (PARTITION BY d) AS BIGINT) AS ss,
         CAST(sum(n) OVER (PARTITION BY d) AS BIGINT) AS nn
  FROM mom
), terms AS (
  SELECT d,
         CAST(floor((CAST(s6 AS DOUBLE) * nn - CAST(ss AS DOUBLE) * n)
                    * (CAST(s6 AS DOUBLE) * nn
                       - CAST(ss AS DOUBLE) * n)
                    / (CAST(n AS DOUBLE) * CAST(nn AS DOUBLE) * nn)
                    + {_OFF}) AS BIGINT) AS between_t,
         CAST(floor((CAST(n AS DOUBLE) * q6
                     - CAST(s6 AS DOUBLE) * s6) / n + {_OFF})
              AS BIGINT) AS within_t
  FROM wide
), agg AS (
  SELECT d, CAST(sum(between_t) AS BIGINT) AS sb,
         CAST(sum(within_t) AS BIGINT) AS sw
  FROM terms GROUP BY 1
), scored AS (
  SELECT d, CAST(sb AS DOUBLE) / sw AS f
  FROM agg WHERE sw > 0
), top AS (
  SELECT d, f, row_number() OVER (ORDER BY f DESC, d ASC) AS rk
  FROM scored QUALIFY rk <= 10
)
SELECT CAST(rk AS BIGINT) AS rank, CAST(d AS BIGINT) AS dim,
       CAST(floor(f * 1000000 + {_OFF}) AS BIGINT) AS fisher_e6
FROM top
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# dow_profile_cosine — user weekly-rhythm alignment census
# ---------------------------------------------------------------------------
# Each user's 7-bin day-of-week activity profile against the global
# profile: cosine similarity per user (exact BIGINT dot product and
# norms, e6-floored), then an exact census — mean and the lower
# 10/50/90th percentiles picked off the cosine value domain.


def q_dow_profile_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
            % 7
        )
        .cast("long")
        .alias("dow"),
    )
    per = ev.groupBy("user_id", "dow").agg(
        F.count(F.lit(1)).alias("u")
    )
    glob = ev.groupBy("dow").agg(F.count(F.lit(1)).alias("g"))
    j = per.join(F.broadcast(glob), "dow")
    dots = j.groupBy("user_id").agg(
        F.sum(F.col("u") * F.col("g")).alias("dot"),
        F.sum(F.col("u") * F.col("u")).alias("uu"),
    )
    gg = glob.agg(F.sum(F.col("g") * F.col("g")).alias("gg"))
    cos6 = dots.crossJoin(F.broadcast(gg)).select(
        "user_id",
        F.floor(
            F.col("dot").cast("double")
            / F.sqrt(
                F.col("uu").cast("double") * F.col("gg").cast("double")
            )
            * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("c6"),
    )
    dom = cos6.groupBy("c6").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy("c6").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    dom = dom.withColumn("cc", F.sum("c").over(wo)).withColumn(
        "k", F.sum("c").over(wall)
    ).withColumn("sv", F.sum(F.col("c6") * F.col("c")).over(wall))

    def pick(q_num, q_den):
        return F.min(
            F.when(
                F.col("cc") * q_den >= F.col("k") * q_num, F.col("c6")
            )
        )

    agg = dom.agg(
        F.max("k").alias("n_users"),
        F.max("sv").alias("sv"),
        pick(1, 10).alias("p10_e6"),
        pick(1, 2).alias("p50_e6"),
        pick(9, 10).alias("p90_e6"),
    )
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.floor(
            F.col("sv").cast("double") / F.col("n_users") + F.lit(_OFF)
        )
        .cast("long")
        .alias("mean_e6"),
        F.col("p10_e6").cast("long").alias("p10_e6"),
        F.col("p50_e6").cast("long").alias("p50_e6"),
        F.col("p90_e6").cast("long").alias("p90_e6"),
    )


SQL_DOW_COSINE = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow
  FROM events
), per AS (
  SELECT user_id, dow, CAST(count(*) AS BIGINT) AS u
  FROM ev GROUP BY 1, 2
), gprof AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS g FROM ev GROUP BY 1
), dots AS (
  SELECT user_id,
         CAST(sum(u * g) AS BIGINT) AS dot,
         CAST(sum(u * u) AS BIGINT) AS uu
  FROM per JOIN gprof ON gprof.dow = per.dow
  GROUP BY 1
), gg AS (
  SELECT CAST(sum(g * g) AS BIGINT) AS gg FROM gprof
), cos6 AS (
  SELECT user_id,
         CAST(floor(CAST(dot AS DOUBLE)
                    / sqrt(CAST(uu AS DOUBLE) * CAST(gg AS DOUBLE))
                    * 1e6 + {_OFF}) AS BIGINT) AS c6
  FROM dots CROSS JOIN gg
), dom AS (
  SELECT c6, CAST(count(*) AS BIGINT) AS c FROM cos6 GROUP BY 1
), cum AS (
  SELECT c6, c,
         CAST(sum(c) OVER (ORDER BY c6) AS BIGINT) AS cc,
         CAST(sum(c) OVER () AS BIGINT) AS k,
         CAST(sum(c6 * c) OVER () AS BIGINT) AS sv
  FROM dom
), agg AS (
  SELECT max(k) AS n_users, max(sv) AS sv,
         min(CASE WHEN cc * 10 >= k THEN c6 END) AS p10_e6,
         min(CASE WHEN cc * 2 >= k THEN c6 END) AS p50_e6,
         min(CASE WHEN cc * 10 >= k * 9 THEN c6 END) AS p90_e6
  FROM cum
)
SELECT n_users,
       CAST(floor(CAST(sv AS DOUBLE) / n_users + {_OFF}) AS BIGINT)
         AS mean_e6,
       p10_e6, p50_e6, p90_e6
FROM agg
"""


# ---------------------------------------------------------------------------
# peak_shift — weekday-vs-weekend diel peak displacement per type
# ---------------------------------------------------------------------------
# The circular mean hour (first-harmonic vector via the shared e6
# integer trig tables) computed separately for weekday and weekend
# events; the displacement is the wrapped angular difference mapped
# to minutes.  All vector sums are exact BIGINT; atan2 and the
# floor-based wrap are the only late doubles (identical expressions
# in both engines).


def q_peak_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hr = (
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        )
        % 24
    ).cast("int")
    we = (
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / 86_400_000_000
            )
            % 7
        ).isin(2, 3)
    ).cast("long")
    d = ev.select(
        "event_type",
        we.alias("we"),
        F.element_at(F.array(*[F.lit(v) for v in _COS6]), hr + 1)
        .cast("long")
        .alias("c"),
        F.element_at(F.array(*[F.lit(v) for v in _SIN6]), hr + 1)
        .cast("long")
        .alias("s"),
    )
    agg = d.groupBy("event_type").agg(
        F.sum(F.when(F.col("we") == 0, F.col("c")).otherwise(0)).alias(
            "c0"
        ),
        F.sum(F.when(F.col("we") == 0, F.col("s")).otherwise(0)).alias(
            "s0"
        ),
        F.sum(F.when(F.col("we") == 1, F.col("c")).otherwise(0)).alias(
            "c1"
        ),
        F.sum(F.when(F.col("we") == 1, F.col("s")).otherwise(0)).alias(
            "s1"
        ),
        F.sum((F.col("we") == 0).cast("long")).alias("n0"),
        F.sum((F.col("we") == 1).cast("long")).alias("n1"),
    )
    a0 = F.atan2(F.col("s0").cast("double"), F.col("c0").cast("double"))
    a1 = F.atan2(F.col("s1").cast("double"), F.col("c1").cast("double"))
    two_pi = 2.0 * _math.pi
    dd = a1 - a0
    wrapped = dd - two_pi * F.floor((dd + _math.pi) / two_pi)
    return (
        agg.filter((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            "event_type",
            F.col("n0").cast("long").alias("n_weekday"),
            F.col("n1").cast("long").alias("n_weekend"),
            F.floor(a0 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "angle_weekday_e4"
            ),
            F.floor(a1 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "angle_weekend_e4"
            ),
            F.floor(wrapped / two_pi * 1440.0 + F.lit(_OFF))
            .cast("long")
            .alias("shift_minutes"),
        )
        .orderBy("event_type")
    )


SQL_PEAK_SHIFT = f"""
WITH d AS (
  SELECT event_type,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we,
         CAST({_COS6_SQL}[
           CAST(CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24
                AS INTEGER) + 1] AS BIGINT) AS c,
         CAST({_SIN6_SQL}[
           CAST(CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24
                AS INTEGER) + 1] AS BIGINT) AS s
  FROM events
), agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN we = 0 THEN c ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN we = 0 THEN s ELSE 0 END) AS BIGINT) AS s0,
         CAST(sum(CASE WHEN we = 1 THEN c ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN we = 1 THEN s ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM d GROUP BY 1
), ang AS (
  SELECT event_type, n0, n1,
         atan2(CAST(s0 AS DOUBLE), CAST(c0 AS DOUBLE)) AS a0,
         atan2(CAST(s1 AS DOUBLE), CAST(c1 AS DOUBLE)) AS a1
  FROM agg
)
SELECT event_type, n0 AS n_weekday, n1 AS n_weekend,
       CAST(floor(a0 * 10000 + {_OFF}) AS BIGINT) AS angle_weekday_e4,
       CAST(floor(a1 * 10000 + {_OFF}) AS BIGINT) AS angle_weekend_e4,
       CAST(floor((a1 - a0 - 2 * pi()
                   * floor((a1 - a0 + pi()) / (2 * pi())))
                  / (2 * pi()) * 1440.0 + {_OFF}) AS BIGINT)
         AS shift_minutes
FROM ang
WHERE n0 > 0 AND n1 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# rmst — restricted mean survival time at tau = 14 days
# ---------------------------------------------------------------------------
# Royston & Parmar (Stat. Med. 2013) popularized RMST = integral of
# the KM curve to tau as the robust effect summary.  Subjects,
# lifetimes and internal censoring are EXACTLY survival_km's
# ((user, type) lifetimes, churn = last use >= 7 days before the
# user's horizon); the integral folds prev-S x interval over the
# distinct-lifetime domain plus the flat tail to tau.  The ordered
# prefix of ln terms is deterministic (fixed window order), as in
# survival_km.


_RMST_TAU = 14


def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.count(F.lit(1)).alias("n_at"),
        F.sum("observed").alias("d"),
    )
    w_risk = Window.orderBy("life").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("life").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_lag = Window.orderBy("life")
    km = (
        per_t.withColumn("n_risk", F.sum("n_at").over(w_risk))
        .withColumn(
            "lnterm",
            F.log(
                F.lit(1.0)
                - F.col("d").cast("double")
                / F.col("n_risk").cast("double")
            ),
        )
        .withColumn("s", F.exp(F.sum("lnterm").over(w_cum)))
        .withColumn("prev_t", F.coalesce(F.lag("life").over(w_lag) + 1, F.lit(0)))
        .withColumn("prev_s", F.coalesce(F.lag("s").over(w_lag), F.lit(1.0)))
    )
    # interval [prev_t, min(life+1, tau)) carries prev_s; the +1 shifts
    # because S drops AFTER the step day completes (right-continuous KM
    # on integer days); the tail beyond the last step carries s_last
    tau = float(_RMST_TAU)
    contrib = F.when(
        F.col("prev_t") < tau,
        F.col("prev_s")
        * (
            F.least(
                (F.col("life") + 1).cast("double"), F.lit(tau)
            )
            - F.col("prev_t")
        ),
    ).otherwise(F.lit(0.0))
    km = km.withColumn(
        "mx", F.max("life").over(Window.partitionBy())
    )
    body = km.agg(
        F.sum(contrib).alias("body"),
        F.max(F.col("life") + 1).alias("t_last"),
        F.min(
            F.when(F.col("life") == F.col("mx"), F.col("s"))
        ).alias("s_last"),
        F.sum("n_at").alias("n_subjects"),
        F.sum("d").alias("n_events"),
    )
    tail = F.when(
        F.col("t_last") < tau,
        F.col("s_last") * (tau - F.col("t_last")),
    ).otherwise(F.lit(0.0))
    return body.select(
        F.lit(_RMST_TAU).cast("long").alias("tau_days"),
        F.col("n_subjects").cast("long").alias("n_subjects"),
        F.col("n_events").cast("long").alias("n_events"),
        F.floor((F.col("body") + tail) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("rmst_e4"),
    )


SQL_RMST = f"""
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
         CASE WHEN ut.d1 <= horizon.ud1 - 7 THEN 1 ELSE 0 END
           AS observed
  FROM ut JOIN horizon USING (user_id)
), per_t AS (
  SELECT life, count(*) AS n_at, CAST(sum(observed) AS BIGINT) AS d
  FROM u GROUP BY 1
), km AS (
  SELECT life, n_at, d,
         CAST(sum(n_at) OVER (ORDER BY life
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS n_risk
  FROM per_t
), km2 AS (
  SELECT life, n_at, d,
         exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n_risk))
             OVER (ORDER BY life
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS s
  FROM km
), km3 AS (
  SELECT life, n_at, d, s,
         COALESCE(lag(life) OVER (ORDER BY life) + 1, 0) AS prev_t,
         COALESCE(lag(s) OVER (ORDER BY life), 1.0) AS prev_s
  FROM km2
), body AS (
  SELECT sum(CASE WHEN prev_t < {_RMST_TAU}.0 THEN
               prev_s * (least(CAST(life + 1 AS DOUBLE),
                               {_RMST_TAU}.0) - prev_t)
             ELSE 0.0 END) AS body,
         max(life + 1) AS t_last,
         CAST(sum(n_at) AS BIGINT) AS n_subjects,
         CAST(sum(d) AS BIGINT) AS n_events
  FROM km3
), slast AS (
  SELECT s AS s_last FROM km2
  QUALIFY row_number() OVER (ORDER BY life DESC) = 1
)
SELECT CAST({_RMST_TAU} AS BIGINT) AS tau_days, n_subjects, n_events,
       CAST(floor((body + CASE WHEN t_last < {_RMST_TAU}.0
                               THEN s_last * ({_RMST_TAU}.0 - t_last)
                               ELSE 0.0 END) * 10000 + {_OFF})
            AS BIGINT) AS rmst_e4
FROM body CROSS JOIN slast
"""


# ---------------------------------------------------------------------------
# yuen_t — Yuen's 20%-trimmed two-sample t, weekday vs weekend
# ---------------------------------------------------------------------------
# Yuen (Biometrika 1974): trimmed means with winsorized variances fix
# the t-test under heavy tails.  Both samples' trimmed/winsorized
# moments are EXACT: g = floor(0.2 n), the middle-slab sum comes from
# per-block overlap counts on the value domain, and the boundary
# order statistics are domain-cumulative picks; so numerator and both
# variance pieces are exact integers until the final ratio.  Welch-
# style df per Yuen's formula.


def q_yuen_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("we"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    dom = ev.groupBy("event_type", "we", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    wo = (
        Window.partitionBy("event_type", "we")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type", "we")
    d = (
        dom.withColumn("hi", F.sum("c").over(wo))
        .withColumn("n", F.sum("c").over(wt))
        .withColumn("lo", F.col("hi") - F.col("c"))
        .withColumn("g", F.floor(F.col("n") / 5).cast("long"))
    )
    ov = F.greatest(
        F.lit(0),
        F.least(F.col("hi"), F.col("n") - F.col("g"))
        - F.greatest(F.col("lo"), F.col("g")),
    )
    agg = d.groupBy("event_type", "we").agg(
        F.max("n").alias("n"),
        F.max("g").alias("g"),
        F.sum(ov * F.col("v")).alias("smid"),
        F.sum(ov * F.col("v") * F.col("v")).alias("qmid"),
        F.min(
            F.when(F.col("hi") >= F.col("g") + 1, F.col("v"))
        ).alias("xlo"),
        F.min(
            F.when(F.col("hi") >= F.col("n") - F.col("g"), F.col("v"))
        ).alias("xhi"),
    )
    h = F.col("n") - 2 * F.col("g")
    wsum = F.col("smid") + F.col("g") * (F.col("xlo") + F.col("xhi"))
    wsq = F.col("qmid") + F.col("g") * (
        F.col("xlo") * F.col("xlo") + F.col("xhi") * F.col("xhi")
    )
    tmean = F.col("smid").cast("double") / h.cast("double")
    swvar = (
        F.col("n").cast("double") * wsq.cast("double")
        - wsum.cast("double") * wsum.cast("double")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    side = agg.select(
        "event_type",
        "we",
        F.col("n").cast("long").alias("n"),
        h.cast("long").alias("h"),
        tmean.alias("tm"),
        (swvar * (F.col("n") - 1).cast("double")).alias("ssw"),
    )
    a = side.filter(F.col("we") == 0).select(
        "event_type",
        F.col("n").alias("n0"),
        F.col("h").alias("h0"),
        F.col("tm").alias("tm0"),
        F.col("ssw").alias("ssw0"),
    )
    b = side.filter(F.col("we") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("h").alias("h1"),
        F.col("tm").alias("tm1"),
        F.col("ssw").alias("ssw1"),
    )
    j = a.join(b, "event_type")
    d0 = F.col("ssw0") / (
        F.col("h0").cast("double") * (F.col("h0") - 1)
    )
    d1 = F.col("ssw1") / (
        F.col("h1").cast("double") * (F.col("h1") - 1)
    )
    t = (F.col("tm0") - F.col("tm1")) / F.sqrt(d0 + d1)
    df = (d0 + d1) * (d0 + d1) / (
        d0 * d0 / (F.col("h0") - 1) + d1 * d1 / (F.col("h1") - 1)
    )
    return (
        j.filter((F.col("h0") >= 3) & (F.col("h1") >= 3))
        .select(
            "event_type",
            F.col("n0").cast("long").alias("n_weekday"),
            F.col("n1").cast("long").alias("n_weekend"),
            F.floor(F.col("tm0") * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("tmean_weekday_e4"),
            F.floor(F.col("tm1") * 10_000 + F.lit(_OFF))
            .cast("long")
            .alias("tmean_weekend_e4"),
            F.floor(t * 10_000 + F.lit(_OFF)).cast("long").alias(
                "t_e4"
            ),
            F.floor(df * 100 + F.lit(_OFF)).cast("long").alias("df_e2"),
        )
        .orderBy("event_type")
    )


SQL_YUEN = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dom AS (
  SELECT event_type, we, v, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2, 3
), d AS (
  SELECT event_type, we, v, c,
         CAST(sum(c) OVER (PARTITION BY event_type, we ORDER BY v)
              AS BIGINT) AS hi,
         CAST(sum(c) OVER (PARTITION BY event_type, we) AS BIGINT)
           AS n
  FROM dom
), d2 AS (
  SELECT event_type, we, v, c, hi, n, hi - c AS lo, n // 5 AS g
  FROM d
), agg AS (
  SELECT event_type, we, max(n) AS n, max(g) AS g,
         CAST(sum(greatest(0, least(hi, n - g) - greatest(lo, g)) * v)
              AS BIGINT) AS smid,
         CAST(sum(greatest(0, least(hi, n - g) - greatest(lo, g))
                  * v * v) AS BIGINT) AS qmid,
         min(CASE WHEN hi >= g + 1 THEN v END) AS xlo,
         min(CASE WHEN hi >= n - g THEN v END) AS xhi
  FROM d2 GROUP BY 1, 2
), side AS (
  SELECT event_type, we, n, n - 2 * g AS h,
         CAST(smid AS DOUBLE) / (n - 2 * g) AS tm,
         (CAST(n AS DOUBLE)
            * (qmid + g * (xlo * xlo + xhi * xhi))
          - CAST(smid + g * (xlo + xhi) AS DOUBLE)
            * (smid + g * (xlo + xhi)))
         / (CAST(n AS DOUBLE) * (n - 1))
         * (n - 1) AS ssw
  FROM agg
), j AS (
  SELECT a.event_type,
         a.n AS n0, a.h AS h0, a.tm AS tm0, a.ssw AS ssw0,
         b.n AS n1, b.h AS h1, b.tm AS tm1, b.ssw AS ssw1
  FROM side a JOIN side b
    ON b.event_type = a.event_type AND a.we = 0 AND b.we = 1
), f AS (
  SELECT event_type, n0, n1, tm0, tm1, h0, h1,
         ssw0 / (CAST(h0 AS DOUBLE) * (h0 - 1)) AS d0,
         ssw1 / (CAST(h1 AS DOUBLE) * (h1 - 1)) AS d1
  FROM j
)
SELECT event_type, n0 AS n_weekday, n1 AS n_weekend,
       CAST(floor(tm0 * 10000 + {_OFF}) AS BIGINT)
         AS tmean_weekday_e4,
       CAST(floor(tm1 * 10000 + {_OFF}) AS BIGINT)
         AS tmean_weekend_e4,
       CAST(floor((tm0 - tm1) / sqrt(d0 + d1) * 10000 + {_OFF})
            AS BIGINT) AS t_e4,
       CAST(floor((d0 + d1) * (d0 + d1)
                  / (d0 * d0 / (h0 - 1) + d1 * d1 / (h1 - 1))
                  * 100 + {_OFF}) AS BIGINT) AS df_e2
FROM f
WHERE h0 >= 3 AND h1 >= 3
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# siegel_slope — repeated-medians robust trend per type
# ---------------------------------------------------------------------------
# Siegel (Biometrika 1982): slope = median_i median_{{j != i}}
# (y_j - y_i)/(x_j - x_i) — 50% breakdown vs Theil-Sen's 29%.  The
# pair fan-out is bounded by span-days^2 per key (the daily domain,
# never raw rows); both median layers are LOWER-median order-statistic
# picks with deterministic tie-breaks.


def q_siegel_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    b = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("day_b"),
        F.col("y").alias("y_b"),
    )
    pairs = daily.join(
        b,
        (F.col("event_type") == F.col("et"))
        & (F.col("day") != F.col("day_b")),
    ).select(
        "event_type",
        "day",
        F.col("day_b"),
        (
            (F.col("y_b") - F.col("y")).cast("double")
            / (F.col("day_b") - F.col("day")).cast("double")
        ).alias("sl"),
    )
    wi = Window.partitionBy("event_type", "day").orderBy(
        "sl", "day_b"
    )
    wic = Window.partitionBy("event_type", "day")
    inner = (
        pairs.withColumn("rk", F.row_number().over(wi))
        .withColumn("m", F.count(F.lit(1)).over(wic))
        .filter(F.col("rk") * 2 == F.col("m") + (F.col("m") % 2))
        .select("event_type", "day", F.col("sl").alias("med_i"))
    )
    wo = Window.partitionBy("event_type").orderBy("med_i", "day")
    woc = Window.partitionBy("event_type")
    outer = (
        inner.withColumn("rk", F.row_number().over(wo))
        .withColumn("m", F.count(F.lit(1)).over(woc))
        .filter(F.col("rk") * 2 == F.col("m") + (F.col("m") % 2))
    )
    return outer.select(
        "event_type",
        F.col("m").cast("long").alias("n_days"),
        F.floor(F.col("med_i") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("slope_e6"),
    ).orderBy("event_type")


SQL_SIEGEL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, a.day, b.day AS day_b,
         CAST(b.y - a.y AS DOUBLE) / (b.day - a.day) AS sl
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.day <> a.day
), inner_ AS (
  SELECT event_type, day, sl AS med_i
  FROM (
    SELECT event_type, day, sl,
           row_number() OVER (PARTITION BY event_type, day
                              ORDER BY sl, day_b) AS rk,
           count(*) OVER (PARTITION BY event_type, day) AS m
    FROM pairs
  ) WHERE rk * 2 = m + (m % 2)
), outer_ AS (
  SELECT event_type, med_i,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY med_i, day) AS rk,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM inner_
)
SELECT event_type, CAST(m AS BIGINT) AS n_days,
       CAST(floor(med_i * 1000000 + {_OFF}) AS BIGINT) AS slope_e6
FROM outer_
WHERE rk * 2 = m + (m % 2)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# adamic_adar — link-prediction scores on the crawl-order graph
# ---------------------------------------------------------------------------
# Adamic & Adar (Social Networks 2003): for non-adjacent pairs,
# score = sum over common neighbours z of 1/ln(deg z) — the standard
# link-prediction baseline, on the SAME crawl-order source graph as
# triangle_count/domain_pagerank.  Common neighbours come from the
# z-pivot self-join of the adjacency list (never node-pair cross
# join); per-z weights are e9-floored so pair scores are exact
# integer sums; top-10 pairs.


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    e0 = (
        d.withColumn("nxt", F.lead("source").over(w))
        .filter(F.col("nxt").isNotNull() & (F.col("source") != F.col("nxt")))
        .select(
            F.least("source", "nxt").alias("a"),
            F.greatest("source", "nxt").alias("b"),
        )
        .distinct()
    )
    adj = e0.select(F.col("a").alias("z"), F.col("b").alias("n")).union(
        e0.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    wz = deg.filter(F.col("deg") >= 2).withColumn(
        "w9",
        F.floor(
            1e9 / F.log(F.col("deg").cast("double")) + F.lit(_OFF)
        ).cast("long"),
    )
    a2 = adj.join(wz.select("z", "w9"), "z")
    b2 = a2.select(
        F.col("z"), F.col("n").alias("n_b"), F.col("w9").alias("w9b")
    )
    cand = (
        a2.join(b2, "z")
        .filter(F.col("n") < F.col("n_b"))
        .groupBy(F.col("n").alias("a"), F.col("n_b").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("w9").alias("aa9"),
        )
    )
    nonedge = cand.join(
        e0, ["a", "b"], "left_anti"
    )
    wr = Window.orderBy(
        F.col("aa9").desc(), F.col("a").asc(), F.col("b").asc()
    )
    top = nonedge.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 10
    )
    return top.select(
        F.col("rk").cast("long").alias("rank"),
        F.col("a").alias("node_a"),
        F.col("b").alias("node_b"),
        F.col("n_common").cast("long").alias("n_common"),
        F.floor(F.col("aa9").cast("double") / 1000.0 + F.lit(_OFF))
        .cast("long")
        .alias("aa_e6"),
    ).orderBy("rank")


SQL_ADAMIC = f"""
WITH e0 AS (
  SELECT DISTINCT least(sa, sb) AS a, greatest(sa, sb) AS b
  FROM (
    SELECT source AS sa,
           lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS sb
    FROM documents
  ) WHERE sb IS NOT NULL AND sa <> sb
), adj AS (
  SELECT a AS z, b AS n FROM e0
  UNION ALL
  SELECT b AS z, a AS n FROM e0
), deg AS (
  SELECT z, count(*) AS deg FROM adj GROUP BY 1
), wz AS (
  SELECT z, CAST(floor(1e9 / ln(CAST(deg AS DOUBLE)) + {_OFF})
                 AS BIGINT) AS w9
  FROM deg WHERE deg >= 2
), a2 AS (
  SELECT adj.z, adj.n, wz.w9 FROM adj JOIN wz ON wz.z = adj.z
), cand AS (
  SELECT x.n AS a, y.n AS b,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(x.w9) AS BIGINT) AS aa9
  FROM a2 x JOIN a2 y ON y.z = x.z AND x.n < y.n
  GROUP BY 1, 2
), nonedge AS (
  SELECT cand.* FROM cand
  LEFT JOIN e0 ON e0.a = cand.a AND e0.b = cand.b
  WHERE e0.a IS NULL
), top AS (
  SELECT a, b, n_common, aa9,
         row_number() OVER (ORDER BY aa9 DESC, a ASC, b ASC) AS rk
  FROM nonedge
)
SELECT CAST(rk AS BIGINT) AS rank, a AS node_a, b AS node_b,
       n_common,
       CAST(floor(CAST(aa9 AS DOUBLE) / 1000.0 + {_OFF}) AS BIGINT)
         AS aa_e6
FROM top
WHERE rk <= 10
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# markov_order_test — LR test of 2nd- vs 1st-order type chains
# ---------------------------------------------------------------------------
# The classical model-order test (Anderson & Goodman, Ann. Math.
# Stat. 1957): G^2 = 2 sum n_abc ln(n_abc n_b / (n_ab n_bc)) over
# per-user type trigrams pools the evidence that yesterday's state
# still matters given today's.  Counts exact; per-cell ln terms
# e6-floored before the sum; df = |S|(|S|-1)^2 exact.


def q_markov_order_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("tts"),
        "event_id",
    )
    wo = Window.partitionBy("user_id").orderBy("tts", "event_id")
    tri = (
        ev.withColumn("b", F.lag("event_type", 1).over(wo))
        .withColumn("a", F.lag("event_type", 2).over(wo))
        .filter(F.col("a").isNotNull())
        .select(
            F.col("a"),
            F.col("b"),
            F.col("event_type").alias("c"),
        )
    )
    nabc = tri.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("n3")
    )
    wab = Window.partitionBy("a", "b")
    wbc = Window.partitionBy("b", "c")
    wb = Window.partitionBy("b")
    d = (
        nabc.withColumn("nab", F.sum("n3").over(wab))
        .withColumn("nbc", F.sum("n3").over(wbc))
        .withColumn("nb", F.sum("n3").over(wb))
    )
    t6 = F.floor(
        2.0
        * F.col("n3").cast("double")
        * F.log(
            F.col("n3").cast("double")
            * F.col("nb")
            / (F.col("nab").cast("double") * F.col("nbc"))
        )
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    states = tri.select(F.col("c").alias("s")).distinct().agg(
        F.count(F.lit(1)).alias("k")
    )
    agg = d.agg(
        F.sum("n3").alias("n"), F.sum(t6).alias("g6")
    ).crossJoin(F.broadcast(states))
    return agg.select(
        F.col("n").cast("long").alias("n_trigrams"),
        F.col("k").cast("long").alias("k_states"),
        (
            F.col("k") * (F.col("k") - 1) * (F.col("k") - 1)
        ).cast("long").alias("df"),
        F.floor(F.col("g6").cast("double") / 100.0 + F.lit(_OFF))
        .cast("long")
        .alias("g2_e4"),
    )


SQL_MARKOV_ORDER = f"""
WITH ev AS (
  SELECT user_id, event_type, ts, event_id
  FROM events
), tri AS (
  SELECT lag(event_type, 2) OVER w AS a,
         lag(event_type, 1) OVER w AS b,
         event_type AS c
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  QUALIFY a IS NOT NULL
), nabc AS (
  SELECT a, b, c, CAST(count(*) AS BIGINT) AS n3
  FROM tri GROUP BY 1, 2, 3
), d AS (
  SELECT a, b, c, n3,
         CAST(sum(n3) OVER (PARTITION BY a, b) AS BIGINT) AS nab,
         CAST(sum(n3) OVER (PARTITION BY b, c) AS BIGINT) AS nbc,
         CAST(sum(n3) OVER (PARTITION BY b) AS BIGINT) AS nb
  FROM nabc
), states AS (
  SELECT CAST(count(DISTINCT c) AS BIGINT) AS k FROM tri
), agg AS (
  SELECT CAST(sum(n3) AS BIGINT) AS n,
         CAST(sum(CAST(floor(2.0 * CAST(n3 AS DOUBLE)
                             * ln(CAST(n3 AS DOUBLE) * nb
                                  / (CAST(nab AS DOUBLE) * nbc))
                             * 1e6 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS g6
  FROM d
)
SELECT n AS n_trigrams, k AS k_states,
       CAST(k * (k - 1) * (k - 1) AS BIGINT) AS df,
       CAST(floor(CAST(g6 AS DOUBLE) / 100.0 + {_OFF}) AS BIGINT)
         AS g2_e4
FROM agg CROSS JOIN states
"""


# ---------------------------------------------------------------------------
# isotonic_hour — isotonic (PAV) fit of conversion rate by hour
# ---------------------------------------------------------------------------
# The isotonic regression of purchase share on hour-of-day via the
# CLOSED minimax identity iso(i) = max_{{j<=i}} min_{{k>=i}}
# wavg(y[j..k]) (Barlow et al. 1972) — equivalent to PAV but with NO
# data-dependent iteration, so both engines evaluate the identical
# bounded triple fan-out over the 24-bin domain (24^3 combinations).
# Weighted prefix sums exact; the interval averages are exact
# rationals compared in double (same operands both engines).


def q_isotonic_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
            )
            % 24
        )
        .cast("long")
        .alias("h"),
        (F.col("event_type") == "purchase").cast("long").alias("p"),
    )
    hour = ev.groupBy("h").agg(
        F.count(F.lit(1)).alias("w"), F.sum("p").alias("s")
    )
    wo = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    pre = hour.select(
        "h",
        "w",
        "s",
        F.sum("w").over(wo).alias("cw"),
        F.sum("s").over(wo).alias("cs"),
    )
    # interval [j, k] average = (cs_k - cs_{j-1}) / (cw_k - cw_{j-1});
    # build it from the 24-row prefix table three-way
    jt = pre.select(
        F.col("h").alias("j"),
        (F.col("cw") - F.col("w")).alias("cwj"),
        (F.col("cs") - F.col("s")).alias("csj"),
    )
    kt = pre.select(
        F.col("h").alias("k"),
        F.col("cw").alias("cwk"),
        F.col("cs").alias("csk"),
    )
    it = pre.select(F.col("h").alias("i"))
    ivals = (
        it.crossJoin(F.broadcast(jt))
        .crossJoin(F.broadcast(kt))
        .filter((F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .select(
            "i",
            "j",
            (
                (F.col("csk") - F.col("csj")).cast("double")
                / (F.col("cwk") - F.col("cwj")).cast("double")
            ).alias("avg"),
        )
    )
    inner = ivals.groupBy("i", "j").agg(F.min("avg").alias("mn"))
    iso = inner.groupBy("i").agg(F.max("mn").alias("iso"))
    raw = hour.select(
        F.col("h").alias("i"),
        (F.col("s").cast("double") / F.col("w")).alias("raw"),
        F.col("w"),
        F.col("s"),
    )
    out = raw.join(iso, "i")
    return out.select(
        F.col("i").cast("long").alias("hour"),
        F.col("w").cast("long").alias("n"),
        F.col("s").cast("long").alias("n_purchase"),
        F.floor(F.col("raw") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("raw_rate_e6"),
        F.floor(F.col("iso") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("iso_rate_e6"),
    ).orderBy("hour")


SQL_ISOTONIC = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS h,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
  FROM events
), hour AS (
  SELECT h, CAST(count(*) AS BIGINT) AS w, CAST(sum(p) AS BIGINT) AS s
  FROM ev GROUP BY 1
), pre AS (
  SELECT h, w, s,
         CAST(sum(w) OVER (ORDER BY h) AS BIGINT) AS cw,
         CAST(sum(s) OVER (ORDER BY h) AS BIGINT) AS cs
  FROM hour
), ivals AS (
  SELECT i.h AS i, j.h AS j,
         CAST(k.cs - (j.cs - j.s) AS DOUBLE)
         / (k.cw - (j.cw - j.w)) AS avg
  FROM pre i
  JOIN pre j ON j.h <= i.h
  JOIN pre k ON k.h >= i.h
), inner_ AS (
  SELECT i, j, min(avg) AS mn FROM ivals GROUP BY 1, 2
), iso AS (
  SELECT i, max(mn) AS iso FROM inner_ GROUP BY 1
)
SELECT hour.h AS hour, w AS n, s AS n_purchase,
       CAST(floor(CAST(s AS DOUBLE) / w * 1000000 + {_OFF}) AS BIGINT)
         AS raw_rate_e6,
       CAST(floor(iso * 1000000 + {_OFF}) AS BIGINT) AS iso_rate_e6
FROM hour JOIN iso ON iso.i = hour.h
ORDER BY hour
"""


# ---------------------------------------------------------------------------
# christoffersen_ind — VaR breach independence (Markov) test
# ---------------------------------------------------------------------------
# Christoffersen (IER 1998): breaches should not cluster — LR_ind
# compares the breach indicator's first-order Markov fit against the
# iid fit.  Breach definition EXACTLY as kupiec_pof (first-half
# exact-domain VaR, second-half daily counts); transition counts
# exact; the four ln terms enter as per-cell e6-floored integers with
# the 0 ln 0 convention.


def q_christoffersen_ind(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wt = Window.partitionBy("event_type")
    d = (
        daily.withColumn("d0", F.min("day").over(wt))
        .withColumn("d1", F.max("day").over(wt))
        .withColumn(
            "late",
            (
                2 * (F.col("day") - F.col("d0"))
                > (F.col("d1") - F.col("d0"))
            ).cast("long"),
        )
    )
    early = d.filter(F.col("late") == 0)
    dom = early.groupBy("event_type", "y").agg(
        F.count(F.lit(1)).alias("c")
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtd = Window.partitionBy("event_type")
    dom = dom.withColumn("cc", F.sum("c").over(wo)).withColumn(
        "m", F.sum("c").over(wtd)
    )
    var_t = (
        dom.filter(F.col("cc") * 20 >= F.col("m"))
        .groupBy("event_type")
        .agg(F.min("y").alias("var_y"))
    )
    late = d.filter(F.col("late") == 1).join(
        F.broadcast(var_t), "event_type"
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    ind = late.withColumn(
        "i", (F.col("y") < F.col("var_y")).cast("long")
    ).withColumn("ip", F.lag("i").over(wd)).filter(
        F.col("ip").isNotNull()
    )
    agg = ind.groupBy("event_type").agg(
        F.sum(
            ((F.col("ip") == 0) & (F.col("i") == 0)).cast("long")
        ).alias("n00"),
        F.sum(
            ((F.col("ip") == 0) & (F.col("i") == 1)).cast("long")
        ).alias("n01"),
        F.sum(
            ((F.col("ip") == 1) & (F.col("i") == 0)).cast("long")
        ).alias("n10"),
        F.sum(
            ((F.col("ip") == 1) & (F.col("i") == 1)).cast("long")
        ).alias("n11"),
    )
    n0 = F.col("n00") + F.col("n01")
    n1 = F.col("n10") + F.col("n11")
    nn = n0 + n1
    nb = F.col("n01") + F.col("n11")

    def term(cnt, num, den):
        return F.when(
            cnt > 0,
            cnt.cast("double")
            * F.log(num.cast("double") / den.cast("double")),
        ).otherwise(F.lit(0.0))

    # LR_ind = 2 [ sum n_ij ln(n_ij / n_i.) - sum over columns
    #              n_.j ln(n_.j / n) ]  (0 ln 0 = 0)
    ll1 = (
        term(F.col("n00"), F.col("n00"), n0)
        + term(F.col("n01"), F.col("n01"), n0)
        + term(F.col("n10"), F.col("n10"), n1)
        + term(F.col("n11"), F.col("n11"), n1)
    )
    ll0 = term(nn - nb, nn - nb, nn) + term(nb, nb, nn)
    lr = 2.0 * (ll1 - ll0)
    return (
        agg.filter((n0 > 0) & (nn > 1))
        .select(
            "event_type",
            F.col("n00").cast("long").alias("n00"),
            F.col("n01").cast("long").alias("n01"),
            F.col("n10").cast("long").alias("n10"),
            F.col("n11").cast("long").alias("n11"),
            F.floor(lr * 10_000 + F.lit(_OFF)).cast("long").alias(
                "lr_ind_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_CHRISTOFFERSEN = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, day, y,
         CASE WHEN 2 * (day - min(day) OVER (PARTITION BY event_type))
                   > max(day) OVER (PARTITION BY event_type)
                     - min(day) OVER (PARTITION BY event_type)
              THEN 1 ELSE 0 END AS late
  FROM daily
), dom AS (
  SELECT event_type, y, CAST(count(*) AS BIGINT) AS c
  FROM d WHERE late = 0 GROUP BY 1, 2
), cum AS (
  SELECT event_type, y,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY y)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS m
  FROM dom
), var_t AS (
  SELECT event_type, min(y) AS var_y
  FROM cum WHERE cc * 20 >= m GROUP BY 1
), ind AS (
  SELECT d.event_type, day,
         CASE WHEN y < var_y THEN 1 ELSE 0 END AS i
  FROM d JOIN var_t ON var_t.event_type = d.event_type
  WHERE late = 1
), tr AS (
  SELECT event_type, i,
         lag(i) OVER (PARTITION BY event_type ORDER BY day) AS ip
  FROM ind
), agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN ip = 0 AND i = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n00,
         CAST(sum(CASE WHEN ip = 0 AND i = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n01,
         CAST(sum(CASE WHEN ip = 1 AND i = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n10,
         CAST(sum(CASE WHEN ip = 1 AND i = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n11
  FROM tr WHERE ip IS NOT NULL
  GROUP BY 1
), f AS (
  SELECT event_type, n00, n01, n10, n11,
         n00 + n01 AS r0, n10 + n11 AS r1,
         n00 + n01 + n10 + n11 AS nn,
         n01 + n11 AS nb
  FROM agg
)
SELECT event_type, n00, n01, n10, n11,
       CAST(floor(2.0 * (
           (CASE WHEN n00 > 0 THEN n00 * ln(CAST(n00 AS DOUBLE) / r0)
                 ELSE 0.0 END
            + CASE WHEN n01 > 0 THEN n01 * ln(CAST(n01 AS DOUBLE) / r0)
                   ELSE 0.0 END
            + CASE WHEN n10 > 0 THEN n10 * ln(CAST(n10 AS DOUBLE) / r1)
                   ELSE 0.0 END
            + CASE WHEN n11 > 0 THEN n11 * ln(CAST(n11 AS DOUBLE) / r1)
                   ELSE 0.0 END)
           - (CASE WHEN nn - nb > 0 THEN (nn - nb)
                   * ln(CAST(nn - nb AS DOUBLE) / nn) ELSE 0.0 END
              + CASE WHEN nb > 0 THEN nb * ln(CAST(nb AS DOUBLE) / nn)
                     ELSE 0.0 END))
           * 10000 + {_OFF}) AS BIGINT) AS lr_ind_e4
FROM f
WHERE r0 > 0 AND nn > 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# weekly_coherence — cross-spectral coherence at the 1/7d frequency
# ---------------------------------------------------------------------------
# The frequency-domain twin of ccf_lags: for each type pair, the
# squared coherence |S_xy|^2 / (S_x S_y) of the single weekly Fourier
# ordinate of the two daily count series — trig values from a shared
# 7-entry e6 integer table (zero-libm), so all DFT component sums are
# exact BIGINTs and doubles appear only in the final ratio.


_COS7 = [
    int(_math.floor(_math.cos(2.0 * _math.pi * d / 7.0) * 1e6))
    for d in range(7)
]
_SIN7 = [
    int(_math.floor(_math.sin(2.0 * _math.pi * d / 7.0) * 1e6))
    for d in range(7)
]


def q_weekly_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _daily_pairs(spark, sf_dir)
    ph = (F.col("day") % 7).cast("int")
    d = p.select(
        "type_a",
        "type_b",
        "x",
        "y",
        F.element_at(F.array(*[F.lit(v) for v in _COS7]), ph + 1)
        .cast("long")
        .alias("c"),
        F.element_at(F.array(*[F.lit(v) for v in _SIN7]), ph + 1)
        .cast("long")
        .alias("s"),
    )
    agg = d.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x") * F.col("c")).alias("xc"),
        F.sum(F.col("x") * F.col("s")).alias("xs"),
        F.sum(F.col("y") * F.col("c")).alias("yc"),
        F.sum(F.col("y") * F.col("s")).alias("ys"),
    )
    xr = F.col("xc").cast("double")
    xi = F.col("xs").cast("double")
    yr = F.col("yc").cast("double")
    yi = F.col("ys").cast("double")
    sx = xr * xr + xi * xi
    sy = yr * yr + yi * yi
    cross_r = xr * yr + xi * yi
    cross_i = xi * yr - xr * yi
    coh = (cross_r * cross_r + cross_i * cross_i) / (sx * sy)
    return (
        agg.filter((sx > 0) & (sy > 0))
        .select(
            "type_a",
            "type_b",
            F.col("n").cast("long").alias("n_days"),
            F.floor(coh * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "coherence_e6"
            ),
            F.floor(
                F.atan2(cross_i, cross_r) * 10_000 + F.lit(_OFF)
            )
            .cast("long")
            .alias("phase_e4"),
        )
        .orderBy("type_a", "type_b")
    )


_COS7_SQL = "[" + ", ".join(str(v) for v in _COS7) + "]"
_SIN7_SQL = "[" + ", ".join(str(v) for v in _SIN7) + "]"

SQL_WEEKLY_COHERENCE = f"""
WITH {_DAILY_PAIRS_SQL},
d AS (
  SELECT type_a, type_b, x, y,
         CAST({_COS7_SQL}[CAST(day % 7 AS INTEGER) + 1] AS BIGINT)
           AS c,
         CAST({_SIN7_SQL}[CAST(day % 7 AS INTEGER) + 1] AS BIGINT)
           AS s
  FROM pairs
), agg AS (
  SELECT type_a, type_b, count(*) AS n,
         CAST(sum(x * c) AS BIGINT) AS xc,
         CAST(sum(x * s) AS BIGINT) AS xs,
         CAST(sum(y * c) AS BIGINT) AS yc,
         CAST(sum(y * s) AS BIGINT) AS ys
  FROM d GROUP BY 1, 2
), f AS (
  SELECT type_a, type_b, n,
         CAST(xc AS DOUBLE) AS xr, CAST(xs AS DOUBLE) AS xi,
         CAST(yc AS DOUBLE) AS yr, CAST(ys AS DOUBLE) AS yi
  FROM agg
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
       CAST(floor(((xr * yr + xi * yi) * (xr * yr + xi * yi)
                   + (xi * yr - xr * yi) * (xi * yr - xr * yi))
                  / ((xr * xr + xi * xi) * (yr * yr + yi * yi))
                  * 1000000 + {_OFF}) AS BIGINT) AS coherence_e6,
       CAST(floor(atan2(xi * yr - xr * yi, xr * yr + xi * yi)
                  * 10000 + {_OFF}) AS BIGINT) AS phase_e4
FROM f
WHERE xr * xr + xi * xi > 0 AND yr * yr + yi * yi > 0
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# benford_second — second-significant-digit Benford conformity
# ---------------------------------------------------------------------------
# Nigrini's forensic standard: the second digit is a stronger fraud /
# rounding tripwire than the first.  Expected shares P(d) =
# sum_d1 log10(1 + 1/(10 d1 + d)) enter both engines as the same ten
# Python literals; digits are pure integer arithmetic on centivalues
# (values < 0.1 have no second significant digit and are excluded by
# contract).  Chi-square and Nigrini's MAD from exact counts.


_BENFORD2 = [
    sum(
        _math.log10(1.0 + 1.0 / (10 * d1 + d)) for d1 in range(1, 10)
    )
    for d in range(10)
]


def q_benford_second(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    ).filter(F.col("v") >= 10)
    nd = F.length(F.col("v").cast("string"))
    # floor() in BOTH engines — a bare double->int cast truncates in
    # Spark but rounds in DuckDB
    d2 = F.floor(
        F.col("v") / F.pow(F.lit(10.0), (nd - 2).cast("double"))
    ).cast("long") % 10
    cnt = ev.withColumn("d", d2).groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("c")
    )
    wt = Window.partitionBy("event_type")
    cnt = cnt.withColumn("n", F.sum("c").over(wt))
    exp_arr = F.array(*[F.lit(p) for p in _BENFORD2])
    e = F.element_at(exp_arr, F.col("d").cast("int") + 1) * F.col("n")
    chi6 = F.floor(
        (F.col("c").cast("double") - e) * (F.col("c") - e) / e * 1e6
        + F.lit(_OFF)
    ).cast("long")
    mad9 = F.floor(
        F.abs(
            F.col("c").cast("double") / F.col("n")
            - F.element_at(exp_arr, F.col("d").cast("int") + 1)
        )
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = cnt.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("k_digits"),
        F.sum(chi6).alias("chi6"),
        F.sum(mad9).alias("mad9"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("k_digits").cast("long").alias("k_digits"),
        F.floor(F.col("chi6").cast("double") / 100.0 + F.lit(_OFF))
        .cast("long")
        .alias("chi2_e4"),
        F.floor(
            F.col("mad9").cast("double")
            / F.col("k_digits")
            / 1000.0
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("mad_e6"),
    ).orderBy("event_type")


_BENFORD2_SQL = "[" + ", ".join(repr(p) for p in _BENFORD2) + "]"

SQL_BENFORD2 = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dd AS (
  SELECT event_type,
         CAST(floor(v / CAST(pow(10.0, len(CAST(v AS VARCHAR)) - 2)
                             AS DOUBLE)) AS BIGINT) % 10 AS d
  FROM ev WHERE v >= 10
), cnt AS (
  SELECT event_type, d, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(count(*)) OVER (PARTITION BY event_type) AS BIGINT)
           AS n
  FROM dd GROUP BY 1, 2
), t AS (
  SELECT event_type, n, d, c,
         {_BENFORD2_SQL}[CAST(d AS INTEGER) + 1] * n AS e
  FROM cnt
), agg AS (
  SELECT event_type, max(n) AS n, count(*) AS k_digits,
         CAST(sum(CAST(floor((c - e) * (c - e) / e * 1e6 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS chi6,
         CAST(sum(CAST(floor(abs(CAST(c AS DOUBLE) / n
                                 - {_BENFORD2_SQL}[
                                     CAST(d AS INTEGER) + 1])
                             * 1e9 + {_OFF}) AS BIGINT)) AS BIGINT)
           AS mad9
  FROM t GROUP BY 1
)
SELECT event_type, n, CAST(k_digits AS BIGINT) AS k_digits,
       CAST(floor(CAST(chi6 AS DOUBLE) / 100.0 + {_OFF}) AS BIGINT)
         AS chi2_e4,
       CAST(floor(CAST(mad9 AS DOUBLE) / k_digits / 1000.0 + {_OFF})
            AS BIGINT) AS mad_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# binning_rules — Sturges / Freedman-Diaconis / Scott bin counts
# ---------------------------------------------------------------------------
# The three classical histogram binning rules compared per type —
# the audit a rollup engine runs before materializing histogram
# tiers.  IQR from exact lower-quartile domain picks, sigma from
# exact power sums, range exact; the cube roots are the only libm
# calls (identical operands both engines).


def q_binning_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    dom = ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    d = dom.withColumn("cc", F.sum("c").over(wo)).withColumn(
        "n", F.sum("c").over(wt)
    )
    picks = d.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cc") * 4 >= F.col("n"), F.col("v"))
        ).alias("q1"),
        F.min(
            F.when(F.col("cc") * 4 >= 3 * F.col("n"), F.col("v"))
        ).alias("q3"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    mom = ev.groupBy("event_type").agg(
        F.sum("v").alias("s"), F.sum(F.col("v") * F.col("v")).alias("q")
    )
    j = picks.join(mom, "event_type")
    nd = F.col("n").cast("double")
    sigma = F.sqrt(
        (
            nd * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (nd * (nd - 1.0))
    )
    rng = (F.col("vmax") - F.col("vmin")).cast("double")
    iqr = (F.col("q3") - F.col("q1")).cast("double")
    crt = F.cbrt(nd)
    fd_w = 2.0 * iqr / crt
    sc_w = 3.49 * sigma / crt
    sturges = F.ceil(F.log2(nd)).cast("long") + 1
    return (
        j.filter((F.col("n") >= 2) & (iqr > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            (F.col("q3") - F.col("q1")).cast("long").alias("iqr_centi"),
            F.floor(sigma * 100 + F.lit(_OFF)).cast("long").alias(
                "sigma_e2"
            ),
            sturges.alias("sturges_k"),
            F.ceil(rng / fd_w).cast("long").alias("fd_k"),
            F.ceil(rng / sc_w).cast("long").alias("scott_k"),
        )
        .orderBy("event_type")
    )


SQL_BINNING = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dom AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), d AS (
  SELECT event_type, v,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dom
), picks AS (
  SELECT event_type, max(n) AS n,
         min(CASE WHEN cc * 4 >= n THEN v END) AS q1,
         min(CASE WHEN cc * 4 >= 3 * n THEN v END) AS q3,
         min(v) AS vmin, max(v) AS vmax
  FROM d GROUP BY 1
), mom AS (
  SELECT event_type, CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS q
  FROM ev GROUP BY 1
), j AS (
  SELECT picks.event_type, n, q1, q3, vmin, vmax,
         sqrt((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
              / (CAST(n AS DOUBLE) * (n - 1.0))) AS sigma
  FROM picks JOIN mom ON mom.event_type = picks.event_type
)
SELECT event_type, n, q3 - q1 AS iqr_centi,
       CAST(floor(sigma * 100 + {_OFF}) AS BIGINT) AS sigma_e2,
       CAST(ceil(log2(CAST(n AS DOUBLE))) AS BIGINT) + 1 AS sturges_k,
       CAST(ceil(CAST(vmax - vmin AS DOUBLE)
                 / (2.0 * (q3 - q1) / cbrt(CAST(n AS DOUBLE))))
            AS BIGINT) AS fd_k,
       CAST(ceil(CAST(vmax - vmin AS DOUBLE)
                 / (3.49 * sigma / cbrt(CAST(n AS DOUBLE))))
            AS BIGINT) AS scott_k
FROM j
WHERE n >= 2 AND q3 - q1 > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# katz_centrality — 3-step truncated Katz on the crawl-order graph
# ---------------------------------------------------------------------------
# Katz (Psychometrika 1953), truncated at walk length 3 with beta =
# 0.1 (the fixed-round discipline — no spectral iteration): c(v) =
# sum_l beta^l (A^l 1)(v).  Walk counts are two sparse adjacency
# self-joins on the ~|sources| node domain — exact integers; the
# final weighting is an exact rational.


def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    e0 = (
        d.withColumn("nxt", F.lead("source").over(w))
        .filter(
            F.col("nxt").isNotNull() & (F.col("source") != F.col("nxt"))
        )
        .select(
            F.least("source", "nxt").alias("a"),
            F.greatest("source", "nxt").alias("b"),
        )
        .distinct()
    )
    adj = e0.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e0.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    w1 = adj.groupBy("u").agg(F.count(F.lit(1)).alias("w1"))
    w2 = (
        adj.join(
            w1.select(F.col("u").alias("v"), F.col("w1").alias("wv")),
            "v",
        )
        .groupBy("u")
        .agg(F.sum("wv").alias("w2"))
    )
    w3 = (
        adj.join(
            w2.select(F.col("u").alias("v"), F.col("w2").alias("wv")),
            "v",
        )
        .groupBy("u")
        .agg(F.sum("wv").alias("w3"))
    )
    j = w1.join(w2, "u").join(w3, "u")
    katz = (
        F.col("w1").cast("double") * 0.1
        + F.col("w2").cast("double") * 0.01
        + F.col("w3").cast("double") * 0.001
    )
    return j.select(
        F.col("u").alias("node"),
        F.col("w1").cast("long").alias("walks1"),
        F.col("w2").cast("long").alias("walks2"),
        F.col("w3").cast("long").alias("walks3"),
        F.floor(katz * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "katz_e6"
        ),
    ).orderBy("node")


SQL_KATZ_CENTRALITY = f"""
WITH e0 AS (
  SELECT DISTINCT least(sa, sb) AS a, greatest(sa, sb) AS b
  FROM (
    SELECT source AS sa,
           lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS sb
    FROM documents
  ) WHERE sb IS NOT NULL AND sa <> sb
), adj AS (
  SELECT a AS u, b AS v FROM e0
  UNION ALL
  SELECT b AS u, a AS v FROM e0
), w1 AS (
  SELECT u, CAST(count(*) AS BIGINT) AS w1 FROM adj GROUP BY 1
), w2 AS (
  SELECT adj.u, CAST(sum(w1.w1) AS BIGINT) AS w2
  FROM adj JOIN w1 ON w1.u = adj.v GROUP BY 1
), w3 AS (
  SELECT adj.u, CAST(sum(w2.w2) AS BIGINT) AS w3
  FROM adj JOIN w2 ON w2.u = adj.v GROUP BY 1
)
SELECT w1.u AS node, w1.w1 AS walks1, w2.w2 AS walks2, w3.w3 AS walks3,
       CAST(floor((CAST(w1.w1 AS DOUBLE) * 0.1
                   + CAST(w2.w2 AS DOUBLE) * 0.01
                   + CAST(w3.w3 AS DOUBLE) * 0.001) * 1000000
                  + {_OFF}) AS BIGINT) AS katz_e6
FROM w1 JOIN w2 ON w2.u = w1.u JOIN w3 ON w3.u = w1.u
ORDER BY node
"""


# ---------------------------------------------------------------------------
# quantile_effects — weekend-vs-weekday quantile shifts with order-
# statistic CIs
# ---------------------------------------------------------------------------
# Distribution-free quantile inference (Woodruff 1952): at tau = .25 /
# .5 / .75 the weekend CI is the pair of order statistics at ranks
# n tau -+ z sqrt(n tau (1 - tau)) — no bootstrap, pure exact domain
# picks.  All quantiles are lower picks on the centivalue domain; the
# rank bounds use the shared z = 1.959964 literal and are clamped to
# [1, n].


_QE_Z = 1.959964


def q_quantile_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            (
                F.floor(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    / 86_400_000_000
                )
                % 7
            ).isin(2, 3)
        )
        .cast("long")
        .alias("we"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    dom = ev.groupBy("event_type", "we", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    wo = (
        Window.partitionBy("event_type", "we")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type", "we")
    d = dom.withColumn("cc", F.sum("c").over(wo)).withColumn(
        "n", F.sum("c").over(wt)
    )
    taus = spark.createDataFrame(
        [(25,), (50,), (75,)], "tau_e2 long"
    )
    dt = d.crossJoin(F.broadcast(taus))
    tq = F.col("tau_e2").cast("double") / 100.0
    target = F.ceil(F.col("n").cast("double") * tq)
    half = _QE_Z * F.sqrt(
        F.col("n").cast("double") * tq * (1.0 - tq)
    )
    rlo = F.greatest(
        F.lit(1.0), F.ceil(F.col("n").cast("double") * tq - half)
    )
    rhi = F.least(
        F.col("n").cast("double"),
        F.ceil(F.col("n").cast("double") * tq + half),
    )
    picks = dt.groupBy("event_type", "we", "tau_e2").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cc") >= target, F.col("v"))).alias("q"),
        F.min(F.when(F.col("cc") >= rlo, F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cc") >= rhi, F.col("v"))).alias("hi"),
    )
    a = picks.filter(F.col("we") == 0).select(
        "event_type",
        "tau_e2",
        F.col("n").alias("n_weekday"),
        F.col("q").alias("q_weekday"),
    )
    b = picks.filter(F.col("we") == 1).select(
        "event_type",
        "tau_e2",
        F.col("n").alias("n_weekend"),
        F.col("q").alias("q_weekend"),
        F.col("lo").alias("we_ci_lo"),
        F.col("hi").alias("we_ci_hi"),
    )
    j = a.join(b, ["event_type", "tau_e2"])
    return j.select(
        "event_type",
        "tau_e2",
        F.col("n_weekday").cast("long").alias("n_weekday"),
        F.col("n_weekend").cast("long").alias("n_weekend"),
        F.col("q_weekday").cast("long").alias("q_weekday"),
        F.col("q_weekend").cast("long").alias("q_weekend"),
        (F.col("q_weekend") - F.col("q_weekday"))
        .cast("long")
        .alias("diff_centi"),
        F.col("we_ci_lo").cast("long").alias("we_ci_lo"),
        F.col("we_ci_hi").cast("long").alias("we_ci_hi"),
    ).orderBy("event_type", "tau_e2")


SQL_QUANTILE_EFFECTS = f"""
WITH ev AS (
  SELECT event_type,
         CASE WHEN (CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7)
                   IN (2, 3) THEN 1 ELSE 0 END AS we,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dom AS (
  SELECT event_type, we, v, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2, 3
), d AS (
  SELECT event_type, we, v,
         CAST(sum(c) OVER (PARTITION BY event_type, we ORDER BY v)
              AS BIGINT) AS cc,
         CAST(sum(c) OVER (PARTITION BY event_type, we) AS BIGINT)
           AS n
  FROM dom
), dt AS (
  SELECT d.*, tau_e2 FROM d
  CROSS JOIN (SELECT unnest([25, 50, 75]) AS tau_e2)
), picks AS (
  SELECT event_type, we, tau_e2, max(n) AS n,
         min(CASE WHEN cc >= ceil(CAST(n AS DOUBLE)
                                  * (tau_e2 / 100.0))
                  THEN v END) AS q,
         min(CASE WHEN cc >= greatest(1.0,
               ceil(CAST(n AS DOUBLE) * (tau_e2 / 100.0)
                    - {_QE_Z!r} * sqrt(CAST(n AS DOUBLE)
                      * (tau_e2 / 100.0) * (1.0 - tau_e2 / 100.0))))
                  THEN v END) AS lo,
         min(CASE WHEN cc >= least(CAST(n AS DOUBLE),
               ceil(CAST(n AS DOUBLE) * (tau_e2 / 100.0)
                    + {_QE_Z!r} * sqrt(CAST(n AS DOUBLE)
                      * (tau_e2 / 100.0) * (1.0 - tau_e2 / 100.0))))
                  THEN v END) AS hi
  FROM dt GROUP BY 1, 2, 3
)
SELECT a.event_type, CAST(a.tau_e2 AS BIGINT) AS tau_e2,
       a.n AS n_weekday, b.n AS n_weekend,
       a.q AS q_weekday, b.q AS q_weekend,
       b.q - a.q AS diff_centi,
       b.lo AS we_ci_lo, b.hi AS we_ci_hi
FROM picks a JOIN picks b
  ON b.event_type = a.event_type AND b.tau_e2 = a.tau_e2
 AND a.we = 0 AND b.we = 1
ORDER BY a.event_type, a.tau_e2
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "jonckheere_terpstra": q_jonckheere_terpstra,
    "mood_median": q_mood_median,
    "brunner_munzel": q_brunner_munzel,
    "bartlett_test": q_bartlett_test,
    "gk_gamma": q_gk_gamma,
    "somers_d": q_somers_d,
    "uncertainty_coeff": q_uncertainty_coeff,
    "gk_lambda": q_gk_lambda,
    "hjorth_params": q_hjorth_params,
    "petrosian_fd": q_petrosian_fd,
    "katz_fd": q_katz_fd,
    "higuchi_fd": q_higuchi_fd,
    "lid_mle": q_lid_mle,
    "dunn_index": q_dunn_index,
    "mahalanobis_census": q_mahalanobis_census,
    "xie_beni": q_xie_beni,
    "hellinger_drift": q_hellinger_drift,
    "bhattacharyya_pairs": q_bhattacharyya_pairs,
    "tv_distance": q_tv_distance,
    "kuiper_test": q_kuiper_test,
    "watson_u2": q_watson_u2,
    "circ_linear_corr": q_circ_linear_corr,
    "bowker_symmetry": q_bowker_symmetry,
    "chao1_ace": q_chao1_ace,
    "dagostino_k2": q_dagostino_k2,
    "range_volatility": q_range_volatility,
    "downside_risk": q_downside_risk,
    "ansari_bradley": q_ansari_bradley,
    "theil_u2": q_theil_u2,
    "cochrane_orcutt": q_cochrane_orcutt,
    "capture_recapture": q_capture_recapture,
    "median_polish": q_median_polish,
    "readability_char": q_readability_char,
    "word_shape_entropy": q_word_shape_entropy,
    "wallis_moore": q_wallis_moore,
    "centroid_purity": q_centroid_purity,
    "deming_regression": q_deming_regression,
    "lin_ccc": q_lin_ccc,
    "bland_altman": q_bland_altman,
    "odds_ratio_woolf": q_odds_ratio_woolf,
    "effective_sample_size": q_effective_sample_size,
    "partial_corr": q_partial_corr,
    "breusch_pagan": q_breusch_pagan,
    "chow_test": q_chow_test,
    "bracket_balance": q_bracket_balance,
    "herdan_c": q_herdan_c,
    "mark_gap_corr": q_mark_gap_corr,
    "ecological_corr": q_ecological_corr,
    "zipf_mandelbrot": q_zipf_mandelbrot,
    "ad_ksample": q_ad_ksample,
    "negbin_fit": q_negbin_fit,
    "kupiec_pof": q_kupiec_pof,
    "sprt_conversion": q_sprt_conversion,
    "good_turing_counts": q_good_turing_counts,
    "dunning_llr": q_dunning_llr,
    "tukey_additivity": q_tukey_additivity,
    "gries_dp": q_gries_dp,
    "fisher_score_dims": q_fisher_score_dims,
    "dow_profile_cosine": q_dow_profile_cosine,
    "peak_shift": q_peak_shift,
    "rmst": q_rmst,
    "yuen_t": q_yuen_t,
    "siegel_slope": q_siegel_slope,
    "adamic_adar": q_adamic_adar,
    "markov_order_test": q_markov_order_test,
    "isotonic_hour": q_isotonic_hour,
    "christoffersen_ind": q_christoffersen_ind,
    "weekly_coherence": q_weekly_coherence,
    "benford_second": q_benford_second,
    "binning_rules": q_binning_rules,
    "katz_centrality": q_katz_centrality,
    "quantile_effects": q_quantile_effects,
}

ORACLE_SQL: dict[str, str] = {
    "jonckheere_terpstra": SQL_JONCKHEERE,
    "mood_median": SQL_MOOD,
    "brunner_munzel": SQL_BRUNNER,
    "bartlett_test": SQL_BARTLETT,
    "gk_gamma": SQL_GK_GAMMA,
    "somers_d": SQL_SOMERS,
    "uncertainty_coeff": SQL_UNCERTAINTY,
    "gk_lambda": SQL_GK_LAMBDA,
    "hjorth_params": SQL_HJORTH,
    "petrosian_fd": SQL_PETROSIAN,
    "katz_fd": SQL_KATZ,
    "higuchi_fd": SQL_HIGUCHI,
    "lid_mle": SQL_LID,
    "dunn_index": SQL_DUNN,
    "mahalanobis_census": SQL_MAHALANOBIS,
    "xie_beni": SQL_XIE_BENI,
    "hellinger_drift": SQL_HELLINGER,
    "bhattacharyya_pairs": SQL_BHATTACHARYYA,
    "tv_distance": SQL_TV,
    "kuiper_test": SQL_KUIPER,
    "watson_u2": SQL_WATSON,
    "circ_linear_corr": SQL_CIRC_LINEAR,
    "bowker_symmetry": SQL_BOWKER,
    "chao1_ace": SQL_CHAO1,
    "dagostino_k2": SQL_DAGOSTINO,
    "range_volatility": SQL_RANGE_VOL,
    "downside_risk": SQL_DOWNSIDE,
    "ansari_bradley": SQL_ANSARI,
    "theil_u2": SQL_THEIL_U2,
    "cochrane_orcutt": SQL_COCHRANE,
    "capture_recapture": SQL_CAPTURE,
    "median_polish": SQL_MEDIAN_POLISH,
    "readability_char": SQL_READABILITY_CHAR,
    "word_shape_entropy": SQL_WORD_SHAPE,
    "wallis_moore": SQL_WALLIS,
    "centroid_purity": SQL_CENTROID_PURITY,
    "deming_regression": SQL_DEMING,
    "lin_ccc": SQL_LIN_CCC,
    "bland_altman": SQL_BLAND_ALTMAN,
    "odds_ratio_woolf": SQL_ODDS_RATIO,
    "effective_sample_size": SQL_ESS,
    "partial_corr": SQL_PARTIAL,
    "breusch_pagan": SQL_BREUSCH,
    "chow_test": SQL_CHOW,
    "bracket_balance": SQL_BRACKET,
    "herdan_c": SQL_HERDAN,
    "mark_gap_corr": SQL_MARK_GAP,
    "ecological_corr": SQL_ECOLOGICAL,
    "zipf_mandelbrot": SQL_ZIPF_MANDELBROT,
    "ad_ksample": SQL_AD_KSAMPLE,
    "negbin_fit": SQL_NEGBIN,
    "kupiec_pof": SQL_KUPIEC,
    "sprt_conversion": SQL_SPRT,
    "good_turing_counts": SQL_GOOD_TURING,
    "dunning_llr": SQL_DUNNING,
    "tukey_additivity": SQL_TUKEY_ADD,
    "gries_dp": SQL_GRIES_DP,
    "fisher_score_dims": SQL_FISHER_DIMS,
    "dow_profile_cosine": SQL_DOW_COSINE,
    "peak_shift": SQL_PEAK_SHIFT,
    "rmst": SQL_RMST,
    "yuen_t": SQL_YUEN,
    "siegel_slope": SQL_SIEGEL,
    "adamic_adar": SQL_ADAMIC,
    "markov_order_test": SQL_MARKOV_ORDER,
    "isotonic_hour": SQL_ISOTONIC,
    "christoffersen_ind": SQL_CHRISTOFFERSEN,
    "weekly_coherence": SQL_WEEKLY_COHERENCE,
    "benford_second": SQL_BENFORD2,
    "binning_rules": SQL_BINNING,
    "katz_centrality": SQL_KATZ_CENTRALITY,
    "quantile_effects": SQL_QUANTILE_EFFECTS,
}

# the centroid CTE block is shared verbatim with the stats8 cluster
# indices so the two batteries stay numerically comparable
from diive_spark.queries_stats8 import _SQL_CENT as _SQL_CENT10  # noqa: E402

ORACLE_SQL["dunn_index"] = SQL_DUNN.format(cent=_SQL_CENT10)
ORACLE_SQL["xie_beni"] = SQL_XIE_BENI.format(cent=_SQL_CENT10)
ORACLE_SQL["centroid_purity"] = SQL_CENTROID_PURITY.format(
    cent=_SQL_CENT10
)
