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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "jonckheere_terpstra": q_jonckheere_terpstra,
    "mood_median": q_mood_median,
    "brunner_munzel": q_brunner_munzel,
    "bartlett_test": q_bartlett_test,
}

ORACLE_SQL: dict[str, str] = {
    "jonckheere_terpstra": SQL_JONCKHEERE,
    "mood_median": SQL_MOOD,
    "brunner_munzel": SQL_BRUNNER,
    "bartlett_test": SQL_BARTLETT,
}
