"""Round-4 continuation registry (twentieth module): the
late-session battery set.

Oracle-backed: clustering agreement (Adjusted Rand, V-measure),
fiscal incidence (Kakwani/Suits/Reynolds-Smolensky), queueing laws
(Pollaczek-Khinchine + Kingman), dependence (rho_DCCA), record
linkage (Fellegi-Sunter EM), graph distances (Floyd-Warshall APSP),
phonetic blocking (Soundex), forecast accuracy (Theil U1), SPC
(MEWMA), homogeneity (SNHT, von Neumann), two-sample (CvM, Kuiper),
information (Renyi spectrum), signal shape, variance structure
(ICSS, Brown-Forsythe), poverty (FGT + Sen), corpus comparison
(rank-turbulence divergence), and time irreversibility
(Porta/Guzik/Ehlers).

Rows-only kernels (each pytest-pinned against an independent
oracle): 0-dim sublevel persistence, DGIM window counting, sequence
alignment (NW/SW/LCS), ADWIN drift, NCD similarity, UCB1 replay,
Jenks natural breaks, horizontal visibility graphs, SSA spectra,
Lindley wait audit, and Belady OPT cache bounds.

House discipline throughout: exact integer backbones (floor-scaled
centivalues, n*y - S deviations, doubled midranks), per-term e-floor
before any cross-engine double sum, deterministic tie-breaks, and
bounded collects only (<= 16-row EM tables, k x k matrices).  Every
battery's physical-plan audit lives in PLANS.md §§114-135.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


# ---------------------------------------------------------------------------
# shared: per-user dual labels (a = modal event type, b = activity
# magnitude), then the label-pair contingency cells
# ---------------------------------------------------------------------------


def _label_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type"
    )
    pu = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wm = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    mode = (
        pu.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("a"))
    )
    # ADVICE r4: floor(log2(c)) is the boundary-double class CLAUDE.md bans
    # (Spark StrictMath.log(x)/log(2) vs DuckDB libm log2 differ in the last
    # ulp at exact powers of two).  Compute the bucket in exact integer
    # arithmetic instead: broadcast-join a 41-row power-of-two threshold
    # table (covers counts < 2^41; beyond that the inner join drops the user
    # and the row-count compare fails LOUDLY rather than silently drifting).
    thr = spark.range(0, 41).select(
        F.col("id").cast("long").alias("b"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").alias("lo"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(id + 1 AS INT)) - 1"
        ).alias("hi"),
    )
    tot = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(
            F.broadcast(thr),
            (F.col("c") >= F.col("lo")) & (F.col("c") <= F.col("hi")),
        )
        .select("user_id", "b")
    )
    lab = mode.join(tot, "user_id")
    return lab.groupBy("a", "b").agg(F.count(F.lit(1)).alias("nij"))


_CELLS_SQL = """cells AS (
  WITH pu AS (
    SELECT user_id, event_type, count(*) AS c
    FROM events GROUP BY 1, 2
  ), mode AS (
    SELECT user_id, event_type AS a
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY c DESC, event_type ASC
             ) AS rn
      FROM pu
    ) WHERE rn = 1
  ), cnt AS (
    SELECT user_id, count(*) AS c
    FROM events GROUP BY 1
  ), thr AS (
    -- exact-integer twin of the Spark power-of-two bucket join (ADVICE r4)
    SELECT CAST(k AS BIGINT) AS b,
           (CAST(1 AS BIGINT) << k) AS lo,
           ((CAST(1 AS BIGINT) << (k + 1)) - 1) AS hi
    FROM range(41) t(k)
  ), tot AS (
    SELECT cnt.user_id, thr.b
    FROM cnt JOIN thr ON cnt.c BETWEEN thr.lo AND thr.hi
  )
  SELECT mode.a, tot.b, CAST(count(*) AS BIGINT) AS nij
  FROM mode JOIN tot USING (user_id)
  GROUP BY 1, 2
)"""


# ---------------------------------------------------------------------------
# adjusted_rand_index — Hubert-Arabie chance-corrected pair counting
# ---------------------------------------------------------------------------
# ARI = (S_ij - S_a S_b / C(n,2))
#     / ((S_a + S_b)/2 - S_a S_b / C(n,2)),
# with S_ij = sum C(n_ij,2), S_a/S_b the marginal pair sums — all
# exact int64 (n ~ 1e4 users at sf0.1 -> S ~ 1e8, products ~ 1e16);
# only the final ratio is a double, e6-floored.


def q_adjusted_rand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _label_cells(spark, sf_dir)
    pairs = cells.select(
        "a",
        "b",
        "nij",
        (F.col("nij") * (F.col("nij") - 1) / 2).cast("long").alias("pij"),
    )
    sa = pairs.groupBy("a").agg(F.sum("nij").alias("ai")).select(
        (F.col("ai") * (F.col("ai") - 1) / 2).cast("long").alias("pa")
    ).agg(F.sum("pa").alias("sa"))
    sb = pairs.groupBy("b").agg(F.sum("nij").alias("bj")).select(
        (F.col("bj") * (F.col("bj") - 1) / 2).cast("long").alias("pb")
    ).agg(F.sum("pb").alias("sb"))
    top = pairs.agg(
        F.sum("nij").alias("n"), F.sum("pij").alias("sij")
    )
    j = top.crossJoin(sa).crossJoin(sb)
    cn2 = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
    exp = F.col("sa").cast("double") * F.col("sb").cast("double") / cn2
    ari = (F.col("sij").cast("double") - exp) / (
        (F.col("sa") + F.col("sb")).cast("double") / 2.0 - exp
    )
    return j.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("sij").cast("long").alias("sum_pairs_cells"),
        F.col("sa").cast("long").alias("sum_pairs_a"),
        F.col("sb").cast("long").alias("sum_pairs_b"),
        F.floor(ari * 1_000_000 + F.lit(_OFF)).cast("long").alias("ari_e6"),
    )


SQL_ARI = f"""
WITH {_CELLS_SQL}
, pij AS (
  SELECT a, b, nij, CAST(nij * (nij - 1) // 2 AS BIGINT) AS pij
  FROM cells
), sa AS (
  SELECT CAST(sum(CAST(ai * (ai - 1) // 2 AS BIGINT)) AS BIGINT) AS sa
  FROM (SELECT a, CAST(sum(nij) AS BIGINT) AS ai FROM cells GROUP BY 1)
), sb AS (
  SELECT CAST(sum(CAST(bj * (bj - 1) // 2 AS BIGINT)) AS BIGINT) AS sb
  FROM (SELECT b, CAST(sum(nij) AS BIGINT) AS bj FROM cells GROUP BY 1)
), top AS (
  SELECT CAST(sum(nij) AS BIGINT) AS n,
         CAST(sum(pij) AS BIGINT) AS sij
  FROM pij
)
SELECT CAST(n AS BIGINT) AS n_users,
       sij AS sum_pairs_cells,
       sa AS sum_pairs_a,
       sb AS sum_pairs_b,
       CAST(floor(
         (CAST(sij AS DOUBLE)
          - CAST(sa AS DOUBLE) * sb / (CAST(n AS DOUBLE) * (n - 1) / 2))
         / ((CAST(sa AS DOUBLE) + sb) / 2.0
            - CAST(sa AS DOUBLE) * sb / (CAST(n AS DOUBLE) * (n - 1) / 2))
         * 1000000 + {_OFF}) AS BIGINT) AS ari_e6
FROM top CROSS JOIN sa CROSS JOIN sb
"""

QUERIES["adjusted_rand_index"] = q_adjusted_rand_index
ORACLE_SQL["adjusted_rand_index"] = SQL_ARI


# ---------------------------------------------------------------------------
# v_measure_clustering — homogeneity / completeness / V
# ---------------------------------------------------------------------------
# h = 1 - H(A|B)/H(A), c = 1 - H(B|A)/H(B), V = 2hc/(h+c), with
# H(A|B) = H(AB) - H(B).  Entropy sums follow the uncertainty_coeff
# discipline: per-cell floor(p * ln(n/o) * 1e9 + OFF) from exact
# integer counts, summed exactly, ratios as one double expression.


def q_v_measure_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _label_cells(spark, sf_dir).withColumn(
        "nn", F.sum("nij").over(Window.partitionBy())
    )

    def ent9(cnt: F.Column) -> F.Column:
        p = cnt.cast("double") / F.col("nn")
        q = F.col("nn").cast("double") / cnt
        return F.floor(p * F.log(q) * 1e9 + F.lit(_OFF)).cast("long")

    hab = cells.select("nn", ent9(F.col("nij")).alias("t")).groupBy(
        "nn"
    ).agg(F.sum("t").alias("hab9"))
    ha = (
        cells.groupBy("a")
        .agg(F.sum("nij").alias("ai"), F.max("nn").alias("nn"))
        .select("nn", ent9(F.col("ai")).alias("t"))
        .groupBy("nn")
        .agg(F.sum("t").alias("ha9"))
    )
    hb = (
        cells.groupBy("b")
        .agg(F.sum("nij").alias("bj"), F.max("nn").alias("nn"))
        .select("nn", ent9(F.col("bj")).alias("t"))
        .groupBy("nn")
        .agg(F.sum("t").alias("hb9"))
    )
    j = hab.join(ha, "nn").join(hb, "nn")
    h = 1.0 - (F.col("hab9") - F.col("hb9")).cast("double") / F.col(
        "ha9"
    ).cast("double")
    c = 1.0 - (F.col("hab9") - F.col("ha9")).cast("double") / F.col(
        "hb9"
    ).cast("double")
    v = 2.0 * h * c / (h + c)
    return j.select(
        F.col("nn").cast("long").alias("n_users"),
        F.col("ha9").cast("long").alias("h_a_e9"),
        F.col("hb9").cast("long").alias("h_b_e9"),
        F.col("hab9").cast("long").alias("h_ab_e9"),
        F.floor(h * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "homogeneity_e6"
        ),
        F.floor(c * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "completeness_e6"
        ),
        F.floor(v * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "v_measure_e6"
        ),
    )


SQL_VMEASURE = f"""
WITH {_CELLS_SQL}
, cc AS (
  SELECT a, b, nij, CAST(sum(nij) OVER () AS BIGINT) AS nn FROM cells
), hab AS (
  SELECT nn,
         CAST(sum(CAST(floor(CAST(nij AS DOUBLE) / nn
                             * ln(CAST(nn AS DOUBLE) / nij) * 1e9
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS hab9
  FROM cc GROUP BY 1
), ha AS (
  SELECT nn,
         CAST(sum(CAST(floor(CAST(ai AS DOUBLE) / nn
                             * ln(CAST(nn AS DOUBLE) / ai) * 1e9
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS ha9
  FROM (SELECT a, CAST(sum(nij) AS BIGINT) AS ai, max(nn) AS nn
        FROM cc GROUP BY 1)
  GROUP BY 1
), hb AS (
  SELECT nn,
         CAST(sum(CAST(floor(CAST(bj AS DOUBLE) / nn
                             * ln(CAST(nn AS DOUBLE) / bj) * 1e9
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS hb9
  FROM (SELECT b, CAST(sum(nij) AS BIGINT) AS bj, max(nn) AS nn
        FROM cc GROUP BY 1)
  GROUP BY 1
)
SELECT CAST(nn AS BIGINT) AS n_users,
       ha9 AS h_a_e9, hb9 AS h_b_e9, hab9 AS h_ab_e9,
       CAST(floor((1.0 - CAST(hab9 - hb9 AS DOUBLE) / ha9) * 1000000
                  + {_OFF}) AS BIGINT) AS homogeneity_e6,
       CAST(floor((1.0 - CAST(hab9 - ha9 AS DOUBLE) / hb9) * 1000000
                  + {_OFF}) AS BIGINT) AS completeness_e6,
       CAST(floor(
         2.0 * (1.0 - CAST(hab9 - hb9 AS DOUBLE) / ha9)
             * (1.0 - CAST(hab9 - ha9 AS DOUBLE) / hb9)
         / ((1.0 - CAST(hab9 - hb9 AS DOUBLE) / ha9)
            + (1.0 - CAST(hab9 - ha9 AS DOUBLE) / hb9))
         * 1000000 + {_OFF}) AS BIGINT) AS v_measure_e6
FROM hab JOIN ha USING (nn) JOIN hb USING (nn)
"""

QUERIES["v_measure_clustering"] = q_v_measure_clustering
ORACLE_SQL["v_measure_clustering"] = SQL_VMEASURE


# ===========================================================================
# Battery B — fiscal incidence: Kakwani progressivity, Suits index,
# Reynolds-Smolensky redistribution over a deterministic in-engine
# marginal levy (30% of per-user spend above the per-type median).
# ===========================================================================
# Treating each user's exact centivalue spend inside an event type as
# the "income" unit, the levy is tax(v) = (v - T) * 3 // 10 for
# v > T (T = the type's exact median-order-statistic income), an
# integer-pure rule both engines spell identically.  All four
# concentration curves (Lorenz L, tax concentration Q, post-tax R,
# population p) are trapezoid integrals over the COLLAPSED income
# value-domain: per-type windows over ~n_users(type) distinct incomes
# — the lorenz_curve/gmd posture, no pair joins, no global windows.
#   G_pre    = 1 - sum dp (L_i + L_{i-1})
#   C_tax    = 1 - sum dp (Q_i + Q_{i-1})     Kakwani = C_tax - G_pre
#   C_post   = 1 - sum dp (R_i + R_{i-1})     RS      = G_pre - C_post
#   Suits    = 1 - sum dL (Q_i + Q_{i-1})
# Per-row trapezoid terms are e12-floored doubles built from exact
# int64 cumulatives, then exactly summed per type.


def _incidence_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "cv"
        ),
    )
    inc = ev.groupBy("event_type", "user_id").agg(
        F.sum("cv").alias("inc")
    )
    dom = inc.groupBy("event_type", "inc").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("event_type").orderBy("inc")
    wt = Window.partitionBy("event_type")
    cum = (
        dom.withColumn("cumn", F.sum("c").over(wv))
        .withColumn("n", F.sum("c").over(wt))
    )
    med = cum.filter(
        F.col("cumn") >= (F.col("n") + 1) / 2
    ).groupBy("event_type").agg(F.min("inc").alias("t_med"))
    d = dom.join(med, "event_type").withColumn(
        "tax",
        F.when(
            F.col("inc") > F.col("t_med"),
            ((F.col("inc") - F.col("t_med")) * 3 / 10).cast("long"),
        ).otherwise(F.lit(0)),
    ).withColumn("post", F.col("inc") - F.col("tax"))
    s = (
        d.withColumn("si", F.col("c") * F.col("inc"))
        .withColumn("sq", F.col("c") * F.col("tax"))
        .withColumn("sr", F.col("c") * F.col("post"))
    )
    c2 = (
        s.withColumn("cumn", F.sum("c").over(wv))
        .withColumn("cums", F.sum("si").over(wv))
        .withColumn("cumq", F.sum("sq").over(wv))
        .withColumn("cumr", F.sum("sr").over(wv))
        .withColumn("n", F.sum("c").over(wt))
        .withColumn("st", F.sum("si").over(wt))
        .withColumn("qt", F.sum("sq").over(wt))
        .withColumn("rt", F.sum("sr").over(wt))
    )

    def trap12(dshare_num, dshare_den, lev_cum, lev_row, lev_tot):
        # dshare * (Lev_i + Lev_{i-1}) with Lev cum shares, e12-floored
        return F.floor(
            dshare_num.cast("double")
            / dshare_den.cast("double")
            * (2 * lev_cum - lev_row).cast("double")
            / lev_tot.cast("double")
            * 1e12
            + F.lit(_OFF)
        ).cast("long")

    return c2.select(
        "event_type",
        "n",
        "st",
        "qt",
        F.col("t_med").alias("t_med"),
        trap12(F.col("c"), F.col("n"), F.col("cums"), F.col("si"), F.col("st")).alias("g12"),
        trap12(F.col("c"), F.col("n"), F.col("cumq"), F.col("sq"), F.col("qt")).alias("q12"),
        trap12(F.col("c"), F.col("n"), F.col("cumr"), F.col("sr"), F.col("rt")).alias("r12"),
        trap12(F.col("si"), F.col("st"), F.col("cumq"), F.col("sq"), F.col("qt")).alias("s12"),
    )


_INCIDENCE_SQL = """terms AS (
  WITH inc AS (
    SELECT event_type, user_id,
           CAST(sum(CAST(floor(value * 100 + {off}) AS BIGINT))
                AS BIGINT) AS inc
    FROM events GROUP BY 1, 2
  ), dom AS (
    SELECT event_type, inc, CAST(count(*) AS BIGINT) AS c
    FROM inc GROUP BY 1, 2
  ), cum0 AS (
    SELECT *,
           CAST(sum(c) OVER (PARTITION BY event_type ORDER BY inc)
                AS BIGINT) AS cumn,
           CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM dom
  ), med AS (
    SELECT event_type, min(inc) AS t_med
    FROM cum0 WHERE cumn >= (n + 1) / 2.0 GROUP BY 1
  ), d AS (
    SELECT dom.event_type, dom.inc, dom.c, med.t_med,
           CASE WHEN dom.inc > med.t_med
                THEN (dom.inc - med.t_med) * 3 // 10 ELSE 0 END AS tax
    FROM dom JOIN med USING (event_type)
  ), s AS (
    SELECT *, inc - tax AS post,
           c * inc AS si, c * tax AS sq, c * (inc - tax) AS sr
    FROM d
  ), c2 AS (
    SELECT *,
           CAST(sum(c)  OVER w AS BIGINT) AS cumn,
           CAST(sum(si) OVER w AS BIGINT) AS cums,
           CAST(sum(sq) OVER w AS BIGINT) AS cumq,
           CAST(sum(sr) OVER w AS BIGINT) AS cumr,
           CAST(sum(c)  OVER t AS BIGINT) AS n,
           CAST(sum(si) OVER t AS BIGINT) AS st,
           CAST(sum(sq) OVER t AS BIGINT) AS qt,
           CAST(sum(sr) OVER t AS BIGINT) AS rt
    FROM s
    WINDOW w AS (PARTITION BY event_type ORDER BY inc),
           t AS (PARTITION BY event_type)
  )
  SELECT event_type, n, st, qt, t_med,
         CAST(floor(CAST(c AS DOUBLE) / n
                    * CAST(2 * cums - si AS DOUBLE) / st * 1e12
                    + {off}) AS BIGINT) AS g12,
         CAST(floor(CAST(c AS DOUBLE) / n
                    * CAST(2 * cumq - sq AS DOUBLE) / qt * 1e12
                    + {off}) AS BIGINT) AS q12,
         CAST(floor(CAST(c AS DOUBLE) / n
                    * CAST(2 * cumr - sr AS DOUBLE) / rt * 1e12
                    + {off}) AS BIGINT) AS r12,
         CAST(floor(CAST(si AS DOUBLE) / st
                    * CAST(2 * cumq - sq AS DOUBLE) / qt * 1e12
                    + {off}) AS BIGINT) AS s12
  FROM c2
)"""


def q_kakwani_suits(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _incidence_terms(spark, sf_dir)
    agg = t.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("st").alias("st"),
        F.max("qt").alias("qt"),
        F.max("t_med").alias("t_med"),
        F.sum("g12").alias("sg"),
        F.sum("q12").alias("sq"),
        F.sum("s12").alias("ss"),
    )
    g = 1.0 - F.col("sg").cast("double") / 1e12
    cq = 1.0 - F.col("sq").cast("double") / 1e12
    su = 1.0 - F.col("ss").cast("double") / 1e12
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.col("t_med").cast("long").alias("median_income_c"),
        F.floor(
            F.col("qt").cast("double") / F.col("st").cast("double") * 1e6
            + F.lit(_OFF)
        ).cast("long").alias("avg_rate_e6"),
        F.floor(g * 1e6 + F.lit(_OFF)).cast("long").alias("gini_pre_e6"),
        F.floor(cq * 1e6 + F.lit(_OFF)).cast("long").alias("c_tax_e6"),
        F.floor((cq - g) * 1e6 + F.lit(_OFF)).cast("long").alias(
            "kakwani_e6"
        ),
        F.floor(su * 1e6 + F.lit(_OFF)).cast("long").alias("suits_e6"),
    ).orderBy("event_type")


SQL_KAKWANI = f"""
WITH {_INCIDENCE_SQL.format(off=_OFF)}
, agg AS (
  SELECT event_type, max(n) AS n, max(st) AS st, max(qt) AS qt,
         max(t_med) AS t_med,
         CAST(sum(g12) AS BIGINT) AS sg,
         CAST(sum(q12) AS BIGINT) AS sq,
         CAST(sum(s12) AS BIGINT) AS ss
  FROM terms GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_users,
       CAST(t_med AS BIGINT) AS median_income_c,
       CAST(floor(CAST(qt AS DOUBLE) / st * 1e6 + {_OFF}) AS BIGINT)
         AS avg_rate_e6,
       CAST(floor((1.0 - CAST(sg AS DOUBLE) / 1e12) * 1e6 + {_OFF})
            AS BIGINT) AS gini_pre_e6,
       CAST(floor((1.0 - CAST(sq AS DOUBLE) / 1e12) * 1e6 + {_OFF})
            AS BIGINT) AS c_tax_e6,
       CAST(floor(((1.0 - CAST(sq AS DOUBLE) / 1e12)
                   - (1.0 - CAST(sg AS DOUBLE) / 1e12)) * 1e6 + {_OFF})
            AS BIGINT) AS kakwani_e6,
       CAST(floor((1.0 - CAST(ss AS DOUBLE) / 1e12) * 1e6 + {_OFF})
            AS BIGINT) AS suits_e6
FROM agg
ORDER BY event_type
"""

QUERIES["kakwani_suits"] = q_kakwani_suits
ORACLE_SQL["kakwani_suits"] = SQL_KAKWANI


def q_reynolds_smolensky(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _incidence_terms(spark, sf_dir)
    agg = t.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("g12").alias("sg"),
        F.sum("r12").alias("sr"),
    )
    g = 1.0 - F.col("sg").cast("double") / 1e12
    cr = 1.0 - F.col("sr").cast("double") / 1e12
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.floor(g * 1e6 + F.lit(_OFF)).cast("long").alias("gini_pre_e6"),
        F.floor(cr * 1e6 + F.lit(_OFF)).cast("long").alias("c_post_e6"),
        F.floor((g - cr) * 1e6 + F.lit(_OFF)).cast("long").alias(
            "reynolds_smolensky_e6"
        ),
    ).orderBy("event_type")


SQL_RS = f"""
WITH {_INCIDENCE_SQL.format(off=_OFF)}
, agg AS (
  SELECT event_type, max(n) AS n,
         CAST(sum(g12) AS BIGINT) AS sg,
         CAST(sum(r12) AS BIGINT) AS sr
  FROM terms GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_users,
       CAST(floor((1.0 - CAST(sg AS DOUBLE) / 1e12) * 1e6 + {_OFF})
            AS BIGINT) AS gini_pre_e6,
       CAST(floor((1.0 - CAST(sr AS DOUBLE) / 1e12) * 1e6 + {_OFF})
            AS BIGINT) AS c_post_e6,
       CAST(floor(((1.0 - CAST(sg AS DOUBLE) / 1e12)
                   - (1.0 - CAST(sr AS DOUBLE) / 1e12)) * 1e6 + {_OFF})
            AS BIGINT) AS reynolds_smolensky_e6
FROM agg
ORDER BY event_type
"""

QUERIES["reynolds_smolensky"] = q_reynolds_smolensky
ORACLE_SQL["reynolds_smolensky"] = SQL_RS


# ===========================================================================
# Battery C — queueing audits: Pollaczek-Khinchine M/G/1 mean queue
# wait and the Kingman (1961) G/G/1 heavy-traffic approximation, per
# event type, from moments fitted in-engine.
# ===========================================================================
# Arrival stream = the type's event times (exact second-truncated
# interarrival gaps off ONE per-type lag window); service times = the
# event's value in seconds (exact centivalue integers).  Every moment
# is an exact int64 sum, so the squared-CVs are pure integer ratios:
#   ca2 = (m sum(g^2) - sum(g)^2) / sum(g)^2     (population CV^2)
#   cs2 = (n sum(s^2) - sum(s)^2) / sum(s)^2
#   rho = sum(s_c) * 1e4 / T_us
#   Wq_PK      = 100 sum(s_c^2) / (2 T_us (1 - rho))       [seconds]
#   Wq_Kingman = rho/(1-rho) * (ca2+cs2)/2 * sum(s_c)/(100 n)
# Complements erlang_b_blocking / erlang_c_wait (Markovian multi-
# server) with the single-server general-service laws; inspection
# paradox / think_time cover the residual-life side.


def q_mg1_pollaczek_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "sc"
        ),
    )
    wt = Window.partitionBy("event_type").orderBy("us", "event_id")
    g = ev.withColumn(
        "gs",
        ((F.lead("us").over(wt) - F.col("us")) / 1_000_000).cast("long"),
    )
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("us").alias("us0"),
        F.max("us").alias("us1"),
        F.sum("sc").alias("ss"),
        F.sum(F.col("sc") * F.col("sc")).alias("ss2"),
        F.sum("gs").alias("sg"),
        F.sum(F.col("gs") * F.col("gs")).alias("sg2"),
        F.count("gs").alias("m"),
    )
    tus = (F.col("us1") - F.col("us0")).cast("double")
    rho = F.col("ss").cast("double") * 1e4 / tus
    ca2 = (
        F.col("m").cast("double") * F.col("sg2").cast("double")
        - F.col("sg").cast("double") * F.col("sg").cast("double")
    ) / (F.col("sg").cast("double") * F.col("sg").cast("double"))
    cs2 = (
        F.col("n").cast("double") * F.col("ss2").cast("double")
        - F.col("ss").cast("double") * F.col("ss").cast("double")
    ) / (F.col("ss").cast("double") * F.col("ss").cast("double"))
    wq_pk = (
        100.0 * F.col("ss2").cast("double") / (2.0 * tus * (1.0 - rho))
    )
    wq_k = (
        rho
        / (1.0 - rho)
        * (ca2 + cs2)
        / 2.0
        * F.col("ss").cast("double")
        / (100.0 * F.col("n").cast("double"))
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(rho * 1e6 + F.lit(_OFF)).cast("long").alias("rho_e6"),
        F.floor(ca2 * 1e6 + F.lit(_OFF)).cast("long").alias("ca2_e6"),
        F.floor(cs2 * 1e6 + F.lit(_OFF)).cast("long").alias("cs2_e6"),
        F.floor(wq_pk * 1e6 + F.lit(_OFF)).cast("long").alias(
            "wq_pk_e6_s"
        ),
        F.floor(wq_k * 1e6 + F.lit(_OFF)).cast("long").alias(
            "wq_kingman_e6_s"
        ),
    ).orderBy("event_type")


SQL_MG1 = f"""
WITH g AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) AS us,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS sc,
         (lead(CAST(epoch_us(ts) AS BIGINT)) OVER (
            PARTITION BY event_type
            ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id
          ) - CAST(epoch_us(ts) AS BIGINT)) // 1000000 AS gs
  FROM events
), agg AS (
  SELECT event_type,
         count(*) AS n,
         min(us) AS us0, max(us) AS us1,
         CAST(sum(sc) AS BIGINT) AS ss,
         CAST(sum(sc * sc) AS BIGINT) AS ss2,
         CAST(sum(gs) AS BIGINT) AS sg,
         CAST(sum(gs * gs) AS BIGINT) AS sg2,
         count(gs) AS m
  FROM g GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(ss AS DOUBLE) * 1e4 / (us1 - us0) * 1e6 + {_OFF})
            AS BIGINT) AS rho_e6,
       CAST(floor((CAST(m AS DOUBLE) * sg2 - CAST(sg AS DOUBLE) * sg)
                  / (CAST(sg AS DOUBLE) * sg) * 1e6 + {_OFF})
            AS BIGINT) AS ca2_e6,
       CAST(floor((CAST(n AS DOUBLE) * ss2 - CAST(ss AS DOUBLE) * ss)
                  / (CAST(ss AS DOUBLE) * ss) * 1e6 + {_OFF})
            AS BIGINT) AS cs2_e6,
       CAST(floor(100.0 * CAST(ss2 AS DOUBLE)
                  / (2.0 * (us1 - us0)
                     * (1.0 - CAST(ss AS DOUBLE) * 1e4 / (us1 - us0)))
                  * 1e6 + {_OFF}) AS BIGINT) AS wq_pk_e6_s,
       CAST(floor(
         (CAST(ss AS DOUBLE) * 1e4 / (us1 - us0))
         / (1.0 - CAST(ss AS DOUBLE) * 1e4 / (us1 - us0))
         * ((CAST(m AS DOUBLE) * sg2 - CAST(sg AS DOUBLE) * sg)
              / (CAST(sg AS DOUBLE) * sg)
            + (CAST(n AS DOUBLE) * ss2 - CAST(ss AS DOUBLE) * ss)
              / (CAST(ss AS DOUBLE) * ss)) / 2.0
         * CAST(ss AS DOUBLE) / (100.0 * n)
         * 1e6 + {_OFF}) AS BIGINT) AS wq_kingman_e6_s
FROM agg
ORDER BY event_type
"""

QUERIES["mg1_pollaczek_wait"] = q_mg1_pollaczek_wait
ORACLE_SQL["mg1_pollaczek_wait"] = SQL_MG1


# ===========================================================================
# Battery C2 — dcca_coefficient: detrended cross-correlation (Zebende
# 2011 rho_DCCA) between every event-type pair's hourly mean series.
# ===========================================================================
# Common-hour alignment via one self-join of the (type, hour) table on
# hour; per-pair position index t; boxes of 8 points (partial tail box
# dropped).  Within each box the linear-detrended residual cross sum
# has the closed form (t_loc = 0..7, St=28, Stt=140, 8*Stt-St^2=336):
#   N = 336*(8*Sxy - Sx*Sy) - (8*Sxt - 28*Sx)(8*Syt - 28*Sy)
#   F2_xy(box) = N / 2688        (exact integer numerator N)
# rho_DCCA = sum N_xy / (sqrt(sum N_xx) sqrt(sum N_yy)) — the 2688s
# cancel; hourly means are e2-floored centivalue integers so every box
# sum is exact int64.


def q_dcca_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "cv"
        ),
    )
    hm = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("cv").cast("double") / F.count(F.lit(1)).cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )
    a = hm.select(
        F.col("event_type").alias("ta"), "hr", F.col("y").alias("x")
    )
    b = hm.select(
        F.col("event_type").alias("tb"), "hr", F.col("y").alias("yv")
    )
    pr = a.join(b, "hr").filter(F.col("ta") < F.col("tb"))
    wp = Window.partitionBy("ta", "tb").orderBy("hr")
    t = pr.withColumn("t", F.row_number().over(wp) - 1).withColumn(
        "box", F.floor(F.col("t") / 8)
    ).withColumn("tl", F.col("t") % 8)
    box = t.groupBy("ta", "tb", "box").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("x") * F.col("yv")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
        F.sum(F.col("x") * F.col("tl")).alias("sxt"),
        F.sum(F.col("yv") * F.col("tl")).alias("syt"),
    ).filter(F.col("m") == 8)
    bx = 8 * F.col("sxt") - 28 * F.col("sx")
    by = 8 * F.col("syt") - 28 * F.col("sy")
    nxy = 336 * (8 * F.col("sxy") - F.col("sx") * F.col("sy")) - bx * by
    nxx = 336 * (8 * F.col("sxx") - F.col("sx") * F.col("sx")) - bx * bx
    nyy = 336 * (8 * F.col("syy") - F.col("sy") * F.col("sy")) - by * by
    agg = box.select(
        "ta", "tb", nxy.alias("nxy"), nxx.alias("nxx"), nyy.alias("nyy")
    ).groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n_boxes"),
        F.sum("nxy").alias("fxy"),
        F.sum("nxx").alias("fxx"),
        F.sum("nyy").alias("fyy"),
    )
    rho = F.col("fxy").cast("double") / (
        F.sqrt(F.col("fxx").cast("double"))
        * F.sqrt(F.col("fyy").cast("double"))
    )
    return agg.select(
        "ta",
        "tb",
        F.col("n_boxes").cast("long").alias("n_boxes"),
        F.floor(rho * 1e6 + F.lit(_OFF)).cast("long").alias(
            "rho_dcca_e6"
        ),
    ).orderBy("ta", "tb")


SQL_DCCA = f"""
WITH hm AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hr,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), pr AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.hr,
         a.y AS x, b.y AS yv
  FROM hm a JOIN hm b ON a.hr = b.hr AND a.event_type < b.event_type
), t AS (
  SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY hr) - 1 AS tt
  FROM pr
), boxed AS (
  SELECT ta, tb, tt // 8 AS box, tt % 8 AS tl, x, yv FROM t
), box AS (
  SELECT ta, tb, box, count(*) AS m,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(yv) AS BIGINT) AS sy,
         CAST(sum(x * yv) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(yv * yv) AS BIGINT) AS syy,
         CAST(sum(x * tl) AS BIGINT) AS sxt,
         CAST(sum(yv * tl) AS BIGINT) AS syt
  FROM boxed GROUP BY 1, 2, 3
  HAVING count(*) = 8
), agg AS (
  SELECT ta, tb, count(*) AS n_boxes,
         CAST(sum(336 * (8 * sxy - sx * sy)
                  - (8 * sxt - 28 * sx) * (8 * syt - 28 * sy))
              AS BIGINT) AS fxy,
         CAST(sum(336 * (8 * sxx - sx * sx)
                  - (8 * sxt - 28 * sx) * (8 * sxt - 28 * sx))
              AS BIGINT) AS fxx,
         CAST(sum(336 * (8 * syy - sy * sy)
                  - (8 * syt - 28 * sy) * (8 * syt - 28 * sy))
              AS BIGINT) AS fyy
  FROM box GROUP BY 1, 2
)
SELECT ta, tb, CAST(n_boxes AS BIGINT) AS n_boxes,
       CAST(floor(CAST(fxy AS DOUBLE)
                  / (sqrt(CAST(fxx AS DOUBLE)) * sqrt(CAST(fyy AS DOUBLE)))
                  * 1e6 + {_OFF}) AS BIGINT) AS rho_dcca_e6
FROM agg
ORDER BY ta, tb
"""

QUERIES["dcca_coefficient"] = q_dcca_coefficient
ORACLE_SQL["dcca_coefficient"] = SQL_DCCA


# ===========================================================================
# Battery D — fellegi_sunter_em: probabilistic record linkage
# (Fellegi & Sunter 1969) with conditional-independence EM (Winkler
# 1988), the entity-resolution scorer behind dedup review queues.
# ===========================================================================
# Candidate pairs come from (lang, n_chars//64) blocking — the house
# dedup posture, never all-pairs.  Four binary comparison fields per
# pair: same source, 16-char prefix match, 16-char suffix match, exact
# length match.  The pair stream collapses immediately to the <= 16
# agreement-pattern contingency; EM runs 3 unrolled iterations ON THAT
# BOUNDED TABLE (collected driver-side, the absorbing_markov_time
# pattern) with the e12-floor discipline: E-step posteriors are
# floor(pm/(pm+pu)*1e12 + OFF) ints, M-step ratios are doubles of the
# exact integer sums — bit-identical to the SQL twin's unrolled CTE
# chain.  Output: per-pattern pair count, match posterior, and the
# log2 likelihood-ratio match weight.

_FS_INIT = (0.1, (0.9, 0.9, 0.9, 0.9), (0.1, 0.1, 0.1, 0.1))


def q_fellegi_sunter_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "source",
        "n_chars",
        "lang",
        F.expr("left(text, 16)").alias("pre"),
        F.expr("right(text, 16)").alias("suf"),
        (F.col("n_chars") / 64).cast("long").alias("lb"),
    )
    a = d.select(*[F.col(c).alias(f"a_{c}") for c in d.columns])
    b = d.select(*[F.col(c).alias(f"b_{c}") for c in d.columns])
    pr = a.join(
        b,
        (F.col("a_lang") == F.col("b_lang"))
        & (F.col("a_lb") == F.col("b_lb"))
        & (F.col("a_doc_id") < F.col("b_doc_id")),
    ).select(
        (F.col("a_source") == F.col("b_source")).cast("long").alias("g1"),
        (F.col("a_pre") == F.col("b_pre")).cast("long").alias("g2"),
        (F.col("a_suf") == F.col("b_suf")).cast("long").alias("g3"),
        (F.col("a_n_chars") == F.col("b_n_chars")).cast("long").alias("g4"),
    )
    pat = (
        pr.groupBy("g1", "g2", "g3", "g4")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )  # bounded: <= 16 rows by construction
    rows = [(int(r.g1), int(r.g2), int(r.g3), int(r.g4), int(r.c)) for r in pat]
    n = sum(r[4] for r in rows)
    p, m, u = _FS_INIT

    def estep(p, m, u):
        out = []
        for g1, g2, g3, g4, c in rows:
            gs = (g1, g2, g3, g4)
            pm = p
            pu = 1.0 - p
            for f in range(4):
                pm = pm * (m[f] if gs[f] else 1.0 - m[f])
                pu = pu * (u[f] if gs[f] else 1.0 - u[f])
            w12 = math.floor(pm / (pm + pu) * 1e12 + _OFF)
            out.append((gs, c, w12))
        return out

    for _ in range(3):
        e = estep(p, m, u)
        sw = sum(c * w12 for _, c, w12 in e)
        su = sum(c * (10**12 - w12) for _, c, w12 in e)
        p = float(sw) / (float(n) * 1e12)
        m = tuple(
            float(sum(c * w12 * gs[f] for gs, c, w12 in e)) / float(sw)
            for f in range(4)
        )
        u = tuple(
            float(sum(c * (10**12 - w12) * gs[f] for gs, c, w12 in e))
            / float(su)
            for f in range(4)
        )
    final = estep(p, m, u)
    out_rows = []
    for gs, c, w12 in final:
        num = 1.0
        den = 1.0
        for f in range(4):
            num = num * (m[f] if gs[f] else 1.0 - m[f])
            den = den * (u[f] if gs[f] else 1.0 - u[f])
        lr6 = math.floor(math.log2(num / den) * 1e6 + _OFF)
        out_rows.append(
            (
                int(8 * gs[0] + 4 * gs[1] + 2 * gs[2] + gs[3]),
                int(c),
                int(w12 // 10**6),
                int(lr6),
            )
        )
    out_rows.sort()
    return spark.createDataFrame(
        out_rows,
        "pattern long, n_pairs long, posterior_e6 long, log2_lr_e6 long",
    )


def _fs_sql() -> str:
    p0, m0, u0 = _FS_INIT
    params0 = (
        f"SELECT CAST({p0} AS DOUBLE) AS p, "
        + ", ".join(f"CAST({m0[f]} AS DOUBLE) AS m{f + 1}" for f in range(4))
        + ", "
        + ", ".join(f"CAST({u0[f]} AS DOUBLE) AS u{f + 1}" for f in range(4))
    )

    def estep_prod(prefix: str) -> str:
        # matches the Python fold order: p (or 1-p), then fields 1..4
        s = "p" if prefix == "m" else "(1.0 - p)"
        for f in range(1, 5):
            s += (
                f" * (CASE WHEN g{f} = 1 THEN {prefix}{f}"
                f" ELSE 1.0 - {prefix}{f} END)"
            )
        return s

    def lr_prod(prefix: str) -> str:
        # matches Python: 1.0, then fields 1..4
        s = "1.0"
        for f in range(1, 5):
            s += (
                f" * (CASE WHEN g{f} = 1 THEN {prefix}{f}"
                f" ELSE 1.0 - {prefix}{f} END)"
            )
        return s

    chain = [f"params0 AS ({params0})"]
    for k in range(3):
        chain.append(
            f"""e{k} AS (
  SELECT pat.*, CAST(floor(
    ({estep_prod("m")})
    / (({estep_prod("m")}) + ({estep_prod("u")})) * 1e12 + {_OFF})
    AS BIGINT) AS w12
  FROM pat CROSS JOIN params{k}
)"""
        )
        mf = ", ".join(
            f"CAST(sum(c * w12 * g{f}) AS DOUBLE)"
            f" / CAST(sum(c * w12) AS DOUBLE) AS m{f}"
            for f in range(1, 5)
        )
        uf = ", ".join(
            f"CAST(sum(c * (1000000000000 - w12) * g{f}) AS DOUBLE)"
            f" / CAST(sum(c * (1000000000000 - w12)) AS DOUBLE) AS u{f}"
            for f in range(1, 5)
        )
        chain.append(
            f"""params{k + 1} AS (
  SELECT CAST(sum(c * w12) AS DOUBLE)
           / (CAST((SELECT n FROM nt) AS DOUBLE) * 1e12) AS p,
         {mf}, {uf}
  FROM e{k}
)"""
        )
    chain.append(
        f"""efin AS (
  SELECT pat.*, CAST(floor(
    ({estep_prod("m")})
    / (({estep_prod("m")}) + ({estep_prod("u")})) * 1e12 + {_OFF})
    AS BIGINT) AS w12,
         CAST(floor(log2(({lr_prod("m")}) / ({lr_prod("u")})) * 1e6
                    + {_OFF}) AS BIGINT) AS lr6
  FROM pat CROSS JOIN params3
)"""
    )
    return (
        """
WITH d AS (
  SELECT doc_id, source, n_chars, lang,
         left(text, 16) AS pre, right(text, 16) AS suf,
         n_chars // 64 AS lb
  FROM documents
), pr AS (
  SELECT CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS g1,
         CASE WHEN a.pre = b.pre THEN 1 ELSE 0 END AS g2,
         CASE WHEN a.suf = b.suf THEN 1 ELSE 0 END AS g3,
         CASE WHEN a.n_chars = b.n_chars THEN 1 ELSE 0 END AS g4
  FROM d a JOIN d b
    ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
), pat AS (
  SELECT g1, g2, g3, g4, CAST(count(*) AS BIGINT) AS c
  FROM pr GROUP BY 1, 2, 3, 4
), nt AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM pat
), """
        + ",\n".join(chain)
        + """
SELECT CAST(8 * g1 + 4 * g2 + 2 * g3 + g4 AS BIGINT) AS pattern,
       c AS n_pairs,
       CAST(w12 // 1000000 AS BIGINT) AS posterior_e6,
       lr6 AS log2_lr_e6
FROM efin
ORDER BY pattern
"""
    )


QUERIES["fellegi_sunter_em"] = q_fellegi_sunter_em
ORACLE_SQL["fellegi_sunter_em"] = _fs_sql()


# ===========================================================================
# Battery E — TDA / streaming-sketch kernels (rows-only, pytest-pinned
# in tests/test_persistence_dgim.py)
# ===========================================================================


def q_sublevel_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0-dim sublevel persistence diagram summary of each type's hourly
    mean series — the TDA roughness profile (bars = (local min, merge
    saddle) pairs under the elder rule)."""
    from diive_spark.operators.persistence import persistence_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "cv"
        ),
    )
    hm = ev.groupBy("event_type", "hr").agg(
        (
            F.floor(
                F.sum("cv").cast("double")
                / F.count(F.lit(1)).cast("double")
                + F.lit(_OFF)
            )
            / 100.0
        ).alias("y")
    )
    out = persistence_frame(hm, "event_type", "hr", "y")
    return out.select(
        "event_type",
        "n",
        "n_bars",
        F.round("total_persistence", 4).alias("total_persistence"),
        F.round("max_persistence", 4).alias("max_persistence"),
        F.round("top_birth", 4).alias("top_birth"),
        F.round("top_death", 4).alias("top_death"),
        F.round("essential_birth", 4).alias("essential_birth"),
    ).orderBy("event_type")


QUERIES["sublevel_persistence"] = q_sublevel_persistence


def q_dgim_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DGIM exponential-histogram audit: bounded-state trailing-1024
    high-value counts per type vs the exact sliding count (error bound
    <= 50% by construction, typically ~2%)."""
    from diive_spark.operators.persistence import dgim_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_id"),
        (F.col("value") > 50.0).cast("long").alias("bit"),
    )
    out = dgim_frame(ev, "event_type", ["us", "event_id"], "bit", window=1024)
    return out.select(
        "event_type",
        "n",
        "window",
        "exact_last",
        F.round("dgim_last", 1).alias("dgim_last"),
        F.round("rel_err_last", 4).alias("rel_err_last"),
        F.round("max_rel_err", 4).alias("max_rel_err"),
    ).orderBy("event_type")


QUERIES["dgim_window_count"] = q_dgim_window_count


# ===========================================================================
# Battery F — apsp_closeness: Floyd-Warshall all-pairs shortest paths
# on the event-type transition graph; closeness centrality,
# eccentricity, and the shortest-path betweenness indicator count.
# ===========================================================================
# Edge weights are e6-floored -ln(transition probability) integers
# (surprisal distance), so EVERY Floyd-Warshall relaxation is exact
# integer min/plus arithmetic — the k<=5 pivot steps are bit-identical
# between the collected-matrix Python sweep (absorbing_markov device)
# and the SQL twin's unrolled pivot CTE chain.  Betweenness here is
# the distance-matrix indicator variant: for vertex v, the number of
# ordered pairs (s,t), s!=t!=v, with d(s,v)+d(v,t) = d(s,t) (v lies on
# SOME shortest path) — computable without path counts and therefore
# exactly, documented as the indicator (stress-style) form.

_INF_E6 = 10**15


def q_apsp_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
    )
    wu = Window.partitionBy("user_id").orderBy("us", "event_id")
    tr = ev.withColumn("nxt", F.lead("event_type").over(wu)).filter(
        F.col("nxt").isNotNull() & (F.col("nxt") != F.col("event_type"))
    )
    cnt = tr.groupBy("event_type", "nxt").agg(
        F.count(F.lit(1)).alias("c")
    )
    out = cnt.groupBy("event_type").agg(F.sum("c").alias("tot"))
    w = cnt.join(out, "event_type").select(
        F.col("event_type").alias("i"),
        F.col("nxt").alias("j"),
        F.floor(
            -F.log(F.col("c").cast("double") / F.col("tot").cast("double"))
            * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("w"),
    )
    rows = w.collect()  # bounded: k*(k-1) <= 20 edges
    nodes = sorted(
        {r.i for r in rows} | {r.j for r in rows}
    )
    k = len(nodes)
    # ADVICE r4: the SQL oracle unrolls exactly 5 Floyd-Warshall pivot
    # CTEs (d1..d5, _apsp_sql).  If the event-type cardinality ever grows
    # past that, the oracle would silently under-relax paths — fail loudly
    # here instead so a data change surfaces as an error, not a hash drift.
    if k > 5:
        raise ValueError(
            f"apsp_closeness: {k} node types but the SQL oracle unrolls "
            "only 5 Floyd-Warshall pivots — regenerate _apsp_sql() for "
            f"k={k}"
        )
    idx = {t: x for x, t in enumerate(nodes)}
    d = [[0 if a == b else _INF_E6 for b in range(k)] for a in range(k)]
    for r in rows:
        d[idx[r.i]][idx[r.j]] = min(d[idx[r.i]][idx[r.j]], int(r.w))
    for p in range(k):
        for a in range(k):
            for b in range(k):
                alt = d[a][p] + d[p][b]
                if alt < d[a][b]:
                    d[a][b] = alt
    res = []
    for v in range(k):
        dists = [d[v][b] for b in range(k) if b != v]
        ecc = max(dists)
        tot = sum(dists)
        clos6 = (
            int((k - 1) / (tot / 1e6) * 1e6 + _OFF) if tot > 0 else 0
        )
        btw = sum(
            1
            for s in range(k)
            for t in range(k)
            if s != v and t != v and s != t
            and d[s][v] + d[v][t] == d[s][t]
        )
        res.append((nodes[v], int(ecc), int(tot), int(clos6), int(btw)))
    return spark.createDataFrame(
        res,
        "event_type string, eccentricity_e6 long, farness_e6 long,"
        " closeness_e6 long, betweenness_ind long",
    ).orderBy("event_type")


def _apsp_sql() -> str:
    base = f"""
WITH tr AS (
  SELECT event_type AS i,
         lead(event_type) OVER (
           PARTITION BY user_id
           ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id
         ) AS j
  FROM events
), cnt AS (
  SELECT i, j, CAST(count(*) AS BIGINT) AS c
  FROM tr WHERE j IS NOT NULL AND j <> i GROUP BY 1, 2
), outdeg AS (
  SELECT i, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1
), nodes AS (
  SELECT DISTINCT t, CAST(dense_rank() OVER (ORDER BY t) AS BIGINT) AS id
  FROM (SELECT i AS t FROM cnt UNION SELECT j FROM cnt)
), w AS (
  SELECT ni.id AS i, nj.id AS j,
         CAST(floor(-ln(CAST(c.c AS DOUBLE) / o.tot) * 1e6 + {_OFF})
              AS BIGINT) AS w
  FROM cnt c
  JOIN outdeg o ON o.i = c.i
  JOIN nodes ni ON ni.t = c.i
  JOIN nodes nj ON nj.t = c.j
), kk AS (
  SELECT CAST(max(id) AS BIGINT) AS k FROM nodes
), d0 AS (
  SELECT a.id AS i, b.id AS j,
         CASE WHEN a.id = b.id THEN 0
              ELSE coalesce(min(w.w), {_INF_E6}) END AS d
  FROM nodes a CROSS JOIN nodes b
  LEFT JOIN w ON w.i = a.id AND w.j = b.id
  GROUP BY 1, 2
)"""
    steps = []
    prev = "d0"
    for p in range(1, 6):
        steps.append(
            f""", d{p} AS MATERIALIZED (
  SELECT m.i, m.j,
         CASE WHEN ik.d + kj.d < m.d THEN ik.d + kj.d ELSE m.d END AS d
  FROM {prev} m
  LEFT JOIN {prev} ik ON ik.i = m.i AND ik.j = {p}
  LEFT JOIN {prev} kj ON kj.i = {p} AND kj.j = m.j
)"""
        )
        prev = f"d{p}"
    tail = f""", fin AS MATERIALIZED (
  SELECT * FROM {prev}
), per AS (
  SELECT i AS v,
         CAST(max(d) AS BIGINT) AS ecc,
         CAST(sum(d) AS BIGINT) AS farness
  FROM fin WHERE i <> j GROUP BY 1
), btw AS (
  SELECT v.id AS v,
         CAST(sum(CASE WHEN sv.d + vt.d = st.d THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM nodes v
  JOIN fin st ON st.i <> v.id AND st.j <> v.id AND st.i <> st.j
  JOIN fin sv ON sv.i = st.i AND sv.j = v.id
  JOIN fin vt ON vt.i = v.id AND vt.j = st.j
  GROUP BY 1
)
SELECT n.t AS event_type,
       p.ecc AS eccentricity_e6,
       p.farness AS farness_e6,
       CAST(CASE WHEN p.farness > 0 THEN
         floor(((SELECT k FROM kk) - 1)
               / (CAST(p.farness AS DOUBLE) / 1e6) * 1e6 + {_OFF})
         ELSE 0 END AS BIGINT) AS closeness_e6,
       b.b AS betweenness_ind
FROM per p JOIN nodes n ON n.id = p.v JOIN btw b ON b.v = p.v
ORDER BY event_type
"""
    return base + "".join(steps) + tail


QUERIES["apsp_closeness"] = q_apsp_closeness
ORACLE_SQL["apsp_closeness"] = _apsp_sql()


# ===========================================================================
# Battery G — sequence-alignment triage (rows-only, pytest-pinned in
# tests/test_alignkernels.py)
# ===========================================================================


def q_seq_alignment_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Needleman-Wunsch / Smith-Waterman / LCS profile of sampled
    documents against their source's representative — order-preserving
    overlap triage that complements the shingle-hash dedup family."""
    from diive_spark.operators.alignkernels import align_frame

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "doc_id", "text"
    )
    out = align_frame(d, "source", "doc_id", "text")
    return out.select(
        "source",
        "n_members",
        "n_scored",
        F.round("mean_nw", 4).alias("mean_nw"),
        F.round("mean_sw", 4).alias("mean_sw"),
        "max_sw",
        F.round("mean_lcs", 4).alias("mean_lcs"),
        F.round("max_lcs_ratio", 4).alias("max_lcs_ratio"),
    ).orderBy("source")


QUERIES["seq_alignment_scores"] = q_seq_alignment_scores


# ===========================================================================
# Battery H — ADWIN drift detection (rows-only, pytest-pinned in
# tests/test_adwin.py)
# ===========================================================================


def q_adwin_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADWIN2 self-sizing drift window over each type's value stream —
    the canonical adaptive complement to the fixed-window drift panel
    (ks/psi/char-kl) and the reference-mean trackers (page_hinkley,
    cusum_shift)."""
    from diive_spark.operators.adwin import adwin_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_id"),
        F.col("value"),
    )
    out = adwin_frame(ev, "event_type", ["us", "event_id"], "value")
    return out.select(
        "event_type",
        "n",
        "n_detections",
        "first_detection",
        "last_detection",
        "final_window",
        F.round("final_mean", 4).alias("final_mean"),
    ).orderBy("event_type")


QUERIES["adwin_drift"] = q_adwin_drift


# ===========================================================================
# Battery I — mewma_t2: multivariate EWMA control chart (Lowry et al.
# 1992) on the (hourly mean, hourly count) vector per event type.
# ===========================================================================
# Deviations are the exact n*y - S integers (the bartlett_cumper
# trick), so the n-scaling cancels in the T^2 quadratic form:
#   T^2_t = (2-l)/l * [zm^2 Syy - 2 zm zc Sxy + zc^2 Sxx] / det
# with S.. = n*sum(x^2) - sum(x)^2 the exact integer co-moments and
# (zm, zc) the truncated 16-lag EWMA (decay 3/4, binary-exact weights,
# missing-lag renormalization — the ewma_hourly discipline) of the
# scaled deviations.  l = 1/4 -> the leading constant is exactly 7.
# Exceedances against the standard 2-dim h4 ~ 10.6 limit.

_MEWMA_K = 16
_MEWMA_Q = 0.75
_MEWMA_H4_E4 = 106_000  # 10.6 * 1e4


def q_mewma_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "cv"
        ),
    )
    h = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("cv").cast("double") / F.count(F.lit(1)).cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("m"),
        F.count(F.lit(1)).alias("c"),
    )
    wt = Window.partitionBy("event_type")
    h = (
        h.withColumn("n", F.count(F.lit(1)).over(wt))
        .withColumn("sm", F.sum("m").over(wt))
        .withColumn("sc", F.sum("c").over(wt))
        .withColumn("smm", F.sum(F.col("m") * F.col("m")).over(wt))
        .withColumn("scc", F.sum(F.col("c") * F.col("c")).over(wt))
        .withColumn("smc", F.sum(F.col("m") * F.col("c")).over(wt))
        .withColumn("dm", F.col("n") * F.col("m") - F.col("sm"))
        .withColumn("dc", F.col("n") * F.col("c") - F.col("sc"))
    )
    wo = Window.partitionBy("event_type").orderBy("hr")
    num_m = None
    num_c = None
    den = None
    for j in range(_MEWMA_K):
        wj = _MEWMA_Q**j
        lm = F.lag("dm", j).over(wo) if j else F.col("dm")
        lc = F.lag("dc", j).over(wo) if j else F.col("dc")
        tm = F.coalesce(lm.cast("double") * F.lit(wj), F.lit(0.0))
        tc = F.coalesce(lc.cast("double") * F.lit(wj), F.lit(0.0))
        td = F.when(lm.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
        num_m = tm if num_m is None else num_m + tm
        num_c = tc if num_c is None else num_c + tc
        den = td if den is None else den + td
    z = h.withColumn("zm", num_m / den).withColumn("zc", num_c / den)
    sxx = F.col("n") * F.col("smm") - F.col("sm") * F.col("sm")
    syy = F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")
    sxy = F.col("n") * F.col("smc") - F.col("sm") * F.col("sc")
    det = sxx.cast("double") * syy.cast("double") - sxy.cast(
        "double"
    ) * sxy.cast("double")
    quad = (
        F.col("zm") * F.col("zm") * syy.cast("double")
        - 2.0 * F.col("zm") * F.col("zc") * sxy.cast("double")
        + F.col("zc") * F.col("zc") * sxx.cast("double")
    )
    t2e4 = F.floor(7.0 * quad / det * 1e4 + F.lit(_OFF)).cast("long")
    scored = z.withColumn("t2e4", t2e4).withColumn(
        "mx", F.max(t2e4).over(Window.partitionBy("event_type"))
    )
    return scored.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_hours"),
        F.sum(
            (F.col("t2e4") > _MEWMA_H4_E4).cast("long")
        ).cast("long").alias("n_exceed"),
        F.max("t2e4").cast("long").alias("max_t2_e4"),
        F.min(
            F.when(F.col("t2e4") == F.col("mx"), F.col("hr"))
        ).cast("long").alias("argmax_hr"),
    ).orderBy("event_type")


def _mewma_sql() -> str:
    num_m = " + ".join(
        (
            f"coalesce(lag(dm, {j}) OVER w * {_MEWMA_Q**j!r}, 0.0)"
            if j
            else "coalesce(dm * 1.0, 0.0)"
        )
        for j in range(_MEWMA_K)
    )
    num_c = " + ".join(
        (
            f"coalesce(lag(dc, {j}) OVER w * {_MEWMA_Q**j!r}, 0.0)"
            if j
            else "coalesce(dc * 1.0, 0.0)"
        )
        for j in range(_MEWMA_K)
    )
    den = " + ".join(
        (
            f"(CASE WHEN lag(dm, {j}) OVER w IS NOT NULL"
            f" THEN {_MEWMA_Q**j!r} ELSE 0.0 END)"
            if j
            else "1.0"
        )
        for j in range(_MEWMA_K)
    )
    return f"""
WITH h AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hr,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS m,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT *,
         CAST(count(*) OVER t AS BIGINT) AS n,
         CAST(sum(m) OVER t AS BIGINT) AS sm,
         CAST(sum(c) OVER t AS BIGINT) AS sc,
         CAST(sum(m * m) OVER t AS BIGINT) AS smm,
         CAST(sum(c * c) OVER t AS BIGINT) AS scc,
         CAST(sum(m * c) OVER t AS BIGINT) AS smc
  FROM h
  WINDOW t AS (PARTITION BY event_type)
), d AS (
  SELECT *, n * m - sm AS dm, n * c - sc AS dc FROM mom
), z AS (
  SELECT *,
         ({num_m}) / ({den}) AS zm,
         ({num_c}) / ({den}) AS zc
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), scored AS (
  SELECT event_type, hr, n,
         CAST(floor(7.0 *
           (zm * zm * CAST(n * scc - sc * sc AS DOUBLE)
            - 2.0 * zm * zc * CAST(n * smc - sm * sc AS DOUBLE)
            + zc * zc * CAST(n * smm - sm * sm AS DOUBLE))
           / (CAST(n * smm - sm * sm AS DOUBLE)
                * CAST(n * scc - sc * sc AS DOUBLE)
              - CAST(n * smc - sm * sc AS DOUBLE)
                * CAST(n * smc - sm * sc AS DOUBLE))
           * 1e4 + {_OFF}) AS BIGINT) AS t2e4
  FROM z
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_hours,
       CAST(sum(CASE WHEN t2e4 > {_MEWMA_H4_E4} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exceed,
       CAST(max(t2e4) AS BIGINT) AS max_t2_e4,
       CAST(min(CASE WHEN t2e4 = mx THEN hr END) AS BIGINT) AS argmax_hr
FROM (SELECT *, max(t2e4) OVER (PARTITION BY event_type) AS mx
      FROM scored)
GROUP BY 1
ORDER BY event_type
"""


QUERIES["mewma_t2"] = q_mewma_t2
ORACLE_SQL["mewma_t2"] = _mewma_sql()


# ===========================================================================
# Battery J — soundex_phonetic_blocks: American Soundex phonetic
# blocking audit over document lead tokens, per language.
# ===========================================================================
# Pure-expression Soundex (documented h/w-by-deletion variant: h/w are
# transparent separators, implemented by deleting them from position 2
# on BEFORE coding — equivalent for the collapse step):
#   1. lead token = first ASCII-alpha run of the text, lowercased;
#   2. drop h/w after position 1, code all letters via translate
#      (bfpv->1 cgjkq sxz->2 dt->3 l->4 mn->5 r->6, vowels->0);
#   3. collapse adjacent equal codes with a chained per-digit
#      regexp_replace (RE2-safe: DuckDB has no backreferences);
#   4. code = first letter + first 3 non-zero tail codes, 0-padded.
# Output: phonetic-bucket profile per language — the blocking-key
# audit a linkage pipeline runs before choosing keys (pairs with
# fellegi_sunter_em).


def _soundex_col(tok):
    first = F.upper(F.substring(tok, 1, 1))
    dropped = F.concat(
        F.substring(tok, 1, 1),
        F.translate(F.expr("substring(tok, 2)"), "hw", ""),
    )
    coded = F.translate(
        dropped,
        "abcdefghijklmnopqrstuvwxyz",
        "01230120022455012623010202",
    )
    collapsed = coded
    for dg in "0123456":
        collapsed = F.regexp_replace(collapsed, f"{dg}{dg}+", dg)
    tail = F.translate(F.expr("substring(collapsed_c, 2)"), "0", "")
    return first, collapsed, tail


def q_soundex_phonetic_blocks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang",
        F.lower(
            F.regexp_extract(F.col("text"), "[A-Za-z]+", 0)
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    first, collapsed, _ = _soundex_col(F.col("tok"))
    d = d.withColumn("collapsed_c", collapsed)
    sdx = F.concat(
        first,
        F.rpad(
            F.substring(
                F.translate(F.expr("substring(collapsed_c, 2)"), "0", ""),
                1,
                3,
            ),
            3,
            "0",
        ),
    )
    toks = d.select("lang", "tok", sdx.alias("sdx")).distinct()
    buck = toks.groupBy("lang", "sdx").agg(
        F.count(F.lit(1)).alias("bs")
    )
    mx = buck.groupBy("lang").agg(F.max("bs").alias("mxb"))
    top = (
        buck.join(mx, "lang")
        .filter(F.col("bs") == F.col("mxb"))
        .groupBy("lang")
        .agg(F.min("sdx").alias("top_code"), F.max("bs").alias("max_bucket"))
    )
    agg = buck.groupBy("lang").agg(
        F.sum("bs").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_codes"),
    )
    out = agg.join(top, "lang")
    return out.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_codes").cast("long").alias("n_codes"),
        F.col("max_bucket").cast("long").alias("max_bucket"),
        "top_code",
        F.floor(
            (
                1.0
                - F.col("n_codes").cast("double")
                / F.col("n_tokens").cast("double")
            )
            * 1e6
            + F.lit(_OFF)
        ).cast("long").alias("collision_rate_e6"),
    ).orderBy("lang")


def _soundex_sql() -> str:
    collapse = "coded"
    for dg in "0123456":
        collapse = f"regexp_replace({collapse}, '{dg}{dg}+', '{dg}', 'g')"
    return f"""
WITH tk AS (
  SELECT lang, lower(regexp_extract(text, '[A-Za-z]+', 0)) AS tok
  FROM documents
  WHERE regexp_extract(text, '[A-Za-z]+', 0) <> ''
), coded AS (
  SELECT lang, tok,
         translate(substring(tok, 1, 1) || translate(substring(tok, 2),
                   'hw', ''),
                   'abcdefghijklmnopqrstuvwxyz',
                   '01230120022455012623010202') AS coded
  FROM tk
), sdx AS (
  SELECT DISTINCT lang, tok,
         upper(substring(tok, 1, 1)) ||
         rpad(substring(translate(substring({collapse}, 2), '0', ''),
                        1, 3), 3, '0') AS sdx
  FROM coded
), buck AS (
  SELECT lang, sdx, CAST(count(*) AS BIGINT) AS bs
  FROM sdx GROUP BY 1, 2
), mx AS (
  SELECT lang, max(bs) AS mxb FROM buck GROUP BY 1
), top AS (
  SELECT b.lang, min(b.sdx) AS top_code, max(b.bs) AS max_bucket
  FROM buck b JOIN mx ON mx.lang = b.lang AND b.bs = mx.mxb
  GROUP BY 1
), agg AS (
  SELECT lang, CAST(sum(bs) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_codes
  FROM buck GROUP BY 1
)
SELECT a.lang AS lang, a.n_tokens, a.n_codes,
       CAST(t.max_bucket AS BIGINT) AS max_bucket,
       t.top_code,
       CAST(floor((1.0 - CAST(a.n_codes AS DOUBLE) / a.n_tokens) * 1e6
                  + {_OFF}) AS BIGINT) AS collision_rate_e6
FROM agg a JOIN top t ON t.lang = a.lang
ORDER BY lang
"""


QUERIES["soundex_phonetic_blocks"] = q_soundex_phonetic_blocks
ORACLE_SQL["soundex_phonetic_blocks"] = _soundex_sql()


# ---------------------------------------------------------------------------
# theil_u1 — Theil's U1 inequality coefficient of the naive forecast
# on the hourly mean series (complements theil_u2, which scores
# forecast changes; U1 is the bounded [0,1] accuracy form)
# ---------------------------------------------------------------------------


def q_theil_u1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "cv"
        ),
    )
    h = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("cv").cast("double") / F.count(F.lit(1)).cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )
    wo = Window.partitionBy("event_type").orderBy("hr")
    p = h.withColumn("f", F.lag("y").over(wo)).filter(
        F.col("f").isNotNull()
    )
    agg = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("y") - F.col("f")) * (F.col("y") - F.col("f"))
        ).alias("se"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("f") * F.col("f")).alias("sff"),
    )
    nd = F.col("n").cast("double")
    u1 = F.sqrt(F.col("se").cast("double") / nd) / (
        F.sqrt(F.col("syy").cast("double") / nd)
        + F.sqrt(F.col("sff").cast("double") / nd)
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(u1 * 1e6 + F.lit(_OFF)).cast("long").alias("u1_e6"),
    ).orderBy("event_type")


SQL_THEIL_U1 = f"""
WITH h AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hr,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
                         AS DOUBLE) / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type, y,
         lag(y) OVER (PARTITION BY event_type ORDER BY hr) AS f
  FROM h
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum((y - f) * (y - f)) AS BIGINT) AS se,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(f * f) AS BIGINT) AS sff
  FROM p WHERE f IS NOT NULL GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(sqrt(CAST(se AS DOUBLE) / n)
                  / (sqrt(CAST(syy AS DOUBLE) / n)
                     + sqrt(CAST(sff AS DOUBLE) / n)) * 1e6 + {_OFF})
            AS BIGINT) AS u1_e6
FROM agg
ORDER BY event_type
"""

QUERIES["theil_u1"] = q_theil_u1
ORACLE_SQL["theil_u1"] = SQL_THEIL_U1


# ===========================================================================
# Battery K — ncd_similarity: normalized compression distance triage
# (rows-only, pytest-pinned in tests/test_ncd.py)
# ===========================================================================


def q_ncd_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deflate-based NCD of sampled documents vs their source
    representative — the parameter-free paraphrase-level similarity
    that completes the dedup trio (shingle hashes = set overlap,
    alignment = order overlap, compression = model overlap)."""
    from diive_spark.text.ncd import ncd_frame

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "doc_id", "text"
    )
    out = ncd_frame(d, "source", "doc_id", "text")
    return out.select(
        "source",
        "n_members",
        "n_scored",
        F.round("mean_ncd", 4).alias("mean_ncd"),
        F.round("min_ncd", 4).alias("min_ncd"),
        F.round("max_ncd", 4).alias("max_ncd"),
        "rep_clen",
    ).orderBy("source")


QUERIES["ncd_similarity"] = q_ncd_similarity


# ===========================================================================
# Battery L — climate-homogeneity tests on the hourly series (the
# family diive's meteoscreening sits inside): Alexandersson's SNHT
# and the von Neumann ratio (Pettitt and seasonal MK already ship in
# queries_stats4 / queries_stats2).
# ===========================================================================
# All per event type over the e2-floored hourly means.  Exact-integer
# backbones: SNHT's numerator D_k = n*S_k - k*S is exact (squared in
# double); the von Neumann ratio is a pure integer ratio scaled by n.


def _hourly20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "cv"
        ),
    )
    return ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("cv").cast("double") / F.count(F.lit(1)).cast("double")
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )


_HOURLY20_SQL = """hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hr,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {off}) AS BIGINT))
                         AS DOUBLE) / count(*) + {off}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
)"""


def q_snht_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly20(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("hr")
    r = (
        h.withColumn("n", F.count(F.lit(1)).over(wt))
        .withColumn("s", F.sum("y").over(wt))
        .withColumn("syy", F.sum(F.col("y") * F.col("y")).over(wt))
        .withColumn("k", F.row_number().over(wo))
        .withColumn(
            "sk",
            F.sum("y").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    ).filter(F.col("k") < F.col("n"))
    d = (F.col("n") * F.col("sk") - F.col("k") * F.col("s")).cast(
        "double"
    )
    denom = (
        F.col("n") * F.col("syy") - F.col("s") * F.col("s")
    ).cast("double")
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    t4 = F.floor(
        d * d * (1.0 / kd + 1.0 / (nd - kd)) / denom * 1e4 + F.lit(_OFF)
    ).cast("long")
    sc = r.withColumn("t4", t4).withColumn(
        "mx", F.max(t4).over(wt)
    )
    return sc.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("mx").cast("long").alias("t_max_e4"),
        F.min(
            F.when(F.col("t4") == F.col("mx"), F.col("k"))
        ).cast("long").alias("k_break"),
    ).orderBy("event_type")


SQL_SNHT = f"""
WITH {_HOURLY20_SQL.format(off=_OFF)}
, r AS (
  SELECT event_type, hr, y,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS s,
         CAST(sum(y * y) OVER (PARTITION BY event_type) AS BIGINT) AS syy,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS k,
         CAST(sum(y) OVER (PARTITION BY event_type ORDER BY hr
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sk
  FROM hourly
), sc AS (
  SELECT event_type, n, k,
         CAST(floor(CAST(n * sk - k * s AS DOUBLE)
                    * CAST(n * sk - k * s AS DOUBLE)
                    * (1.0 / k + 1.0 / (n - k))
                    / CAST(n * syy - s * s AS DOUBLE) * 1e4 + {_OFF})
              AS BIGINT) AS t4
  FROM r WHERE k < n
), f AS (
  SELECT *, max(t4) OVER (PARTITION BY event_type) AS mx FROM sc
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(max(mx) AS BIGINT) AS t_max_e4,
       CAST(min(CASE WHEN t4 = mx THEN k END) AS BIGINT) AS k_break
FROM f
GROUP BY 1
ORDER BY event_type
"""

QUERIES["snht_homogeneity"] = q_snht_homogeneity
ORACLE_SQL["snht_homogeneity"] = SQL_SNHT


def q_von_neumann_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly20(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("hr")
    r = h.withColumn("lag", F.lag("y").over(wo))
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(
            F.when(
                F.col("lag").isNotNull(),
                (F.col("y") - F.col("lag")) * (F.col("y") - F.col("lag")),
            )
        ).alias("num"),
    )
    vn = (
        F.col("n").cast("double")
        * F.col("num").cast("double")
        / (F.col("n") * F.col("syy") - F.col("s") * F.col("s")).cast(
            "double"
        )
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("num").cast("long").alias("sq_diff_sum"),
        F.floor(vn * 1e6 + F.lit(_OFF)).cast("long").alias("vn_e6"),
    ).orderBy("event_type")


SQL_VN = f"""
WITH {_HOURLY20_SQL.format(off=_OFF)}
, r AS (
  SELECT event_type, y,
         lag(y) OVER (PARTITION BY event_type ORDER BY hr) AS lg
  FROM hourly
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(CASE WHEN lg IS NOT NULL
                       THEN (y - lg) * (y - lg) END) AS BIGINT) AS num
  FROM r GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       num AS sq_diff_sum,
       CAST(floor(CAST(n AS DOUBLE) * num
                  / CAST(n * syy - s * s AS DOUBLE) * 1e6 + {_OFF})
            AS BIGINT) AS vn_e6
FROM agg
ORDER BY event_type
"""

QUERIES["von_neumann_ratio"] = q_von_neumann_ratio
ORACLE_SQL["von_neumann_ratio"] = SQL_VN




# ===========================================================================
# Battery M — cvm_2sample: two-sample Cramer-von Mises (Anderson 1962
# rank form) between every event-type pair's hourly mean samples.
# ===========================================================================
# T = U/(nm(n+m)) - (4nm-1)/(6(n+m)), with
# U = n sum_i (r_i - i)^2 + m sum_j (s_j - j)^2 over the pooled
# ranking.  Midrank ties are carried as DOUBLED ranks so U4 = 4U is an
# exact integer: U4 = n sum (2r_i - 2i)^2 + m sum (2s_j - 2j)^2.
# Pooled doubled midranks come from one window over the pair-tagged
# union (2r = 2*cnt_less + cnt_eq + 1).


def q_cvm_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly20(spark, sf_dir)
    types = h.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    tagged = (
        h.join(
            F.broadcast(pairs),
            (F.col("event_type") == F.col("ta"))
            | (F.col("event_type") == F.col("tb")),
        )
        .withColumn(
            "side", (F.col("event_type") == F.col("ta")).cast("long")
        )
    )
    wp = Window.partitionBy("ta", "tb")
    wv = Window.partitionBy("ta", "tb").orderBy("y")
    we = Window.partitionBy("ta", "tb", "y")
    ws = Window.partitionBy("ta", "tb", "side").orderBy("y", "hr")
    r = (
        tagged.withColumn("mr", F.rank().over(wv))
        .withColumn("ce", F.count(F.lit(1)).over(we))
        .withColumn("r2", 2 * (F.col("mr") - 1) + F.col("ce") + 1)
        .withColumn("i", F.row_number().over(ws))
        .withColumn("nn", F.sum("side").over(wp))
        .withColumn(
            "mm", F.sum(F.lit(1) - F.col("side")).over(wp)
        )
    )
    d = (F.col("r2") - 2 * F.col("i")).cast("long")
    term = F.when(F.col("side") == 1, F.col("nn")).otherwise(
        F.col("mm")
    ) * d * d
    agg = r.groupBy("ta", "tb").agg(
        F.max("nn").alias("n"),
        F.max("mm").alias("m"),
        F.sum(term).alias("u4"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    t = F.col("u4").cast("double") / (
        4.0 * nd * md * (nd + md)
    ) - (4.0 * nd * md - 1.0) / (6.0 * (nd + md))
    return agg.select(
        "ta",
        "tb",
        F.col("n").cast("long").alias("n"),
        F.col("m").cast("long").alias("m"),
        F.col("u4").cast("long").alias("u4"),
        F.floor(t * 1e6 + F.lit(_OFF)).cast("long").alias("t_e6"),
    ).orderBy("ta", "tb")


SQL_CVM2 = f"""
WITH {_HOURLY20_SQL.format(off=_OFF)}
, types AS (
  SELECT DISTINCT event_type AS t FROM hourly
), pairs AS (
  SELECT a.t AS ta, b.t AS tb FROM types a JOIN types b ON a.t < b.t
), tagged AS (
  SELECT p.ta, p.tb, h.hr, h.y,
         CASE WHEN h.event_type = p.ta THEN 1 ELSE 0 END AS side
  FROM hourly h JOIN pairs p
    ON h.event_type = p.ta OR h.event_type = p.tb
), r AS (
  SELECT *,
         rank() OVER (PARTITION BY ta, tb ORDER BY y) AS mr,
         count(*) OVER (PARTITION BY ta, tb, y) AS ce,
         row_number() OVER (PARTITION BY ta, tb, side
                            ORDER BY y, hr) AS i,
         CAST(sum(side) OVER (PARTITION BY ta, tb) AS BIGINT) AS nn,
         CAST(sum(1 - side) OVER (PARTITION BY ta, tb) AS BIGINT) AS mm
  FROM tagged
), agg AS (
  SELECT ta, tb, max(nn) AS n, max(mm) AS m,
         CAST(sum((CASE WHEN side = 1 THEN nn ELSE mm END)
                  * (2 * (mr - 1) + ce + 1 - 2 * i)
                  * (2 * (mr - 1) + ce + 1 - 2 * i)) AS BIGINT) AS u4
  FROM r GROUP BY 1, 2
)
SELECT ta, tb,
       CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m, u4,
       CAST(floor(
         (CAST(u4 AS DOUBLE) / (4.0 * n * m * (n + m))
          - (4.0 * CAST(n AS DOUBLE) * m - 1.0) / (6.0 * (n + m)))
         * 1e6 + {_OFF}) AS BIGINT) AS t_e6
FROM agg
ORDER BY ta, tb
"""

QUERIES["cvm_2sample"] = q_cvm_2sample
ORACLE_SQL["cvm_2sample"] = SQL_CVM2


# ===========================================================================
# Battery M2 — ucb1_replay: off-policy bandit evaluation by replay
# (rows-only, pytest-pinned in tests/test_bandits.py)
# ===========================================================================


def q_ucb1_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 replayed against the logged event stream (arms = event
    types, reward = value > 50) — the Li et al. counterfactual
    evaluator; one policy, documented single-partition scope."""
    from diive_spark.operators.bandits import ucb1_replay_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        (F.col("value") > 50.0).cast("long").alias("reward"),
    )
    out = ucb1_replay_frame(
        ev, "event_type", ["us", "event_id"], "reward"
    )
    return out.select(
        "event_type",
        "plays",
        "reward_sum",
        F.round("mean_reward", 4).alias("mean_reward"),
        "n_stream",
        "n_accepted",
        "total_reward",
    ).orderBy("event_type")


QUERIES["ucb1_replay"] = q_ucb1_replay


# ===========================================================================
# Battery N — information/signal profile queries
# ===========================================================================
# renyi_spectrum: the Renyi entropy spectrum H_alpha of each type's
# user-visit distribution at alpha = 0, 1/2, 1, 2, inf — the spectrum
# view that nests richness (alpha=0), Shannon (alpha->1), collision/
# Simpson (alpha=2) and min-entropy (alpha=inf).  Exact backbones:
# alpha=0 is a count; alpha=2 is -ln of the exact integer ratio
# sum(c^2)/n^2; alpha=inf is -ln(max c/n); Shannon and alpha=1/2 use
# the house per-cell e9-floor (sqrt/ln per cell, exact sums).


def q_renyi_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    c = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    wt = Window.partitionBy("event_type")
    c = c.withColumn("n", F.sum("c").over(wt))
    half9 = F.floor(
        F.sqrt(F.col("c").cast("double") / F.col("n").cast("double"))
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    sh9 = F.floor(
        F.col("c").cast("double")
        / F.col("n")
        * F.log(F.col("n").cast("double") / F.col("c"))
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = c.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("c") * F.col("c")).alias("c2"),
        F.max("c").alias("cmax"),
        F.sum(half9).alias("h9"),
        F.sum(sh9).alias("s9"),
    )
    nd = F.col("n").cast("double")
    h0 = F.log(F.col("k").cast("double"))
    hhalf = 2.0 * F.log(F.col("h9").cast("double") / 1e9)
    h1 = F.col("s9").cast("double") / 1e9
    h2 = -F.log(F.col("c2").cast("double") / (nd * nd))
    hinf = -F.log(F.col("cmax").cast("double") / nd)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("support"),
        F.floor(h0 * 1e6 + F.lit(_OFF)).cast("long").alias("h0_e6"),
        F.floor(hhalf * 1e6 + F.lit(_OFF)).cast("long").alias(
            "h_half_e6"
        ),
        F.floor(h1 * 1e6 + F.lit(_OFF)).cast("long").alias("h1_e6"),
        F.floor(h2 * 1e6 + F.lit(_OFF)).cast("long").alias("h2_e6"),
        F.floor(hinf * 1e6 + F.lit(_OFF)).cast("long").alias(
            "hinf_e6"
        ),
    ).orderBy("event_type")


SQL_RENYI = f"""
WITH c AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), cc AS (
  SELECT *, CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM c
), agg AS (
  SELECT event_type, max(n) AS n, count(*) AS k,
         CAST(sum(c * c) AS BIGINT) AS c2,
         CAST(max(c) AS BIGINT) AS cmax,
         CAST(sum(CAST(floor(sqrt(CAST(c AS DOUBLE) / n) * 1e9 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS h9,
         CAST(sum(CAST(floor(CAST(c AS DOUBLE) / n
                             * ln(CAST(n AS DOUBLE) / c) * 1e9 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS s9
  FROM cc GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(k AS BIGINT) AS support,
       CAST(floor(ln(CAST(k AS DOUBLE)) * 1e6 + {_OFF}) AS BIGINT)
         AS h0_e6,
       CAST(floor(2.0 * ln(CAST(h9 AS DOUBLE) / 1e9) * 1e6 + {_OFF})
            AS BIGINT) AS h_half_e6,
       CAST(floor(CAST(s9 AS DOUBLE) / 1e9 * 1e6 + {_OFF}) AS BIGINT)
         AS h1_e6,
       CAST(floor(-ln(CAST(c2 AS DOUBLE) / (CAST(n AS DOUBLE) * n))
                  * 1e6 + {_OFF}) AS BIGINT) AS h2_e6,
       CAST(floor(-ln(CAST(cmax AS DOUBLE) / n) * 1e6 + {_OFF})
            AS BIGINT) AS hinf_e6
FROM agg
ORDER BY event_type
"""

QUERIES["renyi_spectrum"] = q_renyi_spectrum
ORACLE_SQL["renyi_spectrum"] = SQL_RENYI


# ---------------------------------------------------------------------------
# signal_shape_stats — crest factor, impulse factor and zero-crossing
# rate of the mean-centered hourly series (vibration-analysis shape
# panel; ZCR counts sign changes of the exact n*y - S deviations)
# ---------------------------------------------------------------------------


def q_signal_shape_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly20(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("hr")
    r = (
        h.withColumn("n", F.count(F.lit(1)).over(wt))
        .withColumn("s", F.sum("y").over(wt))
        .withColumn("d", F.col("n") * F.col("y") - F.col("s"))
        .withColumn("dl", F.lag("d").over(wo))
    )
    agg = r.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.max(F.abs(F.col("d"))).alias("dmax"),
        F.sum(F.abs(F.col("d"))).alias("sabs"),
        F.sum(
            (
                F.col("dl").isNotNull()
                & (F.signum(F.col("d")) * F.signum(F.col("dl")) < 0)
            ).cast("long")
        ).alias("zc"),
    )
    nd = F.col("n").cast("double")
    rms = F.sqrt(F.col("sdd").cast("double") / nd)
    crest = F.col("dmax").cast("double") / rms
    impulse = F.col("dmax").cast("double") / (
        F.col("sabs").cast("double") / nd
    )
    zcr = F.col("zc").cast("double") / (nd - 1.0)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("zc").cast("long").alias("zero_crossings"),
        F.floor(crest * 1e6 + F.lit(_OFF)).cast("long").alias(
            "crest_e6"
        ),
        F.floor(impulse * 1e6 + F.lit(_OFF)).cast("long").alias(
            "impulse_e6"
        ),
        F.floor(zcr * 1e6 + F.lit(_OFF)).cast("long").alias("zcr_e6"),
    ).orderBy("event_type")


SQL_SIGSHAPE = f"""
WITH {_HOURLY20_SQL.format(off=_OFF)}
, r AS (
  SELECT event_type, hr, y,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS s
  FROM hourly
), d AS (
  SELECT event_type, n, n * y - s AS d,
         lag(n * y - s) OVER (PARTITION BY event_type ORDER BY hr) AS dl
  FROM r
), agg AS (
  SELECT event_type, max(n) AS n,
         CAST(sum(d * d) AS BIGINT) AS sdd,
         CAST(max(abs(d)) AS BIGINT) AS dmax,
         CAST(sum(abs(d)) AS BIGINT) AS sabs,
         CAST(sum(CASE WHEN dl IS NOT NULL
                        AND sign(d) * sign(dl) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS zc
  FROM d GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       zc AS zero_crossings,
       CAST(floor(CAST(dmax AS DOUBLE)
                  / sqrt(CAST(sdd AS DOUBLE) / n) * 1e6 + {_OFF})
            AS BIGINT) AS crest_e6,
       CAST(floor(CAST(dmax AS DOUBLE)
                  / (CAST(sabs AS DOUBLE) / n) * 1e6 + {_OFF})
            AS BIGINT) AS impulse_e6,
       CAST(floor(CAST(zc AS DOUBLE) / (n - 1.0) * 1e6 + {_OFF})
            AS BIGINT) AS zcr_e6
FROM agg
ORDER BY event_type
"""

QUERIES["signal_shape_stats"] = q_signal_shape_stats
ORACLE_SQL["signal_shape_stats"] = SQL_SIGSHAPE


# ===========================================================================
# Battery O — variance-structure tests
# ===========================================================================
# icss_variance_break: Inclan-Tiao (1994) ICSS centered cumulative
# sum of squares D_k = C_k/C_n - k/n, IT = sqrt(n/2) max|D_k| — the
# variance-change twin of cusum_shift (which tracks the mean).  The
# n-scaling of the exact deviations d = n*y - S cancels in C_k/C_n,
# so the backbone is an exact-integer cumulative of d^2 (bounded by
# the calendar grid, PLANS §127).


def q_icss_variance_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly20(spark, sf_dir)
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("hr")
    r = (
        h.withColumn("n", F.count(F.lit(1)).over(wt))
        .withColumn("s", F.sum("y").over(wt))
        .withColumn("d", F.col("n") * F.col("y") - F.col("s"))
    )
    r = (
        r.withColumn("k", F.row_number().over(wo))
        .withColumn(
            "ck",
            F.sum(F.col("d") * F.col("d")).over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("cn", F.sum(F.col("d") * F.col("d")).over(wt))
    ).filter(F.col("k") < F.col("n"))
    dk = F.col("ck").cast("double") / F.col("cn").cast("double") - F.col(
        "k"
    ).cast("double") / F.col("n").cast("double")
    sc = r.withColumn(
        "a6", F.floor(F.abs(dk) * 1e6 + F.lit(_OFF)).cast("long")
    ).withColumn("mx", F.max(F.col("a6")).over(wt))
    agg = sc.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("mx").alias("mx"),
        F.min(F.when(F.col("a6") == F.col("mx"), F.col("k"))).alias(
            "k_break"
        ),
        F.min(F.when(F.col("a6") == F.col("mx"), F.col("hr"))).alias(
            "hr_break"
        ),
    )
    it = F.sqrt(F.col("n").cast("double") / 2.0) * (
        F.col("mx").cast("double") / 1e6
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("mx").cast("long").alias("max_abs_d_e6"),
        F.col("k_break").cast("long").alias("k_break"),
        F.col("hr_break").cast("long").alias("hr_break"),
        F.floor(it * 1e4 + F.lit(_OFF)).cast("long").alias("it_e4"),
    ).orderBy("event_type")


SQL_ICSS = f"""
WITH {_HOURLY20_SQL.format(off=_OFF)}
, r AS (
  SELECT event_type, hr, y,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS s
  FROM hourly
), d AS (
  SELECT event_type, hr, n, n * y - s AS d,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS k
  FROM r
), c AS (
  SELECT event_type, hr, n, k,
         CAST(sum(d * d) OVER (PARTITION BY event_type ORDER BY hr
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS ck,
         CAST(sum(d * d) OVER (PARTITION BY event_type) AS BIGINT) AS cn
  FROM d
), sc AS (
  SELECT event_type, hr, n, k,
         CAST(floor(abs(CAST(ck AS DOUBLE) / cn
                        - CAST(k AS DOUBLE) / n) * 1e6 + {_OFF})
              AS BIGINT) AS a6
  FROM c WHERE k < n
), f AS (
  SELECT *, max(a6) OVER (PARTITION BY event_type) AS mx FROM sc
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(max(mx) AS BIGINT) AS max_abs_d_e6,
       CAST(min(CASE WHEN a6 = mx THEN k END) AS BIGINT) AS k_break,
       CAST(min(CASE WHEN a6 = mx THEN hr END) AS BIGINT) AS hr_break,
       CAST(floor(sqrt(CAST(max(n) AS DOUBLE) / 2.0)
                  * (CAST(max(mx) AS DOUBLE) / 1e6) * 1e4 + {_OFF})
            AS BIGINT) AS it_e4
FROM f
GROUP BY 1
ORDER BY event_type
"""

QUERIES["icss_variance_break"] = q_icss_variance_break
ORACLE_SQL["icss_variance_break"] = SQL_ICSS


# ---------------------------------------------------------------------------
# brown_forsythe_levene — Brown-Forsythe (median-centered Levene)
# equality-of-spread test across the event types
# ---------------------------------------------------------------------------
# Z_ij = |y_ij - median_i| (median = exact per-type order-statistic
# pick on the hourly means, so Z is an exact integer); W is assembled
# from exact Z sums with the n*z - S device — one double at the end.


def q_brown_forsythe_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly20(spark, sf_dir)
    wv = Window.partitionBy("event_type").orderBy("y", "hr")
    wt = Window.partitionBy("event_type")
    med = (
        h.withColumn("rn", F.row_number().over(wv))
        .withColumn("n", F.count(F.lit(1)).over(wt))
        .filter(F.col("rn") == F.floor((F.col("n") - 1) / 2) + 1)
        .select("event_type", F.col("y").alias("med"))
    )
    z = h.join(med, "event_type").withColumn(
        "z", F.abs(F.col("y") - F.col("med"))
    )
    per = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum("z").alias("szi"),
        F.sum(F.col("z") * F.col("z")).alias("szzi"),
    )
    tot = per.agg(
        F.sum("ni").alias("nn"),
        F.sum("szi").alias("sz"),
        F.count(F.lit(1)).alias("k"),
    )
    j = per.crossJoin(F.broadcast(tot))
    # between: sum_i n_i (zbar_i - zbar)^2 = sum_i (n*szi - ni*sz)^2/(ni*n^2)
    bd = (
        F.col("nn") * F.col("szi") - F.col("ni") * F.col("sz")
    ).cast("double")
    betw12 = F.floor(
        bd * bd
        / (
            F.col("ni").cast("double")
            * F.col("nn").cast("double")
            * F.col("nn").cast("double")
        )
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    # within: sum_ij (z - zbar_i)^2 = szzi - szi^2/ni
    with12 = F.floor(
        (
            F.col("szzi").cast("double")
            - F.col("szi").cast("double")
            * F.col("szi").cast("double")
            / F.col("ni").cast("double")
        )
        * 1e6
        + F.lit(_OFF)
    ).cast("long")
    agg = j.groupBy().agg(
        F.max("nn").alias("nn"),
        F.max("k").alias("k"),
        F.sum(betw12).alias("b6"),
        F.sum(with12).alias("w6"),
    )
    w = (
        (F.col("nn") - F.col("k")).cast("double")
        / (F.col("k") - 1).cast("double")
        * F.col("b6").cast("double")
        / F.col("w6").cast("double")
    )
    return agg.select(
        F.col("nn").cast("long").alias("n"),
        F.col("k").cast("long").alias("k_groups"),
        F.floor(w * 1e6 + F.lit(_OFF)).cast("long").alias("w_e6"),
    )


SQL_BF = f"""
WITH {_HOURLY20_SQL.format(off=_OFF)}
, med AS (
  SELECT event_type, y AS med
  FROM (
    SELECT event_type, y, hr,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY y, hr) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM hourly
  ) WHERE rn = (n - 1) // 2 + 1
), z AS (
  SELECT h.event_type, abs(h.y - m.med) AS z
  FROM hourly h JOIN med m ON m.event_type = h.event_type
), per AS (
  SELECT event_type, count(*) AS ni,
         CAST(sum(z) AS BIGINT) AS szi,
         CAST(sum(z * z) AS BIGINT) AS szzi
  FROM z GROUP BY 1
), tot AS (
  SELECT CAST(sum(ni) AS BIGINT) AS nn,
         CAST(sum(szi) AS BIGINT) AS sz,
         count(*) AS k
  FROM per
), terms AS (
  SELECT max(t.nn) AS nn, max(t.k) AS k,
         CAST(sum(CAST(floor(
           CAST(t.nn * p.szi - p.ni * t.sz AS DOUBLE)
           * CAST(t.nn * p.szi - p.ni * t.sz AS DOUBLE)
           / (CAST(p.ni AS DOUBLE) * t.nn * t.nn) * 1e6 + {_OFF})
           AS BIGINT)) AS BIGINT) AS b6,
         CAST(sum(CAST(floor(
           (CAST(p.szzi AS DOUBLE)
            - CAST(p.szi AS DOUBLE) * p.szi / p.ni) * 1e6 + {_OFF})
           AS BIGINT)) AS BIGINT) AS w6
  FROM per p CROSS JOIN tot t
)
SELECT CAST(nn AS BIGINT) AS n,
       CAST(k AS BIGINT) AS k_groups,
       CAST(floor(CAST(nn - k AS DOUBLE) / (k - 1)
                  * CAST(b6 AS DOUBLE) / w6 * 1e6 + {_OFF})
            AS BIGINT) AS w_e6
FROM terms
"""

QUERIES["brown_forsythe_levene"] = q_brown_forsythe_levene
ORACLE_SQL["brown_forsythe_levene"] = SQL_BF


# ===========================================================================
# Battery P — poverty measurement and a circular-robust two-sample
# ===========================================================================
# fgt_poverty: Foster-Greer-Thorbecke FGT(0/1/2) at the EU line (60%
# of the per-type median user spend), plus the within-poor Gini and
# Sen's (1976) composite S = F0 (I + (1-I) G_poor).  Backbones: the
# kakwani_suits income collapse, an exact order-statistic median, an
# integer poverty line zl = 6*med // 10, and the gmd value-domain
# prefix for the poor-subset Gini.


def q_fgt_poverty(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "cv"
        ),
    )
    inc = ev.groupBy("event_type", "user_id").agg(
        F.sum("cv").alias("x")
    )
    wv = Window.partitionBy("event_type").orderBy("x", "user_id")
    wt = Window.partitionBy("event_type")
    med = (
        inc.withColumn("rn", F.row_number().over(wv))
        .withColumn("n", F.count(F.lit(1)).over(wt))
        .filter(F.col("rn") == F.floor((F.col("n") - 1) / 2) + 1)
        .select("event_type", ((F.col("x") * 6) / 10).cast("long").alias("zl"))
    )
    d = inc.join(med, "event_type")
    poor = d.filter(F.col("x") < F.col("zl"))
    g1_12 = F.floor(
        (F.col("zl") - F.col("x")).cast("double")
        / F.col("zl").cast("double")
        * 1e12
        + F.lit(_OFF)
    ).cast("long")
    g2_12 = F.floor(
        (F.col("zl") - F.col("x")).cast("double")
        / F.col("zl").cast("double")
        * (F.col("zl") - F.col("x")).cast("double")
        / F.col("zl").cast("double")
        * 1e12
        + F.lit(_OFF)
    ).cast("long")
    pagg = poor.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("q"),
        F.sum(g1_12).alias("s1"),
        F.sum(g2_12).alias("s2"),
    )
    # within-poor Gini via the value-domain prefix trick
    pd_ = poor.groupBy("event_type", "x").agg(
        F.count(F.lit(1)).alias("c")
    )
    wpv = Window.partitionBy("event_type").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pw = pd_.withColumn(
        "cum", F.coalesce(F.sum("c").over(wpv), F.lit(0))
    ).withColumn(
        "cums",
        F.coalesce(F.sum(F.col("c") * F.col("x")).over(wpv), F.lit(0)),
    )
    gini = pw.groupBy("event_type").agg(
        F.sum("c").alias("qq"),
        F.sum(F.col("c") * F.col("x")).alias("sx"),
        F.sum(
            F.col("c") * (F.col("x") * F.col("cum") - F.col("cums"))
        ).alias("sdiff"),
    )
    nall = inc.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    j = nall.join(pagg, "event_type", "left").join(
        gini, "event_type", "left"
    )
    nd = F.col("n").cast("double")
    f0 = F.coalesce(F.col("q"), F.lit(0)).cast("double") / nd
    f1 = F.coalesce(F.col("s1"), F.lit(0)).cast("double") / (nd * 1e12)
    f2 = F.coalesce(F.col("s2"), F.lit(0)).cast("double") / (nd * 1e12)
    # degenerate guards (sf0.001 sweep): a type with ZERO poor users has
    # f0 = 0, making the income-gap ratio 0/0 — all poverty measures are
    # 0 by definition then.  A poor subset whose spends are all zero
    # (sx = 0) leaves the within-poor Gini undefined -> 0.
    gp_den = (
        F.coalesce(F.col("qq"), F.lit(1)).cast("double")
        * F.coalesce(F.col("sx"), F.lit(1)).cast("double")
    )
    gp = F.when(
        gp_den != 0,
        F.coalesce(F.col("sdiff"), F.lit(0)).cast("double") / gp_den,
    ).otherwise(F.lit(0.0))
    i_gap = F.when(f0 != 0, f1 / f0).otherwise(F.lit(0.0))
    sen = f0 * (i_gap + (1.0 - i_gap) * gp)
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.coalesce(F.col("q"), F.lit(0)).cast("long").alias("n_poor"),
        F.floor(f0 * 1e6 + F.lit(_OFF)).cast("long").alias("fgt0_e6"),
        F.floor(f1 * 1e6 + F.lit(_OFF)).cast("long").alias("fgt1_e6"),
        F.floor(f2 * 1e6 + F.lit(_OFF)).cast("long").alias("fgt2_e6"),
        F.floor(gp * 1e6 + F.lit(_OFF)).cast("long").alias(
            "gini_poor_e6"
        ),
        F.floor(sen * 1e6 + F.lit(_OFF)).cast("long").alias("sen_e6"),
    ).orderBy("event_type")


SQL_FGT = f"""
WITH inc AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, CAST(x * 6 // 10 AS BIGINT) AS zl
  FROM (
    SELECT event_type, x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY x, user_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM inc
  ) WHERE rn = (n - 1) // 2 + 1
), d AS (
  SELECT i.event_type, i.x, m.zl
  FROM inc i JOIN med m ON m.event_type = i.event_type
), poor AS (
  SELECT * FROM d WHERE x < zl
), pagg AS (
  SELECT event_type, count(*) AS q,
         CAST(sum(CAST(floor(CAST(zl - x AS DOUBLE) / zl * 1e12
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(floor(CAST(zl - x AS DOUBLE) / zl
                             * CAST(zl - x AS DOUBLE) / zl * 1e12
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS s2
  FROM poor GROUP BY 1
), pdom AS (
  SELECT event_type, x, CAST(count(*) AS BIGINT) AS c
  FROM poor GROUP BY 1, 2
), pw AS (
  SELECT *,
         CAST(coalesce(sum(c) OVER wv, 0) AS BIGINT) AS cum,
         CAST(coalesce(sum(c * x) OVER wv, 0) AS BIGINT) AS cums
  FROM pdom
  WINDOW wv AS (PARTITION BY event_type ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), gini AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS qq,
         CAST(sum(c * x) AS BIGINT) AS sx,
         CAST(sum(c * (x * cum - cums)) AS BIGINT) AS sdiff
  FROM pw GROUP BY 1
), nall AS (
  SELECT event_type, count(*) AS n FROM inc GROUP BY 1
)
SELECT nall.event_type AS event_type,
       CAST(nall.n AS BIGINT) AS n_users,
       CAST(coalesce(pagg.q, 0) AS BIGINT) AS n_poor,
       CAST(floor(CAST(coalesce(pagg.q, 0) AS DOUBLE) / nall.n * 1e6
                  + {_OFF}) AS BIGINT) AS fgt0_e6,
       CAST(floor(CAST(coalesce(pagg.s1, 0) AS DOUBLE)
                  / (CAST(nall.n AS DOUBLE) * 1e12) * 1e6 + {_OFF})
            AS BIGINT) AS fgt1_e6,
       CAST(floor(CAST(coalesce(pagg.s2, 0) AS DOUBLE)
                  / (CAST(nall.n AS DOUBLE) * 1e12) * 1e6 + {_OFF})
            AS BIGINT) AS fgt2_e6,
       CAST(CASE WHEN coalesce(gini.qq, 1) * coalesce(gini.sx, 1) = 0
            THEN 0
            ELSE floor(CAST(coalesce(gini.sdiff, 0) AS DOUBLE)
                  / (CAST(coalesce(gini.qq, 1) AS DOUBLE)
                     * CAST(coalesce(gini.sx, 1) AS DOUBLE)) * 1e6
                  + {_OFF})
            END AS BIGINT) AS gini_poor_e6,
       CAST(CASE WHEN coalesce(pagg.q, 0) = 0 THEN 0
            ELSE floor(
         (CAST(coalesce(pagg.q, 0) AS DOUBLE) / nall.n)
         * ((CAST(coalesce(pagg.s1, 0) AS DOUBLE)
             / (CAST(nall.n AS DOUBLE) * 1e12))
            / (CAST(coalesce(pagg.q, 0) AS DOUBLE) / nall.n)
            + (1.0 - (CAST(coalesce(pagg.s1, 0) AS DOUBLE)
                      / (CAST(nall.n AS DOUBLE) * 1e12))
                     / (CAST(coalesce(pagg.q, 0) AS DOUBLE) / nall.n))
              * (CASE WHEN coalesce(gini.qq, 1) * coalesce(gini.sx, 1) = 0
                 THEN 0.0
                 ELSE CAST(coalesce(gini.sdiff, 0) AS DOUBLE)
                 / (CAST(coalesce(gini.qq, 1) AS DOUBLE)
                    * CAST(coalesce(gini.sx, 1) AS DOUBLE)) END))
         * 1e6 + {_OFF})
            END AS BIGINT) AS sen_e6
FROM nall
LEFT JOIN pagg ON pagg.event_type = nall.event_type
LEFT JOIN gini ON gini.event_type = nall.event_type
ORDER BY event_type
"""

QUERIES["fgt_poverty"] = q_fgt_poverty
ORACLE_SQL["fgt_poverty"] = SQL_FGT


# ---------------------------------------------------------------------------
# kuiper_2sample — Kuiper's V = D+ + D- between type-pair hourly
# samples (rotation-invariant ECDF test; pairs with cvm_2sample)
# ---------------------------------------------------------------------------
# Value-domain collapse per pair; D+ = max(m*cumx - n*cumy),
# D- = max(n*cumy - m*cumx) over the pooled distinct values — exact
# integers scaled by n*m.


def q_kuiper_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly20(spark, sf_dir)
    types = h.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    tagged = h.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("ta"))
        | (F.col("event_type") == F.col("tb")),
    ).withColumn(
        "sa", (F.col("event_type") == F.col("ta")).cast("long")
    )
    dom = tagged.groupBy("ta", "tb", "y").agg(
        F.sum("sa").alias("ca"),
        F.sum(F.lit(1) - F.col("sa")).alias("cb"),
    )
    wp = Window.partitionBy("ta", "tb")
    wv = Window.partitionBy("ta", "tb").orderBy("y")
    r = (
        dom.withColumn("n", F.sum("ca").over(wp))
        .withColumn("m", F.sum("cb").over(wp))
        .withColumn(
            "cax",
            F.sum("ca").over(wv.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "cby",
            F.sum("cb").over(wv.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    diff = F.col("m") * F.col("cax") - F.col("n") * F.col("cby")
    agg = r.groupBy("ta", "tb").agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.greatest(F.max(diff), F.lit(0)).alias("dp"),
        F.greatest(F.max(-diff), F.lit(0)).alias("dm"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    v = (F.col("dp") + F.col("dm")).cast("double") / (nd * md)
    stat = v * F.sqrt(nd * md / (nd + md))
    return agg.select(
        "ta",
        "tb",
        F.col("n").cast("long").alias("n"),
        F.col("m").cast("long").alias("m"),
        F.floor(v * 1e6 + F.lit(_OFF)).cast("long").alias("v_e6"),
        F.floor(stat * 1e4 + F.lit(_OFF)).cast("long").alias(
            "stat_e4"
        ),
    ).orderBy("ta", "tb")


SQL_KUIPER2 = f"""
WITH {_HOURLY20_SQL.format(off=_OFF)}
, types AS (
  SELECT DISTINCT event_type AS t FROM hourly
), pairs AS (
  SELECT a.t AS ta, b.t AS tb FROM types a JOIN types b ON a.t < b.t
), tagged AS (
  SELECT p.ta, p.tb, h.y,
         CASE WHEN h.event_type = p.ta THEN 1 ELSE 0 END AS sa
  FROM hourly h JOIN pairs p
    ON h.event_type = p.ta OR h.event_type = p.tb
), dom AS (
  SELECT ta, tb, y,
         CAST(sum(sa) AS BIGINT) AS ca,
         CAST(sum(1 - sa) AS BIGINT) AS cb
  FROM tagged GROUP BY 1, 2, 3
), r AS (
  SELECT *,
         CAST(sum(ca) OVER (PARTITION BY ta, tb) AS BIGINT) AS n,
         CAST(sum(cb) OVER (PARTITION BY ta, tb) AS BIGINT) AS m,
         CAST(sum(ca) OVER wv AS BIGINT) AS cax,
         CAST(sum(cb) OVER wv AS BIGINT) AS cby
  FROM dom
  WINDOW wv AS (PARTITION BY ta, tb ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), agg AS (
  SELECT ta, tb, max(n) AS n, max(m) AS m,
         greatest(max(m * cax - n * cby), 0) AS dp,
         greatest(max(n * cby - m * cax), 0) AS dm
  FROM r GROUP BY 1, 2
)
SELECT ta, tb, CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
       CAST(floor(CAST(dp + dm AS DOUBLE) / (CAST(n AS DOUBLE) * m)
                  * 1e6 + {_OFF}) AS BIGINT) AS v_e6,
       CAST(floor(CAST(dp + dm AS DOUBLE) / (CAST(n AS DOUBLE) * m)
                  * sqrt(CAST(n AS DOUBLE) * m / (n + m)) * 1e4
                  + {_OFF}) AS BIGINT) AS stat_e4
FROM agg
ORDER BY ta, tb
"""

QUERIES["kuiper_2sample"] = q_kuiper_2sample
ORACLE_SQL["kuiper_2sample"] = SQL_KUIPER2


# ===========================================================================
# Battery R — rank_turbulence_divergence: Dodds et al. (2020)
# rank-turbulence divergence between the English and non-English
# token frequency rankings (common-vocabulary form, alpha = 1/3).
# ===========================================================================
# Tokens are lowercased alpha runs; per-system ranks are deterministic
# (count desc, token asc dense ranks); the divergence sums
# |r1^(-1/3) - r2^(-1/3)| over the COMMON vocabulary (the documented
# variant — exclusive-vocabulary terms are counted separately), with
# per-term e9 floors and an exact final sum.  Output also surfaces
# the top-contributing token — the "what changed" readout.


def q_rank_turbulence_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        (F.col("lang") == "en").cast("long").alias("sys"),
        F.explode(
            F.split(F.lower(F.col("text")), "[^a-z]+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    cnt = d.groupBy("sys", "w").agg(F.count(F.lit(1)).alias("c"))
    # vocabulary ranking WITHOUT a 2-partition window: one distributed
    # global row_number over (sys, count desc, token), then per-system
    # ranks fall out by subtracting the bounded sys-0 offset
    from diive_spark.operators.rank import global_row_number

    sizes = {
        int(r0["sys"]): int(r0["n"])
        for r0 in cnt.groupBy("sys")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n0 = sizes.get(0, 0)
    rr = global_row_number(
        cnt,
        [F.col("sys").asc(), F.col("c").desc(), F.col("w").asc()],
        "rn",
    )
    r = rr.withColumn(
        "rk",
        F.when(F.col("sys") == 0, F.col("rn")).otherwise(
            F.col("rn") - F.lit(n0)
        ),
    )
    a = r.filter(F.col("sys") == 1).select(
        "w", F.col("rk").alias("r1")
    )
    b = r.filter(F.col("sys") == 0).select(
        "w", F.col("rk").alias("r2")
    )
    both = a.join(b, "w")
    term9 = F.floor(
        F.abs(
            F.pow(F.col("r1").cast("double"), F.lit(-1.0 / 3.0))
            - F.pow(F.col("r2").cast("double"), F.lit(-1.0 / 3.0))
        )
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    sc = both.withColumn("t9", term9)
    mx = sc.agg(F.max("t9").alias("m")).collect()[0].m
    top = (
        sc.filter(F.col("t9") == mx)
        .agg(F.min("w").alias("top_word"))
    )
    agg = sc.agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum("t9").alias("s9"),
        F.max("t9").alias("t9max"),
    )
    na = a.count()
    nb = b.count()
    out = agg.crossJoin(top)
    return out.select(
        F.lit(int(na)).cast("long").alias("vocab_en"),
        F.lit(int(nb)).cast("long").alias("vocab_other"),
        F.col("n_common").cast("long").alias("n_common"),
        F.floor(F.col("s9") / 1000).cast("long").alias("rtd_e6"),
        F.col("t9max").cast("long").alias("top_term_e9"),
        "top_word",
    )


SQL_RTD = f"""
WITH toks AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS sys,
         unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
  FROM documents
), cnt AS (
  SELECT sys, w, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE w <> '' GROUP BY 1, 2
), r AS (
  SELECT sys, w,
         row_number() OVER (PARTITION BY sys ORDER BY c DESC, w ASC)
           AS rk
  FROM cnt
), a AS (SELECT w, rk AS r1 FROM r WHERE sys = 1),
b AS (SELECT w, rk AS r2 FROM r WHERE sys = 0),
cm AS (
  SELECT a.w, a.r1, b.r2,
         CAST(floor(abs(pow(CAST(a.r1 AS DOUBLE), -1.0 / 3.0)
                        - pow(CAST(b.r2 AS DOUBLE), -1.0 / 3.0)) * 1e9
                    + {_OFF}) AS BIGINT) AS t9
  FROM a JOIN b ON b.w = a.w
), mx AS (
  SELECT max(t9) AS m FROM cm
), top AS (
  SELECT min(w) AS top_word FROM cm, mx WHERE t9 = m
)
SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS vocab_en,
       CAST((SELECT count(*) FROM b) AS BIGINT) AS vocab_other,
       CAST(count(*) AS BIGINT) AS n_common,
       CAST(floor(CAST(sum(t9) AS DOUBLE) / 1000) AS BIGINT) AS rtd_e6,
       CAST(max(t9) AS BIGINT) AS top_term_e9,
       (SELECT top_word FROM top) AS top_word
FROM cm
"""

QUERIES["rank_turbulence_divergence"] = q_rank_turbulence_divergence
ORACLE_SQL["rank_turbulence_divergence"] = SQL_RTD


# ===========================================================================
# Battery R2 — jenks_natural_breaks (rows-only, pytest-pinned in
# tests/test_jenks.py)
# ===========================================================================


def q_jenks_natural_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Fisher-Jenks optimal 4-class natural breaks of each
    type's hourly mean distribution — the optimal-binning complement
    to otsu_threshold (k=2) and binning_rules (heuristic widths)."""
    from diive_spark.operators.jenks import jenks_frame

    h = _hourly20(spark, sf_dir).withColumn(
        "yv", F.col("y").cast("double") / 100.0
    )
    out = jenks_frame(h, "event_type", "yv", k=4)
    return out.select(
        "event_type",
        "n",
        "k",
        F.round("b1", 4).alias("b1"),
        F.round("b2", 4).alias("b2"),
        F.round("b3", 4).alias("b3"),
        F.round("gvf", 4).alias("gvf"),
    ).orderBy("event_type")


QUERIES["jenks_natural_breaks"] = q_jenks_natural_breaks


# ===========================================================================
# Battery T — time_irreversibility: Porta's P%, Guzik's G% and
# Ehlers' skewness index over successive hourly differences (the HRV
# asymmetry panel; a reversible process has P ~ 50%, G ~ 50%, E ~ 0).
# ===========================================================================
# d_t = y_t - y_{t-1} over the hourly grid (exact integers); P% =
# #(d<0)/#(d!=0), G% = sum(d+^2)/sum(d^2), E = sum(d^3)/sum(d^2)^1.5
# — integer numerators throughout, one double each at the end.


def q_time_irreversibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly20(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("hr")
    d = h.withColumn("d", F.col("y") - F.lag("y").over(wo)).filter(
        F.col("d").isNotNull()
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("d") < 0).cast("long")).alias("neg"),
        F.sum((F.col("d") != 0).cast("long")).alias("nz"),
        F.sum(
            F.when(F.col("d") > 0, F.col("d") * F.col("d")).otherwise(0)
        ).alias("sp2"),
        F.sum(F.col("d") * F.col("d")).alias("s2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).alias("s3"),
    )
    p = F.col("neg").cast("double") / F.col("nz").cast("double")
    g = F.col("sp2").cast("double") / F.col("s2").cast("double")
    e = F.col("s3").cast("double") / F.pow(
        F.col("s2").cast("double"), F.lit(1.5)
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_diffs"),
        F.col("nz").cast("long").alias("n_nonzero"),
        F.floor(p * 1e6 + F.lit(_OFF)).cast("long").alias(
            "porta_e6"
        ),
        F.floor(g * 1e6 + F.lit(_OFF)).cast("long").alias(
            "guzik_e6"
        ),
        F.floor(e * 1e6 + F.lit(_OFF)).cast("long").alias(
            "ehlers_e6"
        ),
    ).orderBy("event_type")


SQL_IRREV = f"""
WITH {_HOURLY20_SQL.format(off=_OFF)}
, d AS (
  SELECT event_type,
         y - lag(y) OVER (PARTITION BY event_type ORDER BY hr) AS d
  FROM hourly
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg,
         CAST(sum(CASE WHEN d <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nz,
         CAST(sum(CASE WHEN d > 0 THEN d * d ELSE 0 END)
              AS BIGINT) AS sp2,
         CAST(sum(d * d) AS BIGINT) AS s2,
         CAST(sum(d * d * d) AS BIGINT) AS s3
  FROM d WHERE d IS NOT NULL GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_diffs,
       nz AS n_nonzero,
       CAST(floor(CAST(neg AS DOUBLE) / nz * 1e6 + {_OFF}) AS BIGINT)
         AS porta_e6,
       CAST(floor(CAST(sp2 AS DOUBLE) / s2 * 1e6 + {_OFF}) AS BIGINT)
         AS guzik_e6,
       CAST(floor(CAST(s3 AS DOUBLE) / pow(CAST(s2 AS DOUBLE), 1.5)
                  * 1e6 + {_OFF})
            AS BIGINT) AS ehlers_e6
FROM agg
ORDER BY event_type
"""

QUERIES["time_irreversibility"] = q_time_irreversibility
ORACLE_SQL["time_irreversibility"] = SQL_IRREV


# ===========================================================================
# Battery U — series-geometry kernels (rows-only, pytest-pinned in
# tests/test_hvg_ssa.py)
# ===========================================================================


def q_hvg_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizontal visibility graph degree profile of each type's
    hourly series (Luque 2009) — iid noise gives mean degree -> 4;
    structure pulls it down."""
    from diive_spark.operators.visibility import hvg_frame

    h = _hourly20(spark, sf_dir)
    out = hvg_frame(h, "event_type", "hr", "y")
    return out.select(
        "event_type",
        "n",
        "n_edges",
        F.round("mean_degree", 4).alias("mean_degree"),
        "max_degree",
        F.round("degree_entropy", 4).alias("degree_entropy"),
    ).orderBy("event_type")


QUERIES["hvg_degree_stats"] = q_hvg_degree_stats


def q_ssa_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSA eigen-spectrum (L=24) of each type's hourly series: top
    shares + spectral effective rank, with the full-reconstruction
    residual as an in-row exactness witness."""
    from diive_spark.operators.ssa import ssa_frame

    h = _hourly20(spark, sf_dir).withColumn(
        "yv", F.col("y").cast("double") / 100.0
    )
    out = ssa_frame(h, "event_type", "hr", "yv", L=24)
    return out.select(
        "event_type",
        "n",
        "l",
        F.round("share1", 4).alias("share1"),
        F.round("share2", 4).alias("share2"),
        F.round("share3", 4).alias("share3"),
        F.round("eff_rank", 4).alias("eff_rank"),
        (F.col("recon_resid") < 1e-6).cast("long").alias("recon_ok"),
    ).orderBy("event_type")


QUERIES["ssa_spectrum"] = q_ssa_spectrum


# ===========================================================================
# Battery V — replay-against-the-ideal kernels (rows-only, pinned in
# tests/test_queuesim.py)
# ===========================================================================


def q_lindley_wait_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical FIFO waits by the Lindley recursion vs the P-K
    prediction from the same moments — the model-error audit for
    mg1_pollaczek_wait (service = value/100 seconds)."""
    from diive_spark.operators.queuesim import lindley_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1e6).alias(
            "at_s"
        ),
        (F.col("value") / 100.0).alias("svc_s"),
    )
    out = lindley_frame(ev, "event_type", "at_s", "svc_s")
    return out.select(
        "event_type",
        "n",
        F.round("rho", 4).alias("rho"),
        F.round("mean_wait", 4).alias("mean_wait_s"),
        F.round("p95_wait", 4).alias("p95_wait_s"),
        F.round("frac_delayed", 4).alias("frac_delayed"),
        F.round("pk_wait", 4).alias("pk_wait_s"),
    ).orderBy("event_type")


QUERIES["lindley_wait_audit"] = q_lindley_wait_audit


def q_belady_opt_hit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Belady's clairvoyant OPT hit rates at the lru_hit_curve
    capacities — the offline-optimal bound the online LRU curve is
    judged against (OPT >= LRU pinned per stream)."""
    from diive_spark.operators.queuesim import belady_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("user_id").alias("ref"),
    )
    out = belady_frame(ev, "event_type", "us", "ref")
    return out.select(
        "event_type",
        "n",
        "n_unique",
        F.round("opt_c1", 4).alias("opt_c1"),
        F.round("opt_c4", 4).alias("opt_c4"),
        F.round("opt_c16", 4).alias("opt_c16"),
    ).orderBy("event_type")


QUERIES["belady_opt_hit"] = q_belady_opt_hit


# ===========================================================================
# Battery W — customer-base analysis and consensus ranking
# ===========================================================================
# sbg_retention_fit: Fader-Hardie shifted-beta-geometric churn model
# fitted in closed form from the first two weekly retention rates
# (method of moments on the sBG recursion r_t = (b+t-1)/(a+b+t-1)):
#   a = (1-r1)(1-r2)/(r2-r1),  b = r1(1-r2)/(r2-r1)
# Cohort = users whose first event falls in the data's first calendar
# week; s_k = cohort members active in week k (exact integers).  The
# fitted curve's week-4 projection is emitted next to the OBSERVED
# week-4 survival — the model-vs-data readout.


def q_sbg_retention_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 604_800_000_000
        ).cast("long").alias("wk"),
    )
    w0 = ev.groupBy("event_type").agg(F.min("wk").alias("wk0"))
    e = ev.join(w0, "event_type").withColumn(
        "k", F.col("wk") - F.col("wk0")
    )
    first = e.groupBy("event_type", "user_id").agg(
        F.min("k").alias("fk")
    )
    cohort = first.filter(F.col("fk") == 0).select(
        "event_type", "user_id"
    )
    # survival form: alive at week k iff the LAST event is in week >= k
    # (monotone by construction — sBG models once-dead-stays-dead)
    last = (
        e.join(cohort, ["event_type", "user_id"])
        .groupBy("event_type", "user_id")
        .agg(F.max("k").alias("lk"))
    )
    s = last.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum((F.col("lk") >= 1).cast("long")).alias("s1"),
        F.sum((F.col("lk") >= 2).cast("long")).alias("s2"),
        F.sum((F.col("lk") >= 4).cast("long")).alias("s4"),
    )
    r1 = F.col("s1").cast("double") / F.col("s0").cast("double")
    r2 = F.col("s2").cast("double") / F.col("s1").cast("double")
    den = F.when(r2 - r1 != 0.0, r2 - r1)
    a = (1.0 - r1) * (1.0 - r2) / den
    b = r1 * (1.0 - r2) / den
    # projected survival S(4) = prod_{t=1..4} (b+t-1)/(a+b+t-1)
    surv4 = (
        (b / (a + b))
        * ((b + 1.0) / (a + b + 1.0))
        * ((b + 2.0) / (a + b + 2.0))
        * ((b + 3.0) / (a + b + 3.0))
    )
    return s.select(
        "event_type",
        F.col("s0").cast("long").alias("cohort_n"),
        F.col("s1").cast("long").alias("week1_n"),
        F.col("s2").cast("long").alias("week2_n"),
        F.floor(a * 1e6 + F.lit(_OFF)).cast("long").alias("alpha_e6"),
        F.floor(b * 1e6 + F.lit(_OFF)).cast("long").alias("beta_e6"),
        F.floor(surv4 * 1e6 + F.lit(_OFF)).cast("long").alias(
            "surv4_pred_e6"
        ),
        F.floor(
            F.col("s4").cast("double") / F.col("s0").cast("double") * 1e6
            + F.lit(_OFF)
        ).cast("long").alias("surv4_obs_e6"),
    ).orderBy("event_type")


SQL_SBG = f"""
WITH ev AS (
  SELECT event_type, user_id,
         CAST(epoch_us(ts) AS BIGINT) // 604800000000 AS wk
  FROM events
), w0 AS (
  SELECT event_type, min(wk) AS wk0 FROM ev GROUP BY 1
), e AS (
  SELECT ev.event_type, ev.user_id, ev.wk - w0.wk0 AS k
  FROM ev JOIN w0 ON w0.event_type = ev.event_type
), first AS (
  SELECT event_type, user_id, min(k) AS fk FROM e GROUP BY 1, 2
), cohort AS (
  SELECT event_type, user_id FROM first WHERE fk = 0
), last AS (
  SELECT e.event_type, e.user_id, max(e.k) AS lk
  FROM e JOIN cohort c
    ON c.event_type = e.event_type AND c.user_id = e.user_id
  GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS s0,
         CAST(sum(CASE WHEN lk >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN lk >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN lk >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
  FROM last GROUP BY 1
), fit AS (
  SELECT *,
         CAST(s1 AS DOUBLE) / s0 AS r1,
         CAST(s2 AS DOUBLE) / s1 AS r2
  FROM s
), ab AS (
  SELECT *,
         (1.0 - r1) * (1.0 - r2) / nullif(r2 - r1, 0.0) AS a,
         r1 * (1.0 - r2) / nullif(r2 - r1, 0.0) AS b
  FROM fit
)
SELECT event_type,
       s0 AS cohort_n, s1 AS week1_n, s2 AS week2_n,
       CAST(floor(a * 1e6 + {_OFF}) AS BIGINT) AS alpha_e6,
       CAST(floor(b * 1e6 + {_OFF}) AS BIGINT) AS beta_e6,
       CAST(floor((b / (a + b)) * ((b + 1.0) / (a + b + 1.0))
                  * ((b + 2.0) / (a + b + 2.0))
                  * ((b + 3.0) / (a + b + 3.0)) * 1e6 + {_OFF})
            AS BIGINT) AS surv4_pred_e6,
       CAST(floor(CAST(s4 AS DOUBLE) / s0 * 1e6 + {_OFF}) AS BIGINT)
         AS surv4_obs_e6
FROM ab
ORDER BY event_type
"""

QUERIES["sbg_retention_fit"] = q_sbg_retention_fit
ORACLE_SQL["sbg_retention_fit"] = SQL_SBG


# ---------------------------------------------------------------------------
# kemeny_ranking — exact Kemeny-Young consensus order of the event
# types (minimum total pairwise disagreement), exhaustive over the
# 120 permutations of the 5 observed types
# ---------------------------------------------------------------------------
# Voter preferences: user u prefers i over j iff u fired more
# i-events than j-events; prefs(i,j) = #users preferring i.  The
# Kemeny cost of an order is sum over ordered positions (a before b)
# of prefs(b,a).  The 20-cell preference matrix is bounded ->
# collected and scored exhaustively in Python (absorbing_markov
# device); the SQL twin builds the 120 permutations by a 5-way
# all-distinct self-join.  Completes the social-choice family
# (borda, schulze beatpath, IRV) with the exact MLE-of-Condorcet
# order.  Ties in the pair counts and between orders break
# deterministically (lexicographic permutation string).


def q_kemeny_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type"
    )
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = cnt.select(
        "user_id", F.col("event_type").alias("i"), F.col("c").alias("ci")
    )
    b = cnt.select(
        "user_id", F.col("event_type").alias("j"), F.col("c").alias("cj")
    )
    prefs = (
        a.join(b, "user_id")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("ci") > F.col("cj")).cast("long")).alias("w")
        )
    )
    rows = prefs.collect()  # bounded: k(k-1) <= 20 cells
    types = sorted({r.i for r in rows} | {r.j for r in rows})
    w = {(r.i, r.j): int(r.w) for r in rows}
    from itertools import permutations
    from math import factorial

    best = None
    for perm in permutations(types):
        cost = 0
        for x in range(len(perm)):
            for y in range(x + 1, len(perm)):
                cost += w.get((perm[y], perm[x]), 0)
        key = (cost, ">".join(perm))
        if best is None or key < best:
            best = key
    # ADVICE r4: n_orders derived from the observed type set (matches the
    # SQL twin's COUNT over its generated permutations) instead of a
    # hardcoded 120 — the engines now agree on degenerate type counts too.
    return spark.createDataFrame(
        [(best[1], int(best[0]), factorial(len(types)))],
        "ranking string, kemeny_cost long, n_orders long",
    )


SQL_KEMENY = """
WITH cnt AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY 1, 2
), prefs AS (
  SELECT a.event_type AS i, b.event_type AS j,
         CAST(sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END)
              AS BIGINT) AS w
  FROM cnt a JOIN cnt b
    ON b.user_id = a.user_id AND a.event_type <> b.event_type
  GROUP BY 1, 2
), t AS (
  SELECT DISTINCT i AS t FROM prefs
), perms AS (
  SELECT t1.t AS p1, t2.t AS p2, t3.t AS p3, t4.t AS p4, t5.t AS p5
  FROM t t1, t t2, t t3, t t4, t t5
  WHERE t2.t <> t1.t AND t3.t NOT IN (t1.t, t2.t)
    AND t4.t NOT IN (t1.t, t2.t, t3.t)
    AND t5.t NOT IN (t1.t, t2.t, t3.t, t4.t)
), scored AS (
  SELECT p1 || '>' || p2 || '>' || p3 || '>' || p4 || '>' || p5
           AS ranking,
         COALESCE((SELECT w FROM prefs WHERE i = p2 AND j = p1), 0)
         + COALESCE((SELECT w FROM prefs WHERE i = p3 AND j = p1), 0)
         + COALESCE((SELECT w FROM prefs WHERE i = p4 AND j = p1), 0)
         + COALESCE((SELECT w FROM prefs WHERE i = p5 AND j = p1), 0)
         + COALESCE((SELECT w FROM prefs WHERE i = p3 AND j = p2), 0)
         + COALESCE((SELECT w FROM prefs WHERE i = p4 AND j = p2), 0)
         + COALESCE((SELECT w FROM prefs WHERE i = p5 AND j = p2), 0)
         + COALESCE((SELECT w FROM prefs WHERE i = p4 AND j = p3), 0)
         + COALESCE((SELECT w FROM prefs WHERE i = p5 AND j = p3), 0)
         + COALESCE((SELECT w FROM prefs WHERE i = p5 AND j = p4), 0)
           AS kemeny_cost
  FROM perms
)
SELECT ranking, CAST(kemeny_cost AS BIGINT) AS kemeny_cost,
       CAST((SELECT count(*) FROM perms) AS BIGINT) AS n_orders
FROM scored
ORDER BY kemeny_cost, ranking
LIMIT 1
"""

QUERIES["kemeny_ranking"] = q_kemeny_ranking
ORACLE_SQL["kemeny_ranking"] = SQL_KEMENY


# ---------------------------------------------------------------------------
# geometric_median_weiszfeld — 5 unrolled Weiszfeld iterations for the
# per-label geometric median (L1-of-L2 center) of the first two
# embedding dimensions — the robust-center complement to the k-means
# family (centroid_purity, semantic_dedup cells).
# ---------------------------------------------------------------------------
# Discipline: coordinates are e9-floored integers (float32 inputs are
# exactly representable in double, so both engines floor the same
# value); every iteration floors its per-row weights (1e12/d) and
# weighted coordinates before the exact integer sums, so the carried
# medians are bit-identical doubles; near-zero distances (d < 1e-9)
# are excluded in both engines (the Weiszfeld singularity guard).

_WEIS_ITERS = 5


def q_geometric_median_weiszfeld(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "label",
        F.floor(
            F.element_at("embedding", 1).cast("double") * 1e9 + F.lit(_OFF)
        ).cast("long").alias("x9"),
        F.floor(
            F.element_at("embedding", 2).cast("double") * 1e9 + F.lit(_OFF)
        ).cast("long").alias("y9"),
    )
    emb = emb.persist()
    cent = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
    ).collect()
    med = {
        int(r.label): (
            float(r.sx) / (float(r.n) * 1e9),
            float(r.sy) / (float(r.n) * 1e9),
        )
        for r in cent
    }
    labels = sorted(med)
    for _ in range(_WEIS_ITERS):
        mdf = spark.createDataFrame(
            [(lb, med[lb][0], med[lb][1]) for lb in labels],
            "label int, mx double, my double",
        )
        j = emb.join(F.broadcast(mdf), "label")
        dx = F.col("x9").cast("double") / 1e9 - F.col("mx")
        dy = F.col("y9").cast("double") / 1e9 - F.col("my")
        d = F.sqrt(dx * dx + dy * dy)
        g = j.filter(d >= 1e-9)
        w12 = F.floor(1e12 / d + F.lit(_OFF)).cast("long")
        nx12 = F.floor(
            F.col("x9").cast("double") / 1e9 / d * 1e12 + F.lit(_OFF)
        ).cast("long")
        ny12 = F.floor(
            F.col("y9").cast("double") / 1e9 / d * 1e12 + F.lit(_OFF)
        ).cast("long")
        agg = g.groupBy("label").agg(
            F.sum(w12).alias("sw"),
            F.sum(nx12).alias("sx"),
            F.sum(ny12).alias("sy"),
        ).collect()
        med = {
            int(r.label): (
                float(r.sx) / float(r.sw),
                float(r.sy) / float(r.sw),
            )
            for r in agg
        }
    mdf = spark.createDataFrame(
        [(lb, med[lb][0], med[lb][1]) for lb in labels],
        "label int, mx double, my double",
    )
    j = emb.join(F.broadcast(mdf), "label")
    dx = F.col("x9").cast("double") / 1e9 - F.col("mx")
    dy = F.col("y9").cast("double") / 1e9 - F.col("my")
    d9 = F.floor(
        F.sqrt(dx * dx + dy * dy) * 1e9 + F.lit(_OFF)
    ).cast("long")
    out = j.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("mx").alias("mx"),
        F.max("my").alias("my"),
        F.sum(d9).alias("sd9"),
    )
    res = out.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("mx") * 1e6 + F.lit(_OFF)).cast("long").alias(
            "mx_e6"
        ),
        F.floor(F.col("my") * 1e6 + F.lit(_OFF)).cast("long").alias(
            "my_e6"
        ),
        F.floor(
            F.col("sd9").cast("double")
            / (F.col("n").cast("double") * 1e9)
            * 1e6
            + F.lit(_OFF)
        ).cast("long").alias("mean_dist_e6"),
    ).orderBy("label")
    emb.unpersist()
    return res


def _weiszfeld_sql() -> str:
    head = f"""
WITH pts AS (
  SELECT label,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e9 + {_OFF})
              AS BIGINT) AS x9,
         CAST(floor(CAST(embedding[2] AS DOUBLE) * 1e9 + {_OFF})
              AS BIGINT) AS y9
  FROM embeddings
), m0 AS (
  SELECT label,
         CAST(sum(x9) AS DOUBLE) / (count(*) * 1e9) AS mx,
         CAST(sum(y9) AS DOUBLE) / (count(*) * 1e9) AS my
  FROM pts GROUP BY 1
)"""
    prev = "m0"
    steps = []
    for k in range(1, _WEIS_ITERS + 1):
        steps.append(f""", w{k} AS (
  SELECT p.label,
         CAST(sum(CAST(floor(1e12 / sqrt(
           (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
             * (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
           + (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)
             * (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)) + {_OFF})
           AS BIGINT)) AS BIGINT) AS sw,
         CAST(sum(CAST(floor(CAST(p.x9 AS DOUBLE) / 1e9 / sqrt(
           (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
             * (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
           + (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)
             * (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)) * 1e12 + {_OFF})
           AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(floor(CAST(p.y9 AS DOUBLE) / 1e9 / sqrt(
           (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
             * (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
           + (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)
             * (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)) * 1e12 + {_OFF})
           AS BIGINT)) AS BIGINT) AS sy
  FROM pts p JOIN {prev} m ON m.label = p.label
  WHERE sqrt(
           (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
             * (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
           + (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)
             * (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)) >= 1e-9
  GROUP BY 1
), m{k} AS (
  SELECT label,
         CAST(sx AS DOUBLE) / sw AS mx,
         CAST(sy AS DOUBLE) / sw AS my
  FROM w{k}
)""")
        prev = f"m{k}"
    tail = f"""
SELECT CAST(p.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(floor(max(m.mx) * 1e6 + {_OFF}) AS BIGINT) AS mx_e6,
       CAST(floor(max(m.my) * 1e6 + {_OFF}) AS BIGINT) AS my_e6,
       CAST(floor(CAST(sum(CAST(floor(sqrt(
           (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
             * (CAST(p.x9 AS DOUBLE) / 1e9 - m.mx)
           + (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)
             * (CAST(p.y9 AS DOUBLE) / 1e9 - m.my)) * 1e9 + {_OFF})
           AS BIGINT)) AS DOUBLE)
                  / (count(*) * 1e9) * 1e6 + {_OFF}) AS BIGINT)
         AS mean_dist_e6
FROM pts p JOIN {prev} m ON m.label = p.label
GROUP BY 1
ORDER BY label
"""
    return head + "".join(steps) + tail


QUERIES["geometric_median_weiszfeld"] = q_geometric_median_weiszfeld
ORACLE_SQL["geometric_median_weiszfeld"] = _weiszfeld_sql()


# ===========================================================================
# Battery X — causal-inference companions
# ===========================================================================
# psm_att_nn: propensity-style nearest-neighbor matching ATT (with
# replacement): treated users (user_id%2==1) match the activity-score-
# nearest control via ONE sorted union window (last/first_value IGNORE
# NULLS over the (score, side, id) order — the asof discipline without
# a pair join); |gap| ties choose the backward (lower-or-equal-score)
# match, both engines spelling the same order.  Complements
# stratified_ate (coarsened strata) and diff_in_diff.


def q_psm_att_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "cv"
        ),
    )
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("s"),
        F.sum("cv").alias("y"),
    ).withColumn("treated", (F.col("user_id") % 2 == 1).cast("long"))
    # NO partition-less window: range-exchange on the match order, do
    # the IGNORE NULLS scan within each physical partition, then repair
    # partition-boundary rows from the bounded per-partition control
    # extremes (the global_row_number offsets device) — result is
    # independent of where the range boundaries fall.
    parts = int(
        per.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = per.repartitionByRange(
        parts, "s", "treated", "user_id"
    ).withColumn("_pid", F.spark_partition_id())
    wp = Window.partitionBy("_pid").orderBy("s", "treated", "user_id")
    ctl = F.when(
        F.col("treated") == 0,
        F.struct(F.col("s").alias("cs"), F.col("y").alias("cy")),
    )
    loc = ranged.withColumn(
        "back",
        F.last(ctl, ignorenulls=True).over(
            wp.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "fwd",
        F.first(ctl, ignorenulls=True).over(
            wp.rowsBetween(0, Window.unboundedFollowing)
        ),
    )
    ext = (
        ranged.filter(F.col("treated") == 0)
        .groupBy("_pid")
        .agg(
            F.max(F.struct("s", "user_id", "y")).alias("mx"),
            F.min(F.struct("s", "user_id", "y")).alias("mn"),
        )
        .collect()
    )  # bounded: <= shuffle-partition count rows
    lastc = {int(r._pid): (int(r.mx.s), int(r.mx.y)) for r in ext}
    firstc = {int(r._pid): (int(r.mn.s), int(r.mn.y)) for r in ext}
    fill = []
    for pid in range(parts):
        prev = None
        for q in range(pid - 1, -1, -1):
            if q in lastc:
                prev = lastc[q]
                break
        nxt = None
        for q in range(pid + 1, parts):
            if q in firstc:
                nxt = firstc[q]
                break
        fill.append(
            (
                pid,
                prev[0] if prev else None,
                prev[1] if prev else None,
                nxt[0] if nxt else None,
                nxt[1] if nxt else None,
            )
        )
    fdf = per.sparkSession.createDataFrame(
        fill, "_pid int, pbs long, pby long, nfs long, nfy long"
    )
    j2 = loc.join(F.broadcast(fdf), "_pid")
    back_fix = F.when(F.col("back").isNotNull(), F.col("back")).when(
        F.col("pbs").isNotNull(),
        F.struct(F.col("pbs").alias("cs"), F.col("pby").alias("cy")),
    )
    fwd_fix = F.when(F.col("fwd").isNotNull(), F.col("fwd")).when(
        F.col("nfs").isNotNull(),
        F.struct(F.col("nfs").alias("cs"), F.col("nfy").alias("cy")),
    )
    m = (
        j2.withColumn("back", back_fix)
        .withColumn("fwd", fwd_fix)
        .filter(F.col("treated") == 1)
    )
    gb = F.abs(F.col("back.cs") - F.col("s"))
    gf = F.abs(F.col("fwd.cs") - F.col("s"))
    ymatch = F.when(
        F.col("back").isNull(), F.col("fwd.cy")
    ).when(
        F.col("fwd").isNull(), F.col("back.cy")
    ).when(gb <= gf, F.col("back.cy")).otherwise(F.col("fwd.cy"))
    d = m.select(
        (F.col("y") - ymatch).alias("dy"),
        F.lit(1).alias("one"),
    )
    agg = d.agg(
        F.count(F.lit(1)).alias("n_treated"),
        F.sum("dy").alias("sdy"),
    )
    return agg.select(
        F.col("n_treated").cast("long").alias("n_treated"),
        F.col("sdy").cast("long").alias("sum_diff_c"),
        F.floor(
            F.col("sdy").cast("double")
            / (F.col("n_treated").cast("double") * 100.0)
            * 1e4
            + F.lit(_OFF)
        ).cast("long").alias("att_e4"),
    )


SQL_PSM = f"""
WITH per AS (
  SELECT user_id, count(*) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS y,
         CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treated
  FROM events GROUP BY 1
), m AS (
  SELECT *,
         last_value(CASE WHEN treated = 0 THEN s END IGNORE NULLS)
           OVER wb AS back_s,
         last_value(CASE WHEN treated = 0 THEN y END IGNORE NULLS)
           OVER wb AS back_y,
         first_value(CASE WHEN treated = 0 THEN s END IGNORE NULLS)
           OVER wf AS fwd_s,
         first_value(CASE WHEN treated = 0 THEN y END IGNORE NULLS)
           OVER wf AS fwd_y
  FROM per
  WINDOW wb AS (ORDER BY s, treated, user_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (ORDER BY s, treated, user_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), t AS (
  SELECT y,
         CASE WHEN back_s IS NULL THEN fwd_y
              WHEN fwd_s IS NULL THEN back_y
              WHEN abs(back_s - s) <= abs(fwd_s - s) THEN back_y
              ELSE fwd_y END AS ym
  FROM m WHERE treated = 1
)
SELECT CAST(count(*) AS BIGINT) AS n_treated,
       CAST(sum(y - ym) AS BIGINT) AS sum_diff_c,
       CAST(floor(CAST(sum(y - ym) AS DOUBLE)
                  / (count(*) * 100.0) * 1e4 + {_OFF}) AS BIGINT)
         AS att_e4
FROM t
"""

QUERIES["psm_att_nn"] = q_psm_att_nn
ORACLE_SQL["psm_att_nn"] = SQL_PSM


# ---------------------------------------------------------------------------
# sobel_mediation — Baron-Kenny product-of-coefficients mediation with
# the Sobel z: x = activity count -> m = distinct active days -> y =
# total spend; a from m~x, b from y~m+x (closed-form bivariate OLS on
# exact n-scaled co-moments), z = ab / sqrt(b^2 sa^2 + a^2 sb^2).
# ---------------------------------------------------------------------------


def q_sobel_mediation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        ).cast("long").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "cv"
        ),
    )
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"),
        F.count_distinct("day").alias("m"),
        F.sum("cv").alias("y"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("m").alias("sm"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("m")).alias("sxm"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.col("m") * F.col("y")).alias("smy"),
        F.sum(F.col("y").cast("double") * F.col("y").cast("double")).alias(
            "syy"
        ),
    )
    nd = F.col("n").cast("double")
    cxx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    cxm = (F.col("n") * F.col("sxm") - F.col("sx") * F.col("sm")).cast(
        "double"
    )
    cxy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    cmm = (F.col("n") * F.col("smm") - F.col("sm") * F.col("sm")).cast(
        "double"
    )
    cmy = (F.col("n") * F.col("smy") - F.col("sm") * F.col("sy")).cast(
        "double"
    )
    cyy = nd * F.col("syy") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    a = cxm / cxx
    det = cxx * cmm - cxm * cxm
    b = (cxx * cmy - cxm * cxy) / det
    cdir = (cmm * cxy - cxm * cmy) / det
    # residual variances (n-scaled cancels): sigma1^2 ~ m|x,
    # sigma2^2 ~ y|m,x ; SEs in the same scale-free ratio form
    s1 = (cmm - a * cxm) / (nd * (nd - 2.0))
    s2 = (cyy - b * cmy - cdir * cxy) / (nd * (nd - 3.0))
    sa2 = s1 * nd / cxx * nd
    sb2 = s2 * nd * cxx / det * nd
    z = (a * b) / F.sqrt(b * b * sa2 + a * a * sb2)
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.floor(a * 1e6 + F.lit(_OFF)).cast("long").alias("a_e6"),
        F.floor(b * 1e6 + F.lit(_OFF)).cast("long").alias("b_e6"),
        F.floor(cdir * 1e6 + F.lit(_OFF)).cast("long").alias(
            "direct_e6"
        ),
        F.floor(a * b * 1e6 + F.lit(_OFF)).cast("long").alias(
            "indirect_e6"
        ),
        F.floor(z * 1e4 + F.lit(_OFF)).cast("long").alias(
            "sobel_z_e4"
        ),
    )


SQL_SOBEL = f"""
WITH per AS (
  SELECT user_id, count(*) AS x,
         count(DISTINCT CAST(epoch_us(ts) AS BIGINT) // 86400000000)
           AS m,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS y
  FROM events GROUP BY 1
), agg AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(m) AS BIGINT) AS sm,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * m) AS BIGINT) AS sxm,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(m * m) AS BIGINT) AS smm,
         CAST(sum(m * y) AS BIGINT) AS smy,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS syy
  FROM per
), c AS (
  SELECT n,
         CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
         CAST(n * sxm - sx * sm AS DOUBLE) AS cxm,
         CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
         CAST(n * smm - sm * sm AS DOUBLE) AS cmm,
         CAST(n * smy - sm * sy AS DOUBLE) AS cmy,
         n * syy - CAST(sx AS DOUBLE) * 0 - CAST(sy AS DOUBLE) * sy
           AS cyy
  FROM agg
), f AS (
  SELECT n, cxx, cxm, cxy, cmm, cmy, cyy,
         cxm / cxx AS a,
         (cxx * cmy - cxm * cxy) / (cxx * cmm - cxm * cxm) AS b,
         (cmm * cxy - cxm * cmy) / (cxx * cmm - cxm * cxm) AS cdir
  FROM c
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(floor(a * 1e6 + {_OFF}) AS BIGINT) AS a_e6,
       CAST(floor(b * 1e6 + {_OFF}) AS BIGINT) AS b_e6,
       CAST(floor(cdir * 1e6 + {_OFF}) AS BIGINT) AS direct_e6,
       CAST(floor(a * b * 1e6 + {_OFF}) AS BIGINT) AS indirect_e6,
       CAST(floor((a * b) / sqrt(
         b * b * ((cmm - a * cxm) / (CAST(n AS DOUBLE) * (n - 2.0))
                  * n / cxx * n)
         + a * a * ((cyy - b * cmy - cdir * cxy)
                    / (CAST(n AS DOUBLE) * (n - 3.0))
                    * n * cxx / (cxx * cmm - cxm * cxm) * n))
         * 1e4 + {_OFF}) AS BIGINT) AS sobel_z_e4
FROM f
"""

QUERIES["sobel_mediation"] = q_sobel_mediation
ORACLE_SQL["sobel_mediation"] = SQL_SOBEL


# ===========================================================================
# Battery Y — bibliometric laws over user productivity
# ===========================================================================
# lotka_law_fit: Lotka's inverse-power law of productivity — the
# frequency-of-frequencies n_k (#users with exactly k events of a
# type) should follow n_k ~ C k^-b with b ~ 2.  Log-log OLS on the
# collapsed (k, n_k) domain with the zipf_slope e9-floor discipline.


def q_lotka_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    pk = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("k")
    )
    fof = pk.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).alias("nk")
    )
    # e6 scale: e9-squared products overflow int64 in the moment sums
    lx9 = F.floor(
        F.log(F.col("k").cast("double")) * 1e6 + F.lit(_OFF)
    ).cast("long")
    ly9 = F.floor(
        F.log(F.col("nk").cast("double")) * 1e6 + F.lit(_OFF)
    ).cast("long")
    t = fof.select("event_type", lx9.alias("x"), ly9.alias("y"))
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    md = F.col("m").cast("double")
    cxy = md * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    cxx = md * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    cyy = md * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    slope = cxy / cxx
    r2 = cxy * cxy / (cxx * cyy)
    return agg.select(
        "event_type",
        F.col("m").cast("long").alias("n_levels"),
        F.floor(-slope * 1e6 + F.lit(_OFF)).cast("long").alias(
            "lotka_b_e6"
        ),
        F.floor(r2 * 1e6 + F.lit(_OFF)).cast("long").alias("r2_e6"),
    ).orderBy("event_type")


SQL_LOTKA = f"""
WITH pk AS (
  SELECT event_type, user_id, count(*) AS k
  FROM events GROUP BY 1, 2
), fof AS (
  SELECT event_type, k, CAST(count(*) AS BIGINT) AS nk
  FROM pk GROUP BY 1, 2
), t AS (
  SELECT event_type,
         CAST(floor(ln(CAST(k AS DOUBLE)) * 1e6 + {_OFF})
              AS BIGINT) AS x,
         CAST(floor(ln(CAST(nk AS DOUBLE)) * 1e6 + {_OFF})
              AS BIGINT) AS y
  FROM fof
), agg AS (
  SELECT event_type, count(*) AS m,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM t GROUP BY 1
)
SELECT event_type,
       CAST(m AS BIGINT) AS n_levels,
       CAST(floor(-(CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * 1e6 + {_OFF}) AS BIGINT) AS lotka_b_e6,
       CAST(floor((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  * (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / ((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * (CAST(m AS DOUBLE) * syy
                        - CAST(sy AS DOUBLE) * sy)) * 1e6 + {_OFF})
            AS BIGINT) AS r2_e6
FROM agg
ORDER BY event_type
"""

QUERIES["lotka_law_fit"] = q_lotka_law_fit
ORACLE_SQL["lotka_law_fit"] = SQL_LOTKA


# ---------------------------------------------------------------------------
# prices_law_audit — Price's square-root law: do the top ceil(sqrt(U))
# users of each type account for half its events?  Exact rank cut via
# the distributed-safe per-type count window; reports the observed
# top-sqrt share and the half-output head count h (smallest head
# reaching 50%).
# ---------------------------------------------------------------------------


def q_prices_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    pk = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("k")
    )
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy(
        F.col("k").desc(), F.col("user_id").asc()
    )
    r = (
        pk.withColumn("u", F.count(F.lit(1)).over(wt))
        .withColumn("tot", F.sum("k").over(wt))
        .withColumn("rn", F.row_number().over(wo))
        .withColumn(
            "cum",
            F.sum("k").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    sq = F.ceil(F.sqrt(F.col("u").cast("double"))).cast("long")
    agg = r.groupBy("event_type").agg(
        F.max("u").alias("u"),
        F.max("tot").alias("tot"),
        F.max(F.when(F.col("rn") == sq, F.col("cum"))).alias("cum_sq"),
        F.min(
            F.when(2 * F.col("cum") >= F.col("tot"), F.col("rn"))
        ).alias("half_head"),
    )
    sq2 = F.ceil(F.sqrt(F.col("u").cast("double"))).cast("long")
    return agg.select(
        "event_type",
        F.col("u").cast("long").alias("n_users"),
        sq2.alias("sqrt_head"),
        F.floor(
            F.col("cum_sq").cast("double") / F.col("tot").cast("double")
            * 1e6
            + F.lit(_OFF)
        ).cast("long").alias("sqrt_head_share_e6"),
        F.col("half_head").cast("long").alias("half_output_head"),
    ).orderBy("event_type")


SQL_PRICES = f"""
WITH pk AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, k,
         count(*) OVER (PARTITION BY event_type) AS u,
         CAST(sum(k) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
         row_number() OVER wo AS rn,
         CAST(sum(k) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum
  FROM pk
  WINDOW wo AS (PARTITION BY event_type ORDER BY k DESC, user_id ASC)
)
SELECT event_type,
       CAST(max(u) AS BIGINT) AS n_users,
       CAST(ceil(sqrt(CAST(max(u) AS DOUBLE))) AS BIGINT) AS sqrt_head,
       CAST(floor(CAST(max(CASE WHEN rn = CAST(ceil(sqrt(
                    CAST(u AS DOUBLE))) AS BIGINT)
                    THEN cum END) AS DOUBLE)
                  / max(tot) * 1e6 + {_OFF}) AS BIGINT)
         AS sqrt_head_share_e6,
       CAST(min(CASE WHEN 2 * cum >= tot THEN rn END) AS BIGINT)
         AS half_output_head
FROM r
GROUP BY 1
ORDER BY event_type
"""

QUERIES["prices_law_audit"] = q_prices_law_audit
ORACLE_SQL["prices_law_audit"] = SQL_PRICES


# ===========================================================================
# Battery Z — sketch-tier completions (rows-only, pytest-pinned in
# tests/test_sketches2.py)
# ===========================================================================


def q_kll_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile-sketch rank-error audit per type (deterministic-
    offset compactors, k=64): worst relative rank error at the
    5/25/50/75/95% exact order statistics — the mergeable-quantile
    companion to tdigest_quantiles."""
    from diive_spark.operators.sketches2 import kll_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("value").alias("v")
    )
    out = kll_frame(ev, "event_type", "v", k=64)
    return out.select(
        "event_type",
        "n",
        "sketch_items",
        F.round("max_rank_err", 4).alias("max_rank_err"),
        F.round("p50_est", 1).alias("p50_est"),
        F.round("p50_exact", 1).alias("p50_exact"),
    ).orderBy("event_type")


QUERIES["kll_sketch_audit"] = q_kll_sketch_audit


def q_frequent_directions_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frequent-Directions covariance sketch (l=16) of each label's
    embedding rows, audited against the Liberty spectral bound
    2||A||_F^2/l — the matrix-sketch sibling of Misra-Gries heavy
    hitters, and the streaming path to centroid_gram-style
    covariance summaries."""
    from diive_spark.operators.sketches2 import fd_frame

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("label").cast("string").alias("label"), "embedding"
    )
    out = fd_frame(emb, "label", "embedding", ell=16)
    return out.select(
        F.col("label").cast("long").alias("label"),
        "n",
        "d",
        "ell",
        F.round("spec_err", 4).alias("spec_err"),
        F.round("bound", 4).alias("bound"),
        "within_bound",
    ).orderBy("label")


QUERIES["frequent_directions_audit"] = q_frequent_directions_audit


# ===========================================================================
# Battery AB — data-profiling layer: the dependency-discovery audits
# a warehouse runs before trusting joins (Metanome/Kivinen-Mannila
# family).
# ===========================================================================
# fd_violation_audit: approximate functional dependencies under the
# g3 measure — g3(X -> Y) = 1 - sum_x max_y count(x, y) / n, the
# minimum fraction of rows to delete for the FD to hold exactly.
# Four fixed candidates over documents/events; exact integers
# throughout.


def q_fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def g3(df, lhs, rhs, name):
        c = df.select(
            F.col(lhs).cast("string").alias("x"),
            F.col(rhs).cast("string").alias("y"),
        ).groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
        per = c.groupBy("x").agg(
            F.sum("c").alias("nx"), F.max("c").alias("mx")
        )
        return per.agg(
            F.lit(name).alias("fd"),
            F.sum("nx").cast("long").alias("n"),
            (F.sum("nx") - F.sum("mx")).cast("long").alias(
                "n_violations"
            ),
            F.floor(
                (F.sum("nx") - F.sum("mx")).cast("double")
                / F.sum("nx").cast("double")
                * 1e6
                + F.lit(_OFF)
            ).cast("long").alias("g3_e6"),
        )

    hi = ev.withColumn("hv", (F.col("value") > 50.0).cast("long"))
    out = (
        g3(doc, "source", "lang", "doc.source->lang")
        .unionAll(g3(doc, "lang", "source", "doc.lang->source"))
        .unionAll(g3(ev, "user_id", "event_type", "ev.user->type"))
        .unionAll(g3(hi, "user_id", "hv", "ev.user->highvalue"))
    )
    return out.orderBy("fd")


SQL_FDG3 = f"""
WITH cand AS (
  SELECT 'doc.source->lang' AS fd, CAST(source AS VARCHAR) AS x,
         CAST(lang AS VARCHAR) AS y FROM documents
  UNION ALL
  SELECT 'doc.lang->source', CAST(lang AS VARCHAR),
         CAST(source AS VARCHAR) FROM documents
  UNION ALL
  SELECT 'ev.user->type', CAST(user_id AS VARCHAR),
         CAST(event_type AS VARCHAR) FROM events
  UNION ALL
  SELECT 'ev.user->highvalue', CAST(user_id AS VARCHAR),
         CAST(CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS VARCHAR)
  FROM events
), c AS (
  SELECT fd, x, y, CAST(count(*) AS BIGINT) AS c
  FROM cand GROUP BY 1, 2, 3
), per AS (
  SELECT fd, x, CAST(sum(c) AS BIGINT) AS nx,
         CAST(max(c) AS BIGINT) AS mx
  FROM c GROUP BY 1, 2
)
SELECT fd,
       CAST(sum(nx) AS BIGINT) AS n,
       CAST(sum(nx) - sum(mx) AS BIGINT) AS n_violations,
       CAST(floor(CAST(sum(nx) - sum(mx) AS DOUBLE) / sum(nx) * 1e6
                  + {_OFF}) AS BIGINT) AS g3_e6
FROM per
GROUP BY 1
ORDER BY fd
"""

QUERIES["fd_violation_audit"] = q_fd_violation_audit
ORACLE_SQL["fd_violation_audit"] = SQL_FDG3


# ---------------------------------------------------------------------------
# ind_coverage_audit — inclusion-dependency (referential-integrity)
# coverage for four candidate FK ⊆ PK pairs over the TPC-H tables +
# the events stream: distinct-value and row-level coverage.
# ---------------------------------------------------------------------------


def q_ind_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def ind(fk_df, fk, pk_df, pk, name):
        f = fk_df.select(F.col(fk).cast("long").alias("k"))
        p = pk_df.select(F.col(pk).cast("long").alias("k")).distinct()
        rows = f.join(p.withColumn("hit", F.lit(1)), "k", "left")
        ragg = rows.agg(
            F.lit(name).alias("ind"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("rows_covered"),
        )
        d = f.distinct().join(p.withColumn("hit", F.lit(1)), "k", "left")
        dagg = d.agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("distinct_covered"),
        )
        return ragg.crossJoin(dagg)

    out = (
        ind(li, "l_orderkey", od, "o_orderkey", "lineitem->orders")
        .unionAll(ind(od, "o_custkey", cu, "c_custkey", "orders->customer"))
        .unionAll(ind(li, "l_partkey", pt, "p_partkey", "lineitem->part"))
        .unionAll(ind(ev, "user_id", cu, "c_custkey", "events->customer"))
    )
    return out.select(
        "ind",
        "n_rows",
        "rows_covered",
        "n_distinct",
        "distinct_covered",
        F.floor(
            F.col("distinct_covered").cast("double")
            / F.col("n_distinct").cast("double")
            * 1e6
            + F.lit(_OFF)
        ).cast("long").alias("coverage_e6"),
    ).orderBy("ind")


SQL_IND = f"""
WITH cand AS (
  SELECT 'lineitem->orders' AS ind, CAST(l_orderkey AS BIGINT) AS k,
         'orders' AS pk FROM lineitem
  UNION ALL
  SELECT 'orders->customer', CAST(o_custkey AS BIGINT), 'customer'
  FROM orders
  UNION ALL
  SELECT 'lineitem->part', CAST(l_partkey AS BIGINT), 'part'
  FROM lineitem
  UNION ALL
  SELECT 'events->customer', CAST(user_id AS BIGINT), 'customer'
  FROM events
), pks AS (
  SELECT 'orders' AS pk, CAST(o_orderkey AS BIGINT) AS k FROM orders
  UNION SELECT 'customer', CAST(c_custkey AS BIGINT) FROM customer
  UNION SELECT 'part', CAST(p_partkey AS BIGINT) FROM part
), rows_ AS (
  SELECT c.ind, count(*) AS n_rows,
         CAST(sum(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS rows_covered
  FROM cand c LEFT JOIN pks p ON p.pk = c.pk AND p.k = c.k
  GROUP BY 1
), dst AS (
  SELECT ind, count(*) AS n_distinct,
         CAST(sum(hit) AS BIGINT) AS distinct_covered
  FROM (
    SELECT DISTINCT c.ind, c.k,
           CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END AS hit
    FROM cand c LEFT JOIN pks p ON p.pk = c.pk AND p.k = c.k
  ) GROUP BY 1
)
SELECT r.ind AS ind,
       CAST(r.n_rows AS BIGINT) AS n_rows,
       r.rows_covered,
       CAST(d.n_distinct AS BIGINT) AS n_distinct,
       d.distinct_covered,
       CAST(floor(CAST(d.distinct_covered AS DOUBLE) / d.n_distinct
                  * 1e6 + {_OFF}) AS BIGINT) AS coverage_e6
FROM rows_ r JOIN dst d ON d.ind = r.ind
ORDER BY ind
"""

QUERIES["ind_coverage_audit"] = q_ind_coverage_audit
ORACLE_SQL["ind_coverage_audit"] = SQL_IND


# ---------------------------------------------------------------------------
# ucc_key_audit — unique-column-combination (key-candidate) discovery
# audit: uniqueness ratio of five candidate keys across events and
# documents (completes the profiling trio with fd_violation_audit and
# ind_coverage_audit)
# ---------------------------------------------------------------------------


def q_ucc_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def ucc(df, cols, name):
        # ADVICE r4: concat_ws SKIPS null components while the DuckDB twin's
        # `||` nulls the whole key — make NULL semantics identical in both
        # engines by coalescing every component to an explicit sentinel.
        d = df.select(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
                    for c in cols
                ],
            ).alias("k")
        )
        return d.agg(
            F.lit(name).alias("candidate"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct("k").cast("long").alias("n_distinct"),
        )

    out = (
        ucc(ev, ["event_id"], "ev(event_id)")
        .unionAll(ucc(ev, ["user_id", "ts"], "ev(user_id,ts)"))
        .unionAll(
            ucc(
                ev,
                ["user_id", "event_type", "ts"],
                "ev(user_id,type,ts)",
            )
        )
        .unionAll(ucc(doc, ["doc_id"], "doc(doc_id)"))
        .unionAll(
            ucc(doc, ["lang", "source", "n_chars"], "doc(lang,src,len)")
        )
    )
    return out.select(
        "candidate",
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).cast("long").alias(
            "dup_rows"
        ),
        F.floor(
            F.col("n_distinct").cast("double")
            / F.col("n_rows").cast("double")
            * 1e6
            + F.lit(_OFF)
        ).cast("long").alias("uniqueness_e6"),
    ).orderBy("candidate")


SQL_UCC = f"""
WITH cand AS (
  -- ADVICE r4: every component COALESCEd to '<null>' so NULL semantics
  -- match Spark's sentinel-coalesced concat_ws exactly.
  SELECT 'ev(event_id)' AS candidate,
         COALESCE(CAST(event_id AS VARCHAR), '<null>') AS k FROM events
  UNION ALL
  SELECT 'ev(user_id,ts)',
         COALESCE(CAST(user_id AS VARCHAR), '<null>') || chr(31)
           || COALESCE(CAST(ts AS VARCHAR), '<null>')
  FROM events
  UNION ALL
  SELECT 'ev(user_id,type,ts)',
         COALESCE(CAST(user_id AS VARCHAR), '<null>') || chr(31)
           || COALESCE(event_type, '<null>')
           || chr(31) || COALESCE(CAST(ts AS VARCHAR), '<null>')
  FROM events
  UNION ALL
  SELECT 'doc(doc_id)',
         COALESCE(CAST(doc_id AS VARCHAR), '<null>') FROM documents
  UNION ALL
  SELECT 'doc(lang,src,len)',
         COALESCE(lang, '<null>') || chr(31)
           || COALESCE(source, '<null>') || chr(31)
           || COALESCE(CAST(n_chars AS VARCHAR), '<null>')
  FROM documents
)
SELECT candidate,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct,
       CAST(count(*) - count(DISTINCT k) AS BIGINT) AS dup_rows,
       CAST(floor(CAST(count(DISTINCT k) AS DOUBLE) / count(*) * 1e6
                  + {_OFF}) AS BIGINT) AS uniqueness_e6
FROM cand
GROUP BY 1
ORDER BY candidate
"""

QUERIES["ucc_key_audit"] = q_ucc_key_audit
ORACLE_SQL["ucc_key_audit"] = SQL_UCC


# ---------------------------------------------------------------------------
# session_timeout_sweep — the timeout-tuning audit behind every
# sessionization choice: for T in {5, 15, 30, 60} minutes, session
# counts, events/session, and mean intra-session duration — all from
# ONE per-user lag pass (sessions(T) = n_users + #gaps > T; total
# session time(T) = sum of gaps <= T), so the whole sweep is four
# conditional sums over the same gap stream.
# ---------------------------------------------------------------------------

_SWEEP_TS = (300, 900, 1800, 3600)


def q_session_timeout_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    wu = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = ev.withColumn(
        "gs", ((F.col("us") - F.lag("us").over(wu)) / 1_000_000).cast("long")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    ]
    for t in _SWEEP_TS:
        aggs.append(
            F.sum(
                (F.col("gs").isNotNull() & (F.col("gs") > t)).cast("long")
            ).alias(f"brk{t}")
        )
        aggs.append(
            F.sum(
                F.when(
                    F.col("gs").isNotNull() & (F.col("gs") <= t),
                    F.col("gs"),
                ).otherwise(0)
            ).alias(f"dur{t}")
        )
    a = g.agg(*aggs)
    rows = []
    for t in _SWEEP_TS:
        ses = F.col("n_users") + F.col(f"brk{t}")
        rows.append(
            a.select(
                F.lit(t).cast("long").alias("timeout_s"),
                ses.cast("long").alias("n_sessions"),
                F.floor(
                    F.col("n_events").cast("double") / ses.cast("double")
                    * 1e4
                    + F.lit(_OFF)
                ).cast("long").alias("events_per_session_e4"),
                F.floor(
                    F.col(f"dur{t}").cast("double") / ses.cast("double")
                    * 100
                    + F.lit(_OFF)
                ).cast("long").alias("mean_duration_cs"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("timeout_s")


def _sweep_sql() -> str:
    parts = []
    for t in _SWEEP_TS:
        parts.append(f"""
  SELECT CAST({t} AS BIGINT) AS timeout_s,
         CAST(n_users + brk{t} AS BIGINT) AS n_sessions,
         CAST(floor(CAST(n_events AS DOUBLE) / (n_users + brk{t}) * 1e4
                    + {_OFF}) AS BIGINT) AS events_per_session_e4,
         CAST(floor(CAST(dur{t} AS DOUBLE) / (n_users + brk{t}) * 100
                    + {_OFF}) AS BIGINT) AS mean_duration_cs
  FROM agg""")
    sums = ",\n".join(
        f"""         CAST(sum(CASE WHEN gs > {t} THEN 1 ELSE 0 END)
              AS BIGINT) AS brk{t},
         CAST(sum(CASE WHEN gs <= {t} THEN gs ELSE 0 END)
              AS BIGINT) AS dur{t}"""
        for t in _SWEEP_TS
    )
    return f"""
WITH g AS (
  SELECT user_id,
         (CAST(epoch_us(ts) AS BIGINT)
          - lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
              PARTITION BY user_id
              ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id
            )) // 1000000 AS gs
  FROM events
), agg AS (
  SELECT count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
{sums}
  FROM g
)
SELECT * FROM ({" UNION ALL ".join(parts)})
ORDER BY timeout_s
"""


QUERIES["session_timeout_sweep"] = q_session_timeout_sweep
ORACLE_SQL["session_timeout_sweep"] = _sweep_sql()
