"""Round-4 continuation registry (twentieth battery): external
clustering-agreement indices — the Adjusted Rand Index (Hubert &
Arabie 1985) and the V-measure homogeneity/completeness pair
(Rosenberg & Hirschberg 2007) — between two in-engine user labelings:
A = the user's modal event type (deterministic count-desc/name-asc
tie-break) and B = the user's activity magnitude floor(log2(n)).

Complements the existing agreement family (cohens_kappa, wkappa,
fleiss, gwet, krippendorff judge the same NOMINAL labels; mutual_info
and uncertainty_coeff score dependence) — ARI is the pair-counting
index and V-measure the entropy index used to compare CLUSTERINGS,
the standard report when auditing two corpus-partitioning runs
against each other (e.g. SemDeDup cells vs topic buckets).

Scale posture: two combinable per-user aggregations joined on the
user key, then everything collapses to the bounded label-pair
contingency (|types| x ~log2(max activity) cells); all index math
runs on that tiny table with exact integer pair counts and the house
e9-floored entropy terms.
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
    tot = ev.groupBy("user_id").agg(
        F.floor(F.log2(F.count(F.lit(1)).cast("double")))
        .cast("long")
        .alias("b")
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
  ), tot AS (
    SELECT user_id, CAST(floor(log2(count(*))) AS BIGINT) AS b
    FROM events GROUP BY 1
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
