"""Round-4 continuation registry (nineteenth battery): inequality
decomposition and segregation — Dagum's three-way Gini decomposition,
Wolfson's bipolarization index, and the exposure/isolation segregation
pair (complementing the existing gini/lorenz/atkinson/palma/hoover/
duncan family).

Scale posture: every pairwise |x-y| sum (total, within-group, and all
cross-group pairs) comes from value-domain prefix cumulatives — the
gmd/energy-distance discipline — so there are ZERO pair joins; the
cross-group streams ride the broadcast pair-table tagging trick from
steel_dwass (each count row lands in at most k-1 pair streams).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


# ---------------------------------------------------------------------------
# gini_dagum_decomposition — Dagum (1997) G = Gw + Ggb over event-type
# subpopulations
# ---------------------------------------------------------------------------
# G      = sum_ij |x_i - x_j| / (2 n^2 ybar)          (V-statistic form)
# Gw     = sum_g G_g p_g s_g,  p_g = n_g/n, s_g = n_g ybar_g/(n ybar)
# Ggb    = sum_{g<h} Delta_gh (p_g s_h + p_h s_g) / ybar ... spelled
#          directly as cross-pair sums so Gw + Ggb == G identically:
#          Ggb = sum_{g<h} S_gh / (n^2 ybar)  with S_gh the cross
#          absolute-difference sum (each unordered group pair counted
#          once covers both ij orders of the V-statistic).
# All three levels use sum_{x<y}(y-x) = sum_v c(v)(v cum< - cumsum<).


def q_gini_dagum_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))

    # within-group sums S_gg = sum_{x<y in g} (y-x)
    wg = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    win = (
        cnt.withColumn(
            "cum", F.coalesce(F.sum("c").over(wg), F.lit(0))
        )
        .withColumn(
            "cums",
            F.coalesce(F.sum(F.col("c") * F.col("v")).over(wg), F.lit(0)),
        )
    )
    sgg = win.groupBy("event_type").agg(
        F.sum("c").alias("n_g"),
        F.sum(F.col("c") * F.col("v")).alias("sum_g"),
        F.sum(
            F.col("c") * (F.col("v") * F.col("cum") - F.col("cums"))
        ).alias("s_gg"),
    )

    # cross-group sums S_gh via tagged pair streams
    types = cnt.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    tagged = cnt.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("ta"))
        | (F.col("event_type") == F.col("tb")),
    ).select(
        "ta",
        "tb",
        "v",
        F.when(F.col("event_type") == F.col("ta"), F.col("c"))
        .otherwise(0)
        .alias("ca"),
        F.when(F.col("event_type") == F.col("tb"), F.col("c"))
        .otherwise(0)
        .alias("cb"),
    )
    pv = tagged.groupBy("ta", "tb", "v").agg(
        F.sum("ca").alias("ca"), F.sum("cb").alias("cb")
    )
    wp = (
        Window.partitionBy("ta", "tb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pv = (
        pv.withColumn(
            "cuma", F.coalesce(F.sum("ca").over(wp), F.lit(0))
        )
        .withColumn(
            "cumsa",
            F.coalesce(F.sum(F.col("ca") * F.col("v")).over(wp), F.lit(0)),
        )
        .withColumn(
            "cumb", F.coalesce(F.sum("cb").over(wp), F.lit(0))
        )
        .withColumn(
            "cumsb",
            F.coalesce(F.sum(F.col("cb") * F.col("v")).over(wp), F.lit(0)),
        )
    )
    s_gh = pv.groupBy("ta", "tb").agg(
        F.sum(
            F.col("cb") * (F.col("v") * F.col("cuma") - F.col("cumsa"))
            + F.col("ca") * (F.col("v") * F.col("cumb") - F.col("cumsb"))
        ).alias("s_gh")
    )
    cross = s_gh.agg(F.sum("s_gh").alias("s_between"))

    tot = sgg.agg(
        F.sum("n_g").alias("n"),
        F.sum("sum_g").alias("sum_all"),
        F.sum("s_gg").alias("s_within_raw"),
    ).crossJoin(cross)
    nd = F.col("n").cast("double")
    ybar = F.col("sum_all").cast("double") / nd
    # V-statistic double sums: each unordered pair counted twice
    g_total = (
        2.0
        * (
            F.col("s_within_raw").cast("double")
            + F.col("s_between").cast("double")
        )
        / (2.0 * nd * nd * ybar)
    )
    g_within = (
        2.0
        * F.col("s_within_raw").cast("double")
        / (2.0 * nd * nd * ybar)
    )
    g_between = (
        2.0
        * F.col("s_between").cast("double")
        / (2.0 * nd * nd * ybar)
    )
    return tot.select(
        F.col("n").cast("long").alias("n"),
        F.floor(g_total * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "gini_e6"
        ),
        F.floor(g_within * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "gini_within_e6"
        ),
        F.floor(g_between * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("gini_between_e6"),
    )


SQL_DAGUM = f"""
WITH cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), win AS (
  SELECT *,
         CAST(coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum,
         CAST(coalesce(sum(c * v) OVER (PARTITION BY event_type
                ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cums
  FROM cnt
), sgg AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n_g,
         CAST(sum(c * v) AS BIGINT) AS sum_g,
         CAST(sum(c * (v * cum - cums)) AS BIGINT) AS s_gg
  FROM win GROUP BY 1
), types AS (
  SELECT DISTINCT event_type FROM cnt
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a, types b WHERE a.event_type < b.event_type
), tagged AS (
  SELECT p.ta, p.tb, c.v,
         CASE WHEN c.event_type = p.ta THEN c.c ELSE 0 END AS ca,
         CASE WHEN c.event_type = p.tb THEN c.c ELSE 0 END AS cb
  FROM cnt c JOIN pairs p
    ON c.event_type = p.ta OR c.event_type = p.tb
), pv AS (
  SELECT ta, tb, v,
         CAST(sum(ca) AS BIGINT) AS ca,
         CAST(sum(cb) AS BIGINT) AS cb
  FROM tagged GROUP BY 1, 2, 3
), cum AS (
  SELECT *,
         CAST(coalesce(sum(ca) OVER (PARTITION BY ta, tb ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cuma,
         CAST(coalesce(sum(ca * v) OVER (PARTITION BY ta, tb ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumsa,
         CAST(coalesce(sum(cb) OVER (PARTITION BY ta, tb ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumb,
         CAST(coalesce(sum(cb * v) OVER (PARTITION BY ta, tb ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumsb
  FROM pv
), sgh AS (
  SELECT ta, tb,
         CAST(sum(cb * (v * cuma - cumsa)
                  + ca * (v * cumb - cumsb)) AS BIGINT) AS s_gh
  FROM cum GROUP BY 1, 2
), cross_ AS (
  SELECT CAST(sum(s_gh) AS BIGINT) AS s_between FROM sgh
), tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(sum_g) AS BIGINT) AS sum_all,
         CAST(sum(s_gg) AS BIGINT) AS s_within_raw
  FROM sgg
)
SELECT t.n,
       CAST(floor(2.0 * (CAST(t.s_within_raw AS DOUBLE) + c.s_between)
                  / (2.0 * CAST(t.n AS DOUBLE) * t.n
                     * (CAST(t.sum_all AS DOUBLE) / t.n)) * 1000000
                  + {_OFF}) AS BIGINT) AS gini_e6,
       CAST(floor(2.0 * CAST(t.s_within_raw AS DOUBLE)
                  / (2.0 * CAST(t.n AS DOUBLE) * t.n
                     * (CAST(t.sum_all AS DOUBLE) / t.n)) * 1000000
                  + {_OFF}) AS BIGINT) AS gini_within_e6,
       CAST(floor(2.0 * CAST(c.s_between AS DOUBLE)
                  / (2.0 * CAST(t.n AS DOUBLE) * t.n
                     * (CAST(t.sum_all AS DOUBLE) / t.n)) * 1000000
                  + {_OFF}) AS BIGINT) AS gini_between_e6
FROM tot t, cross_ c
"""

QUERIES["gini_dagum_decomposition"] = q_gini_dagum_decomposition
ORACLE_SQL["gini_dagum_decomposition"] = SQL_DAGUM


# ---------------------------------------------------------------------------
# wolfson_polarization — Wolfson (1994) bipolarization index of event
# values per type
# ---------------------------------------------------------------------------
# W = (2 ybar / median) * (0.5 - L(0.5) - G/2) where L(0.5) is the
# Lorenz ordinate at the median person and G the Gini.  Median person
# and the below-median income share both come from the value-domain
# cumulative; the "0.5 - L(0.5)" term uses the exact below-median sum
# plus the fractional slice of the median value.


def q_wolfson_polarization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    wg = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("event_type")
    win = (
        cnt.withColumn(
            "cum", F.coalesce(F.sum("c").over(wg), F.lit(0))
        )
        .withColumn(
            "cums",
            F.coalesce(F.sum(F.col("c") * F.col("v")).over(wg), F.lit(0)),
        )
        .withColumn("n", F.sum("c").over(wn))
        .withColumn("tot", F.sum(F.col("c") * F.col("v")).over(wn))
        .withColumn(
            "gsum",
            F.sum(
                F.col("c") * (F.col("v") * F.col("cum") - F.col("cums"))
            ).over(wn),
        )
    )
    # the row containing the n/2-th person (1-indexed positions
    # cum+1 .. cum+c); h = how many of the first n/2 fall in this row
    med_row = win.filter(
        (2 * F.col("cum") < F.col("n"))
        & (2 * (F.col("cum") + F.col("c")) >= F.col("n"))
    )
    nd = F.col("n").cast("double")
    half = nd / 2.0
    h = half - F.col("cum").cast("double")  # persons taken from this row
    lhalf_sum = F.col("cums").cast("double") + h * F.col("v").cast(
        "double"
    )
    ybar = F.col("tot").cast("double") / nd
    lorenz_half = lhalf_sum / F.col("tot").cast("double")
    gini = (
        2.0
        * F.col("gsum").cast("double")
        / (nd * nd * ybar)
    )
    median = F.col("v").cast("double")
    w = (
        2.0
        * ybar
        / median
        * (F.lit(0.5) - lorenz_half - gini / 2.0)
    )
    return med_row.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(gini * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "gini_e6"
        ),
        F.floor(lorenz_half * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("lorenz_half_e6"),
        F.floor(w * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "wolfson_e6"
        ),
    ).orderBy("event_type")


SQL_WOLFSON = f"""
WITH cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), win AS (
  SELECT *,
         CAST(coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum,
         CAST(coalesce(sum(c * v) OVER (PARTITION BY event_type
                ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cums,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(sum(c * v) OVER (PARTITION BY event_type)
              AS BIGINT) AS tot
  FROM cnt
), win2 AS (
  SELECT *,
         CAST(sum(c * (v * cum - cums))
              OVER (PARTITION BY event_type) AS BIGINT) AS gsum
  FROM win
), med AS (
  SELECT * FROM win2
  WHERE 2 * cum < n AND 2 * (cum + c) >= n
)
SELECT event_type, n,
       CAST(floor(2.0 * gsum
                  / (CAST(n AS DOUBLE) * n * (CAST(tot AS DOUBLE) / n))
                  * 1000000 + {_OFF}) AS BIGINT) AS gini_e6,
       CAST(floor((cums + (n / 2.0 - cum) * v) / tot * 1000000
                  + {_OFF}) AS BIGINT) AS lorenz_half_e6,
       CAST(floor(2.0 * (CAST(tot AS DOUBLE) / n) / v
                  * (0.5 - (cums + (n / 2.0 - cum) * v)
                           / CAST(tot AS DOUBLE)
                     - (2.0 * gsum
                        / (CAST(n AS DOUBLE) * n
                           * (CAST(tot AS DOUBLE) / n))) / 2.0)
                  * 1000000 + {_OFF}) AS BIGINT) AS wolfson_e6
FROM med
ORDER BY event_type
"""

QUERIES["wolfson_polarization"] = q_wolfson_polarization
ORACLE_SQL["wolfson_polarization"] = SQL_WOLFSON


# ---------------------------------------------------------------------------
# isolation_exposure — P* exposure/isolation segregation indices of
# each language across sources (Bell 1954; Lieberson 1981)
# ---------------------------------------------------------------------------
# Isolation xPx = sum_i (x_i/X)(x_i/t_i); exposure of x to the rest
# xPy = sum_i (x_i/X)((t_i - x_i)/t_i); xPx + xPy = 1.  Per-source
# terms are exact rationals e9-floored before the source sum.


def q_isolation_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    docs = _documents(spark, sf_dir)
    cell = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("x")
    )
    tots = cell.groupBy("source").agg(F.sum("x").alias("t"))
    lt = cell.groupBy("lang").agg(F.sum("x").alias("xx"))
    j = cell.join(F.broadcast(tots), "source").join(
        F.broadcast(lt), "lang"
    )
    iso9 = F.floor(
        F.col("x").cast("double")
        / F.col("xx").cast("double")
        * F.col("x").cast("double")
        / F.col("t").cast("double")
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    exp9 = F.floor(
        F.col("x").cast("double")
        / F.col("xx").cast("double")
        * (F.col("t") - F.col("x")).cast("double")
        / F.col("t").cast("double")
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    agg = j.select(
        "lang", F.col("xx"), iso9.alias("i9"), exp9.alias("e9")
    ).groupBy("lang").agg(
        F.max("xx").alias("n_docs"),
        F.sum("i9").alias("si9"),
        F.sum("e9").alias("se9"),
    )
    return agg.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.floor(
            F.col("si9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("isolation_e6"),
        F.floor(
            F.col("se9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("exposure_e6"),
    ).orderBy("lang")


SQL_ISOLATION = f"""
WITH cell AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS x
  FROM documents GROUP BY 1, 2
), tots AS (
  SELECT source, CAST(sum(x) AS BIGINT) AS t FROM cell GROUP BY 1
), lt AS (
  SELECT lang, CAST(sum(x) AS BIGINT) AS xx FROM cell GROUP BY 1
), j AS (
  SELECT c.lang, l.xx,
         CAST(floor(CAST(c.x AS DOUBLE) / l.xx * c.x / t.t * 1e9
                    + {_OFF}) AS BIGINT) AS i9,
         CAST(floor(CAST(c.x AS DOUBLE) / l.xx * (t.t - c.x) / t.t
                    * 1e9 + {_OFF}) AS BIGINT) AS e9
  FROM cell c
  JOIN tots t ON t.source = c.source
  JOIN lt l ON l.lang = c.lang
), agg AS (
  SELECT lang, max(xx) AS n_docs,
         CAST(sum(i9) AS BIGINT) AS si9,
         CAST(sum(e9) AS BIGINT) AS se9
  FROM j GROUP BY 1
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(floor(CAST(si9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS isolation_e6,
       CAST(floor(CAST(se9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS exposure_e6
FROM agg
ORDER BY lang
"""

QUERIES["isolation_exposure"] = q_isolation_exposure
ORACLE_SQL["isolation_exposure"] = SQL_ISOLATION


# ===========================================================================
# Battery P — point-process / lattice spatial statistics in time:
# Ripley's K on the hourly grid, Anselin local Moran hotspots on the
# hour-of-week lattice, and the nearest-neighbour G-function.
# ===========================================================================


# ---------------------------------------------------------------------------
# ripley_k_time — discretized Ripley K at radii 1, 2, 4 hours
# ---------------------------------------------------------------------------
# P(r) = # ordered event pairs with |slot_i - slot_j| <= r (same-slot
# pairs counted c(c-1)); K(r) = T * P(r) / (n(n-1)); under CSR the
# expectation is ~(2r+1) slots, reported as ratio K/(2r+1).  The pair
# count is a BANDED join on the bounded hourly-slot domain (offsets
# 0..4 exploded) — never an event-pair join.


def q_ripley_k_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    slots = ev.select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        )
        .cast("long")
        .alias("s"),
    ).groupBy("event_type", "s").agg(F.count(F.lit(1)).alias("c"))
    offs = slots.sparkSession.range(1, 5).select(
        F.col("id").alias("d")
    )
    a = slots.select(
        "event_type", F.col("s").alias("sa"), F.col("c").alias("ca")
    )
    b = slots.select(
        F.col("event_type").alias("et_b"),
        F.col("s").alias("sb"),
        F.col("c").alias("cb"),
    )
    shifted = a.crossJoin(F.broadcast(offs)).join(
        b,
        (F.col("event_type") == F.col("et_b"))
        & (F.col("sb") == F.col("sa") + F.col("d")),
    ).select(
        "event_type",
        "d",
        (F.col("ca") * F.col("cb")).alias("pp"),
    )
    cross = shifted.groupBy("event_type", "d").agg(
        F.sum("pp").alias("pd")
    )
    same = slots.groupBy("event_type").agg(
        F.sum(F.col("c") * (F.col("c") - 1)).alias("p0"),
        F.sum("c").alias("n"),
        (F.max("s") - F.min("s") + 1).alias("t"),
    )
    radii = slots.sparkSession.createDataFrame(
        [(1,), (2,), (4,)], ["r"]
    )
    jr = same.crossJoin(F.broadcast(radii)).join(
        cross, "event_type"
    ).filter(F.col("d") <= F.col("r"))
    agg = jr.groupBy("event_type", "r").agg(
        F.max("p0").alias("p0"),
        F.max("n").alias("n"),
        F.max("t").alias("t"),
        F.sum("pd").alias("pcross"),
    )
    p = (F.col("p0") + 2 * F.col("pcross")).cast("double")
    nd = F.col("n").cast("double")
    k = F.col("t").cast("double") * p / (nd * (nd - 1.0))
    ratio = k / (2.0 * F.col("r").cast("double") + 1.0)
    return (
        agg.filter(F.col("n") >= 2)
        .select(
            "event_type",
            F.col("r").cast("long").alias("r_hours"),
            F.col("n").cast("long").alias("n"),
            F.floor(k * 10_000 + F.lit(_OFF)).cast("long").alias(
                "k_e4"
            ),
            F.floor(ratio * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("csr_ratio_e6"),
        )
        .orderBy("event_type", "r_hours")
    )


SQL_RIPLEY = f"""
WITH slots AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), cross_ AS (
  SELECT a.event_type, d.d,
         CAST(sum(a.c * b.c) AS BIGINT) AS pd
  FROM slots a
  JOIN (SELECT unnest(generate_series(1, 4)) AS d) d ON TRUE
  JOIN slots b ON b.event_type = a.event_type AND b.s = a.s + d.d
  GROUP BY 1, 2
), same AS (
  SELECT event_type,
         CAST(sum(c * (c - 1)) AS BIGINT) AS p0,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(max(s) - min(s) + 1 AS BIGINT) AS t
  FROM slots GROUP BY 1
), agg AS (
  SELECT s.event_type, r.r, max(s.p0) AS p0, max(s.n) AS n,
         max(s.t) AS t, CAST(sum(c.pd) AS BIGINT) AS pcross
  FROM same s
  JOIN (SELECT unnest([1, 2, 4]) AS r) r ON TRUE
  JOIN cross_ c ON c.event_type = s.event_type AND c.d <= r.r
  GROUP BY 1, 2
)
SELECT event_type, CAST(r AS BIGINT) AS r_hours,
       CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(t AS DOUBLE) * (p0 + 2 * pcross)
                  / (CAST(n AS DOUBLE) * (n - 1.0)) * 10000 + {_OFF})
            AS BIGINT) AS k_e4,
       CAST(floor(CAST(t AS DOUBLE) * (p0 + 2 * pcross)
                  / (CAST(n AS DOUBLE) * (n - 1.0))
                  / (2.0 * r + 1.0) * 1000000 + {_OFF})
            AS BIGINT) AS csr_ratio_e6
FROM agg
WHERE n >= 2
ORDER BY event_type, r_hours
"""

QUERIES["ripley_k_time"] = q_ripley_k_time
ORACLE_SQL["ripley_k_time"] = SQL_RIPLEY


# ---------------------------------------------------------------------------
# local_moran_hotspots — Anselin (1995) LISA on the hour-of-week
# lattice with circular +-1 adjacency
# ---------------------------------------------------------------------------
# I_i = (x_i - xbar)/m2 * sum_j w_ij (x_j - xbar), m2 = sum (x_k -
# xbar)^2 / n.  The 168-cell lattice INCLUDES zero cells (generated
# grid x types); reports hot (I>0, z>0), cold (I>0, z<0) counts and
# the max-|I| cell per type.


def q_local_moran_hotspots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    how = ev.select(
        "event_type",
        (
            (F.dayofweek("ts") - 1) * 24 + F.hour("ts")
        ).cast("long").alias("hw"),
    ).groupBy("event_type", "hw").agg(F.count(F.lit(1)).alias("c"))
    types = how.select("event_type").distinct()
    grid = types.crossJoin(
        F.broadcast(
            how.sparkSession.range(0, 168).select(
                F.col("id").alias("hw")
            )
        )
    )
    full = grid.join(how, ["event_type", "hw"], "left").select(
        "event_type", "hw", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    mom = full.groupBy("event_type").agg(
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    nd = F.lit(168.0)
    mean = F.col("sc").cast("double") / nd
    m2 = F.col("scc").cast("double") / nd - mean * mean
    mom = mom.select(
        "event_type", mean.alias("mean"), m2.alias("m2")
    ).filter(F.col("m2") > 0)
    l1 = full.select(
        "event_type",
        ((F.col("hw") + 1) % 168).alias("hw"),
        F.col("c").alias("cl"),
    )
    r1 = full.select(
        "event_type",
        ((F.col("hw") + 167) % 168).alias("hw"),
        F.col("c").alias("cr"),
    )
    j = (
        full.join(l1, ["event_type", "hw"])
        .join(r1, ["event_type", "hw"])
        .join(F.broadcast(mom), "event_type")
    )
    z = (F.col("c").cast("double") - F.col("mean"))
    lagv = (
        F.col("cl").cast("double")
        - F.col("mean")
        + F.col("cr").cast("double")
        - F.col("mean")
    )
    ii = z / F.col("m2") * lagv
    j = j.withColumn(
        "i6", F.floor(ii * 1e6 + F.lit(_OFF)).cast("long")
    ).withColumn("zpos", (z > 0).cast("long"))
    agg = j.groupBy("event_type").agg(
        F.sum(
            ((F.col("i6") > 0) & (F.col("zpos") == 1)).cast("long")
        ).alias("n_hot"),
        F.sum(
            ((F.col("i6") > 0) & (F.col("zpos") == 0)).cast("long")
        ).alias("n_cold"),
        F.max_by(
            F.struct(F.col("hw"), F.col("i6")),
            F.struct(F.abs(F.col("i6")), -F.col("hw")),
        ).alias("b"),
    )
    return agg.select(
        "event_type",
        F.col("n_hot").cast("long").alias("n_hot"),
        F.col("n_cold").cast("long").alias("n_cold"),
        F.col("b.hw").cast("long").alias("peak_cell"),
        F.col("b.i6").alias("peak_i_e6"),
    ).orderBy("event_type")


SQL_LOCAL_MORAN = f"""
WITH how AS (
  SELECT event_type,
         CAST(dayofweek(ts) * 24 + EXTRACT(hour FROM ts)
              AS BIGINT) AS hw,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), types AS (
  SELECT DISTINCT event_type FROM how
), grid AS (
  SELECT t.event_type, g.hw
  FROM types t, (SELECT unnest(generate_series(0, 167)) AS hw) g
), full_ AS (
  SELECT g.event_type, g.hw, coalesce(h.c, 0) AS c
  FROM grid g
  LEFT JOIN how h ON h.event_type = g.event_type AND h.hw = g.hw
), mom AS (
  SELECT event_type,
         CAST(sum(c) AS DOUBLE) / 168.0 AS mean,
         CAST(sum(c * c) AS DOUBLE) / 168.0
           - (CAST(sum(c) AS DOUBLE) / 168.0)
             * (CAST(sum(c) AS DOUBLE) / 168.0) AS m2
  FROM full_ GROUP BY 1
  HAVING CAST(sum(c * c) AS DOUBLE) / 168.0
         - (CAST(sum(c) AS DOUBLE) / 168.0)
           * (CAST(sum(c) AS DOUBLE) / 168.0) > 0
), j AS (
  SELECT f.event_type, f.hw, f.c, l.c AS cl, r.c AS cr,
         m.mean, m.m2
  FROM full_ f
  JOIN full_ l ON l.event_type = f.event_type
              AND l.hw = (f.hw + 167) % 168
  JOIN full_ r ON r.event_type = f.event_type
              AND r.hw = (f.hw + 1) % 168
  JOIN mom m ON m.event_type = f.event_type
), scored AS (
  SELECT event_type, hw,
         CAST(floor((c - mean) / m2
                    * ((cl - mean) + (cr - mean)) * 1e6 + {_OFF})
              AS BIGINT) AS i6,
         CASE WHEN c - mean > 0 THEN 1 ELSE 0 END AS zpos
  FROM j
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(i6) DESC, hw ASC) AS r
  FROM scored
), agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN i6 > 0 AND zpos = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hot,
         CAST(sum(CASE WHEN i6 > 0 AND zpos = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_cold
  FROM scored GROUP BY 1
)
SELECT a.event_type, a.n_hot, a.n_cold,
       CAST(rk.hw AS BIGINT) AS peak_cell,
       rk.i6 AS peak_i_e6
FROM agg a JOIN rk ON rk.event_type = a.event_type AND rk.r = 1
ORDER BY a.event_type
"""

QUERIES["local_moran_hotspots"] = q_local_moran_hotspots
ORACLE_SQL["local_moran_hotspots"] = SQL_LOCAL_MORAN


# ---------------------------------------------------------------------------
# nn_g_function — nearest-neighbour G-function of each user's event
# stream (per type): G(t) = P(nearest other event within t)
# ---------------------------------------------------------------------------
# nn = min(gap to previous, gap to next) within the (type, user)
# stream (lag/lead windows over fine-grained keys — bounded per user);
# evaluated at t = 60 s, 300 s, 1800 s; exact integer second gaps.


def q_nn_g_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        "event_type",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("event_type", "user_id").orderBy("us")
    g = e.withColumn(
        "gp", F.col("us") - F.lag("us").over(w)
    ).withColumn("gn", F.lead("us").over(w) - F.col("us"))
    nn = F.least(
        F.coalesce(F.col("gp"), F.col("gn")),
        F.coalesce(F.col("gn"), F.col("gp")),
    )
    g = g.withColumn("nn", nn).filter(F.col("nn").isNotNull())
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("nn") <= 60_000_000).cast("long")).alias("c60"),
        F.sum((F.col("nn") <= 300_000_000).cast("long")).alias(
            "c300"
        ),
        F.sum((F.col("nn") <= 1_800_000_000).cast("long")).alias(
            "c1800"
        ),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(
            F.col("c60").cast("double") / nd * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("g60_e6"),
        F.floor(
            F.col("c300").cast("double") / nd * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("g300_e6"),
        F.floor(
            F.col("c1800").cast("double") / nd * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("g1800_e6"),
    ).orderBy("event_type")


SQL_NN_G = f"""
WITH e AS (
  SELECT event_type, user_id,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
), g AS (
  SELECT event_type,
         us - lag(us) OVER (PARTITION BY event_type, user_id
                            ORDER BY us) AS gp,
         lead(us) OVER (PARTITION BY event_type, user_id
                        ORDER BY us) - us AS gn
  FROM e
), nn AS (
  SELECT event_type,
         least(coalesce(gp, gn), coalesce(gn, gp)) AS nn
  FROM g
  WHERE coalesce(gp, gn) IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CASE WHEN nn <= 60000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS c60,
         CAST(sum(CASE WHEN nn <= 300000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS c300,
         CAST(sum(CASE WHEN nn <= 1800000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS c1800
  FROM nn GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(c60 AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS g60_e6,
       CAST(floor(CAST(c300 AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS g300_e6,
       CAST(floor(CAST(c1800 AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS g1800_e6
FROM agg
ORDER BY event_type
"""

QUERIES["nn_g_function"] = q_nn_g_function
ORACLE_SQL["nn_g_function"] = SQL_NN_G


# ===========================================================================
# Battery Q — TPC-H analogs, wave 2 (complements the Q4/Q5/Q8/Q10
# battery): Q3 shipping priority (top-k revenue), Q16 supplier counts
# with NOT-IN exclusions, Q22 global sales opportunity (anti-join +
# broadcast scalar subquery).  Revenue in exact centi-integers.
# ===========================================================================


# ---------------------------------------------------------------------------
# tpch_q3_shipping_priority — top-10 unshipped-revenue orders for the
# BUILDING segment as of 1998-01-01
# ---------------------------------------------------------------------------


def q_tpch_q3_shipping_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    rev = F.floor(
        F.col("l_extendedprice")
        * 100
        * (F.lit(1_000_000) - F.floor(F.col("l_discount") * 1e6 + F.lit(_OFF)))
        / 1e6
        + F.lit(_OFF)
    ).cast("long")
    j = (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "l_orderkey",
            F.unix_micros(
                F.col("o_orderdate").cast("timestamp")
            ).alias("od_us"),
            rev.alias("rev2"),
        )
    )
    agg = j.groupBy("l_orderkey", "od_us").agg(
        F.sum("rev2").alias("revenue2")
    )
    return (
        agg.orderBy(
            F.col("revenue2").desc(), F.col("l_orderkey")
        )
        .limit(10)
        .select(
            F.col("l_orderkey").cast("long").alias("o_orderkey"),
            (F.col("od_us") / 1_000_000).cast("long").alias(
                "o_orderdate_s"
            ),
            F.col("revenue2").cast("long").alias("revenue_c2"),
        )
    )


SQL_Q3 = f"""
SELECT CAST(l.l_orderkey AS BIGINT) AS o_orderkey,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS o_orderdate_s,
       CAST(sum(CAST(floor(l.l_extendedprice * 100
                           * (1000000 - CAST(floor(l.l_discount * 1e6
                                                   + {_OFF}) AS BIGINT))
                           / 1e6 + {_OFF}) AS BIGINT)) AS BIGINT)
         AS revenue_c2
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2
ORDER BY revenue_c2 DESC, o_orderkey
LIMIT 10
"""


QUERIES["tpch_q3_shipping_priority"] = q_tpch_q3_shipping_priority
ORACLE_SQL["tpch_q3_shipping_priority"] = SQL_Q3


# ---------------------------------------------------------------------------
# tpch_q16_supplier_cnt — distinct-supplier counts per (brand, size)
# with brand and complaint-supplier exclusions (Q16 analog on the
# lineitem part-supplier relation)
# ---------------------------------------------------------------------------
# Excludes Brand#9 parts and suppliers with negative account balance
# (the 'customer complaints' NOT IN analog — an anti-join on the tiny
# supplier dim).


def q_tpch_q16_supplier_cnt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_brand") != "Brand#9"
    )
    bad = spark.read.parquet(f"{sf_dir}/supplier.parquet").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_key"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    j = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            li["l_partkey"] == part["p_partkey"],
        )
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("bad_key"),
            "left_anti",
        )
    )
    agg = j.groupBy("p_brand", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )
    return agg.select(
        "p_brand",
        F.col("p_size").cast("long").alias("p_size"),
        F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
    ).orderBy(
        F.col("supplier_cnt").desc(), "p_brand", "p_size"
    ).limit(20)


SQL_Q16 = """
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#9'
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_size
LIMIT 20
"""

QUERIES["tpch_q16_supplier_cnt"] = q_tpch_q16_supplier_cnt
ORACLE_SQL["tpch_q16_supplier_cnt"] = SQL_Q16


# ---------------------------------------------------------------------------
# tpch_q22_sales_opportunity — above-average-balance customers with no
# RECENT orders, per nation (Q22 analog: anti-join + broadcast scalar)
# ---------------------------------------------------------------------------
# The scalar subquery (average positive balance) broadcasts as one
# row; "no orders since 2000-08-01" is a left-anti join against the
# recent-orders projection; acctbal totals in exact centi-integers.


def q_tpch_q22_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    recent = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") >= "2000-08-01"
    ).select("o_custkey").distinct()
    pos = cust.filter(F.col("c_acctbal") > 0)
    avg2 = pos.agg(
        F.floor(
            F.sum(
                F.floor(F.col("c_acctbal") * 100 + F.lit(_OFF)).cast(
                    "long"
                )
            ).cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("avg2")
    )
    j = (
        cust.crossJoin(F.broadcast(avg2))
        .filter(
            F.floor(F.col("c_acctbal") * 100 + F.lit(_OFF)).cast("long")
            > F.col("avg2")
        )
        .join(
            recent,
            cust["c_custkey"] == recent["o_custkey"],
            "left_anti",
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    agg = j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(
            F.floor(F.col("c_acctbal") * 100 + F.lit(_OFF)).cast("long")
        ).alias("totacctbal2"),
    )
    return agg.select(
        "n_name",
        F.col("numcust").cast("long").alias("numcust"),
        F.col("totacctbal2").cast("long").alias("totacctbal_c2"),
    ).orderBy("n_name")


SQL_Q22 = f"""
WITH avg2 AS (
  SELECT CAST(floor(CAST(sum(CAST(floor(c_acctbal * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS avg2
  FROM customer WHERE c_acctbal > 0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-08-01'
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(floor(c.c_acctbal * 100 + {_OFF}) AS BIGINT))
            AS BIGINT) AS totacctbal_c2
FROM customer c, avg2 a
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE CAST(floor(c.c_acctbal * 100 + {_OFF}) AS BIGINT) > a.avg2
  AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY 1
ORDER BY 1
"""

QUERIES["tpch_q22_sales_opportunity"] = q_tpch_q22_sales_opportunity
ORACLE_SQL["tpch_q22_sales_opportunity"] = SQL_Q22


# ===========================================================================
# Battery R — multi-touch attribution: cooperative-game Shapley values
# over channel coalitions, and rule-based U-shaped / time-decay credit
# (the marketing-science complement of shapley_lmg / position_bias).
# ===========================================================================


# ---------------------------------------------------------------------------
# shapley_attribution — Shapley channel credit with coalition value
# v(S) = (# conversions by users whose channel set is a subset of S)
# / (# users)
# ---------------------------------------------------------------------------
# Channels = {click, view, signup, error}; conversion = any purchase.
# Users collapse to 16 channel-set masks; v(S) is a 16 x 16 subset
# join (m & S == m); Shapley_i = sum_{S not ni i} w(|S|) (v(S u i) -
# v(S)) with 24 w(|S|) in {6, 2, 2, 6} kept as exact integers.
# Everything after the user collapse is constant-size.


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    peru = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias(
            "conv"
        ),
        F.max((F.col("event_type") == "click").cast("long")).alias("b0"),
        F.max((F.col("event_type") == "view").cast("long")).alias("b1"),
        F.max((F.col("event_type") == "signup").cast("long")).alias(
            "b2"
        ),
        F.max((F.col("event_type") == "error").cast("long")).alias("b3"),
    )
    peru = peru.withColumn(
        "mask",
        F.col("b0") + 2 * F.col("b1") + 4 * F.col("b2") + 8 * F.col("b3"),
    )
    bym = peru.groupBy("mask").agg(
        F.count(F.lit(1)).alias("nu"),
        F.sum("conv").alias("nc"),
    )
    spark_ = ev.sparkSession
    ss = spark_.range(0, 16).select(F.col("id").alias("s"))
    sub = (
        ss.join(bym, F.expr("(mask & s) = mask"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("nc"), F.lit(0)).alias("vc"))
    )
    ntot = peru.agg(F.count(F.lit(1)).alias("n"))
    # channel-marginal pairs
    chans = spark_.createDataFrame(
        [(0, "click"), (1, "view"), (2, "signup"), (3, "error")],
        ["bit", "channel"],
    )
    pairs = ss.crossJoin(F.broadcast(chans)).filter(
        F.expr("(s & (1 << bit)) = 0")
    )

    def pop(c):
        return (
            F.floor(c / 1) % 2
            + F.floor(c / 2) % 2
            + F.floor(c / 4) % 2
            + F.floor(c / 8) % 2
        )

    pairs = pairs.withColumn("ssize", pop(F.col("s")).cast("long"))
    w24 = (
        F.when(F.col("ssize") == 0, 6)
        .when(F.col("ssize") == 3, 6)
        .otherwise(2)
    )
    vs = sub.select(F.col("s").alias("s_"), F.col("vc"))
    j = (
        pairs.join(vs, F.col("s") == F.col("s_"))
        .drop("s_")
        .join(
            vs.select(
                F.col("s_").alias("si_"), F.col("vc").alias("vci")
            ),
            F.expr("si_ = s + (1 << bit)"),
        )
        .crossJoin(F.broadcast(ntot))
    )
    j = j.withColumn(
        "contrib24", w24 * (F.col("vci") - F.col("vc"))
    )
    agg = j.groupBy("channel").agg(
        F.sum("contrib24").alias("c24"),
        F.max("n").alias("n"),
    )
    shap = F.col("c24").cast("double") / 24.0 / F.col("n").cast(
        "double"
    )
    return agg.select(
        "channel",
        F.col("n").cast("long").alias("n_users"),
        F.floor(shap * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "shapley_e6"
        ),
    ).orderBy("channel")


SQL_SHAPLEY_ATTR = f"""
WITH peru AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         + 2 * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         + 8 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           AS mask
  FROM events GROUP BY 1
), bym AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS nu,
         CAST(sum(conv) AS BIGINT) AS nc
  FROM peru GROUP BY 1
), ss AS (
  SELECT unnest(generate_series(0, 15)) AS s
), sub AS (
  SELECT ss.s, CAST(coalesce(sum(b.nc), 0) AS BIGINT) AS vc
  FROM ss LEFT JOIN bym b ON (b.mask & ss.s) = b.mask
  GROUP BY 1
), ntot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM peru
), chans AS (
  SELECT * FROM (VALUES (0, 'click'), (1, 'view'), (2, 'signup'),
                        (3, 'error')) AS t(bit, channel)
), pairs AS (
  SELECT ss.s, c.bit, c.channel,
         CAST(ss.s % 2 + (ss.s // 2) % 2 + (ss.s // 4) % 2
              + (ss.s // 8) % 2 AS BIGINT) AS ssize
  FROM ss, chans c
  WHERE (ss.s & (1 << c.bit)) = 0
), j AS (
  SELECT p.channel,
         (CASE WHEN p.ssize IN (0, 3) THEN 6 ELSE 2 END)
         * (vi.vc - v0.vc) AS contrib24,
         n.n
  FROM pairs p
  JOIN sub v0 ON v0.s = p.s
  JOIN sub vi ON vi.s = p.s + (1 << p.bit)
  CROSS JOIN ntot n
)
SELECT channel, CAST(max(n) AS BIGINT) AS n_users,
       CAST(floor(CAST(sum(contrib24) AS DOUBLE) / 24.0 / max(n)
                  * 1000000 + {_OFF}) AS BIGINT) AS shapley_e6
FROM j GROUP BY 1
ORDER BY channel
"""

QUERIES["shapley_attribution"] = q_shapley_attribution
ORACLE_SQL["shapley_attribution"] = SQL_SHAPLEY_ATTR


# ---------------------------------------------------------------------------
# attribution_credit — U-shaped (40/20/40) and 7-day-half-life
# time-decay credit over pre-conversion touches
# ---------------------------------------------------------------------------
# Touches = channel events strictly before the user's FIRST purchase;
# U-shape: 1.0 if one touch, 0.5/0.5 if two, else 0.4 first, 0.4
# last, 0.2 split over the middle; time-decay weight 0.5^(dt/7d)
# normalized per user.  Per-touch credits are e9-floored before the
# channel rollup.


def q_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ln_half = -0.6931471805599453
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    conv = e.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min("us").alias("cus"))
    touches = (
        e.filter(F.col("event_type") != "purchase")
        .join(conv, "user_id")
        .filter(F.col("us") < F.col("cus"))
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_type")
    wn = Window.partitionBy("user_id")
    t = (
        touches.withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    ucredit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("r") == 1, F.lit(0.4))
        .when(F.col("r") == F.col("n"), F.lit(0.4))
        .otherwise(0.2 / (F.col("n") - 2).cast("double"))
    )
    dt_days = (F.col("cus") - F.col("us")).cast("double") / 86_400_000_000.0
    dw = F.exp(dt_days / 7.0 * F.lit(ln_half))
    t = t.withColumn("dw9", F.floor(dw * 1e9 + F.lit(_OFF)).cast("long"))
    t = t.withColumn("dwsum", F.sum("dw9").over(wn))
    dcredit = F.col("dw9").cast("double") / F.col("dwsum").cast(
        "double"
    )
    t = t.withColumn(
        "u9", F.floor(ucredit * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "d9", F.floor(dcredit * 1e9 + F.lit(_OFF)).cast("long")
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("u9").alias("su9"),
        F.sum("d9").alias("sd9"),
    )
    return agg.select(
        F.col("event_type").alias("channel"),
        F.col("n_touches").cast("long").alias("n_touches"),
        F.floor(
            F.col("su9").cast("double") / 1e9 * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("u_credit_e4"),
        F.floor(
            F.col("sd9").cast("double") / 1e9 * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("decay_credit_e4"),
    ).orderBy("channel")


SQL_ATTR_CREDIT = f"""
WITH e AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
), conv AS (
  SELECT user_id, min(us) AS cus
  FROM e WHERE event_type = 'purchase' GROUP BY 1
), touches AS (
  SELECT e.user_id, e.event_type, e.us, c.cus
  FROM e JOIN conv c ON c.user_id = e.user_id
  WHERE e.event_type <> 'purchase' AND e.us < c.cus
), t AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us, event_type) AS r,
         count(*) OVER (PARTITION BY user_id) AS n,
         CAST(floor(exp((cus - us) / 86400000000.0 / 7.0
                        * -0.6931471805599453) * 1e9 + {_OFF})
              AS BIGINT) AS dw9
  FROM touches
), t2 AS (
  SELECT *,
         CAST(sum(dw9) OVER (PARTITION BY user_id) AS BIGINT) AS dwsum,
         CASE WHEN n = 1 THEN 1.0
              WHEN n = 2 THEN 0.5
              WHEN r = 1 THEN 0.4
              WHEN r = n THEN 0.4
              ELSE 0.2 / (n - 2.0) END AS ucredit
  FROM t
), t3 AS (
  SELECT event_type,
         CAST(floor(ucredit * 1e9 + {_OFF}) AS BIGINT) AS u9,
         CAST(floor(CAST(dw9 AS DOUBLE) / dwsum * 1e9 + {_OFF})
              AS BIGINT) AS d9
  FROM t2
)
SELECT event_type AS channel,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(floor(CAST(sum(u9) AS DOUBLE) / 1e9 * 10000 + {_OFF})
            AS BIGINT) AS u_credit_e4,
       CAST(floor(CAST(sum(d9) AS DOUBLE) / 1e9 * 10000 + {_OFF})
            AS BIGINT) AS decay_credit_e4
FROM t3 GROUP BY 1
ORDER BY channel
"""

QUERIES["attribution_credit"] = q_attribution_credit
ORACLE_SQL["attribution_credit"] = SQL_ATTR_CREDIT


# ===========================================================================
# Battery S — meta-analysis wave 2 (complements dersimonian_laird):
# Egger's small-study/publication-bias regression, leave-one-out
# fixed-effect influence, and Dirichlet-multinomial precision (MoM)
# of the daily event-type composition.
# 'Studies' = the 20 document sources; effect = source mean n_chars
# minus the grand mean.
# ===========================================================================


def _source_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    docs = _documents(spark, sf_dir)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
    ).filter(F.col("n") >= 3)
    tot = per.agg(
        F.sum("s").alias("st"), F.sum("n").alias("nt")
    )
    j = per.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    gmean = F.col("st").cast("double") / F.col("nt").cast("double")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - 1.0)
    se2 = var / nd
    return j.select(
        "source",
        "n",
        (mean - gmean).alias("theta"),
        se2.alias("se2"),
    ).filter(F.col("se2") > 0)


_SOURCE_EFFECTS_SQL = """
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
  FROM documents GROUP BY 1
  HAVING count(*) >= 3
), tot AS (
  SELECT CAST(sum(s) AS BIGINT) AS st, CAST(sum(n) AS BIGINT) AS nt
  FROM per
), eff AS (
  SELECT p.source, p.n,
         CAST(p.s AS DOUBLE) / p.n
           - CAST(t.st AS DOUBLE) / t.nt AS theta,
         ((CAST(p.ss AS DOUBLE) - CAST(p.s AS DOUBLE) * p.s / p.n)
          / (p.n - 1.0)) / p.n AS se2
  FROM per p, tot t
  WHERE ((CAST(p.ss AS DOUBLE) - CAST(p.s AS DOUBLE) * p.s / p.n)
         / (p.n - 1.0)) / p.n > 0
)
"""


# ---------------------------------------------------------------------------
# egger_test — Egger, Smith, Schneider & Minder (1997) regression of
# standardized effect on precision; a nonzero intercept flags
# small-study (publication) bias
# ---------------------------------------------------------------------------
# z_i = theta_i/SE_i on x_i = 1/SE_i; report intercept b0, its t, and
# slope.  (z, x) pairs are e6-floored into exact-integer OLS.


def q_egger_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    eff = _source_effects(spark, sf_dir)
    se = F.sqrt(F.col("se2"))
    pts = eff.select(
        F.floor(F.col("theta") / se * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("z6"),
        F.floor(1.0 / se * 1e6 + F.lit(_OFF)).cast("long").alias("x6"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x6").alias("sx"),
        F.sum("z6").alias("sz"),
        F.sum(F.col("x6") * F.col("z6")).alias("sxz"),
        F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
        F.sum(F.col("z6") * F.col("z6")).alias("szz"),
    )
    kd = F.col("k").cast("double")
    sx = F.col("sx").cast("double") / 1e6
    sz = F.col("sz").cast("double") / 1e6
    sxz = F.col("sxz").cast("double") / 1e12
    sxx = F.col("sxx").cast("double") / 1e12
    szz = F.col("szz").cast("double") / 1e12
    cxx = sxx - sx * sx / kd
    cxz = sxz - sx * sz / kd
    czz = szz - sz * sz / kd
    slope = cxz / cxx
    b0 = (sz - slope * sx) / kd
    rss = czz - cxz * cxz / cxx
    s2 = rss / (kd - 2.0)
    seb0 = F.sqrt(s2 * (1.0 / kd + (sx / kd) * (sx / kd) / cxx))
    t0 = b0 / seb0
    return agg.filter((F.col("k") >= 4) & (cxx > 0) & (rss > 0)).select(
        F.col("k").cast("long").alias("k_studies"),
        F.floor(b0 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "intercept_e4"
        ),
        F.floor(t0 * 10_000 + F.lit(_OFF)).cast("long").alias(
            "t_e4"
        ),
        F.floor(slope * 10_000 + F.lit(_OFF)).cast("long").alias(
            "slope_e4"
        ),
    )


SQL_EGGER = f"""
WITH {_SOURCE_EFFECTS_SQL.strip()}
, pts AS (
  SELECT CAST(floor(theta / sqrt(se2) * 1e6 + {_OFF}) AS BIGINT) AS z6,
         CAST(floor(1.0 / sqrt(se2) * 1e6 + {_OFF}) AS BIGINT) AS x6
  FROM eff
), agg AS (
  SELECT count(*) AS k,
         CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(z6) AS BIGINT) AS sz,
         CAST(sum(x6 * z6) AS BIGINT) AS sxz,
         CAST(sum(x6 * x6) AS BIGINT) AS sxx,
         CAST(sum(z6 * z6) AS BIGINT) AS szz
  FROM pts
), m AS (
  SELECT k, CAST(sx AS DOUBLE) / 1e6 AS sx,
         CAST(sz AS DOUBLE) / 1e6 AS sz,
         CAST(sxz AS DOUBLE) / 1e12 AS sxz,
         CAST(sxx AS DOUBLE) / 1e12 AS sxx,
         CAST(szz AS DOUBLE) / 1e12 AS szz
  FROM agg
), d AS (
  SELECT k, sx, sz,
         sxx - sx * sx / k AS cxx,
         sxz - sx * sz / k AS cxz,
         szz - sz * sz / k AS czz
  FROM m
), f AS (
  SELECT k, sx, sz, cxx, czz,
         cxz / cxx AS slope,
         (sz - cxz / cxx * sx) / k AS b0,
         czz - cxz * cxz / cxx AS rss
  FROM d
)
SELECT CAST(k AS BIGINT) AS k_studies,
       CAST(floor(b0 * 10000 + {_OFF}) AS BIGINT) AS intercept_e4,
       CAST(floor(b0 / sqrt((rss / (k - 2.0))
                            * (1.0 / k + (sx / k) * (sx / k) / cxx))
                  * 10000 + {_OFF}) AS BIGINT) AS t_e4,
       CAST(floor(slope * 10000 + {_OFF}) AS BIGINT) AS slope_e4
FROM f
WHERE k >= 4 AND cxx > 0 AND rss > 0
"""

QUERIES["egger_test"] = q_egger_test
ORACLE_SQL["egger_test"] = SQL_EGGER


# ---------------------------------------------------------------------------
# loo_meta_influence — leave-one-out fixed-effect pooled estimates
# ---------------------------------------------------------------------------
# theta_(-i) = (sum w theta - w_i theta_i) / (sum w - w_i); the totals
# broadcast, so influence is a per-study closed form.  w theta and w
# terms are e6-floored so the totals are exact integers.


def q_loo_meta_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    eff = _source_effects(spark, sf_dir)
    eff = eff.withColumn(
        "w6", F.floor(1.0 / F.col("se2") * 1e6 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "wt6",
        F.floor(F.col("theta") / F.col("se2") * 1e6 + F.lit(_OFF)).cast(
            "long"
        ),
    )
    tot = eff.agg(
        F.sum("w6").alias("swt"), F.sum("wt6").alias("swtt"),
        F.count(F.lit(1)).alias("k"),
    )
    j = eff.crossJoin(F.broadcast(tot))
    pooled = F.col("swtt").cast("double") / F.col("swt").cast("double")
    loo = (
        (F.col("swtt") - F.col("wt6")).cast("double")
        / (F.col("swt") - F.col("w6")).cast("double")
    )
    return j.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.floor(pooled * 10_000 + F.lit(_OFF)).cast("long").alias(
            "pooled_e4"
        ),
        F.floor(loo * 10_000 + F.lit(_OFF)).cast("long").alias(
            "loo_e4"
        ),
        F.floor((loo - pooled) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("influence_e4"),
    ).orderBy("source")


SQL_LOO_META = f"""
WITH {_SOURCE_EFFECTS_SQL.strip()}
, w AS (
  SELECT source, n,
         CAST(floor(1.0 / se2 * 1e6 + {_OFF}) AS BIGINT) AS w6,
         CAST(floor(theta / se2 * 1e6 + {_OFF}) AS BIGINT) AS wt6
  FROM eff
), wtot AS (
  SELECT CAST(sum(w6) AS BIGINT) AS swt,
         CAST(sum(wt6) AS BIGINT) AS swtt,
         count(*) AS k
  FROM w
)
SELECT w.source, CAST(w.n AS BIGINT) AS n_docs,
       CAST(floor(CAST(t.swtt AS DOUBLE) / t.swt * 10000 + {_OFF})
            AS BIGINT) AS pooled_e4,
       CAST(floor(CAST(t.swtt - w.wt6 AS DOUBLE) / (t.swt - w.w6)
                  * 10000 + {_OFF}) AS BIGINT) AS loo_e4,
       CAST(floor((CAST(t.swtt - w.wt6 AS DOUBLE) / (t.swt - w.w6)
                   - CAST(t.swtt AS DOUBLE) / t.swt) * 10000 + {_OFF})
            AS BIGINT) AS influence_e4
FROM w, wtot t
ORDER BY w.source
"""

QUERIES["loo_meta_influence"] = q_loo_meta_influence
ORACLE_SQL["loo_meta_influence"] = SQL_LOO_META


# ---------------------------------------------------------------------------
# dirichlet_precision_mom — Dirichlet-multinomial precision of the
# daily event-type composition (Mosimann 1962 method of moments)
# ---------------------------------------------------------------------------
# Daily proportions p_dt; per type: pbar_t, var_t across days;
# alpha0_t = pbar(1-pbar)/var - 1; alpha0 = unweighted mean across
# types; alpha_t = alpha0 * pbar_t.  Daily proportions are e6-floored
# so the cross-day moments are exact integers.


def q_dirichlet_precision_mom(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = ev.groupBy(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("c"))
    dtot = day.groupBy("day").agg(F.sum("c").alias("t"))
    p = day.join(F.broadcast(dtot), "day").select(
        "event_type",
        "day",
        F.floor(
            F.col("c").cast("double") / F.col("t").cast("double") * 1e6
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("p6"),
    )
    per = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("p6").alias("sp"),
        F.sum(F.col("p6") * F.col("p6")).alias("spp"),
    )
    ndd = F.col("nd").cast("double")
    pbar = F.col("sp").cast("double") / ndd / 1e6
    var = (
        (
            F.col("spp").cast("double")
            - F.col("sp").cast("double") * F.col("sp").cast("double")
            / ndd
        )
        / (ndd - 1.0)
        / 1e12
    )
    a0t = pbar * (1.0 - pbar) / var - 1.0
    per = per.select(
        "event_type", "nd", pbar.alias("pbar"), a0t.alias("a0t")
    ).filter((F.col("nd") >= 3) & (var > 0))
    a0 = per.agg(
        F.floor(
            F.sum(F.floor(F.col("a0t") * 1e6 + F.lit(_OFF)).cast("long"))
            .cast("double")
            / F.count(F.lit(1))
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("a06")
    )
    out = per.crossJoin(F.broadcast(a0))
    alpha_t = F.col("a06").cast("double") / 1e6 * F.col("pbar")
    return out.select(
        "event_type",
        F.col("nd").cast("long").alias("n_days"),
        F.floor(F.col("pbar") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("pbar_e6"),
        F.floor(
            F.col("a06").cast("double") / 1e6 * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("alpha0_e4"),
        F.floor(alpha_t * 10_000 + F.lit(_OFF)).cast("long").alias(
            "alpha_t_e4"
        ),
    ).orderBy("event_type")


SQL_DIRICHLET = f"""
WITH day AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), dtot AS (
  SELECT day, CAST(sum(c) AS BIGINT) AS t FROM day GROUP BY 1
), p AS (
  SELECT d.event_type, d.day,
         CAST(floor(CAST(d.c AS DOUBLE) / t.t * 1e6 + {_OFF})
              AS BIGINT) AS p6
  FROM day d JOIN dtot t ON t.day = d.day
), per AS (
  SELECT event_type, count(*) AS nd,
         CAST(sum(p6) AS BIGINT) AS sp,
         CAST(sum(p6 * p6) AS BIGINT) AS spp
  FROM p GROUP BY 1
), m AS (
  SELECT event_type, nd,
         CAST(sp AS DOUBLE) / nd / 1e6 AS pbar,
         (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / nd)
         / (nd - 1.0) / 1e12 AS var
  FROM per
), m2 AS (
  SELECT event_type, nd, pbar,
         pbar * (1.0 - pbar) / var - 1.0 AS a0t
  FROM m
  WHERE nd >= 3 AND var > 0
), a0 AS (
  SELECT CAST(floor(CAST(sum(CAST(floor(a0t * 1e6 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS a06
  FROM m2
)
SELECT m2.event_type, CAST(m2.nd AS BIGINT) AS n_days,
       CAST(floor(m2.pbar * 1000000 + {_OFF}) AS BIGINT) AS pbar_e6,
       CAST(floor(CAST(a.a06 AS DOUBLE) / 1e6 * 10000 + {_OFF})
            AS BIGINT) AS alpha0_e4,
       CAST(floor(CAST(a.a06 AS DOUBLE) / 1e6 * m2.pbar * 10000
                  + {_OFF}) AS BIGINT) AS alpha_t_e4
FROM m2, a0 a
ORDER BY m2.event_type
"""

QUERIES["dirichlet_precision_mom"] = q_dirichlet_precision_mom
ORACLE_SQL["dirichlet_precision_mom"] = SQL_DIRICHLET


# ===========================================================================
# Battery T — distributed-systems audits: rendezvous (HRW) hashing
# shard balance with the minimal-movement invariant, and an empirical
# Bloom-filter false-positive-rate audit against the analytic rate
# (the operational complement of bloom_decontaminate / hash_audit).
# ===========================================================================


# ---------------------------------------------------------------------------
# rendezvous_hashing_balance — highest-random-weight shard assignment
# of documents to 10 shards, plus the movement fraction when an 11th
# shard joins
# ---------------------------------------------------------------------------
# shard(key) = argmax_b h(key, b) with the integer mix
# h = sq((key * 2654435761 + b * 40503 + 2246822519) % p) % p,
# p = 1e9+7 — the quadratic mix breaks the linearity in b that a
# plain LCG leaves (argmax of a linear-in-b hash is nearly always
# the top bucket; caught when the first draft yielded 2 shards).  HRW guarantees
# only keys whose argmax is the NEW shard move: measured movement
# should be ~1/11 of keys.  Reports per-shard counts, chi2 balance,
# and the movement fraction.


def q_rendezvous_hashing_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    docs = _documents(spark, sf_dir).select("doc_id")
    spark_ = docs.sparkSession
    b10 = spark_.range(0, 10).select(F.col("id").alias("b"))
    b11 = spark_.range(0, 11).select(F.col("id").alias("b"))
    t_lin = (
        F.col("doc_id") * F.lit(2654435761)
        + F.col("b") * F.lit(40503)
        + F.lit(2246822519)
    ) % F.lit(1_000_000_007)
    h = (t_lin * t_lin) % F.lit(1_000_000_007)

    def assign(buckets):
        j = docs.crossJoin(F.broadcast(buckets)).withColumn("h", h)
        return j.groupBy("doc_id").agg(
            F.max_by(F.col("b"), F.struct(F.col("h"), F.col("b"))).alias(
                "shard"
            )
        )

    a10 = assign(b10)
    a11 = assign(b11).select(
        F.col("doc_id"), F.col("shard").alias("shard11")
    )
    moved = a10.join(a11, "doc_id").select(
        "shard",
        (F.col("shard") != F.col("shard11")).cast("long").alias("mv"),
    )
    per = moved.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("mv").alias("n_moved"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("nt"), F.count(F.lit(1)).alias("k")
    )
    j2 = per.crossJoin(F.broadcast(tot))
    e = F.col("nt").cast("double") / F.col("k").cast("double")
    chi_term = (F.col("n_docs").cast("double") - e) * (
        F.col("n_docs").cast("double") - e
    ) / e
    j2 = j2.withColumn(
        "chi6", F.floor(chi_term * 1e6 + F.lit(_OFF)).cast("long")
    )
    return j2.select(
        F.col("shard").cast("long").alias("shard"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.floor(
            F.col("n_moved").cast("double")
            / F.col("n_docs").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("moved_frac_e6"),
        F.col("chi6").alias("chi2_term_e6"),
    ).orderBy("shard")


SQL_RENDEZVOUS = f"""
WITH b10 AS (
  SELECT unnest(generate_series(0, 9)) AS b
), b11 AS (
  SELECT unnest(generate_series(0, 10)) AS b
), a10 AS (
  SELECT doc_id, b AS shard
  FROM (
    SELECT d.doc_id, b.b,
           row_number() OVER (
             PARTITION BY d.doc_id
             ORDER BY (((d.doc_id * 2654435761 + b.b * 40503
                        + 2246822519) % 1000000007)
                     * ((d.doc_id * 2654435761 + b.b * 40503
                         + 2246822519) % 1000000007))
                    % 1000000007 DESC, b.b DESC) AS r
    FROM documents d, b10 b
  ) t WHERE r = 1
), a11 AS (
  SELECT doc_id, b AS shard11
  FROM (
    SELECT d.doc_id, b.b,
           row_number() OVER (
             PARTITION BY d.doc_id
             ORDER BY (((d.doc_id * 2654435761 + b.b * 40503
                        + 2246822519) % 1000000007)
                     * ((d.doc_id * 2654435761 + b.b * 40503
                         + 2246822519) % 1000000007))
                    % 1000000007 DESC, b.b DESC) AS r
    FROM documents d, b11 b
  ) t WHERE r = 1
), mv AS (
  SELECT a.shard,
         CASE WHEN a.shard <> c.shard11 THEN 1 ELSE 0 END AS mv
  FROM a10 a JOIN a11 c ON c.doc_id = a.doc_id
), per AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(mv) AS BIGINT) AS n_moved
  FROM mv GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS nt, count(*) AS k FROM per
)
SELECT CAST(p.shard AS BIGINT) AS shard, p.n_docs,
       CAST(floor(CAST(p.n_moved AS DOUBLE) / p.n_docs * 1000000
                  + {_OFF}) AS BIGINT) AS moved_frac_e6,
       CAST(floor((p.n_docs - CAST(t.nt AS DOUBLE) / t.k)
                  * (p.n_docs - CAST(t.nt AS DOUBLE) / t.k)
                  / (CAST(t.nt AS DOUBLE) / t.k) * 1e6 + {_OFF})
            AS BIGINT) AS chi2_term_e6
FROM per p, tot t
ORDER BY shard
"""

QUERIES["rendezvous_hashing_balance"] = q_rendezvous_hashing_balance
ORACLE_SQL["rendezvous_hashing_balance"] = SQL_RENDEZVOUS


# ---------------------------------------------------------------------------
# bloom_fpr_audit — empirical vs analytic Bloom false-positive rate
# ---------------------------------------------------------------------------
# Even doc_ids are inserted (k = 3 integer hash positions in m = 2^14
# bits); odd doc_ids probe.  A probe is a false positive when all 3 of
# its positions are set.  Analytic rate (1 - exp(-k n/m))^k uses the
# same n, m, k.  All hashing is BIGINT arithmetic.


def q_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    m = 16_384
    docs = _documents(spark, sf_dir).select("doc_id")
    ins = docs.filter(F.col("doc_id") % 2 == 0)
    probe = docs.filter(F.col("doc_id") % 2 == 1)
    ks = docs.sparkSession.range(0, 3).select(F.col("id").alias("k"))
    t_lin = (
        F.col("doc_id") * F.lit(2654435761)
        + F.col("k") * F.lit(97_003)
        + F.lit(2246822519)
    ) % F.lit(1_000_000_007)
    pos = ((t_lin * t_lin) % F.lit(1_000_000_007)) % F.lit(m)
    bits = (
        ins.crossJoin(F.broadcast(ks))
        .select(pos.alias("pos"))
        .distinct()
    )
    n_bits = bits.count()  # bounded: <= m rows
    probe_pos = probe.crossJoin(F.broadcast(ks)).select(
        "doc_id", pos.alias("pos")
    )
    hit = probe_pos.join(bits, "pos").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nhit")
    )
    fp = hit.filter(F.col("nhit") == 3)
    counts = probe.agg(F.count(F.lit(1)).alias("np")).crossJoin(
        fp.agg(F.count(F.lit(1)).alias("nfp"))
    ).crossJoin(ins.agg(F.count(F.lit(1)).alias("ni")))
    nd = F.col("np").cast("double")
    fpr = F.col("nfp").cast("double") / nd
    load = 3.0 * F.col("ni").cast("double") / float(m)
    analytic = (
        (1.0 - F.exp(-load)) * (1.0 - F.exp(-load)) * (1.0 - F.exp(-load))
    )
    return counts.select(
        F.col("ni").cast("long").alias("n_inserted"),
        F.col("np").cast("long").alias("n_probes"),
        F.lit(n_bits).cast("long").alias("n_bits_set"),
        F.floor(fpr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "fpr_e6"
        ),
        F.floor(analytic * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("fpr_analytic_e6"),
    )


SQL_BLOOM_FPR = f"""
WITH ks AS (
  SELECT unnest(generate_series(0, 2)) AS k
), ins AS (
  SELECT doc_id FROM documents WHERE doc_id % 2 = 0
), probe AS (
  SELECT doc_id FROM documents WHERE doc_id % 2 = 1
), bits AS (
  SELECT DISTINCT ((((i.doc_id * 2654435761 + k.k * 97003
                      + 2246822519) % 1000000007)
                    * ((i.doc_id * 2654435761 + k.k * 97003
                        + 2246822519) % 1000000007))
                   % 1000000007) % 16384 AS pos
  FROM ins i, ks k
), ppos AS (
  SELECT p.doc_id,
         ((((p.doc_id * 2654435761 + k.k * 97003
             + 2246822519) % 1000000007)
           * ((p.doc_id * 2654435761 + k.k * 97003
               + 2246822519) % 1000000007))
          % 1000000007) % 16384 AS pos
  FROM probe p, ks k
), hit AS (
  SELECT pp.doc_id, count(*) AS nhit
  FROM ppos pp JOIN bits b ON b.pos = pp.pos
  GROUP BY 1
), fp AS (
  SELECT count(*) AS nfp FROM hit WHERE nhit = 3
), counts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM ins) AS ni,
         (SELECT CAST(count(*) AS BIGINT) FROM probe) AS np,
         (SELECT CAST(count(*) AS BIGINT) FROM bits) AS nbits,
         (SELECT CAST(nfp AS BIGINT) FROM fp) AS nfp
)
SELECT ni AS n_inserted, np AS n_probes, nbits AS n_bits_set,
       CAST(floor(CAST(nfp AS DOUBLE) / np * 1000000 + {_OFF})
            AS BIGINT) AS fpr_e6,
       CAST(floor((1.0 - exp(-(3.0 * ni / 16384.0)))
                  * (1.0 - exp(-(3.0 * ni / 16384.0)))
                  * (1.0 - exp(-(3.0 * ni / 16384.0))) * 1000000
                  + {_OFF}) AS BIGINT) AS fpr_analytic_e6
FROM counts
"""

QUERIES["bloom_fpr_audit"] = q_bloom_fpr_audit
ORACLE_SQL["bloom_fpr_audit"] = SQL_BLOOM_FPR


# ===========================================================================
# Battery U — two-sample standardized effect sizes, the Wagenmakers
# BIC Bayes-factor approximation, and arcsine-law lead statistics of
# the day-night random walk.
# ===========================================================================


# ---------------------------------------------------------------------------
# standardized_effect_sizes — Cohen's d, Hedges' g, Glass's Delta,
# and the common-language effect size for day vs night values
# ---------------------------------------------------------------------------
# d = (m1 - m2)/s_pooled; g = d J with J = 1 - 3/(4 df - 1)
# (Hedges' approximation); Glass Delta = (m1 - m2)/s_night;
# CLES = Phi(d / sqrt2) via the shared A&S erf twin (sign-folded).


def q_standardized_effect_sizes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from diive_spark.queries_stats16 import _erf

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        "event_type",
        F.when(F.hour("ts").between(8, 19), 1).otherwise(0).alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    day = g.filter(F.col("grp") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("ss").alias("ss1"),
    )
    night = g.filter(F.col("grp") == 0).select(
        "event_type",
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("ss").alias("ss2"),
    )
    j = day.join(night, "event_type")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1 / 100.0
    m2 = F.col("s2").cast("double") / n2 / 100.0
    v1 = (
        (
            F.col("ss1").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double") / n1
        )
        / (n1 - 1.0)
        / 10_000.0
    )
    v2 = (
        (
            F.col("ss2").cast("double")
            - F.col("s2").cast("double") * F.col("s2").cast("double") / n2
        )
        / (n2 - 1.0)
        / 10_000.0
    )
    sp = F.sqrt(
        ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0)
    )
    d = (m1 - m2) / sp
    jf = 1.0 - 3.0 / (4.0 * (n1 + n2 - 2.0) - 1.0)
    gg = d * jf
    glass = (m1 - m2) / F.sqrt(v2)
    zz = d * F.lit(0.7071067811865476)
    cles = F.when(
        zz >= 0, 0.5 * (1.0 + _erf(zz * 0.7071067811865476))
    ).otherwise(0.5 * (1.0 - _erf(-zz * 0.7071067811865476)))
    return (
        j.filter((F.col("n1") >= 3) & (F.col("n2") >= 3) & (v2 > 0))
        .select(
            "event_type",
            (F.col("n1") + F.col("n2")).cast("long").alias("n"),
            F.floor(d * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "cohens_d_e6"
            ),
            F.floor(gg * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "hedges_g_e6"
            ),
            F.floor(glass * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("glass_delta_e6"),
            F.floor(cles * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("cles_e6"),
        )
        .orderBy("event_type")
    )


def _effsize_sql() -> str:
    from diive_spark.queries_stats16 import _erf_sql

    z = "((m1 - m2) / sp * 0.7071067811865476)"
    cles = (
        f"CASE WHEN {z} >= 0"
        f" THEN 0.5 * (1.0 + {_erf_sql(z + ' * 0.7071067811865476')})"
        f" ELSE 0.5 * (1.0 - {_erf_sql('-' + z + ' * 0.7071067811865476')})"
        f" END"
    )
    return f"""
WITH g AS (
  SELECT event_type,
         CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ss
  FROM events GROUP BY 1, 2
), j AS (
  SELECT d.event_type,
         d.n AS n1, d.s AS s1, d.ss AS ss1,
         x.n AS n2, x.s AS s2, x.ss AS ss2
  FROM g d JOIN g x ON x.event_type = d.event_type
  WHERE d.grp = 1 AND x.grp = 0
), m AS (
  SELECT event_type, n1, n2,
         CAST(s1 AS DOUBLE) / n1 / 100.0 AS m1,
         CAST(s2 AS DOUBLE) / n2 / 100.0 AS m2,
         (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
         / (n1 - 1.0) / 10000.0 AS v1,
         (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
         / (n2 - 1.0) / 10000.0 AS v2
  FROM j
), f AS (
  SELECT event_type, n1, n2, m1, m2, v1, v2,
         sqrt(((n1 - 1.0) * v1 + (n2 - 1.0) * v2)
              / (n1 + n2 - 2.0)) AS sp
  FROM m
  WHERE n1 >= 3 AND n2 >= 3 AND v2 > 0
)
SELECT event_type, CAST(n1 + n2 AS BIGINT) AS n,
       CAST(floor((m1 - m2) / sp * 1000000 + {_OFF})
            AS BIGINT) AS cohens_d_e6,
       CAST(floor((m1 - m2) / sp
                  * (1.0 - 3.0 / (4.0 * (n1 + n2 - 2.0) - 1.0))
                  * 1000000 + {_OFF}) AS BIGINT) AS hedges_g_e6,
       CAST(floor((m1 - m2) / sqrt(v2) * 1000000 + {_OFF})
            AS BIGINT) AS glass_delta_e6,
       CAST(floor({cles} * 1000000 + {_OFF}) AS BIGINT) AS cles_e6
FROM f
ORDER BY event_type
"""


QUERIES["standardized_effect_sizes"] = q_standardized_effect_sizes
ORACLE_SQL["standardized_effect_sizes"] = _effsize_sql()


# ---------------------------------------------------------------------------
# bic_bayes_factor — Wagenmakers (2007) BIC approximation to the
# Bayes factor for the day-night mean difference
# ---------------------------------------------------------------------------
# BF01 ~ exp((BIC1 - BIC0)/2) with BIC_i = n ln(RSS_i/n) + k_i ln n;
# RSS0 = total SS, RSS1 = within-groups SS — both exact-integer
# derived.  Reports ln BF10 (positive favours a real difference).


def q_bic_bayes_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        "event_type",
        F.when(F.hour("ts").between(8, 19), 1).otherwise(0).alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    tot = g.groupBy("event_type").agg(
        F.sum("n").alias("nt"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        F.sum(
            F.floor(
                F.col("s").cast("double")
                * F.col("s").cast("double")
                / F.col("n")
                * 1e6
                + F.lit(_OFF)
            ).cast("long")
        ).alias("bg6"),
        F.count(F.lit(1)).alias("k"),
    )
    nt = F.col("nt").cast("double")
    rss0 = (
        F.col("sst").cast("double")
        - F.col("st").cast("double") * F.col("st").cast("double") / nt
    )
    rss1 = F.col("sst").cast("double") - F.col("bg6").cast("double") / 1e6
    lnbf10 = (
        nt / 2.0 * (F.log(rss0 / nt) - F.log(rss1 / nt))
        - 0.5 * F.log(nt)
    )
    return (
        tot.filter((F.col("k") == 2) & (rss1 > 0) & (rss0 > 0))
        .select(
            "event_type",
            F.col("nt").cast("long").alias("n"),
            F.floor(lnbf10 * 10_000 + F.lit(_OFF)).cast("long").alias(
                "ln_bf10_e4"
            ),
        )
        .orderBy("event_type")
    )


SQL_BIC_BF = f"""
WITH g AS (
  SELECT event_type,
         CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ss
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         CAST(sum(n) AS BIGINT) AS nt,
         CAST(sum(s) AS BIGINT) AS st,
         CAST(sum(ss) AS BIGINT) AS sst,
         CAST(sum(CAST(floor(CAST(s AS DOUBLE) * s / n * 1e6 + {_OFF})
                       AS BIGINT)) AS BIGINT) AS bg6,
         count(*) AS k
  FROM g GROUP BY 1
), m AS (
  SELECT event_type, nt, k,
         CAST(sst AS DOUBLE)
           - CAST(st AS DOUBLE) * st / nt AS rss0,
         CAST(sst AS DOUBLE) - CAST(bg6 AS DOUBLE) / 1e6 AS rss1
  FROM tot
)
SELECT event_type, CAST(nt AS BIGINT) AS n,
       CAST(floor((nt / 2.0 * (ln(rss0 / nt) - ln(rss1 / nt))
                   - 0.5 * ln(CAST(nt AS DOUBLE))) * 10000 + {_OFF})
            AS BIGINT) AS ln_bf10_e4
FROM m
WHERE k = 2 AND rss1 > 0 AND rss0 > 0
ORDER BY event_type
"""

QUERIES["bic_bayes_factor"] = q_bic_bayes_factor
ORACLE_SQL["bic_bayes_factor"] = SQL_BIC_BF


# ---------------------------------------------------------------------------
# arcsine_lead_time — Levy arcsine-law statistics of the day-minus-
# night cumulative random walk over days
# ---------------------------------------------------------------------------
# S_d = cumulative (day count - night count); reports the fraction of
# days in positive lead (arcsine-distributed under symmetry), the
# number of lead changes, and the last zero-crossing position
# fraction.


def q_arcsine_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(
            F.when(F.hour("ts").between(8, 19), 1).otherwise(-1)
        ).alias("step")
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    wn = Window.partitionBy("event_type")
    s = day.withColumn("cum", F.sum("step").over(wo))
    s = s.withColumn("prev", F.lag("cum").over(wo))
    s = s.withColumn("i", F.row_number().over(wo)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    lead_pos = (F.col("cum") > 0).cast("long")
    sign_now = F.signum(F.col("cum").cast("double"))
    sign_prev = F.signum(F.col("prev").cast("double"))
    change = (
        F.col("prev").isNotNull()
        & (sign_now * sign_prev < 0)
    ).cast("long")
    zerox = F.when(F.col("cum") == 0, F.col("i")).otherwise(None)
    agg = s.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(lead_pos).alias("npos"),
        F.sum(change).alias("nchg"),
        F.max(zerox).alias("lastzero"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(
            F.col("npos").cast("double") / nd * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("lead_frac_e6"),
        F.col("nchg").cast("long").alias("n_lead_changes"),
        F.coalesce(
            F.floor(
                F.col("lastzero").cast("double") / nd * 1_000_000
                + F.lit(_OFF)
            ).cast("long"),
            F.lit(0),
        ).alias("last_zero_frac_e6"),
    ).orderBy("event_type")


SQL_ARCSINE = f"""
WITH day AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(sum(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
                       THEN 1 ELSE -1 END) AS BIGINT) AS step
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, day,
         CAST(sum(step) OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS cum,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS i,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM day
), s2 AS (
  SELECT *,
         lag(cum) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM s
), agg AS (
  SELECT event_type, max(n) AS n,
         CAST(sum(CASE WHEN cum > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS npos,
         CAST(sum(CASE WHEN prev IS NOT NULL
                        AND sign(cum) * sign(prev) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS nchg,
         max(CASE WHEN cum = 0 THEN i ELSE NULL END) AS lastzero
  FROM s2 GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(CAST(npos AS DOUBLE) / n * 1000000 + {_OFF})
            AS BIGINT) AS lead_frac_e6,
       nchg AS n_lead_changes,
       coalesce(CAST(floor(CAST(lastzero AS DOUBLE) / n * 1000000
                           + {_OFF}) AS BIGINT), 0)
         AS last_zero_frac_e6
FROM agg
ORDER BY event_type
"""

QUERIES["arcsine_lead_time"] = q_arcsine_lead_time
ORACLE_SQL["arcsine_lead_time"] = SQL_ARCSINE


# ===========================================================================
# Battery V — robust location M-estimators: Huber and Tukey biweight,
# each by two unrolled IRLS steps from (median, MAD).  Medians ride
# the value-domain cumulative (lower-median convention: smallest v
# with 2*cum_inclusive >= n); per-value weights are e9-floored so the
# weighted sums are exact integers.
# ===========================================================================


def _median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, med, mad) from the centi-value domain."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    cum = cnt.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(wn)
    )
    med = cum.filter(2 * F.col("cum") >= F.col("n")).groupBy(
        "event_type"
    ).agg(F.min("v").alias("med"), F.max("n").alias("n"))
    dev = cnt.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("v") - F.col("med")).alias("d"),
        "c",
    ).groupBy("event_type", "d").agg(F.sum("c").alias("c"))
    wd = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum2 = dev.withColumn("cum", F.sum("c").over(wd)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("event_type"))
    )
    mad = cum2.filter(2 * F.col("cum") >= F.col("n")).groupBy(
        "event_type"
    ).agg(F.min("d").alias("mad"))
    return med.join(mad, "event_type")


_MEDIAN_MAD_SQL = f"""
cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT *,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumv,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM cnt
), med AS (
  SELECT event_type, min(v) AS med, max(n) AS n
  FROM cum WHERE 2 * cumv >= n GROUP BY 1
), dev AS (
  SELECT c.event_type, abs(c.v - m.med) AS d,
         CAST(sum(c.c) AS BIGINT) AS c
  FROM cnt c JOIN med m ON m.event_type = c.event_type
  GROUP BY 1, 2
), cum2 AS (
  SELECT *,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumd,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n2
  FROM dev
), mad AS (
  SELECT event_type, min(d) AS mad
  FROM cum2 WHERE 2 * cumd >= n2 GROUP BY 1
), mm AS (
  SELECT m.event_type, m.n, m.med, a.mad
  FROM med m JOIN mad a ON a.event_type = m.event_type
)
"""


def _irls_location(
    spark: SparkSession, sf_dir: str, flavor: str
) -> DataFrame:
    """Two IRLS steps; flavor 'huber' (c=1.345 sigma) or
    'biweight' (c=4.685 sigma), sigma = 1.4826 MAD."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    mm = _median_mad(spark, sf_dir)
    cmult = 1.345 if flavor == "huber" else 4.685
    mm = mm.select(
        "event_type",
        "n",
        F.col("med").cast("double").alias("mu0"),
        (F.lit(cmult) * 1.4826 * F.col("mad").cast("double")).alias(
            "cc"
        ),
    ).filter(F.col("cc") > 0)

    def step(params, mucol, tag):
        j = cnt.join(F.broadcast(params), "event_type")
        r = F.col("v").cast("double") - F.col(mucol)
        absr = F.abs(r)
        if flavor == "huber":
            wgt = F.when(absr <= F.col("cc"), 1.0).otherwise(
                F.col("cc") / absr
            )
        else:
            u = r / F.col("cc")
            wgt = F.when(
                absr <= F.col("cc"),
                (1.0 - u * u) * (1.0 - u * u),
            ).otherwise(0.0)
        t = j.select(
            "event_type",
            "cc",
            F.floor(
                wgt * F.col("c").cast("double") * F.col("v").cast(
                    "double"
                )
                * 1e6
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("wx6"),
            F.floor(
                wgt * F.col("c").cast("double") * 1e6 + F.lit(_OFF)
            )
            .cast("long")
            .alias("w6"),
        )
        agg = t.groupBy("event_type", "cc").agg(
            F.sum("wx6").alias("swx"), F.sum("w6").alias("sw")
        )
        return agg.select(
            "event_type",
            "cc",
            (
                F.col("swx").cast("double") / F.col("sw").cast("double")
            ).alias(f"mu{tag}"),
        )

    p1 = step(mm.select("event_type", "cc", "mu0"), "mu0", "1")
    p2 = step(p1, "mu1", "2")
    out = p2.join(F.broadcast(mm.select("event_type", "n")), "event_type")
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("mu2") / 100.0 * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("location_e4"),
    ).orderBy("event_type")


def q_huber_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _irls_location(spark, sf_dir, "huber")


def q_biweight_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _irls_location(spark, sf_dir, "biweight")


def _irls_sql(flavor: str) -> str:
    cmult = "1.345" if flavor == "huber" else "4.685"
    if flavor == "huber":
        wgt = (
            "CASE WHEN abs(c.v - p.{mu}) <= p.cc THEN 1.0"
            " ELSE p.cc / abs(c.v - p.{mu}) END"
        )
    else:
        wgt = (
            "CASE WHEN abs(c.v - p.{mu}) <= p.cc"
            " THEN (1.0 - ((c.v - p.{mu}) / p.cc)"
            "        * ((c.v - p.{mu}) / p.cc))"
            "      * (1.0 - ((c.v - p.{mu}) / p.cc)"
            "         * ((c.v - p.{mu}) / p.cc))"
            " ELSE 0.0 END"
        )

    def step(prev, mu, tag):
        w = wgt.format(mu=mu)
        return f""", t{tag} AS (
  SELECT c.event_type, p.cc,
         CAST(floor({w} * c.c * c.v * 1e6 + {{OFF}}) AS BIGINT) AS wx6,
         CAST(floor({w} * c.c * 1e6 + {{OFF}}) AS BIGINT) AS w6
  FROM cnt c JOIN {prev} p ON p.event_type = c.event_type
), p{tag} AS (
  SELECT event_type, cc,
         CAST(sum(wx6) AS DOUBLE) / sum(w6) AS mu{tag}
  FROM t{tag} GROUP BY 1, 2
)"""

    sql = f"""
WITH {{MEDMAD}}
, p0 AS (
  SELECT event_type, n, CAST(med AS DOUBLE) AS mu0,
         {cmult} * 1.4826 * mad AS cc
  FROM mm WHERE {cmult} * 1.4826 * mad > 0
){step("p0", "mu0", "1")}{step("p1", "mu1", "2")}
SELECT p2.event_type, CAST(p0.n AS BIGINT) AS n,
       CAST(floor(p2.mu2 / 100.0 * 10000 + {{OFF}}) AS BIGINT)
         AS location_e4
FROM p2 JOIN p0 ON p0.event_type = p2.event_type
ORDER BY p2.event_type
"""
    return sql.replace("{MEDMAD}", _MEDIAN_MAD_SQL.strip()).replace(
        "{OFF}", str(_OFF)
    )


# NOTE: a Huber location M-estimator already ships in
# queries_stats11 (registry name huber_location); this battery keeps
# only the redescending biweight flavour (the _irls_location scaffold
# supports both, exercised by flavor='huber' in tests if needed).
QUERIES["biweight_location"] = q_biweight_location
ORACLE_SQL["biweight_location"] = _irls_sql("biweight")


# ===========================================================================
# Battery W — actuarial/scorecard wave 2: Mack (1993) standard errors
# for the chain-ladder ultimates, and Weight-of-Evidence /
# Information-Value predictor screening.
# ===========================================================================


# ---------------------------------------------------------------------------
# mack_chain_ladder_se — distribution-free chain-ladder prediction
# error (Mack 1993) on the weekly purchase triangle
# ---------------------------------------------------------------------------
# Rides the queries_stats15 chain_ladder triangle (4 cohorts x 4
# lags): sigma^2_j = 1/(n_j-1) sum_i C_ij (C_{i,j+1}/C_ij - f_j)^2,
# with Mack's tail convention sigma^2_2 = min(sigma_1^4/sigma_0^2,
# sigma_0^2, sigma_1^2); mse_i = Ult_i^2 sum_{j>=L_i} sigma^2_j/f_j^2
# (1/C^_ij + 1/S_j) unrolled over the <= 3 remaining lags.  Per-lag
# sigma terms are e6-floored before the cross-cohort sums.


def q_mack_chain_ladder_se(
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
    pur = ev.filter(F.col("event_type") == "purchase").join(
        first, "user_id"
    )
    # accident "years" = user buckets with a SIMULATED run-off cut
    # (cohort k observed only through lag 3-k) — the sf0.01 calendar
    # puts every user in week 0, which collapses the natural triangle
    # to one fully-developed row and makes every Mack term vanish.
    t = pur.select(
        (F.col("user_id") % 4).cast("int").alias("cohort"),
        F.floor((F.col("day") - F.col("d0")) / 7).cast("int").alias(
            "lag"
        ),
    ).filter(F.col("lag") <= 3)
    inc = t.groupBy("cohort", "lag").agg(F.count(F.lit(1)).alias("x"))
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("lag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
    fpairs = a.join(
        b,
        (F.col("ci") == F.col("ci2"))
        & (F.col("lj2") == F.col("lj") + 1),
    )
    f = fpairs.groupBy("lj").agg(
        F.sum("cj2").alias("num"),
        F.sum("cj").alias("den"),
        F.count(F.lit(1)).alias("nj"),
    ).withColumn(
        "f", F.col("num").cast("double") / F.col("den").cast("double")
    )
    sig = fpairs.join(F.broadcast(f.select("lj", "f")), "lj")
    dev = (
        F.col("cj2").cast("double") / F.col("cj").cast("double")
        - F.col("f")
    )
    sig = sig.withColumn(
        "t6",
        F.floor(
            F.col("cj").cast("double") * dev * dev * 1e6 + F.lit(_OFF)
        ).cast("long"),
    )
    s2 = sig.groupBy("lj").agg(
        F.sum("t6").alias("st6"), F.count(F.lit(1)).alias("nj")
    ).withColumn(
        "s2",
        F.when(
            F.col("nj") >= 2,
            F.col("st6").cast("double") / 1e6 / (F.col("nj") - 1.0),
        ).otherwise(None),
    )

    def pick(df, col, lj, alias):
        return df.filter(F.col("lj") == lj).select(
            F.col(col).alias(alias)
        )

    f0 = pick(f, "f", 0, "f0")
    f1 = pick(f, "f", 1, "f1")
    f2 = pick(f, "f", 2, "f2")
    d0 = pick(f, "den", 0, "den0")
    d1 = pick(f, "den", 1, "den1")
    d2 = pick(f, "den", 2, "den2")
    s0 = pick(s2, "s2", 0, "s20")
    s1 = pick(s2, "s2", 1, "s21")
    latest = cum.filter(F.col("lag") == 3 - F.col("cohort"))
    j = (
        latest.crossJoin(F.broadcast(f0))
        .crossJoin(F.broadcast(f1))
        .crossJoin(F.broadcast(f2))
        .crossJoin(F.broadcast(d0))
        .crossJoin(F.broadcast(d1))
        .crossJoin(F.broadcast(d2))
        .crossJoin(F.broadcast(s0))
        .crossJoin(F.broadcast(s1))
    )
    s22 = F.least(
        F.col("s21") * F.col("s21") / F.col("s20"),
        F.col("s20"),
        F.col("s21"),
    )
    cd = F.col("c").cast("double")
    chat0 = cd  # value at the latest lag
    # chained estimates at later lags depend on the cohort's latest lag
    ult = (
        cd
        * F.when(F.col("lag") <= 0, F.col("f0")).otherwise(F.lit(1.0))
        * F.when(F.col("lag") <= 1, F.col("f1")).otherwise(F.lit(1.0))
        * F.when(F.col("lag") <= 2, F.col("f2")).otherwise(F.lit(1.0))
    )
    # per-lag terms (sigma_j^2 / f_j^2) * (1/Chat_ij + 1/S_j),
    # included when the cohort still develops through lag j
    chat_j0 = cd
    chat_j1 = F.when(F.col("lag") == 1, cd).otherwise(cd * F.col("f0"))
    chat_j2 = F.when(F.col("lag") == 2, cd).when(
        F.col("lag") == 1, cd * F.col("f1")
    ).otherwise(cd * F.col("f0") * F.col("f1"))
    term0 = F.when(
        F.col("lag") <= 0,
        F.col("s20")
        / (F.col("f0") * F.col("f0"))
        * (1.0 / chat_j0 + 1.0 / F.col("den0").cast("double")),
    ).otherwise(F.lit(0.0))
    term1 = F.when(
        F.col("lag") <= 1,
        F.col("s21")
        / (F.col("f1") * F.col("f1"))
        * (1.0 / chat_j1 + 1.0 / F.col("den1").cast("double")),
    ).otherwise(F.lit(0.0))
    term2 = F.when(
        F.col("lag") <= 2,
        s22
        / (F.col("f2") * F.col("f2"))
        * (1.0 / chat_j2 + 1.0 / F.col("den2").cast("double")),
    ).otherwise(F.lit(0.0))
    mse = ult * ult * (term0 + term1 + term2)
    return j.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("c").cast("long").alias("latest_cum"),
        F.floor(ult * 10_000 + F.lit(_OFF)).cast("long").alias(
            "ultimate_e4"
        ),
        F.floor(F.sqrt(mse) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("mack_se_e4"),
    ).orderBy("cohort")


SQL_MACK = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), first AS (
  SELECT user_id, min(day) AS d0 FROM ev GROUP BY 1
), t AS (
  SELECT CAST(e.user_id % 4 AS INT) AS cohort,
         CAST(floor((e.day - f.d0) / 7.0) AS INT) AS lag
  FROM ev e
  JOIN first f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
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
), fpairs AS (
  SELECT a.cohort AS ci, a.lag AS lj, a.c AS cj, b.c AS cj2
  FROM cum a JOIN cum b
    ON b.cohort = a.cohort AND b.lag = a.lag + 1
), f AS (
  SELECT lj, CAST(sum(cj2) AS BIGINT) AS num,
         CAST(sum(cj) AS BIGINT) AS den,
         count(*) AS nj,
         CAST(sum(cj2) AS DOUBLE) / sum(cj) AS f
  FROM fpairs GROUP BY 1
), sig AS (
  SELECT fp.lj,
         CAST(floor(fp.cj
                    * (CAST(fp.cj2 AS DOUBLE) / fp.cj - f.f)
                    * (CAST(fp.cj2 AS DOUBLE) / fp.cj - f.f) * 1e6
                    + {_OFF}) AS BIGINT) AS t6
  FROM fpairs fp JOIN f ON f.lj = fp.lj
), s2 AS (
  SELECT lj, CASE WHEN count(*) >= 2
                  THEN CAST(sum(t6) AS DOUBLE) / 1e6 / (count(*) - 1.0)
                  ELSE NULL END AS s2
  FROM sig GROUP BY 1
), scal AS (
  SELECT
    (SELECT f FROM f WHERE lj = 0) AS f0,
    (SELECT f FROM f WHERE lj = 1) AS f1,
    (SELECT f FROM f WHERE lj = 2) AS f2,
    (SELECT den FROM f WHERE lj = 0) AS den0,
    (SELECT den FROM f WHERE lj = 1) AS den1,
    (SELECT den FROM f WHERE lj = 2) AS den2,
    (SELECT s2 FROM s2 WHERE lj = 0) AS s20,
    (SELECT s2 FROM s2 WHERE lj = 1) AS s21
), latest AS (
  SELECT * FROM cum WHERE lag = 3 - cohort
), jj AS (
  SELECT l.cohort, l.lag, l.c, s.*,
         least(s.s21 * s.s21 / s.s20, s.s20, s.s21) AS s22,
         l.c * (CASE WHEN l.lag <= 0 THEN s.f0 ELSE 1.0 END)
             * (CASE WHEN l.lag <= 1 THEN s.f1 ELSE 1.0 END)
             * (CASE WHEN l.lag <= 2 THEN s.f2 ELSE 1.0 END) AS ult,
         CAST(l.c AS DOUBLE) AS chat_j0,
         CASE WHEN l.lag = 1 THEN CAST(l.c AS DOUBLE)
              ELSE l.c * s.f0 END AS chat_j1,
         CASE WHEN l.lag = 2 THEN CAST(l.c AS DOUBLE)
              WHEN l.lag = 1 THEN l.c * s.f1
              ELSE l.c * s.f0 * s.f1 END AS chat_j2
  FROM latest l, scal s
), m AS (
  SELECT cohort, c, ult,
         ult * ult *
         ((CASE WHEN lag <= 0
                THEN s20 / (f0 * f0)
                     * (1.0 / chat_j0 + 1.0 / den0)
                ELSE 0.0 END)
          + (CASE WHEN lag <= 1
                  THEN s21 / (f1 * f1)
                       * (1.0 / chat_j1 + 1.0 / den1)
                  ELSE 0.0 END)
          + (CASE WHEN lag <= 2
                  THEN s22 / (f2 * f2)
                       * (1.0 / chat_j2 + 1.0 / den2)
                  ELSE 0.0 END)) AS mse
  FROM jj
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST(c AS BIGINT) AS latest_cum,
       CAST(floor(ult * 10000 + {_OFF}) AS BIGINT) AS ultimate_e4,
       CAST(floor(sqrt(mse) * 10000 + {_OFF}) AS BIGINT)
         AS mack_se_e4
FROM m
ORDER BY cohort
"""

QUERIES["mack_chain_ladder_se"] = q_mack_chain_ladder_se
ORACLE_SQL["mack_chain_ladder_se"] = SQL_MACK


# ---------------------------------------------------------------------------
# woe_information_value — Weight of Evidence / Information Value of
# the click-activity band for predicting heavy purchasers
# ---------------------------------------------------------------------------
# Good = user's purchase count >= the per-user median purchase count
# (median via the count-domain cumulative); predictor bands = fixed
# click-count thresholds (scalable — no global ntile).  WoE_b =
# ln((good_b + 0.5)/(G + 0.5) / ((bad_b + 0.5)/(B + 0.5))) with
# Laplace smoothing; IV = sum (good_b/G - bad_b/B) WoE_b, terms
# e9-floored before the cross-band sum.


def q_woe_information_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    peru = ev.groupBy("user_id").agg(
        F.sum(
            (F.col("event_type") == "purchase").cast("long")
        ).alias("np"),
        F.sum((F.col("event_type") == "click").cast("long")).alias(
            "nc"
        ),
    )
    pc = peru.groupBy("np").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.orderBy("np")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pc.withColumn("cumv", F.sum("c").over(w)).crossJoin(
        F.broadcast(pc.agg(F.sum("c").alias("n")))
    )
    med = cum.filter(2 * F.col("cumv") >= F.col("n")).agg(
        F.min("np").alias("med")
    )
    lab = peru.crossJoin(F.broadcast(med)).select(
        "user_id",
        "nc",
        (F.col("np") >= F.col("med")).cast("long").alias("good"),
    )
    band = (
        F.when(F.col("nc") < 5, F.lit("b0_lt5"))
        .when(F.col("nc") < 10, F.lit("b1_5to9"))
        .when(F.col("nc") < 15, F.lit("b2_10to14"))
        .when(F.col("nc") < 20, F.lit("b3_15to19"))
        .otherwise(F.lit("b4_ge20"))
    )
    cell = lab.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("good").alias("g"),
        F.sum(1 - F.col("good")).alias("bd"),
    )
    tot = cell.agg(
        F.sum("g").alias("gt"), F.sum("bd").alias("bt")
    )
    j = cell.crossJoin(F.broadcast(tot))
    gshare = (F.col("g").cast("double") + 0.5) / (
        F.col("gt").cast("double") + 0.5
    )
    bshare = (F.col("bd").cast("double") + 0.5) / (
        F.col("bt").cast("double") + 0.5
    )
    woe = F.log(gshare / bshare)
    ivterm = (
        F.col("g").cast("double") / F.col("gt").cast("double")
        - F.col("bd").cast("double") / F.col("bt").cast("double")
    ) * woe
    j = j.withColumn(
        "iv9", F.floor(ivterm * 1e9 + F.lit(_OFF)).cast("long")
    )
    wtot = Window.partitionBy()
    j = j.withColumn("ivsum9", F.sum("iv9").over(wtot))
    return j.select(
        "band",
        F.col("n").cast("long").alias("n_users"),
        F.col("g").cast("long").alias("n_good"),
        F.floor(woe * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "woe_e6"
        ),
        F.col("iv9").alias("iv_term_e9"),
        F.col("ivsum9").alias("iv_total_e9"),
    ).orderBy("band")


SQL_WOE = f"""
WITH peru AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS nc
  FROM events GROUP BY 1
), pc AS (
  SELECT np, CAST(count(*) AS BIGINT) AS c FROM peru GROUP BY 1
), cum AS (
  SELECT *,
         CAST(sum(c) OVER (ORDER BY np
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumv,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM pc
), med AS (
  SELECT min(np) AS med FROM cum WHERE 2 * cumv >= n
), lab AS (
  SELECT p.user_id, p.nc,
         CASE WHEN p.np >= m.med THEN 1 ELSE 0 END AS good
  FROM peru p, med m
), cell AS (
  SELECT CASE WHEN nc < 5 THEN 'b0_lt5'
              WHEN nc < 10 THEN 'b1_5to9'
              WHEN nc < 15 THEN 'b2_10to14'
              WHEN nc < 20 THEN 'b3_15to19'
              ELSE 'b4_ge20' END AS band,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(good) AS BIGINT) AS g,
         CAST(sum(1 - good) AS BIGINT) AS bd
  FROM lab GROUP BY 1
), tot AS (
  SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(bd) AS BIGINT) AS bt
  FROM cell
), j AS (
  SELECT c.*, t.gt, t.bt,
         ln(((c.g + 0.5) / (t.gt + 0.5))
            / ((c.bd + 0.5) / (t.bt + 0.5))) AS woe,
         CAST(floor((CAST(c.g AS DOUBLE) / t.gt
                     - CAST(c.bd AS DOUBLE) / t.bt)
                    * ln(((c.g + 0.5) / (t.gt + 0.5))
                         / ((c.bd + 0.5) / (t.bt + 0.5))) * 1e9
                    + {_OFF}) AS BIGINT) AS iv9
  FROM cell c, tot t
)
SELECT band, n AS n_users, g AS n_good,
       CAST(floor(woe * 1000000 + {_OFF}) AS BIGINT) AS woe_e6,
       iv9 AS iv_term_e9,
       CAST(sum(iv9) OVER () AS BIGINT) AS iv_total_e9
FROM j
ORDER BY band
"""

QUERIES["woe_information_value"] = q_woe_information_value
ORACLE_SQL["woe_information_value"] = SQL_WOE


# ===========================================================================
# Battery X — sequential kernels (rows-only + pytest pins, the lz76
# posture): Hodrick-Prescott trend/cycle split, Sakoe-Chiba DTW of
# diel profiles against the global profile, and 2-state Viterbi
# regime decoding.  Not SQL-expressible (pentadiagonal solve /
# data-dependent DP), so no oracle twins; exactness pinned by
# tests/test_seqkernels.py.
# ===========================================================================


def q_hp_filter_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.seqkernels import hp_filter_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.avg("value").alias("y"))
    out = hp_filter_frame(daily, "event_type", "day", "y", lam=1600.0)
    return out.select(
        "event_type",
        "n",
        F.round("trend_var", 4).alias("trend_var"),
        F.round("cycle_var", 4).alias("cycle_var"),
        F.round("smoothness", 6).alias("smoothness"),
    ).orderBy("event_type")


QUERIES["hp_filter_trend"] = q_hp_filter_trend


def q_dtw_diel_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.seqkernels import dtw_profile_frame
    import numpy as np

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    prof = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    ref_rows = (
        ev.groupBy(F.hour("ts").cast("long").alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .orderBy("h")
        .collect()
    )  # 24 rows
    ref = np.array([r["c"] for r in ref_rows])
    out = dtw_profile_frame(prof, "event_type", "h", "c", ref, r=3)
    return out.select(
        "event_type",
        "n",
        F.round("dtw", 4).alias("dtw"),
        F.round("euclid", 4).alias("euclid"),
    ).orderBy("event_type")


QUERIES["dtw_diel_profile"] = q_dtw_diel_profile


def q_viterbi_regimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.seqkernels import viterbi_regimes_frame
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wn = Window.partitionBy("event_type")
    med = daily.withColumn(
        "medc",
        F.expr("percentile_approx(c, 0.5)").over(wn),
    )
    bits = med.select(
        "event_type",
        "day",
        (F.col("c") > F.col("medc")).cast("int").alias("bit"),
    )
    out = viterbi_regimes_frame(bits, "event_type", "day", "bit")
    return out.select(
        "event_type",
        "n",
        "n_switches",
        F.round("frac_high", 4).alias("frac_high"),
    ).orderBy("event_type")


QUERIES["viterbi_regimes"] = q_viterbi_regimes


# ===========================================================================
# Battery Y — health-econometrics & exact ratio inference: the
# two-part (hurdle) spend model with Duan smearing, Fieller's exact
# ratio-of-means interval, and the Brown-Mood median test.
# ===========================================================================


# ---------------------------------------------------------------------------
# two_part_duan — two-part model of per-user daily spend: P(any
# purchase) x E[amount | any] with Duan's (1983) nonparametric
# smearing retransformation for the log-normal part
# ---------------------------------------------------------------------------
# Part 1: share of (user, day) cells with any purchase.  Part 2: on
# purchase cells, regress nothing (intercept-only log model): mu =
# mean ln(amount), smear = mean exp(ln a - mu); E = p * exp(mu) *
# smear.  ln/exp terms collapse to the distinct centi-amount domain
# and are e9-floored.


def q_two_part_duan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = ev.groupBy(
        "event_type",
        "user_id",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long")
        ).alias("amt"),
    )
    # "purchase" semantics: treat each type's own events as spend;
    # a cell is active when amt > 0
    allcells = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("nu"),
        (F.max(
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / 86_400_000_000
            )
        ) - F.min(
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / 86_400_000_000
            )
        ) + 1).alias("ndays"),
    )
    act = cells.filter(F.col("amt") > 0)
    dom = act.groupBy("event_type", "amt").agg(
        F.count(F.lit(1)).alias("c")
    )
    lnv = F.log(F.col("amt").cast("double") / 100.0)
    dom = dom.withColumn(
        "ln9",
        F.floor(lnv * F.col("c").cast("double") * 1e9 + F.lit(_OFF))
        .cast("long"),
    )
    mom = dom.groupBy("event_type").agg(
        F.sum("c").alias("n_act"),
        F.sum("ln9").alias("sln9"),
    )
    mu = F.col("sln9").cast("double") / 1e9 / F.col("n_act").cast(
        "double"
    )
    mom = mom.select("event_type", "n_act", mu.alias("mu"))
    smear = dom.join(F.broadcast(mom), "event_type").withColumn(
        "sm9",
        F.floor(
            F.exp(lnv - F.col("mu"))
            * F.col("c").cast("double")
            * 1e9
            + F.lit(_OFF)
        ).cast("long"),
    ).groupBy("event_type").agg(F.sum("sm9").alias("ssm9"))
    out = (
        mom.join(smear, "event_type")
        .join(F.broadcast(allcells), "event_type")
    )
    total_cells = F.col("nu").cast("double") * F.col("ndays").cast(
        "double"
    )
    p = F.col("n_act").cast("double") / total_cells
    sm = F.col("ssm9").cast("double") / 1e9 / F.col("n_act").cast(
        "double"
    )
    expected = p * F.exp(F.col("mu")) * sm
    return out.select(
        "event_type",
        F.col("n_act").cast("long").alias("n_active_cells"),
        F.floor(p * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "p_any_e6"
        ),
        F.floor(sm * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "smear_e6"
        ),
        F.floor(expected * 10_000 + F.lit(_OFF)).cast("long").alias(
            "expected_spend_e4"
        ),
    ).orderBy("event_type")


SQL_TWO_PART = f"""
WITH cells AS (
  SELECT event_type, user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS amt
  FROM events GROUP BY 1, 2, 3
), allc AS (
  SELECT event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS nu,
         CAST(max(floor(epoch(ts) / 86400))
              - min(floor(epoch(ts) / 86400)) + 1 AS BIGINT) AS ndays
  FROM events GROUP BY 1
), dom AS (
  SELECT event_type, amt, CAST(count(*) AS BIGINT) AS c
  FROM cells WHERE amt > 0 GROUP BY 1, 2
), dom2 AS (
  SELECT *,
         CAST(floor(ln(amt / 100.0) * c * 1e9 + {_OFF})
              AS BIGINT) AS ln9
  FROM dom
), mom AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n_act,
         CAST(sum(ln9) AS DOUBLE) / 1e9 / sum(c) AS mu
  FROM dom2 GROUP BY 1
), sm AS (
  SELECT d.event_type,
         CAST(sum(CAST(floor(exp(ln(d.amt / 100.0) - m.mu) * d.c * 1e9
                             + {_OFF}) AS BIGINT)) AS BIGINT) AS ssm9
  FROM dom d JOIN mom m ON m.event_type = d.event_type
  GROUP BY 1
)
SELECT m.event_type, m.n_act AS n_active_cells,
       CAST(floor(CAST(m.n_act AS DOUBLE) / (a.nu * a.ndays) * 1000000
                  + {_OFF}) AS BIGINT) AS p_any_e6,
       CAST(floor(CAST(s.ssm9 AS DOUBLE) / 1e9 / m.n_act * 1000000
                  + {_OFF}) AS BIGINT) AS smear_e6,
       CAST(floor(CAST(m.n_act AS DOUBLE) / (a.nu * a.ndays)
                  * exp(m.mu)
                  * (CAST(s.ssm9 AS DOUBLE) / 1e9 / m.n_act) * 10000
                  + {_OFF}) AS BIGINT) AS expected_spend_e4
FROM mom m
JOIN sm s ON s.event_type = m.event_type
JOIN allc a ON a.event_type = m.event_type
ORDER BY m.event_type
"""

QUERIES["two_part_duan"] = q_two_part_duan
ORACLE_SQL["two_part_duan"] = SQL_TWO_PART


# ---------------------------------------------------------------------------
# fieller_ratio_ci — Fieller's (1954) exact confidence interval for
# the ratio of day to night mean values
# ---------------------------------------------------------------------------
# With independent means: g = z^2 v2 / m2^2; limits =
# (m1/m2) * [1 +- z sqrt(v1/m1^2 (1-g) + v2/m2^2) ... spelled in the
# standard quadratic form: roots of (m2^2 - z^2 v2) r^2 - 2 m1 m2 r +
# (m1^2 - z^2 v1) = 0.  Exact moments; z = 1.959963984540054.


def q_fieller_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        "event_type",
        F.when(F.hour("ts").between(8, 19), 1).otherwise(0).alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    day = g.filter(F.col("grp") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("ss").alias("ss1"),
    )
    night = g.filter(F.col("grp") == 0).select(
        "event_type",
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("ss").alias("ss2"),
    )
    j = day.join(night, "event_type")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1 / 100.0
    m2 = F.col("s2").cast("double") / n2 / 100.0
    v1 = (
        (
            F.col("ss1").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
            / n1
        )
        / (n1 - 1.0)
        / 10_000.0
        / n1
    )
    v2 = (
        (
            F.col("ss2").cast("double")
            - F.col("s2").cast("double") * F.col("s2").cast("double")
            / n2
        )
        / (n2 - 1.0)
        / 10_000.0
        / n2
    )
    z = 1.959963984540054
    aa = m2 * m2 - z * z * v2
    bb = -2.0 * m1 * m2
    cc = m1 * m1 - z * z * v1
    disc = bb * bb - 4.0 * aa * cc
    lo = (-bb - F.sqrt(disc)) / (2.0 * aa)
    hi = (-bb + F.sqrt(disc)) / (2.0 * aa)
    ratio = m1 / m2
    return (
        j.filter((F.col("n1") >= 3) & (F.col("n2") >= 3) & (aa > 0)
                 & (disc > 0))
        .select(
            "event_type",
            (F.col("n1") + F.col("n2")).cast("long").alias("n"),
            F.floor(ratio * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("ratio_e6"),
            F.floor(lo * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "lo_e6"
            ),
            F.floor(hi * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "hi_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_FIELLER = f"""
WITH g AS (
  SELECT event_type,
         CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ss
  FROM events GROUP BY 1, 2
), j AS (
  SELECT d.event_type, d.n AS n1, d.s AS s1, d.ss AS ss1,
         x.n AS n2, x.s AS s2, x.ss AS ss2
  FROM g d JOIN g x ON x.event_type = d.event_type
  WHERE d.grp = 1 AND x.grp = 0
), m AS (
  SELECT event_type, n1, n2,
         CAST(s1 AS DOUBLE) / n1 / 100.0 AS m1,
         CAST(s2 AS DOUBLE) / n2 / 100.0 AS m2,
         (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
         / (n1 - 1.0) / 10000.0 / n1 AS v1,
         (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
         / (n2 - 1.0) / 10000.0 / n2 AS v2
  FROM j
), q AS (
  SELECT event_type, n1, n2, m1, m2,
         m2 * m2 - 1.959963984540054 * 1.959963984540054 * v2 AS aa,
         -2.0 * m1 * m2 AS bb,
         m1 * m1 - 1.959963984540054 * 1.959963984540054 * v1 AS cc
  FROM m
), r AS (
  SELECT *, bb * bb - 4.0 * aa * cc AS disc FROM q
)
SELECT event_type, CAST(n1 + n2 AS BIGINT) AS n,
       CAST(floor(m1 / m2 * 1000000 + {_OFF}) AS BIGINT) AS ratio_e6,
       CAST(floor((-bb - sqrt(disc)) / (2.0 * aa) * 1000000 + {_OFF})
            AS BIGINT) AS lo_e6,
       CAST(floor((-bb + sqrt(disc)) / (2.0 * aa) * 1000000 + {_OFF})
            AS BIGINT) AS hi_e6
FROM r
WHERE n1 >= 3 AND n2 >= 3 AND aa > 0 AND disc > 0
ORDER BY event_type
"""

QUERIES["fieller_ratio_ci"] = q_fieller_ratio_ci
ORACLE_SQL["fieller_ratio_ci"] = SQL_FIELLER


# ---------------------------------------------------------------------------
# brown_mood_median — the Brown-Mood median test across event types
# ---------------------------------------------------------------------------
# Chi-square on the k x 2 table of above/below the GRAND median
# (lower-median convention on the pooled value domain); continuity-
# free Pearson form with exact integer cells.


def q_brown_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    )
    pooled = cnt.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pooled.withColumn("cumv", F.sum("c").over(w)).crossJoin(
        F.broadcast(pooled.agg(F.sum("c").alias("n")))
    )
    med = cum.filter(2 * F.col("cumv") >= F.col("n")).agg(
        F.min("v").alias("med")
    )
    lab = cnt.crossJoin(F.broadcast(med)).select(
        "event_type",
        (F.col("v") > F.col("med")).cast("long").alias("above"),
    )
    cell = lab.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("above").alias("a"),
    )
    tot = cell.agg(
        F.sum("n").alias("nt"),
        F.sum("a").alias("at_"),
        F.count(F.lit(1)).alias("k"),
    )
    j = cell.crossJoin(F.broadcast(tot))
    pa = F.col("at_").cast("double") / F.col("nt").cast("double")
    ea = F.col("n").cast("double") * pa
    eb = F.col("n").cast("double") * (1.0 - pa)
    term = (F.col("a").cast("double") - ea) * (
        F.col("a").cast("double") - ea
    ) / ea + (
        (F.col("n") - F.col("a")).cast("double") - eb
    ) * (
        (F.col("n") - F.col("a")).cast("double") - eb
    ) / eb
    j = j.withColumn(
        "t6", F.floor(term * 1e6 + F.lit(_OFF)).cast("long")
    )
    agg = j.groupBy("k").agg(F.sum("t6").alias("chi6"))
    return agg.select(
        F.col("k").cast("long").alias("k_groups"),
        F.floor(
            F.col("chi6").cast("double") / 1e6 * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("chi2_e4"),
    )


SQL_BROWN_MOOD = f"""
WITH cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), pooled AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c FROM cnt GROUP BY 1
), cum AS (
  SELECT *,
         CAST(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumv,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM pooled
), med AS (
  SELECT min(v) AS med FROM cum WHERE 2 * cumv >= n
), cell AS (
  SELECT c.event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN c.v > m.med THEN 1 ELSE 0 END)
              AS BIGINT) AS a
  FROM cnt c, med m
  GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(a) AS BIGINT) AS at_,
         count(*) AS k
  FROM cell
), terms AS (
  SELECT t.k,
         CAST(floor(((c.a - c.n * (CAST(t.at_ AS DOUBLE) / t.nt))
                     * (c.a - c.n * (CAST(t.at_ AS DOUBLE) / t.nt))
                     / (c.n * (CAST(t.at_ AS DOUBLE) / t.nt))
                     + ((c.n - c.a)
                        - c.n * (1.0 - CAST(t.at_ AS DOUBLE) / t.nt))
                       * ((c.n - c.a)
                          - c.n * (1.0 - CAST(t.at_ AS DOUBLE) / t.nt))
                       / (c.n * (1.0 - CAST(t.at_ AS DOUBLE) / t.nt)))
                    * 1e6 + {_OFF}) AS BIGINT) AS t6
  FROM cell c, tot t
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(floor(CAST(sum(t6) AS DOUBLE) / 1e6 * 10000 + {_OFF})
            AS BIGINT) AS chi2_e4
FROM terms GROUP BY k
"""

QUERIES["brown_mood_median"] = q_brown_mood_median
ORACLE_SQL["brown_mood_median"] = SQL_BROWN_MOOD


# ===========================================================================
# Battery Z — clinical-decision analytics: decision-curve net benefit
# (Vickers & Elkin 2006) for the activity score, and the classical
# 2 x 2 risk-measure panel (RR, ARD, NNT, Levin PAF) for heavy-click
# exposure vs heavy-purchase outcome.
# ===========================================================================


def _user_outcome(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, nc = clicks, outcome = purchase count above the
    cross-user lower median)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    peru = ev.groupBy("user_id").agg(
        F.sum(
            (F.col("event_type") == "purchase").cast("long")
        ).alias("np"),
        F.sum((F.col("event_type") == "click").cast("long")).alias(
            "nc"
        ),
    )
    pc = peru.groupBy("np").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("np").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = pc.withColumn("cumv", F.sum("c").over(w)).crossJoin(
        F.broadcast(pc.agg(F.sum("c").alias("n")))
    )
    med = cum.filter(2 * F.col("cumv") >= F.col("n")).agg(
        F.min("np").alias("med")
    )
    return peru.crossJoin(F.broadcast(med)).select(
        "user_id",
        "nc",
        (F.col("np") >= F.col("med")).cast("long").alias("outcome"),
    )


_USER_OUTCOME_SQL = """
peru AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS nc
  FROM events GROUP BY 1
), pc AS (
  SELECT np, CAST(count(*) AS BIGINT) AS c FROM peru GROUP BY 1
), cum AS (
  SELECT *,
         CAST(sum(c) OVER (ORDER BY np
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumv,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM pc
), med AS (
  SELECT min(np) AS med FROM cum WHERE 2 * cumv >= n
), lab AS (
  SELECT p.user_id, p.nc,
         CASE WHEN p.np >= m.med THEN 1 ELSE 0 END AS outcome
  FROM peru p, med m
)
"""


# ---------------------------------------------------------------------------
# decision_curve_net_benefit — net benefit of "treat if click count
# >= cutoff" policies at thresholds pt in {0.2, 0.4, 0.6, 0.8}
# ---------------------------------------------------------------------------
# NB(pt) = TP/N - FP/N * pt/(1-pt), with the classifier "treat when
# nc >= cutoff" (cutoff = the click-count value domain); reports, per
# threshold, the best cutoff's net benefit vs treat-all and the best
# cutoff — cumulative counts over the click-count domain, exact ints.


def q_decision_curve_net_benefit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lab = _user_outcome(spark, sf_dir)
    dom = lab.groupBy("nc").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("outcome").alias("o"),
    )
    w = Window.orderBy(F.col("nc").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        dom.withColumn("tp", F.sum("o").over(w))
        .withColumn("treat", F.sum("m").over(w))
        .crossJoin(
            F.broadcast(
                dom.agg(
                    F.sum("m").alias("n"),
                    F.sum("o").alias("pos"),
                )
            )
        )
    )
    th = lab.sparkSession.createDataFrame(
        [(2, 8), (4, 6), (6, 4), (8, 2)], ["ptn", "ptd"]
    )  # pt = ptn/10, pt/(1-pt) = ptn/ptd
    jc = cum.crossJoin(F.broadcast(th))
    nd = F.col("n").cast("double")
    nb = (
        F.col("tp").cast("double")
        - (F.col("treat") - F.col("tp")).cast("double")
        * F.col("ptn").cast("double")
        / F.col("ptd").cast("double")
    ) / nd
    jc = jc.withColumn(
        "nb9", F.floor(nb * 1e9 + F.lit(_OFF)).cast("long")
    )
    best = jc.groupBy("ptn", "ptd", "n", "pos").agg(
        F.max_by(
            F.struct(F.col("nc"), F.col("nb9")),
            F.struct(F.col("nb9"), -F.col("nc")),
        ).alias("b")
    )
    treat_all = (
        F.col("pos").cast("double")
        - (F.col("n") - F.col("pos")).cast("double")
        * F.col("ptn").cast("double")
        / F.col("ptd").cast("double")
    ) / F.col("n").cast("double")
    return best.select(
        (F.col("ptn").cast("double") / 10.0 * 100)
        .cast("long")
        .alias("pt_pct"),
        F.col("b.nc").cast("long").alias("best_cutoff"),
        F.floor(
            F.col("b.nb9").cast("double") / 1e9 * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("net_benefit_e6"),
        F.floor(treat_all * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("treat_all_e6"),
    ).orderBy("pt_pct")


SQL_DECISION_CURVE = f"""
WITH {_USER_OUTCOME_SQL.strip()}
, dom AS (
  SELECT nc, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(outcome) AS BIGINT) AS o
  FROM lab GROUP BY 1
), dcum AS (
  SELECT *,
         CAST(sum(o) OVER (ORDER BY nc DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS tp,
         CAST(sum(m) OVER (ORDER BY nc DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS treat,
         CAST(sum(m) OVER () AS BIGINT) AS n,
         CAST(sum(o) OVER () AS BIGINT) AS pos
  FROM dom
), th AS (
  SELECT * FROM (VALUES (2, 8), (4, 6), (6, 4), (8, 2)) t(ptn, ptd)
), scored AS (
  SELECT c.nc, t.ptn, t.ptd, c.n, c.pos,
         CAST(floor((c.tp - (c.treat - CAST(c.tp AS DOUBLE))
                            * t.ptn / t.ptd) / c.n * 1e9 + {_OFF})
              AS BIGINT) AS nb9
  FROM dcum c, th t
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY ptn
                               ORDER BY nb9 DESC, nc ASC) AS r
  FROM scored
)
SELECT CAST(ptn * 10 AS BIGINT) AS pt_pct,
       CAST(nc AS BIGINT) AS best_cutoff,
       CAST(floor(CAST(nb9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS net_benefit_e6,
       CAST(floor((pos - (n - CAST(pos AS DOUBLE)) * ptn / ptd)
                  / n * 1000000 + {_OFF}) AS BIGINT) AS treat_all_e6
FROM rk WHERE r = 1
ORDER BY pt_pct
"""

QUERIES["decision_curve_net_benefit"] = q_decision_curve_net_benefit
ORACLE_SQL["decision_curve_net_benefit"] = SQL_DECISION_CURVE


# ---------------------------------------------------------------------------
# risk_measures_2x2 — RR, ARD, NNT, and Levin's population
# attributable fraction for heavy-click exposure vs heavy-purchase
# outcome
# ---------------------------------------------------------------------------
# Exposure = click count above the cross-user click lower median.
# RR = (a/(a+b)) / (c/(c+d)); ARD = risk_e - risk_u; NNT = 1/|ARD|;
# PAF = p_e (RR - 1) / (1 + p_e (RR - 1)).  Exact 2 x 2 integers.


def q_risk_measures_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _user_outcome(spark, sf_dir)
    ncdom = lab.groupBy("nc").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("nc").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = ncdom.withColumn("cumv", F.sum("c").over(w)).crossJoin(
        F.broadcast(ncdom.agg(F.sum("c").alias("n")))
    )
    cmed = cum.filter(2 * F.col("cumv") >= F.col("n")).agg(
        F.min("nc").alias("cmed")
    )
    t = lab.crossJoin(F.broadcast(cmed)).select(
        (F.col("nc") >= F.col("cmed")).cast("long").alias("exp_"),
        "outcome",
    )
    cell = t.agg(
        F.sum(F.col("exp_") * F.col("outcome")).alias("a"),
        F.sum(F.col("exp_") * (1 - F.col("outcome"))).alias("b"),
        F.sum((1 - F.col("exp_")) * F.col("outcome")).alias("c"),
        F.sum((1 - F.col("exp_")) * (1 - F.col("outcome"))).alias("d"),
    )
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    c = F.col("c").cast("double")
    d = F.col("d").cast("double")
    re = a / (a + b)
    ru = c / (c + d)
    rr = re / ru
    ard = re - ru
    nnt = 1.0 / F.abs(ard)
    pe = (a + b) / (a + b + c + d)
    paf = pe * (rr - 1.0) / (1.0 + pe * (rr - 1.0))
    return cell.filter(
        (F.col("a") + F.col("b") > 0)
        & (F.col("c") + F.col("d") > 0)
        & (F.col("c") > 0)
    ).select(
        (F.col("a") + F.col("b") + F.col("c") + F.col("d"))
        .cast("long")
        .alias("n"),
        F.floor(rr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rr_e6"
        ),
        F.floor(ard * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "ard_e6"
        ),
        F.floor(nnt * 10_000 + F.lit(_OFF)).cast("long").alias(
            "nnt_e4"
        ),
        F.floor(paf * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "paf_e6"
        ),
    )


SQL_RISK_2X2 = f"""
WITH {_USER_OUTCOME_SQL.strip()}
, ncdom AS (
  SELECT nc, CAST(count(*) AS BIGINT) AS c FROM lab GROUP BY 1
), cum2 AS (
  SELECT *,
         CAST(sum(c) OVER (ORDER BY nc
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumv,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM ncdom
), cmed AS (
  SELECT min(nc) AS cmed FROM cum2 WHERE 2 * cumv >= n
), t AS (
  SELECT CASE WHEN l.nc >= m.cmed THEN 1 ELSE 0 END AS exp_,
         l.outcome
  FROM lab l, cmed m
), cell AS (
  SELECT CAST(sum(exp_ * outcome) AS BIGINT) AS a,
         CAST(sum(exp_ * (1 - outcome)) AS BIGINT) AS b,
         CAST(sum((1 - exp_) * outcome) AS BIGINT) AS c,
         CAST(sum((1 - exp_) * (1 - outcome)) AS BIGINT) AS d
  FROM t
)
SELECT CAST(a + b + c + d AS BIGINT) AS n,
       CAST(floor((CAST(a AS DOUBLE) / (a + b))
                  / (CAST(c AS DOUBLE) / (c + d)) * 1000000 + {_OFF})
            AS BIGINT) AS rr_e6,
       CAST(floor((CAST(a AS DOUBLE) / (a + b)
                   - CAST(c AS DOUBLE) / (c + d)) * 1000000 + {_OFF})
            AS BIGINT) AS ard_e6,
       CAST(floor(1.0 / abs(CAST(a AS DOUBLE) / (a + b)
                            - CAST(c AS DOUBLE) / (c + d)) * 10000
                  + {_OFF}) AS BIGINT) AS nnt_e4,
       CAST(floor(((CAST(a AS DOUBLE) + b) / (a + b + c + d)
                   * ((CAST(a AS DOUBLE) / (a + b))
                      / (CAST(c AS DOUBLE) / (c + d)) - 1.0))
                  / (1.0 + (CAST(a AS DOUBLE) + b) / (a + b + c + d)
                           * ((CAST(a AS DOUBLE) / (a + b))
                              / (CAST(c AS DOUBLE) / (c + d)) - 1.0))
                  * 1000000 + {_OFF}) AS BIGINT) AS paf_e6
FROM cell
WHERE a + b > 0 AND c + d > 0 AND c > 0
"""

QUERIES["risk_measures_2x2"] = q_risk_measures_2x2
ORACLE_SQL["risk_measures_2x2"] = SQL_RISK_2X2


# ===========================================================================
# Battery AA — experiment design & forecast validation: post-hoc
# power / required-n analysis at the observed day-night effect, and
# Hyndman rolling-origin cross-validation of the seasonal-naive
# forecaster.
# ===========================================================================


# ---------------------------------------------------------------------------
# power_analysis — power of the two-sample z test at the observed
# standardized effect, and the n per arm for 80% power
# ---------------------------------------------------------------------------
# power = Phi(|d| sqrt(nh/2) - z_a) with nh the harmonic mean arm
# size; n80 = 2 (z_a + z_b)^2 / d^2 (z_a = 1.959963984540054,
# z_b = 0.8416212335729143).  d from exact moments; Phi via the
# sign-folded A&S erf twin.


def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats16 import _erf

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = ev.select(
        "event_type",
        F.when(F.hour("ts").between(8, 19), 1).otherwise(0).alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    day = g.filter(F.col("grp") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("ss").alias("ss1"),
    )
    night = g.filter(F.col("grp") == 0).select(
        "event_type",
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("ss").alias("ss2"),
    )
    j = day.join(night, "event_type")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1 / 100.0
    m2 = F.col("s2").cast("double") / n2 / 100.0
    v1 = (
        (
            F.col("ss1").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double") / n1
        )
        / (n1 - 1.0)
        / 10_000.0
    )
    v2 = (
        (
            F.col("ss2").cast("double")
            - F.col("s2").cast("double") * F.col("s2").cast("double") / n2
        )
        / (n2 - 1.0)
        / 10_000.0
    )
    sp = F.sqrt(
        ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0)
    )
    d = F.abs(m1 - m2) / sp
    nh = 2.0 * n1 * n2 / (n1 + n2)
    za = 1.959963984540054
    zb = 0.8416212335729143
    zz = d * F.sqrt(nh / 2.0) - F.lit(za)
    power = F.when(
        zz >= 0, 0.5 * (1.0 + _erf(zz * 0.7071067811865476))
    ).otherwise(0.5 * (1.0 - _erf(-zz * 0.7071067811865476)))
    n80 = 2.0 * (za + zb) * (za + zb) / (d * d)
    return (
        j.filter((F.col("n1") >= 3) & (F.col("n2") >= 3) & (d > 0))
        .select(
            "event_type",
            (F.col("n1") + F.col("n2")).cast("long").alias("n"),
            F.floor(d * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "d_e6"
            ),
            F.floor(power * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("power_e6"),
            F.ceil(n80).cast("long").alias("n80_per_arm"),
        )
        .orderBy("event_type")
    )


def _power_sql() -> str:
    from diive_spark.queries_stats16 import _erf_sql

    z = "(d * sqrt(nh / 2.0) - 1.959963984540054)"
    phi = (
        f"CASE WHEN {z} >= 0"
        f" THEN 0.5 * (1.0 + {_erf_sql(z + ' * 0.7071067811865476')})"
        f" ELSE 0.5 * (1.0 - {_erf_sql('-' + z + ' * 0.7071067811865476')})"
        f" END"
    )
    return f"""
WITH g AS (
  SELECT event_type,
         CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                  * CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ss
  FROM events GROUP BY 1, 2
), j AS (
  SELECT d.event_type,
         d.n AS n1, d.s AS s1, d.ss AS ss1,
         x.n AS n2, x.s AS s2, x.ss AS ss2
  FROM g d JOIN g x ON x.event_type = d.event_type
  WHERE d.grp = 1 AND x.grp = 0
), m AS (
  SELECT event_type, n1, n2,
         abs(CAST(s1 AS DOUBLE) / n1 / 100.0
             - CAST(s2 AS DOUBLE) / n2 / 100.0)
         / sqrt((((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                  / (n1 - 1.0) / 10000.0) * (n1 - 1.0)
                 + ((CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
                    / (n2 - 1.0) / 10000.0) * (n2 - 1.0))
                / (n1 + n2 - 2.0)) AS d,
         2.0 * n1 * n2 / (n1 + CAST(n2 AS DOUBLE)) AS nh
  FROM j
  WHERE n1 >= 3 AND n2 >= 3
), f AS (
  SELECT * FROM m WHERE d > 0
)
SELECT event_type, CAST(n1 + n2 AS BIGINT) AS n,
       CAST(floor(d * 1000000 + {_OFF}) AS BIGINT) AS d_e6,
       CAST(floor({phi} * 1000000 + {_OFF}) AS BIGINT) AS power_e6,
       CAST(ceil(2.0 * (1.959963984540054 + 0.8416212335729143)
                 * (1.959963984540054 + 0.8416212335729143)
                 / (d * d)) AS BIGINT) AS n80_per_arm
FROM f
ORDER BY event_type
"""


QUERIES["power_analysis"] = q_power_analysis
ORACLE_SQL["power_analysis"] = _power_sql()


# ---------------------------------------------------------------------------
# rolling_origin_cv — Hyndman-style rolling-origin evaluation of the
# seasonal-naive (lag-7) daily forecaster
# ---------------------------------------------------------------------------
# Three expanding origins at 60/70/80% of each type's span; each fold
# scores the next 7 days with |y_d - y_{d-7}| (exact integer daily
# means).  Reports per (type, fold): n_scored, MAE; a final row per
# type would be a second agg — kept per-fold for inspectability.


def q_rolling_origin_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y"),
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    d = daily.withColumn("yl7", F.lag("y", 7).over(wo))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    folds = d.sparkSession.createDataFrame(
        [(1, 6), (2, 7), (3, 8)], ["fold", "tenths"]
    )
    j = d.join(F.broadcast(bounds), "event_type").crossJoin(
        F.broadcast(folds)
    )
    span = (F.col("dmax") - F.col("dmin") + 1).cast("double")
    origin = F.col("dmin") + F.floor(
        span * F.col("tenths").cast("double") / 10.0
    ).cast("long")
    scored = j.filter(
        (F.col("day") >= origin)
        & (F.col("day") < origin + 7)
        & F.col("yl7").isNotNull()
    )
    agg = scored.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(F.abs(F.col("y") - F.col("yl7"))).alias("sae"),
    )
    mae = (
        F.col("sae").cast("double")
        / F.col("n_scored").cast("double")
        / 100.0
    )
    return agg.select(
        "event_type",
        F.col("fold").cast("long").alias("fold"),
        F.col("n_scored").cast("long").alias("n_scored"),
        F.floor(mae * 10_000 + F.lit(_OFF)).cast("long").alias(
            "mae_e4"
        ),
    ).orderBy("event_type", "fold")


SQL_ROLLING_CV = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(CAST(sum(CAST(floor(value * 100 + {_OFF})
                                  AS BIGINT)) AS DOUBLE)
                    / count(*) + {_OFF}) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT *,
         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS yl7
  FROM daily
), bounds AS (
  SELECT event_type, min(day) AS dmin, max(day) AS dmax
  FROM daily GROUP BY 1
), folds AS (
  SELECT * FROM (VALUES (1, 6), (2, 7), (3, 8)) t(fold, tenths)
), scored AS (
  SELECT d.event_type, f.fold, d.y, d.yl7
  FROM d
  JOIN bounds b ON b.event_type = d.event_type
  CROSS JOIN folds f
  WHERE d.day >= b.dmin + CAST(floor((b.dmax - b.dmin + 1.0)
                                     * f.tenths / 10.0) AS BIGINT)
    AND d.day < b.dmin + CAST(floor((b.dmax - b.dmin + 1.0)
                                    * f.tenths / 10.0) AS BIGINT) + 7
    AND d.yl7 IS NOT NULL
)
SELECT event_type, CAST(fold AS BIGINT) AS fold,
       CAST(count(*) AS BIGINT) AS n_scored,
       CAST(floor(CAST(sum(abs(y - yl7)) AS DOUBLE) / count(*)
                  / 100.0 * 10000 + {_OFF}) AS BIGINT) AS mae_e4
FROM scored
GROUP BY 1, 2
ORDER BY event_type, fold
"""

QUERIES["rolling_origin_cv"] = q_rolling_origin_cv
ORACLE_SQL["rolling_origin_cv"] = SQL_ROLLING_CV


# ===========================================================================
# Battery AB — directed-graph motifs on the event-type transition
# graph (triad census), and balanced repeated replication variance
# (survey statistics).
# ===========================================================================


# ---------------------------------------------------------------------------
# triad_census_transitions — transitive vs cyclic triads in the
# binarized type-transition digraph
# ---------------------------------------------------------------------------
# Edges: i -> j present iff the per-user consecutive-event transition
# count exceeds the uniform expectation (total off-diagonal / 20).
# Over the 60 ordered distinct triples: transitive = (i->j, j->k,
# i->k); cyclic = (i->j, j->k, k->i) counted once per unordered
# cycle (divide by 3).  The graph is k x k — everything after the
# transition agg is constant-size.


def q_triad_census_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .filter(F.col("nxt") != F.col("event_type"))
        .groupBy(
            F.col("event_type").alias("i"), F.col("nxt").alias("j")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pairs.agg(
        F.sum("c").alias("ct"), F.count(F.lit(1)).alias("ne")
    )
    edges = pairs.crossJoin(F.broadcast(tot)).filter(
        F.col("c").cast("double") * 20.0 > F.col("ct").cast("double")
    ).select("i", "j")
    e1 = edges
    e2 = edges.select(
        F.col("i").alias("j"), F.col("j").alias("k")
    )
    e3t = edges.select(
        F.col("i").alias("i2"), F.col("j").alias("k2")
    )
    two = e1.join(e2, "j").filter(F.col("i") != F.col("k"))
    trans = two.join(
        e3t,
        (F.col("i2") == F.col("i")) & (F.col("k2") == F.col("k")),
    ).count()
    e3c = edges.select(
        F.col("i").alias("k3"), F.col("j").alias("i3")
    )
    cyc = two.join(
        e3c,
        (F.col("k3") == F.col("k")) & (F.col("i3") == F.col("i")),
    ).count()
    nedges = edges.count()
    rows = [(int(nedges), int(trans), int(cyc) // 3)]
    return spark.createDataFrame(
        rows, "n_edges long, n_transitive long, n_cyclic long"
    )


SQL_TRIADS = """
WITH seq AS (
  SELECT event_type AS i,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS j
  FROM events
), pairs AS (
  SELECT i, j, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE j IS NOT NULL AND j <> i GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS ct FROM pairs
), edges AS (
  SELECT p.i, p.j FROM pairs p, tot t
  WHERE CAST(p.c AS DOUBLE) * 20.0 > t.ct
), two AS (
  SELECT a.i, a.j, b.j AS k
  FROM edges a JOIN edges b ON b.i = a.j
  WHERE a.i <> b.j
), counts AS (
  SELECT
    (SELECT count(*) FROM edges) AS n_edges,
    (SELECT count(*) FROM two t
      JOIN edges e ON e.i = t.i AND e.j = t.k) AS n_trans,
    (SELECT count(*) FROM two t
      JOIN edges e ON e.i = t.k AND e.j = t.i) AS n_cyc
)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_trans AS BIGINT) AS n_transitive,
       CAST(n_cyc // 3 AS BIGINT) AS n_cyclic
FROM counts
"""

QUERIES["triad_census_transitions"] = q_triad_census_transitions
ORACLE_SQL["triad_census_transitions"] = SQL_TRIADS


# ---------------------------------------------------------------------------
# brr_variance — balanced repeated replication (Hadamard 4x4) variance
# of the mean event value under a 4-strata, 2-PSU design
# ---------------------------------------------------------------------------
# Strata = user_id % 4, PSU = (user_id // 4) % 2; replicate r keeps
# PSU 0 of stratum h when H[r][h] = +1, doubling the kept PSU's
# weight.  v_BRR = mean_r (theta_r - theta)^2.  Exact cell moments;
# replicate means are closed-form rationals of the 8-cell table.


def q_brr_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cell = ev.select(
        (F.col("user_id") % 4).alias("h"),
        ((F.col("user_id") / 4).cast("long") % 2).alias("psu"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("h", "psu").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
    )
    had = ev.sparkSession.createDataFrame(
        [
            (0, 0, 1), (0, 1, 1), (0, 2, 1), (0, 3, 1),
            (1, 0, 1), (1, 1, -1), (1, 2, 1), (1, 3, -1),
            (2, 0, 1), (2, 1, 1), (2, 2, -1), (2, 3, -1),
            (3, 0, 1), (3, 1, -1), (3, 2, -1), (3, 3, 1),
        ],
        ["r", "h", "sign"],
    )
    j = cell.join(F.broadcast(had), "h")
    keep = (
        (F.col("sign") == 1) & (F.col("psu") == 0)
    ) | ((F.col("sign") == -1) & (F.col("psu") == 1))
    rep = j.filter(keep).groupBy("r").agg(
        F.sum(2 * F.col("s")).alias("rs"),
        F.sum(2 * F.col("n")).alias("rn"),
    )
    full = cell.agg(F.sum("s").alias("fs"), F.sum("n").alias("fn"))
    theta = F.col("fs").cast("double") / F.col("fn").cast("double")
    rtheta = F.col("rs").cast("double") / F.col("rn").cast("double")
    jj = rep.crossJoin(F.broadcast(full))
    jj = jj.withColumn(
        "d9",
        F.floor(
            (rtheta - theta) * (rtheta - theta) * 1e9 + F.lit(_OFF)
        ).cast("long"),
    )
    agg = jj.groupBy("fn", "fs").agg(
        F.count(F.lit(1)).alias("nr"), F.sum("d9").alias("sd9")
    )
    vbrr = F.col("sd9").cast("double") / 1e9 / F.col("nr").cast(
        "double"
    )
    theta2 = F.col("fs").cast("double") / F.col("fn").cast("double")
    return agg.select(
        F.col("fn").cast("long").alias("n"),
        F.floor(theta2 / 100.0 * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("mean_e4"),
        F.floor(F.sqrt(vbrr) / 100.0 * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("se_brr_e6"),
    )


SQL_BRR = f"""
WITH cell AS (
  SELECT user_id % 4 AS h, (user_id // 4) % 2 AS psu,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + {_OFF}) AS BIGINT))
              AS BIGINT) AS s
  FROM events GROUP BY 1, 2
), had AS (
  SELECT * FROM (VALUES
    (0, 0, 1), (0, 1, 1), (0, 2, 1), (0, 3, 1),
    (1, 0, 1), (1, 1, -1), (1, 2, 1), (1, 3, -1),
    (2, 0, 1), (2, 1, 1), (2, 2, -1), (2, 3, -1),
    (3, 0, 1), (3, 1, -1), (3, 2, -1), (3, 3, 1)
  ) t(r, h, sign)
), rep AS (
  SELECT hh.r,
         CAST(sum(2 * c.s) AS BIGINT) AS rs,
         CAST(sum(2 * c.n) AS BIGINT) AS rn
  FROM cell c JOIN had hh ON hh.h = c.h
  WHERE (hh.sign = 1 AND c.psu = 0) OR (hh.sign = -1 AND c.psu = 1)
  GROUP BY 1
), full_ AS (
  SELECT CAST(sum(s) AS BIGINT) AS fs, CAST(sum(n) AS BIGINT) AS fn
  FROM cell
), d AS (
  SELECT f.fn, f.fs,
         CAST(floor((CAST(r.rs AS DOUBLE) / r.rn
                     - CAST(f.fs AS DOUBLE) / f.fn)
                    * (CAST(r.rs AS DOUBLE) / r.rn
                       - CAST(f.fs AS DOUBLE) / f.fn) * 1e9 + {_OFF})
              AS BIGINT) AS d9
  FROM rep r, full_ f
)
SELECT CAST(fn AS BIGINT) AS n,
       CAST(floor(CAST(fs AS DOUBLE) / fn / 100.0 * 10000 + {_OFF})
            AS BIGINT) AS mean_e4,
       CAST(floor(sqrt(CAST(sum(d9) AS DOUBLE) / 1e9 / count(*))
                  / 100.0 * 1000000 + {_OFF}) AS BIGINT) AS se_brr_e6
FROM d GROUP BY fn, fs
"""

QUERIES["brr_variance"] = q_brr_variance
ORACLE_SQL["brr_variance"] = SQL_BRR


# ===========================================================================
# Battery AC — revenue management (Littlewood's rule / overbooking)
# and regional-economics shift-share decomposition.
# ===========================================================================


# ---------------------------------------------------------------------------
# littlewood_emsr — Littlewood protection level for high-value demand
# and the normal-approximation overbooking limit, per event type
# ---------------------------------------------------------------------------
# High-fare demand = daily count of value > 50 events (mean mu, sd s
# from exact moments); critical ratio 1 - f_low/f_high with f_high =
# mean value of the high band, f_low of the low band; protection
# y* = mu + probit(CR) s (Acklam twin).  Overbooking: capacity C =
# ceil(1.1 mu), show rate p = 0.9, limit b* = the largest b with
# P(shows <= C) >= 0.95 under the normal approx: b* = floor((C -
# z sqrt(...)) / p) spelled via the quadratic in sqrt(b) — kept to
# the standard simple form b* = floor(C / p) with the service buffer
# z sqrt(C (1-p)/p) subtracted.


def q_littlewood_emsr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.queries_stats17 import _probit

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum((F.col("value") > 50.0).cast("long")).alias("hi"),
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("hi").alias("sh"),
        F.sum(F.col("hi") * F.col("hi")).alias("shh"),
    )
    fares = ev.groupBy("event_type").agg(
        F.sum(
            F.when(
                F.col("value") > 50.0,
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long"),
            ).otherwise(0)
        ).alias("sfh"),
        F.sum((F.col("value") > 50.0).cast("long")).alias("nh"),
        F.sum(
            F.when(
                F.col("value") <= 50.0,
                F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long"),
            ).otherwise(0)
        ).alias("sfl"),
        F.sum((F.col("value") <= 50.0).cast("long")).alias("nl"),
    )
    j = mom.join(fares, "event_type")
    ndd = F.col("nd").cast("double")
    mu = F.col("sh").cast("double") / ndd
    var = (
        F.col("shh").cast("double")
        - F.col("sh").cast("double") * F.col("sh").cast("double") / ndd
    ) / (ndd - 1.0)
    fh = F.col("sfh").cast("double") / F.col("nh").cast("double")
    fl = F.col("sfl").cast("double") / F.col("nl").cast("double")
    cr = 1.0 - fl / fh
    prot = mu + _probit(cr) * F.sqrt(var)
    cap = F.ceil(1.1 * mu).cast("double")
    p = 0.9
    z95 = 1.6448536269514722
    bstar = F.floor(
        (cap - F.lit(z95) * F.sqrt(cap * (1.0 - p))) / p
    )
    return (
        j.filter(
            (F.col("nd") >= 3)
            & (var > 0)
            & (F.col("nh") > 0)
            & (F.col("nl") > 0)
            & (cr > 0)
            & (cr < 1)
        )
        .select(
            "event_type",
            F.col("nd").cast("long").alias("n_days"),
            F.floor(mu * 10_000 + F.lit(_OFF)).cast("long").alias(
                "mu_hi_e4"
            ),
            F.floor(cr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "critical_ratio_e6"
            ),
            F.floor(prot * 10_000 + F.lit(_OFF)).cast("long").alias(
                "protection_e4"
            ),
            bstar.cast("long").alias("overbook_limit"),
        )
        .orderBy("event_type")
    )


def _littlewood_sql() -> str:
    from diive_spark.queries_stats17 import _probit_sql

    cr = "(1.0 - (CAST(sfl AS DOUBLE) / nl) / (CAST(sfh AS DOUBLE) / nh))"
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS hi
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT event_type, count(*) AS nd,
         CAST(sum(hi) AS BIGINT) AS sh,
         CAST(sum(hi * hi) AS BIGINT) AS shh
  FROM daily GROUP BY 1
), fares AS (
  SELECT event_type,
         CAST(sum(CASE WHEN value > 50.0
                       THEN CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS sfh,
         CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS nh,
         CAST(sum(CASE WHEN value <= 50.0
                       THEN CAST(floor(value * 100 + {_OFF}) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS sfl,
         CAST(sum(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS nl
  FROM events GROUP BY 1
), j AS (
  SELECT m.event_type, m.nd, m.sh, m.shh, f.sfh, f.nh, f.sfl, f.nl,
         CAST(m.sh AS DOUBLE) / m.nd AS mu,
         (CAST(m.shh AS DOUBLE) - CAST(m.sh AS DOUBLE) * m.sh / m.nd)
         / (m.nd - 1.0) AS var,
         {cr} AS cr
  FROM mom m JOIN fares f ON f.event_type = m.event_type
), f2 AS (
  SELECT * FROM j
  WHERE nd >= 3 AND var > 0 AND nh > 0 AND nl > 0
    AND cr > 0 AND cr < 1
)
SELECT event_type, CAST(nd AS BIGINT) AS n_days,
       CAST(floor(mu * 10000 + {_OFF}) AS BIGINT) AS mu_hi_e4,
       CAST(floor(cr * 1000000 + {_OFF}) AS BIGINT)
         AS critical_ratio_e6,
       CAST(floor((mu + {_probit_sql('cr')} * sqrt(var)) * 10000
                  + {_OFF}) AS BIGINT) AS protection_e4,
       CAST(floor((ceil(1.1 * mu)
                   - 1.6448536269514722
                     * sqrt(ceil(1.1 * mu) * 0.1)) / 0.9)
            AS BIGINT) AS overbook_limit
FROM f2
ORDER BY event_type
"""


QUERIES["littlewood_emsr"] = q_littlewood_emsr
ORACLE_SQL["littlewood_emsr"] = _littlewood_sql()


# ---------------------------------------------------------------------------
# shift_share_analysis — decompose each source's doc-count growth
# (first vs second half by doc_id) into national, industry-mix (lang),
# and competitive-shift components
# ---------------------------------------------------------------------------
# g = national growth rate; g_l = per-lang national rates; for source
# s: NS = base_s g; IM = sum_l base_sl (g_l - g); CS = sum_l base_sl
# (g_sl - g_l); NS + IM + CS = actual change EXACTLY (rational
# identity).  Components e6-floored per (source, lang) before sums.


def q_shift_share_analysis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    docs = _documents(spark, sf_dir)
    half = docs.crossJoin(
        F.broadcast(docs.agg(F.max("doc_id").alias("mx")))
    ).select(
        "source",
        "lang",
        (2 * F.col("doc_id") >= F.col("mx")).cast("long").alias("h"),
    )
    cell = half.groupBy("source", "lang").agg(
        F.sum(1 - F.col("h")).alias("b"),
        F.sum("h").alias("e"),
    ).filter(F.col("b") > 0)
    lgr = cell.groupBy("lang").agg(
        F.sum("b").alias("lb"), F.sum("e").alias("le")
    )
    nat = cell.agg(F.sum("b").alias("nb"), F.sum("e").alias("ne"))
    j = cell.join(F.broadcast(lgr), "lang").crossJoin(
        F.broadcast(nat)
    )
    g = F.col("ne").cast("double") / F.col("nb").cast("double") - 1.0
    gl = F.col("le").cast("double") / F.col("lb").cast("double") - 1.0
    gsl = F.col("e").cast("double") / F.col("b").cast("double") - 1.0
    bd = F.col("b").cast("double")
    ns6 = F.floor(bd * g * 1e6 + F.lit(_OFF)).cast("long")
    im6 = F.floor(bd * (gl - g) * 1e6 + F.lit(_OFF)).cast("long")
    cs6 = F.floor(bd * (gsl - gl) * 1e6 + F.lit(_OFF)).cast("long")
    agg = j.select(
        "source",
        F.col("b"),
        F.col("e"),
        ns6.alias("ns6"),
        im6.alias("im6"),
        cs6.alias("cs6"),
    ).groupBy("source").agg(
        F.sum("b").alias("base"),
        F.sum("e").alias("end_"),
        F.sum("ns6").alias("ns"),
        F.sum("im6").alias("im"),
        F.sum("cs6").alias("cs"),
    )
    return agg.select(
        "source",
        F.col("base").cast("long").alias("base_docs"),
        (F.col("end_") - F.col("base")).cast("long").alias("change"),
        F.floor(
            F.col("ns").cast("double") / 1e6 * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("national_e4"),
        F.floor(
            F.col("im").cast("double") / 1e6 * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("industry_mix_e4"),
        F.floor(
            F.col("cs").cast("double") / 1e6 * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("competitive_e4"),
    ).orderBy("source")


SQL_SHIFT_SHARE = f"""
WITH mx AS (
  SELECT max(doc_id) AS mx FROM documents
), half AS (
  SELECT d.source, d.lang,
         CASE WHEN 2 * d.doc_id >= m.mx THEN 1 ELSE 0 END AS h
  FROM documents d, mx m
), cell AS (
  SELECT source, lang,
         CAST(sum(1 - h) AS BIGINT) AS b,
         CAST(sum(h) AS BIGINT) AS e
  FROM half GROUP BY 1, 2
  HAVING sum(1 - h) > 0
), lgr AS (
  SELECT lang, CAST(sum(b) AS BIGINT) AS lb,
         CAST(sum(e) AS BIGINT) AS le
  FROM cell GROUP BY 1
), nat AS (
  SELECT CAST(sum(b) AS BIGINT) AS nb, CAST(sum(e) AS BIGINT) AS ne
  FROM cell
), terms AS (
  SELECT c.source, c.b, c.e,
         CAST(floor(c.b * (CAST(n.ne AS DOUBLE) / n.nb - 1.0) * 1e6
                    + {_OFF}) AS BIGINT) AS ns6,
         CAST(floor(c.b * ((CAST(l.le AS DOUBLE) / l.lb - 1.0)
                           - (CAST(n.ne AS DOUBLE) / n.nb - 1.0)) * 1e6
                    + {_OFF}) AS BIGINT) AS im6,
         CAST(floor(c.b * ((CAST(c.e AS DOUBLE) / c.b - 1.0)
                           - (CAST(l.le AS DOUBLE) / l.lb - 1.0)) * 1e6
                    + {_OFF}) AS BIGINT) AS cs6
  FROM cell c
  JOIN lgr l ON l.lang = c.lang
  CROSS JOIN nat n
)
SELECT source,
       CAST(sum(b) AS BIGINT) AS base_docs,
       CAST(sum(e) - sum(b) AS BIGINT) AS change,
       CAST(floor(CAST(sum(ns6) AS DOUBLE) / 1e6 * 10000 + {_OFF})
            AS BIGINT) AS national_e4,
       CAST(floor(CAST(sum(im6) AS DOUBLE) / 1e6 * 10000 + {_OFF})
            AS BIGINT) AS industry_mix_e4,
       CAST(floor(CAST(sum(cs6) AS DOUBLE) / 1e6 * 10000 + {_OFF})
            AS BIGINT) AS competitive_e4
FROM terms GROUP BY 1
ORDER BY source
"""

QUERIES["shift_share_analysis"] = q_shift_share_analysis
ORACLE_SQL["shift_share_analysis"] = SQL_SHIFT_SHARE


# ===========================================================================
# Battery AD — psychometrics (classical test theory): item
# difficulty / point-biserial discrimination / Rasch MoM difficulty,
# and the Guttman scalogram coefficient of reproducibility.  "Items" =
# event types; a user "passes" an item when their count of that type
# exceeds the cross-user lower median for the type.
# ===========================================================================


def _item_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_type, x) binary pass matrix."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    dom = cnt.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).alias("m")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    cum = dom.withColumn("cumv", F.sum("m").over(w)).withColumn(
        "n", F.sum("m").over(wn)
    )
    med = cum.filter(2 * F.col("cumv") >= F.col("n")).groupBy(
        "event_type"
    ).agg(F.min("c").alias("med"))
    return cnt.join(F.broadcast(med), "event_type").select(
        "user_id",
        "event_type",
        (F.col("c") > F.col("med")).cast("long").alias("x"),
    )


_ITEM_MATRIX_SQL = """
cnt AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), dom AS (
  SELECT event_type, c, CAST(count(*) AS BIGINT) AS m
  FROM cnt GROUP BY 1, 2
), cum AS (
  SELECT *,
         CAST(sum(m) OVER (PARTITION BY event_type ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumv,
         CAST(sum(m) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dom
), med AS (
  SELECT event_type, min(c) AS med
  FROM cum WHERE 2 * cumv >= n GROUP BY 1
), im AS (
  SELECT c.user_id, c.event_type,
         CASE WHEN c.c > m.med THEN 1 ELSE 0 END AS x
  FROM cnt c JOIN med m ON m.event_type = c.event_type
)
"""


# ---------------------------------------------------------------------------
# item_analysis_ctt — difficulty, point-biserial discrimination vs
# the rest score, and Rasch MoM difficulty per item
# ---------------------------------------------------------------------------
# r_pb = (M1 - M0) sqrt(p(1-p)) / S_rest with rest = total - x_item;
# Rasch b = ln((1-p)/p).  All moments exact integers.


def q_item_analysis_ctt(spark: SparkSession, sf_dir: str) -> DataFrame:
    im = _item_matrix(spark, sf_dir)
    wtu = Window.partitionBy("user_id")
    t = im.withColumn("tot", F.sum("x").over(wtu)).withColumn(
        "rest", F.col("tot") - F.col("x")
    )
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("rest").alias("sr"),
        F.sum(F.col("rest") * F.col("rest")).alias("srr"),
        F.sum(F.col("x") * F.col("rest")).alias("sxr"),
    )
    nd = F.col("n").cast("double")
    p = F.col("sx").cast("double") / nd
    mr = F.col("sr").cast("double") / nd
    vr = F.col("srr").cast("double") / nd - mr * mr
    m1 = F.col("sxr").cast("double") / F.col("sx").cast("double")
    m0 = (F.col("sr") - F.col("sxr")).cast("double") / (
        F.col("n") - F.col("sx")
    ).cast("double")
    rpb = (m1 - m0) * F.sqrt(p * (1.0 - p)) / F.sqrt(vr)
    rasch = F.log((1.0 - p) / p)
    return (
        agg.filter(
            (F.col("sx") > 0) & (F.col("sx") < F.col("n")) & (vr > 0)
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_users"),
            F.floor(p * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "difficulty_e6"
            ),
            F.floor(rpb * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("discrimination_e6"),
            F.floor(rasch * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("rasch_b_e6"),
        )
        .orderBy("event_type")
    )


SQL_ITEM_CTT = f"""
WITH {_ITEM_MATRIX_SQL.strip()}
, t AS (
  SELECT *,
         CAST(sum(x) OVER (PARTITION BY user_id) AS BIGINT) - x
           AS rest
  FROM im
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(rest) AS BIGINT) AS sr,
         CAST(sum(rest * rest) AS BIGINT) AS srr,
         CAST(sum(x * rest) AS BIGINT) AS sxr
  FROM t GROUP BY 1
), m AS (
  SELECT event_type, n, sx,
         CAST(sx AS DOUBLE) / n AS p,
         CAST(srr AS DOUBLE) / n
           - (CAST(sr AS DOUBLE) / n) * (CAST(sr AS DOUBLE) / n) AS vr,
         CAST(sxr AS DOUBLE) / sx AS m1,
         CAST(sr - sxr AS DOUBLE) / (n - sx) AS m0
  FROM agg
  WHERE sx > 0 AND sx < n
)
SELECT event_type, CAST(n AS BIGINT) AS n_users,
       CAST(floor(p * 1000000 + {_OFF}) AS BIGINT) AS difficulty_e6,
       CAST(floor((m1 - m0) * sqrt(p * (1.0 - p)) / sqrt(vr)
                  * 1000000 + {_OFF}) AS BIGINT) AS discrimination_e6,
       CAST(floor(ln((1.0 - p) / p) * 1000000 + {_OFF})
            AS BIGINT) AS rasch_b_e6
FROM m
WHERE vr > 0
ORDER BY event_type
"""

QUERIES["item_analysis_ctt"] = q_item_analysis_ctt
ORACLE_SQL["item_analysis_ctt"] = SQL_ITEM_CTT


# ---------------------------------------------------------------------------
# guttman_reproducibility — coefficient of reproducibility of the
# item-response scalogram (Goodenough error counting)
# ---------------------------------------------------------------------------
# Items ranked by popularity (desc difficulty, type tie-break); a
# user with total t ideally passes the t most popular items; errors =
# # cells deviating from that step pattern; CR = 1 - errors/(n k).
# CR >= 0.9 is the classical scalability bar.


def q_guttman_reproducibility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    im = _item_matrix(spark, sf_dir)
    pop = im.groupBy("event_type").agg(F.sum("x").alias("sx"))
    wr = Window.orderBy(F.col("sx").desc(), F.col("event_type"))
    rank = pop.withColumn("rk", F.row_number().over(wr)).select(
        "event_type", "rk"
    )
    wtu = Window.partitionBy("user_id")
    t = (
        im.join(F.broadcast(rank), "event_type")
        .withColumn("tot", F.sum("x").over(wtu))
    )
    ideal = (F.col("rk") <= F.col("tot")).cast("long")
    err = (F.col("x") != ideal).cast("long")
    agg = t.agg(
        F.count(F.lit(1)).alias("cells"),
        F.sum(err).alias("errors"),
        F.countDistinct("user_id").alias("n_users"),
    )
    cr = 1.0 - F.col("errors").cast("double") / F.col("cells").cast(
        "double"
    )
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("cells").cast("long").alias("cells"),
        F.col("errors").cast("long").alias("errors"),
        F.floor(cr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "reproducibility_e6"
        ),
    )


SQL_GUTTMAN = f"""
WITH {_ITEM_MATRIX_SQL.strip()}
, pop AS (
  SELECT event_type, CAST(sum(x) AS BIGINT) AS sx
  FROM im GROUP BY 1
), rank_ AS (
  SELECT event_type,
         row_number() OVER (ORDER BY sx DESC, event_type) AS rk
  FROM pop
), t AS (
  SELECT i.user_id, i.x, r.rk,
         CAST(sum(i.x) OVER (PARTITION BY i.user_id) AS BIGINT) AS tot
  FROM im i JOIN rank_ r ON r.event_type = i.event_type
), agg AS (
  SELECT count(*) AS cells,
         CAST(sum(CASE WHEN x <> (CASE WHEN rk <= tot THEN 1 ELSE 0 END)
                       THEN 1 ELSE 0 END) AS BIGINT) AS errors,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM t
)
SELECT n_users, CAST(cells AS BIGINT) AS cells, errors,
       CAST(floor((1.0 - CAST(errors AS DOUBLE) / cells) * 1000000
                  + {_OFF}) AS BIGINT) AS reproducibility_e6
FROM agg
"""

QUERIES["guttman_reproducibility"] = q_guttman_reproducibility
ORACLE_SQL["guttman_reproducibility"] = SQL_GUTTMAN


# ===========================================================================
# Battery AE — efficiency econometrics (COLS stochastic frontier) and
# cepstral periodicity detection on the exact DFT lattice.
# ===========================================================================


# ---------------------------------------------------------------------------
# stochastic_frontier_cols — corrected OLS production frontier
# ln(chars) ~ ln(docs) across sources; technical efficiency =
# exp(resid - max resid)  (Winsten 1957 COLS)
# ---------------------------------------------------------------------------
# 20-point exact-integer OLS (e6-floored log pairs); the frontier
# shift is the broadcast max residual; residual skewness (e9-floored
# third moment) is reported as the half-normal MoM diagnostic.


def q_stochastic_frontier_cols(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from diive_spark.queries_stats2 import _documents

    docs = _documents(spark, sf_dir)
    # units = (source, lang) cells — per-source doc counts are a
    # constant 25 in the generator, so the source-level regressor has
    # zero variance (caught by an empty first draft); the cell level
    # varies
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
    ).filter((F.col("n") >= 2) & (F.col("s") > 0))
    pts = per.select(
        "source",
        "lang",
        "n",
        F.floor(F.log(F.col("n").cast("double")) * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("x6"),
        F.floor(F.log(F.col("s").cast("double")) * 1e6 + F.lit(_OFF))
        .cast("long")
        .alias("y6"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x6").alias("sx"),
        F.sum("y6").alias("sy"),
        F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
        F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
    )
    kd = F.col("k").cast("double")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double") / kd
    cxy = F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double") / kd
    b = cxy / cxx
    a = (
        F.col("sy").cast("double") - b * F.col("sx").cast("double")
    ) / kd / 1e6
    mom = mom.select(
        "k", b.alias("b"), a.alias("a")
    ).filter(cxx > 0)
    j = pts.crossJoin(F.broadcast(mom))
    resid = (
        F.col("y6").cast("double") / 1e6
        - F.col("a")
        - F.col("b") * F.col("x6").cast("double") / 1e6
    )
    j = j.withColumn(
        "r9", F.floor(resid * 1e9 + F.lit(_OFF)).cast("long")
    )
    rmax = j.agg(F.max("r9").alias("rmax9"))
    out = j.crossJoin(F.broadcast(rmax))
    eff = F.exp(
        (F.col("r9") - F.col("rmax9")).cast("double") / 1e9
    )
    return out.select(
        "source",
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.floor(F.col("b") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("elasticity_e6"),
        F.floor(eff * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "efficiency_e6"
        ),
    ).orderBy("source", "lang")


SQL_COLS_FRONTIER = f"""
WITH per AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s
  FROM documents GROUP BY 1, 2
  HAVING count(*) >= 2 AND sum(n_chars) > 0
), pts AS (
  SELECT source, lang, n,
         CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + {_OFF})
              AS BIGINT) AS x6,
         CAST(floor(ln(CAST(s AS DOUBLE)) * 1e6 + {_OFF})
              AS BIGINT) AS y6
  FROM per
), mom AS (
  SELECT count(*) AS k,
         CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
         CAST(sum(x6 * y6) AS BIGINT) AS sxy,
         CAST(sum(x6 * x6) AS BIGINT) AS sxx
  FROM pts
), p AS (
  SELECT k,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / k)
         / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / k) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / k)
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / k)
            * sx) / k / 1e6 AS a
  FROM mom
  WHERE CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / k > 0
), r AS (
  SELECT pts.source, pts.lang, pts.n, p.b,
         CAST(floor((pts.y6 / 1e6 - p.a - p.b * pts.x6 / 1e6) * 1e9
                    + {_OFF}) AS BIGINT) AS r9
  FROM pts, p
), rmax AS (
  SELECT max(r9) AS rmax9 FROM r
)
SELECT r.source, r.lang, CAST(r.n AS BIGINT) AS n_docs,
       CAST(floor(r.b * 1000000 + {_OFF}) AS BIGINT) AS elasticity_e6,
       CAST(floor(exp(CAST(r.r9 - m.rmax9 AS DOUBLE) / 1e9) * 1000000
                  + {_OFF}) AS BIGINT) AS efficiency_e6
FROM r, rmax m
ORDER BY r.source, r.lang
"""

QUERIES["stochastic_frontier_cols"] = q_stochastic_frontier_cols
ORACLE_SQL["stochastic_frontier_cols"] = SQL_COLS_FRONTIER


# ---------------------------------------------------------------------------
# cepstrum_peak — cepstral quefrency of the hourly series (second
# transform over the log-periodogram on the exact DFT lattice)
# ---------------------------------------------------------------------------
# Rides the fisher_g discipline: periodogram ordinates I_j as exact
# e3 integers, then C_q = sum_j ln(I_j) cos(2 pi j q / m) with the
# angle on the integer lattice (j q mod m); per-(j, q) terms are
# e6-floored so the cepstral sums are exact integers; the peak
# quefrency is reported with its implied harmonic spacing m/q.


def q_cepstrum_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
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
        .filter(F.col("n") >= 16)
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
        F.floor(
            F.col("c").cast("double") * F.cos(ang) * 1e6 + F.lit(_OFF)
        ).cast("long").alias("ca6"),
        F.floor(
            F.col("c").cast("double") * F.sin(ang) * 1e6 + F.lit(_OFF)
        ).cast("long").alias("sa6"),
    )
    ords = trig.groupBy("event_type", "j").agg(
        F.max("n").alias("n"),
        F.sum("ca6").alias("a6"),
        F.sum("sa6").alias("b6"),
    )
    i_j = (
        F.col("a6").cast("double") / 1e6 * F.col("a6").cast("double")
        / 1e6
        + F.col("b6").cast("double") / 1e6 * F.col("b6").cast("double")
        / 1e6
    ) / F.col("n").cast("double")
    ords = ords.select(
        "event_type",
        "j",
        "n",
        F.floor(i_j * 1_000 + F.lit(_OFF)).cast("long").alias("i3"),
    ).withColumn(
        "lni6",
        F.floor(
            F.log(
                F.greatest(F.col("i3"), F.lit(1)).cast("double") / 1e3
            )
            * 1e6
            + F.lit(_OFF)
        ).cast("long"),
    )
    wm = Window.partitionBy("event_type")
    ords = ords.withColumn("m", F.count(F.lit(1)).over(wm))
    qmax = F.floor(F.col("m") / 2).cast("long")
    fan2 = ords.select(
        "event_type",
        "j",
        "m",
        "n",
        "lni6",
        F.explode(F.sequence(F.lit(2), qmax)).alias("q"),
    ).filter(F.col("m") >= 8)
    k2 = (F.col("j") * F.col("q")) % F.col("m")
    ang2 = (
        F.lit(2.0)
        * F.lit(math.pi)
        * k2.cast("double")
        / F.col("m").cast("double")
    )
    terms = fan2.select(
        "event_type",
        "q",
        "m",
        "n",
        F.floor(
            F.col("lni6").cast("double") / 1e6 * F.cos(ang2) * 1e6
            + F.lit(_OFF)
        ).cast("long").alias("t6"),
    )
    ceps = terms.groupBy("event_type", "q").agg(
        F.max("m").alias("m"),
        F.max("n").alias("n"),
        F.sum("t6").alias("c6"),
    )
    wpk = Window.partitionBy("event_type").orderBy(
        F.col("c6").desc(), F.col("q").asc()
    )
    best = ceps.withColumn("rk", F.row_number().over(wpk)).filter(
        F.col("rk") == 1
    )
    spacing = F.col("m").cast("double") / F.col("q").cast("double")
    return best.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("m").cast("long").alias("m_ords"),
        F.col("q").cast("long").alias("peak_quefrency"),
        F.floor(
            F.col("c6").cast("double") / 1e6 * 10_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("cepstrum_e4"),
        F.floor(spacing * 100 + F.lit(_OFF)).cast("long").alias(
            "harmonic_spacing_e2"
        ),
    ).orderBy("event_type")


SQL_CEPSTRUM = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), base AS (
  SELECT event_type, c,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
              - 1 AS BIGINT) AS t,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM hourly
), b2 AS (
  SELECT * FROM base WHERE n >= 16
), fan AS (
  SELECT event_type, t, c, n, u.j
  FROM b2, unnest(generate_series(1,
         CAST(floor((n - 1) / 2.0) AS BIGINT))) AS u(j)
), trig AS (
  SELECT event_type, j, n,
         CAST(floor(c * cos(2.0 * pi() * ((j * t) % n) / n) * 1e6
                    + {_OFF}) AS BIGINT) AS ca6,
         CAST(floor(c * sin(2.0 * pi() * ((j * t) % n) / n) * 1e6
                    + {_OFF}) AS BIGINT) AS sa6
  FROM fan
), ords AS (
  SELECT event_type, j, max(n) AS n,
         CAST(sum(ca6) AS BIGINT) AS a6,
         CAST(sum(sa6) AS BIGINT) AS b6
  FROM trig GROUP BY 1, 2
), i3t AS (
  SELECT event_type, j, n,
         CAST(floor(((a6 / 1e6) * (a6 / 1e6)
                     + (b6 / 1e6) * (b6 / 1e6)) / n * 1000 + {_OFF})
              AS BIGINT) AS i3,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
  FROM ords
), lg AS (
  SELECT *,
         CAST(floor(ln(greatest(i3, 1) / 1e3) * 1e6 + {_OFF})
              AS BIGINT) AS lni6
  FROM i3t
), fan2 AS (
  SELECT event_type, j, m, n, lni6, u.q
  FROM lg, unnest(generate_series(2,
         CAST(floor(m / 2.0) AS BIGINT))) AS u(q)
  WHERE m >= 8
), terms AS (
  SELECT event_type, q, m, n,
         CAST(floor(lni6 / 1e6
                    * cos(2.0 * pi() * ((j * q) % m) / m) * 1e6
                    + {_OFF}) AS BIGINT) AS t6
  FROM fan2
), ceps AS (
  SELECT event_type, q, max(m) AS m, max(n) AS n,
         CAST(sum(t6) AS BIGINT) AS c6
  FROM terms GROUP BY 1, 2
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY c6 DESC, q ASC) AS r
  FROM ceps
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours,
       CAST(m AS BIGINT) AS m_ords,
       CAST(q AS BIGINT) AS peak_quefrency,
       CAST(floor(CAST(c6 AS DOUBLE) / 1e6 * 10000 + {_OFF})
            AS BIGINT) AS cepstrum_e4,
       CAST(floor(CAST(m AS DOUBLE) / q * 100 + {_OFF})
            AS BIGINT) AS harmonic_spacing_e2
FROM rk WHERE r = 1
ORDER BY event_type
"""

QUERIES["cepstrum_peak"] = q_cepstrum_peak
ORACLE_SQL["cepstrum_peak"] = SQL_CEPSTRUM


# ===========================================================================
# Battery AF — computational social choice beyond borda_condorcet:
# the Schulze beatpath method (unrolled Floyd-Warshall over the 5
# candidates) and instant-runoff voting (4 unrolled elimination
# rounds).  Ballots = days; a day ranks the event types by
# (count desc, type asc).
# ===========================================================================

_CANDS = ["click", "error", "purchase", "signup", "view"]


def _day_ballots(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = ev.groupBy(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("day").orderBy(
        F.col("c").desc(), F.col("event_type")
    )
    return day.withColumn("rk", F.row_number().over(w))


_BALLOTS_SQL = """
day AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), ballots AS (
  SELECT day, event_type,
         row_number() OVER (PARTITION BY day
                            ORDER BY c DESC, event_type) AS rk
  FROM day
)
"""


# ---------------------------------------------------------------------------
# schulze_ranking — Schulze beatpath winner/ranking
# ---------------------------------------------------------------------------
# d[i][j] = # ballots preferring i to j; initial strength = d where
# d[i][j] > d[j][i] else 0; five Floyd-Warshall passes (one per
# candidate, alphabetical) of s = max(s, min(s[i][c], s[c][j]));
# wins_i = #{j : s[i][j] >= s[j][i]}.  The matrix is 20 rows —
# everything after the ballot agg is constant-size.


def q_schulze_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _day_ballots(spark, sf_dir)
    a = b.select(
        "day", F.col("event_type").alias("i"), F.col("rk").alias("ri")
    )
    c = b.select(
        "day", F.col("event_type").alias("j"), F.col("rk").alias("rj")
    )
    d = (
        a.join(c, "day")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum((F.col("ri") < F.col("rj")).cast("long")).alias("d"))
    )
    drev = d.select(
        F.col("i").alias("j2"), F.col("j").alias("i2"),
        F.col("d").alias("drev"),
    )
    s = d.join(
        drev,
        (F.col("i") == F.col("i2")) & (F.col("j") == F.col("j2")),
    ).select(
        "i",
        "j",
        F.when(F.col("d") > F.col("drev"), F.col("d"))
        .otherwise(0)
        .alias("s"),
    )
    for cand in _CANDS:
        ic = s.filter(F.col("j") == cand).select(
            F.col("i").alias("i_"), F.col("s").alias("sic")
        )
        cj = s.filter(F.col("i") == cand).select(
            F.col("j").alias("j_"), F.col("s").alias("scj")
        )
        path = ic.crossJoin(cj).select(
            F.col("i_").alias("i"),
            F.col("j_").alias("j"),
            F.least("sic", "scj").alias("p"),
        )
        s = (
            s.join(path, ["i", "j"], "left")
            .select(
                "i",
                "j",
                F.greatest(
                    F.col("s"), F.coalesce(F.col("p"), F.lit(0))
                ).alias("s"),
            )
            # 20-row matrix: truncate the lineage each FW pass so the
            # 5-round self-join chain doesn't deepen the plan (the
            # dedup_clusters localCheckpoint discipline)
            .localCheckpoint(eager=True)
        )
    srev = s.select(
        F.col("i").alias("j3"), F.col("j").alias("i3"),
        F.col("s").alias("srev"),
    )
    wins = (
        s.join(
            srev,
            (F.col("i") == F.col("i3")) & (F.col("j") == F.col("j3")),
        )
        .groupBy("i")
        .agg(
            F.sum((F.col("s") >= F.col("srev")).cast("long")).alias(
                "wins"
            )
        )
    )
    w = Window.orderBy(F.col("wins").desc(), F.col("i"))
    return wins.withColumn("rank", F.row_number().over(w)).select(
        F.col("rank").cast("long").alias("rank"),
        F.col("i").alias("event_type"),
        F.col("wins").cast("long").alias("beatpath_wins"),
    ).orderBy("rank")


def _schulze_sql() -> str:
    rounds = []
    prev = "s0"
    for idx, cand in enumerate(_CANDS):
        cur = f"s{idx + 1}"
        rounds.append(f""", {cur} AS (
  SELECT m.i, m.j,
         greatest(m.s, coalesce(
           least(ic.s, cj.s), 0)) AS s
  FROM {prev} m
  LEFT JOIN {prev} ic ON ic.i = m.i AND ic.j = '{cand}'
  LEFT JOIN {prev} cj ON cj.i = '{cand}' AND cj.j = m.j
)""")
        prev = cur
    return f"""
WITH {_BALLOTS_SQL.strip()}
, d AS (
  SELECT a.event_type AS i, b.event_type AS j,
         CAST(sum(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM ballots a JOIN ballots b
    ON b.day = a.day AND b.event_type <> a.event_type
  GROUP BY 1, 2
), s0 AS (
  SELECT d.i, d.j,
         CASE WHEN d.d > r.d THEN d.d ELSE 0 END AS s
  FROM d JOIN d r ON r.i = d.j AND r.j = d.i
){"".join(rounds)}
, wins AS (
  SELECT a.i, CAST(sum(CASE WHEN a.s >= b.s THEN 1 ELSE 0 END)
                   AS BIGINT) AS wins
  FROM {prev} a JOIN {prev} b ON b.i = a.j AND b.j = a.i
  GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY wins DESC, i) AS BIGINT)
         AS rank,
       i AS event_type, wins AS beatpath_wins
FROM wins
ORDER BY rank
"""


QUERIES["schulze_ranking"] = q_schulze_ranking
ORACLE_SQL["schulze_ranking"] = _schulze_sql()


# ---------------------------------------------------------------------------
# instant_runoff_voting — IRV elimination order over day ballots
# ---------------------------------------------------------------------------
# Each round counts first preferences among the REMAINING candidates
# (min rank per ballot) and eliminates the fewest-votes candidate
# (tie-break: alphabetically first).  Four unrolled rounds leave the
# winner; output = (round, eliminated/winner, votes at that round).


def q_instant_runoff_voting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    b = _day_ballots(spark, sf_dir)
    eliminated: list = []
    rows_out = None
    current = b
    for rnd in range(1, 5):
        remaining = current.filter(
            ~F.col("event_type").isin(eliminated)
            if eliminated
            else F.lit(True)
        )
        wmin = Window.partitionBy("day").orderBy("rk")
        first = (
            remaining.withColumn("r2", F.row_number().over(wmin))
            .filter(F.col("r2") == 1)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        # deterministic elimination: fewest votes, then alphabetical
        worst = first.orderBy(
            F.col("votes").asc(), F.col("event_type").asc()
        ).limit(1)
        wrow = worst.collect()[0]
        eliminated.append(wrow["event_type"])
        rec = current.sparkSession.createDataFrame(
            [(rnd, wrow["event_type"], int(wrow["votes"]), "eliminated")],
            "round long, event_type string, votes long, outcome string",
        )
        rows_out = rec if rows_out is None else rows_out.union(rec)
    final = (
        b.filter(~F.col("event_type").isin(eliminated))
        .withColumn(
            "r2",
            F.row_number().over(Window.partitionBy("day").orderBy("rk")),
        )
        .filter(F.col("r2") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("votes"))
        .select(
            F.lit(5).cast("long").alias("round"),
            "event_type",
            F.col("votes").cast("long").alias("votes"),
            F.lit("winner").alias("outcome"),
        )
    )
    return rows_out.union(final).orderBy("round")


def _irv_sql() -> str:
    # unrolled rounds: each round recomputes first preferences among
    # candidates not yet eliminated (elim CTEs chain)
    sql = f"""
WITH {_BALLOTS_SQL.strip()}
, f1 AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS votes
  FROM (
    SELECT day, event_type,
           row_number() OVER (PARTITION BY day ORDER BY rk) AS r2
    FROM ballots
  ) t WHERE r2 = 1 GROUP BY 1
), e1 AS (
  SELECT event_type, votes FROM f1
  ORDER BY votes ASC, event_type ASC LIMIT 1
), f2 AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS votes
  FROM (
    SELECT b.day, b.event_type,
           row_number() OVER (PARTITION BY b.day ORDER BY b.rk) AS r2
    FROM ballots b
    WHERE b.event_type NOT IN (SELECT event_type FROM e1)
  ) t WHERE r2 = 1 GROUP BY 1
), e2 AS (
  SELECT event_type, votes FROM f2
  ORDER BY votes ASC, event_type ASC LIMIT 1
), f3 AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS votes
  FROM (
    SELECT b.day, b.event_type,
           row_number() OVER (PARTITION BY b.day ORDER BY b.rk) AS r2
    FROM ballots b
    WHERE b.event_type NOT IN (SELECT event_type FROM e1)
      AND b.event_type NOT IN (SELECT event_type FROM e2)
  ) t WHERE r2 = 1 GROUP BY 1
), e3 AS (
  SELECT event_type, votes FROM f3
  ORDER BY votes ASC, event_type ASC LIMIT 1
), f4 AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS votes
  FROM (
    SELECT b.day, b.event_type,
           row_number() OVER (PARTITION BY b.day ORDER BY b.rk) AS r2
    FROM ballots b
    WHERE b.event_type NOT IN (SELECT event_type FROM e1)
      AND b.event_type NOT IN (SELECT event_type FROM e2)
      AND b.event_type NOT IN (SELECT event_type FROM e3)
  ) t WHERE r2 = 1 GROUP BY 1
), e4 AS (
  SELECT event_type, votes FROM f4
  ORDER BY votes ASC, event_type ASC LIMIT 1
), f5 AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS votes
  FROM (
    SELECT b.day, b.event_type,
           row_number() OVER (PARTITION BY b.day ORDER BY b.rk) AS r2
    FROM ballots b
    WHERE b.event_type NOT IN (SELECT event_type FROM e1)
      AND b.event_type NOT IN (SELECT event_type FROM e2)
      AND b.event_type NOT IN (SELECT event_type FROM e3)
      AND b.event_type NOT IN (SELECT event_type FROM e4)
  ) t WHERE r2 = 1 GROUP BY 1
)
SELECT CAST(1 AS BIGINT) AS round, event_type, votes,
       'eliminated' AS outcome FROM e1
UNION ALL
SELECT 2, event_type, votes, 'eliminated' FROM e2
UNION ALL
SELECT 3, event_type, votes, 'eliminated' FROM e3
UNION ALL
SELECT 4, event_type, votes, 'eliminated' FROM e4
UNION ALL
SELECT 5, event_type, votes, 'winner' FROM f5
ORDER BY round
"""
    return sql


QUERIES["instant_runoff_voting"] = q_instant_runoff_voting
ORACLE_SQL["instant_runoff_voting"] = _irv_sql()


# ===========================================================================
# Battery AG — state-space kernels (rows-only + pytest pins): local-
# level Kalman filtering and Bayesian online changepoint detection.
# ===========================================================================


def q_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.statekernels import kalman_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.avg("value").alias("y"))
    out = kalman_frame(daily, "event_type", "day", "y", q=1.0, r=10.0)
    return out.select(
        "event_type",
        "n",
        F.round("level", 4).alias("level"),
        F.round("loglik", 4).alias("loglik"),
        F.round("gain_gap", 8).alias("gain_gap"),
    ).orderBy("event_type")


QUERIES["kalman_local_level"] = q_kalman_local_level


def q_bocd_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.statekernels import bocd_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    out = bocd_frame(daily, "event_type", "day", "y", hazard=0.02)
    return out.orderBy("event_type")


QUERIES["bocd_changepoints"] = q_bocd_changepoints


# ===========================================================================
# Battery AH — decision theory: first/second-order stochastic
# dominance of the day distribution over the night distribution, and
# CRRA certainty equivalents (mean / geometric / harmonic ladder).
# ===========================================================================


# ---------------------------------------------------------------------------
# stochastic_dominance — FSD/SSD violation measures day vs night
# ---------------------------------------------------------------------------
# F-diff at each distinct value from exact cumulative counts; FSD of
# day over night holds iff F_day <= F_night everywhere.  Reports max
# violation of FSD, and the SSD check on integrated CDFs (exact
# value-weighted cumulative sums); the epsilon-ASD ratio = violation
# area / total area between the CDFs.


def q_stochastic_dominance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
        F.when(F.hour("ts").between(8, 19), 1).otherwise(0).alias("g"),
    ).groupBy("event_type", "v").agg(
        F.sum("g").alias("ca"),
        F.sum(1 - F.col("g")).alias("cb"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    c = (
        cnt.withColumn("cuma", F.sum("ca").over(w))
        .withColumn("cumb", F.sum("cb").over(w))
        .withColumn("na", F.sum("ca").over(wn))
        .withColumn("nb", F.sum("cb").over(wn))
        .withColumn("nxt", F.lead("v").over(
            Window.partitionBy("event_type").orderBy("v")
        ))
    )
    # F-difference on the step interval [v, nxt)
    fa = F.col("cuma").cast("double") / F.col("na").cast("double")
    fb = F.col("cumb").cast("double") / F.col("nb").cast("double")
    width = (F.col("nxt") - F.col("v")).cast("double")
    diff = fa - fb  # > 0 violates day-FSD
    viol9 = F.floor(
        F.when(diff > 0, diff).otherwise(0.0)
        * F.coalesce(width, F.lit(0.0))
        * 1e9
        + F.lit(_OFF)
    ).cast("long")
    area9 = F.floor(
        F.abs(diff) * F.coalesce(width, F.lit(0.0)) * 1e9 + F.lit(_OFF)
    ).cast("long")
    maxv9 = F.floor(
        F.when(diff > 0, diff).otherwise(0.0) * 1e9 + F.lit(_OFF)
    ).cast("long")
    agg = c.select(
        "event_type",
        viol9.alias("v9"),
        area9.alias("a9"),
        maxv9.alias("m9"),
    ).groupBy("event_type").agg(
        F.sum("v9").alias("sv9"),
        F.sum("a9").alias("sa9"),
        F.max("m9").alias("mx9"),
    )
    eps = F.col("sv9").cast("double") / F.col("sa9").cast("double")
    return (
        agg.filter(F.col("sa9") > 0)
        .select(
            "event_type",
            F.floor(
                F.col("mx9").cast("double") / 1e9 * 1_000_000
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("max_fsd_violation_e6"),
            F.floor(eps * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "asd_epsilon_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_STOCH_DOM = f"""
WITH cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(sum(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
                       THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
                       THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM events GROUP BY 1, 2
), c AS (
  SELECT *,
         CAST(sum(ca) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumb,
         CAST(sum(ca) OVER (PARTITION BY event_type) AS BIGINT) AS na,
         CAST(sum(cb) OVER (PARTITION BY event_type) AS BIGINT) AS nb,
         lead(v) OVER (PARTITION BY event_type ORDER BY v) AS nxt
  FROM cnt
), terms AS (
  SELECT event_type,
         CAST(floor(greatest(CAST(cuma AS DOUBLE) / na
                             - CAST(cumb AS DOUBLE) / nb, 0.0)
                    * coalesce(nxt - v, 0) * 1e9 + {_OFF})
              AS BIGINT) AS v9,
         CAST(floor(abs(CAST(cuma AS DOUBLE) / na
                        - CAST(cumb AS DOUBLE) / nb)
                    * coalesce(nxt - v, 0) * 1e9 + {_OFF})
              AS BIGINT) AS a9,
         CAST(floor(greatest(CAST(cuma AS DOUBLE) / na
                             - CAST(cumb AS DOUBLE) / nb, 0.0) * 1e9
                    + {_OFF}) AS BIGINT) AS m9
  FROM c
), agg AS (
  SELECT event_type,
         CAST(sum(v9) AS BIGINT) AS sv9,
         CAST(sum(a9) AS BIGINT) AS sa9,
         max(m9) AS mx9
  FROM terms GROUP BY 1
)
SELECT event_type,
       CAST(floor(CAST(mx9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS max_fsd_violation_e6,
       CAST(floor(CAST(sv9 AS DOUBLE) / sa9 * 1000000 + {_OFF})
            AS BIGINT) AS asd_epsilon_e6
FROM agg
WHERE sa9 > 0
ORDER BY event_type
"""

QUERIES["stochastic_dominance"] = q_stochastic_dominance
ORACLE_SQL["stochastic_dominance"] = SQL_STOCH_DOM


# ---------------------------------------------------------------------------
# risk_preference_ce — CRRA certainty equivalents: gamma = 0 (mean),
# 1 (geometric mean), 2 (harmonic mean), with risk premia
# ---------------------------------------------------------------------------
# Geometric: exp(mean ln v); harmonic: 1/mean(1/v).  ln and 1/v
# collapse to the distinct centi-value domain with e9/e12-floored
# terms; premium_gamma = mean - CE_gamma.


def q_risk_preference_ce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).filter(F.col("v") > 0).groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    vd = F.col("v").cast("double") / 100.0
    cd = F.col("c").cast("double")
    t = cnt.select(
        "event_type",
        "c",
        F.col("c").alias("cc"),
        (F.col("c") * F.col("v")).alias("cv"),
        F.floor(F.log(vd) * cd * 1e9 + F.lit(_OFF)).cast("long").alias(
            "ln9"
        ),
        F.floor(1.0 / vd * cd * 1e12 + F.lit(_OFF)).cast("long").alias(
            "inv12"
        ),
    )
    agg = t.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum("cv").alias("sv"),
        F.sum("ln9").alias("sln"),
        F.sum("inv12").alias("sinv"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sv").cast("double") / nd / 100.0
    geo = F.exp(F.col("sln").cast("double") / 1e9 / nd)
    har = 1.0 / (F.col("sinv").cast("double") / 1e12 / nd)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(mean * 10_000 + F.lit(_OFF)).cast("long").alias(
            "ce_gamma0_e4"
        ),
        F.floor(geo * 10_000 + F.lit(_OFF)).cast("long").alias(
            "ce_gamma1_e4"
        ),
        F.floor(har * 10_000 + F.lit(_OFF)).cast("long").alias(
            "ce_gamma2_e4"
        ),
        F.floor((mean - har) * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("risk_premium2_e4"),
    ).orderBy("event_type")


SQL_RISK_CE = f"""
WITH cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events
  WHERE CAST(floor(value * 100 + {_OFF}) AS BIGINT) > 0
  GROUP BY 1, 2
), t AS (
  SELECT event_type, c, c * v AS cv,
         CAST(floor(ln(v / 100.0) * c * 1e9 + {_OFF})
              AS BIGINT) AS ln9,
         CAST(floor(1.0 / (v / 100.0) * c * 1e12 + {_OFF})
              AS BIGINT) AS inv12
  FROM cnt
), agg AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(cv) AS BIGINT) AS sv,
         CAST(sum(ln9) AS BIGINT) AS sln,
         CAST(sum(inv12) AS BIGINT) AS sinv
  FROM t GROUP BY 1
)
SELECT event_type, n,
       CAST(floor(CAST(sv AS DOUBLE) / n / 100.0 * 10000 + {_OFF})
            AS BIGINT) AS ce_gamma0_e4,
       CAST(floor(exp(CAST(sln AS DOUBLE) / 1e9 / n) * 10000 + {_OFF})
            AS BIGINT) AS ce_gamma1_e4,
       CAST(floor(1.0 / (CAST(sinv AS DOUBLE) / 1e12 / n) * 10000
                  + {_OFF}) AS BIGINT) AS ce_gamma2_e4,
       CAST(floor((CAST(sv AS DOUBLE) / n / 100.0
                   - 1.0 / (CAST(sinv AS DOUBLE) / 1e12 / n)) * 10000
                  + {_OFF}) AS BIGINT) AS risk_premium2_e4
FROM agg
ORDER BY event_type
"""

QUERIES["risk_preference_ce"] = q_risk_preference_ce
ORACLE_SQL["risk_preference_ce"] = SQL_RISK_CE


# ===========================================================================
# Battery AI — empirical pricing: the Myerson/monopoly reserve price
# on the empirical willingness-to-pay distribution, and the revenue
# gain from third-degree (day/night) price discrimination.
# ===========================================================================


# ---------------------------------------------------------------------------
# myerson_reserve — argmax_r r * (1 - F(r)) on the empirical value
# distribution per type
# ---------------------------------------------------------------------------
# Revenue at each candidate price (every distinct value) is the exact
# integer v * n_geq; the argmax uses the (revenue desc, price asc)
# house tie-break; reported against the revenue at the median price.


def q_myerson_reserve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    ).groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    c = cnt.withColumn("ngeq", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(wn)
    )
    c = c.withColumn("rev", F.col("v") * F.col("ngeq"))
    best = c.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max_by(
            F.struct("v", "rev", "ngeq"),
            F.struct(F.col("rev"), -F.col("v")),
        ).alias("b"),
    )
    # median-price revenue for comparison
    wlo = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    med = (
        cnt.withColumn("cumv", F.sum("c").over(wlo))
        .withColumn("n", F.sum("c").over(wn))
        .filter(2 * F.col("cumv") >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("v").alias("vmed"))
    )
    medrev = (
        c.join(F.broadcast(med), "event_type")
        .filter(F.col("v") == F.col("vmed"))
        .select("event_type", F.col("rev").alias("rev_med"))
    )
    out = best.join(medrev, "event_type")
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("b.v").cast("double") / 100.0 * 100 + F.lit(_OFF))
        .cast("long")
        .alias("reserve_price_c"),
        (F.col("b.rev") / 100).cast("long").alias("revenue_at_reserve"),
        (F.col("rev_med") / 100).cast("long").alias("revenue_at_median"),
    ).orderBy("event_type")


SQL_MYERSON = f"""
WITH cnt AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), c AS (
  SELECT *,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS ngeq,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM cnt
), r AS (
  SELECT *, v * ngeq AS rev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v * ngeq DESC, v ASC) AS rk
  FROM c
), med AS (
  SELECT event_type, min(v) AS vmed
  FROM (
    SELECT *,
           CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumv
    FROM c
  ) t WHERE 2 * cumv >= n GROUP BY 1
), medrev AS (
  SELECT c.event_type, c.rev AS rev_med
  FROM r c JOIN med m ON m.event_type = c.event_type
  WHERE c.v = m.vmed
)
SELECT r.event_type, CAST(r.n AS BIGINT) AS n,
       CAST(floor(r.v / 100.0 * 100 + {_OFF}) AS BIGINT)
         AS reserve_price_c,
       CAST(r.rev // 100 AS BIGINT) AS revenue_at_reserve,
       CAST(m.rev_med // 100 AS BIGINT) AS revenue_at_median
FROM r JOIN medrev m ON m.event_type = r.event_type
WHERE r.rk = 1
ORDER BY r.event_type
"""

QUERIES["myerson_reserve"] = q_myerson_reserve
ORACLE_SQL["myerson_reserve"] = SQL_MYERSON


# ---------------------------------------------------------------------------
# segmented_pricing_gain — third-degree price discrimination: optimal
# per-segment (day/night) prices vs the optimal uniform price
# ---------------------------------------------------------------------------
# Same revenue-curve machinery per segment; gain = (rev_day* +
# rev_night*) / rev_uniform* - 1.  Exact integer revenues.


def q_segmented_pricing_gain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
        F.when(F.hour("ts").between(8, 19), 1).otherwise(0).alias("g"),
    ).groupBy("event_type", "g", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    wseg = (
        Window.partitionBy("event_type", "g")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = cnt.withColumn("ngeq", F.sum("c").over(wseg)).withColumn(
        "rev", F.col("v") * F.col("ngeq")
    )
    segbest = seg.groupBy("event_type", "g").agg(
        F.max("rev").alias("rev_seg")
    ).groupBy("event_type").agg(
        F.sum("rev_seg").alias("rev_discrim"),
        F.count(F.lit(1)).alias("n_seg"),
    )
    uni = cnt.groupBy("event_type", "v").agg(F.sum("c").alias("c"))
    wuni = (
        Window.partitionBy("event_type")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ubest = (
        uni.withColumn("ngeq", F.sum("c").over(wuni))
        .withColumn("rev", F.col("v") * F.col("ngeq"))
        .groupBy("event_type")
        .agg(F.max("rev").alias("rev_uniform"))
    )
    out = segbest.join(ubest, "event_type")
    gain = (
        F.col("rev_discrim").cast("double")
        / F.col("rev_uniform").cast("double")
        - 1.0
    )
    return (
        out.filter(F.col("n_seg") == 2)
        .select(
            "event_type",
            (F.col("rev_uniform") / 100).cast("long").alias(
                "rev_uniform"
            ),
            (F.col("rev_discrim") / 100).cast("long").alias(
                "rev_discrim"
            ),
            F.floor(gain * 1_000_000 + F.lit(_OFF))
            .cast("long")
            .alias("gain_e6"),
        )
        .orderBy("event_type")
    )


SQL_SEG_PRICING = f"""
WITH cnt AS (
  SELECT event_type,
         CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
              THEN 1 ELSE 0 END AS g,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
), seg AS (
  SELECT event_type, g, v,
         v * CAST(sum(c) OVER (PARTITION BY event_type, g
                ORDER BY v DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS rev
  FROM cnt
), segbest AS (
  SELECT event_type,
         CAST(sum(rev_seg) AS BIGINT) AS rev_discrim,
         count(*) AS n_seg
  FROM (
    SELECT event_type, g, max(rev) AS rev_seg
    FROM seg GROUP BY 1, 2
  ) t GROUP BY 1
), uni AS (
  SELECT event_type, v, CAST(sum(c) AS BIGINT) AS c
  FROM cnt GROUP BY 1, 2
), ubest AS (
  SELECT event_type, CAST(max(rev) AS BIGINT) AS rev_uniform
  FROM (
    SELECT event_type,
           v * CAST(sum(c) OVER (PARTITION BY event_type
                  ORDER BY v DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS rev
    FROM uni
  ) t GROUP BY 1
)
SELECT s.event_type,
       CAST(u.rev_uniform // 100 AS BIGINT) AS rev_uniform,
       CAST(s.rev_discrim // 100 AS BIGINT) AS rev_discrim,
       CAST(floor((CAST(s.rev_discrim AS DOUBLE) / u.rev_uniform
                   - 1.0) * 1000000 + {_OFF}) AS BIGINT) AS gain_e6
FROM segbest s JOIN ubest u ON u.event_type = s.event_type
WHERE s.n_seg = 2
ORDER BY s.event_type
"""

QUERIES["segmented_pricing_gain"] = q_segmented_pricing_gain
ORACLE_SQL["segmented_pricing_gain"] = SQL_SEG_PRICING


# ===========================================================================
# Battery AJ — maximal information coefficient (equipartition
# approximation) between value and hour-of-day, completing the
# dependence family (dcor / hoeffding_d / chatterjee_xi /
# uncertainty_coeff).
# ===========================================================================


# ---------------------------------------------------------------------------
# mic_equipartition — max over small grids (x, y in 2..4, x*y <= 16)
# of MI(hour-bin, value-quantile-bin) / ln(min(x, y))
# ---------------------------------------------------------------------------
# Reshef et al. (Science 2011) with the EQUIPARTITION restriction
# (true MIC optimizes partition boundaries; the equipartition grid is
# the standard cheap surrogate and is documented as such).  Value
# bins are quantile bins assigned on the collapsed value domain via
# ceil(k * cum_incl / n) — deterministic integers; MI cell terms are
# e9-floored over <= 16 cells per grid.


def q_mic_equipartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("h"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias(
            "v"
        ),
    )
    dom = base.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    cum = dom.withColumn("cumv", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(wn)
    )
    grids = base.sparkSession.createDataFrame(
        [
            (x, y)
            for x in (2, 3, 4)
            for y in (2, 3, 4)
            if x * y <= 16
        ],
        ["gx", "gy"],
    )
    vb = cum.crossJoin(F.broadcast(grids)).select(
        "event_type",
        "v",
        "gx",
        "gy",
        "n",
        F.least(
            F.ceil(
                F.col("gy").cast("double")
                * F.col("cumv").cast("double")
                / F.col("n").cast("double")
            ).cast("long"),
            F.col("gy").cast("long"),
        ).alias("yb"),
    )
    j = base.join(vb, ["event_type", "v"]).select(
        "event_type",
        "gx",
        "gy",
        "n",
        "yb",
        F.floor(
            F.col("h").cast("double") * F.col("gx").cast("double") / 24.0
        ).cast("long").alias("xb"),
    )
    cell = j.groupBy("event_type", "gx", "gy", "n", "xb", "yb").agg(
        F.count(F.lit(1)).alias("nc")
    )
    wx = Window.partitionBy("event_type", "gx", "gy", "xb")
    wy = Window.partitionBy("event_type", "gx", "gy", "yb")
    cell = cell.withColumn("nx", F.sum("nc").over(wx)).withColumn(
        "ny", F.sum("nc").over(wy)
    )
    nd = F.col("n").cast("double")
    term = (
        F.col("nc").cast("double")
        / nd
        * F.log(
            F.col("nc").cast("double")
            * nd
            / (F.col("nx").cast("double") * F.col("ny").cast("double"))
        )
    )
    cell = cell.withColumn(
        "t9", F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
    )
    mi = cell.groupBy("event_type", "gx", "gy").agg(
        F.sum("t9").alias("mi9")
    )
    norm = F.log(
        F.least(F.col("gx"), F.col("gy")).cast("double")
    )
    mic = F.col("mi9").cast("double") / 1e9 / norm
    mi = mi.withColumn(
        "mic6", F.floor(mic * 1e6 + F.lit(_OFF)).cast("long")
    )
    best = mi.groupBy("event_type").agg(
        F.max_by(
            F.struct("gx", "gy", "mic6"),
            F.struct(F.col("mic6"), -F.col("gx"), -F.col("gy")),
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.gx").cast("long").alias("best_gx"),
        F.col("b.gy").cast("long").alias("best_gy"),
        F.col("b.mic6").alias("mic_e6"),
    ).orderBy("event_type")


SQL_MIC = f"""
WITH base AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), dom AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2
), cum AS (
  SELECT *,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumv,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dom
), grids AS (
  SELECT * FROM (VALUES (2,2),(2,3),(2,4),(3,2),(3,3),(3,4),
                        (4,2),(4,3),(4,4)) t(gx, gy)
), vb AS (
  SELECT c.event_type, c.v, g.gx, g.gy, c.n,
         least(CAST(ceil(g.gy * CAST(c.cumv AS DOUBLE) / c.n)
                    AS BIGINT), g.gy) AS yb
  FROM cum c, grids g
), j AS (
  SELECT b.event_type, v.gx, v.gy, v.n, v.yb,
         CAST(floor(b.h * CAST(v.gx AS DOUBLE) / 24.0)
              AS BIGINT) AS xb
  FROM base b
  JOIN vb v ON v.event_type = b.event_type AND v.v = b.v
), cell AS (
  SELECT event_type, gx, gy, n, xb, yb,
         CAST(count(*) AS BIGINT) AS nc
  FROM j GROUP BY 1, 2, 3, 4, 5, 6
), marg AS (
  SELECT *,
         CAST(sum(nc) OVER (PARTITION BY event_type, gx, gy, xb)
              AS BIGINT) AS nx,
         CAST(sum(nc) OVER (PARTITION BY event_type, gx, gy, yb)
              AS BIGINT) AS ny
  FROM cell
), terms AS (
  SELECT event_type, gx, gy,
         CAST(floor(CAST(nc AS DOUBLE) / n
                    * ln(CAST(nc AS DOUBLE) * n
                         / (CAST(nx AS DOUBLE) * ny)) * 1e9 + {_OFF})
              AS BIGINT) AS t9
  FROM marg
), mi AS (
  SELECT event_type, gx, gy,
         CAST(floor(CAST(sum(t9) AS DOUBLE) / 1e9
                    / ln(CAST(least(gx, gy) AS DOUBLE)) * 1e6 + {_OFF})
              AS BIGINT) AS mic6
  FROM terms GROUP BY 1, 2, 3
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY mic6 DESC, gx ASC, gy ASC)
              AS r
  FROM mi
)
SELECT event_type, CAST(gx AS BIGINT) AS best_gx,
       CAST(gy AS BIGINT) AS best_gy, mic6 AS mic_e6
FROM rk WHERE r = 1
ORDER BY event_type
"""

QUERIES["mic_equipartition"] = q_mic_equipartition
ORACLE_SQL["mic_equipartition"] = SQL_MIC


# ===========================================================================
# Battery AK — structural network measures on the (bounded) symmetrized
# type-transition graph: Burt's constraint (structural holes) and the
# Borgatti-Everett core-periphery fit by exhaustive 32-mask search.
# ===========================================================================


def _sym_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized transition weights m_ij = c_ij + c_ji (i != j)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .filter(F.col("nxt") != F.col("event_type"))
        .groupBy(
            F.col("event_type").alias("i"), F.col("nxt").alias("j")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rev = pairs.select(
        F.col("j").alias("i"), F.col("i").alias("j"),
        F.col("c").alias("crev"),
    )
    return (
        pairs.join(rev, ["i", "j"], "full")
        .select(
            F.coalesce(pairs["i"], rev["i"]).alias("i"),
            F.coalesce(pairs["j"], rev["j"]).alias("j"),
            (
                F.coalesce(F.col("c"), F.lit(0))
                + F.coalesce(F.col("crev"), F.lit(0))
            ).alias("m"),
        )
    )


_SYM_WEIGHTS_SQL = """
seq AS (
  SELECT event_type AS i,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS j
  FROM events
), pairs AS (
  SELECT i, j, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE j IS NOT NULL AND j <> i GROUP BY 1, 2
), sym AS (
  SELECT coalesce(a.i, b.j) AS i, coalesce(a.j, b.i) AS j,
         CAST(coalesce(a.c, 0) + coalesce(b.c, 0) AS BIGINT) AS m
  FROM pairs a
  FULL JOIN pairs b ON b.i = a.j AND b.j = a.i
)
"""


# ---------------------------------------------------------------------------
# burt_constraint — Burt (1992) network constraint per event type
# ---------------------------------------------------------------------------
# p_ij = m_ij / sum_j m_ij; c_ij = (p_ij + sum_q p_iq p_qj)^2;
# C_i = sum_j c_ij.  Indirect terms e12-floored per (i, q, j) triple
# (the k^3 <= 125 triple domain).


def q_burt_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = _sym_weights(spark, sf_dir)
    tot = sym.groupBy("i").agg(F.sum("m").alias("mi"))
    p = sym.join(F.broadcast(tot), "i").select(
        "i",
        "j",
        (F.col("m").cast("double") / F.col("mi").cast("double")).alias(
            "p"
        ),
    )
    piq = p.select(
        F.col("i"), F.col("j").alias("q"), F.col("p").alias("piq")
    )
    pqj = p.select(
        F.col("i").alias("q"), F.col("j"), F.col("p").alias("pqj")
    )
    ind = (
        piq.join(pqj, "q")
        .filter((F.col("j") != F.col("i")) & (F.col("q") != F.col("j")))
        .select(
            "i",
            "j",
            F.floor(
                F.col("piq") * F.col("pqj") * 1e12 + F.lit(_OFF)
            ).cast("long").alias("t12"),
        )
        .groupBy("i", "j")
        .agg(F.sum("t12").alias("ind12"))
    )
    cij = p.join(ind, ["i", "j"], "left").select(
        "i",
        "j",
        (
            F.col("p")
            + F.coalesce(F.col("ind12"), F.lit(0)).cast("double") / 1e12
        ).alias("pc"),
    )
    con = cij.groupBy("i").agg(
        F.sum(
            F.floor(
                F.col("pc") * F.col("pc") * 1e9 + F.lit(_OFF)
            ).cast("long")
        ).alias("c9"),
        F.count(F.lit(1)).alias("deg"),
    )
    return con.select(
        F.col("i").alias("event_type"),
        F.col("deg").cast("long").alias("degree"),
        F.floor(
            F.col("c9").cast("double") / 1e9 * 1_000_000 + F.lit(_OFF)
        )
        .cast("long")
        .alias("constraint_e6"),
    ).orderBy("event_type")


SQL_BURT = f"""
WITH {_SYM_WEIGHTS_SQL.strip()}
, tot AS (
  SELECT i, CAST(sum(m) AS BIGINT) AS mi FROM sym GROUP BY 1
), p AS (
  SELECT s.i, s.j, CAST(s.m AS DOUBLE) / t.mi AS p
  FROM sym s JOIN tot t ON t.i = s.i
), ind AS (
  SELECT a.i, b.j,
         CAST(sum(CAST(floor(a.p * b.p * 1e12 + {_OFF}) AS BIGINT))
              AS BIGINT) AS ind12
  FROM p a JOIN p b ON b.i = a.j
  WHERE b.j <> a.i AND a.j <> b.j
  GROUP BY 1, 2
), cij AS (
  SELECT p.i, p.j,
         p.p + coalesce(ind.ind12, 0) / 1e12 AS pc
  FROM p LEFT JOIN ind ON ind.i = p.i AND ind.j = p.j
), con AS (
  SELECT i,
         CAST(sum(CAST(floor(pc * pc * 1e9 + {_OFF}) AS BIGINT))
              AS BIGINT) AS c9,
         count(*) AS deg
  FROM cij GROUP BY 1
)
SELECT i AS event_type, CAST(deg AS BIGINT) AS degree,
       CAST(floor(CAST(c9 AS DOUBLE) / 1e9 * 1000000 + {_OFF})
            AS BIGINT) AS constraint_e6
FROM con
ORDER BY event_type
"""

QUERIES["burt_constraint"] = q_burt_constraint
ORACLE_SQL["burt_constraint"] = SQL_BURT


# ---------------------------------------------------------------------------
# core_periphery_fit — Borgatti-Everett core set by exhaustive search
# over the 32 candidate masks
# ---------------------------------------------------------------------------
# Ideal pattern: 1 unless both endpoints peripheral; fit = Pearson
# correlation between edge weights and the ideal over the 10
# unordered pairs — exact integer sums throughout; best (corr desc,
# smaller core, mask asc) reported.


def q_core_periphery_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = _sym_weights(spark, sf_dir)
    und = sym.filter(F.col("i") < F.col("j"))
    spark_ = sym.sparkSession
    cands = spark_.createDataFrame(
        [(t, 1 << idx) for idx, t in enumerate(sorted(_CANDS))],
        ["t", "bit"],
    )
    masks = spark_.range(1, 31).select(F.col("id").alias("mask"))
    e = (
        und.join(
            F.broadcast(cands.select(F.col("t").alias("i"),
                                     F.col("bit").alias("bi"))), "i"
        )
        .join(
            F.broadcast(cands.select(F.col("t").alias("j"),
                                     F.col("bit").alias("bj"))), "j"
        )
        .crossJoin(F.broadcast(masks))
    )
    ideal = (
        1
        - (
            (F.expr("mask & bi") == 0) & (F.expr("mask & bj") == 0)
        ).cast("long")
    )
    agg = e.select("mask", "m", ideal.alias("y")).groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").alias("sw"),
        F.sum(F.col("m") * F.col("m")).alias("sww"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("m") * F.col("y")).alias("swy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("swy").cast("double") - F.col("sw").cast(
        "double"
    ) * F.col("sy").cast("double")
    dw = nd * F.col("sww").cast("double") - F.col("sw").cast(
        "double"
    ) * F.col("sw").cast("double")
    dy = nd * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    corr = num / F.sqrt(dw * dy)
    scored = agg.filter((dw > 0) & (dy > 0)).select(
        "mask",
        F.floor(corr * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "corr6"
        ),
    )

    def pop(c):
        return sum(
            (F.floor(c / (1 << b)) % 2) for b in range(5)
        )

    scored = scored.withColumn("csize", pop(F.col("mask")).cast("long"))
    w = Window.orderBy(
        F.col("corr6").desc(), F.col("csize").asc(), F.col("mask").asc()
    )
    best = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    core = best.crossJoin(F.broadcast(cands)).filter(
        F.expr("mask & bit") > 0
    ).agg(
        F.max("mask").alias("mask"),
        F.max("corr6").alias("corr6"),
        F.max("csize").alias("csize"),
        F.concat_ws(",", F.sort_array(F.collect_list("t"))).alias(
            "core_members"
        ),
    )
    return core.select(
        "core_members",
        F.col("csize").cast("long").alias("core_size"),
        F.col("corr6").alias("fit_corr_e6"),
    )


def _core_periphery_sql() -> str:
    vals = ", ".join(
        f"('{t}', {1 << idx})"
        for idx, t in enumerate(sorted(_CANDS))
    )
    return f"""
WITH {_SYM_WEIGHTS_SQL.strip()}
, und AS (
  SELECT * FROM sym WHERE i < j
), cands AS (
  SELECT * FROM (VALUES {vals}) t(t, bit)
), masks AS (
  SELECT unnest(generate_series(1, 30)) AS mask
), e AS (
  SELECT mk.mask, u.m,
         1 - CASE WHEN (mk.mask & ci.bit) = 0
                   AND (mk.mask & cj.bit) = 0
                  THEN 1 ELSE 0 END AS y
  FROM und u
  JOIN cands ci ON ci.t = u.i
  JOIN cands cj ON cj.t = u.j
  CROSS JOIN masks mk
), agg AS (
  SELECT mask, count(*) AS n,
         CAST(sum(m) AS BIGINT) AS sw,
         CAST(sum(m * m) AS BIGINT) AS sww,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(m * y) AS BIGINT) AS swy
  FROM e GROUP BY 1
), scored AS (
  SELECT mask,
         CAST(floor((CAST(n AS DOUBLE) * swy
                     - CAST(sw AS DOUBLE) * sy)
                    / sqrt((CAST(n AS DOUBLE) * sww
                            - CAST(sw AS DOUBLE) * sw)
                           * (CAST(n AS DOUBLE) * syy
                              - CAST(sy AS DOUBLE) * sy)) * 1000000
                    + {_OFF}) AS BIGINT) AS corr6,
         CAST(mask % 2 + (mask // 2) % 2 + (mask // 4) % 2
              + (mask // 8) % 2 + (mask // 16) % 2 AS BIGINT) AS csize
  FROM agg
  WHERE CAST(n AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw > 0
    AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
), best AS (
  SELECT * FROM scored
  ORDER BY corr6 DESC, csize ASC, mask ASC LIMIT 1
)
SELECT string_agg(c.t, ',' ORDER BY c.t) AS core_members,
       CAST(max(b.csize) AS BIGINT) AS core_size,
       max(b.corr6) AS fit_corr_e6
FROM best b JOIN cands c ON (b.mask & c.bit) > 0
"""


QUERIES["core_periphery_fit"] = q_core_periphery_fit
ORACLE_SQL["core_periphery_fit"] = _core_periphery_sql()


# ===========================================================================
# Battery AL — cache analytics: LRU hit-rate curves by the Mattson
# stack-distance algorithm (rows-only kernel; one pass gives the hit
# rate at EVERY cache size via the LRU inclusion property).
# ===========================================================================


def q_lru_hit_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.seqkernels import lru_hit_curve_frame

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    reqs = ev.select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("user_id").alias("ref"),
    )
    out = lru_hit_curve_frame(reqs, "event_type", "us", "ref")
    return out.select(
        "event_type",
        "n",
        "n_unique",
        F.round("hit_c1", 4).alias("hit_c1"),
        F.round("hit_c4", 4).alias("hit_c4"),
        F.round("hit_c16", 4).alias("hit_c16"),
    ).orderBy("event_type")


QUERIES["lru_hit_curve"] = q_lru_hit_curve
