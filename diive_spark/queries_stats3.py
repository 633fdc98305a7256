"""Round-4g query registry: corpus concentration, count-process and
randomness diagnostics, graph mixing, and forecast scoring — per-lang
source HHI/Simpson concentration, Poisson dispersion of hourly event
counts, Kendall turning-points randomness test, Wald-Wolfowitz runs
test, Newman degree assortativity of the crawl-order domain graph, and
a multi-model MASE forecast backtest.

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)`` (HUGEINT
trap), derived doubles floor-scaled with the house 1/pi offset.  Every
statistic here is a SINGLE double expression over exact-integer
aggregates (counts, centivalue sums, absolute integer differences), so
the IEEE op tree is identical across engines and the floor-scaled
outputs are bit-identical.

Reference parity notes: diive's analytics layer ships sstats /
histogram / quantile diagnostics over single sensor series
(core/dfun/stats.py); these queries are the corpus-scale and
count-process analogues a crawl/event warehouse needs (concentration,
over-dispersion, randomness screens, forecast accuracy) — same
describe-the-series intent, re-expressed over grouped keys.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _HOURLY_SQL, _OFF, _documents, _hourly

# ---------------------------------------------------------------------------
# source_hhi — Herfindahl-Hirschman / Simpson concentration per language
# ---------------------------------------------------------------------------
# HHI = sum_s (n_s/N)^2 = (sum n_s^2)/N^2; Simpson's unbiased diversity
# D = 1 - sum n_s(n_s-1) / (N(N-1)); effective source count = 1/HHI
# (inverse-Simpson form).  Companion to `gini_sources`: the domain-cap /
# sampling planner reads HHI to spot languages dominated by one crawl
# source.  Two combinable groupBys, every term an exact integer, one
# double division per output — bit-identical across engines.


def q_source_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        _documents(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("n").alias("n_docs"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("sp"),
    )
    hhi = F.col("ss").cast("double") / (
        F.col("n_docs").cast("double") * F.col("n_docs").cast("double")
    )
    simpson = F.lit(1.0) - F.col("sp").cast("double") / (
        F.col("n_docs").cast("double") * (F.col("n_docs").cast("double") - 1.0)
    )
    return agg.select(
        "lang",
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.floor(hhi * 1_000_000 + F.lit(_OFF)).cast("long").alias("hhi_e6"),
        F.floor(simpson * 1_000_000 + F.lit(_OFF)).cast("long").alias("simpson_e6"),
        F.floor(F.lit(1.0) / hhi * 100 + F.lit(_OFF)).cast("long").alias("eff_sources_e2"),
    ).orderBy("lang")


SQL_SOURCE_HHI = f"""
WITH per AS (
  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
), agg AS (
  SELECT lang, count(*) AS n_sources,
         CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(sum(n * n) AS BIGINT) AS ss,
         CAST(sum(n * (n - 1)) AS BIGINT) AS sp
  FROM per GROUP BY 1
)
SELECT lang, CAST(n_sources AS BIGINT) AS n_sources, n_docs,
       CAST(floor(CAST(ss AS DOUBLE) / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS hhi_e6,
       CAST(floor((1.0 - CAST(sp AS DOUBLE)
                         / (CAST(n_docs AS DOUBLE) * (CAST(n_docs AS DOUBLE) - 1.0)))
                  * 1000000 + {_OFF}) AS BIGINT) AS simpson_e6,
       CAST(floor(1.0 / (CAST(ss AS DOUBLE)
                         / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                  * 100 + {_OFF}) AS BIGINT) AS eff_sources_e2
FROM agg
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# poisson_dispersion — over-dispersion of hourly event counts per type
# ---------------------------------------------------------------------------
# Index of dispersion D = s^2 / xbar over occupied-hour counts; the
# chi-square dispersion statistic (n-1)*D tests Poisson-ness (Cox &
# Lewis 1966 ch.6).  Counts, their squares, and the bucket count are
# exact integers from two combinable groupBys; D is one double
# expression (sum-of-squares identity), so the e6-scaled outputs match
# bit-for-bit.  D >> 1 flags bursty (clustered) event arrival — the
# recrawl scheduler's signal for hot types.


def q_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        (
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000)
        ).cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    nd = F.col("n").cast("double")
    scd = F.col("sc").cast("double")
    var = (F.col("sc2").cast("double") - scd * scd / nd) / (nd - 1.0)
    mean = scd / nd
    disp = var / mean
    return agg.select(
        F.col("event_type"),
        F.col("n").cast("long").alias("n"),
        F.col("sc").cast("long").alias("n_events"),
        F.floor(mean * 10_000 + F.lit(_OFF)).cast("long").alias("mean_e4"),
        F.floor(disp * 1_000_000 + F.lit(_OFF)).cast("long").alias("dispersion_e6"),
        F.floor((nd - 1.0) * disp * 10_000 + F.lit(_OFF)).cast("long").alias("chi2_e4"),
    ).orderBy("event_type")


SQL_POISSON_DISPERSION = f"""
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         count(*) AS c
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS sc2
  FROM hourly GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n, sc AS n_events,
       CAST(floor(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) * 10000 + {_OFF})
            AS BIGINT) AS mean_e4,
       CAST(floor((CAST(sc2 AS DOUBLE)
                   - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0)
                  / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS dispersion_e6,
       CAST(floor((CAST(n AS DOUBLE) - 1.0)
                  * ((CAST(sc2 AS DOUBLE)
                      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1.0)
                     / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)))
                  * 10000 + {_OFF}) AS BIGINT) AS chi2_e4
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# turning_points — Kendall's turning-point randomness test per user
# ---------------------------------------------------------------------------
# T = number of strict interior local extrema; under IID randomness
# E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90 (Kendall & Stuart vol.3
# §45.19); z = (T - E)/sqrt(Var).  lag+lead share ONE window sort
# exchange; T and n are exact integers on centivalues, z is one double
# expression.  A cheap whiteness screen next to ljung_box (correlation-
# based) — turning points catch non-randomness that survives the ACF.


def q_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("t")
    h = (
        _hourly(spark, sf_dir)
        .withColumn("vp", F.lag("v").over(w))
        .withColumn("vn", F.lead("v").over(w))
    )
    turn = (
        ((F.col("vp") < F.col("v")) & (F.col("vn") < F.col("v")))
        | ((F.col("vp") > F.col("v")) & (F.col("vn") > F.col("v")))
    ).cast("long")
    agg = h.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("vp").isNotNull() & F.col("vn").isNotNull(), turn)
            .otherwise(F.lit(0))
        ).alias("t_pts"),
    )
    nd = F.col("n").cast("double")
    e = 2.0 * (nd - 2.0) / 3.0
    v = (16.0 * nd - 29.0) / 90.0
    z = (F.col("t_pts").cast("double") - e) / F.sqrt(v)
    return agg.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.col("t_pts").cast("long").alias("t_pts"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("user_id")


SQL_TURNING_POINTS = f"""
WITH {_HOURLY_SQL},
l AS (
  SELECT user_id, v,
         lag(v) OVER w AS vp, lead(v) OVER w AS vn
  FROM hourly WINDOW w AS (PARTITION BY user_id ORDER BY t)
), agg AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CASE WHEN vp IS NOT NULL AND vn IS NOT NULL
                        AND ((vp < v AND vn < v) OR (vp > v AND vn > v))
                       THEN 1 ELSE 0 END) AS BIGINT) AS t_pts
  FROM l GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n, t_pts,
       CAST(floor((CAST(t_pts AS DOUBLE) - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
                  / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# runs_test — Wald-Wolfowitz runs above/below the median per user
# ---------------------------------------------------------------------------
# Median = lower-median exact element pick (rank window, same pattern as
# ts_crossings); values equal to the median are dropped (standard
# dichotomization); R = number of sign runs, mu = 1 + 2 n1 n2 / n,
# sigma^2 = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n-1)) with n = n1+n2
# (Wald & Wolfowitz 1940).  n1/n2/R exact integers; the moments are
# computed in doubles BEFORE multiplying (2*n1*n2*(2*n1*n2-n) overflows
# int64 near n ~ 2^21, so the op tree casts first on BOTH engines).


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    wv = Window.partitionBy("user_id").orderBy("v", "t")
    wn = Window.partitionBy("user_id")
    w = Window.partitionBy("user_id").orderBy("t")
    h = (
        _hourly(spark, sf_dir)
        .withColumn("rnv", F.row_number().over(wv))
        .withColumn("nn", F.count(F.lit(1)).over(wn))
    )
    med = h.filter(
        F.col("rnv") == F.floor((F.col("nn") - 1) / 2) + 1
    ).select("user_id", F.col("v").alias("med"))
    s = (
        h.join(med, "user_id")
        .filter(F.col("v") != F.col("med"))
        .withColumn("abv", (F.col("v") > F.col("med")).cast("long"))
        .withColumn("abv_prev", F.lag("abv").over(w))
        .withColumn(
            "new_run",
            (F.col("abv_prev").isNull() | (F.col("abv") != F.col("abv_prev")))
            .cast("long"),
        )
    )
    agg = s.groupBy("user_id").agg(
        F.sum("abv").alias("n1"),
        F.sum(F.lit(1) - F.col("abv")).alias("n2"),
        F.sum("new_run").alias("runs"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    mu = 1.0 + 2.0 * n1 * n2 / n
    sig2 = (2.0 * n1 * n2) * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    z = (F.col("runs").cast("double") - mu) / F.sqrt(sig2)
    return agg.filter(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n1") + F.col("n2") >= 10)
    ).select(
        "user_id",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("runs").cast("long").alias("runs"),
        F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
    ).orderBy("user_id")


SQL_RUNS_TEST = f"""
WITH {_HOURLY_SQL},
r AS (
  SELECT user_id, t, v,
         row_number() OVER (PARTITION BY user_id ORDER BY v, t) AS rnv,
         count(*) OVER (PARTITION BY user_id) AS nn
  FROM hourly
), med AS (
  SELECT user_id, v AS med FROM r WHERE rnv = (nn - 1) // 2 + 1
), s AS (
  SELECT r.user_id, r.t,
         CASE WHEN r.v > med.med THEN 1 ELSE 0 END AS abv
  FROM r JOIN med ON med.user_id = r.user_id
  WHERE r.v <> med.med
), lagged AS (
  SELECT user_id, abv,
         CASE WHEN lag(abv) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                OR abv <> lag(abv) OVER (PARTITION BY user_id ORDER BY t)
              THEN 1 ELSE 0 END AS new_run
  FROM s
), agg AS (
  SELECT user_id,
         CAST(sum(abv) AS BIGINT) AS n1,
         CAST(sum(1 - abv) AS BIGINT) AS n2,
         CAST(sum(new_run) AS BIGINT) AS runs
  FROM lagged GROUP BY 1
)
SELECT user_id, n1, n2, runs,
       CAST(floor((CAST(runs AS DOUBLE)
                   - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                            / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
                  / sqrt((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                         * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                            - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                         / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                            * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                            * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM agg
WHERE n1 > 0 AND n2 > 0 AND n1 + n2 >= 10
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# degree_assortativity — Newman degree mixing of the crawl-order graph
# ---------------------------------------------------------------------------
# r = Pearson correlation of endpoint degrees over the directed-both-
# ways edge list of the undirected simple graph (Newman PRL 2002 eq. 4)
# — the standard form, which makes sum(x)=sum(y) by symmetry.  Edge
# construction identical to domain_pagerank / triangle_count (crawl-
# order source transitions).  Degrees via one combinable groupBy, two
# broadcast-sized joins back to edges (the node dim is tiny vs the doc
# table), every sum an exact BIGINT; r is one double expression.


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "lang", "source")
    w = Window.partitionBy("lang").orderBy("doc_id")
    e0 = (
        d.withColumn("_nxt", F.lead("source").over(w))
        .filter(F.col("_nxt").isNotNull() & (F.col("source") != F.col("_nxt")))
        .select(
            F.least("source", "_nxt").alias("a"),
            F.greatest("source", "_nxt").alias("b"),
        )
        .distinct()
    )
    deg = (
        e0.select(F.col("a").alias("n"))
        .unionAll(e0.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # both orientations -> symmetric (x, y) sample of size 2m
    pairs = (
        e0.join(F.broadcast(deg.withColumnRenamed("n", "a").withColumnRenamed("deg", "da")), "a")
        .join(F.broadcast(deg.withColumnRenamed("n", "b").withColumnRenamed("deg", "db")), "b")
        .select(
            F.col("da").alias("x"), F.col("db").alias("y")
        )
    )
    sym = pairs.unionAll(pairs.select(F.col("y").alias("x"), F.col("x").alias("y")))
    agg = sym.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    m2 = F.col("m2").cast("double")
    sx = F.col("sx").cast("double")
    num = m2 * F.col("sxy").cast("double") - sx * sx
    den = m2 * F.col("sxx").cast("double") - sx * sx
    return agg.select(
        (F.col("m2") / 2).cast("long").alias("m_edges"),
        F.when(den != 0.0, F.floor(num / den * 1_000_000 + F.lit(_OFF)).cast("long"))
        .alias("assortativity_e6"),
    )


SQL_DEGREE_ASSORTATIVITY = f"""
WITH e0 AS (
  SELECT source AS sa,
         lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS sb
  FROM documents QUALIFY sb IS NOT NULL
), und AS (
  SELECT DISTINCT least(sa, sb) AS a, greatest(sa, sb) AS b
  FROM e0 WHERE sa <> sb
), deg AS (
  SELECT n, count(*) AS deg
  FROM (SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
  GROUP BY n
), pairs AS (
  SELECT d1.deg AS x, d2.deg AS y
  FROM und JOIN deg d1 ON d1.n = und.a JOIN deg d2 ON d2.n = und.b
), sym AS (
  SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs
), agg AS (
  SELECT count(*) AS m2,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM sym
)
SELECT CAST(m2 // 2 AS BIGINT) AS m_edges,
       CASE WHEN CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0
            THEN CAST(floor((CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            / (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * 1000000 + {_OFF}) AS BIGINT)
       END AS assortativity_e6
FROM agg
"""


# ---------------------------------------------------------------------------
# forecast_mase — multi-model backtest scored with MASE per user
# ---------------------------------------------------------------------------
# Hold out the last 24 occupied hours per user; forecast with (a)
# seasonal-naive (value 24 rows earlier), (b) naive (last train value),
# (c) train mean; score each with MASE = mean|err| / in-sample seasonal-
# naive mean|err| (Hyndman & Koehler 2006).  All errors are exact
# integers on centivalues — the mean-model error is kept exact by
# scaling through the train count (|v*den - num| with num = exact train
# sum) — so every MASE is a ratio of exact-integer-derived doubles.
# One sort exchange feeds rank + lag24; the per-key scalars join back
# co-partitioned on user_id.


def q_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("t")
    wn = Window.partitionBy("user_id")
    h = (
        _hourly(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("lag24", F.lag("v", 24).over(w))
        .filter(F.col("n") >= 72)
    )
    train = F.col("rn") <= F.col("n") - 24
    trains = h.filter(train).groupBy("user_id").agg(
        F.sum("v").alias("num"),
        F.count(F.lit(1)).alias("den"),
        F.max(F.when(F.col("rn") == F.col("n") - 24, F.col("v"))).alias("last_v"),
        F.sum(
            F.when(F.col("lag24").isNotNull(), F.abs(F.col("v") - F.col("lag24")))
        ).alias("scale_sum"),
        F.sum(F.when(F.col("lag24").isNotNull(), F.lit(1)).otherwise(F.lit(0))).alias(
            "scale_n"
        ),
    )
    test = (
        h.filter(~train)
        .join(trains, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n").alias("n"),
            F.max("den").alias("den"),
            F.max("num").alias("num"),
            F.max("scale_sum").alias("scale_sum"),
            F.max("scale_n").alias("scale_n"),
            F.sum(F.abs(F.col("v") - F.col("lag24"))).alias("e_snaive"),
            F.sum(F.abs(F.col("v") - F.col("last_v"))).alias("e_naive"),
            F.sum(F.abs(F.col("v") * F.col("den") - F.col("num"))).alias("e_mean_sc"),
        )
        .filter(F.col("scale_sum") > 0)
    )
    scale = F.col("scale_sum").cast("double") / F.col("scale_n").cast("double")
    mase_sn = (F.col("e_snaive").cast("double") / 24.0) / scale
    mase_nv = (F.col("e_naive").cast("double") / 24.0) / scale
    mase_mn = (
        F.col("e_mean_sc").cast("double") / F.col("den").cast("double") / 24.0
    ) / scale
    return test.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.floor(mase_sn * 10_000 + F.lit(_OFF)).cast("long").alias("mase_snaive_e4"),
        F.floor(mase_nv * 10_000 + F.lit(_OFF)).cast("long").alias("mase_naive_e4"),
        F.floor(mase_mn * 10_000 + F.lit(_OFF)).cast("long").alias("mase_mean_e4"),
    ).orderBy("user_id")


SQL_FORECAST_MASE = f"""
WITH {_HOURLY_SQL},
r AS (
  SELECT user_id, t, v,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY user_id) AS n,
         lag(v, 24) OVER w AS lag24
  FROM hourly
  WINDOW w AS (PARTITION BY user_id ORDER BY t)
), f AS (
  SELECT * FROM r WHERE n >= 72
), trains AS (
  SELECT user_id,
         CAST(sum(v) AS BIGINT) AS num,
         count(*) AS den,
         max(CASE WHEN rn = n - 24 THEN v END) AS last_v,
         CAST(sum(CASE WHEN lag24 IS NOT NULL THEN abs(v - lag24) END)
              AS BIGINT) AS scale_sum,
         CAST(sum(CASE WHEN lag24 IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS scale_n
  FROM f WHERE rn <= n - 24 GROUP BY 1
), test AS (
  SELECT f.user_id, max(f.n) AS n, max(trains.den) AS den,
         max(trains.num) AS num,
         max(trains.scale_sum) AS scale_sum, max(trains.scale_n) AS scale_n,
         CAST(sum(abs(f.v - f.lag24)) AS BIGINT) AS e_snaive,
         CAST(sum(abs(f.v - trains.last_v)) AS BIGINT) AS e_naive,
         CAST(sum(abs(f.v * trains.den - trains.num)) AS BIGINT) AS e_mean_sc
  FROM f JOIN trains ON trains.user_id = f.user_id
  WHERE f.rn > f.n - 24 GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(floor((CAST(e_snaive AS DOUBLE) / 24.0)
                  / (CAST(scale_sum AS DOUBLE) / CAST(scale_n AS DOUBLE))
                  * 10000 + {_OFF}) AS BIGINT) AS mase_snaive_e4,
       CAST(floor((CAST(e_naive AS DOUBLE) / 24.0)
                  / (CAST(scale_sum AS DOUBLE) / CAST(scale_n AS DOUBLE))
                  * 10000 + {_OFF}) AS BIGINT) AS mase_naive_e4,
       CAST(floor((CAST(e_mean_sc AS DOUBLE) / CAST(den AS DOUBLE) / 24.0)
                  / (CAST(scale_sum AS DOUBLE) / CAST(scale_n AS DOUBLE))
                  * 10000 + {_OFF}) AS BIGINT) AS mase_mean_e4
FROM test
WHERE scale_sum > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# spectral_entropy — normalized periodogram entropy per user
# ---------------------------------------------------------------------------
# Schuster periodogram power at a fixed 12-period grid (2h..168h) over
# the hourly centivalue series; spectral entropy = -sum p_i ln p_i /
# ln(K) with p_i the normalized powers (the tsfeatures `entropy`
# flavor: low = one dominant cycle, high = white).  Same cross-engine
# trig discipline as lomb_scargle: phase from exact integer (hr mod P)
# so libm argument reduction cannot diverge; map-side literal grid
# explode keeps it ONE shuffle.  Power sums are double folds (ulp-order
# tolerant), so outputs use e4 half-up scaling like lomb_scargle.

_SE_PERIODS = [2, 3, 4, 6, 8, 12, 24, 48, 72, 96, 120, 168]


def q_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _math

    h = _hourly(spark, sf_dir).withColumn("hr", (F.col("t") / 3600).cast("long"))
    st = h.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.avg("v").alias("mu")
    )
    grid = F.explode(
        F.array(*[F.lit(p) for p in _SE_PERIODS])
    ).alias("period_h")
    ph = (
        h.join(st, "user_id")
        .select(
            "user_id",
            "n",
            (F.col("v") - F.col("mu")).alias("dy"),
            "hr",
            grid,
        )
        .withColumn(
            "theta",
            2.0 * _math.pi * (F.col("hr") % F.col("period_h")) / F.col("period_h"),
        )
    )
    pw = ph.groupBy("user_id", "period_h").agg(
        F.max("n").alias("n"),
        F.sum(F.col("dy") * F.cos("theta")).alias("yc"),
        F.sum(F.col("dy") * F.sin("theta")).alias("ys"),
    )
    pw = pw.withColumn(
        "power", F.col("yc") * F.col("yc") + F.col("ys") * F.col("ys")
    )
    tot = pw.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.sum("power").alias("ptot"),
        F.sum(
            F.when(
                F.col("power") > 0,
                F.col("power") * F.log(F.col("power")),
            ).otherwise(F.lit(0.0))
        ).alias("plogp"),
    )
    # H = -sum (p/ptot) ln(p/ptot) = ln(ptot) - plogp/ptot, normalized
    ent = (
        (F.log(F.col("ptot")) - F.col("plogp") / F.col("ptot"))
        / _math.log(len(_SE_PERIODS))
    )
    return (
        tot.filter(F.col("ptot") > 0)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.floor(ent * 10_000 + F.lit(0.5)).cast("long").alias("spec_entropy_e4"),
        )
        .orderBy("user_id")
    )


SQL_SPECTRAL_ENTROPY = f"""
WITH {_HOURLY_SQL},
h AS (
  SELECT user_id, t // 3600 AS hr, v FROM hourly
), st AS (
  SELECT user_id, count(*) AS n, avg(v) AS mu FROM h GROUP BY 1
), ph AS (
  SELECT h.user_id, st.n, (h.v - st.mu) AS dy, g.period_h,
         2 * pi() * (h.hr % g.period_h) / g.period_h AS theta
  FROM h JOIN st USING (user_id)
  CROSS JOIN (SELECT unnest({_SE_PERIODS}) AS period_h) g
), pw AS (
  SELECT user_id, period_h, max(n) AS n,
         sum(dy * cos(theta)) AS yc, sum(dy * sin(theta)) AS ys
  FROM ph GROUP BY 1, 2
), pw2 AS (
  SELECT user_id, n, yc * yc + ys * ys AS power FROM pw
), tot AS (
  SELECT user_id, max(n) AS n, sum(power) AS ptot,
         sum(CASE WHEN power > 0 THEN power * ln(power) ELSE 0.0 END) AS plogp
  FROM pw2 GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(floor((ln(ptot) - plogp / ptot) / ln({len(_SE_PERIODS)})
                  * 10000 + 0.5) AS BIGINT) AS spec_entropy_e4
FROM tot
WHERE ptot > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# clustering_coefficient — per-node local clustering on the domain graph
# ---------------------------------------------------------------------------
# c_i = 2 t_i / (d_i (d_i - 1)) (Watts & Strogatz 1998) with t_i from
# the degree-ordered wedge-closure triangle counter (text/graph.py) —
# the per-node refinement of `triangle_count`.  Degrees and triangle
# counts are exact integers from combinable aggs; c is one double
# division.  Nodes with degree < 2 are excluded (undefined c).


def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.graph import triangle_count

    d = _documents(spark, sf_dir).select("doc_id", "lang", "source")
    w = Window.partitionBy("lang").orderBy("doc_id")
    edges = (
        d.withColumn("_nxt", F.lead("source").over(w))
        .filter(F.col("_nxt").isNotNull())
        .select(F.col("source").alias("src"), F.col("_nxt").alias("dst"))
    )
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_count(edges)
    out = (
        deg.join(tri, "node", "left")
        .withColumn("n_tri", F.coalesce(F.col("n_tri"), F.lit(0)))
        .filter(F.col("deg") >= 2)
    )
    c = 2.0 * F.col("n_tri").cast("double") / (
        F.col("deg").cast("double") * (F.col("deg").cast("double") - 1.0)
    )
    return out.select(
        "node",
        F.col("deg").cast("long").alias("deg"),
        F.col("n_tri").cast("long").alias("n_tri"),
        F.floor(c * 1_000_000 + F.lit(_OFF)).cast("long").alias("clustering_e6"),
    ).orderBy("node")


SQL_CLUSTERING_COEFFICIENT = f"""
WITH e0 AS (
  SELECT source AS sa,
         lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS sb
  FROM documents QUALIFY sb IS NOT NULL
), und AS (
  SELECT DISTINCT least(sa, sb) AS a, greatest(sa, sb) AS b
  FROM e0 WHERE sa <> sb
), deg AS (
  SELECT n AS node, count(*) AS deg
  FROM (SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
  GROUP BY n
), oriented AS (
  SELECT CASE WHEN lo THEN a ELSE b END AS u,
         CASE WHEN lo THEN b ELSE a END AS v,
         CASE WHEN lo THEN db ELSE da END AS dv
  FROM (
    SELECT und.a, und.b, d1.deg AS da, d2.deg AS db,
           (d1.deg < d2.deg OR (d1.deg = d2.deg AND und.a < und.b)) AS lo
    FROM und
    JOIN deg d1 ON d1.node = und.a
    JOIN deg d2 ON d2.node = und.b
  )
), wedges AS (
  SELECT e1.u AS u, e1.v AS v1, e2.v AS v2
  FROM oriented e1 JOIN oriented e2 USING (u)
  WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)
), tris AS (
  SELECT w.u, w.v1, w.v2
  FROM wedges w JOIN oriented o ON o.u = w.v1 AND o.v = w.v2
), tcnt AS (
  SELECT node, count(*) AS n_tri
  FROM (SELECT u AS node FROM tris
        UNION ALL SELECT v1 FROM tris
        UNION ALL SELECT v2 FROM tris)
  GROUP BY node
)
SELECT deg.node, CAST(deg.deg AS BIGINT) AS deg,
       CAST(coalesce(tcnt.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(floor(2.0 * coalesce(tcnt.n_tri, 0)
                  / (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0))
                  * 1000000 + {_OFF}) AS BIGINT) AS clustering_e6
FROM deg LEFT JOIN tcnt ON tcnt.node = deg.node
WHERE deg.deg >= 2
ORDER BY deg.node
"""


# ---------------------------------------------------------------------------
# kcore_2 — 2-core membership after 6 peeling rounds
# ---------------------------------------------------------------------------
# Iterative peeling (Matula & Beck JACM 1983): each round drops nodes
# with current degree < 2 and their edges.  Semantics pinned as "6
# synchronous rounds" on BOTH engines (same fixed-iteration discipline
# as label_propagation / pagerank twins); a pytest pins 6 rounds ==
# true fixpoint at test scale.  Each round = one combinable degree agg
# + two semi-joins; edges only shrink, so round cost is monotonically
# decreasing — the 100 TB posture is 12 bounded shuffles on the EDGE
# set (orders of magnitude smaller than the doc corpus).  The DuckDB
# twin unrolls the rounds with AS MATERIALIZED (multi-referenced CTEs
# would otherwise be inlined exponentially).

_KCORE_K = 2
_KCORE_ROUNDS = 6


def q_kcore_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "lang", "source")
    w = Window.partitionBy("lang").orderBy("doc_id")
    e0 = (
        d.withColumn("_nxt", F.lead("source").over(w))
        .filter(F.col("_nxt").isNotNull() & (F.col("source") != F.col("_nxt")))
        .select(
            F.least("source", "_nxt").alias("a"),
            F.greatest("source", "_nxt").alias("b"),
        )
        .distinct()
    )
    # localCheckpoint per round: each round references `cur` three times
    # (degree union x2 + the semi-join base), so without lineage
    # truncation the logical plan grows 3^rounds and analysis explodes —
    # the same discipline as connected_components (text/graph.py).
    cur = e0.localCheckpoint()
    for _ in range(_KCORE_ROUNDS):
        deg = (
            cur.select(F.col("a").alias("n"))
            .unionAll(cur.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("n")
        cur = (
            cur.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .select("a", "b")
        ).localCheckpoint()
    final_deg = (
        cur.select(F.col("a").alias("node"))
        .unionAll(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= _KCORE_K)
    )
    return final_deg.select(
        "node", F.col("deg").cast("long").alias("deg")
    ).orderBy("node")


def _sql_kcore() -> str:
    parts = [
        """
WITH e_0 AS MATERIALIZED (
  SELECT DISTINCT least(sa, sb) AS a, greatest(sa, sb) AS b
  FROM (
    SELECT source AS sa,
           lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS sb
    FROM documents QUALIFY sb IS NOT NULL
  ) WHERE sa <> sb
)"""
    ]
    for r in range(_KCORE_ROUNDS):
        parts.append(
            f""", keep_{r} AS MATERIALIZED (
  SELECT n FROM (
    SELECT n, count(*) AS deg
    FROM (SELECT a AS n FROM e_{r} UNION ALL SELECT b AS n FROM e_{r})
    GROUP BY n
  ) WHERE deg >= {_KCORE_K}
), e_{r + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM e_{r} e
  WHERE e.a IN (SELECT n FROM keep_{r})
    AND e.b IN (SELECT n FROM keep_{r})
)"""
        )
    last = f"e_{_KCORE_ROUNDS}"
    parts.append(
        f"""
SELECT node, CAST(deg AS BIGINT) AS deg FROM (
  SELECT node, count(*) AS deg
  FROM (SELECT a AS node FROM {last} UNION ALL SELECT b AS node FROM {last})
  GROUP BY node
) WHERE deg >= {_KCORE_K}
ORDER BY node
"""
    )
    return "".join(parts)


# ---------------------------------------------------------------------------
# granger_causality — pairwise lag-1 Granger F-tests between event types
# ---------------------------------------------------------------------------
# Does type B's hourly volume help predict type A's beyond A's own
# lag?  Restricted y_t ~ [1, y_{t-1}] vs unrestricted y_t ~ [1, y_{t-1},
# x_{t-1}]; F = (RSS_r - RSS_u)(n-3)/RSS_u (Granger 1969, standard
# bivariate lag-1 form).  Both RSS come from CLOSED-FORM normal-equation
# algebra over ten exact-integer sums (counts on the shared hour grid,
# zero-filled), so every F is one deterministic double expression — no
# iterative solver.  Plan: one combinable (type, hr) count agg; the
# |types|^2 pair fan-out joins the tiny per-type series through the
# DENSE hour grid (time-bounded, not data-bounded); one lag window per
# pair partition; one final combinable agg.


def q_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cnt = ev.groupBy(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000))
        .cast("long")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    hrs = cnt.select("hr").distinct()
    types = cnt.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") != F.col("tb"))
    )
    grid = pairs.crossJoin(hrs)
    ca = cnt.select(F.col("event_type").alias("ta"), "hr", F.col("c").alias("y"))
    cb = cnt.select(F.col("event_type").alias("tb"), "hr", F.col("c").alias("x"))
    s = (
        grid.join(ca, ["ta", "hr"], "left")
        .join(cb, ["tb", "hr"], "left")
        .fillna(0, subset=["y", "x"])
    )
    w = Window.partitionBy("ta", "tb").orderBy("hr")
    s = (
        s.withColumn("y1", F.lag("y").over(w))
        .withColumn("x1", F.lag("x").over(w))
        .filter(F.col("y1").isNotNull())
    )
    agg = s.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("y1").alias("sy1"),
        F.sum("x1").alias("sx1"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y1") * F.col("y1")).alias("sy1y1"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("y") * F.col("y1")).alias("syy1"),
        F.sum(F.col("y") * F.col("x1")).alias("syx1"),
        F.sum(F.col("y1") * F.col("x1")).alias("sy1x1"),
    )
    nd = F.col("n").cast("double")
    syy_c = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double") / nd
    s11 = F.col("sy1y1").cast("double") - F.col("sy1").cast("double") * F.col("sy1").cast("double") / nd
    s22 = F.col("sx1x1").cast("double") - F.col("sx1").cast("double") * F.col("sx1").cast("double") / nd
    s12 = F.col("sy1x1").cast("double") - F.col("sy1").cast("double") * F.col("sx1").cast("double") / nd
    s1y = F.col("syy1").cast("double") - F.col("sy1").cast("double") * F.col("sy").cast("double") / nd
    s2y = F.col("syx1").cast("double") - F.col("sx1").cast("double") * F.col("sy").cast("double") / nd
    rss_r = syy_c - s1y * s1y / s11
    det = s11 * s22 - s12 * s12
    rss_u = syy_c - (s1y * s1y * s22 - 2.0 * s1y * s2y * s12 + s2y * s2y * s11) / det
    f_stat = (rss_r - rss_u) * (nd - 3.0) / rss_u
    return (
        agg.filter((det > 0) & (F.col("n") > 3))
        .select(
            "ta",
            "tb",
            F.col("n").cast("long").alias("n"),
            F.floor(rss_r * 10_000 + F.lit(_OFF)).cast("long").alias("rss_r_e4"),
            F.floor(rss_u * 10_000 + F.lit(_OFF)).cast("long").alias("rss_u_e4"),
            F.floor(f_stat * 10_000 + F.lit(_OFF)).cast("long").alias("f_e4"),
        )
        .orderBy("ta", "tb")
    )


SQL_GRANGER = f"""
WITH cnt AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         count(*) AS c
  FROM events GROUP BY 1, 2
), hrs AS (
  SELECT DISTINCT hr FROM cnt
), types AS (
  SELECT DISTINCT event_type FROM cnt
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a CROSS JOIN types b WHERE a.event_type <> b.event_type
), s0 AS (
  SELECT p.ta, p.tb, h.hr,
         COALESCE(ca.c, 0) AS y, COALESCE(cb.c, 0) AS x
  FROM pairs p CROSS JOIN hrs h
  LEFT JOIN cnt ca ON ca.event_type = p.ta AND ca.hr = h.hr
  LEFT JOIN cnt cb ON cb.event_type = p.tb AND cb.hr = h.hr
), s AS (
  SELECT ta, tb, y, x,
         lag(y) OVER w AS y1, lag(x) OVER w AS x1
  FROM s0 WINDOW w AS (PARTITION BY ta, tb ORDER BY hr)
), agg AS (
  SELECT ta, tb, count(*) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y1) AS BIGINT) AS sy1,
         CAST(sum(x1) AS BIGINT) AS sx1,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(y1 * y1) AS BIGINT) AS sy1y1,
         CAST(sum(x1 * x1) AS BIGINT) AS sx1x1,
         CAST(sum(y * y1) AS BIGINT) AS syy1,
         CAST(sum(y * x1) AS BIGINT) AS syx1,
         CAST(sum(y1 * x1) AS BIGINT) AS sy1x1
  FROM s WHERE y1 IS NOT NULL GROUP BY 1, 2
), alg AS (
  SELECT ta, tb, n,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS syy_c,
         CAST(sy1y1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE) / CAST(n AS DOUBLE) AS s11,
         CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) AS s22,
         CAST(sy1x1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) AS s12,
         CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS s1y,
         CAST(syx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS s2y
  FROM agg
), fin AS (
  SELECT ta, tb, n,
         syy_c - s1y * s1y / s11 AS rss_r,
         s11 * s22 - s12 * s12 AS det,
         syy_c - (s1y * s1y * s22 - 2.0 * s1y * s2y * s12 + s2y * s2y * s11)
               / (s11 * s22 - s12 * s12) AS rss_u
  FROM alg
)
SELECT ta, tb, CAST(n AS BIGINT) AS n,
       CAST(floor(rss_r * 10000 + {_OFF}) AS BIGINT) AS rss_r_e4,
       CAST(floor(rss_u * 10000 + {_OFF}) AS BIGINT) AS rss_u_e4,
       CAST(floor((rss_r - rss_u) * (CAST(n AS DOUBLE) - 3.0) / rss_u
                  * 10000 + {_OFF}) AS BIGINT) AS f_e4
FROM fin
WHERE det > 0 AND n > 3
ORDER BY ta, tb
"""


# ---------------------------------------------------------------------------
# gumbel_maxima — Gumbel EV1 fit of daily maxima + 30-day return level
# ---------------------------------------------------------------------------
# Block maxima (daily max of the hourly centivalue series) fitted by
# method of moments: beta = s sqrt(6)/pi, mu = mean - gamma*beta
# (Gumbel 1958; gamma = Euler-Mascheroni), return level for period T:
# mu - beta ln(-ln(1 - 1/T)).  Daily maxima are exact integers (max of
# centivalues); mean/std via sum-of-squares identity -> every output is
# a deterministic double expression.  Two combinable groupBys, no
# windows.  The extreme-value companion to max_drawdown/running_records
# for alert-threshold sizing.

_EULER_GAMMA = 0.5772156649015329
_GUMBEL_T = 30


def q_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly(spark, sf_dir)
    daily = h.groupBy(
        "user_id", F.floor(F.col("t") / 86_400).cast("long").alias("day")
    ).agg(F.max("v").alias("mx"))
    agg = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("mx").alias("sm"),
        F.sum(F.col("mx") * F.col("mx")).alias("sm2"),
    )
    nd = F.col("n_days").cast("double")
    mean = F.col("sm").cast("double") / nd
    var = (F.col("sm2").cast("double") - F.col("sm").cast("double") * F.col("sm").cast("double") / nd) / (nd - 1.0)
    beta = F.sqrt(var) * _GUMBEL_C
    mu = mean - _EULER_GAMMA * beta
    rl = mu - beta * _GUMBEL_RL
    return (
        agg.filter((F.col("n_days") >= 5) & (var > 0))
        .select(
            "user_id",
            F.col("n_days").cast("long").alias("n_days"),
            F.floor(mu * 100 + F.lit(_OFF)).cast("long").alias("mu_e2"),
            F.floor(beta * 100 + F.lit(_OFF)).cast("long").alias("beta_e2"),
            F.floor(rl * 100 + F.lit(_OFF)).cast("long").alias("rl30_e2"),
        )
        .orderBy("user_id")
    )


import math as _m

_GUMBEL_C = _m.sqrt(6.0) / _m.pi  # MoM scale factor
_GUMBEL_RL = _m.log(-_m.log(1.0 - 1.0 / _GUMBEL_T))  # ln(-ln(1 - 1/T))

SQL_GUMBEL = f"""
WITH {_HOURLY_SQL},
daily AS (
  SELECT user_id, t // 86400 AS day, max(v) AS mx
  FROM hourly GROUP BY 1, 2
), agg AS (
  SELECT user_id, count(*) AS n_days,
         CAST(sum(mx) AS BIGINT) AS sm,
         CAST(sum(mx * mx) AS BIGINT) AS sm2
  FROM daily GROUP BY 1
), alg AS (
  SELECT user_id, n_days,
         CAST(sm AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
         (CAST(sm2 AS DOUBLE)
          - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n_days AS DOUBLE))
         / (CAST(n_days AS DOUBLE) - 1.0) AS var
  FROM agg
), fit AS (
  SELECT user_id, n_days, var,
         mean - {_EULER_GAMMA!r} * (sqrt(var) * {_GUMBEL_C!r}) AS mu,
         sqrt(var) * {_GUMBEL_C!r} AS beta
  FROM alg
)
SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
       CAST(floor(mu * 100 + {_OFF}) AS BIGINT) AS mu_e2,
       CAST(floor(beta * 100 + {_OFF}) AS BIGINT) AS beta_e2,
       CAST(floor((mu - beta * {_GUMBEL_RL!r}) * 100 + {_OFF}) AS BIGINT) AS rl30_e2
FROM fit
WHERE n_days >= 5 AND var > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# wasserstein_doclen — exact W1 distance between language length mixes
# ---------------------------------------------------------------------------
# W1(P,Q) = integral |F_P - F_Q| over the support (the 1-D optimal-
# transport cost).  Kept EXACT: on the shared global support grid,
# W1 * n_a * n_b = sum over support points of
# |cum_a * n_b - cum_b * n_a| * (next_v - v) — every factor a BIGINT
# (cums <= n, gaps <= value range), so the fold is an exact integer sum
# and the final W1 is one division.  Between adjacent support points
# both CDFs are constant, so evaluating on the UNION grid (a superset
# per pair) only splits segments and never changes the sum.  Plan: one
# (lang, len) count agg; |langs| x |support| cumsum window (per-lang
# sort exchange); pair fan-out joins on the support point.  Overflow
# bound: |cum*n| * gap <= n_a*n_b*range — fine to ~3e18; beyond that
# pre-scale lengths (documented contract).


def q_wasserstein_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("lang", "n_chars")
    cnt = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    support = cnt.select("n_chars").distinct()
    langs = cnt.select("lang").distinct()
    grid = langs.crossJoin(support)
    w = Window.partitionBy("lang").orderBy("n_chars")
    cum = (
        grid.join(cnt, ["lang", "n_chars"], "left")
        .fillna(0, subset=["c"])
        .withColumn(
            "cum",
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("nxt", F.lead("n_chars").over(w))
        .withColumn("tot", F.sum("c").over(Window.partitionBy("lang")))
    )
    a = cum.select(
        F.col("lang").alias("la"),
        "n_chars",
        F.col("cum").alias("cum_a"),
        F.col("nxt").alias("nxt"),
        F.col("tot").alias("n_a"),
    )
    b = cum.select(
        F.col("lang").alias("lb"),
        "n_chars",
        F.col("cum").alias("cum_b"),
        F.col("tot").alias("n_b"),
    )
    j = a.join(b, "n_chars").filter(F.col("la") < F.col("lb"))
    term = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    ) * (F.coalesce(F.col("nxt"), F.col("n_chars")) - F.col("n_chars"))
    agg = j.groupBy("la", "lb").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(term).alias("s"),
    )
    w1 = F.col("s").cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return agg.select(
        "la",
        "lb",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.floor(w1 * 10_000 + F.lit(_OFF)).cast("long").alias("w1_e4"),
    ).orderBy("la", "lb")


SQL_WASSERSTEIN = f"""
WITH cnt AS (
  SELECT lang, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
), support AS (
  SELECT DISTINCT n_chars FROM cnt
), langs AS (
  SELECT DISTINCT lang FROM cnt
), cum AS (
  SELECT g.lang, g.n_chars,
         CAST(sum(COALESCE(cnt.c, 0)) OVER (PARTITION BY g.lang ORDER BY g.n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         lead(g.n_chars) OVER (PARTITION BY g.lang ORDER BY g.n_chars) AS nxt,
         CAST(sum(COALESCE(cnt.c, 0)) OVER (PARTITION BY g.lang) AS BIGINT) AS tot
  FROM (SELECT lang, n_chars FROM langs CROSS JOIN support) g
  LEFT JOIN cnt ON cnt.lang = g.lang AND cnt.n_chars = g.n_chars
), j AS (
  SELECT a.lang AS la, b.lang AS lb, a.n_chars,
         abs(a.cum * b.tot - b.cum * a.tot)
           * (COALESCE(a.nxt, a.n_chars) - a.n_chars) AS term,
         a.tot AS n_a, b.tot AS n_b
  FROM cum a JOIN cum b ON a.n_chars = b.n_chars AND a.lang < b.lang
), agg AS (
  SELECT la, lb, max(n_a) AS n_a, max(n_b) AS n_b,
         CAST(sum(term) AS BIGINT) AS s
  FROM j GROUP BY 1, 2
)
SELECT la, lb, n_a, n_b,
       CAST(floor(CAST(s AS DOUBLE)
                  / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                  * 10000 + {_OFF}) AS BIGINT) AS w1_e4
FROM agg
ORDER BY la, lb
"""


# ---------------------------------------------------------------------------
# mann_whitney_daynight — Mann-Whitney U for day vs night levels
# ---------------------------------------------------------------------------
# The nonparametric twin of the reference's day/night stratification
# idiom (FlagZscoreDaynight): does a user's hourly level differ between
# the 06-18 diel block and the rest?  Average ranks as exact half-
# integers (rank() + (ties-1)/2, the spearman_daily device) make
# 2*R1 and 2*U1 exact BIGINTs; the tie-corrected normal approximation
# z = (U1 - n1 n2/2)/sqrt(n1 n2 ((n+1) - sum(t^3-t)/(n(n-1)))/12)
# (Mann & Whitney 1947; tie form per Lehmann) is one double expression.
# One rank window + one combinable agg + one tiny tie agg.


def q_mann_whitney_daynight(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _hourly(spark, sf_dir).withColumn(
        "is_day",
        ((F.col("t") / 3600 % 24 >= 6) & (F.col("t") / 3600 % 24 < 18)).cast("long"),
    )
    wv = Window.partitionBy("user_id").orderBy("v")
    wt = Window.partitionBy("user_id", "v")
    r = (
        h.withColumn("rk", F.rank().over(wv))
        .withColumn("nt", F.count(F.lit(1)).over(wt))
        # 2 * average rank = 2*rank + (ties - 1), an exact integer
        .withColumn("r2", 2 * F.col("rk") + F.col("nt") - 1)
    )
    agg = r.groupBy("user_id").agg(
        F.sum("is_day").alias("n1"),
        F.sum(F.lit(1) - F.col("is_day")).alias("n2"),
        F.sum(F.when(F.col("is_day") == 1, F.col("r2")).otherwise(F.lit(0))).alias(
            "r1_x2"
        ),
    )
    ties = (
        h.groupBy("user_id", "v")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3")
        )
    )
    out = agg.join(ties, "user_id")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)  # exact int, = 2*U1
    mu_x2 = n1 * n2  # 2 * n1 n2 / 2
    sig2 = (
        n1 * n2 / 12.0 * ((n + 1.0) - F.col("tie3").cast("double") / (n * (n - 1.0)))
    )
    z = (u1_x2.cast("double") - mu_x2) / (2.0 * F.sqrt(sig2))
    return (
        out.filter((F.col("n1") >= 5) & (F.col("n2") >= 5) & (sig2 > 0))
        .select(
            "user_id",
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            u1_x2.cast("long").alias("u1_x2"),
            F.floor(z * 10_000 + F.lit(_OFF)).cast("long").alias("z_e4"),
        )
        .orderBy("user_id")
    )


SQL_MANN_WHITNEY = f"""
WITH {_HOURLY_SQL},
h AS (
  SELECT user_id, t, v,
         CASE WHEN (t / 3600) % 24 >= 6 AND (t / 3600) % 24 < 18
              THEN 1 ELSE 0 END AS is_day
  FROM hourly
), r AS (
  SELECT user_id, v, is_day,
         2 * rank() OVER (PARTITION BY user_id ORDER BY v)
           + count(*) OVER (PARTITION BY user_id, v) - 1 AS r2
  FROM h
), agg AS (
  SELECT user_id,
         CAST(sum(is_day) AS BIGINT) AS n1,
         CAST(sum(1 - is_day) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN is_day = 1 THEN r2 ELSE 0 END) AS BIGINT) AS r1_x2
  FROM r GROUP BY 1
), ties AS (
  SELECT user_id, CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM (
    SELECT user_id, v, count(*) AS t FROM h GROUP BY 1, 2
  ) GROUP BY 1
), fin AS (
  SELECT agg.user_id, n1, n2, r1_x2 - n1 * (n1 + 1) AS u1_x2, tie3
  FROM agg JOIN ties ON ties.user_id = agg.user_id
  WHERE n1 >= 5 AND n2 >= 5
)
SELECT user_id, n1, n2, u1_x2,
       CAST(floor((CAST(u1_x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                  / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                        * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                           - CAST(tie3 AS DOUBLE)
                             / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))))
                  * 10000 + {_OFF}) AS BIGINT) AS z_e4
FROM fin
WHERE CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
      * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
         - CAST(tie3 AS DOUBLE)
           / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
              * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))) > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# topk_churn — day-over-day Jaccard stability of the top-10 user list
# ---------------------------------------------------------------------------
# How much does the daily top-10 heaviest-user list change?  The
# temporal companion of rbo_sources (list similarity across RANKINGS)
# — churn across TIME.  Per-day top-10 via WindowGroupLimit partial
# rank (count desc, user asc — deterministic); consecutive-day overlap
# via one equi-self-join on (user, day+1); Jaccard from exact integers.


def q_topk_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
        "user_id",
    ).agg(F.count(F.lit(1)).alias("c"))
    wd = Window.partitionBy("day").orderBy(F.desc("c"), F.asc("user_id"))
    top = (
        daily.withColumn("rk", F.row_number().over(wd))
        .filter(F.col("rk") <= 10)
        .select("day", "user_id")
    )
    sizes = top.groupBy("day").agg(F.count(F.lit(1)).alias("k"))
    prev = top.select((F.col("day") + 1).alias("day"), "user_id")
    inter = (
        top.join(prev, ["day", "user_id"])
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    psz = sizes.select((F.col("day") + 1).alias("day"), F.col("k").alias("k_prev"))
    out = (
        sizes.join(psz, "day")
        .join(inter, "day", "left")
        .withColumn("n_common", F.coalesce(F.col("n_common"), F.lit(0)))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("k") + F.col("k_prev") - F.col("n_common")
    ).cast("double")
    return out.select(
        "day",
        F.col("k").cast("long").alias("k"),
        F.col("n_common").cast("long").alias("n_common"),
        F.floor(jac * 1_000_000 + F.lit(_OFF)).cast("long").alias("jaccard_e6"),
    ).orderBy("day")


SQL_TOPK_CHURN = f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id,
         count(*) AS c
  FROM events GROUP BY 1, 2
), top AS (
  SELECT day, user_id FROM (
    SELECT day, user_id,
           row_number() OVER (PARTITION BY day ORDER BY c DESC, user_id) AS rk
    FROM daily
  ) WHERE rk <= 10
), sizes AS (
  SELECT day, count(*) AS k FROM top GROUP BY 1
), inter AS (
  SELECT t.day, count(*) AS n_common
  FROM top t JOIN top p ON p.day + 1 = t.day AND p.user_id = t.user_id
  GROUP BY 1
)
SELECT s.day, CAST(s.k AS BIGINT) AS k,
       CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
       CAST(floor(CAST(COALESCE(i.n_common, 0) AS DOUBLE)
                  / CAST(s.k + ps.k - COALESCE(i.n_common, 0) AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS jaccard_e6
FROM sizes s
JOIN sizes ps ON ps.day + 1 = s.day
LEFT JOIN inter i ON i.day = s.day
ORDER BY s.day
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_hhi": q_source_hhi,
    "poisson_dispersion": q_poisson_dispersion,
    "turning_points": q_turning_points,
    "runs_test": q_runs_test,
    "degree_assortativity": q_degree_assortativity,
    "forecast_mase": q_forecast_mase,
    "spectral_entropy": q_spectral_entropy,
    "clustering_coefficient": q_clustering_coefficient,
    "kcore_2": q_kcore_2,
    "granger_causality": q_granger_causality,
    "gumbel_maxima": q_gumbel_maxima,
    "wasserstein_doclen": q_wasserstein_doclen,
    "mann_whitney_daynight": q_mann_whitney_daynight,
    "topk_churn": q_topk_churn,
}

ORACLE_SQL: dict[str, str] = {
    "source_hhi": SQL_SOURCE_HHI,
    "poisson_dispersion": SQL_POISSON_DISPERSION,
    "turning_points": SQL_TURNING_POINTS,
    "runs_test": SQL_RUNS_TEST,
    "degree_assortativity": SQL_DEGREE_ASSORTATIVITY,
    "forecast_mase": SQL_FORECAST_MASE,
    "spectral_entropy": SQL_SPECTRAL_ENTROPY,
    "clustering_coefficient": SQL_CLUSTERING_COEFFICIENT,
    "kcore_2": _sql_kcore(),
    "granger_causality": SQL_GRANGER,
    "gumbel_maxima": SQL_GUMBEL,
    "wasserstein_doclen": SQL_WASSERSTEIN,
    "mann_whitney_daynight": SQL_MANN_WHITNEY,
    "topk_churn": SQL_TOPK_CHURN,
}
