"""Round-4 continuation registry (thirteenth battery): structural-break
and specification econometrics — the Quandt sup-Chow likelihood-ratio
scan (Quandt 1960; Andrews 1993 critical values), MOSUM residual
stability (Bauer & Hackl 1978; Chu, Hornik & Kuan 1995), White's
heteroskedasticity LM test (White 1980), and the Breusch-Godfrey
serial-correlation LM test (Breusch 1978, Godfrey 1978) — none
previously in the registry (chow_test is the single-known-break
variant; breusch_pagan tests variance on the level regressor only).

House oracle conventions: inputs floor-scaled to exact integers with
the 1/pi offset BEFORE any cross-row aggregation; every DuckDB integer
SUM wrapped in CAST(... AS BIGINT); closed forms evaluated as identical
doubles from those exact integers in both engines; derived outputs
floor-scaled, never round()ed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF


def _rss(m: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
         syy: Column) -> Column:
    """Closed-form 1-regressor OLS residual sum of squares from exact
    integer sums (evaluated in doubles; both engines bit-identical)."""
    md = m.cast("double")
    return (
        syy.cast("double")
        - sy.cast("double") * sy.cast("double") / md
        - F.pow(
            sxy.cast("double") - sx.cast("double") * sy.cast("double") / md, 2
        )
        / (sxx.cast("double") - sx.cast("double") * sx.cast("double") / md)
    )


def _rss_sql(m: str, sx: str, sy: str, sxx: str, sxy: str, syy: str) -> str:
    return (
        f"(CAST({syy} AS DOUBLE) "
        f" - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE) / CAST({m} AS DOUBLE)"
        f" - (CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE)"
        f"    / CAST({m} AS DOUBLE)) ^ 2"
        f"   / (CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE)"
        f"      / CAST({m} AS DOUBLE)))"
    )


# ---------------------------------------------------------------------------
# qlr_supchow — Quandt likelihood ratio / sup-F over unknown breakpoints
# ---------------------------------------------------------------------------
# Per event_type, rows in arrival order carry y = centi-value and
# x = row index.  For every candidate break k in the middle 70%
# (Andrews' 15% trimming), the two-segment RSS comes from CUMULATIVE
# integer sums (prefix Sy/Sxy/Syy via a running window; Sx(k), Sxx(k)
# are the closed forms k(k+1)/2 and k(k+1)(2k+1)/6 since x IS the
# index); segment 2 = totals - prefix (RSS is shift-invariant in x, so
# no re-basing).  F(k) = ((RSSf - RSS1 - RSS2)/2) / ((RSS1 + RSS2)/
# (n - 4)); the sup and its argmin-k tie-break compare identical
# doubles in both engines.  One per-key ordered window + one combinable
# max_by — no cross-key shuffle beyond the groupBy.


def q_qlr_supchow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("y"),
    )
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    idx = ev.withColumn("k", F.row_number().over(wo))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("event_type")
    t = (
        idx.withColumn("cy", F.sum("y").over(wc))
        .withColumn("cxy", F.sum(F.col("y") * F.col("k")).over(wc))
        .withColumn("cyy", F.sum(F.col("y") * F.col("y")).over(wc))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("ty", F.sum("y").over(wp))
        .withColumn("txy", F.sum(F.col("y") * F.col("k")).over(wp))
        .withColumn("tyy", F.sum(F.col("y") * F.col("y")).over(wp))
    )
    n = F.col("n")
    k = F.col("k").cast("long")  # row_number is int32; k^3-scale products
    cand = t.filter(
        (k >= F.ceil(n * F.lit(0.15))) & (k <= F.floor(n * F.lit(0.85)))
        & (k >= 3) & (n - k >= 3)
    )
    sx1 = k * (k + 1) / 2
    sxx1 = k * (k + 1) * (2 * k + 1) / 6
    sxn = n * (n + 1) / 2
    sxxn = n * (n + 1) * (2 * n + 1) / 6
    rss1 = _rss(k, sx1, F.col("cy"), sxx1, F.col("cxy"), F.col("cyy"))
    rss2 = _rss(
        n - k, sxn - sx1, F.col("ty") - F.col("cy"), sxxn - sxx1,
        F.col("txy") - F.col("cxy"), F.col("tyy") - F.col("cyy"),
    )
    rssf = _rss(n, sxn, F.col("ty"), sxxn, F.col("txy"), F.col("tyy"))
    fstat = ((rssf - rss1 - rss2) / F.lit(2.0)) / (
        (rss1 + rss2) / (n - 4).cast("double")
    )
    scored = cand.select("event_type", "n", "k", fstat.alias("f"))
    best = scored.groupBy("event_type").agg(
        F.max_by(
            F.struct(F.col("k"), F.col("f"), F.col("n")),
            F.struct(F.col("f"), -F.col("k")),
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.n").cast("long").alias("n"),
        F.col("b.k").cast("long").alias("k_break"),
        F.floor(F.col("b.f") * 10_000 + F.lit(_OFF)).cast("long").alias(
            "sup_f_e4"
        ),
    ).orderBy("event_type")


SQL_QLR = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS y
  FROM events
), idx AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS k
  FROM ev
), t AS (
  SELECT event_type, y, k,
         CAST(sum(y) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cy,
         CAST(sum(y * k)
              OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cxy,
         CAST(sum(y * y) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
                               CURRENT ROW) AS BIGINT) AS cyy,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS ty,
         CAST(sum(y * k) OVER (PARTITION BY event_type) AS BIGINT) AS txy,
         CAST(sum(y * y) OVER (PARTITION BY event_type) AS BIGINT) AS tyy
  FROM idx
  WINDOW w AS (PARTITION BY event_type ORDER BY k)
), cand AS (
  SELECT *,
         k * (k + 1) / 2 AS sx1,
         k * (k + 1) * (2 * k + 1) / 6 AS sxx1,
         n * (n + 1) / 2 AS sxn,
         n * (n + 1) * (2 * n + 1) / 6 AS sxxn
  FROM t
  WHERE k >= ceil(n * 0.15) AND k <= floor(n * 0.85)
    AND k >= 3 AND n - k >= 3
), scored AS (
  SELECT event_type, n, k,
         (({_rss_sql('n', 'sxn', 'ty', 'sxxn', 'txy', 'tyy')}
           - {_rss_sql('k', 'sx1', 'cy', 'sxx1', 'cxy', 'cyy')}
           - {_rss_sql('(n - k)', '(sxn - sx1)', '(ty - cy)', '(sxxn - sxx1)',
                       '(txy - cxy)', '(tyy - cyy)')}) / 2.0)
         / (({_rss_sql('k', 'sx1', 'cy', 'sxx1', 'cxy', 'cyy')}
             + {_rss_sql('(n - k)', '(sxn - sx1)', '(ty - cy)',
                         '(sxxn - sxx1)', '(txy - cxy)', '(tyy - cyy)')})
            / CAST(n - 4 AS DOUBLE)) AS f
  FROM cand
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY f DESC, k) AS rk
  FROM scored
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(k AS BIGINT) AS k_break,
       CAST(floor(f * 10000 + {_OFF}) AS BIGINT) AS sup_f_e4
FROM ranked
WHERE rk = 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# mosum_stability — moving sums of recursive-free OLS residuals
# ---------------------------------------------------------------------------
# Per event_type, stage 1 fits y = a + b*index by closed-form OLS from
# exact integer sums; per-row residuals (identical doubles in both
# engines) are floor-scaled back to centi integers so the h = n/10
# moving window sum is EXACT in both engines (DuckDB's segment-tree
# sliding aggregation vs Spark's running frame would otherwise
# re-associate double additions).  Statistic: max_k |sum of h
# residuals| / (sigma_hat * sqrt(h)) with sigma_hat^2 = RSS/(n-2).


def q_mosum_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("y"),
    )
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wp = Window.partitionBy("event_type")
    idx = ev.withColumn("x", F.row_number().over(wo))
    t = (
        idx.withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("sy", F.sum("y").over(wp))
        .withColumn("sxy", F.sum(F.col("y") * F.col("x")).over(wp))
        .withColumn("syy", F.sum(F.col("y") * F.col("y")).over(wp))
    )
    n = F.col("n")
    sx = n * (n + 1) / 2
    sxx = n * (n + 1) * (2 * n + 1) / 6
    den = n.cast("double") * F.col("sxx_c") - F.col("sx_c") * F.col("sx_c")
    t = t.withColumn("sx_c", sx.cast("double")).withColumn(
        "sxx_c", sxx.cast("double")
    )
    b = (
        n.cast("double") * F.col("sxy").cast("double")
        - F.col("sx_c") * F.col("sy").cast("double")
    ) / den
    a = (F.col("sy").cast("double") - b * F.col("sx_c")) / n.cast("double")
    resid = F.col("y").cast("double") - a - b * F.col("x").cast("double")
    t = t.withColumn("r", F.floor(resid + F.lit(_OFF)).cast("long")).withColumn(
        "h", F.floor(n / 10).cast("long")
    )
    rssf = _rss(n, sx, F.col("sy"), sxx, F.col("sxy"), F.col("syy"))
    t = t.withColumn("sigma2", rssf / (n - 2).cast("double"))
    # h varies per key, so the exact trailing-h integer sum is the
    # cum-sum difference cr_k - cr_{k-h} via a per-key equi self-join
    wc = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("cr", F.sum("r").over(wc))
    left = t.select(
        "event_type", "x", "n", "h", "cr", "sigma2"
    )
    right = t.select(
        F.col("event_type").alias("event_type_r"),
        F.col("x").alias("x_r"),
        F.col("cr").alias("cr_r"),
    )
    m = (
        left.filter(F.col("x") >= F.col("h"))
        .join(
            right,
            (F.col("event_type") == F.col("event_type_r"))
            & (F.col("x_r") == F.col("x") - F.col("h")),
            "left",
        )
        .withColumn("msum", F.col("cr") - F.coalesce(F.col("cr_r"), F.lit(0)))
    )
    stat = F.abs(F.col("msum")).cast("double") / F.sqrt(
        F.col("sigma2") * F.col("h").cast("double")
    )
    scored = m.select("event_type", "n", "h", "x", stat.alias("s"))
    best = scored.groupBy("event_type").agg(
        F.max_by(
            F.struct(F.col("x"), F.col("s"), F.col("n"), F.col("h")),
            F.struct(F.col("s"), -F.col("x")),
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.n").cast("long").alias("n"),
        F.col("b.h").cast("long").alias("h"),
        F.col("b.x").cast("long").alias("k_end"),
        F.floor(F.col("b.s") * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "mosum_max_e6"
        ),
    ).orderBy("event_type")


SQL_MOSUM = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS y
  FROM events
), idx AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS x
  FROM ev
), t AS (
  SELECT event_type, y, x,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS sy,
         CAST(sum(y * x) OVER (PARTITION BY event_type) AS BIGINT) AS sxy,
         CAST(sum(y * y) OVER (PARTITION BY event_type) AS BIGINT) AS syy
  FROM idx
), fit AS (
  SELECT *,
         CAST(n * (n + 1) / 2 AS DOUBLE) AS sx_c,
         CAST(n * (n + 1) * (2 * n + 1) / 6 AS DOUBLE) AS sxx_c,
         floor(n / 10) AS h
  FROM t
), r AS (
  SELECT event_type, x, n, h,
         CAST(floor(CAST(y AS DOUBLE)
               - (CAST(sy AS DOUBLE)
                  - (n * CAST(sxy AS DOUBLE) - sx_c * CAST(sy AS DOUBLE))
                    / (n * sxx_c - sx_c * sx_c) * sx_c) / n
               - (n * CAST(sxy AS DOUBLE) - sx_c * CAST(sy AS DOUBLE))
                 / (n * sxx_c - sx_c * sx_c) * x
               + {_OFF}) AS BIGINT) AS res,
         ({_rss_sql('n', 'sx_c', 'sy', 'sxx_c', 'sxy', 'syy')})
           / CAST(n - 2 AS DOUBLE) AS sigma2
  FROM fit
), c AS (
  SELECT event_type, x, n, h, sigma2,
         CAST(sum(res) OVER (PARTITION BY event_type ORDER BY x
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cr
  FROM r
), m AS (
  SELECT a.event_type, a.x, a.n, a.h, a.sigma2,
         a.cr - COALESCE(b.cr, 0) AS msum
  FROM c a LEFT JOIN c b
    ON b.event_type = a.event_type AND b.x = a.x - a.h
  WHERE a.x >= a.h
), scored AS (
  SELECT event_type, n, h, x,
         CAST(abs(msum) AS DOUBLE) / sqrt(sigma2 * h) AS s
  FROM m
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY s DESC, x) AS rk
  FROM scored
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(h AS BIGINT) AS h,
       CAST(x AS BIGINT) AS k_end,
       CAST(floor(s * 1000000 + {_OFF}) AS BIGINT) AS mosum_max_e6
FROM ranked
WHERE rk = 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# white_test — White (1980) heteroskedasticity LM: e^2 on (h, h^2)
# ---------------------------------------------------------------------------
# Stage 1 per event_type: OLS of deci-scaled value on hour-of-day from
# exact integer sums; per-row residuals floored back to deci integers.
# Stage 2: auxiliary regression of u = e^2 on (1, h, h^2) solved by
# Cramer's rule on the 3x3 normal equations — every matrix entry is an
# exact BIGINT (h <= 23 so S(h^4) is tiny; u <= ~6.3e6 in deci^2 units
# keeps S(u^2) = S(e^4) inside int64 for per-key n up to ~1e6; coarsen
# the residual floor one decade per 100x key growth).  LM = n * R^2.


def q_white_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.hour("ts").cast("long").alias("h"),
        F.floor(F.col("value") * 10 + F.lit(_OFF)).cast("long").alias("y"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("h").alias("sh"),
        F.sum(F.col("h") * F.col("h")).alias("shh"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("h")).alias("syh"),
    )
    nd = F.col("n").cast("double")
    b = (
        nd * F.col("syh").cast("double")
        - F.col("sh").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("shh").cast("double")
        - F.col("sh").cast("double") * F.col("sh").cast("double")
    )
    a = (F.col("sy").cast("double") - b * F.col("sh").cast("double")) / nd
    coef = g.select("event_type", a.alias("a"), b.alias("b"))
    t = ev.join(F.broadcast(coef), "event_type").withColumn(
        "e",
        F.floor(
            F.col("y").cast("double")
            - F.col("a")
            - F.col("b") * F.col("h").cast("double")
            + F.lit(_OFF)
        ).cast("long"),
    ).withColumn("u", F.col("e") * F.col("e"))
    aux = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("h").alias("s1"),
        F.sum(F.col("h") * F.col("h")).alias("s2"),
        F.sum(F.col("h") * F.col("h") * F.col("h")).alias("s3"),
        F.sum(F.col("h") * F.col("h") * F.col("h") * F.col("h")).alias("s4"),
        F.sum("u").alias("su"),
        F.sum(F.col("u") * F.col("h")).alias("su1"),
        F.sum(F.col("u") * F.col("h") * F.col("h")).alias("su2"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    cu = F.col("su").cast("double")
    c1 = F.col("su1").cast("double")
    c2 = F.col("su2").cast("double")
    suu = F.col("suu").cast("double")
    det = (
        n * (s2 * s4 - s3 * s3)
        - s1 * (s1 * s4 - s3 * s2)
        + s2 * (s1 * s3 - s2 * s2)
    )
    b0 = (
        cu * (s2 * s4 - s3 * s3)
        - s1 * (c1 * s4 - s3 * c2)
        + s2 * (c1 * s3 - s2 * c2)
    ) / det
    b1 = (
        n * (c1 * s4 - c2 * s3)
        - cu * (s1 * s4 - s3 * s2)
        + s2 * (s1 * c2 - s2 * c1)
    ) / det
    b2 = (
        n * (s2 * c2 - s3 * c1)
        - s1 * (s1 * c2 - s2 * c1)
        + cu * (s1 * s3 - s2 * s2)
    ) / det
    ess = b0 * cu + b1 * c1 + b2 * c2 - cu * cu / n
    sst = suu - cu * cu / n
    r2 = ess / sst
    out = aux.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(r2 * 1_000_000 + F.lit(_OFF)).cast("long").alias("r2_e6"),
        F.floor(n * r2 * 10_000 + F.lit(_OFF)).cast("long").alias("lm_e4"),
    )
    return out.orderBy("event_type")


SQL_WHITE = f"""
WITH ev AS (
  SELECT event_type,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         CAST(floor(value * 10 + {_OFF}) AS BIGINT) AS y
  FROM events
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(h) AS BIGINT) AS sh,
         CAST(sum(h * h) AS BIGINT) AS shh,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * h) AS BIGINT) AS syh
  FROM ev GROUP BY 1
), coef AS (
  SELECT event_type,
         (CAST(sy AS DOUBLE)
          - (n * CAST(syh AS DOUBLE) - CAST(sh AS DOUBLE) * sy)
            / (n * CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * sh)
            * sh) / n AS a,
         (n * CAST(syh AS DOUBLE) - CAST(sh AS DOUBLE) * sy)
           / (n * CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * sh) AS b
  FROM g
), t AS (
  SELECT ev.event_type, h,
         CAST(floor(CAST(y AS DOUBLE) - a - b * h + {_OFF}) AS BIGINT) AS e
  FROM ev JOIN coef ON coef.event_type = ev.event_type
), aux AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(h) AS BIGINT) AS s1,
         CAST(sum(h * h) AS BIGINT) AS s2,
         CAST(sum(h * h * h) AS BIGINT) AS s3,
         CAST(sum(h * h * h * h) AS BIGINT) AS s4,
         CAST(sum(e * e) AS BIGINT) AS su,
         CAST(sum(e * e * h) AS BIGINT) AS su1,
         CAST(sum(e * e * h * h) AS BIGINT) AS su2,
         CAST(sum(e * e * e * e) AS BIGINT) AS suu
  FROM t GROUP BY 1
), f AS (
  SELECT event_type, n,
         (CAST(n AS DOUBLE) * (CAST(s2 AS DOUBLE) * s4 - CAST(s3 AS DOUBLE) * s3)
          - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s4 - CAST(s3 AS DOUBLE) * s2)
          + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s3 - CAST(s2 AS DOUBLE) * s2))
           AS det,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
         CAST(s3 AS DOUBLE) AS d3, CAST(s4 AS DOUBLE) AS d4,
         CAST(su AS DOUBLE) AS cu, CAST(su1 AS DOUBLE) AS c1,
         CAST(su2 AS DOUBLE) AS c2, CAST(suu AS DOUBLE) AS suu
  FROM aux
), r AS (
  SELECT event_type, n, nd, cu, c1, c2, suu,
         ((cu * (d2 * d4 - d3 * d3) - d1 * (c1 * d4 - d3 * c2)
           + d2 * (c1 * d3 - d2 * c2)) / det) AS b0,
         ((nd * (c1 * d4 - c2 * d3) - cu * (d1 * d4 - d3 * d2)
           + d2 * (d1 * c2 - d2 * c1)) / det) AS b1,
         ((nd * (d2 * c2 - d3 * c1) - d1 * (d1 * c2 - d2 * c1)
           + cu * (d1 * d3 - d2 * d2)) / det) AS b2
  FROM f
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor((b0 * cu + b1 * c1 + b2 * c2 - cu * cu / nd)
                  / (suu - cu * cu / nd) * 1000000 + {_OFF}) AS BIGINT)
         AS r2_e6,
       CAST(floor(nd * (b0 * cu + b1 * c1 + b2 * c2 - cu * cu / nd)
                  / (suu - cu * cu / nd) * 10000 + {_OFF}) AS BIGINT)
         AS lm_e4
FROM r
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# breusch_godfrey — serial-correlation LM (order 1) on the hour fit
# ---------------------------------------------------------------------------
# Same stage-1 hour regression; auxiliary regression of e_t on
# (1, h_t, e_{t-1}) over arrival order, solved by the same 3x3 Cramer
# machinery on exact BIGINT sums (residuals are deci integers <= ~2.5e3
# so every product is <= ~6.3e6 — int64-safe to 10^12 rows per key).
# LM = m * R^2 with m = n - 1 usable rows.


def q_breusch_godfrey(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        "ts",
        F.hour("ts").cast("long").alias("h"),
        F.floor(F.col("value") * 10 + F.lit(_OFF)).cast("long").alias("y"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("h").alias("sh"),
        F.sum(F.col("h") * F.col("h")).alias("shh"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("h")).alias("syh"),
    )
    nd = F.col("n").cast("double")
    b = (
        nd * F.col("syh").cast("double")
        - F.col("sh").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("shh").cast("double")
        - F.col("sh").cast("double") * F.col("sh").cast("double")
    )
    a = (F.col("sy").cast("double") - b * F.col("sh").cast("double")) / nd
    coef = g.select("event_type", a.alias("a"), b.alias("b"))
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = (
        ev.join(F.broadcast(coef), "event_type")
        .withColumn(
            "e",
            F.floor(
                F.col("y").cast("double")
                - F.col("a")
                - F.col("b") * F.col("h").cast("double")
                + F.lit(_OFF)
            ).cast("long"),
        )
        .withColumn("d", F.lag("e", 1).over(wo))
        .filter(F.col("d").isNotNull())
    )
    aux = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("h").alias("s1"),
        F.sum(F.col("h") * F.col("h")).alias("s11"),
        F.sum("d").alias("s2"),
        F.sum(F.col("d") * F.col("d")).alias("s22"),
        F.sum(F.col("h") * F.col("d")).alias("s12"),
        F.sum("e").alias("se"),
        F.sum(F.col("e") * F.col("h")).alias("se1"),
        F.sum(F.col("e") * F.col("d")).alias("se2"),
        F.sum(F.col("e") * F.col("e")).alias("see"),
    )
    m = F.col("m").cast("double")
    s1 = F.col("s1").cast("double")
    s11 = F.col("s11").cast("double")
    s2 = F.col("s2").cast("double")
    s22 = F.col("s22").cast("double")
    s12 = F.col("s12").cast("double")
    ce = F.col("se").cast("double")
    ce1 = F.col("se1").cast("double")
    ce2 = F.col("se2").cast("double")
    see = F.col("see").cast("double")
    det = (
        m * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    b0 = (
        ce * (s11 * s22 - s12 * s12)
        - s1 * (ce1 * s22 - s12 * ce2)
        + s2 * (ce1 * s12 - s11 * ce2)
    ) / det
    b1 = (
        m * (ce1 * s22 - ce2 * s12)
        - ce * (s1 * s22 - s12 * s2)
        + s2 * (s1 * ce2 - s2 * ce1)
    ) / det
    b2 = (
        m * (s11 * ce2 - s12 * ce1)
        - s1 * (s1 * ce2 - s2 * ce1)
        + ce * (s1 * s12 - s11 * s2)
    ) / det
    ess = b0 * ce + b1 * ce1 + b2 * ce2 - ce * ce / m
    sst = see - ce * ce / m
    r2 = ess / sst
    out = aux.select(
        "event_type",
        F.col("m").cast("long").alias("m"),
        F.floor(r2 * 1_000_000 + F.lit(_OFF)).cast("long").alias("r2_e6"),
        F.floor(m * r2 * 10_000 + F.lit(_OFF)).cast("long").alias("lm_e4"),
    )
    return out.orderBy("event_type")


SQL_BG = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         CAST(floor(value * 10 + {_OFF}) AS BIGINT) AS y
  FROM events
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(h) AS BIGINT) AS sh,
         CAST(sum(h * h) AS BIGINT) AS shh,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * h) AS BIGINT) AS syh
  FROM ev GROUP BY 1
), coef AS (
  SELECT event_type,
         (CAST(sy AS DOUBLE)
          - (n * CAST(syh AS DOUBLE) - CAST(sh AS DOUBLE) * sy)
            / (n * CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * sh)
            * sh) / n AS a,
         (n * CAST(syh AS DOUBLE) - CAST(sh AS DOUBLE) * sy)
           / (n * CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * sh) AS b
  FROM g
), resid AS (
  SELECT ev.event_type, ev.event_id, ev.ts, h,
         CAST(floor(CAST(y AS DOUBLE) - a - b * h + {_OFF}) AS BIGINT) AS e
  FROM ev JOIN coef ON coef.event_type = ev.event_type
), lagd AS (
  SELECT event_type, h, e,
         lag(e) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS d
  FROM resid
), t AS (
  SELECT * FROM lagd WHERE d IS NOT NULL
), aux AS (
  SELECT event_type, count(*) AS m,
         CAST(sum(h) AS BIGINT) AS s1,
         CAST(sum(h * h) AS BIGINT) AS s11,
         CAST(sum(d) AS BIGINT) AS s2,
         CAST(sum(d * d) AS BIGINT) AS s22,
         CAST(sum(h * d) AS BIGINT) AS s12,
         CAST(sum(e) AS BIGINT) AS se,
         CAST(sum(e * h) AS BIGINT) AS se1,
         CAST(sum(e * d) AS BIGINT) AS se2,
         CAST(sum(e * e) AS BIGINT) AS see
  FROM t GROUP BY 1
), f AS (
  SELECT event_type, m,
         CAST(m AS DOUBLE) AS md,
         CAST(s1 AS DOUBLE) AS d1, CAST(s11 AS DOUBLE) AS d11,
         CAST(s2 AS DOUBLE) AS d2, CAST(s22 AS DOUBLE) AS d22,
         CAST(s12 AS DOUBLE) AS d12,
         CAST(se AS DOUBLE) AS ce, CAST(se1 AS DOUBLE) AS ce1,
         CAST(se2 AS DOUBLE) AS ce2, CAST(see AS DOUBLE) AS see
  FROM aux
), r AS (
  SELECT event_type, m, md, ce, ce1, ce2, see,
         (md * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
          + d2 * (d1 * d12 - d11 * d2)) AS det,
         d1, d11, d2, d22, d12
  FROM f
), s AS (
  SELECT event_type, m, md, ce, ce1, ce2, see,
         ((ce * (d11 * d22 - d12 * d12) - d1 * (ce1 * d22 - d12 * ce2)
           + d2 * (ce1 * d12 - d11 * ce2)) / det) AS b0,
         ((md * (ce1 * d22 - ce2 * d12) - ce * (d1 * d22 - d12 * d2)
           + d2 * (d1 * ce2 - d2 * ce1)) / det) AS b1,
         ((md * (d11 * ce2 - d12 * ce1) - d1 * (d1 * ce2 - d2 * ce1)
           + ce * (d1 * d12 - d11 * d2)) / det) AS b2
  FROM r
)
SELECT event_type,
       CAST(m AS BIGINT) AS m,
       CAST(floor((b0 * ce + b1 * ce1 + b2 * ce2 - ce * ce / md)
                  / (see - ce * ce / md) * 1000000 + {_OFF}) AS BIGINT)
         AS r2_e6,
       CAST(floor(md * (b0 * ce + b1 * ce1 + b2 * ce2 - ce * ce / md)
                  / (see - ce * ce / md) * 10000 + {_OFF}) AS BIGINT)
         AS lm_e4
FROM s
ORDER BY event_type
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "qlr_supchow": q_qlr_supchow,
    "mosum_stability": q_mosum_stability,
    "white_test": q_white_test,
    "breusch_godfrey": q_breusch_godfrey,
}

ORACLE_SQL: dict[str, str] = {
    "qlr_supchow": SQL_QLR,
    "mosum_stability": SQL_MOSUM,
    "white_test": SQL_WHITE,
    "breusch_godfrey": SQL_BG,
}


# ---------------------------------------------------------------------------
# bws_test — Baumgartner-Weiss-Schindler two-sample test (Biometrics 1998)
# ---------------------------------------------------------------------------
# Weekend vs weekday values per event_type.  B_X = (1/n) sum_i
# (R_i - (m+n)/n * i)^2 / [ (i/(n+1))(1 - i/(n+1)) * m(m+n)/n ] over the
# ordered X sample (R_i = combined rank), symmetrically B_Y; B =
# (B_X + B_Y)/2.  Combined ranks use the house deterministic tie order
# (value, event_id) — documented, matching wald_wolfowitz_2s.  Each
# per-row term is floor-scaled to e6 BEFORE summation so both engines
# sum exact integers.


def q_bws_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("grp"),
    )
    wcomb = Window.partitionBy("event_type").orderBy("v", "event_id")
    wgrp = Window.partitionBy("event_type", "grp").orderBy("v", "event_id")
    wcnt = Window.partitionBy("event_type")
    t = (
        ev.withColumn("r", F.row_number().over(wcomb).cast("long"))
        .withColumn("i", F.row_number().over(wgrp).cast("long"))
        .withColumn("tot", F.count(F.lit(1)).over(wcnt).cast("long"))
        .withColumn(
            "sz",
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type", "grp"))
            .cast("long"),
        )
    )
    nn = F.col("sz").cast("double")
    mm = (F.col("tot") - F.col("sz")).cast("double")
    ii = F.col("i").cast("double")
    rr = F.col("r").cast("double")
    frac = ii / (nn + F.lit(1.0))
    term = (
        F.pow(rr - (mm + nn) / nn * ii, 2)
        / (frac * (F.lit(1.0) - frac) * mm * (mm + nn) / nn)
    )
    t = t.withColumn(
        "term_e6", F.floor(term * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    agg = t.groupBy("event_type", "grp").agg(
        F.max("sz").alias("sz"),
        F.sum("term_e6").alias("s_e6"),
    )
    b = agg.withColumn(
        "b_e6",
        F.floor(
            F.col("s_e6").cast("double") / F.col("sz").cast("double")
            + F.lit(_OFF)
        ).cast("long"),
    )
    wknd = b.filter(F.col("grp") == 1).select(
        "event_type",
        F.col("sz").alias("n_wknd"),
        F.col("b_e6").alias("b_wknd_e6"),
    )
    wday = b.filter(F.col("grp") == 0).select(
        "event_type",
        F.col("sz").alias("n_wday"),
        F.col("b_e6").alias("b_wday_e6"),
    )
    out = wknd.join(wday, "event_type").select(
        "event_type",
        "n_wknd",
        "n_wday",
        "b_wknd_e6",
        "b_wday_e6",
        F.floor(
            (F.col("b_wknd_e6") + F.col("b_wday_e6")).cast("double") / 2.0
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("b_e6"),
    )
    return out.orderBy("event_type")


SQL_BWS = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp
  FROM events
), t AS (
  SELECT event_type, grp,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS r,
         row_number() OVER (PARTITION BY event_type, grp
                            ORDER BY v, event_id) AS i,
         count(*) OVER (PARTITION BY event_type) AS tot,
         count(*) OVER (PARTITION BY event_type, grp) AS sz
  FROM ev
), terms AS (
  SELECT event_type, grp, sz,
         CAST(floor(
           (r - CAST(tot AS DOUBLE) / sz * i) ^ 2
           / ((CAST(i AS DOUBLE) / (sz + 1.0))
              * (1.0 - CAST(i AS DOUBLE) / (sz + 1.0))
              * (tot - sz) * CAST(tot AS DOUBLE) / sz)
           * 1000000 + {_OFF}) AS BIGINT) AS term_e6
  FROM t
), agg AS (
  SELECT event_type, grp, max(sz) AS sz,
         CAST(sum(term_e6) AS BIGINT) AS s_e6
  FROM terms GROUP BY 1, 2
), b AS (
  SELECT event_type, grp, sz,
         CAST(floor(CAST(s_e6 AS DOUBLE) / sz + {_OFF}) AS BIGINT) AS b_e6
  FROM agg
)
SELECT w.event_type,
       CAST(w.sz AS BIGINT) AS n_wknd,
       CAST(d.sz AS BIGINT) AS n_wday,
       w.b_e6 AS b_wknd_e6,
       d.b_e6 AS b_wday_e6,
       CAST(floor(CAST(w.b_e6 + d.b_e6 AS DOUBLE) / 2.0 + {_OFF}) AS BIGINT)
         AS b_e6
FROM b w JOIN b d ON d.event_type = w.event_type
WHERE w.grp = 1 AND d.grp = 0
ORDER BY w.event_type
"""


# ---------------------------------------------------------------------------
# zhang_uniformity — Zhang's ZA statistic (JRSS-B 2002) for uniformity
# of the within-day arrival fraction
# ---------------------------------------------------------------------------
# u_i = microsecond-of-day / 86400e6 in (0,1); ordered u_(i) with the
# house (u, event_id) tie order.  ZA = -sum_i [ ln(u_(i))/(n-i+0.5)
# + ln(1-u_(i))/(i-0.5) ]; large values reject uniform arrivals.
# Per-row terms e6-floored before the exact integer sum.


def q_zhang_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # microsecond-of-day from calendar fields (tz-free: EXTRACT(SECOND)
    # carries the fractional micros as an exact decimal in Spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        (
            F.hour("ts").cast("long") * 3_600_000_000
            + F.minute("ts").cast("long") * 60_000_000
            + (F.expr("extract(second from ts)") * 1_000_000).cast("long")
        ).alias("us"),
    )
    u = F.col("us").cast("double") / 86_400_000_000.0
    t = ev.filter((F.col("us") > 0)).withColumn("u", u)
    wo = Window.partitionBy("event_type").orderBy("u", "event_id")
    wc = Window.partitionBy("event_type")
    t = (
        t.withColumn("i", F.row_number().over(wo).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(wc).cast("long"))
    )
    term = -(
        F.log(F.col("u"))
        / (F.col("n").cast("double") - F.col("i").cast("double") + F.lit(0.5))
        + F.log(F.lit(1.0) - F.col("u"))
        / (F.col("i").cast("double") - F.lit(0.5))
    )
    t = t.withColumn(
        "term_e6", F.floor(term * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    out = t.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum("term_e6").alias("za_e6"),
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("za_e6").cast("long").alias("za_e6"),
    ).orderBy("event_type")


SQL_ZHANG = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(
           EXTRACT(hour FROM ts) * 3600000000
           + EXTRACT(minute FROM ts) * 60000000
           + EXTRACT(microsecond FROM ts)
         AS BIGINT) AS us
  FROM events
), t AS (
  SELECT event_type, event_id,
         CAST(us AS DOUBLE) / 86400000000.0 AS u
  FROM ev WHERE us > 0
), r AS (
  SELECT event_type, u,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY u, event_id) AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM t
), terms AS (
  SELECT event_type, n,
         CAST(floor(
           -(ln(u) / (CAST(n AS DOUBLE) - i + 0.5)
             + ln(1.0 - u) / (CAST(i AS DOUBLE) - 0.5))
           * 1000000 + {_OFF}) AS BIGINT) AS term_e6
  FROM r
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(sum(term_e6) AS BIGINT) AS za_e6
FROM terms
GROUP BY 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# dixon_q — Dixon's Q gap/range outlier ratios per day (Dixon 1950)
# ---------------------------------------------------------------------------
# Per day the r10 ratios at both extremes: (x(2)-x(1))/(x(n)-x(1)) and
# (x(n)-x(n-1))/(x(n)-x(1))) on exact centi order statistics; order
# statistics include duplicates (row_number order), so ties yield 0
# numerators — the classical convention on discretized data.


def q_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.to_date("ts").alias("day"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wa = Window.partitionBy("day").orderBy("v", "event_id")
    wd = Window.partitionBy("day").orderBy(
        F.col("v").desc(), F.col("event_id").desc()
    )
    t = ev.withColumn("ra", F.row_number().over(wa)).withColumn(
        "rd", F.row_number().over(wd)
    )
    agg = t.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("ra") == 1, F.col("v"))).alias("x1"),
        F.max(F.when(F.col("ra") == 2, F.col("v"))).alias("x2"),
        F.max(F.when(F.col("rd") == 2, F.col("v"))).alias("xn1"),
        F.max(F.when(F.col("rd") == 1, F.col("v"))).alias("xn"),
    )
    rng = (F.col("xn") - F.col("x1")).cast("double")
    out = agg.select(
        F.col("day").cast("string").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.col("x1").cast("long").alias("x1"),
        F.col("x2").cast("long").alias("x2"),
        F.col("xn1").cast("long").alias("xn1"),
        F.col("xn").cast("long").alias("xn"),
        F.floor(
            (F.col("x2") - F.col("x1")).cast("double") / rng * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("q_low_e6"),
        F.floor(
            (F.col("xn") - F.col("xn1")).cast("double") / rng * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("q_high_e6"),
    )
    return out.orderBy("day")


SQL_DIXON = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT day, v,
         row_number() OVER (PARTITION BY day ORDER BY v, event_id) AS ra,
         row_number() OVER (PARTITION BY day
                            ORDER BY v DESC, event_id DESC) AS rd
  FROM ev
), agg AS (
  SELECT day, count(*) AS n,
         max(CASE WHEN ra = 1 THEN v END) AS x1,
         max(CASE WHEN ra = 2 THEN v END) AS x2,
         max(CASE WHEN rd = 2 THEN v END) AS xn1,
         max(CASE WHEN rd = 1 THEN v END) AS xn
  FROM t GROUP BY 1
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(n AS BIGINT) AS n,
       CAST(x1 AS BIGINT) AS x1,
       CAST(x2 AS BIGINT) AS x2,
       CAST(xn1 AS BIGINT) AS xn1,
       CAST(xn AS BIGINT) AS xn,
       CAST(floor(CAST(x2 - x1 AS DOUBLE) / (xn - x1) * 1000000 + {_OFF})
            AS BIGINT) AS q_low_e6,
       CAST(floor(CAST(xn - xn1 AS DOUBLE) / (xn - x1) * 1000000 + {_OFF})
            AS BIGINT) AS q_high_e6
FROM agg
ORDER BY day
"""


# ---------------------------------------------------------------------------
# cochran_c_hartley — variance-homogeneity screens over hour-of-day
# groups: Cochran's C (1941) and Hartley's Fmax (1950)
# ---------------------------------------------------------------------------
# 24 hour groups of centi-values; per-group variance from exact BIGINT
# sums (n*Syy - Sy^2 numerator trick); C = max var / sum var, Fmax =
# max var / min var, with argmax/argmin hours (tie -> smaller hour).
# Single-row output; pure combinable two-level agg.


def q_cochran_c_hartley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.hour("ts").cast("long").alias("h"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    g = ev.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sy"),
        F.sum(F.col("v") * F.col("v")).alias("syy"),
    )
    var = (
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("n").cast("double") * (F.col("n") - 1).cast("double")
    )
    g = g.withColumn("var_e4", F.floor(var * 10_000 + F.lit(_OFF)).cast("long"))
    out = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.min("n").alias("n_min"),
        F.max("n").alias("n_max"),
        F.sum("var_e4").alias("sum_var_e4"),
        F.max_by(F.col("h"), F.struct(F.col("var_e4"), -F.col("h"))).alias(
            "h_max"
        ),
        F.min_by(F.col("h"), F.struct(F.col("var_e4"), F.col("h"))).alias(
            "h_min"
        ),
        F.max("var_e4").alias("vmax_e4"),
        F.min("var_e4").alias("vmin_e4"),
    )
    return out.select(
        F.col("k").cast("long").alias("k"),
        F.col("n_min").cast("long").alias("n_min"),
        F.col("n_max").cast("long").alias("n_max"),
        F.col("h_max").cast("long").alias("h_max"),
        F.col("h_min").cast("long").alias("h_min"),
        F.floor(
            F.col("vmax_e4").cast("double")
            / F.col("sum_var_e4").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("cochran_c_e6"),
        F.floor(
            F.col("vmax_e4").cast("double") / F.col("vmin_e4").cast("double")
            * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("fmax_e6"),
    )


SQL_COCHRAN_HARTLEY = f"""
WITH ev AS (
  SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT h, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS sy,
         CAST(sum(v * v) AS BIGINT) AS syy
  FROM ev GROUP BY 1
), v AS (
  SELECT h, n,
         CAST(floor((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                    / (CAST(n AS DOUBLE) * (n - 1)) * 10000 + {_OFF})
              AS BIGINT) AS var_e4
  FROM g
), pick AS (
  SELECT count(*) AS k,
         CAST(min(n) AS BIGINT) AS n_min,
         CAST(max(n) AS BIGINT) AS n_max,
         CAST(sum(var_e4) AS BIGINT) AS sum_var_e4,
         CAST(max(var_e4) AS BIGINT) AS vmax_e4,
         CAST(min(var_e4) AS BIGINT) AS vmin_e4
  FROM v
), hmax AS (
  SELECT h AS h_max FROM v ORDER BY var_e4 DESC, h LIMIT 1
), hmin AS (
  SELECT h AS h_min FROM v ORDER BY var_e4 ASC, h LIMIT 1
)
SELECT CAST(k AS BIGINT) AS k,
       n_min, n_max,
       CAST(h_max AS BIGINT) AS h_max,
       CAST(h_min AS BIGINT) AS h_min,
       CAST(floor(CAST(vmax_e4 AS DOUBLE) / sum_var_e4 * 1000000 + {_OFF})
            AS BIGINT) AS cochran_c_e6,
       CAST(floor(CAST(vmax_e4 AS DOUBLE) / vmin_e4 * 1000000 + {_OFF})
            AS BIGINT) AS fmax_e6
FROM pick CROSS JOIN hmax CROSS JOIN hmin
"""


QUERIES.update(
    {
        "bws_test": q_bws_test,
        "zhang_uniformity": q_zhang_uniformity,
        "dixon_q": q_dixon_q,
        "cochran_c_hartley": q_cochran_c_hartley,
    }
)

ORACLE_SQL.update(
    {
        "bws_test": SQL_BWS,
        "zhang_uniformity": SQL_ZHANG,
        "dixon_q": SQL_DIXON,
        "cochran_c_hartley": SQL_COCHRAN_HARTLEY,
    }
)


# ---------------------------------------------------------------------------
# competing_risks_cif — Aalen-Johansen cumulative incidence (1978)
# ---------------------------------------------------------------------------
# Per user: entry = first activity day, cause-1 event = first purchase,
# cause-2 event = first error (earlier wins; purchase on ties), else
# censored at last activity.  CIF_k(t) = sum_{s<=t} S(s-) d_k(s)/n(s)
# with all-cause KM S.  The strictly-prior ln cumsum (the
# fleming_harrington house pattern) is made engine-exact by e12-flooring
# each ln(1 - d/n) BEFORE the cumulative sum, and e9-flooring each CIF
# increment.  The global orderBy window is bounded by DISTINCT DURATIONS
# (~tens of rows after the per-duration rollup), not by corpus size —
# same scope note as survival_km.


def q_competing_risks_cif(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        .cast("long")
        .alias("day"),
    )
    per_u = ev.groupBy("user_id").agg(
        F.min("day").alias("t0"),
        F.max("day").alias("dlast"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("day"))).alias(
            "p1"
        ),
        F.min(F.when(F.col("event_type") == "error", F.col("day"))).alias(
            "e1"
        ),
    )
    cause = (
        F.when(F.col("p1").isNotNull() & (
            F.col("e1").isNull() | (F.col("p1") <= F.col("e1"))
        ), F.lit(1))
        .when(F.col("e1").isNotNull(), F.lit(2))
        .otherwise(F.lit(0))
    )
    tend = F.when(cause == 1, F.col("p1")).when(cause == 2, F.col("e1")).otherwise(
        F.col("dlast")
    )
    u = per_u.select(
        (tend - F.col("t0")).alias("dur"), cause.alias("cause")
    )
    per_t = u.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum((F.col("cause") == 1).cast("long")).alias("d1"),
        F.sum((F.col("cause") == 2).cast("long")).alias("d2"),
    )
    w_risk = Window.orderBy("dur").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_prior = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = per_t.withColumn("n_risk", F.sum("n_at").over(w_risk))
    dall = (F.col("d1") + F.col("d2")).cast("double")
    # d == n_risk can only happen on the final duration row, whose ln
    # term is never consumed (only strictly-prior rows feed s_prev)
    lnterm = F.when(
        F.col("d1") + F.col("d2") < F.col("n_risk"),
        F.log(F.lit(1.0) - dall / F.col("n_risk").cast("double")),
    ).otherwise(F.lit(0.0))
    t = t.withColumn(
        "ln_e12", F.floor(lnterm * 1e12 + F.lit(_OFF)).cast("long")
    )
    t = t.withColumn(
        "s_prev",
        F.exp(
            F.coalesce(F.sum("ln_e12").over(w_prior), F.lit(0)).cast("double")
            / 1e12
        ),
    )
    inc1 = F.col("s_prev") * F.col("d1").cast("double") / F.col(
        "n_risk"
    ).cast("double")
    inc2 = F.col("s_prev") * F.col("d2").cast("double") / F.col(
        "n_risk"
    ).cast("double")
    t = t.withColumn(
        "i1_e9", F.floor(inc1 * 1e9 + F.lit(_OFF)).cast("long")
    ).withColumn("i2_e9", F.floor(inc2 * 1e9 + F.lit(_OFF)).cast("long"))
    out = t.withColumn("cif1_e9", F.sum("i1_e9").over(w_cum)).withColumn(
        "cif2_e9", F.sum("i2_e9").over(w_cum)
    )
    return out.select(
        F.col("dur").cast("long").alias("dur"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d1").cast("long").alias("d1"),
        F.col("d2").cast("long").alias("d2"),
        F.col("cif1_e9").cast("long").alias("cif1_e9"),
        F.col("cif2_e9").cast("long").alias("cif2_e9"),
    ).orderBy("dur")


SQL_CIF = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), per_u AS (
  SELECT user_id,
         min(day) AS t0,
         max(day) AS dlast,
         min(CASE WHEN event_type = 'purchase' THEN day END) AS p1,
         min(CASE WHEN event_type = 'error' THEN day END) AS e1
  FROM ev GROUP BY 1
), u AS (
  SELECT CASE
           WHEN p1 IS NOT NULL AND (e1 IS NULL OR p1 <= e1) THEN p1 - t0
           WHEN e1 IS NOT NULL THEN e1 - t0
           ELSE dlast - t0
         END AS dur,
         CASE
           WHEN p1 IS NOT NULL AND (e1 IS NULL OR p1 <= e1) THEN 1
           WHEN e1 IS NOT NULL THEN 2
           ELSE 0
         END AS cause
  FROM per_u
), per_t AS (
  SELECT dur, count(*) AS n_at,
         CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
  FROM u GROUP BY 1
), r AS (
  SELECT *,
         CAST(sum(n_at) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW AND
                              UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
  FROM per_t
), l AS (
  SELECT *,
         CAST(floor(CASE WHEN d1 + d2 < n_risk
                         THEN ln(1.0 - CAST(d1 + d2 AS DOUBLE) / n_risk)
                         ELSE 0.0 END * 1e12
                    + {_OFF}) AS BIGINT) AS ln_e12
  FROM r
), s AS (
  SELECT *,
         exp(CAST(COALESCE(sum(ln_e12) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS DOUBLE) / 1e12) AS s_prev
  FROM l
), inc AS (
  SELECT dur, n_risk, d1, d2,
         CAST(floor(s_prev * d1 / n_risk * 1e9 + {_OFF}) AS BIGINT) AS i1_e9,
         CAST(floor(s_prev * d2 / n_risk * 1e9 + {_OFF}) AS BIGINT) AS i2_e9
  FROM s
)
SELECT CAST(dur AS BIGINT) AS dur,
       CAST(n_risk AS BIGINT) AS n_risk,
       d1, d2,
       CAST(sum(i1_e9) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cif1_e9,
       CAST(sum(i2_e9) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cif2_e9
FROM inc
ORDER BY dur
"""


# ---------------------------------------------------------------------------
# getis_ord_g — global Getis-Ord G over the day chain (Getis & Ord 1992)
# ---------------------------------------------------------------------------
# Per event_type, x_i = the day's exact centi-value sum (positive by
# construction); binary contiguity weights w_ij = 1 iff |i-j| = 1.
# G = 2 sum_i x_i x_{i+1} / ((sum x)^2 - sum x^2); E[G] under CSR =
# W / (n(n-1)) with W = 2(n-1).  Everything except the two final ratios
# is an exact BIGINT (moran_calendar / geary_c family).


def q_getis_ord_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = ev.groupBy("event_type", "day").agg(F.sum("v").alias("x"))
    wo = Window.partitionBy("event_type").orderBy("day")
    t = d.withColumn("x_next", F.lead("x").over(wo))
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(
            F.when(
                F.col("x_next").isNotNull(), F.col("x") * F.col("x_next")
            ).otherwise(F.lit(0))
        ).alias("sadj"),
    )
    g = (
        F.lit(2.0)
        * F.col("sadj").cast("double")
        / (
            F.col("sx").cast("double") * F.col("sx").cast("double")
            - F.col("sxx").cast("double")
        )
    )
    eg = (F.lit(2.0) * (F.col("n") - 1).cast("double")) / (
        F.col("n").cast("double") * (F.col("n") - 1).cast("double")
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("sadj").cast("long").alias("s_adj"),
        F.floor(g * 1e9 + F.lit(_OFF)).cast("long").alias("g_e9"),
        F.floor(eg * 1e9 + F.lit(_OFF)).cast("long").alias("eg_e9"),
    ).orderBy("event_type")


SQL_GETIS = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), d AS (
  SELECT event_type, day, CAST(sum(v) AS BIGINT) AS x
  FROM ev GROUP BY 1, 2
), t AS (
  SELECT event_type, x,
         lead(x) OVER (PARTITION BY event_type ORDER BY day) AS x_next
  FROM d
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(CASE WHEN x_next IS NOT NULL THEN x * x_next
                       ELSE 0 END) AS BIGINT) AS sadj
  FROM t GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       sadj AS s_adj,
       CAST(floor(2.0 * sadj / (CAST(sx AS DOUBLE) * sx - sxx) * 1e9
                  + {_OFF}) AS BIGINT) AS g_e9,
       CAST(floor(2.0 * (n - 1) / (CAST(n AS DOUBLE) * (n - 1)) * 1e9
                  + {_OFF}) AS BIGINT) AS eg_e9
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# join_counts — binary join-count statistics on the day chain
# (Moran 1948; Cliff & Ord 1981)
# ---------------------------------------------------------------------------
# Per event_type the day is Black iff its e6-floored daily mean exceeds
# the type's lower-median daily mean (exact order statistic, 15th of
# 30, house deterministic tie order by day).  BB/BW/WW counts over the
# 29 adjacent day pairs are exact integers; expected BB under free
# sampling = W/2 * (nb/n)((nb-1)/(n-1)).


def q_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = ev.groupBy("event_type", "day").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("m")
    )
    d = d.withColumn(
        "mean_e6",
        F.floor(
            F.col("s").cast("double") / F.col("m").cast("double") * 10_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    wmed = Window.partitionBy("event_type").orderBy("mean_e6", "day")
    wn = Window.partitionBy("event_type")
    d = d.withColumn("rk", F.row_number().over(wmed)).withColumn(
        "nd", F.count(F.lit(1)).over(wn)
    )
    med = d.filter(
        F.col("rk") == F.floor((F.col("nd") + 1) / 2).cast("int")
    ).select("event_type", F.col("mean_e6").alias("med_e6"))
    t = d.join(F.broadcast(med), "event_type").withColumn(
        "b", (F.col("mean_e6") > F.col("med_e6")).cast("long")
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    t = t.withColumn("b_next", F.lead("b").over(wo))
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("b").alias("nb"),
        F.sum(
            F.when((F.col("b") == 1) & (F.col("b_next") == 1), 1).otherwise(0)
        ).alias("bb"),
        F.sum(
            F.when(
                F.col("b_next").isNotNull()
                & (F.col("b") != F.col("b_next")),
                1,
            ).otherwise(0)
        ).alias("bw"),
        F.sum(
            F.when((F.col("b") == 0) & (F.col("b_next") == 0), 1).otherwise(0)
        ).alias("ww"),
    )
    ebb = (
        (F.col("n") - 1).cast("double")
        * F.col("nb").cast("double")
        * (F.col("nb") - 1).cast("double")
        / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("nb").cast("long").alias("n_black"),
        F.col("bb").cast("long").alias("bb"),
        F.col("bw").cast("long").alias("bw"),
        F.col("ww").cast("long").alias("ww"),
        F.floor(ebb * 1_000_000 + F.lit(_OFF)).cast("long").alias("ebb_e6"),
    ).orderBy("event_type")


SQL_JOINCOUNTS = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), d AS (
  SELECT event_type, day,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 10000 + {_OFF})
              AS BIGINT) AS mean_e6
  FROM ev GROUP BY 1, 2
), rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY mean_e6, day) AS rk,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM d
), med AS (
  SELECT event_type, mean_e6 AS med_e6
  FROM rk WHERE rk = CAST(floor((nd + 1) / 2) AS INT)
), t AS (
  SELECT d.event_type, d.day,
         CASE WHEN d.mean_e6 > med.med_e6 THEN 1 ELSE 0 END AS b
  FROM d JOIN med ON med.event_type = d.event_type
), c AS (
  SELECT event_type, b,
         lead(b) OVER (PARTITION BY event_type ORDER BY day) AS b_next
  FROM t
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(b) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN b = 1 AND b_next = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS bb,
         CAST(sum(CASE WHEN b_next IS NOT NULL AND b <> b_next
                       THEN 1 ELSE 0 END) AS BIGINT) AS bw,
         CAST(sum(CASE WHEN b = 0 AND b_next = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ww
  FROM c GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       nb AS n_black,
       bb, bw, ww,
       CAST(floor((n - 1) * CAST(nb AS DOUBLE) * (nb - 1)
                  / (CAST(n AS DOUBLE) * (n - 1)) * 1000000 + {_OFF})
            AS BIGINT) AS ebb_e6
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# moses_extreme — Moses test of extreme reactions (Moses 1952)
# ---------------------------------------------------------------------------
# Control = weekday rows, experimental = weekend rows per event_type.
# Combined ranks use the house (value, event_id) tie order; the span of
# the control sample after trimming h = floor(0.05 nc) from each end is
# S_h = r_(nc-h) - r_(h+1) + 1 (exact integers throughout).


def q_moses_extreme(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("grp"),
    )
    wcomb = Window.partitionBy("event_type").orderBy("v", "event_id")
    t = ev.withColumn("r", F.row_number().over(wcomb).cast("long"))
    ctrl = t.filter(F.col("grp") == 0)
    wctrl = Window.partitionBy("event_type").orderBy("r")
    wn = Window.partitionBy("event_type")
    c = (
        ctrl.withColumn("i", F.row_number().over(wctrl).cast("long"))
        .withColumn("nc", F.count(F.lit(1)).over(wn).cast("long"))
        .withColumn("h", F.floor(F.col("nc") * 0.05).cast("long"))
    )
    lo = c.filter(F.col("i") == F.col("h") + 1).select(
        "event_type", F.col("r").alias("r_lo"), "nc", "h"
    )
    hi = c.filter(F.col("i") == F.col("nc") - F.col("h")).select(
        "event_type", F.col("r").alias("r_hi")
    )
    ne = t.filter(F.col("grp") == 1).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ne")
    )
    out = (
        lo.join(hi, "event_type")
        .join(ne, "event_type")
        .select(
            "event_type",
            F.col("nc").alias("n_ctrl"),
            F.col("ne").cast("long").alias("n_exp"),
            F.col("h").alias("h"),
            (F.col("r_hi") - F.col("r_lo") + 1).cast("long").alias("span"),
        )
    )
    return out.orderBy("event_type")


SQL_MOSES = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp
  FROM events
), t AS (
  SELECT event_type, grp,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS r
  FROM ev
), c AS (
  SELECT event_type, r,
         row_number() OVER (PARTITION BY event_type ORDER BY r) AS i,
         count(*) OVER (PARTITION BY event_type) AS nc
  FROM t WHERE grp = 0
), lim AS (
  SELECT event_type, nc, floor(nc * 0.05) AS h
  FROM c GROUP BY 1, 2, floor(nc * 0.05)
), lo AS (
  SELECT c.event_type, c.r AS r_lo, lim.nc, lim.h
  FROM c JOIN lim ON lim.event_type = c.event_type
  WHERE c.i = lim.h + 1
), hi AS (
  SELECT c.event_type, c.r AS r_hi
  FROM c JOIN lim ON lim.event_type = c.event_type
  WHERE c.i = lim.nc - lim.h
), ne AS (
  SELECT event_type, count(*) AS ne
  FROM t WHERE grp = 1 GROUP BY 1
)
SELECT lo.event_type,
       CAST(lo.nc AS BIGINT) AS n_ctrl,
       CAST(ne.ne AS BIGINT) AS n_exp,
       CAST(lo.h AS BIGINT) AS h,
       CAST(hi.r_hi - lo.r_lo + 1 AS BIGINT) AS span
FROM lo
JOIN hi ON hi.event_type = lo.event_type
JOIN ne ON ne.event_type = lo.event_type
ORDER BY lo.event_type
"""


QUERIES.update(
    {
        "competing_risks_cif": q_competing_risks_cif,
        "getis_ord_g": q_getis_ord_g,
        "join_counts": q_join_counts,
        "moses_extreme": q_moses_extreme,
    }
)

ORACLE_SQL.update(
    {
        "competing_risks_cif": SQL_CIF,
        "getis_ord_g": SQL_GETIS,
        "join_counts": SQL_JOINCOUNTS,
        "moses_extreme": SQL_MOSES,
    }
)


# ---------------------------------------------------------------------------
# mack_wolfe — umbrella-pattern alternative over diel buckets
# (Mack & Wolfe 1981, JASA)
# ---------------------------------------------------------------------------
# Four 6-hour diel buckets with known peak p = bucket 2 (12:00-18:00).
# A_p = sum_{i<j<=p} U_ij + sum_{p<=i<j} U_ji with tie-midrank
# Mann-Whitney counts; Jonckheere (in the registry) is the monotone
# special case.  DOUBLED U keeps ties exact: 2U_{uv} = sum_a
# c_v(a) * (2*Cless_u(a) + c_u(a)) from per-value per-bucket cell
# counts and cumulative counts — everything BIGINT until the final
# expectation ratio.  E[A_p] = (N1^2 + N2^2 - sum n_i^2)/4.


def q_mack_wolfe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.hour("ts") / 6).cast("int").alias("g"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    cells = ev.groupBy("event_type", "v").agg(
        F.sum((F.col("g") == 0).cast("long")).alias("c0"),
        F.sum((F.col("g") == 1).cast("long")).alias("c1"),
        F.sum((F.col("g") == 2).cast("long")).alias("c2"),
        F.sum((F.col("g") == 3).cast("long")).alias("c3"),
    )
    wv = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = cells
    for i in range(4):
        t = t.withColumn(
            f"l{i}", F.coalesce(F.sum(f"c{i}").over(wv), F.lit(0))
        )
    # doubled U_{uv}: pairs with u-value < v-value (x2) + ties (x1)
    pairs_asc = [(0, 1), (0, 2), (1, 2)]   # i < j <= p
    pairs_desc = [(2, 3)]                   # p <= i < j, use U_{ji}
    two_a = None
    for u, v in pairs_asc:
        term = F.col(f"c{v}") * (2 * F.col(f"l{u}") + F.col(f"c{u}"))
        two_a = term if two_a is None else two_a + term
    for u, v in pairs_desc:
        term = F.col(f"c{u}") * (2 * F.col(f"l{v}") + F.col(f"c{v}"))
        two_a = two_a + term
    agg = t.groupBy("event_type").agg(
        F.sum(two_a).alias("two_a"),
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum("c3").alias("n3"),
    )
    n1tot = F.col("n0") + F.col("n1") + F.col("n2")
    n2tot = F.col("n2") + F.col("n3")
    ssq = (
        F.col("n0") * F.col("n0")
        + F.col("n1") * F.col("n1")
        + F.col("n2") * F.col("n2")
        + F.col("n3") * F.col("n3")
    )
    ea4 = n1tot * n1tot + n2tot * n2tot - ssq  # 4*E[A_p]
    return agg.select(
        "event_type",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("n3").cast("long").alias("n3"),
        F.col("two_a").cast("long").alias("a_doubled"),
        ea4.cast("long").alias("ea_x4"),
    ).orderBy("event_type")


SQL_MACK_WOLFE = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS g,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), cells AS (
  SELECT event_type, v,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT *,
         CAST(COALESCE(sum(c0) OVER w, 0) AS BIGINT) AS l0,
         CAST(COALESCE(sum(c1) OVER w, 0) AS BIGINT) AS l1,
         CAST(COALESCE(sum(c2) OVER w, 0) AS BIGINT) AS l2,
         CAST(COALESCE(sum(c3) OVER w, 0) AS BIGINT) AS l3
  FROM cells
  WINDOW w AS (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), agg AS (
  SELECT event_type,
         CAST(sum(  c1 * (2 * l0 + c0)
                  + c2 * (2 * l0 + c0)
                  + c2 * (2 * l1 + c1)
                  + c2 * (2 * l3 + c3)) AS BIGINT) AS two_a,
         CAST(sum(c0) AS BIGINT) AS n0,
         CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c3) AS BIGINT) AS n3
  FROM cum GROUP BY 1
)
SELECT event_type, n0, n1, n2, n3,
       two_a AS a_doubled,
       CAST((n0 + n1 + n2) * (n0 + n1 + n2) + (n2 + n3) * (n2 + n3)
            - (n0*n0 + n1*n1 + n2*n2 + n3*n3) AS BIGINT) AS ea_x4
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# kendall_tau_c — Stuart's tau-c on the diel-bucket x value-quartile
# grid (Stuart 1953)
# ---------------------------------------------------------------------------
# tau_c = 2m(C - D) / (n^2 (m-1)) with m = min(rows, cols) = 4; C/D
# from exact cell counts of the 4x4 contingency table via a bounded
# 16x16 cell self-join.  Value quartiles use the house deterministic
# (v, event_id) order; kendall_tau (registry) is the pairwise-ranks
# tau-b — tau-c corrects for the rectangular-table ceiling instead.


def q_kendall_tau_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        (F.hour("ts") / 6).cast("int").alias("r"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wq = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    t = ev.withColumn("rk", F.row_number().over(wq)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    ).withColumn(
        "c",
        F.least(
            F.lit(3),
            F.floor((F.col("rk") - 1) * 4 / F.col("n")).cast("int"),
        ),
    )
    cells = t.groupBy("event_type", "r", "c").agg(
        F.count(F.lit(1)).alias("m")
    )
    a = cells.select(
        "event_type",
        F.col("r").alias("r1"),
        F.col("c").alias("c1"),
        F.col("m").alias("m1"),
    )
    b = cells.select(
        F.col("event_type").alias("et2"),
        F.col("r").alias("r2"),
        F.col("c").alias("c2"),
        F.col("m").alias("m2"),
    )
    j = a.join(b, a.event_type == b.et2)
    conc = (
        j.filter((F.col("r1") < F.col("r2")) & (F.col("c1") < F.col("c2")))
        .groupBy("event_type")
        .agg(F.sum(F.col("m1") * F.col("m2")).alias("cc"))
    )
    disc = (
        j.filter((F.col("r1") < F.col("r2")) & (F.col("c1") > F.col("c2")))
        .groupBy("event_type")
        .agg(F.sum(F.col("m1") * F.col("m2")).alias("dd"))
    )
    nn = cells.groupBy("event_type").agg(F.sum("m").alias("n"))
    out = (
        nn.join(conc, "event_type")
        .join(disc, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("cc").cast("long").alias("concordant"),
            F.col("dd").cast("long").alias("discordant"),
            F.floor(
                F.lit(8.0)
                * (F.col("cc") - F.col("dd")).cast("double")
                / (
                    F.col("n").cast("double")
                    * F.col("n").cast("double")
                    * F.lit(3.0)
                )
                * 1_000_000
                + F.lit(_OFF)
            )
            .cast("long")
            .alias("tau_c_e6"),
        )
    )
    return out.orderBy("event_type")


SQL_TAU_C = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS r,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, r,
         least(3, CAST(floor(
           (row_number() OVER (PARTITION BY event_type
                               ORDER BY v, event_id) - 1) * 4.0
           / count(*) OVER (PARTITION BY event_type)) AS INT)) AS c
  FROM ev
), cells AS (
  SELECT event_type, r, c, count(*) AS m
  FROM t GROUP BY 1, 2, 3
), pairs AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN a.r < b.r AND a.c < b.c
                       THEN a.m * b.m ELSE 0 END) AS BIGINT) AS cc,
         CAST(sum(CASE WHEN a.r < b.r AND a.c > b.c
                       THEN a.m * b.m ELSE 0 END) AS BIGINT) AS dd
  FROM cells a JOIN cells b ON b.event_type = a.event_type
  GROUP BY 1
), nn AS (
  SELECT event_type, CAST(sum(m) AS BIGINT) AS n
  FROM cells GROUP BY 1
)
SELECT nn.event_type,
       nn.n,
       pairs.cc AS concordant,
       pairs.dd AS discordant,
       CAST(floor(8.0 * (pairs.cc - pairs.dd)
                  / (CAST(nn.n AS DOUBLE) * nn.n * 3.0)
                  * 1000000 + {_OFF}) AS BIGINT) AS tau_c_e6
FROM nn JOIN pairs ON pairs.event_type = nn.event_type
ORDER BY nn.event_type
"""


# ---------------------------------------------------------------------------
# sign_test — paired sign test on daily purchase-vs-click means
# (Arbuthnott 1710; Dixon & Mood 1946)
# ---------------------------------------------------------------------------
# Day-paired comparison done on exact rationals (s_p * n_c vs s_c *
# n_p, never a divided mean), so the sign is engine-exact; z uses the
# tie-dropping convention z = (S+ - S-) / sqrt(S+ + S-).


def q_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = ev.groupBy("day").agg(
        F.sum(F.when(F.col("event_type") == "purchase", F.col("v"))).alias(
            "sp"
        ),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np"),
        F.sum(F.when(F.col("event_type") == "click", F.col("v"))).alias("sc"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("nc"),
    ).filter((F.col("np") > 0) & (F.col("nc") > 0))
    lhs = F.col("sp") * F.col("nc")
    rhs = F.col("sc") * F.col("np")
    agg = d.select(
        F.when(lhs > rhs, 1).otherwise(0).alias("pos"),
        F.when(lhs < rhs, 1).otherwise(0).alias("neg"),
        F.when(lhs == rhs, 1).otherwise(0).alias("tie"),
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("pos").alias("s_plus"),
        F.sum("neg").alias("s_minus"),
        F.sum("tie").alias("s_zero"),
    )
    z = (F.col("s_plus") - F.col("s_minus")).cast("double") / F.sqrt(
        (F.col("s_plus") + F.col("s_minus")).cast("double")
    )
    return agg.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("s_plus").cast("long").alias("s_plus"),
        F.col("s_minus").cast("long").alias("s_minus"),
        F.col("s_zero").cast("long").alias("s_zero"),
        F.floor(z * 1_000_000 + F.lit(_OFF)).cast("long").alias("z_e6"),
    )


SQL_SIGN = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
  WHERE event_type IN ('purchase', 'click')
), d AS (
  SELECT day,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN v END) AS BIGINT)
           AS sp,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS np,
         CAST(sum(CASE WHEN event_type = 'click' THEN v END) AS BIGINT)
           AS sc,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS nc
  FROM ev GROUP BY 1
  HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
     AND count(CASE WHEN event_type = 'click' THEN 1 END) > 0
), s AS (
  SELECT count(*) AS n_days,
         CAST(sum(CASE WHEN sp * nc > sc * np THEN 1 ELSE 0 END) AS BIGINT)
           AS s_plus,
         CAST(sum(CASE WHEN sp * nc < sc * np THEN 1 ELSE 0 END) AS BIGINT)
           AS s_minus,
         CAST(sum(CASE WHEN sp * nc = sc * np THEN 1 ELSE 0 END) AS BIGINT)
           AS s_zero
  FROM d
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       s_plus, s_minus, s_zero,
       CAST(floor(CAST(s_plus - s_minus AS DOUBLE)
                  / sqrt(CAST(s_plus + s_minus AS DOUBLE))
                  * 1000000 + {_OFF}) AS BIGINT) AS z_e6
FROM s
"""


# ---------------------------------------------------------------------------
# passing_bablok — nonparametric method-comparison regression
# (Passing & Bablok 1983)
# ---------------------------------------------------------------------------
# x = daily click mean, y = daily purchase mean (e4-floored exact
# ints).  All C(30,2) pairwise slopes (vertical pairs dropped, slope
# = -1 dropped per the method); K = #slopes < -1; b = the (N+1)/2+K-th
# (odd N) or averaged N/2+K / N/2+1+K (even N) order statistic of the
# e9-floored slopes with deterministic (slope, i, j) tie order; a =
# lower median of y - b x.  Bounded 435-pair intermediate; single row.


def q_passing_bablok(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    pr = a.join(b, F.col("di") < F.col("dj")).filter(
        F.col("xj") != F.col("xi")
    )
    slope = (F.col("yj") - F.col("yi")).cast("double") / (
        F.col("xj") - F.col("xi")
    ).cast("double")
    pr = pr.withColumn(
        "s_e9", F.floor(slope * 1e9 + F.lit(_OFF)).cast("long")
    ).filter(F.col("s_e9") != -1_000_000_000)
    wr = Window.orderBy("s_e9", "di", "dj")
    stats = pr.agg(
        F.count(F.lit(1)).alias("n_slopes"),
        F.sum((F.col("s_e9") < -1_000_000_000).cast("long")).alias("k_neg"),
    )
    ranked = pr.withColumn("rk", F.row_number().over(wr))
    picked = ranked.join(F.broadcast(stats), how="cross").filter(
        (
            (F.col("n_slopes") % 2 == 1)
            & (F.col("rk") == (F.col("n_slopes") + 1) / 2 + F.col("k_neg"))
        )
        | (
            (F.col("n_slopes") % 2 == 0)
            & (
                (F.col("rk") == F.col("n_slopes") / 2 + F.col("k_neg"))
                | (F.col("rk") == F.col("n_slopes") / 2 + 1 + F.col("k_neg"))
            )
        )
    )
    bsel = picked.groupBy("n_slopes", "k_neg").agg(
        F.floor(F.avg(F.col("s_e9").cast("double")) + F.lit(_OFF))
        .cast("long")
        .alias("b_e9")
    )
    withb = d.join(F.broadcast(bsel), how="cross").withColumn(
        "resid_e9",
        F.col("y") * F.lit(1_000_000_000)
        - F.col("b_e9") * F.col("x"),
    )
    wmed = Window.orderBy("resid_e9", "day")
    med = (
        withb.withColumn("rk", F.row_number().over(wmed))
        .withColumn("nd", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))))
        .filter(F.col("rk") == F.floor((F.col("nd") + 1) / 2).cast("int"))
    )
    return med.select(
        F.col("nd").cast("long").alias("n_days"),
        F.col("n_slopes").cast("long").alias("n_slopes"),
        F.col("k_neg").cast("long").alias("k_neg"),
        F.col("b_e9").cast("long").alias("b_e9"),
        # a in centi units scaled e9 -> report floor(resid/1e9) centi
        F.floor(F.col("resid_e9").cast("double") / 1e9 + F.lit(_OFF))
        .cast("long")
        .alias("a_centi"),
    )


SQL_PB = f"""
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
  SELECT a.day AS di, b.day AS dj,
         CAST(floor(CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) * 1e9
                    + {_OFF}) AS BIGINT) AS s_e9
  FROM d a JOIN d b ON a.day < b.day AND b.x <> a.x
), prf AS (
  SELECT * FROM pr WHERE s_e9 <> -1000000000
), stats AS (
  SELECT count(*) AS n_slopes,
         CAST(sum(CASE WHEN s_e9 < -1000000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS k_neg
  FROM prf
), ranked AS (
  SELECT s_e9, row_number() OVER (ORDER BY s_e9, di, dj) AS rk
  FROM prf
), bsel AS (
  SELECT stats.n_slopes, stats.k_neg,
         CAST(floor(avg(CAST(s_e9 AS DOUBLE)) + {_OFF}) AS BIGINT) AS b_e9
  FROM ranked CROSS JOIN stats
  WHERE (n_slopes % 2 = 1 AND rk = (n_slopes + 1) / 2 + k_neg)
     OR (n_slopes % 2 = 0 AND (rk = n_slopes / 2 + k_neg
                               OR rk = n_slopes / 2 + 1 + k_neg))
  GROUP BY 1, 2
), resid AS (
  SELECT d.day, n_slopes, k_neg, b_e9,
         d.y * 1000000000 - b_e9 * d.x AS resid_e9,
         count(*) OVER () AS nd,
         row_number() OVER (ORDER BY d.y * 1000000000 - b_e9 * d.x, d.day)
           AS rk
  FROM d CROSS JOIN bsel
)
SELECT CAST(nd AS BIGINT) AS n_days,
       CAST(n_slopes AS BIGINT) AS n_slopes,
       k_neg,
       b_e9,
       CAST(floor(CAST(resid_e9 AS DOUBLE) / 1e9 + {_OFF}) AS BIGINT)
         AS a_centi
FROM resid
WHERE rk = CAST(floor((nd + 1) / 2) AS INT)
"""


QUERIES.update(
    {
        "mack_wolfe": q_mack_wolfe,
        "kendall_tau_c": q_kendall_tau_c,
        "sign_test": q_sign_test,
        "passing_bablok": q_passing_bablok,
    }
)

ORACLE_SQL.update(
    {
        "mack_wolfe": SQL_MACK_WOLFE,
        "kendall_tau_c": SQL_TAU_C,
        "sign_test": SQL_SIGN,
        "passing_bablok": SQL_PB,
    }
)


# ---------------------------------------------------------------------------
# tukey_quick — Tukey's quick (pocket) test end counts (Tukey 1959)
# ---------------------------------------------------------------------------
# Two samples per event_type (weekend vs weekday centi-values): the
# statistic in each direction is (#weekend above the weekday max) +
# (#weekday below the weekend min), strict inequalities.  Exact
# integers end-to-end (group min/max + conditional counts).


def q_tukey_quick(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("grp"),
    )
    ext = ev.groupBy("event_type").agg(
        F.min(F.when(F.col("grp") == 1, F.col("v"))).alias("min_e"),
        F.max(F.when(F.col("grp") == 1, F.col("v"))).alias("max_e"),
        F.min(F.when(F.col("grp") == 0, F.col("v"))).alias("min_c"),
        F.max(F.when(F.col("grp") == 0, F.col("v"))).alias("max_c"),
        F.sum(F.col("grp").cast("long")).alias("ne"),
        F.sum((1 - F.col("grp")).cast("long")).alias("nc"),
    )
    t = ev.join(F.broadcast(ext), "event_type")
    out = t.groupBy("event_type").agg(
        F.max("ne").alias("n_wknd"),
        F.max("nc").alias("n_wday"),
        (
            F.sum(
                ((F.col("grp") == 1) & (F.col("v") > F.col("max_c"))).cast(
                    "long"
                )
            )
            + F.sum(
                ((F.col("grp") == 0) & (F.col("v") < F.col("min_e"))).cast(
                    "long"
                )
            )
        ).alias("t_wknd_high"),
        (
            F.sum(
                ((F.col("grp") == 0) & (F.col("v") > F.col("max_e"))).cast(
                    "long"
                )
            )
            + F.sum(
                ((F.col("grp") == 1) & (F.col("v") < F.col("min_c"))).cast(
                    "long"
                )
            )
        ).alias("t_wday_high"),
    )
    return out.select(
        "event_type",
        F.col("n_wknd").cast("long").alias("n_wknd"),
        F.col("n_wday").cast("long").alias("n_wday"),
        F.col("t_wknd_high").cast("long").alias("t_wknd_high"),
        F.col("t_wday_high").cast("long").alias("t_wday_high"),
    ).orderBy("event_type")


SQL_TUKEY_QUICK = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp
  FROM events
), ext AS (
  SELECT event_type,
         min(CASE WHEN grp = 1 THEN v END) AS min_e,
         max(CASE WHEN grp = 1 THEN v END) AS max_e,
         min(CASE WHEN grp = 0 THEN v END) AS min_c,
         max(CASE WHEN grp = 0 THEN v END) AS max_c,
         CAST(sum(grp) AS BIGINT) AS ne,
         CAST(sum(1 - grp) AS BIGINT) AS nc
  FROM ev GROUP BY 1
)
SELECT ev.event_type,
       max(ne) AS n_wknd,
       max(nc) AS n_wday,
       CAST(sum(CASE WHEN grp = 1 AND v > max_c THEN 1 ELSE 0 END)
            + sum(CASE WHEN grp = 0 AND v < min_e THEN 1 ELSE 0 END)
            AS BIGINT) AS t_wknd_high,
       CAST(sum(CASE WHEN grp = 0 AND v > max_e THEN 1 ELSE 0 END)
            + sum(CASE WHEN grp = 1 AND v < min_c THEN 1 ELSE 0 END)
            AS BIGINT) AS t_wday_high
FROM ev JOIN ext ON ext.event_type = ev.event_type
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# hodges_ajne — circular uniformity by minimum half-circle count
# (Hodges 1955; Ajne 1968) on minute-of-day
# ---------------------------------------------------------------------------
# Dense 1440-minute grid per event_type (tiny constant — 1440 x k rows,
# broadcast-scale); cumulative counts P(m); each rotation s gets its
# closed 720-minute half-window count by fixed-offset lead/lag on the
# dense grid (wraparound via n - P(s-1) + P(s-721)); the statistic is
# m = min_s H(s), tie -> smallest s.  Exact integers end-to-end;
# completes the circular family (rayleigh_diel, kuiper, watson_u2).


def q_hodges_ajne(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.hour("ts") * 60 + F.minute("ts")).cast("long").alias("m"),
    )
    cnt = ev.groupBy("event_type", "m").agg(F.count(F.lit(1)).alias("c"))
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(
        F.broadcast(
            ev.sparkSession.range(0, 1440).select(F.col("id").alias("m"))
        )
    )
    d = grid.join(cnt, ["event_type", "m"], "left").withColumn(
        "c", F.coalesce(F.col("c"), F.lit(0))
    )
    wo = Window.partitionBy("event_type").orderBy("m")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("event_type")
    d = (
        d.withColumn("p", F.sum("c").over(wc))
        .withColumn("n", F.sum("c").over(wp))
        .withColumn("p_lag1", F.coalesce(F.lag("p", 1).over(wo), F.lit(0)))
        .withColumn("p_lead719", F.lead("p", 719).over(wo))
        .withColumn("p_lag721", F.coalesce(F.lag("p", 721).over(wo), F.lit(0)))
    )
    h = F.when(
        F.col("m") <= 720, F.col("p_lead719") - F.col("p_lag1")
    ).otherwise(F.col("n") - F.col("p_lag1") + F.col("p_lag721"))
    scored = d.withColumn("h", h)
    best = scored.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min_by(
            F.struct(F.col("m"), F.col("h")), F.struct(F.col("h"), F.col("m"))
        ).alias("b"),
    )
    return best.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("b.m").cast("long").alias("s_min"),
        F.col("b.h").cast("long").alias("m_stat"),
        F.floor(
            F.col("b.h").cast("double") / F.col("n").cast("double") * 1_000_000
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("frac_e6"),
    ).orderBy("event_type")


SQL_HODGES_AJNE = f"""
WITH ev AS (
  SELECT event_type,
         CAST(EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)
              AS BIGINT) AS m
  FROM events
), cnt AS (
  SELECT event_type, m, count(*) AS c
  FROM ev GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, g.m
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT CAST(i AS BIGINT) AS m
              FROM generate_series(0, 1439) AS s(i)) g
), d AS (
  SELECT grid.event_type, grid.m,
         COALESCE(cnt.c, 0) AS c
  FROM grid LEFT JOIN cnt
    ON cnt.event_type = grid.event_type AND cnt.m = grid.m
), cum AS (
  SELECT event_type, m,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY m
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS p,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM d
), off AS (
  SELECT event_type, m, n,
         COALESCE(lag(p, 1) OVER w, 0) AS p_lag1,
         lead(p, 719) OVER w AS p_lead719,
         COALESCE(lag(p, 721) OVER w, 0) AS p_lag721
  FROM cum
  WINDOW w AS (PARTITION BY event_type ORDER BY m)
), scored AS (
  SELECT event_type, m, n,
         CASE WHEN m <= 720 THEN p_lead719 - p_lag1
              ELSE n - p_lag1 + p_lag721 END AS h
  FROM off
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY h, m) AS rk
  FROM scored
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(m AS BIGINT) AS s_min,
       CAST(h AS BIGINT) AS m_stat,
       CAST(floor(CAST(h AS DOUBLE) / n * 1000000 + {_OFF}) AS BIGINT)
         AS frac_e6
FROM ranked
WHERE rk = 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# wheeler_watson — two-sample circular homogeneity via uniform scores
# (Wheeler & Watson 1964)
# ---------------------------------------------------------------------------
# Combined circular ranks of minute-of-day (house (m, event_id) tie
# order) give uniform-score angles 2*pi*r/N; W = 2 * sum_g
# (C_g^2 + S_g^2)/n_g.  Per-row cos/sin e6-floored BEFORE the exact
# integer group sums.


def q_wheeler_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        (F.hour("ts") * 60 + F.minute("ts")).cast("long").alias("m"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("grp"),
    )
    wcomb = Window.partitionBy("event_type").orderBy("m", "event_id")
    wp = Window.partitionBy("event_type")
    t = ev.withColumn("r", F.row_number().over(wcomb).cast("long")).withColumn(
        "nn", F.count(F.lit(1)).over(wp).cast("long")
    )
    ang = (
        F.lit(2.0 * math.pi)
        * F.col("r").cast("double")
        / F.col("nn").cast("double")
    )
    t = t.withColumn(
        "c_e6", F.floor(F.cos(ang) * 1_000_000 + F.lit(_OFF)).cast("long")
    ).withColumn(
        "s_e6", F.floor(F.sin(ang) * 1_000_000 + F.lit(_OFF)).cast("long")
    )
    g = t.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("c_e6").alias("cg"),
        F.sum("s_e6").alias("sg"),
    )
    term = (
        F.col("cg").cast("double") * F.col("cg").cast("double")
        + F.col("sg").cast("double") * F.col("sg").cast("double")
    ) / F.col("ng").cast("double") / 1e12
    g = g.withColumn(
        "term_e9", F.floor(term * 1e9 + F.lit(_OFF)).cast("long")
    )
    out = g.groupBy("event_type").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("ng"))).alias("n_wday"),
        F.sum(F.when(F.col("grp") == 1, F.col("ng"))).alias("n_wknd"),
        F.sum("term_e9").alias("sum_e9"),
    )
    return out.select(
        "event_type",
        F.col("n_wday").cast("long").alias("n_wday"),
        F.col("n_wknd").cast("long").alias("n_wknd"),
        (F.col("sum_e9") * 2).cast("long").alias("w_x2_e9"),
    ).orderBy("event_type")


SQL_WHEELER = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)
              AS BIGINT) AS m,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp
  FROM events
), t AS (
  SELECT event_type, grp,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY m, event_id) AS r,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM ev
), sc AS (
  SELECT event_type, grp,
         CAST(floor(cos(2 * pi() * r / nn) * 1000000 + {_OFF}) AS BIGINT)
           AS c_e6,
         CAST(floor(sin(2 * pi() * r / nn) * 1000000 + {_OFF}) AS BIGINT)
           AS s_e6
  FROM t
), g AS (
  SELECT event_type, grp, count(*) AS ng,
         CAST(sum(c_e6) AS BIGINT) AS cg,
         CAST(sum(s_e6) AS BIGINT) AS sg
  FROM sc GROUP BY 1, 2
), terms AS (
  SELECT event_type, grp, ng,
         CAST(floor((CAST(cg AS DOUBLE) * cg + CAST(sg AS DOUBLE) * sg)
                    / ng / 1e12 * 1e9 + {_OFF}) AS BIGINT) AS term_e9
  FROM g
)
SELECT event_type,
       CAST(sum(CASE WHEN grp = 0 THEN ng END) AS BIGINT) AS n_wday,
       CAST(sum(CASE WHEN grp = 1 THEN ng END) AS BIGINT) AS n_wknd,
       CAST(sum(term_e9) * 2 AS BIGINT) AS w_x2_e9
FROM terms
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# bowley_moors — octile-based robust shape: Bowley (1901) quartile
# skewness + Moors (1988) octile kurtosis
# ---------------------------------------------------------------------------
# Octiles E1..E7 as exact order statistics (row_number = ceil(i*n/8),
# house deterministic (v, event_id) order).  Bowley = (E6 + E2 - 2*E4)
# / (E6 - E2); Moors = ((E7 - E5) + (E3 - E1)) / (E6 - E2).


def q_bowley_moors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wq = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    t = ev.withColumn("rk", F.row_number().over(wq).cast("long")).withColumn(
        "n", F.count(F.lit(1)).over(wn).cast("long")
    )
    octs = [
        F.max(
            F.when(
                F.col("rk") == F.ceil(F.col("n") * i / 8).cast("long"),
                F.col("v"),
            )
        ).alias(f"e{i}")
        for i in range(1, 8)
    ]
    agg = t.groupBy("event_type").agg(F.max("n").alias("n"), *octs)
    iqr = (F.col("e6") - F.col("e2")).cast("double")
    bowley = (F.col("e6") + F.col("e2") - 2 * F.col("e4")).cast("double") / iqr
    moors = (
        (F.col("e7") - F.col("e5")) + (F.col("e3") - F.col("e1"))
    ).cast("double") / iqr
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("e2").cast("long").alias("q1"),
        F.col("e4").cast("long").alias("q2"),
        F.col("e6").cast("long").alias("q3"),
        F.floor(bowley * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "bowley_e6"
        ),
        F.floor(moors * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "moors_e6"
        ),
    ).orderBy("event_type")


SQL_BOWLEY = f"""
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
), agg AS (
  SELECT event_type, max(n) AS n,
         max(CASE WHEN rk = CAST(ceil(n * 1 / 8.0) AS BIGINT) THEN v END) AS e1,
         max(CASE WHEN rk = CAST(ceil(n * 2 / 8.0) AS BIGINT) THEN v END) AS e2,
         max(CASE WHEN rk = CAST(ceil(n * 3 / 8.0) AS BIGINT) THEN v END) AS e3,
         max(CASE WHEN rk = CAST(ceil(n * 4 / 8.0) AS BIGINT) THEN v END) AS e4,
         max(CASE WHEN rk = CAST(ceil(n * 5 / 8.0) AS BIGINT) THEN v END) AS e5,
         max(CASE WHEN rk = CAST(ceil(n * 6 / 8.0) AS BIGINT) THEN v END) AS e6,
         max(CASE WHEN rk = CAST(ceil(n * 7 / 8.0) AS BIGINT) THEN v END) AS e7
  FROM t GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(e2 AS BIGINT) AS q1,
       CAST(e4 AS BIGINT) AS q2,
       CAST(e6 AS BIGINT) AS q3,
       CAST(floor(CAST(e6 + e2 - 2 * e4 AS DOUBLE) / (e6 - e2) * 1000000
                  + {_OFF}) AS BIGINT) AS bowley_e6,
       CAST(floor(CAST((e7 - e5) + (e3 - e1) AS DOUBLE) / (e6 - e2) * 1000000
                  + {_OFF}) AS BIGINT) AS moors_e6
FROM agg
ORDER BY event_type
"""


QUERIES.update(
    {
        "tukey_quick": q_tukey_quick,
        "hodges_ajne": q_hodges_ajne,
        "wheeler_watson": q_wheeler_watson,
        "bowley_moors": q_bowley_moors,
    }
)

ORACLE_SQL.update(
    {
        "tukey_quick": SQL_TUKEY_QUICK,
        "hodges_ajne": SQL_HODGES_AJNE,
        "wheeler_watson": SQL_WHEELER,
        "bowley_moors": SQL_BOWLEY,
    }
)


# ---------------------------------------------------------------------------
# mmd_quadratic — two-sample maximum mean discrepancy with the
# quadratic polynomial kernel (Gretton et al. 2012, JMLR)
# ---------------------------------------------------------------------------
# k(x, y) = (1 + xy/c)^2 expands into pure moments, so the unbiased
# MMD^2_u over weekend-vs-weekday value-unit integers is a CLOSED FORM
# of exact BIGINT sums (S1, S2, S4 per group): sum_{i<>j} k =
# m(m-1) + (2/c)(S1^2 - S2) + (1/c^2)(S2^2 - S4).  No pairwise join —
# O(n) where the generic kernel MMD is O(n^2).  c = 1e4 keeps the
# kernel O(1) for values <= ~500.


def q_mmd_quadratic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") + F.lit(_OFF)).cast("long").alias("v"),
        (F.dayofweek("ts").isin(1, 7)).cast("int").alias("grp"),
    )
    g = ev.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v") * F.col("v")).alias("s4"),
    )
    e = g.filter(F.col("grp") == 1).select(
        "event_type",
        F.col("n").alias("m"),
        F.col("s1").alias("ex1"),
        F.col("s2").alias("ex2"),
        F.col("s4").alias("ex4"),
    )
    c = g.filter(F.col("grp") == 0).select(
        "event_type",
        F.col("n").alias("n"),
        F.col("s1").alias("cy1"),
        F.col("s2").alias("cy2"),
        F.col("s4").alias("cy4"),
    )
    j = e.join(c, "event_type")
    C = 10_000.0
    md = F.col("m").cast("double")
    nd = F.col("n").cast("double")
    ex1 = F.col("ex1").cast("double")
    ex2 = F.col("ex2").cast("double")
    ex4 = F.col("ex4").cast("double")
    cy1 = F.col("cy1").cast("double")
    cy2 = F.col("cy2").cast("double")
    cy4 = F.col("cy4").cast("double")
    kxx = md * (md - 1) + (2.0 / C) * (ex1 * ex1 - ex2) + (
        ex2 * ex2 - ex4
    ) / (C * C)
    kyy = nd * (nd - 1) + (2.0 / C) * (cy1 * cy1 - cy2) + (
        cy2 * cy2 - cy4
    ) / (C * C)
    kxy = md * nd + (2.0 / C) * ex1 * cy1 + ex2 * cy2 / (C * C)
    mmd2 = (
        kxx / (md * (md - 1))
        + kyy / (nd * (nd - 1))
        - 2.0 * kxy / (md * nd)
    )
    return j.select(
        "event_type",
        F.col("m").cast("long").alias("n_wknd"),
        F.col("n").cast("long").alias("n_wday"),
        F.floor(mmd2 * 1e9 + F.lit(_OFF)).cast("long").alias("mmd2_e9"),
    ).orderBy("event_type")


SQL_MMD = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value + {_OFF}) AS BIGINT) AS v,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp
  FROM events
), g AS (
  SELECT event_type, grp, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s1,
         CAST(sum(v * v) AS BIGINT) AS s2,
         CAST(sum(v * v * v * v) AS BIGINT) AS s4
  FROM ev GROUP BY 1, 2
), j AS (
  SELECT e.event_type,
         CAST(e.n AS DOUBLE) AS md, CAST(c.n AS DOUBLE) AS nd,
         e.n AS m, c.n AS n,
         CAST(e.s1 AS DOUBLE) AS ex1, CAST(e.s2 AS DOUBLE) AS ex2,
         CAST(e.s4 AS DOUBLE) AS ex4,
         CAST(c.s1 AS DOUBLE) AS cy1, CAST(c.s2 AS DOUBLE) AS cy2,
         CAST(c.s4 AS DOUBLE) AS cy4
  FROM g e JOIN g c ON c.event_type = e.event_type
  WHERE e.grp = 1 AND c.grp = 0
)
SELECT event_type,
       CAST(m AS BIGINT) AS n_wknd,
       CAST(n AS BIGINT) AS n_wday,
       CAST(floor(
         ((md * (md - 1) + (2.0 / 10000) * (ex1 * ex1 - ex2)
           + (ex2 * ex2 - ex4) / 1e8) / (md * (md - 1))
          + (nd * (nd - 1) + (2.0 / 10000) * (cy1 * cy1 - cy2)
             + (cy2 * cy2 - cy4) / 1e8) / (nd * (nd - 1))
          - 2.0 * (md * nd + (2.0 / 10000) * ex1 * cy1
                   + ex2 * cy2 / 1e8) / (md * nd))
         * 1e9 + {_OFF}) AS BIGINT) AS mmd2_e9
FROM j
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# biweight_midcorr — Tukey biweight midcorrelation on daily means
# (Wilcox 2012; the WGCNA default robust correlation)
# ---------------------------------------------------------------------------
# x = daily click mean, y = daily purchase mean (e4-floored ints).
# Medians and MADs are exact lower-median order statistics; per-row
# biweight terms a_i = (x_i - med)(1 - u^2)^2 1{|u|<1} are identical
# doubles, e6-floored before the exact cross sums.


def q_biweight_midcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("ny"),
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

    def _med(df, col, out):
        w = Window.orderBy(col, "day")
        wn = Window.partitionBy(F.lit(1))
        return (
            df.withColumn("rk", F.row_number().over(w))
            .withColumn("nd", F.count(F.lit(1)).over(wn))
            .filter(F.col("rk") == F.floor((F.col("nd") + 1) / 2).cast("int"))
            .select(F.col(col).alias(out))
        )

    mx = _med(d, "x", "med_x")
    my = _med(d, "y", "med_y")
    base = d.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(my))
    ax = base.select(
        "day",
        "x",
        "y",
        "med_x",
        "med_y",
        F.abs(F.col("x") - F.col("med_x")).alias("adx"),
        F.abs(F.col("y") - F.col("med_y")).alias("ady"),
    )
    madx = _med(ax, "adx", "mad_x")
    mady = _med(ax, "ady", "mad_y")
    t = ax.crossJoin(F.broadcast(madx)).crossJoin(F.broadcast(mady))
    ux = (F.col("x") - F.col("med_x")).cast("double") / (
        9.0 * F.col("mad_x").cast("double")
    )
    uy = (F.col("y") - F.col("med_y")).cast("double") / (
        9.0 * F.col("mad_y").cast("double")
    )
    aw = F.when(
        F.abs(ux) < 1.0,
        (F.col("x") - F.col("med_x")).cast("double")
        * F.pow(F.lit(1.0) - ux * ux, 2),
    ).otherwise(F.lit(0.0))
    bw = F.when(
        F.abs(uy) < 1.0,
        (F.col("y") - F.col("med_y")).cast("double")
        * F.pow(F.lit(1.0) - uy * uy, 2),
    ).otherwise(F.lit(0.0))
    t = t.withColumn(
        "a_e2", F.floor(aw + F.lit(_OFF)).cast("long")
    ).withColumn("b_e2", F.floor(bw + F.lit(_OFF)).cast("long"))
    agg = t.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("a_e2") * F.col("b_e2")).alias("sab"),
        F.sum(F.col("a_e2") * F.col("a_e2")).alias("saa"),
        F.sum(F.col("b_e2") * F.col("b_e2")).alias("sbb"),
    )
    r = F.col("sab").cast("double") / F.sqrt(
        F.col("saa").cast("double") * F.col("sbb").cast("double")
    )
    return agg.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("sab").cast("long").alias("sab"),
        F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias("bicor_e6"),
    )


SQL_BICOR = f"""
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
), mx AS (
  SELECT x AS med_x FROM (
    SELECT x, row_number() OVER (ORDER BY x, day) AS rk,
           count(*) OVER () AS nd FROM d) s
  WHERE rk = CAST(floor((nd + 1) / 2) AS INT)
), my AS (
  SELECT y AS med_y FROM (
    SELECT y, row_number() OVER (ORDER BY y, day) AS rk,
           count(*) OVER () AS nd FROM d) s
  WHERE rk = CAST(floor((nd + 1) / 2) AS INT)
), ax AS (
  SELECT day, x, y, med_x, med_y,
         abs(x - med_x) AS adx, abs(y - med_y) AS ady
  FROM d CROSS JOIN mx CROSS JOIN my
), madx AS (
  SELECT adx AS mad_x FROM (
    SELECT adx, row_number() OVER (ORDER BY adx, day) AS rk,
           count(*) OVER () AS nd FROM ax) s
  WHERE rk = CAST(floor((nd + 1) / 2) AS INT)
), mady AS (
  SELECT ady AS mad_y FROM (
    SELECT ady, row_number() OVER (ORDER BY ady, day) AS rk,
           count(*) OVER () AS nd FROM ax) s
  WHERE rk = CAST(floor((nd + 1) / 2) AS INT)
), t AS (
  SELECT
    CAST(floor(CASE WHEN abs(CAST(x - med_x AS DOUBLE) / (9.0 * mad_x)) < 1.0
      THEN (x - med_x)
           * (1.0 - (CAST(x - med_x AS DOUBLE) / (9.0 * mad_x)) ^ 2) ^ 2
      ELSE 0.0 END + {_OFF}) AS BIGINT) AS a_e2,
    CAST(floor(CASE WHEN abs(CAST(y - med_y AS DOUBLE) / (9.0 * mad_y)) < 1.0
      THEN (y - med_y)
           * (1.0 - (CAST(y - med_y AS DOUBLE) / (9.0 * mad_y)) ^ 2) ^ 2
      ELSE 0.0 END + {_OFF}) AS BIGINT) AS b_e2
  FROM ax CROSS JOIN madx CROSS JOIN mady
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(a_e2 * b_e2) AS BIGINT) AS sab,
       CAST(floor(CAST(sum(a_e2 * b_e2) AS DOUBLE)
                  / sqrt(CAST(sum(a_e2 * a_e2) AS DOUBLE)
                         * sum(b_e2 * b_e2))
                  * 1000000 + {_OFF}) AS BIGINT) AS bicor_e6
FROM t
"""


# ---------------------------------------------------------------------------
# peak_concurrency — maximum simultaneous gap-timeout sessions per day
# ---------------------------------------------------------------------------
# Sessions are the house 30-min gap-timeout (sessionize_events
# convention); each contributes +1 at its start instant, -1 at its end,
# assigned to the day of its START (documented clipping semantics).
# Boundary order (+1 before -1 at equal ts, then user/session) is
# pinned identically in both engines; running integer sum per day ->
# max and its argmax time.  Per-day windows, not a global sweep.


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    wu = Window.partitionBy("user_id").orderBy("us")
    t = ev.withColumn("prev", F.lag("us").over(wu)).withColumn(
        "new_s",
        (
            F.col("prev").isNull()
            | (F.col("us") - F.col("prev") > 1_800_000_000)
        ).cast("long"),
    )
    wc = Window.partitionBy("user_id").orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = t.withColumn("sess", F.sum("new_s").over(wc))
    s = t.groupBy("user_id", "sess").agg(
        F.min("us").alias("t0"), F.max("us").alias("t1")
    )
    pts = s.select(
        F.col("user_id"),
        F.col("sess"),
        F.col("t0").alias("pt"),
        F.lit(1).alias("delta"),
        F.floor(F.col("t0") / 86_400_000_000).cast("long").alias("day"),
    ).unionAll(
        s.select(
            F.col("user_id"),
            F.col("sess"),
            F.col("t1").alias("pt"),
            F.lit(-1).alias("delta"),
            F.floor(F.col("t0") / 86_400_000_000).cast("long").alias("day"),
        )
    )
    wsweep = Window.partitionBy("day").orderBy(
        "pt", F.col("delta").desc(), "user_id", "sess"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    swept = pts.withColumn("conc", F.sum("delta").over(wsweep))
    best = swept.groupBy("day").agg(
        F.max_by(
            F.struct(F.col("pt"), F.col("conc")),
            F.struct(F.col("conc"), -F.col("pt")),
        ).alias("b"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_sessions"),
    )
    return best.select(
        F.col("day").cast("long").alias("day"),
        F.col("n_sessions"),
        F.col("b.conc").cast("long").alias("peak"),
        F.col("b.pt").cast("long").alias("peak_us"),
    ).orderBy("day")


SQL_PEAK_CONC = """
WITH ev AS (
  SELECT user_id,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
), t AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM ev
), sd AS (
  SELECT user_id, us,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sess
  FROM t
), s AS (
  SELECT user_id, sess, min(us) AS t0, max(us) AS t1
  FROM sd GROUP BY 1, 2
), pts AS (
  SELECT user_id, sess, t0 AS pt, 1 AS delta,
         CAST(floor(t0 / 86400000000) AS BIGINT) AS day
  FROM s
  UNION ALL
  SELECT user_id, sess, t1 AS pt, -1 AS delta,
         CAST(floor(t0 / 86400000000) AS BIGINT) AS day
  FROM s
), swept AS (
  SELECT day, pt,
         CAST(sum(delta) OVER (PARTITION BY day
               ORDER BY pt, delta DESC, user_id, sess
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS conc
  FROM pts
), ranked AS (
  SELECT day, pt, conc,
         row_number() OVER (PARTITION BY day
                            ORDER BY conc DESC, pt) AS rk,
         count(*) OVER (PARTITION BY day) AS n2
  FROM swept
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(n2 / 2 AS BIGINT) AS n_sessions,
       conc AS peak,
       CAST(pt AS BIGINT) AS peak_us
FROM ranked
WHERE rk = 1
ORDER BY day
"""


# ---------------------------------------------------------------------------
# borda_condorcet — rank aggregation of daily event-type leaderboards
# (Borda 1781; Condorcet 1785)
# ---------------------------------------------------------------------------
# Each day ranks the k event types by e4-floored mean value (tie ->
# type name); Borda points are k - rank per day; Condorcet pairwise
# wins count days where one type's floored mean strictly exceeds
# another's.  Exact integers end-to-end; bounded k x k day join.


def q_borda_condorcet(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    d = ev.groupBy("day", "event_type").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double") * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("m")
    )
    wr = Window.partitionBy("day").orderBy(
        F.col("m").desc(), F.col("event_type")
    )
    wk = Window.partitionBy("day")
    r = d.withColumn("rk", F.row_number().over(wr)).withColumn(
        "k", F.count(F.lit(1)).over(wk)
    )
    borda = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("k") - F.col("rk")).alias("borda"),
    )
    a = d.select(
        F.col("day").alias("d2"),
        F.col("event_type").alias("et_b"),
        F.col("m").alias("m_b"),
    )
    wins = (
        d.join(a, (F.col("day") == F.col("d2")))
        .filter(F.col("event_type") != F.col("et_b"))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("m") > F.col("m_b")).cast("long")).alias(
                "pair_wins"
            )
        )
    )
    out = borda.join(wins, "event_type").select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("borda").cast("long").alias("borda"),
        F.col("pair_wins").cast("long").alias("pair_wins"),
    )
    return out.orderBy("event_type")


SQL_BORDA = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), d AS (
  SELECT day, event_type,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 100 + {_OFF})
              AS BIGINT) AS m
  FROM ev GROUP BY 1, 2
), r AS (
  SELECT day, event_type, m,
         row_number() OVER (PARTITION BY day
                            ORDER BY m DESC, event_type) AS rk,
         count(*) OVER (PARTITION BY day) AS k
  FROM d
), borda AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(k - rk) AS BIGINT) AS borda
  FROM r GROUP BY 1
), wins AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN a.m > b.m THEN 1 ELSE 0 END) AS BIGINT)
           AS pair_wins
  FROM d a JOIN d b ON b.day = a.day AND b.event_type <> a.event_type
  GROUP BY 1
)
SELECT borda.event_type,
       CAST(borda.n_days AS BIGINT) AS n_days,
       borda.borda,
       wins.pair_wins
FROM borda JOIN wins ON wins.event_type = borda.event_type
ORDER BY borda.event_type
"""


QUERIES.update(
    {
        "mmd_quadratic": q_mmd_quadratic,
        "biweight_midcorr": q_biweight_midcorr,
        "peak_concurrency": q_peak_concurrency,
        "borda_condorcet": q_borda_condorcet,
    }
)

ORACLE_SQL.update(
    {
        "mmd_quadratic": SQL_MMD,
        "biweight_midcorr": SQL_BICOR,
        "peak_concurrency": SQL_PEAK_CONC,
        "borda_condorcet": SQL_BORDA,
    }
)


# ---------------------------------------------------------------------------
# xbar_r_chart — Shewhart X-bar / R chart with n=4 subgroups
# (Shewhart 1931; constants A2/D3/D4 for n=4 from the standard tables)
# ---------------------------------------------------------------------------
# Subgroup = the first 4 events of each (day, hour) in the house
# deterministic (ts, event_id) order; subgroup sums and ranges are
# exact centi integers, the chart limits are closed-form doubles from
# the exact grand sums.  A2 = 0.729, D3 = 0, D4 = 2.282.


def q_xbar_r_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hh"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wsub = Window.partitionBy("day", "hh").orderBy("ts", "event_id")
    sub = (
        ev.withColumn("rk", F.row_number().over(wsub))
        .filter(F.col("rk") <= 4)
        .groupBy("day", "hh")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum("v").alias("s"),
            (F.max("v") - F.min("v")).alias("r"),
        )
        .filter(F.col("m") == 4)
    )
    tot = sub.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("s").alias("ss"),
        F.sum("r").alias("sr"),
    )
    j = sub.crossJoin(F.broadcast(tot))
    grand = F.col("ss").cast("double") / (4.0 * F.col("k").cast("double"))
    rbar = F.col("sr").cast("double") / F.col("k").cast("double")
    xbar = F.col("s").cast("double") / 4.0
    out_x = (
        (xbar > grand + 0.729 * rbar) | (xbar < grand - 0.729 * rbar)
    ).cast("long")
    out_r = (F.col("r").cast("double") > 2.282 * rbar).cast("long")
    day = j.groupBy("day").agg(
        F.count(F.lit(1)).alias("k_day"),
        F.sum(out_x).alias("out_xbar"),
        F.sum(out_r).alias("out_r"),
        F.max(
            F.floor(grand * 10_000 + F.lit(_OFF)).cast("long")
        ).alias("grand_e4"),
        F.max(F.floor(rbar * 10_000 + F.lit(_OFF)).cast("long")).alias(
            "rbar_e4"
        ),
    )
    return day.select(
        F.col("day").cast("string").alias("day"),
        F.col("k_day").cast("long").alias("k_subgroups"),
        F.col("out_xbar").cast("long").alias("out_xbar"),
        F.col("out_r").cast("long").alias("out_r"),
        "grand_e4",
        "rbar_e4",
    ).orderBy("day")


SQL_XBAR_R = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day,
         EXTRACT(hour FROM ts) AS hh, ts, event_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), rk AS (
  SELECT day, hh, v,
         row_number() OVER (PARTITION BY day, hh
                            ORDER BY ts, event_id) AS rk
  FROM ev
), sub AS (
  SELECT day, hh, count(*) AS m,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(max(v) - min(v) AS BIGINT) AS r
  FROM rk WHERE rk <= 4
  GROUP BY 1, 2
  HAVING count(*) = 4
), tot AS (
  SELECT count(*) AS k,
         CAST(sum(s) AS BIGINT) AS ss,
         CAST(sum(r) AS BIGINT) AS sr
  FROM sub
), j AS (
  SELECT day,
         CAST(s AS DOUBLE) / 4.0 AS xbar,
         CAST(r AS DOUBLE) AS rr,
         CAST(ss AS DOUBLE) / (4.0 * k) AS grand,
         CAST(sr AS DOUBLE) / k AS rbar
  FROM sub CROSS JOIN tot
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(count(*) AS BIGINT) AS k_subgroups,
       CAST(sum(CASE WHEN xbar > grand + 0.729 * rbar
                      OR xbar < grand - 0.729 * rbar
                     THEN 1 ELSE 0 END) AS BIGINT) AS out_xbar,
       CAST(sum(CASE WHEN rr > 2.282 * rbar THEN 1 ELSE 0 END) AS BIGINT)
         AS out_r,
       CAST(max(CAST(floor(grand * 10000 + {_OFF}) AS BIGINT)) AS BIGINT)
         AS grand_e4,
       CAST(max(CAST(floor(rbar * 10000 + {_OFF}) AS BIGINT)) AS BIGINT)
         AS rbar_e4
FROM j
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# western_electric_rules — WE runs rules 1-4 on the individuals chart
# (Western Electric SQC Handbook 1956)
# ---------------------------------------------------------------------------
# Per event_type: center = mean, sigma = MRbar/1.128 (the shewhart_imr
# convention).  R1: beyond 3 sigma; R2: >= 2 of 3 consecutive beyond
# 2 sigma, same side; R3: >= 4 of 5 beyond 1 sigma, same side; R4: 8
# consecutive on one side.  Zone indicators are exact (centi ints vs
# identically-derived double limits); rolling indicator sums are exact
# integer window sums.


def q_western_electric_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = ev.withColumn("prev", F.lag("v").over(wo))
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(
            F.when(
                F.col("prev").isNotNull(), F.abs(F.col("v") - F.col("prev"))
            )
        ).alias("smr"),
    )
    mu = F.col("sv").cast("double") / F.col("n").cast("double")
    sig = (
        F.col("smr").cast("double") / (F.col("n") - 1).cast("double") / 1.128
    )
    coef = g.select("event_type", mu.alias("mu"), sig.alias("sig"))
    t = t.join(F.broadcast(coef), "event_type")
    vd = F.col("v").cast("double")
    above = (vd > F.col("mu")).cast("long")
    below = (vd < F.col("mu")).cast("long")
    a1 = (vd > F.col("mu") + F.col("sig")).cast("long")
    b1 = (vd < F.col("mu") - F.col("sig")).cast("long")
    a2 = (vd > F.col("mu") + 2 * F.col("sig")).cast("long")
    b2 = (vd < F.col("mu") - 2 * F.col("sig")).cast("long")
    r1 = (
        (vd > F.col("mu") + 3 * F.col("sig"))
        | (vd < F.col("mu") - 3 * F.col("sig"))
    ).cast("long")
    t = (
        t.withColumn("above", above)
        .withColumn("below", below)
        .withColumn("a1", a1)
        .withColumn("b1", b1)
        .withColumn("a2", a2)
        .withColumn("b2", b2)
        .withColumn("r1", r1)
    )
    w3 = wo.rowsBetween(-2, Window.currentRow)
    w5 = wo.rowsBetween(-4, Window.currentRow)
    w8 = wo.rowsBetween(-7, Window.currentRow)
    wi = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = (
        t.withColumn("i", F.row_number().over(wi))
        .withColumn(
            "r2",
            (
                ((F.sum("a2").over(w3) >= 2) | (F.sum("b2").over(w3) >= 2))
                & (F.col("i") >= 3)
            ).cast("long"),
        )
        .withColumn(
            "r3",
            (
                ((F.sum("a1").over(w5) >= 4) | (F.sum("b1").over(w5) >= 4))
                & (F.col("i") >= 5)
            ).cast("long"),
        )
        .withColumn(
            "r4",
            (
                ((F.sum("above").over(w8) == 8) | (F.sum("below").over(w8) == 8))
                & (F.col("i") >= 8)
            ).cast("long"),
        )
    )
    out = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r1").alias("rule1"),
        F.sum("r2").alias("rule2"),
        F.sum("r3").alias("rule3"),
        F.sum("r4").alias("rule4"),
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("rule1").cast("long").alias("rule1"),
        F.col("rule2").cast("long").alias("rule2"),
        F.col("rule3").cast("long").alias("rule3"),
        F.col("rule4").cast("long").alias("rule4"),
    ).orderBy("event_type")


SQL_WE_RULES = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, event_id, ts, v,
         lag(v) OVER w AS prev
  FROM ev
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(CASE WHEN prev IS NOT NULL
                       THEN abs(v - prev) END) AS BIGINT) AS smr
  FROM t GROUP BY 1
), coef AS (
  SELECT event_type,
         CAST(sv AS DOUBLE) / n AS mu,
         CAST(smr AS DOUBLE) / (n - 1) / 1.128 AS sig
  FROM g
), z AS (
  SELECT t.event_type, t.ts, t.event_id,
         CASE WHEN v > mu THEN 1 ELSE 0 END AS above,
         CASE WHEN v < mu THEN 1 ELSE 0 END AS below,
         CASE WHEN v > mu + sig THEN 1 ELSE 0 END AS a1,
         CASE WHEN v < mu - sig THEN 1 ELSE 0 END AS b1,
         CASE WHEN v > mu + 2 * sig THEN 1 ELSE 0 END AS a2,
         CASE WHEN v < mu - 2 * sig THEN 1 ELSE 0 END AS b2,
         CASE WHEN v > mu + 3 * sig OR v < mu - 3 * sig
              THEN 1 ELSE 0 END AS r1
  FROM t JOIN coef ON coef.event_type = t.event_type
), roll AS (
  SELECT event_type, r1,
         row_number() OVER w AS i,
         sum(a2) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sa2,
         sum(b2) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sb2,
         sum(a1) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sa1,
         sum(b1) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sb1,
         sum(above) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sab,
         sum(below) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sbe
  FROM z
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(r1) AS BIGINT) AS rule1,
       CAST(sum(CASE WHEN i >= 3 AND (sa2 >= 2 OR sb2 >= 2)
                     THEN 1 ELSE 0 END) AS BIGINT) AS rule2,
       CAST(sum(CASE WHEN i >= 5 AND (sa1 >= 4 OR sb1 >= 4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS rule3,
       CAST(sum(CASE WHEN i >= 8 AND (sab = 8 OR sbe = 8)
                     THEN 1 ELSE 0 END) AS BIGINT) AS rule4
FROM roll
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# attribute_control_charts — p-chart (error share) and c-chart (error
# count) per day (Shewhart attribute charts)
# ---------------------------------------------------------------------------
# pbar/cbar from exact totals; per-day 3-sigma binomial / Poisson
# limits as identical doubles; out-of-control flags exact.


def q_attribute_control_charts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.to_date("ts").alias("day"),
        (F.col("event_type") == "error").cast("long").alias("is_err"),
    )
    d = ev.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_err").alias("x"),
    )
    tot = d.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("sn"),
        F.sum("x").alias("sx"),
    )
    j = d.crossJoin(F.broadcast(tot))
    pbar = F.col("sx").cast("double") / F.col("sn").cast("double")
    cbar = F.col("sx").cast("double") / F.col("k").cast("double")
    nd = F.col("n").cast("double")
    p = F.col("x").cast("double") / nd
    sig_p = F.sqrt(pbar * (1 - pbar) / nd)
    out_p = ((p > pbar + 3 * sig_p) | (p < pbar - 3 * sig_p)).cast("long")
    out_c = (
        (F.col("x").cast("double") > cbar + 3 * F.sqrt(cbar))
        | (F.col("x").cast("double") < cbar - 3 * F.sqrt(cbar))
    ).cast("long")
    return j.select(
        F.col("day").cast("string").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("x_err"),
        F.floor(p * 1_000_000 + F.lit(_OFF)).cast("long").alias("p_e6"),
        out_p.alias("out_p"),
        out_c.alias("out_c"),
    ).orderBy("day")


SQL_ATTR_CHARTS = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events
), d AS (
  SELECT day, count(*) AS n, CAST(sum(is_err) AS BIGINT) AS x
  FROM ev GROUP BY 1
), tot AS (
  SELECT count(*) AS k,
         CAST(sum(n) AS BIGINT) AS sn,
         CAST(sum(x) AS BIGINT) AS sx
  FROM d
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(n AS BIGINT) AS n,
       x AS x_err,
       CAST(floor(CAST(x AS DOUBLE) / n * 1000000 + {_OFF}) AS BIGINT)
         AS p_e6,
       CAST(CASE WHEN CAST(x AS DOUBLE) / n
                      > CAST(sx AS DOUBLE) / sn
                        + 3 * sqrt(CAST(sx AS DOUBLE) / sn
                                   * (1 - CAST(sx AS DOUBLE) / sn) / n)
                  OR CAST(x AS DOUBLE) / n
                      < CAST(sx AS DOUBLE) / sn
                        - 3 * sqrt(CAST(sx AS DOUBLE) / sn
                                   * (1 - CAST(sx AS DOUBLE) / sn) / n)
                 THEN 1 ELSE 0 END AS BIGINT) AS out_p,
       CAST(CASE WHEN CAST(x AS DOUBLE)
                      > CAST(sx AS DOUBLE) / k
                        + 3 * sqrt(CAST(sx AS DOUBLE) / k)
                  OR CAST(x AS DOUBLE)
                      < CAST(sx AS DOUBLE) / k
                        - 3 * sqrt(CAST(sx AS DOUBLE) / k)
                 THEN 1 ELSE 0 END AS BIGINT) AS out_c
FROM d CROSS JOIN tot
ORDER BY day
"""


# ---------------------------------------------------------------------------
# process_capability — Cp/Cpk (within, MRbar/1.128 sigma) and Pp/Ppk
# (overall sigma) per event_type against spec [0, 50000] centi
# ---------------------------------------------------------------------------
# Within-sigma follows the shewhart_imr moving-range convention; the
# overall sigma is the sample sd from the exact numerator-trick sums.


def q_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = ev.withColumn("prev", F.lag("v").over(wo))
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum(
            F.when(
                F.col("prev").isNotNull(), F.abs(F.col("v") - F.col("prev"))
            )
        ).alias("smr"),
    )
    LSL, USL = 0.0, 50_000.0
    nd = F.col("n").cast("double")
    mu = F.col("sv").cast("double") / nd
    sig_w = F.col("smr").cast("double") / (nd - 1) / 1.128
    var_o = (
        nd * F.col("svv").cast("double")
        - F.col("sv").cast("double") * F.col("sv").cast("double")
    ) / (nd * (nd - 1))
    sig_o = F.sqrt(var_o)
    cp = (USL - LSL) / (6 * sig_w)
    cpk = F.least(USL - mu, mu - LSL) / (3 * sig_w)
    pp = (USL - LSL) / (6 * sig_o)
    ppk = F.least(USL - mu, mu - LSL) / (3 * sig_o)
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.floor(cp * 1_000_000 + F.lit(_OFF)).cast("long").alias("cp_e6"),
        F.floor(cpk * 1_000_000 + F.lit(_OFF)).cast("long").alias("cpk_e6"),
        F.floor(pp * 1_000_000 + F.lit(_OFF)).cast("long").alias("pp_e6"),
        F.floor(ppk * 1_000_000 + F.lit(_OFF)).cast("long").alias("ppk_e6"),
    ).orderBy("event_type")


SQL_CAPABILITY = f"""
WITH ev AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), t AS (
  SELECT event_type, v,
         lag(v) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev
  FROM ev
), g AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(CASE WHEN prev IS NOT NULL
                       THEN abs(v - prev) END) AS BIGINT) AS smr
  FROM t GROUP BY 1
), f AS (
  SELECT event_type, n,
         CAST(sv AS DOUBLE) / n AS mu,
         CAST(smr AS DOUBLE) / (n - 1) / 1.128 AS sig_w,
         sqrt((CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv)
              / (CAST(n AS DOUBLE) * (n - 1))) AS sig_o
  FROM g
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(floor(50000.0 / (6 * sig_w) * 1000000 + {_OFF}) AS BIGINT)
         AS cp_e6,
       CAST(floor(least(50000.0 - mu, mu - 0.0) / (3 * sig_w)
                  * 1000000 + {_OFF}) AS BIGINT) AS cpk_e6,
       CAST(floor(50000.0 / (6 * sig_o) * 1000000 + {_OFF}) AS BIGINT)
         AS pp_e6,
       CAST(floor(least(50000.0 - mu, mu - 0.0) / (3 * sig_o)
                  * 1000000 + {_OFF}) AS BIGINT) AS ppk_e6
FROM f
ORDER BY event_type
"""


QUERIES.update(
    {
        "xbar_r_chart": q_xbar_r_chart,
        "western_electric_rules": q_western_electric_rules,
        "attribute_control_charts": q_attribute_control_charts,
        "process_capability": q_process_capability,
    }
)

ORACLE_SQL.update(
    {
        "xbar_r_chart": SQL_XBAR_R,
        "western_electric_rules": SQL_WE_RULES,
        "attribute_control_charts": SQL_ATTR_CHARTS,
        "process_capability": SQL_CAPABILITY,
    }
)


# ---------------------------------------------------------------------------
# pps_horvitz_thompson — systematic probability-proportional-to-size
# sampling + Horvitz-Thompson total (Horvitz & Thompson 1952; Madow 1949)
# ---------------------------------------------------------------------------
# Population = users, size measure = event count, target = total
# centi-value.  Systematic PPS with skip I = S/n and the house 1/pi
# fraction as the deterministic start: unit u is hit m_u =
# floor((C_u - d)/I) - floor((C_{u-1} - d)/I) times (exact cumulative
# integer sizes, identical doubles).  HT total = (S/n) sum m_u y_u/s_u.


def q_pps_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("s"), F.sum("v").alias("y")
    )
    wc = Window.orderBy("user_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = u.withColumn("cu", F.sum("s").over(wc)).withColumn(
        "cprev", F.col("cu") - F.col("s")
    )
    tot = u.agg(
        F.count(F.lit(1)).alias("n_pop"),
        F.sum("s").alias("stot"),
        F.sum("y").alias("ytrue"),
    )
    NDRAW = 100.0
    j = t.crossJoin(F.broadcast(tot))
    i_skip = F.col("stot").cast("double") / F.lit(NDRAW)
    d0 = i_skip * F.lit(_OFF)
    m_u = (
        F.floor((F.col("cu").cast("double") - d0) / i_skip)
        - F.floor((F.col("cprev").cast("double") - d0) / i_skip)
    ).cast("long")
    j = j.withColumn("m_u", m_u)
    sel = j.filter(F.col("m_u") > 0)
    ht_term = (
        F.col("m_u").cast("double")
        * F.col("y").cast("double")
        / F.col("s").cast("double")
    )
    sel = sel.withColumn(
        "term_e2", F.floor(ht_term * 100 + F.lit(_OFF)).cast("long")
    )
    agg = sel.groupBy().agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("m_u").alias("n_draws"),
        F.sum("term_e2").alias("sterm_e2"),
        F.max("stot").alias("stot"),
        F.max("ytrue").alias("ytrue"),
        F.max("n_pop").alias("n_pop"),
    )
    ht = (
        F.col("stot").cast("double")
        / F.lit(NDRAW)
        * F.col("sterm_e2").cast("double")
        / 100.0
    )
    rel = (ht - F.col("ytrue").cast("double")) / F.col("ytrue").cast("double")
    return agg.select(
        F.col("n_pop").cast("long").alias("n_pop"),
        F.col("n_units").cast("long").alias("n_units"),
        F.col("n_draws").cast("long").alias("n_draws"),
        F.col("ytrue").cast("long").alias("true_total"),
        F.floor(ht + F.lit(_OFF)).cast("long").alias("ht_total"),
        F.floor(rel * 1_000_000 + F.lit(_OFF)).cast("long").alias(
            "rel_err_e6"
        ),
    )


SQL_PPS_HT = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), u AS (
  SELECT user_id, count(*) AS s, CAST(sum(v) AS BIGINT) AS y
  FROM ev GROUP BY 1
), t AS (
  SELECT *,
         CAST(sum(s) OVER (ORDER BY user_id ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cu
  FROM u
), tot AS (
  SELECT count(*) AS n_pop,
         CAST(sum(s) AS BIGINT) AS stot,
         CAST(sum(y) AS BIGINT) AS ytrue
  FROM u
), m AS (
  SELECT t.*, tot.n_pop, tot.stot, tot.ytrue,
         CAST(floor((CAST(cu AS DOUBLE)
                     - CAST(stot AS DOUBLE) / 100.0 * {_OFF})
                    / (CAST(stot AS DOUBLE) / 100.0))
              - floor((CAST(cu - s AS DOUBLE)
                       - CAST(stot AS DOUBLE) / 100.0 * {_OFF})
                      / (CAST(stot AS DOUBLE) / 100.0)) AS BIGINT) AS m_u
  FROM t CROSS JOIN tot
), sel AS (
  SELECT *,
         CAST(floor(CAST(m_u AS DOUBLE) * y / s * 100 + {_OFF}) AS BIGINT)
           AS term_e2
  FROM m WHERE m_u > 0
), agg AS (
  SELECT count(*) AS n_units,
         CAST(sum(m_u) AS BIGINT) AS n_draws,
         CAST(sum(term_e2) AS BIGINT) AS sterm_e2,
         max(stot) AS stot, max(ytrue) AS ytrue, max(n_pop) AS n_pop
  FROM sel
)
SELECT CAST(n_pop AS BIGINT) AS n_pop,
       CAST(n_units AS BIGINT) AS n_units,
       n_draws,
       CAST(ytrue AS BIGINT) AS true_total,
       CAST(floor(CAST(stot AS DOUBLE) / 100.0
                  * CAST(sterm_e2 AS DOUBLE) / 100.0 + {_OFF}) AS BIGINT)
         AS ht_total,
       CAST(floor((CAST(stot AS DOUBLE) / 100.0
                   * CAST(sterm_e2 AS DOUBLE) / 100.0 - ytrue)
                  / CAST(ytrue AS DOUBLE) * 1000000 + {_OFF}) AS BIGINT)
         AS rel_err_e6
FROM agg
"""


# ---------------------------------------------------------------------------
# ipf_raking — iterative proportional fitting of the hour x type count
# table to uniform margins, 3 unrolled rounds (Deming & Stephan 1940)
# ---------------------------------------------------------------------------
# The 24 x 5 contingency table is raked row->col three times with the
# house unrolled-fixed-point pattern (huber/price-indexes precedent):
# every scaling is the identical double chain from exact integer
# counts in both engines.  Reported per type: the column total after
# the round-3 ROW scaling (its deviation from the target measures
# convergence).


def q_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.hour("ts").cast("long").alias("h"), "event_type"
    )
    cells = ev.groupBy("h", "event_type").agg(
        F.count(F.lit(1)).alias("n0")
    )
    wn = Window.partitionBy(F.lit(1))
    wr = Window.partitionBy("h")
    wc = Window.partitionBy("event_type")
    t = cells.withColumn("ntot", F.sum("n0").over(wn))
    tr = F.col("ntot").cast("double") / 24.0
    tc = F.col("ntot").cast("double") / 5.0
    m = F.col("n0").cast("double")
    for rnd in range(3):
        rs = F.sum(m).over(wr)
        m = m * tr / rs
        t = t.withColumn(f"m_r{rnd}", m)
        m = F.col(f"m_r{rnd}")
        if rnd < 2:
            cs = F.sum(m).over(wc)
            m = m * tc / cs
            t = t.withColumn(f"m_c{rnd}", m)
            m = F.col(f"m_c{rnd}")
    out = t.groupBy("event_type").agg(
        F.sum("n0").alias("n0_col"),
        F.floor(F.sum("m_r2") * 10_000 + F.lit(_OFF))
        .cast("long")
        .alias("col_total_e4"),
        F.max(F.col("ntot")).alias("ntot"),
    )
    dev = F.abs(
        F.col("col_total_e4").cast("double") / 10_000.0
        - F.col("ntot").cast("double") / 5.0
    )
    return out.select(
        "event_type",
        F.col("n0_col").cast("long").alias("n0_col"),
        "col_total_e4",
        F.floor(dev * 10_000 + F.lit(_OFF)).cast("long").alias("dev_e4"),
    ).orderBy("event_type")


SQL_IPF = f"""
WITH ev AS (
  SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h, event_type
  FROM events
), cells AS (
  SELECT h, event_type, count(*) AS n0
  FROM ev GROUP BY 1, 2
), base AS (
  SELECT *,
         CAST(sum(n0) OVER () AS BIGINT) AS ntot
  FROM cells
), r0 AS (
  SELECT *, CAST(n0 AS DOUBLE) * (CAST(ntot AS DOUBLE) / 24.0)
            / sum(CAST(n0 AS DOUBLE)) OVER (PARTITION BY h) AS m
  FROM base
), c0 AS (
  SELECT h, event_type, n0, ntot,
         m * (CAST(ntot AS DOUBLE) / 5.0)
           / sum(m) OVER (PARTITION BY event_type) AS m
  FROM r0
), r1 AS (
  SELECT h, event_type, n0, ntot,
         m * (CAST(ntot AS DOUBLE) / 24.0)
           / sum(m) OVER (PARTITION BY h) AS m
  FROM c0
), c1 AS (
  SELECT h, event_type, n0, ntot,
         m * (CAST(ntot AS DOUBLE) / 5.0)
           / sum(m) OVER (PARTITION BY event_type) AS m
  FROM r1
), r2 AS (
  SELECT h, event_type, n0, ntot,
         m * (CAST(ntot AS DOUBLE) / 24.0)
           / sum(m) OVER (PARTITION BY h) AS m
  FROM c1
), agg AS (
  SELECT event_type,
         CAST(sum(n0) AS BIGINT) AS n0_col,
         CAST(floor(sum(m) * 10000 + {_OFF}) AS BIGINT) AS col_total_e4,
         max(ntot) AS ntot
  FROM r2 GROUP BY 1
)
SELECT event_type, n0_col, col_total_e4,
       CAST(floor(abs(CAST(col_total_e4 AS DOUBLE) / 10000.0
                      - CAST(ntot AS DOUBLE) / 5.0) * 10000 + {_OFF})
            AS BIGINT) AS dev_e4
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# cyclic_shift_test — circular-shift surrogate test for daily
# click-purchase correlation (the time-series permutation test of
# choice when autocorrelation must be preserved)
# ---------------------------------------------------------------------------
# corr numerator n*Sxy_k - Sx*Sy at every cyclic lag k is an EXACT
# BIGINT (margins are shift-invariant, so the denominator cancels);
# p = #{k >= 1 : |num_k| >= |num_0|} / (n_days - 1) involves only
# integer comparisons.  Bounded 30 x 30 shift join.


def q_cyclic_shift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wi = Window.orderBy("day")
    wn = Window.partitionBy(F.lit(1))
    idx = d.withColumn("i", F.row_number().over(wi) - 1).withColumn(
        "nd", F.count(F.lit(1)).over(wn)
    )
    a = idx.select("i", "x", "nd")
    b = idx.select(F.col("i").alias("j"), F.col("y").alias("yj"))
    shifts = idx.sparkSession.range(0, 64).select(
        F.col("id").cast("long").alias("k")
    )
    pr = (
        a.crossJoin(F.broadcast(shifts))
        .filter(F.col("k") < F.col("nd"))
        .join(
            b,
            F.col("j") == (F.col("i") + F.col("k")) % F.col("nd"),
        )
    )
    sxy = pr.groupBy("k").agg(
        F.sum(F.col("x") * F.col("yj")).alias("sxy"),
        F.max("nd").alias("nd"),
    )
    marg = idx.agg(
        F.sum("x").alias("sx"), F.sum("y").alias("sy")
    )
    num = sxy.crossJoin(F.broadcast(marg)).select(
        "k",
        "nd",
        (
            F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy")
        ).alias("num"),
    )
    obs = num.filter(F.col("k") == 0).select(
        F.col("num").alias("num0"), F.col("nd").alias("n_days")
    )
    cnt = (
        num.filter(F.col("k") >= 1)
        .crossJoin(F.broadcast(obs))
        .agg(
            F.max("n_days").alias("n_days"),
            F.max("num0").alias("num0"),
            F.sum(
                (F.abs(F.col("num")) >= F.abs(F.col("num0"))).cast("long")
            ).alias("n_ge"),
        )
    )
    p = F.col("n_ge").cast("double") / (F.col("n_days") - 1).cast("double")
    return cnt.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("num0").cast("long").alias("num0"),
        F.col("n_ge").cast("long").alias("n_ge"),
        F.floor(p * 1_000_000 + F.lit(_OFF)).cast("long").alias("p_e6"),
    )


SQL_CYCLIC = f"""
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
), idx AS (
  SELECT x, y,
         row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS nd
  FROM d
), shifts AS (
  SELECT CAST(k AS BIGINT) AS k FROM generate_series(0, 63) AS s(k)
), pr AS (
  SELECT a.i, s.k, a.nd, a.x, b.y AS yj
  FROM idx a
  CROSS JOIN shifts s
  JOIN idx b ON b.i = (a.i + s.k) % a.nd
  WHERE s.k < a.nd
), sxy AS (
  SELECT k, CAST(sum(x * yj) AS BIGINT) AS sxy, max(nd) AS nd
  FROM pr GROUP BY 1
), marg AS (
  SELECT CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
  FROM idx
), num AS (
  SELECT k, nd, CAST(nd * sxy - sx * sy AS BIGINT) AS num
  FROM sxy CROSS JOIN marg
), obs AS (
  SELECT num AS num0, nd AS n_days FROM num WHERE k = 0
)
SELECT CAST(obs.n_days AS BIGINT) AS n_days,
       obs.num0,
       CAST(sum(CASE WHEN abs(num.num) >= abs(obs.num0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       CAST(floor(CAST(sum(CASE WHEN abs(num.num) >= abs(obs.num0)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                  / (obs.n_days - 1) * 1000000 + {_OFF}) AS BIGINT) AS p_e6
FROM num CROSS JOIN obs
WHERE num.k >= 1
GROUP BY obs.n_days, obs.num0
"""


# ---------------------------------------------------------------------------
# bartlett_cumper — Bartlett's cumulative-periodogram white-noise test
# (Bartlett 1955) on the hourly mean series
# ---------------------------------------------------------------------------
# Mean removal via the exact n*y - S numerator trick keeps z integer;
# per-(freq, hour) DFT terms are e4-floored before the exact sums, the
# periodogram I_j = C^2 + S^2 is scaled to /1e16 integers for the exact
# cumulative, and D = max_k |U_k - k/m| is the KS departure.  Freq grid
# is the fixed m = (n-1)/2 Fourier set — bounded fanout.


def q_bartlett_cumper(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).cast("long").alias("hr"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    hmean = ev.groupBy("event_type", "hr").agg(
        F.floor(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double") * 100
            + F.lit(_OFF)
        )
        .cast("long")
        .alias("y")
    )
    wo = Window.partitionBy("event_type").orderBy("hr")
    wp = Window.partitionBy("event_type")
    idx = (
        hmean.withColumn("h", F.row_number().over(wo).cast("long") - 1)
        .withColumn("n", F.count(F.lit(1)).over(wp).cast("long"))
        .withColumn("sy", F.sum("y").over(wp))
        .withColumn("z", F.col("n") * F.col("y") - F.col("sy"))
    )
    mmax = idx.sparkSession.range(1, 400).select(
        F.col("id").cast("long").alias("j")
    )
    t = idx.crossJoin(F.broadcast(mmax)).filter(
        F.col("j") <= F.floor((F.col("n") - 1) / 2)
    )
    ang = (
        F.lit(2.0 * math.pi)
        * F.col("j").cast("double")
        * F.col("h").cast("double")
        / F.col("n").cast("double")
    )
    t = t.withColumn(
        "ct",
        F.floor(
            F.col("z").cast("double") * F.cos(ang) / 10_000 + F.lit(_OFF)
        ).cast("long"),
    ).withColumn(
        "st",
        F.floor(
            F.col("z").cast("double") * F.sin(ang) / 10_000 + F.lit(_OFF)
        ).cast("long"),
    )
    per = t.groupBy("event_type", "j").agg(
        F.sum("ct").alias("c"),
        F.sum("st").alias("s"),
        F.max("n").alias("n"),
    )
    i_e = F.floor(
        (
            F.col("c").cast("double") * F.col("c").cast("double")
            + F.col("s").cast("double") * F.col("s").cast("double")
        )
        / 1e10
        + F.lit(_OFF)
    ).cast("long")
    per = per.withColumn("i_e", i_e)
    wcum = Window.partitionBy("event_type").orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy("event_type")
    per = (
        per.withColumn("cum", F.sum("i_e").over(wcum))
        .withColumn("tot", F.sum("i_e").over(wtot))
        .withColumn("m", F.count(F.lit(1)).over(wtot).cast("long"))
    )
    dev = F.abs(
        F.col("cum").cast("double") / F.col("tot").cast("double")
        - F.col("j").cast("double") / F.col("m").cast("double")
    )
    scored = per.withColumn("dev", dev)
    best = scored.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.max_by(
            F.struct(F.col("j"), F.col("dev")),
            F.struct(F.col("dev"), -F.col("j")),
        ).alias("b"),
    )
    return best.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("m").cast("long").alias("m_freqs"),
        F.col("b.j").cast("long").alias("j_at_max"),
        F.floor(F.col("b.dev") * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("d_e6"),
    ).orderBy("event_type")


SQL_BARTLETT_CP = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), hmean AS (
  SELECT event_type, hr,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 100 + {_OFF})
              AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), idx AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) - 1 AS h,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS sy
  FROM hmean
), t AS (
  SELECT event_type, h, n,
         n * y - sy AS z,
         CAST(j AS BIGINT) AS j
  FROM idx CROSS JOIN generate_series(1, 399) AS s(j)
  WHERE j <= floor((n - 1) / 2.0)
), terms AS (
  SELECT event_type, j, n,
         CAST(floor(CAST(z AS DOUBLE) * cos(2 * pi() * j * h / n) / 10000
                    + {_OFF}) AS BIGINT) AS ct,
         CAST(floor(CAST(z AS DOUBLE) * sin(2 * pi() * j * h / n) / 10000
                    + {_OFF}) AS BIGINT) AS st
  FROM t
), per AS (
  SELECT event_type, j, max(n) AS n,
         CAST(floor((CAST(sum(ct) AS DOUBLE) * sum(ct)
                     + CAST(sum(st) AS DOUBLE) * sum(st)) / 1e10 + {_OFF})
              AS BIGINT) AS i_e
  FROM terms GROUP BY 1, 2
), cum AS (
  SELECT event_type, j, n,
         CAST(sum(i_e) OVER (PARTITION BY event_type ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(sum(i_e) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM per
), scored AS (
  SELECT event_type, n, m, j,
         abs(CAST(cum AS DOUBLE) / tot - CAST(j AS DOUBLE) / m) AS dev
  FROM cum
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY dev DESC, j) AS rk
  FROM scored
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_hours,
       CAST(m AS BIGINT) AS m_freqs,
       CAST(j AS BIGINT) AS j_at_max,
       CAST(floor(dev * 1000000 + {_OFF}) AS BIGINT) AS d_e6
FROM ranked
WHERE rk = 1
ORDER BY event_type
"""


QUERIES.update(
    {
        "pps_horvitz_thompson": q_pps_horvitz_thompson,
        "ipf_raking": q_ipf_raking,
        "cyclic_shift_test": q_cyclic_shift_test,
        "bartlett_cumper": q_bartlett_cumper,
    }
)

ORACLE_SQL.update(
    {
        "pps_horvitz_thompson": SQL_PPS_HT,
        "ipf_raking": SQL_IPF,
        "cyclic_shift_test": SQL_CYCLIC,
        "bartlett_cumper": SQL_BARTLETT_CP,
    }
)
