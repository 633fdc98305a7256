"""Oracle-backed RandomUncertaintyPAS20 queries (reference
/root/reference/diive/pkgs/flux/uncertainty.py:27-431).

The registry variant runs the ladder at FIXED depth — method 1 (±7 d),
method 2 (±5 d), one method-2 expansion (±6 d), method 3, method 4 — so the
whole pipeline is one lazy DAG with an exact DuckDB twin (the reference's
data-dependent expanding loop is covered by the differential pytest in
tests/test_uncertainty.py, which runs ``expand_method2=True`` against the
imported reference class).

Input: the 30-min gridded events series per user (users 0-59 — bounds the
banded-join fan-out so the sf0.1 bench stays proportionate), with
deterministic met drivers derived arithmetically from slot + gap-filled
flux so both engines compute bit-identical doubles:

    gf   = coalesce(v, avg(v) per user)
    ta   = 10 + ((slot/1800) mod 48)·0.5 + gf·0.01
    vpd  = 5 + ((slot/1800) mod 96)·0.125 + gf·0.005
    swin = 300 + gf during 06:00-18:00 else gf
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diive_spark.operators.uncertainty import (
    cumulative_uncertainty,
    pas20_random_uncertainty,
)

N_USERS = 60
DAY_S = 86400


def _uncert_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < N_USERS)
        .select(F.col("user_id").cast("long").alias("user_id"), "ts", "value")
    )
    binned = ev.select(
        "user_id",
        (
            (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_800_000_000) + 1)
            * 1800
        ).cast("long").alias("slot_s"),
        "value",
    )
    agg = binned.groupBy("user_id", "slot_s").agg(F.avg("value").alias("v"))
    bounds = agg.groupBy("user_id").agg(
        F.min("slot_s").alias("t0"), F.max("slot_s").alias("t1")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("t0", "t1", F.lit(1800))).alias("slot_s")
    )
    g = grid.join(agg, ["user_id", "slot_s"], "left")
    from pyspark.sql import Window

    gf = F.coalesce(F.col("v"), F.avg("v").over(Window.partitionBy("user_id")))
    base = g.select(
        "user_id",
        "slot_s",
        F.col("v").alias("flux"),
        gf.alias("gf"),
    )
    tod = F.pmod(F.col("slot_s"), F.lit(DAY_S))
    return base.select(
        "user_id",
        "slot_s",
        "flux",
        "gf",
        (
            F.lit(10.0)
            + F.pmod(F.col("slot_s") / 1800, F.lit(48)) * 0.5
            + F.col("gf") * 0.01
        ).alias("ta"),
        (
            F.lit(5.0)
            + F.pmod(F.col("slot_s") / 1800, F.lit(96)) * 0.125
            + F.col("gf") * 0.005
        ).alias("vpd"),
        F.when((tod >= 21600) & (tod < 64800), F.lit(300.0) + F.col("gf"))
        .otherwise(F.col("gf"))
        .alias("swin"),
    )


def q_random_uncertainty(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _uncert_grid(spark, sf_dir)
    out = pas20_random_uncertainty(
        g,
        "user_id",
        "slot_s",
        "flux",
        "gf",
        "ta",
        "vpd",
        "swin",
        expand_method2=1,
    )
    return out.select(
        "user_id",
        "slot_s",
        F.round("randunc", 4).alias("randunc"),
        F.col("n_method1").cast("long").alias("n_method1"),
        F.col("n_method2").cast("long").alias("n_method2"),
        F.col("n_method3").cast("long").alias("n_method3"),
        F.col("n_method4").cast("long").alias("n_method4"),
    )


def q_random_uncertainty_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _uncert_grid(spark, sf_dir)
    ladder = pas20_random_uncertainty(
        g,
        "user_id",
        "slot_s",
        "flux",
        "gf",
        "ta",
        "vpd",
        "swin",
        expand_method2=1,
    )
    cum = cumulative_uncertainty(ladder, "user_id", "slot_s", "gf")

    # centi-scaled integers with an IRRATIONAL offset: the prefix sums live
    # on a rational lattice (sums of 2-decimal event values plus
    # k·mean/n terms) that lands EXACTLY on .005 round-half boundaries, so
    # round(x,2) diverges between Spark (HALF_UP on the double's decimal
    # expansion) and DuckDB (7 rows per 1369 measured).  floor(x·100 + 1/π)
    # puts the discontinuity at frac ≈ 0.6817 — ≥1e-3 from every lattice
    # point, 7 orders of magnitude above the cross-engine ulp drift.
    def _e2(c: str) -> F.Column:
        return F.floor(F.col(c) * 100 + F.lit(0.31830988618367)).cast("long")

    return cum.select(
        "user_id",
        "slot_s",
        _e2("flux_cum").alias("flux_cum_e2"),
        _e2("unc_cum").alias("unc_cum_e2"),
        _e2("flux_cum_upper").alias("flux_cum_upper_e2"),
        _e2("flux_cum_lower").alias("flux_cum_lower_e2"),
    )


# ---------------------------------------------------------------------------
# DuckDB twins — structurally parallel CTE per ladder stage
# ---------------------------------------------------------------------------

_PMOD_TOD = "(((b.slot_s - a.slot_s) % 86400) + 86400) % 86400"
_TOD_COND = f"({_PMOD_TOD} <= 3600 OR {_PMOD_TOD} >= 82800)"


def _banded(src_a: str, src_b: str, win_days: int, extra: str) -> str:
    """±win_days banded self-join: 3-bucket offsets, exact filter after."""
    w = win_days * DAY_S
    return f"""
  SELECT a.user_id AS user_id, a.slot_s AS slot_s, {extra}
  FROM (SELECT s.*, CAST(floor(s.slot_s / {w}) AS BIGINT) + o.d AS jb
        FROM {src_a} s CROSS JOIN (VALUES (-1), (0), (1)) o(d)) a
  JOIN (SELECT s.*, CAST(floor(s.slot_s / {w}) AS BIGINT) AS bb
        FROM {src_b} s) b
    ON a.user_id = b.user_id AND a.jb = b.bb
   AND abs(b.slot_s - a.slot_s) <= {w}
   AND {_TOD_COND}
"""


_SQL_GRID_U = f"""
binned AS (
  SELECT user_id,
         (CAST(floor(epoch(ts) / 1800) AS BIGINT) + 1) * 1800 AS slot_s,
         value
  FROM events WHERE user_id < {N_USERS}
), agg AS (
  SELECT user_id, slot_s, avg(value) AS v FROM binned GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(slot_s) AS t0, max(slot_s) AS t1 FROM agg GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, 1800)) AS slot_s FROM bounds
), base AS (
  SELECT CAST(grid.user_id AS BIGINT) AS user_id, grid.slot_s,
         agg.v AS flux,
         coalesce(agg.v, avg(agg.v) OVER (PARTITION BY grid.user_id)) AS gf
  FROM grid LEFT JOIN agg
    ON grid.user_id = agg.user_id AND grid.slot_s = agg.slot_s
), met AS (
  SELECT *,
         10.0 + ((slot_s / 1800) % 48) * 0.5 + gf * 0.01 AS ta,
         5.0 + ((slot_s / 1800) % 96) * 0.125 + gf * 0.005 AS vpd,
         CASE WHEN slot_s % 86400 >= 21600 AND slot_s % 86400 < 64800
              THEN 300.0 + gf ELSE gf END AS swin
  FROM base
)
"""

_SQL_LADDER = f"""
WITH {_SQL_GRID_U},
meas AS (SELECT * FROM met WHERE flux IS NOT NULL),
m1 AS (
  SELECT user_id, slot_s, count(bflux) AS n1, stddev_samp(bflux) AS sd1
  FROM ({_banded("meas", "meas", 7, "b.flux AS bflux")}
   AND abs(b.ta - a.ta) <= 2.5
   AND abs(b.vpd - a.vpd) <= 5.0
   AND abs(b.swin - a.swin) <= 50.0
  ) GROUP BY 1, 2
), s1 AS (
  SELECT met.*, m1.n1 AS n_method1,
         CASE WHEN m1.n1 >= 5 THEN m1.sd1 END AS randunc
  FROM met LEFT JOIN m1 USING (user_id, slot_s)
), t2a AS (SELECT * FROM s1 WHERE randunc IS NULL),
m2a AS (
  SELECT user_id, slot_s, count(bru) AS n2, median(bru) AS m2
  FROM ({_banded("t2a", "s1", 5, "b.randunc AS bru")}
   AND b.gf >= a.gf - greatest(a.gf * 0.2, 2.0)
   AND b.gf <= a.gf + greatest(a.gf * 0.2, 2.0)
  ) GROUP BY 1, 2
), s2a AS (
  SELECT s1.user_id, s1.slot_s, s1.flux, s1.gf, s1.ta, s1.vpd, s1.swin,
         s1.n_method1,
         CASE WHEN s1.randunc IS NULL THEN m.n2 END AS n2a,
         coalesce(s1.randunc, m.m2) AS randunc
  FROM s1 LEFT JOIN m2a m USING (user_id, slot_s)
), t2b AS (SELECT * FROM s2a WHERE randunc IS NULL),
m2b AS (
  SELECT user_id, slot_s, count(bru) AS n2, median(bru) AS m2
  FROM ({_banded("t2b", "s2a", 6, "b.randunc AS bru")}
   AND b.gf >= a.gf - greatest(a.gf * 0.2, 2.0)
   AND b.gf <= a.gf + greatest(a.gf * 0.2, 2.0)
  ) GROUP BY 1, 2
), s2 AS (
  SELECT s2a.user_id, s2a.slot_s, s2a.flux, s2a.gf, s2a.ta, s2a.vpd,
         s2a.swin, s2a.n_method1,
         CASE WHEN s2a.randunc IS NULL THEN m.n2 ELSE s2a.n2a END AS n_method2,
         coalesce(s2a.randunc, m.m2) AS randunc
  FROM s2a LEFT JOIN m2b m USING (user_id, slot_s)
), t3 AS (SELECT * FROM s2 WHERE randunc IS NULL),
m3 AS (
  SELECT a.user_id, a.slot_s, count(b.randunc) AS n3, median(b.randunc) AS m3
  FROM t3 a JOIN s2 b ON a.user_id = b.user_id
   AND b.gf >= a.gf - greatest(a.gf * 0.2, 2.0)
   AND b.gf <= a.gf + greatest(a.gf * 0.2, 2.0)
  GROUP BY 1, 2
), s3 AS (
  SELECT s2.user_id, s2.slot_s, s2.flux, s2.gf, s2.ta, s2.vpd, s2.swin,
         s2.n_method1, s2.n_method2,
         CASE WHEN s2.randunc IS NULL THEN m.n3 END AS n_method3,
         coalesce(s2.randunc, m.m3) AS randunc
  FROM s2 LEFT JOIN m3 m USING (user_id, slot_s)
), s4 AS (
  SELECT *,
         median(randunc) OVER w AS m4,
         count(randunc) OVER w AS c4
  FROM s3
  WINDOW w AS (PARTITION BY user_id ORDER BY gf, slot_s
               ROWS BETWEEN 5 PRECEDING AND 4 FOLLOWING)
), sfinal AS (
  SELECT user_id, slot_s, flux, gf, n_method1, n_method2, n_method3,
         CASE WHEN randunc IS NULL THEN c4 END AS n_method4,
         coalesce(randunc, m4) AS randunc
  FROM s4
)
"""

SQL_RANDOM_UNCERTAINTY = (
    _SQL_LADDER
    + """
SELECT user_id, slot_s, round(randunc, 4) AS randunc,
       CAST(n_method1 AS BIGINT) AS n_method1,
       CAST(n_method2 AS BIGINT) AS n_method2,
       CAST(n_method3 AS BIGINT) AS n_method3,
       CAST(n_method4 AS BIGINT) AS n_method4
FROM sfinal
"""
)

# centi-scaled with a 1/π offset — see q_random_uncertainty_cumulative
_E2 = "CAST(floor(({x}) * 100 + 0.31830988618367) AS BIGINT)"

SQL_RANDOM_UNCERTAINTY_CUM = (
    _SQL_LADDER
    + f"""
SELECT user_id, slot_s,
       {_E2.format(x='sum(gf) OVER w')} AS flux_cum_e2,
       {_E2.format(x='sqrt(sum(randunc * randunc) OVER w)')} AS unc_cum_e2,
       {_E2.format(x='sum(gf) OVER w + sqrt(sum(randunc * randunc) OVER w)')}
         AS flux_cum_upper_e2,
       {_E2.format(x='sum(gf) OVER w - sqrt(sum(randunc * randunc) OVER w)')}
         AS flux_cum_lower_e2
FROM sfinal
WINDOW w AS (PARTITION BY user_id ORDER BY slot_s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "random_uncertainty": q_random_uncertainty,
    "random_uncertainty_cumulative": q_random_uncertainty_cumulative,
}

ORACLE_SQL: dict[str, str] = {
    "random_uncertainty": SQL_RANDOM_UNCERTAINTY,
    "random_uncertainty_cumulative": SQL_RANDOM_UNCERTAINTY_CUM,
}
