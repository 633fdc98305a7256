"""Count-min sketch frequency tiers (Cormode & Muthukrishnan 2005).

Mergeable heavy-hitter frequency estimation for the continuous-aggregate
tier family: alongside the histogram-quantile tiers
(operators/tierquantile.py) and HLL distinct tiers, the CMS answers "how
often did item X appear per window?" with a fixed-size summary —
``d × w`` counters per time bucket — regardless of item cardinality.
Point estimates overestimate by at most ε·N with probability 1−δ
(w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉) and NEVER underestimate.

The sketch is LINEAR: cell-wise sum of minute sketches IS the hour
sketch, bit-exactly — so tier rollups (1m → 1h → 1d) never re-touch raw
data, the same contract as every other tier in plans/tiers.py.

Engine-portable hashing: row r maps item to column
``(PERM_A[r]·(h60(item) mod P) + PERM_B[r]) mod P mod w`` — the same
universal-hash family as the MinHash permutations (text/hashing.py), all
computable bit-identically in DuckDB, so the ORACLE can rebuild the exact
sketch and the exact estimates in SQL.

Plan shape: build = one explode(d) + one map-side-combinable groupBy on
(bucket, row, col) — the sketch table is at most d·w rows per bucket, so
the shuffle is bounded by the summary size, not the data; merge = groupBy
sum over sketch rows only; estimate = broadcast-join the d probe cells per
item against the sketch and take the min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.text.hashing import MERSENNE, PERM_A, PERM_B, spark_h60

__all__ = ["cms_build", "cms_merge", "cms_estimate"]


def _cell(item_expr: str, r: int, width: int) -> str:
    """SQL snippet: CMS column index of ``item_expr`` under hash row r."""
    x = f"pmod({spark_h60(item_expr)}, {MERSENNE})"
    return f"pmod(pmod({PERM_A[r]}L * {x} + {PERM_B[r]}L, {MERSENNE}), {width})"


def cms_build(
    df: DataFrame,
    item_col: str,
    ts_s_col: str = "ts_s",
    bucket_s: int = 60,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Sketch table (bucket, r, col, cnt) — at most depth·width rows per
    time bucket, each cnt the number of observations hashing there."""
    if depth > len(PERM_A):
        raise ValueError(f"depth <= {len(PERM_A)} (fixed hash family)")
    cells = F.array(
        *[F.expr(_cell(item_col, r, width)) for r in range(depth)]
    )
    return (
        df.select(
            F.floor(F.col(ts_s_col) / bucket_s).cast("long").alias("bucket"),
            F.posexplode(cells).alias("r", "col"),
        )
        .groupBy("bucket", "r", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(sketch: DataFrame, factor: int) -> DataFrame:
    """Roll ``factor`` fine buckets into one coarse bucket: cell-wise sum
    (the sketch is linear, so this equals building at the coarse width)."""
    return (
        sketch.groupBy(
            F.floor(F.col("bucket") / factor).cast("long").alias("bucket"),
            "r",
            "col",
        )
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per (item, bucket) frequency estimate: min over the item's d cells.
    ``items`` is one row per probe item; the probe side (items × d) is
    broadcast against the sketch."""
    cells = F.array(
        *[F.expr(_cell(item_col, r, width)) for r in range(depth)]
    )
    probes = items.select(
        F.col(item_col), F.posexplode(cells).alias("r", "col")
    )
    return (
        sketch.join(F.broadcast(probes), ["r", "col"])
        .groupBy(item_col, "bucket")
        .agg(F.min("cnt").alias("_mn"), F.count(F.lit(1)).alias("_hit"))
        # a cell with zero observations is ABSENT from the sparse sketch
        # table; any empty cell proves the item never appeared (cnt is an
        # upper bound), so fewer than `depth` matches => estimate 0
        .select(
            item_col,
            "bucket",
            F.when(F.col("_hit") == depth, F.col("_mn"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("est"),
        )
    )
