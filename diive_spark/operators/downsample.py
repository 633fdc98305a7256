"""M4 width-aware downsampling (Jugel et al., VLDB 2014).

The aggregation-based dashboard downsampler: per (key, pixel-column time
bucket) keep exactly the four points a line renderer needs — first, last,
min-value, max-value — which reproduces the pixel-perfect line at the
target width.  Complements the shape-heuristic LTTB (operators/lttb.py):
M4 is fully declarative (one codegen aggregation, no kernel, no per-series
sequential dependency), so it is the 100 TB-scale default and LTTB the
last-mile refiner.

diive downsamples by plain interval aggregation only
(/root/reference/diive/core/times/resampling.py — mean/sum per bin, which
flattens extremes); M4 is the rollup-engine upgrade that keeps spikes
visible at every retention tier.

Plan shape: ONE map-side-combinable groupBy — the four points come from
four lexicographic struct extremes computed in the same aggregate, so the
operator is a single exchange on (key, bucket) with partial aggregation
before it; no join, no window, no second scan.  Tie-breaks are pinned
(first/min take the smallest companion coordinate, last/max the largest —
the lexicographic struct order), so output is deterministic and
engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["m4_downsample", "m4_merge"]


def m4_downsample(
    df: DataFrame,
    key_col: str = "key",
    x_col: str = "ts_s",
    y_col: str = "value",
    bucket_s: int = 3600,
) -> DataFrame:
    """One row per (key, bucket): the M4 tuple
    (x_first, y_first, x_last, y_last, x_ymin, y_min, x_ymax, y_max).

    ``min(struct(x, y))`` yields (min x, min y among min-x ties) — the
    deterministic tie-break the DuckDB twin replicates with conditional
    aggregation.
    """
    x, y = F.col(x_col), F.col(y_col)
    first = F.min(F.struct(x.alias("x"), y.alias("y")))
    last = F.max(F.struct(x.alias("x"), y.alias("y")))
    ymin = F.min(F.struct(y.alias("y"), x.alias("x")))
    ymax = F.max(F.struct(y.alias("y"), x.alias("x")))
    return (
        df.groupBy(
            F.col(key_col),
            F.floor(x / F.lit(bucket_s)).cast("long").alias("bucket"),
        )
        .agg(
            first.alias("_f"), last.alias("_l"),
            ymin.alias("_mn"), ymax.alias("_mx"),
            F.count(F.lit(1)).cast("long").alias("n_in"),
        )
        .select(
            key_col,
            "bucket",
            F.col("_f.x").alias("x_first"),
            F.col("_f.y").alias("y_first"),
            F.col("_l.x").alias("x_last"),
            F.col("_l.y").alias("y_last"),
            F.col("_mn.x").alias("x_ymin"),
            F.col("_mn.y").alias("y_min"),
            F.col("_mx.x").alias("x_ymax"),
            F.col("_mx.y").alias("y_max"),
            "n_in",
        )
    )


def m4_merge(m4: DataFrame, key_col: str, factor: int) -> DataFrame:
    """Roll ``factor`` fine M4 buckets into one coarse bucket WITHOUT
    re-reading raw data — every M4 component is an associative extreme
    (first of firsts, min of mins, ...), so the tuple is a mergeable
    continuous aggregate like the CMS/HLL/histogram tiers:
    ``m4_merge(m4_downsample(raw, w), f) == m4_downsample(raw, w·f)``
    bit-exactly (pinned in tests/test_trend_m4.py).  The same
    lexicographic-struct trick propagates the tie-breaks.
    """
    def mn(x: str, y: str):
        return F.min(F.struct(F.col(x).alias("a"), F.col(y).alias("b")))

    def mx(x: str, y: str):
        return F.max(F.struct(F.col(x).alias("a"), F.col(y).alias("b")))

    return (
        m4.groupBy(
            key_col,
            F.floor(F.col("bucket") / factor).cast("long").alias("bucket"),
        )
        .agg(
            mn("x_first", "y_first").alias("_f"),
            mx("x_last", "y_last").alias("_l"),
            mn("y_min", "x_ymin").alias("_mn"),
            mx("y_max", "x_ymax").alias("_mx"),
            F.sum("n_in").cast("long").alias("n_in"),
        )
        .select(
            key_col,
            "bucket",
            F.col("_f.a").alias("x_first"),
            F.col("_f.b").alias("y_first"),
            F.col("_l.a").alias("x_last"),
            F.col("_l.b").alias("y_last"),
            F.col("_mn.b").alias("x_ymin"),
            F.col("_mn.a").alias("y_min"),
            F.col("_mx.b").alias("x_ymax"),
            F.col("_mx.a").alias("y_max"),
            "n_in",
        )
    )
