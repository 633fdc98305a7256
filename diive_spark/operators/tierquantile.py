"""Mergeable fixed-bin histogram quantile tiers.

The continuous-aggregate quantile problem: exact percentiles are not
mergeable, so a rollup engine keeps a MERGEABLE sketch per fine bucket
and combines sketches upward (TimescaleDB keeps uddsketch/tdigest in its
continuous aggregates; Spark's own ``approx_percentile`` state merges the
same way).  Here the sketch is the simplest fully DETERMINISTIC one — a
fixed-width histogram over a known global range — so the coarse-tier
estimate is bit-reproducible across engines and an ANSI-SQL oracle can
replay it exactly (which t-digest/HLL cannot: see ``tier_distinct_hll``
for the rows-only treatment of an opaque sketch).

Scale shape: fine tier = one map-side-combinable groupBy (bucket, bin);
coarse tier = a re-aggregation of the (already tiny) fine tier; the
quantile extraction is a per-bucket cumulative-sum window over ``bins``
rows.  Nothing here ever holds more than ``buckets × bins`` rows.

Error bound: one bin width = (gmax - gmin) / bins, the classic
equi-width histogram quantile guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hist_bin(value, gmin: float, gmax: float, bins: int):
    """Deterministic bin index in [0, bins-1]; clips out-of-range."""
    raw = F.floor(
        (value - F.lit(gmin)) / F.lit(gmax - gmin) * F.lit(bins)
    )
    return F.least(
        F.lit(bins - 1), F.greatest(F.lit(0), raw)
    ).cast("long")


def hist_tier(
    df: DataFrame,
    bucket_col,
    value_col: str,
    gmin: float,
    gmax: float,
    bins: int = 128,
) -> DataFrame:
    """Fine tier: (bucket, bin, n) counts — the mergeable sketch rows."""
    return (
        df.select(
            bucket_col.alias("bucket"),
            hist_bin(F.col(value_col), gmin, gmax, bins).alias("bin"),
        )
        .groupBy("bucket", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def merge_tier(
    fine: DataFrame, bucket_map, out_bucket: str = "bucket"
) -> DataFrame:
    """Roll a fine tier up to a coarser one: sum the bin counts under the
    coarser bucket key (``bucket_map`` maps ``fine.bucket`` → coarse)."""
    return (
        fine.select(
            bucket_map(F.col("bucket")).alias(out_bucket), "bin", "n"
        )
        .groupBy(out_bucket, "bin")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def tier_quantiles(
    tier: DataFrame,
    qs: list[float],
    gmin: float,
    gmax: float,
    bins: int = 128,
) -> DataFrame:
    """Per bucket: upper-edge estimate of each quantile q — the value
    edge of the smallest bin whose cumulative count reaches
    ``ceil(q * total)``.  Pure integer selection; the only float is the
    final edge formula, identical on any IEEE engine."""
    w = Window.partitionBy("bucket").orderBy("bin")
    cum = tier.withColumn(
        "cum", F.sum("n").over(w).cast("long")
    ).withColumn(
        "total", F.sum("n").over(Window.partitionBy("bucket")).cast("long")
    )
    width = (gmax - gmin) / bins
    aggs = [F.max("total").alias("n_points")]
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("total"))
        qbin = F.min(F.when(F.col("cum") >= target, F.col("bin")))
        aggs.append(
            (F.lit(gmin) + (qbin + 1) * F.lit(width)).alias(
                f"p{int(round(q * 100)):02d}"
            )
        )
    return cum.groupBy("bucket").agg(*aggs)
