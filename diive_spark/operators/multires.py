"""Multi-resolution series analytics: Haar detail energy and Hurst R/S.

Two classic multi-scale decompositions, both expressed as PURE DataFrame
algebra (no kernel, no window wider than one bounded chunk), and both
engineered so every intermediate is an EXACT integer — the cross-engine
float-summation-order trap (CLAUDE.md conventions) cannot bite because
no float is ever summed.

**Haar detail energy** (Haar 1910; Mallat's fast pyramid, IEEE PAMI
1989): the level-k detail coefficient over a complete bucket of 2^k
consecutive samples equals (mean of first half − mean of second half)/2.
With values pre-scaled to centi-unit integers and complete buckets only
(both halves hold exactly 2^(k-1) rows), the detail is (s0−s1)/2^k for
INTEGER half-sums s0, s1 — so the per-level energy Σ(s0−s1)² is an exact
BIGINT.  This is the "multi-resolution aggregate" primitive of the tier
cascade: level-k energies summarize variance at the 2^k-sample scale,
the downsample-ladder analog of diive's daily/weekly/monthly rollups
(/root/reference/diive/core/times/resampling.py — diive fixes the
scales; Haar sweeps them).

**Hurst exponent via rescaled range** (Hurst 1951; Mandelbrot & Wallis
1969): split each series into complete chunks of n samples, compute the
range R of mean-adjusted cumulative deviations and the population std S
per chunk, average R/S per n, and read H as the log-log slope.  With
centi-unit integer values the running sums, squared sums and means are
exact integers / single exact divisions, so each chunk's R/S is a
deterministic double in BOTH engines regardless of aggregation order;
only the final per-size mean over chunks sums floats (≤ hundreds of
deterministic terms — floor-scaled at 1e4, documented safe).

Scale shape: one `row_number` per key (the per-key series order every
kernel in this repo already assumes), then a 1→L map-side explode and
ONE combinable groupBy per operator.  Chunk partitions are bounded
(≤ 2^max_level resp. ≤ max(sizes) rows), so no window ever exceeds a
constant frame — monster series need no halo machinery here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["haar_energy", "hurst_rs"]


def haar_energy(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    levels: int = 4,
    scale: int = 100,
) -> DataFrame:
    """Per (key, level 1..levels): number of complete 2^level buckets and
    the exact integer detail energy Σ(s0−s1)² in (scale·value)² units
    (divide by 4^level·scale² for value² units — left to the caller so
    the column stays an exact BIGINT)."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    base = df.select(
        key_col,
        (F.row_number().over(w) - F.lit(1)).alias("_idx"),
        F.floor(F.col(value_col) * scale + F.lit(0.5))
        .cast("long")
        .alias("_vi"),
    )
    lv = base.withColumn(
        "level", F.explode(F.array(*[F.lit(k) for k in range(1, levels + 1)]))
    )
    half_w = F.pow(F.lit(2.0), F.col("level") - 1).cast("long")
    lv = lv.select(
        key_col,
        "level",
        F.floor(F.col("_idx") / (half_w * 2)).alias("pair"),
        (F.floor(F.col("_idx") / half_w) % 2).alias("half"),
        "_vi",
    )
    pairs = lv.groupBy(key_col, "level", "pair").agg(
        F.sum(F.when(F.col("half") == 0, F.col("_vi"))).alias("s0"),
        F.sum(F.when(F.col("half") == 1, F.col("_vi"))).alias("s1"),
        F.count("*").alias("cnt"),
    )
    complete = pairs.where(
        F.col("cnt") == F.pow(F.lit(2.0), F.col("level")).cast("long")
    )
    d = (F.col("s0") - F.col("s1"))
    return complete.groupBy(key_col, "level").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(d * d).cast("long").alias("energy_raw"),
    )


def hurst_rs(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    sizes: tuple[int, ...] = (8, 16, 32),
    scale: int = 100,
) -> DataFrame:
    """Per key: complete-chunk counts and mean R/S per chunk size, plus
    the Hurst exponent H from the log2-log2 slope across ``sizes``.

    ``sizes`` must be consecutive powers of two (equally spaced in
    log2), so the least-squares slope collapses to the closed form
    (y_last − y_first) / (len−1) — engine-exact given the inputs.
    Emits one row per key having at least one complete chunk at EVERY
    size; R/S means floor-scaled at 1e4, H at 1e4.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    base = df.select(
        key_col,
        (F.row_number().over(w) - F.lit(1)).alias("_idx"),
        F.floor(F.col(value_col) * scale + F.lit(0.5))
        .cast("long")
        .alias("_vi"),
    )
    sized = base.withColumn(
        "sz", F.explode(F.array(*[F.lit(s) for s in sizes]))
    ).select(
        key_col,
        "sz",
        F.floor(F.col("_idx") / F.col("sz")).alias("chunk"),
        (F.col("_idx") % F.col("sz")).alias("pos"),
        "_vi",
    )
    cw = (
        Window.partitionBy(key_col, "sz", "chunk")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = sized.withColumn("c", F.sum("_vi").over(cw))
    # z_t = c_t − (t+1)·mean; max/min are order-free, and c_t and mean
    # are exact integers / one exact division → deterministic doubles.
    # The chunk-total mean comes from an unordered window SUM — exact,
    # because _vi is integer (no float summation order anywhere).
    wfull = Window.partitionBy(key_col, "sz", "chunk")
    run = run.withColumn(
        "tot_mean", (F.sum("_vi").over(wfull) / F.col("sz")).cast("double")
    )
    per_chunk = run.groupBy(key_col, "sz", "chunk").agg(
        F.count("*").alias("cnt"),
        F.sum("_vi").alias("tot"),
        F.sum(F.col("_vi") * F.col("_vi")).alias("q"),
        F.max(
            F.col("c") - (F.col("pos") + 1) * F.col("tot_mean")
        ).alias("zmax"),
        F.min(
            F.col("c") - (F.col("pos") + 1) * F.col("tot_mean")
        ).alias("zmin"),
    )
    per_chunk = per_chunk.where(F.col("cnt") == F.col("sz"))
    mean = F.col("tot") / F.col("sz")
    s2 = F.col("q") / F.col("sz") - mean * mean
    rs = (F.col("zmax") - F.col("zmin")) / F.sqrt(s2)
    per_chunk = per_chunk.where(s2 > 0).withColumn("rs", rs)
    per_size = per_chunk.groupBy(key_col, "sz").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.avg("rs").alias("mean_rs"),
    )
    agg = per_size.groupBy(key_col).agg(
        F.count("*").alias("_nsz"),
        *[
            F.max(
                F.when(F.col("sz") == s, F.col("n_chunks"))
            ).alias(f"n{s}")
            for s in sizes
        ],
        *[
            F.max(F.when(F.col("sz") == s, F.col("mean_rs"))).alias(
                f"_rs{s}"
            )
            for s in sizes
        ],
    )
    agg = agg.where(F.col("_nsz") == len(sizes)).drop("_nsz")
    h = (F.log2(f"_rs{sizes[-1]}") - F.log2(f"_rs{sizes[0]}")) / (
        len(sizes) - 1
    )
    out = agg.withColumn(
        "h_e4", F.floor(h * 1e4 + F.lit(0.5)).cast("long")
    )
    for s in sizes:
        out = out.withColumn(
            f"rs{s}_e4",
            F.floor(F.col(f"_rs{s}") * 1e4 + F.lit(0.5)).cast("long"),
        ).drop(f"_rs{s}")
    return out
