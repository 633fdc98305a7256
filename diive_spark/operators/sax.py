"""SAX — Symbolic Aggregate approXimation (Lin, Keogh, Lonardi & Chiu,
DMKD 2003): z-normalize a series, Piecewise Aggregate Approximation
(PAA) over fixed-width frames, then map each PAA mean to a letter by
standard-normal breakpoints.  The discrete motif/novelty alphabet every
classic TS-mining pipeline (HOT SAX, matrix-profile pre-filters) builds
on; diive has no symbolic layer — this adds it over the tier rollups.

Fully declarative (exact DuckDB twin):

* per-key mean/stddev via one aggregate (population σ, the paper's
  z-normalization), broadcast back;
* PAA frame id = floor(row_number / frame); frame means are one
  map-side-combinable groupBy (row-position frames, so a gappy series
  is symbolized over its OBSERVED points, like the paper's fixed-length
  windows over a sample sequence);
* breakpoints are the standard-normal quantiles for alphabet size a —
  shipped as exact literals (the paper's lookup table) so both engines
  compare against identical constants.

Scale: one sort-exchange per key for row numbers, one combinable agg
for frames — rows ∝ series length; symbols per key = n/frame, a
fixed-factor reduction the downstream motif join runs on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["SAX_BREAKPOINTS", "sax_symbols"]

# Lin et al. Table 3: N(0,1) quantiles splitting the density into a
# equal-probability regions, alphabet sizes 3..6.
SAX_BREAKPOINTS: dict[int, list[float]] = {
    3: [-0.43, 0.43],
    4: [-0.67, 0.0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
}


def sax_symbols(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    frame: int = 4,
    alphabet: int = 4,
) -> DataFrame:
    """(keys, frame_id, n_in_frame, paa (round 4), symbol) per PAA frame.

    ``symbol`` is 0-based (0 = lowest region).  Keys whose population σ
    is 0 (constant series) symbolize to the middle region via z = 0.
    """
    if alphabet not in SAX_BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(SAX_BREAKPOINTS)}")
    bps = SAX_BREAKPOINTS[alphabet]
    w = Window.partitionBy(*key_cols).orderBy(t_col)
    stats = df.groupBy(*key_cols).agg(
        F.avg(v_col).alias("_mu"),
        F.stddev_pop(v_col).alias("_sd"),
    )
    frames = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_fid", F.floor((F.col("_rn") - 1) / frame).cast("long"))
        .groupBy(*key_cols, "_fid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_in_frame"),
            F.avg(v_col).alias("_paa_raw"),
        )
        .join(F.broadcast(stats), key_cols)
    )
    z = F.when(
        F.col("_sd") > 0, (F.col("_paa_raw") - F.col("_mu")) / F.col("_sd")
    ).otherwise(F.lit(0.0))
    sym = F.lit(0)
    for b in bps:
        sym = sym + (z > F.lit(b)).cast("int")
    return frames.select(
        *key_cols,
        F.col("_fid").alias("frame_id"),
        "n_in_frame",
        (
            F.round(
                F.when(F.col("_sd") > 0,
                       (F.col("_paa_raw") - F.col("_mu")) / F.col("_sd"))
                .otherwise(F.lit(0.0)),
                4,
            )
            # + 0.0 normalizes IEEE negative zero (DuckDB round() yields
            # -0.0 for tiny negatives; Spark yields 0.0 — sf0.1 sweep)
            + F.lit(0.0)
        ).alias("paa_z"),
        sym.cast("long").alias("symbol"),
    )
