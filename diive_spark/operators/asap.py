"""ASAP smoothing-parameter search (Rong & Bailis, VLDB 2017 —
"ASAP: Prioritizing Attention via Time Series Smoothing").

Dashboards plot rolled-up series through a moving average; ASAP picks
the window length automatically: the SMOOTHEST window (minimum
roughness = std of the smoothed series' first differences) whose
smoothed series still PRESERVES kurtosis (kurt(smoothed) ≥ kurt(raw)) —
kurtosis preservation keeps spikes/outliers visible, which is the whole
point of plotting.  The reference engine (diive) smooths with fixed
windows chosen by the user; ASAP is the missing auto-tune for the tier
rollup → dashboard last mile.

Declarative formulation (full DuckDB twin):

* candidate windows are a FIXED list unrolled into one union arm per
  ``w`` — window-frame sizes must be literals in both engines, so the
  search grid is compile-time, exactly like the paper's grid search;
* the smoothed value is a trailing ``w``-row average, restricted to
  rows with a full window (count == w) so both engines see identical
  edge handling;
* roughness and kurtosis come from raw power sums (E[x],E[x²],E[x³],
  E[x⁴] → central moments by expansion) — plain aggregates, no kernel;
* selection is one row_number per key over (qualifies DESC, roughness
  ASC, w ASC) with metrics rounded to 4 decimals first, so the argmin
  cannot flip on cross-engine float-order noise.

Scale: input is an already-rolled-up tier series (rows ∝ time span, not
event volume); each candidate is one partitioned-window pass + one
map-side-combinable agg; the union is |W| arms of that.  No collects,
no kernels, no unpartitioned windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ASAP_CANDIDATES", "asap_metrics", "asap_select"]

ASAP_CANDIDATES = [1, 2, 4, 8, 12, 24]


def _central_metrics(smoothed: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key roughness (population std of first differences) and
    population kurtosis (μ4/σ⁴) of the ``s`` column, from power sums."""
    out = smoothed.groupBy(*key_cols, "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_pts"),
        F.avg("s").alias("_m1"),
        F.avg(F.col("s") * F.col("s")).alias("_m2"),
        F.avg(F.col("s") * F.col("s") * F.col("s")).alias("_m3"),
        F.avg(F.col("s") * F.col("s") * F.col("s") * F.col("s")).alias("_m4"),
        F.avg("d").alias("_d1"),
        F.avg(F.col("d") * F.col("d")).alias("_d2"),
    )
    var = F.col("_m2") - F.col("_m1") * F.col("_m1")
    mu4 = (
        F.col("_m4")
        - 4 * F.col("_m3") * F.col("_m1")
        + 6 * F.col("_m2") * F.col("_m1") * F.col("_m1")
        - 3 * F.pow(F.col("_m1"), F.lit(4))
    )
    dvar = F.col("_d2") - F.col("_d1") * F.col("_d1")
    return out.select(
        *key_cols,
        "w",
        "n_pts",
        F.round(F.sqrt(F.greatest(dvar, F.lit(0.0))), 4).alias("roughness"),
        F.round(mu4 / (var * var), 4).alias("kurtosis"),
    )


def asap_metrics(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    candidates: list[int] | None = None,
) -> DataFrame:
    """(keys, w, n_pts, roughness, kurtosis) for every candidate window.

    ``w == 1`` is the raw series (its kurtosis is the preservation
    threshold).  Rows without a full trailing window are excluded from
    the smoothed series, and the first difference within each (key, w)
    likewise needs a previous smoothed row.
    """
    cands = candidates or ASAP_CANDIDATES
    base = Window.partitionBy(*key_cols).orderBy(t_col)
    # ALL candidate windows share (partition, order), so every trailing
    # average, its lag, and the row number ride ONE sort-exchange —
    # a union of per-w arms would re-sort the series |W| times.  On a
    # trailing w-row frame, "count == w" simply means row_number ≥ w, so
    # the filtered-lag of the original formulation equals the unfiltered
    # lag restricted to row_number > w (both rows have full windows) —
    # bit-identical, no per-arm filter-then-lag needed.
    cols = [F.row_number().over(base).alias("_rn")]
    for w in cands:
        win = base.rowsBetween(-(w - 1), 0)
        cols.append(F.avg(v_col).over(win).alias(f"_s{w}"))
    staged = df.select(*key_cols, t_col, *cols)
    lag_cols = [
        (F.col(f"_s{w}") - F.lag(f"_s{w}").over(base)).alias(f"_d{w}")
        for w in cands
    ]
    staged = staged.select(*key_cols, "_rn", *[f"_s{w}" for w in cands], *lag_cols)
    allw = (
        staged.select(
            *key_cols,
            "_rn",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w).cast("long").alias("w"),
                            F.col(f"_s{w}").alias("s"),
                            F.col(f"_d{w}").alias("d"),
                        )
                        for w in cands
                    ]
                )
            ).alias("_x"),
        )
        .filter(F.col("_rn") > F.col("_x.w"))
        .select(*key_cols, "_x.w", "_x.s", "_x.d")
    )
    return _central_metrics(allw, key_cols)


def asap_select(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    candidates: list[int] | None = None,
) -> DataFrame:
    """One row per key: the ASAP-chosen window.

    qualifies(w) = kurtosis(w) ≥ kurtosis(1) (on the rounded metrics);
    among qualifying windows pick min roughness, tie-break smaller w;
    w = 1 always qualifies (kurt(1) ≥ kurt(1)), so a choice always
    exists.  Output keeps the chosen window's metrics plus the raw
    series' kurtosis threshold.
    """
    # one materialization of the input series: the |W| union arms (and
    # the kurt_raw base arm) would otherwise each recompute the upstream
    # rollup — Catalyst does not share subtrees across union branches.
    # The input is an already-rolled-up tier series (rows ∝ time span),
    # so the checkpoint is small by construction.
    df = df.select(*key_cols, t_col, v_col).localCheckpoint(eager=False)
    m = asap_metrics(df, key_cols, t_col, v_col, candidates).localCheckpoint(
        eager=False
    )
    base = m.filter(F.col("w") == 1).select(
        *key_cols, F.col("kurtosis").alias("kurt_raw")
    )
    j = m.join(F.broadcast(base), key_cols)
    qual = (F.col("kurtosis") >= F.col("kurt_raw")).cast("int")
    wbest = Window.partitionBy(*key_cols).orderBy(
        qual.desc(), F.col("roughness").asc(), F.col("w").asc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(wbest))
        .filter(F.col("_rn") == 1)
        .select(
            *key_cols,
            F.col("w").alias("w_opt"),
            "n_pts",
            "roughness",
            "kurtosis",
            "kurt_raw",
        )
    )
