"""Classical seasonal-trend decomposition and CUSUM mean-shift
detection — declarative window formulations, zero Python in the plan.

``classical_decompose`` is the textbook additive decomposition
(statsmodels ``seasonal_decompose``, Macaulay's classical method):

    trend_t    = centered 2xP moving average (half weights at the ends,
                 the standard even-period formula)
    seasonal_p = mean of (y - trend) per phase p, re-centered to sum 0
    resid_t    = y_t - trend_t - seasonal_p(t)

The reference's diel-cycle analytics (diive
pkgs/analyses/dielcycle usage via queries `diel_cycle`) estimate the
seasonal component alone; decomposition adds the trend/residual split a
retention-tier engine needs for anomaly screens over rolled-up series.

``cusum_flags`` is one-sided CUSUM (Page 1954) in CLOSED FORM: the
recursion  s_t = max(0, s_{t-1} + d_t)  equals
``cumsum(d) - running_min(cumsum(d))`` — an identity that turns the
textbook sequential test into two window functions, so the detector runs
as pure whole-stage-codegen column math per key (no kernel, no
recursion), and the DuckDB oracle replays the identical algebra.

Scale notes: both operators consume an ALREADY-AGGREGATED per-bucket
series (e.g. an hourly rollup tier) — the input is proportional to the
time span, not the raw event volume, so the window sort-exchange is tiny
by construction; the upstream rollup is the usual map-side-combinable
groupBy.  The decomposition's row-based window assumes a gap-free
regular grid (regularize with operators/sanitize.py upstream); rows with
an incomplete 2P+1 neighborhood emit NULL trend, exactly like
statsmodels' edge behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["classical_decompose", "cusum_flags"]


def classical_decompose(
    df: DataFrame,
    ts_col: str = "ts_s",
    value_col: str = "y",
    period: int = 24,
    by: list[str] | None = None,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Additive y = trend + seasonal + resid over a regular series.

    ``period`` must be even (the 2xP centered-MA formula); phase is
    ``(ts / bucket_seconds) mod period``.  Phase resolution (ADVICE r3):
    an existing ``phase`` column wins; else ``bucket_seconds`` if given;
    else the grid step is DERIVED per key as the minimum positive ts
    delta (no hardcoded 3600 s assumption).

    Re-centering divides by the number of phases actually PRESENT per
    key (``countDistinct(phase)``), not the literal ``period`` — for a
    series covering every phase the two agree, but a short series no
    longer biases seasonal/resid (ADVICE r3).
    """
    assert period % 2 == 0, "classical even-period formula needs even P"
    h = period // 2
    keys = by or []
    w = Window.partitionBy(*keys).orderBy(ts_col)
    win = w.rowsBetween(-h, h)
    wall = Window.partitionBy(*keys)
    y = F.col(value_col)
    # 2xP MA == (sum of the 2h+1 window - half the two end values) / P
    trend = F.when(
        F.count(y).over(win) == 2 * h + 1,
        (
            F.sum(y).over(win)
            - 0.5 * F.lag(y, h).over(w)
            - 0.5 * F.lead(y, h).over(w)
        )
        / F.lit(float(period)),
    )
    out = df.withColumn("trend", trend)
    if "phase" in df.columns:
        out = out.withColumn("phase", F.col("phase"))
    elif bucket_seconds is not None:
        out = out.withColumn(
            "phase",
            (F.col(ts_col) / F.lit(bucket_seconds)).cast("long") % period,
        )
    else:
        # derive the grid step per key: min positive ts delta (one lag +
        # one per-key aggregate window — both reuse the existing sort)
        out = (
            out.withColumn(
                "_step", F.min(F.col(ts_col) - F.lag(ts_col).over(w)).over(wall)
            )
            .withColumn(
                "phase", (F.col(ts_col) / F.col("_step")).cast("long") % period
            )
            .drop("_step")
        )
    detr = F.col(value_col) - F.col("trend")
    wp = Window.partitionBy(*keys, "phase")
    # re-center: subtract the mean of the DISTINCT phase means actually
    # present (the mean over rows equals it only for balanced designs) —
    # each window layer materializes as its own column so nothing nests
    out = (
        out.withColumn("_sraw", F.avg(detr).over(wp))
        .withColumn(
            "_rn", F.row_number().over(wp.orderBy(ts_col))
        )
        .withColumn(
            "_grand",
            F.sum(F.when(F.col("_rn") == 1, F.col("_sraw"))).over(wall)
            / F.count(F.when(F.col("_rn") == 1, F.lit(1))).over(wall),
        )
        .withColumn("seasonal", F.col("_sraw") - F.col("_grand"))
        .withColumn(
            "resid", F.col(value_col) - F.col("trend") - F.col("seasonal")
        )
        .drop("_sraw", "_grand", "_rn")
    )
    return out


def cusum_flags(
    df: DataFrame,
    ts_col: str = "ts_s",
    value_col: str = "y",
    by: list[str] | None = None,
    drift_k: float = 0.5,
    threshold_h: float = 5.0,
) -> DataFrame:
    """Two-sided standardized CUSUM with upward/downward statistics and
    first-crossing alarm flags.

    Values are standardized per key against the SERIES mean/stddev
    (a window aggregate — one pass); d⁺ = z − k, d⁻ = −z − k;
    s⁺/s⁻ via the cumsum − running-min identity.  ``alarm`` marks
    threshold CROSSINGS (s > h and previous s ≤ h) — the points a
    sequential monitor would fire at.
    """
    keys = by or []
    wall = Window.partitionBy(*keys)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    y = F.col(value_col)
    mu = F.avg(y).over(wall)
    sd = F.stddev_samp(y).over(wall)
    z = (y - mu) / sd
    out = df.withColumn("_dp", z - F.lit(drift_k)).withColumn(
        "_dn", -z - F.lit(drift_k)
    )
    for side, d in (("up", "_dp"), ("dn", "_dn")):
        cum = F.sum(F.col(d)).over(wcum)
        out = out.withColumn(f"_c_{side}", cum)
        run_min = F.min(
            F.least(F.col(f"_c_{side}"), F.lit(0.0))
        ).over(wcum)
        out = out.withColumn(
            f"s_{side}", F.col(f"_c_{side}") - run_min
        ).drop(d)
    prev_up = F.lag("s_up", 1, 0.0).over(w)
    prev_dn = F.lag("s_dn", 1, 0.0).over(w)
    h = F.lit(threshold_h)
    return (
        out.withColumn(
            "alarm",
            (
                ((F.col("s_up") > h) & (prev_up <= h))
                | ((F.col("s_dn") > h) & (prev_dn <= h))
            ).cast("int"),
        )
        .drop("_c_up", "_c_dn")
    )
