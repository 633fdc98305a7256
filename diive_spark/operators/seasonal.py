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
) -> DataFrame:
    """Additive y = trend + seasonal + resid over a regular series.

    ``period`` must be even (the 2xP centered-MA formula); phase is
    ``(ts / bucket_seconds) mod period`` — the caller's ``ts_col`` is
    expected in units where consecutive rows differ by one bucket
    (epoch-seconds inputs with hourly buckets: pass ts already bucketed,
    phase derives from row ts // 3600 % 24 upstream or here via the
    ``phase`` column if present).
    """
    assert period % 2 == 0, "classical even-period formula needs even P"
    h = period // 2
    keys = by or []
    w = Window.partitionBy(*keys).orderBy(ts_col)
    win = w.rowsBetween(-h, h)
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
    out = df.withColumn("trend", trend).withColumn(
        "phase",
        (F.col(ts_col) / F.lit(3600)).cast("long") % period
        if "phase" not in df.columns
        else F.col("phase"),
    )
    detr = F.col(value_col) - F.col("trend")
    wp = Window.partitionBy(*keys, "phase")
    wall = Window.partitionBy(*keys)
    # re-center: subtract the mean of the P DISTINCT phase means (the
    # mean over rows equals it only for balanced designs) — each window
    # layer materializes as its own column so nothing nests
    out = (
        out.withColumn("_sraw", F.avg(detr).over(wp))
        .withColumn(
            "_rn", F.row_number().over(wp.orderBy(ts_col))
        )
        .withColumn(
            "_grand",
            F.sum(F.when(F.col("_rn") == 1, F.col("_sraw"))).over(wall)
            / F.lit(float(period)),
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
