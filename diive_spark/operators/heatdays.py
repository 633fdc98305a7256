"""Critical heat days from TA/VPD percentile bins (SURVEY §2.11
``FluxCriticalHeatDaysP95``,
/root/reference/diive/pkgs/flux/criticalheatdays.py:19-748).

Pipeline: daily aggregates (TA max, VPD max, flux sum by default) ->
20 quantile bins per variable labelled by percentile start (0, 5, ...,
95, the reference's qcut labels) -> combined-bin (label sum) flux stats
per bin scenario -> critical-heat-day thresholds (both labels == 95) and
near-critical (both == 90).

Scenario subsets mirror the REFERENCE CODE including its quirk
(criticalheatdays.py:292-301): 'tahigher' is BIN_DIFF > 5 but
'vpdhigher' is BIN_DIFF < 5 — which also contains the equal (0) and
one-bin-higher-TA (5 excluded, <5 keeps 0) rows; the subsets overlap by
construction.

Scale note: the quantile binning runs over the DAILY table — one row
per day, inherently tiny (a century is ~36.5k rows), so the global
ntile here is not a scale hazard; the heavy lift is the daily
aggregation, a single map-side-combinable groupBy over the raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_percentile_bins(
    daily: DataFrame,
    ta_col: str,
    vpd_col: str,
    flux_col: str,
    date_col: str = "date",
    n_quantiles: int = 20,
    min_n_vals_per_bin: int = 5,
) -> DataFrame:
    """Long-form daily table with ``bin_ta``, ``bin_vpd`` (percentile
    start labels), ``bins_combined_int`` (label SUM, quantilexyaggz.py:88)
    and ``bin_diff``; combined bins holding < ``min_n_vals_per_bin`` days
    are dropped (quantilexyaggz.py:91-99).  Quantile assignment is ntile
    with a deterministic (value, date) tie-break — the engine-portable
    equivalent of the reference's pd.qcut (same convention as A9/A10)."""
    step = int(100 / n_quantiles)
    wx = Window.orderBy(ta_col, date_col)
    wy = Window.orderBy(vpd_col, date_col)
    b = daily.withColumn(
        "bin_ta", ((F.ntile(n_quantiles).over(wx) - 1) * step).cast("int")
    ).withColumn(
        "bin_vpd", ((F.ntile(n_quantiles).over(wy) - 1) * step).cast("int")
    )
    b = b.withColumn(
        "bins_combined_int", (F.col("bin_ta") + F.col("bin_vpd")).cast("int")
    ).withColumn("bin_diff", (F.col("bin_ta") - F.col("bin_vpd")).cast("int"))
    wcombo = Window.partitionBy("bin_ta", "bin_vpd")
    return (
        b.withColumn("_combo_n", F.count("*").over(wcombo))
        .filter(F.col("_combo_n") >= min_n_vals_per_bin)
        .drop("_combo_n")
    )


def combo_bin_stats(
    long_df: DataFrame,
    ta_col: str,
    vpd_col: str,
    flux_col: str,
) -> DataFrame:
    """Per-scenario combined-bin stats (criticalheatdays.py:414-425):
    flux mean/std/count + mean±std, TA and VPD min/max, for the four bin
    scenarios all / equal / tahigher / vpdhigher."""
    scen = F.array(
        F.lit("all"),
        F.when(F.col("bin_diff") == 0, F.lit("equal")),
        F.when(F.col("bin_diff") > 5, F.lit("tahigher")),
        F.when(F.col("bin_diff") < 5, F.lit("vpdhigher")),
    )
    tagged = long_df.withColumn(
        "scenario", F.explode(F.filter(scen, lambda s: s.isNotNull()))
    )
    out = tagged.groupBy("scenario", "bins_combined_int").agg(
        F.avg(flux_col).alias("flux_mean"),
        F.stddev_samp(flux_col).alias("flux_std"),
        F.count(flux_col).cast("long").alias("n"),
        F.min(ta_col).alias("ta_min"),
        F.max(ta_col).alias("ta_max"),
        F.min(vpd_col).alias("vpd_min"),
        F.max(vpd_col).alias("vpd_max"),
    )
    return out.withColumn(
        "flux_mean_plus_std", F.col("flux_mean") + F.col("flux_std")
    ).withColumn("flux_mean_minus_std", F.col("flux_mean") - F.col("flux_std"))


def chd_thresholds(
    long_df: DataFrame,
    ta_col: str,
    vpd_col: str,
) -> DataFrame:
    """One row: critical-heat-day thresholds (min TA/VPD aggregate among
    days with both bins == 95) and near-critical ranges (min..max among
    days with both bins == 90), plus day counts
    (criticalheatdays.py:377-412)."""
    chd = (F.col("bin_ta") == 95) & (F.col("bin_vpd") == 95)
    nchd = (F.col("bin_ta") == 90) & (F.col("bin_vpd") == 90)
    return long_df.agg(
        F.min(F.when(chd, F.col(ta_col))).alias("thres_chd_ta"),
        F.min(F.when(chd, F.col(vpd_col))).alias("thres_chd_vpd"),
        F.min(F.when(nchd, F.col(ta_col))).alias("thres_nchd_ta_lo"),
        F.max(F.when(nchd, F.col(ta_col))).alias("thres_nchd_ta_hi"),
        F.min(F.when(nchd, F.col(vpd_col))).alias("thres_nchd_vpd_lo"),
        F.max(F.when(nchd, F.col(vpd_col))).alias("thres_nchd_vpd_hi"),
        F.sum(F.when(chd, 1).otherwise(0)).cast("long").alias("n_chd"),
        F.sum(F.when(nchd, 1).otherwise(0)).cast("long").alias("n_nchd"),
    )
