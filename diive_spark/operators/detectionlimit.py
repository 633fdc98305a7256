"""Flux detection limit from cross-covariance noise (SURVEY §2.11
``FluxDetectionLimit``,
/root/reference/diive/pkgs/echires/fluxdetectionlimit.py:56-209).

Per segment (key): Reynolds fluctuations of rotated w and the scalar,
cross-covariance over a lag range, flux conversion via the segment-mean
dry-air factor, max-|cov| lag inside the realistic window with a
nominal-lag fringe rule, and the LAN15/STR20 noise RMSE from the far
left/right lag windows -> detection limit = 3 x RMSE.

Spark shape: the reference's per-shift Python loop
(fluxdetectionlimit.py:126-146) becomes ONE fan-out join — each row is
exploded to every shift, joined back on (key, rn - shift), and
``covar_samp`` aggregates per (key, shift).  The join is co-partitioned
on the key, every aggregate is map-side combinable, and per-key work is
the same O(n_rows x n_shifts) the reference pays, parallel across
segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

R_GAS = 8.31446261815324  # universal gas constant, m3 Pa K-1 mol-1


def flux_detection_limit(
    df: DataFrame,
    key_col: str,
    order_col: str,
    w_col: str,
    c_col: str,
    ta_col: str,
    h2o_col: str,
    press_col: str,
    lag_from: int = -3600,
    lag_to: int = -3200,
    shift_step: int = 1,
    realistic_lo: int = -99,
    realistic_hi: int = 0,
    nominal_shift: int = -28,
) -> DataFrame:
    """One row per key: ``cov_max_shift, flux, flux_noise_rmse,
    flux_detection_limit, signal_to_noise, signal_to_detection_limit``.

    ``lag_from/lag_to`` (negative) bound the far LEFT noise window; the
    mirrored positive range is the right window (LAN15 eq. 9 as
    implemented by STR20, fluxdetectionlimit.py:166-196).  The max-|cov|
    search runs in ``[realistic_lo, realistic_hi]``; a max on the window
    fringe falls back to ``nominal_shift``
    (fluxdetectionlimit.py:88-109).  Pass ``w_col`` already rotated
    (functions/wind.double_rotation); fluctuations (mean removal) happen
    here."""
    wk = Window.partitionBy(key_col)
    wo = Window.partitionBy(key_col).orderBy(order_col)
    pd_pa = F.col(press_col) - F.col(h2o_col) * F.col(press_col)
    base = (
        df.select(key_col, order_col, w_col, c_col, ta_col, h2o_col, press_col)
        .withColumn("w_prime", F.col(w_col) - F.avg(w_col).over(wk))
        .withColumn("c_prime", F.col(c_col) - F.avg(c_col).over(wk))
        .withColumn("factor", F.avg(pd_pa / (F.lit(R_GAS) * F.col(ta_col))).over(wk))
        .withColumn("rn", F.row_number().over(wo))
    )
    shifts = list(range(lag_from, abs(lag_from), shift_step))
    a = base.select(key_col, "rn", "w_prime", "factor").withColumn(
        "shift", F.explode(F.array(*[F.lit(s) for s in shifts]))
    )
    b = base.select(
        F.col(key_col).alias("_k"), F.col("rn").alias("_rn"), "c_prime"
    )
    # pandas cov(w'[t], c'.shift(k)[t]) pairs w'[t] with c'[t-k]
    pairs = a.join(
        b,
        (a[key_col] == b["_k"]) & (b["_rn"] == a["rn"] - a["shift"]),
        "inner",
    )
    cov = pairs.groupBy(key_col, "shift").agg(
        F.covar_samp("w_prime", "c_prime").alias("cov"),
        F.first("factor").alias("factor"),
    )
    cov = cov.withColumn("cov_flux", F.col("cov") * F.col("factor")).withColumn(
        "cov_abs", F.abs("cov")
    )
    # Everything downstream reads the cov table ONCE: the max-|cov| pick,
    # the fringe fallback and the noise stats are windows + one aggregate
    # over the same (already key-partitioned) rows — joining cov against
    # derived-from-cov frames would re-execute the whole fan-out subtree
    # per join arm.
    in_real = (F.col("shift") >= realistic_lo) & (F.col("shift") <= realistic_hi)
    wk = Window.partitionBy(key_col)
    # rank 1 = realistic row with max |cov|, ties -> lowest shift (pandas
    # idxmax takes the first row in shift order)
    wr = Window.partitionBy(key_col).orderBy(
        in_real.cast("int").desc(), F.col("cov_abs").desc(), F.col("shift").asc()
    )
    inside = (F.col("shift") > realistic_lo) & (F.col("shift") < realistic_hi)
    c = (
        cov.withColumn("_rn", F.row_number().over(wr))
        .withColumn(
            "_nominal_flux",
            F.max(F.when(F.col("shift") == nominal_shift, F.col("cov_flux"))).over(wk),
        )
        .withColumn(
            "_chosen_shift",
            F.when(inside, F.col("shift")).otherwise(F.lit(nominal_shift)),
        )
        .withColumn(
            "_chosen_flux",
            F.when(inside, F.col("cov_flux")).otherwise(F.col("_nominal_flux")),
        )
    )
    left = F.col("shift").between(lag_from, lag_to)
    right = F.col("shift").between(-lag_to, -lag_from)
    agg = c.groupBy(key_col).agg(
        F.max(F.when(F.col("_rn") == 1, F.col("_chosen_shift"))).alias("cov_max_shift"),
        F.max(F.when(F.col("_rn") == 1, F.col("_chosen_flux"))).alias("flux"),
        F.stddev_samp(F.when(left, F.col("cov_flux"))).alias("std_l"),
        F.avg(F.when(left, F.col("cov_flux"))).alias("mean_l"),
        F.stddev_samp(F.when(right, F.col("cov_flux"))).alias("std_r"),
        F.avg(F.when(right, F.col("cov_flux"))).alias("mean_r"),
    )
    rmse = F.sqrt(
        0.5
        * (
            F.col("std_l") * F.col("std_l")
            + F.col("mean_l") * F.col("mean_l")
            + F.col("std_r") * F.col("std_r")
            + F.col("mean_r") * F.col("mean_r")
        )
    )
    return agg.select(
        key_col,
        "cov_max_shift",
        "flux",
        rmse.alias("flux_noise_rmse"),
        (rmse * 3).alias("flux_detection_limit"),
        (F.abs(F.col("flux")) / rmse).alias("signal_to_noise"),
        (F.abs(F.col("flux")) / (rmse * 3)).alias("signal_to_detection_limit"),
    )
