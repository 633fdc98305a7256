"""Correction operators (SURVEY §2.9): value-rewriting transforms.

C1 remove_radiation_zero_offset, C2 remove_relativehumidity_offset,
C4 setto_value — re-expressed as partitioned-window expressions (the
reference computes per-day offsets on a single pandas series; here the
day-offset is a window aggregate partitioned by (key, day), which Spark
evaluates with one shuffle per key/day layout, no join needed)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def setto_value_ranges(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    ranges: list[tuple[str, str, float]],
    out_col: str = "value_set",
    flag_col: str = "flag_setto_value",
) -> DataFrame:
    """Set the value to a constant inside [start, end] timestamp ranges and
    flag the rewritten rows (reference ``setto_value``,
    /root/reference/diive/pkgs/corrections/setto_value.py:4-39 +
    ManualRemoval range handling, manualremoval.py:71-99)."""
    v = F.col(value_col)
    newv, hit = v, F.lit(False)
    for start, end, const in ranges:
        cond = F.col(ts_col).between(F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp"))
        newv = F.when(cond, F.lit(float(const))).otherwise(newv)
        hit = hit | cond
    return df.withColumn(out_col, newv).withColumn(
        flag_col, F.when(hit, F.lit(2)).otherwise(F.lit(0)).cast("int")
    )


def rh_offset_correction(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    order_cols: list[str],
    out_col: str = "value_corr",
) -> DataFrame:
    """Relative-humidity-style offset removal (reference
    ``remove_relativehumidity_offset``, offsetcorrection.py:9-67): the
    daily offset is the day's mean exceedance over 100, broadcast to every
    row of the day; rows in days WITHOUT exceedance get the offset
    LINEARLY INTERPOLATED by row position between the neighbouring
    exceedance days (the reference's hires ``.interpolate()``), then
    ffill/bfill at the edges; all-null -> 0; corrected = value - offset.
    Matched row-exact against the reference in
    tests/test_reference_differential3.py."""
    wday = Window.partitionBy(key_col, day_col)
    exceed = F.when(F.col(value_col) > 100.0, F.col(value_col) - 100.0)
    with_off = df.withColumn("_day_off", F.avg(exceed).over(wday))

    worder = Window.partitionBy(key_col).orderBy(*order_cols)
    pos = F.row_number().over(worder)
    with_off = with_off.withColumn("_pos", pos)
    wprev = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wnext = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev_v = F.last("_day_off", ignorenulls=True).over(wprev)
    prev_p = F.last(
        F.when(F.col("_day_off").isNotNull(), F.col("_pos")), ignorenulls=True
    ).over(wprev)
    next_v = F.first("_day_off", ignorenulls=True).over(wnext)
    next_p = F.first(
        F.when(F.col("_day_off").isNotNull(), F.col("_pos")), ignorenulls=True
    ).over(wnext)
    interp = prev_v + (next_v - prev_v) * (F.col("_pos") - prev_p) / (next_p - prev_p)
    filled = with_off.withColumn(
        "offset_filled",
        F.coalesce(
            F.col("_day_off"),
            F.when(prev_v.isNotNull() & next_v.isNotNull(), interp),
            prev_v,  # ffill tail
            next_v,  # bfill head
            F.lit(0.0),  # no exceedance anywhere
        ),
    )
    # offset_filled is kept so callers can round it before differencing
    # (cross-engine float-boundary control, see queries_features.py)
    return filled.withColumn(
        out_col, F.col(value_col) - F.col("offset_filled")
    ).drop("_day_off", "_pos")


def radiation_offset_correction(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    night_col: str,
    out_col: str = "value_corr",
) -> DataFrame:
    """Radiation zero-offset removal (reference
    ``remove_radiation_zero_offset``, offsetcorrection.py:71-160): offset =
    per-(key, day) nighttime mean, gap-filled with the key's median daily
    offset; value - offset, nighttime forced to 0, negatives clamped to 0.
    Row-exact vs the reference when every day has nighttime data
    (tests/test_reference_differential3.py); DOCUMENTED deviation for
    missing-day gap-fill: the reference interpolates missing days first and
    median-fills the remainder with a row-weighted median
    (offsetcorrection.py:118-127), this operator median-fills directly with
    the per-day median — simpler and identical when no days are missing.

    The per-day offset is a conditional window aggregate; the median
    fallback is a tiny per-key aggregate joined back broadcast."""
    wday = Window.partitionBy(key_col, day_col)
    night_val = F.when(F.col(night_col) == 1, F.col(value_col))
    with_off = df.withColumn("_day_off", F.avg(night_val).over(wday))
    day_offsets = (
        with_off.groupBy(key_col, day_col)
        .agg(F.first("_day_off").alias("_o"))
        .groupBy(key_col)
        .agg(F.expr("percentile(_o, 0.5)").alias("_median_off"))
    )
    joined = with_off.join(F.broadcast(day_offsets), key_col).withColumn(
        "offset_applied",
        F.coalesce("_day_off", "_median_off", F.lit(0.0)),
    )
    corrected = F.greatest(
        F.col(value_col) - F.col("offset_applied"), F.lit(0.0)
    )
    # offset_applied kept for caller-side rounding (cross-engine equality)
    return joined.withColumn(
        out_col, F.when(F.col(night_col) == 1, F.lit(0.0)).otherwise(corrected)
    ).drop("_day_off", "_median_off")
