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
    daily offset is the day's mean exceedance over 100; days without
    exceedance inherit the previous day's offset (ffill) then the next
    day's (bfill), exactly the reference's interpolate+ffill+bfill chain
    collapsed to fills; corrected = value - offset (missing -> 0)."""
    wday = Window.partitionBy(key_col, day_col)
    exceed = F.when(F.col(value_col) > 100.0, F.col(value_col) - 100.0)
    with_off = df.withColumn("_day_off", F.avg(exceed).over(wday))
    wff = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wbf = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = with_off.withColumn(
        "offset_filled",
        F.coalesce(
            F.last("_day_off", ignorenulls=True).over(wff),
            F.first("_day_off", ignorenulls=True).over(wbf),
            F.lit(0.0),
        ),
    )
    # offset_filled is kept so callers can round it before differencing
    # (cross-engine float-boundary control, see queries_features.py)
    return filled.withColumn(
        out_col, F.col(value_col) - F.col("offset_filled")
    ).drop("_day_off")


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
