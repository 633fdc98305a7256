"""Gap analysis and gap-filling (SURVEY §2.3 A5, §2.4 T3/T4).

All operators are pure window expressions (gaps-and-islands): no kernels,
no joins — one sort-shuffle per series ordering that Catalyst shares across
the chained windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _run_id(key_col: str, ts_col: str, value_col: str) -> Column:
    """Consecutive-NaN run id: cumulative count of non-null records
    (/root/reference/diive/pkgs/analyses/gapfinder.py:58-75 — valid records
    flagged 1, cumsum constant across a gap run)."""
    w = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return F.count(value_col).over(w)


def gap_runs(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_col: str = "value",
    limit: int | None = None,
) -> DataFrame:
    """One row per NaN gap run: (key, gap_start, gap_end, gap_len)
    (/root/reference/diive/pkgs/analyses/gapfinder.py:58-117). With
    ``limit``, keep only runs with gap_len <= limit (gapfinder.py:105-117)."""
    runid = _run_id(key_col, ts_col, value_col)
    gaps = (
        df.withColumn("__run", runid)
        .filter(F.col(value_col).isNull())
        .groupBy(key_col, "__run")
        .agg(
            F.min(ts_col).alias("gap_start"),
            F.max(ts_col).alias("gap_end"),
            F.count(F.lit(1)).alias("gap_len"),
        )
        .drop("__run")
    )
    if limit is not None:
        gaps = gaps.filter(F.col("gap_len") <= limit)
    return gaps


def linear_interp_limited(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_limit: int = 3,
    out_col: str | None = None,
    flag_col: str | None = "flag_gapfilled",
    chunk_slots: int | None = None,
    grid_step: int = 1,
) -> DataFrame:
    """Linear interpolation of interior gaps with run-length <= gap_limit
    (/root/reference/diive/pkgs/gapfilling/interpolate.py:8-36).

    pandas ``interpolate(method='linear')`` weights by ROW POSITION (equally
    spaced), not elapsed time; on the engine's regular per-series grid the
    two coincide, and we use row position to match the reference exactly
    even on irregular grids.

    ``limit_area='inside'`` ⇒ only gaps with a valid value on BOTH sides.

    ``chunk_slots`` (with ``grid_step`` = the grid spacing of ``ts_col``):
    halo-chunk the per-key windows so one monster series never lands in a
    single task.  halo = gap_limit+1 slots is EXACT: a fillable gap (≤
    gap_limit) plus both anchors fits inside the halo, and a gap that
    extends past the halo leaves prev/next null inside the visible window,
    so it is (correctly) left unfilled on both paths.  The interpolation
    weights use row positions local to the visible window — only position
    DIFFERENCES enter the formula, so they match the global ones."""
    if chunk_slots:
        from diive_spark.operators.chunking import explode_halo_chunks

        d0 = df.withColumn("__slotpos", F.col(ts_col) / grid_step)
        d0 = explode_halo_chunks(d0, "__slotpos", chunk_slots, gap_limit + 1)
        out = linear_interp_limited(
            d0,
            key_col=[key_col, "__chunk"],  # type: ignore[arg-type]
            ts_col=ts_col,
            value_col=value_col,
            gap_limit=gap_limit,
            out_col=out_col,
            flag_col=flag_col,
        )
        return out.filter(
            F.col("__chunk") == F.floor(F.col("__slotpos") / chunk_slots)
        ).drop("__slotpos", "__chunk")
    part = key_col if isinstance(key_col, list) else [key_col]
    w_ord = Window.partitionBy(*part).orderBy(ts_col)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_next = w_ord.rowsBetween(1, Window.unboundedFollowing)
    pos = F.row_number().over(w_ord)
    v = F.col(value_col)

    run_id = F.count(value_col).over(
        w_ord.rowsBetween(Window.unboundedPreceding, 0)
    )
    d = (
        df.withColumn("__pos", pos)
        .withColumn("__vpos", F.when(v.isNotNull(), F.col("__pos")))
        .withColumn("__run", run_id)
    )
    prev_v = F.last(value_col, ignorenulls=True).over(w_prev)
    prev_p = F.last("__vpos", ignorenulls=True).over(w_prev)
    next_v = F.first(value_col, ignorenulls=True).over(w_next)
    next_p = F.first("__vpos", ignorenulls=True).over(w_next)
    run_w = Window.partitionBy(*part, "__run")
    gap_len = F.sum(F.when(v.isNull(), 1).otherwise(0)).over(run_w)

    interp = prev_v + (next_v - prev_v) * (F.col("__pos") - prev_p) / (next_p - prev_p)
    fillable = (
        v.isNull()
        & prev_v.isNotNull()
        & next_v.isNotNull()
        & (gap_len <= gap_limit)
    )
    out_col = out_col or value_col
    d = d.withColumn("__filled", F.when(fillable, interp).otherwise(v))
    if flag_col:
        d = d.withColumn(
            flag_col,
            F.when(fillable, F.lit(1)).otherwise(F.lit(0)).cast("tinyint"),
        )
    return d.withColumn(out_col, F.col("__filled")).drop(
        "__pos", "__vpos", "__run", "__filled"
    )


def ffill_limited(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_col: str = "value",
    limit: int = 3,
    out_col: str | None = None,
) -> DataFrame:
    """Forward-fill with limit: pandas ``ffill(limit=n)`` — a null is filled
    iff a valid value exists within the previous ``limit`` rows. Used by the
    upsampling harmonization
    (/root/reference/diive/pkgs/qaqc/meteoscreening.py:571-631, which uses
    backfill for END-stamped data; see :func:`bfill_limited`)."""
    w = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(-limit, 0)
    filled = F.coalesce(F.col(value_col), F.last(value_col, ignorenulls=True).over(w))
    return df.withColumn(out_col or value_col, filled)


def bfill_limited(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_col: str = "value",
    limit: int = 3,
    out_col: str | None = None,
) -> DataFrame:
    """Backward-fill with limit (pandas ``bfill(limit=n)``) — the fill used
    to harmonize mixed-resolution groups onto the finest grid
    (meteoscreening.py:571-631: END-labeled timestamps ⇒ backfill)."""
    w = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(0, limit)
    filled = F.coalesce(F.col(value_col), F.first(value_col, ignorenulls=True).over(w))
    return df.withColumn(out_col or value_col, filled)
