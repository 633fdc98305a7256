"""Distributed as-of join (backward, inclusive) — the time-series join.

`pandas.merge_asof` / kdb `aj` / TimescaleDB lateral-latest: for every
left row, attach the most recent right row with ``right.on <= left.on``
for the same ``by`` key, optionally within a tolerance.  diive gets this
implicitly from pandas indexing (e.g. inserting gap-filled values onto a
target grid); a distributed engine needs it as a first-class operator.

Scale design — the union + carry-forward formulation, NOT a range join:
both sides are tagged and unioned, then ONE window per ``by`` key ordered
by (time, side) carries the last non-null right values forward; left rows
then read their carried match.  Cost is a single hash shuffle on the key
plus a per-key sort — linear, no range-explode (a range join materializes
|left| x |right-in-window| candidates), no per-key state beyond the sort,
and AQE skew-split applies to hot keys.  This is the canonical
MapReduce-era sort-merge asof and survives 10^12 rows.

Right rows must be unique per (by, on) — pre-dedup with
``dedup_keep_last`` (operators/sanitize.py); with duplicates the carried
match is order-dependent in ANY engine (DuckDB ASOF has the same
caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join_backward"]


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tolerance: int | float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward inclusive as-of join.

    Adds, for each left row: ``{prefix}{v}`` for every right value column
    and ``{prefix}{on}`` (the matched right timestamp) — all NULL when no
    right row at-or-before exists (or the match is older than
    ``tolerance`` in ``on`` units).

    Ties: a right row AT the left row's timestamp matches (inclusive),
    implemented by sorting right rows (side 0) before left rows (side 1)
    at equal ``on``.
    """
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    left_only = [c for c in left.columns if c not in (by, on)]

    l2 = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_only],
        *[
            F.lit(None).cast(rtypes[v]).alias(f"_r_{v}")
            for v in value_cols
        ],
        F.lit(None).cast(ltypes[on]).alias("_rts"),
    )
    r2 = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_only],
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
        F.col(on).alias("_rts"),
    )
    u = l2.unionByName(r2)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumns(
        {
            **{
                f"_c_{v}": F.last(f"_r_{v}", ignorenulls=True).over(w)
                for v in value_cols
            },
            "_cts": F.last("_rts", ignorenulls=True).over(w),
        }
    )
    out = carried.filter(F.col("_side") == 1)
    matched = F.col("_cts").isNotNull()
    if tolerance is not None:
        matched = matched & (
            (F.col(on) - F.col("_cts")) <= F.lit(tolerance)
        )
    return out.select(
        F.col(by),
        F.col(on),
        *[F.col(c) for c in left_only],
        *[
            F.when(matched, F.col(f"_c_{v}")).alias(f"{prefix}{v}")
            for v in value_cols
        ],
        F.when(matched, F.col("_cts")).alias(f"{prefix}{on}"),
    )
