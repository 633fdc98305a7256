"""Point-in-interval join — the containment analog of the as-of join
(SURVEY §2.5 extension): attach to every point the interval(s)
``[start, end]`` of the same key that contain it.

Spark has no native interval/range join (Databricks' range-join hint is
proprietary), and the naive formulation — an inequality-only theta join —
degenerates to a broadcast-nested-loop over every (key-matched) pair.
This implements the standard banding strategy instead: intervals explode
to the fixed-width time buckets they COVER, points carry their single
bucket, and the join becomes an equi-join on ``(key, bucket)`` with the
exact containment predicate applied after.  A point's bucket intersects
every interval covering that bucket exactly once, so no dedup pass is
needed.

Bucket-width trade-off (document, don't guess): fan-out per interval is
``len/width + 1`` rows, while candidate pairs per point scale with the
number of intervals touching its bucket — pick ``bucket_s`` near the
typical interval length so both stay O(1).  ``max_span_buckets`` guards
against a degenerate interval exploding the plan (a crawl session lasting
a year); longer intervals are truncated with an explicit error rather
than silently flooding the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join", "interval_overlap_join"]


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int = 3600,
    max_span_buckets: int = 10_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every same-key interval containing its
    timestamp (``start <= ts <= end``).  ``how='left'`` keeps uncontained
    points with null interval columns."""
    b0 = F.floor(F.col(start_col) / bucket_s).cast("long")
    b1 = F.floor(F.col(end_col) / bucket_s).cast("long")
    iv = intervals.withColumn("_span", b1 - b0 + 1)
    # fail loudly on degenerate intervals instead of flooding the shuffle
    iv = iv.withColumn(
        "_bkt",
        F.explode(
            F.when(
                F.col("_span") <= max_span_buckets,
                F.sequence(b0, b1),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("interval spans more than "),
                        F.lit(str(max_span_buckets)),
                        F.lit(" buckets; raise bucket_s or split it"),
                    )
                )
            )
        ),
    ).drop("_span")
    pt = points.withColumn(
        "_bkt", F.floor(F.col(ts_col) / bucket_s).cast("long")
    )
    joined = pt.alias("p").join(
        iv.alias("i"),
        (F.col(f"p.{key_col}") == F.col(f"i.{key_col}"))
        & (F.col("p._bkt") == F.col("i._bkt"))
        & (F.col(f"p.{ts_col}") >= F.col(f"i.{start_col}"))
        & (F.col(f"p.{ts_col}") <= F.col(f"i.{end_col}")),
        how,
    )
    keep_p = [F.col(f"p.{c}").alias(c) for c in points.columns]
    keep_i = [
        F.col(f"i.{c}").alias(c)
        for c in intervals.columns
        if c != key_col
    ]
    return joined.select(*keep_p, *keep_i)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_start: str = "l_start",
    left_end: str = "l_end",
    right_start: str = "r_start",
    right_end: str = "r_end",
    bucket_s: int = 3600,
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Interval × interval OVERLAP join (closed intervals of the same
    key; ``a.s <= b.e AND b.s <= a.e``) — the two-sided sibling of
    :func:`point_in_interval_join`.

    Both sides band to covered buckets, but overlapping pairs share MANY
    buckets; instead of a distinct pass, each pair is emitted from exactly
    ONE canonical bucket — the bucket holding the overlap's start
    ``max(a.s, b.s)``, which both intervals cover by definition.  The join
    stays a pure equi-join + filter: no dedup shuffle, no theta-join BNL.
    Adds ``overlap_start/overlap_end/overlap_s`` to the joined row.
    Column names must not collide apart from ``key_col``.
    """
    def banded(df: DataFrame, s: str, e: str) -> DataFrame:
        b0 = F.floor(F.col(s) / bucket_s).cast("long")
        b1 = F.floor(F.col(e) / bucket_s).cast("long")
        return df.withColumn(
            "_bkt",
            F.explode(
                F.when(
                    b1 - b0 + 1 <= max_span_buckets, F.sequence(b0, b1)
                ).otherwise(
                    F.raise_error(
                        F.lit(
                            f"interval spans more than {max_span_buckets} "
                            "buckets; raise bucket_s or split it"
                        )
                    )
                )
            ),
        )

    a = banded(left, left_start, left_end).alias("a")
    b = banded(right, right_start, right_end).alias("b")
    ls, le = F.col(f"a.{left_start}"), F.col(f"a.{left_end}")
    rs, re_ = F.col(f"b.{right_start}"), F.col(f"b.{right_end}")
    canonical = F.floor(F.greatest(ls, rs) / bucket_s).cast("long")
    joined = a.join(
        b,
        (F.col(f"a.{key_col}") == F.col(f"b.{key_col}"))
        & (F.col("a._bkt") == F.col("b._bkt"))
        & (ls <= re_)
        & (rs <= le)
        & (F.col("a._bkt") == canonical),
    )
    left_cols = [F.col(f"a.{c}") for c in left.columns]
    right_cols = [F.col(f"b.{c}") for c in right.columns if c != key_col]
    return joined.select(
        *left_cols,
        *right_cols,
        F.greatest(ls, rs).alias("overlap_start"),
        F.least(le, re_).alias("overlap_end"),
        (F.least(le, re_) - F.greatest(ls, rs)).alias("overlap_s"),
    )
