"""Distributed global ordering: row_number / NTILE over a total order
WITHOUT the single-partition window.

``Window.orderBy(...)`` with no partition key moves every row to ONE
task — the classic global-sort trap (fine at thousands of rows, fatal at
10^12).  The scale formulation used here is the one Spark's own
``sortWithinPartitions`` + zipWithIndex folklore implements:

  1. ``repartitionByRange`` on the order columns (range exchange driven
     by a sampled boundary sketch — same machinery as a global sort),
  2. per-partition counts: ONE tiny aggregate (``spark_partition_id``
     groupBy), collected to the driver — #partitions rows, the same
     order as a broadcast threshold list,
  3. rank = partition offset + intra-partition ``row_number`` over a
     window PARTITIONED by the physical partition id (bounded state).

The result is bit-identical to the single-partition ``row_number`` for
any total (tie-free) ordering, which the tests pin; ``ntile_from_rank``
reproduces SQL NTILE's quota arithmetic exactly (first ``total % k``
buckets one row larger).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
    attach_total: str | None = None,
) -> DataFrame:
    """Append a 1-based global row number under the TOTAL order given by
    ``order_cols`` (must be tie-free for a deterministic result —
    include a unique id as the last key).  ``attach_total`` optionally
    adds the total row count as a literal column — it is already known
    from the offsets job, so NTILE-style quota math downstream costs no
    extra scan."""
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    from pyspark import StorageLevel

    ranged = (
        df.repartitionByRange(int(parts), *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # PERSIST is load-bearing (sf0.1 sweep found duplicates+gaps):
        # without it the counts job and the ranking job each execute the
        # range exchange independently, and AQE coalescing / boundary
        # sampling may produce DIFFERENT physical layouts — offsets keyed
        # by the first run's partition ids then misalign with the second
        # run's rows.  Materializing once pins a single layout that both
        # jobs read (the standard sortWithinPartitions+zipWithIndex
        # construction; disk-spilling level for the 100 TB shape).
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # one tiny job: per-partition row counts -> cumulative offsets
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = ranged.withColumn(
        out_col, (off_col + F.row_number().over(w)).cast("long")
    ).drop("_pid")
    if attach_total:
        out = out.withColumn(attach_total, F.lit(acc).cast("long"))
    return out


def ntile_from_rank(
    rank_col: Column, total: int | Column, k: int
) -> Column:
    """SQL NTILE(k) from a 1-based global rank: quota arithmetic, the
    first ``total % k`` buckets hold ``total // k + 1`` rows.  ``total``
    may be a literal or a column (e.g. the ``attach_total`` output)."""
    t = F.lit(total) if isinstance(total, int) else total
    q = F.floor(t / F.lit(k))
    r = t - q * F.lit(k)
    big = r * (q + 1)
    return F.when(
        rank_col <= big,
        F.floor((rank_col - 1) / (q + 1)) + 1,
    ).otherwise(
        r + F.floor((rank_col - 1 - big) / F.greatest(q, F.lit(1))) + 1
    ).cast("long")


def value_offset_row_number(
    df: DataFrame,
    value_col: str,
    tie_cols: list[Column],
    descending: bool = True,
    out_col: str = "rn",
    attach_total: str | None = None,
) -> DataFrame:
    """Global row_number for orderings whose FIRST key has low
    cardinality (e.g. a score rounded to 2 decimals): exact and cheaper
    than :func:`global_row_number` because it needs NO range-sampling
    job and NO per-partition-count collect.

    1. per-value counts: one map-side-combinable groupBy on
       ``value_col`` — the result has one row per DISTINCT value;
    2. cumulative offsets over the tiny counts table (the unpartitioned
       window runs over #distinct-values rows, not data rows);
    3. broadcast null-safe join back + ``row_number`` over a window
       PARTITIONED by the value (parallel, bounded per-group state);
       rank = offset + intra-value row number.

    Bit-identical to ``Window.orderBy(value desc_nulls_last, *ties)``
    row_number for any tie-free (value, *ties) ordering; nulls sort
    LAST like ``desc_nulls_last``/``asc_nulls_last``.  Use
    :func:`global_row_number` instead when the leading key is
    high-cardinality (the counts table would approach the data size).
    """
    order_first = (
        F.desc_nulls_last(value_col) if descending
        else F.asc_nulls_last(value_col)
    )
    cnt = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy(order_first).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = cnt.select(
        F.col(value_col).alias("_v"),
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_n").over(w_tot).alias("_total"),
    )
    joined = df.join(
        F.broadcast(offs), F.col(value_col).eqNullSafe(F.col("_v"))
    )
    w_in = Window.partitionBy(value_col).orderBy(*tie_cols)
    out = joined.withColumn(
        out_col, (F.col("_off") + F.row_number().over(w_in)).cast("long")
    )
    if attach_total:
        out = out.withColumn(attach_total, F.col("_total").cast("long"))
    return out.drop("_v", "_off", "_total")
