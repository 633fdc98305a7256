"""Z-order (Morton) curve indexing for multi-dimensional data layout.

Public technique: Morton 1966; the layout optimization behind Delta
OPTIMIZE ZORDER BY and Iceberg's sort-order z-ordering.  Interleaving
the bits of (key-hash, time-bucket) gives a 1-D sort key under which
rows close in BOTH dimensions land in the same parquet row groups, so a
query filtering on either dimension prunes most files — the right
physical layout for a (url, warc_ts) hypertable serving both per-url
history scans and global time-window scans.

Pure bit arithmetic (the classic magic-number bit-spread), expressible
identically in Spark SQL and DuckDB — fully oracle-checkable.

Scale shape: a per-row expression (whole-stage codegen, zero shuffle);
the layout job itself is ``df.repartitionByRange(z).sortWithinPartitions
(z)`` + write, i.e. one range exchange — the same cost as any global
sort-write, paid once at compaction time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["spread_bits_sql", "z_value_sql", "z_value", "zorder_layout"]


def spread_bits_sql(expr: str) -> str:
    """SQL: spread the low 16 bits of ``expr`` onto even bit positions
    (0, 2, 4, ... 30).  Identical text works in Spark SQL and DuckDB."""
    v = f"({expr} & 65535)"
    v = f"(({v} | ({v} << 8)) & 16711935)"      # 0x00FF00FF
    v = f"(({v} | ({v} << 4)) & 252645135)"     # 0x0F0F0F0F
    v = f"(({v} | ({v} << 2)) & 858993459)"     # 0x33333333
    v = f"(({v} | ({v} << 1)) & 1431655765)"    # 0x55555555
    return v


def z_value_sql(x_expr: str, y_expr: str) -> str:
    """SQL: 32-bit Morton code interleaving two 16-bit dimensions
    (x on even bits, y on odd)."""
    return (
        f"({spread_bits_sql(x_expr)} | "
        f"({spread_bits_sql(y_expr)} << 1))"
    )


def z_value(x: str, y: str) -> Column:
    """Morton code Column from two SQL expression STRINGS (strings keep
    the Spark and DuckDB texts identical by construction)."""
    return F.expr(z_value_sql(x, y))


def zorder_layout(
    df: DataFrame,
    x: str,
    y: str,
    n_files: int = 32,
    z_col: str = "z",
) -> DataFrame:
    """Assign the Morton sort key and range-cluster rows into
    ``n_files`` write buckets — the compaction-time layout pass.  The
    returned frame is sorted so a parquet write yields files whose
    (x, y) bounding boxes are tight in both dimensions."""
    out = df.withColumn(z_col, z_value(x, y))
    return out.repartitionByRange(n_files, F.col(z_col)).sortWithinPartitions(
        z_col
    )
