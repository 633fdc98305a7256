"""File sources & sinks (SURVEY §2.1 S1-S8).

Re-expresses diive's filetype-configured CSV ingestion on the Spark
reader:

* **S1/S2 DataFileReader/ReadFileType**
  (/root/reference/diive/core/io/filereader.py:331-536, 276-328):
  multi-row header (row 0 = variable names, row 1 = units), NA sentinel
  list, numeric coercion (strings -> null, mirroring
  ``pd.to_numeric(errors='coerce')``, filereader.py:465-474), timestamp
  parse.  The filetype config is a plain dict (the YAML descriptors in
  diive/configs/filetypes/ collapse to reader options here).

* **S3 MultiDataFileReader** (filereader.py:215-273): many files of one
  filetype, outer-merged on timestamp with first-non-null-wins
  (``combine_first``) — here a union + dedup window ordered by file
  priority: one shuffle, no pairwise join cascade.

* **S8 FileSplitter** (/root/reference/diive/core/io/filesplitter.py):
  re-export in bounded-size chunks -> ``maxRecordsPerFile`` on a
  range-partitioned write (each output file covers a contiguous time
  range, like the reference's sequential chunks).

All paths stay declarative: the CSV scan, the sentinel cleanup and the
coercion are Catalyst expressions (column pruning + predicate pushdown
reach the scan).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# diive/configs/filetypes/DIIVE-CSV-30MIN.yml DATA.NA_VALUES
DEFAULT_NA_VALUES = [
    "-9999", "-6999", "-999", "nan", "NaN", "NAN", "NA", "inf", "-inf", "-",
]


def read_filetype_csv(
    spark: SparkSession,
    path: str,
    ts_col: str,
    ts_format: str | None = None,
    units_row: bool = True,
    na_values: list[str] | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Read a diive-style CSV: names header + optional units row, NA
    sentinels, numeric coercion of every value column.

    Returns ``(ts timestamp, <value_cols> double...)``; non-numeric
    strings in value columns become null exactly like
    ``pd.to_numeric(errors='coerce')``.
    """
    na = na_values if na_values is not None else DEFAULT_NA_VALUES
    raw = spark.read.csv(path, header=True, inferSchema=False)
    # units_row: row 1 holds units — dropped below by keeping only rows
    # whose ts parses (the units row never parses as a timestamp;
    # filereader.py:378-381 folds it into a MultiIndex instead)
    cols = value_cols or [c for c in raw.columns if c != ts_col]

    def clean(c: str):
        v = F.when(F.col(c).isin(na), F.lit(None)).otherwise(F.col(c))
        return v.cast("double").alias(c)

    ts = (
        F.to_timestamp(F.col(ts_col), ts_format)
        if ts_format
        else F.to_timestamp(F.col(ts_col))
    )
    out = raw.select(ts.alias("ts"), *[clean(c) for c in cols])
    if units_row:
        out = out.filter(F.col("ts").isNotNull())
    return out


def read_multifile_csv(
    spark: SparkSession,
    paths: list[str],
    ts_col: str,
    ts_format: str | None = None,
    **kwargs,
) -> DataFrame:
    """S3: union all files (earlier path = higher priority) and keep, per
    timestamp, the first non-null value PER COLUMN — exact pandas
    ``combine_first`` cell semantics (filereader.py:271-272): when the
    higher-priority file has a null cell at an overlapping timestamp, the
    lower-priority file's value for that column fills it.

    One groupBy(ts) with a ``min(struct(_prio, v))`` per column — the
    ``when(isNotNull)`` guard makes min skip null cells, and struct
    ordering picks the lowest surviving priority.  Map-side combinable
    (partial min per input split), ONE shuffle, linear in file count —
    vs the reference's N-1 sequential pandas outer joins."""
    parts = []
    for prio, p in enumerate(paths):
        parts.append(
            read_filetype_csv(spark, p, ts_col, ts_format, **kwargs).withColumn(
                "_prio", F.lit(prio)
            )
        )
    unioned = parts[0]
    for df in parts[1:]:
        unioned = unioned.unionByName(df)
    value_cols = [c for c in unioned.columns if c not in ("ts", "_prio")]
    aggs = [
        F.min(
            F.when(
                F.col(c).isNotNull(),
                F.struct(F.col("_prio").alias("p"), F.col(c).alias("v")),
            )
        )["v"].alias(c)
        for c in value_cols
    ]
    return unioned.groupBy("ts").agg(*aggs)


def write_split(
    df: DataFrame,
    path: str,
    order_col: str = "ts",
    max_records_per_file: int = 10_000,
    n_range_partitions: int | None = None,
    fmt: str = "parquet",
) -> None:
    """S8 FileSplitter: bounded-size output files covering contiguous
    ``order_col`` ranges.  ``repartitionByRange`` keeps each file a
    contiguous chunk (like the reference's sequential row slices);
    ``maxRecordsPerFile`` enforces the chunk size inside each task."""
    n = n_range_partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, order_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .format(fmt)
        .save(path)
    )


def save_parquet_with_meta(
    df: DataFrame, path: str, freq_seconds: int, convention: str = "end"
) -> None:
    """S5 save_parquet: parquet sink plus a sidecar carrying the grid
    frequency + timestamp convention, so a re-load does NOT need to
    re-detect frequency (the reference re-runs TimestampSanitizer on
    every parquet load because pandas freq metadata is lost,
    /root/reference/diive/core/io/files.py:45-64)."""
    df.write.mode("overwrite").parquet(path)
    meta = {"freq_seconds": freq_seconds, "timestamp_convention": convention}
    (Path(path) / "_diive_meta.json").write_text(json.dumps(meta))


def load_parquet_with_meta(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """S5 load_parquet: data + the sidecar metadata dict."""
    df = spark.read.parquet(path)
    meta_path = Path(path) / "_diive_meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return df, meta
