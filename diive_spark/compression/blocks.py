"""Spark block layer for Gorilla/delta-of-delta compression.

Each (series, block-window) becomes ONE row holding the compressed
timestamp and value blobs — the storage format of cold retention tiers
(SURVEY.md §4.1 item 6). Blocks are built inside grouped Arrow kernels
(``applyInPandas``) so compression state never crosses a task boundary;
block size is bounded by the block window, so executor memory per task is
bounded regardless of total series length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from diive_spark.compression.deltadelta import decode_timestamps, encode_timestamps
from diive_spark.compression.gorilla import decode_floats, encode_floats


def block_schema(key_col: str) -> StructType:
    return StructType(
        [
            StructField(key_col, StringType()),
            StructField("block_start_s", LongType()),
            StructField("n_points", LongType()),
            StructField("ts_blob", BinaryType()),
            StructField("val_blob", BinaryType()),
            StructField("raw_bytes", LongType()),
            StructField("enc_bytes", LongType()),
        ]
    )


def compress_blocks(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_col: str = "value",
    block_seconds: int = 86400,
) -> DataFrame:
    """(key, ts, value) -> one compressed block row per (key, block window)."""
    d = df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts_us"),
        F.col(value_col).cast("double").alias("__v"),
    ).withColumn(
        "__block", (F.floor(F.col("__ts_us") / (block_seconds * 1_000_000))
                    * block_seconds).cast("long")
    )

    schema = block_schema(key_col)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ts_us")
        ts = pdf["__ts_us"].to_numpy(dtype=np.int64)
        vals = pdf["__v"].to_numpy(dtype=np.float64)
        ts_blob = encode_timestamps(ts)
        val_blob = encode_floats(vals)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "block_start_s": [int(pdf["__block"].iloc[0])],
                "n_points": [len(ts)],
                "ts_blob": [ts_blob],
                "val_blob": [val_blob],
                "raw_bytes": [len(ts) * 16],
                "enc_bytes": [len(ts_blob) + len(val_blob)],
            }
        )

    return d.groupBy(key_col, "__block").applyInPandas(encode, schema)


def decompress_blocks(
    blocks: DataFrame,
    key_col: str = "url",
) -> DataFrame:
    """Inverse of :func:`compress_blocks` -> (key, ts_us, value)."""
    schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("ts_us", LongType()),
            StructField("value", DoubleType()),
        ]
    )

    def decode(batches):
        # per-BLOCK decode is independent -> mapInPandas: no shuffle at all
        # (a groupBy would force an exchange of the block rows for nothing)
        for pdf in batches:
            keys, ts_parts, v_parts = [], [], []
            for key, n, ts_blob, val_blob in zip(
                pdf[key_col], pdf["n_points"], pdf["ts_blob"], pdf["val_blob"]
            ):
                n = int(n)
                ts_parts.append(decode_timestamps(bytes(ts_blob), n))
                v_parts.append(decode_floats(bytes(val_blob), n))
                keys.append(np.full(n, key, dtype=object))
            if not keys:
                continue
            yield pd.DataFrame(
                {
                    key_col: np.concatenate(keys),
                    "ts_us": np.concatenate(ts_parts),
                    "value": np.concatenate(v_parts),
                }
            )

    return blocks.mapInPandas(decode, schema)
