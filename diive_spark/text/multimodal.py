"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is stubbed: ``decode_image_stub`` produces a deterministic fake
"decoded" feature vector from the bytes (so the whole pipeline — schema,
batching, partitioning, UDF signature — is real and testable), and raises
``NotImplementedError`` when ``strict=True`` to mark where a real codec
plugs in.

Scale shape: ``mapInPandas`` streams Arrow record batches; peak executor
memory is one batch (spark.sql.execution.arrow.maxRecordsPerBatch), not one
partition — the right contract for 100 KB..10 MB media blobs. Binary
payloads should live in their own parquet column chunk so metadata-only
queries never read them (columnar pruning: select the metadata columns and
the scan's ReadSchema drops the blob).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("feature", ArrayType(DoubleType())),  # decoded features
    ]
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 8 byte-histogram moments.
    Replace with PIL/librosa decode + model features in production."""
    if len(payload) == 0:
        return np.zeros(FEATURE_DIM)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks])


def decode_media(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
    strict: bool = False,
) -> DataFrame:
    """Decode/feature-extract binary media via mapInPandas (Arrow batches).

    ``strict=True`` raises NotImplementedError — the marker that a real
    codec library must be installed for production decode.
    """
    if strict:
        raise NotImplementedError(
            "real media decode requires PIL/librosa/ffmpeg — not in this "
            "container; wire them into _fake_decode's slot"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": pdf[type_col].astype(str),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: _fake_decode(bytes(b)).tolist()
                    ),
                }
            )

    return df.mapInPandas(batches, MEDIA_META_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(
            F.concat(F.lit("MEDIA"), F.repeat(F.concat(F.lit("x"), F.col("id").cast("string")), 50)),
            "UTF-8",
        ).alias("payload"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload_resized", BinaryType()),
        StructField("n_bytes_resized", LongType()),
    ]
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Resize stub over mapInPandas: real Spark plumbing (binary in/out,
    Arrow batches, metadata columns), deterministic fake resample of the
    byte stream standing in for a PIL ``Image.resize``.

    ``strict=True`` raises NotImplementedError — production needs PIL."""
    if strict:
        raise NotImplementedError("real image resize requires PIL")

    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def _resize(b) -> bytes:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr) == 0:
                    return bytes(target)
                # nearest-neighbour byte resample — deterministic stand-in
                idx = np.linspace(0, len(arr) - 1, target).astype(np.int64)
                return arr[idx].tobytes()

            out = pdf[payload_col].map(_resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload_resized": out,
                    "n_bytes_resized": out.map(len).astype("int64"),
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 32,
    every_n: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling stub (1 video row -> N frame rows) over mapInPandas:
    demonstrates the fan-out batch shape a real ffmpeg frame extractor
    uses — the output batch is LONGER than the input batch, which
    mapInPandas supports natively (applyInPandas would too, but no
    grouping is needed: each video is independent).

    Fake decode: the payload is cut into fixed-size "frames"; every
    ``every_n``-th frame is emitted. ``strict=True`` raises for production."""
    if strict:
        raise NotImplementedError("real frame sampling requires ffmpeg")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                n_frames = max(len(raw) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(int(mid))
                    idxs.append(fi)
                    frames.append(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return df.mapInPandas(batches, FRAMES_SCHEMA)
