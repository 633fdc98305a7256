"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow batches via ``mapInPandas``.

Decode is REAL for the formats a pure-stdlib codec can express (see
``text/codecs.py``): PNG (zlib inflate + scanline unfiltering), BMP
(BI_RGB), WAV (PCM) — plus an uncompressed concatenated-BMP "raw
video" container for frame sampling.  Compressed codecs that require
external libraries (JPEG, H.264, MP3...) are sniffed as ``unknown``:
``strict=False`` falls back to a deterministic byte-moment feature so
the pipeline shape still runs; ``strict=True`` raises — the marker
where PIL/ffmpeg plug in in production.

Scale shape: ``mapInPandas`` streams Arrow record batches; peak executor
memory is one batch (spark.sql.execution.arrow.maxRecordsPerBatch), not
one partition — the right contract for 100 KB..10 MB media blobs. Binary
payloads should live in their own parquet column chunk so metadata-only
queries never read them (columnar pruning: select the metadata columns
and the scan's ReadSchema drops the blob).
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

from diive_spark.text import codecs

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),  # png | bmp | wav | unknown
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("width", LongType()),  # images: pixels; audio: -1
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("sample_rate", LongType()),  # audio; -1 for images
        StructField("n_samples", LongType()),
        StructField("feature", ArrayType(DoubleType())),  # decoded features
    ]
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fallback for unknown formats: 8 byte-histogram
    moments (production: plug PIL/ffmpeg here)."""
    if len(payload) == 0:
        return np.zeros(FEATURE_DIM)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks])


def _decode_one(payload: bytes, strict: bool) -> dict:
    fmt = codecs.sniff(payload)
    meta = {
        "format": fmt, "width": -1, "height": -1, "channels": -1,
        "sample_rate": -1, "n_samples": -1,
    }
    if fmt in ("png", "bmp"):
        img = codecs.decode_png(payload) if fmt == "png" else codecs.decode_bmp(payload)
        h, w, ch = img.shape
        v = img.astype(np.float64)
        meta.update(width=w, height=h, channels=ch)
        meta["feature"] = [
            1.0, float(h), float(w), float(ch),
            v.mean(), v.std(), v.min(), v.max(),
        ]
    elif fmt == "wav":
        rate, s = codecs.decode_wav(payload)
        meta.update(channels=s.shape[1], sample_rate=rate, n_samples=s.shape[0])
        meta["feature"] = [
            2.0, float(s.shape[0]), float(rate), float(s.shape[1]),
            s.mean(), float(np.sqrt((s**2).mean())), s.min(), s.max(),
        ]
    else:
        if strict:
            raise NotImplementedError(
                "no pure-stdlib codec for this payload (JPEG/H.264/MP3 need "
                "PIL/ffmpeg) — decode_media(strict=False) uses the byte-moment "
                "fallback"
            )
        meta["feature"] = _fake_decode(payload).tolist()
    return meta


def decode_media(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
    strict: bool = False,
) -> DataFrame:
    """Decode/feature-extract binary media via mapInPandas (Arrow batches).

    PNG/BMP/WAV decode for real (text/codecs.py); unknown formats use the
    deterministic byte-moment fallback, or raise with ``strict=True``.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            recs = []
            for mid, mtype, b in zip(pdf[id_col], pdf[type_col], pdf[payload_col]):
                raw = bytes(b)
                meta = _decode_one(raw, strict)
                recs.append(
                    {
                        "media_id": int(mid),
                        "media_type": str(mtype),
                        "n_bytes": len(raw),
                        "content_hash": hashlib.md5(raw).hexdigest(),
                        **meta,
                    }
                )
            yield pd.DataFrame(recs, columns=[f.name for f in MEDIA_META_SCHEMA])

    return df.mapInPandas(batches, MEDIA_META_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL media table, synthesized distributively:
    id % 3 == 0 -> PNG image, 1 -> WAV audio, 2 -> concatenated-BMP "raw
    video" (3 frames).  Payload content derives from the id alone."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, types, payloads = [], [], []
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.default_rng(mid)
                kind = mid % 3
                if kind == 0:
                    img = rng.integers(0, 256, (8 + mid % 5, 10, 3), dtype=np.uint8)
                    ids.append(mid); types.append("image")
                    payloads.append(codecs.encode_png(img))
                elif kind == 1:
                    s = np.sin(np.arange(400) * (0.02 + 0.001 * mid))[:, None]
                    ids.append(mid); types.append("audio")
                    payloads.append(codecs.encode_wav(s, 16000))
                else:
                    frames = [
                        codecs.encode_bmp(
                            rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
                        )
                        for _ in range(3)
                    ]
                    ids.append(mid); types.append("video")
                    payloads.append(b"".join(frames))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": types, "payload": payloads}
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    # right-size the fixture: spark.range defaults to defaultParallelism
    # partitions, and the downstream decode/resize chains inherit it — 3
    # chained Python stages x 32 tasks of 2 rows each is pure per-task
    # overhead.  ~8 rows per partition keeps the chain parallel without
    # the task storm.
    n_parts = max(2, min(32, n // 8))
    return spark.range(n, numPartitions=n_parts).mapInPandas(gen, schema)


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
    """Image resize over mapInPandas: PNG/BMP payloads are REALLY decoded,
    nearest-neighbour resized in numpy, and re-encoded as PNG.  Unknown
    formats fall back to a deterministic byte resample (``strict=True``
    raises — production needs PIL for compressed formats)."""
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _resize(b) -> bytes:
            raw = bytes(b)
            fmt = codecs.sniff(raw)
            if fmt in ("png", "bmp"):
                img = (
                    codecs.decode_png(raw) if fmt == "png" else codecs.decode_bmp(raw)
                )
                return codecs.encode_png(codecs.resize_nearest(img, width, height))
            if strict:
                raise NotImplementedError("compressed-format resize requires PIL")
            arr = np.frombuffer(raw, dtype=np.uint8)
            if len(arr) == 0:
                return bytes(target)
            idx = np.linspace(0, len(arr) - 1, target).astype(np.int64)
            return arr[idx].tobytes()

        for pdf in it:
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


def _split_bmp_stream(raw: bytes) -> list[bytes]:
    """Split a concatenated-BMP raw-video container on the BMP size field."""
    frames, pos = [], 0
    import struct

    while pos + 6 <= len(raw) and raw[pos : pos + 2] == b"BM":
        (size,) = struct.unpack("<I", raw[pos + 2 : pos + 6])
        frames.append(raw[pos : pos + size])
        pos += size
    return frames


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 32,
    every_n: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Frame sampling (1 video row -> N frame rows) over mapInPandas —
    the output batch is LONGER than the input batch, which mapInPandas
    supports natively.

    REAL for the concatenated-BMP raw-video container (frames split on
    the BMP header size field, every ``every_n``-th emitted); compressed
    containers fall back to fixed-size byte chunks (``strict=True``
    raises — production needs ffmpeg)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                parts = _split_bmp_stream(raw)
                if not parts:
                    if strict:
                        raise NotImplementedError(
                            "compressed video containers require ffmpeg"
                        )
                    n_frames = max(len(raw) // frame_bytes, 1)
                    parts = [
                        raw[fi * frame_bytes : (fi + 1) * frame_bytes]
                        for fi in range(n_frames)
                    ]
                for fi in range(0, len(parts), every_n):
                    ids.append(int(mid))
                    idxs.append(fi)
                    frames.append(parts[fi])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return df.mapInPandas(batches, FRAMES_SCHEMA)
