"""Stateful streaming ADWIN drift detection: the streaming twin of
:func:`diive_spark.operators.adwin.adwin_detect`.

The detector's entire cross-row dependency is the exponential bucket
histogram (O(log^2 n) rows of [capacity, count, sum, sumsq]) plus the
processed count and detection counters, carried across micro-batches
as four parallel arrays.  Each batch folds its time-sorted rows
through the SAME :func:`adwin_step` the batch kernel runs, so the
final snapshot equals the batch sweep on the concatenated series
exactly (shared code path -> structural replay equality), pinned by
tests/test_streaming_adwin.py.

Ordering contract (same as streaming/kalman.py): micro-batches arrive
per key in time order; rows within a batch are sorted in-kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from diive_spark.operators.adwin import adwin_step

STATE_SCHEMA = (
    "t LONG, ndet LONG, firstdet LONG, lastdet LONG,"
    " caps ARRAY<LONG>, cnts ARRAY<LONG>,"
    " sums ARRAY<DOUBLE>, sqs ARRAY<DOUBLE>"
)
OUTPUT_SCHEMA = (
    "event_type STRING, n LONG, n_detections LONG,"
    " first_detection LONG, last_detection LONG,"
    " final_window LONG, final_mean DOUBLE"
)


def _adwin_kernel(delta: float):
    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            t, ndet, firstdet, lastdet, caps, cnts, sums, sqs = state.get
            buckets = [
                [int(c), int(n), float(s), float(q)]
                for c, n, s, q in zip(caps, cnts, sums, sqs)
            ]
        else:
            t, ndet, firstdet, lastdet = 0, 0, 0, 0
            buckets = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["us", "event_id"])
            for v in pdf["value"].to_numpy(dtype="float64"):
                t += 1
                if adwin_step(buckets, float(v), delta):
                    ndet += 1
                    lastdet = t
                    if firstdet == 0:
                        firstdet = t
        state.update(
            (
                t,
                ndet,
                firstdet,
                lastdet,
                [int(b[0]) for b in buckets],
                [int(b[1]) for b in buckets],
                [float(b[2]) for b in buckets],
                [float(b[3]) for b in buckets],
            )
        )
        n = sum(b[1] for b in buckets)
        s = sum(b[2] for b in buckets)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n": [t],
                "n_detections": [ndet],
                "first_detection": [firstdet],
                "last_detection": [lastdet],
                "final_window": [int(n)],
                "final_mean": [s / n if n else float("nan")],
            }
        )

    return fn


def stream_adwin_drift(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    delta: float = 0.002,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream wrapper: one snapshot row per key per micro-batch;
    the last snapshot per key equals the batch detector."""
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    rows = src.select(
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        "value",
    )
    return rows.groupBy("event_type").applyInPandasWithState(
        _adwin_kernel(delta),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
