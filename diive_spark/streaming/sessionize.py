"""Stateful streaming sessionization: the streaming twin of
:func:`diive_spark.operators.sessionize.session_stats`.

The batch operator's only cross-row dependency is the previous event
time of the same key, so the streaming state is one open session:
``(session_idx, start_s, end_s, n_events)``.  Each micro-batch emits the
sessions that CLOSED within it (a new event arrived more than
``timeout`` after the open session's end); the open session rides in
state across batches, so a session spanning many micro-batches is
emitted once, with its true start — the shape a clickstream pipeline
actually deploys (closed-session facts, not per-event session ids).

Ordering contract (same as streaming/counters.py and hysteresis.py):
micro-batches arrive per key in time order; rows within a batch are
sorted in-kernel.  Equality with the batch operator is pinned in
tests/test_streaming_sessionize.py: closed sessions over a multi-batch
replay == batch ``session_stats`` minus each key's final (still-open)
session.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "session_idx LONG, start_s LONG, end_s LONG, n_events LONG"
OUTPUT_SCHEMA = (
    "user_id LONG, session_idx LONG, start_s LONG, end_s LONG, "
    "duration_s LONG, n_events LONG"
)


def _sessionize_kernel(timeout: float):
    def fn(key, pdf_iter, state: GroupState):
        idx, start, end, n = (
            state.get if state.exists else (0, None, None, 0)
        )
        closed: list[tuple] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts_s")
            for ts in pdf["ts_s"].astype("int64"):
                ts = int(ts)
                if start is None:
                    idx, start, end, n = idx + 1, ts, ts, 1
                elif ts - end > timeout:
                    closed.append((key[0], idx, start, end, end - start, n))
                    idx, start, end, n = idx + 1, ts, ts, 1
                else:
                    end, n = ts, n + 1
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=[
                        "user_id", "session_idx", "start_s", "end_s",
                        "duration_s", "n_events",
                    ],
                )
                closed = []
        state.update(
            (idx, start if start is not None else 0,
             end if end is not None else 0, n)
        )

    return fn


def stream_sessionize(
    spark,
    source_dir: str,
    schema: str,
    timeout: float = 1800.0,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream source (user_id, ts TIMESTAMP, ...) → closed-session
    rows.  The per-row loop is bounded by micro-batch size and is pure
    state bookkeeping (two comparisons per event); the sort is
    vectorized."""
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    rows = src.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
        .cast("long").alias("ts_s"),
    )
    return rows.groupBy("user_id").applyInPandasWithState(
        _sessionize_kernel(timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
