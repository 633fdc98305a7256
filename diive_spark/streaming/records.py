"""Stateful streaming record-high alerting: the streaming twin of
``queries_stats2.q_running_records``.

The batch operator's only cross-row dependency is the running maximum,
so the carried state is three scalars: ``(cur_max, n_obs, n_records)``.
Each micro-batch emits one row per NEW record high (value strictly above
everything seen before, first observation included) with its running
record number — the alert stream a monitoring deployment consumes.
Replay over time-split files converges to the batch window exactly
(pinned in tests/test_streaming_records.py).

Ordering contract (same as streaming/counters.py): micro-batches arrive
per key in time order; rows within a batch are sorted in-kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "cur_max DOUBLE, n_obs LONG, n_records LONG"
OUTPUT_SCHEMA = "user_id LONG, t LONG, v DOUBLE, record_no LONG"


def _records_kernel():
    def fn(key, pdf_iter, state: GroupState):
        cur_max, n_obs, n_rec = (
            state.get if state.exists else (None, 0, 0)
        )
        for pdf in pdf_iter:
            pdf = pdf.sort_values("t")
            t = pdf["t"].to_numpy(dtype="int64")
            v = pdf["v"].to_numpy(dtype="float64")
            out = []
            for i in range(len(v)):
                if cur_max is None or v[i] > cur_max:
                    cur_max = float(v[i])
                    n_rec += 1
                    out.append((key[0], int(t[i]), float(v[i]), n_rec))
            n_obs += len(v)
            if out:
                yield pd.DataFrame(
                    out, columns=["user_id", "t", "v", "record_no"]
                )
        state.update(
            (cur_max if cur_max is not None else -np.inf, n_obs, n_rec)
        )

    return fn


def stream_record_highs(
    spark,
    source_dir: str,
    schema: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream source ``(user_id, t, v)`` → record-high alert rows."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _records_kernel(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
