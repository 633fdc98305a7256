"""Stateful streaming Kalman local-level filtering: the streaming twin
of :func:`diive_spark.operators.statekernels.kalman_local_level`.

The filter's entire cross-row dependency is the posterior (a_t, p_t)
pair plus the running innovation log-likelihood, so the carried state
is four scalars — the textbook example of a bounded-state streaming
operator.  Each micro-batch folds its (time-sorted) rows through the
same predict/update recursion the batch kernel runs and emits ONE
snapshot row per key per batch (n, level, p, loglik); the final
snapshot equals the batch kernel on the concatenated series exactly
(same IEEE operation order), pinned by
tests/test_streaming_kalman.py.

Ordering contract (same as streaming/counters.py): micro-batches
arrive per key in time order; rows within a batch are sorted
in-kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, a DOUBLE, p DOUBLE, ll DOUBLE"
OUTPUT_SCHEMA = (
    "user_id LONG, n LONG, level DOUBLE, p DOUBLE, loglik DOUBLE"
)


def _kalman_kernel(q: float, r: float):
    def fn(key, pdf_iter, state: GroupState):
        n, a, p, ll = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0)
        )
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts_s")
            y = pdf["value"].to_numpy(dtype=np.float64)
            for x in y:
                if n == 0:
                    a, p = float(x), r * 1e7
                else:
                    p = p + q
                f = p + r
                v = x - a
                if n > 0:
                    ll += -0.5 * (
                        np.log(2.0 * np.pi * f) + v * v / f
                    )
                k = p / f
                a = a + k * v
                p = p * (1.0 - k)
                n += 1
        state.update((n, a, p, ll))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "level": [a],
                "p": [p],
                "loglik": [ll],
            }
        )

    return fn


def stream_kalman_level(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    q: float = 1.0,
    r: float = 10.0,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream wrapper: one snapshot row per key per micro-batch;
    the last snapshot per key is the full-series filter state."""
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    rows = src.select(
        "user_id",
        (F.unix_micros(F.col("ts")) / 1_000_000).cast("long").alias(
            "ts_s"
        ),
        "value",
    )
    return rows.groupBy("user_id").applyInPandasWithState(
        _kalman_kernel(q, r),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
