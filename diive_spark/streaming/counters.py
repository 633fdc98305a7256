"""Stateful streaming counter rollup: reset-aware ``increase`` partials
per (key, bucket) with ``applyInPandasWithState``.

The streaming twin of :func:`diive_spark.operators.counters.
counter_increase`: the batch operator's only cross-row dependency is the
per-key previous sample (a ``lag``), so the streaming state is exactly
that — ``(last_ts, last_value)``, two numbers per key.  Each micro-batch
emits PARTIAL per-(key, bucket) rows (increase, pair-span, samples,
resets); partials are mergeable by summation, so the tier store can
combine them exactly like its minute→hour histogram partials — summing a
key's partials over any set of micro-batches reproduces the batch
operator's numbers for the covered rows (pinned in
tests/test_streaming_counters.py).

Ordering contract: micro-batches must arrive per key in time order
(file-stream sources replaying an append-only log satisfy this); rows
WITHIN a batch are sorted in-kernel.  Out-of-order arrivals across
batches would pair against a newer sample — the same contract Prometheus
places on its scrape stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_ts LONG, last_v DOUBLE"
OUTPUT_SCHEMA = (
    "user_id LONG, bucket LONG, increase DOUBLE, pair_span_s LONG, "
    "n_samples LONG, n_resets LONG"
)


def _counter_partials(bucket_s: int):
    """Build the stateful kernel for a fixed bucket width (seconds)."""

    def fn(key, pdf_iter, state: GroupState):
        last_ts, last_v = state.get if state.exists else (None, None)
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts_s")
            ts = pdf["ts_s"].to_numpy(dtype="int64")
            v = pdf["value"].to_numpy(dtype="float64")
            prev_v = np.concatenate(
                ([np.nan if last_v is None else last_v], v[:-1])
            )
            prev_t = np.concatenate(
                ([np.nan if last_ts is None else last_ts], ts[:-1].astype("float64"))
            )
            has_prev = ~np.isnan(prev_v)
            reset = has_prev & (v < prev_v)
            delta = np.where(reset, v, v - prev_v)
            delta = np.where(has_prev, delta, np.nan)
            span = np.where(has_prev, ts - prev_t, 0.0)
            bucket = ts // bucket_s
            out = (
                pd.DataFrame(
                    {
                        "bucket": bucket,
                        "increase": delta,
                        "pair_span_s": span.astype("int64"),
                        "n_samples": 1,
                        "n_resets": reset.astype("int64"),
                    }
                )
                .groupby("bucket", as_index=False)
                .agg(
                    increase=("increase", lambda s: s.sum(min_count=1)),
                    pair_span_s=("pair_span_s", "sum"),
                    n_samples=("n_samples", "sum"),
                    n_resets=("n_resets", "sum"),
                )
            )
            out.insert(0, "user_id", key[0])
            if len(ts):
                last_ts, last_v = int(ts[-1]), float(v[-1])
            yield out
        if last_ts is not None:
            state.update((last_ts, last_v))

    return fn


def stream_counter_increase(
    spark,
    source_dir: str,
    schema: str,
    bucket_s: int = 3600,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream → per-(user, bucket) counter-increase partials."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
            .cast("long")
            .alias("ts_s"),
            "value",
        )
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _counter_partials(bucket_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
