"""Stateful streaming Schmitt-trigger alerting: the streaming twin of
:func:`diive_spark.operators.hysteresis.hysteresis_episodes`.

The batch operator's only cross-row dependency is the carried trigger
state (the last definite signal), so the streaming state is tiny:
``(state, episode_no, start_s, end_s, peak, n_rows)`` — the trigger bit plus the
accumulator of the still-open episode.  Each micro-batch emits episodes
that CLOSED within it (a value dropped below ``lo``); the open episode
rides in state across batches, so an alert spanning many micro-batches is
emitted once, with its true start.  This is the alerting shape a
monitoring pipeline actually deploys: open/close transitions, not
per-row flags.

Ordering contract (same as streaming/counters.py): micro-batches arrive
per key in time order; rows within a batch are sorted in-kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "state LONG, episode_no LONG, start_s LONG, end_s LONG, "
    "peak DOUBLE, n_rows LONG"
)
OUTPUT_SCHEMA = (
    "user_id LONG, episode_no LONG, start_s LONG, end_s LONG, "
    "peak DOUBLE, n_rows LONG"
)


def _hysteresis_kernel(hi: float, lo: float):
    def fn(key, pdf_iter, state: GroupState):
        cur, ep_no, ep_start, ep_end, ep_peak, ep_n = (
            state.get if state.exists else (0, 0, None, None, None, 0)
        )
        closed: list[tuple] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts_s")
            ts = pdf["ts_s"].to_numpy(dtype="int64")
            v = pdf["value"].to_numpy(dtype="float64")
            sig = np.where(v >= hi, 1.0, np.where(v < lo, 0.0, np.nan))
            valid = ~np.isnan(sig)
            fill = np.maximum.accumulate(
                np.where(valid, np.arange(len(v)), -1)
            )
            st = np.where(fill >= 0, sig[np.maximum(fill, 0)], float(cur))
            st = st.astype(np.int64)
            prev = np.concatenate(([cur], st[:-1]))
            for i in range(len(v)):
                if st[i] == 1 and prev[i] == 0:
                    ep_no += 1
                    ep_start, ep_peak, ep_n = int(ts[i]), float(v[i]), 0
                if st[i] == 1:
                    ep_peak = v[i] if ep_peak is None else max(ep_peak, float(v[i]))
                    ep_n += 1
                    ep_end = int(ts[i])
                if st[i] == 0 and prev[i] == 1:
                    closed.append(
                        (key[0], ep_no, ep_start, ep_end, ep_peak, ep_n)
                    )
                    ep_start, ep_end, ep_peak, ep_n = None, None, None, 0
            cur = int(st[-1]) if len(st) else cur
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=[
                        "user_id", "episode_no", "start_s", "end_s",
                        "peak", "n_rows",
                    ],
                )
                closed = []
        state.update(
            (cur, ep_no,
             ep_start if ep_start is not None else 0,
             ep_end if ep_end is not None else 0,
             ep_peak if ep_peak is not None else 0.0, ep_n)
        )

    return fn


def stream_hysteresis_episodes(
    spark,
    source_dir: str,
    schema: str,
    hi: float,
    lo: float,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream source (user_id, ts TIMESTAMP, value) → closed-episode
    rows.  The per-row Python loop is bounded by micro-batch size and is
    branch-dominated (episode bookkeeping), which a numpy rewrite would
    not beat at alert-stream rates; the heavy lifting (signal classify,
    state ffill) is vectorized above it."""
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    rows = src.select(
        "user_id",
        F.unix_micros(F.col("ts")).cast("double").alias("us"),
        "value",
    ).select(
        "user_id",
        (F.col("us") / 1_000_000).cast("long").alias("ts_s"),
        "value",
    )
    return rows.groupBy("user_id").applyInPandasWithState(
        _hysteresis_kernel(hi, lo),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
