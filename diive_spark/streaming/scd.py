"""Stateful streaming SCD2: content-version tracking at crawl-ingest time.

The streaming twin of :func:`diive_spark.operators.scd.scd2_versions` —
as recrawls arrive, each url's state carries ``(fingerprint, version_no,
valid_from, last_seen, n_obs)``; a batch emits the versions that CLOSED
in it (content changed), with ``valid_to`` = the superseding version's
start, half-open like the batch operator.  The current (open) version
rides in state, so the live corpus view is state + emitted history.

Ordering contract as streaming/counters.py: batches arrive per key in
time order; rows within a batch are sorted in-kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "fp STRING, version_no LONG, valid_from LONG, last_seen LONG, n_obs LONG"
)
OUTPUT_SCHEMA = (
    "url STRING, version_no LONG, valid_from LONG, valid_to LONG, "
    "last_seen LONG, fp STRING, n_obs LONG"
)


def _scd2_kernel():
    def fn(key, pdf_iter, state: GroupState):
        fp, ver, vfrom, vlast, n = (
            state.get if state.exists else (None, 0, None, None, 0)
        )
        closed: list[tuple] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts_s")
            for t, f in zip(pdf["ts_s"], pdf["fp"]):
                t = int(t)
                if f != fp:
                    if fp is not None:
                        # half-open: superseded at the NEW version's start
                        closed.append((key[0], ver, vfrom, t, vlast, fp, n))
                    ver += 1
                    fp, vfrom, vlast, n = f, t, t, 1
                else:
                    vlast, n = t, n + 1
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=["url", "version_no", "valid_from", "valid_to",
                             "last_seen", "fp", "n_obs"],
                )
                closed = []
        state.update((fp, ver, vfrom if vfrom is not None else 0,
                      vlast if vlast is not None else 0, n))

    return fn


def stream_scd2_versions(
    spark,
    source_dir: str,
    schema: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream source (url, ts TIMESTAMP, fp STRING) → closed-version
    rows; open versions live in state (O(1) per url)."""
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    rows = src.select(
        "url",
        (F.unix_micros(F.col("ts")) / 1_000_000).cast("long").alias("ts_s"),
        "fp",
    )
    return rows.groupBy("url").applyInPandasWithState(
        _scd2_kernel(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
