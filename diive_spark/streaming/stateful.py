"""Custom stateful streaming operator (SURVEY §2.12 target mapping):
incremental per-series z-score flagging with ``applyInPandasWithState``.

The batch z-score flag (/root/reference/diive/pkgs/outlierdetection/
zscore.py:140-204 via funcs.py:37-41, population σ) needs the whole
series' mean/σ.  Streaming can't see the whole series, so the stateful
re-expression keeps Welford running moments per key — (count, mean, M2) —
in state and flags each incoming micro-batch against the moments
*including* that batch.  As the stream converges the flag approaches the
batch flag; state is O(3 doubles) per key, so a billion keys fit in
executor state stores.

This is the canonical ``applyInPandasWithState`` shape: grouped stream,
GroupStateTimeout.NoTimeout, one state row per key, Arrow-batched pandas
compute — no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, mean DOUBLE, m2 DOUBLE"
OUTPUT_SCHEMA = (
    "user_id LONG, ts_s LONG, value DOUBLE, zscore DOUBLE, flag_zscore INT"
)


def _welford_merge(n0: int, mean0: float, m20: float, vals: pd.Series):
    """Merge a batch into Welford running moments (population σ when
    finalized as sqrt(m2/n) — ddof=0, matching funcs.py:37-41)."""
    n1 = int(vals.count())
    if n1 == 0:
        return n0, mean0, m20
    mean1 = float(vals.mean())
    m21 = float(((vals - mean1) ** 2).sum())
    n = n0 + n1
    delta = mean1 - mean0
    mean = mean0 + delta * n1 / n
    m2 = m20 + m21 + delta * delta * n0 * n1 / n
    return n, mean, m2


def flag_zscore_stateful(key, pdf_iter, state: GroupState):
    """applyInPandasWithState function: update moments, emit flags."""
    if state.exists:
        n, mean, m2 = state.get
    else:
        n, mean, m2 = 0, 0.0, 0.0
    for pdf in pdf_iter:
        vals = pdf["value"]
        n, mean, m2 = _welford_merge(n, mean, m2, vals.dropna())
        sd = (m2 / n) ** 0.5 if n > 0 else float("nan")
        z = ((vals - mean) / sd).abs() if sd and sd > 0 else vals * float("nan")
        out = pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "ts_s": pdf["ts_s"],
                "value": vals,
                "zscore": z,
                "flag_zscore": ((z > 4.0) & vals.notna()).astype("int32") * 2,
            }
        )
        yield out
    state.update((n, mean, m2))


def stream_zscore_flags(
    spark,
    source_dir: str,
    schema: str,
) -> DataFrame:
    """Streaming per-key z-score flags over a file stream (threshold 4.0,
    the reference default, funcs.py:37-41 + zscore.py:140; wrap
    :func:`flag_zscore_stateful` in a closure to parameterize)."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(source_dir)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"),
            "value",
        )
        .withColumn("ts_s", (F.col("__us") / 1_000_000).cast("long"))
        .drop("__us")
    )
    return src.groupBy("user_id").applyInPandasWithState(
        flag_zscore_stateful,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
