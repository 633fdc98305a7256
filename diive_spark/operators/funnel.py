"""Ordered-step funnel analysis over an event stream.

``funnel_times`` computes, per key, the earliest timestamp of step 1,
then the earliest step-2 event at-or-after it, and so on — the standard
product-analytics conversion funnel.

Spark-first shape: each step is a partition-wide (unordered) window
aggregate over the SAME ``partitionBy(key)`` window, so the whole chain
costs exactly ONE shuffle on the key; the chained ``withColumn`` steps
become successive Window phases over the already-partitioned data, all
JVM-side.  No per-key arrays, no collects — at 10^12 events the cost is
the one hash-exchange any per-user computation pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_span: float | None = None,
) -> DataFrame:
    """Append one ``step_i_ts`` column per funnel step (null = key never
    completed that step).  ``max_span`` optionally bounds the whole
    funnel: step i counts only within ``max_span`` of step 1.
    """
    w = Window.partitionBy(key_col)
    out = df
    prev = None
    first = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
            if max_span is not None and first is not None:
                cond = cond & (
                    F.col(ts_col) <= F.col(first) + F.lit(max_span)
                )
        name = f"step{i}_ts"
        out = out.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = name
        if first is None:
            first = name
    return out


def funnel_report(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_span: float | None = None,
) -> DataFrame:
    """One row per funnel step: keys reaching it, conversion vs step 1,
    and the mean time-to-convert from step 1 (floor-scaled to ms to stay
    engine-exact)."""
    ft = funnel_times(df, key_col, ts_col, type_col, steps, max_span)
    per_key = ft.groupBy(key_col).agg(
        *[
            F.min(f"step{i}_ts").alias(f"step{i}_ts")
            for i in range(1, len(steps) + 1)
        ]
    )
    # one aggregation pass for every step's count + mean, then a stack()
    # unpivot of the single wide row — the upstream chain runs ONCE
    aggs = []
    for i in range(1, len(steps) + 1):
        aggs.append(F.count(f"step{i}_ts").cast("long").alias(f"n{i}"))
        aggs.append(
            F.floor(
                F.avg(F.col(f"step{i}_ts") - F.col("step1_ts")) * 1000
                + F.lit(0.5)
            ).cast("long").alias(f"ms{i}")
        )
    wide = per_key.agg(*aggs)
    stack_args = []
    for i, step in enumerate(steps, start=1):
        stack_args += [
            F.lit(i).cast("long"), F.lit(step),
            F.col(f"n{i}"), F.col(f"ms{i}"),
        ]
    return wide.select(
        F.stack(
            F.lit(len(steps)), *stack_args
        ).alias("step_idx", "step", "n_keys", "mean_s_from_start_ms")
    )
