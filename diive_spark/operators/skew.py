"""Key-skew diagnosis: the measurement that picks ``salt_buckets``.

The north rule's skew story (hot urls salted into sub-keys,
``resample_gated(salt_buckets=N)``) needs a NUMBER — this module
computes it from the data instead of folklore.  One map-side-combinable
aggregation over the key column; the report is #heavy-keys rows plus a
one-row summary, never the key table itself.

``recommended_salt_buckets`` is the classic sizing rule: enough salt
that the hottest key's largest shard fits a target task size, capped so
the two-phase merge stays cheap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
    target_rows_per_task: int = 5_000_000,
) -> dict:
    """Returns {total_rows, n_keys, max_key_rows, mean_key_rows,
    skew_ratio, recommended_salt_buckets, heavy_keys: [(key, n), ...]}.

    Two tiny jobs: one grouped count folded to a 1-row summary +
    one top-N (TakeOrderedAndProject).  At 10^12 rows both are
    map-side-combined before the single exchange on the key."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    summary = counts.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("mx"),
        F.avg("n").alias("mean"),
    ).collect()[0]
    heavy = [
        (r[key_col], r["n"])
        for r in counts.orderBy(F.desc("n"), key_col).take(top_n)
    ]
    total = int(summary["total"] or 0)
    mx = int(summary["mx"] or 0)
    mean = float(summary["mean"] or 0.0)
    return {
        "total_rows": total,
        "n_keys": int(summary["n_keys"] or 0),
        "max_key_rows": mx,
        "mean_key_rows": mean,
        "skew_ratio": (mx / mean) if mean else 0.0,
        "recommended_salt_buckets": recommended_salt_buckets(
            mx, target_rows_per_task
        ),
        "heavy_keys": heavy,
    }


def recommended_salt_buckets(
    max_key_rows: int, target_rows_per_task: int = 5_000_000,
    cap: int = 256,
) -> int:
    """1 = no salting needed; otherwise the smallest bucket count that
    brings the hottest key under the target task size, capped."""
    if max_key_rows <= target_rows_per_task:
        return 1
    return min(cap, math.ceil(max_key_rows / target_rows_per_task))
