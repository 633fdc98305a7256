"""Allan variance over irregular event streams.

Allan (two-sample) variance is the standard stability metric for a
sampled signal at averaging time tau (Allan 1966; IEEE 1139):

    AVAR(tau) = 0.5 * E[ (ybar_{i+1} - ybar_i)^2 ]

where ``ybar_i`` is the signal mean over the i-th CONSECUTIVE tau-sized
bucket.  Unlike ordinary variance it separates white noise (slope -1 on
a log-log AVAR/tau plot) from random-walk drift (slope +1), which is
exactly the diagnostic a tier-rollup store needs to pick retention
resolutions per signal.

Relationship to the reference: diive's sstats/variance ladder
(``core/dfun/stats.py``) stops at plain aggregate variance; Allan
variance is the multi-resolution extension that the tier engine's
bucketed layout makes nearly free — one pass per tau, all taus in one
DAG via an exploded tau dimension.

Scale posture: one ``groupBy(key, tau, bucket)`` combinable aggregate
(map-side partial sums), then a per-(key, tau) window ordered by bucket
index — state per window task is one row per OCCUPIED bucket, bounded
by span/tau, not by event count.  No partition-less window anywhere.

Exactness: bucket sums are carried as scaled BIGINTs (``scale``-units),
so the bucket means ``tot/cnt`` are bit-identical across engines; only
the final mean over adjacent-pair squared diffs sums doubles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def allan_variance(
    df: DataFrame,
    key_col: str,
    ts_s_col: str,
    value_col: str,
    taus_s: Sequence[int],
    scale: int = 100,
) -> DataFrame:
    """Per-key Allan variance at each averaging time in ``taus_s``.

    ``ts_s_col`` must be epoch seconds (integral).  Only ADJACENT
    occupied buckets form pairs (gaps in the stream contribute no
    pair, per the non-overlapped estimator on gapped data).

    Returns ``(key, tau_s, n_pairs, avar)`` with ``avar`` in squared
    value units (double).
    """
    tau_dim = F.explode(
        F.array(*[F.lit(int(t)) for t in taus_s])
    ).alias("tau_s")
    scaled = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_s_col).cast("long").alias("_t"),
        F.floor(F.col(value_col) * scale + F.lit(0.5))
        .cast("long")
        .alias("_vi"),
        tau_dim,
    )
    buckets = (
        scaled.withColumn("_b", F.floor(F.col("_t") / F.col("tau_s")))
        .groupBy("key", "tau_s", "_b")
        .agg(
            F.sum("_vi").alias("_tot"),
            F.count(F.lit(1)).alias("_cnt"),
        )
        .withColumn(
            "_mean", F.col("_tot").cast("double") / F.col("_cnt") / scale
        )
    )
    w = Window.partitionBy("key", "tau_s").orderBy("_b")
    pairs = (
        buckets.withColumn("_nb", F.lead("_b").over(w))
        .withColumn("_nm", F.lead("_mean").over(w))
        .filter(F.col("_nb") == F.col("_b") + 1)
        .withColumn("_d", F.col("_nm") - F.col("_mean"))
    )
    return pairs.groupBy(F.col("key"), F.col("tau_s")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.sum(F.col("_d") * F.col("_d")) / (2.0 * F.count(F.lit(1)))).alias(
            "avar"
        ),
    )
