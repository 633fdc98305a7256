"""Counter/gauge rollup primitives for the retention-tier engine:
PromQL-style reset-aware counter ``increase``/``rate`` and a
TimescaleDB-style time-weighted average (LOCF weighting).

These are the two rollup semantics the reference's plain mean/sum tiers
(SURVEY §2.3 A1/A2, /root/reference/diive/core/times/resampling.py:13-132)
cannot express but that any metrics-grade tier store needs: monotone
counters that wrap on process restart (Prometheus ``rate()``/
``increase()`` semantics: a decrease is a reset, the post-reset sample
counts from zero), and irregularly-sampled gauges whose bucket mean must
weight each observation by how long it was current, not once per sample
(TimescaleDB ``time_weight('LOCF')``).

Scale notes
-----------
Both operators are ONE window pass per key (lag/lead over
``(key, ts)``) followed by a map-side-combinable groupBy on
``(key, bucket)`` — two exchanges total, both on the natural key, no
Python in the hot path.  The per-key window holds only O(1) state
(previous/next row), so a 10^9-sample key streams through the sort
without materializing; with the tier store's (day, key) write hashing
the sort is usually already satisfied by the scan order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def counter_increase(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket: Column,
) -> DataFrame:
    """Per-(key, bucket) reset-aware counter ``increase`` and ``rate``.

    For consecutive samples ``prev -> curr`` of one key (ordered by
    ``ts_col``), the contribution is ``curr - prev`` when the counter is
    monotone and ``curr`` when it decreased (reset-to-zero assumption —
    Prometheus ``extrapolatedRate``'s reset rule, without the range
    extrapolation).  Each pair is attributed to the CURRENT sample's
    bucket, so bucket results add up exactly to the whole-series
    increase.  ``rate`` divides by the observed in-bucket pair span.

    Output: key cols + ``bucket`` + ``increase``, ``rate_per_s``,
    ``n_samples``, ``n_resets``.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    # a key's FIRST sample contributes nothing (no pair yet) — delta and
    # the reset flag must be explicit about the null-prev case so that a
    # bucket holding only that sample aggregates identically to SQL
    delta = (
        F.when(prev_v.isNull(), F.lit(None).cast("double"))
        .when(F.col(value_col) >= prev_v, F.col(value_col) - prev_v)
        .otherwise(F.col(value_col))
    )
    reset = (
        F.when(prev_v.isNull(), F.lit(0))
        .when(F.col(value_col) < prev_v, F.lit(1))
        .otherwise(F.lit(0))
    )
    paired = df.select(
        *key_cols,
        bucket.alias("bucket"),
        F.col(ts_col).alias("_t"),
        prev_t.alias("_pt"),
        delta.alias("_d"),
        reset.alias("_reset"),
    )
    return paired.groupBy(*key_cols, "bucket").agg(
        F.round(F.sum("_d"), 4).alias("increase"),
        F.round(
            F.sum("_d")
            / F.nullif(
                F.sum(
                    F.when(F.col("_pt").isNotNull(), F.col("_t") - F.col("_pt"))
                ).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("rate_per_s"),
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum("_reset").cast("long").alias("n_resets"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket: Column,
) -> DataFrame:
    """Per-(key, bucket) time-weighted average with LOCF weighting.

    Each in-bucket observation is weighted by the time until the NEXT
    in-bucket observation (the interval during which it was the current
    value); the bucket's last observation gets weight 0.  Buckets with a
    single sample (or all samples at one instant) fall back to the plain
    mean, matching ``timescaledb_toolkit.time_weight('LOCF')`` at
    interior buckets.

    Output: key cols + ``bucket`` + ``twa``, ``plain_mean``,
    ``n_samples``.
    """
    w = Window.partitionBy(*key_cols, "bucket").orderBy(ts_col)
    b = df.select(*key_cols, bucket.alias("bucket"), ts_col, value_col)
    b = b.withColumn(
        "_w", (F.lead(ts_col).over(w) - F.col(ts_col)).cast("double")
    )
    agg = b.groupBy(*key_cols, "bucket").agg(
        F.sum(F.col(value_col) * F.col("_w")).alias("_wsum"),
        F.sum("_w").alias("_wtot"),
        F.avg(value_col).alias("_mean"),
        F.count(F.lit(1)).cast("long").alias("n_samples"),
    )
    return agg.select(
        *key_cols,
        "bucket",
        F.round(
            F.when(
                F.col("_wtot") > 0, F.col("_wsum") / F.col("_wtot")
            ).otherwise(F.col("_mean")),
            4,
        ).alias("twa"),
        F.round("_mean", 4).alias("plain_mean"),
        "n_samples",
    )


def ewma_truncated(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    decay: float = 0.75,
    k: int = 16,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average truncated at the last ``k``
    rows: ``Σ_j decay^j · y_{t-j} / Σ_j decay^j`` over the lags present
    (pandas ``ewm(adjust=True)`` restricted to a k-row window — the
    truncation is what makes the recursion SQL-expressible and therefore
    oracle-checkable; with decay 0.75 the dropped tail weight is
    0.75^16 ≈ 1%).

    All ``k`` lags share one window spec, so Spark evaluates them in a
    SINGLE WindowExec pass with O(1) state — no self-join, no k-pass
    scan.  Weights are powers of a binary-exact decay (default 3/4)
    precomputed as literals, so engines agree bit-for-bit and no runtime
    ``pow`` is involved.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(k):
        wt = decay**j  # python float: exact for decay with short mantissa
        lagged = F.col(value_col) if j == 0 else F.lag(value_col, j).over(w)
        num = num + F.coalesce(lagged * F.lit(wt), F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return df.withColumn(out_col, F.round(num / den, 4))


def acf(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    max_lag: int,
) -> DataFrame:
    """Sample autocorrelation of a regular series at lags ``1..max_lag``
    per key: Pearson correlation of ``y_t`` with ``y_{t-k}`` over the
    aligned pairs (the "staggered-series" ACF variant — each lag
    normalizes by its own pair mean/std, so it is exactly ``corr`` and
    thus engine-portable, unlike the fixed-global-mean textbook form).

    One window pass builds all ``max_lag`` lag columns in a single
    WindowExec (same window spec), then a stack + groupBy computes every
    lag's correlation in one shuffle-free aggregate per key.

    Output: key cols + ``lag``, ``acf``, ``n_pairs``.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    cols = [F.lag(value_col, k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)]
    b = df.select(*key_cols, F.col(value_col).alias("_y"), *cols)
    pairs = b.select(
        *key_cols,
        "_y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col(f"_l{k}").alias("prev"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("p"),
    ).select(*key_cols, "_y", "p.lag", "p.prev")
    return (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy(*key_cols, "lag")
        .agg(
            F.round(F.corr("_y", "prev"), 4).alias("acf"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )


def trapezoid_integral(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_s: int = 3600,
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Per-(key, bucket) integral and time-weighted average of the LINEAR
    interpolant — ``timescaledb_toolkit.time_weight('linear')`` next to
    :func:`time_weighted_avg`'s LOCF variant.

    Each consecutive sample pair (t0,v0)→(t1,v1) is one line segment; a
    segment crossing bucket edges is SPLIT exactly, the boundary values
    interpolated, so every bucket integrates precisely the part of the
    line inside it (∫ = (v(a)+v(b))/2·(b−a) per piece — exact for a
    linear integrand).  Requires unique (key, ts) rows (pre-aggregate
    collisions); zero-length segments are dropped.

    Plan shape: one lag window on the key partitioning, a bounded
    bucket-explode per segment (guarded like the interval join — a
    month-long gap cannot flood the shuffle), one combinable groupBy.
    Output: key cols + bucket + ``integral`` (value·seconds), ``covered_s``
    (seconds of the bucket actually spanned by data), ``twa_linear``
    (integral / covered_s).
    """
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(ts_col)
    seg = (
        df.select(*key_cols, ts_col, value_col)
        .withColumn("_t1", F.lead(ts_col).over(w))
        .withColumn("_v1", F.lead(value_col).over(w))
        .filter(F.col("_t1") > F.col(ts_col))
    )
    t0, v0 = F.col(ts_col), F.col(value_col)
    t1, v1 = F.col("_t1"), F.col("_v1")
    b0 = F.floor(t0 / bucket_s).cast("long")
    b1 = F.floor(t1 / bucket_s).cast("long")
    # a segment's right endpoint landing exactly ON a bucket edge
    # contributes nothing to that bucket — clamp to avoid an empty piece
    b1c = F.when((t1 - b1 * bucket_s) == 0, b1 - 1).otherwise(b1)
    seg = seg.withColumn(
        "bucket",
        F.explode(
            F.when(
                b1c - b0 + 1 <= max_span_buckets, F.sequence(b0, b1c)
            ).otherwise(
                F.raise_error(
                    F.lit(
                        f"segment spans more than {max_span_buckets} "
                        "buckets; raise bucket_s or split the series"
                    )
                )
            )
        ),
    )
    slope = (v1 - v0) / (t1 - t0).cast("double")
    a = F.greatest(t0, F.col("bucket") * bucket_s).cast("double")
    b = F.least(t1, (F.col("bucket") + 1) * bucket_s).cast("double")
    va = v0 + (a - t0) * slope
    vb = v0 + (b - t0) * slope
    piece = seg.select(
        *key_cols,
        "bucket",
        ((va + vb) / 2 * (b - a)).alias("_area"),
        (b - a).alias("_len"),
    )
    out = piece.groupBy(*key_cols, "bucket").agg(
        F.sum("_area").alias("integral"),
        F.sum("_len").alias("covered_s"),
    )
    return out.withColumn(
        "twa_linear", F.col("integral") / F.col("covered_s")
    )
