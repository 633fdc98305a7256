"""Sessionization, funnel, and histogram-quantile-tier operators:
hand-case exactness + tier-mergeability contracts (the oracle-SQL twins
cover engine-vs-DuckDB parity; these pin the semantics themselves)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from diive_spark.operators.funnel import funnel_report, funnel_times
from diive_spark.operators.sessionize import session_stats, sessionize
from diive_spark.operators.tierquantile import (
    hist_tier,
    merge_tier,
    tier_quantiles,
)


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts_s long, event_type string"
    )


def test_sessionize_hand_case(spark):
    rows = [
        # user 1: two sessions split by a 2000 s gap; tie at t=100
        (1, 100, "view"), (1, 100, "click"), (1, 500, "view"),
        (1, 2500, "click"),
        # user 2: one event = one session
        (2, 50, "view"),
    ]
    out = (
        sessionize(_events_df(spark, rows), "user_id", "ts_s", 1800)
        .orderBy("user_id", "ts_s", "event_type")
        .collect()
    )
    got = [(r.user_id, r.ts_s, r.session_idx) for r in out]
    assert got == [
        (1, 100, 1), (1, 100, 1), (1, 500, 1), (1, 2500, 2),
        (2, 50, 1),
    ]


def test_session_stats(spark):
    rows = [
        (1, 0, "view"), (1, 60, "click"), (1, 10_000, "click"),
    ]
    out = session_stats(
        _events_df(spark, rows), "user_id", "ts_s", 1800,
        extra_aggs=[
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("n_clicks")
        ],
    ).orderBy("session_idx").collect()
    assert [(r.session_idx, r.session_start, r.session_end, r.duration,
             r.n_events, r.n_clicks) for r in out] == [
        (1, 0, 60, 60, 2, 1),
        (2, 10_000, 10_000, 0, 1, 1),
    ]


def test_funnel_order_matters(spark):
    rows = [
        # user 1 converts in order: view@10 click@20 purchase@30
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2 clicked BEFORE viewing; its later click counts
        (2, 5, "click"), (2, 10, "view"), (2, 40, "click"),
        # user 3 purchased before clicking -> never completes step 3
        (3, 10, "view"), (3, 15, "purchase"), (3, 20, "click"),
    ]
    steps = ["view", "click", "purchase"]
    ft = (
        funnel_times(_events_df(spark, rows), "user_id", "ts_s",
                     "event_type", steps)
        .groupBy("user_id")
        .agg(*[F.min(f"step{i}_ts").alias(f"s{i}") for i in (1, 2, 3)])
        .orderBy("user_id")
        .collect()
    )
    assert [(r.s1, r.s2, r.s3) for r in ft] == [
        (10, 20, 30),
        (10, 40, None),   # the pre-view click at t=5 must not count
        (10, 20, None),   # the pre-click purchase must not count
    ]
    rep = funnel_report(
        _events_df(spark, rows), "user_id", "ts_s", "event_type", steps
    ).orderBy("step_idx").collect()
    assert [(r.step_idx, r.step, r.n_keys) for r in rep] == [
        (1, "view", 3), (2, "click", 3), (3, "purchase", 1),
    ]
    # mean time-to-step2 from step1: (10 + 30 + 10) / 3 s -> ms
    assert rep[1].mean_s_from_start_ms == int(50 / 3 * 1000 + 0.5)


def test_funnel_max_span(spark):
    rows = [(1, 0, "view"), (1, 5000, "click")]
    ft = funnel_times(
        _events_df(spark, rows), "user_id", "ts_s", "event_type",
        ["view", "click"], max_span=1000,
    ).groupBy("user_id").agg(F.min("step2_ts").alias("s2")).collect()
    assert ft[0].s2 is None


def _hist_quantile_oracle(values, qs, gmin, gmax, bins):
    """Brute-force the same sketch definition in numpy."""
    v = np.asarray(values, dtype=float)
    b = np.clip(
        np.floor((v - gmin) / (gmax - gmin) * bins), 0, bins - 1
    ).astype(int)
    counts = np.bincount(b, minlength=bins)
    cum = np.cumsum(counts)
    out = []
    for q in qs:
        target = int(np.ceil(q * len(v)))
        qbin = int(np.argmax(cum >= target))
        out.append(gmin + (qbin + 1) * (gmax - gmin) / bins)
    return out


def test_tier_quantiles_match_numpy_and_merge(spark):
    rng = np.random.RandomState(7)
    # 3 hours x 60 minutes x ~20 points
    rows = []
    for h in range(3):
        for m in range(60):
            for v in rng.uniform(0, 500, 20):
                rows.append((h * 60 + m, float(v)))
    df = spark.createDataFrame(rows, "m long, value double")
    fine = hist_tier(df, F.col("m"), "value", 0.0, 500.0, 128)
    hour = merge_tier(fine, lambda b: F.floor(b / 60).cast("long"))
    got = {
        r.bucket: (r.n_points, r.p50, r.p95, r.p99)
        for r in tier_quantiles(
            hour, [0.5, 0.95, 0.99], 0.0, 500.0, 128
        ).collect()
    }
    by_hour = {}
    for m, v in rows:
        by_hour.setdefault(m // 60, []).append(v)
    for h, vals in by_hour.items():
        exp = _hist_quantile_oracle(vals, [0.5, 0.95, 0.99], 0.0, 500.0, 128)
        assert got[h][0] == len(vals)
        assert list(got[h][1:]) == exp  # bit-exact, no tolerance
    # mergeability: the hour tier built from minute partials must equal
    # the hour tier built directly from raw points
    direct = hist_tier(
        df, F.floor(F.col("m") / 60).cast("long"), "value", 0.0, 500.0, 128
    )
    merged_rows = {(r.bucket, r.bin): r.n for r in hour.collect()}
    direct_rows = {(r.bucket, r.bin): r.n for r in direct.collect()}
    assert merged_rows == direct_rows
    # error bound: estimate within one bin width of the true percentile
    width = 500.0 / 128
    for h, vals in by_hour.items():
        true_p50 = np.percentile(vals, 50)
        assert abs(got[h][1] - true_p50) <= width


def test_hist_tier_clips_out_of_range(spark):
    df = spark.createDataFrame(
        [(0, -5.0), (0, 9999.0)], "m long, value double"
    )
    fine = hist_tier(df, F.col("m"), "value", 0.0, 500.0, 128)
    bins = sorted(r.bin for r in fine.collect())
    assert bins == [0, 127]


def test_skew_report(spark):
    from diive_spark.operators.skew import (
        recommended_salt_buckets,
        skew_report,
    )

    rows = [("hot", i) for i in range(900)] + [
        (f"k{j}", j) for j in range(100)
    ]
    df = spark.createDataFrame(rows, "url string, x long")
    rep = skew_report(df, "url", top_n=3, target_rows_per_task=100)
    assert rep["total_rows"] == 1000 and rep["n_keys"] == 101
    assert rep["max_key_rows"] == 900
    assert rep["heavy_keys"][0] == ("hot", 900)
    assert rep["recommended_salt_buckets"] == 9
    assert rep["skew_ratio"] > 80
    assert recommended_salt_buckets(50, 100) == 1
    assert recommended_salt_buckets(10**12, 5_000_000) == 256  # capped
