"""LTTB downsampling invariants + hand case; HLL distinct-tier rollup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from diive_spark.operators.lttb import lttb_downsample, lttb_kernel


def test_lttb_hand_case():
    # 5 points -> 3: first + best-triangle interior + last.
    # x = 0..4, y spike at index 2; for the single interior bucket the
    # largest triangle with a=(0,0) and next=last point is the spike.
    x = np.array([0.0, 1, 2, 3, 4])
    y = np.array([0.0, 1, 10, 1, 0])
    idx = lttb_kernel(x, y, 3)
    assert idx.tolist() == [0, 2, 4]


def test_lttb_invariants():
    rng = np.random.RandomState(3)
    x = np.sort(rng.uniform(0, 1000, 500))
    y = rng.normal(0, 1, 500)
    spike_at = 250
    y[spike_at] = 100.0  # extreme point
    idx = lttb_kernel(x, y, 40)
    assert len(idx) == 40
    assert idx[0] == 0 and idx[-1] == 499
    assert np.all(np.diff(idx) > 0)  # strictly increasing selection
    assert spike_at in idx  # the spike survives downsampling


def test_lttb_passthrough_when_small():
    x = np.arange(10.0)
    y = np.arange(10.0)
    assert lttb_kernel(x, y, 20).tolist() == list(range(10))


def test_lttb_downsample_distributed(spark):
    rng = np.random.RandomState(5)
    rows = []
    for k in (1, 2, 3):
        for i in range(300):
            rows.append((k, i * 60, float(rng.normal())))
    df = spark.createDataFrame(rows, "key long, ts_s long, value double")
    out = lttb_downsample(df, key_col="key", n_out=25)
    got = out.toPandas().sort_values(["key", "ts_s"])
    assert (got.groupby("key").size() == 25).all()
    # kernel == distributed: per key, the selected xs match the local run
    src = {
        k: np.array([r[1] for r in rows if r[0] == k], dtype=float)
        for k in (1, 2, 3)
    }
    vals = {
        k: np.array([r[2] for r in rows if r[0] == k]) for k in (1, 2, 3)
    }
    for k in (1, 2, 3):
        idx = lttb_kernel(src[k], vals[k], 25)
        want = src[k][idx].astype(int).tolist()
        assert got[got["key"] == k]["ts_s"].tolist() == want
    # selected points carry ORIGINAL values (no interpolation)
    pairs = {(r[0], r[1]): r[2] for r in rows}
    for _, r in got.iterrows():
        assert pairs[(r["key"], r["ts_s"])] == pytest.approx(r["value"])


def test_hll_tier_distinct(spark, sf_dir):
    """Minute-tier HLL sketches union into hour-tier estimates that (a)
    match a direct hour-level sketch exactly and (b) sit within 2% of the
    exact distinct count — the mergeability contract continuous
    aggregates need (re-aggregating raw data per tier is what sketches
    avoid at 10^12 rows)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 60_000_000)
         ).alias("m"),
        "user_id",
    )
    minute = ev.groupBy("m").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    hour = (
        minute.withColumn("h", F.floor(F.col("m") / 60))
        .groupBy("h")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
    )
    direct = ev.withColumn("h", F.floor(F.col("m") / 60)).groupBy("h").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("d_est"),
        F.count_distinct("user_id").alias("exact"),
    )
    j = hour.join(direct, "h").collect()
    assert len(j) > 0
    for r in j:
        assert r["est"] == r["d_est"]  # union of partials == direct sketch
        assert abs(r["est"] - r["exact"]) <= max(1, 0.02 * r["exact"])
