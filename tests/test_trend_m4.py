"""Trend/M4/SCD2/hysteresis/CMS/temperature-resample operator tests:
kernel-vs-brute-force exactness, hand cases, sketch invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators.cms import cms_build, cms_estimate, cms_merge
from diive_spark.operators.downsample import m4_downsample
from diive_spark.operators.hysteresis import hysteresis_episodes
from diive_spark.operators.scd import scd2_versions
from diive_spark.operators.trend import mann_kendall_kernel, mann_kendall_trend
from diive_spark.text.curation import temperature_resample


# ---------------------------------------------------------------------------
# Mann-Kendall + Theil-Sen
# ---------------------------------------------------------------------------


def _mk_brute(t, v):
    """Literal O(n^2) loop over the textbook definitions."""
    n = len(v)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            s += int(np.sign(v[j] - v[i]))
            if t[j] != t[i]:
                slopes.append((v[j] - v[i]) / (t[j] - t[i]))
    _, counts = np.unique(v, return_counts=True)
    tie = int((counts * (counts - 1) * (2 * counts + 5)).sum())
    var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    slopes.sort()
    slope = slopes[(len(slopes) - 1) // 2]
    return s, var_s, slope


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mk_kernel_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    n = 60
    t = np.sort(rng.choice(np.arange(1000) * 3600.0, n, replace=False))
    # integer-ish values force tie groups
    v = np.floor(rng.normal(0, 3, n)).astype(np.float64)
    s, var_s, z, slope, icept = mann_kendall_kernel(t, v)
    bs, bvar, bslope = _mk_brute(t, v)
    assert s == bs
    assert var_s == bvar
    assert slope == bslope
    # z sign tracks S, magnitude = (|S|-1)/sqrt(var)
    if s > 0:
        assert z == (s - 1) / np.sqrt(var_s)
    elif s < 0:
        assert z == (s + 1) / np.sqrt(var_s)
    else:
        assert z == 0.0


def test_mk_detects_monotonic_trend(spark):
    t = np.arange(100, dtype=np.float64) * 3600
    rows = [(1, int(ti), 2.5 * i + 7.0) for i, ti in enumerate(t)]
    # key 2: pure noise around a constant (fixed pattern, zero drift)
    rows += [(2, int(ti), float((i * 7) % 5)) for i, ti in enumerate(t)]
    df = spark.createDataFrame(rows, "key long, ts_s long, value double")
    out = {
        r["key"]: r
        for r in mann_kendall_trend(df, "key", "ts_s", "value").collect()
    }
    up = out[1]
    assert up["s"] == 100 * 99 // 2  # every pair ascending
    assert up["z"] > 10
    assert abs(up["sen_slope"] - 2.5 / 3600) < 1e-15
    flat = out[2]
    assert abs(flat["z"]) < 1.0  # no significant trend


# ---------------------------------------------------------------------------
# M4 downsampling
# ---------------------------------------------------------------------------


def test_m4_matches_pandas_brute_force(spark):
    rng = np.random.RandomState(7)
    n = 500
    pdf = pd.DataFrame(
        {
            "key": rng.randint(0, 3, n).astype(np.int64),
            "ts_s": rng.randint(0, 40000, n).astype(np.int64),
            "value": np.round(rng.normal(0, 5, n), 2),
        }
    ).drop_duplicates(["key", "ts_s"])
    out = (
        m4_downsample(
            spark.createDataFrame(pdf), "key", "ts_s", "value", bucket_s=3600
        )
        .toPandas()
        .sort_values(["key", "bucket"])
        .reset_index(drop=True)
    )
    pdf["bucket"] = pdf["ts_s"] // 3600
    for _, r in out.iterrows():
        g = pdf[(pdf["key"] == r["key"]) & (pdf["bucket"] == r["bucket"])]
        assert r["n_in"] == len(g)
        assert r["x_first"] == g["ts_s"].min()
        assert r["y_first"] == g.loc[g["ts_s"].idxmin(), "value"]
        assert r["x_last"] == g["ts_s"].max()
        assert r["y_min"] == g["value"].min()
        assert r["y_max"] == g["value"].max()
        # tie-break: smallest x among min-y rows, largest among max-y
        assert r["x_ymin"] == g.loc[g["value"] == g["value"].min(), "ts_s"].min()
        assert r["x_ymax"] == g.loc[g["value"] == g["value"].max(), "ts_s"].max()


# ---------------------------------------------------------------------------
# SCD2 versions
# ---------------------------------------------------------------------------


def test_scd2_hand_case(spark):
    rows = [
        (1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "a"),
        (2, 10, "x"),
    ]
    df = spark.createDataFrame(rows, "key long, ts_s long, fp string")
    out = (
        scd2_versions(df, "key", "ts_s", "fp")
        .orderBy("key", "version_no")
        .collect()
    )
    got = [
        (r["key"], r["version_no"], r["valid_from"], r["valid_to"],
         r["fp"], r["n_obs"])
        for r in out
    ]
    assert got == [
        (1, 1, 10, 30, "a", 2),   # half-open: superseded at v2's start
        (1, 2, 30, 40, "b", 1),
        (1, 3, 40, None, "a", 1),  # current version stays open
        (2, 1, 10, None, "x", 1),
    ]


# ---------------------------------------------------------------------------
# Hysteresis episodes
# ---------------------------------------------------------------------------


def test_hysteresis_dead_band_does_not_chatter(spark):
    # rises to 12 (opens), chatters 9/11 inside [8,12) dead band (stays
    # open), drops to 5 (closes), spikes to 13 (new episode, open at end)
    vals = [(i * 10, v) for i, v in enumerate([1, 12, 9, 11, 9, 5, 6, 13, 12])]
    df = spark.createDataFrame(
        [(1, t, float(v)) for t, v in vals], "key long, ts_s long, value double"
    )
    out = (
        hysteresis_episodes(df, "key", "ts_s", "value", hi=12.0, lo=8.0)
        .orderBy("episode_no")
        .collect()
    )
    got = [(r["episode_no"], r["start_s"], r["end_s"], r["peak"], r["n_rows"]) for r in out]
    assert got == [(1, 10, 40, 12.0, 4), (2, 70, 80, 13.0, 2)]
    # single-threshold degenerate case: lo == hi == 12 -> plain exceedance
    out2 = (
        hysteresis_episodes(df, "key", "ts_s", "value", hi=12.0, lo=12.0)
        .orderBy("episode_no")
        .collect()
    )
    assert [(r["start_s"], r["end_s"]) for r in out2] == [(10, 10), (70, 80)]


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _cms_fixture(spark):
    rng = np.random.RandomState(3)
    rows = [
        (f"item{int(i)}", int(m) * 60 + int(rng.randint(0, 60)))
        for m, i in zip(
            rng.randint(0, 120, 4000), rng.zipf(1.5, 4000) % 50
        )
    ]
    return spark.createDataFrame(rows, "item string, ts_s long")


def test_cms_never_underestimates_and_merges_exactly(spark):
    df = _cms_fixture(spark)
    minute = cms_build(df, "item", "ts_s", bucket_s=60, depth=4, width=256)
    hour = cms_merge(minute, 60)
    direct = cms_build(df, "item", "ts_s", bucket_s=3600, depth=4, width=256)
    # linearity: merged minute sketches == sketch built at the hour grain
    assert (
        hour.exceptAll(direct).count() == 0
        and direct.exceptAll(hour).count() == 0
    )
    probes = df.select("item").distinct()
    est = cms_estimate(hour, probes, "item", depth=4, width=256).toPandas()
    truth = (
        df.groupBy("item", F.floor(F.col("ts_s") / 3600).alias("bucket"))
        .count()
        .toPandas()
    )
    m = est.merge(truth, on=["item", "bucket"], how="outer").fillna(0)
    assert (m["est"] >= m["count"]).all()  # CMS never underestimates
    # with 4x256 cells and ~35 live items/bucket most estimates are exact
    assert (m["est"] == m["count"]).mean() > 0.9


# ---------------------------------------------------------------------------
# Temperature resampling
# ---------------------------------------------------------------------------


def test_temperature_resample_rates(spark):
    rows = (
        [(i, "en") for i in range(800)]
        + [(i + 1000, "de") for i in range(200)]
        + [(i + 2000, "rw") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_resample(df, "lang", "doc_id", alpha=0.5).toPandas()
    kept = out.groupby("lang").size()
    # smallest stratum kept whole
    assert kept["rw"] == 50
    rates = out.groupby("lang")["rate_e6"].first()
    assert rates["rw"] == 1_000_000
    assert rates["en"] == int(np.floor(np.sqrt(50 / 800) * 1e6 + 0.31830988618367))
    assert rates["de"] == int(np.floor(np.sqrt(50 / 200) * 1e6 + 0.31830988618367))
    # empirical keep fraction tracks the rate (hash is uniform)
    assert abs(kept["en"] / 800 - 0.25) < 0.08
    assert abs(kept["de"] / 200 - 0.5) < 0.12


def test_cms_streaming_partials_converge(spark, tmp_path):
    """Tier-ingest pattern: per-micro-batch CMS partials appended via
    foreachBatch, cell-wise summed == one-shot batch sketch (linearity is
    what makes the sketch streamable without state)."""
    df = _cms_fixture(spark)
    src = tmp_path / "cms_stream"
    src.mkdir()
    n = df.count()
    for i in range(3):
        part = df.filter(F.pmod(F.xxhash64("item", "ts_s"), F.lit(3)) == i)
        part.coalesce(1).write.parquet(str(src / f"b{i}.parquet"))
    store = str(tmp_path / "cms_store")
    sdf = (
        spark.readStream.schema("item string, ts_s long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )

    def ingest(batch_df, batch_id):
        cms_build(batch_df, "item", "ts_s", bucket_s=3600, depth=4, width=256) \
            .write.mode("append").parquet(store)

    q = (
        sdf.writeStream.foreachBatch(ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    merged = (
        spark.read.parquet(store)
        .groupBy("bucket", "r", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(df, "item", "ts_s", bucket_s=3600, depth=4, width=256)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    assert n == df.count()


def test_trapezoid_integral_matches_numpy(spark):
    from diive_spark.operators.counters import trapezoid_integral

    rng = np.random.RandomState(11)
    ts = np.unique(rng.randint(0, 4 * 3600, 300))
    vals = np.round(rng.normal(10, 3, len(ts)), 2)
    df = spark.createDataFrame(
        [(1, int(t), float(v)) for t, v in zip(ts, vals)],
        "key long, ts_s long, value double",
    )
    out = (
        trapezoid_integral(df, ["key"], "ts_s", "value", bucket_s=3600)
        .toPandas()
        .set_index("bucket")
        .sort_index()
    )
    # numpy oracle: dense 1-second grid of the linear interpolant, summed
    # per bucket via the exact trapezoid on consecutive integer seconds
    grid = np.arange(ts.min(), ts.max() + 1)
    vg = np.interp(grid, ts, vals)
    seg_area = (vg[:-1] + vg[1:]) / 2.0  # per 1-s step
    seg_bucket = grid[:-1] // 3600
    for b in np.unique(seg_bucket):
        want = seg_area[seg_bucket == b].sum()
        np.testing.assert_allclose(out.loc[b, "integral"], want, rtol=1e-9)
    # total integral == whole-series trapezoid (bucket splits are exact)
    np.testing.assert_allclose(
        out["integral"].sum(), np.trapz(vals, ts), rtol=1e-9
    )
    # coverage: all of the span except the grid edges
    assert out["covered_s"].sum() == ts.max() - ts.min()


def test_m4_merge_equals_direct(spark):
    from diive_spark.operators.downsample import m4_merge

    rng = np.random.RandomState(13)
    n = 2000
    pdf = pd.DataFrame(
        {
            "key": rng.randint(0, 4, n).astype(np.int64),
            "ts_s": rng.randint(0, 100000, n).astype(np.int64),
            "value": np.round(rng.normal(0, 5, n), 2),
        }
    ).drop_duplicates(["key", "ts_s"])
    df = spark.createDataFrame(pdf)
    fine = m4_downsample(df, "key", "ts_s", "value", bucket_s=600)
    merged = m4_merge(fine, "key", factor=6)
    direct = m4_downsample(df, "key", "ts_s", "value", bucket_s=3600)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_binseg_recovers_planted_shifts(spark):
    from diive_spark.operators.changepoint import binseg_changepoints, binseg_kernel

    # three-level step series: clear shifts at idx 40 and 70
    v = np.concatenate([np.full(40, 100), np.full(30, 200), np.full(50, 50)])
    rng = np.random.RandomState(5)
    v = v + rng.randint(-3, 4, len(v))  # integer jitter keeps gains exact
    rows = binseg_kernel(v.astype(np.int64), depth=2, min_size=5)
    found = {node: cp for node, cp, _ in rows}
    assert found[1] in (40, 70)  # root takes one of the true shifts
    cps = sorted(cp for _, cp, _ in rows)
    assert 40 in cps and 70 in cps  # depth 2 recovers both
    # brute-force gain at the root equals the kernel's reported gain
    node1 = [r for r in rows if r[0] == 1][0]
    n = len(v)
    c = np.cumsum(v.astype(np.int64))
    t = node1[1]
    num = int(c[t - 1]) * n - t * int(c[-1])
    want = (num * num) / (n * t * (n - t))
    assert node1[2] == want
    # distributed == kernel
    df = spark.createDataFrame(
        [(1, int(i) * 3600, int(x)) for i, x in enumerate(v)],
        "key long, ts_s long, value long",
    )
    got = {
        r["node"]: (r["cp_idx"], r["gain"])
        for r in binseg_changepoints(df, "key", "ts_s", "value",
                                     depth=2, min_size=5).collect()
    }
    assert got == {node: (cp, g) for node, cp, g in rows}


def test_binseg_overflow_guard():
    from diive_spark.operators.changepoint import binseg_kernel

    huge = np.full(2000, 3_000_000, dtype=np.int64)
    huge[1000:] = 9_000_000
    with pytest.raises(ValueError, match="overflow"):
        binseg_kernel(huge, depth=1, min_size=5)


def test_downsample_tier_cascade_double_merge(spark):
    """North-rule tier cascade for the NEW mergeable aggregates: 10min
    M4 / minute CMS partials roll 10min->1h->6h (two merge hops) and
    still equal the sketch built directly at the coarse grain — so a
    retention ladder never re-reads raw data."""
    from diive_spark.operators.downsample import m4_merge
    from diive_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(
        spark, n_urls=20, n_records=3000, freq_seconds=60,
        zipf_hot_fraction=0.05,
    ).select(
        F.xxhash64("url").alias("key"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("x_us"),
        "value",
    ).filter(F.col("value").isNotNull())

    fine = m4_downsample(pages, "key", "x_us", "value", 600_000_000)
    hour = m4_merge(fine, "key", 6)
    six = m4_merge(hour, "key", 6)
    direct = m4_downsample(pages, "key", "x_us", "value", 21_600_000_000)
    assert six.exceptAll(direct).count() == 0
    assert direct.exceptAll(six).count() == 0

    ev = pages.select(
        F.col("key").cast("string").alias("item"),
        (F.col("x_us") / 1_000_000).cast("long").alias("ts_s"),
    )
    minute = cms_build(ev, "item", "ts_s", bucket_s=60, depth=4, width=128)
    hour_c = cms_merge(minute, 60)
    day_c = cms_merge(hour_c, 24)
    direct_c = cms_build(ev, "item", "ts_s", bucket_s=86400, depth=4, width=128)
    assert day_c.exceptAll(direct_c).count() == 0
    assert direct_c.exceptAll(day_c).count() == 0


def test_m4_streaming_partials_converge(spark, tmp_path):
    """foreachBatch M4 partials merged across micro-batches == one-shot
    M4 — the same stateless tier-ingest contract as the CMS test (all
    four components are associative extremes)."""
    from diive_spark.operators.downsample import m4_merge

    rng = np.random.RandomState(23)
    n = 3000
    pdf = pd.DataFrame(
        {
            "key": rng.randint(0, 5, n).astype(np.int64),
            "ts_s": rng.randint(0, 200000, n).astype(np.int64),
            "value": np.round(rng.normal(0, 5, n), 2),
        }
    ).drop_duplicates(["key", "ts_s"])
    df = spark.createDataFrame(pdf)
    src = tmp_path / "m4stream"
    src.mkdir()
    for i in range(3):
        df.filter(F.pmod(F.xxhash64("key", "ts_s"), 3) == i) \
          .coalesce(1).write.parquet(str(src / f"b{i}.parquet"))
    store = str(tmp_path / "m4store")

    def ingest(batch_df, batch_id):
        m4_downsample(batch_df, "key", "ts_s", "value", bucket_s=3600) \
            .write.mode("append").parquet(store)

    q = (
        spark.readStream.schema("key long, ts_s long, value double")
        .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*")
        .writeStream.foreachBatch(ingest).trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "m4ckpt")).start()
    )
    q.awaitTermination(180)
    merged = m4_merge(spark.read.parquet(store), "key", factor=1)
    direct = m4_downsample(df, "key", "ts_s", "value", bucket_s=3600)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
