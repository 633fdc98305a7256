"""M4: tier engine — incremental merge == full recompute, idempotent resume,
expiry."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from diive_spark.config import TierSpec
from diive_spark.operators.resample import resample_gated
from diive_spark.plans.tiers import TierEngine
from diive_spark.sources.pages import pages_to_series_pdf, synth_pages_pdf

TIERS = (
    TierSpec("30m", "30 minutes", 1800, mincounts_perc=0.9),
    TierSpec("1h", "1 hour", 3600, mincounts_perc=0.9),
    TierSpec("1d", "1 day", 86400, mincounts_perc=0.9),
)


@pytest.fixture(scope="module")
def series_sdf(spark):
    pdf = pages_to_series_pdf(synth_pages_pdf(n_urls=10, n_records=300, freq_seconds=600))
    return spark.createDataFrame(pdf)


def gated_pdf(df):
    return (
        df.toPandas()
        .sort_values(["url", "window_end_s"])
        .reset_index(drop=True)
    )


def test_incremental_equals_full(spark, series_sdf, tmp_path):
    # full recompute via the one-shot operator
    import pyspark.sql.functions as F

    full = resample_gated(
        series_sdf, "url", "ts", "value", 3600, 0.9, source_freq_seconds=600
    ).select(
        "url",
        (F.unix_micros(F.col("window_end").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("us"),
        "agg_mean",
        "agg_sum",
        "n_vals",
    )
    want = full.toPandas().sort_values(["url", "us"]).reset_index(drop=True)

    # incremental: 3 arbitrary batches (split by hash — out of time order)
    eng = TierEngine(
        spark, str(tmp_path / "tiers"), TIERS, "url", "ts", "value",
        source_freq_seconds=600,
    )
    for i in range(3):
        batch = series_sdf.filter(F.pmod(F.xxhash64("url", "ts"), 3) == i)
        eng.apply_batch(batch, batch_id=f"b{i}")
    got = gated_pdf(eng.read_tier("1h"))
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["n_vals"].values, want["n_vals"].values)
    np.testing.assert_allclose(got["agg_mean"].values, want["agg_mean"].values, rtol=1e-12)
    np.testing.assert_array_equal(got["window_end_s"].values, want["us"].values)


def test_idempotent_reapply(spark, series_sdf, tmp_path):
    eng = TierEngine(
        spark, str(tmp_path / "t2"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    m1 = eng.apply_batch(series_sdf, batch_id="same")
    before = gated_pdf(eng.read_tier("30m"))
    m2 = eng.apply_batch(series_sdf, batch_id="same")  # must be a no-op
    after = gated_pdf(eng.read_tier("30m"))
    assert m2["30m"] == {"skipped": True}
    pd.testing.assert_frame_equal(before, after)
    assert m1["30m"]["rows"] == len(
        eng.stores["30m"].read(spark).toPandas()
    )


def test_lineage_manifest(spark, series_sdf, tmp_path):
    eng = TierEngine(
        spark, str(tmp_path / "t3"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    eng.apply_batch(series_sdf, batch_id="x1")
    man = eng.stores["30m"].read_manifest()
    assert [s["batch_id"] for s in man["snapshots"]] == ["x1"]
    snap = man["snapshots"][0]
    assert snap["rows"] > 0 and len(snap["partition_rows"]) > 0
    # per-partition metrics sum to total rows
    assert sum(snap["partition_rows"].values()) == snap["rows"]


def test_expiry(spark, series_sdf, tmp_path):
    eng = TierEngine(
        spark, str(tmp_path / "t4"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    eng.apply_batch(series_sdf, batch_id="x1")
    parts = eng.stores["30m"].partitions()
    assert len(parts) >= 2
    last_day = parts[-1]
    dropped = eng.expire("30m", keep_days=1, now_day=last_day)
    assert set(eng.stores["30m"].partitions()) == set(parts) - set(dropped)
    assert len(eng.stores["30m"].partitions()) <= 2
    man = eng.stores["30m"].read_manifest()
    assert man["expired"][0]["partitions"] == dropped
