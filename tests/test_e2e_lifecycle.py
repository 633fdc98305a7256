"""End-to-end north-rule lifecycle in ONE test path:

    synth Common-Crawl-style pages (skewed url keys, nulls, spikes)
      -> incremental tier MERGE across out-of-order batches (1m + 1h)
      -> exact equality with the one-shot gated resample
      -> kill/re-apply idempotency (lineage)
      -> Gorilla + delta-of-delta block compression of a tier, LOSSLESS
         round-trip back to every (url, window, mean) point
      -> tier expiry drops old partitions, survivors untouched.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from diive_spark.compression.blocks import compress_blocks, decompress_blocks
from diive_spark.config import TierSpec
from diive_spark.operators.resample import resample_gated
from diive_spark.plans.tiers import TierEngine
from diive_spark.sources.pages import synth_pages_df

TIERS = (
    TierSpec("1m", "1 minute", 60, mincounts_perc=0.9),
    TierSpec("1h", "1 hour", 3600, mincounts_perc=0.9),
)


def test_full_lifecycle(spark, tmp_path):
    pages = synth_pages_df(
        spark, n_urls=40, n_records=2000, freq_seconds=60, zipf_hot_fraction=0.05
    ).select("url", "ts", "value")

    eng = TierEngine(spark, str(tmp_path / "tiers"), TIERS, "url", "ts", "value")

    # 3 hash-split batches, deliberately not time-ordered
    for i in range(3):
        batch = pages.filter(F.pmod(F.xxhash64("url", "ts"), 3) == i)
        eng.apply_batch(batch, batch_id=f"b{i}")

    # exactness: merged tier == one-shot gated resample over ALL data
    for tier, secs in (("1m", 60), ("1h", 3600)):
        got = (
            eng.read_tier(tier)
            .toPandas()
            .sort_values(["url", "window_end_s"])
            .reset_index(drop=True)
        )
        want = (
            resample_gated(pages, "url", "ts", "value", secs, 0.9)
            .select(
                "url",
                (F.unix_micros(F.col("window_end").cast("timestamp")) / 1_000_000)
                .cast("long")
                .alias("window_end_s"),
                "agg_mean",
                "n_vals",
            )
            .toPandas()
            .sort_values(["url", "window_end_s"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want) > 0, tier
        np.testing.assert_array_equal(got["n_vals"], want["n_vals"])
        np.testing.assert_allclose(got["agg_mean"], want["agg_mean"], rtol=1e-12)

    # idempotent resume: re-applying a recorded batch changes nothing
    before = eng.read_tier("1h").count()
    metrics = eng.apply_batch(pages.limit(10), batch_id="b1")
    assert metrics["1h"] == {"skipped": True}
    assert eng.read_tier("1h").count() == before

    # compression round trip on the 1m tier: every point survives exactly
    tier_points = eng.read_tier("1m", gated=False).select(
        "url",
        F.timestamp_seconds(F.col("window_end_s")).alias("ts"),
        F.col("agg_mean").alias("value"),
    )
    blocks = compress_blocks(tier_points, "url", "ts", "value", block_seconds=86400)
    stats = blocks.agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    ).first()
    assert stats["enc"] < stats["raw"]  # actually compresses
    decoded = decompress_blocks(blocks, key_col="url").select(
        "url",
        (F.col("ts_us") / 1_000_000).cast("long").alias("window_end_s"),
        F.col("value").alias("agg_mean"),
    )
    a = tier_points.select(
        "url",
        F.unix_micros("ts").cast("long").alias("us"),
        "value",
    ).toPandas().sort_values(["url", "us"]).reset_index(drop=True)
    b = decoded.toPandas().sort_values(["url", "window_end_s"]).reset_index(drop=True)
    assert len(a) == len(b)
    # Gorilla is lossless: bit-exact float64 round trip
    np.testing.assert_array_equal(
        a["value"].to_numpy().view("int64"), b["agg_mean"].to_numpy().view("int64")
    )

    # expiry: drop partitions older than a cutoff, survivors identical
    import datetime as dt

    days = eng.stores["1m"].partitions()
    assert len(days) >= 2
    keep_days = 1
    cutoff = (
        dt.date.fromisoformat(days[-1]) - dt.timedelta(days=keep_days)
    ).isoformat()
    dropped = eng.expire("1m", keep_days=keep_days, now_day=days[-1])
    assert dropped == [d for d in days if d < cutoff] and dropped
    left = eng.stores["1m"].partitions()
    assert left == [d for d in days if d >= cutoff]
    # lineage recorded the expiry
    manifest = eng.stores["1m"].read_manifest()
    assert manifest["expired"] and manifest["expired"][-1]["partitions"] == dropped
