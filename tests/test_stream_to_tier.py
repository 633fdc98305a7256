"""End-to-end streaming -> tier-engine integration: micro-batches arriving
via Structured Streaming foreachBatch MERGE into the tier tables and yield
EXACTLY the tier a full batch recompute produces (the engine's partials are
associative+commutative, so arrival order is irrelevant)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from diive_spark.config import TierSpec
from diive_spark.operators.resample import resample_gated
from diive_spark.plans.tiers import TierEngine

TIERS = (TierSpec("1h", "1 hour", 3600, mincounts_perc=0.9),)


def test_stream_foreachbatch_merges_into_tier(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.repartition(4).write.parquet(str(tmp_path / "src"))

    engine = TierEngine(
        spark, str(tmp_path / "tiers"), TIERS, "user_id", "ts", "value"
    )
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )

    def sink(batch_df, batch_id):
        engine.apply_batch(batch_df, batch_id=f"stream-{batch_id}")

    q = src.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(180)

    got = (
        engine.read_tier("1h")
        .toPandas()
        .sort_values(["user_id", "window_end_s"])
        .reset_index(drop=True)
    )
    want = (
        resample_gated(ev, "user_id", "ts", "value", 3600, 0.9)
        .select(
            "user_id",
            (F.unix_micros(F.col("window_end").cast("timestamp")) / 1_000_000)
            .cast("long")
            .alias("window_end_s"),
            "agg_mean",
            "n_vals",
        )
        .toPandas()
        .sort_values(["user_id", "window_end_s"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    np.testing.assert_array_equal(got["n_vals"].values, want["n_vals"].values)
    np.testing.assert_allclose(
        got["agg_mean"].values, want["agg_mean"].values, rtol=1e-12
    )
    # lineage recorded one snapshot per micro-batch
    manifest = engine.stores["1h"].read_manifest()
    assert len(manifest["snapshots"]) >= 2
