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


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """session_window stream == batch sessionize once the watermark has
    passed every event (availableNow drains the whole input)."""
    from diive_spark.operators.sessionize import session_stats
    from diive_spark.streaming.rollup import run_to_memory, stream_sessionize

    rows = []
    base = 1_700_000_000
    # user 1: 3 events in one session, then a 2h gap, then 2 more
    for off in (0, 600, 1200, 9000, 9600):
        rows.append((1, base + off, 1.0))
    # user 2: single event
    rows.append((2, base + 42, 1.0))
    # watermark-advancing sentinel: append mode only emits a session once
    # the watermark passes its (exclusive) end = last event + gap; this
    # far-future event pushes the final watermark beyond every real
    # session (its own open session stays in state, which is the point)
    rows.append((99, base + 50_000, 1.0))
    src = spark.createDataFrame(
        rows, "user_id long, ts_s long, value double"
    ).withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")
    src.repartition(2).write.parquet(str(tmp_path / "sess_src"))

    stream = stream_sessionize(
        spark,
        str(tmp_path / "sess_src"),
        "user_id long, value double, ts timestamp",
        timeout_seconds=1800,
    )
    run_to_memory(stream, "sessions_stream")
    got = {
        (r.user_id, r.last_event_s, r.n_events)
        for r in spark.table("sessions_stream").collect()
        if r.user_id != 99
    }

    batch = session_stats(
        src.filter(F.col("user_id") != 99).select(
            "user_id",
            (F.unix_micros("ts") / 1_000_000).cast("long").alias("ts_s"),
        ),
        "user_id", "ts_s", 1800,
    )
    want = {
        (r.user_id, r.session_end, r.n_events) for r in batch.collect()
    }
    assert got == want and len(got) == 3
