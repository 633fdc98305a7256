"""Streaming sessionization == batch session_stats (minus each key's
final still-open session) over a 3-batch time-ordered replay."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from diive_spark.operators.sessionize import session_stats
from diive_spark.streaming.sessionize import stream_sessionize

TIMEOUT = 1800.0


def test_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # 3 time-ordered micro-batches (the per-key ordering contract)
    bounds = ev.agg(
        F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.33)").alias("b1"),
        F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.66)").alias("b2"),
    ).collect()[0]
    src = str(tmp_path / "src")
    ev.filter(us <= bounds["b1"]).coalesce(1).write.mode("append").parquet(src)
    ev.filter((us > bounds["b1"]) & (us <= bounds["b2"])).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.filter(us > bounds["b2"]).coalesce(1).write.mode("append").parquet(src)

    sdf = stream_sessionize(spark, src, ev.schema, timeout=TIMEOUT)
    q = (
        sdf.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_idx"]): (
            r["start_s"], r["end_s"], r["duration_s"], r["n_events"]
        )
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }

    batch_rows = session_stats(
        ev.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.floor(us / 1_000_000).cast("long").alias("ts_s"),
        ),
        "user_id",
        "ts_s",
        TIMEOUT,
    )
    w = Window.partitionBy("user_id")
    closed_batch = batch_rows.withColumn(
        "_last", F.max("session_idx").over(w)
    ).filter(F.col("session_idx") < F.col("_last"))
    want = {
        (r["user_id"], r["session_idx"]): (
            r["session_start"], r["session_end"], r["duration"], r["n_events"]
        )
        for r in closed_batch.collect()
    }
    assert len(want) > 0
    assert got == want
