"""Streaming counter-increase partials == batch counter_increase when
summed per (key, bucket), across multi-batch replay with carried state."""

from __future__ import annotations

from pyspark.sql import functions as F

from diive_spark.operators.counters import counter_increase
from diive_spark.streaming.counters import stream_counter_increase


def test_stream_counter_partials_match_batch(spark, sf_dir, tmp_path):
    # unique (user, second) samples, split into 3 time-ordered files so
    # state carries last samples across micro-batches
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
            .cast("long").alias("ts_s"),
            "event_id", "value",
        )
        .groupBy("user_id", "ts_s")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    t0, t1 = ev.agg(F.min("ts_s"), F.max("ts_s")).first()
    cut1, cut2 = t0 + (t1 - t0) // 3, t0 + 2 * (t1 - t0) // 3
    src = tmp_path / "cstream"
    src.mkdir()
    for i, cond in enumerate([
        F.col("ts_s") < cut1,
        (F.col("ts_s") >= cut1) & (F.col("ts_s") < cut2),
        F.col("ts_s") >= cut2,
    ]):
        part = ev.filter(cond).select(
            "user_id",
            F.timestamp_seconds("ts_s").alias("ts"),
            "value",
        )
        part.coalesce(1).write.parquet(str(src / f"b{i}.parquet"))

    schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"
    sdf = stream_counter_increase(
        spark, str(src) + "/*", schema, bucket_s=3600, max_files_per_trigger=1
    )
    q = (
        sdf.writeStream.format("memory").queryName("cpart")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    merged = (
        spark.sql("SELECT * FROM cpart")
        .groupBy("user_id", "bucket")
        .agg(
            F.round(F.sum("increase"), 4).alias("increase"),
            F.sum("pair_span_s").alias("span"),
            F.sum("n_samples").alias("n_samples"),
            F.sum("n_resets").alias("n_resets"),
        )
    )
    batch = counter_increase(
        ev.withColumnRenamed("value", "v"),
        key_cols=["user_id"], ts_col="ts_s", value_col="v",
        bucket=F.floor(F.col("ts_s") / 3600).cast("long"),
    )
    j = merged.alias("s").join(
        batch.alias("b"), ["user_id", "bucket"], "full"
    )
    n = j.count()
    assert n == batch.count()  # same (key, bucket) set
    bad = j.filter(
        (
            F.coalesce(F.col("s.increase"), F.lit(-1e18))
            != F.coalesce(F.col("b.increase"), F.lit(-1e18))
        )
        | (F.col("s.n_samples") != F.col("b.n_samples"))
        | (F.col("s.n_resets") != F.col("b.n_resets"))
    ).count()
    assert bad == 0


def test_stream_hysteresis_episodes_match_batch(spark, tmp_path):
    """Closed episodes emitted across a 3-micro-batch replay == the batch
    operator's episodes; a low sentinel appended per key in the last
    batch forces every episode to close so the comparison is total."""
    import numpy as np

    from diive_spark.operators.hysteresis import hysteresis_episodes
    from diive_spark.streaming.hysteresis import stream_hysteresis_episodes

    rng = np.random.RandomState(9)
    rows = []
    for key in range(6):
        v = 100.0
        for i in range(120):
            v += rng.randint(-20, 22)
            rows.append((key, i * 60, float(v)))
    # sentinel far below lo at the very end of each key
    rows += [(key, 120 * 60, -1e9) for key in range(6)]
    df = spark.createDataFrame(rows, "user_id long, ts_s long, value double")
    batch = {
        (r["user_id"], r["start_s"]): (r["end_s"], r["peak"], r["n_rows"])
        for r in hysteresis_episodes(
            df, "user_id", "ts_s", "value", hi=150.0, lo=60.0
        ).collect()
    }

    src = tmp_path / "hstream"
    src.mkdir()
    from pyspark.sql import functions as F

    for i, cond in enumerate(
        [F.col("ts_s") < 2400, (F.col("ts_s") >= 2400) & (F.col("ts_s") < 4800),
         F.col("ts_s") >= 4800]
    ):
        df.filter(cond).select(
            "user_id", F.timestamp_seconds("ts_s").alias("ts"), "value"
        ).coalesce(1).write.parquet(str(src / f"b{i}.parquet"))

    sdf = stream_hysteresis_episodes(
        spark, str(src) + "/*", "user_id LONG, ts TIMESTAMP, value DOUBLE",
        hi=150.0, lo=60.0,
    )
    q = (
        sdf.writeStream.format("memory").queryName("hyst")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["start_s"]): (r["end_s"], r["peak"], r["n_rows"])
        for r in spark.sql("SELECT * FROM hyst").collect()
    }
    assert got == batch


def test_stream_scd2_versions_match_batch(spark, tmp_path):
    """Closed versions across a 3-batch replay == the batch SCD2 operator;
    a unique sentinel fingerprint at each url's end closes every version
    so the comparison is total."""
    import numpy as np

    from diive_spark.operators.scd import scd2_versions
    from diive_spark.streaming.scd import stream_scd2_versions

    rng = np.random.RandomState(21)
    rows = []
    for u in range(8):
        t = 0
        for i in range(40):
            t += int(rng.randint(60, 600))
            rows.append((f"u{u}", t, f"c{rng.randint(0, 4)}"))
        rows.append((f"u{u}", t + 600, "__END__"))
    df = spark.createDataFrame(rows, "url string, ts_s long, fp string")
    batch = {
        (r["url"], r["version_no"]): (
            r["valid_from"], r["valid_to"], r["_last_seen"], r["fp"], r["n_obs"]
        )
        for r in scd2_versions(df, "url", "ts_s", "fp").collect()
        if r["fp"] != "__END__"
    }

    src = tmp_path / "scdstream"
    src.mkdir()
    from pyspark.sql import functions as F

    t1, t2 = 4000, 9000
    for i, cond in enumerate(
        [F.col("ts_s") < t1, (F.col("ts_s") >= t1) & (F.col("ts_s") < t2),
         F.col("ts_s") >= t2]
    ):
        df.filter(cond).select(
            "url", F.timestamp_seconds("ts_s").alias("ts"), "fp"
        ).coalesce(1).write.parquet(str(src / f"b{i}.parquet"))

    sdf = stream_scd2_versions(
        spark, str(src) + "/*", "url STRING, ts TIMESTAMP, fp STRING"
    )
    q = (
        sdf.writeStream.format("memory").queryName("scdv")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["url"], r["version_no"]): (
            r["valid_from"], r["valid_to"], r["last_seen"], r["fp"], r["n_obs"]
        )
        for r in spark.sql("SELECT * FROM scdv").collect()
    }
    assert got == batch
