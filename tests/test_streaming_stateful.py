"""applyInPandasWithState streaming z-score: converges to the batch flag
(funcs.py:37-41 population-σ z-score) once all data is seen."""

from __future__ import annotations

from pyspark.sql import functions as F

from diive_spark.streaming.stateful import stream_zscore_flags


def test_stateful_zscore_stream(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_src = ev.count()
    # single file => single trigger => state sees everything at once,
    # making the streaming flag EXACTLY the batch flag
    ev.coalesce(1).write.parquet(str(tmp_path / "src"))
    sdf = stream_zscore_flags(spark, str(tmp_path / "src"), ev.schema)
    q = (
        sdf.writeStream.format("memory")
        .queryName("zstate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM zstate")
    assert got.count() == n_src

    batch = (
        spark.read.parquet(str(tmp_path / "src"))
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
            .cast("long")
            .alias("ts_s"),
            "value",
        )
        .withColumn(
            "flag_b",
            F.when(
                F.col("value").isNotNull()
                & (
                    F.abs(
                        (F.col("value") - F.expr("avg(value) OVER (PARTITION BY user_id)"))
                        / F.expr("stddev_pop(value) OVER (PARTITION BY user_id)")
                    )
                    > 4.0
                ),
                F.lit(2),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
    )
    j = got.alias("s").join(
        batch.alias("b"),
        (F.col("s.user_id") == F.col("b.user_id"))
        & (F.col("s.ts_s") == F.col("b.ts_s")),
    )
    mismatch = j.filter(F.col("s.flag_zscore") != F.col("b.flag_b")).count()
    assert mismatch == 0


def test_stream_exact_dedup_within_watermark(spark, tmp_path):
    """Duplicate content across micro-batches within the watermark is
    dropped (first arrival wins); distinct content all survives."""
    import pandas as pd

    from diive_spark.streaming.rollup import stream_exact_dedup

    src = tmp_path / "docs_stream"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    b1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["aaa", "bbb", "ccc"],
            "ts": [base, base, base + pd.Timedelta("5min")],
        }
    )
    b2 = pd.DataFrame(
        {
            "doc_id": [4, 5],
            "text": ["aaa", "ddd"],  # 4 duplicates doc 1's content
            "ts": [base + pd.Timedelta("10min"), base + pd.Timedelta("12min")],
        }
    )
    spark.createDataFrame(b1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2).write.parquet(str(src / "b2"))

    out = stream_exact_dedup(
        spark, f"{src}/*", "doc_id long, text string, ts timestamp_ntz"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_out").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["aaa", "bbb", "ccc", "ddd"]
    kept = {r["text"]: r["doc_id"] for r in rows}
    assert kept["aaa"] in (1, 4)  # one of the duplicate pair, exactly once
