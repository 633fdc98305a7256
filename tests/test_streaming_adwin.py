"""Streaming ADWIN == batch detector over a 3-micro-batch replay
(bucket-histogram state carried across batches via parallel arrays)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from diive_spark.operators.adwin import adwin_detect
from diive_spark.streaming.adwin import stream_adwin_drift


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def test_stream_adwin_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(7)
    rows = []
    series = {}
    for ki, key in enumerate(["a", "b", "c"]):
        y = np.concatenate(
            [
                rng.normal(0.0, 0.5, 900),
                rng.normal(2.0 + ki, 0.5, 600),
            ]
        )
        series[key] = y
        for i, v in enumerate(y):
            rows.append((key, i, i * 60_000_000, float(v)))
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, us long, value double"
    )

    src = tmp_path / "astream"
    src.mkdir()
    cut1, cut2 = 500 * 60_000_000, 1000 * 60_000_000
    for i, cond in enumerate(
        [
            F.col("us") < cut1,
            (F.col("us") >= cut1) & (F.col("us") < cut2),
            F.col("us") >= cut2,
        ]
    ):
        df.filter(cond).select(
            "event_type",
            F.timestamp_micros("us").alias("ts"),
            "event_id",
            "value",
        ).coalesce(1).write.parquet(str(src / f"b{i}.parquet"))

    sdf = stream_adwin_drift(
        spark,
        str(src) + "/*",
        "event_type STRING, ts TIMESTAMP, event_id LONG, value DOUBLE",
    )
    qq = (
        sdf.writeStream.format("memory")
        .queryName("adwinstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qq.awaitTermination(180)
    snaps = spark.sql("SELECT * FROM adwinstream").collect()
    final = {}
    for r_ in snaps:
        if (
            r_["event_type"] not in final
            or r_["n"] > final[r_["event_type"]]["n"]
        ):
            final[r_["event_type"]] = r_
    assert len(final) == 3
    for key, y in series.items():
        det, win, mean = adwin_detect(y)
        got = final[key]
        assert got["n"] == len(y)
        assert got["n_detections"] == len(det)
        assert got["first_detection"] == (det[0] if det else 0)
        assert got["last_detection"] == (det[-1] if det else 0)
        assert got["final_window"] == win
        assert abs(got["final_mean"] - mean) < 1e-12
        # the planted shift must actually be detected
        assert det and 900 < det[0] <= 1200
