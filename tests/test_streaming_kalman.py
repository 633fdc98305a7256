"""Streaming Kalman local level == batch kernel over a 3-micro-batch
time-ordered replay (bounded 4-scalar state carried across batches)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from diive_spark.operators.statekernels import kalman_local_level
from diive_spark.streaming.kalman import stream_kalman_level


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def test_stream_kalman_matches_batch(spark, tmp_path):
    rng = np.random.RandomState(11)
    rows = []
    series = {}
    for key in range(5):
        y = rng.normal(size=90).cumsum() + rng.normal(
            scale=3.0, size=90
        )
        series[key] = y
        for i, v in enumerate(y):
            rows.append((key, i * 60, float(v)))
    df = spark.createDataFrame(
        rows, "user_id long, ts_s long, value double"
    )

    src = tmp_path / "kstream"
    src.mkdir()
    for i, cond in enumerate(
        [
            F.col("ts_s") < 1800,
            (F.col("ts_s") >= 1800) & (F.col("ts_s") < 3600),
            F.col("ts_s") >= 3600,
        ]
    ):
        df.filter(cond).select(
            "user_id",
            F.timestamp_seconds("ts_s").alias("ts"),
            "value",
        ).coalesce(1).write.parquet(str(src / f"b{i}.parquet"))

    sdf = stream_kalman_level(
        spark,
        str(src) + "/*",
        "user_id LONG, ts TIMESTAMP, value DOUBLE",
        q=1.0,
        r=10.0,
    )
    qq = (
        sdf.writeStream.format("memory")
        .queryName("kalman")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qq.awaitTermination(180)
    snaps = spark.sql(
        "SELECT * FROM kalman"
    ).collect()
    final = {}
    for r_ in snaps:
        if (
            r_["user_id"] not in final
            or r_["n"] > final[r_["user_id"]]["n"]
        ):
            final[r_["user_id"]] = r_
    assert len(final) == 5
    for key, y in series.items():
        a, p, ll = kalman_local_level(y, 1.0, 10.0)
        got = final[key]
        assert got["n"] == len(y)
        assert got["level"] == pytest.approx(a[-1], abs=1e-9)
        assert got["p"] == pytest.approx(p[-1], abs=1e-9)
        assert got["loglik"] == pytest.approx(ll, abs=1e-6)
