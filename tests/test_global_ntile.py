"""global_ntile / global_ntile_multi pinned bit-identical to the
single-partition ``ntile`` window they replace (round-3 verdict #4; the
fused multi variant is VERDICT r4 #6)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from diive_spark.operators.analytics import global_ntile, global_ntile_multi


def _df(spark, n=5000):
    return spark.range(n).select(
        F.col("id"),
        # heavy ties in x (50 distinct), near-unique y
        (F.pmod(F.xxhash64("id"), 50)).cast("double").alias("x"),
        ((F.xxhash64("id", F.lit(1)) % 100000) / 997.0).alias("y"),
    )


@pytest.mark.parametrize("n_tiles", [10, 7])
def test_global_ntile_matches_window_ntile(spark, n_tiles):
    df = _df(spark)
    got = global_ntile(df, ["x", "id"], n_tiles, out_col="t")
    want = df.withColumn(
        "t", F.ntile(n_tiles).over(Window.orderBy("x", "id"))
    )
    assert got.select("id", "t").exceptAll(want.select("id", "t")).count() == 0
    assert want.select("id", "t").exceptAll(got.select("id", "t")).count() == 0


def test_global_ntile_multi_matches_sequential_and_window(spark):
    df = _df(spark)
    fused = global_ntile_multi(
        df, [(["x", "id"], 10, "xb"), (["y", "id"], 10, "yb")]
    )
    want = df.withColumn(
        "xb", F.ntile(10).over(Window.orderBy("x", "id"))
    ).withColumn("yb", F.ntile(10).over(Window.orderBy("y", "id")))
    a = fused.select("id", "xb", "yb")
    b = want.select("id", "xb", "yb")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_global_ntile_multi_small_k(spark):
    # k < n_tiles: one row per tile, same as the window rule
    df = spark.range(4).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    fused = global_ntile_multi(
        df, [(["x", "id"], 10, "xb"), (["y", "id"], 10, "yb")]
    )
    want = df.withColumn(
        "xb", F.ntile(10).over(Window.orderBy("x", "id"))
    ).withColumn("yb", F.ntile(10).over(Window.orderBy("y", "id")))
    assert sorted(map(tuple, fused.select("id", "xb", "yb").collect())) == \
        sorted(map(tuple, want.select("id", "xb", "yb").collect()))
