"""Distributed global rank/NTILE vs Spark's own single-partition window
— bit-identical on tie-free total orders, including null ordering and
uneven NTILE quotas."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from diive_spark.operators.rank import global_row_number, ntile_from_rank


def _df(spark, n, with_nulls=False):
    rng = random.Random(11)
    rows = [
        (i, None if with_nulls and i % 7 == 0 else rng.uniform(-5, 5))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, x double")


@pytest.mark.parametrize("with_nulls", [False, True])
def test_global_row_number_matches_window(spark, with_nulls):
    df = _df(spark, 500, with_nulls)
    order = [F.desc_nulls_last("x"), F.col("id")]
    got = {
        r.id: r.rn
        for r in global_row_number(df, order, num_partitions=7).collect()
    }
    want = {
        r.id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(10, 3), (9, 3), (500, 7), (2, 5)])
def test_ntile_from_rank_matches_ntile(spark, n, k):
    df = _df(spark, n)
    order = [F.col("x"), F.col("id")]
    got = {
        r.id: r.b
        for r in global_row_number(
            df, order, num_partitions=4, attach_total="t"
        ).withColumn(
            "b", ntile_from_rank(F.col("rn"), F.col("t"), k)
        ).collect()
    }
    want = {
        r.id: r.b
        for r in df.withColumn(
            "b", F.ntile(k).over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("with_nulls,descending", [
    (False, True), (True, True), (True, False),
])
def test_value_offset_row_number_matches_window(spark, with_nulls, descending):
    from diive_spark.operators.rank import value_offset_row_number

    # low-cardinality leading key: round to 1 decimal so values repeat
    df = _df(spark, 500, with_nulls).withColumn("x", F.round("x", 1))
    first = F.desc_nulls_last("x") if descending else F.asc_nulls_last("x")
    got = {
        r.id: (r.rn, r.t)
        for r in value_offset_row_number(
            df, "x", [F.col("id")], descending=descending, attach_total="t"
        ).collect()
    }
    want_df = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(first, F.col("id")))
    )
    total = want_df.count()
    want = {r.id: (r.rn, total) for r in want_df.collect()}
    assert got == want
