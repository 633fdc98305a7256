"""Z-order layout pins: the SQL bit-spread matches a Python reference
interleave bit-for-bit, and the layout pass actually produces the
locality the Delta/Iceberg ZORDER optimization promises — every write
bucket's (x, y) bounding box is small in BOTH dimensions."""

from __future__ import annotations

import numpy as np
import pandas as pd

from diive_spark.functions.zorder import z_value, zorder_layout


def _ref_interleave(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_z_value_matches_reference_interleave(spark):
    rng = np.random.default_rng(8)
    xs = rng.integers(0, 1 << 16, 200)
    ys = rng.integers(0, 1 << 16, 200)
    pdf = pd.DataFrame({"x": xs, "y": ys})
    got = (
        spark.createDataFrame(pdf)
        .withColumn("z", z_value("x", "y"))
        .toPandas()
    )
    want = [_ref_interleave(int(a), int(b)) for a, b in zip(got.x, got.y)]
    assert got.z.tolist() == want


def test_zorder_layout_locality(spark):
    """Against a time-sorted layout: z-ordered buckets must bound BOTH
    dimensions, so the max per-bucket x-extent shrinks by orders of
    magnitude while y stays bounded."""
    rng = np.random.default_rng(3)
    n = 20_000
    pdf = pd.DataFrame(
        {
            "x": rng.integers(0, 1 << 16, n),   # key hash dim
            "y": np.arange(n) % (1 << 16),      # time dim
        }
    )
    df = spark.createDataFrame(pdf)
    laid = zorder_layout(df, "x", "y", n_files=16)
    import pyspark.sql.functions as F

    stats = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xspan"),
            (F.max("y") - F.min("y")).alias("yspan"),
            F.count("*").alias("n"),
        )
        .toPandas()
    )
    full = (1 << 16) - 1
    # a pure time-sort would give xspan ~ full for every file; z-order
    # must cut the median x-extent while keeping y bounded too
    assert stats.xspan.median() < full * 0.6
    assert stats.yspan.median() < full * 0.6
    assert stats.n.sum() == n
