"""Halo chunking (VERDICT r2 next #5): chunked output must equal unchunked
output on a long synthetic series, so a 10⁹-point key can be split across
tasks without changing any flag/fill."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators.chunking import with_global_rn
from diive_spark.operators.gapfill import linear_interp_limited
from diive_spark.operators.outliers import (
    hampel_flag_expr,
    localsd_flag_kernel,
)

N = 40_000
STEP = 1800


@pytest.fixture(scope="module")
def long_series(spark):
    rng = np.random.default_rng(3)
    slots = np.arange(N, dtype=np.int64) * STEP
    v = 10 + np.sin(slots / 86400) * 4 + rng.normal(0, 1, N)
    spikes = rng.random(N) < 0.02
    v[spikes] += rng.normal(0, 25, spikes.sum())
    # null gaps: short fillable ones plus a few longer ones
    v[5000:5003] = np.nan
    v[17000:17020] = np.nan
    mask = rng.random(N) < 0.05
    v[mask] = np.nan
    pdf = pd.DataFrame({"k": 1, "slot_s": slots, "v": v})
    return spark.createDataFrame(pdf)


def _sorted(df, cols):
    return (
        df.select(*cols)
        .toPandas()
        .sort_values(["k", "slot_s"])
        .reset_index(drop=True)
    )


def test_global_rn_matches_window(spark, long_series):
    nn = long_series.filter(F.col("v").isNotNull())
    got = with_global_rn(nn, "k", "slot_s", coarse_span=1_000_000)
    from pyspark.sql import Window

    want = nn.withColumn(
        "rn_ref",
        F.row_number().over(Window.partitionBy("k").orderBy("slot_s")) - 1,
    )
    j = got.join(want.select("k", "slot_s", "rn_ref"), ["k", "slot_s"])
    assert j.filter(F.col("__rn") != F.col("rn_ref")).count() == 0


def test_hampel_chunked_equals_unchunked(spark, long_series):
    base = _sorted(
        hampel_flag_expr(long_series, "k", "slot_s", "v", winsize=15, n_sd=3.0),
        ["k", "slot_s", "flag_hampel"],
    )
    chunked = _sorted(
        hampel_flag_expr(
            long_series, "k", "slot_s", "v", winsize=15, n_sd=3.0,
            chunk_rows=2500,
        ),
        ["k", "slot_s", "flag_hampel"],
    )
    pd.testing.assert_frame_equal(base, chunked)


def test_interp_chunked_equals_unchunked(spark, long_series):
    cols = ["k", "slot_s", "v_f", "flag_gapfilled"]
    base = _sorted(
        linear_interp_limited(
            long_series, "k", "slot_s", "v", gap_limit=5, out_col="v_f"
        ),
        cols,
    )
    chunked = _sorted(
        linear_interp_limited(
            long_series, "k", "slot_s", "v", gap_limit=5, out_col="v_f",
            chunk_slots=3000, grid_step=STEP,
        ),
        cols,
    )
    pd.testing.assert_frame_equal(base, chunked)


def test_localsd_kernel_chunked_equals_unchunked(spark, long_series):
    cols = ["k", "slot_s", "flag_localsd"]
    base = _sorted(
        localsd_flag_kernel(
            long_series, "k", "slot_s", "v", n_sd=3.0, winsize=21,
            grid_step=STEP,
        ),
        cols,
    )
    chunked = _sorted(
        localsd_flag_kernel(
            long_series, "k", "slot_s", "v", n_sd=3.0, winsize=21,
            grid_step=STEP, chunk_slots=4000, halo_slots=21 * 6,
        ),
        cols,
    )
    pd.testing.assert_frame_equal(base, chunked)
