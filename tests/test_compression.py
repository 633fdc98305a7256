"""M5: Gorilla + delta-of-delta round-trip (bit-exact, property-based) and
Spark block-layer tests."""

from __future__ import annotations

import numpy as np
import pytest

from diive_spark.compression.deltadelta import decode_timestamps, encode_timestamps
from diive_spark.compression.gorilla import decode_floats, encode_floats

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def roundtrip_floats(arr: np.ndarray):
    buf = encode_floats(arr)
    out = decode_floats(buf, len(arr))
    np.testing.assert_array_equal(
        arr.view(np.uint64), out.view(np.uint64)
    )  # BIT-exact incl. NaN payloads
    return buf


def test_floats_basic():
    arr = np.array([1.0, 1.0, 1.5, -2.25, np.nan, np.inf, -0.0, 0.0, 1e308, 5e-324])
    roundtrip_floats(arr)


def test_floats_constant_compresses_to_bits():
    arr = np.full(1000, 42.5)
    buf = roundtrip_floats(arr)
    assert len(buf) < 8 + 1000 // 8 + 16  # ~1 bit per repeat


def test_floats_sensorlike_ratio():
    rng = np.random.RandomState(42)
    arr = np.cumsum(rng.normal(0, 0.1, 5000)) + 100
    arr = np.round(arr, 2)
    buf = roundtrip_floats(arr)
    assert len(buf) < len(arr) * 8  # strictly better than raw

def test_timestamps_regular_grid_one_bit():
    ts = np.arange(0, 10000) * 60_000_000 + 1_700_000_000_000_000
    buf = encode_timestamps(ts)
    out = decode_timestamps(buf, len(ts))
    np.testing.assert_array_equal(ts, out)
    assert len(buf) <= 16 + 10000 // 8 + 8  # ~1 bit/point after header


def test_timestamps_irregular():
    rng = np.random.RandomState(7)
    deltas = rng.randint(1, 10**7, 2000)
    ts = np.cumsum(deltas) + 1_700_000_000_000_000
    buf = encode_timestamps(ts)
    np.testing.assert_array_equal(decode_timestamps(buf, len(ts)), ts)


def test_empty_and_single():
    assert encode_floats(np.array([], dtype=np.float64)) == b""
    assert len(decode_floats(b"", 0)) == 0
    one = np.array([3.14159])
    np.testing.assert_array_equal(decode_floats(encode_floats(one), 1), one)
    t1 = np.array([123456789], dtype=np.int64)
    np.testing.assert_array_equal(decode_timestamps(encode_timestamps(t1), 1), t1)


if HAVE_HYP:

    @given(
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            min_size=1,
            max_size=300,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_floats_property(xs):
        roundtrip_floats(np.array(xs, dtype=np.float64))

    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**50), min_size=1, max_size=300
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_timestamps_property(xs):
        ts = np.sort(np.array(xs, dtype=np.int64))
        buf = encode_timestamps(ts)
        np.testing.assert_array_equal(decode_timestamps(buf, len(ts)), ts)


def test_spark_block_roundtrip(spark):
    from diive_spark.compression.blocks import compress_blocks, decompress_blocks
    from diive_spark.sources.pages import synth_pages_df

    src = synth_pages_df(spark, n_urls=20, n_records=500, freq_seconds=120)
    blocks = compress_blocks(src, "url", "ts", "value", block_seconds=43200)
    import pyspark.sql.functions as F

    stats = blocks.agg(
        F.sum("raw_bytes").alias("raw"),
        F.sum("enc_bytes").alias("enc"),
        F.sum("n_points").alias("n"),
        F.sum(F.octet_length("ts_blob")).alias("ts_bytes"),
    ).collect()[0]
    # timestamps on a regular grid: ~1 bit/point after the 16-byte header
    assert stats["ts_bytes"] < stats["n"] / 4
    # full-noise float64 values compress modestly; combined must beat raw
    assert stats["enc"] < stats["raw"] * 0.75
    back = decompress_blocks(blocks, "url")
    orig = src.selectExpr(
        "url", "unix_micros(cast(ts as timestamp)) as ts_us", "value"
    )
    # bit-exact equality incl. null (NaN) values
    a = orig.toPandas().sort_values(["url", "ts_us"]).reset_index(drop=True)
    b = back.toPandas().sort_values(["url", "ts_us"]).reset_index(drop=True)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["ts_us"].values, b["ts_us"].values)
    av = a["value"].to_numpy(dtype=np.float64)
    bv = b["value"].to_numpy(dtype=np.float64)
    mask = ~np.isnan(av)
    np.testing.assert_array_equal(av[mask], bv[mask])
    assert (np.isnan(av) == np.isnan(bv)).all()
