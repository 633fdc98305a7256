"""M2/M3 exact-match tests: flag family, outlier kernels, gap-filling vs the
pandas oracle (reference math)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators import flags as FL
from diive_spark.operators import gapfill as GF
from diive_spark.operators import outliers as OU
from diive_spark.oracle import pandas_oracle as oracle
from diive_spark.sources.pages import pages_to_series_pdf, synth_pages_pdf


@pytest.fixture(scope="module")
def series_pdf():
    return pages_to_series_pdf(synth_pages_pdf(n_urls=8, n_records=200, freq_seconds=600))


@pytest.fixture(scope="module")
def series_sdf(spark, series_pdf):
    return spark.createDataFrame(series_pdf)


def per_url(series_pdf):
    for url, g in series_pdf.groupby("url"):
        yield url, g.sort_values("ts").reset_index(drop=True)


def fetch_flags(sdf, flag_col):
    pdf = sdf.toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    return pdf


def assert_flags_match(spark_pdf, series_pdf, flag_col, oracle_fn):
    for url, g in per_url(series_pdf):
        got = spark_pdf[spark_pdf["url"] == url].sort_values("ts")[flag_col].to_numpy()
        want = oracle_fn(g["value"]).to_numpy()
        np.testing.assert_array_equal(got, want, err_msg=f"url={url}")


def test_zscore_expr_single_pass(spark, series_sdf, series_pdf):
    got = fetch_flags(
        OU.zscore_flag_expr(series_sdf, "url", "value", thres_zscore=3.0), "flag_zscore"
    )
    assert_flags_match(
        got, series_pdf, "flag_zscore",
        lambda s: oracle.zscore_flag(s, thres_zscore=3.0, repeat=False),
    )


def test_zscore_kernel_iterated(spark, series_sdf, series_pdf):
    got = fetch_flags(
        OU.zscore_flag_iterated(series_sdf, "url", "ts", "value", thres_zscore=3.0),
        "flag_zscore",
    )
    assert_flags_match(
        got, series_pdf, "flag_zscore",
        lambda s: oracle.zscore_flag(s, thres_zscore=3.0, repeat=True),
    )


def test_zscore_increments(spark, series_sdf, series_pdf):
    got = fetch_flags(
        OU.zscore_increments_flag_expr(series_sdf, "url", "ts", "value", 3.0),
        "flag_zscore_incr",
    )
    assert_flags_match(
        got, series_pdf, "flag_zscore_incr",
        lambda s: oracle.zscore_increments_flag(s, thres_zscore=3.0),
    )


def test_localsd_kernel(spark, series_sdf, series_pdf):
    got = fetch_flags(
        OU.localsd_flag_kernel(series_sdf, "url", "ts", "value", n_sd=5.0, winsize=21),
        "flag_localsd",
    )
    assert_flags_match(
        got, series_pdf, "flag_localsd",
        lambda s: oracle.localsd_flag(s, n_sd=5.0, winsize=21),
    )


def test_hampel_expr_matches_pandas_single_pass(spark, series_sdf, series_pdf):
    winsize, n_sd = 15, 5.0
    got = fetch_flags(
        OU.hampel_flag_expr(series_sdf, "url", "ts", "value", winsize, n_sd),
        "flag_hampel",
    )

    def single_pass(s):
        nn = s.dropna()
        med = nn.rolling(winsize, center=True, min_periods=3).median()
        sd = nn.rolling(winsize, center=True, min_periods=3).std()
        rej = (nn > med + n_sd * sd) | (nn < med - n_sd * sd)
        flag = pd.Series(0, index=s.index, dtype="int64")
        flag.loc[rej[rej].index] = 2
        return flag

    assert_flags_match(got, series_pdf, "flag_hampel", single_pass)


def test_flag_missing_abslim_qcf(spark, series_sdf, series_pdf):
    sdf = FL.flag_missing(series_sdf)
    sdf = FL.flag_abslim(sdf, minval=50.0, maxval=250.0)
    sdf = FL.add_qcf(sdf, ["flag_missing", "flag_abslim"])
    got = fetch_flags(sdf, "qcf")
    for url, g in per_url(series_pdf):
        v = g["value"]
        fm = pd.Series(np.where(v.isna(), 2, 0), index=g.index)
        fa = pd.Series(np.where((~v.isna()) & ((v < 50) | (v > 250)), 2, 0), index=g.index)
        flags = pd.DataFrame({"m": fm, "a": fa})
        hard, soft = oracle.flag_sums(flags)
        want_qcf = oracle.qcf_ladder(hard, soft)
        sub = got[got["url"] == url].sort_values("ts")
        np.testing.assert_array_equal(sub["qcf"].to_numpy(), want_qcf.to_numpy())
        # filtered series
        want_vqcf, want_vqcf0 = oracle.apply_qcf(v, want_qcf)
        np.testing.assert_array_equal(
            sub["value_qcf"].isna().to_numpy(), want_vqcf.isna().to_numpy()
        )
        np.testing.assert_array_equal(
            sub["value_qcf0"].isna().to_numpy(), want_vqcf0.isna().to_numpy()
        )


def test_gap_runs(spark, series_sdf, series_pdf):
    got = (
        GF.gap_runs(series_sdf, "url", "ts", "value", limit=None)
        .toPandas()
        .sort_values(["url", "gap_start"])
        .reset_index(drop=True)
    )
    frames = []
    for url, g in per_url(series_pdf):
        runs = oracle.gapfinder(g.set_index("ts")["value"])
        runs.insert(0, "url", url)
        frames.append(runs)
    want = (
        pd.concat(frames)
        .sort_values(["url", "gap_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["gap_len"].to_numpy(), want["gap_len"].to_numpy())
    assert (got["gap_start"].to_numpy() == want["gap_start"].to_numpy()).all()
    assert (got["gap_end"].to_numpy() == want["gap_end"].to_numpy()).all()


def test_linear_interp_limited(spark, series_sdf, series_pdf):
    got = fetch_flags(
        GF.linear_interp_limited(series_sdf, "url", "ts", "value", gap_limit=3,
                                 out_col="value_filled"),
        "flag_gapfilled",
    )
    for url, g in per_url(series_pdf):
        want = oracle.linear_interp_limited(g["value"], gap_limit=3)
        sub = got[got["url"] == url].sort_values("ts")
        np.testing.assert_allclose(
            sub["value_filled"].to_numpy(), want.to_numpy(), rtol=1e-12, equal_nan=True
        )


@pytest.mark.parametrize("limit", [1, 3])
def test_ffill_bfill_limited(spark, series_sdf, series_pdf, limit):
    got_f = (
        GF.ffill_limited(series_sdf, "url", "ts", "value", limit=limit, out_col="vf")
        .toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    )
    got_b = (
        GF.bfill_limited(series_sdf, "url", "ts", "value", limit=limit, out_col="vb")
        .toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    )
    for url, g in per_url(series_pdf):
        sub_f = got_f[got_f["url"] == url].sort_values("ts")["vf"].to_numpy()
        sub_b = got_b[got_b["url"] == url].sort_values("ts")["vb"].to_numpy()
        np.testing.assert_allclose(
            sub_f, g["value"].ffill(limit=limit).to_numpy(), rtol=0, equal_nan=True
        )
        np.testing.assert_allclose(
            sub_b, g["value"].bfill(limit=limit).to_numpy(), rtol=0, equal_nan=True
        )


def test_add_timezone_info_and_file_start_timestamps(spark):
    """S-tier tz localization (times.py:1047-1060) + raw-file timestamp
    rebuild with true-resolution stretch and 50 ms rounding
    (times.py:1143-1172, 1200-1224), checked against the reference's
    pandas semantics computed inline."""
    import pandas as pd
    from pyspark.sql import functions as F

    from diive_spark.operators.sanitize import (
        add_timezone_info,
        timestamps_from_file_start,
    )

    # tz: CET reading 12:00 local == 11:00 UTC instant
    sdf = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp("2024-06-01 12:00:00")]})
    )
    got = sdf.select(
        add_timezone_info(F.col("ts"), "UTC+01:00").alias("utc")
    ).collect()[0]["utc"]
    want = (
        pd.Timestamp("2024-06-01 12:00:00")
        .tz_localize("UTC+01:00")
        .tz_convert("UTC")
        .tz_localize(None)
    )
    assert pd.Timestamp(got) == want

    # sub-second precision survives localization (the reference's
    # tz_localize keeps full resolution — ADVICE r2 low #4): a 50 ms-rounded
    # reading must keep its fractional part
    sdf = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp("2024-06-01 12:00:00.150")]})
    )
    got = sdf.select(
        add_timezone_info(F.col("ts"), "UTC+01:00").alias("utc")
    ).collect()[0]["utc"]
    assert pd.Timestamp(got) == pd.Timestamp("2024-06-01 11:00:00.150")

    # file timestamps: 1790 records where 1800 were expected over 90 s at
    # 20 Hz -> ratio 0.994 outside the 0.1% window -> nominal res kept
    n = 1790
    sdf = spark.createDataFrame(pd.DataFrame({"rn": range(n)}))
    out = timestamps_from_file_start(
        sdf, "rn", "2024-06-01 00:00:00", data_nominal_res=0.05,
        expected_duration=90,
    ).orderBy("rn").toPandas()
    want_ts = (
        pd.Timestamp("2024-06-01")
        + pd.to_timedelta(pd.Series(range(n)) * 0.05, unit="s")
    ).dt.round("50ms")
    pd.testing.assert_series_equal(
        pd.Series(out["ts"]), want_ts, check_names=False
    )

    # complete file: 1800 of 1800 -> true res = duration / n
    sdf = spark.createDataFrame(pd.DataFrame({"rn": range(1800)}))
    out2 = timestamps_from_file_start(
        sdf, "rn", "2024-06-01 00:00:00", data_nominal_res=0.05,
        expected_duration=90,
    ).orderBy("rn").limit(3).toPandas()
    assert pd.Timestamp(out2["ts"].iloc[1]) == pd.Timestamp("2024-06-01 00:00:00.050")
