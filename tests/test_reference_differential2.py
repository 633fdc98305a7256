"""Differential batch 2: more reference operators compared directly
against the Spark engine (see tests/reference_import.py)."""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.reference_import import load_reference

warnings.filterwarnings("ignore")

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference import failed")


def _series(n=400, seed=3, name="VAR") -> pd.Series:
    rng = np.random.RandomState(seed)
    idx = pd.date_range("2024-01-01", periods=n, freq="30min", name="TIMESTAMP_END")
    s = pd.Series(rng.normal(20, 4, n), index=idx, name=name)
    s.iloc[[7, 90, 91, 92, 200, 201, 202, 203, 204, 350]] = np.nan
    s.iloc[[15, 250]] = [90.0, -60.0]
    return s


def _sdf(spark, s: pd.Series):
    slot = (s.index.astype("int64") // 10**9).astype("int64")
    return spark.createDataFrame(
        pd.DataFrame({"key": "k", "slot_s": slot, "v": s.values})
    )


def test_zscore_increments_matches_reference(spark):
    from diive_spark.operators.outliers import zscore_increments_flag_expr

    s = _series()
    zi = ref.zScoreIncrements(series=s, thres_zscore=3.0)
    zi.calc(repeat=False)
    want = zi.get_flag()

    got = (
        zscore_increments_flag_expr(
            _sdf(spark, s), "key", "slot_s", "v", thres_zscore=3.0
        )
        .orderBy("slot_s")
        .toPandas()["flag_zscore_incr"]
        .to_numpy()
    )
    # reference flags carry NaN where untested (null increment); ours give 0
    w = want.to_numpy()
    mask = ~np.isnan(w)
    np.testing.assert_array_equal(got[mask], w[mask].astype(np.int8))
    assert (got[~mask] == 0).all()


def test_abslim_matches_reference(spark):
    from diive_spark.operators.flags import flag_abslim

    s = _series()
    al = ref.AbsoluteLimits(series=s, minval=10.0, maxval=40.0)
    # repeat=False: the reference's _flagtests checks self.series (not the
    # filtered series, absolutelimits.py:187-193), so with outliers present
    # repeat=True NEVER converges (n_outliers stays constant) — a reference
    # bug alongside the `ok` |-vs-& mask bug documented in SURVEY §2.8 F5.
    al.calc(repeat=False)
    want = al.get_flag().to_numpy()

    got = (
        flag_abslim(_sdf(spark, s), "v", minval=10.0, maxval=40.0)
        .orderBy("slot_s")
        .toPandas()["flag_abslim"]
        .to_numpy()
    )
    mask = ~np.isnan(want)
    np.testing.assert_array_equal(got[mask], want[mask].astype(np.int8))
    assert (got[~mask] == 0).all()


def test_gapfinder_matches_reference(spark):
    from diive_spark.operators.gapfill import gap_runs

    s = _series()
    gf = ref.GapFinder(series=s, limit=None, sort_results=False)
    want = gf.get_results()  # GAP_START, GAP_END, GAP_LENGTH

    got = (
        gap_runs(_sdf(spark, s), "key", "slot_s", "v", limit=10**9)
        .toPandas()
        .sort_values("gap_start")
        .reset_index(drop=True)
    )
    want = want.sort_values("GAP_START").reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(
        got["gap_len"].astype(int).to_numpy(),
        want["GAP_LENGTH"].astype(int).to_numpy(),
    )
    want_start_s = (want["GAP_START"].astype("int64") // 10**9).to_numpy()
    np.testing.assert_array_equal(got["gap_start"].astype(int).to_numpy(), want_start_s)


def test_histogram_matches_reference(spark):
    from diive_spark.operators.analytics import histogram_fixed_bins

    s = _series().dropna()
    h = ref.Histogram(s=s, method="n_bins", n_bins=20)
    want = h.results  # BIN_START_INCL, COUNTS

    got = (
        histogram_fixed_bins(_sdf(spark, s), "key", "v", n_bins=20)
        .orderBy("bin")
        .toPandas()
    )
    # the engine emits OCCUPIED bins only (sparse — at scale a dense grid is
    # a join away); np.histogram emits all 20 including zeros: densify
    dense = (
        got.set_index("bin")["n"].reindex(range(20), fill_value=0).to_numpy()
    )
    np.testing.assert_array_equal(dense, want["COUNTS"].to_numpy())
    occupied = got.set_index("bin")["bin_lo"].astype(float)
    want_lo = want["BIN_START_INCL"].astype(float).reset_index(drop=True)
    for b, lo in occupied.items():
        np.testing.assert_allclose(lo, want_lo.iloc[int(b)], rtol=1e-4)


def test_sstats_matches_reference(spark):
    s = _series()
    want = ref.sstats(s)  # DataFrame indexed by stat name
    wcol = want.columns[0]

    got = (
        _sdf(spark, s)
        .agg(
            F.count("v").alias("n"),
            F.avg("v").alias("mean"),
            F.stddev_samp("v").alias("sd"),
            F.sum("v").alias("sum"),
            F.expr("percentile(v, 0.5)").alias("median"),
            F.min("v").alias("min"),
            F.max("v").alias("max"),
        )
        .first()
    )
    idx = [str(i).upper() for i in want.index]

    def w(name):
        return float(want[wcol].iloc[idx.index(name)])

    assert got["n"] == int(w("NOV"))
    np.testing.assert_allclose(got["mean"], w("MEAN"), rtol=1e-12)
    np.testing.assert_allclose(got["sd"], w("SD"), rtol=1e-12)
    np.testing.assert_allclose(got["median"], w("MEDIAN"), rtol=1e-12)


def test_detect_frequency_matches_reference(spark):
    from diive_spark.operators.analytics import freq_detect

    s = _series()
    want = ref.DetectFrequency(index=s.index, verbose=False).get()
    got = (
        freq_detect(_sdf(spark, s), "key", "slot_s")
        .toPandas()
        .iloc[0]
    )
    assert int(got["delta_s"]) == 1800 and got["freq_ok"] == 1
    if want is not None:
        # under pandas 2.x the reference's three infer paths can disagree on
        # alias spelling ('30T' vs '30min') and return None — when it does
        # return, it must agree with the engine
        want_s = int(pd.Timedelta(pd.tseries.frequencies.to_offset(want)).total_seconds())
        assert int(got["delta_s"]) == want_s


def test_potrad_matches_reference(spark):
    from diive_spark.functions.meteo import swin_pot

    idx = pd.date_range("2024-06-01", periods=300, freq="23min")
    want = ref.potrad(
        timestamp_index=idx, lat=47.286417, lon=7.733750, utc_offset=1
    ).to_numpy()

    pdf = pd.DataFrame({"i": np.arange(300), "ts": idx})
    got = (
        spark.createDataFrame(pdf)
        .select("i", swin_pot("ts", 47.286417, 7.733750, 1).alias("sw"))
        .orderBy("i")
        .toPandas()["sw"]
        .to_numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-9)


def test_vpd_matches_reference(spark):
    from diive_spark.functions.meteo import vpd_from_ta_rh

    rng = np.random.RandomState(2)
    pdf = pd.DataFrame(
        {"i": np.arange(100), "TA": rng.uniform(-10, 35, 100), "RH": rng.uniform(10, 100, 100)}
    )
    want = ref.calc_vpd_from_ta_rh(df=pdf, rh_col="RH", ta_col="TA").to_numpy()
    got = (
        spark.createDataFrame(pdf)
        .select("i", vpd_from_ta_rh("TA", "RH").alias("vpd"))
        .orderBy("i")
        .toPandas()["vpd"]
        .to_numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_daily_correlation_matches_reference(spark):
    s1 = _series(seed=5).rename("A").dropna()
    s2 = (_series(seed=5) * 0.8 + _series(seed=11) * 0.2).rename("B").dropna()
    want = ref.daily_correlation(s1=s1, s2=s2, showplot=False).dropna()

    both = pd.DataFrame({"a": s1, "b": s2}).dropna().reset_index()
    both["d"] = both["TIMESTAMP_END"].dt.date.astype(str)
    got = (
        spark.createDataFrame(both[["d", "a", "b"]])
        .groupBy("d")
        .agg(F.corr("a", "b").alias("r"))
        .orderBy("d")
        .toPandas()
    )
    got_r = got.set_index("d")["r"]
    for day, r in want.items():
        key = str(pd.Timestamp(day).date())
        if key in got_r.index and not np.isnan(r):
            np.testing.assert_allclose(got_r[key], r, rtol=1e-10)


def test_flagqcf_ladder_matches_reference(spark):
    from diive_spark.operators.flags import add_qcf

    rng = np.random.RandomState(8)
    n = 300
    idx = pd.date_range("2024-01-01", periods=n, freq="30min", name="TIMESTAMP_END")
    v = pd.Series(rng.normal(0, 1, n), index=idx, name="VAR")
    flags = pd.DataFrame(
        {
            "FLAG_VAR_A_TEST": rng.choice([0, 0, 0, 2], n),
            "FLAG_VAR_B_TEST": rng.choice([0, 0, 1, 2], n),
            "FLAG_VAR_C_TEST": rng.choice([0, 1, 1, 2], n),
        },
        index=idx,
    ).astype(float)

    qcf = ref.FlagQCF(df=flags.copy(), series=v)
    qcf.calculate()
    want = qcf.flags

    pdf = flags.reset_index(drop=True).copy()
    pdf["value"] = v.to_numpy()
    pdf["i"] = np.arange(n)
    sdf = spark.createDataFrame(pdf)
    got = (
        add_qcf(
            sdf,
            ["FLAG_VAR_A_TEST", "FLAG_VAR_B_TEST", "FLAG_VAR_C_TEST"],
            value_col="value",
        )
        .orderBy("i")
        .toPandas()
    )
    qcf_col = [c for c in want.columns if str(c).endswith("_QCF") and "FLAG" in str(c)][0]
    np.testing.assert_array_equal(
        got["qcf"].to_numpy(), want[qcf_col].to_numpy().astype(np.int8)
    )
