"""Reference-exactness tests for the meteo/wind/flux-chain families.

Each test re-implements the reference's pandas/numpy algorithm inline
(from the cited file:line in the module docstrings) and compares the
Spark expression output on a small deterministic series.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.functions import meteo as MET
from diive_spark.functions import wind as WIND
from diive_spark.operators import fluxchain as FC

LAT, LON, OFF = 47.286417, 7.733750, 1


def _potrad_oracle(idx: pd.DatetimeIndex) -> np.ndarray:
    """potentialradiation.py:44-77 re-derived (Stull 1988)."""
    utc = idx - pd.Timedelta(OFF, unit="h")
    utc_h = utc.hour + utc.minute / 60 + utc.second / 3600
    doy = utc.dayofyear
    lam = LON * np.pi / 180
    phi = LAT * np.pi / 180
    delta = (23.45 * np.pi / 180) * np.cos(2 * np.pi * (doy - 173) / 365.25)
    sin_psi = np.sin(phi) * np.sin(delta) - np.cos(phi) * np.cos(delta) * np.cos(
        np.pi * utc_h / 12 + lam
    )
    rad = 1361.0 * sin_psi
    return np.where(rad < 0, 0.0, rad)


@pytest.fixture(scope="module")
def ts_frame(spark):
    idx = pd.date_range("2024-06-01", periods=200, freq="47min")
    pdf = pd.DataFrame({"i": np.arange(200), "ts": idx})
    return spark.createDataFrame(pdf), idx


def test_swin_pot_matches_reference(ts_frame):
    sdf, idx = ts_frame
    got = (
        sdf.select("i", MET.swin_pot("ts", LAT, LON, OFF).alias("sw"))
        .orderBy("i")
        .toPandas()["sw"]
        .to_numpy()
    )
    np.testing.assert_allclose(got, _potrad_oracle(idx), rtol=1e-12, atol=1e-9)


def test_daynight_flags(ts_frame, spark):
    sdf, idx = ts_frame
    sw = MET.swin_pot("ts", LAT, LON, OFF)
    got = (
        sdf.select(
            "i",
            MET.daytime_flag(sw).alias("day"),
            MET.nighttime_flag(sw).alias("night"),
        )
        .orderBy("i")
        .toPandas()
    )
    ref = _potrad_oracle(idx)
    np.testing.assert_array_equal(got["day"].to_numpy(), (ref >= 50).astype(int))
    assert (got["day"] + got["night"]).eq(1).all()


def test_vpd_formula(spark):
    pdf = pd.DataFrame({"ta": [0.0, 10.5, 25.0, -5.0], "rh": [100.0, 60.0, 33.3, 80.0]})
    sdf = spark.createDataFrame(pdf)
    got = sdf.select(MET.vpd_from_ta_rh("ta", "rh").alias("v")).toPandas()["v"].to_numpy()
    ref = (
        0.1
        * 6.1078
        * (1 - pdf["rh"] / 100)
        * np.exp(17.08085 * pdf["ta"] / (234.175 + pdf["ta"]))
    ).to_numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-14)
    # RH=100% -> zero deficit
    assert got[0] == pytest.approx(0.0, abs=1e-15)


def test_double_rotation_zeroes_v_and_w_means(spark):
    """After double rotation the segment means of v_rot and w_rot are ~0
    (windrotation.py:78-136 invariant)."""
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "k": np.repeat(["a", "b"], 100),
            "u": rng.uniform(1, 3, 200),
            "v": rng.uniform(-1, 1, 200),
            "w": rng.uniform(-0.3, 0.3, 200),
        }
    )
    out = (
        WIND.double_rotation(spark.createDataFrame(pdf), "k")
        .groupBy("k")
        .agg(F.avg("v_rot").alias("vm"), F.avg("w_rot").alias("wm"))
        .toPandas()
    )
    assert np.abs(out["vm"]).max() < 1e-9
    assert np.abs(out["wm"]).max() < 1e-9

    # and the rotation preserves wind-vector magnitude per row
    chk = (
        WIND.double_rotation(spark.createDataFrame(pdf), "k")
        .select(
            (F.col("u") ** 2 + F.col("v") ** 2 + F.col("w") ** 2).alias("m0"),
            (F.col("u_rot") ** 2 + F.col("v_rot") ** 2 + F.col("w_rot") ** 2).alias("m1"),
        )
        .toPandas()
    )
    np.testing.assert_allclose(chk["m0"], chk["m1"], rtol=1e-9)


def test_double_rotation_matches_pandas_math(spark):
    """Row-exact check against the reference's two-step mean-wind math."""
    pdf = pd.DataFrame(
        {
            "k": ["s"] * 5,
            "u": [2.0, 2.2, 1.9, 2.1, 2.0],
            "v": [0.5, 0.4, 0.6, 0.5, 0.45],
            "w": [0.1, -0.1, 0.05, 0.0, 0.02],
        }
    )
    a1 = math.atan(pdf["v"].mean() / pdf["u"].mean())
    u_temp_m = pdf["u"].mean() * math.cos(a1) + pdf["v"].mean() * math.sin(a1)
    a2 = math.atan(pdf["w"].mean() / u_temp_m)
    u_temp = pdf["u"] * math.cos(a1) + pdf["v"] * math.sin(a1)
    exp_u = u_temp * math.cos(a2) + pdf["w"] * math.sin(a2)
    exp_v = -pdf["u"] * math.sin(a1) + pdf["v"] * math.cos(a1)
    exp_w = -u_temp * math.sin(a2) + pdf["w"] * math.cos(a2)

    got = (
        WIND.double_rotation(spark.createDataFrame(pdf.reset_index()), "k")
        .orderBy("index")
        .toPandas()
    )
    np.testing.assert_allclose(got["u_rot"], exp_u, rtol=1e-12)
    np.testing.assert_allclose(got["v_rot"], exp_v, rtol=1e-12)
    np.testing.assert_allclose(got["w_rot"], exp_w, rtol=1e-12)


def test_eddypro_digit_flag(spark):
    """eddyproflags.py:91-98: fillna 89, take str digit [1], 9->NaN, 1->2."""
    pdf = pd.DataFrame({"i": range(5), "raw": [80.0, 81.0, 89.0, np.nan, 82.0]})
    got = (
        spark.createDataFrame(pdf)
        .select("i", FC.eddypro_digit_flag("raw").alias("f"))
        .orderBy("i")
        .toPandas()["f"]
    )
    # 80->0, 81->2 (1 means bad -> hard 2), 89->null, nan->89->null, 82->2
    assert got.iloc[0] == 0 and got.iloc[1] == 2 and got.iloc[4] == 2
    assert pd.isna(got.iloc[2]) and pd.isna(got.iloc[3])


def test_flux_chain_levels(spark):
    """Crafted rows exercise every level of the chain."""
    pdf = pd.DataFrame(
        {
            "i": range(6),
            "k": ["g"] * 6,
            "flux": [1.0, 2.0, 100.0, 1.5, np.nan, 1.2],
            "storage": [0.1] * 6,
            "raw": [80.0, 81.0, 80.0, 80.0, 80.0, 80.0],
        }
    )
    out = (
        FC.flux_chain(
            spark.createDataFrame(pdf),
            key_col="k",
            flux_col="flux",
            storage_col="storage",
            raw_flag_col="raw",
            abs_min=-50.0,
            abs_max=50.0,
            zscore_thres=10.0,
        )
        .orderBy("i")
        .toPandas()
    )
    # row1: vm97 digit 1 -> hard flag 2 -> hardsum 2 -> QCF 2 (qcf.py ladder);
    # row2: abslim (100 > 50) -> same
    assert out.loc[1, "qcf_l2"] == 2
    assert out.loc[2, "qcf_l2"] == 2
    assert out.loc[0, "qcf_l2"] == 0
    # L2-rejected rows have null corrected flux
    assert pd.isna(out.loc[1, "flux_l31"]) and pd.isna(out.loc[2, "flux_l31"])
    # clean row: flux + storage
    assert out.loc[0, "flux_l31"] == pytest.approx(1.1)
    # nan flux propagates
    assert pd.isna(out.loc[4, "flux_l31"])


def test_ustar_mpt_finds_saturation_point(spark):
    """NEE saturates above ustar=0.3 by construction; every TA class
    threshold must land near 0.3, and the corr screen drops classes
    where TA and USTAR are (deliberately) correlated."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.ustar import ustar_mpt_thresholds

    rng = np.random.default_rng(5)
    n = 6000
    ustar = rng.uniform(0, 1, n)
    ta = rng.uniform(0, 30, n)
    nee = np.minimum(ustar / 0.3, 1.0) * 5 + rng.normal(0, 0.05, n)
    pdf = pd.DataFrame(
        {"nee": nee, "ta": ta, "ustar": ustar, "rid": np.arange(n)}
    )
    out = ustar_mpt_thresholds(
        spark.createDataFrame(pdf), "nee", "ta", "ustar", "rid",
        n_ta_classes=5, n_ustar_classes=20,
    ).toPandas()
    assert len(out) == 5
    # plateau detection: thresholds in the saturation onset region
    assert (out["threshold"].between(0.2, 0.55)).all()
    assert out["season_threshold"].nunique() == 1
    assert out["season_threshold"].iloc[0] == out["threshold"].max()

    # correlation screen: make ustar a function of ta -> |corr| ~ 1,
    # classes excluded, season threshold null
    pdf2 = pdf.copy()
    pdf2["ustar"] = pdf2["ta"] / 30.0
    out2 = ustar_mpt_thresholds(
        spark.createDataFrame(pdf2), "nee", "ta", "ustar", "rid",
        n_ta_classes=5, n_ustar_classes=10, max_ta_ustar_corr=0.4,
    ).toPandas()
    assert (out2["included"] == 0).all()
    assert out2["season_threshold"].isna().all()
