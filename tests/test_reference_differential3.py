"""Differential batch 3: value-rewriting corrections vs the reference."""

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


def test_rh_offset_matches_reference(spark):
    from diive.pkgs.corrections.offsetcorrection import (
        remove_relativehumidity_offset,
    )

    from diive_spark.operators.corrections import rh_offset_correction

    rng = np.random.RandomState(21)
    n = 480  # 10 days @ 30min
    idx = pd.date_range("2024-03-01", periods=n, freq="30min", name="TIMESTAMP_END")
    s = pd.Series(rng.uniform(60, 98, n), index=idx, name="RH")
    # exceedances on days 2 and 7 only -> interpolation spans days 3-6
    s.iloc[96:110] += 10.0
    s.iloc[336:350] += 6.0
    want = remove_relativehumidity_offset(series=s.copy(), showplot=False)

    slot = (idx.astype("int64") // 10**9).astype("int64")
    day = (slot // 86400) * 86400
    pdf = pd.DataFrame(
        {"key": "k", "slot_s": slot, "day_s": day, "v": s.values}
    )
    got = (
        rh_offset_correction(
            spark.createDataFrame(pdf), "key", "day_s", "v",
            order_cols=["slot_s"], out_col="v_corr",
        )
        .orderBy("slot_s")
        .toPandas()["v_corr"]
        .to_numpy()
    )
    np.testing.assert_allclose(got, want.to_numpy(), rtol=1e-12)


def test_radiation_offset_matches_reference(spark):
    from diive.pkgs.corrections.offsetcorrection import (
        remove_radiation_zero_offset,
    )

    from diive_spark.functions.meteo import nighttime_flag, swin_pot
    from diive_spark.operators.corrections import radiation_offset_correction

    rng = np.random.RandomState(5)
    n = 480  # 10 FULL days @ 30min -> every day has nighttime data
    idx = pd.date_range("2024-06-01 00:30", periods=n, freq="30min",
                        name="TIMESTAMP_END")
    lat, lon, off = 47.286417, 7.733750, 1
    sw = ref.potrad(timestamp_index=idx, lat=lat, lon=lon, utc_offset=off)
    base = sw.to_numpy() * 0.8 + rng.normal(3.0, 1.5, n)
    s = pd.Series(base, index=idx, name="SWIN")
    want = remove_radiation_zero_offset(
        series=s.copy(), lat=lat, lon=lon, utc_offset=off, showplot=False
    )

    slot = (idx.astype("int64") // 10**9).astype("int64")
    day = (slot // 86400) * 86400
    pdf = pd.DataFrame({"key": "k", "slot_s": slot, "day_s": day, "v": s.values,
                        "ts": idx})
    sdf = spark.createDataFrame(pdf).withColumn(
        "is_night", nighttime_flag(swin_pot("ts", lat, lon, off))
    )
    got = (
        radiation_offset_correction(
            sdf, "key", "day_s", "v", "is_night", out_col="v_corr"
        )
        .orderBy("slot_s")
        .toPandas()["v_corr"]
        .to_numpy()
    )
    np.testing.assert_allclose(got, want.to_numpy(), rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# F12 — EddyPro Level-2 flags vs the imported reference (eddyproflags.py)
# ---------------------------------------------------------------------------

def _l2_fixture(n=400, seed=7):
    rng = np.random.default_rng(seed)
    idx = pd.date_range("2024-03-01", periods=n, freq="30min")
    df = pd.DataFrame(index=idx)
    # fluxnet VM97 packed integer with digits 0/1/9 + missing rows
    digits = rng.integers(0, 3, size=(n, 8))
    digits = np.where(digits == 2, 9, digits)
    vm97 = 8 * 10**8 + (digits * (10 ** np.arange(7, -1, -1))).sum(axis=1)
    vm97 = vm97.astype(float)
    vm97[rng.random(n) < 0.1] = np.nan
    df["CO2_VM97_TEST"] = vm97
    aoa = rng.choice([80.0, 81.0, 89.0, np.nan], size=n)
    df["VM97_AOA_HF"] = aoa
    df["VM97_NSHW_HF"] = rng.choice([80.0, 81.0, 89.0, np.nan], size=n)
    df["SS"] = rng.uniform(0, 100, n)
    df.loc[rng.random(n) < 0.05, "SS"] = np.nan
    df["FC_SCF"] = rng.uniform(0.5, 6.0, n)
    df["EXPECT_NR"] = 36000
    df["CO2_NR"] = (36000 * rng.uniform(0.9, 1.0, n)).round()
    df["FC_SSITC_TEST"] = rng.integers(0, 3, n).astype(float)
    return df


def _spark_flags(spark, pdf):
    from diive_spark.operators import eddypro as EP

    sdf = spark.createDataFrame(pdf.reset_index(names="ts"))
    out = sdf.select(
        "ts",
        *[c.alias(n) for n, c in EP.vm97_fluxnet_flags(
            "CO2_VM97_TEST", spikes=True, amplitude=True, dropout=True,
            abslim=True, skewkurt_hf=True, skewkurt_sf=True,
            discont_hf=True, discont_sf=True,
        ).items()],
        EP.flag_angle_of_attack("VM97_AOA_HF").alias("aoa"),
        EP.flag_steadiness_horizontal_wind("VM97_NSHW_HF").alias("nshw"),
        EP.flag_signal_strength("SS", "discard below", 40).alias("ss_below"),
        EP.flag_signal_strength("SS", "discard above", 60).alias("ss_above"),
        EP.flag_spectral_correction_factor("FC_SCF").alias("scf"),
        EP.flag_gas_completeness("CO2_NR", "EXPECT_NR").alias("compl"),
        EP.flag_ssitc("FC_SSITC_TEST").alias("ssitc"),
    )
    return out.toPandas().set_index("ts").sort_index()


def test_eddypro_level2_flags_match_reference(spark):
    epf = ref.eddyproflags
    pdf = _l2_fixture()
    got = _spark_flags(spark, pdf)

    vm97 = epf.flags_vm97_eddypro_fluxnetfile_tests(
        df=pdf, units=None, flux="FC", gas="CO2",
        spikes=True, amplitude=True, dropout=True, abslim=True,
        skewkurt_hf=True, skewkurt_sf=True, discont_hf=True, discont_sf=True,
    )
    name_map = {
        "flag_vm97_spike_hf": "FLAGNone_FC_CO2_VM97_SPIKE_HF_TEST",
        "flag_vm97_amplitude_resolution_hf": "FLAGNone_FC_CO2_VM97_AMPLITUDE_RESOLUTION_HF_TEST",
        "flag_vm97_dropout": "FLAGNone_FC_CO2_VM97_DROPOUT_TEST",
        "flag_vm97_absolute_limits_hf": "FLAGNone_FC_CO2_VM97_ABSOLUTE_LIMITS_HF_TEST",
        "flag_vm97_skewkurt_hf": "FLAGNone_FC_CO2_VM97_SKEWKURT_HF_TEST",
        "flag_vm97_skewkurt_sf": "FLAGNone_FC_CO2_VM97_SKEWKURT_SF_TEST",
        "flag_vm97_discontinuities_hf": "FLAGNone_FC_CO2_VM97_DISCONTINUITIES_HF_TEST",
        "flag_vm97_discontinuities_sf": "FLAGNone_FC_CO2_VM97_DISCONTINUITIES_SF_TEST",
    }
    for ours, theirs in name_map.items():
        np.testing.assert_array_equal(
            got[ours].astype(float).values, vm97[theirs].astype(float).values,
            err_msg=ours,
        )

    aoa = epf.flag_angle_of_attack_eddypro_test(
        df=pdf, flux="FC", filetype="EDDYPRO-FLUXNET-30MIN")
    np.testing.assert_array_equal(got["aoa"].astype(float).values, aoa.values)
    nshw = epf.flag_steadiness_horizontal_wind_eddypro_test(
        df=pdf, flux="FC", filetype="EDDYPRO-FLUXNET-30MIN")
    np.testing.assert_array_equal(got["nshw"].astype(float).values, nshw.values)

    for method, thr, col in (("discard below", 40, "ss_below"), ("discard above", 60, "ss_above")):
        ss = epf.flag_signal_strength_eddypro_test(
            df=pdf, signal_strength_col="SS", var_col="FC",
            method=method, threshold=thr)
        np.testing.assert_array_equal(got[col].astype(float).values, ss.values, err_msg=col)

    scf = epf.flag_spectral_correction_factor_eddypro_test(
        df=pdf, flux="FC", gas="CO2", filetype="EDDYPRO-FLUXNET-30MIN")
    np.testing.assert_array_equal(got["scf"].astype(float).values, scf.values)

    compl = epf.flag_gas_completeness_eddypro_test(
        df=pdf, flux="FC", gas="CO2", filetype="EDDYPRO-FLUXNET-30MIN")
    np.testing.assert_array_equal(got["compl"].astype(float).values, compl.values)

    ssitc = epf.flag_ssitc_eddypro_test(
        df=pdf, flux="FC", filetype="EDDYPRO-FLUXNET-30MIN")
    np.testing.assert_array_equal(got["ssitc"].astype(float).values, ssitc.values)


# ---------------------------------------------------------------------------
# T6 — DetectFrequency 3-way reconcile vs the imported reference
# ---------------------------------------------------------------------------

def _freq_to_seconds(freq: str | None) -> float | None:
    if freq is None:
        return None
    off = pd.tseries.frequencies.to_offset(freq)
    return pd.to_timedelta(off).total_seconds()


def test_detect_frequency_reconcile_matches_reference(spark):
    from diive_spark.operators.analytics import freq_detect_reconciled

    base = pd.Timestamp("2024-01-01")
    cases = {}
    # regular -> all three agree (max)
    cases["regular"] = base + pd.to_timedelta(np.arange(200) * 600, unit="s")
    # sparse perturbation -> full fails, mode + progressive succeed (high)
    t = np.arange(200) * 600
    t[::37] += 7
    t.sort()
    cases["mostly"] = base + pd.to_timedelta(t, unit="s")
    # clean ends, noisy middle below 90% -> progressive only (medium)
    t2 = np.arange(200) * 600.0
    t2[20:120:3] += 211
    cases["ends"] = base + pd.to_timedelta(t2, unit="s")

    frames = []
    for i, (name, idx) in enumerate(cases.items()):
        frames.append(pd.DataFrame({"key": name, "ts": idx}))
    sdf = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    got = (
        freq_detect_reconciled(sdf, "key", "ts")
        .toPandas()
        .set_index("key")
    )

    import diive.core.times.times as T

    for name, idx in cases.items():
        idx = pd.DatetimeIndex(idx)
        f_full = _freq_to_seconds(T.timestamp_infer_freq_from_fullset(idx)[0])
        f_td = _freq_to_seconds(T.timestamp_infer_freq_from_timedelta(idx)[0])
        f_prog = _freq_to_seconds(T.timestamp_infer_freq_progressively(idx)[0])
        row = got.loc[name]

        def _eq(a, b):
            return pd.isna(a) if b is None else a == b

        assert _eq(row["freq_full_s"], f_full), (name, "full")
        assert _eq(row["freq_mode_s"], f_td), (name, "timedelta")
        assert _eq(row["freq_prog_s"], f_prog), (name, "progressive")

    # confidence tiers as per the reference's branch order
    assert got.loc["regular", "confidence"] == "max"
    assert got.loc["mostly", "confidence"] == "high"
    assert got.loc["ends", "confidence"] == "medium"

    # REFERENCE BUG (documented deviation): on modern pandas the
    # reference's timedelta path emits the legacy alias ('10T') while
    # infer_freq emits '10min', so its STRING-set reconcile sees a fake
    # disagreement on a perfectly regular grid and DetectFrequency
    # returns None (times.py:664-672). Our reconcile compares NUMERIC
    # seconds, so agreement is detected correctly.
    assert ref.DetectFrequency(index=pd.DatetimeIndex(cases["regular"])).get() is None
    assert got.loc["regular", "freq_s"] == 600.0


# ---------------------------------------------------------------------------
# F11 — FlagQCF daytime/nighttime acceptance vs the imported reference
# ---------------------------------------------------------------------------

def test_qcf_daynight_acceptance_matches_reference(spark):
    from diive_spark.operators import flags as FL

    rng = np.random.default_rng(11)
    n = 300
    idx = pd.date_range("2024-06-01", periods=n, freq="30min")
    val = rng.uniform(0, 100, n)
    val[rng.random(n) < 0.05] = np.nan
    # swinpot: deterministic diel cycle so both day and night appear
    swinpot = np.maximum(
        0.0, 600 * np.sin((idx.hour * 60 + idx.minute) / 1440 * 2 * np.pi - np.pi / 2)
    )
    hard = np.where(np.isnan(val), 0, np.where((val < 5) | (val > 95), 2, 0))
    soft = np.where(np.arange(n) % 5 == 0, 1, 0)
    missing = np.where(np.isnan(val), 2, 0)

    refdf = pd.DataFrame(
        {
            "VAL": val,
            "FLAG_VAL_MISSING_TEST": missing.astype(float),
            "FLAG_VAL_ABSLIM_TEST": hard.astype(float),
            "FLAG_VAL_SOFT_TEST": soft.astype(float),
        },
        index=idx,
    )
    qcf = ref.FlagQCF(
        df=refdf, series=refdf["VAL"], swinpot=pd.Series(swinpot, index=idx)
    )
    qcf.calculate(daytime_accept_qcf_below=1, nighttimetime_accept_qcf_below=2)
    want = qcf.flagqcf

    sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "i": np.arange(n),
                "value": val,
                "flag_missing": missing,
                "flag_abslim": hard,
                "flag_soft": soft,
                # the reference derives day/night from swinpot >= 50
                "is_day": (swinpot >= 50).astype(int),
                "is_night": (swinpot < 50).astype(int),
            }
        )
    )
    got = (
        FL.add_qcf_daynight(
            sdf,
            ["flag_missing", "flag_abslim", "flag_soft"],
            value_col="value",
            daytime_col="is_day",
            nighttime_col="is_night",
            daytime_accept_qcf_below=1,
            nighttime_accept_qcf_below=2,
        )
        .orderBy("i")
        .toPandas()
    )
    np.testing.assert_array_equal(
        got["qcf"].astype(float).values, want.astype(float).values
    )
    # filtered series: rejected -> missing
    filt = qcf.filteredseries
    np.testing.assert_allclose(
        got["value_qcf"].values, filt.values, equal_nan=True
    )


# ---------------------------------------------------------------------------
# A8 — Histogram method='uniques' + fringe trim vs the imported reference
# ---------------------------------------------------------------------------

def test_histogram_uniques_fringe_matches_reference(spark):
    from diive_spark.operators.analytics import histogram_fixed_bins, histogram_uniques

    rng = np.random.default_rng(5)
    vals = np.floor(rng.normal(50, 15, 800)).astype(float)
    s = pd.Series(vals)
    sdf = spark.createDataFrame(
        pd.DataFrame({"key": 1, "v": vals})
    )

    for fringe in (None, (1, 2)):
        want = ref.Histogram(
            s=s, method="uniques",
            ignore_fringe_bins=list(fringe) if fringe else None,
        ).results
        got = (
            histogram_uniques(sdf, "key", "v", ignore_fringe=fringe)
            .orderBy("bin_start_incl")
            .toPandas()
        )
        np.testing.assert_allclose(
            got["bin_start_incl"].values, want["BIN_START_INCL"].values,
            err_msg=f"edges fringe={fringe}",
        )
        np.testing.assert_array_equal(
            got["counts"].values, want["COUNTS"].values,
            err_msg=f"counts fringe={fringe}",
        )

    # fixed-bin fringe trim vs numpy n_bins histogram (empty bins absent
    # from the Spark result by construction — compare non-empty only)
    want = ref.Histogram(s=s, method="n_bins", n_bins=20,
                         ignore_fringe_bins=[2, 3]).results
    want = want[want["COUNTS"] > 0]
    got = (
        histogram_fixed_bins(sdf, "key", "v", n_bins=20, ignore_fringe=(2, 3))
        .orderBy("bin")
        .toPandas()
    )
    np.testing.assert_allclose(got["bin_lo"].values, want["BIN_START_INCL"].values, rtol=1e-9)
    np.testing.assert_array_equal(got["n"].values, want["COUNTS"].values)
