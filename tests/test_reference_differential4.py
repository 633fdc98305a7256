"""Differential batch 4: flux heat-day analytics vs the imported reference.

FluxCriticalHeatDaysP95 (/root/reference/diive/pkgs/flux/criticalheatdays.py)
runs pure pandas end-to-end (plotting only lives in show* methods), so the
whole .run() pipeline — daily aggregation, 20-quantile xy binning, combined
bins, scenario subsets, thresholds — can be compared directly against our
Spark pipeline (operators/heatdays.py).

qcut-vs-ntile note: with all-distinct daily aggregates and n_days divisible
by n_quantiles, pd.qcut and ntile produce identical bin assignment, so the
comparison is exact (same convention as the A9/A10 oracle queries).
"""

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


def _hires_frame(n_days: int = 400, seed: int = 31) -> pd.DataFrame:
    """30-min TA/VPD/flux where VPD tracks TA (so diagonal combo bins are
    populated, as in real data) and every daily aggregate is distinct."""
    rng = np.random.RandomState(seed)
    idx = pd.date_range("2018-01-01", periods=n_days * 48, freq="30min",
                        name="TIMESTAMP_END")
    doy = idx.dayofyear.values
    season = 10.0 * np.sin(2 * np.pi * (doy - 110) / 365.25)
    ta = 12.0 + season + rng.normal(0, 3.0, len(idx))
    vpd = np.maximum(0.05, 0.4 + 0.35 * (ta - 5.0) + rng.normal(0, 0.8, len(idx)))
    flux = -2.0 + 0.3 * ta - 0.02 * ta**2 + rng.normal(0, 0.5, len(idx))
    return pd.DataFrame({"TA": ta, "VPD": vpd, "FLUX": flux}, index=idx)


def test_co2_penalty_limit_steps_match_reference(spark):
    """CO2penalty's full .run() needs sklearn + live matplotlib (stubbed
    here), but its counterfactual core is pandas-pure and testable piecewise:
    daily-max insertion (_insert_aggregates_into_hires), CHD/nCHD masks
    (_get_hires_chd_data/_get_hires_nchd_data), and the nCHD diel-cycle TA
    template (_diel_cycle).  Only the merge/fillna glue between them
    (co2_penalty.py:331-346, sandwiched between gapfill/plot calls) is
    replicated inline."""
    from diive.pkgs.flux.co2_penalty import CO2penalty

    from diive_spark.operators.co2penalty import co2_penalty_hires

    pdf = _hires_frame(n_days=200, seed=47).rename(
        columns={"FLUX": "NEE"}
    )
    rng = np.random.RandomState(48)
    pdf["RH"] = np.clip(85.0 - 2.5 * pdf["TA"] + rng.normal(0, 4, len(pdf)), 5, 100)
    pdf["SWIN"] = np.maximum(
        0.0, 400 * np.sin(np.pi * (pdf.index.hour * 60 + pdf.index.minute) / 1440.0) ** 2
        + rng.normal(0, 20, len(pdf))
    )
    # pre-existing TA gaps exercise the template's fillna-everything quirk
    pdf.loc[pdf.index[1000:1010], "TA"] = np.nan

    dmax = pdf[["TA", "VPD"]].resample("D").max()
    thr_ta, thr_vpd = dmax["TA"].quantile(0.95), dmax["VPD"].quantile(0.95)
    nchd_ta = (dmax["TA"].quantile(0.80), dmax["TA"].quantile(0.95))
    nchd_vpd = (dmax["VPD"].quantile(0.80), dmax["VPD"].quantile(0.95))

    cp = CO2penalty(
        df=pdf, vpd_col="VPD", nee_col="NEE", swin_col="SWIN",
        ta_col="TA", rh_col="RH",
        thres_chd_ta=float(thr_ta), thres_chd_vpd=float(thr_vpd),
        thres_nchd_ta=(float(nchd_ta[0]), float(nchd_ta[1])),
        thres_nchd_vpd=(float(nchd_vpd[0]), float(nchd_vpd[1])),
        penalty_start_month=5, penalty_end_month=9,
    )
    hires = cp.df.copy()
    hires, ta_name, vpd_name = cp._insert_aggregates_into_hires(hires_df=hires)
    _, locs_chd = cp._get_hires_chd_data(hires, ta_name, vpd_name)
    nchd_df, locs_nchd = cp._get_hires_nchd_data(hires, ta_name, vpd_name)
    assert locs_chd.sum() > 0 and locs_nchd.sum() > 0
    diel = cp._diel_cycle(data=nchd_df["TA"], agg="median")
    tpl_by_time = diel["_TEMPLATE_TA"].to_dict()
    tpl = pd.Series(hires.index.time, index=hires.index).map(tpl_by_time)
    ta_lim_ref = hires["TA"].where(~locs_chd, np.nan).fillna(tpl)

    got = (
        co2_penalty_hires(
            spark.createDataFrame(pdf.reset_index()),
            ts_col="TIMESTAMP_END", nee_col="NEE", ta_col="TA", rh_col="RH",
            swin_col="SWIN", vpd_col="VPD",
            thres_chd_ta=float(thr_ta), thres_chd_vpd=float(thr_vpd),
            thres_nchd_ta=(float(nchd_ta[0]), float(nchd_ta[1])),
            thres_nchd_vpd=(float(nchd_vpd[0]), float(nchd_vpd[1])),
        )
        .toPandas()
        .set_index("TIMESTAMP_END")
        .sort_index()
    )
    np.testing.assert_array_equal(got["flag_chd"].values, locs_chd.values.astype(int))
    np.testing.assert_array_equal(got["flag_nchd"].values, locs_nchd.values.astype(int))
    np.testing.assert_allclose(got["_ta_dmax"].values, hires[ta_name].values)
    np.testing.assert_allclose(got["_vpd_dmax"].values, hires[vpd_name].values)
    np.testing.assert_allclose(got["ta_limited"].values, ta_lim_ref.values)
    # NEP unit conversion + sign (co2_penalty.py:78-83)
    np.testing.assert_allclose(got["nep"].values, cp.df["NEP"].values)


def test_critical_heat_days_matches_reference(spark):
    from diive.pkgs.flux.criticalheatdays import FluxCriticalHeatDaysP95

    from diive_spark.operators.heatdays import (
        assign_percentile_bins,
        chd_thresholds,
        combo_bin_stats,
    )

    pdf = _hires_frame()
    chd = FluxCriticalHeatDaysP95(
        df=pdf, ta_col="TA", vpd_col="VPD", flux_col="FLUX",
        additional_cols=["TA"],  # None crashes _create_subset; dup is dropped
    )
    chd.run(bins_min_n_vals=2, verbose=False)
    res = chd.get_results()

    # --- our pipeline: same daily aggs -> bins -> stats, all in Spark
    sdf = spark.createDataFrame(pdf.reset_index())
    daily = sdf.groupBy(
        F.date_format("TIMESTAMP_END", "yyyy-MM-dd").alias("date")
    ).agg(
        F.max("TA").alias("ta"),
        F.max("VPD").alias("vpd"),
        F.sum("FLUX").alias("flux"),
    )
    long_df = assign_percentile_bins(
        daily, "ta", "vpd", "flux", date_col="date",
        n_quantiles=20, min_n_vals_per_bin=2,
    ).cache()

    # thresholds + day counts
    t = chd_thresholds(long_df, "ta", "vpd").collect()[0]
    assert np.isclose(t["thres_chd_ta"], res["thres_chd_ta"])
    assert np.isclose(t["thres_chd_vpd"], res["thres_chd_vpd"])
    assert np.isclose(t["thres_nchd_ta_lo"], res["thres_nchd_ta"][0])
    assert np.isclose(t["thres_nchd_ta_hi"], res["thres_nchd_ta"][1])
    assert np.isclose(t["thres_nchd_vpd_lo"], res["thres_nchd_vpd"][0])
    assert np.isclose(t["thres_nchd_vpd_hi"], res["thres_nchd_vpd"][1])
    n_chd_ref = len(res["xyz_long_extended_criticalheatdays_df"])
    n_nchd_ref = len(res["xyz_long_extended_nearcriticalheatdays_df"])
    assert t["n_chd"] == n_chd_ref and n_chd_ref > 0
    assert t["n_nchd"] == n_nchd_ref and n_nchd_ref > 0

    # combined-bin flux stats, every scenario incl. the reference's
    # overlapping vpdhigher quirk (BIN_DIFF < 5 keeps equal rows too)
    stats = combo_bin_stats(long_df, "ta", "vpd", "flux").toPandas()
    ref_frames = {
        "all": res["combobins_df"],
        "equal": res["combobins_bins_equal_df"],
        "tahigher": res["combobins_bins_tahigher_df"],
        "vpdhigher": res["combobins_bins_vpdhigher_df"],
    }
    for scen, rf in ref_frames.items():
        got = (
            stats[stats["scenario"] == scen]
            .set_index("bins_combined_int")
            .sort_index()
        )
        assert set(got.index) == set(rf.index), scen
        for b in rf.index:
            assert np.isclose(got.loc[b, "flux_mean"], rf.loc[b, ("FLUX_sum", "mean")]), (scen, b)
            std_ref = rf.loc[b, ("FLUX_sum", "std")]
            if np.isnan(std_ref):
                assert np.isnan(got.loc[b, "flux_std"]), (scen, b)
            else:
                assert np.isclose(got.loc[b, "flux_std"], std_ref), (scen, b)
            assert got.loc[b, "n"] == rf.loc[b, ("FLUX_sum", "count")], (scen, b)
            assert np.isclose(got.loc[b, "ta_min"], rf.loc[b, ("TA_max", "min")]), (scen, b)
            assert np.isclose(got.loc[b, "ta_max"], rf.loc[b, ("TA_max", "max")]), (scen, b)
            assert np.isclose(got.loc[b, "vpd_min"], rf.loc[b, ("VPD_max", "min")]), (scen, b)
            assert np.isclose(got.loc[b, "vpd_max"], rf.loc[b, ("VPD_max", "max")]), (scen, b)
    long_df.unpersist()
