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
