"""Classical decomposition vs an independent numpy replay (the
statsmodels seasonal_decompose algebra) and CUSUM's closed form vs the
textbook sequential recursion — including a must-fire injected shift."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators.seasonal import classical_decompose, cusum_flags

P = 24


def _series(n=8 * P, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    y = (
        10.0
        + 0.01 * t                      # trend
        + 3.0 * np.sin(2 * np.pi * t / P)  # diel cycle
        + rng.normal(0, 0.3, n)
    )
    ts = 1_700_000_000 - 1_700_000_000 % 3600 + t * 3600
    return ts, y


def _np_decompose(ts, y, p=P):
    n = len(y)
    h = p // 2
    trend = np.full(n, np.nan)
    for i in range(h, n - h):
        win = y[i - h : i + h + 1]
        trend[i] = (win.sum() - 0.5 * win[0] - 0.5 * win[-1]) / p
    detr = y - trend
    phase = (ts // 3600) % p
    sraw = np.array(
        [np.nanmean(detr[phase == q]) for q in range(p)]
    )
    seasonal = sraw - sraw.mean()
    resid = y - trend - seasonal[phase]
    return trend, seasonal[phase], resid


def test_classical_decompose_matches_numpy(spark):
    ts, y = _series()
    df = spark.createDataFrame(
        pd.DataFrame({"ts_s": ts, "y": y})
    ).repartition(8)
    got = (
        classical_decompose(df, ts_col="ts_s", value_col="y", period=P)
        .orderBy("ts_s")
        .toPandas()
    )
    trend, seasonal, resid = _np_decompose(ts, y)
    np.testing.assert_allclose(
        got["trend"].to_numpy(dtype=float), trend, rtol=1e-10
    )
    np.testing.assert_allclose(got["seasonal"], seasonal, rtol=1e-10)
    np.testing.assert_allclose(
        got["resid"].to_numpy(dtype=float), resid, rtol=1e-9
    )
    # the recovered cycle actually explains the injected sin amplitude
    assert got["seasonal"].max() == pytest.approx(3.0, abs=0.35)
    # edges have no trend (incomplete 2h+1 neighborhood), interior does
    assert got["trend"].isna().sum() == P


def test_classical_decompose_grouped_keys(spark):
    ts, y = _series(n=4 * P, seed=7)
    pdf = pd.concat(
        [
            pd.DataFrame({"k": "a", "ts_s": ts, "y": y}),
            pd.DataFrame({"k": "b", "ts_s": ts, "y": y * 2 + 1}),
        ]
    )
    df = spark.createDataFrame(pdf).repartition(8)
    got = classical_decompose(
        df, ts_col="ts_s", value_col="y", period=P, by=["k"]
    )
    a = got.filter(F.col("k") == "a").orderBy("ts_s").toPandas()
    b = got.filter(F.col("k") == "b").orderBy("ts_s").toPandas()
    # linearity: decomposition of 2y+1 is 2*trend+1, 2*seasonal, 2*resid
    np.testing.assert_allclose(
        b["trend"], 2 * a["trend"] + 1, rtol=1e-9
    )
    np.testing.assert_allclose(
        b["seasonal"], 2 * a["seasonal"], rtol=1e-9, atol=1e-12
    )


def _np_cusum(y, k=0.5, h=5.0):
    z = (y - y.mean()) / y.std(ddof=1)
    s_up = np.zeros(len(y))
    s_dn = np.zeros(len(y))
    su = sd = 0.0
    for i, zi in enumerate(z):
        su = max(0.0, su + zi - k)
        sd = max(0.0, sd - zi - k)
        s_up[i], s_dn[i] = su, sd
    prev_up = np.concatenate([[0.0], s_up[:-1]])
    prev_dn = np.concatenate([[0.0], s_dn[:-1]])
    alarm = ((s_up > h) & (prev_up <= h)) | ((s_dn > h) & (prev_dn <= h))
    return s_up, s_dn, alarm.astype(int)


def test_cusum_closed_form_equals_recursion(spark):
    rng = np.random.default_rng(11)
    y = rng.normal(0, 1, 300)
    y[180:] += 2.5  # injected upward mean shift
    ts = np.arange(300) * 3600
    df = spark.createDataFrame(
        pd.DataFrame({"ts_s": ts, "y": y})
    ).repartition(8)
    got = (
        cusum_flags(df, ts_col="ts_s", value_col="y")
        .orderBy("ts_s")
        .toPandas()
    )
    s_up, s_dn, alarm = _np_cusum(y)
    np.testing.assert_allclose(got["s_up"], s_up, atol=1e-9)
    np.testing.assert_allclose(got["s_dn"], s_dn, atol=1e-9)
    np.testing.assert_array_equal(got["alarm"], alarm)
    # the injected shift must fire, and not before it happens
    fired = np.flatnonzero(got["alarm"].to_numpy())
    assert len(fired) >= 1
    assert any(f >= 180 for f in fired)


def test_cusum_per_key_independence(spark):
    rng = np.random.default_rng(12)
    y1 = rng.normal(0, 1, 200)
    y2 = rng.normal(5, 2, 200)
    y2[100:] -= 6.0  # downward shift in key b only
    ts = np.arange(200) * 3600
    pdf = pd.concat(
        [
            pd.DataFrame({"k": "a", "ts_s": ts, "y": y1}),
            pd.DataFrame({"k": "b", "ts_s": ts, "y": y2}),
        ]
    )
    got = (
        cusum_flags(
            spark.createDataFrame(pdf).repartition(8),
            ts_col="ts_s", value_col="y", by=["k"],
        )
        .orderBy("k", "ts_s")
        .toPandas()
    )
    for key, y in (("a", y1), ("b", y2)):
        sub = got[got["k"] == key]
        s_up, s_dn, alarm = _np_cusum(y)
        np.testing.assert_allclose(sub["s_up"], s_up, atol=1e-9)
        np.testing.assert_array_equal(sub["alarm"], alarm)
    assert got[got["k"] == "b"]["alarm"].sum() >= 1
