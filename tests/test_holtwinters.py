"""Holt-Winters kernel (operators/holtwinters.py): distributed output ==
standalone numpy recursion; forecasts track a noiseless seasonal+trend
series; short series are dropped."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators.holtwinters import holt_winters, hw_fit_numpy

PERIOD = 12


def _series(n, seed=5, noise=0.5):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    y = 50 + 0.1 * t + 8 * np.sin(2 * np.pi * t / PERIOD)
    return np.round(y + rng.normal(0, noise, n), 4)


def test_kernel_matches_standalone_numpy(spark):
    n = 96
    y = _series(n)
    pdf = pd.DataFrame({"k": "a", "ts_s": np.arange(n) * 3600, "y": y})
    out = (
        holt_winters(
            spark.createDataFrame(pdf), key_cols=["k"], ts_col="ts_s",
            value_col="y", period=PERIOD, horizon=6,
        ).toPandas().sort_values(["kind", "ts_s"]).reset_index(drop=True)
    )
    fitted, fc = hw_fit_numpy(y, PERIOD, 0.3, 0.1, 0.2, 6)
    fit = out[out["kind"] == "fit"].sort_values("ts_s")
    assert len(fit) == n
    got = fit["yhat"].to_numpy()
    mask = ~np.isnan(fitted)
    assert np.allclose(got[mask], fitted[mask], rtol=0, atol=1e-12)
    assert np.isnan(got[~mask]).all()
    fcr = out[out["kind"] == "fc"].sort_values("ts_s")
    assert len(fcr) == 6
    assert np.allclose(fcr["yhat"].to_numpy(), fc, atol=1e-12)
    # forecast timestamps continue at the series step
    assert fcr["ts_s"].tolist() == [(n + h) * 3600 for h in range(0, 6)]


def test_forecast_tracks_noiseless_truth(spark):
    n = 120
    t = np.arange(n + 12)
    truth = 10 + 0.2 * t + 5 * np.sin(2 * np.pi * t / PERIOD)
    pdf = pd.DataFrame({"k": "a", "ts_s": np.arange(n), "y": truth[:n]})
    out = holt_winters(
        spark.createDataFrame(pdf), key_cols=["k"], ts_col="ts_s",
        value_col="y", period=PERIOD, horizon=12, step=1,
    ).toPandas()
    fc = out[out["kind"] == "fc"].sort_values("ts_s")["yhat"].to_numpy()
    assert np.abs(fc - truth[n:]).max() < 1.0  # tight on a clean signal


def test_short_series_dropped(spark):
    pdf = pd.DataFrame({"k": "a", "ts_s": np.arange(10), "y": np.ones(10)})
    out = holt_winters(
        spark.createDataFrame(pdf), key_cols=["k"], ts_col="ts_s",
        value_col="y", period=PERIOD,
    )
    assert out.count() == 0


def test_numpy_raises_under_two_seasons():
    with pytest.raises(ValueError):
        hw_fit_numpy(np.ones(20), PERIOD, 0.3, 0.1, 0.2, 4)
