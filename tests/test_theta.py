"""operators/theta.py — unrolled SES level == recursion; drift forecast
matches the Hyndman-Billah closed form computed in numpy."""

from __future__ import annotations

import math

import numpy as np

from diive_spark.operators.theta import theta_forecast


def _numpy_theta(y: np.ndarray, horizon: int, alpha: float) -> np.ndarray:
    lvl = y[0]
    for v in y[1:]:
        lvl = alpha * v + (1 - alpha) * lvl
    t = np.arange(1, len(y) + 1, dtype=float)
    b = np.polyfit(t, y, 1)[0]
    h = np.arange(1, horizon + 1, dtype=float)
    return lvl + (b / 2.0) * (h - 1 + 1 / alpha - (1 - alpha) ** len(y) / alpha)


def test_theta_matches_numpy_recursion(spark):
    rng = np.random.default_rng(9)
    y = 10 + 0.05 * np.arange(120) + rng.normal(0, 0.5, 120)
    rows = [("k", int(i), float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(rows, "key string, hr long, y double")
    out = theta_forecast(df, ["key"], "hr", "y", horizon=6, alpha=0.5).collect()
    expect = _numpy_theta(y, 6, 0.5)
    assert len(out) == 6
    for r in sorted(out, key=lambda r: r["h"]):
        want = math.floor(expect[r["h"] - 1] * 10000 + 0.5)
        assert abs(r["yhat_e4"] - want) <= 1
        assert r["n_obs"] == 120


def test_theta_flat_series_forecasts_level(spark):
    rows = [("k", int(i), 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "key string, hr long, y double")
    out = theta_forecast(df, ["key"], "hr", "y", horizon=3, alpha=0.5).collect()
    assert all(r["yhat_e4"] == 50000 for r in out)
