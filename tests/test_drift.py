"""operators/drift.py — KS / PSI / Benford / drawdown / CCF exactness."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from diive_spark.operators.drift import (
    benford_digits,
    ccf,
    ks_statistic,
    max_drawdown,
    psi,
)


def _two_sample(spark, a, b):
    rows = [("k", 0, float(v)) for v in a] + [("k", 1, float(v)) for v in b]
    return spark.createDataFrame(rows, "key string, s int, value double")


def test_ks_matches_numpy_ecdf(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(0, 1, 400)
    b = rng.normal(0.35, 1.1, 300)
    out = ks_statistic(_two_sample(spark, a, b), ["key"], "s", "value").collect()[0]
    # exact D over the pooled support
    support = np.unique(np.concatenate([a, b]))
    f_a = np.searchsorted(np.sort(a), support, side="right") / len(a)
    f_b = np.searchsorted(np.sort(b), support, side="right") / len(b)
    d = float(np.max(np.abs(f_a - f_b)))
    assert out["ks_e4"] == math.floor(d * 10000 + 0.5)
    assert out["n_ref"] == 400 and out["n_cur"] == 300
    crit = 1.358 * math.sqrt((400 + 300) / (400.0 * 300.0))
    assert out["drifted"] == int(d > crit)


def test_ks_identical_samples_zero(spark):
    v = list(np.linspace(0, 1, 50))
    out = ks_statistic(_two_sample(spark, v, v), ["key"], "s", "value").collect()[0]
    assert out["ks_e4"] == 0 and out["drifted"] == 0


def test_psi_zero_for_identical_and_positive_for_shift(spark):
    rng = np.random.default_rng(11)
    a = rng.uniform(0, 10, 500)
    same = psi(_two_sample(spark, a, a), ["key"], "s", "value").collect()[0]
    assert abs(same["psi"]) < 1e-9
    shifted = psi(_two_sample(spark, a, a + 4.0), ["key"], "s", "value").collect()[0]
    assert shifted["psi"] > 0.2


def test_psi_matches_numpy(spark):
    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, 300)
    b = rng.normal(0.5, 1.3, 200)
    out = psi(_two_sample(spark, a, b), ["key"], "s", "value").collect()[0]
    pooled = np.concatenate([a, b])
    lo, hi = pooled.min(), pooled.max()
    step = (hi - lo) / 10.0
    bins_a = np.minimum(np.floor((a - lo) / step), 9).astype(int)
    bins_b = np.minimum(np.floor((b - lo) / step), 9).astype(int)
    val = 0.0
    for k in range(10):
        p0 = (np.sum(bins_a == k) + 0.5) / (300 + 5.0)
        p1 = (np.sum(bins_b == k) + 0.5) / (200 + 5.0)
        val += (p1 - p0) * (math.log(p1) - math.log(p0))
    assert out["psi"] == pytest.approx(round(val, 4), abs=2e-4)


def test_benford_digit_extraction_and_chi2(spark):
    # digits 9 / 1 / 1 / excluded(-tiny) / 7
    vals = [("g", 999.999), ("g", 1000.0), ("g", 1.0), ("g", 4e-7), ("g", -7.2)]
    df = spark.createDataFrame(vals, "grp string, v double")
    rows = {r["digit"]: r for r in benford_digits(df, ["grp"], "v").collect()}
    assert sorted(rows) == [1, 7, 9]
    assert rows[1]["n_obs"] == 2 and rows[9]["n_obs"] == 1 and rows[7]["n_obs"] == 1
    n = 4
    chi2 = 0.0
    for d, obs in [(1, 2), (7, 1), (9, 1)]:
        e = n * math.log10(1 + 1 / d)
        chi2 += (obs - e) ** 2 / e
    # digits with zero observations contribute nothing (count table form)
    assert rows[1]["chi2"] == pytest.approx(round(chi2, 4), abs=2e-4)
    assert rows[1]["obs_e4"] == 5000 and rows[1]["exp_e4"] == 3010


def test_max_drawdown_hand_case(spark):
    # equity: 5, 8, 3, 6, 1 -> peaks 5,8,8,8,8 -> dd 0,0,5,2,7
    deltas = [5.0, 3.0, -5.0, 3.0, -5.0]
    rows = [(1, 10 + i, i, d) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, "user_id long, ts_s long, event_id long, value double")
    out = max_drawdown(df, ["user_id"], "ts_s", "value", "event_id").collect()[0]
    assert out["mdd_e4"] == 70000
    assert out["trough_ts_s"] == 14
    assert out["n_events"] == 5


def test_max_drawdown_ts_tie_uses_tiebreak(spark):
    rows = [(1, 10, 2, -4.0), (1, 10, 1, 10.0), (1, 11, 3, 1.0)]
    df = spark.createDataFrame(rows, "user_id long, ts_s long, event_id long, value double")
    out = max_drawdown(df, ["user_id"], "ts_s", "value", "event_id").collect()[0]
    # order by (ts, event_id): 10, 6, 7 -> max dd = 4 at ts 10
    assert out["mdd_e4"] == 40000 and out["trough_ts_s"] == 10


def test_ccf_recovers_known_lag(spark):
    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, 200)
    x_rows = [(int(t), float(v)) for t, v in enumerate(base)]
    # y leads x by 3 slots: y_{t+3} == x_t  -> ccf peaks at lag +3
    y_rows = [(int(t + 3), float(v)) for t, v in enumerate(base)]
    x = spark.createDataFrame(x_rows, "hr long, xv double")
    y = spark.createDataFrame(y_rows, "hr long, yv double")
    out = {r["lag"]: r["ccf"] for r in ccf(x, y, "hr", "xv", "yv", 5).collect()}
    assert out[3] == pytest.approx(1.0, abs=1e-6)
    assert all(abs(v) < 0.3 for k, v in out.items() if k != 3)
