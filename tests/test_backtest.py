"""Rolling-origin backtest (operators/backtest.py): hand-computed case
including a gap (the missing source hour drops the eval row in wall-time
semantics, it does not shift to the previous row)."""

from __future__ import annotations

import pytest

from diive_spark.operators.backtest import seasonal_naive_backtest

H = 3600


def test_backtest_hand_case(spark):
    # key 1: hours 0..5 with season=2h, step=1h; hour 3 missing ->
    # eval rows need y(t), y(t-2h), y(t-1h) all present: t=2h (y0,y1),
    # t=5h needs y(3h) missing -> dropped; t=4h needs y(3h) -> dropped.
    rows = [
        (1, 0 * H, 10.0),
        (1, 1 * H, 12.0),
        (1, 2 * H, 11.0),
        # hour 3 missing
        (1, 4 * H, 20.0),
        (1, 5 * H, 14.0),
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = seasonal_naive_backtest(df, ["k"], "t", "v", season_s=2 * H, step_s=H)
    r = out.collect()
    assert len(r) == 1
    row = r[0]
    # only t=2h evaluates: es = 11-10 = 1, e1 = 11-12 = -1
    assert row["n_evals"] == 1
    assert row["mae_seasonal"] == pytest.approx(1.0)
    assert row["rmse_seasonal"] == pytest.approx(1.0)
    assert row["mae_naive1"] == pytest.approx(1.0)
    assert row["skill"] == pytest.approx(1.0)


def test_backtest_skill_detects_seasonality(spark):
    # strongly periodic series: seasonal naive is exact, naive-1 is not
    rows = [(1, t * H, float(t % 24)) for t in range(24 * 5)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    r = seasonal_naive_backtest(df, ["k"], "t", "v").collect()[0]
    assert r["mae_seasonal"] == 0.0
    assert r["mae_naive1"] > 0
    assert r["skill"] == 0.0
