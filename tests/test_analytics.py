"""Analytics operators (SURVEY §2.3/§2.4) vs small numpy/pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators import analytics as AN


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.RandomState(11)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for key in range(3):
        for i in range(60):
            rows.append(
                (
                    key,
                    int(i),
                    (t0 + pd.Timedelta(seconds=1800 * i)).to_pydatetime(),
                    float(50 + 10 * np.sin(i / 5) + rng.normal(0, 2)),
                )
            )
    return spark.createDataFrame(
        rows, "key long, rec long, ts timestamp, value double"
    )


def test_histogram_fixed_bins(series_df):
    out = AN.histogram_fixed_bins(series_df, "key", "value", n_bins=10)
    pdf = series_df.toPandas()
    for key, grp in pdf.groupby("key"):
        v = grp["value"].to_numpy()
        lo, hi = v.min(), v.max()
        w = (hi - lo) / 10
        expect = np.minimum(np.floor((v - lo) / w), 9).astype(int)
        got = {
            r["bin"]: r["n"]
            for r in out.filter(F.col("key") == key).collect()
        }
        for b in range(10):
            n = int((expect == b).sum())
            assert got.get(b, 0) == n
    # total rows preserved
    assert out.agg(F.sum("n")).first()[0] == len(pdf)


def test_circular_mean_deg(spark):
    # angles clustered around 350/10 degrees: naive mean ~180, circular ~0
    df = spark.createDataFrame(
        [(1, 350.0), (1, 10.0), (1, 355.0), (1, 5.0)], "key long, deg double"
    )
    got = df.groupBy("key").agg(AN.circular_mean_deg("deg").alias("m")).first()["m"]
    assert got == pytest.approx(0.0, abs=1e-6) or got == pytest.approx(360.0, abs=1e-6)


def test_freq_detect_regular_grid(series_df):
    out = {r["key"]: r for r in AN.freq_detect(series_df, "key", "ts").collect()}
    for key in range(3):
        assert out[key]["delta_s"] == 1800
        assert out[key]["share"] == 1.0
        assert out[key]["freq_ok"] == 1


def test_lag_search_max_cov(series_df):
    out = AN.lag_search_max_cov(
        series_df, "key", "value", order_cols=["ts"], max_shift=3
    )
    pdf = series_df.toPandas().sort_values(["key", "ts"])
    for key, grp in pdf.groupby("key"):
        v = grp["value"].reset_index(drop=True)
        rows = {r["shift"]: r for r in out.filter(F.col("key") == key).collect()}
        best_shift, best_cov = None, -1.0
        for k in range(1, 4):
            cov = v.iloc[k:].reset_index(drop=True).cov(
                v.iloc[:-k].reset_index(drop=True)
            )
            assert rows[k]["cov"] == pytest.approx(cov, abs=1e-3)
            if abs(round(cov, 6)) > best_cov:
                best_shift, best_cov = k, abs(round(cov, 6))
        assert rows[best_shift]["is_best"] == 1


def test_similarity_window_stats_brute_force(series_df):
    small = series_df.filter("key = 0 and rec < 30")
    out = {
        r["rec"]: r
        for r in AN.similarity_window_stats(
            small, "key", "ts", "value", "rec", ts_tol_s=3600, value_tol=4.0
        ).collect()
    }
    pdf = small.toPandas()
    e = pdf["ts"].astype("int64") / 1e9
    for i in pdf.index:
        mask = (abs(e - e[i]) <= 3600) & (abs(pdf["value"] - pdf["value"][i]) <= 4.0)
        sel = pdf.loc[mask, "value"]
        assert out[pdf["rec"][i]]["n_similar"] == int(mask.sum())
        if len(sel) > 1:
            assert out[pdf["rec"][i]]["sd_similar"] == pytest.approx(
                sel.std(ddof=1), abs=1e-3
            )


def test_scenario_threshold_fanout(series_df):
    out = AN.scenario_threshold_fanout(series_df, "key", "value", [40.0, 55.0])
    pdf = series_df.toPandas()
    for r in out.collect():
        sel = pdf[(pdf["key"] == r["key"]) & (pdf["value"] >= r["threshold"])]
        assert r["n_kept"] == len(sel)
        if len(sel):
            assert r["mean_kept"] == pytest.approx(sel["value"].mean(), abs=1e-3)


def test_combine_first(spark):
    p = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, None)], "k long, t long, v double"
    ).filter("v is not null")
    s = spark.createDataFrame(
        [(1, 10, 9.0), (1, 20, 2.0), (1, 30, 3.0)], "k long, t long, v double"
    )
    got = {
        r["t"]: (r["v"], r["src"])
        for r in AN.combine_first(p, s, ["k", "t"], "v").collect()
    }
    assert got[10] == (1.0, "primary")  # primary wins overlap
    assert got[20] == (2.0, "secondary")
    assert got[30] == (3.0, "secondary")
