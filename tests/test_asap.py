"""ASAP window selection (operators/asap.py) vs an independent plain-
numpy implementation of the same rule, on randomized multi-key series."""

from __future__ import annotations

import numpy as np
import pytest

from diive_spark.operators.asap import ASAP_CANDIDATES, asap_select


def _numpy_asap(y: np.ndarray, cands: list[int]):
    met = {}
    for w in cands:
        if len(y) < w + 1:
            continue
        s = np.convolve(y, np.ones(w) / w, mode="valid")  # full windows
        d = np.diff(s)
        if len(d) == 0:
            continue
        s2 = s[1:]  # rows with a defined first difference
        rough = round(float(np.sqrt(max(d.var(), 0.0))), 4)
        m1 = s2.mean()
        var = (s2**2).mean() - m1**2
        mu4 = (
            (s2**4).mean()
            - 4 * (s2**3).mean() * m1
            + 6 * (s2**2).mean() * m1**2
            - 3 * m1**4
        )
        met[w] = (len(d), rough, round(float(mu4 / var**2), 4))
    kurt_raw = met[1][2]
    best = min(
        met.items(),
        key=lambda kv: (
            0 if kv[1][2] >= kurt_raw else 1,  # qualifies first
            kv[1][1],
            kv[0],
        ),
    )
    w, (n, rough, kurt) = best
    return w, n, rough, kurt, kurt_raw


@pytest.mark.parametrize("seed", [0, 7])
def test_asap_select_matches_numpy(spark, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for key in range(6):
        n = int(rng.integers(30, 120))
        base = np.sin(np.arange(n) / 5.0) * 10
        noise = rng.normal(0, 2.0, n)
        spikes = (rng.random(n) < 0.05) * rng.normal(0, 15.0, n)
        y = np.round(base + noise + spikes, 2)
        rows += [(key, int(t) * 3600, float(v)) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = {
        r["k"]: (r["w_opt"], r["n_pts"], r["roughness"], r["kurtosis"], r["kurt_raw"])
        for r in asap_select(df, ["k"], "t", "v").collect()
    }
    pdf = {}
    for key in range(6):
        y = np.array([v for k, t, v in rows if k == key])
        pdf[key] = _numpy_asap(y, ASAP_CANDIDATES)
    for key in range(6):
        gw, gn, gr, gk, gkr = got[key]
        nw, nn, nr, nk, nkr = pdf[key]
        assert gw == nw, (key, got[key], pdf[key])
        assert gn == nn
        assert gr == pytest.approx(nr, abs=2e-4)
        assert gk == pytest.approx(nk, abs=2e-4)
        assert gkr == pytest.approx(nkr, abs=2e-4)
