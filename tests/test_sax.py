"""SAX symbolization (operators/sax.py): hand case + numpy differential."""

from __future__ import annotations

import numpy as np
import pytest

from diive_spark.operators.sax import SAX_BREAKPOINTS, sax_symbols


def _numpy_sax(y: np.ndarray, frame: int, a: int):
    mu, sd = y.mean(), y.std()
    out = []
    for fid in range(int(np.ceil(len(y) / frame))):
        seg = y[fid * frame: (fid + 1) * frame]
        z = (seg.mean() - mu) / sd if sd > 0 else 0.0
        sym = sum(z > b for b in SAX_BREAKPOINTS[a])
        out.append((fid, len(seg), round(z, 4), sym))
    return out


@pytest.mark.parametrize("seed,n", [(2, 37), (8, 64)])
def test_sax_matches_numpy(spark, seed, n):
    rng = np.random.default_rng(seed)
    y = np.round(rng.normal(5, 3, n), 2)
    rows = [(1, t * 3600, float(v)) for t, v in enumerate(y)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = sorted(
        (r["frame_id"], r["n_in_frame"], r["paa_z"], r["symbol"])
        for r in sax_symbols(df, ["k"], "t", "v", frame=4, alphabet=4).collect()
    )
    want = sorted(_numpy_sax(y, 4, 4))
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3]
        assert g[2] == pytest.approx(w[2], abs=2e-4)
    assert len(got) == len(want)


def test_sax_constant_series_middle_symbol(spark):
    rows = [(1, t * 3600, 7.0) for t in range(12)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = sax_symbols(df, ["k"], "t", "v", frame=4, alphabet=4).collect()
    # z == 0 everywhere -> symbol = count of breakpoints below 0 = 1
    assert all(r["symbol"] == 1 and r["paa_z"] == 0.0 for r in out)
    assert len(out) == 3
