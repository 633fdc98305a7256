"""Multi-resolution battery: Lomb-Scargle vs the direct per-frequency
Scargle formula, Haar energy vs an actual recursive pyramid, Hurst R/S
vs a plain numpy loop, Croston's closed form vs the REAL recursive SES,
and triangle counting vs itertools brute force.

Each pin validates a different reformulation: closed-form-vs-recursion
(croston), tau-rotation-algebra-vs-direct-tau (lomb_scargle),
half-sum-identity-vs-pyramid (haar), window-algebra-vs-loop (hurst),
degree-ordered-join-vs-all-triples (triangles)."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators.croston import croston
from diive_spark.operators.lombscargle import lomb_scargle
from diive_spark.operators.multires import haar_energy, hurst_rs
from diive_spark.text.graph import triangle_count


def _series(seed: int, n: int, key: int):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 30 * 86400, size=n))
    # daily cycle + noise so the 24h bin should dominate
    v = (
        50.0
        + 20.0 * np.sin(2 * math.pi * ts / 86400.0)
        + rng.normal(0, 3.0, size=n)
    )
    return pd.DataFrame(
        {"k": key, "ts_s": ts.astype("int64"), "eid": np.arange(n), "v": v}
    )


def _ls_direct(ts, y, period):
    """Textbook Scargle 1982: explicit tau, then the two projections."""
    w = 2 * math.pi / period
    y = y - y.mean()
    tau = math.atan2(np.sin(2 * w * ts).sum(), np.cos(2 * w * ts).sum()) / (
        2 * w
    )
    a = w * (ts - tau)
    p = 0.5 * (
        (y * np.cos(a)).sum() ** 2 / (np.cos(a) ** 2).sum()
        + (y * np.sin(a)).sum() ** 2 / (np.sin(a) ** 2).sum()
    )
    return p / y.var()


def test_lomb_scargle_matches_direct_and_finds_daily(spark):
    pdf = pd.concat([_series(1, 240, 1), _series(2, 240, 2)])
    df = spark.createDataFrame(pdf)
    periods = tuple(h * 3600 for h in (6, 12, 24, 48))
    out = (
        lomb_scargle(df, "k", "ts_s", "v", periods)
        .toPandas()
        .set_index(["k", "period_s"])
        .sort_index()
    )
    for k in (1, 2):
        sub = pdf[pdf.k == k]
        for p in periods:
            want = _ls_direct(
                sub.ts_s.to_numpy(float), sub.v.to_numpy(float), p
            )
            got = out.loc[(k, p), "pnorm_e4"] / 1e4
            assert got == pytest.approx(want, abs=2e-4), (k, p)
        # the planted daily cycle dominates
        powers = {p: out.loc[(k, p), "pnorm_e4"] for p in periods}
        assert max(powers, key=powers.get) == 24 * 3600


def _haar_raw_direct(v, level):
    """Independent half-sum formulation straight from the definition."""
    vi = np.floor(np.asarray(v) * 100 + 0.5).astype("int64")
    size = 2**level
    nb = len(vi) // size
    raw = 0
    for b in range(nb):
        blk = vi[b * size : (b + 1) * size]
        s0 = int(blk[: size // 2].sum())
        s1 = int(blk[size // 2 :].sum())
        raw += (s0 - s1) ** 2
    return nb, raw


def test_haar_energy_exact_integer(spark):
    pdf = _series(7, 100, 3)
    df = spark.createDataFrame(pdf)
    out = (
        haar_energy(df, "k", ["ts_s", "eid"], "v", levels=4, scale=100)
        .toPandas()
        .set_index("level")
        .sort_index()
    )
    v = pdf.sort_values(["ts_s", "eid"]).v.to_numpy()
    for lvl in (1, 2, 3, 4):
        nb, raw = _haar_raw_direct(v, lvl)
        assert out.loc[lvl, "n_pairs"] == nb
        assert out.loc[lvl, "energy_raw"] == raw


def test_haar_energy_equals_pyramid_detail_energy(spark):
    # The half-sum identity vs the REAL recursive pyramid: at level k the
    # pyramid detail over a complete bucket equals (s0-s1)/2^k on raw
    # centi values, so raw == sum(det^2) * 4^k.
    pdf = _series(11, 64, 4)
    df = spark.createDataFrame(pdf)
    out = (
        haar_energy(df, "k", ["ts_s", "eid"], "v", levels=3, scale=100)
        .toPandas()
        .set_index("level")
    )
    vi = (
        np.floor(pdf.sort_values(["ts_s", "eid"]).v.to_numpy() * 100 + 0.5)
        .astype("int64")
        .astype(float)
    )
    a = vi
    for k in (1, 2, 3):
        m = len(a) // 2
        pairs = a[: 2 * m].reshape(m, 2)
        det = (pairs[:, 0] - pairs[:, 1]) / 2.0
        a = pairs.mean(axis=1)
        # det at level k acts on level-(k-1) approximations A (means of
        # 2^(k-1) raw values, A = s/2^(k-1)): d = (A0-A1)/2 = (s0-s1)/2^k,
        # so energy_raw = sum d^2 * 4^k — the pyramid and the half-sum
        # identity must agree exactly (all quantities dyadic rationals).
        assert out.loc[k, "energy_raw"] == pytest.approx(
            (det**2).sum() * 4**k, abs=1e-6
        )


def _hurst_direct(v, sizes):
    vi = np.floor(np.asarray(v) * 100 + 0.5).astype("int64")
    means = {}
    for n in sizes:
        rss = []
        for b in range(len(vi) // n):
            blk = vi[b * n : (b + 1) * n].astype(float)
            z = np.cumsum(blk - blk.mean())
            r = z.max() - z.min()
            s = blk.std()  # population
            if s > 0:
                rss.append(r / s)
        means[n] = float(np.mean(rss))
    h = (math.log2(means[sizes[-1]]) - math.log2(means[sizes[0]])) / (
        len(sizes) - 1
    )
    return means, h


def test_hurst_rs_matches_numpy_loop(spark):
    pdf = pd.concat([_series(3, 130, 1), _series(4, 200, 2)])
    df = spark.createDataFrame(pdf)
    out = (
        hurst_rs(df, "k", ["ts_s", "eid"], "v", sizes=(8, 16, 32), scale=100)
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    for k, n in ((1, 130), (2, 200)):
        v = pdf[pdf.k == k].sort_values(["ts_s", "eid"]).v.to_numpy()
        means, h = _hurst_direct(v, (8, 16, 32))
        assert out.loc[k, "n8"] == n // 8
        assert out.loc[k, "n32"] == n // 32
        for sz in (8, 16, 32):
            assert out.loc[k, f"rs{sz}_e4"] == pytest.approx(
                means[sz] * 1e4, abs=1.01
            )
        assert out.loc[k, "h_e4"] == pytest.approx(h * 1e4, abs=1.01)
        # random-walk-free iid-ish noise + sinusoid: H must be sane
        assert 0 < out.loc[k, "h_e4"] < 1e4


def _croston_recursive(z, p, alpha):
    """The ACTUAL Croston recursion the closed form must reproduce."""
    lz = z[0]
    for x in z[1:]:
        lz = alpha * x + (1 - alpha) * lz
    lp = p[0]
    for x in p[1:]:
        lp = alpha * x + (1 - alpha) * lp
    return lz, lp


def test_croston_closed_form_equals_recursion(spark):
    rng = np.random.default_rng(42)
    rows = []
    for k in (1, 2):
        n = 80
        demand = rng.choice([0.0, 0.0, 0.0, 1.0], size=n) * rng.uniform(
            5, 50, size=n
        )
        for i in range(n):
            rows.append((k, i, int(i), float(demand[i])))
    pdf = pd.DataFrame(rows, columns=["k", "ts_s", "eid", "demand"])
    df = spark.createDataFrame(pdf)
    out = (
        croston(df, "k", ["ts_s", "eid"], "demand", alpha=0.2)
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    for k in (1, 2):
        sub = pdf[(pdf.k == k) & (pdf.demand != 0)]
        steps = sub.ts_s.to_numpy() + 1  # step index is 1-based
        z = sub.demand.to_numpy()
        gaps = np.diff(steps).astype(float)
        lz, lp = _croston_recursive(list(z), list(gaps), 0.2)
        assert out.loc[k, "m"] == len(z)
        assert out.loc[k, "zhat_e2"] == pytest.approx(lz * 100, abs=1.01)
        assert out.loc[k, "phat_e4"] == pytest.approx(lp * 1e4, abs=1.01)
        assert out.loc[k, "forecast_e4"] == pytest.approx(
            lz / lp * 1e4, abs=1.01
        )


def test_triangle_count_vs_bruteforce(spark):
    rng = np.random.default_rng(9)
    nodes = list(range(12))
    edges = set()
    while len(edges) < 30:
        a, b = rng.choice(nodes, 2, replace=False)
        edges.add((min(int(a), int(b)), max(int(a), int(b))))
    adj = set(edges)
    brute = {n: 0 for n in nodes}
    n_tri = 0
    for x, y, z in itertools.combinations(nodes, 3):
        if (
            (x, y) in adj
            and (x, z) in adj
            and (y, z) in adj
        ):
            n_tri += 1
            for n in (x, y, z):
                brute[n] += 1
    df = spark.createDataFrame(
        pd.DataFrame(list(edges), columns=["src", "dst"])
    )
    got = dict(triangle_count(df).collect())
    assert sum(got.values()) == 3 * n_tri
    for n, c in brute.items():
        assert got.get(n, 0) == c


def test_triangle_count_ignores_direction_dupes_selfloops(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 2)],
            columns=["src", "dst"],
        )
    )
    got = dict(triangle_count(df).collect())
    assert got == {1: 1, 2: 1, 3: 1}
