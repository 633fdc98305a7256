"""Pins for the HVG and SSA kernels against brute-force/identity
oracles."""

from __future__ import annotations

import numpy as np
import pytest

from diive_spark.operators.ssa import ssa_spectrum, _trajectory
from diive_spark.operators.visibility import hvg_degrees


def brute_hvg(y):
    n = len(y)
    deg = np.zeros(n, dtype=np.int64)
    for i in range(n):
        for j in range(i + 1, n):
            if all(y[k] < min(y[i], y[j]) for k in range(i + 1, j)):
                deg[i] += 1
                deg[j] += 1
    return deg


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_hvg_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 10, size=40).astype(float)  # ties included
    assert (hvg_degrees(y) == brute_hvg(y)).all()


def test_hvg_known_shapes():
    # monotone series: a path graph (degrees 1,2,2,...,2,1)
    d = hvg_degrees(np.arange(6, dtype=float))
    assert d.tolist() == [1, 2, 2, 2, 2, 1]
    # iid mean degree tends to 4 (check loose band on a long sample)
    rng = np.random.default_rng(9)
    d = hvg_degrees(rng.random(5000))
    assert 3.7 < d.mean() < 4.1


def test_ssa_trace_identity_and_reconstruction():
    rng = np.random.default_rng(0)
    t = np.arange(200, dtype=np.float64)
    y = np.sin(2 * np.pi * t / 24) * 3 + 0.01 * t + rng.normal(0, 0.2, 200)
    lam, erank, resid = ssa_spectrum(y, L=24)
    x = _trajectory(y, 24)
    assert abs(lam.sum() - np.sum(x * x)) < 1e-6 * np.sum(x * x)
    assert resid < 1e-8
    # sinusoid + trend: leading pair dominates, effective rank small
    assert lam[0] / lam.sum() > 0.3
    assert erank < 8


def test_ssa_eigh_vs_svd():
    rng = np.random.default_rng(1)
    y = rng.normal(0, 1, 120)
    lam, _, _ = ssa_spectrum(y, L=12)
    x = _trajectory(y, 12)
    sv = np.linalg.svd(x, compute_uv=False)
    assert np.allclose(np.sort(lam), np.sort(sv**2), rtol=1e-9)


def test_ssa_short_series():
    lam, erank, resid = ssa_spectrum(np.arange(10.0), L=24)
    assert len(lam) == 0 and np.isnan(erank)
