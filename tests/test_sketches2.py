"""Pins for the KLL and Frequent Directions sketches
(operators/sketches2.py)."""

from __future__ import annotations

import numpy as np
import pytest

from diive_spark.operators.sketches2 import (
    frequent_directions,
    kll_rank,
    kll_sketch,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kll_rank_error_bound(seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, 20000)
    sk = kll_sketch(x, k=64)
    xs = np.sort(x)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        v = xs[int(q * len(x))]
        est = kll_rank(sk, v)
        exact = np.searchsorted(xs, v, side="right")
        assert abs(est - exact) / len(x) < 0.05, q


def test_kll_exact_when_small():
    x = np.arange(40, dtype=np.float64)
    sk = kll_sketch(x, k=64)
    for v in (0.0, 10.0, 39.0):
        assert kll_rank(sk, v) == v + 1


def test_kll_weights_conserve_count():
    rng = np.random.default_rng(3)
    x = rng.random(5000)
    sk = kll_sketch(x, k=64)
    total = sum(len(b) * (1 << h) for h, b in enumerate(sk.levels))
    # compaction drops at most one item's weight per compaction; the
    # total weighted count stays within 1% of n
    assert abs(total - len(x)) / len(x) < 0.01
    assert kll_rank(sk, float("inf")) == total


def test_kll_determinism():
    rng = np.random.default_rng(4)
    x = rng.random(3000)
    a = kll_sketch(x, k=32)
    b = kll_sketch(x.copy(), k=32)
    assert a.levels == b.levels


@pytest.mark.parametrize("seed,ell", [(0, 8), (1, 16), (2, 32)])
def test_fd_spectral_bound(seed, ell):
    rng = np.random.default_rng(seed)
    a = rng.normal(0, 1, (500, 24))
    b = frequent_directions(a, ell)
    diff = a.T @ a - b.T @ b
    lam = np.linalg.eigvalsh(diff)
    spec = max(abs(lam[0]), abs(lam[-1]))
    assert spec <= 2.0 * np.sum(a * a) / ell + 1e-9
    # positive semidefiniteness of A'A - B'B (shrinkage never adds)
    assert lam[0] >= -1e-6


def test_fd_exact_when_low_rank():
    rng = np.random.default_rng(5)
    u = rng.normal(0, 1, (300, 3))
    v = rng.normal(0, 1, (3, 20))
    a = u @ v  # rank 3 stream
    b = frequent_directions(a, 16)
    diff = a.T @ a - b.T @ b
    assert np.abs(diff).max() < 1e-6 * np.abs(a.T @ a).max()
