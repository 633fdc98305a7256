"""Pins for the Jenks-Fisher natural-breaks DP (operators/jenks.py)
against exhaustive split enumeration."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest

from diive_spark.operators.jenks import jenks_breaks


def brute_jenks(x, k):
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = len(x)
    best = (np.inf, None)
    for cuts in combinations(range(1, n), k - 1):
        sse = 0.0
        prev = 0
        for c in list(cuts) + [n]:
            seg = x[prev:c]
            sse += float(np.sum((seg - seg.mean()) ** 2))
            prev = c
        if sse < best[0] - 1e-12:
            best = (sse, cuts)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("k", [2, 3, 4])
def test_matches_bruteforce_sse(seed, k):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 40, size=11).astype(float)
    br, sse = jenks_breaks(x, k)
    bsse, _ = brute_jenks(x, k)
    assert abs(sse - bsse) < 1e-9
    assert len(br) == k - 1


def test_obvious_clusters():
    x = np.array([1.0, 1.1, 0.9, 10.0, 10.2, 9.9, 50.0, 50.5, 49.5])
    br, sse = jenks_breaks(x, 3)
    # breaks must separate the three clusters
    assert br[0] < 5 and 5 < br[1] < 30
    assert sse < 1.0


def test_otsu_consistency_k2():
    # k=2 minimizing within-SSE == maximizing between-class variance
    rng = np.random.default_rng(5)
    x = np.concatenate([rng.normal(0, 1, 30), rng.normal(8, 1, 30)])
    br, _ = jenks_breaks(x, 2)
    # the class-1 upper bound is exactly the low cluster's maximum
    assert int(np.sum(x <= br[0] + 1e-9)) == 30


def test_degenerate():
    br, sse = jenks_breaks(np.array([3.0, 3.0, 3.0, 3.0]), 3)
    assert sse == 0.0
