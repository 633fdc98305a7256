"""Pins for the Lindley and Belady kernels (operators/queuesim.py)."""

from __future__ import annotations

import numpy as np

from diive_spark.operators.queuesim import belady_opt_hits, lindley_waits
from diive_spark.operators.seqkernels import lru_stack_distances


def event_sim_waits(arrivals, services):
    """Independent oracle: explicit start/departure timeline."""
    n = len(arrivals)
    w = np.zeros(n)
    dep = -np.inf
    for i in range(n):
        start = max(arrivals[i], dep)
        w[i] = start - arrivals[i]
        dep = start + services[i]
    return w


def test_lindley_matches_event_simulation():
    rng = np.random.default_rng(0)
    a = np.cumsum(rng.exponential(1.0, 500))
    s = rng.exponential(0.7, 500)
    assert np.allclose(lindley_waits(a, s), event_sim_waits(a, s))


def test_lindley_light_traffic_zero_waits():
    a = np.arange(100, dtype=np.float64) * 10
    s = np.ones(100)
    assert lindley_waits(a, s).max() == 0.0


def test_lindley_heavy_traffic_grows():
    a = np.arange(200, dtype=np.float64)
    s = np.full(200, 1.5)  # rho = 1.5: waits grow ~0.5 per customer
    w = lindley_waits(a, s)
    assert w[-1] > 80


def brute_opt(refs, c):
    """Recursive-free re-simulation with list scans (independent of
    the dict/max implementation)."""
    refs = list(refs)
    n = len(refs)
    cache = []
    hits = 0
    for i in range(n):
        k = refs[i]
        if k in cache:
            hits += 1
            continue
        if len(cache) >= c:
            # farthest next use; never-again = +inf; tie -> larger key
            best = None
            for q in cache:
                try:
                    nu = refs.index(q, i + 1)
                except ValueError:
                    nu = float("inf")
                cand = (nu, q)
                if best is None or cand > best:
                    best = cand
            cache.remove(best[1])
        cache.append(k)
    return hits


def test_belady_matches_bruteforce():
    rng = np.random.default_rng(1)
    refs = rng.integers(0, 12, size=300)
    for c in (1, 2, 4, 8):
        assert belady_opt_hits(refs, c) == brute_opt(refs, c)


def test_belady_dominates_lru():
    rng = np.random.default_rng(2)
    refs = rng.integers(0, 40, size=2000)
    sd = lru_stack_distances(refs)
    for c in (1, 4, 16):
        lru_hits = int(np.sum((sd >= 0) & (sd < c)))
        assert belady_opt_hits(refs, c) >= lru_hits


def test_belady_full_cache_all_hits():
    refs = np.array([1, 2, 3, 1, 2, 3, 1, 2, 3])
    assert belady_opt_hits(refs, 3) == 6
