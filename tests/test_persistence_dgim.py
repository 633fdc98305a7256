"""Pins for the 0-dim sublevel persistence and DGIM kernels
(operators/persistence.py) against independent brute-force oracles."""

from __future__ import annotations

import numpy as np
import pytest

from diive_spark.operators.persistence import (
    dgim_estimate_trace,
    sublevel_persistence,
)


def brute_persistence(y: np.ndarray) -> list[tuple[float, float]]:
    """Independent oracle: simulate the filtration level-by-level,
    recomputing connected components of {i: y_i <= v} from scratch at
    every distinct value and tracking component births via their
    minimum (value, index) vertex."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    levels = np.unique(y)
    alive: dict[tuple[float, int], bool] = {}
    pairs = []
    prev_comps: list[set[int]] = []

    def comps_at(v):
        mask = y <= v
        comps = []
        cur: set[int] = set()
        for i in range(n):
            if mask[i]:
                cur.add(i)
            elif cur:
                comps.append(cur)
                cur = set()
        if cur:
            comps.append(cur)
        return comps

    def birth_of(comp: set[int]) -> tuple[float, int]:
        return min((y[i], i) for i in comp)

    for v in levels:
        comps = comps_at(v)
        # every previous component maps into exactly one new component;
        # when several map into the same one, all but the eldest die at v
        for c in comps:
            inside = [p for p in prev_comps if p <= c]
            if len(inside) > 1:
                births = sorted(birth_of(p) for p in inside)
                for b in births[1:]:
                    if b[0] < v:
                        pairs.append((b[0], float(v)))
        prev_comps = comps
    return pairs


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_persistence_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 12, size=60).astype(float)
    pr, ess = sublevel_persistence(y)
    got = sorted((float(b), float(d)) for b, d in pr)
    want = sorted(brute_persistence(y))
    assert got == want
    assert ess == y.min()


def test_persistence_generic_bar_count():
    # distinct values: finite bars = (#local minima) - 1
    rng = np.random.default_rng(7)
    y = rng.permutation(40).astype(float)
    pad = np.concatenate([[np.inf], y, [np.inf]])
    n_min = int(
        np.sum((pad[1:-1] < pad[:-2]) & (pad[1:-1] < pad[2:]))
    )
    pr, _ = sublevel_persistence(y)
    assert len(pr) == n_min - 1


def test_persistence_monotone_and_empty():
    pr, ess = sublevel_persistence(np.arange(10, dtype=float))
    assert len(pr) == 0 and ess == 0.0
    pr, ess = sublevel_persistence(np.array([]))
    assert len(pr) == 0 and np.isnan(ess)


def test_persistence_v_shape():
    # one saddle at 3 merging births 0 and 1 -> bar (1, 3)
    y = np.array([0.0, 2.0, 3.0, 1.0, 3.0])
    pr, ess = sublevel_persistence(y)
    assert ess == 0.0
    assert [(1.0, 3.0)] == [(b, d) for b, d in pr]


def exact_trailing(bits, window, cps):
    cs = np.concatenate([[0], np.cumsum(bits)])
    return np.array(
        [cs[c + 1] - cs[max(0, c + 1 - window)] for c in cps], dtype=float
    )


@pytest.mark.parametrize("seed,dens", [(0, 0.5), (1, 0.1), (2, 0.9)])
def test_dgim_error_bound(seed, dens):
    rng = np.random.default_rng(seed)
    bits = (rng.random(5000) < dens).astype(np.int64)
    window = 256
    cps = np.arange(300, 5000, 471)
    est = dgim_estimate_trace(bits, window, cps)
    exact = exact_trailing(bits, window, cps)
    mask = exact > 0
    rel = np.abs(est[mask] - exact[mask]) / exact[mask]
    assert rel.max() <= 0.5 + 1e-12


def test_dgim_sparse_exact():
    # when ones are rare every bucket has size 1 inside the window ->
    # the estimate is exact except the half-credit on the oldest
    bits = np.zeros(2000, dtype=np.int64)
    bits[::97] = 1
    cps = np.array([1999])
    est = dgim_estimate_trace(bits, 512, cps)
    exact = exact_trailing(bits, 512, cps)
    assert abs(est[0] - exact[0]) <= max(1.0, 0.5 * exact[0])
