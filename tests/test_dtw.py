"""DTW kernel pins: exact match to the O(3^n) recursive definition,
band=0 degenerates to euclidean, phase-shift robustness, and the
pairwise Spark operator against the kernel."""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators.dtw import dtw_kernel, pairwise_dtw


def _brute(a: tuple, b: tuple) -> float:
    @lru_cache(None)
    def d(i: int, j: int) -> float:
        if i == 0 and j == 0:
            return 0.0
        if i == 0 or j == 0:
            return float("inf")
        return (a[i - 1] - b[j - 1]) ** 2 + min(
            d(i - 1, j), d(i, j - 1), d(i - 1, j - 1)
        )

    return float(np.sqrt(d(len(a), len(b))))


@pytest.mark.parametrize("trial", range(6))
def test_dtw_matches_recursive_definition(trial):
    rng = np.random.default_rng(trial)
    a = rng.normal(0, 1, rng.integers(8, 28))
    b = rng.normal(0, 1, rng.integers(8, 28))
    assert abs(
        dtw_kernel(a, b, znorm=False) - _brute(tuple(a), tuple(b))
    ) < 1e-10


def test_dtw_band_zero_is_euclidean():
    rng = np.random.default_rng(9)
    a, b = rng.normal(0, 1, 20), rng.normal(0, 1, 20)
    assert abs(
        dtw_kernel(a, b, band=0, znorm=False) - np.linalg.norm(a - b)
    ) < 1e-10


def test_dtw_absorbs_phase_shift():
    x = np.sin(np.linspace(0, 4 * np.pi, 64))
    a, b = x[6:], x[:-6]
    # warping absorbs most of the misalignment; only the forced
    # endpoint alignment contributes cost
    assert dtw_kernel(a, b, znorm=False) < 0.5 * np.linalg.norm(a - b)
    assert dtw_kernel(x, x, znorm=False) == 0.0


def test_pairwise_dtw_operator(spark):
    rng = np.random.default_rng(4)
    profs = {k: rng.normal(0, 1, 24) for k in ["a", "b", "c", "d"]}
    pdf = pd.DataFrame(
        {"key": list(profs), "vec": [v.tolist() for v in profs.values()]}
    )
    out = pairwise_dtw(
        spark.createDataFrame(pdf), "key", "vec", znorm=True
    ).toPandas()
    assert len(out) == 6  # C(4,2), ordered pairs only
    for _, r in out.iterrows():
        want = dtw_kernel(profs[r.key_a], profs[r.key_b], znorm=True)
        assert abs(r.dtw - want) < 1e-10
