"""Elo kernel exactness: the batched fold must equal an independent
step-by-step loop, respect the zero-sum invariant, and the Spark
rows-only query must produce sane calendar-layer output."""

from __future__ import annotations

import numpy as np
import pytest

from diive_spark.operators.elo import elo_fold


def elo_slow(matches, k=32.0, base=1500.0):
    """Independent oracle: iterate days, compute all expected scores
    from start-of-day ratings, then apply the summed deltas."""
    ratings = {}
    for day in sorted({d for d, *_ in matches}):
        todays = [(a, b, sa) for d, a, b, sa in matches if d == day]
        for a, b, _ in todays:
            ratings.setdefault(a, base)
            ratings.setdefault(b, base)
        start = dict(ratings)
        for a, b, sa in todays:
            ea = 1.0 / (1.0 + 10.0 ** ((start[b] - start[a]) / 400.0))
            ratings[a] += k * (sa - ea)
            ratings[b] += k * ((1.0 - sa) - (1.0 - ea))
    return ratings


def standings_to_matches(days, keys, scores):
    out = []
    for d in sorted(set(days)):
        rows = [
            (keys[i], scores[i])
            for i in range(len(days))
            if days[i] == d
        ]
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                (ka, ca), (kb, cb) = rows[i], rows[j]
                if ca == cb:
                    sa = 1.0 if ka < kb else 0.0
                else:
                    sa = 1.0 if ca > cb else 0.0
                out.append((d, ka, kb, sa))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_elo_fold_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n_days, n_keys = 20, 5
    days = np.repeat(np.arange(n_days), n_keys)
    keys = np.tile(np.array([f"t{i}" for i in range(n_keys)]), n_days)
    scores = rng.integers(0, 50, size=n_days * n_keys)
    got = elo_fold(days, keys, scores)
    want = elo_slow(standings_to_matches(days, keys, scores))
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_elo_zero_sum():
    rng = np.random.default_rng(9)
    days = np.repeat(np.arange(30), 4)
    keys = np.tile(np.array(["a", "b", "c", "d"]), 30)
    scores = rng.integers(0, 100, size=120)
    ratings = elo_fold(days, keys, scores)
    # every pairwise exchange conserves rating mass
    assert sum(ratings.values()) == pytest.approx(1500.0 * 4, abs=1e-6)


def test_elo_dominance_ordering():
    # a competitor that always wins must end strictly highest
    days = np.repeat(np.arange(15), 3)
    keys = np.tile(np.array(["x", "y", "z"]), 15)
    scores = np.tile(np.array([100, 50, 10]), 15)
    r = elo_fold(days, keys, scores)
    assert r["x"] > r["y"] > r["z"]


def test_elo_spark_query(spark):
    import __spark_entry__ as entry

    df = entry.queries()["elo_daily"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 5
    # the query rounds elo to 4 decimals, so allow the rounding slack
    assert sum(r["elo"] for r in rows) == pytest.approx(
        1500.0 * 5, abs=1e-3
    )
    assert all(r["n_days"] > 0 for r in rows)
