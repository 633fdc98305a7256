"""Hypothesis property tests for the round-3 kernels (pure Python/numpy —
no Spark session, so hundreds of examples run in seconds):

  * binseg root split == literal O(n²) argmax with smallest-t ties
  * Mann-Kendall kernel == textbook pairwise loop on arbitrary int series
  * streaming hysteresis kernel: ANY micro-batch split of a series yields
    the same closed episodes as the whole series in one batch, and both
    match a literal Schmitt-trigger interpreter
"""

from __future__ import annotations

import numpy as np
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

pytestmark = pytest.mark.skipif(not HAVE_HYP, reason="hypothesis missing")

series = st.lists(st.integers(min_value=-500, max_value=500), min_size=2, max_size=80)


@given(series)
@settings(max_examples=150, deadline=None)
def test_binseg_root_matches_bruteforce(vals):
    from diive_spark.operators.changepoint import _best_split

    v = np.asarray(vals, dtype=np.int64)
    n = len(v)
    min_size = 2
    got = _best_split(v, 0, n, min_size)
    if n < 2 * min_size:
        assert got is None
        return
    best = None
    c = np.cumsum(v)
    for t in range(min_size, n - min_size + 1):
        num = int(c[t - 1]) * n - t * int(c[-1])
        gain = (num * num) / (n * t * (n - t))
        if best is None or gain > best[1]:
            best = (t, gain)
    assert got == best


@given(series)
@settings(max_examples=100, deadline=None)
def test_mann_kendall_matches_textbook_loop(vals):
    from diive_spark.operators.trend import mann_kendall_kernel

    v = np.asarray(vals, dtype=np.float64)
    t = np.arange(len(v), dtype=np.float64) * 7.0
    s, var_s, z, slope, icept = mann_kendall_kernel(t, v)
    bs = sum(
        int(np.sign(v[j] - v[i]))
        for i in range(len(v))
        for j in range(i + 1, len(v))
    )
    assert s == bs
    _, counts = np.unique(v, return_counts=True)
    tie = int((counts * (counts - 1) * (2 * counts + 5)).sum())
    n = len(v)
    assert var_s == (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    slopes = sorted(
        (v[j] - v[i]) / (t[j] - t[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert slope == slopes[(len(slopes) - 1) // 2]


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.exists = True
        self._v = v


def _schmitt_reference(ts, v, hi, lo):
    """Literal per-row Schmitt-trigger interpreter (the semantics both the
    batch window formulation and the streaming kernel must match)."""
    state, episodes, cur = 0, [], None
    for t, x in zip(ts, v):
        if x >= hi:
            new = 1
        elif x < lo:
            new = 0
        else:
            new = state
        if new == 1 and state == 0:
            cur = [t, t, x, 1]  # start, end, peak, n
        elif new == 1:
            cur[1], cur[2], cur[3] = t, max(cur[2], x), cur[3] + 1
        elif new == 0 and state == 1:
            episodes.append(tuple(cur))
            cur = None
        state = new
    return episodes  # only CLOSED episodes


@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=3, max_size=60),
    st.integers(min_value=1, max_value=5),
    st.randoms(use_true_random=False),
)
@settings(max_examples=120, deadline=None)
def test_stream_hysteresis_kernel_split_invariant(vals, n_batches, rnd):
    import pandas as pd

    from diive_spark.streaming.hysteresis import _hysteresis_kernel

    hi, lo = 14.0, 6.0
    ts = np.arange(len(vals), dtype=np.int64) * 10
    v = np.asarray(vals, dtype=np.float64)
    want = _schmitt_reference(ts, v, hi, lo)

    cuts = sorted(rnd.sample(range(len(vals)), min(n_batches - 1, len(vals))))
    bounds = [0, *cuts, len(vals)]
    kern = _hysteresis_kernel(hi, lo)
    state = _FakeState()
    got = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        if a == b:
            continue
        pdf = pd.DataFrame({"ts_s": ts[a:b], "value": v[a:b]})
        for out in kern((7,), iter([pdf]), state):
            got.extend(
                (r.start_s, r.end_s, r.peak, r.n_rows)
                for r in out.itertuples()
            )
    assert got == [(s_, e, p, n) for (s_, e, p, n) in want]
