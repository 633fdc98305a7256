"""Pins for the alignment kernels (operators/alignkernels.py) against
exhaustive path/subsequence enumeration on short strings."""

from __future__ import annotations

from functools import lru_cache
from itertools import combinations

import numpy as np
import pytest

from diive_spark.operators.alignkernels import (
    GAP,
    MATCH,
    MISMATCH,
    lcs_len,
    nw_score,
    sw_score,
)


def brute_nw(a: str, b: str) -> int:
    """Independent oracle: recursive enumeration of alignment moves."""

    @lru_cache(maxsize=None)
    def rec(i: int, j: int) -> int:
        if i == len(a):
            return (len(b) - j) * GAP
        if j == len(b):
            return (len(a) - i) * GAP
        pair = (MATCH if a[i] == b[j] else MISMATCH) + rec(i + 1, j + 1)
        return max(pair, GAP + rec(i + 1, j), GAP + rec(i, j + 1))

    return rec(0, 0)


def brute_sw(a: str, b: str) -> int:
    """Independent oracle: best global score over ALL substring pairs
    (clipped at zero)."""
    best = 0
    for i0 in range(len(a) + 1):
        for i1 in range(i0, len(a) + 1):
            for j0 in range(len(b) + 1):
                for j1 in range(j0, len(b) + 1):
                    # score of aligning a[i0:i1] with b[j0:j1] globally,
                    # but local alignment never pays flanking gaps
                    s = brute_nw(a[i0:i1], b[j0:j1])
                    best = max(best, s)
    return best


def brute_lcs(a: str, b: str) -> int:
    best = 0
    for r in range(len(a), 0, -1):
        for ids in combinations(range(len(a)), r):
            sub = "".join(a[i] for i in ids)
            it = iter(b)
            if all(ch in it for ch in sub):
                return r
    return best


WORDS = ["banana", "ananas", "abcde", "edcba", "aaab", "bbba", "xyz", ""]


@pytest.mark.parametrize("a", WORDS)
@pytest.mark.parametrize("b", WORDS)
def test_nw_matches_enumeration(a, b):
    assert nw_score(a, b) == brute_nw(a, b)


@pytest.mark.parametrize(
    "a,b",
    [("banana", "ananas"), ("abcd", "xbcy"), ("aaa", "bbb"), ("ab", "")],
)
def test_sw_matches_substring_sweep(a, b):
    assert sw_score(a, b) == brute_sw(a, b)


@pytest.mark.parametrize("a", ["banana", "abcabc", "aab", ""])
@pytest.mark.parametrize("b", ["ananas", "cabcab", "abb", "zz"])
def test_lcs_matches_enumeration(a, b):
    assert lcs_len(a, b) == brute_lcs(a, b)


def test_identities():
    s = "the quick brown fox"
    assert nw_score(s, s) == MATCH * len(s)
    assert sw_score(s, s) == MATCH * len(s)
    assert lcs_len(s, s) == len(s)
    assert sw_score(s, "zzzz") == 0
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = "".join(rng.choice(list("abc"), size=rng.integers(0, 7)))
        y = "".join(rng.choice(list("abc"), size=rng.integers(0, 7)))
        assert nw_score(x, y) == nw_score(y, x)
        assert lcs_len(x, y) == lcs_len(y, x)
        assert nw_score(x, y) == brute_nw(x, y)
