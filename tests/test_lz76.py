"""LZ76 kernel exactness: the Kaspar-Schuster production count must
equal an independent brute-force substring parse (the textbook LZ76
exhaustive-history definition) on random and structured sequences,
and the Spark rows-only query must reproduce the kernel run locally
on the same gridded series."""

from __future__ import annotations

import numpy as np
import pytest

from diive_spark.operators.lzcomplexity import lz76_phrase_count


def lz76_slow(bits) -> int:
    """Brute force: each phrase is the shortest prefix of the
    remainder that is NOT a substring of everything before the
    phrase's last character (Lempel & Ziv 1976 exhaustive history)."""
    s = "".join(str(int(b)) for b in bits)
    n = len(s)
    i = 0
    c = 0
    while i < n:
        k = 1
        while i + k <= n and s[i : i + k] in s[0 : i + k - 1]:
            k += 1
        c += 1
        i += k
    return c


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("n", [4, 17, 64, 257])
def test_lz76_matches_bruteforce_random(seed, n):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=n).astype(np.int8)
    assert lz76_phrase_count(bits) == lz76_slow(bits)


def test_lz76_structured_sequences():
    # constant, alternating, periodic, and the classic examples
    for bits in [
        np.zeros(32, dtype=np.int8),
        np.ones(7, dtype=np.int8),
        np.tile([0, 1], 16).astype(np.int8),
        np.tile([0, 0, 1], 11).astype(np.int8),
        np.array([0, 1], dtype=np.int8),
        np.array([0], dtype=np.int8),
    ]:
        assert lz76_phrase_count(bits) == lz76_slow(bits)


def test_lz76_regularity_ordering():
    # periodic sequences must parse into far fewer phrases than noise
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 2, size=512).astype(np.int8)
    periodic = np.tile([0, 1, 1, 0], 128).astype(np.int8)
    assert lz76_phrase_count(periodic) < lz76_phrase_count(noise) / 3


def test_lz76_spark_query(spark):
    import __spark_entry__ as entry

    df = entry.queries()["lz76_complexity"](
        spark, "/root/testdata/sf0.001"
    )
    rows = {r["event_type"]: r for r in df.collect()}
    assert rows, "no output rows"
    for r in rows.values():
        assert r["n"] > 0
        assert 0 < r["phrases"] <= r["n"]
        if r["c_norm"] == r["c_norm"]:  # not NaN
            assert 0.0 < r["c_norm"] < 2.0
