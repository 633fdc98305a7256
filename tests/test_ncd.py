"""Pins for normalized compression distance (text/ncd.py)."""

from __future__ import annotations

import numpy as np

from diive_spark.text.ncd import ncd


def _rand_text(rng, n):
    return bytes(rng.integers(97, 123, size=n, dtype=np.uint8))


def test_self_distance_small():
    rng = np.random.default_rng(0)
    for n in (50, 200, 1000):
        x = _rand_text(rng, n)
        assert ncd(x, x) < 0.35  # deflate self-reference overhead only


def test_orders_similarity():
    rng = np.random.default_rng(1)
    x = _rand_text(rng, 600)
    near = bytearray(x)
    for i in range(0, 600, 97):
        near[i] = ord("Z")
    far = _rand_text(rng, 600)
    d_near = ncd(x, bytes(near))
    d_far = ncd(x, far)
    assert d_near < d_far
    assert ncd(x, x) < d_near


def test_range_and_empty():
    rng = np.random.default_rng(2)
    x = _rand_text(rng, 300)
    y = _rand_text(rng, 300)
    assert 0.0 <= ncd(x, y) <= 1.2  # deflate NCD can slightly exceed 1
    assert ncd(b"", b"") == 0.0


def test_repetitive_text_compresses_together():
    base = b"the quick brown fox jumps over the lazy dog " * 12
    shifted = base[7:] + base[:7]
    rng = np.random.default_rng(3)
    rand = _rand_text(rng, len(base))
    assert ncd(base, shifted) < 0.2
    assert ncd(base, rand) > 0.5


def test_determinism():
    rng = np.random.default_rng(4)
    x, y = _rand_text(rng, 400), _rand_text(rng, 400)
    assert ncd(x, y) == ncd(x, y)
