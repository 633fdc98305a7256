"""Pins for the ADWIN2 drift kernel (operators/adwin.py)."""

from __future__ import annotations

import numpy as np

from diive_spark.operators.adwin import adwin_detect


def test_constant_stream_never_cuts():
    det, win, mean = adwin_detect(np.full(4000, 3.25))
    assert det == []
    assert win == 4000
    assert mean == 3.25


def test_stationary_noise_rarely_cuts():
    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 1.0, 6000)
    det, win, _ = adwin_detect(x)
    # delta=0.002 -> expected false-positive rate well under 1/1000
    assert len(det) <= 3


def test_planted_shift_detected_and_localized():
    rng = np.random.default_rng(1)
    x = np.concatenate(
        [rng.normal(0.0, 0.5, 3000), rng.normal(2.0, 0.5, 1500)]
    )
    det, win, mean = adwin_detect(x)
    assert det, "shift not detected"
    assert 3000 < det[0] <= 3400, f"late/early first cut at {det[0]}"
    # after shrinking, the surviving window covers mostly post-shift data
    assert win <= 2200
    assert mean > 1.5


def test_small_shift_needs_more_data_than_large():
    rng = np.random.default_rng(2)
    base = rng.normal(0.0, 0.5, 3000)
    small = np.concatenate([base, rng.normal(0.4, 0.5, 1500)])
    large = np.concatenate([base, rng.normal(3.0, 0.5, 1500)])
    det_s, _, _ = adwin_detect(small)
    det_l, _, _ = adwin_detect(large)
    assert det_l and det_s
    assert det_l[0] < det_s[0]


def test_determinism():
    rng = np.random.default_rng(3)
    x = rng.normal(0.0, 1.0, 2000)
    x[1200:] += 1.5
    a = adwin_detect(x)
    b = adwin_detect(x.copy())
    assert a[0] == b[0] and a[1] == b[1] and a[2] == b[2]


def test_window_tracks_mean_after_drift():
    # slow ramp: window should stay bounded, mean should chase the ramp
    t = np.arange(6000, dtype=np.float64)
    x = t / 1000.0
    det, win, mean = adwin_detect(x)
    assert det, "ramp never cut"
    assert win < 6000
    assert mean > 4.0
