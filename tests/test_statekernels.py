"""State-space kernel pins:
- Kalman local level: filtered means must match an independent
  information-filter formulation (precision-space recursions) to
  1e-9, and the gain must converge to the analytic Riccati root.
- BOCD: the MAP run length must match a brute-force re-enumeration
  that recomputes every candidate segment's Student-t evidence from
  raw slices (an O(n^2) independent path).
"""

from __future__ import annotations

from math import lgamma, log, pi

import numpy as np
import pytest

from diive_spark.operators.statekernels import (
    bocd_gaussian,
    kalman_local_level,
    kalman_steady_gain,
)


def kalman_information(y, q, r):
    """Independent formulation: precision-space update
    (1/p_post = 1/p_pred + 1/r, a via precision-weighted mean)."""
    n = len(y)
    a = np.zeros(n)
    at, pt = y[0], r * 1e7
    for t in range(n):
        if t > 0:
            pt = pt + q
        prec = 1.0 / pt + 1.0 / r
        at = (at / pt + y[t] / r) / prec
        pt = 1.0 / prec
        a[t] = at
    return a


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("qr", [(1.0, 10.0), (0.1, 1.0), (5.0, 2.0)])
def test_kalman_matches_information_filter(seed, qr):
    q, r = qr
    rng = np.random.default_rng(seed)
    y = rng.normal(size=200).cumsum() + rng.normal(
        scale=np.sqrt(r), size=200
    )
    a1, _, _ = kalman_local_level(y, q, r)
    a2 = kalman_information(y, q, r)
    assert np.abs(a1 - a2).max() < 1e-9


@pytest.mark.parametrize("qr", [(1.0, 10.0), (0.5, 0.5), (3.0, 20.0)])
def test_kalman_gain_converges_to_riccati_root(qr):
    q, r = qr
    rng = np.random.default_rng(3)
    y = rng.normal(size=500)
    _, p, _ = kalman_local_level(y, q, r)
    final_gain = (p[-1] + q) / (p[-1] + q + r)
    assert final_gain == pytest.approx(
        kalman_steady_gain(q, r), abs=1e-10
    )
    # and the Riccati root satisfies its own fixed point
    pst = (-q + np.sqrt(q * q + 4 * q * r)) / 2.0
    assert (pst + q) * r / (pst + q + r) == pytest.approx(pst, rel=1e-12)


def bocd_brute(y, hazard, mu0, kappa0=1.0, alpha0=1.0, beta0=1.0):
    """Brute force: run-length posterior at each t from explicit
    segment evidences P(y_{t-r+1..t} | one segment)."""
    n = len(y)

    def seg_logevidence(seg, upto):
        # sequential predictive product over the slice (independent
        # coding path: recompute from raw values each time)
        mu, kappa, alpha, beta = mu0, kappa0, alpha0, beta0
        total = 0.0
        for x in seg[:upto]:
            df = 2.0 * alpha
            s2 = beta * (kappa + 1.0) / (alpha * kappa)
            total += (
                lgamma((df + 1.0) / 2.0)
                - lgamma(df / 2.0)
                - 0.5 * (log(df) + log(pi) + log(s2))
                - (df + 1.0) / 2.0 * log(1.0 + (x - mu) ** 2 / (df * s2))
            )
            beta = beta + kappa * (x - mu) ** 2 / (2.0 * (kappa + 1.0))
            mu = (kappa * mu + x) / (kappa + 1.0)
            kappa += 1.0
            alpha += 0.5
        return total

    maxes = np.zeros(n, dtype=np.int64)
    # P(r_t = r) ∝ evidence of last r+1 points as one segment started
    # after a changepoint, times the prior over segmentations of the
    # prefix — replicate by dynamic programming over changepoint sets
    # is exponential; instead verify against the SAME recursion but
    # recomputing each growth evidence from raw slices.
    logp = np.array([0.0])
    for t in range(n):
        preds = np.array(
            [
                seg_logevidence(y[t - rl : t + 1], rl + 1)
                - seg_logevidence(y[t - rl : t], rl)
                for rl in range(len(logp))
            ]
        )
        growth = logp + preds + log(1.0 - hazard)
        cp = logp + preds + log(hazard)
        logp = np.concatenate(
            ([np.logaddexp.reduce(cp)], growth)
        )
        logp = logp - np.logaddexp.reduce(logp)
        maxes[t] = int(np.argmax(logp))
    return maxes


@pytest.mark.parametrize("seed", [0, 1])
def test_bocd_matches_slice_recompute(seed):
    rng = np.random.default_rng(seed)
    y = np.concatenate(
        [rng.normal(0, 1, 15), rng.normal(6, 1, 15)]
    )
    got = bocd_gaussian(y, 0.05, float(np.mean(y)))
    want = bocd_brute(y, 0.05, float(np.mean(y)))
    assert np.array_equal(got, want)


def test_bocd_detects_planted_shift():
    rng = np.random.default_rng(5)
    y = np.concatenate(
        [rng.normal(0, 1, 40), rng.normal(8, 1, 40)]
    )
    rl = bocd_gaussian(y, 0.02, float(np.mean(y)))
    resets = np.sum(np.diff(rl) < 0)
    assert resets >= 1
    # run length resets near the planted point (within 3 steps)
    reset_points = np.where(np.diff(rl) < 0)[0] + 1
    assert np.min(np.abs(reset_points - 40)) <= 3
