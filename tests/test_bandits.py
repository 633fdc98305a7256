"""Pins for the UCB1 replay evaluator (operators/bandits.py)."""

from __future__ import annotations

import math

import numpy as np

from diive_spark.operators.bandits import ucb1_replay


def slow_replay(arms, rewards):
    """Independent re-simulation with dict-of-lists state."""
    names = sorted(set(arms))
    hist = {a: [] for a in names}
    acc = tot = 0
    for a, r in zip(arms, rewards):
        untried = [x for x in names if not hist[x]]
        if untried:
            pick = untried[0]
        else:
            t = sum(len(v) for v in hist.values())
            best_val, pick = None, None
            for x in names:
                v = sum(hist[x]) / len(hist[x]) + math.sqrt(
                    2 * math.log(t) / len(hist[x])
                )
                if best_val is None or v > best_val:
                    best_val, pick = v, x
                # equal values keep the earlier (smaller) name
        if pick == a:
            hist[a].append(int(r))
            acc += 1
            tot += int(r)
    return {a: (len(hist[a]), sum(hist[a])) for a in names}, acc, tot


def test_matches_independent_simulation():
    rng = np.random.default_rng(0)
    arms = rng.choice(np.array(["a", "b", "c"]), size=3000)
    p = {"a": 0.7, "b": 0.4, "c": 0.1}
    rewards = np.array(
        [1 if rng.random() < p[a] else 0 for a in arms], dtype=np.int64
    )
    got = ucb1_replay(arms, rewards)
    want = slow_replay(arms.tolist(), rewards.tolist())
    assert got == want


def test_best_arm_dominates_plays():
    rng = np.random.default_rng(1)
    arms = rng.choice(np.array(["good", "meh", "poor"]), size=9000)
    p = {"good": 0.8, "meh": 0.3, "poor": 0.05}
    rewards = np.array(
        [1 if rng.random() < p[a] else 0 for a in arms], dtype=np.int64
    )
    per, acc, tot = ucb1_replay(arms, rewards)
    assert per["good"][0] > per["poor"][0]
    # replay acceptance is roughly 1/k for uniform logging
    assert 0.2 < acc / len(arms) < 0.5
    # estimated mean of the best arm is close to truth
    assert abs(per["good"][1] / per["good"][0] - 0.8) < 0.1


def test_deterministic_and_untried_first():
    arms = np.array(["b", "a", "a", "b", "c", "c"])
    rw = np.zeros(6, dtype=np.int64)
    out1 = ucb1_replay(arms, rw)
    out2 = ucb1_replay(arms.copy(), rw.copy())
    assert out1 == out2
    # first accepted play must be the lexicographically first arm
    per, acc, _ = out1
    assert acc >= 1
