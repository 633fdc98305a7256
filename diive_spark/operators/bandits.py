"""Off-policy bandit evaluation by replay (Li, Chu, Langford, Wang,
WSDM 2011): run a UCB1 policy (Auer et al. 2002) against a logged
event stream; a logged event is ACCEPTED when the policy's choice
matches the logged arm, and only accepted events update the policy —
the unbiased counterfactual estimator for uniformly-logged streams.

UCB1 index: mean_a + sqrt(2 ln T / n_a), untried arms first (by arm
name), ties by arm name — fully deterministic.  T counts accepted
plays (the replayed clock).

diive counterpart: none (public bandit literature).  Scale shape: the
policy state is O(arms); the replay itself is inherently sequential
over the logged order, so it runs as ONE documented single-partition
kernel per policy (the lru_hit_curve scope note) — at cluster scale
you shard by policy/segment key, not by time.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ucb1_replay", "ucb1_replay_frame"]


def ucb1_replay(
    arms: np.ndarray, rewards: np.ndarray
) -> tuple[dict[str, tuple[int, int]], int, int]:
    """Replay UCB1 over (logged arm, reward) pairs.

    Returns (per-arm {name: (plays, reward_sum)}, n_accepted,
    total_reward).

    Degenerate-stream note (ADVICE r4): arm names derive from the logged
    stream itself, so every named arm occurs at least once — but if some
    arm's only occurrences all precede the first occurrences of the other
    arms, the untried-first phase can deterministically propose that
    still-untried arm on every remaining round and accept nothing further
    (``n_accepted`` freezes).  Silent by design: replay evaluation
    (Li et al. 2011, WSDM — unbiased offline policy replay) only scores
    rounds where the policy's choice matches the log; a frozen stream just
    yields fewer accepted rounds, not a wrong estimate."""
    names = sorted(set(arms.tolist()))
    plays = {a: 0 for a in names}
    rsum = {a: 0 for a in names}
    t = 0
    accepted = 0
    total = 0
    for arm, rw in zip(arms.tolist(), rewards.tolist()):
        untried = [a for a in names if plays[a] == 0]
        if untried:
            choice = untried[0]
        else:
            scored = sorted(
                (
                    -(
                        rsum[a] / plays[a]
                        + math.sqrt(2.0 * math.log(t) / plays[a])
                    ),
                    a,
                )
                for a in names
            )
            choice = scored[0][1]
        if choice == arm:
            accepted += 1
            t += 1
            plays[arm] += 1
            rsum[arm] += int(rw)
            total += int(rw)
    return {a: (plays[a], rsum[a]) for a in names}, accepted, total


def ucb1_replay_frame(
    df: DataFrame,
    arm_col: str,
    order_cols: list[str],
    reward_col: str,
) -> DataFrame:
    """One global UCB1 replay over the ordered stream; returns one row
    per arm plus the replay totals (rows-only kernel; documented
    single-partition scope — shard by policy key at scale)."""
    schema = (
        f"{arm_col} string, plays long, reward_sum long,"
        " mean_reward double, n_stream long, n_accepted long,"
        " total_reward long"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        arms = pdf[arm_col].to_numpy()
        rw = pdf[reward_col].to_numpy(dtype=np.int64)
        per, acc, tot = ucb1_replay(arms, rw)
        names = sorted(per)
        return pd.DataFrame(
            {
                arm_col: names,
                "plays": [per[a][0] for a in names],
                "reward_sum": [per[a][1] for a in names],
                "mean_reward": [
                    per[a][1] / per[a][0] if per[a][0] else float("nan")
                    for a in names
                ],
                "n_stream": [len(arms)] * len(names),
                "n_accepted": [acc] * len(names),
                "total_reward": [tot] * len(names),
            }
        )

    one = df.select(
        F.lit("all").alias("_g"), arm_col, *order_cols, reward_col
    )
    return one.groupBy("_g").applyInPandas(
        apply, schema=schema
    )
