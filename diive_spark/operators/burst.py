"""Kleinberg burst detection over event streams, per key.

Public algorithm: Kleinberg, "Bursty and Hierarchical Structure in
Streams" (KDD 2002).  Model a key's event inter-arrival gaps with a
k-state automaton whose state i emits gaps at rate g * s^i (g = overall
rate n/T); pay gamma * ln(n) to move up one state, nothing to move
down; Viterbi decode the min-cost state sequence.  Runs of state >= 1
are "bursts" — sustained elevated activity, the principled alternative
to a fixed events-per-hour threshold.

Web-crawl reading: a burst on a (domain, event_type) stream marks a
crawler hot-spot / recrawl storm — input for the politeness scheduler
(`text/crawl.py`) and the recrawl planner.

Scale shape: one grouped Arrow kernel per key (`kernel_partition`); the
Viterbi is O(n * k^2) with k states (k=2 default) and carries only two
rolling cost scalars — bounded state, no cross-key coupling.
"""

from __future__ import annotations

from math import log

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["burst_kernel", "burst_windows"]


def burst_kernel(
    ts: np.ndarray,
    n_states: int = 2,
    s: float = 2.0,
    gamma: float = 1.0,
) -> np.ndarray:
    """Viterbi state per gap (length len(ts) - 1) for one key's sorted
    event epoch-seconds.  State 0 = baseline, i >= 1 = burst level i."""
    ts = np.asarray(ts, dtype=np.float64)
    n = len(ts) - 1
    if n < 1:
        return np.zeros(0, dtype=np.int64)
    gaps = np.diff(ts)
    gaps = np.maximum(gaps, 1e-9)
    total = ts[-1] - ts[0]
    if total <= 0:
        return np.zeros(n, dtype=np.int64)
    g = n / total  # base rate
    rates = g * (s ** np.arange(n_states))
    trans_up = gamma * log(n + 1.0)

    # -ln exponential density: -ln(rate) + rate * x
    # the automaton starts in state 0 (Kleinberg §2: q_0 is the initial
    # state) — free entry to higher states would let a single short gap
    # at t=0 read as a burst
    cost = np.full(n_states, np.inf)
    cost[0] = 0.0
    back = np.zeros((n, n_states), dtype=np.int64)
    for t in range(n):
        emit = -np.log(rates) + rates * gaps[t]
        new = np.empty(n_states)
        for j in range(n_states):
            # transition cost from i to j: (j - i) * trans_up if j > i
            tc = np.where(
                np.arange(n_states) < j,
                (j - np.arange(n_states)) * trans_up,
                0.0,
            )
            tot = cost + tc
            i = int(np.argmin(tot))
            back[t, j] = i
            new[j] = tot[i] + emit[j]
        cost = new
    # backtrack
    states = np.zeros(n, dtype=np.int64)
    states[-1] = int(np.argmin(cost))
    for t in range(n - 2, -1, -1):
        states[t] = back[t + 1, states[t + 1]]
    return states


def burst_windows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    n_states: int = 2,
    s: float = 2.0,
    gamma: float = 1.0,
) -> DataFrame:
    """One row per maximal burst (state >= 1) run: (key, start_ts,
    end_ts, n_events, level)."""
    schema = (
        f"{key_col} string, start_s long, end_s long, "
        "n_events long, level long"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(pdf[ts_col].to_numpy(dtype=np.float64))
        states = burst_kernel(t, n_states=n_states, s=s, gamma=gamma)
        rows = []
        i = 0
        n = len(states)
        while i < n:
            if states[i] >= 1:
                j = i
                while j + 1 < n and states[j + 1] >= 1:
                    j += 1
                # gap i spans events i..i+1; run i..j spans events i..j+1
                rows.append(
                    (
                        pdf[key_col].iloc[0],
                        int(t[i]),
                        int(t[j + 1]),
                        j - i + 2,
                        int(states[i:j + 1].max()),
                    )
                )
                i = j + 1
            i += 1
        return pd.DataFrame(
            rows, columns=[key_col, "start_s", "end_s", "n_events", "level"]
        )

    return (
        kernel_partition(df.select(key_col, ts_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
