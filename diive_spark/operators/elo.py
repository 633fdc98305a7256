"""Elo ratings from daily pairwise standings, per league.

The classic Elo (1978) update over a calendar of daily "matches":
on each day every pair of competitors (here: event types, ranked by
daily count with a deterministic name tiebreak) plays once; ratings
update in BATCH per day (all expected scores use start-of-day
ratings), R_i += K * (S_ij - E_ij), E_ij = 1/(1 + 10^((R_j - R_i)/400)).

diive counterpart: none — paired-comparison strength tracking is out
of scope for diive; here it rounds out the ranking-model family next
to the closed-form Bradley-Terry / Plackett-Luce MM fits.

Scale shape: the input collapses to the (day x competitor) calendar
layer BEFORE the kernel — bounded by the calendar and the competitor
count, not the corpus — so the single sequential group is tiny by
construction; the heavy lifting (daily counts) is a combinable
distributed agg upstream.

Not SQL-expressible: the day-over-day rating recursion is a
non-associative fold (each day's update depends on all previous
updates), so this ships rows-only, pinned by tests/test_elo.py
against an independent brute-force loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["elo_fold", "elo_daily"]


def elo_fold(
    days: np.ndarray,
    keys: np.ndarray,
    scores: np.ndarray,
    k_factor: float = 32.0,
    base: float = 1500.0,
) -> dict[str, float]:
    """Fold the daily standings into final Elo ratings.

    ``days``/``keys``/``scores`` are parallel arrays; within a day,
    competitor A beats B iff (score, key) orders A first (exact total
    order).  Updates are batched per day.
    """
    order = np.lexsort((keys, days))
    days = days[order]
    keys = keys[order]
    scores = scores[order]
    ratings: dict[str, float] = {}
    for d in np.unique(days):
        m = days == d
        ks = keys[m]
        cs = scores[m]
        for key in ks:
            ratings.setdefault(str(key), base)
        start = {str(key): ratings[str(key)] for key in ks}
        delta: dict[str, float] = {str(key): 0.0 for key in ks}
        n = len(ks)
        for a in range(n):
            for b in range(a + 1, n):
                ka, kb = str(ks[a]), str(ks[b])
                # exact total order: higher score wins; ties -> the
                # LOWER key wins (stable deterministic convention)
                if cs[a] == cs[b]:
                    sa = 1.0 if ka < kb else 0.0
                elif cs[a] > cs[b]:
                    sa = 1.0
                else:
                    sa = 0.0
                ea = 1.0 / (
                    1.0 + 10.0 ** ((start[kb] - start[ka]) / 400.0)
                )
                delta[ka] += k_factor * (sa - ea)
                delta[kb] += k_factor * ((1.0 - sa) - (1.0 - ea))
        for key, dv in delta.items():
            ratings[key] += dv
    return ratings


def elo_daily(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    score_col: str,
    k_factor: float = 32.0,
) -> DataFrame:
    """Per competitor: final Elo after folding the day-layer table.

    The single-group kernel is intentional: the input is the bounded
    calendar layer (days x competitors), not the event stream.
    """
    schema = f"{key_col} string, n_days long, elo double"

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        ratings = elo_fold(
            pdf[day_col].to_numpy(np.int64),
            pdf[key_col].to_numpy(dtype=object),
            pdf[score_col].to_numpy(np.int64),
            k_factor=k_factor,
        )
        nd = pdf.groupby(key_col)[day_col].nunique()
        out = pd.DataFrame(
            {
                key_col: sorted(ratings),
                "n_days": [int(nd.get(k, 0)) for k in sorted(ratings)],
                "elo": [ratings[k] for k in sorted(ratings)],
            }
        )
        return out

    return (
        daily.select(key_col, day_col, score_col)
        .repartition(1)
        .groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _, pdf: apply(pdf), schema=schema
        )
    )
