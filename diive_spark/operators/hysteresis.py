"""Schmitt-trigger (hysteresis) threshold episodes.

Alerting semantics over a rolled-up series: an episode OPENS when the
value reaches ``hi`` and stays open until it drops below ``lo`` (lo < hi),
so values chattering inside the [lo, hi) dead-band do not toggle state.
Plain single-threshold exceedance runs are the degenerate lo == hi case —
that variant is diive's setto_threshold flag (operators/flags.py, C3)
turned into episodes; the dead-band is what monitoring systems actually
deploy.

The state recurrence state_t = f(v_t, state_{t-1}) looks sequential, but
it collapses to a DECLARATIVE window: classify each row into a definite
signal (1 when v ≥ hi, 0 when v < lo, NULL in the dead-band), then the
state is simply the LAST non-null signal up to the current row —
``last(sig, ignorenulls=true)`` over the ordered key window, one pass, no
kernel, no iteration.  Episodes are then the gaps-and-islands runs of
state == 1 (same pattern as GapFinder A5,
/root/reference/diive/pkgs/analyses/gapfinder.py:58-117).

Plan shape: both windows share ONE (key) exchange; the per-episode
groupBy adds a second, narrow one (it shuffles only the in-episode rows,
keyed by (key, episode), which also rebalances a monster key's episodes
across tasks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hysteresis_episodes"]


def hysteresis_episodes(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts_s",
    value_col: str = "value",
    hi: float = 1.0,
    lo: float = 0.0,
) -> DataFrame:
    """One row per episode: (key, episode_no, start_s, end_s, peak,
    n_rows).  ``end_s`` is the last in-episode observation (the episode is
    still open at the series end if no value dropped below ``lo``)."""
    if not lo <= hi:
        raise ValueError("hysteresis needs lo <= hi")
    v = F.col(value_col)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    sig = F.when(v >= hi, F.lit(1)).when(v < lo, F.lit(0))
    st = df.withColumn(
        "_state",
        F.coalesce(F.last(sig, ignorenulls=True).over(cum), F.lit(0)),
    )
    opened = (
        (F.col("_state") == 1)
        & (F.coalesce(F.lag("_state").over(w), F.lit(0)) == 0)
    ).cast("long")
    epi = st.withColumn("_epi", F.sum(opened).over(cum)).filter(
        F.col("_state") == 1
    )
    return (
        epi.groupBy(key_col, F.col("_epi").alias("episode_no"))
        .agg(
            F.min(ts_col).alias("start_s"),
            F.max(ts_col).alias("end_s"),
            F.max(v).alias("peak"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
