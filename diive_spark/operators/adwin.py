"""ADWIN2 adaptive-windowing drift detection (Bifet & Gavalda, SDM
2007) as a bounded-state streaming kernel.

The window is an exponential histogram of buckets (count, sum, sum of
squares) with at most MAXB buckets per power-of-two capacity, so the
state is O(log^2 n) while the detector behaves like a window that
grows on stationarity and shrinks on change.  After each insert the
detector checks every bucket boundary: writing the split as W = W0·W1
(older·newer), a change is flagged when

    |mean(W1) - mean(W0)| >= eps_cut
    eps_cut = sqrt(2/m * var(W) * ln(2/d')) + 2/(3m) * ln(2/d')
    m = 1/(1/n0 + 1/n1),  d' = delta / n

and the oldest bucket is dropped (repeatedly, until no boundary
cuts).  Detections report the 1-based element position.

Complements the drift family (ks/psi/char-kl compare FIXED windows;
page_hinkley/cusum track a reference mean) with the canonical
self-sizing window.  diive counterpart: none; public literature only.
Scale shape: per-key Arrow batch (lru/dgim posture), O(log^2 n)
state, deterministic for a deterministic input order.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["adwin_step", "adwin_detect", "adwin_frame"]

MAXB = 5  # buckets kept per capacity before the oldest two merge


def adwin_step(
    buckets: list[list[float]], v: float, delta: float
) -> bool:
    """Insert one value into the bucket state (newest-first rows of
    [capacity, count, sum, sumsq]), compress, and shrink on cuts.
    Returns True if any cut happened.  Shared verbatim by the batch
    sweep and the streaming twin so replay equality is structural."""
    buckets.insert(0, [1, 1, float(v), float(v) * float(v)])
    cap = 1
    while True:
        idxs = [k for k, b in enumerate(buckets) if b[0] == cap]
        if len(idxs) <= MAXB:
            break
        a, bb = idxs[-2], idxs[-1]  # two oldest of this capacity
        buckets[a] = [
            cap * 2,
            buckets[a][1] + buckets[bb][1],
            buckets[a][2] + buckets[bb][2],
            buckets[a][3] + buckets[bb][3],
        ]
        del buckets[bb]
        cap *= 2
    any_cut = False
    # check cuts, oldest-boundary first, repeat while shrinking
    while len(buckets) > 1:
        n = sum(b[1] for b in buckets)
        s = sum(b[2] for b in buckets)
        ss = sum(b[3] for b in buckets)
        var = max(0.0, ss / n - (s / n) * (s / n))
        dp = delta / max(n, 1)
        ln2d = math.log(2.0 / dp)
        cut = False
        n1 = 0.0
        s1 = 0.0
        # walk boundaries from newest side, accumulate W1 (newer)
        for k in range(len(buckets) - 1):
            n1 += buckets[k][1]
            s1 += buckets[k][2]
            n0 = n - n1
            s0 = s - s1
            if n0 < 1 or n1 < 1:
                continue
            m = 1.0 / (1.0 / n0 + 1.0 / n1)
            eps = math.sqrt(2.0 / m * var * ln2d) + 2.0 / (
                3.0 * m
            ) * ln2d
            if abs(s1 / n1 - s0 / n0) >= eps:
                cut = True
                break
        if not cut:
            break
        buckets.pop()  # drop the oldest bucket
        any_cut = True
    return any_cut


def adwin_detect(
    x: np.ndarray, delta: float = 0.002
) -> tuple[list[int], int, float]:
    """Run ADWIN2 over the sequence; return (detection positions
    (1-based), final window length, final window mean)."""
    x = np.asarray(x, dtype=np.float64)
    # buckets newest-first: (capacity, count, sum, sumsq)
    buckets: list[list[float]] = []
    detections: list[int] = []
    for t, v in enumerate(x, start=1):
        if adwin_step(buckets, float(v), delta):
            if not detections or detections[-1] != t:
                detections.append(t)
    n = sum(b[1] for b in buckets)
    s = sum(b[2] for b in buckets)
    return detections, int(n), (s / n if n else float("nan"))


def adwin_frame(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    delta: float = 0.002,
) -> DataFrame:
    """Per key: ADWIN detection summary over the ordered value stream
    (rows-only kernel)."""
    schema = (
        f"{key_col} string, n long, n_detections long,"
        " first_detection long, last_detection long,"
        " final_window long, final_mean double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        det, win, mean = adwin_detect(vals, delta)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [len(vals)],
                "n_detections": [len(det)],
                "first_detection": [det[0] if det else 0],
                "last_detection": [det[-1] if det else 0],
                "final_window": [win],
                "final_mean": [mean],
            }
        )

    return (
        kernel_partition(df.select(key_col, *order_cols, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
