"""0-dimensional sublevel-set persistence (the TDA summary of a 1-D
signal) and DGIM sliding-window bit counting (Datar-Gionis-Indyk-
Motwani 2002), as grouped Arrow kernels over per-key series.

Persistence: process vertices of the path complex in increasing
value order with union-find; when two components merge, the one with
the HIGHER birth value dies (elder rule), emitting the finite bar
(birth, death).  The global minimum's bar is essential (never dies)
and is reported separately.  Ties break by index (left first), making
the diagram deterministic for integer-quantized inputs.

DGIM: maintain an exponential histogram of 1-positions with at most
two buckets per power-of-two size; the windowed estimate is the sum
of full bucket sizes plus half the (partially expired) oldest bucket.
Guarantees relative error <= 50% using O(log^2 N) bits of state — the
canonical bounded-state streaming counter, audited here against the
exact trailing-window count.

diive counterpart: none (public literature: Edelsbrunner-Letscher-
Zomorodian 2002 persistence pairing; DGIM in Motwani et al., SODA
2002).  Scale shape: one Arrow batch per key (the seqkernels
posture); monster series chunk via operators/chunking.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = [
    "sublevel_persistence",
    "persistence_frame",
    "dgim_estimate_trace",
    "dgim_frame",
]


def sublevel_persistence(y: np.ndarray) -> tuple[np.ndarray, float]:
    """Finite 0-dim persistence pairs of the sublevel filtration of a
    path-connected 1-D series.

    Returns (pairs, essential_birth): pairs is an (m, 2) float array of
    (birth, death) rows sorted by (death - birth) descending then birth
    ascending; essential_birth is the global-min birth whose bar never
    dies.
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n == 0:
        return np.empty((0, 2)), float("nan")
    order = np.lexsort((np.arange(n), y))  # value asc, index asc
    parent = np.full(n, -1, dtype=np.int64)  # -1 = not yet entered
    birth = np.empty(n, dtype=np.float64)  # birth value of root's comp

    def find(i: int) -> int:
        r = i
        while parent[r] != r:
            r = parent[r]
        while parent[i] != r:
            parent[i], i = r, parent[i]
        return r

    pairs = []
    for i in order:
        parent[i] = i
        birth[i] = y[i]
        for j in (i - 1, i + 1):
            if 0 <= j < n and parent[j] != -1:
                ri, rj = find(i), find(j)
                if ri == rj:
                    continue
                # elder rule: the component with the higher birth dies
                if (birth[ri], ri) < (birth[rj], rj):
                    elder, younger = ri, rj
                else:
                    elder, younger = rj, ri
                if birth[younger] < y[i]:
                    pairs.append((birth[younger], y[i]))
                parent[younger] = elder
    pr = np.array(pairs, dtype=np.float64).reshape(-1, 2)
    if len(pr):
        pers = pr[:, 1] - pr[:, 0]
        idx = np.lexsort((pr[:, 0], -pers))
        pr = pr[idx]
    return pr, float(y.min())


def persistence_frame(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Per key: bar count, total/max persistence and the top bar of the
    time-ordered series' sublevel filtration (rows-only kernel)."""
    schema = (
        f"{key_col} string, n long, n_bars long, total_persistence double,"
        " max_persistence double, top_birth double, top_death double,"
        " essential_birth double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        pr, ess = sublevel_persistence(y)
        pers = pr[:, 1] - pr[:, 0] if len(pr) else np.zeros(0)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [len(y)],
                "n_bars": [len(pr)],
                "total_persistence": [float(pers.sum())],
                "max_persistence": [float(pers.max()) if len(pr) else 0.0],
                "top_birth": [float(pr[0, 0]) if len(pr) else float("nan")],
                "top_death": [float(pr[0, 1]) if len(pr) else float("nan")],
                "essential_birth": [ess],
            }
        )

    return (
        kernel_partition(df.select(key_col, ts_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )


def dgim_estimate_trace(
    bits: np.ndarray, window: int, checkpoints: np.ndarray
) -> np.ndarray:
    """DGIM estimates of the count of 1s in the trailing `window` items
    at each checkpoint index (inclusive position, 0-based).

    State: list of (timestamp, size) buckets, newest first, at most two
    of each power-of-two size.
    """
    bits = np.asarray(bits, dtype=np.int64)
    checkpoints = np.asarray(checkpoints, dtype=np.int64)
    buckets: list[tuple[int, int]] = []  # (right-end timestamp, size)
    out = np.zeros(len(checkpoints), dtype=np.float64)
    cset = {int(c): k for k, c in enumerate(checkpoints)}
    for t, b in enumerate(bits):
        # expire
        while buckets and buckets[-1][0] <= t - window:
            buckets.pop()
        if b:
            buckets.insert(0, (t, 1))
            # merge oldest two of any size appearing three times
            size = 1
            while True:
                idxs = [k for k, (_, s) in enumerate(buckets) if s == size]
                if len(idxs) < 3:
                    break
                a, bb = idxs[-2], idxs[-1]
                merged = (buckets[a][0], size * 2)
                del buckets[bb]
                buckets[a] = merged
                size *= 2
        if t in cset:
            if buckets:
                est = sum(s for _, s in buckets[:-1]) + buckets[-1][1] / 2.0
                # the oldest bucket contributes half (partial expiry)
                if len(buckets) == 1:
                    est = buckets[0][1] / 2.0 if buckets[0][1] > 1 else 1.0
            else:
                est = 0.0
            out[cset[t]] = est
    return out


def dgim_frame(
    df: DataFrame,
    key_col: str,
    ts_col: str | list[str],
    bit_col: str,
    window: int = 1024,
) -> DataFrame:
    """Per key: DGIM estimate vs exact trailing-window ones count at the
    final position, plus the worst relative error over 8 evenly spaced
    checkpoints (rows-only audit kernel)."""
    schema = (
        f"{key_col} string, n long, window long, exact_last long,"
        " dgim_last double, rel_err_last double, max_rel_err double"
    )

    ts_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_cols)
        bits = pdf[bit_col].to_numpy(dtype=np.int64)
        n = len(bits)
        cps = np.unique(
            np.linspace(max(0, n // 8), n - 1, 8).astype(np.int64)
        )
        est = dgim_estimate_trace(bits, window, cps)
        cs = np.concatenate([[0], np.cumsum(bits)])
        exact = np.array(
            [cs[c + 1] - cs[max(0, c + 1 - window)] for c in cps],
            dtype=np.float64,
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = np.where(exact > 0, np.abs(est - exact) / exact, 0.0)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [n],
                "window": [window],
                "exact_last": [int(exact[-1])],
                "dgim_last": [float(est[-1])],
                "rel_err_last": [float(rel[-1])],
                "max_rel_err": [float(rel.max())],
            }
        )

    return (
        kernel_partition(df.select(key_col, *ts_cols, bit_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
