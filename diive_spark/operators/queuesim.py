"""Queue and cache replay kernels: the Lindley recursion (single-
server FIFO waiting times) and Belady's clairvoyant OPT cache — the
two canonical "replay the log against the ideal" audits.

Lindley (1952): W_{n+1} = max(0, W_n + S_n - A_n) gives each
customer's queueing delay from interarrival gaps A and service times
S; the empirical mean is the ground truth that the P-K formula
(mg1_pollaczek_wait) approximates, so the frame emits both and the
gap between them IS the model-error readout.

Belady (1966) OPT: on a miss with a full cache, evict the block
whose next use is farthest in the future — the offline-optimal hit
rate every online policy (see lru_hit_curve) is judged against.

diive counterpart: none.  Scale shape: per-key Arrow batches; both
sweeps are O(n) / O(n * C) with bounded state (the lru/dgim posture).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = [
    "lindley_waits",
    "lindley_frame",
    "belady_opt_hits",
    "belady_frame",
]


def lindley_waits(
    arrivals: np.ndarray, services: np.ndarray
) -> np.ndarray:
    """FIFO waits via the Lindley recursion; arrivals ascending (same
    units as services)."""
    a = np.asarray(arrivals, dtype=np.float64)
    s = np.asarray(services, dtype=np.float64)
    n = len(a)
    w = np.zeros(n)
    for i in range(1, n):
        w[i] = max(0.0, w[i - 1] + s[i - 1] - (a[i] - a[i - 1]))
    return w


def lindley_frame(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    service_col: str,
) -> DataFrame:
    """Per key: empirical Lindley mean/p95 wait and delay fraction,
    plus the P-K prediction from the same moments (rows-only)."""
    schema = (
        f"{key_col} string, n long, rho double, mean_wait double,"
        " p95_wait double, frac_delayed double, pk_wait double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        a = pdf[ts_col].to_numpy(dtype=np.float64)
        s = pdf[service_col].to_numpy(dtype=np.float64)
        n = len(a)
        w = lindley_waits(a, s)
        span = a[-1] - a[0] if n > 1 else 1.0
        lam = (n - 1) / span if span > 0 else float("nan")
        rho = lam * s.mean()
        pk = (
            lam * np.mean(s * s) / (2.0 * (1.0 - rho))
            if rho < 1
            else float("inf")
        )
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [n],
                "rho": [float(rho)],
                "mean_wait": [float(w.mean())],
                "p95_wait": [float(np.quantile(w, 0.95))],
                "frac_delayed": [float((w > 0).mean())],
                "pk_wait": [float(pk)],
            }
        )

    return (
        kernel_partition(df.select(key_col, ts_col, service_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )


def belady_opt_hits(refs: np.ndarray, cache_size: int) -> int:
    """Hit count of Belady's OPT policy with the given capacity.

    Next-use indices are precomputed; on a full-cache miss the block
    with the farthest next use is evicted (never-used-again first,
    ties by larger key for determinism)."""
    refs = np.asarray(refs)
    n = len(refs)
    nxt = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    last: dict = {}
    for i in range(n - 1, -1, -1):
        k = refs[i]
        nxt[i] = last.get(k, np.iinfo(np.int64).max)
        last[k] = i
    cache: dict = {}  # key -> next use index
    hits = 0
    for i in range(n):
        k = refs[i]
        if k in cache:
            hits += 1
        elif len(cache) >= cache_size:
            evict = max(cache, key=lambda q: (cache[q], q))
            del cache[evict]
        cache[k] = nxt[i]
    return hits


def belady_frame(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    ref_col: str,
    sizes: tuple[int, ...] = (1, 4, 16),
) -> DataFrame:
    """Per key: Belady OPT hit rates at the lru_hit_curve capacities —
    the offline-optimal bound for the online policies (rows-only)."""
    cols = ", ".join(f"opt_c{c} double" for c in sizes)
    schema = f"{key_col} string, n long, n_unique long, {cols}"

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        refs = pdf[ref_col].to_numpy()
        n = len(refs)
        row = {
            key_col: [pdf[key_col].iloc[0]],
            "n": [n],
            "n_unique": [len(set(refs.tolist()))],
        }
        for c in sizes:
            row[f"opt_c{c}"] = [
                belady_opt_hits(refs, c) / n if n else float("nan")
            ]
        return pd.DataFrame(row)

    return (
        kernel_partition(df.select(key_col, ts_col, ref_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
