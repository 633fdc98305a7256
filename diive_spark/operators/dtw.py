"""Dynamic Time Warping distance between per-key profile vectors.

Classic DP (Sakoe & Chiba 1978; Berndt & Clifford KDD'94 for the data
mining use) with an optional Sakoe-Chiba band.  Use case here: shape
similarity between keys' diel (hour-of-day) profiles — e.g. "which
event types / domains have the same daily rhythm, even if phase-shifted
by an hour or two" — which plain euclidean distance gets wrong.

diive counterpart: none (diive compares series via Pearson correlation
per day, core/analyses/correlation.py); DTW is the standard robust
alternative for phase-misaligned shapes.

Scale shape: profiles are SMALL aggregates (24-168 points) computed by
a distributed groupBy first; the pairwise kernel then runs on the
key-pair grid.  All-pairs is quadratic in the number of KEYS, so the
operator takes the same ``allow_full_scan`` stance as the dedup family:
callers at crawl scale must block (e.g. by language / domain-cluster)
before pairing; the kernel itself is O(m*n) per pair with bounded
state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dtw_kernel", "pairwise_dtw"]

_UDFS: dict = {}


def dtw_kernel(
    a: np.ndarray, b: np.ndarray, band: int | None = None,
    znorm: bool = True,
) -> float:
    """DTW distance (euclidean local cost) between two vectors with an
    optional Sakoe-Chiba band of half-width ``band``."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if znorm:
        sa = a.std()
        sb = b.std()
        a = (a - a.mean()) / sa if sa > 1e-13 else a - a.mean()
        b = (b - b.mean()) / sb if sb > 1e-13 else b - b.mean()
    m, n = len(a), len(b)
    if band is None:
        band = max(m, n)
    D = np.full((m + 1, n + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, m + 1):
        lo = max(1, i - band)
        hi = min(n, i + band)
        d = (a[i - 1] - b[lo - 1 : hi]) ** 2
        for j in range(lo, hi + 1):
            D[i, j] = d[j - lo] + min(
                D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]
            )
    return float(np.sqrt(D[m, n]))


def pairwise_dtw(
    profiles: DataFrame,
    key_col: str,
    vec_col: str,
    band: int | None = None,
    znorm: bool = True,
) -> DataFrame:
    """All ordered pairs (key_a < key_b) with their DTW distance.
    ``profiles`` has one row per key with an array<double> profile."""
    if band is not None and band < 0:
        raise ValueError("band must be >= 0")
    a = profiles.select(
        F.col(key_col).alias("key_a"), F.col(vec_col).alias("_va")
    )
    b = profiles.select(
        F.col(key_col).alias("key_b"), F.col(vec_col).alias("_vb")
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))

    ukey = ("dtw", band, znorm)
    if ukey not in _UDFS:

        @F.pandas_udf("double")
        def _d(va: pd.Series, vb: pd.Series) -> pd.Series:
            out = np.empty(len(va))
            for i in range(len(va)):
                out[i] = dtw_kernel(
                    np.asarray(va.iloc[i], dtype=np.float64),
                    np.asarray(vb.iloc[i], dtype=np.float64),
                    band=band, znorm=znorm,
                )
            return pd.Series(out)

        _UDFS[ukey] = _d
    return pairs.select(
        "key_a", "key_b", _UDFS[ukey]("_va", "_vb").alias("dtw")
    )
