"""Two bounded-space sketches that complete the sketch tier
(CMS / HLL / t-digest / quantile-sketch / DGIM already ship):

KLL quantile sketch (Karnin, Lang, Liberty, FOCS 2016), in the
deterministic-offset compactor form: geometric capacity levels
c_h = max(2, ceil(k (2/3)^(H-h))); a full compactor sorts and
promotes every other element (offset alternating per compaction —
the derandomized variant, which preserves the rank-error guarantee
in the worst case up to a constant).  Rank estimates carry level
weights 2^h.

Frequent Directions (Liberty, KDD 2013): an l x d matrix sketch B
with the deterministic guarantee  0 <= x'(A'A - B'B)x <= ||A||_F^2 * 2/l
for unit x — the covariance-sketch counterpart of Misra-Gries.  When
the buffer fills, SVD-shrink: sigma^2 -> sigma^2 - sigma_l^2.

diive counterpart: none.  Scale shape: both are one-pass bounded
state (the dgim posture); FD's periodic SVD is l x d with constant l.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = [
    "kll_sketch",
    "kll_rank",
    "kll_frame",
    "kll_merge",
    "kll_quantile",
    "frequent_directions",
    "fd_frame",
]


class KLL:
    __slots__ = ("k", "levels", "n", "_flips")

    def __init__(self, k: int = 64):
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._flips = 0

    def _cap(self, h: int) -> int:
        H = len(self.levels) - 1
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** (H - h))))

    def update(self, v: float) -> None:
        self.levels[0].append(float(v))
        self.n += 1
        h = 0
        while len(self.levels[h]) > self._cap(h):
            buf = sorted(self.levels[h])
            off = self._flips & 1
            self._flips += 1
            promoted = buf[off::2]
            self.levels[h] = []
            if h + 1 == len(self.levels):
                self.levels.append([])
            self.levels[h + 1].extend(promoted)
            h += 1


def kll_sketch(x: np.ndarray, k: int = 64) -> KLL:
    sk = KLL(k)
    for v in x:
        sk.update(float(v))
    return sk


def kll_merge(a: KLL, b: KLL) -> KLL:
    """Merge two KLL sketches (tier-partials path, plans/sketch_partials).

    Standard mergeable-summary construction: concatenate level buffers
    pairwise, then re-run the compaction loop bottom-up.  Deterministic
    (no randomness — the derandomized offset alternation continues from
    the summed flip counters), which is what lets the tier tests pin
    engine-merged state bit-equal to a direct Python fold.  NOT
    commutative bit-for-bit (like any KLL merge); the rank-error
    guarantee is preserved under any merge tree (Karnin-Lang-Liberty
    FOCS'16, Thm 2 mergeability)."""
    out = KLL(a.k)
    out.n = a.n + b.n
    out._flips = a._flips + b._flips
    H = max(len(a.levels), len(b.levels))
    out.levels = [
        (a.levels[h] if h < len(a.levels) else [])
        + (b.levels[h] if h < len(b.levels) else [])
        for h in range(H)
    ]
    h = 0
    while h < len(out.levels):
        while len(out.levels[h]) > out._cap(h):
            buf = sorted(out.levels[h])
            off = out._flips & 1
            out._flips += 1
            promoted = buf[off::2]
            out.levels[h] = []
            if h + 1 == len(out.levels):
                out.levels.append([])
            out.levels[h + 1].extend(promoted)
        h += 1
    return out


def kll_quantile(sk: KLL, q: float) -> float:
    """Smallest stored item whose estimated rank reaches q*n."""
    items: list[tuple[float, float]] = []
    for h, buf in enumerate(sk.levels):
        w = float(1 << h)
        items.extend((u, w) for u in buf)
    items.sort()
    target = q * sk.n
    cum = 0.0
    for v, w in items:
        cum += w
        if cum >= target:
            return v
    return items[-1][0] if items else float("nan")


def kll_rank(sk: KLL, v: float) -> float:
    """Estimated number of items <= v."""
    r = 0.0
    for h, buf in enumerate(sk.levels):
        w = float(1 << h)
        for u in buf:
            if u <= v:
                r += w
    return r


def kll_frame(
    df: DataFrame, key_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per key: worst relative rank error of the KLL sketch at the
    5/25/50/75/95 percent exact order statistics (rows-only audit)."""
    schema = (
        f"{key_col} string, n long, sketch_items long,"
        " max_rank_err double, p50_est double, p50_exact double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(x)
        sk = kll_sketch(x, k)
        xs = np.sort(x)
        errs = []
        p50e = p50x = float("nan")
        for q in (0.05, 0.25, 0.5, 0.75, 0.95):
            idx = min(n - 1, int(q * n))
            v = xs[idx]
            est = kll_rank(sk, v)
            exact = float(np.searchsorted(xs, v, side="right"))
            errs.append(abs(est - exact) / n)
            if q == 0.5:
                p50e, p50x = est, exact
        items = sum(len(b) for b in sk.levels)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [n],
                "sketch_items": [items],
                "max_rank_err": [float(max(errs))],
                "p50_est": [p50e],
                "p50_exact": [p50x],
            }
        )

    return (
        kernel_partition(df.select(key_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )


def frequent_directions(a: np.ndarray, ell: int) -> np.ndarray:
    """FD sketch B (ell x d) of the row stream A."""
    a = np.asarray(a, dtype=np.float64)
    _, d = a.shape
    b = np.zeros((ell, d))
    nz = 0
    for row in a:
        if nz == ell:
            _, s, vt = np.linalg.svd(b, full_matrices=False)
            s2 = np.maximum(s * s - s[-1] * s[-1], 0.0)
            nb = np.zeros((ell, d))
            nb[: len(s2)] = (np.sqrt(s2)[:, None]) * vt
            b = nb
            nz = int(np.count_nonzero(s2 > 1e-12))
        # place the row in the first (near-)zero slot
        b[nz if nz < ell else ell - 1] = row
        nz = min(nz + 1, ell)
    return b


def fd_frame(
    df: DataFrame, key_col: str, vec_col: str, ell: int = 16
) -> DataFrame:
    """Per key: FD covariance-sketch spectral error vs the Liberty
    bound 2 ||A||_F^2 / ell (rows-only audit)."""
    schema = (
        f"{key_col} string, n long, d long, ell long,"
        " spec_err double, bound double, within_bound long"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        a = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        n, d = a.shape
        b = frequent_directions(a, ell)
        diff = a.T @ a - b.T @ b
        lam = np.linalg.eigvalsh(diff)
        spec = float(max(abs(lam[0]), abs(lam[-1])))
        bound = 2.0 * float(np.sum(a * a)) / ell
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [n],
                "d": [d],
                "ell": [ell],
                "spec_err": [spec],
                "bound": [bound],
                "within_bound": [int(spec <= bound + 1e-9)],
            }
        )

    return (
        kernel_partition(df.select(key_col, vec_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
