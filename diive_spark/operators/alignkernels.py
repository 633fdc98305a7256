"""Pairwise sequence-alignment kernels: Needleman-Wunsch global
score, Smith-Waterman local score, and longest-common-subsequence
length, as numpy DP sweeps inside a grouped Arrow kernel.

Used to score documents against their source's representative (the
min-doc_id member) — the alignment-based near-duplicate triage that
complements the hash family (MinHash/SimHash judge SETS of shingles;
alignment scores judge ORDER-preserving overlap, the signal that
separates re-orderings from true revisions).

Scoring: match +2, mismatch -1, gap -1 (affine-free), the classic
unit scheme.  All DP sweeps are O(n*m) with rolling rows; inputs are
clipped to a fixed prefix so per-pair cost is bounded (128^2 cells).

diive counterpart: none (public literature: Needleman & Wunsch 1970,
Smith & Waterman 1981).  Scale shape: per-source Arrow batches — the
representative join is per-group inside the kernel, never a global
collect; pair fanout is bounded by the sample_mod decimation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["nw_score", "sw_score", "lcs_len", "align_frame"]

MATCH, MISMATCH, GAP = 2, -1, -1


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)


def nw_score(a: str, b: str) -> int:
    """Global alignment score (match +2 / mismatch -1 / gap -1)."""
    x, y = _codes(a), _codes(b)
    n, m = len(x), len(y)
    prev = np.arange(m + 1, dtype=np.int64) * GAP
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i * GAP
        sub = np.where(y == x[i - 1], MATCH, MISMATCH)
        diag = prev[:-1] + sub
        up = prev[1:] + GAP
        np.maximum(diag, up, out=diag)
        # left dependency is sequential: resolve with a running scan
        best = cur[0]
        for j in range(1, m + 1):
            best = max(diag[j - 1], best + GAP)
            cur[j] = best
        prev = cur
    return int(prev[m])


def sw_score(a: str, b: str) -> int:
    """Local alignment score (Smith-Waterman, same unit scheme)."""
    x, y = _codes(a), _codes(b)
    n, m = len(x), len(y)
    prev = np.zeros(m + 1, dtype=np.int64)
    hi = 0
    for i in range(1, n + 1):
        cur = np.zeros(m + 1, dtype=np.int64)
        sub = np.where(y == x[i - 1], MATCH, MISMATCH)
        diag = prev[:-1] + sub
        up = prev[1:] + GAP
        np.maximum(diag, up, out=diag)
        np.maximum(diag, 0, out=diag)
        best = 0
        for j in range(1, m + 1):
            best = max(diag[j - 1], best + GAP, 0)
            cur[j] = best
        hi = max(hi, int(cur.max()))
        prev = cur
    return hi


def lcs_len(a: str, b: str) -> int:
    """Longest common subsequence length."""
    x, y = _codes(a), _codes(b)
    n, m = len(x), len(y)
    prev = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.zeros(m + 1, dtype=np.int64)
        eq = y == x[i - 1]
        for j in range(1, m + 1):
            if eq[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev = cur
    return int(prev[m])


def align_frame(
    df: DataFrame,
    key_col: str,
    id_col: str,
    text_col: str,
    prefix_len: int = 128,
    sample_mod: int = 5,
) -> DataFrame:
    """Per key: alignment-score profile of sampled members against the
    key's representative (min id).  Rows-only kernel."""
    schema = (
        f"{key_col} string, n_members long, n_scored long,"
        " mean_nw double, mean_sw double, max_sw long,"
        " mean_lcs double, max_lcs_ratio double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        rep = str(pdf[text_col].iloc[0])[:prefix_len]
        sel = pdf[(pdf[id_col] % sample_mod == 0)
                  & (pdf[id_col] != pdf[id_col].iloc[0])]
        nws, sws, lcss, ratios = [], [], [], []
        for t in sel[text_col]:
            t = str(t)[:prefix_len]
            nws.append(nw_score(rep, t))
            sws.append(sw_score(rep, t))
            lc = lcs_len(rep, t)
            lcss.append(lc)
            denom = max(1, min(len(rep), len(t)))
            ratios.append(lc / denom)
        k = len(nws)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_members": [len(pdf)],
                "n_scored": [k],
                "mean_nw": [float(np.mean(nws)) if k else float("nan")],
                "mean_sw": [float(np.mean(sws)) if k else float("nan")],
                "max_sw": [int(max(sws)) if k else 0],
                "mean_lcs": [float(np.mean(lcss)) if k else float("nan")],
                "max_lcs_ratio": [float(max(ratios)) if k else 0.0],
            }
        )

    return (
        kernel_partition(df.select(key_col, id_col, text_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
