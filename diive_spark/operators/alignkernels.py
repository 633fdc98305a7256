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
    """Global alignment score (match +2 / mismatch -1 / gap -1).

    The left-gap dependency b_j = max(d_{j-1}, b_{j-1} + GAP) is a
    prefix max in disguise: with unit gaps, b_j + j =
    max_{k<=j}(d_{k-1} + k), so each row is one maximum.accumulate."""
    x, y = _codes(a), _codes(b)
    n, m = len(x), len(y)
    prev = np.arange(m + 1, dtype=np.int64) * GAP
    idx = np.arange(1, m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        sub = np.where(y == x[i - 1], MATCH, MISMATCH)
        diag = prev[:-1] + sub
        np.maximum(diag, prev[1:] + GAP, out=diag)
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i * GAP
        c = np.maximum.accumulate(
            np.maximum(diag + idx, cur[0])
        )
        cur[1:] = c - idx
        prev = cur
    return int(prev[m])


def sw_score(a: str, b: str) -> int:
    """Local alignment score (Smith-Waterman, same unit scheme)."""
    x, y = _codes(a), _codes(b)
    n, m = len(x), len(y)
    prev = np.zeros(m + 1, dtype=np.int64)
    idx = np.arange(1, m + 1, dtype=np.int64)
    hi = 0
    for i in range(1, n + 1):
        sub = np.where(y == x[i - 1], MATCH, MISMATCH)
        diag = prev[:-1] + sub
        np.maximum(diag, prev[1:] + GAP, out=diag)
        np.maximum(diag, 0, out=diag)
        # b_j = max(d_{j-1}, b_{j-1}+GAP, 0): same prefix-max trick
        cur = np.zeros(m + 1, dtype=np.int64)
        c = np.maximum.accumulate(np.maximum(diag + idx, idx))
        cur[1:] = c - idx
        hi = max(hi, int(cur.max()))
        prev = cur
    return hi


def lcs_len(a: str, b: str) -> int:
    """Longest common subsequence length."""
    x, y = _codes(a), _codes(b)
    n, m = len(x), len(y)
    prev = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        # rows are non-decreasing, so cur[j] = max(prev[j],
        # max_{k<=j}(prev[k-1] + eq_k)) — one accumulate per row
        eq = (y == x[i - 1]).astype(np.int64)
        cur = np.zeros(m + 1, dtype=np.int64)
        cand = np.maximum.accumulate(prev[:-1] + eq)
        cur[1:] = np.maximum(prev[1:], cand)
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
