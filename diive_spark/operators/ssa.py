"""Singular spectrum analysis (Broomhead-King 1986, Golyandina 2001):
embed the series in an L-lag trajectory matrix, eigendecompose the
L x L lag-covariance S = X X', and read the eigenvalue spectrum —
the model-free decomposition whose leading shares measure how much
of the series is low-rank structure (trend + oscillations) vs noise.

Reported: top-3 eigenvalue shares, the spectral effective rank
exp(H(lambda/sum)) (Roy-Vetterli), and the full-reconstruction
residual (diagonal averaging of ALL components must reproduce the
series — the exactness pin).

diive counterpart: none.  Scale shape: per-key Arrow batch; L = 24
keeps the eigenproblem constant-size regardless of series length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["ssa_spectrum", "ssa_frame"]


def _trajectory(y: np.ndarray, L: int) -> np.ndarray:
    K = len(y) - L + 1
    idx = np.arange(L)[:, None] + np.arange(K)[None, :]
    return y[idx]


def ssa_spectrum(
    y: np.ndarray, L: int = 24
) -> tuple[np.ndarray, float, float]:
    """Eigenvalue spectrum of the SSA lag-covariance.

    Returns (eigenvalues desc, effective rank, full-reconstruction
    max abs residual)."""
    y = np.asarray(y, dtype=np.float64)
    if len(y) < 2 * L:
        return np.zeros(0), float("nan"), float("nan")
    x = _trajectory(y, L)
    s = x @ x.T
    lam, vec = np.linalg.eigh(s)
    lam = lam[::-1]
    vec = vec[:, ::-1]
    lam = np.maximum(lam, 0.0)
    tot = lam.sum()
    p = lam[lam > 0] / tot
    erank = float(np.exp(-(p * np.log(p)).sum()))
    # full reconstruction: sum of elementary matrices == X, diagonal
    # averaging recovers y exactly (up to float error)
    recon = vec @ (vec.T @ x)
    out = np.zeros(len(y))
    cnt = np.zeros(len(y))
    L_, K = recon.shape
    for i in range(L_):
        out[i : i + K] += recon[i]
        cnt[i : i + K] += 1.0
    resid = float(np.max(np.abs(out / cnt - y)))
    return lam, erank, resid


def ssa_frame(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, L: int = 24
) -> DataFrame:
    """Per key: SSA top-3 eigen shares, effective rank, and the
    reconstruction residual (rows-only kernel)."""
    schema = (
        f"{key_col} string, n long, l long, share1 double,"
        " share2 double, share3 double, eff_rank double,"
        " recon_resid double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        lam, erank, resid = ssa_spectrum(y, L)
        tot = lam.sum() if len(lam) else float("nan")
        sh = [
            float(lam[i] / tot) if len(lam) > i else float("nan")
            for i in range(3)
        ]
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [len(y)],
                "l": [L],
                "share1": [sh[0]],
                "share2": [sh[1]],
                "share3": [sh[2]],
                "eff_rank": [erank],
                "recon_resid": [resid],
            }
        )

    return (
        kernel_partition(df.select(key_col, ts_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
