"""Seasonal Hybrid ESD (S-H-ESD) anomaly detection, per series.

Public algorithm: Hochenbaum, Vallis & Kejariwal, "Automatic Anomaly
Detection in the Cloud Via Statistical Learning" (arXiv:1704.07706,
Twitter's AnomalyDetection R package).  The pipeline: remove the
seasonal component (robust per-phase median) and the series median, then
run a Generalized ESD test (Rosner 1983) on the residuals with median /
MAD replacing mean / std (the "hybrid" that keeps the test robust up to
~50% contamination).

diive counterpart: the point-wise outlier tier (zScore, Hampel) —
diive/pkgs/outlierdetection — which has no seasonal awareness and no
multiplicity-controlled stopping rule; S-H-ESD is the principled version
of "flag the k most extreme residuals".

No scipy in this container, so the Student-t quantile is computed from
the regularized incomplete beta (Lentz continued fraction, Abramowitz &
Stegun 26.5.8 / Numerical Recipes 6.4 formulation re-derived from the
math) + bisection; pinned against published t-table values in tests.

Scale shape: one grouped Arrow kernel per key via ``kernel_partition``
(bounded per-key state: the residual vector).  The GESD loop removes one
point per iteration — max_anoms bounds it (default 2% of n), so the
kernel is O(n * max_out).
"""

from __future__ import annotations

from math import exp, lgamma, log, sqrt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["t_ppf", "shesd_kernel", "shesd_anomalies"]


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 3e-15:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        lgamma(a + b) - lgamma(a) - lgamma(b) + a * log(x) + b * log(1.0 - x)
    )
    front = exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _t_cdf(t: float, df: float) -> float:
    """Student-t CDF via I_x(df/2, 1/2) with x = df / (df + t^2)."""
    if t == 0.0:
        return 0.5
    x = df / (df + t * t)
    p = 0.5 * _betainc(df / 2.0, 0.5, x)
    return 1.0 - p if t > 0 else p


def t_ppf(p: float, df: float) -> float:
    """Student-t quantile by bisection on the monotone CDF (p in (0,1))."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    if p == 0.5:
        return 0.0
    lo, hi = -1.0, 1.0
    while _t_cdf(lo, df) > p:
        lo *= 2.0
        if lo < -1e12:
            break
    while _t_cdf(hi, df) < p:
        hi *= 2.0
        if hi > 1e12:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if _t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-12 * max(1.0, abs(hi)):
            break
    return 0.5 * (lo + hi)


def shesd_kernel(
    y: np.ndarray,
    period: int,
    max_anoms: float = 0.02,
    alpha: float = 0.05,
    phase: np.ndarray | None = None,
) -> np.ndarray:
    """Indices of anomalous points in one series (grid order assumed).

    Residual = y - per-phase median - median(y); then GESD with
    median/MAD.  Returns the indices of the first j* removals where j*
    is the largest j whose test statistic exceeded its critical value.
    ``phase`` overrides the default positional phase (use the absolute
    grid slot mod period so gaps don't drift the seasonal alignment).
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    max_out = max(1, int(np.floor(max_anoms * n)))
    if n < period * 2 or n - max_out < 3:
        return np.zeros(0, dtype=np.int64)
    if phase is None:
        phase = np.arange(n) % period
    seasonal = np.zeros(n)
    for ph in range(period):
        sel = phase == ph
        seasonal[sel] = np.median(y[sel])
    resid = y - seasonal - np.median(y)

    live = np.arange(n)
    r = resid.copy()
    removed: list[int] = []
    n_sig = 0
    for j in range(1, max_out + 1):
        med = np.median(r)
        mad = 1.4826 * np.median(np.abs(r - med))
        if mad < 1e-12:
            break
        stat = np.abs(r - med) / mad
        i_loc = int(np.argmax(stat))
        r_j = float(stat[i_loc])
        removed.append(int(live[i_loc]))
        live = np.delete(live, i_loc)
        r = np.delete(r, i_loc)
        nn = n - j + 1  # points in the sample the j-th test saw
        pp = 1.0 - alpha / (2.0 * nn)
        t = t_ppf(pp, nn - 2)
        lam = (nn - 1) * t / sqrt((nn - 2 + t * t) * nn)
        if r_j > lam:
            n_sig = j
    return np.asarray(sorted(removed[:n_sig]), dtype=np.int64)


def shesd_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: int,
    max_anoms: float = 0.02,
    alpha: float = 0.05,
    key_type: str = "string",
    grid_step_s: int | None = None,
    fill: float = 0.0,
) -> DataFrame:
    """One row per detected anomaly: (key, ts_s, value).  ``ts_col``
    holds epoch seconds; with ``grid_step_s`` the kernel regrids
    in-kernel (missing slots -> ``fill``; 0 is right for count series)
    and phases are anchored to the ABSOLUTE slot index mod period, so
    e.g. step 3600 / period 24 always aligns phase to hour-of-day."""
    schema = f"{key_col} {key_type}, ts_s long, {value_col} double"

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        from diive_spark.operators.matrixprofile import regrid

        pdf = pdf.sort_values(ts_col).dropna(subset=[value_col])
        y = pdf[value_col].to_numpy(dtype=np.float64)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        if len(y) == 0:
            return pd.DataFrame(columns=[key_col, "ts_s", value_col])
        if grid_step_s is not None:
            t0, y = regrid(ts, y, grid_step_s, fill)
            ts = t0 + np.arange(len(y), dtype=np.int64) * grid_step_s
            phase = (ts // grid_step_s) % period
        else:
            phase = np.arange(len(y)) % period
        idx = shesd_kernel(
            y, period, max_anoms=max_anoms, alpha=alpha, phase=phase
        )
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[0],
                "ts_s": ts[idx],
                value_col: y[idx],
            }
        )

    return (
        kernel_partition(df.select(key_col, ts_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
