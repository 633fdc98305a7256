"""Bootstrapped bin fits with prediction bands (SURVEY §2.11
``BinFitterBTS``/``BinFitter``,
/root/reference/diive/core/dfun/fits.py:42-71 +
/root/reference/diive/pkgs/fluxprocessingchain-neighbour binfitter.py:35-517).

Per key: quantile-bin x, fit the quadratic through the bin means
(curve_fit on a linear-in-parameters model == exact least squares),
then

* the frequentist 95% prediction band with the Student-t quantile
  (binfitter.py ``_predband``),
* the 95% confidence region of the fit line from the parameter
  covariance (the reference propagates it through the ``uncertainties``
  package; for a linear-in-parameters model that is exactly
  ``sqrt(g' C g)`` with C = RSS/(N-p) * (A'A)^-1),
* bootstrap resampling of the input rows, refit per run, and the
  2.5%/97.5% quantiles of the per-run prediction bands
  (``BinFitterBTS._collect_predband_quantiles``).  The reference draws
  with ``random_state=None``; here the RNG is seeded per key so results
  are deterministic and testable.

scipy is not in the container, so the Student-t PPF is computed in
numpy: regularized incomplete beta via the standard continued-fraction
expansion (Numerical Recipes ``betacf``) and bisection — matches
scipy.stats.t.ppf to ~1e-10.

Execution shape: one ``applyInPandas`` group per key; the whole
fit+bootstrap is numpy inside the kernel.  Keys are independent, so
parallelism is per key with a single hash exchange.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType

from diive_spark.session import kernel_partition


def _betacf(a: float, b: float, x: float, max_iter: int = 200) -> float:
    """Continued fraction for the incomplete beta function."""
    tiny = 1e-30
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
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
        if abs(delta - 1.0) < 1e-14:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    from math import exp, lgamma, log

    ln_bt = (
        lgamma(a + b) - lgamma(a) - lgamma(b) + a * log(x) + b * log(1.0 - x)
    )
    bt = exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_cdf(x: float, df: float) -> float:
    """Student-t CDF."""
    p = 0.5 * _betainc(df / 2.0, 0.5, df / (df + x * x))
    return 1.0 - p if x > 0 else p


@lru_cache(maxsize=1024)
def t_ppf(p: float, df: float) -> float:
    """Student-t quantile via bisection on :func:`t_cdf`.

    Memoized: the bisection costs ~200 CDF evaluations, and the kernel
    calls it once per bootstrap run with the same (0.975, n_bins - 3)
    arguments — per worker process it should be paid once, not
    keys x bootstraps times.
    """
    lo, hi = -1e3, 1e3
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _design(x: np.ndarray, fit_type: str) -> np.ndarray:
    """Design matrix per BinFitterCP fit_type (fits.py:132-148):
    quadratic_offset a*x^2+b*x+c; quadratic a*x^2+b*x (NO intercept);
    linear a*x+b."""
    if fit_type == "quadratic_offset":
        return np.column_stack([x * x, x, np.ones_like(x)])
    if fit_type == "quadratic":
        return np.column_stack([x * x, x])
    if fit_type == "linear":
        return np.column_stack([x, np.ones_like(x)])
    raise ValueError(f"unknown fit_type {fit_type!r}")


def _quad_fit(x: np.ndarray, y: np.ndarray, fit_type: str = "quadratic_offset"):
    """Least-squares fit (curve_fit on a linear-in-parameters model is
    exact least squares): params, covariance."""
    A = _design(x, fit_type)
    params, *_ = np.linalg.lstsq(A, y, rcond=None)
    resid = y - A @ params
    n, p = len(x), A.shape[1]
    sigma2 = resid @ resid / (n - p)
    cov = sigma2 * np.linalg.inv(A.T @ A)
    return params, cov


def _bin_means(x: np.ndarray, y: np.ndarray, n_bins: int):
    """qcut bin means (fits.py:42-55, duplicates dropped).

    Pure-numpy replica of ``pd.qcut(x, q).groupby().mean()``: identical
    linear-interpolated quantile edges, right-closed intervals with the
    minimum included in the first bin, duplicate edges dropped.  qcut
    itself costs ~1.5 ms per call (Interval objects + groupby); this is
    ~30 us, which matters because the bootstrap loop calls it
    keys x (bootstraps + 1) times.
    """
    edges = np.unique(np.quantile(x, np.linspace(0.0, 1.0, n_bins + 1)))
    # right-closed (a, b]: a value on an interior edge falls in the
    # lower bin; clip puts x == min into bin 0 (include_lowest)
    idx = np.clip(np.searchsorted(edges, x, side="left") - 1, 0, len(edges) - 2)
    cnt = np.bincount(idx, minlength=len(edges) - 1)
    keep = cnt > 0
    sx = np.bincount(idx, weights=x, minlength=len(edges) - 1)
    sy = np.bincount(idx, weights=y, minlength=len(edges) - 1)
    return sx[keep] / cnt[keep], sy[keep] / cnt[keep]


def binfitter_bts_pdf(
    pdf: pd.DataFrame,
    x_col: str,
    y_col: str,
    n_bins: int = 10,
    n_bootstraps: int = 10,
    n_predictions: int = 50,
    seed: int = 0,
    fit_type: str = "quadratic_offset",
) -> pd.DataFrame:
    """Kernel body == test oracle: fit + bands + bootstrap quantiles for
    ONE series; returns one row per fit_x point.  ``fit_type`` follows
    BinFitterCP (fits.py:87): linear / quadratic / quadratic_offset; the
    params row reports (a, b, c) with c = 0 when absent from the model
    (fits.py:192).  ``fit_r2`` replicates fits.py:202
    (1 - SSE / ((n-1) * var(y, ddof=1)) over the fitted points)."""
    x = pdf[x_col].to_numpy(dtype=np.float64)
    y = pdf[y_col].to_numpy(dtype=np.float64)
    ok = ~(np.isnan(x) | np.isnan(y))
    x, y = x[ok], y[ok]
    fit_x = np.linspace(x.min(), x.max(), n_predictions)
    G = _design(fit_x, fit_type)

    def run(xs: np.ndarray, ys: np.ndarray):
        bx, by = _bin_means(xs, ys, n_bins)
        params, cov = _quad_fit(bx, by, fit_type)
        A = _design(bx, fit_type)
        yp = G @ params
        # prediction band (binfitter.py _predband), over the BINNED points
        n, p = len(bx), A.shape[1]
        q = t_ppf(0.975, n - p)
        fitted = A @ params
        se = np.sqrt(np.sum((by - fitted) ** 2) / (n - p))
        sx = (fit_x - bx.mean()) ** 2
        sxd = np.sum((bx - bx.mean()) ** 2)
        dy = q * se * np.sqrt(1.0 + 1.0 / n + sx / sxd)
        # confidence region from parameter covariance (exact propagation)
        std = np.sqrt(np.einsum("ij,jk,ik->i", G, cov, G))
        r2 = 1.0 - np.sum((by - fitted) ** 2) / ((n - 1.0) * np.var(by, ddof=1))
        return params, yp, yp - dy, yp + dy, std, r2

    params, nom, lpb, upb, std, fit_r2 = run(x, y)
    rng = np.random.default_rng(seed)
    lowers, uppers = [], []
    for _ in range(n_bootstraps):
        idx = rng.integers(0, len(x), len(x))
        _, _, lo, up, _, _ = run(x[idx], y[idx])
        lowers.append(lo)
        uppers.append(up)
    lowers = np.vstack(lowers)
    uppers = np.vstack(uppers)
    return pd.DataFrame(
        {
            "fit_x": fit_x,
            "nom": nom,
            "nom_lower_ci95": nom - 1.96 * std,
            "nom_upper_ci95": nom + 1.96 * std,
            "lower_predband": lpb,
            "upper_predband": upb,
            "bts_lower_q025": np.quantile(lowers, 0.025, axis=0),
            "bts_lower_q975": np.quantile(lowers, 0.975, axis=0),
            "bts_upper_q025": np.quantile(uppers, 0.025, axis=0),
            "bts_upper_q975": np.quantile(uppers, 0.975, axis=0),
            "a": params[0],
            "b": params[1],
            "c": params[2] if len(params) > 2 else 0.0,
            "fit_r2": fit_r2,
        }
    )


def binfitter_bts(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    n_bins: int = 10,
    n_bootstraps: int = 10,
    n_predictions: int = 50,
    fit_type: str = "quadratic_offset",
) -> DataFrame:
    """Distributed BinFitterBTS/BinFitterCP: one kernel per key,
    deterministic per-key bootstrap seed (hash of the key)."""
    key_field = [f for f in df.schema.fields if f.name == key_col][0]
    fields = [
        StructField(c, DoubleType())
        for c in (
            "fit_x", "nom", "nom_lower_ci95", "nom_upper_ci95",
            "lower_predband", "upper_predband",
            "bts_lower_q025", "bts_lower_q975",
            "bts_upper_q025", "bts_upper_q975", "a", "b", "c", "fit_r2",
        )
    ]
    schema = StructType([key_field] + fields)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import zlib

        key = pdf[key_col].iloc[0]
        # crc32, NOT hash(): Python's str hash is salted per process and
        # executors would each seed differently
        seed = zlib.crc32(str(key).encode()) % (2**31)
        out = binfitter_bts_pdf(
            pdf, x_col, y_col, n_bins=n_bins, n_bootstraps=n_bootstraps,
            n_predictions=n_predictions, seed=seed, fit_type=fit_type,
        )
        out.insert(0, key_col, key)
        return out

    sel = kernel_partition(df.select(key_col, x_col, y_col), key_col)
    return sel.groupBy(key_col).applyInPandas(kernel, schema)
