"""Dominant-period detection via the periodogram, per series.

Classic spectral method (Schuster 1898 periodogram; the practical
auto-period variant follows Vlachos, Yu & Castelli, "On Periodicity
Detection and Structural Periodic Similarity", SDM 2005): FFT the
mean-removed gridded series, take |X_f|^2, and report the frequency
with maximal power — plus the same estimate refined by the
autocorrelation peak nearest the periodogram hint (the SDM'05 two-step,
which fixes the periodogram's coarse frequency resolution at long
periods).

diive counterpart: none — diive assumes the season length (daily /
yearly cycles are hard-coded in its diel/DOY analytics); an engine over
arbitrary web-event streams has to detect it.

Scale shape: one grouped Arrow kernel per key (`kernel_partition`);
rfft is O(n log n) per key with bounded state.  Series must be gridded
first (the tier cascade / `regularize_grid` does that upstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["dominant_period_kernel", "detect_period"]


def dominant_period_kernel(
    y: np.ndarray, step_s: float
) -> tuple[float, float, float]:
    """(period_seconds, acf_period_seconds, power_frac) for one gridded
    series.  power_frac = dominant bin's share of total non-DC power —
    a confidence proxy (1.0 = pure sinusoid, ~1/n = white noise)."""
    y = np.asarray(y, dtype=np.float64)
    y = y[~np.isnan(y)]
    n = len(y)
    if n < 8:
        return float("nan"), float("nan"), float("nan")
    x = y - y.mean()
    spec = np.abs(np.fft.rfft(x)) ** 2
    spec[0] = 0.0
    tot = spec.sum()
    if tot <= 0:
        return float("nan"), float("nan"), 0.0
    kbin = int(np.argmax(spec))
    period = n * step_s / kbin
    power_frac = float(spec[kbin] / tot)

    # SDM'05 refinement: nearest ACF peak to the periodogram hint
    acf = np.correlate(x, x, mode="full")[n - 1 :]
    acf = acf / acf[0]
    lag_hint = n / kbin
    lo = max(2, int(lag_hint / 1.5))
    hi = min(n - 2, int(lag_hint * 1.5) + 1)
    acf_period = float("nan")
    if hi > lo:
        seg = acf[lo:hi]
        lag = lo + int(np.argmax(seg))
        # local quadratic interpolation around the ACF peak
        if 1 <= lag < n - 1:
            y0, y1, y2 = acf[lag - 1], acf[lag], acf[lag + 1]
            denom = y0 - 2 * y1 + y2
            delta = 0.5 * (y0 - y2) / denom if abs(denom) > 1e-12 else 0.0
            acf_period = (lag + float(np.clip(delta, -0.5, 0.5))) * step_s
    return float(period), acf_period, power_frac


def detect_period(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_s: int,
    key_type: str = "string",
    fill: float = 0.0,
) -> DataFrame:
    """Per key: periodogram period, ACF-refined period, dominant power
    share and series length.  ``ts_col`` holds epoch seconds; the kernel
    regrids in-kernel onto the ``step_s`` lattice (missing -> fill)."""
    schema = (
        f"{key_col} {key_type}, period_s double, acf_period_s double, "
        "power_frac double, n long"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        from diive_spark.operators.matrixprofile import regrid

        pdf = pdf.sort_values(ts_col).dropna(subset=[value_col])
        y = pdf[value_col].to_numpy(dtype=np.float64)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        if len(y):
            _, y = regrid(ts, y, int(step_s), fill)
        p, ap, pf = dominant_period_kernel(y, step_s)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "period_s": [p],
                "acf_period_s": [ap],
                "power_frac": [pf],
                "n": [len(y)],
            }
        )

    return (
        kernel_partition(df.select(key_col, ts_col, value_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
