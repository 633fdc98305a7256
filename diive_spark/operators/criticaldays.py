"""CriticalDays threshold detection (SURVEY §2.11,
/root/reference/diive/pkgs/flux/criticaldays.py:29-331).

Per key: daily aggregates (x_agg of x, y_agg of y per day) -> bootstrapped
bin fit (operators/binfitter.py) -> zero crossing of each run's nominal
curve:

  * sign change of the fitted y over the fit_x grid; exactly ONE crossing
    accepted (criticaldays.py:_detect_zerocrossing_y), value taken at the
    first grid point AFTER the crossing (``zerocrossings_ix + 1``),
  * the post-crossing sign must match ``thres_y_sign_change`` and the
    crossing x must be >= ``thres_min_x`` — else the run is rejected
    (the reference raises; here rejected runs are excluded from the
    bootstrap aggregate, which is the usable generalization),
  * threshold Dcrit = max (or median) of accepted runs' crossing x,
  * Dcrit days = daily rows with x_agg >= Dcrit; near-critical days
    (nDcrit) = the same NUMBER of days next-below the threshold, with
    their min x as the lower bound (criticaldays.py:137-163).

Execution shape: the daily aggregation is a declarative groupBy; the
fit + bootstrap + crossing scan runs once per key in an ``applyInPandas``
kernel over the (small) daily table — day counts per key are bounded by
the calendar, not the input volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from diive_spark.operators.binfitter import _bin_means, _design, _quad_fit
from diive_spark.session import kernel_partition


def _fit_nominal(
    x: np.ndarray, y: np.ndarray, fit_x: np.ndarray, n_bins: int, fit_type: str
) -> np.ndarray:
    bx, by = _bin_means(x, y, n_bins)
    params, _ = _quad_fit(bx, by, fit_type)
    return _design(fit_x, fit_type) @ params


def _zero_crossing(
    fit_x: np.ndarray,
    nom: np.ndarray,
    thres_min_x: float,
    sign_change: str,
) -> float:
    """criticaldays.py:_detect_zerocrossing_y — NaN when rejected."""
    signs = np.sign(nom)
    if signs.max() == signs.min():
        return np.nan
    ix = np.argwhere(np.diff(signs)).flatten()
    if len(ix) != 1:
        return np.nan
    after = int(ix[0]) + 1  # first grid point AFTER the crossing
    y_after = nom[after]
    if sign_change == "-" and y_after > 0:
        return np.nan
    if sign_change == "+" and y_after < 0:
        return np.nan
    x_cross = fit_x[after]
    if x_cross < thres_min_x:
        return np.nan
    return float(x_cross)


def critical_days_pdf(
    daily: pd.DataFrame,
    thres_min_x: float,
    n_bins: int = 10,
    n_bootstraps: int = 10,
    n_predictions: int = 100,
    thres_from_bootstrap: str = "max",
    thres_y_sign_change: str = "-",
    fit_type: str = "quadratic_offset",
    seed: int = 0,
) -> pd.DataFrame:
    """One row for ONE key's daily (x, y) table (kernel body == oracle)."""
    x = daily["x"].to_numpy(dtype=np.float64)
    y = daily["y"].to_numpy(dtype=np.float64)
    ok = ~(np.isnan(x) | np.isnan(y))
    x, y = x[ok], y[ok]
    fit_x = np.linspace(x.min(), x.max(), n_predictions)

    crossings = []
    nom0 = _fit_nominal(x, y, fit_x, n_bins, fit_type)
    c0 = _zero_crossing(fit_x, nom0, thres_min_x, thres_y_sign_change)
    crossings.append(c0)
    rng = np.random.default_rng(seed)
    for _ in range(n_bootstraps):
        idx = rng.integers(0, len(x), len(x))
        nom = _fit_nominal(x[idx], y[idx], fit_x, n_bins, fit_type)
        crossings.append(
            _zero_crossing(fit_x, nom, thres_min_x, thres_y_sign_change)
        )
    cr = np.array(crossings, dtype=np.float64)
    accepted = cr[~np.isnan(cr)]
    if len(accepted) == 0:
        thres = np.nan
    elif thres_from_bootstrap == "max":
        thres = float(accepted.max())
    else:
        thres = float(round(np.median(accepted), 6))  # criticaldays.py x_median

    if np.isnan(thres):
        n_dcrit, thres_nd_lower, n_ndcrit = 0, np.nan, 0
    else:
        dcrit = x[x >= thres]
        n_dcrit = int(len(dcrit))
        below = np.sort(x[x < thres])[::-1][:n_dcrit]
        n_ndcrit = int(len(below))
        thres_nd_lower = float(below.min()) if n_ndcrit else np.nan
    return pd.DataFrame(
        {
            "thres_dcrit": [thres],
            "thres_ndcrit_lower": [thres_nd_lower],
            "n_dcrit": [n_dcrit],
            "n_ndcrit": [n_ndcrit],
            "n_runs_accepted": [int(len(accepted))],
            "n_days": [int(len(x))],
        }
    )


CD_SCHEMA_FIELDS = [
    StructField("thres_dcrit", DoubleType()),
    StructField("thres_ndcrit_lower", DoubleType()),
    StructField("n_dcrit", LongType()),
    StructField("n_ndcrit", LongType()),
    StructField("n_runs_accepted", LongType()),
    StructField("n_days", LongType()),
]


def critical_days(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    thres_min_x: float,
    x_agg: str = "max",
    y_agg: str = "sum",
    n_bins: int = 10,
    n_bootstraps: int = 10,
    thres_from_bootstrap: str = "max",
    thres_y_sign_change: str = "-",
) -> DataFrame:
    """Distributed CriticalDays: declarative daily aggregation, one
    fit+bootstrap kernel per key (deterministic crc32 seed)."""
    daily = (
        df.groupBy(key_col, F.to_date(ts_col).alias("_day"))
        .agg(
            getattr(F, x_agg)(x_col).alias("x"),
            getattr(F, y_agg)(y_col).alias("y"),
        )
    )
    key_field = [f for f in df.schema.fields if f.name == key_col][0]
    schema = StructType([key_field] + CD_SCHEMA_FIELDS)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import zlib

        key = pdf[key_col].iloc[0]
        seed = zlib.crc32(str(key).encode()) % (2**31)
        out = critical_days_pdf(
            pdf,
            thres_min_x=thres_min_x,
            n_bins=n_bins,
            n_bootstraps=n_bootstraps,
            thres_from_bootstrap=thres_from_bootstrap,
            thres_y_sign_change=thres_y_sign_change,
            seed=seed,
        )
        out.insert(0, key_col, key)
        return out

    return (
        kernel_partition(daily, key_col)
        .groupBy(key_col)
        .applyInPandas(kernel, schema)
    )
