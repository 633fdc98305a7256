"""Mann-Kendall trend test + Theil-Sen slope estimator, per series.

The standard non-parametric monotonic-trend toolkit for environmental
time series (Mann 1945, Kendall 1975, Sen 1968; Hirsch et al. 1982) — the
natural companion to the reference's trend-adjacent analytics
(/root/reference/diive/pkgs/analyses/ daily correlation, DOY cumulatives,
critical-days zero-crossing) which diive leaves to the user.  Per key:

    S        = Σ_{i<j} sign(v_j − v_i)                (MK statistic)
    Var(S)   = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 (tie-corrected)
    z        = (S−1)/√Var  if S>0,  0 if S=0,  (S+1)/√Var  if S<0
    slope    = median_{i<j} (v_j − v_i)/(t_j − t_i)    (Theil-Sen)
    intercept= median_i (v_i − slope·t_i)

Scale shape: the statistics are O(n²) in pairs but inherently PER-SERIES —
the distributed formulation is one grouped Arrow kernel per key
(`kernel_partition`, broadcast-free, no shuffle beyond the key hash), with
the pair matrix vectorized in numpy (an n=2000 series is a 4M-float
triangle, ~16 MB — bounded; downsample/rollup first for monster series,
which is what the tier engine is for).  A pairwise DataFrame self-join
would shuffle O(n²) ROWS per key — strictly worse; the kernel keeps the
quadratic term in registers.  The DuckDB oracle unrolls the exact pairwise
definition, so engine == textbook definition is what the driver checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.session import kernel_partition

__all__ = ["mann_kendall_kernel", "mann_kendall_trend"]


def mann_kendall_kernel(
    t: np.ndarray, v: np.ndarray
) -> tuple[int, float, float, float, float]:
    """(S, var_s, z, sen_slope, sen_intercept) for one series sorted by t.

    Exact tie handling: equal values contribute sign 0 to S and a
    correction term to Var(S); pairs with equal timestamps are excluded
    from the slope median (division by zero — cannot happen on a grid).
    """
    n = len(v)
    if n < 2:
        return 0, 0.0, 0.0, float("nan"), float("nan")
    dv = v[None, :] - v[:, None]  # dv[i, j] = v_j - v_i
    dt = t[None, :] - t[:, None]
    iu = np.triu_indices(n, k=1)
    s = int(np.sign(dv[iu]).sum())
    # tie groups over the VALUES
    _, counts = np.unique(v, return_counts=True)
    tie = int((counts * (counts - 1) * (2 * counts + 5)).sum())
    var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    if s > 0:
        z = (s - 1) / np.sqrt(var_s) if var_s > 0 else 0.0
    elif s < 0:
        z = (s + 1) / np.sqrt(var_s) if var_s > 0 else 0.0
    else:
        z = 0.0
    dts = dt[iu]
    ok = dts != 0
    slopes = np.sort(dv[iu][ok] / dts[ok])
    # LOWER median (exact element pick, no midpoint interpolation):
    # interpolated medians round (a+b)/2 differently across engines
    # (numpy adds-then-halves, DuckDB lerps), so the engine-stable
    # definition picks sorted[(m-1)//2] — documented deviation from
    # scipy's theilslopes, which interpolates.
    m = len(slopes)
    slope = float(slopes[(m - 1) // 2]) if m else float("nan")
    if m:
        resid = np.sort(v - slope * t)
        intercept = float(resid[(n - 1) // 2])
    else:
        intercept = float("nan")
    return s, float(var_s), float(z), slope, intercept


def mann_kendall_trend(
    df: DataFrame,
    key_col: str = "key",
    ts_s_col: str = "ts_s",
    value_col: str = "value",
) -> DataFrame:
    """Per-key MK + Theil-Sen over (key, ts_s, value) rows.  Output one row
    per key: n, s, var_s, z, sen_slope, sen_intercept."""
    schema = (
        f"{key_col} long, n long, s long, var_s double, z double, "
        "sen_slope double, sen_intercept double"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_s_col, kind="mergesort")
        t = pdf[ts_s_col].to_numpy(dtype=np.float64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        keep = ~np.isnan(v)
        t, v = t[keep], v[keep]
        s, var_s, z, slope, icept = mann_kendall_kernel(t, v)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [len(v)],
                "s": [s],
                "var_s": [var_s],
                "z": [z],
                "sen_slope": [slope],
                "sen_intercept": [icept],
            }
        )

    return (
        kernel_partition(
            df.select(
                F.col(key_col).cast("long").alias(key_col),
                F.col(ts_s_col).cast("long").alias(ts_s_col),
                F.col(value_col).cast("double").alias(value_col),
            ),
            key_col,
        )
        .groupBy(key_col)
        .applyInPandas(apply, schema)
    )
