"""pandas oracle — the reference's math re-run verbatim per series.

Each function here mirrors one reference operator with the SAME pandas calls
so tests can assert the Spark engine's output equals the reference's output
exactly (float64-bitwise where aggregation order permits; see SURVEY.md §7.1).

Citations point at the mirrored reference spans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def resample_series_gated(
    series: pd.Series,
    bucket_seconds: int = 1800,
    agg: str = "mean",
    mincounts_perc: float = 0.9,
    source_freq_seconds: int | None = None,
) -> pd.DataFrame:
    """Mirror of ``resample_series_to_30MIN``
    (/root/reference/diive/core/times/resampling.py:13-132), generalized to
    any bucket width.

    Input: series indexed by END-labeled timestamps. Output: DataFrame with
    END-labeled ``window_end`` index and columns ``agg_mean, agg_sum,
    n_vals`` for buckets passing the min-count gate.
    """
    s = series.copy()
    if source_freq_seconds:
        # convert END -> MIDDLE (resampling.py:67-68 -> times.py:1023-1027)
        s.index = s.index - pd.Timedelta(seconds=source_freq_seconds / 2)
    freq = f"{bucket_seconds}s"
    resampled = s.resample(freq, label="right")  # default closed='left'
    counts = resampled.count()
    # maxcounts via dummy ones-series (resampling.py:76-79)
    ones = pd.Series(index=s.index, data=1)
    maxcounts = ones.resample(freq, label="right").count().max()
    mincounts = int(maxcounts * mincounts_perc)
    mincounts = 1 if mincounts < 3 else mincounts  # resampling.py:81-83
    out = pd.DataFrame(
        {
            "agg_mean": resampled.agg("mean"),
            "agg_sum": resampled.agg("sum"),
            "n_vals": counts,
        }
    )
    out = out[counts >= mincounts]  # resampling.py:96-97
    out.index.name = "window_end"
    return out


def zscore_flag(
    series: pd.Series, thres_zscore: float = 4.0, repeat: bool = False
) -> pd.Series:
    """z-score outlier flag, population std, abs
    (/root/reference/diive/core/funcs/funcs.py:37-41 via
    /root/reference/diive/pkgs/outlierdetection/zscore.py:140-204), with the
    reference's repeat-until-clean loop
    (/root/reference/diive/core/base/flagbase.py:122-140).

    Returns int flags: 0 ok, 2 rejected (accumulated over iterations); NaN
    input records get no flag (flag stays 0 here — the missing-values test
    handles them separately).
    """
    flag = pd.Series(0, index=series.index, dtype="int64")
    work = series.copy()
    while True:
        s = work.dropna()
        if s.empty:
            break
        mean = s.mean()
        sd = np.std(s)  # ddof=0, population (funcs.py:40)
        if sd == 0:
            break
        z = np.abs((s - mean) / sd)
        rejected = z.index[z > thres_zscore]
        if len(rejected) == 0:
            break
        flag.loc[rejected] = 2
        work.loc[rejected] = np.nan
        if not repeat:
            break
    return flag


def zscore_increments_flag(series: pd.Series, thres_zscore: float = 4.0) -> pd.Series:
    """z-score on first differences
    (/root/reference/diive/pkgs/outlierdetection/incremental.py:62-88):
    increment = s - s.shift(1); flag where |z(increment)| > threshold."""
    inc = series - series.shift(1)
    s = inc.dropna()
    flag = pd.Series(0, index=series.index, dtype="int64")
    if s.empty:
        return flag
    sd = np.std(s)
    if sd == 0:
        return flag
    z = np.abs((s - s.mean()) / sd)
    flag.loc[z.index[z > thres_zscore]] = 2
    return flag


def localsd_flag(
    series: pd.Series,
    n_sd: float = 7.0,
    winsize: int | None = None,
    constant_sd: bool = False,
) -> pd.Series:
    """LocalSD / Hampel-style outlier flag
    (/root/reference/diive/pkgs/outlierdetection/localsd.py:73-101):
    centered rolling median ± n_sd * rolling sd (min_periods=3), iterated
    until no new outliers (flagbase.py:122-140)."""
    flag = pd.Series(0, index=series.index, dtype="int64")
    work = series.copy()
    while True:
        # the reference rolls over the dropna'd series, i.e. the window is
        # over surviving RECORD POSITIONS, not the original grid
        # (localsd.py:77-78: ``s = self.filteredseries.copy(); s = s.dropna()``)
        s = work.dropna()
        if s.empty:
            break
        if winsize is None:
            winsize = int(len(s) / 20)  # localsd.py:80-82 (set once)
        rmedian = s.rolling(window=winsize, center=True, min_periods=3).median()
        if constant_sd:
            rsd = s.std()  # sample std, ddof=1
        else:
            rsd = s.rolling(window=winsize, center=True, min_periods=3).std()
        upper = rmedian + (rsd * n_sd)
        lower = rmedian - (rsd * n_sd)
        rejected = ((s > upper) | (s < lower))  # strict, localsd.py:90-91
        rejected = rejected[rejected].index
        if len(rejected) == 0:
            break
        flag.loc[rejected] = 2
        work.loc[rejected] = np.nan
    return flag


def flag_sums(flags: pd.DataFrame) -> tuple[pd.Series, pd.Series]:
    """Per-record sums of hard/soft flag VALUES
    (/root/reference/diive/pkgs/qaqc/qcf.py:284-292): ``sum_hardflags`` sums
    the values equal to 2 (so one hard flag contributes 2), ``sum_softflags``
    sums the values equal to 1."""
    hard = flags[flags == 2].sum(axis=1)
    soft = flags[flags == 1].sum(axis=1)
    return hard, soft


def qcf_ladder(sum_hardflags: pd.Series, sum_softflags: pd.Series) -> pd.Series:
    """Overall quality-control flag ladder, assignment order preserved
    (/root/reference/diive/pkgs/qaqc/qcf.py:241-282):
      start NaN; 0 where total sum == 0; 2 where softsum > 3;
      2 where hardsum >= 2 (i.e. any hard flag, each worth 2);
      1 where 1 <= softsum <= 3 and hardsum == 0;
      finally (no daytime/nighttime split) QCF >= 2 stays 2."""
    total = sum_hardflags + sum_softflags
    qcf = pd.Series(np.nan, index=sum_hardflags.index)
    qcf[total == 0] = 0
    qcf[sum_softflags > 3] = 2
    qcf[sum_hardflags >= 2] = 2
    mask = (sum_softflags <= 3) & (sum_softflags >= 1) & (sum_hardflags == 0)
    qcf[mask] = 1
    return qcf


def apply_qcf(series: pd.Series, qcf: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Quality-filtered series: ``value_qcf`` nulls QCF==2 records;
    ``value_qcf0`` keeps only QCF==0 (highest quality)
    (/root/reference/diive/pkgs/qaqc/qcf.py:108-115)."""
    value_qcf = series.copy()
    value_qcf[qcf == 2] = np.nan
    value_qcf0 = series.copy()
    value_qcf0[qcf > 0] = np.nan
    return value_qcf, value_qcf0


def linear_interp_limited(series: pd.Series, gap_limit: int = 3) -> pd.Series:
    """Linear interpolation only for gaps of run-length <= gap_limit
    (/root/reference/diive/pkgs/gapfilling/interpolate.py:8-36, using the
    GapFinder run-length logic
    /root/reference/diive/pkgs/analyses/gapfinder.py:58-117)."""
    filled = series.interpolate(
        method="linear", limit=None, limit_area="inside", limit_direction="both"
    )  # interpolate.py:15-16
    # run-length of NaN gaps
    isgap = series.isna()
    runid = (~isgap).cumsum()
    runlen = isgap.groupby(runid).transform("sum")
    keep = ~isgap | (runlen <= gap_limit)
    out = series.copy()
    out[keep & isgap] = filled[keep & isgap]
    return out


def ffill_limited(series: pd.Series, limit: int = 3) -> pd.Series:
    """Forward-fill with limit (pandas semantics: each of the first ``limit``
    NaNs after a valid value is filled)."""
    return series.ffill(limit=limit)


def bfill_limited(series: pd.Series, limit: int = 3) -> pd.Series:
    """Backward-fill with limit — the upsampling harmonization fill
    (/root/reference/diive/pkgs/qaqc/meteoscreening.py:571-631 uses
    ``fillna(method='backfill', limit=...)`` on the reindexed hires grid)."""
    return series.bfill(limit=limit)


def gapfinder(series: pd.Series) -> pd.DataFrame:
    """Run-length encoding of NaN gaps
    (/root/reference/diive/pkgs/analyses/gapfinder.py:58-117): one row per
    gap with (gap_start, gap_end, gap_len)."""
    isgap = series.isna()
    runid = (~isgap).cumsum()
    gaps = series.index.to_series()[isgap].groupby(runid[isgap])
    out = gaps.agg(gap_start="min", gap_end="max", gap_len="count")
    return out.reset_index(drop=True)
