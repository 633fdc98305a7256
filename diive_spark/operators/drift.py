"""Distribution-drift and data-quality diagnostics.

Training-data pipelines re-ingest the same sources repeatedly (crawl
snapshots, telemetry windows); before a new window is allowed into the
corpus the distribution of its numeric fields is compared against the
accepted reference window.  This module provides the standard battery:

* :func:`ks_statistic` — two-sample Kolmogorov-Smirnov D per key,
  computed EXACTLY in integer arithmetic (no ECDF doubles until one
  final division), so the Spark result and any SQL twin agree bit-for-bit.
* :func:`psi` — population stability index over fixed-width bins with
  Laplace smoothing (the industry drift score; >0.2 = investigate).
* :func:`benford_digits` — first-significant-digit distribution vs
  Benford's law with a chi-square statistic (fabricated/defaulted
  numeric columns jump out).
* :func:`max_drawdown` — per-key running-peak drawdown of a cumulative
  series (classic prefix-trick: drawdown needs no recursion, it is
  ``running_max(cumsum) - cumsum``).
* :func:`ccf` — cross-correlation function between two aligned series
  at lags ``-max_lag..+max_lag`` (join-based, gap-tolerant; the
  autocorrelation sibling lives in ``operators/counters.py::acf``).

Scale notes (100 TB): every function below is one hash exchange on its
key (or key+bin) followed by combinable aggregates and per-key windows —
no global single-partition window, no driver collect.  KS keeps counts
as BIGINT; at >~10^9 rows per key the ``cum0*n1`` cross products need
DECIMAL(38,0) — switch the two products to ``.cast("decimal(38,0)")``
(noted inline) — the sandbox keeps BIGINT for DuckDB-twin exactness.

Reference parity: the reference engine has no drift battery (its QC is
per-point flags, `diive/pkgs/qaqc/*`); these extend the same QC surface
to corpus-level distribution checks, per SURVEY §2.12 (pipeline ops).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ks_statistic", "psi", "benford_digits", "max_drawdown", "ccf"]


def _e4(c: Column) -> Column:
    """Floor-scaled e4 integer (portable across Spark/DuckDB rounding)."""
    return F.floor(c * F.lit(10000.0) + F.lit(0.5)).cast("long")


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov
# ---------------------------------------------------------------------------

def ks_statistic(
    df: DataFrame,
    key_cols: Sequence[str],
    sample_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample KS statistic per key, ties handled exactly.

    ``sample_col`` must be 0 (reference) / 1 (current).  Collapses to
    per-(key, value) counts first — the ECDF step difference at a value
    ``v`` is then ``|cum0(v)*n1 - cum1(v)*n0| / (n0*n1)``, whose
    numerator is INTEGER-exact; the single final division is the only
    floating-point op, so any engine reproduces the same double.

    One exchange on the key (groupBy key+value), then per-key ordered
    windows.  At >1e9 rows/key cast the two products to decimal(38,0).

    Output: key cols + ``n_ref``, ``n_cur``, ``ks_e4`` (floor-scaled),
    ``drifted`` (int, 5% two-sample threshold 1.358*sqrt((n0+n1)/(n0*n1))).
    """
    keys = list(key_cols)
    g = (
        df.groupBy(*keys, F.col(value_col).alias("_v"))
        .agg(
            F.sum(F.when(F.col(sample_col) == 0, 1).otherwise(0))
            .cast("long")
            .alias("_c0"),
            F.sum(F.when(F.col(sample_col) == 1, 1).otherwise(0))
            .cast("long")
            .alias("_c1"),
        )
    )
    wk = Window.partitionBy(*keys)
    wo = Window.partitionBy(*keys).orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    b = g.select(
        *keys,
        F.sum("_c0").over(wk).alias("_n0"),
        F.sum("_c1").over(wk).alias("_n1"),
        F.sum("_c0").over(wo).alias("_cum0"),
        F.sum("_c1").over(wo).alias("_cum1"),
    )
    # integer-exact numerator; decimal(38,0) here for >1e9-row keys
    d_num = F.abs(F.col("_cum0") * F.col("_n1") - F.col("_cum1") * F.col("_n0"))
    per_key = (
        b.select(*keys, "_n0", "_n1", d_num.alias("_dn"))
        .groupBy(*keys)
        .agg(
            F.max("_dn").alias("_dmax"),
            F.first("_n0").alias("n_ref"),
            F.first("_n1").alias("n_cur"),
        )
    )
    ks = F.col("_dmax") * F.lit(10000.0) / (F.col("n_ref") * F.col("n_cur"))
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n_ref") + F.col("n_cur"))
        / (F.col("n_ref").cast("double") * F.col("n_cur"))
    )
    return per_key.select(
        *keys,
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.floor(ks + F.lit(0.5)).cast("long").alias("ks_e4"),
        (
            (F.col("_dmax") / (F.col("n_ref").cast("double") * F.col("n_cur")))
            > crit
        )
        .cast("int")
        .alias("drifted"),
    )


# ---------------------------------------------------------------------------
# population stability index
# ---------------------------------------------------------------------------

def psi(
    df: DataFrame,
    key_cols: Sequence[str],
    sample_col: str,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """PSI per key over ``n_bins`` fixed-width bins spanning the pooled
    min..max, Laplace-smoothed (+0.5 per bin) so empty bins are defined.

    Fixed-width bins (not reference deciles) keep the bin edges a pure
    function of two aggregates — engine-portable and one less pass than
    a percentile cut; the smoothing makes the score robust to them.

    Output: key cols + ``n_ref``, ``n_cur``, ``psi`` (round 4).
    """
    keys = list(key_cols)
    wk = Window.partitionBy(*keys)
    v = F.col(value_col).cast("double")
    lo = F.min(v).over(wk)
    hi = F.max(v).over(wk)
    step = (hi - lo) / F.lit(float(n_bins))
    bin_ = F.when(step <= 0, F.lit(0)).otherwise(
        F.least(F.floor((v - lo) / step), F.lit(n_bins - 1))
    ).cast("int")
    counts = (
        df.select(*keys, F.col(sample_col).alias("_s"), bin_.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(
            F.sum(F.when(F.col("_s") == 0, 1).otherwise(0)).alias("_c0"),
            F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).alias("_c1"),
        )
    )
    # densify bins: every key needs all n_bins rows for the smoothing
    dense = (
        counts.select(*keys).distinct()
        .select(*keys, F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"))
        .join(counts, keys + ["bin"], "left")
        .fillna(0, subset=["_c0", "_c1"])
    )
    n0 = F.sum("_c0").over(wk)
    n1 = F.sum("_c1").over(wk)
    p0 = (F.col("_c0") + F.lit(0.5)) / (n0 + F.lit(0.5) * n_bins)
    p1 = (F.col("_c1") + F.lit(0.5)) / (n1 + F.lit(0.5) * n_bins)
    term = (p1 - p0) * (F.log(p1) - F.log(p0))
    per_bin = dense.select(
        *keys, n0.alias("_n0"), n1.alias("_n1"), term.alias("_t")
    )
    return per_bin.groupBy(*keys).agg(
        F.first("_n0").cast("long").alias("n_ref"),
        F.first("_n1").cast("long").alias("n_cur"),
        F.round(F.sum("_t"), 4).alias("psi"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit test
# ---------------------------------------------------------------------------

def benford_digits(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law per key.

    The digit is taken from the INTEGER ``floor(abs(v)*1e6)`` rendered as
    a string — integer→string is identical across engines, where
    ``floor(log10(v))`` normalization can flip at power-of-ten doubles
    (``log10(1000.) == 2.9999999999999996`` in some libms).  Scaling by
    1e6 preserves the leading digit for every |v| >= 1e-6; smaller
    magnitudes are excluded (they'd need the log form).

    Output: one row per key+digit with ``n_obs``, observed share
    ``obs_e4`` (floor-scaled, of the key's total), Benford expectation
    ``exp_e4``, and the key-level ``chi2`` (round 4) repeated per row.
    """
    keys = list(key_cols)
    scaled = F.floor(F.abs(F.col(value_col)) * F.lit(1e6)).cast("long")
    digit = F.substring(scaled.cast("string"), 1, 1).cast("int")
    d = (
        df.filter(F.col(value_col).isNotNull() & (scaled >= 1))
        .select(*keys, digit.alias("digit"))
        .groupBy(*keys, "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    wk = Window.partitionBy(*keys)
    n_tot = F.sum("n_obs").over(wk)
    p_exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    expected = n_tot * p_exp
    contrib = (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected
    return d.select(
        *keys,
        F.col("digit").cast("int").alias("digit"),
        "n_obs",
        _e4(F.col("n_obs") * F.lit(1.0) / n_tot).alias("obs_e4"),
        _e4(p_exp).alias("exp_e4"),
        F.round(F.sum(contrib).over(wk), 4).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# maximum drawdown (prefix trick — no recursion)
# ---------------------------------------------------------------------------

def max_drawdown(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key maximum drawdown of the cumulative sum of ``value_col``.

    ``dd_t = max_{s<=t}(equity_s) - equity_t`` needs no recursion: both
    the equity curve and its running peak are ordered-window prefixes,
    so the whole job is one exchange on the key + one sort.  The
    ordered-window SUM accumulates in row order on any engine, so the
    equity doubles are bit-identical to a SQL twin.

    Output: key cols + ``n_events``, ``mdd_e4`` (floor-scaled max
    drawdown), ``trough_ts_s`` (earliest trough attaining it).
    """
    keys = list(key_cols)
    wo = Window.partitionBy(*keys).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    equity = F.sum(F.col(value_col)).over(wo)
    b = df.select(
        *keys,
        F.col(ts_col).alias("ts_s"),
        F.col(tiebreak_col).alias("_tb"),
        equity.alias("_eq"),
    )
    # same total order as the equity window — a ts tie must not let the
    # running peak see rows in a different order than the cumsum did
    peak = F.max("_eq").over(
        Window.partitionBy(*keys).orderBy("ts_s", "_tb").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    dd = b.select(*keys, "ts_s", _e4(peak - F.col("_eq")).alias("_dd_e4"))
    rn = F.row_number().over(
        Window.partitionBy(*keys).orderBy(F.col("_dd_e4").desc(), "ts_s")
    )
    return (
        dd.select(
            *keys,
            "ts_s",
            "_dd_e4",
            rn.alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("n_events"),
        )
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            F.col("n_events").cast("long").alias("n_events"),
            F.col("_dd_e4").alias("mdd_e4"),
            F.col("ts_s").cast("long").alias("trough_ts_s"),
        )
    )


# ---------------------------------------------------------------------------
# cross-correlation function (join-based, gap-tolerant)
# ---------------------------------------------------------------------------

def ccf(
    x: DataFrame,
    y: DataFrame,
    ts_col: str,
    x_col: str,
    y_col: str,
    max_lag: int,
) -> DataFrame:
    """CCF between two regular series at lags ``-max_lag..max_lag``:
    ``corr(x_t, y_{t+lag})`` over the time slots where both exist.

    Join-based (not window-lag) so gaps in either series simply drop
    pairs instead of misaligning them.  The lag fan-out explodes the
    small lag range on the x side BEFORE the join, so the whole job is
    one equi-join exchange on the slot; corr is a combinable aggregate.

    Output: ``lag``, ``ccf`` (round 4), ``n_pairs``.
    """
    lags = F.explode(
        F.sequence(F.lit(-max_lag), F.lit(max_lag))
    ).alias("lag")
    xl = x.select(F.col(ts_col).alias("_t"), F.col(x_col).alias("_x"), lags)
    yl = y.select(F.col(ts_col).alias("_ty"), F.col(y_col).alias("_y"))
    pairs = xl.join(
        yl, xl["_t"] + F.col("lag") == yl["_ty"], "inner"
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.round(F.corr("_x", "_y"), 4).alias("ccf"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .select(F.col("lag").cast("long").alias("lag"), "ccf", "n_pairs")
    )
