"""Lomb-Scargle periodogram for IRREGULARLY sampled series.

The FFT periodogram (operators/period.py) needs a regular grid; real
sensor/crawl streams have gaps and jitter.  Lomb (Ap&SS 39, 1976) and
Scargle (ApJ 263, 1982) define spectral power directly on arbitrary
sample times, with Scargle's τ offset making the estimate invariant to
time translation and equivalent to least-squares sinusoid fitting:

    P(ω) = ½ [ (Σ y·cos ω(t−τ))² / Σ cos² ω(t−τ)
             + (Σ y·sin ω(t−τ))² / Σ sin² ω(t−τ) ],
    tan(2ωτ) = Σ sin 2ωt / Σ cos 2ωt

Everything reduces to FIVE plain aggregates per (key, frequency) —
YC=Σy·c, YS=Σy·s, CC=Σc², SS=Σs², CS=Σc·s with c=cos ωt, s=sin ωt —
followed by scalar post-aggregate algebra (rotate by θ=ωτ via
2θ = atan2(2·CS, CC−SS)).  So the WHOLE periodogram is: broadcast-free
map-side explode of a literal period grid, one combinable groupBy, no
kernel, no second pass over the data.

Cross-engine determinism: trig argument reduction differs between libms
at large |x|, so the phase is computed from ``t mod period`` (an EXACT
integer mod for epoch-second timestamps) — cos(2π·t/P) is P-periodic, so
the reduced argument is mathematically identical and stays in [0, 2π)
where both engines' cos/sin agree to the ulp.

diive counterpart: none — diive hard-codes daily/yearly cycles; an
engine over web-event streams must FIND the cycle, on the un-gridded
series the tier cascade has not touched yet.

Scale shape: |periods| × map-side row explode, one combinable agg keyed
(key, period) — partial aggregation absorbs the fan-out before the
shuffle, so shuffle rows = n_keys × n_periods regardless of input size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lomb_scargle"]

_TWO_PI = 2.0 * math.pi


def lomb_scargle(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    periods_s: tuple[int, ...],
) -> DataFrame:
    """Per (key, period): sample count and variance-normalized
    Lomb-Scargle power P(ω)/σ² (Horne & Baliunas 1986 normalization),
    floor-scaled at 1e4.  ``ts_col`` holds epoch seconds (long)."""
    stats = df.groupBy(key_col).agg(
        F.count(value_col).alias("_n"),
        F.avg(value_col).alias("_mu"),
        F.var_pop(value_col).alias("_var"),
    )
    pts = df.join(stats, key_col).where(F.col("_var") > 0)
    pts = pts.withColumn(
        "period_s",
        F.explode(F.array(*[F.lit(int(p)) for p in periods_s])),
    )
    ang = (
        F.lit(_TWO_PI)
        * (F.col(ts_col) % F.col("period_s")).cast("double")
        / F.col("period_s")
    )
    dy = F.col(value_col) - F.col("_mu")
    pts = pts.select(
        key_col,
        "period_s",
        "_n",
        "_var",
        dy.alias("dy"),
        F.cos(ang).alias("c"),
        F.sin(ang).alias("s"),
    )
    agg = pts.groupBy(key_col, "period_s").agg(
        F.max("_n").cast("long").alias("n"),
        F.max("_var").alias("vr"),
        F.sum(F.col("dy") * F.col("c")).alias("yc"),
        F.sum(F.col("dy") * F.col("s")).alias("ys"),
        F.sum(F.col("c") * F.col("c")).alias("cc"),
        F.sum(F.col("s") * F.col("s")).alias("ss"),
        F.sum(F.col("c") * F.col("s")).alias("cs"),
    )
    theta = F.atan2(2 * F.col("cs"), F.col("cc") - F.col("ss")) / 2
    ct, st = F.cos(theta), F.sin(theta)
    yc_ = F.col("yc") * ct + F.col("ys") * st
    ys_ = F.col("ys") * ct - F.col("yc") * st
    cc_ = (
        F.col("cc") * ct * ct
        + 2 * F.col("cs") * ct * st
        + F.col("ss") * st * st
    )
    ss_ = (
        F.col("ss") * ct * ct
        - 2 * F.col("cs") * ct * st
        + F.col("cc") * st * st
    )
    power = (yc_ * yc_ / cc_ + ys_ * ys_ / ss_) / 2
    return agg.select(
        key_col,
        "period_s",
        "n",
        F.floor(power / F.col("vr") * 1e4 + F.lit(0.5))
        .cast("long")
        .alias("pnorm_e4"),
    )
