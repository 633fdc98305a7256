"""RandomUncertaintyPAS20 — the ONEflux/FLUXNET2015 random-uncertainty
ladder (methods 1-4) + cumulative uncertainty propagation, re-expressed as
banded DataFrame self-joins.

Reference: /root/reference/diive/pkgs/flux/uncertainty.py:27-431
(RandomUncertaintyPAS20; Pastorello et al. 2020, Hollinger & Richardson
2005).  The reference iterates the pandas frame row-by-row, re-slicing a
±N-day / ±1-hour time-of-day window per record; here each method is ONE
bucketed range self-join per pass:

  * method 1 (uncertainty.py:218-289): per measured record, stddev of
    measured fluxes within ±7 days, ±1 h time-of-day AND met similarity
    (TA ±2.5 °C, VPD ±5 hPa, SW_IN ±50 W m⁻²); needs ≥5 values.
  * method 2 (uncertainty.py:291-355): per still-missing record, median of
    method-1 uncertainties of similar fluxes (gapfilled flux ±max(20%, 2))
    within ±5 days, ±1 h — repeated with EXPANDING day windows until no
    record gains a value (uncertainty.py:93-103).
  * method 3 (uncertainty.py:357-395): same flux-similarity median without
    any time window.
  * method 4 (uncertainty.py:397-431): median of the 10 records adjacent
    in gapfilled-flux order (positions [i-5, i+5) of the flux-sorted
    frame), no similarity restriction.
  * cumulative propagation (uncertainty.py:108-137): treats per-record
    uncertainties as independent — cumulative σ = sqrt(Σ σ²)
    (the `uncertainties` package's correlation-free sum).

Scale design: every pass is target ⋈ candidate on (key, day-bucket) with
the ±N-day band as a 3-bucket explode of the target side — the classic
range-join banding, shuffle balanced by the time key, never all-pairs.
Snapshot semantics match the reference exactly: each pass reads the
uncertainty column AS OF the pass start (the reference copies the frame
before each loop), so the join is order-independent and distributable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pas20_method1",
    "pas20_method2_pass",
    "pas20_method3",
    "pas20_method4",
    "pas20_random_uncertainty",
    "cumulative_uncertainty",
]

DAY_S = 86400


def _tod_cond(tod_a: Column, tod_b: Column, win_hours: float) -> Column:
    """±win_hours time-of-day window, inclusive, with midnight wraparound
    (pandas ``between_time`` semantics, uncertainty.py:264-271)."""
    h = int(win_hours * 3600)
    d = F.pmod(tod_b - tod_a, F.lit(DAY_S))
    return (d <= h) | (d >= DAY_S - h)


def _banded_self_join(
    targets: DataFrame,
    candidates: DataFrame,
    key_col: str,
    slot_col: str,
    win_days: int,
    win_hours: float | None = None,
):
    """(target, candidate) pairs within ±win_days on the slot axis via a
    3-bucket band explode — equi-join on (key, bucket), exact range filter
    after.  Returns the joined frame with columns prefixed a_/b_.

    When ``win_hours`` is given (and divides a day), the ±win_hours
    time-of-day window is ALSO banded into the join key: hour-of-day
    buckets of width win_hours, target exploded to its bucket ±1 mod the
    day.  Any candidate within the wraparound tod window shares one of
    those buckets, so the equi-join stays exact while the pair fan-out
    drops by ~day/(3·win_hours) (≈8× at ±1 h) — the caller's exact
    ``_tod_cond`` filter then prunes the band remainder.
    """
    w = win_days * DAY_S
    bkt = F.floor(F.col(slot_col) / w)
    a = targets.withColumn(
        "_bkt", F.explode(F.array(bkt - 1, bkt, bkt + 1))
    )
    b = candidates.withColumn("_bkt", F.floor(F.col(slot_col) / w))
    on = ["_bkt"]
    tw = int(win_hours * 3600) if win_hours else 0
    if tw and DAY_S % tw == 0:
        ntod = DAY_S // tw
        tb = F.floor(F.pmod(F.col(slot_col), F.lit(DAY_S)) / tw)
        a = a.withColumn(
            "_tbkt",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.pmod(tb - 1, F.lit(ntod)), tb, F.pmod(tb + 1, F.lit(ntod))
                    )
                )
            ),
        )
        b = b.withColumn(
            "_tbkt", F.floor(F.pmod(F.col(slot_col), F.lit(DAY_S)) / tw)
        )
        on = ["_bkt", "_tbkt"]
    cond = (F.col(f"a.{key_col}") == F.col(f"b.{key_col}")) & (
        F.abs(F.col(f"b.{slot_col}") - F.col(f"a.{slot_col}")) <= w
    )
    for c in on:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return a.alias("a").join(b.alias("b"), cond)


def pas20_method1(
    grid: DataFrame,
    key_col: str,
    slot_col: str,
    flux_col: str,
    ta_col: str,
    vpd_col: str,
    swin_col: str,
    win_days: int = 7,
    win_hours: float = 1.0,
    ta_tol: float = 2.5,
    vpd_tol: float = 5.0,
    swin_tol: float = 50.0,
) -> DataFrame:
    """Direct standard-deviation method (uncertainty.py:218-289): adds
    ``randunc`` (stddev_samp of similar measured fluxes when ≥5 present)
    and ``n_method1`` for every measured record."""
    meas = grid.filter(F.col(flux_col).isNotNull()).select(
        key_col, slot_col, flux_col, ta_col, vpd_col, swin_col
    )
    j = _banded_self_join(meas, meas, key_col, slot_col, win_days, win_hours)
    tod_a = F.pmod(F.col(f"a.{slot_col}"), F.lit(DAY_S))
    tod_b = F.pmod(F.col(f"b.{slot_col}"), F.lit(DAY_S))
    sim = (
        _tod_cond(tod_a, tod_b, win_hours)
        & (F.abs(F.col(f"b.{ta_col}") - F.col(f"a.{ta_col}")) <= ta_tol)
        & (F.abs(F.col(f"b.{vpd_col}") - F.col(f"a.{vpd_col}")) <= vpd_tol)
        & (F.abs(F.col(f"b.{swin_col}") - F.col(f"a.{swin_col}")) <= swin_tol)
    )
    stats = (
        j.filter(sim)
        .groupBy(
            F.col(f"a.{key_col}").alias(key_col),
            F.col(f"a.{slot_col}").alias(slot_col),
        )
        .agg(
            F.count(F.col(f"b.{flux_col}")).alias("n_method1"),
            F.stddev_samp(F.col(f"b.{flux_col}")).alias("_sd1"),
        )
    )
    out = grid.join(stats, [key_col, slot_col], "left")
    return out.withColumn(
        "randunc",
        F.when(F.col("n_method1") >= 5, F.col("_sd1")),
    ).drop("_sd1")


def _flux_sim_bounds(gf_a: Column):
    """Similar flux = gapfilled ±max(20 %, 2) (uncertainty.py:325-329;
    note the reference compares the SIGNED 20 % against 2)."""
    add = F.greatest(gf_a * 0.2, F.lit(2.0))
    return gf_a - add, gf_a + add


def pas20_method2_pass(
    snap: DataFrame,
    key_col: str,
    slot_col: str,
    gf_col: str,
    win_days: int = 5,
    win_hours: float = 1.0,
) -> DataFrame:
    """One median-of-similar-uncertainties pass (uncertainty.py:291-355)
    over the snapshot ``snap`` (must already carry ``randunc``): fills
    records whose ``randunc`` is null from the median of snapshot
    uncertainties of similar fluxes within ±win_days, ±win_hours."""
    targets = snap.filter(F.col("randunc").isNull()).select(
        key_col, slot_col, gf_col
    )
    # Candidates with NULL uncertainty contribute nothing to either
    # aggregate below (count/percentile skip nulls), and every target is
    # its own in-window flux-similar candidate (Δt = 0, |gf − gf| = 0 <
    # max(0.2·gf, 2) > 0), so the per-target group always exists in the
    # unfiltered join — pre-filtering nulls and coalescing the count to 0
    # is EXACT while shrinking the join build side from the full snapshot
    # to only the already-filled rows (a few % right after method 1).
    cands = snap.filter(F.col("randunc").isNotNull()).select(
        key_col, slot_col, gf_col, "randunc"
    )
    j = _banded_self_join(targets, cands, key_col, slot_col, win_days, win_hours)
    tod_a = F.pmod(F.col(f"a.{slot_col}"), F.lit(DAY_S))
    tod_b = F.pmod(F.col(f"b.{slot_col}"), F.lit(DAY_S))
    lo, hi = _flux_sim_bounds(F.col(f"a.{gf_col}"))
    sim = (
        _tod_cond(tod_a, tod_b, win_hours)
        & (F.col(f"b.{gf_col}") >= lo)
        & (F.col(f"b.{gf_col}") <= hi)
    )
    med = (
        j.filter(sim)
        .groupBy(
            F.col(f"a.{key_col}").alias(key_col),
            F.col(f"a.{slot_col}").alias(slot_col),
        )
        .agg(
            F.count(F.col("b.randunc")).alias("_n2"),
            F.expr("percentile(b.randunc, 0.5)").alias("_m2"),
        )
    )
    out = snap.join(med, [key_col, slot_col], "left")
    # rows still missing at THIS pass get this pass's window count; rows
    # filled by an earlier pass keep the count from the pass that filled
    # them (reference overwrite semantics, uncertainty.py:316-352)
    prior_n2 = (
        F.col("n_method2") if "n_method2" in snap.columns else F.lit(None)
    )
    out = out.withColumn(
        "n_method2",
        F.when(
            F.col("randunc").isNull(), F.coalesce(F.col("_n2"), F.lit(0))
        ).otherwise(prior_n2),
    )
    return out.withColumn(
        "randunc", F.coalesce(F.col("randunc"), F.col("_m2"))
    ).drop("_m2", "_n2")


def pas20_method3(
    snap: DataFrame, key_col: str, slot_col: str, gf_col: str
) -> DataFrame:
    """Flux-similarity median with NO time window (uncertainty.py:357-395)."""
    targets = snap.filter(F.col("randunc").isNull()).select(
        key_col, slot_col, gf_col
    )
    # Same exact null-candidate elision as method 2: null-uncertainty rows
    # are invisible to count/percentile, and the self-match (every target
    # is flux-similar to itself) guarantees the unfiltered group exists —
    # so filter them out and coalesce the count to 0.  This turns the
    # reference's per-key ALL-PAIRS flux-similarity join (targets × full
    # snapshot — the ladder's quadratic wall when method 1 fills little)
    # into targets × already-filled-rows, typically 30-50× smaller.
    cands = snap.filter(F.col("randunc").isNotNull()).select(
        F.col(key_col).alias("_k"),
        F.col(gf_col).alias("_gf"),
        F.col("randunc").alias("_ru"),
    )
    lo, hi = _flux_sim_bounds(F.col(gf_col))
    med = (
        targets.join(cands, F.col(key_col) == F.col("_k"))
        .filter((F.col("_gf") >= lo) & (F.col("_gf") <= hi))
        .groupBy(key_col, slot_col)
        .agg(
            F.count("_ru").alias("_n3"),
            F.expr("percentile(_ru, 0.5)").alias("_m3"),
        )
    )
    out = snap.join(med, [key_col, slot_col], "left")
    return (
        out.withColumn(
            "n_method3",
            F.when(
                F.col("randunc").isNull(), F.coalesce(F.col("_n3"), F.lit(0))
            ),
        )
        .withColumn("randunc", F.coalesce(F.col("randunc"), F.col("_m3")))
        .drop("_m3", "_n3")
    )


def pas20_method4(
    snap: DataFrame, key_col: str, slot_col: str, gf_col: str
) -> DataFrame:
    """Median of the 10 flux-rank neighbours — positions [i-5, i+5) of the
    gapfilled-flux-sorted frame (uncertainty.py:397-431).  One window pass
    over the snapshot; ties broken by slot for determinism (the reference's
    unstable quicksort leaves tie order unspecified)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(gf_col, slot_col)
        .rowsBetween(-5, 4)
    )
    m4 = F.expr(
        "percentile(randunc, 0.5)"
    ).over(w)
    n4 = F.count("randunc").over(w)
    return (
        snap.withColumn("_m4", m4)
        .withColumn("_n4", n4)
        .withColumn(
            "n_method4",
            F.when(F.col("randunc").isNull(), F.col("_n4")),
        )
        .withColumn("randunc", F.coalesce(F.col("randunc"), F.col("_m4")))
        .drop("_m4", "_n4")
    )


def pas20_random_uncertainty(
    grid: DataFrame,
    key_col: str,
    slot_col: str,
    flux_col: str,
    gf_col: str,
    ta_col: str,
    vpd_col: str,
    swin_col: str,
    win1_days: int = 7,
    win2_days: int = 5,
    win_hours: float = 1.0,
    ta_tol: float = 2.5,
    vpd_tol: float = 5.0,
    swin_tol: float = 50.0,
    expand_method2: int | bool = True,
) -> DataFrame:
    """Full reference ladder (uncertainty.py:81-106): method 1, method 2 at
    ±win2_days, method 2 repeated with day windows win2_days+1, +2, …
    until no record gains a value, then methods 3 and 4.

    ``expand_method2``: True runs the reference's data-dependent expanding
    loop (driver-side convergence checks); an int runs exactly that many
    fixed expansion passes (what the oracle-backed registry query uses).

    EVERY stage boundary localCheckpoints the snapshot (eager): each
    stage's plan references ``snap`` three times (the frame itself plus
    the targets and candidates of its self-join), so an unpinned chain
    triples the plan per stage — 4 chained stages re-execute the grid
    ~3^4 times wherever exchange reuse misses.  The checkpoint caps the
    plan at one stage deep; the snapshot is one row per grid slot, orders
    of magnitude smaller than the raw table.  At cluster scale point
    ``spark.checkpoint.dir`` at reliable storage and swap in
    ``checkpoint()`` for executor-loss resilience.
    """
    snap = pas20_method1(
        grid,
        key_col,
        slot_col,
        flux_col,
        ta_col,
        vpd_col,
        swin_col,
        win_days=win1_days,
        win_hours=win_hours,
        ta_tol=ta_tol,
        vpd_tol=vpd_tol,
        swin_tol=swin_tol,
    )
    snap = pas20_method2_pass(
        snap.localCheckpoint(eager=True),
        key_col, slot_col, gf_col, win_days=win2_days, win_hours=win_hours,
    )
    if expand_method2 is True:
        win = win2_days
        prev_missing = -1
        snap = snap.localCheckpoint(eager=True)
        missing = snap.filter(F.col("randunc").isNull()).count()
        while missing > 0 and missing != prev_missing:
            prev_missing = missing
            win += 1
            snap = pas20_method2_pass(
                snap, key_col, slot_col, gf_col, win_days=win, win_hours=win_hours
            ).localCheckpoint(eager=True)
            missing = snap.filter(F.col("randunc").isNull()).count()
    else:
        for i in range(int(expand_method2)):
            snap = pas20_method2_pass(
                snap.localCheckpoint(eager=True),
                key_col,
                slot_col,
                gf_col,
                win_days=win2_days + 1 + i,
                win_hours=win_hours,
            )
    snap = pas20_method3(snap.localCheckpoint(eager=True), key_col, slot_col, gf_col)
    return pas20_method4(snap, key_col, slot_col, gf_col)


def cumulative_uncertainty(
    df: DataFrame,
    key_col: str,
    slot_col: str,
    gf_col: str,
    unc_col: str = "randunc",
) -> DataFrame:
    """Cumulative flux with propagated uncertainty (uncertainty.py:108-137):
    per-record uncertainties are independent, so the cumulative error is
    sqrt of the running sum of squares; upper/lower = cumulative flux ± it."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(slot_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_flux = F.sum(gf_col).over(w)
    cum_unc = F.sqrt(F.sum(F.col(unc_col) * F.col(unc_col)).over(w))
    return (
        df.withColumn("flux_cum", cum_flux)
        .withColumn("unc_cum", cum_unc)
        .withColumn("flux_cum_upper", cum_flux + cum_unc)
        .withColumn("flux_cum_lower", cum_flux - cum_unc)
    )
