"""CO2 penalty from critical heat days (SURVEY §2.11 ``CO2penalty``,
/root/reference/diive/pkgs/flux/co2_penalty.py:25-876).

What-if analysis: on critical heat days (daily-max TA and VPD above
their P95 thresholds, within the penalty months) the measured data are
REMOVED and replaced with "no heat wave" estimates — TA from the
near-critical-day diel-cycle median (co2_penalty.py:295-360), VPD
recomputed from limited TA + measured RH, SW_IN and NEP gap-filled —
and the penalty is the difference between the counterfactual NEP and
the measured NEP, cumulated and summed per year.

Gap-filling stage: the reference uses a random-forest ensemble; this
operator's default filler is the deterministic diel-cycle (time-of-day)
median of the non-removed rows — the same template mechanism the
reference itself uses for TA — which keeps the whole pipeline a pure
DataFrame plan with an exact DuckDB oracle.  For model-based filling
compose with ``ml/gapfill.ml_gapfill`` (M1), the engine's RF-pipeline
stand-in.

Scale shape: daily maxes are a per-date window (one exchange keyed by
date); every diel template is a 48-row aggregate broadcast back onto
the fact table; the only inherently sequential parts are the global
cumulative sums (single-site series — partition by site key for
multi-site data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from diive_spark.functions.meteo import vpd_from_ta_rh

UMOL_TO_G_CO2_30MIN = 0.0792171  # umol CO2 m-2 s-1 -> g CO2 m-2 30min-1


def _diel_median(df: DataFrame, value_col: str, tod_col: str) -> DataFrame:
    """Time-of-day median of the non-null rows (co2_penalty.py:386-392)."""
    return df.filter(F.col(value_col).isNotNull()).groupBy(tod_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias(f"_tpl_{value_col}")
    )


def co2_penalty_hires(
    df: DataFrame,
    ts_col: str,
    nee_col: str,
    ta_col: str,
    rh_col: str,
    swin_col: str,
    vpd_col: str,
    thres_chd_ta: float,
    thres_chd_vpd: float,
    thres_nchd_ta: tuple[float, float],
    thres_nchd_vpd: tuple[float, float],
    penalty_start_month: int = 5,
    penalty_end_month: int = 9,
    tod_resolution_seconds: int = 1800,
) -> DataFrame:
    """High-res frame with ``flag_chd/flag_nchd``, limited + filled
    columns, ``nep/nep_limited_gf/penalty`` and global cumulatives.

    ``tod_resolution_seconds`` buckets the time-of-day key for the diel
    templates (the reference's half-hourly data has 48 natural slots;
    irregular timestamps need explicit bucketing)."""
    ts = F.col(ts_col).cast("timestamp")
    sec_of_day = F.floor(F.unix_micros(ts) / 1_000_000).cast("long") % 86400
    d = df.withColumn("_date", F.to_date(ts)).withColumn(
        "_tod",
        (F.floor(sec_of_day / tod_resolution_seconds)
         * tod_resolution_seconds).cast("long"),
    ).withColumn("_month", F.month(ts))
    # NEE unit conversion + NEP (co2_penalty.py:77-83)
    d = d.withColumn("nep", F.col(nee_col) * UMOL_TO_G_CO2_30MIN * -1)
    # daily maxima broadcast back to hires rows (A3 aggregated_as_hires)
    wd = Window.partitionBy("_date")
    d = d.withColumn("_ta_dmax", F.max(ta_col).over(wd)).withColumn(
        "_vpd_dmax", F.max(vpd_col).over(wd)
    )
    in_months = F.col("_month").between(penalty_start_month, penalty_end_month)
    chd = (
        (F.col("_ta_dmax") >= thres_chd_ta)
        & (F.col("_vpd_dmax") >= thres_chd_vpd)
        & in_months
    )
    nchd = (
        F.col("_ta_dmax").between(*thres_nchd_ta)
        & F.col("_vpd_dmax").between(*thres_nchd_vpd)
        & in_months
    )
    d = d.withColumn("flag_chd", chd.cast("int")).withColumn(
        "flag_nchd", nchd.cast("int")
    )
    # TA template: diel median over nCHD rows, joined on time-of-day
    # (48 rows -> broadcast), then CHD TA replaced; pandas fillna also
    # fills PRE-EXISTING TA nulls with the template — mirrored by the
    # outer coalesce (co2_penalty.py:341-346)
    ta_tpl = _diel_median(
        d.filter(F.col("flag_nchd") == 1).select("_tod", ta_col), ta_col, "_tod"
    )
    d = d.join(F.broadcast(ta_tpl), "_tod", "left")
    d = d.withColumn(
        "ta_limited",
        F.coalesce(
            F.when(F.col("flag_chd") == 1, F.lit(None)).otherwise(F.col(ta_col)),
            F.col(f"_tpl_{ta_col}"),
        ),
    )
    # VPD recomputed from limited TA + measured RH, template-filled
    d = d.withColumn("vpd_limited", vpd_from_ta_rh(F.col("ta_limited"), F.col(rh_col)))
    vpd_tpl = _diel_median(d.select("_tod", "vpd_limited"), "vpd_limited", "_tod")
    d = d.join(F.broadcast(vpd_tpl), "_tod", "left").withColumn(
        "vpd_limited_gf", F.coalesce("vpd_limited", "_tpl_vpd_limited")
    )
    # SW_IN: CHD rows removed, template-filled
    d = d.withColumn(
        "swin_limited",
        F.when(F.col("flag_chd") == 1, F.lit(None)).otherwise(F.col(swin_col)),
    )
    sw_tpl = _diel_median(d.select("_tod", "swin_limited"), "swin_limited", "_tod")
    d = d.join(F.broadcast(sw_tpl), "_tod", "left").withColumn(
        "swin_limited_gf", F.coalesce("swin_limited", "_tpl_swin_limited")
    )
    # NEP: CHD rows removed, counterfactual fill
    d = d.withColumn(
        "nep_limited",
        F.when(F.col("flag_chd") == 1, F.lit(None)).otherwise(F.col("nep")),
    )
    nep_tpl = _diel_median(d.select("_tod", "nep_limited"), "nep_limited", "_tod")
    d = d.join(F.broadcast(nep_tpl), "_tod", "left").withColumn(
        "nep_limited_gf", F.coalesce("nep_limited", "_tpl_nep_limited")
    ).withColumn(
        "flag_nep_filled",
        (F.col("nep_limited").isNull() & F.col("nep_limited_gf").isNotNull()).cast("int"),
    )
    # penalty + global cumulatives (co2_penalty.py:203-210).
    # SCOPE GUARD: the unpartitioned running-sum window is the reference's
    # own contract — ONE site's single flux series (≤ ~20 yr of 30-min
    # slots, bounded rows).  Do NOT lift into a multi-site path: partition
    # by site id, or use operators/rank.py::global_row_number to seed a
    # distributed cumulative.
    d = d.withColumn("penalty", F.col("nep_limited_gf") - F.col("nep"))
    wc = Window.orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.withColumn("cumsum_nep", F.sum("nep").over(wc))
        .withColumn("cumsum_nep_limited_gf", F.sum("nep_limited_gf").over(wc))
        .withColumn("cumsum_penalty", F.sum("penalty").over(wc))
        .drop(f"_tpl_{ta_col}", "_tpl_vpd_limited", "_tpl_swin_limited",
              "_tpl_nep_limited")
    )


def co2_penalty_per_year(
    hires: DataFrame,
    ts_col: str,
    ta_col: str,
    vpd_col: str,
    thres_chd_ta: float,
    thres_chd_vpd: float,
) -> DataFrame:
    """Yearly overview (co2_penalty.py:221-241): penalty / NEP sums per
    year plus the number of critical heat DAYS — which the reference
    counts with STRICT > thresholds and without the month window, unlike
    the >= flagging (co2_penalty.py:228-230); mirrored."""
    y = F.year(F.col(ts_col).cast("timestamp")).alias("year")
    sums = hires.groupBy(y).agg(
        F.sum("penalty").alias("penalty"),
        F.sum("nep_limited_gf").alias("nep_limited_gf"),
        F.sum("nep").alias("nep"),
    )
    daily = (
        hires.groupBy(
            F.year(F.col(ts_col).cast("timestamp")).alias("year"),
            F.to_date(F.col(ts_col).cast("timestamp")).alias("_d"),
        )
        .agg(F.max(ta_col).alias("_ta"), F.max(vpd_col).alias("_vpd"))
        .filter((F.col("_ta") > thres_chd_ta) & (F.col("_vpd") > thres_chd_vpd))
        .groupBy("year")
        .agg(F.count("*").cast("long").alias("num_chds"))
    )
    return sums.join(daily, "year", "left").fillna(0, subset=["num_chds"])
