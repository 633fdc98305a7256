"""Flux processing chain operators (SURVEY §2.8 F12/F13/F14, §3 E2).

The reference's ``FluxProcessingChain`` runs Level-2 (EddyPro quality
flags) -> Level-3.1 (storage correction) -> Level-3.2 (outlier
detection), each level finalized through the QCF ladder
(/root/reference/diive/pkgs/fluxprocessingchain/fluxprocessingchain.py:20-393).

Spark shape: each level is a fold of column transforms over ONE long
DataFrame — the whole chain is a single lazy DAG (no per-level
materialization like the reference's eager ``fpc_df`` appends).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diive_spark.operators import flags as FL
from diive_spark.operators import outliers as OU


def eddypro_digit_flag(raw: Column | str, digit_pos: int = 1) -> Column:
    """Extract one hard-flag digit from an EddyPro integer flag value
    (e.g. ``81`` -> digit[1] = ``1``), re-expressing
    /root/reference/diive/pkgs/qaqc/eddyproflags.py:91-98,136-143:

      missing -> 89 (9 = missing-flag sentinel), take char ``digit_pos``
      of the integer's string form, remap 9 -> null and 1 -> 2 (hard
      flag); 0 stays 0 (test passed).
    """
    raw = F.col(raw) if isinstance(raw, str) else raw
    filled = F.coalesce(raw.cast("long"), F.lit(89))
    digit = F.substring(filled.cast("string"), digit_pos + 1, 1).cast("int")
    return (
        F.when(digit == 9, F.lit(None))
        .when(digit == 1, F.lit(2))
        .otherwise(digit)
        .cast("tinyint")
    )


def storage_correction(
    df: DataFrame,
    flux_col: str,
    storage_col: str,
    out_col: str = "flux_corrected",
) -> DataFrame:
    """Level-3.1: ``flux + storage_term``
    (/root/reference/diive/pkgs/fluxprocessingchain/level31_storagecorrection.py:129-147,
    non-gapfilled branch).  Null storage keeps the flux un-correctable
    (null), matching pandas ``Series.add`` NaN propagation."""
    return df.withColumn(out_col, F.col(flux_col) + F.col(storage_col))


def flux_chain(
    df: DataFrame,
    key_col: str,
    flux_col: str,
    storage_col: str,
    raw_flag_col: str,
    abs_min: float,
    abs_max: float,
    zscore_thres: float = 4.0,
) -> DataFrame:
    """Level-2 -> Level-3.1 -> Level-3.2 chain on a long DataFrame.

    L2: EddyPro digit flag + absolute limits -> QCF -> filtered flux.
    L3.1: storage-corrected flux from the L2-filtered flux.
    L3.2: per-series z-score flag on the corrected flux -> final QCF.

    Mirrors fluxprocessingchain.py:180-393 (flag expansion, per-level
    ``_finalize_level``) with flag columns suffixed ``_l2``/``_l32``.
    """
    d = df.withColumn("flag_vm97_l2", eddypro_digit_flag(raw_flag_col))
    d = FL.flag_abslim(
        d, flux_col, minval=abs_min, maxval=abs_max, flag_col="flag_abslim_l2"
    )
    d = FL.add_qcf(
        d,
        ["flag_vm97_l2", "flag_abslim_l2"],
        value_col=flux_col,
        qcf_col="qcf_l2",
        suffix="_l2",
    )
    # the L2-filtered flux (QCF==2 rejected -> null) feeds Level-3.1
    d = storage_correction(d, f"{flux_col}_qcf", storage_col, out_col="flux_l31")
    d = OU.zscore_flag_expr(
        d, key_col, "flux_l31", thres_zscore=zscore_thres, flag_col="flag_zscore_l32"
    )
    d = FL.add_qcf(
        d,
        ["flag_zscore_l32"],
        value_col="flux_l31",
        qcf_col="qcf_l32",
        suffix="_l32",
    )
    return d
