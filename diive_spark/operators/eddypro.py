"""EddyPro Level-2 quality-flag family (SURVEY §2.8 F12).

Re-expresses the full flag set of the reference's
``FluxQualityFlagsEddyPro``
(/root/reference/diive/pkgs/fluxprocessingchain/level2_qualityflags.py:16-139)
and its worker functions
(/root/reference/diive/pkgs/qaqc/eddyproflags.py:13-480):

* angle-of-attack + horizontal-wind-steadiness digit flags
* VM97 raw-data screens (fluxnet packed-integer layout: one integer,
  eight test digits per gas)
* signal-strength / AGC threshold flag
* spectral-correction-factor (SCF) 3-level flag
* gas completeness 3-level flag
* SSITC pass-through flag

Everything here is a pure column expression — whole-stage codegen, no
Python, no shuffle: at 100 TB these flags are free riders on whatever
scan produces the flux rows.

Digit extraction is done on the LONG's decimal string (substring), not
the reference's float->str->char indexing (eddyproflags.py:91-98,
308-317): Spark's double->string can use scientific notation, while a
long always prints plain digits; on integer flag values the two agree
(asserted by the differential test against the imported reference in
tests/test_reference_differential3.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diive_spark.operators import flags as FL


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def digit_flag(
    raw: Column | str,
    digit_pos: int = 1,
    n_digits: int = 2,
    hard: bool = True,
) -> Column:
    """One test digit of an EddyPro packed integer flag.

    ``digit_pos`` is 0-based from the left; position 0 is the constant
    ``8`` width marker.  Missing input -> an all-nines fill (``89``,
    ``899999999``, ...; 9 = missing-flag sentinel); digit 9 -> null;
    hard flags remap 1 -> 2 (bad), soft flags keep 1 (ok)
    (eddyproflags.py:91-98,136-143,308-317).
    """
    fill = 8 * 10 ** (n_digits - 1) + (10 ** (n_digits - 1) - 1)
    filled = F.coalesce(_c(raw).cast("long"), F.lit(fill))
    digit = F.substring(filled.cast("string"), digit_pos + 1, 1).cast("int")
    out = F.when(digit == 9, F.lit(None))
    if hard:
        out = out.when(digit == 1, F.lit(2))
    return out.otherwise(digit).cast("tinyint")


def flag_angle_of_attack(raw: Column | str) -> Column:
    """AoA hard flag from the 2-digit ``8a`` integer
    (eddyproflags.py:108-150)."""
    return digit_flag(raw, digit_pos=1, n_digits=2, hard=True)


def flag_steadiness_horizontal_wind(raw: Column | str) -> Column:
    """Horizontal-wind-steadiness hard flag from the 2-digit ``8U``
    integer (eddyproflags.py:62-105)."""
    return digit_flag(raw, digit_pos=1, n_digits=2, hard=True)


# (name, digit position, hard) for the fluxnet-file VM97 packed integer.
# Hardness mirrors the REFERENCE CODE, not its comments: the reference
# decides hard vs soft by '_HF_' in the output name
# (eddyproflags.py:314-316), and the dropout flag's name
# ("..._VM97_DROPOUT_TEST") contains no '_HF_', so its 1 is NOT remapped
# to 2 even though the comment calls it a hard flag — mirrored here.
VM97_FLUXNET_TESTS: dict[str, tuple[str, int, bool]] = {
    "spikes": ("flag_vm97_spike_hf", 1, True),
    "amplitude": ("flag_vm97_amplitude_resolution_hf", 2, True),
    "dropout": ("flag_vm97_dropout", 3, False),
    "abslim": ("flag_vm97_absolute_limits_hf", 4, True),
    "skewkurt_hf": ("flag_vm97_skewkurt_hf", 5, True),
    "skewkurt_sf": ("flag_vm97_skewkurt_sf", 6, False),
    "discont_hf": ("flag_vm97_discontinuities_hf", 7, True),
    "discont_sf": ("flag_vm97_discontinuities_sf", 8, False),
}


def vm97_fluxnet_flags(
    vm97: Column | str,
    spikes: bool = True,
    amplitude: bool = False,
    dropout: bool = True,
    abslim: bool = False,
    skewkurt_hf: bool = False,
    skewkurt_sf: bool = False,
    discont_hf: bool = False,
    discont_sf: bool = False,
) -> dict[str, Column]:
    """Selected VM97 raw-data screens from the fluxnet-file 9-digit
    packed integer (one integer = eight tests for one gas,
    eddyproflags.py:261-353).  Defaults (spikes + dropout) match the
    reference's ``raw_data_screening_vm97_tests`` defaults."""
    selected = {
        "spikes": spikes,
        "amplitude": amplitude,
        "dropout": dropout,
        "abslim": abslim,
        "skewkurt_hf": skewkurt_hf,
        "skewkurt_sf": skewkurt_sf,
        "discont_hf": discont_hf,
        "discont_sf": discont_sf,
    }
    return {
        name: digit_flag(vm97, digit_pos=pos, n_digits=9, hard=hard)
        for key, (name, pos, hard) in VM97_FLUXNET_TESTS.items()
        if selected[key]
    }


def vm97_fulloutput_flag(
    test_col: Column | str, units: str, gas: str, hard: bool
) -> Column:
    """One VM97 screen from a full-output-file packed integer (one
    integer = ONE test for MULTIPLE gases; the gas's digit position
    comes from the units string, e.g. ``8u/v/w/ts/co2/h2o/ch4/none``,
    eddyproflags.py:153-258)."""
    gases = units.replace("8", "").split("/")
    pos = gases.index(gas) + 1  # +1: position 0 is the 8 marker
    return digit_flag(test_col, digit_pos=pos, n_digits=9, hard=hard)


def flag_signal_strength(
    ss: Column | str, method: str, threshold: float
) -> Column:
    """0 = sufficient signal, 2 = insufficient; null signal stays null
    (eddyproflags.py:13-59)."""
    s = _c(ss)
    if method == "discard below":
        return (
            F.when(s >= threshold, F.lit(0)).when(s < threshold, F.lit(2))
        ).cast("tinyint")
    if method == "discard above":
        return (
            F.when(s <= threshold, F.lit(0)).when(s > threshold, F.lit(2))
        ).cast("tinyint")
    raise ValueError(f"unknown signal-strength method {method!r}")


def flag_spectral_correction_factor(
    scf: Column | str, thres_good: float = 2, thres_ok: float = 4
) -> Column:
    """0 good (< thres_good), 1 ok, 2 bad (>= thres_ok)
    (eddyproflags.py:407-437)."""
    s = _c(scf)
    return (
        F.when(s < thres_good, F.lit(0))
        .when((s >= thres_good) & (s < thres_ok), F.lit(1))
        .when(s >= thres_ok, F.lit(2))
        .cast("tinyint")
    )


def flag_gas_completeness(
    n_records: Column | str,
    expected: Column | str | int,
    thres_good: float = 0.99,
    thres_ok: float = 0.97,
) -> Column:
    """0/1/2 by the fraction of potential raw records actually used for
    the flux (eddyproflags.py:356-404)."""
    exp = F.lit(expected) if isinstance(expected, int) else _c(expected)
    ratio = _c(n_records) / exp
    return (
        F.when(ratio >= thres_good, F.lit(0))
        .when((ratio >= thres_ok) & (ratio < thres_good), F.lit(1))
        .when(ratio < thres_ok, F.lit(2))
        .cast("tinyint")
    )


def flag_ssitc(ssitc: Column | str) -> Column:
    """EddyPro's own SSITC (Foken) 0/1/2 flag passed through
    (eddyproflags.py:455-481)."""
    return _c(ssitc).cast("tinyint")


def level2_flags(
    df: DataFrame,
    flux_col: str,
    vm97_col: str | None = None,
    ssitc_col: str | None = None,
    scf_col: str | None = None,
    nr_col: str | None = None,
    expect_col: str | int | None = None,
    signal_strength_col: str | None = None,
    signal_strength_method: str = "discard below",
    signal_strength_threshold: float = 40,
    aoa_col: str | None = None,
    nshw_col: str | None = None,
    vm97_tests: dict[str, bool] | None = None,
    with_missing: bool = True,
) -> tuple[DataFrame, list[str]]:
    """The full Level-2 composition of ``FluxQualityFlagsEddyPro``
    (level2_qualityflags.py:16-139) for the fluxnet filetype: every
    configured flag appended as a column; returns (df, flag column
    names) ready for the QCF ladder.  One projection, zero shuffles.
    """
    flag_cols: list[str] = []

    def add(name: str, col: Column) -> None:
        nonlocal df
        df = df.withColumn(name, col)
        flag_cols.append(name)

    if with_missing:
        df = FL.flag_missing(df, flux_col, flag_col="flag_missing")
        flag_cols.append("flag_missing")
    if vm97_col is not None:
        for name, col in vm97_fluxnet_flags(vm97_col, **(vm97_tests or {})).items():
            add(name, col)
    if aoa_col is not None:
        add("flag_vm97_aoa_hf", flag_angle_of_attack(aoa_col))
    if nshw_col is not None:
        add("flag_vm97_nshw_hf", flag_steadiness_horizontal_wind(nshw_col))
    if ssitc_col is not None:
        add("flag_ssitc", flag_ssitc(ssitc_col))
    if scf_col is not None:
        add("flag_scf", flag_spectral_correction_factor(scf_col))
    if nr_col is not None and expect_col is not None:
        add("flag_completeness", flag_gas_completeness(nr_col, expect_col))
    if signal_strength_col is not None:
        add(
            "flag_signal_strength",
            flag_signal_strength(
                signal_strength_col,
                signal_strength_method,
                signal_strength_threshold,
            ),
        )
    return df, flag_cols
