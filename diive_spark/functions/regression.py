"""Small reference-parity helpers (VERDICT r2 missing #4 — cosmetic tail):

* :func:`linear_fit` — per-key simple OLS (reference
  /root/reference/diive/core/dfun/regression.py:6-63, statsmodels there)
  as ONE aggregation of sufficient statistics — slope/intercept/R²/adj-R²
  exactly, no per-key model fitting, scales to any key count.
* :func:`identify_relevants` / :func:`identify_flagcols` — flag-column
  discovery (reference /root/reference/diive/core/base/identify.py:4-46).
* :data:`VARGROUPS` / :func:`match_vars` — variable-group glob patterns
  (reference /root/reference/diive/core/utils/vargroups.py).
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linear_fit(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-key simple linear regression y = k·x + d.

    Sufficient statistics in one map-side-combinable aggregate:
    k = cov(x,y)/var(x), d = ȳ − k·x̄, R² = corr², adj-R² with p=1
    (the reference returns exactly these from statsmodels OLS).  Rows with
    a null in either column are dropped first (regression.py:37-38)."""
    nn = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    agg = nn.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.covar_samp(x_col, y_col).alias("_cov"),
        F.var_samp(x_col).alias("_varx"),
        F.avg(x_col).alias("_mx"),
        F.avg(y_col).alias("_my"),
        F.corr(x_col, y_col).alias("_r"),
    )
    k = F.col("_cov") / F.col("_varx")
    r2 = F.col("_r") * F.col("_r")
    adj = 1 - (1 - r2) * (F.col("n") - 1) / (F.col("n") - 2)
    return agg.select(
        key_col,
        "n",
        k.alias("slope"),
        (F.col("_my") - k * F.col("_mx")).alias("intercept"),
        r2.alias("rsquared"),
        adj.alias("rsquared_adj"),
    )


def identify_relevants(seriescol: str) -> list[str]:
    """Name fragments whose QC flags are relevant for ``seriescol``
    (identify.py:4-34: fluxes may be renamed across processing levels,
    e.g. NEE checks live on FC flags)."""
    groups = (
        (("NEE_",), ("FC", "co2_flux"), ["_FC_", "_NEE_", "_co2_flux_"]),
        (("co2_flux_",), (), ["CHECK", "_NEE_"]),
        (("H_",), ("H",), ["_H_"]),
        (("LE_",), ("LE",), ["_LE_"]),
        (("ET_",), ("ET",), ["_ET_"]),
        (("FH2O_",), ("FH2O",), ["_FH2O_"]),
        (("h2o_flux_",), ("h2o_flux",), ["_h2o_flux_"]),
        (("TAU_",), ("TAU",), ["_TAU_"]),
        (("FN2O_",), ("FN2O",), ["_FN2O_"]),
        (("FCH4_",), ("FCH4",), ["_FCH4_"]),
    )
    for prefixes, exacts, relevant in groups:
        if seriescol.startswith(prefixes) or seriescol in exacts:
            return relevant
    return [seriescol]


def identify_flagcols(columns: list[str], seriescol: str) -> list[str]:
    """FLAG_*_TEST / FLAG_*_QCF columns relevant for ``seriescol``
    (identify.py:37-46); takes column names, not a frame."""
    flagcols = [
        c
        for c in columns
        if str(c).startswith("FLAG_") and str(c).endswith(("_TEST", "_QCF"))
    ]
    relevant = identify_relevants(seriescol)
    return [f for f in flagcols if any(n in f for n in relevant)]


# variable-group glob patterns (vargroups.py) — the subset the engine's
# operators consume; extend freely, matching is plain fnmatch
VARGROUPS: dict[str, list[str]] = {
    "AIR_TEMPERATURE": ["*TA_*", "Ta_*", "*air_temperature*"],
    "SHORTWAVE_IN": ["*SW_IN_*", "Rg_*"],
    "VPD": ["*VPD*"],
    "WIND_DIR": ["wind_dir"],
    "WIND_SPEED": ["*wind_speed*", "*u_rot*"],
    "FLUXES_EDDYPRO": [
        "co2_flux", "h2o_flux", "LE", "H", "ET", "n2o_flux", "ch4_flux",
    ],
    "FLUXES_FLUXNET": ["NEE*", "GPP*", "RECO*"],
    "NIGHTTIME_DETECTION": ["*SW_IN*", "*Rg_*", "*daytime*", "*PPFD_*"],
    "QCFLAGS_EDDYPRO_SSITC": ["*qc_*"],
    "SPECTRAL_CORRECTION_FACTOR": ["*_scf*"],
    "STORAGE": ["*_strg*"],
    "SIGNAL_STRENGTH_GA": [
        "*signal_strength*", "*window_dirtiness*", "*status_byte*", "*agc*",
    ],
}


def match_vars(columns: list[str], group: str | list[str]) -> list[str]:
    """Columns matching a VARGROUPS key or an explicit pattern list."""
    patterns = VARGROUPS[group] if isinstance(group, str) else group
    return [
        c for c in columns if any(fnmatch.fnmatch(str(c), p) for p in patterns)
    ]
