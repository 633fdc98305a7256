"""FLUXNET data-sharing export sink (SURVEY §2.11
``FormatEddyProFluxnetFileForUpload``,
/root/reference/diive/pkgs/formats/fluxnet.py:31-322).

The reference's pipeline: subset shareable variables -> rename to FLUXNET
variable codes -> add the ``_1_1_1`` position suffix -> insert
TIMESTAMP_START / TIMESTAMP_END columns -> format both to ``YYYYMMDDhhmm``
-> fill missing with -9999 -> one CSV file per year.

Spark shape: the whole format is one projection (codegen, no shuffle);
the yearly export is a ``partitionBy(year)`` CSV write — the scalable
analog of the reference's one-file-per-year loop (each year's directory
holds as many part files as the cluster wants; a single year is NOT
funneled through one task).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shareable variables of the EddyPro _fluxnet_ output (fluxnet.py:14-21;
# public FLUXNET variable codes).
VARS_CO2 = ["FC", "FC_SSITC_TEST", "SC_SINGLE", "CO2"]
VARS_H2O = ["LE", "LE_SSITC_TEST", "SLE_SINGLE", "H2O"]
VARS_H = ["H", "H_SSITC_TEST", "SH_SINGLE"]
VARS_WIND = ["USTAR", "WD", "WS", "FETCH_70", "FETCH_90", "FETCH_MAX"]
VARS_METEO = [
    "SW_IN_1_1_1", "TA_1_1_1", "RH_1_1_1", "PA_1_1_1", "LW_IN_1_1_1",
    "PPFD_IN_1_1_1", "G_1_1_1", "NETRAD_1_1_1", "TS_1_1_1", "P_1_1_1",
    "SWC_1_1_1",
]
VARIABLES = VARS_CO2 + VARS_H2O + VARS_H + VARS_WIND + VARS_METEO

# FLUXNET variable-code renames (fluxnet.py:24-28)
RENAME_CODES = {"SC_SINGLE": "SC", "SLE_SINGLE": "SLE", "SH_SINGLE": "SH"}

_SUFFIX_RE = re.compile(r".*_[0-9]_[0-9]_[0-9]$")
MISSING = -9999


def format_fluxnet(
    df: DataFrame,
    ts_col: str = "ts",
    freq_seconds: int = 1800,
    variables: list[str] | None = None,
) -> DataFrame:
    """Project a TIMESTAMP_END-indexed dataset into the FLUXNET upload
    layout (fluxnet.py:180-272):

    * keep only shareable ``variables`` (default: the reference's
      VARIABLES list) that are present, in list order;
    * rename to FLUXNET variable codes and add the ``_1_1_1`` suffix to
      names that don't already carry a position suffix;
    * TIMESTAMP_START / TIMESTAMP_END as ``YYYYMMDDhhmm`` strings
      (``ts_col`` holds the interval END; start = end - freq);
    * missing values -> -9999.
    """
    wanted = variables if variables is not None else VARIABLES
    present = [v for v in wanted if v in df.columns]
    cols = []
    for v in present:
        name = RENAME_CODES.get(v, v)
        if not _SUFFIX_RE.match(name):
            name = f"{name}_1_1_1"
        cols.append(F.coalesce(F.col(v), F.lit(MISSING)).alias(name))
    ts = F.col(ts_col).cast("timestamp")
    start = ts - F.expr(f"INTERVAL {freq_seconds} SECOND")
    return df.select(
        F.date_format(start, "yyyyMMddHHmm").alias("TIMESTAMP_START"),
        F.date_format(ts, "yyyyMMddHHmm").alias("TIMESTAMP_END"),
        *cols,
    )


def export_fluxnet_yearly(
    formatted: DataFrame,
    outdir: str,
    site: str,
) -> None:
    """Write the formatted table as one CSV directory per year
    (fluxnet.py:198-209 writes ``{site}_{year}_fluxes_meteo.csv``; here
    each year is a ``year=YYYY`` partition directory under
    ``{outdir}/{site}_fluxes_meteo/`` so a year's data parallelizes
    across tasks instead of funneling through one writer)."""
    (
        formatted.withColumn(
            "year", F.substring("TIMESTAMP_END", 1, 4).cast("int")
        )
        .repartition(F.col("year"))
        .write.mode("overwrite")
        .partitionBy("year")
        .option("header", True)
        .csv(f"{outdir}/{site}_fluxes_meteo")
    )
