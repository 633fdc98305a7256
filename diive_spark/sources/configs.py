"""Filetype-config reader + file-inventory scaffold (SURVEY §2.1 S9/S10).

* **S10 ConfigFileReader**
  (/root/reference/diive/core/io/filereader.py:40-135): YAML load +
  ``validate_filetype_config`` — the same section-by-section type
  coercions ('-not-available-' -> None, COMPRESSION 'None' -> None,
  INDEX_COLUMN list-of-lists -> list-of-tuples, list/str casts).  The
  validated dict maps onto :func:`filetype_reader_options` which a
  Spark CSV read consumes (see sources/csvfiles.py).

* **S9 FileDetector** (/root/reference/diive/core/io/filedetector.py:
  15-145): build the files-overview table — the expected-file grid at
  ``file_generation_res``, availability of each expected file, any
  unexpected (off-grid) files, expected end/duration/records per file,
  and the ``files_how_many`` cutoff.  A file *listing* is inherently
  driver-side metadata (thousands of rows, not billions), so the
  overview is assembled in pandas and returned as a Spark DataFrame for
  downstream joins against tier lineage.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def validate_filetype_config(config: dict) -> dict:
    """Type-coerce a filetype config dict in place (filereader.py:73-111)."""
    config["GENERAL"]["NAME"] = str(config["GENERAL"]["NAME"])
    config["GENERAL"]["DESCRIPTION"] = str(config["GENERAL"]["DESCRIPTION"])
    config["GENERAL"]["TAGS"] = list(config["GENERAL"]["TAGS"])

    config["FILE"]["EXTENSION"] = str(config["FILE"]["EXTENSION"])
    config["FILE"]["COMPRESSION"] = str(config["FILE"]["COMPRESSION"])
    if config["FILE"]["COMPRESSION"] == "None":
        config["FILE"]["COMPRESSION"] = None

    config["TIMESTAMP"]["DESCRIPTION"] = str(config["TIMESTAMP"]["DESCRIPTION"])
    idx = config["TIMESTAMP"]["INDEX_COLUMN"]
    if idx == "-not-available-":
        config["TIMESTAMP"]["INDEX_COLUMN"] = None
    else:
        idx = list(idx)
        # YAML cannot express tuples: [[name, units], ...] -> [(name, units), ...]
        if idx and isinstance(idx[0], list):
            idx = [(c[0], c[1]) for c in idx]
        config["TIMESTAMP"]["INDEX_COLUMN"] = idx
    if config["TIMESTAMP"]["DATETIME_FORMAT"] == "-not-available-":
        config["TIMESTAMP"]["DATETIME_FORMAT"] = None
    else:
        config["TIMESTAMP"]["DATETIME_FORMAT"] = str(
            config["TIMESTAMP"]["DATETIME_FORMAT"]
        )
        config["TIMESTAMP"]["SHOWS_START_MIDDLE_OR_END_OF_RECORD"] = str(
            config["TIMESTAMP"]["SHOWS_START_MIDDLE_OR_END_OF_RECORD"]
        )

    config["DATA"]["HEADER_SECTION_ROWS"] = list(config["DATA"]["HEADER_SECTION_ROWS"])
    config["DATA"]["SKIP_ROWS"] = list(config["DATA"]["SKIP_ROWS"])
    config["DATA"]["HEADER_ROWS"] = list(config["DATA"]["HEADER_ROWS"])
    config["DATA"]["NA_VALUES"] = list(config["DATA"]["NA_VALUES"])
    config["DATA"]["FREQUENCY"] = str(config["DATA"]["FREQUENCY"])
    config["DATA"]["DELIMITER"] = str(config["DATA"]["DELIMITER"])
    return config


def read_filetype_config(path: str | Path, validation: str = "filetype") -> dict:
    """S10: load a filetype/meteopipe YAML config
    (``ConfigFileReader.read``, filereader.py:62-70)."""
    import yaml

    with open(path, encoding="utf-8") as f:
        config = yaml.safe_load(f)
    if validation == "filetype":
        config = validate_filetype_config(config)
    return config


_STRPTIME_TO_SPARK = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%j", "DDD"),
]


def strptime_to_spark(fmt: str) -> str:
    """Translate the config's strptime DATETIME_FORMAT to a Spark
    datetime pattern (both are public specs; only the tokens the
    filetype library actually uses are mapped)."""
    out = fmt
    for a, b in _STRPTIME_TO_SPARK:
        out = out.replace(a, b)
    return out


def filetype_reader_options(config: dict) -> dict:
    """Collapse a validated filetype config to Spark CSV reader kwargs
    (consumed by ``read_filetype_csv``): delimiter, NA sentinels, units
    row presence, timestamp format."""
    data = config["DATA"]
    ts = config["TIMESTAMP"]
    return {
        "sep": data["DELIMITER"],
        "na_values": [str(v) for v in data["NA_VALUES"]],
        "units_row": len(data["HEADER_ROWS"]) > 1,
        "ts_format": (
            strptime_to_spark(ts["DATETIME_FORMAT"])
            if ts["DATETIME_FORMAT"]
            else None
        ),
        "compression": config["FILE"]["COMPRESSION"],
    }


def files_overview_pdf(
    filelist: list,
    file_date_format: str,
    file_generation_res: str,
    data_res: float,
    files_how_many: int | None = None,
) -> pd.DataFrame:
    """S9 files-overview (FileDetector.run, filedetector.py:57-145):
    expected-file grid + availability + unexpected files + expected
    end/duration/records + file-count cutoff.  Pure pandas — the test
    oracle AND the driver-side implementation."""
    filelist = [Path(p) for p in filelist]
    first_dt = dt.datetime.strptime(filelist[0].name, file_date_format)
    last_dt = dt.datetime.strptime(filelist[-1].name, file_date_format)
    expected_end = last_dt + pd.Timedelta(file_generation_res)
    idx = pd.date_range(first_dt, expected_end, freq=file_generation_res)
    files_df = pd.DataFrame(index=idx)

    for fp in filelist:  # expected (on-grid) files
        start = dt.datetime.strptime(fp.name, file_date_format)
        if start in files_df.index:
            files_df.loc[start, "file_available"] = 1
            files_df.loc[start, "filename"] = fp.name
            files_df.loc[start, "start"] = start
            files_df.loc[start, "filepath"] = fp
            files_df.loc[start, "filesize"] = Path(fp).stat().st_size
    files_df.insert(0, "expected_file", files_df.index)
    for fp in filelist:  # unexpected (off-grid) files
        start = dt.datetime.strptime(fp.name, file_date_format)
        if start not in files_df.index:
            files_df.loc[start, "file_available"] = 1
            files_df.loc[start, "filename"] = fp.name
            files_df.loc[start, "start"] = start
            files_df.loc[start, "filepath"] = fp
            files_df.loc[start, "filesize"] = Path(fp).stat().st_size
    files_df = files_df.sort_index()

    files_df["expected_end"] = files_df.index
    files_df["expected_end"] = files_df["expected_end"].shift(-1)
    files_df["expected_duration"] = (
        files_df["expected_end"] - files_df["start"]
    ).dt.total_seconds()
    files_df["expected_records"] = files_df["expected_duration"] / data_res
    files_df["file_available"] = files_df["file_available"].fillna(0)

    if files_how_many:
        for i in files_df.index:
            sub = files_df.loc[files_df.index[0] : i]
            if sub["file_available"].sum() >= files_how_many:
                files_df = sub.copy()
                break
    return files_df


def files_overview(
    spark: SparkSession,
    filelist: list,
    file_date_format: str,
    file_generation_res: str,
    data_res: float,
    files_how_many: int | None = None,
) -> DataFrame:
    """S9 as a Spark DataFrame (expected_dt epoch seconds, availability,
    size, expected records) — joinable against tier lineage tables."""
    pdf = files_overview_pdf(
        filelist, file_date_format, file_generation_res, data_res, files_how_many
    )
    out = pd.DataFrame(
        {
            # index = slot datetime for every row (expected_file is NaT
            # for off-grid files, the index never is)
            "expected_dt_s": pdf.index.astype("int64") // 1_000_000_000,
            "file_available": pdf["file_available"].astype("int32"),
            "filename": pdf["filename"].astype(object).where(pdf["filename"].notna(), None),
            "filesize": pdf["filesize"].fillna(-1).astype("int64"),
            "expected_records": pdf["expected_records"].astype("float64"),
        }
    )
    return spark.createDataFrame(out)
