"""Wide <-> long reshaping (SURVEY §1.1 "Dataset" row).

The reference's Dataset is a WIDE pandas frame — timestamp index, one
column per variable (filereader.py:331-403); the engine's canonical model
is LONG ``(key, ts, value)``.  These helpers convert between the two so a
reference user can ingest wide exports directly:

* wide -> long: Spark's built-in ``melt`` (unpivot) — one projection, no
  shuffle, output rows = rows × variables.
* long -> wide: ``groupBy(ts).pivot(var)`` — one shuffle on ts; the pivot
  column values are passed EXPLICITLY (skips Catalyst's distinct-scan
  job and bounds the schema, mandatory at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wide_to_long(
    df: DataFrame,
    ts_col: str,
    value_cols: list[str] | None = None,
    var_col: str = "series_key",
    value_col: str = "value",
) -> DataFrame:
    """Melt a wide frame (ts + one column per variable) into the long
    model. Non-numeric variable columns are coerced to double with
    string->null, mirroring the reference's ``pd.to_numeric(errors=
    'coerce')`` ingest (filereader.py:465-474)."""
    value_cols = value_cols or [c for c in df.columns if c != ts_col]
    coerced = df.select(
        ts_col, *[F.col(c).cast("double").alias(c) for c in value_cols]
    )
    return coerced.melt(
        ids=[ts_col],
        values=value_cols,
        variableColumnName=var_col,
        valueColumnName=value_col,
    )


def long_to_wide(
    df: DataFrame,
    ts_col: str,
    var_col: str = "series_key",
    value_col: str = "value",
    variables: list[str] | None = None,
) -> DataFrame:
    """Pivot the long model back to one column per variable. ``variables``
    should be passed explicitly (from the metadata table) — omitting it
    costs an extra distinct scan and unbounds the output schema."""
    g = df.groupBy(ts_col)
    piv = g.pivot(var_col, variables) if variables else g.pivot(var_col)
    return piv.agg(F.first(value_col))
