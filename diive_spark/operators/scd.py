"""SCD Type-2 version intervals from keyed observation streams.

Collapses a (key, ts, payload-fingerprint) history — e.g. recrawls of the
north-rule page table keyed by (url, warc_ts) — into one row per
CONSECUTIVE run of identical content: (key, version_no, valid_from,
valid_to, fingerprint, n_obs).  ``valid_to`` is the next version's
``valid_from`` (half-open intervals, NULL for the current version) — the
slowly-changing-dimension shape every warehouse join expects, and the
inverse of the point-in-time as-of join (operators/asofjoin.py).

Reference tie-in: this is the gaps-and-islands pattern of diive's
GapFinder (/root/reference/diive/pkgs/analyses/gapfinder.py:58-117 — runs
of nulls become runs of equal fingerprints) applied to content versioning.

Plan shape: two window passes over ONE partitioning (key, ordered by ts) —
lag-change flag → running sum = version id — then a groupBy on the same
key, so Catalyst reuses the exchange; no join, no kernel.  At 10^12 rows
the url-key hash partitioning is the natural layout and skewed hot urls
split fine because the window is per-url sequential but urls are many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_versions"]


def scd2_versions(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts_s",
    fingerprint_col: str = "fp",
) -> DataFrame:
    """One row per (key, run of consecutive equal fingerprints), ordered
    version_no starting at 1."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    fp = F.col(fingerprint_col)
    chg = (
        F.lag(fp).over(w).isNull() | (fp != F.lag(fp).over(w))
    ).cast("long")
    runs = df.withColumn(
        "_ver", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per = runs.groupBy(key_col, "_ver").agg(
        F.min(ts_col).alias("valid_from"),
        F.max(ts_col).alias("_last_seen"),
        F.first(fingerprint_col).alias(fingerprint_col),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )
    wv = Window.partitionBy(key_col).orderBy("_ver")
    return per.select(
        key_col,
        F.col("_ver").alias("version_no"),
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "_last_seen",
        fingerprint_col,
        "n_obs",
    )
