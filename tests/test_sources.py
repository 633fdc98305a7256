"""Tests for the file source/sink family (SURVEY §2.1 S1/S3/S5/S8)."""

from __future__ import annotations

import glob

import pandas as pd
from pyspark.sql import functions as F

from diive_spark.sources.csvfiles import (
    load_parquet_with_meta,
    read_filetype_csv,
    read_multifile_csv,
    save_parquet_with_meta,
    write_split,
)

CSV_A = """TIMESTAMP_END,TA,RH
yyyy-mm-dd,degC,%
2024-01-01 00:30:00,1.5,80
2024-01-01 01:00:00,-9999,81
2024-01-01 01:30:00,2.5,NA
2024-01-01 02:00:00,bogus,83
"""

CSV_B = """TIMESTAMP_END,TA,RH
yyyy-mm-dd,degC,%
2024-01-01 01:00:00,9.9,99
2024-01-01 02:30:00,3.0,84
"""


def test_read_filetype_csv_sentinels_and_coercion(spark, tmp_path):
    f = tmp_path / "a.csv"
    f.write_text(CSV_A)
    df = read_filetype_csv(spark, str(f), ts_col="TIMESTAMP_END").orderBy("ts")
    rows = df.toPandas()
    # units row dropped; 4 data rows
    assert len(rows) == 4
    # -9999 sentinel -> null; "NA" -> null; non-numeric "bogus" -> null
    assert pd.isna(rows.loc[1, "TA"])
    assert pd.isna(rows.loc[2, "RH"])
    assert pd.isna(rows.loc[3, "TA"])
    assert rows.loc[0, "TA"] == 1.5 and rows.loc[0, "RH"] == 80.0
    assert str(df.schema["TA"].dataType) == "DoubleType()"


def test_read_multifile_combine_first(spark, tmp_path):
    fa, fb = tmp_path / "a.csv", tmp_path / "b.csv"
    fa.write_text(CSV_A)
    fb.write_text(CSV_B)
    df = read_multifile_csv(
        spark, [str(fa), str(fb)], ts_col="TIMESTAMP_END"
    ).orderBy("ts")
    rows = df.toPandas()
    # union of timestamps: 5 distinct
    assert len(rows) == 5
    # overlapping ts 01:00 -> per-CELL combine_first: file A's TA is null
    # (sentinel), so file B's 9.9 fills it; RH keeps file A's 81.0
    overlap = rows[rows["ts"] == pd.Timestamp("2024-01-01 01:00:00")].iloc[0]
    assert overlap["TA"] == 9.9 and overlap["RH"] == 81.0
    # 02:30 only in file B
    only_b = rows[rows["ts"] == pd.Timestamp("2024-01-01 02:30:00")].iloc[0]
    assert only_b["TA"] == 3.0


def test_write_split_bounds_file_size(spark, tmp_path, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000)
    out = str(tmp_path / "split")
    write_split(ev, out, order_col="ts", max_records_per_file=100, n_range_partitions=2)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 10  # 1000 rows / 100-cap
    total = spark.read.parquet(out).count()
    assert total == 1000
    for f in files:
        assert spark.read.parquet(f).count() <= 100


def test_parquet_meta_roundtrip(spark, tmp_path, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(10)
    out = str(tmp_path / "meta_pq")
    save_parquet_with_meta(ev, out, freq_seconds=1800, convention="end")
    df, meta = load_parquet_with_meta(spark, out)
    assert df.count() == 10
    assert meta == {"freq_seconds": 1800, "timestamp_convention": "end"}


def test_fluxnet_export_yearly_roundtrip(spark, tmp_path, sf_dir):
    """FLUXNET sink (formats/fluxnet.py:31-322): formatted layout +
    one partition directory per year, -9999 fill, YYYYMMDDhhmm."""
    from diive_spark.sources.fluxnet import export_fluxnet_yearly, format_fluxnet

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    base = ev.select(
        "ts",
        F.when(F.col("event_id") % 5 == 0, F.lit(None))
        .otherwise(F.col("value")).alias("FC"),
        (F.col("event_id") % 3).cast("double").alias("FC_SSITC_TEST"),
        F.col("value").alias("SC_SINGLE"),
        F.col("value").alias("not_shareable"),
    )
    out = format_fluxnet(base, ts_col="ts", freq_seconds=1800)
    assert out.columns == ["TIMESTAMP_START", "TIMESTAMP_END", "FC_1_1_1",
                          "FC_SSITC_TEST_1_1_1", "SC_1_1_1"]
    rows = out.toPandas()
    # -9999 fill and YYYYMMDDhhmm format
    assert (rows["FC_1_1_1"] == -9999).sum() > 0
    assert rows["TIMESTAMP_END"].str.len().eq(12).all()
    # start = end - 30min
    s = pd.to_datetime(rows["TIMESTAMP_START"], format="%Y%m%d%H%M")
    e = pd.to_datetime(rows["TIMESTAMP_END"], format="%Y%m%d%H%M")
    assert ((e - s) == pd.Timedelta(minutes=30)).all()

    export_fluxnet_yearly(out, str(tmp_path), site="CH-TEST")
    back = spark.read.option("header", True).csv(
        str(tmp_path / "CH-TEST_fluxes_meteo")
    )
    assert back.count() == 500
    years = sorted(
        p.name.split("=")[1] for p in (tmp_path / "CH-TEST_fluxes_meteo").iterdir()
        if p.name.startswith("year=")
    )
    assert years == sorted(rows["TIMESTAMP_END"].str[:4].unique())
