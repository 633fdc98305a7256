"""Text extraction invariant, ML gap-fill kernel exactness, and the
Structured Streaming tier rollup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.ml.gapfill import fill_series_pdf, ml_gapfill
from diive_spark.sources.pages import synth_pages_pdf
from diive_spark.streaming.rollup import run_to_memory, stream_tier_rollup
from diive_spark.text.extract import extract_text, verify_extraction


def test_extraction_byte_identical_on_pages(spark):
    """BASELINE.json input_hint: extracted text byte-identical per url."""
    pdf = synth_pages_pdf(n_urls=6, n_records=40)
    df = spark.createDataFrame(pdf[["url", "warc_ts", "html", "text"]])
    checked = verify_extraction(df, html_col="html", text_col="text")
    n_bad = checked.filter(F.col("extract_ok") != 1).count()
    assert n_bad == 0


def test_extraction_strips_scripts_styles_entities(spark):
    html = (
        b"<html><head><style>p {c: 1}</style></head><body>"
        b"<script type='x'>alert(1)</script>"
        b"<p>a &amp; b &lt;tag&gt;   c</p></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html binary")
    got = extract_text(df).first()["text_extracted"]
    assert got == 'a & b <tag> c'


def _series_with_gaps() -> pd.DataFrame:
    rng = np.random.RandomState(3)
    n = 200
    ts = 1_700_000_000 + 1800 * np.arange(n)
    v = 50 + 10 * np.sin(np.arange(n) / 9.0) + rng.normal(0, 1, n)
    v[10:13] = np.nan
    v[50] = np.nan
    v[197:] = np.nan  # tail gap: lead feature missing -> fallback model
    return pd.DataFrame({"ts_s": ts, "value": v})


def test_fill_series_kernel_semantics():
    out = fill_series_pdf(_series_with_gaps())
    # observed rows unchanged, flag 0
    obs = out[out["value"].notna()]
    assert (obs["flag_fill"] == 0).all()
    assert (obs["value_filled"] == obs["value"]).all()
    # single-point gap has lag AND lead present -> main model (flag 1)
    assert out.loc[50, "flag_fill"] == 1
    # multi-row gap: neighbours are NaN -> features incomplete -> fallback
    # (flag 2), mirroring randomforest_ts.py:813-872's two-stage fill
    assert set(out.loc[10:12, "flag_fill"]) == {2}
    # tail gap: lead feature unavailable -> fallback (flag 2)
    assert out.loc[199, "flag_fill"] == 2
    assert out["value_filled"].notna().all()
    # cumulative matches nancumsum of the filled series
    np.testing.assert_allclose(
        out["cumsum_filled"], np.nancumsum(out["value_filled"])
    )


def test_ml_gapfill_spark_matches_kernel(spark):
    pdf = _series_with_gaps()
    both = pd.concat(
        [pdf.assign(key=1), pdf.assign(key=2, value=pdf["value"] * 2)]
    )
    df = spark.createDataFrame(both[["key", "ts_s", "value"]])
    got = (
        ml_gapfill(df, "key", "ts_s", "value")
        .filter("key = 2")
        .toPandas()
        .sort_values("ts_s")
        .reset_index(drop=True)
    )
    expect = fill_series_pdf(pdf.assign(value=pdf["value"] * 2))
    np.testing.assert_allclose(got["value_filled"], expect["value_filled"])
    assert (got["flag_fill"].to_numpy() == expect["flag_fill"].to_numpy()).all()


def test_stream_rollup_matches_batch(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/events.parquet"
    ev = spark.read.parquet(src)
    # stream source dir with several files to exercise multi-trigger
    ev.repartition(4).write.parquet(str(tmp_path / "stream_src"))
    schema = ev.schema
    sdf = stream_tier_rollup(
        spark,
        str(tmp_path / "stream_src"),
        schema,
        bucket_seconds=3600,
        watermark="0 seconds",  # availableNow drain: emit everything
        dedup=False,
    )
    run_to_memory(sdf, "tier_stream_test")
    got = spark.sql(
        "SELECT user_id, window_end, psum, pcount FROM tier_stream_test"
    )
    batch = ev.groupBy(
        "user_id", F.window("ts", "3600 seconds").alias("win")
    ).agg(F.sum("value").alias("psum"), F.count("value").alias("pcount"))
    batch = batch.select(
        "user_id", F.col("win.end").alias("window_end"), "psum", "pcount"
    )
    # append mode only emits windows the watermark has CLOSED: the final
    # window (end > max event time) stays in state — exclude it from the
    # batch expectation
    max_ts = ev.agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    batch = batch.filter(F.col("window_end") <= F.lit(max_ts))
    g = {
        (r["user_id"], r["window_end"]): (round(r["psum"], 6), r["pcount"])
        for r in got.collect()
    }
    b = {
        (r["user_id"], r["window_end"]): (round(r["psum"], 6), r["pcount"])
        for r in batch.collect()
    }
    assert g == b
    assert len(g) > 0


def test_ml_gapfill_longterm_matches_pandas_oracle(spark):
    """M3: Spark year-pool plumbing (fan-out join + per-(key, year)
    kernel + center-year keep) must equal a sequential pandas run of the
    same scheme built directly on fill_series_pdf."""
    from diive_spark.ml.gapfill import ml_gapfill_longterm, year_pools

    rng = np.random.default_rng(3)
    # 3.5 years of 6-hourly data with gaps, two series
    ts = (pd.Timestamp("2013-01-01").value // 10**9
          + np.arange(5100) * 21600).astype(np.int64)
    frames = []
    for key in (1, 2):
        v = np.sin(np.arange(5100) / 50) * 10 + key + rng.normal(0, 0.3, 5100)
        v[rng.random(5100) < 0.08] = np.nan
        frames.append(pd.DataFrame({"key": key, "ts_s": ts, "value": v}))
    both = pd.concat(frames, ignore_index=True)

    got = (
        ml_gapfill_longterm(
            spark.createDataFrame(both), "key", "ts_s", "value", n_lags=1
        )
        .toPandas()
        .sort_values(["key", "ts_s"])
        .reset_index(drop=True)
    )

    # pandas oracle: same pools, same kernel, sequential
    expect_parts = []
    for key, grp in both.groupby("key"):
        years = pd.to_datetime(grp["ts_s"], unit="s").dt.year
        for cy, ymin, ymax in year_pools(years.unique()):
            pool = grp[(years >= ymin) & (years <= ymax)]
            filled = fill_series_pdf(pool[["ts_s", "value"]], n_lags=1)
            fy = pd.to_datetime(filled["ts_s"], unit="s").dt.year
            keep = filled[fy == cy].copy()
            keep.insert(0, "center_year", cy)
            keep.insert(0, "key", key)
            expect_parts.append(keep)
    expect = (
        pd.concat(expect_parts, ignore_index=True)
        .sort_values(["key", "ts_s"])
        .reset_index(drop=True)
    )

    assert len(got) == len(both)  # every row exactly once
    np.testing.assert_array_equal(got["center_year"], expect["center_year"])
    np.testing.assert_allclose(got["value_filled"], expect["value_filled"])
    assert (got["flag_fill"].to_numpy() == expect["flag_fill"].to_numpy()).all()
    # 2013 rows were filled by the 2013-2015 pool, 2016 rows by 2014-2016
    y13 = got[got["center_year"] == 2013]
    assert len(y13) > 0 and (pd.to_datetime(y13["ts_s"], unit="s").dt.year == 2013).all()


def test_ml_train_report_scores_and_importance(spark):
    """M1 model-quality report: R2/MAE/RMSE computed on the held-out
    split, lag features dominate permutation importance on an
    autocorrelated series, and Spark == standalone kernel."""
    import zlib

    from diive_spark.ml.gapfill import ml_train_report, train_report_pdf

    rng = np.random.default_rng(21)
    n = 400
    ts = np.arange(n) * 1800
    # AR-ish series: neighbors are informative, time-of-day not
    v = np.cumsum(rng.normal(0, 1, n))
    pdf = pd.DataFrame({"key": 3, "ts_s": ts, "value": v})

    seed = zlib.crc32(b"3") % (2**31)
    rep = train_report_pdf(pdf, n_lags=1, seed=seed)
    assert set(rep["feature"]) == {"recno", "tod", "lag1", "lead1"}
    assert rep["n_train"].iloc[0] + rep["n_test"].iloc[0] <= n
    # scores match their definitions on the same deterministic split
    assert 0.9 < rep["r2"].iloc[0] <= 1.0  # neighbors predict a random walk well
    assert rep["rmse"].iloc[0] >= rep["mae"].iloc[0] * 0.5
    # lag/lead features beat time-of-day importance on this series
    imp = rep.set_index("feature")["perm_importance"]
    assert max(imp["lag1"], imp["lead1"]) > imp["tod"]

    got = (
        ml_train_report(spark.createDataFrame(pdf), "key", "ts_s", "value")
        .orderBy("feature")
        .toPandas()
    )
    want = rep.sort_values("feature").reset_index(drop=True)
    np.testing.assert_allclose(got["perm_importance"], want["perm_importance"])
    np.testing.assert_allclose(got["r2"], want["r2"])


def test_stream_neardup_dedup_grows_store_and_reports(spark, tmp_path):
    """foreachBatch near-dup ingest: batch-internal dups collapse, cross-
    batch dups are detected against the persisted signature store (without
    re-reading historical text), fresh signatures append, and a drained
    re-run is a no-op."""
    import pandas as pd

    from diive_spark.streaming.rollup import stream_neardup_dedup

    src = tmp_path / "src"
    store = str(tmp_path / "store")
    report = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "spark structured streaming keeps bounded state with watermarks"
    run = lambda: stream_neardup_dedup(  # noqa: E731
        spark, str(src), "doc_id long, text string", store, report, ckpt,
        threshold=0.5,
    )

    # tick 1: doc 2 is a batch-internal near-dup of doc 0
    pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": [base, other, base + " woof"]}
    ).to_parquet(src / "tick1.parquet")
    run()
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {0, 1}

    # tick 2: doc 10 near-dups doc 0 cross-batch; doc 11 is fresh
    pd.DataFrame(
        {"doc_id": [10, 11], "text": [base + " woof", "completely new content words everywhere"]}
    ).to_parquet(src / "tick2.parquet")
    run()
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {0, 1, 11}
    rep = {(r["new_id"], r["hist_id"]) for r in spark.read.parquet(report).collect()}
    assert (10, 0) in rep
    assert all(h in (0, 1) for _, h in rep)

    # drained: nothing new to process, store unchanged
    run()
    assert {r["doc_id"] for r in spark.read.parquet(store).collect()} == {0, 1, 11}
