"""M4: tier engine — incremental merge == full recompute, idempotent resume,
expiry."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from diive_spark.config import TierSpec
from diive_spark.operators.resample import resample_gated
from diive_spark.plans.tiers import TierEngine
from diive_spark.sources.pages import pages_to_series_pdf, synth_pages_pdf

TIERS = (
    TierSpec("30m", "30 minutes", 1800, mincounts_perc=0.9),
    TierSpec("1h", "1 hour", 3600, mincounts_perc=0.9),
    TierSpec("1d", "1 day", 86400, mincounts_perc=0.9),
)


@pytest.fixture(scope="module")
def series_sdf(spark):
    pdf = pages_to_series_pdf(synth_pages_pdf(n_urls=10, n_records=300, freq_seconds=600))
    return spark.createDataFrame(pdf)


def gated_pdf(df):
    return (
        df.toPandas()
        .sort_values(["url", "window_end_s"])
        .reset_index(drop=True)
    )


def test_incremental_equals_full(spark, series_sdf, tmp_path):
    # full recompute via the one-shot operator
    import pyspark.sql.functions as F

    full = resample_gated(
        series_sdf, "url", "ts", "value", 3600, 0.9, source_freq_seconds=600
    ).select(
        "url",
        (F.unix_micros(F.col("window_end").cast("timestamp")) / 1_000_000)
        .cast("long")
        .alias("us"),
        "agg_mean",
        "agg_sum",
        "n_vals",
    )
    want = full.toPandas().sort_values(["url", "us"]).reset_index(drop=True)

    # incremental: 3 arbitrary batches (split by hash — out of time order)
    eng = TierEngine(
        spark, str(tmp_path / "tiers"), TIERS, "url", "ts", "value",
        source_freq_seconds=600,
    )
    for i in range(3):
        batch = series_sdf.filter(F.pmod(F.xxhash64("url", "ts"), 3) == i)
        eng.apply_batch(batch, batch_id=f"b{i}")
    got = gated_pdf(eng.read_tier("1h"))
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["n_vals"].values, want["n_vals"].values)
    np.testing.assert_allclose(got["agg_mean"].values, want["agg_mean"].values, rtol=1e-12)
    np.testing.assert_array_equal(got["window_end_s"].values, want["us"].values)


def test_idempotent_reapply(spark, series_sdf, tmp_path):
    eng = TierEngine(
        spark, str(tmp_path / "t2"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    m1 = eng.apply_batch(series_sdf, batch_id="same")
    before = gated_pdf(eng.read_tier("30m"))
    m2 = eng.apply_batch(series_sdf, batch_id="same")  # must be a no-op
    after = gated_pdf(eng.read_tier("30m"))
    assert m2["30m"] == {"skipped": True}
    pd.testing.assert_frame_equal(before, after)
    assert m1["30m"]["rows"] == len(
        eng.stores["30m"].read(spark).toPandas()
    )


def test_lineage_manifest(spark, series_sdf, tmp_path):
    eng = TierEngine(
        spark, str(tmp_path / "t3"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    eng.apply_batch(series_sdf, batch_id="x1")
    man = eng.stores["30m"].read_manifest()
    assert [s["batch_id"] for s in man["snapshots"]] == ["x1"]
    snap = man["snapshots"][0]
    assert snap["rows"] > 0 and len(snap["partition_rows"]) > 0
    # per-partition metrics sum to total rows
    assert sum(snap["partition_rows"].values()) == snap["rows"]


def test_expiry(spark, series_sdf, tmp_path):
    eng = TierEngine(
        spark, str(tmp_path / "t4"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    eng.apply_batch(series_sdf, batch_id="x1")
    parts = eng.stores["30m"].partitions()
    assert len(parts) >= 2
    last_day = parts[-1]
    dropped = eng.expire("30m", keep_days=1, now_day=last_day)
    assert set(eng.stores["30m"].partitions()) == set(parts) - set(dropped)
    assert len(eng.stores["30m"].partitions()) <= 2
    man = eng.stores["30m"].read_manifest()
    assert man["expired"][0]["partitions"] == dropped


def _partition_file_stats(data_dir, day):
    """(path, inode, mtime) for every parquet file of one partition."""
    import os

    d = data_dir / f"window_day={day}"
    return sorted(
        (str(p), os.stat(p).st_ino, os.stat(p).st_mtime_ns)
        for p in d.glob("*.parquet")
    )


def test_merge_is_partition_scoped(spark, series_sdf, tmp_path):
    """VERDICT r1 'What's wrong #2': apply_batch must NOT rewrite
    untouched window_day partitions — their files survive on disk
    byte-identical (same paths, inodes, mtimes)."""
    import pyspark.sql.functions as F

    eng = TierEngine(
        spark, str(tmp_path / "t5"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    eng.apply_batch(series_sdf, batch_id="seed")
    store = eng.stores["30m"]
    days = store.partitions()
    assert len(days) >= 2
    touched_day = days[-1]
    before = {d: _partition_file_stats(store.data_dir, d) for d in days}

    # a calendar-day slice can touch 2 window_day partitions (the -freq/2
    # shift pushes midnight points into the prior day's last window)
    late = series_sdf.filter(
        F.date_format("ts", "yyyy-MM-dd") == touched_day
    ).withColumn("value", F.col("value") * 0 + 1.0)
    m = eng.apply_batch(late, batch_id="late")
    man = store.read_manifest()
    merged_days = man["snapshots"][-1]["merged_partitions"]
    assert m["30m"]["merged_partitions"] == len(merged_days) < len(days)
    for d in days:
        if d not in merged_days:
            assert _partition_file_stats(store.data_dir, d) == before[d]
        else:
            assert _partition_file_stats(store.data_dir, d) != before[d]
    assert sum(man["snapshots"][-1]["partition_rows"].values()) == man["snapshots"][-1]["rows"]


def test_pending_intent_resume_no_double_merge(spark, series_sdf, tmp_path):
    """Crash between intent record and swap: re-applying the same batch
    must replay the staged swap, not recompute (which would double-merge
    the delta into already-swapped days)."""
    import pyspark.sql.functions as F

    eng = TierEngine(
        spark, str(tmp_path / "t6"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    eng.apply_batch(series_sdf, batch_id="seed")
    want = gated_pdf(eng.read_tier("30m", gated=False))

    # build the crash state by hand: stage batch2's merge + intent record,
    # but no swap (simulates a kill after the manifest write)
    store = eng.stores["30m"]
    tier = store.tier
    delta = eng._partials(series_sdf, tier)
    affected = sorted(r[0] for r in delta.select("window_day").distinct().collect())
    staging = store.root / "_staging_crash"
    live_paths = [str(store.data_dir / f"window_day={d}") for d in affected]
    touch = (
        spark.read.option("basePath", str(store.data_dir)).parquet(*live_paths)
        .withColumn("window_day", F.col("window_day").cast("string"))
    )
    merged = (
        touch.unionByName(delta)
        .groupBy("url", "window_end_s", "window_day")
        .agg(*[F.sum(c).alias(c) for c in ("psum", "pcount", "pslots")])
    )
    merged.repartition(F.col("window_day")).write.partitionBy("window_day").parquet(str(staging))
    staged_rows = {
        str(r["window_day"]): r["cnt"]
        for r in spark.read.parquet(str(staging))
        .withColumn("window_day", F.col("window_day").cast("string"))
        .groupBy("window_day").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    man = store.read_manifest()
    man.setdefault("pending", []).append(
        {"batch_id": "crash", "affected_days": affected, "staged_rows": staged_rows}
    )
    store.write_manifest(man)

    # resume: must finish from staging — pcount exactly doubles, no more
    eng.apply_batch(series_sdf, batch_id="crash")
    got = gated_pdf(eng.read_tier("30m", gated=False))
    np.testing.assert_array_equal(got["n_vals"].values, want["n_vals"].values * 2)
    np.testing.assert_allclose(got["agg_sum"].values, want["agg_sum"].values * 2, rtol=1e-12)
    man = store.read_manifest()
    assert man["pending"] == []
    assert [s["batch_id"] for s in man["snapshots"]] == ["seed", "crash"]


def test_resume_sweeps_orphaned_trash(spark, series_sdf, tmp_path):
    """Crash between the two os.replace calls of a day swap leaves a
    _trash_{batch}_{day} dir with no staged day left; resume must sweep it
    instead of accumulating trash across crash-resume cycles."""
    eng = TierEngine(
        spark, str(tmp_path / "t7"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    eng.apply_batch(series_sdf, batch_id="seed")
    store = eng.stores["30m"]
    days = store.partitions()
    day = days[0]

    # crash state: every staged day already swapped (empty staging dir),
    # one day's trash dir orphaned, intent still pending
    staging = store.root / "_staging_crash3"
    staging.mkdir()
    orphan = store.root / f"_trash_crash3_{day}"
    orphan.mkdir()
    (orphan / "part-stale.parquet").write_bytes(b"stale")
    man = store.read_manifest()
    man.setdefault("pending", []).append(
        {
            "batch_id": "crash3",
            "affected_days": [day],
            "staged_rows": {day: 0},
        }
    )
    store.write_manifest(man)

    eng.apply_batch(series_sdf, batch_id="crash3")
    assert not list(store.root.glob("_trash_*")), "orphaned trash must be swept"
    man = store.read_manifest()
    assert man["pending"] == []


def test_streaming_late_data_converges(spark, series_sdf, tmp_path):
    """Late data end-to-end (VERDICT r2 next #8): micro-batches arrive via
    Structured Streaming foreachBatch with the LAST batch carrying the
    EARLIEST timestamps (true late arrivals re-touching already-merged
    windows); the streamed tier must equal a one-shot batch rebuild, at
    every tier, gates included."""
    import pyspark.sql.functions as F

    # file-ordered source: newest timestamps first, oldest (late) last —
    # maxFilesPerTrigger=1 makes each file one micro-batch in name order
    src = tmp_path / "late_src"
    pdf = series_sdf.toPandas().sort_values("ts").reset_index(drop=True)
    n = len(pdf)
    parts = [pdf.iloc[2 * n // 3 :], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[: n // 3]]
    src.mkdir()
    for i, part in enumerate(parts):
        spark.createDataFrame(part).coalesce(1).write.parquet(
            str(src / f"batch_{i}.parquet")
        )

    engine = TierEngine(
        spark, str(tmp_path / "late_tiers"), TIERS, "url", "ts", "value",
        source_freq_seconds=600,
    )
    stream = (
        spark.readStream.schema(series_sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: engine.apply_batch(bdf, batch_id=f"late-{bid}")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    for tier in TIERS:
        got = gated_pdf(engine.read_tier(tier.name))
        want = gated_pdf(
            resample_gated(
                series_sdf, "url", "ts", "value", tier.seconds,
                tier.mincounts_perc, source_freq_seconds=600,
            ).select(
                "url",
                (F.unix_micros(F.col("window_end").cast("timestamp")) / 1_000_000)
                .cast("long")
                .alias("window_end_s"),
                "agg_mean",
                "agg_sum",
                "n_vals",
            )
        )
        assert len(got) == len(want) > 0, tier.name
        np.testing.assert_array_equal(got["n_vals"].values, want["n_vals"].values)
        np.testing.assert_allclose(
            got["agg_mean"].values, want["agg_mean"].values, rtol=1e-12
        )


def test_compaction_preserves_content_and_shrinks_files(spark, series_sdf, tmp_path):
    """compact() is purely physical: per-day parquet files collapse to
    target_files, read_tier output is row-identical, manifest records the
    compaction, and untouched days keep their files."""
    import pyspark.sql.functions as F

    eng = TierEngine(
        spark, str(tmp_path / "tc"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    eng.apply_batch(series_sdf, batch_id="b0")
    store = eng.stores["30m"]
    days = store.partitions()
    assert len(days) >= 2
    # simulate streamed micro-batch accumulation: split two days into 3
    # parquet files each (at local scale AQE byte-coalesces the (day, key)
    # shuffle to one writer task per day, which is correct production
    # behavior — small files come from many small INGEST ticks, not one)
    import shutil as _sh

    for d in days[:2]:
        day_dir = store.data_dir / f"window_day={d}"
        tmp = store.root / f"_resplit_{d}"
        spark.read.parquet(str(day_dir)).repartition(3).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        _sh.rmtree(day_dir)
        tmp.rename(day_dir)
    before = gated_pdf(eng.read_tier("30m"))
    n_before = {
        d: sum(1 for _ in (store.data_dir / f"window_day={d}").glob("*.parquet"))
        for d in days
    }
    assert max(n_before.values()) > 1

    victims = eng.compact("30m", max_files_per_day=1, target_files=1)
    assert set(victims) == {d for d, n in n_before.items() if n > 1}
    for d in days:
        n = sum(1 for _ in (store.data_dir / f"window_day={d}").glob("*.parquet"))
        assert n == 1
    after = gated_pdf(eng.read_tier("30m"))
    np.testing.assert_array_equal(before["n_vals"].values, after["n_vals"].values)
    np.testing.assert_allclose(
        before["agg_mean"].values, after["agg_mean"].values, rtol=0
    )
    m = store.read_manifest()
    assert m["compactions"][0]["partitions"] == victims
    assert m.get("pending_compactions", []) == []
    # idempotent: nothing left over threshold
    assert eng.compact("30m", max_files_per_day=1) == []


def test_compaction_crash_resume_replays_pending(spark, series_sdf, tmp_path):
    """A compaction that crashed after staging + intent (before any swap)
    is replayed from staging by the next compact() call."""
    eng = TierEngine(
        spark, str(tmp_path / "tcr"), TIERS[:1], "url", "ts", "value",
        source_freq_seconds=600,
    )
    eng.apply_batch(series_sdf, batch_id="b0")
    store = eng.stores["30m"]
    before = gated_pdf(eng.read_tier("30m"))
    day = store.partitions()[0]

    # simulate the crash: stage the rewrite + record the intent by hand
    compact_id = "deadbeef"
    staging = store.root / f"_staging_compact_{compact_id}"
    spark.read.parquet(str(store.data_dir / f"window_day={day}")).coalesce(
        1
    ).write.mode("overwrite").parquet(str(staging / f"window_day={day}"))
    m = store.read_manifest()
    m.setdefault("pending_compactions", []).append(
        {"compact_id": compact_id, "days": [day]}
    )
    store.write_manifest(m)

    eng.compact("30m", max_files_per_day=10_000)  # no new victims: replay only
    n = sum(1 for _ in (store.data_dir / f"window_day={day}").glob("*.parquet"))
    assert n == 1
    assert not staging.exists()
    m = store.read_manifest()
    assert m.get("pending_compactions", []) == []
    assert any(c["compact_id"] == compact_id for c in m["compactions"])
    after = gated_pdf(eng.read_tier("30m"))
    np.testing.assert_array_equal(before["n_vals"].values, after["n_vals"].values)


def test_m4_partials_through_tier_engine(spark, tmp_path):
    """The pluggable-partials engine runs M4 tuples through the SAME
    incremental MERGE / lineage / idempotent-resume machinery: out-of-order
    batches == one-shot m4_downsample, and a re-applied batch is a no-op."""
    from pyspark.sql import functions as F

    from diive_spark.operators.downsample import m4_downsample
    from diive_spark.plans.tiers import M4Partials, TierEngine
    from diive_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(
        spark, n_urls=25, n_records=2500, freq_seconds=60, zipf_hot_fraction=0.05
    ).select("url", "ts", "value").filter(F.col("value").isNotNull())

    eng = TierEngine(
        spark, str(tmp_path / "m4tiers"),
        (TierSpec("1h", "1 hour", 3600, mincounts_perc=0.0),),
        "url", "ts", "value", partials=M4Partials(),
    )
    for i in range(3):
        batch = pages.filter(F.pmod(F.xxhash64("url", "ts"), 3) == i)
        eng.apply_batch(batch, batch_id=f"m4b{i}")

    got = (
        eng.read_tier("1h")
        .select("url", "window_end_s", "x_first", "y_first", "x_last",
                "y_last", "x_ymin", "y_min", "x_ymax", "y_max", "n_in")
    )
    want = m4_downsample(
        pages.select(
            "url",
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
            .cast("long").alias("ts_s"),
            "value",
        ),
        "url", "ts_s", "value", bucket_s=3600,
    ).select(
        "url",
        ((F.col("bucket") + 1) * 3600).cast("long").alias("window_end_s"),
        F.col("x_first").cast("long").alias("x_first"), "y_first",
        F.col("x_last").cast("long").alias("x_last"), "y_last",
        F.col("x_ymin").cast("long").alias("x_ymin"), "y_min",
        F.col("x_ymax").cast("long").alias("x_ymax"), "y_max", "n_in",
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # idempotent resume: re-applying a recorded batch is a no-op
    m = eng.apply_batch(pages.limit(50), batch_id="m4b1")
    assert m["1h"] == {"skipped": True}
