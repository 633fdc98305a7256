"""Point-in-interval join (operators/intervaljoin.py): containment,
overlapping intervals, bucket-boundary spanning, left-join nulls, and the
degenerate-span guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diive_spark.operators.intervaljoin import point_in_interval_join


def _frames(spark):
    pts = spark.createDataFrame(
        [(1, "a", 50), (2, "a", 150), (3, "a", 9_999), (4, "b", 75)],
        "pid long, k string, ts long",
    )
    iv = spark.createDataFrame(
        [
            ("a", 101, 0, 100),       # contains pid 1
            ("a", 102, 40, 200),      # overlaps: contains pid 1 AND 2
            ("b", 201, 0, 100),       # contains pid 4 (other key)
        ],
        "k string, iid long, s long, e long",
    )
    return pts, iv


def test_containment_and_overlap(spark):
    pts, iv = _frames(spark)
    out = point_in_interval_join(
        pts, iv, key_col="k", ts_col="ts", start_col="s", end_col="e",
        bucket_s=60,
    ).toPandas()
    got = sorted(zip(out["pid"], out["iid"]))
    assert got == [(1, 101), (1, 102), (2, 102), (4, 201)]


def test_bucket_boundary_span(spark):
    # interval [59, 61] spans two 60s buckets; points in each must match
    pts = spark.createDataFrame(
        [(1, "a", 59), (2, "a", 61), (3, "a", 62)], "pid long, k string, ts long"
    )
    iv = spark.createDataFrame([("a", 9, 59, 61)], "k string, iid long, s long, e long")
    out = point_in_interval_join(
        pts, iv, key_col="k", ts_col="ts", start_col="s", end_col="e",
        bucket_s=60,
    ).toPandas()
    assert sorted(out["pid"]) == [1, 2]


def test_left_join_keeps_uncontained(spark):
    pts, iv = _frames(spark)
    out = point_in_interval_join(
        pts, iv, key_col="k", ts_col="ts", start_col="s", end_col="e",
        bucket_s=60, how="left",
    ).toPandas()
    orphan = out[out["pid"] == 3]
    assert len(orphan) == 1 and orphan["iid"].isna().all()


def test_randomized_matches_naive_theta_join(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(42)
    n_pts, n_iv = 400, 60
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_pts),
            "k": rng.choice(list("abc"), n_pts),
            "ts": rng.randint(0, 5000, n_pts),
        }
    )
    s = rng.randint(0, 4500, n_iv)
    iv = pd.DataFrame(
        {
            "k": rng.choice(list("abc"), n_iv),
            "iid": np.arange(n_iv),
            "s": s,
            "e": s + rng.randint(0, 800, n_iv),
        }
    )
    got = point_in_interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        key_col="k", ts_col="ts", start_col="s", end_col="e", bucket_s=250,
    ).toPandas()
    naive = pts.merge(iv, on="k")
    naive = naive[(naive["ts"] >= naive["s"]) & (naive["ts"] <= naive["e"])]
    assert sorted(zip(got["pid"], got["iid"])) == sorted(
        zip(naive["pid"], naive["iid"])
    )


def test_degenerate_span_raises(spark):
    pts, _ = _frames(spark)
    iv = spark.createDataFrame(
        [("a", 9, 0, 10_000_000)], "k string, iid long, s long, e long"
    )
    with pytest.raises(Exception, match="spans more than"):
        point_in_interval_join(
            pts, iv, key_col="k", ts_col="ts", start_col="s", end_col="e",
            bucket_s=60, max_span_buckets=100,
        ).count()


def test_interval_overlap_join_matches_naive_theta(spark):
    """Banded canonical-bucket overlap join == the naive theta join on
    randomized intervals (multi-bucket spans, touching endpoints, nested
    and disjoint cases) — and emits each pair exactly once."""
    import numpy as np

    from diive_spark.operators.intervaljoin import interval_overlap_join

    rng = np.random.RandomState(17)
    n_l, n_r = 120, 80
    lrows = []
    for i in range(n_l):
        s = int(rng.randint(0, 50000))
        lrows.append((int(rng.randint(0, 3)), i, s, s + int(rng.randint(0, 9000))))
    rrows = []
    for j in range(n_r):
        s = int(rng.randint(0, 50000))
        rrows.append((int(rng.randint(0, 3)), j, s, s + int(rng.randint(0, 4000))))
    left = spark.createDataFrame(
        lrows, "key long, lid long, l_start long, l_end long"
    )
    right = spark.createDataFrame(
        rrows, "key long, rid long, r_start long, r_end long"
    )
    got = sorted(
        (r["key"], r["lid"], r["rid"], r["overlap_start"], r["overlap_end"])
        for r in interval_overlap_join(
            left, right, "key", bucket_s=3600
        ).collect()
    )
    want = sorted(
        (k, lid, rid, max(ls, rs), min(le, re))
        for (k, lid, ls, le) in lrows
        for (k2, rid, rs, re) in rrows
        if k == k2 and ls <= re and rs <= le
    )
    assert got == want
    assert len(got) == len(set(got))  # exactly-once emission
