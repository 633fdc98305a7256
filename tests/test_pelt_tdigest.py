"""Pins for PELT changepoints and the t-digest quantile sketch.

PELT exactness: identical output to the unpruned O(n^2) optimal
partitioning (Killick 2012 Thm 3.1 guarantees the pruning is lossless
for additive costs with K = 0).  t-digest: rank error, mergeability,
order-determinism, and the tier-engine ride-along (same MERGE /
lineage / idempotent-resume machinery as M4 partials).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from diive_spark.operators.pelt import (
    default_penalty,
    optimal_partition_kernel,
    pelt_kernel,
)
from diive_spark.operators.tdigest import (
    TDigestPartials,
    tdigest_compress,
    tdigest_quantile,
)


# ---------------------------------------------------------------------------
# PELT
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("trial", range(8))
def test_pelt_equals_unpruned_optimal(trial):
    rng = np.random.default_rng(trial)
    n = 120 + trial * 41
    y = rng.normal(0, 1, n)
    if trial % 2 == 0:
        for cp in sorted(
            rng.choice(np.arange(20, n - 20), rng.integers(1, 4),
                       replace=False)
        ):
            y[cp:] += rng.normal(0, 1) * 3
    assert pelt_kernel(y) == optimal_partition_kernel(y)


def test_pelt_recovers_clear_shifts():
    rng = np.random.default_rng(42)
    y = np.concatenate(
        [rng.normal(0, 0.5, 200), rng.normal(5, 0.5, 150),
         rng.normal(-2, 0.5, 180)]
    )
    cps = pelt_kernel(y)
    assert len(cps) == 2
    assert abs(cps[0] - 200) <= 2 and abs(cps[1] - 350) <= 2


def test_pelt_silent_on_stationary():
    rng = np.random.default_rng(1)
    y = rng.normal(0, 1, 400)
    # BIC penalty: no changepoints on iid noise (allow at most a spurious 1)
    assert len(pelt_kernel(y, beta=default_penalty(y) * 1.5)) <= 1


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------

def test_tdigest_rank_accuracy_and_merge():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 50_000)
    xs = np.sort(x)
    m, w = tdigest_compress(x, np.ones_like(x), 100.0)
    assert w.sum() == 50_000
    assert len(m) < 300  # bounded state
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        est = tdigest_quantile(m, w, q)
        assert abs(np.searchsorted(xs, est) / len(xs) - q) < 0.012
    # merge of 32 partition digests: same weight, same accuracy
    allm, allw = [], []
    for p in np.array_split(x, 32):
        pm, pw = tdigest_compress(p, np.ones_like(p), 100.0)
        allm.append(pm)
        allw.append(pw)
    mm, mw = tdigest_compress(np.concatenate(allm), np.concatenate(allw),
                              100.0)
    assert mw.sum() == 50_000
    for q in [0.01, 0.5, 0.99]:
        est = tdigest_quantile(mm, mw, q)
        assert abs(np.searchsorted(xs, est) / len(xs) - q) < 0.015


def test_tdigest_order_deterministic():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 10_000)
    m1, w1 = tdigest_compress(x, np.ones_like(x), 100.0)
    sh = x.copy()
    rng.shuffle(sh)
    m2, w2 = tdigest_compress(sh, np.ones_like(sh), 100.0)
    np.testing.assert_allclose(m1, m2)
    np.testing.assert_allclose(w1, w2)


def test_tdigest_partials_through_tier_engine(spark, tmp_path):
    """t-digest rides the tier engine exactly like M4: 3 out-of-order
    batches == exact per-window p50 (windows hold <= 60 points, fewer
    than delta, so the digest is lossless), re-applied batch = no-op."""
    from diive_spark.plans.tiers import TierEngine, TierSpec
    from diive_spark.sources.pages import synth_pages_df

    pages = (
        synth_pages_df(spark, n_urls=8, n_records=1200, freq_seconds=60,
                       zipf_hot_fraction=0.05)
        .select("url", "ts", "value")
        .filter(F.col("value").isNotNull())
    )
    eng = TierEngine(
        spark, str(tmp_path / "tdt"),
        (TierSpec("1h", "1 hour", 3600, mincounts_perc=0.0),),
        "url", "ts", "value", partials=TDigestPartials(),
    )
    for i in range(3):
        eng.apply_batch(
            pages.filter(F.pmod(F.xxhash64("url", "ts"), 3) == i),
            batch_id=f"td{i}",
        )
    fin = eng.read_tier("1h").toPandas()
    exact = (
        pages.groupBy(
            "url",
            (F.floor(
                F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                        / 1_000_000) / 3600
            ) + 1).cast("long").alias("wid"),
        )
        .agg(F.expr("percentile(value, 0.5)").alias("e50"),
             F.count("value").alias("n"))
        .toPandas()
    )
    fin["wid"] = fin["window_end_s"] // 3600
    j = fin.merge(exact, on=["url", "wid"])
    assert len(j) == len(fin)
    assert (j.n_points == j.n).all()
    assert (j.p50 - j.e50).abs().max() < 1e-9
    # idempotent resume: re-applying a seen batch changes nothing
    eng.apply_batch(
        pages.filter(F.pmod(F.xxhash64("url", "ts"), 3) == 0),
        batch_id="td0",
    )
    fin2 = eng.read_tier("1h").toPandas()
    assert len(fin2) == len(fin)
