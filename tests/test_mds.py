"""operators/mds.py — tier precedence, tolerance bands, hod wraparound."""

from __future__ import annotations

from diive_spark.operators.mds import mds_gapfill


def _fill(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "hr long, tgt double, cov1 double, cov2 double"
    )
    out = mds_gapfill(
        df, [], "hr", "tgt", ["cov1", "cov2"],
        tolerances=[1.0, 1.0], window_1=5, window_2=50, cycle=24,
        min_n=2, **kw,
    )
    return {r["hr"]: r for r in out.collect()}


def test_tier1_mean_of_similar_neighbors(spark):
    rows = [
        (10, 4.0, 1.0, 1.0),
        (11, 6.0, 1.2, 1.1),
        (12, None, 1.1, 1.0),   # gap; both neighbors within tol & ±5
        (13, 100.0, 9.0, 9.0),  # out of tolerance
    ]
    got = _fill(spark, rows)
    assert got[12]["mds_flag"] == 1
    assert got[12]["y"] == 5.0 and got[12]["n_used"] == 2
    assert got[10]["mds_flag"] == 0 and got[10]["y"] == 4.0


def test_tier2_expands_window(spark):
    rows = [
        (0, 4.0, 1.0, 1.0),
        (40, 8.0, 1.0, 1.0),
        (20, None, 1.0, 1.0),   # similar obs exist only at ±20 -> tier 2
    ]
    got = _fill(spark, rows)
    assert got[20]["mds_flag"] == 2 and got[20]["y"] == 6.0


def test_tier3_first_cov_only(spark):
    rows = [
        (10, 4.0, 1.0, 50.0),
        (11, 6.0, 1.0, -50.0),
        (12, None, 1.0, 0.0),   # cov2 never in band; cov1 matches at ±5
    ]
    got = _fill(spark, rows)
    assert got[12]["mds_flag"] == 3 and got[12]["y"] == 5.0


def test_tier4_hod_wraparound_and_unfilled(spark):
    # gap at hr=24 (hod 0); obs at hod 23 (hr=47) and hod 1 (hr=49),
    # covs far outside every band -> only the climatology tier matches
    rows = [
        (24, None, 0.0, 0.0),
        (47, 10.0, 99.0, 99.0),
        (49, 20.0, 99.0, 99.0),
        (30, None, 0.0, 0.0),   # hod 6: no matching-hod obs -> unfilled
    ]
    got = _fill(spark, rows)
    assert got[24]["mds_flag"] == 4 and got[24]["y"] == 15.0
    assert got[30]["mds_flag"] == 9 and got[30]["y"] is None
    assert got[30]["n_used"] == 0


def test_min_n_gate_skips_single_candidate(spark):
    rows = [
        (10, 4.0, 1.0, 1.0),
        (12, None, 1.0, 1.0),   # one tier-1/2 candidate only -> needs tier 4? none
    ]
    got = _fill(spark, rows)
    assert got[12]["mds_flag"] == 9  # n=1 < min_n at every tier
