"""Tests for the second analytics/dedup batch."""

from __future__ import annotations

import numpy as np
import pytest
import pandas as pd
from pyspark.sql import functions as F

from diive_spark.text.dedup import ngram_jaccard_dedup
from diive_spark.text.similarity import cosine_neardup_pairs


def test_ngram_jaccard_finds_near_dupe(spark):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "lang": ["en", "en", "en"],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again",
                "quick brown fox jumps over the lazy dog again and again",  # 1 word off
                "completely different content about spark engines at scale",
            ],
        }
    )
    out = (
        ngram_jaccard_dedup(
            spark.createDataFrame(docs), "doc_id", "text", block_col="lang", k=3,
            threshold=0.5,
        )
        .toPandas()
        .sort_values(["id_a", "id_b"])
    )
    assert list(zip(out["id_a"], out["id_b"])) == [(1, 2)]
    assert (out["jaccard"] > 0.5).all()


def test_ngram_jaccard_blocking_prevents_cross_block_pairs(spark):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "lang": ["en", "de"],
            "text": ["same words here exactly", "same words here exactly"],
        }
    )
    out = ngram_jaccard_dedup(
        spark.createDataFrame(docs), "doc_id", "text", block_col="lang", threshold=0.0
    ).count()
    assert out == 0


def test_cosine_neardup_pairs(spark):
    vecs = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            "label": [0, 0, 0, 1],
            "embedding": [
                [1.0, 0.0, 0.0],
                [0.999, 0.01, 0.0],  # near-dup of 1
                [0.0, 1.0, 0.0],  # orthogonal
                [1.0, 0.0, 0.0],  # identical to 1 but different block
            ],
        }
    )
    sdf = spark.createDataFrame(vecs).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = cosine_neardup_pairs(
        sdf, "vec_id", "embedding", block_col="label", threshold=0.95
    ).toPandas()
    assert list(zip(out["id_a"], out["id_b"])) == [(1, 2)]
    assert out["cos_sim"].iloc[0] > 0.99


def test_binned_quadratic_fit_matches_polyfit(spark):
    """Guard against shared Spark/oracle algebra errors (ADVICE r1): the
    closed-form Cramer's-rule coefficients must match np.polyfit — the
    reference's actual method (fits.py:74-260) — on random data."""
    from diive_spark.operators.analytics import binned_quadratic_fit

    rng = np.random.default_rng(42)
    n, n_bins = 600, 12
    rows = pd.DataFrame(
        {
            "g": np.repeat([1, 2, 3], n // 3),
            "x": rng.uniform(-5, 20, n),
            "y": rng.normal(0, 1, n),
            "ord": np.arange(n),
        }
    )
    # non-trivial curvature + offset so s1 != 0 exercises the d2 middle term
    rows["y"] += 0.3 * rows["x"] ** 2 - 2.0 * rows["x"] + 7.0
    out = (
        binned_quadratic_fit(
            spark.createDataFrame(rows), "g", "x", "y", n_bins=n_bins,
            order_cols=["ord"],
        )
        .toPandas()
        .set_index("g")
        .sort_index()
    )
    for g, grp in rows.groupby("g"):
        grp = grp.sort_values(["x", "ord"]).reset_index(drop=True)
        # ntile replica: first (k % n_bins) buckets get one extra row
        k = len(grp)
        base, rem = divmod(k, n_bins)
        sizes = [base + 1 if i < rem else base for i in range(n_bins)]
        bins = np.repeat(np.arange(n_bins), sizes)
        med = grp.groupby(bins).agg(mx=("x", "median"), my=("y", "median"))
        c2, c1, c0 = np.polyfit(med["mx"], med["my"], 2)
        assert abs(out.loc[g, "c0"] - c0) < 1e-8
        assert abs(out.loc[g, "c1"] - c1) < 1e-8
        assert abs(out.loc[g, "c2"] - c2) < 1e-8


def test_unblocked_neardup_requires_opt_in(spark):
    """block_col=None is an O(N^2) crossJoin — must raise without the
    explicit allow_full_scan=True opt-in."""
    import pytest

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x y z"]}))
    with pytest.raises(ValueError, match="allow_full_scan"):
        ngram_jaccard_dedup(docs, "doc_id", "text")
    vecs = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1], "embedding": [[1.0, 0.0]]})
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    with pytest.raises(ValueError, match="allow_full_scan"):
        cosine_neardup_pairs(vecs, "vec_id", "embedding")
    # opt-in path still works
    assert ngram_jaccard_dedup(docs, "doc_id", "text", allow_full_scan=True).count() == 0


def test_t_ppf_matches_known_values():
    """numpy Student-t quantile vs published scipy values."""
    from diive_spark.operators.binfitter import t_cdf, t_ppf

    known = {
        (0.975, 7): 2.3646242510103, (0.975, 10): 2.2281388519650,
        (0.975, 30): 2.0422724563013, (0.95, 5): 2.0150483726691,
        (0.025, 10): -2.2281388519650,
    }
    for (p, df), want in known.items():
        assert abs(t_ppf(p, df) - want) < 1e-9, (p, df)
        assert abs(t_cdf(want, df) - p) < 1e-9


def test_binfitter_bts_kernel_and_spark_agree(spark):
    """BinFitterBTS: quadratic params match np.polyfit on the bin means,
    the 95% prediction band covers ~95% of the binned points, bootstrap
    quantiles bracket sanely, and the Spark kernel equals the standalone
    function (same per-key crc32 seed)."""
    import zlib

    from diive_spark.operators.binfitter import binfitter_bts, binfitter_bts_pdf

    rng = np.random.default_rng(9)
    n = 500
    x = rng.uniform(0, 10, n)
    y = 0.4 * x**2 - 2 * x + 5 + rng.normal(0, 1.5, n)
    pdf = pd.DataFrame({"key": 7, "x": x, "y": y})

    seed = zlib.crc32(b"7") % (2**31)
    out = binfitter_bts_pdf(pdf, "x", "y", n_bins=10, n_bootstraps=10, seed=seed)
    # params == np.polyfit through the qcut bin means
    g = pd.qcut(pdf["x"], q=10, duplicates="drop")
    med = pdf.groupby(g, observed=True).mean()
    a, b, c = np.polyfit(med["x"], med["y"], 2)
    assert abs(out["a"].iloc[0] - a) < 1e-9
    assert abs(out["b"].iloc[0] - b) < 1e-9
    assert abs(out["c"].iloc[0] - c) < 1e-9
    # band ordering + bootstrap quantile ordering
    assert (out["lower_predband"] < out["nom"]).all()
    assert (out["upper_predband"] > out["nom"]).all()
    assert (out["bts_lower_q025"] <= out["bts_lower_q975"]).all()
    assert (out["bts_upper_q025"] <= out["bts_upper_q975"]).all()
    assert (out["nom_lower_ci95"] < out["nom"]).all()

    got = (
        binfitter_bts(spark.createDataFrame(pdf), "key", "x", "y",
                      n_bins=10, n_bootstraps=10)
        .orderBy("fit_x")
        .toPandas()
    )
    np.testing.assert_allclose(got["nom"], out["nom"])
    np.testing.assert_allclose(got["bts_upper_q975"], out["bts_upper_q975"])


def test_binfitter_fit_types_match_lstsq():
    """BinFitterCP fit_type variants: params match closed-form least
    squares on the qcut bin means; 'quadratic' has NO intercept
    (fits.py:145-152); fit_r2 replicates fits.py:202."""
    from diive_spark.operators.binfitter import _bin_means, binfitter_bts_pdf

    rng = np.random.default_rng(21)
    n = 400
    x = rng.uniform(0, 10, n)
    y = 0.7 * x**2 - 2 * x + rng.normal(0, 0.5, n)
    pdf = pd.DataFrame({"x": x, "y": y})
    bx, by = _bin_means(x, y, 10)

    for fit_type, cols in [
        ("quadratic_offset", [bx**2, bx, np.ones_like(bx)]),
        ("quadratic", [bx**2, bx]),
        ("linear", [bx, np.ones_like(bx)]),
    ]:
        out = binfitter_bts_pdf(
            pdf, "x", "y", n_bins=10, n_bootstraps=2, fit_type=fit_type
        )
        A = np.column_stack(cols)
        want = np.linalg.lstsq(A, by, rcond=None)[0]
        got = [out["a"].iloc[0], out["b"].iloc[0], out["c"].iloc[0]][: len(want)]
        np.testing.assert_allclose(got, want, rtol=1e-9)
        if fit_type != "quadratic_offset":
            assert len(want) == 2 and out["c"].iloc[0] == 0.0
        fitted = A @ want
        r2_want = 1.0 - np.sum((by - fitted) ** 2) / (
            (len(by) - 1.0) * np.var(by, ddof=1)
        )
        assert abs(out["fit_r2"].iloc[0] - r2_want) < 1e-9


def test_critical_days_threshold_detection(spark):
    """y = 3 - 0.75*x + noise crosses zero at x = 4: the detected Dcrit
    threshold must land there, day counts must partition around it, and
    the Spark kernel must equal the standalone function (same crc32
    seed). A series that never crosses yields NaN/0 results."""
    import zlib

    from diive_spark.operators.criticaldays import critical_days, critical_days_pdf

    rng = np.random.default_rng(31)
    n_days = 120
    ts = pd.date_range("2023-01-01", periods=n_days, freq="D")
    # 4 rows per day so the daily agg (max x, sum y) does real work
    rows = []
    for d, t in enumerate(ts):
        xs = rng.uniform(0, 8, 4)
        for x in xs:
            rows.append((7, t, x, (3 - 0.75 * x) / 4 + rng.normal(0, 0.02)))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "x", "y"])

    out = (
        critical_days(
            spark.createDataFrame(pdf), "key", "ts", "x", "y",
            thres_min_x=1.0, n_bins=8, n_bootstraps=10,
        )
        .toPandas()
        .iloc[0]
    )
    # daily max x ~ 6-8, daily sum y crosses zero near x = 4 (sum over 4
    # draws vs the daily max — the fitted crossing sits above the
    # per-row root, so just require a sane interior crossing)
    assert 3.0 < out["thres_dcrit"] < 8.0
    assert out["n_days"] == n_days
    assert out["n_dcrit"] + out["n_ndcrit"] <= n_days
    assert out["n_ndcrit"] <= out["n_dcrit"]
    assert out["thres_ndcrit_lower"] < out["thres_dcrit"]
    assert out["n_runs_accepted"] >= 8  # clean signal: nearly all accepted

    # kernel == standalone with the same per-key seed
    daily = (
        pdf.assign(day=pdf["ts"].dt.date)
        .groupby("day")
        .agg(x=("x", "max"), y=("y", "sum"))
        .reset_index()
    )
    seed = zlib.crc32(b"7") % (2**31)
    want = critical_days_pdf(daily, thres_min_x=1.0, n_bins=8,
                             n_bootstraps=10, seed=seed).iloc[0]
    assert out["thres_dcrit"] == pytest.approx(want["thres_dcrit"])
    assert out["n_dcrit"] == want["n_dcrit"]

    # never-crossing series -> rejected
    pdf2 = pdf.copy()
    pdf2["y"] = pdf2["y"].abs() + 1.0
    out2 = (
        critical_days(
            spark.createDataFrame(pdf2), "key", "ts", "x", "y",
            thres_min_x=1.0, n_bootstraps=5,
        )
        .toPandas()
        .iloc[0]
    )
    assert np.isnan(out2["thres_dcrit"]) and out2["n_dcrit"] == 0


def test_linear_fit_matches_polyfit(spark):
    """Per-key OLS from sufficient statistics == np.polyfit / statsmodels
    (reference core/dfun/regression.py:6-63)."""
    import numpy as np
    import pandas as pd

    from diive_spark.functions.regression import linear_fit

    rng = np.random.default_rng(5)
    x = rng.normal(0, 3, 400)
    y = 2.5 * x - 1.25 + rng.normal(0, 1, 400)
    y[::37] = np.nan
    pdf = pd.DataFrame({"k": 1, "x": x, "y": y})
    got = linear_fit(spark.createDataFrame(pdf), "k", "x", "y").collect()[0]

    m = ~np.isnan(y)
    k_ref, d_ref = np.polyfit(x[m], y[m], 1)
    r = np.corrcoef(x[m], y[m])[0, 1]
    n = m.sum()
    np.testing.assert_allclose(got["slope"], k_ref, rtol=1e-10)
    np.testing.assert_allclose(got["intercept"], d_ref, rtol=1e-10)
    np.testing.assert_allclose(got["rsquared"], r * r, rtol=1e-10)
    np.testing.assert_allclose(
        got["rsquared_adj"], 1 - (1 - r * r) * (n - 1) / (n - 2), rtol=1e-10
    )


def test_identify_and_vargroups():
    from diive_spark.functions.regression import (
        identify_flagcols,
        identify_relevants,
        match_vars,
    )

    assert identify_relevants("NEE_CUT_REF") == ["_FC_", "_NEE_", "_co2_flux_"]
    assert identify_relevants("LE") == ["_LE_"]
    assert identify_relevants("TA_1_1") == ["TA_1_1"]
    cols = [
        "FLAG_L2_FC_ABSLIM_TEST", "FLAG_L2_H_SSITC_TEST",
        "FLAG_NEE_QCF", "FC", "FLAG_L2_FC_OTHER",
    ]
    assert identify_flagcols(cols, "NEE_CUT_REF") == [
        "FLAG_L2_FC_ABSLIM_TEST", "FLAG_NEE_QCF",
    ]
    assert match_vars(["TA_1_1", "SW_IN_1", "co2_flux", "junk"], "AIR_TEMPERATURE") == ["TA_1_1"]
    assert match_vars(["TA_1_1", "SW_IN_1"], "SHORTWAVE_IN") == ["SW_IN_1"]
