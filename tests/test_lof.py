"""LOF kernel tests (SURVEY §2.8 F9) — brute-force O(n^2) oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from diive_spark.operators.lof import lof_flag_kernel, lof_scores_1d


def brute_lof(values: np.ndarray, k: int) -> np.ndarray:
    """Textbook LOF (Breunig et al. 2000) with exactly-k neighbours,
    O(n^2), ties broken identically to the kernel (stable partition on
    distance)."""
    n = len(values)
    d = np.abs(values[:, None] - values[None, :])
    np.fill_diagonal(d, np.inf)
    knn = np.argpartition(d, k - 1, axis=1)[:, :k]
    rows = np.arange(n)[:, None]
    kdist = d[rows, knn].max(axis=1)
    reach = np.maximum(kdist[knn], d[rows, knn])
    with np.errstate(divide="ignore", invalid="ignore"):
        lrd = 1.0 / reach.mean(axis=1)
        ratio = lrd[knn] / lrd[:, None]
        # duplicate clusters: inf/inf -> 1 (sklearn's convention, matched
        # by the kernel)
        ratio[np.isnan(ratio)] = 1.0
        return ratio.mean(axis=1)


def test_lof_scores_match_bruteforce():
    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.normal(0, 1, 300), [8.0, -7.5, 9.1]])
    got = lof_scores_1d(vals, k=15)
    exp = brute_lof(vals, k=15)
    np.testing.assert_allclose(got, exp, rtol=1e-10)


def test_lof_flags_outliers(spark):
    rng = np.random.RandomState(11)
    base = rng.normal(10, 1, 500)
    base[100] = 50.0  # gross outlier
    base[400] = -40.0
    pdf = pd.DataFrame({"k": "s", "t": np.arange(500), "v": base})
    out = (
        lof_flag_kernel(
            spark.createDataFrame(pdf), "k", "t", "v",
            n_neighbors=20, contamination=0.005,
        )
        .orderBy("t")
        .toPandas()
    )
    flagged = set(out.index[out["flag_lof"] == 2])
    assert {100, 400} <= flagged
    assert len(flagged) <= 4  # ceil(500*0.005)=3 at most plus ties guard


def test_lof_nulls_unflagged(spark):
    pdf = pd.DataFrame(
        {
            "k": "s",
            "t": np.arange(60),
            "v": [np.nan if i % 7 == 0 else float(i % 5) for i in range(60)],
        }
    )
    out = (
        lof_flag_kernel(
            spark.createDataFrame(pdf), "k", "t", "v", n_neighbors=5,
            contamination=0.05,
        )
        .orderBy("t")
        .toPandas()
    )
    assert (out.loc[out["v"].isna(), "flag_lof"] == 0).all()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            min_size=30,
            max_size=200,
            unique=True,
        )
    )
    def test_lof_property_matches_bruteforce(xs):
        """Distinct values only: with exact distance TIES the k-NN set is
        implementation-defined (both paths are valid LOF), so ties are out
        of the property's scope. Scores beyond 1e12 collapse to one
        'extreme' class — denormal-gap inputs overflow lrd to inf at
        slightly different points."""
        # exact pairwise-distance ties make the k-NN SET itself ambiguous
        # (symmetric gaps) and LOF legitimately differs by tie-break; a
        # deterministic irrational jitter de-ties every configuration while
        # keeping the input arbitrary
        raw = np.asarray(xs, dtype=np.float64)
        # sin-hash jitter: effectively random reals, so pairwise-distance
        # ties have measure zero (a linear index jitter keeps ties for
        # equal index gaps)
        vals = raw + np.sin(np.arange(len(raw)) * 12.9898) * 1e-4
        k = min(10, len(vals) - 1)
        got = lof_scores_1d(vals, k=k)
        exp = brute_lof(vals, k=k)
        extreme = lambda a: ~np.isfinite(a) | (np.abs(a) >= 1e12)  # noqa: E731
        both_fin = ~extreme(got) & ~extreme(exp)
        np.testing.assert_allclose(got[both_fin], exp[both_fin], rtol=1e-9)
        np.testing.assert_array_equal(extreme(got), extreme(exp))
except ImportError:  # pragma: no cover
    pass
