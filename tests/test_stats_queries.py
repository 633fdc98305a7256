"""Stability/concentration battery: Allan variance vs the textbook
non-overlapped loop, burstiness/memory vs direct numpy moments, HITS
distributed loop vs the numpy cutover (and vs an independent dense
power iteration), Gini vs the sorted-array closed form.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from diive_spark.operators.allan import allan_variance
from diive_spark.operators.burstiness import burstiness_memory
from diive_spark.text.graph import hits


def _events(seed: int, n: int, key: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 20 * 86400, size=n))
    v = 10.0 + 4.0 * np.sin(2 * math.pi * ts / 86400.0) + rng.normal(
        0, 1.0, size=n
    )
    return pd.DataFrame(
        {"k": key, "ts_s": ts.astype("int64"), "eid": np.arange(n), "v": v}
    )


def _allan_naive(ts, v, tau, scale=100):
    """Textbook non-overlapped estimator on gapped data: means of the
    occupied tau-buckets in bucket order, pairs only when consecutive
    bucket indices are adjacent."""
    vi = np.floor(v * scale + 0.5)
    b = ts // tau
    uniq = np.unique(b)
    means = {int(u): vi[b == u].sum() / (b == u).sum() / scale for u in uniq}
    diffs = [
        means[int(u) + 1] - means[int(u)]
        for u in uniq
        if int(u) + 1 in means
    ]
    if not diffs:
        return None
    d = np.asarray(diffs)
    return len(d), float((d * d).sum() / (2.0 * len(d)))


def test_allan_matches_naive_loop(spark):
    pdf = pd.concat([_events(1, 400, 1), _events(2, 55, 2)])
    df = spark.createDataFrame(pdf)
    taus = (43_200, 86_400)
    got = {
        (r["key"], r["tau_s"]): (r["n_pairs"], r["avar"])
        for r in allan_variance(df, "k", "ts_s", "v", taus).collect()
    }
    for key in (1, 2):
        sub = pdf[pdf["k"] == key]
        for tau in taus:
            exp = _allan_naive(
                sub["ts_s"].to_numpy(), sub["v"].to_numpy(), tau
            )
            if exp is None:
                assert (key, tau) not in got
                continue
            n, avar = exp
            assert got[(key, tau)][0] == n
            assert got[(key, tau)][1] == pytest_approx(avar)


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-12, abs=1e-12)


def test_burstiness_matches_numpy_moments(spark):
    pdf = pd.concat([_events(3, 200, 1), _events(4, 60, 2)])
    df = spark.createDataFrame(pdf)
    got = {
        r["key"]: (r["n_gaps"], r["b"], r["m"])
        for r in burstiness_memory(
            df, "k", "ts_s", order_cols=["ts_s", "eid"]
        ).collect()
    }
    for key in (1, 2):
        sub = pdf[pdf["k"] == key].sort_values(["ts_s", "eid"])
        g = np.diff(sub["ts_s"].to_numpy()).astype("float64")
        mu, sd = g.mean(), g.std()  # population
        b = (sd - mu) / (sd + mu)
        x, y = g[:-1], g[1:]
        m = float(
            ((x * y).mean() - x.mean() * y.mean())
            / math.sqrt(
                ((x * x).mean() - x.mean() ** 2)
                * ((y * y).mean() - y.mean() ** 2)
            )
        )
        n, gb, gm = got[key]
        assert n == len(g)
        assert gb == pytest_approx(b)
        assert gm == pytest_approx(m)


def test_burstiness_limits(spark):
    # perfectly periodic -> B == -... (sigma=0) -> B = -1? sigma=0 gives
    # (0-mu)/(0+mu) = -1; memory undefined (constant series) -> null
    pdf = pd.DataFrame(
        {"k": 1, "ts_s": np.arange(10) * 100, "eid": np.arange(10)}
    )
    row = burstiness_memory(
        spark.createDataFrame(pdf), "k", "ts_s", order_cols=["ts_s", "eid"]
    ).collect()[0]
    assert row["b"] == -1.0
    assert row["m"] is None


def _hits_dense(pairs, n_iter):
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    ix = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for u, v in pairs:
        A[ix[u], ix[v]] = 1.0
    h = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    return nodes, h, a


def test_hits_numpy_vs_dense_and_distributed(spark):
    rng = np.random.default_rng(7)
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, 12, size=(60, 2))
            if a != b
        }
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    nodes, h, a = _hits_dense(pairs, n_iter=5)
    # small-graph cutover path
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(edges, n_iter=5).collect()
    }
    # distributed loop path (threshold 0 forces it)
    got_dist = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(edges, n_iter=5, small_graph_threshold=0).collect()
    }
    for i, node in enumerate(nodes):
        assert got[node][0] == pytest_approx(h[i])
        assert got[node][1] == pytest_approx(a[i])
        assert got_dist[node][0] == pytest_approx(h[i])
        assert got_dist[node][1] == pytest_approx(a[i])


def test_gini_closed_form(spark):
    from diive_spark.queries_stats import q_gini_sources  # noqa: F401

    # independent check of the rank formula on a known vector:
    # x = [1, 1, 8] -> mean abs diff Gini = (2*sum(i*xi) - (n+1)*sum)/
    # (n*sum) = (2*(1+2+24) - 4*10) / 30 = 14/30
    x = np.array([1, 1, 8])
    i = np.arange(1, 4)
    g = (2 * (i * x).sum() - 4 * x.sum()) / (3 * x.sum())
    # brute force pairwise definition
    diffs = np.abs(x[:, None] - x[None, :]).sum()
    g2 = diffs / (2 * len(x) ** 2 * x.mean())
    assert g == pytest_approx(g2)
    pdf = pd.DataFrame(
        {
            "lang": ["en"] * 10 + ["de"] * 4,
            "source": ["a"] * 1 + ["b"] * 1 + ["c"] * 8 + ["x"] * 2
            + ["y"] * 2,
            "doc_id": range(14),
        }
    )
    df = spark.createDataFrame(pdf)
    cnt_path = "/tmp/_gini_docs"
    df.write.mode("overwrite").parquet(cnt_path + "/documents.parquet")
    out = {
        r["lang"]: (r["n_sources"], r["total_docs"], r["gini_e6"])
        for r in q_gini_sources(spark, cnt_path).collect()
    }
    assert out["en"] == (3, 10, int(np.floor(14 / 30 * 1e6 + 0.5)))
    assert out["de"] == (2, 4, 0)  # two equal sources -> perfectly even
