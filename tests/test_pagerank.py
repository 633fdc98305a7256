"""PageRank (text/graph.py::pagerank) vs an independent dense numpy
power iteration on randomized graphs, including dangling nodes and
multi-edges."""

from __future__ import annotations

import numpy as np
import pytest

from diive_spark.text.graph import pagerank


def _numpy_pagerank(edges, d=0.85, n_iter=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[ix[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[ix[v]] += r[ix[u]] / out[ix[u]]
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dang / n)
    return {nodes[i]: r[i] for i in range(n)}


@pytest.mark.parametrize("seed", [1, 9])
def test_pagerank_matches_numpy(spark, seed):
    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 15, 60
    # string node ids, multi-edges allowed, node 'n14' left dangling
    edges = [
        (f"n{int(rng.integers(0, n_nodes - 1))}", f"n{int(rng.integers(0, n_nodes))}")
        for _ in range(n_edges)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst").collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # ranks are a probability distribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_cutover_equals_distributed(spark):
    rng = np.random.default_rng(4)
    edges = [
        (f"h{int(rng.integers(0, 12))}", f"h{int(rng.integers(0, 13))}")
        for _ in range(40)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    cut = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst").collect()}
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", small_graph_threshold=0).collect()
    }
    assert set(cut) == set(dist)
    for k in cut:
        assert cut[k] == pytest.approx(dist[k], abs=1e-12)
