"""Connected-components clustering (alternating stars vs union-find),
line dedup, domain cap, and bigram-LM scoring."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from diive_spark.text import curation as CU
from diive_spark.text import graph as GR
from diive_spark.text import lm as LM


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min node of the component
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _cc_spark(spark, edges, threshold=1_000_000):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = GR.connected_components(df, small_graph_threshold=threshold)
    return {r["node"]: r["cluster_id"] for r in out.collect()}


GRAPHS = {
    # long chain: the diameter killer for naive min-propagation
    "chain": [(i, i + 1) for i in range(40)],
    # star centered on the LARGEST id (exercises large-star rewiring)
    "star_high": [(100, i) for i in range(10)],
    "two_comps": [(1, 2), (2, 3), (10, 11), (12, 11)],
    "self_dups": [(5, 6), (6, 5), (5, 6), (7, 7)],
}


@pytest.mark.parametrize("threshold", [0, 1_000_000])
@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_connected_components_vs_union_find(spark, name, threshold):
    # threshold=0 forces the distributed star loop; the default takes
    # the small-graph union-find cutover — both must agree with the
    # independent oracle
    edges = GRAPHS[name]
    nodes = sorted({x for e in edges for x in e if e[0] != e[1]})
    want = _union_find([e for e in edges if e[0] != e[1]], nodes)
    got = _cc_spark(spark, edges, threshold)
    assert got == want


def test_connected_components_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    touched = sorted({x for e in edges for x in e})
    want = _union_find(edges, touched)
    got_dist = _cc_spark(spark, edges, threshold=0)
    got_fast = _cc_spark(spark, edges)
    assert got_dist == want and got_fast == want


def test_cluster_sizes(spark):
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "node long, cluster_id long",
    )
    out = {
        r["node"]: r["cluster_size"]
        for r in GR.cluster_sizes(labels).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 10: 2, 11: 2}


def test_line_dedup_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\ncommon line\nx"),
            (2, "common line\ngamma\nx"),  # "common line" + "x" are dups
            (3, "common line\ncommon line"),  # all lines are dups
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_dedup"])
        for r in CU.line_dedup(docs, min_len=1).collect()
    }
    assert out[1] == (3, 3, "alpha beta\ncommon line\nx")
    assert out[2] == (3, 1, "gamma")
    assert out[3] == (2, 0, "")


def test_line_dedup_min_len_keeps_short_lines(spark):
    docs = spark.createDataFrame(
        [(1, "ab\nlong enough line"), (2, "ab\nlong enough line")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text_dedup"]
        for r in CU.line_dedup(docs, min_len=5).collect()
    }
    # "ab" is below min_len -> kept in BOTH docs; the long line dedups
    assert out[1] == "ab\nlong enough line"
    assert out[2] == "ab"


def test_domain_cap(spark):
    rows = [(i, f"https://big.example.com/p/{i}") for i in range(20)]
    rows += [(100 + i, f"https://small.example.com/p/{i}") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    out = CU.domain_cap(docs, max_per_domain=5)
    agg = {
        r["domain"]: (r["n"], r["k"])
        for r in out.groupBy("domain")
        .agg(F.count("*").alias("n"), F.sum("kept").alias("k"))
        .collect()
    }
    assert agg["big.example.com"] == (20, 5)
    assert agg["small.example.com"] == (3, 3)
    # deterministic: same input -> identical kept set
    k1 = sorted(r["doc_id"] for r in out.filter("kept = 1").collect())
    k2 = sorted(
        r["doc_id"]
        for r in CU.domain_cap(docs, max_per_domain=5)
        .filter("kept = 1")
        .collect()
    )
    assert k1 == k2


def test_extract_domain(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.Example.COM:443/x",),
            ("http://user:pw@host.org:8080/p?q=1",),
            ("ftp://plain.net",),
        ],
        "url string",
    )
    got = [r[0] for r in df.select(CU.extract_domain(F.col("url"))).collect()]
    assert got == ["www.example.com", "host.org", "plain.net"]


def test_curation_pipeline_funnel(spark, sf_dir):
    """Every pipeline stage must actually filter at sf0.001 — a stage that
    passes everything through is a silently-miswired composition."""
    from diive_spark.queries_text import _documents, _url_synth_col
    from diive_spark.queries_text2 import q_curation_pipeline

    d = _documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).withColumn("url", _url_synth_col())
    total = d.count()
    g = CU.gopher_quality_flags(d, min_words=30, min_stopwords=2).filter(
        F.col("keep") == 1
    )
    n_quality = g.count()
    n_canon = CU.url_keep_best(g, url_col="url", quality_col="n_chars").count()
    final = q_curation_pipeline(spark, sf_dir).count()
    assert total > n_quality > n_canon > final > 0


def test_bigram_lm_score_matches_hand_model(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "z")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in LM.bigram_lm_score(docs, docs, alpha=1.0).collect()
    }
    # reference model: bigrams = {"a b":3, "b a":1, "b c":1} from doc1+doc2
    # starts: a->3, b->2 ; vocab = {a,b,c,z} -> V=4
    def p(cb, cs):
        return (cb + 1.0) / (cs + 4.0)

    want1 = (math.log(p(3, 3)) + math.log(p(1, 2)) + math.log(p(3, 3))) / 3
    want2 = (math.log(p(3, 3)) + math.log(p(1, 2))) / 2
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logprob"] == pytest.approx(want1, rel=1e-12)
    assert out[2]["avg_logprob"] == pytest.approx(want2, rel=1e-12)
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_logprob"] is None
    assert out[3]["n_tokens"] == 1
