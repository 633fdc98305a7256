"""TF-IDF weights/top-k vs a numpy oracle; repeated-span detection."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from diive_spark.text import curation as CU
from diive_spark.text import tfidf as TI

DOCS = [
    (1, "apple banana apple cherry"),
    (2, "apple banana banana"),
    (3, "cherry durian cherry"),
    (4, "apple apple apple banana cherry"),
]


def _numpy_tfidf(docs, max_df_frac=1.0):
    texts = {i: t.split() for i, t in docs}
    n = len(docs)
    vocab = sorted({w for t in texts.values() for w in t})
    df = {w: sum(w in set(t) for t in texts.values()) for w in vocab}
    keep = {w for w in vocab if df[w] <= n * max_df_frac}
    out = {}
    for i, toks in texts.items():
        tf = {w: toks.count(w) for w in set(toks) if w in keep}
        raw = {w: c * (math.log((n + 1) / (df[w] + 1)) + 1) for w, c in tf.items()}
        norm = math.sqrt(sum(v * v for v in raw.values()))
        out[i] = {w: v / norm for w, v in raw.items()}
    return out


def test_tfidf_weights_match_numpy(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = TI.tfidf_weights(df, max_df_frac=1.0).collect()
    want = _numpy_tfidf(DOCS)
    assert len(got) == sum(len(v) for v in want.values())
    for r in got:
        assert r["weight"] == pytest.approx(
            want[r["doc_id"]][r["term"]], rel=1e-12
        )


def test_tfidf_weights_max_df_pruning(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # apple and banana and cherry have df 3/4 > 0.6 -> pruned; durian stays
    got = TI.tfidf_weights(df, max_df_frac=0.6).collect()
    assert {r["term"] for r in got} == {"durian"}


def test_tfidf_topk_exact_cosine(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    w = TI.tfidf_weights(df, max_df_frac=1.0)
    out = TI.tfidf_topk(w, w.filter(F.col("doc_id") == 1), k=3).collect()
    want = _numpy_tfidf(DOCS)

    def cos(a, b):
        return sum(
            want[a][t] * want[b][t] for t in want[a] if t in want[b]
        )

    scores = {2: cos(1, 2), 3: cos(1, 3), 4: cos(1, 4)}
    order = sorted(scores, key=lambda b: (-scores[b], b))
    got = sorted(out, key=lambda r: r["rank"])
    assert [r["id_b"] for r in got] == order
    for r in got:
        assert r["score_e6"] == math.floor(scores[r["id_b"]] * 1e6 + 0.5)


def _numpy_bm25(docs, k1=1.2, b=0.75):
    """Independent Okapi/Lucene BM25: per-(doc, term) impacts."""
    texts = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in texts.values()) / n
    vocab = sorted({w for t in texts.values() for w in t})
    df = {w: sum(w in set(t) for t in texts.values()) for w in vocab}
    out = {}
    for i, toks in texts.items():
        dl = len(toks)
        out[i] = {}
        for w in set(toks):
            tf = toks.count(w)
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            out[i][w] = idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dl / avgdl)
            )
    return out


def test_bm25_impacts_match_numpy(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = TI.bm25_impacts(df).collect()
    want = _numpy_bm25(DOCS)
    assert len(got) == sum(len(v) for v in want.values())
    for r in got:
        assert r["impact"] == pytest.approx(
            want[r["doc_id"]][r["term"]], rel=1e-12
        )


def test_bm25_topk_query_term_set_semantics(spark):
    """The probe contributes its term SET (query tf ignored): doc 1's
    repeated 'apple' must not double-count candidate impacts."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    imp = TI.bm25_impacts(df)
    out = TI.bm25_topk(imp, imp.filter(F.col("doc_id") == 1), k=3).collect()
    want = _numpy_bm25(DOCS)
    qterms = set(DOCS[0][1].split())

    def score(b):
        return sum(v for t, v in want[b].items() if t in qterms)

    scores = {2: score(2), 3: score(3), 4: score(4)}
    order = sorted(scores, key=lambda d: (-math.floor(scores[d] * 1e6 + 0.5), d))
    got = sorted(out, key=lambda r: r["rank"])
    assert [r["id_b"] for r in got] == order
    for r in got:
        assert r["score_e6"] == math.floor(scores[r["id_b"]] * 1e6 + 0.5)
        assert r["n_shared_terms"] == len(
            qterms & set(want[r["id_b"]])
        )


def test_repeated_spans_flags_verbatim_duplication(spark):
    span = " ".join(f"w{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, span + " unique1 tail1"),
            (2, span + " unique2 tail2"),  # shares the 15-token span with 1
            (3, "totally different text " + " ".join(f"z{i}" for i in range(15))),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in CU.repeated_spans(docs, span_tokens=15).collect()
    }
    # doc1: 3 spans (17 tokens -> 3 windows), the first is shared with doc2
    assert out[1]["n_spans"] == 3 and out[1]["n_repeated"] == 1
    assert out[2]["n_spans"] == 3 and out[2]["n_repeated"] == 1
    assert out[3]["n_repeated"] == 0 and out[3]["flag_repeated"] == 0
    # fraction 1/3 -> 3333 e4, below the 0.5 reject gate
    assert out[1]["repeated_frac_e4"] == 3333
    assert out[1]["flag_repeated"] == 0


def test_repeated_spans_reject_gate(spark):
    shared = " ".join(f"s{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, shared), (2, shared)],  # everything repeats
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in CU.repeated_spans(docs, span_tokens=15).collect()
    }
    assert out[1]["repeated_frac_e4"] == 10000
    assert out[1]["flag_repeated"] == 2
