"""DSIR importance resampling: bucket log-ratios and per-doc weights vs
an independent numpy replay, plus the semantic property that documents
resembling the target vocabulary outscore the rest."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from diive_spark.text import dsir as DS

B = 64  # small bucket space so collisions are exercised

DOCS = [
    # target-style docs (is_target=1): fruit vocabulary
    (1, "apple banana cherry apple", 1),
    (2, "banana cherry cherry durian", 1),
    (3, "apple durian banana", 1),
    # raw-only docs: metal vocabulary
    (4, "iron copper zinc iron", 0),
    (5, "copper zinc tin", 0),
    # mixed doc
    (6, "apple iron banana zinc", 0),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _np_ratios(docs, b=B):
    c_raw, c_tgt = np.zeros(b), np.zeros(b)
    for _, text, is_t in docs:
        for t in text.split():
            k = _h60(t) % b
            c_raw[k] += 1
            c_tgt[k] += is_t
    n_raw, n_tgt = c_raw.sum(), c_tgt.sum()
    lr = np.log((c_tgt + 1.0) / (n_tgt + b)) - np.log(
        (c_raw + 1.0) / (n_raw + b)
    )
    return lr, c_raw


def _np_weights(docs, b=B):
    lr, _ = _np_ratios(docs, b)
    out = {}
    for i, text, _ in docs:
        ks = [_h60(t) % b for t in text.split()]
        out[i] = round(float(np.mean(lr[ks])), 2)
    return out


def test_bucket_ratios_match_numpy(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, tgt int")
    got = DS.dsir_bucket_ratios(
        df, is_target=F.col("tgt") == 1, n_buckets=B
    ).collect()
    lr, c_raw = _np_ratios(DOCS)
    # only observed buckets are emitted
    assert {r["bucket"] for r in got} == set(np.flatnonzero(c_raw))
    for r in got:
        assert r["log_ratio"] == pytest.approx(lr[r["bucket"]], rel=1e-12)
        assert r["c_raw"] == c_raw[r["bucket"]]


def test_select_prefers_target_like_docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, tgt int")
    out = {
        r["doc_id"]: r
        for r in DS.dsir_select(
            df, is_target=F.col("tgt") == 1, keep_frac=0.5, n_buckets=B
        ).collect()
    }
    want = _np_weights(DOCS)
    for i, w in want.items():
        assert out[i]["weight"] == pytest.approx(w, abs=1e-9)
    # fruit-vocab docs outrank metal-vocab docs; the mixed doc is between
    fruit = min(want[1], want[2], want[3])
    metal = max(want[4], want[5])
    assert fruit > want[6] > metal
    # keep_frac=0.5 of 6 docs = 3 selected, and they are the target-like 3
    assert sorted(i for i, r in out.items() if r["selected"] == 1) == [1, 2, 3]
    assert all(out[i]["n_tokens"] == len(t.split()) for i, t, _ in DOCS)


def test_select_rank_tiebreak_is_deterministic(spark):
    # identical texts => identical rounded weights => id-ordered selection
    docs = [(i, "same same text", int(i < 2)) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string, tgt int")
    out = DS.dsir_select(
        df, is_target=F.col("tgt") == 1, keep_frac=0.34, n_buckets=B
    ).collect()
    kept = sorted(r["doc_id"] for r in out if r["selected"] == 1)
    # ceil(6 * 0.34) = 3 -> the three lowest ids win the all-way tie
    assert math.ceil(6 * 0.34) == 3
    assert kept == [0, 1, 2]
