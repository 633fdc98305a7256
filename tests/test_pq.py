"""Product quantization: ADC math pinned bit-exact vs a numpy oracle,
training reduces quantization distortion, and the production
shortlist-then-rerank pattern recovers exact top-k."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from diive_spark.text.pq import (
    encode_pq,
    normalize_rows,
    pq_topk,
    train_pq,
)

SF01 = "/root/testdata/sf0.01"


def _emb(spark, sf=SF01):
    return spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _np_corpus(spark, sf=SF01):
    rows = _emb(spark, sf).orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    M = normalize_rows(np.array([r.embedding for r in rows]))
    return ids, M


def _np_codes(M, cb):
    m, k, sub_d = cb.shape
    X = M.reshape(len(M), m, sub_d)
    codes = np.empty((len(M), m), dtype=np.int64)
    for b in range(m):
        d = (cb[b] ** 2).sum(1)[None, :] - 2.0 * (X[:, b, :] @ cb[b].T)
        codes[:, b] = np.argmin(d, axis=1)
    return codes


def test_encode_matches_numpy(spark):
    ids, M = _np_corpus(spark)
    cb = train_pq(_emb(spark), m=8, k=16, n_iters=2)
    got = {
        r.vec_id: list(r.pq_codes)
        for r in encode_pq(_emb(spark), cb).collect()
    }
    want = _np_codes(M, cb)
    for i, vid in enumerate(ids):
        assert got[vid] == list(want[i])


def test_adc_scores_match_numpy_oracle(spark):
    ids, M = _np_corpus(spark)
    cb = train_pq(_emb(spark), m=8, k=16, n_iters=2)
    probes = [(int(ids[3]), list(M[3])), (int(ids[40]), list(M[40]))]
    out = pq_topk(encode_pq(_emb(spark), cb), cb, probes, top_k=5)
    got = {
        (r.probe_id, r.rank): (r.vec_id, r.score) for r in out.collect()
    }
    # independent replay of the quantized math
    codes = _np_codes(M, cb)
    m, k, sub_d = cb.shape
    for pid, pvec in probes:
        q = np.asarray(pvec)
        lut = np.einsum("bd,bkd->bk", q.reshape(m, sub_d), cb)
        scores = np.round(
            lut[np.arange(m)[None, :], codes].sum(axis=1), 6
        )
        order = np.lexsort((ids, -scores))
        for rank in range(1, 6):
            vid, sc = got[(pid, rank)]
            assert vid == ids[order[rank - 1]]
            assert sc == scores[order[rank - 1]]


def test_training_reduces_distortion(spark):
    ids, M = _np_corpus(spark)

    def distortion(cb):
        m, k, sub_d = cb.shape
        codes = _np_codes(M, cb)
        rec = np.concatenate(
            [cb[b][codes[:, b]] for b in range(m)], axis=1
        )
        return float(((M - rec) ** 2).sum())

    cb0 = train_pq(_emb(spark), m=8, k=16, n_iters=0)
    cb3 = train_pq(_emb(spark), m=8, k=16, n_iters=3)
    assert distortion(cb3) < distortion(cb0)


def test_shortlist_rerank_recall(spark):
    ids, M = _np_corpus(spark)
    cb = train_pq(_emb(spark), m=8, k=16, n_iters=3)
    probe_idx = [0, 17, 101, 250, 333]
    probes = [(int(ids[i]), list(M[i])) for i in probe_idx]
    short = pq_topk(
        encode_pq(_emb(spark), cb), cb, probes, top_k=50
    ).collect()
    shortlist = {}
    for r in short:
        shortlist.setdefault(r.probe_id, set()).add(r.vec_id)
    hits = total = 0
    for i in probe_idx:
        exact = ids[np.lexsort((ids, -(M @ M[i])))][:5]
        got5 = shortlist[int(ids[i])]
        hits += sum(1 for v in exact if v in got5)
        total += 5
    recall = hits / total
    assert recall >= 0.8, recall
