"""Product quantization (IVF-PQ's compression half) for embedding
retrieval at crawl scale.

A 10^12-document embedding table at 64 float32 dims is ~256 TB — too big
to scan per query.  PQ (Jégou et al. 2011) stores each vector as ``m``
one-byte codes (here 64 floats → 8 bytes, 32×), and scores a query
against the compressed table with an asymmetric-distance lookup: one
``m × k`` table of per-block dot products per query, then a pure gather
— no float vector is ever touched at query time.

Spark-first shapes:

* **training** — k-means per sub-block, all ``m`` blocks advanced in ONE
  corpus scan per iteration: an Arrow kernel assigns the per-block codes,
  ``posexplode`` + groupBy((pos div sub_d), code, pos) recomputes every
  block's centroids in one aggregation; the collect is ``m·k·sub_d``
  rows (the codebook — broadcast-sized by construction, like the IVF
  centroids in similarity.py).
* **encoding** — one Arrow kernel pass, codes stored as a tiny array
  column (the tier you'd persist).
* **search** — broadcast probes, per-batch numpy LUT gather, then the
  same partial+final WindowGroupLimit top-k as brute force; the
  production pattern is shortlist-then-exact-rerank, which the test
  asserts recall on.

Cosine note: vectors are L2-normalized BEFORE training/encoding, so the
ADC inner product IS the cosine estimate (the standard trick).

Reference analog: none in diive; public algorithm (Jégou et al., TPAMI
2011), same family as the FAISS IVF-PQ default.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["train_pq", "encode_pq", "pq_topk", "normalize_rows"]


def normalize_rows(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def _codes_udf(codebooks: np.ndarray):
    """codebooks: (m, k, sub_d) float64.  Returns array<int> of m codes
    per vector: per block, argmin L2 distance (ties -> smallest code)."""
    m, k, sub_d = codebooks.shape
    cb = codebooks.copy()
    cb_sq = (cb ** 2).sum(axis=2)  # (m, k)

    @F.pandas_udf("array<int>")
    def assign(emb: pd.Series) -> pd.Series:
        M = normalize_rows(np.stack(emb.to_numpy()).astype(np.float64))
        n = M.shape[0]
        X = M.reshape(n, m, sub_d)
        out = np.empty((n, m), dtype=np.int32)
        for b in range(m):
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
            d = cb_sq[b][None, :] - 2.0 * (X[:, b, :] @ cb[b].T)
            out[:, b] = np.argmin(d, axis=1)  # first minimum = lowest code
        return pd.Series(list(out))

    return assign.asNondeterministic()


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train PQ codebooks: (m, k, sub_d) numpy array.  Seeds are the k
    lowest-id vectors' sub-blocks (deterministic); each iteration is one
    corpus scan (code assignment) + one aggregation (centroid means)."""
    dim = len(vectors.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub_d = dim // m
    seeds = (
        vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    S = normalize_rows(
        np.array([r[0] for r in seeds], dtype=np.float64)
    )
    codebooks = np.stack(
        [S[:, b * sub_d : (b + 1) * sub_d] for b in range(m)]
    )  # (m, k, sub_d)

    for _ in range(n_iters):
        coded = vectors.withColumn(
            "_codes", _codes_udf(codebooks)(F.col(vec_col))
        ).withColumn("_nv", _normalize_udf()(F.col(vec_col)))
        rows = (
            coded.select("_codes", F.posexplode("_nv"))
            .select(
                F.floor(F.col("pos") / sub_d).cast("int").alias("b"),
                F.element_at(
                    "_codes", (F.floor(F.col("pos") / sub_d) + 1).cast("int")
                ).alias("code"),
                (F.col("pos") % sub_d).alias("d"),
                "col",
            )
            .groupBy("b", "code", "d")
            .agg(F.avg("col").alias("mu"))
            .collect()
        )
        nxt = codebooks.copy()  # empty cells keep their old centroid
        for r in rows:
            nxt[int(r["b"]), int(r["code"]), int(r["d"])] = float(r["mu"])
        codebooks = nxt
    return codebooks


_NORM_UDF = None


def _normalize_udf():
    global _NORM_UDF
    if _NORM_UDF is None:

        @F.pandas_udf("array<double>")
        def nv(emb: pd.Series) -> pd.Series:
            M = normalize_rows(
                np.stack(emb.to_numpy()).astype(np.float64)
            )
            return pd.Series(list(M))

        _NORM_UDF = nv.asNondeterministic()
    return _NORM_UDF


def encode_pq(
    vectors: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pq_codes",
) -> DataFrame:
    """The compressed table: (id, m int codes) — what you persist."""
    return vectors.select(
        id_col, _codes_udf(codebooks)(F.col(vec_col)).alias(out_col)
    )


def pq_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    probes: list[tuple[int, list[float]]],
    top_k: int = 5,
    codes_col: str = "pq_codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC search: per probe one (m, k) dot-product LUT, per corpus batch
    a pure numpy gather-sum; global top-k per probe via the partial+final
    WindowGroupLimit rank (scores rounded to 6 before ranking, id
    tie-break — deterministic at any parallelism)."""
    m, k, sub_d = codebooks.shape
    P = normalize_rows(np.array([p for _, p in probes], dtype=np.float64))
    pids = np.array([int(i) for i, _ in probes], dtype=np.int64)
    # LUTs: (n_probes, m, k) of per-block dot products
    luts = np.einsum("pbd,bkd->pbk", P.reshape(len(P), m, sub_d), codebooks)

    blocks = np.arange(m)

    @F.pandas_udf("array<double>")
    def adc_scores(c: pd.Series) -> pd.Series:
        C = np.stack(c.to_numpy()).astype(np.int64)  # (n, m)
        n = C.shape[0]
        # scores[n, p] = sum_b luts[p, b, C[n, b]] — one fancy-index
        # gather per probe; the probe list is broadcast-sized
        out = np.empty((n, len(pids)), dtype=np.float64)
        for p in range(len(pids)):
            out[:, p] = luts[p, blocks[None, :], C].sum(axis=1)
        return pd.Series(list(out))

    scored = codes.withColumn(
        "_s", adc_scores.asNondeterministic()(F.col(codes_col))
    )
    per_probe = scored.select(
        id_col,
        F.posexplode("_s").alias("probe_pos", "score"),
    ).select(
        F.element_at(
            F.lit(pids.tolist()).cast("array<bigint>"),
            (F.col("probe_pos") + 1).cast("int"),
        ).alias("probe_id"),
        id_col,
        F.round("score", 6).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        per_probe.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
