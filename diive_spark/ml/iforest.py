"""Isolation Forest anomaly scoring (Liu, Ting & Zhou, ICDM 2008).

Complements the density flag (operators/lof.py, reference F9 analog) with
the subsample-ensemble shape: anomalies are points that isolate in few
random axis-parallel splits.  The reference's outlier suite is
per-series statistical flags; a multi-feature anomaly score is what the
tier engine needs once rollups carry several columns per slot.

Scale design — the paper's own structure IS the distributed design:

* each tree is trained on an independent subsample of ψ rows (paper
  default ψ = 256); ``n_trees × ψ`` rows (~25 k at the default 100
  trees) is a BOUNDED, documented driver collect — the same class as
  the k-means centroid collects (text/similarity.py).  The subsample is
  drawn by deterministic md5-hash rank, so the model is reproducible
  and engine-portable regardless of partitioning;
* the fitted model is a few dense int/float arrays per tree, broadcast
  inside an Arrow kernel closure; scoring is one ``mapInPandas`` pass —
  no shuffle at all (embarrassingly parallel over row batches);
* scores are the paper's  s(x) = 2^(−E[h(x)] / c(ψ)) ∈ (0, 1],
  higher = more anomalous.

Determinism: numpy ``default_rng(seed)`` drives splits; the hash-rank
subsample fixes the training rows; distributed scoring is pinned equal
to single-machine scoring of the same model in tests/test_iforest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["iforest_fit", "iforest_path_length", "iforest_score_np", "iforest_score"]


def _c(n: float) -> float:
    """Average unsuccessful-BST path length c(n) — the paper's
    normalizer (Eq. 1): 2 H(n−1) − 2(n−1)/n, H via ln + Euler γ."""
    if n <= 1:
        return 0.0
    if n == 2:
        return 1.0
    h = np.log(n - 1) + 0.5772156649015329
    return float(2.0 * h - 2.0 * (n - 1) / n)


def iforest_fit(
    X: np.ndarray, n_trees: int = 100, psi: int = 256, seed: int = 0
) -> dict:
    """Fit an isolation forest on ``X`` (n × f).  Each tree draws its own
    ψ-row subsample (without replacement when n ≥ ψ).  Trees are stored
    in implicit heap layout: feat[i] == -1 marks an external node whose
    ``size`` drives the path-length credit c(size)."""
    rng = np.random.default_rng(seed)
    n, f = X.shape
    psi_eff = min(psi, n)
    depth_cap = int(np.ceil(np.log2(max(psi_eff, 2))))
    n_nodes = 2 ** (depth_cap + 1) - 1
    trees = []
    for _ in range(n_trees):
        sub = X[rng.choice(n, size=psi_eff, replace=False)]
        feat = np.full(n_nodes, -1, dtype=np.int32)
        thr = np.zeros(n_nodes, dtype=np.float64)
        size = np.zeros(n_nodes, dtype=np.int64)
        # level-wise build over index lists
        nodes = {0: sub}
        for node in range(n_nodes):
            pts = nodes.pop(node, None)
            if pts is None:
                continue
            size[node] = len(pts)
            depth = int(np.floor(np.log2(node + 1)))
            if len(pts) <= 1 or depth >= depth_cap:
                continue
            lo, hi = pts.min(axis=0), pts.max(axis=0)
            splittable = np.flatnonzero(hi > lo)
            if len(splittable) == 0:
                continue
            q = int(rng.choice(splittable))
            p = float(rng.uniform(lo[q], hi[q]))
            feat[node], thr[node] = q, p
            mask = pts[:, q] < p
            nodes[2 * node + 1] = pts[mask]
            nodes[2 * node + 2] = pts[~mask]
        trees.append((feat, thr, size))
    return {"trees": trees, "psi": psi_eff, "depth_cap": depth_cap, "n_features": f}


def iforest_path_length(tree, X: np.ndarray) -> np.ndarray:
    """Vectorized per-row path length h(x) for one tree, including the
    c(size) external-node credit.  The credit is looked up from a
    per-NODE table (≤ 2^(depth+1) entries) — a per-row Python ``_c``
    call was the original hot spot (50 M calls at 1 M rows × 50 trees)."""
    feat, thr, size = tree
    n = len(X)
    node = np.zeros(n, dtype=np.int64)
    depth = np.zeros(n, dtype=np.float64)
    active = feat[node] >= 0
    while active.any():
        idx = np.flatnonzero(active)
        nd = node[idx]
        go_left = X[idx, feat[nd]] < thr[nd]
        node[idx] = np.where(go_left, 2 * nd + 1, 2 * nd + 2)
        depth[idx] += 1.0
        active[idx] = feat[node[idx]] >= 0
    c_table = np.array([_c(s) for s in size], dtype=np.float64)
    return depth + c_table[node]


def iforest_score_np(model: dict, X: np.ndarray) -> np.ndarray:
    """Anomaly scores s(x) = 2^(−mean path length / c(ψ))."""
    h = np.zeros(len(X), dtype=np.float64)
    for tree in model["trees"]:
        h += iforest_path_length(tree, X)
    h /= len(model["trees"])
    return np.power(2.0, -h / _c(model["psi"]))


def iforest_score(
    df: DataFrame,
    feature_cols: list[str],
    id_cols: list[str],
    n_trees: int = 100,
    psi: int = 256,
    seed: int = 0,
    out_col: str = "iforest_score",
) -> DataFrame:
    """Fit on a deterministic hash-rank subsample (bounded collect of
    ``4·ψ`` rows — enough for every tree's ψ-row resample) and score the
    whole frame in one shuffle-free ``mapInPandas`` pass."""
    id_expr = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    pool_n = max(4 * psi, psi)
    pool = (
        df.select(
            *[F.col(c).cast("double").alias(c) for c in feature_cols],
            F.conv(F.substring(F.md5(id_expr), 1, 15), 16, 10)
            .cast("bigint").alias("_hr"),
        )
        .orderBy("_hr")
        .limit(pool_n)
        .collect()
    )
    X_pool = np.array([[r[c] for c in feature_cols] for r in pool], dtype=np.float64)
    model = iforest_fit(X_pool, n_trees=n_trees, psi=psi, seed=seed)

    out_schema = df.select(*id_cols, *feature_cols).schema.add(out_col, "double")

    def score(iterator):
        for pdf in iterator:
            X = pdf[feature_cols].to_numpy(dtype=np.float64)
            pdf = pdf.copy()
            pdf[out_col] = iforest_score_np(model, X) if len(X) else []
            yield pdf

    narrow = df.select(*id_cols, *feature_cols)
    # scoring is CPU-bound (~T·depth gathers per row); a small parquet
    # reads as 1-2 splits, which would serialize the kernel.  Round-robin
    # up to the session parallelism — at real scale the input already has
    # thousands of splits and this is a no-op.
    target = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < target:
        narrow = narrow.repartition(target)
    return narrow.mapInPandas(score, out_schema)
