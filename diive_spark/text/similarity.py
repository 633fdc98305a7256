"""Similarity search over an embedding column (``array<float>``).

Two paths, same result contract:
  * :func:`cosine_topk_bruteforce` — exact top-k per probe vector. The
    probe set is small and **broadcast**; the big side streams through one
    scan, cosine is `zip_with` dot-product math in codegen, top-k is a
    per-probe window. At 100 TB this is the "small query batch against the
    corpus" plan: one corpus scan, no corpus-side shuffle except the final
    per-probe top-k (k rows per probe survive the partial sort — Spark's
    WindowExec with rank pushdown keeps this bounded).
  * :func:`cosine_topk_ivf` — IVF-style: every vector is assigned to its
    nearest centroid (per-row math against a broadcast centroid array);
    probes search only their own cell (equi-join on cell id), trading
    recall for a corpus-scan fraction of ~1/n_cells. Deterministic
    centroids => deterministic result => exact DuckDB oracle of the SAME
    pipeline (approximation is in the algorithm, not the engine).

Reference analog: diive has no vector search; nearest-neighbour appears as
sklearn LOF over 1-D values (/root/reference/diive/pkgs/outlierdetection/
lof.py:44-89). The web-text graft adds embedding-space retrieval as a
first-class operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each probe, the k nearest corpus vectors
    (excluding itself). Ties broken by (rounded cosine desc, vec_id asc)
    so ranking is engine-deterministic."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    v = vectors.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"))
    scored = (
        v.join(F.broadcast(p), F.col("cand_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("probe_vec"), F.col("cand_vec")), 6))
        .select("probe_id", "cand_id", "cos_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) above a similarity
    threshold, blocked on ``block_col`` (cluster/IVF-cell id).

    The block key turns the O(N^2) all-pairs scan into a sum of per-block
    quadratics and makes the self-join co-partitioned on one shuffle key —
    at 100 TB the key comes from :func:`with_ivf_cell` so only same-cell
    vectors are compared (the standard ANN-dedup recipe)."""
    sel = [F.col(id_col), F.col(vec_col)]
    if block_col:
        sel.append(F.col(block_col).alias("_blk"))
    s = df.select(*sel)
    a = s.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        *([F.col("_blk")] if block_col else []),
    )
    b = s.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        *([F.col("_blk")] if block_col else []),
    )
    joined = (
        a.join(b, on=["_blk"] if block_col else None, how="inner")
        if block_col
        else a.crossJoin(b)
    )
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def with_ivf_cell(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Assign each vector to the max-cosine centroid (per-row math; the
    centroid list is a literal array — effectively broadcast)."""
    best_cell = None
    best_sim = None
    out = vectors
    for cid, cvec in centroids:
        carr = F.array(*[F.lit(float(x)) for x in cvec])
        sim = F.round(cosine(F.col(vec_col), carr), 6)
        if best_sim is None:
            best_cell, best_sim = F.lit(cid), sim
        else:
            cond = sim > best_sim
            best_cell = F.when(cond, F.lit(cid)).otherwise(best_cell)
            best_sim = F.when(cond, sim).otherwise(best_sim)
    return out.withColumn(out_col, best_cell.cast("long"))


def cosine_topk_ivf(
    vectors: DataFrame,
    probes: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe searches only its own centroid cell."""
    vc = with_ivf_cell(vectors, centroids, vec_col)
    pc = with_ivf_cell(probes, centroids, vec_col).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.col("cell"),
    )
    v = vc.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"), "cell"
    )
    scored = (
        v.join(F.broadcast(pc), "cell")
        .filter(F.col("cand_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("probe_vec"), F.col("cand_vec")), 6))
        .select("probe_id", "cand_id", "cos_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )
