"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
NeurIPS; public algorithm) over hashed bag-of-token features.

Pretraining pipelines select raw-crawl documents that "look like" a
high-quality target corpus.  DSIR does it with two hashed n-gram
distributions: p_target and p_raw over B feature buckets, scoring each
document by its per-token mean log importance ratio

    weight(d) = (1/|d|) · Σ_{t ∈ d} [ ln p_target(bucket(t))
                                      − ln p_raw(bucket(t)) ]

and keeping the top fraction.  (The paper samples with Gumbel noise; the
deterministic top-k variant here is its zero-temperature limit, and the
one you can oracle-check bit-for-bit.)

Spark-first shapes:

* **both distributions in ONE corpus scan** — the target is a predicate
  over the same table, so bucket counts are a single
  ``groupBy(bucket).agg(count, count_if(is_target))`` — map-side
  combinable, no second pass;
* **the ratio table is broadcast-sized by construction** (≤ B rows,
  B ~ 10^4), so scoring is a broadcast hash join against the exploded
  token stream followed by one map-side-combinable per-doc aggregate;
* **selection** is rank over (rounded weight desc, id) — at test scale a
  single top-k; at crawl scale you'd compute the weight threshold from a
  sample/sketch and filter, which changes no math upstream.

Hashing is the repo's engine-portable 60-bit md5 prefix
(text/hashing.py), so the DuckDB oracle reproduces bucket assignment
exactly; α = 1 add-one smoothing keeps every bucket's ratio finite.

Reference analog: none in diive (web-scale graft payload); the algorithm
is public (arXiv:2302.03169).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from diive_spark.text.hashing import spark_h60

__all__ = ["dsir_bucket_ratios", "dsir_scores", "dsir_select"]


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )


def _bucket(col: str, n_buckets: int) -> Column:
    return (
        F.expr(spark_h60(col)) % F.lit(n_buckets)
    ).cast("int").alias("bucket")


def dsir_bucket_ratios(
    df: DataFrame,
    is_target: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, log_ratio) — smoothed ln p_target(b) − ln p_raw(b).

    One scan: raw and target token counts per bucket come from the same
    aggregate (``is_target`` is a row predicate on the input table); the
    two normalizing totals ride along as a broadcast 1-row aggregate.
    Only buckets observed in the raw corpus appear — every scoreable
    token's bucket is present by construction.
    """
    toks = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        is_target.cast("int").alias("is_t"),
    ).select(_bucket("term", n_buckets), "is_t")
    counts = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_raw"),
        F.sum("is_t").cast("long").alias("c_tgt"),
    )
    totals = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum("is_t").cast("long").alias("n_tgt"),
    )
    b = float(n_buckets)
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "c_raw",
        "c_tgt",
        (
            F.log((F.col("c_tgt") + 1.0) / (F.col("n_tgt") + b))
            - F.log((F.col("c_raw") + 1.0) / (F.col("n_raw") + b))
        ).alias("log_ratio"),
    )


def dsir_scores(
    df: DataFrame,
    ratios: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, weight) — per-token mean log importance ratio,
    emitted round(2) (order-dependent float mean; repo convention)."""
    toks = _tokens(df, text_col, id_col).select(
        id_col, _bucket("term", n_buckets)
    )
    return (
        toks.join(F.broadcast(ratios.select("bucket", "log_ratio")), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("log_ratio"), 2).alias("weight"),
        )
    )


def dsir_select(
    df: DataFrame,
    is_target: Column,
    keep_frac: float = 0.2,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc and flag the top ``keep_frac`` by (weight desc,
    id asc) — the deterministic zero-temperature DSIR selection.

    Scale posture (round-3 verdict #5, refined round 4): the rank is a
    distributed exact global row_number, never an unpartitioned
    ``Window.orderBy`` that would funnel the corpus through one task.
    The leading sort key is the round(2) ``weight`` — LOW cardinality by
    construction — so :func:`diive_spark.operators.rank.
    value_offset_row_number` applies: per-value counts + offsets over
    the tiny distinct-weight table + a weight-partitioned window, with
    ZERO extra driver actions (the range-sampling + partition-count
    collect of ``global_row_number`` cost ~2 s of fixed job overhead at
    sf scale).  The selection threshold ``ceil(n_docs * keep_frac)``
    rides along as a broadcast one-row aggregate instead of a
    driver-side ``df.count()`` job.
    """
    from diive_spark.operators.rank import value_offset_row_number

    ratios = dsir_bucket_ratios(
        df, is_target, n_buckets, text_col, id_col
    )
    scored = dsir_scores(df, ratios, n_buckets, text_col, id_col)
    n_docs = df.groupBy().agg(F.count(F.lit(1)).alias("_n_docs"))
    ranked = value_offset_row_number(
        scored.persist(),
        "weight",
        [F.col(id_col).asc()],
        descending=True,
        out_col="rk",
    )
    return (
        ranked.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "selected",
            (F.col("rk") <= F.ceil(F.col("_n_docs") * F.lit(keep_frac)))
            .cast("int"),
        )
        .drop("rk", "_n_docs")
    )
