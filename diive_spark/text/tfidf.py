"""TF-IDF sparse retrieval: inverted-index cosine top-k.

The dense-ANN family (text/similarity.py) needs an embedding column;
crawl-curation pipelines also want similarity over the RAW TEXT — the
classic sparse path: TF-IDF weights + an inverted index, where the
pairwise score is a sum of per-term weight products computed by ONE
equi-join on the term.  This is how you do "find similar docs" at
10^12 rows without a vector index: the join only materializes
(probe, candidate) pairs that SHARE a term, and pruning high-df terms
(stopword-like, df > max_df_frac·N) both improves the metric and removes
exactly the skewed hot keys from the shuffle.

Determinism across engines: weights are pure arithmetic on exact integer
counts, but the per-pair score is an order-dependent float sum — ranking
happens on the floor-scaled integer ``score_e6`` (repo rounding
convention) with an id tie-break, so top-k membership is engine-stable.

Reference analog: diive's MaxCovariance "find the best-matching lag"
(pkgs/flux/detectionlimit usage) is a 1-D similarity search; the web-text
graft generalizes to document similarity over a learned term weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["tfidf_weights", "tfidf_topk", "bm25_impacts", "bm25_topk"]


def tfidf_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 0.5,
) -> DataFrame:
    """L2-normalized smooth TF-IDF weights, one row per (doc, term).

    idf = ln((N + 1) / (df + 1)) + 1 (sklearn's smooth variant); terms
    with df > max_df_frac · N are DROPPED before weighting — at crawl
    scale these near-universal terms dominate both the inverted index's
    skew and the posting-list volume while carrying no signal.

    Two map-side-combinable aggs (term-freq per doc, doc-freq per term)
    + one join on the term key; the N scalar rides along as a 1-row
    cross-joined aggregate, never a driver round-trip.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # doc-frequency as a WINDOW over the tf table (each tf row is one
    # distinct (doc, term)), not a groupBy + join back: Catalyst does not
    # share common subtrees across join arms, so the join formulation
    # re-tokenized the whole corpus once per arm — at crawl scale that is
    # two extra full scans.  The window is one sort-exchange on the term
    # key over the (much smaller) posting table.
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long")
    # N from the raw table: a column-pruned count-star (parquet footer
    # metadata), not a recompute of the explode+agg pipeline
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.withColumn("df", dfreq)
        .crossJoin(F.broadcast(n))
        .filter(F.col("df") <= F.col("n_docs") * F.lit(max_df_frac))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0),
        )
        .withColumn("w_raw", F.col("tf") * F.col("idf"))
    )
    norm = Window.partitionBy(id_col)
    # w*w, not pow(w, 2): libm pow is not guaranteed bit-equal to the
    # multiply, and the DuckDB oracle squares by multiplying
    sq = F.col("w_raw") * F.col("w_raw")
    return w.withColumn(
        "weight", F.col("w_raw") / F.sqrt(F.sum(sq).over(norm))
    ).select(id_col, "term", "tf", "df", "weight")


def bm25_impacts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 per-(doc, term) impact scores — the precomputed
    posting-list payload of a Lucene-style index.

    impact(d, t) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (the Lucene variant —
    always positive, so impacts are monotone in tf and safe to prune).

    Same single-pipeline shape as :func:`tfidf_weights`: tf via one
    explode+agg, df via a window over the posting table (no second corpus
    scan), dl as a window sum per doc, and the two scalars (N, avgdl)
    ride along as a broadcast 1-row aggregate.  Everything is codegen
    column math over exact integer counts — deterministic across engines
    up to the final ln/divide, which downstream ranking floor-scales.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long")
    dl = F.sum("tf").over(Window.partitionBy(id_col)).cast("long")
    # both scalars from ONE cheap scan of the raw table (size(split) is
    # dl without materializing postings a second time)
    scalars = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg(
            F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (1.0 - b + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.withColumn("df", dfreq)
        .withColumn("dl", dl)
        .crossJoin(F.broadcast(scalars))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            "dl",
            (idf * tf_norm).alias("impact"),
        )
    )


def bm25_topk(
    impacts: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k BM25-scored corpus docs per probe doc.

    The probe side contributes its term SET (Lucene semantics: query term
    frequency is ignored); score(q, d) = Σ_{t ∈ q} impact(d, t) — one
    equi-join on the term key against the posting table, identical
    inverted-index shape (and WindowGroupLimit partial top-k) as
    :func:`tfidf_topk`.  Ranking is on floor-scaled ``score_e6`` with an
    id tie-break so top-k membership is engine-stable.
    """
    q = probes.select(F.col(id_col).alias("id_a"), "term").distinct()
    d = impacts.select(
        F.col(id_col).alias("id_b"), "term", "impact"
    )
    scores = (
        q.join(d, "term")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum("impact").alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
        )
        .withColumn(
            "score_e6",
            F.floor(F.col("score") * 1e6 + F.lit(0.5)).cast("bigint"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("score_e6").desc(), F.col("id_b").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "rank", "score_e6", "n_shared_terms")
    )


def tfidf_topk(
    weights: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k most-similar corpus docs per probe doc by TF-IDF cosine.

    ``weights``/``probes`` are :func:`tfidf_weights`-shaped (probes are
    typically a filter of the same table).  Score(a, b) = Σ_t w_a(t)·w_b(t)
    over SHARED terms only — the inverted-index join; both sides are
    L2-normalized so this is exact cosine.  Self-pairs are excluded.

    Ranking is per-probe row_number over (score_e6 desc, id asc) — a
    partial top-k the optimizer can push below the final sort
    (WindowGroupLimit), same shape as ann_cosine_topk.
    """
    a = probes.select(
        F.col(id_col).alias("id_a"), "term", F.col("weight").alias("wa")
    )
    b = weights.select(
        F.col(id_col).alias("id_b"), "term", F.col("weight").alias("wb")
    )
    scores = (
        a.join(b, "term")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
        )
        .withColumn(
            "score_e6",
            F.floor(F.col("score") * 1e6 + F.lit(0.5)).cast("bigint"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("score_e6").desc(), F.col("id_b").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "rank", "score_e6", "n_shared_terms")
    )
