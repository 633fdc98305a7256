"""In-engine trained text classifier: multinomial Naive Bayes over
hashed unigram features (the fastText-style quality/language classifier
of a web-curation pipeline — CCNet trains exactly this shape of model to
route Common-Crawl documents).

Everything — training AND scoring — is declarative DataFrame algebra, so
the full train→score round trip has an exact DuckDB oracle twin (no
other in-repo ML op can make that claim; the tree ensembles are
pytest-exact instead).  Tokens are hashed into ``n_buckets`` feature ids
with the engine-portable md5 h60 (text/hashing.py), which both bounds
the model size at web scale and keeps the feature space identical across
engines.

Scale design
------------
* training = one token explode + a map-side-combinable
  ``groupBy(label, feat).count()`` — the model table is bounded by
  ``n_labels × n_buckets`` rows regardless of corpus size;
* label totals and priors are a second tiny aggregate of the SAME
  exploded frame (Spark reuses the exchange);
* scoring joins exploded test tokens against the model on
  ``(label, feat)`` — the model is orders of magnitude smaller than the
  corpus (broadcast-eligible for n_buckets ≤ ~2^18; AQE decides), and
  the per-(doc,label) log-likelihood sum is again map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.text.hashing import spark_h60

__all__ = ["nb_train", "nb_score"]


def _tok_features(df: DataFrame, id_cols: list[str], text_col: str, n_buckets: int) -> DataFrame:
    """One row per token occurrence with its hashed feature id.

    Tokenization is the repo-standard ``split(trim(text), '\\s+')`` so
    the DuckDB twin (``regexp_split_to_array``) bit-matches.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.select(*id_cols, F.explode(toks).alias("_tok")).select(
        *id_cols,
        (F.expr(spark_h60("_tok")) % F.lit(n_buckets)).alias("feat"),
    )


def nb_train(
    train: DataFrame,
    text_col: str,
    label_col: str,
    n_buckets: int = 262_144,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB model.

    Returns ``(model, labels)``:

    * ``model``: (label, feat, ll) — smoothed log-likelihood
      ``ln((count + alpha) / (label_tokens + alpha * n_buckets))`` for
      every (label, feature) SEEN in training;
    * ``labels``: (label, prior, default_ll) — log prior from document
      frequencies plus the unseen-feature log-likelihood
      ``ln(alpha / (label_tokens + alpha * n_buckets))`` that scoring
      substitutes for features absent from ``model``.
    """
    tf = _tok_features(train, [label_col], text_col, n_buckets)
    counts = tf.groupBy(label_col, "feat").agg(F.count(F.lit(1)).alias("_c"))
    label_tokens = counts.groupBy(label_col).agg(F.sum("_c").alias("_tot"))
    denom = F.col("_tot") + alpha * n_buckets
    model = counts.join(label_tokens, label_col).select(
        label_col,
        "feat",
        F.log((F.col("_c") + F.lit(alpha)) / denom).alias("ll"),
    )
    ndocs = train.groupBy(label_col).agg(F.count(F.lit(1)).alias("_nd"))
    total = train.count()
    labels = ndocs.join(label_tokens, label_col).select(
        label_col,
        F.log(F.col("_nd") / F.lit(float(total))).alias("prior"),
        F.log(F.lit(alpha) / denom).alias("default_ll"),
    )
    return model, labels


def nb_score(
    test: DataFrame,
    model: DataFrame,
    labels: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str = "label",
    n_buckets: int = 262_144,
) -> DataFrame:
    """Score every test doc under every label; returns one row per doc:
    (id, pred, score) where ``score`` is the winning joint log-likelihood
    and ``pred`` the argmax label (ties broken by label name so the
    result is deterministic across engines)."""
    tf = _tok_features(test, [id_col], text_col, n_buckets)
    lab = labels.withColumnRenamed(labels.columns[0], label_col)
    mdl = model.withColumnRenamed(model.columns[0], label_col)
    # every token occurrence × every label, unseen features -> default_ll
    scored = (
        tf.crossJoin(F.broadcast(lab))
        .join(mdl, [label_col, "feat"], "left")
        .groupBy(id_col, label_col)
        .agg(
            (
                F.first("prior")
                + F.sum(F.coalesce(F.col("ll"), F.col("default_ll")))
            ).alias("score")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("score"), 6).desc(), F.col(label_col).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            id_col,
            F.col(label_col).alias("pred"),
            F.col("score"),
        )
    )
