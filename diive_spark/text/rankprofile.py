"""Cavnar–Trenkle rank-order n-gram language identification.

The classic n-gram-profile classifier (Cavnar & Trenkle 1994, "N-Gram-
Based Text Categorization"): a language's profile is its top-K character
n-grams ranked by frequency; a document is classified to the language
whose profile minimizes the "out-of-place" distance — the sum over the
document's own top-ranked n-grams of |doc_rank − lang_rank|, with a
fixed penalty for n-grams absent from the language profile.

This complements the multinomial NB router (text/classifier.py): NB is
the fastText-style hashed-unigram shape, rank-profile is the
vocabulary-free char-n-gram shape that works on unseen scripts and
needs only ~K rows of state per language.

Everything — profile training AND classification — is declarative
DataFrame algebra with an exact DuckDB twin:

* char n-grams come from ``transform(sequence(1, len-n+1), i ->
  substring(text, i, n))`` — identical construction in both engines;
* per-language and per-document ranks are ``row_number`` over
  ``(count DESC, ngram ASC)`` — deterministic total order;
* the distance join crosses each document's K_doc profile rows with the
  (tiny, broadcast) language list and LEFT-joins the language profiles
  on (lang, ngram) — missing n-grams coalesce to the max penalty.

Scale design: language profiles are K × n_languages rows TOTAL (a few
thousand) — always broadcast; the per-document profile is K_doc rows per
doc (bounded explode, ~20× doc count, far below token count); the rank
windows partition by language / document id respectively, so no
unpartitioned window touches data-sized input anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["char_ngrams", "ct_train_profiles", "ct_classify"]


def char_ngrams(df: DataFrame, id_cols: list[str], text_col: str, n: int = 3) -> DataFrame:
    """One row per character n-gram occurrence of ``trim(text_col)``.
    Docs shorter than ``n`` chars yield no rows.  GOTCHA: Spark's
    ``sequence(1, 0)`` DESCENDS ([1, 0]) instead of being empty like
    DuckDB's generate_series — the trailing length filter drops the
    short substrings that descent would otherwise produce (a no-op for
    DuckDB, where every generated gram has exactly ``n`` chars)."""
    # trim hoisted out of the lambda (round-5 profile): the inline form
    # re-trimmed the whole string for every i — O(len^2) char work
    return df.select(
        *id_cols, F.expr(f"trim({text_col})").alias("_t")
    ).select(
        *id_cols,
        F.explode(
            F.expr(
                f"filter(transform(sequence(1, greatest(length(_t) - {n - 1}, 0)),"
                f" i -> substring(_t, i, {n})),"
                f" x -> length(x) = {n})"
            )
        ).alias("ngram"),
    )


def ct_train_profiles(
    train: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    k: int = 40,
) -> DataFrame:
    """(lang, ngram, rank) — each language's top-``k`` character
    ``n``-grams, rank 1 = most frequent, ties broken by ngram ASC."""
    grams = char_ngrams(train, [label_col], text_col, n)
    counts = grams.groupBy(label_col, "ngram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy(label_col).orderBy(
        F.col("_c").desc(), F.col("ngram").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(label_col, "ngram", F.col("rank").cast("long").alias("rank"))
    )


def ct_classify(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    k_doc: int = 20,
    penalty: int | None = None,
) -> DataFrame:
    """(id, pred_lang, dist) — out-of-place distance argmin per doc.

    ``penalty`` is the distance charged for a document n-gram absent
    from a language profile; Cavnar–Trenkle use the profile length —
    default is the max rank present in ``profiles``.  Ties on distance
    break by language ASC (deterministic across engines).
    """
    grams = char_ngrams(docs, [id_col], text_col, n)
    counts = grams.groupBy(id_col, "ngram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wd = Window.partitionBy(id_col).orderBy(
        F.col("_c").desc(), F.col("ngram").asc()
    )
    doc_prof = (
        counts.withColumn("d_rank", F.row_number().over(wd))
        .filter(F.col("d_rank") <= k_doc)
        .select(id_col, "ngram", "d_rank")
    )
    langs = profiles.select(F.col(label_col).alias("_lang")).distinct()
    if penalty is None:
        pen = profiles.groupBy().agg(F.max("rank").alias("_pen"))
    else:
        pen = docs.sparkSession.range(1).select(
            F.lit(int(penalty)).cast("long").alias("_pen")
        )
    prof = profiles.select(
        F.col(label_col).alias("_lang"), "ngram", F.col("rank").alias("l_rank")
    )
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prof), ["_lang", "ngram"], "left")
        .crossJoin(F.broadcast(pen))
        .groupBy(id_col, "_lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("d_rank") - F.col("l_rank")), F.col("_pen")
                )
            ).cast("long").alias("dist")
        )
    )
    wbest = Window.partitionBy(id_col).orderBy(
        F.col("dist").asc(), F.col("_lang").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(wbest))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("_lang").alias("pred_lang"), "dist")
    )
