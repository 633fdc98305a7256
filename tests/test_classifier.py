"""Multinomial NB classifier (text/classifier.py): learns a separable
vocabulary, scores match a hand-rolled numpy NB, unseen tokens take the
default likelihood."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from diive_spark.text.classifier import nb_score, nb_train

VOCAB = {
    "en": ["the", "cat", "sat", "mat", "dog"],
    "de": ["der", "katze", "sass", "matte", "hund"],
}


def _corpus(spark, n_per_lang=30):
    rows = []
    i = 0
    for lang, words in VOCAB.items():
        for d in range(n_per_lang):
            toks = [words[(d + j) % len(words)] for j in range(12)]
            rows.append((i, " ".join(toks), lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_nb_learns_separable_vocab(spark):
    d = _corpus(spark)
    train = d.filter(F.col("doc_id") % 3 != 0)
    test = d.filter(F.col("doc_id") % 3 == 0)
    model, labels = nb_train(train, "text", "lang", n_buckets=4096)
    pred = nb_score(test, model, labels, "doc_id", "text",
                    label_col="lang_m", n_buckets=4096)
    joined = test.select("doc_id", "lang").join(pred, "doc_id").collect()
    assert len(joined) == test.count()
    acc = sum(r["pred"] == r["lang"] for r in joined) / len(joined)
    assert acc == 1.0  # fully separable vocabularies


def test_nb_score_matches_closed_form(spark):
    # two docs, tiny vocab, alpha=1: verify the exact smoothed log-lik sum
    train = spark.createDataFrame(
        [(0, "a a b", "x"), (1, "c c d", "y")],
        "doc_id long, text string, lang string",
    )
    test = spark.createDataFrame(
        [(10, "a b z")], "doc_id long, text string"
    )
    nb = 64
    model, labels = nb_train(train, "text", "lang", n_buckets=nb)
    got = nb_score(
        test, model, labels, "doc_id", "text", label_col="lang_m", n_buckets=nb
    ).collect()[0]

    # class x: tokens {a:2, b:1}, tot=3; prior ln(1/2)
    # score_x("a b z") = ln(.5) + ln(3/(3+64)) + ln(2/67) + ln(1/67)
    sx = math.log(0.5) + math.log(3 / 67) + math.log(2 / 67) + math.log(1 / 67)
    sy = math.log(0.5) + 3 * math.log(1 / 67)
    assert got["pred"] == "x"
    assert got["score"] == pytest.approx(max(sx, sy), rel=1e-12)
    assert sx > sy
