"""Tests for the second analytics/dedup batch."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from diive_spark.text.dedup import ngram_jaccard_dedup
from diive_spark.text.similarity import cosine_neardup_pairs


def test_ngram_jaccard_finds_near_dupe(spark):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "lang": ["en", "en", "en"],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again",
                "quick brown fox jumps over the lazy dog again and again",  # 1 word off
                "completely different content about spark engines at scale",
            ],
        }
    )
    out = (
        ngram_jaccard_dedup(
            spark.createDataFrame(docs), "doc_id", "text", block_col="lang", k=3,
            threshold=0.5,
        )
        .toPandas()
        .sort_values(["id_a", "id_b"])
    )
    assert list(zip(out["id_a"], out["id_b"])) == [(1, 2)]
    assert (out["jaccard"] > 0.5).all()


def test_ngram_jaccard_blocking_prevents_cross_block_pairs(spark):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "lang": ["en", "de"],
            "text": ["same words here exactly", "same words here exactly"],
        }
    )
    out = ngram_jaccard_dedup(
        spark.createDataFrame(docs), "doc_id", "text", block_col="lang", threshold=0.0
    ).count()
    assert out == 0


def test_cosine_neardup_pairs(spark):
    vecs = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            "label": [0, 0, 0, 1],
            "embedding": [
                [1.0, 0.0, 0.0],
                [0.999, 0.01, 0.0],  # near-dup of 1
                [0.0, 1.0, 0.0],  # orthogonal
                [1.0, 0.0, 0.0],  # identical to 1 but different block
            ],
        }
    )
    sdf = spark.createDataFrame(vecs).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = cosine_neardup_pairs(
        sdf, "vec_id", "embedding", block_col="label", threshold=0.95
    ).toPandas()
    assert list(zip(out["id_a"], out["id_b"])) == [(1, 2)]
    assert out["cos_sim"].iloc[0] > 0.99
