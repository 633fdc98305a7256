"""Cavnar–Trenkle rank-profile language ID (text/rankprofile.py):
hand-computed profile/distance case + behavioral sanity on the sf corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from diive_spark.text import rankprofile as RP


def test_ct_profiles_hand_case(spark):
    # lang A text "aaab": trigrams aaa, aab -> counts 1,1 -> ranks by
    # (count desc, ngram asc): aaa=1, aab=2
    # lang B text "bbba": trigrams bbb, bba -> bba=1? counts both 1 ->
    # ngram asc: bba=1, bbb=2
    df = spark.createDataFrame(
        [("A", "aaab"), ("B", "bbba")], "lang string, text string"
    )
    prof = {
        (r["lang"], r["ngram"]): r["rank"]
        for r in RP.ct_train_profiles(df, n=3, k=40).collect()
    }
    assert prof == {
        ("A", "aaa"): 1, ("A", "aab"): 2,
        ("B", "bba"): 1, ("B", "bbb"): 2,
    }


def test_ct_classify_hand_case(spark):
    train = spark.createDataFrame(
        [("A", "aaab"), ("B", "bbba")], "lang string, text string"
    )
    prof = RP.ct_train_profiles(train, n=3, k=40)
    docs = spark.createDataFrame(
        [(1, "aaab"), (2, "bbbb"), (3, "zz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in RP.ct_classify(docs, prof, n=3).collect()}
    # doc 1 profile: aaa=1, aab=2 -> dist(A)=|1-1|+|2-2|=0;
    # dist(B)=pen+pen=4 (max rank 2)
    assert out[1]["pred_lang"] == "A" and out[1]["dist"] == 0
    # doc 2: bbb=1 -> dist(B)=|1-2|=1; dist(A)=2 -> B
    assert out[2]["pred_lang"] == "B" and out[2]["dist"] == 1
    # doc 3 "zz": shorter than n -> no trigrams -> absent from output
    assert 3 not in out


def test_ct_structure_on_sf_corpus(spark, sf_dir):
    # NOTE: the sf languages share ONE synthetic vocabulary, so accuracy
    # above chance is impossible by construction — like nb_langid_train,
    # this checks the MECHANISM (the oracle twin checks exactness):
    # every doc classified exactly once, to a trained label, with a
    # non-negative distance bounded by k_doc * penalty.
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    prof = RP.ct_train_profiles(d, n=3, k=40)
    pred = RP.ct_classify(d, prof, n=3, k_doc=20)
    n_docs = d.count()
    assert pred.count() == n_docs
    assert pred.select("doc_id").distinct().count() == n_docs
    langs = {r["lang"] for r in prof.select("lang").distinct().collect()}
    max_rank = prof.agg(F.max("rank")).collect()[0][0]
    bad = pred.filter(
        ~F.col("pred_lang").isin(*langs)
        | (F.col("dist") < 0)
        | (F.col("dist") > 20 * max_rank)
    ).count()
    assert bad == 0
