"""Web-text operator family: dedup (exact / MinHash-LSH / SimHash),
similarity search, text analysis, multimodal plumbing.

Exactness oracles here are small pure-python/numpy recomputations of the
same deterministic pipelines; the DuckDB cross-engine check runs in
tools/check_queries.py (driver gate)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.text import analysis as TA
from diive_spark.text import dedup as DD
from diive_spark.text import multimodal as MM
from diive_spark.text import similarity as SIM
from diive_spark.text.hashing import MERSENNE, N_PERMS, PERM_A, PERM_B

DOCS = [
    (0, "the cat sat on the mat and looked at the dog"),
    (1, "the cat sat on the mat and looked at the dog"),  # exact dup of 0
    (2, "the cat sat on the mat and looked at a bird"),  # near dup of 0
    (3, "completely different words about spark engines and rollups"),
    (4, "der hund ist nicht auf der matte und das ist gut"),
    (5, "le chat est dans la maison et il est content"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split()
    n = max(len(toks) - k + 1, 1)
    out, seen = [], set()
    for i in range(n):
        s = " ".join(toks[i : i + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def test_exact_dedup_groups(docs_df):
    out = {
        r["keep_id"]: r["n_dups"]
        for r in DD.exact_dedup(docs_df).collect()
    }
    assert out[0] == 2  # docs 0 and 1 merge, lowest id kept
    assert out[2] == 1 and out[3] == 1
    assert sum(out.values()) == len(DOCS)


def test_minhash_signature_matches_python(docs_df):
    row = (
        DD.with_minhash(DD.with_shingles(docs_df))
        .filter("doc_id = 3")
        .select("minhash")
        .first()
    )
    hs = [_h60(s) % MERSENNE for s in _shingles(DOCS[3][1])]
    expected = [
        min((PERM_A[j] * h + PERM_B[j]) % MERSENNE for h in hs)
        for j in range(N_PERMS)
    ]
    assert list(row["minhash"]) == expected


def test_lsh_finds_near_dups_and_jaccard_exact(docs_df):
    sh = DD.with_shingles(docs_df)
    mh = DD.with_minhash(sh)
    pairs = DD.lsh_candidate_pairs(mh)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup always collides in every band
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.jaccard_verify(pairs, sh).collect()
    }
    assert verified[(0, 1)] == 1.0
    # python-exact jaccard for any found (0,2)-style pair
    for (a, b), j in verified.items():
        sa, sb = set(_shingles(DOCS[a][1])), set(_shingles(DOCS[b][1]))
        assert j == pytest.approx(len(sa & sb) / len(sa | sb))


def test_simhash_identical_docs_distance_zero(docs_df):
    sims = {
        r["doc_id"]: r["simhash"] for r in DD.with_simhash(docs_df).collect()
    }
    assert sims[0] == sims[1]
    assert 0 <= sims[0] < 2**60
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in DD.simhash_candidate_pairs(
            DD.with_simhash(docs_df), max_hamming=3
        ).collect()
    }
    assert pairs[(0, 1)] == 0


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    probes = df.filter(F.col("vec_id") < 2)
    out = SIM.cosine_topk_bruteforce(df, probes, k=3)
    got = {
        (r["probe_id"], r["rank"]): (r["cand_id"], r["cos_sim"])
        for r in out.collect()
    }
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    for p in range(2):
        cos = (v @ v[p]) / (norms * norms[p])
        cos[p] = -np.inf
        order = sorted(range(20), key=lambda i: (-round(cos[i], 6), i))
        for rank in range(1, 4):
            cand = order[rank - 1]
            assert got[(p, rank)][0] == cand
            assert got[(p, rank)][1] == pytest.approx(cos[cand], abs=1e-5)


def test_ivf_restricts_to_cell(spark):
    # 2 well-separated clusters; centroids = one member of each
    base = np.eye(2)
    rows = []
    for i in range(10):
        c = i % 2
        vec = base[c] * 10 + np.array([0.01 * i, -0.01 * i])
        rows.append((i, [float(vec[0]), float(vec[1])]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [(0, [10.0, 0.0]), (1, [0.0, 10.0])]
    out = SIM.cosine_topk_ivf(df, df.filter("vec_id < 2"), cents, k=3)
    for r in out.collect():
        assert r["probe_id"] % 2 == r["cand_id"] % 2  # never leaves its cell


def test_token_stats_and_quality(docs_df):
    r = (
        TA.with_quality_score(TA.with_token_stats(docs_df))
        .filter("doc_id = 0")
        .first()
    )
    text = DOCS[0][1]
    assert r["n_ws_tokens"] == len(text.split())
    assert r["n_chars_t"] == len(text)
    assert r["punct_ratio"] == 0.0
    assert 0.0 <= r["quality_score"] <= 1.0
    # 'the' and 'and' from the en stopword list appear: 2/10
    assert r["stopword_ratio"] == pytest.approx(0.2)


def test_langid_picks_plausible_language(docs_df):
    preds = {r["doc_id"]: r["lang_pred"] for r in TA.with_langid(docs_df).collect()}
    assert preds[0] == "en"
    assert preds[4] == "de"
    assert preds[5] == "fr"


def test_fingerprint_is_min_shingle_hash(docs_df):
    r = TA.with_fingerprint(docs_df).filter("doc_id = 3").first()
    sh = _shingles(DOCS[3][1])
    assert r["fingerprint"] == min(_h60(s) for s in sh)
    assert r["n_shingles"] == len(sh)


def test_multimodal_decode_real_codecs(spark):
    """PNG/WAV payloads REALLY decode (dims/rate/stats from the pixels and
    samples, not the container bytes); video (concatenated BMP) sniffs as
    bmp and decodes its first frame as the preview image."""
    from diive_spark.text import codecs

    media = MM.synth_media(spark, n=12)
    out = MM.decode_media(media).collect()
    assert len(out) == 12
    by_id = {r["media_id"]: r for r in out}

    # id 3 -> PNG image (8 + 3%5 = 11 rows x 10 cols x 3 ch)
    payload = bytes(media.filter("media_id = 3").first()["payload"])
    r = by_id[3]
    assert r["format"] == "png"
    assert (r["height"], r["width"], r["channels"]) == (11, 10, 3)
    assert r["content_hash"] == hashlib.md5(payload).hexdigest()
    img = codecs.decode_png(payload).astype(np.float64)
    np.testing.assert_allclose(
        r["feature"], [1.0, 11, 10, 3, img.mean(), img.std(), img.min(), img.max()]
    )

    # id 1 -> WAV audio (400 mono samples @ 16 kHz)
    a = by_id[1]
    assert a["format"] == "wav"
    assert (a["sample_rate"], a["n_samples"], a["channels"]) == (16000, 400, 1)
    assert a["feature"][0] == 2.0

    # id 2 -> concatenated-BMP raw video: first frame decodes as preview
    v = by_id[2]
    assert v["format"] == "bmp"
    assert (v["height"], v["width"]) == (6, 6)

    # strict only raises for formats WITHOUT a stdlib codec
    junk = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0], "media_type": ["image"], "payload": [b"\xff\xd8JPEG?"]}
        )
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        MM.decode_media(junk, strict=True).collect()
    # non-strict fallback: byte moments, flagged unknown
    fb = MM.decode_media(junk).collect()[0]
    assert fb["format"] == "unknown" and len(fb["feature"]) == MM.FEATURE_DIM


def test_multimodal_resize_and_frames(spark):
    from diive_spark.text import codecs
    from diive_spark.text.multimodal import resize_media, sample_frames, synth_media

    media = synth_media(spark, n=12)
    resized = resize_media(media, width=8, height=4).toPandas()
    assert len(resized) == 12
    # image/video payloads -> REAL resized PNGs with the requested dims
    by_id = dict(zip(resized["media_id"], resized["payload_resized"]))
    img = codecs.decode_png(bytes(by_id[3]))
    assert img.shape == (4, 8, 3)
    # resize is content-exact: nearest-neighbour of the decoded source
    src = codecs.decode_png(bytes(media.filter("media_id = 3").first()["payload"]))
    np.testing.assert_array_equal(img, codecs.resize_nearest(src, 8, 4))
    # deterministic: same input -> same bytes
    r2 = resize_media(synth_media(spark, n=12), width=8, height=4).toPandas()
    assert (
        resized.sort_values("media_id")["payload_resized"].map(bytes).tolist()
        == r2.sort_values("media_id")["payload_resized"].map(bytes).tolist()
    )

    # raw-video containers split on real BMP frame boundaries: 3 frames,
    # every 2nd -> frame_idx {0, 2}, each a decodable BMP
    videos = media.filter("media_type = 'video'")
    frames = sample_frames(videos, every_n=2).toPandas()
    assert sorted(frames["frame_idx"].unique()) == [0, 2]
    assert len(frames) == 2 * videos.count()
    assert codecs.decode_bmp(bytes(frames["frame_payload"].iloc[0])).shape == (6, 6, 3)

    # fallback chunking for non-container payloads; strict raises there
    audio = media.filter("media_type = 'audio'")
    assert len(sample_frames(audio, frame_bytes=16, every_n=2).toPandas()) > 0
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        sample_frames(audio, strict=True).collect()
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        resize_media(
            spark.createDataFrame(
                pd.DataFrame({"media_id": [0], "payload": [b"\xff\xd8JPEG?"]})
            ),
            8, 4, strict=True,
        ).collect()


def test_ivf_trained_recall(spark):
    """k-means-trained IVF + 2-cell multi-probe must reach recall@5 >= 0.95
    vs brute-force cosine on clustered vectors (VERDICT r2 next #4)."""
    import numpy as np

    from diive_spark.text import similarity as SIM

    rng = np.random.default_rng(11)
    n_clusters, dim, per = 8, 16, 60
    centers = rng.normal(size=(n_clusters, dim)) * 4
    vecs = (
        centers[np.repeat(np.arange(n_clusters), per)]
        + rng.normal(size=(n_clusters * per, dim)) * 0.5
    ).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    sdf = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")

    seeds = [(i, [float(x) for x in vecs[i * per]]) for i in range(n_clusters)]
    cents = SIM.train_ivf_kmeans(sdf, seeds, n_iters=3)
    assert len(cents) == n_clusters

    probes = sdf.filter("vec_id % 37 = 0")  # held-out-ish probe set
    exact = SIM.cosine_topk_bruteforce(sdf, probes, k=5)
    approx = SIM.cosine_topk_ivf_trained(sdf, probes, cents, k=5, n_probe=2)

    want = {(r["probe_id"], r["cand_id"]) for r in exact.collect()}
    got = {(r["probe_id"], r["cand_id"]) for r in approx.collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.95, f"recall@5 = {recall:.3f}"


# ---------------------------------------------------------------------------
# curation: quality filter ladder, URL canonicalization, stratified sampling
# ---------------------------------------------------------------------------

def test_canonicalize_url_cases(spark):
    from diive_spark.text import curation as CU

    cases = {
        # fragment stripped, authority lowercased, :443 dropped,
        # trailing slash stripped (no query)
        "HTTPS://WWW.Foo.COM:443/Page/1/#frag": "https://www.foo.com/Page/1",
        # :80 dropped, path case preserved
        "http://EX.org:80/A/B": "http://ex.org/A/B",
        # non-default port kept
        "http://ex.org:8080/a": "http://ex.org:8080/a",
        # tracking params removed (leading + trailing), real param kept,
        # dangling separators cleaned
        "https://a.b/p?utm_source=x&id=7&utm_campaign=y": "https://a.b/p?id=7",
        "https://a.b/p?id=7&gclid=z": "https://a.b/p?id=7",
        # all params tracking -> bare '?' cleaned FIRST, so the trailing
        # slash rule then applies and the variants collapse together
        "https://a.b/p/?fbclid=1": "https://a.b/p",
        # root slash kept when path is just '/'
        "https://a.b/": "https://a.b",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url: string")
    got = {
        r["url"]: r["canon"]
        for r in df.select(
            "url", CU.canonicalize_url(F.col("url")).alias("canon")
        ).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, f"{raw}: {got[raw]} != {want}"


def test_url_keep_best_picks_highest_quality_then_lowest_id(spark):
    from diive_spark.text import curation as CU

    rows = [
        (1, 100, "https://A.b/x?utm_source=s"),
        (2, 300, "https://a.B/x#f"),      # same canon, best n_chars
        (3, 300, "https://a.b/x"),        # tie on n_chars -> id 2 wins
        (4, 50, "https://a.b/y"),         # its own group
    ]
    df = spark.createDataFrame(rows, "doc_id: long, n_chars: long, url: string")
    out = {
        r["canon_url"]: (r["doc_id"], r["n_dups"])
        for r in CU.url_keep_best(df).collect()
    }
    assert out["https://a.b/x"] == (2, 3)
    assert out["https://a.b/y"] == (4, 1)


def test_gopher_flags_reject_reasons(spark):
    from diive_spark.text import curation as CU

    rows = [
        (0, "the cat sat on a mat and it is that for " * 5),   # clean: keep
        (1, "short text"),                                      # too few words
        (2, "the " + "!!!! ???? " * 40),                        # symbol-heavy
        (3, ("zz " * 60).strip()),                              # no stopwords
        (4, "the a of and to " + "abcdefghijklmnopqrstuv " * 40),  # long words
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r["doc_id"]: r
        for r in CU.gopher_quality_flags(df, min_words=10).collect()
    }
    assert out[0]["keep"] == 1
    assert out[1]["flag_nwords"] == 2 and out[1]["keep"] == 0
    assert out[2]["flag_symbol"] == 2
    assert out[3]["flag_stopwords"] == 2
    assert out[4]["flag_wordlen"] == 2
    # flags are per-rule: the clean doc fails nothing
    assert all(out[0][f] == 0 for f in
               ("flag_nwords", "flag_wordlen", "flag_symbol", "flag_stopwords"))


def test_stratified_sample_deterministic_and_nested(spark):
    """Same (salt, id) -> same bucket on every run; raising a stratum's
    rate only ADDS docs (hash-threshold sampling is nested by design)."""
    from diive_spark.text import curation as CU

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(400)],
        "doc_id: long, lang: string",
    )
    lo = CU.stratified_sample(df, rates={"en": 0.2, "de": 0.1})
    hi = CU.stratified_sample(df, rates={"en": 0.6, "de": 0.1})
    lo_ids = {r["doc_id"] for r in lo.collect()}
    lo_ids2 = {r["doc_id"] for r in lo.collect()}
    hi_ids = {r["doc_id"] for r in hi.collect()}
    assert lo_ids == lo_ids2
    assert lo_ids <= hi_ids
    # strata are independent: de selection identical across the two configs
    de_lo = {r["doc_id"] for r in lo.collect() if r["lang"] == "de"}
    de_hi = {r["doc_id"] for r in hi.collect() if r["lang"] == "de"}
    assert de_lo == de_hi


def test_cosine_neardup_kernel_equals_join_path(spark):
    """The per-block matmul kernel must return exactly the join path's
    pairs (same ids, same rounded cos_sim), including across row-chunk
    boundaries."""
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.normal(size=(6, 8))
    rows = []
    vid = 0
    for blk in range(3):
        for i in range(40):
            v = base[blk] + rng.normal(size=8) * (0.05 if i % 4 else 1.5)
            rows.append((vid, blk, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id: long, label: long, embedding: array<float>")

    a = SIM.cosine_neardup_pairs(
        df, "vec_id", "embedding", block_col="label", threshold=0.95
    )
    b = SIM.cosine_neardup_pairs_kernel(
        df, "vec_id", "embedding", block_col="label", threshold=0.95, row_chunk=16
    )
    ra = {(r["id_a"], r["id_b"], round(r["cos_sim"], 6)) for r in a.collect()}
    rb = {(r["id_a"], r["id_b"], round(r["cos_sim"], 6)) for r in b.collect()}
    assert ra == rb and len(ra) > 0


def test_incremental_lsh_dedup_only_batch_vs_store(spark):
    """Incremental dedup checks the NEW batch against the historical
    signature store only: a batch doc near-identical to a store doc is
    found; store-internal and batch-internal dup pairs are NOT emitted."""
    store_docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and looked at the dog"),
            (1, "the cat sat on the mat and looked at the dog"),  # store dup
            (2, "completely different words about spark engines and rollups"),
        ],
        "doc_id long, text string",
    )
    batch_docs = spark.createDataFrame(
        [
            (100, "the cat sat on the mat and looked at the"),  # near-dup of 0/1
            (101, "the cat sat on the mat and looked at the"),  # batch dup
            (102, "unrelated new content nothing shared here at all today"),
        ],
        "doc_id long, text string",
    )
    out = DD.incremental_lsh_dedup(
        DD.signature_store(batch_docs), DD.signature_store(store_docs),
        threshold=0.5,
    ).collect()
    pairs = {(r["new_id"], r["hist_id"]) for r in out}
    assert (100, 0) in pairs and (100, 1) in pairs
    assert (101, 0) in pairs  # every batch doc checked independently
    assert all(n >= 100 and h < 100 for n, h in pairs)  # direction invariant
    assert not any(n == 102 for n, _ in pairs)
    # jaccard is the exact hashed-set value
    for r in out:
        assert 0.5 <= r["jaccard"] <= 1.0


def test_ngram_repetition_flags_exact_fractions(spark):
    from diive_spark.text import curation as CU

    # doc 1: "spam spam spam spam" — top bigram "spam spam" occurs 3x,
    # chars 9 each, text 19 chars -> top_frac 27/19 > 0.20 -> reject;
    # every trigram "spam spam spam" occurs 2x -> dup chars 2*14=28 -> 28/19
    # doc 2: all-distinct words -> every n-gram unique -> fracs small/zero
    d = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            # 12 distinct words, 72 chars: top bigram "charlie delta"
            # (count-desc, charlen-desc, lexicographic-desc tie-break)
            # covers 13/72 = 0.18 <= 0.20 -> passes
            (2, "alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliet kilo lima"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in CU.ngram_repetition_flags(d, top_n=2, dup_n=3).collect()
    }
    r1 = out[1]
    assert r1["top_ngram"] == "spam spam"
    assert r1["top_ngram_count"] == 3
    assert r1["top_ngram_frac_e4"] == int(np.floor(3 * 9 / 19 * 1e4 + 0.5))
    assert r1["dup_ngram_frac_e4"] == int(np.floor(2 * 14 / 19 * 1e4 + 0.5))
    assert r1["flag_top_ngram"] == 2 and r1["flag_dup_ngram"] == 2
    assert r1["keep"] == 0
    r2 = out[2]
    assert r2["top_ngram"] == "charlie delta"
    assert r2["top_ngram_count"] == 1
    assert r2["top_ngram_frac_e4"] == int(np.floor(13 / 72 * 1e4 + 0.5))
    assert r2["dup_ngram_frac_e4"] == 0
    assert r2["flag_top_ngram"] == 0 and r2["flag_dup_ngram"] == 0
    assert r2["keep"] == 1


def test_decontaminate_ngram_planted_collision(spark):
    from diive_spark.text import curation as CU

    bench = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares the 3-grams "quick brown fox" and "brown fox jumps"
            (1, "a very quick brown fox jumps away now"),
            # no 3-gram overlap with the benchmark
            (2, "completely different words with zero shared trigrams here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in CU.decontaminate_ngram(corpus, bench, k=3).collect()
    }
    assert out[1]["contaminated"] == 1 and out[1]["n_collisions"] == 2
    assert out[2]["contaminated"] == 0 and out[2]["n_collisions"] == 0
    # n_shingles = distinct trigrams: 8 words -> 6 shingles
    assert out[1]["n_shingles"] == 6


def test_redact_pii_masks_and_counts(spark):
    from diive_spark.text import curation as CU

    d = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org or 192.168.1.1 or +41 79 555 12 34 ok"),
            (2, "nothing sensitive here at all"),
            (3, "two mails x@y.co and z@w.io"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.redact_pii(d).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["text_redacted"] == "mail <EMAIL> or <IP> or <PHONE> ok"
    assert out[2]["n_email"] == out[2]["n_ipv4"] == out[2]["n_phone"] == 0
    assert out[2]["text_redacted"] == "nothing sensitive here at all"
    assert out[3]["n_email"] == 2
    assert out[3]["text_redacted"] == "two mails <EMAIL> and <EMAIL>"


def test_shard_pack_budget_boundaries(spark):
    from diive_spark.text import curation as CU

    # lang a: 600+600+600 -> cum starts 0,600,1200 -> budget 1000:
    # shards 0,0,1; then an OVERSIZED doc (2500) starts at 1800 -> shard 1
    # (spills; never splits); next doc starts at 4300 -> shard 4
    d = spark.createDataFrame(
        [
            (1, "a", 600), (2, "a", 600), (3, "a", 600),
            (4, "a", 2500), (5, "a", 100),
            (10, "b", 50),
        ],
        "doc_id long, lang string, n_tokens long",
    )
    out = {
        r["doc_id"]: (r["tok_start"], r["shard_id"])
        for r in CU.shard_pack(d, budget=1000).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (600, 0)
    assert out[3] == (1200, 1)
    assert out[4] == (1800, 1)
    assert out[5] == (4300, 4)
    assert out[10] == (0, 0)  # partitions pack independently


def test_ngram_repetition_kernel_equals_expression(spark):
    """The Arrow kernel and the declarative explode/groupBy twin must be
    row-identical, incl. tie-breaks, len<n floor docs and empty text."""
    from diive_spark.text import curation as CU

    rng = np.random.RandomState(5)
    vocab = ["aa", "bb", "ccc", "dd", "e", "spam", "ham", "x"]
    rows = [(i, " ".join(rng.choice(vocab, rng.randint(1, 40)))) for i in range(150)]
    rows += [(150, ""), (151, "one"), (152, "two words"), (153, "a a a a a a")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    cols = ["doc_id", "top_ngram", "top_ngram_count", "top_ngram_frac_e4",
            "dup_ngram_frac_e4", "flag_top_ngram", "flag_dup_ngram", "keep"]
    a = (CU.ngram_repetition_flags(d, use_kernel=True)
         .select(cols).orderBy("doc_id").collect())
    b = (CU.ngram_repetition_flags(d, use_kernel=False)
         .select(cols).orderBy("doc_id").collect())
    assert a == b
