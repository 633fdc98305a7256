"""BPE training vs an independent pure-Python implementation, and greedy
encoding invariants."""

from __future__ import annotations

from diive_spark.text import bpe as B


def _ref_bpe(word_freqs: dict[str, int], num_merges: int, min_freq: int = 2):
    """Textbook BPE (Sennrich et al. 2016 Fig. 1 shape) — written
    independently of the DataFrame implementation, same tie-break spec."""
    vocab = {tuple(list(w) + [B.END]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_freq:
            break
        merges.append((a, b, c))
        newv: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            newv[t] = newv.get(t, 0) + f
        vocab = newv
    return merges


CORPUS_FREQS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _corpus_df(spark):
    words = []
    for w, f in CORPUS_FREQS.items():
        words += [w] * f
    # spread across a few docs so the word-freq agg actually aggregates
    texts = [" ".join(words[i::3]) for i in range(3)]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


import pytest


@pytest.mark.parametrize("threshold", [0, 1_000_000])
def test_bpe_train_matches_reference(spark, threshold):
    # threshold=0 forces the distributed DataFrame merge loop; the
    # default takes the vocabulary cutover — both must equal the
    # independent reference BPE
    df = _corpus_df(spark)
    got = B.bpe_train(
        df, num_merges=8, min_freq=2, driver_vocab_threshold=threshold
    )
    want = _ref_bpe(CORPUS_FREQS, num_merges=8, min_freq=2)
    assert got == want
    # sanity on the classic corpus: 'es' ('e','s') is the top first merge
    assert got[0][:2] == ("e", "s") and got[0][2] == 9


def test_bpe_train_min_freq_stops(spark):
    df = _corpus_df(spark)
    got = B.bpe_train(df, num_merges=50, min_freq=4)
    want = _ref_bpe(CORPUS_FREQS, num_merges=50, min_freq=4)
    assert got == want
    assert all(c >= 4 for _, _, c in got)


def test_bpe_encode_counts(spark):
    df = _corpus_df(spark)
    merges = B.bpe_train(df, num_merges=8, min_freq=2)
    out = B.bpe_encode_counts(df, merges).collect()

    # independent expected count: apply the reference merges to each word
    def enc(w):
        syms = list(w) + [B.END]
        ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
        while True:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                return len(syms)
            rank = min(cand)[0]
            a, b = merges[rank][0], merges[rank][1]
            o, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    o.append(a + b)
                    i += 2
                else:
                    o.append(syms[i])
                    i += 1
            syms = o

    for r in out:
        want = sum(enc(w) for w in r["text"].split())
        assert r["n_bpe_tokens"] == want


def test_bpe_encode_fewer_than_chars(spark):
    """Merges must compress: subword count strictly below char count and
    at least the whitespace word count."""
    df = _corpus_df(spark)
    merges = B.bpe_train(df, num_merges=8, min_freq=2)
    for r in B.bpe_encode_counts(df, merges).collect():
        n_words = len(r["text"].split())
        n_chars = sum(len(w) + 1 for w in r["text"].split())
        assert n_words <= r["n_bpe_tokens"] < n_chars
