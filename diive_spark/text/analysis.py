"""Text-analysis operators for the web-text pipeline: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything here is pure ``pyspark.sql.functions`` column math (whole-stage
codegen, no Python in the hot path, no shuffle) — per BASELINE.json
input_hint "no per-row Python". Each operator has an exact DuckDB oracle in
:mod:`diive_spark.queries_text`.

These are the large-scale training-data-pipeline analogs of the reference's
per-series scalar screens (quality flags over numeric series,
/root/reference/diive/pkgs/qaqc/flags.py:48-67): same shape — derive
per-row features, score, gate — applied to documents instead of sensor
points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword inventories for the language-ID heuristic
# (n-gram/stopword-ratio language ID; the classic heuristic fallback when a
# trained model is unavailable). Extend per deployment.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
}

WORD_RE = r"[a-zA-Z0-9]+"
# BPE-ish piece pattern: word-initial chunk + continuation chunks of <=4
# chars — a deterministic proxy for subword token counts (real BPE needs a
# merges table; the regex keeps counting vectorized and engine-portable).
BPE_RE = r"[a-zA-Z0-9]{1,4}"


def _ws_tokens(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, regex word tokens, BPE-ish pieces,
    distinct-token ratio, character count."""
    toks = _ws_tokens(text_col)
    return (
        df.withColumn("n_chars_t", F.length(text_col).cast("long"))
        .withColumn("n_ws_tokens", F.size(toks).cast("long"))
        .withColumn(
            "n_word_tokens",
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "n_bpe_pieces",
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "distinct_token_ratio",
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring via length / punctuation / stopword / repetition
    ratios, composed into one [0, 1] score.

    Mirrors the structure of C4-style web-text quality filters (doc length,
    symbol ratio, stop-word presence) while staying fully vectorized.
    """
    toks = _ws_tokens(text_col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.size(F.array_intersect(F.array_distinct(toks), sw)) / F.lit(
        float(len(STOPWORDS["en"]))
    )
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", ""))
        / F.greatest(F.length(text_col), F.lit(1))
    )
    mean_tok_len = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        / n_tok
    )
    len_score = F.least(F.size(toks) / F.lit(32.0), F.lit(1.0))
    rep_score = F.size(F.array_distinct(toks)) / n_tok
    quality = (
        0.35 * len_score
        + 0.25 * rep_score
        + 0.25 * F.least(stop_ratio * 2.0, F.lit(1.0))
        + 0.15 * (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0)))
    )
    return (
        df.withColumn("stopword_ratio", stop_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("quality_score", quality)
    )


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID: score = |distinct tokens ∩ stopwords(L)|
    / |stopword list|, predicted language = argmax (ties: lexicographic via
    struct max), 'und' when every score is 0."""
    toks = F.array_distinct(_ws_tokens(text_col))
    out = df
    for lang, words in STOPWORDS.items():
        arr = F.array([F.lit(w) for w in words])
        out = out.withColumn(
            f"score_{lang}",
            (F.size(F.array_intersect(toks, arr)) / F.lit(float(len(words)))),
        )
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in sorted(langs, reverse=True):  # earlier alphabet wins ties
        pred = F.when(
            (F.col(f"score_{lang}") > 0) & (F.col(f"score_{lang}") == best),
            F.lit(lang),
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def with_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Document fingerprint: minimum k-gram rolling hash over word shingles
    (winnowing's global-min special case) + distinct-shingle count.
    Identical normalized content => identical fingerprint, so fingerprint
    equality is a cheap near-dup candidate key."""
    toks = _ws_tokens(text_col)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    hashes = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
    )
    return df.withColumn("fingerprint", F.array_min(hashes)).withColumn(
        "n_shingles", F.size(shingles).cast("long")
    )
