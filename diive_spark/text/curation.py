"""Dataset-curation operators for the web-text training-data pipeline:
Gopher/C4-style rule filtering, URL canonicalization + keep-best dedup,
and deterministic stratified sampling.

The reference has no web-text analog; these re-express its flag-ladder
pattern (per-rule 0/2 flags composed into one accept decision —
`/root/reference/diive/pkgs/qaqc/qcf.py:150-210`) over the `documents`
table, as the training-data-pipeline checklist requires.  Everything here
is pure codegen column math — no UDFs, no shuffles beyond the final
grouped dedup — so the operators inherit whole-stage codegen and scale
linearly with the scan.

Cross-engine determinism: derived ratios are emitted floor-scaled
(``floor(x * 1e4 + 0.5)`` as BIGINT) per the repo convention, and the
sampling hash is the same md5-prefix BIGINT used by the dedup family
(bit-identical in Spark and DuckDB).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from diive_spark.text.analysis import STOPWORDS

__all__ = [
    "gopher_quality_flags",
    "canonicalize_url",
    "url_keep_best",
    "stratified_sample",
    "ngram_repetition_flags",
    "decontaminate_ngram",
    "redact_pii",
    "shard_pack",
    "line_dedup",
    "extract_domain",
    "domain_cap",
    "repeated_spans",
]


def _e4(c: Column) -> Column:
    """Floor-scaled 1e4 fixed-point emit (cross-engine-stable rounding)."""
    return F.floor(c * 1e4 + F.lit(0.5)).cast("bigint")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_wordlen: float = 2.0,
    max_mean_wordlen: float = 12.0,
    max_symbol_ratio: float = 0.10,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-rule quality FILTER ladder (Rae et al. 2021 §A1.1, simplified
    to the rules computable from whitespace tokens): word-count bounds,
    mean-word-length bounds, symbol-to-char ratio cap, minimum distinct
    English stopwords.  Per-rule flags use the reference's QCF convention
    (0 = pass, 2 = hard reject); ``keep`` = every flag 0.

    Unlike :func:`with_quality_score` (a soft [0,1] score), this is the
    hard accept/reject gate a crawl-curation pipeline applies before
    dedup — flags are kept per rule so rejection reasons stay auditable.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wordlen = sum_len / F.greatest(n_words, F.lit(1))
    symbol_ratio = F.length(
        F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", "")
    ) / F.greatest(F.length(text_col), F.lit(1))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), sw)).cast("long")

    flag = lambda ok: F.when(ok, F.lit(0)).otherwise(F.lit(2))  # noqa: E731
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_wordlen_e4", _e4(mean_wordlen))
        .withColumn("symbol_ratio_e4", _e4(symbol_ratio))
        .withColumn("n_stopwords", n_stop)
        .withColumn(
            "flag_nwords",
            flag((n_words >= min_words) & (n_words <= max_words)),
        )
        .withColumn(
            "flag_wordlen",
            flag(
                (mean_wordlen >= min_mean_wordlen)
                & (mean_wordlen <= max_mean_wordlen)
            ),
        )
        .withColumn("flag_symbol", flag(symbol_ratio <= max_symbol_ratio))
        .withColumn("flag_stopwords", flag(n_stop >= min_stopwords))
    )
    keep = (
        (F.col("flag_nwords") == 0)
        & (F.col("flag_wordlen") == 0)
        & (F.col("flag_symbol") == 0)
        & (F.col("flag_stopwords") == 0)
    )
    return out.withColumn("keep", F.when(keep, F.lit(1)).otherwise(F.lit(0)))


def canonicalize_url(url: Column) -> Column:
    """Canonical URL for crawl dedup: drop the fragment, lowercase the
    ``scheme://host[:port]`` authority, strip default ports (:80/:443),
    remove tracking query params (utm_*, gclid, fbclid) plus any dangling
    ``?``/``&``, and strip the trailing slash from query-less paths.

    Pure regexp column math (identical patterns run on the DuckDB oracle
    side), so canonicalization rides the scan inside codegen — the 100 TB
    posture for a per-row normalizer.
    """
    u = F.regexp_replace(url, "#.*", "")
    prefix = F.regexp_extract(u, "^([^/]*//[^/?#]*)", 1)
    rest = F.substr(u, F.length(prefix) + 1, F.lit(1_000_000))
    prefix = F.regexp_replace(F.lower(prefix), ":(80|443)$", "")
    rest = F.regexp_replace(rest, "(utm_[a-z]+|gclid|fbclid)=[^&#]*&?", "")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.when(
        rest.contains("?"), rest
    ).otherwise(F.regexp_replace(rest, "/+$", ""))
    return F.concat(prefix, rest)


def url_keep_best(
    df: DataFrame,
    url_col: str = "url",
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per canonical URL: highest ``quality_col`` wins, ties break
    to the smallest id (deterministic).  Adds ``n_dups`` = group size.
    Single hash-shuffle on the canonical key; AQE handles hot hosts."""
    canon = canonicalize_url(F.col(url_col)).alias("canon_url")
    d = df.select(canon, *df.columns)
    w = Window.partitionBy("canon_url").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    wc = Window.partitionBy("canon_url")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_dups", F.count("*").over(wc).cast("long"))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.25,
    salt: str = "samp",
) -> DataFrame:
    """Deterministic per-stratum sampling for dataset curation: a doc is
    kept iff ``md5(salt:id) mod 10000 < rate(stratum) * 10000``.  The same
    doc always lands on the same side at any scale, on any cluster, in any
    engine — reproducible train-set carving, no RNG state.

    The rates table is a broadcast dim (a handful of strata); unknown
    strata fall back to ``default_rate``.  Adds ``bucket`` (the hash slot)
    and ``rate_e4`` so the decision is auditable downstream.
    """
    rates = rates or {}
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(k, int(round(v * 10000))) for k, v in rates.items()],
        f"{strata_col} string, rate_e4 long",
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(10000))
    out = (
        df.withColumn("bucket", bucket)
        .join(F.broadcast(dim), strata_col, "left")
        .withColumn(
            "rate_e4",
            F.coalesce(F.col("rate_e4"), F.lit(int(round(default_rate * 10000)))),
        )
    )
    return out.filter(F.col("bucket") < F.col("rate_e4"))


def _word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as strings, 1-indexed slices; a doc shorter than n
    words yields its whole text as one (short) n-gram — the same floor
    convention as the shingle SQL twins (queries_text._DUCK_SHINGLES)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


_REPETITION_UDFS: dict = {}


def _repetition_stats_udf(top_n: int, dup_n: int):
    """Per-doc repetition sufficient statistics in ONE Arrow-batched pass.

    The stats are fully doc-local, so the kernel removes BOTH shuffles of
    the expression path (explode -> (doc, ngram) -> doc): at crawl scale
    that is the difference between a pure scan and shuffling ~n_tokens
    rows per doc twice.  Tokenization, the len<n floor, and the
    (count, charlen, lexicographic) tie-break replicate the declarative
    expressions exactly (UTF-8 byte order == codepoint order, so python
    tuple max matches Spark's binary struct max)."""
    key = (top_n, dup_n)
    if key not in _REPETITION_UDFS:
        from collections import Counter

        from diive_spark.text.dedup import _WS_SPLIT

        @F.pandas_udf(
            "struct<top_ngram:string,top_cnt:bigint,top_len:bigint,"
            "dup_chars:bigint,tlen:bigint>"
        )
        def _rep(texts: pd.Series) -> pd.DataFrame:
            rows = []
            for t in texts:
                t = t or ""
                # replicate split(trim(text), '\s+'): trim strips SPACES
                # only; regex split keeps leading empty fields
                toks = _WS_SPLIT(t.strip(" "))

                def grams(n: int):
                    m = max(len(toks) - n + 1, 1)
                    return (" ".join(toks[i : i + n]) for i in range(m))

                ct = Counter(grams(top_n))
                c, l, g = max((c, len(g), g) for g, c in ct.items())
                cd = Counter(grams(dup_n))
                dup_chars = sum(
                    c2 * len(g2) for g2, c2 in cd.items() if c2 > 1
                )
                rows.append((g, c, l, dup_chars, len(t)))
            return pd.DataFrame(
                rows,
                columns=["top_ngram", "top_cnt", "top_len", "dup_chars", "tlen"],
            )

        _REPETITION_UDFS[key] = _rep.asNondeterministic()
    return _REPETITION_UDFS[key]


def ngram_repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
    max_top_frac: float = 0.20,
    max_dup_frac: float = 0.60,
    use_kernel: bool = True,
) -> DataFrame:
    """Gopher repetition-rule flags (Rae et al. 2021 §A1.1): the fraction
    of characters covered by the single most frequent ``top_n``-gram, and
    the fraction covered by all ``dup_n``-grams occurring more than once.

    Coverage is counted as ``occurrences x n-gram chars / text chars``
    WITHOUT overlap adjustment (documented deviation from the paper's
    character-dedup accounting: exact overlap tracking needs per-position
    interval merging, which is per-row sequential work for a bound the
    rule only uses as a coarse reject gate).  The top n-gram tie-breaks
    deterministically by (count, char length, lexicographic) — mirrored in
    the DuckDB oracle.

    Default path: a zero-shuffle Arrow kernel (one Counter pass per doc —
    the stats are doc-local, so nothing needs to leave the scan task).
    ``use_kernel=False`` keeps the declarative twin — explode ->
    groupBy(doc, ngram) -> groupBy(doc), two map-side-combinable shuffles
    with an interpreted n-gram HOF — proven identical in pytest and used
    as the in-engine cross-check.
    """
    flag = lambda ok: F.when(ok, F.lit(0)).otherwise(F.lit(2))  # noqa: E731
    if use_kernel:
        r = _repetition_stats_udf(top_n, dup_n)(F.col(text_col))
        s = df.select(F.col(id_col), r.alias("_r"))
        top_frac = (
            F.col("_r.top_cnt") * F.col("_r.top_len")
            / F.greatest(F.col("_r.tlen"), F.lit(1))
        )
        dup_frac = F.col("_r.dup_chars") / F.greatest(F.col("_r.tlen"), F.lit(1))
        out = s.select(
            F.col(id_col),
            F.col("_r.top_ngram").alias("top_ngram"),
            F.col("_r.top_cnt").cast("long").alias("top_ngram_count"),
            _e4(top_frac).alias("top_ngram_frac_e4"),
            _e4(dup_frac).alias("dup_ngram_frac_e4"),
            flag(top_frac <= max_top_frac).alias("flag_top_ngram"),
            flag(dup_frac <= max_dup_frac).alias("flag_dup_ngram"),
        )
        keep = (F.col("flag_top_ngram") == 0) & (F.col("flag_dup_ngram") == 0)
        return out.withColumn("keep", F.when(keep, F.lit(1)).otherwise(F.lit(0)))

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tlen = F.length(F.col(text_col))

    def _per_doc(n: int, prefix: str) -> DataFrame:
        g = df.select(
            F.col(id_col),
            tlen.alias("_tlen"),
            F.explode(_word_ngrams(toks, n)).alias("_ng"),
        )
        cnt = g.groupBy(id_col, "_ng").agg(
            F.count(F.lit(1)).alias("_c"), F.min("_tlen").alias("_tlen")
        )
        return cnt.groupBy(id_col).agg(
            F.min("_tlen").alias(f"_{prefix}_tlen"),
            F.max(
                F.struct(
                    F.col("_c").alias("c"),
                    F.length("_ng").alias("l"),
                    F.col("_ng").alias("ng"),
                )
            ).alias(f"_{prefix}_top"),
            F.sum(
                F.when(F.col("_c") > 1, F.col("_c") * F.length("_ng")).otherwise(0)
            ).alias(f"_{prefix}_dupchars"),
        )

    top = _per_doc(top_n, "t")
    dup = _per_doc(dup_n, "d")
    j = top.join(dup, id_col)
    top_frac = (
        F.col("_t_top.c") * F.col("_t_top.l") / F.greatest(F.col("_t_tlen"), F.lit(1))
    )
    dup_frac = F.col("_d_dupchars") / F.greatest(F.col("_d_tlen"), F.lit(1))
    flag = lambda ok: F.when(ok, F.lit(0)).otherwise(F.lit(2))  # noqa: E731
    out = j.select(
        F.col(id_col),
        F.col("_t_top.ng").alias("top_ngram"),
        F.col("_t_top.c").cast("long").alias("top_ngram_count"),
        _e4(top_frac).alias("top_ngram_frac_e4"),
        _e4(dup_frac).alias("dup_ngram_frac_e4"),
        flag(top_frac <= max_top_frac).alias("flag_top_ngram"),
        flag(dup_frac <= max_dup_frac).alias("flag_dup_ngram"),
    )
    keep = (F.col("flag_top_ngram") == 0) & (F.col("flag_dup_ngram") == 0)
    return out.withColumn("keep", F.when(keep, F.lit(1)).otherwise(F.lit(0)))


def decontaminate_ngram(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Eval-set decontamination by k-gram collision (the GPT-3 App. C /
    PaLM procedure): a corpus document is flagged ``contaminated`` when at
    least ``min_hits`` of its distinct word k-grams also occur anywhere in
    the benchmark set.

    Scale shape: the benchmark side (eval sets are tiny vs a crawl) is
    reduced to a DISTINCT set of 60-bit k-gram hashes and broadcast, so
    the corpus is matched in ONE scan with a broadcast-hash semi-join —
    no shuffle touches the 100 TB side beyond the per-doc hit count, which
    is map-side combinable on doc_id.  Hashing is the engine-portable h60
    (text/hashing.py), so the DuckDB oracle reproduces hits bit-exactly.
    """
    from diive_spark.text.dedup import with_hashed_shingles

    bench = (
        with_hashed_shingles(
            benchmark.select(F.col(text_col)), text_col=text_col, k=k,
            out_col="_bh",
        )
        .select(F.explode("_bh").alias("_h"))
        .distinct()
    )
    corp = with_hashed_shingles(
        corpus.select(F.col(id_col), F.col(text_col)),
        text_col=text_col, k=k, out_col="_sh",
    ).select(F.col(id_col), F.size("_sh").alias("n_shingles"), F.col("_sh"))
    hits = (
        corp.select(id_col, F.explode("_sh").alias("_h"))
        .join(F.broadcast(bench), "_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_collisions"))
    )
    out = (
        corp.drop("_sh")
        .join(hits, id_col, "left")
        .withColumn("n_collisions", F.coalesce("n_collisions", F.lit(0)))
    )
    return out.withColumn(
        "contaminated",
        F.when(F.col("n_collisions") >= min_hits, F.lit(1)).otherwise(F.lit(0)),
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround, leftmost-greedy safe.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d ()-]{7,}\d",
}
PII_TOKENS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    tokens: dict[str, str] | None = None,
) -> DataFrame:
    """C4/RefinedWeb-style PII masking: emails, bare IPv4s and
    international phone numbers are replaced with placeholder tokens, with
    per-category match counts kept for auditability (``n_email`` ...).

    Pure ``regexp_replace``/``regexp_extract_all`` column math — rides the
    scan inside whole-stage codegen, zero shuffles, and the patterns are
    dialect-portable so the DuckDB oracle masks bit-identically.  Order is
    fixed (email -> ipv4 -> phone) because masking rewrites the string the
    next pattern sees.
    """
    patterns = patterns or PII_PATTERNS
    tokens = tokens or PII_TOKENS
    out = df
    masked = F.col(text_col)
    for name, pat in patterns.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(masked, F.lit(pat), F.lit(0))).cast("long"),
        )
        masked = F.regexp_replace(masked, pat, tokens[name])
    return out.withColumn("text_redacted", masked)


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 1,
) -> DataFrame:
    """C4-style corpus-global line deduplication (Raffel et al. 2020 §2.2):
    every line of at least ``min_len`` characters is kept only at its FIRST
    occurrence across the whole corpus — first in (doc_id, line_no) order,
    so the result is deterministic at any parallelism.  Lines shorter than
    ``min_len`` never participate (they are kept everywhere; eligibility is
    a function of the line text, so a dedup partition is never mixed).

    Returns one row per doc: ``n_lines``, ``n_kept``, and the surviving
    text reassembled in original line order (``text_dedup``).

    Scale shape: posexplode → ONE window shuffle keyed on the line content
    (hash-uniform — the empty/boilerplate hot lines are exactly what AQE
    skew handling splits) → ONE regroup shuffle on doc_id.  Cost is linear
    in total line count; nothing is quadratic and nothing collects.  At
    100 TB you would key the window on ``xxhash64(line)`` instead of the
    string itself to shrink shuffle bytes — kept as the raw string here so
    the DuckDB oracle partitions identically.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )
    w = Window.partitionBy("line").orderBy(id_col, "line_no")
    flagged = lines.withColumn(
        "_keep",
        F.when(F.length("line") < min_len, F.lit(1))
        .when(F.row_number().over(w) == 1, F.lit(1))
        .otherwise(F.lit(0)),
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("_keep").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "_keep", "line"))
                    ),
                    lambda s: s["_keep"] == 1,
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_dedup"),
    )


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 15,
    max_span_frac: float = 0.5,
) -> DataFrame:
    """Cross-document repeated-span detection — the blocking-key
    approximation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    ``span_tokens``-token window that occurs verbatim in MORE THAN ONE
    document marks duplicated content (licenses, boilerplate, syndicated
    articles).  Exact suffix arrays don't distribute; hashed fixed-width
    spans give the same reject signal with a groupBy — any duplicated
    substring of >= span_tokens tokens contains at least one duplicated
    span, so recall on long-form duplication is exact.

    Per doc: distinct span count, how many of those spans also appear in
    another doc, the repeated fraction (floor-e4), and a 0/2 QCF-style
    flag when the fraction exceeds ``max_span_frac``.

    Scale shape: one distinct-span hash pass per doc (the same Arrow
    kernel as the shingle family — 60-bit hashes, never span strings),
    ONE map-side-combinable groupBy on the span hash for doc-frequency,
    one broadcast-unfriendly but hash-uniform join back, one per-doc agg.
    Docs shorter than span_tokens yield their whole text as one span
    (the shingle floor convention) and compare exactly.
    """
    from diive_spark.text.dedup import with_hashed_shingles

    sh = with_hashed_shingles(
        df.select(id_col, text_col), text_col=text_col, k=span_tokens,
        out_col="_sp",
    ).select(F.col(id_col), F.col("_sp"))
    spans = sh.select(id_col, F.explode("_sp").alias("_h"))
    docfreq = spans.groupBy("_h").agg(
        F.count_distinct(id_col).cast("long").alias("_nd")
    )
    per_doc = (
        spans.join(docfreq, "_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_repeated"),
        )
    )
    frac = F.col("n_repeated") / F.greatest(F.col("n_spans"), F.lit(1))
    return per_doc.select(
        F.col(id_col),
        "n_spans",
        "n_repeated",
        _e4(frac).alias("repeated_frac_e4"),
        F.when(frac <= max_span_frac, F.lit(0)).otherwise(F.lit(2)).alias(
            "flag_repeated"
        ),
    )


def extract_domain(url: Column) -> Column:
    """Registrable host of a URL, lowercased, port stripped — the blocking
    key for per-site curation policies.  Pure regexp column math."""
    host = F.regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    host = F.regexp_replace(F.lower(host), ":[0-9]+$", "")
    return F.regexp_replace(host, "^[^@]*@", "")


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 10,
    salt: str = "domcap",
) -> DataFrame:
    """Per-domain contribution cap (the RefinedWeb / Dolma "no single site
    dominates the corpus" rule): within each domain, docs are ranked by a
    deterministic per-doc hash (so the retained subset is an unbiased,
    reproducible sample — NOT "first crawled wins") and only the first
    ``max_per_domain`` survive.

    Adds ``domain``, ``domain_rank``, ``n_domain_docs`` and ``kept``; the
    caller filters on ``kept`` (flags stay auditable, matching the QCF
    flag-ladder convention).  ONE window shuffle on the domain key; hot
    mega-domains are real skew — at crawl scale this is the op to pair
    with AQE skew splitting, and the rank-then-filter shape keeps it a
    single pass (no per-domain count subquery join).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    d = df.withColumn("domain", extract_domain(F.col(url_col))).withColumn(
        "_h", h
    )
    w = Window.partitionBy("domain").orderBy("_h", id_col)
    wc = Window.partitionBy("domain")
    return (
        d.withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .withColumn("n_domain_docs", F.count(F.lit(1)).over(wc).cast("long"))
        .withColumn(
            "kept",
            F.when(F.col("domain_rank") <= max_per_domain, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .drop("_h")
    )


def shard_pack(
    df: DataFrame,
    part_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 4096,
) -> DataFrame:
    """Deterministic token-budget shard assignment (training-data sequence
    packing): within each ``part_col`` partition, docs are laid out in
    ``id_col`` order and cut into shards of at most ``budget`` tokens by
    the running total — ``shard_id = floor((cumsum - n_tokens) / budget)``,
    i.e. a doc starts a new shard when the budget would overflow ON
    AVERAGE (Megatron-style contiguous packing; an oversized doc spills
    its shard rather than splitting).

    The running sum is a window per partition key — embarrassingly
    parallel across languages/domains; a SINGLE global sequence would
    serialize, which is why the op requires an explicit partition column
    (use a hash bucket for corpora without a natural one).  Adds
    ``tok_start`` (offset within the partition's stream) for writers that
    need byte/token ranges.
    """
    w = Window.partitionBy(part_col).orderBy(id_col)
    cum = F.sum(tokens_col).over(w)
    return (
        df.withColumn("tok_start", (cum - F.col(tokens_col)).cast("long"))
        .withColumn(
            "shard_id", F.floor(F.col("tok_start") / F.lit(budget)).cast("long")
        )
    )


def temperature_resample(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based corpus rebalancing (the multilingual sampling of
    mC4 / XLM-R / CCNet, Conneau et al. 2020): flatten the stratum
    distribution toward q_l ∝ n_l^alpha (alpha=1 keeps the natural mix,
    alpha=0 is uniform).  With subsampling only (no duplication), the
    per-stratum keep rate that realizes q is

        rate_l = (min_m n_m / n_l)^(1-alpha)

    — the smallest stratum is kept whole, larger ones downsampled by the
    power law.  Acceptance is the same deterministic md5-threshold as
    stratified_sample (reproducible at any scale, no RNG): keep iff
    ``pmod(h60(salt:id), 10^6) < floor(rate·10^6 + 1/pi)`` (irrational
    offset so the cut never sits on a representable boundary —
    BASELINE.md round-half note).

    Plan: one map-side-combinable count per stratum, a window min over
    that handful of rows (no collect), broadcast back.  alpha=0.5 uses
    sqrt (IEEE-exact, bit-identical across engines); other alphas go
    through pow (1-ulp class, fine for production, noted for oracles).
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    wall = Window.partitionBy()
    ratio = F.min("_n").over(wall) / F.col("_n")
    power = (
        F.sqrt(ratio) if abs((1.0 - alpha) - 0.5) < 1e-12
        else F.pow(ratio, F.lit(1.0 - alpha))
    )
    rates = counts.select(
        strata_col,
        F.col("_n").alias("n_stratum"),
        F.floor(power * 1_000_000 + F.lit(0.31830988618367))
        .cast("long")
        .alias("rate_e6"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    out = df.withColumn("bucket6", F.pmod(h, F.lit(1_000_000))).join(
        F.broadcast(rates), strata_col
    )
    return out.filter(F.col("bucket6") < F.col("rate_e6"))
