"""Web-text curation query registry, part 2: near-dup clustering
(connected components), corpus-global line dedup, per-domain capping, and
bigram-LM quality scoring — each with a DuckDB oracle recomputing the same
deterministic pipeline (cluster labels via a recursive-CTE transitive
closure, which is exact at oracle scale; the Spark side runs the
O(log^2 n) alternating-stars algorithm that survives 10^12 docs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.text import curation as CU
from diive_spark.text import dedup as DD
from diive_spark.text import graph as GR
from diive_spark.text import lm as LM
from diive_spark.text import tfidf as TI
from diive_spark.queries_text import (
    DUCK_H60,
    DUCK_TOKS,
    SQL_NEARDUP_CORPUS,
    _documents,
    _duck_ngrams,
    _neardup_corpus,
    _sql_minhash_body,
    _SAMPLE_DEFAULT,
    _SAMPLE_RATES,
    _SW_EN,
    _url_synth_col,
    _URL_SYNTH_SQL,
)


# ---------------------------------------------------------------------------
# dedup_clusters — connected components over MinHash-LSH near-dup pairs
# ---------------------------------------------------------------------------

def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: verified LSH pairs (jaccard >= 0.6) are edges;
    alternating large-star/small-star labels every touched doc with its
    component minimum.  The oracle recomputes labels as a recursive-CTE
    transitive closure — a completely different algorithm, so agreement
    checks the clustering itself, not a shared implementation."""
    corpus = _neardup_corpus(spark, sf_dir)
    # not persisted — cached array<bigint> scans cost more than the pandas
    # UDF recompute per arm (see q_dedup_minhash_lsh)
    hs = DD.with_hashed_shingles(corpus, k=3).select(
        "doc_id", "sh_hashes"
    )
    mh = DD.with_minhash(hs, shingle_col="sh_hashes", hashed=True)
    pairs = DD.lsh_candidate_pairs(mh)
    verified = DD.jaccard_verify(
        pairs, hs, shingle_col="sh_hashes", threshold=0.6
    )
    out = GR.connected_components(
        verified, src_col="id_a", dst_col="id_b", num_partitions=8,
        with_sizes=True,
    )
    return out.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "cluster_size",
    ).orderBy("doc_id")


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_sql_minhash_body()},
pairs06 AS (
  SELECT id_a, id_b FROM verified WHERE jaccard >= 0.6
), sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs06
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs06
), reach(u, v) AS (
  SELECT u, u AS v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON s.u = r.v
), lab AS (
  SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
), sz AS (
  SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id
)
SELECT CAST(l.doc_id AS BIGINT) AS doc_id,
       CAST(l.cluster_id AS BIGINT) AS cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM lab l JOIN sz s USING (cluster_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# line_dedup — C4-style corpus-global exact line dedup
# ---------------------------------------------------------------------------
# The sf documents are single-line; both engines deterministically re-wrap
# them into 3-token lines first, so cross-doc line collisions actually
# occur and the dedup is exercised for real.

_LINE_TOKS = 3


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "text")
    toks = F.split(F.trim("text"), r"\s+")
    nl = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(_LINE_TOKS))).cast("int"), F.lit(1)
    )
    lines_arr = F.transform(
        F.sequence(F.lit(1), nl),
        lambda i: F.concat_ws(
            " ", F.slice(toks, (i - 1) * _LINE_TOKS + 1, _LINE_TOKS)
        ),
    )
    wrapped = d.select(
        "doc_id", F.array_join(lines_arr, "\n").alias("text")
    )
    out = CU.line_dedup(wrapped, min_len=1)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_lines",
        "n_kept",
        "text_dedup",
    ).orderBy("doc_id")


SQL_LINE_DEDUP = f"""
WITH t AS (
  SELECT doc_id, {DUCK_TOKS} AS toks FROM documents
), lt AS (
  SELECT doc_id,
         list_transform(
           generate_series(
             1, greatest(CAST(ceil(len(toks) / {float(_LINE_TOKS)}) AS INT), 1)),
           i -> array_to_string(
                  toks[(i-1)*{_LINE_TOKS}+1:(i-1)*{_LINE_TOKS}+{_LINE_TOKS}],
                  ' ')) AS lines
  FROM t
), e AS (
  SELECT doc_id, lines,
         unnest(generate_series(1, len(lines))) AS line_no
  FROM lt
), l AS (
  SELECT doc_id, line_no, lines[line_no] AS line FROM e
), r AS (
  SELECT doc_id, line_no, line,
         CASE WHEN length(line) < 1 THEN 1
              WHEN row_number() OVER (PARTITION BY line
                                      ORDER BY doc_id, line_no) = 1 THEN 1
              ELSE 0 END AS keep
  FROM l
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       COALESCE(string_agg(CASE WHEN keep = 1 THEN line END, chr(10)
                           ORDER BY line_no), '') AS text_dedup
FROM r GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# domain_cap — per-domain contribution cap (hash-ranked, deterministic)
# ---------------------------------------------------------------------------

_DOMAIN_CAP = 10


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "doc_id", _url_synth_col().alias("url")
    )
    out = CU.domain_cap(d, max_per_domain=_DOMAIN_CAP)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "domain",
        "domain_rank",
        "n_domain_docs",
        "kept",
    ).orderBy("doc_id")


SQL_DOMAIN_CAP = f"""
WITH raw AS (
  SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM documents
), dom AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)),
             ':[0-9]+$', ''),
           '^[^@]*@', '') AS domain,
         {DUCK_H60.format(s="'domcap:' || CAST(doc_id AS VARCHAR)")} AS h
  FROM raw
), ranked AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain ORDER BY h, doc_id) AS rn,
         count(*) OVER (PARTITION BY domain) AS n_domain_docs
  FROM dom
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, domain,
       CAST(rn AS BIGINT) AS domain_rank,
       CAST(n_domain_docs AS BIGINT) AS n_domain_docs,
       CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END AS kept
FROM ranked ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# lm_bigram_score — corpus-trained add-1 bigram LM mean log-probability
# ---------------------------------------------------------------------------
# Self-trained (ref == scoring corpus), the degenerate-but-deterministic
# case; avg_logprob is an order-dependent float mean, emitted round(2)
# per the cross-engine rounding convention (integer columns are exact).

def q_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "text")
    # count-table persist DROPPED (round-3 measurement, same finding as
    # the MinHash shingle cache — PLANS.md §37): re-running the Arrow
    # bigram kernel per arm beats Spark's row cache on the string table
    counts = LM.bigram_counts(d)
    # broadcast_model: this corpus's model fits an executor; see lm.py
    out = LM.bigram_lm_score(
        d, d, alpha=1.0, counts_df=counts, broadcast_model=True
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_bigrams",
        "n_tokens",
        F.round("avg_logprob", 2).alias("avg_logprob"),
    ).orderBy("doc_id")


SQL_LM_BIGRAM_SCORE = f"""
WITH t AS (
  SELECT doc_id, {DUCK_TOKS} AS toks FROM documents
), bg AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2
                     THEN list_transform(generate_series(1, len(toks) - 1),
                                         i -> toks[i] || ' ' || toks[i+1])
                     ELSE CAST([] AS VARCHAR[]) END) AS bigram
  FROM t
), cb AS (
  SELECT bigram, count(*) AS c_bigram FROM bg GROUP BY bigram
), cs AS (
  SELECT split_part(bigram, ' ', 1) AS w1, sum(c_bigram) AS c_start
  FROM cb GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(toks) AS tok FROM t)
), inst AS (
  SELECT doc_id, bigram, split_part(bigram, ' ', 1) AS w1 FROM bg
), sc AS (
  SELECT i.doc_id, count(*) AS n_bigrams,
         avg(ln((COALESCE(cb.c_bigram, 0) + 1.0)
                / (COALESCE(cs.c_start, 0) + 1.0 * v.v))) AS lp
  FROM inst i
  LEFT JOIN cb USING (bigram)
  LEFT JOIN cs USING (w1)
  CROSS JOIN v
  GROUP BY i.doc_id
), n AS (
  SELECT doc_id, len(toks) AS n_tokens FROM t
)
SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       round(sc.lp, 2) AS avg_logprob
FROM n LEFT JOIN sc USING (doc_id) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# tfidf_topk — inverted-index TF-IDF cosine top-k (sparse similarity)
# ---------------------------------------------------------------------------
# The sf corpus has a ~31-term vocabulary where every term is near-universal
# (df ≈ 0.8N), so the query disables max-df pruning (1.0) — the operator's
# 0.5 default would empty the index; real crawls have heavy-tailed vocab.

_TFIDF_PROBE_MOD = 23
_TFIDF_K = 5


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "text")
    # persist BEFORE deriving the two join arms: cache substitution is by
    # plan equality, and both the corpus side and the probe filter must
    # resolve to the SAME cached weights table (otherwise the probe arm
    # hits the cache while the corpus arm recomputes the whole pipeline)
    w = TI.tfidf_weights(d, max_df_frac=1.0).persist()
    probes = w.filter(F.col("doc_id") % _TFIDF_PROBE_MOD == 0)
    out = TI.tfidf_topk(w, probes, k=_TFIDF_K)
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "rank",
        "score_e6",
        "n_shared_terms",
    ).orderBy("id_a", "rank")


SQL_TFIDF_TOPK = f"""
WITH tok AS (
  SELECT doc_id, unnest({DUCK_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), dfq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), w0 AS (
  SELECT doc_id, term,
         tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS w_raw
  FROM tf JOIN dfq USING (term) CROSS JOIN n
  WHERE df <= n_docs * 1.0
), w AS (
  SELECT doc_id, term,
         w_raw / sqrt(sum(w_raw * w_raw)
                      OVER (PARTITION BY doc_id)) AS weight
  FROM w0
), s AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         sum(a.weight * b.weight) AS score,
         count(*) AS n_shared_terms
  FROM w a JOIN w b USING (term)
  WHERE a.doc_id % {_TFIDF_PROBE_MOD} = 0 AND b.doc_id != a.doc_id
  GROUP BY a.doc_id, b.doc_id
), r AS (
  SELECT id_a, id_b, n_shared_terms,
         CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_e6
  FROM s
), rk AS (
  SELECT id_a, id_b, score_e6, n_shared_terms,
         row_number() OVER (PARTITION BY id_a
                            ORDER BY score_e6 DESC, id_b ASC) AS rn
  FROM r
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(rn AS BIGINT) AS rank, score_e6,
       CAST(n_shared_terms AS BIGINT) AS n_shared_terms
FROM rk WHERE rn <= {_TFIDF_K} ORDER BY id_a, rank
"""


# ---------------------------------------------------------------------------
# bm25_topk — Okapi BM25 inverted-index retrieval (the Lucene scoring
# sibling of tfidf_topk: length-normalized tf saturation + positive idf)
# ---------------------------------------------------------------------------

def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "text")
    # persist before deriving the probe arm (same cache-substitution note
    # as q_tfidf_topk: both join arms must hit the SAME cached postings)
    imp = TI.bm25_impacts(d, k1=1.2, b=0.75).persist()
    probes = imp.filter(F.col("doc_id") % _TFIDF_PROBE_MOD == 0)
    out = TI.bm25_topk(imp, probes, k=_TFIDF_K)
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "rank",
        "score_e6",
        "n_shared_terms",
    ).orderBy("id_a", "rank")


SQL_BM25_TOPK = f"""
WITH tok AS (
  SELECT doc_id, unnest({DUCK_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), dfq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs,
         avg(len({DUCK_TOKS})) AS avgdl
  FROM documents
), dlt AS (
  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
), imp AS (
  SELECT t.doc_id, t.term,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (t.tf * 2.2)
           / (t.tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS impact
  FROM tf t JOIN dfq USING (term) JOIN dlt USING (doc_id) CROSS JOIN n
), s AS (
  SELECT q.doc_id AS id_a, d.doc_id AS id_b,
         sum(d.impact) AS score,
         count(*) AS n_shared_terms
  FROM (SELECT DISTINCT doc_id, term FROM tf
        WHERE doc_id % {_TFIDF_PROBE_MOD} = 0) q
  JOIN imp d USING (term)
  WHERE d.doc_id != q.doc_id
  GROUP BY q.doc_id, d.doc_id
), rk AS (
  SELECT id_a, id_b, n_shared_terms,
         CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_e6,
         row_number() OVER (PARTITION BY id_a
                            ORDER BY CAST(floor(score * 1e6 + 0.5) AS BIGINT)
                                     DESC, id_b ASC) AS rn
  FROM s
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(rn AS BIGINT) AS rank, score_e6,
       CAST(n_shared_terms AS BIGINT) AS n_shared_terms
FROM rk WHERE rn <= {_TFIDF_K} ORDER BY id_a, rank
"""


# ---------------------------------------------------------------------------
# repeated_spans — cross-doc verbatim span detection (substring-dedup proxy)
# ---------------------------------------------------------------------------
# Runs on the neardup corpus (doc ∪ last-word-dropped copy) so long spans
# genuinely repeat across documents.

_SPAN_TOKENS = 15


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _neardup_corpus(spark, sf_dir)
    out = CU.repeated_spans(corpus, span_tokens=_SPAN_TOKENS)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_spans",
        "n_repeated",
        "repeated_frac_e4",
        "flag_repeated",
    ).orderBy("doc_id")


SQL_REPEATED_SPANS = f"""
WITH {SQL_NEARDUP_CORPUS},
t AS (
  SELECT doc_id, {DUCK_TOKS} AS toks FROM corpus
), sp AS (
  SELECT doc_id,
         list_distinct(list_transform({_duck_ngrams(_SPAN_TOKENS)},
                                      s -> {DUCK_H60.format(s='s')})) AS hs
  FROM t
), e AS (
  SELECT doc_id, unnest(hs) AS h FROM sp
), dfq AS (
  SELECT h, count(DISTINCT doc_id) AS nd FROM e GROUP BY h
), p AS (
  SELECT doc_id, count(*) AS n_spans,
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_repeated
  FROM e JOIN dfq USING (h) GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_spans AS BIGINT) AS n_spans,
       CAST(n_repeated AS BIGINT) AS n_repeated,
       CAST(floor(n_repeated * 1.0 / greatest(n_spans, 1) * 1e4 + 0.5)
            AS BIGINT) AS repeated_frac_e4,
       CASE WHEN n_repeated * 1.0 / greatest(n_spans, 1) <= 0.5
            THEN 0 ELSE 2 END AS flag_repeated
FROM p ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# curation_pipeline — the end-to-end crawl-curation DAG as ONE query
# ---------------------------------------------------------------------------
# Gopher quality gate -> URL canonicalization + keep-best -> exact content
# dedup -> per-domain cap -> stratified sampling: the composition a crawl
# pipeline actually runs, exercised as a single DataFrame program so the
# oracle checks the INTERACTION of the stages (order matters: each stage
# sees only the previous stage's survivors), not just each in isolation.
# Every stage is a documented standalone query; parameters are shared.

_PIPE_CAP = 12


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).withColumn("url", _url_synth_col())
    g = CU.gopher_quality_flags(d, min_words=30, min_stopwords=2).filter(
        F.col("keep") == 1
    )
    u = CU.url_keep_best(g, url_col="url", quality_col="n_chars")
    # exact content dedup, row grain: first doc_id per 60-bit content hash
    h = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")
    wex = Window.partitionBy(h).orderBy("doc_id")
    e = (
        u.withColumn("_rn", F.row_number().over(wex))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    c = CU.domain_cap(
        e, url_col="canon_url", max_per_domain=_PIPE_CAP
    ).filter(F.col("kept") == 1)
    s = CU.stratified_sample(
        c, strata_col="lang", rates=_SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT
    )
    return s.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "domain",
        "canon_url",
        F.col("n_chars").cast("long").alias("n_chars"),
        "bucket",
        "rate_e4",
    ).orderBy("doc_id")


_PIPE_RATES_VALUES = ", ".join(
    f"('{k}', {int(round(v * 10000))})" for k, v in _SAMPLE_RATES.items()
)

SQL_CURATION_PIPELINE = f"""
WITH t AS (
  SELECT doc_id, text, lang, source, n_chars, {_URL_SYNTH_SQL} AS url,
         {DUCK_TOKS} AS toks
  FROM documents
), gq AS (
  SELECT doc_id, text, lang, n_chars, url FROM t
  WHERE len(toks) BETWEEN 30 AND 100000
    AND (list_sum(list_transform(toks, x -> length(x))) * 1.0
         / greatest(len(toks), 1)) BETWEEN 2.0 AND 12.0
    AND (length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
         / greatest(length(text), 1)) <= 0.10
    AND len(list_intersect(list_distinct(toks), {_SW_EN})) >= 2
), nofrag AS (
  SELECT *, regexp_replace(url, '#.*', '') AS u FROM gq
), pre AS (
  SELECT *, regexp_extract(u, '^([^/]*//[^/?#]*)', 1) AS prefix FROM nofrag
), canon0 AS (
  SELECT doc_id, text, lang, n_chars,
         regexp_replace(lower(prefix), ':(80|443)$', '') AS p,
         regexp_replace(
           regexp_replace(substr(u, length(prefix) + 1),
                          '(utm_[a-z]+|gclid|fbclid)=[^&#]*&?', '', 'g'),
           '[?&]+$', '') AS r
  FROM pre
), canon AS (
  SELECT doc_id, text, lang, n_chars,
         p || CASE WHEN contains(r, '?') THEN r
                   ELSE regexp_replace(r, '/+$', '') END AS canon_url
  FROM canon0
), best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY canon_url
                                 ORDER BY n_chars DESC, doc_id ASC) AS rn
    FROM canon) WHERE rn = 1
), uniq AS (
  SELECT * FROM (
    SELECT doc_id, text, lang, n_chars, canon_url,
           row_number() OVER (
             PARTITION BY {DUCK_H60.format(s='text')}
             ORDER BY doc_id) AS rn2
    FROM best) WHERE rn2 = 1
), dom AS (
  SELECT doc_id, lang, n_chars, canon_url,
         regexp_replace(
           regexp_replace(
             lower(regexp_extract(canon_url,
                                  '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)),
             ':[0-9]+$', ''),
           '^[^@]*@', '') AS domain,
         {DUCK_H60.format(s="'domcap:' || CAST(doc_id AS VARCHAR)")} AS dh
  FROM uniq
), capped AS (
  SELECT * FROM (
    SELECT doc_id, lang, n_chars, canon_url, domain,
           row_number() OVER (PARTITION BY domain ORDER BY dh, doc_id) AS dr
    FROM dom) WHERE dr <= {_PIPE_CAP}
), rates(lang, rate_e4) AS (VALUES {_PIPE_RATES_VALUES}),
samp AS (
  SELECT c.doc_id, c.lang, c.domain, c.canon_url, c.n_chars,
         {DUCK_H60.format(s="'samp:' || CAST(c.doc_id AS VARCHAR)")} % 10000
           AS bucket,
         COALESCE(r.rate_e4, {int(round(_SAMPLE_DEFAULT * 10000))}) AS rate_e4
  FROM capped c LEFT JOIN rates r ON c.lang = r.lang
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, domain, canon_url,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(bucket AS BIGINT) AS bucket, CAST(rate_e4 AS BIGINT) AS rate_e4
FROM samp WHERE bucket < rate_e4 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# bpe_token_stats — train a BPE vocab in-engine, count real subword tokens
# ---------------------------------------------------------------------------
# Iterative argmax training is not SQL-expressible -> rows-only driver
# check; the trainer and the greedy encoder are pinned against an
# independent pure-Python BPE in tests/test_bpe.py.

def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text import bpe as B

    d = _documents(spark, sf_dir).select("doc_id", "text")
    merges = B.bpe_train(d, num_merges=12, min_freq=2, state_partitions=1)
    out = B.bpe_encode_counts(d, merges)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_words"),
        "n_bpe_tokens",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# perplexity_buckets — CCNet-style head/middle/tail LM-quality partition
# ---------------------------------------------------------------------------
# CCNet (Wenzek et al. 2020) splits a crawl into thirds by LM perplexity
# and trains preferentially on the "head".  Here the LM is the in-engine
# corpus-trained bigram model (text/lm.py) and the split is NTILE(3) over
# (rounded score DESC, doc_id) — the tie-break makes the ordering exact
# across engines; round(2) is the proven-stable emit for this score
# (lm_bigram_score, driver-green).  Bucket stats are exact integers plus
# min/max of the already-rounded score.
#
# Scale note: NTILE over Window.orderBy would single-partition the doc
# table.  The rank here is value_offset_row_number (operators/rank.py,
# round 4): the leading sort key is the round(2) score — LOW cardinality
# by construction — so exact per-value counts, cumulative offsets over
# the tiny distinct-score table, and a score-PARTITIONED row_number give
# the global rank with no range-sampling job and no partition-count
# collect (the two extra actions global_row_number pays).  NTILE is
# recovered by exact quota arithmetic — bit-identical to SQL NTILE, no
# single-partition stage over data-sized input anywhere (nulls sort LAST
# to match DESC NULLS LAST on both engines).
#
# Model-table persist experiments (round 4): persisting the STRING count
# table cost +0.7 s vs recompute (PLANS §37 again); a hashed-int64
# rollup model was cache-friendly but the md5 per bigram instance cost
# more than the string joins saved (3.0 s vs 2.1 s scored build) —
# measured, reverted, documented in PLANS.md.

def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.rank import (
        ntile_from_rank,
        value_offset_row_number,
    )

    d = _documents(spark, sf_dir).select("doc_id", "text")
    counts = LM.bigram_counts(d)  # not persisted — PLANS.md §37
    scored = LM.bigram_lm_score(
        d, d, alpha=1.0, counts_df=counts, broadcast_model=True
    )
    ranked = value_offset_row_number(
        scored.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_tokens",
            F.round("avg_logprob", 2).alias("lp"),
        ).persist(),
        "lp",
        [F.col("doc_id")],
        descending=True,
        attach_total="n_total",
    ).withColumn(
        "bucket", ntile_from_rank(F.col("rn"), F.col("n_total"), 3)
    )
    return ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("lp").alias("min_lp"),
        F.max("lp").alias("max_lp"),
    ).orderBy("bucket")


_SQL_LM_DOC_SCORES = """
  t AS (
    SELECT doc_id, {toks} AS toks FROM documents
  ), bg AS (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) >= 2
                       THEN list_transform(generate_series(1, len(toks) - 1),
                                           i -> toks[i] || ' ' || toks[i+1])
                       ELSE CAST([] AS VARCHAR[]) END) AS bigram
    FROM t
  ), cb AS (
    SELECT bigram, count(*) AS c_bigram FROM bg GROUP BY bigram
  ), cs AS (
    SELECT split_part(bigram, ' ', 1) AS w1, sum(c_bigram) AS c_start
    FROM cb GROUP BY 1
  ), v AS (
    SELECT count(DISTINCT tok) AS v
    FROM (SELECT unnest(toks) AS tok FROM t)
  ), inst AS (
    SELECT doc_id, bigram, split_part(bigram, ' ', 1) AS w1 FROM bg
  ), sc AS (
    SELECT i.doc_id, count(*) AS n_bigrams,
           avg(ln((COALESCE(cb.c_bigram, 0) + 1.0)
                  / (COALESCE(cs.c_start, 0) + 1.0 * v.v))) AS lp
    FROM inst i
    LEFT JOIN cb USING (bigram)
    LEFT JOIN cs USING (w1)
    CROSS JOIN v
    GROUP BY i.doc_id
  ), n AS (
    SELECT doc_id, len(toks) AS n_tokens FROM t
  )
"""

SQL_PERPLEXITY_BUCKETS = (
    "WITH " + _SQL_LM_DOC_SCORES.format(toks=DUCK_TOKS) + """
, ranked AS (
  SELECT CAST(n.doc_id AS BIGINT) AS doc_id, n.n_tokens,
         round(sc.lp, 2) AS lp,
         NTILE(3) OVER (ORDER BY round(sc.lp, 2) DESC, n.doc_id) AS bucket
  FROM n LEFT JOIN sc USING (doc_id)
)
SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(lp) AS min_lp, MAX(lp) AS max_lp
FROM ranked GROUP BY bucket ORDER BY bucket
"""
)


# ---------------------------------------------------------------------------
# dsir_select — Data Selection with Importance Resampling (hashed n-gram
# log-ratio scoring vs an in-corpus target; deterministic top-fraction)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096
_DSIR_FRAC = 0.2


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text import dsir as DS

    d = _documents(spark, sf_dir).select("doc_id", "text", "lang")
    out = DS.dsir_select(
        d,
        is_target=F.col("lang") == "en",
        keep_frac=_DSIR_FRAC,
        n_buckets=_DSIR_BUCKETS,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "weight",
        F.col("selected").cast("long").alias("selected"),
    ).orderBy("doc_id")


SQL_DSIR_SELECT = f"""
WITH tok AS (
  SELECT doc_id, unnest({DUCK_TOKS}) AS term,
         CAST(lang = 'en' AS INT) AS is_t
  FROM documents
), bt AS (
  SELECT doc_id,
         CAST({DUCK_H60.format(s='term')} % {_DSIR_BUCKETS} AS INT) AS bucket,
         is_t
  FROM tok
), counts AS (
  SELECT bucket, count(*) AS c_raw, sum(is_t) AS c_tgt FROM bt GROUP BY bucket
), tot AS (
  SELECT count(*) AS n_raw, sum(is_t) AS n_tgt FROM bt
), lr AS (
  SELECT bucket,
         ln((c_tgt + 1.0) / (n_tgt + {_DSIR_BUCKETS}.0))
           - ln((c_raw + 1.0) / (n_raw + {_DSIR_BUCKETS}.0)) AS log_ratio
  FROM counts CROSS JOIN tot
), sc AS (
  SELECT b.doc_id, count(*) AS n_tokens,
         round(avg(log_ratio), 2) AS weight
  FROM bt b JOIN lr USING (bucket) GROUP BY b.doc_id
), n AS (
  SELECT count(*) AS n_docs FROM documents
), rk AS (
  SELECT doc_id, n_tokens, weight,
         row_number() OVER (ORDER BY weight DESC, doc_id) AS rk,
         n_docs
  FROM sc CROSS JOIN n
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       weight,
       CAST(rk <= ceil(n_docs * {_DSIR_FRAC}) AS BIGINT) AS selected
FROM rk ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# nb_langid_train — multinomial Naive Bayes over hashed unigrams, trained
# in-engine on an 80% doc_id split, scored on the 20% holdout
# (text/classifier.py — the CCNet/fastText quality-router shape; both the
# TRAINING aggregation and the scoring argmax have exact SQL twins)
# ---------------------------------------------------------------------------

_NB_BUCKETS = 262_144
_NB_ALPHA = 1.0


def q_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text.classifier import nb_score, nb_train

    d = _documents(spark, sf_dir).select("doc_id", "text", "lang")
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter(F.col("doc_id") % 5 == 0)
    model, labels = nb_train(
        train, "text", "lang", n_buckets=_NB_BUCKETS, alpha=_NB_ALPHA
    )
    pred = nb_score(
        test, model, labels, "doc_id", "text",
        label_col="lang_m", n_buckets=_NB_BUCKETS,
    )
    out = test.select("doc_id", "lang").join(pred, "doc_id")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").alias("true_lang"),
        F.col("pred").alias("pred_lang"),
        (F.col("pred") == F.col("lang")).cast("long").alias("correct"),
        F.floor(F.col("score") * 1000 + F.lit(0.5)).cast("long").alias("score_e3"),
    ).orderBy("doc_id")


SQL_NB_LANGID = f"""
WITH train AS (
  SELECT lang, {DUCK_TOKS} AS toks FROM documents WHERE doc_id % 5 <> 0
), test AS (
  SELECT doc_id, lang, {DUCK_TOKS} AS toks FROM documents WHERE doc_id % 5 = 0
), tf AS (
  SELECT lang, {DUCK_H60.format(s='t.tok')} % {_NB_BUCKETS} AS feat
  FROM train, UNNEST(toks) AS t(tok)
), counts AS (
  SELECT lang, feat, COUNT(*) AS c FROM tf GROUP BY 1, 2
), label_tokens AS (
  SELECT lang, SUM(c) AS tot FROM counts GROUP BY 1
), model AS (
  SELECT c.lang, c.feat,
         ln((c.c + {_NB_ALPHA}) / (lt.tot + {_NB_ALPHA} * {_NB_BUCKETS})) AS ll
  FROM counts c JOIN label_tokens lt USING (lang)
), labels AS (
  SELECT nd.lang,
         ln(nd.nd * 1.0 / (SELECT COUNT(*) FROM train)) AS prior,
         ln({_NB_ALPHA} / (lt.tot + {_NB_ALPHA} * {_NB_BUCKETS})) AS default_ll
  FROM (SELECT lang, COUNT(*) AS nd FROM train GROUP BY 1) nd
  JOIN label_tokens lt USING (lang)
), ttf AS (
  SELECT doc_id, {DUCK_H60.format(s='t.tok')} % {_NB_BUCKETS} AS feat
  FROM test, UNNEST(toks) AS t(tok)
), scored AS (
  SELECT ttf.doc_id, lb.lang AS lang_m,
         any_value(lb.prior) + SUM(coalesce(m.ll, lb.default_ll)) AS score
  FROM ttf CROSS JOIN labels lb
  LEFT JOIN model m ON m.lang = lb.lang AND m.feat = ttf.feat
  GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY round(score, 6) DESC, lang_m ASC
  ) AS rk
  FROM scored
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       t.lang AS true_lang,
       r.lang_m AS pred_lang,
       CAST(r.lang_m = t.lang AS BIGINT) AS correct,
       CAST(floor(r.score * 1000 + 0.5) AS BIGINT) AS score_e3
FROM ranked r JOIN test t USING (doc_id)
WHERE r.rk = 1 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# langid_rank_profile — Cavnar–Trenkle rank-order n-gram language ID
# ---------------------------------------------------------------------------
# Train per-language top-K char-trigram profiles in-engine, classify the
# same corpus by out-of-place distance (text/rankprofile.py).  Fully
# declarative -> full DuckDB twin; complements nb_langid_train with the
# vocabulary-free char-n-gram classifier shape.

_CT_N, _CT_K, _CT_KDOC = 3, 40, 20


def q_langid_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.text import rankprofile as RP

    d = _documents(spark, sf_dir).select("doc_id", "lang", "text")
    profiles = RP.ct_train_profiles(
        d, text_col="text", label_col="lang", n=_CT_N, k=_CT_K
    )
    pred = RP.ct_classify(
        d, profiles, id_col="doc_id", text_col="text",
        label_col="lang", n=_CT_N, k_doc=_CT_KDOC,
    )
    return (
        pred.join(d.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "pred_lang",
            "dist",
            "true_lang",
            (F.col("pred_lang") == F.col("true_lang"))
            .cast("long").alias("is_correct"),
        )
        .orderBy("doc_id")
    )


_CT_GRAMS = (
    "unnest(list_transform("
    "generate_series(1, greatest(length(trim(text)) - {nm1}, 0)), "
    "i -> substr(trim(text), i, {n})))"
).format(nm1=_CT_N - 1, n=_CT_N)

SQL_LANGID_RANK_PROFILE = f"""
WITH g AS (
  SELECT lang, {_CT_GRAMS} AS ngram FROM documents
), lc AS (
  SELECT lang, ngram, count(*) AS c FROM g GROUP BY 1, 2
), lp AS (
  SELECT lang, ngram, rank FROM (
    SELECT lang, ngram,
           row_number() OVER (PARTITION BY lang ORDER BY c DESC, ngram ASC)
             AS rank
    FROM lc
  ) WHERE rank <= {_CT_K}
), pen AS (
  SELECT max(rank) AS p FROM lp
), dg AS (
  SELECT doc_id, {_CT_GRAMS} AS ngram FROM documents
), dc AS (
  SELECT doc_id, ngram, count(*) AS c FROM dg GROUP BY 1, 2
), dp AS (
  SELECT doc_id, ngram, d_rank FROM (
    SELECT doc_id, ngram,
           row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, ngram ASC)
             AS d_rank
    FROM dc
  ) WHERE d_rank <= {_CT_KDOC}
), langs AS (
  SELECT DISTINCT lang FROM lp
), dist AS (
  SELECT dp.doc_id, l.lang,
         CAST(sum(COALESCE(abs(dp.d_rank - lp.rank), pen.p)) AS BIGINT)
           AS dist
  FROM dp CROSS JOIN langs l
  LEFT JOIN lp ON lp.lang = l.lang AND lp.ngram = dp.ngram
  CROSS JOIN pen
  GROUP BY 1, 2
), best AS (
  SELECT doc_id, lang AS pred_lang, dist,
         row_number() OVER (PARTITION BY doc_id ORDER BY dist ASC, lang ASC)
           AS rn
  FROM dist
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id, b.pred_lang, b.dist,
       d.lang AS true_lang,
       CAST(b.pred_lang = d.lang AS BIGINT) AS is_correct
FROM best b JOIN documents d USING (doc_id)
WHERE rn = 1 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# domain_pagerank — PageRank over the crawl-order domain graph
# ---------------------------------------------------------------------------
# Edges: domain(doc) -> domain(next doc_id in the same lang) — the
# deterministic "crawl frontier" link graph the synthetic corpus admits.
# Fixed 10-iteration power method with dangling-mass redistribution
# (text/graph.py::pagerank); the DuckDB twin unrolls the identical
# iteration chain, so agreement checks the algebra, not shared code.
# Ranks emitted floor-scaled (sums of float shares are order-dependent).

_PR_D, _PR_ITER = 0.85, 10


def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "lang", "source")
    w = Window.partitionBy("lang").orderBy("doc_id")
    edges = (
        d.withColumn("_nxt", F.lead("source").over(w))
        .filter(F.col("_nxt").isNotNull())
        .select(F.col("source").alias("src"), F.col("_nxt").alias("dst"))
    )
    ranks = GR.pagerank(
        edges, "src", "dst", damping=_PR_D, n_iter=_PR_ITER
    )
    return ranks.select(
        "node",
        F.floor(F.col("rank") * 1_000_000 + F.lit(0.31830988618367))
        .cast("long").alias("rank_e6"),
    ).orderBy("node")


def _sql_pagerank() -> str:
    # AS MATERIALIZED is load-bearing: each iteration references its
    # predecessor 3x (contrib join, dangling subquery, node scan) — with
    # DuckDB's default CTE INLINING the 10-level chain explodes to 3^10
    # evaluations of the base case and never finishes.
    its = []
    prev = "r0"
    for i in range(1, _PR_ITER + 1):
        its.append(f"""r{i} AS MATERIALIZED (
  SELECT n.node,
         (1 - {_PR_D}) / nn.n
         + {_PR_D} * (COALESCE(c.inc, 0)
                      + (SELECT COALESCE(sum(r.rank), 0) FROM {prev} r
                         LEFT JOIN outdeg o ON o.src = r.node
                         WHERE o.src IS NULL) / nn.n) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / o.deg) AS inc
    FROM {prev} r JOIN outdeg o ON o.src = r.node
    JOIN edges e ON e.src = r.node
    GROUP BY e.dst
  ) c ON c.node = n.node
)""")
        prev = f"r{i}"
    chain = ",\n".join(its)
    return f"""
WITH edges AS (
  SELECT source AS src,
         lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS dst
  FROM documents
  QUALIFY dst IS NOT NULL
), outdeg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY 1
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), nn AS (
  SELECT count(*) AS n FROM nodes
), r0 AS MATERIALIZED (
  SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn
),
{chain}
SELECT node,
       CAST(floor(rank * 1000000 + 0.31830988618367) AS BIGINT) AS rank_e6
FROM {prev} ORDER BY node
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "nb_langid_train": q_nb_langid,
    "langid_rank_profile": q_langid_rank_profile,
    "domain_pagerank": q_domain_pagerank,
    "bpe_token_stats": q_bpe_token_stats,
    "perplexity_buckets": q_perplexity_buckets,
    "dedup_clusters": q_dedup_clusters,
    "line_dedup": q_line_dedup,
    "domain_cap": q_domain_cap,
    "lm_bigram_score": q_lm_bigram_score,
    "tfidf_topk": q_tfidf_topk,
    "bm25_topk": q_bm25_topk,
    "dsir_select": q_dsir_select,
    "repeated_spans": q_repeated_spans,
    "curation_pipeline": q_curation_pipeline,
}

ORACLE_SQL: dict[str, str] = {
    "nb_langid_train": SQL_NB_LANGID,
    "langid_rank_profile": SQL_LANGID_RANK_PROFILE,
    "domain_pagerank": _sql_pagerank(),
    "perplexity_buckets": SQL_PERPLEXITY_BUCKETS,
    "curation_pipeline": SQL_CURATION_PIPELINE,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "line_dedup": SQL_LINE_DEDUP,
    "domain_cap": SQL_DOMAIN_CAP,
    "lm_bigram_score": SQL_LM_BIGRAM_SCORE,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "bm25_topk": SQL_BM25_TOPK,
    "dsir_select": SQL_DSIR_SELECT,
    "repeated_spans": SQL_REPEATED_SPANS,
}
