"""Bloom-filter decontamination — broadcast-bitmap membership at scale.

The exact-set decontamination (`text/curation.py::decontaminate_ngram`)
broadcasts the benchmark's DISTINCT shingle-hash set; at very large
benchmark unions (every eval suite ever shipped) even the distinct hash
set outgrows a comfortable broadcast.  The classic fix (Bloom 1970;
Broder & Mitzenmacher, "Network Applications of Bloom Filters", 2004) is
a bit-array: m bits, k hash probes per element — the benchmark reduces
to m/8 BYTES regardless of cardinality, membership has zero false
negatives, and the false-positive rate is (1 - e^{-kn/m})^k.

Engine-portable by construction: probes use Kirsch–Mitzenmacher double
hashing (h1 + i*h2 mod m, "Less Hashing, Same Performance", ESA 2006)
over the repo's portable 60-bit shingle hash (text/hashing.py), i.e.
pure integer arithmetic that Spark, numpy and DuckDB reproduce
bit-identically — so even the false positives match the SQL oracle
exactly.

Scale shape:
 * build — explode distinct benchmark shingle hashes to (word_idx, bit)
   and ``bit_or`` them per 32-bit word: a combinable aggregate, one
   shuffle of at most m/32 rows.
 * probe — the bitmap (m/8 bytes) rides into a lazy ``pandas_udf`` as a
   closure numpy array; the corpus is scanned ONCE with no explode, no
   join and no shuffle — per-doc output only.

Word width is 32 bits stored in BIGINT so every mask stays positive in
both engines (bit 63 would flip BIGINT's sign and DuckDB raises on
<<63 overflow).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_positions",
    "bloom_words",
    "bloom_bitmap",
    "bloom_probe",
    "bloom_decontaminate",
]

_UDFS: dict = {}


def bloom_positions(h: Column, m_bits: int, k_hashes: int) -> Column:
    """array<bigint> of the k probe positions for one 60-bit hash column.

    Kirsch–Mitzenmacher: pos_i = (h1 + i * h2) mod m with
    h1 = h mod m, h2 = (h >> 30) | 1 (odd => full-cycle stride).
    """
    h1 = F.pmod(h, F.lit(m_bits))
    h2 = F.shiftright(h, 30).bitwiseOR(F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k_hashes - 1)),
        lambda i: F.pmod(h1 + i * h2, F.lit(m_bits)),
    )


def bloom_words(
    hashes: DataFrame,
    hash_col: str,
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """(word_idx, word) bitmap words from a DataFrame of element hashes.

    Combinable: bit_or partial-aggregates map-side; output is at most
    m_bits/32 rows no matter how large the input.  Unions of filters
    built with the same (m, k) are just ``unionAll`` + the same agg.
    """
    pos = F.explode(
        bloom_positions(F.col(hash_col), m_bits, k_hashes)
    ).alias("pos")
    return (
        hashes.select(pos)
        .select(
            F.shiftright("pos", 5).alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos & 31 as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def bloom_bitmap(words: DataFrame, m_bits: int) -> np.ndarray:
    """Collect the words table into a dense int64 numpy bitmap.

    The collect is bounded by construction: m_bits/32 rows (m = 2^20 =>
    32k rows, 256 KB) — the documented driver-cutover contract, same
    class as the IVF centroid collect."""
    n_words = (m_bits + 31) // 32
    arr = np.zeros(n_words, dtype=np.int64)
    for r in words.collect():
        arr[int(r["word_idx"])] = int(r["word"])
    return arr


def bloom_probe(
    df: DataFrame,
    hashes_col: str,
    bitmap: np.ndarray,
    m_bits: int,
    k_hashes: int,
    out_col: str = "n_maybe",
) -> DataFrame:
    """Count, per row, how many hashes in ``hashes_col`` (array<bigint>)
    test positive against the bitmap.  Zero-shuffle: one Arrow batch
    pass with the bitmap as a task closure."""
    key = (id(bitmap), m_bits, k_hashes, hashes_col)
    if key not in _UDFS:
        bm = bitmap  # closure capture; ships once per task via pickle

        @F.pandas_udf("long")
        def _probe(arrs: pd.Series) -> pd.Series:
            out = np.zeros(len(arrs), dtype=np.int64)
            ks = np.arange(k_hashes, dtype=np.int64)
            for i, a in enumerate(arrs):
                if a is None or len(a) == 0:
                    continue
                h = np.asarray(a, dtype=np.int64)
                h1 = h % m_bits
                h2 = (h >> 30) | 1
                pos = (h1[:, None] + ks[None, :] * h2[:, None]) % m_bits
                bits = (bm[pos >> 5] >> (pos & 31)) & 1
                out[i] = int(np.all(bits == 1, axis=1).sum())
            return pd.Series(out)

        _UDFS[key] = _probe
    return df.withColumn(out_col, _UDFS[key](F.col(hashes_col)))


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    min_hits: int = 1,
) -> DataFrame:
    """Bloom twin of ``decontaminate_ngram``: flag corpus docs whose
    distinct word k-grams probably intersect the benchmark's.

    Superset guarantee (no false negatives): every exactly-contaminated
    doc is flagged; additionally ~FPR of clean grams flag spuriously —
    the deliberate trade for an O(m)-byte benchmark summary.  Output:
    (doc_id, n_shingles, n_maybe, contaminated)."""
    from diive_spark.text.dedup import with_hashed_shingles

    bench_h = (
        with_hashed_shingles(
            benchmark.select(text_col), text_col=text_col, k=k, out_col="_bh"
        )
        .select(F.explode("_bh").alias("_h"))
        .distinct()
    )
    words = bloom_words(bench_h, "_h", m_bits, k_hashes)
    bitmap = bloom_bitmap(words, m_bits)
    corp = with_hashed_shingles(
        corpus.select(id_col, text_col), text_col=text_col, k=k, out_col="_sh"
    )
    probed = bloom_probe(corp, "_sh", bitmap, m_bits, k_hashes)
    return probed.select(
        F.col(id_col),
        F.size("_sh").cast("long").alias("n_shingles"),
        F.col("n_maybe"),
        (F.col("n_maybe") >= min_hits).cast("int").alias("contaminated"),
    )
