"""In-engine BPE tokenizer training and encoding.

A training-data pipeline needs token counts from the tokenizer that will
actually be used — whitespace counts (text/analysis.py) are a proxy.  This
module trains a byte-pair-encoding vocabulary (Sennrich et al. 2016) AS
DataFrame JOBS and applies it with an Arrow-batched greedy encoder, so
``shard_pack`` budgets can use real subword counts.

Scale design — the standard word-frequency factoring: BPE statistics only
depend on the corpus through the (distinct word, frequency) table, which
is orders of magnitude smaller than the corpus (Heaps' law), so
  * ONE corpus scan builds the word-freq table (map-side-combinable agg);
  * each merge iteration runs on the word table only: explode adjacent
    symbol pairs weighted by freq -> groupBy sum -> argmax.  The single
    driver round-trip per iteration is ONE row — the chosen pair, which
    IS the model artifact being built;
  * the merge rewrite is per-word sequential by definition (BPE's scan
    order is the spec), so it runs as an Arrow kernel over the word
    table, never over the corpus;
  * encoding memoizes per distinct word within each Arrow batch — natural
    text re-uses words heavily, so the greedy merge loop runs once per
    distinct word, not once per token.

Determinism: argmax tie-breaks on (freq desc, left asc, right asc), so
the merge list is reproducible at any parallelism (pinned in pytest
against an independent pure-Python BPE on the Sennrich corpus).

Reference analog: none in diive (no tokenizer); the training loop follows
the published algorithm only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_freqs", "bpe_train", "bpe_encode_counts"]

END = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the only corpus scan BPE
    training performs."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


_MERGE_UDF = None


def _merge_pair_udf():
    """Rewrite one (left, right) -> left+right merge across symbol arrays.
    The pair to merge arrives per-row (same literal for all rows) so one
    UDF object serves every iteration."""
    global _MERGE_UDF
    if _MERGE_UDF is None:

        @F.pandas_udf("array<string>")
        def _merge(
            syms: pd.Series, left: pd.Series, right: pd.Series
        ) -> pd.Series:
            out = []
            for s, a, b in zip(syms, left, right):
                s = list(s)
                merged, i, n = [], 0, len(s)
                while i < n:
                    if i + 1 < n and s[i] == a and s[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(s[i])
                        i += 1
                out.append(merged)
            return pd.Series(out)

        _MERGE_UDF = _merge.asNondeterministic()
    return _MERGE_UDF


def _train_on_counts(
    wf: list[tuple[str, int]], num_merges: int, min_freq: int
) -> list[tuple[str, str, int]]:
    """The merge loop on a collected (word, freq) list — identical
    semantics to the DataFrame loop (same tie-break, same full-pass
    rewrite, same min_freq stop), pinned equal in pytest."""
    states: list[tuple[list[str], int]] = [
        (list(w) + [END], f) for w, f in wf
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in states:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # argmax with (freq desc, left asc, right asc) tie-break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_freq:
            break
        merges.append((l, r, c))
        for idx, (syms, f) in enumerate(states):
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            states[idx] = (out, f)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_freq: int = 2,
    state_partitions: int | None = None,
    driver_vocab_threshold: int = 1_000_000,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right, freq), ...]
    in rank order.  Stops early when the best pair's frequency drops
    below ``min_freq``.

    Symbols start as characters plus a terminal ``</w>`` marker (the
    original word-boundary variant), so decoding is unambiguous.

    ``state_partitions`` right-sizes the iterated word table: each merge
    round re-materializes it, so its partition count (not the corpus's)
    sets the per-round task overhead.  Natural-language vocabularies are
    tiny next to their corpora — a 31-word fixture belongs on 1
    partition, a crawl vocabulary on a few hundred.
    """
    wf = word_freqs(df, text_col)
    # Vocabulary cutover — BPE statistics depend on the corpus ONLY
    # through this table, which Heaps' law keeps vocabulary-bounded (a
    # full crawl's distinct-word table is ~10^7 rows), so below the
    # threshold the merge loop runs driver-side on the collected counts
    # (what single-node BPE trainers do after the same word-count pass)
    # instead of paying per-round job latency.  The DataFrame loop below
    # remains the overflow path and stays pinned equal in pytest
    # (driver_vocab_threshold=0 forces it).
    n_vocab = wf.count()
    if n_vocab <= driver_vocab_threshold:
        rows = wf.collect()
        return _train_on_counts(
            [(r["word"], int(r["freq"])) for r in rows],
            num_merges, min_freq,
        )
    if state_partitions:
        wf = wf.repartition(state_partitions)
    state = wf.select(
        "word",
        "freq",
        F.concat(F.split("word", ""), F.array(F.lit(END))).alias("syms"),
    ).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        # guard the fully-merged single-symbol case: Spark's sequence(1, 0)
        # DESCENDS ([1, 0]) and element_at(0) is an error, so words reduced
        # to one symbol must yield an empty pair array, not a range
        idx = F.when(
            F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = state.select(
            "freq",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("l"),
                        F.element_at("syms", i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_freq:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((l, r, c))
        state = state.select(
            "word",
            "freq",
            _merge_pair_udf()(
                F.col("syms"), F.lit(l), F.lit(r)
            ).alias("syms"),
            # lazy: next iteration's pair-count job materializes it —
            # eager checkpointing costs one extra job per merge
        ).localCheckpoint(eager=False)
    return merges


_ENCODE_UDFS: dict = {}


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Greedy BPE encode (lowest-rank pair first, the standard apply
    algorithm) and emit the subword count per document.  The merge table
    is closed over by the kernel (broadcast-sized by construction);
    per-batch word memoization makes the cost ~O(distinct words)."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    key = id(tuple(ranks))
    if key not in _ENCODE_UDFS:
        import re

        ws = re.compile(r"\s+").split

        def encode_word(w: str) -> int:
            syms = list(w) + [END]
            while len(syms) > 1:
                cand = [
                    (ranks[(a, b)], i)
                    for i, (a, b) in enumerate(zip(syms, syms[1:]))
                    if (a, b) in ranks
                ]
                if not cand:
                    break
                rank, i = min(cand)
                # merge EVERY occurrence of this pair (same as training's
                # full-pass rewrite), lowest rank first
                a, b = merges[rank][0], merges[rank][1]
                out, j, n = [], 0, len(syms)
                while j < n:
                    if j + 1 < n and syms[j] == a and syms[j + 1] == b:
                        out.append(a + b)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                syms = out
            return len(syms)

        @F.pandas_udf("long")
        def _enc(texts: pd.Series) -> pd.Series:
            memo: dict[str, int] = {}
            out = []
            for t in texts:
                total = 0
                for w in ws((t or "").strip(" ")):
                    if not w:
                        continue
                    v = memo.get(w)
                    if v is None:
                        v = encode_word(w)
                        memo[w] = v
                    total += v
                out.append(total)
            return pd.Series(out, dtype="int64")

        _ENCODE_UDFS[key] = _enc.asNondeterministic()
    return df.withColumn(out_col, _ENCODE_UDFS[key](F.col(text_col)))
