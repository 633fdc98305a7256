"""Deterministic synthetic Common-Crawl-style `pages` table (FIXTURES.md F1)
and the derived per-url numeric `series` (F2).

Schema mandated by BASELINE.json input_hint:
    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Two generators:
  * :func:`synth_pages_pdf` — pandas, seeded; small scales for exact-match
    unit tests (the pandas oracle runs on the same frame).
  * :func:`synth_pages_df` — fully distributed via ``spark.range`` +
    deterministic hash-based pseudo-randomness; no driver materialization,
    used for bench-scale inputs (scales to any row count).

Both inject the per-FIXTURES irregularities: duplicate timestamps (~0.5%,
dedup keep-last, /root/reference/diive/core/times/times.py:804-821), NaN
gap runs (gap-limit logic
/root/reference/diive/pkgs/analyses/gapfinder.py:105-117), point spikes
(z-score outliers), and Zipf-skewed url popularity (exercises salting).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "und"]
_WORDS = [
    "the", "data", "page", "crawl", "web", "index", "archive", "spark",
    "roll", "series", "time", "value", "sensor", "flux", "site", "text",
]


def page_text(url: str, epoch_s: int) -> str:
    """Deterministic page text for (url, warc_ts) — the per-row invariant:
    extraction must return these bytes exactly (BASELINE.json input_hint)."""
    h = (hash_u64(f"{url}|{epoch_s}")) % (2**32)
    rng = np.random.RandomState(h)
    n = 8 + int(rng.randint(0, 24))
    words = [_WORDS[i] for i in rng.randint(0, len(_WORDS), n)]
    return " ".join(words)


def hash_u64(s: str) -> int:
    """Stable 64-bit FNV-1a hash (no Python ``hash`` — it is salted)."""
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def synth_pages_pdf(
    n_urls: int = 20,
    n_records: int = 200,
    freq_seconds: int = 1800,
    seed: int = 42,
    start: str = "2024-01-01 00:30:00",
) -> pd.DataFrame:
    """pandas pages frame: per-url regular END-labeled grid with injected
    duplicates, dropped records (gaps), spikes, and missing values."""
    rng = np.random.RandomState(seed)
    rows = []
    t0 = pd.Timestamp(start)
    for u in range(n_urls):
        url = f"https://site{u % max(1, n_urls // 4):04d}.example/p{u:03d}"
        base = 100.0 + 10.0 * (u + 1)
        ts = t0 + pd.to_timedelta(np.arange(n_records) * freq_seconds, unit="s")
        value = base + 5.0 * np.sin(np.arange(n_records) / 7.0) + rng.normal(0, 1.0, n_records)
        # point spikes (z-score outliers)
        spike_ix = rng.choice(n_records, size=max(1, n_records // 50), replace=False)
        value[spike_ix] += rng.choice([-1, 1], size=len(spike_ix)) * 60.0
        # NaN gap runs of length 1..6
        ngaps = max(1, n_records // 40)
        for _ in range(ngaps):
            g0 = rng.randint(0, n_records - 7)
            glen = rng.randint(1, 7)
            value[g0 : g0 + glen] = np.nan
        for i in range(n_records):
            epoch = int(ts[i].timestamp())
            txt = page_text(url, epoch)
            rows.append(
                (
                    url,
                    ts[i],
                    f"<html><body>{txt}</body></html>".encode(),
                    txt,
                    LANGS[int(hash_u64(url)) % len(LANGS)],
                    float(value[i]),  # NaN -> Spark null via Arrow
                )
            )
        # ~0.5% duplicated timestamps (keep-last must win)
        ndup = max(1, n_records // 200)
        dup_ix = rng.choice(n_records, size=ndup, replace=False)
        for i in dup_ix:
            epoch = int(ts[i].timestamp())
            txt = page_text(url, epoch)
            rows.append(
                (
                    url,
                    ts[i],
                    f"<html><body>{txt}</body></html>".encode(),
                    txt,
                    LANGS[int(hash_u64(url)) % len(LANGS)],
                    -999.0,  # sentinel: dedup keep-last must discard this? no —
                    # appended after, so keep-LAST keeps THIS row; tests account for it
                )
            )
    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang", "value"]
    )
    # shuffle row order (out-of-order arrival); keep a file-order column so
    # "last occurrence" stays well-defined like pandas keep='last'
    pdf["ingest_seq"] = np.arange(len(pdf), dtype=np.int64)
    return pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def pages_to_series_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Derive the long-format numeric series (F2): one row per
    (url, ts, value); dedup keep-last on ingest order, like
    ``remove_index_duplicates(keep='last')``."""
    d = pdf.sort_values("ingest_seq").drop_duplicates(
        subset=["url", "warc_ts"], keep="last"
    )
    return (
        d[["url", "warc_ts", "value"]]
        .rename(columns={"warc_ts": "ts"})
        .sort_values(["url", "ts"])
        .reset_index(drop=True)
    )


def synth_pages_df(
    spark: SparkSession,
    n_urls: int = 1000,
    n_records: int = 1000,
    freq_seconds: int = 60,
    zipf_hot_fraction: float = 0.01,
    hot_multiplier: int = 50,
    start: str = "2024-01-01 00:01:00",
    with_payload: bool = False,
) -> DataFrame:
    """Distributed deterministic pages/series generator.

    One row per (url, record); a ``zipf_hot_fraction`` of urls get
    ``hot_multiplier``× more records (key skew). Values carry deterministic
    noise + spikes + nulls derived from ``xxhash64`` — no RNG state, so any
    executor regenerates identical data (idempotent across retries).
    """
    n_hot = max(1, int(n_urls * zipf_hot_fraction))
    urls = spark.range(n_urls).select(
        F.concat(
            F.lit("https://site"),
            F.lpad((F.col("id") % (n_urls // 4 + 1)).cast("string"), 4, "0"),
            F.lit(".example/p"),
            F.lpad(F.col("id").cast("string"), 5, "0"),
        ).alias("url"),
        F.when(F.col("id") < n_hot, F.lit(hot_multiplier))
        .otherwise(F.lit(1))
        .alias("mult"),
        F.col("id").alias("uid"),
    )
    recs = urls.select(
        "url",
        "uid",
        F.explode(F.sequence(F.lit(0), F.col("mult") * n_records - 1)).alias("i"),
    )
    h = F.xxhash64("url", "i")
    noise = (F.pmod(h, 10000) / 10000.0 - 0.5) * 2.0
    spike = F.when(F.pmod(F.xxhash64("url", "i", F.lit(1)), 50) == 0, F.lit(60.0)).otherwise(
        F.lit(0.0)
    )
    isnull = F.pmod(F.xxhash64("url", "i", F.lit(2)), 25) == 0
    base = 100.0 + (F.col("uid") % 37).cast("double")
    value = base + F.sin(F.col("i") / 7.0) * 5.0 + noise + spike
    out = recs.select(
        "url",
        (
            F.to_timestamp(F.lit(start))
            + F.make_interval(secs=(F.col("i") * freq_seconds).cast("double"))
        ).alias("ts"),
        F.when(isnull, F.lit(None).cast("double")).otherwise(value).alias("value"),
    )
    if with_payload:
        txt = F.concat(F.lit("page "), F.col("url"), F.lit(" at "), F.col("ts").cast("string"))
        out = out.withColumn("text", txt).withColumn(
            "html",
            F.encode(F.concat(F.lit("<html><body>"), txt, F.lit("</body></html>")), "UTF-8"),
        ).withColumn(
            "lang", F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(F.xxhash64("url"), 4) + 1).cast("int"))
        )
    return out
