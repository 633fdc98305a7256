"""HTML -> text extraction (the BASELINE.json input_hint per-row
invariant: extracted text must be byte-identical per (url, warc_ts)).

Pure column expressions — ``decode`` + a deterministic ``regexp_replace``
chain — so extraction is JVM-side, codegen'd, and bit-stable across
executors/retries (no Python in the path). The chain:

  1. drop <script>/<style> blocks (content is not text),
  2. strip all remaining tags,
  3. unescape the five standard XML entities,
  4. collapse runs of whitespace to single spaces and trim.

Determinism note: every step is a pure function of the input bytes, so the
same html always yields the same text on any executor — which is what
makes the per-url invariant checkable with a simple equality."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_RE = r"(?is)<(script|style)\b[^>]*>.*?</\1>"
_TAG_RE = r"(?s)<[^>]*>"


def html_to_text(html_col: Column | str, binary: bool = True) -> Column:
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    s = F.decode(c, "UTF-8") if binary else c
    s = F.regexp_replace(s, _BLOCK_RE, " ")
    s = F.regexp_replace(s, _TAG_RE, " ")
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; doesn't double-unescape
    ]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return s


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text_extracted",
    binary: bool = True,
) -> DataFrame:
    return df.withColumn(out_col, html_to_text(html_col, binary=binary))


def verify_extraction(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    binary: bool = True,
) -> DataFrame:
    """Adds ``extract_ok`` = 1 iff re-extracted text is byte-identical to
    the stored text column (the north-rule correctness invariant)."""
    ext = html_to_text(html_col, binary=binary)
    return df.withColumn(
        "extract_ok", (ext == F.col(text_col)).cast("int")
    ).withColumn("n_chars_extracted", F.length(ext).cast("long"))
