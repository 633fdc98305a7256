"""WARC (Web ARChive, ISO 28500) ingestion — the Common-Crawl wire
format the north rule's page table is loaded FROM.

Spark-first shape: ``spark.read.format("binaryFile")`` gives one row per
WARC file (Common Crawl ships ~1 GB files — a sane Spark partition);
``warc_records`` then parses records inside ``mapInPandas`` so the
per-file byte scan is an Arrow-batched executor-side pass with NOTHING
driver-side.  At 100 TB the plan is: file listing → binaryFile scan →
narrow mapInPandas → (url, warc_ts, html) rows, i.e. zero shuffles until
the first real operator.

Both the plain and the Common-Crawl per-record-gzip-member layouts are
supported with stdlib ``zlib`` only (each record is its own gzip member;
a streaming ``decompressobj`` loop over ``unused_data`` splits members
without materializing more than one record at a time).

No reference analog (diive reads CSVs — `core/io/filereader.py`); this
is part of the web-scale ingestion surface the north rule adds.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CRLF = b"\r\n"

WARC_SCHEMA = (
    "warc_file string, url string, warc_ts string, warc_type string, "
    "record_id string, http_status int, content_type string, html binary"
)


# ---------------------------------------------------------------------------
# writer (synthetic fixtures + round-trip tests)
# ---------------------------------------------------------------------------

def build_warc_record(
    url: str,
    warc_ts: str,
    payload: bytes,
    warc_type: str = "response",
    record_id: str | None = None,
    http_status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """One WARC/1.0 record with an HTTP/1.1 response block, per spec:
    header lines, blank line, payload, two CRLFs."""
    http = (
        f"HTTP/1.1 {http_status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii") + payload
    rid = record_id or f"<urn:uuid:{abs(hash((url, warc_ts))):032x}>"
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: {warc_ts}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    return head + http + CRLF + CRLF


def write_warc(
    path: str,
    pages: list[tuple[str, str, bytes]],
    per_record_gzip: bool = False,
) -> None:
    """Write (url, warc_ts, payload) pages as one WARC file; with
    ``per_record_gzip`` each record is its own gzip member (the Common
    Crawl .warc.gz layout)."""
    with open(path, "wb") as f:
        for url, ts, payload in pages:
            rec = build_warc_record(url, ts, payload)
            if per_record_gzip:
                # mtime pinned -> byte-deterministic fixture files
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(rec)
                rec = buf.getvalue()
            f.write(rec)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _split_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time."""
    rest = blob
    while rest:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        yield d.decompress(rest)
        rest = d.unused_data


def parse_warc_stream(blob: bytes) -> Iterator[dict]:
    """Yield parsed records from raw (uncompressed) WARC bytes."""
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while blob.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        hdr_end = blob.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(CRLF)[1:]:
            k, _, v = line.decode("latin-1").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body = blob[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        status, ctype, payload = None, None, body
        if headers.get("content-type", "").startswith("application/http"):
            http_end = body.find(CRLF + CRLF)
            if http_end >= 0:
                http_lines = body[:http_end].split(CRLF)
                parts = http_lines[0].decode("latin-1").split(" ")
                status = int(parts[1]) if len(parts) > 1 else None
                for line in http_lines[1:]:
                    k, _, v = line.decode("latin-1").partition(":")
                    if k.strip().lower() == "content-type":
                        ctype = v.strip()
                payload = body[http_end + 4 :]
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "http_status": status,
            "content_type": ctype,
            "html": payload,
        }


def parse_warc_bytes(blob: bytes) -> Iterator[dict]:
    """Dispatch plain vs gzip (single- or multi-member) WARC bytes."""
    if blob[:2] == b"\x1f\x8b":
        for member in _split_gzip_members(blob):
            yield from parse_warc_stream(member)
    else:
        yield from parse_warc_stream(blob)


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------

def read_warc(
    spark: SparkSession,
    path: str,
    response_only: bool = True,
) -> DataFrame:
    """WARC files → one row per record.

    binaryFile scan (one task per file — Common Crawl's ~1 GB shards are
    the partition grain) → mapInPandas stdlib parser → typed rows with
    ``warc_ts`` cast to timestamp.  ``response_only`` keeps the records
    that carry page payloads (request/metadata records are WARC
    bookkeeping)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    if response_only and rec["warc_type"] != "response":
                        continue
                    rec["warc_file"] = path_
                    out.append(rec)
            cols = [c.split(" ")[0] for c in WARC_SCHEMA.split(", ")]
            yield pd.DataFrame(out, columns=cols)

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    df = raw.mapInPandas(parse, schema=WARC_SCHEMA)
    from pyspark.sql import functions as F

    return df.withColumn("warc_ts", F.to_timestamp("warc_ts"))
