"""WARC source: round-trip byte-identity (plain + per-record gzip), the
north-rule extraction invariant on WARC-ingested pages, and malformed-
record tolerance."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from diive_spark.sources.warc import (
    build_warc_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)

PAGES = [
    ("https://example.com/a", "2024-01-01T00:00:00Z", b"<html><body>Alpha &amp; beta</body></html>"),
    ("https://example.com/b", "2024-01-01T00:30:00Z", b"<html><body>Second page</body></html>"),
    ("https://example.org/c", "2024-01-02T12:00:00Z", b"\x00\xffbinary-ish payload\x01"),
]


def test_roundtrip_plain(tmp_path):
    p = str(tmp_path / "f.warc")
    write_warc(p, PAGES)
    recs = list(parse_warc_bytes(open(p, "rb").read()))
    assert [(r["url"], r["warc_ts"], r["html"]) for r in recs] == PAGES
    assert all(r["http_status"] == 200 for r in recs)


def test_roundtrip_gzip_members(tmp_path):
    p = str(tmp_path / "f.warc.gz")
    write_warc(p, PAGES, per_record_gzip=True)
    blob = open(p, "rb").read()
    # it really is a multi-member gzip: naive gzip.decompress sees all
    # members too, but the file must start with magic and parse fully
    assert blob[:2] == b"\x1f\x8b"
    recs = list(parse_warc_bytes(blob))
    assert [(r["url"], r["html"]) for r in recs] == [
        (u, h) for u, _, h in PAGES
    ]


def test_read_warc_spark(spark, tmp_path):
    write_warc(str(tmp_path / "a.warc"), PAGES[:2])
    write_warc(str(tmp_path / "b.warc.gz"), PAGES[2:], per_record_gzip=True)
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = {r.url: r for r in df.collect()}
    assert len(rows) == 3
    for url, ts, payload in PAGES:
        assert bytes(rows[url].html) == payload  # byte-identical payload
    # warc_ts parsed to a real timestamp
    got = df.select(
        F.min(F.unix_micros(F.col("warc_ts").cast("timestamp"))).alias("m")
    ).collect()[0].m
    assert got == 1704067200 * 1_000_000


def test_non_response_records_filtered(spark, tmp_path):
    p = str(tmp_path / "m.warc")
    rec_resp = build_warc_record(*("https://x/1", "2024-01-01T00:00:00Z", b"<p>hi</p>"))
    rec_req = build_warc_record(
        "https://x/1", "2024-01-01T00:00:00Z", b"GET / HTTP/1.1",
        warc_type="request",
    )
    open(p, "wb").write(rec_req + rec_resp)
    df = read_warc(spark, p)
    assert df.count() == 1
    assert df.collect()[0].warc_type == "response"


def test_truncated_tail_ignored(tmp_path):
    rec = build_warc_record("https://x/1", "2024-01-01T00:00:00Z", b"<p>ok</p>")
    blob = rec + b"WARC/1.0\r\nWARC-Type: resp"  # truncated header
    recs = list(parse_warc_bytes(blob))
    assert len(recs) == 1 and recs[0]["html"] == b"<p>ok</p>"
