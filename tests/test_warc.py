"""WARC source: member-per-record gzip walk, header/payload framing, HTTP
split, byte-identical html round-trip through the distributed reader."""

import numpy as np
import pytest

from minhashsketch_spark.sources.warc import (
    _maybe_gunzip,
    parse_warc_records,
    warc_documents,
    write_warc_bytes,
)

PAGES = [
    ("https://a.example/x", "2021-03-04T05:06:07Z",
     b"<html><body>hello &amp; goodbye</body></html>"),
    ("https://b.example/y?q=1", "2021-03-04T05:06:08Z",
     "<html>é中文</html>".encode("utf-8")),
    ("https://c.example/empty", "2021-03-04T05:06:09Z", b""),
]


def test_writer_reader_roundtrip_plain_and_gzip():
    for compress in (False, True):
        buf = write_warc_bytes(PAGES, compress=compress)
        raw = _maybe_gunzip(buf)
        recs = list(parse_warc_records(raw))
        assert [r["headers"]["warc-type"] for r in recs] == \
            ["warcinfo", "response", "response", "response"]
        for (url, ts, html), rec in zip(PAGES, recs[1:]):
            assert rec["headers"]["warc-target-uri"] == url
            assert rec["headers"]["warc-date"] == ts
            body = rec["payload"]
            sep = body.find(b"\r\n\r\n")
            assert body[:5] == b"HTTP/" and body[sep + 4:] == html


def test_writer_is_deterministic():
    assert write_warc_bytes(PAGES) == write_warc_bytes(PAGES)


def test_gzip_members_walk_individually():
    buf = write_warc_bytes(PAGES, compress=True)
    # more than one gzip member (member-per-record framing)
    assert buf.count(b"\x1f\x8b\x08") >= 4


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        list(parse_warc_records(b"NOT A WARC\r\n\r\n"))


def test_warc_documents_spark_roundtrip(spark, tmp_path):
    """Distributed read: two .warc.gz files -> input_hint rows with
    byte-identical html and parsed timestamps; composes with extract_text."""
    (tmp_path / "w0.warc.gz").write_bytes(write_warc_bytes(PAGES[:2]))
    (tmp_path / "w1.warc.gz").write_bytes(write_warc_bytes(PAGES[2:]))
    docs = warc_documents(spark, str(tmp_path / "*.warc.gz"))
    assert docs.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = {r["url"]: r for r in docs.collect()}
    assert set(rows) == {u for u, _, _ in PAGES}
    for url, ts, html in PAGES:
        assert bytes(rows[url]["html"]) == html
        assert rows[url]["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == ts

    from minhashsketch_spark.operators.extract import extract_text

    ext = {r["url"]: r["extracted_text"]
           for r in extract_text(docs.filter("url like '%a.example%'"))
           .collect()}
    assert ext["https://a.example/x"] == "hello & goodbye"
