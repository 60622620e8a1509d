"""WARC ingestion: Common-Crawl's native container as a Spark source.

The input_hint's web pages arrive, in the real world, as WARC files
(ISO 28500): a stream of records, each a header block (CRLF-terminated
``Name: value`` lines after a ``WARC/1.0`` version line) + CRLF CRLF +
a Content-Length-delimited payload + CRLF CRLF. Common Crawl ships them
gzip-compressed with ONE GZIP MEMBER PER RECORD, concatenated — that
member-per-record framing is what makes a .warc.gz splittable-ish and is
exactly what stdlib zlib can walk without any external library.

Scale shape: ``spark.read.format("binaryFile")`` yields one row (and so
one task) per WARC file — the Common-Crawl layout is ~1 GB x 10^5 files,
so file-level parallelism IS the right granularity (a crawl segment's
files vastly outnumber executors; no intra-file split needed). Parsing is
a per-partition Python generator (mapInPandas over file rows) — genuinely
imperative record-walking, the documented last-resort case — emitting the
input_hint shape (url, warc_ts, html, text, lang) with text extracted
lazily by the caller (operators.extract) so the parse stage stays narrow.

``write_warc_bytes`` is the deterministic inverse (fixtures + the
round-trip driver query): response records, member-per-record gzip
(mtime=0, fixed level) so identical pages yield identical bytes.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = b"\r\n"


def parse_warc_records(buf: bytes) -> Iterator[dict]:
    """Yield {'headers': {name.lower(): value}, 'payload': bytes} for every
    record in a raw (already-decompressed) WARC byte stream."""
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while buf.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = buf.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        head = buf[pos:head_end].decode("utf-8", "replace").split("\r\n")
        if not head or not head[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {head[:1]}")
        headers: dict[str, str] = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = head_end + 4
        yield {"headers": headers,
               "payload": buf[body_start:body_start + length]}
        pos = body_start + length


def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream, or pass plain
    bytes through. Member-per-record streams concatenate transparently."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt gzip member in WARC stream")
        pos += consumed
    return b"".join(out)


def _http_split(payload: bytes) -> bytes:
    """response records carry an HTTP message; the page bytes follow the
    first blank line. Records without an HTTP header block pass through."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(CRLF + CRLF)
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def warc_documents(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) -> the input_hint documents shape
    (url, warc_ts, html, text, lang): one task per file (binaryFile),
    response records only; ``text``/``lang`` are NULL — extraction and
    language-ID are downstream operators (extract_text, language_id), not
    the reader's job."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, htmls = [], [], []
            for blob in pdf["content"].values:
                raw = _maybe_gunzip(bytes(blob))
                for rec in parse_warc_records(raw):
                    h = rec["headers"]
                    if h.get("warc-type") != "response":
                        continue
                    urls.append(h.get("warc-target-uri", ""))
                    tss.append(h.get("warc-date"))
                    htmls.append(_http_split(rec["payload"]))
            yield pd.DataFrame({"url": urls, "warc_ts": pd.to_datetime(
                tss, format="%Y-%m-%dT%H:%M:%SZ", errors="coerce", utc=True
            ).tz_localize(None), "html": htmls})

    docs = files.mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary")
    return docs.select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"))


def write_warc_bytes(pages: list[tuple[str, str, bytes]],
                     compress: bool = True) -> bytes:
    """[(url, iso_ts 'YYYY-MM-DDTHH:MM:SSZ', html_bytes)] -> WARC bytes,
    one response record per page (+ a leading warcinfo record), gzip
    member-per-record when ``compress``. Deterministic: fixed mtime=0 and
    compression level, so same pages -> same bytes."""

    def record(rtype: str, headers: list[tuple[str, str]], payload: bytes) -> bytes:
        lines = [b"WARC/1.0"]
        lines += [f"WARC-Type: {rtype}".encode()]
        lines += [f"{k}: {v}".encode() for k, v in headers]
        lines += [f"Content-Length: {len(payload)}".encode()]
        return (CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF)

    out = []
    info = b"software: minhashsketch-spark-warc-writer\r\n"
    out.append(record("warcinfo",
                      [("WARC-Date", "2020-01-01T00:00:00Z"),
                       ("Content-Type", "application/warc-fields")], info))
    for url, ts, html in pages:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(html)}".encode() + CRLF + CRLF + html)
        out.append(record("response",
                          [("WARC-Target-URI", url), ("WARC-Date", ts),
                           ("Content-Type",
                            "application/http; msgtype=response")], http))
    if not compress:
        return b"".join(out)
    members = []
    for rec in out:
        bio = io.BytesIO()
        with gzip.GzipFile(fileobj=bio, mode="wb", mtime=0,
                           compresslevel=6) as g:
            g.write(rec)
        members.append(bio.getvalue())
    return b"".join(members)
