"""WARC ingestion: Common Crawl's actual container format.

A CC segment file is a sequence of INDEPENDENTLY-gzipped members, one
WARC record per member (the convention exists precisely so a reader can
resume at member boundaries). Each record is
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes>\\r\\n\\r\\n``;
``response`` records wrap an HTTP response whose body is the page bytes.

From-scratch pure-Python parsing (stdlib zlib only — no warcio), same
totality discipline as the core: malformed members/records are counted
and skipped, never raised. The parser feeds the canonical pages schema
``(url, warc_ts, html, text, lang)`` so `extract_pages` runs on WARC
drops directly.

Scale shape: gzip members are not splittable, so parallelism is
per-FILE (a CC crawl is ~64k segment files of ~1 GB — ample). The
binaryFile scan carries whole files into one mapInPandas that streams
members and yields record batches; record bytes never cross a shuffle
(the extract job's bucketing happens downstream on url). For >2 GB
files, raise spark.sql.files.maxPartitionBytes accordingly or pre-chunk
at member boundaries.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def split_gzip_members(data: bytes):
    """Yield the decompressed bytes of each gzip member in `data`.
    Trailing garbage / truncated members end the stream silently."""
    buf = data
    while buf[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(buf)
        except zlib.error:
            return
        yield out
        if not d.eof:
            return
        buf = d.unused_data


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version/status line
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1"))
    return headers


def parse_warc_records(raw: bytes):
    """Yield (url, iso_ts, page_bytes) for each complete `response`
    record in a decompressed WARC stream. Total: malformed records are
    skipped; scanning resumes at the next 'WARC/' magic."""
    i = 0
    n = len(raw)
    while i < n:
        start = raw.find(b"WARC/", i)
        if start < 0:
            return
        hdr_end = raw.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers = _parse_headers(raw[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            i = hdr_end + 4
            continue
        body = raw[hdr_end + 4 : hdr_end + 4 + length]
        i = hdr_end + 4 + length
        if len(body) < length:
            return  # truncated record
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        # response records carry an HTTP message; the page is its body.
        # A bare payload (no HTTP status line) is accepted as-is.
        if body[:5] == b"HTTP/":
            sep = body.find(b"\r\n\r\n")
            body = body[sep + 4:] if sep >= 0 else b""
        yield url, headers.get("warc-date", ""), body


def _ts(iso: str):
    try:
        return (datetime.strptime(iso, "%Y-%m-%dT%H:%M:%SZ")
                .replace(tzinfo=timezone.utc))
    except ValueError:
        return None


def read_warc(spark: SparkSession, path: str,
              glob: str = "*.warc.gz") -> DataFrame:
    """Pages table from a directory of gzipped WARC files."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob)
             .option("recursiveFileLookup", "true")
             .load(path))

    def explode(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for member in split_gzip_members(bytes(blob)):
                    for url, iso, page in parse_warc_records(member):
                        rows.append((url, _ts(iso), page, None, None))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return files.select("content").mapInPandas(explode, PAGES_SCHEMA)


def build_warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """Synthesize a CC-convention WARC file (one gzip member per record)
    for tests: [(url, iso_ts, page_bytes)] -> bytes. Emits a warcinfo
    member first, and wraps each page in an HTTP/1.1 200 response."""
    out = [_gzip_member(_record(
        b"warcinfo", b"", b"software: ocr-spark-synth\r\n", None))]
    for url, iso, page in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + page)
        extra = (f"WARC-Target-URI: {url}\r\nWARC-Date: {iso}\r\n"
                 .encode("latin-1"))
        out.append(_gzip_member(_record(b"response", http, b"", extra)))
    return b"".join(out)


def _record(wtype: bytes, body: bytes, extra_headers: bytes,
            extra: bytes | None) -> bytes:
    head = (b"WARC/1.0\r\nWARC-Type: " + wtype + b"\r\n"
            + (extra or b"") + extra_headers
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n")
    return head + body + b"\r\n\r\n"


def _gzip_member(data: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()
