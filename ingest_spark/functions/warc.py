"""WARC (Web ARChive) container codec — pure stdlib, no warc library.

Implements the published ISO 28500 / WARC 1.0 record layout used by
Common-Crawl-style corpora: named header fields, ``Content-Length``
-delimited payload, CRLF framing, and the per-record-gzip-member
packaging real crawl archives use (every record an independent gzip
member, concatenated — which is exactly what makes a .warc.gz file
SPLITTABLE: a reader can start at any member boundary). Also parses
the embedded HTTP/1.1 response (status line, headers, body) that
``response`` records carry.

Reference analog: the reference ingests a binary element container
(PBF) via a blob-level scan (SURVEY.md §2.1); WARC is the equivalent
container for the webtext axis of this graft, and `sources/pages.py`
documents the pages table as the materialized form of exactly this
input.

Scale note: member-at-a-time streaming decode (zlib ``decompressobj``
chained on ``unused_data``), no whole-file buffer ever held beyond
one record; files parallelize across partitions and gzip members
within a file are independently decodable.
"""

from __future__ import annotations

import hashlib
import zlib
from dataclasses import dataclass, field

_CRLF = b"\r\n"


@dataclass
class WarcRecord:
    warc_type: str
    headers: "dict[str, str]"
    payload: bytes
    offset: int = 0  # byte offset of the record (member) in the file

    # HTTP sub-parse (response records), filled by parse_http()
    http_status: int = 0
    http_headers: "dict[str, str]" = field(default_factory=dict)
    http_body: bytes = b""


def record_id(seed: str) -> str:
    """Deterministic urn:uuid record id (RFC 4122 layout over an MD5)."""
    h = hashlib.md5(seed.encode()).hexdigest()
    return (f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-"
            f"{h[16:20]}-{h[20:32]}>")


def build_record(warc_type: str, payload: bytes,
                 extra_headers: "dict[str, str] | None" = None,
                 date: str = "2024-01-01T00:00:00Z",
                 rec_id_seed: str = "0") -> bytes:
    """One WARC/1.0 record: version line, named fields, blank line,
    payload, two CRLFs (the spec's record boundary)."""
    headers = {
        "WARC-Type": warc_type,
        "WARC-Date": date,
        "WARC-Record-ID": record_id(rec_id_seed),
        "Content-Length": str(len(payload)),
    }
    if extra_headers:
        headers.update(extra_headers)
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}".encode() + _CRLF for k, v in headers.items()
    ) + _CRLF
    return head + payload + _CRLF + _CRLF


def gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime 0, no name) — the
    per-record compression unit of a .warc.gz."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
    return co.compress(raw) + co.flush()


def build_http_response(status: int, reason: str, mime: str,
                        body: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {mime}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _iter_gzip_members(data: bytes):
    """Yield (offset, decompressed_bytes) per concatenated gzip member."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + 15)
        out = d.decompress(data[pos:])
        yield pos, out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("warc.gz: zero-length gzip member")
        pos += consumed


def _parse_one(data: bytes, start: int,
               offset: int) -> "tuple[WarcRecord, int]":
    """Parse one record from ``data`` beginning at absolute index
    ``start``; returns (record, next_start). Absolute indexing — no
    tail re-slice per record, so walking a plain .warc is O(n) bytes
    touched, not O(n²) copied."""
    end = data.find(_CRLF + _CRLF, start)
    if data[start:start + 5] != b"WARC/" or end < 0:
        raise ValueError("not a WARC record")
    lines = data[start:end].split(_CRLF)
    headers: "dict[str, str]" = {}
    for line in lines[1:]:
        k, _, v = line.decode("utf-8", "replace").partition(":")
        headers[k.strip()] = v.strip()
    clen = int(headers.get("Content-Length", "0"))
    body_start = end + 4
    payload = data[body_start: body_start + clen]
    if len(payload) != clen:
        raise ValueError("warc: truncated payload")
    rec = WarcRecord(
        warc_type=headers.get("WARC-Type", ""),
        headers=headers, payload=payload, offset=offset,
    )
    return rec, body_start + clen + 4  # payload + closing CRLFCRLF


def parse(data: bytes) -> "list[WarcRecord]":
    """Parse a .warc or .warc.gz byte string into records. Gzipped
    inputs are walked member-by-member (offsets are the COMPRESSED
    member offsets — the values a CDX index would store); plain
    inputs are walked record-by-record."""
    records = []
    if data[:2] == b"\x1f\x8b":
        for off, raw in _iter_gzip_members(data):
            rec, _ = _parse_one(raw, 0, off)
            records.append(rec)
    else:
        pos = 0
        while pos < len(data):
            rec, pos = _parse_one(data, pos, pos)
            records.append(rec)
    return records


def parse_http(rec: WarcRecord) -> WarcRecord:
    """Split a response record's payload into status/headers/body."""
    if rec.warc_type != "response":
        return rec
    raw = rec.payload
    end = raw.find(_CRLF + _CRLF)
    if end < 0 or not raw.startswith(b"HTTP/"):
        return rec
    lines = raw[:end].split(_CRLF)
    parts = lines[0].decode("ascii", "replace").split(" ", 2)
    rec.http_status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    for line in lines[1:]:
        k, _, v = line.decode("utf-8", "replace").partition(":")
        rec.http_headers[k.strip().lower()] = v.strip()
    rec.http_body = raw[end + 4:]
    return rec
