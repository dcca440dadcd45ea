"""Minimal Avro binary + Object Container File codec (pure stdlib).

Implements the subset of the public Apache Avro 1.11 specification
that Iceberg manifest files need: zigzag-varint ints/longs, IEEE
float/double, length-prefixed bytes/strings, records, [null, T]
unions, arrays, maps, and fixed — plus the OCF framing (magic,
file-metadata map carrying ``avro.schema``, sync-marker-delimited
data blocks, null codec).

Written from the published wire format, not ported from any Avro
implementation; the round-trip property tests in test_iceberg.py pin
it, and `plans/iceberg.py` uses it to write spec-shaped manifest
lists / manifest files.
"""

from __future__ import annotations

import hashlib
import json
import struct

MAGIC = b"Obj\x01"


# --------------------------------------------------- binary encoding

def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> "tuple[int, int]":
    u = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _resolve(schema):
    """Normalize a schema node: JSON strings parse, bare type names
    become {"type": name}."""
    if isinstance(schema, str):
        return {"type": schema}
    return schema


def encode(value, schema, out: bytearray) -> None:
    """Append the Avro binary encoding of ``value`` under ``schema``."""
    if isinstance(schema, list):  # union: emit branch index + value
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                out += _zigzag_encode(i)
                return
            if value is not None and bt != "null":
                out += _zigzag_encode(i)
                encode(value, branch, out)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    schema = _resolve(schema)
    t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t in ("bytes", "string"):
        raw = value.encode("utf-8") if t == "string" else bytes(value)
        out += _zigzag_encode(len(raw))
        out += raw
    elif t == "fixed":
        raw = bytes(value)
        if len(raw) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out += raw
    elif t == "record":
        for f in schema["fields"]:
            encode(value.get(f["name"]), f["type"], out)
    elif t == "array":
        items = list(value or [])
        if items:
            out += _zigzag_encode(len(items))
            for it in items:
                encode(it, schema["items"], out)
        out += _zigzag_encode(0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            out += _zigzag_encode(len(entries))
            for k, v in entries.items():
                encode(k, "string", out)
                encode(v, schema["values"], out)
        out += _zigzag_encode(0)
    else:
        raise NotImplementedError(f"avro type {t}")


def decode(buf: bytes, pos: int, schema) -> "tuple[object, int]":
    if isinstance(schema, list):
        idx, pos = _zigzag_decode(buf, pos)
        return decode(buf, pos, schema[idx])
    schema = _resolve(schema)
    t = schema["type"]
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + n
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos:pos + n]), pos + n
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = decode(buf, pos, f["type"])
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with byte-size prefix
                _, pos = _zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                it, pos = decode(buf, pos, schema["items"])
                items.append(it)
    if t == "map":
        entries = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return entries, pos
            if n < 0:
                _, pos = _zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = decode(buf, pos, "string")
                entries[k], pos = decode(buf, pos, schema["values"])
    raise NotImplementedError(f"avro type {t}")


# --------------------------------------------- object container files

_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_ocf(path: str, schema: dict, records: list) -> None:
    """Write records as a single-block Avro OCF (null codec). The sync
    marker is content-derived so identical inputs produce identical
    files (useful for content-addressed snapshot ids)."""
    schema_json = json.dumps(schema, separators=(",", ":"))
    body = bytearray()
    for rec in records:
        encode(rec, schema, body)
    sync = hashlib.md5(schema_json.encode() + bytes(body)).digest()
    out = bytearray(MAGIC)
    encode(
        {"avro.schema": schema_json.encode(), "avro.codec": b"null"},
        _META_SCHEMA, out,
    )
    out += sync
    if records:
        out += _zigzag_encode(len(records))
        out += _zigzag_encode(len(body))
        out += body
        out += sync
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_ocf(path: str) -> "tuple[dict, list]":
    """Read an Avro OCF → (schema, records). Null codec only."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    meta, pos = decode(buf, 4, _META_SCHEMA)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise NotImplementedError(f"avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode())
    sync = bytes(buf[pos:pos + 16])
    pos += 16
    records = []
    while pos < len(buf):
        n, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        end = pos + size
        for _ in range(n):
            rec, pos = decode(buf, pos, schema)
            records.append(rec)
        if pos != end:
            raise ValueError("avro block size mismatch")
        if bytes(buf[pos:pos + 16]) != sync:
            raise ValueError("avro sync marker mismatch")
        pos += 16
    return schema, records
