"""georender-pack-style binary feature codec.

Re-expresses the reference's feature payload capability
(/root/reference/src/lib.rs:149-151,238-240,364-367 encode calls;
/root/reference/src/value.rs:28-38 header parse) with a documented,
self-consistent layout whose header is parse-compatible with the
reference's ``V::get_id``:

    [varint body_len] [u8 geom_kind] [varint feature_type] [varint id] [geometry] [labels]

- ``geom_kind``: 1=point, 2=line, 3=area (node/way-line/way-or-relation-area)
- ``id`` is the mangled feature id ``osm_id*3 + kind`` (kind 0=node,
  1=way, 2=relation — reference src/lib.rs:150,239,365)
- geometry (little-endian float32 coordinates, matching the reference's
  f64→f32 downcast at src/lib.rs:150,156-157,225,350):
    point: f32 lon, f32 lat
    line:  varint n_points, then n× (f32 lon, f32 lat)
    area:  varint n_points, positions, varint n_cell_indices, varint…
           (earcut triangle vertex indices — src/lib.rs:238-240 via earcutr)
- labels: concatenated ``[varint len]"=<name>"`` entries, 0x00 terminator;
  no labels ⇒ single 0x00 byte (golden bytes at
  /root/reference/tests/ingest.rs:62,72,78).

These scalar codecs are invoked batched from pandas UDFs (one call per
feature, thousands per Arrow batch); payloads are small so Python-side
cost is dominated by the Arrow transfer, which is vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

from . import varint

KIND_NODE = 0
KIND_WAY = 1
KIND_RELATION = 2

GEOM_POINT = 1
GEOM_LINE = 2
GEOM_AREA = 3


def feature_id(osm_id: int, kind: int) -> int:
    """The ``osm_id*3 + kind`` mangling (reference src/lib.rs:150,239,365)."""
    return osm_id * 3 + kind


def pack_labels(name: str | None) -> bytes:
    """``[varint len]"=<name>"…\\x00`` label packing.

    Golden parity: ``"\\x0e=triangle park\\x00"`` for name "triangle park"
    (reference tests/ingest.rs:62), bare ``b"\\x00"`` when unnamed
    (tests/ingest.rs:78).
    """
    if not name:
        return b"\x00"
    body = ("=" + name).encode("utf-8")
    return varint.encode(len(body)) + body + b"\x00"


def _f32(v: float) -> bytes:
    return struct.pack("<f", np.float32(v))


def _positions_bytes(positions) -> bytes:
    arr = np.asarray(positions, dtype=np.float32)
    return arr.tobytes()  # little-endian on all supported platforms


def _wrap(geom_kind: int, ftype: int, fid: int, body: bytes) -> bytes:
    payload = bytes([geom_kind]) + varint.encode(ftype) + varint.encode(fid) + body
    return varint.encode(len(payload)) + payload


def encode_point(fid: int, ftype: int, lon: float, lat: float, labels: bytes) -> bytes:
    return _wrap(GEOM_POINT, ftype, fid, _f32(lon) + _f32(lat) + labels)


def encode_line(fid: int, ftype: int, positions, labels: bytes) -> bytes:
    n = len(positions) // 2
    body = varint.encode(n) + _positions_bytes(positions) + labels
    return _wrap(GEOM_LINE, ftype, fid, body)


def encode_area(fid: int, ftype: int, positions, cells, labels: bytes) -> bytes:
    n = len(positions) // 2
    body = varint.encode(n) + _positions_bytes(positions)
    body += varint.encode(len(cells))
    for c in cells:
        body += varint.encode(int(c))
    body += labels
    return _wrap(GEOM_AREA, ftype, fid, body)


def get_id(buf: bytes) -> int:
    """Parse the feature id out of a payload exactly like the reference's
    ``V::get_id`` (src/value.rs:28-38): skip [varint len], skip 1 byte,
    skip [varint feature_type], read [varint id]."""
    s, _len = varint.decode(buf, 0)
    offset = s
    offset += 1
    s, _ftype = varint.decode(buf, offset)
    offset += s
    _s, fid = varint.decode(buf, offset)
    return fid


def decode(buf: bytes) -> dict:
    """Round-trip decoder (test harness analog of georender_pack::decode,
    reference tests/ingest.rs:33)."""
    s, body_len = varint.decode(buf, 0)
    o = s
    geom_kind = buf[o]
    o += 1
    s, ftype = varint.decode(buf, o)
    o += s
    s, fid = varint.decode(buf, o)
    o += s

    out = {"geom_kind": geom_kind, "feature_type": ftype, "id": fid}
    if geom_kind == GEOM_POINT:
        lon, lat = struct.unpack_from("<ff", buf, o)
        o += 8
        out["point"] = (lon, lat)
    else:
        s, n = varint.decode(buf, o)
        o += s
        pos = np.frombuffer(buf, dtype="<f4", count=2 * n, offset=o)
        o += 8 * n
        out["positions"] = pos.tolist()
        if geom_kind == GEOM_AREA:
            s, n_cells = varint.decode(buf, o)
            o += s
            cells = []
            for _ in range(n_cells):
                s, c = varint.decode(buf, o)
                o += s
                cells.append(c)
            out["cells"] = cells

    # labels: [varint len][bytes]… 0x00
    labels_start = o
    while True:
        s, ln = varint.decode(buf, o)
        if ln == 0:
            o += s
            break
        o += s + ln
    out["labels"] = bytes(buf[labels_start:o])
    return out
