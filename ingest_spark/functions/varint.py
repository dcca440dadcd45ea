"""LEB128 unsigned varint codec.

Byte layout parity with the reference's `desert::varint` usage in
/root/reference/src/value.rs:28-38 (payload header parsing) — standard
protobuf-style little-endian base-128 with continuation high bit.

Scalar helpers are used by the georender encoder/decoder kernels, which
run batched inside pandas UDFs (the per-feature payloads are tiny; the
batching is at the Arrow level, not per-byte).
"""

from __future__ import annotations


def encode(n: int) -> bytes:
    """Encode a non-negative int as LEB128 varint bytes."""
    if n < 0:
        raise ValueError("varint encodes unsigned ints only")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_matrix(vals) -> tuple["np.ndarray", "np.ndarray"]:
    """Vectorized LEB128: (n,) non-negative ints → ((n, 10) uint8 byte
    matrix, (n,) lengths). Row i's varint is ``mat[i, :lens[i]]`` —
    byte-identical to ``encode(vals[i])`` (property-tested). Powers the
    numpy point-payload assembly in operators/features.py."""
    import numpy as np

    v = np.asarray(vals, dtype=np.uint64).copy()
    n = len(v)
    out = np.zeros((n, 10), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int64)
    active = np.ones(n, dtype=bool)
    for j in range(10):
        if not active.any():
            break
        byte = (v & np.uint64(0x7F)).astype(np.uint8)
        v = v >> np.uint64(7)
        more = (v > 0) & active
        out[active, j] = byte[active] | (more[active].astype(np.uint8) << 7)
        lens[active] += 1
        active = more
    return out, lens


def decode(buf: bytes, offset: int = 0) -> tuple[int, int]:
    """Decode a varint at ``offset``; returns (bytes_consumed, value).

    Same (size, value) return convention as desert's
    ``varint::decode`` (reference src/value.rs:30).
    """
    result = 0
    shift = 0
    pos = offset
    while True:
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not (b & 0x80):
            return pos - offset, result
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")
