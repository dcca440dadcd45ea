"""GIF87a/89a codec — pure stdlib + numpy, no imaging library.

Implements the public GIF specification: logical-screen / image
descriptors, global + local color tables, interlace, extension-block
skipping, and the variable-width LZW scheme (clear/EOI codes, code
width growth to 12 bits). The encoder emits a GIF89a stream with a
true dictionary-building LZW compressor (not the "emit clear every
symbol" degenerate form), a global color table sized to the palette,
and a single image frame; the decoder returns the first frame as RGB.

Part of the training-data-pipeline multimodal layer (the reference
treats media as opaque bytes — SURVEY.md §2.6); GIF is the third
most common image format in web corpora after JPEG/PNG.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """Pixel index stream → GIF LZW bytes (LSB-first packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    seq = b""
    for i in indices.tolist():
        nxt = seq + bytes([i])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= (1 << 12):
            emit(clear)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([i])
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while pos < n or nbits >= width:
        while nbits < width and pos < n:
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(f"GIF LZW underrun: {len(out)} < {n_pixels}")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _palette(rgb: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """(h, w, 3) → (palette (n,3), indices (h*w,)); ≤256 colors required."""
    flat = rgb.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"GIF needs ≤256 distinct colors, got {len(pal)}")
    return pal, inv.astype(np.uint8)


def encode(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB (≤256 distinct colors) → GIF89a bytes."""
    h, w = rgb.shape[:2]
    pal, idx = _palette(np.asarray(rgb, dtype=np.uint8))
    # color-table size: power of two ≥ len(pal), ≥ 2
    bits = max(1, int(len(pal) - 1).bit_length())
    table_n = 1 << bits
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    padded = np.zeros((table_n, 3), np.uint8)
    padded[:len(pal)] = pal
    out += padded.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_compress(idx, min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode(data: bytes) -> np.ndarray:
    """GIF bytes → first frame as (h, w, 3) uint8 RGB."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        x0, y0, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decompress(bytes(lzw), min_code, iw * ih)
        if iflags & 0x40:  # interlaced: reorder rows by the 4-pass scheme
            rows = idx.reshape(ih, iw)
            out_rows = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, ih, step):
                    out_rows[y] = rows[src]
                    src += 1
            idx = out_rows.reshape(-1)
        frame = ct[idx].reshape(ih, iw, 3)
        if (x0, y0, iw, ih) != (0, 0, sw, sh):
            canvas = np.zeros((sh, sw, 3), np.uint8)
            canvas[y0:y0 + ih, x0:x0 + iw] = frame[:sh - y0, :sw - x0]
            return canvas
        return frame
    raise ValueError("GIF without an image frame")
