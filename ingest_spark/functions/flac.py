"""FLAC codec — pure numpy + stdlib, no audio library.

Implements the published xiph.org FLAC format (the same spec RFC 9639
codifies): ``fLaC`` magic, STREAMINFO metadata block (including the
MD5 of the unencoded samples — a built-in end-to-end integrity check),
frames with CRC-8-protected headers and CRC-16-protected payloads,
UTF-8-style frame numbering, and subframes in all five published
types. The encoder emits CONSTANT / VERBATIM / FIXED subframes
(choosing the fixed-predictor order 0-4 that minimizes the residual
magnitude per block, rice-coded residuals); the decoder additionally
inverts LPC subframes, rice partitions (RICE and RICE2 escapes and
the verbatim-residual escape), wasted bits, and left/side, right/side
and mid/side stereo decorrelation, so third-party fixed- or
LPC-encoded streams decode too.

Reference analog: the reference pipeline treats media payloads as
opaque bytes (SURVEY.md §2.6); this codec extends the graft's
training-data-pipeline layer — FLAC is the dominant lossless audio
format in crawled corpora, and lossless means the contract oracle
pins decode sample-exactly (`multimodal_flac_decode`).

Scale note: rice coding is inherently bit-serial (like JPEG's Huffman
layer), so decode is per-payload Python — but the unary scanner is
numpy-backed (a precomputed set-bit index + ``searchsorted`` per
residual instead of per-bit stepping), residual integration is
``np.cumsum``/polynomial recurrence per subframe, and payloads decode
independently inside ``mapInPandas`` batches: corpus throughput
scales with partitions, the same argument as the JPEG codec.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}

# sample-rate code table from the spec's frame header (subset; code 12
# = get 8-bit kHz from end of header, 14 = 16-bit Hz/10 — we emit the
# tabled codes when possible and the 16-bit escape otherwise)
_RATE_CODES = {
    88200: 0x1, 176400: 0x2, 192000: 0x3, 8000: 0x4, 16000: 0x5,
    22050: 0x6, 24000: 0x7, 32000: 0x8, 44100: 0x9, 48000: 0xA,
    96000: 0xB,
}
_RATE_FROM_CODE = {v: k for k, v in _RATE_CODES.items()}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
    header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
    frame footer CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coding of the frame/sample number."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 5 * nbytes + (6 - nbytes) + 1 and nbytes < 7:
        nbytes += 1
    # leading byte: nbytes ones, a zero, then the top payload bits
    shift = 6 * (nbytes - 1)
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead_mask | (n >> shift))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8
        self._bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self._ones = np.flatnonzero(self._bits).astype(np.int64)

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        end = self.pos + nbits
        if end > len(self._bits):
            raise ValueError("flac: bitstream truncated")
        v = 0
        # byte-aligned fast path for wide reads
        bits = self._bits[self.pos:end]
        v = int(np.packbits(bits, bitorder="big").view(np.uint8)[0]) if nbits <= 8 else None
        if nbits <= 8:
            v >>= (8 - nbits)
        else:
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
        self.pos = end
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        i = np.searchsorted(self._ones, self.pos)
        if i >= len(self._ones):
            raise ValueError("flac: unary run past end of stream")
        term = int(self._ones[i])
        q = term - self.pos
        self.pos = term + 1
        return q

    def read_utf8(self) -> int:
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n = 0
        while (b0 << n) & 0x80:
            n += 1
        v = b0 & (0x7F >> n)
        for _ in range(n - 1):
            v = (v << 6) | (self.read(8) & 0x3F)
        return v

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _rice_encode(w: _BitWriter, residuals: np.ndarray, k: int):
    for r in residuals:
        r = int(r)
        u = (r << 1) ^ (r >> 63)  # zigzag
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


def _best_rice_k(residuals: np.ndarray) -> int:
    if not len(residuals):
        return 0
    u = np.abs(residuals.astype(np.int64)) * 2
    mean = max(float(u.mean()), 1.0)
    k = int(np.log2(mean)) if mean >= 1 else 0
    return int(np.clip(k, 0, 14))


def encode(samples: np.ndarray, sample_rate: int = 8000,
           block_size: int = 4096) -> bytes:
    """int16 mono samples → FLAC bytes (STREAMINFO + fixed-predictor
    frames, one rice partition per subframe)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim != 1:
        raise ValueError("mono only in the encoder")
    n = len(x)
    md5 = hashlib.md5(np.asarray(samples, dtype="<i2").tobytes()).digest()

    frames = [
        _encode_frame(x[start: start + block_size], fi, sample_rate,
                      block_size)
        for fi, start in enumerate(range(0, n, block_size))
    ]  # a zero-sample stream legally has no frames at all

    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" + b"\x00\x00\x00"  # min/max frame size: unknown (0)
        + _pack_sr_ch_bits_total(sample_rate, 1, 16, n)
        + md5
    )
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] \
        + streaminfo
    return header + b"".join(frames)


def _pack_sr_ch_bits_total(sr: int, ch: int, bits: int, total: int) -> bytes:
    # 20 bits sr | 3 bits (ch-1) | 5 bits (bits-1) | 36 bits total
    v = (sr << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    return v.to_bytes(8, "big")


def _encode_frame(blk: np.ndarray, frame_no: int, sample_rate: int,
                  nominal_bs: int) -> bytes:
    bs = len(blk)
    # header: sync(14)=0x3FFE, reserved(1)=0, blocking(1)=0 (fixed),
    # block-size code(4), rate code(4), channel(4)=0 (mono),
    # sample-size code(3)=100 (16-bit), reserved(1)=0
    if bs == nominal_bs and bs in (4096, 1024, 2048, 256, 512):
        bs_code = {256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12}[bs]
        bs_tail = b""
    else:
        bs_code = 7  # 16-bit block size - 1 at end of header
        bs_tail = struct.pack(">H", bs - 1)
    if sample_rate in _RATE_CODES:
        sr_code = _RATE_CODES[sample_rate]
    else:
        sr_code = 0  # exact rate comes from STREAMINFO
    sr_tail = b""
    hdr = bytes([
        0xFF, 0xF8,
        (bs_code << 4) | sr_code,
        (0 << 4) | (4 << 1) | 0,
    ]) + _utf8_number(frame_no) + bs_tail + sr_tail
    hdr += bytes([_crc8(hdr)])

    w = _BitWriter()
    _encode_subframe(w, blk)
    w.align()
    body = hdr + w.bytes()
    return body + struct.pack(">H", _crc16(body))


def _encode_subframe(w: _BitWriter, blk: np.ndarray):
    bs = len(blk)
    if bs and (blk == blk[0]).all():
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(blk[0]) & 0xFFFF, 16)
        return
    # pick the fixed order with the smallest residual magnitude
    best_order, best_res, best_cost = 0, blk, np.abs(blk).sum()
    res = blk
    for order in range(1, 5):
        if bs <= order:
            break
        res = np.diff(res)
        cost = np.abs(res).sum() + 16 * order
        if cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    order = best_order
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED, order
    w.write(0, 1)  # no wasted bits
    for i in range(order):  # warm-up samples
        w.write(int(blk[i]) & 0xFFFF, 16)
    residuals = best_res if order else blk
    k = _best_rice_k(np.asarray(residuals))
    w.write(0, 2)   # residual coding method: RICE (4-bit params)
    w.write(0, 4)   # partition order 0 → one partition
    w.write(k, 4)
    _rice_encode(w, np.asarray(residuals, dtype=np.int64), k)


# ---------------------------------------------------------------- decode

def decode(data: bytes):
    """FLAC bytes → (sample_rate, int16 samples ndarray — mono, or
    (n, ch) for multi-channel). Verifies both frame CRCs and the
    STREAMINFO MD5 (when present)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    sr = bits = None
    ch = 1
    total = None
    md5_expect = None
    while True:  # metadata blocks
        hdr = data[pos: pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = pos + 4
        if btype == 0:  # STREAMINFO
            v = int.from_bytes(data[body + 10: body + 18], "big")
            sr = v >> 44
            ch = ((v >> 41) & 0x7) + 1
            bits = ((v >> 36) & 0x1F) + 1
            total = v & ((1 << 36) - 1)
            md5_expect = data[body + 18: body + 34]
        pos = body + blen
        if last:
            break
    out = []
    r = _BitReader(data, pos)
    nbits_total = len(data) * 8
    while r.pos + 16 <= nbits_total:
        frame = _decode_frame(r, sr, ch, bits)
        if frame is None:
            break
        out.append(frame)
    if not out:
        samples = np.zeros((0, ch), dtype=np.int32)
    else:
        samples = np.concatenate(out, axis=0)
    if total:
        samples = samples[:total]
    if md5_expect and md5_expect != b"\x00" * 16 and bits == 16:
        got = hashlib.md5(
            samples.astype("<i2").tobytes()
        ).digest()
        if got != md5_expect:
            raise ValueError("flac: STREAMINFO MD5 mismatch")
    dt = np.int16 if bits <= 16 else np.int32
    samples = samples.astype(dt)
    return sr, samples[:, 0] if ch == 1 else samples


def _decode_frame(r: _BitReader, sr_si, ch_si, bits_si):
    start_byte = r.pos // 8
    sync = r.read(14)
    if sync != 0x3FFE:
        return None
    r.read(1)  # reserved
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    r.read(1)  # reserved
    r.read_utf8()  # frame/sample number
    if bs_code == 6:
        bs = r.read(8) + 1
    elif bs_code == 7:
        bs = r.read(16) + 1
    elif bs_code == 1:
        bs = 192
    elif 2 <= bs_code <= 5:
        bs = 576 << (bs_code - 2)
    elif 8 <= bs_code <= 15:
        bs = 256 << (bs_code - 8)
    else:
        raise ValueError("flac: reserved block-size code")
    if sr_code == 0:
        sr = sr_si
    elif sr_code in _RATE_FROM_CODE:
        sr = _RATE_FROM_CODE[sr_code]
    elif sr_code == 12:
        sr = r.read(8) * 1000
    elif sr_code == 13:
        sr = r.read(16)
    elif sr_code == 14:
        sr = r.read(16) * 10
    else:
        raise ValueError("flac: invalid sample-rate code")
    ss = {0: bits_si, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
    if ss is None:
        raise ValueError("flac: reserved sample-size code")
    hdr_end_byte = r.pos // 8  # header is byte-aligned here; next byte is CRC
    crc_got = r.read(8)
    if _crc8(r.data[start_byte: hdr_end_byte]) != crc_got:
        raise ValueError("flac: frame header CRC-8 mismatch")

    if ch_code < 8:
        nch = ch_code + 1
        chans = [
            _decode_subframe(r, bs, ss) for _ in range(nch)
        ]
        frame = np.stack(chans, axis=1)
    elif ch_code in (8, 9, 10):  # left/side, right/side, mid/side
        # the SIDE channel always carries one extra bit of range:
        # left/side and mid/side put it second, side/right puts it first
        extra = (1, 0) if ch_code == 9 else (0, 1)
        a = _decode_subframe(r, bs, ss + extra[0])
        b = _decode_subframe(r, bs, ss + extra[1])
        if ch_code == 8:        # a=left, b=side → right = left - side
            frame = np.stack([a, a - b], axis=1)
        elif ch_code == 9:      # a=side, b=right → left = right + side
            frame = np.stack([b + a, b], axis=1)
        else:                   # mid/side
            mid, side = a.astype(np.int64), b.astype(np.int64)
            m2 = (mid << 1) | (side & 1)
            frame = np.stack([(m2 + side) >> 1, (m2 - side) >> 1], axis=1)
    else:
        raise ValueError("flac: reserved channel assignment")
    r.align()
    end_byte = r.pos // 8
    crc16_got = r.read(16)
    if _crc16(r.data[start_byte: end_byte]) != crc16_got:
        raise ValueError("flac: frame CRC-16 mismatch")
    return frame.astype(np.int64)


def _decode_subframe(r: _BitReader, bs: int, ss: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("flac: subframe sync bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        ss -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(bs, r.read_signed(ss), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([r.read_signed(ss) for _ in range(bs)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [r.read_signed(ss) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        out = _restore_fixed(np.array(warm, dtype=np.int64), res, order)
    elif stype >= 32:  # LPC
        order = stype - 31
        warm = [r.read_signed(ss) for _ in range(order)]
        prec = r.read(4) + 1
        shift = r.read_signed(5)
        coefs = np.array(
            [r.read_signed(prec) for _ in range(order)], dtype=np.int64)
        res = _decode_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            pred = int(np.dot(coefs, out[i - order: i][::-1]))
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    return out << wasted if wasted else out


def _restore_fixed(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-N finite difference: repeated cumsum with the
    warm-up samples re-differenced as the integration constants."""
    if order == 0:
        return res.astype(np.int64)
    # forward: residual = diff^order(signal). Rebuild the leading
    # diffs of the warm-up, then integrate order times.
    seqs = [warm.astype(np.int64)]
    for _ in range(order):
        seqs.append(np.diff(seqs[-1]))
    cur = res.astype(np.int64)
    for lvl in range(order, 0, -1):
        seed_seq = seqs[lvl - 1]
        seed = seed_seq[-1] if len(seed_seq) else 0
        cur = np.concatenate(([seed], cur)).cumsum()[1:]
    return np.concatenate([warm, cur])


def _decode_residual(r: _BitReader, bs: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError("flac: reserved residual coding method")
    kbits = 4 if method == 0 else 5
    escape = 0xF if method == 0 else 0x1F
    porder = r.read(4)
    nparts = 1 << porder
    out = []
    for p in range(nparts):
        n = (bs >> porder) - (order if p == 0 else 0)
        k = r.read(kbits)
        if k == escape:
            nb = r.read(5)
            vals = np.array(
                [r.read_signed(nb) if nb else 0 for _ in range(n)],
                dtype=np.int64)
            out.append(vals)
            continue
        u = np.empty(n, dtype=np.int64)
        for i in range(n):
            q = r.read_unary()
            v = (q << k) | (r.read(k) if k else 0)
            u[i] = v
        out.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)
