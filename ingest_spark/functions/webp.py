"""WebP lossless (VP8L) codec — pure stdlib + numpy, no imaging library.

Implements the public WebP Lossless Bitstream Specification (RFC 9649
/ Google "WebP lossless bitstream specification"): the RIFF/WEBP
container (plain and VP8X-extended), LSB-first bit packing with
DEFLATE-convention canonical prefix codes (simple 1/2-symbol and
normal code-length-coded forms, incl. the 16/17/18 repeat operators
and the VP8L metacode order), the color cache, LZ77 backward
references with the 120-entry 2D distance map, meta prefix groups,
and all four transforms (predictor ×14 modes, cross-color,
subtract-green, color-indexing incl. sub-byte pixel bundling).

The decoder handles the full lossless feature set; lossy VP8 streams
raise ``NotImplementedError`` (perceptual DSP — environmental, like
MP3/H.264 in `operators/multimodal.py`). The encoder emits a
deliberately featured subset — any combination of subtract-green,
fixed-mode predictor, or palette transforms, plus color cache and a
dist-1/dist-row LZ77 matcher — so the synthetic contract corpus
exercises every decoder path with REAL spec-conformant payloads.

Part of the training-data-pipeline multimodal layer (the reference
treats media as opaque bytes — SURVEY.md §2.6); WebP is ~10% of
images in a modern crawl and its lossless profile round-trips
byte-exactly, which is what the `multimodal_webp_decode` contract
query pins.

Scale note: like `jpeg.py`/`gif.py`, per-image decode is inherently
serial; parallelism comes from `mapInPandas` batching ACROSS images
(one image per row, thousands of rows per Arrow batch), never from
driver-side loops.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- bits

MAX_ALLOWED_CODE_LENGTH = 15

# code-length metacode transmission order (VP8L-specific; differs
# from DEFLATE's)
_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                      11, 12, 13, 14, 15)

_HASH_MUL = 0x1E35A7BD  # color-cache multiplicative hash (spec const)


class BitReader:
    """LSB-first bit reader over a bytes buffer (DEFLATE packing)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L stream")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated VP8L stream")
        b = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b


class BitWriter:
    """LSB-first bit writer (mirror of `BitReader`)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Canonical prefix codes go MSB-first into the LSB-first
        stream (DEFLATE convention, which VP8L shares)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ----------------------------------------------------- prefix codes


class PrefixCode:
    """Decoding side of one canonical prefix code.

    ``lengths[sym]`` = code length (0 = unused). A code with exactly
    one used symbol is "trivial": decoding it consumes ZERO bits
    (spec/libwebp behavior — also what makes single-color aux images
    cost nothing per pixel).
    """

    __slots__ = ("table", "trivial")

    def __init__(self, lengths: list[int]):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.trivial = used[0][1]
            self.table = None
            return
        self.trivial = None
        codes = _canonical_codes(lengths)
        # completeness check: a non-trivial canonical code must fill
        # its Kraft budget exactly (over-/under-subscribed = corrupt)
        kraft = sum(1 << (MAX_ALLOWED_CODE_LENGTH - l) for l, _ in used)
        if kraft != 1 << MAX_ALLOWED_CODE_LENGTH:
            raise ValueError("incomplete/oversubscribed prefix code")
        self.table = {(lengths[s], c): s for s, c in codes.items()
                      if lengths[s] > 0}

    @classmethod
    def simple(cls, symbols: list[int]) -> "PrefixCode":
        """Spec "simple code": codes assigned in READ order (first
        symbol ↔ bit 0, second ↔ bit 1), NOT canonically by symbol —
        the two differ when the stream lists the larger symbol
        first."""
        pc = cls.__new__(cls)
        if len(symbols) == 1:
            pc.trivial = symbols[0]
            pc.table = None
        else:
            pc.trivial = None
            pc.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return pc

    def decode(self, br: BitReader) -> int:
        if self.trivial is not None:
            return self.trivial
        code = 0
        for length in range(1, MAX_ALLOWED_CODE_LENGTH + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _canonical_codes(lengths: list[int]) -> dict[int, int]:
    """DEFLATE canonical assignment: symbol → code value."""
    bl_count: dict[int, int] = {}
    for l in lengths:
        if l:
            bl_count[l] = bl_count.get(l, 0) + 1
    code = 0
    next_code = {}
    for l in range(1, MAX_ALLOWED_CODE_LENGTH + 1):
        code = (code + bl_count.get(l - 1, 0)) << 1
        next_code[l] = code
    out = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = next_code[l]
            next_code[l] += 1
    return out


def _complete_lengths(symbols: list[int]) -> dict[int, int]:
    """Flat-ish COMPLETE canonical code over k symbols: all at
    L = ceil(log2 k), with (2^L − k) of them promoted to L−1 so the
    Kraft sum is exactly 1 (incomplete codes are invalid VP8L)."""
    k = len(symbols)
    if k == 1:
        return {symbols[0]: 1}
    L = (k - 1).bit_length()
    promote = (1 << L) - k
    return {s: (L - 1 if i < promote else L)
            for i, s in enumerate(sorted(symbols))}


def _huffman_lengths(freqs: dict[int, int],
                     max_len: int = MAX_ALLOWED_CODE_LENGTH,
                     ) -> dict[int, int]:
    """Code lengths from symbol frequencies (heap merge); falls back
    to a flat complete code if the unconstrained depth exceeds
    ``max_len`` (7 for the 3-bit-field metacode, 15 for payloads)."""
    import heapq

    if not freqs:
        raise ValueError("no symbols")
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    tick = len(heap)
    depth: dict[int, int] = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, s1 + s2))
        tick += 1
    if max(depth.values()) > max_len:
        return _complete_lengths(list(freqs))
    return depth


# --------------------------------------------- LZ77 distance mapping

def _build_distance_map() -> list[tuple[int, int]]:
    """The 120-entry near-pixel (dx, dy) table, generated from its
    defining rule: all causal offsets with dy in [0,7], dx in [-7,8]
    (dy=0 restricted to dx>=1), ordered by squared euclidean distance,
    ties by larger dy first, then positive dx before negative.
    `tests/test_webp.py` pins the spec-listed prefix literally."""
    pairs = [(x, y) for y in range(8) for x in range(-7, 9)
             if y > 0 or x > 0]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0,
                              abs(p[0])))
    assert len(pairs) == 120
    return pairs


DISTANCE_MAP = _build_distance_map()
_DISTANCE_CODE = {p: i + 1 for i, p in enumerate(DISTANCE_MAP)}


def _plane_to_distance(code: int, xsize: int) -> int:
    """Distance code (1-based, post prefix-decode) → pixel distance."""
    if code > 120:
        return code - 120
    dx, dy = DISTANCE_MAP[code - 1]
    return max(dy * xsize + dx, 1)


def _distance_to_code(dist: int, xsize: int) -> int:
    dy, dx = divmod(dist, xsize)
    for cand in ((dx, dy), (dx - xsize, dy + 1)):
        c = _DISTANCE_CODE.get(cand)
        if c is not None:
            return c
    return dist + 120


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (>=1) → (prefix code, extra bits count, extra value)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    k = x.bit_length() - 1
    if x < 3 << (k - 1):
        return 2 * k, k - 1, x - (1 << k)
    return 2 * k + 1, k - 1, x - (3 << (k - 1))


def _prefix_decode(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _cache_index(argb: int, cache_bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# ------------------------------------------------------ ARGB helpers

def _argb_channels(argb: np.ndarray) -> tuple[np.ndarray, ...]:
    return ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
            (argb >> 8) & 0xFF, argb & 0xFF)


def _pack_argb(a, r, g, b):
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) \
        | (b & 0xFF)


# ----------------------------------------------------------- decoder

def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read_bit():  # simple code (1 or 2 symbols)
        num_symbols = br.read_bit() + 1
        first_8bits = br.read_bit()
        symbols = [br.read(8 if first_8bits else 1)]
        if num_symbols == 2:
            symbols.append(br.read(8))
            if symbols[0] == symbols[1]:
                raise ValueError("duplicate simple-code symbols")
        if max(symbols) >= alphabet_size:
            raise ValueError("simple-code symbol out of alphabet")
        return PrefixCode.simple(symbols)
    # normal: code lengths are themselves prefix-coded
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(cl_lengths)
    if br.read_bit():  # explicit max symbol budget
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if sym >= alphabet_size:
                    raise ValueError("code-length repeat overflow")
                lengths[sym] = prev_len
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise ValueError("code-length repeat overflow")
    return PrefixCode(lengths)


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_image_stream(br: BitReader, xsize: int, ysize: int,
                         is_level0: bool):
    """One entropy-coded ARGB image (spec "decoding of image data").

    Returns (argb int64 array of ysize*xsize, palette_width_bits) —
    the latter nonzero only when a level-0 color-indexing transform
    bundled pixels (the caller must then re-expand xsize).
    Transforms and the meta-prefix image are level-0-only.
    """
    transforms = []
    pal_bits = 0
    full_xsize = xsize  # pre-bundling width (color-indexing reduces it)
    if is_level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            if ttype == 2:  # subtract green: no payload
                transforms.append((2, None))
            elif ttype == 0 or ttype == 1:  # predictor / cross-color
                size_bits = br.read(3) + 2
                bw = _div_round_up(xsize, 1 << size_bits)
                bh = _div_round_up(ysize, 1 << size_bits)
                sub, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, (size_bits, sub)))
            elif ttype == 3:  # color indexing
                n_colors = br.read(8) + 1
                pal, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are component-wise delta coded
                pal = np.cumsum(
                    np.stack(_argb_channels(pal), 1), 0) & 0xFF
                palette = _pack_argb(pal[:, 0], pal[:, 1], pal[:, 2],
                                     pal[:, 3]).astype(np.int64)
                if n_colors <= 2:
                    pal_bits = 3
                elif n_colors <= 4:
                    pal_bits = 2
                elif n_colors <= 16:
                    pal_bits = 1
                transforms.append((3, (pal_bits, palette)))
                if pal_bits:
                    xsize = _div_round_up(xsize, 1 << pal_bits)

    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = _div_round_up(xsize, 1 << meta_bits)
        mh = _div_round_up(ysize, 1 << meta_bits)
        ent, _ = _decode_image_stream(br, mw, mh, False)
        meta = (((ent >> 16) & 0xFF) << 8) | ((ent >> 8) & 0xFF)
        n_groups = int(meta.max()) + 1
        meta = meta.reshape(mh, mw)

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),   # green+len+cache
            _read_prefix_code(br, 256),           # red
            _read_prefix_code(br, 256),           # blue
            _read_prefix_code(br, 256),           # alpha
            _read_prefix_code(br, 40),            # distance
        ))

    n_px = xsize * ysize
    out = np.zeros(n_px, dtype=np.int64)
    pos = 0
    while pos < n_px:
        if meta is not None:
            y, x = divmod(pos, xsize)
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        s = g[0].decode(br)
        if s < 256:  # literal
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
            pos += 1
        elif s < 280:  # LZ77 backward reference
            length = _prefix_decode(s - 256, br)
            dist = _plane_to_distance(_prefix_decode(g[4].decode(br), br),
                                      xsize)
            if dist > pos or pos + length > n_px:
                raise ValueError("backward reference out of range")
            for i in range(length):  # may self-overlap (dist < length)
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
                pos += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1

    # inverse transforms, reverse read order
    for ttype, data in reversed(transforms):
        if ttype == 3:
            bits, palette = data
            if bits:
                # re-expand bundled indices from the green channel,
                # cropping the round-up columns back to the true width
                greens = ((out.reshape(ysize, xsize) >> 8) & 0xFF)
                per = 1 << bits
                bpp = 8 >> bits
                xs = np.arange(full_xsize)
                out = (greens[:, xs // per] >> ((xs % per) * bpp)) \
                    & ((1 << bpp) - 1)
                xsize = full_xsize
            else:
                out = ((out >> 8) & 0xFF).reshape(ysize, xsize)
            if int(out.max()) >= len(palette):
                raise ValueError("palette index out of range")
            out = palette[out.reshape(-1)]
        elif ttype == 2:
            a, r, g_, b = _argb_channels(out)
            out = _pack_argb(a, (r + g_) & 0xFF, g_, (b + g_) & 0xFF)
        elif ttype == 0:
            out = _inverse_predictor(out.reshape(ysize, xsize), *data)
        else:
            out = _inverse_color_transform(out.reshape(ysize, xsize),
                                           *data)
        out = out.reshape(-1)

    return out, (pal_bits if is_level0 else 0)


def _inverse_predictor(img: np.ndarray, size_bits: int,
                       modes: np.ndarray) -> np.ndarray:
    """Spatial predictor inverse: residual + predict(neighbors), the
    14 spec modes, per-channel uint8 wraparound. (0,0) is predicted
    black; row 0 uses L; column 0 uses T, regardless of block mode."""
    h, w = img.shape
    bw = _div_round_up(w, 1 << size_bits)
    mode_g = ((modes >> 8) & 0xFF).reshape(-1, bw)
    out = img.copy()

    def ch(p):
        return np.array([(p >> 24) & 0xFF, (p >> 16) & 0xFF,
                         (p >> 8) & 0xFF, p & 0xFF], dtype=np.int64)

    def pack(c):
        return int((c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3])

    def avg2(a, b):
        return (a + b) >> 1

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = ch(int(out[0, x - 1]))
            elif x == 0:
                pred = ch(int(out[y - 1, 0]))
            else:
                mode = int(mode_g[y >> size_bits, x >> size_bits])
                L = ch(int(out[y, x - 1]))
                T = ch(int(out[y - 1, x]))
                TL = ch(int(out[y - 1, x - 1]))
                # at the right edge TR wraps to the current row's
                # first pixel (pos - width + 1), matching libwebp
                TR = ch(int(out[y - 1, x + 1])) if x + 1 < w \
                    else ch(int(out[y, 0]))
                if mode == 0:
                    pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:
                    # spec Select: pL = sum|T-TL| (= |p-L|), pT =
                    # sum|L-TL| (= |p-T|); TIES return T, not L
                    p = L + T - TL
                    pred = L if int(np.abs(p - L).sum()) < \
                        int(np.abs(p - T).sum()) else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    ave = avg2(L, T)
                    d = ave - TL
                    # C-truncating division toward zero
                    half = np.sign(d) * (np.abs(d) >> 1)
                    pred = np.clip(ave + half, 0, 255)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            res = ch(int(out[y, x]))
            out[y, x] = pack((res + pred) & 0xFF)
    return out


def _delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 multiplier × signed-int8
    channel, arithmetic >> 5."""
    t = t - 256 if t >= 128 else t
    c = c - 256 if c >= 128 else c
    return (t * c) >> 5


def _inverse_color_transform(img: np.ndarray, size_bits: int,
                             cte: np.ndarray) -> np.ndarray:
    h, w = img.shape
    bw = _div_round_up(w, 1 << size_bits)
    cte = cte.reshape(-1, bw)
    out = img.copy()
    for y in range(h):
        for x in range(w):
            e = int(cte[y >> size_bits, x >> size_bits])
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            px = int(out[y, x])
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + _delta(g2r, g)) & 0xFF
            b = (b + _delta(g2b, g)) & 0xFF
            b = (b + _delta(r2b, r)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def vp8l_decode(payload: bytes) -> np.ndarray:
    """Raw VP8L chunk payload → RGB uint8 (h, w, 3). Alpha is decoded
    (it participates in prediction/entropy) then dropped, matching the
    PNG/GIF router surfaces."""
    br = BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha-used hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    argb, _ = _decode_image_stream(br, w, h, True)
    argb = argb.reshape(h, w)
    rgb = np.stack([(argb >> 16) & 0xFF, (argb >> 8) & 0xFF,
                    argb & 0xFF], axis=2)
    return rgb.astype(np.uint8)


def decode(data: bytes) -> np.ndarray:
    """Full WebP file (RIFF container, plain or VP8X-extended) → RGB."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return vp8l_decode(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 requires perceptual DSP (environmental, "
                "like MP3/H.264) — only lossless VP8L decodes natively"
            )
        if fourcc in (b"ANIM", b"ANMF"):
            raise NotImplementedError(
                "animated WebP (ANIM/ANMF frames) is not decoded "
                "natively — single-frame lossless VP8L only"
            )
        pos += 8 + size + (size & 1)  # chunks pad to even
    raise ValueError("no VP8L chunk in WebP container")


# ----------------------------------------------------------- encoder

def _write_prefix_code(bw: BitWriter, lengths: list[int]) -> dict:
    """Emit one prefix code (simple form when <=2 symbols, else the
    code-length-coded normal form with 17/18 zero-run operators) and
    return the canonical symbol→(code, len) map for payload writing."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if len(used) <= 2 and max(used, default=0) < 256:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return {used[0]: (0, 1), used[1]: (1, 1)}

    bw.write(0, 1)  # normal
    # code-length alphabet: literals 0..15 plus 17/18 for zero runs
    ops: list[tuple[int, int, int]] = []  # (metasym, extra_bits, extra)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                take = min(left, 138)
                ops.append((18, 7, take - 11))
                left -= take
            while left >= 3:
                take = min(left, 10)
                ops.append((17, 3, take - 3))
                left -= take
            ops.extend((0, 0, 0) for _ in range(left))
            i += run
        else:
            ops.append((lengths[i], 0, 0))
            i += 1
    # NOTE: trailing zero runs are kept — the decoder reads
    # code-length ops until the alphabet is covered unless the
    # explicit max-symbol budget (which we don't emit) bounds it

    freqs: dict[int, int] = {}
    for m, _, _ in ops:
        freqs[m] = freqs.get(m, 0) + 1
    cl_lengths19 = [0] * 19
    if len(freqs) == 1:
        # pad with an unused metasymbol so the code stays complete
        only = next(iter(freqs))
        pad = 0 if only != 0 else 1
        cl_lengths19[only] = 1
        cl_lengths19[pad] = 1
    else:
        for m, l in _huffman_lengths(freqs, max_len=7).items():
            cl_lengths19[m] = l
    order_pos = {m: i for i, m in enumerate(_CODE_LENGTH_ORDER)}
    num_cl = max(4, 1 + max(order_pos[m]
                            for m, l in enumerate(cl_lengths19) if l))
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths19[_CODE_LENGTH_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max-symbol budget
    cl_codes = _canonical_codes(cl_lengths19)
    for m, eb, ev in ops:
        bw.write_code(cl_codes[m], cl_lengths19[m])
        if eb:
            bw.write(ev, eb)
    codes = _canonical_codes(lengths)
    return {s: (codes[s], lengths[s]) for s in used}


# symbolic ops for the two-pass encode (count freqs, then write)
_LIT, _COPY, _CACHE = 0, 1, 2


def _encode_image_stream(bw: BitWriter, argb: np.ndarray, xsize: int,
                         cache_bits: int = 0, use_lz77: bool = True,
                         level0: bool = False) -> None:
    """Entropy-code one ARGB sequence (no transforms — the caller has
    already applied/announced them). Greedy dist-1 / dist-row LZ77 +
    optional color cache; two passes (frequencies, then bits). The
    level-0 (main) image additionally carries the meta-prefix bit
    (always 0 here: one prefix group)."""
    seq = [int(v) for v in argb]
    n = len(seq)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if level0:
        bw.write(0, 1)  # no meta prefix image

    ops = []
    pos = 0
    while pos < n:
        best_len = 0
        best_dist = 0
        if use_lz77:
            for dist in (1, xsize):
                if dist == 0 or dist > pos:
                    continue
                ln = 0
                while pos + ln < n and ln < 4096 and \
                        seq[pos + ln] == seq[pos + ln - dist]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
        if best_len >= 3:
            ops.append((_COPY, best_len, best_dist))
            if cache is not None:
                for i in range(best_len):
                    px = seq[pos + i]
                    cache[_cache_index(px, cache_bits)] = px
            pos += best_len
            continue
        px = seq[pos]
        if cache is not None and cache[_cache_index(px, cache_bits)] == px:
            ops.append((_CACHE, _cache_index(px, cache_bits), 0))
        else:
            ops.append((_LIT, px, 0))
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
        pos += 1

    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for kind, v1, v2 in ops:
        if kind == _LIT:
            gf[(v1 >> 8) & 0xFF] = gf.get((v1 >> 8) & 0xFF, 0) + 1
            rf[(v1 >> 16) & 0xFF] = rf.get((v1 >> 16) & 0xFF, 0) + 1
            bf[v1 & 0xFF] = bf.get(v1 & 0xFF, 0) + 1
            af[(v1 >> 24) & 0xFF] = af.get((v1 >> 24) & 0xFF, 0) + 1
        elif kind == _COPY:
            lc, _, _ = _prefix_encode(v1)
            gf[256 + lc] = gf.get(256 + lc, 0) + 1
            dc, _, _ = _prefix_encode(_distance_to_code(v2, xsize))
            df[dc] = df.get(dc, 0) + 1
        else:
            gf[280 + v1] = gf.get(280 + v1, 0) + 1

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)

    def lengths_of(freqs: dict[int, int], size: int) -> list[int]:
        out = [0] * size
        if not freqs:
            out[0] = 1  # unused code still must be present & decodable
            return out
        for s, l in _huffman_lengths(freqs).items():
            out[s] = l
        return out

    tables = []
    for freqs, size in ((gf, green_alpha), (rf, 256), (bf, 256),
                        (af, 256), (df, 40)):
        tables.append(_write_prefix_code(bw, lengths_of(freqs, size)))
    gt, rt, bt, at, dt = tables

    for kind, v1, v2 in ops:
        if kind == _LIT:
            bw.write_code(*gt[(v1 >> 8) & 0xFF])
            bw.write_code(*rt[(v1 >> 16) & 0xFF])
            bw.write_code(*bt[v1 & 0xFF])
            bw.write_code(*at[(v1 >> 24) & 0xFF])
        elif kind == _COPY:
            lc, eb, ev = _prefix_encode(v1)
            bw.write_code(*gt[256 + lc])
            if eb:
                bw.write(ev, eb)
            dc, eb, ev = _prefix_encode(_distance_to_code(v2, xsize))
            bw.write_code(*dt[dc])
            if eb:
                bw.write(ev, eb)
        else:
            bw.write_code(*gt[280 + v1])


def encode(rgb: np.ndarray, *, predictor_mode: int | None = None,
           subtract_green: bool = False, palette: bool = False,
           color_transform: tuple[int, int, int] | None = None,
           cache_bits: int = 0, use_lz77: bool = True) -> bytes:
    """RGB uint8 (h, w, 3) → lossless WebP bytes.

    Feature subset by design (decode handles the full spec):
    ``palette`` emits a color-indexing transform (auto pixel bundling
    for <=16 colors, delta-coded palette); ``predictor_mode`` a
    fixed-mode predictor transform (its mode image costs 0 bits/px via
    trivial codes); ``color_transform`` a fixed cross-color transform
    as (green_to_red, green_to_blue, red_to_blue) signed-int8
    multipliers; ``subtract_green`` the 1-bit transform. Palette is
    mutually exclusive with the other transforms here (as in libwebp's
    encoder heuristics).
    """
    h, w, _ = rgb.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        # VP8L stores w-1/h-1 in 14-bit fields; the BitWriter would
        # silently mask larger dimensions into a spec-valid file with
        # WRONG size (round-8 ADVICE: a 16385-wide input round-tripped
        # as width 1) — fail loudly instead
        raise ValueError(
            f"VP8L lossless dimensions must be 1..16384, got {w}x{h}"
        )
    argb = _pack_argb(np.full((h, w), 0xFF, dtype=np.int64),
                      rgb[:, :, 0].astype(np.int64),
                      rgb[:, :, 1].astype(np.int64),
                      rgb[:, :, 2].astype(np.int64))
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version

    coded = argb.reshape(-1)
    coded_xsize = w

    if palette:
        assert predictor_mode is None and not subtract_green \
            and color_transform is None
        colors = np.unique(coded)
        n_colors = len(colors)
        assert n_colors <= 256, "palette transform needs <=256 colors"
        lut = {int(c): i for i, c in enumerate(colors)}
        idx = np.array([lut[int(v)] for v in coded], dtype=np.int64)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n_colors - 1, 8)
        # delta-coded palette, itself an entropy-coded image
        chans = np.stack(_argb_channels(colors.astype(np.int64)), 1)
        deltas = np.diff(np.vstack([np.zeros((1, 4), np.int64), chans]),
                         axis=0) & 0xFF
        pal_img = _pack_argb(deltas[:, 0], deltas[:, 1], deltas[:, 2],
                             deltas[:, 3])
        _encode_image_stream(bw, pal_img, n_colors, 0, use_lz77=False)
        if n_colors <= 2:
            bits = 3
        elif n_colors <= 4:
            bits = 2
        elif n_colors <= 16:
            bits = 1
        else:
            bits = 0
        if bits:
            per = 1 << bits
            bpp = 8 >> bits
            sub_w = _div_round_up(w, per)
            packed = np.zeros((h, sub_w), dtype=np.int64)
            grid = idx.reshape(h, w)
            for x in range(w):
                packed[:, x // per] |= grid[:, x] << ((x % per) * bpp)
            coded = _pack_argb(np.full(packed.shape, 0xFF, np.int64),
                               np.zeros(packed.shape, np.int64),
                               packed, np.zeros(packed.shape, np.int64)
                               ).reshape(-1)
            coded_xsize = sub_w
        else:
            coded = _pack_argb(np.full(idx.shape, 0xFF, np.int64),
                               np.zeros(idx.shape, np.int64), idx,
                               np.zeros(idx.shape, np.int64))
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            a, r, g, b = _argb_channels(coded)
            coded = _pack_argb(a, (r - g) & 0xFF, g, (b - g) & 0xFF)
        if color_transform is not None:
            g2r, g2b, r2b = (v & 0xFF for v in color_transform)
            size_bits = 4
            bw.write(1, 1)
            bw.write(1, 2)
            bw.write(size_bits - 2, 3)
            bwd = _div_round_up(w, 1 << size_bits)
            bhd = _div_round_up(h, 1 << size_bits)
            cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
            _encode_image_stream(
                bw, np.full(bwd * bhd, cte, dtype=np.int64), bwd, 0,
                use_lz77=False)
            # forward: subtract the deltas the decoder will add back
            # (blue uses the ORIGINAL red, which decode reconstructs
            # before the red_to_blue term)
            a, r, g, b = _argb_channels(coded)
            dr = np.array([_delta(g2r, int(v)) for v in g.reshape(-1)],
                          dtype=np.int64).reshape(g.shape)
            db = np.array([_delta(g2b, int(v)) for v in g.reshape(-1)],
                          dtype=np.int64).reshape(g.shape)
            db2 = np.array([_delta(r2b, int(v)) for v in r.reshape(-1)],
                           dtype=np.int64).reshape(r.shape)
            coded = _pack_argb(a, (r - dr) & 0xFF, g,
                               (b - db - db2) & 0xFF)
        if predictor_mode is not None:
            assert 0 <= predictor_mode <= 13
            size_bits = 4
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(size_bits - 2, 3)
            bwd = _div_round_up(w, 1 << size_bits)
            bhd = _div_round_up(h, 1 << size_bits)
            mode_img = np.full(bwd * bhd,
                               0xFF000000 | (predictor_mode << 8),
                               dtype=np.int64)
            _encode_image_stream(bw, mode_img, bwd, 0, use_lz77=False)
            coded = _predictor_residuals(
                coded.reshape(h, w), size_bits, predictor_mode
            ).reshape(-1)

    bw.write(0, 1)  # transform list terminator
    _encode_image_stream(bw, coded, coded_xsize, cache_bits, use_lz77,
                         level0=True)
    payload = bw.bytes()

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _predictor_residuals(img: np.ndarray, size_bits: int,
                         mode: int) -> np.ndarray:
    """Forward predictor: residual = pixel − predict(...). Reuses the
    inverse's mode arithmetic by reconstructing predictions in scan
    order against the ORIGINAL pixels (available to the encoder)."""
    h, w = img.shape
    out = np.zeros_like(img)
    bw = _div_round_up(w, 1 << size_bits)
    modes = np.full(bw * _div_round_up(h, 1 << size_bits),
                    0xFF000000 | (mode << 8), dtype=np.int64)
    # run the inverse machinery in "predict-only" form: for each
    # pixel the prediction depends on already-final neighbors (the
    # original image), so residual = px - pred channelwise
    mode_g = ((modes >> 8) & 0xFF).reshape(-1, bw)

    def ch(p):
        return np.array([(p >> 24) & 0xFF, (p >> 16) & 0xFF,
                         (p >> 8) & 0xFF, p & 0xFF], dtype=np.int64)

    def avg2(a, b):
        return (a + b) >> 1

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = ch(int(img[0, x - 1]))
            elif x == 0:
                pred = ch(int(img[y - 1, 0]))
            else:
                m = int(mode_g[y >> size_bits, x >> size_bits])
                L = ch(int(img[y, x - 1]))
                T = ch(int(img[y - 1, x]))
                TL = ch(int(img[y - 1, x - 1]))
                TR = ch(int(img[y - 1, x + 1])) if x + 1 < w \
                    else ch(int(img[y, 0]))
                if m == 0:
                    pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = avg2(avg2(L, TR), T)
                elif m == 6:
                    pred = avg2(L, TL)
                elif m == 7:
                    pred = avg2(L, T)
                elif m == 8:
                    pred = avg2(TL, T)
                elif m == 9:
                    pred = avg2(T, TR)
                elif m == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif m == 11:
                    p = L + T - TL
                    pred = L if int(np.abs(p - L).sum()) < \
                        int(np.abs(p - T).sum()) else T
                elif m == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                else:
                    ave = avg2(L, T)
                    d = ave - TL
                    half = np.sign(d) * (np.abs(d) >> 1)
                    pred = np.clip(ave + half, 0, 255)
            px = ch(int(img[y, x]))
            res = (px - pred) & 0xFF
            out[y, x] = int((res[0] << 24) | (res[1] << 16)
                            | (res[2] << 8) | res[3])
    return out
