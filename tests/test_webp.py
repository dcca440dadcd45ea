"""WebP lossless (VP8L) codec tests — `ingest_spark/functions/webp.py`.

Roundtrip goldens over every encoder config, the spec's 120-entry
distance map pinned literally against its generating rule, the color
cache hash, and hand-crafted bitstreams that exercise decoder-only
paths the encoder never emits (meta prefix groups, read-order simple
codes, linear distances)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ingest_spark.functions import webp
from ingest_spark.functions.webp import (
    BitReader, BitWriter, DISTANCE_MAP, PrefixCode, _cache_index,
    _distance_to_code, _plane_to_distance, _prefix_decode,
    _prefix_encode,
)


def _grad(h, w, b=99):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [x * 255 // max(w - 1, 1), y * 255 // max(h - 1, 1),
         (x * 3 + y * 7 + b) % 256], 2
    ).astype(np.uint8)


# ------------------------------------------------------ spec constants


class TestDistanceMap:
    def test_spec_prefix_pinned(self):
        # first 24 entries exactly as listed in the WebP lossless
        # bitstream specification (RFC 9649) distance-mapping table
        assert DISTANCE_MAP[:24] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
            (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
            (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
            (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        ]

    def test_spec_tail_pinned(self):
        # last spec rows: ..., (8,5), (7,7), (-7,7), (8,6), (8,7)
        assert DISTANCE_MAP[-5:] == [
            (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
        ]
        assert DISTANCE_MAP[96] == (8, 0)
        assert len(DISTANCE_MAP) == 120
        assert len(set(DISTANCE_MAP)) == 120

    def test_domain(self):
        for dx, dy in DISTANCE_MAP:
            assert 0 <= dy <= 7 and -7 <= dx <= 8
            assert dy > 0 or dx > 0  # causal only

    def test_roundtrip_through_codes(self):
        for xsize in (1, 3, 9, 64, 1000):
            for dist in (1, 2, xsize - 1 or 1, xsize, xsize + 5,
                         7 * xsize + 8, 2_000_000):
                code = _distance_to_code(dist, xsize)
                assert _plane_to_distance(code, xsize) == dist

    def test_small_codes(self):
        # code 1 = pixel above, code 2 = previous pixel
        assert _plane_to_distance(1, 50) == 50
        assert _plane_to_distance(2, 50) == 1
        assert _plane_to_distance(121, 50) == 1  # linear offset by 120


class TestPrefixArith:
    def test_length_prefix_roundtrip(self):
        bw = BitWriter()
        values = [1, 2, 3, 4, 5, 6, 7, 8, 9, 16, 17, 100, 4096]
        for v in values:
            code, eb, ev = _prefix_encode(v)
            assert code < 24
            bw.write(ev, eb)
        br = BitReader(bw.bytes())
        for v in values:
            code, _, _ = _prefix_encode(v)
            assert _prefix_decode(code, br) == v

    def test_cache_hash_spec_multiplier(self):
        # 0x1e35a7bd is the spec constant; pin one known product
        assert _cache_index(0xFF000000, 8) == \
            ((0x1E35A7BD * 0xFF000000) & 0xFFFFFFFF) >> 24


# ---------------------------------------------------------- roundtrip


class TestRoundtrip:
    @pytest.mark.parametrize("mode", range(14))
    def test_all_predictor_modes(self, mode):
        rgb = _grad(17, 23)
        out = webp.decode(webp.encode(rgb, predictor_mode=mode))
        assert (out == rgb).all()

    @pytest.mark.parametrize("n_colors,expect_bundled", [
        (2, True), (3, True), (4, True), (9, True), (16, True),
        (17, False), (200, False),
    ])
    def test_palette_bundling(self, n_colors, expect_bundled):
        rng = np.random.default_rng(n_colors)
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        idx = (np.arange(23 * 19).reshape(23, 19)
               * 7 + n_colors) % n_colors
        rgb = pal[idx]
        data = webp.encode(rgb, palette=True)
        assert (webp.decode(data) == rgb).all()

    def test_cross_color_extremes(self):
        rgb = _grad(16, 16)
        for ct in [(0, 0, 0), (127, 127, 127), (128, 128, 128),
                   (255, 1, 77)]:
            assert (webp.decode(webp.encode(rgb, color_transform=ct))
                    == rgb).all()

    def test_stacked_transforms(self):
        rgb = _grad(20, 14)
        data = webp.encode(rgb, subtract_green=True,
                           color_transform=(30, 200, 5),
                           predictor_mode=11, cache_bits=5)
        assert (webp.decode(data) == rgb).all()

    def test_random_images(self):
        rng = np.random.default_rng(42)
        for _ in range(5):
            h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
            rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (webp.decode(webp.encode(rgb, cache_bits=7)) ==
                    rgb).all()

    def test_lz77_runs(self):
        # long horizontal + vertical runs hit dist=1 and dist=row
        row = np.tile(np.array([[10, 20, 30]], dtype=np.uint8), (1, 64, 1))
        img = np.tile(row, (48, 1, 1))
        data = webp.encode(img)
        assert (webp.decode(data) == img).all()
        assert len(data) < 200  # runs must actually compress

    def test_edge_dims(self):
        for h, w in [(1, 1), (1, 64), (64, 1), (2, 2)]:
            rgb = _grad(h, w)
            assert (webp.decode(webp.encode(rgb)) == rgb).all()


# ------------------------------------------------------- container


class TestContainer:
    def test_vp8x_wrapped(self):
        rgb = _grad(11, 13)
        plain = webp.encode(rgb)
        vp8l = plain[12:]
        vp8x = struct.pack("<I", 0) + struct.pack("<I", 12)[:3] \
            + struct.pack("<I", 10)[:3]
        body = b"WEBP" + b"VP8X" + struct.pack("<I", len(vp8x)) \
            + vp8x + vp8l
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        assert (webp.decode(data) == rgb).all()

    def test_lossy_vp8_raises(self):
        body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\0\0\0\0"
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError):
            webp.decode(data)

    def test_not_webp(self):
        with pytest.raises(ValueError):
            webp.decode(b"RIFF\x04\x00\x00\x00WAVE")

    def test_truncated(self):
        data = webp.encode(_grad(9, 9))
        with pytest.raises(ValueError):
            webp.vp8l_decode(data[20:28])


# -------------------------------------- decoder-only paths (crafted)


def _write_trivial_codes(bw, *symbols):
    """Five single-symbol simple codes (g, r, b, a, dist)."""
    for sym in symbols:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if sym < 2:
            bw.write(0, 1)
            bw.write(sym, 1)
        else:
            bw.write(1, 1)
            bw.write(sym, 8)


class TestCraftedStreams:
    def test_meta_prefix_groups(self):
        """Two prefix groups via an entropy image: left half decodes
        green=5, right half green=200 — zero payload bits per pixel,
        group routing does all the work."""
        w = h = 8
        bw = BitWriter()
        bw.write(0x2F, 8)
        bw.write(w - 1, 14)
        bw.write(h - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no color cache
        bw.write(1, 1)  # meta prefix present
        bw.write(0, 3)  # meta_bits = 2 -> 2x2 entropy image
        # entropy image (2x2): its own stream — no cache, 5 codes;
        # green holds the group id (red=0 so index = green)
        bw.write(0, 1)  # entropy image: no color cache
        # green code: simple 2-symbol {0,1}; others trivial
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        bw.write(0, 1)
        bw.write(0, 1)  # sym0 = 0 (1-bit form)
        bw.write(1, 8)  # sym1 = 1
        _write_trivial_codes(bw, 0)        # red = 0
        _write_trivial_codes(bw, 0, 255, 0)  # blue, alpha, dist
        # 4 entropy pixels: groups 0,1,0,1 (left col 0, right col 1)
        for g in (0, 1, 0, 1):
            bw.write(g, 1)
        # group 0: green literal 5; group 1: green literal 200 — all
        # channels trivial so pixels cost zero bits
        _write_trivial_codes(bw, 5, 1, 2, 255, 0)
        _write_trivial_codes(bw, 200, 3, 4, 255, 0)
        rgb = webp.vp8l_decode(bw.bytes())
        assert rgb.shape == (8, 8, 3)
        assert (rgb[:, :4] == [1, 5, 2]).all()
        assert (rgb[:, 4:] == [3, 200, 4]).all()

    def test_simple_code_read_order(self):
        """A 2-symbol simple code listing the LARGER symbol first:
        bit 0 must map to the first-READ symbol, not the smaller one
        (read-order, not canonical, assignment)."""
        br_bits = BitWriter()
        br_bits.write(1, 1)   # simple
        br_bits.write(1, 1)   # two symbols
        br_bits.write(1, 1)   # 8-bit first symbol
        br_bits.write(200, 8)
        br_bits.write(7, 8)
        from ingest_spark.functions.webp import _read_prefix_code
        code = _read_prefix_code(BitReader(br_bits.bytes()), 256)
        r = BitReader(bytes([0b10]))  # bits: 0 then 1
        assert code.decode(r) == 200
        assert code.decode(r) == 7

    def test_linear_distance_exact(self):
        """Crafted stream: 13 literals then a copy at linear distance
        13 (code 133 > 120)."""
        w, h = 7, 2
        code_val, eb, ev = _prefix_encode(133)
        bw = BitWriter()
        bw.write(0x2F, 8)
        bw.write(w - 1, 14)
        bw.write(h - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        from ingest_spark.functions.webp import _write_prefix_code
        g_lengths = [0] * 280
        g_lengths[10] = 1
        g_lengths[20] = 2
        g_lengths[256] = 2  # length 1 copies
        gmap = _write_prefix_code(bw, g_lengths)
        _write_trivial_codes(bw, 1)    # red
        _write_trivial_codes(bw, 2)    # blue
        _write_trivial_codes(bw, 255)  # alpha
        d_lengths = [0] * 40
        d_lengths[code_val] = 1
        d_lengths[0] = 1
        dmap = _write_prefix_code(bw, d_lengths)
        # 13 literals: 12x green=10, then green=20
        for _ in range(12):
            bw.write_code(*gmap[10])
        bw.write_code(*gmap[20])
        # copy length 1, distance 133-120=13 => first pixel
        bw.write_code(*gmap[256])
        bw.write_code(*dmap[code_val])
        bw.write(ev, eb)
        rgb = webp.vp8l_decode(bw.bytes())
        assert rgb.shape == (2, 7, 3)
        flat = rgb.reshape(-1, 3)
        assert (flat[12] == [1, 20, 2]).all()
        assert (flat[13] == [1, 10, 2]).all()  # copied from pixel 0

    def test_overlapping_copy(self):
        """LZ77 with length > distance self-overlaps (run fill)."""
        rgb = np.zeros((1, 40, 3), dtype=np.uint8)
        rgb[0, 0] = [9, 9, 9]
        rgb[0, 1:] = [9, 9, 9]
        assert (webp.decode(webp.encode(rgb)) == rgb).all()


class TestRouterIntegration:
    def test_decode_rgb_routes_webp(self):
        from ingest_spark.operators.multimodal import _decode_rgb
        rgb = _grad(12, 12)
        out = _decode_rgb(webp.encode(rgb, subtract_green=True),
                          False, 0, 0)
        assert (np.round(out * 255).astype(np.uint8) == rgb).all()

    def test_synthetic_corpus_patterns_deterministic(self):
        from ingest_spark.operators.multimodal import (
            synthetic_compressed_pixels,
        )
        a = synthetic_compressed_pixels(5, "webp", 13, 10)
        b = synthetic_compressed_pixels(5, "webp", 13, 10)
        assert (a == b).all()
        # palette rows stay within 16 colors so the palette transform
        # (with bundling) is encodable
        pal_row = synthetic_compressed_pixels(9, "webp", 14, 11)
        colors = np.unique(pal_row.reshape(-1, 3), axis=0)
        assert len(colors) <= 16


class TestReviewFixes:
    """Round-7 self-review regressions."""

    def test_select_tie_returns_top(self):
        """Spec Select: pL < pT → L, TIES → T (libwebp
        pa_minus_pb <= 0 → top). L=(255,10,0,0), T=(255,0,10,0),
        TL=black gives pL == pT == 10 with L != T."""
        import numpy as np
        from ingest_spark.functions.webp import _inverse_predictor
        res = np.zeros((2, 2), dtype=np.int64)
        res[0, 0] = 0xFF000000                      # TL = black
        res[0, 1] = (10) << 8                       # T = a255 g10 (L-rule row)
        res[1, 0] = (10) << 16                      # L = a255 r10 (T-rule col)
        res[1, 1] = 0                               # zero residual: pure pred
        modes = np.full(1, 0xFF000000 | (11 << 8), dtype=np.int64)
        out = _inverse_predictor(res, 4, modes)
        T = int(out[0, 1])
        assert int(out[1, 1]) == T  # tie resolves to TOP, not left

    def test_animated_raises_not_implemented(self):
        import struct
        body = b"WEBP" + b"ANIM" + struct.pack("<I", 6) + b"\0" * 6
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError, match="animated"):
            webp.decode(data)

    def test_fake_mode_pseudo_decodes_lossy_webp(self):
        import struct
        import numpy as np
        from ingest_spark.operators.multimodal import _decode_rgb
        body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\0\0\0\0"
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError):
            _decode_rgb(data, False, 8, 8)
        px = _decode_rgb(data, True, 8, 8)  # falls through to fake
        assert px.shape == (8, 8, 3)
        # corrupt container still raises even in fake mode
        bad = b"RIFF\x00\x01\x00\x00WEBP" + b"\x00" * 32
        with pytest.raises(ValueError):
            _decode_rgb(bad, True, 8, 8)

    def test_page_id_overflow_takes_surrogate(self):
        from ingest_spark.operators.webtext import page_id_of
        big = "https://x.org/p/" + "9" * 25
        pid = page_id_of(big)
        assert 0 <= pid < 2 ** 63
        assert pid != int("9" * 25)
        assert page_id_of(big) == pid        # stable
        assert page_id_of("https://x.org/p/41") == 41  # fast path kept
