"""Pure-python codec tests: baseline JPEG (ITU-T T.81) and GIF/LZW.

No Spark needed — these pin the byte-level codec layer that
`operators/multimodal.py` routes to. Spark-side plumbing (generator,
decode stats, contract query) is covered in test_webtext.py and the
`multimodal_compressed_decode` driver oracle.
"""

import numpy as np
import pytest

from ingest_spark.functions import gif, jpeg


RNG = np.random.default_rng(20260817)


def _gradient(h, w, b=77):
    y, x = np.mgrid[0:h, 0:w]
    r = x * 255 // max(w - 1, 1)
    g = y * 255 // max(h - 1, 1)
    return np.stack([r, g, np.full_like(r, b)], axis=2).astype(np.uint8)


class TestJPEG:
    def test_roundtrip_smooth_error_bounds(self):
        for (h, w) in ((8, 8), (17, 23), (24, 40), (33, 31)):
            img = _gradient(h, w)
            for sub in (False, True):
                dec = jpeg.decode(jpeg.encode(img, quality=90, subsample=sub))
                assert dec.shape == img.shape
                err = np.abs(dec.astype(int) - img.astype(int)).max()
                # 4:2:0 loss scales with the chroma gradient step —
                # 255/(w−1) per px, so the 8×8 ramp is the worst case
                bound = 40 if sub else 12
                assert err <= bound, (h, w, sub, err)

    def test_quality_100_is_near_exact(self):
        # quality 100 → all-ones quant tables: only DCT float rounding
        # remains, so 4:4:4 error is ≤2 per channel even on noise
        img = RNG.integers(0, 256, (16, 24, 3), dtype=np.uint8)
        dec = jpeg.decode(jpeg.encode(img, quality=100, subsample=False))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    def test_restart_markers_roundtrip_and_present(self):
        img = _gradient(32, 32)
        data = jpeg.encode(img, quality=85, restart_interval=2)
        # DRI marker emitted and at least one RSTn in the entropy stream
        assert b"\xff\xdd" in data
        assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
        dec = jpeg.decode(data)
        base = jpeg.decode(jpeg.encode(img, quality=85))
        # restart segmentation must not change decoded pixels
        assert (dec == base).all()

    def test_422_subsampling_decodes(self):
        img = _gradient(19, 27)
        dec = jpeg.decode(jpeg.encode(img, quality=90, subsample=(2, 1)))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 28

    def test_dqt_segment_is_annex_k_zigzag(self):
        # the first 10 zigzag-ordered entries of the Annex-K luminance
        # table are published literals — independent of our ZIGZAG array
        data = jpeg.encode(_gradient(8, 8), quality=50)
        i = data.index(b"\xff\xdb")
        seg = data[i + 5:i + 5 + 64]  # skip marker, length, Pq/Tq byte
        assert list(seg[:10]) == [16, 11, 12, 14, 12, 10, 16, 14, 13, 14]

    def test_canonical_huffman_codes(self):
        codes = jpeg._huff_codes(jpeg.DC_LUMA_SPEC)
        # published canonical assignment for the standard DC luma table
        assert codes[0] == (0b00, 2)
        assert codes[1] == (0b010, 3)
        assert codes[5] == (0b110, 3)
        assert codes[6] == (0b1110, 4)
        assert codes[7] == (0b11110, 5)
        ac = jpeg._huff_codes(jpeg.AC_LUMA_SPEC)
        assert ac[0x01] == (0b00, 2)       # first AC symbol
        assert ac[0x00] == (0b1010, 4)     # EOB
        assert ac[0xF0] == (0b11111111001, 11)  # ZRL

    def test_fdct_matches_direct_t81_formula(self):
        block = RNG.integers(-128, 128, (8, 8)).astype(np.float64)
        m = jpeg._DCT_M
        fast = m @ block @ m.T
        direct = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                cv = 1 / np.sqrt(2) if v == 0 else 1.0
                s = 0.0
                for y in range(8):
                    for x in range(8):
                        s += (block[y, x]
                              * np.cos((2 * x + 1) * v * np.pi / 16)
                              * np.cos((2 * y + 1) * u * np.pi / 16))
                direct[u, v] = s * cu * cv / 4
        assert np.abs(fast - direct).max() < 1e-9

    def test_unsupported_process_rejected(self):
        data = bytearray(jpeg.encode(_gradient(8, 8)))
        i = bytes(data).index(b"\xff\xc0")
        data[i + 1] = 0xC3  # SOF3: lossless sequential — unsupported
        with pytest.raises(NotImplementedError, match="SOF"):
            jpeg.decode(bytes(data))
        # SOF0 -> SOF2 relabeling of a single full-band scan still
        # decodes identically (baseline is the Ss=0/Se=63 special case
        # of the progressive machinery)
        img = _gradient(16, 16)
        base = bytearray(jpeg.encode(img, quality=85))
        j = bytes(base).index(b"\xff\xc0")
        base[j + 1] = 0xC2
        assert (jpeg.decode(bytes(base))
                == jpeg.decode(jpeg.encode(img, quality=85))).all()

    def test_non_jpeg_rejected(self):
        with pytest.raises(ValueError):
            jpeg.decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)

    def test_quality_scaling_monotone_size(self):
        img = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        sizes = [len(jpeg.encode(img, quality=q)) for q in (25, 60, 95)]
        assert sizes[0] < sizes[1] < sizes[2]


def _paletted(h, w, n_colors, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w))
    return pal[idx]


class TestGIF:
    def test_roundtrip_lossless(self):
        for (h, w, n) in ((1, 1, 1), (8, 8, 2), (20, 33, 16), (16, 16, 250)):
            img = _paletted(h, w, n, seed=h * w)
            dec = gif.decode(gif.encode(img))
            assert dec.shape == img.shape
            assert (dec == img).all(), (h, w, n)

    def test_dictionary_reset_path(self):
        # 128×128 random 256-color frame: LZW table exceeds 4096 → the
        # clear-code reset path runs on both sides
        img = _paletted(128, 128, 250, seed=9)
        data = gif.encode(img)
        assert (gif.decode(data) == img).all()
        # sub-block splitting exercised too
        assert len(data) > 255 + 13

    def test_interlaced_decode(self):
        # hand-build an interlaced stream: rows stored in 4-pass order
        img = _paletted(13, 7, 8, seed=3)
        pal, idx = gif._palette(img)
        h, w = img.shape[:2]
        order = [y for start, step in gif._INTERLACE_PASSES
                 for y in range(start, h, step)]
        stored = idx.reshape(h, w)[order].reshape(-1)
        bits = max(1, int(len(pal) - 1).bit_length())
        import struct
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
        padded = np.zeros(((1 << bits), 3), np.uint8)
        padded[:len(pal)] = pal
        out += padded.tobytes()
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
        min_code = max(2, bits)
        out.append(min_code)
        lzw = gif._lzw_compress(stored, min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00\x3b"
        assert (gif.decode(bytes(out)) == img).all()

    def test_local_color_table_and_extensions(self):
        # rebuild an encoded stream with the palette moved to a LOCAL
        # color table plus a graphic-control extension in front
        img = _paletted(6, 9, 4, seed=1)
        data = gif.encode(img)
        import struct
        sw, sh, flags, bg, ar = struct.unpack("<HHBBB", data[6:13])
        n = 2 << (flags & 0x07)
        gct = data[13:13 + 3 * n]
        rest = data[13 + 3 * n:]  # image descriptor onward
        assert rest[0] == 0x2C
        hdr = bytearray(data[:6])
        hdr += struct.pack("<HHBBB", sw, sh, flags & 0x7F, bg, ar)  # no GCT
        hdr += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE extension
        hdr += rest[:9] + bytes([0x80 | (flags & 0x07)]) + gct + rest[10:]
        assert (gif.decode(bytes(hdr)) == img).all()

    def test_too_many_colors_rejected(self):
        img = np.arange(600 * 3, dtype=np.uint8).reshape(-1, 3)[:600]
        img = img.reshape(20, 30, 3).copy()
        img[..., 0] = np.arange(600).reshape(20, 30) % 256
        img[..., 1] = np.arange(600).reshape(20, 30) // 256
        with pytest.raises(ValueError, match="256"):
            gif.encode(img)

    def test_non_gif_rejected(self):
        with pytest.raises(ValueError):
            gif.decode(b"BM" + b"\x00" * 32)


class TestGeneratorGrid:
    def test_compressed_grid_error_pins(self):
        """Pin the measured worst-case decode error of the contract
        generator grid (multimodal.JPEG_TOL documents these numbers)."""
        from ingest_spark.operators.multimodal import (
            JPEG_TOL, _decode_rgb, synthetic_compressed_pixels)
        from ingest_spark.operators.multimodal import png_encode

        worst = {"444": 0, "420": 0}
        for m in range(0, 120):
            fmt = ["jpeg", "gif", "png"][m % 3]
            w, h = 12 + m % 13, 12 + (m * 5) % 17
            px = synthetic_compressed_pixels(m, fmt, w, h)
            if fmt == "jpeg":
                sub = (m // 3) % 2 == 1
                enc = jpeg.encode(px, quality=90, subsample=sub,
                                  restart_interval=2 if m % 9 == 0 else 0)
            elif fmt == "gif":
                enc = gif.encode(px)
            else:
                enc = png_encode(px, filter_type=(m // 3) % 5)
            dec = np.round(_decode_rgb(enc, False, 0, 0) * 255).astype(int)
            err = int(np.abs(dec - px.astype(int)).max())
            if fmt == "jpeg":
                worst["420" if sub else "444"] = max(
                    worst["420" if sub else "444"], err)
            else:
                assert err == 0, (m, fmt, err)
        assert worst["444"] <= 12, worst
        assert worst["420"] <= 28, worst
        assert max(worst.values()) <= JPEG_TOL


class TestProgressiveJPEG:
    def test_progressive_equals_baseline_exactly(self):
        """The final coefficients of a progressive stream equal the
        baseline encoding's, so decoded pixels must match bit-exactly
        — this pins every §G path: DC/AC first + refinement, EOBRUN,
        ZRL-in-refinement, custom per-scan DHTs, non-interleaved
        component grids (ceil dims, not MCU-padded)."""
        rng = np.random.default_rng(11)
        cases = [
            _gradient(17, 23),          # non-MCU-aligned grid
            rng.integers(0, 256, (24, 40, 3), dtype=np.uint8),
            np.full((16, 16, 3), 200, np.uint8),
        ]
        for img in cases:
            for sub in (False, True):
                for q in (30, 85):
                    base = jpeg.decode(jpeg.encode(
                        img.astype(np.uint8), quality=q, subsample=sub))
                    prog = jpeg.decode(jpeg.encode_progressive(
                        img.astype(np.uint8), quality=q, subsample=sub))
                    assert (base == prog).all(), (img.shape, sub, q)

    def test_progressive_markers_and_structure(self):
        data = jpeg.encode_progressive(_gradient(16, 16))
        assert b"\xff\xc2" in data          # SOF2
        assert data.count(b"\xff\xda") == 14  # the 14-scan script
        # per-scan custom DHTs: 2 DC up front + 12 AC
        assert data.count(b"\xff\xc4") == 14

    def test_progressive_restart_markers(self):
        img = _gradient(33, 31)
        data = jpeg.encode_progressive(img, quality=85, restart_interval=2)
        assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
        base = jpeg.decode(jpeg.encode(img, quality=85))
        assert (jpeg.decode(data) == base).all()

    def test_truncated_progressive_still_decodes(self):
        # a progressive stream cut after the early scans decodes to a
        # coarse image — the property the format exists for; decoding
        # must not raise. Cut right before the 8th SOS and append EOI.
        img = _gradient(32, 32)
        data = jpeg.encode_progressive(img, quality=85)
        idx = -1
        for _ in range(8):
            idx = data.index(b"\xff\xda", idx + 1)
        coarse = jpeg.decode(data[:idx] + b"\xff\xd9")
        assert coarse.shape == img.shape
        # coarse pass carries the DC at reduced precision: within a
        # quant step + subsampling of the real image on this gradient
        full = jpeg.decode(jpeg.encode(img, quality=85))
        assert np.abs(coarse.astype(int) - full.astype(int)).mean() < 32
