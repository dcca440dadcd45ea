"""Charset cascade goldens — divergent-byte fixtures where decoding
under the wrong stage/label produces *different characters*, so any
priority or normalization drift fails loudly (the silent-mojibake
failure mode the module exists to prevent)."""

import pytest

from ingest_spark.functions import charset as cs
from ingest_spark.operators import webtext as wt


class TestSniffPriority:
    def test_bom_beats_header(self):
        body = b"\xff\xfe" + "hi".encode("utf-16-le")
        text, name, src, ok = cs.decode_html(
            body, "text/html; charset=utf-8")
        assert (name, src, ok) == ("utf-16le", "bom", True)
        assert text == "hi"  # BOM stripped — no U+FEFF leaks

    def test_utf8_bom(self):
        text, name, src, ok = cs.decode_html(
            b"\xef\xbb\xbfabc", "text/html")
        assert (text, name, src, ok) == ("abc", "utf-8", "bom", True)

    def test_utf16be_bom(self):
        body = b"\xfe\xff" + "Zü".encode("utf-16-be")
        text, name, src, ok = cs.decode_html(body, "")
        assert (text, name, src) == ("Zü", "utf-16be", "bom")

    def test_header_beats_meta(self):
        # cp1252 0xE9 = é; under the meta's claimed utf-8 it would be
        # an invalid continuation byte → replacement char
        body = ('<meta charset="utf-8"><p>caf\xe9</p>'
                .encode("cp1252"))
        text, name, src, ok = cs.decode_html(
            body, "text/html; charset=iso-8859-1")
        assert (name, src, ok) == ("windows-1252", "header", True)
        assert "café" in text

    def test_meta_used_when_header_silent(self):
        body = '<meta charset="shift_jis"><p>日本</p>'.encode(
            "cp932")
        text, name, src, ok = cs.decode_html(body, "text/html")
        assert (name, src, ok) == ("shift_jis", "meta", True)
        assert "日本" in text

    def test_bogus_header_falls_through_to_meta(self):
        body = '<meta charset="shift_jis"><p>テ</p>'.encode("cp932")
        _, name, src, _ = cs.decode_html(
            body, "text/html; charset=x-klingon")
        assert (name, src) == ("shift_jis", "meta")

    def test_nothing_declared_defaults_utf8(self):
        text, name, src, ok = cs.decode_html(b"<p>plain</p>", "text/html")
        assert (name, src, ok) == ("utf-8", "default", True)

    def test_meta_outside_prescan_window_ignored(self):
        body = (b"<p>" + b"x" * cs.PRESCAN_BYTES +
                b'</p><meta charset="shift_jis">')
        _, name, src, _ = cs.decode_html(body, "")
        assert (name, src) == ("utf-8", "default")

    def test_meta_http_equiv_form(self):
        body = (b'<meta http-equiv="Content-Type" '
                b'content="text/html; charset=windows-1251"><p>\xc4</p>')
        text, name, src, _ = cs.decode_html(body, "")
        assert (name, src) == ("windows-1251", "meta")
        assert "Д" in text  # 0xC4 is Д in cp1251, Ä in cp1252


class TestLabelNormalization:
    def test_latin1_is_windows1252(self):
        # 0x93 is UNDEFINED in true ISO-8859-1 but “ in cp1252 —
        # the WHATWG superset rule this test pins
        text, name, _, ok = cs.decode_html(
            b"\x93quoted\x94", "text/html; charset=latin-1")
        assert name == "windows-1252" and ok
        assert text == "“quoted”"

    def test_ascii_label_is_windows1252(self):
        assert cs.normalize_label("US-ASCII") == ("windows-1252", "cp1252")

    def test_gb2312_label_uses_gbk_decoder(self):
        name, codec = cs.normalize_label("GB2312")
        assert (name, codec) == ("gbk", "gbk")

    def test_shift_jis_decodes_as_cp932(self):
        assert cs.normalize_label("Shift_JIS") == ("shift_jis", "cp932")

    def test_quoted_and_spaced_header_param(self):
        _, name, src, _ = cs.decode_html(
            b"abc", 'text/html; charset="UTF-8"')
        assert (name, src) == ("utf-8", "header")

    def test_unknown_label_is_none(self):
        assert cs.normalize_label("x-bogus-enc") is None


class TestDecodeOk:
    def test_invalid_utf8_flags_and_replaces(self):
        text, name, src, ok = cs.decode_html(
            b"bad\xffbyte", "text/html; charset=utf-8")
        assert not ok and text == "bad�byte"
        assert (name, src) == ("utf-8", "header")

    def test_divergent_bytes_same_payload_two_charsets(self):
        # identical bytes, two header labels → different text; a
        # cascade that ignores the header can't produce both
        payload = b"\x83e\x83X"  # cp932: テス ; cp1252: ƒeƒX
        sjis, *_ = cs.decode_html(payload, "text/html; charset=shift_jis")
        w1252, *_ = cs.decode_html(
            payload, "text/html; charset=windows-1252")
        assert sjis == "テス" and w1252 == "ƒeƒX"
        assert sjis != w1252

    def test_truncated_multibyte_not_ok(self):
        _, _, _, ok = cs.decode_html(
            "日".encode("utf-8")[:2], "text/html; charset=utf-8")
        assert not ok


class TestCorpusGoldens:
    """Every charset_page variant decodes end-to-end to its
    closed-form text (the same facts the webtext_charset oracle
    pins), and blind utf-8 decoding provably diverges on the
    non-utf-8 variants."""

    @pytest.mark.parametrize("pid", range(16))
    def test_variant_roundtrip(self, pid):
        ctype, body = wt.charset_page(pid)
        text, _, _, ok = cs.decode_html(body, ctype)
        from ingest_spark.functions import htmltext
        d = htmltext.extract(text)
        assert d["text"] == f"{wt._CS_MARKS[pid % 8]} page {pid}"
        assert d["title"] == f"C{pid}"
        assert ok == (pid % 8 != 6)

    @pytest.mark.parametrize("pid", [1, 2, 3, 4])
    def test_blind_utf8_would_mojibake(self, pid):
        ctype, body = wt.charset_page(pid)
        right, *_ = cs.decode_html(body, ctype)
        blind = body.decode("utf-8", "replace")
        assert right != blind


class TestPageIdFallback:
    def test_numeric_tail_fast_path(self):
        assert wt.page_id_of("https://e.org/doc/42") == 42

    def test_non_numeric_tail_gets_stable_surrogate(self):
        a = wt.page_id_of("https://e.org/about.html")
        b = wt.page_id_of("https://e.org/about.html")
        c = wt.page_id_of("https://e.org/contact.html")
        assert a == b and a != c and a >= 0
