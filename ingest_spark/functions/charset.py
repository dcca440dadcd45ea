"""Charset sniffing + decoding for crawled HTML — pure stdlib codecs.

Real crawl slices are ~5-10% non-UTF-8 (windows-1252, shift_jis,
gb2312, …); decoding every payload as UTF-8-with-replacement corrupts
their text *silently* — mojibake flows into tokens, quality scores and
dedup sketches. This module implements the detection cascade a real
fetcher runs, in the WHATWG-specified priority order:

1. **BOM** — a byte-order mark wins over everything (the document
   asserts its own encoding at byte 0): UTF-8 / UTF-16LE / UTF-16BE.
2. **HTTP header** — the ``charset=`` parameter of the transport
   ``Content-Type`` header.
3. **meta prescan** — a ``<meta charset=…>`` or ``http-equiv``
   declaration found within the first `PRESCAN_BYTES` bytes of the
   payload (the HTML-spec prescan window; declarations past it are
   ignored, as browsers ignore them).
4. **UTF-8 fallback** — decode as UTF-8 with replacement.

Labels are normalized per a WHATWG encoding-standard subset: notably
``latin1`` / ``iso-8859-1`` / ``ascii`` all decode as **windows-1252**
(the spec rule — real pages labelled latin-1 routinely use the 0x80-9F
curly-quote range that only cp1252 defines), ``shift_jis`` decodes as
windows-31j (cp932), ``gb2312`` as GBK, ``euc-kr`` as windows-949 and
``big5`` with the HKSCS extension. An unrecognized label at any stage
falls through to the next stage (a bogus header charset must not mask
a valid meta declaration).

`decode_html` reports what it did: the canonical charset name, which
stage supplied it, and ``decode_ok`` — whether a *strict* decode
succeeded (False means replacement characters were substituted, the
signal a quality-filtering pipeline keys on).

Reference analog: the per-payload decode-fidelity invariant of the
reference pipeline (SURVEY.md §5 — byte-identical extracted text per
url); charset detection is what makes that invariant achievable on a
real multi-charset crawl rather than only on ASCII fixtures.

Scale note: pure per-payload Python over bytes already in memory
(runs inside the same mapInPandas batch as the WARC parse — no extra
pass, no shuffle); the prescan regex touches ≤1024 bytes.
"""

from __future__ import annotations

import re

#: HTML-spec prescan window: meta declarations beyond this offset are
#: ignored (browsers give up after 1024 bytes).
PRESCAN_BYTES = 1024

# WHATWG label → (canonical name, python codec). Subset of
# https://encoding.spec.whatwg.org/#names-and-labels covering the
# encodings that actually occur in web crawls.
_W1252 = ("windows-1252", "cp1252")
_LABELS: "dict[str, tuple[str, str]]" = {
    # utf-8
    "utf-8": ("utf-8", "utf-8"),
    "utf8": ("utf-8", "utf-8"),
    "unicode-1-1-utf-8": ("utf-8", "utf-8"),
    # windows-1252 (the latin-1 superset rule)
    "windows-1252": _W1252, "cp1252": _W1252, "x-cp1252": _W1252,
    "latin1": _W1252, "latin-1": _W1252, "l1": _W1252,
    "iso-8859-1": _W1252, "iso8859-1": _W1252, "iso_8859-1": _W1252,
    "iso-ir-100": _W1252, "ibm819": _W1252, "cp819": _W1252,
    "ascii": _W1252, "us-ascii": _W1252, "ansi_x3.4-1968": _W1252,
    # other windows codepages
    "windows-1250": ("windows-1250", "cp1250"),
    "cp1250": ("windows-1250", "cp1250"),
    "windows-1251": ("windows-1251", "cp1251"),
    "cp1251": ("windows-1251", "cp1251"),
    "windows-1253": ("windows-1253", "cp1253"),
    "windows-1254": ("windows-1254", "cp1254"),
    "iso-8859-9": ("windows-1254", "cp1254"),  # WHATWG rule
    "windows-1255": ("windows-1255", "cp1255"),
    "windows-1256": ("windows-1256", "cp1256"),
    "windows-1257": ("windows-1257", "cp1257"),
    "windows-1258": ("windows-1258", "cp1258"),
    "windows-874": ("windows-874", "cp874"),
    "tis-620": ("windows-874", "cp874"),
    "iso-8859-11": ("windows-874", "cp874"),
    # iso-8859 family
    "iso-8859-2": ("iso-8859-2", "iso8859-2"),
    "latin2": ("iso-8859-2", "iso8859-2"),
    "iso-8859-3": ("iso-8859-3", "iso8859-3"),
    "iso-8859-4": ("iso-8859-4", "iso8859-4"),
    "iso-8859-5": ("iso-8859-5", "iso8859-5"),
    "iso-8859-6": ("iso-8859-6", "iso8859-6"),
    "iso-8859-7": ("iso-8859-7", "iso8859-7"),
    "iso-8859-8": ("iso-8859-8", "iso8859-8"),
    "iso-8859-10": ("iso-8859-10", "iso8859-10"),
    "iso-8859-13": ("iso-8859-13", "iso8859-13"),
    "iso-8859-14": ("iso-8859-14", "iso8859-14"),
    "iso-8859-15": ("iso-8859-15", "iso8859-15"),
    "latin9": ("iso-8859-15", "iso8859-15"),
    "iso-8859-16": ("iso-8859-16", "iso8859-16"),
    # cyrillic
    "koi8-r": ("koi8-r", "koi8-r"), "koi8": ("koi8-r", "koi8-r"),
    "koi8-u": ("koi8-u", "koi8-u"),
    # japanese: WHATWG decodes the shift_jis label as windows-31j
    "shift_jis": ("shift_jis", "cp932"), "shift-jis": ("shift_jis", "cp932"),
    "sjis": ("shift_jis", "cp932"), "x-sjis": ("shift_jis", "cp932"),
    "ms_kanji": ("shift_jis", "cp932"), "csshiftjis": ("shift_jis", "cp932"),
    "windows-31j": ("shift_jis", "cp932"),
    "euc-jp": ("euc-jp", "euc_jp"), "x-euc-jp": ("euc-jp", "euc_jp"),
    "iso-2022-jp": ("iso-2022-jp", "iso2022_jp"),
    # chinese: WHATWG decodes the gb2312 label with the GBK decoder
    "gbk": ("gbk", "gbk"), "gb2312": ("gbk", "gbk"),
    "gb_2312": ("gbk", "gbk"), "gb_2312-80": ("gbk", "gbk"),
    "chinese": ("gbk", "gbk"), "csgb2312": ("gbk", "gbk"),
    "x-gbk": ("gbk", "gbk"), "iso-ir-58": ("gbk", "gbk"),
    "gb18030": ("gb18030", "gb18030"),
    "big5": ("big5", "big5hkscs"), "big5-hkscs": ("big5", "big5hkscs"),
    "cn-big5": ("big5", "big5hkscs"), "x-x-big5": ("big5", "big5hkscs"),
    # korean: WHATWG euc-kr is windows-949
    "euc-kr": ("euc-kr", "cp949"), "korean": ("euc-kr", "cp949"),
    "ks_c_5601-1987": ("euc-kr", "cp949"), "ksc5601": ("euc-kr", "cp949"),
    # utf-16 (labels, not BOM — WHATWG says the bare utf-16 label is LE)
    "utf-16": ("utf-16le", "utf-16-le"),
    "utf-16le": ("utf-16le", "utf-16-le"),
    "utf-16be": ("utf-16be", "utf-16-be"),
}

_CT_CHARSET = re.compile(
    r"""charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""", re.IGNORECASE)
# Byte-level prescan: catches both <meta charset="..."> and
# <meta http-equiv=... content="text/html; charset=..."> (the
# charset= substring is what both forms share). ASCII-superset scan —
# every encoding this module handles is ASCII-transparent in the tag
# region except utf-16, which the BOM stage already claimed.
_META_CHARSET = re.compile(
    rb"""<meta[^>]{0,200}?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""",
    re.IGNORECASE | re.DOTALL)


def normalize_label(label: str) -> "tuple[str, str] | None":
    """WHATWG label → (canonical name, python codec), or None if the
    label is not recognized (caller falls through to the next stage)."""
    return _LABELS.get(label.strip().strip('"\'').lower())


def sniff(body: bytes, content_type: str = "") -> "tuple[str, str, str]":
    """Detect the encoding of an HTML payload.

    Returns ``(canonical_name, python_codec, source)`` where source is
    one of ``bom`` / ``header`` / ``meta`` / ``default``. Priority is
    the WHATWG order: BOM > transport header > meta prescan > default.
    Unrecognized labels fall through to the next stage.
    """
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8", "utf-8-sig", "bom"
    if body[:2] == b"\xff\xfe":
        return "utf-16le", "utf-16-le", "bom"
    if body[:2] == b"\xfe\xff":
        return "utf-16be", "utf-16-be", "bom"
    m = _CT_CHARSET.search(content_type or "")
    if m:
        hit = normalize_label(m.group(1))
        if hit:
            return hit[0], hit[1], "header"
    m = _META_CHARSET.search(body[:PRESCAN_BYTES])
    if m:
        hit = normalize_label(m.group(1).decode("ascii", "replace"))
        if hit:
            return hit[0], hit[1], "meta"
    return "utf-8", "utf-8", "default"


def decode_html(body: bytes,
                content_type: str = "") -> "tuple[str, str, str, bool]":
    """bytes → ``(text, charset, source, decode_ok)``.

    ``decode_ok`` is True iff a *strict* decode under the sniffed
    codec succeeded; on failure the text is re-decoded with
    replacement (U+FFFD) so downstream always gets a string, and the
    flag records that fidelity was lost. BOMs never leak into the
    text (utf-8-sig strips the UTF-8 BOM; the UTF-16 BOM is sliced
    off before decoding so no U+FEFF survives).
    """
    name, codec, source = sniff(body, content_type)
    payload = body
    if source == "bom" and codec.startswith("utf-16"):
        payload = body[2:]
    try:
        return payload.decode(codec), name, source, True
    except UnicodeDecodeError:
        return payload.decode(codec, "replace"), name, source, False
