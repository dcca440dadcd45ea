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


# ------------------------------------------------ boilerplate removal

#: chrome containers: text inside these is site furniture regardless
#: of its own length/link-density (the justext/boilerpipe consensus)
_CHROME = {"nav", "header", "footer", "aside"}
_HEADING = {"h1", "h2", "h3", "h4", "h5", "h6"}

#: classifier knobs (deliberately LOCAL rules — no cross-block context
#: pass — so the exact decision is re-derivable in closed-form SQL by
#: the `main_content` contract oracle)
MIN_CONTENT_WORDS = 10
MIN_HEADING_WORDS = 2
MAX_LINK_DENSITY = 1.0 / 3.0


class _BlockExtractor(HTMLParser):
    """Block-segmented variant of `_Extractor` for boilerplate
    classification: emits one record per text block (split at the
    same block-tag boundaries `extract` uses) carrying the counts the
    classifier needs — total words, words inside <a>, whether any of
    the text sat inside chrome containers, and whether the block is a
    heading."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: "list[dict]" = []
        self._parts: "list[str]" = []
        self._link_parts: "list[str]" = []
        self._skip = 0
        self._in_title = False
        self._chrome = 0
        self._heading = 0
        self._in_a = 0
        self._chrome_hit = False
        self._heading_hit = False

    def _flush(self):
        text = " ".join("".join(self._parts).split())
        if text:
            link_words = len(" ".join(
                "".join(self._link_parts).split()).split())
            self.blocks.append({
                "text": text,
                "n_words": len(text.split()),
                "n_link_words": link_words,
                "chrome": self._chrome_hit,
                "heading": self._heading_hit,
            })
        self._parts = []
        self._link_parts = []
        self._chrome_hit = False
        self._heading_hit = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT:
            self._skip += 1
            return
        if tag == "title":
            self._in_title = True
        elif tag == "a":
            self._in_a += 1
            self._link_parts.append(" ")  # anchors never merge words
        if tag in _BLOCK:
            self._flush()
        if tag in _CHROME:
            self._chrome += 1
        if tag in _HEADING:
            self._heading += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT:
            if self._skip:
                self._skip -= 1
            return
        if tag == "title":
            self._in_title = False
        elif tag == "a" and self._in_a:
            self._in_a -= 1
            self._link_parts.append(" ")
        if tag in _BLOCK:
            self._flush()
        if tag in _CHROME and self._chrome:
            self._chrome -= 1
        if tag in _HEADING and self._heading:
            self._heading -= 1

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_data(self, data):
        if self._skip or self._in_title:
            return
        if data.strip():
            if self._chrome:
                self._chrome_hit = True
            if self._heading:
                self._heading_hit = True
        self._parts.append(data)
        if self._in_a:
            self._link_parts.append(data)


def extract_blocks(html_str: str) -> "list[dict]":
    """html → block records ({text, n_words, n_link_words, chrome,
    heading}), split at block-tag boundaries."""
    p = _BlockExtractor()
    try:
        p.feed(html_str)
        p.close()
    except Exception:
        pass  # salvage what was parsed — crawled HTML is hostile
    p._flush()
    return p.blocks


def is_content_block(block: "dict") -> bool:
    """The deterministic LOCAL classifier (documented in
    `main_content`): chrome text is never content; high link density
    is never content; headings pass at `MIN_HEADING_WORDS`, other
    blocks at `MIN_CONTENT_WORDS`."""
    if block["chrome"]:
        return False
    n = block["n_words"]
    if n == 0 or block["n_link_words"] * 3 > n:  # density > 1/3, exact
        return False
    return n >= (MIN_HEADING_WORDS if block["heading"]
                 else MIN_CONTENT_WORDS)


def main_content(html_str: str) -> "dict[str, object]":
    """Boilerplate removal: html → the main-content text plus the
    block census a corpus-quality pipeline filters on.

    The classifier is the justext/boilerpipe rule core reduced to
    purely LOCAL per-block decisions (no neighbor-context second
    pass), so the exact block verdicts are re-derivable in closed-form
    SQL by the `main_content` contract oracle:

    - text inside ``nav``/``header``/``footer``/``aside`` is never
      content (site chrome);
    - link density (anchor words / words) strictly above 1/3 is never
      content (evaluated in exact integer arithmetic: 3*link > n);
    - headings need ``MIN_HEADING_WORDS``+ words, other blocks
      ``MIN_CONTENT_WORDS``+ — short fragments (copyright lines,
      timestamps, "read more") drop.

    Returns {text, n_blocks, n_content_blocks, n_words,
    n_content_words} where ``text`` joins content blocks with
    newlines.
    """
    blocks = extract_blocks(html_str)
    content = [b for b in blocks if is_content_block(b)]
    return {
        "text": "\n".join(b["text"] for b in content),
        "n_blocks": len(blocks),
        "n_content_blocks": len(content),
        "n_words": sum(b["n_words"] for b in blocks),
        "n_content_words": sum(b["n_words"] for b in content),
    }
