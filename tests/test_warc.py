"""WARC container + HTML extraction layer (functions/warc.py,
functions/htmltext.py, operators/webtext.py) — the webtext front half
feeding the text-quality/dedup layer. Cross-engine parity for the
`warc_records` / `webtext_extract` contract queries lives in
tests/test_entry.py; these tests pin the byte-level and parser-level
behavior."""

import gzip

import numpy as np
import pytest

from ingest_spark.functions import htmltext, warc
from ingest_spark.operators import webtext as W


class TestWarcContainer:
    def test_gz_and_plain_parse_agree(self):
        raws = [
            warc.build_record("metadata", f"k: {i}\r\n".encode(),
                              rec_id_seed=str(i))
            for i in range(5)
        ]
        plain = b"".join(raws)
        gz = b"".join(warc.gzip_member(r) for r in raws)
        a, b = warc.parse(plain), warc.parse(gz)
        assert len(a) == len(b) == 5
        for ra, rb in zip(a, b):
            assert ra.payload == rb.payload
            assert ra.headers["WARC-Record-ID"] == rb.headers["WARC-Record-ID"]

    def test_member_offsets_are_seek_points(self):
        # the CDX/splittability property: decompressing from a
        # reported member offset yields exactly that record
        blob = W.build_warc_file(3)
        recs = warc.parse(blob)
        for rec in recs[1:4]:
            tail = warc.parse(blob[rec.offset:])
            assert tail[0].headers["WARC-Record-ID"] == \
                rec.headers["WARC-Record-ID"]

    def test_gzip_members_standard_readable(self):
        # members must be plain standard gzip (external tools can read)
        blob = W.build_warc_file(0)
        assert gzip.decompress(blob).startswith(b"WARC/1.0\r\n")

    def test_deterministic_bytes(self):
        assert W.build_warc_file(7) == W.build_warc_file(7)

    def test_truncated_payload_rejected(self):
        rec = warc.build_record("metadata", b"x" * 100, rec_id_seed="t")
        with pytest.raises(ValueError, match="truncated"):
            warc.parse(rec[:-60])

    def test_http_split(self):
        body = b"<html>hi</html>"
        rec = warc.build_record(
            "response",
            warc.build_http_response(301, "Moved", "text/html", body),
            {"WARC-Target-URI": "http://x/"}, rec_id_seed="h")
        r = warc.parse_http(warc.parse(rec)[0])
        assert r.http_status == 301
        assert r.http_headers["content-type"] == "text/html"
        assert r.http_body == body


class TestHtmlExtract:
    def test_golden_page(self):
        _, _, html = W.synthetic_page_html(9)  # 3 paras, 4 links
        d = htmltext.extract(html)
        assert d["title"] == "Doc 9"
        assert d["links"] == ["/l0", "/l1", "/l2", "/l3"]
        assert d["text"].split("\n")[0] == "Doc 9"
        assert d["n_words"] == W.expected_word_count(9)

    def test_script_style_comment_excluded(self):
        d = htmltext.extract(
            "<html><head><style>p{color:red}</style></head><body>"
            "<script>var a = 'leaky words';</script>"
            "<!-- hidden words --><p>only these</p>"
            "<noscript>nope</noscript></body></html>")
        assert d["text"] == "only these"
        assert d["n_words"] == 2

    def test_inline_tags_do_not_split_words(self):
        d = htmltext.extract("<p>wo<b>r</b>d other</p>")
        assert d["text"] == "word other"

    def test_block_tags_do_separate_words(self):
        d = htmltext.extract("<p>one</p><p>two</p><div>three</div>")
        assert d["text"] == "one\ntwo\nthree"
        assert d["n_words"] == 3

    def test_entities_decoded(self):
        d = htmltext.extract("<p>A&amp;B &lt;tag&gt;</p>")
        assert d["text"] == "A&B <tag>"
        assert d["n_words"] == 2

    def test_meta_and_title_captured_not_counted(self):
        d = htmltext.extract(
            '<head><title>T W</title>'
            '<meta name="description" content="desc here"></head>'
            "<body><p>body</p></body>")
        assert d["title"] == "T W"
        assert d["meta"]["description"] == "desc here"
        assert d["n_words"] == 1

    def test_anchor_text_captured(self):
        d = htmltext.extract(
            '<p><a href="/x">go <b>here</b> now</a> mid '
            '<a href="/y"></a><a>nohref</a><a href="/z">tail')
        assert d["links"] == ["/x", "/y", "/z"]
        # empty <a>, href-less <a>, and an unclosed trailing <a> all
        # keep the anchors list links-parallel
        assert d["anchors"] == ["go here now", "", "tail"]

    def test_nested_anchor_splits(self):
        d = htmltext.extract('<a href="/a">one<a href="/b">two</a>x')
        assert d["links"] == ["/a", "/b"]
        assert d["anchors"] == ["one", "two"]

    def test_anchor_text_still_counts_as_body_text(self):
        d = htmltext.extract('<p>pre <a href="/x">mid</a> post</p>')
        assert d["text"] == "pre mid post"
        assert d["anchors"] == ["mid"]

    def test_hostile_html_no_crash(self):
        for bad in ["<p><a href=", "<<<>>>", "<b>" * 500, "&#xZZ; <p",
                    "<script>never closed", ""]:
            d = htmltext.extract(bad)
            assert isinstance(d["n_words"], int)

    def test_all_synthetic_counts(self):
        for pid in range(96):
            _, _, html = W.synthetic_page_html(pid)
            d = htmltext.extract(html)
            assert d["n_words"] == W.expected_word_count(pid), pid
            exp_links = 0 if pid % 7 == 3 else pid % 5
            assert len(d["links"]) == exp_links, pid


class TestWebtextOperators:
    def test_parse_counts_and_offsets(self, spark):
        df = W.parse_warc(W.synthetic_warc(spark, n_files=4)).cache()
        try:
            assert df.count() == 4 * (1 + W.PAGES_PER_FILE)
            # member offsets strictly increase within a file
            pdf = df.orderBy("warc_file", "rec_idx").toPandas()
            for _, grp in pdf.groupby("warc_file"):
                off = grp["member_offset"].to_numpy()
                assert (np.diff(off) > 0).all()
                assert off[0] == 0
        finally:
            df.unpersist()

    def test_read_warc_files_from_disk(self, spark, tmp_path):
        for i in range(3):
            (tmp_path / f"crawl-{i:05d}.warc.gz").write_bytes(
                W.build_warc_file(i))
        df = W.read_warc_files(spark, str(tmp_path))
        assert df.count() == 3 * (1 + W.PAGES_PER_FILE)
        stats = W.extract_webtext(df)
        assert stats.filter("status = 404").count() == \
            sum(1 for p in range(24) if p % 7 == 3)

    def test_extracted_text_feeds_text_layer(self, spark):
        # the point of the extractor: its output drops straight into
        # the existing token/quality functions
        from ingest_spark.functions import text as T
        from pyspark.sql import functions as F
        df = W.extract_webtext(
            W.parse_warc(W.synthetic_warc(spark, n_files=2)))
        out = df.select(
            "page_id", T.ws_token_count(F.col("text")).alias("tok"))
        pdf = out.toPandas()
        exp = {p: W.expected_word_count(p) for p in range(16)}
        # ws_token_count splits on whitespace incl. newlines → equals
        # the extractor's own n_words
        got = dict(zip(pdf["page_id"], pdf["tok"]))
        assert got == exp


class TestBoilerplateRemoval:
    """functions/htmltext.py block classifier + operators/webtext.py
    main-content census (the `main_content` contract query's local
    rules, pinned at the edges)."""

    def test_link_density_boundary_exact(self):
        from ingest_spark.functions.htmltext import is_content_block
        # rule is 3*link > n (strictly above 1/3 drops): 4 link words
        # of 12 passes, 5 of 12 drops
        base = {"chrome": False, "heading": False}
        assert is_content_block({**base, "n_words": 12, "n_link_words": 4})
        assert not is_content_block(
            {**base, "n_words": 12, "n_link_words": 5})

    def test_chrome_beats_length(self):
        from ingest_spark.functions.htmltext import main_content
        html = ("<body><aside><p>" + " ".join(f"w{k}" for k in range(40))
                + "</p></aside></body>")
        r = main_content(html)
        assert r["n_blocks"] == 1 and r["n_content_blocks"] == 0
        assert r["text"] == ""

    def test_heading_threshold(self):
        from ingest_spark.functions.htmltext import main_content
        assert main_content(
            "<body><h2>Two words</h2></body>")["n_content_blocks"] == 1
        assert main_content(
            "<body><h2>One</h2></body>")["n_content_blocks"] == 0
        # a 2-word NON-heading block is still too short
        assert main_content(
            "<body><p>Two words</p></body>")["n_content_blocks"] == 0

    def test_adjacent_anchors_do_not_merge_words(self):
        from ingest_spark.functions.htmltext import extract_blocks
        b = extract_blocks(
            '<body><p><a href="a">one</a><a href="b">two</a></p></body>')
        assert b[0]["n_link_words"] == 2

    def test_nested_chrome_and_recovery(self):
        from ingest_spark.functions.htmltext import main_content
        html = ("<body><header><nav><p>menu stuff</p></nav></header>"
                "<p>" + " ".join(f"c{k}" for k in range(15)) + "</p>"
                "</body>")
        r = main_content(html)
        assert r["n_content_blocks"] == 1
        assert r["text"].startswith("c0 ")

    def test_script_and_comment_excluded_from_blocks(self):
        from ingest_spark.functions.htmltext import main_content
        html = ("<body><script>var lots = 'of words here now ok';"
                "</script><!-- twelve words of comment -->"
                "<p>" + " ".join(f"v{k}" for k in range(11)) + "</p></body>")
        r = main_content(html)
        assert r["n_words"] == 11 and r["n_content_words"] == 11

    def test_corpus_closed_forms(self):
        from ingest_spark.functions.htmltext import main_content
        from ingest_spark.operators.webtext import boilerplate_page_html
        for pid in range(24):
            r = main_content(boilerplate_page_html(pid))
            P = 2 + pid % 4
            assert r["n_blocks"] == P + 6
            assert r["n_content_blocks"] == P + 1
            assert r["n_content_words"] == \
                3 + sum(10 + (pid + j) % 8 for j in range(P))

    def test_operator_matches_kernel(self, spark):
        from ingest_spark.operators.webtext import (
            extract_main_content, synthetic_boilerplate_pages,
        )
        rows = (extract_main_content(synthetic_boilerplate_pages(spark, 12))
                .orderBy("page_id").collect())
        assert len(rows) == 12
        assert rows[7].n_content_words == 66  # pinned closed form
        assert rows[0].content_text.startswith("Doc 0 Story\n")


class TestWetIngestion:
    """WET (.warc.wet.gz `conversion` records) — the pre-extracted
    Common-Crawl text container."""

    def test_wet_records_parse_as_conversion(self):
        from ingest_spark.functions import warc as w
        from ingest_spark.operators.webtext import build_wet_file
        recs = w.parse(build_wet_file(0))
        assert recs[0].warc_type == "warcinfo"
        assert all(r.warc_type == "conversion" for r in recs[1:])
        assert len(recs) == 9
        # conversion payloads are plain text, no HTTP framing
        assert recs[1].payload.startswith(b"Doc 0\n")

    def test_extract_wet_closed_forms(self, spark):
        from ingest_spark.operators.webtext import (
            extract_wet, parse_warc, synthetic_wet, wet_page_text,
        )
        rows = (extract_wet(parse_warc(synthetic_wet(spark, n_files=2)))
                .orderBy("page_id").collect())
        assert len(rows) == 16
        for r in rows:
            exp = wet_page_text(r.page_id)
            assert r.text == exp
            assert r.n_words == 2 + 4 + r.page_id % 6
            assert r.n_chars == len(exp)
