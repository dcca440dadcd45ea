"""Web-graph layer tests: URL canonicalization rules, host-edge
building (self-loop exclusion), and distributed PageRank vs a numpy
power-iteration reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ingest_spark.operators import webgraph as wg


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], ["u"])
    return df.select(wg.canonical_url(F.col("u")).alias("c")).first()["c"]


class TestCanonicalUrl:
    @pytest.mark.parametrize("raw,want", [
        # scheme + host case, default https port, fragment
        ("HTTPS://WWW.Example.ORG:443/a/b#frag",
         "https://www.example.org/a/b"),
        # http default port; empty path -> '/'
        ("http://host.org:80", "http://host.org/"),
        # NON-default port survives
        ("http://host.org:8080/x", "http://host.org:8080/x"),
        # tracking params dropped, rest sorted
        ("https://h.org/p?utm_source=x&z=2&a=1", "https://h.org/p?a=1&z=2"),
        ("https://h.org/p?gclid=1&fbclid=2&utm_campaign=c",
         "https://h.org/p"),
        # userinfo stripped
        ("https://user:pw@h.org/p", "https://h.org/p"),
        # query + fragment together; '?' with nothing surviving drops
        ("https://h.org/p?utm_medium=m#sec", "https://h.org/p"),
    ])
    def test_rules(self, spark, raw, want):
        assert _canon(spark, raw) == want

    def test_surt_key(self, spark):
        df = spark.createDataFrame([("https://www.sub.example.org/p",)],
                                   ["u"])
        got = df.select(
            wg.host_surt(wg.url_host(F.col("u"))).alias("s")).first()["s"]
        assert got == "org,example,sub,www"

    def test_idempotent(self, spark):
        """canonical(canonical(u)) == canonical(u) over the synthetic
        corpus — canonicalization must be a projection."""
        pages = wg.synthetic_linked_pages(spark, 60, 7)
        once = pages.select(
            wg.canonical_url(F.col("url")).alias("u"))
        twice = once.select(wg.canonical_url(F.col("u")).alias("u"))
        assert sorted(r["u"] for r in once.collect()) == \
            sorted(r["u"] for r in twice.collect())


class TestHostEdges:
    def test_matches_closed_form(self, spark):
        """HTML-extracted edges == the link_targets closed form, with
        the same-host /local links gone (host-level self-loops)."""
        n_pages, n_hosts = 90, 7
        pages = wg.synthetic_linked_pages(spark, n_pages, n_hosts)
        got = {
            (r["src_host"], r["dst_host"]): r["weight"]
            for r in wg.host_edges(wg.extract_links(pages)).collect()
        }
        want: "dict[tuple[str, str], int]" = {}
        for i in range(n_pages):
            src = f"host{i % n_hosts}.example.org"
            for t, _href in wg.link_targets(i, n_hosts, n_pages):
                dst = f"host{t}.example.org"
                if dst != src:
                    want[(src, dst)] = want.get((src, dst), 0) + 1
        assert got == want

    def test_relative_links_resolve_to_page_host(self, spark):
        df = spark.createDataFrame(
            [(0, "https://A.org/x", "/rel"),
             (1, "https://A.org/x", "https://B.org/y")],
            ["page_id", "url", "link"])
        rows = df.select(
            wg.resolve_link_host(F.col("url"), F.col("link")).alias("h")
        ).collect()
        assert [r["h"] for r in rows] == ["a.org", "b.org"]


class TestHostEdgesDelta:
    def test_matches_full_recompute(self, spark):
        """Incremental maintenance (remove a page range, add new
        pages) must equal a from-scratch rebuild over the surviving
        corpus — including pairs whose weight hits 0 and drops."""
        base = wg.synthetic_linked_pages(spark, 120, 7)
        edges = wg.host_edges(wg.extract_links(base))
        removed = base.filter((F.col("page_id") >= 20)
                              & (F.col("page_id") < 40))
        big = wg.synthetic_linked_pages(spark, 140, 7)
        added = big.filter(F.col("page_id") >= 120)
        inc = wg.host_edges_delta(edges, removed, added)
        survivors = big.filter(((F.col("page_id") < 20)
                                | (F.col("page_id") >= 40))
                               & (F.col("page_id") < 140))
        full = wg.host_edges(wg.extract_links(survivors))
        key = lambda r: (r["src_host"], r["dst_host"], r["weight"])
        assert sorted(map(key, inc.collect())) == \
            sorted(map(key, full.collect()))

    def test_remove_everything_empties_graph(self, spark):
        base = wg.synthetic_linked_pages(spark, 30, 5)
        edges = wg.host_edges(wg.extract_links(base))
        none_added = base.filter(F.lit(False))
        assert wg.host_edges_delta(edges, base, none_added).count() == 0


class TestCocitation:
    def test_matches_closed_form(self, spark):
        from collections import Counter
        n_pages, n_hosts = 120, 7
        pages = wg.synthetic_linked_pages(spark, n_pages, n_hosts)
        edges = wg.host_edges(wg.extract_links(pages))
        got = {(r["host_a"], r["host_b"]): r["n"]
               for r in wg.cocitation(edges, min_cocite=2).collect()}
        outsets: "dict[str, set]" = {}
        for i in range(n_pages):
            h = i % n_hosts
            src = f"host{h}.example.org"
            for t, _href in wg.link_targets(i, n_hosts, n_pages):
                if t != h:
                    outsets.setdefault(src, set()).add(
                        f"host{t}.example.org")
        cnt = Counter()
        for dsts in outsets.values():
            ds = sorted(dsts)
            for x in range(len(ds)):
                for y in range(x + 1, len(ds)):
                    cnt[(ds[x], ds[y])] += 1
        want = {p: n for p, n in cnt.items() if n >= 2}
        assert got == want

    def test_hub_sources_capped(self, spark):
        """A directory-page host above the out-degree cap contributes
        no pairs (the skew guard), while normal sources still do."""
        rows = [("hub", f"d{i}", 1) for i in range(30)]
        rows += [("s1", "x", 1), ("s1", "y", 1),
                 ("s2", "x", 1), ("s2", "y", 1)]
        edges = spark.createDataFrame(
            rows, ["src_host", "dst_host", "weight"])
        got = {(r["host_a"], r["host_b"]): r["n"]
               for r in wg.cocitation(edges, min_cocite=2,
                                      max_out=10).collect()}
        assert got == {("x", "y"): 2}


class TestAnchorTerms:
    def test_matches_closed_form(self, spark):
        """Per-destination-host anchor term counts + deterministic
        top-k rank match a Python twin of the closed-form link rule
        (local links must vanish via the cross-host filter)."""
        from collections import Counter
        n_pages, n_hosts, k = 120, 7, 3
        pages = wg.synthetic_linked_pages(spark, n_pages, n_hosts)
        got = {(r["dst_host"], r["term"]): (r["n"], r["rank"])
               for r in wg.anchor_terms(wg.extract_links(pages),
                                        top_k=k).collect()}
        cnt = Counter()
        for i in range(n_pages):
            h = i % n_hosts
            for j, (t, _href) in enumerate(
                    wg.link_targets(i, n_hosts, n_pages)):
                if t != h:
                    cnt[(f"host{t}.example.org", f"t{j}")] += 1
        want = {}
        per_host = {}
        for (host, term), n in cnt.items():
            per_host.setdefault(host, []).append((-n, term))
        for host, lst in per_host.items():
            for rank, (negn, term) in enumerate(sorted(lst)[:k], 1):
                want[(host, term)] = (-negn, rank)
        assert got == want

    def test_vocab_cap_drops_hot_host_only(self, spark):
        """A synthetic spam-bombed host whose distinct-term count
        exceeds max_terms_per_host vanishes from the output (bounding
        the window-partition input), while every under-cap host's
        rows are IDENTICAL to the uncapped run."""
        # host0 gets 50 distinct anchor terms; host1 gets 3
        rows = (
            [(f"https://src{i}.example.org/p", "https://hot.example.org/",
              f"spam{i}") for i in range(50)]
            + [(f"https://src{i}.example.org/p",
                "https://cool.example.org/", f"t{i % 3}")
               for i in range(12)]
        )
        links = spark.createDataFrame(
            rows, "url string, link string, anchor string")
        uncapped = wg.anchor_terms(links, top_k=3)
        capped = wg.anchor_terms(links, top_k=3, max_terms_per_host=10)
        hosts = {r["dst_host"] for r in capped.collect()}
        assert "hot.example.org" not in hosts          # over cap: dropped
        cool_cap = sorted(map(tuple, capped.filter(
            "dst_host = 'cool.example.org'").collect()))
        cool_un = sorted(map(tuple, uncapped.filter(
            "dst_host = 'cool.example.org'").collect()))
        assert cool_cap == cool_un and len(cool_cap) == 3

    def test_default_cap_is_inert_on_corpus(self, spark):
        pages = wg.synthetic_linked_pages(spark, 60, 7)
        links = wg.extract_links(pages)
        a = sorted(map(tuple, wg.anchor_terms(links, top_k=3).collect()))
        b = sorted(map(tuple, wg.anchor_terms(
            links, top_k=3, max_terms_per_host=10**9).collect()))
        assert a == b


class TestPagerank:
    def _numpy_pagerank(self, edges, iters, d=0.85):
        hosts = sorted({e[0] for e in edges} | {e[1] for e in edges})
        idx = {h: i for i, h in enumerate(hosts)}
        n = len(hosts)
        w = np.zeros((n, n))
        for s, t, ww in edges:
            w[idx[s], idx[t]] += ww
        outw = w.sum(axis=1)
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            contrib = np.zeros(n)
            for s in range(n):
                if outw[s] > 0:
                    contrib += r[s] * w[s] / outw[s]
            r = (1 - d) / n + d * contrib
        return {h: r[idx[h]] for h in hosts}

    def test_matches_numpy_reference(self, spark):
        pages = wg.synthetic_linked_pages(spark, 90, 7)
        edges_df = wg.host_edges(wg.extract_links(pages))
        edges = [(r["src_host"], r["dst_host"], r["weight"])
                 for r in edges_df.collect()]
        want = self._numpy_pagerank(edges, iters=4)
        got = {r["host"]: r["pr"]
               for r in wg.pagerank(edges_df, iters=4).collect()}
        assert set(got) == set(want)
        for h in want:
            assert got[h] == pytest.approx(want[h], abs=1e-12)

    def test_mass_conserved_without_dangling(self, spark):
        """Every synthetic host has out-links, so total rank mass
        stays 1 under iteration."""
        pages = wg.synthetic_linked_pages(spark, 60, 7)
        pr = wg.pagerank(wg.host_edges(wg.extract_links(pages)), iters=3)
        mass = pr.agg(F.sum("pr")).first()[0]
        assert mass == pytest.approx(1.0, abs=1e-9)

    def test_uniform_ring_is_uniform(self, spark):
        """A weight-1 directed ring is rank-uniform at every
        iteration count — any drift means the transition math leaks."""
        n = 8
        ring = spark.createDataFrame(
            [(f"h{i}", f"h{(i + 1) % n}", 1) for i in range(n)],
            ["src_host", "dst_host", "weight"])
        pr = wg.pagerank(ring, iters=5)
        vals = [r["pr"] for r in pr.collect()]
        assert len(vals) == n
        for v in vals:
            assert v == pytest.approx(1.0 / n, abs=1e-12)

    def test_dangling_host_keeps_floor(self, spark):
        """A sink host (in-links only) must end at the (1-d)/N floor
        + its damped in-flow; its received mass is not re-emitted."""
        edges = spark.createDataFrame(
            [("a", "sink", 1), ("b", "sink", 1), ("a", "b", 1)],
            ["src_host", "dst_host", "weight"])
        got = {r["host"]: r["pr"]
               for r in wg.pagerank(edges, iters=2).collect()}
        want = self._numpy_pagerank(
            [("a", "sink", 1), ("b", "sink", 1), ("a", "b", 1)], iters=2)
        for h in want:
            assert got[h] == pytest.approx(want[h], abs=1e-12)


class TestPagerankEmptyGraph:
    def test_empty_edges_yield_empty_frame(self, spark):
        """ADVICE r6: pagerank on a legal-but-empty edge frame must
        return an empty (host, pr) frame like hits() does, not raise
        ZeroDivisionError."""
        edges = spark.createDataFrame(
            [], "src_host string, dst_host string, weight long")
        out = wg.pagerank(edges, iters=2)
        assert out.columns == ["host", "pr"]
        assert out.count() == 0
        out2 = wg.pagerank(edges, iters=2, dangling="redistribute")
        assert out2.count() == 0


class TestPagerankRedistribute:
    def _numpy_redist(self, edges, iters, d=0.85):
        hosts = sorted({e[0] for e in edges} | {e[1] for e in edges})
        idx = {h: i for i, h in enumerate(hosts)}
        n = len(hosts)
        w = np.zeros((n, n))
        for s, t, ww in edges:
            w[idx[s], idx[t]] += ww
        outw = w.sum(axis=1)
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            dm = r[outw == 0].sum()
            contrib = np.zeros(n)
            for s in range(n):
                if outw[s] > 0:
                    contrib += r[s] * w[s] / outw[s]
            r = (1 - d) / n + d * contrib + d * dm / n
        return {h: r[idx[h]] for h in hosts}

    def test_matches_numpy_reference(self, spark):
        edges = [("a", "sink", 1), ("b", "sink", 2), ("a", "b", 1),
                 ("c", "a", 1), ("b", "c", 1)]
        df = spark.createDataFrame(
            edges, ["src_host", "dst_host", "weight"])
        got = {r["host"]: r["pr"]
               for r in wg.pagerank(df, iters=3,
                                    dangling="redistribute").collect()}
        want = self._numpy_redist(edges, iters=3)
        assert set(got) == set(want)
        for h in want:
            assert got[h] == pytest.approx(want[h], abs=1e-12)

    def test_mass_conserved_with_dangling(self, spark):
        """With redistribution, total mass stays exactly 1 even when
        sinks exist — the defining property of the canonical mode."""
        df = spark.createDataFrame(
            [("a", "sink", 1), ("b", "sink", 1), ("a", "b", 3)],
            ["src_host", "dst_host", "weight"])
        pr = wg.pagerank(df, iters=4, dangling="redistribute")
        mass = pr.agg(F.sum("pr")).first()[0]
        assert mass == pytest.approx(1.0, abs=1e-9)

    def test_no_dangling_matches_keep_mode(self, spark):
        """On a graph with no sinks the two conventions coincide."""
        pages = wg.synthetic_linked_pages(spark, 60, 7)
        edges = wg.host_edges(wg.extract_links(pages))
        keep = {r["host"]: r["pr"]
                for r in wg.pagerank(edges, iters=2).collect()}
        red = {r["host"]: r["pr"]
               for r in wg.pagerank(edges, iters=2,
                                    dangling="redistribute").collect()}
        for h in keep:
            assert red[h] == pytest.approx(keep[h], abs=1e-12)

    def test_bad_mode_raises(self, spark):
        df = spark.createDataFrame(
            [("a", "b", 1)], ["src_host", "dst_host", "weight"])
        with pytest.raises(ValueError):
            wg.pagerank(df, iters=1, dangling="bogus")


class TestHits:
    def _numpy_hits(self, edges, iters):
        hosts = sorted({e[0] for e in edges} | {e[1] for e in edges})
        idx = {h: i for i, h in enumerate(hosts)}
        n = len(hosts)
        w = np.zeros((n, n))
        for s, t, ww in edges:
            w[idx[s], idx[t]] += ww

        def _norm(v):
            nn = np.sqrt((v * v).sum())
            return v / nn if nn > 0 else v

        h = np.ones(n)
        a = np.zeros(n)
        for _ in range(iters):
            a = _norm(w.T @ h)
            h = _norm(w @ a)
        return {host: (a[idx[host]], h[idx[host]]) for host in hosts}

    def test_two_pointers_one_target(self, spark):
        """a→c, b→c: c is the sole authority (score 1), a and b are
        equal hubs at 1/√2, and the off-role scores are exactly 0 —
        the closed-form fixed point HITS reaches in one step."""
        edges = spark.createDataFrame(
            [("a", "c", 1), ("b", "c", 1)],
            ["src_host", "dst_host", "weight"])
        got = {r["host"]: (r["authority"], r["hub"])
               for r in wg.hits(edges, iters=2).collect()}
        assert got["c"][0] == pytest.approx(1.0, abs=1e-12)
        assert got["c"][1] == pytest.approx(0.0, abs=1e-12)
        for h in ("a", "b"):
            assert got[h][0] == pytest.approx(0.0, abs=1e-12)
            assert got[h][1] == pytest.approx(2 ** -0.5, abs=1e-12)

    def test_matches_numpy_reference(self, spark):
        pages = wg.synthetic_linked_pages(spark, 90, 7)
        edges_df = wg.host_edges(wg.extract_links(pages))
        edges = [(r["src_host"], r["dst_host"], r["weight"])
                 for r in edges_df.collect()]
        want = self._numpy_hits(edges, iters=3)
        got = {r["host"]: (r["authority"], r["hub"])
               for r in wg.hits(edges_df, iters=3).collect()}
        assert set(got) == set(want)
        for h in want:
            assert got[h][0] == pytest.approx(want[h][0], abs=1e-9)
            assert got[h][1] == pytest.approx(want[h][1], abs=1e-9)

    def test_l2_invariant(self, spark):
        """Both score vectors leave every iteration L2-normalized."""
        pages = wg.synthetic_linked_pages(spark, 60, 7)
        res = wg.hits(wg.host_edges(wg.extract_links(pages)), iters=2)
        norms = res.agg(
            F.sum(F.col("authority") * F.col("authority")).alias("a2"),
            F.sum(F.col("hub") * F.col("hub")).alias("h2")).first()
        assert norms["a2"] == pytest.approx(1.0, abs=1e-9)
        assert norms["h2"] == pytest.approx(1.0, abs=1e-9)
