"""Smoke the end-to-end crawl → corpus job (jobs/crawl_job.py) on
both source modes via its in-process `run()` core."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "jobs"))

import crawl_job  # noqa: E402


class TestCrawlJob:
    def test_linked_source_end_to_end(self, spark, tmp_path):
        out = str(tmp_path / "corpus")
        s = crawl_job.run(spark, source="linked", pages=120,
                          rank_iters=2, out=out)
        assert s["docs_in"] == 120
        assert s["edges"] > 0 and s["hosts_ranked"] == 37
        # unique synthetic pages: dedup keeps everything, quality
        # gate at 0.0 keeps everything
        assert s["docs_out"] == 120
        df = spark.read.parquet(out)
        assert set(df.columns) >= {"page_id", "url", "host", "text",
                                   "quality", "n_tokens", "host_rank"}
        # the rank prior actually varies by host on the linked corpus
        n_ranks = df.select("host_rank").distinct().count()
        assert n_ranks > 1
        # every page got a real (joined) prior, not the default
        assert df.where(df.host_rank <= 0).count() == 0

    def test_warc_source_degenerate_graph(self, spark):
        s = crawl_job.run(spark, source="warc", warc_files=2)
        # within-host links only → empty host graph → uniform prior
        assert s["edges"] == 0 and s["hosts_ranked"] == 0
        assert s["docs_in"] > 0 and s["docs_out"] > 0

    def test_quality_gate_filters(self, spark):
        all_docs = crawl_job.run(spark, source="linked", pages=60,
                                 rank_iters=1)
        gated = crawl_job.run(spark, source="linked", pages=60,
                              rank_iters=1, min_quality=10.0)
        assert all_docs["docs_out"] == 60
        assert gated["docs_out"] < 60
