#!/usr/bin/env python3
"""End-to-end crawl → training-corpus job: one CLI that composes the
webtext layers the way a real corpus build would.

    pages → link extraction → host graph → PageRank prior
          → visible-text extraction → quality / token features
          → exact dedup → rank-joined filtered corpus (parquet)

Two source modes:

* ``--source linked`` (default): the deterministic cross-host linked
  corpus (`webgraph.synthetic_linked_pages`) — the host graph is real,
  so the PageRank prior actually varies by host.
* ``--source warc``: the ISO 28500 path — build (or read) .warc.gz
  archives, `parse_warc` → `extract_webtext`. The synthetic WARC
  corpus links only within-host, so its host graph is empty and the
  rank prior degrades to the uniform default (coalesce) — the join is
  exercised, the spread is not; pass ``--warc-dir`` to run the same
  plan over real archives.

Every stage is an existing tested operator; this file is pure
composition plus the output write. Scale notes are the operators'
own: the only driver-side values here are the printed summary counts.

    python3 jobs/crawl_job.py --out /tmp/corpus [--source linked]
        [--pages 600] [--min-quality 0.0] [--rank-iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, source: str = "linked", pages: int = 600,
        warc_files: int = 4, warc_dir: str | None = None,
        min_quality: float = 0.0, rank_iters: int = 3,
        out: str | None = None) -> dict:
    from pyspark.sql import functions as F

    from ingest_spark.functions import text as T
    from ingest_spark.operators import webgraph as wg
    from ingest_spark.operators import webtext as W
    from ingest_spark.operators.dedup import dedup_exact

    # ---- 1. pages + visible text
    if source == "linked":
        corpus = wg.synthetic_linked_pages(spark, pages)
        links = wg.extract_links(corpus)

        # visible text via the same tokenizer extract_webtext uses
        from collections.abc import Iterator

        import pandas as pd
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        from ingest_spark.functions import htmltext

        schema = StructType([
            StructField("page_id", LongType(), False),
            StructField("url", StringType(), False),
            StructField("text", StringType(), False),
        ])

        def _txt(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            for pdf in it:
                rows = {"page_id": [], "url": [], "text": []}
                for pid, url, html in zip(pdf["page_id"], pdf["url"],
                                          pdf["html"]):
                    rows["page_id"].append(int(pid))
                    rows["url"].append(str(url))
                    rows["text"].append(
                        htmltext.extract(str(html))["text"])
                yield pd.DataFrame(rows)

        docs = corpus.mapInPandas(_txt, schema)
    elif source == "warc":
        if warc_dir:
            files = W.read_warc_files(spark, warc_dir)
        else:
            files = W.synthetic_warc(spark, n_files=warc_files)
        records = W.parse_warc(files)
        web = W.extract_webtext(records)
        docs = web.select("page_id", "url", "text")
        links = wg.extract_links(
            records.filter(F.col("warc_type") == "response").select(
                F.monotonically_increasing_id().alias("page_id"),
                "url",
                F.decode(F.col("body"), "utf-8").alias("html")))
    else:
        raise ValueError(f"unknown source: {source}")

    # ---- 2. host graph → rank prior (empty-graph-safe)
    edges = wg.host_edges(links)
    n_edges = edges.count()  # scalar: decides the degenerate path
    if n_edges > 0:
        prior = wg.pagerank(edges, iters=rank_iters,
                            dangling="redistribute")
        n_hosts = prior.count()
        default_prior = 1.0 / n_hosts
    else:
        prior = None
        default_prior = 1.0

    # ---- 3. quality + token features, exact dedup
    feats = docs.select(
        "page_id", "url", "text",
        wg.url_host(F.col("url")).alias("host"),
        T.quality_score(F.col("text")).alias("quality"),
        T.ws_token_count(F.col("text")).alias("n_tokens"),
    )
    kept = dedup_exact(feats, id_col="page_id", text_col="text")

    # ---- 4. rank join + quality gate
    if prior is not None:
        kept = (kept.join(prior, "host", "left")
                .withColumn("host_rank",
                            F.coalesce("pr", F.lit(default_prior)))
                .drop("pr"))
    else:
        kept = kept.withColumn("host_rank", F.lit(default_prior))
    corpus_out = kept.filter(F.col("quality") >= min_quality)

    if out:
        corpus_out.write.mode("overwrite").parquet(out)
        n_out = spark.read.parquet(out).count()
    else:
        n_out = corpus_out.count()

    summary = {
        "source": source,
        "docs_in": docs.count(),
        "hosts_ranked": 0 if prior is None else n_hosts,
        "edges": n_edges,
        "docs_out": n_out,
        "min_quality": min_quality,
    }
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", choices=["linked", "warc"],
                    default="linked")
    ap.add_argument("--pages", type=int, default=600)
    ap.add_argument("--warc-files", type=int, default=4)
    ap.add_argument("--warc-dir", default=None)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--rank-iters", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ingest_spark.session import get_spark

    spark = get_spark(app_name="crawl_job")
    spark.sparkContext.setLogLevel("ERROR")
    summary = run(spark, source=args.source, pages=args.pages,
                  warc_files=args.warc_files, warc_dir=args.warc_dir,
                  min_quality=args.min_quality,
                  rank_iters=args.rank_iters, out=args.out)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
