#!/usr/bin/env python3
"""Driver-orchestration evidence for the round-7 PageRank change.

The round-6 scaling fit isolated a per-iteration driver term D
(job submission + scheduler sync) as the reason the measured 4->16
core efficiency (0.741) sat under the >=0.8 gate while the data plane
scaled ~perfectly.  Round 7 attacks D directly:

- iterations now CHAIN LAZILY and materialize once per
  ``checkpoint_every`` cadence (one job runs the whole pending chain)
  instead of one eager count() per iteration;
- AQE is disabled inside the loop (every frame is already explicitly
  hash-repartitioned to a fixed layout, so runtime re-planning buys
  nothing — but it submits each shuffle stage as its own driver job).

This job records the before/after: it runs ``pagerank`` at two
iteration counts under distinct job groups and reports the MARGINAL
jobs per added iteration (setup jobs cancel in the difference).  The
"before" shape can be reproduced by checking out the parent of the
round-7 commit; its measured value is recorded in
BENCH/WEBGRAPH_SCALING.json alongside this script's current output.

    python3 jobs/pagerank_jobcount.py [--edges 2000000] [--hosts 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ingest_spark.session import get_spark
from ingest_spark.operators.webgraph import pagerank


def count_jobs(spark, edges, iters: int, group: str) -> int:
    sc = spark.sparkContext
    sc.setJobGroup(group, f"pagerank iters={iters}")
    pagerank(edges, iters=iters).agg(F.sum("pr")).collect()
    sc.setJobGroup("idle", "")
    return len(sc.statusTracker().getJobIdsForGroup(group))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--hosts", type=int, default=200_000)
    ap.add_argument("--iters-lo", type=int, default=4)
    ap.add_argument("--iters-hi", type=int, default=12)
    args = ap.parse_args()

    spark = get_spark(app_name="pagerank_jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    edges = (
        spark.range(args.edges)
        .select(
            F.concat(F.lit("h"), (F.col("id") % args.hosts))
            .alias("src_host"),
            F.concat(F.lit("h"),
                     F.pmod(F.xxhash64("id"), F.lit(args.hosts)))
            .alias("dst_host"),
            (1 + F.col("id") % 5).alias("weight"),
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.sum("weight").alias("weight"))
        .persist()
    )
    edges.count()

    count_jobs(spark, edges, args.iters_lo, "warmup")  # JIT/plan warm
    j_lo = count_jobs(spark, edges, args.iters_lo, "lo")
    j_hi = count_jobs(spark, edges, args.iters_hi, "hi")
    marginal = (j_hi - j_lo) / (args.iters_hi - args.iters_lo)
    print(json.dumps({
        "iters": [args.iters_lo, args.iters_hi],
        "jobs": {str(args.iters_lo): j_lo, str(args.iters_hi): j_hi},
        "marginal_jobs_per_iteration": round(marginal, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
