#!/usr/bin/env python3
"""Round-8 optimization profiler (guide §1: measure first).

Mirrors bench.py's session and query set, but additionally:
- records per-query wall time (median of N runs, steal-gated like bench)
- counts Spark JOBS triggered per query run (driver round-trips — the
  dominant fixed cost at small SF) via the status tracker
- dumps .explain("formatted") for every declared query it touches into
  plans/r08/<name>_<tag>.txt

Usage:
  python jobs/profile_r08.py [--tag before|after] [--only q1,q2] [--runs N]

Prints one JSON line: {"queries": {name: {"med": s, "jobs": n}}, ...}
Never used for the record line — bench.py stays the frozen instrument.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ingest_spark.session import get_spark
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="ingest_spark_profile_r08",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from ingest_spark.benchutil import timed_median

    spark.range(0, 1_000_000).select(F.sum("id")).collect()

    tracker = spark.sparkContext.statusTracker()

    plans_dir = os.path.join(REPO, "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    q = entry_mod.queries()
    names = [
        "pip_polygon_join", "knn_ring_expansion", "tile_xyz",
        "minhash_lsh", "ngram_jaccard", "ann_topk", "ann_lsh_topk",
        "dup_components", "tpch_q1", "tpch_q5ish", "event_windows",
    ]
    if args.only:
        names = [n for n in args.only.split(",") if n]

    out: dict = {}
    for name in names:
        fn = q[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if not args.no_plans:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        # warm once (codegen/python-worker warmup), then timed runs
        fn(spark, sf_dir).count()
        j0 = max(tracker.getJobIdsForGroup(None) or [0])

        def run(n=name):
            q[n](spark, sf_dir).count()

        med, log = timed_median(run, runs=args.runs, steal_gate=0.25)
        j1 = max(tracker.getJobIdsForGroup(None) or [0])
        njobs = (j1 - j0) / max(len([r for r in log if not r.get("discarded")]) + len([r for r in log if r.get("discarded")]), 1)
        out[name] = {
            "med": round(med, 3),
            "jobs_per_run": round(njobs, 1),
            "walls": [r["wall"] for r in log],
        }
        print(f"  {name}: {out[name]}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
