#!/usr/bin/env python3
"""Per-stage profiler for round-8 optimization (guide §1/§7.1).

Enables the UI REST API, runs selected bench queries, and prints per-job
and per-stage timings (submission→completion wall, executor run time,
shuffle bytes) so the slow stage — not the whole query — is the unit of
attribution. Also dumps the FINAL adaptive plan (post-AQE) per query.

Usage: python jobs/stageprof_r08.py --only minhash_lsh,ngram_jaccard
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}") as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="minhash_lsh")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ingest_spark.session import get_spark
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="stageprof_r08",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "http://localhost:4049/api/v1"
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    spark.range(0, 1_000_000).select(F.sum("id")).collect()

    q = entry_mod.queries()
    for name in [n for n in args.only.split(",") if n]:
        fn = q[name]
        # warm run
        fn(spark, sf_dir).count()
        jobs_before = {j["jobId"] for j in rest(base, f"/applications/{app_id}/jobs")}
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        df.count()
        wall = time.time() - t0
        jobs = [
            j for j in rest(base, f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n==== {name}: wall {wall:.3f}s (plan build {t_build:.3f}s), "
              f"{len(jobs)} jobs")
        for j in jobs:
            sub = j["submissionTime"]
            comp = j.get("completionTime", "")
            print(f"  job {j['jobId']}: {len(j['stageIds'])} stages "
                  f"[{sub[11:23]} -> {comp[11:23]}]")
            for sid in sorted(j["stageIds"]):
                try:
                    sts = rest(base, f"/applications/{app_id}/stages/{sid}")
                except Exception:
                    continue
                for st in sts:
                    if st["status"] == "SKIPPED":
                        print(f"    stage {sid}: SKIPPED")
                        continue
                    dur = ""
                    if st.get("firstTaskLaunchedTime") and st.get("completionTime"):
                        from datetime import datetime as dt
                        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                        a = dt.strptime(st["firstTaskLaunchedTime"], fmt)
                        b = dt.strptime(st["completionTime"], fmt)
                        dur = f"{(b - a).total_seconds():.3f}s"
                    nm = st["name"].split("\n")[0][:90]
                    print(
                        f"    stage {sid}: {dur} wall, {st['numCompleteTasks']}t, "
                        f"run {st['executorRunTime']/1000:.2f}s "
                        f"cpu {st['executorCpuTime']/1e9:.2f}s "
                        f"srw {st['shuffleWriteBytes']//1024}K "
                        f"srr {st['shuffleReadBytes']//1024}K  {nm}"
                    )
        if args.tag:
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            p = os.path.join(REPO, "plans", "r08", f"{name}_{args.tag}.txt")
            with open(p, "w") as f:
                f.write(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
