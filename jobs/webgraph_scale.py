#!/usr/bin/env python3
"""Two-parallelism scale evidence for the web-graph ops (round 6).

Same protocol as jobs/scaling_bench.py (fresh JVM per level, steal
gating via the shared `benchutil.timed_median`, interleaved levels) on
the hardware-flat 4->16 window the probe established, applied to the
round-6 web-graph layer: damped PageRank over a synthetic weighted
host graph.

The signal of record is the PER-ITERATION CORE of
`webgraph.pagerank` — join(ranks, transition) + groupBy(dst) over
edge-cardinality rows — the piece a 10^8-host run repeats 20-50
times while the setup (host dictionary encode + transition build)
runs once.  At this sandbox SF the setup is a handful of small AQE
stages whose per-stage scheduling floors (~0.2-0.4 s each) do NOT
shrink with cores, so end-to-end wall at a fixed small iteration
count understates core scaling.  Protocol: each level measures the
SAME job at two iteration counts (default 2 and 12) and the core is
the difference quotient (T_hi - T_lo) / (hi - lo) — the setup and
its floors cancel exactly.  End-to-end numbers for both iteration
counts are recorded alongside, honesty over flattery.

    python3 jobs/webgraph_scale.py [--hosts 1000000] [--edges 16000000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_JOB = r"""
import json, os, sys
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
cpus = int(sys.argv[1])
n_hosts = int(sys.argv[2])
n_edges = int(sys.argv[3])
iters_lo = int(sys.argv[4])
iters_hi = int(sys.argv[5])
n_runs = int(sys.argv[6])
from pyspark.sql import functions as F
from ingest_spark.session import get_spark
from ingest_spark.operators.webgraph import pagerank

spark = get_spark(master=f"local[{cpus}]", app_name=f"wg_scale_{cpus}",
                  shuffle_partitions=64,
                  extra_conf={"spark.driver.memory": "24g",
                              "spark.driver.extraJavaOptions":
                              "-XX:+UseParallelGC"})
spark.sparkContext.setLogLevel("ERROR")

# deterministic weighted host graph, no self-loops.  dst is scattered
# with xxhash64 over the FULL id range (an affine map mod n_hosts
# would make both endpoints functions of id % n_hosts, collapsing the
# graph to n_hosts distinct pairs and leaving nothing but fixed
# per-stage overhead to measure)
edges = (
    spark.range(n_edges)
    .select(
        F.concat(F.lit("h"), (F.col("id") % n_hosts)).alias("src_host"),
        F.concat(F.lit("h"), F.pmod(F.xxhash64("id"), F.lit(n_hosts)))
        .alias("dst_host"),
        (1 + F.col("id") % 5).alias("weight"),
    )
    .filter(F.col("src_host") != F.col("dst_host"))
    .groupBy("src_host", "dst_host")
    .agg(F.sum("weight").alias("weight"))
    .persist()
)
n_real_edges = edges.count()

from ingest_spark.benchutil import timed_median

def job(iters):
    pagerank(edges, iters=iters).agg(F.sum("pr")).collect()

# inter-run isolation (round 7): a long-lived local JVM only reclaims
# finished runs' shuffle files on driver GC, so back-to-back 12-iter
# runs would otherwise start with 10-25 GB of tmpfs junk from the
# previous one (measured +30% wall on the second run).  A real
# cluster job exits between runs and pays none of this; drain to the
# post-setup baseline OUTSIDE the timed window instead.
import gc as _pygc, shutil as _shutil, time as _time
_shm_base = _shutil.disk_usage("/dev/shm").used

def drain(limit=45.0):
    t0 = _time.time()
    while _time.time() - t0 < limit:
        _pygc.collect()
        spark.sparkContext._jvm.System.gc()
        _time.sleep(2)
        if _shutil.disk_usage("/dev/shm").used < _shm_base + 2e9:
            return

job(iters_lo)  # warm-up, discarded
med_lo, runs_lo = timed_median(lambda: job(iters_lo), runs=n_runs,
                               pre_run=drain)
med_hi, runs_hi = timed_median(lambda: job(iters_hi), runs=n_runs,
                               pre_run=drain)
clean_lo = [r["wall"] for r in runs_lo if not r.get("discarded")]
clean_hi = [r["wall"] for r in runs_hi if not r.get("discarded")]
core = (med_hi - med_lo) / (iters_hi - iters_lo)
# best-epoch core: contention on this shared box is strictly
# additive, so the min pair approximates the uncontended machine
core_min = (min(clean_hi) - min(clean_lo)) / (iters_hi - iters_lo)
print(json.dumps({
    "cpus": cpus, "n_edges": n_real_edges,
    "median_sec": {str(iters_lo): med_lo, str(iters_hi): med_hi},
    "core_sec_per_iter": core,
    "core_sec_per_iter_min": core_min,
    "core_edges_per_sec": round(n_real_edges / core, 1),
    "clean_times": {str(iters_lo): clean_lo, str(iters_hi): clean_hi},
}))
spark.stop()
"""


def _run(args_list: list[str], repo: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_REPO=repo)
    out = subprocess.run(
        [sys.executable, "-c", _JOB, *args_list],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(f"subprocess failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=16_000_000)
    ap.add_argument("--iters-lo", type=int, default=2)
    ap.add_argument("--iters-hi", type=int, default=12)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--window", type=int, nargs=2, default=(4, 16))
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    lo, hi = args.window
    per_level: "dict[int, list[dict]]" = {lo: [], hi: []}
    for _ in range(args.rounds):
        for cpus in (lo, hi):  # interleaved so host drift hits both
            per_level[cpus].append(_run(
                [str(cpus), str(args.hosts), str(args.edges),
                 str(args.iters_lo), str(args.iters_hi), str(args.runs)],
                repo))
    core = {c: statistics.median(r["core_sec_per_iter"] for r in rs)
            for c, rs in per_level.items()}
    core_min = {c: min(r["core_sec_per_iter_min"] for r in rs)
                for c, rs in per_level.items()}
    e2e_hi = {c: statistics.median(r["median_sec"][str(args.iters_hi)]
                                   for r in rs)
              for c, rs in per_level.items()}
    core_eff = (core[hi] and (core[lo] / core[hi]) / (hi / lo))
    # best-epoch efficiency: min-pair cores at each level.  Host
    # contention here is additive (shared Firecracker box: 12-iter
    # walls at 16 cores wander 72->88 s between epochs while 4-core
    # walls stay tight), so the min pair is the closest observable to
    # the uncontended machine; the median stays the headline.
    core_eff_min = (core_min[hi]
                    and (core_min[lo] / core_min[hi]) / (hi / lo))
    e2e_eff = (e2e_hi[hi] and (e2e_hi[lo] / e2e_hi[hi]) / (hi / lo))
    result = {
        "stage": "webgraph_pagerank",
        "window": f"{lo}->{hi}",
        "hosts": args.hosts,
        "iters": [args.iters_lo, args.iters_hi],
        "core_sec_per_iter": core,
        "core_sec_per_iter_min": core_min,
        "core_edges_per_sec": {
            c: statistics.median(r["core_edges_per_sec"] for r in rs)
            for c, rs in per_level.items()},
        "core_efficiency": round(core_eff, 3),
        "core_efficiency_best_epoch": round(core_eff_min, 3),
        "e2e_median_sec_at_iters_hi": e2e_hi,
        "e2e_efficiency_at_iters_hi": round(e2e_eff, 3),
        "rounds": per_level,
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
