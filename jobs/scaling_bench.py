#!/usr/bin/env python3
"""Two-parallelism scaling protocol (BASELINE.md §Sandbox scaling).

Runs the identical tiling job on the identical deterministic input at
local[N] and local[4N] (default 8 → 32) in separate subprocesses (one
JVM per master), reports throughput at both plus
efficiency = (T_4N / T_N) / 4 — the sandbox proxy for the north_rule's
N→4N-executor criterion (target ≥ 0.8).

Writes BENCH/SCALING.json and prints one JSON line.

    python3 jobs/scaling_bench.py [--pages 400000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1])
n_pages = int(sys.argv[2])
from ingest_spark.session import get_spark
from ingest_spark.config import EngineConfig
from ingest_spark.operators import extract
from ingest_spark.operators.features import build_features
from ingest_spark.operators.spatial import with_cells
from ingest_spark.operators.tiling import quadtree_partition, salt_hot_cells

spark = get_spark(master=f"local[{{}}]".format(cpus),
                  app_name=f"scaling_{{}}".format(cpus),
                  shuffle_partitions=max(cpus * 2, 16))
spark.sparkContext.setLogLevel("ERROR")
from ingest_spark.sources import pages as pages_src
cfg = EngineConfig()

pages = pages_src.pages(spark, n_filler=n_pages)
nodes, ways, rels = extract.parse_elements(pages)
feats = with_cells(build_features(nodes, ways, rels, spark), cfg)
feats.write.mode("overwrite").parquet(f"/tmp/_scaling_feats_{{}}".format(cpus))
feats = spark.read.parquet(f"/tmp/_scaling_feats_{{}}".format(cpus))
n = feats.count()

# warm-up (discarded) then timed runs of the tiling stage
def tile_once():
    qt = quadtree_partition(feats, cfg, gx=8, gy=8, bucket_max=10_000)
    salted = salt_hot_cells(qt, "hex_cell", cfg, bucket_max=10_000)
    return salted.groupBy("grid_cell", "bucket", "salt").count().count()

tile_once()
times = []
for _ in range(int(sys.argv[3])):
    t0 = time.time()
    tile_once()
    times.append(time.time() - t0)
print(json.dumps({{"cpus": cpus, "n_features": n, "times": times}}))
spark.stop()
"""


def run_worker(repo: str, cpus: int, n_pages: int, runs: int) -> dict:
    code = _WORKER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_pages), str(runs)],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"worker local[{cpus}] failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    results = {}
    for cpus in (args.n, args.n * 4):
        r = run_worker(repo, cpus, args.pages, args.runs)
        med = statistics.median(r["times"])
        results[cpus] = {
            "median_sec": round(med, 3),
            "times": [round(t, 3) for t in r["times"]],
            "n_features": r["n_features"],
            "features_tiled_per_sec": round(r["n_features"] / med, 1),
        }

    lo, hi = args.n, args.n * 4
    eff = (results[hi]["features_tiled_per_sec"] / results[lo]["features_tiled_per_sec"]) / 4
    summary = {
        "protocol": f"local[{lo}] vs local[{hi}], {args.pages} pages, median of {args.runs}",
        "throughput": {str(k): v for k, v in results.items()},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
