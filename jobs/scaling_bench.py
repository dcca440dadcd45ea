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
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
cpus = int(sys.argv[1])
n_pages = int(sys.argv[2])
n_runs = int(sys.argv[3])

from ingest_spark.session import get_spark
from ingest_spark.config import EngineConfig
from ingest_spark.operators import extract
from ingest_spark.operators.features import build_features
from ingest_spark.operators.spatial import with_cells
from ingest_spark.operators.tiling import salt_hot_cells
from ingest_spark.sources import pages as pages_src

spark = get_spark(master=f"local[{cpus}]", app_name=f"scaling_{cpus}",
                  shuffle_partitions=max(cpus * 2, 16),
                  # split parquet inputs finely so scan stages expose
                  # enough tasks for 32 cores even on small-ish files
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)})
spark.sparkContext.setLogLevel("ERROR")
cfg = EngineConfig()

pages_path = f"/dev/shm/_scaling_pages_{n_pages}"
if not os.path.exists(pages_path + "/_SUCCESS"):
    pages_src.pages(spark, n_filler=n_pages).repartition(128).write.mode("overwrite").parquet(pages_path)
pages = spark.read.parquet(pages_path)

from pyspark.sql import functions as F

def pipeline_once(run_id):
    # the full ingest+tile pipeline, identical input every run:
    # parse -> materialized element tables -> assemble/classify/encode
    # (Arrow UDF kernels) -> cell index -> hot-cell salting -> range
    # repartition on (cell, salt) -> sorted tiled write. CPU-bound
    # end to end (regex parse, joins, python encode, shuffle sort,
    # parquet encode), which is what must scale 8 -> 32 cores.
    tag = f"{cpus}_{run_id}"
    n_, w_, r_ = extract.parse_elements(pages)
    n_.write.mode("overwrite").parquet(f"/dev/shm/_sc_nodes_{tag}")
    w_.write.mode("overwrite").parquet(f"/dev/shm/_sc_ways_{tag}")
    r_.write.mode("overwrite").parquet(f"/dev/shm/_sc_rels_{tag}")
    feats = with_cells(build_features(
        spark.read.parquet(f"/dev/shm/_sc_nodes_{tag}"),
        spark.read.parquet(f"/dev/shm/_sc_ways_{tag}"),
        spark.read.parquet(f"/dev/shm/_sc_rels_{tag}"), spark), cfg)
    salted = salt_hot_cells(feats, "hex_cell", cfg, bucket_max=10_000)
    out = f"/dev/shm/_scaling_out_{tag}"
    (salted.repartitionByRange(max(cpus * 2, 16), F.col("hex_cell"), F.col("salt"))
           .sortWithinPartitions("hex_cell", "id")
           .write.mode("overwrite").parquet(out))
    return out

out = pipeline_once("warm")  # warm-up, discarded
n = spark.read.parquet(out).count()
times = []
for k in range(n_runs):
    t0 = time.time()
    pipeline_once(k)
    times.append(time.time() - t0)
print(json.dumps({"cpus": cpus, "n_features": n, "times": times}))
spark.stop()
"""


def run_worker(repo: str, cpus: int, n_pages: int, runs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_REPO=repo)
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(cpus), str(n_pages), str(runs)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(f"worker local[{cpus}] failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=12_800_000)
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
