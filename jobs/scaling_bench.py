#!/usr/bin/env python3
"""Two-parallelism scaling protocol (BASELINE.md §Sandbox scaling).

Measures the TILING stage (hot-cell salting → range repartition on
(cell, salt) → sorted write — the 100 TB spatial-layout path) on the
identical prebuilt feature table at local[N] and local[4N]
(default 8 → 32), one JVM per parallelism level, and reports
throughput at both plus efficiency = (T_4N / T_N) / 4 — the sandbox
proxy for the north_rule's N→4N-executor criterion (target ≥ 0.8).

The feature table is built once (untimed) from the deterministic
synthetic corpus; timed runs are warm-started, median of --runs.
All IO on tmpfs (the sandbox disk is single-queue; a cluster would
use node-local NVMe). Writes BENCH/SCALING.json.

    python3 jobs/scaling_bench.py [--pages 64000000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_BUILD = r"""
import os, sys, time
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
n_pages = int(sys.argv[1])
feats_path = sys.argv[2]
from ingest_spark.session import get_spark
from ingest_spark.config import EngineConfig
from ingest_spark.operators import extract
from ingest_spark.operators.features import build_features
from ingest_spark.operators.spatial import with_cells
from ingest_spark.sources import pages as pages_src

spark = get_spark(master="local[32]", shuffle_partitions=128,
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)})
spark.sparkContext.setLogLevel("ERROR")
cfg = EngineConfig()
pages_path = "/dev/shm/_scaling_pages"
if not os.path.exists(pages_path + "/_SUCCESS"):
    pages_src.pages(spark, n_filler=n_pages).repartition(256).write.mode("overwrite").parquet(pages_path)
pages = spark.read.parquet(pages_path)
n, w, r = extract.parse_elements(pages)
n.write.mode("overwrite").parquet("/dev/shm/_sc_n")
w.write.mode("overwrite").parquet("/dev/shm/_sc_w")
r.write.mode("overwrite").parquet("/dev/shm/_sc_r")
with_cells(build_features(
    spark.read.parquet("/dev/shm/_sc_n"),
    spark.read.parquet("/dev/shm/_sc_w"),
    spark.read.parquet("/dev/shm/_sc_r"), spark), cfg
).write.mode("overwrite").parquet(feats_path)
print(spark.read.parquet(feats_path).count())
spark.stop()
"""

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
cpus = int(sys.argv[1])
n_runs = int(sys.argv[2])
feats_path = sys.argv[3]
from pyspark.sql import functions as F
from ingest_spark.session import get_spark
from ingest_spark.config import EngineConfig
from ingest_spark.operators.tiling import salt_hot_cells

# identical job at both levels: same shuffle partition count, same
# output layout (64 files) — only the thread count varies
spark = get_spark(master=f"local[{cpus}]", app_name=f"scaling_{cpus}",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
cfg = EngineConfig()
feats = spark.read.parquet(feats_path)
n = feats.count()

def tile_once():
    salted = salt_hot_cells(feats, "hex_cell", cfg, bucket_max=50_000)
    out = f"/dev/shm/_scaling_out_{cpus}"
    (salted.repartitionByRange(64, F.col("hex_cell"), F.col("salt"))
           .sortWithinPartitions("hex_cell", "id")
           .write.mode("overwrite").parquet(out))
    return out

def read_steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])  # steal jiffies

tile_once()  # warm-up, discarded
times = []
steals = []
for _ in range(n_runs):
    s0 = read_steal()
    t0 = time.time()
    tile_once()
    times.append(time.time() - t0)
    # normalized steal: stolen CPU-seconds per wall-second during the run
    steals.append(round((read_steal() - s0) / 100.0 / times[-1], 3))
print(json.dumps({"cpus": cpus, "n_features": n, "times": times, "steal_rate": steals}))
spark.stop()
"""


def _run(code: str, args: list[str], repo: str) -> str:
    env = dict(os.environ, SPARK_GRAFT_REPO=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(f"subprocess failed:\n{out.stderr[-3000:]}")
    return out.stdout.strip().splitlines()[-1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=64_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    feats_path = "/dev/shm/_scaling_features"

    if not os.path.exists(feats_path + "/_SUCCESS"):
        n_feats = _run(_BUILD, [str(args.pages), feats_path], repo)
        print(f"built feature table: {n_feats} rows", file=sys.stderr)

    # the sandbox shares a host and drifts over minutes; interleave
    # fresh-JVM rounds of the two levels so drift hits both equally,
    # then take the median of per-JVM best times
    all_runs: dict[int, list[dict]] = {args.n: [], args.n * 4: []}
    n_features = None
    for _ in range(args.rounds):
        for cpus in (args.n, args.n * 4):
            r = json.loads(_run(_WORKER, [str(cpus), str(args.runs), feats_path], repo))
            all_runs[cpus].append(r)
            n_features = r["n_features"]

    results = {}
    for cpus, rounds in all_runs.items():
        best_per_jvm = [min(r["times"]) for r in rounds]
        med = statistics.median(best_per_jvm)
        results[cpus] = {
            "median_of_jvm_best_sec": round(med, 3),
            "per_jvm_times": [[round(t, 3) for t in r["times"]] for r in rounds],
            # hypervisor steal (stolen CPU-sec per wall-sec) per timed run —
            # quantifies the shared-host confound alongside each time
            "per_jvm_steal_rate": [r.get("steal_rate", []) for r in rounds],
            "n_features": n_features,
            "features_tiled_per_sec": round(n_features / med, 1),
        }

    lo, hi = args.n, args.n * 4
    eff = (results[hi]["features_tiled_per_sec"] / results[lo]["features_tiled_per_sec"]) / 4
    summary = {
        "protocol": (
            f"tiling stage (salt + range-repartition + sorted write) on a "
            f"prebuilt {results[lo]['n_features']}-feature table from "
            f"{args.pages} pages; local[{lo}] vs local[{hi}]; {args.rounds} "
            f"interleaved fresh-JVM rounds x (1 warm-up + {args.runs} timed); "
            f"statistic: median over rounds of per-JVM best"
        ),
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
