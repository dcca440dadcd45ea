#!/usr/bin/env python3
"""Benchmark harness — one JSON line to stdout.

Runs the headline operator suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32).

Headline set:
- geo_ingest      : synthetic pages → extract → assemble → encode →
                    cell index (the reference pipeline, features/sec)
- tiling_optimize : quadtree partition + hot-cell salting (O1-O4)
- pip_join        : broadcast point-in-polygon join
- knn             : hex-ring kNN over derived points
- tile_pyramid    : z6 tile aggregation
- minhash_lsh     : MinHash+LSH near-dup pairs over documents
- ngram_jaccard   : exact n-gram Jaccard pairs
- ann_topk        : exact cosine top-k over embeddings
- tpch_q1/q5ish   : generic agg/join throughput
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from ingest_spark.session import get_spark
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="ingest_spark_bench",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from ingest_spark.config import EngineConfig
    from ingest_spark.operators import extract
    from ingest_spark.operators.features import build_features
    from ingest_spark.operators.spatial import with_cells
    from ingest_spark.operators.tiling import quadtree_partition, salt_hot_cells
    from ingest_spark.sources import pages as pages_src

    cfg = EngineConfig()
    try:
        n_pages = int(1_200_000 * float(sf))
    except ValueError:
        n_pages = 120_000
    n_pages = max(n_pages, 2_000)

    from ingest_spark.benchutil import timed_median

    # self-gating protocol (same as jobs/scaling_bench.py): every query
    # is the MEDIAN of `runs` executions, each steal-sampled; runs on a
    # noisy-neighbor burst are discarded+retried, so the recorded line
    # and an independent driver run converge instead of differing by
    # host luck
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    steal_gate = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_GATE", "0.25"))

    timings: dict[str, float] = {}
    extra: dict = {}
    n_discarded = 0

    def timed(name, fn, runs_override=None):
        nonlocal n_discarded
        box = {}

        def run():
            box["v"] = fn()

        med, log = timed_median(
            run, runs=runs_override or runs, steal_gate=steal_gate
        )
        n_discarded += sum(1 for r in log if r.get("discarded"))
        timings[name] = round(med, 3)
        return box["v"]

    # warm the JVM/scheduler so first-job startup doesn't land in the
    # first timed query (warm-start measurement, as in the scaling
    # protocol)
    spark.range(0, 1_000_000).select(F.sum("id")).collect()

    # ---- corpus materialization (the 100 TB input is a stored table;
    # generating it is not part of ingest throughput)
    tmp = "/dev/shm/_bench" if os.path.isdir("/dev/shm") else "/tmp/_bench"

    def _corpus():
        pages_src.pages(spark, n_filler=n_pages).write.mode("overwrite").parquet(
            f"{tmp}_pages"
        )
        return spark.read.parquet(f"{tmp}_pages")

    pages = timed("corpus_gen", _corpus)

    def _ingest():
        # single-pass extract (ONE corpus scan, etype-partitioned store —
        # the pipeline's extract stage), then build features from the
        # parsed store: parse is never recomputed per join branch and
        # the corpus is read exactly once
        extract.parse_all(pages).write.mode("overwrite").partitionBy("etype").parquet(
            f"{tmp}_elements"
        )
        nodes, ways, rels = extract.element_views(
            spark.read.parquet(f"{tmp}_elements")
        )
        feats = with_cells(build_features(nodes, ways, rels, spark), cfg)
        feats.write.mode("overwrite").parquet(f"{tmp}_features")
        return spark.read.parquet(f"{tmp}_features")

    # extra runs: the first execution pays whole-pipeline codegen +
    # Python-worker warmup (~2× the steady state), which a 3-run
    # median cannot fully absorb
    features = timed("geo_ingest", _ingest, runs_override=runs + 2)
    n_features = features.count()
    extra["features_per_sec"] = round(n_features / timings["geo_ingest"], 1)

    # ---- tiling optimize pass
    def _tiling():
        qt = quadtree_partition(features, cfg, gx=8, gy=8, bucket_max=cfg.bucket_max_records)
        salted = salt_hot_cells(qt, "hex_cell", cfg, bucket_max=10_000)
        return salted.groupBy("grid_cell", "bucket", "salt").count().count()

    n_buckets = timed("tiling_optimize", _tiling)
    extra["features_tiled_per_sec"] = round(n_features / timings["tiling_optimize"], 1)
    extra["n_features"] = n_features
    extra["n_buckets"] = n_buckets

    # ---- operator suite from the driver contract. Queries that have
    # shown BIMODAL medians across driver epochs (minhash_lsh was the
    # round-4/5 watch item) get extra runs so one hot sample cannot own
    # the median.
    bimodal = {"minhash_lsh", "ngram_jaccard", "knn_ring_expansion"}
    q = entry_mod.queries()
    for name in [
        "pip_polygon_join", "knn_ring_expansion", "tile_xyz",
        "minhash_lsh", "ngram_jaccard", "ann_topk", "ann_lsh_topk",
        "dup_components", "tpch_q1", "tpch_q5ish", "event_windows",
    ]:
        timed(name, lambda n=name: q[n](spark, sf_dir).count(),
              runs_override=(runs + 2) if name in bimodal else None)

    # ---- sub-stage isolation: the MinHash SKETCH stage alone (the
    # target of the spread_for_kernel fix — a one-file small-SF scan
    # otherwise serializes the Arrow kernel on one core). Recorded as
    # an extra, not part of the suite total, so the fix stays visible
    # even when a hot host epoch inflates the end-to-end query.
    from ingest_spark.operators.dedup import with_minhash

    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    def _sketch_only():
        with_minhash(docs_df).write.format("noop").mode("overwrite").save()

    timed("minhash_sketch_stage", _sketch_only, runs_override=runs + 4)
    extra["minhash_sketch_stage_sec"] = timings.pop("minhash_sketch_stage")

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "protocol": f"median of {runs} runs/query, steal-gated at {steal_gate} cores",
        "runs_discarded_for_steal": n_discarded,
        **extra,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
