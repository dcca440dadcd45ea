"""SparkSession factory.

Single place where execution-relevant conf lives, the analog of the
reference's tuning surface (``--defaults`` printout,
/root/reference/src/bin.rs:334-370): AQE on (runtime re-plan +
skew-join splitting), Arrow on (all Python kernels are
pandas/Arrow-vectorized), bloom-filter runtime join pruning (the
semi-join reduction the reference hand-rolls in src/denorm.rs:387-389).

Parallelism comes from ``SPARK_GRAFT_MASTER`` / ``SPARK_GRAFT_CPUS``
so the same code runs the two-parallelism scaling protocol
(local[8] vs local[32]) without edits.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "ingest_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # ≥ cores so every thread has work; small enough that sf0.1
        # partitions stay cache-sized. At cluster scale this is set to
        # ~2-3× total cores or left to AQE coalescing.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    # make the package importable in executor Python workers regardless of
    # the driver's cwd: local mode inherits PYTHONPATH; on a real cluster
    # ship it with `spark-submit --py-files pipeline.zip` (jobs/ do this)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(":"):
        os.environ["PYTHONPATH"] = f"{pkg_root}:{pp}" if pp else pkg_root

    # shuffle/spill dirs: RAM-backed tmpfs when available (the sandbox's
    # virtio disk caps at ~700MB/s single-queue, which would serialize
    # shuffle IO); on a real cluster this is node-local NVMe
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark_local"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
