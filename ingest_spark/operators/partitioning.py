"""Partition-shape helpers for CPU-bound (Arrow-kernel) stages.

Spark sizes scan partitions by BYTES (`spark.sql.files.maxPartitionBytes`,
128 MB default) — right for IO, wrong for Python-kernel stages: a small
table (one parquet file under the split size) arrives as ONE partition
and serializes the whole sketch/encode kernel on a single core while 31
idle. At real scale the scan already yields ≥ cores partitions and these
helpers are no-ops; at small SF they recover the lost parallelism.

(Round-5 measurement: the 5 000-doc sf0.1 documents table reads as one
partition; the MinHash sketch stage drops 2.07 s → 0.31 s when spread
to 32.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_kernel(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism
    when the input is SUBSTANTIALLY under-parallel; never shrinks,
    never touches inputs that are already parallel (no extra shuffle
    at scale).

    "Substantially" = under half the target (round 8): the repartition
    is a full exchange of the input (plus the sort-before-repartition
    pass), which only pays for itself when it unlocks a large
    parallelism factor. A 23-partition scan on 32 cores gains ≤1.4×
    compute overlap but paid a whole extra shuffle of the table
    (measured ~0.5 s on the ingest node branch at sf0.1); a 1-partition
    scan gains 32× and keeps the spread."""
    if df.isStreaming:
        # streaming plans have no static partition count (and .rdd
        # would throw); micro-batches inherit source parallelism
        return df
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
