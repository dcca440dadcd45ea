"""tile_pyramid invariants: parent/child count conservation."""

from pyspark.sql import functions as F

from ingest_spark.operators.tiling import tile_pyramid


def _demo_points(spark, n=4000):
    return (
        spark.range(n)
        .select(
            ((F.col("id") * 1103515245 + 12345) % 360000 / 1000.0 - 180.0)
            .alias("minx"),
            ((F.col("id") * 2147483629 + 12345) % 170000 / 1000.0 - 85.0)
            .alias("miny"),
        )
    )


class TestTilePyramid:
    def test_root_holds_global_count(self, spark):
        n = 4000
        pyr = tile_pyramid(_demo_points(spark, n), 5).persist()
        root = pyr.filter(F.col("tile_z") == 0).collect()
        assert len(root) == 1
        assert (root[0]["tile_x"], root[0]["tile_y"], root[0]["n"]) == (0, 0, n)
        pyr.unpersist()

    def test_every_parent_sums_its_children(self, spark):
        pyr = tile_pyramid(_demo_points(spark), 5).persist()
        for z in range(1, 6):
            child = (
                pyr.filter(F.col("tile_z") == z)
                .groupBy(
                    (F.col("tile_x") / 2).cast("int").alias("tile_x"),
                    (F.col("tile_y") / 2).cast("int").alias("tile_y"),
                )
                .agg(F.sum("n").alias("n_sum"))
            )
            parent = pyr.filter(F.col("tile_z") == z - 1)
            bad = (
                parent.join(child, ["tile_x", "tile_y"], "full_outer")
                .filter(
                    F.coalesce("n", F.lit(-1)) != F.coalesce("n_sum", F.lit(-2))
                )
                .count()
            )
            assert bad == 0, f"zoom {z-1} parents != sum of zoom {z} children"
        pyr.unpersist()

    def test_single_shuffle_plan(self, spark):
        """The whole pyramid must be one aggregation: exactly one
        Exchange in the physical plan (AQE may add none beyond it)."""
        plan = tile_pyramid(_demo_points(spark), 5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") <= 2  # hashpartitioning + AQE read
