"""Cross-checks for paths not covered elsewhere: fused vs declarative
classification, indexed bbox equivalence, stateful streaming monitor."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ingest_spark.functions import tags as tg
from ingest_spark.operators import extract, spatial
from ingest_spark.operators.features import with_feature_type
from ingest_spark.sources import pages as pages_src


_keys = list(tg.PRIORITY_KEYS) + ["name", "zzz", "area"]
_vals = ["cafe", "park", "water", "yes", "no", "unknown_value", "x y", ""]


class TestClassifyAgreement:
    @given(
        st.dictionaries(st.sampled_from(_keys), st.sampled_from(_vals), max_size=5)
    )
    @settings(max_examples=300, deadline=None)
    def test_classify_kv_equals_classify(self, tags):
        """The split (JVM key-scan + python kv lookup) must equal the
        one-shot dict classifier for any tag map."""
        full = tg.classify(tags)
        key = next((k for k in tg.PRIORITY_KEYS if k in tags), None)
        split = tg.classify_kv(key, tags.get(key) if key else None)
        assert split == full

    def test_declarative_join_equals_python(self, spark):
        """with_feature_type (broadcast joins) == tags.classify row-wise."""
        rows = [
            (1, {"amenity": "cafe"}),
            (2, {"leisure": "park", "name": "x"}),
            (3, {}),
            (4, {"name": "only name"}),
            (5, {"amenity": "zzz_unknown"}),
            (6, {"natural": "water", "amenity": "cafe"}),  # priority: amenity first
            (7, {"waterway": "river"}),
        ]
        df = spark.createDataFrame(rows, "id long, tags map<string,string>")
        got = {r.id: r.feature_type for r in with_feature_type(df, spark).collect()}
        want = {i: tg.classify(t) for i, t in rows}
        assert got == want


class TestIndexedBbox:
    def test_indexed_equals_plain(self, spark):
        import __spark_entry__ as em
        pts = em._points(spark, "/root/testdata/sf0.01").select(
            "id", F.col("lon").alias("minx"), F.col("lat").alias("miny"),
            F.col("lon").alias("maxx"), F.col("lat").alias("maxy"),
        )
        feats = spatial.with_cells(pts).cache()
        for bbox in [(-10, -10, 10, 10), (100, 40, 101, 41), (-180, -90, 180, 90)]:
            a = {r.id for r in spatial.bbox_query(feats, *bbox).select("id").collect()}
            b = {r.id for r in spatial.bbox_query_indexed(feats, *bbox).select("id").collect()}
            assert a == b, bbox


class TestStatefulStreaming:
    def test_hot_cell_monitor_emits_on_threshold(self, spark, tmp_path):
        from ingest_spark.streaming import stream as strm

        src = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ck")
        # all fixture+filler nodes: the hot cluster cells cross a small
        # threshold, sparse cells don't
        pages_src.pages(spark, n_filler=2000).write.parquet(src)
        stream = strm.stream_pages(spark, src)
        feats = strm.stream_node_features(stream, spark)
        alerts = strm.hot_cell_monitor(feats.select("hex_cell", "id"), threshold=20)
        q = (
            alerts.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.read.parquet(out)
        rows = got.collect()
        assert len(rows) >= 1  # the hot cluster triggers
        assert all(r["count"] >= 20 for r in rows)
        # batch ground truth: exactly the cells with >= threshold rows
        batch = strm.stream_node_features(
            spark.read.parquet(src), spark
        )
        want = {
            r.hex_cell
            for r in batch.groupBy("hex_cell").count().where(F.col("count") >= 20).collect()
        }
        assert {r.hex_cell for r in rows} == want
