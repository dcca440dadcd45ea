"""Physical-plan quality gates — the scale properties the engine
promises must be visible in `.explain()` output, not just hoped for:

- predicate pushdown to parquet scans (bbox query → PushedFilters)
- column pruning (element parsing reads only `text`, never html)
- broadcast strategies (classification dims, PIP nested-loop)
- no driver-side collects in operator plans
"""

import pytest
from pyspark.sql import functions as F

from ingest_spark.operators import extract
from ingest_spark.operators.features import with_feature_type
from ingest_spark.operators.spatial import bbox_query, make_polygons_df, point_in_polygon_join
from ingest_spark.sources import pages as pages_src


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pp") / "pages")
    pages_src.pages(spark, n_filler=500).write.parquet(p)
    return spark.read.parquet(p)


@pytest.fixture(scope="module")
def feats_parquet(spark, tmp_path_factory, pages_parquet):
    from ingest_spark.operators.features import build_features
    from ingest_spark.operators.spatial import with_cells
    p = str(tmp_path_factory.mktemp("fp") / "feats")
    n, w, r = extract.parse_elements(pages_parquet)
    with_cells(build_features(n, w, r, spark)).write.parquet(p)
    return spark.read.parquet(p)


class TestPlanQuality:
    def test_bbox_query_pushes_filters(self, spark, feats_parquet):
        plan = _plan(bbox_query(feats_parquet, 0, 40, 10, 50))
        assert "PushedFilters: [" in plan
        assert "GreaterThanOrEqual(maxx" in plan

    def test_parse_prunes_html_column(self, spark, pages_parquet):
        plan = _plan(extract.parse_nodes(pages_parquet))
        scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
        assert scan_lines and all("html" not in l for l in scan_lines)
        assert any("StartsWith(text" in l for l in plan.splitlines())

    def test_classify_uses_broadcast_joins(self, spark, pages_parquet):
        nodes = extract.parse_nodes(pages_parquet)
        plan = _plan(with_feature_type(nodes, spark))
        assert plan.count("BroadcastHashJoin") == 2
        assert "SortMergeJoin" not in plan

    def test_pip_is_broadcast_nested_loop(self, spark, pages_parquet):
        import __spark_entry__ as em
        pts = em._points(spark, "/root/testdata/sf0.001")
        polys = make_polygons_df(spark, em._POLYGONS)
        plan = _plan(point_in_polygon_join(pts, polys))
        assert "BroadcastNestedLoopJoin" in plan
        # bbox prefilter must be part of the join condition (JVM-side),
        # not applied after the python ray-cast
        assert "pminx" in plan.split("pythonUDF")[0] if "pythonUDF" in plan else "pminx" in plan

    def test_whole_stage_codegen_on_parse(self, spark, pages_parquet):
        # codegen stages appear as "*(n)" prefixes in the executed plan
        plan = _plan(extract.parse_ways(pages_parquet))
        assert "*(1)" in plan

    def test_tile_xyz_is_pure_jvm(self, spark, feats_parquet):
        from ingest_spark.operators.tiling import with_tile_xyz
        plan = _plan(with_tile_xyz(feats_parquet, 12))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestNewOperatorPlans:
    def test_ann_lsh_has_no_cartesian_product(self, spark):
        """The multi-table LSH ANN path must be a bucketed equi-join on
        (table, code) — never a cross join of queries x vectors."""
        from ingest_spark.operators.similarity import ann_topk

        emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        queries = emb.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        plan = _plan(ann_topk(emb, queries, k=5, n_planes=4, n_probe=5, n_tables=8))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ngram_prefix_join_is_equi_join_on_gram(self, spark):
        """Prefix-filtered Jaccard: the candidate join must be an
        equi-join keyed on gram (hash or sort-merge), no cross join."""
        from ingest_spark.operators.dedup import ngram_jaccard_pairs

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        plan = _plan(ngram_jaccard_pairs(docs, n=3, threshold=0.8))
        assert "CartesianProduct" not in plan
        assert "gram" in plan

    def test_single_pass_extract_scans_text_only(self, spark, pages_parquet):
        """parse_all must read only the text column (column pruning at
        the scan) and classify in one pass."""
        plan = _plan(extract.parse_all(pages_parquet))
        scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
        assert scan_lines and all("html" not in l for l in scan_lines)

    def test_changeset_closure_has_no_collect_limit(self, spark, pages_parquet):
        """Affected-closure plan builds without any driver action (plan
        construction itself proves no collect — see also the mega
        closure test); the merge is anti-join + union."""
        from ingest_spark.operators.changeset import Changeset, apply_changeset
        from ingest_spark.operators.features import build_features

        n, w, r = extract.parse_elements(pages_parquet)
        feats = build_features(n, w, r, spark)
        upsert = spark.createDataFrame(
            [(1, 1.0, 2.0, {"amenity": "pub"})],
            "id long, lon double, lat double, tags map<string,string>",
        )
        merged, *_ = apply_changeset(spark, feats, n, w, r, Changeset(nodes_upsert=upsert))
        plan = _plan(merged)
        assert "LeftAnti" in plan  # the merge discipline
