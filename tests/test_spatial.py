"""Cell assignment, bbox query, PIP broadcast join, kNN ring expansion."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ingest_spark.config import EngineConfig
from ingest_spark.operators import spatial


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(5)
    n = 3000
    # clustered around three centers + uniform noise
    cx = rng.choice([0.0, 1.0, 5.0], n)
    cy = rng.choice([0.0, 2.0], n)
    lon = cx + rng.normal(0, 0.1, n)
    lat = cy + rng.normal(0, 0.1, n)
    return spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(lon, lat))],
        "id long, lon double, lat double",
    ).cache()


class TestWithCells:
    def test_cells_added_and_deterministic(self, spark, points):
        df = spatial.with_cells(points, lon_col="lon", lat_col="lat")
        assert {"hex_cell", "s2_cell"} <= set(df.columns)
        a = df.orderBy("id").select("hex_cell", "s2_cell").collect()
        b = spatial.with_cells(points, lon_col="lon", lat_col="lat").orderBy("id").select("hex_cell", "s2_cell").collect()
        assert a == b

    def test_matches_numpy_kernels(self, spark, points):
        from ingest_spark.functions import cells as C
        rows = spatial.with_cells(points, lon_col="lon", lat_col="lat").orderBy("id").collect()
        lon = np.array([r.lon for r in rows])
        lat = np.array([r.lat for r in rows])
        assert (np.array([r.hex_cell for r in rows]) == C.hex_cell(lon, lat, 8)).all()
        assert (np.array([r.s2_cell for r in rows]) == C.s2_cell_id(lon, lat, 12)).all()


class TestPIP:
    @pytest.fixture(scope="class")
    def polys(self, spark):
        return spatial.make_polygons_df(spark, [
            {"polygon_id": 1, "name": "unit square", "ring": [(0, 0), (1, 0), (1, 1), (0, 1)]},
            {"polygon_id": 2, "name": "triangle", "ring": [(2, 0), (4, 0), (3, 2)]},
            {"polygon_id": 3, "name": "c-shape", "ring": [
                (5, 0), (8, 0), (8, 3), (5, 3), (5, 2), (7, 2), (7, 1), (5, 1),
            ]},
        ])

    def test_known_containment(self, spark, polys):
        pts = spark.createDataFrame(
            [
                (1, 0.5, 0.5),   # inside square
                (2, 1.5, 0.5),   # outside all
                (3, 3.0, 0.5),   # inside triangle
                (4, 3.0, 1.9),   # near triangle apex, inside
                (5, 2.1, 1.5),   # in triangle bbox but outside triangle
                (6, 6.0, 0.5),   # inside c-shape bottom bar
                (7, 6.0, 1.5),   # in the C's notch → outside
                (8, 6.0, 2.5),   # inside c-shape top bar
            ],
            "id long, lon double, lat double",
        )
        got = {
            (r.id, r.polygon_id)
            for r in spatial.point_in_polygon_join(pts, polys).collect()
        }
        assert got == {(1, 1), (3, 2), (4, 2), (6, 3), (8, 3)}

    def test_bbox_prefilter_is_tight(self, spark, polys):
        # a point far away joins nothing (pruned by the bbox predicate
        # before the ray-cast UDF ever runs)
        pts = spark.createDataFrame([(1, 100.0, 50.0)], "id long, lon double, lat double")
        assert spatial.point_in_polygon_join(pts, polys).count() == 0


class TestKNN:
    def test_exact_vs_brute_force(self, spark, points):
        queries = spark.createDataFrame(
            [(1, 0.0, 0.0), (2, 1.0, 2.0), (3, 5.0, 0.1), (4, 2.5, 1.0), (5, -3.0, -3.0)],
            "qid long, lon double, lat double",
        )
        cfg = EngineConfig(knn_max_ring=64)
        got = spatial.knn_join(points, queries, k=5, res=6, cfg=cfg)
        want = spatial.knn_brute_force(points, queries, k=5)
        g = {(r.qid, r.rank): r.id for r in got.collect()}
        w = {(r.qid, r.rank): r.id for r in want.collect()}
        assert g == w

    def test_knn_deterministic_tiebreak(self, spark):
        # two candidates at identical distance → lower id wins rank 1
        pts = spark.createDataFrame(
            [(10, 1.0, 0.0), (2, -1.0, 0.0), (30, 3.0, 0.0)],
            "id long, lon double, lat double",
        )
        q = spark.createDataFrame([(1, 0.0, 0.0)], "qid long, lon double, lat double")
        got = {r.rank: r.id for r in spatial.knn_brute_force(pts, q, k=2).collect()}
        assert got == {1: 2, 2: 10}


class TestBboxQuery:
    def test_interval_semantics(self, spark):
        feats = spark.createDataFrame(
            [
                (1, 0.0, 0.0, 1.0, 1.0),    # overlaps query
                (2, 5.0, 5.0, 6.0, 6.0),    # outside
                (3, -2.0, -2.0, 0.0, 0.0),  # touches corner → included
                (4, 0.5, 0.5, 0.5, 0.5),    # scalar inside
            ],
            "id long, minx double, miny double, maxx double, maxy double",
        )
        got = {r.id for r in spatial.bbox_query(feats, 0.0, 0.0, 2.0, 2.0).collect()}
        assert got == {1, 3, 4}
