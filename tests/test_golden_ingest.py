"""End-to-end golden ingest test — re-expression of the reference's
single integration test (/root/reference/tests/ingest.rs:10-87):

fixture pages → extract text (byte-identical) → parse elements →
assemble/classify/encode features → bbox query ((3,-15),(15,45)) →
sort by id → exact match of the 4 golden features.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ingest_spark.functions import georender as gr
from ingest_spark.functions import tags as tg
from ingest_spark.operators import extract
from ingest_spark.operators.features import build_features
from ingest_spark.sources import pages as pages_src

GOLDEN_LAKE_CELLS = [0, 1, 4, 5, 4, 1, 3, 0, 4, 6, 5, 1, 3, 4, 6, 6, 1, 2, 2, 3, 6]


def f32(vals):
    return [float(np.float32(v)) for v in vals]


@pytest.fixture(scope="module")
def fixture_pages(spark):
    return pages_src.fixture_pages(spark).cache()


@pytest.fixture(scope="module")
def features(spark, fixture_pages):
    nodes, ways, rels = extract.parse_elements(fixture_pages)
    return build_features(nodes, ways, rels, spark).cache()


class TestExtraction:
    def test_arrow_extraction_byte_identical(self, spark, fixture_pages):
        """input_hint invariant: extracted text byte-identical per url."""
        got = extract.extract_text(fixture_pages).withColumnRenamed("text", "got")
        cmp = fixture_pages.select("url", "text").join(got, "url", "inner")
        bad = cmp.where(
            F.col("text").isNull() | (F.encode("text", "UTF-8") != F.encode("got", "UTF-8"))
        )
        assert cmp.count() == 16
        assert bad.count() == 0

    def test_expr_extraction_matches_arrow(self, spark, fixture_pages):
        a = extract.extract_text(fixture_pages).withColumnRenamed("text", "a")
        b = extract.extract_text_expr(fixture_pages).withColumnRenamed("text", "b")
        bad = a.join(b, "url").where(F.col("a") != F.col("b"))
        assert bad.count() == 0

    def test_parse_element_counts(self, fixture_pages):
        nodes, ways, rels = extract.parse_elements(fixture_pages)
        assert nodes.count() == 12
        assert ways.count() == 3
        assert rels.count() == 1

    def test_parsed_node_values(self, fixture_pages):
        nodes, _, _ = extract.parse_elements(fixture_pages)
        row = nodes.where(F.col("id") == 1312).first()
        assert row.lon == 13.02 and row.lat == 37.0
        assert dict(row.tags) == {"amenity": "cafe"}

    def test_parsed_relation_members(self, fixture_pages):
        _, _, rels = extract.parse_elements(fixture_pages)
        row = rels.first()
        assert [(m.ref, m.role, m.mtype) for m in row.members] == [
            (600, "outer", "way"), (601, "inner", "way"),
        ]


class TestGoldenFeatures:
    """The 4-feature golden (reference tests/ingest.rs:51-87)."""

    def _query_sorted(self, features):
        # S11 bbox query: interval intersects ((3,-15),(15,45))
        q = features.where(
            (F.col("maxx") >= 3.0) & (F.col("minx") <= 15.0)
            & (F.col("maxy") >= -15.0) & (F.col("miny") <= 45.0)
        )
        rows = q.orderBy("id").collect()
        return [(r, gr.decode(bytes(r.encoded))) for r in rows]

    def test_exactly_four_features(self, features):
        assert len(self._query_sorted(features)) == 4

    def test_golden_ids_and_types(self, features):
        got = [(d["id"], d["feature_type"]) for _, d in self._query_sorted(features)]
        assert got == [
            (555 * 3 + 1, tg.get_type("leisure.park")),
            (700 * 3 + 2, tg.get_type("natural.water")),
            (1312 * 3 + 0, tg.get_type("amenity.cafe")),
            (2000 * 3 + 0, tg.get_type("amenity.bus_station")),
        ]

    def test_park_area(self, features):
        r, d = self._query_sorted(features)[0]
        assert d["geom_kind"] == gr.GEOM_AREA
        assert d["positions"] == pytest.approx(
            f32([13.00, 37.00, 13.01, 37.01, 13.02, 37.00])
        )
        # cells recomputed exactly like tests/ingest.rs:52-53
        from ingest_spark.functions.earcut import earcut
        assert d["cells"] == earcut(f32([13.00, 37.00, 13.01, 37.01, 13.02, 37.00]), [], 2)
        assert d["labels"] == b"\x0e=triangle park\x00"
        # interval geometry key (Coord::Interval)
        assert (r.minx, r.maxx) == pytest.approx(f32([13.00, 13.02]))
        assert (r.miny, r.maxy) == pytest.approx(f32([37.00, 37.01]))

    def test_lake_multipolygon_with_hole(self, features):
        r, d = self._query_sorted(features)[1]
        assert d["geom_kind"] == gr.GEOM_AREA
        assert d["positions"] == pytest.approx(
            f32([5.000, -10.000, 5.000, -10.010, 5.010, -10.010, 5.010, -10.000,
                 5.005, -10.003, 5.006, -10.004, 5.007, -10.003])
        )
        assert d["cells"] == GOLDEN_LAKE_CELLS  # literal golden tests/ingest.rs:71
        assert d["labels"] == b"\x0a=cool lake\x00"
        assert (r.minx, r.maxx) == pytest.approx(f32([5.000, 5.010]))
        assert (r.miny, r.maxy) == pytest.approx(f32([-10.010, -10.000]))

    def test_point_features(self, features):
        rows = self._query_sorted(features)
        cafe_r, cafe = rows[2]
        bus_r, bus = rows[3]
        assert cafe["point"] == pytest.approx(f32([13.02, 37.00]))
        assert cafe["labels"] == b"\x00"
        assert bus["point"] == pytest.approx(f32([13.03, 37.03]))
        assert bus["labels"] == b"\x00"
        # scalar geometry: minx == maxx (Coord::Scalar)
        assert cafe_r.minx == cafe_r.maxx and cafe_r.miny == cafe_r.maxy

    def test_negative_untagged_absorbed(self, features):
        """Untagged nodes 1313-1315/9000-9006 and untagged ways 600/601
        never become standalone features (place.other → F2 drop)."""
        ids = {r.osm_id for r in features.select("osm_id").collect()}
        assert ids == {555, 700, 1312, 2000}

    def test_get_id_header_parity(self, features):
        """V::get_id layout (reference src/value.rs:28-38) works on every
        payload and equals the id column."""
        for r in features.collect():
            assert gr.get_id(bytes(r.encoded)) == r.id


class TestVectorizedPointEncode:
    def test_parity_with_scalar_codec(self, spark):
        """The numpy batch assembly in _encode_point_udf must be
        byte-identical to the scalar gr.encode_point composition for
        every classification/null branch."""
        from ingest_spark.operators.features import node_features

        rows = [
            (1, 12.5, -3.25, {"amenity": "cafe", "name": "corner cafe"}),
            (2, 0.1, 0.2, {"leisure": "park"}),                     # unnamed
            (3, 5.0, 6.0, {"shop": "weirdvalue"}),                  # → shop.other
            (4, 7.0, 8.0, {"randomkey": "x"}),                      # place.other → dropped
            (5, None, 2.0, {"amenity": "pub"}),                     # null coord → dropped
            (6, 1.0, 2.0, {}),                                      # no tags → dropped
            (2**40 + 7, -100.0, 45.0, {"natural": "peak", "name": "big id"}),  # multi-byte varint
        ]
        nodes = spark.createDataFrame(
            rows, "id long, lon double, lat double, tags map<string,string>"
        )
        got = {r.osm_id: r for r in node_features(nodes, spark).collect()}
        assert set(got) == {1, 2, 3, 2**40 + 7}
        for osm_id, lon, lat, tags in rows:
            if osm_id not in got:
                continue
            ft = tg.classify(tags)
            want = gr.encode_point(
                gr.feature_id(osm_id, gr.KIND_NODE), ft, lon, lat,
                gr.pack_labels(tags.get("name")),
            )
            assert bytes(got[osm_id].encoded) == want
            assert got[osm_id].feature_type == ft


class TestUnresolvedClosingRef:
    def test_closing_ref_unresolved_keeps_last_vertex(self, spark):
        """A closed area way whose closing node id never resolves: the
        resolved sequence is open, so the encode strip must NOT remove
        the genuine last vertex (the reference skips unresolved refs
        without dropping real points)."""
        from ingest_spark.operators.features import way_features

        ways = spark.createDataFrame(
            [(100, [1, 2, 3, 4, 1], {"leisure": "park", "name": "p"})],
            "id long, refs array<long>, tags map<string,string>",
        )
        # node 1 (the closing ref) is missing
        nodes = spark.createDataFrame(
            [(2, 0.0, 0.0, {}), (3, 4.0, 0.0, {}), (4, 4.0, 4.0, {})],
            "id long, lon double, lat double, tags map<string,string>",
        )
        feats = way_features(ways, nodes, spark).collect()
        assert len(feats) == 1
        dec = gr.decode(bytes(feats[0].encoded))
        # all 3 resolved vertices survive (the raw-refs closure flag
        # would have stripped (4.0, 4.0))
        assert len(dec["positions"]) == 6
        assert dec["positions"][4:6] == f32([4.0, 4.0])

    def test_resolved_closed_way_still_strips_duplicate(self, spark):
        """Control: when the closing ref resolves, the duplicate closing
        vertex is stripped before earcut exactly as before."""
        from ingest_spark.operators.features import way_features

        ways = spark.createDataFrame(
            [(100, [1, 2, 3, 4, 1], {"leisure": "park"})],
            "id long, refs array<long>, tags map<string,string>",
        )
        nodes = spark.createDataFrame(
            [(1, 0.0, 4.0, {}), (2, 0.0, 0.0, {}), (3, 4.0, 0.0, {}), (4, 4.0, 4.0, {})],
            "id long, lon double, lat double, tags map<string,string>",
        )
        feats = way_features(ways, nodes, spark).collect()
        assert len(feats) == 1
        dec = gr.decode(bytes(feats[0].encoded))
        assert len(dec["positions"]) == 8  # 4 unique vertices, no duplicate
