"""MVT tile layer: simplify/clip/quantize kernels + mvt_tiles operator.

The geometry encoding is the public Mapbox Vector Tile 2.1 command
stream; kernels are re-implementations of the published algorithms
(Douglas-Peucker 1973, Liang-Barsky, Sutherland-Hodgman) — see
functions/mvt.py. Tests pin: encode/decode inverses, DP properties
(endpoint keep, subsequence, deviation bound, idempotence), clip
containment, and deterministic payload bytes through Spark."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from hypothesis import given, settings, strategies as st

from ingest_spark.functions import mvt as M


class TestZigzagCommands:
    def test_zigzag_roundtrip(self):
        v = np.array([0, -1, 1, -2, 2, 2**31, -(2**31), -9876543210, 12345])
        assert (M.unzigzag(M.zigzag(v)) == v).all()

    def test_zigzag_spec_values(self):
        # published MVT/protobuf examples: 0→0, -1→1, 1→2, -2→3, 2→4
        assert M.zigzag([0, -1, 1, -2, 2]).tolist() == [0, 1, 2, 3, 4]

    def test_command_integer_spec_example(self):
        # spec §4.3.3 example: a MoveTo(1) command integer is 9
        parts = [(np.array([1]), np.array([1]))]
        b = M.encode_geometry("point", parts)
        assert b[0] == 9  # (1 & 7) | (1 << 3)

    @given(st.lists(st.tuples(st.integers(-10000, 10000),
                              st.integers(-10000, 10000)),
                    min_size=2, max_size=40))
    @settings(max_examples=60, deadline=None)
    def test_line_encode_decode_roundtrip(self, pts):
        qx = np.array([p[0] for p in pts], dtype=np.int64)
        qy = np.array([p[1] for p in pts], dtype=np.int64)
        # drop consecutive duplicates (encoder precondition)
        keep = np.ones(len(qx), dtype=bool)
        keep[1:] = (qx[1:] != qx[:-1]) | (qy[1:] != qy[:-1])
        qx, qy = qx[keep], qy[keep]
        if len(qx) < 2:
            return
        dec = M.decode_geometry("line", M.encode_geometry("line", [(qx, qy)]))
        assert len(dec) == 1
        assert (dec[0][0] == qx).all() and (dec[0][1] == qy).all()

    def test_multipart_line_cursor_is_relative(self):
        parts = [(np.array([0, 10]), np.array([0, 0])),
                 (np.array([20, 30]), np.array([5, 5]))]
        dec = M.decode_geometry("line", M.encode_geometry("line", parts))
        assert len(dec) == 2
        assert dec[1][0].tolist() == [20, 30] and dec[1][1].tolist() == [5, 5]

    def test_polygon_close_path(self):
        ring = (np.array([0, 100, 50]), np.array([0, 0, 80]))
        b = M.encode_geometry("polygon", [ring])
        dec = M.decode_geometry("polygon", b)
        assert dec[0][0].tolist() == [0, 100, 50]
        # ClosePath emitted: last command integer is 15 = (7&7)|(1<<3)
        assert b[-1] == 15


class TestSimplify:
    def test_collinear_collapses(self):
        xs = np.arange(10, dtype=float)
        ys = np.zeros(10)
        k = M.simplify_dp(xs, ys, 0.5)
        assert k.sum() == 2 and k[0] and k[-1]

    def test_corner_kept(self):
        xs = np.array([0, 5, 10.0])
        ys = np.array([0, 5, 0.0])
        assert M.simplify_dp(xs, ys, 1.0).sum() == 3

    @given(st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
                    min_size=2, max_size=30),
           st.floats(0.01, 10.0))
    @settings(max_examples=60, deadline=None)
    def test_dp_properties(self, pts, tol):
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        k = M.simplify_dp(xs, ys, tol)
        # endpoints always kept, mask length matches
        assert k[0] and k[-1] and len(k) == len(xs)
        sx, sy = xs[k], ys[k]
        # DP's bound: every dropped point is within tol of the INFINITE
        # line through the kept pair that brackets it (the segment whose
        # recursion discarded it) — not of the clamped chain
        kept_idx = np.flatnonzero(k)
        for m in np.flatnonzero(~k):
            i = kept_idx[kept_idx < m][-1]
            j = kept_idx[kept_idx > m][0]
            dx, dy = xs[j] - xs[i], ys[j] - ys[i]
            L2 = dx * dx + dy * dy
            if L2 == 0:
                d = ((xs[m] - xs[i]) ** 2 + (ys[m] - ys[i]) ** 2) ** 0.5
            else:
                d = abs((xs[m] - xs[i]) * dy - (ys[m] - ys[i]) * dx) / L2 ** 0.5
            assert d <= tol + 1e-6
        # idempotence: simplifying the result again drops nothing
        assert M.simplify_dp(sx, sy, tol).all()


class TestClip:
    def test_line_split_on_reentry(self):
        xs = np.array([-5, 5, 15, 5, -5.0])
        ys = np.array([5, 5, 5, 8, 8.0])
        parts = M.clip_polyline(xs, ys, 0, 0, 10, 10)
        assert len(parts) == 2
        assert parts[0][0].tolist() == [0.0, 5.0, 10.0]
        assert parts[1][1].tolist() == [6.5, 8.0, 8.0]

    def test_line_fully_outside(self):
        assert M.clip_polyline([20, 30], [20, 30], 0, 0, 10, 10) == []

    def test_line_fully_inside_unchanged(self):
        parts = M.clip_polyline([1, 2, 3], [1, 2, 1], 0, 0, 10, 10)
        assert len(parts) == 1 and parts[0][0].tolist() == [1, 2, 3]

    @given(st.lists(st.tuples(st.floats(-50, 50), st.floats(-50, 50)),
                    min_size=2, max_size=25))
    @settings(max_examples=60, deadline=None)
    def test_clip_output_within_box(self, pts):
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        for px, py in M.clip_polyline(xs, ys, -10, -10, 10, 10):
            assert (px >= -10 - 1e-9).all() and (px <= 10 + 1e-9).all()
            assert (py >= -10 - 1e-9).all() and (py <= 10 + 1e-9).all()

    def test_ring_larger_than_box_becomes_box(self):
        cx, cy = M.clip_ring([-5, 15, 15, -5.0], [-5, -5, 15, 15.0], 0, 0, 10, 10)
        assert sorted(zip(cx, cy)) == [(0, 0), (0, 10), (10, 0), (10, 10)]

    def test_ring_inside_unchanged(self):
        cx, cy = M.clip_ring([1, 9, 5.0], [1, 1, 9.0], 0, 0, 10, 10)
        assert cx.tolist() == [1, 9, 5] and cy.tolist() == [1, 1, 9]

    def test_ring_outside_empty(self):
        cx, cy = M.clip_ring([20, 30, 25.0], [20, 20, 30.0], 0, 0, 10, 10)
        assert len(cx) == 0

    @given(st.lists(st.tuples(st.floats(-50, 50), st.floats(-50, 50)),
                    min_size=3, max_size=20))
    @settings(max_examples=60, deadline=None)
    def test_ring_clip_within_box(self, pts):
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        cx, cy = M.clip_ring(xs, ys, -10, -10, 10, 10)
        assert (cx >= -10 - 1e-9).all() and (cx <= 10 + 1e-9).all()
        assert (cy >= -10 - 1e-9).all() and (cy <= 10 + 1e-9).all()


class TestQuantize:
    def test_half_up_and_dedupe(self):
        qx, qy = M.quantize([0.4, 0.5, 0.6, 5.0], [0.4, 0.5, 0.6, 5.0])
        assert qx.tolist() == [0, 1, 5]  # 0.5→1, 0.6→1 deduped

    def test_tile_geometry_polygon_degenerate_dropped(self):
        # sliver collapses to zero area after quantization
        assert M.tile_geometry("polygon", [0.0, 100.0, 100.0],
                               [0.0, 0.1, 0.2], tol=0.0) == []

    def test_tile_geometry_point_filter(self):
        # -100 < -buf and (4200, 9000) outside the buffered square drop;
        # the in-buffer points (-30, …) and (2000, …) survive
        parts = M.tile_geometry("point", [-100.0, -30.0, 2000.0, 4200.0],
                                [0.0, 10.0, 2000.0, 9000.0],
                                extent=4096, buf=64)
        assert parts[0][0].tolist() == [-30, 2000]

    def test_ring_start_rotation_invariance(self):
        xs = np.array([0.0, 4000.0, 4000.0, 0.0])
        ys = np.array([0.0, 0.0, 4000.0, 4000.0])
        a = M.tile_geometry("polygon", xs, ys, tol=1.0)
        b = M.tile_geometry("polygon", np.roll(xs, 2), np.roll(ys, 2), tol=1.0)
        assert a[0][0].tolist() == b[0][0].tolist()
        assert a[0][1].tolist() == b[0][1].tolist()


GEOMS = [
    (1, "point", [13.02, 13.03], [37.0, 37.03]),
    (2, "line", [12.9, 13.1, 13.3], [36.9, 37.1, 36.95]),
    (3, "polygon", [12.95, 13.15, 13.05], [36.95, 36.95, 37.15]),
    (4, "line", [-179.9, 179.9], [10.0, 10.2]),
    (5, "point", [], []),  # empty geometry dropped
]


class TestMvtTilesOperator:
    @pytest.fixture(scope="class")
    def tiles(self, spark):
        df = spark.createDataFrame(
            GEOMS, "id long, gtype string, xs array<double>, ys array<double>")
        from ingest_spark.operators.tiling import mvt_tiles
        return {(r.tile_x, r.tile_y): r
                for r in mvt_tiles(df, z=6).collect()}

    def test_world_spanning_line_fans_out_and_clips(self, tiles):
        from ingest_spark.operators.tiling import decode_mvt_payload
        row_tiles = [k for k, r in tiles.items() if k[1] == 30]
        assert len(row_tiles) == 64  # whole zoom-6 x-row
        for k in row_tiles:
            feats = decode_mvt_payload(bytes(tiles[k].payload))
            ids = [f[0] for f in feats]
            assert 4 in ids
            fid, gtype, parts = feats[ids.index(4)]
            for qx, qy in parts:
                assert (qx >= -64).all() and (qx <= 4096 + 64).all()

    def test_payload_roundtrip_and_sorted_ids(self, tiles):
        from ingest_spark.operators.tiling import decode_mvt_payload
        for r in tiles.values():
            feats = decode_mvt_payload(bytes(r.payload))
            assert len(feats) == r.n_features
            ids = [f[0] for f in feats]
            assert ids == sorted(ids)

    def test_empty_geometry_dropped(self, tiles):
        from ingest_spark.operators.tiling import decode_mvt_payload
        all_ids = {f[0] for r in tiles.values()
                   for f in decode_mvt_payload(bytes(r.payload))}
        assert 5 not in all_ids
        assert {1, 2, 3, 4} <= all_ids

    def test_deterministic_bytes_across_partitionings(self, spark):
        from ingest_spark.operators.tiling import mvt_tiles
        df1 = spark.createDataFrame(
            GEOMS, "id long, gtype string, xs array<double>, ys array<double>")
        a = {(r.tile_x, r.tile_y): bytes(r.payload)
             for r in mvt_tiles(df1, z=6).collect()}
        b = {(r.tile_x, r.tile_y): bytes(r.payload)
             for r in mvt_tiles(df1.repartition(7), z=6).collect()}
        assert a == b

    def test_golden_point_payload(self, spark):
        """Pin exact bytes for one simple tile (point at lon 0+, lat 0+:
        tile (32,31) at z6 … derived by hand below)."""
        from ingest_spark.operators.tiling import mvt_tiles
        df = spark.createDataFrame(
            [(7, "point", [0.0439453125], [0.0])],  # 0.5 tile east of x=32 edge
            "id long, gtype string, xs array<double>, ys array<double>")
        rows = mvt_tiles(df, z=6).collect()
        got = {(r.tile_x, r.tile_y): bytes(r.payload) for r in rows}
        # lon 0.0439.. → Xnorm*64 = 32.0078125 → tile 32, local x = 0.0078125*4096=32
        # lat 0 → Ynorm = 0.5 → tile 32, local y = 0
        # payload: n=1 | id=7 | gtype=1 | len | MoveTo(1)=9 zig(32)=64 zig(0)=0
        assert got[(32, 32)] == bytes([1, 7, 1, 3, 9, 64, 0])

    def test_simplification_reduces_points(self, spark):
        from ingest_spark.operators.tiling import mvt_tiles, decode_mvt_payload
        # a 200-point noisy line inside one tile
        t = np.linspace(0.0, 0.05, 200)
        wig = 0.000001 * np.sin(np.arange(200))
        df = spark.createDataFrame(
            [(9, "line", (t + 10.0).tolist(), (wig + 10.0).tolist())],
            "id long, gtype string, xs array<double>, ys array<double>")
        rows = mvt_tiles(df, z=6, tolerance_px=2.0).collect()
        n_pts = sum(len(p[0]) for r in rows
                    for f in decode_mvt_payload(bytes(r.payload)) for p in f[2])
        assert 2 <= n_pts < 50  # 200 raw points simplified away


class TestPolygonHoles:
    def test_winding_canonicalized(self):
        # clockwise-input outer ring (negative surveyor area) is
        # reversed to positive; same vertex set
        a = M.tile_geometry("polygon", [0.0, 0.0, 4000.0, 4000.0],
                            [0.0, 4000.0, 4000.0, 0.0], tol=0.0)
        assert M._ring_area2(a[0][0], a[0][1]) > 0

    def test_hole_winding_negative(self):
        outer = ([0.0, 4000.0, 4000.0, 0.0], [0.0, 0.0, 4000.0, 4000.0])
        hole = ([1000.0, 2000.0, 2000.0, 1000.0],
                [1000.0, 1000.0, 2000.0, 2000.0])
        parts = M.tile_geometry("polygon", outer[0], outer[1],
                                holes=[hole], tol=0.0)
        assert len(parts) == 2
        assert M._ring_area2(parts[0][0], parts[0][1]) > 0
        assert M._ring_area2(parts[1][0], parts[1][1]) < 0

    def test_hole_outside_clip_dropped(self):
        # outer spans far beyond the tile; the hole sits wholly outside
        # the buffered square and must vanish
        outer = ([-9000.0, 9000.0, 9000.0, -9000.0],
                 [-9000.0, -9000.0, 9000.0, 9000.0])
        hole = ([7000.0, 8000.0, 8000.0, 7000.0],
                [7000.0, 7000.0, 8000.0, 8000.0])
        parts = M.tile_geometry("polygon", outer[0], outer[1],
                                holes=[hole], tol=0.0)
        assert len(parts) == 1

    def test_degenerate_hole_dropped(self):
        outer = ([0.0, 4000.0, 4000.0, 0.0], [0.0, 0.0, 4000.0, 4000.0])
        hole = ([100.0, 100.2, 100.4], [100.0, 100.1, 100.2])
        parts = M.tile_geometry("polygon", outer[0], outer[1],
                                holes=[hole], tol=0.0)
        assert len(parts) == 1

    def test_operator_end_to_end_with_hole(self, spark):
        """Cool-lake-shaped multipolygon (outer ring + inner hole, the
        reference fixture relation 700 pattern) through mvt_tiles."""
        from ingest_spark.operators.tiling import decode_mvt_payload, mvt_tiles
        rows = [(700, "polygon",
                 [5.0, 5.0, 5.01, 5.01], [-10.0, -10.01, -10.01, -10.0],
                 [[5.005, 5.006, 5.007]], [[-10.003, -10.004, -10.003]])]
        df = spark.createDataFrame(
            rows, "id long, gtype string, xs array<double>, ys array<double>, "
                  "hole_xs array<array<double>>, hole_ys array<array<double>>")
        out = mvt_tiles(df, z=14, tolerance_px=0.0).collect()
        assert out, "fixture polygon produced no tiles"
        found_hole = False
        for r in out:
            for fid, gtype, parts in decode_mvt_payload(bytes(r.payload)):
                assert fid == 700 and gtype == "polygon"
                assert M._ring_area2(parts[0][0], parts[0][1]) > 0
                for qx, qy in parts[1:]:
                    assert M._ring_area2(qx, qy) < 0
                    found_hole = True
        assert found_hole, "interior ring never survived tiling"


class TestFeatureGeometries:
    """Golden-fixture chain: pages → parse → assemble →
    feature_geometries → mvt_tiles (reference ingest.xml entities)."""

    @pytest.fixture(scope="class")
    def decoded(self, spark):
        from ingest_spark.operators import assemble, extract
        from ingest_spark.operators.tiling import (
            decode_mvt_payload, feature_geometries, mvt_tiles)
        from ingest_spark.sources import pages as pages_src

        pages = pages_src.fixture_pages(spark)
        nodes, ways, rels = extract.parse_elements(pages)
        aw = assemble.assemble_ways(ways, nodes)
        ar = assemble.assemble_relations(rels, ways, nodes)
        g = feature_geometries(nodes, aw, ar)
        out = []
        for r in mvt_tiles(g, z=10).collect():
            for fid, gtype, parts in decode_mvt_payload(bytes(r.payload)):
                out.append((fid, gtype, parts, (r.tile_x, r.tile_y)))
        return out

    def test_tagged_nodes_become_points(self, decoded):
        by_id = {f[0]: f[1] for f in decoded}
        assert by_id.get(1312) == "point"      # amenity=cafe
        assert by_id.get(2000) == "point"      # amenity=bus_station
        assert 1313 not in by_id               # untagged node dropped

    def test_park_way_is_polygon(self, decoded):
        feats = [f for f in decoded if f[0] == 555]
        assert feats and all(f[1] == "polygon" for f in feats)
        parts = feats[0][2]
        assert len(parts) == 1
        assert M._ring_area2(parts[0][0], parts[0][1]) > 0

    def test_lake_relation_has_hole(self, decoded):
        feats = [f for f in decoded if f[0] == 700]
        assert feats and all(f[1] == "polygon" for f in feats)
        with_hole = [f for f in feats if len(f[2]) == 2]
        assert with_hole, "lake hole (inner way 601) lost"
        outer, hole = with_hole[0][2]
        assert M._ring_area2(*outer) > 0 and M._ring_area2(*hole) < 0
        # hole strictly smaller than the outer
        assert abs(M._ring_area2(*hole)) < M._ring_area2(*outer)

    def test_open_way_would_be_line(self, spark):
        from ingest_spark.operators import assemble
        from ingest_spark.operators.tiling import feature_geometries
        nodes = spark.createDataFrame(
            [(1, 10.0, 10.0, ""), (2, 10.1, 10.0, ""), (3, 10.1, 10.1, "")],
            "id long, lon double, lat double, tags string")
        ways = spark.createDataFrame(
            [(77, [1, 2, 3], "highway=path")],
            "id long, refs array<long>, tags string")
        aw = assemble.assemble_ways(ways, nodes)
        ar_empty = assemble.assemble_relations(
            spark.createDataFrame(
                [], "id long, members array<struct<mtype:string,role:string,ref:long>>, tags string"),
            ways, nodes)
        g = feature_geometries(nodes.where(F.col("tags") != ""), aw, ar_empty)
        rows = {r.id: r for r in g.collect()}
        assert rows[77].gtype == "line" and len(rows[77].xs) == 3


class TestDecodePointSums:
    """decode_mvt_payload_point_sums parity: the vectorized fast path
    (all-single-point payloads) and the exact fallback (anything else)
    must both equal summing decode_mvt_payload's parts."""

    @staticmethod
    def _loop_sums(payload: bytes):
        from ingest_spark.operators.tiling import decode_mvt_payload
        feats = decode_mvt_payload(payload)
        return (
            sum(int(p[0].sum()) for f in feats for p in f[2]),
            sum(int(p[1].sum()) for f in feats for p in f[2]),
        )

    def test_parity_on_operator_tiles_mixed_and_point_only(self, spark):
        from ingest_spark.operators.tiling import (
            decode_mvt_payload_point_sums, mvt_tiles,
        )
        df = spark.createDataFrame(
            GEOMS, "id long, gtype string, xs array<double>, ys array<double>")
        rows = mvt_tiles(df, z=6).collect()
        assert rows
        for r in rows:  # mix of point-only and line/polygon tiles
            assert decode_mvt_payload_point_sums(bytes(r.payload)) == \
                self._loop_sums(bytes(r.payload))

    def test_parity_on_synthetic_point_payloads(self):
        import random

        from ingest_spark.functions import mvt as M
        from ingest_spark.functions import varint
        from ingest_spark.operators.tiling import decode_mvt_payload_point_sums

        rng = random.Random(11)
        for trial in range(50):
            n = rng.randrange(0, 20)
            buf = [varint.encode(n)]
            for i in range(n):
                # coords span negatives and multi-byte varint ranges
                qx, qy = rng.randrange(-70, 4200), rng.randrange(-70, 4200)
                g = M.encode_geometry("point", [([qx], [qy])])
                buf += [varint.encode(1000 + i), b"\x01", varint.encode(len(g)), g]
            payload = b"".join(buf)
            assert decode_mvt_payload_point_sums(payload) == \
                self._loop_sums(payload)

    def test_fallback_on_multipoint_and_line(self):
        from ingest_spark.functions import mvt as M
        from ingest_spark.functions import varint
        from ingest_spark.operators.tiling import decode_mvt_payload_point_sums

        # a 2-point feature (MoveTo count 2) must not match the
        # single-point stride and must still sum exactly
        g = M.encode_geometry("point", [([5, 9], [6, -3])])
        payload = varint.encode(1) + varint.encode(1) + b"\x01" + \
            varint.encode(len(g)) + g
        assert decode_mvt_payload_point_sums(payload) == self._loop_sums(payload)
        gl = M.encode_geometry("line", [([0, 10, 20], [0, 12, 4])])
        payload = varint.encode(1) + varint.encode(2) + b"\x02" + \
            varint.encode(len(gl)) + gl
        assert decode_mvt_payload_point_sums(payload) == self._loop_sums(payload)
