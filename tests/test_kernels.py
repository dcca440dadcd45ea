"""Pure-kernel unit tests: varint, earcut, georender codec, tags, areas.

Golden values re-express /root/reference/tests/ingest.rs:51-87.
"""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from ingest_spark.functions import varint
from ingest_spark.functions.earcut import deviation, earcut
from ingest_spark.functions import georender as gr
from ingest_spark.functions import tags as tg
from ingest_spark.functions import areas


GOLDEN_LAKE_CELLS = [0, 1, 4, 5, 4, 1, 3, 0, 4, 6, 5, 1, 3, 4, 6, 6, 1, 2, 2, 3, 6]


def f32(vals):
    return [float(np.float32(v)) for v in vals]


class TestVarint:
    @given(st.integers(min_value=0, max_value=2**63 - 1))
    def test_roundtrip(self, n):
        buf = varint.encode(n)
        size, value = varint.decode(buf)
        assert value == n
        assert size == len(buf)

    def test_known(self):
        assert varint.encode(0) == b"\x00"
        assert varint.encode(14) == b"\x0e"  # the "\x0e=triangle park" prefix
        assert varint.encode(300) == b"\xac\x02"

    def test_offset(self):
        buf = b"\xff" + varint.encode(300)
        assert varint.decode(buf, 1) == (2, 300)

    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=50))
    def test_encode_matrix_parity(self, vals):
        mat, lens = varint.encode_matrix(np.array(vals, dtype=np.uint64))
        for i, v in enumerate(vals):
            assert mat[i, : lens[i]].tobytes() == varint.encode(v)

    def test_encode_matrix_boundaries(self):
        # 7-bit group boundaries where varint length changes
        vals = [0, 127, 128, 16383, 16384, 2**63 - 1]
        mat, lens = varint.encode_matrix(np.array(vals, dtype=np.uint64))
        for i, v in enumerate(vals):
            assert mat[i, : lens[i]].tobytes() == varint.encode(v)


class TestEarcut:
    def test_golden_lake_with_hole(self):
        # reference tests/ingest.rs:64-71: outer ring 600 + inner ring 601,
        # coordinates narrowed to f32 (src/lib.rs:350) before triangulation
        data = f32([5.000, -10.000, 5.000, -10.010, 5.010, -10.010,
                    5.010, -10.000, 5.005, -10.003, 5.006, -10.004,
                    5.007, -10.003])
        assert earcut(data, [4], 2) == GOLDEN_LAKE_CELLS

    def test_triangle(self):
        # reference tests/ingest.rs:51-53 recomputes cells via earcutr
        data = f32([13.00, 37.00, 13.01, 37.01, 13.02, 37.00])
        cells = earcut(data, [], 2)
        assert sorted(cells) == [0, 1, 2]
        assert deviation(data, [], 2, cells) < 1e-9

    def test_square(self):
        cells = earcut([0, 0, 1, 0, 1, 1, 0, 1], [], 2)
        assert len(cells) == 6
        assert deviation([0, 0, 1, 0, 1, 1, 0, 1], [], 2, cells) < 1e-12

    def test_degenerate(self):
        assert earcut([], [], 2) == []
        assert earcut([0, 0, 1, 0], [], 2) == []

    @given(st.integers(min_value=5, max_value=120), st.integers(min_value=0, max_value=10**6))
    def test_regular_polygon_area_preserved(self, n, seed):
        rng = np.random.default_rng(seed)
        # star-shaped w.r.t. origin (one vertex per angular slot) ⇒ the
        # polygon is guaranteed simple, which earcut requires
        angles = (np.arange(n) + rng.uniform(0.0, 0.9, size=n)) / n * 2 * np.pi
        radii = rng.uniform(0.5, 1.0, size=n)
        data = np.empty(2 * n)
        data[0::2] = radii * np.cos(angles)
        data[1::2] = radii * np.sin(angles)
        cells = earcut(data.tolist(), [], 2)
        assert deviation(data.tolist(), [], 2, cells) < 1e-6

    def test_large_polygon_uses_zorder_path(self):
        # >80 vertices triggers the z-order hashed ear check
        n = 200
        angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
        data = np.empty(2 * n)
        data[0::2] = np.cos(angles)
        data[1::2] = np.sin(angles)
        cells = earcut(data.tolist(), [], 2)
        assert len(cells) == 3 * (n - 2)
        assert deviation(data.tolist(), [], 2, cells) < 1e-9


class TestGeorender:
    def test_labels_golden(self):
        assert gr.pack_labels("triangle park") == b"\x0e=triangle park\x00"
        assert gr.pack_labels("cool lake") == b"\x0a=cool lake\x00"
        assert gr.pack_labels(None) == b"\x00"
        assert gr.pack_labels("") == b"\x00"

    def test_feature_id_mangling(self):
        assert gr.feature_id(555, gr.KIND_WAY) == 1666
        assert gr.feature_id(700, gr.KIND_RELATION) == 2102
        assert gr.feature_id(1312, gr.KIND_NODE) == 3936
        assert gr.feature_id(2000, gr.KIND_NODE) == 6000

    def test_point_roundtrip_and_get_id(self):
        fid = gr.feature_id(1312, gr.KIND_NODE)
        ft = tg.get_type("amenity.cafe")
        buf = gr.encode_point(fid, ft, 13.02, 37.00, gr.pack_labels(None))
        assert gr.get_id(buf) == fid  # V::get_id layout parity (value.rs:28-38)
        d = gr.decode(buf)
        assert d["geom_kind"] == gr.GEOM_POINT
        assert d["feature_type"] == ft
        assert d["id"] == fid
        assert d["point"] == pytest.approx((13.02, 37.00), abs=1e-5)
        assert d["labels"] == b"\x00"

    def test_area_roundtrip(self):
        pos = f32([5.000, -10.000, 5.000, -10.010, 5.010, -10.010,
                   5.010, -10.000, 5.005, -10.003, 5.006, -10.004,
                   5.007, -10.003])
        fid = gr.feature_id(700, gr.KIND_RELATION)
        ft = tg.get_type("natural.water")
        buf = gr.encode_area(fid, ft, pos, GOLDEN_LAKE_CELLS, gr.pack_labels("cool lake"))
        assert gr.get_id(buf) == fid
        d = gr.decode(buf)
        assert d["cells"] == GOLDEN_LAKE_CELLS
        assert d["labels"] == b"\x0a=cool lake\x00"
        assert d["positions"] == pytest.approx(pos, abs=1e-6)

    def test_line_roundtrip(self):
        buf = gr.encode_line(10, 3, [0.0, 0.0, 1.5, 2.5], gr.pack_labels("x"))
        d = gr.decode(buf)
        assert d["geom_kind"] == gr.GEOM_LINE
        assert d["positions"] == pytest.approx([0.0, 0.0, 1.5, 2.5])


class TestTags:
    def test_fixture_types_exist_and_distinct(self):
        names = ["leisure.park", "natural.water", "amenity.cafe",
                 "amenity.bus_station", "place.other"]
        ids = [tg.get_type(n) for n in names]
        assert len(set(ids)) == len(ids)

    def test_classify(self):
        assert tg.classify({"amenity": "cafe"}) == tg.get_type("amenity.cafe")
        assert tg.classify({"leisure": "park", "name": "triangle park"}) == tg.get_type("leisure.park")
        assert tg.classify({"type": "multipolygon", "natural": "water"}) == tg.get_type("natural.water")
        # untagged / unknown → place.other (F2 drop)
        assert tg.classify({}) == tg.place_other_id()
        assert tg.classify(None) == tg.place_other_id()
        assert tg.classify({"name": "just a name"}) == tg.place_other_id()
        assert tg.classify({"amenity": "zzz_unknown"}) == tg.get_type("amenity.other")

    def test_label_name(self):
        assert tg.label_name({"name": "cool lake"}) == "cool lake"
        assert tg.label_name({}) is None


class TestAreas:
    def test_way_area(self):
        # way 555: closed + leisure=park → area (golden is Feature::Area)
        assert areas.way_is_area({"leisure": "park", "name": "triangle park"},
                                 [1313, 1314, 1315, 1313])
        # untagged closed ring: NOT an area feature by itself
        assert not areas.way_is_area({}, [9000, 9001, 9002, 9003, 9000])
        # open way never an area
        assert not areas.way_is_area({"leisure": "park"}, [1, 2, 3])
        assert areas.way_is_area({"area": "yes"}, [1, 2, 3, 1])
        assert not areas.way_is_area({"leisure": "park", "area": "no"}, [1, 2, 3, 1])
        assert not areas.way_is_area({"natural": "coastline"}, [1, 2, 3, 1])

    def test_relation_area(self):
        assert areas.relation_is_area({"type": "multipolygon", "natural": "water"}, 2)
        assert not areas.relation_is_area({"type": "route"}, 2)
        assert not areas.relation_is_area({"type": "multipolygon"}, 0)


class TestHashStrMany:
    def test_bit_identical_to_scalar(self):
        import numpy as np

        from ingest_spark.functions import sketches as sk

        words = ["", "a", "the", "café", "straße", "x" * 100, "word", "Word", "éè"]
        got = sk.hash_str_many(words)
        want = np.array([sk.hash_str(w) for w in words], dtype=np.uint64)
        assert (got == want).all()

    def test_hypothesis_parity(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ingest_spark.functions import sketches as sk

        @settings(max_examples=50, deadline=None)
        @given(st.lists(st.text(max_size=40), max_size=30))
        def run(words):
            got = sk.hash_str_many(words)
            want = np.array(
                [sk.hash_str(w) for w in words], dtype=np.uint64
            ).reshape(len(words))
            assert (got == want).all()

        run()


class TestSimhashMany:
    def test_parity_with_scalar(self):
        import numpy as np

        from ingest_spark.functions import sketches as sk

        rng = np.random.default_rng(9)
        # full uint64 range so bit 63 (set in ~half of real FNV
        # hashes) is exercised; sizes include zero-count docs
        # interleaved with non-empty ones (the reduceat offset path)
        docs = [rng.integers(0, 2**64, size=int(n), dtype=np.uint64)
                for n in rng.integers(0, 40, size=50)]
        th = np.concatenate([d for d in docs]) if docs else np.empty(0, np.uint64)
        counts = np.array([len(d) for d in docs], dtype=np.int64)
        got = sk.simhash_many(th, counts)
        want = np.array([sk.simhash(d) for d in docs], dtype=np.uint64)
        assert (got == want).all()

    def test_empty_and_all_empty(self):
        import numpy as np

        from ingest_spark.functions import sketches as sk

        assert (sk.simhash_many(np.empty(0, np.uint64), np.zeros(3, np.int64)) == 0).all()


class TestMinhashBandsBatch:
    def test_parity_with_scalar(self):
        import numpy as np

        from ingest_spark.functions import sketches as sk

        rng = np.random.default_rng(17)
        sigs = rng.integers(0, 2**64, size=(40, 64), dtype=np.uint64)
        got = sk.minhash_bands_batch(sigs, bands=16)
        want = np.stack([sk.minhash_bands(s, bands=16) for s in sigs])
        assert (got == want).all()

    def test_empty(self):
        import numpy as np

        from ingest_spark.functions import sketches as sk

        out = sk.minhash_bands_batch(np.empty((0, 64), np.uint64), bands=16)
        assert out.shape == (0, 16)
