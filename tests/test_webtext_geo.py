"""Geotag bridge tests: HTML geo metadata → points → H3 cells."""

import pytest
from pyspark.sql import functions as F

from ingest_spark.operators import webtext as wt


class TestGeotagPoints:
    def test_closed_form_parity(self, spark):
        n = 105
        pts = {r["page_id"]: (r["lat"], r["lon"])
               for r in wt.geotag_points(
                   wt.synthetic_geotagged_pages(spark, n)).collect()}
        want = {}
        for i in range(n):
            if i % 3 == 2 or i % 21 == 6:
                continue  # no meta / malformed
            want[i] = wt._geo_values(i)
        assert pts == want

    def test_geo_position_wins_over_icbm(self, spark):
        html = ('<html><head>'
                '<meta name="geo.position" content="10.5;20.25">'
                '<meta name="ICBM" content="1.0, 2.0">'
                '</head><body>x</body></html>')
        df = spark.createDataFrame([(0, html)], ["page_id", "html"])
        row = wt.geotag_points(df).first()
        assert (row["lat"], row["lon"]) == (10.5, 20.25)

    @pytest.mark.parametrize("content", [
        "here;there", "1.0", "1.0;2.0;3.0", "", "nan;nan-ish",
    ])
    def test_malformed_skipped_rowwise(self, spark, content):
        good = '<meta name="ICBM" content="3.0, 4.0">'
        bad = f'<meta name="geo.position" content="{content}">'
        df = spark.createDataFrame(
            [(0, f"<html><head>{bad}</head><body>a</body></html>"),
             (1, f"<html><head>{good}</head><body>b</body></html>")],
            ["page_id", "html"])
        rows = wt.geotag_points(df).collect()
        # the malformed page vanishes; the good page in the SAME batch
        # survives ("nan;nan-ish" parses floats? no — 'nan-ish' fails)
        assert [(r["page_id"], r["lat"], r["lon"]) for r in rows] == \
            [(1, 3.0, 4.0)]

    def test_quarter_degree_values_are_exact_doubles(self):
        for i in range(0, 400, 7):
            lat, lon = wt._geo_values(i)
            assert lat * 4 == int(lat * 4)
            assert lon * 4 == int(lon * 4)
            assert float(repr(lat)) == lat and float(repr(lon)) == lon
