"""Synthetic Common-Crawl-style pages source (input_hint shape).

Schema: ``(url string, warc_ts timestamp, html binary, text string,
lang string)``. Every page's ``html`` deterministically wraps ``text``
in ``<article>…</article>`` so the extraction invariant ("byte-identical
extracted text per url") is checkable.

Two row populations:

1. **Fixture pages** — 16 pages embedding exactly the reference's test
   entities (/root/reference/tests/data/0/ingest.xml: 12 nodes, 3 ways,
   1 relation) in the ``geo:`` microformat below.
2. **Filler pages** — generated *distributed* with ``spark.range`` +
   column expressions (no driver-side loops, scales to any n):
   deterministic LCG-mixed coordinates, a seeded hot cluster (30% of
   nodes land in one small box → real skew for the salting path),
   closed-triangle ways every 25th page, single-outer multipolygon
   relations every 100th, untagged elements mixed in (→ place.other
   drops), multilingual filler langs.

geo-entity microformat (one record per page ``text``):

    geo:node id=<i> lon=<d> lat=<d> tags=<k=v|k=v|...>
    geo:way id=<i> refs=<i,i,...> tags=<...>
    geo:relation id=<i> members=<mtype:role:ref;...> tags=<...>

Analog of the reference's PBF input (element stream, src/lib.rs §S4-S8);
at 10^12-page scale this table is the Iceberg input — here it is
materialized parquet or an in-memory DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FIXTURE_NODES = [
    (1312, "13.02", "37.0", "amenity=cafe"),
    (1313, "13.0", "37.0", ""),
    (1314, "13.01", "37.01", ""),
    (1315, "13.02", "37.0", ""),
    (2000, "13.03", "37.03", "amenity=bus_station"),
    (9000, "5.0", "-10.0", ""),
    (9001, "5.0", "-10.01", ""),
    (9002, "5.01", "-10.01", ""),
    (9003, "5.01", "-10.0", ""),
    (9004, "5.005", "-10.003", ""),
    (9005, "5.006", "-10.004", ""),
    (9006, "5.007", "-10.003", ""),
]

FIXTURE_WAYS = [
    (555, "1313,1314,1315,1313", "leisure=park|name=triangle park"),
    (600, "9000,9001,9002,9003,9000", ""),
    (601, "9004,9005,9006,9004", ""),
]

FIXTURE_RELATIONS = [
    (700, "way:outer:600;way:inner:601", "type=multipolygon|natural=water|name=cool lake"),
]

_HTML_PREFIX = "<html><head><title>{url}</title></head><body><article>"
_HTML_SUFFIX = "</article></body></html>"

# filler id spaces keep synthetic elements clear of fixture ids
FILLER_NODE_BASE = 100_000
FILLER_WAY_BASE = 50_000_000
FILLER_REL_BASE = 90_000_000

# seeded hot cluster: ~30% of filler nodes land in this 0.02° box —
# the skew the salting path must defuse (analog of the dense buckets
# `divide` splits, reference src/divide.rs:9-72)
HOT_LON, HOT_LAT = 2.35, 48.86


def _fixture_rows() -> list[tuple[str, str]]:
    rows = []
    for nid, lon, lat, tags in FIXTURE_NODES:
        rows.append(
            (f"https://example.test/osm/node/{nid}",
             f"geo:node id={nid} lon={lon} lat={lat} tags={tags}")
        )
    for wid, refs, tags in FIXTURE_WAYS:
        rows.append(
            (f"https://example.test/osm/way/{wid}",
             f"geo:way id={wid} refs={refs} tags={tags}")
        )
    for rid, members, tags in FIXTURE_RELATIONS:
        rows.append(
            (f"https://example.test/osm/relation/{rid}",
             f"geo:relation id={rid} members={members} tags={tags}")
        )
    return rows


def _wrap_html(url_col, text_col):
    return F.encode(
        F.concat(
            F.lit("<html><head><title>"), url_col,
            F.lit("</title></head><body><article>"), text_col,
            F.lit("</article></body></html>"),
        ),
        "UTF-8",
    )


def fixture_pages(spark: SparkSession) -> DataFrame:
    import pandas as pd

    schema = StructType(
        [StructField("url", StringType(), False), StructField("text", StringType(), False)]
    )
    # Arrow-path createDataFrame: the tuple-list path ships pickled rows
    # through a Python-worker scan (a ~0.3 s 32-task Python stage per
    # pipeline build at local[32]); the pandas input converts via Arrow
    # and scans JVM-side
    rows = _fixture_rows()
    df = spark.createDataFrame(
        pd.DataFrame({"url": [r[0] for r in rows], "text": [r[1] for r in rows]}),
        schema,
    )
    return df.select(
        "url",
        F.timestamp_seconds(F.lit(1_580_000_000)).alias("warc_ts"),
        _wrap_html(F.col("url"), F.col("text")).alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )


def _mix(col, mult: int, mod: int):
    """Deterministic LCG-style integer mix, exact in long arithmetic."""
    return F.pmod(col * F.lit(mult) + F.lit(12345), F.lit(mod))


def filler_pages(spark: SparkSession, n: int) -> DataFrame:
    """Distributed synthetic pages; pure column expressions over
    ``spark.range`` — embarrassingly parallel, no shuffle."""
    df = spark.range(0, n).withColumnRenamed("id", "i")
    i = F.col("i")

    is_way = (i % 25 == 24) & (i >= 3)
    is_rel = (i % 100 == 9) & (i >= 100)
    # hot cluster: 30% of node pages
    is_hot = (~is_way) & (~is_rel) & (i % 10 < 3)

    lon_u = _mix(i, 1_103_515_245, 360_000_000) - F.lit(180_000_000)
    lat_u = _mix(i, 2_147_483_629, 180_000_000) - F.lit(90_000_000)
    lon = F.when(is_hot, F.lit(HOT_LON) + (_mix(i, 69_069, 20_000) - 10_000) / 1e6) \
        .otherwise(lon_u / F.lit(1e6))
    lat = F.when(is_hot, F.lit(HOT_LAT) + (_mix(i, 99_991, 20_000) - 10_000) / 1e6) \
        .otherwise(lat_u / F.lit(1e6))

    node_id = i + F.lit(FILLER_NODE_BASE)
    way_id = i + F.lit(FILLER_WAY_BASE)
    rel_id = i + F.lit(FILLER_REL_BASE)

    node_tags = (
        F.when(i % 5 == 0, F.lit("amenity=cafe"))
        .when(i % 5 == 1, F.lit("highway=bus_stop"))
        .when(i % 5 == 2, F.lit("natural=tree|name=t") )
        .when(i % 5 == 3, F.lit("shop=bakery"))
        .otherwise(F.lit(""))  # → place.other → dropped (F2)
    )
    way_tags = F.when(i % 2 == 0, F.lit("leisure=park")).otherwise(F.lit(""))
    # i%100==9 is always odd, so key the alternation on the hundreds digit
    rel_tags = (
        F.when(F.floor(i / 100) % 2 == 1, F.lit("type=multipolygon|natural=water"))
        .otherwise(F.lit(""))
    )

    # way refs: closed triangle over the three preceding filler nodes
    # (those indices are never way/relation pages for i%25==24)
    r1 = i - 1 + F.lit(FILLER_NODE_BASE)
    r2 = i - 2 + F.lit(FILLER_NODE_BASE)
    r3 = i - 3 + F.lit(FILLER_NODE_BASE)
    way_refs = F.concat_ws(",", r1, r2, r3, r1)

    # relation members: the way page at i-85 ((i-85)%25==24 when i%100==9)
    member_way = i - 85 + F.lit(FILLER_WAY_BASE)

    # fixed-6-decimals string that round-trips exactly through
    # CAST(string AS DOUBLE)
    lon_s = lon.cast("decimal(11,6)").cast("string")
    lat_s = lat.cast("decimal(11,6)").cast("string")

    text = (
        F.when(
            is_rel,
            F.concat(F.lit("geo:relation id="), rel_id,
                     F.lit(" members=way:outer:"), member_way,
                     F.lit(" tags="), rel_tags),
        )
        .when(
            is_way,
            F.concat(F.lit("geo:way id="), way_id,
                     F.lit(" refs="), way_refs,
                     F.lit(" tags="), way_tags),
        )
        .otherwise(
            F.concat(F.lit("geo:node id="), node_id,
                     F.lit(" lon="), lon_s, F.lit(" lat="), lat_s,
                     F.lit(" tags="), node_tags)
        )
    )

    url = F.concat(F.lit("https://example.test/page/"), i)
    lang = (
        F.when(i % 7 == 0, "de").when(i % 7 == 1, "fr").when(i % 7 == 2, "es")
        .when(i % 7 == 3, "pt").when(i % 7 == 4, "it").otherwise("en")
    )

    return df.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(1_580_000_000) + i % 86_400).alias("warc_ts"),
        _wrap_html(url, text).alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def pages(spark: SparkSession, n_filler: int = 0, with_fixture: bool = True) -> DataFrame:
    parts = []
    if with_fixture:
        parts.append(fixture_pages(spark))
    if n_filler > 0:
        parts.append(filler_pages(spark, n_filler))
    if not parts:
        raise ValueError("empty pages source")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
