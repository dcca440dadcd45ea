"""Stage 1 — extraction: pages → text → element tables.

Analog of the reference's PBF parse (pass-1/2 blob decode,
/root/reference/src/par_scan.rs + src/denorm.rs S4-S8), re-expressed:

- ``extract_text``: html binary → text, **byte-identical per url**
  (input_hint invariant). Arrow-native: ``mapInArrow`` with pyarrow
  C++ compute kernels only (cast + RE2 ``extract_regex``) — no
  per-row Python. A pure-Catalyst twin (``extract_text_expr``) exists
  for plan comparison; both produce identical bytes.

- ``parse_nodes/ways/relations``: text → typed element DataFrames,
  100% JVM-side Catalyst expressions (regexp_extract / split /
  str_to_map) — whole-stage-codegen friendly, zero Python.

Column pruning note: each parse_* starts from ``pages.select('text')``
so Catalyst prunes the (wide) html column at the scan — the engine-level
analog of the reference's hand-rolled "bare" projected scans
(src/denorm.rs:10-72 S5/S6).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_ARTICLE_RE = r"(?s)<article>(.*)</article>"
# RE2 (pyarrow) requires named groups
_ARTICLE_RE_ARROW = r"(?s)<article>(?P<t>.*)</article>"

NODE_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("lon", DoubleType(), False),
    StructField("lat", DoubleType(), False),
    StructField("tags", MapType(StringType(), StringType()), True),
])

WAY_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("refs", ArrayType(LongType()), False),
    StructField("tags", MapType(StringType(), StringType()), True),
])


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, html) → (url, text) via Arrow C++ kernels (zero-copy batches)."""

    out_schema = StructType([
        StructField("url", StringType(), False),
        StructField("text", StringType(), True),
    ])

    def _batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            html = batch.column(batch.schema.get_field_index("html"))
            as_str = pc.cast(html, pa.string())
            m = pc.extract_regex(as_str, _ARTICLE_RE_ARROW)
            text = pc.struct_field(m, "t")
            yield pa.RecordBatch.from_arrays(
                [batch.column(batch.schema.get_field_index("url")), text],
                names=["url", "text"],
            )

    return pages.select("url", "html").mapInArrow(_batches, out_schema)


def extract_text_expr(pages: DataFrame) -> DataFrame:
    """Catalyst twin of ``extract_text`` (regexp_extract, codegen'd)."""
    return pages.select(
        "url",
        F.regexp_extract(F.decode("html", "UTF-8"), _ARTICLE_RE, 1).alias("text"),
    )


def _tags_map(tags_str):
    """'a=b|c=d' → map<string,string>; '' → empty map."""
    return F.when(tags_str == "", F.expr("map()")).otherwise(
        F.str_to_map(tags_str, F.lit("\\|"), F.lit("="))
    )


def parse_nodes(pages: DataFrame) -> DataFrame:
    """text → nodes(id, lon, lat, tags) — reference element::Node analog."""
    t = F.col("text")
    rx = r"^geo:node id=(\d+) lon=(-?[\d.]+) lat=(-?[\d.]+) tags=(.*)$"
    return (
        pages.select("text")
        .where(t.startswith("geo:node "))
        .select(
            F.regexp_extract(t, rx, 1).try_cast("long").alias("id"),
            F.regexp_extract(t, rx, 2).try_cast("double").alias("lon"),
            F.regexp_extract(t, rx, 3).try_cast("double").alias("lat"),
            _tags_map(F.regexp_extract(t, rx, 4)).alias("tags"),
        )
    )


def parse_ways(pages: DataFrame) -> DataFrame:
    """text → ways(id, refs, tags) — reference element::Way analog."""
    t = F.col("text")
    rx = r"^geo:way id=(\d+) refs=([\d,]+) tags=(.*)$"
    return (
        pages.select("text")
        .where(t.startswith("geo:way "))
        .select(
            F.regexp_extract(t, rx, 1).try_cast("long").alias("id"),
            F.split(F.regexp_extract(t, rx, 2), ",").try_cast("array<long>").alias("refs"),
            _tags_map(F.regexp_extract(t, rx, 3)).alias("tags"),
        )
    )


def parse_relations(pages: DataFrame) -> DataFrame:
    """text → relations(id, members[{ref, role, mtype}], tags) —
    reference element::Relation analog (members filtered later by F7)."""
    t = F.col("text")
    rx = r"^geo:relation id=(\d+) members=([\w:;]+) tags=(.*)$"
    # F.get (not getItem): null-tolerant under ANSI mode, since pushed-down
    # predicates can evaluate these projections on non-matching rows
    member = F.transform(
        F.split(F.regexp_extract(t, rx, 2), ";"),
        lambda m: F.struct(
            F.get(F.split(m, ":"), 2).try_cast("long").alias("ref"),
            F.get(F.split(m, ":"), 1).alias("role"),
            F.get(F.split(m, ":"), 0).alias("mtype"),
        ),
    )
    return (
        pages.select("text")
        .where(t.startswith("geo:relation "))
        .select(
            F.regexp_extract(t, rx, 1).try_cast("long").alias("id"),
            member.alias("members"),
            _tags_map(F.regexp_extract(t, rx, 3)).alias("tags"),
        )
    )


def parse_elements(pages: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    return parse_nodes(pages), parse_ways(pages), parse_relations(pages)


# ------------------------------------------------- single-pass extract
#
# parse_elements consumes the corpus THREE times (one scan per element
# table). At 10^12 pages the corpus scan dominates total pipeline cost,
# so the pipeline's extract stage uses this single-pass variant: one
# scan classifies each page and parses all element kinds into one
# unified table written partitioned by etype. Downstream readers get
# the typed views back via partition pruning (the etype=... filter
# prunes directories before any IO). Cuts pass-1 IO 3x.

_MEMBER_T = "array<struct<ref:bigint,role:string,mtype:string>>"


def parse_all(pages: DataFrame) -> DataFrame:
    """One-scan unified element table:
    (etype, id, lon, lat, refs, members, tags)."""
    t = F.col("text")
    etype = (
        F.when(t.startswith("geo:node "), "node")
        .when(t.startswith("geo:way "), "way")
        .when(t.startswith("geo:relation "), "relation")
    )
    rx_n = r"^geo:node id=(\d+) lon=(-?[\d.]+) lat=(-?[\d.]+) tags=(.*)$"
    rx_w = r"^geo:way id=(\d+) refs=([\d,]+) tags=(.*)$"
    rx_r = r"^geo:relation id=(\d+) members=([\w:;]+) tags=(.*)$"
    is_n = F.col("etype") == "node"
    is_w = F.col("etype") == "way"
    is_r = F.col("etype") == "relation"
    member = F.transform(
        F.split(F.regexp_extract(t, rx_r, 2), ";"),
        lambda m: F.struct(
            F.get(F.split(m, ":"), 2).try_cast("long").alias("ref"),
            F.get(F.split(m, ":"), 1).alias("role"),
            F.get(F.split(m, ":"), 0).alias("mtype"),
        ),
    )
    return (
        pages.select("text")
        .withColumn("etype", etype)
        .where(F.col("etype").isNotNull())
        .select(
            "etype",
            F.when(is_n, F.regexp_extract(t, rx_n, 1))
            .when(is_w, F.regexp_extract(t, rx_w, 1))
            .otherwise(F.regexp_extract(t, rx_r, 1))
            .try_cast("long").alias("id"),
            F.when(is_n, F.regexp_extract(t, rx_n, 2).try_cast("double")).alias("lon"),
            F.when(is_n, F.regexp_extract(t, rx_n, 3).try_cast("double")).alias("lat"),
            F.when(
                is_w, F.split(F.regexp_extract(t, rx_w, 2), ",").try_cast("array<long>")
            ).alias("refs"),
            F.when(is_r, member).cast(_MEMBER_T).alias("members"),
            _tags_map(
                F.when(is_n, F.regexp_extract(t, rx_n, 4))
                .when(is_w, F.regexp_extract(t, rx_w, 3))
                .otherwise(F.regexp_extract(t, rx_r, 3))
            ).alias("tags"),
        )
    )


def element_views(elements: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Typed (nodes, ways, relations) views of a unified element table.
    On an etype-partitioned parquet table the filters become partition
    pruning; the selects restore the parse_nodes/ways/relations
    schemas exactly."""
    nodes = elements.where(F.col("etype") == "node").select("id", "lon", "lat", "tags")
    ways = elements.where(F.col("etype") == "way").select("id", "refs", "tags")
    rels = elements.where(F.col("etype") == "relation").select("id", "members", "tags")
    return nodes, ways, rels
