"""Element assembly — the join core (reference J1-J8, A1-A2).

The reference hand-rolls hash joins with semi-join prefilters and
blob-interval partition pruning (/root/reference/src/denorm.rs:366-436).
Here each becomes a declarative DataFrame join; Catalyst + AQE supply
the hash-join strategy, runtime bloom-filter semi-join reduction, and
(on a clustered/partitioned table) dynamic file pruning — the automatic
equivalents of J3/J8's hand-built interval maps.

**Order preservation is a correctness invariant** (J4): the golden
positions arrays are ref-ordered (/root/reference/tests/ingest.rs:51,
66-70). Shuffles do not preserve row order, so every explode carries an
explicit position index and the re-aggregation sorts on it
(`array_sort` over struct(pos, …)) — never trust row order.

Coordinates are narrowed to float32 *before* the bbox fold, matching
the reference's f64→f32 downcast at encode time (src/lib.rs:225,350 —
E7) so min/max bboxes agree bit-for-bit.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, functions as F

# Expression builders below are memoized (@lru_cache): Column objects
# are immutable unresolved expression trees, safely reusable across
# plans, and building one of these lists costs ~60 ms of py4j
# round-trips — the dominant driver-side cost of re-planning the
# ingest pipeline (round-7 profile: way/rel branch planning was
# 0.29/0.37 s per build, mostly expression chatter). Each builder is
# used by exactly ONE branch, so its alias exprIds appear once per
# union plan.


def _pts_agg():
    """Ordered coordinate re-aggregation (J4): sort by explode position."""
    return F.array_sort(F.collect_list(F.struct("ref_pos", "x", "y")))


def assemble_ways(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """ways(id, refs, tags) ⨝ nodes(id, lon, lat) → one row per way with
    ref-ordered float32 coordinate arrays + bbox.

    Reference path: J1 build (denorm.rs:366-378) → J2 probe
    (denorm.rs:380-393) → J4 coord attach (lib.rs:222-227) → A1 bbox
    fold (lib.rs:228-235). Unresolved refs drop out (inner join), like
    the reference's filter_map lookups.
    """
    way_nodes = ways.select(
        F.col("id").alias("way_id"),
        F.posexplode("refs").alias("ref_pos", "node_id"),
    )
    nodes_bare = nodes.select(  # S5 projected scan — Catalyst prunes cols
        F.col("id").alias("node_id"),
        F.col("lon").cast("float").alias("x"),
        F.col("lat").cast("float").alias("y"),
    )
    joined = way_nodes.join(nodes_bare, "node_id", "inner")
    coords = joined.groupBy("way_id").agg(*_way_coord_aggs())
    return (
        ways.withColumnRenamed("id", "way_id")
        .join(coords, "way_id", "inner")
        .select(*_way_out_cols())
    )


@lru_cache(maxsize=None)
def _way_coord_aggs():
    return (
        _pts_agg().alias("pts"),
        # distinct count WITHOUT countDistinct: a distinct
        # aggregate alongside collect_list plans as an Expand
        # (row-doubling) + two aggregate phases; counting distinct
        # ids from the already-collected list is one normal
        # hash-agg pass (round-5 stage profile)
        F.size(F.array_distinct(F.collect_list("node_id"))).alias("n_nodes"),
        # ring closure from the RESOLVED sequence: if the closing
        # node id failed to resolve (dropped by the inner join), the
        # way is no longer closed and the encode strip must not
        # remove a genuine last vertex (the reference skips
        # unresolved refs without dropping real points)
        (
            (F.count("*") >= 2)
            & (
                F.min(F.struct("ref_pos", "node_id")).getField("node_id")
                == F.max(F.struct("ref_pos", "node_id")).getField("node_id")
            )
        ).alias("resolved_closed"),
        F.min("x").alias("minx"),
        F.min("y").alias("miny"),
        F.max("x").alias("maxx"),
        F.max("y").alias("maxy"),
    )


@lru_cache(maxsize=None)
def _way_out_cols():
    return (
        "way_id",
        "refs",
        "tags",
        F.transform("pts", lambda s: s.x).alias("xs"),
        F.transform("pts", lambda s: s.y).alias("ys"),
        "n_nodes",
        "resolved_closed",
        "minx", "miny", "maxx", "maxy",
    )


def relation_members(relations: DataFrame) -> DataFrame:
    """F7 member filter (reference src/lib.rs:327-339): keep way members
    with role ∈ {inner, outer}, preserving member order."""
    return (
        relations.select(
            F.col("id").alias("rel_id"),
            F.posexplode("members").alias("member_pos", "m"),
        )
        .where((F.col("m.mtype") == "way") & F.col("m.role").isin("inner", "outer"))
        .select("rel_id", "member_pos", F.col("m.ref").alias("way_id"), F.col("m.role").alias("role"))
    )


def assemble_relations(relations: DataFrame, ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Two-hop join (J5/J6/J7): relations → member ways → way nodes,
    re-aggregated into per-relation ring arrays.

    Output per relation: flattened ring coordinate arrays (member
    order), ring lengths + roles (for hole indices at encode), node
    count (F4 gate), bbox over all member nodes (A2).
    """
    members = relation_members(relations)

    ways_bare = ways.select(F.col("id").alias("way_id"), "refs")  # S6
    member_ways = members.join(ways_bare, "way_id", "inner")

    member_nodes = member_ways.select(
        "rel_id", "member_pos", "role", "way_id",
        F.posexplode("refs").alias("ref_pos", "node_id"),
    )
    nodes_bare = nodes.select(
        F.col("id").alias("node_id"),
        F.col("lon").cast("float").alias("x"),
        F.col("lat").cast("float").alias("y"),
    )
    joined = member_nodes.join(nodes_bare, "node_id", "inner")

    rings = joined.groupBy("rel_id", "member_pos", "role").agg(
        *_rel_ring_aggs())

    assembled = (
        rings.groupBy("rel_id")
        .agg(*_rel_asm_aggs())
        .select(*_rel_out_cols())
    )

    return (
        relations.select(F.col("id").alias("rel_id"), "tags", F.size("members").alias("n_members"))
        .join(assembled, "rel_id", "inner")
    )


@lru_cache(maxsize=None)
def _rel_ring_aggs():
    return (
        _pts_agg().alias("pts"),
        # ring closure from the RESOLVED member sequence (see
        # assemble_ways): an unresolved closing ref must not cause
        # the encode strip to drop a real vertex
        (
            (F.count("*") >= 2)
            & (
                F.min(F.struct("ref_pos", "node_id")).getField("node_id")
                == F.max(F.struct("ref_pos", "node_id")).getField("node_id")
            )
        ).alias("ring_closed"),
        F.size(F.array_distinct(F.collect_list("node_id"))).alias("ring_nodes"),
        F.min("x").alias("minx"),
        F.min("y").alias("miny"),
        F.max("x").alias("maxx"),
        F.max("y").alias("maxy"),
    )


@lru_cache(maxsize=None)
def _rel_asm_aggs():
    return (
        F.array_sort(
            F.collect_list(F.struct("member_pos", "role", "ring_closed", "pts"))
        ).alias("rings"),
        F.sum("ring_nodes").alias("n_nodes"),
        F.min("minx").alias("minx"),
        F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"),
        F.max("maxy").alias("maxy"),
    )


@lru_cache(maxsize=None)
def _rel_out_cols():
    return (
        "rel_id",
        F.flatten(
            F.transform("rings", lambda r: F.transform(r.pts, lambda s: s.x))
        ).alias("xs"),
        F.flatten(
            F.transform("rings", lambda r: F.transform(r.pts, lambda s: s.y))
        ).alias("ys"),
        F.transform("rings", lambda r: F.size(r.pts)).alias("ring_lens"),
        F.transform("rings", lambda r: r.role).alias("ring_roles"),
        F.transform("rings", lambda r: r.ring_closed).alias("ring_closed"),
        "n_nodes",
        "minx", "miny", "maxx", "maxy",
    )
