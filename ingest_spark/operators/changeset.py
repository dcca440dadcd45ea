"""Incremental updates (changesets) — the capability the reference
declares but never implemented (`unimplemented!` at
/root/reference/src/bin.rs:229-231; dormant golden suite at
tests/ingest.rs:90-400).

Semantics follow that dormant suite: a changeset is a set of element
creates / modifies / deletes; applying it must update exactly the
affected features (e.g. moving node 2000 and retagging it
amenity.bus_station → highway.bus_stop yields one updated point
feature, tests/ingest.rs:141-146), leaving everything else untouched.

Spark-first shape — an Iceberg ``MERGE INTO`` keyed on feature id:

1. merge element deltas into the element tables (anti-join + union);
2. compute the *affected closure*: changed elements, ways referencing
   changed nodes, relations referencing changed ways/nodes;
3. recompute features for the affected subset only (the full element
   tables feed the joins, but the build is semi-join-pruned to the
   closure — at 10^12 scale this touches a sliver of the data);
4. merge: old features ∖ affected ∪ recomputed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F




@dataclass
class Changeset:
    """Element deltas. Modify = delete + create (same id)."""
    nodes_upsert: DataFrame | None = None       # nodes schema
    ways_upsert: DataFrame | None = None        # ways schema
    relations_upsert: DataFrame | None = None   # relations schema
    node_deletes: list[int] = field(default_factory=list)
    way_deletes: list[int] = field(default_factory=list)
    relation_deletes: list[int] = field(default_factory=list)


def _merge_elements(
    spark: SparkSession, base: DataFrame, upsert: DataFrame | None, deletes: list[int]
) -> DataFrame:
    out = base
    gone = set(deletes)
    if upsert is not None:
        gone |= {r.id for r in upsert.select("id").collect()}
    if gone:
        gone_df = spark.createDataFrame([(int(i),) for i in sorted(gone)], "id long")
        out = out.join(F.broadcast(gone_df), "id", "left_anti")
    if upsert is not None:
        out = out.unionByName(upsert)
    return out


def apply_changeset(
    spark: SparkSession,
    features: DataFrame,
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    cs: Changeset,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Returns (features', nodes', ways', relations')."""
    nodes2 = _merge_elements(spark, nodes, cs.nodes_upsert, cs.node_deletes)
    ways2 = _merge_elements(spark, ways, cs.ways_upsert, cs.way_deletes)
    rels2 = _merge_elements(spark, relations, cs.relations_upsert, cs.relation_deletes)

    # ---- affected closure
    changed_nodes = set(cs.node_deletes)
    if cs.nodes_upsert is not None:
        changed_nodes |= {r.id for r in cs.nodes_upsert.select("id").collect()}
    changed_ways = set(cs.way_deletes)
    if cs.ways_upsert is not None:
        changed_ways |= {r.id for r in cs.ways_upsert.select("id").collect()}
    changed_rels = set(cs.relation_deletes)
    if cs.relations_upsert is not None:
        changed_rels |= {r.id for r in cs.relations_upsert.select("id").collect()}

    if changed_nodes:
        cn = spark.createDataFrame([(int(i),) for i in sorted(changed_nodes)], "node_id long")
        # ways (old ∪ new definitions) referencing a changed node
        both_ways = ways.unionByName(ways2)
        hit = (
            both_ways.select("id", F.explode("refs").alias("node_id"))
            .join(F.broadcast(cn), "node_id", "left_semi")
            .select("id").distinct().collect()
        )
        changed_ways |= {r.id for r in hit}

    if changed_ways or changed_nodes:
        cw = spark.createDataFrame(
            [(int(i),) for i in sorted(changed_ways)] or [(-1,)], "way_id long"
        )
        both_rels = relations.unionByName(rels2)
        mem = both_rels.select("id", F.explode("members").alias("m")).select(
            "id", F.col("m.ref").alias("way_id"), F.col("m.mtype").alias("mtype")
        ).where(F.col("mtype") == "way")
        hit = mem.join(F.broadcast(cw), "way_id", "left_semi").select("id").distinct().collect()
        changed_rels |= {r.id for r in hit}

    # ---- recompute the affected slice only (semi-join pruning)
    def _only(df: DataFrame, ids: set[int]) -> DataFrame:
        if not ids:
            return df.limit(0)
        ids_df = spark.createDataFrame([(int(i),) for i in sorted(ids)], "id long")
        return df.join(F.broadcast(ids_df), "id", "left_semi")

    from .features import node_features, relation_features, way_features

    parts = []
    if changed_nodes:
        parts.append(node_features(_only(nodes2, changed_nodes), spark))
    if changed_ways:
        # pruned ways join against the FULL node table (unchanged member
        # nodes must resolve) — the join prunes the node scan for us
        parts.append(way_features(_only(ways2, changed_ways), nodes2, spark))
    if changed_rels:
        parts.append(relation_features(_only(rels2, changed_rels), ways2, nodes2, spark))

    if parts:
        recomputed = parts[0]
        for p in parts[1:]:
            recomputed = recomputed.unionByName(p)
    else:
        recomputed = features.limit(0)

    # MERGE: drop every affected feature id (deleted ones stay dropped),
    # append the recomputed slice
    affected_fids = (
        {i * 3 + 0 for i in changed_nodes}
        | {i * 3 + 1 for i in changed_ways}
        | {i * 3 + 2 for i in changed_rels}
    )
    merged = features
    if affected_fids:
        fid_df = spark.createDataFrame(
            [(int(i),) for i in sorted(affected_fids)], "id long"
        )
        merged = features.join(F.broadcast(fid_df), "id", "left_anti")
    merged = merged.unionByName(recomputed.select(*features.columns))
    return merged, nodes2, ways2, rels2
