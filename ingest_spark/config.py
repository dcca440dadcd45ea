"""Engine configuration.

The analog of the reference's ``IngestOptions`` + eyros ``Setup``
tuning surface (/root/reference/src/lib.rs:36-55, src/bin.rs:240-285),
re-expressed for the Spark engine. Batch/channel sizes disappear
(partitions bound memory); what remains is spatial/layout tuning.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # spatial indexing (north_rule: H3 res-8 + S2 level-12)
    hex_res: int = 8
    s2_level: int = 12

    # tiling / skew bounds — analog of the reference's quadtree bucket
    # bound `divide(50_000, …)` src/lib.rs:526 and depth guard
    # src/divide.rs:10
    bucket_max_records: int = 50_000
    divide_depth_limit: int = 30
    # max rows a single Python worker may materialize as one pandas
    # group during the quadtree optimize pass; grid cells over this are
    # pre-split DISTRIBUTEDLY (grid-assign rounds = the first quadtree
    # levels) before any per-group divide runs, so worker memory is
    # bounded regardless of data volume or grid skew
    divide_pandas_budget: int = 2_000_000

    # hot-cell salting: cells whose row count exceeds
    # `bucket_max_records` get `ceil(count / bucket_max_records)` salts
    salt_hash_cols: tuple[str, ...] = ("id",)

    # tile pyramid
    tile_zoom: int = 12
    raster_tile_px: int = 256

    # kNN
    knn_default_k: int = 5
    knn_max_ring: int = 4

    # dedup
    minhash_perms: int = 64
    minhash_bands: int = 16
    shingle_size: int = 5
    simhash_bits: int = 64

    # write layout — the eyros branch_factor/max_records analog: target
    # rows per output file so parquet row-group stats prune well
    target_file_rows: int = 500_000

    extra: dict = field(default_factory=dict)


DEFAULT = EngineConfig()
