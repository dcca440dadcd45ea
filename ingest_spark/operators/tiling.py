"""Spatial partitioning / tiling — the reference "optimize" pass
re-expressed (O1-O4, /root/reference/src/lib.rs:408-602, src/divide.rs).

Three layers:

1. ``divide`` — a semantically exact reimplementation of the
   reference's recursive 2×2 quadtree split (src/divide.rs:9-72):
   float32 bbox arithmetic, max-overlap assignment with strict ``>``
   and first-index tiebreak (src/divide.rs:43-52), span guard + depth
   limit 30 termination (src/divide.rs:56-63,10). Runs on numpy
   arrays; used per-bucket inside applyInPandas.

2. ``quadtree_partition`` — the distributed optimize job: global
   bounds (A3) → X×Y grid max-overlap assignment (deterministic
   single-assignment; replaces the reference's multi-assign + racy
   skip-map dedup J9, src/lib.rs:469-515, with a plan that never
   creates duplicates) → per-grid-cell ``divide`` under
   ``applyInPandas`` → bounded buckets (≤ n records each, the eyros
   subtree analog, src/lib.rs:526).

3. ``salt_hot_cells`` + ``write_partitioned`` — the 100 TB path:
   per-cell counts, explicit salting of cells over the bucket bound
   (north_rule), range-repartition by (cell, salt) and a sorted write
   so parquet row-group min/max stats prune bbox queries (the eyros
   tree → file-stats mapping, SURVEY §1.3).

Plus the web-mercator tile pyramid (raster ↔ vector tiles).
"""

from __future__ import annotations

import io
import math
from collections import deque

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StructField, StructType,
)

from ..config import DEFAULT, EngineConfig

# ------------------------------------------------------------ divide

def overlap_area(
    bx0: np.float32, by0: np.float32, bx1: np.float32, by1: np.float32,
    minx, miny, maxx, maxy, is_scalar,
) -> np.ndarray:
    """Vectorized float32 overlap area (reference src/divide.rs:74-92):
    scalar → inclusive containment = 1.0; interval → clipped rectangle
    area (may be negative-free via early zero); mixed kinds → 0."""
    minx = minx.astype(np.float32)
    miny = miny.astype(np.float32)
    maxx = maxx.astype(np.float32)
    maxy = maxy.astype(np.float32)

    scalar_in = (
        (bx0 <= minx) & (minx <= bx1) & (by0 <= miny) & (miny <= by1)
    )
    zero_x = (bx0 > maxx) | (bx1 < minx)
    zero_y = (by0 > maxy) | (by1 < miny)
    x = np.minimum(maxx, bx1) - np.maximum(minx, bx0)
    y = np.minimum(maxy, by1) - np.maximum(miny, by0)
    interval_area = np.where(zero_x | zero_y, np.float32(0.0), (x * y).astype(np.float32))
    return np.where(is_scalar, scalar_in.astype(np.float32), interval_area)


def divide(
    n: int,
    bbox: tuple[float, float, float, float],
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray,
    is_scalar: np.ndarray,
    depth_limit: int = 30,
):
    """Exact port of the reference ``divide`` (src/divide.rs:9-72).

    Returns list of (bbox(f32 4-tuple), row-index ndarray), in the same
    emission order as the reference (BFS, children iy-major/ix-minor).
    """
    N = len(minx)
    all_idx = np.arange(N)
    if N <= n:
        return [(tuple(np.float32(v) for v in bbox), all_idx)]

    minx = np.asarray(minx, dtype=np.float32)
    miny = np.asarray(miny, dtype=np.float32)
    maxx = np.asarray(maxx, dtype=np.float32)
    maxy = np.asarray(maxy, dtype=np.float32)
    is_scalar = np.asarray(is_scalar, dtype=bool)

    nx, ny = 2, 2
    res = []
    queue = deque()
    queue.append((0, tuple(np.float32(v) for v in bbox), all_idx))
    while queue:
        depth, (qx0, qy0, qx1, qy1), idx = queue.popleft()
        if len(idx) == 0:
            continue
        span_x = np.float32(qx1 - qx0)
        span_y = np.float32(qy1 - qy0)
        boxes = []
        for iy in range(ny):
            for ix in range(nx):
                bx0 = np.float32(np.float32(ix / nx) * span_x + qx0)
                by0 = np.float32(np.float32(iy / ny) * span_y + qy0)
                bx1 = np.float32(np.float32((ix + 1.0) / nx) * span_x + qx0)
                by1 = np.float32(np.float32((iy + 1.0) / ny) * span_y + qy0)
                boxes.append((bx0, by0, bx1, by1))

        # strict `>` best with first-index start (0.0, 0)
        best_area = np.zeros(len(idx), dtype=np.float32)
        best_j = np.zeros(len(idx), dtype=np.int64)
        for j, (bx0, by0, bx1, by1) in enumerate(boxes):
            area = overlap_area(
                bx0, by0, bx1, by1,
                minx[idx], miny[idx], maxx[idx], maxy[idx], is_scalar[idx],
            )
            better = area > best_area
            best_j[better] = j
            best_area[better] = area[better]

        q_len = len(idx)
        for j, bb in enumerate(boxes):
            cidx = idx[best_j == j]
            cn = len(cidx)
            if cn == 0:
                continue
            if cn <= n:
                res.append((bb, cidx))
            elif cn == q_len:
                span_ge = (
                    (~is_scalar[cidx])
                    & (
                        ((maxx[cidx] - minx[cidx]) > span_x)
                        | ((maxy[cidx] - miny[cidx]) > span_y)
                    )
                )
                if span_ge.all() or depth + 1 >= depth_limit:
                    res.append((bb, cidx))
                else:
                    queue.append((depth + 1, bb, cidx))
            elif depth + 1 >= depth_limit:
                res.append((bb, cidx))
            else:
                queue.append((depth + 1, bb, cidx))
    return res


# -------------------------------------------- distributed quadtree job

def global_bounds(features: DataFrame) -> tuple[float, float, float, float]:
    """A3 (reference src/lib.rs:413-425)."""
    r = features.agg(
        F.min("minx").alias("x0"), F.min("miny").alias("y0"),
        F.max("maxx").alias("x1"), F.max("maxy").alias("y1"),
    ).first()
    return (r.x0, r.y0, r.x1, r.y1)


def _grid_boxes(bounds, gx: int, gy: int):
    """S10 grid generator (src/lib.rs:427-444), f32 arithmetic."""
    x0, y0, x1, y1 = (np.float32(v) for v in bounds)
    span_x = np.float32(x1 - x0)
    span_y = np.float32(y1 - y0)
    boxes = []
    for iy in range(gy):
        for ix in range(gx):
            boxes.append((
                np.float32(np.float32(ix / gx) * span_x + x0),
                np.float32(np.float32(iy / gy) * span_y + y0),
                np.float32(np.float32((ix + 1.0) / gx) * span_x + x0),
                np.float32(np.float32((iy + 1.0) / gy) * span_y + y0),
            ))
    return boxes


def assign_grid_cell(
    features: DataFrame, bounds, gx: int, gy: int
) -> DataFrame:
    """O3 max-overlap single-assignment to the X×Y grid (first-index
    tiebreak — np.argmax returns the first maximum, matching the
    strict-> loop of src/divide.rs:43-52)."""
    boxes = _grid_boxes(bounds, gx, gy)

    @F.pandas_udf(IntegerType())
    def _assign(minx, miny, maxx, maxy, kind):
        mnx = minx.to_numpy()
        mny = miny.to_numpy()
        mxx = maxx.to_numpy()
        mxy = maxy.to_numpy()
        scal = kind.to_numpy() == 0
        areas = np.stack(
            [
                overlap_area(bx0, by0, bx1, by1, mnx, mny, mxx, mxy, scal)
                for (bx0, by0, bx1, by1) in boxes
            ],
            axis=1,
        )
        return pd.Series(np.argmax(areas, axis=1).astype(np.int32))

    return features.withColumn(
        "grid_cell", _assign("minx", "miny", "maxx", "maxy", "kind")
    )


def quadtree_partition(
    features: DataFrame,
    cfg: EngineConfig = DEFAULT,
    gx: int = 4,
    gy: int = 4,
    bucket_max: int | None = None,
) -> DataFrame:
    """The optimize pass: grid assign → per-cell quadtree divide →
    (grid_cell, bucket, bucket bbox) per feature. Bucket numbering is
    the reference's emission order within each grid cell."""
    n = bucket_max or cfg.bucket_max_records
    bounds = global_bounds(features)
    boxes = _grid_boxes(bounds, gx, gy)
    with_cell = assign_grid_cell(features, bounds, gx, gy)

    out_schema = StructType(
        with_cell.schema.fields
        + [
            StructField("bucket", IntegerType(), False),
            StructField("bminx", DoubleType(), False),
            StructField("bminy", DoubleType(), False),
            StructField("bmaxx", DoubleType(), False),
            StructField("bmaxy", DoubleType(), False),
        ]
    )
    depth_limit = cfg.divide_depth_limit

    def _divide_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(key[0])
        bb = boxes[cell]
        buckets = divide(
            n,
            (bb[0], bb[1], bb[2], bb[3]),
            pdf["minx"].to_numpy(), pdf["miny"].to_numpy(),
            pdf["maxx"].to_numpy(), pdf["maxy"].to_numpy(),
            pdf["kind"].to_numpy() == 0,
            depth_limit=depth_limit,
        )
        pdf = pdf.reset_index(drop=True)
        bucket_col = np.zeros(len(pdf), dtype=np.int32)
        bbox_cols = np.zeros((len(pdf), 4), dtype=np.float64)
        for bi, (bbox, idx) in enumerate(buckets):
            bucket_col[idx] = bi
            bbox_cols[idx, 0] = bbox[0]
            bbox_cols[idx, 1] = bbox[1]
            bbox_cols[idx, 2] = bbox[2]
            bbox_cols[idx, 3] = bbox[3]
        pdf["bucket"] = bucket_col
        pdf["bminx"] = bbox_cols[:, 0]
        pdf["bminy"] = bbox_cols[:, 1]
        pdf["bmaxx"] = bbox_cols[:, 2]
        pdf["bmaxy"] = bbox_cols[:, 3]
        return pdf

    return with_cell.groupBy("grid_cell").applyInPandas(_divide_cell, out_schema)


# ------------------------------------------------------------- salting

def cell_counts(df: DataFrame, cell_col: str = "hex_cell") -> DataFrame:
    """A5 analog: per-cell row counts (map-side partial agg)."""
    return df.groupBy(cell_col).agg(F.count("*").alias("n"))


def salt_hot_cells(
    df: DataFrame,
    cell_col: str = "hex_cell",
    cfg: EngineConfig = DEFAULT,
    bucket_max: int | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Explicit skew defusal (north_rule): cells whose count exceeds the
    bucket bound get ``ceil(count / bound)`` salts; rows are salted by
    deterministic hash of their id. The (cell, salt) pair is then a
    bounded shuffle/write key — the declarative analog of the
    reference's quadtree overflow splitting (src/divide.rs:12,54)."""
    n = bucket_max or cfg.bucket_max_records
    counts = cell_counts(df, cell_col)
    hot = counts.where(F.col("n") > n).select(
        cell_col, F.ceil(F.col("n") / n).cast("int").alias("n_salts")
    )
    out = df.join(F.broadcast(hot), cell_col, "left")
    return out.withColumn(
        "salt",
        F.when(
            F.col("n_salts").isNotNull(),
            F.pmod(F.xxhash64(F.col(id_col)), F.col("n_salts")).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("n_salts")


def write_partitioned(
    df: DataFrame,
    path: str,
    cell_col: str = "hex_cell",
    cfg: EngineConfig = DEFAULT,
    mode: str = "overwrite",
) -> None:
    """O1 sorted spatial write: range-repartition by (cell, salt) and
    sort within partitions by (cell, id) so parquet row-group stats
    prune bbox/cell queries (eyros tree layout analog)."""
    salted = df if "salt" in df.columns else salt_hot_cells(df, cell_col, cfg)
    (
        salted.repartitionByRange(F.col(cell_col), F.col("salt"))
        .sortWithinPartitions(cell_col, "id")
        .write.mode(mode)
        .parquet(path)
    )


# ------------------------------------------------------- tile pyramid

def with_tile_xyz(df: DataFrame, z: int, lon_col="minx", lat_col="miny") -> DataFrame:
    """Web-mercator tile coordinates at zoom z — pure JVM expressions."""
    n = float(2 ** z)
    lon = F.col(lon_col).cast("double")
    lat = F.greatest(F.lit(-85.05112878), F.least(F.lit(85.05112878), F.col(lat_col).cast("double")))
    phi = F.radians(lat)
    tx = F.floor((lon + 180.0) / 360.0 * n)
    ty = F.floor((1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi)) / math.pi) / 2.0 * n)
    clamp = lambda c: F.greatest(F.lit(0), F.least(F.lit(int(n) - 1), c))  # noqa: E731
    return (
        df.withColumn("tile_z", F.lit(z))
        .withColumn("tile_x", clamp(tx).cast("int"))
        .withColumn("tile_y", clamp(ty).cast("int"))
    )


VECTOR_TILE_SCHEMA = StructType([
    StructField("tile_z", IntegerType(), False),
    StructField("tile_x", IntegerType(), False),
    StructField("tile_y", IntegerType(), False),
    StructField("n_features", LongType(), False),
    StructField("payload", BinaryType(), False),
])


def vector_tiles(features: DataFrame, z: int) -> DataFrame:
    """Materialize vector tiles: per web-mercator tile, features sorted
    by id, payloads concatenated with a little header (deterministic)."""
    tiled = with_tile_xyz(features, z)

    def _pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        buf = io.BytesIO()
        for payload in pdf["encoded"]:
            b = bytes(payload)
            buf.write(len(b).to_bytes(4, "little"))
            buf.write(b)
        return pd.DataFrame(
            {
                "tile_z": [int(key[0])], "tile_x": [int(key[1])], "tile_y": [int(key[2])],
                "n_features": [len(pdf)], "payload": [buf.getvalue()],
            }
        )

    return tiled.groupBy("tile_z", "tile_x", "tile_y").applyInPandas(
        _pack, VECTOR_TILE_SCHEMA
    )


RASTER_TILE_SCHEMA = StructType([
    StructField("tile_z", IntegerType(), False),
    StructField("tile_x", IntegerType(), False),
    StructField("tile_y", IntegerType(), False),
    StructField("px", IntegerType(), False),
    StructField("n_points", LongType(), False),
    StructField("grid", BinaryType(), False),  # px*px little-endian uint32 counts
])


def raster_tiles(features: DataFrame, z: int, px: int = 256) -> DataFrame:
    """Rasterize features into per-tile count grids (px×px uint32).
    Image encoding (PNG/JPEG) is intentionally out of scope here — no
    imaging libs in this environment; the grid binary is the raster.
    Uses feature centroids; numpy histogram2d per tile."""
    tiled = with_tile_xyz(
        features.withColumn("_cx", (F.col("minx") + F.col("maxx")) / 2)
        .withColumn("_cy", (F.col("miny") + F.col("maxy")) / 2),
        z, lon_col="_cx", lat_col="_cy",
    )

    n = float(2 ** z)

    def _rasterize(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tz, tx, ty = int(key[0]), int(key[1]), int(key[2])
        # tile bounds in lon / mercator-y
        lon0 = tx / n * 360.0 - 180.0
        lon1 = (tx + 1) / n * 360.0 - 180.0
        def merc_lat(yt):
            yy = math.pi * (1 - 2 * yt / n)
            return math.degrees(math.atan(math.sinh(yy)))
        lat1 = merc_lat(ty)      # top
        lat0 = merc_lat(ty + 1)  # bottom
        cx = pdf["_cx"].to_numpy()
        cy = pdf["_cy"].to_numpy()
        grid, _, _ = np.histogram2d(
            cy, cx, bins=px, range=[[lat0, lat1], [lon0, lon1]]
        )
        return pd.DataFrame(
            {
                "tile_z": [tz], "tile_x": [tx], "tile_y": [ty], "px": [px],
                "n_points": [len(pdf)],
                "grid": [grid.astype("<u4").tobytes()],
            }
        )

    return tiled.groupBy("tile_z", "tile_x", "tile_y").applyInPandas(
        _rasterize, RASTER_TILE_SCHEMA
    )


RASTER_POINTS_SCHEMA = StructType([
    StructField("tile_z", IntegerType(), False),
    StructField("tile_x", IntegerType(), False),
    StructField("tile_y", IntegerType(), False),
    StructField("lon", DoubleType(), False),
    StructField("lat", DoubleType(), False),
    StructField("count", LongType(), False),
])


def raster_to_vector(rasters: DataFrame) -> DataFrame:
    """The reverse direction: raster count grids → point features at
    non-empty pixel centers (raster↔vector round trip)."""
    def _vectorize(it):
        for pdf in it:
            rows = {"tile_z": [], "tile_x": [], "tile_y": [], "lon": [], "lat": [], "count": []}
            cols = (pdf[c].to_numpy() for c in ("tile_z", "tile_x", "tile_y", "px", "grid"))
            for tz, tx_v, ty_v, px_v, grid_b in zip(*cols):
                px = int(px_v)
                n = float(2 ** int(tz))
                grid = np.frombuffer(bytes(grid_b), dtype="<u4").reshape(px, px)
                ys, xs = np.nonzero(grid)
                if len(ys) == 0:
                    continue
                tx, ty = int(tx_v), int(ty_v)
                lon0 = tx / n * 360.0 - 180.0
                lon1 = (tx + 1) / n * 360.0 - 180.0

                def merc_lat(yt):
                    yy = math.pi * (1 - 2 * yt / n)
                    return math.degrees(math.atan(math.sinh(yy)))

                lat1 = merc_lat(ty)
                lat0 = merc_lat(ty + 1)
                lon = lon0 + (xs + 0.5) / px * (lon1 - lon0)
                lat = lat0 + (ys + 0.5) / px * (lat1 - lat0)
                rows["tile_z"].extend([int(tz)] * len(ys))
                rows["tile_x"].extend([tx] * len(ys))
                rows["tile_y"].extend([ty] * len(ys))
                rows["lon"].extend(lon.tolist())
                rows["lat"].extend(lat.tolist())
                rows["count"].extend(grid[ys, xs].astype(np.int64).tolist())
            yield pd.DataFrame(rows)

    return rasters.mapInPandas(_vectorize, RASTER_POINTS_SCHEMA)


def retile_incremental(
    old_tiles: DataFrame,
    old_features: DataFrame,
    new_features: DataFrame,
    changed_feature_ids: DataFrame,
    z: int,
) -> DataFrame:
    """Incremental vector-tile maintenance after a changeset: recompute
    ONLY the tiles whose content changed; every other tile row passes
    through untouched.

    Extends the changeset capability (operators/changeset.py — itself
    beyond the reference, which left updates `unimplemented!` at
    /root/reference/src/bin.rs:229-231) from the feature table to the
    materialized tile layer.

    Inputs: ``old_tiles`` = vector_tiles output for ``old_features``;
    ``old_features`` / ``new_features`` = the feature table before and
    after apply_changeset; ``changed_feature_ids`` = 1-column (id)
    frame of affected feature ids (created + modified + deleted).

    affected tiles = tiles of changed ids in the OLD table (covers
    moves + deletes, whose stale payloads must re-pack) ∪ tiles of
    changed ids in the NEW table (covers creates + move targets);
    result = old_tiles ∖ affected ∪ vector_tiles(new features in
    affected tiles).

    Scale shape: affected-tile discovery is two semi-joins; the
    anti-join passes the (overwhelmingly unaffected) tile majority
    through by key only; re-packing touches only affected tiles'
    features.
    """
    def _tiles_of(features: DataFrame) -> DataFrame:
        changed = features.join(changed_feature_ids, "id", "left_semi")
        return with_tile_xyz(changed, z).select("tile_z", "tile_x", "tile_y")

    affected = _tiles_of(old_features).unionByName(
        _tiles_of(new_features)
    ).distinct()

    kept = old_tiles.join(affected, ["tile_z", "tile_x", "tile_y"], "left_anti")
    affected_feats = with_tile_xyz(new_features, z).join(
        affected, ["tile_z", "tile_x", "tile_y"], "left_semi"
    ).drop("tile_z", "tile_x", "tile_y")
    repacked = vector_tiles(affected_feats, z)
    return kept.unionByName(repacked)
