"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``    — flagship geo pipeline on sf0.001.
``queries()``       — one entry per implemented operator family from
                      SURVEY.md §2 (+ north_rule spatial ops + webtext
                      training-data ops), each over the driver's
                      testdata tables.
``oracle_sql()``    — a DuckDB twin for EVERY query, including the
                      S2 Hilbert pipeline, MinHash+LSH, SimHash,
                      rolling-hash, integer-quantized hyperplane-LSH
                      ANN, and the georender fixture pipeline (header
                      fields re-derived from the embedded element
                      model; payload bytes stay pytest-golden) — all in
                      exact HUGEINT/epsilon-safe SQL.

Cross-engine determinism rules used throughout:
- derived geo points use pure int64 LCG arithmetic then /1e6 (bit-equal
  in Spark and DuckDB);
- float aggregates are rounded coarsely (sums→0dp, avgs→4dp) so fp
  non-associativity can't flip the value hash;
- every computed column is aliased identically in both engines;
- ties are always broken by a unique id column.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


# --------------------------------------------------------------- helpers

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the ingest_spark package to executor Python workers via
    addPyFile — the driver harness creates its own SparkSession whose
    workers don't have this repo on PYTHONPATH (the `spark-submit
    --py-files` analog, done lazily)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import hashlib
    import os
    import zipfile

    repo = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(repo, "ingest_spark")
    # content-addressed zip name: a stale cached zip from an earlier
    # code version must never ship (addPyFile paths can shadow fresh
    # modules on executors)
    h = hashlib.sha256()
    srcs = []
    for root, _dirs, files in os.walk(pkg):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                srcs.append(full)
    for full in sorted(srcs):
        h.update(full.encode())
        with open(full, "rb") as f:
            h.update(f.read())
    zip_path = f"/tmp/_ingest_spark_pyfiles_{h.hexdigest()[:16]}.zip"
    if not os.path.exists(zip_path):
        # atomic publish: a concurrent driver (bench + pytest in
        # parallel) must never addPyFile a half-written zip
        tmp = f"{zip_path}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full in sorted(srcs):
                zf.write(full, os.path.relpath(full, repo))
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)


_T_CACHE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table reader with a per-session DataFrame memo: each
    ``spark.read.parquet`` call pays ~0.1 s of driver work (file
    listing + footer schema inference), per query per run. The cached
    object is a LAZY plan — every action still computes from the
    parquet files (no result caching); only the listing/schema step is
    reused."""
    _ensure_shipped(spark)
    # applicationId (not id()) keys the memo: a torn-down context's
    # address can be reused by a new one, which would resurface stale
    # py4j refs
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _T_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _T_CACHE[key] = df
    return df


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic points derived from events (int64 LCG —
    bit-identical in any engine)."""
    e = _t(spark, sf_dir, "events")
    i = F.col("event_id")
    lon = ((i * 1103515245 + 12345) % 360000000) / 1000000.0 - 180.0
    lat = ((i * 2147483629 + 12345) % 180000000) / 1000000.0 - 90.0
    return e.select(i.alias("id"), lon.alias("lon"), lat.alias("lat"))


_POINTS_SQL = (
    "(SELECT event_id AS id, "
    "((event_id*1103515245+12345)%360000000)/1000000.0 - 180.0 AS lon, "
    "((event_id*2147483629+12345)%180000000)/1000000.0 - 90.0 AS lat "
    "FROM events)"
)

# admin polygons for the PIP join: a rectangle and a triangle
_POLYGONS = [
    {"polygon_id": 1, "name": "rect",
     "ring": [(-90.0, -45.0), (0.0, -45.0), (0.0, 45.0), (-90.0, 45.0)]},
    {"polygon_id": 2, "name": "triangle",
     "ring": [(10.0, -60.0), (130.0, -60.0), (70.0, 60.0)]},
]


def _polygon_edges_sql() -> str:
    """VALUES list of polygon edges (cur → prev vertex, mirroring the
    ray-cast kernel's indexing) for the exact same even-odd test in SQL."""
    rows = []
    for p in _POLYGONS:
        ring = p["ring"]
        n = len(ring)
        for i in range(n):
            cx, cy = ring[i]
            px_, py_ = ring[(i - 1) % n]
            rows.append(f"({p['polygon_id']}, {cx}, {cy}, {px_}, {py_})")
    return ", ".join(rows)


_CLASS_DIM = [("ECONOMY", "budget"), ("PROMO", "deal"), ("STANDARD", "core")]


_U64 = 1 << 64
_I64 = 1 << 63
_MERS61 = (1 << 61) - 1
_MIX64 = 0x9E3779B97F4A7C15


def _minhash_oracle_sql(threshold: float = 0.8) -> str:
    """Exact SQL twin of operators.dedup.minhash_lsh_pairs: char-5
    shingle rolling hashes (mod-2^64 Horner), 64-perm MinHash over the
    same embedded (a, b) parameters, 16-band fold, banded candidate
    join, signature-equality Jaccard estimate. All uint64 wraparound is
    HUGEINT arithmetic mod 2^64 — bit-exact vs the numpy kernels."""
    from ingest_spark.config import DEFAULT as _cfg
    from ingest_spark.functions import sketches as _sk

    k = _cfg.minhash_perms
    bands = _cfg.minhash_bands
    rows = k // bands
    assert rows == 4, "oracle fold is written for 4 rows/band"
    a, b = _sk._rand_params(k)
    params = ",".join(f"({i},{int(a[i])},{int(b[i])})" for i in range(k))
    B = 1000003  # shingle polynomial base (sketches.char_shingles)

    def _byte(off: str) -> str:
        return f"CASE WHEN i+{off} <= length(text) THEN ascii(text[i+{off}]) ELSE 0 END"

    def _mulmod64(x: str) -> str:
        # (x * MIX) mod 2^64 without overflowing INT128: split x into
        # 32-bit halves (x,MIX < 2^64 so the direct product can exceed
        # 127 bits)
        return (
            f"((({x}) & 4294967295) * {_MIX64}::HUGEINT % {_U64} + "
            f"((((({x}) >> 32) * {_MIX64}::HUGEINT) % 4294967296) << 32)) % {_U64}"
        )

    fold = f"(band + 1)::HUGEINT"
    for j in range(rows):
        fold = _mulmod64(f"xor({fold}, v{j}::HUGEINT)")
    return f"""
        WITH prm(pidx, a, b) AS (VALUES {params}),
        d AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
        sh0 AS (
          SELECT doc_id,
            (((((ascii(text[i])::HUGEINT * {B} + {_byte(1)}) % {_U64}
               ) * {B} + {_byte(2)}) % {_U64}
               * {B} + {_byte(3)}) % {_U64}
               * {B} + {_byte(4)}) % {_U64} AS h
          FROM d, UNNEST(range(1, GREATEST(length(text)-3, 2)::BIGINT)) AS u(i)
        ),
        sh AS (SELECT DISTINCT doc_id, h FROM sh0),
        sig AS (
          SELECT doc_id, pidx,
            MIN( ((a::HUGEINT * (h % {_MERS61})) % {_U64} + b) % {_U64} % {_MERS61} )::BIGINT AS s
          FROM sh, prm GROUP BY 1, 2
        ),
        bv AS (
          SELECT doc_id, pidx // {rows} AS band,
            MAX(CASE WHEN pidx % {rows} = 0 THEN s END) AS v0,
            MAX(CASE WHEN pidx % {rows} = 1 THEN s END) AS v1,
            MAX(CASE WHEN pidx % {rows} = 2 THEN s END) AS v2,
            MAX(CASE WHEN pidx % {rows} = 3 THEN s END) AS v3
          FROM sig GROUP BY 1, 2
        ),
        bh AS (SELECT doc_id, band, {fold} AS h FROM bv),
        cand AS (
          SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM bh x JOIN bh y ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id
        ),
        est AS (
          SELECT c.doc_a, c.doc_b,
                 SUM(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) AS eq
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.doc_a
          JOIN sig sb ON sb.doc_id = c.doc_b AND sb.pidx = sa.pidx
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, ROUND(eq / {float(k)}, 4) AS est_jaccard
        FROM est WHERE eq / {float(k)} >= {threshold}
    """


def _simhash_oracle_sql(max_hamming: int = 3) -> str:
    """Exact SQL twin of operators.dedup.simhash_pairs: FNV-1a-64 token
    hashes (whitespace tokens, duplicates kept), Charikar bit votes,
    pigeonhole block join, exact hamming re-check."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    blocks = " UNION ALL ".join(
        f"SELECT doc_id, sh_i, {i} AS block_idx, "
        f"(hu >> {i * width}) & {(1 << width) - 1} AS block_val FROM sim"
        for i in range(nblocks)
    )
    return f"""
        WITH d AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
        toks AS (
          SELECT doc_id, t AS tok
          FROM d, UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS u(t)
        ),
        th AS (
          SELECT doc_id,
            list_reduce(
              list_prepend({0xCBF29CE484222325}::HUGEINT,
                list_transform(range(1, length(tok)+1), i -> ascii(tok[i])::HUGEINT)),
              (acc, c) -> (xor(acc, c) * {0x100000001B3}::HUGEINT) % {_U64}) AS h
          FROM toks
        ),
        votes AS (
          SELECT doc_id, bit,
                 SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th, UNNEST(range(0, 64)) AS u(bit)
          GROUP BY 1, 2
        ),
        simv AS (
          SELECT doc_id, SUM(CASE WHEN v > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS hu
          FROM votes GROUP BY 1
        ),
        sim AS (
          SELECT d.doc_id, COALESCE(s.hu, 0::HUGEINT) AS hu,
                 CASE WHEN COALESCE(s.hu, 0::HUGEINT) >= {_I64}::HUGEINT
                      THEN (COALESCE(s.hu, 0::HUGEINT) - {_U64}::HUGEINT)::BIGINT
                      ELSE COALESCE(s.hu, 0::HUGEINT)::BIGINT END AS sh_i
          FROM d LEFT JOIN simv s USING (doc_id)
        ),
        blk AS ({blocks}),
        cand AS (
          SELECT DISTINCT x.doc_id AS doc_a, x.sh_i AS sa, y.doc_id AS doc_b, y.sh_i AS sb
          FROM blk x JOIN blk y
            ON x.block_idx = y.block_idx AND x.block_val = y.block_val
           AND x.doc_id < y.doc_id
        )
        SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming,
               FALSE AS is_star
        FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


def _ann_lsh_oracle_sql(
    k: int = 5, n_planes: int = 4, n_probe: int = 5, n_tables: int = 8
) -> str:
    """Exact SQL twin of operators.similarity.ann_topk (multi-table
    multi-probe hyperplane LSH): the integer-quantized plane matrices
    (sketches.int_hyperplanes — exact int64 sign codes, no float-sum
    ordering hazard) are embedded as VALUES; codes, the hamming<=1 probe
    fan-out (same order + slice as the engine), the bucket candidate
    join and the exact cosine re-rank are all re-derived in SQL."""
    from ingest_spark.functions import sketches as _sk

    dim = 64  # driver testdata embeddings dimension
    rows = []
    for t in range(n_tables):
        planes = _sk.int_hyperplanes(n_planes, dim, seed=_sk._SEED + 7919 * t)
        for p in range(n_planes):
            for i in range(dim):
                rows.append(f"({t},{p},{i},{int(planes[p, i])})")
    plane_vals = ",".join(rows)
    probe_list = "[code" + "".join(f", xor(code, {1 << i})" for i in range(n_planes)) + "]"
    return f"""
        WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        pl(tbl, plane, idx, w) AS (VALUES {plane_vals}),
        vq AS (
          SELECT vec_id,
                 list_transform(v, x -> CAST(FLOOR(x * 16777216.0 + 0.5) AS BIGINT)) AS q
          FROM emb
        ),
        dots AS (
          SELECT vq.vec_id, pl.tbl, pl.plane, SUM(vq.q[pl.idx + 1] * pl.w) AS dot
          FROM vq, pl GROUP BY 1, 2, 3
        ),
        codes AS (
          SELECT vec_id, tbl,
                 SUM(CASE WHEN dot > 0 THEN (1::BIGINT << plane) ELSE 0 END) AS code
          FROM dots GROUP BY 1, 2
        ),
        probes AS (
          SELECT vec_id AS qid, tbl, p AS code
          FROM codes, UNNEST(list_slice({probe_list}, 1, {n_probe})) AS u(p)
          WHERE vec_id % 50 = 0
        ),
        cand AS (
          SELECT DISTINCT pr.qid, c.vec_id
          FROM probes pr JOIN codes c ON c.tbl = pr.tbl AND c.code = pr.code
        ),
        d AS (
          SELECT cand.qid, cand.vec_id,
                 LIST_INNER_PRODUCT(eq.v, ev.v)
                 / (SQRT(LIST_INNER_PRODUCT(eq.v, eq.v)) * SQRT(LIST_INNER_PRODUCT(ev.v, ev.v))) AS cos_raw
          FROM cand
          JOIN emb eq ON eq.vec_id = cand.qid
          JOIN emb ev ON ev.vec_id = cand.vec_id
        ),
        ranked AS (
          SELECT qid, vec_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vec_id ASC) AS rank
          FROM d
        )
        SELECT qid, vec_id, ROUND(cos_raw, 4) AS cosine, rank
        FROM ranked WHERE rank <= {k}
    """


# deterministic changeset applied by the georender_changeset query (the
# reference's declared-but-unimplemented capability, bin.rs:229-231;
# edit flavors follow its dormant suite, tests/ingest.rs:141-146):
# move+retag node 2000, move way-member node 1313 (bbox closure), delete
# node 1312, create node 3000
_CS_MOVED_2000 = (2000, "13.04", "37.04", "highway=bus_stop")
_CS_MOVED_1313 = (1313, "12.99", "36.99", "")
_CS_DELETED_NODE = 1312
_CS_CREATED_3000 = (3000, "5.5", "-10.5", "amenity=cafe")


def _post_changeset_model():
    from ingest_spark.sources import pages as _pg

    replaced = {_CS_DELETED_NODE, _CS_MOVED_2000[0], _CS_MOVED_1313[0]}
    nodes = [n for n in _pg.FIXTURE_NODES if n[0] not in replaced] + [
        _CS_MOVED_2000, _CS_MOVED_1313, _CS_CREATED_3000,
    ]
    return nodes, list(_pg.FIXTURE_WAYS), list(_pg.FIXTURE_RELATIONS)


def _georender_header_projection(feats: DataFrame) -> DataFrame:
    """Shared projection for the georender contract queries: decode the
    header fields back OUT of the binary payload (E5) and round the f32
    bbox — one definition so the two queries cannot drift."""
    from pyspark.sql.types import (
        IntegerType, LongType, StructField as _SF, StructType as _ST,
    )

    hdr_schema = _ST([
        _SF("decoded_id", LongType(), False),
        _SF("decoded_ftype", IntegerType(), False),
        _SF("geom_kind", IntegerType(), False),
    ])

    @F.pandas_udf(hdr_schema)
    def _hdr(enc: pd.Series) -> pd.DataFrame:
        from ingest_spark.functions import georender as gr2
        ids, fts, gks = [], [], []
        for b in enc:
            d = gr2.decode(bytes(b))
            ids.append(d["id"])
            fts.append(d["feature_type"])
            gks.append(d["geom_kind"])
        return pd.DataFrame(
            {"decoded_id": ids, "decoded_ftype": fts, "geom_kind": gks}
        )

    f2 = feats.withColumn("_h", _hdr("encoded"))
    return f2.select(
        "id", "osm_id", "kind", "feature_type",
        F.col("_h.decoded_id").alias("decoded_id"),
        F.col("_h.decoded_ftype").alias("decoded_ftype"),
        F.col("_h.geom_kind").alias("geom_kind"),
        F.round(F.col("minx").cast("double"), 5).alias("minx"),
        F.round(F.col("miny").cast("double"), 5).alias("miny"),
        F.round(F.col("maxx").cast("double"), 5).alias("maxx"),
        F.round(F.col("maxy").cast("double"), 5).alias("maxy"),
    )


def _georender_oracle_sql(model=None) -> str:
    """Exact SQL twin of the georender fixture pipeline's decodable
    fields: the fixture element model (the INPUT of sources/pages.py,
    not any output) is embedded as VALUES; classification (F1/F2 —
    first-priority-key + kv/key.other dictionary joins over the full
    378-type table), the way/relation area rules (F5/F6), the id
    mangling (osm_id*3 + kind), member/ref resolution joins and the
    f32 bbox aggregation (A1/A2, E7) are all re-derived in SQL. The
    Spark side additionally decodes (id, feature_type, geometry kind)
    back OUT of the binary payload (E5, value.rs:28-38 layout), so the
    oracle cross-checks the encode→decode round trip against an
    independent derivation; payload bytes stay pytest-golden."""
    from ingest_spark.functions import areas as _ar
    from ingest_spark.functions import tags as _tg
    from ingest_spark.sources import pages as _pg

    model = model or (
        list(_pg.FIXTURE_NODES), list(_pg.FIXTURE_WAYS), list(_pg.FIXTURE_RELATIONS)
    )
    model_nodes, model_ways, model_rels = model
    po = _tg.place_other_id()
    types = ",".join(f"('{n}',{i})" for n, i in sorted(_tg.type_ids().items()))
    prio = ",".join(f"('{kk}',{i})" for i, kk in enumerate(_tg.PRIORITY_KEYS))
    area_keys = ",".join(f"('{kk}')" for kk in sorted(_ar.AREA_KEYS))
    non_area = ",".join(
        f"('{kk}','{v}')"
        for kk, vs in sorted(_ar._NON_AREA_VALUES.items())
        for v in sorted(vs)
    )
    nodes = ",".join(
        f"({nid},{lon},{lat},'{t}')" for nid, lon, lat, t in model_nodes
    )
    ways = ",".join(f"({wid},'{refs}','{t}')" for wid, refs, t in model_ways)
    rels = ",".join(f"({rid},'{m}','{t}')" for rid, m, t in model_rels)
    return f"""
        WITH types(tname, ftype) AS (VALUES {types}),
        prio(pkey, prank) AS (VALUES {prio}),
        area_keys(akey) AS (VALUES {area_keys}),
        non_area(nkey, nval) AS (VALUES {non_area}),
        nodes(osm_id, lon, lat, tags) AS (VALUES {nodes}),
        ways(osm_id, refs, tags) AS (VALUES {ways}),
        rels(osm_id, members, tags) AS (VALUES {rels}),
        elems AS (
          SELECT 0 AS kind, osm_id, tags FROM nodes
          UNION ALL SELECT 1, osm_id, tags FROM ways
          UNION ALL SELECT 2, osm_id, tags FROM rels
        ),
        tagkv AS (
          SELECT kind, osm_id, split_part(e, '=', 1) AS k, split_part(e, '=', 2) AS val
          FROM elems, UNNEST(list_filter(string_split(tags, '|'), x -> x <> '')) AS u(e)
        ),
        firstk AS (
          SELECT t.kind, t.osm_id, MIN(p.prank) AS prank
          FROM tagkv t JOIN prio p ON p.pkey = t.k
          GROUP BY 1, 2
        ),
        classed AS (
          SELECT e.kind, e.osm_id, COALESCE(t1.ftype, t2.ftype, {po}) AS ftype
          FROM elems e
          LEFT JOIN firstk fk ON fk.kind = e.kind AND fk.osm_id = e.osm_id
          LEFT JOIN prio p ON p.prank = fk.prank
          LEFT JOIN tagkv kv
            ON kv.kind = e.kind AND kv.osm_id = e.osm_id AND kv.k = p.pkey
          LEFT JOIN types t1 ON t1.tname = p.pkey || '.' || kv.val
          LEFT JOIN types t2 ON t2.tname = p.pkey || '.other'
        ),
        wrefs AS (
          SELECT w.osm_id, CAST(string_split(w.refs, ',')[i] AS BIGINT) AS ref
          FROM ways w,
               UNNEST(range(1, len(string_split(w.refs, ',')) + 1)) AS o(i)
        ),
        wgeom AS (
          SELECT wr.osm_id, COUNT(n.osm_id) AS n_nodes,
                 MIN(CAST(n.lon AS REAL)) AS minx, MIN(CAST(n.lat AS REAL)) AS miny,
                 MAX(CAST(n.lon AS REAL)) AS maxx, MAX(CAST(n.lat AS REAL)) AS maxy
          FROM wrefs wr JOIN nodes n ON n.osm_id = wr.ref
          GROUP BY 1
        ),
        wisarea AS (
          SELECT w.osm_id,
            (len(string_split(w.refs, ',')) >= 4
             AND string_split(w.refs, ',')[1] =
                 string_split(w.refs, ',')[len(string_split(w.refs, ','))])
            AND CASE
              WHEN at.val = 'no' THEN FALSE
              WHEN at.val = 'yes' THEN TRUE
              ELSE EXISTS (
                SELECT 1 FROM tagkv kv JOIN area_keys a ON a.akey = kv.k
                WHERE kv.kind = 1 AND kv.osm_id = w.osm_id
                  AND NOT EXISTS (
                    SELECT 1 FROM non_area na
                    WHERE na.nkey = kv.k AND na.nval = kv.val)
              )
            END AS is_area
          FROM ways w
          LEFT JOIN tagkv at ON at.kind = 1 AND at.osm_id = w.osm_id AND at.k = 'area'
        ),
        rmem AS (
          SELECT r.osm_id, split_part(m, ':', 1) AS mtype,
                 CAST(split_part(m, ':', 3) AS BIGINT) AS ref
          FROM rels r,
               UNNEST(list_filter(string_split(r.members, ';'), x -> x <> '')) AS u(m)
        ),
        risarea AS (
          SELECT DISTINCT r.osm_id FROM rels r
          JOIN tagkv t ON t.kind = 2 AND t.osm_id = r.osm_id
           AND t.k = 'type' AND t.val IN ('multipolygon', 'boundary')
          WHERE len(list_filter(string_split(r.members, ';'), x -> x <> '')) > 0
        ),
        rgeom AS (
          SELECT rm.osm_id, COUNT(n.osm_id) AS n_nodes,
                 MIN(CAST(n.lon AS REAL)) AS minx, MIN(CAST(n.lat AS REAL)) AS miny,
                 MAX(CAST(n.lon AS REAL)) AS maxx, MAX(CAST(n.lat AS REAL)) AS maxy
          FROM rmem rm
          JOIN wrefs wr ON wr.osm_id = rm.ref AND rm.mtype = 'way'
          JOIN nodes n ON n.osm_id = wr.ref
          WHERE rm.osm_id IN (SELECT osm_id FROM risarea)
          GROUP BY 1
        )
        SELECT CAST(n.osm_id * 3 + 0 AS BIGINT) AS id, CAST(n.osm_id AS BIGINT) AS osm_id,
               0 AS kind, c.ftype AS feature_type,
               CAST(n.osm_id * 3 + 0 AS BIGINT) AS decoded_id, c.ftype AS decoded_ftype,
               1 AS geom_kind,
               ROUND(CAST(CAST(n.lon AS REAL) AS DOUBLE), 5) AS minx,
               ROUND(CAST(CAST(n.lat AS REAL) AS DOUBLE), 5) AS miny,
               ROUND(CAST(CAST(n.lon AS REAL) AS DOUBLE), 5) AS maxx,
               ROUND(CAST(CAST(n.lat AS REAL) AS DOUBLE), 5) AS maxy
        FROM nodes n JOIN classed c ON c.kind = 0 AND c.osm_id = n.osm_id
        WHERE c.ftype <> {po}
        UNION ALL
        SELECT CAST(w.osm_id * 3 + 1 AS BIGINT), CAST(w.osm_id AS BIGINT),
               1, c.ftype, CAST(w.osm_id * 3 + 1 AS BIGINT), c.ftype,
               CASE WHEN ia.is_area THEN 3 ELSE 2 END,
               ROUND(CAST(g.minx AS DOUBLE), 5), ROUND(CAST(g.miny AS DOUBLE), 5),
               ROUND(CAST(g.maxx AS DOUBLE), 5), ROUND(CAST(g.maxy AS DOUBLE), 5)
        FROM ways w
        JOIN classed c ON c.kind = 1 AND c.osm_id = w.osm_id
        JOIN wgeom g ON g.osm_id = w.osm_id
        JOIN wisarea ia ON ia.osm_id = w.osm_id
        WHERE c.ftype <> {po} AND g.n_nodes >= 2
        UNION ALL
        SELECT CAST(r.osm_id * 3 + 2 AS BIGINT), CAST(r.osm_id AS BIGINT),
               2, c.ftype, CAST(r.osm_id * 3 + 2 AS BIGINT), c.ftype, 3,
               ROUND(CAST(g.minx AS DOUBLE), 5), ROUND(CAST(g.miny AS DOUBLE), 5),
               ROUND(CAST(g.maxx AS DOUBLE), 5), ROUND(CAST(g.maxy AS DOUBLE), 5)
        FROM rels r
        JOIN classed c ON c.kind = 2 AND c.osm_id = r.osm_id
        JOIN rgeom g ON g.osm_id = r.osm_id
        WHERE c.ftype <> {po} AND g.n_nodes >= 2
    """


def _rint_sql(x: str) -> str:
    """Exact round-half-to-EVEN (numpy rint semantics; DuckDB ROUND is
    half-away-from-zero). x - FLOOR(x) is exact for |x| < 2^52."""
    return (
        f"(CASE WHEN {x} - FLOOR({x}) > 0.5 THEN FLOOR({x})+1 "
        f"WHEN {x} - FLOOR({x}) < 0.5 THEN FLOOR({x}) "
        f"ELSE FLOOR({x}) + CASE WHEN CAST(FLOOR({x}) AS BIGINT)%2=0 THEN 0 ELSE 1 END END)"
    )


def _hex_cell_sql(points_sql: str, res: int = 8) -> str:
    """Exact SQL twin of the PLANAR grid (functions.cells.hex_cell_id):
    axial projection, cube rounding (half-even, mirroring np.rint), id
    packing; repr()-exact float constants. Since round 4 the
    cells_hex_s2 oracle uses _h3_cell_sql (real H3) — this twin is
    retained for the SPARK_GRAFT_PLANAR_HEX fallback surface."""
    import math as _m
    from ingest_spark.functions import cells as _c

    size = repr(_c.hex_edge_deg(res))
    c1 = repr(_m.sqrt(3.0) / 3.0)
    return f"""
    SELECT id, ({res}::BIGINT << 56) | ((q + 134217728) << 28) | (r + 134217728) AS hex_cell
    FROM (
      SELECT id,
        CAST(CASE WHEN dq > dr AND dq > ds THEN -r - s ELSE q END AS BIGINT) AS q,
        CAST(CASE WHEN NOT (dq > dr AND dq > ds) AND dr > ds THEN -q - s ELSE r END AS BIGINT) AS r
      FROM (
        SELECT id, q, r, s,
               ABS(q - qf) AS dq, ABS(r - rf) AS dr, ABS(s - sf) AS ds
        FROM (
          SELECT id, qf, rf, sf,
                 {_rint_sql('qf')} AS q, {_rint_sql('rf')} AS r, {_rint_sql('sf')} AS s
          FROM (
            SELECT id, qf, rf, -qf - rf AS sf
            FROM (
              SELECT id, ({c1} * lon - lat/3.0) / {size} AS qf,
                     (2.0/3.0 * lat) / {size} AS rf
              FROM {points_sql} hexp
            )
          )
        )
      )
    )
    """




def _h3_cell_sql(points_sql: str, res: int = 8) -> str:
    """Full DuckDB twin of functions.h3core.latlng_to_cell (REAL H3):
    icosahedral face argmin, gnomonic projection, hex2d->IJK
    rounding, 8-level aperture-7 digit descent (pure integer math
    from the projection on), base-cell + ccwRot60 lookup over the
    derived 380-row table, pentagon deleted-K handling, 64-bit
    packing. Bit-exact vs the numpy kernel on sf0.01 AND sf0.1
    points (verified; the float stages agree to ~1e-11 and every
    discrete decision sits far from those boundaries)."""
    from ingest_spark.functions import h3core as h

    g = h.RES0_U_GNOMONIC
    sqrt7_pow = h.M_SQRT7 ** res

    fc_rows = ",\n     ".join(
        f"({f}, {h.FACE_CENTER_GEO[f,0]!r}, {h.FACE_CENTER_GEO[f,1]!r}, "
        f"{h._FACE_CENTER_XYZ[f,0]!r}, {h._FACE_CENTER_XYZ[f,1]!r}, "
        f"{h._FACE_CENTER_XYZ[f,2]!r}, {h.FACE_AXES_AZ_I[f]!r})"
        for f in range(20)
    )
    bc_rows = []
    for f in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    cid = int(h._BC_CELL[f, i, j, k])
                    if cid < 0:
                        continue
                    rot = int(h._BC_ROT[f, i, j, k])  # patched (pentagon fit)
                    pent = bool(h._IS_PENT[cid])
                    cw = pent and (f in h._CW_OFFSET[cid])
                    bc_rows.append(f"({f},{i},{j},{k},{cid},{rot},{str(pent).upper()},{str(cw).upper()})")
    bc_values = ",\n     ".join(bc_rows)

    azp = "atan2(cos(phi)*sin(lam-flng), cos(flat)*sin(phi) - sin(flat)*cos(phi)*cos(lam-flng))"
    theta_inner = "(az0 - (CASE WHEN azp < 0 THEN azp + 2*pi() ELSE azp END))"
    theta = f"(CASE WHEN {theta_inner} < 0 THEN {theta_inner} + 2*pi() ELSE {theta_inner} END)"
    if res % 2 == 1:
        theta = f"(CASE WHEN {theta} - {h.M_AP7_ROT_RADS!r} < 0 THEN {theta} - {h.M_AP7_ROT_RADS!r} + 2*pi() ELSE {theta} - {h.M_AP7_ROT_RADS!r} END)"

    parts = [f"""
pt AS (SELECT id, radians(lat) AS phi, radians(lon) AS lam FROM {points_sql}),
fc(face, flat, flng, fx, fy, fz, az0) AS (VALUES
     {fc_rows}),
dist AS (
  SELECT id, phi, lam, face, flat, flng, az0,
         (cos(phi)*cos(lam)-fx)^2 + (cos(phi)*sin(lam)-fy)^2 + (sin(phi)-fz)^2 AS sqd
  FROM pt CROSS JOIN fc),
bestf AS (SELECT * FROM dist QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY sqd, face) = 1),
prj AS (
  SELECT id, face, acos(1 - LEAST(GREATEST(sqd, 0.0), 4.0)/2.0) AS r, {azp} AS azp, az0
  FROM bestf),
hex2d AS (
  SELECT id, face,
    CASE WHEN r < 1e-16 THEN 0.0 ELSE tan(r) / {g!r} * {sqrt7_pow!r} * cos({theta}) END AS hx,
    CASE WHEN r < 1e-16 THEN 0.0 ELSE tan(r) / {g!r} * {sqrt7_pow!r} * sin({theta}) END AS hy
  FROM prj),
ij2 AS (
  SELECT id, face, hx, hy,
         CAST(floor(abs(hx) + (abs(hy)/0.8660254037844386)/2.0) AS BIGINT) AS m1,
         CAST(floor(abs(hy)/0.8660254037844386) AS BIGINT) AS m2,
         (abs(hx) + (abs(hy)/0.8660254037844386)/2.0) - floor(abs(hx) + (abs(hy)/0.8660254037844386)/2.0) AS r1,
         (abs(hy)/0.8660254037844386) - floor(abs(hy)/0.8660254037844386) AS r2
  FROM hex2d),
ij3 AS (
  SELECT id, face, hx, hy,
    CASE WHEN r1 < 0.5 THEN
      CASE WHEN r1 < 1.0/3.0 THEN m1
           ELSE CASE WHEN (1.0 - r1) <= r2 AND r2 < 2.0*r1 THEN m1 + 1 ELSE m1 END END
    ELSE
      CASE WHEN r1 < 2.0/3.0 THEN CASE WHEN 2.0*r1 - 1.0 < r2 AND r2 < 1.0 - r1 THEN m1 ELSE m1 + 1 END
           ELSE m1 + 1 END END AS i0,
    CASE WHEN r1 < 0.5 THEN
      CASE WHEN r1 < 1.0/3.0 THEN CASE WHEN r2 < (1.0 + r1)/2.0 THEN m2 ELSE m2 + 1 END
           ELSE CASE WHEN r2 < (1.0 - r1) THEN m2 ELSE m2 + 1 END END
    ELSE
      CASE WHEN r1 < 2.0/3.0 THEN CASE WHEN r2 < (1.0 - r1) THEN m2 ELSE m2 + 1 END
           ELSE CASE WHEN r2 < r1/2.0 THEN m2 ELSE m2 + 1 END END END AS j0
  FROM ij2),
ij4 AS (
  SELECT id, face, hy,
    CASE WHEN hx < 0.0 THEN
      CASE WHEN j0 % 2 = 0 THEN i0 - 2*(i0 - j0//2)
           ELSE i0 - (2*(i0 - (j0+1)//2) + 1) END
    ELSE i0 END AS i1, j0
  FROM ij3),
ij5 AS (
  SELECT id, face,
    CASE WHEN hy < 0.0 THEN i1 - (2*j0 + 1)//2 ELSE i1 END AS i2,
    CASE WHEN hy < 0.0 THEN -j0 ELSE j0 END AS j2
  FROM ij4),
ijk AS (
  SELECT id, face,
    i2 - LEAST(i2, j2, 0) AS i, j2 - LEAST(i2, j2, 0) AS j, 0 - LEAST(i2, j2, 0) AS k
  FROM ij5)"""]

    cur = "ijk"
    for rr in range(res - 1, -1, -1):
        rotrev = (rr + 1) % 2 == 0
        if rotrev:
            up_i = "CAST(round((2.0*(i - k) + (j - k)) / 7.0) AS BIGINT)"
            up_j = "CAST(round((3.0*(j - k) - (i - k)) / 7.0) AS BIGINT)"
            dn = ("3*ui + 1*uk", "1*ui + 3*uj", "1*uj + 3*uk")
        else:
            up_i = "CAST(round((3.0*(i - k) - (j - k)) / 7.0) AS BIGINT)"
            up_j = "CAST(round(((i - k) + 2.0*(j - k)) / 7.0) AS BIGINT)"
            dn = ("3*ui + 1*uj", "3*uj + 1*uk", "1*ui + 3*uk")
        digs = ", ".join(f"d{x}" for x in range(res, rr + 1, -1))
        digs_sel = (digs + ",") if digs else ""
        parts.append(f"""
up{rr} AS (
  SELECT id, face, {digs_sel} i AS li, j AS lj, k AS lk, {up_i} AS ui0, {up_j} AS uj0
  FROM {cur}),
upn{rr} AS (
  SELECT id, face, {digs_sel} li, lj, lk,
         ui0 - LEAST(ui0, uj0, 0) AS ui, uj0 - LEAST(ui0, uj0, 0) AS uj, 0 - LEAST(ui0, uj0, 0) AS uk
  FROM up{rr}),
dg{rr} AS (
  SELECT id, face, {digs_sel} ui AS i, uj AS j, uk AS k,
         4*((li - ({dn[0]})) - LEAST(li - ({dn[0]}), lj - ({dn[1]}), lk - ({dn[2]})))
       + 2*((lj - ({dn[1]})) - LEAST(li - ({dn[0]}), lj - ({dn[1]}), lk - ({dn[2]})))
       +   ((lk - ({dn[2]})) - LEAST(li - ({dn[0]}), lj - ({dn[1]}), lk - ({dn[2]}))) AS d{rr+1}
  FROM upn{rr})""")
        cur = f"dg{rr}"

    all_d = [f"d{x}" for x in range(1, res + 1)]
    lead = "CASE " + " ".join(f"WHEN d{x} != 0 THEN d{x}" for x in range(1, res + 1)) + " ELSE 0 END"

    def rot_expr(d, table_name):
        # digit rotation CASE (ccw: 1->5,5->4,4->6,6->2,2->3,3->1; cw inverse)
        ccw = {1: 5, 5: 4, 4: 6, 6: 2, 2: 3, 3: 1}
        cw = {v: k for k, v in ccw.items()}
        m = ccw if table_name == "ccw" else cw
        return ("CASE " + " ".join(f"WHEN {d} = {a} THEN {b}" for a, b in m.items())
                + f" ELSE {d} END")

    parts.append(f"""
bct(face, i, j, k, bc, rot, pent, cwoff) AS (VALUES
     {bc_values}),
withbc AS (
  SELECT g.id, g.face, b.bc, b.rot, b.pent, b.cwoff, {", ".join(all_d)}
  FROM {cur} g JOIN bct b USING (face, i, j, k)),
kfix AS (
  SELECT id, face, bc, rot, pent,
  {", ".join(
      f"CASE WHEN pent AND ({lead}) = 1 THEN (CASE WHEN cwoff THEN {rot_expr(f'd{x}', 'cw')} ELSE {rot_expr(f'd{x}', 'ccw')} END) ELSE d{x} END AS d{x}"
      for x in range(1, res + 1))}
  FROM withbc)""")

    cur = "kfix"
    for t in range(1, 6):
        # hexagon/pentagon shared ccw rotate when rot >= t
        step1 = ", ".join(
            f"CASE WHEN rot >= {t} THEN {rot_expr(f'd{x}', 'ccw')} ELSE d{x} END AS d{x}"
            for x in range(1, res + 1))
        parts.append(f"""
r{t}a AS (SELECT id, face, bc, rot, pent, {step1} FROM {cur}),
r{t} AS (
  SELECT id, face, bc, rot, pent,
  {", ".join(
      f"CASE WHEN pent AND rot >= {t} AND ({lead}) = 1 THEN {rot_expr(f'd{x}', 'ccw')} ELSE d{x} END AS d{x}"
      for x in range(1, res + 1))}
  FROM r{t}a)""")
        cur = f"r{t}"

    shifts = " | ".join(f"(d{x} << {3 * (15 - x)})" for x in range(1, res + 1))
    tail_ones = (1 << (3 * (15 - res))) - 1
    parts.append(f"""
packed AS (
  SELECT id,
         ((1::BIGINT << 59) | ({res}::BIGINT << 52) | (bc::BIGINT << 45)
          | {shifts} | {tail_ones}) AS h3_cell
  FROM {cur})""")
    return "WITH " + ",".join(parts) + " SELECT id, h3_cell AS hex_cell FROM packed"


def _s2_cell_ctes(points_sql: str, level: int = 12) -> str:
    """Exact SQL twin of functions.cells.s2_cell_id: face/uv projection,
    quadratic ST, Hilbert curve via the same 1024-entry 4-bit lookup
    table (embedded as VALUES), uint64 semantics via HUGEINT. Returns a
    CTE block (to splice after WITH); the final relation is ``s2cells``
    with columns (id, s2_cell)."""
    import math as _m
    from ingest_spark.functions import cells as _c

    lut_rows = ",".join(f"({i},{int(v)})" for i, v in enumerate(_c._LOOKUP_POS))
    d2r = repr(_m.pi / 180.0)
    lsb = 1 << (2 * (30 - level))
    steps = ""
    prev = "s2base"
    for k in range(7, -1, -1):
        steps += f"""
    s2s{k} AS (
      SELECT t.id, t.i, t.j,
             t.n | ((l.val >> 2)::HUGEINT * {2 ** (8 * k)}::HUGEINT) AS n,
             (l.val & 3)::BIGINT AS orient
      FROM {prev} t JOIN s2lut l
        ON l.idx = (((t.i >> {4 * k}) & 15) << 6) | (((t.j >> {4 * k}) & 15) << 2) | t.orient
    ),"""
        prev = f"s2s{k}"
    return f"""s2lut(idx, val) AS (VALUES {lut_rows}),
    s2xyz AS (
      SELECT id,
        COS(lat * {d2r}) * COS(lon * {d2r}) AS x,
        COS(lat * {d2r}) * SIN(lon * {d2r}) AS y,
        SIN(lat * {d2r}) AS z
      FROM {points_sql} s2p),
    s2fc AS (
      SELECT id, x, y, z,
        CASE WHEN ABS(x) > ABS(y) THEN (CASE WHEN ABS(x) > ABS(z) THEN 0 ELSE 2 END)
             ELSE (CASE WHEN ABS(y) > ABS(z) THEN 1 ELSE 2 END) END AS f0
      FROM s2xyz),
    s2fuv AS (
      SELECT id,
        f0 + CASE WHEN (CASE f0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0 THEN 3 ELSE 0 END AS face,
        x, y, z FROM s2fc),
    s2uv AS (
      SELECT id, face,
        CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                  WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
        CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                  WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
      FROM s2fuv),
    s2st AS (
      SELECT id, face,
        CASE WHEN u >= 0 THEN 0.5*SQRT(1.0+3.0*ABS(u)) ELSE 1.0 - 0.5*SQRT(1.0+3.0*ABS(u)) END AS su,
        CASE WHEN v >= 0 THEN 0.5*SQRT(1.0+3.0*ABS(v)) ELSE 1.0 - 0.5*SQRT(1.0+3.0*ABS(v)) END AS sv
      FROM s2uv),
    s2base AS (
      SELECT id,
        LEAST(GREATEST(CAST(FLOOR(su * 1073741824.0) AS BIGINT), 0), 1073741823) AS i,
        LEAST(GREATEST(CAST(FLOOR(sv * 1073741824.0) AS BIGINT), 0), 1073741823) AS j,
        (face::HUGEINT * 1152921504606846976::HUGEINT) AS n,
        (face::BIGINT & 1) AS orient
      FROM s2st),
    {steps}
    s2fin AS (
      SELECT id, 2::HUGEINT * ((n & ~({lsb // 2 - 1}::HUGEINT)) | {lsb // 2}::HUGEINT) AS h
      FROM s2s0
    ),
    s2cells AS (
      SELECT id, CASE WHEN h >= 9223372036854775808::HUGEINT
                  THEN (h - 18446744073709551616::HUGEINT)::BIGINT ELSE h::BIGINT END AS s2_cell
      FROM s2fin
    )"""


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derived points → hex/S2 cells → broadcast PIP join →
    per-polygon per-coarse-cell feature counts (the geo pipeline's
    spine on sf0.001)."""
    from ingest_spark.operators import spatial

    _ensure_shipped(spark)
    # driver-contract default; overridable so the smoke check can run
    # against any generated scale without editing the module
    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    pts = spatial.with_cells(_points(spark, sf_dir), lon_col="lon", lat_col="lat")
    polys = spatial.make_polygons_df(spark, _POLYGONS)
    joined = spatial.point_in_polygon_join(pts, polys)
    return (
        joined.groupBy("polygon_id", "name")
        .agg(
            F.count("*").alias("n_points"),
            F.countDistinct("hex_cell").alias("n_hex_cells"),
            F.countDistinct("s2_cell").alias("n_s2_cells"),
        )
        .orderBy("polygon_id")
    )


# -------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---------------- reference core: scans / filters / joins / aggs

    def s1_scan_stats(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.groupBy((F.col("l_orderkey") % 16).alias("bucket"))
            .agg(
                F.min("l_orderkey").alias("min_id"),
                F.max("l_orderkey").alias("max_id"),
                F.count("*").alias("n"),
            )
        )
    q["s1_scan_stats"] = s1_scan_stats

    def s5_projected_scan(spark, sf):
        return _points(spark, sf)
    q["s5_projected_scan"] = s5_projected_scan

    def s11_bbox_query(spark, sf):
        from ingest_spark.operators.spatial import bbox_query
        pts = _points(spark, sf).withColumn("minx", F.col("lon")) \
            .withColumn("maxx", F.col("lon")) \
            .withColumn("miny", F.col("lat")).withColumn("maxy", F.col("lat"))
        return bbox_query(pts, -20.0, -20.0, 30.0, 30.0).select("id", "lon", "lat")
    q["s11_bbox_query"] = s11_bbox_query

    def f1_tag_classify(spark, sf):
        part = _t(spark, sf, "part")
        dim = spark.createDataFrame(_CLASS_DIM, "p_type string, tier string")
        return (
            part.join(F.broadcast(dim), "p_type", "left")
            .withColumn("tier", F.coalesce("tier", F.lit("other")))
            .groupBy("tier")
            .agg(F.count("*").alias("n"), F.round(F.avg("p_retailprice"), 4).alias("avg_price"))
        )
    q["f1_tag_classify"] = f1_tag_classify

    def f2_filter_drop(spark, sf):
        li = _t(spark, sf, "lineitem")
        kept = li.where((F.col("l_discount") > 0.05) & (F.col("l_quantity") >= 25))
        return kept.agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 0).alias("total_price"),
        )
    q["f2_filter_drop"] = f2_filter_drop

    def j2_hash_join(spark, sf):
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        return (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 0).alias("revenue"))
        )
    q["j2_hash_join"] = j2_hash_join

    def j4_order_preserving(spark, sf):
        li = _t(spark, sf, "lineitem").where(F.col("l_orderkey") % 100 == 0)
        pts = F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey")))
        return (
            li.groupBy("l_orderkey")
            .agg(
                F.concat_ws(",", F.transform(pts, lambda s: s.l_partkey.cast("string"))).alias("partkeys_in_order")
            )
        )
    q["j4_order_preserving"] = j4_order_preserving

    def j6_two_hop(spark, sf):
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        n = _t(spark, sf, "nation")
        return (
            c.join(o, c["c_custkey"] == o["o_custkey"])
            .join(li, o["o_orderkey"] == li["l_orderkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("n_name")
            .agg(
                F.count("*").alias("n_items"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias("revenue"),
            )
        )
    q["j6_two_hop"] = j6_two_hop

    def j3_semi_join(spark, sf):
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders").where(
            F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
        )
        return c.join(
            o, c["c_custkey"] == o["o_custkey"], "left_semi"
        ).select("c_custkey", "c_mktsegment")
    q["j3_semi_join"] = j3_semi_join

    def j_anti_join(spark, sf):
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        return (
            c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_customers"))
        )
    q["j_anti_join"] = j_anti_join

    def a1_bbox_agg(spark, sf):
        e = _t(spark, sf, "events")
        p = _points(spark, sf).join(e.select(F.col("event_id").alias("id"), "user_id"), "id")
        return p.groupBy("user_id").agg(
            F.min("lon").alias("minx"), F.min("lat").alias("miny"),
            F.max("lon").alias("maxx"), F.max("lat").alias("maxy"),
            F.count("*").alias("n"),
        )
    q["a1_bbox_agg"] = a1_bbox_agg

    def a5_counts(spark, sf):
        return _t(spark, sf, "events").groupBy("event_type").agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 0).alias("total_value")
        )
    q["a5_counts"] = a5_counts

    def a6_rolling_rate(spark, sf):
        # Cross-engine hash stability: per-row rate is floored into integer
        # micro-units (exact BIGINT sum, no float non-associativity), and the
        # final average is FLOOR(sum/count) — a single IEEE division on
        # identical integers, bit-identical in Spark and DuckDB.
        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        rate = (F.col("value") - F.lag("value").over(w)) / F.greatest(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)), F.lit(1)
        )
        rate_micro = F.floor(rate * F.lit(1000000.0)).cast("long")
        return (
            e.withColumn("rate_micro", rate_micro)
            .groupBy("user_id")
            .agg(
                F.floor(
                    F.sum("rate_micro").cast("double") / F.count("rate_micro")
                ).cast("long").alias("avg_rate_micro"),
                F.count("*").alias("n"),
            )
        )
    q["a6_rolling_rate"] = a6_rolling_rate

    def a7_distinct(spark, sf):
        return _t(spark, sf, "events").select("user_id", "event_type").distinct()
    q["a7_distinct"] = a7_distinct

    def o3_grid_assign(spark, sf):
        p = _points(spark, sf)
        # scalar max-overlap with first-index tiebreak == ceil((x-x0)/w)-1
        ix = F.least(F.greatest(F.ceil((F.col("lon") + 180.0) / 45.0) - 1, F.lit(0)), F.lit(7))
        iy = F.least(F.greatest(F.ceil((F.col("lat") + 90.0) / 45.0) - 1, F.lit(0)), F.lit(3))
        return p.groupBy(ix.alias("cell_ix"), iy.alias("cell_iy")).agg(F.count("*").alias("n"))
    q["o3_grid_assign"] = o3_grid_assign

    def salt_hot_cells_q(spark, sf):
        # skew-bounding operator end-to-end: 45° grid cells over the
        # synthetic points are all "hot" at bucket_max=500, so every
        # row gets a real ceil(count/bound) salt via the portable LCG
        # hash — per-row (id, cell, salt) re-derived exactly in SQL
        _ensure_shipped(spark)
        from ingest_spark.operators.tiling import salt_hot_cells
        p = _points(spark, sf)
        ix = F.least(F.greatest(F.ceil((F.col("lon") + 180.0) / 45.0) - 1, F.lit(0)), F.lit(7))
        iy = F.least(F.greatest(F.ceil((F.col("lat") + 90.0) / 45.0) - 1, F.lit(0)), F.lit(3))
        cells = p.select("id", (ix * 4 + iy).cast("long").alias("cell"))
        return salt_hot_cells(cells, cell_col="cell", bucket_max=500, id_col="id")
    q["salt_hot_cells"] = salt_hot_cells_q

    def o5_sorted_topk(spark, sf):
        return (
            _t(spark, sf, "orders")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(50)
            .select("o_orderkey", "o_totalprice")
        )
    q["o5_sorted_topk"] = o5_sorted_topk

    # ---------------- north_rule spatial operators

    def pip_polygon_join(spark, sf):
        from ingest_spark.operators import spatial
        pts = _points(spark, sf)
        polys = spatial.make_polygons_df(spark, _POLYGONS)
        return spatial.point_in_polygon_join(pts, polys).select("id", "polygon_id")
    q["pip_polygon_join"] = pip_polygon_join

    def pip_grid_join(spark, sf):
        # the NON-broadcast scale path: both sides keyed by hex cell
        # (polygon bbox covering set × point cell equi-join) — same
        # result set as the broadcast PIP, so it shares the exact
        # even-odd SQL oracle
        from ingest_spark.operators import spatial
        pts = _points(spark, sf)
        polys = spatial.make_polygons_df(spark, _POLYGONS)
        out = spatial.point_in_polygon_grid_join(pts, polys, res=4)
        return out.select("id", "polygon_id")
    q["pip_grid_join"] = pip_grid_join

    def asof_join_q(spark, sf):
        # backward-inclusive as-of join (one-shuffle window plan, no
        # range explode) — oracled by DuckDB's native ASOF LEFT JOIN.
        # Right side deduped per (user_id, ts) (the determinism
        # precondition both engines share)
        from ingest_spark.operators.temporal import asof_join
        e = _t(spark, sf, "events")
        left = e.select("event_id", "user_id", "ts")
        right = (
            e.where(F.col("event_id") % 7 == 0)
            .groupBy("user_id", "ts")
            .agg(F.min("event_id").alias("ref_id"))
        )
        return asof_join(left, right, on="ts", by="user_id").select(
            "event_id", "user_id", "ref_id"
        )
    q["asof_join"] = asof_join_q

    def interval_join_q(spark, sf):
        # fact-to-interval join via time-bucket equi-join (no nested
        # loop); oracle = the plain BETWEEN join in SQL
        from ingest_spark.operators.temporal import interval_join
        e = _t(spark, sf, "events")
        facts = e.select("event_id", "user_id", "ts")
        iv = (
            e.where(F.col("event_id") % 11 == 0)
            .select(
                F.col("event_id").alias("iv_id"),
                "user_id",
                F.col("ts").alias("start_ts"),
                (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
            )
        )
        out = interval_join(facts, iv, by="user_id", bucket_sec=3600)
        return out.select("event_id", "iv_id")
    q["interval_join"] = interval_join_q

    def sample_det(spark, sf):
        # deterministic md5-threshold sampling (reproducible corpus
        # selection — same keys survive in any engine); trivial exact
        # SQL twin
        from ingest_spark.operators.sampling import sample_deterministic
        d = _t(spark, sf, "documents")
        return sample_deterministic(d, 0.25, "doc_id").select("doc_id", "source")
    q["sample_det"] = sample_det

    def sample_per_group_q(spark, sf):
        # source/domain balancing: deterministic cap per source by
        # md5-hash order; oracle = the same row_number window in SQL
        from ingest_spark.operators.sampling import sample_per_group
        d = _t(spark, sf, "documents")
        out = sample_per_group(d, 30, group_col="source", key_col="doc_id")
        return out.select("doc_id", "source")
    q["sample_per_group"] = sample_per_group_q

    def sample_stratified_q(spark, sf):
        from ingest_spark.operators.sampling import sample_stratified
        e = _t(spark, sf, "events")
        out = sample_stratified(
            e,
            {"click": 0.1, "view": 0.5, "purchase": 1.0},
            stratum_col="event_type",
            key_col="event_id",
            default_rate=0.02,
        )
        return out.groupBy("event_type").agg(F.count("*").alias("n_kept"))
    q["sample_stratified"] = sample_stratified_q

    def knn_ring_expansion(spark, sf):
        from ingest_spark.config import EngineConfig
        from ingest_spark.operators.spatial import knn_join
        pts = _points(spark, sf)
        queries_df = pts.where(F.col("id") % 500 == 0).select(
            F.col("id").alias("qid"), "lon", "lat"
        )
        out = knn_join(
            pts, queries_df, k=5, res=2, cfg=EngineConfig(knn_max_ring=64)
        )
        return out.select("qid", "id", F.round("dist", 6).alias("dist"), "rank")
    q["knn_ring_expansion"] = knn_ring_expansion

    def knn_h3_rings(spark, sf):
        # round-5: kNN keyed on H3-SPEC ids — grid_disk ring gather +
        # guaranteed-hit-cover exactness pass (knn_join_h3). Same
        # output contract and exact cross-join oracle as the planar
        # ring-expansion row: the real grid is the storage contract
        # (reference: src/lib.rs:24-27), so this row proves a user can
        # kNN directly on hex_cell-indexed tables.
        from ingest_spark.operators.spatial import knn_join_h3
        pts = _points(spark, sf)
        queries_df = pts.where(F.col("id") % 500 == 0).select(
            F.col("id").alias("qid"), "lon", "lat"
        )
        out = knn_join_h3(pts, queries_df, k=5, res=3)
        return out.select("qid", "id", F.round("dist", 6).alias("dist"), "rank")
    q["knn_h3_rings"] = knn_h3_rings

    def h3_boundary_check(spark, sf):
        # round-5: cell_to_boundary driven through the contract — per
        # res-5 H3 cell of the points table: point count (oracled by
        # the bit-exact SQL H3 twin + parent bit math) and an embedded
        # boundary invariant the oracle predicts to be TRUE for every
        # cell: latlng_to_cell(centroid(boundary(cell))) == cell. The
        # engine can only produce all-true by actually computing real
        # boundaries (substrate-grid construction, h3core.py); vertex
        # geometry itself is pytest-pinned (TestBoundaryAndDisk).
        _ensure_shipped(spark)
        from pyspark.sql.types import BooleanType
        from ingest_spark.operators.spatial import with_cells

        @F.pandas_udf(BooleanType())
        def _bcheck(cell: pd.Series) -> pd.Series:
            import numpy as np

            from ingest_spark.functions import h3core
            memo: dict = {}
            out = []
            for c in cell:
                c = int(c)
                if c not in memo:
                    b = h3core.cell_to_boundary(c)
                    # antimeridian-safe centroid: average lon offsets
                    # relative to the first vertex, then re-wrap
                    lon0 = float(b[0, 0])
                    dlon = (b[:, 0] - lon0 + 180.0) % 360.0 - 180.0
                    clon = (lon0 + float(np.mean(dlon)) + 180.0) % 360.0 - 180.0
                    clat = float(np.mean(b[:, 1]))
                    # resolution read off the cell id itself, so the
                    # round-trip can never drift from the parent bit
                    # math below (round-5 ADVICE low)
                    back = h3core.latlng_to_cell(
                        np.array([clon]), np.array([clat]),
                        h3core.get_resolution(c)
                    )
                    memo[c] = bool(int(back[0]) == c) and len(b) >= 5
                out.append(memo[c])
            return pd.Series(out)

        res = 5  # single source for the parent rollup resolution
        cells = with_cells(_points(spark, sf), lon_col="lon", lat_col="lat")
        parent = (
            F.col("hex_cell").bitwiseAND(F.lit(~(0xF << 52)))
            .bitwiseOR(F.lit(res << 52))
            .bitwiseOR(F.lit((1 << (3 * (15 - res))) - 1))
        )
        return (
            cells.groupBy(parent.alias("h3_res5"))
            .agg(F.count(F.lit(1)).alias("n_points"))
            .withColumn("boundary_ok", _bcheck(F.col("h3_res5")))
        )
    q["h3_boundary_check"] = h3_boundary_check

    def tile_xyz(spark, sf):
        from ingest_spark.operators.tiling import with_tile_xyz
        p = _points(spark, sf).withColumn("minx", F.col("lon")).withColumn("miny", F.col("lat"))
        return (
            with_tile_xyz(p, 6)
            .groupBy("tile_z", "tile_x", "tile_y")
            .agg(F.count("*").alias("n"))
        )
    q["tile_xyz"] = tile_xyz

    def mvt_points_tiles(spark, sf):
        # MVT tile materialization (operators/tiling.mvt_tiles: buffered
        # tile fan-out -> clip -> quantize -> MVT 2.1 command-stream
        # payload). The query DECODES the payload bytes back to
        # quantized coords and aggregates them, so the oracle checks the
        # whole chain: fan-out tile set, buffer inclusion, and the
        # floor(x+0.5) integer grid — re-derived exactly in SQL.
        from ingest_spark.operators.tiling import (
            decode_mvt_payload_point_sums, mvt_tiles,
        )

        g = _points(spark, sf).select(
            "id", F.lit("point").alias("gtype"),
            F.array(F.col("lon")).alias("xs"),
            F.array(F.col("lat")).alias("ys"),
        )
        t = mvt_tiles(g, z=6)

        def _stats(it):
            for pdf in it:
                rows = {k: [] for k in ("tile_z", "tile_x", "tile_y",
                                        "n_features", "sum_qx", "sum_qy")}
                for tz, tx, ty, nf, payload in zip(
                    pdf["tile_z"], pdf["tile_x"], pdf["tile_y"],
                    pdf["n_features"], pdf["payload"],
                ):
                    # vectorized whole-payload decode with exact
                    # fallback (round-8: the per-feature Python loop
                    # was ~1.4 s/run over 3,431 tiles); sums identical
                    # by parity test either path
                    sqx, sqy = decode_mvt_payload_point_sums(bytes(payload))
                    rows["tile_z"].append(int(tz))
                    rows["tile_x"].append(int(tx))
                    rows["tile_y"].append(int(ty))
                    rows["n_features"].append(int(nf))
                    rows["sum_qx"].append(sqx)
                    rows["sum_qy"].append(sqy)
                yield pd.DataFrame(rows)

        return t.mapInPandas(
            _stats,
            "tile_z int, tile_x int, tile_y int, "
            "n_features long, sum_qx long, sum_qy long",
        )
    q["mvt_points_tiles"] = mvt_points_tiles

    def h3_rollup(spark, sf):
        # H3 hierarchy rollup: res-8 cell assignment (real H3, UDF) →
        # res-5 parent via PURE Catalyst bit math (cellToParent is bit
        # surgery: swap the res field, pad child digits with 7s) →
        # count per parent. Oracle: same bit math over the SQL H3 twin.
        _ensure_shipped(spark)
        from ingest_spark.operators.spatial import with_cells
        cells = with_cells(_points(spark, sf), lon_col="lon", lat_col="lat")
        parent = (
            F.col("hex_cell").bitwiseAND(F.lit(~(0xF << 52)))
            .bitwiseOR(F.lit(5 << 52))
            .bitwiseOR(F.lit((1 << (3 * (15 - 5))) - 1))
        )
        return (
            cells.groupBy(parent.alias("h3_res5"))
            .agg(F.count(F.lit(1)).alias("n_points"))
        )
    q["h3_rollup"] = h3_rollup

    def cells_hex_s2(spark, sf):
        # oracle-backed: both cell kernels are re-expressed in exact
        # SQL arithmetic (see _h3_cell_sql — the FULL real-H3
        # algorithm — and _s2_cell_ctes)
        from ingest_spark.operators.spatial import with_cells
        return with_cells(_points(spark, sf), lon_col="lon", lat_col="lat").select(
            "id", "hex_cell", "s2_cell"
        )
    q["cells_hex_s2"] = cells_hex_s2

    # ---------------- webtext / training-data ops

    def dedup_exact(spark, sf):
        d = _t(spark, sf, "documents")
        return d.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5(F.encode("text", "UTF-8"))).alias("n_distinct"),
        )
    q["dedup_exact"] = dedup_exact

    def ngram_jaccard(spark, sf):
        from ingest_spark.operators.dedup import ngram_jaccard_pairs
        d = _t(spark, sf, "documents")
        out = ngram_jaccard_pairs(d, n=3, threshold=0.8)
        return out.select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    q["ngram_jaccard"] = ngram_jaccard

    def token_counts(spark, sf):
        from ingest_spark.functions import text as tx
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            tx.ws_token_count(F.col("text")).alias("ws_tokens"),
            tx.bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        )
    q["token_counts"] = token_counts

    def text_quality(spark, sf):
        from ingest_spark.functions import text as tx
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            tx.quality_score(F.col("text")).alias("quality"),
            F.round(tx.stopword_ratio(F.col("text")), 4).alias("stop_ratio"),
            F.round(tx.punct_ratio(F.col("text")), 4).alias("punct_ratio"),
        )
    q["text_quality"] = text_quality

    def lang_id(spark, sf):
        from ingest_spark.functions import text as tx
        d = _t(spark, sf, "documents")
        return d.select("doc_id", tx.lang_id(F.col("text")).alias("lang_guess"))
    q["lang_id"] = lang_id

    def fingerprint_md5(spark, sf):
        from ingest_spark.functions import text as tx
        d = _t(spark, sf, "documents")
        return d.select("doc_id", tx.md5_fingerprint(F.col("text")).alias("fp"))
    q["fingerprint_md5"] = fingerprint_md5

    def fingerprint_rolling(spark, sf):
        # oracle-backed: Karp-Rabin mod-2^64 Horner fold has an exact
        # HUGEINT twin in DuckDB (list_reduce over character codes)
        from ingest_spark.functions import text as tx
        d = _t(spark, sf, "documents")
        return d.select("doc_id", tx.rolling_fingerprint(F.col("text")).alias("fp64"))
    q["fingerprint_rolling"] = fingerprint_rolling

    def minhash_lsh(spark, sf):
        # oracle-backed: the full MinHash+LSH pipeline (shingle hash,
        # 64-perm signatures, banded join, estimate) has an exact
        # HUGEINT SQL twin (_minhash_oracle_sql)
        from ingest_spark.operators.dedup import minhash_lsh_pairs
        d = _t(spark, sf, "documents")
        return minhash_lsh_pairs(d, threshold=0.8).select(
            "doc_a", "doc_b", F.round("est_jaccard", 4).alias("est_jaccard")
        )
    q["minhash_lsh"] = minhash_lsh

    def minhash_incremental(spark, sf):
        # incremental dedup state machine: corpus split old/new, old
        # signatures are the stored state, the new batch sketches only
        # itself and band-joins against the state; oracle = the full
        # MinHash SQL pipeline filtered to pairs touching a new doc
        from ingest_spark.operators.dedup import (
            minhash_lsh_pairs_incremental, with_minhash,
        )
        d = _t(spark, sf, "documents")
        old = d.where(F.col("doc_id") % 5 != 0)
        new = d.where(F.col("doc_id") % 5 == 0)
        # the operator's contract: state comes in MATERIALIZED (in a
        # real loop it is the prior call's checkpointed return or a
        # storage read)
        old_sigs = with_minhash(old).localCheckpoint(eager=True)
        pairs, _state = minhash_lsh_pairs_incremental(old_sigs, new, threshold=0.8)
        return pairs.select(
            "doc_a", "doc_b", F.round("est_jaccard", 4).alias("est_jaccard")
        )
    q["minhash_incremental"] = minhash_incremental

    def simhash_dups(spark, sf):
        # oracle-backed: FNV-1a token hashes + Charikar votes + block
        # join re-expressed exactly in SQL (_simhash_oracle_sql)
        from ingest_spark.operators.dedup import simhash_pairs
        d = _t(spark, sf, "documents")
        return simhash_pairs(d, max_hamming=3)
    q["simhash_dups"] = simhash_dups

    def dup_components(spark, sf):
        # EXACT transitive duplicate clustering: simhash near-dup pairs
        # (themselves oracle-exact) collapsed via distributed
        # connected components (min-label propagation with pointer
        # doubling); oracle = recursive-CTE reachability closure over
        # the same SQL pair set. Catches transitive duplicates the
        # one-hop dedup rule misses (A~B, B~C, A!~C ⇒ one cluster).
        from ingest_spark.operators.dedup import duplicate_components, simhash_pairs
        d = _t(spark, sf, "documents")
        pairs = simhash_pairs(d, max_hamming=3)
        return duplicate_components(d, pairs)
    q["dup_components"] = dup_components

    def dup_components_distributed(spark, sf):
        # SAME semantics, DISTRIBUTED execution tier forced
        # (driver_threshold=0): the pointer-doubling min-label loop is
        # the 100 TB path, and this row pins it to the identical
        # recursive-CTE oracle the driver-tier row uses — both tiers
        # are cross-engine-verified every round, not just parity-
        # tested against each other in pytest.
        from ingest_spark.operators.dedup import duplicate_components, simhash_pairs
        d = _t(spark, sf, "documents")
        pairs = simhash_pairs(d, max_hamming=3)
        return duplicate_components(d, pairs, driver_threshold=0)
    q["dup_components_distributed"] = dup_components_distributed

    def embedding_cosine(spark, sf):
        from ingest_spark.operators.dedup import embedding_cosine_pairs
        emb = _t(spark, sf, "embeddings")
        emb = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
        out = embedding_cosine_pairs(emb, threshold=0.5, exact=True)
        return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    q["embedding_cosine"] = embedding_cosine

    def ann_topk(spark, sf):
        from ingest_spark.operators.similarity import cosine_topk
        emb = _t(spark, sf, "embeddings").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        queries_df = emb.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        out = cosine_topk(emb, queries_df, k=5)
        return out.select("qid", "vec_id", F.round("cosine", 4).alias("cosine"), "rank")
    q["ann_topk"] = ann_topk

    def ann_lsh_topk(spark, sf):
        # oracle-backed: the SCALE path (multi-table multi-probe
        # hyperplane LSH — bucketed join, no cross join). Codes are
        # integer-exact (sketches.hyperplane_codes_int), so the full
        # pipeline — planes, sign codes, probe fan-out, candidate join,
        # cosine re-rank — has an exact SQL twin (_ann_lsh_oracle_sql);
        # recall >= 0.9 vs exact top-k stays bounded in test_webtext.py
        from ingest_spark.operators.similarity import ann_topk as ann_lsh
        emb = _t(spark, sf, "embeddings").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        queries_df = emb.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        out = ann_lsh(emb, queries_df, k=5, n_planes=4, n_probe=5, n_tables=8)
        return out.select("qid", "vec_id", F.round("cosine", 4).alias("cosine"), "rank")
    q["ann_lsh_topk"] = ann_lsh_topk

    def vector_tiles_q(spark, sf):
        # oracle-backed projection of vector-tile materialization
        # (groupBy tile -> applyInPandas payload pack): per-tile feature
        # counts; payload bytes are golden-tested in test_tiling
        from ingest_spark.operators.tiling import vector_tiles
        p = _points(spark, sf).select(
            F.col("id"),
            F.col("lon").alias("minx"), F.col("lat").alias("miny"),
            F.encode(F.concat(F.lit("pt:"), F.col("id")), "UTF-8").alias("encoded"),
        )
        vt = vector_tiles(p, z=5)
        return vt.select("tile_z", "tile_x", "tile_y", "n_features")
    q["vector_tiles"] = vector_tiles_q

    def multimodal_frames(spark, sf):
        # video frame-sampling PLAN over the deterministic synthetic
        # media table (media bytes are opaque; the sampling/explode
        # plumbing is the Spark-side substance) — oracle re-derives the
        # generator arithmetic + sequence semantics in SQL
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import frame_sample, synthetic_media
        return frame_sample(synthetic_media(spark, n=500), every_ms=1000)
    q["multimodal_frames"] = multimodal_frames

    def multimodal_decode_shapes(spark, sf):
        # decode plumbing cross-check: route image rows through the
        # mapInPandas decode — REAL pure-numpy BMP parse since r4 (no
        # fake flag) — and emit the SHAPE facts (height, width, tensor
        # length) the oracle re-derives from the generator; pixel
        # VALUES are oracled in multimodal_decode_pixels
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import decode_image, synthetic_media
        d = decode_image(synthetic_media(spark, n=500))
        return d.select(
            "media_id", "height", "width", F.size("pixels").alias("n_px")
        )
    q["multimodal_decode_shapes"] = multimodal_decode_shapes

    def multimodal_decode_pixels(spark, sf):
        # PIXEL-EXACT decode: synthetic_media emits valid 24-bit BMP
        # bytes (closed-form RGB pattern); decode_image_stats parses the
        # real binary (header, bottom-up rows, BGR order, row padding)
        # and sums raw RGB values; the oracle recomputes the pattern sum
        # in pure SQL — any byte-level decode error breaks the hash
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import (
            decode_image_stats, synthetic_media,
        )
        return decode_image_stats(synthetic_media(spark, n=500))
    q["multimodal_decode_pixels"] = multimodal_decode_pixels

    def multimodal_audio_decode(spark, sf):
        # SAMPLE-EXACT WAV decode: valid PCM16 payloads (closed-form
        # samples), native RIFF chunk-walk decode, integer sample sums
        # re-derived by the oracle
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import (
            decode_audio_stats, synthetic_media,
        )
        return decode_audio_stats(synthetic_media(spark, n=500))
    q["multimodal_audio_decode"] = multimodal_audio_decode

    def multimodal_video_decode(spark, sf):
        # FRAME-EXACT video decode (round 5): synthetic_media emits
        # valid uncompressed AVI bytes (RIFF chunk tree, bottom-up BGR
        # 'DIB ' frames, closed-form per-frame pixels);
        # decode_video_stats walks the real container and sums raw RGB
        # values per frame; the oracle recomputes the pattern sum in
        # pure SQL — any chunk-walk or row-layout error breaks the hash
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import (
            decode_video_stats, synthetic_media,
        )
        return decode_video_stats(synthetic_media(spark, n=500))
    q["multimodal_video_decode"] = multimodal_video_decode

    def multimodal_compressed_decode(spark, sf):
        # REAL entropy-coded codecs (round 6): synthetic_compressed_media
        # emits valid baseline JPEG (T.81 Huffman + DCT, 4:4:4/4:2:0,
        # restart markers), GIF89a (variable-width LZW), and PNG
        # (DEFLATE) payloads from closed-form pixel patterns;
        # decode_compressed_stats decodes each through the magic-byte
        # router and compares to the source: GIF/PNG must be byte-exact
        # (lossless codecs), JPEG within the measured quantization
        # tolerance. The oracle re-derives every shape fact and the
        # lossless/tolerance verdicts in SQL — any Huffman, LZW,
        # DEFLATE-filter, IDCT, upsampling, or color-transform bug
        # flips a boolean and breaks the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import (
            decode_compressed_stats, synthetic_compressed_media,
        )
        return decode_compressed_stats(synthetic_compressed_media(spark, n=120))
    q["multimodal_compressed_decode"] = multimodal_compressed_decode

    def multimodal_webp_decode(spark, sf):
        # REAL WebP-lossless payloads (round 7): synthetic_webp_media
        # emits spec-conformant VP8L streams rotating every decoder
        # path — canonical/simple prefix codes, color cache, LZ77 with
        # the 120-entry distance map, subtract-green, all 14 predictor
        # modes, cross-color, color-indexing with sub-byte bundling,
        # and VP8X-wrapped containers; decode_compressed_stats routes
        # them by magic bytes and compares to the closed-form source.
        # VP8L is lossless, so lossless_exact must be TRUE on every
        # row — the oracle re-derives all facts in SQL and any
        # bitstream bug flips a boolean and breaks the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import (
            decode_compressed_stats, synthetic_webp_media,
        )
        return decode_compressed_stats(synthetic_webp_media(spark, n=96))
    q["multimodal_webp_decode"] = multimodal_webp_decode

    def multimodal_audio_codecs(spark, sf):
        # REAL compressed-audio codecs (round 6): synthetic_codec_audio
        # emits valid WAV payloads rotating G.711 mu-law / A-law
        # (functions/audio.py companding, fmt tags 7/6) and IMA ADPCM
        # (4-bit block-adaptive, tag 0x11, vectorized across blocks);
        # decode_audio_codec_stats routes each through the fmt-tag
        # dispatch and compares to the closed-form triangle source.
        # The oracle re-derives codec, sample count, the EXACT
        # container byte size (pins the RIFF/fact/data layout), and
        # the tolerance verdict — a companding-table, nibble-order, or
        # step-adaptation bug breaks the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import (
            decode_audio_codec_stats, synthetic_codec_audio,
        )
        return decode_audio_codec_stats(synthetic_codec_audio(spark, n=90))
    q["multimodal_audio_codecs"] = multimodal_audio_codecs

    def multimodal_mjpeg_decode(spark, sf):
        # REAL compressed video (round 6): synthetic_mjpeg_media emits
        # Motion-JPEG AVIs — every '00dc' chunk an independent
        # baseline T.81 stream from the native encoder (4:4:4 and
        # 4:2:0 rows) inside the RIFF container; decode_mjpeg_stats
        # walks the container, decodes every frame through
        # functions/jpeg.py, and emits per-frame shape facts + the
        # tolerance verdict vs the closed-form source frames. The
        # oracle re-derives frame counts/dims/fps in SQL — a container
        # offset, SOF-dim, Huffman, or upsampling bug drops or flips a
        # row and breaks the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import (
            decode_mjpeg_stats, synthetic_mjpeg_media,
        )
        return decode_mjpeg_stats(synthetic_mjpeg_media(spark, n=60))
    q["multimodal_mjpeg_decode"] = multimodal_mjpeg_decode

    def multimodal_flac_decode(spark, sf):
        # REAL lossless compressed audio (round 6): synthetic_flac_audio
        # emits valid FLAC payloads (functions/flac.py — STREAMINFO
        # with sample MD5, CRC-8/16-protected frames, fixed-predictor
        # rice-coded subframes) over the SQL-twinned PCM sawtooth;
        # decode_flac_stats decodes natively and emits the EXACT int64
        # sample sum, which the oracle re-derives in closed form —
        # lossless means zero tolerance: any rice, CRC, predictor-
        # integration, or framing defect breaks the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.multimodal import (
            decode_flac_stats, synthetic_flac_audio,
        )
        return decode_flac_stats(synthetic_flac_audio(spark, n=80))
    q["multimodal_flac_decode"] = multimodal_flac_decode

    def warc_records_q(spark, sf):
        # REAL WARC container parsing (round 6): synthetic_warc builds
        # valid .warc.gz archives (functions/warc.py — ISO 28500
        # records, per-record gzip members, embedded HTTP/1.1
        # responses); parse_warc walks members, splits the HTTP
        # payload, and emits one row per record. The oracle re-derives
        # every record fact (file, index, type, url, status, mime) in
        # closed form — a framing, Content-Length, member-boundary, or
        # HTTP-split bug breaks the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.webtext import parse_warc, synthetic_warc
        return parse_warc(synthetic_warc(spark, n_files=12)).select(
            "warc_file", "rec_idx", "warc_type", "url", "status", "mime")
    q["warc_records"] = warc_records_q

    def webtext_extract_q(spark, sf):
        # REAL HTML extraction (round 6): functions/htmltext.py is a
        # tokenizing extractor (stdlib html.parser — not the regex
        # fast path the synthetic <article> pages use): drops script/
        # style/comment content, decodes entities, separates <title>,
        # counts links, inserts block boundaries. The oracle re-derives
        # title, link count, and the visible-word count per page in
        # closed form — script/comment leakage or word-merging across
        # tags shifts n_words and breaks the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.webtext import (
            extract_webtext, parse_warc, synthetic_warc,
        )
        return extract_webtext(
            parse_warc(synthetic_warc(spark, n_files=12))
        ).select("page_id", "url", "status", "title", "n_links", "n_words")
    q["webtext_extract"] = webtext_extract_q

    def webtext_charset_q(spark, sf):
        # Charset-aware decode (round 7): the synthetic corpus cycles
        # through eight charset scenarios — header-declared utf-8 /
        # windows-1252, meta-only shift_jis, a lying header beaten by
        # a utf-16 BOM, the WHATWG latin-1→cp1252 rule with 0x93/0x94
        # curly quotes plus a header-vs-meta conflict, an undeclared
        # ASCII default, an invalid-byte utf-8 page (decode_ok=0,
        # U+FFFD in the text), and a bogus header label that must fall
        # through to the default. The oracle re-derives the decoded
        # text, charset name, cascade stage, and strict-decode flag in
        # closed form — blind-utf-8 decoding (the pre-round-7
        # behavior) mojibakes four of the eight variants and breaks
        # the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.webtext import (
            extract_webtext, parse_warc, synthetic_charset_warc,
        )
        return extract_webtext(
            parse_warc(synthetic_charset_warc(spark, n_files=8))
        ).select(
            "page_id", "url", "charset", "charset_source",
            F.col("decode_ok").cast("int").alias("decode_ok"),
            "title", "n_words", "text",
        )
    q["webtext_charset"] = webtext_charset_q

    def main_content_q(spark, sf):
        # boilerplate removal (round 7): block-segmented extraction +
        # the justext/boilerpipe rule core reduced to LOCAL decisions
        # (chrome containers, exact-integer link density 3*link > n,
        # per-class word minimums) over a synthetic corpus that plants
        # every boilerplate class around closed-form main content; the
        # oracle re-derives the full block census per page in SQL, so
        # any tokenizer-segmentation or classifier drift breaks the
        # hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.webtext import (
            extract_main_content, synthetic_boilerplate_pages,
        )
        return extract_main_content(
            synthetic_boilerplate_pages(spark, n=400)
        ).drop("content_text")
    q["main_content"] = main_content_q

    def wet_extract_q(spark, sf):
        # WET ingestion (round 7): Common Crawl ships pre-extracted
        # text as WARC `conversion` records (.warc.wet.gz) — a
        # pipeline starting from WET skips the HTML stage entirely.
        # synthetic_wet builds valid per-member-gzip WET files whose
        # text is closed-form in the page id; parse_warc walks them
        # with the same splittable member offsets, and extract_wet
        # decodes + counts. The oracle re-derives chars/words/text
        # exactly in SQL.
        _ensure_shipped(spark)
        from ingest_spark.operators.webtext import (
            extract_wet, parse_warc, synthetic_wet,
        )
        return extract_wet(parse_warc(synthetic_wet(spark, n_files=12)))
    q["wet_extract"] = wet_extract_q

    def url_canonical_q(spark, sf):
        # URL canonicalization (round 6 web-graph layer): pure column
        # expressions (regexp + array lambdas, JVM-side) lower-case
        # scheme/host, strip default ports / fragments / tracking
        # params, and sort surviving query params; host_surt emits the
        # Common-Crawl index sort key. The oracle re-derives the
        # canonical url and SURT key in closed form from the messy
        # synthetic urls — any rule drift breaks the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators import webgraph as wg
        pages = wg.synthetic_linked_pages(spark)
        host = wg.url_host(F.col("url"))
        return pages.select(
            "page_id",
            wg.canonical_url(F.col("url")).alias("canon_url"),
            host.alias("canon_host"),
            wg.host_surt(host).alias("surt_key"),
        )
    q["url_canonical"] = url_canonical_q

    def host_graph_degrees_q(spark, sf):
        # Host link graph (round 6): pages → real-HTML link extraction
        # → canonical host edges (self-loops dropped) → per-host degree
        # stats. Integer-exact; the oracle re-derives the edge list
        # from the closed-form link rule (the same-host /local links
        # MUST vanish — leaking one shifts the counts).
        _ensure_shipped(spark)
        from ingest_spark.operators import webgraph as wg
        edges = wg.host_edges(wg.extract_links(
            wg.synthetic_linked_pages(spark)))
        return wg.host_degrees(edges)
    q["host_graph_degrees"] = host_graph_degrees_q

    def pagerank_hosts_q(spark, sf):
        # Distributed PageRank (round 6): 3 damped iterations over the
        # weighted host graph — per-iteration join+groupBy on
        # host-cardinality rows, transition matrix built once. The
        # oracle unrolls the SAME 3 iterations in SQL CTEs; ranks are
        # rounded to 6 dp on both sides (float-sum ordering differs
        # across engines at ~1e-16).
        _ensure_shipped(spark)
        from ingest_spark.operators import webgraph as wg
        edges = wg.host_edges(wg.extract_links(
            wg.synthetic_linked_pages(spark)))
        pr = wg.pagerank(edges, iters=3, damping=0.85)
        return pr.select("host", F.round("pr", 6).alias("pr"))
    q["pagerank_hosts"] = pagerank_hosts_q

    def hits_hosts_q(spark, sf):
        # Kleinberg HITS (round 6): 2 L2-normalized iterations over
        # the same weighted host graph — two SpMV half-steps per
        # iteration against direction-specific cached adjacency. The
        # oracle unrolls the SAME half-steps as SQL CTEs (norms via
        # scalar subqueries); 6-dp rounding absorbs float-sum order.
        _ensure_shipped(spark)
        from ingest_spark.operators import webgraph as wg
        edges = wg.host_edges(wg.extract_links(
            wg.synthetic_linked_pages(spark)))
        res = wg.hits(edges, iters=2)
        return res.select("host",
                          F.round("authority", 6).alias("authority"),
                          F.round("hub", 6).alias("hub"))
    q["hits_hosts"] = hits_hosts_q

    def anchor_terms_q(spark, sf):
        # Anchor-text rollup (round 6): visible <a> text from the
        # real HTML tokenizer → per-destination-host top-3 terms,
        # cross-host links only (rank deterministic: count desc, term
        # asc). Oracle re-derives the anchors ("t{k}") and targets in
        # closed form — a tokenizer drift, a leaked same-host link,
        # or a tie-break change all shift the rows.
        _ensure_shipped(spark)
        from ingest_spark.operators import webgraph as wg
        links = wg.extract_links(wg.synthetic_linked_pages(spark))
        return wg.anchor_terms(links, top_k=3)
    q["anchor_terms"] = anchor_terms_q

    def host_graph_delta_q(spark, sf):
        # Incremental host-graph maintenance (round 6): remove pages
        # [100, 200), add pages [600, 660), merge signed link deltas
        # into the standing edge table. The oracle rebuilds the graph
        # from scratch over the surviving page set in closed form —
        # the incremental path must be indistinguishable, including
        # pairs whose weight reaches 0 and must vanish.
        _ensure_shipped(spark)
        from ingest_spark.operators import webgraph as wg
        base = wg.synthetic_linked_pages(spark)
        edges = wg.host_edges(wg.extract_links(base))
        removed = base.filter((F.col("page_id") >= 100)
                              & (F.col("page_id") < 200))
        big = wg.synthetic_linked_pages(spark, 660)
        added = big.filter(F.col("page_id") >= 600)
        return wg.host_edges_delta(edges, removed, added)
    q["host_graph_delta"] = host_graph_delta_q

    def cocitation_pairs_q(spark, sf):
        # Co-citation similarity (round 6): host pairs linked by >= 2
        # common source hosts, per-src self-join over the DISTINCT
        # edge table (hub sources above the out-degree cap are
        # dropped — not triggered by this corpus, asserted by the cap
        # pytest). Integer-exact.
        _ensure_shipped(spark)
        from ingest_spark.operators import webgraph as wg
        edges = wg.host_edges(wg.extract_links(
            wg.synthetic_linked_pages(spark)))
        return wg.cocitation(edges, min_cocite=2)
    q["cocitation_pairs"] = cocitation_pairs_q

    def pagerank_dangling_q(spark, sf):
        # Canonical PageRank (round 6): hosts 35/36 are made dangling
        # by dropping their out-edges; dangling mass is redistributed
        # uniformly each iteration (mass conserved). Oracle unrolls
        # the same 3 iterations with the dangling-mass scalar as a
        # subquery per step, mirroring the engine's FP association
        # (base + d·Σc + (d·m)/N); 6-dp rounding both sides.
        _ensure_shipped(spark)
        from ingest_spark.operators import webgraph as wg
        edges = wg.host_edges(wg.extract_links(
            wg.synthetic_linked_pages(spark)))
        edges = edges.filter(~F.col("src_host").isin(
            "host35.example.org", "host36.example.org"))
        pr = wg.pagerank(edges, iters=3, damping=0.85,
                         dangling="redistribute")
        return pr.select("host", F.round("pr", 6).alias("pr"))
    q["pagerank_dangling"] = pagerank_dangling_q

    def geotag_cells_q(spark, sf):
        # Webtext→geospatial bridge (round 6): pages carrying
        # geo.position / ICBM meta tags (real HTML meta extraction,
        # malformed content skipped row-wise) → (lat, lon) points →
        # REAL H3 res-8 cells via the same with_cells kernel the
        # spatial core uses → per-cell page rollup. The oracle
        # re-derives the parseable pages' quarter-degree coordinates
        # in closed form and runs them through the bit-exact SQL H3
        # twin — a meta-parse, precedence, skip, or cell-assignment
        # drift breaks the hash.
        _ensure_shipped(spark)
        from ingest_spark.operators.spatial import with_cells
        from ingest_spark.operators.webtext import (
            geotag_points, synthetic_geotagged_pages,
        )
        pts = geotag_points(synthetic_geotagged_pages(spark, 500))
        cells = with_cells(
            pts.select(F.col("page_id").alias("id"), "lon", "lat"),
            lon_col="lon", lat_col="lat")
        return cells.groupBy("hex_cell").agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("id").alias("min_page"))
    q["geotag_cells"] = geotag_cells_q

    def tile_pyramid_q(spark, sf):
        # Full-pyramid tile rollup (round 6): counts for every zoom
        # 0..6 in ONE shuffle — each point explodes to its 7 ancestor
        # tiles (bit-shifted coords), map-side combine collapses the
        # fan-out before the exchange. Oracle: the same fan-out as a
        # range cross join over the SQL tile twin. z=0 must hold the
        # global row count; each parent must hold the sum of its ≤4
        # children (the pytest asserts both invariants directly).
        from ingest_spark.operators.tiling import tile_pyramid
        p = (_points(spark, sf)
             .withColumn("minx", F.col("lon"))
             .withColumn("miny", F.col("lat")))
        return tile_pyramid(p, 6)
    q["tile_pyramid"] = tile_pyramid_q

    def iceberg_snapshots_q(spark, sf):
        # the catalog commit protocol end-to-end (round 6): three
        # deterministic commits against a fresh Iceberg-v2-layout table
        # (plans/iceberg.py — real Avro manifests, optimistic version
        # files): initial append of ids 0..9, append() of 10..14
        # (prior files carried as EXISTING), then a MERGE deleting even
        # ids < 10 and inserting 100..101. Emits one row per snapshot:
        # ordinal, operation, rows live AT that snapshot via time
        # travel, and rows in the current table — every value is
        # closed-form, so the oracle pins the whole metadata chain
        # (append carry-over, copy-on-write isolation, snapshot log
        # order). Results are materialized before the temp table is
        # removed.
        import shutil
        import tempfile

        from ingest_spark.plans.iceberg import IcebergMetadataBackend

        b = IcebergMetadataBackend()
        root = tempfile.mkdtemp(prefix="ice_contract_")
        path = root + "/tbl"
        try:
            mk = lambda lo, hi: spark.range(lo, hi).withColumnRenamed("id", "k")
            b.commit(mk(0, 10), path)
            b.append(mk(10, 15), path)
            b.merge_overwrite(
                spark, path,
                spark.range(0, 10, 2).withColumnRenamed("id", "k"),
                mk(100, 102), key="k",
            )
            md = b.current_metadata(path)
            current_n = b.read(spark, path).count()
            # round 7: manifest column stats — per snapshot, decode
            # the live entries' lower/upper bounds for k (spec
            # Appendix-D binary single-values) and sum the
            # value_counts map; plus a stats-PRUNED read at the
            # current snapshot (k >= 100 must see exactly the two
            # merge-inserted rows). Every value is closed-form and
            # partition-count invariant, so the oracle pins bounds
            # serialization, stats collection, and pruned-read
            # semantics end-to-end.
            fields = b._top_level_fields(md)
            n_ge100 = b.read_where(spark, path, [("k", ">=", 100)]).count()
            rows = []
            for i, snap in enumerate(md["snapshots"]):
                sid = snap["snapshot-id"]
                n = b.read_snapshot(spark, path, sid).count()
                entries = b._live_entries(md, sid)
                bounds = [b._entry_bounds(e, "k", fields)
                          for e in entries]
                kid = fields["k"][0]
                sum_vc = sum(
                    kv["value"]
                    for e in entries
                    for kv in e["data_file"]["value_counts"] or []
                    if kv["key"] == kid)
                rows.append((
                    i, snap["summary"]["operation"], n, current_n,
                    min(lo for lo, _ in bounds),
                    max(hi for _, hi in bounds),
                    sum_vc, n_ge100,
                ))
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return spark.createDataFrame(
            rows, "ordinal int, operation string, n_rows bigint, "
                  "n_current bigint, min_k bigint, max_k bigint, "
                  "sum_vc bigint, n_ge100 bigint")
    q["iceberg_snapshots"] = iceberg_snapshots_q

    def retile_incremental_q(spark, sf):
        # incremental vector-tile maintenance end-to-end: a deterministic
        # changeset (delete id%97, move id%31 east 7.3°, create a twin at
        # id+1e9 for id%53) is applied via retile_incremental — only
        # affected tiles re-pack — and the ORACLE is the full-rebuild
        # twin: per-tile counts over the post-changeset table computed
        # directly in SQL. Equality proves kept ∪ repacked ≡ rebuild.
        from ingest_spark.operators.tiling import retile_incremental, vector_tiles
        p = _points(spark, sf)
        feats = p.select(
            "id",
            F.col("lon").alias("minx"), F.col("lat").alias("miny"),
            F.encode(F.concat(F.lit("pt:"), F.col("id")), "UTF-8").alias("encoded"),
        )
        wrap = lambda c: F.pmod(c + 180.0, F.lit(360.0)) - 180.0  # noqa: E731
        survivors = feats.where(F.col("id") % 97 != 0).withColumn(
            "minx",
            F.when(F.col("id") % 31 == 0, wrap(F.col("minx") + 7.3)).otherwise(F.col("minx")),
        )
        created = feats.where(F.col("id") % 53 == 0).select(
            (F.col("id") + 1_000_000_000).alias("id"),
            wrap(F.col("minx") + 1.7).alias("minx"),
            "miny",
            F.encode(F.concat(F.lit("pt:"), F.col("id") + 1_000_000_000), "UTF-8").alias("encoded"),
        )
        new_feats = survivors.unionByName(created)
        changed = (
            feats.where((F.col("id") % 97 == 0) | (F.col("id") % 31 == 0))
            .select("id")
            .unionByName(created.select("id"))
        )
        old_tiles = vector_tiles(feats, 5)
        out = retile_incremental(old_tiles, feats, new_feats, changed, 5)
        return out.select("tile_z", "tile_x", "tile_y", "n_features")
    q["retile_incremental"] = retile_incremental_q

    def event_windows(spark, sf):
        e = _t(spark, sf, "events")
        bucket = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
        return (
            e.groupBy(bucket.alias("window_epoch"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 0).alias("total_value"))
        )
    q["event_windows"] = event_windows

    # ---------------- generic engine coverage (TPC-H-ish)

    def tpch_q1(spark, sf):
        li = _t(spark, sf, "lineitem").where(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            F.round(F.sum("l_quantity"), 0).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 0).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    q["tpch_q1"] = tpch_q1

    def tpch_q3_topk(spark, sf):
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        rev = (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        )
        return rev.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)
    q["tpch_q3_topk"] = tpch_q3_topk

    def tpch_q5ish(spark, sf):
        # lineitem-centric join order (round-8): with the fact table as
        # the stream side, the four dimension builds (orders, customer,
        # supplier, nation/region) are INDEPENDENT subtrees — their
        # broadcast stages materialize concurrently instead of the old
        # c⋈o⋈li chain where each build waited on the previous join.
        # Same inner-join row multiset, same aggregate — oracle hash
        # unchanged. No forced broadcasts: the planner picks per side
        # (at larger SF the big sides fall back to shuffle joins).
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        s = _t(spark, sf, "supplier")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(
                s,
                (li["l_suppkey"] == s["s_suppkey"])
                & (c["c_nationkey"] == s["s_nationkey"]),
            )
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy("r_name")
            .agg(
                F.count("*").alias("n_items"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias("revenue"),
            )
        )
    q["tpch_q5ish"] = tpch_q5ish

    def window_running_sum(spark, sf):
        o = _t(spark, sf, "orders").where(F.col("o_custkey") % 10 == 0)
        w = (
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return o.select(
            "o_custkey", "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
    q["window_running_sum"] = window_running_sum

    # ---------------- generic set / grouping / window completeness

    def set_ops(spark, sf):
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        with_orders = c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select("c_custkey")
        building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        return spark.createDataFrame(
            [(0,)], "row_id long"
        ).select(
            "row_id",
            F.lit(building.union(with_orders).distinct().count()).alias("union_n"),
            F.lit(building.intersect(with_orders).count()).alias("intersect_n"),
            F.lit(building.exceptAll(building.intersect(with_orders)).count()).alias("except_n"),
        )
    q["set_ops"] = set_ops

    def rollup_agg(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 0).alias("qty"))
        )
    q["rollup_agg"] = rollup_agg

    def having_filter(spark, sf):
        o = _t(spark, sf, "orders")
        g = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
        return g.where(F.col("n_orders") >= 20)
    q["having_filter"] = having_filter

    def subquery_in(spark, sf):
        c = _t(spark, sf, "customer").where(F.col("c_acctbal") > 9000)
        o = _t(spark, sf, "orders")
        return (
            o.join(c.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
    q["subquery_in"] = subquery_in

    def pivot_case(spark, sf):
        o = _t(spark, sf, "orders")
        return o.groupBy("o_orderstatus").agg(
            *[
                F.sum(F.when(F.col("o_orderpriority") == pr, 1).otherwise(0)).cast("long").alias(f"n_{pr.split('-')[0]}")
                for pr in ["1-URGENT", "2-HIGH", "3-MEDIUM"]
            ]
        )
    q["pivot_case"] = pivot_case

    def sessionize(spark, sf):
        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        sess = F.sum(new_sess).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            e.withColumn("session_id", sess)
            .groupBy("user_id")
            .agg(F.max("session_id").cast("long").alias("n_sessions"), F.count("*").alias("n_events"))
        )
    q["sessionize"] = sessionize

    def raster_tiles_q(spark, sf):
        # oracle-able projection: per-tile point counts (the binary grid
        # itself is golden-tested in test_tiling; md5 of numpy-built
        # bytes has no SQL twin)
        from ingest_spark.operators.tiling import raster_tiles
        p = _points(spark, sf).select(
            F.col("id"), F.lit(0).cast("tinyint").alias("kind"),
            F.col("lon").alias("minx"), F.col("lat").alias("miny"),
            F.col("lon").alias("maxx"), F.col("lat").alias("maxy"),
        )
        r = raster_tiles(p, z=4, px=64)
        return r.select("tile_z", "tile_x", "tile_y", "px", "n_points")
    q["raster_tiles"] = raster_tiles_q

    # ---------------- georender fixture pipeline

    def georender_features(spark, sf):
        # oracle-backed: the fixture element model is embedded in the
        # SQL twin (_georender_oracle_sql) and classification/id
        # mangling/f32 bbox are re-derived there; this side decodes the
        # header fields back OUT of the binary payload (E5), so the
        # comparison checks the encode→decode round trip. Payload BYTES
        # stay pytest-golden (test_golden_ingest).
        _ensure_shipped(spark)
        from ingest_spark.operators import extract
        from ingest_spark.operators.features import build_features
        from ingest_spark.sources import pages as pages_src

        pages = pages_src.fixture_pages(spark)
        nodes, ways, rels = extract.parse_elements(pages)
        feats = build_features(nodes, ways, rels, spark)
        return _georender_header_projection(feats)
    q["georender_features"] = georender_features

    def georender_changeset(spark, sf):
        # the capability the reference declares but leaves
        # unimplemented (bin.rs:229-231): apply a deterministic
        # changeset (move+retag / move a way member / delete / create —
        # the dormant-suite edit flavors) through the affected-closure
        # MERGE, then project the same decodable header fields; the
        # ORACLE re-derives the POST-changeset model from first
        # principles in SQL, so kept-vs-recomputed rows both check out
        _ensure_shipped(spark)
        from ingest_spark.operators import extract
        from ingest_spark.operators.changeset import Changeset, apply_changeset
        from ingest_spark.operators.features import build_features
        from ingest_spark.sources import pages as pages_src

        pages = pages_src.fixture_pages(spark)
        nodes, ways, rels = extract.parse_elements(pages)
        feats = build_features(nodes, ways, rels, spark)
        up_rows = []
        for nid, lon, lat, tags in (_CS_MOVED_2000, _CS_MOVED_1313, _CS_CREATED_3000):
            tag_map = dict(kv.split("=", 1) for kv in tags.split("|") if kv)
            up_rows.append((nid, float(lon), float(lat), tag_map))
        nodes_up = spark.createDataFrame(
            up_rows, "id long, lon double, lat double, tags map<string,string>"
        )
        cs = Changeset(nodes_upsert=nodes_up, node_deletes=[_CS_DELETED_NODE])
        feats2, _n2, _w2, _r2 = apply_changeset(spark, feats, nodes, ways, rels, cs)
        return _georender_header_projection(feats2)
    q["georender_changeset"] = georender_changeset

    # The driver's per-round correctness harness oracles the FIRST 50
    # entries of this dict.  Rotate 13 rows that are long driver-green
    # (every one has rows+schema+hash green in CORRECTNESS_r01..r04) to
    # the tail so the 13 entries that have never had a driver row —
    # including the two flagship reference-fidelity queries
    # georender_features / georender_changeset — sit inside the window.
    # round-7 ROTATION: the 34 rows tailed in round 6 come back inside
    # the 50-entry window (fresh driver rows this round), joined by the
    # new webtext_charset, multimodal_webp_decode, main_content and
    # wet_extract (never driver-rowed); 38 r6-driver-green stable rows
    # rotate out.  The union of consecutive rounds covers all 88
    # (tests/test_counts.py asserts the tails are disjoint
    # round-over-round, and that the georender flagships stay inside).
    # Kept inside the window besides the comebacks: the flagships
    # (georender_features/changeset — also cover the round-7 memoized
    # assemble/features planners) and every r7-touched surface:
    # iceberg_snapshots (manifest stats + file-level MERGE),
    # pagerank_hosts/pagerank_dangling/hits_hosts (lazy-chained
    # iteration, AQE-off loop), anchor_terms (vocab cap),
    # webtext_extract/warc_records/geotag_cells (charset cascade +
    # content_type schema + page_id fallback), host_graph_degrees
    # (webgraph module neighbor), mvt_points_tiles (byte-certified
    # flagship of the tiling layer).
    tail = [
        "s5_projected_scan", "f1_tag_classify", "j2_hash_join",
        "j6_two_hop", "a7_distinct", "o5_sorted_topk",
        "pip_polygon_join", "sample_det", "sample_per_group",
        "sample_stratified", "knn_ring_expansion", "knn_h3_rings",
        "h3_boundary_check", "tile_xyz", "cells_hex_s2", "dedup_exact",
        "ngram_jaccard", "token_counts", "text_quality", "lang_id",
        "fingerprint_md5", "fingerprint_rolling", "minhash_lsh",
        "dup_components", "ann_topk", "ann_lsh_topk",
        "multimodal_decode_shapes", "multimodal_decode_pixels",
        "multimodal_audio_decode", "multimodal_video_decode",
        "multimodal_compressed_decode", "multimodal_audio_codecs",
        "multimodal_mjpeg_decode", "multimodal_flac_decode",
        "tile_pyramid", "cocitation_pairs", "host_graph_delta",
        "url_canonical",
    ]
    assert all(t in q for t in tail)
    ordered = {k: v for k, v in q.items() if k not in tail}
    ordered.update({k: q[k] for k in tail})
    return ordered


# --------------------------------------------------------------- oracles

def oracle_sql() -> dict[str, str]:
    edges = _polygon_edges_sql()
    dim_values = ", ".join(f"('{t}', '{c}')" for t, c in _CLASS_DIM)

    return {
        "s1_scan_stats": """
            SELECT l_orderkey % 16 AS bucket,
                   MIN(l_orderkey) AS min_id, MAX(l_orderkey) AS max_id,
                   COUNT(*) AS n
            FROM lineitem GROUP BY 1
        """,
        "s5_projected_scan": f"SELECT * FROM {_POINTS_SQL} p",
        "s11_bbox_query": f"""
            SELECT id, lon, lat FROM {_POINTS_SQL} p
            WHERE lon >= -20.0 AND lon <= 30.0 AND lat >= -20.0 AND lat <= 30.0
        """,
        "f1_tag_classify": f"""
            WITH dim(p_type, tier) AS (VALUES {dim_values})
            SELECT COALESCE(d.tier, 'other') AS tier, COUNT(*) AS n,
                   ROUND(AVG(p_retailprice), 4) AS avg_price
            FROM part p LEFT JOIN dim d USING (p_type)
            GROUP BY 1
        """,
        "f2_filter_drop": """
            SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 0) AS total_price
            FROM lineitem WHERE l_discount > 0.05 AND l_quantity >= 25
        """,
        "j2_hash_join": """
            SELECT c_mktsegment, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 0) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "j4_order_preserving": """
            SELECT l_orderkey,
                   STRING_AGG(l_partkey, ',' ORDER BY l_linenumber, l_partkey) AS partkeys_in_order
            FROM lineitem WHERE l_orderkey % 100 = 0
            GROUP BY 1
        """,
        "j6_two_hop": """
            SELECT n_name, COUNT(*) AS n_items,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "j3_semi_join": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1997-01-01')
        """,
        "j_anti_join": """
            SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY 1
        """,
        "a1_bbox_agg": f"""
            SELECT user_id, MIN(lon) AS minx, MIN(lat) AS miny,
                   MAX(lon) AS maxx, MAX(lat) AS maxy, COUNT(*) AS n
            FROM {_POINTS_SQL} p JOIN events e ON p.id = e.event_id
            GROUP BY 1
        """,
        "a5_counts": """
            SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 0) AS total_value
            FROM events GROUP BY 1
        """,
        "a6_rolling_rate": """
            WITH r AS (
              SELECT user_id,
                     FLOOR(((value - LAG(value) OVER w) /
                     GREATEST(FLOOR(EPOCH(ts))::BIGINT - FLOOR(EPOCH(LAG(ts) OVER w))::BIGINT, 1)
                     ) * 1000000.0)::BIGINT AS rate_micro
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   FLOOR(SUM(rate_micro)::DOUBLE / COUNT(rate_micro))::BIGINT AS avg_rate_micro,
                   COUNT(*) AS n
            FROM r GROUP BY 1
        """,
        "a7_distinct": "SELECT DISTINCT user_id, event_type FROM events",
        "o3_grid_assign": f"""
            SELECT LEAST(GREATEST(CEIL((lon + 180.0) / 45.0)::BIGINT - 1, 0), 7) AS cell_ix,
                   LEAST(GREATEST(CEIL((lat + 90.0) / 45.0)::BIGINT - 1, 0), 3) AS cell_iy,
                   COUNT(*) AS n
            FROM {_POINTS_SQL} p GROUP BY 1, 2
        """,
        "o5_sorted_topk": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
        """,
        # exact twin of tiling.salt_hot_cells: ceil(count/bound) salts on
        # over-cap cells, per-row salt = LCG(id) % n_salts (pure int64
        # arithmetic — the reason the operator is portable)
        "salt_hot_cells": f"""
            WITH cells AS (
              SELECT id,
                     (LEAST(GREATEST(CEIL((lon + 180.0) / 45.0)::BIGINT - 1, 0), 7) * 4
                    + LEAST(GREATEST(CEIL((lat + 90.0) / 45.0)::BIGINT - 1, 0), 3)) AS cell
              FROM {_POINTS_SQL} p
            ),
            hot AS (
              SELECT cell, CAST(CEIL(COUNT(*) / 500.0) AS INT) AS n_salts
              FROM cells GROUP BY cell HAVING COUNT(*) > 500
            )
            SELECT c.id, c.cell,
                   CASE WHEN h.n_salts IS NULL THEN 0
                        ELSE (((c.id % 2147483648) * 1103515245 + 12345)
                              % 2147483648 % h.n_salts)::INT
                   END AS salt
            FROM cells c LEFT JOIN hot h USING (cell)
        """,
        "pip_polygon_join": f"""
            WITH edges(polygon_id, cx, cy, px, py) AS (VALUES {edges})
            SELECT p.id, e.polygon_id
            FROM {_POINTS_SQL} p
            JOIN edges e
              ON ((e.cy > p.lat) != (e.py > p.lat))
             AND p.lon < (e.px - e.cx) * (p.lat - e.cy) / (e.py - e.cy) + e.cx
            GROUP BY p.id, e.polygon_id
            HAVING COUNT(*) % 2 = 1
        """,
        "interval_join": """
            WITH iv AS (
              SELECT event_id AS iv_id, user_id, ts AS start_ts,
                     ts + INTERVAL 2 HOUR AS end_ts
              FROM events WHERE event_id % 11 = 0
            )
            SELECT e.event_id, iv.iv_id
            FROM events e JOIN iv ON e.user_id = iv.user_id
             AND e.ts >= iv.start_ts AND e.ts <= iv.end_ts
        """,
        "sample_det": _sample_det_sql(),
        "sample_per_group": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                     ) AS rn
              FROM documents
            ) WHERE rn <= 30
        """,
        "sample_stratified": _sample_stratified_sql(),
        "pip_grid_join": f"""
            WITH edges(polygon_id, cx, cy, px, py) AS (VALUES {edges})
            SELECT p.id, e.polygon_id
            FROM {_POINTS_SQL} p
            JOIN edges e
              ON ((e.cy > p.lat) != (e.py > p.lat))
             AND p.lon < (e.px - e.cx) * (p.lat - e.cy) / (e.py - e.cy) + e.cx
            GROUP BY p.id, e.polygon_id
            HAVING COUNT(*) % 2 = 1
        """,
        "asof_join": """
            WITH r AS (
              SELECT user_id, ts, MIN(event_id) AS ref_id
              FROM events WHERE event_id % 7 = 0 GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, r.ref_id
            FROM events e ASOF LEFT JOIN r
              ON e.user_id = r.user_id AND e.ts >= r.ts
        """,
        "knn_ring_expansion": f"""
            WITH pts AS (SELECT * FROM {_POINTS_SQL} p),
            qs AS (SELECT id AS qid, lon AS qx, lat AS qy FROM pts WHERE id % 500 = 0),
            d AS (
              SELECT q.qid, p.id,
                     SQRT((p.lon - q.qx)*(p.lon - q.qx) + (p.lat - q.qy)*(p.lat - q.qy)) AS dist_raw
              FROM qs q CROSS JOIN pts p
            ),
            ranked AS (
              SELECT qid, id, dist_raw,
                     ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist_raw ASC, id ASC) AS rank
              FROM d
            )
            SELECT qid, id, ROUND(dist_raw, 6) AS dist, rank
            FROM ranked WHERE rank <= 5
        """,
        "tile_xyz": f"""
            WITH t AS (
              SELECT 6 AS tile_z,
                GREATEST(0, LEAST(63, FLOOR((lon + 180.0) / 360.0 * 64)::BIGINT)) AS tile_x,
                GREATEST(0, LEAST(63, FLOOR(
                  (1.0 - LN(TAN(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat))))
                          + 1.0 / COS(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat)))))
                   / PI()) / 2.0 * 64)::BIGINT)) AS tile_y
              FROM {_POINTS_SQL} p
            )
            SELECT tile_z, tile_x, tile_y, COUNT(*) AS n FROM t GROUP BY 1, 2, 3
        """,
        # the tile_xyz twin fanned out over zooms 0..6: ancestor tile
        # coords are integer right-shifts of the z=6 tile coords
        "tile_pyramid": f"""
            WITH t AS (
              SELECT
                GREATEST(0, LEAST(63, FLOOR((lon + 180.0) / 360.0 * 64)::BIGINT)) AS bx,
                GREATEST(0, LEAST(63, FLOOR(
                  (1.0 - LN(TAN(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat))))
                          + 1.0 / COS(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat)))))
                   / PI()) / 2.0 * 64)::BIGINT)) AS by
              FROM {_POINTS_SQL} p
            ),
            lv AS (SELECT UNNEST(range(0, 7)) AS z)
            SELECT z::INT AS tile_z,
                   (bx // (1::BIGINT << (6 - z)))::INT AS tile_x,
                   (by // (1::BIGINT << (6 - z)))::INT AS tile_y,
                   COUNT(*) AS n
            FROM t, lv GROUP BY 1, 2, 3
        """,
        # exact SQL twin of mvt_tiles' point chain at z=6, extent 4096,
        # buffer 64: projected coords -> buffered tile fan-out (pad =
        # 64/4096 = 1/64) -> float inclusion in [-64, 4160] tile-local
        # units -> floor(x+0.5) quantization; the Spark side decodes the
        # packed MVT payload back to coords, so equality here certifies
        # the encoded bytes, not just the plan
        "mvt_points_tiles": f"""
            WITH p AS (
              SELECT id, (lon + 180.0) / 360.0 AS xn,
                (1.0 - LN(TAN(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat))))
                        + 1.0 / COS(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat)))))
                 / PI()) / 2.0 AS yn
              FROM {_POINTS_SQL} p
            ),
            tx AS (
              SELECT id, xn, yn, UNNEST(RANGE(
                  GREATEST(0, LEAST(63, FLOOR((xn - 1.0/64.0) * 64)::BIGINT)),
                  GREATEST(0, LEAST(63, FLOOR((xn + 1.0/64.0) * 64)::BIGINT)) + 1)) AS tile_x
              FROM p
            ),
            txy AS (
              SELECT id, xn, yn, tile_x, UNNEST(RANGE(
                  GREATEST(0, LEAST(63, FLOOR((yn - 1.0/64.0) * 64)::BIGINT)),
                  GREATEST(0, LEAST(63, FLOOR((yn + 1.0/64.0) * 64)::BIGINT)) + 1)) AS tile_y
              FROM tx
            ),
            loc AS (
              SELECT tile_x, tile_y,
                     xn * 262144.0 - tile_x * 4096.0 AS lx,
                     yn * 262144.0 - tile_y * 4096.0 AS ly
              FROM txy
            )
            SELECT 6 AS tile_z, tile_x::INT AS tile_x, tile_y::INT AS tile_y,
                   COUNT(*) AS n_features,
                   SUM(FLOOR(lx + 0.5)::BIGINT)::BIGINT AS sum_qx,
                   SUM(FLOOR(ly + 0.5)::BIGINT)::BIGINT AS sum_qy
            FROM loc
            WHERE lx >= -64.0 AND lx <= 4160.0 AND ly >= -64.0 AND ly <= 4160.0
            GROUP BY 2, 3
        """,
        "dedup_exact": """
            SELECT source, COUNT(*) AS n_docs,
                   COUNT(DISTINCT md5(text)) AS n_distinct
            FROM documents GROUP BY 1
        """,
        "ngram_jaccard": """
            WITH w AS (
              SELECT doc_id,
                     STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS words
              FROM documents
            ),
            grams AS (
              SELECT doc_id AS doc,
                     UNNEST(LIST_DISTINCT(
                       [ARRAY_TO_STRING(words[i:i+2], ' ')
                        FOR i IN RANGE(1, GREATEST(LEN(words) - 1, 1))]
                     )) AS gram
              FROM w
            ),
            sizes AS (SELECT doc, COUNT(*) AS n_grams FROM grams GROUP BY 1),
            inter AS (
              SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
              FROM grams a JOIN grams b USING (gram)
              WHERE a.doc < b.doc
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   ROUND(common * 1.0 / (sa.n_grams + sb.n_grams - common), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc = doc_a
            JOIN sizes sb ON sb.doc = doc_b
            WHERE common * 1.0 / (sa.n_grams + sb.n_grams - common) >= 0.8
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN TRIM(text) = '' THEN 0
                        ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END AS ws_tokens,
                   LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
            FROM documents
        """,
        "text_quality": _quality_sql(),
        "lang_id": _lang_id_sql(),
        "fingerprint_md5": "SELECT doc_id, md5(text) AS fp FROM documents",
        "minhash_lsh": _minhash_oracle_sql(threshold=0.8),
        "minhash_incremental": f"""
            SELECT * FROM ({_minhash_oracle_sql(threshold=0.8)})
            WHERE doc_a % 5 = 0 OR doc_b % 5 = 0
        """,
        "simhash_dups": _simhash_oracle_sql(max_hamming=3),
        "ann_lsh_topk": _ann_lsh_oracle_sql(
            k=5, n_planes=4, n_probe=5, n_tables=8
        ),
        "dup_components": f"""
            WITH RECURSIVE sp AS ({_simhash_oracle_sql(max_hamming=3)}),
            edges AS (
              SELECT doc_a AS s, doc_b AS d FROM sp
              UNION SELECT doc_b, doc_a FROM sp
            ),
            reach(node, lab) AS (
              SELECT s, s FROM edges
              UNION
              SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
            ),
            comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY 1)
            SELECT doc.doc_id, COALESCE(c.component, doc.doc_id) AS component
            FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        """,
        "dup_components_distributed": f"""
            WITH RECURSIVE sp AS ({_simhash_oracle_sql(max_hamming=3)}),
            edges AS (
              SELECT doc_a AS s, doc_b AS d FROM sp
              UNION SELECT doc_b, doc_a FROM sp
            ),
            reach(node, lab) AS (
              SELECT s, s FROM edges
              UNION
              SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
            ),
            comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY 1)
            SELECT doc.doc_id, COALESCE(c.component, doc.doc_id) AS component
            FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        """,
        "georender_features": _georender_oracle_sql(),
        "georender_changeset": _georender_oracle_sql(_post_changeset_model()),
        "fingerprint_rolling": """
            SELECT doc_id,
              CASE WHEN h >= 9223372036854775808::HUGEINT
                   THEN (h - 18446744073709551616::HUGEINT)::BIGINT
                   ELSE h::BIGINT END AS fp64
            FROM (
              SELECT doc_id,
                CASE WHEN text IS NULL OR length(text) = 0 THEN 0::HUGEINT
                ELSE list_reduce(
                  list_prepend(0::HUGEINT,
                    list_transform(range(1, length(text)+1), i -> ascii(text[i])::HUGEINT)),
                  (acc, b) -> (acc * 1000003::HUGEINT + b) % 18446744073709551616::HUGEINT)
                END AS h
              FROM documents)
        """,
        "cells_hex_s2": f"""
            WITH {_s2_cell_ctes(_POINTS_SQL)}
            SELECT s.id, h.hex_cell, s.s2_cell
            FROM s2cells s JOIN ({_h3_cell_sql(_POINTS_SQL)}) h USING (id)
        """,
        # cellToParent twin: identical bit surgery on the SQL H3 ids
        "h3_rollup": f"""
            SELECT ((hex_cell & ~({0xF << 52}::BIGINT)) | {5 << 52}::BIGINT
                    | {(1 << (3 * (15 - 5))) - 1}::BIGINT) AS h3_res5,
                   COUNT(*) AS n_points
            FROM ({_h3_cell_sql(_POINTS_SQL)})
            GROUP BY 1
        """,
        # same exact cross-join kNN oracle as knn_ring_expansion — the
        # engine side uses the H3-spec grid_disk+cover plan instead of
        # the planar ring grid; the answer contract is identical
        "knn_h3_rings": f"""
            WITH pts AS (SELECT * FROM {_POINTS_SQL} p),
            qs AS (SELECT id AS qid, lon AS qx, lat AS qy FROM pts WHERE id % 500 = 0),
            d AS (
              SELECT q.qid, p.id,
                     SQRT((p.lon - q.qx)*(p.lon - q.qx) + (p.lat - q.qy)*(p.lat - q.qy)) AS dist_raw
              FROM qs q CROSS JOIN pts p
            ),
            ranked AS (
              SELECT qid, id, dist_raw,
                     ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist_raw ASC, id ASC) AS rank
              FROM d
            )
            SELECT qid, id, ROUND(dist_raw, 6) AS dist, rank
            FROM ranked WHERE rank <= 5
        """,
        # the per-cell rollup is the bit-exact twin; the boundary
        # invariant column is the oracle's PREDICTION (TRUE for every
        # cell) that the engine must reproduce by actually building
        # each cell's boundary and round-tripping its centroid
        "h3_boundary_check": f"""
            SELECT ((hex_cell & ~({0xF << 52}::BIGINT)) | {5 << 52}::BIGINT
                    | {(1 << (3 * (15 - 5))) - 1}::BIGINT) AS h3_res5,
                   COUNT(*) AS n_points,
                   TRUE AS boundary_ok
            FROM ({_h3_cell_sql(_POINTS_SQL)})
            GROUP BY 1
        """,
        "vector_tiles": f"""
            WITH t AS (
              SELECT 5 AS tile_z,
                GREATEST(0, LEAST(31, FLOOR((lon + 180.0) / 360.0 * 32)::BIGINT)) AS tile_x,
                GREATEST(0, LEAST(31, FLOOR(
                  (1.0 - LN(TAN(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat))))
                          + 1.0 / COS(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat)))))
                   / PI()) / 2.0 * 32)::BIGINT)) AS tile_y
              FROM {_POINTS_SQL} p
            )
            SELECT tile_z, tile_x, tile_y, COUNT(*) AS n_features
            FROM t GROUP BY 1, 2, 3
        """,
        "raster_tiles": f"""
            WITH t AS (
              SELECT 4 AS tile_z,
                GREATEST(0, LEAST(15, FLOOR((lon + 180.0) / 360.0 * 16)::BIGINT)) AS tile_x,
                GREATEST(0, LEAST(15, FLOOR(
                  (1.0 - LN(TAN(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat))))
                          + 1.0 / COS(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat)))))
                   / PI()) / 2.0 * 16)::BIGINT)) AS tile_y
              FROM {_POINTS_SQL} p
            )
            SELECT tile_z, tile_x, tile_y, 64 AS px, COUNT(*) AS n_points
            FROM t GROUP BY 1, 2, 3
        """,
        "embedding_cosine": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     LIST_INNER_PRODUCT(a.v, b.v)
                     / (SQRT(LIST_INNER_PRODUCT(a.v, a.v)) * SQRT(LIST_INNER_PRODUCT(b.v, b.v))) AS cos_raw
              FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, ROUND(cos_raw, 4) AS cosine
            FROM pairs WHERE cos_raw >= 0.5
        """,
        "ann_topk": """
            WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            qs AS (SELECT vec_id AS qid, v AS q FROM emb WHERE vec_id % 50 = 0),
            d AS (
              SELECT qs.qid, e.vec_id,
                     LIST_INNER_PRODUCT(qs.q, e.v)
                     / (SQRT(LIST_INNER_PRODUCT(qs.q, qs.q)) * SQRT(LIST_INNER_PRODUCT(e.v, e.v))) AS cos_raw
              FROM qs CROSS JOIN emb e
            ),
            ranked AS (
              SELECT qid, vec_id, cos_raw,
                     ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_raw DESC, vec_id ASC) AS rank
              FROM d
            )
            SELECT qid, vec_id, ROUND(cos_raw, 4) AS cosine, rank
            FROM ranked WHERE rank <= 5
        """,
        # closed-form per-frame pixel sums — the SQL twin of
        # synthetic_video_pixels over every (frame, x, y) of every AVI
        "multimodal_video_decode": """
            WITH m AS (
              SELECT i AS media_id,
                     16 + i % 16 AS w, 16 + (i * 7) % 16 AS h,
                     GREATEST((1000 + i % 9000) // 1000, 1) AS nf
              FROM (SELECT UNNEST(range(0, 500)) AS i) WHERE i % 3 = 2
            ),
            px AS (
              SELECT media_id, h, w, t,
                     (x * 7 + y * 13 + media_id + 97 * t) % 256
                   + (x * 3 + y * 5 + 2 * media_id + 59 * t) % 256
                   + (x * 11 + y + 3 * media_id + 31 * t) % 256 AS v
              FROM m, UNNEST(range(0, nf)) AS ut(t),
                   UNNEST(range(0, w)) AS ux(x), UNNEST(range(0, h)) AS uy(y)
            )
            SELECT media_id, t::INT AS frame_idx, h::INT AS height,
                   w::INT AS width, SUM(v)::BIGINT AS checksum
            FROM px GROUP BY media_id, t, h, w
        """,
        # closed-form twin of synthetic_compressed_media: dims from the
        # generator grid; lossless_exact is format-determined (GIF/PNG
        # lossless, JPEG rows all measurably lossy — min per-image max
        # err over the grid is 3); within_tol TRUE everywhere (measured
        # worst 22 vs JPEG_TOL=32, pinned by tests/test_codecs.py)
        "multimodal_compressed_decode": """
            SELECT i AS media_id,
                   CASE i % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'gif'
                        ELSE 'png' END AS fmt,
                   (12 + (i * 5) % 17)::INT AS height,
                   (12 + i % 13)::INT AS width,
                   ((12 + (i * 5) % 17) * (12 + i % 13) * 3)::INT AS n_px,
                   (i % 3 <> 0) AS lossless_exact,
                   TRUE AS within_tol
            FROM (SELECT UNNEST(range(0, 120)) AS i)
        """,
        # closed-form twin of synthetic_webp_media: dims are direct
        # formulas; VP8L is lossless so both verdicts are TRUE
        "multimodal_webp_decode": """
            SELECT i AS media_id,
                   'webp' AS fmt,
                   (9 + (i * 3) % 13)::INT AS height,
                   (10 + i % 11)::INT AS width,
                   ((9 + (i * 3) % 13) * (10 + i % 11) * 3)::INT AS n_px,
                   TRUE AS lossless_exact,
                   TRUE AS within_tol
            FROM (SELECT UNNEST(range(0, 96)) AS i)
        """,
        # closed-form twin of synthetic_codec_audio: n_samples per
        # codec family; payload_bytes pins the exact RIFF layout —
        # G.711: 12 RIFF + 26 fmt(18) + 12 fact + 8 data hdr + n (even)
        # = 58 + n; ADPCM: 12 + 28 fmt(20) + 12 fact + 8 + 256/block
        # = 60 + 256*nb. within_tol TRUE everywhere (triangle source;
        # measured worst: ulaw 510, alaw 256, adpcm 262 — bounds
        # pinned by tests/test_codecs.py)
        "multimodal_audio_codecs": """
            SELECT i AS media_id,
                   CASE i % 3 WHEN 0 THEN 'ulaw' WHEN 1 THEN 'alaw'
                        ELSE 'adpcm' END AS codec,
                   8000 AS sample_rate,
                   (CASE WHEN i % 3 = 2 THEN 505 * (4 + i % 13)
                         ELSE 4000 + 2 * ((i * 97) % 2000)
                    END)::INT AS n_samples,
                   (CASE WHEN i % 3 = 2 THEN 60 + 256 * (4 + i % 13)
                         ELSE 58 + 4000 + 2 * ((i * 97) % 2000)
                    END)::INT AS payload_bytes,
                   TRUE AS within_tol
            FROM (SELECT UNNEST(range(0, 90)) AS i)
        """,
        # closed-form twin of synthetic_mjpeg_media: one row per frame;
        # dims/frame-count/fps are container facts the decode must
        # reproduce exactly; within_tol TRUE everywhere (smooth
        # bilinear frames at q=90; measured worst 13 vs MJPEG_TOL=24,
        # pinned by tests/test_codecs.py)
        "multimodal_mjpeg_decode": """
            WITH m AS (
              SELECT i AS media_id, 16 + i % 13 AS w,
                     16 + (i * 5) % 11 AS h, 2 + i % 4 AS nf
              FROM (SELECT UNNEST(range(0, 60)) AS i)
            )
            SELECT media_id, fi::INT AS frame_idx, 4 AS fps,
                   h::INT AS height, w::INT AS width, TRUE AS within_tol
            FROM m, UNNEST(range(0, nf)) AS u(fi)
        """,
        "multimodal_frames": """
            WITH m AS (
              SELECT i AS media_id, 1000 + i % 9000 AS duration_ms
              FROM (SELECT UNNEST(range(0, 500)) AS i) WHERE i % 3 = 2
            ),
            f AS (
              SELECT media_id,
                     UNNEST(range(0, GREATEST(duration_ms // 1000 - 1, 0) + 1)) AS fi
              FROM m
            )
            SELECT media_id, fi::INT AS frame_idx, (fi * 1000)::INT AS ts_ms FROM f
        """,
        "multimodal_decode_shapes": """
            SELECT i AS media_id,
                   (16 + (i * 7) % 16)::INT AS height,
                   (16 + i % 16)::INT AS width,
                   ((16 + (i * 7) % 16) * (16 + i % 16) * 3)::INT AS n_px
            FROM (SELECT UNNEST(range(0, 500)) AS i) WHERE i % 3 = 0
        """,
        # closed-form twin of operators/multimodal.synthetic_pixels:
        # r=(x*7+y*13+id)%256, g=(x*3+y*5+2id)%256, b=(x*11+y+3id)%256
        # summed over the image grid — pixel-exact vs the real BMP parse
        "multimodal_decode_pixels": """
            WITH m AS (
              SELECT i AS media_id,
                     16 + i % 16 AS w, 16 + (i * 7) % 16 AS h
              FROM (SELECT UNNEST(range(0, 500)) AS i) WHERE i % 3 = 0
            ),
            px AS (
              SELECT media_id, h, w,
                     (x * 7 + y * 13 + media_id) % 256
                   + (x * 3 + y * 5 + 2 * media_id) % 256
                   + (x * 11 + y + 3 * media_id) % 256 AS v
              FROM m, UNNEST(range(0, w)) AS ux(x), UNNEST(range(0, h)) AS uy(y)
            )
            SELECT media_id, h::INT AS height, w::INT AS width,
                   SUM(v)::BIGINT AS checksum
            FROM px GROUP BY media_id, h, w
        """,
        # closed-form twin of synthetic_samples: s=((t*31+17id)%65536)-32768
        # over n = duration_ms * 8000 / 1000 samples
        # closed-form twin of synthetic_warc/build_warc_file: each of
        # the 12 archives holds a warcinfo record then 8 HTTP
        # responses; page ids are file*8 + slot, every 7th page a 404
        "warc_records": """
            WITH f AS (SELECT UNNEST(range(0, 12)) AS fi),
            info AS (
              SELECT printf('warc-%05d', fi) AS warc_file, 0::INT AS rec_idx,
                     'warcinfo' AS warc_type, '' AS url, 0 AS status,
                     'application/warc-fields' AS mime
              FROM f
            ),
            resp AS (
              SELECT printf('warc-%05d', fi) AS warc_file,
                     (k + 1)::INT AS rec_idx, 'response' AS warc_type,
                     'https://example.org/doc/' || (fi * 8 + k) AS url,
                     CASE WHEN (fi * 8 + k) % 7 = 3 THEN 404 ELSE 200
                          END AS status,
                     'text/html' AS mime
              FROM f, UNNEST(range(0, 8)) AS u(k)
            )
            SELECT * FROM info UNION ALL SELECT * FROM resp
        """,
        # closed-form twin of synthetic_page_html: visible words =
        # 2 (h1) + per-paragraph 3+(pid+j)%7 + one word per link;
        # 404 pages have exactly the 2-word "Not Found" body
        "webtext_extract": """
            WITH p AS (SELECT UNNEST(range(0, 96)) AS pid),
            para AS (
              SELECT pid, SUM(3 + (pid + j) % 7) AS pw
              FROM p, UNNEST(range(0, 2 + pid % 4)) AS u(j)
              GROUP BY pid
            )
            SELECT p.pid AS page_id,
                   'https://example.org/doc/' || p.pid AS url,
                   CASE WHEN p.pid % 7 = 3 THEN 404 ELSE 200 END AS status,
                   CASE WHEN p.pid % 7 = 3 THEN '404'
                        ELSE 'Doc ' || p.pid END AS title,
                   (CASE WHEN p.pid % 7 = 3 THEN 0
                         ELSE p.pid % 5 END)::INT AS n_links,
                   (CASE WHEN p.pid % 7 = 3 THEN 2
                         ELSE 2 + p.pid % 5 + para.pw END)::INT AS n_words
            FROM p JOIN para ON para.pid = p.pid
        """,
        # closed-form twin of charset_page + the decode cascade: eight
        # scenarios keyed by pid % 8 (see _CS_MARKS). chr(8220)/(8221)
        # are the cp1252 0x93/0x94 curly quotes; chr(65533) is the
        # U+FFFD the strict-decode failure substitutes. n_words =
        # marker words + 2 ("page" + the id).
        "webtext_charset": """
            WITH p AS (SELECT UNNEST(range(0, 64)) AS pid),
            m AS (
              SELECT pid, pid % 8 AS v,
                     CASE pid % 8
                       WHEN 0 THEN 'café über'
                       WHEN 1 THEN 'café déjà'
                       WHEN 2 THEN '日本語 テスト'
                       WHEN 3 THEN 'Ünïcøde'
                       WHEN 4 THEN chr(8220) || 'naïve' || chr(8221)
                       WHEN 5 THEN 'plain ascii'
                       WHEN 6 THEN 'bad' || chr(65533) || 'byte'
                       ELSE 'mystery bytes' END AS marker
              FROM p
            )
            SELECT pid AS page_id,
                   'https://intl.example.org/doc/' || pid AS url,
                   CASE v WHEN 1 THEN 'windows-1252'
                          WHEN 2 THEN 'shift_jis'
                          WHEN 3 THEN 'utf-16le'
                          WHEN 4 THEN 'windows-1252'
                          ELSE 'utf-8' END AS charset,
                   CASE v WHEN 2 THEN 'meta' WHEN 3 THEN 'bom'
                          WHEN 5 THEN 'default' WHEN 7 THEN 'default'
                          ELSE 'header' END AS charset_source,
                   (CASE WHEN v = 6 THEN 0 ELSE 1 END)::INT AS decode_ok,
                   'C' || pid AS title,
                   (length(marker) - length(replace(marker, ' ', ''))
                    + 3)::INT AS n_words,
                   marker || ' page ' || pid AS text
            FROM m
        """,
        # closed-form twin of boilerplate_page_html + the LOCAL block
        # classifier: blocks = nav + h1 + P paragraphs + short note +
        # link farm + aside + footer (P = 2 + i%4); content = h1 + the
        # P paragraphs; paragraph j carries 10 + (i+j)%8 words; total
        # words add the nav links (2 + i%3), note (3), farm
        # (4 + 5 + i%3), aside (12) and footer (3)
        "main_content": """
            WITH p AS (SELECT UNNEST(range(0, 400)) AS i),
            cw AS (
              SELECT p.i, SUM(10 + (p.i + j.j) % 8) AS para_words
              FROM p, (SELECT UNNEST(range(0, 5)) AS j) j
              WHERE j.j < 2 + p.i % 4
              GROUP BY p.i
            )
            SELECT i AS page_id,
                   (2 + i % 4 + 6)::INT AS n_blocks,
                   (2 + i % 4 + 1)::INT AS n_content_blocks,
                   ((2 + i % 3) + 3 + para_words + 3 + (9 + i % 3)
                    + 12 + 3)::INT AS n_words,
                   (3 + para_words)::INT AS n_content_words
            FROM cw
        """,
        # closed-form twin of wet_page_text over 12 files × 8 pages:
        # text = 'Doc {i}\\n' + (4 + i%6) tokens 't{i}x{k}' + '\\n';
        # with L = digits(i) and c = 4 + i%6 (k is single-digit),
        # n_chars = 5 + L + c*(4 + L)
        "wet_extract": """
            WITH p AS (SELECT UNNEST(range(0, 96)) AS i),
            w AS (
              SELECT p.i,
                     string_agg('t' || p.i || 'x' || j.j, ' '
                                ORDER BY j.j) AS words
              FROM p, (SELECT UNNEST(range(0, 10)) AS j) j
              WHERE j.j < 4 + p.i % 6
              GROUP BY p.i
            )
            SELECT i AS page_id,
                   'https://example.org/doc/' || i AS url,
                   (5 + length(i::VARCHAR)
                      + (4 + i % 6) * (4 + length(i::VARCHAR)))::INT
                     AS n_chars,
                   (2 + 4 + i % 6)::INT AS n_words,
                   'Doc ' || i || chr(10) || words || chr(10) AS text
            FROM w
        """,
        # closed-form twin of webgraph._raw_url / canonical_url: the
        # messy synthetic urls canonicalize to exactly this arithmetic
        # (scheme/host lower-cased, :443 and #frag stripped,
        # utm_source dropped, a=1&b=N sorted; i%4==3 pages carry no
        # query at all)
        "url_canonical": """
            WITH p AS (SELECT UNNEST(range(0, 600)) AS i)
            SELECT i AS page_id,
                   'https://host' || (i % 37) || '.example.org/p/' || i ||
                     CASE WHEN i % 4 = 3 THEN ''
                          ELSE '?a=1&b=' || (i % 5) END AS canon_url,
                   'host' || (i % 37) || '.example.org' AS canon_host,
                   'org,example,host' || (i % 37) AS surt_key
            FROM p
        """,
        # closed-form twin of webgraph.link_targets: page i emits
        # 1 + i%3 cross-host links (offset 1 + (i*3+k*7)%36 — never
        # 0 mod 37, so no self-loop); the /local same-host links on
        # every 6th page must NOT appear as edges
        "host_graph_degrees": """
            WITH p AS (SELECT UNNEST(range(0, 600)) AS i),
            e AS (
              SELECT 'host' || (i % 37) || '.example.org' AS src,
                     'host' || (((i % 37) + 1 + (i*3 + k*7) % 36) % 37)
                       || '.example.org' AS dst
              FROM p, UNNEST(range(0, 1 + i % 3)) AS u(k)
            ),
            o AS (SELECT src AS host, COUNT(*) AS out_links,
                         COUNT(DISTINCT dst) AS out_hosts
                  FROM e GROUP BY 1),
            n AS (SELECT dst AS host, COUNT(*) AS in_links,
                         COUNT(DISTINCT src) AS in_hosts
                  FROM e GROUP BY 1)
            SELECT host,
                   COALESCE(out_links, 0) AS out_links,
                   COALESCE(out_hosts, 0) AS out_hosts,
                   COALESCE(in_links, 0) AS in_links,
                   COALESCE(in_hosts, 0) AS in_hosts
            FROM o FULL OUTER JOIN n USING (host)
        """,
        # the SAME 3 damped iterations pagerank() runs, unrolled as
        # CTEs. Every float literal is cast to DOUBLE *before*
        # arithmetic — bare 0.15/37 is DECIMAL division in DuckDB and
        # diverges from the engine's IEEE value. 6-dp rounding on both
        # sides absorbs float-sum ordering (~1e-16).
        "pagerank_hosts": """
            WITH p AS (SELECT UNNEST(range(0, 600)) AS i),
            e0 AS (
              SELECT 'host' || (i % 37) || '.example.org' AS src,
                     'host' || (((i % 37) + 1 + (i*3 + k*7) % 36) % 37)
                       || '.example.org' AS dst
              FROM p, UNNEST(range(0, 1 + i % 3)) AS u(k)
            ),
            ew AS (SELECT src, dst, COUNT(*) AS w FROM e0 GROUP BY 1, 2),
            ow AS (SELECT src, SUM(w) AS ow FROM ew GROUP BY 1),
            t AS (SELECT ew.src, ew.dst,
                         ew.w::DOUBLE / ow.ow::DOUBLE AS pp
                  FROM ew JOIN ow USING (src)),
            nodes AS (SELECT DISTINCT src AS h FROM e0
                      UNION SELECT DISTINCT dst FROM e0),
            r0 AS (SELECT h, 1.0::DOUBLE / 37 AS r FROM nodes),
            r1 AS (SELECT n.h, 0.15::DOUBLE / 37
                         + 0.85::DOUBLE * COALESCE(SUM(r0.r * t.pp), 0) AS r
                   FROM nodes n LEFT JOIN t ON t.dst = n.h
                   LEFT JOIN r0 ON r0.h = t.src GROUP BY n.h),
            r2 AS (SELECT n.h, 0.15::DOUBLE / 37
                         + 0.85::DOUBLE * COALESCE(SUM(r1.r * t.pp), 0) AS r
                   FROM nodes n LEFT JOIN t ON t.dst = n.h
                   LEFT JOIN r1 ON r1.h = t.src GROUP BY n.h),
            r3 AS (SELECT n.h, 0.15::DOUBLE / 37
                         + 0.85::DOUBLE * COALESCE(SUM(r2.r * t.pp), 0) AS r
                   FROM nodes n LEFT JOIN t ON t.dst = n.h
                   LEFT JOIN r2 ON r2.h = t.src GROUP BY n.h)
            SELECT h AS host, ROUND(r, 6) AS pr FROM r3
        """,
        # the SAME 2 L2-normalized HITS iterations hits() runs,
        # half-step by half-step; norms are scalar subqueries over the
        # previous CTE, zero-guarded like the engine's when(_n2 > 0)
        "hits_hosts": """
            WITH p AS (SELECT UNNEST(range(0, 600)) AS i),
            e0 AS (
              SELECT 'host' || (i % 37) || '.example.org' AS src,
                     'host' || (((i % 37) + 1 + (i*3 + k*7) % 36) % 37)
                       || '.example.org' AS dst
              FROM p, UNNEST(range(0, 1 + i % 3)) AS u(k)
            ),
            ew AS (SELECT src, dst, COUNT(*)::DOUBLE AS w
                   FROM e0 GROUP BY 1, 2),
            nodes AS (SELECT DISTINCT src AS h FROM e0
                      UNION SELECT DISTINCT dst FROM e0),
            h0 AS (SELECT h, 1.0::DOUBLE AS v FROM nodes),
            a1r AS (SELECT n.h, COALESCE(SUM(ew.w * h0.v), 0) AS v
                    FROM nodes n LEFT JOIN ew ON ew.dst = n.h
                    LEFT JOIN h0 ON h0.h = ew.src GROUP BY n.h),
            a1 AS (SELECT h, CASE WHEN n2 > 0 THEN v / n2 ELSE 0 END AS v
                   FROM a1r, (SELECT SQRT(SUM(v*v)) AS n2 FROM a1r)),
            h1r AS (SELECT n.h, COALESCE(SUM(ew.w * a1.v), 0) AS v
                    FROM nodes n LEFT JOIN ew ON ew.src = n.h
                    LEFT JOIN a1 ON a1.h = ew.dst GROUP BY n.h),
            h1 AS (SELECT h, CASE WHEN n2 > 0 THEN v / n2 ELSE 0 END AS v
                   FROM h1r, (SELECT SQRT(SUM(v*v)) AS n2 FROM h1r)),
            a2r AS (SELECT n.h, COALESCE(SUM(ew.w * h1.v), 0) AS v
                    FROM nodes n LEFT JOIN ew ON ew.dst = n.h
                    LEFT JOIN h1 ON h1.h = ew.src GROUP BY n.h),
            a2 AS (SELECT h, CASE WHEN n2 > 0 THEN v / n2 ELSE 0 END AS v
                   FROM a2r, (SELECT SQRT(SUM(v*v)) AS n2 FROM a2r)),
            h2r AS (SELECT n.h, COALESCE(SUM(ew.w * a2.v), 0) AS v
                    FROM nodes n LEFT JOIN ew ON ew.src = n.h
                    LEFT JOIN a2 ON a2.h = ew.dst GROUP BY n.h),
            h2 AS (SELECT h, CASE WHEN n2 > 0 THEN v / n2 ELSE 0 END AS v
                   FROM h2r, (SELECT SQRT(SUM(v*v)) AS n2 FROM h2r))
            SELECT a2.h AS host, ROUND(a2.v, 6) AS authority,
                   ROUND(h2.v, 6) AS hub
            FROM a2 JOIN h2 ON h2.h = a2.h
        """,
        # closed-form twin of the anchor rollup: page i's k-th
        # cross-host link carries anchor 't'||k; the same-host /local
        # links (i%6==0) are NOT in the k-loop, mirroring the
        # engine's cross-host filter
        "anchor_terms": """
            WITH p AS (SELECT UNNEST(range(0, 600)) AS i),
            l AS (
              SELECT 'host' || (((i % 37) + 1 + (i*3 + k*7) % 36) % 37)
                       || '.example.org' AS dst_host,
                     't' || k AS term
              FROM p, UNNEST(range(0, 1 + i % 3)) AS u(k)
            ),
            c AS (SELECT dst_host, term, COUNT(*) AS n
                  FROM l GROUP BY 1, 2),
            r AS (SELECT dst_host, term, n,
                         ROW_NUMBER() OVER (PARTITION BY dst_host
                                            ORDER BY n DESC, term)
                           AS rank
                  FROM c)
            SELECT dst_host, term, n::BIGINT AS n, rank::INT AS rank
            FROM r WHERE rank <= 3
        """,
        # from-scratch rebuild over the surviving page set
        # ([0,600) minus [100,200), plus [600,660)) — what the
        # engine's incremental merge must be indistinguishable from.
        # Host targets depend only on (i, k), never on the corpus
        # size, so one closed form covers base and added pages
        "host_graph_delta": """
            WITH p AS (SELECT UNNEST(range(0, 660)) AS i),
            keep AS (SELECT i FROM p WHERE i < 100 OR i >= 200),
            e0 AS (
              SELECT 'host' || (i % 37) || '.example.org' AS src,
                     'host' || (((i % 37) + 1 + (i*3 + k*7) % 36) % 37)
                       || '.example.org' AS dst
              FROM keep, UNNEST(range(0, 1 + i % 3)) AS u(k)
            )
            SELECT src AS src_host, dst AS dst_host,
                   COUNT(*)::BIGINT AS weight
            FROM e0 GROUP BY 1, 2
        """,
        # co-citation over the DISTINCT closed-form host edges:
        # canonical host_a < host_b pairs sharing >= 2 citing hosts
        "cocitation_pairs": """
            WITH p AS (SELECT UNNEST(range(0, 600)) AS i),
            e0 AS (
              SELECT DISTINCT 'host' || (i % 37) || '.example.org' AS src,
                     'host' || (((i % 37) + 1 + (i*3 + k*7) % 36) % 37)
                       || '.example.org' AS dst
              FROM p, UNNEST(range(0, 1 + i % 3)) AS u(k)
            )
            SELECT a.dst AS host_a, b.dst AS host_b,
                   COUNT(*)::BIGINT AS n
            FROM e0 a JOIN e0 b ON a.src = b.src AND a.dst < b.dst
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """,
        # canonical (mass-conserving) PageRank: hosts 35/36 dangling,
        # per-iteration dangling mass dm_t redistributed as
        # 0.85·dm/N — the term order mirrors the engine's
        # (base + d·Σc) + (d·dm)/N association exactly
        "pagerank_dangling": """
            WITH p AS (SELECT UNNEST(range(0, 600)) AS i),
            e0 AS (
              SELECT 'host' || (i % 37) || '.example.org' AS src,
                     'host' || (((i % 37) + 1 + (i*3 + k*7) % 36) % 37)
                       || '.example.org' AS dst
              FROM p, UNNEST(range(0, 1 + i % 3)) AS u(k)
              WHERE (i % 37) NOT IN (35, 36)
            ),
            ew AS (SELECT src, dst, COUNT(*) AS w FROM e0 GROUP BY 1, 2),
            ow AS (SELECT src, SUM(w) AS ow FROM ew GROUP BY 1),
            t AS (SELECT ew.src, ew.dst,
                         ew.w::DOUBLE / ow.ow::DOUBLE AS pp
                  FROM ew JOIN ow USING (src)),
            nodes AS (SELECT DISTINCT src AS h FROM e0
                      UNION SELECT DISTINCT dst FROM e0),
            nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
            srcs AS (SELECT DISTINCT src AS h FROM ew),
            r0 AS (SELECT h, 1.0::DOUBLE / (SELECT n FROM nn) AS r
                   FROM nodes),
            d0 AS (SELECT COALESCE(SUM(r), 0)::DOUBLE AS dm FROM r0
                   WHERE h NOT IN (SELECT h FROM srcs)),
            r1 AS (SELECT n.h, 0.15::DOUBLE / (SELECT n FROM nn)
                         + 0.85::DOUBLE * COALESCE(SUM(r0.r * t.pp), 0)
                         + 0.85::DOUBLE * (SELECT dm FROM d0)
                           / (SELECT n FROM nn) AS r
                   FROM nodes n LEFT JOIN t ON t.dst = n.h
                   LEFT JOIN r0 ON r0.h = t.src GROUP BY n.h),
            d1 AS (SELECT COALESCE(SUM(r), 0)::DOUBLE AS dm FROM r1
                   WHERE h NOT IN (SELECT h FROM srcs)),
            r2 AS (SELECT n.h, 0.15::DOUBLE / (SELECT n FROM nn)
                         + 0.85::DOUBLE * COALESCE(SUM(r1.r * t.pp), 0)
                         + 0.85::DOUBLE * (SELECT dm FROM d1)
                           / (SELECT n FROM nn) AS r
                   FROM nodes n LEFT JOIN t ON t.dst = n.h
                   LEFT JOIN r1 ON r1.h = t.src GROUP BY n.h),
            d2 AS (SELECT COALESCE(SUM(r), 0)::DOUBLE AS dm FROM r2
                   WHERE h NOT IN (SELECT h FROM srcs)),
            r3 AS (SELECT n.h, 0.15::DOUBLE / (SELECT n FROM nn)
                         + 0.85::DOUBLE * COALESCE(SUM(r2.r * t.pp), 0)
                         + 0.85::DOUBLE * (SELECT dm FROM d2)
                           / (SELECT n FROM nn) AS r
                   FROM nodes n LEFT JOIN t ON t.dst = n.h
                   LEFT JOIN r2 ON r2.h = t.src GROUP BY n.h)
            SELECT h AS host, ROUND(r, 6) AS pr FROM r3
        """,
        # closed-form twin of synthetic_geotagged_pages +
        # geotag_points: pages i%3==2 carry no geo meta and i%21==6
        # is malformed ("here;there") — both excluded; the rest carry
        # exact quarter-degree coordinates run through the bit-exact
        # SQL H3 twin (same machinery as h3_rollup)
        "geotag_cells": f"""
            SELECT hex_cell, COUNT(*) AS n_pages, MIN(id) AS min_page
            FROM ({_h3_cell_sql(
                "(SELECT i AS id, "
                "((i*73)%1361)/4.0 - 170.0 AS lon, "
                "((i*37)%641)/4.0 - 80.0 AS lat "
                "FROM (SELECT UNNEST(range(0, 500)) AS i) "
                "WHERE i % 3 <> 2 AND i % 21 <> 6)")})
            GROUP BY 1
        """,
        # closed-form twin of synthetic_flac_audio: the PCM sawtooth
        # summed exactly — FLAC is lossless so lossless_exact is TRUE
        # everywhere and the checksum has no tolerance slack
        "multimodal_flac_decode": """
            WITH m AS (
              SELECT i AS media_id, 6000 + (i * 389) % 6000 AS n
              FROM (SELECT UNNEST(range(0, 80)) AS i)
            ),
            s AS (
              SELECT media_id, n,
                     ((t * 31 + media_id * 17) % 65536) - 32768 AS v
              FROM m, UNNEST(range(0, n)) AS ut(t)
            )
            SELECT media_id, 8000 AS sample_rate, n::INT AS n_samples,
                   SUM(v)::BIGINT AS checksum, TRUE AS lossless_exact
            FROM s GROUP BY media_id, n
        """,
        "multimodal_audio_decode": """
            WITH m AS (
              SELECT i AS media_id,
                     (1000 + i % 9000) * 8 AS n
              FROM (SELECT UNNEST(range(0, 500)) AS i) WHERE i % 3 = 1
            ),
            s AS (
              SELECT media_id, n,
                     ((t * 31 + media_id * 17) % 65536) - 32768 AS v
              FROM m, UNNEST(range(0, n)) AS ut(t)
            )
            SELECT media_id, 8000 AS sample_rate, n::BIGINT AS n_samples,
                   SUM(v)::BIGINT AS checksum
            FROM s GROUP BY media_id, n
        """,
        # closed-form: snap0 append 10 rows; snap1 append 15 (carry);
        # snap2 overwrite 15 − 5 deleted evens + 2 inserted = 12
        # closed-form chain facts: snapshot live sets are 0..9 /
        # 0..14 / {odds<10} ∪ 10..14 ∪ {100,101}; min/max come from
        # decoded manifest bounds, sum_vc from the value_counts maps
        # (== live rows), and n_ge100 from the stats-pruned read of
        # the current snapshot (the two merge-inserted rows)
        "iceberg_snapshots": """
            SELECT * FROM (VALUES
                (0, 'append',    10::BIGINT, 12::BIGINT,
                 0::BIGINT,  9::BIGINT, 10::BIGINT, 2::BIGINT),
                (1, 'append',    15::BIGINT, 12::BIGINT,
                 0::BIGINT, 14::BIGINT, 15::BIGINT, 2::BIGINT),
                (2, 'overwrite', 12::BIGINT, 12::BIGINT,
                 1::BIGINT, 101::BIGINT, 12::BIGINT, 2::BIGINT)
            ) AS t(ordinal, operation, n_rows, n_current,
                   min_k, max_k, sum_vc, n_ge100)
        """,
        "retile_incremental": f"""
            WITH base AS (SELECT id, lon, lat FROM {_POINTS_SQL} p),
            surv AS (
              SELECT id,
                     CASE WHEN id % 31 = 0
                          THEN ((lon + 7.3 + 180.0) % 360.0) - 180.0
                          ELSE lon END AS lon,
                     lat
              FROM base WHERE id % 97 <> 0
            ),
            created AS (
              SELECT id + 1000000000 AS id,
                     ((lon + 1.7 + 180.0) % 360.0) - 180.0 AS lon, lat
              FROM base WHERE id % 53 = 0
            ),
            newf AS (SELECT * FROM surv UNION ALL SELECT * FROM created),
            t AS (
              SELECT 5 AS tile_z,
                GREATEST(0, LEAST(31, FLOOR((lon + 180.0) / 360.0 * 32)::BIGINT)) AS tile_x,
                GREATEST(0, LEAST(31, FLOOR(
                  (1.0 - LN(TAN(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat))))
                          + 1.0 / COS(RADIANS(GREATEST(-85.05112878, LEAST(85.05112878, lat)))))
                   / PI()) / 2.0 * 32)::BIGINT)) AS tile_y
              FROM newf
            )
            SELECT tile_z, tile_x, tile_y, COUNT(*) AS n_features
            FROM t GROUP BY 1, 2, 3
        """,
        "event_windows": """
            SELECT (FLOOR(FLOOR(EPOCH(ts)) / 3600) * 3600)::BIGINT AS window_epoch,
                   event_type, COUNT(*) AS n, ROUND(SUM(value), 0) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 0) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 0) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "tpch_q3_topk": """
            SELECT o_orderkey, o_orderdate,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY 1, 2
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        """,
        "tpch_q5ish": """
            SELECT r_name, COUNT(*) AS n_items,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey
            GROUP BY 1
        """,
        "set_ops": """
            WITH with_orders AS (
              SELECT DISTINCT c_custkey FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ),
            building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            SELECT 0 AS row_id,
              (SELECT COUNT(*) FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM with_orders)) AS union_n,
              (SELECT COUNT(*) FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM with_orders)) AS intersect_n,
              (SELECT COUNT(*) FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM with_orders)) AS except_n
        """,
        "rollup_agg": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   ROUND(SUM(l_quantity), 0) AS qty
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "having_filter": """
            SELECT o_custkey, COUNT(*) AS n_orders FROM orders
            GROUP BY 1 HAVING COUNT(*) >= 20
        """,
        "subquery_in": """
            SELECT o_orderpriority, COUNT(*) AS n FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
            GROUP BY 1
        """,
        "pivot_case": """
            SELECT o_orderstatus,
                   SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS n_1,
                   SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)::BIGINT AS n_2,
                   SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)::BIGINT AS n_3
            FROM orders GROUP BY 1
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     FLOOR(EPOCH(ts))::BIGINT - FLOOR(EPOCH(LAG(ts) OVER w))::BIGINT AS gap
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
              SELECT user_id,
                     SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM g
            )
            SELECT user_id, MAX(session_id)::BIGINT AS n_sessions, COUNT(*) AS n_events
            FROM s GROUP BY 1
        """,
        "window_running_sum": """
            SELECT o_custkey, o_orderkey,
                   ROUND(SUM(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 2) AS running_total
            FROM orders WHERE o_custkey % 10 = 0
        """,
    }


def _sample_det_sql() -> str:
    """Twin of operators.sampling.sample_deterministic(p=0.25, doc_id):
    thresholds come from the SAME helper, so quantization is shared."""
    from ingest_spark.operators.sampling import _hex_threshold

    return f"""
        SELECT doc_id, source FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_hex_threshold(0.25)}'
    """


def _sample_stratified_sql() -> str:
    from ingest_spark.operators.sampling import _hex_threshold

    rates = {"click": 0.1, "view": 0.5, "purchase": 1.0}
    vals = ",".join(f"('{k}','{_hex_threshold(v)}')" for k, v in sorted(rates.items()))
    return f"""
        WITH cuts(event_type, cut) AS (VALUES {vals})
        SELECT e.event_type, COUNT(*) AS n_kept
        FROM events e LEFT JOIN cuts c USING (event_type)
        WHERE substring(md5(CAST(e.event_id AS VARCHAR)), 1, 8)
              < COALESCE(c.cut, '{_hex_threshold(0.02)}')
        GROUP BY 1
    """


def _quality_sql() -> str:
    """DuckDB twin of functions.text.quality_score + ratios."""
    words = "STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '[^a-z]+', ' ', 'g')), ' ')"
    letters = "LENGTH(REGEXP_REPLACE(LOWER(text), '[^a-z]', '', 'g'))"
    stop_en = "', '".join(
        ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "are")
    )
    stop_hits = f"LEN(LIST_FILTER({words}, x -> x IN ('{stop_en}')))"
    n_words = f"GREATEST(LEN({words}), 1)"
    punct = (
        "(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?''\"()\\[\\]{}-]', '', 'g')))"
        " * 1.0 / GREATEST(LENGTH(text), 1)"
    )
    digit = (
        "(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')))"
        " * 1.0 / GREATEST(LENGTH(text), 1)"
    )
    mean_wl = f"{letters} * 1.0 / {n_words}"
    stop_ratio = f"{stop_hits} * 1.0 / {n_words}"
    return f"""
        SELECT doc_id,
          (CASE WHEN LENGTH(text) >= 100 AND LENGTH(text) <= 20000 THEN 0.25 ELSE 0.0 END
           + CASE WHEN {mean_wl} >= 3.0 AND {mean_wl} <= 10.0 THEN 0.25 ELSE 0.0 END
           + CASE WHEN {stop_ratio} >= 0.05 THEN 0.25 ELSE 0.0 END
           + CASE WHEN {punct} <= 0.2 AND {digit} <= 0.3 THEN 0.25 ELSE 0.0 END
          ) AS quality,
          ROUND({stop_ratio}, 4) AS stop_ratio,
          ROUND({punct}, 4) AS punct_ratio
        FROM documents
    """


def _lang_id_sql() -> str:
    """DuckDB twin of functions.text.lang_id (stopword vote, ties →
    first language alphabetically, zero evidence → 'und')."""
    from ingest_spark.functions.text import STOPWORDS

    words = "STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '[^a-z]+', ' ', 'g')), ' ')"
    counts = {
        lang: f"LEN(LIST_FILTER({words}, x -> x IN ({', '.join(repr(w) for w in sw)})))"
        for lang, sw in STOPWORDS.items()
    }
    best = "GREATEST(" + ", ".join(f"c_{lang}" for lang in counts) + ")"
    case = "CASE " + " ".join(
        f"WHEN best > 0 AND c_{lang} = best THEN '{lang}'" for lang in sorted(counts)
    ) + " ELSE 'und' END"
    selects = ", ".join(f"{expr} AS c_{lang}" for lang, expr in counts.items())
    return f"""
        WITH c AS (SELECT doc_id, {selects} FROM documents),
        b AS (SELECT doc_id, {best} AS best, * FROM c)
        SELECT doc_id, {case} AS lang_guess FROM b
    """
