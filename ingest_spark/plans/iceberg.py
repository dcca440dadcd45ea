"""Iceberg-spec table metadata backend — a real commit path, no jars.

`IcebergMetadataBackend` is the third `SnapshotBackend` implementation
(alongside the parquet-rename and snapshot-dir backends in
checkpoint.py) and writes the PUBLIC Apache Iceberg table spec (v2)
metadata layout byte-for-byte in pure Python:

- ``metadata/v{N}.metadata.json`` — format-version 2 table metadata:
  table-uuid, schemas (Spark schema → Iceberg JSON schema with field
  ids), partition-specs (identity transforms), snapshots with
  operation summaries, snapshot-log, metadata-log, refs (main branch).
- ``metadata/snap-{snapshot-id}-1-{commit-uuid}.avro`` — the manifest
  LIST: real Avro OCF records with the spec's field ids
  (manifest_path/500, manifest_length/501, …, added_rows_count/512).
- ``metadata/{commit-uuid}-m0.avro`` — the manifest FILE: one
  manifest_entry record per data file (status, snapshot_id,
  sequence_number, data_file struct with content/file_path/
  file_format/partition/record_count/file_size_in_bytes).
- ``metadata/version-hint.text`` — the HadoopCatalog current-version
  hint.
- ``data/…parquet`` — immutable data files (moved from a Spark
  staging write; never rewritten in place).

The COMMIT PROTOCOL is the published HadoopTableOperations one:
metadata is written to a temp file and published with an atomic
fail-if-exists link to ``v{N}.metadata.json`` — two racing writers
can both stage, but only one wins version N; the loser re-reads and
retries against N+1 (optimistic concurrency, exercised in
test_iceberg.py). Reads resolve current metadata → snapshot →
manifest list → manifests → live data files, so snapshot isolation
and time travel (``read_snapshot``) come from the metadata chain
itself, exactly as on a real cluster catalog.

The deliberate deviations from a jar-backed deployment, documented
rather than hidden: manifests use the null Avro codec (spec-legal;
real writers usually deflate), optional column-stats fields are
omitted (spec-optional), and `merge_overwrite` is a whole-table
copy-on-write "overwrite" commit (the engine's MERGE granularity —
a file-level overwrite would need the row-group stats we don't
collect). Reference analog: the scan-resume story this feeds is
src/bin.rs:55-142 (SURVEY §3.2).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ingest_spark.functions import avro
from ingest_spark.plans.checkpoint import SnapshotBackend

FORMAT_VERSION = 2
MAIN_BRANCH = "main"

# ---------------------------------------------- schema conversion

_PRIMITIVES = {
    T.LongType: "long", T.IntegerType: "int", T.ShortType: "int",
    T.ByteType: "int", T.StringType: "string", T.DoubleType: "double",
    T.FloatType: "float", T.BooleanType: "boolean", T.BinaryType: "binary",
    T.DateType: "date", T.TimestampType: "timestamptz",
}


def _iceberg_type(dt: T.DataType, next_id: list) -> object:
    for cls, name in _PRIMITIVES.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        eid = next_id[0]
        next_id[0] += 1
        return {
            "type": "list", "element-id": eid,
            "element": _iceberg_type(dt.elementType, next_id),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid, vid = next_id[0], next_id[0] + 1
        next_id[0] += 2
        return {
            "type": "map", "key-id": kid,
            "key": _iceberg_type(dt.keyType, next_id),
            "value-id": vid,
            "value": _iceberg_type(dt.valueType, next_id),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = next_id[0]
            next_id[0] += 1
            fields.append({
                "id": fid, "name": f.name, "required": not f.nullable,
                "type": _iceberg_type(f.dataType, next_id),
            })
        return {"type": "struct", "fields": fields}
    raise NotImplementedError(f"no Iceberg mapping for {dt}")


def spark_schema_to_iceberg(schema: T.StructType) -> dict:
    """Spark StructType → Iceberg JSON schema with assigned field ids."""
    next_id = [1]
    fields = []
    for f in schema.fields:
        fid = next_id[0]
        next_id[0] += 1
        fields.append({
            "id": fid, "name": f.name, "required": not f.nullable,
            "type": _iceberg_type(f.dataType, next_id),
        })
    return {
        "type": "struct", "schema-id": 0, "fields": fields,
        "last-column-id": next_id[0] - 1,
    }


# ------------------------------------------------- manifest schemas

def _field(name, ftype, fid, optional=False):
    f = {"name": name, "type": ["null", ftype] if optional else ftype,
         "field-id": fid}
    if optional:
        f["default"] = None
    return f


MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        _field("manifest_path", "string", 500),
        _field("manifest_length", "long", 501),
        _field("partition_spec_id", "int", 502),
        _field("content", "int", 517),
        _field("sequence_number", "long", 515),
        _field("min_sequence_number", "long", 516),
        _field("added_snapshot_id", "long", 503),
        _field("added_files_count", "int", 504),
        _field("existing_files_count", "int", 505),
        _field("deleted_files_count", "int", 506),
        _field("added_rows_count", "long", 512),
        _field("existing_rows_count", "long", 513),
        _field("deleted_rows_count", "long", 514),
    ],
}

# manifest_entry.status values (spec)
STATUS_EXISTING, STATUS_ADDED, STATUS_DELETED = 0, 1, 2
# data_file.content values (spec)
CONTENT_DATA = 0


def _manifest_entry_schema(partition_fields: list) -> dict:
    part_schema = {
        "type": "record", "name": "r102",
        "fields": partition_fields or [],
    }
    data_file = {
        "type": "record", "name": "r2", "fields": [
            _field("content", "int", 134),
            _field("file_path", "string", 100),
            _field("file_format", "string", 101),
            {"name": "partition", "type": part_schema, "field-id": 102},
            _field("record_count", "long", 103),
            _field("file_size_in_bytes", "long", 104),
        ],
    }
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            _field("status", "int", 0),
            _field("snapshot_id", "long", 1, optional=True),
            _field("sequence_number", "long", 3, optional=True),
            _field("file_sequence_number", "long", 4, optional=True),
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


_PART_AVRO = {"long": "long", "int": "int", "string": "string",
              "double": "double", "boolean": "boolean"}


class CommitConflict(Exception):
    """Another writer published this metadata version first."""


class IcebergMetadataBackend(SnapshotBackend):
    """SnapshotBackend writing the Iceberg v2 metadata layout (module
    docstring has the full contract)."""

    def __init__(self, max_retries: int = 3):
        self.max_retries = max_retries

    # ------------------------------------------------ path helpers

    def _meta_dir(self, path: str) -> str:
        return os.path.join(path, "metadata")

    def _versions(self, path: str) -> list:
        pat = os.path.join(self._meta_dir(path), "v*.metadata.json")
        out = []
        for p in glob.glob(pat):
            stem = os.path.basename(p).split(".", 1)[0][1:]
            if stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def current_metadata(self, path: str) -> "dict | None":
        vs = self._versions(path)
        if not vs:
            return None
        with open(os.path.join(
                self._meta_dir(path), f"v{vs[-1]}.metadata.json")) as f:
            md = json.load(f)
        md["_version"] = vs[-1]
        return md

    # ------------------------------------------------ commit protocol

    def _publish(self, path: str, md: dict) -> int:
        """Write metadata as the next version with an atomic
        fail-if-exists link (the HadoopTableOperations protocol).
        Raises CommitConflict if a racer won the version."""
        meta = self._meta_dir(path)
        os.makedirs(meta, exist_ok=True)
        version = (self._versions(path)[-1] + 1) if self._versions(path) else 1
        md = {k: v for k, v in md.items() if not k.startswith("_")}
        tmp = os.path.join(meta, f".tmp-{_uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(md, f, indent=1)
        final = os.path.join(meta, f"v{version}.metadata.json")
        try:
            os.link(tmp, final)  # atomic, fails if the version exists
        except FileExistsError:
            os.unlink(tmp)
            raise CommitConflict(f"version {version} already published")
        os.unlink(tmp)
        hint_tmp = os.path.join(meta, ".version-hint.tmp")
        with open(hint_tmp, "w") as f:
            f.write(str(version))
        os.replace(hint_tmp, os.path.join(meta, "version-hint.text"))
        return version

    def _new_table_metadata(self, path: str, schema_json: dict,
                            spark_schema: T.StructType,
                            partition_by) -> dict:
        spec_fields = []
        if partition_by:
            # identity transforms on the named source columns
            by_name = {f["name"]: f["id"] for f in schema_json["fields"]}
            for i, col in enumerate(partition_by):
                spec_fields.append({
                    "name": col, "transform": "identity",
                    "source-id": by_name[col], "field-id": 1000 + i,
                })
        return {
            "format-version": FORMAT_VERSION,
            "table-uuid": str(_uuid.uuid4()),
            "location": os.path.abspath(path),
            "last-sequence-number": 0,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": schema_json["last-column-id"],
            "current-schema-id": 0,
            "schemas": [schema_json],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": 999 + len(spec_fields),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {
                "spark.schema": spark_schema.json(),
                "write.format.default": "parquet",
            },
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
            "refs": {},
        }

    # ------------------------------------------------ data staging

    def _stage_data_files(self, df: DataFrame, path: str,
                          partition_by) -> "list[dict]":
        """Write df via Spark into an immutable staging dir under
        data/, then describe every parquet file (path, rows, bytes,
        partition tuple)."""
        import pyarrow.parquet as pq

        token = _uuid.uuid4().hex[:12]
        data_dir = os.path.join(path, "data", token)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        files = []
        for p in sorted(
            glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                      recursive=True)
        ):
            part = {}
            rel = os.path.relpath(p, data_dir)
            for seg in rel.split(os.sep)[:-1]:
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    part[k] = v
            files.append({
                "file_path": os.path.abspath(p),
                "record_count": pq.ParquetFile(p).metadata.num_rows,
                "file_size_in_bytes": os.path.getsize(p),
                "partition": part,
            })
        return files

    def _partition_avro_fields(self, md: dict) -> list:
        spec = md["partition-specs"][md["default-spec-id"]]["fields"]
        if not spec:
            return []
        schema = {f["id"]: f for f in md["schemas"][0]["fields"]}
        out = []
        for pf in spec:
            src = schema[pf["source-id"]]
            avro_t = _PART_AVRO.get(src["type"], "string")
            out.append(_field(pf["name"], avro_t, pf["field-id"],
                              optional=True))
        return out

    def _write_snapshot(self, path: str, md: dict, files: "list[dict]",
                        operation: str, carry_entries: "list | None" = None,
                        extra_summary: "dict | None" = None,
                        deleted_entries: "list | None" = None) -> dict:
        """Append a snapshot (manifest file + manifest list + metadata
        entry). ``files`` become ADDED entries under the new snapshot;
        ``carry_entries`` (prior manifest_entry records, e.g. the
        previous snapshot's live set for an append) are re-emitted as
        EXISTING with their original snapshot/sequence numbers, and
        ``deleted_entries`` (files an overwrite/replace removes) as
        DELETED — scans skip them, but incremental consumers
        (``changes_between``) see exactly what each commit removed,
        per the spec's manifest-inheritance rules."""
        meta = self._meta_dir(path)
        os.makedirs(meta, exist_ok=True)
        commit_uuid = _uuid.uuid4().hex
        seq = md["last-sequence-number"] + 1
        snapshot_id = int.from_bytes(os.urandom(7), "big")

        part_fields = self._partition_avro_fields(md)
        entry_schema = _manifest_entry_schema(part_fields)
        spec_cols = [f["name"] for f in part_fields]
        entries = []
        for prev in carry_entries or []:
            entries.append({**prev, "status": STATUS_EXISTING})
        for prev in deleted_entries or []:
            entries.append({**prev, "status": STATUS_DELETED,
                            "snapshot_id": snapshot_id})
        for fdesc in files:
            part_rec = {}
            for c in spec_cols:
                v = fdesc["partition"].get(c)
                if v is not None:
                    ftype = [f for f in part_fields if f["name"] == c][0]
                    t = ftype["type"][1]
                    v = (int(v) if t in ("int", "long")
                         else float(v) if t == "double"
                         else v == "true" if t == "boolean" else v)
                part_rec[c] = v
            entries.append({
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": CONTENT_DATA,
                    "file_path": fdesc["file_path"],
                    "file_format": "PARQUET",
                    "partition": part_rec,
                    "record_count": fdesc["record_count"],
                    "file_size_in_bytes": fdesc["file_size_in_bytes"],
                },
            })
        manifest_path = os.path.join(meta, f"{commit_uuid}-m0.avro")
        avro.write_ocf(manifest_path, entry_schema, entries)

        n_rows = sum(f["record_count"] for f in files)
        carried = carry_entries or []
        carried_rows = sum(
            e["data_file"]["record_count"] for e in carried)
        dead = deleted_entries or []
        dead_rows = sum(e["data_file"]["record_count"] for e in dead)
        min_seq = min(
            [seq] + [e["sequence_number"] or seq for e in carried])
        mlist_path = os.path.join(
            meta, f"snap-{snapshot_id}-1-{commit_uuid}.avro")
        avro.write_ocf(mlist_path, MANIFEST_LIST_SCHEMA, [{
            "manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": md["default-spec-id"],
            "content": 0,  # data manifest
            "sequence_number": seq,
            "min_sequence_number": min_seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(files),
            "existing_files_count": len(carried),
            "deleted_files_count": len(dead),
            "added_rows_count": n_rows,
            "existing_rows_count": carried_rows,
            "deleted_rows_count": dead_rows,
        }])

        now_ms = int(time.time() * 1000)
        parent = md["current-snapshot-id"]
        snap = {
            "snapshot-id": snapshot_id,
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "manifest-list": mlist_path,
            "schema-id": md["current-schema-id"],
            "summary": {
                "operation": operation,
                "added-data-files": str(len(files)),
                "added-records": str(n_rows),
                "deleted-data-files": str(len(dead)),
                **(extra_summary or {}),
            },
        }
        if parent != -1:
            snap["parent-snapshot-id"] = parent
        md = dict(md)
        md["snapshots"] = md["snapshots"] + [snap]
        md["snapshot-log"] = md["snapshot-log"] + [
            {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
        ]
        md["current-snapshot-id"] = snapshot_id
        md["last-sequence-number"] = seq
        md["last-updated-ms"] = now_ms
        md["refs"] = {MAIN_BRANCH: {"snapshot-id": snapshot_id,
                                    "type": "branch"}}
        if "_version" in md:
            md["metadata-log"] = md["metadata-log"] + [{
                "timestamp-ms": now_ms,
                "metadata-file": os.path.join(
                    self._meta_dir(path),
                    f"v{md['_version']}.metadata.json"),
            }]
        return md

    # ------------------------------------------------ SnapshotBackend

    def commit(self, df: DataFrame, path: str, partition_by=None) -> None:
        """Replace the table contents with ``df`` as one snapshot
        (operation=overwrite after the first append). Data files are
        written once; publication retries on version conflicts."""
        files = self._stage_data_files(df, path, partition_by)
        for _attempt in range(self.max_retries):
            md = self.current_metadata(path)
            if md is None:
                schema_json = spark_schema_to_iceberg(df.schema)
                md = self._new_table_metadata(
                    path, schema_json, df.schema, partition_by)
                op = "append"
            else:
                md = self._maybe_evolve(md, df.schema)
                op = "overwrite" if md["current-snapshot-id"] != -1 else "append"
            dead = (self._live_entries(md)
                    if op == "overwrite" else None)
            md = self._write_snapshot(path, md, files, op,
                                      deleted_entries=dead)
            try:
                self._publish(path, md)
                return
            except CommitConflict:
                continue
        raise CommitConflict(
            f"gave up after {self.max_retries} conflicting commits at {path}")

    def _maybe_evolve(self, md: dict, df_schema: T.StructType) -> dict:
        """Additive schema evolution (the Iceberg-safe subset): new
        nullable columns append a new schema entry with FRESH field
        ids while existing columns keep theirs; type changes or drops
        raise. Returns (possibly updated) metadata."""
        stored = T.StructType.fromJson(
            json.loads(md["properties"]["spark.schema"]))
        stored_by_name = {f.name: f for f in stored.fields}
        new_fields = []
        for f in df_schema.fields:
            if f.name in stored_by_name:
                if f.dataType != stored_by_name[f.name].dataType:
                    raise NotImplementedError(
                        f"type change on {f.name!r} "
                        "(only additive evolution is supported)")
            else:
                new_fields.append(f)
        missing = set(stored_by_name) - {f.name for f in df_schema.fields}
        if missing:
            raise NotImplementedError(
                f"dropping columns {sorted(missing)} is not supported "
                "(only additive evolution)")
        if not new_fields:
            return md
        cur = md["schemas"][md["current-schema-id"]]
        next_id = [md["last-column-id"] + 1]
        added = []
        for f in new_fields:
            fid = next_id[0]
            next_id[0] += 1
            added.append({
                "id": fid, "name": f.name, "required": False,
                "type": _iceberg_type(f.dataType, next_id),
            })
        new_schema = {
            "type": "struct", "schema-id": len(md["schemas"]),
            "fields": cur["fields"] + added,
            "last-column-id": next_id[0] - 1,
        }
        evolved_spark = T.StructType(
            stored.fields + [T.StructField(f.name, f.dataType, True)
                             for f in new_fields])
        md = dict(md)
        md["schemas"] = md["schemas"] + [new_schema]
        md["current-schema-id"] = new_schema["schema-id"]
        md["last-column-id"] = new_schema["last-column-id"]
        md["properties"] = {**md["properties"],
                            "spark.schema": evolved_spark.json()}
        return md

    def append(self, df: DataFrame, path: str, partition_by=None,
               summary: "dict | None" = None) -> int:
        """Append ``df`` as one snapshot: previous live files carry
        over as EXISTING manifest entries (original snapshot/sequence
        numbers preserved), new files are ADDED. Returns the committed
        snapshot id. ``summary`` entries land in the snapshot summary
        (e.g. a streaming batch id for exactly-once sinks)."""
        files = self._stage_data_files(df, path, partition_by)
        for _attempt in range(self.max_retries):
            md = self.current_metadata(path)
            if md is None:
                schema_json = spark_schema_to_iceberg(df.schema)
                md = self._new_table_metadata(
                    path, schema_json, df.schema, partition_by)
                carry = []
            else:
                md = self._maybe_evolve(md, df.schema)
                carry = (self._live_entries(md)
                         if md["current-snapshot-id"] != -1 else [])
            md = self._write_snapshot(
                path, md, files, "append", carry_entries=carry,
                extra_summary=summary)
            try:
                self._publish(path, md)
                return md["current-snapshot-id"]
            except CommitConflict:
                continue
        raise CommitConflict(
            f"gave up after {self.max_retries} conflicting appends at {path}")

    def snapshot_summaries(self, path: str) -> "list[dict]":
        """All snapshot summaries on the table, oldest first (the
        exactly-once dedup surface for streaming sinks)."""
        md = self.current_metadata(path)
        if md is None:
            return []
        return [s.get("summary", {}) for s in md["snapshots"]]

    def _live_entries(self, md: dict, snapshot_id: "int | None" = None):
        sid = md["current-snapshot-id"] if snapshot_id is None else snapshot_id
        snap = next(
            (s for s in md["snapshots"] if s["snapshot-id"] == sid), None)
        if snap is None:
            raise FileNotFoundError(f"no snapshot {sid}")
        _, manifests = avro.read_ocf(snap["manifest-list"])
        out = []
        for m in manifests:
            _, entries = avro.read_ocf(m["manifest_path"])
            out.extend(e for e in entries if e["status"] != STATUS_DELETED)
        return out

    def _live_files(self, md: dict, snapshot_id: "int | None" = None):
        return [e["data_file"]["file_path"]
                for e in self._live_entries(md, snapshot_id)]

    def _read_files(self, spark: SparkSession, md: dict, files: list):
        if not files:
            schema = T.StructType.fromJson(
                json.loads(md["properties"]["spark.schema"]))
            return spark.createDataFrame([], schema)
        spec = md["partition-specs"][md["default-spec-id"]]["fields"]
        schema = T.StructType.fromJson(
            json.loads(md["properties"]["spark.schema"]))
        reader = spark.read
        evolved = len(md["schemas"]) > 1
        if evolved:
            # files written under older schemas lack the new columns;
            # mergeSchema unions footers, missing values read as null
            reader = reader.option("mergeSchema", "true")
        if spec:
            # partition columns live in the dir names: basePath makes
            # Spark re-derive them, then we normalize dtypes from the
            # stored schema (partition-dir inference widens types)
            base = os.path.commonpath(
                [os.path.dirname(os.path.dirname(f)) for f in files]
            )
            df = reader.option("basePath", base).parquet(*files)
            return df.select(
                *[F.col(f.name).cast(f.dataType) for f in schema.fields]
            )
        df = reader.parquet(*files)
        if evolved:
            have = set(df.columns)
            return df.select(*[
                (F.col(f.name).cast(f.dataType) if f.name in have
                 else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in schema.fields
            ])
        return df

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        md = self.current_metadata(path)
        if md is None or md["current-snapshot-id"] == -1:
            raise FileNotFoundError(f"no committed snapshot at {path}")
        return self._read_files(spark, md, self._live_files(md))

    def read_snapshot(self, spark: SparkSession, path: str,
                      snapshot_id: int) -> DataFrame:
        """Time travel: read a specific snapshot id (or ordinal index
        into the snapshot log when < 1000)."""
        md = self.current_metadata(path)
        if md is None:
            raise FileNotFoundError(path)
        if snapshot_id < 1000:  # ordinal convenience (snap ids are 56-bit)
            snapshot_id = md["snapshot-log"][snapshot_id]["snapshot-id"]
        return self._read_files(
            spark, md, self._live_files(md, snapshot_id))

    def is_complete(self, path: str) -> bool:
        md = self.current_metadata(path)
        return md is not None and md["current-snapshot-id"] != -1

    def merge_overwrite(self, spark, path, delete_keys, insert_rows,
                        key: str = "id") -> DataFrame:
        """MERGE as a copy-on-write overwrite commit: reads snapshot N,
        publishes N+1; readers of N are never disturbed."""
        target = self.read(spark, path)
        merged = target.join(
            delete_keys.select(key), key, "left_anti"
        ).unionByName(insert_rows.select(*target.columns))
        self.commit(merged, path)
        return self.read(spark, path)

    # ------------------------------------------------ maintenance

    def expire_snapshots(self, path: str, keep: int = 1) -> int:
        """Drop all but the newest ``keep`` snapshots from metadata and
        delete data/manifest files only they referenced. Publishing the
        trimmed metadata is itself a version commit."""
        md = self.current_metadata(path)
        if md is None:
            return 0
        snaps = md["snapshots"]
        if len(snaps) <= keep:
            return 0
        keep_snaps = snaps[-keep:]
        if not any(s["snapshot-id"] == md["current-snapshot-id"]
                   for s in keep_snaps):
            raise ValueError("refusing to expire the current snapshot")
        victims = snaps[:-keep]
        keep_files = set()
        for s in keep_snaps:
            keep_files.update(self._live_files(md, s["snapshot-id"]))
        removed = 0
        for s in victims:
            _, manifests = avro.read_ocf(s["manifest-list"])
            for m in manifests:
                _, entries = avro.read_ocf(m["manifest_path"])
                for e in entries:
                    fp = e["data_file"]["file_path"]
                    if fp not in keep_files and os.path.exists(fp):
                        os.remove(fp)
                if os.path.exists(m["manifest_path"]):
                    os.remove(m["manifest_path"])
            os.remove(s["manifest-list"])
            removed += 1
        keep_ids = {s["snapshot-id"] for s in keep_snaps}
        md = dict(md)
        md["snapshots"] = keep_snaps
        md["snapshot-log"] = [
            e for e in md["snapshot-log"] if e["snapshot-id"] in keep_ids
        ]
        self._publish(path, md)
        # prune now-empty staging dirs
        for d in glob.glob(os.path.join(path, "data", "*")):
            if os.path.isdir(d) and not any(
                glob.glob(os.path.join(d, "**", "*.parquet"),
                          recursive=True)
            ):
                shutil.rmtree(d)
        return removed

    def compact_data_files(self, path: str, spark: SparkSession,
                           target_file_size_bytes: int = 128 << 20) -> dict:
        """`rewrite_data_files` analog — the small-file compaction a
        100 TB table needs continuously: coalesce the current
        snapshot's data files into ~target-sized ones and publish the
        new layout as a ``replace`` snapshot (same live rows, fewer
        files; prior snapshots keep time-traveling to the old layout).
        Returns counts; no-op when the layout is already compact."""
        md = self.current_metadata(path)
        if md is None or md["current-snapshot-id"] == -1:
            return {"rewritten_files": 0, "new_files": 0, "noop": True}
        files = self._live_files(md)
        sizes = [os.path.getsize(f) for f in files if os.path.exists(f)]
        total = sum(sizes)
        n_out = max(1, -(-total // max(target_file_size_bytes, 1)))
        if len(files) <= n_out:
            return {"rewritten_files": 0, "new_files": 0, "noop": True}
        spec = md["partition-specs"][md["default-spec-id"]]["fields"]
        partition_by = [f["name"] for f in spec] or None
        df = self._read_files(spark, md, files)
        if not partition_by:
            df = df.repartition(int(n_out))
        staged = self._stage_data_files(df, path, partition_by)
        for _attempt in range(self.max_retries):
            md = self.current_metadata(path)
            md2 = self._write_snapshot(path, md, staged, "replace",
                                       deleted_entries=self._live_entries(md))
            try:
                self._publish(path, md2)
                return {"rewritten_files": len(files),
                        "new_files": len(staged), "noop": False}
            except CommitConflict:
                continue
        raise CommitConflict(f"compaction lost {self.max_retries} races")

    def changes_between(self, spark: SparkSession, path: str,
                        from_snapshot: "int | None", to_snapshot: int):
        """Incremental changelog (CDC read): rows added and rows
        removed between two snapshots, derived purely from manifest
        entry statuses — walk the snapshots after ``from_snapshot`` up
        to ``to_snapshot`` and read each one's ADDED files as inserts
        and DELETED files as deletes. ``from_snapshot=None`` means
        from table creation. Returns (added_df, removed_df).

        This is the catalog-level face of the engine's changeset
        operator (operators/changeset.py): a downstream consumer
        tails the snapshot log instead of re-reading the table. Note
        copy-on-write granularity is the file: a MERGE rewriting a
        file reports its surviving rows in both frames (standard
        overwrite-CDC semantics without positional delete files)."""
        md = self.current_metadata(path)
        if md is None:
            raise FileNotFoundError(path)
        snaps = md["snapshots"]
        ids = [s["snapshot-id"] for s in snaps]
        hi = ids.index(to_snapshot)
        lo = -1 if from_snapshot is None else ids.index(from_snapshot)
        added_files, removed_files = [], []
        for s in snaps[lo + 1:hi + 1]:
            _, manifests = avro.read_ocf(s["manifest-list"])
            for m in manifests:
                _, entries = avro.read_ocf(m["manifest_path"])
                for e in entries:
                    fp = e["data_file"]["file_path"]
                    if (e["status"] == STATUS_ADDED
                            and e["snapshot_id"] == s["snapshot-id"]):
                        added_files.append(fp)
                    elif (e["status"] == STATUS_DELETED
                            and e["snapshot_id"] == s["snapshot-id"]):
                        removed_files.append(fp)
        # a file added then removed inside the window nets out
        net_added = [f for f in added_files if f not in set(removed_files)]
        net_removed = [f for f in removed_files if f not in set(added_files)]
        return (self._read_files(spark, md, net_added),
                self._read_files(spark, md, net_removed))
