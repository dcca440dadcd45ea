"""Iceberg table maintenance entrypoint: compaction + snapshot expiry.

The jobs a 100 TB lakehouse runs continuously against every table the
ingest pipeline writes (the `rewrite_data_files` / `expire_snapshots`
procedures of a jar-backed deployment, served here by the pure-Python
metadata backend in plans/iceberg.py):

    spark-submit --py-files pipeline.zip jobs/table_maintenance.py \\
        --table /data/out/ingest --target-file-mb 128 --keep-snapshots 3

Prints one JSON line with what was rewritten/expired so schedulers can
alert on drift (e.g. compaction that never becomes a no-op indicates a
writer emitting pathological small files).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description="Iceberg table maintenance")
    ap.add_argument("--table", required=True, help="table root path")
    ap.add_argument("--target-file-mb", type=int, default=128,
                    help="compaction target data-file size (MiB)")
    ap.add_argument("--keep-snapshots", type=int, default=3,
                    help="snapshots to retain after expiry (0 = skip)")
    ap.add_argument("--skip-compact", action="store_true")
    args = ap.parse_args()

    from ingest_spark.plans.iceberg import IcebergMetadataBackend
    from ingest_spark.session import get_spark

    spark = get_spark(app_name="table_maintenance")
    backend = IcebergMetadataBackend()

    out = {"table": args.table}
    if not args.skip_compact:
        out["compaction"] = backend.compact_data_files(
            args.table, spark,
            target_file_size_bytes=args.target_file_mb << 20,
        )
    if args.keep_snapshots > 0:
        out["expired_snapshots"] = backend.expire_snapshots(
            args.table, keep=args.keep_snapshots)
    md = backend.current_metadata(args.table)
    out["snapshots"] = len(md["snapshots"]) if md else 0
    out["live_files"] = len(backend._live_files(md)) if md else 0
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
