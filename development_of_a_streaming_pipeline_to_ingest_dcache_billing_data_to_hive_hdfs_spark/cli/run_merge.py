"""Upsert (MERGE INTO) entry point: apply a parquet update batch to a
warehouse table — the correction-feed / late-reingest operation the
reference's INSERT-only warehouse lacks (see merge.py for semantics).

Takes the same lock as the ingest CLI by default: a merge racing a
micro-batch append to the same table could interleave with the dynamic
partition overwrite, so serialize them (the reference serializes its
cron entry points the same way, `run_kafka_to_hive.py:37-43`).
"""

from __future__ import annotations

import argparse
import os

from ..merge import merge_into
from ..session import get_spark_session
from .locking import run_lock


def def_arguments() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="merge (upsert) into a warehouse table")
    p.add_argument("--warehouse", required=True, help="warehouse base dir/URI")
    p.add_argument("--table", required=True, help="table name under the warehouse")
    p.add_argument("--updates-path", required=True,
                   help="parquet path of the keyed update batch")
    p.add_argument("--keys", required=True,
                   help="comma-separated merge key columns")
    p.add_argument("--version-col", default=None,
                   help="resolve duplicate keys within the batch by max of "
                        "this column (last-write-wins)")
    p.add_argument("--scope", choices=["partitions", "table"],
                   default="partitions",
                   help="'table' also rewrites partitions a matched key "
                        "moved away from")
    p.add_argument("--delete-col", default=None,
                   help="CDC tombstones: rows where this boolean column "
                        "is true DELETE their matched key instead of "
                        "replacing it")
    p.add_argument("--lock-path", default="/tmp/dcache_warehouse.lock",
                   help="one lock shared by ingest/compaction/merge: any "
                        "two of them racing the same table can interleave "
                        "with a partition swap or dynamic overwrite")
    p.add_argument("--lock-wait-s", type=float, default=600,
                   help="wait up to this long for the shared lock: a live "
                        "continuous ingest holds it per-micro-batch "
                        "(seconds), so maintenance queues briefly instead "
                        "of dying with AlreadyRunning; 0 = fail fast")
    p.add_argument("--status-path", default=None)
    p.add_argument("--loglevel", default="WARN")
    return p


def main(argv: list[str] | None = None) -> None:
    args = def_arguments().parse_args(argv)
    with run_lock(args.lock_path, args.status_path, timeout_s=args.lock_wait_s):
        spark = get_spark_session(app_name="dcache_merge", loglevel=args.loglevel)
        updates = spark.read.parquet(args.updates_path)
        rewritten = merge_into(
            spark,
            os.path.join(args.warehouse, args.table),
            updates,
            [k.strip() for k in args.keys.split(",") if k.strip()],
            version_col=args.version_col,
            scope=args.scope,
            delete_col=args.delete_col,
        )
        print(f"{args.table}: merged partitions {rewritten}")


if __name__ == "__main__":
    main()
