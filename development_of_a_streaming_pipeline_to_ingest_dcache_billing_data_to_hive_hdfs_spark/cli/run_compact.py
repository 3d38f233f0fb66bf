"""Partition-compaction entry point.

≙ `run_compact_tables.py` (args `:9-31`, partition policy `:47-58`, lock
`:60-65`, run `:67-78`, status `:79-92`). The compaction itself fixes the
reference's cross-table partition-list bug and sizes output files by
bytes (see compact.py).
"""

from __future__ import annotations

import argparse
import os

from ..compact import (
    DEFAULT_TARGET_BYTES,
    compact_table,
    expire_partitions,
    resolve_partition_policy,
)
from ..session import get_spark_session
from .locking import run_lock


def def_arguments() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="compact day-partitions")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--tables", default="transfers,requests,storage,removes")
    p.add_argument("--partition", default="yesterday",
                   help="'yesterday' | 'all' | comma-separated YYYY-MM-DD list")
    p.add_argument("--target-bytes", type=int, default=DEFAULT_TARGET_BYTES)
    p.add_argument("--cluster-by", default=None,
                   help="comma-separated columns: range-partition + sort the "
                        "rewrite so files carry disjoint min/max key ranges "
                        "(file-level data skipping); default: shuffle-free coalesce")
    p.add_argument("--zorder-by", default=None,
                   help="comma-separated NUMERIC columns: rewrite in Morton "
                        "Z-order so EVERY keyed column gets narrow per-file "
                        "min/max stats (multi-column data skipping); "
                        "mutually exclusive with --cluster-by")
    p.add_argument("--bloom-for", default=None, metavar="COLS",
                   help="comma-separated columns to write parquet bloom "
                        "filters for during the rewrite — point-lookup "
                        "row-group skipping on high-cardinality columns "
                        "(pnfsid, session) that min/max stats can't prune")
    p.add_argument("--bloom-ndv", type=int, default=1_000_000,
                   help="expected distinct values PER FILE for --bloom-for "
                        "(default 1e6; ~1.2 bytes/ndv of footprint)")
    p.add_argument("--only-needed", action="store_true",
                   help="skip partitions already at their target file "
                        "layout (metadata check, no data read)")
    p.add_argument("--retain-days", type=int, default=None,
                   help="drop partitions older than N days before compacting "
                        "(retention; default: keep everything)")
    p.add_argument("--expire-default-partition", action="store_true",
                   help="with --retain-days, also drop the NULL "
                        "(__HIVE_DEFAULT_PARTITION__) partition, which has "
                        "no date and can never age past the cutoff")
    p.add_argument("--analyze", default=None, metavar="COLS",
                   help="after compacting, run ANALYZE TABLE (+ FOR "
                        "COLUMNS on this comma-separated list; pass '' "
                        "for table-level stats only) so CBO reads fresh "
                        "statistics — requires the tables to be "
                        "registered in the metastore (hive deployments); "
                        "unregistered path-only tables are skipped with "
                        "a notice")
    p.add_argument("--expire-snapshots", action="store_true",
                   help="after compacting, record the snapshot horizon at "
                        "the max committed batch id and drop per-batch "
                        "metrics files below it — time-travel reads below "
                        "the horizon then fail fast with the operator-set "
                        "reason instead of an incidental file-name error")
    p.add_argument("--clean-orphans", action="store_true",
                   help="before compacting, delete data files of batches "
                        "never committed to the ledger (crash residue of "
                        "an abandoned stream); runs under the shared lock, "
                        "so the newest uncommitted batch is cleaned too — "
                        "no ingest can be mid-write")
    p.add_argument("--dedup-store", default=None, metavar="TABLE",
                   help="catalog table of a FingerprintStore (or, with "
                        "--dedup-store-kind band, a BandBucketStore) to "
                        "compact after table compaction: reclaims "
                        "crash-replay duplicate rows and collapses small "
                        "append files while PRESERVING the bucketed "
                        "layout (the no-Exchange screen plan survives)")
    p.add_argument("--dedup-store-kind", choices=["fingerprint", "band"],
                   default="fingerprint")
    p.add_argument("--dedup-store-expire-run", default=None, metavar="RUN",
                   help="with --dedup-store-expire-below: drop store "
                        "entries committed by this corpus run id below "
                        "the batch horizon (retention twin of "
                        "--expire-snapshots for the seen-fp store)")
    p.add_argument("--dedup-store-expire-below", type=int, default=None,
                   metavar="BATCH")
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
    parser = def_arguments()
    args = parser.parse_args(argv)
    if args.expire_default_partition and args.retain_days is None:
        parser.error("--expire-default-partition requires --retain-days "
                     "(retention is what triggers expiry)")
    partitions = resolve_partition_policy(args.partition)
    cluster_by = (
        [c.strip() for c in args.cluster_by.split(",") if c.strip()]
        if args.cluster_by
        else None
    )
    zorder_by = (
        [c.strip() for c in args.zorder_by.split(",") if c.strip()]
        if args.zorder_by
        else None
    )
    if cluster_by and zorder_by:
        parser.error("--cluster-by and --zorder-by are mutually exclusive")
    bloom_for = (
        [c.strip() for c in args.bloom_for.split(",") if c.strip()]
        if args.bloom_for
        else None
    )
    with run_lock(args.lock_path, args.status_path, timeout_s=args.lock_wait_s):
        spark = get_spark_session(app_name="dcache_compact", loglevel=args.loglevel)
        if args.clean_orphans:
            from ..warehouse import remove_orphan_batches

            removed = remove_orphan_batches(args.warehouse, include_latest=True)
            print(f"orphans removed: {removed or 'none'}")
        for table in args.tables.split(","):
            path = os.path.join(args.warehouse, table.strip())
            if args.retain_days is not None:
                dropped = expire_partitions(
                    spark, path, keep_days=args.retain_days,
                    include_default_partition=args.expire_default_partition,
                )
                print(f"{table}: expired {dropped}")
            result = compact_table(
                spark, path, partitions, args.target_bytes, cluster_by,
                only_needed=args.only_needed, zorder_by=zorder_by,
                bloom_for=bloom_for, bloom_ndv=args.bloom_ndv,
            )
            print(f"{table}: compacted {result}")
            if args.analyze is not None:
                from ..warehouse import analyze_table

                name = table.strip()
                if spark.catalog.tableExists(name):
                    cols = [c.strip() for c in args.analyze.split(",") if c.strip()]
                    stats = analyze_table(spark, name, columns=cols or None)
                    print(f"{name}: analyzed {stats}")
                else:
                    print(f"{name}: not in the catalog — skipping ANALYZE "
                          "(register the table or use a hive session)")
        if args.dedup_store:
            from ..operators.dedup import BandBucketStore, FingerprintStore

            if args.dedup_store_kind == "band":
                store = BandBucketStore.open(spark, args.dedup_store)
            else:
                store = FingerprintStore(spark, args.dedup_store)
            info = store.compact(
                expire_run_tag=args.dedup_store_expire_run,
                expire_below_batch=args.dedup_store_expire_below,
            )
            print(f"dedup store compacted: {info}")
        if args.expire_snapshots:
            from ..compact import expire_snapshots

            try:
                info = expire_snapshots(args.warehouse)
                print(f"snapshots expired: horizon={info['horizon']} "
                      f"metrics_removed={info['metrics_removed']}")
            except ValueError as e:
                print(f"snapshots not expired: {e}")


if __name__ == "__main__":
    main()
