"""Corpus export entry point: read a curated document table and write
size-targeted JSONL shards (sink.export_text_shards) — the handoff from
the warehouse to a training-data loader, completing the corpus
lifecycle (ingest → dedup/curate → export).

Read-only on the warehouse, so it does NOT take the ingest/compaction
lock by default — an export racing an APPEND just reads the committed
snapshot (parquet readers never see half-written batch files thanks to
the batch-named layout). Appends are the only race that's silently
safe, though: compaction's two-rename swap leaves the partition
directory ABSENT for a moment, and a listing taken inside that window
would export a corpus silently missing a whole day. So the lock-free
path snapshots the table's directory layout before and after the
export and FAILS LOUDLY if maintenance touched it (scratch markers
present, or the entry set changed) — rerun, or pass --lock-path to
serialize outright (e.g. when exporting right after a merge whose
partitions must all land).
"""

from __future__ import annotations

import argparse
import os

from ..fs import get_filesystem
from ..session import get_spark_session
from ..sink import export_text_shards
from .locking import run_lock


def def_arguments() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="export a document table as JSONL shards")
    p.add_argument("--warehouse", required=True, help="warehouse base dir/URI")
    p.add_argument("--table", required=True, help="table name under the warehouse")
    p.add_argument("--output", required=True, help="shard output dir/URI")
    p.add_argument("--target-mb", type=int, default=256,
                   help="target shard size in MB (default 256)")
    p.add_argument("--where", default=None,
                   help="optional SQL filter, e.g. \"source = 'web'\"")
    p.add_argument("--text-col", default="text",
                   help="column whose bytes drive the shard-size estimate")
    p.add_argument("--format", default="json", choices=["json", "csv", "parquet"],
                   help="output format (json = JSONL)")
    p.add_argument("--lock-path", default=None,
                   help="optional: serialize with ingest/compaction/merge")
    p.add_argument("--status-path", default=None)
    p.add_argument("--loglevel", default="WARN")
    return p


def _layout_snapshot(fs, path: str) -> tuple[frozenset, bool]:
    """(top-level directory entries, any-compaction-scratch-present) —
    one metadata listing, the consistency witness for lock-free reads."""
    entries = fs.list_entries(path)
    return (
        frozenset(name for name, _is_dir in entries),
        any(name.startswith("._compact_") for name, _is_dir in entries),
    )


def _export(args, *, guard_layout: bool = False) -> None:
    spark = get_spark_session(app_name="dcache_export", loglevel=args.loglevel)
    table_path = os.path.join(args.warehouse, args.table)
    fs = get_filesystem(table_path, spark)
    if guard_layout:
        pre, pre_scratch = _layout_snapshot(fs, table_path)
    df = spark.read.parquet(table_path)
    if args.where:
        df = df.where(args.where)
    n = export_text_shards(
        df,
        args.output,
        target_bytes=args.target_mb * 1024 * 1024,
        text_col=args.text_col,
        fmt=args.format,
    )
    if guard_layout:
        post, post_scratch = _layout_snapshot(fs, table_path)
        if pre_scratch or post_scratch or pre != post:
            # compaction's swap window (partition dir absent between the
            # two renames) or a retention delete overlapped the read —
            # the shards may silently miss a partition; refuse to report
            # success. The shards stay on disk for inspection; a rerun
            # (or --lock-path) produces a consistent export.
            raise RuntimeError(
                f"export raced warehouse maintenance on {table_path}: "
                "directory layout changed (or compaction scratch dirs "
                "present) during the read — rerun, or pass --lock-path "
                "to serialize with compaction/merge"
            )
    print(f"{args.table}: exported {n} shard(s) to {args.output}")


def main(argv: list[str] | None = None) -> None:
    args = def_arguments().parse_args(argv)
    if args.lock_path:
        with run_lock(args.lock_path, args.status_path):
            _export(args)
        return
    # lock-free default still honors --status-path (the 0/1 contract
    # monitoring reads from run_compact/run_merge) — silently ignoring
    # it would hide failed exports from the nightly check
    status = 1
    try:
        _export(args, guard_layout=True)
        status = 0
    finally:
        if args.status_path:
            with open(args.status_path, "w") as f:
                f.write(str(status))


if __name__ == "__main__":
    main()
