"""Incremental-rollup maintenance entry point.

No reference twin (the reference has no materialized-view machinery) —
this completes the lifecycle-CLI story for ``rollup.IncrementalRollup``
the same way run_compact covers compaction and the dedup stores: every
persisted warehouse artifact gets an operator-invokable refresh path.

Runs under the same shared lock as ingest/compaction/merge, so a fold
never races a partition swap: ``read_table_changes`` pins the
increment's file list eagerly, but the lock keeps the ledger/marker
files it consults consistent with any concurrent maintenance.

Typical crontab pairing (fold after each nightly compaction)::

    run_compact --warehouse /wh --tables transfers --expire-snapshots
    run_rollup  --warehouse /wh --table transfers \
        --rollup-dir /wh/_rollups/daily_volume \
        --keys partition_date --agg n=count --agg bytes=sum:fileSize

A rollup that FELL BEHIND the compaction marker (fold fails loudly)
recovers with ``--rebaseline``: snapshot read at the marker + full
aggregate, after which folds resume incrementally.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from ..rollup import IncrementalRollup
from ..session import get_spark_session
from .locking import run_lock

_KINDS = ("count", "sum", "min", "max")


def parse_agg(spec: str, decimal_sums: bool) -> tuple[str, tuple]:
    """``NAME=count`` or ``NAME=sum|min|max:COLUMN`` → (name, SYMBOLIC
    agg spec). Decimal sums stay symbolic — ``('sum', col, 'decimal')``
    — because ``F.col(...).cast(...)`` needs an active SparkContext,
    and argument parsing runs in a cold CLI process long before
    ``get_spark_session``; ``_resolve_aggs`` builds the Column inside
    the session block.

    With ``decimal_sums``, sum inputs fold as decimal(28,10) — float
    addition is not associative, so bit-exact equality with a full
    recompute needs decimal folding (rollup.py module docstring)."""
    name, _, rhs = spec.partition("=")
    kind, _, col = rhs.partition(":")
    if not name or kind not in _KINDS or (kind == "count") == bool(col):
        raise ValueError(
            f"--agg {spec!r}: expected NAME=count or NAME=kind:column "
            f"with kind in {_KINDS}"
        )
    if kind == "count":
        return name, ("count",)
    if kind == "sum" and decimal_sums:
        return name, ("sum", col, "decimal")
    return name, (kind, col)


def _resolve_aggs(aggs: dict[str, tuple]) -> dict[str, tuple]:
    """Symbolic CLI specs → rollup specs. Must run AFTER the Spark
    session exists (Column construction asserts an active context)."""
    return {
        name: ("sum", F.col(spec[1]).cast("decimal(28,10)"))
        if len(spec) == 3 and spec[2] == "decimal"
        else spec
        for name, spec in aggs.items()
    }


def def_arguments() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="refresh an incremental rollup")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--table", required=True,
                   help="route table name under the warehouse")
    p.add_argument("--rollup-dir", required=True,
                   help="where the versioned rollup state lives")
    p.add_argument("--keys", required=True,
                   help="comma-separated group-by columns")
    p.add_argument("--agg", action="append", required=True,
                   metavar="NAME=KIND[:COL]",
                   help="decomposable aggregate: NAME=count or "
                        "NAME=sum|min|max:COLUMN; repeatable")
    p.add_argument("--decimal-sums", action="store_true",
                   help="fold sums in decimal(28,10) so the rollup is "
                        "bit-identical to a full recompute (float "
                        "addition is not associative)")
    p.add_argument("--until-batch", type=int, default=None,
                   help="fold only through this committed batch id "
                        "(default: everything committed)")
    p.add_argument("--rebaseline", action="store_true",
                   help="re-anchor a rollup that fell behind the "
                        "compaction marker (snapshot read at the marker "
                        "+ full aggregate) instead of folding")
    p.add_argument("--show", type=int, default=0, metavar="N",
                   help="print the first N rollup rows after the refresh")
    p.add_argument("--lock-path", default="/tmp/dcache_warehouse.lock")
    p.add_argument("--lock-wait-s", type=float, default=600)
    p.add_argument("--status-path", default=None)
    p.add_argument("--loglevel", default="WARN")
    return p


def main(argv: list[str] | None = None) -> None:
    import os

    parser = def_arguments()
    args = parser.parse_args(argv)
    try:
        aggs = dict(
            parse_agg(s, args.decimal_sums) for s in args.agg
        )
    except ValueError as e:
        parser.error(str(e))
    keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    if not keys:
        parser.error("--keys must name at least one column")
    with run_lock(args.lock_path, args.status_path, timeout_s=args.lock_wait_s):
        spark = get_spark_session(app_name="dcache_rollup",
                                  loglevel=args.loglevel)
        ru = IncrementalRollup(
            spark,
            os.path.join(args.warehouse, args.table),
            args.rollup_dir,
            keys=keys,
            aggs=_resolve_aggs(aggs),
        )
        if args.rebaseline:
            st = ru.rebaseline()
            print(f"{args.table}: rebaselined {st}")
        else:
            try:
                st = ru.fold(until_batch=args.until_batch)
            except ValueError as e:
                if "compact" in str(e):
                    raise SystemExit(
                        f"{e}\nhint: this rollup fell behind the "
                        "compaction marker — re-run with --rebaseline "
                        "to re-anchor it, then fold as usual"
                    ) from e
                raise
            print(f"{args.table}: folded {st}")
        if args.show:
            ru.read().show(args.show, truncate=False)


if __name__ == "__main__":
    main()
