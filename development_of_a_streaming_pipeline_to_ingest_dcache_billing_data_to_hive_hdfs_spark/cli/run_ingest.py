"""Periodic streaming-ingest entry point.

≙ `run_kafka_to_hive.py` (CLI args `:7-28`, lock `:37-43`, run `:46-58`,
status `:60-72`). Differences: ``--source file --input-path`` for
broker-less runs, ``availableNow`` bounded drain by default instead of
the ``awaitTermination(2×trigger)`` wall-clock race, atomic locking.
"""

from __future__ import annotations

import argparse

from ..session import get_spark_session
from ..sources.stream import billing_stream_source
from ..streaming.pipeline import BillingPipeline
from .locking import run_lock


def def_arguments() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="dCache billing ingest (Spark)")
    p.add_argument("--source", choices=["kafka", "file"], default="kafka")
    p.add_argument("--warehouse", required=True, help="warehouse base dir/URI")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--kafka-bootstrap")
    p.add_argument("--subscribe-pattern")
    p.add_argument("--input-path", help="file-source input dir")
    p.add_argument("--trigger-s", type=int, default=0,
                   help="0 = drain available data and exit (availableNow)")
    p.add_argument("--lock-path", default="/tmp/dcache_warehouse.lock",
                   help="one lock shared by ingest/compaction/merge: any "
                        "two of them racing the same table can interleave "
                        "with a partition swap or dynamic overwrite")
    p.add_argument("--status-path", default=None)
    p.add_argument("--loglevel", default="WARN")
    return p


def main(argv: list[str] | None = None) -> None:
    args = def_arguments().parse_args(argv)

    def _build_pipe(lock_path=None):
        spark = get_spark_session(app_name="dcache_ingest", loglevel=args.loglevel)
        source = billing_stream_source(
            spark,
            args.source,
            path=args.input_path,
            kafka_bootstrap=args.kafka_bootstrap,
            subscribe_pattern=args.subscribe_pattern,
        )
        return BillingPipeline(source, args.warehouse, lock_path=lock_path)

    if args.trigger_s > 0:
        # Long-running mode must NOT hold the shared warehouse lock for
        # its whole lifetime — cron'd compaction/merge/retention would
        # hit AlreadyRunning every night, forever, while monitoring
        # still reads the last successful run's 0. The lock scope drops
        # to one micro-batch (BillingPipeline acquires/releases it
        # around each foreachBatch call); the status protocol is
        # honored here since run_lock no longer wraps the run.
        pipe = _build_pipe(lock_path=args.lock_path)
        status = 1
        try:
            q = pipe.run_continuous(args.checkpoint, args.trigger_s)
            q.awaitTermination()
            status = 0
        finally:
            if args.status_path:
                with open(args.status_path, "w") as f:
                    f.write(str(status))
    else:
        # bounded drain: holding the lock for the whole (minutes-long)
        # run is the intended serialization with maintenance
        with run_lock(args.lock_path, args.status_path):
            _build_pipe().run_available_now(args.checkpoint)


if __name__ == "__main__":
    main()
