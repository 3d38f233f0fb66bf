"""Standing per-round sf0.1 full-parity sweep (VERDICT r5 task 6).

Runs every catalog query against its DuckDB oracle at sf0.1 (the bench
scale factor — one decade above the driver's sf0.01 gate) and writes the
verdict to ``PARITY_SF01.json`` at the repo root. ``bench.py`` folds the
artifact's ``{n, fail}`` into its driver-captured summary line, so each
round's BENCH_r{N}.json carries the parity verdict without the bench
itself paying the ~3-minute sweep (and without the sweep's Spark jobs
contending with the timed passes — run this on an idle box, before the
bench).

Usage::

    python scripts/run_sf01_parity.py [sf_dir] [cpus]

Defaults: ``/root/testdata/sf0.1`` on ``local[16]``.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "16"

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark import (
        get_spark_session,
    )
    from oracle_harness import compare_all

    spark = get_spark_session(
        app_name="sf01-parity",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    t0 = time.perf_counter()
    results = compare_all(spark, sf_dir)
    elapsed = round(time.perf_counter() - t0, 1)
    spark.stop()

    failures = {
        name: r for name, r in results.items() if not r.get("ok")
    }
    try:
        head = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        # dirty-package flag: a sweep over uncommitted package code must
        # not claim a clean commit — bench.py treats dirty artifacts as
        # stale (ADVICE r10)
        dirty = bool(
            subprocess.run(
                ["git", "-C", str(REPO), "status", "--porcelain", "--",
                 "development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
        )
    except Exception:  # noqa: BLE001 — artifact must still be written
        head, dirty = None, False
    artifact = {
        "n": len(results),
        "fail": len(failures),
        "sf_dir": sf_dir,
        "elapsed_sec": elapsed,
        "git_head": head,
        "dirty": dirty,
        "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # full per-query detail only for failures — the green case is a
        # two-number verdict, the red case is a diagnosable one
        "failures": failures,
        "modes": {
            "oracle": sum(1 for r in results.values() if r.get("mode") == "oracle"),
            "rows_only": sum(1 for r in results.values() if r.get("mode") == "rows_only"),
        },
    }
    (REPO / "PARITY_SF01.json").write_text(json.dumps(artifact, indent=2))
    print(
        f"sf0.1 parity: {artifact['n']} queries, {artifact['fail']} failures "
        f"({elapsed}s) -> PARITY_SF01.json"
    )
    if failures:
        for name in failures:
            print(f"  FAIL {name}")
        sys.exit(1)


if __name__ == "__main__":
    main()
