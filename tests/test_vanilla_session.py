"""Suite-level enforcement of the VANILLA-session gate sweep.

The round-8 failure class was code that is only correct under the
factory session's confs: ``HllStore`` silently lost data under Spark's
default STATIC ``partitionOverwriteMode`` — a conf the test factory
(conftest ``get_spark_session``) pins to ``dynamic`` session-wide, so
every factory-session test was structurally blind to the bug while the
correctness driver (which builds its OWN default-conf session) went
red.  ``scripts/run_vanilla_gates.py`` is the harness that closes that
blind spot: a genuinely default ``SparkSession.builder`` session
running the HllStore update→update→range-read regression plus every
``*_check`` catalog gate against the DuckDB oracle.

This test runs that script as a SUBPROCESS (a vanilla session cannot
be built inside the factory-session pytest process — confs and the
Derby metastore are per-JVM), so ``pytest tests/`` can never again be
green while the driver-session surface is red.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_VANILLA_SF", "/root/testdata/sf0.001")


def test_vanilla_session_gates():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "run_vanilla_gates.py"), SF_DIR, "4"],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=str(REPO),
    )
    # the script prints exactly one JSON line on stdout (last line)
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, (
        f"no JSON summary from run_vanilla_gates.py\n"
        f"exit={proc.returncode}\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    summary = json.loads(lines[-1])
    assert proc.returncode == 0 and summary["fail"] == 0, (
        f"vanilla-session gates failed: {json.dumps(summary['failures'], indent=2)}"
    )
    # the sweep must actually have covered the regression + check gates
    assert summary["n"] >= 15, summary
