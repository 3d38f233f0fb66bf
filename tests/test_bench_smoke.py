"""Smoke test for the benchmark query set.

Round 2 lesson: a plan-time AnalysisException in ONE headline query
DNF'd the whole benchmark because nothing ran the bench set before the
driver did. This test executes every BENCH_QUERIES entry once at
sf0.001, so a broken headline query fails the suite long before it can
reach bench.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import ALL_QUERIES, BENCH_QUERIES

from tests.conftest import SF_DIR


def test_bench_set_is_registered():
    missing = [n for n in BENCH_QUERIES if n not in ALL_QUERIES]
    assert not missing, f"bench names not in catalog: {missing}"


@pytest.mark.parametrize("name", BENCH_QUERIES)
def test_bench_query_runs(spark, name):
    n = ALL_QUERIES[name](spark, SF_DIR).count()
    assert n >= 0


def test_bench_ingest_probe_runs(spark):
    """The ingest-throughput probe must produce a nonzero rows/sec and
    drain every record (a broken probe would silently drop the bench's
    streaming evidence)."""
    from bench import bench_ingest

    out = bench_ingest(spark, n_records=500)
    assert out["rows"] == 500
    assert out["rows_per_sec"] > 0


def test_plans_md_stale_guard_uses_generation_stamp(tmp_path, monkeypatch):
    """The stale guard must key on the 'Generated at commit <head>'
    stamp (code-changed-since semantics, like the parity artifact),
    not on commit timestamps — a byte-identical regeneration never
    needs a commit and was false-flagging."""
    import bench

    # stamped at current HEAD -> not stale
    assert bench._plans_md_stale() is None

    # stamped at an ancient ref with package changes since -> stale
    monkeypatch.setattr(bench, "_code_changed_since", lambda ref: True)
    msg = bench._plans_md_stale()
    assert msg and "regenerate" in msg


def test_scale_probe_window_includes_construction(spark, monkeypatch):
    """bench_scale_probe's timing window and shuffle delta must cover
    DataFrame CONSTRUCTION, not just execution (r14 review): operators
    with eager subtrees — the LSH gate materializes and counts its
    candidate-pair set at construction — do corpus work and shuffles
    in jobs that start before any action on the returned frame. The
    old scheme (construct before t0, read the final plan's SQLMetrics)
    read their growth curves falsely flat."""
    import time as _time

    import bench

    def eager_op(sp, d):
        # construction-time work: a real shuffle job driven eagerly
        # (the LSH-gate shape), plus a measurable construction delay
        _time.sleep(0.3)
        (
            sp.read.parquet(f"{d}/documents.parquet")
            .groupBy("source")
            .count()
            .localCheckpoint()
            .count()
        )
        return sp.range(1)

    monkeypatch.setitem(bench.ALL_QUERIES, "eager_probe_op", eager_op)
    monkeypatch.setattr(
        bench, "SCALE_PROBE_OPS", {"eager_probe_op": "documents"}
    )
    out = bench.bench_scale_probe(spark, SF_DIR, factor=2)
    row = out["eager_probe_op"]
    assert "error" not in row, row
    # wall includes the construction sleep…
    assert row["t1"] >= 0.3, row
    # …and the shuffle delta sees the eager checkpoint job's exchange,
    # which the returned frame's own plan (spark.range) never shows
    assert row["shuffle1"] > 0, row
