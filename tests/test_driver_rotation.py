"""Automates the driver-window rotation discipline: the correctness
driver checks only the FIRST 50 ``queries()`` entries per round, so
registration order is a coverage budget. These tests fail the build if
any catalog query would silently go stale (no hard driver verdict within
the last two recorded rounds) without being queued in the upcoming
window — the check the judge previously had to do by hand."""

from __future__ import annotations

import json
from pathlib import Path

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
    QUERIES,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
    _DRIVER_PRIORITY,
)

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50  # the driver evaluates the first 50 queries() entries


def _verdicts() -> tuple[int, dict[str, int]]:
    """(latest_round, {query: last_green_round}) from CORRECTNESS_r*.json."""
    last_green: dict[str, int] = {}
    latest = 0
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        r = int(f.stem.split("_r")[1])
        latest = max(latest, r)
        for q, v in json.loads(f.read_text()).items():
            ok = (
                v.get("hash_match")
                if v.get("hash_match") is not None
                else v.get("rows_match")
            )
            if ok:
                last_green[q] = max(last_green.get(q, 0), r)
    return latest, last_green


def test_priority_list_shape():
    """Exactly one driver window, no wasted or duplicate slots, every
    name resolvable, and the registration order actually honors it."""
    assert len(_DRIVER_PRIORITY) == WINDOW
    assert len(set(_DRIVER_PRIORITY)) == WINDOW
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"_DRIVER_PRIORITY names unknown queries: {missing}"
    assert list(QUERIES)[:WINDOW] == _DRIVER_PRIORITY


def test_no_query_goes_stale():
    """Every catalog query either has a green driver verdict within the
    last two recorded rounds, or is queued in the upcoming window."""
    latest, last_green = _verdicts()
    window = set(_DRIVER_PRIORITY)
    stale = [
        q
        for q in QUERIES
        if last_green.get(q, 0) < latest - 1 and q not in window
    ]
    assert not stale, (
        f"queries with no driver verdict since r{latest - 1} and not in "
        f"the upcoming window: {stale} — rotate them into _DRIVER_PRIORITY"
    )


def test_never_verified_queries_lead_the_window():
    """Queries with NO driver verdict at all (newly registered) must be
    at the FRONT of the window — they are the coverage debt."""
    _latest, last_green = _verdicts()
    never = [q for q in QUERIES if q not in last_green]
    for q in never:
        assert q in _DRIVER_PRIORITY, f"never-verified {q} not in window"
        assert _DRIVER_PRIORITY.index(q) < len(never) + 4, (
            f"never-verified {q} is buried at slot "
            f"{_DRIVER_PRIORITY.index(q)} — front-load it"
        )
