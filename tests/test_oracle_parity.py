"""The local mirror of the driver's t2 gate: every catalog query with an
oracle must hash-match DuckDB at sf0.001 (fast) — run the sf0.01 sweep
manually before shipping a round (see .claude/skills/verify)."""

from __future__ import annotations

import pytest

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
    ORACLES,
    QUERIES,
)

from oracle_harness import compare_one, duck_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    res = compare_one(spark, duck, name, SF)
    assert res.get("ok"), res
    if name in ORACLES:
        assert res["mode"] == "oracle"
