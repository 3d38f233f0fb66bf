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


def test_canon_cell_is_driver_strict():
    """The local canon must stay at least as strict as the driver's
    value hash (VERDICT r8/r9): a constructed -0.0 cell must canonize
    differently from +0.0, NaN folds to the null token, and near-integer
    floats print stably — so a sign-of-zero engine divergence can never
    pass the local sweep while failing the driver."""
    import math

    import pandas as pd

    from oracle_harness import _canon_cell, canonical_rows

    assert _canon_cell(-0.0) == "-0"
    assert _canon_cell(0.0) == "0"
    assert _canon_cell(-0.0) != _canon_cell(0.0)
    assert _canon_cell(float("nan")) == _canon_cell(None)
    assert _canon_cell(2.0) == "2"
    assert _canon_cell(math.pi) == f"{math.pi:.6g}"

    # end-to-end through canonical_rows: identical frames except for the
    # sign of one zero must NOT canonize identically
    a = pd.DataFrame({"x": [0.0], "y": [1]})
    b = pd.DataFrame({"x": [-0.0], "y": [1]})
    assert canonical_rows(a) != canonical_rows(b)
