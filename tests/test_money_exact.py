"""Exact-value (full-precision) oracle parity for money aggregates.

The standard harness canonicalizes floats to 6 significant digits —
loose enough that round 2's TPC-H Q10 one-cent divergence (double
summation order straddling a half-cent) passed pytest while failing the
driver's exact value hash. Every money-sum query now computes its
aggregate in exact decimal on both engines (see catalog.py
`dec_price`/`rev_dec`), which makes the results bit-identical, so this
test can — and does — demand full string equality at sf0.01, the same
scale the driver checks.
"""

from __future__ import annotations

import pytest

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
    ORACLES,
    QUERIES,
)

from tests.conftest import SF_DIR_001
from tests.oracle_harness import duck_connection

MONEY_QUERIES = [
    "q_billing_flagship_daily",
    "q_billing_route_counts",
    "q_billing_hourly_windows",
    "q_rel_q1_pricing_summary",
    "q_rel_q3_top_orders",
    "q_rel_q5_nation_volume",
    "q_rel_brand_revenue",
    "q_rel_top3_parts_per_brand",
    "q_rel_running_totals",
    "q_rel_range_frame",
    "q_rel_rollup_orders",
    "q_rel_cube_lineitem",
    "q_rel_distinct_stats",
    "q_rel_cte_top_suppliers",
    "q_rel_q6_forecast_revenue",
    "q_rel_q14_promo_revenue",
    "q_rel_q19_disjunctive",
    "q_rel_q7_volume_shipping",
    "q_rel_q8_market_share",
    "q_rel_q10_returned_items",
    "q_rel_q15_top_supplier",
    "q_rel_q17_small_qty_revenue",
    "q_rel_q22_dormant_prospects",
    "q_rel_left_outer_join",
    "q_rel_asof_join",
]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR_001)
    yield con
    con.close()


@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_money_query_exact(spark, duck, name):
    spdf = QUERIES[name](spark, SF_DIR_001).toPandas()
    opdf = duck.execute(ORACLES[name]).df()
    assert len(spdf) == len(opdf), f"{name}: {len(spdf)} vs {len(opdf)} rows"
    cols = sorted(spdf.columns)
    assert cols == sorted(opdf.columns)
    s_rows = sorted(map(tuple, spdf[cols].astype(str).values.tolist()))
    o_rows = sorted(map(tuple, opdf[cols].astype(str).values.tolist()))
    diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
    assert s_rows == o_rows, f"{name}: first diffs {diff}"
