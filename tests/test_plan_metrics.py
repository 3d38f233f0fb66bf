"""plans/metrics.py: measured execution metrics must reflect the run
that actually happened (exchanges counted, shuffle/scan bytes nonzero
after full evaluation, broadcasts attributed)."""

from __future__ import annotations

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
    QUERIES,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.metrics import (
    collect_plan_metrics,
    run_with_metrics,
)

SF = "/root/testdata/sf0.001"


def test_unexecuted_plan_reports_zero_bytes(spark):
    df = QUERIES["q_rel_q1_pricing_summary"](spark, SF)
    m = collect_plan_metrics(df)
    assert m["shuffle_bytes_written"] == 0 and m["scan_bytes"] == 0


def test_executed_aggregate_measures_one_exchange(spark):
    m = run_with_metrics(QUERIES["q_rel_q1_pricing_summary"](spark, SF))
    assert m["n_exchanges"] == 1
    assert m["shuffle_bytes_written"] > 0
    assert m["scan_bytes"] > 0 and m["scan_files"] >= 1
    assert m["n_broadcasts"] == 0


def test_star_join_measures_broadcasts_not_fact_shuffle(spark):
    m = run_with_metrics(QUERIES["q_rel_q5_nation_volume"](spark, SF))
    assert m["n_broadcasts"] >= 3
    assert m["broadcast_bytes"] > 0
    # the fact must not shuffle for the joins: only the final groupBy
    assert m["n_exchanges"] == 1
