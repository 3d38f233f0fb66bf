"""Negative tests for the expected-empty checks' degeneracy guards.

The *_check / *_recall catalog queries verify estimators by emitting
violation rows (expected EMPTY). That design has a failure mode: if the
pipeline under test silently produces NOTHING (zero candidate pairs,
zero exact neighbors), the violation query is empty too and the check
passes vacuously. These tests feed each guard a degenerate input and
assert it FAILS loudly (emits a marker row) instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
    _recall_violation,
)


def test_recall_violation_fires_on_empty_exact_side(spark):
    exact = spark.createDataFrame([], "query_id long, neighbor_id long")
    approx = spark.createDataFrame([(1, 2)], "query_id long, neighbor_id long")
    rows = _recall_violation(exact, approx, floor=0.7).collect()
    assert len(rows) == 1
    assert rows[0]["recall"] == -1.0


def test_recall_violation_passes_on_full_recall(spark):
    pairs = [(1, 2), (1, 3)]
    exact = spark.createDataFrame(pairs, "query_id long, neighbor_id long")
    approx = spark.createDataFrame(pairs, "query_id long, neighbor_id long")
    assert _recall_violation(exact, approx, floor=0.7).count() == 0


def test_recall_violation_fires_below_floor(spark):
    exact = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], "query_id long, neighbor_id long"
    )
    approx = spark.createDataFrame([(1, 2)], "query_id long, neighbor_id long")
    rows = _recall_violation(exact, approx, floor=0.7).collect()
    assert len(rows) == 1
    assert abs(rows[0]["recall"] - 0.25) < 1e-9


def test_minhash_check_guard_fires_on_empty_corpus(spark, tmp_path):
    """An empty documents table yields zero candidate pairs — the check
    must emit the marker row, not pass vacuously."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_llm_minhash_check,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    empty.write.parquet(str(tmp_path / "documents.parquet"))
    rows = q_llm_minhash_check(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["id_a"] == -1 and rows[0]["est_jaccard"] == -1.0
