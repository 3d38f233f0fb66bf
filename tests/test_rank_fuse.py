"""ECDF rank fusion (operators.textops.ecdf_rank_fuse): exact basis
points, tie handling, direction via negation, plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
    ecdf_rank_fuse,
)


def test_hand_computed_bp(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([5, 1, 3, 3, 9])],
        "doc_id long, v long",
    )
    out = {
        r["doc_id"]: r
        for r in ecdf_rank_fuse(
            df, {"v": F.col("v"), "negv": -F.col("v")}
        ).collect()
    }
    # below-counts: 5->3, 1->0, 3->1 (both), 9->4; bp = 10000*below//5
    assert [out[i]["bp_v"] for i in range(5)] == [6000, 0, 2000, 2000, 8000]
    # negated signal reverses the ranking; ties rank together
    assert [out[i]["bp_negv"] for i in range(5)] == [2000, 8000, 4000, 4000, 0]
    assert out[4]["fused_bp"] == 8000
    assert out[2]["fused_bp"] == out[3]["fused_bp"] == 6000


def test_matches_python_ecdf_on_random_ints(spark):
    rng = random.Random(5)
    vals = [rng.randint(0, 30) for _ in range(200)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, v long"
    )
    out = {
        r["doc_id"]: r["bp_v"]
        for r in ecdf_rank_fuse(df, {"v": F.col("v")}).collect()
    }
    n = len(vals)
    for i, v in enumerate(vals):
        below = sum(1 for x in vals if x < v)
        assert out[i] == (10000 * below) // n, (i, v)


def test_best_doc_wins_fused(spark):
    rows = [(0, 10, 100), (1, 5, 50), (2, 1, 10)]
    df = spark.createDataFrame(rows, "doc_id long, a long, b long")
    out = {
        r["doc_id"]: r["fused_bp"]
        for r in ecdf_rank_fuse(
            df, {"a": F.col("a"), "b": F.col("b")}
        ).collect()
    }
    assert out[0] > out[1] > out[2]


def test_plan_never_shuffles_the_corpus_for_ranking(spark):
    """The value-rank tables join back BROADCAST; the corpus side never
    sort-merge-joins and never globally sorts."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37).alias("v")
    )
    out = ecdf_rank_fuse(df, {"v": F.col("v")})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
