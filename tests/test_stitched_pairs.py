"""Stitching-artifact detection (operators.dedup.stitched_doc_pairs)."""

from __future__ import annotations

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.dedup import (
    stitched_doc_pairs,
)

W = [f"w{i}" for i in range(40)]


def _pairs(spark, rows, n=16):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["doc_a"], r["doc_b"]): r["boundary"]
        for r in stitched_doc_pairs(df, n).collect()
    }


def test_detects_constructed_stitch(spark):
    # doc 0 ends with the 16 tokens doc 1 starts with
    boundary = W[10:26]
    rows = [
        (0, " ".join(W[0:10] + boundary)),
        (1, " ".join(boundary + W[26:40])),
        (2, " ".join(reversed(W))),  # unrelated
    ]
    got = _pairs(spark, rows)
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] == " ".join(boundary)


def test_direction_matters(spark):
    boundary = W[10:26]
    rows = [
        (0, " ".join(boundary + W[26:40])),   # boundary at START
        (1, " ".join(W[0:10] + boundary)),    # boundary at END
    ]
    got = _pairs(spark, rows)
    assert set(got) == {(1, 0)}  # suffix-of-1 meets prefix-of-0


def test_docs_at_exactly_n_tokens_excluded(spark):
    # a 16-token doc equals the boundary itself: exact dedup's job
    boundary = W[0:16]
    rows = [
        (0, " ".join(W[20:30] + boundary)),
        (1, " ".join(boundary)),
    ]
    assert _pairs(spark, rows) == {}


def test_periodic_doc_no_self_pair(spark):
    block = W[0:16]
    rows = [(0, " ".join(block + ["mid"] + block))]
    assert _pairs(spark, rows) == {}


def test_no_false_positives_on_disjoint_docs(spark):
    rows = [
        (0, " ".join(W[0:20])),
        (1, " ".join(W[20:40])),
    ]
    assert _pairs(spark, rows) == {}
