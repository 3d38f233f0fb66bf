"""BM25 keyword search: hand-computed scores, postings-path parity,
query normalization, deterministic top-k, and the scan-stage-filter
plan contract."""

from __future__ import annotations

import math

import pytest

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.search import (
    bm25_search,
    build_postings,
)

DOCS = [
    (1, "Apple banana apple"),
    (2, "banana cherry"),
    (3, "cherry cherry cherry"),
    (4, "durian"),
]
SCHEMA = "doc_id long, text string"


def _docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_hand_computed_scores(spark):
    out = {r.doc_id: r for r in bm25_search(_docs(spark), ["apple", "cherry"], k=10).collect()}
    assert set(out) == {1, 2, 3}  # durian-only doc never appears
    n, avgdl = 4, 9 / 4
    exp1 = _bm25(2, 1, n, 3, avgdl)           # d1: apple tf=2, df=1
    exp2 = _bm25(1, 2, n, 2, avgdl)           # d2: cherry tf=1, df=2
    exp3 = _bm25(3, 2, n, 3, avgdl)           # d3: cherry tf=3, df=2
    assert out[1].score == round(exp1, 4)
    assert out[2].score == round(exp2, 4)
    assert out[3].score == round(exp3, 4)
    assert (out[1].n_terms_hit, out[2].n_terms_hit, out[3].n_terms_hit) == (1, 1, 1)


def test_multi_term_match_sums_terms(spark):
    out = {r.doc_id: r for r in bm25_search(_docs(spark), ["banana", "cherry"], k=10).collect()}
    assert out[2].n_terms_hit == 2  # d2 hits both
    n, avgdl = 4, 9 / 4
    exp2 = _bm25(1, 2, n, 2, avgdl) + _bm25(1, 2, n, 2, avgdl)
    assert out[2].score == round(exp2, 4)


def test_postings_path_matches_direct_path(spark):
    docs = _docs(spark)
    postings = build_postings(docs)
    direct = bm25_search(docs, ["apple", "cherry", "banana"], k=10).collect()
    via_idx = bm25_search(
        docs, ["apple", "cherry", "banana"], k=10, postings=postings
    ).collect()
    assert [(r.doc_id, r.score) for r in direct] == [
        (r.doc_id, r.score) for r in via_idx
    ]


def test_query_normalization_and_dedup(spark):
    docs = _docs(spark)
    a = bm25_search(docs, ["APPLE", " apple ", "apple"], k=5).collect()
    b = bm25_search(docs, ["apple"], k=5).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]


def test_top_k_and_tie_break(spark):
    docs = _docs(spark)
    # identical docs tie exactly -> id-ascending order decides
    dup = spark.createDataFrame(
        [(10, "zebra"), (11, "zebra"), (12, "zebra")], SCHEMA
    )
    out = bm25_search(docs.unionByName(dup), ["zebra"], k=2).collect()
    assert [r.doc_id for r in out] == [10, 11]


def test_guards(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="empty"):
        bm25_search(docs, ["  ", ""])
    with pytest.raises(ValueError, match="k must be positive"):
        bm25_search(docs, ["apple"], k=0)


def test_plan_filters_in_scan_and_take_ordered(spark):
    """The query-term filter must hit the exploded stream BEFORE any
    Exchange (only matched tokens shuffle), and the top-k must be
    TakeOrderedAndProject, not a global sort."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        bm25_search(docs, ["the", "data"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    lines = plan.splitlines()
    filter_line = next(
        i for i, l in enumerate(lines) if "Filter" in l and "term" in l and "INSET" in l.upper() or ("Filter" in l and "the" in l)
    )
    first_exchange = next(i for i, l in enumerate(lines) if "Exchange" in l)
    # physical plans print top-down: the scan-stage filter must sit
    # BELOW (after) the exchange line it feeds
    assert filter_line > first_exchange, plan


def test_postings_store_matches_scan_path_and_appends(spark):
    """Store-backed search equals the one-shot scan path; appends fold
    stats and postings so post-append scores equal a full rebuild."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.search import (
        PostingsStore,
    )

    docs = _docs(spark)
    store = PostingsStore(spark, "bm25_idx_a", n_buckets=8)
    try:
        store.build(docs)
        direct = bm25_search(docs, ["apple", "cherry"], k=10).collect()
        via = store.search(["apple", "cherry"], k=10).collect()
        assert [(r.doc_id, r.score) for r in direct] == [
            (r.doc_id, r.score) for r in via
        ]
        # append a new (disjoint) doc; compare against a full rebuild
        extra = spark.createDataFrame([(9, "cherry apple cherry")], SCHEMA)
        store.append(extra)
        rebuilt = PostingsStore(spark, "bm25_idx_b", n_buckets=8)
        try:
            rebuilt.build(docs.unionByName(extra))
            a = store.search(["cherry"], k=10).collect()
            b = rebuilt.search(["cherry"], k=10).collect()
            assert [(r.doc_id, r.score) for r in a] == [
                (r.doc_id, r.score) for r in b
            ]
            assert any(r.doc_id == 9 for r in a)
        finally:
            rebuilt.drop()
    finally:
        store.drop()


def test_postings_store_lookup_prunes_buckets(spark):
    """The term filter must prune the bucketed index's FILES
    (SelectedBucketsCount < total) — the scale contract a flat parquet
    postings dump cannot give."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.search import (
        PostingsStore,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    store = PostingsStore(spark, "bm25_idx_prune", n_buckets=16)
    try:
        store.build(docs)
        plan = (
            store.search(["merge", "window"], k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, plan
        assert int(m.group(1)) <= 2 < int(m.group(2)) == 16, m.groups()
    finally:
        store.drop()


def test_postings_store_stats_count_zero_token_docs(spark):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.search import (
        PostingsStore,
    )

    docs = _docs(spark).unionByName(
        spark.createDataFrame([(99, "   ")], SCHEMA)
    )
    store = PostingsStore(spark, "bm25_idx_z", n_buckets=4)
    try:
        store.build(docs)
        stats = spark.table("bm25_idx_z_stats").collect()[0]
        assert stats.n_docs == 5  # the zero-token doc counts in N
        assert stats.sum_dl == 9  # ...but adds no length mass
    finally:
        store.drop()
