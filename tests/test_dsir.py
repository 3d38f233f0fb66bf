"""DSIR importance resampling (Xie et al. 2023): hand-checked hashed
n-gram log-ratio scores, target-likeness ordering, deterministic
selection, and the bounded-model plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
    dsir_logratio_model,
    dsir_scores,
    dsir_select,
)

SCHEMA = "doc_id long, text string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_hand_computed_score_single_feature(spark):
    """One-token docs, disjoint vocab ⇒ each doc's score is exactly the
    smoothed log-ratio of its own feature's bucket (collisions avoided
    by checking the bucket assignment first)."""
    target = _df(spark, [(100, "alpha"), (101, "alpha")])
    raw = _df(spark, [(200, "alpha"), (201, "beta"), (202, "beta")])
    pool = _df(spark, [(1, "alpha"), (2, "beta")])
    B = 64
    scored = {
        r.doc_id: r
        for r in dsir_scores(pool, target, raw, n_buckets=B).collect()
    }
    # feature streams: target = {alpha:2} (N=2), raw = {alpha:1, beta:2} (N=3)
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        hash_bucket_col,
    )
    buckets = {
        r.t: r.b
        for r in spark.createDataFrame([("alpha",), ("beta",)], "t string")
        .select("t", hash_bucket_col(F.col("t"), B, "dsir-v1").alias("b"))
        .collect()
    }
    assert buckets["alpha"] != buckets["beta"]  # no collision at B=64
    lr_alpha = math.log((2 + 1) / (2 + B)) - math.log((1 + 1) / (3 + B))
    lr_beta = math.log((0 + 1) / (2 + B)) - math.log((2 + 1) / (3 + B))
    assert scored[1].logw == round(lr_alpha, 4)
    assert scored[2].logw == round(lr_beta, 4)
    assert scored[1].n_features == scored[2].n_features == 1
    # alpha is target-like, beta is raw-only: ordering must reflect it
    assert scored[1].logw > scored[2].logw


def test_bigrams_count_toward_the_score(spark):
    """A 2-token doc has 3 features (2 unigrams + 1 bigram)."""
    pool = _df(spark, [(1, "hello world")])
    target = _df(spark, [(9, "hello world")])
    out = dsir_scores(pool, target, n_buckets=256).collect()
    assert out[0].n_features == 3


def test_empty_docs_drop_out(spark):
    pool = _df(spark, [(1, "some text"), (2, "   "), (3, "")])
    target = _df(spark, [(9, "some text")])
    ids = {r.doc_id for r in dsir_scores(pool, target).collect()}
    assert ids == {1}


def test_unseen_bucket_falls_back_to_laplace_floor(spark):
    """A pool feature absent from BOTH model corpora scores the floor
    ln(1/(Nt+B)) − ln(1/(Nr+B)) — it never vanishes or NULLs out."""
    target = _df(spark, [(100, "aa")])
    raw = _df(spark, [(200, "bb")])
    pool = _df(spark, [(1, "zzz")])
    B = 128
    out = dsir_scores(pool, target, raw, n_buckets=B).collect()
    floor = math.log(1 / (1 + B)) - math.log(1 / (1 + B))
    assert out[0].logw == round(floor, 4) == 0.0


def test_target_docs_score_higher_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.where(F.col("source").isin("src0", "src1"))
    scored = dsir_scores(docs, target, n_buckets=4096)
    m = {
        r.is_tgt: r.avg_w
        for r in scored.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy(F.col("source").isin("src0", "src1").alias("is_tgt"))
        .agg(F.avg("logw").alias("avg_w"))
        .collect()
    }
    assert m[True] > m[False]


def test_select_is_deterministic_and_top_k(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.where(F.col("source") == "src0")
    scored = dsir_scores(docs, target, n_buckets=1024)
    a = [r.doc_id for r in dsir_select(scored, 20).collect()]
    b = [r.doc_id for r in dsir_select(scored.repartition(7), 20).collect()]
    assert a == b and len(a) == 20
    # the kept set is exactly the rows ranking top-20 by (logw desc, id)
    ranked = sorted(
        scored.collect(), key=lambda r: (-r.logw, r.doc_id)
    )[:20]
    assert a == [r.doc_id for r in ranked]
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_select(scored, 0)


def test_select_plan_is_take_ordered(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = dsir_scores(docs, docs.limit(50), n_buckets=512)
    plan = (
        dsir_select(scored, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_model_is_bounded_and_bucket_guard(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = dsir_logratio_model(docs.limit(100), docs, n_buckets=512)
    assert model.count() <= 512
    assert model.columns == ["bucket", "logratio"]
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_logratio_model(docs, docs, n_buckets=0)


def test_target_pred_path_matches_target_frame_path(spark):
    """The r16 single-pass model path (target_pred over raw) must score
    EVERY document identically to the two-pass path (a separate target
    frame): same integers into the same smoothed log-ratio, so exact
    equality on (n_features, logw) — not a tolerance. Also pins the
    structural point of the optimization: the pred plan carries fewer
    exchanges (no second featurize of the target, no ≤B-row full-outer
    model join)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pred = F.col("source").isin("src0", "src1")
    two_pass = dsir_scores(docs, docs.where(pred), n_buckets=256)
    one_pass = dsir_scores(docs, target_pred=pred, n_buckets=256)
    a = {r.doc_id: (r.n_features, r.logw) for r in two_pass.collect()}
    b = {r.doc_id: (r.n_features, r.logw) for r in one_pass.collect()}
    assert a == b
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.metrics import (
        collect_plan_metrics,
    )
    n_two = collect_plan_metrics(two_pass)["n_exchanges"]
    n_one = collect_plan_metrics(one_pass)["n_exchanges"]
    assert n_one < n_two, (n_one, n_two)


def test_target_pred_and_frame_are_mutually_exclusive(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pred = F.col("source") == "src0"
    with pytest.raises(ValueError, match="exactly one"):
        dsir_scores(docs, docs.where(pred), target_pred=pred)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_scores(docs)


def test_target_pred_reserved_column_guard(spark):
    """r17 (r16 advice): a caller frame that already carries
    '_dsir_is_tgt' must raise — withColumn would silently overwrite it
    and feed the predicate under the caller's column name."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tainted = docs.withColumn("_dsir_is_tgt", F.lit(True))
    with pytest.raises(ValueError, match="_dsir_is_tgt"):
        dsir_scores(tainted, target_pred=F.col("source") == "src0")
