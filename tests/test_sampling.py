"""Deterministic stratified sampling (operators.textops).

Rate-based and fixed-k mixing primitives: content-addressed md5 buckets,
so assignments are stable across reruns/engines, samples nest across
rates, and fixed-k picks grow consistently with k. Oracle-level
membership parity is driver-gated by q_llm_stratified_sample /
q_llm_stratified_fixed_k; these tests pin the operator contracts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
    hash_bucket_col,
    stratified_fixed_k,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"src{i % 4}", f"text {i}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_rates_and_determinism(corpus):
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    a = stratified_sample(corpus, rates, default_rate=0.2)
    b = stratified_sample(corpus, rates, default_rate=0.2)
    assert _ids(a) == _ids(b)
    by_src = {
        r.source: r.n
        for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("src0") == 100          # rate 1.0 keeps all
    assert "src2" not in by_src               # rate 0.0 keeps none
    assert 30 <= by_src.get("src1", 0) <= 70  # ~50 of 100
    assert 5 <= by_src.get("src3", 0) <= 40   # default 0.2 → ~20


def test_samples_nest_across_rates(corpus):
    lo = stratified_sample(corpus, {}, default_rate=0.2)
    hi = stratified_sample(corpus, {}, default_rate=0.6)
    assert _ids(lo) <= _ids(hi)


def test_rate_validation():
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(None, {"a": 1.5})
    with pytest.raises(ValueError, match="default_rate"):
        stratified_sample(None, {}, default_rate=-0.1)
    with pytest.raises(ValueError, match="buckets"):
        hash_bucket_col(F.lit(1), buckets=0)


def test_rate_sample_plan_is_scan_stage(corpus):
    plan = stratified_sample(
        corpus, {"src0": 0.5}, default_rate=0.1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: no shuffle, no join


def test_fixed_k_quota_and_growth(corpus):
    k5 = stratified_fixed_k(corpus, 5)
    counts = {
        r.source: r.n
        for r in k5.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {f"src{i}": 5 for i in range(4)}
    assert k5.agg(F.max("rn")).first()[0] == 5
    # short stratum: min(k, |stratum|)
    tiny = corpus.sparkSession.createDataFrame(
        [(1, "only", "t")], "doc_id bigint, source string, text string"
    )
    assert stratified_fixed_k(tiny, 5).count() == 1
    # growing k keeps the previous picks and adds
    assert _ids(k5) <= _ids(stratified_fixed_k(corpus, 6))
    with pytest.raises(ValueError, match="positive"):
        stratified_fixed_k(corpus, 0)
