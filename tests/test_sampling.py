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


def test_weighted_sample_k_is_deterministic_and_weight_biased(spark):
    """A-ES sampling: repartition-invariant membership; heavy rows win
    far more often across independent salts (the statistical contract),
    and the per-salt sample replays exactly."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        weighted_sample_k,
    )

    rows = [(i, 100.0 if i < 10 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = [r.doc_id for r in weighted_sample_k(df, 20, "w").collect()]
    b = [
        r.doc_id
        for r in weighted_sample_k(df.repartition(7), 20, "w").collect()
    ]
    assert a == b and len(a) == 20
    # bias: count heavy-row wins across 30 salts; heavy rows are 10/200
    # of the population but carry 1000/1190 of the weight
    heavy_wins = total = 0
    for s in range(30):
        picked = weighted_sample_k(df, 5, "w", salt=f"salt-{s}").collect()
        heavy_wins += sum(1 for r in picked if r.doc_id < 10)
        total += 5
    assert heavy_wins / total > 0.5, heavy_wins / total


def test_weighted_sample_k_hand_check_and_exclusions(spark):
    """The ln(u)/w ordering is replayed in python from the same md5
    draw; NULL/zero/negative weights never appear."""
    import hashlib
    import math

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        weighted_sample_k,
    )

    rows = [(1, 2.0), (2, 5.0), (3, 0.5), (4, None), (5, 0.0), (6, -3.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [(r.doc_id, r.es_key) for r in weighted_sample_k(df, 3, "w").collect()]
    assert {d for d, _ in got} <= {1, 2, 3}

    def es_key(doc_id, w):
        h = hashlib.md5(f"{doc_id}|mix-v1".encode()).hexdigest()[:8]
        u = (int(h, 16) + 1.0) / 4294967296.0
        return math.log(u) / w

    ref = sorted(
        [(d, es_key(d, w)) for d, w in rows[:3]],
        key=lambda t: (-t[1], t[0]),
    )
    assert [d for d, _ in got] == [d for d, _ in ref]
    for (d1, k1), (d2, k2) in zip(got, ref):
        assert abs(k1 - k2) < 1e-12


def test_weighted_sample_k_plan_and_guard(spark):
    import pytest as _pytest

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        weighted_sample_k,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = weighted_sample_k(docs, 10, "n_chars")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    with _pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_k(docs, 0, "n_chars")


def test_weighted_sample_k_excludes_nan_weights(spark):
    """NaN > 0 is true in Spark and NaN sorts above everything
    descending — unexcluded, one 0/0-derived weight monopolizes the
    whole sample."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        weighted_sample_k,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, float("nan")), (3, 5.0)], "doc_id long, w double"
    )
    got = {r.doc_id for r in weighted_sample_k(df, 3, "w").collect()}
    assert got == {1, 3}
