"""Temperature-weighted mixture sampling (operators.textops.
temperature_mixture_k): quota math, alpha semantics, determinism,
guards, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
    temperature_mixture_k,
)


def _df(spark, sizes):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_quotas_are_exact_floor_allocation(spark):
    sizes = {"big": 400, "mid": 100, "small": 25}
    out = temperature_mixture_k(_df(spark, sizes), 100)
    got = (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n_taken"),
            F.min("mix_quota").alias("quota"),
        )
        .collect()
    )
    w = {s: math.floor(10000.0 * math.sqrt(n)) for s, n in sizes.items()}
    tw = sum(w.values())
    for r in got:
        expect = (100 * w[r["source"]]) // tw
        assert r["quota"] == expect, r
        assert r["n_taken"] == expect, r


def test_alpha_below_one_upweights_small_strata(spark):
    sizes = {"big": 400, "small": 25}
    out = temperature_mixture_k(_df(spark, sizes), 84)
    taken = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    # raw share would give small 84*25/425 ≈ 4; sqrt share gives
    # 84*5/25 ≈ 16 — low-resource stratum upweighted
    assert taken["small"] >= 15
    assert taken["big"] + taken["small"] <= 84


def test_quota_never_exceeds_stratum(spark):
    sizes = {"tiny": 2, "big": 500}
    out = temperature_mixture_k(_df(spark, sizes), 600)
    taken = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert taken.get("tiny", 0) <= 2


def test_deterministic_and_nested_in_total_k(spark):
    df = _df(spark, {"a": 50, "b": 200})
    pick_small = {
        r["doc_id"] for r in temperature_mixture_k(df, 40).collect()
    }
    pick_again = {
        r["doc_id"] for r in temperature_mixture_k(df, 40).collect()
    }
    pick_big = {
        r["doc_id"] for r in temperature_mixture_k(df, 80).collect()
    }
    assert pick_small == pick_again          # rerun-stable
    assert pick_small <= pick_big            # grows consistently


def test_guards(spark):
    df = _df(spark, {"a": 3})
    with pytest.raises(ValueError, match="total_k must be positive"):
        temperature_mixture_k(df, 0)
    with pytest.raises(ValueError, match="alpha must be positive"):
        temperature_mixture_k(df, 5, alpha=-1.0)


def test_plan_shape_single_corpus_shuffle(spark):
    """Quotas broadcast back; the only corpus exchange is the stratum
    window's — no sort-merge join anywhere."""
    df = _df(spark, {"a": 100, "b": 100})
    plan = (
        temperature_mixture_k(df, 20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
