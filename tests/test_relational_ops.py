"""Relational operator semantics: as-of join edge cases, top-k per group,
plus plan-shape assertions (broadcast applied, filter pushed to scan) —
the 100 TB posture checks SURVEY §4 calls for."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.relational import (
    asof_join,
    top_k_per_group,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01T10:00:00")), (2, 10, ts("2024-01-01T12:00:00")),
         (3, 20, ts("2024-01-01T09:00:00"))],
        "id long, key long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, ts("2024-01-01T09:30:00"), 1.0), (10, ts("2024-01-01T11:00:00"), 2.0),
         (20, ts("2024-01-01T09:30:00"), 3.0)],
        "key long, rts timestamp, val double",
    )
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="rts", right_cols=["val"])
    got = {r.id: r.val_asof for r in out.collect()}
    # id=1: latest right at/before 10:00 is 09:30 → 1.0
    # id=2: latest right at/before 12:00 is 11:00 → 2.0
    # id=3: no right at/before 09:00 → None
    assert got == {1: 1.0, 2: 2.0, 3: None}


def test_asof_join_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, 5, ts("2024-01-01T10:00:00"))], "id long, key long, ts timestamp")
    right = spark.createDataFrame([(5, ts("2024-01-01T10:00:00"), 9.0)], "key long, rts timestamp, val double")
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="rts", right_cols=["val"])
    assert out.first().val_asof == 9.0


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "g string, id int, v double",
    )
    out = top_k_per_group(df, ["g"], "v", k=2)
    got = sorted((r.g, r.id, r.rn) for r in out.collect())
    assert got == [("a", 2, 1), ("a", 3, 2), ("b", 4, 1)]


def test_broadcast_join_in_plan(spark):
    """q_rel_brand_revenue must broadcast the part side — no shuffle of
    lineitem for the join."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_brand_revenue,
    )
    plan = q_rel_brand_revenue(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_in_plan(spark):
    """Partition/predicate filters must reach the parquet scan."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_q1_pricing_summary,
    )
    plan = q_rel_q1_pricing_summary(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q6_pushdown_and_pruning_in_plan(spark):
    """Q6: all four predicates reach the parquet scan and the ReadSchema
    carries only the four referenced columns (not the 11-column row)."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_q6_forecast_revenue,
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_rel_q6_forecast_revenue(spark, "/root/testdata/sf0.001").explain("formatted")
    plan = buf.getvalue()
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in plan, f"missing pushed filter {frag}\n{plan}"
    assert "l_returnflag" not in plan  # pruned
    assert "l_partkey" not in plan


def test_outer_join_null_extension(spark):
    """left/full outer catalog queries: null-extended rows resolve to 0."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_full_outer_join,
        q_rel_left_outer_join,
    )
    sf = "/root/testdata/sf0.001"
    left = q_rel_left_outer_join(spark, sf)
    assert left.where("n_orders = 0").count() + left.where("n_orders > 0").count() == left.count()
    full = q_rel_full_outer_join(spark, sf).collect()
    assert all(r.n_customers >= 0 and r.n_suppliers >= 0 for r in full)
    cust_keys = {
        r.c_nationkey
        for r in spark.read.parquet(f"{sf}/customer.parquet")
        .where("c_acctbal > 9000").select("c_nationkey").distinct().collect()
    }
    supp_keys = {
        r.s_nationkey
        for r in spark.read.parquet(f"{sf}/supplier.parquet")
        .select("s_nationkey").distinct().collect()
    }
    assert {r.nationkey for r in full} == cust_keys | supp_keys


def test_column_pruning_in_plan(spark):
    """A 2-column projection must not read all lineitem columns."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plan = (
        li.select("l_orderkey", "l_quantity")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "l_extendedprice" not in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key join without any shuffle
    exchange — the co-located layout write_bucketed_table exists for."""
    import io, contextlib
    from pyspark.sql import functions as F
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sink import (
        write_bucketed_table,
    )

    sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], n_buckets=4,
                         sort_cols=["o_orderkey"])
    write_bucketed_table(lineitem, "b_lineitem", ["l_orderkey"], n_buckets=4,
                         sort_cols=["l_orderkey"])
    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, join_section
        expected = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("qty"))
        )
        got = {r.o_orderstatus: round(r.qty, 2) for r in joined.collect()}
        want = {r.o_orderstatus: round(r.qty, 2) for r in expected.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.relational import (
        salted_join,
    )

    # skewed: 10k rows of one hot key + 1k spread keys
    skewed = spark.range(11000).select(
        F.when(F.col("id") < 10000, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = skewed.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    ).first()
    salted = salted_join(skewed, dim, "k", salt_buckets=8).agg(
        F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    ).first()
    assert (plain.n, plain.s) == (salted.n, salted.s)
    # left join preserves unmatched rows
    dim_small = dim.where(F.col("k") < 50)
    plain_l = skewed.join(dim_small, "k", "left").count()
    salted_l = salted_join(skewed, dim_small, "k", salt_buckets=8, how="left").count()
    assert plain_l == salted_l
    # semi/anti are sound under replication and must be accepted
    plain_s = skewed.join(dim_small, "k", "left_semi").count()
    salted_s = salted_join(skewed, dim_small, "k", salt_buckets=8, how="left_semi").count()
    assert plain_s == salted_s
    # right/full would duplicate the replicated side's unmatched rows
    import pytest as _pytest

    for bad in ("right", "full", "outer", "right_outer", "cross"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(skewed, dim_small, "k", how=bad)


def test_q4_semi_join_shape_in_plan(spark):
    """Q4: the correlated EXISTS must plan as a LeftSemi join (no
    aggregate-dedup fallback) and the date window must reach the orders
    scan as pushed filters."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_q4_order_priority,
    )

    plan = (
        q_rel_q4_order_priority(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q14_q19_broadcast_part_in_plan(spark):
    """Q14/Q19: the part dim side must broadcast — the lineitem slice
    never shuffles for the join."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_q14_promo_revenue,
        q_rel_q19_disjunctive,
    )

    for q in (q_rel_q14_promo_revenue, q_rel_q19_disjunctive):
        plan = (
            q(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan, plan


def test_scalar_subquery_broadcast_in_plan(spark):
    """The global-average scalar joins via broadcast nested loop — the
    part scan itself must not shuffle."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_scalar_subquery,
    )

    plan = (
        q_rel_scalar_subquery(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan


def test_salted_join_spreads_identical_duplicate_rows(spark):
    from pyspark.sql import functions as F
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.relational import (
        salted_join,
    )

    # Hot key whose rows are EXACT duplicates — dedup-free ingest, the
    # workload salting exists for. A content-hash salt maps all of them
    # to one bucket (zero spread, straggler returns); the row-offset
    # salt must use every bucket.
    dup = spark.range(8000).select(F.lit(7).alias("k"), F.lit("same").alias("v"))
    dim = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))

    salt = F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int")
    n_buckets = dup.select(salt.alias("_salt")).select(
        F.count_distinct("_salt").alias("n")
    ).first().n
    assert n_buckets == 8, f"duplicate-row hot key used {n_buckets}/8 salt buckets"

    # and the join answer is still the plain-join answer
    plain = dup.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("w").alias("s")
    ).first()
    salted = salted_join(dup, dim, "k", salt_buckets=8).agg(
        F.count("*").alias("n"), F.sum("w").alias("s")
    ).first()
    assert (plain.n, plain.s) == (salted.n, salted.s)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_forward_fill_single_exchange_in_plan(spark):
    """Forward fill is one window over one shuffle on the series key —
    no self-join, no extra exchange."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_forward_fill,
    )

    plan = _executed_plan(q_rel_forward_fill(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(user_id" in plan, plan
    assert "Join" not in plan, plan


def test_span_dedup_plan_shape(spark):
    """Span dedup (fingerprint + probe-doc recovery architecture): the
    corpus-sized counting job is materialized separately (it shuffles
    8-byte fingerprints, not span text — asserted by the bench's
    shuffle-bytes row); the RECOVERY plan inspected here must touch the
    corpus only through a broadcast semi-join on probe doc_ids, with
    exactly one explode (re-tokenizing the probe docs), survivors
    joined by broadcast, and no corpus-sized shuffle anywhere."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_llm_span_dedup,
    )

    plan = _executed_plan(q_llm_span_dedup(spark, "/root/testdata/sf0.001"))
    assert plan.count("Generate") == 1, plan      # probe re-tokenize only
    # survivors arrive via the materialized counting job, not a rescan
    assert "ExistingRDD" in plan, plan
    # both joins broadcast: probe-doc semi-join + survivor equi-join
    assert plan.count("BroadcastHashJoin") == 2, plan
    # the only shuffles are survivor-sized: probe-doc distinct + the
    # final per-fingerprint aggregate (corpus rows never repartition)
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_bpe_pairs_word_reduction_in_plan(spark):
    """BPE pair counts: the pair explode must sit ABOVE the word
    aggregate (vocab-sized input), never directly on the corpus —
    i.e. an aggregate appears between the two Generates."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_llm_bpe_pairs,
    )

    plan = _executed_plan(q_llm_bpe_pairs(spark, "/root/testdata/sf0.001"))
    assert plan.count("Generate") == 2, plan
    first_gen = plan.index("Generate")
    second_gen = plan.index("Generate", first_gen + 1)
    # plan prints top-down: the pair explode (first in text) consumes an
    # aggregate; the token explode (second) consumes the scan
    assert "HashAggregate" in plan[first_gen:second_gen], plan


def test_quality_classifier_scan_stage_in_plan(spark):
    """The classifier logit is a scan-stage projection: one exchange
    total (the per-source aggregate), no join, no window."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_llm_quality_classifier,
    )

    plan = _executed_plan(q_llm_quality_classifier(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_contamination_probe_broadcast_in_plan(spark):
    """The probe side must broadcast — the corpus n-gram stream joins
    map-side with no corpus shuffle before the per-doc aggregate."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_llm_contamination_probe,
    )

    plan = _executed_plan(
        q_llm_contamination_probe(spark, "/root/testdata/sf0.001")
    )
    assert "BroadcastHashJoin" in plan, plan
