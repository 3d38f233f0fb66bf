"""Unit semantics for the profiling operators (operators/profile.py):
NULL handling, anomaly flag edges, histogram bucket edges, winsorize
clipping — the cases the sf-table oracle queries can't isolate because
the synthetic tables have no NULLs or degenerate groups."""

from __future__ import annotations

import math

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.profile import (
    fixed_width_histogram,
    group_zscore_anomalies,
    profile_numeric,
    winsorized_stats,
)


def test_profile_numeric_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (2.0, 30.0), (None, 30.0)],
        "a double, b double",
    )
    rows = {r["column_name"]: r for r in profile_numeric(df, ["a", "b"]).collect()}
    assert rows["a"]["n_rows"] == 4 and rows["a"]["n_nulls"] == 1
    assert rows["a"]["n_distinct"] == 2  # NULL not counted as a value
    assert rows["a"]["min_v"] == 1.0 and rows["a"]["max_v"] == 2.0
    assert math.isclose(rows["a"]["mean_v"], (1 + 2 + 2) / 3, abs_tol=1e-4)
    assert rows["b"]["n_nulls"] == 1 and rows["b"]["n_distinct"] == 2


def test_profile_numeric_approx_has_no_expand(spark):
    """approx=True must NOT pay the Expand replication (the 100 TB
    path) and still land within HLL tolerance."""
    df = spark.range(1000).selectExpr("CAST(id % 37 AS DOUBLE) AS a")
    prof = profile_numeric(df, ["a"], approx=True)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    [row] = prof.collect()
    assert abs(row["n_distinct"] - 37) <= 3


def test_group_zscore_flags_only_the_outlier(spark):
    data = [("a", float(v)) for v in [10, 11, 9, 10, 11, 9, 10, 1000]]
    data += [("b", 5.0)]  # singleton group: sd NULL, never anomalous
    data += [("c", None)]  # NULL value: z NULL, not anomalous
    df = spark.createDataFrame(data, "k string, value double")
    out = group_zscore_anomalies(df, "k", "value", threshold=2.0).collect()
    flagged = {(r["k"], r["value"]) for r in out if r["is_anomaly"]}
    assert flagged == {("a", 1000.0)}
    by_key = {(r["k"], r["value"]): r for r in out}
    assert by_key[("b", 5.0)]["z"] is None
    assert by_key[("c", None)]["z"] is None


def test_histogram_edges_and_null_exclusion(spark):
    df = spark.createDataFrame(
        [(0.0,), (9.99,), (10.0,), (25.0,), (None,)], "v double"
    )
    rows = {
        r["bucket"]: r
        for r in fixed_width_histogram(df, "v", 10.0).collect()
    }
    assert rows[0]["cnt"] == 2  # [0, 10): 0.0 and 9.99
    assert rows[1]["cnt"] == 1  # [10, 20): exactly-on-edge goes up
    assert rows[2]["cnt"] == 1
    assert rows[0]["lo_edge"] == 0.0 and rows[0]["hi_edge"] == 10.0
    assert sum(r["cnt"] for r in rows.values()) == 4  # NULL dropped


def test_winsorized_mean_clips_the_tail(spark):
    vals = [float(v) for v in range(1, 100)] + [10_000.0]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, value double")
    [row] = winsorized_stats(df, "k", "value", 0.01, 0.99).collect()
    assert row["n"] == 100
    # raw mean dragged by the 10k outlier; winsorized mean is not
    assert row["raw_mean"] > 140
    assert row["winsorized_mean"] < 60
    assert row["p_hi"] < 10_000.0


def test_winsorized_null_values_stay_null(spark):
    df = spark.createDataFrame(
        [("k", 1.0), ("k", 2.0), ("k", 3.0), ("k", None)],
        "k string, value double",
    )
    [row] = winsorized_stats(df, "k", "value", 0.0, 1.0).collect()
    assert row["n"] == 4  # count includes the NULL row
    # lo=0/hi=1 → no clipping; NULL must not be imputed to p_lo
    assert math.isclose(row["winsorized_mean"], 2.0, abs_tol=1e-4)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_profile_query_is_one_scan_expand(spark):
    """Exact multi-distinct must be ONE pass: a single Expand over a
    single parquet scan (the oracle needs four scans)."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_table_profile,
    )

    plan = _plan(q_rel_table_profile(spark, "/root/testdata/sf0.001"))
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan


def test_zscore_query_broadcasts_stats_not_fact(spark):
    """The group-moments side must be the broadcast build; the events
    fact must NOT shuffle for the join (no window over event_type)."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_event_anomalies,
    )

    plan = _plan(q_rel_event_anomalies(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan


def test_winsorized_query_broadcasts_percentiles(spark):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        q_rel_winsorized_value,
    )

    plan = _plan(q_rel_winsorized_value(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan, plan


def test_zscore_null_group_key_rows_survive(spark):
    """Rows with a NULL group key must stay in the output as their own
    group (null-safe join), not vanish via inner-join semantics."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 5.0), (None, 6.0)],
        "k string, value double",
    )
    out = group_zscore_anomalies(df, "k", "value").collect()
    assert len(out) == 4
    nulls = [r for r in out if r["k"] is None]
    assert len(nulls) == 2 and all(r["z"] is not None for r in nulls)


def test_winsorized_null_group_key_reported(spark):
    df = spark.createDataFrame(
        [("a", 1.0), (None, 5.0), (None, 7.0)], "k string, value double"
    )
    rows = {r["k"]: r for r in winsorized_stats(df, "k", "value", 0.0, 1.0).collect()}
    assert None in rows and rows[None]["n"] == 2


def test_key_skew_profile_hand_computed(spark):
    """9 'hot' + 3×2 + 2×1 rows: ranks, shares and median ratios are
    exact; tie between the two singleton keys breaks by key order."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.profile import (
        key_skew_profile,
    )

    rows = (
        [("hot",)] * 9 + [("b",)] * 2 + [("c",)] * 2 + [("a",)] + [("d",)]
    )
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top_n=3).orderBy("rank").collect()
    assert [(r["rank"], r["key"], r["n_rows"]) for r in out] == [
        (1, "hot", 9),
        (2, "b", 2),
        (3, "c", 2),
    ]
    total, med = 15, 2.0  # group sizes 9,2,2,1,1 -> median 2
    assert out[0]["share_pct"] == round(9 / total * 100, 4)
    assert out[0]["x_median"] == round(9 / med, 4)
    assert out[2]["cum_share_pct"] == round(13 / total * 100, 4)


def test_key_skew_profile_plan_shape(spark):
    """Top-N must compile to TakeOrderedAndProject (never a global
    sort) and the stats side must broadcast."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.profile import (
        key_skew_profile,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        key_skew_profile(ev, "user_id", top_n=15)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_psi_drift_hand_computed(spark):
    """10 ref rows uniform over [0,10), cur mass moved into one bin —
    every smoothed term checked against the closed form."""
    import math

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.profile import (
        psi_drift,
    )

    ref = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    cur = spark.createDataFrame([(0.5,)] * 10, "v double")
    rows = {r.bin: r for r in psi_drift(ref, cur, "v", bins=5).collect()}
    # ref: 2 per bin of width 2; cur: all 10 in bin 0
    assert [rows[b].n_ref for b in range(5)] == [2] * 5
    assert [rows[b].n_cur for b in range(5)] == [10, 0, 0, 0, 0]
    p = [(2 + 1) / (10 + 5)] * 5
    q = [(10 + 1) / (10 + 5)] + [(0 + 1) / (10 + 5)] * 4
    for b in range(5):
        expected = round((q[b] - p[b]) * math.log(q[b] / p[b]), 4)
        assert rows[b].psi_term == expected, (b, rows[b].psi_term, expected)
    # identical snapshots: every term exactly 0.0
    same = {r.bin: r.psi_term for r in psi_drift(ref, ref, "v", bins=5).collect()}
    assert all(v == 0.0 for v in same.values())


def test_psi_out_of_range_clamps_to_edge_bins(spark):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.profile import (
        psi_drift,
    )

    ref = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    cur = spark.createDataFrame([(-50.0,), (999.0,), (999.0,)], "v double")
    rows = {r.bin: r for r in psi_drift(ref, cur, "v", bins=5).collect()}
    assert rows[0].n_cur == 1  # below lo -> first bin
    assert rows[4].n_cur == 2  # above hi -> last bin (visible drift)
    assert sum(r.n_cur for r in rows.values()) == 3


def test_psi_categorical_tracks_appear_and_vanish(spark):
    import math

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.profile import (
        psi_drift_categorical,
    )

    ref = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 4, "c string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 5 + [("z",)] * 5, "c string"
    )
    rows = {r.category: r for r in psi_drift_categorical(ref, cur, "c").collect()}
    assert set(rows) == {"a", "b", "z"}  # vanished b AND appeared z present
    assert (rows["b"].n_ref, rows["b"].n_cur) == (4, 0)
    assert (rows["z"].n_ref, rows["z"].n_cur) == (0, 5)
    k = 3
    p_b, q_b = (4 + 1) / (10 + k), (0 + 1) / (10 + k)
    assert rows["b"].psi_term == round((q_b - p_b) * math.log(q_b / p_b), 4)


def test_psi_guards(spark):
    import pytest as _pytest

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.profile import (
        psi_drift,
    )

    ref = spark.createDataFrame([(1.0,)], "v double")
    with _pytest.raises(ValueError, match="bins"):
        psi_drift(ref, ref, "v", bins=1)
    with _pytest.raises(ValueError, match="together"):
        psi_drift(ref, ref, "v", lo=0.0)
    with _pytest.raises(ValueError, match="hi > lo"):
        psi_drift(ref, ref, "v", lo=5.0, hi=5.0)
    empty = spark.createDataFrame([], "v double")
    with _pytest.raises(ValueError, match="no non-NULL"):
        psi_drift(empty, ref, "v")
