"""Lifecycle maintenance for the persistent dedup stores: duplicate
reclaim, batch-horizon retention, crash-healed bucketed rewrites, and
the guard that stops path-compaction flattening a bucketed layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.dedup import (
    BandBucketStore,
    FingerprintStore,
)
from test_near_dup_store import BASE, NEAR, OTHER, _store_side_chain


def _drop(spark, *tables):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sink import (
        clear_orphan_table_location,
    )

    for t in tables:
        for suffix in ("", "_sigs", "_params", "__compacting",
                       "_sigs__compacting", "_params__compacting"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")
            clear_orphan_table_location(spark, f"{t}{suffix}")


SCHEMA = "doc_id long, text string"


def _no_exchange_on_store_side(spark, store, probe, table):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            store.screen(probe)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    chain = _store_side_chain(plan, table)
    assert any("Join" in l for l in chain), plan
    assert not any("Exchange" in l for l in chain), plan


def test_fingerprint_store_compact_reclaims_duplicates(spark):
    _drop(spark, "fp_life_a")
    store = FingerprintStore(spark, "fp_life_a", n_buckets=4)
    try:
        b1 = spark.createDataFrame(
            [(1, "alpha text"), (2, "beta text")], SCHEMA
        )
        store.commit(b1, batch_tag="runA#0")
        store.commit(b1, batch_tag="runA#0")  # crash-replay residue
        store.commit(
            spark.createDataFrame([(3, "gamma text")], SCHEMA),
            batch_tag="runA#1",
        )
        assert spark.table("fp_life_a").count() == 5
        info = store.compact()
        assert info == {"rows_before": 5, "rows_after": 3}
        # the survivor keeps its original tag (replay exclusion intact)
        tags = {
            r.batch_tag for r in spark.table("fp_life_a").collect()
        }
        assert tags == {"runA#0", "runA#1"}
        # the rewrite collapsed the three commits' files to <= n_buckets
        assert len(spark.table("fp_life_a").inputFiles()) <= 4
        # screen still sees everything; store side still exchange-free
        probe = spark.createDataFrame(
            [(10, "alpha text"), (11, "delta text")], SCHEMA
        )
        assert {r.doc_id for r in store.screen(probe).collect()} == {11}
        _no_exchange_on_store_side(spark, store, probe, "fp_life_a")
        # appends after compaction keep working (insertInto layout)
        store.commit(
            spark.createDataFrame([(11, "delta text")], SCHEMA),
            batch_tag="runA#2",
        )
        assert store.screen(probe).count() == 0
    finally:
        _drop(spark, "fp_life_a")


def test_fingerprint_store_retention_by_batch_horizon(spark):
    _drop(spark, "fp_life_b")
    store = FingerprintStore(spark, "fp_life_b", n_buckets=4)
    try:
        store.commit(
            spark.createDataFrame([(1, "old text one")], SCHEMA),
            batch_tag="runA#0",
        )
        store.commit(
            spark.createDataFrame([(2, "kept text two")], SCHEMA),
            batch_tag="runA#5",
        )
        store.commit(
            spark.createDataFrame([(3, "foreign text")], SCHEMA),
            batch_tag="runB#0",
        )
        store.commit(
            spark.createDataFrame([(4, "untagged text")], SCHEMA),
        )
        with pytest.raises(ValueError, match="together"):
            store.compact(expire_run_tag="runA")
        info = store.compact(expire_run_tag="runA", expire_below_batch=5)
        assert info["rows_after"] == 3  # runA#0 expired, others kept
        # expired content is re-admittable; retained content still screens
        probe = spark.createDataFrame(
            [(10, "old text one"), (11, "kept text two"),
             (12, "foreign text"), (13, "untagged text")],
            SCHEMA,
        )
        assert {r.doc_id for r in store.screen(probe).collect()} == {10}
    finally:
        _drop(spark, "fp_life_b")


def test_fingerprint_store_heals_crashed_rewrite(spark):
    """Crash between DROP and RENAME leaves only the scratch table; the
    next store open promotes it (content was complete pre-drop)."""
    _drop(spark, "fp_life_c")
    store = FingerprintStore(spark, "fp_life_c", n_buckets=4)
    try:
        store.commit(
            spark.createDataFrame([(1, "alpha"), (2, "beta")], SCHEMA),
            batch_tag="r#0",
        )
        # simulate the mid-swap crash state
        from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sink import (
            write_bucketed_table,
        )

        write_bucketed_table(
            spark.table("fp_life_c"), "fp_life_c__compacting", ["fp"],
            n_buckets=4, sort_cols=["fp"],
        )
        spark.sql("DROP TABLE fp_life_c")
        healed = FingerprintStore(spark, "fp_life_c", n_buckets=4)
        assert healed.exists()
        assert spark.table("fp_life_c").count() == 2
        assert not spark.catalog.tableExists("fp_life_c__compacting")
        # stale-scratch case: both exist -> scratch discarded
        write_bucketed_table(
            spark.table("fp_life_c").limit(1), "fp_life_c__compacting",
            ["fp"], n_buckets=4,
        )
        FingerprintStore(spark, "fp_life_c", n_buckets=4)
        assert spark.table("fp_life_c").count() == 2
        assert not spark.catalog.tableExists("fp_life_c__compacting")
    finally:
        _drop(spark, "fp_life_c")


def test_band_store_compact_preserves_screen_and_plan(spark):
    _drop(spark, "band_life_a")
    store = BandBucketStore(spark, "band_life_a", n_buckets=4)
    try:
        b1 = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
        store.commit(b1, batch_tag="r#0")
        store.commit(b1, batch_tag="r#0")  # replay residue in BOTH tables
        n_bands = spark.table("band_life_a").count()
        n_sigs = spark.table("band_life_a_sigs").count()
        info = store.compact()
        assert info["band_life_a"]["rows_after"] == n_bands // 2
        assert info["band_life_a_sigs"]["rows_after"] == n_sigs // 2
        # maintenance reopen adopts recorded params
        reopened = BandBucketStore.open(spark, "band_life_a")
        probe = spark.createDataFrame([(10, NEAR), (11, "novel words "
                                       "entirely unlike the rest")], SCHEMA)
        assert {r.doc_id for r in reopened.screen(probe).collect()} == {11}
        for t in ("band_life_a", "band_life_a_sigs"):
            _no_exchange_on_store_side(spark, reopened, probe, t)
    finally:
        _drop(spark, "band_life_a")


def test_compact_partition_refuses_bucketed_files(spark, tmp_path):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.compact import (
        compact_partition,
    )

    t = tmp_path / "tbl" / "partition_date=2024-03-01"
    t.mkdir(parents=True)
    (t / "part-00000-abc_00003.c000.snappy.parquet").write_bytes(b"")
    with pytest.raises(ValueError, match="BUCKETED"):
        compact_partition(spark, str(tmp_path / "tbl"), "2024-03-01")


def test_store_create_heals_orphaned_warehouse_location(spark):
    """A killed session can leave spark-warehouse/<table>/ on disk with
    NO catalog entry (the in-memory catalog forgets); every later create
    then failed LOCATION_ALREADY_EXISTS forever. Pre-seed exactly that
    residue for every table a BandBucketStore creates and assert the
    store still comes up — create-time healing, the round-7 fix."""
    import os

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sink import (
        clear_orphan_table_location,
        managed_table_location,
    )

    _drop(spark, "orphan_band", "orphan_fp")
    try:
        for t in ("orphan_band", "orphan_band_sigs", "orphan_band_params",
                  "orphan_band__compacting", "orphan_fp"):
            loc = managed_table_location(spark, t)
            assert loc is not None
            os.makedirs(os.path.join(loc, "stale"), exist_ok=True)
            with open(os.path.join(loc, "stale", "residue.parquet"), "wb") as f:
                f.write(b"\x00garbage")
            assert not spark.catalog.tableExists(t)

        band = BandBucketStore(spark, "orphan_band", n_buckets=4)
        b1 = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
        band.commit(band.screen(b1), batch_tag="r#0")
        assert spark.catalog.tableExists("orphan_band")
        assert {r.doc_id for r in band.screen(
            spark.createDataFrame([(3, NEAR)], SCHEMA)).collect()} == set()

        fp = FingerprintStore(spark, "orphan_fp", n_buckets=4)
        fresh = fp.screen(b1)
        fp.commit(fresh, batch_tag="r#0")
        assert spark.table("orphan_fp").count() == 2

        # healing must NOT touch a live table's location: re-create with
        # the catalog entry present is a no-op clear + normal overwrite
        assert clear_orphan_table_location(spark, "orphan_fp") is False
        assert spark.table("orphan_fp").count() == 2
    finally:
        _drop(spark, "orphan_band", "orphan_fp")
