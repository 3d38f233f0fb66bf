"""BandBucketStore: persistent cross-batch NEAR-duplicate screening —
the near-dup twin of FingerprintStore. Covers incremental screening,
within-batch representatives, the replay exclude_tag contract, the
banding-params layout contract, the no-Exchange store-side plan, and
the CorpusIngestPipeline crash matrix with the near store wired in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.dedup import (
    BandBucketStore,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.streaming.corpus import (
    CorpusIngestPipeline,
)

SCHEMA = "doc_id long, text string"

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets "
    "over the quiet harbor town and the fishermen haul their nets "
    "ashore before the evening tide turns against them"
)
NEAR = BASE.replace("evening tide", "morning tide")        # ~0.95 jaccard
NEAR2 = BASE.replace("lazy dog", "sleepy dog")             # another variant
OTHER = (
    "completely different content about distributed query engines "
    "columnar storage vectorized execution and adaptive shuffle "
    "planning at petabyte scale with cost based optimizers"
)


def _drop(spark, table):
    # location-aware: also sweeps orphaned warehouse directories a
    # previously-killed process left behind with no catalog entry,
    # so the suite self-heals from any starting disk state
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sink import (
        clear_orphan_table_location,
    )

    for t in (table, f"{table}_sigs", f"{table}_params"):
        for suffix in ("", "__compacting"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")
            clear_orphan_table_location(spark, f"{t}{suffix}")


def test_band_store_incremental_near_dedup(spark):
    _drop(spark, "band_store_a")
    store = BandBucketStore(spark, "band_store_a", n_buckets=4)
    try:
        b1 = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
        fresh1 = store.screen(b1)
        assert {r.doc_id for r in fresh1.collect()} == {1, 2}
        store.commit(fresh1, batch_tag="run#0")

        b2 = spark.createDataFrame(
            [(10, NEAR),     # near-dup of admitted doc 1 → dropped
             (11, "fresh unrelated text about marine biology and coral "
                  "reef ecosystems under thermal stress observations"),
             (12, NEAR2)],   # near-dup of admitted doc 1 → dropped
            SCHEMA,
        )
        fresh2 = store.screen(b2, exclude_tag="run#1")
        assert {r.doc_id for r in fresh2.collect()} == {11}
        store.commit(fresh2, batch_tag="run#1")

        # the store holds postings+sigs for docs 1, 2, 11 only
        assert spark.table("band_store_a_sigs").count() == 3

        # replay contract: the batch's OWN commits are excluded, so its
        # own documents are not screened out on a crash replay
        assert store.screen(b2, exclude_tag="run#1").count() == 1
        # without the exclusion the replayed batch screens itself out
        assert store.screen(b2).count() == 0
    finally:
        _drop(spark, "band_store_a")


def test_band_store_within_batch_representative(spark):
    """Within one batch the min-id doc of a near-dup pair survives —
    the same deterministic keep rule as exact dedup."""
    _drop(spark, "band_store_wb")
    store = BandBucketStore(spark, "band_store_wb", n_buckets=4)
    try:
        b = spark.createDataFrame(
            [(5, BASE), (7, NEAR), (9, OTHER)], SCHEMA
        )
        kept = store.screen(b)
        assert {r.doc_id for r in kept.collect()} == {5, 9}
        # opting out keeps all three (store is empty)
        assert store.screen(b, within_batch=False).count() == 3
    finally:
        _drop(spark, "band_store_wb")


def test_band_store_params_are_a_layout_contract(spark):
    _drop(spark, "band_store_p")
    store = BandBucketStore(spark, "band_store_p", n_buckets=4)
    try:
        store.commit(spark.createDataFrame([(1, BASE)], SCHEMA))
        with pytest.raises(ValueError, match="layout contract"):
            BandBucketStore(spark, "band_store_p", num_hashes=32,
                            bands=4, rows_per_band=8, n_buckets=4)
        # matching params reopen fine
        BandBucketStore(spark, "band_store_p", n_buckets=4)
    finally:
        _drop(spark, "band_store_p")

    with pytest.raises(ValueError, match="exceeds num_hashes"):
        BandBucketStore(spark, "band_store_x", num_hashes=16,
                        bands=8, rows_per_band=8)


def _store_side_chain(plan: str, table: str) -> list[str]:
    """Parent chain from the store table's scan up to its join."""
    lines = plan.splitlines()

    def depth(line: str) -> int:
        body = line.lstrip(" :+-")
        return (len(line) - len(body)) // 3

    scan_i = next(
        i for i, l in enumerate(lines) if table in l and "Scan" in l
    )
    d = depth(lines[scan_i])
    chain = []
    for i in range(scan_i - 1, -1, -1):
        if depth(lines[i]) < d:
            chain.append(lines[i])
            d = depth(lines[i])
            if "Join" in lines[i]:
                break
    return chain


def test_band_store_screen_never_shuffles_store_side(spark):
    """The 100 TB contract: both store tables are read bucket-locally —
    the candidate join hangs off the band scan and the verify join off
    the sig scan with NO Exchange between scan and join (broadcast
    disabled so the at-scale SortMergeJoin shape is what's asserted)."""
    _drop(spark, "band_store_plan")
    store = BandBucketStore(spark, "band_store_plan", n_buckets=4)
    try:
        store.commit(
            spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA),
            batch_tag="run#0",
        )
        probe = spark.createDataFrame([(10, NEAR)], SCHEMA)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                store.screen(probe, within_batch=False)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        for table in ("band_store_plan", "band_store_plan_sigs"):
            chain = _store_side_chain(plan, table)
            assert any("Join" in l for l in chain), plan
            assert not any("Exchange" in l for l in chain), (
                f"{table} side reshuffled:\n" + plan
            )
    finally:
        _drop(spark, "band_store_plan")


def test_corpus_pipeline_near_dup_crash_replay(spark, tmp_path, monkeypatch):
    """The near store joins the crash matrix: a crash between the band
    commit and the ledger commit replays the batch without losing its
    documents (exclude_tag covers the near store too), and cross-batch
    near-dups stay out after the replay."""
    doc_schema = "doc_id long, source string, text string"
    _drop(spark, "crash_fp_store")
    _drop(spark, "crash_band_store")
    pipe = CorpusIngestPipeline(
        source=None,
        corpus_dir=str(tmp_path / "corpus"),
        store_table="crash_fp_store",
        near_store_table="crash_band_store",
        store_buckets=4,
    )
    try:
        pipe.process_batch(
            spark.createDataFrame([(1, "web", BASE)], doc_schema), 0
        )
        b1 = spark.createDataFrame(
            [(2, "web", OTHER),   # genuinely new → must survive the crash
             (3, "web", NEAR)],   # near-dup of doc 1 → must stay out
            doc_schema,
        )
        real_commit = pipe.ledger.commit
        calls = {"n": 0}

        def dying(batch_id):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("crash before ledger commit")
            real_commit(batch_id)

        monkeypatch.setattr(pipe.ledger, "commit", dying)
        with pytest.raises(RuntimeError, match="crash"):
            pipe.process_batch(b1, 1)
        assert not pipe.ledger.is_committed(1)
        # band rows of the crashed batch ARE in the store
        assert (
            spark.table("crash_band_store_sigs")
            .where(F.col("batch_tag").contains("#1"))
            .count()
            > 0
        )
        # replay converges: doc 2 admitted exactly once, near-dup 3 out
        pipe.process_batch(b1, 1)
        got = sorted(
            r.doc_id for r in spark.read.parquet(pipe.docs_path()).collect()
        )
        assert got == [1, 2]
        # ledger-skip on the third delivery
        pipe.process_batch(b1, 1)
        assert spark.read.parquet(pipe.docs_path()).count() == 2
    finally:
        _drop(spark, "crash_fp_store")
        _drop(spark, "crash_band_store")
