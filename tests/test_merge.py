"""merge_into: copy-on-write upsert semantics, partition-scoped rewrite
(untouched partitions' files are byte-identical afterwards), version
resolution, cross-partition key moves, first-write path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.merge import (
    merge_into,
)

PF = "partition_date"


def _base(spark):
    return spark.createDataFrame(
        [
            (1, "2024-03-01", 10.0),
            (2, "2024-03-01", 20.0),
            (3, "2024-03-02", 30.0),
            (4, "2024-03-03", 40.0),
        ],
        f"event_id long, {PF} string, value double",
    )


def _files(root, part):
    pdir = os.path.join(root, f"{PF}={part}")
    return sorted(
        f for f in os.listdir(pdir) if not f.startswith(("_", "."))
    )


def test_merge_upsert_basics(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])  # first write
    before_03 = _files(path, "2024-03-03")

    updates = spark.createDataFrame(
        [
            (2, "2024-03-01", 99.0),   # update existing
            (5, "2024-03-02", 50.0),   # insert into existing partition
            (6, "2024-03-04", 60.0),   # insert into NEW partition
        ],
        f"event_id long, {PF} string, value double",
    )
    rewritten = merge_into(spark, path, updates, ["event_id"])
    assert rewritten == ["2024-03-01", "2024-03-02", "2024-03-04"]

    got = {
        r.event_id: (str(r[PF]), r.value)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("2024-03-01", 10.0),
        2: ("2024-03-01", 99.0),
        3: ("2024-03-02", 30.0),
        4: ("2024-03-03", 40.0),
        5: ("2024-03-02", 50.0),
        6: ("2024-03-04", 60.0),
    }
    # untouched partition not rewritten: same data files, byte-for-byte names
    assert _files(path, "2024-03-03") == before_03


def test_merge_version_resolution(spark, tmp_path):
    """Duplicate keys within the update batch: the highest version_col
    wins; a resolution-only version column (absent from the table
    schema) is dropped after resolving. Without version_col, an
    extra column is a loud error, not a silent schema drift."""
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])
    dup_updates = spark.createDataFrame(
        [
            (2, "2024-03-01", 111.0, 1),
            (2, "2024-03-01", 222.0, 7),  # higher version wins
        ],
        f"event_id long, {PF} string, value double, version int",
    )
    with pytest.raises(ValueError, match="absent from the table"):
        merge_into(spark, path, dup_updates, ["event_id"])
    merge_into(spark, path, dup_updates, ["event_id"], version_col="version")
    got = {
        r.event_id: r.value for r in spark.read.parquet(path).collect()
    }
    assert got[2] == 222.0
    assert len(got) == 4  # no duplicate insert of key 2


def test_merge_scope_table_moves_key(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])
    # event 4 moves from 03-03 (where it is the ONLY row) to 03-01
    updates = spark.createDataFrame(
        [(4, "2024-03-01", 44.0)],
        f"event_id long, {PF} string, value double",
    )
    rewritten = merge_into(spark, path, updates, ["event_id"], scope="table")
    assert rewritten == ["2024-03-01", "2024-03-03"]
    rows = spark.read.parquet(path).collect()
    got = {r.event_id: (str(r[PF]), r.value) for r in rows}
    assert got[4] == ("2024-03-01", 44.0)
    assert len(rows) == 4  # no stale duplicate of event 4
    # the fully-vacated partition directory is gone
    assert not os.path.isdir(os.path.join(path, f"{PF}=2024-03-03"))


def test_merge_scope_partitions_documents_stale_copy(spark, tmp_path):
    """The documented limitation: partition scope does NOT chase a key
    that moved partitions — the stale copy survives (use scope='table')."""
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])
    updates = spark.createDataFrame(
        [(4, "2024-03-01", 44.0)],
        f"event_id long, {PF} string, value double",
    )
    merge_into(spark, path, updates, ["event_id"], scope="partitions")
    n4 = spark.read.parquet(path).where("event_id = 4").count()
    assert n4 == 2  # old copy in 03-03 + new copy in 03-01


def test_merge_rejects_bad_input(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])
    with pytest.raises(ValueError, match="scope"):
        merge_into(spark, path, _base(spark), ["event_id"], scope="bogus")
    with pytest.raises(ValueError, match="partition column"):
        merge_into(
            spark,
            path,
            _base(spark).drop(PF),
            ["event_id"],
        )


def test_merge_on_hadoop_fs_uri(spark, tmp_path):
    """The merge runs against URI paths through the FS layer (same code
    path as hdfs://), including vacated-partition deletion."""
    path = f"file://{tmp_path}/t"
    merge_into(spark, path, _base(spark), ["event_id"])
    updates = spark.createDataFrame(
        [(4, "2024-03-01", 44.0)],
        f"event_id long, {PF} string, value double",
    )
    rewritten = merge_into(spark, path, updates, ["event_id"], scope="table")
    assert rewritten == ["2024-03-01", "2024-03-03"]
    assert spark.read.parquet(path).where("event_id = 4").count() == 1
    assert not os.path.isdir(str(tmp_path / "t" / f"{PF}=2024-03-03"))


def test_merge_with_date_typed_updates(spark, tmp_path):
    """Regression: an updates frame READ BACK from parquet carries
    partition_date as DATE, not string — the partition bookkeeping must
    not mistake type for identity (it once deleted a freshly written
    partition because 'date(2024,3,1) not in {"2024-03-01"}')."""
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])
    # round-trip through parquet: partition col comes back DATE-typed
    fix = (
        spark.read.parquet(path)
        .where("event_id = 2")
        .withColumn("value", F.lit(99.0))
    )
    assert str(fix.schema[PF].dataType) != "StringType()"
    rewritten = merge_into(spark, path, fix, ["event_id"])
    assert rewritten == ["2024-03-01"]
    after = spark.read.parquet(path)
    assert after.count() == 4
    assert after.where("event_id = 2").first().value == 99.0


def test_merge_cli_end_to_end(spark, tmp_path):
    """The run_merge CLI applies a parquet correction feed under the
    ingest lock."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.cli import (
        run_merge,
    )

    wh = str(tmp_path / "wh")
    merge_into(spark, os.path.join(wh, "transfers"), _base(spark), ["event_id"])
    upd_path = str(tmp_path / "updates")
    spark.createDataFrame(
        [(2, "2024-03-01", 99.0)],
        f"event_id long, {PF} string, value double",
    ).write.parquet(upd_path)
    run_merge.main([
        "--warehouse", wh, "--table", "transfers",
        "--updates-path", upd_path, "--keys", "event_id",
        "--lock-path", str(tmp_path / "m.lock"),
    ])
    got = {
        r.event_id: r.value
        for r in spark.read.parquet(os.path.join(wh, "transfers")).collect()
    }
    assert got[2] == 99.0 and len(got) == 4


def test_merge_schema_evolution(spark, tmp_path):
    """allow_new_columns adds update-only columns; surviving target rows
    get nulls, and mixed-schema reads need mergeSchema (the standard
    parquet evolution contract)."""
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])
    updates = spark.createDataFrame(
        [(2, "2024-03-01", 99.0, "corrected")],
        f"event_id long, {PF} string, value double, note string",
    )
    with pytest.raises(ValueError, match="absent from the table"):
        merge_into(spark, path, updates, ["event_id"])
    rewritten = merge_into(
        spark, path, updates, ["event_id"], allow_new_columns=True
    )
    assert rewritten == ["2024-03-01"]
    got = {
        r.event_id: (r.value, r.note)
        for r in spark.read.option("mergeSchema", "true").parquet(path).collect()
    }
    assert got[2] == (99.0, "corrected")
    assert got[1] == (10.0, None)   # surviving row in rewritten partition
    assert got[3] == (30.0, None)   # untouched partition: column null via mergeSchema
    assert len(got) == 4


def test_merge_null_partition_rows_survive(spark, tmp_path):
    """Regression (review-confirmed data loss): rows living in the NULL
    (__HIVE_DEFAULT_PARTITION__) partition — where malformed-date
    records are routed — must survive a merge whose batch touches that
    partition, and must be updatable/chaseable like any other rows."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "2024-03-01", 10.0), (2, None, 20.0), (3, None, 30.0)],
        f"event_id long, {PF} string, value double",
    )
    merge_into(spark, path, base, ["event_id"])
    assert spark.read.parquet(path).count() == 3

    # batch inserts ONE unrelated null-partition row: 2 and 3 must live
    upd = spark.createDataFrame(
        [(9, None, 90.0)], f"event_id long, {PF} string, value double"
    )
    rewritten = merge_into(spark, path, upd, ["event_id"])
    assert rewritten == ["__HIVE_DEFAULT_PARTITION__"]
    got = {r.event_id: r.value for r in spark.read.parquet(path).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 30.0, 9: 90.0}

    # update a null-partition row in place
    merge_into(
        spark,
        path,
        spark.createDataFrame(
            [(2, None, 22.0)], f"event_id long, {PF} string, value double"
        ),
        ["event_id"],
    )
    got = {r.event_id: r.value for r in spark.read.parquet(path).collect()}
    assert got[2] == 22.0 and len(got) == 4

    # table scope: move a key OUT of the null partition; stale copy gone
    merge_into(
        spark,
        path,
        spark.createDataFrame(
            [(3, "2024-03-02", 33.0)], f"event_id long, {PF} string, value double"
        ),
        ["event_id"],
        scope="table",
    )
    rows = spark.read.parquet(path).collect()
    got = {r.event_id: (r[PF] and str(r[PF]), r.value) for r in rows}
    assert got[3] == ("2024-03-02", 33.0)
    assert len(rows) == 4


def test_merge_non_canonical_partition_string_no_data_loss(spark, tmp_path):
    """Regression (review-confirmed data loss): affected partitions must
    be collected from the POST-cast update frame. A non-canonical
    partition string ('2024-3-1') casts cleanly to DATE 2024-03-01 at
    write time, but collecting the RAW value made the target filter
    match nothing — the dynamic overwrite then rewrote partition
    2024-03-01 with only the update rows, deleting rows 1 and 2."""
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])  # canonical base

    upd = spark.createDataFrame(
        [(2, "2024-3-1", 99.0)],  # same partition, sloppy spelling
        f"event_id long, {PF} string, value double",
    )
    rewritten = merge_into(spark, path, upd, ["event_id"])
    assert rewritten == ["2024-03-01"]

    got = {
        r.event_id: (str(r[PF]), r.value)
        for r in spark.read.parquet(path).collect()
    }
    # row 1 survives; row 2 updated IN the canonical partition; no
    # phantom 2024-3-1 directory
    assert got == {
        1: ("2024-03-01", 10.0),
        2: ("2024-03-01", 99.0),
        3: ("2024-03-02", 30.0),
        4: ("2024-03-03", 40.0),
    }
    assert not os.path.exists(os.path.join(path, f"{PF}=2024-3-1"))


def test_merge_delete_tombstones(spark, tmp_path):
    """CDC deletes: tombstone rows remove their matched key; a
    partition fully emptied by tombstones loses its directory (dynamic
    overwrite alone would strand the stale files); tombstones for
    unknown keys are no-ops; the flag column never lands in the table."""
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])

    upd = spark.createDataFrame(
        [
            (2, "2024-03-01", None, True),    # delete existing
            (3, "2024-03-02", 33.0, False),   # plain update
            (4, "2024-03-03", None, True),    # delete -> empties 03-03
            (9, "2024-03-02", None, True),    # tombstone, key unknown
        ],
        f"event_id long, {PF} string, value double, is_deleted boolean",
    )
    rewritten = merge_into(
        spark, path, upd, ["event_id"], delete_col="is_deleted"
    )
    assert rewritten == ["2024-03-01", "2024-03-02", "2024-03-03"]
    got = {
        r.event_id: (str(r[PF]), r.value)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {1: ("2024-03-01", 10.0), 3: ("2024-03-02", 33.0)}
    assert "is_deleted" not in spark.read.parquet(path).columns
    # the fully-deleted partition's directory is gone, not stranded
    assert not os.path.exists(os.path.join(path, f"{PF}=2024-03-03"))


def test_merge_delete_version_resolution(spark, tmp_path):
    """A tombstone and a later re-insert of the same key resolve by
    version exactly like two upserts: the higher version wins whichever
    side it is."""
    path = str(tmp_path / "t")
    merge_into(spark, path, _base(spark), ["event_id"])

    upd = spark.createDataFrame(
        [
            # key 1: delete v5 beats update v3 -> row gone
            (1, "2024-03-01", 11.0, False, 3),
            (1, "2024-03-01", None, True, 5),
            # key 2: re-insert v6 beats delete v4 -> row updated
            (2, "2024-03-01", None, True, 4),
            (2, "2024-03-01", 22.0, False, 6),
        ],
        f"event_id long, {PF} string, value double, "
        "is_deleted boolean, ver int",
    )
    merge_into(
        spark, path, upd, ["event_id"],
        version_col="ver", delete_col="is_deleted",
    )
    got = {r.event_id: r.value for r in spark.read.parquet(path).collect()}
    assert 1 not in got
    assert got[2] == 22.0
    assert got[3] == 30.0 and got[4] == 40.0  # untouched partitions


def test_upsert_stream_writer_with_tombstones(spark, tmp_path):
    """The streaming upsert sink applies CDC deletes per micro-batch,
    and a replayed batch (same id) converges to the same state."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.streaming.pipeline import (
        UpsertStreamWriter,
    )

    path = str(tmp_path / "t")
    w = UpsertStreamWriter(
        source=None, path=path, key_cols=["event_id"],
        version_col="ver", delete_col="is_deleted",
    )
    b0 = spark.createDataFrame(
        [(1, "2024-03-01", 10.0, False, 1), (2, "2024-03-01", 20.0, False, 1)],
        f"event_id long, {PF} string, value double, is_deleted boolean, ver int",
    )
    w.process_batch(b0, 0)
    b1 = spark.createDataFrame(
        [(1, "2024-03-01", None, True, 2), (3, "2024-03-01", 30.0, False, 2)],
        f"event_id long, {PF} string, value double, is_deleted boolean, ver int",
    )
    w.process_batch(b1, 1)
    w.process_batch(b1, 1)  # replay: ledger skips, state unchanged
    got = {r.event_id: r.value for r in spark.read.parquet(path).collect()}
    assert got == {2: 20.0, 3: 30.0}
