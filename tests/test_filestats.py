"""File-skipping index (filestats.py): pruned reads must scan fewer
files yet return exactly the full-scan-filter result; unindexed
appends and missing stats must fail open (correctness never depends on
the advisory index)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.compact import (
    compact_partition,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.filestats import (
    read_file_stats,
    read_partition_pruned,
    write_file_stats,
)

PART = "2024-03-01"


def _table(spark, tmp_path, name="t") -> str:
    table = str(tmp_path / name)
    df = spark.range(4096).selectExpr(
        "CAST(id % 64 AS DOUBLE) AS a",
        "CAST((id DIV 64) % 64 AS DOUBLE) AS b",
        "id AS payload",
    )
    df.repartition(8).write.parquet(os.path.join(table, f"partition_date={PART}"))
    return table


def _expected(spark, pdir: str, lo: float, hi: float):
    full = spark.read.parquet(pdir).where(
        (F.col("a") >= lo) & (F.col("a") <= hi)
    )
    return sorted(r["payload"] for r in full.collect())


def test_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    table = _table(spark, tmp_path)
    pdir = os.path.join(table, f"partition_date={PART}")
    pbytes = sum(
        os.path.getsize(os.path.join(pdir, f))
        for f in os.listdir(pdir)
        if f.endswith(".parquet")
    )
    n = compact_partition(
        spark, table, PART, target_bytes=max(1, pbytes // 16),
        zorder_by=["a", "b"], file_stats_for=["a", "b"],
    )
    assert n > 4
    stats = read_file_stats(table, PART)
    assert stats and set(stats["cols"]) == {"a", "b"}
    assert len(stats["files"]) == len(
        [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    )
    pruned = read_partition_pruned(spark, table, PART, "a", lo=10.0, hi=12.0)
    n_total = len([f for f in os.listdir(pdir) if f.endswith(".parquet")])
    assert len(pruned.inputFiles()) < n_total  # actually skipped files
    assert sorted(r["payload"] for r in pruned.collect()) == _expected(
        spark, pdir, 10.0, 12.0
    )


def test_unindexed_append_is_always_read(spark, tmp_path):
    table = _table(spark, tmp_path)
    pdir = os.path.join(table, f"partition_date={PART}")
    write_file_stats(spark, table, PART, ["a"])
    # append a file AFTER the stats snapshot, containing in-range rows
    spark.createDataFrame(
        [(11.0, 0.0, 999_999)], "a double, b double, payload long"
    ).coalesce(1).write.mode("append").parquet(pdir)
    pruned = read_partition_pruned(spark, table, PART, "a", lo=10.0, hi=12.0)
    got = sorted(r["payload"] for r in pruned.collect())
    assert 999_999 in got
    assert got == _expected(spark, pdir, 10.0, 12.0)


def test_missing_stats_degrades_to_full_read(spark, tmp_path):
    table = _table(spark, tmp_path)
    pdir = os.path.join(table, f"partition_date={PART}")
    pruned = read_partition_pruned(spark, table, PART, "a", lo=10.0, hi=12.0)
    assert sorted(r["payload"] for r in pruned.collect()) == _expected(
        spark, pdir, 10.0, 12.0
    )


def test_disjoint_predicate_reads_zero_files_keeps_schema(spark, tmp_path):
    table = _table(spark, tmp_path)
    write_file_stats(spark, table, PART, ["a"])
    pruned = read_partition_pruned(spark, table, PART, "a", lo=1000.0)
    assert pruned.count() == 0
    assert set(pruned.columns) == {"a", "b", "payload"}


def test_stats_survive_the_compaction_swap_only_when_fresh(spark, tmp_path):
    """Compaction without file_stats_for must leave NO stale stats
    behind (the old stats file lived in the replaced directory)."""
    table = _table(spark, tmp_path)
    write_file_stats(spark, table, PART, ["a"])
    assert read_file_stats(table, PART)
    compact_partition(spark, table, PART, target_bytes=1 << 40)
    assert read_file_stats(table, PART) is None


def test_timestamp_column_stats_round_trip_and_prune(spark, tmp_path):
    """Timestamp min/max must serialize (ISO strings) and prune with
    string bounds; a numeric bound against them fails open."""
    table = str(tmp_path / "ts")
    pdir = os.path.join(table, f"partition_date={PART}")
    spark.sql(
        "SELECT timestamp'2024-03-01 10:00:00' + make_interval(0,0,0,0,0,0,id*3600) AS ts,"
        " id AS payload FROM range(48)"
    ).repartitionByRange(4, "ts").write.parquet(pdir)
    write_file_stats(spark, table, PART, ["ts"])
    pruned = read_partition_pruned(
        spark, table, PART, "ts",
        lo="2024-03-01 10:00:00", hi="2024-03-01 13:00:00",
    )
    assert len(pruned.inputFiles()) < 4
    assert pruned.count() == 4
    # a native datetime bound is a VALID Spark filter but can't compare
    # against the string-serialized stats: pruning must fail open (read
    # all files) and still return the right rows
    import datetime

    lo_dt = datetime.datetime(2024, 3, 2, 10, 0, 0)
    unpruned = read_partition_pruned(spark, table, PART, "ts", lo=lo_dt)
    assert len(unpruned.inputFiles()) == 4  # no pruning, no crash
    assert unpruned.count() == 24


def test_table_pruned_read_combines_both_tiers(spark, tmp_path):
    """Partition list cuts days; file stats cut files within each kept
    day; results equal the full-scan filter."""
    table = str(tmp_path / "multi")
    for day in ("2024-03-01", "2024-03-02", "2024-03-03"):
        pdir = os.path.join(table, f"partition_date={day}")
        spark.range(1024).selectExpr(
            "CAST(id % 64 AS DOUBLE) AS a", "id AS payload"
        ).repartitionByRange(4, "a").write.parquet(pdir)
        write_file_stats(spark, table, day, ["a"])

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.filestats import (
        read_table_pruned,
    )

    df = read_table_pruned(
        spark, table, "a", lo=5.0, hi=8.0,
        partitions=["2024-03-01", "2024-03-02"],
    )
    assert set(df.columns) == {"a", "payload", "partition_date"}
    assert len(df.inputFiles()) < 8  # 2 days kept x <4 files each
    rows = df.collect()
    assert {r["partition_date"] for r in rows} == {"2024-03-01", "2024-03-02"}
    expected = (
        spark.read.parquet(table)
        .where("a BETWEEN 5.0 AND 8.0 AND partition_date <= '2024-03-02'")
        .count()
    )
    assert len(rows) == expected
