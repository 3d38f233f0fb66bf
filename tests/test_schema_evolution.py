"""Additive schema evolution on catalog route tables.

The reference freezes each table's DDL at create time
(`Dcache_kafka_to_hive.py:161-262`); a new billing field means editing
four DDL strings and recreating tables. Here evolution is metadata-only
(`warehouse.evolve_table_add_columns`) and writers survive it through
name-based alignment (`warehouse.align_to_table`, used by
`sink.write_partitioned_table`). These tests pin the full lifecycle:
old files scan as NULL, pre-/post-evolution writers both land correctly,
scrambled frames can't mis-write, and compaction preserves the evolved
schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sink import (
    write_partitioned_table,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.warehouse import (
    align_to_table,
    create_route_table,
    drop_tables,
    evolve_table_add_columns,
)

from conftest import billing_record


def _routed_transfers(spark, dates):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.parse import (
        parse_billing,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.route import (
        route,
    )

    batch = spark.createDataFrame(
        [(billing_record("transfer", date=d),) for d in dates], ["value"]
    )
    return route(parse_billing(batch))["transfers"]


@pytest.fixture()
def evolving_table(spark, tmp_path):
    table = "t_evolve"
    drop_tables(spark, [table])
    create_route_table(spark, "transfers", table, str(tmp_path / table))
    yield table
    drop_tables(spark, [table])


def test_evolve_appends_before_partition_column(spark, evolving_table):
    before = [f.name for f in spark.table(evolving_table).schema.fields]
    schema = evolve_table_add_columns(
        spark,
        evolving_table,
        [
            T.StructField("tier", T.StringType()),
            T.StructField("retry_count", T.LongType()),
        ],
    )
    names = [f.name for f in schema.fields]
    # new data columns append after existing data columns; the partition
    # column stays last in scan order
    assert names == before[:-1] + ["tier", "retry_count", "partition_date"]
    assert schema["retry_count"].dataType == T.LongType()


def test_old_files_scan_as_null_new_rows_populated(spark, evolving_table):
    v1 = _routed_transfers(spark, ["2024-03-01T10:00:00.000+0000"])
    write_partitioned_table(v1, evolving_table)
    evolve_table_add_columns(
        spark, evolving_table, [T.StructField("tier", T.StringType())]
    )
    v2 = _routed_transfers(spark, ["2024-03-02T10:00:00.000+0000"]).withColumn(
        "tier", F.lit("gold")
    )
    write_partitioned_table(v2, evolving_table)

    rows = {
        r.partition_date: r.tier
        for r in spark.table(evolving_table).select("partition_date", "tier").collect()
    }
    assert rows == {"2024-03-01": None, "2024-03-02": "gold"}


def test_v1_writer_survives_evolution_via_alignment(spark, evolving_table):
    evolve_table_add_columns(
        spark, evolving_table, [T.StructField("tier", T.StringType())]
    )
    # a pre-evolution writer frame (no 'tier'): positional insertInto
    # would fail on arity; the aligned sink path fills a typed NULL
    v1 = _routed_transfers(spark, ["2024-03-03T10:00:00.000+0000"])
    assert "tier" not in v1.columns
    write_partitioned_table(v1, evolving_table)
    got = spark.table(evolving_table).select("tier", "cellName").collect()
    assert [(r.tier, r.cellName) for r in got] == [(None, "pool-a")]


def test_scrambled_frame_cannot_miswrite(spark, evolving_table):
    # two STRING columns swapped: positional insertInto would silently
    # cross-write them; alignment restores by name
    v1 = _routed_transfers(spark, ["2024-03-04T10:00:00.000+0000"])
    scrambled = v1.select(*reversed(v1.columns))
    write_partitioned_table(scrambled, evolving_table)
    r = spark.table(evolving_table).select("cellName", "session").first()
    assert (r.cellName, r.session) == ("pool-a", "s1")


def test_align_rejects_unknown_columns_and_drop_opt_in(spark, evolving_table):
    v_extra = _routed_transfers(spark, ["2024-03-05T10:00:00.000+0000"]).withColumn(
        "not_in_table", F.lit(1)
    )
    with pytest.raises(ValueError, match="not_in_table"):
        align_to_table(v_extra, evolving_table)
    aligned = align_to_table(v_extra, evolving_table, on_extra="drop")
    assert "not_in_table" not in aligned.columns
    assert aligned.columns == [
        f.name for f in spark.table(evolving_table).schema.fields
    ]
    with pytest.raises(ValueError, match="on_extra"):
        align_to_table(v_extra, evolving_table, on_extra="ignore")


def test_align_resolves_case_insensitively(spark, evolving_table):
    v1 = _routed_transfers(spark, ["2024-03-06T10:00:00.000+0000"])
    renamed = v1.withColumnRenamed("cellName", "CELLNAME")
    aligned = align_to_table(renamed, evolving_table)
    assert "cellName" in aligned.columns
    write_partitioned_table(renamed, evolving_table)
    assert spark.table(evolving_table).first().cellName == "pool-a"


def test_evolution_guards(spark, evolving_table):
    with pytest.raises(ValueError, match="no columns"):
        evolve_table_add_columns(spark, evolving_table, [])
    with pytest.raises(ValueError, match="partition column"):
        evolve_table_add_columns(
            spark, evolving_table, [T.StructField("partition_date", T.StringType())]
        )
    with pytest.raises(ValueError, match="already exists"):
        evolve_table_add_columns(
            spark, evolving_table, [T.StructField("CELLNAME", T.StringType())]
        )
    with pytest.raises(ValueError, match="already exists"):
        evolve_table_add_columns(
            spark,
            evolving_table,
            [
                T.StructField("dup", T.StringType()),
                T.StructField("DUP", T.LongType()),
            ],
        )
    with pytest.raises(ValueError, match="identifier"):
        evolve_table_add_columns(
            spark, evolving_table, [T.StructField("bad name", T.StringType())]
        )


def test_compaction_preserves_evolved_schema(spark, evolving_table, tmp_path):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.compact import (
        compact_table,
    )

    v1 = _routed_transfers(
        spark,
        ["2024-03-01T10:00:00.000+0000", "2024-03-01T11:00:00.000+0000"],
    )
    write_partitioned_table(v1, evolving_table)
    evolve_table_add_columns(
        spark, evolving_table, [T.StructField("tier", T.StringType())]
    )
    v2 = _routed_transfers(spark, ["2024-03-01T12:00:00.000+0000"]).withColumn(
        "tier", F.lit("gold")
    )
    write_partitioned_table(v2, evolving_table)

    compact_table(spark, str(tmp_path / evolving_table))
    spark.sql(f"REFRESH TABLE {evolving_table}")

    got = spark.table(evolving_table)
    assert [f.name for f in got.schema.fields][-2:] == ["tier", "partition_date"]
    tiers = sorted((r.tier or "-") for r in got.select("tier").collect())
    assert tiers == ["-", "-", "gold"]
