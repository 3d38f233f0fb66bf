"""Batch format connectors: parquet/orc/csv/json round-trips preserve
rows and types; csv/json refuse schema inference; file sizing works."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources import (
    BATCH_FORMATS,
    read_batch,
    write_batch,
)

SCHEMA = "k bigint, name string, price double, flag boolean, day string"


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "alpha", 1.5, True, "2024-03-01"),
        (2, "beta", 2.25, False, "2024-03-01"),
        (3, "gamma", -0.75, True, "2024-03-02"),
        (4, None, 0.0, None, "2024-03-02"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.parametrize("fmt", BATCH_FORMATS)
def test_round_trip_preserves_rows_and_types(spark, tmp_path, frame, fmt):
    path = str(tmp_path / fmt)
    write_batch(frame, fmt, path)
    back = read_batch(spark, fmt, path, schema=SCHEMA)
    assert back.schema == frame.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, frame.collect()))


def test_partitioned_write_lays_out_hive_dirs(spark, tmp_path, frame):
    path = str(tmp_path / "bydate")
    write_batch(frame, "parquet", path, partition_by=["day"])
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{path}/day=*"))
    assert dirs == ["day=2024-03-01", "day=2024-03-02"]
    back = read_batch(spark, "parquet", path)
    assert back.count() == 4


def test_target_file_rows_bounds_file_size(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2).coalesce(1)
    path = str(tmp_path / "sized")
    write_batch(df, "parquet", path, target_file_rows=30)
    files = glob.glob(f"{path}/*.parquet")
    # 100 rows in one task at <=30 rows/file -> 4 files
    assert len(files) == 4


def test_inference_is_refused_for_textual_formats(spark, tmp_path, frame):
    path = str(tmp_path / "csv")
    write_batch(frame, "csv", path)
    with pytest.raises(ValueError, match="explicit schema"):
        read_batch(spark, "csv", path)
    with pytest.raises(ValueError, match="unsupported format"):
        read_batch(spark, "avro", path)
