"""Scale-layout evidence: Z-order compaction actually narrows per-file
parquet min/max stats on EVERY keyed column (linear clustering only
helps the leading one), and Spark's runtime bloom-filter join pruning
injects when the size thresholds admit it — the two file-skipping
mechanisms a 100 TB deployment leans on."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.compact import (
    compact_partition,
    zorder_key,
)

PART = "2024-03-01"


def _write_partition(spark, table: str, n: int = 4096) -> str:
    # (a, b) is the full 64x64 grid — genuinely independent axes: a
    # linear sort on a leaves b spanning its whole range in every file
    df = spark.range(n).selectExpr(
        "CAST(id % 64 AS DOUBLE) AS a",
        "CAST((id DIV 64) % 64 AS DOUBLE) AS b",
        "id AS payload",
    )
    df.repartition(8).write.parquet(os.path.join(table, f"partition_date={PART}"))
    return table


def _per_file_coverage(pdir: str, col: str) -> float:
    """Mean fraction of the column's global range each file spans —
    1.0 = no clustering, ~1/n_files = perfect clustering."""
    spans, glo, ghi = [], float("inf"), float("-inf")
    files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    assert len(files) > 1, files
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo, hi = float("inf"), float("-inf")
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = min(lo, c.statistics.min)
                    hi = max(hi, c.statistics.max)
        assert lo <= hi, (f, col)
        spans.append((lo, hi))
        glo, ghi = min(glo, lo), max(ghi, hi)
    width = ghi - glo
    return sum((hi - lo) / width for lo, hi in spans) / len(spans)


def test_zorder_narrows_all_keyed_columns(spark, tmp_path):
    zt = _write_partition(spark, str(tmp_path / "zorder"))
    lin = _write_partition(spark, str(tmp_path / "linear"))
    pbytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(zt, f"partition_date={PART}", "*.parquet"))
    )
    target = max(1, pbytes // 16)
    nz = compact_partition(spark, zt, PART, target_bytes=target, zorder_by=["a", "b"])
    nl = compact_partition(spark, lin, PART, target_bytes=target, cluster_by=["a"])
    assert nz > 4 and nl > 4
    zdir = os.path.join(zt, f"partition_date={PART}")
    ldir = os.path.join(lin, f"partition_date={PART}")
    za, zb = _per_file_coverage(zdir, "a"), _per_file_coverage(zdir, "b")
    la, lb = _per_file_coverage(ldir, "a"), _per_file_coverage(ldir, "b")
    # linear: perfect on the sort column, useless on the other
    assert la < 0.3 and lb > 0.85, (la, lb)
    # zorder: BOTH columns substantially narrowed per file
    assert za < 0.6 and zb < 0.6, (za, zb)
    # row preservation through the rewrite
    assert spark.read.parquet(zdir).count() == 4096


def test_zorder_key_handles_nulls_and_degenerate_bounds(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (1.0, 5.0), (64.0, 5.0)], "a double, b double"
    )
    out = df.select(
        zorder_key({"a": (0.0, 32.0), "b": (5.0, 5.0)}).alias("z")
    ).collect()
    zs = [r["z"] for r in out]
    assert all(z is not None and z >= 0 for z in zs)
    # out-of-bounds value clamps to the max bucket, not overflow
    assert zs[2] == max(zs)


def test_runtime_bloom_filter_injects_for_selective_dim(spark):
    """With the size thresholds admitted (at 100 TB the defaults — 10 GB
    application-side scan, 10 MB creation side — admit every real fact
    join on their own), a selective dim predicate turns into a bloom
    filter probed on the fact side of the shuffle join, cutting shuffle
    volume before the exchange."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(100_000).selectExpr("id", "id % 1000 AS k")
        dim = spark.range(1000).selectExpr("id AS k", "id % 7 AS attr").where(
            F.col("attr") == 3
        )
        plan = (
            fact.join(dim, "k")._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
