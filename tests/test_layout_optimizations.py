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


def test_zorder_rejects_non_numeric_columns(spark, tmp_path):
    t = str(tmp_path / "bad")
    spark.createDataFrame(
        [("x", 1.0)], "s string, a double"
    ).write.parquet(os.path.join(t, f"partition_date={PART}"))
    with pytest.raises(ValueError, match="numeric"):
        compact_partition(spark, t, PART, zorder_by=["s"])


def test_zorder_degenerate_bounds_keep_target_file_count(spark, tmp_path):
    """All-constant keyed columns carry no clustering signal: the
    rewrite must fall back to the size-targeted coalesce, not funnel
    the partition into one giant file."""
    t = str(tmp_path / "degen")
    df = spark.range(4096).selectExpr("CAST(7 AS DOUBLE) AS a", "id AS payload")
    df.repartition(8).write.parquet(os.path.join(t, f"partition_date={PART}"))
    pdir = os.path.join(t, f"partition_date={PART}")
    pbytes = sum(
        os.path.getsize(os.path.join(pdir, f))
        for f in os.listdir(pdir) if f.endswith(".parquet")
    )
    n = compact_partition(spark, t, PART, target_bytes=max(1, pbytes // 4),
                          zorder_by=["a"])
    files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    assert n > 1 and len(files) == n
    assert spark.read.parquet(pdir).count() == 4096


def test_zorder_key_bits_capped_to_64bit_key(spark):
    """9 columns x 8 bits would exceed a 64-bit key (JVM shifts wrap
    mod 64); the cap must keep every column's buckets monotone in the
    key's per-column bit planes instead of silently scrambling them."""
    bounds = {f"c{i}": (0.0, 256.0) for i in range(9)}
    df = spark.createDataFrame(
        [tuple(float(v) for _ in range(9)) for v in (0.0, 128.0, 255.0)],
        ", ".join(f"c{i} double" for i in range(9)),
    )
    zs = [r["z"] for r in df.select(zorder_key(bounds).alias("z")).collect()]
    assert zs[0] < zs[1] < zs[2]  # monotone, no wrapped-bit collisions
    assert all(z >= 0 for z in zs)


def _scan_rows(spark, df) -> int:
    """FileSourceScanExec numOutputRows of df's execution — rows that
    survived parquet row-group/page skipping, BEFORE Spark's Filter."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.metrics import (
        _node_metrics,
        _walk,
    )

    df._jdf.queryExecution().toRdd().count()
    rows = []
    _walk(
        df._jdf.queryExecution().executedPlan(),
        lambda node, cls: rows.append(
            _node_metrics(node).get("numOutputRows", 0)
        )
        if cls == "FileSourceScanExec"
        else None,
    )
    assert rows, "no FileSourceScanExec in plan"
    return sum(rows)


def _write_hash_partition(spark, table: str, n_per_file: int, n_files: int):
    """n_files batch files whose hash column spans the FULL md5 range in
    every file — min/max stats can't skip any of them — with enough
    distinct values that parquet's dictionary page falls back to plain
    encoding (so any observed skip is the bloom filter's, not
    dictionary filtering's)."""
    for i in range(n_files):
        df = spark.range(i * n_per_file, (i + 1) * n_per_file).selectExpr(
            "id", "md5(CAST(id AS STRING)) AS pnfsid"
        )
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(table, f"partition_date={PART}")
        )


def test_bloom_filter_compaction_skips_row_groups(spark, tmp_path):
    """compact(bloom_for=...) must let a point probe on a hash-like
    column skip whole row groups. Construction: 2 files x 100k distinct
    md5 values — every file spans the full value range (min/max
    useless) and the dictionary falls back to plain (dict filtering
    useless); only the bloom filter can prune. The control rewrite
    without bloom_for must scan everything."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.compact import (
        compact_table,
    )

    n, files = 100_000, 2
    probe = spark.sql("SELECT md5('123')").first()[0]  # id=123 -> file 0

    with_bloom = str(tmp_path / "bloomed")
    _write_hash_partition(spark, with_bloom, n, files)
    pdir = os.path.join(with_bloom, f"partition_date={PART}")
    pbytes = sum(
        os.path.getsize(os.path.join(pdir, f))
        for f in os.listdir(pdir) if f.endswith(".parquet")
    )
    # target half the partition -> the coalesce keeps 2 output files,
    # each one input file's rows = one row group per original range
    compact_table(spark, with_bloom, target_bytes=pbytes // files + 1,
                  bloom_for=["pnfsid"], bloom_ndv=n)

    control = str(tmp_path / "plain")
    _write_hash_partition(spark, control, n, files)
    compact_table(spark, control, target_bytes=pbytes // files + 1)

    q = lambda t: spark.read.parquet(t).where(F.col("pnfsid") == probe)  # noqa: E731
    assert q(with_bloom).count() == 1  # correctness first
    skipped = _scan_rows(spark, q(with_bloom))
    unskipped = _scan_rows(spark, q(control))
    assert unskipped == n * files  # nothing else could prune
    assert skipped <= n  # at least the non-matching group skipped


def test_bloom_for_unknown_column_fails_loud(spark, tmp_path):
    t = str(tmp_path / "bad_bloom")
    _write_hash_partition(spark, t, 100, 1)
    with pytest.raises(ValueError, match="bloom_for"):
        compact_partition(spark, t, PART, bloom_for=["no_such_col"])
