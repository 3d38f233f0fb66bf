"""Per-file min/max statistics index: file-level data skipping for the
plain-parquet warehouse, without adopting a table format.

The layout half of the story is ``compact.zorder_key`` / ``cluster_by``
(narrow per-file value ranges); this module is the read half: a small
advisory stats file per partition (``._filestats.json``, dot-prefixed so
Spark's listings and ``list_partitions`` never see it) mapping each data
file to its min/max per indexed column, and a reader that prunes the
file list against a predicate BEFORE Spark ever opens a footer. At
100 TB a day-partition can hold thousands of files; driver-side listing
+ JSON probe is O(files) metadata, and every skipped file saves a task,
a footer read, and a scan.

Consistency model (advisory, fail-open):
- stats are keyed by file NAME; a reader must treat any data file NOT
  present in the stats as must-read (new sink appends land unindexed
  and are still correct).
- a compaction rewrite replaces all data files, making old entries
  dangle harmlessly; refresh by passing ``file_stats_for`` to
  ``compact_partition`` (stats written AFTER the swap — a crash leaves
  either fresh stats or no stats, never wrong ones, because pruning
  only trusts entries whose file still exists).
- the pruned read re-applies the real predicate — skipping is a
  superset optimization, never the filter itself.

Stats are computed with a Spark scan of ONLY the indexed columns
(columnar projection — cheap right after the rewrite while the page
cache is warm), grouped by ``input_file_name``; that works on any
Hadoop-mountable FS, where footer-only reads would need parquet-hadoop
plumbing.
"""

from __future__ import annotations

import json
import os
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fs import get_filesystem
from .schema import PARTITION_FIELD

STATS_NAME = "._filestats.json"


def _partition_dir(path: str, partition: str) -> str:
    return os.path.join(path, f"{PARTITION_FIELD}={partition}")


def write_file_stats(
    spark: SparkSession,
    path: str,
    partition: str,
    cols: list[str],
    fs=None,
) -> dict:
    """Compute and persist per-file min/max for ``cols`` over one
    day-partition. Returns the stats mapping. One columnar scan of the
    indexed columns; the groupBy key is the file name, so partial
    aggregation collapses each file's rows map-side."""
    fs = fs or get_filesystem(path, spark)
    pdir = _partition_dir(path, partition)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
    rows = (
        spark.read.parquet(pdir)
        .groupBy(F.input_file_name().alias("__file"))
        .agg(*aggs)
        .collect()  # bounded: one row per data file
    )
    stats = {
        "cols": cols,
        "files": {
            posixpath.basename(r["__file"]): {
                c: [_jsonable(r[f"{c}__min"]), _jsonable(r[f"{c}__max"])]
                for c in cols
            }
            for r in rows
        },
    }
    fs.write_text_atomic(os.path.join(pdir, STATS_NAME), json.dumps(stats))
    return stats


def _jsonable(v):
    """Min/max values as JSON-safe ORDER-PRESERVING scalars: numerics
    pass through; timestamps/dates/decimals become their canonical
    strings (ISO order == value order), so pruning comparisons work
    when the caller passes the same canonical form (e.g. lo='2024-03-01'
    for a date column)."""
    import datetime as _dt
    import decimal as _dec

    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    if isinstance(v, _dec.Decimal):
        return float(v)
    return str(v)


def read_file_stats(path: str, partition: str, fs=None) -> dict | None:
    fs = fs or get_filesystem(path)
    p = os.path.join(_partition_dir(path, partition), STATS_NAME)
    if not fs.exists(p):
        return None
    return json.loads(fs.read_text(p))


def read_partition_pruned(
    spark: SparkSession,
    path: str,
    partition: str,
    col: str,
    lo=None,
    hi=None,
    fs=None,
) -> DataFrame:
    """Read one day-partition with ``lo <= col <= hi`` (either bound
    optional), skipping files whose stats prove they can't match. The
    real filter is still applied — stats only shrink the file list.
    Files absent from the stats (later appends) are always read;
    missing/empty stats — or bounds whose type can't be compared to
    the stored stats — degrade to reading everything. Timestamp/date
    stats are stored as ISO strings (order-preserving): pass string
    bounds like '2024-03-01' to prune on them (the Spark-side filter
    still compares natively)."""
    fs = fs or get_filesystem(path, spark)
    pdir = _partition_dir(path, partition)
    stats = read_file_stats(path, partition, fs=fs)
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(col) >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(col) <= F.lit(hi))
    if not stats or col not in stats.get("cols", []):
        return spark.read.parquet(pdir).where(cond)
    indexed = stats["files"]
    keep = []
    for name, _is_dir in fs.list_entries(pdir):
        if _is_dir or name.startswith((".", "_")):
            continue
        entry = indexed.get(name)
        if entry is None:
            keep.append(name)  # unindexed append: must-read
            continue
        fmin, fmax = entry[col]
        if fmin is None or fmax is None:
            keep.append(name)  # all-NULL or unknown: fail open
            continue
        try:
            disjoint = (lo is not None and fmax < lo) or (
                hi is not None and fmin > hi
            )
        except TypeError:
            # bound/stat type mismatch (e.g. numeric lo vs string
            # timestamp stat): fail open — skipping is an optimization
            disjoint = False
        if disjoint:
            continue  # provably disjoint: skip
        keep.append(name)
    if not keep:
        # empty selection: preserve schema via a zero-row slice
        return spark.read.parquet(pdir).where(F.lit(False))
    return spark.read.parquet(*[os.path.join(pdir, n) for n in keep]).where(cond)


def read_table_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    partitions: list[str] | None = None,
    fs=None,
) -> DataFrame:
    """Table-level pruned read: both pruning tiers in one call —
    partition pruning (``partitions``, e.g. the day range a dashboard
    query touches) and per-file stats pruning within each kept
    partition. The union is by name (schemas are identical within a
    table) and adds the ``partition_date`` column back, matching what a
    full `spark.read.parquet(table)` exposes. At 100 TB this is the
    read shape: days cut 100× by the partition list, files within a day
    cut again by the stats index, and the scan only then starts."""
    from .compact import list_partitions

    fs = fs or get_filesystem(path, spark)
    parts = (
        partitions
        if partitions is not None
        else list_partitions(spark, path, fs=fs)
    )
    out = None
    for p in parts:
        part_df = read_partition_pruned(
            spark, path, p, col, lo=lo, hi=hi, fs=fs
        ).withColumn(PARTITION_FIELD, F.lit(p))
        out = part_df if out is None else out.unionByName(part_df)
    if out is None:
        raise ValueError(f"no partitions to read under {path}")
    return out
