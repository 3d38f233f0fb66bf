"""MERGE INTO (upsert) for day-partitioned parquet tables, copy-on-write.

The reference's warehouse is INSERT-only Hive tables
(`Dcache_kafka_to_hive.py:115-141`); correcting a mis-parsed day or
re-ingesting a late feed means hand-written overwrite jobs. This module
adds the missing warehouse op: key-matched upsert with partition-scoped
rewrite — the copy-on-write MERGE shape Delta/Iceberg popularized,
expressed on plain parquet + dynamic partition overwrite.

Scale shape:
- Only AFFECTED partitions are read and rewritten (partition pruning on
  the read, dynamic overwrite on the write); untouched partitions'
  files are not opened, moved, or rewritten.
- The merge itself is one anti-join (target-minus-matched) + union —
  broadcastable when the update batch is small (the common case:
  a correction feed vs a 100 TB table), AQE decides.
- Driver-side state is bounded by the PARTITION count of the update
  batch (a list of day strings), never by row count.

Atomicity: each partition commits through the parquet committer's
stage-and-rename; cross-partition atomicity is NOT provided (same
contract as Hive's INSERT OVERWRITE — a crash mid-merge can leave some
partitions merged and others not; re-running the same merge converges,
because upsert is idempotent for identical inputs).

Key scoping: with ``scope="partitions"`` (default) a key is assumed to
stay in its partition (billing facts: the business key contains the
event date). If an update MOVES a key to a different partition, the old
partition is not touched and would keep the stale copy —
``scope="table"`` handles that: it locates partitions currently holding
matched keys (one bounded semi-join job) and rewrites those too,
deleting any partition left empty by the move.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .fs import get_filesystem
from .schema import DEFAULT_PARTITION_NAME, PARTITION_FIELD


def _part_name(value) -> str:
    """Directory-name form of a partition VALUE (None → Hive default)."""
    return DEFAULT_PARTITION_NAME if value is None else str(value)


def _dyn_writer(df: DataFrame, pf: str):
    """Partitioned overwrite writer with dynamic mode pinned PER WRITE:
    relying on the ambient session conf would truncate the whole table
    under Spark's default (static) overwrite mode when a consumer builds
    its own session — whole-table loss from a one-row upsert."""
    return (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(pf)
    )


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    *,
    version_col: str | None = None,
    scope: str = "partitions",
    allow_new_columns: bool = False,
    delete_col: str | None = None,
    fs=None,
) -> list[str]:
    """Upsert ``updates`` into the partitioned table at ``path``:
    matched keys (equality on ``key_cols``) are replaced by their update
    row, unmatched update rows are inserted. Returns the partition
    values rewritten (sorted).

    ``version_col``: resolve duplicate keys WITHIN the update batch by
    keeping the highest version (last-write-wins); without it the batch
    is trusted to be key-unique (a duplicate would insert twice).
    ``scope``: "partitions" (keys never change partition — cheapest) or
    "table" (also rewrites partitions a matched key moved away from).
    ``allow_new_columns``: schema evolution — update columns absent from
    the table are ADDED (surviving target rows get nulls). Only the
    rewritten partitions carry the wider schema, the standard parquet
    evolution contract: readers of the mixed table must pass
    ``mergeSchema`` (or declare a schema) until every partition has
    been rewritten. Without the flag an extra column is a loud error,
    not silent schema drift.
    ``delete_col``: CDC tombstones — update rows where this boolean
    column is true DELETE their matched key instead of replacing it
    (WHEN MATCHED AND <del> THEN DELETE). NULL/false means upsert.
    Version resolution runs BEFORE the split, so a tombstone and a
    later re-insert of the same key resolve by ``version_col`` exactly
    like two upserts (delete-then-reinsert converges to the reinsert).
    A partition whose rows are all deleted has its directory removed —
    dynamic overwrite alone would leave the stale files in place.
    """
    if scope not in ("partitions", "table"):
        raise ValueError(f"scope must be 'partitions' or 'table', got {scope!r}")
    fs = fs or get_filesystem(path, spark)
    pf = PARTITION_FIELD
    if pf not in updates.columns:
        raise ValueError(f"updates must carry the partition column {pf!r}")
    if delete_col is not None:
        if delete_col not in updates.columns:
            raise ValueError(
                f"delete_col {delete_col!r} not in the update batch"
            )
    if version_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
        updates = (
            updates.withColumn("_mrg_rn", F.row_number().over(w))
            .where(F.col("_mrg_rn") == 1)
            .drop("_mrg_rn")
        )
    # the tombstone flag is materialized AFTER version resolution (a
    # newer insert must beat an older delete and vice versa) and carried
    # as a helper column through schema alignment, because delete_col
    # itself may not be a table column
    if delete_col is not None:
        updates = updates.withColumn(
            "_mrg_del",
            F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False)),
        )

    # first write iff no partition directory exists yet — the path dir
    # ALONE does not mean data (a sibling ledger/_metrics file creates
    # the directory first; reading parquet from it would throw)
    has_data = fs.is_dir(path) and any(
        is_dir and name.startswith(pf + "=")
        for name, is_dir in fs.list_entries(path)
    )
    if not has_data:  # first write: the merge is a plain insert
        if delete_col is not None:
            # tombstones for rows that never existed are no-ops
            updates = updates.where(~F.col("_mrg_del")).drop(
                "_mrg_del", delete_col
            )
        _dyn_writer(updates, pf).parquet(path)
        return sorted(
            _part_name(r[0])
            for r in updates.select(pf).distinct().collect()
        )

    # Driver-side lists are PARTITION-cardinality (days), never rows.
    # Values normalize to STRINGS (an updates frame read back from
    # parquet carries the partition column DATE-typed), and NULL is
    # tracked EXPLICITLY: records with a null partition key (e.g. the
    # malformed-date rows parse.partition_date_col routes to the default
    # partition) must filter via isNull — str(None) would produce a
    # 'None' sentinel that matches nothing, the target filter would then
    # exclude the live default-partition rows, and the dynamic overwrite
    # would wipe them (observed data loss before this handling).
    def _collect_parts(df):
        vals = {r[0] for r in df.select(pf).distinct().collect()}
        return {str(v) for v in vals if v is not None}, None in vals

    # Cast the update batch's partition column to the ON-DISK type BEFORE
    # collecting affected values. Collecting from the raw frame is a data
    # eraser: a non-canonical string ('2024-3-1', '2024-03-01T00:00:00')
    # casts cleanly to DATE 2024-03-01 at write time, but the raw value
    # lands in `affected`, the target filter matches nothing, the live
    # rows of 2024-03-01 never survive into `merged`, and the dynamic
    # overwrite rewrites that partition with ONLY the update rows —
    # silently deleting every pre-existing row. Casting first makes the
    # collected values, the target filter, and the written directory
    # names agree (ANSI mode turns a truly unparseable value into a loud
    # cast error instead of a wrong directory).
    target_all = spark.read.parquet(path)
    updates = updates.withColumn(
        pf, F.col(pf).cast(target_all.schema[pf].dataType)
    )
    up_parts, up_null = _collect_parts(updates)
    if scope == "table":
        moved, moved_null = _collect_parts(
            target_all.join(
                updates.select(*key_cols).distinct(), key_cols, "left_semi"
            )
        )
        affected, has_null = sorted(up_parts | moved), up_null or moved_null
    else:
        affected, has_null = sorted(up_parts), up_null

    # align the update frame to the on-disk schema (partition column
    # reads back typed — e.g. DATE — while writers carry strings)
    part_filter = F.col(pf).cast("string").isin(affected)
    if has_null:
        part_filter = part_filter | F.col(pf).isNull()
    target = target_all.where(part_filter)
    extra = set(updates.columns) - set(target.columns)
    for helper in (version_col, delete_col):
        if helper in extra:
            # pure resolution/flag columns (not stored in the table):
            # their job is done, drop them
            updates = updates.drop(helper)
            extra.discard(helper)
    extra.discard("_mrg_del")  # internal tombstone flag, never stored
    if extra and not allow_new_columns:
        raise ValueError(f"updates carry columns absent from the table: {sorted(extra)}")
    for c in sorted(extra):  # schema evolution: surviving rows get nulls
        target = target.withColumn(c, F.lit(None).cast(updates.schema[c].dataType))
    aligned = updates
    for f_ in target.schema.fields:
        if f_.name not in aligned.columns:
            raise ValueError(f"updates missing table column {f_.name!r}")
        aligned = aligned.withColumn(f_.name, F.col(f_.name).cast(f_.dataType))
    keep = target.columns + (
        ["_mrg_del"] if "_mrg_del" in aligned.columns else []
    )
    aligned = aligned.select(keep)

    # the anti-join removes EVERY matched key — upserts replace theirs,
    # tombstones simply don't add a replacement row back
    inserts = (
        aligned.where(~F.col("_mrg_del")).drop("_mrg_del")
        if delete_col is not None
        else aligned
    )
    merged = target.join(
        aligned.select(*key_cols).distinct(), key_cols, "left_anti"
    ).unionByName(inserts)
    merged.persist(StorageLevel.MEMORY_AND_DISK)
    collect_written = scope == "table" or delete_col is not None
    try:
        # dynamic overwrite only rewrites partitions PRESENT in merged;
        # a partition fully vacated by a table-scope key MOVE or by
        # tombstones deleting its every row would be absent and must be
        # deleted explicitly below. Under scope="partitions" WITHOUT
        # tombstones every update row survives into merged with its own
        # partition value, so the vacated set is provably empty and the
        # extra distinct+collect job (one per streaming micro-batch via
        # UpsertStreamWriter) is skipped.
        if collect_written:
            written_parts, written_null = _collect_parts(merged)
        _dyn_writer(merged, pf).parquet(path)
    finally:
        merged.unpersist()
    affected_dirs = list(affected) + (
        [DEFAULT_PARTITION_NAME] if has_null else []
    )
    if collect_written:
        written_dirs = written_parts | (
            {DEFAULT_PARTITION_NAME} if written_null else set()
        )
        for p in affected_dirs:
            if p not in written_dirs:
                fs.delete(os.path.join(path, f"{pf}={p}"), recursive=True)
    return sorted(affected_dirs)
