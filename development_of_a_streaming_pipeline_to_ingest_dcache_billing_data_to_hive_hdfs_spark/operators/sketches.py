"""Persisted HLL sketch store for incremental distinct-count analytics.

At warehouse scale ``COUNT(DISTINCT key)`` over a date range rescans
every raw row in the range — at 100 TB that is the whole corpus for a
"distinct users, all time" dashboard tile. Apache DataSketches HLL
sketches (Spark builtins ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``) make the count MERGEABLE: summarize each
ingested slice (a partition date, an hour, a source) ONCE into a
``~2^lg_k``-register sketch row, persist the rows, and answer any slice
range by unioning the stored sketches — O(slices) tiny rows read, zero
raw-data rescan.

Why the maintenance is safe, in order of load-bearing-ness:

- **Union is grouping-independent.** HLL register merge is pointwise
  ``max``: associative, commutative, idempotent. ANY way of unioning
  the same per-slice sketches — incrementally across store commits, or
  fresh in one job — lands on the identical result (asserted by the
  ``q_billing_hll_user_sketch_check`` driver gate and
  ``tests/test_sketch_store.py``), so the incremental answer is not an
  approximation OF an approximation. Caveat, measured at sf0.1: a
  union is NOT always estimate-identical to a SINGLE-PASS sketch of
  the raw rows — the DataSketches implementation keeps small sketches
  in exact coupon mode, and unioning promotes to dense HLL mode
  (1488 union vs 1500 coupon-exact for 1500 true distincts); both sit
  inside the error envelope, which is the contract that holds
  everywhere.
- **Slice overwrite ⇒ replay-idempotent appends.** ``update`` rewrites
  exactly the slices present in the incoming batch (dynamic partition
  overwrite, the same mechanism ``compact.compact_partition`` relies
  on), so a crashed-and-replayed update converges to one row per slice
  instead of double-counting.
- **Late data is a slice rewrite, not a store rebuild.** A late row for
  an already-summarized slice re-runs ``update`` for that slice only;
  every other slice's sketch row is untouched.

Error contract: relative standard error ≈ ``1.04 / sqrt(2^lg_k)``
(~1.6% at the default ``lg_k=12``); below a few hundred distincts the
DataSketches implementation is in exact (coupon) mode and the estimate
is exact. ``lg_k`` is a STORE-level constant — mixing sketch widths
would silently degrade every union to the coarsest width, so
``hll_union_agg`` is called with ``allowDifferentLgConfigK=False`` and
a mismatched update fails loudly at write time instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["sketch_slices", "union_estimate", "HllStore"]


def sketch_slices(
    df: DataFrame,
    slice_col: str,
    value_col: str,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch row per slice: ``(slice_col, n_rows, sketch)``.

    ``hll_sketch_agg`` is a mergeable aggregate, so the plan is one
    keyed aggregation with map-side partial sketches — the shuffle
    carries at most ``n_slices × input_partitions`` sketch blobs, never
    raw values. ``n_rows`` (exact) rides along for free as the
    degeneracy / audit companion."""
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k out of the DataSketches range [4, 21]: {lg_k}")
    return df.groupBy(slice_col).agg(
        F.count(value_col).alias("n_rows"),
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
    )


def union_estimate(
    sketches: DataFrame, *, sketch_col: str = "sketch"
) -> DataFrame:
    """Union every sketch row and estimate: 1 row ``(n_slices,
    distinct_estimate)``. Strict ``allowDifferentLgConfigK=False`` —
    a width mismatch is a store-corruption signal, not something to
    paper over by degrading every register."""
    return sketches.agg(
        F.count(sketch_col).cast("bigint").alias("n_slices"),
        F.hll_sketch_estimate(
            F.hll_union_agg(sketch_col, F.lit(False))
        ).alias("distinct_estimate"),
    )


class HllStore:
    """Persisted per-slice HLL sketches as a catalog table PARTITIONED
    on the slice key.

    Partitioning is the read-path contract: ``estimate(lo, hi)``'s
    slice-range filter prunes at the partition level (asserted in
    ``tests/test_sketch_store.py``), so a "last 7 days" estimate over a
    10-year store opens 7 files. The table is tiny (one row per slice)
    — the partition-per-slice layout costs nothing and buys pruning +
    dynamic-overwrite idempotence.
    """

    def __init__(self, spark: SparkSession, table: str, *, lg_k: int = 12):
        if not 4 <= lg_k <= 21:
            raise ValueError(
                f"lg_k out of the DataSketches range [4, 21]: {lg_k}"
            )
        self.spark = spark
        self.table = table
        self.lg_k = lg_k

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def _insert_dynamic_overwrite(self, out: DataFrame) -> None:
        """INSERT OVERWRITE touched slices only, with dynamic partition
        overwrite pinned at the SESSION conf (saved/restored around the
        write). The per-write ``.option("partitionOverwriteMode",
        "dynamic")`` is honored only by the PATH-based DataFrameWriter
        (``merge.py:59`` uses it there, correctly); on the
        ``insertInto`` catalog-table path Spark consults the session
        conf alone, so under the default STATIC mode the overwrite
        would replace the WHOLE table — silently deleting every
        untouched slice. The try/finally makes the store correct in ANY
        ambient session (regression: the update→update→range-read shape
        runs in a genuinely default-conf session via
        scripts/run_vanilla_gates.py, subprocess-run by
        tests/test_vanilla_session.py).

        Concurrency caveat: the pinned conf is SESSION-global for the
        duration of the write — a concurrent write on another thread of
        the same SparkSession would run under dynamic mode (or race the
        restore). Safe here because every store-mutating CLI serializes
        under the warehouse lock (cli/locking.py); a multi-threaded
        embedder must provide its own per-session write lock."""
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = self.spark.conf.get(key, None)
        self.spark.conf.set(key, "dynamic")
        try:
            out.write.mode("overwrite").insertInto(self.table)
        finally:
            if prev is None:
                self.spark.conf.unset(key)
            else:
                self.spark.conf.set(key, prev)

    def update(self, df: DataFrame, slice_col: str, value_col: str) -> int:
        """Summarize ``df`` into per-slice sketch rows and OVERWRITE
        exactly those slices in the store (dynamic partition overwrite —
        untouched slices keep their rows, replays converge). ``df`` must
        carry every row of each slice it mentions: a partial slice
        would *replace* the fuller sketch. Returns the number of slices
        written."""
        sk = sketch_slices(df, slice_col, value_col, lg_k=self.lg_k)
        # name-aligned, slice key last (partition column position)
        aligned = sk.select(
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("sketch"),
            F.col(slice_col).cast("string").alias("slice_key"),
        )
        # materialize the (one-row-per-slice, tiny) sketch table ONCE:
        # writing `aligned` and then counting its slices would run the
        # full corpus aggregation twice
        rows = aligned.collect()
        out = self.spark.createDataFrame(rows, aligned.schema)
        if not self.exists():
            (
                out.write.mode("overwrite")
                .format("parquet")
                .partitionBy("slice_key")
                .saveAsTable(self.table)
            )
        else:
            self._insert_dynamic_overwrite(out)
        return len({r.slice_key for r in rows})

    def merge(self, df: DataFrame, slice_col: str, value_col: str) -> int:
        """Fold an INCREMENT into the store: sketch the batch per slice,
        union register-wise with the existing rows for those slices, and
        overwrite exactly the touched slices. This is the streaming /
        foreachBatch shape, where a micro-batch carries a fragment of a
        day — ``update`` would *replace* the day's sketch with the
        fragment's.

        Replay safety is the HLL property itself: registers are
        pointwise max, so re-merging the SAME values is a no-op on the
        sketch and the estimate (asserted in tests). ``n_rows`` is
        ingest accounting and DOES double-count on replay — a pipeline
        that needs exactly-once row counts already has them from its
        batch ledger (``sink.BatchLedger``); the distinct estimate
        needs nothing. Returns the number of slices written."""
        inc = sketch_slices(df, slice_col, value_col, lg_k=self.lg_k).select(
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("sketch"),
            F.col(slice_col).cast("string").alias("slice_key"),
        )
        if not self.exists():
            inc.write.mode("overwrite").format("parquet").partitionBy(
                "slice_key"
            ).saveAsTable(self.table)
            return inc.select("slice_key").distinct().count()
        touched = [r.slice_key for r in inc.select("slice_key").distinct().collect()]
        existing = self.spark.table(self.table).where(
            F.col("slice_key").isin(touched)
        )
        merged = (
            inc.unionByName(existing)
            .groupBy("slice_key")
            .agg(
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.hll_union_agg("sketch", F.lit(False)).alias("sketch"),
            )
            .select("n_rows", "sketch", "slice_key")
        )
        # materialize before the overwrite: the merged rows read the
        # very files the dynamic overwrite is about to replace
        rows = merged.collect()
        self._insert_dynamic_overwrite(
            self.spark.createDataFrame(rows, merged.schema)
        )
        return len(rows)

    def _slice_range(self, lo: str | None, hi: str | None) -> DataFrame:
        df = self.spark.table(self.table)
        if lo is not None:
            df = df.where(F.col("slice_key") >= lo)
        if hi is not None:
            df = df.where(F.col("slice_key") <= hi)
        return df

    def estimate(self, lo: str | None = None, hi: str | None = None) -> int:
        """Distinct estimate over the slice range ``[lo, hi]`` (string
        order on the slice key; ISO dates order correctly). Reads ONLY
        the store's pruned sketch rows — never the raw table."""
        row = union_estimate(self._slice_range(lo, hi)).collect()[0]
        if row.n_slices == 0:
            return 0
        return int(row.distinct_estimate)

    def slices(self) -> list[str]:
        """Slice keys currently summarized, sorted."""
        if not self.exists():
            return []
        return [
            r.slice_key
            for r in self.spark.table(self.table)
            .select("slice_key")
            .distinct()
            .orderBy("slice_key")
            .collect()
        ]

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
