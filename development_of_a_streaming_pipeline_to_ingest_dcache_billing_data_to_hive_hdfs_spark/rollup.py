"""Incrementally-maintained materialized rollups over the change feed.

The natural consumer of ``sources.tables.read_table_changes``: a
persisted aggregate (counts / sums / mins / maxs per key) that is kept
equal to the full recompute by folding only each ``(since, until]``
increment — the downstream-summary shape every warehouse grows around
the reference's route tables (daily volumes per pool, event counts per
day × type) without re-scanning history on every refresh.

Exactness: only DECOMPOSABLE aggregates are supported (count, sum, min,
max over an append-only table), because those are the ones where
``merge(state, agg(increment)) == agg(everything)`` holds exactly.
AVG is derived (sum/count) by the reader. Sums over floating columns
should be folded in decimal (pass an explicit cast) when bit-exact
equality with a recompute matters — float addition is not associative,
decimal addition is.

Exactly-once without a log: the rollup state is VERSIONED. Each fold
writes a complete new rollup under ``v{n+1}/`` and only then atomically
points ``_rollup_state.json`` (version, last_batch) at it; a crash
anywhere replays the same increment against the still-current ``v{n}``
and overwrites ``v{n+1}`` — never a double-fold, never a torn read.
Superseded versions are swept opportunistically on the next fold.

At 100 TB: each refresh scans exactly the increment's files (a
metadata-cheap name-filtered list), shuffles only (keys × increment)
partial rows, and rewrites a rollup whose size is bounded by the key
cardinality, not the fact table. Compaction of the base table is safe:
``read_table_changes`` fails fast (never silently empty) if the rollup
fell behind the compaction marker, and a caught-up rollup is untouched
because compacted files are never re-delivered.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .fs import get_filesystem
from .sources.tables import read_table_changes

STATE_FILE = "_rollup_state.json"

# agg kind -> (increment aggregate, merge aggregate over partials)
_MERGE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


class IncrementalRollup:
    """A persisted ``groupBy(keys).agg(...)`` over a batch-named route
    table, refreshed by folding change-feed increments.

    ``aggs``: {output_col: ("count",) | (kind, input_col_or_Column)}
    with kind in count/sum/min/max, e.g.::

        IncrementalRollup(
            spark, table_path, rollup_dir,
            keys=["partition_date", "event_type"],
            aggs={
                "n_events": ("count",),
                "sum_value": ("sum", F.col("value").cast("decimal(28,10)")),
            },
        )
    """

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        rollup_dir: str,
        *,
        keys: list[str],
        aggs: dict[str, tuple],
        fs=None,
    ):
        for name, spec in aggs.items():
            if spec[0] not in _MERGE:
                raise ValueError(
                    f"agg {name!r}: kind {spec[0]!r} not decomposable — "
                    f"supported: {sorted(_MERGE)}"
                )
        self.spark = spark
        self.table_path = table_path
        self.rollup_dir = rollup_dir
        self.keys = list(keys)
        self.aggs = dict(aggs)
        self.fs = fs or get_filesystem(rollup_dir, spark)

    # -- state ---------------------------------------------------------

    def state(self) -> dict:
        try:
            return json.loads(
                self.fs.read_text(os.path.join(self.rollup_dir, STATE_FILE))
            )
        except FileNotFoundError:
            return {"version": 0, "last_batch": -1}

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.rollup_dir, f"v{version}")

    def read(self) -> DataFrame:
        """The current rollup (empty frame with the right schema before
        the first fold)."""
        st = self.state()
        if st["version"] == 0:
            inc = self._increment_agg(
                read_table_changes(
                    self.spark, self.table_path, since_batch=10**15
                )
            )
            return inc.limit(0)
        return self.spark.read.parquet(self._version_dir(st["version"]))

    # -- the fold --------------------------------------------------------

    def _agg_input(self, spec: tuple) -> Column:
        if spec[0] == "count":
            return F.lit(1).cast("bigint")
        col = spec[1]
        return col if isinstance(col, Column) else F.col(col)

    def _increment_agg(self, changes: DataFrame) -> DataFrame:
        exprs = []
        for name, spec in self.aggs.items():
            kind = spec[0]
            inp = self._agg_input(spec)
            base = F.sum(inp) if kind == "count" else {
                "sum": F.sum, "min": F.min, "max": F.max
            }[kind](inp)
            exprs.append(base.alias(name))
        return changes.groupBy(*self.keys).agg(*exprs)

    def _merge(self, current: DataFrame, inc: DataFrame) -> DataFrame:
        exprs = [
            _MERGE[spec[0]](F.col(name)).alias(name)
            for name, spec in self.aggs.items()
        ]
        return (
            current.unionByName(inc)
            .groupBy(*self.keys)
            .agg(*exprs)
        )

    def fold(self, until_batch: int | None = None) -> dict:
        """Fold the next increment ``(last_batch, until_batch]`` into the
        rollup. Returns the new state plus how many batches were folded.
        No committed increment → no new version (state untouched)."""
        st = self.state()
        changes = read_table_changes(
            self.spark,
            self.table_path,
            since_batch=st["last_batch"],
            until_batch=until_batch,
        )
        # the write below is one action; bound the increment's max batch
        # id FIRST (a second scan of the same immutable file list) so
        # the recorded watermark always matches what was folded
        hi = changes.agg(F.max("_batch_id").alias("hi")).first()["hi"]
        if hi is None:
            return {**st, "folded_batches": 0}
        inc = self._increment_agg(changes.drop("_batch_id"))
        merged = (
            self._merge(self.read(), inc) if st["version"] > 0 else inc
        )
        new_version = st["version"] + 1
        merged.write.mode("overwrite").parquet(self._version_dir(new_version))
        new_state = {"version": new_version, "last_batch": int(hi)}
        self.fs.write_text_atomic(
            os.path.join(self.rollup_dir, STATE_FILE),
            json.dumps(new_state, sort_keys=True),
        )
        # opportunistic sweep of superseded versions (crash residue too)
        for d, is_dir in self.fs.list_entries(self.rollup_dir):
            if is_dir and d.startswith("v") and d != f"v{new_version}":
                self.fs.delete(os.path.join(self.rollup_dir, d), recursive=True)
        return {**new_state, "folded_batches": int(hi) - st["last_batch"]}

    def recompute(self) -> DataFrame:
        """The full-scan answer the rollup must equal — the verification
        twin (and the re-baseline path after falling behind a
        compaction horizon)."""
        return self._increment_agg(self.spark.read.parquet(self.table_path))
