"""Batch table loading for the star-schema testdata and warehouse tables.

≙ the reference's batch scans (`spark.sql("select * from db.t where
partition_date=…")`, `Dcache_kafka_to_hive.py:376-377`) — here expressed
as partition-pruned DataFrame reads. Filters/projections applied by
callers push down to the Parquet scan via Catalyst (verify with
``df.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Tables whose parquet footers declare TIMESTAMP(NANOS), which the Spark
# vectorized reader rejects (SPARK-40819). Read them as raw nanos longs
# and convert to microsecond timestamps (Spark's native precision).
NANOS_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = NANOS_TS_COLUMNS.get(name, [])
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def snapshot_horizon(path: str, fs=None) -> int:
    """The first still-valid as-of batch id, as recorded by
    ``compact.expire_snapshots`` (0 = never expired). Checked at the
    table dir and one level up (route tables share warehouse-level
    lifecycle files, exactly like the ledger)."""
    import json

    from ..compact import SNAPSHOT_HORIZON_FILE
    from ..fs import get_filesystem

    fs = fs or get_filesystem(path)
    candidates = [
        os.path.join(path, SNAPSHOT_HORIZON_FILE),
        os.path.join(os.path.dirname(path.rstrip("/")), SNAPSHOT_HORIZON_FILE),
    ]
    for hp in candidates:
        try:
            return int(json.loads(fs.read_text(hp))["horizon"])
        except Exception:
            continue
    return 0


def compacted_as_of(path: str, fs=None) -> int:
    """The max committed batch id at the LAST compaction of this table
    (−1 = never compacted), as recorded by
    ``compact._record_compacted_as_of``. Compacted files hold state up
    to this batch, so snapshots strictly below it are unreconstructible
    even when the snapshot horizon lags behind (a re-compaction without
    ``expire_snapshots`` advances this marker but not the horizon).
    Two-level resolution like ``snapshot_horizon``, but the
    warehouse-level marker is PER-TABLE (``tables[<dir name>]``):
    compaction of one route table is not evidence about a sibling's
    files, so a sibling without an entry keeps its full
    reconstructible history (−1). A legacy flat warehouse-scope value
    (pre-round-7 format) is honored for every table — the conservative
    direction (refuses some reconstructible reads, never serves a
    wrong one) until the next compaction migrates the file."""
    import json

    from ..compact import COMPACTED_AS_OF_FILE
    from ..fs import get_filesystem

    fs = fs or get_filesystem(path)
    table = os.path.basename(path.rstrip("/"))
    try:
        doc = json.loads(
            fs.read_text(os.path.join(path, COMPACTED_AS_OF_FILE))
        )
        return int(doc["compacted_as_of"])
    except Exception:
        pass
    try:
        doc = json.loads(
            fs.read_text(
                os.path.join(
                    os.path.dirname(path.rstrip("/")), COMPACTED_AS_OF_FILE
                )
            )
        )
        if "tables" in doc:
            # A legacy flat warehouse-scope value may coexist with the
            # per-table map (mixed-era warehouse: some tables compacted
            # pre-migration). The flat value is the floor for EVERY
            # table — conservative for never-since-compacted siblings.
            return max(
                int(doc["tables"].get(table, {}).get("compacted_as_of", -1)),
                int(doc.get("compacted_as_of", -1)),
            )
        return int(doc["compacted_as_of"])  # legacy flat format
    except Exception:
        return -1


def table_snapshots(path: str, fs=None) -> list[int]:
    """Committed batch ids of a warehouse route table (its ledger's
    content) that are still READABLE ``as_of`` points — ids below an
    operator-set snapshot horizon (compact.expire_snapshots) are
    excluded, because their history was collapsed by compaction."""
    import json

    from ..fs import get_filesystem

    fs = fs or get_filesystem(path)
    # a re-compaction after expiry can advance the unreconstructible
    # boundary past the horizon without touching it — advertise only
    # snapshots that are actually faithful
    horizon = max(snapshot_horizon(path, fs=fs), compacted_as_of(path, fs=fs))
    # route tables share the warehouse-level ledger one dir up; a
    # table-local ledger (UpsertStreamWriter's) takes precedence
    candidates = [
        os.path.join(path, "_ledger.json"),
        os.path.join(os.path.dirname(path.rstrip("/")), "_ledger.json"),
    ]
    for ledger in candidates:
        try:
            ids = sorted(json.loads(fs.read_text(ledger)))
        except Exception:
            continue
        return [i for i in ids if i >= horizon]
    return []


def read_table_as_of(
    spark: SparkSession,
    path: str,
    batch_id: int,
    fs=None,
    allow_compacted: bool = False,
) -> DataFrame:
    """Snapshot read: the table as it stood after batch ``batch_id``
    committed — TIME TRAVEL the batch-named sink layout gives for free.
    Every data file the exactly-once sink promotes carries its batch id
    in the file NAME (``batch<id>-...``, sink.write_partitioned_batch),
    so "as of batch N" is a pure METADATA operation: list the partition
    dirs, keep files whose embedded id is ≤ N, and hand Spark that file
    list with ``basePath`` so partition columns still resolve. No data
    is copied, no log replayed, no extra storage kept.

    History exists until COMPACTION collapses it: a compacted partition's
    files carry no batch names, so a snapshot below the compaction
    horizon is unrecoverable. The lifecycle is operator-driven via
    ``compact.expire_snapshots``, which records the horizon H (= max
    committed batch at expiry time):

    - ``batch_id >= H``: compacted files ARE the faithful pre-horizon
      state (compaction ran at H), so they are included silently and
      batch-named files filter as usual — no error, no opt-in needed.
    - ``batch_id < H``: fails fast with the operator-set horizon in the
      message; ``allow_compacted=True`` is the explicit opt-in for a
      best-effort read (compacted partitions at their full current
      state, batch-named files still filtered).
    - no horizon recorded (H=0) but compacted files present — the
      legacy incidental case: loud failure, same ``allow_compacted``
      opt-in."""
    import re

    from ..fs import get_filesystem

    fs = fs or get_filesystem(path, spark)
    horizon = snapshot_horizon(path, fs=fs)
    if batch_id < horizon and not allow_compacted:
        raise ValueError(
            f"read_table_as_of: snapshot at batch {batch_id} is EXPIRED — "
            f"expire_snapshots set the horizon to {horizon}, so pre-horizon "
            "history has been collapsed by compaction. Pass "
            "allow_compacted=True for a best-effort read (compacted "
            "partitions at their full current state)."
        )
    cao = compacted_as_of(path, fs=fs)
    if batch_id < cao and not allow_compacted:
        # the horizon can LAG the real unreconstructible boundary: a
        # re-compaction without expire_snapshots folds newer batches
        # into the anonymous files, and silently including them here
        # would return rows from after the requested snapshot
        raise ValueError(
            f"read_table_as_of: snapshot at batch {batch_id} predates the "
            f"last compaction, which ran when batch {cao} was committed — "
            "the compacted files hold state through that batch, so the "
            "requested snapshot cannot be reconstructed (run "
            "expire_snapshots after compacting to make this lifecycle "
            "explicit). Pass allow_compacted=True for a best-effort read."
        )
    pat = re.compile(r"^batch(\d+)-")
    keep: list[str] = []
    compacted: list[str] = []
    for d, d_is_dir in fs.list_entries(path):
        if not d_is_dir or d.startswith(("_", ".")):
            continue
        pdir = os.path.join(path, d)
        for f_name, f_is_dir in fs.list_entries(pdir):
            if f_is_dir or f_name.startswith(("_", ".")):
                continue
            m = pat.match(f_name)
            if m is None:
                compacted.append(os.path.join(pdir, f_name))
            elif int(m.group(1)) <= batch_id:
                keep.append(os.path.join(pdir, f_name))
    if compacted and not allow_compacted and horizon == 0 and cao < 0:
        raise ValueError(
            f"read_table_as_of: {len(compacted)} file(s) under {path} have "
            "no batch name (compaction collapsed their history), e.g. "
            f"{compacted[0]} — a snapshot at batch {batch_id} cannot be "
            "reconstructed below the compaction horizon, and no horizon "
            "was recorded (run compact.expire_snapshots with compaction "
            "to make this lifecycle explicit). Pass allow_compacted=True "
            "to include compacted partitions at their full current state."
        )
    keep.extend(compacted)
    if not keep:
        return spark.read.parquet(path).limit(0)
    return spark.read.option("basePath", path).parquet(*keep)


def read_table_changes(
    spark: SparkSession,
    path: str,
    since_batch: int,
    until_batch: int | None = None,
    fs=None,
) -> DataFrame:
    """Incremental change feed over the batch-named exactly-once
    layout: all rows appended by batches in ``(since_batch,
    until_batch]`` (until defaults to everything), plus a derived
    ``_batch_id`` column. The append-only complement of
    ``read_table_as_of``: a downstream consumer remembers the last
    batch id it processed and reads only the increment — a METADATA
    file-list read like the snapshot path (no log, no copies, no full
    scan), because every promoted data file carries its batch id in its
    NAME (sink.write_partitioned_batch).

    ``_batch_id`` derives JVM-side from ``input_file_name()`` (one
    regexp per row in the scan stage — no Python, no join).

    Lifecycle: increments at or below the snapshot horizon
    (compact.expire_snapshots) were collapsed by compaction and cannot
    be reconstructed — ``since_batch`` below the horizon fails fast
    naming it. At 100 TB the cost is one directory listing plus the
    parquet scan of exactly the increment's files."""
    from ..fs import get_filesystem

    fs = fs or get_filesystem(path, spark)
    horizon = snapshot_horizon(path, fs=fs)
    # ``since_batch`` is EXCLUSIVE, so the increment delivers batches
    # since_batch+1 .. until_batch. On a never-expired table (horizon 0)
    # any start is fine — including the since_batch=-1 sentinel, the
    # "from the very beginning" read that delivers batch 0 (matching
    # stream_table_changes, which always starts at batch 0). With a
    # recorded horizon H > 0, batches THROUGH H were collapsed by the
    # compaction that preceded the expiry, so the first deliverable
    # batch is H+1 (read_table_as_of at H is the baseline).
    if horizon > 0 and since_batch < horizon:
        raise ValueError(
            f"read_table_changes: since_batch={since_batch} is below the "
            f"snapshot horizon {horizon} — those increments were collapsed "
            "by compaction (expire_snapshots). Re-baseline the consumer "
            "with read_table_as_of at the horizon, then stream changes "
            "from there."
        )
    cao = compacted_as_of(path, fs=fs)
    if since_batch < cao:
        # a compaction that ran when batch `cao` was committed collapsed
        # the batch-named files of every batch THROUGH cao (including
        # cao itself) — a silent read here would return an EMPTY
        # increment for batches that really happened
        raise ValueError(
            f"read_table_changes: since_batch={since_batch} would deliver "
            f"batch {since_batch + 1}, but the last compaction ran when "
            f"batch {cao} was committed and collapsed the batch files "
            "through it. Re-baseline the consumer with read_table_as_of "
            f"at batch {cao}, then stream changes from there."
        )
    import re

    pat = re.compile(r"^batch(\d+)-")
    keep: list[str] = []
    for d, d_is_dir in fs.list_entries(path):
        if not d_is_dir or d.startswith(("_", ".")):
            continue
        pdir = os.path.join(path, d)
        for f_name, f_is_dir in fs.list_entries(pdir):
            if f_is_dir or f_name.startswith(("_", ".")):
                continue
            m = pat.match(f_name)
            if m is None:
                continue  # compacted = pre-horizon state, never an increment
            b = int(m.group(1))
            if b > since_batch and (until_batch is None or b <= until_batch):
                keep.append(os.path.join(pdir, f_name))
    if not keep:
        return (
            spark.read.parquet(path)
            .limit(0)
            .withColumn("_batch_id", F.lit(None).cast("long"))
        )
    return (
        spark.read.option("basePath", path)
        .parquet(*keep)
        .withColumn(
            "_batch_id",
            F.regexp_extract(
                F.element_at(F.split(F.input_file_name(), "/"), -1),
                r"^batch(\d+)-",
                1,
            ).cast("long"),
        )
    )


def stream_table_changes(
    spark: SparkSession,
    path: str,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming change feed over a warehouse route table:
    a ``readStream`` whose file source sees ONLY the exactly-once
    promoted batch files (``pathGlobFilter="batch*"``), plus the same
    derived ``_batch_id`` column as ``read_table_changes``.

    Downstream pipelines subscribe to a table the way the billing
    pipeline subscribes to Kafka — checkpointed progress, availableNow
    drains, backpressure via ``max_files_per_trigger``. The glob filter
    is what makes this SAFE under maintenance: compaction rewrites a
    partition into anonymous ``part-*`` files, which the source never
    matches — so a nightly compaction cannot re-deliver rows the
    consumer already processed, and the removed batch files were
    already checkpointed as seen.

    ``schema``: pass the route schema explicitly for a fully streaming
    plan; default infers it with a one-time batch read of the table.
    """
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "batch*")
        .option("basePath", path)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path).withColumn(
        "_batch_id",
        F.regexp_extract(
            F.element_at(F.split(F.input_file_name(), "/"), -1),
            r"^batch(\d+)-",
            1,
        ).cast("long"),
    )


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Expose the tables as temp views for the SQL API surface."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
