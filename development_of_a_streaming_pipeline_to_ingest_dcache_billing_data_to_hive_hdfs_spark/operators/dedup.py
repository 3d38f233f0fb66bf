"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-architected for 100 TB:

- **Exact**: hash-groupBy on a normalized fingerprint (md5) — one shuffle
  on a 128-bit key, no text comparison beyond the hash.
- **MinHash + LSH**: shingle → k minhashes → b bands; candicate pairs come
  from equi-joining on (band_id, band_hash) buckets, so the cross product
  only ever happens *within* a bucket. All JVM-side (xxhash64 + array
  higher-order functions) — no Python in the row path.
- **SimHash**: 64-bit signature whose hamming-near neighbors are near-dups;
  banded into 4×16-bit chunks for bucketing (Charikar 2002 pattern).
- **N-gram Jaccard**: exact verification of candidate pairs (the rerank
  step after LSH blocking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def normalized_text(col: str = "text") -> Column:
    """Canonical form for exact dedup: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")


def fingerprint(col: str = "text") -> Column:
    """128-bit content fingerprint (md5 of normalized text) — portable
    (same value in any engine), unlike xxhash64."""
    return F.md5(normalized_text(col))


def rolling_hash_fingerprint(
    col: str = "text", base: int = 131, mod: int = 1_000_000_007
) -> Column:
    """Polynomial (Karp–Rabin) rolling hash of the normalized text as a
    BIGINT — the incremental-update fingerprint family (hash of s[0..n]
    derives from hash of s[0..n-1] in O(1)), here evaluated per document
    via a JVM-side aggregate over the character array. Portable: the
    same base/mod arithmetic is reproducible in any engine."""
    return F.expr(
        f"aggregate(filter(split({_norm_sql(col)}, ''), c -> c <> ''), 0L,"
        f" (acc, c) -> (acc * {base} + ascii(c)) % {mod})"
    )


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: one row per distinct normalized text with
    the representative (min id) and the duplicate count. Equivalent
    semantics to dropDuplicates but deterministic about which row wins."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def char_shingles(col: str = "text", n: int = 3) -> Column:
    """Distinct character n-gram shingles of the normalized text, as an
    array<string>. Pure SQL higher-order functions — JVM-side.

    The normalized string is let-bound once as a lambda variable (the
    single-element-array transform trick): referencing the regexp
    normalization directly inside the position lambda would re-run the
    regex per shingle position — O(len²) per document."""
    return F.expr(
        f"transform(array({_norm_sql(col)}), t -> array_distinct("
        f"transform(sequence(1, greatest(length(t) - {n - 1}, 1)),"
        f" i -> substr(t, i, {n}))))[0]"
    )


def _norm_sql(col: str) -> str:
    return f"regexp_replace(trim(lower({col})), '\\\\s+', ' ')"


def spread_partitions(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the cluster's default parallelism —
    only when the input has fewer partitions. CPU-heavy per-row work
    (shingling, N-hash minhash, block matmuls) otherwise runs at the
    *file-split* parallelism, which for one small parquet file is a
    single task no matter how many cores exist. At 100 TB input splits
    already exceed core count, so this becomes a no-op rather than an
    extra shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) — sig[j] = min over shingles
    of hash_j(shingle).

    Shape chosen for scale AND codegen: explode shingles, hash each
    string ONCE (xxhash64 on the bytes), then derive the j-th family
    member as xxhash64(h, j) — an 8-byte rehash, not a re-traversal of
    the string — inside a groupBy with num_hashes min() aggregates.
    Everything stays in whole-stage codegen (no interpreted higher-order
    lambdas in the hot path), and map-side partial aggregation means the
    shuffle carries one (id, num_hashes longs) row per doc per partition.
    """
    df = spread_partitions(df)
    exploded = df.select(
        F.col(id_col), F.explode(char_shingles(text_col, shingle_n)).alias("s")
    ).select(F.col(id_col), F.xxhash64("s").alias("h"))
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64("h", F.lit(j))).alias(f"_m{j}")
            for j in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[F.col(f"_m{j}") for j in range(num_hashes)]).alias("sig"),
    )


def band_hashes_expr(
    bands: int, rows_per_band: int, sig_col: str = "sig"
) -> Column:
    """array<bigint>[bands] of banded LSH bucket hashes over a minhash
    signature column: hash ``b`` = xxhash64 of the b-th
    ``rows_per_band``-slice of the signature. The single definition of
    the banding key, shared by the batch pair-expansion path
    (``lsh_candidate_pairs``) and the persistent incremental store
    (``BandBucketStore``) — the two MUST agree or cross-batch
    candidates silently miss."""
    return F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> xxhash64(concat_ws(',', slice({sig_col}, b * {rows_per_band} + 1, {rows_per_band}))))"
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs from banded LSH over minhash signatures.

    explode to (band_id, band_hash) → groupBy the bucket, collecting the
    sorted member-id list → expand each bucket's in-bucket pairs with a
    nested ``transform`` (JVM-side, output-bound O(k²) per bucket) →
    distinct pairs. Jaccard-similar docs collide in ≥1 band with high
    probability. Defaults b=8, r=8 put the s-curve threshold at
    (1/8)^(1/8) ≈ 0.77 — the conventional ~0.8 near-dup operating point;
    lower thresholds on a self-similar corpus make buckets quadratic
    (at 0.5 the synthetic testdata emits millions of pairs from 5k docs).

    This shape executes the (expensive) signature pipeline exactly once.
    The earlier bucket *self-join* formulation planned the upstream as a
    broadcast join whose probe side has no exchange — so ReusedExchange
    could not apply and the shingle+minhash pipeline ran twice per query
    (and a persist() leaked from a lazy operator measurably degrades
    later queries, so caching is not the fix). groupBy is also strictly
    one shuffle keyed by the bucket, same as the join would have been.

    ``max_bucket_size`` (opt-in) drops buckets larger than the limit —
    the standard skew guard against boilerplate buckets whose k² pair
    blow-up dominates at scale; here it is a free ``size(ids)`` filter
    rather than an extra counting join. Dropped buckets lose recall for
    their members; leave None for exact banding.
    """
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(band_hashes_expr(bands, rows_per_band)).alias(
            "band_id", "band_hash"
        ),
    )
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("ids") <= max_bucket_size)
    return expand_bucket_pairs(buckets)


def expand_bucket_pairs(buckets: DataFrame, ids_col: str = "ids") -> DataFrame:
    """(… , ids: array) bucket rows → distinct in-bucket (id_a, id_b)
    pairs with id_a < id_b (``ids`` must be sorted). Shared by every
    bucketed blocking scheme (minhash bands, simhash chunks, hyperplane
    signatures).

    Pair expansion is output-bound (k² structs per bucket) while the
    bucket rows themselves are few and small — AQE coalesces the
    post-agg stage by *input* bytes and would run the expansion almost
    serially. An explicit round-robin repartition (AQE honors the
    user-specified count) spreads bucket lists — and their skewed
    expansion cost — across the cluster. ``ids`` is a plain attribute,
    so referencing it inside the lambdas is a column read, not a
    re-evaluated expression."""
    buckets = buckets.repartition(
        buckets.sparkSession.sparkContext.defaultParallelism
    )
    pair_expr = (
        f"flatten(transform({ids_col}, (x, i) ->"
        f" transform(slice({ids_col}, i + 2, size({ids_col})),"
        f" y -> named_struct('id_a', x, 'id_b', y))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def estimated_jaccard(sigs_a: str = "sig_a", sigs_b: str = "sig_b") -> Column:
    """MinHash Jaccard estimate = fraction of agreeing signature slots."""
    return F.expr(
        f"size(filter(zip_with({sigs_a}, {sigs_b}, (x, y) -> x = y), v -> v))"
        f" / cast(size({sigs_a}) as double)"
    )


def ngram_jaccard(sh_a: str = "sh_a", sh_b: str = "sh_b") -> Column:
    """Exact Jaccard over two shingle-set array columns (rerank step)."""
    return F.expr(
        f"size(array_intersect({sh_a}, {sh_b}))"
        f" / cast(size(array_union({sh_a}, {sh_b})) as double)"
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup candidate pairs → (id,
    cluster_id) with cluster_id = min member id. This turns pairwise
    LSH/Jaccard evidence into dedup groups when duplicates chain
    (A≈B, B≈C ⇒ {A,B,C} even if A̸≈C directly).

    Min-label propagation with pointer jumping: each round every vertex
    takes the min label across itself and its neighbors, then jumps to
    its label's label (label(v) is always a vertex of the same
    component, so label(label(v)) is a valid, ≤ label). Neighbor
    propagation alone converges in O(diameter); the jump compresses
    chains roughly geometrically. Each round is two key joins + one
    aggregation; the frame is localCheckpoint()ed per round to cut the
    growing lineage, and the loop exits early when a round changes
    nothing. Iterative ⇒ no SQL oracle (driver records rows-only);
    correctness is pytest-verified on chained-duplicate fixtures.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer jump: label(v) <- label(label(v))
        lookup = stepped.select(
            F.col("id").alias("_lid"), F.col("label").alias("_llabel")
        )
        new_labels = (
            stepped.join(lookup, stepped.label == lookup._lid, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("_llabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def keep_representatives(
    df: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The dedup END PRODUCT: the corpus minus every clustered document
    except one representative per cluster (the min member id, matching
    ``dedup_clusters``' label convention, so the choice is deterministic
    in any engine). Documents in no cluster pass through untouched.

    Scale shape: ``clusters`` holds only documents with at least one
    near-dup (≪ corpus), its groupBy is on cluster_id, and the corpus
    is touched once by a left-anti join against the (even smaller)
    drop set — at a typical web-crawl dup rate the anti join's build
    side is a fraction of the corpus and AQE broadcasts it."""
    reps = clusters.groupBy("cluster_id").agg(F.min("id").alias("keep_id"))
    drops = (
        clusters.join(reps, "cluster_id")
        .where(F.col("id") != F.col("keep_id"))
        .select(F.col("id").alias("_drop_id"))
    )
    return df.join(
        drops, df[id_col] == drops["_drop_id"], "left_anti"
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: bit i of the signature is 1
    iff the sum of (+1/-1) votes of token-hash bit i is positive
    (Charikar 2002). Expressed as aggregate() over the token array —
    JVM-side, no UDF."""
    df = spread_partitions(df)
    tokens = f"filter(split({_norm_sql(text_col)}, ' '), t -> t <> '')"
    votes = (
        f"aggregate({tokens}, "
        f"array_repeat(0L, {bits}), "
        f"(acc, t) -> zip_with(acc, transform(sequence(0, {bits - 1}), "
        f"  b -> if(((xxhash64(t) >> b) & 1L) = 1L, 1L, -1L)), (a, v) -> a + v))"
    )
    sig = (
        f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), "
        f"(v, b) -> if(v > 0, shiftleft(1L, cast(b as int)), 0L)), 0L, (a, x) -> a | x)"
    )
    return df.select(F.col(id_col), F.expr(sig).alias("simhash"))


def simhash_bands(sigs: DataFrame, id_col: str = "doc_id", chunks: int = 4) -> DataFrame:
    """Split a 64-bit simhash into 16-bit chunks for hamming-LSH blocking:
    docs within hamming distance < chunks share at least one chunk."""
    width = 64 // chunks
    return sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {chunks - 1}),"
                f" c -> (simhash >> (c * {width})) & {(1 << width) - 1}L)"
            )
        ).alias("chunk_id", "chunk_val"),
    )


def _bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int, list[str]]:
    """(bucket_cols, n_buckets, sort_cols) of a catalog table, parsed
    from DESCRIBE EXTENDED — the layout contract a lifecycle rewrite
    must reproduce exactly."""
    rows = {r.col_name: r.data_type for r in spark.sql(
        f"DESCRIBE EXTENDED {table}"
    ).collect()}

    def cols(key: str) -> list[str]:
        raw = rows.get(key, "[]") or "[]"
        return [c.strip(" `") for c in raw.strip("[]").split(",") if c.strip(" `")]

    n = int(rows.get("Num Buckets", "0") or 0)
    return cols("Bucket Columns"), n, cols("Sort Columns")


def rewrite_bucketed_table(spark: SparkSession, table: str, df: DataFrame) -> None:
    """Replace a BUCKETED catalog table's contents with ``df`` while
    preserving its exact bucket/sort layout — the rewrite primitive
    behind store lifecycle operations (duplicate reclaim, retention).

    Protocol: write ``df`` to ``{table}__compacting`` with the SAME
    bucket spec (each task pre-partitioned to one bucket, so the
    rewrite emits n_buckets files, not n_tasks × n_buckets), then
    DROP the original and RENAME the scratch into place — two catalog
    metadata operations. Crash windows: before the drop, the scratch
    is stale residue (healed by ``heal_bucketed_rewrite``); between
    drop and rename, only the scratch exists and the heal promotes it
    (its content is complete — it was written before the drop)."""
    bucket_cols, n_buckets, sort_cols = _bucket_spec(spark, table)
    if not bucket_cols or n_buckets <= 0:
        raise ValueError(
            f"rewrite_bucketed_table: {table!r} is not bucketed — this "
            "rewrite exists to preserve a bucket layout; use a plain "
            "overwrite for unbucketed tables"
        )
    from ..sink import write_bucketed_table

    scratch = f"{table}__compacting"
    spark.sql(f"DROP TABLE IF EXISTS {scratch}")
    write_bucketed_table(
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols]),
        scratch,
        bucket_cols,
        n_buckets=n_buckets,
        sort_cols=sort_cols or None,
    )
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {scratch} RENAME TO {table}")


def heal_bucketed_rewrite(spark: SparkSession, table: str) -> bool:
    """Finish a ``rewrite_bucketed_table`` a previous process crashed in
    the middle of. Returns True if a promotion happened. Safe to call
    on every store open: two catalog existence checks (plus, when a
    table is absent from the catalog, an orphan-location sweep — a
    killed session can leave the managed DIRECTORY behind while the
    in-memory catalog forgets the table, after which every re-create
    fails LOCATION_ALREADY_EXISTS; see
    ``sink.clear_orphan_table_location``)."""
    from ..sink import clear_orphan_table_location

    scratch = f"{table}__compacting"
    if not spark.catalog.tableExists(scratch):
        # no crashed rewrite to finish — but clear create-time residue
        # so the NEXT create of either name cannot hit a dead location
        clear_orphan_table_location(spark, scratch)
        clear_orphan_table_location(spark, table)
        return False
    if spark.catalog.tableExists(table):
        # crash BEFORE the drop: the original is intact and authoritative;
        # the scratch is a stale (possibly partial) write — discard it
        spark.sql(f"DROP TABLE {scratch}")
        return False
    spark.sql(f"ALTER TABLE {scratch} RENAME TO {table}")
    return True


def _expired_tag_filter(expire_run_tag: str, expire_below_batch: int) -> Column:
    """Rows to KEEP under batch-horizon retention: entries whose tag
    belongs to ``expire_run_tag`` with batch id < ``expire_below_batch``
    are dropped; NULL-tagged and foreign-run entries are kept (their
    lifecycle belongs to their own run)."""
    run = F.split(F.col("batch_tag"), "#").getItem(0)
    bid = F.split(F.col("batch_tag"), "#").getItem(1).cast("bigint")
    return ~(
        F.col("batch_tag").isNotNull()
        & (run == expire_run_tag)
        & bid.isNotNull()
        & (bid < expire_below_batch)
    )


class FingerprintStore:
    """Incremental corpus dedup against a PERSISTENT seen-fingerprint
    store — the continuously-ingested-corpus shape: every arriving batch
    is screened against everything ever kept, without ever rescanning or
    reshuffling the historical corpus.

    The store is a catalog table BUCKETED on ``fp`` (md5 of normalized
    text). That layout is the whole trick at 100 TB:

    - the seen-check anti-join reads the store bucket-locally (NO
      Exchange on the store side — only the new batch, which is small,
      shuffles to the store's bucketing);
    - appends preserve the bucket layout (``insertInto`` on a bucketed
      table), so the store never needs a maintenance re-shuffle.

    A bloom-filter sidecar could pre-drop obvious misses, but with the
    bucketed layout the anti-join is already batch-bound, so the filter
    is an optimization, not a requirement. Within-batch duplicates
    resolve first (min id wins) so a batch can't admit two copies of
    the same text.
    """

    def __init__(self, spark: SparkSession, table: str, n_buckets: int = 64):
        self.spark = spark
        self.table = table
        self.n_buckets = n_buckets
        heal_bucketed_rewrite(spark, table)  # finish a crashed compact()

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def compact(
        self,
        *,
        expire_run_tag: str | None = None,
        expire_below_batch: int | None = None,
    ) -> dict[str, int]:
        """Lifecycle maintenance for the seen-fp store — the one
        warehouse artifact that previously grew without bound:

        - reclaim duplicate ``fp`` rows (crash-replay residue of
          ``commit``): one survivor per fingerprint, deterministically
          the lexicographically-least (batch_tag, first_doc_id) row.
          Replay safety holds because duplicate rows of one fp are
          produced by replays of the SAME batch and therefore share a
          tag — the survivor still carries the tag a replayed screen
          excludes;
        - optional RETENTION mirroring ``compact.expire_snapshots``'
          horizon pattern: drop entries committed by ``expire_run_tag``
          with batch id < ``expire_below_batch`` (both required
          together), so a corpus whose old partitions were expired can
          re-admit their content instead of remembering it forever.
          NULL-tagged and foreign-run entries are untouched.

        The rewrite goes through ``rewrite_bucketed_table``: the
        bucketed-on-fp layout (and with it the no-Exchange seen-check
        plan) survives, small crash-replay append files collapse to
        ``n_buckets`` files, and a crash mid-swap self-heals on the
        next store open. Returns row counts before/after."""
        if (expire_run_tag is None) != (expire_below_batch is None):
            raise ValueError(
                "pass expire_run_tag and expire_below_batch together"
            )
        if not self.exists():
            return {"rows_before": 0, "rows_after": 0}
        df = self.spark.table(self.table)
        before = df.count()
        if expire_run_tag is not None:
            df = df.where(
                _expired_tag_filter(expire_run_tag, expire_below_batch)
            )
        if "batch_tag" in df.columns:
            w = Window.partitionBy("fp").orderBy(
                F.col("batch_tag").asc_nulls_first(),
                F.col("first_doc_id").asc(),
            )
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            df = df.dropDuplicates(["fp"])
        rewrite_bucketed_table(self.spark, self.table, df)
        return {
            "rows_before": before,
            "rows_after": self.spark.table(self.table).count(),
        }

    def screen(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        exclude_tag: str | None = None,
    ) -> DataFrame:
        """Rows of ``docs`` whose text has NEVER been seen (not in the
        store, not earlier in this batch). Does not mutate the store —
        call ``commit`` with (a subset of) the result to admit them.

        ``exclude_tag``: ignore store entries committed UNDER THAT tag —
        the replay contract for streaming corpus builds: a crash between
        ``commit(tag)`` and the caller's ledger commit replays the
        batch, and WITHOUT the exclusion its own fingerprints would
        screen out its own documents (the batch's doc files were just
        cleaned for rewrite → every doc silently lost). Tags must be
        STORE-UNIQUE per logical batch (CorpusIngestPipeline uses
        run-id#batch-id — a bare foreachBatch id would collide across
        pipelines sharing the store, or across checkpoint resets, and
        wrongly readmit duplicates)."""
        fp = docs.select(
            F.col(id_col), fingerprint(text_col).alias("fp")
        )
        # within-batch exact dedup: deterministic min-id representative
        fresh = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
        if self.exists():
            seen = self.spark.table(self.table)
            if exclude_tag is not None:
                if "batch_tag" not in seen.columns:
                    raise ValueError(
                        f"store table {self.table!r} predates batch "
                        "tagging (no batch_tag column): replay-safe "
                        "screens need a rewrite of the store with the "
                        "current commit() schema, or pass "
                        "exclude_tag=None"
                    )
                seen = seen.where(
                    F.col("batch_tag").isNull()
                    | (F.col("batch_tag") != exclude_tag)
                )
            fresh = fresh.join(seen.select("fp"), "fp", "left_anti")
        return docs.join(fresh.select(id_col), id_col, "left_semi")

    def commit(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        batch_tag: str | None = None,
    ) -> None:
        """Admit these documents' fingerprints. First commit creates the
        bucketed table; later commits append WITHOUT reshuffling the
        store (insertInto preserves bucketing) and ALIGN to the table's
        on-disk schema (a store created before batch tagging keeps its
        2-column layout instead of crashing the insert). A replayed
        batch appends its fingerprints again — duplicate fp rows are
        harmless for the semi/anti screens and bounded by crash
        frequency (a periodic ``dropDuplicates(["fp"])`` rewrite can
        reclaim them)."""
        from ..sink import write_bucketed_table

        fps = docs.select(
            fingerprint(text_col).alias("fp"),
            F.col(id_col).alias("first_doc_id"),
            F.lit(batch_tag).cast("string").alias("batch_tag"),
        ).dropDuplicates(["fp"])
        if not self.exists():
            write_bucketed_table(
                fps, self.table, ["fp"], n_buckets=self.n_buckets,
                sort_cols=["fp"],
            )
        else:
            table_cols = self.spark.table(self.table).columns
            fps.select(
                *[c for c in fps.columns if c in table_cols]
            ).write.insertInto(self.table)


class BandBucketStore:
    """Incremental NEAR-duplicate screening against a PERSISTENT MinHash
    band-bucket store — the cross-batch twin of ``FingerprintStore``
    for the continuously-ingested-corpus shape: every arriving batch is
    screened against the near-dup structure of everything ever kept,
    without rescanning or reshuffling the historical corpus.

    Two catalog tables, both append-only and bucket-laid-out so the
    store side of every screen join reads bucket-locally (NO Exchange):

    - ``{table}``: one row per (band_id, band_hash, doc id) — the
      banded LSH postings. BUCKETED on (band_id, band_hash), the
      candidate-join key: only the (small) new batch's band rows
      shuffle to the store's layout.
    - ``{table}_sigs``: one row per admitted doc with its full minhash
      signature. BUCKETED on the id column, the verification-join key.
      Signatures are the verification payload — ``num_hashes`` longs
      per doc (512 B at 64 hashes), NOT the document text or its
      shingle set, so the store stays O(corpus rows), a fixed few
      hundred bytes per document at any corpus size.

    Candidate verification uses the minhash Jaccard ESTIMATOR over the
    stored signatures (σ = √(J(1−J)/num_hashes) ≤ 0.063 at 64 hashes) —
    the standard LSH verify tier. Exact shingle Jaccard would need the
    standing corpus text (a corpus-sized join per micro-batch, the
    exact shape this store exists to avoid); callers needing exact
    confirmation re-read ONLY the candidate ids from the corpus, which
    the screen's output makes a bounded set.

    Banding parameters are a LAYOUT CONTRACT across the store's
    lifetime (signatures and band hashes must be comparable across
    batches), so the first commit persists them in ``{table}_params``
    and every later open validates against it — a silently different
    ``num_hashes`` would otherwise null out every zip_with comparison
    and admit every duplicate.

    Defaults (b=8, r=8 over 64 hashes) put the s-curve threshold at
    (1/8)^(1/8) ≈ 0.77, matching ``lsh_candidate_pairs``; ``threshold``
    is the verify cut on the estimated Jaccard.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        *,
        num_hashes: int = 64,
        bands: int = 8,
        rows_per_band: int = 8,
        shingle_n: int = 3,
        threshold: float = 0.8,
        n_buckets: int = 64,
    ):
        if bands * rows_per_band > num_hashes:
            raise ValueError(
                f"bands({bands}) × rows_per_band({rows_per_band}) exceeds "
                f"num_hashes({num_hashes})"
            )
        self.spark = spark
        self.table = table
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.shingle_n = shingle_n
        self.threshold = threshold
        self.n_buckets = n_buckets
        heal_bucketed_rewrite(spark, table)  # finish a crashed compact()
        heal_bucketed_rewrite(spark, self._sigs_table())
        heal_bucketed_rewrite(spark, self._params_table())  # orphan sweep
        if self.exists():
            self._validate_params()

    # -- layout-contract plumbing ------------------------------------

    @classmethod
    def open(cls, spark: SparkSession, table: str, **overrides) -> "BandBucketStore":
        """Open an EXISTING store adopting its recorded banding params
        (the layout contract) — the maintenance/CLI entry point, where
        the caller cannot know what parameters the store was created
        with. ``overrides`` may set non-contract knobs (threshold,
        n_buckets)."""
        params_table = f"{table}_params"
        if spark.catalog.tableExists(params_table):
            row = spark.table(params_table).first()
            for k in ("num_hashes", "bands", "rows_per_band", "shingle_n"):
                overrides.setdefault(k, int(getattr(row, k)))
        return cls(spark, table, **overrides)

    def _params_table(self) -> str:
        return f"{self.table}_params"

    def _sigs_table(self) -> str:
        return f"{self.table}_sigs"

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def _params(self) -> dict:
        return {
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "rows_per_band": self.rows_per_band,
            "shingle_n": self.shingle_n,
        }

    def _validate_params(self) -> None:
        if not self.spark.catalog.tableExists(self._params_table()):
            return  # pre-params store: nothing recorded to check against
        row = self.spark.table(self._params_table()).first()
        stored = {k: int(getattr(row, k)) for k in self._params()}
        if stored != self._params():
            raise ValueError(
                f"BandBucketStore {self.table!r} was created with "
                f"{stored} but opened with {self._params()} — banding "
                "parameters are a layout contract; mismatched signatures "
                "would silently compare as non-duplicates"
            )

    # -- signature plumbing ------------------------------------------

    def _signatures(
        self, docs: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        return minhash_signatures(
            docs,
            id_col=id_col,
            text_col=text_col,
            num_hashes=self.num_hashes,
            shingle_n=self.shingle_n,
        )

    def _band_rows(self, sigs: DataFrame, id_col: str) -> DataFrame:
        return sigs.select(
            F.col(id_col),
            F.posexplode(
                band_hashes_expr(self.bands, self.rows_per_band)
            ).alias("band_id", "band_hash"),
        )

    # -- the operator --------------------------------------------------

    def screen(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        exclude_tag: str | None = None,
        within_batch: bool = True,
    ) -> DataFrame:
        """Rows of ``docs`` with NO near-duplicate already in the store
        (estimated Jaccard ≥ ``threshold`` against any admitted doc),
        and — with ``within_batch`` — no SMALLER-id near-duplicate
        inside this same batch (greedy min-id representative, the same
        deterministic keep rule as ``exact_dedup_groups``). Does not
        mutate the store; call ``commit`` with (a subset of) the result.

        ``exclude_tag`` is the same replay contract as
        ``FingerprintStore.screen``: ignore store rows committed under
        this batch's own tag, so a crash between ``commit`` and the
        caller's ledger commit cannot make the replayed batch screen
        out its own documents.

        Plan shape (the 100 TB contract, plan-asserted in tests): the
        band table is scanned bucket-locally on (band_id, band_hash) and
        the sig table bucket-locally on the id column — NO Exchange on
        either store side; only the new batch's band rows (batch ×
        bands) and the candidate set shuffle. The signature frame is
        localCheckpoint()ed once: three branches (within-batch pairs,
        store candidates, verification) would otherwise each re-run the
        shingle→minhash pipeline."""
        sigs = self._signatures(docs, id_col, text_col).localCheckpoint()
        drop_ids = None
        if self.exists():
            store_bands = self.spark.table(self.table)
            store_sigs = self.spark.table(self._sigs_table())
            if exclude_tag is not None:
                keep = F.col("batch_tag").isNull() | (
                    F.col("batch_tag") != exclude_tag
                )
                store_bands = store_bands.where(keep)
                store_sigs = store_sigs.where(keep)
            cand = (
                self._band_rows(sigs, id_col)
                .join(
                    store_bands.select(
                        "band_id",
                        "band_hash",
                        F.col(id_col).alias("_cand_id"),
                    ),
                    ["band_id", "band_hash"],
                )
                .select(id_col, "_cand_id")
                .distinct()
            )
            verified = (
                cand.join(
                    store_sigs.select(
                        F.col(id_col).alias("_cand_id"),
                        F.col("sig").alias("_sig_store"),
                    ),
                    "_cand_id",
                )
                .join(
                    sigs.select(id_col, F.col("sig").alias("_sig_new")),
                    id_col,
                )
                .where(
                    estimated_jaccard("_sig_new", "_sig_store")
                    >= self.threshold
                )
            )
            drop_ids = verified.select(id_col).distinct()
        if within_batch:
            pairs = lsh_candidate_pairs(
                sigs, id_col=id_col,
                bands=self.bands, rows_per_band=self.rows_per_band,
            )
            wb = (
                pairs.join(
                    sigs.select(
                        F.col(id_col).alias("id_a"),
                        F.col("sig").alias("sig_a"),
                    ),
                    "id_a",
                )
                .join(
                    sigs.select(
                        F.col(id_col).alias("id_b"),
                        F.col("sig").alias("sig_b"),
                    ),
                    "id_b",
                )
                .where(estimated_jaccard("sig_a", "sig_b") >= self.threshold)
                .select(F.col("id_b").alias(id_col))  # id_a < id_b: min id wins
                .distinct()
            )
            drop_ids = wb if drop_ids is None else drop_ids.unionByName(wb)
        if drop_ids is None:
            return docs
        return docs.join(drop_ids, id_col, "left_anti")

    def commit(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        batch_tag: str | None = None,
    ) -> None:
        """Admit these documents' band postings and signatures. First
        commit creates both bucketed tables (and the params contract);
        later commits append via ``insertInto``, which preserves the
        bucket layout — the store never needs a maintenance re-shuffle.
        A replayed batch appends duplicate rows, which the semi-join
        screen tolerates (same bounded-by-crash-frequency posture as
        ``FingerprintStore``; ``compact`` reclaims them)."""
        from ..sink import write_bucketed_table

        sigs = self._signatures(docs, id_col, text_col).localCheckpoint()
        tag = F.lit(batch_tag).cast("string").alias("batch_tag")
        band_rows = self._band_rows(sigs, id_col).select(
            "band_id", "band_hash", F.col(id_col), tag
        )
        sig_rows = sigs.select(F.col(id_col), F.col("sig"), tag)
        if not self.exists():
            write_bucketed_table(
                band_rows, self.table, ["band_id", "band_hash"],
                n_buckets=self.n_buckets,
                sort_cols=["band_id", "band_hash"],
            )
            write_bucketed_table(
                sig_rows, self._sigs_table(), [id_col],
                n_buckets=self.n_buckets, sort_cols=[id_col],
            )
            from ..sink import clear_orphan_table_location

            clear_orphan_table_location(self.spark, self._params_table())
            self.spark.createDataFrame(
                [tuple(self._params().values())],
                " ".join(f"{k} int," for k in self._params()).rstrip(","),
            ).write.mode("overwrite").saveAsTable(self._params_table())
        else:
            for frame, table in (
                (band_rows, self.table),
                (sig_rows, self._sigs_table()),
            ):
                cols = self.spark.table(table).columns
                frame.select(*cols).write.insertInto(table)

    def compact(
        self,
        *,
        expire_run_tag: str | None = None,
        expire_below_batch: int | None = None,
    ) -> dict[str, int]:
        """Same lifecycle contract as ``FingerprintStore.compact``, over
        both store tables: reclaim crash-replay duplicate rows (one
        survivor per band posting / per doc signature), optionally
        expire batch-tagged entries below a run horizon, and rewrite
        through ``rewrite_bucketed_table`` so both bucket layouts — and
        the no-Exchange screen plan — survive. A doc expired from the
        sig table loses its band postings in the same pass (the two
        tables stay consistent because the same tag filter applies to
        both)."""
        if (expire_run_tag is None) != (expire_below_batch is None):
            raise ValueError(
                "pass expire_run_tag and expire_below_batch together"
            )
        if not self.exists():
            return {"rows_before": 0, "rows_after": 0}
        out = {}
        for table, keys in (
            (self.table, ["band_id", "band_hash"]),
            (self._sigs_table(), None),
        ):
            df = self.spark.table(table)
            id_col = [
                c for c in df.columns
                if c not in {"band_id", "band_hash", "sig", "batch_tag"}
            ][0]
            before = df.count()
            if expire_run_tag is not None:
                df = df.where(
                    _expired_tag_filter(expire_run_tag, expire_below_batch)
                )
            dedup_keys = (keys or []) + [id_col]
            w = Window.partitionBy(*dedup_keys).orderBy(
                F.col("batch_tag").asc_nulls_first()
            )
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            rewrite_bucketed_table(self.spark, table, df)
            out[table] = {
                "rows_before": before,
                "rows_after": self.spark.table(table).count(),
            }
        return out


def prefix_duplicate_groups(
    docs: DataFrame,
    n_prefix: int = 16,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Truncation-duplicate detection: documents sharing their first
    ``n_prefix`` normalized tokens — the scrape-artifact family exact
    dedup misses (same page captured at different lengths, feed items
    cut mid-document) and near-dup misses when the tails diverge
    enough.

    Key = md5 of the joined token prefix (portable across engines, like
    ``fingerprint``). One scan builds the prefix hash in the scan stage
    (slice + concat_ws + md5, all codegen); one groupBy on the hash with
    map-side partials; groups of one collapse before the exchange.
    Docs shorter than ``n_prefix`` tokens are excluded — their "prefix"
    is the whole document, which is exact dedup's job, not this pass's.

    Output: (prefix_fp, n_docs, min_tokens, max_tokens) per shared
    prefix with ≥ 2 documents; min < max is the truncation signature.
    """
    from .textops import tokens_col

    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).withColumn("n_tok", F.size("toks"))
    pref = toks.where(F.col("n_tok") >= n_prefix).select(
        "doc_id",
        "n_tok",
        F.md5(F.concat_ws(" ", F.slice("toks", 1, n_prefix))).alias(
            "prefix_fp"
        ),
    )
    return (
        pref.groupBy("prefix_fp")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_tok").cast("bigint").alias("min_tokens"),
            F.max("n_tok").cast("bigint").alias("max_tokens"),
        )
        .where(F.col("n_docs") >= 2)
    )


def stitched_doc_pairs(
    docs: DataFrame,
    n: int = 16,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stitching-artifact detection: ordered pairs (doc_a, doc_b) where
    doc_a's LAST ``n`` normalized tokens equal doc_b's FIRST ``n`` —
    the chunked-scrape signature (one page split across consecutive
    records with a shared boundary window, or paginated article parts).
    The family neither exact dedup (different content) nor whole-doc
    near-dup (low global Jaccard when the parts are long) catches;
    downstream, matched pairs are merge candidates, the complement of
    chunk_documents' split direction.

    Both edge windows hash to md5 IN THE SCAN STAGE (slice + concat_ws
    + md5, codegen), so the equi-join shuffles 32-byte fingerprints —
    never document text; the boundary window (bounded: n tokens) rides
    the suffix side for display. Docs need > ``n`` tokens: at exactly
    ``n`` the "suffix" is the whole document and the match is exact
    dedup's job. Self-pairs are excluded; a doc whose own suffix equals
    its own prefix is periodic text, not stitching.

    Output: (doc_a, doc_b, boundary) — one row per matching ordered
    pair. Pair volume is bounded by boundary-window collisions, the
    same birthday bound as every md5-keyed operator here.
    """
    from .textops import tokens_col

    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).where(F.size("toks") > n)
    suf = toks.select(
        F.col("doc_id").alias("doc_a"),
        F.md5(F.concat_ws(" ", F.slice("toks", -n, n))).alias("_fp"),
        F.concat_ws(" ", F.slice("toks", -n, n)).alias("boundary"),
    )
    pre = toks.select(
        F.col("doc_id").alias("doc_b"),
        F.md5(F.concat_ws(" ", F.slice("toks", 1, n))).alias("_fp"),
    )
    return (
        suf.join(pre, "_fp")
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "boundary")
    )
