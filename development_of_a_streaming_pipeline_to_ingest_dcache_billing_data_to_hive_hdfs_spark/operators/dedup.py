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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(col: str = "text") -> Column:
    """Canonical form for exact dedup: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")


def fingerprint(col: str = "text") -> Column:
    """128-bit content fingerprint (md5 of normalized text) — portable
    (same value in any engine), unlike xxhash64."""
    return F.md5(normalized_text(col))


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
    array<string>. Pure SQL higher-order functions — JVM-side."""
    norm = normalized_text(col)
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({_norm_sql(col)}) - {n - 1}, 1)),"
            f" i -> substr({_norm_sql(col)}, i, {n}))"
        )
    )


def _norm_sql(col: str) -> str:
    return f"regexp_replace(trim(lower({col})), '\\\\s+', ' ')"


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) — sig[j] = min over shingles of
    xxhash64(shingle, j). One scan, no shuffle; the per-seed min runs as a
    single JVM expression over the shingle array."""
    sh = char_shingles(text_col, shingle_n).alias("sh")
    sig = F.expr(
        f"transform(sequence(0, {num_hashes - 1}),"
        f" j -> array_min(transform(sh, s -> xxhash64(s, j))))"
    )
    return df.select(F.col(id_col), sh).select(F.col(id_col), sig.alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs from banded LSH over minhash signatures.

    explode to (band_id, band_hash) → self equi-join on the bucket →
    distinct pairs. The only shuffle is the bucket join; Jaccard-similar
    docs collide in ≥1 band with high probability (b=16, r=4 → s-curve
    threshold ≈ (1/16)^(1/4) ≈ 0.5).
    """
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> xxhash64(concat_ws(',', slice(sig, b * {rows_per_band} + 1, {rows_per_band}))))"
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
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
