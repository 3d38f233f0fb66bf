"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: exact baseline. The query set is broadcast
  (it is small by construction); the corpus is scanned once; per-query
  top-k via window. At 100 TB the scan is embarrassingly parallel and
  the only shuffle is the final tiny top-k.
- LSH (random hyperplane) top-k: the scale path. Sign-bit signatures
  bucket the corpus; candidates come from an equi-join on bucket keys;
  exact cosine reranks within buckets. Recall tuned by tables × bits.

Dot products run as JVM higher-order functions (zip_with + aggregate) —
no Python in the row path. A Pandas-UDF/numpy variant is a drop-in when
vector width × row count makes Arrow batching win; for 32-d test vectors
the expression path wins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


COSINE_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, v) -> s + v) / "
    "(sqrt(aggregate({a}, 0D, (s, v) -> s + v * v)) * "
    " sqrt(aggregate({b}, 0D, (s, v) -> s + v * v)))"
)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos) with per-query rank ≤ k,
    self-matches excluded. The queries side is broadcast."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    cos = F.expr(COSINE_EXPR.format(a="q_vec", b="c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (id_a < id_b) whose cosine similarity ≥ threshold —
    embedding-space near-duplicate detection.

    Shape: the corpus is L2-normalized once, collected to a dense
    (n × d) float64 matrix, and broadcast; each partition then computes
    its block of the similarity matrix as one BLAS matmul inside
    Arrow-batched mapInPandas. That replaces 2 interpreted higher-order
    dot products *per pair* with a vectorized block product per
    partition (~20× faster at 2k × 64d), and the scan side stays fully
    distributed. Constraint (documented, standard for broadcast-index
    ANN): the index matrix must fit in executor memory — beyond that,
    block by LSH buckets first (``lsh_cosine_topk``'s bucketing) and
    apply this verifier within buckets."""
    import pandas as pd

    pdf = df.select(F.col(id_col), F.col(vec_col)).toPandas()
    ids = pdf[id_col].to_numpy()
    index = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    index /= np.maximum(np.linalg.norm(index, axis=1, keepdims=True), 1e-12)
    sc = df.sparkSession.sparkContext
    b_ids, b_index = sc.broadcast(ids), sc.broadcast(index)

    def op(batches):
        for batch in batches:
            if not len(batch):
                continue
            ids_b = batch[id_col].to_numpy()
            block = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            block /= np.maximum(np.linalg.norm(block, axis=1, keepdims=True), 1e-12)
            sims = block @ b_index.value.T
            keep = (sims >= threshold) & (ids_b[:, None] < b_ids.value[None, :])
            r, c = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": ids_b[r], "id_b": b_ids.value[c], "cos": sims[r, c]}
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        op, "id_a long, id_b long, cos double"
    )


def _fit_centroids_kmeans(
    sample: np.ndarray, n_lists: int, iters: int = 5, seed: int = 42
) -> np.ndarray:
    """Driver-side k-means on a (normalized) sample — the IVF training
    step. Deterministic: seeded init, fixed iteration count."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroid list(s) by
    cosine. One scan, no shuffle: the (tiny) centroid matrix broadcasts
    and each partition does a single BLAS matmul in mapInPandas. Output:
    (id, vec, list_id) with n_probe rows per input vector."""
    import pandas as pd

    sc = df.sparkSession.sparkContext
    b_cent = sc.broadcast(centroids)

    def op(batches):
        for batch in batches:
            if not len(batch):
                continue
            M = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            M_n = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            sims = M_n @ b_cent.value.T
            order = np.argsort(-sims, axis=1)[:, :n_probe]
            yield pd.DataFrame(
                {
                    id_col: batch[id_col].to_numpy().repeat(n_probe),
                    vec_col: [row for row in M for _ in range(n_probe)],
                    "list_id": order.ravel(),
                }
            )

    out_schema = f"{id_col} long, {vec_col} array<double>, list_id int"
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(op, out_schema)


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine — the bucketed scale
    path complementary to ``lsh_cosine_topk``:

    1. *Train*: k-means centroids on a bounded corpus sample
       (driver-side numpy — IVF training is always a sampled, centralized
       step; the sample size is fixed, not data-scaled).
    2. *Assign*: every corpus vector to its nearest list (one distributed
       scan, broadcast centroids, no shuffle).
    3. *Probe*: each query fans out to its ``n_probe`` nearest lists;
       candidates come from the equi-join on ``list_id`` — the only
       shuffle, sized by list selectivity (n_probe/n_lists of the corpus
       per query instead of all of it).
    4. *Rerank*: exact cosine + per-query top-k window over candidates.
    """
    sample_pdf = (
        corpus.select(vec_col).limit(train_sample).toPandas()
    )
    sample = np.stack([np.asarray(v, dtype=np.float64) for v in sample_pdf[vec_col]])
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = _fit_centroids_kmeans(sample, min(n_lists, len(sample)), seed=seed)

    c_assigned = ivf_assign(corpus, cent, id_col, vec_col, n_probe=1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "list_id"
    )
    q_assigned = ivf_assign(queries, cent, id_col, vec_col, n_probe=n_probe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "list_id"
    )
    cand = (
        c_assigned.join(F.broadcast(q_assigned), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    cos = F.expr(COSINE_EXPR.format(a="q_vec", b="c_vec"))
    scored = cand.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def random_hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 42) -> list[list[list[float]]]:
    """Seeded hyperplane sets, shipped to the plan as literals (tiny)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).round(6).tolist()


def _signature_expr(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-bit LSH signature of one table: bit j = (vec · plane_j) > 0."""
    bits = []
    for j, plane in enumerate(planes):
        arr = "array(" + ",".join(f"{x}D" for x in plane) + ")"
        dot = f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), 0D, (s, v) -> s + v)"
        bits.append(f"if({dot} > 0D, shiftleft(1L, {j}), 0L)")
    return F.expr(" | ".join(bits))


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
    n_tables: int = 16,
    dim: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket on any of n_tables sign signatures, then
    exact-cosine rerank within the (small) candidate set.

    Defaults (4 bits x 16 tables) are tuned for near-uniform random
    vectors, where true neighbors sit barely above the noise floor and
    recall needs many low-selectivity tables. Clustered real-world
    embeddings support more bits per table (smaller candidate sets);
    recall/cost is pytest-measured against the brute-force baseline."""
    tables = random_hyperplanes(dim, n_bits, n_tables, seed)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c_sig = c.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), _signature_expr("c_vec", tables[t]).alias("sig"))
                for t in range(n_tables)
            ])
        ).alias("ts"),
    ).select("neighbor_id", "c_vec", F.col("ts.t").alias("t"), F.col("ts.sig").alias("sig"))
    q_sig = q.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), _signature_expr("q_vec", tables[t]).alias("sig"))
                for t in range(n_tables)
            ])
        ).alias("ts"),
    ).select("query_id", "q_vec", F.col("ts.t").alias("t"), F.col("ts.sig").alias("sig"))
    cand = (
        c_sig.join(F.broadcast(q_sig), ["t", "sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .distinct()
    )
    cos = F.expr(COSINE_EXPR.format(a="q_vec", b="c_vec"))
    scored = cand.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
