"""BM25 keyword search over the document corpus.

The corpus-exploration query a training-data pipeline runs constantly —
"show me documents about X" — expressed so the corpus NEVER shuffles:

- Document length (``dl``) is ``size(tokens)``: a scan-stage expression
  carried alongside the exploded token stream, so no corpus-wide
  doc-length join is ever needed.
- The query-term filter lands on the exploded stream INSIDE the same
  scan stage; only tokens matching the (tiny, literal) query survive
  into the one keyed aggregation. Everything downstream — document
  frequencies, corpus stats, the final top-k — operates on the matched
  subset.
- Corpus stats (``N``, ``avgdl``) are one 1-row aggregate over a
  scan-stage projection (no explode), broadcast back.
- Top-k is ``TakeOrderedAndProject`` on the ROUNDED score with the doc
  id as tie-break — reproducible across engines and retries.

Scoring is Lucene-shaped BM25:

    idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
    score(d)    = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

built from exact integer counts with +,/,ln doubles — the identical
expression replays in the DuckDB oracle, so scores get hard 4-dp parity.

For repeated querying, :func:`build_postings` materializes the classic
inverted index — ``(term, doc_id, tf, dl)`` — once; ``bm25_search``
accepts it via ``postings=``. Persist it BUCKETED on ``term`` (the
``sink.write_bucketed_table`` path the dedup stores use) and a term
lookup reads bucket-locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import tokens_col

__all__ = ["build_postings", "bm25_search", "PostingsStore"]


def build_postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The inverted index as a DataFrame: one row per (term, document)
    with the term frequency and the document length — everything BM25
    needs at query time without touching raw text again. One corpus
    scan (explode with ``dl`` carried as a scan-stage expression), one
    keyed aggregation."""
    toks = docs.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).alias("dl"),
        F.explode(tokens_col(text_col)).alias("term"),
    )
    return toks.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("dl").alias("dl"),
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query, BM25-ranked.

    Terms are matched against the same lowercase-whitespace
    tokenization the rest of the text stack uses; duplicate query terms
    are deduplicated (BM25 is a sum over distinct terms). Returns
    ``(id_col, n_terms_hit, score)``, score rounded 4 dp, ordered by
    (score desc, id) — only documents matching ≥1 term appear.

    Pass ``postings=`` (from :func:`build_postings`, ideally persisted
    bucketed on ``term``) to skip the corpus scan; ``docs`` is then
    only used for the corpus stats when they cannot be derived — both
    N and avgdl come from the postings' per-doc ``dl`` … which misses
    zero-token documents, so stats still come from ``docs`` (cheap:
    scan-stage sizes, no explode)."""
    terms = sorted({t for t in (s.strip().lower() for s in query_terms) if t})
    if not terms:
        raise ValueError("query_terms is empty after normalization")
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")

    if postings is None:
        # one definition of the posting shape: Catalyst pushes the
        # query-term filter below the (term, id) aggregate — it's a
        # grouping-key predicate — so the scan-stage-filter contract
        # holds without duplicating build_postings' explode inline
        # (plan-asserted in tests/test_search.py)
        postings = build_postings(docs, id_col=id_col, text_col=text_col)
    tf = postings.where(F.col("term").isin(terms)).select(
        "term", id_col, "tf", "dl"
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens_col(text_col))).alias("avgdl"),
    )
    return _bm25_rank(tf, stats, k, id_col=id_col, k1=k1, b=b)


def _bm25_rank(
    tf: DataFrame,
    stats: DataFrame,
    k: int,
    *,
    id_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """Scoring core shared by the scan path and the persisted store:
    ``tf`` = matched postings (term, id, tf, dl), ``stats`` = 1 row
    (n_docs, avgdl). Document frequencies and stats broadcast; top-k is
    TakeOrderedAndProject on the rounded score with id tie-break."""
    df_tbl = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
            F.round(F.sum(idf * tf_part), 4).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


class PostingsStore:
    """PERSISTED inverted index: the postings table BUCKETED on ``term``
    plus a 1-row stats table — repeated queries never rescan the corpus,
    and a term lookup never reads the whole index either:

    - **Bucket pruning.** ``search()`` filters on literal query terms,
      and Spark prunes a bucketed table's FILES by the filter's bucket
      ids (``SelectedBucketsCount m (out of n)`` in the scan) — a
      3-term query against a 64-bucket index opens ≤3 buckets' files.
      That is the scale contract a flat parquet postings dump cannot
      give (term min/max overlaps in every file); plan-asserted in
      tests/test_search.py.
    - **Appends keep the layout.** ``append(docs)`` writes new
      documents' postings via ``insertInto``, which honors the table's
      bucket spec (the dedup stores' idiom). Appended doc sets must be
      DISJOINT from what's indexed (the same batch contract as every
      corpus append here); replays of the same append double tf rows —
      gate appends with the pipeline ledger like the other stores.
    - **Stats ride along.** ``(n_docs, sum_dl)`` persist in
      ``<table>_stats`` and fold on append, so BM25's idf/avgdl need no
      corpus or index scan at query time. Zero-token documents never
      enter the postings, so they are counted here, not there.
    """

    def __init__(self, spark: SparkSession, table: str, n_buckets: int = 64):
        self.spark = spark
        self.table = table
        self.stats_table = f"{table}_stats"
        self.n_buckets = n_buckets

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def _doc_stats(self, docs: DataFrame, id_col: str, text_col: str):
        row = docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.size(tokens_col(text_col))), F.lit(0)
            ).alias("sum_dl"),
        ).collect()[0]
        return int(row.n_docs), int(row.sum_dl)

    def build(
        self,
        docs: DataFrame,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """(Re)build the index from scratch — overwrite both tables."""
        from ..sink import write_bucketed_table

        postings = build_postings(docs, id_col=id_col, text_col=text_col)
        write_bucketed_table(
            postings,
            self.table,
            ["term"],
            n_buckets=self.n_buckets,
            sort_cols=["term"],
        )
        n, s = self._doc_stats(docs, id_col, text_col)
        self.spark.createDataFrame(
            [(n, s)], "n_docs bigint, sum_dl bigint"
        ).write.mode("overwrite").saveAsTable(self.stats_table)

    def append(
        self,
        docs: DataFrame,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """Index NEW (disjoint) documents: postings append bucket-true
        via insertInto; the stats row folds the increment."""
        if not self.exists():
            self.build(docs, id_col=id_col, text_col=text_col)
            return
        cols = [f.name for f in self.spark.table(self.table).schema]
        build_postings(docs, id_col=id_col, text_col=text_col).select(
            *cols
        ).write.insertInto(self.table)
        n, s = self._doc_stats(docs, id_col, text_col)
        prev = self.spark.table(self.stats_table).collect()[0]
        self.spark.createDataFrame(
            [(prev.n_docs + n, prev.sum_dl + s)],
            "n_docs bigint, sum_dl bigint",
        ).write.mode("overwrite").saveAsTable(self.stats_table)

    def search(
        self,
        query_terms: list[str],
        k: int = 10,
        *,
        id_col: str = "doc_id",
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        terms = sorted(
            {t for t in (s.strip().lower() for s in query_terms) if t}
        )
        if not terms:
            raise ValueError("query_terms is empty after normalization")
        if k <= 0:
            raise ValueError(f"k must be positive: {k}")
        tf = self.spark.table(self.table).where(
            F.col("term").isin(terms)
        )
        stats = self.spark.table(self.stats_table).select(
            "n_docs",
            (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"),
        )
        return _bm25_rank(tf, stats, k, id_col=id_col, k1=k1, b=b)

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
        self.spark.sql(f"DROP TABLE IF EXISTS {self.stats_table}")
