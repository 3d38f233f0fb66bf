"""Every text/dedup operator over a pathological corpus: empty strings,
whitespace-only, single tokens, unicode, pathological repetition, long
docs. Under ANSI mode (Spark 4 default) unguarded expressions THROW
instead of yielding nulls — three such bugs shipped before this net
(short-doc trigrams, zero-norm cosine, malformed dates). Every operator
must evaluate without raising and produce sane values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.dedup import (
    char_shingles,
    exact_dedup_groups,
    fingerprint,
    lsh_candidate_pairs,
    minhash_signatures,
    rolling_hash_fingerprint,
    simhash,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
    bigrams_col,
    bpe_ish_token_count,
    pack_sequences,
    predicted_lang_col,
    quality_score_cols,
    raw_ngrams_col,
    repeated_token_ratio,
    scrub_text,
    token_budget_sample,
    token_count_col,
)

NASTY = [
    (1, ""),
    (2, "   "),
    (3, "x"),
    (4, "a b"),
    (5, "the the the the the the"),
    (6, "héllo wörld ünïcode ß text"),
    (7, "a " * 2000),                        # long, repetitive
    (8, "tab\tand\nnewline  spaced"),
    (9, "1234 5678 !!! ??? ..."),
    (10, "mixed EL la DE und the of"),
]


@pytest.fixture(scope="module")
def nasty(spark):
    return spark.createDataFrame(
        [(i, t, "src") for i, t in NASTY],
        "doc_id long, text string, source string",
    )


def test_scalar_text_operators_never_throw(spark, nasty):
    out = nasty.select(
        "doc_id",
        token_count_col().alias("n_tok"),
        bpe_ish_token_count().alias("n_bpe"),
        repeated_token_ratio().alias("rep"),
        predicted_lang_col().alias("lang"),
        scrub_text().alias("scrubbed"),
        fingerprint().alias("fp"),
        rolling_hash_fingerprint().alias("rfp"),
        F.size(bigrams_col()).alias("n_bigrams"),
        F.size(char_shingles()).alias("n_shingles"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_tok == 0 and by_id[1].rep is None
    assert by_id[2].n_tok == 0
    assert by_id[3].n_bigrams == 0
    assert by_id[5].rep > 0.8          # all-same tokens
    assert by_id[6].fp is not None     # unicode fingerprints fine
    assert all(r.lang is not None for r in out)


def test_quality_scores_never_throw(spark, nasty):
    cols = quality_score_cols()
    out = nasty.select("doc_id", *[v.alias(k) for k, v in cols.items()]).collect()
    for r in out:
        for k in cols:
            assert getattr(r, k) is not None or r.doc_id in (1, 2), (r, k)


def test_ngram_family_never_throws(spark, nasty):
    toks = nasty.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", F.size(raw_ngrams_col("toks", 3)).alias("n3"),)
    got = {r.doc_id: r.n3 for r in toks.collect()}
    assert got[1] == 0 and got[3] == 0 and got[4] == 0
    assert got[5] == 4  # 6 tokens -> 4 trigrams


def test_signature_family_never_throws(spark, nasty):
    sigs = minhash_signatures(nasty)
    # docs with zero shingles produce no signature row - documented;
    # those with content produce full-width signatures
    rows = sigs.collect()
    assert all(len(r.sig) == 64 for r in rows)
    assert {r.doc_id for r in rows} >= {4, 5, 6, 7, 10}
    pairs = lsh_candidate_pairs(sigs, bands=8, rows_per_band=8)
    pairs.count()  # must evaluate
    sh = simhash(nasty)
    assert sh.where(F.col("simhash").isNotNull()).count() >= 5
    groups = exact_dedup_groups(nasty)
    assert groups.count() >= 1


def test_packing_and_budget_never_throw(spark, nasty):
    packed = pack_sequences(nasty, budget_tokens=8)
    got = {r.doc_id: r.pack_id for r in packed.collect()}
    assert len(got) == len(NASTY)          # every doc gets a pack
    kept = token_budget_sample(nasty, budget_tokens=8)
    assert kept.count() >= 1


def test_round4_text_operators_never_throw(spark, nasty):
    """The round-4 operators over the pathological corpus: pair counts,
    span dedup, tf-idf, quality classifier, prefix dups. Empty and
    single-char words must produce no pairs (not throw under ANSI);
    sub-window docs contribute no spans; empty docs get no tf-idf rows."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.dedup import (
        prefix_duplicate_groups,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        bpe_pair_counts,
        duplicated_spans,
        linear_quality_logit,
        tfidf_top_terms,
    )

    pairs = {r["pair"]: r for r in bpe_pair_counts(nasty).collect()}
    assert "x" not in pairs  # single-char word contributes nothing
    assert all(len(p) == 2 for p in pairs)
    # unicode pairs survive (é from 'héllo')
    assert any("é" in p for p in pairs)

    spans = duplicated_spans(nasty, n=3).collect()
    for r in spans:  # "a a a" from doc 7 repeats within ONE doc only
        assert r["n_docs"] >= 2

    tfidf = tfidf_top_terms(nasty, k=2).collect()
    ids_with_terms = {r["doc_id"] for r in tfidf}
    assert 1 not in ids_with_terms and 2 not in ids_with_terms  # no tokens
    assert 3 in ids_with_terms
    assert all(r["score"] > 0 for r in tfidf)

    logits = nasty.select(
        "doc_id", linear_quality_logit().alias("z")
    ).collect()
    assert all(r["z"] is not None for r in logits)  # empty text included

    # all docs are < 16 tokens except the long one → at most nothing
    out = prefix_duplicate_groups(nasty, n_prefix=16).collect()
    assert all(r["n_docs"] >= 2 for r in out)


def test_round4_semantic_ops_never_throw(spark):
    """k-means and PQ on degenerate vector sets: all-identical vectors
    (k > distinct points) and zero vectors must not divide-by-zero or
    loop forever."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.similarity import (
        kmeans_embeddings,
        pq_cosine_topk,
    )

    same = spark.createDataFrame(
        [(i, [1.0, 2.0, 0.0, 0.0]) for i in range(6)]
        + [(6, [0.0, 0.0, 0.0, 0.0])],  # a zero vector
        "vec_id long, embedding array<double>",
    )
    assignments, cent, history = kmeans_embeddings(same, k=4, iters=2, init_sample=7)
    assert assignments.count() == 7
    for a, b in zip(history, history[1:]):
        assert b <= a * (1 + 1e-9) + 1e-9
    q = same.where(F.col("vec_id") < 2)
    out = pq_cosine_topk(same, q, k=3, m=2, ks=4, train_sample=7, shortlist=5)
    assert out.count() > 0


def test_token_oracles_agree_on_whitespace_edges(spark, tmp_path):
    """DuckDB trim() strips only spaces; a doc starting/ending with tab
    or newline used to give the oracle a phantom empty token that Spark's
    tokens_col filters — shifting every window position. Pin the parity
    on exactly that corpus."""
    import os
    import sys

    import pandas as pd

    sys.path.insert(0, os.path.dirname(__file__))
    from oracle_harness import compare_all

    boiler = " ".join(f"w{i}" for i in range(20))
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "\t" + boiler + "\n",
                boiler + " tail",
                "\n gamma delta " * 10 + "\t",
            ],
            "lang": ["en"] * 3,
            "source": ["web", "web", "books"],
            "n_chars": [1, 1, 1],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    names = [
        "q_llm_span_dedup",
        "q_llm_prefix_dups",
        "q_llm_dup_span_fraction",
        "q_llm_tfidf_terms",
        "q_llm_bpe_pairs",
    ]
    res = compare_all(spark, str(tmp_path), names)
    bad = {k: v for k, v in res.items() if not v.get("ok")}
    assert not bad, bad


def test_unigram_nll_never_throws_on_nasty_corpus(spark, nasty):
    """Empty/whitespace docs produce NO tokens (absent from output, not
    a crash); everything else scores finite positive nll."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        unigram_nll,
    )

    rows = unigram_nll(nasty).collect()
    ids = {r["doc_id"] for r in rows}
    assert 1 not in ids and 2 not in ids  # token-less docs drop out
    assert {3, 4, 5, 6, 7}.issubset(ids)
    assert all(r["nll"] is not None and r["nll"] >= 0 for r in rows)


def test_profile_ops_never_throw_on_degenerate_frames(spark):
    """Single-row groups, all-NULL columns, empty input — the shapes
    that turn unguarded aggregates into ANSI throws."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.profile import (
        fixed_width_histogram,
        group_zscore_anomalies,
        profile_numeric,
        winsorized_stats,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("b", None)], "k string, v double"
    )
    assert len(profile_numeric(df, ["v"]).collect()) == 1
    assert len(group_zscore_anomalies(df, "k", "v").collect()) == 2
    assert len(winsorized_stats(df, "k", "v").collect()) == 2
    assert fixed_width_histogram(df, "v", 10.0).count() == 1
    empty = df.where("1=0")
    assert profile_numeric(empty, ["v"]).collect()[0]["n_rows"] == 0
    assert group_zscore_anomalies(empty, "k", "v").count() == 0
    assert fixed_width_histogram(empty, "v", 10.0).count() == 0
