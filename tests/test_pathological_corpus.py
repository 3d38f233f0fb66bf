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
