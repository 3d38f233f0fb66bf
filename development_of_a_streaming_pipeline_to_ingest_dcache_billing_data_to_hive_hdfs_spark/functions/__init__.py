"""Shared scalar/column function library — the engine's single home for
reusable column expressions (all JVM-side, codegen-friendly)."""

from ..parse import partition_date_col
from ..operators.dedup import (
    char_shingles,
    prefix_duplicate_groups,
    estimated_jaccard,
    fingerprint,
    ngram_jaccard,
    normalized_text,
)
from ..operators.textops import (
    bpe_ish_token_count,
    bpe_encode_words,
    bpe_pair_counts,
    duplicated_spans,
    holdout_split_col,
    learn_bpe_merges,
    linear_quality_logit,
    predicted_lang_col,
    pseudonymize_col,
    quality_score_cols,
    raw_ngrams_col,
    scrub_text,
    stopword_lang_scores,
    token_count_col,
    tfidf_top_terms,
    tokens_col,
    unigram_nll,
)
from ..operators.profile import (
    fixed_width_histogram,
    group_zscore_anomalies,
    profile_numeric,
    winsorized_stats,
)
from ..operators.similarity import COSINE_EXPR
from ..operators.urlops import (
    cap_per_domain,
    filter_blocked_domains,
    path_depth_col,
    registered_domain_col,
    url_host_col,
    with_url_parts,
)

__all__ = [
    "url_host_col",
    "registered_domain_col",
    "path_depth_col",
    "with_url_parts",
    "filter_blocked_domains",
    "cap_per_domain",
    "partition_date_col",
    "normalized_text",
    "fingerprint",
    "char_shingles",
    "ngram_jaccard",
    "estimated_jaccard",
    "tokens_col",
    "unigram_nll",
    "token_count_col",
    "bpe_ish_token_count",
    "quality_score_cols",
    "stopword_lang_scores",
    "predicted_lang_col",
    "raw_ngrams_col",
    "bpe_pair_counts",
    "bpe_encode_words",
    "learn_bpe_merges",
    "linear_quality_logit",
    "prefix_duplicate_groups",
    "duplicated_spans",
    "tfidf_top_terms",
    "holdout_split_col",
    "scrub_text",
    "pseudonymize_col",
    "COSINE_EXPR",
    "profile_numeric",
    "group_zscore_anomalies",
    "fixed_width_histogram",
    "winsorized_stats",
]
