"""Operator library: the relational surface (SURVEY §2.4 absences) plus
the LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing)."""

from .relational import asof_join, top_k_per_group
from .dedup import exact_dedup_groups, minhash_signatures, lsh_candidate_pairs, simhash
from .similarity import cosine_topk_bruteforce, lsh_cosine_topk
from .textops import token_count_col, quality_score_cols, stopword_lang_scores

__all__ = [
    "asof_join",
    "top_k_per_group",
    "exact_dedup_groups",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
    "cosine_topk_bruteforce",
    "lsh_cosine_topk",
    "token_count_col",
    "quality_score_cols",
    "stopword_lang_scores",
]
