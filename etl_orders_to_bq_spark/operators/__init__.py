from .dedup import (
    exact_dedup,
    incremental_exact_dedup,
    incremental_lsh_matches,
    first_occurrence_dedup,
    minhash_signature,
    minhash_band_keys,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import score_similarity, similar_products, top_k_similar
from .sketches import hll_merge, hll_rollup, kll_quantile_rollup, kll_quantiles, theta_distinct
from .staging import stage
from .ann import ann_topk_bruteforce, ann_topk_lsh

__all__ = [
    "first_occurrence_dedup",
    "exact_dedup",
    "incremental_exact_dedup",
    "incremental_lsh_matches",
    "minhash_signature",
    "minhash_band_keys",
    "minhash_lsh_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "score_similarity",
    "similar_products",
    "top_k_similar",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "stage",
    "hll_rollup",
    "hll_merge",
    "kll_quantile_rollup",
    "kll_quantiles",
    "theta_distinct",
]
