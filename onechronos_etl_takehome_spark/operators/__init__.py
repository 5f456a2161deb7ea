from .asof import asof_join
from .dedup import (
    dedup_components,
    dedup_exact,
    deterministic_dedup,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from .similarity import cosine_topk_bruteforce, cosine_topk_ivf, cosine_topk_lsh
from .skew import salted_join

__all__ = [
    "asof_join",
    "dedup_components",
    "dedup_exact",
    "deterministic_dedup",
    "minhash_dedup_pairs",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "salted_join",
]
