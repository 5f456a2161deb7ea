from .asof import asof_join
from .dedup import (
    dedup_exact,
    deterministic_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from .similarity import cosine_topk_bruteforce, cosine_topk_lsh

__all__ = [
    "asof_join",
    "dedup_exact",
    "deterministic_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
]
