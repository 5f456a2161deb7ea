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
from .audio import audio_match_pairs, spectral_landmarks
from .multimodal import (
    cdc_chunk_neardup,
    cdc_gear_chunks,
    decode_features,
    dhash_near_pairs,
    image_dhash,
)
from .drift import histogram_drift
from .fusion import rrf_fuse
from .privacy import k_anonymize
from .video import avi_frames, avi_from_frames, video_match_pairs
from .similarity import cosine_topk_bruteforce, cosine_topk_ivf, cosine_topk_lsh
from .skew import salted_join
from .splits import assign_split

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
    "audio_match_pairs",
    "spectral_landmarks",
    "cdc_chunk_neardup",
    "cdc_gear_chunks",
    "decode_features",
    "dhash_near_pairs",
    "image_dhash",
    "k_anonymize",
    "rrf_fuse",
    "histogram_drift",
    "avi_frames",
    "avi_from_frames",
    "video_match_pairs",
    "assign_split",
]
