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
from .compaction import column_stats, compact_files, compaction_plan
from .multimodal import (
    cdc_chunk_neardup,
    cdc_gear_chunks,
    decode_features,
    dhash_near_pairs,
    image_dhash,
    image_gray,
    png_from_pixels,
    png_pixels,
)
from .drift import histogram_drift
from .fusion import mmr_rerank, rrf_fuse
from .jpeg import jpeg_from_pixels, jpeg_pixels
from .mp4 import mp4_frames, mp4_from_frames
from .privacy import k_anonymize
from .scd2 import scd2_apply, scd2_build
from .text import segment_dedup, segment_dedup_incremental, segment_index
from .video import (
    avi_frames,
    avi_from_frames,
    video_match_pairs,
    video_match_pairs_tolerant,
)
from .similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_ivfpq,
    cosine_topk_lsh,
)
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
    "cosine_topk_ivfpq",
    "cosine_topk_lsh",
    "salted_join",
    "audio_match_pairs",
    "spectral_landmarks",
    "cdc_chunk_neardup",
    "cdc_gear_chunks",
    "column_stats",
    "compact_files",
    "compaction_plan",
    "decode_features",
    "dhash_near_pairs",
    "image_dhash",
    "image_gray",
    "jpeg_from_pixels",
    "mp4_frames",
    "mp4_from_frames",
    "jpeg_pixels",
    "png_from_pixels",
    "png_pixels",
    "k_anonymize",
    "mmr_rerank",
    "rrf_fuse",
    "histogram_drift",
    "scd2_apply",
    "scd2_build",
    "segment_dedup",
    "segment_dedup_incremental",
    "segment_index",
    "avi_frames",
    "avi_from_frames",
    "video_match_pairs",
    "video_match_pairs_tolerant",
    "assign_split",
]
