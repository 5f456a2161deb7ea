"""Window-coverage gate (round-13 verdict item 7): rotation debt must
not silently grow.

The driver checks only the first 50 registered queries per round
(plans/catalog.py DRIVER_WINDOW), so a newly registered query gets
driver-side correctness evidence only by rotating in. This gate fails
when a NEW registration has neither a window slot nor a documented
plan: to add a query, either (a) put it in DRIVER_WINDOW (displacing
something with a strictly-stronger-subsumer argument in catalog.py's
rotation comments), or (b) name it in a ``rotation candidates``
forecast comment there, or (c) give it a ``Displaced:`` claim naming
its in-window subsumer. The 65 queries registered before this gate
existed are grandfathered by NAME below — the frozen debt the
per-round rotations are working down; never add to this list.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

# Never-windowed set as of round 14, when this gate landed. Frozen:
# new names must document their rotation plan instead of joining it.
GRANDFATHERED = {
    "d03_fast_minhash_dedup", "d10_embedding_neardup_clustered",
    "d13_quality_aware_survivors", "d14_incremental_dedup",
    "d16_exact_dedup_e2e", "d17_edit_distance_pairs",
    "d19_entity_resolution", "e02_sliding_event_windows",
    "m02_decode_features", "m03_frame_samples", "m06_cdc_neardup",
    "m07_cdc_gear_fast", "m08_image_dhash_neardup",
    "m09_audio_landmark_match", "m10_video_neardup",
    "m11_binaryfile_image_neardup", "m12_crosscodec_video_neardup",
    "m13_crosscontainer_video_neardup", "m14_video_metadata",
    "q51_nation_market_share", "q52_important_brands",
    "q53_wealthy_inactive_customers", "q54_sole_delayed_supplier",
    "q55_priority_metrics_unpivot", "q56_lateral_top_orders",
    "s02_cosine_topk_lsh", "s04_cosine_topk_numpy",
    "s05_cosine_topk_pq", "s08_mmr_rerank", "t11_quota_sample",
    "t12_token_window_chunks", "t14_repetition_stats",
    "t15_unigram_lm_score", "t16_bm25_topk", "t17_domain_selection",
    "t18_bigram_lm_score", "t19_bpe_tokenize", "t20_quality_classifier",
    "t24_contrastive_negatives", "t26_incremental_segment_dedup",
    "t27_training_shards", "x02_approx_percentiles",
    "x04_group_regression", "x05_bloom_semi_join",
    "x08_cohort_retention", "x10_resample_ffill",
    "x11_burst_throttle_dedup", "x12_rolling_zscore_anomalies",
    "x13_event_transitions", "x14_pagerank_states",
    "x15_snapshot_diff", "x17_weighted_percentiles",
    "x18_basket_lift", "x20_ewma_smoothing", "x21_profile_constraints",
    "x22_sequence_packing", "x26_scd2_dimension",
    "x29_compaction_plan", "x30_rollup_ivm_merge",
    "x38_txlog_zorder_skipping", "x39_txlog_null_skipping",
    "x41_txlog_stream_source", "x43_txlog_metadata_count",
    "x46_txlog_table_history", "x54_txlog_shallow_clone",
}


def test_window_structurally_sound():
    import window_audit as wa

    a = wa.audit()
    assert a["problems"] == []


def test_new_registrations_document_their_rotation_plan():
    import window_audit as wa

    a = wa.audit()
    undocumented = [
        q
        for q in a["never"]
        if q not in GRANDFATHERED
        and q not in a["claims"]
        and q not in a["forecast"]
    ]
    assert undocumented == [], (
        "newly registered queries with no driver-window slot and no "
        "documented rotation plan (add to DRIVER_WINDOW, or name them "
        "in a 'rotation candidates' forecast / 'Displaced:' claim in "
        f"plans/catalog.py): {undocumented}"
    )


def test_grandfathered_debt_only_shrinks():
    """A grandfathered query that gains a driver row (or a window
    slot) must not regress to never-windowed later — and nothing can
    sneak INTO the frozen list."""
    import window_audit as wa

    a = wa.audit()
    assert set(a["never"]) - GRANDFATHERED <= (
        set(a["claims"]) | a["forecast"]
    )
    # the frozen list only shrinks in effect: names in it that are now
    # covered are simply no longer in `never` — but the list itself
    # must never grow (reviewed by eye: this assertion pins its size).
    assert len(GRANDFATHERED) == 65
