"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE COMPACT JSON line (driver contract — the driver tail-captures
the last 2000 chars of output, and round 4's full per-query dict
overflowed it, leaving the round with no machine-readable bench):
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {<ETL numbers + a dozen flagship entries>}, "sf": <sf>,
   "n_queries": N, "queries_file": "BENCH_last.json",
   "regressions": ["name:1.4x", ...]}

The FULL record — every per-query timing, candidate-pair counts for the
fuzzy-dedup probes, the streaming-throughput entry — goes to
``BENCH_last.json`` (gitignored scratch) on every run; the committed
vs-prev baseline ``BENCH_queries.json`` is rewritten only under an
explicit ``--pin`` flag, so a plain bench run leaves the working tree
clean and the pin changes only in a commit that says so.

Each query is forced end-to-end with a noop sink (full materialization,
no disk-write noise). JVM/session startup is excluded from per-query
times but the total includes everything after session-ready, matching
how a resident cluster would serve queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

from onechronos_etl_takehome_spark.plans import QUERIES
from onechronos_etl_takehome_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_revenue_orders",
    "q04_order_priority_late",
    "q05_top_orders_per_customer",
    "q06_promo_revenue",
    "q07_customer_order_distribution",
    "q08_rollup_returns",
    "q12_monthly_order_volume",
    "q13_json_props",
    "q17_shipments_within_60d",
    "q18_user_sessions",
    "q19_purchase_last_view_asof",
    "q20_cube_order_stats",
    "q25_rolling_customer_spend",
    "q31_small_quantity_revenue",
    "q32_large_volume_orders",
    "q33_user_event_extremes",
    "v01_validate_lineitem",
    "t05_token_estimates",
    "d01_dedup_exact",
    "d02_ngram_jaccard_pairs",
    # exact-Jaccard scale path: lossless prefix+positional filtering
    # (same result set as d02; 11.5k -> 27 candidate pairs at sf0.01,
    # and bounded under boilerplate skew where the full index goes
    # quadratic — test_round4_ops pins both)
    "d15_prefix_jaccard_pairs",
    "d03_minhash_dedup_pairs",
    # capped md5 form (hash-matched driver row) + the xxhash64
    # production fast path, each with its own perf record
    "d03_capped_minhash_dedup",
    "d03_fast_minhash_dedup",
    # end-to-end fuzzy dedup: capped LSH -> verify -> components ->
    # survivor set, the composition a real corpus run ships
    "d11_fuzzy_dedup_e2e",
    # lossless counterpart: prefix-filtered exact pairs -> components
    "d16_exact_dedup_e2e",
    # character-level family: lossless FastSS deletion-neighborhood
    # signature join + exact levenshtein verify. d18 (tau=2 PassJoin)
    # is deliberately NOT benched at sf0.1: the zero-padded customer
    # names put ~13% of ALL pairs within lev-2 (sf0.01 candidate
    # observation: 4.5M candidates -> 204k true pairs), so any exact
    # tau=2 join is result-quadratic on this corpus — a data
    # pathology, not an operator gap; d18 stays hash-matched vs brute
    # force at the driver's sf0.01 and its candidate hook reports
    # whenever it is benched.
    "d17_edit_distance_pairs",
    # entity-resolution composition: blocked PassJoin -> components ->
    # survivor per entity
    "d19_entity_resolution",
    "d06_embedding_neardup_pairs",
    "d09_decontaminate",
    "d10_embedding_neardup_clustered",
    "d12_duplicate_ngram_spans",
    "s01_cosine_topk",
    "s02_cosine_topk_lsh",
    "s03_cosine_topk_ivf",
    "s04_cosine_topk_numpy",
    "s05_cosine_topk_pq",
    # embedding compression: int8 quantization, zero-shuffle codegen
    "s06_quantize_embeddings",
    # hybrid retrieval: dense top-50 + BM25 top-50 fused by integer
    # RRF — the fusion itself touches only shortlist-sized frames
    "s07_hybrid_rrf",
    # native WITH RECURSIVE bounded-hop BFS (iterative frontier joins)
    "q58_recursive_reachability",
    "t01_text_quality",
    "t15_unigram_lm_score",
    "t16_bm25_topk",
    "t17_domain_selection",
    "t13_gopher_quality",
    "m04_binary_chunk_neardup",
    # content-defined chunking (oracle-exact md5 form; interpreted
    # HOF lambdas are the honest cost of the portable per-byte
    # boundary hash — ~0.4 s at sf0.1 once the corpus is spread
    # across cores). m06's CDC near-dup join rides m04's bench shape
    # and stays out of the headline for wall-time budget.
    "m05_cdc_chunks",
    # gear-hash production CDC (vectorized rolling hash + min/max
    # bounds) — the fast-path/oracle pairing, same as d03_fast vs d03
    "m07_cdc_gear_fast",
    # perceptual image near-dup: real BMP decode -> dHash -> banded
    # Hamming join
    "m08_image_dhash_neardup",
    # audio fingerprint match: WAV decode -> STFT landmarks -> join
    "m09_audio_landmark_match",
    # video near-dup: AVI decode -> per-frame dHash -> containment
    "m10_video_neardup",
    "x03_heavy_hitters",
    "x06_salted_skew_join",
    "x07_window_funnel",
    "x10_resample_ffill",
    "x11_burst_throttle_dedup",
    "x12_rolling_zscore_anomalies",
    "x13_event_transitions",
    "x14_pagerank_states",
    "x15_snapshot_diff",
    "x16_weighted_sample",
    "x17_weighted_percentiles",
    # round-4g batch: graph census (oriented wedge join), binned
    # interval-overlap join, one-pass profiling, EWMA, bigram LM
    "x19_triangle_count",
    "q57_concurrent_sessions",
    "x21_profile_constraints",
    "x20_ewma_smoothing",
    "x22_sequence_packing",
    "t18_bigram_lm_score",
    # trained BPE: driver-sample merge learning + Arrow encode pass
    "t19_bpe_tokenize",
    # model-assisted quality filter: sample-trained LR, JVM scoring
    "t20_quality_classifier",
    # round-5 batch: z-order layout clustering, leakage-safe splits,
    # budgeted per-domain token mixing (grouped two-pass prefix sum)
    "x23_zorder_layout",
    # bucketed co-located join (rep 1 pays the one-time layout write;
    # the recorded min is the steady-state exchange-free join)
    "x24_bucketed_join",
    "t21_leakage_safe_split",
    "t22_corpus_mixing",
    "t23_k_anonymize",
    # windowed histogram drift (log-free TVD, integer L1 numerator)
    "x25_distribution_drift",
    # round-6 batch: SCD2 dimension versioning (build / incremental
    # apply vs full-rebuild oracle / point-in-time lookup) and
    # hash-ring contrastive negative sampling
    "x26_scd2_dimension",
    "x27_scd2_incremental",
    "x28_scd2_pointintime",
    "t24_contrastive_negatives",
    # round-6b batch: lakehouse maintenance (compaction planning, CBO
    # column stats, incremental aggregate maintenance) + corpus
    # hygiene (C4-style segment dedup) + MMR diversity re-rank
    "x29_compaction_plan",
    "x30_rollup_ivm_merge",
    "x31_column_stats",
    "t25_segment_dedup",
    "t26_incremental_segment_dedup",
    "s08_mmr_rerank",
    # IVFADC: IVF routing × PQ codes × exact rerank — the production
    # billion-vector composition of s03 and s05
    "s09_cosine_topk_ivfpq",
    # partition-pruned scan over the Hive-partitioned layout (rep 1
    # pays the one-time partitionBy write; the min is the pruned scan)
    "x32_partition_pruned_scan",
    # mergeSchema read over a two-generation (column-added) layout
    "x33_schema_evolution_read",
    # cross-codec video near-dup: MJPEG decode + banded-Hamming frames
    "m12_crosscodec_video_neardup",
    # round-7 batch: cross-container video near-dup from disk (one
    # binaryFile scan over mixed .avi/.mp4 — rep 1 pays the one-time
    # corpus write; the min is the scan+decode+join) and the ACID
    # table lifecycle (create/append/CoW-delete + 3 time-travel reads
    # per rep — the whole commit protocol is IN the measured wall)
    "m13_crosscontainer_video_neardup",
    "x34_txlog_time_travel",
    # file-pruned MERGE INTO on the ACID table (create + merge + read
    # per rep — the provenance prune and CoW rewrite are IN the wall)
    "x35_txlog_merge",
    # manifest-stats data skipping (range-clustered write + pruned
    # read per rep; 29 of 32 files skipped at sf0.01)
    "x36_txlog_data_skipping",
    # change data feed: create+append+CoW-delete, then row-level
    # changes derived from the log's file diff (multiset exceptAll)
    "x37_txlog_change_feed",
    # OPTIMIZE ZORDER as a log transaction + two-dimensional
    # manifest-stats pruning from the one Morton layout
    "x38_txlog_zorder_skipping",
    # round-9 batch: the rest of the txlog family gets perf records
    # (round-8 verdict: three operators shipped with no bench entry).
    # x39: null-count skipping via the single-predicate where= form;
    # x40: CDF consumer (create+append+CoW-delete+feed apply per rep);
    # x41: streaming-source drain (stream start/stop IS in the wall);
    # x42: batch format reader at 7 snapshots incl. timestampAsOf;
    # x43: metadata-only COUNT(*) across a 3-commit lifecycle
    "x39_txlog_null_skipping",
    "x40_txlog_incremental_consumer",
    "x41_txlog_stream_source",
    "x42_txlog_batch_reader",
    "x43_txlog_metadata_count",
    # x44: format-reader filter pushdown (pushFilters → manifest-stats
    # file pruning + the poisoned-file raise contract)
    "x44_txlog_filter_pushdown",
    # x45: format writer (executor Arrow writes + one-manifest commits:
    # append, schema-evolving append, atomic overwrite, time travel)
    "x45_txlog_format_writer",
    # x46: DESCRIBE HISTORY from manifests (per-commit op + metrics)
    "x46_txlog_table_history",
    # x47: CHECK constraints (declare-validate-enforce on every
    # data-adding commit path; violating writes commit nothing)
    "x47_txlog_check_constraints",
    # x48: streaming change data feed (create+append+CoW-delete+merge,
    # then an availableNow drain of readChangeFeed — stream start/stop
    # and the per-commit multiset diffs are IN the measured wall)
    "x48_txlog_cdf_stream",
    # x49: column mapping (create+rename+append+drop, three read legs
    # incl. two time travels — all metadata-only commits in the wall)
    "x49_txlog_column_mapping",
    # x50: partition columns (partitioned create + append + CoW delete,
    # then a partition+stats-pruned read and a time travel in the wall)
    "x50_txlog_partitioned",
    # x51: deletion vectors (clustered create + two stacked DV deletes,
    # then masked/pruned/time-travel read legs in the wall)
    "x51_txlog_deletion_vectors",
    # x52: UPDATE (CoW reprice + DV-mode zeroing, three read legs)
    "x52_txlog_update",
    # x53: RESTORE (create+append+delete, then the metadata-only reset
    # with its distributed change-file diff and a CDF leg in the wall)
    "x53_txlog_restore",
    # x54: SHALLOW CLONE (DV'd source, zero-copy clone, divergent DML,
    # three read legs incl. the clone's v0 time travel in the wall)
    "x54_txlog_shallow_clone",
    # x55: conditional MERGE INTO (four-clause CDC apply — delete /
    # conditional update / conditional insert / by-source sweep — with
    # the commit's CDF read leg in the wall)
    "x55_txlog_merge_into",
    # x56: legacy CDF backfill (lifecycle + stamp strip + distributed
    # backfill + the full feed read — GENERATE's whole story in the wall)
    "x56_txlog_cdf_backfill",
    # t27: deterministic training shards (hash exchange + per-shard
    # window checksum — the no-total-sort shuffle's whole manifest)
    "t27_training_shards",
    # m14: video stream metadata (container/SPS walks, no pixel decode)
    "m14_video_metadata",
    # m15: AVC I_PCM ingest near-dup (real H.264 write+decode leg)
    "m15_avc_ipcm_video_neardup",
    # m16: FLAC ingest near-dup (compressed-audio decode leg: every
    # re-captured twin is a real FLAC stream the landmark join must
    # decode — LPC/fixed subframes, Rice residuals, CRC+MD5 verify)
    "m16_flac_audio_neardup",
    # m17: audio stream metadata (RIFF/fLaC/MPEG/ADTS/Ogg headers only)
    "m17_audio_stream_metadata",
    # t29: epoch reshuffle (layout write + two epoch replays — the
    # zero-rewrite per-epoch order change, whole story in the wall)
    "t29_epoch_reshuffle",
    # m18: voice-activity segmentation (decode + framed RMS + runs)
    "m18_voice_activity_segments",
    # m19: transcript alignment (SRT parse + VAD + interval join)
    "m19_transcript_alignment",
    # t31: HTML main-content extraction (parser walk + density gate)
    "t31_html_main_text",
    # m20: GIF-ingest near-dup (LZW decode leg of the tolerant join)
    "m20_gif_video_neardup",
    # m21: image stream metadata (header-only routing pass, 5 modes)
    "m21_image_stream_metadata",
    "e01_hourly_event_windows",
    "e02_sliding_event_windows",
]

# Candidate-bound fuzzy joins: wall time follows the candidate-pair
# count, so the bench records the count (an in-job Observation at the
# operator's candidate stage — observability.py) at 1× and 10×. A
# candidate ratio well above the corpus ratio is a scale bug even
# while wall time still looks linear.
CANDIDATE_QUERIES = {
    "d03_fast_minhash_dedup",
    "d03_capped_minhash_dedup",
    "d15_prefix_jaccard_pairs",
    "d17_edit_distance_pairs",
    "d18_passjoin_pairs",
    # media family (round 6): banded-Hamming / inverted-index pairs
    "m08_image_dhash_neardup",
    "m10_video_neardup",
    # round 7: the tolerant cross-codec frame join gets its own count
    "m12_crosscodec_video_neardup",
    # round 14: the AVC I_PCM and GIF legs ride the same tolerant join
    "m15_avc_ipcm_video_neardup",
    "m20_gif_video_neardup",
}

# Fuzzy-dedup / ANN paths probed on a 10× corpus (see
# _scaled_llm_inputs): caps and bucketing should keep these ~linear in
# corpus size; a superlinear jump here is a scale bug, not noise.
SCALE_PROBES = [
    "d03_fast_minhash_dedup",
    "d15_prefix_jaccard_pairs",
    "d12_duplicate_ngram_spans",
    "d10_embedding_neardup_clustered",
    "s02_cosine_topk_lsh",
    "s01_cosine_topk",
    "s04_cosine_topk_numpy",
    "s05_cosine_topk_pq",
    "s06_quantize_embeddings",
    "t19_bpe_tokenize",
    # hybrid fusion: the retrievers scale, the fuse stays shortlist-sized
    "s07_hybrid_rrf",
    # training shards: one hash exchange + N shard-local window sorts —
    # ~linear in corpus rows at fixed shard count (the no-total-sort
    # claim, measured)
    "t27_training_shards",
    # media family (round 6): decode-bound (m08, Arrow BMP decode +
    # banded Hamming join) and join-bound (m10, AVI decode feeding the
    # inverted-index containment join) regimes, each with candidate
    # counts. m10's 10× wall includes the distributed python fixture
    # synthesis (5000 AVIs × 8 frames at sf0.1) — the per-round ratio
    # plus its candidate count is the scaling evidence; m09 shares
    # m08's decode regime and m10's join machinery, so it stays 1×.
    "m08_image_dhash_neardup",
    "m10_video_neardup",
    # round 7: m12 — the most expensive 1× catalog entry (16 python
    # stages of pure-numpy JPEG entropy decode per MJPEG frame) gets
    # scaling evidence: decode is embarrassingly parallel across
    # Arrow batches, so wall should grow ~linearly and the tolerant
    # banded-Hamming candidate count rides the same per-copy scene
    # disjointness as m08/m10 (plus the same documented cross-copy
    # 8-bit-chunk birthday term — see the m08 decomposition below).
    "m12_crosscodec_video_neardup",
    # segment dedup: per-copy word tags keep copies' segment universes
    # disjoint, so segments (and wall) should scale exactly ×copies
    "t25_segment_dedup",
]


def _scaled_etl_inputs(copies: int) -> str:
    """Materialize an N× copy of the reference CSVs under /tmp with
    per-copy trade-id prefixes (keeps dedup and join selectivity)."""
    import csv
    import os

    out = f"/tmp/spark_graft_etl_{copies}x"
    done = os.path.join(out, ".done")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    ref = "/root/reference"
    for fname, id_cols in [
        ("trades.csv", [0]),  # trade_id
        ("counterparty_fills.csv", [0, 1]),  # external_ref_id, our_trade_id
    ]:
        # csv module, not line.split(','): a quoted field containing a
        # comma must not shift the id-column indices.
        with open(os.path.join(ref, fname), newline="") as f:
            reader = csv.reader(f)
            header = next(reader)
            rows = list(reader)
        with open(os.path.join(out, fname), "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(header)
            for i in range(copies):
                prefix = f"C{i:03d}"
                for parts in rows:
                    scaled = list(parts)
                    for ci in id_cols:
                        scaled[ci] = prefix + scaled[ci]
                    writer.writerow(scaled)
    with open(os.path.join(ref, "symbols_reference.csv")) as f:
        sym = f.read()
    with open(os.path.join(out, "symbols_reference.csv"), "w") as f:
        f.write(sym)
    with open(done, "w") as f:
        f.write("ok")
    return out


def _scaled_llm_inputs(
    copies: int, sf_dir: str, tables: tuple[str, ...] = ("documents", "embeddings")
) -> str:
    """Materialize a ``copies``× documents/embeddings corpus that
    preserves the 1× near-dup structure, so operator time should scale
    ~linearly with corpus size:

    - documents: every word gets a per-copy tag (bijection of the
      shingle universe per copy) — within-copy Jaccard relations are
      identical to 1×, cross-copy shingle sets are disjoint, and total
      shingle volume scales exactly ×copies.
    - embeddings: each copy is rotated by a seeded random orthogonal
      matrix (copy 0 = identity, keeping the vec_id<10 query vectors
      byte-identical) — rotations preserve within-copy cosines exactly
      while cross-copy cosines are near-orthogonal noise in 64-d.

    Regenerated whenever the source parquet is newer than the marker
    (testdata is rebuilt between rounds).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    # source SF is part of the cache key — a smoke run at sf0.01 must
    # not leave its (10× smaller) corpus behind for the sf0.1 run.
    # v2: customer scaling switched from tag-prefix to rotation cipher
    # (stale v1 caches must not survive the format change).
    # v3: cipher multiplier 7 → 5 (7 divides the 63-char alphabet, so
    # copy 9's shift was 63 ≡ 0 — byte-identical to copy 0,
    # reintroducing the cross-copy exact-dup pairs the cipher exists
    # to eliminate; 5 is coprime with 63, so shifts are distinct and
    # nonzero mod 63 for every copy index < 63).
    suffix = "" if len(tables) == 2 else "_" + "-".join(sorted(tables))
    out = (
        f"/tmp/spark_graft_llm_{copies}x_"
        f"{os.path.basename(sf_dir.rstrip('/'))}{suffix}_v3"
    )
    done = os.path.join(out, ".done")
    doc_src = os.path.join(sf_dir, "documents.parquet")
    emb_src = os.path.join(sf_dir, "embeddings.parquet")
    cust_src = os.path.join(sf_dir, "customer.parquet")
    # staleness key: only the sources this cache variant actually
    # copies — touching customer.parquet must not invalidate the
    # expensive docs/embeddings rebuilds (and absent tables must not
    # be stat'ed at all).
    _srcs = {"documents": doc_src, "embeddings": emb_src, "customer": cust_src}
    src_mtime = max(os.path.getmtime(_srcs[t]) for t in tables)
    if os.path.exists(done) and os.path.getmtime(done) > src_mtime:
        return out
    os.makedirs(out, exist_ok=True)

    OFF = 10_000_000
    if "documents" in tables:
        doc_schema = pq.read_schema(doc_src)
        docs = pq.read_table(doc_src).to_pandas()
        d_parts = []
        for i in range(copies):
            d = docs.copy()
            d["doc_id"] = docs["doc_id"] + i * OFF
            tag = f"c{i}_"
            d["text"] = [
                " ".join(tag + w for w in t.split(" ")) if isinstance(t, str) else t
                for t in docs["text"]
            ]
            d["n_chars"] = [len(t) if isinstance(t, str) else 0 for t in d["text"]]
            d_parts.append(d)
        pq.write_table(
            pa.Table.from_pandas(
                pd.concat(d_parts, ignore_index=True), schema=doc_schema,
                preserve_index=False,
            ),
            os.path.join(out, "documents.parquet"),
        )

    if "embeddings" in tables:
        emb_schema = pq.read_schema(emb_src)
        emb = pq.read_table(emb_src).to_pandas()
        rng = np.random.RandomState(4242)
        emb_mat = np.array(list(emb["embedding"]), dtype=np.float64)
        dim = emb_mat.shape[1]
        e_parts = []
        for i in range(copies):
            e = emb.copy()
            e["vec_id"] = emb["vec_id"] + i * OFF
            if i > 0:
                q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
                rotated = emb_mat @ q.T
                e["embedding"] = [row.astype(np.float32) for row in rotated]
            e_parts.append(e)
        pq.write_table(
            pa.Table.from_pandas(
                pd.concat(e_parts, ignore_index=True), schema=emb_schema,
                preserve_index=False,
            ),
            os.path.join(out, "embeddings.parquet"),
        )
    if "customer" in tables:
        # Per-copy alphabet-rotation cipher over every name: a
        # character bijection preserves within-copy edit distances
        # EXACTLY (the 1× near-dup pair structure replicates ×copies)
        # while cross-copy strings share no substring — critical for
        # the PassJoin probe (d18), whose segment signatures are
        # substrings: the previous 3-letter-tag prefix left segment
        # boundaries aligned and segment CONTENT identical across
        # copies, so candidates grew ×copies² (measured 52.8× at 10×)
        # even though the tags kept every cross-copy pair out of the
        # verified result. Rotations leave no fixed points (all names
        # share the "Customer#" prefix, which maps to copies²-distinct
        # strings), so cross-copy candidates vanish for d17 and d18.
        import string

        alpha = string.ascii_letters + string.digits + "#"

        def _cipher(name: str, shift: int) -> str:
            if shift == 0:
                return name
            return "".join(
                alpha[(alpha.index(ch) + shift) % len(alpha)]
                if ch in alpha
                else ch
                for ch in name
            )

        cust_schema = pq.read_schema(cust_src)
        cust = pq.read_table(cust_src).to_pandas()
        c_parts = []
        # shift multiplier must be coprime with len(alpha)=63 so every
        # copy's shift is distinct AND nonzero mod 63 (7 wasn't: copy 9
        # collapsed to shift 0 = an exact duplicate of copy 0).
        assert copies < len(alpha)
        for i in range(copies):
            shift = (i * 5) % len(alpha)
            assert i == 0 or shift != 0
            c = cust.copy()
            c["c_custkey"] = cust["c_custkey"] + i * OFF
            c["c_name"] = [
                _cipher(n, shift) if isinstance(n, str) else n
                for n in cust["c_name"]
            ]
            c_parts.append(c)
        pq.write_table(
            pa.Table.from_pandas(
                pd.concat(c_parts, ignore_index=True), schema=cust_schema,
                preserve_index=False,
            ),
            os.path.join(out, "customer.parquet"),
        )
    with open(done, "w") as f:
        f.write("ok")
    return out


def _m08_candidate_split(spark, scaled_dir: str) -> tuple[int, int]:
    """(within_copy, cross_copy) candidate counts of m08's banded
    dHash join over the 10× image fixture. Copy identity is the bench
    fixture's 10M doc_id block (``_scaled_llm_inputs`` OFF), so the
    decomposition lives here, not in the operator: within-copy pairs
    replicate the 1× structure exactly ×copies (linearity pin), the
    cross-copy remainder is the banded-blocking birthday term."""
    from pyspark.sql import functions as F

    from onechronos_etl_takehome_spark.operators import multimodal as mm

    docs = spark.read.parquet(os.path.join(scaled_dir, "documents.parquet"))
    hashed = mm.image_dhash(mm.demo_noisy_image_payloads(docs, "doc_id"))
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftrightunsigned("dhash", 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("cv"),
            )
            for i in range(4)
        ]
    )
    sig = hashed.select("id", F.explode(chunks).alias("c")).select(
        "id", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    a, b = sig.alias("a"), sig.alias("b")
    row = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.floor(F.col("id_a") / 10_000_000)
                    != F.floor(F.col("id_b") / 10_000_000)
                ).cast("long")
            ).alias("cross"),
        )
        .collect()[0]
    )
    return int(row["n"] - row["cross"]), int(row["cross"])


def _m12_candidate_split(
    spark, scaled_dir: str, arity: int = 2
) -> tuple[int, int]:
    """(within_copy, cross_copy) candidate counts of m12's
    composite banded-Hamming join over the 10× video fixture — the
    m08 decomposition applied to the video pipeline (same 10M-doc_id
    copy blocks, and ``demo_crosscodec_video_payloads`` passes ids
    through unchanged). Candidates are counted at the operator's own
    granularity: one row per (video pair, frame-hash pair) surviving
    the composite-key join, pre-popcount — exactly what
    video_tolerant.candidates observes. ``arity`` mirrors the
    operator's composite_arity: 2-chunk 16-bit keys (the default
    below the corpus crossover) or 3-chunk 24-bit keys (the
    birthday-term lever whose measured collapse the round-14 probe
    pins per-round)."""
    from pyspark.sql import functions as F

    from onechronos_etl_takehome_spark.operators import video as vid

    docs = spark.read.parquet(os.path.join(scaled_dir, "documents.parquet"))
    fp = vid.video_fingerprints(
        vid.demo_crosscodec_video_payloads(docs, "doc_id")
    )
    bands, width = 8, 8
    mask = (1 << width) - 1

    def _chunk(i):
        return F.shiftrightunsigned("chash", width * i).bitwiseAND(
            F.lit(mask)
        )

    if arity == 3:
        chunks = F.array(
            *[
                F.struct(
                    F.lit((i * bands + j) * bands + k).alias("ci"),
                    (
                        (_chunk(i) * F.lit(1 << width) + _chunk(j))
                        * F.lit(1 << width)
                        + _chunk(k)
                    ).alias("cv"),
                )
                for i in range(bands)
                for j in range(i + 1, bands)
                for k in range(j + 1, bands)
            ]
        )
    else:
        chunks = F.array(
            *[
                F.struct(
                    F.lit(i * bands + j).alias("ci"),
                    (_chunk(i) * F.lit(1 << width) + _chunk(j)).alias("cv"),
                )
                for i in range(bands)
                for j in range(i + 1, bands)
            ]
        )
    sig = fp.select("id", "chash", F.explode(chunks).alias("c")).select(
        "id", "chash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    a, b = sig.alias("a"), sig.alias("b")
    row = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.chash").alias("_ha"),
            F.col("b.chash").alias("_hb"),
        )
        .dropDuplicates(["id_a", "id_b", "_ha", "_hb"])
        .select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.floor(F.col("id_a") / 10_000_000)
                    != F.floor(F.col("id_b") / 10_000_000)
                ).cast("long")
            ).alias("cross"),
        )
        .collect()[0]
    )
    return int(row["n"] - row["cross"]), int(row["cross"])


# Exception types whose tracebacks are pure worker-daemon TEARDOWN
# noise (a python worker's socket closing under it as the JVM reaps the
# daemon): harmless (rc stays 0, results are already materialized) but
# five of them opened BENCH_r11's 2000-char tail capture and buried the
# lines that matter (round-11 verdict, What's wrong #1).
_DROP_EXCS = ("BrokenPipeError", "ConnectionResetError", "EOFError")
# chained-traceback separators: NOT block terminators
_CHAIN_LINES = ("During handling of the above", "The above exception")
# a block only qualifies as teardown noise if its frames actually run
# in the python worker daemon (round-12 advice: a GENUINE driver-side
# EOFError — e.g. py4j dying mid-query — must reach the tail capture;
# matching the terminal exception type alone also ate those)
_DAEMON_FRAMES = ("pyspark/daemon.py", "pyspark/worker.py")


def _filter_stderr_lines(lines, emit) -> None:
    """The filter's pure core (unit-tested in tests/test_round13_ops.py):
    stream ``lines``, calling ``emit(line)`` for everything that
    should reach the real stderr. Traceback GROUPS — a block plus any
    chained continuations, buffered whole so a dropped group's
    'During handling' separators never leak through orphaned — are
    dropped only when they BOTH terminate in a teardown exception
    type AND carry a pyspark daemon/worker frame; a driver-side
    EOFError (round-12 advice: e.g. py4j dying mid-query) keeps its
    evidence."""
    buf: list[str] = []  # the pending traceback GROUP
    in_tb = False  # inside a block (frames) vs after its terminal
    terminal = ""  # last terminal exception line seen
    chained = False  # chain separator seen since the last terminal

    def _flush() -> None:
        nonlocal in_tb, terminal, chained
        if buf:
            noise = terminal.startswith(_DROP_EXCS) and any(
                m in ln for ln in buf for m in _DAEMON_FRAMES
            )
            if not noise:
                for ln in buf:
                    emit(ln)
            buf.clear()
        in_tb, terminal, chained = False, "", False

    for line in lines:
        if in_tb:
            buf.append(line)
            if line[:1] not in (" ", "\t") and not line.startswith(
                _CHAIN_LINES
            ):
                in_tb = False  # block terminal
                terminal = line
                chained = False  # each continuation needs a separator
        elif buf:
            # between a terminal and a possible chained continuation:
            # blank lines and chain separators stay pending; a new
            # Traceback joins the group ONLY after a separator (two
            # back-to-back INDEPENDENT tracebacks judge separately)
            if line.startswith("Traceback (most recent call last):"):
                if not chained:
                    _flush()
                buf.append(line)
                in_tb = True
            elif line.startswith(_CHAIN_LINES):
                buf.append(line)
                chained = True
            elif not line.strip():
                buf.append(line)
            else:
                _flush()
                emit(line)
        elif line.startswith("Traceback (most recent call last):"):
            buf.append(line)
            in_tb = True
        else:
            emit(line)
    if in_tb and buf:  # EOF mid-block: flush, never swallow silently
        for ln in buf:
            emit(ln)
    else:
        _flush()


def _install_stderr_filter() -> None:
    """Drop pyspark-daemon teardown tracebacks from fd 2. The JVM and
    its python worker daemons INHERIT the process's stderr fd, so a
    sys.stderr wrapper never sees their output — the filter has to sit
    at the fd level: fd 2 is re-pointed at a pipe, a pump thread
    forwards everything to the real stderr through
    ``_filter_stderr_lines``. Our own summary prints re-point
    sys.stderr at the saved real fd and skip the filter entirely (no
    risk of eating a scale10x/REGRESSION line). Best-effort by
    design: interleaved writes from concurrent daemons can garble a
    block, which then simply passes through."""
    import threading

    real = os.fdopen(os.dup(2), "w", buffering=1)
    r_fd, w_fd = os.pipe()
    os.dup2(w_fd, 2)
    os.close(w_fd)
    sys.stderr = real  # our prints bypass the filter

    def _pump() -> None:
        with os.fdopen(r_fd, "r", errors="replace") as src:
            _filter_stderr_lines(src, real.write)

    threading.Thread(target=_pump, daemon=True, name="stderr-filter").start()


def main() -> None:
    _install_stderr_filter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # No console progress bars: the driver tail-captures our output and
    # \r stage spam crowds out the lines that matter (the scale10x /
    # REGRESSION report and the final JSON).
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # FATAL, not ERROR: several txlog witnesses carry EXPECTED-raise
    # legs (x44's poisoned full-scan, x42's vacuumed-version read) that
    # the query code catches, but log4j still printed the Java stack
    # trace at ERROR — and that spam dominated the driver's 2000-char
    # tail capture, burying the flag/ratio summary (round-9 verdict).
    # Real bench failures are unaffected: they propagate as Python
    # exceptions with full tracebacks regardless of the JVM log level.
    spark.sparkContext.setLogLevel("FATAL")
    import logging

    # same reason: py4j's python-side logger re-prints captured Java
    # exceptions from expected-raise legs
    logging.getLogger("py4j").setLevel(logging.CRITICAL)

    # Untimed warmup: JVM/codegen spin-up shouldn't be charged to the
    # first query (a resident cluster serves queries warm).
    from onechronos_etl_takehome_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").count()

    candidate_counts: dict[str, int] = {}

    def _bench_query(name: str, data_dir: str, label: str | None = None) -> float:
        # Rep policy (rounds 3-5 of noise chasing): the first execution
        # carries one-time JIT/codegen cost (interleaved A/B on s03:
        # rep0 6.1 s, rep1 1.9 s, rep2 1.7 s). Round-5 calibration:
        # four otherwise-idle sf0.1 runs with no code change each
        # flagged ONE different 2-4 s entry at 1.3-1.4x under min-of-3
        # (d10_10x, s02_10x, d03_fast, s05_100x — every flag vanished
        # on the next run), i.e. this box's cross-run noise spans a
        # full min-of-3 window at that duration. Everything under 8 s
        # now takes min-of-5; >= 8 s probes stop at min-of-2 (their
        # jitter is far below the flag threshold).
        from onechronos_etl_takehome_spark.observability import (
            capture_counts,
            drain,
        )

        import contextlib

        label = label or name
        capture = name in CANDIDATE_QUERIES
        best = float("inf")
        for rep in range(5):
            # hooks stay inactive (identity, plan byte-identical) for
            # everything outside CANDIDATE_QUERIES — compositions like
            # d11/d16/d19 must not grow unread CollectMetrics nodes
            ctx = capture_counts() if capture else contextlib.nullcontext({})
            with ctx as sink:
                t0 = time.perf_counter()
                df = QUERIES[name](spark, data_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                if capture and sink:
                    candidate_counts[label] = sum(drain(sink).values())
            if rep >= 1 and best >= 8.0:
                break
        run_spec[label] = (name, data_dir)
        return round(best, 3)

    run_spec: dict[str, tuple[str, str]] = {}
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = _bench_query(name, sf_dir)

    # 10× corpus probes: same operators, structure-preserving 10×
    # documents/embeddings (see _scaled_llm_inputs). Ratios reported on
    # stderr; ~10× time is the expectation for linear operators.
    llm10 = _scaled_llm_inputs(10, sf_dir)
    for name in SCALE_PROBES:
        timings[f"{name}_10x"] = _bench_query(name, llm10, label=f"{name}_10x")
    # d17/d18's input is the customer table — its own structure-
    # preserving 10× copy (tagged names keep cross-copy pairs
    # impossible).
    cust10 = _scaled_llm_inputs(10, sf_dir, tables=("customer",))
    for name in ["d17_edit_distance_pairs"]:
        timings[f"{name}_10x"] = _bench_query(name, cust10, label=f"{name}_10x")
    for name in SCALE_PROBES + ["d17_edit_distance_pairs"]:
        if timings.get(name, 0) > 0:
            ratio = round(timings[f"{name}_10x"] / timings[name], 1)
            print(f"scale10x {name}: {ratio}x its 1x time", file=sys.stderr)

    # m08's 10× candidate TOTAL grows superlinearly (round-6 flag:
    # 286 → 5,440 = 19×) while its verified pair count stays ~linear —
    # adjudicated in round 7: the excess is entirely CROSS-COPY
    # collisions between unrelated scenes (the C(N,2)/2^16-per-band
    # birthday term of 16-bit banded blocking, amplified by
    # non-uniform perceptual-hash bits), NOT fixture contamination.
    # Decompose and pin every round: within-copy candidates (ids in
    # the same 10M block) must stay ~linear vs the 1× count; the
    # cross-copy remainder is the documented birthday term whose
    # 100-TB levers are the posting cap / wider bands (operator
    # docstring). Round-7 measurement: within 2,842 = 9.9×, cross
    # 2,598, verified 245 → 2,410 = 9.8×.
    m08_split = _m08_candidate_split(spark, llm10)
    candidate_counts["m08_image_dhash_neardup_10x_within_copy"] = m08_split[0]
    candidate_counts["m08_image_dhash_neardup_10x_cross_copy"] = m08_split[1]
    if (
        timings.get("m08_image_dhash_neardup", 0) > 0
        and candidate_counts.get("m08_image_dhash_neardup", 0) > 0
    ):
        w_ratio = m08_split[0] / candidate_counts["m08_image_dhash_neardup"]
        verdict = "linear OK" if w_ratio <= 13.0 else "NONLINEAR — scale bug"
        print(
            f"m08 10x candidates: within-copy {m08_split[0]} "
            f"({w_ratio:.1f}x of 1x; {verdict}), cross-copy birthday "
            f"term {m08_split[1]}",
            file=sys.stderr,
        )

    # m12's 10× total grows ~89× (round-7: 12,024 → 1,073,860) for the
    # same reason: the within-copy part replicates the 1× structure
    # linearly; the remainder is the C(F,2)·28/2^16 birthday term of
    # 28 sixteen-bit composite keys over all corpus frames (README
    # bench notes carry the crossover math and the two levers:
    # 3-chunk 24-bit keys or a default max_chunk_df).
    m12_split = _m12_candidate_split(spark, llm10)
    candidate_counts["m12_crosscodec_video_neardup_10x_within_copy"] = (
        m12_split[0]
    )
    candidate_counts["m12_crosscodec_video_neardup_10x_cross_copy"] = (
        m12_split[1]
    )
    if candidate_counts.get("m12_crosscodec_video_neardup", 0) > 0:
        w_ratio = (
            m12_split[0] / candidate_counts["m12_crosscodec_video_neardup"]
        )
        verdict = "linear OK" if w_ratio <= 13.0 else "NONLINEAR — scale bug"
        print(
            f"m12 10x candidates: within-copy {m12_split[0]} "
            f"({w_ratio:.1f}x of 1x; {verdict}), cross-copy birthday "
            f"term {m12_split[1]}",
            file=sys.stderr,
        )

    # Round 14 (verdict item 4): exercise the ARITY-3 leg on the
    # bench. The 10× corpus (5,000 videos) sits below the ~6,200
    # crossover, so the self-selection correctly stays at 2 — which
    # means the documented 67× cross-candidate collapse of 3-chunk
    # 24-bit keys was never measured per-round. Force
    # composite_arity=3 over the same fixture: a timed end-to-end
    # entry plus the candidate decomposition, so the claim stays
    # pinned against drift.
    def _m12_arity3(spark, data_dir):
        from pyspark.sql import functions as F

        from onechronos_etl_takehome_spark.operators import video as vid

        docs = spark.read.parquet(
            os.path.join(data_dir, "documents.parquet")
        )
        payloads = vid.demo_crosscodec_video_payloads(docs, "doc_id")
        return vid.video_match_pairs_tolerant(
            payloads, min_containment=0.6, composite_arity=3
        )

    t0 = time.perf_counter()
    _m12_arity3(spark, llm10).write.format("noop").mode(
        "overwrite"
    ).save()
    timings["m12_crosscodec_video_neardup_10x_arity3"] = round(
        time.perf_counter() - t0, 3
    )
    m12_a3 = _m12_candidate_split(spark, llm10, arity=3)
    candidate_counts["m12_crosscodec_video_neardup_10x_arity3_within_copy"] = (
        m12_a3[0]
    )
    candidate_counts["m12_crosscodec_video_neardup_10x_arity3_cross_copy"] = (
        m12_a3[1]
    )
    collapse = m12_split[1] / max(m12_a3[1], 1)
    print(
        f"m12 arity3: cross-copy candidates {m12_split[1]} -> "
        f"{m12_a3[1]} ({collapse:.0f}x collapse; documented lever "
        f"claims ~67x), within-copy {m12_split[0]} -> {m12_a3[0]}",
        file=sys.stderr,
    )

    # 100× embeddings (500k × 64): the GEMM-vs-interpreted crossover.
    # At sf0.1's 5k vectors every similarity query is python-worker /
    # scheduling overhead and the interpreted fold (s01) ties the BLAS
    # path (s04); at 500k rows per-row cost dominates and the batch
    # paths must pull ahead — this records that crossover every round.
    emb100 = _scaled_llm_inputs(100, sf_dir, tables=("embeddings",))
    for name in ["s01_cosine_topk", "s04_cosine_topk_numpy", "s05_cosine_topk_pq"]:
        timings[f"{name}_100x"] = _bench_query(
            name, emb100, label=f"{name}_100x"
        )
    print(
        "crossover100x interpreted s01 "
        f"{timings['s01_cosine_topk_100x']}s vs BLAS s04 "
        f"{timings['s04_cosine_topk_numpy_100x']}s vs PQ s05 "
        f"{timings['s05_cosine_topk_pq_100x']}s",
        file=sys.stderr,
    )

    # The reference's own workload: its trade-reconciliation pipeline
    # end-to-end on its committed CSVs (BASELINE.md: 114.3 s incl. JVM
    # start; our session is warm, its 14-action lineage re-execution
    # is the dominant cost either way).
    import tempfile

    from onechronos_etl_takehome_spark.pipeline import ReconciliationPipeline

    best = float("inf")
    for _ in range(2):  # min-of-2, same warm-query policy as above
        t0 = time.perf_counter()
        ReconciliationPipeline(spark, input_dir="/root/reference").run(
            tempfile.mkdtemp(prefix="bench_etl_")
        )
        best = min(best, time.perf_counter() - t0)
    timings["etl_reference_pipeline"] = round(best, 3)

    # Scaled ETL: the same pipeline on 100× the reference data (1.1M
    # trades, ids rewritten per copy so dedup/join shapes are
    # preserved). Shows throughput where fixed action overhead no
    # longer dominates.
    scaled = _scaled_etl_inputs(100)
    # Production posture at 100×: partitioned JSON sinks (executors
    # write in parallel). single_file=True is the reference-golden
    # format whose array wrapper requires a driver-side write — right
    # for the parity run above, wrong for a million-row output.
    from onechronos_etl_takehome_spark.pipeline.etl import default_config

    cfg = default_config()
    cfg["output"]["single_file"] = False
    best = float("inf")
    for _ in range(2):  # min-of-2, same warm-query policy as above
        t0 = time.perf_counter()
        m = ReconciliationPipeline(spark, input_dir=scaled, config=cfg).run(
            tempfile.mkdtemp(prefix="bench_etl100_")
        )
        best = min(best, time.perf_counter() - t0)
    timings["etl_pipeline_100x"] = round(best, 3)
    # value = one warm pass over the suite (sum of recorded times);
    # the throughput entry is informational, not a duration.
    total = round(sum(timings.values()), 3)
    timings["etl_100x_trades_per_sec"] = round(
        m["processed_trades"] / timings["etl_pipeline_100x"], 1
    )

    # Streaming throughput: the trades reconciliation twin over a
    # landing directory in availableNow mode (the only runtime surface
    # with no bench number until round 5). Best-of-2, same policy as
    # the ETL entries: the round-8 "15% drop" adjudicated to
    # measurement noise — an interleaved 5-run same-commit A/B showed
    # 51.6k on the session's FIRST drain (stream-stack spin-up) vs a
    # 147.8k-163.9k warm band; a single-shot number samples that
    # spread, best-of-2 discards the spin-up run.
    streaming = _streaming_bench(spark, scaled)
    second = _streaming_bench(spark, scaled)
    if second["rows_per_sec"] > streaming["rows_per_sec"]:
        streaming = second
    timings["streaming_trades_per_sec"] = streaming["rows_per_sec"]

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    # vs_prev BEFORE overwriting the side file: last round's committed
    # BENCH_queries.json is the preferred baseline (driver BENCH_r*.json
    # records truncate when the full dict outgrew the tail capture).
    vs_prev, regressions = _vs_previous_round(timings, sf, repo_dir)
    # Confirm-by-re-measure: a REAL regression reproduces minutes later;
    # a transient load window (the dominant flag cause on this box —
    # rounds 3-5 each saw 1-2 different 1-4 s entries flag at 1.3-1.5x
    # and vanish on the next otherwise-identical run) does not. Each
    # flagged catalog entry is re-benched once after the full sweep and
    # keeps its best time; only survivors stay flagged. ETL/streaming
    # entries (min-of-2 long runs) are not re-measured.
    flagged_names = [r.split(":", 1)[0] for r in regressions]
    remeasured = [n for n in flagged_names if n in run_spec]
    if "streaming_trades_per_sec" in flagged_names:
        # throughput flag: one more availableNow drain, keep the best
        # (same confirm-by-re-measure policy as catalog entries)
        remeasured.append("streaming_trades_per_sec")
        re_run = _streaming_bench(spark, scaled)
        if re_run["rows_per_sec"] > streaming["rows_per_sec"]:
            streaming = re_run
            timings["streaming_trades_per_sec"] = re_run["rows_per_sec"]
    if remeasured:
        for label in remeasured:
            if label not in run_spec:
                continue
            qname, data_dir = run_spec[label]
            timings[label] = min(
                timings[label], _bench_query(qname, data_dir, label=label)
            )
        total = round(
            sum(
                v
                for k, v in timings.items()
                if not k.endswith("_per_sec")
            ),
            3,
        )
        vs_prev, regressions = _vs_previous_round(timings, sf, repo_dir)
        print(
            f"re-measured {len(remeasured)} flagged entries; "
            f"{len(regressions)} confirmed",
            file=sys.stderr,
        )
    if vs_prev:
        with open(os.path.join(repo_dir, "BENCH_vs_prev.json"), "w") as f:
            json.dump(vs_prev, f, indent=1)
        print("vs_prev written to BENCH_vs_prev.json", file=sys.stderr)

    # FULL record → BENCH_last.json (uncommitted scratch) ALWAYS;
    # BENCH_queries.json — the committed vs-prev baseline — only under
    # an explicit --pin. Unconditional pinning made every driver
    # post-commit bench run dirty the committed baseline in the
    # working tree (round-13 verdict: the pin must change only in a
    # commit that says so).
    record = {
        "sf": sf,
        "total": total,
        "queries": timings,
        "candidate_counts": candidate_counts,
        "streaming": streaming,
    }
    with open(os.path.join(repo_dir, "BENCH_last.json"), "w") as f:
        json.dump(record, f, indent=1)
    if "--pin" in sys.argv:
        with open(os.path.join(repo_dir, "BENCH_queries.json"), "w") as f:
            json.dump(record, f, indent=1)
        print("baseline pinned to BENCH_queries.json", file=sys.stderr)

    # The compact driver-parseable JSON is the FINAL stdout line — it
    # MUST stay well under the driver's 2000-char tail capture (round
    # 4's full dict overflowed it: parsed=null, no bench record).
    compact_keys = [
        "etl_reference_pipeline",
        "etl_pipeline_100x",
        "etl_100x_trades_per_sec",
        "streaming_trades_per_sec",
        "q01_pricing_summary",
        "v01_validate_lineitem",
        "q58_recursive_reachability",
        "x19_triangle_count",
        "d03_fast_minhash_dedup",
        "d15_prefix_jaccard_pairs",
        "d11_fuzzy_dedup_e2e",
        "d17_edit_distance_pairs",
        "m05_cdc_chunks",
        "m07_cdc_gear_fast",
        "x23_zorder_layout",
        "t19_bpe_tokenize",
        "s01_cosine_topk_100x",
        "s04_cosine_topk_numpy_100x",
    ]
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": {k: timings[k] for k in compact_keys if k in timings},
        "sf": sf,
        "n_queries": len(timings),
        "queries_file": "BENCH_last.json",
        "regressions": regressions,
    }
    line = json.dumps(out)
    assert len(line) < 1500, f"compact line grew to {len(line)} chars"
    print(line)
    spark.stop()


def _streaming_bench(spark, scaled_dir: str) -> dict[str, float]:
    """Trades streaming twin over the 100× landing zone, availableNow.

    The 1.1 M-row trades CSV is split into 8 drop files (header each)
    so maxFilesPerTrigger=4 forces multiple microbatches — the number
    measures real incremental execution (watermarked dedup state,
    stream-static joins, foreachBatch sinks), not one batch in
    streaming clothes. Throughput = input rows / wall from stream
    start to availableNow drain.
    """
    import shutil
    import tempfile
    import time

    from onechronos_etl_takehome_spark.streaming.trades_stream import (
        start_reconciliation_stream,
    )

    land = os.path.join(scaled_dir, "stream_landing")
    done = os.path.join(land, ".done")
    if os.path.exists(done):
        # marker doubles as the row-count record; a stale/unparseable
        # marker (older format) means rebuild
        try:
            with open(done) as f:
                int(f.read().strip())
        except ValueError:
            shutil.rmtree(land, ignore_errors=True)
    if not os.path.exists(done):
        os.makedirs(land, exist_ok=True)
        with open(os.path.join(scaled_dir, "trades.csv")) as f:
            header = f.readline()
            rows = f.readlines()
        n_files = 8
        per = (len(rows) + n_files - 1) // n_files
        for i in range(n_files):
            with open(os.path.join(land, f"trades_{i:02d}.csv"), "w") as f:
                f.write(header)
                f.writelines(rows[i * per : (i + 1) * per])
        with open(done, "w") as f:
            f.write(str(len(rows)))
    with open(done) as f:
        n_rows = int(f.read().strip())

    out_dir = tempfile.mkdtemp(prefix="bench_stream_out_")
    ckpt = tempfile.mkdtemp(prefix="bench_stream_ckpt_")
    t0 = time.perf_counter()
    q = start_reconciliation_stream(
        spark,
        trades_dir=land,
        dims_dir=scaled_dir,
        output_dir=out_dir,
        checkpoint_dir=ckpt,
        available_now=True,
        max_files_per_trigger=4,
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    # throughput numerator = LOGICAL trade rows in the landing zone
    # (counted at split time). The progress surface's numInputRows
    # roughly doubles it because the parseable/unparseable dedup split
    # self-unions the file source — two scans of the same drop.
    n_triggers = sum(1 for p in q.recentProgress if int(p["numInputRows"]) > 0)
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "rows": n_rows,
        "triggers": n_triggers,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_rows / wall, 1),
    }


def _vs_previous_round(
    timings: dict[str, float], sf: float, repo_dir: str
) -> tuple[dict[str, object] | None, list[str]]:
    """Per-query ratio vs the previous recorded run.

    Baseline preference: the committed ``BENCH_queries.json`` (full
    per-query record, survives even when the driver's tail capture
    can't parse its own BENCH_r*.json), else the newest parseable
    BENCH_r*.json at this sf. >1 = slower.

    Flag rule (round-5 calibration): REGRESSION iff ratio > 1.3 AND
    the absolute delta is >= 0.3 s. Sub-second shuffle+agg entries
    jitter past 1.3× from scheduler noise alone (r3 e01/t05/x03, r4
    q20 — every one vanished on re-measure), so a pure-ratio flag on
    them is noise; a real regression that matters at 100 TB moves the
    needle in absolute terms too. Returns (side-file record, flagged
    name:ratio strings — also folded into the compact stdout line so
    the driver record shows them even if stderr scrolls away).
    """
    import glob
    import re

    prev_path = prev_q = None
    side = os.path.join(repo_dir, "BENCH_queries.json")
    try:
        with open(side) as f:
            prev = json.load(f)
        if prev.get("sf") == sf and prev["queries"]:
            prev_path, prev_q = side, prev["queries"]
    except (OSError, json.JSONDecodeError, KeyError, TypeError):
        pass

    if prev_q is None:
        benches = sorted(
            (
                p
                for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))
                if re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
            ),
            key=lambda p: int(
                re.search(r"r(\d+)", os.path.basename(p)).group(1)
            ),
        )
        # newest record whose parsed block is usable at this sf (r02/r04
        # parsed were null — skip such records instead of giving up)
        for cand in reversed(benches):
            try:
                with open(cand) as f:
                    prev = json.load(f)
                parsed = prev.get("parsed", prev)
                if parsed.get("sf") == sf and parsed["queries"]:
                    prev_path, prev_q = cand, parsed["queries"]
                    break
            except (json.JSONDecodeError, KeyError, TypeError, AttributeError):
                continue
    if prev_q is None:
        return None, []
    ratios = {
        name: round(t / prev_q[name], 2)
        for name, t in timings.items()
        # durations only — the trades/sec entries are throughputs,
        # where bigger is better and a >1 ratio is an improvement.
        if name in prev_q and prev_q[name] > 0 and not name.endswith("_per_sec")
    }
    flagged: list[str] = []
    for name, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        if r > 1.3 and (timings[name] - prev_q[name]) >= 0.3:
            flagged.append(f"{name}:{r}x")
            print(
                f"REGRESSION {name}: {r}x vs {os.path.basename(prev_path)}",
                file=sys.stderr,
            )
    # throughput entries (bigger is better): ratio = new/prev, flagged
    # below 0.75 — the round-8 streaming drop (152.3k → 128.7k, −15%)
    # sailed through unflagged because _per_sec entries had no ratio
    # at all; now they are recorded every round and large drops are
    # re-measured like any other flag.
    for name, t in timings.items():
        if not name.endswith("_per_sec") or prev_q.get(name, 0) <= 0:
            continue
        r = round(t / prev_q[name], 2)
        ratios[name] = r
        if r < 0.75:
            flagged.append(f"{name}:{r}x")
            print(
                f"REGRESSION (throughput) {name}: {r}x vs "
                f"{os.path.basename(prev_path)}",
                file=sys.stderr,
            )
    return {"baseline": os.path.basename(prev_path), "ratios": ratios}, flagged


if __name__ == "__main__":
    sys.exit(main())
