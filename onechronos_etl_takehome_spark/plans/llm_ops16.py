"""Round-14 operator batch: the shard layout's consumer half + real
AVC video ingest.

- **Shard replay** (t28): ``operators/shards.py:read_training_shards``
  — the merge-on-read consumer of ``append_training_shards``. Round
  13 shipped the writer (grow a shard layout without touching
  existing files) and DOCUMENTED that a reader recovers the order by
  merging segments; this row is that reader, hash-matched: a layout
  written in two slices (create + append) replays the identical
  (seed, corpus) order a relational recomputation derives over the
  whole corpus.
- **AVC I_PCM video near-dup** (m15): ``operators/avc.py`` grows a
  REAL H.264 sample coding layer — the intra-PCM subset (14496-10
  §7.3.5), fully conformant and bit-exact — so ``mp4_frames`` now
  decodes ``avc1`` tracks whose slices are I_PCM, and the tolerant
  cross-codec near-dup family gains a genuine AVC corpus leg
  (round-13 verdict stretch item 8).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

_T28_SEED = 11
_T28_SHARDS = 8

# Same cross-engine 60-bit md5 key family as t27; different seed and
# shard count so the two rows can never mask each other.
_T28_ORACLE = f"""
    WITH k AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             ('0x' || substr(
                md5('{_T28_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15
             ))::BIGINT AS key
      FROM documents),
    s AS (
      SELECT doc_id, key, key % {_T28_SHARDS} AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY key % {_T28_SHARDS} ORDER BY key, doc_id
             ) AS pos
      FROM k)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(key) AS first_key,
           MAX(key) AS last_key,
           CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS order_checksum
    FROM s GROUP BY shard
"""


@register("t28_shard_replay", oracle=_T28_ORACLE)
def t28_shard_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARD REPLAY (``operators/shards.py:read_training_shards``):
    the consumer half of the training-shard contract. The corpus
    lands in TWO slices — ``write_training_shards`` for docs with
    ``doc_id % 3 != 0``, then ``append_training_shards`` for the rest
    — so every shard directory holds multiple internally sorted
    segment files and none of the first slice's bytes were rewritten
    (the 100-TB growth property). The reader then merges each shard's
    segments with ONE shard-local sort over the STORED shuffle key
    (no seed knowledge, no global sort, no re-hash) and stamps replay
    positions; the row aggregates (count, key span, the
    transposition-sensitive Σ pos·(doc_id mod p) checksum) per shard
    FROM THE REPLAY and hash-matches a DuckDB recomputation over the
    whole corpus — proving a post-append read replays exactly the
    (seed, corpus) order, which is what makes a training run over an
    incrementally grown layout restartable and order-debuggable.

    Scale: the groupBy reuses the replay window's own hash exchange
    on ``_shard`` (one exchange total); reading shard K alone costs
    shard K's bytes — the Hive layout is the prune."""
    import shutil
    import tempfile

    from ..operators.shards import (
        append_training_shards,
        read_training_shards,
        write_training_shards,
    )

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    path = tempfile.mkdtemp(prefix=f"shards_t28_{uuid.uuid4().hex[:8]}_")
    shutil.rmtree(path)  # writer requires a fresh target (mode=error)
    write_training_shards(
        docs.filter(F.col("doc_id") % 3 != 0),
        "doc_id",
        path,
        n_shards=_T28_SHARDS,
        seed=_T28_SEED,
    )
    append_training_shards(
        docs.filter(F.col("doc_id") % 3 == 0),
        "doc_id",
        path,
        n_shards=_T28_SHARDS,
        seed=_T28_SEED,
    )
    replay = read_training_shards(spark, path, "doc_id")
    return (
        replay.select(
            "_shard",
            "_shuffle_key",
            (
                F.col("_pos") * (F.col("doc_id") % 1_000_003)
            ).alias("_ck"),
        )
        .groupBy("_shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("_shuffle_key").alias("first_key"),
            F.max("_shuffle_key").alias("last_key"),
            F.sum("_ck").cast("long").alias("order_checksum"),
        )
        .withColumnRenamed("_shard", "shard")
    )


# ---------------------------------------------------------------------------
# m15 — AVC (H.264 I_PCM) video near-dup: a planted MJPEG/AVC twin
# recovered by the tolerant banded-Hamming join. Rows-only BY DESIGN:
# SQL cannot walk ISO-BMFF boxes or decode H.264 slices. Pinned by
# tests/test_round14_ops.py (planted-pair recovery, exact-join zero,
# bit-exact I_PCM reconstruction).
# ---------------------------------------------------------------------------


@register("m15_avc_ipcm_video_neardup")  # H.264 slice decode → rows-only
def m15_avc_ipcm_video_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AVC-INGEST video near-dup: each planted twin pairs a lossy
    Motion-JPEG MP4 with the SAME footage (lead frame trimmed) as a
    REAL ``avc1`` MP4 — samples are spec-conformant H.264 I_PCM IDR
    slices the engine both writes and decodes bit-exactly
    (``operators/avc.py:encode_ipcm_idr``/``decode_ipcm_idr``; at the
    QP=0 the standard assigns PCM blocks, the deblocking thresholds
    are zero, so ANY conformant decoder reconstructs these pixels
    exactly). JPEG quantization perturbs the MJPEG side's frame
    hashes a few bits while the AVC side is exact, so m10's exact
    containment join finds zero pairs and only the tolerant
    banded-Hamming join (m12's machinery) recovers the twins — the
    round-13 stretch: the cross-codec family can now ingest genuine
    H.264 uploads in the subset a pure-python engine can honestly
    decode; entropy-coded slices still raise and fall to the stub.

    Scale: same Arrow-batched decode stage and pigeonhole blocking as
    m12 — metadata-cheap arity self-selection included."""
    from ..operators import video as vid

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_videos = docs.filter(F.col("doc_id") % 10 == 0).count()
    payloads = vid.demo_avc_twin_payloads(docs, "doc_id")
    return vid.video_match_pairs_tolerant(
        payloads, min_containment=0.6, n_videos=n_videos
    )
