"""Round-13 operator batch: training-shard materialization + the
video cataloging pass.

- **Deterministic training shards** (t27): ``operators/shards.py`` —
  the last mile of a training-data pipeline: seeded global
  pseudo-random order WITHOUT a total sort (hash-sharded, within-shard
  sorted), plus the order-pinning manifest a 100-TB shard job ships
  with its output.
- **Video stream metadata** (m14): ``operators/video.py:
  video_stream_metadata`` — container/codec/dimensions/profile/level
  per payload WITHOUT pixel decode (AVC via a bit-exact SPS parse,
  ``operators/avc.py``): the routing pass that decides which decode
  pool can even play each of 100 TB of mixed uploads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

_T27_SEED = 7
_T27_SHARDS = 16

_T27_ORACLE = f"""
    WITH k AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             ('0x' || substr(
                md5('{_T27_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15
             ))::BIGINT AS key
      FROM documents),
    s AS (
      SELECT doc_id, key, key % {_T27_SHARDS} AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY key % {_T27_SHARDS} ORDER BY key, doc_id
             ) AS pos
      FROM k)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(key) AS first_key,
           MAX(key) AS last_key,
           CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS order_checksum
    FROM s GROUP BY shard
"""


@register("t27_training_shards", oracle=_T27_ORACLE)
def t27_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC TRAINING SHARDS (``operators/shards.py``): the
    corpus-to-trainer hand-off. A seeded global ``ORDER BY random()``
    is a total sort — an all-to-all exchange plus a global merge that
    cannot parallelize past the writer count. Training order only
    needs reproducibility and mixing, so: shard by a seeded 60-bit
    md5 of the doc id (ONE ordinary hash exchange), sort WITHIN each
    shard by the same key (N independent, memory-bounded, AQE-sized
    sorts), and any fixed interleave of shards is a reproducible
    permutation. Hash placement is stable, so appending a corpus
    slice reshuffles nothing already written.

    The row returns the shard MANIFEST — per shard: doc count, key
    span, and an order checksum (Σ position·(doc_id mod p) over the
    within-shard order; any transposition changes it) — hash-matched
    against a DuckDB recomputation via the cross-engine md5 60-bit
    key family the MinHash oracle established. The gate additionally
    writes real shard directories at sf0.001 and pins byte determinism
    + order (tests/test_round13_ops.py)."""
    pin_semantics(spark)
    from ..operators.shards import shard_manifest

    docs = load_table(spark, sf_dir, "documents")
    return shard_manifest(
        docs, "doc_id", n_shards=_T27_SHARDS, seed=_T27_SEED
    )


# ---------------------------------------------------------------------------
# m14 — video stream metadata: parse REAL containers (MJPEG-MP4 /
# avc1-MP4 with a full SPS bit-parse / MJPEG-AVI), hash-matched
# against a relational recomputation of the fixture's parameters.
# The parse is the hard direction; the oracle recomputes what the
# deterministic fixture embedded — parse(synthesize(params)) == params
# per payload, the same witness shape as v01.
# ---------------------------------------------------------------------------

_M14_ORACLE = """
    WITH ids AS (
      SELECT CAST(doc_id AS BIGINT) AS id
      FROM documents WHERE doc_id % 10 = 0),
    p AS (
      SELECT id,
             34 + (id % 7) * 2 AS w,
             18 + (id % 5) * 2 AS h,
             (id // 10) % 4 AS kind,
             (id // 40) % 2 AS alt
      FROM ids)
    SELECT id,
           CASE WHEN kind = 2 THEN 'avi' ELSE 'mp4' END AS container,
           CASE WHEN kind = 1 THEN 'avc'
                WHEN kind = 3 THEN 'hevc'
                ELSE 'mjpeg' END AS codec,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(2 AS BIGINT) AS n_samples,
           CASE WHEN kind = 1 THEN
             CAST(CASE WHEN alt = 1 THEN 100 ELSE 66 END AS BIGINT)
                WHEN kind = 3 THEN
             CAST(CASE WHEN alt = 1 THEN 2 ELSE 1 END AS BIGINT)
           END AS profile_idc,
           CASE WHEN kind = 1 THEN CAST(30 + id % 3 AS BIGINT)
                WHEN kind = 3 THEN CAST(90 + (id % 3) * 3 AS BIGINT)
           END AS level_idc
    FROM p
"""


@register("m14_video_metadata", oracle=_M14_ORACLE)
def m14_video_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO STREAM METADATA (``operators/video.py:
    video_stream_metadata``): the cataloging/routing pass a 100-TB
    mixed-codec video corpus runs BEFORE any decode — container,
    codec, coded dimensions, sample count, and for AVC the
    profile/level a decode pool must support. MP4 walks the real box
    tree; ``avc1`` entries parse the avcC record's SPS BIT-EXACTLY
    (exp-Golomb, chroma-aware crop-unit arithmetic —
    ``operators/avc.py``; pixel decode of AVC stays an explicit
    raise); ``hvc1`` parses the hvcC record's profile/tier/level AND
    its embedded HEVC SPS (profile_tier_level walk + conformance
    window); AVI walks the RIFF headers. The fixture stream rotates
    all four container/codec combinations with id-derived parameters,
    so the oracle recomputes relationally exactly what the parser
    must extract — parse ∘ synthesize == id, per payload,
    hash-matched.

    Scale: pure metadata cost (box/header walk over the payload head;
    mdat is never opened), embarrassingly parallel in the same
    Arrow-batched stage every media op uses."""
    from ..operators import video as vid

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    payloads = vid.demo_codec_zoo_payloads(docs, "doc_id")
    return vid.video_stream_metadata(payloads).select(
        F.col("id"),
        "container", "codec", "width", "height", "n_samples",
        "profile_idc", "level_idc",
    )
