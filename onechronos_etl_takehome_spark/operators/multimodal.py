"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column riding next to typed metadata (modality, byte size,
checksum, decode hints). Heavy per-item work (decode, resize, feature
extraction) runs in Arrow-batched ``mapInPandas`` so batches stream
through Python without row-at-a-time overhead, and the *schema* of the
result is declared up front so Catalyst can prune/pushdown around it.

The actual media decoders (PIL/ffmpeg/etc.) are NOT in this container —
``decode_features`` is a clearly-marked deterministic stub: it derives
a fake fixed-length feature vector from the payload bytes. The Spark
plumbing (schema, partitioning, UDF signature, batch shape) is real and
tested; swap ``_fake_decode`` for a real decoder to productionize.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = "id long, n_bytes long, checksum string"
FEATURE_SCHEMA = "id long, modality string, n_bytes long, features array<double>"


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo payload builder: utf-8 bytes of a text column as the opaque
    binary + modality tag. Real ingestion would read image/audio bytes
    via spark.read.format('binaryFile')."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("text").alias("modality"),
    )


def binary_metadata(payloads: DataFrame) -> DataFrame:
    """(id, n_bytes, checksum) via mapInPandas over the binary column.

    Arrow ships each batch as pandas; hashlib is deterministic, so this
    is oracle-checkable (md5 of utf-8 bytes == md5 of the string).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    # id type passes through: long for the demo corpus, string paths
    # for binaryFile ingestion (sources/readers.read_binary_dir)
    id_type = payloads.schema["id"].dataType.simpleString()
    return payloads.mapInPandas(
        compute, schema=BINARY_META_SCHEMA.replace("id long", f"id {id_type}")
    )


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """STUB decoder — replace with a real image/audio decode.

    Deterministic fake: md5-seeded bytes → n_features doubles in [0,1).
    Raises if asked for a modality a real decoder would need.
    """
    h = hashlib.md5(payload).digest()
    raw = (h * ((n_features // len(h)) + 1))[:n_features]
    return [b / 256.0 for b in raw]


def sample_frames(
    payloads: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """One-to-many extraction: emit up to ``max_frames`` pseudo-frames
    per payload (every_n_bytes stride) — the mapInPandas shape of video
    frame-sampling, where one input row yields N output rows with a
    declared schema. Real decoders replace the stride slice with an
    ffmpeg keyframe walk; the Spark plumbing is identical.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads_b = [bytes(b) for b in pdf["content"]]
            sizes = np.fromiter(
                (len(p) for p in payloads_b), np.int64, count=len(payloads_b)
            )
            # Vectorized frame fan-out (repeat/arange); only the md5 per
            # chunk — the stand-in for the real decode — stays Python.
            n_frames = np.minimum(max_frames, np.maximum(1, sizes // every_n_bytes))
            ids = np.repeat(pdf["id"].to_numpy(np.int64), n_frames)
            idxs = (
                np.concatenate([np.arange(k) for k in n_frames])
                if len(n_frames)
                else np.empty(0, np.int64)
            )
            offs = idxs * every_n_bytes
            checks = [
                hashlib.md5(p[o : o + every_n_bytes]).hexdigest()
                for p, k in zip(payloads_b, n_frames)
                for o in range(0, int(k) * every_n_bytes, every_n_bytes)
            ]
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "frame_checksum": checks,
                }
            )

    return payloads.mapInPandas(
        frames,
        schema="id long, frame_idx long, byte_offset long, frame_checksum string",
    )


def decode_features(
    payloads: DataFrame, *, n_features: int = 16, require_real_decoder: bool = False
) -> DataFrame:
    """Feature-extraction stage over opaque binary payloads.

    ``require_real_decoder=True`` raises NotImplementedError — the
    media libraries are not available in this environment; the batch
    plumbing below is the production shape.
    """
    if require_real_decoder:
        raise NotImplementedError(
            "real media decoders (PIL/ffmpeg) are not installed; "
            "use the deterministic stub (require_real_decoder=False)"
        )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": pdf["content"].map(
                        lambda b: _fake_decode(bytes(b), n_features)
                    ),
                }
            )

    return payloads.mapInPandas(compute, schema=FEATURE_SCHEMA)


def chunk_fingerprints(
    payloads: DataFrame, *, chunk_bytes: int = 64
) -> DataFrame:
    """(id, chash): md5 fingerprint per distinct fixed-size block of the
    binary payload — the storage-dedup block map (ZFS/backup-style
    fixed-block dedup). Pure Column expressions: one higher-order
    transform slices the payload, hashes ride the same projection, and
    array_distinct gives set semantics per payload.

    Cross-engine: the payload hexes ONCE (uppercase in both engines;
    neither can md5 a BLOB slice portably) and blocks slice the hex
    string at 2·chunk_bytes characters — hex(chunk) == chunk-of-hex at
    byte-aligned offsets, so fingerprints agree bit-for-bit.

    Fixed-offset blocks are alignment-sensitive (a one-byte insert
    shifts every later block — the classic trade-off vs content-defined
    chunking); right for exact/append-shaped binary duplication, which
    is what multimodal corpus dedup mostly sees (re-encoded copies are
    a different modality's problem).
    """
    hex_chars = 2 * chunk_bytes
    hexed = F.hex(F.col("content"))
    n_chunks = F.ceil(F.length(hexed) / F.lit(hex_chars)).cast("int")
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]); empty payloads
    # must yield no chunks, matching DuckDB's empty generate_series.
    chunks = F.when(n_chunks >= 1, F.sequence(F.lit(1), n_chunks)).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.array_distinct(
        F.transform(
            chunks,
            lambda i: F.md5(
                hexed.substr(
                    (i - F.lit(1)) * F.lit(hex_chars) + F.lit(1),
                    F.lit(hex_chars),
                )
            ),
        )
    )
    return payloads.select(
        F.col("id"), F.explode(hashes).alias("chash")
    )


def binary_chunk_neardup(
    payloads: DataFrame,
    *,
    chunk_bytes: int = 64,
    min_containment: float = 0.5,
    max_block_df: int | None = None,
) -> DataFrame:
    """Near-duplicate binary payload pairs by shared fixed-size blocks:
    (id_a < id_b, shared_chunks, containment) where containment =
    shared / min(|blocks_a|, |blocks_b|) — 1.0 means the smaller
    payload's blocks all appear in the larger (append/truncate dups).

    Inverted-index join on block fingerprints — same shape (and same
    100-TB posture notes) as the n-gram Jaccard index in
    operators/dedup.py; block sizes ride the exploded rows as min()
    aggregates.

    ``max_block_df``: the posting-list cap, and for BINARY corpora it
    matters even more than for text — uniform blocks (zero fill,
    padding, shared headers) recur across millions of files and fan
    the index out quadratically. Blocks whose document frequency
    exceeds the cap leave the INDEX only (sizes stay exact, via a
    window over the join's own exchange); pairs sharing only
    ultra-common blocks are missed — the same deliberate trade as
    ``ngram_jaccard_pairs(max_shingle_df=...)``. ``None`` (default)
    is the exact oracle form.
    """
    from pyspark.sql.window import Window

    ch = chunk_fingerprints(payloads, chunk_bytes=chunk_bytes)
    sizes = ch.groupBy("id").agg(F.count(F.lit(1)).alias("_n"))
    chs = ch.join(sizes, "id")
    if max_block_df is not None:
        wdf = Window.partitionBy("chash")
        chs = (
            chs.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("_df") <= max_block_df)
            .drop("_df")
        )
    a = chs.select(
        F.col("id").alias("id_a"), "chash", F.col("_n").alias("n_a")
    ).hint("merge")
    b = chs.select(
        F.col("id").alias("id_b"), "chash", F.col("_n").alias("n_b")
    )
    containment = F.col("shared_chunks").cast("double") / F.least(
        "n_a", "n_b"
    ).cast("double")
    return (
        a.join(
            b, (a["chash"] == b["chash"]) & (F.col("id_a") < F.col("id_b"))
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_chunks"),
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
        )
        .select(
            "id_a",
            "id_b",
            "shared_chunks",
            containment.alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
    )
