"""Streaming twin of the perceptual image dedup (m08): incremental
multimodal ingestion.

Production shape: new media lands continuously; each drop must be
fingerprinted ON ARRIVAL and checked against the already-ingested
corpus — re-fingerprinting 100 TB per drop is the failure mode this
twin exists to avoid (the same incremental posture as the d14
incremental-LSH text path). Mechanics:

- the landing zone is a monitored directory of parquet files carrying
  ``(id, content binary)`` payload rows (the format a binaryFile
  ingest job or upstream producer writes);
- fingerprinting (``multimodal.image_dhash`` — real BMP decode +
  64-bit dHash) runs inside the microbatch via Arrow ``mapInPandas``
  — stateless, so no watermark is needed anywhere;
- matching is a stream-static equality join: the static side is the
  corpus index exploded to banded (chunk_idx, chunk_value) signature
  rows (dimension-like: 4 small ints per indexed image), broadcast
  per microbatch; the pigeonhole guarantee (ham ≤ bands-1 ⇒ some
  16-bit chunk intact) makes the banded join lossless, and the exact
  Hamming verify (bit_count of XOR) runs map-side;
- the sink is the engine's idempotent ``batch_id=<n>`` directory
  contract (a replayed batch overwrites itself and nothing else).

Pinned in tests/test_media_stream.py: multi-trigger availableNow run
finds exactly the planted near-dups, matches agree with the batch
operator, replays stay idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.multimodal import image_dhash

PAYLOAD_SCHEMA = "id long, content binary"


def dhash_band_signatures(hashed: DataFrame, *, bands: int = 4) -> DataFrame:
    """Explode (id, dhash) rows to banded 16-bit signature rows
    (id, dhash, ci, cv) — the join key shape both the batch pair join
    and this stream-static probe use."""
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftrightunsigned("dhash", 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("cv"),
            )
            for i in range(bands)
        ]
    )
    return hashed.select(
        "id", "dhash", F.explode(chunks).alias("c")
    ).select("id", "dhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))


def read_payload_stream(
    spark: SparkSession,
    payload_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Monitored-directory stream of payload parquet drops."""
    reader = spark.readStream.schema(PAYLOAD_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(payload_dir)


def match_against_index(
    stream_payloads: DataFrame,
    index: DataFrame,
    *,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(new_id, corpus_id, hamming) for every arriving image within
    ``max_hamming`` of an indexed one. ``index`` is a STATIC
    (id, dhash) frame (e.g. ``image_dhash`` over the ingested corpus,
    persisted); its banded explode is dimension-sized and broadcast."""
    probe = dhash_band_signatures(
        image_dhash(stream_payloads), bands=bands
    )
    idx = dhash_band_signatures(index, bands=bands).select(
        F.col("id").alias("corpus_id"),
        F.col("dhash").alias("_hc"),
        "ci",
        "cv",
    )
    ham = F.bit_count(F.col("dhash").bitwiseXOR(F.col("_hc")))
    return (
        probe.join(F.broadcast(idx), ["ci", "cv"])
        .filter(F.col("id") != F.col("corpus_id"))
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("id").alias("new_id"), "corpus_id", "hamming")
        .dropDuplicates(["new_id", "corpus_id"])
    )


def start_image_neardup_stream(
    spark: SparkSession,
    *,
    payload_dir: str,
    index: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    bands: int = 4,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """End-to-end incremental image-dedup job: landing-zone parquet →
    decode+dHash → banded stream-static match → idempotent
    ``batch_id=<n>`` match directories."""
    matches = match_against_index(
        read_payload_stream(
            spark, payload_dir, max_files_per_trigger=max_files_per_trigger
        ),
        index,
        max_hamming=max_hamming,
        bands=bands,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"batch_id={batch_id}")
        )

    writer = matches.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
