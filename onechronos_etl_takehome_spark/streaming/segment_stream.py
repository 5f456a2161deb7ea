"""Streaming corpus-segment dedup: clean each microbatch against the
segment index of everything ingested before it.

The streaming twin of t25/t26 (plans/llm_ops9.py,
operators/text.py:segment_dedup*): documents arrive in microbatches;
each batch explodes into ``seg_tokens``-token segments once, probes
the persisted first-occurrence index (every PRIOR batch's surviving
segments), reassembles its documents from the segments that are new,
and appends exactly those segments to the index. Semantics are
FIRST-ARRIVAL: the first document to bring a segment keeps it —
identical to the batch run's first-corpus-occurrence whenever arrival
order follows document order (pinned against ``segment_dedup`` over
doc-id-range splits in tests/test_segment_stream.py; an out-of-order
test pins the first-arrival rule itself).

Idempotency: cleaned docs and index extensions land as
``batch_id=<n>`` directories, overwritten on replay, and the probe
reads ONLY ``batch_id < n`` partitions — the exactly-once contract
shared by dedup_stream/scd2_stream. Scale: per-batch work is
O(batch segments) explode + one equality join against the index
(partitioned by segment hash in production) + one grouped reassembly;
the corpus is never re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import _reassemble, _segments


def segment_stream(
    docs: DataFrame,
    index_dir: str,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 8,
    max_segs: int = 64,
):
    """writeStream writer: cleaned docs → out_dir, segment index →
    index_dir."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        process_segment_batch(
            batch_df,
            batch_id,
            index_dir,
            out_dir,
            id_col=id_col,
            text_col=text_col,
            seg_tokens=seg_tokens,
            max_segs=max_segs,
        )

    return docs.writeStream.foreachBatch(sink)


def process_segment_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    *,
    id_col: str,
    text_col: str,
    seg_tokens: int,
    max_segs: int,
) -> None:
    """One probe-then-extend step — module-level so replay idempotency
    is directly testable."""
    spark = batch_df.sparkSession
    segs = _segments(
        batch_df, id_col, text_col, seg_tokens, max_segs
    ).persist()
    try:
        if any(e.startswith("batch_id=") for e in _ls(index_dir)):
            # STRICTLY-PRIOR batches only: a replayed batch must not
            # see its own previously-written segments (it would mark
            # ALL of its segments as duplicates). Partition pruning
            # makes the filter free.
            index = (
                spark.read.parquet(index_dir)
                .filter(F.col("batch_id") < batch_id)
                .select("_seg")
                .distinct()
            )
        else:
            index = segs.select("_seg").limit(0)
        within = segs.groupBy("_seg").agg(F.min("_pack").alias("_first_new"))
        kept = (
            segs.join(within, "_seg")
            .join(
                index.withColumn("_in_index", F.lit(True)), "_seg", "left"
            )
            .withColumn(
                "_keep",
                (F.col("_pack") == F.col("_first_new"))
                & F.col("_in_index").isNull(),
            )
        ).persist()
        try:
            _reassemble(kept, id_col).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch_id={batch_id}")
            )
            # extend the index with exactly the survivors
            kept.filter("_keep").select("_seg", "_pack").write.mode(
                "overwrite"
            ).parquet(os.path.join(index_dir, f"batch_id={batch_id}"))
        finally:
            kept.unpersist()
    finally:
        segs.unpersist()


def _ls(path: str) -> list[str]:
    try:
        return os.listdir(path)
    except FileNotFoundError:
        return []
