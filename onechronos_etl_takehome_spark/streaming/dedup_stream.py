"""Streaming incremental fuzzy dedup: probe-then-extend an LSH index.

The streaming twin of d14 (plans/llm_ops3.py): documents arrive in
microbatches; each batch is MinHash-bucketed once, probed against the
persisted corpus index (every PRIOR batch's buckets), and then appended
to the index. Candidates therefore cover new-vs-new within the batch
AND new-vs-corpus across all earlier batches — processing a corpus in
any microbatch split yields exactly the pairs a from-scratch batch run
finds (pinned in tests/test_dedup_stream.py).

Idempotency: both the candidate output and the index extension land as
``batch_id=<n>`` directories, overwritten on replay — the same
plain-parquet exactly-once contract events_stream.py's sinks use. The
probe reads ONLY ``batch_id < n`` index partitions (partition-pruned),
so a replayed batch never sees its own half-written buckets — without
that filter a replay would double-count its rows inside
``max_bucket_size`` buckets and silently drop candidates it kept the
first time.

Scale: the index is partitioned by ``band`` — the probe join reads
only matching band partitions; the per-batch work is O(batch), never
O(corpus). This is the foreachBatch + parquet stand-in for a Delta
``MERGE``-maintained index table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.dedup import incremental_minhash_candidates, minhash_buckets


def dedup_stream(
    docs: DataFrame,
    index_dir: str,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = None,
    hash_family: str = "xxhash64",
):
    """writeStream writer: candidates → out_dir, buckets → index_dir."""

    kw = dict(n=n, num_hashes=num_hashes, bands=bands, hash_family=hash_family)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        process_dedup_batch(
            batch_df,
            batch_id,
            index_dir,
            out_dir,
            id_col=id_col,
            text_col=text_col,
            max_bucket_size=max_bucket_size,
            **kw,
        )

    return docs.writeStream.foreachBatch(sink)


def process_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    *,
    id_col: str,
    text_col: str,
    max_bucket_size: int | None,
    **kw,
) -> None:
    """One probe-then-extend step — module-level so replay idempotency
    is directly testable (tests/test_dedup_stream.py re-runs a batch id
    and asserts byte-identical candidates)."""
    spark = batch_df.sparkSession
    # hash the batch exactly once: the bucket frame feeds BOTH the
    # probe and the index append (two actions)
    new_buckets = minhash_buckets(batch_df, id_col, text_col, **kw).persist()
    try:
        if any(e.startswith("batch_id=") for e in _ls(index_dir)):
            # STRICTLY-PRIOR batches only: on replay the index dir
            # already holds this batch's own buckets, and counting
            # them would break the max_bucket_size cap (and the
            # exactly-once contract). Partition pruning makes the
            # filter free.
            from pyspark.sql import functions as F

            index = (
                spark.read.parquet(index_dir)
                .filter(F.col("batch_id") < batch_id)
                .drop("batch_id")
            )
        else:
            # first batch: no corpus yet — new-vs-new only
            index = new_buckets.limit(0)
        cands = incremental_minhash_candidates(
            batch_df,
            index,
            id_col,
            text_col,
            max_bucket_size=max_bucket_size,
            new_buckets=new_buckets,
            **kw,
        )
        cands.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        new_buckets.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch_id={batch_id}")
        )
    finally:
        new_buckets.unpersist()


def _ls(path: str) -> list[str]:
    try:
        return os.listdir(path)
    except FileNotFoundError:
        return []
