"""Streaming SCD2 maintenance: keep a type-2 dimension current from a
change stream, writing only touched keys per microbatch.

The streaming twin of x26/x27 (plans/llm_ops8.py, operators/scd2.py):
an append-only, per-key time-ordered change stream arrives in
microbatches; each batch closes the open versions of the keys it
touches and appends their new versions via ``scd2_apply`` — history
for untouched keys is NEVER rewritten or even read. Processing a log
in any time-split of microbatches yields exactly
``scd2_build(full log)`` (pinned in tests/test_scd2_stream.py), the
N-batch extension of x27's incremental==batch hash proof.

Storage is merge-on-read, the plain-parquet stand-in for a Delta
``MERGE`` target: batch *n* writes ``batch_id=n`` holding the full
version history OF THE KEYS IT TOUCHED ONLY (bounded by the batch's
key count, not the dimension), and :func:`current_dimension`
reconstructs the live table by keeping each ``(key, version)``'s
latest ``batch_id`` (one window over the partition-pruned union).
Replay is exactly-once: a replayed batch reads only STRICTLY-PRIOR
partitions, so it recomputes byte-identical output into its own
overwritten directory — the same contract dedup_stream.py documents.

Scale: per-batch work is O(batch keys' history), not O(dimension);
the read-side window is the merge-on-read cost that a periodic
compaction (rewrite ``current_dimension`` as a new base, drop old
deltas) bounds in production — on a real lakehouse both halves are a
single ``MERGE INTO`` and time travel replaces the batch_id bookkeeping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_stream(
    changes: DataFrame,
    dim_dir: str,
    *,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
):
    """writeStream writer maintaining the SCD2 dimension at dim_dir."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        process_scd2_batch(
            batch_df,
            batch_id,
            dim_dir,
            key_col=key_col,
            state_col=state_col,
            ts_col=ts_col,
            tiebreak_col=tiebreak_col,
        )

    return changes.writeStream.foreachBatch(sink)


def process_scd2_batch(
    batch_df: DataFrame,
    batch_id: int,
    dim_dir: str,
    *,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> None:
    """One close-and-extend step — module-level so replay idempotency is
    directly testable. Contract (same as ``scd2_apply``): every batch
    row orders strictly after the key's open ``valid_from`` from prior
    batches — i.e. the stream is an append-only log per key."""
    from ..operators.scd2 import scd2_apply, scd2_build

    spark = batch_df.sparkSession
    batch_df = batch_df.localCheckpoint(eager=True)  # pin vs replans
    prior = current_dimension(
        spark, dim_dir, key_col=key_col, before=batch_id
    )
    if prior is None:
        touched_dim = scd2_build(
            batch_df, key_col, state_col, ts_col, tiebreak_col
        )
    else:
        # only the touched keys' history participates: the batch key
        # set is batch-sized, so AQE broadcasts it under the semi join
        keys = batch_df.select(key_col).distinct()
        prior_touched = prior.join(keys, key_col, "left_semi")
        touched_dim = scd2_apply(
            prior_touched, batch_df, key_col, state_col, ts_col, tiebreak_col
        )
    touched_dim.write.mode("overwrite").parquet(
        os.path.join(dim_dir, f"batch_id={batch_id}")
    )


def current_dimension(
    spark,
    dim_dir: str,
    *,
    key_col: str,
    before: int | None = None,
) -> DataFrame | None:
    """Merge-on-read: latest ``batch_id`` wins per ``(key, version)``.
    ``before`` restricts to strictly-prior batches (replay safety);
    partition pruning makes the filter free. Returns None when no
    (prior) delta exists yet."""
    names = _ls(dim_dir)
    have = [
        int(e.split("=", 1)[1])
        for e in names
        if e.startswith("batch_id=")
    ]
    if before is not None:
        have = [b for b in have if b < before]
    if not have:
        return None
    df = spark.read.option("basePath", dim_dir).parquet(
        *[os.path.join(dim_dir, f"batch_id={b}") for b in sorted(have)]
    )
    w = (
        Window.partitionBy(key_col, "version")
        .orderBy(F.col("batch_id").desc())
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "batch_id")
    )


def _ls(path: str) -> list[str]:
    try:
        return os.listdir(path)
    except FileNotFoundError:
        return []
