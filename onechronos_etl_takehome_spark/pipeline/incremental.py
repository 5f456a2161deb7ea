"""Partition-incremental ingestion: process only what's new.

A 100-TB fact table grows by date partition; reprocessing history per
run is the classic accidental-quadratic ETL. This module gives the
batch pipeline the same exactly-once increment contract the streaming
rollup sink has (operators/rollup.py), keyed by *source partition*
instead of microbatch id:

- the source is a partitioned directory (``part_col=value/`` dirs);
- a ledger under the destination records which source partitions have
  been applied;
- each run lists source partitions (directory listing — no data
  read), diffs against the ledger, runs the user's transform ONLY on
  unprocessed partitions (partition-pruned scans — the filter is on
  the partition column), appends the results partitioned by the same
  column, then records them in the ledger;
- a partition already in the ledger is never re-read, so re-runs and
  schedule overlaps are no-ops rather than duplicates.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LEDGER = "_PROCESSED_PARTITIONS"


def list_partitions(src_dir: str, part_col: str) -> list[str]:
    """Partition values from directory names — a listing, not a scan."""
    prefix = f"{part_col}="
    return sorted(
        d[len(prefix):]
        for d in os.listdir(src_dir)
        if d.startswith(prefix) and os.path.isdir(os.path.join(src_dir, d))
    )


def _processed(dst_dir: str) -> set[str]:
    ledger = os.path.join(dst_dir, _LEDGER)
    if not os.path.exists(ledger):
        return set()
    with open(ledger) as f:
        return {line.strip() for line in f if line.strip()}


def _record(dst_dir: str, values: list[str]) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    with open(os.path.join(dst_dir, _LEDGER), "a") as f:
        for v in values:
            f.write(f"{v}\n")


def ingest_new_partitions(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    part_col: str,
    transform: Callable[[DataFrame], DataFrame] = lambda df: df,
) -> dict[str, object]:
    """Apply ``transform`` to unprocessed source partitions only.

    The new-partition filter is on the partition column, so Catalyst
    prunes the scan to exactly the new directories (verify with
    .explain: PartitionFilters). Output appends under the same
    partition layout; the ledger commit happens after the write, so a
    crash mid-run re-processes (overwrites) the in-flight partitions
    rather than losing them — dynamic partition overwrite keeps that
    re-run idempotent.
    """
    todo = [v for v in list_partitions(src_dir, part_col) if v not in _processed(dst_dir)]
    if not todo:
        return {"processed": [], "skipped_existing": True}
    src = spark.read.parquet(src_dir)
    fresh = src.filter(F.col(part_col).isin(todo))
    out = transform(fresh)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .parquet(dst_dir)
    )
    _record(dst_dir, todo)
    return {"processed": todo, "skipped_existing": False}
