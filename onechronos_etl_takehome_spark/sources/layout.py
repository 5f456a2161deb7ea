"""Data-layout maintenance: small-file compaction and range layout.

At 100 TB the dominant operational problems are file-count explosion
(streaming sinks, per-partition writes → millions of tiny files that
throttle the driver's listing and the scheduler) and scan locality
(point/range queries over unsorted data read everything). These two
operators are the maintenance half of the engine:

- ``compact_parquet`` rewrites a directory to ~target-sized files.
  The output file count is derived from the *measured* input bytes,
  not a guessed partition count, so the same call works at any scale.
- ``write_range_partitioned`` lays data out with globally
  non-overlapping sorted key ranges (repartitionByRange + in-partition
  sort), which is what makes min/max footer pruning effective —
  Catalyst skips whole files whose [min,max] misses the predicate.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def parquet_dir_bytes(path: str) -> int:
    """Total bytes of parquet data files under ``path`` (recursive)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    target_file_bytes: int = 128 << 20,
    mode: str = "error",
) -> int:
    """Rewrite ``src_dir`` into ~``target_file_bytes``-sized files.

    Returns the output file count. One wide repartition (round-robin,
    so output files are uniform regardless of input skew) and one
    write — the same two stages whether the input is 64 files or 6
    million.
    """
    total = parquet_dir_bytes(src_dir)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode(mode).parquet(dst_dir)
    return n_files


def write_range_partitioned(
    df: DataFrame,
    path: str,
    by: list[str],
    *,
    n_files: int,
    mode: str = "error",
) -> None:
    """Write ``df`` as ``n_files`` files with globally sorted, mutually
    non-overlapping ranges of ``by`` — the layout that turns parquet
    min/max footer stats into file-level pruning for range predicates.
    """
    df.repartitionByRange(n_files, *by).sortWithinPartitions(*by).write.mode(
        mode
    ).parquet(path)
