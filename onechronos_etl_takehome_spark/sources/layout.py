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


def zorder_key(cols: list[str], *, bits: int = 8) -> "F.Column":
    """Interleaved-bit (Morton) key over equal-width bucket ids.

    Each column must already be bucketed to ``[0, 2^bits)`` integers
    (``_bucketize`` below does this in-plan). Interleaving makes file
    ranges narrow in EVERY dimension simultaneously — a linear sort
    only prunes its leading column. Pure shift/and/or expression tree,
    whole-stage codegen'd.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    n = len(cols)
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def zorder_key_sql(col_sqls: list[str], *, bits: int = 8) -> str:
    """The identical Morton interleave as engine-portable ANSI SQL
    (the x23 oracle builder; + replaces | — the terms occupy disjoint
    bit positions, so OR == +). Same contract as :func:`zorder_key`:
    inputs already bucketed to ``[0, 2^bits)``."""
    n = len(col_sqls)
    terms = [
        f"(((CAST({col_sqls[i]} AS BIGINT) >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_frame(
    df: DataFrame, cols: list[str], *, n_files: int, bits: int = 8
) -> DataFrame:
    """``df`` re-clustered along a Morton curve over ``cols`` into
    ``n_files`` range partitions (each downstream file then covers a
    narrow value range in EVERY listed dimension — multi-column data
    skipping). Buckets are equal-width from in-plan global min/max (a
    broadcast 1-row aggregate — no driver collect, no global sort
    window): one tiny aggregate + one range shuffle, at any scale.
    Shared by :func:`write_zordered` (raw layout, x23) and
    ``sources/txlog.py:compact(zorder_by=...)`` (OPTIMIZE ZORDER as a
    log transaction, x38)."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    )
    buckets = df.join(F.broadcast(stats))
    max_bucket = (1 << bits) - 1
    for c in cols:
        span = F.col(f"_hi_{c}") - F.col(f"_lo_{c}")
        frac = F.when(span > 0, (F.col(c).cast("double") - F.col(f"_lo_{c}")) / span).otherwise(F.lit(0.0))
        buckets = buckets.withColumn(
            f"_zb_{c}", F.least(F.floor(frac * (max_bucket + 1)), F.lit(max_bucket)).cast("long")
        )
    keyed = buckets.withColumn(
        "_z", zorder_key([f"_zb_{c}" for c in cols], bits=bits)
    )
    return (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop(
            "_z",
            *[f"_zb_{c}" for c in cols],
            *[f"_lo_{c}" for c in cols],
            *[f"_hi_{c}" for c in cols],
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int,
    bits: int = 8,
    mode: str = "error",
) -> None:
    """Write ``df`` laid out along a Morton curve over ``cols`` —
    see :func:`zorder_frame`. Range predicates on ANY of ``cols``
    then prune whole files via parquet footer min/max."""
    zorder_frame(df, cols, n_files=n_files, bits=bits).write.mode(
        mode
    ).parquet(path)


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
