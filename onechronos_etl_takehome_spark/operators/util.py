"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition IF the input is under-parallel.

    CPU-dominant operators (interpreted higher-order expressions,
    Arrow-batch Python stages) run at the parallelism of their input's
    file-split count: a single parquet file — or a handful of large
    gzip files — serializes the whole operator onto that many cores.
    The gate makes this a strict no-op at scale: a 100-TB input already
    scans with thousands of splits (>= defaultParallelism), so no
    shuffle is added; only a genuinely under-split input pays one cheap
    round-robin exchange to unlock every core.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
