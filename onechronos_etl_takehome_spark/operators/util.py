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

    SCAN-SHAPED INPUTS ONLY: ``df.rdd.getNumPartitions()`` forces
    final-plan resolution, and with AQE enabled that *executes any
    upstream shuffle stages eagerly* at build time (work discarded and
    redone at action time). Every call site passes a freshly-loaded
    scan (no upstream exchange), where the probe is metadata-only. Do
    not pass a derived/shuffled DataFrame — compute the split count
    from leaf-file metadata upstream instead.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
