"""Hive-partitioned table layout: partition pruning as a first-class op.

The third member of the layout-investment family — x23 clusters WITHIN
files (z-order min-max skipping), x24 buckets BY KEY (shuffle-free
joins), and this module partitions BY DIRECTORY (``partitionBy`` at
write time), which is what lets a date-range query over a 100-TB event
table open only the matching day directories: the filter is resolved
against the file LISTING, before any row or footer is read.

``partitioned_events`` materializes the events table partitioned by
event date once per (application, sf_dir) — uuid-scoped paths, same
concurrency discipline as ``bucketing.bucketed_pair`` — and reads it
back through the Hive-partition discovery path, so downstream filters
on ``event_date`` show up in the scan's ``PartitionFilters`` (asserted
against a pruned-partition count in tests/test_round6c_ops.py).

Partition-column hygiene at scale: daily grain bounds directory count
(~36k for a century); the partition value is a STRING 'yyyy-MM-dd'
(identical rendering in any engine, no date-parsing ambiguity in the
directory names); high-cardinality keys (user_id) stay IN the files —
partitioning on them would shatter the table into millions of tiny
files, exactly what x29's compaction planner exists to undo.
"""

from __future__ import annotations

import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LAYOUT_CACHE: dict[tuple[str, str], str] = {}
_LAYOUT_LOCK = threading.Lock()


def write_partitioned(
    df: DataFrame, path: str, *, partition_by: list[str]
) -> None:
    """Materialize ``df`` as directory-partitioned parquet."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events re-materialized as ``event_date=yyyy-MM-dd/`` parquet
    directories, written once per (application, sf_dir) and read back
    through partition discovery. The returned frame carries the
    original columns plus the ``event_date`` partition string."""
    from .tables import load_table

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    with _LAYOUT_LOCK:
        path = _LAYOUT_CACHE.get(key)
        if path is None or not os.path.exists(path):
            path = f"/tmp/spark_graft_parts_{key[0]}_{uuid.uuid4().hex[:12]}"
            ev = load_table(spark, sf_dir, "events").withColumn(
                "event_date", F.date_format(F.to_date("ts"), "yyyy-MM-dd")
            )
            write_partitioned(ev, path, partition_by=["event_date"])
            _LAYOUT_CACHE[key] = path
    return spark.read.parquet(path)


_EVOLVED_CACHE: dict[tuple[str, str, str], str] = {}


def evolved_events(
    spark: SparkSession, sf_dir: str, *, cutover: str
) -> DataFrame:
    """Events as a two-generation parquet layout: rows with
    ``to_date(ts) < cutover`` are written WITHOUT the ``value`` column
    (the pre-evolution schema), the rest with it; read back through
    one ``mergeSchema`` scan, which null-fills the legacy files.
    Written once per (application, sf_dir, cutover) — same uuid-scoped
    concurrency discipline as :func:`partitioned_events`."""
    from .tables import load_table

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), cutover)
    with _LAYOUT_LOCK:
        path = _EVOLVED_CACHE.get(key)
        if path is None or not os.path.exists(path):
            path = f"/tmp/spark_graft_evo_{key[0]}_{uuid.uuid4().hex[:12]}"
            ev = load_table(spark, sf_dir, "events")
            cut = F.lit(cutover).cast("date")
            legacy = ev.filter(F.to_date("ts") < cut).drop("value")
            legacy.write.mode("overwrite").parquet(f"{path}/gen=1")
            ev.filter(F.to_date("ts") >= cut).write.mode("overwrite").parquet(
                f"{path}/gen=2"
            )
            _EVOLVED_CACHE[key] = path
    return spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=1", f"{path}/gen=2"
    )
