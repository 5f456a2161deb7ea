"""Partition-incremental ingestion: only new partitions are read,
re-runs are no-ops, and a crash before the ledger commit self-heals."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.pipeline.incremental import (
    _LEDGER,
    ingest_new_partitions,
    list_partitions,
)

SF_DIR = "/root/testdata/sf0.001"


def _write_source(spark, path, days):
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    day = F.date_format("o_orderdate", "yyyy-MM-dd")
    sliced = orders.withColumn("d", day).filter(F.col("d").isin(days))
    sliced.write.mode("overwrite").partitionBy("d").parquet(path)
    return sliced


def _days(spark, n):
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    return [
        r[0]
        for r in orders.select(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("d")
        )
        .distinct()
        .orderBy("d")
        .limit(n)
        .collect()
    ]


def test_incremental_processes_only_new_partitions(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    d1, d2, d3 = _days(spark, 3)

    _write_source(spark, src, [d1, d2])
    first = ingest_new_partitions(spark, src, dst, "d")
    assert sorted(first["processed"]) == sorted([d1, d2])
    assert list_partitions(dst, "d") == sorted([d1, d2])

    # Re-run with no new data: nothing read, nothing written.
    rerun = ingest_new_partitions(spark, src, dst, "d")
    assert rerun["processed"] == [] and rerun["skipped_existing"]

    # A third day arrives: only it is processed; earlier output intact.
    _write_source(spark, src, [d1, d2, d3])
    second = ingest_new_partitions(spark, src, dst, "d")
    assert second["processed"] == [d3]
    out = spark.read.parquet(dst)
    src_df = spark.read.parquet(src)
    assert out.count() == src_df.count()
    assert out.exceptAll(src_df).count() == 0


def test_incremental_applies_transform_and_partition_prunes(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    d1, d2 = _days(spark, 2)
    _write_source(spark, src, [d1, d2])

    def daily_rollup(df):
        return df.groupBy("d", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders")
        )

    ingest_new_partitions(spark, src, dst, "d", transform=daily_rollup)
    out = spark.read.parquet(dst)
    assert set(out.columns) == {"d", "o_orderpriority", "n_orders"}
    # The pruned scan only lists the new partitions.
    plan = (
        spark.read.parquet(src)
        .filter(F.col("d").isin([d1]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_crash_before_ledger_commit_self_heals(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    d1, d2 = _days(spark, 2)
    _write_source(spark, src, [d1, d2])
    ingest_new_partitions(spark, src, dst, "d")

    # Simulate a crash that wrote data but lost the ledger entry for d2.
    ledger = os.path.join(dst, _LEDGER)
    with open(ledger) as f:
        lines = [line for line in f if line.strip() != d2]
    with open(ledger, "w") as f:
        f.writelines(lines)

    # Re-run: d2 is re-processed (dynamic overwrite), not duplicated.
    redo = ingest_new_partitions(spark, src, dst, "d")
    assert redo["processed"] == [d2]
    out = spark.read.parquet(dst)
    assert out.count() == spark.read.parquet(src).count()
