"""Exactly-once streaming appends into the ACID table
(streaming/txlog_stream.py): batch-id idempotence in the commit log,
crash-orphan invisibility, and a live availableNow drain."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources import txlog
from onechronos_etl_takehome_spark.streaming.txlog_stream import (
    committed_batch_ids,
    process_txlog_batch,
    txlog_stream,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select("id", F.lit(tag).alias("tag"))


def test_batches_land_once_each(spark, table):
    for b in range(3):
        v = process_txlog_batch(_df(spark, b * 10, b * 10 + 10, f"b{b}"), b, table)
        assert v == b
    assert txlog.read_table(spark, table).count() == 30
    assert committed_batch_ids(table) == {0, 1, 2}


def test_replayed_batch_is_noop(spark, table):
    process_txlog_batch(_df(spark, 0, 10, "b0"), 0, table)
    process_txlog_batch(_df(spark, 10, 20, "b1"), 1, table)
    # at-least-once redelivery of batch 1 after a "crash"
    assert process_txlog_batch(_df(spark, 10, 20, "b1"), 1, table) is None
    assert txlog.committed_versions(table) == [0, 1]
    assert txlog.read_table(spark, table).count() == 20


def test_crash_orphans_invisible_and_vacuumable(spark, table):
    process_txlog_batch(_df(spark, 0, 10, "b0"), 0, table)
    # crashed attempt: data staged, commit never happened
    orphans = [f for f, *_ in txlog._stage_data(_df(spark, 90, 99, "lost"), table)]
    assert txlog.read_table(spark, table).count() == 10  # invisible
    process_txlog_batch(_df(spark, 10, 20, "b1"), 1, table)
    removed = txlog.vacuum(table, keep_versions=2, retention_seconds=0)
    assert set(orphans) <= set(removed)
    assert txlog.read_table(spark, table).count() == 20


def test_availablenow_stream_drains_exactly_once(spark, table, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 100).select(
        "id", (F.col("id") % 7).alias("grp")
    ).repartition(4).write.parquet(src)
    stream = spark.readStream.schema("id long, grp long").parquet(src)
    q = txlog_stream(stream, table).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert txlog.read_table(spark, table).count() == 100
    # restarting over the same checkpoint finds nothing new
    q2 = txlog_stream(
        spark.readStream.schema("id long, grp long").parquet(src), table
    ).option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    assert txlog.read_table(spark, table).count() == 100
    assert (
        txlog.read_table(spark, table).select("id").distinct().count() == 100
    )
