"""Round-12 fixes and operators: DV-mask basename matching (mixed
path spellings in one vector), RESTORE across empty snapshots, the
live_file_stats copy-out boundary, conditional MERGE, partitioned
shallow clone, and legacy change-file backfill."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources import txlog


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _register_source(spark):
    from onechronos_etl_takehome_spark.streaming.txlog_source import (
        TxlogStreamSource,
    )

    spark.dataSource.register(TxlogStreamSource)


# ---------------------------------------------------------------------------
# Advice fix (high): _dv_mask must match by basename whenever the read
# name is not a bare basename — one dv file can carry BOTH spellings of
# one data file (clone DV delete: new absolute-path positions unioned
# with carried source-relative rows), and the old exact-pass-first
# gating skipped the carried rows whenever the exact pass found any.
# ---------------------------------------------------------------------------


class TestDvMaskMixedSpellings:
    def test_both_spellings_in_one_vector_mask(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            _dv_mask,
        )

        root = str(tmp_path)
        absf = "/abs/elsewhere/src/part-deadbeef.parquet"
        rel = "part-deadbeef.parquet"
        pq.write_table(
            pa.table({"file": [absf, rel], "pos": [3, 1]}),
            os.path.join(root, "dv-1.parquet"),
        )
        dv = {"files": ["dv-1.parquet"]}
        # reading via the ABSOLUTE spelling (clone read): both the new
        # absolute row (pos 3) and the carried relative row (pos 1)
        # are dead — the regression masked only pos 3
        mask = _dv_mask(root, absf, dv, 5).to_pylist()
        assert mask == [True, False, True, False, True]
        # dir-qualified relative spelling (partitioned table) too
        mask = _dv_mask(root, "p=1/" + rel, dv, 5).to_pylist()
        assert mask == [True, False, True, False, True]
        # bare-basename read (unpartitioned non-clone): exact pushdown
        # path — clone-local files are only ever named by basename, so
        # a single spelling exists and it must still mask
        pq.write_table(
            pa.table({"file": [rel], "pos": [0]}),
            os.path.join(root, "dv-2.parquet"),
        )
        mask = _dv_mask(root, rel, {"files": ["dv-2.parquet"]}, 3)
        assert mask.to_pylist() == [False, True, True]

    def test_clone_dv_delete_format_reader_value_exact(
        self, spark, tmp_path
    ):
        """End-to-end: DV delete on a clone of a DV'd source, then the
        Python-datasource read must equal the JVM read VALUE-exactly
        (the resurrection was silent — counts could even collide)."""
        _register_source(spark)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        txlog.create_table(
            spark.range(1000).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ).coalesce(2),
            src,
        )
        txlog.delete_where(spark, src, F.col("k") % 10 == 0, mode="dv")
        txlog.shallow_clone(spark, src, dst)
        txlog.delete_where(spark, dst, F.col("k") % 7 == 0, mode="dv")
        jvm = txlog.read_table(spark, dst)
        fmt = spark.read.format("txlog").option("path", dst).load()
        assert fmt.exceptAll(jvm).count() == 0
        assert jvm.exceptAll(fmt).count() == 0
        expect = [i for i in range(1000) if i % 10 and i % 7]
        assert fmt.count() == len(expect)


# ---------------------------------------------------------------------------
# Advice fix (medium): RESTORE across EMPTY snapshots — undoing a
# delete-everything (current live set empty), and restoring TO an
# empty snapshot — both legitimate states read_table already handles.
# ---------------------------------------------------------------------------


class TestRestoreEmptySnapshots:
    def test_restore_past_delete_everything(self, spark, table):
        txlog.create_table(
            spark.range(100).select(F.col("id").alias("k")), table
        )
        txlog.delete_where(spark, table, F.lit(True))
        assert txlog.read_table(spark, table).count() == 0
        v = txlog.restore_table(spark, table, version=0)
        assert txlog.read_table(spark, table).count() == 100
        # the restore's change files carry exactly the resurrected rows
        feed = txlog.change_feed(spark, table, from_version=v - 1)
        ins = feed.filter("_change = 'insert'")
        assert ins.count() == 100 and feed.count() == 100

    def test_restore_to_empty_snapshot(self, spark, table):
        txlog.create_table(
            spark.range(50).select(F.col("id").alias("k")), table
        )
        txlog.delete_where(spark, table, F.lit(True))  # v1: empty
        txlog.append(
            spark.range(7).select(F.col("id").alias("k")), table
        )  # v2
        v = txlog.restore_table(spark, table, version=1)
        assert txlog.read_table(spark, table).count() == 0
        feed = txlog.change_feed(spark, table, from_version=v - 1)
        assert feed.filter("_change = 'delete'").count() == 7
        assert feed.count() == 7


# ---------------------------------------------------------------------------
# Advice fix (low): live_file_stats hands out a copy — mutating the
# result must not poison the shared fold cache.
# ---------------------------------------------------------------------------


class TestLiveFileStatsCopy:
    def test_caller_mutation_does_not_poison_cache(self, spark, table):
        txlog.create_table(
            spark.range(10).select(F.col("id").alias("k")), table
        )
        stats = txlog.live_file_stats(table)
        fname = next(iter(stats))
        import copy

        before = copy.deepcopy(stats)
        # hostile caller: clobber rows and the nested stats dict
        stats[fname]["rows"] = -999
        stats[fname]["stats"].clear()
        again = txlog.live_file_stats(table)
        assert again[fname]["rows"] == before[fname]["rows"]
        assert again[fname]["stats"] == before[fname]["stats"]
        # and the metadata-only count still agrees
        assert txlog.table_count(table) == 10
