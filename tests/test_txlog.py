"""ACID table format (sources/txlog.py): commit protocol, snapshot
isolation, copy-on-write file granularity, optimistic concurrency,
vacuum, and schema evolution across commits."""

from __future__ import annotations

import json
import os
import tempfile
import threading

import pytest

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources import txlog


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


class TestCommitProtocol:
    def test_create_append_versions(self, spark, table):
        assert txlog.create_table(_df(spark, 0, 10, "a"), table) == 0
        assert txlog.append(_df(spark, 10, 15, "b"), table) == 1
        assert txlog.committed_versions(table) == [0, 1]
        assert txlog.read_table(spark, table).count() == 15
        assert txlog.read_table(spark, table, version=0).count() == 10

    def test_create_twice_fails(self, spark, table):
        txlog.create_table(_df(spark, 0, 5, "a"), table)
        with pytest.raises(ValueError, match="already exists"):
            txlog.create_table(_df(spark, 0, 5, "a"), table)

    def test_same_version_commit_conflicts(self, spark, table):
        txlog.create_table(_df(spark, 0, 5, "a"), table)
        txlog._commit(table, 1, [])
        with pytest.raises(txlog.CommitConflict):
            txlog._commit(table, 1, [])

    def test_two_writer_append_race_both_land(self, spark, table):
        txlog.create_table(_df(spark, 0, 5, "seed"), table)
        errs: list[Exception] = []

        def writer(lo: int) -> None:
            try:
                txlog.append(_df(spark, lo, lo + 100, f"w{lo}"), table)
            except Exception as e:  # pragma: no cover - failure detail
                errs.append(e)

        ts = [threading.Thread(target=writer, args=(lo,)) for lo in (1000, 2000)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        # both commits landed at distinct versions and all rows read back
        assert txlog.committed_versions(table) == [0, 1, 2]
        got = {
            r["tag"]
            for r in txlog.read_table(spark, table).select("tag").distinct().collect()
        }
        assert got == {"seed", "w1000", "w2000"}


class TestCopyOnWrite:
    def test_delete_rewrites_only_touched_files(self, spark, table):
        # two appends with disjoint predicates → the delete must carry
        # the untouched append's files BY REFERENCE (same file names)
        txlog.create_table(_df(spark, 0, 50, "keep"), table)
        txlog.append(_df(spark, 100, 150, "drop"), table)
        before = set(txlog.live_files(table))
        keep_files = {
            f
            for f in before
            # provenance: which live files hold only 'keep' rows
            if spark.read.parquet(os.path.join(table, f))
            .filter(F.col("tag") == "drop")
            .count()
            == 0
        }
        assert keep_files, "fixture must produce at least one untouched file"
        txlog.delete_where(spark, table, F.col("tag") == "drop")
        after = set(txlog.live_files(table))
        assert keep_files <= after, "untouched files must carry by reference"
        assert txlog.read_table(spark, table).count() == 50
        assert (
            txlog.read_table(spark, table)
            .filter(F.col("tag") == "drop")
            .count()
            == 0
        )

    def test_snapshot_isolation_under_delete(self, spark, table):
        txlog.create_table(_df(spark, 0, 30, "a"), table)
        v1 = txlog.append(_df(spark, 30, 60, "b"), table)
        txlog.delete_where(spark, table, F.col("id") % 2 == 0)
        # the pre-delete snapshot still reads complete
        assert txlog.read_table(spark, table, version=v1).count() == 60
        assert txlog.read_table(spark, table).count() == 30

    def test_delete_no_matches_is_cheap_noop_commit(self, spark, table):
        txlog.create_table(_df(spark, 0, 10, "a"), table)
        v = txlog.delete_where(spark, table, F.col("id") > 999)
        with open(
            os.path.join(table, txlog._LOG_DIR, f"{v:08d}.json")
        ) as f:
            manifest = json.load(f)
        assert manifest["actions"] == []
        assert txlog.read_table(spark, table).count() == 10


class TestMerge:
    def test_merge_semantics_update_insert_passthrough(self, spark, table):
        txlog.create_table(_df(spark, 0, 20, "old"), table)
        updates = spark.createDataFrame(
            [(5, "upd"), (15, "upd"), (100, "ins")], "id long, tag string"
        )
        txlog.merge_upsert(spark, table, updates, ["id"])
        rows = {r["id"]: r["tag"] for r in txlog.read_table(spark, table).collect()}
        assert len(rows) == 21
        assert rows[5] == "upd" and rows[15] == "upd" and rows[100] == "ins"
        assert rows[0] == "old" and rows[19] == "old"

    def test_merge_null_in_update_wins(self, spark, table):
        txlog.create_table(_df(spark, 0, 5, "old"), table)
        updates = spark.createDataFrame(
            [(2, None)], "id long, tag string"
        )
        txlog.merge_upsert(spark, table, updates, ["id"])
        rows = {r["id"]: r["tag"] for r in txlog.read_table(spark, table).collect()}
        assert rows[2] is None and rows[1] == "old"

    def test_merge_rewrites_only_files_with_matched_keys(self, spark, table):
        # key-range-split appends: updates touch only range B → range
        # A's files must carry by reference (exact same names)
        txlog.create_table(_df(spark, 0, 50, "A"), table)
        txlog.append(_df(spark, 1000, 1050, "B"), table)
        before = set(txlog.live_files(table))
        a_files = {
            f
            for f in before
            if spark.read.parquet(os.path.join(table, f))
            .filter(F.col("id") >= 1000)
            .count()
            == 0
        }
        assert a_files, "fixture must isolate range A in its own files"
        updates = spark.createDataFrame(
            [(1005, "upd"), (1010, "upd")], "id long, tag string"
        )
        txlog.merge_upsert(spark, table, updates, ["id"])
        after = set(txlog.live_files(table))
        assert a_files <= after, "untouched range A files must survive"
        rows = {r["id"]: r["tag"] for r in txlog.read_table(spark, table).collect()}
        assert rows[1005] == "upd" and rows[1010] == "upd"
        assert len(rows) == 100

    def test_merge_is_one_commit_and_time_travels(self, spark, table):
        txlog.create_table(_df(spark, 0, 10, "old"), table)
        base = txlog.committed_versions(table)[-1]
        updates = spark.createDataFrame([(3, "upd")], "id long, tag string")
        v = txlog.merge_upsert(spark, table, updates, ["id"])
        assert v == base + 1
        pre = {r["id"]: r["tag"] for r in
               txlog.read_table(spark, table, version=base).collect()}
        assert pre[3] == "old"  # snapshot isolation across the MERGE


class TestMaintenance:
    def test_vacuum_drops_unreachable_keeps_retained(self, spark, table):
        txlog.create_table(_df(spark, 0, 40, "a"), table)
        txlog.append(_df(spark, 40, 80, "b"), table)
        txlog.delete_where(spark, table, F.col("tag") == "a")  # v2
        txlog.delete_where(spark, table, F.col("id") % 2 == 0)  # v3
        removed = txlog.vacuum(table, keep_versions=2)
        # v0's files (all 'a') are unreachable from v2/v3 → removed
        assert removed
        for v in (2, 3):
            txlog.read_table(spark, table, version=v).count()  # still reads
        with pytest.raises(Exception):
            # v1 references vacuumed files — reading it now fails loudly
            txlog.read_table(spark, table, version=1).count()

    def test_schema_evolution_across_commits(self, spark, table):
        txlog.create_table(_df(spark, 0, 5, "a"), table)
        txlog.append(
            spark.range(5, 8).select(
                "id", F.lit("b").alias("tag"), F.lit(1.5).alias("score")
            ),
            table,
        )
        rows = {
            r["id"]: r for r in txlog.read_table(spark, table).collect()
        }
        assert rows[0]["score"] is None  # old files NULL-fill
        assert rows[6]["score"] == 1.5

    def test_manifest_rows_match_footers(self, spark, table):
        txlog.create_table(_df(spark, 0, 25, "a"), table)
        assert sum(txlog.live_files(table).values()) == 25

    def test_checkpoint_fold_equals_full_fold(self, spark, table, monkeypatch):
        # tight interval so the test crosses two checkpoint boundaries
        monkeypatch.setattr(txlog, "CHECKPOINT_INTERVAL", 3)
        txlog.create_table(_df(spark, 0, 5, "v0"), table)
        for v in range(1, 8):
            txlog.append(_df(spark, v * 10, v * 10 + 5, f"v{v}"), table)
        assert os.path.exists(txlog._checkpoint_path(table, 3))
        assert os.path.exists(txlog._checkpoint_path(table, 6))
        # checkpointed resolution must equal the raw manifest fold at
        # EVERY version (pre-, at-, and post-checkpoint)
        for v in range(8):
            assert txlog.live_files(table, version=v) == txlog._fold_live_raw(
                table, v
            ), v
        assert txlog.read_table(spark, table).count() == 40

    def test_checkpoint_loss_is_harmless(self, spark, table, monkeypatch):
        monkeypatch.setattr(txlog, "CHECKPOINT_INTERVAL", 2)
        txlog.create_table(_df(spark, 0, 5, "a"), table)
        for v in range(1, 5):
            txlog.append(_df(spark, v * 10, v * 10 + 5, f"v{v}"), table)
        before = txlog.live_files(table)
        for v in (2, 4):
            os.unlink(txlog._checkpoint_path(table, v))
        assert txlog.live_files(table) == before  # falls back to raw fold


class TestCompaction:
    def test_compact_merges_small_files_one_commit(self, spark, table):
        txlog.create_table(_df(spark, 0, 10, "a"), table)
        for v in range(1, 6):
            txlog.append(_df(spark, v * 100, v * 100 + 10, f"v{v}"), table)
        base = txlog.committed_versions(table)[-1]
        n_before = len(txlog.live_files(table))
        rows_before = sorted(
            map(tuple, txlog.read_table(spark, table).collect())
        )
        v = txlog.compact(spark, table, target_bytes=64 * 1024 * 1024)
        assert v == base + 1  # exactly one commit
        assert len(txlog.live_files(table)) < n_before
        assert (
            sorted(map(tuple, txlog.read_table(spark, table).collect()))
            == rows_before
        )
        # time travel past the OPTIMIZE still sees the small files
        assert len(txlog.live_files(table, version=base)) == n_before

    def test_compact_noop_when_nothing_qualifies(self, spark, table):
        txlog.create_table(_df(spark, 0, 10, "a"), table)
        assert txlog.compact(spark, table, target_bytes=1) is None
