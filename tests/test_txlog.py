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

    def test_delete_null_predicate_rows_survive(self, spark, table):
        # SQL DELETE drops rows whose predicate IS TRUE; NULL-valued
        # predicates keep the row — including inside a rewritten file
        # (the 3VL trap: plain ~cond is NULL there and drops the row)
        df = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, None)], "id long, tag string"
        ).coalesce(1)  # force all rows into ONE rewritten file
        txlog.create_table(df, table)
        txlog.delete_where(spark, table, F.col("tag") == "x")
        rows = sorted(
            (r["id"], r["tag"])
            for r in txlog.read_table(spark, table).collect()
        )
        assert rows == [(2, "y"), (3, None)]

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


class TestDataSkipping:
    def test_manifest_stats_cover_columns(self, spark, table):
        txlog.create_table(
            spark.range(0, 100).select(
                "id", (F.col("id") * 2).alias("v"), F.lit("t").alias("s")
            ),
            table,
        )
        infos = list(txlog.live_file_stats(table).values())
        assert all("id" in i["stats"] and "v" in i["stats"] for i in infos)
        # files partition the range; their stats union must cover it
        assert min(i["stats"]["id"][0] for i in infos) == 0
        assert max(i["stats"]["id"][1] for i in infos) == 99

    def test_clustered_table_prunes_and_matches_full_scan(self, spark, table):
        df = spark.range(0, 10_000).select(
            "id", (F.col("id") % 97).alias("grp")
        )
        txlog.create_table(df, table, cluster_by="id")
        n_files = len(txlog.live_files(table))
        assert n_files > 4, "range clustering must split into many files"
        kept, pruned = txlog.skipped_files(table, {"id": (2000, 2499)})
        assert pruned, "a narrow range must prune most files"
        assert len(kept) <= max(2, n_files // 4)
        # pruned scan + filter == full scan + filter, row for row
        bounds = (F.col("id") >= 2000) & (F.col("id") <= 2499)
        a = sorted(
            map(
                tuple,
                txlog.read_table(spark, table, skip_where={"id": (2000, 2499)})
                .filter(bounds)
                .collect(),
            )
        )
        b = sorted(
            map(tuple, txlog.read_table(spark, table).filter(bounds).collect())
        )
        assert a == b and len(a) == 500
        # provenance: the pruned read really opened only the kept files
        opened = {
            os.path.basename(r["f"])
            for r in txlog.read_table(
                spark, table, skip_where={"id": (2000, 2499)}
            )
            .select(
                F.element_at(
                    F.split(F.input_file_name(), "/"), -1
                ).alias("f")
            )
            .distinct()
            .collect()
        }
        assert opened <= set(kept)

    def test_unclustered_column_is_kept_conservatively(self, spark, table):
        # grp is uncorrelated with the id clustering → every file's
        # grp range spans [0, 96] and nothing can prune; correctness
        # must hold anyway (skipping is conservative, never lossy)
        df = spark.range(0, 5_000).select("id", (F.col("id") % 97).alias("grp"))
        txlog.create_table(df, table, cluster_by="id")
        kept, pruned = txlog.skipped_files(table, {"grp": (10, 11)})
        assert not pruned
        got = (
            txlog.read_table(spark, table, skip_where={"grp": (10, 11)})
            .filter((F.col("grp") >= 10) & (F.col("grp") <= 11))
            .count()
        )
        assert got == 104  # 52 ids per grp value x 2

    def test_all_files_pruned_yields_empty_with_schema(self, spark, table):
        txlog.create_table(
            spark.range(0, 100).select("id"), table, cluster_by="id"
        )
        out = txlog.read_table(spark, table, skip_where={"id": (10**9, None)})
        assert out.columns == ["id"] and out.count() == 0

    def test_timestamp_stats_present_and_prune(self, spark, table):
        # Spark's default INT96 parquet timestamps carry NO footer
        # stats — _stage_data must write TIMESTAMP_MICROS or date
        # ranges silently never prune (the x36 regression this round)
        df = spark.range(0, 1000).selectExpr(
            "id", "timestamp_seconds(800000000 + id * 3600) AS ts"
        )
        txlog.create_table(df, table, cluster_by="ts", cluster_files=8)
        infos = txlog.live_file_stats(table).values()
        assert all("ts" in i["stats"] for i in infos)
        kept, pruned = txlog.skipped_files(
            table, {"ts": ("1995-06-01", "1995-06-10")}
        )
        assert pruned and len(kept) <= 3

    def test_zorder_compact_prunes_on_both_dims(self, spark, table):
        # two anti-correlated dims: a linear sort on `a` would leave
        # every file spanning all of `b`; the Morton layout must give
        # nonzero pruning on BOTH from one rewrite
        df = spark.range(0, 20_000).select(
            F.col("id").alias("a"), (19_999 - F.col("id")).alias("b")
        )
        txlog.create_table(df, table)
        v = txlog.compact(
            spark, table, zorder_by=["a", "b"], zorder_files=16,
            target_bytes=1,
        )
        assert v is not None
        for col in ("a", "b"):
            kept, pruned = txlog.skipped_files(table, {col: (4000, 4999)})
            assert pruned, f"no pruning on {col}"
            got = (
                txlog.read_table(spark, table, skip_where={col: (4000, 4999)})
                .filter((F.col(col) >= 4000) & (F.col(col) <= 4999))
                .count()
            )
            assert got == 1000
        # the rewrite is one commit and CDF-invisible
        feed = txlog.change_feed(spark, table, from_version=v - 1)
        assert feed.count() == 0

    def test_skipping_survives_dml(self, spark, table):
        # stats must stay correct through append/delete rewrites
        txlog.create_table(
            spark.range(0, 1000).select("id"), table, cluster_by="id"
        )
        txlog.append(
            spark.range(5000, 6000).select("id"), table, cluster_by="id"
        )
        txlog.delete_where(spark, table, F.col("id") % 2 == 1)
        kept, pruned = txlog.skipped_files(table, {"id": (5000, 5099)})
        assert pruned, "old-range files must prune after DML"
        got = (
            txlog.read_table(spark, table, skip_where={"id": (5000, 5099)})
            .filter((F.col("id") >= 5000) & (F.col("id") <= 5099))
            .count()
        )
        assert got == 50  # evens only


class TestChangeFeed:
    def test_append_and_delete_changes_surface_exactly(self, spark, table):
        txlog.create_table(_df(spark, 0, 30, "a"), table)
        txlog.append(_df(spark, 30, 40, "b"), table)  # v1
        txlog.delete_where(spark, table, F.col("id") < 5)  # v2 (CoW)
        feed = txlog.change_feed(spark, table, from_version=0).collect()
        got = {(r["_version"], r["_change"], r["id"]) for r in feed}
        want = {(1, "insert", i) for i in range(30, 40)} | {
            (2, "delete", i) for i in range(5)
        }
        # the delete's carried-over survivors (ids 5..29 rewritten
        # into new files) must CANCEL, never appear as churn
        assert got == want

    def test_merge_shows_delete_plus_insert(self, spark, table):
        txlog.create_table(_df(spark, 0, 10, "old"), table)
        updates = spark.createDataFrame([(3, "upd")], "id long, tag string")
        txlog.merge_upsert(spark, table, updates, ["id"])
        feed = txlog.change_feed(spark, table, from_version=0).collect()
        got = {(r["_change"], r["id"], r["tag"]) for r in feed}
        assert got == {("delete", 3, "old"), ("insert", 3, "upd")}

    def test_compaction_is_cdf_invisible(self, spark, table):
        txlog.create_table(_df(spark, 0, 10, "a"), table)
        for v in range(1, 4):
            txlog.append(_df(spark, v * 10, v * 10 + 10, "a"), table)
        base = txlog.committed_versions(table)[-1]
        assert txlog.compact(spark, table, target_bytes=64 * 1024 * 1024)
        feed = txlog.change_feed(spark, table, from_version=base)
        assert feed.count() == 0  # a pure rewrite is not a change

    def test_incremental_consumer_sees_each_batch_once(self, spark, table):
        txlog.create_table(_df(spark, 0, 10, "a"), table)
        seen: set[int] = set()
        last = 0
        for lo in (100, 200):
            txlog.append(_df(spark, lo, lo + 10, "inc"), table)
            newest = txlog.committed_versions(table)[-1]
            rows = txlog.change_feed(
                spark, table, from_version=last, to_version=newest
            ).collect()
            assert all(r["_change"] == "insert" for r in rows)
            ids = {r["id"] for r in rows}
            assert not (ids & seen)
            seen |= ids
            last = newest
        assert seen == set(range(100, 110)) | set(range(200, 210))


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
            assert txlog.live_file_stats(
                table, version=v
            ) == txlog._fold_live_raw(table, v), v
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
