"""Round-10 operators and fixes: null-safe-equality pruning exactness
(round-10 advice, high), constraint re-validation under commit races,
the change-data-feed stream (readChangeFeed), LIKE-prefix pruning,
protocol versioning, column mapping, and SQL over registered txlog
tables."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources import constraints as C2
from onechronos_etl_takehome_spark.sources import pruning as P
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
# Advice fix 1 (high): NOT (c <=> v) must not prune null-bearing files
# ---------------------------------------------------------------------------


class TestNullSafeEqualityPruning:
    FILE_5_WITH_NULLS = {
        "rows": 10, "stats": {"c": [5, 5]}, "nulls": {"c": 3},
    }
    FILE_5_NO_NULLS = {
        "rows": 10, "stats": {"c": [5, 5]}, "nulls": {"c": 0},
    }

    def test_not_eqnullsafe_keeps_null_bearing_constant_file(self):
        # the advice repro: NULL rows satisfy NOT (c <=> 5); a file
        # with min==max==5 AND nulls MUST stay
        node = P.parse_predicate("NOT (c <=> 5)")
        assert P.may_match(node, self.FILE_5_WITH_NULLS)
        # ...while the all-5s no-null file has no TRUE row: prune
        assert not P.may_match(node, self.FILE_5_NO_NULLS)

    def test_eqnullsafe_positive_still_prunes(self):
        node = P.parse_predicate("c <=> 5")
        assert P.may_match(node, self.FILE_5_NO_NULLS)
        off_range = {"rows": 4, "stats": {"c": [7, 9]}, "nulls": {"c": 0}}
        assert not P.may_match(node, off_range)
        all_null = {"rows": 4, "stats": {}, "nulls": {"c": 4}}
        assert not P.may_match(node, all_null)  # isnotnull conjunct

    def test_eqnullsafe_null_literal_negation(self):
        # c <=> NULL == c IS NULL; its negation keeps non-null files
        assert P.may_match(
            P.parse_predicate("c <=> NULL"), self.FILE_5_WITH_NULLS
        )
        assert not P.may_match(
            P.parse_predicate("c <=> NULL"), self.FILE_5_NO_NULLS
        )
        neg = P.parse_predicate("NOT (c <=> NULL)")
        all_null = {"rows": 3, "stats": {}, "nulls": {"c": 3}}
        assert P.may_match(neg, self.FILE_5_WITH_NULLS)
        assert not P.may_match(neg, all_null)

    def test_format_reader_filter_path(self):
        # advice fix 2 (medium): the V2 pushdown path takes the same
        # lowering — Not(EqualNullSafe) keeps null-bearing files
        from pyspark.sql.datasource import EqualNullSafe, Not

        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            _filter_to_node,
        )

        node = _filter_to_node(Not(EqualNullSafe(("c",), 5)))
        assert P.may_match(node, self.FILE_5_WITH_NULLS)
        assert not P.may_match(node, self.FILE_5_NO_NULLS)
        pos = _filter_to_node(EqualNullSafe(("c",), 5))
        assert P.may_match(pos, self.FILE_5_NO_NULLS)
        all_null = {"rows": 4, "stats": {}, "nulls": {"c": 4}}
        assert not P.may_match(pos, all_null)

    def test_column_front_end(self, spark):
        # eqNullSafe through the Catalyst walk compiles (not UNKNOWN)
        # and carries the isnotnull conjunct through negation
        node = P.node_from_column(spark, ~F.col("c").eqNullSafe(F.lit(5)))
        if isinstance(node, P.Unknown):
            pytest.skip("session cannot walk Catalyst expressions")
        assert P.may_match(node, self.FILE_5_WITH_NULLS)
        assert not P.may_match(node, self.FILE_5_NO_NULLS)

    def test_end_to_end_read_table(self, spark, table):
        # one file holds {5,5,NULL}: NOT (c <=> 5) must return the
        # NULL row even though the file's min==max==5
        df = spark.createDataFrame(
            [(5,), (5,), (None,)], "c int"
        ).coalesce(1)
        txlog.create_table(df, table)
        out = txlog.read_table(
            spark, table, where="NOT (c <=> 5)"
        ).collect()
        assert len(out) == 1 and out[0]["c"] is None

    def test_validate_arrow_null_row_violates(self):
        # advice fix 3 (medium): a NULL row is a DEFINITE violation of
        # CHECK (c <=> 5) — FALSE, not UNKNOWN — on the Arrow path,
        # matching txlog.append's Spark-side semantics
        import pyarrow as pa

        good = pa.table({"c": pa.array([5, 5], type=pa.int64())})
        C2.validate_arrow(good, {"chk": "c <=> 5"})  # no raise
        bad = pa.table({"c": pa.array([5, None], type=pa.int64())})
        with pytest.raises(C2.ConstraintViolation, match="chk"):
            C2.validate_arrow(bad, {"chk": "c <=> 5"})

    def test_spark_and_arrow_paths_agree(self, spark):
        # c <=> 5 is FALSE for a NULL row on BOTH validation paths
        df = spark.createDataFrame([(5,), (None,)], "c int")
        assert C2.count_violations(df, {"chk": "c <=> 5"}) == {"chk": 1}


# ---------------------------------------------------------------------------
# Advice fix 4 (low): append re-validates constraints after losing a
# commit race to a concurrent ADD CONSTRAINT
# ---------------------------------------------------------------------------


class TestAppendConstraintRace:
    def _race_once(self, spark, table, monkeypatch, expr: str):
        """Make the append's FIRST commit attempt lose to a concurrent
        add_constraint, forcing the retry path."""
        orig = txlog._commit
        state = {"raced": False}

        def racing(path, version, actions, extra=None):
            if (
                not state["raced"]
                and extra
                and extra.get("metrics", {}).get("op") == "append"
            ):
                state["raced"] = True
                C2.add_constraint(spark, table, "c_small", expr)
                raise txlog.CommitConflict("simulated lost race")
            return orig(path, version, actions, extra=extra)

        monkeypatch.setattr(txlog, "_commit", racing)

    def test_violating_append_blocked_after_race(
        self, spark, table, monkeypatch
    ):
        txlog.create_table(
            spark.range(5).select(F.col("id").alias("c")), table
        )
        self._race_once(spark, table, monkeypatch, "c < 100")
        bad = spark.createDataFrame([(500,)], "c long")
        with pytest.raises(C2.ConstraintViolation, match="c_small"):
            txlog.append(bad, table)
        # nothing landed: table still holds exactly the seed rows
        assert txlog.read_table(spark, table).count() == 5

    def test_conforming_append_survives_race(
        self, spark, table, monkeypatch
    ):
        txlog.create_table(
            spark.range(5).select(F.col("id").alias("c")), table
        )
        self._race_once(spark, table, monkeypatch, "c < 100")
        txlog.append(spark.createDataFrame([(50,)], "c long"), table)
        got = sorted(
            r["c"] for r in txlog.read_table(spark, table).collect()
        )
        assert got == [0, 1, 2, 3, 4, 50]
        # the add-constraint commit interleaved BEFORE the append
        ops = [
            m.get("metrics", {}).get("op")
            for m in (
                json.load(
                    open(os.path.join(txlog._log_path(table), f))
                )
                for f in sorted(os.listdir(txlog._log_path(table)))
                if f.endswith(".json")
            )
        ]
        assert ops == ["create", "add-constraint", "append"]


# ---------------------------------------------------------------------------
# readChangeFeed: DML commits consumable as a STREAM (round-9 verdict
# item 2) and as a batch format read
# ---------------------------------------------------------------------------


class TestChangeDataFeedStream:
    def _lifecycle(self, spark, table):
        """create / append / CoW delete / merge — one commit each."""
        txlog.create_table(
            spark.range(10).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            table,
        )
        txlog.append(
            spark.range(10, 15).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            table,
        )
        txlog.delete_where(spark, table, F.col("k") % 3 == 0)
        txlog.merge_upsert(
            spark,
            table,
            spark.createDataFrame([(1, 999), (100, 1000)], "k long, v long"),
            ["k"],
        )

    def _drain(self, spark, table, out, ck, available_now=True, **opts):
        reader = (
            spark.readStream.format("txlog")
            .option("path", table)
            .option("readChangeFeed", "true")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        w = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
        )
        if available_now:
            q = w.trigger(availableNow=True).start()
            assert q.awaitTermination(300), "CDF drain timed out"
        else:
            q = w.start()
            q.processAllAvailable()
            q.stop()
        return q

    def test_streamed_feed_matches_batch_change_feed(
        self, spark, table, tmp_path
    ):
        _register_source(spark)
        self._lifecycle(spark, table)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, table, out, ck)
        streamed = spark.read.parquet(out)
        # full-history stream == v0 rows as inserts + batch feed (0, 3]
        batch = txlog.change_feed(spark, table, from_version=0)
        tail = streamed.filter(F.col("_version") > 0)
        assert tail.exceptAll(batch).count() == 0
        assert batch.exceptAll(tail).count() == 0
        v0 = streamed.filter(F.col("_version") == 0)
        assert v0.filter(F.col("_change") != "insert").count() == 0
        base = txlog.read_table(spark, table, version=0).select("k", "v")
        assert v0.select("k", "v").exceptAll(base).count() == 0
        assert base.exceptAll(v0.select("k", "v")).count() == 0

    def test_restart_delivers_nothing_then_only_new_commits(
        self, spark, table, tmp_path
    ):
        _register_source(spark)
        self._lifecycle(spark, table)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, table, out, ck)
        n1 = spark.read.parquet(out).count()
        # restart with nothing new: zero re-delivery
        self._drain(spark, table, out, ck)
        assert spark.read.parquet(out).count() == n1
        # one more delete commit: exactly its changes arrive
        txlog.delete_where(spark, table, F.col("k") == 2)
        self._drain(spark, table, out, ck)
        got = spark.read.parquet(out)
        new = got.filter(F.col("_version") == 4)
        assert got.count() == n1 + 1
        rows = new.collect()
        assert len(rows) == 1
        assert rows[0]["_change"] == "delete" and rows[0]["k"] == 2

    def test_rate_limited_drain_is_feed_exact(self, spark, table, tmp_path):
        _register_source(spark)
        self._lifecycle(spark, table)
        out1, ck1 = str(tmp_path / "o1"), str(tmp_path / "c1")
        self._drain(spark, table, out1, ck1)
        unlimited = spark.read.parquet(out1)
        out2, ck2 = str(tmp_path / "o2"), str(tmp_path / "c2")
        q = self._drain(
            spark, table, out2, ck2, available_now=False,
            maxFilesPerTrigger="1",
        )
        limited = spark.read.parquet(out2)
        assert limited.exceptAll(unlimited).count() == 0
        assert unlimited.exceptAll(limited).count() == 0
        batches = [
            p for p in q.recentProgress if int(p["numInputRows"]) > 0
        ]
        assert len(batches) >= 3  # bounded, not one giant batch

    def test_optimize_is_cdf_invisible(self, spark, table, tmp_path):
        """A compaction rewrite adds and removes the SAME multiset —
        the table-format contract: zero CDF rows."""
        _register_source(spark)
        txlog.create_table(spark.range(10).repartition(4), table)
        txlog.append(spark.range(10, 20).repartition(4), table)
        assert txlog.compact(spark, table) is not None  # 8 sliver files
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, table, out, ck)
        got = spark.read.parquet(out)
        compaction_v = txlog.committed_versions(table)[-1]
        assert got.filter(F.col("_version") == compaction_v).count() == 0
        assert got.filter(F.col("_change") == "delete").count() == 0
        assert got.count() == 20

    def test_mutually_exclusive_with_skip_change_commits(
        self, spark, table, tmp_path
    ):
        _register_source(spark)
        txlog.create_table(spark.range(5), table)
        q = (
            spark.readStream.format("txlog")
            .option("path", table)
            .option("readChangeFeed", "true")
            .option("skipChangeCommits", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        from pyspark.errors import StreamingQueryException

        with pytest.raises(StreamingQueryException, match="exclusive"):
            q.awaitTermination(120)

    def test_batch_cdf_with_version_bounds(self, spark, table):
        _register_source(spark)
        self._lifecycle(spark, table)

        def fmt(**opts):
            r = (
                spark.read.format("txlog")
                .option("path", table)
                .option("readChangeFeed", "true")
            )
            for k, v in opts.items():
                r = r.option(k, v)
            return r.load()

        # [2, 3] (startingVersion INCLUSIVE, Delta's semantics) ==
        # batch change_feed over (1, 3]
        got = fmt(startingVersion="2", endingVersion="3")
        want = txlog.change_feed(
            spark, table, from_version=1, to_version=3
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # schema carries the meta columns first
        assert got.columns[:2] == ["_version", "_change"]
        # full history: v0 inserts present
        assert (
            fmt().filter("_version = 0 AND _change = 'insert'").count()
            == 10
        )

    def test_cdf_aligns_evolved_schema(self, spark, table, tmp_path):
        """Old files lack the evolved column: CDF rows from them must
        null-fill it, tagged with their own commit version."""
        _register_source(spark)
        txlog.create_table(
            spark.range(3).select(F.col("id").alias("k")), table
        )
        txlog.append(
            spark.range(3, 5).select(
                F.col("id").alias("k"), F.lit("new").alias("tag")
            ),
            table,
        )
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, table, out, ck)
        got = spark.read.parquet(out)
        assert set(got.columns) == {"_version", "_change", "k", "tag"}
        assert got.filter("_version = 0 AND tag IS NOT NULL").count() == 0
        assert got.filter("_version = 1 AND tag = 'new'").count() == 2


# ---------------------------------------------------------------------------
# Protocol versioning (round-9 verdict item 3): feature-unaware
# writers/readers must refuse, not silently bypass
# ---------------------------------------------------------------------------


class TestProtocolVersioning:
    def _doctor(self, table, *, reader=None, writer=None):
        """Append a manifest requiring a higher protocol — what a
        newer engine would leave behind."""
        v = txlog.committed_versions(table)[-1] + 1
        proto = txlog.table_protocol(table)
        if reader is not None:
            proto["min_reader_version"] = reader
        if writer is not None:
            proto["min_writer_version"] = writer
        txlog._commit(
            table, v, [],
            extra={"protocol": proto, "metrics": {"op": "upgrade"}},
        )

    def test_default_protocol_is_1_1(self, spark, table):
        txlog.create_table(spark.range(5), table)
        assert txlog.table_protocol(table) == {
            "min_reader_version": 1,
            "min_writer_version": 1,
        }

    def test_feature_newer_table_refuses_every_write_path(
        self, spark, table, tmp_path
    ):
        _register_source(spark)
        txlog.create_table(
            spark.range(5).select(F.col("id").alias("c")), table
        )
        self._doctor(table, writer=txlog.SUPPORTED_WRITER_VERSION + 1)
        df = spark.createDataFrame([(9,)], "c long")
        with pytest.raises(txlog.ProtocolError, match="min_writer"):
            txlog.append(df, table)
        with pytest.raises(txlog.ProtocolError, match="min_writer"):
            txlog.delete_where(spark, table, F.col("c") == 1)
        with pytest.raises(txlog.ProtocolError, match="min_writer"):
            txlog.merge_upsert(spark, table, df, ["c"])
        with pytest.raises(txlog.ProtocolError, match="min_writer"):
            txlog.compact(spark, table)
        with pytest.raises(txlog.ProtocolError, match="min_writer"):
            C2.add_constraint(spark, table, "c_pos", "c >= 0")
        with pytest.raises(Exception, match="min_writer"):
            df.write.format("txlog").option("path", table).mode(
                "append"
            ).save()
        # nothing landed through any path
        base = txlog.committed_versions(table)[-1]
        assert txlog.read_table(spark, table).count() == 5
        assert txlog.committed_versions(table)[-1] == base

    def test_feature_newer_table_refuses_reads(self, spark, table):
        _register_source(spark)
        txlog.create_table(spark.range(5), table)
        self._doctor(table, reader=txlog.SUPPORTED_READER_VERSION + 1)
        with pytest.raises(txlog.ProtocolError, match="min_reader"):
            txlog.read_table(spark, table)
        with pytest.raises(txlog.ProtocolError, match="min_reader"):
            txlog.change_feed(spark, table, from_version=0)
        with pytest.raises(txlog.ProtocolError, match="min_reader"):
            txlog.table_count(table)
        with pytest.raises(Exception, match="min_reader"):
            spark.read.format("txlog").option("path", table).load().count()
        # DESCRIBE HISTORY stays readable (it reports the log itself)
        assert txlog.table_history(spark, table).count() >= 1

    def test_add_constraint_bumps_writer_to_2(self, spark, table):
        txlog.create_table(
            spark.range(5).select(F.col("id").alias("c")), table
        )
        C2.add_constraint(spark, table, "c_pos", "c >= 0")
        assert (
            txlog.table_protocol(table)["min_writer_version"] == 2
        )
        # a writer-1 engine (simulated) now refuses to append — the
        # x47 integrity hole this feature closes
        import onechronos_etl_takehome_spark.sources.txlog as T

        old = T.SUPPORTED_WRITER_VERSION
        T.SUPPORTED_WRITER_VERSION = 1
        try:
            with pytest.raises(txlog.ProtocolError, match="min_writer"):
                txlog.append(
                    spark.createDataFrame([(1,)], "c long"), table
                )
        finally:
            T.SUPPORTED_WRITER_VERSION = old
        # the current engine appends fine (and still validates)
        txlog.append(spark.createDataFrame([(1,)], "c long"), table)
        assert txlog.read_table(spark, table).count() == 6

    def test_protocol_is_time_travelable_and_carried(self, spark, table):
        txlog.create_table(
            spark.range(3).select(F.col("id").alias("c")), table
        )
        v_constraint = C2.add_constraint(spark, table, "c_pos", "c >= 0")
        txlog.append(spark.createDataFrame([(7,)], "c long"), table)
        # before the constraint: protocol 1; after: 2; the data commit
        # CARRIES the bumped protocol forward (O(1) lookup)
        assert (
            txlog.table_protocol(table, version=v_constraint - 1)[
                "min_writer_version"
            ]
            == 1
        )
        last = txlog.committed_versions(table)[-1]
        with open(
            os.path.join(txlog._log_path(table), f"{last:08d}.json")
        ) as f:
            newest = json.load(f)
        assert newest["protocol"]["min_writer_version"] == 2

    def test_pre_versioning_tables_keep_working(self, spark, table):
        """A table whose manifests never carry a protocol field (all
        of rounds 7-9) reads and writes exactly as before."""
        txlog.create_table(spark.range(4), table)
        # simulate: strip any protocol fields from every manifest
        for v in txlog.committed_versions(table):
            mp = os.path.join(txlog._log_path(table), f"{v:08d}.json")
            with open(mp) as f:
                m = json.load(f)
            m.pop("protocol", None)
            with open(mp, "w") as f:
                json.dump(m, f)
        assert txlog.table_protocol(table) == {
            "min_reader_version": 1,
            "min_writer_version": 1,
        }
        txlog.append(spark.range(4, 6), table)
        assert txlog.read_table(spark, table).count() == 6


# ---------------------------------------------------------------------------
# Column mapping (round-9 verdict item 4): RENAME/DROP COLUMN as
# metadata-only commits; physical names stable forever
# ---------------------------------------------------------------------------


class TestColumnMapping:
    def _seed(self, spark, table):
        txlog.create_table(
            spark.range(10).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            table,
        )

    def test_rename_is_metadata_only_and_resolves_old_files(
        self, spark, table
    ):
        self._seed(spark, table)
        files_before = set(txlog.live_files(table))
        v = txlog.rename_column(spark, table, "v", "price")
        assert set(txlog.live_files(table)) == files_before  # no rewrite
        cur = txlog.read_table(spark, table)
        assert cur.columns == ["k", "price"]
        assert cur.agg(F.sum("price")).first()[0] == 450
        # time travel before the rename still shows the old name
        assert txlog.read_table(spark, table, version=v - 1).columns == [
            "k", "v",
        ]
        assert txlog.table_protocol(table) == {
            "min_reader_version": 2,
            "min_writer_version": 3,
        }

    def test_new_appends_stage_under_the_stable_physical_name(
        self, spark, table
    ):
        import pyarrow.parquet as pq

        self._seed(spark, table)
        txlog.rename_column(spark, table, "v", "price")
        txlog.append(
            spark.createDataFrame([(100, 5000)], "k long, price long"),
            table,
        )
        last = txlog.committed_versions(table)[-1]
        with open(
            os.path.join(txlog._log_path(table), f"{last:08d}.json")
        ) as f:
            m = json.load(f)
        fname = [a["add"] for a in m["actions"] if "add" in a][0]
        phys = pq.read_table(os.path.join(table, fname)).column_names
        assert phys == ["k", "v"]  # physical name never changes
        got = txlog.read_table(spark, table).agg(F.sum("price")).first()[0]
        assert got == 450 + 5000

    def test_pruning_translates_logical_to_physical_stats(
        self, spark, table
    ):
        txlog.create_table(
            spark.range(100).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            table,
            cluster_by="v",
            cluster_files=4,
        )
        txlog.rename_column(spark, table, "v", "price")
        kept, pruned = txlog.pruned_files(spark, table, "price > 900")
        assert pruned, "stats pruning must engage through the mapping"
        full = txlog.read_table(spark, table).filter("price > 900")
        skipped = txlog.read_table(spark, table, where="price > 900")
        assert skipped.exceptAll(full).count() == 0
        assert full.exceptAll(skipped).count() == 0

    def test_dml_round_trips_on_mapped_table(self, spark, table):
        self._seed(spark, table)
        txlog.rename_column(spark, table, "v", "price")
        txlog.delete_where(spark, table, F.col("price") >= 80)
        txlog.merge_upsert(
            spark,
            table,
            spark.createDataFrame([(0, 999), (50, 500)], "k long, price long"),
            ["k"],
        )
        assert txlog.compact(spark, table) is not None
        got = {
            r["k"]: r["price"]
            for r in txlog.read_table(spark, table).collect()
        }
        want = {k: k * 10 for k in range(1, 8)}
        want.update({0: 999, 50: 500})
        assert got == want

    def test_format_reader_and_cdf_speak_logical_names(
        self, spark, table, tmp_path
    ):
        _register_source(spark)
        self._seed(spark, table)
        txlog.rename_column(spark, table, "v", "price")
        txlog.delete_where(spark, table, F.col("price") < 30)
        fmt = spark.read.format("txlog").option("path", table).load()
        assert fmt.columns == ["k", "price"]
        assert fmt.filter("price >= 50").count() == 5
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        q = (
            spark.readStream.format("txlog")
            .option("path", table)
            .option("readChangeFeed", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        feed = spark.read.parquet(out)
        assert set(feed.columns) == {"_version", "_change", "k", "price"}
        assert feed.filter("_change = 'delete'").count() == 3

    def test_drop_hides_now_time_travel_still_shows(self, spark, table):
        self._seed(spark, table)
        txlog.append(
            spark.range(3).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("v"),
                F.lit("x").alias("tag"),
            ),
            table,
        )
        v = txlog.drop_column(spark, table, "tag")
        assert txlog.read_table(spark, table).columns == ["k", "v"]
        pre = txlog.read_table(spark, table, version=v - 1)
        assert pre.columns == ["k", "v", "tag"]
        assert pre.filter("tag = 'x'").count() == 3

    def test_dropped_physical_name_is_tombstoned(self, spark, table):
        self._seed(spark, table)
        txlog.rename_column(spark, table, "v", "price")
        # 'v' is price's PHYSICAL name: adding a logical 'v' would
        # resurrect old bytes — refused
        with pytest.raises(ValueError, match="PHYSICAL"):
            txlog.append(
                spark.createDataFrame([(1, 2, 3)],
                                      "k long, price long, v long"),
                table,
            )
        txlog.drop_column(spark, table, "price")
        with pytest.raises(ValueError, match="PHYSICAL"):
            txlog.append(
                spark.createDataFrame([(1, 2)], "k long, v long"), table
            )

    def test_rename_refused_while_constraint_references(self, spark, table):
        self._seed(spark, table)
        C2.add_constraint(spark, table, "v_pos", "v >= 0")
        with pytest.raises(ValueError, match="v_pos"):
            txlog.rename_column(spark, table, "v", "price")
        with pytest.raises(ValueError, match="v_pos"):
            txlog.drop_column(spark, table, "v")
        C2.drop_constraint(spark, table, "v_pos")
        txlog.rename_column(spark, table, "v", "price")
        assert txlog.read_table(spark, table).columns == ["k", "price"]

    def test_mapped_table_refuses_reader_1_engines(self, spark, table):
        self._seed(spark, table)
        txlog.rename_column(spark, table, "v", "price")
        import onechronos_etl_takehome_spark.sources.txlog as T

        old_r = T.SUPPORTED_READER_VERSION
        T.SUPPORTED_READER_VERSION = 1
        try:
            with pytest.raises(txlog.ProtocolError, match="min_reader"):
                txlog.read_table(spark, table)
        finally:
            T.SUPPORTED_READER_VERSION = old_r

    def test_constraints_validate_through_the_mapping(self, spark, table):
        self._seed(spark, table)
        txlog.rename_column(spark, table, "v", "price")
        C2.add_constraint(spark, table, "price_cap", "price < 1000")
        with pytest.raises(C2.ConstraintViolation, match="price_cap"):
            txlog.append(
                spark.createDataFrame([(1, 5000)], "k long, price long"),
                table,
            )
        txlog.append(
            spark.createDataFrame([(1, 500)], "k long, price long"), table
        )
        assert txlog.read_table(spark, table).count() == 11


# ---------------------------------------------------------------------------
# LIKE-prefix pruning (round-9 verdict item 5)
# ---------------------------------------------------------------------------


class TestPrefixPruning:
    INFO_AB = {"rows": 5, "stats": {"s": ["ab1", "abz"]}, "nulls": {"s": 0}}
    INFO_B = {"rows": 5, "stats": {"s": ["ba", "bz"]}, "nulls": {"s": 0}}
    INFO_SPAN = {"rows": 5, "stats": {"s": ["aa", "cz"]}, "nulls": {"s": 0}}

    def may(self, text, info):
        return P.may_match(P.parse_predicate(text), info)

    def test_prefix_overlap_algebra(self):
        assert self.may("s LIKE 'ab%'", self.INFO_AB)
        assert self.may("s LIKE 'ab%'", self.INFO_SPAN)
        assert not self.may("s LIKE 'ab%'", self.INFO_B)
        # boundary: file strictly below the prefix
        below = {"rows": 2, "stats": {"s": ["aa", "aaz"]}, "nulls": {"s": 0}}
        assert not self.may("s LIKE 'ab%'", below)
        # startswith through the Column front end hits the same leaf
        assert P.parse_predicate("s LIKE 'ab%'") == P.Leaf(
            "prefix", "s", "ab"
        )

    def test_not_like_is_exact(self):
        # every row of INFO_AB starts with 'ab': NOT LIKE has no TRUE
        # row — prune; spanning and disjoint files must stay
        assert not self.may("NOT (s LIKE 'ab%')", self.INFO_AB)
        assert self.may("NOT (s LIKE 'ab%')", self.INFO_SPAN)
        assert self.may("NOT (s LIKE 'ab%')", self.INFO_B)

    def test_unprunable_patterns_degrade(self):
        assert self.may("s LIKE '%ab'", self.INFO_B)
        assert self.may("s LIKE 'a_b%'", self.INFO_B)
        # no-wildcard LIKE is equality
        assert P.parse_predicate("s LIKE 'abc'") == P.Leaf("=", "s", "abc")
        # conjunct still prunes next to a degraded LIKE
        assert not self.may("s LIKE '%ab' AND s LIKE 'ab%'", self.INFO_B)

    def test_empty_prefix(self):
        # LIKE '%' keeps every non-null row; its negation keeps none
        assert self.may("s LIKE '%'", self.INFO_B)
        assert not self.may("NOT (s LIKE '%')", self.INFO_B)

    def test_auto_equals_manual_on_string_clustered_table(
        self, spark, table
    ):
        """The verdict's done-bar: a prefix predicate derives the same
        file list as the hand-fed inclusive range, on a table
        range-clustered by the string column."""
        df = spark.range(2000).select(
            F.col("id").alias("k"),
            F.concat(
                F.lpad((F.col("id") % 26).cast("string"), 2, "0"),
                F.lit("-doc-"),
                F.col("id").cast("string"),
            ).alias("s"),
        )
        txlog.create_table(df, table, cluster_by="s", cluster_files=8)
        kept_auto, pruned_auto = txlog.pruned_files(
            spark, table, "s LIKE '07-%'"
        )
        kept_hand, pruned_hand = txlog.skipped_files(
            table, {"s": ("07-", "07.")}  # succ('07-') == '07.'
        )
        assert (kept_auto, pruned_auto) == (kept_hand, pruned_hand)
        assert pruned_auto, "string-clustered layout must prune"
        got = txlog.read_table(spark, table, where="s LIKE '07-%'")
        want = txlog.read_table(spark, table).filter("s LIKE '07-%'")
        assert got.count() == want.count() > 0
        assert got.exceptAll(want).count() == 0

    def test_format_reader_prunes_on_startswith(self, spark, table):
        _register_source(spark)
        df = spark.range(2000).select(
            F.concat(
                F.lpad((F.col("id") % 26).cast("string"), 2, "0"),
                F.lit("-doc-"),
                F.col("id").cast("string"),
            ).alias("s"),
        )
        txlog.create_table(df, table, cluster_by="s", cluster_files=8)
        kept, pruned = txlog.pruned_files(spark, table, "s LIKE '07-%'")
        assert pruned
        # poison one PRUNED file: the pushed-down filter read must
        # succeed (file skipped); proof the skip is real I/O elision
        poison = os.path.join(table, pruned[0])
        with open(poison, "wb") as f:
            f.write(b"not parquet at all")
        fmt = spark.read.format("txlog").option("path", table).load()
        got = fmt.filter(F.col("s").startswith("07-")).count()
        assert got == 2000 // 26 + (1 if 7 < 2000 % 26 else 0)


# ---------------------------------------------------------------------------
# Vacuum vs time travel through the REGISTERED FORMAT (round-9
# verdict item 7): the format path must fail as loudly as read_table
# ---------------------------------------------------------------------------


class TestFormatVacuumGuard:
    def test_vacuumed_version_raises_through_format_reader(
        self, spark, table
    ):
        _register_source(spark)
        txlog.create_table(
            spark.range(40).select(
                "id", F.lit("a").alias("tag")
            ),
            table,
        )
        txlog.append(
            spark.range(40, 80).select("id", F.lit("b").alias("tag")),
            table,
        )
        txlog.delete_where(spark, table, F.col("tag") == "a")  # v2
        txlog.delete_where(spark, table, F.col("id") % 2 == 0)  # v3
        assert txlog.vacuum(table, keep_versions=2, retention_seconds=0)

        def fmt(v):
            return (
                spark.read.format("txlog")
                .option("path", table)
                .option("version", str(v))
                .load()
            )

        # retained versions still read, and match the API path
        for v in (2, 3):
            assert fmt(v).count() == txlog.read_table(
                spark, table, version=v
            ).count()
        # vacuumed versions RAISE — never a silent partial result
        for v in (0, 1):
            with pytest.raises(Exception):
                fmt(v).count()
            with pytest.raises(Exception):
                txlog.read_table(spark, table, version=v).count()

    def test_vacuumed_cdf_range_raises_not_partial(self, spark, table):
        """The CDF batch read over a range whose files were vacuumed
        must also fail loudly."""
        _register_source(spark)
        txlog.create_table(
            spark.range(40).select("id", F.lit("a").alias("tag")), table
        )
        txlog.delete_where(spark, table, F.col("tag") == "a")  # v1
        txlog.append(
            spark.range(40, 50).select("id", F.lit("c").alias("tag")),
            table,
        )  # v2
        assert txlog.vacuum(table, keep_versions=1, retention_seconds=0)
        with pytest.raises(Exception):
            (
                spark.read.format("txlog")
                .option("path", table)
                .option("readChangeFeed", "true")
                .option("endingVersion", "1")
                .load()
                .count()
            )


# ---------------------------------------------------------------------------
# SQL over registered txlog tables (round-9 verdict item 8): the x44
# poisoned-prune proof as PURE SQL
# ---------------------------------------------------------------------------


class TestSqlOverTxlog:
    def test_pure_sql_where_drives_file_pruning(self, spark, table):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            register_view,
        )

        df = spark.range(4000).select(
            (F.col("id") % 100).alias("status"),
            (F.col("id") * 3).alias("cents"),
            F.date_add(
                F.lit("1995-01-01").cast("date"),
                (F.col("id") % 1400).cast("int"),
            ).alias("d"),
        )
        txlog.create_table(df, table, cluster_by="d", cluster_files=8)
        # prune=True views carry the Spark 4.1 readInfo-reuse hazard
        # (see register_view's docstring), so the discipline is: one
        # fresh registration per query leg
        register_view(spark, table, "sql_txlog_t", prune=True)
        cut = "d >= DATE '1997-01-01'"
        want = txlog.read_table(spark, table, where=cut).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
        ).collect()[0]
        got = spark.sql(
            f"SELECT COUNT(*) AS n, SUM(cents) AS s FROM sql_txlog_t "
            f"WHERE {cut}"
        ).collect()[0]
        assert (got["n"], got["s"]) == (want["n"], want["s"])
        # poison every pre-cut file: the SQL WHERE read must keep
        # succeeding (files skipped by pushFilters), the SQL full
        # scan must RAISE — the x44 contract with zero DataFrame code
        _, pruned = txlog.pruned_files(spark, table, cut)
        assert pruned
        for f in pruned:
            with open(os.path.join(table, f), "wb") as fh:
                fh.write(b"poisoned: a pruned file must never be read")
        register_view(spark, table, "sql_txlog_t2", prune=True)
        again = spark.sql(
            f"SELECT COUNT(*) AS n, SUM(cents) AS s FROM sql_txlog_t2 "
            f"WHERE {cut}"
        ).collect()[0]
        assert (again["n"], again["s"]) == (want["n"], want["s"])
        # a THIRD fresh view for the full scan so the raise comes from
        # reading unpruned poisoned files, not stale cached partitions
        register_view(spark, table, "sql_txlog_t3", prune=True)
        with pytest.raises(Exception):
            spark.sql("SELECT COUNT(*) FROM sql_txlog_t3").collect()

    def test_default_view_reuse_safe_vs_pruned_view(self, spark, table):
        """Pins BOTH register_view behaviors (round-10 verdict item 1):
        the prune=False default serves a filtered-then-unfiltered query
        mix correctly on ONE reused view (complete partitions defuse
        the Spark 4.1 stale-readInfo hazard), while a fresh prune=True
        view skips poisoned out-of-range files."""
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            register_view,
        )

        df = spark.range(2000).select(
            (F.col("id") % 50).alias("k"), (F.col("id") * 7).alias("v")
        )
        txlog.create_table(df, table, cluster_by="v", cluster_files=6)
        register_view(spark, table, "sql_reuse_v")  # default prune=False
        cut = "v >= 7000"
        filt = spark.sql(
            f"SELECT COUNT(*) AS n, SUM(v) AS s FROM sql_reuse_v "
            f"WHERE {cut}"
        ).collect()[0]
        want_f = txlog.read_table(spark, table, where=cut).agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        ).collect()[0]
        assert (filt["n"], filt["s"]) == (want_f["n"], want_f["s"])
        # the reuse hazard case: an UNFILTERED query on the same view
        # right after a filtered one must see every row
        full = spark.sql(
            "SELECT COUNT(*) AS n, SUM(v) AS s FROM sql_reuse_v"
        ).collect()[0]
        assert (full["n"], full["s"]) == (2000, sum(i * 7
                                                    for i in range(2000)))
        # and the pruned single-use view really skips files: poison the
        # out-of-range ones, fresh prune=True view still answers
        _, pruned = txlog.pruned_files(spark, table, cut)
        assert pruned
        for f in pruned:
            with open(os.path.join(table, f), "wb") as fh:
                fh.write(b"poison")
        register_view(spark, table, "sql_prune_v", prune=True)
        again = spark.sql(
            f"SELECT COUNT(*) AS n, SUM(v) AS s FROM sql_prune_v "
            f"WHERE {cut}"
        ).collect()[0]
        assert (again["n"], again["s"]) == (want_f["n"], want_f["s"])

    def test_sql_view_time_travel_and_cdf(self, spark, table):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            register_view,
        )

        txlog.create_table(spark.range(10).select(F.col("id").alias("k")),
                           table)
        txlog.append(
            spark.createDataFrame([(99,)], "k long"), table
        )
        txlog.delete_where(spark, table, F.col("k") < 5)
        register_view(spark, table, "sql_tt_v0", version=0)
        register_view(spark, table, "sql_tt_now")
        register_view(spark, table, "sql_tt_cdf", read_change_feed=True)
        assert spark.sql(
            "SELECT COUNT(*) AS n FROM sql_tt_v0"
        ).first()["n"] == 10
        assert spark.sql(
            "SELECT COUNT(*) AS n FROM sql_tt_now"
        ).first()["n"] == 6
        deletes = spark.sql(
            "SELECT COUNT(*) AS n FROM sql_tt_cdf WHERE _change = 'delete'"
        ).first()["n"]
        assert deletes == 5
        with pytest.raises(ValueError, match="not both"):
            register_view(
                spark, table, "bad", version=0, timestamp_as_of="2020-01-01"
            )
