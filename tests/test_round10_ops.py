"""Round-10 operators and fixes: null-safe-equality pruning exactness
(round-10 advice, high), constraint re-validation under commit races,
LIKE-prefix pruning, protocol versioning, column mapping, the change
data feed stream, and SQL over registered txlog tables."""

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
