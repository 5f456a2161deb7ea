"""Round-9 operators: predicate-compiled file pruning (write the
filter once), timestamp time travel, metadata-only counts, manifest
schema-union stamping, and stream-source rate limiting."""

from __future__ import annotations

import math
import os
import tempfile
import time

import pytest

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources import constraints as C2
from onechronos_etl_takehome_spark.sources import pruning as P
from onechronos_etl_takehome_spark.sources import txlog

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


# ---------------------------------------------------------------------------
# Predicate compiler: AST semantics (pure python, no Spark)
# ---------------------------------------------------------------------------


class TestPredicateCompiler:
    INFO = {
        "rows": 100,
        "stats": {
            "a": [10, 20],
            "d": ["1995-06-01T00:00:00", "1995-09-30T00:00:00"],
        },
        "nulls": {"a": 0, "b": 100},
    }

    def may(self, text: str) -> bool:
        return P.may_match(P.parse_predicate(text), self.INFO)

    def test_range_pruning(self):
        assert not self.may("a > 25")
        assert self.may("a >= 20")
        assert not self.may("a BETWEEN 30 AND 40")
        assert self.may("a BETWEEN 15 AND 40")
        assert not self.may("25 < a")  # literal-first flips
        assert self.may("15 < a")

    def test_equality_and_in(self):
        assert not self.may("a IN (5, 25)")
        assert self.may("a IN (5, 15)")
        assert not self.may("a = 25")
        const = {"rows": 5, "stats": {"a": [7, 7]}, "nulls": {"a": 0}}
        # != prunes only constant files (NULL rows fail != too)
        assert not P.may_match(P.parse_predicate("a != 7"), const)
        assert P.may_match(P.parse_predicate("a <> 8"), const)

    def test_not_pushdown_is_exact(self):
        assert not self.may("NOT (a >= 10)")
        assert self.may("NOT (a = 15)")
        assert not self.may("NOT (a <= 30 AND a >= 5)")  # De Morgan
        assert not self.may("NOT (a BETWEEN 5 AND 30)")
        assert self.may("NOT a IN (11, 12)")

    def test_null_predicates(self):
        assert not self.may("a IS NULL")
        assert not self.may("b IS NOT NULL")
        assert self.may("b IS NULL")
        assert self.may("a IS NOT NULL")

    def test_date_normalization(self):
        # bare-date literal vs ISO-datetime stat: midnight equality,
        # no lexicographic false pruning on either side
        assert not self.may("d > '1995-09-30'")
        assert self.may("d >= '1995-09-30'")
        assert not self.may("d < DATE '1995-06-01'")
        assert self.may("d <= TIMESTAMP '1995-06-01 00:00:00'")

    def test_unknown_terms_degrade_not_poison(self):
        # the unsupported term may-matches; its conjunct still prunes
        assert not self.may("some_udf(b, 3) = 7 AND a > 25")
        assert self.may("some_udf(b, 3) = 7")
        assert self.may("NOT some_udf(b) = 7 AND a > 15")
        # a disjunction with an unknown side can never prune
        assert self.may("a > 25 OR some_udf(b) = 7")
        # wholly unparseable text → UNKNOWN → keep
        assert P.may_match(P.parse_predicate("%%%"), self.INFO)

    def test_incomparable_types_keep(self):
        assert self.may("a = 'not-a-number'")
        assert self.may("d > 42")

    def test_missing_stats_keep(self):
        assert self.may("zzz = 5")
        assert self.may("zzz IS NULL")


# ---------------------------------------------------------------------------
# read_table(where=...): auto-derived pruning == hand-fed skip_where
# ---------------------------------------------------------------------------


class TestWherePruning:
    def _orders_table(self, spark, table):
        orders = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
        txlog.create_table(
            orders, table, cluster_by="o_orderdate", cluster_files=8
        )
        return orders

    def test_auto_equals_manual_range(self, spark, table):
        """The x36 shape: one BETWEEN predicate derives the same file
        list the hand-fed dict produced."""
        self._orders_table(spark, table)
        pred = "o_orderdate BETWEEN DATE '1995-06-01' AND DATE '1995-09-30'"
        kept_auto, pruned_auto = txlog.pruned_files(spark, table, pred)
        kept_hand, pruned_hand = txlog.skipped_files(
            table, {"o_orderdate": ("1995-06-01", "1995-09-30T00:00:00")}
        )
        assert kept_auto == kept_hand and pruned_auto == pruned_hand
        assert pruned_auto, "clustered layout must prune"
        # and the read is the full semantic result
        got = txlog.read_table(spark, table, where=pred)
        want = txlog.read_table(spark, table).filter(F.expr(pred))
        assert got.count() == want.count() > 0
        assert got.exceptAll(want).count() == 0

    def test_auto_equals_manual_null_predicate(self, spark, table):
        """The x39 shape: IS NOT NULL derives null-count pruning."""
        orders = spark.read.parquet(
            os.path.join(SF_SMOKE, "orders.parquet")
        ).select(
            "o_orderstatus",
            F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("double"))
            .otherwise(F.col("o_totalprice"))
            .alias("open_price"),
        )
        txlog.create_table(
            orders, table, cluster_by="o_orderstatus", cluster_files=6
        )
        kept_auto, pruned_auto = txlog.pruned_files(
            spark, table, "open_price IS NOT NULL"
        )
        kept_hand, pruned_hand = txlog.skipped_files(
            table, {"open_price": "is_not_null"}
        )
        assert (kept_auto, pruned_auto) == (kept_hand, pruned_hand)
        assert pruned_auto, "status-pure all-null files must prune"
        got = txlog.read_table(spark, table, where="open_price IS NOT NULL")
        assert got.count() == orders.filter(
            F.col("open_price").isNotNull()
        ).count()

    def test_or_of_ranges_prunes_what_dict_cannot(self, spark, table):
        """An OR of two disjoint ranges: the dict form can only state
        one contiguous bound per column, so its tightest expression is
        the HULL [min_lo, max_hi] — the compiled OR must additionally
        prune the files BETWEEN the ranges."""
        self._orders_table(spark, table)
        # ranges three years apart: at 8 range-clustered files over
        # the 1995-2001 orders span each file covers ~10 months, so
        # the hull keeps the files BETWEEN the two probes too
        pred = (
            "(o_orderdate BETWEEN DATE '1995-02-01' AND DATE '1995-02-28')"
            " OR "
            "(o_orderdate BETWEEN DATE '1998-06-01' AND DATE '1998-06-30')"
        )
        kept, pruned = txlog.pruned_files(spark, table, pred)
        hull_kept, _ = txlog.skipped_files(
            table, {"o_orderdate": ("1995-02-01", "1998-06-30T00:00:00")}
        )
        assert set(kept) <= set(hull_kept)
        assert len(kept) < len(hull_kept), (
            "OR-of-ranges must prune files inside the gap the hull keeps"
        )
        got = txlog.read_table(spark, table, where=pred)
        want = txlog.read_table(spark, table).filter(F.expr(pred))
        assert got.count() == want.count() > 0
        assert got.exceptAll(want).count() == 0

    def test_column_front_end_matches_sql_text(self, spark, table):
        self._orders_table(spark, table)
        text = "o_orderdate BETWEEN DATE '1995-06-01' AND DATE '1995-09-30'"
        col = F.col("o_orderdate").between(
            F.lit("1995-06-01").cast("date"), F.lit("1995-09-30").cast("date")
        )
        kept_text, _ = txlog.pruned_files(spark, table, text)
        kept_col, _ = txlog.pruned_files(spark, table, col)
        assert kept_text == kept_col
        got = txlog.read_table(spark, table, where=col)
        assert got.count() == txlog.read_table(
            spark, table, where=text
        ).count()

    def test_unsupported_predicate_scans_everything_correctly(
        self, spark, table
    ):
        """A predicate the compiler can't reason about must degrade to
        scan-plus-filter — full result, zero files pruned."""
        self._orders_table(spark, table)
        pred = "length(o_orderstatus) = 1 AND o_totalprice > 0"
        kept, pruned = txlog.pruned_files(spark, table, pred)
        assert pruned == []  # only conservative keeps
        got = txlog.read_table(spark, table, where=pred)
        want = txlog.read_table(spark, table).filter(F.expr(pred))
        assert got.count() == want.count() > 0

    def test_equality_sugar_in_skip_where(self, spark, table):
        orders = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
        txlog.create_table(
            orders, table, cluster_by="o_orderstatus", cluster_files=6
        )
        kept_sugar, pruned_sugar = txlog.skipped_files(
            table, {"o_orderstatus": "F"}
        )
        kept_range, pruned_range = txlog.skipped_files(
            table, {"o_orderstatus": ("F", "F")}
        )
        assert (kept_sugar, pruned_sugar) == (kept_range, pruned_range)
        assert pruned_sugar, "status-clustered files must prune on equality"

    def test_where_and_skip_where_are_exclusive(self, spark, table):
        self._orders_table(spark, table)
        with pytest.raises(ValueError, match="not both"):
            txlog.read_table(
                spark, table, where="o_totalprice > 0",
                skip_where={"o_totalprice": (0, None)},
            )


# ---------------------------------------------------------------------------
# Timestamp time travel
# ---------------------------------------------------------------------------


class TestTimestampTravel:
    def test_between_commit_timestamps_resolve_down(self, spark, table):
        txlog.create_table(spark.range(0, 10), table)
        time.sleep(0.05)
        t_mid = time.time()
        time.sleep(0.05)
        txlog.append(spark.range(10, 15), table)
        assert txlog.read_table(spark, table, timestamp=t_mid).count() == 10
        assert txlog.read_table(
            spark, table, timestamp=time.time()
        ).count() == 15
        v, _ = txlog._resolve_version(table, None, timestamp=t_mid)
        assert v == 0

    def test_prehistory_timestamp_raises(self, spark, table):
        txlog.create_table(spark.range(0, 5), table)
        with pytest.raises(ValueError, match="predates the first commit"):
            txlog.read_table(spark, table, timestamp=time.time() - 3600)

    def test_version_and_timestamp_conflict(self, spark, table):
        txlog.create_table(spark.range(0, 5), table)
        with pytest.raises(ValueError, match="not both"):
            txlog._resolve_version(table, 0, timestamp=time.time())

    def test_format_reader_timestamp_as_of(self, spark, table):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        txlog.create_table(spark.range(0, 7).select("id"), table)
        time.sleep(0.05)
        t_mid = time.time()
        time.sleep(0.05)
        txlog.append(spark.range(7, 12).select("id"), table)
        got = (
            spark.read.format("txlog")
            .option("path", table)
            .option("timestampAsOf", t_mid)
            .load()
        )
        assert got.count() == 7
        # ISO text works too (option values arrive stringified)
        import datetime

        iso = datetime.datetime.fromtimestamp(
            t_mid, tz=datetime.timezone.utc
        ).isoformat()
        got_iso = (
            spark.read.format("txlog")
            .option("path", table)
            .option("timestampAsOf", iso)
            .load()
        )
        assert got_iso.count() == 7


# ---------------------------------------------------------------------------
# Metadata-only COUNT(*)
# ---------------------------------------------------------------------------


class TestMetadataCount:
    def test_count_exact_through_lifecycle(self, spark, table):
        df = spark.range(0, 100).select(
            "id", (F.col("id") % 4).alias("k")
        )
        txlog.create_table(df, table)
        assert txlog.table_count(table) == 100
        txlog.delete_where(spark, table, F.col("k") == 0)
        assert txlog.table_count(table) == 75
        txlog.append(spark.range(100, 110).select(
            "id", (F.col("id") % 4).alias("k")
        ), table)
        assert txlog.table_count(table) == 85
        assert txlog.table_count(table, version=0) == 100
        assert txlog.table_count(table, version=1) == 75

    def test_count_opens_zero_data_files(self, spark, table):
        """The structural proof: move EVERY data file away — the
        count still answers (manifests only), while an actual read
        now fails."""
        txlog.create_table(spark.range(0, 50), table)
        txlog.append(spark.range(50, 80), table)
        moved = []
        hideout = tempfile.mkdtemp(prefix="txlog_hideout_")
        for fname in os.listdir(table):
            if fname.endswith(".parquet"):
                os.rename(
                    os.path.join(table, fname),
                    os.path.join(hideout, fname),
                )
                moved.append(fname)
        assert moved, "expected staged data files"
        try:
            assert txlog.table_count(table) == 80
            with pytest.raises(Exception):
                txlog.read_table(spark, table).count()
        finally:
            for fname in moved:
                os.rename(
                    os.path.join(hideout, fname),
                    os.path.join(table, fname),
                )

    def test_legacy_manifests_raise_not_lie(self, spark, table):
        txlog.create_table(spark.range(0, 5), table)
        # simulate a legacy manifest without row counts
        import json

        log = os.path.join(table, txlog._LOG_DIR, "00000000.json")
        with open(log) as f:
            manifest = json.load(f)
        for a in manifest["actions"]:
            a.pop("rows", None)
        os.unlink(log)
        with open(log, "w") as f:
            json.dump(manifest, f)
        with pytest.raises(ValueError, match="predate per-file row counts"):
            txlog.table_count(table)


# ---------------------------------------------------------------------------
# Manifest schema-union stamping (round-8 advice, medium)
# ---------------------------------------------------------------------------


class TestSchemaUnionStamping:
    def _evolved_table(self, spark, table):
        txlog.create_table(
            spark.range(0, 10).select("id", F.lit("a").alias("tag")), table
        )
        txlog.append(
            spark.range(100, 110).select(
                "id", F.lit("b").alias("tag"), F.lit(1.5).alias("extra")
            ),
            table,
        )

    def test_delete_on_old_files_keeps_evolved_schema(self, spark, table):
        self._evolved_table(spark, table)
        # touches ONLY the pre-evolution file: the committing keep
        # frame has the narrow schema — the union stamp must preserve
        # the evolved column anyway
        txlog.delete_where(spark, table, F.col("id") < 5)
        sch = txlog._latest_schema(table, txlog.committed_versions(table)[-1])
        assert "extra" in sch.fieldNames()

    def test_old_schema_append_after_evolution(self, spark, table):
        self._evolved_table(spark, table)
        # an old-schema producer appends post-evolution
        txlog.append(
            spark.range(200, 205).select("id", F.lit("c").alias("tag")),
            table,
        )
        sch = txlog._latest_schema(table, txlog.committed_versions(table)[-1])
        assert "extra" in sch.fieldNames()

    def test_merge_commit_stamps_schema(self, spark, table):
        self._evolved_table(spark, table)
        txlog.merge_upsert(
            spark,
            table,
            spark.range(5, 8).select(
                "id", F.lit("m").alias("tag"), F.lit(9.9).alias("extra")
            ),
            ["id"],
        )
        v = txlog.committed_versions(table)[-1]
        import json

        with open(
            os.path.join(table, txlog._LOG_DIR, f"{v:08d}.json")
        ) as f:
            assert "schema" in json.load(f)

    def test_data_source_reads_evolved_column_after_narrow_commit(
        self, spark, table
    ):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        self._evolved_table(spark, table)
        txlog.delete_where(spark, table, F.col("id") < 5)
        got = spark.read.format("txlog").option("path", table).load()
        assert "extra" in got.columns
        assert got.count() == 15
        assert got.filter(F.col("extra").isNotNull()).count() == 10
        # the two read paths agree (round-8 advice: they diverged)
        via_api = txlog.read_table(spark, table)
        assert sorted(via_api.columns) == sorted(got.columns)


# ---------------------------------------------------------------------------
# Stream-source rate limiting (maxFilesPerTrigger)
# ---------------------------------------------------------------------------


class TestMaxFilesPerTrigger:
    def _backlog_table(self, spark, table, n_commits=6):
        txlog.create_table(spark.range(0, 10).repartition(1), table)
        for i in range(1, n_commits):
            txlog.append(
                spark.range(i * 10, i * 10 + 10).repartition(1), table
            )

    def _drain(self, spark, table, out, ck, limit=None):
        reader = spark.readStream.format("txlog").option("path", table)
        if limit is not None:
            reader = reader.option("maxFilesPerTrigger", limit)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return q

    def test_fresh_backlog_drains_in_bounded_batches(
        self, spark, table, tmp_path
    ):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        self._backlog_table(spark, table, n_commits=6)  # 6 files
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        q = self._drain(spark, table, out, ck, limit=2)
        got = spark.read.parquet(out)
        assert got.count() == 60
        assert got.distinct().count() == 60
        data_batches = [
            p for p in q.recentProgress if int(p["numInputRows"]) > 0
        ]
        assert len(data_batches) >= math.ceil(6 / 2)

    def test_restart_continues_bounded_without_duplicates(
        self, spark, table, tmp_path
    ):
        """The regression hazard: a restarted reader must NOT bound
        from startingVersion (that would regress the offset log and
        re-deliver). The engine seeds the cursor via the
        AcceptsLatestSeenOffset partitions replay — pinned here by
        restarting over new commits and checking exactly-once."""
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        self._backlog_table(spark, table, n_commits=4)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, table, out, ck, limit=2)
        for i in (4, 5, 6):
            txlog.append(
                spark.range(i * 10, i * 10 + 10).repartition(1), table
            )
        q2 = self._drain(spark, table, out, ck, limit=2)
        got = spark.read.parquet(out)
        assert got.count() == 70
        assert got.distinct().count() == 70
        b2 = [p for p in q2.recentProgress if int(p["numInputRows"]) > 0]
        assert len(b2) >= 2  # 3 new files at limit 2

    def test_arity_auto_selection_rule(self):
        """m12's composite-key arity self-selects from corpus size
        (round-8 verdict: the 67×-cross-cut lever existed but nothing
        pulled it): explicit always wins; auto switches to 3 past the
        measured ~6,200-video crossover."""
        from onechronos_etl_takehome_spark.operators.video import (
            ARITY_CROSSOVER_VIDEOS,
            _select_arity,
        )

        assert _select_arity(None, None) == 2
        assert _select_arity(None, 100) == 2
        assert _select_arity(None, ARITY_CROSSOVER_VIDEOS) == 2
        assert _select_arity(None, ARITY_CROSSOVER_VIDEOS + 1) == 3
        assert _select_arity(2, 1_000_000) == 2  # explicit wins
        assert _select_arity(3, 10) == 3

    def test_arity_switch_engages_above_crossover_end_to_end(self, spark):
        """Auto arity with an above-crossover corpus hint still
        recovers every gate-planted cross-codec twin (the sf0.001
        fixture is small; the HINT drives the key shape — this is the
        pinned proof that the switched-on path is the round-7
        arity-3 join, planted twins intact)."""
        from onechronos_etl_takehome_spark.operators import video as vid
        from onechronos_etl_takehome_spark.session import pin_semantics

        pin_semantics(spark)
        docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
        pay = vid.demo_crosscodec_video_payloads(docs, "doc_id")
        rows = vid.video_match_pairs_tolerant(
            pay, min_containment=0.6, n_videos=7_000
        ).collect()
        got = {(r.id_a, r.id_b) for r in rows}
        want = {(40 * g, 40 * g + 10) for g in range(13)} | {
            (40 * g + 20, 40 * g + 30) for g in range(12)
        }
        # identical to the explicit arity-3 pin in test_round7_ops:
        # 23 of 25 planted twins, zero false pairs
        assert got <= want
        assert len(got) == 23, sorted(want - got)

    def test_limited_equals_unlimited_final_table(
        self, spark, table, tmp_path
    ):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        self._backlog_table(spark, table, n_commits=5)
        out1, ck1 = str(tmp_path / "o1"), str(tmp_path / "c1")
        out2, ck2 = str(tmp_path / "o2"), str(tmp_path / "c2")
        self._drain(spark, table, out1, ck1, limit=1)
        self._drain(spark, table, out2, ck2, limit=None)
        a = spark.read.parquet(out1)
        b = spark.read.parquet(out2)
        assert a.count() == b.count() == 50
        assert a.exceptAll(b).count() == 0


class TestMultiScanBaseline:
    """T.81 A.2: an Ns=1 scan is ALWAYS non-interleaved — a
    single-component baseline scan walks the component's own block
    grid, never the padded MCU grid. Round-8 ADVICE: a subsampled
    component's single-component baseline scan was routed through the
    interleaved MCU walk (hi*vi padded blocks per MCU), desyncing the
    huffman stream; such valid-if-rare files fell to the stub."""

    def _multiscan_420(self, px):
        """Hand-emit a 3-scan baseline 4:2:0 JPEG carrying the SAME
        quantized blocks jpeg_from_pixels(px, subsampling='420')
        interleaves (padded-only luma blocks omitted — they sit past
        the crop), so the decodes must be bit-identical."""
        import struct

        import numpy as np

        from onechronos_etl_takehome_spark.operators import jpeg as J

        h, w = px.shape[:2]
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        ycc = J._rgb_to_ycbcr(px.astype(np.float64))

        def pad(plane):
            return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")

        y = pad(ycc[..., 0])
        cb, cr = (
            pad(ycc[..., c])
            .reshape(ph // 2, 2, pw // 2, 2)
            .mean(axis=(1, 3))
            for c in (1, 2)
        )
        dc_l = J._build_code_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
        ac_l = J._build_code_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
        dc_c = J._build_code_table(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS)
        ac_c = J._build_code_table(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS)

        def comp_scan(plane, rows_b, cols_b, quant, dcc, acc):
            wtr = J._BitWriter()
            prev = 0
            for by in range(rows_b):
                for bx in range(cols_b):
                    prev = J._encode_block(
                        wtr,
                        plane[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8],
                        quant,
                        dcc,
                        acc,
                        prev,
                    )
            return wtr.flush()

        def seg(marker, payload):
            return struct.pack(">HH", marker, len(payload) + 2) + payload

        def dqt(tid, q):
            return seg(
                0xFFDB,
                bytes([tid]) + bytes(int(x) for x in q.flatten()[J._ZIGZAG]),
            )

        def dht(cls, tid, bits, vals):
            return seg(
                0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
            )

        def sos(cid, tids):
            return seg(0xFFDA, bytes([1, cid, tids, 0, 63, 0]))

        # component block grids (NOT the padded MCU grid): luma
        # ceil(h/8) x ceil(w/8); chroma ceil(ceil(h/2)/8) likewise
        yb = (-(-h // 8), -(-w // 8))
        cbb = (-(-(-(-h // 2)) // 8), -(-(-(-w // 2)) // 8))
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
        out = b"\xff\xd8" + dqt(0, J.QUANT_LUMA) + dqt(1, J.QUANT_CHROMA)
        out += seg(0xFFC0, sof)
        out += dht(0, 0, J.DC_LUMA_BITS, J.DC_LUMA_VALS)
        out += dht(1, 0, J.AC_LUMA_BITS, J.AC_LUMA_VALS)
        out += dht(0, 1, J.DC_CHROMA_BITS, J.DC_CHROMA_VALS)
        out += dht(1, 1, J.AC_CHROMA_BITS, J.AC_CHROMA_VALS)
        out += sos(1, 0x00) + comp_scan(y, *yb, J.QUANT_LUMA, dc_l, ac_l)
        out += sos(2, 0x11) + comp_scan(cb, *cbb, J.QUANT_CHROMA, dc_c, ac_c)
        out += sos(3, 0x11) + comp_scan(cr, *cbb, J.QUANT_CHROMA, dc_c, ac_c)
        return out + b"\xff\xd9"

    def test_single_component_baseline_scans_decode(self):
        import numpy as np

        from onechronos_etl_takehome_spark.operators import jpeg as J

        rng = np.random.default_rng(9)
        # 24x24: NOT a 16-multiple, so the luma component grid (3x3
        # blocks) differs from the padded MCU grid (2x2 MCUs = 4x4
        # blocks) — the exact shape the old MCU-walk routing broke on
        yy, xx = np.mgrid[0:24, 0:24]
        px = np.stack(
            [
                (yy * 10 + xx * 3) % 256,
                (xx * 7) % 256,
                rng.integers(0, 256, (24, 24)),
            ],
            axis=-1,
        ).astype(np.uint8)
        got = J.jpeg_pixels(self._multiscan_420(px))
        want = J.jpeg_pixels(J.jpeg_from_pixels(px, subsampling="420"))
        assert got.shape == want.shape == (24, 24, 3)
        assert np.array_equal(got, want)


class TestFormatFilterPushdown:
    """spark.read.format('txlog') + .filter() → file pruning via
    Spark 4.1 pushFilters (round 9). Pruning is file-granular I/O
    elision; every filter stays Spark-side, so translation can only
    skip-too-little, never skip-too-much — except where SQL itself
    says a row can never match (IN over all-NULLs)."""

    @pytest.fixture(scope="class")
    def table(self, spark, tmp_path_factory):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        path = str(tmp_path_factory.mktemp("fpd") / "t")
        df = spark.range(0, 300).withColumn(
            "price", (F.col("id") * 7 % 1000).cast("double")
        )
        txlog.create_table(df, path, cluster_by="id", cluster_files=6)
        return path

    def _fmt(self, spark, path):
        return spark.read.format("txlog").option("path", path).load()

    def test_filter_translation_units(self):
        import datetime

        from pyspark.sql.datasource import (
            EqualNullSafe,
            EqualTo,
            GreaterThan,
            In,
            IsNotNull,
            IsNull,
            LessThanOrEqual,
            Not,
            StringStartsWith,
        )

        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            _filter_to_node,
        )

        assert _filter_to_node(EqualTo(("a",), 5)) == P.Leaf("=", "a", 5)
        assert _filter_to_node(GreaterThan(("a",), 5)) == P.Leaf(">", "a", 5)
        assert _filter_to_node(LessThanOrEqual(("a",), 5)) == P.Leaf(
            "<=", "a", 5
        )
        assert _filter_to_node(IsNull(("a",))) == P.Leaf("isnull", "a")
        assert _filter_to_node(IsNotNull(("a",))) == P.Leaf("isnotnull", "a")
        # Not goes through exact TRUE-row negation
        assert _filter_to_node(Not(GreaterThan(("a",), 5))) == P.Leaf(
            "<=", "a", 5
        )
        # EqualNullSafe: <=> NULL means IS NULL; <=> v carries the
        # isnotnull conjunct so Not() keeps null-bearing files
        # (round-10 advice fix; negation pinned in test_round10_ops)
        assert _filter_to_node(EqualNullSafe(("a",), None)) == P.Leaf(
            "isnull", "a"
        )
        assert _filter_to_node(EqualNullSafe(("a",), 3)) == P.AndN(
            (P.Leaf("=", "a", 3), P.Leaf("isnotnull", "a"))
        )
        # IN → OR of equalities; NULL members vanish (never TRUE);
        # all-NULL IN list prunes everything (OrN of nothing)
        node = _filter_to_node(In(("a",), (1, None, 2)))
        assert node == P.OrN((P.Leaf("=", "a", 1), P.Leaf("=", "a", 2)))
        empty = _filter_to_node(In(("a",), (None,)))
        assert empty == P.OrN(()) and not P.may_match(
            empty, {"stats": {"a": [0, 9]}}
        )
        # round 10: startswith drives prefix pruning (exact negation)
        assert _filter_to_node(StringStartsWith(("a",), "x")) == P.Leaf(
            "prefix", "a", "x"
        )
        assert _filter_to_node(Not(StringStartsWith(("a",), "x"))) == P.Leaf(
            "notprefix", "a", "x"
        )
        # unsupported shapes stay Spark-side: None
        assert _filter_to_node(EqualTo(("a", "b"), 1)) is None  # nested
        # DATE literals widen to midnight datetime for the ISO stats
        d = _filter_to_node(EqualTo(("d",), datetime.date(1997, 6, 1)))
        assert d.value == datetime.datetime(1997, 6, 1)

    def test_norm_offset_stats_compare_with_naive_literals(self):
        """Manifest date/timestamp stats carry +00:00 offsets; bare
        literals are naive (UTC under the pinned session). Both must
        land in one comparison domain — the round-9 gap that made
        date pruning silently never engage."""
        import datetime

        lo = P._norm("1997-06-01T00:00:00+00:00")
        hi = P._norm("1997-06-01")
        assert lo == hi == datetime.datetime(1997, 6, 1)
        assert P._norm("1997-06-01T03:00:00Z") == datetime.datetime(
            1997, 6, 1, 3
        )
        leaf = P.Leaf(">=", "d", datetime.date(1998, 1, 1))
        info = {
            "stats": {
                "d": [
                    "1997-01-01T00:00:00+00:00",
                    "1997-12-31T00:00:00+00:00",
                ]
            }
        }
        assert not P._leaf_may_true(leaf, info)  # prunable now

    def test_reader_partitions_match_pruned_files(self, spark, table):
        """The format reader's planned file set == pruned_files' for
        the same predicate (shared compiler, shared stats)."""
        from pyspark.sql.datasource import GreaterThanOrEqual

        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogBatchReader,
        )

        schema = self._fmt(spark, table).schema
        reader = TxlogBatchReader(schema, {"path": table})
        residual = reader.pushFilters([GreaterThanOrEqual(("id",), 200)])
        assert list(residual) == [GreaterThanOrEqual(("id",), 200)]
        planned = sorted(p.fname for p in reader.partitions())
        kept, pruned = txlog.pruned_files(spark, table, "id >= 200")
        assert planned == sorted(kept)
        assert pruned  # the clustered layout makes the predicate prune

    def test_filtered_read_equals_read_table(self, spark, table):
        got = (
            self._fmt(spark, table)
            .filter("id >= 200 AND price > 100.0")
            .agg(
                F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
            )
            .collect()[0]
        )
        want = (
            txlog.read_table(spark, table, where="id >= 200 AND price > 100.0")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
            .collect()[0]
        )
        assert (got.n, got.s) == (want.n, want.s) and got.n > 0

    def test_all_files_pruned_returns_typed_empty(self, spark, table):
        df = self._fmt(spark, table).filter("id > 1000000")
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["id", "price"]

    def test_pushdown_conf_required(self, spark, table):
        """Spark refuses a pushFilters-implementing source when the
        conf is off (no silent skip) — pinned so the documented
        get_spark/pin_semantics contract stays honest."""
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
        try:
            with pytest.raises(Exception, match="PUSHDOWN_DISABLED"):
                self._fmt(spark, table).count()
        finally:
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", "true"
            )


class TestFormatWriter:
    """df.write.format('txlog') / writeStream.format('txlog') — the
    write side of the registered data source (round 9). Executors
    write files + stats, the driver lands ONE manifest; append unions
    schema, overwrite replaces the live set atomically; streaming
    appends dedup on batch_id."""

    def _reg(self, spark):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)

    def test_batch_lifecycle_roundtrip(self, spark, tmp_path):
        self._reg(spark)
        path = str(tmp_path / "t")  # does not exist: create-by-write

        def w(df, mode):
            df.write.format("txlog").option("path", path).mode(mode).save()

        w(spark.range(0, 100).withColumn("v", F.col("id") * 2), "append")
        assert txlog.read_table(spark, path).count() == 100
        w(spark.range(100, 150).withColumn("v", F.col("id") * 2), "append")
        assert txlog.read_table(spark, path).count() == 150
        # schema-evolving append: manifest schema is the UNION
        w(
            spark.range(150, 160)
            .withColumn("v", F.col("id") * 2)
            .withColumn("w", F.lit("x")),
            "append",
        )
        t = txlog.read_table(spark, path)
        assert t.count() == 160 and t.columns == ["id", "v", "w"]
        # overwrite: one atomic manifest (removes + adds), schema replace
        w(spark.range(0, 7), "overwrite")
        t = txlog.read_table(spark, path)
        assert t.count() == 7 and t.columns == ["id"]
        # history intact: time travel still reads the pre-overwrite table
        assert txlog.read_table(spark, path, version=2).count() == 160
        assert txlog.committed_versions(path) == [0, 1, 2, 3]
        # the format READ side sees the format-written table
        got = (
            spark.read.format("txlog").option("path", path).load().count()
        )
        assert got == 7

    def test_written_files_carry_pruning_stats(self, spark, tmp_path):
        """Format-written files must prune exactly like API-written
        ones: stats are lifted from each task's own footer."""
        self._reg(spark)
        path = str(tmp_path / "t")
        (
            spark.range(0, 400)
            .withColumn("price", F.col("id").cast("double"))
            .repartitionByRange(4, "id")
            .write.format("txlog")
            .option("path", path)
            .mode("append")
            .save()
        )
        kept, pruned = txlog.pruned_files(spark, path, "id >= 300")
        assert len(kept) == 1 and len(pruned) == 3
        n = txlog.read_table(spark, path, where="id >= 300").count()
        assert n == 100

    def test_abort_unlinks_task_files(self, spark, tmp_path):
        from onechronos_etl_takehome_spark.streaming.txlog_writer import (
            TxlogBatchWriter,
            TxlogWriteMessage,
        )

        self._reg(spark)
        path = str(tmp_path / "t")
        spark.range(5).write.format("txlog").option("path", path).mode(
            "append"
        ).save()
        ghost = os.path.join(path, "part-ghost.parquet")
        with open(ghost, "wb") as f:
            f.write(b"staged by a doomed job")
        wtr = TxlogBatchWriter(
            spark.range(1).schema, False, {"path": path}
        )
        wtr.abort(
            [None, TxlogWriteMessage([("part-ghost.parquet", 1, {}, {})])]
        )
        assert not os.path.exists(ghost)
        assert txlog.read_table(spark, path).count() == 5  # untouched

    def test_stream_writer_rejects_non_append(self, spark):
        from onechronos_etl_takehome_spark.streaming.txlog_writer import (
            TxlogStreamWriter,
        )

        with pytest.raises(ValueError, match="append output mode"):
            TxlogStreamWriter(spark.range(1).schema, True, {"path": "/x"})

    def test_stream_drain_equals_source_and_replay_skips(
        self, spark, tmp_path
    ):
        import json

        from onechronos_etl_takehome_spark.streaming.txlog_writer import (
            TxlogWriteMessage,
            _commit_write,
        )

        self._reg(spark)
        land = str(tmp_path / "land")
        for i in range(3):
            spark.range(i * 10, i * 10 + 10).withColumn(
                "v", F.col("id") * 3
            ).write.mode("append").parquet(land)
        path = str(tmp_path / "t")
        ck = str(tmp_path / "ck")
        q = (
            spark.readStream.schema("id long, v long")
            .parquet(land)
            .writeStream.format("txlog")
            .option("path", path)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        t = txlog.read_table(spark, path)
        src = spark.read.parquet(land)
        assert t.count() == src.count() == 30
        assert t.select("id", "v").exceptAll(src).count() == 0
        with open(
            os.path.join(path, txlog._LOG_DIR, "00000000.json")
        ) as f:
            m = json.load(f)
        assert m.get("batch_id") == 0
        assert m["metrics"]["op"] == "write-append"
        # at-least-once replay of the SAME batch_id: the commit layer
        # must skip (the observable table is exactly-once)
        r = _commit_write(
            path,
            t.schema.json(),
            [TxlogWriteMessage([("ghost.parquet", 5, {}, {})])],
            overwrite=False,
            batch_id=0,
        )
        assert r is None
        assert txlog.read_table(spark, path).count() == 30
        # restart with new landing data: only the delta appends
        spark.range(100, 105).withColumn("v", F.col("id") * 3).write.mode(
            "append"
        ).parquet(land)
        q2 = (
            spark.readStream.schema("id long, v long")
            .parquet(land)
            .writeStream.format("txlog")
            .option("path", path)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q2.awaitTermination(180)
        assert txlog.read_table(spark, path).count() == 35
        assert txlog.committed_versions(path) == [0, 1]

    def test_format_write_composes_with_dml(self, spark, tmp_path):
        """Format-written tables are full citizens: CoW delete,
        change feed, and the metadata count all work on them."""
        self._reg(spark)
        path = str(tmp_path / "t")
        (
            spark.range(0, 100)
            .withColumn("tag", (F.col("id") % 2 == 0).cast("string"))
            .write.format("txlog")
            .option("path", path)
            .mode("append")
            .save()
        )
        txlog.delete_where(spark, path, F.col("tag") == "true")
        assert txlog.read_table(spark, path).count() == 50
        assert txlog.table_count(path) == 50
        feed = txlog.change_feed(spark, path, from_version=0, to_version=1)
        assert feed.filter(F.col("_change") == "delete").count() == 50


class TestTableHistory:
    """txlog.table_history — DESCRIBE HISTORY from manifests alone
    (round 9). The x46 witness oracles op + row metrics; these pin
    the layout/time-dependent columns and the legacy fallback."""

    def test_history_shape_and_ordering(self, spark, table):
        txlog.create_table(spark.range(0, 100), table)
        txlog.append(spark.range(100, 150), table)
        txlog.delete_where(spark, table, F.col("id") < 10)
        h = txlog.table_history(spark, table).collect()
        assert [r.version for r in h] == [2, 1, 0]  # newest first
        assert [r.op for r in h] == ["delete", "append", "create"]
        assert h[-1].rows_written == 100 and h[1].rows_written == 50
        assert h[0].rows_deleted == 10
        # ts is the commit stamp: monotone non-decreasing in version
        ts = [r.ts for r in reversed(h)]
        assert ts == sorted(ts)
        # files counts are exact action counts
        assert h[1].files_added >= 1 and h[1].files_removed == 0
        assert h[0].files_removed >= 1  # CoW delete rewrote file(s)
        assert all(r.batch_id is None for r in h)  # no streaming commit

    def test_streaming_commits_carry_batch_id(self, spark, table, tmp_path):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        land = str(tmp_path / "land")
        spark.range(0, 20).write.parquet(land)
        q = (
            spark.readStream.schema("id long")
            .parquet(land)
            .writeStream.format("txlog")
            .option("path", table)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        h = txlog.table_history(spark, table).collect()
        assert h[0].op == "write-append" and h[0].batch_id == 0
        assert h[0].rows_written == 20

    def test_legacy_manifest_op_fallback(self, spark, table):
        """Pre-metrics manifests (no metrics field) derive op from
        the action shapes: v0 create, adds-only append, else rewrite."""
        import json

        txlog.create_table(spark.range(5), table)
        txlog.append(spark.range(5, 9), table)
        txlog.delete_where(spark, table, F.col("id") < 2)
        log = os.path.join(table, txlog._LOG_DIR)
        for fn in os.listdir(log):
            if not fn.endswith(".json"):
                continue
            p = os.path.join(log, fn)
            with open(p) as f:
                m = json.load(f)
            m.pop("metrics", None)
            with open(p, "w") as f:
                json.dump(m, f)
        h = txlog.table_history(spark, table).collect()
        assert [r.op for r in h] == ["rewrite", "append", "create"]
        assert all(
            r.rows_written is None and r.rows_deleted is None for r in h
        )


class TestMaxBytesPerTrigger:
    """maxBytesPerTrigger — the byte twin of the file limit (Delta's
    option): commit-granular soft max from os.stat on pending files,
    composing with maxFilesPerTrigger (first limit to trip ends the
    batch)."""

    def _backlog(self, spark, table, n_commits=6):
        txlog.create_table(spark.range(0, 10).repartition(1), table)
        for i in range(1, n_commits):
            txlog.append(
                spark.range(i * 10, i * 10 + 10).repartition(1), table
            )

    def _drain(self, spark, table, out, ck, **opts):
        reader = spark.readStream.format("txlog").option("path", table)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return q

    def test_byte_limited_drain_is_bounded_and_complete(
        self, spark, table, tmp_path
    ):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        self._backlog(spark, table, n_commits=6)
        # every file is a small parquet of 10 longs; a 1-byte limit
        # forces one COMMIT per batch (soft max: >= 1 commit always)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        q = self._drain(spark, table, out, ck, maxBytesPerTrigger=1)
        got = spark.read.parquet(out)
        assert got.count() == 60 and got.distinct().count() == 60
        data_batches = [
            p for p in q.recentProgress if int(p["numInputRows"]) > 0
        ]
        assert len(data_batches) >= 6  # one commit per trigger

    def test_byte_and_file_limits_compose(self, spark, table, tmp_path):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        self._backlog(spark, table, n_commits=4)
        out, ck = str(tmp_path / "o"), str(tmp_path / "c")
        # byte limit generous, file limit 1 → file limit trips first
        q = self._drain(
            spark,
            table,
            out,
            ck,
            maxBytesPerTrigger=10**9,
            maxFilesPerTrigger=1,
        )
        got = spark.read.parquet(out)
        assert got.count() == 40 and got.distinct().count() == 40
        data_batches = [
            p for p in q.recentProgress if int(p["numInputRows"]) > 0
        ]
        assert len(data_batches) >= 4


class TestCheckConstraints:
    """sources/constraints.py — Delta-style CHECK constraints: stored
    in the log (time-travelable like the schema field), validated at
    declaration, enforced on every data-adding commit path."""

    def _mk(self, spark, table):
        txlog.create_table(
            spark.range(0, 50).withColumn(
                "price", (F.col("id") + 1).cast("double")
            ),
            table,
        )

    def test_add_validates_existing_and_records(self, spark, table):
        self._mk(spark, table)
        v = C2.add_constraint(spark, table, "pos_price", "price > 0")
        assert v == 1
        assert C2.table_constraints(table) == {"pos_price": "price > 0"}
        # time travel: v0 predates the constraint
        assert C2.table_constraints(table, version=0) == {}
        h = txlog.table_history(spark, table).collect()[0]
        assert h.op == "add-constraint"
        with pytest.raises(ValueError, match="already exists"):
            C2.add_constraint(spark, table, "pos_price", "price > 1")

    def test_add_rejects_violated_by_existing_rows(self, spark, table):
        self._mk(spark, table)
        with pytest.raises(C2.ConstraintViolation, match="50 existing"):
            C2.add_constraint(spark, table, "neg", "price < 0")
        assert C2.table_constraints(table) == {}  # nothing committed
        assert txlog.committed_versions(table) == [0]

    def test_append_enforced_and_nothing_committed(self, spark, table):
        self._mk(spark, table)
        C2.add_constraint(spark, table, "pos_price", "price > 0")
        before = set(txlog.live_files(table))
        with pytest.raises(C2.ConstraintViolation, match="pos_price"):
            txlog.append(
                spark.range(50, 60).withColumn(
                    "price", F.lit(-1.0)
                ),
                table,
            )
        assert txlog.table_count(table) == 50
        assert txlog.committed_versions(table) == [0, 1]
        # the doomed staged files were unlinked, not orphaned
        data_files = {
            f for f in os.listdir(table) if f.endswith(".parquet")
        }
        assert data_files == before
        # conforming append still lands
        txlog.append(
            spark.range(50, 60).withColumn("price", F.lit(2.0)), table
        )
        assert txlog.table_count(table) == 60

    def test_null_passes_check_semantics(self, spark, table):
        self._mk(spark, table)
        C2.add_constraint(spark, table, "pos_price", "price > 0")
        txlog.append(
            spark.range(50, 55).withColumn(
                "price", F.lit(None).cast("double")
            ),
            table,
        )  # NULL is UNKNOWN, not a violation (SQL CHECK semantics)
        assert txlog.table_count(table) == 55

    def test_old_schema_producer_passes_evolved_constraint(
        self, spark, table
    ):
        """A constraint over an evolved column: a pre-evolution
        producer's frame lacks it entirely — reads as NULL, passes."""
        self._mk(spark, table)
        txlog.append(
            spark.range(50, 55)
            .withColumn("price", F.lit(1.0))
            .withColumn("rating", F.lit(5.0)),
            table,
        )
        C2.add_constraint(spark, table, "rating_pos", "rating > 0")
        txlog.append(
            spark.range(55, 60).withColumn("price", F.lit(1.0)), table
        )  # no rating column at all → NULL → passes
        assert txlog.table_count(table) == 60

    def test_format_writer_enforced(self, spark, table):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        self._mk(spark, table)
        C2.add_constraint(spark, table, "pos_price", "price > 0")
        with pytest.raises(Exception, match="pos_price"):
            (
                spark.range(50, 60)
                .withColumn("price", F.lit(-3.0))
                .write.format("txlog")
                .option("path", table)
                .mode("append")
                .save()
            )
        assert txlog.table_count(table) == 50
        (
            spark.range(50, 60)
            .withColumn("price", F.lit(3.0))
            .write.format("txlog")
            .option("path", table)
            .mode("append")
            .save()
        )
        assert txlog.table_count(table) == 60

    def test_merge_enforced(self, spark, table):
        self._mk(spark, table)
        C2.add_constraint(spark, table, "pos_price", "price > 0")
        bad = spark.range(0, 5).withColumn("price", F.lit(-9.0))
        with pytest.raises(C2.ConstraintViolation, match="pos_price"):
            txlog.merge_upsert(spark, table, bad, ["id"])
        assert txlog.table_count(table) == 50
        assert (
            txlog.read_table(spark, table)
            .filter(F.col("price") < 0)
            .count()
            == 0
        )

    def test_drop_reopens_gate(self, spark, table):
        self._mk(spark, table)
        C2.add_constraint(spark, table, "pos_price", "price > 0")
        C2.drop_constraint(spark, table, "pos_price")
        assert C2.table_constraints(table) == {}
        txlog.append(
            spark.range(50, 55).withColumn("price", F.lit(-1.0)), table
        )
        assert txlog.table_count(table) == 55
        with pytest.raises(ValueError, match="no constraint"):
            C2.drop_constraint(spark, table, "pos_price")

    def test_streaming_sink_enforced(self, spark, table, tmp_path):
        from onechronos_etl_takehome_spark.streaming.txlog_stream import (
            process_txlog_batch,
        )

        self._mk(spark, table)
        C2.add_constraint(spark, table, "pos_price", "price > 0")
        bad = spark.range(50, 55).withColumn("price", F.lit(-2.0))
        with pytest.raises(C2.ConstraintViolation):
            process_txlog_batch(bad, 0, table)
        assert txlog.table_count(table) == 50
        ok = spark.range(50, 55).withColumn("price", F.lit(2.0))
        assert process_txlog_batch(ok, 1, table) == 2
        assert txlog.table_count(table) == 55


class TestArrowConstraintEvaluator:
    """validate_arrow — the format writer's per-task enforcement:
    pyarrow Kleene logic == SQL 3VL, fail-closed outside the grammar."""

    def _tbl(self, **cols):
        import pyarrow as pa

        return pa.table(cols)

    def test_3vl_null_passes(self):
        import pyarrow as pa

        tbl = self._tbl(price=pa.array([1.0, None, 3.0]))
        C2.validate_arrow(tbl, {"pos": "price > 0"})  # NULL passes
        with pytest.raises(C2.ConstraintViolation, match="1 row"):
            C2.validate_arrow(
                self._tbl(price=pa.array([1.0, -2.0, None])),
                {"pos": "price > 0"},
            )

    def test_compound_and_in(self):
        import pyarrow as pa

        tbl = self._tbl(
            a=pa.array([1, 2, 3]), s=pa.array(["x", "y", "x"])
        )
        C2.validate_arrow(
            tbl, {"c": "a >= 1 AND s IN ('x', 'y')"}
        )
        with pytest.raises(C2.ConstraintViolation):
            C2.validate_arrow(tbl, {"c": "s IN ('x')"})
        # NOT pushes down exactly
        C2.validate_arrow(tbl, {"c": "NOT (a > 5)"})

    def test_missing_column_is_null_and_passes(self):
        import pyarrow as pa

        tbl = self._tbl(a=pa.array([1, 2]))
        C2.validate_arrow(tbl, {"c": "rating > 0"})  # absent → NULL
        # but IS NOT NULL over an absent column is definitely FALSE
        with pytest.raises(C2.ConstraintViolation, match="2 row"):
            C2.validate_arrow(tbl, {"c": "rating IS NOT NULL"})

    def test_fail_closed_outside_grammar(self):
        import pyarrow as pa

        tbl = self._tbl(a=pa.array([1]))
        with pytest.raises(C2.ConstraintViolation, match="grammar"):
            C2.validate_arrow(tbl, {"c": "length(s) > 3"})

    def test_stream_format_writer_enforced(self, spark, table, tmp_path):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        txlog.create_table(
            spark.range(5).withColumn("price", F.lit(1.0)), table
        )
        C2.add_constraint(spark, table, "pos_price", "price > 0")
        land = str(tmp_path / "land")
        spark.range(5, 9).withColumn("price", F.lit(-4.0)).write.parquet(
            land
        )
        q = (
            spark.readStream.schema("id long, price double")
            .parquet(land)
            .writeStream.format("txlog")
            .option("path", table)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception, match="pos_price"):
            q.awaitTermination(180)
            q.processAllAvailable()
        q.stop()
        assert txlog.table_count(table) == 5  # nothing landed


class TestTypeEnforcement:
    """Round 9: a same-name-different-type write used to COMMIT and
    poison the table (every later mergeSchema read died on
    CANNOT_MERGE_SCHEMAS). Now every data-adding path raises at write
    time and the table stays readable."""

    def test_append_conflict_raises_before_staging(self, spark, table):
        txlog.create_table(
            spark.range(5).withColumn("v", F.col("id").cast("double")),
            table,
        )
        files_before = {
            f for f in os.listdir(table) if f.endswith(".parquet")
        }
        with pytest.raises(ValueError, match="schema enforcement"):
            txlog.append(
                spark.range(5, 9).withColumn("v", F.lit("oops")), table
            )
        # raised BEFORE staging: zero new bytes, one commit, readable
        assert {
            f for f in os.listdir(table) if f.endswith(".parquet")
        } == files_before
        assert txlog.committed_versions(table) == [0]
        assert txlog.read_table(spark, table).count() == 5
        # null-fill evolution (NEW column) still welcome
        txlog.append(
            spark.range(5, 9)
            .withColumn("v", F.lit(1.0))
            .withColumn("w", F.lit("x")),
            table,
        )
        assert txlog.read_table(spark, table).columns == ["id", "v", "w"]

    def test_format_writer_conflict_raises(self, spark, table):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        txlog.create_table(
            spark.range(5).withColumn("v", F.col("id").cast("double")),
            table,
        )
        with pytest.raises(Exception, match="schema enforcement"):
            (
                spark.range(5, 9)
                .withColumn("v", F.lit("oops"))
                .write.format("txlog")
                .option("path", table)
                .mode("append")
                .save()
            )
        assert txlog.committed_versions(table) == [0]
        assert txlog.read_table(spark, table).count() == 5

    def test_merge_conflict_raises(self, spark, table):
        txlog.create_table(
            spark.range(5).withColumn("v", F.col("id").cast("double")),
            table,
        )
        with pytest.raises(ValueError, match="schema enforcement"):
            txlog.merge_upsert(
                spark,
                table,
                spark.range(0, 2).withColumn("v", F.lit("oops")),
                ["id"],
            )
        assert txlog.read_table(spark, table).count() == 5


class TestStartingTimestamp:
    """startingTimestamp on the stream source (Delta's option):
    deliver commits stamped at-or-after the timestamp."""

    def _mk(self, spark, table):
        txlog.create_table(spark.range(0, 10).repartition(1), table)
        time.sleep(0.05)
        mid = time.time()
        time.sleep(0.05)
        txlog.append(spark.range(10, 20).repartition(1), table)
        txlog.append(spark.range(20, 30).repartition(1), table)
        return mid

    def _drain(self, spark, table, out, ck, **opts):
        reader = spark.readStream.format("txlog").option("path", table)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        return spark.read.parquet(out)

    def test_mid_history_timestamp(self, spark, table, tmp_path):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        mid = self._mk(spark, table)
        got = self._drain(
            spark,
            table,
            str(tmp_path / "o"),
            str(tmp_path / "c"),
            startingTimestamp=mid,
        )
        # only versions 1 and 2 (stamped after mid) flow
        assert sorted(r.id for r in got.collect()) == list(range(10, 30))

    def test_past_head_timestamp_tails_only_new(
        self, spark, table, tmp_path
    ):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        self._mk(spark, table)
        future = time.time() + 3600
        reader = (
            spark.readStream.format("txlog")
            .option("path", table)
            .option("startingTimestamp", future)
        )
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "o"))
            .option("checkpointLocation", str(tmp_path / "c"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        import glob

        part = glob.glob(str(tmp_path / "o" / "*.parquet"))
        n = spark.read.parquet(str(tmp_path / "o")).count() if part else 0
        assert n == 0  # history excluded; only future commits flow

    def test_both_options_rejected(self, spark, table, tmp_path):
        from onechronos_etl_takehome_spark.streaming.txlog_source import (
            TxlogStreamSource,
        )

        spark.dataSource.register(TxlogStreamSource)
        self._mk(spark, table)
        with pytest.raises(Exception, match="not both"):
            (
                spark.readStream.format("txlog")
                .option("path", table)
                .option("startingVersion", 0)
                .option("startingTimestamp", time.time())
                .load()
                .writeStream.format("noop")
                .option("checkpointLocation", str(tmp_path / "c"))
                .trigger(availableNow=True)
                .start()
                .awaitTermination(60)
            )


class TestConstraintCarryForward:
    """Every schema-stamping commit carries the constraint set
    forward (possibly {}), so table_constraints answers from the
    NEWEST manifest in O(1) instead of scanning the log."""

    def test_newest_manifest_always_carries_constraints(
        self, spark, table
    ):
        import json

        def newest_manifest():
            v = txlog.committed_versions(table)[-1]
            with open(
                os.path.join(table, txlog._LOG_DIR, f"{v:08d}.json")
            ) as f:
                return json.load(f)

        txlog.create_table(
            spark.range(5).withColumn("p", F.lit(1.0)), table
        )
        txlog.append(spark.range(5, 9).withColumn("p", F.lit(1.0)), table)
        assert newest_manifest()["constraints"] == {}
        C2.add_constraint(spark, table, "pos", "p > 0")
        txlog.append(spark.range(9, 12).withColumn("p", F.lit(2.0)), table)
        assert newest_manifest()["constraints"] == {"pos": "p > 0"}
        assert C2.table_constraints(table) == {"pos": "p > 0"}
        C2.drop_constraint(spark, table, "pos")
        txlog.append(
            spark.range(12, 14).withColumn("p", F.lit(-1.0)), table
        )  # gate re-opened
        assert newest_manifest()["constraints"] == {}
        assert C2.table_constraints(table) == {}
        # time travel still answers historical sets
        assert C2.table_constraints(table, version=3) == {"pos": "p > 0"}
