"""Round-6 operator tests: the single-pass drift core, malformed-media
error contracts, dHash blocking-losslessness guard, and session-scoped
bucketed layouts."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators import multimodal as mm
from onechronos_etl_takehome_spark.operators.drift import (
    histogram_drift,
    histogram_drift_flagged,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# x25 drift: flagged single-pass core
# ---------------------------------------------------------------------------


def test_drift_flagged_equals_two_frame_form(spark):
    """The single-pass flagged core and the two-frame wrapper are the
    same function: identical reports on an asymmetric split."""
    rows = [
        ("g1", float(v), v % 3 == 0) for v in range(1, 151)
    ] + [("g2", float(v * 7 % 97), v % 4 == 0) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "grp string, value double, is_b boolean")
    flagged = histogram_drift_flagged(df, "value", ["grp"], "is_b")
    a = df.filter(~F.col("is_b")).select("grp", "value")
    b = df.filter(F.col("is_b")).select("grp", "value")
    wrapped = histogram_drift(a, b, "value", ["grp"])
    got = sorted(map(tuple, flagged.collect()))
    want = sorted(map(tuple, wrapped.collect()))
    assert got == want
    # sanity: both groups present with correct totals
    assert [(r[0], r[1], r[2]) for r in got] == [
        ("g1", 100, 50),
        ("g2", 75, 25),
    ]


def test_drift_tvd_is_null_when_one_window_is_empty(spark):
    """A group entirely absent from one window has an undefined ratio:
    tvd must be NULL (identically on both engines), never a divide-by-
    zero inf/NaN divergence."""
    df = spark.createDataFrame(
        [("only_a", float(v), False) for v in range(1, 51)],
        "grp string, value double, is_b boolean",
    )
    r = histogram_drift_flagged(df, "value", ["grp"], "is_b").collect()[0]
    assert r.n_a == 50 and r.n_b == 0
    assert r.tvd is None
    assert r.l1_num == 0.0  # every |n_a_bin·0 − 0·n_a| term is 0


def test_drift_accumulates_past_int64(spark):
    """The L1 numerator rides DECIMAL(38,0): with planted counts whose
    cross products exceed int64 (n·N ≈ 4e18 each, summed ≈ 2.4e19),
    the old long·long form wrapped negative under the pinned non-ANSI
    semantics; the decimal lattice must report the exact value (cast
    to double at the end)."""
    n = 2_000_000_000  # per-bin count; n * 2n = 8e18 ≈ int64 max / 1.15
    rows = [
        ("g", 0, n, 0),  # bin 0: all of window A
        ("g", 9, 0, 2 * n),  # bin 9: all of window B
    ]
    pre = spark.createDataFrame(
        rows, "grp string, bin long, n_a_c long, n_b_c long"
    )
    # feed the pre-binned counts through the same aggregation tail the
    # operator uses, by reconstructing its post-bin arithmetic: the
    # planted disjoint histograms give l1 = 2 · n·(2n) · ... exactly
    from pyspark.sql.window import Window

    w = Window.partitionBy("grp")
    j = pre.select(
        "grp",
        F.col("n_a_c").alias("n_a_bin"),
        F.col("n_b_c").alias("n_b_bin"),
        F.sum("n_a_c").over(w).alias("_na"),
        F.sum("n_b_c").over(w).alias("_nb"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    l1 = F.abs(dec("n_a_bin") * dec("_nb") - dec("n_b_bin") * dec("_na"))
    out = j.groupBy("grp").agg(
        F.sum(l1).cast("double").alias("l1_num"),
        (
            F.sum(l1).cast("double")
            / (F.lit(2.0) * F.min("_na") * F.min("_nb"))
        ).alias("tvd"),
    ).collect()[0]
    exact = 2 * (n * 2 * n)  # 1.6e19 > int64 max
    assert exact > 2**63 - 1
    assert out.l1_num == float(exact)
    assert out.tvd == pytest.approx(1.0)


def test_x25_plan_has_no_scan_fanout(spark):
    """Round-5 defect regression: the catalog row's post-checkpoint
    plan must not re-execute the events scan per branch — zero parquet
    scans and zero shuffle exchanges downstream of the one-pass
    grouped count (everything after it is dimension-sized)."""
    from onechronos_etl_takehome_spark.plans.catalog import QUERIES

    df = QUERIES["x25_distribution_drift"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Scan parquet" not in plan
    assert "Exchange hashpartitioning" not in plan


# ---------------------------------------------------------------------------
# malformed media payloads: ValueError contract, not job death
# ---------------------------------------------------------------------------


def _truncated_wav() -> bytes:
    """Valid RIFF/WAVE magic, fmt chunk truncated to 8 bytes — the
    payload that leaked struct.error out of wav_samples."""
    body = b"fmt " + (8).to_bytes(4, "little") + b"\x01\x00\x02\x00ABCD"
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def test_wav_samples_raises_valueerror_on_truncated_fmt():
    with pytest.raises(ValueError):
        mm.wav_samples(_truncated_wav())


def test_decode_features_survives_corrupt_wav(spark):
    """One corrupt WAV in a batch falls to the stub path; the healthy
    sibling still decodes for real."""
    good = mm.synthesize_wav(400, 8000, 220.0, seed=7)
    payloads = spark.createDataFrame(
        [(1, bytearray(_truncated_wav()), "audio"), (2, bytearray(good), "audio")],
        "id long, content binary, modality string",
    )
    rows = {r.id: r for r in mm.decode_features(payloads).collect()}
    assert rows[1].decoder == "stub"
    assert rows[2].decoder == "wav"


def test_audio_fingerprints_skip_corrupt_wav(spark):
    from onechronos_etl_takehome_spark.operators.audio import (
        audio_fingerprints,
    )

    good = mm.synthesize_wav(2000, 8000, 440.0, seed=11)
    payloads = spark.createDataFrame(
        [(1, bytearray(_truncated_wav())), (2, bytearray(good))],
        "id long, content binary",
    )
    rows = audio_fingerprints(payloads).collect()
    assert {r.id for r in rows} == {2}  # corrupt payload dropped, job alive


# ---------------------------------------------------------------------------
# dHash banded blocking: lossless-by-default guard
# ---------------------------------------------------------------------------


def test_dhash_near_pairs_default_tracks_bands(spark):
    hashed = spark.createDataFrame(
        [(1, 0), (2, 1)], "id long, dhash long"
    )
    # default radius = bands-1 (lossless); hamming-1 pair is found
    rows = mm.dhash_near_pairs(hashed, bands=4).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in rows] == [(1, 2, 1)]


def test_dhash_near_pairs_rejects_lossy_radius(spark):
    hashed = spark.createDataFrame([(1, 0)], "id long, dhash long")
    with pytest.raises(ValueError, match="lossless"):
        mm.dhash_near_pairs(hashed, max_hamming=10, bands=4)


# ---------------------------------------------------------------------------
# x26: SCD2 dimension build
# ---------------------------------------------------------------------------


def test_scd2_versions_are_contiguous_and_collapse_runs(spark):
    """Per user: versions number 1..n in time order, each version's
    valid_to equals the next version's valid_from (half-open ranges
    tile the timeline), exactly ONE open version, and consecutive
    versions never share a state (runs collapsed)."""
    from onechronos_etl_takehome_spark.plans.catalog import QUERIES

    rows = QUERIES["x26_scd2_dimension"](spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [v.version for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v.is_current for v in vs) == 1
        assert vs[-1].is_current and vs[-1].valid_to == "current"
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state  # runs collapsed


def test_scd2_apply_equals_rebuild_on_every_cutoff(spark):
    """Incremental maintenance contract on a hand-built log exercising
    every edge: run continuation across the cutoff, a key with no new
    changes, a brand-new key in the increment, and a multi-change
    increment — for EVERY possible cutoff position, apply(build(hist),
    inc) must equal build(full)."""
    from onechronos_etl_takehome_spark.operators.scd2 import (
        scd2_apply,
        scd2_build,
    )

    log = [
        # (user, state, ts_epoch, tiebreak)
        (1, "a", 10, 1),
        (1, "a", 20, 2),  # same-run repeat
        (1, "b", 30, 3),
        (1, "b", 40, 4),
        (1, "a", 50, 5),
        (2, "x", 15, 6),
        (2, "x", 55, 7),  # run continues across late cutoffs
        (3, "q", 60, 8),  # key born late
    ]

    def frame(rows):
        df = spark.createDataFrame(
            rows, "user_id long, state string, t long, event_id long"
        )
        return df.select(
            "user_id",
            "state",
            F.timestamp_seconds("t").alias("ts"),
            "event_id",
        )

    full = sorted(
        map(
            tuple,
            scd2_build(frame(log), "user_id", "state", "ts", "event_id")
            .collect(),
        )
    )
    for cut in range(1, len(log)):
        hist, inc = log[:cut], log[cut:]
        # the log is not globally time-ordered across users, so split
        # by timestamp rank to honor the append-only contract
        hist = [r for r in log if r[2] <= sorted(x[2] for x in log)[cut - 1]]
        inc = [r for r in log if r not in hist]
        if not inc:
            continue
        dim = scd2_build(frame(hist), "user_id", "state", "ts", "event_id")
        merged = scd2_apply(
            dim, frame(inc), "user_id", "state", "ts", "event_id"
        )
        got = sorted(map(tuple, merged.collect()))
        assert got == full, f"cutoff after {cut} rows diverged"


# ---------------------------------------------------------------------------
# t24: contrastive negative sampling
# ---------------------------------------------------------------------------


def test_t24_negatives_never_share_anchor_group(spark):
    """Each anchor draws at most k=3 negatives; a negative never comes
    from the anchor's exact-dup group (its own content can't be its
    negative); and the draw is deterministic across runs."""
    from pyspark.sql import functions as F  # noqa: F811

    from onechronos_etl_takehome_spark.plans.catalog import QUERIES
    from onechronos_etl_takehome_spark.sources.tables import load_table

    out = QUERIES["t24_contrastive_negatives"](spark, SF)
    rows = out.collect()
    grp = {
        r.doc_id: r.g
        for r in load_table(spark, SF, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.md5("text").alias("g"))
        .collect()
    }
    per_anchor: dict[int, set] = {}
    for r in rows:
        per_anchor.setdefault(r.anchor_id, set()).add(r.neg_id)
        assert grp[r.anchor_id] != grp[r.neg_id]
        assert r.neg_id != r.anchor_id
    assert per_anchor
    assert max(len(v) for v in per_anchor.values()) <= 3
    # determinism: a second build returns the identical sample
    again = sorted(
        map(tuple, QUERIES["t24_contrastive_negatives"](spark, SF).collect())
    )
    assert again == sorted(map(tuple, rows))


# ---------------------------------------------------------------------------
# m11: multimodal ingestion from disk via binaryFile
# ---------------------------------------------------------------------------


def test_m11_lineage_starts_at_binaryfile_scan(spark):
    # The decode subtree (what dhash_near_pairs now materializes ONCE
    # via truncate_lineage — round-14 optimization) must start at a
    # real binaryFile scan, not demo synthesis. The final joined plan
    # is checkpoint-rooted, so assert on the ingest subtree — via the
    # SAME helper the registered m11 query calls
    # (mm.binaryfile_image_payloads; round-14 advice closed the drift
    # hole where this test hand-rebuilt the construction).
    from onechronos_etl_takehome_spark.operators import multimodal as mm

    corpus = mm.materialize_demo_image_corpus(SF)
    payloads = mm.binaryfile_image_payloads(spark, corpus)
    df = mm.image_dhash(payloads)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "binaryFile" in plan  # real disk ingestion, not demo synth


def test_m11_matches_m08_pair_set(spark):
    """The disk path and the in-query synthesis path are the same
    operator: identical corpus content (pure function of doc_id) must
    give identical near-dup pairs."""
    from onechronos_etl_takehome_spark.plans.catalog import QUERIES

    m11 = sorted(
        map(tuple, QUERIES["m11_binaryfile_image_neardup"](spark, SF).collect())
    )
    m08 = sorted(
        map(tuple, QUERIES["m08_image_dhash_neardup"](spark, SF).collect())
    )
    assert m11 == m08
    assert len(m11) > 0  # non-vacuous: the planted pairs are found


# ---------------------------------------------------------------------------
# bucketed layout: session-scoped, concurrency-safe
# ---------------------------------------------------------------------------


def test_bucketed_pair_concurrent_sessions_no_clobber(spark):
    """Two sessions running the bucketed join simultaneously must not
    race each other's files or catalog entries (round-5 defect: a
    fixed /tmp path keyed only by sf-dir). Layouts are uuid-scoped per
    write and cached per application, so both sessions see correct
    results and the layout is written once."""
    from onechronos_etl_takehome_spark.plans.catalog import QUERIES

    sessions = [spark, spark.newSession()]
    results: dict[int, list] = {}
    errors: list[Exception] = []

    def run(i: int) -> None:
        try:
            df = QUERIES["x24_bucketed_join"](sessions[i], SF)
            results[i] = sorted(map(tuple, df.collect()))
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert results[0] == results[1]
    assert len(results[0]) == 5  # one row per mktsegment


def test_x28_pointintime_semantics(spark):
    """Point-in-time lookup invariants on the catalog row: every
    purchase joins at most one dimension version; the joined state is
    the LATEST state change at-or-before the purchase; purchases
    before any state change read ('none', 0, 'never')."""
    from onechronos_etl_takehome_spark.plans.catalog import QUERIES

    rows = QUERIES["x28_scd2_pointintime"](spark, SF).collect()
    assert rows
    # one output row per purchase event (half-open ranges can't
    # amplify the fact side)
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))
    dim = {
        (r.user_id, r.version): r
        for r in QUERIES["x26_scd2_dimension"](spark, SF).collect()
        if r.state != "purchase"
    }
    # rebuild the non-purchase dimension independently per user:
    # state_since must be the max valid_from <= purchase_ts among
    # non-purchase versions of that user
    by_user: dict[int, list] = {}
    e = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_type",
            "event_id",
        )
        .collect()
    )
    for r in e:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    for r in rows:
        hist = sorted(t for t in by_user.get(r.user_id, []) if t[0] <= r.purchase_ts)
        if not hist:
            assert (r.state_at_purchase, r.state_version, r.state_since) == (
                "none",
                0,
                "never",
            )
        else:
            assert r.state_at_purchase == hist[-1][2]
            assert r.state_since <= r.purchase_ts
