"""Incremental rollup maintenance: increments == full recompute,
ledger-idempotent replays, and the exactly-once streaming sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.rollup import (
    apply_increment,
    hourly_event_rollup_increment,
)
from onechronos_etl_takehome_spark.sources.tables import load_table
from onechronos_etl_takehome_spark.sources.upsert import read_keyed_table

SF_DIR = "/root/testdata/sf0.001"
KEYS = ["window_start", "event_type"]
SUMS = ["n", "total_value"]


def _events(spark):
    return load_table(spark, SF_DIR, "events")


def _canon(df):
    return {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in df.collect()
    }


def test_increments_equal_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    events = _events(spark)
    # Three disjoint deterministic slices covering everything.
    for i in range(3):
        batch = events.filter(F.col("event_id") % 3 == i)
        res = apply_increment(
            spark,
            path,
            hourly_event_rollup_increment(batch),
            keys=KEYS,
            sum_cols=SUMS,
            batch_id=f"b{i}",
        )
        assert res["applied"]
    incremental = _canon(read_keyed_table(spark, path))
    full = _canon(hourly_event_rollup_increment(events))
    assert incremental == full


def test_replayed_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "rollup")
    events = _events(spark)
    inc = hourly_event_rollup_increment(events.filter(F.col("event_id") % 5 == 0))
    first = apply_increment(
        spark, path, inc, keys=KEYS, sum_cols=SUMS, batch_id="b0"
    )
    before = _canon(read_keyed_table(spark, path))
    replay = apply_increment(
        spark, path, inc, keys=KEYS, sum_cols=SUMS, batch_id="b0"
    )
    assert first["applied"] and not replay["applied"]
    assert _canon(read_keyed_table(spark, path)) == before
    # A NEW batch id still applies.
    nxt = apply_increment(
        spark,
        path,
        hourly_event_rollup_increment(events.filter(F.col("event_id") % 5 == 1)),
        keys=KEYS,
        sum_cols=SUMS,
        batch_id="b1",
    )
    assert nxt["applied"] and nxt["version"] == first["version"] + 1


def test_schema_stable_across_versions(spark, tmp_path):
    """Decimal sums must not widen a digit per applied batch."""
    path = str(tmp_path / "rollup")
    events = _events(spark)
    schemas = []
    for i in range(3):
        apply_increment(
            spark,
            path,
            hourly_event_rollup_increment(events.filter(F.col("event_id") % 3 == i)),
            keys=KEYS,
            sum_cols=SUMS,
            batch_id=f"b{i}",
        )
        schemas.append(dict(read_keyed_table(spark, path).dtypes))
    assert schemas[0] == schemas[1] == schemas[2]


def test_late_data_merges_into_old_windows(spark, tmp_path):
    """Contract difference vs a watermarked streaming aggregation: the
    ledger-rollup has no watermark, so an arbitrarily late event still
    lands in its (old) hour bucket — the table is the accumulator, and
    corrections merge instead of being dropped. (The watermarked
    streaming path in streaming/events_stream.py makes the opposite,
    bounded-state trade; tests/test_late_data.py pins that side.)"""
    path = str(tmp_path / "rollup")
    events = _events(spark)
    first_hour = hourly_event_rollup_increment(events).orderBy("window_start")
    target_window = first_hour.first()["window_start"]

    # Batch 0: everything EXCEPT one early-hour slice.
    early = events.filter(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        == target_window
    )
    rest = events.exceptAll(early)
    apply_increment(
        spark, path, hourly_event_rollup_increment(rest),
        keys=KEYS, sum_cols=SUMS, batch_id="b0",
    )
    # Batch 1 arrives much later, carrying only the old-hour events.
    apply_increment(
        spark, path, hourly_event_rollup_increment(early),
        keys=KEYS, sum_cols=SUMS, batch_id="b1-late",
    )
    assert _canon(read_keyed_table(spark, path)) == _canon(
        hourly_event_rollup_increment(events)
    )


def test_streaming_rollup_matches_batch(spark, tmp_path):
    from onechronos_etl_takehome_spark.streaming.events_stream import (
        read_events_stream,
        write_stream_rollup,
    )

    path = str(tmp_path / "rollup")
    q = write_stream_rollup(
        read_events_stream(spark, SF_DIR),
        path,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    streamed = _canon(read_keyed_table(spark, path))
    batch = _canon(hourly_event_rollup_increment(_events(spark)))
    assert streamed == batch
    assert os.path.exists(os.path.join(path, "_APPLIED"))
