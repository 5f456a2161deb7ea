"""Stream-stream interval join vs its batch twin (exact match for the
inner join: all in-window matches emit within the availableNow run),
plus the left-outer emission contract: a null-matched purchase emits
only after the watermark passes the end of its match window."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.sources.tables import load_table
from onechronos_etl_takehome_spark.streaming import read_events_stream
from onechronos_etl_takehome_spark.streaming.events_stream import (
    purchase_view_interval_join,
)

SF = "/root/testdata/sf0.001"

_H = 3_600 * 1_000_000_000  # one hour in nanos
_T0 = 1_700_000_000 * 1_000_000_000


def _write_events_file(path, rows):
    """rows: (event_id, ts_nanos, user_id, event_type, value)."""
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.int64()),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array([None] * len(rows), pa.string()),
            }
        ),
        path,
    )


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    pin_semantics(spark)
    joined = purchase_view_interval_join(read_events_stream(spark, SF))
    q = (
        joined.writeStream.format("memory")
        .queryName("pv_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {
        (r.purchase_id, r.view_id) for r in spark.table("pv_join").collect()
    }

    e = load_table(spark, SF, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    expected = {
        (r.purchase_id, r.view_id)
        for r in p.join(
            v,
            (F.col("user_id") == F.col("vu"))
            & (F.col("vts") <= F.col("pts"))
            & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_stream_left_outer_emission_timing(spark, tmp_path):
    """Left-outer contract across microbatches (lookback=1h, wm=2h):

    - batch 1: P1 (user 1, no view) and P2 (user 2, view V2 30min
      earlier). The inner match (P2, V2) emits in batch 1; P1 must NOT
      emit yet — a matching view could still arrive.
    - batch 2: events at T0+4h push both side watermarks to T0+2h,
      past P1's window end (T0) → (P1, null) emits on a later batch.
    - P3 (T0+4h, no view) stays open at end-of-stream and never emits.
    """
    pin_semantics(spark)
    src = tmp_path / "events.parquet"
    os.makedirs(src)
    _write_events_file(
        str(src / "a-batch1.parquet"),
        [
            (1, _T0, 1, "purchase", 10.0),  # P1: no view for user 1
            (2, _T0, 2, "purchase", 20.0),  # P2
            (3, _T0 - _H // 2, 2, "view", 0.0),  # V2 inside P2's window
        ],
    )
    _write_events_file(
        str(src / "b-batch2.parquet"),
        [
            (4, _T0 + 4 * _H, 3, "purchase", 30.0),  # P3: window open at EOS
            (5, _T0 + 4 * _H, 99, "view", 0.0),  # advances view watermark
        ],
    )
    os.utime(str(src / "a-batch1.parquet"), (1_000_000, 1_000_000))
    os.utime(str(src / "b-batch2.parquet"), (2_000_000, 2_000_000))

    joined = purchase_view_interval_join(
        read_events_stream(spark, str(tmp_path), max_files_per_trigger=1),
        how="left_outer",
    )
    batches: dict[int, list] = {}

    def sink(batch_df, batch_id):
        batches[batch_id] = batch_df.collect()

    q = (
        joined.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    emitted = {
        bid: {(r.purchase_id, r.view_id) for r in rows}
        for bid, rows in batches.items()
    }
    all_rows = set().union(*emitted.values()) if emitted else set()
    assert all_rows == {(2, 3), (1, None)}  # P3 never emits
    # The inner match lands in the first batch; the null-matched P1 only
    # after the batch that advanced the watermark past its window.
    assert (2, 3) in emitted.get(0, set())
    assert (1, None) not in emitted.get(0, set())
    assert (1, None) not in emitted.get(1, set())
