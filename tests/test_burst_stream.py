"""Native session_window burst collapse: batch equivalence with the
x11 window-lag form, and streaming append-mode emission."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.sources.tables import load_table
from onechronos_etl_takehome_spark.streaming.burst_stream import burst_collapse

SF = "/root/testdata/sf0.001"


def test_batch_equivalence_with_x11(spark):
    """On the real events table (no exact-5-minute gaps — verified
    inside) the native session_window aggregation must produce exactly
    the bursts the window-lag x11 query finds."""
    pin_semantics(spark)
    from onechronos_etl_takehome_spark.plans import QUERIES

    e = load_table(spark, SF, "events")
    # boundary guard: the two forms legitimately differ on exact-gap
    # events; assert the corpus has none so the equality below is real
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    n_boundary = (
        e.withColumn("_gap", F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w))
        .filter(F.col("_gap") == 300_000_000)
        .count()
    )
    assert n_boundary == 0, "testdata has exact-boundary gaps; pick another gap"

    native = {
        (r.user_id, r.event_type, r.first_event_id, r.burst_size)
        for r in burst_collapse(e).collect()
    }
    lagform = {
        (r.user_id, r.event_type, r.first_event_id, r.burst_size)
        for r in QUERIES["x11_burst_throttle_dedup"](spark, SF).collect()
    }
    assert native == lagform and native


def test_streaming_append_emission(spark, tmp_path):
    """availableNow streaming run: bursts emit in append mode once the
    watermark (advanced by a later file) passes their end."""
    pin_semantics(spark)
    rows = [
        (1, "2024-01-01 00:00:00", 7, "view"),
        (2, "2024-01-01 00:02:00", 7, "view"),
        (3, "2024-01-01 00:30:00", 7, "view"),
        (4, "2024-01-01 00:00:00", 8, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type")
    flush = spark.createDataFrame(
        [(99, "2024-01-02 00:00:00", 999, "flush")],
        "event_id long, ts_s string, user_id long, event_type string",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type")

    src = str(tmp_path / "src")
    os.makedirs(src)
    ev.coalesce(1).write.parquet(src + "/a")
    flush.coalesce(1).write.parquet(src + "/b")
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    import glob

    for i, f in enumerate(
        sorted(glob.glob(src + "/a/*.parquet")) + sorted(glob.glob(src + "/b/*.parquet"))
    ):
        os.link(f, os.path.join(staged, f"{i}.parquet"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    q = (
        burst_collapse(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("bursts_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.event_type, r.first_event_id, r.burst_size)
        for r in spark.sql("SELECT * FROM bursts_out").collect()
    }
    # user 7: burst {1,2} then {3}; user 8: {4}. The flush user's own
    # burst never closes (nothing advances the watermark past it).
    assert got == {(7, "view", 1, 2), (7, "view", 3, 1), (8, "click", 4, 1)}
