"""Streaming z-score anomaly gate: multi-batch run over in-order data
must flag exactly the events the batch x12 form flags (values chosen
exact under x12's DECIMAL(14,2) quantization and far from the 3-sigma
boundary), with state carrying history across batches."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.streaming.anomaly_stream import (
    zscore_anomaly_stream,
)


def _events(spark):
    # user 1: values 10.0/10.5 alternating (tight), one 100.0 spike at
    # event 20 (flagged), then recovery values re-poison the history.
    # user 2: fewer than min_history events, never flagged.
    rows = []
    base = "2024-01-01 00:{m:02d}:00"
    vals = [10.0, 10.5] * 9
    vals[12] = 100.0  # the spike, with 12 prior points
    for i, v in enumerate(vals):
        rows.append((i, base.format(m=i), 1, "view", v))
    for i in range(3):
        rows.append((100 + i, base.format(m=i), 2, "view", 10.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    )
    return df.select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
        "event_type", "value", F.lit(None).cast("string").alias("props"),
    )


def test_stream_matches_batch_x12_on_ordered_arrival(spark, tmp_path):
    pin_semantics(spark)
    ev = _events(spark)

    # batch reference: the x12 catalog query over the same parquet
    path = str(tmp_path / "events_tbl")
    ev.write.mode("overwrite").parquet(path + "/events.parquet")
    from onechronos_etl_takehome_spark.plans import QUERIES

    batch_flags = {
        (r.user_id, r.event_id)
        for r in QUERIES["x12_rolling_zscore_anomalies"](spark, path).collect()
    }
    assert batch_flags, "vacuous: batch form flagged nothing"

    # stream: two time-ordered files -> two microbatches; history spans
    # the split (the spike's 12 priors straddle both batches)
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev.filter("event_id < 8 or event_id >= 100").coalesce(1).write.parquet(src + "/a")
    ev.filter("8 <= event_id and event_id < 100").coalesce(1).write.parquet(src + "/b")
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
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
        zscore_anomaly_stream(stream)
        .writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.event_id)
        for r in spark.sql("SELECT * FROM anom_out").collect()
    }
    assert got == batch_flags
