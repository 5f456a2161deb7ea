"""Watermark late-data policy, observed across real microbatches.

Files forced into separate microbatches (maxFilesPerTrigger=1) pin the
actual Structured Streaming contract:

- the late-event filter uses the watermark as of the PREVIOUS batch's
  start (one commit of lag), so data is dropped only once the
  watermark advance has fully propagated;
- lateness is enforced at WINDOW granularity: an event is dropped when
  its entire window ends at-or-before that watermark;
- append mode emits a window exactly once, after the watermark passes
  its end.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.session import pin_semantics


def _write(spark, rows, path):
    """Write rows as a single parquet FILE at ``path`` (the file-stream
    source lists plain files, not write-output directories)."""
    import glob
    import os
    import shutil
    import tempfile

    staging = tempfile.mkdtemp()
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.copy(part, path)


def test_watermark_drops_late_events(spark, tmp_path):
    pin_semantics(spark)
    import time

    src = tmp_path / "stream_src"
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731

    # batch 0: 7:00 + 10:00 → watermark advances to 9:00 at commit
    _write(spark, [(1, t(7), 1, 1.0), (2, t(10), 1, 1.0)], str(src / "f1.parquet"))
    time.sleep(1.1)
    # batch 1: cycles the commit so 9:00 becomes the late-filter bound
    _write(spark, [(10, t(10, 5), 1, 1.0)], str(src / "f2.parquet"))
    time.sleep(1.1)
    # batch 2 (late-filter wm = 9:00): 7:30 (window ends 8:00) and 8:30
    # (window ends 9:00) are both dropped
    _write(
        spark,
        [(3, t(7, 30), 1, 1.0), (4, t(8, 30), 1, 1.0)],
        str(src / "f3.parquet"),
    )
    time.sleep(1.1)
    # batch 3: pushes the watermark to 11:00 so open windows finalize
    _write(spark, [(6, t(12), 1, 1.0)], str(src / "f4.parquet"))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("win"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_data")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {r.win: r.n for r in spark.table("late_data").collect()}

    assert got.get("07:00") == 1  # event 1 only — late event 3 dropped
    assert "08:00" not in got  # event 4 dropped → window never emitted
    assert got.get("10:00") == 2  # events 2 + 10, finalized by batch 3
