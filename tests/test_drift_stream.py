"""Streaming drift monitor: per closed event-time window, the
streamed report must carry the exact integer TVD of that window vs
the pinned-grid baseline — values planted so the expected histograms
(and hence l1_num/tvd) are known in closed form — with counts
accumulating across microbatches before the watermark closes the
window."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.streaming.drift_stream import (
    baseline_histogram,
    read_drift_reports,
    windowed_histogram_stream,
    write_drift_reports,
)

SCHEMA = "ts timestamp, grp string, value double"


def _rows(spark, day: str, values):
    return spark.createDataFrame(
        [(f"2024-01-{day} 06:00:00", "g", float(v)) for v in values],
        "ts_s string, grp string, value double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "grp", "value")


def test_streamed_reports_match_closed_form(spark, tmp_path):
    pin_semantics(spark)
    land = str(tmp_path / "land")
    out = str(tmp_path / "reports")
    os.makedirs(land)

    # baseline: 100×5.0 (bin 0) + 100×95.0 (bin 9; grid_max = 9500)
    baseline = _rows(spark, "01", [5.0] * 100 + [95.0] * 100)
    hist, grid_max = baseline_histogram(baseline, "value", ["grp"])
    assert grid_max == 9500

    # day 2: same shape at half mass -> TVD exactly 0
    _rows(spark, "02", [5.0] * 50 + [95.0] * 50).coalesce(1).write.parquet(
        os.path.join(land, "f1")
    )
    # day 3: all mass in the top bin (200.0 clamps into bin 9 on the
    # pinned grid) -> TVD exactly 0.5
    _rows(spark, "03", [95.0] * 100 + [200.0] * 100).coalesce(1).write.parquet(
        os.path.join(land, "f2")
    )
    # sentinel far in the future: advances the watermark so both real
    # windows finalize (its own window stays open - never reported)
    _rows(spark, "10", [5.0]).coalesce(1).write.parquet(
        os.path.join(land, "f3")
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(land, "*"))
    )
    windowed = windowed_histogram_stream(
        stream, "value", ["grp"], grid_max, window="1 day", watermark="1 day"
    )
    q = write_drift_reports(windowed, hist, ["grp"], out).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    reports = {
        str(r.window_start): r
        for r in read_drift_reports(spark, out).collect()
    }
    assert set(reports) == {"2024-01-02 00:00:00", "2024-01-03 00:00:00"}
    d2 = reports["2024-01-02 00:00:00"]
    assert (d2.n_a, d2.n_b, d2.l1_num, d2.tvd) == (200, 100, 0.0, 0.0)
    assert (d2.bins_a, d2.bins_b) == (2, 2)
    d3 = reports["2024-01-03 00:00:00"]
    # l1 = |100·200 − 0·200| + |100·200 − 200·200| = 40000 exactly
    assert (d3.n_a, d3.n_b, d3.l1_num, d3.tvd) == (200, 200, 40000.0, 0.5)
    assert (d3.bins_a, d3.bins_b) == (2, 1)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-running the same availableNow stream over the same landing
    data (fresh checkpoint-less run) must leave one report per window,
    not append duplicates — the batch_id directory contract."""
    pin_semantics(spark)
    land = str(tmp_path / "land")
    out = str(tmp_path / "reports")
    os.makedirs(land)
    baseline = _rows(spark, "01", [5.0] * 10 + [95.0] * 10)
    hist, grid_max = baseline_histogram(baseline, "value", ["grp"])
    _rows(spark, "02", [5.0] * 10).coalesce(1).write.parquet(
        os.path.join(land, "f1")
    )
    _rows(spark, "10", [5.0]).coalesce(1).write.parquet(
        os.path.join(land, "f2")
    )
    for _ in range(2):  # second run replays identical batch ids
        stream = spark.readStream.schema(SCHEMA).parquet(
            os.path.join(land, "*")
        )
        windowed = windowed_histogram_stream(
            stream, "value", ["grp"], grid_max,
            window="1 day", watermark="1 day",
        )
        q = write_drift_reports(windowed, hist, ["grp"], out).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(120)
    rows = read_drift_reports(spark, out).collect()
    assert len(rows) == 1 and str(rows[0].window_start).startswith("2024-01-02")
