"""Streaming twin of x25: continuous distribution-drift monitoring.

Production shape: a model-serving / ingestion pipeline watches the
distribution of a feature per group as data streams in, comparing
each closed event-time window against a FIXED baseline corpus (the
training window) — the PSI-style retraining alarm, in the catalog's
log-free total-variation form (``operators/drift.py``).

Mechanics and honest divergences from the batch x25:

- The bin grid is pinned to the BASELINE's max (a monitor must keep
  its grid fixed across windows to be comparable over time); values
  above the baseline max clamp into the top bin. Batch x25 derives
  the grid from the union of both windows — re-deriving per window
  would silently re-bin history, so the stream pins instead.
- Windowed binned counts ride a watermarked event-time tumbling
  window in APPEND mode: a drift report is emitted exactly once per
  window, when the watermark closes it — finalized histograms only,
  never partial-window false alarms.
- The report computation reuses the batch tail verbatim
  (``drift_from_binned``): each finalized microbatch full-outer-joins
  its (window, group, bin) counts against the broadcast baseline
  histogram and aggregates — all dimension-sized (windows × groups ×
  bins), regardless of stream volume.
- Sink: the engine's idempotent ``batch_id=<n>`` directory contract
  (a replayed batch overwrites itself and nothing else).

State: the streaming aggregation holds (windows-in-flight × groups ×
bins) counts, bounded by the watermark horizon — never O(events).
Pinned in tests/test_drift_stream.py: the streamed per-window reports
equal the batch ``histogram_drift`` of (baseline, that window's rows)
computed on the same pinned grid, and a planted location shift fires
exactly in its window.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.drift import drift_from_binned


def _cents(value_col: str, cents_scale: int) -> Column:
    return F.floor(F.col(value_col) * cents_scale).cast("long")


def _bin_expr(n_bins: int) -> Column:
    return F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.expr(f"_cents * {n_bins} div (_gridmax + 1)"),
        ),
    ).cast("long")


def baseline_histogram(
    baseline: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    n_bins: int = 10,
    cents_scale: int = 100,
) -> tuple[DataFrame, int]:
    """(histogram, grid_max): the fixed reference the monitor compares
    every window against. ``histogram`` = one row per (group, _bin)
    with ``n_a_bin``; ``grid_max`` is the baseline's max cents (one
    bounded 1-row collect — monitor setup, not the data plane)."""
    v = baseline.select(
        *group_cols, _cents(value_col, cents_scale).alias("_cents")
    )
    grid_max = v.agg(F.max("_cents")).collect()[0][0]
    hist = (
        v.withColumn("_gridmax", F.lit(int(grid_max)))
        .select(*group_cols, _bin_expr(n_bins).alias("_bin"))
        .groupBy(*group_cols, "_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_a_bin"))
    )
    return hist, int(grid_max)


def windowed_histogram_stream(
    events: DataFrame,
    value_col: str,
    group_cols: list[str],
    grid_max: int,
    *,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "1 day",
    n_bins: int = 10,
    cents_scale: int = 100,
) -> DataFrame:
    """Watermarked tumbling-window binned counts of the streaming
    side: (window_start, group_cols..., _bin, n_b_bin) — append mode
    emits each (window, group, bin) row exactly once, when the
    watermark closes the window."""
    return (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            *group_cols,
            _cents(value_col, cents_scale).alias("_cents"),
        )
        .withColumn("_gridmax", F.lit(int(grid_max)))
        .groupBy(
            F.window(ts_col, window).alias("_w"),
            *group_cols,
            _bin_expr(n_bins).alias("_bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_b_bin"))
        .select(
            F.col("_w.start").alias("window_start"),
            *group_cols,
            "_bin",
            "n_b_bin",
        )
    )


def drift_report_for_batch(
    batch_counts: DataFrame,
    baseline_hist: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Per finalized window: full-outer the window's binned counts
    against the baseline histogram and run the shared batch tail.
    Both sides are dimension-sized; the baseline replicates only onto
    windows actually present in the batch."""
    wins = batch_counts.select("window_start").distinct()
    base_x = wins.crossJoin(F.broadcast(baseline_hist))
    keys = ["window_start", *group_cols, "_bin"]
    j = (
        base_x.join(batch_counts, keys, "full_outer")
        .select(
            *keys,
            F.coalesce("n_a_bin", F.lit(0)).cast("long").alias("n_a_bin"),
            F.coalesce("n_b_bin", F.lit(0)).cast("long").alias("n_b_bin"),
        )
    )
    return drift_from_binned(j, ["window_start", *group_cols])


def write_drift_reports(
    windowed: DataFrame,
    baseline_hist: DataFrame,
    group_cols: list[str],
    out_dir: str,
):
    """Append-mode foreachBatch writer: one parquet ``batch_id=<n>``
    directory per microbatch of finalized-window reports (idempotent
    under replay)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = drift_report_for_batch(batch_df, baseline_hist, group_cols)
        report.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return windowed.writeStream.outputMode("append").foreachBatch(sink)


def read_drift_reports(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch_id=*")
    ).drop("batch_id")
