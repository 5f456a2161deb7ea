"""Structured Streaming variants of the event operators (§7 Phase 4).

The batch pipeline's windowed aggregation (plans/llm_ops.e01) and
dedup are re-expressed over ``readStream``:

- watermarked tumbling-window aggregation (late data beyond the
  watermark is dropped — the late-data policy is explicit);
- streaming exact dedup on event_id within the watermark horizon.

The parquet testdata doubles as a file-source stream (one-file
directory → one microbatch under Trigger.AvailableNow), which is how
tests verify batch/stream result parity without a live bus. In
production the source swaps for Kafka with no operator changes —
that's the point of declaring the plan against the DataFrame API.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec, money_sum

EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (nanos ts → timestamp).

    The file-stream source monitors a *directory*; the testdata table
    is a single parquet file, so it is staged behind a symlink dir —
    production sources are directories (or Kafka) already.
    """
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isfile(src):
        staging = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(src, os.path.join(staging, "part-0.parquet"))
        path = staging
    else:
        path = src
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_event_windows_stream(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of e01_hourly_event_windows (same aggregates)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(dec("value", 14, 2), "total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame, *, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Exact dedup within the watermark horizon (bounded state)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def purchase_view_interval_join(
    events: DataFrame, *, lookback: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: purchases ⋈ views of the same user
    within the lookback window before the purchase.

    Both sides are watermarked and the join predicate bounds event time
    on BOTH streams — that's what lets Spark expire buffered state (a
    stream-stream join without time bounds would buffer forever). The
    batch twin is the q19 as-of join's candidate set.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("view_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")),
    ).select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts")


def enrich_stream(events: DataFrame, dim: DataFrame, on: list[str]) -> DataFrame:
    """Stream-static join: each microbatch joins the (broadcast) static
    dimension — the streaming version of the pipeline's enrichment
    joins (J1/J2). The dim is re-read per batch, so slowly-changing
    dimensions pick up updates without restarting the query."""
    return events.join(F.broadcast(dim), on, "left")


def write_stream_parquet(
    df: DataFrame, path: str, checkpoint: str, *, available_now: bool = True
):
    """Production streaming sink shape: foreachBatch → partitioned
    parquet (idempotent per batch id via overwrite-by-batch dir)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    writer = df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
