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

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec, money_sum

EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
# Micros testdata is written without isAdjustedToUTC → read it as NTZ
# and cast, exactly like load_table: a plain `ts timestamp` schema would
# reinterpret the stored wall-clock as a UTC instant and diverge from
# the batch reader whenever the session TZ isn't UTC.
EVENTS_SCHEMA_NTZ = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _events_ts_is_nanos(src: str) -> bool:
    """True when the parquet stores ts as nanos — TIMESTAMP(NANOS)
    (which Spark can only read via nanosAsLong → long) or a raw int64
    epoch-nanos column. Micros/millis testdata reads directly as
    timestamp. Footer-only check, no data scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = src
    if os.path.isdir(src):
        f = None
        for entry in sorted(os.listdir(src)):
            if entry.endswith(".parquet"):
                f = os.path.join(src, entry)
                break
        if f is None:
            raise FileNotFoundError(
                f"read_events_stream: no *.parquet file found in {src!r}; "
                "expected an events table file or a directory containing one"
            )
    ts_type = pq.read_schema(f).field("ts").type
    if getattr(ts_type, "unit", None) == "ns":
        return True
    if pa.types.is_int64(ts_type):
        # Raw int64 ts: only treat as epoch-NANOS when the footer
        # statistics confirm the magnitude (~1.5e18 for 2017+). An
        # int64 epoch-MICROS generation (~1.5e15) would otherwise be
        # silently divided by 1000 and collapse toward 1970.
        stats_max = None
        try:
            meta = pq.ParquetFile(f).metadata
            idx = meta.schema.to_arrow_schema().get_field_index("ts")
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    m = int(st.max)
                    stats_max = m if stats_max is None else max(stats_max, m)
        except Exception:
            stats_max = None
        if stats_max is None:
            return True  # known testdata generations are nanos
        if stats_max >= 10**17:
            return True
        raise ValueError(
            f"read_events_stream: int64 ts column in {f!r} has max "
            f"{stats_max}, which is not epoch-nanos magnitude; refusing "
            "to guess the unit — convert the column to a parquet "
            "timestamp type or extend _events_ts_is_nanos for this "
            "generation"
        )
    return False


def read_events_stream(
    spark: SparkSession, sf_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events table (nanos ts → timestamp).

    The file-stream source monitors a *directory*; the testdata table
    is a single parquet file, so it is staged behind a symlink dir —
    production sources are directories (or Kafka) already.
    ``max_files_per_trigger`` splits a multi-file directory into one
    microbatch per file — tests use it to pin cross-batch semantics
    (watermark advance, outer-join emission timing).
    """
    src = os.path.join(sf_dir, "events.parquet")
    nanos = _events_ts_is_nanos(src)
    if nanos:
        # TIMESTAMP(NANOS): read as long, convert below. Pinned here
        # (not only in the session factory) so the stream works in any
        # session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if os.path.isfile(src):
        # Deterministic staging dir keyed by the source path: reused
        # across calls instead of leaking one mkdtemp per invocation.
        key = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:12]
        staging = os.path.join(tempfile.gettempdir(), f"events_stream_{key}")
        os.makedirs(staging, exist_ok=True)
        link = os.path.join(staging, "part-0.parquet")
        if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(
            src
        ):
            os.unlink(link)  # stale/broken symlink from an earlier run
        if not os.path.lexists(link):
            os.symlink(src, link)
        path = staging
    else:
        path = src
    reader = spark.readStream.schema(EVENTS_SCHEMA if nanos else EVENTS_SCHEMA_NTZ)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(path)
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


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


def sliding_event_windows_stream(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of e02_sliding_event_windows (6h window / 2h
    slide): each event lands in its 3 covering windows; the watermark
    closes a window once event time passes its end + slack.

    Divergence from the batch form (documented contract): Spark
    forbids exact distinct aggregates on streams, so ``n_users`` is
    ``approx_count_distinct`` here — the batch e02 is the exact
    restatement for backfills. ``n``/``total_value`` match the batch
    twin exactly (pinned in tests/test_streaming.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "6 hours", "2 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            money_sum(dec("value", 14, 2), "total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "n_users_approx",
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
    events: DataFrame,
    *,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: purchases ⋈ views of the same user
    within the lookback window before the purchase.

    Both sides are watermarked and the join predicate bounds event time
    on BOTH streams — that's what lets Spark expire buffered state (a
    stream-stream join without time bounds would buffer forever). The
    batch twin is the q19 as-of join's candidate set.

    ``how="left_outer"`` keeps purchases with no in-window view. Outer
    (null-matched) rows are emitted only once the *view-side* watermark
    passes the end of the purchase's match window — i.e. when Spark can
    prove no future view can join — so under a multi-batch run the
    unmatched rows surface one watermark advance after their window
    closes (pinned by tests/test_stream_stream_join.py).
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
        how,
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
    """Production streaming sink shape: foreachBatch → parquet, written
    idempotently as one ``batch_id=<n>`` directory per microbatch with
    ``mode("overwrite")``. If Structured Streaming replays the last
    uncommitted batch after a failure, the rewrite lands in the same
    directory instead of appending duplicates — exactly-once output for
    a deterministic query. Readers ``spark.read.parquet(path)`` and get
    a ``batch_id`` partition column for free (drop it if unwanted)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(path, f"batch_id={batch_id}")
        )

    writer = df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_rollup(
    events: DataFrame,
    path: str,
    checkpoint: str,
    *,
    available_now: bool = True,
):
    """Exactly-once streaming rollup over plain parquet: each
    microbatch is partially aggregated to the hourly grain and merged
    into the versioned rollup via ``operators.rollup.apply_increment``
    keyed by the microbatch id. On failure-recovery replay the ledger
    rejects the duplicate batch id, so counts never double — the
    plain-parquet equivalent of a Delta ``foreachBatch MERGE``.

    Note the input is the RAW event stream (no streaming groupBy):
    aggregation happens inside foreachBatch, so the rollup table —
    not Spark's state store — is the accumulator, and the table stays
    queryable mid-stream at every committed version.
    """
    from ..operators.rollup import apply_increment, hourly_event_rollup_increment

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_increment(
            batch_df.sparkSession,
            path,
            hourly_event_rollup_increment(batch_df),
            keys=["window_start", "event_type"],
            sum_cols=["n", "total_value"],
            batch_id=str(batch_id),
        )

    writer = events.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_upsert(
    df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    *,
    delete_col: str | None = None,
    available_now: bool = True,
):
    """CDC-shaped streaming sink: MERGE each microbatch into the keyed
    table at ``path`` (sources/upsert.py) — later batches overwrite
    earlier rows with the same key instead of appending, and an
    optional boolean column marks deletes. This is the streaming shape
    of a Delta ``foreachBatch MERGE INTO``.

    Replay safety: a replayed batch re-runs the same merge against the
    already-merged table, which produces an identical next version —
    idempotent by upsert construction (no duplicate rows), at the cost
    of one redundant version directory (vacuum reclaims it).

    The batch must be key-unique (one row per key per microbatch);
    upstream ``dropDuplicatesWithinWatermark``/aggregation provides
    that for event streams.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.upsert import upsert

        upsert(
            batch_df.sparkSession, path, batch_df, keys, delete_col=delete_col
        )

    writer = df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
