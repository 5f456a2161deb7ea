"""Burst collapse on Spark's NATIVE ``session_window`` operator.

The stateful sessionizer (sessionize.py, applyInPandasWithState)
exists for arbitrary per-session logic; when the per-burst result IS
expressible as plain aggregates — first event id, first timestamp,
burst size — the built-in session window is the right tool: JVM-side
state store, watermark-driven eviction, no Python hop, and the same
code path works in batch mode (tests reconcile it against the x11
window-lag form).

Boundary semantics: ``session_window`` merges an event into the open
session when its gap to the previous event is STRICTLY LESS than the
gap duration, while the batch x11 form keeps an exactly-gap event in
the burst (its lag test is strictly-greater). Corpora with exact-gap
timestamps will differ on those events only — the equivalence test
avoids the boundary, and this is the documented trade for using the
native operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def burst_collapse(
    events: DataFrame, *, gap: str = "5 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """(user_id, event_type, first_event_id, first_ts, burst_size) per
    closed burst. Streaming: append-mode emission once the watermark
    passes the session end; batch: evaluates directly (session_window
    is a grouping expression, so one aggregation — no self-join, no
    window-function sort)."""
    flow = events
    if events.isStreaming:
        flow = events.withWatermark("ts", watermark)
    return (
        flow.groupBy(
            "user_id", "event_type", F.session_window("ts", gap).alias("_w")
        )
        .agg(
            F.min(F.struct("ts", "event_id"))["event_id"].alias("first_event_id"),
            F.min("ts").alias("first_ts"),
            F.count(F.lit(1)).cast("long").alias("burst_size"),
        )
        .select(
            "user_id", "event_type", "first_event_id", "first_ts", "burst_size"
        )
    )
