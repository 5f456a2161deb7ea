"""Streaming observability: a StreamingQueryListener capturing per-batch
progress (rows, durations, state size) — the streaming counterpart of
the batch pipeline's Observation metrics. Attach once per session;
collector state is driver-side only (no data-plane cost)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class StreamProgress:
    """Driver-side accumulation of streaming progress events."""

    batches: list[dict] = field(default_factory=list)

    @property
    def total_input_rows(self) -> int:
        return int(sum(b["numInputRows"] for b in self.batches))


class _Collector(StreamingQueryListener):
    def __init__(self, progress: StreamProgress) -> None:
        self._progress = progress

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self._progress.batches.append(
            {
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_progress_listener(spark: SparkSession) -> tuple[StreamProgress, object]:
    """Returns (progress, listener); detach with
    ``spark.streams.removeListener(listener)`` when done."""
    progress = StreamProgress()
    listener = _Collector(progress)
    spark.streams.addListener(listener)
    return progress, listener
