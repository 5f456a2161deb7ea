from .events_stream import (
    hourly_event_windows_stream,
    sliding_event_windows_stream,
    read_events_stream,
    streaming_dedup,
    write_stream_parquet,
    write_stream_upsert,
)

__all__ = [
    "hourly_event_windows_stream",
    "sliding_event_windows_stream",
    "read_events_stream",
    "streaming_dedup",
    "write_stream_parquet",
    "write_stream_upsert",
]
