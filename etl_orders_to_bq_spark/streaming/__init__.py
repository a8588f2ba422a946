from .events import (
    read_event_stream,
    windowed_event_counts,
    sessionize_events,
)
from .stateful import running_user_totals
from .sinks import foreach_batch_writer, stream_to_parquet

__all__ = [
    "read_event_stream",
    "windowed_event_counts",
    "sessionize_events",
    "running_user_totals",
    "stream_to_parquet",
    "foreach_batch_writer",
]
