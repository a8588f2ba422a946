from .events import (
    read_event_stream,
    windowed_event_counts,
    sessionize_events,
)
from .stateful import running_user_totals, running_user_totals_tws
from .sinks import foreach_batch_writer, stream_to_parquet

__all__ = [
    "read_event_stream",
    "windowed_event_counts",
    "sessionize_events",
    "running_user_totals",
    "running_user_totals_tws",
    "stream_to_parquet",
    "foreach_batch_writer",
]
