from .events import (
    read_event_stream,
    windowed_event_counts,
    sessionize_events,
)

__all__ = ["read_event_stream", "windowed_event_counts", "sessionize_events"]
