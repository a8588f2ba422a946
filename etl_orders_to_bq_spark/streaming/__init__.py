from .events import (
    read_event_stream,
    windowed_event_counts,
    sessionize_events,
)
from .stateful import running_user_totals

__all__ = [
    "read_event_stream",
    "windowed_event_counts",
    "sessionize_events",
    "running_user_totals",
]
