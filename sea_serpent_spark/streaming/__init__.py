from .events import (
    oplog_stream,
    read_events_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "oplog_stream",
    "run_to_memory",
]
