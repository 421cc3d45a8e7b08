from .events import (
    final_user_totals,
    oplog_stream,
    read_events_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    stateful_user_totals,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "stateful_user_totals",
    "final_user_totals",
    "oplog_stream",
    "run_to_memory",
]
