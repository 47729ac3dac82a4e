from prohap_spark.streaming.events import (
    read_event_stream,
    tumbling_counts,
    sliding_value_sums,
    session_windows,
    stateful_user_stats,
    stream_dedup,
)

__all__ = [
    "read_event_stream",
    "tumbling_counts",
    "sliding_value_sums",
    "session_windows",
    "stateful_user_stats",
    "stream_dedup",
]
