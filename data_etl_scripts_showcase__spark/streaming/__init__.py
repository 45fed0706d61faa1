from .jobs import (
    events_stream,
    run_to_memory,
    sessionize_batch,
    sliding_counts,
    stream_dedup_keys,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "tumbling_counts",
    "sliding_counts",
    "sessionize_batch",
    "stream_dedup_keys",
    "run_to_memory",
]
