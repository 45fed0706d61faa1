from .jobs import (
    click_purchase_attribution,
    events_stream,
    incremental_rollup,
    read_rollup,
    final_user_activity,
    run_to_memory,
    sessionize_batch,
    sliding_counts,
    stateful_user_activity,
    stream_dedup_keys,
    tumbling_counts,
)

__all__ = [
    "click_purchase_attribution",
    "events_stream",
    "incremental_rollup",
    "read_rollup",
    "tumbling_counts",
    "sliding_counts",
    "sessionize_batch",
    "stream_dedup_keys",
    "stateful_user_activity",
    "final_user_activity",
    "run_to_memory",
]
