from .bucketed import cobucketed_join, write_bucketed
from .quality import ReconciliationError, reconcile, upsert_run_metrics
from .retention import (
    affected_partitions,
    compact_partitions,
    partition_file_stats,
    targeted_delete,
)
from .snapshot import promote_view, read_snapshot, write_snapshot

__all__ = [
    "cobucketed_join",
    "write_bucketed",
    "ReconciliationError",
    "reconcile",
    "upsert_run_metrics",
    "write_snapshot",
    "read_snapshot",
    "promote_view",
    "affected_partitions",
    "targeted_delete",
    "partition_file_stats",
    "compact_partitions",
]
