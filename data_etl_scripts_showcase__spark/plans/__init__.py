from .pipelines import (
    INSIGHT_FIELDNAMES,
    enrichment_pipeline,
    filtered_snapshot_pipeline,
    insights_projection,
    snapshot_pipeline,
)

__all__ = [
    "INSIGHT_FIELDNAMES",
    "snapshot_pipeline",
    "filtered_snapshot_pipeline",
    "enrichment_pipeline",
    "insights_projection",
]
