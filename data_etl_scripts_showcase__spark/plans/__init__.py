from .pipelines import (
    enrichment_pipeline,
    filtered_snapshot_pipeline,
    snapshot_pipeline,
)

__all__ = ["snapshot_pipeline", "filtered_snapshot_pipeline", "enrichment_pipeline"]
