from .stage import (
    RESPONSE_SCHEMA,
    enrich,
    mock_fetch_page,
)

__all__ = ["RESPONSE_SCHEMA", "enrich", "mock_fetch_page"]
