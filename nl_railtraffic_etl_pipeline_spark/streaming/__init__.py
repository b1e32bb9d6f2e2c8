from .incremental import (
    ewma_stream,
    read_disruption_stream,
    sessionize_stream,
    start_incremental_load,
    streaming_daily_counts,
)

__all__ = [
    "read_disruption_stream",
    "start_incremental_load",
    "streaming_daily_counts",
    "sessionize_stream",
    "ewma_stream",
]
