from .incremental import (
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
]
