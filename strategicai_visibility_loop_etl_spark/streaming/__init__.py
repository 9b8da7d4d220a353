from .events import (
    events_windowed_agg,
    sliding_distinct_users,
    streaming_dedup,
    streaming_visibility_update,
)

__all__ = [
    "events_windowed_agg",
    "sliding_distinct_users",
    "streaming_dedup",
    "streaming_visibility_update",
]
