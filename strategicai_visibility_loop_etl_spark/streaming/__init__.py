from .events import events_windowed_agg, streaming_dedup, streaming_visibility_update

__all__ = ["events_windowed_agg", "streaming_dedup", "streaming_visibility_update"]
