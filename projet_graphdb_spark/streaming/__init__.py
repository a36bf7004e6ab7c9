"""Structured Streaming operators over the events table."""

from .events import load_events, streaming_windowed_counts, windowed_event_stats
from .sessions import sessionize_batch, sessionize_stream

__all__ = [
    "load_events",
    "sessionize_batch",
    "sessionize_stream",
    "streaming_windowed_counts",
    "windowed_event_stats",
]
