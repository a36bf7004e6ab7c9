"""Structured Streaming operators over the events table."""

from .events import load_events, streaming_windowed_counts, windowed_event_stats

__all__ = ["load_events", "streaming_windowed_counts", "windowed_event_stats"]
