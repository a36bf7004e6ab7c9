"""Structured Streaming operators over the events table."""

from .events import (
    load_events,
    streaming_enriched_stats,
    streaming_windowed_counts,
    streaming_windowed_to_parquet,
    windowed_event_stats,
)
from .harness import drain, state_partitions, stream_source
from .ingest_dedup import (
    compact_batch_sink,
    streaming_image_ingest_dedup,
    streaming_ingest_dedup,
    streaming_ingest_embeddings,
)
from .sessions import sessionize_batch, sessionize_stream
from .stream_dedup import dedup_events_batch, dedup_events_stream
from .stream_join import click_purchase_pairs_batch, click_purchase_pairs_stream

__all__ = [
    "click_purchase_pairs_batch",
    "click_purchase_pairs_stream",
    "dedup_events_batch",
    "dedup_events_stream",
    "drain",
    "load_events",
    "sessionize_batch",
    "sessionize_stream",
    "stream_source",
    "streaming_enriched_stats",
    "compact_batch_sink",
    "streaming_image_ingest_dedup",
    "streaming_ingest_dedup",
    "streaming_ingest_embeddings",
    "streaming_windowed_counts",
    "streaming_windowed_to_parquet",
    "windowed_event_stats",
]
