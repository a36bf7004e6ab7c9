"""Streaming deduplication with watermark-bounded state.

The batch form is a plain ``dropDuplicates`` on the identity key; the
streaming twin uses ``dropDuplicatesWithinWatermark`` so the dedup state
is EVICTED once the event-time watermark passes — the property that
makes streaming dedup run forever on unbounded input without unbounded
state (a plain streaming ``dropDuplicates`` would keep every key seen).

Dedup key includes the event timestamp, so the result is independent of
arrival order and the batch/stream parity is exact (first-arrival-wins
policies are not reproducible across re-partitioned replays; identity
dedup is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEDUP_KEYS = ["user_id", "event_type", "ts"]


def dedup_events_batch(events: DataFrame, keys: list | None = None) -> DataFrame:
    """Batch twin: one row per identity key (hash-aggregate, one shuffle)."""
    return events.select(*(keys or DEDUP_KEYS)).dropDuplicates()


def dedup_events_stream(
    spark: SparkSession,
    events_path: str,
    schema,
    keys: list | None = None,
    watermark: str = "2 hours",
    query_name: str = "deduped",
):
    """Streaming twin: watermark-bounded exact dedup.

    Returns the StreamingQuery writing distinct rows to the in-memory
    table ``query_name``.  State per key lives only until the watermark
    passes its event time + the watermark delay.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .select(*(keys or DEDUP_KEYS))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys or DEDUP_KEYS)
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
