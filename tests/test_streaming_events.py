"""Streaming tier: batch/stream parity for the windowed event aggregation."""

import pytest

from projet_graphdb_spark.streaming import (
    load_events,
    streaming_windowed_counts,
    windowed_event_stats,
)

from conftest import SF_TINY


def test_batch_window_stats(spark):
    events = load_events(spark, SF_TINY)
    out = windowed_event_stats(events)
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == events.count()


def test_streaming_equals_batch(spark, tmp_path):
    """The same aggregation as a Structured Streaming query over the same
    files must produce the same result (availableNow drains everything)."""
    events = load_events(spark, SF_TINY)
    # write a normalized copy (micros timestamps) for the stream source
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = streaming_windowed_counts(spark, src, schema, query_name="t_ev_parity")
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_ev_parity").collect()
    }
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_stats(events).collect()
    }
    assert got == expect
