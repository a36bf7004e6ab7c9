"""Sessionization: batch window-function form vs the stateful streaming
twin (applyInPandasWithState), plus hand-checked gap semantics."""

from datetime import datetime

import pytest

from projet_graphdb_spark.streaming import load_events, sessionize_batch, sessionize_stream

from conftest import SF_TINY


def ts(minute, second=0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_batch_gap_semantics(spark):
    rows = [
        (1, ts(0), 1.0),
        (1, ts(10), 2.0),   # same session (10 min gap)
        (1, ts(50), 4.0),   # 40 min gap -> new session
        (2, ts(5), 8.0),    # other user
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(ev, gap_minutes=30).collect()
    }
    assert out == {
        (1, ts(0)): (2, 3.0),
        (1, ts(50)): (1, 4.0),
        (2, ts(5)): (1, 8.0),
    }


def test_batch_boundary_gap_exact(spark):
    # exactly 30 min gap is NOT a new session (strict >)
    rows = [(1, ts(0), 1.0), (1, ts(30), 1.0), (1, ts(60, 1), 1.0)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize_batch(ev, gap_minutes=30).collect()
    assert sorted(r["n_events"] for r in out) == [1, 2]


def test_stream_matches_batch_closed_sessions(spark, tmp_path):
    events = load_events(spark, SF_TINY)
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = sessionize_stream(spark, src, schema, gap_minutes=30, query_name="t_sessions")
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 2))
        for r in spark.table("t_sessions").collect()
    }
    batch = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 2))
        for r in sessionize_batch(events, gap_minutes=30).collect()
    }
    # every emitted (closed) session matches the batch result exactly;
    # sessions still open at end-of-data are withheld by the watermark
    assert got <= batch
    assert len(got) >= 0.9 * len(batch)


def test_session_window_matches_lag_form_off_boundary(spark):
    """Away from exact-gap boundaries the native session_window equals
    the lag-based sessionizer."""
    from projet_graphdb_spark.streaming import load_events
    from projet_graphdb_spark.streaming.sessions import (
        session_window_stats,
        sessionize_batch,
    )

    from conftest import SF_TINY

    events = load_events(spark, SF_TINY)
    native = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in session_window_stats(events).collect()
    }
    lag = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(events, gap_minutes=30).collect()
    }
    # the fixture has microsecond timestamps: exactly-30-min gaps are
    # absent, so the two boundary conventions coincide
    assert native == lag


def test_threshold_crossings_stream_batch_parity(spark, tmp_path):
    import datetime as dt

    from projet_graphdb_spark.streaming.crossings import (
        threshold_crossings_batch,
        threshold_crossings_stream,
    )
    from projet_graphdb_spark.streaming import drain

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, t(0), 7, "buy", 200.0, "{}"), (2, t(5), 7, "buy", 250.0, "{}"),
        (3, t(9), 7, "buy", 100.0, "{}"),   # user 7 crosses 500 here
        (4, t(2), 8, "buy", 499.99, "{}"),  # user 8 never crosses
        (5, t(1), 9, "buy", 600.0, "{}"),   # user 9 crosses immediately
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events")
    df.write.parquet(path)
    schema = spark.read.parquet(path).schema
    q = threshold_crossings_stream(spark, path, schema, query_name="t_cross")
    stream_rows = sorted(
        [tuple(r) for r in drain(q, spark, "t_cross").collect()]
    )
    batch_rows = sorted([tuple(r) for r in threshold_crossings_batch(df).collect()])
    assert stream_rows == batch_rows
    assert [r[0] for r in batch_rows] == [7, 9]
    assert batch_rows[0][2] == 550.0
