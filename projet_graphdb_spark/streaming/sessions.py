"""Sessionization: group a user's events into sessions split by idle gaps.

The classic custom stateful operator the reference has nothing like
(SURVEY §2.2 lists streaming as absent).  Two implementations with the
same output contract (user_id, session_start, n_events, sum_value):

* ``sessionize_batch`` — window functions: a session starts where the
  gap from the previous event exceeds the timeout; a running sum of
  session-start flags numbers the sessions.  One shuffle (partition by
  user, order by time) — and it is ANSI SQL, so DuckDB oracles it.
* ``sessionize_stream`` — Structured Streaming with
  ``applyInPandasWithState``: per-user state holds the open session
  (start, count, value sum, last ts); an event beyond the gap emits the
  closed session and opens a new one; the event-time timeout flushes
  idle sessions.  State size is O(active users) — the 100 TB-stream
  design.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = "start timestamp, last timestamp, n bigint, total double"


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Close a session when the user is idle longer than ``gap_minutes``.

    Output: (user_id, session_start, n_events, sum_value).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond precision: second-truncated casts would disagree with
    # exact-interval comparisons (and the DuckDB oracle) on sub-second gaps
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_minutes * 60_000_000), 1).otherwise(0)
    )
    numbered = flagged.withColumn(
        "_sess", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        numbered.groupBy("user_id", "_sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
        )
        .select("user_id", "session_start", "n_events", "sum_value")
    )


def _session_fn(gap_minutes: int):
    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start], "n_events": [n],
                 "sum_value": [total]}
            )
            return
        chunks = [p for p in pdfs if len(p)]  # empty chunks: all-NA concat warning
        if not chunks:
            return
        rows = pd.concat(chunks).sort_values("ts")
        closed = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        for ts, value in zip(rows["ts"], rows["value"]):
            if start is None:
                start, last, n, total = ts, ts, 1, float(value)
            elif ts - last > gap:
                closed.append((user_id, start, n, total))
                start, last, n, total = ts, ts, 1, float(value)
            else:
                last, n, total = ts, n + 1, total + float(value)
        state.update((start, last, n, total))
        # event-time timeout: flush this session once the watermark passes
        # last + gap (GroupStateTimeout is in epoch millis)
        state.setTimeoutTimestamp(int(last.timestamp() * 1000) + gap_minutes * 60_000)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start", "n_events", "sum_value"]
            )

    return fn


def sessionize_stream(
    spark: SparkSession,
    events_path: str,
    schema,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    query_name: str = "sessions",
):
    """Streaming sessionization via applyInPandasWithState.

    Emits a session row when it closes (either a later event arrives
    beyond the gap, or the event-time watermark passes the session's
    timeout).  Returns the StreamingQuery writing to the in-memory table
    ``query_name``.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions via Spark's NATIVE ``session_window`` — the
    built-in form of ``sessionize_batch`` (one hash aggregate, window
    merging done by the engine; in streaming it pairs with a watermark
    for bounded state, no applyInPandasWithState needed).

    Boundary semantics differ from ``sessionize_batch`` by half-open
    convention: ``session_window`` extends a session only while the
    next event arrives STRICTLY within ``gap`` (the window is
    ``[ts, ts+gap)``), so a pair exactly ``gap`` apart starts a new
    session, where the lag-based form (``> gap`` ⇒ new) keeps it.  The
    oracle mirrors the ``>=`` rule.

    Output: (session_start, user_id, n_events, sum_value).
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("_s"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("_s.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


# ship worker-side functions BY VALUE (no importable package needed on
# Python workers — harness sessions may start outside the repo dir)
try:  # pragma: no cover - environment-dependent
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass
