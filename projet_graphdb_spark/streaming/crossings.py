"""Threshold-crossing detection: the first moment each user's running
spend crosses a budget — the alerting / fraud-trigger shape (emit ONCE
per key, exactly when the cumulative state crosses a line).

Two implementations with one output contract
(user_id, crossing_ts, cum_at_crossing):

* ``threshold_crossings_batch`` — per-user ordered DECIMAL cumulative
  sum, first qualifying row via min-by.  One key-partitioned exchange;
  ANSI-expressible, so DuckDB oracles it.
* ``threshold_crossings_stream`` — ``applyInPandasWithState``: per-user
  state is ONE integer (cents so far) + a crossed flag; an arriving
  batch sorts its rows by event time and emits the crossing row at most
  once.  State is O(users) × ~2 values — the always-on monitor design:
  nothing is buffered, nothing replays.

Both sides accumulate in exact integer cents (the stream state) /
DECIMAL(25,2) (the batch window), so the crossing decision can never
diverge on float summation order.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

CROSSING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("crossing_ts", T.TimestampType(), False),
        T.StructField("cum_at_crossing", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = "cents bigint, crossed boolean"


def _cents(v: float) -> int:
    # HALF_UP for non-negative amounts — matches CAST(v AS DECIMAL(25,2))
    return int(math.floor(float(v) * 100.0 + 0.5))


def threshold_crossings_batch(
    events: DataFrame, threshold: float = 500.0
) -> DataFrame:
    """First event at which each user's cumulative value reaches
    ``threshold``; users who never cross emit nothing.

    Output: (user_id, crossing_ts, cum_at_crossing).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col("value").cast("decimal(25,2)")).over(w)
    hits = events.withColumn("_cum", cum).where(
        F.col("_cum") >= F.lit(threshold).cast("decimal(25,2)")
    )
    first = F.min_by(
        F.struct(F.col("ts"), F.col("_cum")), F.struct(F.col("ts"), F.col("event_id"))
    )
    return (
        hits.groupBy("user_id")
        .agg(first.alias("_f"))
        .select(
            "user_id",
            F.col("_f.ts").alias("crossing_ts"),
            F.round(F.col("_f._cum").cast("double"), 2).alias("cum_at_crossing"),
        )
        .orderBy("user_id")
    )


def _crossing_fn(threshold: float):
    limit_cents = _cents(threshold)

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover — no timeout configured
            state.remove()
            return
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        rows = pd.concat(chunks).sort_values(["ts", "event_id"])
        if state.exists:
            cents, crossed = state.get
        else:
            cents, crossed = 0, False
        out = []
        for ts, eid, value in zip(rows["ts"], rows["event_id"], rows["value"]):
            cents += _cents(value)
            if not crossed and cents >= limit_cents:
                crossed = True
                out.append((user_id, ts, cents / 100.0))
        state.update((cents, crossed))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "crossing_ts", "cum_at_crossing"]
            )

    return fn


def threshold_crossings_stream(
    spark: SparkSession,
    events_path: str,
    schema,
    threshold: float = 500.0,
    watermark: str = "2 hours",
    query_name: str = "crossings",
):
    """The same detector as an always-on stream: per-user integer-cents
    state, crossing rows emitted in the micro-batch that crosses.

    NOTE on ordering: within a micro-batch rows sort by event time; for
    exact batch parity drain the source as one batch (no
    maxFilesPerTrigger) or feed files in event-time order — the usual
    contract for order-sensitive stateful operators.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _crossing_fn(threshold),
            outputStructType=CROSSING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# the stateful function ships to Python workers by pickle; register this
# module for BY-VALUE serialization so workers need no importable copy of
# the package (harness sessions may start outside the repo directory)
try:  # pragma: no cover - environment-dependent
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass
