"""Multi-micro-batch watermark semantics: the late-data DROP path.

Every other streaming twin drains availableNow in one micro-batch,
where the watermark starts at -inf and nothing is ever late — the
engine's actual late-row drop never executes.  This harness feeds the
events fixture as ``n_batches`` files in a CONTROLLED order
(``event_id % n_batches``, ascending mtimes + names, ``maxFilesPerTrigger
= 1``), so each batch spans the full month and batches 1+ carry rows far
older than the watermark established by batch 0 — the engine must drop
them, and a SQL oracle can replay the exact per-batch watermark advance:

* watermark AT batch b = ms-floor(max event time over batches < b) −
  delay (Spark tracks event-time stats in milliseconds; -inf for b=0);
* an arriving row is dropped iff its WINDOW END ≤ that watermark (the
  window's state has been evicted — Spark's aggregation late filter);
* append mode emits a window once the final watermark passes its end
  (availableNow runs a trailing no-data batch, so the final watermark
  is ms-floor(global max ts) − delay).

Deterministic by construction: batch membership is a pure function of
``event_id``, file order is pinned by name AND mtime, and all
boundaries are generic microsecond values that never collide with round
window ends (margins asserted in tests).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


_FEED_CACHE: dict = {}


def split_arrival_files(
    spark: SparkSession,
    events_path: str,
    n_batches: int = 3,
) -> str:
    """Materialize ``events_path`` as ``n_batches`` single parquet files
    (membership = ``event_id % n_batches``) with ascending names and
    mtimes, so FileStreamSource + ``maxFilesPerTrigger=1`` replays them
    as that many ordered micro-batches.  Cached per (app, source,
    n_batches) — the split is deterministic, so re-runs (bench warm +
    timed reps) reuse the files."""
    key = (spark.sparkContext.applicationId, events_path, n_batches)
    if key in _FEED_CACHE:
        return _FEED_CACHE[key]
    feed = tempfile.mkdtemp(prefix="spark_late_feed_")
    src = spark.read.parquet(events_path)
    base_t = 1_700_000_000
    for b in range(n_batches):
        stage = feed + f"/_stage{b}"
        (
            src.where(F.col("event_id") % n_batches == b)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = os.path.join(feed, f"batch{b:03d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        shutil.rmtree(stage)
        os.utime(dst, (base_t + 60 * b, base_t + 60 * b))
    if len(_FEED_CACHE) > 16:
        _FEED_CACHE.clear()
    _FEED_CACHE[key] = feed
    return feed


def streaming_late_window_counts(
    spark: SparkSession,
    events_path: str,
    schema,
    window: str = "6 hours",
    watermark: str = "1 hour",
    n_batches: int = 3,
    query_name: str = "late_drop",
):
    """Append-mode tumbling-window counts over the ordered multi-batch
    replay — the query whose RESULT differs from its batch twin exactly
    by the engine's late-row drops.  Returns the StreamingQuery writing
    to the in-memory table ``query_name``."""
    feed = split_arrival_files(spark, events_path, n_batches)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
