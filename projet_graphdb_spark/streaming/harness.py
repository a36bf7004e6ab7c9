"""Run-to-completion harness for the Structured Streaming twins.

The streaming operators in this package are the scale path for
continuous ingest; this module lets a BATCH harness (the driver's
correctness gate, bench.py) exercise the real streaming plans — file
stream source, watermarks, stateful operators, memory sink — by
draining them with trigger ``availableNow`` and handing back the sink
as a plain DataFrame.

The events fixture is normalized (nanos → micros timestamps) and
written once per (session, sf_dir) to a temp directory that the file
stream source consumes; all stream twins share that copy.
"""

from __future__ import annotations

import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from .events import load_events


@contextmanager
def state_partitions(spark: SparkSession, n: int):
    """Pin the state-store partition count for a streaming query.

    A stateful streaming query creates one state store per shuffle
    partition AT QUERY START and keeps that layout for its lifetime.
    Size it to the cluster: high for real multi-executor throughput,
    low for a local availableNow drain where per-store commit overhead
    dominates (32 stores x 4 join-state stores is pure fixed cost on a
    single machine)."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)

# (applicationId, sf_dir) -> (path, schema); one normalized copy per
# session+scale, shared by every stream twin
_SRC_CACHE: dict = {}


def stream_source(spark: SparkSession, sf_dir: str) -> tuple:
    """Path + schema of a micros-normalized parquet copy of the events
    fixture, materialized once and reused."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SRC_CACHE:
        path = tempfile.mkdtemp(prefix="spark_events_stream_") + "/events"
        load_events(spark, sf_dir).write.mode("overwrite").parquet(path)
        schema = spark.read.parquet(path).schema
        if len(_SRC_CACHE) > 16:
            _SRC_CACHE.clear()
        _SRC_CACHE[key] = (path, schema)
    return _SRC_CACHE[key]


def drain(query, spark: SparkSession, query_name: str, timeout_s: int = 300) -> DataFrame:
    """Wait for an availableNow StreamingQuery to finish, then return the
    memory-sink table it populated."""
    finished = query.awaitTermination(timeout_s)
    if not finished:
        query.stop()
        raise TimeoutError(f"stream {query_name} did not drain in {timeout_s}s")
    return spark.table(query_name)
