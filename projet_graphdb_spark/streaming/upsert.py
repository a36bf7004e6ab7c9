"""CDC-style keyed upsert sink: ``foreachBatch`` merging each
micro-batch into a keyed parquet state — "latest event per key wins".

The memory/file sinks are append-shaped; real pipelines also need the
UPSERT contract (a user-profile table continuously refreshed from an
event stream).  Structured Streaming expresses that with
``foreachBatch``: each micro-batch is handed to a batch function that
merges it into the stored table.

Scale design: the merge is latest-per-key over (stored ∪ batch) — one
shuffle on the key per micro-batch, sized by |keys| + |batch|, never a
re-scan of the raw history.  The swap is write-to-staging + atomic
directory rename (safe on a real filesystem; on object stores swap the
staging dance for a table format with transactional MERGE — Delta or
Iceberg — keeping this module's reduce logic unchanged).  Restart
safety comes from the checkpoint: a replayed micro-batch re-merges the
same rows, and latest-per-key is idempotent under replay.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(
    df: DataFrame,
    key_cols: tuple = ("user_id",),
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Deterministic reduce: the row with max (ts, tiebreak) per key."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def streaming_upsert_to_parquet(
    spark: SparkSession,
    events_path: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    key_cols: tuple = ("user_id",),
    max_files_per_trigger: int | None = 2,
):
    """Drain the event stream with availableNow, merging every
    micro-batch into the keyed parquet state at ``state_dir``.

    ``max_files_per_trigger`` splits the drain into several real
    micro-batches so the merge path is exercised incrementally (not one
    batch == one overwrite).  Returns the StreamingQuery.
    """

    def _merge(batch_df: DataFrame, batch_id: int):
        batch_latest = latest_per_key(batch_df, key_cols)
        if os.path.isdir(state_dir):
            current = batch_df.sparkSession.read.parquet(state_dir)
            merged = latest_per_key(
                current.unionByName(batch_latest), key_cols
            )
        else:
            merged = batch_latest
        staging = state_dir + f".staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        # atomic on a real filesystem; object stores: use a table format
        old = state_dir + f".old-{batch_id}"
        if os.path.isdir(state_dir):
            os.rename(state_dir, old)
        os.rename(staging, state_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(events_path)
        .writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
