"""Streaming incremental near-dup ingest: ``foreachBatch`` joining each
micro-batch of NEW documents against a persisted corpus LSH band index
(:func:`projet_graphdb_spark.functions.dedup.incremental_lsh_dups`).

This is the production shape of ingest-side dedup: the corpus index is
built once (:func:`...dedup.lsh_band_index`, sunk to parquet), and the
document stream drains through it — each micro-batch pays its own
O(batch × bands) signature work plus a candidate-bounded verify, never
a corpus re-scan.

Why the composition is exact: emitted pairs are shard×corpus only, and
a document's band keys are a pure function of its own text, so batch
boundaries cannot change the pair set — the union over micro-batches
equals the one-shot :func:`incremental_lsh_dups` over the whole shard
(that is the oracle-checked invariant behind e34, which reuses d26's
full SQL oracle).

Sink idempotency (round-8 verdict): each micro-batch OVERWRITES its own
``batch_id=<n>`` partition of the pair sink instead of blind-appending.
foreachBatch gives at-least-once batch execution — a crash after the
write but before the checkpoint commit replays the batch on restart —
and a batch's pair set is a pure function of its input files, so the
replayed overwrite rewrites identical rows and the drained sink is
exactly-once AS READ.  The kill-between-write-and-commit test
(tests/test_streaming_events.py::test_ingest_dedup_stream_midbatch_replay)
pins exactly that window by deleting the last checkpoint commit and
re-draining.  On object stores without atomic directory overwrite, swap
the per-batch partition for a table format's MERGE keyed on
(batch_id, new_id, corpus_id), keeping the join logic unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projet_graphdb_spark.functions import dedup


def streaming_ingest_dedup(
    spark: SparkSession,
    shard_path: str,
    schema,
    corpus: DataFrame,
    index: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash: str = "xxhash64",
    max_files_per_trigger: int | None = 1,
):
    """Drain a file stream of new documents with availableNow, joining
    every micro-batch against the persisted ``index`` and writing the
    verified (new_id, corpus_id, jaccard) pairs to ``out_dir`` under a
    per-batch ``batch_id=<n>`` partition (idempotent on micro-batch
    replay — see the module docstring; read the sink back with
    ``spark.read.parquet(out_dir)`` and project the pair columns).

    The LSH config (num_hashes/bands/n/hash) is forwarded to every
    per-batch ``incremental_lsh_dups`` call, which validates it against
    the config columns the index carries — a corpus indexed with a
    non-default construction fails loudly at the FIRST micro-batch
    instead of draining "successfully" with zero matches.

    ``corpus`` is referenced only by the candidate-bounded verify
    lookup inside ``incremental_lsh_dups`` (semi-join pruned);
    ``max_files_per_trigger=1`` forces several REAL micro-batches so
    the per-batch path is what actually runs.  Returns the
    StreamingQuery.
    """

    def _ingest(batch_df: DataFrame, batch_id: int):
        pairs = dedup.incremental_lsh_dups(
            corpus,
            batch_df,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            n=n,
            text_col=text_col,
            id_col=id_col,
            hash=hash,
            index=index,
        )
        # overwrite THIS batch's partition, never append: foreachBatch
        # replays a batch whose write landed but whose checkpoint commit
        # didn't, and the pair set is a pure function of the batch's
        # input files — so the replay rewrites identical rows instead of
        # duplicating them (at-least-once execution, exactly-once sink).
        pairs.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(shard_path)
        .writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
