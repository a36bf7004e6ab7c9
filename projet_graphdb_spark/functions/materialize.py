"""Lineage-cut materialization with an optional SINK-BACKED mode.

``localCheckpoint`` stores its blocks in executor storage memory
(MEMORY_AND_DISK) and is non-fault-tolerant — the lineage is truncated,
so a lost executor cannot recompute (guide §5; the exact pattern behind
the r15 t42 sf1 crash warnings).  At bench SF it is the cheapest
barrier; at 100 TB iteration state and funnel manifests must not pin
storage memory or die with an executor.

Setting ``SPARK_GRAFT_CKPT_DIR`` switches every caller of
:func:`materialize` to a parquet round-trip under that directory —
durable, bounded by disk, re-readable after any executor loss — without
touching call sites (round-15 verdict item 7).  Unset (the default, and
the bench configuration) the behavior is byte-for-byte the historical
``localCheckpoint`` path, so driver bench comparisons stay valid.

Rotation predecessors are freed through :func:`release`: RDD handles
are unpersisted, sink paths are deleted.  Every sink path is unique per
call (uuid4), so nothing is ever shared across runs — this is
intra-query materialization, not a cache.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def ckpt_dir() -> str | None:
    """The sink-backed materialization root, or None for the in-memory
    ``localCheckpoint`` default."""
    return os.environ.get("SPARK_GRAFT_CKPT_DIR") or None


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage.  Default: ``localCheckpoint(eager)``.
    With ``SPARK_GRAFT_CKPT_DIR`` set: write parquet under a unique
    sub-directory and read it back (always eager — the write IS the
    materialization).  Returns the barriered frame; pair with
    :func:`handle_of` / :func:`release` when rotating iteration
    state."""
    d = ckpt_dir()
    if d is None:
        return df.localCheckpoint(eager=eager)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"mat_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(path)
    out = df.sparkSession.read.parquet(path)
    out._graft_sink_path = path  # release() deletes it
    return out


def handle_of(df: DataFrame):
    """Opaque cleanup handle for a frame returned by
    :func:`materialize` in sink-backed mode (the parquet path), or
    None in the default mode (callers keep their RDD-handle logic)."""
    return getattr(df, "_graft_sink_path", None)


def release(handle) -> None:
    """Free a rotation predecessor: delete its sink directory (string
    handles) — RDD handles are the caller's to unpersist.  Best-effort:
    cleanup must never fail the algorithm."""
    if isinstance(handle, str):
        shutil.rmtree(handle, ignore_errors=True)
