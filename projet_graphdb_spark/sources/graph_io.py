"""Graph persistence: save / load a GraphState as parquet.

The reference's only sink is stdout/dot/LaTeX display (`display.ml`) and
its only source is the .q script text — a mutated graph dies with the
process.  The Spark-native capability is a durable graph store:

* nodes: one parquet dataset per label (typed columns preserved);
* edges: a single dataset **partitioned by ``rel``** so a later
  ``match -[:r]->`` prunes to one partition directory at scan time
  (partition pruning visible as PartitionFilters in the plan);
* a tiny JSON sidecar records the type graph + next_id watermark.

At 100 TB: writes are append-only columnar files sized by
``spark.sql.files.maxRecordsPerFile``; the per-rel partitioning is the
same layout a warehouse would use for an edge table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from ..frontend import ast as A
from ..engine.state import GraphState, node_schema

_META = "_graph_meta.json"


def save_graph(state: GraphState, path: str) -> None:
    """Persist nodes (per label) + edges (partitioned by rel) + metadata."""
    for label, df in state.nodes.items():
        df.write.mode("overwrite").parquet(f"{path}/nodes/{label}")
    state.edges.write.mode("overwrite").partitionBy("rel").parquet(f"{path}/edges")
    meta = {
        "next_id": state.next_id,
        "types": {
            "nodes": [
                [d.label, [[n, t.value] for n, t in d.attrs]] for d in state.types.nodes
            ],
            "rels": [[r.src, r.rel, r.tgt] for r in state.types.rels],
        },
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f)


def load_graph(spark: SparkSession, path: str) -> GraphState:
    """Re-open a saved graph; node column types come from the declared
    type graph (not inference), edge scans prune on ``rel``."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    types = A.TypeGraph(
        nodes=[
            A.NodeTypeDecl(label, tuple((n, A.AttribType(t)) for n, t in attrs))
            for label, attrs in meta["types"]["nodes"]
        ],
        rels=[A.RelTypeDecl(*r) for r in meta["types"]["rels"]],
    )
    nodes = {}
    for decl in types.nodes:
        df = spark.read.schema(node_schema(decl)).parquet(f"{path}/nodes/{decl.label}")
        nodes[decl.label] = df
    edges = spark.read.parquet(f"{path}/edges").select("src", "rel", "dst")
    return GraphState(spark, types, nodes, edges, meta["next_id"])


def save_edges_bucketed(
    edges,
    path: str,
    table: str = "graph_edges_bucketed",
    n_buckets: int = 32,
) -> None:
    """Persist the edge table BUCKETED and SORTED by ``src`` as an
    external parquet table (files under ``path``, bucket metadata in
    the session catalog).

    This is the 100 TB layout for iterative graph workloads: every
    pregel-style round joins edges on ``src`` (bfs/sssp/pagerank/cc/
    lpa all do), and a hash-bucketed, sorted table lets Catalyst plan
    those joins with NO Exchange and NO Sort on the edge side — the
    shuffle that normally dominates every iteration disappears from
    the plan (asserted in tests/test_graph_io.py).  Pick ``n_buckets``
    so a bucket ≈ one executor-core's working set (e.g. 100 TB / 4096
    buckets ≈ 25 GB per bucket of columnar, pruned scan).
    """
    (
        edges.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, "src")
        .sortBy("src")
        .format("parquet")
        .saveAsTable(table)
    )


def load_edges_bucketed(spark: SparkSession, table: str = "graph_edges_bucketed"):
    """Open the bucketed edge table (bucket metadata comes from the
    catalog — reading the files directly would lose it)."""
    return spark.table(table)


def bulk_merge_nodes(
    existing,
    batch,
    key_col: str,
    id_col: str = "_id",
    base_id: int = 1_000_000_000,
):
    """Set-based match-or-create (the bulk form of the engine's MERGE,
    executor.py::_merge_node): resolve every key in ``batch`` to a node
    id — existing keys keep their id, new keys are allocated dense ids
    ``base_id + rank`` in sorted-key order.

    This is the graph-ingest primitive the reference's one-row-at-a-time
    fold (sem.ml:377-378) cannot express: ONE left join decides
    match-vs-create for the whole batch, ONE rank assigns all new ids —
    no per-row driver probe.

    Id discipline: sorted-key ranking makes ids a pure function of the
    key SET (deterministic across runs and partitionings — what the
    correctness oracle replays).  The rank is computed DISTRIBUTED
    (relational.partition_offset_rank: range-repartition + broadcast
    prefix offsets), never a single-partition global window — a
    cold-start batch is the WHOLE load, so serializing the new-key
    subset through one task was the round-8 funnel class in disguise;
    the offset rank keeps the same sorted-key ids fully parallel.

    Returns (id, key, was_created) for every distinct batch key.
    """
    from pyspark.sql import functions as F

    from projet_graphdb_spark.functions.relational import partition_offset_rank

    b = batch.select(F.col(key_col).alias("key")).distinct()
    e = existing.select(
        F.col(id_col).alias("_eid"), F.col(key_col).alias("key")
    )
    j = b.join(e, "key", "left")
    matched = j.where(F.col("_eid").isNotNull()).select(
        F.col("_eid").alias("id"), "key", F.lit(False).alias("was_created")
    )
    created = (
        partition_offset_rank(
            j.where(F.col("_eid").isNull()).select("key"),
            [F.asc("key")],
            "_rk",
        )
        .select(
            (F.lit(base_id) + F.col("_rk") - 1).cast("long").alias("id"),
            "key",
            F.lit(True).alias("was_created"),
        )
    )
    return matched.unionByName(created).orderBy("key")
