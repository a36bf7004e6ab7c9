"""Whole-graph analytics over the (nodes, edges) DataFrames.

The reference has no whole-graph operators (its only traversal is the
fixed-length match motif).  These are the standard Spark-native iterative
algorithms — the GraphX/GraphFrames capability re-expressed as pure
DataFrame joins so they run anywhere DataFrames run:

* ``bfs_levels``        — unweighted shortest-path level per node from a
                          source set (frontier expansion).
* ``pagerank``          — power iteration with damping.
* ``connected_components`` — iterative min-label propagation (undirected
                          view of the edges).

Scale design: each iteration is one join + aggregate on the edge table
(shuffle on dst/src) — the classic pregel message pattern.  Lineage is
cut with ``localCheckpoint`` every iteration, otherwise the plan doubles
per round and the driver, not the cluster, becomes the bottleneck.  For
a 100 TB graph, pre-partition ``edges`` by ``src`` (bucketing) so every
iteration's join co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_levels(
    edges: DataFrame,
    sources: list,
    max_iter: int = 20,
    directed: bool = True,
) -> DataFrame:
    """(node id, level) for every node reachable from ``sources``.

    Level = number of hops from the nearest source (sources are level 0).
    Frontier expansion: each round joins the frontier against the edge
    table and anti-joins already-visited nodes.
    """
    e = edges.select(F.col("src"), F.col("dst"))
    if not directed:
        e = e.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # materialize once: every iteration runs 2+ actions, and without the
    # barrier each one re-executes the caller's whole edge derivation
    # (parquet scans, unions) from scratch
    e = e.localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(int(s), 0) for s in sources], "id long, level int"
    ).localCheckpoint(eager=True)
    frontier = visited
    for level in range(1, max_iter + 1):
        nxt = (
            frontier.join(e, frontier.id == e.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("level", F.lit(level))
        )
        nxt = nxt.localCheckpoint(eager=True)  # cut lineage each round
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def pagerank(
    edges: DataFrame,
    num_iter: int = 10,
    damping: float = 0.85,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(id, rank) after ``num_iter`` power iterations.

    Dangling nodes (no out-edges) redistribute their mass uniformly, the
    standard formulation.  Each iteration: one join edge⋈rank (shuffle on
    src), one aggregate on dst.
    """
    # materialize the per-iteration inputs ONCE (see bfs_levels note)
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    nodes = nodes.select("id").localCheckpoint(eager=True)
    n = nodes.count()
    out_deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "_dsrc")
        .localCheckpoint(eager=True)
    )
    # contributions flow along edges; rank starts uniform
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(num_iter):
        # dangling mass from the small (ranks ⋈ out_deg) side only — the
        # edge join never has to be executed twice per iteration
        dangling_mass = (
            ranks.join(out_deg, ranks.id == F.col("_dsrc"), "left_anti")
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        inbound = (
            ranks.join(out_deg, ranks.id == F.col("_dsrc"))
            .join(e, ranks.id == e.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        ranks = (
            nodes.join(inbound, nodes.id == inbound.dst, "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling_mass / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(id, component) with component = min node id in the component
    (undirected view).  Min-label propagation until fixpoint."""
    both = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        both.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iter):
        # each node adopts the min label among itself and its neighbours
        neigh_min = (
            both.join(labels, both.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        labels = (
            labels.join(neigh_min, labels.id == neigh_min.src, "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        # labels only ever decrease, so the total is a fixpoint witness:
        # unchanged sum ⇔ no label moved (one cheap agg on the
        # checkpointed labels instead of a join + isEmpty action)
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
