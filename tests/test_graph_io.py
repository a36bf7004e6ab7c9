"""Graph persistence: save a mutated GraphState, reload it, keep
querying — and the edge store must prune on rel at scan time."""

import pytest
from pyspark.sql import functions as F

from projet_graphdb_spark.engine import binding_table, run_program
from projet_graphdb_spark.sources import load_graph, save_graph


PROG = """
(:P {nom string, age int})
(:E {nom string})
(:P) -[:emp]-> (:E)
(:P) -[:ami]-> (:P)
create (a: P) -[:emp]-> (x: E)
create (b: P) -[:emp]-> (x)
create (a) -[:ami]-> (b)
set a.nom = "Alice", a.age = 30, b.nom = "Bob", b.age = 25, x.nom = "Acme"
"""


def test_save_load_roundtrip(spark, tmp_path):
    state, _ = run_program(spark, PROG)
    path = str(tmp_path / "graph")
    save_graph(state, path)
    back = load_graph(spark, path)

    assert back.next_id == state.next_id
    assert {d.label for d in back.types.nodes} == {"P", "E"}
    assert back.collect_nodes() == state.collect_nodes()
    assert sorted(map(tuple, back.edges.collect())) == sorted(
        map(tuple, state.edges.collect())
    )


def test_reloaded_graph_is_queryable(spark, tmp_path):
    state, _ = run_program(spark, PROG)
    path = str(tmp_path / "graph2")
    save_graph(state, path)
    back = load_graph(spark, path)

    _, b = run_program(
        spark,
        'match (p: P) -[:emp]-> (e: E) where p.age < 28 return p, e',
        initial_state=back,
    )
    rows = [tuple(r) for r in binding_table(b).collect()]
    assert len(rows) == 1  # only Bob (25)


def test_edge_scan_prunes_on_rel_partition(spark, tmp_path):
    state, _ = run_program(spark, PROG)
    path = str(tmp_path / "graph3")
    save_graph(state, path)
    back = load_graph(spark, path)
    plan = (
        back.edges.filter(F.col("rel") == "ami")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition pruning: the rel predicate must land in PartitionFilters
    assert "PartitionFilters: [" in plan and "rel" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_bucketed_edges_join_without_exchange(spark, tmp_path):
    """The bucketed layout must remove the per-iteration shuffle: a
    src-keyed self-join of the bucketed edge table plans with no
    Exchange and no Sort on either side, while the same join over plain
    parquet shuffles both sides."""
    from pyspark.sql import functions as F

    from projet_graphdb_spark.sources.graph_io import (
        load_edges_bucketed,
        save_edges_bucketed,
    )

    edges = spark.range(1000).select(
        (F.col("id") % 97).alias("src"),
        F.lit("r").alias("rel"),
        ((F.col("id") * 7) % 97).alias("dst"),
    )
    save_edges_bucketed(edges, str(tmp_path / "be"), table="t_bucketed_edges", n_buckets=8)
    try:
        b = load_edges_bucketed(spark, "t_bucketed_edges")
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            j = b.alias("a").join(
                b.alias("c"), F.col("a.src") == F.col("c.src")
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() > 0

            # control: the identical join over non-bucketed parquet shuffles
            edges.write.mode("overwrite").parquet(str(tmp_path / "plain"))
            p = spark.read.parquet(str(tmp_path / "plain"))
            jp = p.alias("a").join(p.alias("c"), F.col("a.src") == F.col("c.src"))
            plan_p = jp._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plan_p, plan_p
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_edges")


def test_bulk_merge_nodes_match_and_create(spark):
    from projet_graphdb_spark.sources.graph_io import bulk_merge_nodes

    existing = spark.createDataFrame(
        [(10, "alpha"), (11, "beta")], "_id long, key string"
    )
    batch = spark.createDataFrame(
        [("alpha",), ("gamma",), ("delta",), ("alpha",)], "key string"
    )
    out = {r["key"]: r for r in bulk_merge_nodes(
        existing, batch, key_col="key", base_id=100).collect()}
    assert out["alpha"]["id"] == 10 and out["alpha"]["was_created"] is False
    # new keys: dense ids in sorted-key order (delta < gamma)
    assert out["delta"]["id"] == 100 and out["delta"]["was_created"] is True
    assert out["gamma"]["id"] == 101
    assert len(out) == 3  # batch duplicates collapsed
