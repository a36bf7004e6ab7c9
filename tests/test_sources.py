"""Bulk graph loader: id spaces, edge projections, engine integration."""

from pyspark.sql import functions as F

from projet_graphdb_spark.engine import binding_table, run_program
from projet_graphdb_spark.sources import OFFSETS, load_tpch_graph

from conftest import SF_TINY


def test_node_id_spaces_disjoint(spark):
    state = load_tpch_graph(spark, SF_TINY)
    ranges = {}
    for label, df in state.nodes.items():
        if df.isEmpty():
            continue
        row = df.agg(F.min("_id"), F.max("_id")).collect()[0]
        ranges[label] = (row[0], row[1])
    labels = list(ranges)
    for i, a in enumerate(labels):
        for b in labels[i + 1 :]:
            lo_a, hi_a = ranges[a]
            lo_b, hi_b = ranges[b]
            assert hi_a < lo_b or hi_b < lo_a, (a, b, ranges)


def test_edges_reference_existing_nodes(spark):
    state = load_tpch_graph(spark, SF_TINY)
    all_ids = state.nodes_long().select("_id")
    dangling_src = state.edges.join(all_ids, state.edges.src == all_ids._id, "left_anti")
    dangling_dst = state.edges.join(all_ids, state.edges.dst == all_ids._id, "left_anti")
    assert dangling_src.isEmpty() and dangling_dst.isEmpty()


def test_engine_query_over_loaded_graph(spark):
    state = load_tpch_graph(spark, SF_TINY)
    customers = state.nodes["Customer"].count()
    _, b = run_program(
        spark,
        "match (c: Customer) -[:in_nation]-> (n: Nation) return c, n",
        initial_state=state,
    )
    # every customer has exactly one nation edge
    assert binding_table(b).count() == customers


def test_offsets_documented(spark):
    assert OFFSETS["Region"] < OFFSETS["Nation"] < OFFSETS["Supplier"]


def test_load_graph_from_csv_matches_parquet(spark, tmp_path):
    """The star-schema loader is format-agnostic: a CSV copy of the
    fixture tables projects to the identical graph."""
    import os

    from projet_graphdb_spark.sources import load_tpch_graph

    d = str(tmp_path / "csvsf")
    os.makedirs(d, exist_ok=True)
    for t in ["region", "nation", "supplier", "customer", "orders", "part"]:
        df = spark.read.parquet(f"{SF_TINY}/{t}.parquet")
        # drop date/binary-ish columns CSV round-trips poorly? fixtures
        # are numeric/string only — write as-is
        df.coalesce(1).write.option("header", "true").mode("overwrite").csv(f"{d}/{t}.csv")
    pq = load_tpch_graph(spark, SF_TINY)
    cs = load_tpch_graph(spark, d, fmt="csv")
    for label in pq.nodes:
        a = sorted(map(tuple, pq.nodes[label].collect()))
        b = sorted(map(tuple, cs.nodes[label].collect()))
        assert a == b, label
    assert sorted(map(tuple, pq.edges.collect())) == sorted(map(tuple, cs.edges.collect()))


def test_load_graph_from_orc_matches_parquet(spark, tmp_path):
    """ORC copies of the fixture tables project to the identical graph
    (Spark's native ORC reader, pushdown/pruning like parquet)."""
    import os

    from projet_graphdb_spark.sources import load_tpch_graph

    d = str(tmp_path / "orcsf")
    os.makedirs(d, exist_ok=True)
    for t in ["region", "nation", "supplier", "customer", "orders", "part"]:
        df = spark.read.parquet(f"{SF_TINY}/{t}.parquet")
        df.coalesce(1).write.mode("overwrite").orc(f"{d}/{t}.orc")
    pq = load_tpch_graph(spark, SF_TINY)
    oc = load_tpch_graph(spark, d, fmt="orc")
    for label in pq.nodes:
        a = sorted(map(tuple, pq.nodes[label].collect()))
        b = sorted(map(tuple, oc.nodes[label].collect()))
        assert a == b, label
    assert sorted(map(tuple, pq.edges.collect())) == sorted(map(tuple, oc.edges.collect()))
