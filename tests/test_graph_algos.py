"""Whole-graph analytics vs plain-Python/numpy references on small graphs."""

import numpy as np
import pytest

from projet_graphdb_spark.functions import graph_algos

# a small directed graph: two components + a dangling node
#   0→1→2→0 (cycle), 3→2, 4→5, 6 isolated-with-self? (6 has no edges)
EDGES = [(0, 1), (1, 2), (2, 0), (3, 2), (4, 5)]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_bfs_levels_directed(spark, edges_df):
    out = {r["id"]: r["level"] for r in graph_algos.bfs_levels(edges_df, [3]).collect()}
    assert out == {3: 0, 2: 1, 0: 2, 1: 3}


def test_bfs_levels_undirected(spark, edges_df):
    out = {
        r["id"]: r["level"]
        for r in graph_algos.bfs_levels(edges_df, [3], directed=False).collect()
    }
    assert out == {3: 0, 2: 1, 0: 2, 1: 2}


def test_connected_components(spark, edges_df):
    out = {
        r["id"]: r["component"]
        for r in graph_algos.connected_components(edges_df).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def np_pagerank(edges, n, num_iter=10, d=0.85):
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(num_iter):
        new = np.full(n, (1 - d) / n)
        dangling = sum(r[i] for i in range(n) if out_deg[i] == 0)
        new += d * dangling / n
        for s, t in edges:
            new[t] += d * r[s] / out_deg[s]
        r = new
    return r


def test_pagerank_matches_numpy(spark, edges_df):
    got = {r["id"]: r["rank"] for r in graph_algos.pagerank(edges_df, num_iter=10).collect()}
    expect = np_pagerank(EDGES, 6)
    for i in range(6):
        assert got[i] == pytest.approx(expect[i], rel=1e-9), i
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-6)


def test_sssp_hand_checked(spark):
    from projet_graphdb_spark.functions.graph_algos import sssp

    # 1 -2-> 2 -2-> 3 ; 1 -5-> 3 : shortest 1->3 = 4 via 2
    edges = spark.createDataFrame(
        [(1, 2, 2.0), (2, 3, 2.0), (1, 3, 5.0)], "src long, dst long, weight double"
    )
    out = {r["id"]: r["dist"] for r in sssp(edges, sources=[1], num_iter=5).collect()}
    assert out == {1: 0.0, 2: 2.0, 3: 4.0}, out


def test_sssp_hop_bound_semantics(spark):
    from projet_graphdb_spark.functions.graph_algos import sssp

    # chain of 3 edges; with num_iter=2 node 4 (3 hops away) is absent
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)], "src long, dst long, weight double"
    )
    out = {r["id"]: r["dist"] for r in sssp(edges, sources=[1], num_iter=2).collect()}
    assert out == {1: 0.0, 2: 1.0, 3: 2.0}, out
