"""Variable-length path matching ``-[:r*]->`` (engine extension)."""

import pytest

from projet_graphdb_spark.engine import binding_table, run_program
from projet_graphdb_spark.frontend.typecheck import TypeCheckError

CHAIN = """
(:N {v int})
(:N) -[:next]-> (:N)
create (a: N) -[:next]-> (b: N)
create (b) -[:next]-> (c: N)
create (c) -[:next]-> (d: N)
set a.v = 1, b.v = 2, c.v = 3, d.v = 4
"""


def test_star_transitive_closure(spark):
    _, b = run_program(spark, CHAIN + "match (x: N) -[:next*]-> (y: N) return x, y")
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    # all ordered pairs reachable in >= 1 hop along the chain 0-1-2-3
    assert rows == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], rows


def test_star_one_hop_included(spark):
    _, b = run_program(spark, CHAIN + "match (x: N) -[:next*]-> (y: N) where x.v = 3 return y")
    assert [tuple(r) for r in binding_table(b).collect()] == [(3,)]


def test_star_with_cycle_terminates(spark):
    prog = """
(:N {v int})
(:N) -[:next]-> (:N)
create (a: N) -[:next]-> (b: N)
create (b) -[:next]-> (a)
match (x: N) -[:next*]-> (y: N) return x, y
"""
    _, b = run_program(spark, prog)
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    # 2-cycle: every node reaches both nodes (including itself)
    assert rows == [(0, 0), (0, 1), (1, 0), (1, 1)], rows


def test_star_mixed_with_plain_rel(spark):
    _, b = run_program(
        spark,
        CHAIN + "match (x: N) -[:next*]-> (y: N) -[:next]-> (z: N) where x.v = 1 return y, z",
    )
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    # y reachable from a, z one hop beyond y: (b,c), (c,d)
    assert rows == [(1, 2), (2, 3)], rows


def test_star_rejects_create(spark):
    with pytest.raises(TypeCheckError, match="only legal in match"):
        run_program(spark, "(:N {v int})\n(:N) -[:next]-> (:N)\ncreate (a: N) -[:next*]-> (b: N)")


MIXED = """
(:A {v int})
(:B {v int})
(:C {v int})
(:A) -[:hop]-> (:B)
(:B) -[:hop]-> (:C)
create (a: A) -[:hop]-> (b: B)
create (b) -[:hop]-> (c: C)
create (d: A) -[:hop]-> (e: B)
create (e) -[:hop]-> (f: C)
"""


def test_star_mixed_labels_single_hop(spark):
    # emp is declared P→E only; *1.. reaches E from P in one hop, so the
    # closure endpoint check accepts what the executor can satisfy
    prog = """
(:P {v int})
(:E {v int})
(:P) -[:emp]-> (:E)
create (a: P) -[:emp]-> (b: E)
match (x: P) -[:emp*]-> (y: E) return x, y
"""
    _, b = run_program(spark, prog)
    assert [tuple(r) for r in binding_table(b).collect()] == [(0, 1)]


def test_star_mixed_label_chain(spark):
    # hop composes across the label change A→B→C; exactly-2-hop pairs
    _, b = run_program(spark, MIXED + "match (x: A) -[:hop*2..2]-> (y: C) return x, y")
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    assert rows == [(0, 2), (3, 5)], rows


def test_star_mixed_label_endpoint_filter(spark):
    # unbounded closure still label-filters endpoints: A→B pairs at 1 hop
    _, b = run_program(spark, MIXED + "match (x: A) -[:hop*]-> (y: B) return x, y")
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    assert rows == [(0, 1), (3, 4)], rows


def test_star_rejects_unreachable_labels(spark):
    # no hop-path of length >= 1 runs C→A in the label graph
    with pytest.raises(TypeCheckError, match="cannot reach"):
        run_program(spark, MIXED + "match (x: C) -[:hop*]-> (y: A) return x, y")


def test_star_mixed_label_undirected(spark):
    # undirected closure composes across labels BOTH ways: 2-hop walks
    # C→B→A over edges {0-1,1-2,3-4,4-5}
    _, b = run_program(spark, MIXED + "match (x: C) -[:hop*2..2]- (y: A) return x, y")
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    assert rows == [(2, 0), (5, 3)], rows


def test_star_rejects_unreachable_length(spark):
    # A→B exists at length 1 only; *2..2 cannot land on B
    with pytest.raises(TypeCheckError, match="cannot reach"):
        run_program(spark, MIXED + "match (x: A) -[:hop*2..2]-> (y: B) return x, y")


def test_star_bounded_range(spark):
    _, b = run_program(spark, CHAIN + "match (x: N) -[:next*2..3]-> (y: N) return x, y")
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    # chain 0-1-2-3: pairs at 2 hops {(0,2),(1,3)}, at 3 hops {(0,3)}
    assert rows == [(0, 2), (0, 3), (1, 3)], rows


def test_star_bounded_exact_one(spark):
    _, b = run_program(spark, CHAIN + "match (x: N) -[:next*1..1]-> (y: N) return x, y")
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    assert rows == [(0, 1), (1, 2), (2, 3)], rows  # plain edges


def test_star_bounded_invalid_bounds(spark):
    with pytest.raises(TypeCheckError, match="invalid"):
        run_program(spark, CHAIN + "match (x: N) -[:next*3..2]-> (y: N) return x, y")


def test_undirected_edge_match(spark):
    _, b = run_program(spark, CHAIN + "match (x: N) -[:next]- (y: N) return x, y")
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    # each chain edge matched both ways
    assert rows == [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)], rows


def test_undirected_star(spark):
    _, b = run_program(spark, CHAIN + "match (x: N) -[:next*]- (y: N) where x.v = 4 return y")
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    # closure over symmetrized edges: from d every node incl. itself
    assert rows == [(0,), (1,), (2,), (3,)], rows


def test_undirected_reciprocal_edges_single_row(spark):
    # reciprocal edges a->b and b->a of the same rel must yield ONE
    # binding row per direction, regardless of which join path the
    # planner picks (pending-column resolve vs both-materialized semi)
    prog = """
(:N {v int})
(:N) -[:next]-> (:N)
create (a: N) -[:next]-> (b: N)
create (b) -[:next]-> (a)
match (x: N) -[:next]- (y: N) return x, y
"""
    _, b = run_program(spark, prog)
    rows = sorted(tuple(r) for r in binding_table(b).collect())
    assert rows == [(0, 1), (1, 0)], rows


def test_undirected_rejects_create(spark):
    with pytest.raises(TypeCheckError, match="only legal in match"):
        run_program(spark, "(:N {v int})\n(:N) -[:next]-> (:N)\ncreate (a: N) -[:next]- (b: N)")
