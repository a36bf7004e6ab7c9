"""Optional match (left-join) and not-exists (anti-join) extensions."""

import pytest

from projet_graphdb_spark.engine import binding_table, run_program
from projet_graphdb_spark.frontend.typecheck import TypeCheckError
from projet_graphdb_spark.frontend.parser import ParseError

BASE = """
(:P {v int})
(:Q {v int})
(:P) -[:knows]-> (:Q)
create (a: P)
create (b: P)
create (q1: Q)
create (a) -[:knows]-> (q1)
create (q2: Q)
create (a) -[:knows]-> (q2)
"""


def rows(b):
    return sorted(
        [tuple(r) for r in binding_table(b).collect()],
        key=lambda t: tuple(-1 if x is None else x for x in t),
    )


def test_optional_match_null_extends(spark):
    _, b = run_program(
        spark, BASE + "match (x: P) optional match (x) -[:knows]-> (y: Q) return x, y"
    )
    # a(0) matches q1(2), q2(3); b(1) kept with NULL
    assert rows(b) == [(0, 2), (0, 3), (1, None)]


def test_optional_match_new_var_on_source_side(spark):
    _, b = run_program(
        spark, BASE + "match (z: Q) optional match (w: P) -[:knows]-> (z) return z, w"
    )
    assert rows(b) == [(2, 0), (3, 0)]


def test_not_exists_anonymous_target(spark):
    _, b = run_program(
        spark, BASE + "match (x: P) where not exists (x) -[:knows]-> (:Q) return x"
    )
    assert rows(b) == [(1,)]


def test_not_exists_both_bound(spark):
    _, b = run_program(
        spark,
        BASE
        + "match (x: P) match (y: Q) where not exists (x) -[:knows]-> (y) return x, y",
    )
    assert rows(b) == [(1, 2), (1, 3)]


def test_not_exists_after_delete(spark):
    _, b = run_program(
        spark,
        BASE
        + "match (x: P) -[:knows]-> (y: Q)\n"
        + "delete x -[:knows]-> y\n"
        + "where not exists (x) -[:knows]-> (:Q)\n"
        + "return x",
    )
    # both of a's edges deleted -> a's rows survive the anti filter
    assert rows(b) == [(0,), (0,)]


def test_optional_match_rejects_two_decls(spark):
    with pytest.raises(ParseError, match="exactly one bound"):
        run_program(
            spark, BASE + "match (x: P) optional match (w: P) -[:knows]-> (y: Q) return x"
        )


def test_not_exists_requires_bound_side(spark):
    with pytest.raises(ParseError, match="at least one bound"):
        run_program(
            spark, BASE + "match (x: P) where not exists (:P) -[:knows]-> (:Q) return x"
        )


def test_optional_match_undeclared_rel(spark):
    with pytest.raises(TypeCheckError, match="not declared"):
        run_program(
            spark, BASE + "match (x: Q) optional match (x) -[:knows]-> (y: Q) return x, y"
        )


def test_not_exists_unbound_var(spark):
    with pytest.raises(TypeCheckError, match="not bound"):
        run_program(spark, BASE + "match (x: P) where not exists (zz) -[:knows]-> (:Q) return x")


AGG_BASE = BASE + "set q1.v = 10, q2.v = 30\n"


def test_return_count_after_optional_includes_zero(spark):
    _, b = run_program(
        spark,
        AGG_BASE + "match (x: P) optional match (x) -[:knows]-> (y: Q) return x, count(y)",
    )
    assert rows(b) == [(0, 2), (1, 0)]


def test_return_attr_aggregates(spark):
    _, b = run_program(
        spark,
        AGG_BASE
        + "match (x: P) -[:knows]-> (y: Q)\n"
        + "return x, count(y), sum(y.v), min(y.v), max(y.v), avg(y.v)",
    )
    assert [tuple(r) for r in binding_table(b).collect()] == [(0, 2, 40, 10, 30, 20.0)]


def test_return_global_aggregate(spark):
    _, b = run_program(spark, AGG_BASE + "match (y: Q) return count(y), sum(y.v)")
    assert [tuple(r) for r in binding_table(b).collect()] == [(2, 40)]


def test_return_agg_rejects_string_sum(spark):
    prog = """
(:P {nom string})
create (a: P)
match (x: P) return sum(x.nom)
"""
    with pytest.raises(TypeCheckError, match="int attribute"):
        run_program(spark, prog)


def test_return_agg_unbound_var(spark):
    with pytest.raises(TypeCheckError, match="not bound"):
        run_program(spark, BASE + "match (x: P) return x, count(zz)")


def test_return_distinct_dedups(spark):
    prog = AGG_BASE + "create (b) -[:knows]-> (q1)\n" \
        + "match (x: P) -[:knows]-> (y: Q) return distinct y"
    _, b = run_program(spark, prog)
    assert rows(b) == [(2,), (3,)]


def test_order_by_attr_desc_limit(spark):
    prog = AGG_BASE + "match (x: P) -[:knows]-> (y: Q) " \
        + "order by y.v desc limit 1 return x, y"
    _, b = run_program(spark, prog)
    assert rows(b) == [(0, 3)]


def test_order_by_aggregate_output(spark):
    prog = AGG_BASE + "create (b) -[:knows]-> (q1)\n" \
        + "match (x: P) -[:knows]-> (y: Q) return x, count(y) " \
        + "order by count_y desc limit 1"
    _, b = run_program(spark, prog)
    assert rows(b) == [(0, 2)]


def test_order_limit_requires_limit(spark):
    from projet_graphdb_spark.frontend.parser import ParseError as PE

    with pytest.raises(PE):
        run_program(spark, AGG_BASE + "match (y: Q) order by y.v return y")


def test_order_by_attr_on_agg_output_rejected(spark):
    with pytest.raises(TypeCheckError, match="aggregate output"):
        run_program(
            spark,
            AGG_BASE + "match (y: Q) return count(y) order by count_y.v desc limit 1",
        )


def test_having_over_count(spark):
    prog = AGG_BASE + "create (b) -[:knows]-> (q1)\n" \
        + "match (x: P) -[:knows]-> (y: Q) return x, count(y) where count_y >= 2"
    _, b = run_program(spark, prog)
    assert rows(b) == [(0, 2)]


def test_bare_node_var_comparison(spark):
    # node ids are ints: x <> x is always false, x = x always true
    prog = AGG_BASE + "match (x: P) match (y: P) where x <> y return x, y"
    _, b = run_program(spark, prog)
    assert rows(b) == [(0, 1), (1, 0)]


def test_avg_output_rejected_in_where(spark):
    with pytest.raises(TypeCheckError, match="avg output"):
        run_program(
            spark,
            AGG_BASE + "match (y: Q) return avg(y.v) where avg_y_v >= 1",
        )


def test_set_on_agg_output_rejected(spark):
    with pytest.raises(TypeCheckError, match="not a node variable"):
        run_program(
            spark,
            AGG_BASE + "match (y: Q) return count(y) set count_y.v = 1",
        )


def test_setops_semantics(spark):
    base = """
(:P {v int})
create (a: P)
create (b: P)
create (c: P)
set a.v = 1, b.v = 2, c.v = 1
"""
    _, u = run_program(
        spark, base + "match (x: P) where x.v = 1 return x union match (x: P) where x.v = 2 return x"
    )
    assert rows(u) == [(0,), (1,), (2,)]
    _, i = run_program(
        spark, base + "match (x: P) return x intersect match (x: P) where x.v = 1 return x"
    )
    assert rows(i) == [(0,), (2,)]
    _, e = run_program(
        spark, base + "match (x: P) return x except match (x: P) where x.v = 1 return x"
    )
    assert rows(e) == [(1,)]


def test_setop_mutation_visible_across_branches(spark):
    base = "(:P {v int})\ncreate (x: P)\n"
    _, b = run_program(spark, base + "return x union match (x: P) return x")
    # branch 2 sees the node created in branch 1
    assert rows(b) == [(0,)]


def test_setop_mismatched_vars_rejected(spark):
    with pytest.raises(TypeCheckError, match="different variables"):
        run_program(
            spark,
            "(:P {v int})\ncreate (a: P)\nmatch (x: P) return x union match (y: P) return y",
        )
