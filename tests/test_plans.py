"""Physical-plan regression guards: the plans that make the engine
scale-safe must not silently regress into quadratic shapes."""

import re

import pytest

import __spark_entry__ as E

from conftest import SF_TINY

# representative queries per family; s1 is excluded (its BNLJ against a
# ~5-row broadcast query set is the intended plan)
GUARDED = [
    "g1_match_label",
    "g3_two_hop",
    "g5_create_rel",
    "x6_range_count",
    "s4_knn_ivf",
    "d2_ngram_jaccard",
]


def _plan(spark, name):
    df = E.queries()[name](spark, SF_TINY)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", GUARDED)
def test_no_quadratic_joins(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_pricing_summary_scan_pruned(spark):
    """x1 aggregates 4 of lineitem's 16 columns — the parquet scan must
    read only those (column pruning reached the reader)."""
    plan = _plan(spark, "x1_pricing_summary")
    # ReadSchema strings get truncated; the scan's output column list is
    # the reliable pruning witness
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    cols = [c.split("#")[0] for c in m.group(1).split(",") if c]
    assert set(cols) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_linestatus",
    }, cols


def test_filter_pushed_to_scan(spark):
    """x6 filters event_type at the parquet reader, not post-scan only."""
    plan = _plan(spark, "x6_range_count")
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(event_type,", plan), plan
