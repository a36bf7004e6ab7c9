"""Literal-prefix folding: constant-fold the DDL prefix of a program.

A miniGQL program typically starts with a block of ``create``/``set``
instructions whose binding table provably has exactly ONE row (the seed
row, sem.ml:25, preserved by create/set).  Every such instruction is a
*constant*: the allocated ids, the created edges and the attribute values
are all known on the driver without touching an executor.  Running them
as per-instruction DataFrame mutations would serialize dozens of tiny
union/shuffle jobs — the classic anti-pattern of driver-side loops over
collect-sized data.

This pass simulates that prefix eagerly into plain Python dicts (the same
move Catalyst makes with ConstantFolding: evaluate at plan time what
cannot depend on data), then materializes the resulting graph as ONE
DataFrame per node label + one edge DataFrame.  The remaining suffix
(match/where/return — the data-dependent part) executes as DataFrame
transformations.

At 100 TB scale this pass is irrelevant (bulk graphs arrive via
``sources.parquet_graph``, not literal creates) — it exists so that
script-style programs pay one job, not O(instructions) jobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..frontend import ast as A
from ..frontend.normalize import (
    Action,
    IActOnNode,
    IActOnRel,
    IDeleteNode,
    IDeleteRel,
    ISet,
)


@dataclass
class FoldResult:
    """Driver-side graph + binding resulting from the folded prefix."""

    # label -> {id -> {field -> value}}  (insertion order = creation order)
    nodes: dict = field(default_factory=dict)
    edges: list = field(default_factory=list)  # ordered unique (src, rel, dst)
    env: list = field(default_factory=list)  # [(var, id, label)] most-recent-first
    next_id: int = 0
    consumed: int = 0  # instructions folded


def _eval_driver(e: A.Expr, env: list, nodes: dict):
    """Evaluate an expression against the folded graph (single-row binding).

    NULL-propagating like the Spark path: a never-``set`` attribute reads
    as None and poisons the result (documented divergence from the
    reference's runtime error, sem.ml:155-157).
    """
    if isinstance(e, A.Const):
        return e.value.python_value
    if isinstance(e, A.AttribAcc):
        for v, nid, label in env:
            if v == e.var:
                return nodes[label][nid].get(e.field)
        raise KeyError(f"Variable '{e.var}' not in table")
    if isinstance(e, A.BinOp):
        l = _eval_driver(e.left, env, nodes)
        r = _eval_driver(e.right, env, nodes)
        if l is None or r is None:
            return None
        k = e.op
        if k == A.BinOpKind.ADD:
            return l + r
        if k == A.BinOpKind.SUB:
            return l - r
        if k == A.BinOpKind.MUL:
            return l * r
        if k == A.BinOpKind.DIV:
            if r == 0:
                return None  # Spark div-by-zero semantics
            q = abs(l) // abs(r)
            return q if (l >= 0) == (r >= 0) else -q
        if k == A.BinOpKind.MOD:
            if r == 0:
                return None
            sign = 1 if (l >= 0) == (r >= 0) else -1
            return l - r * (abs(l) // abs(r)) * sign
        if k == A.BinOpKind.EQ:
            return l == r
        if k == A.BinOpKind.NE:
            return l != r
        if k == A.BinOpKind.GE:
            return l >= r
        if k == A.BinOpKind.GT:
            return l > r
        if k == A.BinOpKind.LE:
            return l <= r
        if k == A.BinOpKind.LT:
            return l < r
        if k == A.BinOpKind.AND:
            return l and r
        if k == A.BinOpKind.OR:
            return l or r
    raise TypeError(f"unknown expression {e!r}")


def fold_literal_prefix(types: A.TypeGraph, instructions: list) -> FoldResult:
    """Fold the longest driver-computable prefix of ``instructions``.

    Foldable while the binding table has exactly one row: create-node,
    create-rel, set, delete-node, delete-rel.  The first match / where /
    return (or any instruction invalidating the single-row guarantee)
    stops the fold.
    """
    res = FoldResult(nodes={d.label: {} for d in types.nodes})
    edge_set = set()
    for instr in instructions:
        if isinstance(instr, IActOnNode) and instr.action == Action.CREATE:
            nid = res.next_id
            res.next_id += 1
            res.nodes[instr.label][nid] = {}
            res.env.insert(0, (instr.var, nid, instr.label))
        elif isinstance(instr, IActOnRel) and instr.action == Action.CREATE:
            src = next(nid for v, nid, _ in res.env if v == instr.src_var)
            dst = next(nid for v, nid, _ in res.env if v == instr.tgt_var)
            triple = (src, instr.rel, dst)
            if triple not in edge_set:  # set semantics, graphstruct.ml:30-32
                edge_set.add(triple)
                res.edges.append(triple)
        elif isinstance(instr, ISet):
            val = _eval_driver(instr.expr, res.env, res.nodes)
            nid = next(nid for v, nid, _ in res.env if v == instr.var)
            label = next(lb for v, _, lb in res.env if v == instr.var)
            res.nodes[label][nid][instr.field] = val
        elif isinstance(instr, IDeleteNode):
            entries = [(v, nid, lb) for v, nid, lb in res.env if v == instr.var]
            if not entries:
                raise KeyError(f"Variable '{instr.var}' not in table")
            _, nid, label = entries[0]
            res.nodes[label].pop(nid, None)
            res.edges = [e for e in res.edges if e[0] != nid and e[2] != nid]
            edge_set = set(res.edges)
            res.env = [x for x in res.env if x[0] != instr.var]
        elif isinstance(instr, IDeleteRel):
            src = next(nid for v, nid, _ in res.env if v == instr.src_var)
            dst = next(nid for v, nid, _ in res.env if v == instr.tgt_var)
            triple = (src, instr.rel, dst)
            if triple in edge_set:
                edge_set.discard(triple)
                res.edges.remove(triple)
        else:
            break
        res.consumed += 1
    return res
