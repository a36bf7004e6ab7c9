"""Pattern lowering: source AST → flat instruction stream.

Mirrors the reference's normalization semantics (``graphDB/lib/instr.ml:24-97``):
a linear pattern ``(a:A)-[:r]->(b:B)-[:s]->(c:C)`` flattens to interleaved
node/relation instructions; a ``VarRefPattern`` node emits no node
instruction (the variable must already be bound).  The interleaving rule
(instr.ml:56-77): the relation instruction for a hop is placed *after* the
next hop's node instruction when that hop declares a node, otherwise
immediately.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Union

from . import ast as A


class Action(Enum):
    CREATE = "create"
    MATCH = "match"


@dataclass(frozen=True)
class IActOnNode:
    action: Action
    var: str
    label: str


@dataclass(frozen=True)
class IActOnRel:
    action: Action
    src_var: str
    rel: str
    tgt_var: str
    star: bool = False  # -[:r*]-> variable-length match (extension)
    star_min: int = 1
    star_max: int | None = None
    undirected: bool = False


@dataclass(frozen=True)
class IMergeNode:
    """Constant-keyed node upsert (extension): match nodes of ``label``
    whose ``props`` attributes equal the constants, else create-and-set
    one per binding row."""

    var: str
    label: str
    props: tuple  # tuple[tuple[str, A.Const], ...]


@dataclass(frozen=True)
class IDeleteNode:
    var: str


@dataclass(frozen=True)
class IDeleteRel:
    src_var: str
    rel: str
    tgt_var: str


@dataclass(frozen=True)
class IReturn:
    vars: tuple
    distinct: bool = False  # extension: dedup the projection


@dataclass(frozen=True)
class IReturnProj:
    """Projection with attribute items (extension): ``return p, p.nom``.
    items = ((var, field-or-None), ...); attribute items output a
    ``{var}_{field}`` column."""

    items: tuple
    distinct: bool = False


@dataclass(frozen=True)
class ISetOp:
    """Branch separator (extension): combine the finished branch's
    result with the next branch's via union/intersect/except (SQL
    DISTINCT semantics, matched by variable name)."""

    op: str


@dataclass(frozen=True)
class IOrderLimit:
    """Deterministic top-N over the binding table (extension): order by
    the variable's id (field None) or attribute, remaining binding
    columns as tie-breaks, keep ``n`` rows."""

    var: str
    field: str | None
    ascending: bool
    n: int


@dataclass(frozen=True)
class IReturnAgg:
    """Grouped aggregation over the binding table (extension): group by
    ``keys``, one output column per AggItem named ``fn_var[_field]``."""

    keys: tuple  # tuple[str, ...]
    aggs: tuple  # tuple[A.AggItem, ...]


@dataclass(frozen=True)
class IWhere:
    expr: A.Expr


@dataclass(frozen=True)
class ISet:
    var: str
    field: str
    expr: A.Expr


@dataclass(frozen=True)
class IOptRel:
    """Optional edge match (extension): ``new_var`` (one of src/tgt) is
    newly bound — per matching edge where one exists, NULL otherwise;
    existing binding rows are always kept (left outer join)."""

    src_var: str
    rel: str
    tgt_var: str
    new_var: str
    new_label: str


@dataclass(frozen=True)
class INotExistsRel:
    """Anti edge match (extension): keep binding rows with NO ``rel``
    edge matching the pattern.  A ``None`` var on a side means the side
    is anonymous/scoped — constrained only by its label."""

    src_var: str | None
    rel: str
    tgt_var: str | None
    src_label: str | None = None
    tgt_label: str | None = None


Instruction = Union[
    IActOnNode,
    IActOnRel,
    IOptRel,
    INotExistsRel,
    IDeleteNode,
    IDeleteRel,
    IReturn,
    IReturnAgg,
    IOrderLimit,
    ISetOp,
    IWhere,
    ISet,
]


@dataclass
class NormProg:
    types: A.TypeGraph
    instructions: list  # list[Instruction]


def _normalize_node_pattern(act: Action, np: A.NodePattern):
    if isinstance(np, A.DeclPattern):
        return np.var, [IActOnNode(act, np.var, np.label)]
    return np.var, []


def _normalize_pattern(act: Action, pat: A.Pattern):
    if isinstance(pat, A.SimpPattern):
        return _normalize_node_pattern(act, pat.node)
    # CompPattern(node, rel, rest)
    v1, ins1 = _normalize_node_pattern(act, pat.node)
    v2, ins2 = _normalize_pattern(act, pat.rest)
    rel_ins = IActOnRel(
        act, v1, pat.rel, v2,
        getattr(pat, 'star', False),
        getattr(pat, 'star_min', 1),
        getattr(pat, 'star_max', None),
        getattr(pat, 'undirected', False),
    )
    if ins2:
        first, rest = ins2[0], ins2[1:]
        if isinstance(first, IActOnNode):
            # declare the next node first, then the relation between them
            return v1, ins1 + [first, rel_ins] + rest
        return v1, ins1 + [rel_ins] + ins2
    return v1, ins1 + [rel_ins]


def _normalize_clause(clause: A.Clause) -> list:
    if isinstance(clause, A.CreateClause):
        return [i for p in clause.patterns for i in _normalize_pattern(Action.CREATE, p)[1]]
    if isinstance(clause, A.MatchClause):
        return [i for p in clause.patterns for i in _normalize_pattern(Action.MATCH, p)[1]]
    if isinstance(clause, A.DeleteClause):
        dp = clause.pattern
        if isinstance(dp, A.DeleteNodes):
            return [IDeleteNode(v) for v in dp.vars]
        return [IDeleteRel(s, r, t) for (s, r, t) in dp.rels]
    if isinstance(clause, A.SetClause):
        return [ISet(v, f, e) for (v, f, e) in clause.assignments]
    if isinstance(clause, A.OptionalMatchClause):
        # parser guarantees one DeclPattern (the new side) + one VarRef
        if isinstance(clause.tgt, A.DeclPattern):
            new = clause.tgt
            return [IOptRel(clause.src.var, clause.rel, new.var, new.var, new.label)]
        new = clause.src
        return [IOptRel(new.var, clause.rel, clause.tgt.var, new.var, new.label)]
    if isinstance(clause, A.MergeClause):
        return [IMergeNode(clause.var, clause.label, clause.props)]
    if isinstance(clause, A.NotExistsClause):
        def side(p):
            if isinstance(p, A.AnonPattern):
                return None, p.label
            if isinstance(p, A.DeclPattern):
                # scoped existential var: the label constrains, the name
                # is not bound outside
                return None, p.label
            return p.var, None
        sv, sl = side(clause.src)
        tv, tl = side(clause.tgt)
        return [INotExistsRel(sv, clause.rel, tv, sl, tl)]
    if isinstance(clause, A.WhereClause):
        return [IWhere(clause.expr)]
    if isinstance(clause, A.ReturnClause):
        return [IReturn(clause.vars, clause.distinct)]
    if isinstance(clause, A.ReturnProjClause):
        return [IReturnProj(clause.items, clause.distinct)]
    if isinstance(clause, A.ReturnAggClause):
        return [IReturnAgg(clause.keys, clause.aggs)]
    if isinstance(clause, A.OrderLimitClause):
        return [IOrderLimit(clause.var, clause.field, clause.ascending, clause.n)]
    if isinstance(clause, A.SetOpClause):
        return [ISetOp(clause.op)]
    raise TypeError(f"unknown clause {clause!r}")


def normalize(prog: A.Prog) -> NormProg:
    instrs = [i for c in prog.query.clauses for i in _normalize_clause(c)]
    return NormProg(prog.types, instrs)
