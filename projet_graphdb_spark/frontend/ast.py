"""Source AST for miniGQL — the simplified Cypher/GQL dialect of the reference.

Mirrors the *shape* of the reference's source language
(``graphDB/lib/lang.ml:1-85``): values, expressions, node/relation
patterns, clauses, and the type graph.  Fresh Python dataclasses —
nothing is translated from OCaml; only the language being parsed is the
same.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Union

# ---------------------------------------------------------------------------
# Attribute types (lang.ml:75 — BoolT | IntT | StringT)
# ---------------------------------------------------------------------------


class AttribType(Enum):
    BOOL = "bool"
    INT = "int"
    STRING = "string"

    def __repr__(self) -> str:  # compact in error messages
        return self.value


# ---------------------------------------------------------------------------
# Values (lang.ml:29-33 — BoolV | IntV | StringV)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Value:
    """A typed constant.  ``type`` is the static type of ``python_value``."""

    type: AttribType
    python_value: Union[bool, int, str]

    @staticmethod
    def bool_(b: bool) -> "Value":
        return Value(AttribType.BOOL, b)

    @staticmethod
    def int_(i: int) -> "Value":
        return Value(AttribType.INT, i)

    @staticmethod
    def string(s: str) -> "Value":
        return Value(AttribType.STRING, s)


# ---------------------------------------------------------------------------
# Expressions (lang.ml:40-44 — Const | AttribAcc | BinOp)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Const:
    value: Value


@dataclass(frozen=True)
class AttribAcc:
    var: str
    field: str


@dataclass(frozen=True)
class BareVar:
    """A bare variable in an expression (extension): a node variable
    evaluates to its id (int); an aggregate output evaluates to its
    value — which is what makes ``where count_o >= 5`` a HAVING."""

    var: str


class BinOpKind(Enum):
    # arithmetic (int × int → int)
    ADD = "+"
    SUB = "-"
    MUL = "*"
    DIV = "/"
    MOD = "mod"
    # comparison (same-type × same-type → bool; order ops int-only)
    EQ = "="
    NE = "<>"
    GE = ">="
    GT = ">"
    LE = "<="
    LT = "<"
    # logic (bool × bool → bool, non-short-circuit)
    AND = "and"
    OR = "or"

    @property
    def is_arith(self) -> bool:
        return self in (BinOpKind.ADD, BinOpKind.SUB, BinOpKind.MUL, BinOpKind.DIV, BinOpKind.MOD)

    @property
    def is_compar(self) -> bool:
        return self in (
            BinOpKind.EQ,
            BinOpKind.NE,
            BinOpKind.GE,
            BinOpKind.GT,
            BinOpKind.LE,
            BinOpKind.LT,
        )

    @property
    def is_logic(self) -> bool:
        return self in (BinOpKind.AND, BinOpKind.OR)


@dataclass(frozen=True)
class BinOp:
    op: BinOpKind
    left: "Expr"
    right: "Expr"


Expr = Union[Const, AttribAcc, BareVar, BinOp]


# ---------------------------------------------------------------------------
# Patterns (lang.ml:47-58)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DeclPattern:
    """``(v:Label)`` — declares a (possibly re-bound) node variable."""

    var: str
    label: str


@dataclass(frozen=True)
class VarRefPattern:
    """``(v)`` — references an already-bound node variable."""

    var: str


@dataclass(frozen=True)
class AnonPattern:
    """``(:Label)`` — anonymous labeled node (extension; legal only
    inside ``where not exists``, where the node is purely existential)."""

    label: str


NodePattern = Union[DeclPattern, VarRefPattern]


@dataclass(frozen=True)
class SimpPattern:
    node: NodePattern


@dataclass(frozen=True)
class CompPattern:
    """``node -[:rel]-> rest`` — a linear chain.

    ``star=True`` marks the variable-length extension ``-[:rel*]->``
    (one or more hops; absent from the reference, SURVEY §2.2 — only
    legal in ``match``, and only over a relation type declared between
    identical labels so hops compose)."""

    node: NodePattern
    rel: str
    rest: "Pattern"
    star: bool = False
    # hop bounds for ``-[:rel*lo..hi]->`` (only meaningful when star);
    # ``star_max=None`` means unbounded (closure)
    star_min: int = 1
    star_max: int | None = None
    # ``-[:rel]-`` (no arrowhead): match the edge in either direction
    # (extension; the reference has only directed edges, SURVEY §2.2)
    undirected: bool = False


Pattern = Union[SimpPattern, CompPattern]


# ---------------------------------------------------------------------------
# Clauses (lang.ml:62-69)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CreateClause:
    patterns: tuple  # tuple[Pattern, ...]


@dataclass(frozen=True)
class MatchClause:
    patterns: tuple  # tuple[Pattern, ...]


@dataclass(frozen=True)
class DeleteNodes:
    vars: tuple  # tuple[str, ...]


@dataclass(frozen=True)
class DeleteRels:
    rels: tuple  # tuple[tuple[str, str, str], ...]  (src_var, rel_label, tgt_var)


@dataclass(frozen=True)
class DeleteClause:
    pattern: Union[DeleteNodes, DeleteRels]


@dataclass(frozen=True)
class ReturnClause:
    vars: tuple  # tuple[str, ...]
    distinct: bool = False  # `return distinct ...` (extension)


@dataclass(frozen=True)
class ReturnProjClause:
    """``return p, p.nom, e.dept`` (extension): projection of node
    variables AND their attributes.  Attribute items produce a column
    named ``{var}_{field}``.  ``distinct`` dedups the projection."""

    items: tuple  # tuple[tuple[str, str | None], ...]  (var, field-or-None)
    distinct: bool = False


@dataclass(frozen=True)
class OrderLimitClause:
    """``order by <v | v.f> [asc|desc] limit N`` (extension): a
    deterministic top-N over the binding table — ties broken by the
    remaining bound columns, so the result is stable.  ``limit`` is
    mandatory: an unbounded global sort is not a 100 TB operation."""

    var: str
    field: str | None
    ascending: bool
    n: int


@dataclass(frozen=True)
class AggItem:
    """``count(v)`` / ``sum(v.f)`` / ``min`` / ``max`` / ``avg`` inside a
    return list (extension).  ``field`` is None only for count."""

    fn: str
    var: str
    field: str | None = None


@dataclass(frozen=True)
class ReturnAggClause:
    """``return k1, ..., count(v), sum(v.f), ...`` (extension): group the
    binding table by the plain variables and aggregate — SQL GROUP BY
    semantics (count skips NULLs, so ``count(o)`` after an optional
    match counts actual matches)."""

    keys: tuple  # tuple[str, ...] group-by variables, in order
    aggs: tuple  # tuple[AggItem, ...]


@dataclass(frozen=True)
class WhereClause:
    expr: Expr


@dataclass(frozen=True)
class SetClause:
    assignments: tuple  # tuple[tuple[str, str, Expr], ...]  (var, field, expr)


@dataclass(frozen=True)
class SetOpClause:
    """``union`` / ``intersect`` / ``except`` between query branches
    (extension): the following clauses form a new branch starting from a
    fresh seed binding (over the same, possibly mutated, graph); the
    program's result is the left-associative set combination of the
    branches' result tables, SQL DISTINCT semantics, matched by
    variable name.  Every branch must return the same variables."""

    op: str  # "union" | "intersect" | "except"


@dataclass(frozen=True)
class OptionalMatchClause:
    """``optional match (a) -[:r]-> (b:L)`` (extension, SURVEY §2.2):
    keeps every existing binding row; where the edge exists the new
    variable binds per matching edge, otherwise it binds NULL — the
    left-outer-join analogue of ``match``.  Exactly one side is a bound
    ``(v)`` reference and the other a new ``(v:L)`` declaration."""

    src: NodePattern
    rel: str
    tgt: NodePattern


@dataclass(frozen=True)
class MergeClause:
    """``merge (v: L {f = const, ...})`` (extension): the Cypher-style
    upsert.  If nodes of label ``L`` whose listed attributes equal the
    constant values exist, bind them exactly like ``match`` (cross
    product with the current table); otherwise create one node per
    binding row with those attributes set, like ``create`` + ``set``.
    Properties must be literal constants — merge-by-key is the
    dimension-upsert primitive, not a computed join."""

    var: str
    label: str
    props: tuple  # tuple[tuple[str, Expr(Const)], ...]


@dataclass(frozen=True)
class NotExistsClause:
    """``where not exists (a) -[:r]-> (:L)`` (extension): keep binding
    rows with NO matching edge.  Each side is a bound ``(v)`` reference
    or an anonymous/scoped labeled node; at least one side is bound."""

    src: Union[DeclPattern, VarRefPattern, AnonPattern]
    rel: str
    tgt: Union[DeclPattern, VarRefPattern, AnonPattern]


Clause = Union[
    CreateClause,
    MatchClause,
    MergeClause,
    OptionalMatchClause,
    DeleteClause,
    ReturnClause,
    ReturnProjClause,
    ReturnAggClause,
    OrderLimitClause,
    WhereClause,
    NotExistsClause,
    SetClause,
    SetOpClause,
]


# ---------------------------------------------------------------------------
# Type graph / program (lang.ml:75-83, parser.mly:30-35)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NodeTypeDecl:
    label: str
    attrs: tuple  # tuple[tuple[str, AttribType], ...]  declaration order preserved


@dataclass(frozen=True)
class RelTypeDecl:
    src: str
    rel: str
    tgt: str


@dataclass
class TypeGraph:
    """The schema is itself a graph (lang.ml:81): node-type decls + rel-type decls."""

    nodes: list = field(default_factory=list)  # list[NodeTypeDecl]
    rels: list = field(default_factory=list)  # list[RelTypeDecl]

    def node_labels(self) -> list:
        return [n.label for n in self.nodes]

    def attrs_of(self, label: str) -> dict:
        for n in self.nodes:
            if n.label == label:
                return dict(n.attrs)
        raise KeyError(f"node type {label!r} not declared")


@dataclass
class Query:
    clauses: list  # list[Clause]


@dataclass
class Prog:
    types: TypeGraph
    query: Query
