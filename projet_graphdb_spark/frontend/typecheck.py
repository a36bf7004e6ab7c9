"""Static typechecker for normalized miniGQL programs.

Checks the same error classes as the reference (``graphDB/lib/typing.ml``):

* schema sanity (typing.ml:57-98): duplicate node-type declarations,
  duplicate relation-type triples, relation endpoints must be declared;
* per-instruction checks threading an environment of (var → label)
  bindings (typing.ml:201-268): undeclared node/relation types, unbound
  variables, duplicate return variables, `where` must be boolean, `set`
  value type must match the declared attribute type.

Variable rebinding is legal and *shadows*: bindings are kept as a list
with the most recent first (typing.ml:20-23).  The environment after
checking also records, for each instruction, the binding list — the
executor uses the static label of each variable to pick the node
DataFrame to join against.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import ast as A
from .normalize import (
    Action,
    IActOnNode,
    IActOnRel,
    IDeleteNode,
    IDeleteRel,
    IMergeNode,
    INotExistsRel,
    IOptRel,
    IOrderLimit,
    IReturn,
    IReturnAgg,
    IReturnProj,
    ISet,
    ISetOp,
    IWhere,
    NormProg,
)


class TypeCheckError(Exception):
    def __init__(self, errors):
        if isinstance(errors, str):
            errors = [errors]
        super().__init__("; ".join(errors))
        self.errors = list(errors)


@dataclass
class Env:
    """(var → label) bindings, most-recent-first (prepend on bind)."""

    types: A.TypeGraph
    bindings: list = field(default_factory=list)  # list[tuple[str, str]]

    def bind(self, var: str, label: str) -> "Env":
        return Env(self.types, [(var, label)] + self.bindings)

    def lookup(self, var: str):
        for v, lb in self.bindings:
            if v == var:
                return lb
        return None

    def is_bound(self, var: str) -> bool:
        """True if bound at all — including aggregate outputs, which are
        bound with label None and so are invisible to ``lookup``."""
        return any(v == var for v, _ in self.bindings)

    def remove_first(self, var: str) -> "Env":
        out, removed = [], False
        for v, lb in self.bindings:
            if v == var and not removed:
                removed = True
                continue
            out.append((v, lb))
        return Env(self.types, out)

    def keep_only(self, names) -> "Env":
        keep = set(names)
        return Env(self.types, [(v, lb) for v, lb in self.bindings if v in keep])


def check_graph_types(tg: A.TypeGraph) -> list:
    """Schema sanity errors (typing.ml:57-98). Returns error list (may be empty)."""
    errors = []
    labels = tg.node_labels()
    if len(labels) != len(set(labels)):
        errors.append("Multiple declarations of the same node type")
    for r in tg.rels:
        if r.src not in labels:
            errors.append(f"Reference to undeclared node type '{r.src}' in relation '{r.rel}'")
        if r.tgt not in labels:
            errors.append(f"Reference to undeclared node type '{r.tgt}' in relation '{r.rel}'")
    triples = [(r.src, r.rel, r.tgt) for r in tg.rels]
    if len(triples) != len(set(triples)):
        errors.append("Multiple declarations of the same relation type")
    return errors


def tp_expr(env: Env, e: A.Expr) -> A.AttribType:
    """Static type of an expression (typing.ml:128-163)."""
    if isinstance(e, A.Const):
        return e.value.type
    if isinstance(e, A.AttribAcc):
        label = env.lookup(e.var)
        if label is None:
            raise TypeCheckError(f"Variable '{e.var}' not bound")
        if not isinstance(label, str):
            raise TypeCheckError(
                f"'{e.var}' is an aggregate output — it has no attributes"
            )
        attrs = env.types.attrs_of(label)
        if e.field not in attrs:
            raise TypeCheckError(f"Attribute '{e.field}' not declared for node type '{label}'")
        return attrs[e.field]
    if isinstance(e, A.BareVar):
        # extension: a node variable is its id (int); an aggregate output
        # is its value
        if not env.is_bound(e.var):
            raise TypeCheckError(f"Variable '{e.var}' not bound")
        label = env.lookup(e.var)
        if isinstance(label, tuple):  # ("agg", AttribType | None)
            tp = label[1]
            if tp is None:
                raise TypeCheckError(
                    f"'{e.var}' (avg output) is not usable in expressions"
                )
            return tp
        return A.AttribType.INT  # node id
    if isinstance(e, A.BinOp):
        t1 = tp_expr(env, e.left)
        t2 = tp_expr(env, e.right)
        if e.op.is_arith:
            if t1 == A.AttribType.INT and t2 == A.AttribType.INT:
                return A.AttribType.INT
            raise TypeCheckError("Arithmetic operation requires int types")
        if e.op.is_compar:
            if t1 == t2:
                return A.AttribType.BOOL
            raise TypeCheckError("Comparison requires same types")
        if t1 == A.AttribType.BOOL and t2 == A.AttribType.BOOL:
            return A.AttribType.BOOL
        raise TypeCheckError("Logic operation requires bool types")
    raise TypeError(f"unknown expression {e!r}")


def _rel_declared(tg: A.TypeGraph, src: str, rel: str, tgt: str) -> bool:
    return any(r.src == src and r.rel == rel and r.tgt == tgt for r in tg.rels)


def _star_reachable(
    tg: A.TypeGraph,
    src: str,
    rel: str,
    tgt: str,
    lo: int,
    hi: int | None,
    undirected: bool,
) -> bool:
    """Endpoint-label check on the CLOSURE of ``rel``: is there a path
    ``src → … → tgt`` of some length k with lo ≤ k (≤ hi) in the schema's
    label graph restricted to ``rel`` declarations?  Mixed-label chains
    (e.g. Customer -[:in*2]-> Region over Customer→Nation→Region) are
    legal; the executor's closure + label semi-joins implement exactly
    these semantics, so the typechecker should accept what they can
    satisfy (natural Cypher / [FGG+18] semantics — the round-4 verdict's
    g11 relaxation).  BFS over (label, length) states; unbounded ``hi``
    is capped at lo + |labels| — any longer witness can be pumped down
    below the cap through the cycle that made it long.
    """
    step: dict[str, set[str]] = {}
    for r in tg.rels:
        if r.rel != rel:
            continue
        step.setdefault(r.src, set()).add(r.tgt)
        if undirected:
            step.setdefault(r.tgt, set()).add(r.src)
    cap = hi if hi is not None else lo + len(tg.node_labels())
    frontier = {src}
    for k in range(1, cap + 1):
        frontier = {n for lbl in frontier for n in step.get(lbl, ())}
        if not frontier:
            return False
        if k >= lo and tgt in frontier:
            return True
    return False


def tc_instr(instr, env: Env) -> Env:
    tg = env.types
    if isinstance(instr, IActOnNode):
        if instr.label not in tg.node_labels():
            raise TypeCheckError(f"Node type '{instr.label}' is not declared")
        return env.bind(instr.var, instr.label)
    if isinstance(instr, IMergeNode):
        if instr.label not in tg.node_labels():
            raise TypeCheckError(f"Node type '{instr.label}' is not declared")
        declared = tg.attrs_of(instr.label)
        errors = []
        for f, e in instr.props:
            if f not in declared:
                errors.append(
                    f"Attribute '{f}' not declared for node type '{instr.label}'"
                )
            elif not isinstance(e, A.Const):
                errors.append(f"Merge property '{f}' must be a literal constant")
            elif e.value.type != declared[f]:
                errors.append(
                    f"Merge property '{f}' has type {e.value.type.name.lower()}, "
                    f"declared {declared[f].name.lower()}"
                )
        if len({f for f, _ in instr.props}) != len(instr.props):
            errors.append("Merge contains duplicate property keys")
        if errors:
            raise TypeCheckError(errors)
        return env.bind(instr.var, instr.label)
    if isinstance(instr, (IActOnRel, IDeleteRel)):
        src_var = instr.src_var
        tgt_var = instr.tgt_var
        lbl1 = env.lookup(src_var)
        if lbl1 is None:
            raise TypeCheckError(f"Variable '{src_var}' is not bound")
        lbl2 = env.lookup(tgt_var)
        if lbl2 is None:
            raise TypeCheckError(f"Variable '{tgt_var}' is not bound")
        undirected = getattr(instr, "undirected", False)
        if undirected and getattr(instr, "action", None) == Action.CREATE:
            raise TypeCheckError("Undirected '-[:r]-' is only legal in match")
        if getattr(instr, "star", False):
            # variable-length extension: only a match; endpoint labels are
            # checked on the CLOSURE (mixed-label chains compose as long as
            # the schema's label graph carries a lo..hi-length rel-path)
            if instr.action != Action.MATCH:
                raise TypeCheckError("Variable-length '-[:r*]->' is only legal in match")
            lo = getattr(instr, "star_min", 1)
            hi = getattr(instr, "star_max", None)
            if lo < 1 or (hi is not None and hi < lo):
                raise TypeCheckError(
                    f"Variable-length bounds *{lo}..{hi} are invalid (need 1 <= lo <= hi)"
                )
            if not _star_reachable(tg, lbl1, instr.rel, lbl2, lo, hi, undirected):
                rng = f"*{lo}..{hi}" if hi is not None else f"*{lo}.."
                raise TypeCheckError(
                    f"Variable-length '-[:{instr.rel}{rng}]->' cannot reach "
                    f"'{lbl2}' from '{lbl1}' in the declared type graph"
                )
            return env
        declared = _rel_declared(tg, lbl1, instr.rel, lbl2) or (
            # undirected: the declaration may run in either direction
            undirected and _rel_declared(tg, lbl2, instr.rel, lbl1)
        )
        if not declared:
            raise TypeCheckError(
                f"Relation '{instr.rel}' from '{lbl1}' to '{lbl2}' is not declared"
            )
        return env
    if isinstance(instr, IOptRel):
        bound = instr.tgt_var if instr.new_var == instr.src_var else instr.src_var
        bound_lbl = env.lookup(bound)
        if bound_lbl is None:
            raise TypeCheckError(f"Variable '{bound}' is not bound")
        if instr.new_label not in tg.node_labels():
            raise TypeCheckError(f"Node type '{instr.new_label}' is not declared")
        src_lbl = instr.new_label if instr.new_var == instr.src_var else bound_lbl
        tgt_lbl = instr.new_label if instr.new_var == instr.tgt_var else bound_lbl
        if not _rel_declared(tg, src_lbl, instr.rel, tgt_lbl):
            raise TypeCheckError(
                f"Relation '{instr.rel}' from '{src_lbl}' to '{tgt_lbl}' is not declared"
            )
        return env.bind(instr.new_var, instr.new_label)
    if isinstance(instr, INotExistsRel):
        def side_label(var, label, what):
            if var is not None:
                lbl = env.lookup(var)
                if lbl is None:
                    raise TypeCheckError(f"Variable '{var}' is not bound")
                return lbl
            if label not in tg.node_labels():
                raise TypeCheckError(f"Node type '{label}' is not declared")
            return label
        src_lbl = side_label(instr.src_var, instr.src_label, "source")
        tgt_lbl = side_label(instr.tgt_var, instr.tgt_label, "target")
        if not _rel_declared(tg, src_lbl, instr.rel, tgt_lbl):
            raise TypeCheckError(
                f"Relation '{instr.rel}' from '{src_lbl}' to '{tgt_lbl}' is not declared"
            )
        return env
    if isinstance(instr, IDeleteNode):
        lbl = env.lookup(instr.var)
        if lbl is None and not env.is_bound(instr.var):
            raise TypeCheckError(f"Variable '{instr.var}' is not bound")
        if not isinstance(lbl, str):
            raise TypeCheckError(f"'{instr.var}' is not a node variable")
        return env.remove_first(instr.var)
    if isinstance(instr, IReturn):
        unbound = [v for v in instr.vars if not env.is_bound(v)]
        if unbound:
            raise TypeCheckError([f"Variable '{v}' is not bound" for v in unbound])
        if len(instr.vars) != len(set(instr.vars)):
            raise TypeCheckError("Return contains duplicate variables")
        return env.keep_only(instr.vars)
    if isinstance(instr, IOrderLimit):
        if not env.is_bound(instr.var):
            raise TypeCheckError(f"Variable '{instr.var}' is not bound")
        lbl = env.lookup(instr.var)
        if instr.field is not None:
            if not isinstance(lbl, str):
                raise TypeCheckError(
                    f"'{instr.var}' is an aggregate output — order by it directly"
                )
            if instr.field not in tg.attrs_of(lbl):
                raise TypeCheckError(
                    f"Attribute '{instr.field}' not declared for node type '{lbl}'"
                )
        return env
    if isinstance(instr, IReturnProj):
        errors = []
        out_names = []
        for v, f in instr.items:
            if f is None:
                if not env.is_bound(v):
                    errors.append(f"Variable '{v}' is not bound")
                out_names.append(v)
                continue
            lbl = env.lookup(v)
            if lbl is None:
                errors.append(f"Variable '{v}' is not bound")
                continue
            if not isinstance(lbl, str):
                errors.append(f"'{v}' is not a node variable")
                continue
            if f not in tg.attrs_of(lbl):
                errors.append(f"Attribute '{f}' not declared for node type '{lbl}'")
                continue
            out_names.append(f"{v}_{f}")
        if len(out_names) != len(set(out_names)):
            errors.append("Return contains duplicate output columns")
        if errors:
            raise TypeCheckError(errors)
        out = env.keep_only([v for v, f in instr.items if f is None])
        for v, f in instr.items:
            if f is not None:
                # attribute output: bound with its declared type marker,
                # like aggregate outputs — not a node variable
                out = out.bind(f"{v}_{f}", ("agg", tg.attrs_of(env.lookup(v))[f]))
        return out
    if isinstance(instr, IReturnAgg):
        errors = []
        for v in instr.keys:
            if env.lookup(v) is None:
                errors.append(f"Variable '{v}' is not bound")
        if len(instr.keys) != len(set(instr.keys)):
            errors.append("Return contains duplicate variables")
        for it in instr.aggs:
            lbl = env.lookup(it.var)
            if lbl is None:
                errors.append(f"Variable '{it.var}' is not bound")
                continue
            if it.field is not None:
                attrs = tg.attrs_of(lbl)
                if it.field not in attrs:
                    errors.append(
                        f"Attribute '{it.field}' not declared for node type '{lbl}'"
                    )
                elif it.fn in ("sum", "min", "max", "avg") and attrs[it.field] != A.AttribType.INT:
                    errors.append(f"Aggregate '{it.fn}' requires an int attribute")
        if errors:
            raise TypeCheckError(errors)
        out = env.keep_only(instr.keys)
        for it in instr.aggs:
            name = f"{it.fn}_{it.var}" + (f"_{it.field}" if it.field else "")
            # aggregate output: bound with a ("agg", type) marker, not a
            # node label — count/sum/min/max are int, avg is double
            # (None = unusable in the int/bool/string expression language)
            tp = A.AttribType.INT if it.fn != "avg" else None
            out = out.bind(name, ("agg", tp))
        return out
    if isinstance(instr, IWhere):
        if tp_expr(env, instr.expr) != A.AttribType.BOOL:
            raise TypeCheckError("Expression does not have expected type bool")
        return env
    if isinstance(instr, ISet):
        label = env.lookup(instr.var)
        if label is None:
            raise TypeCheckError(f"Variable '{instr.var}' is not bound")
        if not isinstance(label, str):
            raise TypeCheckError(f"'{instr.var}' is not a node variable")
        attrs = tg.attrs_of(label)
        if instr.field not in attrs:
            raise TypeCheckError(
                f"Attribute '{instr.field}' not declared for node type '{label}'"
            )
        if tp_expr(env, instr.expr) != attrs[instr.field]:
            raise TypeCheckError(
                f"Expression does not have expected type {attrs[instr.field]!r}"
            )
        return env
    raise TypeError(f"unknown instruction {instr!r}")


def typecheck(np: NormProg) -> NormProg:
    """Validate schema + instructions; returns ``np`` unchanged on success.

    Set-op branches (extension) each typecheck from a fresh environment;
    every branch's final binding must expose the same variable names."""
    schema_errors = check_graph_types(np.types)
    if schema_errors:
        raise TypeCheckError(schema_errors)
    env = Env(np.types)
    branch_names = None
    for instr in np.instructions:
        if isinstance(instr, ISetOp):
            names = frozenset(v for v, _ in env.bindings)
            if not names:
                raise TypeCheckError(f"'{instr.op}' branch returns no variables")
            if branch_names is not None and names != branch_names:
                raise TypeCheckError(
                    f"set-op branches return different variables: "
                    f"{sorted(branch_names)} vs {sorted(names)}"
                )
            branch_names = names
            env = Env(np.types)
            continue
        env = tc_instr(instr, env)
    if branch_names is not None:
        names = frozenset(v for v, _ in env.bindings)
        if names != branch_names:
            raise TypeCheckError(
                f"set-op branches return different variables: "
                f"{sorted(branch_names)} vs {sorted(names)}"
            )
    return np


__all__ = [
    "Action",
    "Env",
    "TypeCheckError",
    "check_graph_types",
    "tc_instr",
    "tp_expr",
    "typecheck",
]
