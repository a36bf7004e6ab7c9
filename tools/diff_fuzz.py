"""Differential fuzzing: random well-typed miniGQL programs run through
BOTH the Spark engine and an independent ~150-line pure-Python list
interpreter of the same semantics; binding table, node attributes and
edge set must agree exactly.

The model implements the REFERENCE semantics as this repo ships them
(SURVEY §2 with the documented sane-semantics divergences): multi-row
create advances the id counter by the row count, never-set attributes
read as NULL (Kleene three-valued logic in `where`), `set` evaluates
against the deterministic first row (binding-column order), delete
cascades incident edges and leaves dangling bindings.  Extension
operators are covered too: `optional match` (left-outer with a NULLable
new var), `where not exists` (anti-join, anonymous labelled sides),
`return distinct`, and union/intersect/except branch combination
(fresh seed per branch over the SAME mutated graph, SQL DISTINCT
semantics by variable name).

Variable REBINDING is covered (round-5 verdict item 5): `create`/`match`
may reuse a bound name; the model keeps a slot-per-binding environment
with most-recent-wins resolution (sem.ml:75-81 prepend-on-bind), so the
shadowed column's row multiplicity, the `test2.q` orphan-node quirk, and
delete's unbind-all-entries rule are all checked against the engine.
`/` and `mod` are covered with the reference's OCaml semantics
(truncation toward zero; mod takes the dividend's sign — NOT Python's
floor/divisor-sign rules).

The generator constrains programs to the deterministic envelope:
- node creates only while the table is provably single-row (multi-row
  creates assign ids in partition order — real ids, but which row gets
  which is not a semantic promise);
- `set` only while every preceding phase-B instruction is a non-empty
  label match (reference `set` List.hd-crashes on an empty table);
- `/`/`mod` divisors are nonzero literals (ANSI division-by-zero
  raising is pinned by tests/test_conformance.py already; dividends go
  negative via subtraction, exercising the sign rules).

Usage: python tools/diff_fuzz.py [n_programs] [seed]
"""

from __future__ import annotations

import os
import random
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import projet_graphdb_spark.frontend.ast as A
from projet_graphdb_spark.frontend import normalize, parse
from projet_graphdb_spark.frontend.normalize import (
    Action,
    IActOnNode,
    IActOnRel,
    IDeleteNode,
    IDeleteRel,
    INotExistsRel,
    IOptRel,
    IReturn,
    ISet,
    ISetOp,
    IWhere,
)
from projet_graphdb_spark.frontend.typecheck import TypeCheckError, typecheck

# ---------------------------------------------------------------------------
# program generator
# ---------------------------------------------------------------------------

INT_ATTRS = ["a", "b"]
STR_LIT = ["x", "y z", "w"]


def gen_program(rng: random.Random) -> str:
    labels = ["P", "Q", "R"][: rng.randint(1, 3)]
    attrs = {}
    lines = []
    for lb in labels:
        ats = [(nm, "int") for nm in rng.sample(INT_ATTRS, rng.randint(1, 2))]
        if rng.random() < 0.4:
            ats.append(("s", "string"))
        if rng.random() < 0.3:
            ats.append(("f", "bool"))
        attrs[lb] = ats
        lines.append(f"(:{lb} {{{', '.join(f'{n} {t}' for n, t in ats)}}})")
    rels = list(dict.fromkeys(
        (rng.choice(labels), rng.choice(["r", "s"]), rng.choice(labels))
        for _ in range(rng.randint(1, 3))
    ))
    for a, r, b in rels:
        lines.append(f"(:{a}) -[:{r}]-> (:{b})")

    bound: dict = {}  # var -> label
    names = iter("nopqkuvwmj")
    n_created: dict = {lb: 0 for lb in labels}

    def reachable(l1, rel_name, l2, lo, hi, undirected) -> bool:
        """Mirror of typecheck._star_reachable over the generated schema:
        BFS on the label graph restricted to ``rel_name``; unbounded hi
        capped at lo + |labels| (a longer witness pumps down)."""
        step: dict = {}
        for (a, r2, b2) in rels:
            if r2 != rel_name:
                continue
            step.setdefault(a, set()).add(b2)
            if undirected:
                step.setdefault(b2, set()).add(a)
        cap = hi if hi is not None else lo + len(labels)
        frontier = {l1}
        for k in range(1, cap + 1):
            frontier = {n for lbl in frontier for n in step.get(lbl, ())}
            if not frontier:
                return False
            if k >= lo and l2 in frontier:
                return True
        return False

    def int_expr(allow_attrs: bool) -> str:
        cands = [str(rng.randint(0, 9))]
        if allow_attrs:
            for v, lb in bound.items():
                for nm, tp in attrs[lb]:
                    if tp == "int":
                        cands.append(f"{v}.{nm}")
        e = rng.choice(cands)
        if rng.random() < 0.4:
            op = rng.choice(["+", "-", "*", "/", "mod"])
            if op in ("/", "mod"):
                # nonzero literal divisor: ANSI /0 raising is pinned by
                # conformance tests, not the fuzz target
                e = f"{e} {op} {rng.randint(1, 9)}"
            else:
                e = f"{e} {op} {rng.choice(cands)}"
        return e

    # phase A: single-row creates / rels / sets
    for _ in range(rng.randint(2, 7)):
        op = rng.random()
        if op < 0.5 or not bound:
            if bound and rng.random() < 0.25:
                # REBIND an existing name: shadows the old binding and
                # orphans its node (the test2.q `ab` quirk)
                v = rng.choice(list(bound))
            else:
                v = next(names)
            lb = rng.choice(labels)
            lines.append(f"create ({v}: {lb})")
            bound[v] = lb
            n_created[lb] += 1
        elif op < 0.8 and len(bound) >= 2:
            pairs = [
                (sv, r, tv)
                for sv in bound for tv in bound
                for (a, r, b) in rels
                if bound[sv] == a and bound[tv] == b
            ]
            if pairs:
                sv, r, tv = rng.choice(pairs)
                lines.append(f"create ({sv}) -[:{r}]-> ({tv})")
        else:
            v = rng.choice(list(bound))
            lb = bound[v]
            nm, tp = rng.choice(attrs[lb])
            rhs = (
                f'"{rng.choice(STR_LIT)}"' if tp == "string"
                else rng.choice(["true", "false"]) if tp == "bool"
                else int_expr(True)
            )
            lines.append(f"set {v}.{nm} = {rhs}")

    # set-op variant (~15%): read-only match/return branches combined by
    # union/intersect/except — branch 1 carries the phase-A mutations
    if rng.random() < 0.15:
        def branch() -> str:
            b_lines = []
            lb = rng.choice(labels)
            b_lines.append(f"match (z: {lb})")
            cands = [(r, b) for (a, r, b) in rels if a == lb]
            if cands and rng.random() < 0.5:
                r, b2 = rng.choice(cands)
                w = f"w{rng.randint(0, 9)}"
                b_lines.append(f"match (z) -[:{r}]-> ({w}: {b2})")
            b_lines.append("return z")
            return "\n".join(b_lines)

        lines.append(branch())
        for _ in range(rng.randint(1, 2)):
            lines.append(rng.choice(["union", "intersect", "except"]))
            lines.append(branch())
        return "\n".join(lines) + "\n"

    # phase B: matches / where / set-early / deletes, then return
    set_ok = True
    nullable: set = set()
    for _ in range(rng.randint(1, 5)):
        op = rng.random()
        if op < 0.28 and bound and rng.random() < 0.45:
            # optional match: exactly one NEW labelled var, other side bound
            cands = []
            for v, lb in bound.items():
                if v in nullable:
                    continue
                for (a, r, b2) in rels:
                    if a == lb:
                        cands.append((v, r, b2, "fwd"))
                    if b2 == lb:
                        cands.append((v, r, a, "rev"))
            if cands:
                v, r, lb2, d = rng.choice(cands)
                w = next(names)
                if d == "fwd":
                    lines.append(f"optional match ({v}) -[:{r}]-> ({w}: {lb2})")
                else:
                    lines.append(f"optional match ({w}: {lb2}) -[:{r}]-> ({v})")
                bound[w] = lb2
                nullable.add(w)
                set_ok = False
            continue
        if op < 0.30 and bound:
            # where not exists: bound side + anonymous labelled side
            cands = []
            for v, lb in bound.items():
                if v in nullable:
                    continue
                for (a, r, b2) in rels:
                    if a == lb:
                        cands.append(f"where not exists ({v}) -[:{r}]-> (:{b2})")
                    if b2 == lb:
                        cands.append(f"where not exists (:{a}) -[:{r}]-> ({v})")
            if cands:
                lines.append(rng.choice(cands))
                set_ok = False
            continue
        if op < 0.35:
            nonempty = [lb for lb in labels if n_created[lb] > 0]
            if not nonempty:
                continue
            if bound and rng.random() < 0.25:
                v = rng.choice(list(bound))  # REBIND: cross-product with
                nullable.discard(v)          # the shadowed column kept
            else:
                v = next(names)
            lb = rng.choice(nonempty)
            lines.append(f"match ({v}: {lb})")
            bound[v] = lb
        elif op < 0.55:
            # variable-length / undirected extension forms (~40% of edge
            # matches, round-6 verdict item 4): -[:r*]->, -[:r*lo..hi]->,
            # -[:r]-, and their undirected-star combinations, endpoints
            # any bound vars whose labels pass the closure reachability
            # check (the typechecker's _star_reachable rule)
            emitted = False
            rel_names = list(dict.fromkeys(r for (_, r, _) in rels))
            if rng.random() < 0.4 and bound:
                for _ in range(8):  # rejection-sample a well-typed form
                    sv = rng.choice(list(bound))
                    tv = rng.choice(list(bound))
                    rn = rng.choice(rel_names)
                    kind = rng.choice(["*", "*b", "*u", "*bu", "u"])
                    if kind == "*":
                        lo, hi, und, sfx = 1, None, False, "*"
                    elif kind == "*b":
                        lo = rng.randint(1, 2)
                        hi = rng.randint(lo, 3)
                        und, sfx = False, f"*{lo}..{hi}"
                    elif kind == "*u":
                        lo, hi, und, sfx = 1, None, True, "*"
                    elif kind == "*bu":
                        lo = rng.randint(1, 2)
                        hi = rng.randint(lo, 3)
                        und, sfx = True, f"*{lo}..{hi}"
                    else:
                        lo, hi, und, sfx = 1, 1, True, ""
                    if not reachable(bound[sv], rn, bound[tv], lo, hi, und):
                        continue
                    arrow = "->" if not und else "-"
                    lines.append(f"match ({sv}) -[:{rn}{sfx}]{arrow} ({tv})")
                    set_ok = False
                    emitted = True
                    break
            if not emitted:
                cands = [
                    (sv, r, tv)
                    for sv in bound for tv in bound
                    if sv != tv
                    for (a, r, b) in rels
                    if bound[sv] == a and bound[tv] == b
                ]
                if cands:
                    sv, r, tv = rng.choice(cands)
                    lines.append(f"match ({sv}) -[:{r}]-> ({tv})")
                    set_ok = False
        elif op < 0.75:
            conds = []
            int_accs, str_accs, bool_accs = [], [], []
            for v, lb in bound.items():
                for nm, tp in attrs[lb]:
                    acc = f"{v}.{nm}"
                    (int_accs if tp == "int" else
                     str_accs if tp == "string" else bool_accs).append(acc)
            for acc in int_accs:
                conds.append(
                    f"{acc} {rng.choice(['=', '<>', '>=', '<', '>'])} "
                    f"{int_expr(False)}"
                )
                # attr-vs-attr comparison (NULL-propagating on both sides)
                conds.append(
                    f"{acc} {rng.choice(['=', '<>', '>=', '<=' ])} "
                    f"{rng.choice(int_accs)}"
                )
            for acc in str_accs:
                conds.append(f"{acc} {rng.choice(['=', '<>'])} \"{rng.choice(STR_LIT)}\"")
            for acc in bool_accs:
                conds.append(f"{acc} = {rng.choice(['true', 'false'])}")
            if conds:
                c = rng.choice(conds)
                if rng.random() < 0.3 and len(conds) > 1:
                    c = f"{c} {rng.choice(['and', 'or'])} {rng.choice(conds)}"
                lines.append(f"where {c}")
                set_ok = False
        elif op < 0.85 and set_ok and bound:
            v = rng.choice(list(bound))
            if v in nullable:
                continue
            lb = bound[v]
            nm, tp = rng.choice(attrs[lb])
            rhs = (
                f'"{rng.choice(STR_LIT)}"' if tp == "string"
                else rng.choice(["true", "false"]) if tp == "bool"
                else int_expr(True)
            )
            lines.append(f"set {v}.{nm} = {rhs}")
        elif op < 0.93 and bound:
            solid = [x for x in bound if x not in nullable]
            if not solid:
                continue
            v = rng.choice(solid)
            lines.append(f"delete {v}")
            del bound[v]
            set_ok = False
        else:
            cands = [
                (sv, r, tv)
                for sv in bound for tv in bound
                if sv not in nullable and tv not in nullable
                for (a, r, b) in rels
                if bound[sv] == a and bound[tv] == b
            ]
            if cands:
                sv, r, tv = rng.choice(cands)
                lines.append(f"delete {sv} -[:{r}]-> {tv}")
                set_ok = False
    if bound:
        k = rng.randint(1, min(3, len(bound)))
        kw = "return distinct" if rng.random() < 0.3 else "return"
        lines.append(f"{kw} {', '.join(rng.sample(list(bound), k))}")
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# pure-Python model
# ---------------------------------------------------------------------------


def _trunc_div(l: int, r: int) -> int:
    """OCaml `/`: integer division truncating toward zero (NOT Python's
    floor division) — mirrors engine/exprs.py::int_div."""
    q = abs(l) // abs(r)
    return q if (l >= 0) == (r >= 0) else -q


def _eval3(e, row, nodes, slot):
    """Three-valued expression eval: None = NULL (Kleene, like Spark).
    ``slot``: var-name → row-slot resolver (most-recent binding wins)."""
    if isinstance(e, A.Const):
        return e.value.python_value
    if isinstance(e, A.AttribAcc):
        nid = row[slot(e.var)]
        rec = nodes.get(nid)
        return None if rec is None else rec[1].get(e.field)
    if isinstance(e, A.BinOp):
        l = _eval3(e.left, row, nodes, slot)
        r = _eval3(e.right, row, nodes, slot)
        k = {"ADD": "add", "SUB": "sub", "MUL": "mul", "DIV": "div",
             "MOD": "mod", "EQ": "eq", "NE": "neq",
             "GE": "ge", "GT": "gt", "LE": "le", "LT": "lt",
             "AND": "and", "OR": "or"}[e.op.name]
        if k == "and":
            if l is False or r is False:
                return False
            if l is None or r is None:
                return None
            return True
        if k == "or":
            if l is True or r is True:
                return True
            if l is None or r is None:
                return None
            return False
        if l is None or r is None:
            return None
        return {
            "add": lambda: l + r, "sub": lambda: l - r, "mul": lambda: l * r,
            # mod takes the DIVIDEND's sign (OCaml mod == Spark %), so it
            # pairs with the truncating division: l == div*r + mod
            "div": lambda: _trunc_div(l, r),
            "mod": lambda: l - r * _trunc_div(l, r),
            "eq": lambda: l == r, "neq": lambda: l != r,
            "ge": lambda: l >= r, "gt": lambda: l > r,
            "le": lambda: l <= r, "lt": lambda: l < r,
        }[k]()
    raise TypeError(e)


def _closure_pairs(edges, rel, lo, hi, undirected):
    """Model of executor._transitive_pairs: (src, dst) pairs connected
    by a path of lo..hi edges of ``rel`` (hi=None → unbounded closure,
    which the parser only produces with lo=1).  Bounded = union of
    exactly-k-hop compositions for k in lo..hi, matching the engine's
    hop-walk; undirected symmetrizes the edge set first."""
    e = {(s, d) for (s, rl, d) in edges if rl == rel}
    if undirected:
        e |= {(d, s) for (s, d) in e}
    if hi is None:
        closure = set(e)
        while True:
            grown = closure | {
                (a, d) for (a, b) in closure for (c, d) in e if b == c
            }
            if grown == closure:
                return closure
            closure = grown
    hop = set(e)
    out = set(e) if lo <= 1 else set()
    for k in range(2, hi + 1):
        hop = {(a, d) for (a, b) in hop for (c, d) in e if b == c}
        if k >= lo:
            out |= hop
    return out


def _null_safe_key(t: tuple) -> tuple:
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in t)


def run_model(prog2):
    state = {"nodes": {}, "edges": set(), "next_id": 0}
    instrs = list(prog2.instructions)
    # set-op branches: branch 1 carries the mutations; each later branch
    # runs from a FRESH SEED over the SAME (possibly mutated) graph;
    # results combine by variable name with SQL DISTINCT semantics
    # (executor.run).
    branches, ops, cur = [], [], []
    for i in instrs:
        if isinstance(i, ISetOp):
            branches.append(cur)
            ops.append(i.op)
            cur = []
        else:
            cur.append(i)
    branches.append(cur)

    env, rows = _run_instrs(branches[0], state)
    by_name = sorted(env, key=lambda p: p[0])  # (var, slot) name-sorted
    if ops:
        acc = {tuple(r[s] for _, s in by_name) for r in rows}
        for op, br in zip(ops, branches[1:]):
            env2, rows2 = _run_instrs(br, state)
            bn2 = sorted(env2, key=lambda p: p[0])
            s2 = {tuple(r[s] for _, s in bn2) for r in rows2}
            acc = (acc | s2) if op == "union" else (
                acc & s2 if op == "intersect" else acc - s2
            )
        table = sorted(acc, key=_null_safe_key)
    else:
        table = sorted(
            (tuple(r[s] for _, s in by_name) for r in rows),
            key=_null_safe_key,
        )
    node_snap = {}
    for i, (lb, ats) in state["nodes"].items():
        node_snap.setdefault(lb, {})[i] = {
            k: v for k, v in ats.items() if v is not None
        }
    return [v for v, _ in by_name], table, node_snap, state["edges"]


def _run_instrs(instrs, state):
    nodes = state["nodes"]
    rows = [dict()]
    # env: list[(var, slot)] NEWEST-FIRST, one unique slot per binding —
    # the model of the engine's prepend-on-bind env (executor.Binding):
    # a re-bound name resolves to its newest slot; the shadowed slot
    # stays in the rows (its cross-product multiplicity is real).
    env: list = []
    _ns = [0]

    def bind(var: str) -> str:
        s = f"_s{_ns[0]}"
        _ns[0] += 1
        env.insert(0, (var, s))
        return s

    def slot(var: str) -> str:
        for v, s in env:
            if v == var:
                return s
        raise KeyError(var)

    for ins in instrs:
        edges = state["edges"]
        next_id = state["next_id"]
        if isinstance(ins, IActOnNode) and ins.action == Action.CREATE:
            assert len(rows) == 1, "generator promises single-row creates"
            nid = next_id
            state["next_id"] = next_id + 1
            nodes[nid] = (ins.label, {})
            s = bind(ins.var)
            rows = [dict(r, **{s: nid}) for r in rows]
        elif isinstance(ins, IActOnNode):
            ids = sorted(i for i, (lb, _) in nodes.items() if lb == ins.label)
            s = bind(ins.var)
            rows = [dict(r, **{s: i}) for r in rows for i in ids]
        elif isinstance(ins, IActOnRel) and ins.action == Action.CREATE:
            ss, ts = slot(ins.src_var), slot(ins.tgt_var)
            state["edges"] = edges | {
                (r[ss], ins.rel, r[ts]) for r in rows
            }
        elif isinstance(ins, IActOnRel):
            ss, ts = slot(ins.src_var), slot(ins.tgt_var)
            if getattr(ins, "star", False):
                ok = _closure_pairs(
                    edges, ins.rel,
                    getattr(ins, "star_min", 1), getattr(ins, "star_max", None),
                    getattr(ins, "undirected", False),
                )
                rows = [r for r in rows if (r[ss], r[ts]) in ok]
            elif getattr(ins, "undirected", False):
                e1 = {(s, d) for (s, rl, d) in edges if rl == ins.rel}
                e1 |= {(d, s) for (s, d) in e1}
                rows = [r for r in rows if (r[ss], r[ts]) in e1]
            else:
                rows = [
                    r for r in rows
                    if (r[ss], ins.rel, r[ts]) in edges
                ]
        elif isinstance(ins, IDeleteNode):
            s = slot(ins.var)  # newest binding's ids are what dies
            ids = {r[s] for r in rows}
            for i in ids:
                nodes.pop(i, None)
            state["edges"] = {
                e for e in edges if e[0] not in ids and e[2] not in ids
            }
            # engine drops the newest COLUMN but unbinds EVERY env entry
            # named var (executor._delete_node); shadowed slots stay in
            # the rows, just unaddressable
            rows = [{k: v for k, v in r.items() if k != s} for r in rows]
            env = [(v, sl) for (v, sl) in env if v != ins.var]
        elif isinstance(ins, IDeleteRel):
            ss, ts = slot(ins.src_var), slot(ins.tgt_var)
            pairs = {(r[ss], r[ts]) for r in rows}
            state["edges"] = {
                e for e in edges
                if not (e[1] == ins.rel and (e[0], e[2]) in pairs)
            }
        elif isinstance(ins, IOptRel):
            # left outer: one row per matching correctly-labelled edge
            # endpoint, else one row with the new var NULL
            out = []
            if ins.new_var == ins.tgt_var:
                anchor = slot(ins.src_var)
            else:
                anchor = slot(ins.tgt_var)
            for r in rows:
                if ins.new_var == ins.tgt_var:
                    ms = [
                        d for (s, rl, d) in edges
                        if rl == ins.rel and s == r[anchor]
                        and nodes.get(d, (None,))[0] == ins.new_label
                    ]
                else:
                    ms = [
                        s for (s, rl, d) in edges
                        if rl == ins.rel and d == r[anchor]
                        and nodes.get(s, (None,))[0] == ins.new_label
                    ]
                out.append((r, ms))
            ns = bind(ins.new_var)
            rows = [
                dict(r, **{ns: m})
                for r, ms in out
                for m in (ms if ms else [None])
            ]
        elif isinstance(ins, INotExistsRel):
            sv = slot(ins.src_var) if ins.src_var is not None else None
            tv = slot(ins.tgt_var) if ins.tgt_var is not None else None

            def _exists(r):
                for s, rl, d in edges:
                    if rl != ins.rel:
                        continue
                    if sv is not None:
                        if s != r[sv]:
                            continue
                    elif nodes.get(s, (None,))[0] != ins.src_label:
                        continue
                    if tv is not None:
                        if d != r[tv]:
                            continue
                    elif nodes.get(d, (None,))[0] != ins.tgt_label:
                        continue
                    return True
                return False

            rows = [r for r in rows if not _exists(r)]
        elif isinstance(ins, IWhere):
            rows = [r for r in rows if _eval3(ins.expr, r, nodes, slot) is True]
        elif isinstance(ins, ISet):
            assert rows, "generator promises non-empty set"
            # engine orders by ALL env columns newest-first (executor._set
            # order_cols), shadowed ones included
            order = [s for _, s in env]
            first = min(rows, key=lambda r: tuple(r[s] for s in order))
            val = _eval3(ins.expr, first, nodes, slot)
            s = slot(ins.var)
            for i in {r[s] for r in rows}:
                nodes[i][1][ins.field] = val
        elif isinstance(ins, IReturn):
            sel = [(v, slot(v)) for v in ins.vars]
            rows = [{s: r[s] for _, s in sel} for r in rows]
            if getattr(ins, "distinct", False):
                seen, out = set(), []
                for r in rows:
                    k = tuple(r[s] for _, s in sel)
                    if k not in seen:
                        seen.add(k)
                        out.append(r)
                rows = out
            env = sel
        else:
            raise TypeError(f"model does not cover {ins!r}")

    return env, rows


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


# path-coverage counters for the in-suite soak: the new-surface checks
# are probabilistic, so the soak asserts they actually fired instead of
# silently dodging the envelope (the n_rebind/n_divmod discipline)
COVERAGE = {"bind_params": 0, "sql_surface": 0}


def parameterize(text: str, rng: random.Random):
    """Rewrite a random subset of the program's literals (ints, strings,
    booleans) as ``$pN`` bind placeholders — the g28 prepared-statement
    surface.  Returns (ptext, params), or None when the program has no
    parameterizable literal.  By construction
    ``bind_params(ptext, params) == text`` must hold exactly (ints
    render as str(int), strings re-quote, booleans lower) — the caller
    asserts that round-trip before running the engine."""
    spots = []  # (start, end, value)
    for m in re.finditer(r'"([A-Za-z0-9 ]*)"', text):
        spots.append((m.start(), m.end(), m.group(1)))
    # standalone integer literals: not inside an identifier, not the
    # digits of a previously introduced placeholder (none exist yet)
    for m in re.finditer(r"(?<![\w$])\d+(?!\w)", text):
        spots.append((m.start(), m.end(), int(m.group(0))))
    for m in re.finditer(r"(?<![\w$])(true|false)(?!\w)", text):
        spots.append((m.start(), m.end(), m.group(1) == "true"))
    if not spots:
        return None
    chosen = [s for s in spots if rng.random() < 0.5] or [rng.choice(spots)]
    chosen.sort()
    params = {}
    out = []
    prev = 0
    for i, (a, b, v) in enumerate(chosen):
        name = f"p{i}"
        params[name] = v
        out.append(text[prev:a])
        out.append(f"${name}")
        prev = b
    out.append(text[prev:])
    return "".join(out), params


def _sql_surface_check(spark, state, want_nodes, want_edges, rel_decls, rng):
    """The g27 surface, fuzzed: register the final (mutated) graph state
    as temp views and express a random schema edge's 1-hop motif THREE
    ways — ANSI SQL over the views, the engine's own match on the same
    state, and the pure-Python model's closure — all must agree.
    Returns an error string or None."""
    from projet_graphdb_spark.engine import binding_table, run_program

    l1, rel, l2 = rng.choice(rel_decls)
    for label, df in state.nodes.items():
        df.createOrReplaceTempView(f"fz_{label.lower()}")
    state.edges.createOrReplaceTempView("fz_edges")
    got_sql = sorted(
        (r["x"], r["y"])
        for r in spark.sql(
            f"""
            SELECT a._id AS x, b._id AS y
            FROM fz_{l1.lower()} a
            JOIN fz_edges e ON e.src = a._id AND e.rel = '{rel}'
            JOIN fz_{l2.lower()} b ON b._id = e.dst
            """
        ).collect()
    )
    _, b2 = run_program(
        spark,
        f"match (x: {l1}) -[:{rel}]-> (y: {l2})\nreturn x, y",
        initial_state=state,
    )
    tbl2 = binding_table(b2)
    got_eng = sorted((r["x"], r["y"]) for r in tbl2.collect())
    want = sorted(
        (s, d)
        for (s, r2, d) in want_edges
        if r2 == rel and s in want_nodes.get(l1, {}) and d in want_nodes.get(l2, {})
    )
    if got_sql != want:
        return f"sql-surface {l1}-{rel}->{l2}: sql {got_sql[:5]} != model {want[:5]}"
    if got_eng != want:
        return f"sql-surface {l1}-{rel}->{l2}: engine {got_eng[:5]} != model {want[:5]}"
    return None


def run_one(spark, text: str, rng: random.Random | None = None) -> tuple:
    """(ok, detail) for one program.  When ``rng`` is given, the run
    randomly exercises the two newest language surfaces as well: the
    program may execute through the g28 bind-parameter path (literals
    lifted to $pN placeholders; the rendered text must round-trip
    exactly), and after the compare a random schema edge's motif is
    cross-checked between ANSI SQL over registered views, the engine,
    and the model (the g27 surface)."""
    from projet_graphdb_spark.engine import bind_params, binding_table, run_program

    prog2 = normalize(parse(text))
    try:
        typecheck(prog2)
    except TypeCheckError as ex:
        return None, f"generator slip (typecheck): {ex}"
    cols, want_rows, want_nodes, want_edges = run_model(prog2)

    run_text, run_params = text, None
    if rng is not None and rng.random() < 0.5:
        p = parameterize(text, rng)
        if p is not None:
            ptext, params = p
            rendered = bind_params(ptext, params)
            if rendered != text:
                return False, (
                    f"bind_params round-trip broke the program:\n{ptext}\n"
                    f"params={params}\nrendered:\n{rendered}"
                )
            run_text, run_params = ptext, params
            COVERAGE["bind_params"] += 1

    state, b = run_program(spark, run_text, params=run_params)
    tbl = binding_table(b)
    got_rows = sorted(
        (tuple(r[c] for c in sorted(tbl.columns)) for r in tbl.collect()),
        key=_null_safe_key,
    )
    got_nodes = {
        lb: {i: ats for i, ats in m.items()}
        for lb, m in state.collect_nodes().items()
        if m  # model omits empty labels? keep all, compare below
    }
    # normalize: include empty labels on both sides
    all_labels = set(got_nodes) | set(want_nodes) | set(state.nodes)
    for lb in all_labels:
        got_nodes.setdefault(lb, {})
        want_nodes.setdefault(lb, {})
    got_edges = state.collect_edges()

    if sorted(tbl.columns) != cols:
        return False, f"columns {sorted(tbl.columns)} != {cols}"
    if got_rows != want_rows:
        return False, f"rows {got_rows[:5]} != {want_rows[:5]}"
    if got_nodes != want_nodes:
        return False, f"nodes {got_nodes} != {want_nodes}"
    if got_edges != want_edges:
        return False, f"edges {sorted(got_edges)} != {sorted(want_edges)}"
    if rng is not None and rng.random() < 0.5:
        rel_decls = re.findall(r"\(:(\w+)\) -\[:(\w+)\]-> \(:(\w+)\)", text)
        if rel_decls:
            COVERAGE["sql_surface"] += 1
            err = _sql_surface_check(
                spark, state, want_nodes, want_edges, rel_decls, rng
            )
            if err:
                return False, err
    return True, ""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from projet_graphdb_spark.engine import get_spark

    spark = get_spark(app_name="diff-fuzz", master="local[4]", shuffle_partitions=4)
    rng = random.Random(seed)
    bad = skipped = 0
    for trial in range(n):
        text = gen_program(rng)
        try:
            ok, detail = run_one(spark, text, rng=rng)
        except Exception as ex:  # an engine crash IS a divergence
            ok, detail = False, f"engine raised {type(ex).__name__}: {str(ex)[:300]}"
        if ok is None:
            skipped += 1
            continue
        if not ok:
            bad += 1
            print(f"=== DIVERGENCE (trial {trial}) ===\n{text}\n{detail}\n")
    print(f"trials={n} divergences={bad} generator_slips={skipped}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
