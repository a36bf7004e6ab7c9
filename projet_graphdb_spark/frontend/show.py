"""OCaml `deriving show`-shaped printers for normalized programs.

The reference's interactive mode prints the normalized program with
``Instr.show_norm_prog`` (``graphDB/lib/interf.ml:50-56``), whose output
is the ppx_deriving constructor syntax, e.g.::

    (Instr.NormQuery
       [(Instr.IActOnNode (Instr.MatchAct, "x", "N"));
        (Instr.IWhere
           (Lang.BinOp ((Lang.BCompar Lang.BCeq),
              (Lang.AttribAcc ("x", "v")), (Lang.Const (Lang.IntV 3)))))])

This module renders the same constructor shapes (``lang.ml`` /
``instr.ml`` tags) from the Python dataclass AST, so the CLI's ``i``
mode output is recognizable to a reference user.  Spark-only pattern
extensions (variable-length stars, undirected edges) render with a
trailing annotation the reference grammar doesn't have.
"""

from __future__ import annotations

from . import ast as A
from .normalize import (
    Action,
    IActOnNode,
    IActOnRel,
    IDeleteNode,
    IDeleteRel,
    INotExistsRel,
    IOptRel,
    IOrderLimit,
    IReturn,
    IReturnAgg,
    ISet,
    ISetOp,
    IWhere,
    NormProg,
)

_ARITH = {
    A.BinOpKind.ADD: "BAadd",
    A.BinOpKind.SUB: "BAsub",
    A.BinOpKind.MUL: "BAmul",
    A.BinOpKind.DIV: "BAdiv",
    A.BinOpKind.MOD: "BAmod",
}
_COMPAR = {
    A.BinOpKind.EQ: "BCeq",
    A.BinOpKind.NE: "BCne",
    A.BinOpKind.GE: "BCge",
    A.BinOpKind.GT: "BCgt",
    A.BinOpKind.LE: "BCle",
    A.BinOpKind.LT: "BClt",
}
_LOGIC = {A.BinOpKind.AND: "BLand", A.BinOpKind.OR: "BLor"}


def _show_binop_kind(op: A.BinOpKind) -> str:
    if op in _ARITH:
        return f"(Lang.BArith Lang.{_ARITH[op]})"
    if op in _COMPAR:
        return f"(Lang.BCompar Lang.{_COMPAR[op]})"
    return f"(Lang.BLogic Lang.{_LOGIC[op]})"


def _show_value(v: A.Value) -> str:
    if v.type == A.AttribType.BOOL:
        return f"(Lang.BoolV {'true' if v.python_value else 'false'})"
    if v.type == A.AttribType.INT:
        return f"(Lang.IntV {int(v.python_value)})"
    return f'(Lang.StringV "{v.python_value}")'


def show_expr(e: A.Expr) -> str:
    """``Lang.expr`` constructor shape (lang.ml:40-44)."""
    if isinstance(e, A.Const):
        return f"(Lang.Const {_show_value(e.value)})"
    if isinstance(e, A.AttribAcc):
        return f'(Lang.AttribAcc ("{e.var}", "{e.field}"))'
    if isinstance(e, A.BareVar):
        return f'(Ext.BareVar "{e.var}")  (* extension *)'
    return (
        f"(Lang.BinOp ({_show_binop_kind(e.op)}, "
        f"{show_expr(e.left)}, {show_expr(e.right)}))"
    )


def _act(a: Action) -> str:
    return "Instr.CreateAct" if a == Action.CREATE else "Instr.MatchAct"


def show_instruction(i) -> str:
    """``Instr.instruction`` constructor shape (instr.ml:8-16)."""
    if isinstance(i, IActOnNode):
        return f'(Instr.IActOnNode ({_act(i.action)}, "{i.var}", "{i.label}"))'
    if isinstance(i, IActOnRel):
        base = (
            f'(Instr.IActOnRel ({_act(i.action)}, "{i.src_var}", '
            f'"{i.rel}", "{i.tgt_var}"))'
        )
        marks = []
        if getattr(i, "star", False):
            hi = i.star_max if i.star_max is not None else ""
            marks.append(f"*{i.star_min}..{hi}" if (i.star_min, i.star_max) != (1, None) else "*")
        if getattr(i, "undirected", False):
            marks.append("undirected")
        return base + (f"  (* {' '.join(marks)} *)" if marks else "")
    if isinstance(i, IOptRel):
        return (
            f'(Instr.IOptRel ("{i.src_var}", "{i.rel}", "{i.tgt_var}", '
            f'"{i.new_var}", "{i.new_label}"))  (* extension *)'
        )
    if isinstance(i, INotExistsRel):
        def side(v, lbl):
            return f'"{v}"' if v is not None else f'(:{lbl})'
        return (
            f"(Instr.INotExistsRel ({side(i.src_var, i.src_label)}, "
            f'"{i.rel}", {side(i.tgt_var, i.tgt_label)}))  (* extension *)'
        )
    if isinstance(i, IDeleteNode):
        return f'(Instr.IDeleteNode "{i.var}")'
    if isinstance(i, IDeleteRel):
        return f'(Instr.IDeleteRel ("{i.src_var}", "{i.rel}", "{i.tgt_var}"))'
    if isinstance(i, IReturn):
        vs = "; ".join(f'"{v}"' for v in i.vars)
        mark = "  (* distinct *)" if getattr(i, "distinct", False) else ""
        return f"(Instr.IReturn [{vs}])" + mark
    if isinstance(i, IOrderLimit):
        fld = f'"{i.field}"' if i.field else "None"
        direction = "asc" if i.ascending else "desc"
        return (
            f'(Instr.IOrderLimit ("{i.var}", {fld}, {direction}, {i.n}))'
            "  (* extension *)"
        )
    if isinstance(i, IReturnAgg):
        ks = "; ".join(f'"{v}"' for v in i.keys)
        ags = "; ".join(
            f'({a.fn} "{a.var}"' + (f' "{a.field}")' if a.field else ")") for a in i.aggs
        )
        return f"(Instr.IReturnAgg ([{ks}], [{ags}]))  (* extension *)"
    if isinstance(i, IWhere):
        return f"(Instr.IWhere {show_expr(i.expr)})"
    if isinstance(i, ISet):
        return f'(Instr.ISet ("{i.var}", "{i.field}", {show_expr(i.expr)}))'
    if isinstance(i, ISetOp):
        return f'(Instr.ISetOp "{i.op}")  (* extension: branch separator *)'
    return repr(i)


def show_norm_query(prog: NormProg) -> str:
    """``Instr.NormQuery`` shape over the instruction list."""
    if not prog.instructions:
        return "(Instr.NormQuery [])"
    body = ";\n    ".join(show_instruction(i) for i in prog.instructions)
    return f"(Instr.NormQuery\n   [{body}])"
