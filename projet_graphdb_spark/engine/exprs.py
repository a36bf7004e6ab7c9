"""miniGQL scalar expressions → Spark Column expressions.

Semantics follow the reference evaluator (``graphDB/lib/sem.ml:146-175``):

* arithmetic is int-only (the typechecker guarantees it); ``/`` is integer
  division truncating toward zero (OCaml ``/``) — Spark's ``div`` operator
  has the same truncation; ``mod`` follows the dividend's sign in both
  OCaml and Spark ``%``.
* ``=`` / ``<>`` are structural equality on same-typed values.
* ``and`` / ``or`` are non-short-circuit — Spark's ``&`` / ``|`` likewise
  evaluate both sides per row.

Division/modulo by zero: under Spark 4's default ANSI mode this raises
``SparkArithmeticException`` — matching the reference's
``Division_by_zero`` exception (sem.ml:166); with ANSI off it yields
NULL instead.  Documented divergence (sane Spark-side semantics):
reading a declared-but-never-``set`` attribute yields NULL and the row
drops out of ``where`` filters (reference raises, ``sem.ml:155-157``).

Attribute accesses are *not* evaluated by lookup — the executor joins the
binding table against the per-label node tables first, exposing each
accessed attribute as a plain column; this function only needs the
mapping (var, field) → column name.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..frontend import ast as A


def attrib_accesses(e: A.Expr) -> set:
    """All (var, field) pairs accessed by the expression."""
    if isinstance(e, A.AttribAcc):
        return {(e.var, e.field)}
    if isinstance(e, A.BinOp):
        return attrib_accesses(e.left) | attrib_accesses(e.right)
    return set()


def bare_vars(e: A.Expr) -> set:
    """All bare variables referenced by the expression (extension)."""
    if isinstance(e, A.BareVar):
        return {e.var}
    if isinstance(e, A.BinOp):
        return bare_vars(e.left) | bare_vars(e.right)
    return set()


def const_fold(e: A.Expr):
    """Driver-side evaluation when the expression has no attribute access.

    Returns the Python value, or None if the expression is not constant.
    Used to skip a Spark action for the overwhelmingly common
    ``set v.f = <literal>`` case.
    """
    if isinstance(e, A.Const):
        return e.value.python_value
    if isinstance(e, A.BinOp) and not attrib_accesses(e) and not bare_vars(e):
        l = const_fold(e.left)
        r = const_fold(e.right)
        k = e.op
        if k == A.BinOpKind.ADD:
            return l + r
        if k == A.BinOpKind.SUB:
            return l - r
        if k == A.BinOpKind.MUL:
            return l * r
        if k == A.BinOpKind.DIV:
            q = abs(l) // abs(r)
            return q if (l >= 0) == (r >= 0) else -q  # truncate toward zero
        if k == A.BinOpKind.MOD:
            return l - r * (abs(l) // abs(r)) * (1 if (l >= 0) == (r >= 0) else -1)
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
    return None


def to_column(e: A.Expr, attr_col) -> Column:
    """Translate an expression to a Column.

    ``attr_col``: callable (var, field) -> column name exposing that
    attribute in the current (attribute-joined) binding DataFrame.
    """
    if isinstance(e, A.Const):
        return F.lit(e.value.python_value)
    if isinstance(e, A.AttribAcc):
        return F.col(attr_col(e.var, e.field))
    if isinstance(e, A.BareVar):
        # bare variable: its binding column (node id / aggregate output)
        return F.col(attr_col(e.var, None))
    if isinstance(e, A.BinOp):
        l = to_column(e.left, attr_col)
        r = to_column(e.right, attr_col)
        k = e.op
        if k == A.BinOpKind.ADD:
            return l + r
        if k == A.BinOpKind.SUB:
            return l - r
        if k == A.BinOpKind.MUL:
            return l * r
        if k == A.BinOpKind.DIV:
            return int_div(l, r)
        if k == A.BinOpKind.MOD:
            return l % r
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
            return l & r
        if k == A.BinOpKind.OR:
            return l | r
    raise TypeError(f"unknown expression {e!r}")


def int_div(l: Column, r: Column) -> Column:
    """Integer division truncating toward zero, like OCaml's ``/``.

    Spark ``%`` follows the dividend's sign, so ``l - (l % r)`` is exactly
    divisible by ``r`` and the quotient is the toward-zero truncation.
    Stays inside whole-stage codegen.  On r = 0: raises under ANSI mode
    (like the reference's Division_by_zero, sem.ml:166), NULL otherwise.
    """
    return ((l - (l % r)) / r).cast("long")
