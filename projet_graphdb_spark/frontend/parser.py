"""Recursive-descent parser for miniGQL.

Grammar follows the reference (``graphDB/lib/parser.mly:28-127``):

    prog        := tpDecl* clause*
    tpDecl      := '(' ':' IDENT '{' attribDecl,* '}' ')'            -- node type
                 | '(' ':' IDENT ')' '-[' ':' IDENT ']->' '(' ':' IDENT ')'  -- rel type
    clause      := 'create' pattern,* | 'match' pattern,*
                 | 'delete' deletePat | 'return' IDENT,*
                 | 'where' expr | 'set' assign,*
    pattern     := nodePat ('-[' ':' IDENT ']->' pattern)?
    nodePat     := '(' IDENT (':' IDENT)? ')'
    deletePat   := IDENT,+  |  relPat,+       (disambiguated by lookahead)
    assign      := IDENT '.' IDENT '=' expr

Expression precedence (parser.mly:18-22), low to high, all
left-associative:  or < and < (= <> >= > <= <) < (+ -) < (* / mod).
"""

from __future__ import annotations

from . import ast as A
from .lexer import Token, tokenize


class ParseError(Exception):
    def __init__(self, msg: str, tok: Token):
        super().__init__(f"parse error at {tok.line}:{tok.col} near {tok.kind}({tok.value!r}): {msg}")
        self.token = tok


_CLAUSE_STARTS = {
    "CREATE", "MATCH", "MERGE", "OPTIONAL", "DELETE", "RETURN", "WHERE", "SET", "ORDER",
}

_CMP_OPS = {
    "EQ": A.BinOpKind.EQ,
    "NE": A.BinOpKind.NE,
    "GE": A.BinOpKind.GE,
    "GT": A.BinOpKind.GT,
    "LE": A.BinOpKind.LE,
    "LT": A.BinOpKind.LT,
}
_ADD_OPS = {"ADD": A.BinOpKind.ADD, "SUB": A.BinOpKind.SUB}
_MUL_OPS = {"MUL": A.BinOpKind.MUL, "DIV": A.BinOpKind.DIV, "MOD": A.BinOpKind.MOD}


class Parser:
    def __init__(self, tokens: list):
        self.toks = tokens
        self.pos = 0

    # -- token helpers ------------------------------------------------------

    def peek(self, offset: int = 0) -> Token:
        return self.toks[min(self.pos + offset, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.pos]
        if t.kind != "EOF":
            self.pos += 1
        return t

    def expect(self, kind: str) -> Token:
        t = self.peek()
        if t.kind != kind:
            raise ParseError(f"expected {kind}", t)
        return self.next()

    def accept(self, kind: str):
        if self.peek().kind == kind:
            return self.next()
        return None

    # -- program ------------------------------------------------------------

    def parse_prog(self) -> A.Prog:
        types = A.TypeGraph()
        while self.peek().kind == "LPAREN":
            self._parse_tp_decl(types)
        clauses = []
        while self.peek().kind in _CLAUSE_STARTS:
            clauses.append(self._parse_clause())
        while self.peek().kind == "SETOP":
            op_tok = self.next()
            clauses.append(A.SetOpClause(op_tok.value))
            if self.peek().kind not in _CLAUSE_STARTS:
                raise ParseError(f"expected clauses after '{op_tok.value}'", self.peek())
            while self.peek().kind in _CLAUSE_STARTS:
                clauses.append(self._parse_clause())
        self.expect("EOF")
        return A.Prog(types, A.Query(clauses))

    def _parse_tp_decl(self, types: A.TypeGraph) -> None:
        self.expect("LPAREN")
        self.expect("COLON")
        label = self.expect("IDENT").value
        if self.peek().kind == "LBRACE":
            # node type decl: (:L {f tp, ...})
            self.next()
            attrs = []
            if self.peek().kind != "RBRACE":
                while True:
                    fname = self.expect("IDENT").value
                    ftp = self.expect("TP").value
                    attrs.append((fname, ftp))
                    if not self.accept("COMMA"):
                        break
            self.expect("RBRACE")
            self.expect("RPAREN")
            types.nodes.append(A.NodeTypeDecl(label, tuple(attrs)))
        else:
            # rel type decl: (:A) -[:r]-> (:B)
            self.expect("RPAREN")
            self.expect("SUB")
            self.expect("LBRACKET")
            self.expect("COLON")
            rel = self.expect("IDENT").value
            self.expect("RBRACKET")
            self.expect("ARROW")
            self.expect("LPAREN")
            self.expect("COLON")
            tgt = self.expect("IDENT").value
            self.expect("RPAREN")
            types.rels.append(A.RelTypeDecl(label, rel, tgt))

    # -- clauses ------------------------------------------------------------

    def _parse_clause(self) -> A.Clause:
        t = self.next()
        if t.kind == "CREATE":
            return A.CreateClause(tuple(self._parse_pattern_list()))
        if t.kind == "MATCH":
            return A.MatchClause(tuple(self._parse_pattern_list()))
        if t.kind == "OPTIONAL":
            # optional match (a) -[:r]-> (b:L): one bound ref, one decl
            self.expect("MATCH")
            src = self._parse_node_pattern()
            rel = self._parse_plain_rel_arrow()
            tgt = self._parse_node_pattern()
            sides = (isinstance(src, A.DeclPattern), isinstance(tgt, A.DeclPattern))
            if sides not in ((True, False), (False, True)):
                raise ParseError(
                    "optional match needs exactly one bound (v) side and one "
                    "new (v:L) side",
                    t,
                )
            return A.OptionalMatchClause(src, rel, tgt)
        if t.kind == "MERGE":
            # merge (v: L {f = const, ...}) — constant-keyed upsert
            self.expect("LPAREN")
            var = self.expect("IDENT").value
            self.expect("COLON")
            label = self.expect("IDENT").value
            props = []
            if self.accept("LBRACE"):
                while True:
                    f = self.expect("IDENT").value
                    self.expect("EQ")
                    e = self._parse_primary()
                    if not isinstance(e, A.Const):
                        raise ParseError("merge properties must be literal constants", t)
                    props.append((f, e))
                    if not self.accept("COMMA"):
                        break
                self.expect("RBRACE")
            self.expect("RPAREN")
            return A.MergeClause(var, label, tuple(props))
        if t.kind == "RETURN":
            return self._parse_return_clause(t)
        if t.kind == "ORDER":
            # order by <v | v.f> [asc|desc] limit N
            self.expect("BY")
            var = self.expect("IDENT").value
            fieldname = None
            if self.accept("DOT"):
                fieldname = self.expect("IDENT").value
            ascending = True
            if self.accept("DESC"):
                ascending = False
            else:
                self.accept("ASC")
            self.expect("LIMIT")
            n = int(self.expect("INT").value)
            if n < 1:
                raise ParseError("limit must be >= 1", t)
            return A.OrderLimitClause(var, fieldname, ascending, n)
        if t.kind == "WHERE":
            if self.peek().kind == "NOT":
                # where not exists (a) -[:r]-> (:L)
                self.next()
                self.expect("EXISTS")
                src = self._parse_ne_node_pattern()
                rel = self._parse_plain_rel_arrow()
                tgt = self._parse_ne_node_pattern()
                if not (
                    isinstance(src, A.VarRefPattern) or isinstance(tgt, A.VarRefPattern)
                ):
                    raise ParseError(
                        "not exists needs at least one bound (v) side", t
                    )
                return A.NotExistsClause(src, rel, tgt)
            return A.WhereClause(self._parse_expr())
        if t.kind == "SET":
            return A.SetClause(tuple(self._parse_assign_list()))
        if t.kind == "DELETE":
            return A.DeleteClause(self._parse_delete_pattern())
        raise ParseError("expected clause", t)

    def _parse_pattern_list(self) -> list:
        pats = [self._parse_pattern()]
        while self.accept("COMMA"):
            pats.append(self._parse_pattern())
        return pats

    def _parse_pattern(self) -> A.Pattern:
        np = self._parse_node_pattern()
        if self.peek().kind == "SUB":
            self.next()
            self.expect("LBRACKET")
            self.expect("COLON")
            rel = self.expect("IDENT").value
            star = bool(self.accept("MUL"))  # -[:r*]-> variable-length
            star_min, star_max = 1, None
            if star and self.peek().kind == "INT":
                # bounded form -[:r*lo..hi]->
                star_min = int(self.expect("INT").value)
                self.expect("DOTDOT")
                star_max = int(self.expect("INT").value)
            self.expect("RBRACKET")
            if self.accept("ARROW"):
                undirected = False
            else:
                # -[:r]- (no arrowhead): undirected edge match extension
                self.expect("SUB")
                undirected = True
            rest = self._parse_pattern()
            return A.CompPattern(np, rel, rest, star, star_min, star_max, undirected)
        return A.SimpPattern(np)

    def _parse_plain_rel_arrow(self) -> str:
        """``-[:rel]->`` with no star/undirected forms (the optional /
        not-exists extensions keep the single-hop directed shape)."""
        self.expect("SUB")
        self.expect("LBRACKET")
        self.expect("COLON")
        rel = self.expect("IDENT").value
        self.expect("RBRACKET")
        self.expect("ARROW")
        return rel

    def _parse_ne_node_pattern(self):
        """Node pattern inside ``not exists``: ``(v)``, ``(v:L)`` or the
        anonymous ``(:L)``."""
        self.expect("LPAREN")
        if self.accept("COLON"):
            label = self.expect("IDENT").value
            self.expect("RPAREN")
            return A.AnonPattern(label)
        var = self.expect("IDENT").value
        if self.accept("COLON"):
            label = self.expect("IDENT").value
            self.expect("RPAREN")
            return A.DeclPattern(var, label)
        self.expect("RPAREN")
        return A.VarRefPattern(var)

    def _parse_node_pattern(self) -> A.NodePattern:
        self.expect("LPAREN")
        var = self.expect("IDENT").value
        if self.accept("COLON"):
            label = self.expect("IDENT").value
            self.expect("RPAREN")
            return A.DeclPattern(var, label)
        self.expect("RPAREN")
        return A.VarRefPattern(var)

    def _parse_return_clause(self, t):
        """``return`` items: plain vars, plus the aggregate extension
        ``count(v)`` / ``sum(v.f)`` / ``min`` / ``max`` / ``avg``.  Any
        aggregate present → ReturnAggClause grouping by the plain vars.
        ``return distinct ...`` dedups the projection."""
        distinct = bool(self.accept("DISTINCT"))
        keys, aggs = [], []
        while True:
            if self.peek().kind == "AGGFN":
                fn = self.next().value
                self.expect("LPAREN")
                var = self.expect("IDENT").value
                fieldname = None
                if self.accept("DOT"):
                    fieldname = self.expect("IDENT").value
                self.expect("RPAREN")
                if fn == "count" and fieldname is not None:
                    raise ParseError("count takes a bare variable", t)
                if fn != "count" and fieldname is None:
                    raise ParseError(f"{fn} needs an attribute (v.f)", t)
                aggs.append(A.AggItem(fn, var, fieldname))
            else:
                var = self.expect("IDENT").value
                fieldname = None
                if self.accept("DOT"):
                    # attribute projection extension: return p.nom
                    fieldname = self.expect("IDENT").value
                keys.append((var, fieldname))
            if not self.accept("COMMA"):
                break
        if aggs:
            if distinct:
                raise ParseError("distinct with aggregates is redundant", t)
            if any(f is not None for _, f in keys):
                raise ParseError(
                    "attribute projections cannot mix with aggregates "
                    "(group keys are bare variables)",
                    t,
                )
            return A.ReturnAggClause(tuple(v for v, _ in keys), tuple(aggs))
        if any(f is not None for _, f in keys):
            return A.ReturnProjClause(tuple(keys), distinct)
        return A.ReturnClause(tuple(v for v, _ in keys), distinct)

    def _parse_ident_list(self) -> list:
        names = [self.expect("IDENT").value]
        while self.accept("COMMA"):
            names.append(self.expect("IDENT").value)
        return names

    def _parse_assign_list(self) -> list:
        assigns = [self._parse_assign()]
        while self.accept("COMMA"):
            assigns.append(self._parse_assign())
        return assigns

    def _parse_assign(self):
        var = self.expect("IDENT").value
        self.expect("DOT")
        fieldname = self.expect("IDENT").value
        self.expect("EQ")
        return (var, fieldname, self._parse_expr())

    def _parse_delete_pattern(self):
        # `delete a, b` (nodes) vs `delete a -[:r]-> b` (rels): decide by
        # the token after the first identifier (parser.mly:49-54).
        if self.peek().kind == "IDENT" and self.peek(1).kind == "SUB":
            rels = [self._parse_rel_pattern()]
            while self.accept("COMMA"):
                rels.append(self._parse_rel_pattern())
            return A.DeleteRels(tuple(rels))
        return A.DeleteNodes(tuple(self._parse_ident_list()))

    def _parse_rel_pattern(self):
        src = self.expect("IDENT").value
        self.expect("SUB")
        self.expect("LBRACKET")
        self.expect("COLON")
        rel = self.expect("IDENT").value
        self.expect("RBRACKET")
        self.expect("ARROW")
        tgt = self.expect("IDENT").value
        return (src, rel, tgt)

    # -- expressions (precedence climbing) ----------------------------------

    def _parse_expr(self) -> A.Expr:
        return self._parse_or()

    def _parse_or(self) -> A.Expr:
        e = self._parse_and()
        while self.peek().kind == "OR":
            self.next()
            e = A.BinOp(A.BinOpKind.OR, e, self._parse_and())
        return e

    def _parse_and(self) -> A.Expr:
        e = self._parse_cmp()
        while self.peek().kind == "AND":
            self.next()
            e = A.BinOp(A.BinOpKind.AND, e, self._parse_cmp())
        return e

    def _parse_cmp(self) -> A.Expr:
        e = self._parse_add()
        while self.peek().kind in _CMP_OPS:
            op = _CMP_OPS[self.next().kind]
            e = A.BinOp(op, e, self._parse_add())
        return e

    def _parse_add(self) -> A.Expr:
        e = self._parse_mul()
        while self.peek().kind in _ADD_OPS:
            op = _ADD_OPS[self.next().kind]
            e = A.BinOp(op, e, self._parse_mul())
        return e

    def _parse_mul(self) -> A.Expr:
        e = self._parse_primary()
        while self.peek().kind in _MUL_OPS:
            op = _MUL_OPS[self.next().kind]
            e = A.BinOp(op, e, self._parse_primary())
        return e

    def _parse_primary(self) -> A.Expr:
        t = self.peek()
        if t.kind == "LPAREN":
            self.next()
            e = self._parse_expr()
            self.expect("RPAREN")
            return e
        if t.kind == "BOOL":
            self.next()
            return A.Const(A.Value.bool_(t.value))
        if t.kind == "INT":
            self.next()
            return A.Const(A.Value.int_(t.value))
        if t.kind == "STRING":
            self.next()
            return A.Const(A.Value.string(t.value))
        if t.kind == "IDENT":
            self.next()
            if self.accept("DOT"):
                fieldname = self.expect("IDENT").value
                return A.AttribAcc(t.value, fieldname)
            # bare variable (extension): node id, or an aggregate output
            return A.BareVar(t.value)
        raise ParseError("expected expression", t)


def parse(src: str) -> A.Prog:
    """Parse a miniGQL program text into the source AST."""
    return Parser(tokenize(src)).parse_prog()
