"""Tokenizer for miniGQL.

Token set mirrors the reference lexer (``graphDB/lib/lexer.mll:29-85``):
whitespace and ``(* ... *)`` comments skipped, decimal integer literals,
``"alnum + space"`` string literals (lexer.mll:24-27), punctuation,
arithmetic/comparison/logic operators, keywords, identifiers
``[a-zA-Z][a-zA-Z0-9]*``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .ast import AttribType


class LexError(Exception):
    def __init__(self, msg: str, line: int, col: int):
        super().__init__(f"lex error at {line}:{col}: {msg}")
        self.line = line
        self.col = col


@dataclass(frozen=True)
class Token:
    kind: str  # e.g. "IDENT", "INT", "STRING", "BOOL", "TP", "LPAREN", ...
    value: object  # payload for IDENT/INT/STRING/BOOL/TP, else the lexeme
    line: int
    col: int

    def __repr__(self) -> str:
        return f"{self.kind}({self.value!r})@{self.line}:{self.col}"


KEYWORDS = {
    "create": "CREATE",
    "delete": "DELETE",
    "match": "MATCH",
    "return": "RETURN",
    "set": "SET",
    "where": "WHERE",
    "mod": "MOD",
    "and": "AND",
    "or": "OR",
    # extensions (absent from lexer.mll): optional match / not exists,
    # aggregates in return
    "optional": "OPTIONAL",
    "merge": "MERGE",
    "not": "NOT",
    "exists": "EXISTS",
    "union": "SETOP",
    "intersect": "SETOP",
    "except": "SETOP",
    "distinct": "DISTINCT",
    "order": "ORDER",
    "by": "BY",
    "limit": "LIMIT",
    "asc": "ASC",
    "desc": "DESC",
    "count": "AGGFN",
    "sum": "AGGFN",
    "min": "AGGFN",
    "max": "AGGFN",
    "avg": "AGGFN",
}

# Multi-char operators first so they win over single-char prefixes.
_PUNCT = [
    ("->", "ARROW"),
    ("..", "DOTDOT"),
    (">=", "GE"),
    ("<=", "LE"),
    ("<>", "NE"),
    ("{", "LBRACE"),
    ("}", "RBRACE"),
    ("[", "LBRACKET"),
    ("]", "RBRACKET"),
    ("(", "LPAREN"),
    (")", "RPAREN"),
    (".", "DOT"),
    (",", "COMMA"),
    (":", "COLON"),
    ("+", "ADD"),
    ("-", "SUB"),
    ("*", "MUL"),
    ("/", "DIV"),
    ("=", "EQ"),
    (">", "GT"),
    ("<", "LT"),
]

# Engine extension over the reference (lexer.mll:29-85): identifiers and
# strings additionally allow '_' so bulk-loaded labels/values
# (in_nation, NATION_3) are expressible; the reference corpus uses none.
_IDENT_RE = re.compile(r"[A-Za-z][A-Za-z0-9_]*")
_INT_RE = re.compile(r"0|[1-9][0-9]*")
# Strings are restricted to letters, digits, blanks (lexer.mll:24-27) + '_'.
_STRING_RE = re.compile(r'"([A-Za-z0-9 _]*)"')

_TYPE_NAMES = {"bool": AttribType.BOOL, "int": AttribType.INT, "string": AttribType.STRING}


def tokenize(src: str) -> list:
    """Return the token list for ``src``, ending with an EOF token."""
    tokens: list = []
    i, n = 0, len(src)
    line, bol = 1, 0  # current line number, offset of beginning-of-line

    def col(pos: int) -> int:
        return pos - bol + 1

    while i < n:
        c = src[i]
        if c in " \t\r":
            i += 1
            continue
        if c == "\n":
            i += 1
            line += 1
            bol = i
            continue
        if src.startswith("(*", i):
            end = src.find("*)", i + 2)
            if end == -1:
                raise LexError("unterminated comment", line, col(i))
            line += src.count("\n", i, end)
            if "\n" in src[i:end]:
                bol = i + src.rfind("\n", i, end) - i + 1
            i = end + 2
            continue
        if c == '"':
            m = _STRING_RE.match(src, i)
            if not m:
                raise LexError("malformed string literal (only [A-Za-z0-9 ] allowed)", line, col(i))
            tokens.append(Token("STRING", m.group(1), line, col(i)))
            i = m.end()
            continue
        if c.isdigit():
            m = _INT_RE.match(src, i)
            if not m:
                raise LexError(f"malformed integer at {src[i:i+10]!r}", line, col(i))
            tokens.append(Token("INT", int(m.group(0)), line, col(i)))
            i = m.end()
            continue
        if c.isalpha():
            m = _IDENT_RE.match(src, i)
            word = m.group(0)
            if word == "true":
                tokens.append(Token("BOOL", True, line, col(i)))
            elif word == "false":
                tokens.append(Token("BOOL", False, line, col(i)))
            elif word in _TYPE_NAMES:
                tokens.append(Token("TP", _TYPE_NAMES[word], line, col(i)))
            elif word in KEYWORDS:
                tokens.append(Token(KEYWORDS[word], word, line, col(i)))
            else:
                tokens.append(Token("IDENT", word, line, col(i)))
            i = m.end()
            continue
        matched = False
        for lexeme, kind in _PUNCT:
            if src.startswith(lexeme, i):
                tokens.append(Token(kind, lexeme, line, col(i)))
                i += len(lexeme)
                matched = True
                break
        if not matched:
            raise LexError(f"unrecognized symbol {c!r}", line, col(i))
    tokens.append(Token("EOF", None, line, col(i)))
    return tokens
