"""miniGQL frontend: lexer, parser, normalizer, typechecker (pure Python, no Spark)."""

from . import ast
from .lexer import LexError, tokenize
from .normalize import NormProg, normalize
from .parser import ParseError, parse
from .typecheck import TypeCheckError, typecheck


def compile_program(src: str) -> NormProg:
    """parse → normalize → typecheck; returns the validated instruction stream."""
    return typecheck(normalize(parse(src)))


__all__ = [
    "ast",
    "compile_program",
    "LexError",
    "NormProg",
    "normalize",
    "parse",
    "ParseError",
    "tokenize",
    "typecheck",
    "TypeCheckError",
]
