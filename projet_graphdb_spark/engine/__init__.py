"""Spark execution engine for miniGQL programs."""

from .executor import (
    Binding,
    ExecError,
    Executor,
    bind_params,
    binding_table,
    run_program,
)
from .session import get_spark
from .state import GraphState

__all__ = [
    "Binding",
    "bind_params",
    "ExecError",
    "Executor",
    "GraphState",
    "binding_table",
    "get_spark",
    "run_program",
]
