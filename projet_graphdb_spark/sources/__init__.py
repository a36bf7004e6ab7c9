"""Bulk graph sources/sinks: parquet star-schema → GraphState, and
durable GraphState persistence."""

from .graph_io import load_graph, save_graph
from .parquet_graph import OFFSETS, TPCH_TYPE_GRAPH, load_tpch_graph

__all__ = ["OFFSETS", "TPCH_TYPE_GRAPH", "load_graph", "load_tpch_graph", "save_graph"]
