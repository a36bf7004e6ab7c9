"""Bulk graph sources: parquet star-schema → GraphState."""

from .parquet_graph import OFFSETS, TPCH_TYPE_GRAPH, load_tpch_graph

__all__ = ["OFFSETS", "TPCH_TYPE_GRAPH", "load_tpch_graph"]
