"""Graph + binding-table state, held as DataFrames.

The reference keeps ``State(graph, table, max_node_id)`` as in-memory
OCaml lists (``graphDB/lib/sem.ml:41-43``).  Here:

* the node set is **one DataFrame per declared label** with real typed
  columns (``_id: long`` + one nullable column per declared attribute —
  BooleanType/LongType/StringType from the type graph).  Per-label typed
  tables beat a single ``map<string,string>`` props column at scale:
  filters on attributes are plain typed column predicates that Catalyst
  pushes into scans, and there is no per-row map materialization.
* the edge set is a single ``DataFrame[src long, rel string, dst long]``,
  kept duplicate-free to mirror the reference's set semantics
  (``graphDB/lib/graphstruct.ml:30-32``).
* the binding table (``sem.ml:19``) is a DataFrame with one internal
  column per bound variable.  Internal names (``_v0, _v1, ...``) decouple
  Spark's unique-column-name constraint from miniGQL's legal variable
  rebinding; an ordered env list (most recent first) maps variable name →
  (internal column, static label).
* ``next_id`` is a driver-side counter (queries are sequential scripts,
  so id allocation is inherently driver-coordinated).  We advance it by
  the number of created rows — the *sane* semantics; the reference bumps
  it by 1 regardless (counter bug at ``sem.ml:45-51``), which only
  matters for multi-row creates that none of its tests exercise.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..frontend import ast as A

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("rel", T.StringType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

_SPARK_TYPE = {
    A.AttribType.BOOL: T.BooleanType(),
    A.AttribType.INT: T.LongType(),
    A.AttribType.STRING: T.StringType(),
}


def spark_type_of(tp: A.AttribType) -> T.DataType:
    return _SPARK_TYPE[tp]


def node_schema(decl: A.NodeTypeDecl) -> T.StructType:
    fields = [T.StructField("_id", T.LongType(), False)]
    for fname, ftp in decl.attrs:
        fields.append(T.StructField(fname, _SPARK_TYPE[ftp], True))
    return T.StructType(fields)


@dataclass
class GraphState:
    """Mutable engine state threaded through instruction execution."""

    spark: SparkSession
    types: A.TypeGraph
    nodes: dict = field(default_factory=dict)  # label -> DataFrame
    edges: DataFrame = None
    next_id: int = 0

    @staticmethod
    def empty(spark: SparkSession, types: A.TypeGraph) -> "GraphState":
        from .localrel import local_df

        nodes = {decl.label: local_df(spark, [], node_schema(decl)) for decl in types.nodes}
        edges = local_df(spark, [], EDGE_SCHEMA)
        return GraphState(spark, types, nodes, edges, 0)

    # -- snapshot helpers (for golden tests / display) ----------------------

    def collect_nodes(self) -> dict:
        """label -> {id: {attr: value}} with unset (null) attrs omitted."""
        out = {}
        for label, df in self.nodes.items():
            rows = df.collect()
            out[label] = {
                r["_id"]: {k: v for k, v in r.asDict().items() if k != "_id" and v is not None}
                for r in rows
            }
        return out

    def collect_edges(self) -> set:
        return {(r["src"], r["rel"], r["dst"]) for r in self.edges.collect()}

    def nodes_long(self) -> DataFrame:
        """All nodes as DataFrame[_id, label] (attribute-free union view)."""
        dfs = [
            df.select("_id", F.lit(label).alias("label")) for label, df in self.nodes.items()
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
