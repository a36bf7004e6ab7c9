"""Project the TPC-H-ish parquet star schema into the engine's graph model.

The reference can only *build* graphs from literal ``create`` clauses
(``interf.ml:38-47`` — the .q text is its sole ingest path).  The
Spark-native generalization is bulk loading: node tables come straight
from parquet scans (predicate pushdown + column pruning reach the files),
edges from foreign-key projections.

Design for scale:

* **Node ids are pure arithmetic** over the table keys (disjoint offset
  ranges per label) — no window, no shuffle, no driver coordination,
  fully deterministic and reproducible across runs/partitions.  At 100 TB
  the id assignment is a map-only expression fused into the scan.
* **Edges are FK projections** — again map-only; no dedup pass is needed
  because key columns are unique in their tables.
* The edge DataFrame is a lazy union of per-relation projections; a
  query on one relation label prunes to that branch (Catalyst pushes the
  ``rel = 'x'`` filter into each union child, collapsing the others to
  empty scans).

Offsets leave room for ~90M orders per unit scale factor; raise them if
you load beyond sf ~100 (they only need to keep ranges disjoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..frontend import ast as A
from ..engine.localrel import local_df
from ..engine.state import GraphState, node_schema

# id = key + offset, per label — disjoint ranges
OFFSETS = {
    "Region": 0,  # 5 rows
    "Nation": 100,  # 25 rows
    "Supplier": 10_000,
    "Customer": 1_000_000,
    "Order": 10_000_000,
    "Part": 200_000_000,
}
NEXT_ID_BASE = 1_000_000_000  # fresh ids allocated above all loaded ranges

_T = A.AttribType

TPCH_TYPE_GRAPH = A.TypeGraph(
    nodes=[
        A.NodeTypeDecl("Region", (("name", _T.STRING),)),
        A.NodeTypeDecl("Nation", (("name", _T.STRING), ("nationkey", _T.INT))),
        A.NodeTypeDecl(
            "Supplier", (("name", _T.STRING), ("suppkey", _T.INT))
        ),
        A.NodeTypeDecl(
            "Customer",
            (("name", _T.STRING), ("mktsegment", _T.STRING), ("custkey", _T.INT)),
        ),
        A.NodeTypeDecl(
            "Order",
            (("orderstatus", _T.STRING), ("priority", _T.STRING), ("orderkey", _T.INT)),
        ),
        A.NodeTypeDecl(
            "Part",
            (("name", _T.STRING), ("brand", _T.STRING), ("size", _T.INT)),
        ),
        A.NodeTypeDecl("Hub", ()),  # attribute-less type for create-node tests
    ],
    rels=[
        A.RelTypeDecl("Customer", "in_nation", "Nation"),
        A.RelTypeDecl("Supplier", "in_nation", "Nation"),
        A.RelTypeDecl("Nation", "in_region", "Region"),
        A.RelTypeDecl("Order", "placed_by", "Customer"),
        A.RelTypeDecl("Supplier", "serves", "Customer"),
        A.RelTypeDecl("Hub", "routes", "Region"),
        A.RelTypeDecl("Region", "has_hub", "Hub"),
    ],
)


def _id(col: str, label: str):
    return (F.col(col).cast("long") + F.lit(OFFSETS[label])).alias("_id")


# (session id, sf_dir) -> (nodes dict, edges).  DataFrames are immutable
# plans, so sharing them across queries is safe; each caller gets a
# FRESH GraphState whose nodes dict is a shallow copy — engine mutations
# replace dict entries / the edges field and never leak across queries.
_LOAD_CACHE: dict = {}


def load_tpch_graph(spark: SparkSession, sf_dir: str, fmt: str = "parquet") -> GraphState:
    """Build a GraphState over the star schema at ``sf_dir``.

    ``fmt``: ``parquet`` (columnar scan — pushdown + pruning reach the
    files), ``csv`` (header row, schema inferred then key columns cast)
    or ``json`` (lines).  Non-parquet formats exist for interchange —
    at 100 TB, land them into parquet first; the projections after the
    read are format-agnostic.

    The underlying frames are memoized per (session, dir, fmt) — the
    shared-catalog pattern: repeated queries skip re-deriving identical
    scan plans (driver-side py4j churn, not cluster work).
    """
    # applicationId is stable for the session's lifetime and never reused
    # by a later session (unlike id(spark), which CPython recycles after
    # GC — a recycled id would hand out frames bound to a dead context)
    key = (spark.sparkContext.applicationId, sf_dir, fmt)
    if key in _LOAD_CACHE:
        nodes, edges = _LOAD_CACHE[key]
        return GraphState(spark, TPCH_TYPE_GRAPH, dict(nodes), edges, NEXT_ID_BASE)
    state = _build_tpch_graph(spark, sf_dir, fmt)
    if len(_LOAD_CACHE) > 64:  # bound growth across many sessions
        _LOAD_CACHE.clear()
    _LOAD_CACHE[key] = (dict(state.nodes), state.edges)
    return state


def _read_table(spark: SparkSession, sf_dir: str, name: str, fmt: str):
    if fmt == "parquet":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if fmt == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(
            f"{sf_dir}/{name}.csv"
        )
    if fmt == "json":
        return spark.read.json(f"{sf_dir}/{name}.json")
    if fmt == "orc":
        # columnar like parquet: predicate pushdown + column pruning
        # reach the files through Spark's native ORC reader
        return spark.read.orc(f"{sf_dir}/{name}.orc")
    raise ValueError(f"unknown table format {fmt!r}")


def _build_tpch_graph(spark: SparkSession, sf_dir: str, fmt: str = "parquet") -> GraphState:
    region = _read_table(spark, sf_dir, "region", fmt)
    nation = _read_table(spark, sf_dir, "nation", fmt)
    supplier = _read_table(spark, sf_dir, "supplier", fmt)
    customer = _read_table(spark, sf_dir, "customer", fmt)
    orders = _read_table(spark, sf_dir, "orders", fmt)
    part = _read_table(spark, sf_dir, "part", fmt)

    nodes = {
        "Region": region.select(_id("r_regionkey", "Region"), F.col("r_name").alias("name")),
        "Nation": nation.select(
            _id("n_nationkey", "Nation"),
            F.col("n_name").alias("name"),
            F.col("n_nationkey").cast("long").alias("nationkey"),
        ),
        "Supplier": supplier.select(
            _id("s_suppkey", "Supplier"),
            F.col("s_name").alias("name"),
            F.col("s_suppkey").cast("long").alias("suppkey"),
        ),
        "Customer": customer.select(
            _id("c_custkey", "Customer"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("c_custkey").cast("long").alias("custkey"),
        ),
        "Order": orders.select(
            _id("o_orderkey", "Order"),
            F.col("o_orderstatus").alias("orderstatus"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").cast("long").alias("orderkey"),
        ),
        "Part": part.select(
            _id("p_partkey", "Part"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("brand"),
            F.col("p_size").cast("long").alias("size"),
        ),
        "Hub": local_df(
            spark, [], node_schema(next(d for d in TPCH_TYPE_GRAPH.nodes if d.label == "Hub"))
        ),
    }

    def edge(df: DataFrame, src_col: str, src_label: str, rel: str, dst_col: str, dst_label: str):
        return df.select(
            (F.col(src_col).cast("long") + F.lit(OFFSETS[src_label])).alias("src"),
            F.lit(rel).alias("rel"),
            (F.col(dst_col).cast("long") + F.lit(OFFSETS[dst_label])).alias("dst"),
        )

    edges = (
        edge(customer, "c_custkey", "Customer", "in_nation", "c_nationkey", "Nation")
        .unionByName(edge(supplier, "s_suppkey", "Supplier", "in_nation", "s_nationkey", "Nation"))
        .unionByName(edge(nation, "n_nationkey", "Nation", "in_region", "n_regionkey", "Region"))
        .unionByName(edge(orders, "o_orderkey", "Order", "placed_by", "o_custkey", "Customer"))
    )
    return GraphState(spark, TPCH_TYPE_GRAPH, nodes, edges, NEXT_ID_BASE)
