"""projet_graphdb_spark — a PySpark-native property-graph query engine.

A brand-new engine with the query and data-processing capabilities of the
reference miniGQL interpreter (Metheor31Game/Projet_GraphDB), re-expressed
Spark-first: the graph lives in DataFrames (typed per-label node tables +
one edge table), the binding table is a DataFrame, and every miniGQL
instruction lowers to declarative DataFrame transformations so Catalyst
performs predicate pushdown, join selection and column pruning.

Layout:
  frontend/   lexer, parser, normalizer, typechecker (pure Python)
  engine/     GraphState + instruction executor (DataFrame ops)
  sources/    bulk graph loaders (parquet star-schema → graph)
  functions/  dedup, similarity, text analysis, multimodal plumbing
  streaming/  Structured Streaming operators over the events table
"""

__version__ = "0.1.0"
