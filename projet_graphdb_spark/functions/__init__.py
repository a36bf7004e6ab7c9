"""Large-scale training-data pipeline operators (Spark-native extensions).

These go beyond the reference's query surface (SURVEY §2.2 negative
inventory): deduplication, similarity search, text analysis, multimodal
column plumbing.  All are built on built-in ``pyspark.sql.functions``
(JVM-side, whole-stage codegen) except where Python is unavoidable, in
which case Arrow-batched Pandas UDFs are used.
"""

from . import asof, dedup, multimodal, relational, similarity, text

__all__ = ["asof", "dedup", "multimodal", "relational", "similarity", "text"]
