"""Local-relation DataFrames for small literal data.

``spark.createDataFrame(list)`` in PySpark builds a Python-RDD-backed scan
(``Scan ExistingRDD``): unknown size statistics (so Catalyst never
auto-broadcasts it) and a Python serialization round-trip on every stage
that reads it.  For the small literal relations this engine materializes
(folded script graphs, seed binding rows), a SQL ``VALUES`` clause is the
right representation: it becomes a Catalyst ``LocalRelation`` with exact
statistics — joins against it broadcast, and constant folding sees the
rows.

Only used for driver-literal data (bounded by script size); bulk data
comes from parquet scans which already carry statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SQL_TYPE = {
    T.BooleanType(): "BOOLEAN",
    T.IntegerType(): "INT",
    T.LongType(): "BIGINT",
    T.DoubleType(): "DOUBLE",
    T.StringType(): "STRING",
}


def _sql_type(dt: T.DataType) -> str:
    try:
        return _SQL_TYPE[dt]
    except KeyError:
        raise TypeError(f"unsupported local-relation type {dt}")


def _sql_literal(v, dt: T.DataType) -> str:
    if v is None:
        return f"CAST(NULL AS {_sql_type(dt)})"
    if isinstance(dt, T.BooleanType):
        return "true" if v else "false"
    if isinstance(dt, (T.IntegerType, T.LongType)):
        return str(int(v))
    if isinstance(dt, T.DoubleType):
        return repr(float(v))
    if isinstance(dt, T.StringType):
        escaped = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    raise TypeError(f"unsupported literal type {dt}")


def local_df(spark: SparkSession, rows: list, schema: T.StructType) -> DataFrame:
    """A LocalRelation-backed DataFrame with the given rows and schema.

    ``rows``: list of tuples aligned with ``schema`` fields; may be empty.
    """
    names = [f.name for f in schema.fields]
    casts = ", ".join(
        f"CAST(c{i} AS {_sql_type(f.dataType)}) AS `{f.name}`"
        for i, f in enumerate(schema.fields)
    )
    cols = ", ".join(f"c{i}" for i in range(len(names)))
    if not rows:
        dummy = ", ".join(_sql_literal(None, f.dataType) for f in schema.fields)
        sql = f"SELECT {casts} FROM (VALUES ({dummy})) AS t({cols}) WHERE 1=0"
        return spark.sql(sql)
    values = ", ".join(
        "(" + ", ".join(_sql_literal(v, f.dataType) for v, f in zip(row, schema.fields)) + ")"
        for row in rows
    )
    sql = f"SELECT {casts} FROM (VALUES {values}) AS t({cols})"
    return spark.sql(sql)
