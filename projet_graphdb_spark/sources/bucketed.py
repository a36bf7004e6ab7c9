"""Bucketed-table layout: the shuffle-free co-located join.

The reference has no storage layout surface at all (its only source is
the .q script text); this is the Spark-native capability that matters
most at warehouse scale: write both sides of a hot join **bucketed by
the join key** so every later join between them is pre-partitioned —
the SortMergeJoin reads bucket i of one table against bucket i of the
other and NO Exchange appears in the plan.

At 100 TB this is the difference between re-shuffling a fact table for
every query and shuffling it once at ingest: a 100-billion-row
lineitem bucketed by orderkey joins orders (bucketed the same way)
with zero network movement; only the final small-key aggregate
exchanges.  Bucket count is chosen at write time to keep each bucket
file in the hundreds-of-MB range (here a test-scale constant).

``tests/test_plans.py`` pins the no-Exchange-before-join property.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as an external bucketed+sorted table at ``path``.

    ``bucketBy(key) + sortBy(key)`` persists the hash-partitioned,
    in-bucket-sorted layout; a later equi-join on ``key`` between two
    tables written with the SAME bucket count skips both the Exchange
    and (with sortBy) the Sort.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", os.path.join(path, name))
        .format("parquet")
        .saveAsTable(name)
    )


_PAIR_CACHE: dict = {}


def bucketed_pair(
    spark: SparkSession,
    orders: DataFrame,
    lineitem: DataFrame,
    path: str,
    n_buckets: int = 8,
    cache_key: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Materialize orders + lineitem bucketed by orderkey and return the
    catalog-backed frames (whose scans carry the bucket layout).

    With ``cache_key`` the ingest is memoized per (session, key): the
    bucketed layout is written ONCE per session — exactly the
    shuffle-once-at-ingest economics the layout exists for — and later
    calls reuse the catalog tables."""
    if cache_key is not None:
        k = (spark.sparkContext.applicationId, cache_key, n_buckets)
        if k in _PAIR_CACHE:
            return _PAIR_CACHE[k]
    spark.sql("DROP TABLE IF EXISTS _bk_orders")
    spark.sql("DROP TABLE IF EXISTS _bk_lineitem")
    write_bucketed(orders, "_bk_orders", path, "o_orderkey", n_buckets)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "_bk_lineitem",
        path,
        "o_orderkey",
        n_buckets,
    )
    out = spark.table("_bk_orders"), spark.table("_bk_lineitem")
    if cache_key is not None:
        if len(_PAIR_CACHE) > 16:
            _PAIR_CACHE.clear()
        _PAIR_CACHE[k] = out
    return out
