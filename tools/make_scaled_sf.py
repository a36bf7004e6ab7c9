"""Synthesize a larger scale factor from /root/testdata/sf0.1 for the
scale rehearsal (the driver ships sf0.001/0.01/0.1 only; BENCH scaling
exponents need a 10x point).

N key-shifted copies of each table, with two decorrelation transforms so
per-copy structure matches the source and CROSS-copy structure is noise —
a plain 10x replication would multiply every duplicate cluster by 10 and
turn pair-producing queries (near-dup, LSH, containment) quadratically
denser than a real sf1, measuring blow-up rather than scale:

* documents: every token gets a per-copy suffix (``tok`` -> ``tok_3``),
  so copy 3 is a disjoint corpus with the SAME internal dup/shingle
  structure as the source — corpus count x10, dup rate unchanged.
* embeddings: dimensions are rotated by ``7*i`` positions per copy —
  inner products (and thus kNN/cosine-dup structure) within a copy are
  exactly preserved, while cross-copy cosines decorrelate.
* region/nation are NOT scaled (TPC-H holds them fixed across SFs).

Usage: python tools/make_scaled_sf.py [dst_dir] [n_copies] [src_dir]
Defaults: /tmp/sfscaled 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from projet_graphdb_spark.engine import get_spark

# key columns to shift per copy: {table: [cols sharing the table's own key
# domain] plus foreign keys into other scaled tables}
SHIFT = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
        "l_linenumber": None,  # per-order line number: keep
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

FIXED = ["region", "nation"]


def _domain_sizes(spark, src: str) -> dict:
    """max+1 of every key domain, so copy i shifts by i*size."""
    sizes = {}
    pairs = [
        ("customer", "customer", "c_custkey"),
        ("supplier", "supplier", "s_suppkey"),
        ("part", "part", "p_partkey"),
        ("orders", "orders", "o_orderkey"),
        ("events", "events", "event_id"),
        ("events_user", "events", "user_id"),
        ("documents", "documents", "doc_id"),
        ("embeddings", "embeddings", "vec_id"),
    ]
    for dom, tbl, col in pairs:
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        sizes[dom] = df.agg(F.max(col)).collect()[0][0] + 1
    sizes["_emb_dim"] = (
        spark.read.parquet(f"{src}/embeddings.parquet")
        .select(F.size("embedding"))
        .first()[0]
    )
    return sizes


def _copy(df: DataFrame, table: str, i: int, sizes: dict) -> DataFrame:
    for col, dom in SHIFT.get(table, {}).items():
        if dom is not None:
            df = df.withColumn(col, F.col(col) + F.lit(i * sizes[dom]))
    if table == "documents" and i > 0:
        # per-copy token suffix: disjoint vocabulary, identical internal
        # structure (split keeps empty tokens so spacing survives)
        df = df.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t: F.when(t == "", t).otherwise(
                        F.concat(t, F.lit(f"_{i}"))
                    ),
                ),
                " ",
            ),
        )
    if table == "embeddings" and i > 0:
        # rotate MODULO the actual dimensionality: 7*i >= dim would make
        # the first slice empty and the "rotation" an identity, silently
        # recreating the cross-copy duplicate explosion this tool exists
        # to prevent.  (7 is coprime to any power-of-two dim, so rot hits
        # 0 only when i % dim == 0 — bump to 1 in that case.)
        dim_rot = (7 * i) % sizes["_emb_dim"] or 1
        df = df.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", dim_rot + 1, 1_000_000),
                F.slice("embedding", 1, dim_rot),
            ),
        )
    return df


def main():
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscaled"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="make-scaled-sf")
    os.makedirs(dst, exist_ok=True)
    sizes = _domain_sizes(spark, src)
    for t in FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied")
    for t in SHIFT:
        base = spark.read.parquet(f"{src}/{t}.parquet")
        out = _copy(base, t, 0, sizes)
        for i in range(1, n):
            out = out.unionByName(_copy(base, t, i, sizes))
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{n} -> {dst}/{t}.parquet")


if __name__ == "__main__":
    main()
