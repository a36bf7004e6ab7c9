"""Synthesize a SKEWED 10x scale factor for the skew rehearsal.

The plain 10x rehearsal (tools/make_scaled_sf.py) is deliberately
skew-FREE: per-copy key shifts keep every key's frequency identical to
sf0.1.  Real 100 TB corpora are not like that — power-law users, a
handful of mega-orders, boilerplate text shared by a large fraction of
documents.  This tool re-runs the same decorrelated 10x synthesis and
then reassigns a deterministic hash-selected fraction of foreign keys
(in copies 1..n-1 only) to one HOT key taken from copy 0:

* lineitem: 20% of rows -> one hot ``l_orderkey`` (a mega-order with
  ~1.2M lines at 10x) and, independently, 10% -> one hot ``l_suppkey``
  and 10% -> one hot ``l_partkey``;
* orders:   20% of rows -> one hot ``o_custkey`` (a mega-customer);
* events:   20% of rows -> one hot ``user_id`` (a bot-like mega-user);
* documents: 10% of docs get a fixed 12-token boilerplate prefix that is
  NOT per-copy-suffixed, i.e. genuinely shared across the whole corpus —
  hot shingles for the dedup family's stop-shingle caps to absorb.

Copy 0 is untouched, so every hot key still exists in its parent table
and referential integrity holds.  Selection uses ``xxhash64(row key,
seed)``: deterministic across runs, independent across the three skews.

Usage: python tools/make_skewed_sf.py [dst_dir] [n_copies] [src_dir]
Defaults: /tmp/sfskew 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import make_scaled_sf as uniform
from projet_graphdb_spark.engine import get_spark

BOILERPLATE = (
    "terms of service apply contact support for details all rights "
    "reserved subscribe now"
)

# {table: [(select_cols_for_hash, target_col, hot_value_key, pct, seed)]}
# hot_value_key indexes into the hot-key dict collected from copy 0.
SKEWS = {
    "lineitem": [
        (["l_orderkey", "l_linenumber"], "l_orderkey", "hot_orderkey", 20, 1),
        (["l_orderkey", "l_linenumber"], "l_suppkey", "hot_suppkey", 10, 2),
        (["l_orderkey", "l_linenumber"], "l_partkey", "hot_partkey", 10, 6),
    ],
    "orders": [(["o_orderkey"], "o_custkey", "hot_custkey", 20, 3)],
    "events": [(["event_id"], "user_id", "hot_user", 20, 4)],
}


def _hot_keys(spark, src: str) -> dict:
    """One hot key per skewed domain, taken from copy 0 (= the source
    keys, which make_scaled_sf leaves unshifted in copy 0)."""
    row = lambda tbl, col: (  # noqa: E731
        spark.read.parquet(f"{src}/{tbl}.parquet").agg(F.min(col)).first()[0]
    )
    return {
        "hot_orderkey": row("orders", "o_orderkey"),
        "hot_suppkey": row("supplier", "s_suppkey"),
        "hot_partkey": row("part", "p_partkey"),
        "hot_custkey": row("customer", "c_custkey"),
        "hot_user": row("events", "user_id"),
    }


def _skew(df: DataFrame, table: str, i: int, hot: dict) -> DataFrame:
    """Apply the table's skew rules to copy i (no-op for copy 0)."""
    if i == 0:
        return df
    for hash_cols, target, hot_key, pct, seed in SKEWS.get(table, []):
        sel = (
            F.pmod(F.xxhash64(*hash_cols, F.lit(seed)), F.lit(100)) < pct
        )
        df = df.withColumn(
            target, F.when(sel, F.lit(hot[hot_key])).otherwise(F.col(target))
        )
    if table == "documents":
        sel = F.pmod(F.xxhash64("doc_id", F.lit(5)), F.lit(100)) < 10
        df = df.withColumn(
            "text",
            F.when(
                sel, F.concat(F.lit(BOILERPLATE + " "), F.col("text"))
            ).otherwise(F.col("text")),
        )
    return df


def main():
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="make-skewed-sf")
    os.makedirs(dst, exist_ok=True)
    sizes = uniform._domain_sizes(spark, src)
    hot = _hot_keys(spark, src)
    print(f"hot keys: {hot}")
    for t in uniform.FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied")
    for t in uniform.SHIFT:
        base = spark.read.parquet(f"{src}/{t}.parquet")
        out = _skew(uniform._copy(base, t, 0, sizes), t, 0, hot)
        for i in range(1, n):
            out = out.unionByName(_skew(uniform._copy(base, t, i, sizes), t, i, hot))
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{n} skewed -> {dst}/{t}.parquet")
    # report realized hot-key shares so the rehearsal doc can cite them
    for tbl, col, key in [
        ("lineitem", "l_orderkey", "hot_orderkey"),
        ("lineitem", "l_suppkey", "hot_suppkey"),
        ("orders", "o_custkey", "hot_custkey"),
        ("events", "user_id", "hot_user"),
    ]:
        df = spark.read.parquet(f"{dst}/{tbl}.parquet")
        total = df.count()
        hot_n = df.filter(F.col(col) == hot[key]).count()
        print(f"{tbl}.{col}: hot share {hot_n}/{total} = {hot_n/total:.1%}")


if __name__ == "__main__":
    main()
