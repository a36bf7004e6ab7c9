"""Synthesize a SECOND-decade (30x) scale point for the dedup/ANN
leaders only (round-6 verdict item 5): the 10x rehearsal validated
scaling exponents, but quadratic Σ bucket² terms would first dominate a
decade later.  Only ``documents`` and ``embeddings`` are scaled — the
five costliest d/s queries read nothing else — with the same
decorrelation transforms as tools/make_scaled_sf.py (per-copy token
suffix, per-copy dimension rotation); the other tables are symlinked
from the source so the directory satisfies any loader that lists it.

Usage: python tools/make_scaled_ds.py [dst_dir] [n_copies] [src_dir]
Defaults: /tmp/sf30ds 30 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import make_scaled_sf as uniform  # noqa: E402
from projet_graphdb_spark.engine import get_spark  # noqa: E402


def main():
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf30ds"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="make-scaled-ds")
    os.makedirs(dst, exist_ok=True)
    sizes = uniform._domain_sizes(spark, src)
    for t in ("documents", "embeddings"):
        base = spark.read.parquet(f"{src}/{t}.parquet")
        out = uniform._copy(base, t, 0, sizes)
        for i in range(1, n):
            out = out.unionByName(uniform._copy(base, t, i, sizes))
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{n} -> {dst}/{t}.parquet", flush=True)
    for t in uniform.FIXED + [
        t for t in uniform.SHIFT if t not in ("documents", "embeddings")
    ]:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
        print(f"{t}: symlinked (unscaled — not read by d/s queries)", flush=True)


if __name__ == "__main__":
    main()
