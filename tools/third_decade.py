"""Third-decade (100x) scale point for headline batch shapes: sf0.1 →
/tmp/sf100x (100 key-shifted copies via tools/make_scaled_sf.py ≈ sf10,
60M lineitem rows).  Two decades in one ratio: exponent =
log(t100/t01)/log(100) — the strongest single-machine answer available
to "would this survive 100x?", the question the 100 TB brief grades.

Defaults cover one of each execution shape: scan-aggregate (x1),
grouping sets (x96), as-of join (x5), salted skew aggregate (x8),
window latest-per-key (x42), banded MinHash near-dup (d3), inverted
shingle index (d6), batch sessionization window (e2), and the keyed
self-join market-basket form at the gate transition (x57).

Results merge into BENCH_sf1.json under "third_decade_100x".

Usage: python tools/third_decade.py [scaled_dir] [query ...]
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from projet_graphdb_spark.engine import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = [
    "x1_pricing_summary",
    "x96_cube_pricing",
    "x5_asof_join",
    "x8_skew_agg",
    "x42_latest_per_key",
    "d3_minhash_lsh",
    "d6_passage_dups",
    "e2_sessionize",
    "x57_copurchase_pairs",
]


def _time(fn, spark, sf_dir, reps: int = 2) -> float:
    best = math.inf
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
        gc.collect()
    return round(best, 3)


def main():
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100x"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark(app_name="third-decade")
    qs = E.queries()
    out_path = os.path.join(REPO, "BENCH_sf1.json")
    try:
        with open(out_path) as fh:
            doc = json.load(fh)
    except Exception:
        doc = {}
    section = doc.setdefault(
        "third_decade_100x", {"scaled_dir": scaled, "copies": 100}
    )
    for name in names:
        fn = qs[name]
        try:
            t01 = _time(fn, spark, SF01)
            t100 = _time(fn, spark, scaled)
        except Exception as ex:
            section[name] = {"error": f"{type(ex).__name__}: {str(ex)[:160]}"}
            print(f"{name:<26} ERROR {type(ex).__name__}", flush=True)
            with open(out_path, "w") as fh:
                json.dump(doc, fh, indent=1)
            continue
        expo = round(math.log(t100 / t01) / math.log(100), 2) if t01 > 0 else None
        section[name] = {
            "sf0.1_sec": t01,
            "sf10_sec": t100,
            "ratio_100x": round(t100 / t01, 2) if t01 > 0 else None,
            "exponent": expo,
        }
        print(
            f"{name:<26} sf0.1={t01:>7.3f}s 100x={t100:>9.3f}s exp={expo}",
            flush=True,
        )
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
    print("merged into BENCH_sf1.json[third_decade_100x]")


if __name__ == "__main__":
    main()
