"""30x scale point for the de-hinted x-forms (round-7 verdict item 3):
round 8 replaced unconditional F.broadcast on SF-linear sides with the
size-gated relational.maybe_broadcast, which changes physical plans —
so the five costliest affected TPC-H forms re-measure their scaling
exponents at 30x (tables scaled by tools/make_scaled_sf.py with
key-shifted copies; region/nation stay fixed per TPC-H).

exponent = log(t30/t01)/log(30): ~1 is linear, >1.1 earns a written
cause.  Each entry also records the maybe_broadcast GATE TRACE at both
scale points — (estimate_bytes, hinted) per gated side — so the
artifact shows the gate transitioning where it should (x57's per-part
counts estimate crosses the 32 MiB gate at 30x and the hint drops;
the base-dim hints stay on).

Results merge into BENCH_sf1.json under "x_dehinted_30x".

Usage: python tools/x_dehinted_30x.py [scaled_dir] [query ...]
Defaults: /tmp/sf30x and the five forms the verdict names.
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
from projet_graphdb_spark.functions import relational  # noqa: E402

SF01 = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = [
    "x14_shipping_priority",
    "x20_large_volume_orders",
    "x29_market_share",
    "x45_product_profit",
    "x57_copurchase_pairs",
]


def _run(fn, spark, sf_dir, reps: int = 2):
    """(min-of-reps wall, gate trace of the last build)."""
    best = math.inf
    trace = None
    for _ in range(reps):
        relational._GATE_TRACE = []
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
        trace = list(relational._GATE_TRACE)
        relational._GATE_TRACE = None
        gc.collect()
    return round(best, 3), trace


def main():
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf30x"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark(app_name="x-dehinted-30x")
    qs = E.queries()
    out_path = os.path.join(REPO, "BENCH_sf1.json")
    try:
        with open(out_path) as fh:
            doc = json.load(fh)
    except Exception:
        doc = {}
    section = doc.setdefault("x_dehinted_30x", {"scaled_dir": scaled, "copies": 30})
    for name in names:
        fn = qs[name]
        t01, tr01 = _run(fn, spark, SF01)
        t30, tr30 = _run(fn, spark, scaled)
        expo = round(math.log(t30 / t01) / math.log(30), 2) if t01 > 0 else None
        section[name] = {
            "sf0.1_sec": t01,
            "sf3_sec": t30,
            "ratio_30x": round(t30 / t01, 2) if t01 > 0 else None,
            "exponent": expo,
            "gate_sf0.1": tr01,
            "gate_30x": tr30,
        }
        print(
            f"{name:<26} sf0.1={t01:>7.3f}s 30x={t30:>8.3f}s exp={expo} "
            f"gate30x={tr30}",
            flush=True,
        )
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)
    print("merged into BENCH_sf1.json[x_dehinted_30x]")


if __name__ == "__main__":
    main()
