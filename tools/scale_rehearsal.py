"""sf1 scale rehearsal (round-4 verdict item 5): run the costliest
queries at sf0.1 AND at the 10x synthesized scale
(tools/make_scaled_sf.py), and record per-query scaling exponents —
the cheapest empirical test of every "scales to 100 TB" claim.

A query whose time grows ~10x (exponent ~1 on the 10x step) scales
linearly; >~15x earns a written cause in SCALE_REHEARSAL.md.

Usage: python tools/scale_rehearsal.py [scaled_dir] [top_n] [query ...]
Explicit query names (if given) replace the top-N-by-floor selection.
Writes /root/repo/BENCH_sf1.json (raw numbers).
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


def _time(fn, spark, sf_dir, reps: int = 2) -> float:
    """min-of-reps wall time (the host VM has documented JVM jitter
    windows; min is the standard discipline here, see bench.py)."""
    best = math.inf
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
        gc.collect()
    return round(best, 3)


def main():
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscaled"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    explicit = sys.argv[3:]
    with open(os.path.join(REPO, "BENCH.json")) as fh:
        floors = json.load(fh)["queries"]
    qs = E.queries()
    streaming = getattr(E, "STREAMING_QUERIES", frozenset())
    if explicit:
        unknown = [n for n in explicit if n not in qs]
        if unknown:
            sys.exit(f"unknown queries: {unknown}")
        # same streaming-twin exclusion as the top-N path (round-7
        # advice): naming a twin explicitly would leave its state stores
        # alive across measurements — the exact contamination the top-N
        # filter exists to avoid
        twins = [n for n in explicit if n in streaming]
        if twins:
            sys.exit(f"streaming twins excluded from rehearsal: {twins}")
        names = explicit
    else:
        # costliest first, by committed floor; skip streaming twins (their
        # state stores would outlive each measurement) — their batch twins
        # carry the same shapes
        names = [
            n
            for n, _ in sorted(floors.items(), key=lambda kv: -kv[1])
            if n in qs and n not in streaming
        ][:top_n]
    spark = get_spark(app_name="scale-rehearsal")
    try:
        E.entry(spark).count()  # warm codegen
    except Exception:
        pass
    out_path = os.path.join(REPO, "BENCH_sf1.json")
    out = {}
    try:  # merge over prior rehearsals instead of discarding them
        with open(out_path) as fh:
            out = json.load(fh).get("queries", {})
    except Exception:
        pass

    def _flush():
        # write INCREMENTALLY: one erroring query (OOM, scaled-data edge)
        # must not discard hours of prior measurements
        with open(out_path, "w") as fh:
            json.dump({"scaled_dir": scaled, "copies": 10, "queries": out}, fh, indent=1)

    for name in names:
        fn = qs[name]
        try:
            t_small = _time(fn, spark, SF01)
            t_big = _time(fn, spark, scaled)
        except Exception as ex:
            out[name] = {"error": f"{type(ex).__name__}: {str(ex)[:160]}"}
            print(f"{name:<26} ERROR {type(ex).__name__}", flush=True)
            _flush()
            continue
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        expo = round(math.log(t_big / t_small) / math.log(10), 2) if t_small > 0 else None
        out[name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "ratio_10x": ratio,
            "exponent": expo,
        }
        print(f"{name:<26} sf0.1={t_small:>8.3f}s sf1={t_big:>8.3f}s "
              f"ratio={ratio} exp={expo}", flush=True)
        _flush()
    print("wrote BENCH_sf1.json")


if __name__ == "__main__":
    main()
