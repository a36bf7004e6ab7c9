"""Round-13 quiet-window adjudication (VERDICT r12 item 1 + item 5).

Protocol (SCALE_REHEARSAL.md round-12 watch rule): best-of-6 on
e8_sessionize_stream and e26_restart_recovery — the two driver-window
rate drops that exceeded the uniform-throttle envelope — measured in the
same session as (a) e19_daily_topk_stream, the untouched Python-worker
-path streaming sibling (the host fingerprint control), and (b)
e5_window_stream, a pure-JVM streaming control.  Elevation that tracks
the sibling with healthy JVM probes is host variance; elevation that
exceeds the sibling's ratio re-opens the query body.

Also re-floors m14_image_phash_dups (best-of-4): its committed 2.368 s
floor was first measured inside the round-12 throttle epoch and the
bench note says to expect the ratchet.

Emits one JSON object to stdout and /tmp/adjudicate_r13_<tag>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from bench import probe_jvm_epoch  # noqa: E402
from projet_graphdb_spark.engine import get_spark  # noqa: E402

PLAN = [
    ("e8_sessionize_stream", 6),
    ("e26_restart_recovery", 6),
    ("e19_daily_topk_stream", 6),
    ("e5_window_stream", 6),
    ("m14_image_phash_dups", 4),
]


def spin_probe() -> float:
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i
    return round(time.time() - t0, 2)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "A"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"adjudicate-r13-{tag}")
    try:
        E.entry(spark).count()  # warm codegen/classloading off the clock
    except Exception:
        pass
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH.json")
    ) as fh:
        committed = json.load(fh)
    floors = committed.get("queries", {})
    qs = E.queries()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    out = {
        "tag": tag,
        "sf_dir": sf_dir,
        "spin_before": spin_probe(),
        "jvm_before": probe_jvm_epoch(spark),
        "queries": {},
    }
    import gc

    for name, reps in PLAN:
        fn = qs[name]
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
            gc.collect()
        best = min(samples)
        rec = {
            "samples": samples,
            "best": best,
            "floor": floors.get(name),
            # floors <= 0 (e.g. a failed-run -1.0 sentinel) are MISSING,
            # not valid denominators (round-13 advice)
            "ratio": round(best / floors[name], 3)
            if floors.get(name) and floors[name] > 0 else None,
        }
        if name in ("e8_sessionize_stream", "e26_restart_recovery"):
            rec["rows_per_sec"] = round(n_events / best, 1)
            rec["rate_floor"] = committed.get("stream_rows_per_sec", {}).get(name)
        out["queries"][name] = rec
    out["jvm_after"] = probe_jvm_epoch(spark)
    out["spin_after"] = spin_probe()
    path = f"/tmp/adjudicate_r13_{tag}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
