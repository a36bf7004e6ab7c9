"""Second-decade (30x) scale point for the dedup/ANN leaders (round-6
verdict item 5): the 10x rehearsal validated first-decade exponents;
this measures the five costliest d/s queries at 30x (documents +
embeddings scaled by tools/make_scaled_ds.py — the only tables the d/s
family reads) to confirm the Σ bucket² terms stay tamed where a hidden
quadratic would now dominate: a query with true cost n^a shows
ratio ≈ 30^a, so exponent = log(t30/t01)/log(30) should match the
first-decade figure, not exceed it.

Results merge into BENCH_sf1.json under "second_decade".

``--auto`` instead measures the library-default SCALE paths for the
two near-dup leaders (the registered s9/d10 pin 8x6 SRP bands for
oracle parity).  Three-way A/B at the same 30x point:

* ``s9_auto_lsh_cosine_dups`` — ``lsh_cosine_dups(bands=None)``: LSH
  with N-derived bits AND recall-holding band count.  Measured WORSE
  than pinned (exp 1.42 vs 1.13): at threshold 0.4 holding recall
  costs 64 bands x 10 bits, a bigger candidate volume than the
  quadratic it fixes — the motivating datapoint for the router.
* ``s9_routed_cosine_dups`` / ``d10_routed_semantic_dedup`` — the
  ``cosine_dups_auto`` strategy router, which at threshold 0.4 picks
  k-means (IVF) blocking (candidates ~ nprobe^2 * cell_rows * N / 2,
  linear in N) and CALIBRATES recall per nprobe level from a bounded
  sample, escalating nprobe toward the target and WARNING with the
  achieved figure when the target is out of reach (at t=0.4 on this
  corpus it is: the measured frontier tops out well below 0.95 —
  weakly-similar 64-d pairs are near-random to any blocking scheme).
* ``s9_routed_best_effort`` — the same router asked for
  target_recall=0.25: the explicit SemDeDup-style posture, showing the
  recall dial buys back the cost.

Each routed entry records the router's receipt (picked nprobe +
calibrated recall at the 30x point) so the speed number can never be
quoted without the recall it paid for.

Results merge under "second_decade"."auto_path".

Usage: python tools/second_decade.py [scaled_dir] [query ...]
       python tools/second_decade.py --auto [scaled_dir]
Defaults: /tmp/sf30ds, the five d/s floor leaders.
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
LEADERS = [
    "d10_semantic_dedup", "d24_blocking_candidates", "s9_lsh_cosine_dups",
    "s12_knn_ivfpq", "d15_lsh_calibration",
]


def _time(fn, spark, sf_dir, reps: int = 2) -> float:
    best = math.inf
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
        gc.collect()
    return round(best, 3)


def _auto_queries():
    """The s9/d10 pipelines with the library-default ``bands=None``
    (srp_auto_bits + srp_auto_n_bands) instead of the oracle-pinned
    8x6 construction — the configuration a user at a NEW scale gets."""
    from pyspark.sql import functions as F  # noqa: F401

    from projet_graphdb_spark.functions import similarity

    def _emb(spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    import warnings

    def _routed(name, **kw):
        def fn(spark, sf_dir):
            receipt = RECEIPTS.setdefault(name, {})
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # the under-target warn is
                # the measurement here; the receipt records it
                return similarity.cosine_dups_auto(
                    _emb(spark, sf_dir), threshold=0.4, plan_out=receipt, **kw
                )
        return fn

    return {
        "s9_auto_lsh_cosine_dups": lambda spark, sf_dir: similarity.lsh_cosine_dups(
            _emb(spark, sf_dir), bands=None, threshold=0.4
        ),
        "s9_routed_cosine_dups": _routed("s9_routed_cosine_dups"),
        "s9_routed_best_effort": _routed(
            "s9_routed_best_effort", target_recall=0.25
        ),
        "d10_routed_semantic_dedup": lambda spark, sf_dir: similarity.embedding_dup_clusters(
            _emb(spark, sf_dir), bands=None, threshold=0.4, method="auto",
            plan_out=RECEIPTS.setdefault("d10_routed_semantic_dedup", {}),
        ),
    }


# routing receipts captured by _auto_queries' routed wrappers; the LAST
# fn call per name is the final rep at the 30x point, so the recorded
# (nprobe, calibrated_recall) describe the big-corpus run
RECEIPTS: dict = {}


# auto-path name -> the oracle-pinned query whose second-decade exponent
# is the comparison column
PINNED = {
    "s9_auto_lsh_cosine_dups": "s9_lsh_cosine_dups",
    "s9_routed_cosine_dups": "s9_lsh_cosine_dups",
    "s9_routed_best_effort": "s9_lsh_cosine_dups",
    "d10_routed_semantic_dedup": "d10_semantic_dedup",
}


def main():
    auto = "--auto" in sys.argv
    argv = [a for a in sys.argv if a != "--auto"]
    scaled = argv[1] if len(argv) > 1 else "/tmp/sf30ds"
    names = argv[2:] or (list(_auto_queries()) if auto else LEADERS)
    copies = 30
    spark = get_spark(app_name="second-decade")
    qs = _auto_queries() if auto else E.queries()
    try:
        E.entry(spark).count()  # warm codegen
    except Exception:
        pass
    out_path = os.path.join(REPO, "BENCH_sf1.json")
    with open(out_path) as fh:
        doc = json.load(fh)
    sec = doc.setdefault("second_decade", {"scaled_dir": scaled, "copies": copies})
    results = sec.setdefault("auto_path" if auto else "queries", {})

    def _flush():
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)

    for name in names:
        fn = qs[name]
        try:
            t_small = _time(fn, spark, SF01)
            t_big = _time(fn, spark, scaled)
        except Exception as ex:
            results[name] = {"error": f"{type(ex).__name__}: {str(ex)[:160]}"}
            print(f"{name:<26} ERROR {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)
            _flush()
            continue
        expo = (
            round(math.log(t_big / t_small) / math.log(copies), 2)
            if t_small > 0 else None
        )
        if auto:
            # cross-reference the PINNED counterpart's second-decade exponent
            first = sec.get("queries", {}).get(PINNED.get(name, ""), {}).get("exponent")
        else:
            first = doc.get("queries", {}).get(name, {}).get("exponent")
        results[name] = {
            "sf0.1_sec": t_small,
            f"x{copies}_sec": t_big,
            f"ratio_{copies}x": round(t_big / t_small, 2) if t_small else None,
            "exponent": expo,
            ("pinned_exponent" if auto else "first_decade_exponent"): first,
        }
        if name in RECEIPTS and RECEIPTS[name]:
            r = RECEIPTS[name]
            results[name]["nprobe"] = r.get("nprobe")
            cal = r.get("calibrated_recall")
            results[name][f"calibrated_recall_x{copies}"] = (
                round(cal, 3) if cal is not None else None
            )
        print(f"{name:<26} sf0.1={t_small:>8.3f}s x{copies}={t_big:>9.3f}s "
              f"exp={expo} (first decade {first})", flush=True)
        _flush()
    print("merged into BENCH_sf1.json")


if __name__ == "__main__":
    main()
