"""sf1 (10x) value-level sweep with ZERO oracle skips (round-11 item 2).

Runs the scale-sensitive query list against the synthesized 10x dataset
(``/tmp/sfscaled``, built by ``tools/make_scaled_sf.py`` — decorrelated
key-shifted copies of sf0.1) with per-query SUBPROCESS isolation and a
hard wall-clock cap, so one quadratic DuckDB replay can never hang the
sweep (the round-11 lesson).

The three r11 skips — d10_semantic_dedup, s24_imi_cosine_dups,
s35_sized_srp_ingest — became CAPPED instead of skipped in r12; in r14
d10 GRADUATED to the full-value list (round-13 verdict item 5: its
oracle's recursive min-label walk was replaced by pointer-jumping
iterative halving — O(E·log V) joins — and the full-sf1 value check now
runs in ~48 s oracle-side).  The remaining two capped queries' replays
are quadratic/mis-sized at 10x BY DESIGN (documented in each query's
docstring), so each runs twice:

* full-scale ENGINE run at /tmp/sfscaled, rows recorded (the engine
  side has no cap problem — that is the point of the operators);
* a VALUE-level engine-vs-oracle check on ``/tmp/sfcapped`` — a
  deterministic 50% sub-corpus of sf1 (``vec_id % 2 == 0``, densely
  relabeled ``vec_id // 2`` so count-derived splits like s35's 90/10
  cut keep their shape) — 5x the sf0.1 scale already fully swept, and
  the largest slice whose quadratic replays fit the per-query cap.

Usage: python tools/sf1_sweep.py [out.json]   (default CORRECTNESS_SF1_r12.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = "/tmp/sfscaled"
CAPPED_DIR = "/tmp/sfcapped"
PER_QUERY_CAP_SEC = 780  # 480 s oracle budget + Spark startup + engine slack

# the r11 sweep list (27 value-checked + 5 rows-green) + the three
# previously-skipped + the round-12 m14 image near-dup
VALUE_QUERIES = [
    "d11_passage_fuzzy", "d15_lsh_calibration", "d20_prefix_filter_pairs",
    "d24_blocking_candidates", "d26_incremental_lsh", "d27_ingest_decisions",
    "d28_two_day_ingest", "e37_exact_ingest_stream", "e38_pair_sink_retention",
    "m10_cutmix_plan", "s12_knn_ivfpq", "s22_ivf_cosine_dups",
    "s26_incremental_ivf_dups", "s27_incremental_imi_dups",
    "s30_ivf_index_rebuild", "s31_cell_occupancy_report",
    "s32_embedding_drift_report", "s33_index_rebuild_policy",
    "s34_exact_guaranteed_route", "s9_lsh_cosine_dups",
    "t16_partitioned_corpus", "x41_bucketed_join", "x47_sketch_aggregates",
    "x55_zorder_layout", "x66_hierarchy_rollup", "x88_skew_report",
    "x90_incremental_load",
    "s29_routed_incremental_ingest", "e36_routed_ingest_stream",
    "e35_pair_sink_compaction", "e34_ingest_dedup_stream",
    "a12_feature_propagation",
    "m14_image_phash_dups",
    "m15_dhash_band_occupancy",
    # round-14 additions: d10 graduated from CAPPED (mergeable
    # pointer-jumping oracle, r13 verdict item 5); m16/m17/t42 new
    "d10_semantic_dedup",
    "m16_hamming_reband_recovery",
    "m17_maintenance_decision_table",
    "t42_corpus_build_pipeline",
    # round-15 additions: the image ingest tier (persisted dHash band
    # index + per-shard join + streaming twin + gauge ledger); t42 and
    # m17 above now carry the cross-modal / persisted-layout bodies
    "m18_incremental_dhash_ingest",
    "m19_dhash_gauge_ledger",
    "e39_image_ingest_stream",
]

CAPPED_QUERIES = {
    "s24_imi_cosine_dups": "pinned 4x4 codebook = 16 virtual cells is "
    "deliberately mis-sized at 10x (cell count must scale with N; "
    "s26/s27/s29 exist for exactly that) — Sigma c^2 is quadratic",
    "s35_sized_srp_ingest": "the 46-band replay materializes ~0.72*S*N "
    "candidate rows with 64-dim arrays; at 10x it filled DuckDB's "
    "spill disk in r11",
}

CAP_DESCRIPTION = (
    "deterministic 50% sub-corpus of /tmp/sfscaled: vec_id % 2 == 0, "
    "relabeled vec_id // 2 (dense, order-preserving); doc_id likewise; "
    "= 5x sf0.1 scale, the largest slice whose quadratic oracle "
    "replays fit the 480 s budget"
)


def build_capped() -> None:
    """Materialize /tmp/sfcapped (embeddings + documents halves)."""
    import duckdb

    os.makedirs(CAPPED_DIR, exist_ok=True)
    con = duckdb.connect()
    for table, idc in (("embeddings", "vec_id"), ("documents", "doc_id")):
        src = f"{SF1}/{table}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        dst = f"{CAPPED_DIR}/{table}.parquet"
        if os.path.exists(dst):
            continue
        con.sql(
            f"COPY (SELECT * REPLACE ({idc} // 2 AS {idc}) FROM '{src}' "
            f"WHERE {idc} % 2 = 0 ORDER BY {idc}) TO '{dst}' (FORMAT parquet)"
        )


def run_one(sf_dir: str, name: str, rows_only: bool = False) -> dict:
    out = f"/tmp/sf1_sweep_{name}{'_rows' if rows_only else ''}.json"
    # A stale result file from a previous sweep must never stand in for
    # a crashed check (round-12 advice: Spark launch failure / OOM-kill
    # before the JSON write would read the old file and report a
    # genuine failure as a pass in the committed receipt).
    try:
        os.remove(out)
    except FileNotFoundError:
        pass
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
        sf_dir, name, "--json", out,
    ]
    if rows_only:
        cmd.append("--rows-only")
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=PER_QUERY_CAP_SEC,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "err": f"TIMEOUT {PER_QUERY_CAP_SEC}s"}
    wall = round(time.time() - t0, 1)
    try:
        if proc.returncode != 0:
            raise RuntimeError(f"check_oracle rc={proc.returncode}")
        with open(out) as fh:
            rec = json.load(fh)["queries"][name]
    except Exception:
        tail = (proc.stdout + proc.stderr)[-400:]
        return {"ok": False, "err": f"rc={proc.returncode} {tail}"}
    rec["wall_sec"] = wall
    return rec


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "CORRECTNESS_SF1_r12.json"
    )
    if not os.path.isdir(SF1):
        sys.exit(f"{SF1} missing — run tools/make_scaled_sf.py first")
    build_capped()
    results: dict = {}
    failures = 0
    for name in VALUE_QUERIES:
        rec = run_one(SF1, name)
        results[name] = rec
        failures += 0 if rec.get("ok") else 1
        print(name, "OK" if rec.get("ok") else f"FAIL {rec.get('err')}",
              flush=True)
    capped: dict = {}
    for name, why in CAPPED_QUERIES.items():
        full = run_one(SF1, name, rows_only=True)
        check = run_one(CAPPED_DIR, name)
        capped[name] = {
            "why_capped": why,
            "cap": CAP_DESCRIPTION,
            "full_sf1_engine": full,
            "capped_value_check": check,
        }
        ok = full.get("ok") and check.get("ok")
        failures += 0 if ok else 1
        print(name, "CAPPED-OK" if ok else
              f"CAPPED-FAIL full={full.get('err')} check={check.get('err')}",
              flush=True)
    with open(out_path, "w") as fh:
        json.dump(
            {
                "sf_dir": f"{SF1} (10x sf0.1, decorrelated copies via "
                "tools/make_scaled_sf.py)",
                "n": len(results) + len(capped),
                "failures": failures,
                "skipped": {},
                "queries": results,
                "capped": capped,
            },
            fh, indent=1,
        )
    print("FAILURES:", failures, "->", out_path)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
