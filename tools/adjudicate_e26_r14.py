"""Round-14 e26 RATE adjudication (VERDICT r13 item 2) — the e8
methodology applied to e26_restart_recovery's 37,467 rows/s floor,
which no driver bench has re-met since r11 (r13 best: 0.90×).

Two determinations in one quiet window:

1. **Worktree A/B** — run e26 best-of-N in the floor-setting tree
   (29aa6aa, the round-8 healthy-epoch bench that recorded
   2.669 s / 37,467 rows/s) AND the current tree, back-to-back with the
   same controls (e5 pure-JVM streaming, e19 Python-path streaming).
   If the floor-era code reproduces today's elevation, the body is
   exonerated: host shift, not code regression.

2. **Warm/cold context** — e26 measured quasi-cold (one entry()
   warm-up, the dedicated-session shape) vs WARM (after a ~20-query
   mini-bench prelude, the context every committed floor was measured
   in).  e8's r13 resolution showed the two contexts can differ ~1.4×
   on streaming paths; the floor verdict must come from the floor's own
   context.

Usage:
    python tools/adjudicate_e26_r14.py setup    # create the old worktree
    python tools/adjudicate_e26_r14.py run <tag> [--repo DIR] [--warm]
        # one measurement session; tag names the receipt
    python tools/adjudicate_e26_r14.py ab       # orchestrate: old cold,
        # new cold, new warm — three subprocess sessions, one receipt

Receipts land in /tmp/e26_r14_<tag>.json and the combined
/tmp/e26_r14_ab.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR_COMMIT = "29aa6aa"
OLD_TREE = "/tmp/e26_ab_old"
N_EVENTS_SF01 = 100_000

PLAN = [
    ("e26_restart_recovery", 6),
    ("e5_window_stream", 6),
    ("e19_daily_topk_stream", 6),
]

# the mini-bench prelude that recreates the committed floors' WARM
# context: a spread of batch families (JVM aggregates, joins, text,
# dedup, similarity) so codegen, Arrow, the Python workers, and the
# shuffle machinery are all hot before the streaming sample
WARM_PRELUDE = [
    "x1_pricing_summary", "x2_topk_orders", "g1_match_label",
    "g2_match_rel_where", "t1_text_stats", "t15_quality_filter",
    "d1_exact_dedup", "d4_simhash", "s1_knn_bruteforce",
    "s2_cosine_dups", "x5_asof_join", "e18_daily_topk",
    "t18_unigram_logprob", "d16_source_dup_matrix", "x40_gap_fill",
    "a2_connected_components", "m1_media_features", "t19_tfidf_pairs",
    "x42_latest_per_key", "t20_source_kl",
]


def spin_probe() -> float:
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i
    return round(time.time() - t0, 2)


def setup() -> None:
    if not os.path.isdir(OLD_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", OLD_TREE, FLOOR_COMMIT],
            cwd=REPO, check=True,
        )
    print("old tree ready:", OLD_TREE)


def run_session(tag: str, repo: str, warm: bool) -> dict:
    sys.path.insert(0, repo)
    import importlib

    E = importlib.import_module("__spark_entry__")
    engine = importlib.import_module("projet_graphdb_spark.engine")
    from bench import probe_jvm_epoch  # noqa: F401  (repo's own bench.py)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = engine.get_spark(app_name=f"e26-r14-{tag}")
    qs = E.queries()
    out = {
        "tag": tag, "repo": repo, "warm_context": warm,
        "spin_before": spin_probe(), "jvm_before": probe_jvm_epoch(spark),
        "queries": {},
    }
    try:
        E.entry(spark).count()
    except Exception:
        pass
    if warm:
        t0 = time.time()
        for name in WARM_PRELUDE:
            fn = qs.get(name)
            if fn is None:
                continue
            try:
                fn(spark, sf_dir).count()
            except Exception:
                pass
        out["warm_prelude_sec"] = round(time.time() - t0, 1)
    import gc

    for name, reps in PLAN:
        fn = qs.get(name)
        if fn is None:
            continue
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
            gc.collect()
        rec = {"samples": samples, "best": min(samples)}
        if name == "e26_restart_recovery":
            rec["rows_per_sec"] = round(N_EVENTS_SF01 / min(samples), 1)
        out["queries"][name] = rec
    out["jvm_after"] = probe_jvm_epoch(spark)
    out["spin_after"] = spin_probe()
    path = f"/tmp/e26_r14_{tag}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return out


def orchestrate() -> None:
    setup()
    runs = [
        ("old_cold", OLD_TREE, False),
        ("new_cold", REPO, False),
        ("new_warm", REPO, True),
    ]
    combined = {}
    for tag, repo, warm in runs:
        cmd = [sys.executable, os.path.abspath(__file__), "run", tag,
               "--repo", repo] + (["--warm"] if warm else [])
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd=repo)
        try:
            with open(f"/tmp/e26_r14_{tag}.json") as fh:
                combined[tag] = json.load(fh)
        except FileNotFoundError:
            combined[tag] = {"err": proc.stderr[-2000:]}
        print(tag, "done", flush=True)
    with open("/tmp/e26_r14_ab.json", "w") as fh:
        json.dump(combined, fh, indent=1)
    print(json.dumps({
        t: {
            "e26_best": c.get("queries", {})
            .get("e26_restart_recovery", {}).get("best"),
            "e26_rate": c.get("queries", {})
            .get("e26_restart_recovery", {}).get("rows_per_sec"),
            "e5_best": c.get("queries", {})
            .get("e5_window_stream", {}).get("best"),
            "e19_best": c.get("queries", {})
            .get("e19_daily_topk_stream", {}).get("best"),
            "spin": (c.get("spin_before"), c.get("spin_after")),
        }
        for t, c in combined.items()
    }, indent=1))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if mode == "setup":
        setup()
    elif mode == "run":
        tag = sys.argv[2]
        repo = REPO
        warm = "--warm" in sys.argv
        if "--repo" in sys.argv:
            repo = sys.argv[sys.argv.index("--repo") + 1]
        run_session(tag, repo, warm)
    else:
        orchestrate()
