"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Stdout is
ONE compact JSON line: {"metric", "value": total_sec, "unit": "sec",
"sf", "n", "n_failed", "degraded_epoch", "stream_rows_per_sec",
"n_warnings", "full"} — small enough that the driver's 2,000-char
stdout tail always holds a complete object (round-12 verdict item 2).
The full result object with all per-query timings is written to
``BENCH_LAST_RUN.json`` next to this file.

Each query is timed as: build the DataFrame + execute to completion
(count-style action that materializes every row, without driver-side
pandas conversion costs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from projet_graphdb_spark.engine import get_spark  # noqa: E402


def regression_warnings(
    timings: dict,
    floors: dict,
    rates: dict | None = None,
    rate_floors: dict | None = None,
    wall_factor: float = 2.0,
    rate_factor: float = 0.6,
    min_floor_sec: float = 0.5,
    small_floor_cutoff: float = 2.0,
    small_floor_factor: float = 3.0,
) -> list:
    """Self-flagging regression alarm (round-6 verdict item 6): a bench
    sample like r6's streaming section — 1.8-2.8x above committed floors
    — should announce itself instead of waiting for a human diff.

    Returns warning strings for (a) any query slower than
    ``wall_factor`` x its committed floor (floors under
    ``min_floor_sec`` are skipped: a 0.1 s query doubling is noise;
    floors under ``small_floor_cutoff`` require the stricter
    ``small_floor_factor`` — the round-7 adjudication showed this
    host's multiplicative jitter routinely carries 0.5-2 s queries to
    2-3x their historical-min floors at EVERY commit, so a 2x bar
    there is all false alarms; real state regressions on the fast
    queries still trip the absolute rows/sec gauges) and
    (b) any throughput gauge below ``rate_factor`` x its floor.  One
    sample cannot distinguish host-VM jitter from a real regression, so
    these are WARNs to trigger a min-of-reps re-measurement, not
    failures.
    """
    warns = []
    for name, t in sorted(timings.items()):
        fl = floors.get(name)
        factor = wall_factor if fl and fl >= small_floor_cutoff else small_floor_factor
        if fl and t > 0 and fl >= min_floor_sec and t > factor * fl:
            warns.append(
                f"{name}: {t:.3f}s > {factor:.1f}x floor {fl:.3f}s"
            )
    for name, r in sorted((rates or {}).items()):
        fl = (rate_floors or {}).get(name)
        if fl and r < rate_factor * fl:
            warns.append(
                f"{name}: {r:.1f} rows/s < {rate_factor:.1f}x floor {fl:.1f}"
            )
    return warns


def run_query_timed(spark, name, fn, sf_dir, suspicious=None):
    """Time one query with the one-retry discipline, FAILURES included
    (round-10 verdict item 2: a query that raised was recorded -1.0 and
    never retried — `_suspicious` only looked at slow positives — so a
    transient failure never got the second chance every slow sample
    gets).  A failure is always suspicious: it is re-run once, and the
    retry's time is recorded if it succeeds.  A slow-but-passing sample
    keeps the min-of-two rule.  Returns ``(seconds_or_-1.0, retried)``.
    """

    def once():
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            return round(time.time() - t0, 3)
        except Exception as ex:  # keep the bench line parseable on failure
            print(
                f"# {name} FAILED: {type(ex).__name__}: {str(ex)[:200]}",
                file=sys.stderr,
            )
            return -1.0

    t = once()
    if t < 0 or (suspicious is not None and suspicious(name, t)):
        t2 = once()
        if t < 0:
            t = t2
        elif t2 >= 0:
            t = min(t, t2)
        return t, True
    return t, False


def failure_summary(timings: dict, floors: dict) -> dict:
    """Make failures unmissable in the bench line (round-10 verdict
    item 2: e35's -1.0 was EXCLUDED from the total — the run looked
    ~8.5 s FASTER for having a broken query — and only a stderr comment
    recorded it).  Returns top-level fields to merge into the output:
    ``n_failed``/``failed`` always present; when any query failed,
    ``total_valid`` goes false and ``failed_floor_sec`` carries the sum
    of the failed queries' committed floors, which the caller ADDS to
    the headline total so a red can only ever make the number worse."""
    failed = sorted(n for n, v in timings.items() if v is not None and v < 0)
    out = {"n_failed": len(failed), "failed": failed}
    if failed:
        out["total_valid"] = False
        # clamp at 0: if a failed run's -1.0 ever leaks into the
        # committed floors map, it must not SUBTRACT from the headline
        # total (round-11 advice) — a red can only make the number worse
        out["failed_floor_sec"] = round(
            sum(max(0.0, floors.get(n) or 0.0) for n in failed), 3
        )
    return out


def probe_jvm_epoch(spark, reps: int = 3) -> float:
    """Host-epoch probe (round-7 verdict item 7): min-of-``reps`` wall
    time of a tiny FIXED JVM job (range → sum, no IO, no Python
    workers).  On a healthy host this runs in ~0.05-0.15 s warm; during
    the documented 10-30× degraded-VM windows (BASELINE.md diagnosis:
    JVM ops crawl while pure-Python spin loops stay fast) it lands at
    0.5 s+.  min-of-reps because a single sample can straddle a GC
    pause."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        spark.range(1_000_000).selectExpr("count(*) AS c", "sum(id) AS s").collect()
        best = min(best, time.time() - t0)
    return round(best, 4)


def degraded_epoch_flag(probes: dict, threshold_sec: float = 0.5) -> bool:
    """True when ANY recorded probe exceeds ``threshold_sec`` — the run
    overlapped a degraded host epoch, so regression WARNs in the same
    line self-contextualize (the r7 a20/a22 adjudication required a
    manual worktree bisect to establish exactly this)."""
    return any(
        v is not None and v >= 0 and v > threshold_sec for v in probes.values()
    )


def compact_summary(out: dict) -> dict:
    """One SMALL machine-parseable line for the driver (round-12
    verdict item 2): the full result object is ~9 KB (304 inline query
    timings) and the driver keeps only a 2,000-char stdout tail, so
    every round's BENCH_rN artifact landed ``"parsed": null``.  The
    full object goes to ``BENCH_LAST_RUN.json``; stdout ENDS with this
    compact summary so the tail always contains one complete object."""
    return {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "n": len(out.get("queries", {})),
        "n_failed": out.get("n_failed", 0),
        "degraded_epoch": out.get("degraded_epoch"),
        "stream_rows_per_sec": out.get("stream_rows_per_sec"),
        "n_warnings": len(out.get("warnings", [])),
        "cpus": out.get("cpus"),
        "full": "BENCH_LAST_RUN.json",
        "full_per_cpus": out.get("full_per_cpus"),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")

    # warm the JVM/codegen on the tiny fixture so per-query numbers
    # measure execution, not one-time class/codegen initialization
    try:
        E.entry(spark).count()
    except Exception:
        pass

    import gc

    probes = {"before": probe_jvm_epoch(spark)}

    # The host VM intermittently degrades JVM execution ~10-30x for
    # 30-70 s windows (diagnosed round 1: guest CPU/disk/clock/GC/
    # safepoints all clean while JVM ops crawl; a pure-Python spin loop
    # stays fast).  A query landing in such a window reports noise, not
    # engine cost, so anything slower than RETRY_OVER_SEC — or slower
    # than 2x its last COMMITTED time in BENCH.json (min 0.75 s), the
    # standard min-of-reps discipline scoped to suspicious samples —
    # gets ONE re-run and we record the faster of the two, disclosed in
    # the "retried" field of the output line.
    RETRY_OVER_SEC = 15.0
    ref = {}
    rate_ref = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH.json")) as fh:
            _committed = json.load(fh)
            ref = _committed.get("queries", {})
            rate_ref = _committed.get("stream_rows_per_sec", {})
    except Exception:
        pass

    def _suspicious(name, t):
        if t > RETRY_OVER_SEC:
            return True
        r = ref.get(name)
        return r is not None and r > 0 and t > max(0.75, 2.0 * r)

    timings = {}
    retried = []
    # Real streaming queries run LAST: their memory sinks and state
    # stores stay resident for the session, and the GC pressure would
    # otherwise tax whichever batch query runs next.  The registry
    # itself is family-interleaved for the driver's correctness prefix
    # window, so the bench re-derives its own order here.
    qs = E.queries()
    streaming = getattr(E, "STREAMING_QUERIES", frozenset())
    ordered = [(n, f) for n, f in qs.items() if n not in streaming]
    ordered += [(n, f) for n, f in qs.items() if n in streaming]
    for name, fn in ordered:
        timings[name], was_retried = run_query_timed(
            spark, name, fn, sf_dir, suspicious=_suspicious
        )
        if was_retried:
            retried.append(name)
        # release py4j refs between queries (outside the timer) so the
        # JVM cleaner can drop dead checkpoint blocks promptly instead
        # of during a later query's jobs
        gc.collect()
    fails = failure_summary(timings, ref)
    # a failure must never SHRINK the headline: failed queries count at
    # their committed floor (0 if unfloored) and total_valid goes false
    total = round(
        sum(v for v in timings.values() if v >= 0)
        + fails.get("failed_floor_sec", 0.0),
        3,
    )
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    out.update(fails)
    for fname in fails["failed"]:
        print(f"# FAILED QUERY IN TOTAL: {fname}", file=sys.stderr)
    # Streaming throughput over stateful twins: input rows / full drain
    # wall — a state-store or shuffle regression in the stateful path
    # shows as a rate DROP even while the correctness twins stay green
    # (the availableNow drains verify values, not cost).  e8 =
    # applyInPandasWithState sessionization; e26 = two-launch
    # checkpoint-recovery windowed agg (rate spans both phases).
    try:
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        tp = {
            name: round(n_events / timings[name], 1)
            for name in ("e8_sessionize_stream", "e26_restart_recovery")
            if timings.get(name, -1) > 0
        }
        if tp:
            out["stream_rows_per_sec"] = tp
    except Exception:
        pass
    if retried:
        out["retried"] = retried
    probes["after"] = probe_jvm_epoch(spark)
    out["jvm_probe_sec"] = probes
    out["degraded_epoch"] = degraded_epoch_flag(probes)
    warns = regression_warnings(
        timings, ref, out.get("stream_rows_per_sec"), rate_ref
    )
    if warns:
        out["warnings"] = warns
        for w in warns:
            print(f"# WARN regression: {w}", file=sys.stderr)
        if out["degraded_epoch"]:
            print(
                "# NOTE: degraded host epoch detected by the JVM probe "
                f"({probes}) — adjudicate the WARNs with min-of-reps "
                "before treating them as regressions",
                file=sys.stderr,
            )
    # Per-query persistence (round-15 verdict item 2, additions-only):
    # the driver runs the bench TWICE (32- then 8-core) and the second
    # run used to clobber BENCH_LAST_RUN.json before the driver's PERF
    # builder read the first run's per-query map — so the full object
    # now ALSO lands in a per-core-count file (BENCH_LAST_RUN_c32.json /
    # _c8.json) that consecutive runs at different core counts cannot
    # clobber.  BENCH_LAST_RUN.json keeps its exact schema (latest run).
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(
        spark.sparkContext.defaultParallelism
    )
    out["cpus"] = int(cpus) if str(cpus).isdigit() else cpus
    out["full_per_cpus"] = f"BENCH_LAST_RUN_c{cpus}.json"
    repo = os.path.dirname(os.path.abspath(__file__))
    for fname in ("BENCH_LAST_RUN.json", out["full_per_cpus"]):
        full_path = os.path.join(repo, fname)
        try:
            with open(full_path, "w") as fh:
                json.dump(out, fh, indent=1)
            print(f"# full result object: {full_path}", file=sys.stderr)
        except OSError as ex:
            print(f"# could not write {full_path}: {ex}", file=sys.stderr)
            # the full object must land SOMEWHERE parseable — fall back
            # to stderr (never the last stdout line, which stays small)
            print(json.dumps(out), file=sys.stderr)
    # stdout: the FULL object (with the per-query seconds map — the
    # driver-contract line shape) first, then the compact summary as
    # the LAST line.  The driver parses from a 2,000-char tail (the
    # round-12 lesson: a 9 KB line alone truncates to unparseable), so
    # the last line must stay small; a whole-stdout or per-line parser
    # additionally gets every per-query timing from the first line.
    print(json.dumps(out))
    print(json.dumps(compact_summary(out)))


if __name__ == "__main__":
    main()
