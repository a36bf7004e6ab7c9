"""bench.py's self-flagging regression alarm (round-6 verdict item 6):
a driver bench sample like r6's streaming section — queries 1.8-2.8x
above their committed floors, a throughput gauge at 0.42x — must WARN
in the bench output instead of waiting for a human to diff JSON files.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import regression_warnings  # noqa: E402


def test_wall_regression_flagged():
    warns = regression_warnings(
        {"e6_dedup_stream": 3.2, "g1_match_label": 0.5},
        {"e6_dedup_stream": 1.03, "g1_match_label": 0.45},
    )
    assert len(warns) == 1 and "e6_dedup_stream" in warns[0]
    assert "3.0x" in warns[0]
    # a >=2s floor gets the standard 2x bar
    warns = regression_warnings({"d10": 5.2}, {"d10": 2.5})
    assert len(warns) == 1 and "2.0x" in warns[0]


def test_small_floors_are_noise_exempt():
    # a 0.1s query doubling is jitter, not a regression
    assert regression_warnings({"q": 0.4}, {"q": 0.1}) == []
    # a sub-2s floor doubling is still jitter on this host (round-7
    # adjudication: 0.5-2s queries run 2-3x their historical-min floors
    # at every commit in degraded epochs) — only >3x trips
    assert regression_warnings({"q": 1.2}, {"q": 0.5}) == []
    assert regression_warnings({"q": 1.6}, {"q": 0.5}) != []


def test_rate_drop_flagged():
    warns = regression_warnings(
        {"e26_restart_recovery": 3.0},
        {"e26_restart_recovery": 2.83},
        rates={"e26_restart_recovery": 14771.0},
        rate_floors={"e26_restart_recovery": 35285.8},
    )
    assert len(warns) == 1 and "rows/s" in warns[0]


def test_quiet_when_within_floors():
    assert (
        regression_warnings(
            {"a": 1.0, "b": 2.0},
            {"a": 0.9, "b": 1.5},
            rates={"e8": 29000.0},
            rate_floors={"e8": 29154.5},
        )
        == []
    )


def test_failed_and_unfloored_queries_ignored():
    # -1 sentinel (failed) and names with no committed floor don't warn
    assert regression_warnings({"new_q": 9.0, "failed_q": -1.0},
                               {"failed_q": 1.0}) == []


def test_degraded_epoch_flag_pure_logic():
    from bench import degraded_epoch_flag

    # healthy warm probes: ~0.05-0.15s
    assert degraded_epoch_flag({"before": 0.08, "after": 0.12}) is False
    # either endpoint over the bar flags the run
    assert degraded_epoch_flag({"before": 0.08, "after": 1.7}) is True
    assert degraded_epoch_flag({"before": 3.0, "after": 0.1}) is True
    # sentinel / missing probes never flag
    assert degraded_epoch_flag({"before": -1.0, "after": None}) is False


def test_probe_jvm_epoch_runs_fast_and_fixed(spark):
    """The probe is a tiny fixed JVM job: it must return a small
    positive min-of-reps figure on a warm session (well under the 0.5s
    degraded bar on a healthy host — if THIS assertion flakes, the
    session itself sits in a degraded epoch, which is exactly what the
    probe exists to detect; re-run)."""
    from bench import probe_jvm_epoch

    # warm codegen once so the probe measures execution, not first-run
    # class loading
    spark.range(1_000_000).selectExpr("count(*) AS c", "sum(id) AS s").collect()
    t = probe_jvm_epoch(spark)
    assert 0 < t < 2.0


class _FakeDF:
    def __init__(self, n=1):
        self._n = n

    def count(self):
        return self._n


def test_failed_query_is_retried_once_and_recovers():
    """Round-10 verdict item 2: a transient failure must get the same
    single retry a slow sample gets, recording the retry's time."""
    from bench import run_query_timed

    calls = {"n": 0}

    def flaky(spark, sf_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return _FakeDF()

    t, retried = run_query_timed(None, "flaky_q", flaky, "/tmp", suspicious=None)
    assert calls["n"] == 2
    assert retried is True
    assert t >= 0  # the retry's succeeding time is recorded, not -1.0


def test_persistent_failure_stays_negative_after_one_retry():
    from bench import run_query_timed

    calls = {"n": 0}

    def broken(spark, sf_dir):
        calls["n"] += 1
        raise RuntimeError("always")

    t, retried = run_query_timed(None, "broken_q", broken, "/tmp")
    assert calls["n"] == 2  # exactly one retry, then give up
    assert retried is True
    assert t == -1.0


def test_passing_retry_failure_keeps_first_sample():
    """A slow-but-passing first sample whose RETRY fails keeps the
    measured first time (min-of-two never degrades to -1.0)."""
    from bench import run_query_timed

    calls = {"n": 0}

    def degrades(spark, sf_dir):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("second run dies")
        return _FakeDF()

    t, retried = run_query_timed(
        None, "q", degrades, "/tmp", suspicious=lambda n, s: True
    )
    assert retried is True
    assert t >= 0


def test_failure_summary_makes_reds_unmissable():
    """Round-10 verdict item 2: e35's -1.0 was silently EXCLUDED from
    the total — the bench line looked BETTER for having a broken query.
    failure_summary must surface n_failed/failed top-level, invalidate
    the total, and price each failure at its committed floor so the
    caller ADDS cost instead of dropping it."""
    from bench import failure_summary

    out = failure_summary(
        {"ok": 1.5, "e35_pair_sink_compaction": -1.0, "also_ok": 0.3},
        {"e35_pair_sink_compaction": 8.5, "ok": 1.0},
    )
    assert out["n_failed"] == 1
    assert out["failed"] == ["e35_pair_sink_compaction"]
    assert out["total_valid"] is False
    assert out["failed_floor_sec"] == 8.5
    # unfloored failures still invalidate the total (priced at 0)
    out2 = failure_summary({"new_q": -1.0}, {})
    assert out2["n_failed"] == 1 and out2["total_valid"] is False
    assert out2["failed_floor_sec"] == 0.0
    # the clean case stays quiet but schema-stable
    out3 = failure_summary({"a": 1.0}, {})
    assert out3 == {"n_failed": 0, "failed": []}
    # round-11 advice: a -1.0 that leaked INTO the committed floors map
    # must be clamped at 0, never subtracted — a red can only ever make
    # the headline total worse
    out4 = failure_summary({"q": -1.0, "r": -1.0}, {"q": -1.0, "r": 2.0})
    assert out4["failed_floor_sec"] == 2.0


def test_compact_summary_fits_driver_tail():
    """Round-12 verdict item 2: the driver keeps a 2,000-char stdout
    tail, so the bench's LAST stdout line must be one complete small
    object even with the worst realistic field sizes — the 9 KB
    full-object line is what made every BENCH_rN land parsed: null."""
    import json

    from bench import compact_summary

    out = {
        "metric": "headline_queries_total_wall",
        "value": 436.2,
        "unit": "sec",
        "sf": 0.1,
        "queries": {f"q{i}": 1.0 for i in range(304)},
        "n_failed": 2,
        "failed": ["a", "b"],
        "degraded_epoch": False,
        "stream_rows_per_sec": {
            "e8_sessionize_stream": 33512.1,
            "e26_restart_recovery": 37467.2,
        },
        "warnings": [f"w{i}: slow" for i in range(40)],
    }
    line = json.dumps(compact_summary(out))
    assert len(line) < 500  # complete object well inside a 2,000-char tail
    parsed = json.loads(line)
    assert parsed["value"] == 436.2 and parsed["n"] == 304
    assert parsed["n_failed"] == 2 and parsed["n_warnings"] == 40
    assert parsed["degraded_epoch"] is False
    assert parsed["stream_rows_per_sec"]["e8_sessionize_stream"] == 33512.1
    # per-query timings live in the full-object files (and the full
    # first stdout line, r15 verdict item 2) — never in the LAST line,
    # which must stay complete inside the driver's 2,000-char tail
    assert "queries" not in parsed and parsed["full"] == "BENCH_LAST_RUN.json"
    # minimal objects (failed run, no streams) stay schema-stable
    small = compact_summary({"metric": "m", "value": -1, "unit": "sec", "sf": 0.1})
    assert small["n"] == 0 and small["n_failed"] == 0 and small["n_warnings"] == 0
