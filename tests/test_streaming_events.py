"""Streaming tier: batch/stream parity for the windowed event aggregation."""

import pytest

from projet_graphdb_spark.streaming import (
    load_events,
    streaming_windowed_counts,
    windowed_event_stats,
)

from conftest import SF_TINY


def test_batch_window_stats(spark):
    events = load_events(spark, SF_TINY)
    out = windowed_event_stats(events)
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == events.count()


def test_streaming_equals_batch(spark, tmp_path):
    """The same aggregation as a Structured Streaming query over the same
    files must produce the same result (availableNow drains everything)."""
    events = load_events(spark, SF_TINY)
    # write a normalized copy (micros timestamps) for the stream source
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = streaming_windowed_counts(spark, src, schema, query_name="t_ev_parity")
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_ev_parity").collect()
    }
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_stats(events).collect()
    }
    assert got == expect


def test_watermark_drops_late_data(spark, tmp_path):
    """Events arriving micro-batches AFTER the watermark passed their
    event time are dropped from the windowed aggregate, and only
    finalized windows emit in append mode — the bounded-state /
    late-data contract that matters on unbounded input.

    Watermark activation lags one batch (it is computed from data seen
    through batch N-1 and applied from batch N+1), hence three files:
    batch 0 establishes max event time 12:00, batch 1 activates the
    11:00 watermark, batch 2's sub-watermark rows are dropped.
    """
    import datetime as dt
    import time as _time

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    src = tmp_path / "late_ev"
    schema = "event_id long, ts timestamp, event_type string, value double"

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))
        _time.sleep(1.05)  # distinct mtimes: file order = batch order

    write("a", [(i, base + dt.timedelta(hours=10 + i % 3), "click", 1.0) for i in range(99)])
    write("b", [(150, base + dt.timedelta(hours=12, minutes=5), "click", 1.0)])
    write(
        "c",
        [
            (200, base + dt.timedelta(hours=1), "click", 1.0),  # hours late
            (201, base + dt.timedelta(hours=10, minutes=30), "click", 1.0),  # < wm too
        ],
    )

    q = (
        spark.readStream.schema(spark.read.parquet(str(src / "a")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("_w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("_w.start").alias("ws"), "n")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    got = {r["ws"]: r["n"] for r in spark.table("t_late").collect()}
    # both batch-2 rows are below the active 11:00 watermark → dropped
    assert dropped == 2, dropped
    # only the finalized [10:00, 11:00) window emitted, without late rows
    assert got == {base + dt.timedelta(hours=10): 33}, got


def test_parquet_sink_exactly_once_on_restart(spark, tmp_path):
    """Re-running the drained sink query against the same checkpoint
    must not rewrite or duplicate output (the file-sink manifest is the
    exactly-once mechanism)."""
    from projet_graphdb_spark.streaming import streaming_windowed_to_parquet

    events = load_events(spark, SF_TINY)
    src = str(tmp_path / "ev_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = streaming_windowed_to_parquet(spark, src, schema, out, ckpt)
    assert q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    q2 = streaming_windowed_to_parquet(spark, src, schema, out, ckpt)
    assert q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1  # no reprocessing, no double-write


def test_stream_static_enrichment_equals_batch(spark, tmp_path):
    """The stream-static join + windowed aggregate must equal the plain
    batch join + groupBy over the same files."""
    from pyspark.sql import functions as F

    from projet_graphdb_spark.streaming import streaming_enriched_stats

    events = load_events(spark, SF_TINY)
    src = str(tmp_path / "events_enrich_stream")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    dim = spark.read.parquet(f"{SF_TINY}/customer.parquet")

    q = streaming_enriched_stats(spark, src, schema, dim, query_name="t_e10_sink")
    assert q.awaitTermination(120)
    got = {
        (r["window_start"], r["seg"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_e10_sink").collect()
    }
    batch = (
        events.join(
            dim.select(F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("seg")),
            "user_id",
        )
        .groupBy(F.window("ts", "1 hour").alias("_w"), "seg", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("s"),
        )
        .select(F.col("_w.start").alias("ws"), "seg", "event_type", "n", "s")
    )
    expect = {
        (r["ws"], r["seg"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()
    }
    assert got == expect and len(got) > 0


def test_append_mode_withholds_open_windows(spark, tmp_path):
    """Append mode must emit exactly the windows the final watermark
    closed — a strict prefix of the complete-mode result."""
    from projet_graphdb_spark.streaming import streaming_windowed_counts

    events = load_events(spark, SF_TINY)
    src = str(tmp_path / "events_append_stream")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    qc = streaming_windowed_counts(spark, src, schema, watermark="2 hours",
                                   query_name="t_e11_complete")
    assert qc.awaitTermination(120)
    complete = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_e11_complete").collect()
    }
    qa = streaming_windowed_counts(spark, src, schema, watermark="2 hours",
                                   query_name="t_e11_append", output_mode="append")
    assert qa.awaitTermination(120)
    appended = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_e11_append").collect()
    }
    assert appended and set(appended) < set(complete)
    assert all(complete[k] == v for k, v in appended.items())
    # the withheld windows are exactly those the watermark left open
    import datetime as dt

    max_ts = max(r["ts"] for r in events.select("ts").collect())
    wm = max_ts - dt.timedelta(hours=2)
    withheld = set(complete) - set(appended)
    assert all(ws + dt.timedelta(hours=1) > wm for ws, _ in withheld)
    assert all(ws + dt.timedelta(hours=1) <= wm for ws, _ in appended)


def test_sliding_window_fanout_and_totals(spark):
    import datetime as dt
    from projet_graphdb_spark.streaming.events import sliding_event_stats

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10, 7), "click", 2.0)],
        "ts timestamp, event_type string, value double",
    )
    out = sliding_event_stats(ev, window="1 hour", slide="15 minutes").collect()
    # one event -> exactly 4 hopping windows, starts 9:15..10:00
    starts = sorted(r["window_start"] for r in out)
    assert starts == [
        dt.datetime(2024, 1, 1, 9, 15),
        dt.datetime(2024, 1, 1, 9, 30),
        dt.datetime(2024, 1, 1, 9, 45),
        dt.datetime(2024, 1, 1, 10, 0),
    ]
    assert all(r["n_events"] == 1 and r["sum_value"] == 2.0 for r in out)


def test_sliding_stream_equals_batch(spark, tmp_path):
    from projet_graphdb_spark.streaming.events import sliding_event_stats

    events = load_events(spark, SF_TINY)
    src = str(tmp_path / "events_sliding")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = streaming_windowed_counts(
        spark, src, schema, query_name="t_ev_sliding", slide="15 minutes"
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_ev_sliding").collect()
    }
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in sliding_event_stats(events).collect()
    }
    assert got == expect


def test_upsert_stream_latest_per_key_and_restart(spark, tmp_path):
    import datetime as dt
    from projet_graphdb_spark.streaming.upsert import (
        latest_per_key,
        streaming_upsert_to_parquet,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 7, "click", 1.0, "a"),
        (2, dt.datetime(2024, 1, 1, 11), 7, "view", 2.0, "b"),   # 7's latest
        (3, dt.datetime(2024, 1, 1, 9), 8, "click", 3.0, "c"),   # 8's only
    ]
    sch = ("event_id long, ts timestamp, user_id long, event_type string,"
           " value double, props string")
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, sch).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    q = streaming_upsert_to_parquet(
        spark, src, schema, state, ckpt, max_files_per_trigger=1
    )
    assert q.awaitTermination(120)
    got = {r["user_id"]: (r["event_id"], r["event_type"])
           for r in spark.read.parquet(state).collect()}
    assert got == {7: (2, "view"), 8: (3, "click")}

    # restart with no new input: checkpoint makes it a no-op, state intact
    q2 = streaming_upsert_to_parquet(
        spark, src, schema, state, ckpt, max_files_per_trigger=1
    )
    assert q2.awaitTermination(120)
    got2 = {r["user_id"]: (r["event_id"], r["event_type"])
            for r in spark.read.parquet(state).collect()}
    assert got2 == got

    # the reduce helper alone
    df = spark.createDataFrame(rows, sch)
    assert {r["event_id"] for r in latest_per_key(df).collect()} == {2, 3}


def test_streaming_daily_topk_equals_batch(spark, tmp_path):
    import datetime as dt

    t = lambda d, h: dt.datetime(2024, 1, d, h)
    rows = [
        (1, t(1, 0), 1, "view", 1.0, "{}"), (2, t(1, 1), 1, "view", 1.0, "{}"),
        (3, t(1, 2), 2, "click", 1.0, "{}"), (4, t(2, 0), 2, "click", 1.0, "{}"),
        (5, t(2, 1), 3, "purchase", 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events")
    df.write.parquet(path)
    schema = spark.read.parquet(path).schema
    from projet_graphdb_spark.functions import relational
    from projet_graphdb_spark.streaming.events import streaming_daily_topk

    stream_rows = streaming_daily_topk(
        spark, path, schema, query_name="t_daily_topk"
    ).collect()
    batch_rows = relational.daily_topk_types(df, k=3).collect()
    assert [tuple(r) for r in stream_rows] == [tuple(r) for r in batch_rows]


def test_watermark_lateness_audit_counts(spark):
    import datetime as dt

    from projet_graphdb_spark.streaming.events import watermark_lateness_audit

    t = lambda h: dt.datetime(2024, 1, 1, h)
    # arrival order (event_id): bucket0 = ids 0,1 (max 10:00);
    # bucket1 = ids 1000,1001 — id 1000 is 3h earlier than bucket0's max
    ev = spark.createDataFrame(
        [(0, t(9)), (1, t(10)), (1000, t(7)), (1001, t(11))],
        "event_id long, ts timestamp",
    )
    out = {r["delay_minutes"]: r for r in
           watermark_lateness_audit(ev, delays_minutes=(0, 60, 240),
                                    bucket_size=1000).collect()}
    assert out[0]["n_total"] == 4
    assert out[0]["n_late"] == 1     # id 1000: 3h late vs bucket0 watermark
    assert out[60]["n_late"] == 1    # still late beyond 1h
    assert out[240]["n_late"] == 0   # 4h watermark keeps it


def test_chained_daily_peak_stream_equals_batch(spark):
    """Two chained stateful windowed aggregates in ONE streaming query
    (quarter-hour rate → daily peak/total) must equal the batch twin
    including the append-mode watermark emission contract."""
    from projet_graphdb_spark.streaming import drain, state_partitions, stream_source
    from projet_graphdb_spark.streaming.events import daily_peak_batch, streaming_daily_peak

    path, schema = stream_source(spark, SF_TINY)
    with state_partitions(spark, 4):
        q = streaming_daily_peak(spark, path, schema, query_name="t_daily_peak")
    got = sorted(map(tuple, drain(q, spark, "t_daily_peak").collect()))
    want = sorted(map(tuple, daily_peak_batch(load_events(spark, SF_TINY)).collect()))
    assert got == want and len(got) > 0


def test_multibatch_late_drop_semantics(spark):
    """The e33 multi-batch replay must (a) actually DROP late rows (the
    result is a strict subset of the batch totals), (b) follow Spark's
    split-watermark protocol — batch 1 keeps its rows (late filter uses
    the PREVIOUS batch's watermark = -inf) while batch 2's old rows
    drop — and (c) be deterministic across drains."""
    from pyspark.sql import functions as F

    from projet_graphdb_spark.streaming import drain, state_partitions, stream_source
    from projet_graphdb_spark.streaming.late_drop import (
        streaming_late_window_counts,
    )

    path, schema = stream_source(spark, SF_TINY)
    runs = []
    for i in range(2):
        with state_partitions(spark, 4):
            q = streaming_late_window_counts(
                spark, path, schema, query_name=f"t_late_drop{i}"
            )
        runs.append(
            sorted(map(tuple, drain(q, spark, f"t_late_drop{i}").collect()))
        )
    assert runs[0] == runs[1] and runs[0]  # deterministic, non-empty
    got = {w: n for w, n, _ in runs[0]}
    # full batch totals per window and per arrival batch
    ev = load_events(spark, SF_TINY).select(
        F.window("ts", "6 hours").start.alias("w"),
        (F.col("event_id") % 3).alias("b"),
    )
    per = {
        (r["w"], r["b"]): r["c"]
        for r in ev.groupBy("w", "b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    windows = sorted({w for w, _ in per})
    # every emitted early window holds batches 0+1 but NOT batch 2
    for w in windows[: len(windows) // 2]:
        want = per.get((w, 0), 0) + per.get((w, 1), 0)
        assert got[w] == want, (w, got[w], want)
        assert got[w] < want + per.get((w, 2), 0)  # batch 2 really dropped
    # the final (still-open) window is withheld by append mode
    assert windows[-1] not in got


def test_ingest_dedup_stream_restart_appends_nothing(spark, tmp_path):
    """A second availableNow drain over the SAME checkpoint must process
    zero batches: committed micro-batches are never replayed.  This is
    the EASY half of restart safety (the drained-restart no-op); the
    hard half — a batch whose write landed but whose commit didn't — is
    test_ingest_dedup_stream_midbatch_replay."""
    from pyspark.sql import functions as F

    from projet_graphdb_spark.functions import dedup
    from projet_graphdb_spark.streaming import (
        state_partitions,
        streaming_ingest_dedup,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    is_new = F.col("source").isin("src0", "src1")
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    base = str(tmp_path)
    shard.repartition(3).write.parquet(base + "/shard")
    schema = spark.read.parquet(base + "/shard").schema
    dedup.lsh_band_index(corpus).write.partitionBy("band").parquet(base + "/index")
    index = spark.read.parquet(base + "/index")
    counts = []
    for _ in range(2):
        with state_partitions(spark, 4):
            q = streaming_ingest_dedup(
                spark, base + "/shard", schema, corpus, index,
                base + "/pairs", base + "/ckpt", threshold=0.2,
            )
            assert q.awaitTermination(300)
        counts.append(spark.read.parquet(base + "/pairs").count())
    assert counts[0] == counts[1] and counts[0] > 0


def test_ingest_dedup_stream_midbatch_replay(spark, tmp_path):
    """Crash AFTER a micro-batch's pair write but BEFORE its checkpoint
    commit — the at-least-once window a blind append sink duplicates.
    Simulated mechanically: drain fully, then delete the NEWEST
    ckpt/commits/<n> file (its offsets/<n> survives, so restart replays
    batch n), re-drain, and require the pair set bit-identical — the
    per-batch-partition overwrite makes the replay a rewrite, not a
    duplicate append."""
    import os

    from pyspark.sql import functions as F

    from projet_graphdb_spark.functions import dedup
    from projet_graphdb_spark.streaming import (
        state_partitions,
        streaming_ingest_dedup,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    is_new = F.col("source").isin("src0", "src1")
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    base = str(tmp_path)
    shard.repartition(3).write.parquet(base + "/shard")
    schema = spark.read.parquet(base + "/shard").schema
    dedup.lsh_band_index(corpus).write.partitionBy("band").parquet(base + "/index")
    index = spark.read.parquet(base + "/index")

    def drain():
        with state_partitions(spark, 4):
            q = streaming_ingest_dedup(
                spark, base + "/shard", schema, corpus, index,
                base + "/pairs", base + "/ckpt", threshold=0.2,
            )
            assert q.awaitTermination(300)
        return q

    drain()
    key = lambda r: (r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
    before = sorted(map(key, spark.read.parquet(base + "/pairs").collect()))
    assert before
    # surgical crash: the batch's data write survives, its commit doesn't
    commits = [
        f for f in os.listdir(base + "/ckpt/commits") if not f.startswith(".")
    ]
    victim = max(commits, key=int)
    os.remove(f"{base}/ckpt/commits/{victim}")
    crc = f"{base}/ckpt/commits/.{victim}.crc"  # ChecksumFs sidecar: a
    if os.path.exists(crc):  # stale crc fails the replayed commit rename
        os.remove(crc)
    q2 = drain()
    # the victim batch really re-ran (not a drained no-op restart)
    assert q2.lastProgress is not None
    assert q2.lastProgress["batchId"] >= int(victim)
    after = sorted(map(key, spark.read.parquet(base + "/pairs").collect()))
    assert after == before


def test_compact_batch_sink_retention_and_recompaction(spark, tmp_path):
    """compact_batch_sink with retain_last keeps exactly the newest N
    batches' pairs (the x95 latest-N policy on the batch dimension),
    shrinks the file count, and a second compaction over the rewritten
    sink (batch_id now a data column) still works."""
    from pyspark.sql import functions as F

    from projet_graphdb_spark.functions import dedup
    from projet_graphdb_spark.streaming import (
        compact_batch_sink,
        state_partitions,
        streaming_ingest_dedup,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    is_new = F.col("source").isin("src0", "src1")
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    base = str(tmp_path)
    shard.repartition(4).write.parquet(base + "/shard")
    schema = spark.read.parquet(base + "/shard").schema
    dedup.lsh_band_index(corpus).write.partitionBy("band").parquet(base + "/index")
    with state_partitions(spark, 4):
        q = streaming_ingest_dedup(
            spark, base + "/shard", schema, corpus,
            spark.read.parquet(base + "/index"),
            base + "/pairs", base + "/ckpt", threshold=0.2,
        )
        assert q.awaitTermination(300)
    before = spark.read.parquet(base + "/pairs")
    batches = sorted(
        r["batch_id"] for r in before.select("batch_id").distinct().collect()
    )
    assert len(batches) >= 3  # several real micro-batches ran
    keep = batches[-2:]
    want = sorted(
        (r["new_id"], r["corpus_id"], r["batch_id"])
        for r in before.collect()
        if r["batch_id"] in keep
    )
    receipt = compact_batch_sink(
        spark, base + "/pairs", target_files=1, retain_last=2
    )
    assert receipt["files_after"] < receipt["files_before"]
    assert receipt["batches_kept"] == 2
    assert receipt["rows_after"] <= receipt["rows_before"]
    after = spark.read.parquet(base + "/pairs")
    got = sorted(
        (r["new_id"], r["corpus_id"], r["batch_id"]) for r in after.collect()
    )
    assert got == want
    # the rewrite preserves the Hive batch_id layout (round-9 advice:
    # a flat rewrite + one more micro-batch = conflicting-directory-
    # structure), so a later batch dir can land next to the compacted
    # ones and the sink still reads
    import os

    assert any(
        e.startswith("batch_id=") for e in os.listdir(base + "/pairs")
    ), "compacted sink lost its Hive batch layout"
    nxt = max(keep) + 1
    after.limit(1).drop("batch_id").write.parquet(base + f"/pairs/batch_id={nxt}")
    assert spark.read.parquet(base + "/pairs").count() == receipt["rows_after"] + 1
    # recompaction over the rewritten (still Hive-partitioned) sink
    receipt2 = compact_batch_sink(spark, base + "/pairs", target_files=1)
    assert receipt2["rows_after"] == receipt["rows_after"] + 1
    assert receipt2["batches_before"] == 3


def test_compact_batch_sink_already_compact_noop(spark, tmp_path):
    """Round-10 regression (BENCH_r10 e35 = -1.0): at bench scale AQE
    coalesces each micro-batch's pairs to ONE file, so the sink is
    already at the Hive-preserving compaction's floor (one file per
    kept batch).  Compacting that layout must be a graceful,
    row-preserving no-op — never a crash, never growth."""
    from pyspark.sql import functions as F

    from projet_graphdb_spark.streaming import compact_batch_sink

    base = str(tmp_path)
    rows = [(i, 100 + i, 0.5 + i / 100.0) for i in range(9)]
    df = spark.createDataFrame(rows, "new_id long, corpus_id long, jaccard double")
    for b in range(3):
        df.where(F.col("new_id") % 3 == b).coalesce(1).write.parquet(
            base + f"/pairs/batch_id={b}"
        )
    before = sorted(
        (r["new_id"], r["corpus_id"], r["batch_id"])
        for r in spark.read.parquet(base + "/pairs").collect()
    )
    receipt = compact_batch_sink(spark, base + "/pairs", target_files=2)
    assert receipt["files_before"] == receipt["batches_before"] == 3
    assert receipt["files_after"] <= receipt["files_before"]
    assert receipt["rows_after"] == receipt["rows_before"] == 9
    after = sorted(
        (r["new_id"], r["corpus_id"], r["batch_id"])
        for r in spark.read.parquet(base + "/pairs").collect()
    )
    assert after == before
    import os

    assert any(e.startswith("batch_id=") for e in os.listdir(base + "/pairs"))


def test_pair_files_per_batch_reproduces_small_files_then_shrinks(spark, tmp_path):
    """The e35 drain contract: ``pair_files_per_batch=4`` fans each
    micro-batch's pair write out to multiple files (the real-cluster
    small-files layout AQE hides at bench scale), so compaction has an
    actual shrink to perform and the strict assert holds at every SF."""
    import os

    from pyspark.sql import functions as F

    from projet_graphdb_spark.functions import dedup
    from projet_graphdb_spark.streaming import (
        compact_batch_sink,
        state_partitions,
        streaming_ingest_dedup,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    is_new = F.col("source").isin("src0", "src1")
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    base = str(tmp_path)
    shard.repartition(2).write.parquet(base + "/shard")
    schema = spark.read.parquet(base + "/shard").schema
    dedup.lsh_band_index(corpus).write.partitionBy("band").parquet(base + "/index")
    with state_partitions(spark, 4):
        q = streaming_ingest_dedup(
            spark, base + "/shard", schema, corpus,
            spark.read.parquet(base + "/index"),
            base + "/pairs", base + "/ckpt", threshold=0.2,
            pair_files_per_batch=4,
        )
        assert q.awaitTermination(300)

    def _nfiles(p):
        return sum(
            1
            for _r, _d, fs in os.walk(p)
            for f in fs
            if not f.startswith((".", "_"))
        )

    batch_dirs = [
        e for e in os.listdir(base + "/pairs") if e.startswith("batch_id=")
    ]
    assert batch_dirs
    # at least one non-empty batch landed in >1 file: the pathology exists
    assert any(_nfiles(f"{base}/pairs/{d}") > 1 for d in batch_dirs)
    before = sorted(
        (r["new_id"], r["corpus_id"])
        for r in spark.read.parquet(base + "/pairs").collect()
    )
    receipt = compact_batch_sink(spark, base + "/pairs", target_files=2)
    assert receipt["files_before"] > receipt["batches_before"]
    assert receipt["files_after"] < receipt["files_before"]  # strict shrink
    assert receipt["rows_after"] == receipt["rows_before"]
    after = sorted(
        (r["new_id"], r["corpus_id"])
        for r in spark.read.parquet(base + "/pairs").collect()
    )
    assert after == before


def test_ingest_dedup_stream_equals_one_shot(spark, tmp_path):
    """The foreachBatch incremental near-dup drain must union to the
    one-shot incremental_lsh_dups result: pairs are shard×corpus and
    band keys are per-document, so micro-batch boundaries cannot change
    the pair set.  Multiple real micro-batches are forced (4 shard
    files, maxFilesPerTrigger=1) so the per-batch path is exercised."""
    from pyspark.sql import functions as F

    from projet_graphdb_spark.functions import dedup
    from projet_graphdb_spark.streaming import (
        state_partitions,
        streaming_ingest_dedup,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    is_new = F.col("source").isin("src0", "src1")
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    base = str(tmp_path)
    shard.repartition(4).write.parquet(base + "/shard")
    schema = spark.read.parquet(base + "/shard").schema
    dedup.lsh_band_index(corpus).write.partitionBy("band").parquet(base + "/index")
    with state_partitions(spark, 4):
        q = streaming_ingest_dedup(
            spark, base + "/shard", schema, corpus,
            spark.read.parquet(base + "/index"),
            base + "/pairs", base + "/ckpt", threshold=0.2,
        )
        assert q.awaitTermination(300)
    # >1 micro-batch actually ran (one per shard file)
    assert q.lastProgress["batchId"] >= 2
    key = lambda r: (r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
    got = sorted(map(key, spark.read.parquet(base + "/pairs").collect()))
    want = sorted(map(key, dedup.incremental_lsh_dups(
        corpus, shard, threshold=0.2).collect()))
    assert got == want and got


def test_image_ingest_stream_midbatch_replay(spark, tmp_path):
    """e39's exactly-once-AS-READ pin, image tier: crash AFTER a
    micro-batch's pair write but BEFORE its checkpoint commit (delete
    the newest ckpt commit file), re-drain, and require the pair set
    bit-identical — a batch's pairs are a pure function of its media
    files under the index's persisted layout, so the per-batch
    partition overwrite rewrites identical rows.  Also pins the
    drained union == the one-shot incremental_dhash_dups over the
    whole shard (batch boundaries cannot change the pair set)."""
    import os

    from pyspark.sql import functions as F

    from projet_graphdb_spark.functions import multimodal
    from projet_graphdb_spark.streaming import (
        state_partitions,
        streaming_image_ingest_dedup,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    twin_text = F.expr(
        "concat(substring(text, 1, greatest(length(text) div 2, 1) - 1),"
        " '~', substring(text, greatest(length(text) div 2, 1) + 1))"
    )
    corpus_media = docs.select(
        (F.col("doc_id") * 2).alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    shard_media = docs.where(F.col("source").isin("src0", "src1")).select(
        (F.col("doc_id") * 2 + 1).alias("media_id"),
        F.encode(twin_text, "UTF-8").alias("payload"),
    )
    base = str(tmp_path)
    shard_media.repartition(3).write.parquet(base + "/shard")
    schema = spark.read.parquet(base + "/shard").schema
    multimodal.dhash_band_index(corpus_media, bands=4).write.partitionBy(
        "band"
    ).parquet(base + "/index")
    index = spark.read.parquet(base + "/index")

    def drain():
        with state_partitions(spark, 4):
            q = streaming_image_ingest_dedup(
                spark, base + "/shard", schema, index,
                base + "/pairs", base + "/ckpt", bands=4,
            )
            assert q.awaitTermination(300)
        return q

    drain()
    key = lambda r: (r["new_id"], r["corpus_id"], r["hd"])
    before = sorted(map(key, spark.read.parquet(base + "/pairs").collect()))
    assert before
    # batch-boundary invariance: drained union == one-shot incremental
    oneshot = sorted(map(key, multimodal.incremental_dhash_dups(
        shard_media, index, bands=4
    ).collect()))
    assert before == oneshot
    commits = [
        f for f in os.listdir(base + "/ckpt/commits") if not f.startswith(".")
    ]
    victim = max(commits, key=int)
    os.remove(f"{base}/ckpt/commits/{victim}")
    crc = f"{base}/ckpt/commits/.{victim}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    q2 = drain()
    assert q2.lastProgress is not None
    assert q2.lastProgress["batchId"] >= int(victim)
    after = sorted(map(key, spark.read.parquet(base + "/pairs").collect()))
    assert after == before
