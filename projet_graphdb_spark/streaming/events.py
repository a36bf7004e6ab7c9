"""Event-stream operators: tumbling-window aggregation, batch + streaming.

The reference has no streaming surface at all (SURVEY §2.2), so this is
a pure Spark-native extension: the same windowed aggregation is exposed

* as a **batch** query (oracle-checkable against DuckDB ``date_trunc``),
* as a **Structured Streaming** query over a file source with a
  watermark, trigger ``availableNow`` — the scale path for continuous
  ingest; state store size is bounded by (watermark horizon × keys).

Batch/stream parity is asserted in tests: running the stream to
completion over the same files must equal the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events fixture, normalizing ``ts`` to session TIMESTAMP.

    The fixture's physical type has varied across driver generations —
    TIMESTAMP(NANOS) (readable only as long nanoseconds via the legacy
    conf) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    TIMESTAMP_NTZ).  Downstream operators need the session TIMESTAMP
    type (watermarks and ``unix_micros`` reject NTZ), so every variant
    is normalized here; the loader works in ANY session, not just the
    ones built by ``engine.session.get_spark``.
    """
    try:
        # Without this (runtime-settable) conf a TIMESTAMP(NANOS) scan
        # throws PARQUET_TYPE_ILLEGAL before any operator runs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # integer division: epoch-nanos exceed 2^53, double division would
        # round the microsecond value off by one
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # interpret the naive value in the session timezone (UTC in this
        # deployment) — collected wall-clock values are unchanged
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def windowed_event_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window per-type event stats (batch).

    Output: (window_start, event_type, n_events, sum_value) — one shuffle
    on (window, type); sum in DECIMAL for order-independence.
    """
    return (
        events.groupBy(
            F.window("ts", window).alias("_w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_stats(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """SLIDING-window per-type event stats (batch): each event lands in
    window/slide overlapping windows (4 for 1 h / 15 min) — the hopping
    aggregation used for rolling dashboards and rate limits.

    Spark's ``window(ts, window, slide)`` expands each row to its
    overlapping windows BEFORE the aggregate, so the shuffle carries
    the (window/slide)× fan-out of partial aggregates, map-side
    combined — still one exchange, no self-join.  Same DECIMAL sum
    discipline as the tumbling form; the streaming twin is
    ``streaming_windowed_counts`` with the same (window, slide) pair.

    Output: (window_start, event_type, n_events, sum_value).
    """
    return (
        events.groupBy(
            F.window("ts", window, slide).alias("_w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_windowed_counts(
    spark: SparkSession,
    events_path: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "ev_counts",
    output_mode: str = "complete",
    slide: str | None = None,
):
    """The same aggregation as a Structured Streaming query.

    Reads the parquet file(s) as a stream, applies an event-time
    watermark (late data beyond ``watermark`` is dropped and state is
    reclaimed — the knob that bounds state at scale), aggregates into
    tumbling windows, and writes to a memory sink with trigger
    ``availableNow`` (process all available input, then stop).

    ``output_mode``: ``complete`` re-emits every window at each trigger
    (what the batch oracle equals); ``append`` emits a window exactly
    once, when the event-time watermark passes its END — the finalized-
    results contract, so windows still open at end-of-input stay in
    state and are NOT emitted (the e11 driver query pins exactly that
    semantics against a batch oracle applying the same predicate).

    Returns the StreamingQuery; results land in the in-memory table
    ``query_name`` with the same schema as ``windowed_event_stats``.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide or window).alias("_w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def streaming_windowed_to_parquet(
    spark: SparkSession,
    events_path: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "0 seconds",
):
    """The windowed aggregation written to a PARQUET file sink — the
    durable-output form of ``streaming_windowed_counts``.

    The file sink requires append mode, so a (window, type) row is
    written exactly once, when the event-time watermark passes the
    window END — the finalized-results contract that makes the output
    directory safely consumable by downstream batch jobs while the
    stream runs.  The checkpoint directory carries the sink's
    exactly-once file manifest: restarts never double-write.  Windows
    not yet closed by the watermark at end-of-input stay in state (a
    later run with more data emits them).
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("_w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_enriched_stats(
    spark: SparkSession,
    events_path: str,
    schema,
    dim: DataFrame,
    dim_key: str = "c_custkey",
    dim_attr: str = "c_mktsegment",
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "ev_enriched",
):
    """Stream-static enrichment join + windowed aggregation: each
    micro-batch of the event stream joins the (bounded, slowly-changing)
    dimension table, then aggregates into tumbling windows per
    (dimension attribute, event type).

    The stream-static join is STATELESS — Spark re-plans it per
    micro-batch as an ordinary broadcast hash join (the dimension is
    broadcast once per batch, never held in the state store), which is
    why it's the recommended shape for enrichment at scale: state cost
    stays (watermark horizon × group keys) regardless of dimension
    size, and a dimension refresh is picked up by the next batch.

    Returns the StreamingQuery writing to the in-memory table
    ``query_name``: (window_start, seg, event_type, n_events, sum_value).
    """
    from pyspark.sql import functions as SF

    d = SF.broadcast(
        dim.select(SF.col(dim_key).alias("_k"), SF.col(dim_attr).alias("seg"))
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .join(d, SF.col("user_id") == SF.col("_k"))
        .withWatermark("ts", watermark)
        .groupBy(SF.window("ts", window).alias("_w"), SF.col("seg"), SF.col("event_type"))
        .agg(
            SF.count(SF.lit(1)).alias("n_events"),
            SF.sum(SF.col("value").cast("decimal(25,2)")).cast("double").alias("sum_value"),
        )
        .select(
            SF.col("_w.start").alias("window_start"),
            "seg",
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def streaming_daily_topk(
    spark: SparkSession,
    events_path: str,
    schema,
    k: int = 3,
    query_name: str = "daily_topk_sink",
):
    """Streaming twin of the trending leaderboard: the per-(day, type)
    counts run as a REAL Structured Streaming aggregation (file stream →
    1-day event-time watermark → tumbling 1-day windows → memory sink,
    drained availableNow); the rank/share step is a batch post-
    aggregation over the drained DAY×TYPE table — which is tiny by
    construction, exactly the split a production monitor uses (heavy
    count state in the stream, leaderboard math on the aggregate).

    Returns (day, rank, event_type, n_events, share) — the
    ``relational.daily_topk_types`` batch shape.
    """
    from pyspark.sql.window import Window as W

    from .harness import drain

    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("_w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("_w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    per = drain(q, spark, query_name)
    wday = W.partitionBy("day")
    ranked = per.withColumn(
        "rank",
        F.row_number().over(
            wday.orderBy(F.col("n_events").desc(), F.col("event_type"))
        ),
    ).withColumn("_tot", F.sum("n_events").over(wday))
    return (
        ranked.where(F.col("rank") <= k)
        .select(
            "day", "rank", "event_type", "n_events",
            F.round(F.col("n_events") / F.col("_tot"), 6).alias("share"),
        )
        .orderBy("day", "rank")
    )


def watermark_lateness_audit(
    events: DataFrame,
    delays_minutes: tuple = (0, 30, 60, 120),
    arrival_col: str = "event_id",
    bucket_size: int = 1000,
) -> DataFrame:
    """Watermark sizing report: for each candidate delay, how many
    events would a watermark of that delay DROP — the measurement that
    picks the state-size/completeness trade-off before a streaming job
    ships.  Arrival order is the ingest sequence (``event_id``); an
    event is late by (max event-time seen in strictly earlier arrival
    buckets − its own event time).

    Scale design: NO global-order window over the fact table.  Arrival
    is bucketed (``arrival_col`` div ``bucket_size``); per-bucket max
    event times form a TINY table (rows = n/bucket_size) whose
    strictly-earlier running max is computed as sorted-array prefix
    math (collect_list + posexplode + aggregate-slice — O(buckets²) on
    a bounded table, and never an unpartitioned window: a warning-free
    bench makes any new global-window warning a regression signal);
    the fact table then joins that bucket watermark back
    broadcast-style.  First-bucket events are never late (no earlier
    arrivals).

    Output: (delay_minutes, n_late, n_total) per candidate delay.
    """
    b = (F.col(arrival_col) / bucket_size).cast("long")
    evb = events.select(F.col("ts"), b.alias("_b"))

    bmax = evb.groupBy("_b").agg(F.max("ts").alias("_bm"))
    # running max over the bucket TABLE (tiny), not the events: prefix
    # max of strictly-earlier buckets via array slice
    wm = (
        bmax.agg(F.array_sort(F.collect_list(F.struct("_b", "_bm"))).alias("_a"))
        .select(F.posexplode("_a").alias("_i", "_s"), "_a")
        .select(
            F.col("_s._b").alias("_b"),
            F.when(
                F.col("_i") >= 1,
                F.expr(
                    "aggregate(slice(_a, 1, _i), CAST(NULL AS TIMESTAMP),"
                    " (acc, x) -> CASE WHEN acc IS NULL OR x._bm > acc"
                    " THEN x._bm ELSE acc END)"
                ),
            ).alias("_wm"),
        )
    )
    late_by = F.unix_micros(F.col("_wm")) - F.unix_micros(F.col("ts"))
    tagged = evb.join(F.broadcast(wm), "_b").select(
        F.coalesce(late_by, F.lit(0)).alias("_late_us")
    )
    rows = [
        tagged.agg(
            F.sum(
                (F.col("_late_us") > d * 60_000_000).cast("long")
            ).alias("n_late"),
            F.count(F.lit(1)).alias("n_total"),
        ).select(
            F.lit(int(d)).alias("delay_minutes"), "n_late", "n_total"
        )
        for d in delays_minutes
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("delay_minutes")


def streaming_daily_peak(
    spark: SparkSession,
    events_path: str,
    schema,
    query_name: str = "daily_peak",
    window: str = "15 minutes",
    day: str = "1 day",
    watermark: str = "2 hours",
):
    """CHAINED stateful streaming aggregation (Spark ≥3.4 multiple
    stateful operators): quarter-hour counts per event type, then a
    second windowed aggregate over ``window_time`` of the first —
    per-day peak quarter-hour rate and day total, emitted append-mode
    when the watermark passes the day end.

    This is the two-tier rollup every monitoring pipeline wants
    (fine-grain rate → daily summary) expressed as ONE streaming query:
    no intermediate sink, no second job, state for both tiers bounded
    by the same watermark.  At scale tier 1's state is
    O(open windows × types) and tier 2's O(open days × types) — the
    chain STRICTLY SHRINKS state versus materializing tier 1.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("_qh"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy(
            F.window(F.window_time("_qh"), day).alias("_day"), F.col("event_type")
        )
        .agg(
            F.max("n_events").alias("peak_qh"),
            F.sum("n_events").alias("day_total"),
        )
        .select(
            F.col("_day.start").alias("day_start"),
            "event_type",
            "peak_qh",
            "day_total",
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def daily_peak_batch(events: DataFrame, watermark_hours: int = 2) -> DataFrame:
    """Batch twin of ``streaming_daily_peak`` INCLUDING the append-mode
    emission contract: only days whose end the final watermark
    (max ts − delay) has passed are present."""
    qh = events.groupBy(
        F.window("ts", "15 minutes").alias("_qh"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    day = qh.groupBy(
        F.window(F.col("_qh.start"), "1 day").alias("_day"), F.col("event_type")
    ).agg(F.max("n_events").alias("peak_qh"), F.sum("n_events").alias("day_total"))
    wm = events.agg(
        (F.max("ts") - F.expr(f"INTERVAL {watermark_hours} HOURS")).alias("_wm")
    )
    return (
        day.crossJoin(F.broadcast(wm))
        .where(F.col("_day.end") <= F.col("_wm"))
        .select(
            F.col("_day.start").alias("day_start"),
            "event_type",
            "peak_qh",
            "day_total",
        )
    )
