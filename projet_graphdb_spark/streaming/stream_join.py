"""Stream-stream join: purchases joined to preceding clicks.

The batch form reuses the bucketed range join (functions/ranges.py); the
streaming twin is a genuine stream-stream inner join — both sides are
unbounded, and Spark keeps join state only as long as the watermark +
range condition allow (each purchase can only match clicks at most
``window_s`` older, so click state older than
``watermark_delay + window_s`` is evicted).  That time-bounded state is
the property that lets the join run forever at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ranges import bucketed_range_join


def click_purchase_pairs_batch(events: DataFrame, window_s: int = 3600) -> DataFrame:
    """(user_id, purchase_id, purchase_ts, click_ts) for every click in
    the ``window_s`` seconds before each purchase (inclusive)."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = bucketed_range_join(
        purchases, clicks, keys=["user_id"], lower_s=-window_s, upper_s=0
    )
    return out.select(
        "user_id",
        "purchase_id",
        F.col("ts").alias("purchase_ts"),
        F.col("_r_ts").alias("click_ts"),
    )


def click_purchase_pairs_stream(
    spark: SparkSession,
    events_path: str,
    schema,
    window_s: int = 3600,
    watermark: str = "2 hours",
    query_name: str = "cp_pairs",
):
    """The same pairs as a stream-stream inner join.

    Both inputs carry watermarks; the join condition's time range bounds
    how long click rows stay in state.  Returns the StreamingQuery
    writing to the in-memory table ``query_name``.
    """
    ev = spark.readStream.schema(schema).parquet(events_path)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"user_id = c_user_id AND "
            f"click_ts BETWEEN purchase_ts - INTERVAL {window_s} SECONDS AND purchase_ts"
        ),
        "inner",
    ).select("user_id", "purchase_id", "purchase_ts", "click_ts")
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def click_purchase_left_stream(
    spark: SparkSession,
    events_path: str,
    schema,
    window_s: int = 3600,
    watermark: str = "2 hours",
    query_name: str = "cp_left",
):
    """LEFT OUTER stream-stream join: every purchase emits — matched
    pairs eagerly, unmatched purchases null-extended once the click
    watermark passes their timestamp (no qualifying click can arrive
    any more).  The second stream-join output contract next to the
    inner form: at scale this is how "orders that never got a
    confirmation" style monitoring runs continuously with bounded
    state."""
    ev = spark.readStream.schema(schema).parquet(events_path)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"user_id = c_user_id AND "
            f"click_ts BETWEEN purchase_ts - INTERVAL {window_s} SECONDS AND purchase_ts"
        ),
        "left_outer",
    ).select("user_id", "purchase_id", "purchase_ts", "click_ts")
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def click_purchase_left_batch(
    events: DataFrame, window_s: int = 3600, watermark_hours: int = 2
) -> DataFrame:
    """Batch twin of the left-outer stream join INCLUDING its emission
    contract: matched pairs always present; unmatched purchases present
    null-extended only when the final watermark (max ts − delay) has
    passed their timestamp."""
    inner = click_purchase_pairs_batch(events, window_s)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    # the GLOBAL watermark is the min over every watermarked input: the
    # slower side (here clicks) holds back null-emission for everyone
    wm = events.where(F.col("event_type").isin("purchase", "click")).groupBy(
        "event_type"
    ).agg(F.max("ts").alias("_m")).agg(
        (F.min("_m") - F.expr(f"INTERVAL {watermark_hours} HOURS")).alias("_wm")
    )
    unmatched = (
        purchases.join(inner.select("purchase_id"), "purchase_id", "left_anti")
        .crossJoin(F.broadcast(wm))
        .where(F.col("purchase_ts") < F.col("_wm"))
        .select(
            "user_id", "purchase_id", "purchase_ts",
            F.lit(None).cast("timestamp").alias("click_ts"),
        )
    )
    return inner.unionByName(unmatched)
