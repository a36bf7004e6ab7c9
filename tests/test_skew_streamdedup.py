"""Salted skew operators (result-identical to unsalted) and
watermark-bounded streaming dedup (batch/stream parity)."""

import pytest
from pyspark.sql import functions as F

from projet_graphdb_spark.functions import skew
from projet_graphdb_spark.streaming import (
    dedup_events_batch,
    dedup_events_stream,
    load_events,
)

from conftest import SF_TINY


def test_salted_agg_equals_plain_agg(spark):
    li = spark.read.parquet(f"{SF_TINY}/lineitem.parquet")
    plain = {
        (r["l_returnflag"],): (r["s"], r["n"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count("l_quantity").alias("n"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["s"], r["n"], r["mx"])
        for r in skew.salted_agg(
            li,
            ["l_returnflag"],
            {
                "s": ("l_quantity", "sum"),
                "n": ("l_quantity", "count"),
                "mx": ("l_quantity", "max"),
            },
            n_salts=7,
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain_join(spark):
    orders = spark.read.parquet(f"{SF_TINY}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{SF_TINY}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = sorted(
        (r["o_orderkey"], r["c_mktsegment"])
        for r in orders.join(cust, on=["o_custkey"]).collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_mktsegment"])
        for r in skew.salted_join(orders, cust, on=["o_custkey"], n_salts=5).collect()
    )
    assert plain == salted


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    small = spark.createDataFrame([(1, "X"), (2, "Y")], "k long, w string")
    out = {
        r["k"]: r["w"]
        for r in skew.salted_join(big, small, on=["k"], n_salts=3, how="left").collect()
    }
    assert out == {1: "X", 2: "Y", 99: None}


def test_stream_dedup_matches_batch(spark, tmp_path):
    events = load_events(spark, SF_TINY).select("user_id", "event_type", "ts")
    # inject exact duplicates so the dedup actually has work to do
    dup = events.limit(200)
    src = str(tmp_path / "ev_dup")
    events.unionAll(dup).unionAll(dup).write.parquet(src)
    schema = spark.read.parquet(src).schema

    batch = dedup_events_batch(spark.read.parquet(src))
    n_batch = batch.count()
    assert n_batch == events.distinct().count()  # duplicates removed

    q = dedup_events_stream(spark, src, schema, query_name="t_dedup")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_dedup")
    assert got.count() == n_batch
    # exact set parity, not just counts
    assert batch.exceptAll(got).isEmpty() and got.exceptAll(batch).isEmpty()


def test_stream_stream_join_matches_batch(spark, tmp_path):
    from projet_graphdb_spark.streaming import (
        click_purchase_pairs_batch,
        click_purchase_pairs_stream,
    )

    events = load_events(spark, SF_TINY)
    src = str(tmp_path / "ev_join")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    batch = click_purchase_pairs_batch(spark.read.parquet(src))
    q = click_purchase_pairs_stream(spark, src, schema, query_name="t_cp")
    q.awaitTermination(180)
    got = spark.table("t_cp")
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, got.collect()))
    assert len(b) > 0
    assert b == s


def test_left_outer_stream_join_parity(spark):
    """Left-outer stream-stream join equals the batch twin, including
    the min-over-inputs global-watermark null-emission contract."""
    from conftest import SF_TINY
    from projet_graphdb_spark.streaming import drain, state_partitions, stream_source
    from projet_graphdb_spark.streaming.events import load_events
    from projet_graphdb_spark.streaming.stream_join import (
        click_purchase_left_batch,
        click_purchase_left_stream,
    )

    path, schema = stream_source(spark, SF_TINY)
    with state_partitions(spark, 4):
        q = click_purchase_left_stream(spark, path, schema, query_name="t_cp_left")
    key = lambda t: tuple(str(x) for x in t)
    got = sorted(map(tuple, drain(q, spark, "t_cp_left").collect()), key=key)
    want = sorted(
        map(tuple, click_purchase_left_batch(load_events(spark, SF_TINY)).collect()),
        key=key,
    )
    assert got == want and len(got) > 0
    assert any(t[-1] is None for t in got)          # real null-extensions present
