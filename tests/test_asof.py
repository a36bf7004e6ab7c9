"""As-of join: hand-checked point-in-time semantics (exact-match
boundary, strict-before mode, no-match nulls, per-key isolation)."""

from datetime import datetime

from pyspark.sql import functions as F

from projet_graphdb_spark.functions.asof import asof_join


def ts(minute):
    return datetime(2024, 1, 1, minute // 60, minute % 60)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "l1"), (1, ts(30), "l2"), (2, ts(5), "l3"), (3, ts(10), "l4")],
        "k long, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [(1, ts(10), 100.0), (1, ts(20), 200.0), (2, ts(7), 300.0)],
        "k long, ts timestamp, rval double",
    )
    return left, right


def _collect(df):
    return {
        (r["k"], r["ts"]): r["_r_rval"]
        for r in df.select("k", "ts", "_r_rval").collect()
    }


def test_backward_exact(spark):
    left, right = _frames(spark)
    out = _collect(asof_join(left, right, ["k"], "ts", ["rval"]))
    assert out == {
        (1, ts(10)): 100.0,  # exact-ts right row matches
        (1, ts(30)): 200.0,  # latest at-or-before wins
        (2, ts(5)): None,    # right row is later -> no match
        (3, ts(10)): None,   # key absent on right
    }


def test_backward_strict(spark):
    left, right = _frames(spark)
    out = _collect(
        asof_join(left, right, ["k"], "ts", ["rval"], exact_matches=False)
    )
    # the equal-ts row at (1, ts(10)) is now excluded
    assert out[(1, ts(10))] is None
    assert out[(1, ts(30))] == 200.0


def test_left_columns_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", ["rval"])
    assert out.columns == ["k", "ts", "lval", "_r_rval"]
    assert out.count() == left.count()  # never drops or duplicates left rows


def test_multiple_value_cols_come_from_same_row(spark):
    spark_df = spark.createDataFrame
    left = spark_df([(1, ts(40))], "k long, ts timestamp")
    right = spark_df(
        [(1, ts(10), 1.0, "a"), (1, ts(20), 2.0, "b")],
        "k long, ts timestamp, x double, tag string",
    )
    row = asof_join(left, right, ["k"], "ts", ["x", "tag", "ts"]).collect()[0]
    # all carried columns must come from the single latest right row
    assert (row["_r_x"], row["_r_tag"], row["_r_ts"]) == (2.0, "b", ts(20))


def test_asof_forward_picks_earliest_at_or_after(spark):
    import datetime as dt

    def ts(m):
        return dt.datetime(2024, 1, 1, 12, m)

    from projet_graphdb_spark.functions.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, ts(30)), (1, 11, ts(50)), (2, 12, ts(0))],
        "k long, pid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(20), 100.0), (1, ts(30), 200.0), (1, ts(40), 300.0)],
        "k long, ts timestamp, v double",
    )
    out = {r["pid"]: r["_r_v"] for r in asof_join(
        left, right, keys=["k"], ts="ts", value_cols=["v"], direction="forward"
    ).collect()}
    # pid 10: exact-ts 12:30 match included; pid 11: nothing after; pid 12: other key... k=2 none
    assert out == {10: 200.0, 11: None, 12: None}

    strict = {r["pid"]: r["_r_v"] for r in asof_join(
        left, right, keys=["k"], ts="ts", value_cols=["v"],
        direction="forward", exact_matches=False,
    ).collect()}
    assert strict[10] == 300.0  # equal-ts excluded -> next later row
