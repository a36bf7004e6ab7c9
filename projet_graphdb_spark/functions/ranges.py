"""Range (interval) join — equality-join reformulation.

The reference has no temporal operators at all (its only join is the
edge-existence semi-join, `graphDB/lib/sem.ml:317-329`); this is part of
the Spark-native extension surface for event data.

A naive range join ``l JOIN r ON l.key = r.key AND r.ts BETWEEN
l.ts+lower AND l.ts+upper`` plans as a broadcast-nested-loop or a
per-key cross product — quadratic in the hot keys and unusable at
100 TB.  The scale-safe form used here is **time bucketing**: pick a
bucket width equal to the window span, tag each right row with its
bucket, explode each left row to the (at most two, in general
``span/width + 1``) consecutive buckets its window can touch, and
equi-join on ``(key, bucket)`` before applying the exact range filter.
Cost: one shuffle on ``(key, bucket)``; fan-out is a small constant; the
per-bucket work is proportional to matches, never to |L|x|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = -3600,
    upper_s: int = 0,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with
    ``right_ts ∈ [left_ts + lower_s, left_ts + upper_s]`` (seconds).

    Right-side columns are kept as-is, so callers should alias clashing
    names beforehand (ts columns excepted: the right ts is exposed as
    ``_r_ts``).  ``how`` may be ``inner`` or ``left`` (left keeps
    unmatched left rows with NULL right columns).
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    span = max(upper_s - lower_s, 1)
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    span_us = span * 1_000_000

    r = right.withColumn("_r_ts", F.col(right_ts)).drop(right_ts)
    r = r.withColumn("_bucket", F.floor(F.unix_micros(F.col("_r_ts")) / span_us))
    # a window of width `span` starting anywhere overlaps at most two
    # width-`span` buckets
    lo_bucket = F.floor((l_us + lower_s * 1_000_000) / span_us)
    hi_bucket = F.floor((l_us + upper_s * 1_000_000) / span_us)
    el = left.withColumn("_bucket", F.explode(F.sequence(lo_bucket, hi_bucket)))

    cond = [el["_bucket"] == r["_bucket"]] + [el[k] == r[k] for k in keys]
    joined = el.join(r, cond, "inner")
    in_range = (
        F.unix_micros(r["_r_ts"]) >= F.unix_micros(el[left_ts]) + F.lit(lower_s * 1_000_000)
    ) & (F.unix_micros(r["_r_ts"]) <= F.unix_micros(el[left_ts]) + F.lit(upper_s * 1_000_000))
    out = joined.filter(in_range)
    drop_cols = [r["_bucket"], el["_bucket"]] + [r[k] for k in keys]
    for c in drop_cols:
        out = out.drop(c)
    if how != "inner":
        # left semantics = exact inner matches UNION unmatched left rows
        # null-extended.  (A plain left join over the exploded buckets is
        # wrong twice over: a left row whose bucket matches but whose
        # exact range never does would be dropped, and a row matched in
        # one exploded bucket but not another would keep a spurious NULL
        # row.)  Anti-join on null-safe equality of all left columns —
        # duplicate left rows have identical match sets, so multiplicity
        # is preserved either way.
        l_cols = list(left.columns)
        match_spine = out.select(*l_cols).dropDuplicates()
        anti_cond = [left[c].eqNullSafe(match_spine[c]) for c in l_cols]
        unmatched = left.join(match_spine, anti_cond, "left_anti")
        r_fields = [f for f in r.drop("_bucket", *[k for k in keys]).schema.fields]
        unmatched = unmatched.select(
            *l_cols,
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in r_fields],
        )
        out = out.unionByName(unmatched)
    return out


def range_count(
    left: DataFrame,
    right: DataFrame,
    keys: list,
    left_id: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = -3600,
    upper_s: int = 0,
) -> DataFrame:
    """Count right rows in each left row's window.

    Output: keys + (left_id, left_ts, n_in_range) — one row per left
    row, zero-count rows included (computed as inner-join + re-join to
    the left spine so the heavy path stays an equi-join).
    """
    matches = bucketed_range_join(
        left, right, keys, left_ts, right_ts, lower_s, upper_s, how="inner"
    )
    counts = matches.groupBy(left_id).agg(F.count(F.lit(1)).alias("n_in_range"))
    spine = left.select(*keys, left_id, left_ts)
    return spine.join(counts, on=left_id, how="left").withColumn(
        "n_in_range", F.coalesce(F.col("n_in_range"), F.lit(0))
    )
