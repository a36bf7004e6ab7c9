"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB the failure mode of a plain ``groupBy``/``join`` is a handful
of hot keys concentrating on a handful of reducers while the rest of the
cluster idles.  AQE's skew-join splitting handles the join case at
runtime; these operators are the *declarative* mitigations for when the
skew is known (power-law keys) or when the aggregate itself is the
bottleneck:

* ``salted_agg`` — two-phase aggregation: append a random salt to the
  group key, partially aggregate on (key, salt) — spreading each hot key
  over ``n_salts`` reducers — then aggregate the partials on the bare
  key.  Works for any algebraic aggregate (sum/count/min/max and
  combinations like mean = sum/count).
* ``salted_join`` — replicate the small side ``n_salts`` times (one copy
  per salt value) and salt the big side's key randomly, so each hot
  key's rows spread over ``n_salts`` reducers.  Exact same join result,
  bounded per-task input.

The semantics are IDENTICAL to the unsalted operators (that is the
point), which is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list,
    aggs: dict,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: {output_name: (input_col, fn)} with fn in
    {"sum", "count", "min", "max"}.  The salt is a deterministic hash of
    a per-row unique expression modulo ``n_salts`` would also work; we
    use ``rand``-free ``monotonically_increasing_id() % n_salts`` to
    stay deterministic within a run while still spreading rows.
    """
    salt = (F.monotonically_increasing_id() % n_salts).alias("_salt")
    in_cols = []
    for c, _ in aggs.values():
        if c not in in_cols and c not in group_cols:
            in_cols.append(c)
    salted = df.select(*group_cols, salt, *in_cols)

    phase1 = salted.groupBy(*group_cols, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(f"_p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    # merge partials: sum-of-sums, sum-of-counts, min-of-mins, max-of-maxs
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    return phase1.groupBy(*group_cols).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Result is identical to ``big.join(small, on, how)`` for inner/left
    joins; each hot key's rows are spread across ``n_salts`` partitions.
    The small side grows by ``n_salts``×, so this is for genuinely
    asymmetric joins (dimension tables, lookup maps) where the hot-key
    row count, not the dimension size, is the problem.
    """
    big_s = big.withColumn("_salt", (F.monotonically_increasing_id() % n_salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, on=on + ["_salt"], how=how)
    return out.drop("_salt")
