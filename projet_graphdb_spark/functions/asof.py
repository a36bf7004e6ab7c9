"""As-of (point-in-time) join — a core training-pipeline operator the
reference lacks entirely (SURVEY §2.2: no joins beyond edge-existence,
`/root/reference/graphDB/lib/sem.ml:317-329`).

For each left row, attach the columns of the latest right row with the
same key whose timestamp is <= (or <, with ``exact_matches=False``) the
left timestamp.

Spark-native strategy: **union-tag + window**, NOT a range join.  A
range-join (`l.ts >= r.ts`) explodes to O(|L|·|R|) candidate pairs per
key before picking the max; the union form is one shuffle on the key,
one per-partition sort on (ts, tag), and a running `last(ignorenulls)`
— O((|L|+|R|) log) per partition and no intermediate blow-up, which is
the difference between working and not working at 100 TB.  Skewed keys
degrade gracefully under AQE; for a pathological single hot key, salt
the key and as-of join per salt with boundary hand-off.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    value_cols: Sequence[str],
    exact_matches: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: ``backward`` = latest right row at-or-before each left
    row (the point-in-time default); ``forward`` = earliest right row
    at-or-after (next-event attribution).

    Output = all ``left`` columns + one column per ``value_cols`` entry
    (null when no right row qualifies).  ``right`` must be unique per
    (keys, ts) for deterministic results — pre-aggregate if it is not.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    tagged_r = right.select(
        *keys, ts, *[F.col(c).alias(f"_r_{c}") for c in value_cols]
    ).withColumn("_t", F.lit(0))
    tagged_l = left.withColumn("_t", F.lit(1))
    u = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    # traversal order: ascending ts for backward, descending for forward
    # — "preceding" in the frame then means earlier/later respectively.
    # Right rows sort before left rows at equal ts (tag 0 < 1), so an
    # exact-ts match is inside the left row's frame; flipped order puts
    # the equal-ts right row after the left row — excluded = strict
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    tag_order = F.col("_t").asc() if exact_matches else F.col("_t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, tag_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *left.columns,
        F.col("_t"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_t") == 1).drop("_t")
