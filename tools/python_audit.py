"""JVM-side discipline audit: which query plans touch Python at all?

"UDFs are the slow path" is this repo's rule; this tool verifies it
mechanically.  For every batch query it builds the DataFrame and greps
the physical plan for Python evaluation operators:

- ``BatchEvalPython`` — row-at-a-time Python UDF: FORBIDDEN anywhere
  (exit 1).  ~10-100× slower than Arrow; there is always a built-in or
  pandas_udf alternative.
- ``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandasWithState`` — Arrow-batched: allowed, but
  every plan containing one is LISTED so the Python surface stays
  deliberate and reviewable (each listed query documents why JVM
  built-ins can't express it, e.g. the BLAS argpartition assignment
  past the literal cutoff, or media decode stubs).

KNOWN BLIND SPOT (shared with shuffle_audit): only the returned
DataFrame's plan is grepped, so a Python operator upstream of an eager
``localCheckpoint`` would be invisible here.  The checkpoint-based
pipelines (d-family minhash) are pure-JVM higher-order-function
column algebra by construction — pinned by their oracles — so the
blind spot does not change this audit's conclusion; it is recorded so
a future checkpointed Python stage isn't assumed covered.

Usage: python tools/python_audit.py [sf_dir] [--json out]
Default sf_dir: /root/testdata/sf0.001 (plan SHAPE is SF-independent).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
import explain_audit as EA  # noqa: E402
from projet_graphdb_spark.engine import get_spark  # noqa: E402

ARROW_NODES = (
    "ArrowEvalPython",
    "FlatMapGroupsInPandasWithState",
    "FlatMapGroupsInPandas",
    "MapInPandas",
)


def main():
    args = sys.argv[1:]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark(app_name="python-audit")
    streaming = getattr(E, "STREAMING_QUERIES", frozenset()) | EA.SKIP
    arrow_users: dict = {}
    row_at_a_time: dict = {}
    n_pure_jvm = 0
    errors = 0
    for name, fn in E.queries().items():
        if name in streaming:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:
            errors += 1
            print(f"{name:<28} ERROR {type(ex).__name__}: {str(ex)[:120]}", flush=True)
            continue
        if "BatchEvalPython" in plan:
            row_at_a_time[name] = True
            print(f"{name:<28} ROW-AT-A-TIME BatchEvalPython — forbidden", flush=True)
        found = [n for n in ARROW_NODES if n in plan]
        if found:
            arrow_users[name] = found
            print(f"{name:<28} arrow: {','.join(found)}", flush=True)
        else:
            n_pure_jvm += 1
    summary = {
        "sf_dir": sf_dir,
        "pure_jvm": n_pure_jvm,
        "arrow_batched": arrow_users,
        "row_at_a_time": sorted(row_at_a_time),
        "errors": errors,
    }
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(summary, fh, indent=1)
    print(
        f"\n# {n_pure_jvm} pure-JVM plans, {len(arrow_users)} Arrow-batched, "
        f"{len(row_at_a_time)} row-at-a-time, {errors} errors"
    )
    sys.exit(1 if (row_at_a_time or errors) else 0)


if __name__ == "__main__":
    main()
