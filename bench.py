"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as: build the DataFrame + execute to completion
(count-style action that materializes every row, without driver-side
pandas conversion costs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from projet_graphdb_spark.engine import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")

    # warm the JVM/codegen on the tiny fixture so per-query numbers
    # measure execution, not one-time class/codegen initialization
    try:
        E.entry(spark).count()
    except Exception:
        pass

    timings = {}
    for name, fn in E.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as ex:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"# {name} FAILED: {type(ex).__name__}: {str(ex)[:200]}", file=sys.stderr)
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
