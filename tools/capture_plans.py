"""Capture ``.explain('formatted')`` output for named queries to
``plans/<tag>/<query>_<suffix>.txt`` — the optimization-round evidence
artifact (the judge reads these instead of running Spark).

Streaming queries (``__spark_entry__.STREAMING_QUERIES``) build and
drain a streaming pipeline inside the query function, so a DataFrame
``explain`` of the returned (drained, batch) frame documents only the
final comparison read; the file is still captured, with a header noting
that limitation.

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] <query ...>
e.g.   python tools/capture_plans.py r15 before /root/testdata/sf0.1 d10_semantic_dedup
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from projet_graphdb_spark.engine import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    qs = E.queries()
    streaming = getattr(E, "STREAMING_QUERIES", frozenset())
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        header = ""
        if name in streaming:
            header = (
                "# NOTE: streaming query — the pipeline runs (and drains) "
                "inside the query function;\n# this plan covers the final "
                "batch comparison frame the bench counts.\n\n"
            )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(header + plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
