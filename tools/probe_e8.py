"""One-off probe for the round-13 e8 adjudication: where does
e8_sessionize_stream's wall go, and is the elevation shared by its
batch twin / the applyInPandas batch path?

Runs in one fresh session: e8 (8 reps, last rep keeps the
StreamingQuery handle and dumps recentProgress), sessionize_batch
(3 reps), s18_pandas_udf_parity (3 reps, Arrow applyInPandas control).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from projet_graphdb_spark.engine import get_spark  # noqa: E402
from projet_graphdb_spark.streaming import (  # noqa: E402
    drain,
    sessionize_stream,
    state_partitions,
    stream_source,
)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe-e8")
E.entry(spark).count()
out: dict = {}

path, schema = stream_source(spark, sf_dir)
walls = []
last_progress = None
for i in range(8):
    t0 = time.time()
    with state_partitions(spark, 8):
        q = sessionize_stream(
            spark, path, schema, gap_minutes=30, watermark="0 seconds",
            query_name="e8_probe",
        )
    drain(q, spark, "e8_probe").count()
    walls.append(round(time.time() - t0, 3))
    if i == 7:
        last_progress = [
            json.loads(p.json if isinstance(p.json, str) else p.json())
            for p in q.recentProgress
        ]
out["e8_walls"] = walls
out["e8_last_progress"] = last_progress

qs = E.queries()
for name in ("s18_pandas_udf_parity", "e2_sessionize"):
    fn = qs.get(name)
    if fn is None:
        continue
    reps = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, sf_dir).count()
        reps.append(round(time.time() - t0, 3))
    out[name] = reps

with open("/tmp/probe_e8.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "e8_last_progress"}))
