"""SRP sign-margin gauge (round-15 ADVICE): the Arrow BLAS signature
path is bit-identical to the SQL oracle replay ONLY while every
|dot(vector, plane)| stays orders of magnitude above f64
summation-order drift — a vector whose projection lands inside the
drift band could flip a sign bit between summation orders and split
engine vs oracle silently.  This gauge measures the minimum |dot|
across vectors × planes of the PINNED 8×6 construction (seed 43) for
each test fixture and asserts margin / drift-bound >= MARGIN_FACTOR.

(The r16 exact-VERIFY change needs no such gauge: ``pyudf.seq_rowdot``
reproduces the JVM fold's exact IEEE operation sequence, so engine
sims are bit-identical by construction, not by margin — pinned by
tests/test_pyudf_verify.py.  Signs of SRP projections are the one
place a BLAS matmul's different summation order is load-bearing.)

Usage: python tools/margin_gauge.py [out.json]
Exit 1 if any fixture's margin is below the bound.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projet_graphdb_spark.functions.similarity import srp_bands  # noqa: E402

FIXTURES = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
SF1 = "/tmp/sfscaled"  # included when present (the 10x sweep data)

# |true_dot| must exceed the worst-case f64 summation reorder drift by
# this factor for the sign to be order-independent.  Drift bound:
# d * eps * max|partial sum| <= d * eps * sum|terms| (loose, safe).
MARGIN_FACTOR = 1e3


def gauge(sf_dir: str) -> dict:
    path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = pq.read_table(path, columns=["embedding"])
    V = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    dim = V.shape[1]
    planes = np.asarray(
        [p for band in srp_bands(8, 6, dim, 43) for p in band]
    )  # (48, dim)
    D = V @ planes.T  # (n, 48)
    # worst-case reorder drift per dot: d * eps * sum|v_i * p_i|
    absD = np.abs(V) @ np.abs(planes.T)
    drift = dim * np.finfo(np.float64).eps * absD
    margin = np.abs(D)
    ratio = margin / np.maximum(drift, np.finfo(np.float64).tiny)
    return {
        "n_vectors": int(V.shape[0]),
        "dim": int(dim),
        "min_abs_dot": float(margin.min()),
        "max_drift_bound": float(drift.max()),
        "min_margin_over_drift": float(ratio.min()),
        "ok": bool(ratio.min() >= MARGIN_FACTOR),
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    results = {}
    ok = True
    dirs = list(FIXTURES)
    if os.path.isdir(SF1):
        dirs.append(SF1)
    for d in dirs:
        r = gauge(d)
        results[d] = r
        ok = ok and r["ok"]
        print(
            f"{d}: n={r['n_vectors']} dim={r['dim']} "
            f"min|dot|={r['min_abs_dot']:.3e} "
            f"drift<= {r['max_drift_bound']:.3e} "
            f"margin/drift>={r['min_margin_over_drift']:.1e} "
            f"{'OK' if r['ok'] else 'TOO CLOSE'}"
        )
    results["margin_factor_required"] = MARGIN_FACTOR
    results["ok"] = ok
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
