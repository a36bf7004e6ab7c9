"""Local emulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its DuckDB oracle at
the given scale factor and compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from projet_graphdb_spark.engine import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    if len(sdf) != len(odf):
        return f"ROWS {len(sdf)} vs {len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    a, b = canon(sdf), canon(odf)
    # Driver parity: the gate's value hash survives integer-WIDTH divergence
    # (r4 evidence: s1/e18 rank int32-vs-BIGINT passed hash_match) but NOT a
    # numpy-KIND divergence — DuckDB promoting integer SUM to HUGEINT comes
    # back as float64/object and broke t20/t21/t23/a13 despite equal values.
    # Flag kind mismatches here so that class is caught locally before the
    # driver sees it.  int⇄uint and both-datetime count as same-kind.
    def _kind(dt) -> str:
        k = np.dtype(dt).kind
        return "i" if k == "u" else k

    dtype_bad = [
        c for c in a.columns if _kind(a[c].dtype) != _kind(b[c].dtype)
    ]
    if dtype_bad:
        return "DTYPE " + ", ".join(
            f"{c}: spark={a[c].dtype} oracle={b[c].dtype}" for c in dtype_bad
        )
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = np.isnan(af) & np.isnan(bf)
            if not np.all(both_nan | (af == bf)):
                bad = np.where(~(both_nan | (af == bf)))[0][:3]
                return f"VAL col {c} rows {bad.tolist()} {af[bad]} vs {bf[bad]}"
        elif np.issubdtype(av.dtype, np.datetime64) and np.issubdtype(bv.dtype, np.datetime64):
            # NaT != NaT, so equality needs an explicit both-NaT mask
            av = av.astype("datetime64[us]")
            bv = bv.astype("datetime64[us]")
            ok = (np.isnat(av) & np.isnat(bv)) | (av == bv)
            if not np.all(ok):
                bad = np.where(~ok)[0][:3]
                return f"VAL col {c} rows {bad.tolist()} {av[bad]} vs {bv[bad]}"
        else:
            if not np.array_equal(av, bv):
                bad = np.where(av != bv)[0][:3]
                return f"VAL col {c} rows {bad.tolist()} {av[bad]} vs {bv[bad]}"
    return "OK"


def main():
    args = sys.argv[1:]
    json_out = None
    rows_only = "--rows-only" in args
    if rows_only:
        # run the ENGINE side only and record row counts — the sf1
        # sweep uses this to pair a full-scale engine run with a
        # capped-sub-corpus value check when the DuckDB replay is
        # quadratic by design (round-11 verdict item 2)
        args.remove("--rows-only")
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check_oracle.py [sf_dir] [query ...] [--json out.json]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    import os as _os

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; tools/make_scaled_sf.py
        # writes Spark DIRECTORY layouts — glob the parts in that case
        if _os.path.isdir(p):
            p = f"{p}/*.parquet"
        elif not _os.path.exists(p):
            # partial fixture (e.g. the sf1 sweep's capped sub-corpus
            # carries only the tables its queries read) — skip; a query
            # touching a missing table fails loudly at its own row
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    results: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name:24s} SPARK-ERROR {type(ex).__name__}: {str(ex)[:160]}")
            results[name] = {"ok": False, "err": f"spark {type(ex).__name__}"}
            failures += 1
            continue
        t_spark = time.time() - t0
        if rows_only or name not in oracles:
            print(f"{name:24s} rows-only   rows={len(sdf)}  spark={t_spark:.1f}s")
            results[name] = {"ok": True, "rows": len(sdf), "rows_only": True}
            continue
        t0 = time.time()
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"{name:24s} ORACLE-ERROR {type(ex).__name__}: {str(ex)[:160]}")
            results[name] = {"ok": False, "err": f"oracle {type(ex).__name__}"}
            failures += 1
            continue
        verdict = compare(name, sdf, odf)
        status = "ok" if verdict == "OK" else "MISMATCH"
        if verdict != "OK":
            failures += 1
        results[name] = {"ok": verdict == "OK", "rows": len(sdf)}
        if verdict != "OK":
            results[name]["err"] = verdict
        print(
            f"{name:24s} {status:9s} rows={len(sdf)}  spark={t_spark:.1f}s "
            f"duck={time.time()-t0:.1f}s  {verdict if verdict != 'OK' else ''}"
        )
    print("FAILURES:", failures)
    if json_out:
        import json as _json

        with open(json_out, "w") as fh:
            _json.dump(
                {"sf_dir": sf_dir, "n": len(results), "failures": failures,
                 "queries": results},
                fh, indent=1,
            )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
