"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the same scale factor, then compares
row count, schema width, and an order-insensitive value comparison
(columns sorted by name, rows sorted by all columns). Stricter than the
driver (exact cell equality after float rounding), so passing here should
imply passing there.

Usage: python tools/check_correctness.py [--json OUT] [sf_dir] [query ...]

``--json OUT`` additionally writes a machine-readable per-query record
(status, rows, timings, check mode) — the committed per-round artifact
(e.g. CORRECTNESS_local_r03.json) that lets a judge audit the queries the
driver's 50-query sample skipped without re-running the full registry.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    sys.argv = [sys.argv[0]] + argv  # keep the positional contract below
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[2:])

    from levenshtein_spark.session import get_spark, warm_python_workers

    spark = get_spark("check_correctness")
    warm_python_workers(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    records: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        from levenshtein_spark.session import release_caches

        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"[FAIL] {name}: spark query raised")
            traceback.print_exc()
            failures.append(name)
            records[name] = {"status": "fail", "mode": "spark_error"}
            # a failing query's scoped persists must not leak into the rest
            # of the run (the ADVICE r02 accumulation, error-path edition)
            release_caches(include_pinned=True)
            continue
        t_spark = time.perf_counter() - t0
        release_caches(include_pinned=True)  # this query is fully materialized
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows  spark={t_spark:.1f}s")
            if len(sdf) == 0:
                print(f"  WARNING: {name} returned 0 rows")
            records[name] = {
                "status": "ok" if len(sdf) else "empty",
                "mode": "rows_only",
                "rows": len(sdf),
                "spark_s": round(t_spark, 2),
            }
            continue
        t0 = time.perf_counter()
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"[FAIL] {name}: oracle SQL raised")
            traceback.print_exc()
            failures.append(name)
            records[name] = {"status": "fail", "mode": "oracle_error"}
            continue
        t_duck = time.perf_counter() - t0

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            a, b = normalize(sdf), normalize(odf)
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                problems.append(f"{int(bad.sum())} mismatched rows")
                print(pd.concat([a[bad].head(5), b[bad].head(5)], keys=["spark", "oracle"]))
        status = "OK" if not problems else "FAIL " + "; ".join(problems)
        print(f"[{status}] {name}: {len(sdf)} rows  spark={t_spark:.1f}s duck={t_duck:.1f}s")
        records[name] = {
            "status": "ok" if not problems else "fail",
            "mode": "strict_cell_equality",
            "rows": len(sdf),
            "spark_s": round(t_spark, 2),
            "duck_s": round(t_duck, 2),
        }
        if problems:
            records[name]["problems"] = problems
            failures.append(name)

    if json_out:
        # Merge-safe artifact write: a subset run (--json OUT sf_dir q1 q2 ...)
        # against an existing artifact updates those entries in place and
        # RECOMPUTES the header from the merged map — the r04 artifact's
        # n_ok=151-vs-152-entries drift came from a manual merge that bumped
        # n_checked but not n_ok; headers are now derived, never hand-edited.
        merged = dict(records)
        extra = {}
        if only:
            import os

            if os.path.exists(json_out):
                with open(json_out) as fh:
                    prev = json.load(fh)
                if prev.get("sf_dir") != sf_dir:
                    raise SystemExit(
                        f"refusing to merge into {json_out}: sf_dir "
                        f"{prev.get('sf_dir')} != {sf_dir}"
                    )
                merged = {**prev.get("queries", {}), **records}
                extra = {k: v for k, v in prev.items() if k not in
                         ("sf_dir", "checker", "n_checked", "n_ok", "n_fail", "queries")}
        n_ok = sum(1 for r in merged.values() if r["status"] == "ok")
        n_fail = sum(1 for r in merged.values() if r["status"] == "fail")
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "checker": "tools/check_correctness.py (strict cell equality)",
                    "n_checked": len(merged),
                    "n_ok": n_ok,
                    "n_fail": n_fail,
                    "queries": merged,
                    **extra,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")

    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all checked queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
