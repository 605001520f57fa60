"""Driver-contract check: entry() smoke + queries() vs oracle_sql() via DuckDB.

Thin CLI over tools/check_correctness.py plus the entry() smoke test the
round driver performs. Exits non-zero on any mismatch.

Usage: python tests/run_driver_check.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--skip-entry", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from tools.check_correctness import main as check_main

    if not args.skip_entry:
        from levenshtein_spark.session import get_spark

        df = e.entry(get_spark("driver_check"))
        n = df.count()
        print(f"entry(): {n} rows, schema={df.schema.simpleString()}")
        assert n >= 0

    sys.argv = ["check_correctness", args.sf, *args.queries]
    return check_main()


if __name__ == "__main__":
    raise SystemExit(main())
