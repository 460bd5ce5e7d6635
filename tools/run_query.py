#!/usr/bin/env python
"""Run any registry query by name from the command line.

    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py dedup_jaccard_pairs --sf /root/testdata/sf0.1 \
        --limit 10 --explain
    python tools/run_query.py q21_waiting_suppliers --check

Lists all keys with --list. The same (spark, sf_dir) contract the
driver uses; results print as a truncated table, --explain adds the
formatted physical plan.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registry key to run")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="table directory (default: %(default)s)",
    )
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the plan")
    ap.add_argument(
        "--check",
        action="store_true",
        help="also run the DuckDB oracle and compare (the driver's gate "
        "for one key; rows-only keys just run)",
    )
    ap.add_argument("--list", action="store_true", help="list all keys")
    args = ap.parse_args()

    from landsat_tair_data_pipeline_spark.registry import all_queries

    qs = all_queries()
    if args.list or not args.query:
        for name, spec in qs.items():
            kind = "oracled" if spec.oracle else "rows-only"
            print(f"{name:32s} {kind}")
        return 0
    if args.query not in qs:
        import difflib

        close = difflib.get_close_matches(args.query, qs, n=5)
        print(f"unknown query {args.query!r}; close matches: {close}")
        return 2

    from landsat_tair_data_pipeline_spark.session import get_spark

    spark = get_spark(f"run-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    spec = qs[args.query]
    df = spec.fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=40)
    if not args.check:  # compare() re-executes; skip the extra count job
        print(f"[{args.query}] {df.count()} rows @ {args.sf}")
    if args.check:
        if spec.oracle is None:
            print(f"[{args.query}] rows-only key: no oracle to compare")
        else:
            from tests.oracle_check import compare

            compare(spark, args.sf, spec.fn, spec.oracle)
            print(f"[{args.query}] ORACLE MATCH @ {args.sf}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
