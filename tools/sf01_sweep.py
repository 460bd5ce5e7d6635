#!/usr/bin/env python
"""Full registry-wide oracle-parity sweep at an arbitrary sf dir.

Promotes the round-7 ad-hoc sf0.1 sweep (which caught three real
scale-dependent bugs the sf0.001/0.01 gates could not see — the
rdd.id-seeded range-boundary desync, dense-mode HLL union divergence,
and a q7 rounding tie at 9.1e6 magnitude) into a committed round-close
tool. Runs EVERY registry key's Spark query and, where oracled, its
DuckDB twin on the same parquet dir, compares with the driver's
semantics (row count + sorted column names + order-insensitive exact
values via tests/oracle_check.compare), and writes a JSON artifact.

Usage:
    python tools/sf01_sweep.py [--sf-dir /root/testdata/sf0.1]
        [--out artifacts/r8_sf01_parity.json] [--keys k1,k2,...]

Expect ~30-40 min for the full 186-key registry at sf0.1 on local[32].
Run it on the round's final code, commit the artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--keys", default=None, help="comma list; default all")
    args = ap.parse_args()

    import oracle_check  # tests/oracle_check.py — the driver-semantics compare

    from landsat_tair_data_pipeline_spark.registry import all_queries, spark_queries
    from landsat_tair_data_pipeline_spark.session import get_spark

    specs = all_queries()
    wrapped = spark_queries()  # scope-tracked cache release per key
    # validate BEFORE the (long) run: a typo'd --keys entry raising
    # KeyError mid-sweep would abort with no artifact (r8 review)
    keys = (
        [k for k in (s.strip() for s in args.keys.split(",")) if k]
        if args.keys
        else list(specs)
    )
    unknown = [k for k in keys if k not in specs]
    if unknown:
        sys.exit(f"unknown keys (not in registry): {unknown}")

    spark = get_spark("landsat-tair-sf-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    t_start = time.perf_counter()
    for i, name in enumerate(keys, 1):
        spec = specs[name]
        t0 = time.perf_counter()
        try:
            if spec.oracle is None:
                rows = wrapped[name](spark, args.sf_dir).count()
                results[name] = {"status": "rows_only", "rows": rows, "err": None}
                n_rows_only += 1
            else:
                oracle_check.compare(spark, args.sf_dir, wrapped[name], spec.oracle)
                results[name] = {"status": "pass", "err": None}
                n_pass += 1
        except Exception as exc:
            results[name] = {
                "status": "fail",
                "err": f"{type(exc).__name__}: {exc}"[:500],
            }
            n_fail += 1
            traceback.print_exc(limit=3)
        dt = time.perf_counter() - t0
        results[name]["sec"] = round(dt, 2)
        print(
            f"[{i}/{len(keys)}] {name}: {results[name]['status']} ({dt:.1f}s)",
            flush=True,
        )
    spark.stop()

    artifact = {
        "sf_dir": args.sf_dir,
        "total": len(keys),
        "pass": n_pass,
        "rows_only": n_rows_only,
        "fail": n_fail,
        "failed_keys": sorted(k for k, v in results.items() if v["status"] == "fail"),
        "wall_sec": round(time.perf_counter() - t_start, 1),
        "results": results,
    }
    out = json.dumps(artifact, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
        print(f"wrote {args.out}")
    print(
        json.dumps(
            {k: artifact[k] for k in ("sf_dir", "total", "pass", "rows_only", "fail", "failed_keys", "wall_sec")}
        )
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
