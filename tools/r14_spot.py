#!/usr/bin/env python
"""r14 working spot-bench: time a comma-separated key list at --sf,
best-of --reps with one untimed warm rep for each key, one JSON line.
Thin wrapper over the registry contract (same protocol as bench.py's
timed section) for before/after comparisons while iterating."""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--warm", type=int, default=1)
    args = ap.parse_args()

    from landsat_tair_data_pipeline_spark.registry import spark_queries
    from landsat_tair_data_pipeline_spark.session import get_spark

    spark = get_spark("landsat-tair-r14-spot")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(qs["q1_pricing_summary"](spark, args.sf))
    out = {}
    for name in args.keys.split(","):
        for _ in range(args.warm):
            noop(qs[name](spark, args.sf))
        best = None
        for _ in range(args.reps):
            gc.collect()
            t0 = time.perf_counter()
            noop(qs[name](spark, args.sf))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    print("SPOTJSON:" + json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
