#!/usr/bin/env python
"""10x scale probe: replicate the fact tables of an sf dir with
key-shifted copies, then time registry keys at 1x vs 10x and report
the growth ratio. A scale-safe operator grows at or below ~linear
(ratio <= factor, usually far below on local[32] where the 1x runs
are overhead-dominated); a super-linear ratio flags a pair-space or
state blowup that 100 TB would amplify.

Usage: python tools/scale_probe.py key1 key2 ... [--factor 10]
Writes the replicated dir to .scratch/sf_probe_<factor>x (reused if
present) and prints one JSON line with per-key (base_s, big_s, ratio).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# per-table key shifts applied to copy i (column -> stride)
SHIFTS = {
    "events": {"event_id": 10**9, "user_id": 10**6},
    "embeddings": {"vec_id": 10**9},
    "orders": {"o_orderkey": 10**7, "o_custkey": 10**6},
    "lineitem": {"l_orderkey": 10**7},
    "customer": {"c_custkey": 10**6},
    "documents": {"doc_id": 10**8},
}
COPY_AS_IS = ("region", "nation", "supplier", "part")


def build(spark, factor: int) -> str:
    import hashlib

    from pyspark.sql import functions as F

    # replica dir keyed on (base dir, factor): reusing an sf0.1-derived
    # replica under a different SPARK_GRAFT_SF_DIR would silently time
    # the wrong data
    tag = hashlib.md5(BASE.encode()).hexdigest()[:8]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"sf_probe_{factor}x_{tag}",
    )
    if os.path.isdir(out) and os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    for t, shifts in SHIFTS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for i in range(factor):
            c = df
            for col, stride in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in COPY_AS_IS:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def time_key(spark, fn, sf, reps=2) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    argv = sys.argv[1:]
    factor = 10
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--factor"):
            if "=" in a:
                factor = int(a.split("=", 1)[1])
            else:
                factor = int(argv[i + 1])
                i += 1  # consume the flag's value, not a query key
        else:
            args.append(a)
        i += 1
    if not args:
        raise SystemExit(__doc__)
    from landsat_tair_data_pipeline_spark.registry import spark_queries
    from landsat_tair_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    missing = [k for k in args if k not in qs]
    if missing:
        raise SystemExit(f"unknown keys: {missing}")
    big = build(spark, factor)
    # warmup
    qs[args[0]](spark, BASE).write.format("noop").mode("overwrite").save()
    out = {}
    for k in args:
        b = time_key(spark, qs[k], BASE)
        g = time_key(spark, qs[k], big)
        out[k] = {"base_s": b, "big_s": g, "ratio": round(g / b, 2)}
    print(json.dumps({"factor": factor, "base": BASE, "keys": out}))
    spark.stop()


if __name__ == "__main__":
    main()
