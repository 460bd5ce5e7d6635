#!/usr/bin/env python
"""Per-key optimization profiler (optimization round tooling).

For each named registry key: capture `.explain("formatted")` to
plans/<tag>/<key>_<suffix>.txt, then time `reps` noop-sink executions
(guide §1.4) with the job labelled (§1.5), reporting min/median and
the per-rep list. Plan-shape counters (Exchange count, join strategies,
Python-eval nodes) print alongside so before/after claims are checkable
without a Spark UI.

Usage:
    python tools/profile_key.py --keys k1,k2 [--suffix before]
        [--sf-dir /root/testdata/sf0.1] [--reps 3] [--tag r15]
        [--plans] [--out artifacts/profile.json]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_counters(plan: str) -> dict:
    c = {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "broadcast_hash_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "nested_loop_joins": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "batch_eval_python": len(re.findall(r"\bBatchEvalPython\b", plan)),
        "arrow_eval_python": len(re.findall(r"\bArrowEvalPython\b", plan)),
        "map_in_arrow_pandas": len(re.findall(r"\bMapInPandas\b|\bMapInArrow\b|\bFlatMapGroupsInPandas\b", plan)),
        "in_memory_scans": len(re.findall(r"\bInMemoryTableScan\b", plan)),
        "scans": len(re.findall(r"\bScan parquet\b", plan)),
    }
    return c


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--plans", action="store_true", help="write plan files")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from landsat_tair_data_pipeline_spark.registry import spark_queries
    from landsat_tair_data_pipeline_spark.session import get_spark

    spark = get_spark("profile-key")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    keys = [k for k in (s.strip() for s in args.keys.split(",")) if k]
    unknown = [k for k in keys if k not in qs]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    plans_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    # warm the pools the bench warms (JVM codegen, Python workers)
    try:
        qs["q1_pricing_summary"](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.range(64).repartition(32).mapInPandas(
            lambda it: (p for p in it), schema="id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception as exc:
        print(f"warmup failed: {exc}", file=sys.stderr)

    results: dict[str, dict] = {}
    for name in keys:
        df = qs[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        if args.plans:
            pf = os.path.join(plans_dir, f"{name}_{args.suffix}.txt")
            with open(pf, "w") as fh:
                fh.write(plan)
        rep_times = []
        for i in range(args.reps):
            gc.collect()
            spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rep_times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = {
            "reps": rep_times,
            "min": min(rep_times),
            "median": round(statistics.median(rep_times), 3),
            "plan": plan_counters(plan),
        }
        print(
            f"{name:34s} min={min(rep_times):7.3f} med={results[name]['median']:7.3f} "
            f"reps={rep_times} {results[name]['plan']}",
            flush=True,
        )
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(
                {"sf_dir": args.sf_dir, "suffix": args.suffix, "results": results},
                fh,
                indent=1,
            )
    spark.stop()


if __name__ == "__main__":
    main()
