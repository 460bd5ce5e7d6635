#!/usr/bin/env python
"""Per-key driver-evidence vintage report — the rotation-planning
computation NOTES prescribes every round, as one command.

Reads every CORRECTNESS_r*.json, records each key's LATEST driver
round, joins against the current registry, and prints:
  - a vintage histogram (how many keys last verified in each round),
  - keys with NO driver row yet (must be inside the next front-50),
  - the oldest-vintage keys (the next front's drain list),
  - front-50 membership for both groups.

Usage: python tools/vintage_report.py [--oldest N]
Pure-driver: no SparkSession, safe to run next to anything.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--oldest", type=int, default=40,
                    help="how many oldest-vintage keys to list")
    args = ap.parse_args()

    from landsat_tair_data_pipeline_spark.registry import all_queries

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if not isinstance(d, dict):
            continue
        for k in d:
            latest[k] = max(latest.get(k, 0), rnd)

    qs = list(all_queries())
    front = set(qs[:50])
    hist = Counter(latest.get(k, 0) for k in qs)
    print("registry keys:", len(qs))
    print("vintage histogram (0 = never driver-checked):",
          dict(sorted(hist.items())))

    never = [k for k in qs if k not in latest]
    print(f"\nnever driver-checked ({len(never)}):")
    for k in never:
        mark = "" if k in front else "  <-- NOT IN FRONT-50 (fix!)"
        print(f"  {k}{mark}")

    checked = sorted((latest[k], k) for k in qs if k in latest)
    print(f"\noldest {args.oldest} driver-checked keys:")
    for rnd, k in checked[: args.oldest]:
        mark = " [front]" if k in front else ""
        print(f"  r{rnd} {k}{mark}")

    stale = [k for k in never if k not in front]
    if stale:
        print("\nWARNING: never-checked keys outside the front-50:", stale)
        sys.exit(1)


if __name__ == "__main__":
    main()
