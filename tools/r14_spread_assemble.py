#!/usr/bin/env python
"""Assemble the r14 4-draw bench spread evidence (the r12/r13
protocol): draw 1 = the committed close artifact, draws 2-4 = extra
same-code runs. Reports per-draw totals, calibration, the common-r13
normalized ratio, and the HEAVY_SPREAD per-rep evidence, then writes
artifacts/bench_r14_spread_evidence.json."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    draws = []
    d1 = json.load(open(os.path.join(REPO, "artifacts/bench_r14_local.json")))
    draws.append(("close_artifact", d1))
    for i in (2, 3, 4):
        p = f"/tmp/bench_r14_draw{i}.json"
        if os.path.exists(p) and os.path.getsize(p) > 0:
            draws.append((f"draw{i}", json.load(open(p))))
    prev = json.load(open(os.path.join(REPO, "artifacts/bench_r13_local.json")))
    pq = prev["queries"]
    out = {"protocol": "4 same-code draws; draw 1 is the committed "
           "close artifact; common-r13 subtotal normalized by each "
           "draw's calibration vs r13's", "r13_calibration":
           prev["calibration_sec"], "draws": {}}
    for name, d in draws:
        qs = d["queries"]
        common = [k for k in pq if k in qs]
        s13 = sum(pq[k] for k in common)
        s14 = sum(qs[k] for k in common)
        norm = (s14 / d["calibration_sec"]) / (s13 / prev["calibration_sec"])
        out["draws"][name] = {
            "total": d["value"],
            "calibration_sec": d["calibration_sec"],
            "common_r13_subtotal": round(s14, 1),
            "common_r13_normalized": round(norm, 3),
            "heavy_spread": d.get("heavy_spread"),
        }
    path = os.path.join(REPO, "artifacts/bench_r14_spread_evidence.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["draws"], indent=1))
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
