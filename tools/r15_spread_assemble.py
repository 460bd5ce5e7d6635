#!/usr/bin/env python
"""Assemble the r15 bench spread evidence (the r12-r14 protocol):
draw 1 = the committed close artifact (bench_r15_local.json), the
other draws = extra same-code runs kept in /tmp. Reports per-draw
totals, calibration, the common-r14 subtotal normalized by each
draw's calibration vs r14's local close artifact, and the
HEAVY_SPREAD per-rep evidence (now including dedup_clusters' per-rep
CC round counts), then writes artifacts/bench_r15_spread_evidence.json.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    draws = []
    d1 = json.load(open(os.path.join(REPO, "artifacts/bench_r15_local.json")))
    draws.append(("close_artifact", d1))
    for i in (2, 3, 4):
        p = f"/tmp/bench_r15_draw{i}.json"
        if os.path.exists(p) and os.path.getsize(p) > 0:
            draws.append((f"draw{i}", json.load(open(p))))
    prev = json.load(open(os.path.join(REPO, "artifacts/bench_r14_local.json")))
    pq = prev["queries"]
    out = {
        "protocol": "same-code draws; draw 1 is the committed close "
        "artifact; common-r14 subtotal normalized by each draw's "
        "calibration vs r14's local close artifact",
        "r14_calibration": prev["calibration_sec"],
        "r14_common_total": round(sum(pq.values()), 1),
        "draws": {},
    }
    for name, d in draws:
        qs = d["queries"]
        common = [k for k in pq if k in qs]
        s14 = sum(pq[k] for k in common)
        s15 = sum(qs[k] for k in common)
        norm = (s15 / d["calibration_sec"]) / (s14 / prev["calibration_sec"])
        out["draws"][name] = {
            "total": d["value"],
            "n_queries": d["n_queries"],
            "calibration_sec": d["calibration_sec"],
            "common_r14_subtotal": round(s15, 1),
            "common_r14_normalized": round(norm, 3),
            "heavy_spread": d.get("heavy_spread"),
        }
    path = os.path.join(REPO, "artifacts/bench_r15_spread_evidence.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["draws"], indent=1)[:2000])
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
