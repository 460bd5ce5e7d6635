#!/usr/bin/env python
"""Assemble the r16 bench spread evidence (the r12-r15 protocol):
four same-code final draws (artifacts/bench_r16_final_{a,b,c,d}.json)
compared against the round-start baseline
(artifacts/bench_r16_baseline.json) on the same machine. Reports
per-draw totals, calibration, the all-common subtotal normalized by
each draw's calibration vs the baseline's, and the HEAVY_SPREAD
per-rep evidence (incl. dedup_clusters' per-rep CC round counts),
then writes artifacts/bench_r16_spread_evidence.json.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    base = json.load(
        open(os.path.join(REPO, "artifacts/bench_r16_baseline.json"))
    )
    bq = base["queries"]
    draws = []
    for tag in ("a", "b", "c", "d"):
        p = os.path.join(REPO, f"artifacts/bench_r16_final_{tag}.json")
        if os.path.exists(p) and os.path.getsize(p) > 0:
            draws.append((f"final_{tag}", json.load(open(p))))
    out = {
        "protocol": "same-code final draws vs the round-start baseline "
        "(same machine, identical bench protocol); common subtotal "
        "normalized by each draw's calibration vs the baseline's "
        "(the baseline ran under outside-VM load — calibration 2.80 "
        "vs this sandbox's unloaded ~1.76-1.82)",
        "baseline_total": base["value"],
        "baseline_calibration": base["calibration_sec"],
        "baseline_heavy_spread": base.get("heavy_spread"),
        "draws": {},
    }
    for name, d in draws:
        qs = d["queries"]
        common = [k for k in bq if k in qs]
        sb = sum(bq[k] for k in common)
        sf_ = sum(qs[k] for k in common)
        norm = (sf_ / d["calibration_sec"]) / (sb / base["calibration_sec"])
        out["draws"][name] = {
            "total": d["value"],
            "n_queries": d["n_queries"],
            "calibration_sec": d["calibration_sec"],
            "common_subtotal": round(sf_, 1),
            "raw_ratio_vs_baseline": round(sf_ / sb, 3),
            "calib_normalized_ratio": round(norm, 3),
            "heavy_spread": d.get("heavy_spread"),
        }
    path = os.path.join(REPO, "artifacts/bench_r16_spread_evidence.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {x: y for x, y in v.items() if x != "heavy_spread"}
                      for k, v in out["draws"].items()}, indent=1))
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
