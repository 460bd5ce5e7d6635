#!/usr/bin/env python
"""Full-cardinality validation (gated; not part of the default suite).

The committed fixtures model the reference's data shape at ~1/10 scene
count (120 scenes). The reference itself ships 1,298 scenes × 23-93
stations (BASELINE.md) — this script proves the engine + oracles hold
at that exact cardinality:

1. generate a 1,298-scene fixture set (8 traps + 1290 generated) into
   .scratch/fixtures_fullcard via the same generator, and its pt blobs;
2. re-run the full pytest suite in a fresh process with
   SPARK_GRAFT_FIXTURE_DIR pointed at it (oracle SQL strings embed the
   path at import time, hence the subprocess);
3. print a summary line to paste into NOTES.md.

Run:  python tools/fullcard_check.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FULLCARD_DIR = os.path.join(REPO, ".scratch", "fixtures_fullcard")
N_GEN = "1290"  # + 8 trap scenes = 1,298 (BASELINE.md reference count)


def run(desc: str, cmd: list[str], env: dict[str, str]) -> float:
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=REPO, env=env)
    dt = time.perf_counter() - t0
    print(f"[fullcard] {desc}: rc={r.returncode} in {dt:.1f}s", flush=True)
    if r.returncode != 0:
        sys.exit(r.returncode)
    return dt


def main() -> None:
    env = dict(os.environ)
    env["SPARK_GRAFT_FIXTURE_DIR"] = FULLCARD_DIR
    gen_env = dict(env, SPARK_GRAFT_FIXTURE_SCENES=N_GEN)

    os.makedirs(FULLCARD_DIR, exist_ok=True)
    t_fix = run("generate fixtures", [sys.executable, "tools/make_fixtures.py"], gen_env)
    t_pt = run("generate pt blobs", [sys.executable, "tools/make_pt_blobs.py"], gen_env)
    t_pt += run("generate real pt", [sys.executable, "tools/make_real_pt.py"], gen_env)
    t_test = run(
        "pytest (full suite @ 1,298 scenes)",
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        env,
    )
    print(
        f"[fullcard] OK — 1,298 scenes: gen {t_fix:.0f}s + pt {t_pt:.0f}s, "
        f"suite {t_test:.0f}s, all tests green"
    )


if __name__ == "__main__":
    main()
