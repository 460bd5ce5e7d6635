#!/usr/bin/env python
"""One-command round close (VERDICT r9 item 6): runs the three
end-state evidence artifacts on FINAL code and stamps each with the
HEAD sha so stale-code artifacts are mechanically detectable.

Institutionalizes the r8/r9 closing discipline that was previously
hand-orchestrated across several commits:

  1. sf0.01 driver-gate simulation  -> artifacts/r{N}_sf001_gate_sim.json
  2. sf0.1 full-registry parity     -> artifacts/r{N}_sf01_parity.json
  3. bench.py (uncontended)         -> artifacts/bench_r{N}_local.json

Refuses to run on a dirty working tree (an artifact must correspond to
a commit someone can check out), stamps ``head_sha`` + ``utc`` inside
every artifact, and exits non-zero if any step fails or any sweep
reports failures.

Each step runs as its own subprocess: fresh JVM per sweep, and the
bench runs alone (the r6 contention trap — a bench overlapping any
other Spark session drifts every key 1.3-1.6x).

Usage:
    python tools/round_close.py --round 10            # run all three
    python tools/round_close.py --round 10 --check    # verify only
    python tools/round_close.py --round 10 --skip-bench ...
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def _paths(rnd: int) -> dict[str, str]:
    return {
        "gate_sim": f"artifacts/r{rnd}_sf001_gate_sim.json",
        "parity": f"artifacts/r{rnd}_sf01_parity.json",
        "bench": f"artifacts/bench_r{rnd}_local.json",
    }


def _registry_sig() -> dict:
    """Signature of the CURRENT registry key set — stamped into every
    artifact so a key added AFTER the close is mechanically detectable
    (VERDICT r11 item 4: ts_seasonal_decompose landed after the r11
    close and silently missed both end-state sweeps; the rule is now
    'no registry additions after close artifacts are stamped — or
    re-run round_close when one lands', and --check enforces it)."""
    import hashlib

    sys.path.insert(0, REPO)
    from landsat_tair_data_pipeline_spark.registry import all_queries

    keys = sorted(all_queries())
    return {
        "n_keys": len(keys),
        "keys_md5": hashlib.md5(",".join(keys).encode()).hexdigest(),
    }


def _stamp(path: str, head: str) -> None:
    with open(os.path.join(REPO, path)) as f:
        data = json.load(f)
    data["head_sha"] = head
    data["registry"] = _registry_sig()
    data["utc"] = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    with open(os.path.join(REPO, path), "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")


def _evidence_only_diff(sha: str, head: str) -> bool:
    """True when every path changed between sha and head is evidence/
    documentation (artifacts, markdown, PROGRESS) — the artifact then
    still describes HEAD's code exactly, because committing the
    artifacts themselves necessarily moves HEAD past the stamped sha."""
    try:
        changed = _git("diff", "--name-only", sha, head).splitlines()
    except subprocess.CalledProcessError:
        return False
    return all(
        p.startswith("artifacts/") or p.endswith(".md") or p == "PROGRESS.jsonl"
        for p in changed
    )


def _check(rnd: int, head: str) -> int:
    """Verify all three artifacts exist and were produced at HEAD (or
    at a sha whose diff to HEAD is evidence/docs only)."""
    bad = 0
    for label, path in _paths(rnd).items():
        full = os.path.join(REPO, path)
        if not os.path.exists(full):
            print(f"MISSING {label}: {path}")
            bad += 1
            continue
        with open(full) as f:
            data = json.load(f)
        sha = data.get("head_sha")
        stamped_reg = data.get("registry")
        if sha != head and not (sha and _evidence_only_diff(sha, head)):
            print(f"STALE {label}: {path} head_sha={sha} != HEAD {head}")
            bad += 1
        elif stamped_reg is not None and stamped_reg != _registry_sig():
            print(
                f"REGISTRY DRIFT {label}: {path} was stamped for "
                f"{stamped_reg['n_keys']} keys but the registry now "
                f"differs — a key landed after the close; re-run "
                "round_close"
            )
            bad += 1
        elif data.get("fail") or data.get("failures"):
            print(
                f"FAILURES {label}: {path} "
                f"fail={data.get('fail') or data.get('failures')}"
            )
            bad += 1
        else:
            print(f"ok {label}: {path} @ {sha[:10]}")
    return bad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--check", action="store_true", help="verify artifacts only")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-gate-sim", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument(
        "--allow-dirty",
        action="store_true",
        help="run on a dirty tree (artifact will NOT match any commit)",
    )
    args = ap.parse_args()

    head = _git("rev-parse", "HEAD")
    paths = _paths(args.round)

    if args.check:
        sys.exit(1 if _check(args.round, head) else 0)

    dirty = _git("status", "--porcelain")
    if dirty and not args.allow_dirty:
        sys.exit(
            "working tree is dirty — commit first (an end-state artifact "
            "must correspond to a checkout-able sha), or pass "
            f"--allow-dirty:\n{dirty}"
        )

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    failures: list[str] = []

    def run(label: str, cmd: list[str]) -> int:
        print(f"=== {label}: {' '.join(cmd)}", flush=True)
        rc = subprocess.run(cmd, cwd=REPO).returncode
        if rc != 0:
            failures.append(label)
            print(f"=== {label} FAILED rc={rc}", flush=True)
        return rc

    # ADVICE r10: a pre-existing artifact at the output path must never
    # be re-stamped as HEAD-fresh after a FAILED sweep (the exists()
    # guard can't tell a stale leftover from this run's output) — so
    # (a) delete the target before launching, (b) stamp only on rc==0.
    def sweep(label: str, sf_dir: str, out_key: str) -> None:
        target = os.path.join(REPO, paths[out_key])
        if os.path.exists(target):
            os.remove(target)
        rc = run(
            label,
            [
                sys.executable,
                "tools/sf01_sweep.py",
                "--sf-dir",
                sf_dir,
                "--out",
                paths[out_key],
            ],
        )
        if rc == 0 and os.path.exists(target):
            _stamp(paths[out_key], head)

    if not args.skip_gate_sim:
        sweep("gate_sim(sf0.01)", "/root/testdata/sf0.01", "gate_sim")

    if not args.skip_parity:
        sweep("parity(sf0.1)", "/root/testdata/sf0.1", "parity")

    if not args.skip_bench:
        # bench prints its ONE JSON line to stdout; capture it verbatim
        print("=== bench (alone — do not run anything else)", flush=True)
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, capture_output=True, text=True
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            data = json.loads(line)
        except Exception:
            failures.append("bench")
            print(f"=== bench FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}")
        else:
            with open(os.path.join(REPO, paths["bench"]), "w") as f:
                json.dump(data, f, indent=2)
                f.write("\n")
            _stamp(paths["bench"], head)
            if data.get("failures"):
                failures.append("bench(keys)")

    print()
    bad = _check(args.round, head)
    if failures or bad:
        sys.exit(f"round_close: failures={failures} stale_or_failing={bad}")
    print("round_close: all artifacts green and stamped at HEAD")


if __name__ == "__main__":
    main()
