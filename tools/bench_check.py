"""Bench regression gate: diff a fresh bench.py run against the committed
contract in BENCH_BASELINE.json (verify recipe step 6).

FAIL iff (a) the headline total exceeds ``total_budget_sec``, or (b) any
query exceeds ``per_query_tolerance`` x its committed number. Per-query
tolerance absorbs scheduler noise; the total budget catches broad drift.
Machine contention can fail this check spuriously — re-run on a quiet
machine before believing a regression (the r2 lesson; see BASELINE.md).

Usage:
    python tools/bench_check.py                # runs bench.py at sf0.1
    python tools/bench_check.py bench_out.json # check an existing run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_run(path: str | None) -> dict:
    if path:
        with open(path) as f:
            return json.loads([ln for ln in f if ln.strip()][-1])
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(argv: list[str]) -> int:
    with open(os.path.join(REPO, "BENCH_BASELINE.json")) as f:
        contract = json.load(f)
    run = latest_run(argv[0] if argv else None)
    tol = contract["per_query_tolerance"]
    failures: list[str] = []

    total = run["value"]
    if total > contract["total_budget_sec"]:
        failures.append(
            f"TOTAL {total:.2f}s exceeds budget {contract['total_budget_sec']}s"
        )
    for name, committed in contract["queries"].items():
        got = run["queries"].get(name)
        if got is None:
            failures.append(f"{name}: missing from bench run")
        elif got > committed * tol:
            failures.append(
                f"{name}: {got:.2f}s > {tol}x committed {committed}s"
            )
    for name, got in sorted(run["queries"].items()):
        committed = contract["queries"].get(name, float("nan"))
        flag = "" if name in contract["queries"] else "  (uncommitted)"
        print(f"{name:32s} {got:7.2f}s  committed {committed:5.2f}s{flag}")
    print(f"{'TOTAL':32s} {total:7.2f}s  budget {contract['total_budget_sec']}s")
    if failures:
        print("\nFAIL:\n  " + "\n  ".join(failures))
        return 1
    print("\nOK: within contract")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
