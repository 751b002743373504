"""One-command round gate battery — the full verify recipe in order.

Runs, with a PASS/FAIL line each and a nonzero exit on any failure:
  1. tools/oracle_check.py            (all registered + staged [Q], sf0.01)
  2. tools/oracle_check.py --staged   (staged-only surface)
  3. tools/head_check.py              (vanilla-session head-50 driver sim)
  4. tools/bench_check.py             (sf0.1 vs BENCH_BASELINE.json)
  5. pytest tests/ -q                 (full suite)

Usage:
    python tools/roundcheck.py            # everything (slow: ~1h)
    python tools/roundcheck.py --fast     # skip bench + pytest
Each stage streams into /tmp/roundcheck_<stage>.log; only the verdict
line prints here, so the summary survives a driver tail-capture.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = [
    ("oracle_all", [sys.executable, "tools/oracle_check.py"]),
    ("oracle_staged", [sys.executable, "tools/oracle_check.py", "--staged"]),
    ("head50", [sys.executable, "tools/head_check.py"]),
    ("bench", [sys.executable, "tools/bench_check.py"]),
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
]


def main() -> int:
    fast = "--fast" in sys.argv
    failed = []
    for name, cmd in STAGES:
        if fast and name in ("bench", "pytest"):
            print(f"SKIP  {name} (--fast)")
            continue
        log = f"/tmp/roundcheck_{name}.log"
        with open(log, "w") as fh:
            rc = subprocess.run(
                cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT
            ).returncode
        tail = ""
        with open(log) as fh:
            lines = [ln.strip() for ln in fh if ln.strip()]
            if lines:
                tail = lines[-1][:120]
        status = "PASS" if rc == 0 else "FAIL"
        print(f"{status}  {name}: {tail}  [{log}]")
        if rc != 0:
            failed.append(name)
    if failed:
        print(f"\nFAILED stages: {', '.join(failed)}")
        return 1
    print("\nall gates green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
