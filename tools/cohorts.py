"""Freshness-cohort report from the driver's CORRECTNESS_r*.json files.

The standing FRESHNESS POLICY (plans/registry.py) re-proves the OLDEST
standing green driver rows first. This tool computes, for every
registered [Q] query, the last round with a green driver row, and
prints the cohorts a head planner needs:

    python tools/cohorts.py            # cohort sizes + the oldest cohort
    python tools/cohorts.py --all      # every cohort, full name lists

"green" = rows_match and no err and hash_match is not False (rows-only
[R] rows count as green-for-freshness; they are excluded from head
planning anyway). Queries with no driver row ever (the staged/new ones)
list under round 0 — introduction-slot candidates, not freshness fill.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def last_green() -> dict[str, int]:
    out: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(f) if c.isdigit()))
        for name, row in json.load(open(f)).items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("hash_match") is not False
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> int:
    from posts_vectorizer_spark.plans.registry import (
        _HEAD_ORDER,
        oracle_sql,
        staged_queries,
    )

    greens = last_green()
    q_names = set(oracle_sql())  # [Q] only — head slots are [Q]-only
    cohorts: dict[int, list[str]] = {}
    for n in sorted(q_names):
        cohorts.setdefault(greens.get(n, 0), []).append(n)

    head = set(_HEAD_ORDER)
    print(f"registered [Q]: {len(q_names)}; staged: {len(staged_queries())}"
          f" (introduction-slot candidates next round)")
    for rnd in sorted(cohorts):
        names = cohorts[rnd]
        in_head = sum(1 for n in names if n in head)
        label = "never-checked" if rnd == 0 else f"last-green r{rnd}"
        print(f"{label}: {len(names)} queries ({in_head} in current head)")
        oldest_green = min((r for r in cohorts if r > 0), default=None)
        if "--all" in sys.argv or (
            oldest_green is not None and rnd == oldest_green
        ):
            remaining = [n for n in names if n not in head]
            if remaining:
                print(textwrap.indent(
                    textwrap.fill(" ".join(remaining), 74),
                    "    "))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
