#!/usr/bin/env python
"""Capture .explain("formatted") snapshots for the r12 optimization round.

Writes plans/r12/<query>_<suffix>.txt for each named query (default: every
bench HEADLINE query), so before/after plan diffs are committed evidence:

    python tools/r12_plans.py before                 # all headline queries
    python tools/r12_plans.py after q1 q2 ...        # just the named ones

The suffix is mandatory; query names are optional extras beyond HEADLINE
when you touched a non-headline query.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(argv: list[str]) -> int:
    if not argv or argv[0] not in ("before", "after"):
        print("usage: r12_plans.py {before|after} [query ...]", file=sys.stderr)
        return 2
    suffix = argv[0]
    from posts_vectorizer_spark.session import get_spark
    import __spark_entry__ as entrymod
    from bench import HEADLINE

    names = argv[1:] or list(HEADLINE)
    spark = get_spark("r12-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    outdir = os.path.join(REPO, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {SF_DIR} ({suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
