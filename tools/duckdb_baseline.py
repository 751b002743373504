"""DuckDB comparator for the 13 headline bench queries (BASELINE.md ask).

The driver's own BASELINE number has never been published into the repo, so
the honest local comparator for "single-node columnar engine at the same
scale" is DuckDB — already the correctness oracle — running the EXACT twin
SQL of each headline query on the same sf0.1 parquet files with all cores.

Times are best-of-N wall clock per oracle (result fully materialized via
fetchall). Prints one JSON line; run on a quiet machine like bench.py.

Usage:
    python tools/duckdb_baseline.py            # sf0.1, best-of-3
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/duckdb_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.oracle_check import duckdb_connection  # noqa: E402


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    best_of = int(os.environ.get("DUCKDB_BASELINE_RUNS", "3"))

    import bench  # the one headline list, no duplication
    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    con = duckdb_connection(sf_dir)

    out: dict[str, float] = {}
    for name in bench.HEADLINE:
        sql = oracles[name]
        best = None
        rows = 0
        for _ in range(best_of):
            t0 = time.perf_counter()
            rows = len(con.execute(sql).fetchall())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name:35s} {best:7.3f}s  ({rows} rows)", file=sys.stderr)

    total = round(sum(out.values()), 3)
    print(json.dumps({
        "metric": "duckdb_oracle_headline_total",
        "value": total,
        "unit": "sec",
        "queries": out,
        "sf": sf_dir,
        "threads": con.execute("SELECT current_setting('threads')").fetchone()[0],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
