"""Local replica of the driver's differential-oracle check.

Runs a registered Spark query and its DuckDB oracle side-by-side on the same
parquet tables and compares row count, schema (column names), and
order-insensitive values (columns sorted by name, rows sorted, exact equality
after canonicalization). Stricter-or-equal to any value-hash the driver
computes — if this passes at sf0.01, the driver's hash match passes.

Usage:
    python tools/oracle_check.py [query ...]      # default: all [Q] queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/oracle_check.py
"""

from __future__ import annotations

import math
import os
import sys
from datetime import datetime

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Canonicalize a cell for exact cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return v


def normalize(rows: list[dict], columns: list[str]):
    cols = sorted(columns)
    out = [tuple(_canon(r[c]) for c in cols) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return cols, out


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str):
    sdf = fn(spark, sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [dict(zip(duck_cols, row)) for row in res.fetchall()]

    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")
    if not problems:
        _, s_norm = normalize(spark_rows, spark_cols)
        _, d_norm = normalize(duck_rows, duck_cols)
        if s_norm != d_norm:
            diffs = [
                (a, b) for a, b in zip(s_norm, d_norm) if a != b
            ][:3]
            problems.append(f"value mismatch ({len([1 for a, b in zip(s_norm, d_norm) if a != b])} rows differ); first diffs: {diffs}")
    return problems, len(spark_rows)


def main(argv: list[str]) -> int:
    # Timestamps compare as UTC instants: the engine pins the SESSION TZ to
    # UTC (registry.prep_session), but PySpark's collect() renders
    # TimestampType through the PYTHON PROCESS timezone — outside any
    # query's control. Pin the process TZ so the harness is deterministic
    # under any shell TZ (the driver runs in UTC; a non-UTC driver process
    # would need TIMESTAMP_NTZ output columns instead).
    import time as _time

    os.environ["TZ"] = "UTC"
    _time.tzset()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as entry_mod
    from posts_vectorizer_spark.session import get_spark

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # Staged queries (built after the round's head lock; registry.STAGED)
    # are part of the verified surface even before the driver sees them:
    # included by name, via --staged (staged only), or in the no-arg sweep.
    from posts_vectorizer_spark.plans.registry import (
        staged_oracle_sql,
        staged_queries,
    )

    staged = staged_queries()
    staged_or = staged_oracle_sql()
    if argv and argv[0] == "--staged":
        qs, oracles = staged, staged_or
        names = argv[1:] or sorted(staged_or)
    else:
        qs = {**qs, **staged}
        oracles = {**oracles, **staged_or}
        names = argv or sorted(oracles)
    spark = get_spark("oracle-check", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    con = duckdb_connection(sf_dir)

    failed = []
    slowest: list[tuple[float, str]] = []
    for name in names:
        if name not in oracles:
            print(f"SKIP  {name} (rows-only [R] query)")
            continue
        t0 = _time.perf_counter()
        try:
            problems, n = compare_query(spark, con, name, qs[name], oracles[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        elapsed = _time.perf_counter() - t0
        slowest.append((elapsed, name))
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            failed.append(name)
        else:
            print(f"OK    {name} ({n} rows, {elapsed:.2f}s)")
        from posts_vectorizer_spark.cache import release_caches

        release_caches()  # per-query caches don't outlive their comparison
    if len(slowest) > 5:
        top = ", ".join(
            f"{n}={t:.1f}s" for t, n in sorted(slowest, reverse=True)[:5]
        )
        print(f"\nslowest: {top}")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
