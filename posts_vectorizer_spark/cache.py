"""Tracked persists — fix for the leaked-cache anti-pattern (VERDICT r1 #5).

Plan builders persist mid-plan relations (token_base, shingle sets, band
frames) because several branches of ONE query reuse them; that cache must
stay alive until the query's action runs, so builders can't unpersist it
themselves. Instead every engine persist registers here and the caller that
drove the action releases it: bench.py after each timed query,
tools/oracle_check.py after each comparison, tests via the
``release_caches`` helper. A long-lived session therefore holds cached data
only for queries in flight, not for every query ever built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for later release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked cache (safe mid-query: Spark falls back to
    recompute). Returns the number released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
