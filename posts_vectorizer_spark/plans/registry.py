"""Query registry — the single source of truth behind __spark_entry__.py.

Every implemented operator from SURVEY.md §2 registers here as a named pair
(PySpark builder, DuckDB oracle SQL). ``oracle=None`` marks [R] rows-only
checks (genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..session import prep_session

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver hands us ITS session; pin the runtime-settable conf
            # our results depend on (UTC timestamps).
            prep_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, wrapped, oracle, fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import queries_tfidf  # noqa: F401

    # Cost-ascending across modules too: every cheap oracle-backed module
    # registers BEFORE queries_extras' streaming/MLlib drains, so a
    # time-budgeted correctness driver (r1 ran only 50 of 56 entries)
    # checks the hash-matched surface first.
    for mod in ("queries_relational", "queries_text", "queries_dedup",
                "queries_similarity", "queries_events", "queries_advanced",
                "queries_quality", "queries_curation", "queries_corpus",
                "queries_sketch", "queries_timeseries",
                "queries_governance", "queries_lakehouse",
                "queries_stats", "queries_fuzzy", "queries_extras"):
        try:
            __import__(f"{__package__}.{mod}")
        except ModuleNotFoundError as e:
            # Only tolerate THE module itself being absent (incremental
            # rounds); a transitive import failure inside a present module
            # must fail loudly, not silently shrink the query surface.
            if e.name != f"{__package__}.{mod}":
                raise
    _LOADED = True
