"""Driver contract for the spark-graft builder (PySpark target).

Thin wiring over posts_vectorizer_spark.plans — the registry holds every
(PySpark query, DuckDB oracle) pair implemented from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from posts_vectorizer_spark.plans import registry as _registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The TF-IDF-weighted document-vector pipeline — the reference worker's
    core computation (/root/reference/worker.py:76-94) as one declarative
    Spark plan (SURVEY.md §3.1 redesign).
    """
    return _registry.queries()["tfidf_doc_vectors"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every [Q] query (omitted for [R] checks)."""
    return _registry.oracle_sql()
