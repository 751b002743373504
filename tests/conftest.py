from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from posts_vectorizer_spark.session import get_spark

    s = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(autouse=True)
def _fresh_scan_cache():
    """The scan memo assumes immutable fixture paths; tests that write
    their own parquet under tmp_path and re-read via load_table must never
    see another test's stale relation. Tracked persists likewise must not
    accumulate across the 185-query sweep (each test re-persists what it
    needs; a leaked cache would pin executor memory for the whole run)."""
    from posts_vectorizer_spark.cache import release_caches
    from posts_vectorizer_spark.sources.catalog import clear_scan_cache

    yield
    clear_scan_cache()
    release_caches()


@pytest.fixture(scope="session")
def duck():
    from tools.oracle_check import duckdb_connection

    return duckdb_connection(SF_ORACLE)


def make_docs(spark, rows):
    """documents-shaped DataFrame from (doc_id, text, lang) tuples."""
    return spark.createDataFrame(
        [(i, t, lg, f"src{i % 3}", len(t)) for i, t, lg in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
