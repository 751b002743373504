"""Differential-oracle sweep: every registered [Q] query vs DuckDB at
sf0.01 — the same comparison the driver's correctness gate performs."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.conftest import SF_ORACLE, SF_SMOKE
from tools.oracle_check import compare_query

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "dim", "component"}


def test_every_query_has_doc_and_runs_registered():
    assert set(_ORACLES) <= set(_QUERIES)
    assert len(_QUERIES) >= 40


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(spark, duck, name):
    problems, n_rows = compare_query(
        spark, duck, name, _QUERIES[name], _ORACLES[name], SF_ORACLE
    )
    assert not problems, f"{name}: {problems}"
    assert n_rows >= 0


@pytest.mark.parametrize("name", ["tfidf_doc_vectors", "rel_groupby_agg"])
def test_queries_run_at_smoke_sf(spark, name):
    assert _QUERIES[name](spark, SF_SMOKE).count() > 0
