"""Edge-input robustness: every query family must plan and execute against
EMPTY tables without crashing (P9's 'natural no-op' claim, proved rather
than asserted) — the guard against partition files with zero rows, fresh
streams, and filtered-to-nothing inputs at 100 TB."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.conftest import SF_SMOKE

# one representative per family; heavy drains / model fits excluded
EMPTY_SAFE = [
    "rel_scan_filter_project",
    "rel_groupby_agg",
    "rel_window_topk_per_group",
    "rel_histogram_equi_width",
    "text_quality_profile",
    "text_repetition_signals",
    "dedup_exact_keep_first",
    "dedup_minhash_near_dups",
    "events_tumbling_window",
    "events_range_join_clicks",
    "events_hypertable_rollup",
    "tfidf_term_frequency",
    "tfidf_vocabulary",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """An sf_dir whose tables have the real schemas but zero rows."""
    from posts_vectorizer_spark.sources import TABLES, load_table

    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load_table(spark, SF_SMOKE, t).limit(0).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_query_survives_empty_tables(spark, empty_sf, name):
    rows = E.queries()[name](spark, empty_sf).collect()
    # vocabulary still contains the DICTIONARY_EXTRAS seed words; everything
    # else must be empty, and nothing may raise
    if name != "tfidf_vocabulary":
        assert rows == []


def test_scan_cache_cleared_on_fixture_rewrite(spark, tmp_path):
    """_SCAN_CACHE memoizes analyzed scans per path; rewriting a path
    in-place must be followed by clear_scan_cache() to observe the new
    schema (keyed by path, not mtime — documented footgun)."""
    from posts_vectorizer_spark.sources.catalog import (
        clear_scan_cache,
        load_table,
    )

    d = str(tmp_path)
    spark.range(3).selectExpr("id AS a").write.mode("overwrite").parquet(
        f"{d}/nation.parquet"
    )
    assert load_table(spark, d, "nation").columns == ["a"]
    spark.range(3).selectExpr("id AS a", "id AS b").write.mode(
        "overwrite"
    ).parquet(f"{d}/nation.parquet")
    # memoized: still the stale single-column relation
    assert load_table(spark, d, "nation").columns == ["a"]
    clear_scan_cache()
    assert load_table(spark, d, "nation").columns == ["a", "b"]


def test_bench_headline_line_fits_driver_tail_capture():
    """The driver tail-captures ~2000 bytes of bench stdout; r3's BENCH
    artifact was lost when stage metrics pushed the line to 2.6 KB. Pin
    the contract: the final line built from the real HEADLINE list (with
    worst-case-width timings) stays under 1 KB, parses back, and stage
    metrics are NOT in it."""
    import importlib.util
    import json as _json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    timings = {name: 123.456 for name in bench.HEADLINE}
    line = bench.headline_line(timings, round(sum(timings.values()), 3), 0.1)
    assert len(line.encode()) < 1000, len(line)
    parsed = _json.loads(line)
    assert parsed["queries"] == timings
    assert "stage_metrics" not in parsed


def test_staged_queries_survive_empty_tables(spark, tmp_path):
    """P9 (empty-input guard) extended to the staged wave: every staged
    query must return an empty (or degenerate-diagnostic) result on
    schema-correct zero-row tables, never crash. The r7 empty-input
    smoke caught two real ones: sim_hard_negatives IndexError'd on an
    empty label list, and stream_ddsketch_drain raised on the merge
    sink's never-materialized state."""
    from posts_vectorizer_spark.plans.registry import staged_queries
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        load_table(spark, SF_SMOKE, t).limit(0).write.parquet(
            str(tmp_path / f"{t}.parquet")
        )
    for name, fn in staged_queries().items():
        n = fn(spark, str(tmp_path)).count()
        assert n <= 1, f"{name}: unexpected rows on empty input"
