"""Tests for the sketch & iterative wave 6 (plans/queries_sketch.py):
HLL error bound and duplicate-invariance, CMS over-estimate structure,
TextRank mass conservation and hub dominance, SCD2 version collapse on a
planted state sequence. The value-exactness check is the DuckDB oracle
(tools/oracle_check.py); these pin semantics the hash can't express."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as E
from tests.conftest import SF_SMOKE, make_docs


def _write_lineitem(tmp_path, keys):
    pd.DataFrame({"l_orderkey": keys}).to_parquet(
        tmp_path / "lineitem.parquet"
    )


def test_hll_error_bound_and_duplicate_invariance(spark, tmp_path):
    # 64 registers -> typical relative error ~1.04/sqrt(64) = 13%; assert a
    # generous 35% bound, and that duplicates cannot move the estimate (the
    # sketch sees sets, not bags).
    once = tmp_path / "once"
    thrice = tmp_path / "thrice"
    once.mkdir(), thrice.mkdir()
    keys = list(range(1, 2001))
    _write_lineitem(once, keys)
    _write_lineitem(thrice, keys * 3)
    q = E.queries()["rel_hll_portable"]
    r1 = q(spark, str(once)).collect()[0]
    r3 = q(spark, str(thrice)).collect()[0]
    assert r1["exact_distinct"] == 2000
    assert r1["rel_error"] < 0.35
    assert r1["hll_estimate"] == r3["hll_estimate"]


def test_cms_estimates_dominate_exact_counts(spark):
    rows = E.queries()["text_cms_heavy_hitters"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["cms_estimate"] >= r["exact_cnt"]
    # the sketch is lossy by construction at 31 words / 32 buckets: at
    # least the total mass must be conserved per hash row, so the largest
    # estimate cannot exceed the total token count
    total = sum(r["exact_cnt"] for r in rows)
    assert max(r["cms_estimate"] for r in rows) <= total


def test_textrank_mass_and_hub_dominance(spark, tmp_path):
    # star graph: "hub" is adjacent to every spoke; spokes only see hub.
    docs = make_docs(
        spark,
        [(i, f"hub spoke{i}", "en") for i in range(6)],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["word"]: r["textrank"]
        for r in E.queries()["text_textrank_unrolled"](
            spark, str(tmp_path)
        ).collect()
    }
    assert max(out, key=out.get) == "hub"
    # PageRank conserves mass on a graph with no dangling nodes
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)


def test_scd2_collapses_runs_and_flags_current(spark, tmp_path):
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 01:00",
         "2024-01-01 02:00", "2024-01-01 03:00"]
    )
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": ts,
            "user_id": [7, 7, 7, 7],
            "event_type": ["A", "A", "B", "A"],
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    ).to_parquet(tmp_path / "events.parquet")
    rows = sorted(
        E.queries()["events_scd2_versions"](spark, str(tmp_path)).collect(),
        key=lambda r: r["effective_from"],
    )
    assert [r["state"] for r in rows] == ["A", "B", "A"]
    # consecutive duplicates collapse: version 1 covers events 1-2
    assert rows[0]["effective_to"] == rows[1]["effective_from"]
    assert [r["is_current"] for r in rows] == [False, False, True]
    assert rows[2]["effective_to"] is None
