"""Tests for the governance & graph wave 8 (plans/queries_governance.py):
planted constraint violations, ntile balance invariants, a hand-countable
triangle graph, and the PartitionFilters pruning assertion. The
value-exactness check is the DuckDB oracle (tools/oracle_check.py); these
pin semantics the hash can't express."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as E
from tests.conftest import SF_SMOKE, make_docs


def test_dq_constraints_clean_fixture_passes(spark):
    rows = {
        r["constraint_name"]: r["n_violations"]
        for r in E.queries()["rel_dq_constraints"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == {
        "orders_pk_unique",
        "orders_custkey_fk",
        "lineitem_discount_range",
        "lineitem_quantity_not_null",
        "events_value_finite",
    }
    assert all(v == 0 for v in rows.values()), rows


def test_dq_constraints_counts_planted_violations(spark, tmp_path):
    pd.DataFrame({"c_custkey": [1]}).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame(
        {
            "o_orderkey": [10, 10, 11],  # duplicate PK
            "o_custkey": [1, 1, 99],     # 99 dangles
        }
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        {"l_quantity": [1.0, None], "l_discount": [0.9, 0.0]}  # range + null
    ).to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame(
        {
            "event_id": [1],
            "ts": pd.to_datetime(["2024-01-01"]),
            "user_id": [1],
            "event_type": ["x"],
            "value": [float("nan")],
            "props": ["{}"],
        }
    ).to_parquet(tmp_path / "events.parquet")
    rows = {
        r["constraint_name"]: r["n_violations"]
        for r in E.queries()["rel_dq_constraints"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["orders_pk_unique"] == 1
    assert rows["orders_custkey_fk"] == 1
    assert rows["lineitem_discount_range"] == 1
    assert rows["lineitem_quantity_not_null"] == 1
    assert rows["events_value_finite"] == 1


def test_ntile_balance_and_cume_terminal(spark):
    rows = E.queries()["rel_window_ntile_ranks"](spark, SF_SMOKE).collect()
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r)
    for flag, part in by_flag.items():
        counts: dict[int, int] = {}
        for r in part:
            counts[r["quartile"]] = counts.get(r["quartile"], 0) + 1
        assert set(counts) == {1, 2, 3, 4}, flag
        assert max(counts.values()) - min(counts.values()) <= 1, flag
        assert max(r["cume"] for r in part) == 1.0
        assert min(r["pct_rank"] for r in part) == 0.0


def test_triangle_count_on_planted_graph(spark, tmp_path):
    # edges: a-b, b-c, a-c (one triangle) plus pendant a-d (no triangle).
    docs = make_docs(
        spark,
        [(1, "a b", "en"), (2, "b c", "en"), (3, "a c", "en"),
         (4, "a d", "en")],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    r = E.queries()["text_triangle_count"](spark, str(tmp_path)).collect()[0]
    assert r["n_triangles"] == 1
    # degrees: a=3, b=2, c=2, d=1 -> triads = 3 + 1 + 1 + 0 = 5
    assert r["n_triads"] == 5
    assert r["clustering_coeff"] == pytest.approx(0.6)


def test_partitioned_scan_prunes_partitions(spark):
    df = E.queries()["source_partitioned_pruning"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the filter must reach the partition level, not the data level
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    out = {r["event_type"]: r["n"] for r in df.collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .where("event_type IN ('click', 'view')")
            .groupBy("event_type")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        )
    }
    assert out == exact
