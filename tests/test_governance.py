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


def test_k_anonymity_ladder_matches_python_loop(spark):
    """Recount the generalization ladder with plain dict grouping."""
    import math as _math
    from collections import Counter as _Counter

    import pyarrow.parquet as _pq

    from posts_vectorizer_spark.plans.queries_governance import _KANON_K

    cust = _pq.read_table(f"{SF_SMOKE}/customer.parquet").to_pandas()
    nat = _pq.read_table(f"{SF_SMOKE}/nation.parquet").to_pandas()
    region_of = dict(zip(nat.n_nationkey.astype(int), nat.n_regionkey.astype(int)))

    def band(bal: float) -> int:
        # round half-away like the engines, then floor-divide by 1000
        r = _math.floor(abs(bal) + 0.5) * (1 if bal >= 0 else -1)
        return _math.floor(r / 1000.0)

    levels = {0: {}, 1: {}, 2: {}}
    for r in cust.itertuples():
        nk, seg, bal = int(r.c_nationkey), r.c_mktsegment, float(r.c_acctbal)
        keys = {
            0: (nk, region_of[nk], seg),
            1: (region_of[nk], seg),
            2: (seg,),
        }
        for lv, key in keys.items():
            g = levels[lv].setdefault(key, {"n": 0, "bands": set()})
            g["n"] += 1
            g["bands"].add(band(bal))
    want = {}
    for lv, groups in levels.items():
        sizes = [g["n"] for g in groups.values()]
        ldivs = [len(g["bands"]) for g in groups.values()]
        want[lv] = (
            len(groups),
            min(sizes),
            sum(1 for s in sizes if s < _KANON_K),
            min(ldivs),
        )
    got = {
        r.level: (r.n_groups, r.min_group, r.unsafe_groups, r.min_ldiversity)
        for r in E.queries()["rel_k_anonymity_ladder"](spark, SF_SMOKE).collect()
    }
    assert got == want


def test_dp_noisy_counts_noise_properties(spark):
    """The Laplace noise must be mean-bounded, deterministic across runs,
    and recoverable: noisy - true inverts through the Laplace CDF to the
    hash uniform each group key implies."""
    import math as _math

    from posts_vectorizer_spark.functions.text import HASH_BASE, HASH_MOD
    from posts_vectorizer_spark.plans.queries_governance import _DP_EPSILON

    true = {
        r.c_nationkey: r.n
        for r in (
            spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
            .groupBy("c_nationkey")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        )
    }

    def char_hash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * HASH_BASE + ord(ch)) % HASH_MOD
        return h

    rows1 = E.queries()["rel_dp_noisy_counts"](spark, SF_SMOKE).collect()
    rows2 = E.queries()["rel_dp_noisy_counts"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    b = 1.0 / _DP_EPSILON
    for r in rows1:
        u = (char_hash(f"dp:{r.c_nationkey}") + 1.0) / (HASH_MOD + 1)
        noise = (
            b * _math.log(2.0 * u)
            if u < 0.5
            else -b * _math.log(2.0 * (1.0 - u))
        )
        assert abs(r.noisy_count - (true[r.c_nationkey] + noise)) < 1e-5


def test_skew_gini_analytic(spark, tmp_path):
    """rel_skew_gini (staged r7) on crafted key frequencies: uniform
    frequencies give Gini exactly 0; frequencies [1,1,1,97] give the
    hand-computed 288/(4*100) = 0.72 and max/mean = 97/25."""
    import datetime

    from posts_vectorizer_spark.plans.registry import resolve_query

    q = resolve_query("rel_skew_gini")

    def write_events(d, freqs):
        rows = []
        eid = 0
        for uid, k in enumerate(freqs):
            for _ in range(k):
                rows.append(
                    (eid, uid, datetime.datetime(2024, 1, 2), "click", 1.0)
                )
                eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp,"
            " event_type string, value double",
        ).write.parquet(str(d / "events.parquet"))

    d1 = tmp_path / "uniform"
    d1.mkdir()
    write_events(d1, [5, 5, 5, 5])
    r = q(spark, str(d1)).collect()[0]
    assert r["gini"] == 0.0
    assert r["max_over_mean"] == 1.0
    assert (r["n_keys"], r["n_rows"], r["max_freq"]) == (4, 20, 5)

    d2 = tmp_path / "skewed"
    d2.mkdir()
    write_events(d2, [1, 1, 1, 97])
    r2 = q(spark, str(d2)).collect()[0]
    assert r2["gini"] == 0.72
    assert r2["max_over_mean"] == 3.88  # 97 / (100/4)
    assert r2["max_freq"] == 97


def test_mutual_information_planted_dependence(spark, tmp_path):
    """rel_mutual_information: a perfectly dependent pair (event_type
    determined by weekday) scores NMI ~= 1; an independent pair scores
    ~= 0; both match an independent plogp replica."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    def write(d, dependent):
        rows = []
        eid = 0
        for day in range(28):
            dow = (19723 + day) % 7  # epoch day of 2024-01-01 is 19723
            for j in range(10):
                eid += 1
                et = (
                    f"type{dow % 3}" if dependent else f"type{eid % 3}"
                )
                rows.append(
                    (eid, f"2024-01-{day + 1:02d} 09:00:00", 1, et, 1.0,
                     "{}")
                )
        d.mkdir()
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
            "event_type", "value", "props"
        ).write.parquet(str(d / "events.parquet"))

    write(tmp_path / "dep", True)
    r = resolve_query("rel_mutual_information")(
        spark, str(tmp_path / "dep")
    ).collect()[0]
    assert r["n"] == 280
    # type is a FUNCTION of weekday -> MI = H(type); NMI = sqrt(Hx/Hy)
    assert abs(r["mi"] - r["h_x"]) < 1e-9
    import math as _m

    assert abs(r["nmi"] - _m.sqrt(r["h_x"] / r["h_y"])) < 1e-9
    assert r["nmi"] > 0.7

    # replica of the 9dp-pinned algebra
    from collections import Counter

    cells = Counter()
    for day in range(28):
        dow = (19723 + day) % 7
        cells[(f"type{dow % 3}", dow)] += 10
    N = sum(cells.values())
    nx = Counter(); ny = Counter()
    for (xv, yv), c in cells.items():
        nx[xv] += c; ny[yv] += c
    Q9 = Decimal("0.000000001")

    def pin(v):
        return Decimal(repr(v)).quantize(Q9, ROUND_HALF_UP)

    mi_n = float(sum(
        pin(c * math.log(c * N / (nx[x] * ny[y])))
        for (x, y), c in cells.items()
    ))
    assert r["mi"] == mi_n / N

    write(tmp_path / "ind", False)
    r2 = resolve_query("rel_mutual_information")(
        spark, str(tmp_path / "ind")
    ).collect()[0]
    assert r2["nmi"] < 0.05


def test_chi2_independence_planted(spark, tmp_path):
    """rel_chi2_independence: a type-determined-by-weekday table gives
    a large chi² / Cramér's V near 1 and matches an independent plogp-
    free replica (including the ZERO cells the full grid must cover);
    an independent table gives V near 0."""
    from datetime import datetime as D

    from posts_vectorizer_spark.plans.registry import resolve_query

    def write(d, dependent):
        rows = []
        eid = 0
        for day in range(28):
            dow = (19723 + day) % 7
            for j in range(10):
                eid += 1
                et = f"type{dow % 3}" if dependent else f"type{eid % 3}"
                rows.append((eid, 1, D(2024, 1, day + 1, 9), et, 1.0))
        d.mkdir()
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp,"
            " event_type string, value double",
        ).write.parquet(str(d / "events.parquet"))

    write(tmp_path / "dep", True)
    r = resolve_query("rel_chi2_independence")(
        spark, str(tmp_path / "dep")
    ).collect()[0]
    assert (r["n"], r["n_rows_cat"], r["n_cols_cat"]) == (280, 3, 7)
    assert r["dof"] == 12
    assert r["cramers_v"] > 0.95  # functional dependence

    # replica over the full r x c grid (zero cells included)
    from collections import Counter

    cells = Counter()
    for day in range(28):
        dow = (19723 + day) % 7
        cells[(f"type{dow % 3}", dow)] += 10
    nx, ny = Counter(), Counter()
    for (xv, yv), c in cells.items():
        nx[xv] += c
        ny[yv] += c
    N = sum(cells.values())
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000000001")
    tot = Decimal(0)
    for xv in nx:
        for yv in ny:
            o = cells.get((xv, yv), 0)
            dev = o * N - nx[xv] * ny[yv]
            t = (dev * dev) / (N * nx[xv] * ny[yv])
            tot += Decimal(repr(float(t))).quantize(
                q, rounding=ROUND_HALF_UP
            )
    assert abs(r["chi2"] - float(tot)) < 1e-6

    write(tmp_path / "ind", False)
    r2 = resolve_query("rel_chi2_independence")(
        spark, str(tmp_path / "ind")
    ).collect()[0]
    assert r2["cramers_v"] < 0.15
