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


def test_scd2_lookup_boundary_semantics(spark, tmp_path):
    # Same-timestamp tie rules on a crafted dimension. Probes are events
    # too (the query derives versions from ALL events), so each probe's
    # own 'error' change opens a version at its timestamp; the contract
    # is: a probe sees the LATEST change at-or-before its ts, with all
    # same-ts changes (including higher event_ids) sorting before it.
    ts = pd.to_datetime(
        [
            "2024-01-01 01:00",  # version A opens (id 1)
            "2024-01-01 03:00",  # probe (id 2) AND version B (id 3)
            "2024-01-01 03:00",
            "2024-01-01 00:30",  # probe before any other version (id 4)
        ]
    )
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [ts[0], ts[1], ts[2], ts[3]],
            "user_id": [7] * 4,
            "event_type": ["A", "error", "B", "error"],
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    ).to_parquet(tmp_path / "events.parquet")
    got = {
        r["event_id"]: r["state"]
        for r in E.queries()["events_scd2_lookup"](
            spark, str(tmp_path)
        ).collect()
    }
    # the 00:30 probe precedes every OTHER event; its own change opens
    # an 'error' version at 00:30, which is the valid state then
    assert got[4] == "error"
    # the 03:00 probe (id 2) shares its ts with version B (id 3): ALL
    # same-ts changes sort before the probe, so it sees B — the latest
    # same-ts change supersedes both A and the probe's own lower-id
    # 'error' change (closed-open [from, to) boundary semantics)
    assert got[2] == "B"


def test_ddsketch_partial_sketches_merge_exactly(spark):
    """The property that makes the log-linear quantile sketch a 100 TB
    operator: per-group partial sketches (here: one per l_returnflag)
    merge by ADDING bucket counts, and the merged readout is bit-identical
    to the single-pass global readout — no re-scan, no approximation
    drift. Rebuilds the merge in pandas and diffs the registered query."""
    from collections import Counter

    from pyspark.sql import functions as F

    from posts_vectorizer_spark.plans.registry import resolve_query
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_ORACLE

    pop = load_table(spark, SF_ORACLE, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    rows = pop.groupBy(
        "flag",
        F.length(F.col("cents").cast("string")).alias("d"),
        F.substring(F.col("cents").cast("string"), 1, 2)
        .cast("bigint")
        .alias("f2"),
    ).count().collect()

    merged: Counter = Counter()
    per_flag: dict[str, Counter] = {}
    for r in rows:
        per_flag.setdefault(r["flag"], Counter())[(r["d"], r["f2"])] += r["count"]
        merged[(r["d"], r["f2"])] += r["count"]
    assert len(per_flag) >= 2, "need several partial sketches to merge"
    # associativity: summing the partials IS the global sketch
    total_from_partials: Counter = Counter()
    for c in per_flag.values():
        total_from_partials.update(c)
    assert total_from_partials == merged

    # readout from the merged counts == the registered query's output
    n = sum(merged.values())
    ordered = sorted(merged.items())
    out = {}
    for num, den, label in ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")):
        target = (n * num + den - 1) // den
        cum = 0
        for (d, f2), cnt in ordered:
            cum += cnt
            if cum >= target:
                lower = int(str(f2) + "0" * (d - 2))
                width = int("1" + "0" * (d - 2))
                out[label] = (2 * lower + width) / 200.0
                break
    got = {
        r["quantile"]: r["est_value"]
        for r in resolve_query("rel_ddsketch_quantiles")(
            spark, SF_ORACLE
        ).collect()
    }
    assert got == out


@pytest.mark.parametrize("seed", [3, 17, 101])
def test_ddsketch_order_statistic_in_selected_bucket(spark, tmp_path, seed):
    """The sketch's correctness guarantee, fuzzed: buckets partition the
    value axis in order, so the bucket whose cumulative count crosses
    ceil(q*n) must CONTAIN the exact ceil-rank order statistic — the
    estimate is off by at most half the bucket width, which is what
    rel_err_bound reports. Seeded random prices across four orders of
    magnitude (cents 1e2..1e6), exact order statistics from a sorted
    array."""
    import math
    import random

    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = random.Random(seed)
    prices = [
        round(math.exp(rng.uniform(math.log(1.0), math.log(10_000.0))), 2)
        for _ in range(4000)
    ]
    d = tmp_path / f"s{seed}"
    d.mkdir()
    spark.createDataFrame(
        [(p,) for p in prices], "l_extendedprice double"
    ).write.parquet(str(d / "lineitem.parquet"))

    cents = sorted(round(p * 100) for p in prices)
    n = len(cents)
    rows = resolve_query("rel_ddsketch_quantiles")(spark, str(d)).collect()
    assert {r["quantile"] for r in rows} == {"p50", "p90", "p99"}
    for r in rows:
        num, den = {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)}[
            r["quantile"]
        ]
        exact = cents[(n * num + den - 1) // den - 1]
        s = str(exact)
        lower = int(s[:2] + "0" * (len(s) - 2))
        width = int("1" + "0" * (len(s) - 2))
        est_cents = r["est_value"] * 100
        assert lower <= exact < lower + width, (r, exact)
        assert abs(est_cents - exact) <= width / 2 + 1e-6, (r, exact)
        assert r["n"] == n


def test_hll_set_ops_planted_and_invariants(spark, tmp_path):
    """rel_hll_set_ops (staged r10): planted events make A={1,2,3},
    B={3,4} — exact counts and the intersection must be hand-exact;
    the union estimate must dominate both per-set estimates (union
    registers are the per-set max-merge, so registers only grow) and
    inclusion-exclusion must tie out arithmetically."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []
    eid = 0
    for u in (1, 2, 3):
        rows.append((eid, "2024-01-01 00:00:00", u, "purchase", 900.0, "{}"))
        eid += 1
    for u in (3, 4):
        rows.append((eid, "2024-01-01 00:00:00", u, "click", 900.0, "{}"))
        eid += 1
    # below-threshold noise that must NOT join any set
    rows.append((eid, "2024-01-01 00:00:00", 9, "purchase", 10.0, "{}"))
    d = tmp_path / "ev"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.parquet(str(d / "events.parquet"))
    [r] = resolve_query("rel_hll_set_ops")(spark, str(d)).collect()
    assert (r["exact_a"], r["exact_b"]) == (3, 2)
    assert (r["exact_union"], r["exact_intersection"]) == (4, 1)
    assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-9
    assert r["est_intersection"] == round(
        r["est_a"] + r["est_b"] - r["est_union"], 6
    )
    # exact replay: rebuild registers + the raw readout in Python (the
    # query deliberately has NO small-range correction — it is the raw
    # alpha*m^2/sum form, which overestimates tiny sets; the replay pins
    # that definition rather than a regime guess)
    from posts_vectorizer_spark.functions.text import HASH_MOD
    from posts_vectorizer_spark.plans.queries_sketch import (
        _HLL_ALPHA, _HLL_M, _HLL_MAXBIT, _HLL_MULT,
    )

    def est(users):
        regs = [0] * _HLL_M
        for u in users:
            hb = (u * _HLL_MULT + 7919) % HASH_MOD
            h = (hb * hb) % HASH_MOD
            rest = h // _HLL_M
            rho = next(
                (k for k in range(_HLL_MAXBIT + 1) if (rest >> k) & 1),
                _HLL_MAXBIT,
            ) + 1
            b = h % _HLL_M
            regs[b] = max(regs[b], rho)
        return round(
            _HLL_ALPHA * _HLL_M * _HLL_M
            / sum(2.0 ** -m for m in regs), 6
        )

    assert r["est_a"] == est({1, 2, 3})
    assert r["est_b"] == est({3, 4})
    assert r["est_union"] == est({1, 2, 3, 4})


def test_stream_cms_drain_equals_batch(spark):
    """stream_cms_drain (staged r10): the two-micro-batch merged sketch
    must yield EXACTLY the one-pass batch query's rows — counter
    addition is commutative, so any batch split is invisible."""
    from tests.conftest import SF_SMOKE

    from posts_vectorizer_spark.plans.registry import resolve_query

    batch = {
        (r["word"], r["exact_cnt"], r["cms_estimate"])
        for r in resolve_query("text_cms_heavy_hitters")(
            spark, SF_SMOKE
        ).collect()
    }
    streamed = {
        (r["word"], r["exact_cnt"], r["cms_estimate"])
        for r in resolve_query("stream_cms_drain")(
            spark, SF_SMOKE
        ).collect()
    }
    assert batch and streamed == batch


def test_stream_hll_drain_equals_batch_and_max_merge_idempotent(spark):
    """stream_hll_drain (staged r10): the two-micro-batch max-merged
    registers must yield EXACTLY rel_hll_portable's row (register max
    is split-invariant); and the r9 max-merge sink is idempotent —
    re-applying the same delta with a NEW batch id leaves values
    unchanged (dominance), while a REPLAYED batch id is skipped by the
    ledger before any work."""
    import tempfile

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE

    from posts_vectorizer_spark.plans.registry import resolve_query
    from posts_vectorizer_spark.sources.sinks import (
        merge_max_parquet,
        read_merged,
    )

    batch = resolve_query("rel_hll_portable")(spark, SF_SMOKE).collect()
    streamed = resolve_query("stream_hll_drain")(spark, SF_SMOKE).collect()
    assert len(batch) == len(streamed) == 1
    assert batch[0].asDict() == streamed[0].asDict()

    # max-merge semantics on a tiny hand state
    d = tempfile.mkdtemp(prefix="pv_maxmerge_")
    delta1 = spark.createDataFrame(
        [(0, 3), (1, 5)], "bucket long, rho long"
    )
    delta2 = spark.createDataFrame(
        [(0, 7), (2, 1)], "bucket long, rho long"
    )
    merge_max_parquet(spark, delta1, d, ["bucket"], batch_id=1)
    merge_max_parquet(spark, delta2, d, ["bucket"], batch_id=2)
    got = {
        r["bucket"]: r["rho"] for r in read_merged(spark, d).collect()
    }
    assert got == {0: 7, 1: 5, 2: 1}
    # dominance: same values under a new id -> no change
    merge_max_parquet(spark, delta1, d, ["bucket"], batch_id=3)
    got2 = {
        r["bucket"]: r["rho"] for r in read_merged(spark, d).collect()
    }
    assert got2 == got
    # ledger: replayed id skipped even with different (higher!) values
    bigger = spark.createDataFrame([(0, 99)], "bucket long, rho long")
    merge_max_parquet(spark, bigger, d, ["bucket"], batch_id=2)
    got3 = {
        r["bucket"]: r["rho"] for r in read_merged(spark, d).collect()
    }
    assert got3 == got


def _write_kmv_events(tmp_path, clickers, buyers):
    rows = [(u, "click") for u in clickers] + [(u, "purchase") for u in buyers]
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(["2024-01-01 00:00:00"] * len(rows)),
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")


def test_kmv_below_k_is_exact_set_algebra(spark, tmp_path):
    """With both sides below k=64 the KMV sketch IS the set: estimates
    are exact distinct counts and jaccard is the true |A∩B|/|A∪B|."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    t = tmp_path / "kmv1"
    t.mkdir()
    _write_kmv_events(t, clickers=range(30), buyers=range(15, 35))
    [r] = resolve_query("events_kmv_set_ops")(spark, str(t)).collect()
    assert (r["k_a"], r["k_b"], r["k_union"]) == (30, 20, 35)
    assert (r["est_a"], r["est_b"], r["est_union"]) == (30.0, 20.0, 35.0)
    assert r["both_in_union"] == 15
    assert r["jaccard"] == 15 / 35


def test_kmv_above_k_matches_python_replica_and_error_bound(spark, tmp_path):
    """Above k the sketch must equal an independent Python replica of
    the bottom-k construction value-for-value, and the estimator must
    land within the ~3/sqrt(k) relative-error regime on 500/400-sized
    sets with a 200-user overlap."""
    from posts_vectorizer_spark.functions.text import HASH_MOD
    from posts_vectorizer_spark.plans.queries_sketch import _HLL_MULT, _KMV_K
    from posts_vectorizer_spark.plans.registry import resolve_query

    clickers = list(range(500))
    buyers = list(range(300, 700))
    t = tmp_path / "kmv2"
    t.mkdir()
    _write_kmv_events(t, clickers, buyers)
    [r] = resolve_query("events_kmv_set_ops")(spark, str(t)).collect()

    def h(u):
        b = (u * _HLL_MULT + 7919) % HASH_MOD
        return b * b % HASH_MOD

    sk_a = sorted(h(u) for u in clickers)[:_KMV_K]
    sk_b = sorted(h(u) for u in buyers)[:_KMV_K]
    union_k = sorted(set(sk_a) | set(sk_b))[:_KMV_K]
    both = sum(1 for v in union_k if v in set(sk_a) and v in set(sk_b))
    assert (r["k_a"], r["k_b"], r["k_union"]) == (
        len(sk_a), len(sk_b), len(union_k),
    )
    assert r["est_a"] == (_KMV_K - 1) * HASH_MOD / sk_a[-1]
    assert r["est_b"] == (_KMV_K - 1) * HASH_MOD / sk_b[-1]
    assert r["est_union"] == (_KMV_K - 1) * HASH_MOD / union_k[-1]
    assert r["both_in_union"] == both
    assert r["jaccard"] == both / len(union_k)
    # statistical sanity: 3/sqrt(64) = 37.5% relative error envelope
    assert abs(r["est_a"] - 500) / 500 < 0.375
    assert abs(r["est_b"] - 400) / 400 < 0.375
    assert abs(r["est_union"] - 700) / 700 < 0.375
    assert abs(r["jaccard"] - 200 / 700) < 0.2


def test_stream_kmv_drain_equals_batch(spark, tmp_path):
    """stream_kmv_drain's merged-state readout must equal the one-pass
    batch query exactly: bottomk(state ∪ delta) is monotone and
    idempotent, so the forced two-batch split cannot move a value.
    Fixture crosses k=64 on one side so the estimator path (not just
    the exact below-k path) is exercised through the stream."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    t = tmp_path / "kmvd"
    t.mkdir()
    _write_kmv_events(t, clickers=range(200), buyers=range(150, 190))

    batch = resolve_query("events_kmv_set_ops")(spark, str(t)).collect()
    drain = resolve_query("stream_kmv_drain")(spark, str(t)).collect()
    assert [r.asDict() for r in drain] == [r.asDict() for r in batch]
    [r] = drain
    assert r["k_a"] == 64          # clicker side crossed k
    assert r["k_b"] == 40          # buyer side still exact
    assert r["est_b"] == 40.0


def test_stream_benford_drain_equals_batch(spark, tmp_path):
    """stream_benford_drain's state after a two-batch drain yields
    EXACTLY the batch readout — digit counts are additive, so the
    split cannot move the chi-square statistic."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "bf"
    d.mkdir()
    rows = [(i, i % 200 + 1, (i * 37 % 9000) / 100 + 1.0) for i in range(400)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_extendedprice double"
    ).write.parquet(str(d / "lineitem.parquet"))

    got = {r["digit"]: r for r in
           resolve_query("stream_benford_drain")(spark, str(d)).collect()}
    want = {r["digit"]: r for r in
            resolve_query("rel_benford_digit_test")(spark, str(d)).collect()}
    assert set(got) == set(want) == set(range(1, 10))
    for dg in got:
        assert got[dg]["observed"] == want[dg]["observed"]
        assert got[dg]["chi2"] == want[dg]["chi2"]
        assert got[dg]["nonconforming"] == want[dg]["nonconforming"]


def test_stream_zipf_drain_equals_batch(spark, tmp_path):
    """stream_zipf_drain's merged vocabulary state yields EXACTLY the
    batch Zipf fit — word counts are additive and the OLS readout is a
    pure function of the merged counts."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    words = []
    for rank, k in enumerate((240, 120, 80, 60, 48), 1):
        words += [f"w{rank}"] * k
    docs = make_docs(
        spark,
        [(i, " ".join(words[i::4]), "en") for i in range(4)],
    )
    d = tmp_path / "zf"
    d.mkdir()
    docs.write.parquet(str(d / "documents.parquet"))

    got = resolve_query("stream_zipf_drain")(spark, str(d)).collect()
    want = resolve_query("text_zipf_fit")(spark, str(d)).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()


def test_stream_novelty_drain_equals_batch_and_min_merge(spark, tmp_path):
    """stream_novelty_drain: the MIN-merged first-occurrence state
    yields EXACTLY the batch novelty profile — min is commutative and
    idempotent, so the forced two-batch split (and any replay) cannot
    move a first occurrence."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    a = "red green blue cyan magenta yellow"
    docs = make_docs(
        spark,
        [(0, a, "en"), (1, a + " extra tokens here", "en"),
         (2, "wholly fresh words only appear here now", "en"),
         (3, a, "en")],
    )
    d = tmp_path / "novd"
    d.mkdir()
    docs.write.parquet(str(d / "documents.parquet"))

    got = sorted(
        resolve_query("stream_novelty_drain")(spark, str(d)).collect(),
        key=lambda r: r["doc_id"],
    )
    want = sorted(
        resolve_query("text_ngram_novelty")(spark, str(d)).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    # doc 0 and doc 2 fully novel; the copies are not
    byid = {r["doc_id"]: r for r in got}
    assert byid[0]["novelty"] == 1.0 and byid[2]["novelty"] == 1.0
    assert byid[3]["novelty"] == 0.0


def test_merge_min_parquet_dominance(spark, tmp_path):
    """merge_min_parquet: matched keys take the MIN, unmatched insert,
    replayed batch ids are skipped — the fourth sink combiner."""
    from posts_vectorizer_spark.sources.sinks import (
        merge_min_parquet, read_merged,
    )

    t = str(tmp_path / "minsink")
    d1 = spark.createDataFrame(
        [("a", 5), ("b", 7)], "k string, v long"
    )
    merge_min_parquet(spark, d1, t, ["k"], batch_id=0)
    d2 = spark.createDataFrame(
        [("a", 9), ("b", 3), ("c", 4)], "k string, v long"
    )
    merge_min_parquet(spark, d2, t, ["k"], batch_id=1)
    state = {r["k"]: r["v"] for r in read_merged(spark, t).collect()}
    assert state == {"a": 5, "b": 3, "c": 4}
    # replay of batch 1 is a no-op via the ledger
    d3 = spark.createDataFrame([("a", 1)], "k string, v long")
    merge_min_parquet(spark, d3, t, ["k"], batch_id=1)
    state = {r["k"]: r["v"] for r in read_merged(spark, t).collect()}
    assert state == {"a": 5, "b": 3, "c": 4}


def test_stream_mutual_info_drain_equals_batch(spark, tmp_path):
    """stream_mutual_info_drain's merged contingency state yields
    EXACTLY the batch MI/NMI profile — cell counts are additive, so
    the forced two-batch split cannot move a plogp term."""
    from datetime import datetime as D

    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "mid"
    d.mkdir()
    # event_type depends on weekday for the first users, independent
    # for the rest — a mixed-dependence table with >1 cell per margin
    rows = []
    for i in range(240):
        day = i % 14
        et = ("click", "view", "purchase")[
            day % 3 if i < 120 else (i * 7) % 3
        ]
        rows.append((i, i % 10, D(2024, 1, 1 + day, 12), et, 1.0))
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    ).write.parquet(str(d / "events.parquet"))

    got = resolve_query("stream_mutual_info_drain")(spark, str(d)).collect()
    want = resolve_query("rel_mutual_information")(spark, str(d)).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()
    assert got[0]["mi"] > 0  # the planted half-dependence is visible


def test_stream_transition_entropy_drain_equals_batch(spark, tmp_path):
    """stream_transition_entropy_drain: the USER-disjoint forced split
    keeps per-batch transition pairs exact, so the merged matrix yields
    EXACTLY the batch entropy readout — including users whose journeys
    would break if the split were row-wise instead of key-wise."""
    from datetime import datetime as D

    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "ted"
    d.mkdir()
    rows = []
    eid = 0
    # deterministic cycle for even users, varied paths for odd users —
    # long journeys so a row-wise split WOULD have moved pairs
    for u in range(8):
        seq = (
            ["click", "view", "purchase"] * 4
            if u % 2 == 0
            else ["click", "view", "click", "purchase", "view", "view"]
        )
        for k, et in enumerate(seq):
            rows.append((eid, u, D(2024, 1, 1, k), et, 1.0))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    ).write.parquet(str(d / "events.parquet"))

    got = resolve_query("stream_transition_entropy_drain")(
        spark, str(d)
    ).collect()
    want = resolve_query("events_transition_entropy")(
        spark, str(d)
    ).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()
    r = got[0]
    assert 0 < r["predictability"] < 1
    assert r["n_transitions"] == sum(
        (12 - 1) if u % 2 == 0 else (6 - 1) for u in range(8)
    )


def test_stream_good_turing_drain_equals_batch(spark, tmp_path):
    """stream_good_turing_drain: the SAME standing word-count state as
    the Zipf drain feeds a second readout — the Good-Turing table from
    merged state equals the one-pass batch query exactly (adjacency
    holes, unseen mass and all)."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    # counts 1,1,2,3,5 -> count-of-counts with a hole at r=4
    docs = make_docs(
        spark,
        [(0, "ape bee bee cat cat dog", "en"),
         (1, "cat dog dog fox dog dog", "en")],
    )
    d = tmp_path / "gtd"
    d.mkdir()
    docs.write.parquet(str(d / "documents.parquet"))

    got = sorted(
        resolve_query("stream_good_turing_drain")(spark, str(d)).collect(),
        key=lambda r: r["r"],
    )
    want = sorted(
        resolve_query("text_good_turing")(spark, str(d)).collect(),
        key=lambda r: r["r"],
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    byr = {r["r"]: r for r in got}
    assert byr[1]["unseen_mass"] is not None
    assert byr[5]["n_r_plus_1"] == 0  # tail hole stays a hole


def test_stream_anova_drain_equals_batch(spark, tmp_path):
    """stream_anova_drain: merged integer group moments yield EXACTLY
    the batch F/eta² — counts, sums, and sums of squares are additive,
    so the forced split cannot move the statistic."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "anv"
    d.mkdir()
    rows = [
        (i, ("A", "N", "R")[i % 3], float(1 + (i * 7) % 50))
        for i in range(300)
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_returnflag string, l_quantity double"
    ).write.parquet(str(d / "lineitem.parquet"))

    got = resolve_query("stream_anova_drain")(spark, str(d)).collect()
    want = resolve_query("rel_anova_oneway")(spark, str(d)).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()


def test_stream_jsd_drain_equals_batch(spark, tmp_path):
    """stream_jsd_drain: the merged (source, word) counts yield EXACTLY
    the batch per-source JSD profile — the unbounded-key additive
    family with a two-level key."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    docs = make_docs(
        spark,
        [(i, ("xx yy", "xx xx", "yy zz ww")[i % 3], "en")
         for i in range(9)],
    )
    d = tmp_path / "jsdd"
    d.mkdir()
    docs.write.parquet(str(d / "documents.parquet"))

    got = sorted(
        resolve_query("stream_jsd_drain")(spark, str(d)).collect(),
        key=lambda r: r["source"],
    )
    want = sorted(
        resolve_query("text_jsd_source_drift")(spark, str(d)).collect(),
        key=lambda r: r["source"],
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert len(got) == 3


def test_stream_chi2_drain_equals_batch(spark, tmp_path):
    """stream_chi2_drain reads the SAME standing contingency state the
    MI drain maintains and yields EXACTLY the batch chi²/Cramér's-V
    profile — the second readout of one state family (the
    Zipf/Good-Turing dividend on the dependence monitors)."""
    from datetime import datetime as D

    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "chi2d"
    d.mkdir()
    rows = []
    for i in range(240):
        day = i % 14
        et = ("click", "view", "purchase")[
            day % 3 if i < 120 else (i * 7) % 3
        ]
        rows.append((i, i % 10, D(2024, 1, 1 + day, 12), et, 1.0))
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    ).write.parquet(str(d / "events.parquet"))

    got = resolve_query("stream_chi2_drain")(spark, str(d)).collect()
    want = resolve_query("rel_chi2_independence")(spark, str(d)).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()
    assert got[0]["chi2"] > 0 and 0 < got[0]["cramers_v"] <= 1


def test_stream_utf8_drain_equals_batch(spark, tmp_path):
    """stream_utf8_drain's merged 11-key class-count state yields
    EXACTLY the batch corpus rollup, and both match the synthesis
    formula summed independently in Python."""
    from posts_vectorizer_spark.operators.multimodal import (
        synth_utf8_payload, utf8_scan,
    )
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = [(i, "t", "en", "s", 1) for i in range(60)]
    d = tmp_path / "u8d"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = resolve_query("stream_utf8_drain")(spark, str(d)).collect()
    want = resolve_query("multimodal_utf8_corpus")(
        spark, str(d)
    ).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()

    ref = {"n_docs": 60, "n_bytes": 0, "cp_ascii": 0, "cp_2b": 0,
           "cp_3b": 0, "cp_4b": 0, "err_overlong": 0,
           "err_surrogate": 0, "err_range": 0, "err_continuation": 0,
           "err_truncated": 0}
    key = {"cp1": "cp_ascii", "cp2": "cp_2b", "cp3": "cp_3b",
           "cp4": "cp_4b", "overlong": "err_overlong",
           "surrogate": "err_surrogate", "range": "err_range",
           "continuation": "err_continuation",
           "truncated": "err_truncated"}
    for i in range(60):
        raw = synth_utf8_payload(i)
        ref["n_bytes"] += len(raw)
        for k, v in utf8_scan(raw).items():
            if k in key:
                ref[key[k]] += v
    assert got[0].asDict() == ref


def test_stream_kruskal_drain_equals_batch(spark, tmp_path):
    """stream_kruskal_drain's merged (grp, x) value-grid state yields
    EXACTLY the batch tie-corrected H — grid counts are additive, so
    the forced split cannot move a midrank."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = []
    for k in range(120):
        g = ("A", "N", "R")[k % 3]
        rows.append((k, g, float(1 + (k * 7) % 9 + (k % 3))))
    d = tmp_path / "kwd"
    d.mkdir()
    spark.createDataFrame(
        rows, "l_orderkey long, l_returnflag string, l_quantity double"
    ).write.parquet(str(d / "lineitem.parquet"))

    got = resolve_query("stream_kruskal_drain")(spark, str(d)).collect()
    want = resolve_query("rel_kruskal_wallis")(spark, str(d)).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()
    assert got[0]["n"] == 120 and got[0]["k_groups"] == 3


def test_theil_decomposition_hand_computed(spark, tmp_path):
    """rel_theil_decomposition on a three-group planted table small
    enough to replicate every pinned term: A = {1.00, 3.00},
    B = {2.00, 2.00}, C = {8.00} (cents 100/300, 200 x2, 800; N=5,
    X=1600). Each ln is rounded to the 9dp grid BEFORE its integer
    weight (the Zipf/KN device), so the replica is bit-exact; the
    Theil decomposition identity T = T_b + T_w must hold to the term
    rounding."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "theil"
    d.mkdir()
    spark.createDataFrame(
        [("A", 1.00), ("A", 3.00), ("B", 2.00), ("B", 2.00), ("C", 8.00)],
        "l_returnflag string, l_extendedprice double",
    ).write.parquet(str(d / "lineitem.parquet"))

    [r] = resolve_query("rel_theil_decomposition")(spark, str(d)).collect()
    assert (r["n"], r["k_groups"], r["total_cents"]) == (5, 3, 1600)

    q9 = Decimal("0.000000001")

    def r9ln(x):
        return Decimal(repr(math.log(x))).quantize(
            q9, rounding=ROUND_HALF_UP
        )

    st = (
        100 * r9ln(100 * 5 / 1600)
        + 300 * r9ln(300 * 5 / 1600)
        + 400 * r9ln(200 * 5 / 1600)
        + 800 * r9ln(800 * 5 / 1600)
    )
    sw = (
        100 * r9ln(100 * 2 / 400)
        + 300 * r9ln(300 * 2 / 400)
        + 400 * r9ln(200 * 2 / 400)
        + 800 * r9ln(800 * 1 / 800)
    )
    sb = (
        400 * r9ln(400 * 5 / (1600 * 2))
        + 400 * r9ln(400 * 5 / (1600 * 2))
        + 800 * r9ln(800 * 5 / (1600 * 1))
    )
    assert r["theil_total"] == float(st) / 1600
    assert r["theil_within"] == float(sw) / 1600
    assert r["theil_between"] == float(sb) / 1600
    # the additive decomposition (Theil's distinguishing property)
    assert abs(
        r["theil_total"] - (r["theil_between"] + r["theil_within"])
    ) < 1e-6
    # C's lone big order dominates: between-group inequality positive
    assert r["theil_between"] > 0 and r["theil_total"] > 0
