"""Retrieval wave: BM25 against an independent Python recount, and the
TPC-H Q18/Q21/Q22 shapes against brute-force reference implementations.

The DuckDB differential oracle (tests/test_oracle.py sweep) already
checks each query value-for-value; these tests pin the SEMANTICS with
implementations that share no SQL with either engine — a from-scratch
BM25 scorer over raw parquet, and per-row Python loops for the subquery
shapes — so a wrong-in-both-engines oracle can't hide a defect."""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from posts_vectorizer_spark.plans.queries_retrieval import (
    _BM25_B,
    _BM25_K1,
    _BM25_QUERIES,
    _BM25_TOPK,
    _Q18_MIN_QTY,
    rel_tpch_q18_large_orders,
    rel_tpch_q21_late_suppliers,
    text_bm25_topk,
)
from tests.conftest import SF_SMOKE


def _round6(x: float) -> Decimal:
    """Round-half-up to 6 decimals — Spark's ROUND and DuckDB's round();
    Python's round() is banker's and would diverge on exact .5 ties."""
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _py_bm25(sf_dir: str) -> list[tuple[int, int, float, int]]:
    """From-scratch BM25 over the raw parquet: plain dict/Counter, no
    Spark, no SQL. Mirrors the engine's rounding contract (per-term
    contribution rounded to 6 decimals, exact decimal sum)."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    toks = {
        int(r.doc_id): [t for t in re.split(r"\s+", r.text.lower()) if t]
        for r in docs.itertuples()
    }
    n_docs = float(len(toks))
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    vocab = {w for _, ws in _BM25_QUERIES for w in ws}
    tf = {
        d: Counter(t for t in ts if t in vocab) for d, ts in toks.items()
    }
    df = Counter(w for c in tf.values() for w in c)
    out = []
    for qid, words in _BM25_QUERIES:
        scores = {}
        for d, c in tf.items():
            total = Decimal(0)
            hit = False
            for w in words:
                if c[w] == 0:
                    continue
                hit = True
                idf = math.log(
                    (n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1.0
                )
                dl = float(len(toks[d]))
                denom = c[w] + _BM25_K1 * (
                    1.0 - _BM25_B + _BM25_B * dl / avgdl
                )
                total += _round6(idf * c[w] * (_BM25_K1 + 1.0) / denom)
            if hit:
                scores[d] = float(total)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out.extend(
            (qid, d, s, rk + 1)
            for rk, (d, s) in enumerate(ranked[:_BM25_TOPK])
        )
    return out


def test_bm25_matches_python_recount(spark):
    got = {
        (r.query_id, r.doc_id, r.rk): r.score
        for r in text_bm25_topk(spark, SF_SMOKE).collect()
    }
    want = {(q, d, rk): s for q, d, s, rk in _py_bm25(SF_SMOKE)}
    assert set(got) == set(want)
    for k, s in want.items():
        assert abs(got[k] - s) < 1e-9, (k, got[k], s)


def test_bm25_scores_ordered_and_sized(spark):
    rows = text_bm25_topk(spark, SF_SMOKE).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {qid for qid, _ in _BM25_QUERIES}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _BM25_TOPK
        # scores non-increasing down the ranking; ties broken by doc_id
        for a, b in zip(rs, rs[1:]):
            assert (a.score, -a.doc_id) >= (b.score, -b.doc_id)


def test_q18_matches_python_loop(spark):
    li = pq.read_table(f"{SF_SMOKE}/lineitem.parquet").to_pandas()
    qty = Counter()
    for r in li.itertuples():
        qty[int(r.l_orderkey)] += int(round(r.l_quantity))
    want = {k for k, v in qty.items() if v > _Q18_MIN_QTY}
    got = rel_tpch_q18_large_orders(spark, SF_SMOKE).collect()
    assert {r.o_orderkey for r in got} == want
    for r in got:
        assert r.total_qty == qty[r.o_orderkey]


def test_q21_matches_python_loop(spark):
    li = pq.read_table(f"{SF_SMOKE}/lineitem.parquet").to_pandas()
    orders = pq.read_table(f"{SF_SMOKE}/orders.parquet").to_pandas()
    odate = dict(zip(orders.o_orderkey.astype(int), orders.o_orderdate))
    late: set[tuple[int, int]] = set()
    supps: dict[int, set[int]] = {}
    for r in li.itertuples():
        ok, sk = int(r.l_orderkey), int(r.l_suppkey)
        supps.setdefault(ok, set()).add(sk)
        import pandas as pd

        if r.l_shipdate > odate[ok] + pd.Timedelta(days=30):
            late.add((ok, sk))
    late_by_order: dict[int, set[int]] = {}
    for ok, sk in late:
        late_by_order.setdefault(ok, set()).add(sk)
    numwait = Counter()
    for ok, sk in late:
        if len(supps[ok]) > 1 and late_by_order[ok] == {sk}:
            numwait[sk] += 1
    supplier = pq.read_table(f"{SF_SMOKE}/supplier.parquet").to_pandas()
    name = dict(zip(supplier.s_suppkey.astype(int), supplier.s_name))
    want = Counter()
    for sk, n in numwait.items():
        want[name[sk]] += n
    got = {
        r.s_name: r.numwait
        for r in rel_tpch_q21_late_suppliers(spark, SF_SMOKE).collect()
    }
    assert got == dict(want)
