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
    """Top-k view over the single from-scratch scorer (_py_bm25_graded,
    below) — one hand-maintained copy of the BM25 rounding contract."""
    out = []
    for qid, scored in _py_bm25_graded(sf_dir).items():
        ranked = sorted(
            ((d, s) for d, s, _ in scored), key=lambda kv: (-kv[1], kv[0])
        )
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


def test_hybrid_rrf_matches_python_recount(spark):
    """Full from-scratch recount of the hybrid pipeline: BM25 ranking →
    top-10 centroid (rounded-decimal means) → cosine ranking → RRF — in
    numpy/Decimal, sharing no code with either engine."""
    import numpy as np

    from posts_vectorizer_spark.plans.queries_retrieval import (
        _PRF_DEPTH,
        _RRF_DEPTH,
        _RRF_K,
        sim_hybrid_rrf_fusion,
    )

    emb_t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb_t.itertuples()
    }
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    toks = {
        int(r.doc_id): [t for t in re.split(r"\s+", r.text.lower()) if t]
        for r in docs.itertuples()
    }
    n_docs = float(len(toks))
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    vocab = {w for _, ws in _BM25_QUERIES for w in ws}
    tf = {d: Counter(t for t in ts if t in vocab) for d, ts in toks.items()}
    df = Counter(w for c in tf.values() for w in c)

    want = {}
    for qid, words in _BM25_QUERIES:
        # lexical ranking to depth 20 (recompute; _py_bm25 cuts at 10)
        scores = {}
        for d, c in tf.items():
            total = Decimal(0)
            hit = False
            for w in words:
                if c[w] == 0:
                    continue
                hit = True
                idf = math.log((n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
                dl = float(len(toks[d]))
                denom = c[w] + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
                total += _round6(idf * c[w] * (_BM25_K1 + 1.0) / denom)
            if hit:
                scores[d] = float(total)
        lex = [
            d for d, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        ][:_RRF_DEPTH]
        # PRF centroid of the top-10 docs that have embeddings; if none
        # has one, the product degrades to lexical-only fusion (no
        # centroid row) — mirror that with an empty semantic ranking.
        fb = [d for d in lex[:_PRF_DEPTH] if d in vecs]
        sem: list[int] = []
        if fb:
            comps = np.stack([vecs[d] for d in fb])
            # mirror the engines exactly: half-up decimal per component
            # (NOT Python's banker's round), exact decimal sum, cast to
            # double BEFORE the division (engines do sum::DOUBLE / cnt)
            cent = np.array(
                [
                    float(
                        sum(
                            Decimal(repr(float(x))).quantize(
                                Decimal("0.000000001"), ROUND_HALF_UP
                            )
                            for x in comps[:, j]
                        )
                    )
                    / len(fb)
                    for j in range(comps.shape[1])
                ]
            )
            # semantic ranking by rounded cosine
            cn = math.sqrt(float((cent * cent).sum()))
            sems = {}
            for vid, v in vecs.items():
                vn = math.sqrt(float((v * v).sum()))
                if cn > 0 and vn > 0:
                    sems[vid] = float(
                        Decimal(
                            repr(float((cent * v).sum()) / (cn * vn))
                        ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                    )
            sem = [
                d
                for d, _ in sorted(
                    sems.items(), key=lambda kv: (-kv[1], kv[0])
                )
            ][:_RRF_DEPTH]
        # RRF fusion
        fused = {}
        for rk, d in enumerate(lex, 1):
            fused[d] = fused.get(d, Decimal(0)) + _round6(1.0 / (_RRF_K + rk))
        for rk, d in enumerate(sem, 1):
            fused[d] = fused.get(d, Decimal(0)) + _round6(1.0 / (_RRF_K + rk))
        top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        for rk, (d, s) in enumerate(top, 1):
            want[(qid, d, rk)] = float(s)

    got = {
        (r.query_id, r.doc_id, r.rk): r.rrf
        for r in sim_hybrid_rrf_fusion(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for key, s in want.items():
        assert abs(got[key] - s) < 1e-9, (key, got[key], s)


def test_halflife_decay_matches_python_recount(spark):
    import pandas as pd

    from posts_vectorizer_spark.plans.queries_timeseries import (
        _DECAY_LOOKBACK_DAYS,
        events_halflife_decay,
    )

    ev = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    buckets = Counter(
        (int(r.user_id), pd.Timestamp(r.ts).normalize())
        for r in ev.itertuples()
    )
    want = {}
    for (uid, day), x in buckets.items():
        total = Decimal(0)
        for (uid2, day2), x2 in buckets.items():
            if uid2 != uid:
                continue
            delta = (day - day2).days
            if 0 <= delta <= _DECAY_LOOKBACK_DAYS:
                # x2 * 0.5^delta is an exact dyadic (delta <= 14), so repr
                # is its exact decimal expansion; quantize half-up like the
                # engines — Python's round() is banker's and flips the
                # boundary digits of 0.5^10 etc.
                total += Decimal(repr(x2 * 0.5**delta)).quantize(
                    Decimal("0.000000001"), ROUND_HALF_UP
                )
        want[(uid, day.to_pydatetime())] = (x, float(total))
    rows = events_halflife_decay(spark, SF_SMOKE).collect()
    assert len(rows) == len(want)
    for r in rows:
        x, decayed = want[(r.user_id, r.day)]
        assert r.x == x
        assert abs(r.decayed - decayed) < 1e-9


def test_weighted_sample_matches_python_recount(spark):
    """Independent A-ES draw: portable char hash reimplemented in plain
    Python, ln(u)/w keys, top-10 per source."""
    from posts_vectorizer_spark.functions.text import HASH_BASE, HASH_MOD
    from posts_vectorizer_spark.plans.queries_curation import (
        _WS_PER_SOURCE,
        curation_weighted_sample,
    )

    def char_hash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * HASH_BASE + ord(ch)) % HASH_MOD
        return h

    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    keyed = {}
    for r in docs.itertuples():
        if int(r.n_chars) <= 0:  # A-ES needs w > 0 (query filters these)
            continue
        u = (char_hash(f"ws:{int(r.doc_id)}") + 1.0) / (HASH_MOD + 1)
        # half-up like the engines' round(), not Python's banker's round()
        k = float(
            Decimal(
                repr(math.log(u) / math.log(1.0 + int(r.n_chars)))
            ).quantize(Decimal("0.000000001"), ROUND_HALF_UP)
        )
        keyed.setdefault(r.source, []).append((k, int(r.doc_id)))
    want = set()
    for src, items in keyed.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rk, (k, d) in enumerate(items[:_WS_PER_SOURCE], 1):
            want.add((src, d, rk))
    got = {
        (r.source, r.doc_id, r.rk)
        for r in curation_weighted_sample(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_mmr_matches_python_greedy(spark):
    """From-scratch greedy MMR: recompute the BM25→centroid→candidate
    pipeline in numpy/Decimal, then run the textbook sequential greedy
    loop (not unrolled SQL) and compare the 3-pick chain."""
    import numpy as np

    from posts_vectorizer_spark.plans.queries_retrieval import (
        _MMR_CAND,
        _MMR_LAMBDA,
        _PRF_DEPTH,
        sim_mmr_rerank,
    )

    def _round_hu(x: float, places: str) -> float:
        return float(Decimal(repr(x)).quantize(Decimal(places), ROUND_HALF_UP))

    emb_t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb_t.itertuples()
    }
    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    toks = {
        int(r.doc_id): [t for t in re.split(r"\s+", r.text.lower()) if t]
        for r in docs.itertuples()
    }
    n_docs = float(len(toks))
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    vocab = {w for _, ws in _BM25_QUERIES for w in ws}
    tf = {d: Counter(t for t in ts if t in vocab) for d, ts in toks.items()}
    df = Counter(w for c in tf.values() for w in c)

    def cos(a: np.ndarray, b: np.ndarray) -> float | None:
        na = math.sqrt(float((a * a).sum()))
        nb = math.sqrt(float((b * b).sum()))
        if na <= 0 or nb <= 0:
            return None
        return _round_hu(float((a * b).sum()) / (na * nb), "0.000001")

    want = {}
    for qid, words in _BM25_QUERIES:
        scores = {}
        for d, c in tf.items():
            total = Decimal(0)
            hit = False
            for w in words:
                if c[w] == 0:
                    continue
                hit = True
                idf = math.log((n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
                dl = float(len(toks[d]))
                denom = c[w] + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
                total += _round6(idf * c[w] * (_BM25_K1 + 1.0) / denom)
            if hit:
                scores[d] = float(total)
        fb = [
            d
            for d, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[
                :_PRF_DEPTH
            ]
            if d in vecs
        ]
        comps = np.stack([vecs[d] for d in fb])
        cent = np.array(
            [
                float(
                    sum(
                        Decimal(repr(float(x))).quantize(
                            Decimal("0.000000001"), ROUND_HALF_UP
                        )
                        for x in comps[:, j]
                    )
                )
                / len(fb)
                for j in range(comps.shape[1])
            ]
        )
        rels = {
            vid: c for vid, v in vecs.items() if (c := cos(cent, v)) is not None
        }
        cand = [
            d for d, _ in sorted(rels.items(), key=lambda kv: (-kv[1], kv[0]))
        ][:_MMR_CAND]
        # textbook sequential greedy
        picked: list[tuple[int, float]] = []
        while len(picked) < 3 and len(picked) < len(cand):
            best = None
            for d in cand:
                if any(d == p for p, _ in picked):
                    continue
                if not picked:
                    mmr = rels[d]
                else:
                    maxsim = max(cos(vecs[d], vecs[p]) for p, _ in picked)
                    mmr = _round_hu(
                        _MMR_LAMBDA * rels[d] - (1.0 - _MMR_LAMBDA) * maxsim,
                        "0.000001",
                    )
                if best is None or (mmr, -d) > (best[1], -best[0]):
                    best = (d, mmr)
            picked.append(best)
        for pick, (d, mmr) in enumerate(picked, 1):
            want[(qid, pick)] = (d, mmr)

    got = {
        (r.query_id, r.pick): (r.doc_id, r.mmr)
        for r in sim_mmr_rerank(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for key, (d, mmr) in want.items():
        assert got[key][0] == d, (key, got[key], (d, mmr))
        assert abs(got[key][1] - mmr) < 1e-9


def _py_bm25_graded(sf_dir: str) -> dict[int, list[tuple[int, float, int]]]:
    """Full scored set per query (not just top-k) with the NDCG grade:
    (doc_id, score, grade) where grade = #distinct query terms with
    tf >= 2. Same from-scratch tokenize/round contract as _py_bm25."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    toks = {
        int(r.doc_id): [t for t in re.split(r"\s+", r.text.lower()) if t]
        for r in docs.itertuples()
    }
    n_docs = float(len(toks))
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    vocab = {w for _, ws in _BM25_QUERIES for w in ws}
    tf = {d: Counter(t for t in ts if t in vocab) for d, ts in toks.items()}
    df = Counter(w for c in tf.values() for w in c)
    out: dict[int, list[tuple[int, float, int]]] = {}
    for qid, words in _BM25_QUERIES:
        scored = []
        for d, c in tf.items():
            total, grade, hit = Decimal(0), 0, False
            for w in words:
                if c[w] == 0:
                    continue
                hit = True
                grade += 1 if c[w] >= 2 else 0
                idf = math.log((n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
                dl = float(len(toks[d]))
                denom = c[w] + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
                total += _round6(idf * c[w] * (_BM25_K1 + 1.0) / denom)
            if hit:
                scored.append((d, float(total), grade))
        out[qid] = scored
    return out


def _round9(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.000000001"), ROUND_HALF_UP)


def test_ndcg_matches_python_recount(spark):
    from posts_vectorizer_spark.plans.queries_retrieval import (
        _NDCG_K,
        text_bm25_ndcg_eval,
    )

    want = {}
    for qid, scored in _py_bm25_graded(SF_SMOKE).items():
        ranked = sorted(scored, key=lambda t: (-t[1], t[0]))[:_NDCG_K]
        ideal = sorted(scored, key=lambda t: (-t[2], t[0]))[:_NDCG_K]
        dcg = sum(
            (_round9((2.0 ** g - 1) / math.log2(i + 2)) for i, (_, _, g) in
             enumerate(ranked)), Decimal(0)
        )
        idcg = sum(
            (_round9((2.0 ** g - 1) / math.log2(i + 2)) for i, (_, _, g) in
             enumerate(ideal)), Decimal(0)
        )
        if float(idcg) > 0:
            want[qid] = float(dcg) / float(idcg)
    got = {
        r.query_id: r.ndcg_at_10
        for r in text_bm25_ndcg_eval(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for qid in want:
        assert abs(got[qid] - want[qid]) < 1e-9, (qid, got[qid], want[qid])
    # the metric must be non-degenerate on the fixture: bounded by 1 and
    # NOT identically 1 across queries (saturating tf vs tf>=2 grade) —
    # a grade definition that collapses into the score ordering would
    # make every NDCG exactly 1.0 and void the evaluator
    assert all(0 < v <= 1 for v in got.values())
    assert any(v < 1 for v in got.values())


def test_sparse_pairs_match_python_recount(spark):
    from posts_vectorizer_spark.plans.queries_retrieval import (
        _SPARSE_COS_MIN,
        _SPARSE_MAX_DF_FRAC,
        _SPARSE_MIN_DF,
        sim_sparse_tfidf_pairs,
    )

    docs = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pandas()
    toks = {
        int(r.doc_id): [t for t in re.split(r"\s+", r.text.lower()) if t]
        for r in docs.itertuples()
    }
    n = float(len(toks))
    tf = {d: Counter(ts) for d, ts in toks.items()}
    df = Counter(w for c in tf.values() for w in set(c))
    keep = {
        w for w, k in df.items()
        if _SPARSE_MIN_DF <= k <= _SPARSE_MAX_DF_FRAC * n
    }
    wt = {
        d: {
            w: _round6(c[w] * math.log(n / df[w]))
            for w in c if w in keep
        }
        for d, c in tf.items()
    }
    nrm = {
        d: math.sqrt(float(sum(v * v for v in ws.values())))
        for d, ws in wt.items() if ws
    }
    want = {}
    ids = sorted(nrm)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = set(wt[a]) & set(wt[b])
            if not shared:
                continue
            dot = float(sum(wt[a][w] * wt[b][w] for w in shared))
            cos = float(_round6(dot / (nrm[a] * nrm[b])))
            if cos >= _SPARSE_COS_MIN:
                want[(a, b)] = cos
    got = {
        (r.doc_a, r.doc_b): r.cos
        for r in sim_sparse_tfidf_pairs(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert want, "fixture must produce at least one qualifying pair"


def test_dim_prefix_recall_planted(spark, tmp_path):
    """sim_dim_prefix_recall (staged r7): embeddings whose dims beyond the
    16-dim prefix are ALL ZERO make the prefix ranking provably identical
    to the full ranking — recall@k must be exactly 1.0 for every query.
    Then corrupting the tail (identical prefixes, discriminative tails)
    collapses prefix scores into id-order ties, so recall must drop below
    1 for at least some queries — the metric genuinely measures prefix
    informativeness, not plumbing."""
    import random

    from posts_vectorizer_spark.plans.registry import resolve_query

    q = resolve_query("sim_dim_prefix_recall")
    rng = random.Random(7)

    informative = [
        (i, [rng.uniform(-1, 1) for _ in range(16)] + [0.0] * 4, i % 3)
        for i in range(30)
    ]
    d1 = tmp_path / "informative"
    d1.mkdir()
    spark.createDataFrame(
        informative, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d1 / "embeddings.parquet"))
    rows = q(spark, str(d1)).collect()
    assert len(rows) == 30
    assert all(r["recall_at_k"] == 1.0 for r in rows)

    flat = [
        (i, [1.0] * 16 + [rng.uniform(-1, 1) for _ in range(4)], i % 3)
        for i in range(30)
    ]
    d2 = tmp_path / "flat"
    d2.mkdir()
    spark.createDataFrame(
        flat, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d2 / "embeddings.parquet"))
    rows2 = q(spark, str(d2)).collect()
    assert any(r["recall_at_k"] < 1.0 for r in rows2)


def test_hard_negatives_crafted(spark, tmp_path):
    """sim_hard_negatives (staged r7) on a planted geometry: the
    same-label positive and cross-label hard negative are chosen by
    cosine argmax within/outside the label, and a negative MORE similar
    than the positive yields a negative margin — the triplet contrastive
    training wants surfaced."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),   # query
        (2, [0.9, 0.4359, 0.0, 0.0], 0), # same-label, cos ~0.9
        (3, [0.0, 1.0, 0.0, 0.0], 0),    # same-label, orthogonal
        (4, [0.999, 0.0447, 0.0, 0.0], 1),  # cross-label, cos ~0.999
        (5, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r["query_id"]: r
        for r in resolve_query("sim_hard_negatives")(
            spark, str(tmp_path)
        ).collect()
    }
    q = out[1]
    assert q["positive_id"] == 2
    assert q["negative_id"] == 4
    assert q["neg_cosine"] > q["pos_cosine"]
    assert q["margin"] < 0, "harder-than-positive negative -> negative margin"
    assert len(out) == 5  # every vector gets a triplet (both labels populated)


def test_maxsim_ranks_token_matches_above_flat_cosine(spark, tmp_path):
    """sim_maxsim_late_interaction (staged r9): planted token structure
    where maxsim and flat cosine DISAGREE. Query q has two active
    token-vectors (e0 in token slot 0, e1 in slot 1). Doc A matches
    token 0 perfectly and nothing else -> maxsim 1/8 = 0.125. Doc B
    spreads (e0+e1)/sqrt(2) across all 8 token slots -> both query
    tokens max at 1/sqrt(2) -> maxsim 2*0.707107/8 = 0.176777 > A. Flat
    64-dim cosine ranks A (0.707) over B (0.354), so a pass proves the
    late-interaction semantics, not a cosine rerun. Zero-norm query
    tokens contribute exactly 0."""
    import math

    from posts_vectorizer_spark.plans.registry import resolve_query

    t = 1.0 / math.sqrt(2.0)
    e0 = [1.0] + [0.0] * 7
    e1 = [0.0, 1.0] + [0.0] * 6
    zero = [0.0] * 8
    q_vec = e0 + e1 + zero * 6
    a_vec = e0 + zero * 7
    b_vec = [t, t, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] * 8
    d = tmp_path / "maxsim"
    d.mkdir()
    spark.createDataFrame(
        [(0, q_vec, 0), (1, a_vec, 1), (2, b_vec, 2)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(str(d / "embeddings.parquet"))
    rows = resolve_query("sim_maxsim_late_interaction")(
        spark, str(d)
    ).collect()
    # only vec_id 0 satisfies the probe predicate (% 50 == 0)
    assert {r["query_id"] for r in rows} == {0}
    got = {r["neighbor_id"]: (r["maxsim"], r["rk"]) for r in rows}
    assert got[2] == (0.176777, 1), "token-spread doc wins under maxsim"
    assert got[1] == (0.125, 2)


def test_margin_bitext_demotes_hub_vectors(spark, tmp_path):
    """sim_margin_bitext_mining (staged r9): planted hub geometry where
    raw cosine and margin DISAGREE for source a1. The hub sits at the
    center of side A (high cosine to every A vector, including a1); b1
    is slightly farther from a1 but unrelated to the rest of A. Raw
    cosine picks the hub; the margin subtracts each candidate's
    backward neighborhood average, so the hub's inflated normalizer
    demotes it and b1 wins — the exact failure mode margin scoring
    exists to fix. The winning margin must equal the formula replayed
    in Python from the rounded cosines."""
    import math

    from posts_vectorizer_spark.plans.registry import resolve_query

    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)] + [0.0] * 62

    rows = [
        (1, vec(0), 0), (2, vec(40), 0), (3, vec(44), 0),   # side A
        (10, vec(28), 5), (11, vec(-30), 5),                # hub, b1
    ]
    d = tmp_path / "bitext"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    out = {
        r["src"]: r
        for r in resolve_query("sim_margin_bitext_mining")(
            spark, str(d)
        ).collect()
    }

    import numpy as np

    V = {vid: np.array(v, dtype=np.float32).astype(np.float64)
         for vid, v, _ in rows}

    def cos6(x, y):
        a, b = V[x], V[y]
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    # raw cosine prefers the hub for a1...
    assert cos6(1, 10) > cos6(1, 11)
    # ...but the engine's margin pick is b1
    assert out[1]["dst"] == 11

    # replay the integer-exact margin: m = 2K*c - sum_fwd_K - sum_bwd_K
    # in micro-units over the fixed divisor 2K*1e6 (K = 4)
    def mu(x, y):
        return round(cos6(x, y) * 1_000_000)

    sa_mu = mu(1, 10) + mu(1, 11)                  # a1's fwd top-K sum
    sb_mu = mu(11, 1) + mu(11, 2) + mu(11, 3)      # b1's bwd top-K sum
    m_int = 2 * 4 * mu(1, 11) - sa_mu - sb_mu
    assert out[1]["margin"] == m_int / (2 * 4 * 1_000_000)


def test_adamic_adar_matches_edge_replay(spark):
    """sim_adamic_adar_links (staged r9): replay the computation in
    Python from the driver-green mutual-kNN edge list
    (sim_knn_graph_mutual, same kernel/k): degrees, common-neighbor
    paths, existing-edge exclusion, and the rounded-term score must all
    match exactly — pinning the graph algebra independently of the
    kernel it rides on."""
    import math
    from collections import defaultdict

    from tests.conftest import SF_SMOKE

    from posts_vectorizer_spark.plans.registry import resolve_query

    edges = {
        (r["src"], r["dst"])
        for r in resolve_query("sim_knn_graph_mutual")(
            spark, SF_SMOKE
        ).collect()
    }
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want = defaultdict(lambda: [0, 0.0])
    for z, nbrs in adj.items():
        term = round(1.0 / math.log10(len(nbrs)), 8) if len(nbrs) > 1 else None
        for u in nbrs:
            for v in nbrs:
                if u < v and (u, v) not in edges:
                    want[(u, v)][0] += 1
                    want[(u, v)][1] += term
    got = {
        (r["src"], r["dst"]): (r["n_common"], r["aa_score"])
        for r in resolve_query("sim_adamic_adar_links")(
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(want) and got
    for k, (n, s) in want.items():
        assert got[k][0] == n, k
        assert abs(got[k][1] - s) < 1e-9, k


def test_triangles_planted_bowtie(spark):
    """_triangles (sim_triangle_count's shared algebra, staged r13) on
    a hand-built bowtie graph — two triangles {1,2,3} and {1,4,5}
    glued at node 1: node 1 has deg 4 and sits in BOTH triangles
    (lcc = 2*2/(4*3) = round(1/3, 9)), every wing node has deg 2, one
    triangle, lcc exactly 1.0 — pinning enumeration (each triangle
    counted once), the 3-way unpivot, and the 9dp lcc grid
    independently of any kNN producer."""
    from posts_vectorizer_spark.plans.queries_similarity import _triangles

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (1, 5), (4, 5)],
        "src long, dst long",
    )
    got = {r["node"]: r for r in _triangles(edges).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert (got[1]["deg"], got[1]["triangles"]) == (4, 2)
    assert got[1]["lcc"] == round(2.0 * 2 / (4 * 3), 9)
    for n in (2, 3, 4, 5):
        assert (got[n]["deg"], got[n]["triangles"]) == (2, 1), n
        assert got[n]["lcc"] == 1.0, n


def test_triangles_open_wedge_scores_zero(spark):
    """A pure path 1-2-3 (one open wedge, no closure): the centre
    carries deg 2 / triangles 0 / lcc 0.0, the endpoints drop on the
    deg >= 2 filter — the no-false-triangle guard."""
    from posts_vectorizer_spark.plans.queries_similarity import _triangles

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = _triangles(edges).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["node"], r["deg"], r["triangles"], r["lcc"]) == (2, 2, 0, 0.0)


def test_triangle_count_ann_shares_algebra(spark):
    """sim_triangle_count_ann: the production twin runs the IDENTICAL
    _triangles algebra over the mutualized lsh_ann edge list — every
    (deg, triangles, lcc) row matches an exact integer replica over
    exactly that edge set (the label_propagation_ann convention)."""
    from collections import defaultdict

    from posts_vectorizer_spark.operators import similarity
    from posts_vectorizer_spark.plans.queries_similarity import (
        DIMS, KNN_GRAPH_K, _mutual_edges,
    )
    from posts_vectorizer_spark.plans.registry import resolve_query
    from posts_vectorizer_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    edges = {
        (r["src"], r["dst"])
        for r in _mutual_edges(
            similarity.lsh_ann(emb, DIMS, KNN_GRAPH_K)
        ).collect()
    }
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = defaultdict(int)
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if b < c:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    want = {
        n: (
            len(nb), tri[n],
            round(2.0 * tri[n] / (len(nb) * (len(nb) - 1)), 9),
        )
        for n, nb in adj.items()
        if len(nb) >= 2
    }
    got = {
        r["node"]: (r["deg"], r["triangles"], r["lcc"])
        for r in resolve_query("sim_triangle_count_ann")(
            spark, SF_SMOKE
        ).collect()
    }
    assert got == want and got


def test_kcore_peeling_matches_edge_replay(spark):
    """sim_kcore_peeling (staged r9): replay the 3-round k=3 peel in
    Python from the driver-green mutual-kNN edge list — initial
    degrees, per-round survival, and core membership must match
    exactly (pure integer graph algebra over the same kernel edges)."""
    from tests.conftest import SF_SMOKE

    from posts_vectorizer_spark.plans.registry import resolve_query

    edges = {
        (r["src"], r["dst"])
        for r in resolve_query("sim_knn_graph_mutual")(
            spark, SF_SMOKE
        ).collect()
    }
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    deg0 = {n: len(ns) for n, ns in adj.items()}
    alive = set(adj)
    rounds = {n: 0 for n in adj}
    cur_deg = dict(deg0)
    for rnd in (1, 2, 3):
        alive = {n for n in alive if cur_deg.get(n, 0) >= 3}
        for n in alive:
            rounds[n] = rnd
        cur_deg = {
            n: sum(1 for v in adj[n] if v in alive) for n in alive
        }
    got = {
        r["node"]: (r["deg0"], r["rounds_survived"], r["in_core"])
        for r in resolve_query("sim_kcore_peeling")(
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(adj) and got
    for n in adj:
        assert got[n] == (deg0[n], rounds[n], rounds[n] == 3), n


def test_ann_graph_variants_replay_and_recall(spark):
    """sim_adamic_adar_links_ann / sim_kcore_peeling_ann (r9): the
    corpus-scale forms swap the exact broadcast-tile kNN for lsh_ann in
    the edge build while sharing the graph algebra verbatim. Pin (a) the
    algebra: AA scores and the 3-round peel replayed in Python from the
    lsh_ann mutual edge list must match the registered queries exactly;
    (b) the producers genuinely differ (the ANN edge set is not the
    exact set re-labeled); (c) edge recall vs the exact witness is
    nonzero and reported. The fixture embeddings are near-orthogonal
    random noise — the worst case for LSH (no cluster structure to
    bucket), so recall here is a floor, not the real-corpus figure; the
    cross-engine hash equality of the whole ANN pipeline is the oracle
    row, not this bound."""
    import math
    from collections import defaultdict

    from tests.conftest import SF_SMOKE

    from posts_vectorizer_spark.operators import similarity
    from posts_vectorizer_spark.plans.queries_similarity import (
        DIMS,
        KNN_GRAPH_K,
        _mutual_edges,
    )
    from posts_vectorizer_spark.plans.registry import resolve_query
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    edges = {
        (r["src"], r["dst"])
        for r in _mutual_edges(
            similarity.lsh_ann(emb, DIMS, KNN_GRAPH_K)
        ).collect()
    }
    exact = {
        (r["src"], r["dst"])
        for r in resolve_query("sim_knn_graph_mutual")(
            spark, SF_SMOKE
        ).collect()
    }
    assert edges and edges != exact
    recall = len(edges & exact) / len(exact)
    assert recall > 0.03, recall  # random-noise floor; see docstring

    # the registered ANN mutual-graph twin emits exactly this edge set
    # (plus per-edge payload), tying all four ANN graph queries to one
    # producer contract
    ann_graph = {
        (r["src"], r["dst"])
        for r in resolve_query("sim_knn_graph_mutual_ann")(
            spark, SF_SMOKE
        ).collect()
    }
    assert ann_graph == edges

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    # (a1) Adamic-Adar replay from the ANN edge list
    want = defaultdict(lambda: [0, 0.0])
    for z, nbrs in adj.items():
        term = round(1.0 / math.log10(len(nbrs)), 8) if len(nbrs) > 1 else None
        for u in nbrs:
            for v in nbrs:
                if u < v and (u, v) not in edges:
                    want[(u, v)][0] += 1
                    want[(u, v)][1] += term
    got = {
        (r["src"], r["dst"]): (r["n_common"], r["aa_score"])
        for r in resolve_query("sim_adamic_adar_links_ann")(
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(want) and got
    for k, (n, s) in want.items():
        assert got[k][0] == n, k
        assert abs(got[k][1] - s) < 1e-9, k

    # (a2) 3-round k=3 peel replay from the ANN edge list
    deg0 = {n: len(ns) for n, ns in adj.items()}
    alive = set(adj)
    rounds = {n: 0 for n in adj}
    cur_deg = dict(deg0)
    for rnd in (1, 2, 3):
        alive = {n for n in alive if cur_deg.get(n, 0) >= 3}
        for n in alive:
            rounds[n] = rnd
        cur_deg = {n: sum(1 for v in adj[n] if v in alive) for n in alive}
    got_k = {
        r["node"]: (r["deg0"], r["rounds_survived"], r["in_core"])
        for r in resolve_query("sim_kcore_peeling_ann")(
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got_k) == set(adj) and got_k
    for n in adj:
        assert got_k[n] == (deg0[n], rounds[n], rounds[n] == 3), n


def test_clustering_coefficient_matches_edge_replay(spark):
    """sim_clustering_coefficient (staged r10): replay degrees, per-node
    triangle counts, and 2T/(d(d-1)) from the same lsh_ann mutual edge
    list the query builds — pinning the wedge-join + semi-join closure
    algebra independently of the producer (which sim_lsh_ann's oracle
    row already pins)."""
    from tests.conftest import SF_SMOKE

    from posts_vectorizer_spark.operators import similarity
    from posts_vectorizer_spark.plans.queries_similarity import (
        DIMS,
        KNN_GRAPH_K,
        _mutual_edges,
    )
    from posts_vectorizer_spark.plans.registry import resolve_query
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    edges = {
        (r["src"], r["dst"])
        for r in _mutual_edges(
            similarity.lsh_ann(emb, DIMS, KNN_GRAPH_K)
        ).collect()
    }
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    got = {
        r["node"]: (r["deg"], r["triangles"], r["clustering_coeff"])
        for r in resolve_query("sim_clustering_coefficient")(
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(adj) and got
    for n, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and ((a, b) in edges or (b, a) in edges)
        )
        want_c = 2 * tri / (deg * (deg - 1)) if deg >= 2 else None
        assert got[n][0] == deg and got[n][1] == tri, n
        if want_c is None:
            assert got[n][2] is None, n
        else:
            assert got[n][2] == want_c, n


def test_rq_quantize_planted_refinement(spark, tmp_path):
    """sim_rq_quantize (staged r10): two tight planted clusters — stage 1
    must separate them (every vector's cell groups by its cluster) and
    the stage-2 residual codebook must drive distortion far below the
    raw cluster radius; the profile is deterministic across runs."""
    import numpy as np

    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = np.random.default_rng(3)
    rows = []
    for i in range(24):
        base = 1.0 if i % 2 == 0 else -1.0
        vec = (base + rng.normal(0, 0.01, 64)).astype("float32")
        rows.append((i, [float(x) for x in vec], i % 2))
    d = tmp_path / "emb"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    out1 = resolve_query("sim_rq_quantize")(spark, str(d)).collect()
    out2 = resolve_query("sim_rq_quantize")(spark, str(d)).collect()
    key = lambda r: (r["code0"], r["code1"])
    assert sorted(map(key, out1)) == sorted(map(key, out2))
    assert {tuple(sorted(r)) for r in
            [(x["code0"], x["code1"], x["n_vectors"], x["avg_sq_error"])
             for x in out1]} == \
           {tuple(sorted(r)) for r in
            [(x["code0"], x["code1"], x["n_vectors"], x["avg_sq_error"])
             for x in out2]}
    assert sum(r["n_vectors"] for r in out1) == 24
    # residual distortion far below the between-cluster scale (~4.0*64)
    worst = max(r["avg_sq_error"] for r in out1)
    assert worst < 1.0, worst


def test_zscore_outliers_planted_and_zero_variance(spark, tmp_path):
    """sim_zscore_outliers (staged r10): a planted 10x-scaled vector must
    rank first by a wide margin; a CONSTANT dimension (std 0) must
    contribute exactly 0 rather than raise under ANSI division; scores
    replay from numpy within fp tolerance."""
    import numpy as np

    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = np.random.default_rng(9)
    base = rng.normal(0, 1, (40, 64)).astype("float32")
    base[:, 7] = 1.25  # constant dim -> std exactly 0
    base[3] *= 10.0    # the planted outlier
    d = tmp_path / "emb"
    d.mkdir()
    spark.createDataFrame(
        [(i, [float(x) for x in base[i]], 0) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(str(d / "embeddings.parquet"))
    rows = sorted(
        resolve_query("sim_zscore_outliers")(spark, str(d)).collect(),
        key=lambda r: r["rk"],
    )
    assert rows[0]["vec_id"] == 3
    assert rows[0]["md2"] > 2 * rows[1]["md2"]

    # replay in float64 numpy (same moment definitions, round-9 terms
    # approximated by the raw moments — tolerance covers the grid)
    x = base.astype("float64")
    mean = x.mean(axis=0)
    std = np.sqrt((x * x).mean(axis=0) - mean * mean)
    z2 = np.where(std > 0, ((x - mean) / std) ** 2, 0.0).sum(axis=1)
    got = {r["vec_id"]: r["md2"] for r in rows}
    for vid, v in got.items():
        assert abs(v - z2[vid]) < 1e-5 * max(1.0, z2[vid]), vid


def test_rq_quantize_noncontiguous_cluster_ids(spark, tmp_path):
    """r9 review finding: _update drops empty clusters, so stage-1
    cluster ids can be NON-CONTIGUOUS (duplicate seed vectors empty one
    of the 8 seed clusters). The centroid lookup must key by cluster
    id — a positional lookup fetches the wrong centroid or NULL. Plant
    exactly that shape and diff the full query against its own DuckDB
    oracle."""
    import duckdb
    import numpy as np

    from posts_vectorizer_spark.operators.clustering import (
        _train_codebook,
    )
    from posts_vectorizer_spark.plans.registry import resolve_oracle, resolve_query

    rng = np.random.default_rng(21)
    rows = []
    dup = [0.5] * 64
    # vec_ids 0 and 1 are IDENTICAL -> two identical seeds -> one seed
    # cluster gets no members after the first assignment
    rows.append((0, dup, 0))
    rows.append((1, list(dup), 0))
    for i in range(2, 40):
        rows.append(
            (i, [float(x) for x in rng.normal(0, 1, 64)], i % 3)
        )
    d = tmp_path / "emb"
    d.mkdir()
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.parquet(str(d / "embeddings.parquet"))

    cents = _train_codebook(
        spark.read.parquet(str(d / "embeddings.parquet")).select(
            "vec_id", "embedding"
        ),
        8,
        2,
    )
    ids = [cid for cid, _ in cents]
    assert ids != list(range(len(ids))), (
        "fixture failed to produce non-contiguous cluster ids: " + str(ids)
    )

    got = {
        (r["code0"], r["code1"]): (r["n_vectors"], r["avg_sq_error"])
        for r in resolve_query("sim_rq_quantize")(spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{d}/embeddings.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(resolve_oracle("sim_rq_quantize")).fetchall()
    }
    assert got == want


def test_stream_zscore_drain_equals_batch(spark):
    """stream_zscore_drain (staged r10): the two-micro-batch merged
    moments must yield EXACTLY sim_zscore_outliers' rows — DECIMAL
    moment sums are exact, so the split cannot move a single score."""
    from tests.conftest import SF_SMOKE

    from posts_vectorizer_spark.plans.registry import resolve_query

    batch = {
        r["vec_id"]: (r["md2"], r["rk"])
        for r in resolve_query("sim_zscore_outliers")(
            spark, SF_SMOKE
        ).collect()
    }
    streamed = {
        r["vec_id"]: (r["md2"], r["rk"])
        for r in resolve_query("stream_zscore_drain")(
            spark, SF_SMOKE
        ).collect()
    }
    assert batch and streamed == batch


def test_rocchio_planted_clusters_and_centroid_replica(spark, tmp_path):
    """sim_rocchio_centroid_eval on two tight planted clusters: the
    confusion matrix is perfectly diagonal, and flipping one vector's
    label to the wrong cluster shows up as exactly one off-diagonal
    cell (noisy-label detection — the query's purpose)."""
    import numpy as np

    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for label, center in ((0, 5.0), (1, -5.0)):
        for _ in range(20):
            vec = (center + rng.normal(0, 0.1, 16)).astype(float)
            rows.append((vid, [float(x) for x in vec], label))
            vid += 1
    # one mislabeled vector: lives at +5 but labeled 1
    rows.append((vid, [5.0] * 16, 1))
    d = tmp_path / "roc"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))

    out = {(r["label"], r["predicted"]): r["n"] for r in
           resolve_query("sim_rocchio_centroid_eval")(spark, str(d)).collect()}
    assert out[(0, 0)] == 20
    assert out[(1, 1)] == 20
    assert out[(1, 0)] == 1          # the planted noisy label
    assert (0, 1) not in out


def test_pq_adc_scan_lut_identity_and_cluster_recall(spark, tmp_path):
    """sim_pq_adc_scan: every returned adist equals the independent
    LUT-sum replica (query-subvector -> assigned-centroid distances,
    round-6, summed as decimals), and on well-separated planted
    clusters the ADC top-k of a query stays inside its own cluster."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from posts_vectorizer_spark.operators import clustering as C
    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = np.random.default_rng(5)
    rows = []
    for vid in range(80):
        center = 8.0 if vid % 2 == 0 else -8.0
        vec = center + rng.normal(0, 0.3, 64)
        rows.append((vid, [float(x) for x in vec], vid % 2))
    d = tmp_path / "adc"
    d.mkdir()
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(str(d / "embeddings.parquet"))

    out = resolve_query("sim_pq_adc_scan")(spark, str(d)).collect()
    assert {r["query_id"] for r in out} == {0}  # vec_id % 97 == 0
    assert len(out) == C.ADC_TOPK
    # query 0 sits in the +8 cluster (even ids) — all neighbors even
    assert all(r["vec_id"] % 2 == 0 for r in out)

    # independent LUT-sum replica from the shared codebook trainer
    loaded = spark.read.parquet(str(d / "embeddings.parquet"))
    books = C._pq_codebooks(loaded, C.PQ_M, C.PQ_K, C.PQ_ITERS, 64)
    q = next(vec for vid, vec, _ in rows if vid == 0)
    codes = {}
    for i, (enc, _) in enumerate(books):
        for r in enc.collect():
            codes.setdefault(r["vec_id"], {})[i] = r[f"code{i}"]
    Q6 = Decimal("0.000001")
    sub_len = 64 // C.PQ_M
    for r in out:
        total = Decimal(0)
        for i, (_, cents) in enumerate(books):
            qs = np.array(q[i * sub_len : (i + 1) * sub_len])
            cvec = np.array(dict(cents)[codes[r["vec_id"]][i]])
            # sequential fold in python float mirrors the fixed-order
            # Spark fold over identical doubles
            acc = 0.0
            for a, b in zip(qs, cvec):
                diff = float(np.float32(a)) - b
                acc += diff * diff
            total += Decimal(repr(acc)).quantize(Q6, ROUND_HALF_UP)
        assert r["adist"] == float(total)


def test_label_centroid_drift_planted_shift(spark, tmp_path):
    """sim_label_centroid_drift: a label whose even/odd halves sit at
    different centers reports the planted displacement; a stable label
    reports ~0 drift and cosine ~1."""
    import numpy as np

    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = np.random.default_rng(3)
    rows = []
    for vid in range(120):
        label = vid % 2  # label 0 = even ids... use vid % 4 grouping
    rows = []
    vid = 0
    # label 0: both halves centered at +2*ones (stable)
    # label 1: even-id half at +2*ones, odd-id half rotated to an
    # alternating +/-5 pattern — both displaced AND re-directed, so
    # the L2 and the cosine legs each have something to catch
    base = np.full(8, 2.0)
    rotated = np.array([5.0, -5.0] * 4)
    for _ in range(30):
        for label in (0, 1):
            for parity in (0, 1):
                center = base
                if label == 1 and parity == 1:
                    center = rotated
                vec = center + rng.normal(0, 0.05, 8)
                while vid % 2 != parity:
                    vid += 1
                rows.append((vid, [float(x) for x in vec], label))
                vid += 1
    d = tmp_path / "cdrift"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))

    out = {r["label"]: r for r in
           resolve_query("sim_label_centroid_drift")(spark, str(d)).collect()}
    stable, drifted = out[0], out[1]
    assert stable["l2_drift"] < 0.1
    assert stable["cos_sim"] > 0.999
    # planted displacement: ||2*ones - (+/-5 alt)|| = sqrt(4*9 + 4*49)
    assert abs(drifted["l2_drift"] - (4 * 9.0 + 4 * 49.0) ** 0.5) < 0.2
    # direction changed: cos(2*ones, alternating +/-5) ~= 0
    assert abs(drifted["cos_sim"]) < 0.1


def test_hits_planted_authority(spark, tmp_path):
    """sim_hits_hubs_authorities: on a graph where one dense cluster
    collects most top-k links, authority concentrates on the
    most-linked-to vectors; scores are L1-normalized; every score
    matches a pinned-decimal replica of the two hub/authority
    half-steps run over the SAME edge list (the edge derivation is
    covered by the topk kernel tests — the replica independently
    re-executes the ITERATION)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from posts_vectorizer_spark.operators import graph
    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = np.random.default_rng(11)
    rows = []
    for vid in range(12):
        if vid < 9:  # dense cluster around e1
            v = np.array([1.0, 0, 0, 0]) + rng.normal(0, 0.03, 4)
        else:        # three outliers near e2
            v = np.array([0, 1.0, 0, 0]) + rng.normal(0, 0.03, 4)
        rows.append((vid, [float(x) for x in v], vid % 2))
    d = tmp_path / "hits"
    d.mkdir()
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(str(d / "embeddings.parquet"))

    got = {
        r["vec_id"]: r
        for r in resolve_query("sim_hits_hubs_authorities")(
            spark, str(d)
        ).collect()
    }
    assert set(got) == set(range(12))
    assert all(r["out_deg"] == 5 for r in got.values())
    for col in ("hub", "authority"):
        assert abs(sum(r[col] for r in got.values()) - 1.0) < 1e-6

    # replica of the two L1-normalized half-steps over the same edges
    edges = [
        (r["src"], r["dst"])
        for r in graph._directed_edges(emb, 5).collect()
    ]
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    q = Decimal("0.000000001")

    def r9(x):
        return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)

    def d9(x):
        return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)

    h = {v: 1.0 for v in verts}
    a = {}
    for _ in range(2):
        a_raw = {v: Decimal(0) for v in verts}
        for u, v in edges:
            a_raw[v] += d9(h[u])
        ta = float(sum(a_raw.values()))
        a = {v: float(r9(float(a_raw[v]) / ta)) for v in verts}
        h_raw = {v: Decimal(0) for v in verts}
        for u, v in edges:
            h_raw[u] += d9(a[v])
        th = float(sum(h_raw.values()))
        h = {v: float(r9(float(h_raw[v]) / th)) for v in verts}
    for v in verts:
        assert got[v]["hub"] == h[v], v
        assert got[v]["authority"] == a[v], v
    # authority concentrates inside the cluster (its members are the
    # only ones the 9 cluster vectors can rank)
    cluster_auth = sum(got[v]["authority"] for v in range(9))
    assert cluster_auth > 0.8


def test_hits_ann_shares_producer_and_iteration(spark):
    """sim_hits_ann: the production twin runs the IDENTICAL iteration
    over the lsh_ann edge list — its scores match a pinned-decimal
    replica of the two half-steps over exactly that edge set, tying
    the dual forms (exact witness / ANN production) to one iteration
    contract."""
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.operators import similarity
    from posts_vectorizer_spark.plans.queries_similarity import (
        DIMS, KNN_GRAPH_K,
    )
    from posts_vectorizer_spark.plans.registry import resolve_query
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    edges = [
        (r["query_id"], r["neighbor_id"])
        for r in similarity.lsh_ann(emb, DIMS, KNN_GRAPH_K).collect()
    ]
    got = {
        r["vec_id"]: r
        for r in resolve_query("sim_hits_ann")(spark, SF_SMOKE).collect()
    }
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    assert set(got) == set(verts)

    q = Decimal("0.000000001")

    def r9(x):
        return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)

    h = {v: 1.0 for v in verts}
    a = {}
    for _ in range(2):
        a_raw = {v: Decimal(0) for v in verts}
        for u, v in edges:
            a_raw[v] += r9(h[u])
        ta = float(sum(a_raw.values()))
        a = {v: float(r9(float(a_raw[v]) / ta)) for v in verts}
        h_raw = {v: Decimal(0) for v in verts}
        for u, v in edges:
            h_raw[u] += r9(a[v])
        th = float(sum(h_raw.values()))
        h = {v: float(r9(float(h_raw[v]) / th)) for v in verts}
    for v in verts:
        assert got[v]["hub"] == h[v], v
        assert got[v]["authority"] == a[v], v
    out_deg = {}
    for u, _ in edges:
        out_deg[u] = out_deg.get(u, 0) + 1
    for v in verts:
        assert got[v]["out_deg"] == out_deg.get(v, 0)


def test_label_propagation_planted_communities(spark, tmp_path):
    """sim_label_propagation: two well-separated embedding clusters
    resolve to (at most) one community each, and every label matches
    an exact integer replica of the three synchronous min-tie
    mode-propagation rounds over the SAME mutual edge list — proving
    the packed-argmax decode (key = cnt*2^33 - label) realizes
    (max count, then min label)."""
    from collections import Counter, defaultdict

    import numpy as np

    from posts_vectorizer_spark.operators import graph
    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = np.random.default_rng(7)
    rows = []
    for vid in range(16):
        base = [1.0, 0, 0, 0] if vid < 8 else [0, 1.0, 0, 0]
        v = np.array(base) + rng.normal(0, 0.03, 4)
        rows.append((vid, [float(x) for x in v], vid % 2))
    d = tmp_path / "lpa"
    d.mkdir()
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.parquet(str(d / "embeddings.parquet"))

    got = {
        r["vec_id"]: r
        for r in resolve_query("sim_label_propagation")(
            spark, str(d)
        ).collect()
    }
    # no cross-cluster community: the two planted clusters never share
    # a label (mutual top-5 edges cannot cross the separation)
    left = {got[v]["community"] for v in got if v < 8}
    right = {got[v]["community"] for v in got if v >= 8}
    assert not (left & right)

    # exact replica of three synchronous rounds over the same edges
    edges = [
        (r["src"], r["dst"])
        for r in graph._mutual_edges(emb, graph.LPA_K).collect()
    ]
    nbrs = defaultdict(list)
    for s, t in edges:
        nbrs[t].append(s)
    lab = {v: v for v in nbrs}
    for _ in range(graph.LPA_ITERS):
        lab = {
            v: max(
                Counter(lab[u] for u in nbrs[v]).items(),
                key=lambda kv: (kv[1], -kv[0]),
            )[0]
            for v in nbrs
        }
    sizes = Counter(lab.values())
    for v, expect in lab.items():
        assert got[v]["community"] == expect, v
        assert got[v]["csize"] == sizes[expect], v


def test_sq8_scan_exact_replica_and_recall(spark, tmp_path):
    """sim_sq8_scan: every (code, reconstruction, ADC score, rank)
    matches a from-scratch integer replica of the min/max grid,
    trunc-division quantizer, and 1e-6-pinned dot product; on
    well-separated clusters the SQ8 top-1 agrees with the exact
    float top-1 (the quantizer preserves coarse geometry)."""
    import numpy as np

    from posts_vectorizer_spark.operators import quantization as Q
    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = np.random.default_rng(3)
    rows = []
    for vid in range(40):
        base = [2.0, 0, 0, 0] if vid % 2 == 0 else [0, 2.0, 0, 0]
        v = np.array(base * 16) + rng.normal(0, 0.05, 64)
        rows.append((vid, [float(x) for x in v], vid % 2))
    d = tmp_path / "sq8"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))

    got = sorted(
        tuple(r)
        for r in resolve_query("sim_sq8_scan")(spark, str(d)).collect()
    )

    # replica on the same lattice (floats ride through round-9 decimal)
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("0.000000001")

    def x9(v):
        # the parquet column is float32: ride through the same widening
        # the engine's DOUBLE cast performs before the round-9 pin
        return int(
            Decimal(repr(float(np.float32(v)))).quantize(
                q9, rounding=ROUND_HALF_UP
            )
            * 10**9
        )

    def tdiv(a, b):
        return a // b if a >= 0 else -((-a) // b)

    X = {vid: [x9(x) for x in e] for vid, e, _ in rows}
    D = 64
    mn = [min(X[v][p] for v in X) for p in range(D)]
    mx = [max(X[v][p] for v in X) for p in range(D)]
    recon = {
        v: [
            tdiv(
                mn[p]
                + (
                    (2 * ((X[v][p] - mn[p]) * 255 // (mx[p] - mn[p]))
                     + 1)
                    * (mx[p] - mn[p])
                )
                // 512,
                1000,
            )
            for p in range(D)
        ]
        for v in X
    }
    expect = []
    for qid in sorted(X):
        if qid % Q.SQ8_EVERY:
            continue
        q6 = [tdiv(X[qid][p], 1000) for p in range(D)]
        sc = sorted(
            (-sum(a * b for a, b in zip(q6, recon[c])), c)
            for c in X
            if c != qid
        )
        for r, (negs, c) in enumerate(sc[: Q.SQ8_K], 1):
            expect.append((qid, c, -negs, r))
    assert got == sorted(expect)
    # coarse geometry preserved: top-1 is an even (same-cluster) vector
    top1 = {r[0]: r[1] for r in got if r[3] == 1}
    assert all(n % 2 == 0 for n in top1.values())


def test_binary_hamming_exhaustive_replica(spark, tmp_path):
    """sim_binary_hamming: the packed words and every Hamming distance
    match a from-scratch bit replica (including negative components
    packing to 0 bits and the per-query (distance, id) tie order)."""
    import numpy as np

    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = np.random.default_rng(5)
    rows = [
        (vid, [float(x) for x in rng.normal(0, 1, 64)], 0)
        for vid in range(30)
    ]
    d = tmp_path / "ham"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))

    got = sorted(
        tuple(r)
        for r in resolve_query("sim_binary_hamming")(
            spark, str(d)
        ).collect()
    )
    packs = {}
    for vid, e, _ in rows:
        bits = [1 if x > 0 else 0 for x in e]
        packs[vid] = (
            sum(b << i for i, b in enumerate(bits[:32])),
            sum(b << i for i, b in enumerate(bits[32:])),
        )
    expect = []
    for qid in sorted(packs):
        if qid % 10:
            continue
        cand = sorted(
            (
                bin(packs[qid][0] ^ packs[c][0]).count("1")
                + bin(packs[qid][1] ^ packs[c][1]).count("1"),
                c,
            )
            for c in packs
            if c != qid
        )
        for r, (h, c) in enumerate(cand[:10], 1):
            expect.append((qid, c, h, r))
    assert got == sorted(expect)


def test_label_propagation_ann_shares_iteration(spark):
    """sim_label_propagation_ann: the production twin runs the
    IDENTICAL lpa_from_edges iteration over the mutualized lsh_ann
    edge list — every (community, csize) matches an exact integer
    replica of three mode-propagation rounds over exactly that edge
    set, tying the dual forms to one iteration contract (the hits_ann
    convention)."""
    from collections import Counter, defaultdict

    from posts_vectorizer_spark.operators import similarity
    from posts_vectorizer_spark.plans.queries_similarity import (
        DIMS, KNN_GRAPH_K, _mutual_edges,
    )
    from posts_vectorizer_spark.plans.registry import resolve_query
    from posts_vectorizer_spark.operators import graph
    from tests.conftest import SF_SMOKE
    from posts_vectorizer_spark.sources import load_table

    got = {
        r["vec_id"]: r
        for r in resolve_query("sim_label_propagation_ann")(
            spark, SF_SMOKE
        ).collect()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings")
    e1 = _mutual_edges(
        similarity.lsh_ann(emb, DIMS, KNN_GRAPH_K)
    ).collect()
    nbrs = defaultdict(list)
    for r in e1:
        nbrs[r["dst"]].append(r["src"])
        nbrs[r["src"]].append(r["dst"])
    lab = {v: v for v in nbrs}
    for _ in range(graph.LPA_ITERS):
        lab = {
            v: max(
                Counter(lab[u] for u in nbrs[v]).items(),
                key=lambda kv: (kv[1], -kv[0]),
            )[0]
            for v in nbrs
        }
    sizes = Counter(lab.values())
    assert set(got) == set(lab)
    for v, expect in lab.items():
        assert got[v]["community"] == expect, v
        assert got[v]["csize"] == sizes[expect], v


def test_assortativity_planted_graphs(spark):
    """assortativity_from_edges (sim_degree_assortativity's shared
    algebra, staged r13) on three hand-derived graphs: the star S3 is
    perfectly disassortative (every edge joins deg-3 to deg-1 -> r
    exactly -1: num = 6*18 - 12*12 = -36 over sqrt(36)*sqrt(36)); the
    path P4's mixed pairs give r = -4/(sqrt(8)*sqrt(8)) — the exact
    IEEE value of the fixed-shape expression, one ulp off the
    mathematical -0.5 (asserted bit-exact against the replica); the
    triangle C3 is regular (zero degree variance) and must yield NULL
    explicitly, not a 0/0 NaN."""
    import math
    from posts_vectorizer_spark.operators.graph import (
        assortativity_from_edges,
    )

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    [r] = assortativity_from_edges(star).collect()
    assert (r["n_nodes"], r["n_edges"]) == (4, 3)
    assert r["assortativity"] == -1.0

    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    [r] = assortativity_from_edges(path).collect()
    assert (r["n_nodes"], r["n_edges"]) == (4, 3)
    assert r["assortativity"] == -4 / (math.sqrt(8) * math.sqrt(8))
    assert abs(r["assortativity"] + 0.5) < 1e-15

    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long"
    )
    [r] = assortativity_from_edges(tri).collect()
    assert (r["n_nodes"], r["n_edges"]) == (3, 3)
    assert r["assortativity"] is None


def test_kcenter_coreset_covers_clusters_and_matches_replica(spark, tmp_path):
    """curation_kcenter_coreset (staged r13) on four tight direction
    clusters (3 vectors each, exactly-f32-representable components):
    the greedy max-min chain MUST pick one vector from each cluster
    (within-cluster cosine distance ~0, across >= 1), and the whole
    (pick, vec_id, dist) chain is replayed bit-exact by a Python
    replica of the spec — round-9 decimal centroid, in-order IEEE
    dot/norm folds, round-6 distances, vec_id tiebreaks."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    dirs = [(1.0, 0.0), (0.0, 1.0), (-1.0, 0.0), (0.0, -1.0)]
    rows = []
    # asymmetric all-positive jitter keeps the corpus centroid off the
    # origin (a symmetric fixture pins it to (0,0) -> NULL cosine)
    for ci, (x, y) in enumerate(dirs):
        for j, eps in enumerate((0.0625, 0.125, 0.25)):
            rows.append(
                (ci * 10 + j,
                 [x + (eps if x == 0.0 else 0.0),
                  y + (eps if y == 0.0 else 0.0)],
                 ci)
            )
    d = tmp_path / "kc"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))

    got = sorted(
        (r["pick"], r["vec_id"], r["dist"])
        for r in resolve_query("curation_kcenter_coreset")(
            spark, str(d)
        ).collect()
    )
    assert len(got) == 4
    # one pick per direction cluster
    assert sorted({vid // 10 for _, vid, _ in got}) == [0, 1, 2, 3]

    # exact replica of the spec
    vecs = {vid: emb for vid, emb, _ in rows}
    n = len(vecs)
    q9 = Decimal("0.000000001")
    sums = [Decimal(0), Decimal(0)]
    for emb in vecs.values():
        for i, v in enumerate(emb):
            sums[i] += Decimal(repr(float(v))).quantize(
                q9, rounding=ROUND_HALF_UP
            )
    cent = [float(sums[i]) / n for i in range(2)]

    def cos(a, b):
        dot = 0.0
        na = 0.0
        nb = 0.0
        for i in range(2):
            dot += a[i] * b[i]
        for i in range(2):
            na += a[i] * a[i]
        for i in range(2):
            nb += b[i] * b[i]
        na, nb = math.sqrt(na), math.sqrt(nb)
        if na > 0 and nb > 0:
            return dot / (na * nb)
        return None

    def r6(x):
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    picked = []
    # pick 1: farthest from centroid
    cand = sorted(
        ((-(r6(1 - cos(cent, e))), vid) for vid, e in vecs.items()),
    )
    picked.append((1, cand[0][1], -cand[0][0]))
    for r in range(2, 5):
        ids = {vid for _, vid, _ in picked}
        best = None
        for vid, e in sorted(vecs.items()):
            if vid in ids:
                continue
            md = min(r6(1 - cos(vecs[p], e)) for _, p, _ in picked)
            if best is None or md > best[0]:
                best = (md, vid)
        picked.append((r, best[1], best[0]))
    assert got == sorted(picked)
