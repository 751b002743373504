"""Property tests for the round-4 analytics wave: mutual-kNN graph,
containment join, MAD anomaly profile, streaming tumbling drain horizon,
and the Zipf slope. The differential oracle sweep (test_oracle.py) checks
cross-engine equality; these pin the SEMANTICS the oracle pair agrees on.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

import __spark_entry__ as E
from tests.conftest import SF_SMOKE

_Q = E.queries()


def test_mutual_knn_edges_are_reciprocal_topk(spark):
    """Every mutual edge must appear in BOTH directions of the plain kNN
    list, with both ranks <= k; and no reported edge may be missing from
    either direction (mutuality is exactly reciprocity)."""
    from posts_vectorizer_spark.operators import similarity
    from posts_vectorizer_spark.plans.queries_similarity import KNN_GRAPH_K
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    knn = {
        (r["query_id"], r["neighbor_id"]): r["rk"]
        for r in similarity.topk(emb, KNN_GRAPH_K).collect()
    }
    edges = _Q["sim_knn_graph_mutual"](spark, SF_SMOKE).collect()
    assert edges, "fixture should produce at least one mutual edge"
    for e in edges:
        assert e["src"] < e["dst"]
        assert knn[(e["src"], e["dst"])] == e["rk_forward"] <= KNN_GRAPH_K
        assert knn[(e["dst"], e["src"])] == e["rk_backward"] <= KNN_GRAPH_K
    reported = {(e["src"], e["dst"]) for e in edges}
    for (q, n), _rk in knn.items():
        if q < n and (n, q) in knn:
            assert (q, n) in reported


def test_containment_matches_python_brute_force(spark):
    """Recompute blocking + containment in plain Python over the per-doc
    shingle sets and require EXACT agreement with the query: same pair
    set, same overlap counts (an engine-independent re-derivation, unlike
    the SQL oracle which shares the query's relational shape)."""
    from posts_vectorizer_spark.operators.dedup import _doc_shingle_arrays
    from posts_vectorizer_spark.plans.queries_fuzzy import (
        CONTAIN_B,
        CONTAIN_T,
    )
    from posts_vectorizer_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    sets = {
        r["doc_id"]: frozenset(r["shs"])
        for r in _doc_shingle_arrays(docs).collect()
    }
    by_key: dict[int, set[int]] = {}
    for d, shs in sets.items():
        for k in sorted(shs)[:CONTAIN_B]:
            by_key.setdefault(k, set()).add(d)
    expected = {}
    for members in by_key.values():
        for a in members:
            for b in members:
                if a == b:
                    continue
                ov = len(sets[a] & sets[b])
                if ov / len(sets[a]) >= CONTAIN_T:
                    expected[(a, b)] = ov
    rows = _Q["dedup_containment"](spark, SF_SMOKE).collect()
    got = {(r["src"], r["dst"]): r["n_overlap"] for r in rows}
    assert got == expected
    assert got, "fixture near-dups should produce containment pairs"
    for r in rows:
        assert r["n_src"] == len(sets[r["src"]])
        assert r["containment"] == round(r["n_overlap"] / r["n_src"], 6)


def test_anomaly_mad_matches_numpy(spark):
    """The per-type medians, MADs, and outlier counts must equal a direct
    numpy computation on the collected values."""
    from posts_vectorizer_spark.plans.queries_timeseries import (
        MAD_K,
        MAD_SCALE,
    )
    from posts_vectorizer_spark.sources import load_table

    vals: dict[str, list[float]] = {}
    for r in (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .collect()
    ):
        vals.setdefault(r["event_type"], []).append(r["value"])
    out = {r["event_type"]: r for r in _Q["events_anomaly_mad"](spark, SF_SMOKE).collect()}
    assert set(out) == set(vals)
    for et, xs in vals.items():
        a = np.asarray(xs)
        med = float(np.median(a))
        dev = np.abs(a - med)
        mad = float(np.median(dev))
        n_out = int(
            np.sum(np.round(dev, 6) > round(MAD_K * MAD_SCALE * mad, 6))
        )
        assert out[et]["n"] == len(xs)
        assert out[et]["med"] == round(med, 6)
        assert out[et]["mad"] == round(mad, 6)
        assert out[et]["n_outliers"] == n_out


def test_tumbling_drain_withholds_open_windows(spark):
    """Append mode must emit exactly the windows whose end the final
    watermark passed — a strict subset of the batch result, with the
    trailing (still-open) windows withheld."""
    from posts_vectorizer_spark.sources import load_table

    emitted = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in _Q["stream_tumbling_drain"](spark, SF_SMOKE).collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in _Q["events_tumbling_window"](spark, SF_SMOKE).collect()
    }
    max_ts = (
        load_table(spark, SF_SMOKE, "events").agg(F.max("ts")).collect()[0][0]
    )
    assert emitted
    assert set(emitted) < set(batch), "some trailing windows must be open"
    for key, agg in emitted.items():
        assert batch[key] == agg
    import datetime

    horizon = max_ts - datetime.timedelta(hours=2)
    for ws, _et in batch:
        if (ws, _et) in emitted:
            assert ws <= horizon
        else:
            assert ws > horizon


def test_zipf_slope_is_negative_and_counts_vocab(spark):
    """Token frequencies are Zipf-ish: the fitted slope must be negative,
    and n_words must equal the distinct-token count."""
    from posts_vectorizer_spark.functions import text as T
    from posts_vectorizer_spark.sources import load_table
    from posts_vectorizer_spark.sources.catalog import spread

    row = _Q["text_zipf_slope"](spark, SF_SMOKE).collect()[0]
    vocab = (
        spread(load_table(spark, SF_SMOKE, "documents"))
        .select(F.explode(T.tokens("text")).alias("w"))
        .distinct()
        .count()
    )
    assert row["n_words"] == vocab
    assert row["zipf_slope"] < 0


def test_portable_kmeans_properties(spark):
    """Lloyd invariants on the portable KMeans: every vector assigned
    (sizes sum to n), k clusters survive, result is partition-count
    invariant, and one more Lloyd step never increases the within-cluster
    sum of squares (monotonic descent)."""
    from posts_vectorizer_spark.operators import clustering
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = clustering.kmeans(emb).collect()
    n = emb.count()
    sizes = {}
    for r in out:
        sizes[r["cluster_id"]] = r["n_members"]
    assert sum(sizes.values()) == n
    assert len(sizes) == clustering.K_DEFAULT
    # partition invariance: identical output from a differently-sliced input
    re_out = clustering.kmeans(emb.repartition(7)).collect()
    key = lambda r: (r["cluster_id"], r["dim"])  # noqa: E731
    assert {key(r): (r["n_members"], r["component"]) for r in out} == {
        key(r): (r["n_members"], r["component"]) for r in re_out
    }

    def wcss(iters: int) -> float:
        rows = clustering.kmeans(emb, iters=iters).collect()
        cents = {}
        for r in rows:
            cents.setdefault(r["cluster_id"], {})[r["dim"]] = r["component"]
        import numpy as np

        C = {c: np.array([d[i] for i in sorted(d)]) for c, d in cents.items()}
        X = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()
        }
        return sum(
            min(float(((x - c) ** 2).sum()) for c in C.values())
            for x in X.values()
        )

    assert wcss(2) <= wcss(1) + 1e-9


def test_semdedup_prune_matches_bruteforce(spark):
    """SemDeDup drop list == a direct numpy recomputation over the SAME
    final cluster lists: exact pruned-id set, exact (cluster, smallest
    witness, witness count), cosine to 1e-6. Pins the keep-first-by-id
    contract the oracle pair agrees on."""
    from posts_vectorizer_spark.operators import clustering
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    by_cluster: dict[int, list] = {}
    for r in clustering._final_lists(emb).collect():
        by_cluster.setdefault(r["cluster_id"], []).append(
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        )
    tau = clustering.SEMDEDUP_TAU
    expect = {}
    for cid, members in by_cluster.items():
        members.sort(key=lambda t: t[0])
        for i, (vid, v) in enumerate(members):
            wits = []
            for wid, w in members[:i]:
                cos = round(
                    float(v @ w) / float(np.linalg.norm(v) * np.linalg.norm(w)), 6
                )
                if cos > tau:
                    wits.append((wid, cos))
            if wits:
                best = min(wits)
                expect[vid] = (cid, best[0], best[1], len(wits))
    got = {
        r["vec_id"]: (
            r["cluster_id"],
            r["witness_id"],
            r["witness_cosine"],
            r["n_witnesses"],
        )
        for r in clustering.semdedup_prune(emb).collect()
    }
    assert expect, "fixture should prune at least one vector"
    assert got.keys() == expect.keys()
    for vid, g in got.items():
        e = expect[vid]
        assert (g[0], g[1], g[3]) == (e[0], e[1], e[3])
        assert abs(g[2] - e[2]) < 2e-6


def test_bpe_greedy_overlap_and_descent(spark):
    """The greedy non-overlap rule on a hand corpus: in 'aaaa' the pair
    (a,a) occurs at 3 positions but only 2 merges apply (positions 1 and
    3); and each round's merge must strictly reduce that word's symbol
    count. Also: round-1 pair_count equals a direct Python count over the
    fixture vocabulary."""
    from posts_vectorizer_spark.operators import bpe
    from posts_vectorizer_spark.functions import text as T
    from posts_vectorizer_spark.sources import load_table
    from posts_vectorizer_spark.sources.catalog import spread

    toy = spark.createDataFrame(
        [(1, "aaaa aaaa b", "en", "t", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = sorted(bpe.merges(toy, rounds=2).collect(), key=lambda r: r["round"])
    # round 1: pair (a,a) appears 3x per 'aaaa', 2 words -> count 6
    assert (
        rows[0]["left_sym"],
        rows[0]["right_sym"],
        rows[0]["merged"],
        rows[0]["pair_count"],
    ) == ("a", "a", "aa", 6)
    # round 2: 'aaaa' became [aa, aa] -> best pair is (aa, aa), count 2
    assert (rows[1]["merged"], rows[1]["pair_count"]) == ("aaaa", 2)

    # fixture: round-1 count equals a direct Python recount
    docs = load_table(spark, SF_SMOKE, "documents")
    freq: dict[str, int] = {}
    for r in (
        spread(docs).select(F.explode(T.tokens("text")).alias("w")).collect()
    ):
        freq[r["w"]] = freq.get(r["w"], 0) + 1
    from collections import Counter

    pair_counts: Counter = Counter()
    for w, f in freq.items():
        for a, b in zip(w, w[1:]):
            pair_counts[(a, b)] += f
    ((bl, br), bc) = min(
        pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )
    got = {r["round"]: r for r in _Q["text_bpe_merges"](spark, SF_SMOKE).collect()}
    assert (got[1]["left_sym"], got[1]["right_sym"], got[1]["pair_count"]) == (
        bl,
        br,
        bc,
    )


def test_bpe_randomized_vs_python_reference(spark):
    """Randomized differential guard for the windowed merge formulation:
    tiny alphabets force overlapping runs and count ties; a pure-Python
    BPE (greedy left-to-right merge, same tiebreaks) must agree with the
    engine on every round for every seeded corpus."""
    import random

    from posts_vectorizer_spark.operators import bpe

    def py_bpe(freqs: dict, rounds: int):
        seqs = {w: list(w) for w in freqs}
        out = []
        for rnd in range(1, rounds + 1):
            counts: dict = {}
            for w, syms in seqs.items():
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + freqs[w]
            if not counts:
                break
            (l, r), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((rnd, l, r, l + r, c))
            for w, syms in seqs.items():
                new, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == l
                        and syms[i + 1] == r
                    ):
                        new.append(l + r)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                seqs[w] = new
        return out

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
            for _ in range(12)
        ]
        text = " ".join(words)
        df = spark.createDataFrame(
            [(1, text, "en", "t", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        freqs: dict = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + 1
        expected = py_bpe(freqs, 3)
        got = sorted(
            (
                (r["round"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
                for r in bpe.merges(df, rounds=3).collect()
            )
        )
        assert got == sorted(expected), f"seed {seed}: {got} != {expected}"


def test_bpe_pair_exhausted_corpus_is_empty(spark):
    """A corpus of single-character words has no pairs: the merge table
    must be EMPTY (not a NULL row) — matching the SQL twin's empty
    LIMIT 1."""
    from posts_vectorizer_spark.operators import bpe

    df = spark.createDataFrame(
        [(1, "a b a b", "en", "t", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert bpe.merges(df, rounds=2).collect() == []


def test_portable_ivf_recall_vs_brute_force(spark):
    """nprobe=1 IVF must still recover a solid fraction of the true top-3
    (same-list neighbors) and every reported neighbor must share the
    query's list by construction — checked against the exact kernel."""
    from posts_vectorizer_spark.operators import clustering, similarity
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    truth: dict = {}
    for r in similarity.topk(emb, 3).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict = {}
    for r in clustering.ivf_search(emb).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    recall = hits / total
    assert recall > 0.2, recall  # random near-orthogonal fixture, 8 lists


def test_pagerank_knn_matches_python_power_iteration(spark):
    """PageRank over the mutual-kNN graph == a direct Python replay of the
    same quantized power iteration (round-12 contributions, round-9
    ranks), and total rank mass stays ~1 (symmetric graph, no dangling
    mass)."""
    from collections import defaultdict

    from posts_vectorizer_spark.operators import graph
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    nbrs: dict[int, list[int]] = defaultdict(list)
    for e in graph._mutual_edges(emb, graph.PR_K).collect():
        nbrs[e["src"]].append(e["dst"])
    n = len(nbrs)
    pr = {v: round(1.0 / n, graph.PR_ROUND) for v in nbrs}
    for _ in range(graph.PR_ITERS):
        s: dict[int, float] = defaultdict(float)
        for u, vs in nbrs.items():
            c = round(pr[u] / len(vs), graph.PR_C_ROUND)
            for v in vs:
                s[v] += c
        pr = {
            v: round(
                (1.0 - graph.PR_DAMPING) / n + graph.PR_DAMPING * s[v],
                graph.PR_ROUND,
            )
            for v in nbrs
        }
    got = {
        r["vec_id"]: (r["degree"], r["pr"])
        for r in graph.pagerank_knn(emb).collect()
    }
    assert got.keys() == pr.keys() and n > 0
    for v, (d, p) in got.items():
        assert d == len(nbrs[v])
        assert abs(p - pr[v]) < 5e-9
    assert abs(sum(p for _, p in got.values()) - 1.0) < 1e-4


def test_pq_quantize_properties(spark):
    """PQ invariants: every vector lands in exactly one code cell (counts
    sum to n), at most k^m cells exist, distortion is non-negative, and
    the whole train->encode->profile pipeline is partition-invariant
    (identical output from a differently-sliced input)."""
    from posts_vectorizer_spark.operators import clustering
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = clustering.pq_quantize(emb).collect()
    n = emb.count()
    assert sum(r["n_vectors"] for r in rows) == n
    assert len(rows) <= clustering.PQ_K ** clustering.PQ_M
    assert all(r["avg_sq_error"] >= 0 for r in rows)
    key = lambda r: (r["code0"], r["code1"])  # noqa: E731
    re_rows = clustering.pq_quantize(emb.repartition(7)).collect()
    assert {key(r): (r["n_vectors"], r["avg_sq_error"]) for r in rows} == {
        key(r): (r["n_vectors"], r["avg_sq_error"]) for r in re_rows
    }


def test_ivfpq_adc_beats_random_selection(spark):
    """At 6 bits/vector on isotropic random fixtures, PQ recall is
    necessarily modest — the property worth pinning is that ADC ranking
    still carries signal: the TRUE squared-L2 of the ADC-chosen top-3
    must average strictly below the list-wide mean true distance (i.e.
    the compressed index beats random candidate selection), and every
    returned neighbor shares the query's coarse list."""
    from posts_vectorizer_spark.operators import clustering
    from posts_vectorizer_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    lists = clustering._final_lists(emb).collect()
    cluster_of, members, vecs = {}, {}, {}
    for r in lists:
        cluster_of[r["vec_id"]] = r["cluster_id"]
        members.setdefault(r["cluster_id"], []).append(r["vec_id"])
        vecs[r["vec_id"]] = np.asarray(r["embedding"], dtype=np.float64)

    def d2(a, b):
        return float(((vecs[a] - vecs[b]) ** 2).sum())

    got = {}
    for r in clustering.ivfpq_search(emb).collect():
        assert cluster_of[r["neighbor_id"]] == cluster_of[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got and all(len(v) <= 3 for v in got.values())
    sel_sum = sel_n = base_sum = base_n = 0.0
    for q, nbrs in got.items():
        others = [x for x in members[cluster_of[q]] if x != q]
        for nb in nbrs:
            sel_sum += d2(q, nb)
            sel_n += 1
        for x in others:
            base_sum += d2(q, x)
            base_n += 1
    assert sel_sum / sel_n < 0.97 * (base_sum / base_n)


def test_incremental_minhash_equals_cross_split_of_full(spark):
    """The incremental probe must be EXACTLY the cross-split restriction
    of the full self-join pipeline: same band index, same verify, so a
    (new, existing) pair appears iff the full near-dup output contains
    that pair across the id split, with the identical jaccard."""
    from posts_vectorizer_spark.operators.dedup import INCR_MOD
    from tests.conftest import SF_ORACLE

    full = _Q["dedup_minhash_near_dups"](spark, SF_ORACLE).collect()
    incr = _Q["dedup_incremental_minhash"](spark, SF_ORACLE).collect()
    expect = {}
    for r in full:
        a, b = r["doc_a"], r["doc_b"]
        da, db = a % INCR_MOD == 0, b % INCR_MOD == 0
        if da != db:
            new, old = (a, b) if da else (b, a)
            expect[(new, old)] = r["jaccard"]
    got = {
        (r["new_doc"], r["existing_doc"]): r["jaccard"] for r in incr
    }
    assert got, "fixture should have cross-split near-dups"
    assert got == expect


def test_dbscan_matches_brute_force_recount(spark):
    """Independent full recount of DBSCAN at smoke scale: numpy re-derives
    the 2D projection (same quadratic-mix sign matrix), brute-forces all
    pairwise distances, recomputes core flags, union-finds the core
    components, and re-labels borders/noise — the grid-pruned Spark plan
    must reproduce every (role, cluster) exactly."""
    from posts_vectorizer_spark.operators.clustering import (
        DBSCAN_EPS,
        DBSCAN_MINPTS,
    )
    from posts_vectorizer_spark.sources import load_table

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    n, dims = mat.shape

    def sign_row(k):
        d = np.arange(1, dims + 1, dtype=np.int64)
        m = d * 73 + (k + 1) * 1009
        return np.where((m * m * 12289) // 65536 % 2 == 0, 1.0, -1.0)

    # same left-to-right fold + round-6 as the Spark/DuckDB pair. An
    # explicit per-dimension accumulation (NOT mat @ v: BLAS may reorder
    # the summation, and a sum landing ~1 ulp from a 0.5e-6 rounding
    # boundary would flake the exact-equality assertion below).
    def fold_proj(sr: np.ndarray) -> np.ndarray:
        acc = np.zeros(n, dtype=np.float64)
        for d in range(dims):
            acc = acc + mat[:, d] * sr[d]
        return np.round(acc, 6)

    px = fold_proj(sign_row(0))
    py = fold_proj(sign_row(1))
    d2 = (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
    nbr = (d2 <= DBSCAN_EPS * DBSCAN_EPS) & ~np.eye(n, dtype=bool)
    is_core = nbr.sum(axis=1) + 1 >= DBSCAN_MINPTS

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if is_core[i] and is_core[j] and nbr[i, j]:
                parent[find(i)] = find(j)
    comp_min = {}
    for i in range(n):
        if is_core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, ids[i]), ids[i])

    expect = {}
    for i in range(n):
        if is_core[i]:
            expect[ids[i]] = ("core", comp_min[find(i)])
        else:
            cores_near = [
                comp_min[find(j)] for j in range(n) if nbr[i, j] and is_core[j]
            ]
            if cores_near:
                expect[ids[i]] = ("border", min(cores_near))
            else:
                expect[ids[i]] = ("noise", None)

    got = {
        r["vec_id"]: (r["role"], r["cluster"])
        for r in _Q["sim_dbscan"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    roles = {v[0] for v in got.values()}
    assert roles == {"core", "border", "noise"}, (
        f"fixture should exercise all three roles, got {roles}"
    )


def test_dbscan_projection_matches_sim_random_projection(spark):
    """dbscan's 2D coordinates must be EXACTLY dims k=0,1 of
    sim_random_projection — one shared sign matrix, no drift between the
    clustering front-end and the standalone JL operator."""
    from posts_vectorizer_spark.operators.clustering import proj2d_expr
    from posts_vectorizer_spark.sources import load_table

    proj = {
        (r["vec_id"], r["k"]): r["proj"]
        for r in _Q["sim_random_projection"](spark, SF_SMOKE).collect()
        if r["k"] in (0, 1)
    }
    emb = load_table(spark, SF_SMOKE, "embeddings")
    two = emb.select(
        "vec_id", proj2d_expr(0).alias("px"), proj2d_expr(1).alias("py")
    ).collect()
    assert two and all(
        r["px"] == proj[(r["vec_id"], 0)] and r["py"] == proj[(r["vec_id"], 1)]
        for r in two
    )
