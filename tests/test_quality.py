"""Tests for the training-data quality wave (plans/queries_quality.py):
golden repetition signals on a handcrafted corpus, stratified-sample
stratum guarantees, keyword-ranking invariants, and the quantization
error bound. The value-exactness check is the DuckDB oracle
(tools/oracle_check.py); these pin semantics the hash can't express."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.conftest import SF_SMOKE, make_docs


def test_repetition_signals_golden(spark, tmp_path):
    docs = make_docs(spark, [(1, "a a a b", "en"), (2, "x", "en")])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in E.queries()["text_repetition_signals"](
            spark, str(tmp_path)
        ).collect()
    }
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert r1["distinct_ratio"] == 0.5        # {a, b} of 4 tokens
    assert r1["top_token_frac"] == 0.75       # 'a' x3 of 4
    # bigrams: [a a, a a, a b] -> 2 distinct of 3
    assert r1["dup_bigram_frac"] == pytest.approx(1 - 2 / 3)
    # single-token doc: no bigrams -> NULL fraction, not a crash or 0
    assert out[2]["dup_bigram_frac"] is None


def test_stratified_sample_stratum_guarantees(spark):
    from pyspark.sql import functions as F

    from posts_vectorizer_spark.sources import load_table

    out = {
        r["event_type"]: r
        for r in E.queries()["rel_stratified_sample"](spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    # rate-1.0 stratum kept in full
    assert out["purchase"]["kept"] == totals["purchase"]
    # downsampled strata keep roughly 1-in-10 (hash-uniform; wide bounds)
    for t, tot in totals.items():
        if t == "purchase":
            continue
        assert 0 < out[t]["kept"] < tot / 3


def test_top_keywords_ranking_invariants(spark):
    rows = E.queries()["tfidf_top_keywords"](spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc, "no keywords produced"
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        weights = [r["weight"] for r in rs]
        assert weights == sorted(weights, reverse=True)


def test_quantize_error_bound(spark):
    rows = E.queries()["sim_embedding_quantize"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["scale"] > 0
        # round-to-nearest reconstruction error is at most scale/2 per dim
        assert r["mae"] <= r["scale"] / 2 + 1e-9
        assert 0 <= r["n_saturated"] <= 64


def test_char_entropy_crafted(spark, tmp_path):
    """text_char_entropy (staged r7) on analytic cases: a single repeated
    character has entropy 0; four equally-frequent classes give exactly
    2 bits; natural English clears the 3-bit gate."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    make_docs(
        spark,
        [
            (1, "aaaaaaaa", "en"),
            (2, "ab cab c", "en"),  # a,b,c,space x2 each -> 2.0 bits
            (3, "the quick brown fox jumps over the lazy dog", "en"),
            (4, "", "en"),
        ],
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("text_char_entropy")(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[1]["entropy"] == 0.0 and rows[1]["low_entropy"]
    assert rows[2]["entropy"] == 2.0 and rows[2]["low_entropy"]
    assert rows[3]["entropy"] > 3.0 and not rows[3]["low_entropy"]
    assert rows[4]["entropy"] is None and rows[4]["low_entropy"] is None


def test_chunk_sliding_positions_and_overlap(spark, tmp_path):
    """text_chunk_sliding (staged r9): a 200-token doc at W=64/S=48
    yields exactly 4 chunks starting at 0/48/96/144 with sizes
    64/64/64/56; consecutive chunks overlap by exactly 16 tokens; the
    chunk set covers every token; a short doc yields one whole-doc
    chunk; md5 keys match the chunk text."""
    import hashlib

    from posts_vectorizer_spark.plans.registry import resolve_query

    toks = [f"t{i}" for i in range(200)]
    d = tmp_path / "chunks"
    d.mkdir()
    spark.createDataFrame(
        [(1, " ".join(toks), "en", "s", 0), (2, "a b c", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    rows = resolve_query("text_chunk_sliding")(spark, str(d)).collect()

    doc1 = sorted(
        (r for r in rows if r["doc_id"] == 1), key=lambda r: r["chunk_idx"]
    )
    assert [(r["start_tok"], r["n_tokens"]) for r in doc1] == [
        (0, 64), (48, 64), (96, 64), (144, 56),
    ]
    for r in doc1:
        want = toks[r["start_tok"] : r["start_tok"] + r["n_tokens"]]
        assert r["chunk_text"] == " ".join(want)
        assert r["chunk_hash"] == hashlib.md5(
            r["chunk_text"].encode()
        ).hexdigest()
    # stride overlap: each chunk's first 16 tokens repeat the previous tail
    for prev, cur in zip(doc1, doc1[1:]):
        assert prev["chunk_text"].split()[-16:] == cur["chunk_text"].split()[:16]
    # full coverage, in order
    assert doc1[0]["start_tok"] == 0
    assert doc1[-1]["start_tok"] + doc1[-1]["n_tokens"] == 200

    doc2 = [r for r in rows if r["doc_id"] == 2]
    assert len(doc2) == 1
    assert (doc2[0]["chunk_idx"], doc2[0]["n_tokens"]) == (0, 3)
    assert doc2[0]["chunk_text"] == "a b c"


def test_code_mixing_entropy_planted(spark, tmp_path):
    """text_code_mixing_entropy (staged r9): pure-language docs score
    exactly 0 entropy with top_frac 1.0; a half-and-half doc scores the
    round-6-term two-way entropy (2 * round6(0.5*ln 0.5) = 0.693148)
    and trips the mixed flag. Vote majorities survive the mixed doc's
    cross-language token counts."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = [
        (1, "hello world good hello", "en", "s", 0),
        (2, "good world hello world", "en", "s", 0),
        (3, "bonjour monde bien monde", "fr", "s", 0),
        (4, "bien bonjour monde bien", "fr", "s", 0),
        (5, "hello world good bonjour monde bien", "en", "s", 0),  # mixed
    ]
    d = tmp_path / "mix"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in resolve_query("text_code_mixing_entropy")(
            spark, str(d)
        ).collect()
    }
    for pure in (1, 2, 3, 4):
        assert out[pure]["n_langs"] == 1
        assert out[pure]["mix_entropy"] == 0.0
        assert out[pure]["top_frac"] == 1.0
        assert not out[pure]["mixed"]
    m = out[5]
    assert m["n_langs"] == 2
    assert m["top_frac"] == 0.5
    assert m["top_lang"] == "en"  # 3-3 vote tie broken by lang asc
    assert m["mix_entropy"] == 0.693148  # 2 * round6(0.5*ln 0.5)
    assert m["mixed"]


def test_compression_ratio_planted_and_ordering(spark, tmp_path):
    """text_compression_ratio (staged r10, [R]): recompute every planted
    ratio with zlib directly — the engine's mapInPandas output must be
    byte-count exact — and pin the quality ordering the signal exists
    for: heavy repetition compresses far below natural text, which
    compresses below incompressible noise."""
    import random
    import zlib

    from pyspark.sql import functions as F

    from posts_vectorizer_spark.plans.queries_quality import _CR_LEVEL
    from posts_vectorizer_spark.plans.registry import resolve_query

    rng = random.Random(7)
    noise = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(8))
        for _ in range(40)
    )
    natural = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sailors watch from a distant harbor and argue about weather "
        "patterns in late october near the rocky coastline of maine"
    )
    docs = [
        (1, "spam spam spam " * 30, "en", "rep", 1),
        (2, natural, "en", "nat", 1),
        (3, noise, "en", "noise", 1),
        (4, "", "en", "empty", 0),
    ]
    d = tmp_path / "docs"
    d.mkdir()
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["source"]: r
        for r in resolve_query("text_compression_ratio")(
            spark, str(d)
        ).collect()
    }
    for doc_id, text, _l, src, _n in docs:
        raw = text.encode("utf-8")
        assert rows[src]["raw_bytes"] == len(raw)
        assert rows[src]["compressed_bytes"] == len(
            zlib.compress(raw, _CR_LEVEL)
        )
        if raw:
            want = round(len(zlib.compress(raw, _CR_LEVEL)) / len(raw), 6)
            assert abs(rows[src]["mean_ratio"] - want) < 1e-9
        else:
            assert rows[src]["mean_ratio"] is None  # guarded division
    assert (
        rows["rep"]["mean_ratio"]
        < rows["nat"]["mean_ratio"]
        < rows["noise"]["mean_ratio"]
    )
    assert rows["noise"]["mean_ratio"] > 0.5
    assert rows["rep"]["mean_ratio"] < 0.1


def test_rouge_lead_eval_hand_computed(spark, tmp_path):
    """text_rouge_lead_eval (staged r10): hand-computed clipped-count
    ROUGE on planted docs — a short doc (lead covers everything →
    recall 1), a long repetitive doc where clipping bites, and a
    1-token doc whose bigram metrics must be NULL with zero counts
    (the Spark sequence(1,0) descent guard)."""
    from collections import Counter

    from posts_vectorizer_spark.plans.queries_quality import _ROUGE_LEAD_K
    from posts_vectorizer_spark.plans.registry import resolve_query

    long_doc = "a b " * 40  # 80 tokens, heavy repetition
    docs = [
        (1, "alpha beta gamma", "en", "s", 1),
        (2, long_doc.strip(), "en", "s", 1),
        (3, "solo", "en", "s", 1),
    ]
    d = tmp_path / "docs"
    d.mkdir()
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(d / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in resolve_query("text_rouge_lead_eval")(
            spark, str(d)
        ).collect()
    }

    def rouge(toks, n):
        cand = toks[:_ROUGE_LEAD_K]
        if n == 2:
            toks = [" ".join(p) for p in zip(toks, toks[1:])]
            cand = [" ".join(p) for p in zip(cand, cand[1:])]
        rc, cc = Counter(toks), Counter(cand)
        overlap = sum(min(c, cc.get(g, 0)) for g, c in rc.items())
        return overlap, sum(rc.values()), sum(cc.values())

    for doc_id, text, *_ in docs:
        toks = text.split()
        o1, r1, c1 = rouge(toks, 1)
        row = rows[doc_id]
        assert (row["n1_overlap"], row["n1_ref"], row["n1_cand"]) == (
            o1, r1, c1
        )
        assert row["rouge1_recall"] == o1 / r1
        assert row["rouge1_precision"] == o1 / c1
        o2, r2, c2 = rouge(toks, 2)
        assert (row["n2_overlap"], row["n2_ref"], row["n2_cand"]) == (
            o2, r2, c2
        )
        if r2:
            assert row["rouge2_recall"] == o2 / r2
        else:
            assert row["rouge2_recall"] is None

    # short doc: lead covers all -> perfect recall & precision
    assert rows[1]["rouge1_recall"] == 1.0 == rows[1]["rouge1_precision"]
    # long repetitive doc: clipping bites -> recall < 1, precision 1
    assert rows[2]["rouge1_recall"] < 1.0
    assert rows[2]["rouge1_precision"] == 1.0
    # 1-token doc: no bigrams anywhere
    assert rows[3]["n2_ref"] == 0 and rows[3]["rouge2_recall"] is None


def test_burstiness_separates_uniform_from_bursty(spark, tmp_path):
    """text_burstiness on a planted corpus: a word spread evenly over
    every doc scores fano < 1 (sub-Poisson), a word piled into one doc
    scores fano >> 1; values match the exact integer moment algebra."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    n = 10
    rows = []
    for d in range(n):
        words = ["the"] * 2                     # uniform: 2 in EVERY doc
        if d == 0:
            words += ["spam"] * 20              # bursty: all in doc 0
        words += [f"pad{d}"]                    # below the min-total bar
        rows.append((d, " ".join(words), "en"))
    docs = make_docs(spark, rows)
    t = tmp_path / "burst"
    t.mkdir()
    docs.write.parquet(str(t / "documents.parquet"))

    out = {r["word"]: r for r in
           resolve_query("text_burstiness")(spark, str(t)).collect()}
    assert set(out) == {"the", "spam"}  # pads filtered by min-total

    def fano(counts):
        s1 = sum(counts)
        s2 = sum(c * c for c in counts)
        return (n * s2 - s1 * s1) / (s1 * (n - 1))

    the = out["the"]
    assert (the["n_docs_present"], the["total_count"]) == (n, 2 * n)
    assert the["mean_per_doc"] == 2.0
    assert the["fano"] == fano([2] * n) == 0.0  # constant -> zero variance
    spam = out["spam"]
    assert (spam["n_docs_present"], spam["total_count"]) == (1, 20)
    assert spam["fano"] == fano([20] + [0] * (n - 1))
    assert spam["fano"] > 15  # maximally bursty


def test_token_waterfill_exhaustion_and_redistribution(spark, tmp_path):
    """curation_token_waterfill against an independent Python replica
    of the integer waterfill on a fixture where one source exhausts in
    round 1 and another in round 2, forcing real redistribution."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    # supplies: a=4, b=30, c=100 tokens -> budget = 67
    sizes = {"a": 4, "b": 30, "c": 100}
    rows, did = [], 0
    for src, tok in sizes.items():
        rows.append((did, " ".join(["w"] * tok), "en", src))
        did += 1
    docs = make_docs(spark, [(i, t, lg) for i, t, lg, _ in rows])
    import pandas as pd
    pdf = docs.toPandas()
    pdf["source"] = [r[3] for r in rows]
    t = tmp_path / "wf"
    t.mkdir()
    pdf.to_parquet(t / "documents.parquet")

    out = {r["source"]: r for r in
           resolve_query("curation_token_waterfill")(
               spark, str(t)
           ).collect()}

    def waterfill(supply, budget, rounds=3):
        alloc = {s: 0 for s in supply}
        left = dict(supply)
        r = budget
        for _ in range(rounds):
            active = sorted(s for s in left if left[s] > 0)
            if not active or r <= 0:
                break
            base, rem = divmod(r, len(active))
            for rk, s in enumerate(active, 1):
                give = min(left[s], base + (1 if rk <= rem else 0))
                alloc[s] += give
                left[s] -= give
                r -= give
        return alloc, r

    budget = sum(sizes.values()) // 2
    exp_alloc, exp_left = waterfill(sizes, budget)
    assert exp_alloc == {"a": 4, "b": 30, "c": 33}  # fixture sanity
    for s in sizes:
        r = out[s]
        assert r["supply_tokens"] == sizes[s]
        assert r["allocated_tokens"] == exp_alloc[s]
        assert r["exhausted"] == (exp_alloc[s] == sizes[s])
        assert r["budget"] == budget
        assert r["budget_left"] == exp_left
    assert sum(r["allocated_tokens"] for r in out.values()) + exp_left \
        == budget


def test_rake_keywords_planted_phrases(spark, tmp_path):
    """text_rake_keywords on the RAKE paper's scoring shape: a doc
    whose stopword-delimited phrases are known; deg/freq word scores
    and phrase ranking hand-computed."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    # phrases after stopword split ("of", "and", "the", "is" are stops):
    #   "linear diophantine equations", "strict inequations",
    #   "nonstrict inequations", "solutions"
    text = ("linear diophantine equations of strict inequations and "
            "nonstrict inequations is solutions")
    t = tmp_path / "rake"
    t.mkdir()
    make_docs(spark, [(0, text, "en")]).write.parquet(
        str(t / "documents.parquet")
    )

    out = resolve_query("text_rake_keywords")(spark, str(t)).collect()
    got = {r["phrase"]: r for r in out}
    # word stats within the doc:
    #   linear/diophantine/equations: freq 1, deg 3 -> 3.0 each
    #   strict: freq 1 deg 2 -> 2; nonstrict: freq 1 deg 2 -> 2
    #   inequations: freq 2, deg 4 -> 2.0
    #   solutions: freq 1 deg 1 -> 1
    exp = {
        "linear diophantine equations": 9.0,
        "strict inequations": 4.0,
        "nonstrict inequations": 4.0,
    }
    assert len(out) == 3  # top-3 of the 4 candidates ("solutions"=1 drops)
    for ph, sc in exp.items():
        assert got[ph]["score"] == sc
        assert got[ph]["n_words"] == len(ph.split())
    assert got["linear diophantine equations"]["rank"] == 1
    # tie at 4.0 breaks alphabetically: nonstrict < strict
    assert got["nonstrict inequations"]["rank"] == 2
    assert got["strict inequations"]["rank"] == 3


def test_mattr_planted_diversity_ordering(spark, tmp_path):
    """text_mattr_diversity: degenerate repetition scores ~1/W, fully
    novel text scores 1.0, and the sliding-window values match an
    independent Python computation on a mixed doc."""
    from decimal import Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    w = 25
    novel = " ".join(f"w{i}" for i in range(60))
    degen = " ".join(["spam"] * 60)
    mixed = " ".join(f"w{i % 7}" for i in range(40))
    short = "a b c a"
    t = tmp_path / "mattr"
    t.mkdir()
    make_docs(
        spark,
        [(0, novel, "en"), (1, degen, "en"), (2, mixed, "en"),
         (3, short, "en")],
    ).write.parquet(str(t / "documents.parquet"))

    out = {r["doc_id"]: r for r in
           resolve_query("text_mattr_diversity")(spark, str(t)).collect()}
    assert out[0]["mattr"] == 1.0
    assert out[1]["mattr"] == 1 / w
    assert out[3]["n_windows"] == 1 and out[3]["mattr"] == 3 / 4

    toks = [f"w{i % 7}" for i in range(40)]
    ratios = [
        Decimal(str(round(len(set(toks[i:i + w])) / w, 9)))
        for i in range(0, 40 - w + 1)
    ]
    exp = float(sum(ratios)) / len(ratios)
    assert abs(out[2]["mattr"] - exp) < 1e-12
    assert out[2]["n_windows"] == 16
    # ordering: novel > mixed > degenerate
    assert out[0]["mattr"] > out[2]["mattr"] > out[1]["mattr"]


def test_chao1_planted_count_of_counts(spark, tmp_path):
    """text_chao1_richness: hand-built singleton/doubleton structure
    gives the textbook bias-corrected estimate."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    # 6 singletons, 2 doubletons, 1 word x5 -> S_obs 9
    text = " ".join(
        [f"s{i}" for i in range(6)] + ["d1", "d2"] * 2 + ["z"] * 5
    )
    t = tmp_path / "chao"
    t.mkdir()
    make_docs(spark, [(0, text, "en")]).write.parquet(
        str(t / "documents.parquet")
    )
    [r] = resolve_query("text_chao1_richness")(spark, str(t)).collect()
    assert (r["s_obs"], r["singletons"], r["doubletons"]) == (9, 6, 2)
    assert r["n_tokens"] == 15
    chao1 = 9 + 6 * 5 / (2 * 3)
    assert r["chao1"] == chao1
    assert r["unseen_vocab_share"] == (chao1 - 9) / chao1


def test_zipf_fit_planted_ols(spark, tmp_path):
    """text_zipf_fit on a planted corpus with KNOWN word frequencies:
    the OLS slope/intercept/r2 equal an independent Python replica of
    the 9dp-decimal-pinned algebra (ranks by freq desc then word)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    # a TRUE power law freq = 720/rank (ln-ln exactly linear, slope -1)
    freqs = {"w0": 720, "w1": 360, "w2": 240, "w3": 180, "w4": 144}
    words = [w for w, k in freqs.items() for _ in range(k)]
    docs = make_docs(spark, [(0, " ".join(words), "en")])
    t = tmp_path / "zipf"
    t.mkdir()
    docs.write.parquet(str(t / "documents.parquet"))

    row = resolve_query("text_zipf_fit")(spark, str(t)).collect()[0]
    assert row["n_words"] == 5

    def pin9(v: float) -> Decimal:
        return Decimal(repr(v)).quantize(
            Decimal("0.000000001"), ROUND_HALF_UP
        )

    pts = [
        (pin9(math.log(rk)), pin9(math.log(n)))
        for rk, (_, n) in enumerate(
            sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0])), 1
        )
    ]
    m = len(pts)

    def pinsum(vals) -> float:
        # the query re-pins each exact decimal sum to 9dp before the
        # double conversion; mirror it
        return float(
            sum(vals).quantize(Decimal("0.000000001"), ROUND_HALF_UP)
        )

    sx = pinsum(x for x, _ in pts)
    sy = pinsum(y for _, y in pts)
    sxx = pinsum(x * x for x, _ in pts)
    sxy = pinsum(x * y for x, y in pts)
    syy = pinsum(y * y for _, y in pts)
    num, den = m * sxy - sx * sy, m * sxx - sx * sx
    assert row["slope"] == num / den
    assert row["intercept"] == (sy - (num / den) * sx) / m
    assert row["r2"] == num * num / (den * (m * syy - sy * sy))
    # freq = 720/rank is exactly linear in ln-ln space: slope -1, r2 ~ 1
    # (only the 9dp pinning keeps them from being exact)
    assert abs(row["slope"] + 1.0) < 1e-6
    assert row["r2"] > 0.999999


def test_textrank_planted_graph(spark, tmp_path):
    """text_textrank_keywords on a planted two-doc corpus equals an
    independent Decimal replica of the 3-step damped iteration, and a
    hub word outranks leaves."""
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    # doc 0: star graph — "hub" adjacent to 3 distinct leaves
    #   tokens: hub a hub b hub c  -> edges hub-a, hub-b, hub-c
    # doc 1: single token (no edges -> absent from output)
    docs = make_docs(
        spark, [(0, "hub a hub b hub c", "en"), (1, "solo", "en")]
    )
    t = tmp_path / "tr"
    t.mkdir()
    docs.write.parquet(str(t / "documents.parquet"))

    out = resolve_query("text_textrank_keywords")(spark, str(t)).collect()
    assert {r["doc_id"] for r in out} == {0}
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["word"] == "hub"

    # independent replica (undirected star, deg(hub)=3, deg(leaf)=1)
    Q9 = Decimal("0.000000001")
    Q6 = Decimal("0.000001")

    def rnd(v: Decimal, q: Decimal) -> Decimal:
        return v.quantize(q, ROUND_HALF_UP)

    inv = {"hub": rnd(Decimal(1) / 3, Q9), "a": Decimal(1), "b": Decimal(1),
           "c": Decimal(1)}
    s = {w: Decimal("1.000000") for w in inv}
    neighbors = {"hub": ["a", "b", "c"], "a": ["hub"], "b": ["hub"],
                 "c": ["hub"]}
    for _ in range(3):
        nxt = {}
        for v, ns in neighbors.items():
            raw = sum(rnd(s[u] * inv[u], Q9) for u in ns)
            nxt[v] = rnd(
                Decimal("0.15") + Decimal("0.85") * raw, Q6
            )
        s = nxt
    got = {r["word"]: r["score"] for r in out}
    # top-3 of 4 nodes: hub + 2 of the tied leaves (a, b by word order)
    assert got == {
        "hub": float(s["hub"]), "a": float(s["a"]), "b": float(s["b"])
    }


def test_token_gini_planted_lengths(spark, tmp_path):
    """text_token_gini on planted doc lengths equals the classic
    rank-formula Gini (sum((2i-n-1)x_i)/(n*sum x), ascending), proving
    the value-grid device computes the same statistic without the
    sort; ties included."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    lengths = [1, 1, 2, 5, 5, 10]
    docs = make_docs(
        spark,
        [(i, " ".join(["w"] * n), "en") for i, n in enumerate(lengths)],
    )
    t = tmp_path / "gini"
    t.mkdir()
    docs.write.parquet(str(t / "documents.parquet"))

    row = resolve_query("text_token_gini")(spark, str(t)).collect()[0]
    n, total = len(lengths), sum(lengths)
    xs = sorted(lengths)
    t_rank = sum(i * x for i, x in enumerate(xs, 1))
    classic = sum((2 * i - n - 1) * x for i, x in enumerate(xs, 1)) / (
        n * total
    )
    assert row["n_docs"] == n
    assert row["total_tokens"] == total
    assert row["mean_tokens"] == total / n
    # 2T/(nS) - (n+1)/n with T = sum(i*x_i) is algebraically the classic
    # form; both evaluated here to guard the identity itself
    assert abs(row["gini"] - classic) < 1e-12
    assert row["gini"] == 2 * t_rank / (n * total) - (n + 1) / n


def test_ngram_novelty_planted_copies(spark, tmp_path):
    """text_ngram_novelty: the first doc of a template pair gets
    novelty 1.0, its verbatim copy 0.0, and a fresh doc 1.0 — the
    dedup-failure signal the query exists for; counts hand-checked."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    a = "alpha beta gamma delta epsilon zeta"
    docs = make_docs(
        spark,
        [(0, a, "en"), (1, a, "en"), (2, "one two three four five", "en")],
    )
    t = tmp_path / "nov"
    t.mkdir()
    docs.write.parquet(str(t / "documents.parquet"))

    out = {r["doc_id"]: r for r in
           resolve_query("text_ngram_novelty")(spark, str(t)).collect()}
    # 6 tokens -> 4 trigrams, all distinct
    assert out[0]["n_grams"] == out[0]["n_distinct"] == 4
    assert out[0]["n_novel"] == 4 and out[0]["novelty"] == 1.0
    assert out[1]["n_novel"] == 0 and out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0


def test_transition_entropy_planted_chains(spark, tmp_path):
    """events_transition_entropy: a deterministic cycle scores
    predictability 1 (H_cond = 0); i.i.d.-shuffled types score near 0;
    the conditional entropy matches an independent replica."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query

    def write(d, types):
        rows = [
            (i + 1, f"2024-01-01 {i // 3600:02d}:{(i // 60) % 60:02d}:"
                    f"{i % 60:02d}", 1, t, 1.0, "{}")
            for i, t in enumerate(types)
        ]
        d.mkdir()
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
            "event_type", "value", "props"
        ).write.parquet(str(d / "events.parquet"))

    cycle = ["a", "b", "c"] * 40
    write(tmp_path / "det", cycle)
    r = resolve_query("events_transition_entropy")(
        spark, str(tmp_path / "det")
    ).collect()[0]
    assert r["n_states"] == 3 and r["h_cond"] == 0.0
    assert r["predictability"] == 1.0

    mixed = [["a", "b", "c"][(i * i + i // 7) % 3] for i in range(120)]
    write(tmp_path / "iid", mixed)
    r2 = resolve_query("events_transition_entropy")(
        spark, str(tmp_path / "iid")
    ).collect()[0]
    assert r2["predictability"] < 0.2

    # replica of the 9dp-pinned conditional entropy
    trans = Counter(zip(mixed, mixed[1:]))
    ni = Counter(); N = sum(trans.values())
    for (i, _), c in trans.items():
        ni[i] += c
    Q9 = Decimal("0.000000001")
    hc_n = float(sum(
        Decimal(repr(-(c * math.log(c / ni[i])))).quantize(
            Q9, ROUND_HALF_UP
        )
        for (i, _), c in trans.items()
    ))
    assert r2["h_cond"] == hc_n / N


def test_jsd_source_drift_planted(spark, tmp_path):
    """text_jsd_source_drift: a source matching the corpus mix scores
    ~0; two maximally divergent sources score equal positive JSD
    (symmetry of the construction), below the ln2 bound, and match an
    independent float replica of the closed-form algebra."""
    import math

    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    # make_docs assigns source = src{doc_id % 3}: src0 (only 'xx') and
    # src1 (only 'yy') are maximally divergent, equal sizes; src2
    # mirrors the global 50/50 mix exactly
    docs = make_docs(
        spark,
        [
            (0, "xx xx xx xx", "en"),
            (1, "yy yy yy yy", "en"),
            (2, "xx yy xx yy", "en"),
        ],
    )
    d = tmp_path / "jsd"
    d.mkdir()
    docs.write.parquet(str(d / "documents.parquet"))

    rows = {
        r["source"]: r
        for r in resolve_query("text_jsd_source_drift")(
            spark, str(d)
        ).collect()
    }
    assert set(rows) == {"src0", "src1", "src2"}
    assert all(r["n_tokens"] == 4 for r in rows.values())
    # src2 matches the mix -> 0 (exactly: every log argument is 1)
    assert abs(rows["src2"]["jsd"]) < 1e-9
    # src0 and src1 are symmetric and positive, below ln 2
    assert rows["src0"]["jsd"] == rows["src1"]["jsd"]
    assert 0 < rows["src0"]["jsd"] < math.log(2)

    # independent float replica for src0: counts a={xx:4}, global
    # g={xx:6,yy:6}, NA=4, NG=12
    NA, NG = 4, 12
    s1 = 4 * math.log(2 * 4 * NG / (4 * NG + 6 * NA))
    s2 = 6 * math.log(2 * 6 * NA / (4 * NG + 6 * NA))
    gs = 6
    want = 0.5 * (s1 / NA + s2 / NG + (NG - gs) / NG * math.log(2))
    assert abs(rows["src0"]["jsd"] - want) < 1e-8


def test_heaps_law_planted_growth(spark, tmp_path):
    """text_heaps_law_fit: a corpus where every doc introduces only new
    words fits beta = 1 with r² = 1 (V grows one-for-one with n); a
    corpus whose vocabulary saturates after the first doc fits a much
    smaller beta."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    # 20 docs x 10 fresh words each -> V(n) = n exactly
    fresh = make_docs(
        spark,
        [
            (i, " ".join(f"w{i}_{j}" for j in range(10)), "en")
            for i in range(20)
        ],
    )
    d1 = tmp_path / "fresh"
    d1.mkdir()
    fresh.write.parquet(str(d1 / "documents.parquet"))
    r = resolve_query("text_heaps_law_fit")(spark, str(d1)).collect()[0]
    assert r["n_checkpoints"] >= 5
    assert abs(r["beta"] - 1.0) < 1e-6
    assert abs(r["ln_k"]) < 1e-6  # V = n exactly -> K = 1
    assert r["r2"] > 0.999999

    # saturated: same 10 words in every doc -> V flat after doc 0
    flat = make_docs(
        spark,
        [
            (i, " ".join(f"v{j}" for j in range(10)), "en")
            for i in range(20)
        ],
    )
    d2 = tmp_path / "flat"
    d2.mkdir()
    flat.write.parquet(str(d2 / "documents.parquet"))
    r2 = resolve_query("text_heaps_law_fit")(spark, str(d2)).collect()[0]
    assert abs(r2["beta"]) < 1e-6  # V constant -> slope 0


def test_vocab_gini_hand_computed_and_drain_equals_batch(spark, tmp_path):
    """text_vocab_gini on a 4-type planted vocabulary (a=4, b=2, c=1,
    d=1): T = 1*(2*0+3) + 2*(1*2+1) + 4*(1*3+1) = 25, so gini =
    2*25/(4*8) - 5/4 = 0.3125 exactly (cross-checked against the
    direct sorted-rank formula sum((2i-n-1)x_i)/(n*S1) = 10/32); a
    perfectly flat vocabulary (every type exactly twice) pins gini to
    exactly 0. The drain's merged-state readout must equal the batch
    query bit-for-bit: word counts are additive, so the forced
    two-batch split cannot move a count-of-counts cell."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "vg"
    d.mkdir()
    spark.createDataFrame(
        [(1, "a a a b b c", "en", "s", 0), (2, "a d", "en", "s", 0)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    [r] = resolve_query("text_vocab_gini")(spark, str(d)).collect()
    assert (r["n_types"], r["total_tokens"]) == (4, 8)
    assert r["mean_freq"] == 2.0
    assert r["gini"] == 2 * 25 / (4 * 8) - 5 / 4

    [rd] = resolve_query("stream_vocab_gini_drain")(
        spark, str(d)
    ).collect()
    assert rd.asDict() == r.asDict()

    flat = tmp_path / "vgflat"
    flat.mkdir()
    spark.createDataFrame(
        [(1, "a b a b", "en", "s", 0), (2, "c d c d", "en", "s", 0)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(flat / "documents.parquet"))
    [rf] = resolve_query("text_vocab_gini")(spark, str(flat)).collect()
    assert rf["gini"] == 0.0 and rf["n_types"] == 4
