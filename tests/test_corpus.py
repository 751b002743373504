"""Tests for the corpus-index wave 5 (plans/queries_corpus.py): known
posting-list fingerprints, PMI sign for planted collocations, boilerplate
fraction on duplicated chunks, hand-computable projections, exact split
reproduction, and Q17 threshold semantics on a planted part. The
value-exactness check is the DuckDB oracle (tools/oracle_check.py); these
pin semantics the hash can't express."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from posts_vectorizer_spark.functions.text import HASH_MOD
from posts_vectorizer_spark.plans.queries_corpus import FOLD_B
from tests.conftest import SF_SMOKE, make_docs


def test_inverted_index_fingerprint_and_counts(spark, tmp_path):
    docs = make_docs(
        spark,
        [
            (3, "apple banana apple", "en"),
            (7, "banana cherry", "en"),
            (9, "apple", "en"),
        ],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["word"]: r
        for r in E.queries()["text_inverted_index"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["apple"]["df"] == 2 and out["apple"]["cf"] == 3
    assert out["banana"]["df"] == 2 and out["banana"]["cf"] == 2
    assert out["cherry"]["df"] == 1

    def fold(ids):
        acc = 0
        for d in ids:
            acc = (acc * FOLD_B + d % HASH_MOD) % HASH_MOD
        return acc

    assert out["apple"]["postings_fp"] == fold([3, 9])
    assert out["banana"]["postings_fp"] == fold([3, 7])


def test_pmi_sign_for_planted_collocation(spark, tmp_path):
    # "zig zag" always adjacent (positive association); "aa"/"bb" occur
    # equally often but never adjacent to each other except rarely.
    rows = [(i, "zig zag aa bb", "en") for i in range(6)]
    docs = make_docs(spark, rows)
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["w1"], r["w2"]): r
        for r in E.queries()["text_pmi_bigrams"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("zig", "zag")]["c_ab"] == 6
    # perfectly-predictive bigram -> PMI > 0
    assert out[("zig", "zag")]["pmi"] > 0


def test_chunk_boilerplate_fraction(spark, tmp_path):
    # docs 1 and 2 are byte-identical 16-token docs (2 chunks each, all
    # repeated); doc 3 is a unique 8-token doc (1 chunk, unrepeated).
    dup = " ".join(f"w{i}" for i in range(16))
    uniq = " ".join(f"u{i}" for i in range(8))
    docs = make_docs(spark, [(1, dup, "en"), (2, dup, "en"), (3, uniq, "en")])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in E.queries()["text_chunk_boilerplate"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["boiler_frac"] == 1.0
    assert out[2]["boiler_frac"] == 1.0
    assert out[3]["n_chunks"] == 1 and out[3]["n_boiler"] == 0
    assert out[3]["boiler_frac"] == 0.0


def _proj_sign(d1: int, k: int) -> float:
    """Independent Python derivation of the ±1 projection matrix entry
    (d1 is the 1-based embedding dim): bit 16 of m²·12289 for the combined
    index m = d1·73 + (k+1)·1009."""
    m = d1 * 73 + (k + 1) * 1009
    return 1.0 if ((m * m * 12289) // 65536) % 2 == 0 else -1.0


def test_random_projection_unit_vector(spark, tmp_path):
    # e_0 (1 in dim 0): proj_k must equal the sign-matrix entry for
    # (d1=1, k), recomputed independently in Python.
    from pyspark.sql import types as ST

    schema = ST.StructType(
        [
            ST.StructField("vec_id", ST.LongType()),
            ST.StructField("embedding", ST.ArrayType(ST.FloatType())),
            ST.StructField("label", ST.IntegerType()),
        ]
    )
    emb = spark.createDataFrame(
        [(1, [1.0] + [0.0] * 63, 0)], schema=schema
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r["k"]: r["proj"]
        for r in E.queries()["sim_random_projection"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 8
    for k, v in out.items():
        assert v == _proj_sign(1, k)


def test_random_projection_signs_are_not_degenerate():
    # Regression pin for the rank-1 collapse: the original linear parity
    # (d*73 + k*179) made every k-row the complement or copy of row 0, so
    # all 8 projections were ±one number. The quadratic mix must keep the
    # sign matrix full-rank with pairwise row correlations near the
    # 1/sqrt(64) random baseline.
    import numpy as np

    signs = np.array(
        [[_proj_sign(d1, k) for d1 in range(1, 65)] for k in range(8)]
    )
    gram = signs @ signs.T / 64
    off = np.abs(gram[~np.eye(8, dtype=bool)])
    assert np.linalg.matrix_rank(signs) == 8
    assert off.max() < 0.5


def test_split_assign_reproduces_python_arithmetic(spark):
    import pandas as pd

    out = {
        r["split"]: r["n_docs"]
        for r in E.queries()["rel_split_assign"](spark, SF_SMOKE).collect()
    }
    pdf = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    expected = {"train": 0, "val": 0, "test": 0}
    for d in pdf["doc_id"]:
        h = (int(d) * 40_503 + 7_919) % HASH_MOD % 100
        expected["train" if h < 80 else "val" if h < 90 else "test"] += 1
    assert out == {k: v for k, v in expected.items() if v}
    assert sum(out.values()) == len(pdf)


def test_subquery_correlated_threshold_semantics(spark, tmp_path):
    # One Brand#1 part with quantities [1, 10, 10, 10]: avg = 7.75, so only
    # qty 1 < 0.2*avg... no — 0.2*7.75 = 1.55, qty 1 qualifies (5*1*4=20 <
    # 31 = sum). A second part (other brand) must not appear at all.
    import pandas as pd

    pd.DataFrame(
        {
            "p_partkey": [100, 200],
            "p_name": ["a", "b"],
            "p_brand": ["Brand#1", "Brand#2"],
            "p_type": ["t", "t"],
            "p_size": [1, 1],
            "p_retailprice": [1.0, 1.0],
        }
    ).to_parquet(tmp_path / "part.parquet")
    pd.DataFrame(
        {
            "l_partkey": [100, 100, 100, 100, 200],
            "l_quantity": [1.0, 10.0, 10.0, 10.0, 1.0],
            "l_extendedprice": [42.50, 1.0, 1.0, 1.0, 9.0],
        }
    ).to_parquet(tmp_path / "lineitem.parquet")
    rows = E.queries()["rel_subquery_correlated"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["l_partkey"] == 100
    assert r["n_small"] == 1
    assert r["small_revenue"] == pytest.approx(42.50)


def test_jsd_source_divergence_bounds(spark, tmp_path):
    """text_jsd_source_divergence (staged r7) analytic anchors: two
    sources with IDENTICAL unigram distributions have JSD exactly 0;
    disjoint-vocabulary sources hit the ln 2 upper bound (0.693147 at
    the 6dp output rounding); a partial overlap lands strictly between."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    rows = [
        (1, "alpha beta beta gamma", "en", "sA", 21),
        (2, "alpha beta beta gamma", "en", "sB", 21),
        (3, "delta epsilon zeta eta", "en", "sC", 22),
        (4, "alpha beta delta delta", "en", "sD", 22),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["source_a"], r["source_b"]): r
        for r in resolve_query("text_jsd_source_divergence")(
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 6  # C(4,2) source pairs
    assert out[("sA", "sB")]["jsd"] == 0.0
    assert out[("sA", "sB")]["n_shared_words"] == 3
    assert out[("sA", "sC")]["jsd"] == 0.693147
    assert out[("sA", "sC")]["n_shared_words"] == 0
    # hand-computed partial overlap: sA = {alpha:.25, beta:.5, gamma:.25},
    # sD = {alpha:.25, beta:.25, delta:.5}; shared terms: alpha 0,
    # beta .25*ln(4/3) + .125*ln(2/3) = .02123736; tails: .5*ln2*.25
    # (gamma) + .5*ln2*.5 (delta) = .08664340 + .17328680 -> 0.281168
    assert out[("sA", "sD")]["jsd"] == 0.281168
    assert 0.0 < out[("sA", "sD")]["jsd"] < 0.693147


def _write_docs(spark, d, texts):
    rows = [
        (i + 1, t, "en", "src", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(d / "documents.parquet"))


def test_kneser_ney_hand_computed(spark, tmp_path):
    """text_kneser_ney_bigram (staged r9): two-doc corpus {"a b", "a c"}
    gives p_KN(b|a) = (1-0.75)/2 + (0.75*2/2)*(1/2) = 0.5 exactly —
    each doc's one transition scores log10(0.5)."""
    import math

    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "kn1"
    d.mkdir()
    _write_docs(spark, d, ["a b", "a c"])
    rows = resolve_query("text_kneser_ney_bigram")(spark, str(d)).collect()
    assert len(rows) == 2
    want = round(math.log10(0.5), 6)
    for r in rows:
        assert r["n_transitions"] == 1
        assert abs(r["kn_logprob"] - want) < 1e-9


def test_kneser_ney_continuation_beats_frequency(spark, tmp_path):
    """The property that distinguishes KN from add-k: a word completing
    MANY contexts ("b" after a, c, d) carries more continuation mass
    than an equally-frequent-after-"a" word seen in one context ("e"),
    so doc "a b" must outscore doc "a e" even though c(a,b) = c(a,e).
    Hand-computed: p(b|a) = 0.6875 vs p(e|a) = 0.3125. Single-token and
    empty docs produce no transitions and are absent."""
    from posts_vectorizer_spark.plans.registry import resolve_query

    d = tmp_path / "kn2"
    d.mkdir()
    _write_docs(spark, d, ["a b", "c b", "d b", "a e", "solo", ""])
    by_doc = {
        r["doc_id"]: r
        for r in resolve_query("text_kneser_ney_bigram")(
            spark, str(d)
        ).collect()
    }
    assert set(by_doc) == {1, 2, 3, 4}, "no-transition docs are absent"
    import math

    assert abs(by_doc[1]["kn_logprob"] - round(math.log10(0.6875), 6)) < 1e-9
    assert abs(by_doc[4]["kn_logprob"] - round(math.log10(0.3125), 6)) < 1e-9
    assert by_doc[1]["kn_logprob"] > by_doc[4]["kn_logprob"]


def test_dunning_llr_hand_computed(spark, tmp_path):
    """text_dunning_llr on a two-doc planted corpus small enough to
    hand-build the full bigram contingency: ab=5, ba=4, ac=5, ca=4
    (N=18). Only ab and ac pass the count floor; each G2 term is
    verified against an exact replica of the round-9 plogp lattice,
    and assoc separates the positive association (k11*N > r*c)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    rows = [
        (1, "a b a b a b a b a b", "en"),   # ab x5, ba x4
        (2, "a c a c a c a c a c", "en"),   # ac x5, ca x4
    ]
    d = tmp_path / "llr"
    d.mkdir()
    make_docs(spark, rows).write.parquet(str(d / "documents.parquet"))

    out = {
        (r["w1"], r["w2"]): r
        for r in resolve_query("text_dunning_llr")(spark, str(d)).collect()
    }
    # ba/ca have c_ab = 4 < 5: dropped by the count floor
    assert set(out) == {("a", "b"), ("a", "c")}

    q9 = Decimal("0.000000001")

    def t(k, row, col, n=18):
        if k == 0:
            return Decimal(0)
        return Decimal(repr(k * math.log(k * n / (row * col)))).quantize(
            q9, rounding=ROUND_HALF_UP
        )

    # ab: k11=5, r(a)=10, c(b)=5 -> k12=5, k21=0, k22=8
    want = 2 * (t(5, 10, 5) + t(5, 10, 13) + t(0, 8, 5) + t(8, 8, 13))
    rab = out[("a", "b")]
    assert rab["c_ab"] == 5 and rab["assoc"] == 1   # 5*18 > 10*5
    assert rab["llr"] == want
    # ac is the mirror image: same margins, same llr
    assert out[("a", "c")]["llr"] == want
    assert want > 0


def test_stream_llr_drain_equals_batch(spark, tmp_path):
    """stream_llr_drain's merged-state readout must equal the batch
    query exactly: bigram counts are additive, so the forced
    two-batch split cannot move a margin, a floor decision, or a
    pinned plogp term. Fixture is the hand-computed LLR corpus plus
    extra docs so both halves of the drain carry bigrams."""
    from posts_vectorizer_spark.plans.registry import resolve_query
    from tests.conftest import make_docs

    rows = [
        (i, "a b a b a b a b a b" if i % 2 else "a c a c a c a c a c",
         "en")
        for i in range(8)
    ]
    d = tmp_path / "llrd"
    d.mkdir()
    make_docs(spark, rows).write.parquet(str(d / "documents.parquet"))

    batch = sorted(
        (r.asDict() for r in
         resolve_query("text_dunning_llr")(spark, str(d)).collect()),
        key=lambda r: (r["w1"], r["w2"]),
    )
    drain = sorted(
        (r.asDict() for r in
         resolve_query("stream_llr_drain")(spark, str(d)).collect()),
        key=lambda r: (r["w1"], r["w2"]),
    )
    assert batch and drain == batch
