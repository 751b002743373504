"""Quirk goldens (SURVEY.md §5.2-3): hand-computed fixtures locking the
reference behaviors a naive rewrite gets wrong (§2.9 Q1-Q5, Q8)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from posts_vectorizer_spark.operators import tfidf
from tests.conftest import make_docs


def test_q1_flag_filter_matches_false_and_missing(spark):
    """worker.py:99 — $ne:True matches false AND missing; doc_id%3 derives
    true(0)/false(1)/NULL(2)."""
    docs = make_docs(spark, [(i, "x y", "en") for i in range(9)])
    kept = sorted(
        r.doc_id for r in docs.where(tfidf.needs_vector("doc_id")).collect()
    )
    assert kept == [1, 2, 4, 5, 7, 8]  # %3==0 (flag true) excluded


def test_q2_collection_frequency_not_doc_frequency(spark):
    """calculate_idf_scores.py:48-50 — a word 3x in one doc counts 3.
    Doc-frequency IDF would give log10(2/1) for 'rep'; collection frequency
    gives log10(2/3)."""
    docs = make_docs(
        spark,
        [
            (1, "rep rep rep base " + "pad " * 12, "en"),
            (2, "base other word here " + "pad " * 12, "en"),
        ],
    )
    idf = {r.word: r for r in tfidf.idf_table(docs, "en").collect()}
    assert idf["rep"].occurrences == 3  # not 1 (doc count)
    # log10(2/3) < 0 -> replaced by global min (Q3), so check via occurrences
    # and the raw formula on a positive-idf word:
    assert math.isclose(idf["other"].idf, math.log10(2 / 1), rel_tol=1e-12)


def test_q3_sentinel_and_global_min_replacement(spark):
    """calculate_idf_scores.py:74-77 — zero-occurrence vocab words get
    sentinel -1; every idf <= 0 is replaced by the min over
    sentinel-INCLUDED values. With a word at 11 occurrences in a 1-doc
    corpus, log10(1/11) ≈ -1.0414 < -1, so the min is the GENUINE negative,
    not the sentinel."""
    docs = make_docs(
        spark,
        [(1, ("hot " * 11) + "word two three four", "en")],
    )
    idf = {r.word: r for r in tfidf.idf_table(docs, "en").collect()}
    expected_min = math.log10(1 / 11)
    # dictionary extras never occur -> sentinel path -> replaced by min
    for extra in tfidf.DICTIONARY_EXTRAS:
        assert math.isclose(idf[extra].idf, expected_min, rel_tol=1e-12)
    # the genuine negative keeps its own value (it IS the min)
    assert math.isclose(idf["hot"].idf, expected_min, rel_tol=1e-12)
    # positive idf untouched: log10(1/1) = 0 is NOT positive -> replaced too
    assert math.isclose(idf["word"].idf, expected_min, rel_tol=1e-12)


def test_q4_ratio_distinct_over_total(spark):
    """worker.py:52,84,91 — numerator = distinct vocab tokens, denominator =
    total occurrences incl. OOV ('a' is OOV via the length gate)."""
    docs = make_docs(spark, [(2, "big big table a a a", "en")])
    prof = tfidf.doc_profile(docs, "en").collect()[0]
    assert prof.known_tokens == 2  # {big, table} distinct
    assert prof.total_tokens == 6  # all occurrences incl. 'a'
    assert math.isclose(prof.known_tokens_ratio, 2 / 6, rel_tol=1e-6)


def test_q5_tokenizer_keeps_punctuation_lowercases(spark):
    """worker.py:35-50 — only lowercasing; punctuation-ish tokens survive
    and count in the TF denominator."""
    docs = make_docs(spark, [(2, "Hello , , WORLD hello", "en")])
    tf = {
        (r.word): (r.cnt, r.total_tokens, r.tf)
        for r in tfidf.term_frequency(docs).collect()
    }
    assert tf["hello"] == (2, 5, 2 / 5)
    assert tf[","] == (2, 5, 2 / 5)
    assert tf["world"] == (1, 5, 1 / 5)


def test_q8_zero_token_docs(spark):
    """worker.py:38-39,90-91 — empty text: ratio 0.0, no vector rows, doc
    still present in the profile (the job flag would still be set)."""
    docs = make_docs(spark, [(2, "", "en"), (5, "big table scan", "en")])
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 3) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    )
    prof = {r.doc_id: r for r in tfidf.doc_profile(docs, "en").collect()}
    assert prof[2].total_tokens == 0
    assert prof[2].known_tokens_ratio == 0.0
    assert prof[2].has_vector is False
    vecs = tfidf.doc_vectors(docs, emb, "en")
    assert vecs.where(F.col("doc_id") == 2).count() == 0
    assert vecs.where(F.col("doc_id") == 5).count() == 2  # dims of the 2-d fixture
