"""[R] checks for MLlib-backed alternates: validated against the engine's
portable (oracle-checked) implementations instead of DuckDB."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from posts_vectorizer_spark.operators import dedup, mllib_alt, tfidf
from posts_vectorizer_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_minhash_lsh_agrees_with_portable_on_high_jaccard(spark):
    """MLlib approxSimilarityJoin (threshold 0.8) must recover the pairs the
    portable path verifies as STRONGLY similar (word-set jaccard >= 0.9).

    The 0.1 margin is structural: the fixture vocabulary is only ~31 words,
    so word-set jaccard is degenerate (most doc pairs sit in the 0.8-0.85
    grey zone) and MLlib's HashingTF collisions shift boundary pairs; only
    well-above-threshold recall is a meaningful contract for an
    approximate method."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    strong = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_near_dups(docs, 0.9).collect()
    }
    assert strong, "fixture should contain strongly-similar pairs"
    ml = {
        (r.doc_a, r.doc_b)
        for r in mllib_alt.minhash_lsh_near_dups(docs, 0.8).collect()
    }
    missed = strong - ml
    assert len(missed) <= max(1, len(strong) // 50), (
        f"MLlib missed {len(missed)}/{len(strong)} strong pairs"
    )


def test_summarizer_wide_matches_long_form(spark):
    """A8 wide form (Summarizer.sum over scaled vectors) equals the
    oracle-checked long form within float tolerance."""
    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    wide = {
        r.doc_id: np.array(r.doc_vector)
        for r in mllib_alt.doc_vectors_wide(docs, emb, "en").collect()
    }
    long_rows = tfidf.doc_vectors(docs, emb, "en").collect()
    long = {}
    for r in long_rows:
        long.setdefault(r.doc_id, {})[r.dim] = r.component
    assert set(wide) == set(long)
    for doc_id, vec in wide.items():
        expected = np.array([long[doc_id][d] for d in range(len(vec))])
        assert np.allclose(vec, expected, atol=2e-6), doc_id
