"""MLlib-backed alternates ([R]-checked — library internals aren't
oracle-expressible, so these are validated against the engine's portable
implementations in tests/ instead of DuckDB).

BASELINE.json's north star: "MLlib for batch embedding generation". The
engine's primary paths are pure DataFrame plans (oracle-checkable); these
alternates exist because at cluster scale the MLlib implementations bring
tuned internals (MinHashLSH's banded OR-amplification, Summarizer's
one-pass vector moments) and the standard Pipeline API.

NOTE the deliberate absence: MLlib's ``IDF`` is NOT used anywhere — it
computes document-frequency IDF with natural log and smoothing, which
contradicts the reference's collection-frequency log10 semantics (quirk Q2,
/root/reference/tfidf-calculator/calculate_idf_scores.py:48-50,75). The
engine's IDF stays the literal formula in operators/tfidf.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T


def minhash_lsh_near_dups(
    documents: DataFrame,
    jaccard_threshold: float = 0.5,
    num_hash_tables: int = 8,
    vocab_size: int = 1 << 18,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) near-dup pairs via MLlib MinHashLSH
    approxSimilarityJoin over hashed token-set vectors.

    Same algorithm as operators/dedup.minhash_near_dups (portable version);
    MLlib's murmur-based hashing isn't reproducible in DuckDB, hence [R].
    HashingTF(binary=True) gives the set-membership sparse vector; distCol
    is Jaccard DISTANCE, converted back to similarity.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from ..cache import persist_tracked
    from ..sources import spread

    # r12: rebalance the single-split scan before tokenize+HashingTF
    # (guide §2.5), and project the join input down to (doc_id, features)
    # BEFORE approxSimilarityJoin (guide §2.3): MLlib's join explodes
    # each row once per hash table and shuffles whole rows, so the token
    # array would otherwise cross the exchange num_hash_tables times per
    # side. The projected relation is persisted — the self-join consumes
    # it twice. NOTE (scale): MinHashLSH's OR-amplification uses 1-row
    # bands, so on unigram token sets nearly every doc pair shares some
    # min-hash and the candidate set is ~n² at this threshold — the
    # engine's banded portable implementation (operators/dedup.py,
    # 4-row bands) is the production path; this [R] alternate witnesses
    # the library API, eval-sized by convention.
    toks = spread(documents).select(
        "doc_id", T.tokens("text").alias("tokens")
    ).where(F.size("tokens") > 0)
    tf = persist_tracked(
        HashingTF(
            inputCol="tokens", outputCol="features",
            numFeatures=vocab_size, binary=True,
        )
        .transform(toks)
        .select("doc_id", "features")
    )
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables)
    model = lsh.fit(tf)
    joined = model.approxSimilarityJoin(
        tf, tf, threshold=1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


def doc_vectors_wide(
    documents: DataFrame, embeddings: DataFrame, lang: str = "en"
) -> DataFrame:
    """(doc_id, doc_vector: array<double>) — the A8 weighted sum in WIDE form
    via Summarizer.sum over tf·idf-scaled MLlib vectors (SURVEY.md §2.4 A8
    wide path). One pass, no dim explosion; validated against the long-form
    oracle query in tests/test_mllib_alt.py."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    from . import tfidf

    docs = documents.where(F.col("lang") == lang).where(tfidf.needs_vector("doc_id"))
    tf = tfidf.term_frequency(docs)
    wv = tfidf.word_vectors(documents, embeddings, lang)
    scaled = (
        tf.join(F.broadcast(wv), "word")
        .select(
            "doc_id",
            array_to_vector(
                F.transform(
                    "embedding",
                    lambda v: v.cast("double") * F.col("tf") * F.col("idf"),
                )
            ).alias("scaled"),
        )
    )
    return (
        scaled.groupBy("doc_id")
        .agg(Summarizer.sum(F.col("scaled")).alias("vec"))
        .select("doc_id", vector_to_array("vec").alias("doc_vector"))
    )
