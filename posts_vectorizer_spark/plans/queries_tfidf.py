"""TF-IDF pipeline queries — the reference's core capability surface.

Covers SURVEY.md §2 ids: S1, P1, P2(Q1), P6, P8, A1-A10, J1-J5, W1/W2, F1-F7,
F11, U1 — each exercised inside a realistic pipeline query rather than as
isolated toys where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import tfidf
from ..sources import load_table
from .registry import register


@register("tfidf_doc_vectors", oracle=tfidf.doc_vectors_sql("en"))
def tfidf_doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TF-IDF-weighted doc vectors in long form (A8; worker.py:76-94
    redesign per SURVEY.md §3.1). Includes Q1 flag filter, Q2/Q3 IDF, Q5
    tokenizer."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return tfidf.doc_vectors(docs, emb, "en")


@register("tfidf_doc_profile", oracle=tfidf.doc_profile_sql("en"))
def tfidf_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """known_tokens_ratio per doc (Q4: distinct-known ÷ total-occurrences;
    worker.py:52,84,91) + Q8 has_vector marker."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf.doc_profile(docs, "en")


@register("tfidf_idf_table", oracle=tfidf.idf_table_sql("en"))
def tfidf_idf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF batch job (calculate_idf_scores.py redesign, SURVEY.md §3.2):
    collection-frequency IDF (Q2), sentinel + global-min replacement (Q3),
    left join for zero-occurrence vocab (J3), window min (W2/J5)."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf.idf_table(docs, "en")


@register(
    "tfidf_term_frequency",
    oracle=f"SELECT * FROM ({tfidf.TERM_FREQUENCY_SQL})",
)
def tfidf_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, word) TF with guarded normalization (A3/A4/W1 via join;
    worker.py:33-52)."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf.term_frequency(docs)


@register("tfidf_vocabulary", oracle=tfidf.VOCABULARY_SQL)
def tfidf_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary load (enter_wordvecs.py:34-44 analog): distinct corpus
    words + length gate (P5/F5) + dictionary extras (U1 union)."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf.vocabulary(docs)


@register(
    "tfidf_oov_tokens",
    oracle=f"""
SELECT DISTINCT word FROM ({tfidf.TOKENS_SQL})
WHERE word NOT IN (SELECT word FROM ({tfidf.VOCABULARY_SQL}))
""",
)
def tfidf_oov_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary tokens via LEFT ANTI join (J4) — the tokens the
    worker skips at worker.py:80-81."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tfidf.doc_tokens(docs).select("word").distinct()
    vocab = tfidf.vocabulary(docs)
    return toks.join(F.broadcast(vocab), "word", "left_anti")


@register(
    "tfidf_candidates",
    oracle=f"""
SELECT doc_id, lang, ({tfidf.VECTORIZED_FLAG_SQL}) AS vectorized
FROM documents
WHERE {tfidf.NEEDS_VECTOR_SQL}
""",
)
def tfidf_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work-queue scan (worker.py:96-108): flag IS DISTINCT FROM TRUE matches
    false AND missing (P2 / quirk Q1) with projection pushdown (P1)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "lang", tfidf.vectorized_flag("doc_id").alias("vectorized"))
        .where(tfidf.needs_vector("doc_id"))
    )


from ..functions import text as T  # noqa: E402


@register(
    "tfidf_corpus_stats",
    oracle=f"""
WITH d AS (SELECT lang, {T.token_count_sql('text')} AS n_tokens FROM documents)
SELECT CAST(count(*) FILTER (WHERE lang = 'en'
             AND n_tokens >= {tfidf.ELIGIBLE_MIN_TOKENS}) AS BIGINT) AS n_eligible_docs,
       CAST(count(*) AS BIGINT) AS n_total_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_total_tokens
FROM d
""",
)
def tfidf_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus counts in one distributed pass (A1/A2: filtered + global counts;
    calculate_idf_scores.py:74, worker.py:100-104) — conditional aggregation,
    no driver-side collect."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("lang", T.token_count("text").alias("n_tokens"))
    return d.agg(
        F.count(
            F.when(
                (F.col("lang") == "en")
                & (F.col("n_tokens") >= tfidf.ELIGIBLE_MIN_TOKENS),
                F.lit(1),
            )
        ).alias("n_eligible_docs"),
        F.count("*").alias("n_total_docs"),
        F.sum("n_tokens").cast("long").alias("n_total_tokens"),
    )
