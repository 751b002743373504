"""posts_vectorizer_spark — a PySpark-native analytics engine.

Ground-up, Spark-first re-expression of the capabilities of
hive-discover/posts-vectorizer (see /root/reference, surveyed in SURVEY.md):
TF-IDF document vectorization, corpus IDF jobs, vocabulary management, plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal columns,
text analysis) — all declared through the DataFrame/SQL API so Catalyst and
Tungsten pick the physical strategy.

Layout:
    session.py    — tuned SparkSession builder for local and cluster use
    sources/      — table catalog, readers, sinks (parquet merge-upsert)
    functions/    — portable column expressions (text, hashing, vectors)
    operators/    — composite operators (tfidf, dedup, similarity, text stats)
    plans/        — the query registry: every (spark_fn, oracle_sql) pair
    streaming/    — structured-streaming worker (micro-batch vectorize loop)
"""

__version__ = "0.1.0"
