"""Text analysis operators (Tier C, BASELINE.json north star): quality
scoring, document fingerprinting, naive Bayes language-ID, n-gram stats,
token counting. All pure column expressions / relational plans — no Python
UDFs — with DuckDB twins for the oracle harness.

These extend the reference's text surface (which is only lowercase +
tokenize, worker.py:35) to what an LLM-data pipeline needs at 100 TB: every
operator is a single scan + hash aggregations, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import text as T
from ..sources import spread

STOPWORDS = ("a", "the")

# Laplace-smoothed naive Bayes over word frequencies per language.
# Scores are rounded before ranking so cross-engine float noise can't flip
# an argmax; ties break lexicographically on lang.
LANGID_ROUND = 6


def _stopwords_array() -> Column:
    return F.array(*[F.lit(w) for w in STOPWORDS])


def quality_profile(documents: DataFrame, round_digits: int = 6) -> DataFrame:
    """Per-doc quality signals: token counts, distinct ratio, stopword ratio,
    mean token length, and a deterministic composite score in [0, 1]."""
    toks = T.tokens("text")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(_stopwords_array(), t)))
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    guard = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(0.0)  # noqa: E731
    distinct_ratio = guard(n_distinct, n_tokens)
    stop_ratio = guard(n_stop, n_tokens)
    avg_len = guard(sum_len, n_tokens)
    score = (
        0.5 * distinct_ratio
        + 0.3 * (1.0 - stop_ratio)
        + 0.2 * F.least(n_tokens.cast("double") / 50.0, F.lit(1.0))
    )
    # r12: the per-row HOF chain (tokenize + distinct + stopword filter +
    # length fold) is the whole cost — rebalance the single-split scan so
    # it runs on every core (sources.spread; guide §2.5 input skew).
    return spread(documents).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(distinct_ratio, round_digits).alias("distinct_ratio"),
        F.round(stop_ratio, round_digits).alias("stopword_ratio"),
        F.round(avg_len, round_digits).alias("avg_token_len"),
        F.round(score, round_digits).alias("quality_score"),
    )


def quality_profile_sql(round_digits: int = 6) -> str:
    toks = T.tokens_sql("text")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id,
         {toks} AS toks,
         len({toks}) AS n_tokens,
         len(list_distinct({toks})) AS n_distinct,
         len(list_filter({toks}, t -> t IN ({stop_list}))) AS n_stop,
         list_sum(list_transform({toks}, t -> length(t))) AS sum_len
  FROM documents
),
ratios AS (
  SELECT doc_id, n_tokens, n_distinct,
         CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE)/n_tokens ELSE 0.0 END AS distinct_ratio,
         CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_tokens > 0 THEN CAST(COALESCE(sum_len, 0) AS DOUBLE)/n_tokens ELSE 0.0 END AS avg_len
  FROM base
)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_distinct AS INTEGER) AS n_distinct_tokens,
       round(distinct_ratio, {round_digits}) AS distinct_ratio,
       round(stop_ratio, {round_digits}) AS stopword_ratio,
       round(avg_len, {round_digits}) AS avg_token_len,
       round(0.5*distinct_ratio + 0.3*(1.0 - stop_ratio)
             + 0.2*least(CAST(n_tokens AS DOUBLE)/50.0, 1.0), {round_digits}) AS quality_score
FROM ratios
"""


def fingerprints(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — portable polynomial hash of the full raw text.
    Identical fingerprints = byte-identical docs (exact-dedup key that ships
    8 bytes per doc instead of the text)."""
    return spread(documents).select("doc_id", T.char_hash("text").alias("fingerprint"))


FINGERPRINTS_SQL = (
    f"SELECT doc_id, {T.char_hash_sql('text')} AS fingerprint FROM documents"
)


def langid_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_actual, cand_lang, score) — Laplace-smoothed naive Bayes
    log10-likelihood of each doc under each language's unigram profile
    (profiles learned from the corpus itself; `lang` is the label column).

    Plan: token occurrences × |langs| left-joined against the (word, lang)
    count table — all broadcast-sized dims; the fact stream stays partitioned
    by doc.
    """
    toks = doc_toks = documents.select(
        "doc_id", F.col("lang").alias("lang_actual"), F.explode(T.tokens("text")).alias("word")
    )
    word_lang = (
        doc_toks.groupBy("word", "lang_actual")
        .agg(F.count("*").alias("c"))
        .withColumnRenamed("lang_actual", "cand_lang")
    )
    lang_totals = word_lang.groupBy("cand_lang").agg(F.sum("c").alias("total_c"))
    # Vocabulary size as a broadcast 1-row aggregate (same pattern as
    # idf_table's TOTAL_POSTS, tfidf.py) — no driver-side action at plan
    # build; the count stays inside the job.
    vocab = doc_toks.agg(F.countDistinct("word").alias("vocab_size"))
    langs = lang_totals.select("cand_lang")
    scored = (
        toks.crossJoin(F.broadcast(langs))
        .join(F.broadcast(word_lang), ["word", "cand_lang"], "left")
        .join(F.broadcast(lang_totals), "cand_lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "lang_actual",
            "cand_lang",
            F.log10(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("total_c") + F.col("vocab_size"))
            ).alias("log_p"),
        )
    )
    return scored.groupBy("doc_id", "lang_actual", "cand_lang").agg(
        F.round(F.sum("log_p"), LANGID_ROUND).alias("score")
    )


LANGID_SCORES_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang AS lang_actual, unnest({T.tokens_sql('text')}) AS word
  FROM documents
),
word_lang AS (
  SELECT word, lang_actual AS cand_lang, count(*) AS c FROM tok GROUP BY 1, 2
),
lang_totals AS (
  SELECT cand_lang, sum(c) AS total_c FROM word_lang GROUP BY 1
),
v AS (SELECT count(DISTINCT word) AS vocab_size FROM tok),
scored AS (
  SELECT t.doc_id, t.lang_actual, l.cand_lang,
         log10(CAST(COALESCE(wl.c, 0) + 1 AS DOUBLE)
               / (lt.total_c + (SELECT vocab_size FROM v))) AS log_p
  FROM tok t
  CROSS JOIN (SELECT cand_lang FROM lang_totals) l
  LEFT JOIN word_lang wl ON wl.word = t.word AND wl.cand_lang = l.cand_lang
  JOIN lang_totals lt ON lt.cand_lang = l.cand_lang
)
SELECT doc_id, lang_actual, cand_lang, round(sum(log_p), {LANGID_ROUND}) AS score
FROM scored
GROUP BY doc_id, lang_actual, cand_lang
"""


def langid_predictions(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_actual, lang_predicted, correct) — argmax over the
    per-language scores with deterministic (rounded-score, lang) ordering."""
    from pyspark.sql.window import Window

    scores = langid_scores(documents)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand_lang"))
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "doc_id",
            "lang_actual",
            F.col("cand_lang").alias("lang_predicted"),
            (F.col("cand_lang") == F.col("lang_actual")).alias("correct"),
        )
    )


LANGID_PREDICTIONS_SQL = f"""
WITH scores AS ({LANGID_SCORES_SQL}),
ranked AS (
  SELECT doc_id, lang_actual, cand_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand_lang) AS rk
  FROM scores
)
SELECT doc_id, lang_actual, cand_lang AS lang_predicted,
       cand_lang = lang_actual AS correct
FROM ranked WHERE rk = 1
"""


def ngrams(documents: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, ngram) — word n-grams built with array slicing inside a HOF
    (no UDF; MLlib's NGram does the same shape via an ML Transformer)."""
    toks = T.tokens("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return spread(documents).select("doc_id", F.explode(grams).alias("ngram"))


def ngrams_sql(n: int = 2) -> str:
    toks = T.tokens_sql("text")
    return f"""
SELECT doc_id,
       unnest(list_transform(
         generate_series(1, greatest(len({toks}) - {n - 1}, 0)),
         i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')
       )) AS ngram
FROM documents
"""
