"""Property tests: the portable expressions in functions/text.py must
compute bit-identical results in Spark and DuckDB for arbitrary corpus-like
text — this parity is the foundation every oracle hash-match rests on.

Alphabet: printable ASCII + BMP accented letters + the whitespace the
corpus contract allows (space/tab/newline). Astral-plane codepoints are
deliberately out of contract: Java regexes index UTF-16 code units, DuckDB
indexes codepoints, so surrogate-pair handling diverges (documented
engine limitation, irrelevant to the fixtures' ASCII corpus).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from posts_vectorizer_spark.functions import text as T

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    ".,;:!?'\"()[]{}#@$%&*+-/=<>_|~^"
    "äöüßéèñçøåÆŒ"
    " \t\n"
)

texts = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=80), min_size=1, max_size=24
)


def _duck(frame: pd.DataFrame, expr: str) -> list:
    con = duckdb.connect()
    con.register("t", frame)
    try:
        return [r[0] for r in con.sql(f"SELECT {expr} FROM t ORDER BY i").fetchall()]
    finally:
        con.close()


@settings(max_examples=12, deadline=None)
@given(texts)
def test_char_hash_parity(spark, strings):
    pdf = pd.DataFrame({"i": range(len(strings)), "s": strings})
    got = [
        r["h"]
        for r in spark.createDataFrame(pdf)
        .select("i", T.char_hash("s").alias("h"))
        .orderBy("i")
        .collect()
    ]
    want = _duck(pdf, f"{T.char_hash_sql('s')} AS h")
    assert got == want


@settings(max_examples=12, deadline=None)
@given(texts)
def test_digest_parity(spark, strings):
    """Spark md5 over UTF-8-cast binary == DuckDB md5 over the varchar —
    the exact-dedup fingerprint contract (functions/text.py::digest)."""
    pdf = pd.DataFrame({"i": range(len(strings)), "s": strings})
    got = [
        r["h"]
        for r in spark.createDataFrame(pdf)
        .select("i", T.digest("s").alias("h"))
        .orderBy("i")
        .collect()
    ]
    want = _duck(pdf, f"{T.digest_sql('s')} AS h")
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts)
def test_dsir_bigram_feature_parity(spark, strings):
    """The DSIR hashed-bigram feature expression (token-hash affine fold
    mod bucket count) must agree between engines on arbitrary text — the
    full-query oracle only exercises fixture prose."""
    from posts_vectorizer_spark.plans.queries_curation import (
        _DSIR_B,
        _DSIR_SB,
        _dsir_feats_sql,
    )
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({"doc_id": range(len(strings)), "text": strings})
    th = F.transform(T.tokens("text"), lambda t: T.char_hash(t))
    bigram = lambda i: (  # noqa: E731
        (F.element_at(F.col("th"), i) * _DSIR_SB
         + F.element_at(F.col("th"), i + 1)) % T.HASH_MOD
    ) % _DSIR_B
    got = sorted(
        (r["doc_id"], r["b"])
        for r in spark.createDataFrame(pdf)
        .select("doc_id", th.alias("th"))
        .where(F.size("th") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(F.sequence(F.lit(1), F.size("th") - 1), bigram)
            ).alias("b"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    try:
        want = sorted(
            (r[0], r[1]) for r in con.sql(_dsir_feats_sql()).fetchall()
        )
    finally:
        con.close()
    assert got == want


@settings(max_examples=12, deadline=None)
@given(texts)
def test_tokens_parity(spark, strings):
    pdf = pd.DataFrame({"i": range(len(strings)), "s": strings})
    got = [
        r["tk"]
        for r in spark.createDataFrame(pdf)
        .select("i", T.tokens("s").alias("tk"))
        .orderBy("i")
        .collect()
    ]
    want = _duck(pdf, f"{T.tokens_sql('s')} AS tk")
    assert got == want


@settings(max_examples=12, deadline=None)
@given(texts)
def test_bpe_pattern_parity(spark, strings):
    """The BPE-ish pre-tokenization regex must extract identical token
    sequences under Java regex (Spark) and RE2 (DuckDB) — the alternatives
    are first-char-disjoint precisely so engine matching-order semantics
    can't diverge."""
    from pyspark.sql import functions as F

    from posts_vectorizer_spark.plans.queries_advanced import BPE_PATTERN

    pdf = pd.DataFrame({"i": range(len(strings)), "s": strings})
    got = [
        r["tk"]
        for r in spark.createDataFrame(pdf)
        .select(
            "i",
            F.regexp_extract_all(F.lower("s"), F.lit(BPE_PATTERN), F.lit(0)).alias("tk"),
        )
        .orderBy("i")
        .collect()
    ]
    want = _duck(pdf, f"regexp_extract_all(lower(s), '{BPE_PATTERN}') AS tk")
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts)
def test_winnowing_gram_hash_parity(spark, strings):
    """The k-gram hash arrays under the winnowing sketch must be identical —
    exercises char_hash_sql nested inside an outer lambda (the DuckDB
    variable-shadowing trap fixed in r2)."""
    from pyspark.sql import functions as F

    from posts_vectorizer_spark.plans.queries_advanced import WINNOW_K

    pdf = pd.DataFrame({"i": range(len(strings)), "s": strings})
    text = F.lower(F.col("s"))
    n_grams = F.length(text) - (WINNOW_K - 1)
    gh = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: T.char_hash(text.substr(i, F.lit(WINNOW_K))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    got = [
        r["gh"]
        for r in spark.createDataFrame(pdf).select("i", gh.alias("gh")).orderBy("i").collect()
    ]
    want = _duck(
        pdf,
        f"""list_transform(
              generate_series(1, greatest(length(lower(s)) - {WINNOW_K - 1}, 0)),
              gi -> {T.char_hash_sql(f'substr(lower(s), gi, {WINNOW_K})')}
            ) AS gh""",
    )
    assert got == want
