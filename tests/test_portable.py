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
