"""Portable text expressions: each helper exists in two forms that compute
bit-identical results — a PySpark Column (the engine) and a DuckDB SQL
fragment (the oracle). Keeping both in one module is the single source of
truth that makes the differential-oracle harness meaningful (SURVEY.md §5.2).

Tokenizer semantics follow the reference's only text normalization —
lowercase, no stopword/punctuation removal (quirk Q5,
/root/reference/worker.py:35-50): regex whitespace split of the lowercased
text, empty tokens dropped. spaCy fidelity mode is deliberately NOT the
default (not oracle-expressible — SURVEY.md §7.4-2).

All hashes here are *portable* polynomial hashes written as higher-order
array lambdas. Spark's builtin ``hash()`` (murmur3) and DuckDB's ``hash()``
differ, so anything hash-derived that must oracle-match (fingerprints,
word->vec_id routing, simhash, minhash) uses these instead. They run inside
whole-stage codegen (no Python UDF) so the hot path stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne-ish primes for polynomial hashing; fits int64 at every
# intermediate step (max acc ~1e9*131 + 1e9 < 2^63).
HASH_MOD = 1_000_000_007
HASH_BASE = 31


# ---------------------------------------------------------------------------
# tokenize
# ---------------------------------------------------------------------------

def tokens(col: str | Column) -> Column:
    """array<string> of lowercased whitespace-split tokens, empties dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))


def tokens_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`tokens`."""
    return rf"list_filter(regexp_split_to_array(lower({expr}), '\s+'), t -> t <> '')"


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


# ---------------------------------------------------------------------------
# portable polynomial string hash (chars fold)
# ---------------------------------------------------------------------------

def char_hash(col: str | Column, mod: int = HASH_MOD, base: int = HASH_BASE) -> Column:
    """h = fold(chars, 0, (h, c) -> (h*base + ascii(c)) % mod).

    Pure SQL higher-order functions — stays in codegen, no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    # split(c, '') yields one element per character — O(n), unlike the
    # substr(i, 1)-per-position formulation which re-scans the string per
    # char (O(n^2) and the dominant cost of every hash-heavy dedup query).
    chars = F.transform(F.split(c, ""), lambda ch: F.ascii(ch))
    folded = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + ch.cast("long")) % mod,
    )
    # Spark's sequence(1, 0) descends to [1, 0] instead of yielding an empty
    # array, so the empty string needs an explicit guard to match DuckDB's
    # empty generate_series.
    return F.when(F.length(c) > 0, folded).otherwise(F.lit(0).cast("long"))


def char_hash_sql(expr: str, mod: int = HASH_MOD, base: int = HASH_BASE) -> str:
    """DuckDB equivalent of :func:`char_hash`.

    ``list_reduce`` seeds from the first element, so prepend the 0 seed.
    The lambda variable is ``ch_i`` (not ``i``) so this fragment can be
    nested inside an outer list_transform lambda without shadowing the
    caller's variable (Spark auto-renames HOF variables; DuckDB doesn't).
    """
    chars = (
        f"list_transform(generate_series(1, length({expr})),"
        f" ch_i -> ascii({expr}[ch_i]))"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {chars}),"
        f" (acc, ch) -> (acc * {base} + ch) % {mod})"
    )


def digest(col: str | Column) -> Column:
    """128-bit md5 fingerprint as lowercase hex — the fast portable hash
    for WHOLE-document equality keys. JVM-intrinsic digest (native speed,
    no per-char higher-order fold) and bit-identical to DuckDB's
    ``md5()`` over the same UTF-8 text (verified incl. unicode / empty /
    long inputs). Use :func:`char_hash` when the value must feed integer
    arithmetic (minhash, bucketing); use this when the hash is only an
    equality key — on full documents it is ~100x cheaper."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def digest_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`digest`."""
    return f"md5({expr})"


def word_bucket(col: str | Column, n_buckets: int) -> Column:
    """Deterministic word -> [0, n_buckets) routing used to key words onto the
    ``embeddings`` fixture rows (the stand-in for the fastText vector lookup,
    /root/reference/worker.py:57,63-64)."""
    return char_hash(col) % n_buckets


def word_bucket_sql(expr: str, n_buckets: int) -> str:
    return f"({char_hash_sql(expr)} % {n_buckets})"
