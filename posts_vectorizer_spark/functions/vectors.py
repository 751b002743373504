"""Vector-column expressions (array<float> embeddings) + storage codecs.

The engine's internal vector form is ``array<float>`` (SURVEY.md §1.3): decode
packed binary once at ingest, keep arrays inside the engine so the hot path
never touches a codec. Dot products / norms are built-in higher-order
functions (``zip_with`` + ``aggregate``) — JVM-side, codegen-friendly — with
a DuckDB-SQL twin for the oracle harness.

Codecs mirror the reference's float32 pack/unpack at the Mongo boundary
(np.frombuffer at /root/reference/worker.py:64, .tobytes() at
/root/reference/worker.py:90 and tfidf-calculator/enter_wordvecs.py:42).
They are Arrow-batched pandas UDFs — egress/ingest only, never in a query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, DoubleType, FloatType


# ---------------------------------------------------------------------------
# arithmetic over array<float> / array<double>
# ---------------------------------------------------------------------------

def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """sum_i a[i]*b[i] in double precision."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(list_zip({a}, {b}),"
        f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
    )


@F.pandas_udf(DoubleType())
def dot_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized dot product, accumulated dimension-by-dimension in
    the SAME fold order as :func:`dot`'s HOF aggregate (and the DuckDB
    list_reduce twin) — IEEE double addition in identical sequence, so the
    results are bit-identical and interchangeable under the value hash.
    ~10-100x faster than the interpreted HOF on candidate-pair reranks;
    use where a query evaluates dots over many pairs."""
    import numpy as np

    A = np.stack(a.to_numpy())
    B = np.stack(b.to_numpy())
    acc = np.zeros(len(A))
    for d in range(A.shape[1]):
        acc += A[:, d].astype(np.float64) * B[:, d].astype(np.float64)
    return pd.Series(acc)


def norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity, NULL-safe on zero-norm vectors (guarded division —
    ANSI-safe; the reference's equivalent guard is /root/reference/worker.py:91)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(None))


def cosine_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN {norm_sql(a)} > 0 AND {norm_sql(b)} > 0"
        f" THEN {dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}) ELSE NULL END"
    )


# ---------------------------------------------------------------------------
# storage-boundary codecs (F8/F9)
# ---------------------------------------------------------------------------

@F.pandas_udf(ArrayType(FloatType()))
def decode_f32(raw: pd.Series) -> pd.Series:
    """binary (packed little-endian float32) -> array<float>.
    Ingest-time twin of np.frombuffer(vector, np.float32)
    (/root/reference/worker.py:64)."""
    return raw.map(
        lambda b: None if b is None else np.frombuffer(b, dtype=np.float32).tolist()
    )


@F.pandas_udf(BinaryType())
def encode_f32(vec: pd.Series) -> pd.Series:
    """array<float> -> packed float32 bytes. Egress-time twin of .tobytes()
    (/root/reference/worker.py:90)."""
    return vec.map(
        lambda v: None if v is None else np.asarray(v, dtype=np.float32).tobytes()
    )
