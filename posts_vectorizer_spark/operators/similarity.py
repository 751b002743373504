"""Similarity search over embedding columns (Tier C, BASELINE.json).

Brute-force cosine (exactness baseline + oracle anchor) and a
random-hyperplane LSH bucketing path (the 100 TB shape: candidate
generation becomes an equi-join on bucket id; only candidates get the exact
rerank). Dot products are ``zip_with``/``aggregate`` higher-order functions —
JVM-side, bit-identical to the DuckDB twin because both fold dims
left-to-right in double precision.

At cluster scale the brute-force path is the quadratic trap; the LSH path's
cost is #vectors × #buckets-collisions. An IVF variant is the same plan with
learned centroids instead of random hyperplanes (MLlib KMeans fits them; the
bucket-join/rerank plumbing here is unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions import vectors as V

LSH_PLANES = 8
COSINE_ROUND = 6


# ---------------------------------------------------------------------------
# brute-force cosine
# ---------------------------------------------------------------------------

def _pairs(embeddings: DataFrame, self_pairs: bool = False) -> DataFrame:
    a = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("va")
    )
    b = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vb")
    )
    cond = F.lit(True) if self_pairs else F.col("query_id") != F.col("neighbor_id")
    return a.crossJoin(b).where(cond)


def cosine_pairs(embeddings: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, cosine) for all ordered pairs (brute force)."""
    return _pairs(embeddings).select(
        "query_id",
        "neighbor_id",
        F.round(V.cosine("va", "vb"), COSINE_ROUND).alias("cosine"),
    )


def _cosine_pairs_sql(where: str = "a.vec_id <> b.vec_id") -> str:
    cos = V.cosine_sql("a.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       round({cos}, {COSINE_ROUND}) AS cosine
FROM embeddings a, embeddings b
WHERE {where}
"""


def topk(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per query by cosine (W3 ranking shape;
    deterministic: rounded score desc, neighbor_id asc)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cosine_pairs(embeddings)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def topk_sql(k: int = 5) -> str:
    return f"""
WITH pairs AS ({_cosine_pairs_sql()})
SELECT * FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rk
  FROM pairs
) WHERE rk <= {k}
"""


def neighbors_above(embeddings: DataFrame, threshold: float) -> DataFrame:
    """Unordered near-dup pairs with cosine >= threshold (embedding-space
    near-duplicate detection)."""
    return (
        cosine_pairs(embeddings)
        .where((F.col("query_id") < F.col("neighbor_id")) & (F.col("cosine") >= threshold))
        .withColumnRenamed("query_id", "vec_a")
        .withColumnRenamed("neighbor_id", "vec_b")
    )


def neighbors_above_sql(threshold: float) -> str:
    return f"""
SELECT query_id AS vec_a, neighbor_id AS vec_b, cosine
FROM ({_cosine_pairs_sql("a.vec_id < b.vec_id")})
WHERE cosine >= {threshold}
"""


# ---------------------------------------------------------------------------
# random-hyperplane LSH (scale path)
# ---------------------------------------------------------------------------

def _projection(vec: str | Column, plane: int, dims: int) -> Column:
    """dot(vec, h_plane) where h_plane[d] = sin((plane+1)*131 + d*17) — a
    deterministic pseudo-random hyperplane both engines can reproduce exactly
    (no stored random state)."""
    c = F.col(vec) if isinstance(vec, str) else vec
    terms = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: F.element_at(c, d + 1).cast("double")
        * F.sin(F.lit(float((plane + 1) * 131)) + d.cast("double") * 17.0),
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def _projection_sql(vec: str, plane: int, dims: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(generate_series(0, {dims - 1}),"
        f" d -> CAST({vec}[d + 1] AS DOUBLE) * sin({(plane + 1) * 131} + d * 17.0))),"
        f" (acc, x) -> acc + x)"
    )


def lsh_bucket(vec: str | Column, dims: int, planes: int = LSH_PLANES) -> Column:
    """Sign-of-projection bit code: bucket = Σ_p 2^p · [dot(v, h_p) > 0]."""
    acc = F.lit(0)
    for p in range(planes):
        acc = acc + F.when(_projection(vec, p, dims) > 0, F.lit(2 ** p)).otherwise(
            F.lit(0)
        )
    return acc.cast("long")


def lsh_bucket_sql(vec: str, dims: int, planes: int = LSH_PLANES) -> str:
    bits = " + ".join(
        f"CASE WHEN {_projection_sql(vec, p, dims)} > 0 THEN {2 ** p} ELSE 0 END"
        for p in range(planes)
    )
    return f"CAST({bits} AS BIGINT)"


def lsh_ann(embeddings: DataFrame, dims: int, k: int = 3) -> DataFrame:
    """Approximate top-k: bucket every vector with {LSH_PLANES} hyperplane
    sign bits, generate candidates by bucket equi-join, exact-rerank inside
    buckets. Misses across bucket boundaries are the approximation error —
    the brute-force `topk` is the recall oracle."""
    bucketed = embeddings.select(
        "vec_id", "embedding", lsh_bucket("embedding", dims).alias("bucket")
    )
    a = bucketed.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("va"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vb"), "bucket"
    )
    cands = a.join(b, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.select(
            "query_id",
            "neighbor_id",
            F.round(V.cosine("va", "vb"), COSINE_ROUND).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def lsh_ann_sql(dims: int, k: int = 3) -> str:
    cos = V.cosine_sql("a.embedding", "b.embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         {lsh_bucket_sql('embedding', dims)} AS bucket
  FROM embeddings
),
cands AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({cos}, {COSINE_ROUND}) AS cosine
  FROM bucketed a JOIN bucketed b USING (bucket)
  WHERE a.vec_id <> b.vec_id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rk
  FROM cands
) WHERE rk <= {k}
"""


# ---------------------------------------------------------------------------
# vector aggregation (centroids)
# ---------------------------------------------------------------------------

def label_centroids(embeddings: DataFrame, round_digits: int = COSINE_ROUND) -> DataFrame:
    """(label, dim, centroid) — mean embedding per label in long form (the
    vector-aggregation shape of A8; also the IVF training step's output)."""
    return (
        embeddings.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("val").cast("double")), round_digits).alias("centroid"))
    )


LABEL_CENTROIDS_SQL = f"""
WITH expanded AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
)
SELECT label, dim, round(avg(val), {COSINE_ROUND}) AS centroid
FROM expanded GROUP BY label, dim
"""
