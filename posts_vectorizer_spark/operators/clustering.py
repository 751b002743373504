"""Portable KMeans — fixed-iteration Lloyd's algorithm with every
arithmetic step chosen to be bit-reproducible across engines, so a
DISTRIBUTED ITERATIVE algorithm carries a DuckDB oracle (the [Q]
companion to the MLlib-backed `sim_ivf_ann`, whose KMeans internals are
library-private and therefore rows-only).

Reproducibility contract (each rule mirrored in :func:`kmeans_sql`):
- init: the k lowest vec_ids are the seed centroids (a total order —
  both engines pick identical seeds; KMeans++ would need an RNG);
- distance: sequential left-fold of (x_d - c_d)*(x_d - c_d) over dims
  (F.aggregate ↔ list_reduce — same order, same IEEE ops, identical
  doubles bit-for-bit);
- assignment: lexicographic min of (distance, cluster_id) — ties cannot
  diverge;
- update: member components quantized to round-6 DECIMAL before the SUM
  (exact, order-free), one double division by the count, round-6 — the
  same grid discipline every float aggregate in this repo uses;
- empty clusters are DROPPED (inner joins on both engines) — at k≪n
  this never fires, and when it does both engines agree.

Scale shape (per iteration): one broadcast of k quantized centroid
arrays, a narrow per-row argmin over the k candidates (NO n×k row
explosion on the Spark side — the fold runs over a broadcast array
literal inside one projection), then one cluster-keyed exchange of
(cluster, dim, value) partial sums. State per iteration is k×dims
doubles — trivially broadcastable at any corpus size; the corpus itself
is scanned once per iteration and never shuffled whole.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K_DEFAULT = 8
ITERS_DEFAULT = 2
ROUND = 6


def _quantize(arr_col):
    """array<float> -> array<double> on the round-6 grid."""
    return F.transform(arr_col, lambda x: F.round(x.cast("double"), ROUND))


def _dist_to(cvec_lit, emb_col):
    """Sequential-fold squared L2 between an embedding column and one
    centroid array literal."""
    return F.aggregate(
        F.zip_with(emb_col, cvec_lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(emb: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, cluster_id, embedding): nearest centroid by
    (distance, cluster_id) — computed as a single projection over the
    broadcast centroid literals; no join, no row explosion."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist_to(
                        F.array(*[F.lit(float(v)) for v in cvec]), F.col("embedding")
                    ).alias("d"),
                    F.lit(cid).alias("c"),
                )
                for cid, cvec in centroids
            ]
        )
    )
    return emb.select(
        "vec_id", "embedding", best["c"].alias("cluster_id")
    )


def _update(assigned: DataFrame) -> list[tuple[int, list[float]]]:
    """Recompute centroids: per (cluster, dim) exact decimal mean on the
    round-6 grid. Collects k×dims rows to the driver — the centroid
    table is the SMALL side by construction (k·dims values), which is
    what makes per-iteration broadcast the right plan at any scale."""
    longf = assigned.select(
        "cluster_id", F.posexplode("embedding").alias("dim", "val")
    )
    rows = (
        longf.groupBy("cluster_id", "dim")
        .agg(
            (
                F.sum(
                    F.round(F.col("val").cast("double"), ROUND).cast(
                        "decimal(18,6)"
                    )
                ).cast("double")
                / F.count("*")
            ).alias("m")
        )
        .select(
            "cluster_id", "dim", F.round("m", ROUND).alias("component")
        )
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], {})[r["dim"]] = r["component"]
    return [
        (cid, [dims[d] for d in sorted(dims)])
        for cid, dims in sorted(by_cluster.items())
    ]


def kmeans(
    emb: DataFrame, k: int = K_DEFAULT, iters: int = ITERS_DEFAULT
) -> DataFrame:
    """(cluster_id, n_members, dim, component) after `iters` Lloyd steps
    from the k-lowest-vec_id seeds."""
    seeds = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(_quantize("embedding").alias("cvec"))
        .collect()
    )
    centroids = [(i, list(r["cvec"])) for i, r in enumerate(seeds)]
    assigned = None
    for _ in range(iters):
        assigned = _assign(emb, centroids)
        centroids = _update(assigned)
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_members")
    )
    spark = emb.sparkSession
    cent_rows = [
        (cid, dim, comp)
        for cid, cvec in centroids
        for dim, comp in enumerate(cvec)
    ]
    cents = spark.createDataFrame(
        cent_rows, "cluster_id int, dim int, component double"
    )
    return cents.join(F.broadcast(sizes), "cluster_id").select(
        "cluster_id",
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("dim").cast("bigint").alias("dim"),
        "component",
    )


def _sql_dist(evec: str, cvec: str, dims: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, {dims}), km_j -> "
        f"(CAST({evec}[km_j] AS DOUBLE) - {cvec}[km_j])"
        f" * (CAST({evec}[km_j] AS DOUBLE) - {cvec}[km_j]))),"
        f" (km_a, km_b) -> km_a + km_b)"
    )


def kmeans_sql(
    k: int = K_DEFAULT, iters: int = ITERS_DEFAULT, dims: int = 64
) -> str:
    """The identical computation in DuckDB, iterations unrolled as CTEs."""
    quant = (
        "list_transform(embedding, km_x -> round(CAST(km_x AS DOUBLE), "
        f"{ROUND}))"
    )
    parts = [
        f"""cents0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         {quant} AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {k})
)"""
    ]
    prev = "cents0"
    for it in range(1, iters + 1):
        dist = _sql_dist("e.embedding", "c.cvec", dims)
        parts.append(
            f"""assign{it} AS (
  SELECT e.vec_id, e.embedding,
         (min({{'d': {dist}, 'c': c.cluster_id}})).c AS cluster_id
  FROM embeddings e, {prev} c
  GROUP BY e.vec_id, e.embedding
)"""
        )
        parts.append(
            f"""cents{it} AS (
  SELECT cluster_id, list(component ORDER BY dim) AS cvec
  FROM (
    SELECT cluster_id, km_j - 1 AS dim,
           round(CAST(sum(CAST(round(CAST(embedding[km_j] AS DOUBLE),
                                     {ROUND}) AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), {ROUND}) AS component
    FROM assign{it}, generate_series(1, {dims}) AS t(km_j)
    GROUP BY cluster_id, km_j
  ) GROUP BY cluster_id
)"""
        )
        prev = f"cents{it}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT c.cluster_id, CAST(s.n_members AS BIGINT) AS n_members,
       CAST(t.km_j - 1 AS BIGINT) AS dim, c.cvec[t.km_j] AS component
FROM {prev} c
JOIN (SELECT cluster_id, count(*) AS n_members FROM assign{iters}
      GROUP BY cluster_id) s USING (cluster_id),
     generate_series(1, {dims}) AS t(km_j)
"""
    )
