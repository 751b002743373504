"""Portable PageRank over the mutual-kNN graph — the third distributed
ITERATIVE algorithm in the engine with a full DuckDB oracle (after the
Lloyd KMeans in clustering.py and the min-label component propagation in
dedup.py). The reference has no graph surface; this extends its embedding
columns (reference worker.py:78) with the standard centrality step a
corpus/graph pipeline runs on a similarity graph (hub detection, crawl
prioritization, graph-based quality signals).

Reproducibility contract (mirrored step-for-step in :func:`pagerank_sql`):
- graph: the mutual-kNN edge set (u→v kept iff each ranks the other in
  its top-k — sim_knn_graph_mutual's symmetrization), so every vertex
  has out-degree ≥ 1 AND in-degree ≥ 1 (symmetry) — no dangling-mass
  term needed, and the per-iteration join can be inner on both engines;
- init: pr₀ = round(1/n, 9), n = #vertices (exact int on both engines);
- iteration: each neighbor contribution pr(u)/deg(u) is quantized to the
  round-12 DECIMAL grid BEFORE the incoming sum (exact, order-free —
  float sum order cannot diverge between engines), then
  pr' = round(0.15/n + 0.85 * sum, 9) as ONE fixed-shape double
  expression — identical IEEE ops in identical order;
- iterations are unrolled (fixed count), not run to convergence — a
  convergence test would need cross-engine-identical float comparisons.

Scale shape (per iteration): contributions are one edge-keyed projection
(narrow), the incoming sum is one dst-keyed exchange with map-side
partial aggregation (DECIMAL sums combine), and the rank update joins on
vec_id — the canonical distributed PageRank plan. State is one double
per vertex; the vertex-count scalar is a broadcast 1-row aggregate, not
a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import similarity

PR_K = 5            # kNN fan-out for the graph
PR_ITERS = 2        # unrolled power-iteration steps
PR_DAMPING = 0.85
PR_ROUND = 9        # rank grid
PR_C_ROUND = 12     # contribution grid (finer: it feeds a sum)


def _mutual_edges(emb: DataFrame, k: int) -> DataFrame:
    """Directed edge list (src, dst) containing BOTH orientations of every
    mutual top-k pair."""
    t = similarity.topk(emb, k)
    a, b = t.alias("a"), t.alias("b")
    return a.join(
        b,
        (F.col("a.query_id") == F.col("b.neighbor_id"))
        & (F.col("a.neighbor_id") == F.col("b.query_id")),
    ).select(
        F.col("a.query_id").alias("src"), F.col("a.neighbor_id").alias("dst")
    )


def pagerank_knn(
    emb: DataFrame, k: int = PR_K, iters: int = PR_ITERS
) -> DataFrame:
    """(vec_id, degree, pr): damped PageRank after `iters` unrolled power
    iterations over the mutual-kNN graph."""
    edges = _mutual_edges(emb, k)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    verts = deg.select(F.col("src").alias("vec_id"), "deg")
    nn = verts.agg(F.count("*").alias("n"))
    pr = verts.crossJoin(F.broadcast(nn)).select(
        "vec_id",
        "deg",
        "n",
        F.round(F.lit(1.0) / F.col("n").cast("double"), PR_ROUND).alias("pr"),
    )
    for _ in range(iters):
        contrib = edges.join(
            pr, edges["src"] == pr["vec_id"]
        ).select(
            "dst",
            F.round(F.col("pr") / F.col("deg").cast("double"), PR_C_ROUND)
            .cast("decimal(32,12)")
            .alias("c"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        pr = pr.drop("pr").join(
            sums, pr["vec_id"] == sums["dst"]
        ).select(
            "vec_id",
            "deg",
            "n",
            F.round(
                F.lit(1.0 - PR_DAMPING) / F.col("n").cast("double")
                + F.lit(PR_DAMPING) * F.col("s").cast("double"),
                PR_ROUND,
            ).alias("pr"),
        )
    return pr.select(
        "vec_id", F.col("deg").cast("bigint").alias("degree"), "pr"
    )


def pagerank_sql(k: int = PR_K, iters: int = PR_ITERS) -> str:
    parts = [
        f"t AS ({similarity.topk_sql(k)})",
        """edges AS (
  SELECT a.query_id AS src, a.neighbor_id AS dst
  FROM t a JOIN t b
    ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
)""",
        """deg AS (SELECT src AS vec_id, count(*) AS deg FROM edges GROUP BY src)""",
        "nn AS (SELECT count(*) AS n FROM deg)",
        f"""pr0 AS (
  SELECT vec_id, deg, n, round(1.0 / CAST(n AS DOUBLE), {PR_ROUND}) AS pr
  FROM deg, nn
)""",
    ]
    prev = "pr0"
    for it in range(1, iters + 1):
        parts.append(
            f"""c{it} AS (
  SELECT e.dst,
         CAST(round(p.pr / CAST(p.deg AS DOUBLE), {PR_C_ROUND})
              AS DECIMAL(32,12)) AS c
  FROM edges e JOIN {prev} p ON e.src = p.vec_id
)"""
        )
        parts.append(f"s{it} AS (SELECT dst, sum(c) AS s FROM c{it} GROUP BY dst)")
        parts.append(
            f"""pr{it} AS (
  SELECT p.vec_id, p.deg, p.n,
         round({1.0 - PR_DAMPING} / CAST(p.n AS DOUBLE)
               + {PR_DAMPING} * CAST(s.s AS DOUBLE), {PR_ROUND}) AS pr
  FROM {prev} p JOIN s{it} s ON p.vec_id = s.dst
)"""
        )
        prev = f"pr{it}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, CAST(deg AS BIGINT) AS degree, pr FROM {prev}
"""
    )
