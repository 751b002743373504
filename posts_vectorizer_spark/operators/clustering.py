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

from pyspark.sql import DataFrame, Window, functions as F

from ..cache import checkpoint_tracked, persist_tracked
from ..sources import spread

K_DEFAULT = 8
ITERS_DEFAULT = 2
ROUND = 6


def _fan_in(emb: DataFrame) -> DataFrame:
    """Rebalance + persist the embedding relation at the entry of every
    Lloyd-family operator (r13, guide §2.5/§7.2): the higher-order
    distance folds these operators run per row are NOT whole-stage
    codegen'd (each HOF evaluates interpreted, per element), and under a
    single-split scan every train/assign job re-ran that fold chain on
    ONE core — the r13 stage profile of sim_ivfpq_search showed its
    back-to-back single-task stages (assign, update, encode) dominating
    14 s of wall. The persist exists because each Lloyd iteration is its
    own driver-collected job over the same rows; it is released by the
    caller's release_caches() sweep like every tracked cache."""
    return persist_tracked(spread(emb))


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


def _cvec_lit(cvec) -> "F.Column":
    """One centroid as ONE array<double> Literal node. The previous
    ``F.array(*[F.lit(float(v)) ...])`` built a 64-child CreateArray per
    centroid — k of them per assign — and the analyzer walked that
    ~k·dims-node tree once per Lloyd JOB: the r13 stage profile showed
    ~0.6 s driver-side gaps between every train collect, which was most
    of the family's wall once the folds themselves were parallelized.
    Values are identical (same Python floats, same array<double>)."""
    return F.lit([float(v) for v in cvec])


def _assign(emb: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, cluster_id, embedding): nearest centroid by
    (distance, cluster_id) — computed as a single projection over the
    broadcast centroid literals; no join, no row explosion."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist_to(
                        _cvec_lit(cvec), F.col("embedding")
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
    emb = _fan_in(emb)
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


IVF_K_NEIGHBORS = 3


def _norm2(emb_col):
    return F.aggregate(
        F.transform(emb_col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _final_lists(
    emb: DataFrame, k: int = K_DEFAULT, iters: int = ITERS_DEFAULT
) -> DataFrame:
    """(cluster_id, vec_id, embedding, n2): the inverted lists after the
    portable KMeans train + one final assignment pass (the index step).
    Zero-norm vectors are excluded on both engines (no cosine
    neighborhood). Shared by ivf_search and semdedup_prune — CALLERS
    fan in (spread+persist) the embedding relation; doing it here too
    would probe/repartition an already-exchanged frame (an AQE job at
    build)."""
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
    # final lists use the LAST updated centroids (one more assign pass —
    # the index assignment step). Checkpointed (r13, guide §5/§7.2):
    # every consumer SELF-JOINS this relation, so without the cut the
    # giant k×dims distance-fold expression tree is planned and executed
    # once per join side; the checkpoint materializes the lists once
    # (n rows of id+embedding+norm) and both sides read the leaf.
    assigned = _assign(emb, centroids)
    return checkpoint_tracked(
        assigned.where(_norm2("embedding") > 0).select(
            "cluster_id", "vec_id", "embedding", _norm2("embedding").alias("n2")
        )
    )


def ivf_search(
    emb: DataFrame,
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    topk: int = IVF_K_NEIGHBORS,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rk): IVF search with nprobe=1 over
    the PORTABLE KMeans lists — train (kmeans), index (the final
    assignment IS the inverted list), search (exact cosine inside the
    query's own list) in one oracle-checkable plan. Zero-norm vectors are
    excluded on both engines (they have no cosine neighborhood).

    Scale shape: the self-join keys on cluster_id, so candidate volume is
    Σ|list|² instead of n² — the IVF contract; a hot list is bounded the
    same way the LSH rerank is (cap or split; see similarity.lsh_ann).
    Approximate BY DESIGN (a true neighbor in another list is missed);
    the oracle runs the SAME lists, so the check is exact over the
    declared candidate set — the sim_lsh_ann pattern."""
    lists = _final_lists(_fan_in(emb), k, iters)
    a = lists.select(
        "cluster_id",
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("n2").alias("qn2"),
    )
    b = lists.select(
        "cluster_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("n2").alias("nn2"),
    )
    dot = F.aggregate(
        F.zip_with("qe", "ne", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.join(b, "cluster_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot / (F.sqrt("qn2") * F.sqrt("nn2")), ROUND
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= topk)
        .select("query_id", "neighbor_id", "cosine", F.col("rk").cast("int").alias("rk"))
    )


def _sql_fold_sum(items: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, {items}), (iv_a, iv_b) -> iv_a + iv_b)"
    )


def _lists_sql_prefix(k: int, iters: int, dims: int) -> str:
    """WITH-clause prefix ending at the `lists` CTE (portable KMeans
    train + final assignment + zero-norm filter) — shared by the IVF and
    SemDeDup oracles."""
    base = kmeans_sql(k, iters, dims)
    with_part = base.split("\nSELECT c.cluster_id")[0]
    dist = _sql_dist("e.embedding", "c.cvec", dims)
    sq = _sql_fold_sum(
        f"list_transform(generate_series(1, {dims}), iv_j -> "
        f"CAST(embedding[iv_j] AS DOUBLE) * CAST(embedding[iv_j] AS DOUBLE))"
    )
    return (
        with_part
        + f""",
final_assign AS (
  SELECT e.vec_id, e.embedding,
         (min({{'d': {dist}, 'c': c.cluster_id}})).c AS cluster_id
  FROM embeddings e, cents{iters} c
  GROUP BY e.vec_id, e.embedding
),
lists AS (
  SELECT cluster_id, vec_id, embedding, {sq} AS n2
  FROM final_assign
  WHERE {sq} > 0
)"""
    )


def _sql_pair_cosine(dims: int) -> str:
    dot = _sql_fold_sum(
        f"list_transform(generate_series(1, {dims}), iv_j -> "
        f"CAST(a.embedding[iv_j] AS DOUBLE) * CAST(b.embedding[iv_j] AS DOUBLE))"
    )
    return f"round({dot} / (sqrt(a.n2) * sqrt(b.n2)), {ROUND})"


def ivf_search_sql(
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    topk: int = IVF_K_NEIGHBORS,
    dims: int = 64,
) -> str:
    return (
        _lists_sql_prefix(k, iters, dims)
        + f""",
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_sql_pair_cosine(dims)} AS cosine
  FROM lists a JOIN lists b USING (cluster_id)
  WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM pairs
) WHERE rk <= {topk}
"""
    )


SEMDEDUP_TAU = 0.3


def semdedup_prune(
    emb: DataFrame,
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """(vec_id, cluster_id, witness_id, witness_cosine, n_witnesses):
    SemDeDup-style semantic pruning (Abbas et al. 2023, arXiv:2303.09540 —
    cluster the embedding space, then drop near-duplicates WITHIN each
    cluster so the quadratic pair search never crosses cluster
    boundaries). The reference corpus pipeline has no semantic dedup; this
    extends its embedding surface (reference worker.py:78 vector columns)
    with the standard LLM-corpus curation step.

    Deterministic keep-first contract (what makes it oracle-checkable): a
    vector is PRUNED iff its cluster holds a LOWER-vec_id vector with
    round-6 cosine > tau; survivors are simply the non-returned ids. Each
    pruned row carries the smallest such witness (lexicographic struct
    min — both engines agree) and the total witness count. This is the
    greedy by-id variant of SemDeDup's keep-one-per-duplicate-group; the
    paper's keep-farthest-from-centroid rule differs only in the ORDER
    the group is ranked by, not in the candidate generation.

    Scale shape: identical to ivf_search — pair volume is Σ|list|²
    (cluster equi-join), never n²; raise k to shrink lists at corpus
    scale. The witness argmin is a map-side-combinable struct-min keyed
    by vec_id, so the reduce state per vector is one struct."""
    lists = _final_lists(_fan_in(emb), k, iters)
    a = lists.select(
        "cluster_id",
        "vec_id",
        F.col("embedding").alias("qe"),
        F.col("n2").alias("qn2"),
    )
    b = lists.select(
        "cluster_id",
        F.col("vec_id").alias("witness_id"),
        F.col("embedding").alias("ne"),
        F.col("n2").alias("nn2"),
    )
    dot = F.aggregate(
        F.zip_with("qe", "ne", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.join(b, "cluster_id")
        .where(F.col("witness_id") < F.col("vec_id"))
        .select(
            "vec_id",
            "cluster_id",
            "witness_id",
            F.round(dot / (F.sqrt("qn2") * F.sqrt("nn2")), ROUND).alias("cosine"),
        )
        .where(F.col("cosine") > tau)
    )
    best = F.min(
        F.struct(F.col("witness_id").alias("w"), F.col("cosine").alias("c"))
    )
    return (
        pairs.groupBy("vec_id", "cluster_id")
        .agg(
            best.alias("best"),
            F.count("*").alias("n_witnesses"),
        )
        .select(
            "vec_id",
            "cluster_id",
            F.col("best.w").alias("witness_id"),
            F.col("best.c").alias("witness_cosine"),
            F.col("n_witnesses").cast("bigint").alias("n_witnesses"),
        )
    )


PQ_M = 2        # subspaces
PQ_K = 8        # codes per subspace (per-vector storage: M log2(K) bits)
PQ_ITERS = 2


def _subspace(emb: DataFrame, i: int, sub_len: int) -> DataFrame:
    """The i-th orthogonal slice of the embedding column."""
    return emb.select(
        "vec_id",
        F.slice("embedding", i * sub_len + 1, sub_len).alias("embedding"),
    )


def _train_codebook(
    emb_i: DataFrame, k: int, iters: int
) -> list[tuple[int, list[float]]]:
    """The ONE copy of the seed+Lloyd train loop shared by pq_quantize and
    ivfpq_search — the cross-engine reproducibility contract (lowest-id
    seeds, round-6 grid) must not fork between the two oracles."""
    seeds = (
        emb_i.orderBy("vec_id")
        .limit(k)
        .select(_quantize("embedding").alias("cvec"))
        .collect()
    )
    cents = [(j, list(r["cvec"])) for j, r in enumerate(seeds)]
    if not cents:
        return []  # empty corpus: no seeds (callers return empty profiles)
    for _ in range(iters):
        cents = _update(_assign(emb_i, cents))
    return cents


def _assign_with_dist(
    emb: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, code, d): nearest centroid AND its squared-L2 distance
    (round-6) — the encode step where the residual distance is the
    quantization error."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist_to(
                        _cvec_lit(cvec),
                        F.col("embedding"),
                    ).alias("d"),
                    F.lit(cid).alias("c"),
                )
                for cid, cvec in centroids
            ]
        )
    )
    return emb.select(
        "vec_id",
        best["c"].alias("code"),
        F.round(best["d"], ROUND).alias("d"),
    )


def pq_quantize(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    dims: int = 64,
) -> DataFrame:
    """(code0, code1, n_vectors, avg_sq_error): product quantization
    (Jegou et al. 2011) — split each embedding into m orthogonal
    subspaces, train an independent portable KMeans codebook per
    subspace, encode every vector as its m nearest-code tuple, and
    profile the quantization distortion per code cell. The encoded
    corpus stores m·log2(k) BITS per vector instead of dims·32 — the
    compression layer an IVF-PQ index builds its ADC lookup tables on.

    Every step inherits the clustering.py reproducibility contract
    (lowest-id seeds, sequential-fold distances, lexicographic argmin,
    round-6 decimal grid), so the full train→encode→profile pipeline is
    oracle-checked in :func:`pq_sql`.

    Scale shape: training touches only dims/m-wide slices (narrow
    projections of the same scan); encoding is one pass with broadcast
    codebook literals — NO shuffle; the per-vector code join keys on
    vec_id and the final profile groups by the (k^m)-cell code tuple,
    both bounded exchanges. Per-iteration driver state is m·k·(dims/m)
    doubles = one codebook."""
    emb = _fan_in(emb)
    sub_len = dims // m
    encoded: DataFrame | None = None
    for i in range(m):
        emb_i = _subspace(emb, i, sub_len)
        cents = _train_codebook(emb_i, k, iters)
        if not cents:
            # empty corpus (P9): empty profile, matching rq_quantize
            return emb.sparkSession.createDataFrame(
                [],
                ", ".join(f"code{j} int" for j in range(m))
                + ", n_vectors bigint, avg_sq_error double",
            )
        enc = _assign_with_dist(emb_i, cents).select(
            "vec_id",
            F.col("code").alias(f"code{i}"),
            F.col("d").alias(f"d{i}"),
        )
        encoded = enc if encoded is None else encoded.join(enc, "vec_id")
    total = F.round(
        sum(F.col(f"d{i}") for i in range(m)), ROUND
    ).cast("decimal(18,6)")
    return (
        encoded.groupBy(*[f"code{i}" for i in range(m)])
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(
                F.sum(total).cast("double") / F.count("*"), ROUND
            ).alias("avg_sq_error"),
        )
    )


def _lloyd_chain_ctes(
    tag: str, k: int, iters: int, sub_len: int,
    code_col: str, d_col: str,
) -> list[str]:
    """CTE chain `{tag}_cents0..{iters}` + `{tag}_enc(vec_id, code, d)`
    over an EXISTING CTE named `{tag}_sub(vec_id, sub)` — the one Lloyd
    train+encode text shared by PQ (per-subspace slices) and RQ (full
    vectors, then stage-1 residuals)."""
    quant = f"list_transform(sub, km_x -> round(CAST(km_x AS DOUBLE), {ROUND}))"
    dist = _sql_dist("e.sub", "c.cvec", sub_len)
    parts = [
        f"""{tag}_cents0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         {quant} AS cvec
  FROM (SELECT * FROM {tag}_sub ORDER BY vec_id LIMIT {k})
)""",
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""{tag}_assign{it} AS (
  SELECT e.vec_id, e.sub,
         (min({{'d': {dist}, 'c': c.cluster_id}})).c AS cluster_id
  FROM {tag}_sub e, {tag}_cents{it - 1} c
  GROUP BY e.vec_id, e.sub
)"""
        )
        parts.append(
            f"""{tag}_cents{it} AS (
  SELECT cluster_id, list(component ORDER BY dim) AS cvec
  FROM (
    SELECT cluster_id, km_j - 1 AS dim,
           round(CAST(sum(CAST(round(CAST(sub[km_j] AS DOUBLE),
                                     {ROUND}) AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), {ROUND}) AS component
    FROM {tag}_assign{it}, generate_series(1, {sub_len}) AS t(km_j)
    GROUP BY cluster_id, km_j
  ) GROUP BY cluster_id
)"""
        )
    parts.append(
        f"""{tag}_enc AS (
  SELECT e.vec_id,
         (min({{'d': {dist}, 'c': c.cluster_id}})).c AS {code_col},
         round((min({{'d': {dist}, 'c': c.cluster_id}})).d, {ROUND}) AS {d_col}
  FROM {tag}_sub e, {tag}_cents{iters} c
  GROUP BY e.vec_id, e.sub
)"""
    )
    return parts


def _pq_subspace_ctes(
    i: int, start: int, end: int, k: int, iters: int, sub_len: int
) -> list[str]:
    return [
        f"""s{i}_sub AS (
  SELECT vec_id, list_slice(embedding, {start}, {end}) AS sub
  FROM embeddings
)""",
    ] + _lloyd_chain_ctes(f"s{i}", k, iters, sub_len, f"code{i}", f"d{i}")


def pq_sql(
    m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS, dims: int = 64
) -> str:
    sub_len = dims // m
    parts: list[str] = []
    for i in range(m):
        parts.extend(
            _pq_subspace_ctes(
                i, i * sub_len + 1, (i + 1) * sub_len, k, iters, sub_len
            )
        )
    codes = ", ".join(f"s{i}_enc.code{i}" for i in range(m))
    dsum = " + ".join(f"s{i}_enc.d{i}" for i in range(m))
    joins = "s0_enc" + "".join(
        f" JOIN s{i}_enc USING (vec_id)" for i in range(1, m)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT {codes}, count(*) AS n_vectors,
       round(CAST(sum(CAST(round({dsum}, {ROUND}) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*), {ROUND}) AS avg_sq_error
FROM {joins}
GROUP BY {codes}
"""
    )


def _pq_codebooks(
    emb: DataFrame, m: int, k: int, iters: int, dims: int
) -> list[tuple[DataFrame, list[tuple[int, list[float]]]]]:
    """Per subspace: (encoded (vec_id, code{i}) DataFrame, trained
    centroid list), via the shared :func:`_train_codebook` loop."""
    sub_len = dims // m
    out = []
    for i in range(m):
        emb_i = _subspace(emb, i, sub_len)
        cents = _train_codebook(emb_i, k, iters)
        if not cents:
            # empty corpus (P9): no codebooks — callers emit empty
            # profiles (an F.array() of zero centroid literals would
            # fail analysis, caught by the staged empty-input gate)
            return []
        enc = _assign(emb_i, cents).select(
            "vec_id", F.col("cluster_id").alias(f"code{i}")
        )
        out.append((enc, cents))
    return out


def _col_dist(a_col, b_col):
    """Sequential-fold squared L2 between two array columns (same order
    as _dist_to / _sql_dist)."""
    return F.aggregate(
        F.zip_with(
            a_col, b_col, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivfpq_search(
    emb: DataFrame,
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    m: int = PQ_M,
    pq_k: int = PQ_K,
    pq_iters: int = PQ_ITERS,
    topk: int = IVF_K_NEIGHBORS,
    dims: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, adc_dist, rk): IVF-PQ search — the coarse
    KMeans lists bound the candidate set (nprobe=1, ivf_search's shape)
    and the ranking distance is ASYMMETRIC: raw query sub-vector vs the
    PQ centroid of the neighbor's code in each subspace, summed (ADC,
    Jegou et al. 2011). Neighbors are ranked by (round-6 adc asc, id
    asc). PQ is trained on raw vectors, not coarse residuals — the
    residual variant needs per-list codebooks, which would break the
    shared-codebook broadcast; documented deviation from FAISS's IVFPQ.

    Scale shape: candidates Σ|list|² via the cluster equi-join; the
    neighbor side carries only its m·log2(k)-bit code tuple (the point
    of PQ — the raw matrix never joins), codes and centroid tables
    broadcast; per-pair cost is the m fold distances. Approximate BY
    DESIGN twice over (coarse pruning + quantized distance); the oracle
    runs the SAME lists and codebooks so the check is exact, and recall
    vs brute force is the operator test's job."""
    emb = _fan_in(emb)  # shared by the coarse train AND the PQ trains
    lists = _final_lists(emb, k, iters)
    spark = emb.sparkSession
    sub_len = dims // m
    a = lists.select(
        "cluster_id", F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
    )
    b = lists.select("cluster_id", F.col("vec_id").alias("neighbor_id"))
    pairs = a.join(b, "cluster_id").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    adc = None
    for i, (enc, cents) in enumerate(_pq_codebooks(emb, m, pq_k, pq_iters, dims)):
        cent_df = spark.createDataFrame(
            [(cid, cvec) for cid, cvec in cents],
            f"code{i} int, cvec{i} array<double>",
        )
        pairs = pairs.join(
            F.broadcast(enc),
            enc["vec_id"] == pairs["neighbor_id"],
        ).drop("vec_id").join(F.broadcast(cent_df), f"code{i}")
        d = _col_dist(
            F.slice("qe", i * sub_len + 1, sub_len), F.col(f"cvec{i}")
        )
        adc = d if adc is None else adc + d
    ranked = pairs.select(
        "query_id", "neighbor_id", F.round(adc, ROUND).alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= topk)
        .select(
            "query_id", "neighbor_id", "adc_dist",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def ivfpq_sql(
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    m: int = PQ_M,
    pq_k: int = PQ_K,
    pq_iters: int = PQ_ITERS,
    topk: int = IVF_K_NEIGHBORS,
    dims: int = 64,
) -> str:
    sub_len = dims // m
    parts = [_lists_sql_prefix(k, iters, dims).removeprefix("WITH ")]
    for i in range(m):
        parts.extend(
            _pq_subspace_ctes(
                i, i * sub_len + 1, (i + 1) * sub_len, pq_k, pq_iters, sub_len
            )
        )
    enc_joins = "".join(
        f"\n  JOIN s{i}_enc e{i} ON e{i}.vec_id = p.neighbor_id"
        f"\n  JOIN s{i}_cents{pq_iters} c{i} ON c{i}.cluster_id = e{i}.code{i}"
        for i in range(m)
    )
    dsum = " + ".join(
        _sql_dist(
            f"list_slice(p.qe, {i * sub_len + 1}, {(i + 1) * sub_len})",
            f"c{i}.cvec",
            sub_len,
        )
        for i in range(m)
    )
    parts.append(
        """pq_pairs AS (
  SELECT a.vec_id AS query_id, a.embedding AS qe, b.vec_id AS neighbor_id,
         a.cluster_id
  FROM lists a JOIN lists b USING (cluster_id)
  WHERE a.vec_id <> b.vec_id
)"""
    )
    parts.append(
        f"""adc AS (
  SELECT p.query_id, p.neighbor_id,
         round({dsum}, {ROUND}) AS adc_dist
  FROM pq_pairs p{enc_joins}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, neighbor_id, adc_dist, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_dist, neighbor_id) AS rk
  FROM adc
) WHERE rk <= {topk}
"""
    )


def semdedup_sql(
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    tau: float = SEMDEDUP_TAU,
    dims: int = 64,
) -> str:
    return (
        _lists_sql_prefix(k, iters, dims)
        + f""",
sd_pairs AS (
  SELECT a.vec_id, a.cluster_id, b.vec_id AS witness_id,
         {_sql_pair_cosine(dims)} AS cosine
  FROM lists a JOIN lists b USING (cluster_id)
  WHERE b.vec_id < a.vec_id
)
SELECT vec_id, cluster_id,
       (min({{'w': witness_id, 'c': cosine}})).w AS witness_id,
       (min({{'w': witness_id, 'c': cosine}})).c AS witness_cosine,
       count(*) AS n_witnesses
FROM sd_pairs
WHERE cosine > {tau}
GROUP BY vec_id, cluster_id
"""
    )


# ---------------------------------------------------------------------------
# DBSCAN (grid-accelerated density clustering on the 2D JL projection)
# ---------------------------------------------------------------------------

DBSCAN_EPS = 0.3
DBSCAN_MINPTS = 5


def _proj_sign_case(k: int, dim_sql: str) -> str:
    """SQL ±1 sign for (1-based dim, k): bit 16 of m²·12289 over the
    combined index m = dim·73 + (k+1)·1009 — MUST stay in lockstep with
    sim_random_projection (plans/queries_corpus.py); a parity test pins
    the two implementations against each other (tests/test_wave14.py)."""
    m = f"({dim_sql} * 73 + {(k + 1) * 1009})"
    return (
        f"(CASE WHEN floor(({m} * {m} * 12289) / 65536) % 2 = 0"
        " THEN 1.0 ELSE -1.0 END)"
    )


def proj2d_expr(k: int):
    """Spark column: round-6 projection of `embedding` onto sign row k
    (same quadratic-mix matrix as sim_random_projection)."""
    e = F.col("embedding").cast("array<double>")
    return F.round(
        F.aggregate(
            F.zip_with(
                e,
                F.sequence(F.lit(0), F.size("embedding") - 1),
                lambda v, d: v
                * F.when(
                    F.floor(
                        ((d + 1) * 73 + (k + 1) * 1009).cast("long")
                        * ((d + 1) * 73 + (k + 1) * 1009).cast("long")
                        * F.lit(12289).cast("long")
                        / 65536
                    )
                    % 2
                    == 0,
                    1.0,
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        6,
    ).cast("double")


def _proj2d_sql(k: int) -> str:
    return f"""round(list_reduce(
  list_prepend(CAST(0.0 AS DOUBLE),
    list_transform(generate_series(1, len(embedding)),
      d -> CAST(embedding[d] AS DOUBLE) * {_proj_sign_case(k, 'd')})),
  (a, x) -> a + x), 6)"""


def dbscan(
    emb: DataFrame,
    eps: float = DBSCAN_EPS,
    min_pts: int = DBSCAN_MINPTS,
    max_iterations: int = 60,
) -> DataFrame:
    """(vec_id, role, cluster) — DBSCAN over the 2D JL projection of the
    embedding column: role in {'core','border','noise'}; cluster is the
    MIN core vec_id of the density-connected component (NULL for noise).
    Classic semantics: |N_eps(p)| counts p itself; border points attach
    to the MIN cluster id among their core neighbors (deterministic tie
    rule); boundary distance uses <= eps.

    Spark-first shape (the 100 TB density-clustering plan):
    1. Project to 2D with the shared quadratic-mix sign matrix — array-
       local math, zero shuffle (see sim_random_projection).
    2. Grid-bucket at cell size eps; each point probes its 3x3 cell
       neighborhood via ONE equi-join on the cell key (explode to 9
       neighbor keys). Any pair within eps shares adjacent cells, so
       recall is exact; shuffle is 9n rows, never n². Per-task pair work
       is bounded by cell occupancy (eps-packing), the grid analog of the
       LSH viral-bucket guard.
    3. Exact distance filter + per-point neighbor count (one hash agg)
       -> core flags.
    4. Density connectivity = connected components over CORE-CORE
       eps-edges, reusing dedup's min-label propagation with pointer
       jumping (~O(log diameter) rounds; the diameter-18 fixture blob
       converges in 7).
    5. Border points take min(component) over adjacent cores with one
       more equi-join; everything else is noise.

    The DuckDB oracle (dbscan_sql) is the unpruned O(n²) brute force with
    a recursive-CTE closure — the grid path must reproduce it exactly.
    """
    from . import dedup as _dedup

    # spread (r13): the quadratic-mix 2D projection is a per-row HOF fold
    # over all dims — interpreted, not codegen'd — and ran single-task
    # behind the one-split scan; the rebalance parallelizes it into the
    # persist (guide §2.5 input skew).
    pts = persist_tracked(
        spread(emb).select(
            "vec_id",
            proj2d_expr(0).alias("px"),
            proj2d_expr(1).alias("py"),
        ).select(
            "vec_id",
            "px",
            "py",
            F.floor(F.col("px") / eps).cast("long").alias("cx"),
            F.floor(F.col("py") / eps).cast("long").alias("cy"),
        )
    )
    offsets = F.expr(
        "array(-1L, 0L, 1L)"
    )
    probes = (
        pts.select(
            F.col("vec_id").alias("a_id"),
            F.col("px").alias("ax"),
            F.col("py").alias("ay"),
            F.explode(offsets).alias("dx"),
            "cx",
            "cy",
        )
        .select(
            "a_id",
            "ax",
            "ay",
            (F.col("cx") + F.col("dx")).alias("jx"),
            "cy",
        )
        .select(
            "a_id", "ax", "ay", "jx",
            F.explode(offsets).alias("dy"),
            "cy",
        )
        .select(
            "a_id", "ax", "ay", "jx",
            (F.col("cy") + F.col("dy")).alias("jy"),
        )
    )
    build = pts.select(
        F.col("vec_id").alias("b_id"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    pairs = persist_tracked(
        probes.join(build, ["jx", "jy"])
        .where(F.col("a_id") != F.col("b_id"))
        .where(d2 <= F.lit(eps) * F.lit(eps))
        .select("a_id", "b_id")
    )
    flags = persist_tracked(
        pts.select("vec_id")
        .join(
            pairs.groupBy("a_id").agg(F.count(F.lit(1)).alias("n_others")),
            pts["vec_id"] == F.col("a_id"),
            "left",
        )
        .select(
            "vec_id",
            (F.coalesce(F.col("n_others"), F.lit(0)) + 1 >= min_pts).alias(
                "is_core"
            ),
        )
    )
    cores = flags.where("is_core").select(F.col("vec_id").alias("doc_id"))
    a_core = flags.select(
        F.col("vec_id").alias("a_id"), F.col("is_core").alias("a_core")
    )
    b_core = flags.select(
        F.col("vec_id").alias("b_id"), F.col("is_core").alias("b_core")
    )
    tagged = persist_tracked(
        pairs.join(a_core, "a_id").join(b_core, "b_id")
    )
    core_edges = (
        tagged.where(F.col("a_core") & F.col("b_core") & (F.col("a_id") < F.col("b_id")))
        .select(F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b"))
    )
    comp = _dedup.connected_components(
        cores, core_edges, max_iterations=max_iterations
    ).select(F.col("doc_id").alias("core_id"), F.col("component").alias("cluster"))
    core_rows = (
        flags.where("is_core")
        .join(comp, flags["vec_id"] == F.col("core_id"))
        .select("vec_id", F.lit("core").alias("role"), "cluster")
    )
    border_rows = (
        tagged.where(~F.col("a_core") & F.col("b_core"))
        .join(comp, F.col("b_id") == F.col("core_id"))
        .groupBy("a_id")
        .agg(F.min("cluster").alias("cluster"))
        .select(
            F.col("a_id").alias("vec_id"),
            F.lit("border").alias("role"),
            "cluster",
        )
    )
    noise_rows = (
        flags.where(~F.col("is_core"))
        .join(border_rows.select("vec_id"), "vec_id", "left_anti")
        .select(
            "vec_id",
            F.lit("noise").alias("role"),
            F.lit(None).cast("long").alias("cluster"),
        )
    )
    return (
        core_rows.unionByName(border_rows)
        .unionByName(noise_rows)
        .select(
            "vec_id",
            "role",
            F.col("cluster").cast("bigint").alias("cluster"),
        )
        .orderBy("vec_id")
    )


def dbscan_sql(eps: float = DBSCAN_EPS, min_pts: int = DBSCAN_MINPTS) -> str:
    """DuckDB twin: unpruned O(n²) neighbor join + recursive-CTE closure
    over core-core edges (fine at oracle scale; the Spark side is the
    grid-pruned form)."""
    return f"""
WITH RECURSIVE pts AS (
  SELECT vec_id, {_proj2d_sql(0)} AS px, {_proj2d_sql(1)} AS py
  FROM embeddings
),
prs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM pts a JOIN pts b
    ON a.vec_id != b.vec_id
   AND (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)
       <= {eps} * {eps}
),
flags AS (
  SELECT p.vec_id,
         (coalesce(n.n_others, 0) + 1 >= {min_pts}) AS is_core
  FROM pts p
  LEFT JOIN (SELECT a_id, count(*) AS n_others FROM prs GROUP BY a_id) n
    ON p.vec_id = n.a_id
),
core_edges AS (
  SELECT a_id AS src, b_id AS dst FROM prs
  JOIN flags fa ON prs.a_id = fa.vec_id AND fa.is_core
  JOIN flags fb ON prs.b_id = fb.vec_id AND fb.is_core
),
reach(src, dst) AS (
  SELECT vec_id, vec_id FROM flags WHERE is_core
  UNION
  SELECT r.src, e.dst FROM reach r JOIN core_edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS core_id, min(dst) AS cluster FROM reach GROUP BY src
),
core_rows AS (
  SELECT f.vec_id, 'core' AS role, c.cluster
  FROM flags f JOIN comp c ON f.vec_id = c.core_id
  WHERE f.is_core
),
border_rows AS (
  SELECT p.a_id AS vec_id, 'border' AS role, min(c.cluster) AS cluster
  FROM prs p
  JOIN flags fa ON p.a_id = fa.vec_id AND NOT fa.is_core
  JOIN flags fb ON p.b_id = fb.vec_id AND fb.is_core
  JOIN comp c ON p.b_id = c.core_id
  GROUP BY p.a_id
),
noise_rows AS (
  SELECT f.vec_id, 'noise' AS role, CAST(NULL AS BIGINT) AS cluster
  FROM flags f
  WHERE NOT f.is_core
    AND f.vec_id NOT IN (SELECT vec_id FROM border_rows)
)
SELECT vec_id, role, CAST(cluster AS BIGINT) AS cluster FROM core_rows
UNION ALL SELECT * FROM border_rows
UNION ALL SELECT * FROM noise_rows
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# residual quantization (2-stage, built r9, staged r10)
# ---------------------------------------------------------------------------

RQ_K = 8
RQ_ITERS = 2


def rq_quantize(
    emb: DataFrame, k: int = RQ_K, iters: int = RQ_ITERS, dims: int = 64
) -> DataFrame:
    """(code0, code1, n_vectors, avg_sq_error): residual quantization —
    stage 1 trains a portable-KMeans codebook on the FULL vectors and
    encodes each; stage 2 trains a second codebook on the stage-1
    RESIDUALS (x - c1) and encodes those. Where PQ splits dimensions
    orthogonally, RQ composes codebooks SEQUENTIALLY — the reconstruction
    c1 + c2 refines additively, the compression family behind modern
    additive/residual ANN indexes. Distortion (mean round-6 squared L2 of
    the FINAL residual) falls monotonically-in-expectation vs stage 1
    alone, which the named test pins on planted clusters.

    Same reproducibility contract as pq_quantize (lowest-id seeds,
    sequential-fold distances, lexicographic argmin, round-6 grid);
    residual components are x(float32-exact) minus round-6 centroid
    literals — identical IEEE operands cross-engine.

    Scale shape: two Lloyd trains (each one scan per iteration with a
    k-row broadcast state), two broadcast-literal encode passes, one
    vec_id join, one (k*k)-cell profile combine. No stage shuffles
    vectors by anything but vec_id."""
    full = _fan_in(emb.select("vec_id", "embedding"))
    c1 = _train_codebook(full, k, iters)
    if not c1:
        # empty corpus: no seeds, no codebook — an empty profile, not a
        # crash (array_min over zero centroid literals is untyped VOID)
        return emb.sparkSession.createDataFrame(
            [],
            "code0 int, code1 int, n_vectors bigint, avg_sq_error double",
        )
    enc1 = _assign_with_dist(full, c1).select(
        "vec_id", F.col("code").alias("code0")
    )
    # centroid lookup keyed BY CLUSTER ID, not position: _update drops
    # empty clusters, so ids can be non-contiguous (two seeds quantizing
    # identically empties one) — a positional element_at(code0+1) would
    # fetch the wrong centroid or NULL while the SQL twin joins on
    # cluster_id and stays right (r9 review finding)
    cent_map = F.map_from_arrays(
        F.lit([int(cid) for cid, _ in c1]),
        F.array(*[_cvec_lit(cvec) for _cid, cvec in c1]),
    )
    # persisted (r13): the residual relation feeds the ENTIRE stage-2
    # Lloyd train (seed collect + iters×(assign,update) jobs) plus the
    # encode and the final profile — without it every one of those jobs
    # re-runs the stage-1 join + residual subtraction.
    res = persist_tracked(
        full.join(enc1, "vec_id")
        .select(
            "vec_id",
            "code0",
            F.zip_with(
                "embedding",
                F.element_at(cent_map, F.col("code0")),
                lambda x, c: x.cast("double") - c,
            ).alias("embedding"),
        )
    )
    c2 = _train_codebook(res.select("vec_id", "embedding"), k, iters)
    enc2 = _assign_with_dist(res.select("vec_id", "embedding"), c2).select(
        "vec_id", F.col("code").alias("code1"), "d"
    )
    return (
        res.select("vec_id", "code0")
        .join(enc2, "vec_id")
        .groupBy("code0", "code1")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(
                F.sum(F.col("d").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                ROUND,
            ).alias("avg_sq_error"),
        )
    )


def rq_sql(k: int = RQ_K, iters: int = RQ_ITERS, dims: int = 64) -> str:
    parts = [
        """r0_sub AS (
  SELECT vec_id, embedding AS sub FROM embeddings
)""",
    ]
    parts += _lloyd_chain_ctes("r0", k, iters, dims, "code0", "d0")
    parts.append(
        f"""r1_sub AS (
  SELECT e.vec_id,
         list_transform(generate_series(1, {dims}),
           rq_j -> CAST(e.sub[rq_j] AS DOUBLE) - c.cvec[rq_j]) AS sub
  FROM r0_sub e
  JOIN r0_enc x ON x.vec_id = e.vec_id
  JOIN r0_cents{iters} c ON c.cluster_id = x.code0
)"""
    )
    parts += _lloyd_chain_ctes("r1", k, iters, dims, "code1", "d1")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT x0.code0, x1.code1, count(*) AS n_vectors,
       round(CAST(sum(CAST(x1.d1 AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), {ROUND}) AS avg_sq_error
FROM r0_enc x0 JOIN r1_enc x1 USING (vec_id)
GROUP BY x0.code0, x1.code1
"""
    )


# ---------------------------------------------------------------------------
# PQ asymmetric-distance (ADC) top-k scan — the serving path PQ exists for
# ---------------------------------------------------------------------------

ADC_QUERY_MOD = 97   # vec_id % MOD == 0 -> the query set
ADC_TOPK = 10


def pq_adc_scan(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    dims: int = 64,
    topk: int = ADC_TOPK,
) -> DataFrame:
    """(query_id, vec_id, adist, rank): asymmetric distance computation
    (Jegou et al. 2011, the reason PQ exists) — each query vector
    builds one k-entry LOOKUP TABLE per subspace (exact distances from
    the query's subvector to that subspace's k centroids), and the
    approximate distance to ANY encoded vector is the sum of m table
    lookups by the vector's stored codes: Q·m·k real distance
    computations + Q·N·m integer lookups instead of Q·N·dims
    multiplies. Top-{topk} per query by (adist, vec_id), self
    excluded. LUT entries are round-{ROUND} DECIMALs and the per-pair
    distance is their EXACT decimal sum, so nothing is order-dependent.

    Scale shape: codebooks train on dims/m-wide projections (the PQ
    pipeline); the Q×(m·k) LUT relation is broadcast-sized; the scan
    joins the code table against the LUTs on (code_i) equi-keys — at
    100 TB this is the per-list scan inside an IVF-PQ index (the IVF
    stage bounds N; THIS operator is the inner loop, here run over the
    full corpus as its own witness)."""
    emb = _fan_in(emb)
    spark = emb.sparkSession
    sub_len = dims // m
    books = _pq_codebooks(emb, m, k, iters, dims)
    if not books or not books[0][1]:
        return spark.createDataFrame(
            [], "query_id long, vec_id long, adist double, rank int"
        )
    queries = emb.where(F.col("vec_id") % ADC_QUERY_MOD == 0)
    codes: DataFrame | None = None
    for enc, _ in books:
        codes = enc if codes is None else codes.join(enc, "vec_id")
    joined = codes
    for i, (_, cents) in enumerate(books):
        q_sub = _subspace(queries, i, sub_len).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("sub")
        )
        lut = q_sub.select(
            "qid",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(cid).alias("code"),
                            F.round(
                                _dist_to(_cvec_lit(cvec), F.col("sub")),
                                ROUND,
                            )
                            .cast("decimal(18,6)")
                            .alias("ld"),
                        )
                        for cid, cvec in cents
                    ]
                )
            ).alias("e"),
        ).select("qid", F.col("e.code").alias(f"code{i}"),
                 F.col("e.ld").alias(f"ld{i}"))
        on = [f"code{i}"] + (["qid"] if i > 0 else [])
        joined = joined.join(F.broadcast(lut), on)
    adist = sum(F.col(f"ld{i}") for i in range(m)).cast("decimal(18,6)")
    pairs = joined.where(F.col("vec_id") != F.col("qid")).select(
        F.col("qid").alias("query_id"), "vec_id", adist.alias("ad")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("ad", "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            "query_id", "vec_id",
            F.col("ad").cast("double").alias("adist"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_adc_sql(
    m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS, dims: int = 64,
    topk: int = ADC_TOPK,
) -> str:
    sub_len = dims // m
    parts: list[str] = []
    for i in range(m):
        parts.extend(
            _pq_subspace_ctes(
                i, i * sub_len + 1, (i + 1) * sub_len, k, iters, sub_len
            )
        )
        parts.append(
            f"""q{i}_sub AS (
  SELECT vec_id AS qid,
         list_slice(embedding, {i * sub_len + 1}, {(i + 1) * sub_len}) AS sub
  FROM embeddings WHERE vec_id % {ADC_QUERY_MOD} = 0
)"""
        )
        parts.append(
            f"""lut{i} AS (
  SELECT q.qid, c.cluster_id AS code{i},
         CAST(round({_sql_dist('q.sub', 'c.cvec', sub_len)}, {ROUND})
              AS DECIMAL(18,6)) AS ld{i}
  FROM q{i}_sub q, s{i}_cents{iters} c
)"""
        )
    joins = "s0_enc e0" + "".join(
        f" JOIN s{i}_enc e{i} USING (vec_id)" for i in range(1, m)
    )
    lut_joins = " JOIN lut0 ON lut0.code0 = e0.code0" + "".join(
        f" JOIN lut{i} ON lut{i}.code{i} = e{i}.code{i}"
        f" AND lut{i}.qid = lut0.qid"
        for i in range(1, m)
    )
    adsum = " + ".join(f"lut{i}.ld{i}" for i in range(m))
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
pairs AS (
  SELECT lut0.qid AS query_id, e0.vec_id,
         CAST({adsum} AS DECIMAL(18,6)) AS ad
  FROM {joins}{lut_joins}
  WHERE e0.vec_id <> lut0.qid
),
ranked AS (
  SELECT query_id, vec_id, ad,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ad, vec_id) AS rk
  FROM pairs
)
SELECT query_id, vec_id, CAST(ad AS DOUBLE) AS adist, CAST(rk AS INT) AS rank
FROM ranked WHERE rk <= {topk}
"""
    )
