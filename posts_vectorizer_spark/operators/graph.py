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


# ---------------------------------------------------------------------------
# HITS hubs & authorities (r11-built, staged r12) — PageRank's directed
# companion on the RAW (non-mutualized) top-k graph, where out-links
# (u ranks v) and in-links (v is ranked) genuinely differ, so hub and
# authority scores separate. Kleinberg 1999.
# ---------------------------------------------------------------------------

HITS_K = PR_K
HITS_ITERS = 2
HITS_ROUND = 9       # score grid (post-normalization)


def _directed_edges(emb: DataFrame, k: int) -> DataFrame:
    """(src, dst): u -> v iff v is in u's top-k — every vertex has
    out-degree k; in-degree varies (popular vectors collect links),
    which is exactly the asymmetry HITS measures."""
    t = similarity.topk(emb, k)
    return t.select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )


def hits_knn(
    emb: DataFrame, k: int = HITS_K, iters: int = HITS_ITERS
) -> DataFrame:
    """HITS over the exact brute-force top-k edge list — the eval-sized
    ground-truth witness (the adamic_adar/pagerank convention: the
    quadratic is entirely the exact kNN edge build; the corpus-scale
    production form is :func:`hits_from_edges` over `lsh_ann` lists —
    sim_hits_ann)."""
    return hits_from_edges(_directed_edges(emb, k), iters)


def hits_from_edges(edges: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """(vec_id, out_deg, in_deg, hub, authority) after `iters` unrolled
    HITS steps with L1 normalization, over ANY (src, dst) edge list.

    Reproducibility contract (mirrored step-for-step in hits_sql):
    - init: hub₀ = 1.0 exactly for every vertex;
    - authority step: a_raw(v) = Σ_{u→v} hub(u) with every hub value on
      the round-9 grid CAST to DECIMAL(28,9) before the sum (exact,
      order-free), then L1-normalize: a = round(a_raw / Σ a_raw, 9) —
      the Σ is an exact DECIMAL sum converted once to double (scaled
      units ≤ n·1e9 < 2^53, no conversion hazard);
    - hub step: symmetric over outgoing edges with the fresh a;
    - vertices the step leaves without incoming (resp. outgoing) edges
      take score 0 via left joins — kept in the output, never dropped.

    Scale shape (per half-step): one edge-keyed projection, one
    dst-keyed exchange with map-side DECIMAL partial sums, one 1-row
    broadcast total — the canonical distributed power-iteration plan;
    state is two doubles per vertex. The edge list is persisted up
    front: the degree tables plus 2·iters half-steps each consume it,
    and without the persist every consumer re-executes the PRODUCER
    (the exact kernel or the LSH bucket join) — measured 6x the
    producer cost at 10x data before this pin."""
    from ..cache import checkpoint_tracked, persist_tracked

    # edges is checkpointed, not just persisted: every half-step consumer
    # re-PLANS the producer's full analyzed tree even when the data is
    # cached, and for the LSH-ann producer that driver-side optimizer/AQE
    # cost dominated wall clock (~85 of 90 s off-task, r12 profile). The
    # localCheckpoint leaf makes each consumer's plan edge-list-sized.
    edges = checkpoint_tracked(edges)
    outd = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    ind = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))
    # verts is consumed 2·iters + 1 times (every score join + the final
    # output); each a_raw/h_raw twice (its 1-row total + the score join);
    # each auth/hub by the NEXT half-step and the output. Without these
    # vertex-sized persists the unrolled lineage re-executes the whole
    # upstream tree per consumer — measured r12: sim_hits_ann (LSH edge
    # producer above the edge cache re-ran per level) 46.8 s -> the
    # persisted form's seconds (r12 optimization pass; guide §7.2).
    verts = persist_tracked(
        outd.select(F.col("src").alias("vec_id"), "out_deg")
        .join(
            ind.select(F.col("dst").alias("vec_id"), "in_deg"),
            "vec_id",
            "full_outer",
        )
        .select(
            "vec_id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )
    hub = verts.select("vec_id", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(iters):
        # authority half-step from current hubs
        a_raw = persist_tracked(
            edges.join(hub, edges["src"] == hub["vec_id"])
            .select("dst", F.col("h").cast("decimal(28,9)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("a_raw"))
        )
        a_tot = a_raw.agg(
            F.sum("a_raw").cast("decimal(38,9)").alias("ta")
        )
        auth = checkpoint_tracked(
            verts.join(
                a_raw, verts["vec_id"] == a_raw["dst"], "left"
            )
            .crossJoin(F.broadcast(a_tot))
            .select(
                "vec_id",
                F.round(
                    F.coalesce(
                        F.col("a_raw").cast("double"), F.lit(0.0)
                    )
                    / F.col("ta").cast("double"),
                    HITS_ROUND,
                ).alias("a"),
            )
        )
        # hub half-step from fresh authorities
        h_raw = persist_tracked(
            edges.join(auth, edges["dst"] == auth["vec_id"])
            .select(
                F.col("src").alias("v"),
                F.col("a").cast("decimal(28,9)").alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("h_raw"))
        )
        h_tot = h_raw.agg(
            F.sum("h_raw").cast("decimal(38,9)").alias("th")
        )
        hub = checkpoint_tracked(
            verts.join(h_raw, verts["vec_id"] == h_raw["v"], "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "vec_id",
                F.round(
                    F.coalesce(
                        F.col("h_raw").cast("double"), F.lit(0.0)
                    )
                    / F.col("th").cast("double"),
                    HITS_ROUND,
                ).alias("h"),
            )
        )
    return (
        verts.join(hub, "vec_id")
        .join(auth, "vec_id")
        .select(
            "vec_id",
            F.col("out_deg").cast("bigint").alias("out_deg"),
            F.col("in_deg").cast("bigint").alias("in_deg"),
            F.col("h").alias("hub"),
            F.col("a").alias("authority"),
        )
    )


def hits_sql(k: int = HITS_K, iters: int = HITS_ITERS) -> str:
    """Oracle twin of hits_knn (exact top-k edges)."""
    return hits_sql_from(
        [
            f"t AS ({similarity.topk_sql(k)})",
            "edges AS (SELECT query_id AS src, neighbor_id AS dst FROM t)",
        ],
        iters,
    )


def hits_ann_sql(dims: int, k: int, iters: int = HITS_ITERS) -> str:
    """Oracle twin of the lsh_ann-backed production form (same lists,
    exact over the declared candidate set — the sim_lsh_ann pattern)."""
    return hits_sql_from(
        [
            f"t AS ({similarity.lsh_ann_sql(dims, k)})",
            "edges AS (SELECT query_id AS src, neighbor_id AS dst FROM t)",
        ],
        iters,
    )


def hits_sql_from(edge_parts: list[str], iters: int = HITS_ITERS) -> str:
    parts = edge_parts + [
        """outd AS (SELECT src AS vec_id, count(*) AS out_deg
  FROM edges GROUP BY src)""",
        """ind AS (SELECT dst AS vec_id, count(*) AS in_deg
  FROM edges GROUP BY dst)""",
        """verts AS (
  SELECT COALESCE(o.vec_id, i.vec_id) AS vec_id,
         COALESCE(o.out_deg, 0) AS out_deg,
         COALESCE(i.in_deg, 0) AS in_deg
  FROM outd o FULL OUTER JOIN ind i ON o.vec_id = i.vec_id
)""",
        "h0 AS (SELECT vec_id, 1.0 AS h FROM verts)",
    ]
    prev_h = "h0"
    auth = None
    for it in range(1, iters + 1):
        parts.append(
            f"""ar{it} AS (
  SELECT e.dst, sum(CAST(p.h AS DECIMAL(28,9))) AS a_raw
  FROM edges e JOIN {prev_h} p ON e.src = p.vec_id GROUP BY e.dst
)"""
        )
        parts.append(
            f"at{it} AS (SELECT CAST(sum(a_raw) AS DECIMAL(38,9)) AS ta"
            f" FROM ar{it})"
        )
        parts.append(
            f"""a{it} AS (
  SELECT v.vec_id,
         round(COALESCE(CAST(r.a_raw AS DOUBLE), 0.0)
               / CAST(t.ta AS DOUBLE), {HITS_ROUND}) AS a
  FROM verts v LEFT JOIN ar{it} r ON v.vec_id = r.dst, at{it} t
)"""
        )
        parts.append(
            f"""hr{it} AS (
  SELECT e.src AS v, sum(CAST(p.a AS DECIMAL(28,9))) AS h_raw
  FROM edges e JOIN a{it} p ON e.dst = p.vec_id GROUP BY e.src
)"""
        )
        parts.append(
            f"ht{it} AS (SELECT CAST(sum(h_raw) AS DECIMAL(38,9)) AS th"
            f" FROM hr{it})"
        )
        parts.append(
            f"""h{it} AS (
  SELECT v.vec_id,
         round(COALESCE(CAST(r.h_raw AS DOUBLE), 0.0)
               / CAST(t.th AS DOUBLE), {HITS_ROUND}) AS h
  FROM verts v LEFT JOIN hr{it} r ON v.vec_id = r.v, ht{it} t
)"""
        )
        prev_h = f"h{it}"
        auth = f"a{it}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT v.vec_id, CAST(v.out_deg AS BIGINT) AS out_deg,
       CAST(v.in_deg AS BIGINT) AS in_deg,
       h.h AS hub, a.a AS authority
FROM verts v JOIN {prev_h} h ON v.vec_id = h.vec_id
             JOIN {auth} a ON v.vec_id = a.vec_id
"""
    )


# ---------------------------------------------------------------------------
# Label propagation communities (built r12, staged r13) — the
# community-detection companion to PageRank (centrality), HITS
# (hub/authority), and k-core (density) on the same mutual-kNN graph:
# synchronous LPA (Raghavan 2007) made fully deterministic and EXACT —
# every vertex starts as its own label, each round every vertex takes
# the MOST FREQUENT label among its in-neighbors with ties broken by
# SMALLEST label, for a FIXED unrolled round count. Pure integer
# arithmetic start to finish (counts and ids — no float anywhere), so
# cross-engine equality is structural, not numeric. The per-round
# argmax is the integer-packed device: key = cnt * 2^33 - label is a
# single BIGINT whose max realizes (max count, then min label);
# label = (2^33 - key % 2^33) % 2^33 decodes it — one
# map-side-combinable aggregate per round, no per-vertex sort window.
# Requires labels (vec_ids) < 2^33 and neighbor counts < 2^30; at
# cluster scale widen the shift to fit the id domain (DECIMAL(38,0)
# lattice). Unlike dedup.py's min-label CONNECTED COMPONENTS (a
# fixpoint on near-dup pairs), bounded-round mode-propagation finds
# dense communities INSIDE one component.
# ---------------------------------------------------------------------------

LPA_K = PR_K
LPA_ITERS = 3
LPA_SHIFT = 2 ** 33


def lpa_from_edges(edges: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """(vec_id, community, csize) after `iters` synchronous min-tie
    mode-propagation rounds over the directed edge list (both
    orientations present for mutual graphs). The edge list is persisted
    by the caller (the hits_from_edges lesson: 2·iters consumers)."""
    lab = edges.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("lab")
    )
    for _ in range(iters):
        cnt = (
            edges.join(lab, edges["src"] == lab["v"])
            .groupBy(F.col("dst").alias("nv"), "lab")
            .agg(F.count("*").alias("c"))
        )
        key = F.max(
            F.col("c") * F.lit(LPA_SHIFT) - F.col("lab")
        ).alias("k")
        lab = (
            cnt.groupBy("nv").agg(key)
            .select(
                F.col("nv").alias("v"),
                (
                    (F.lit(LPA_SHIFT) - F.col("k") % F.lit(LPA_SHIFT))
                    % F.lit(LPA_SHIFT)
                ).alias("lab"),
            )
        )
    sizes = lab.groupBy("lab").agg(F.count("*").alias("csize"))
    return lab.join(sizes, "lab").select(
        F.col("v").alias("vec_id"),
        F.col("lab").cast("bigint").alias("community"),
        F.col("csize").cast("bigint").alias("csize"),
    )


def lpa_sql_from(edge_parts: list[str], iters: int = LPA_ITERS) -> str:
    """Oracle twin of lpa_from_edges over the same edge CTEs."""
    parts = edge_parts + [
        "l0 AS (SELECT DISTINCT src AS v, src AS lab FROM edges)",
    ]
    prev = "l0"
    for it in range(1, iters + 1):
        parts.append(
            f"""c{it} AS (
  SELECT e.dst AS nv, l.lab, count(*) AS c
  FROM edges e JOIN {prev} l ON e.src = l.v GROUP BY e.dst, l.lab
)"""
        )
        parts.append(
            f"""l{it} AS (
  SELECT nv AS v,
         ({LPA_SHIFT} - max(c * {LPA_SHIFT} - lab) % {LPA_SHIFT})
           % {LPA_SHIFT} AS lab
  FROM c{it} GROUP BY nv
)"""
        )
        prev = f"l{it}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
, sizes AS (SELECT lab, count(*) AS csize FROM {prev} GROUP BY lab)
SELECT l.v AS vec_id, CAST(l.lab AS BIGINT) AS community,
       CAST(s.csize AS BIGINT) AS csize
FROM {prev} l JOIN sizes s ON s.lab = l.lab
"""
    )


# ---------------------------------------------------------------------------
# Degree assortativity (built r12, staged r13) — the mixing-pattern
# member of the graph family: do high-degree nodes attach to other
# high-degree nodes (r > 0, social-network-like) or to low-degree
# spokes (r < 0, hub-and-spoke)? Newman's r is the Pearson
# correlation of the endpoint-degree pairs over BOTH orientations of
# every undirected edge — on a similarity graph it is the one-number
# answer to "is the corpus one dense near-dup mesh or hubs bridging
# sparse regions", read next to the clustering coefficient.
# ---------------------------------------------------------------------------


def assortativity_from_edges(edges_in: DataFrame) -> DataFrame:
    """One-row (n_nodes, n_edges, assortativity) from a src<dst
    undirected half-list — shared verbatim by the exact-kNN witness
    and the lsh_ann production twin (the _triangles convention).
    Exactness: degrees and all five moment sums are exact integers on
    the DECIMAL(38,0) lattice (degree products stay < 38 digits at
    any k-bounded graph scale); the variance terms m2*sxx - sx^2
    compare to zero EXACTLY in decimal, and r is one fixed-shape
    double expression num/(sqrt(vx)*sqrt(vy)) of the exact sums (the
    spearman_rho device). Regular graphs (zero degree variance) yield
    NULL explicitly."""
    from ..cache import checkpoint_tracked, persist_tracked

    # r12: checkpoint the edge producer (lineage cut — the sim_hits_ann
    # finding) and persist the doubled list (three consumers: deg + the
    # two moment joins).
    edges = checkpoint_tracked(edges_in)
    und = persist_tracked(
        edges.select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ).unionAll(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
    )
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("deg")
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("dx"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dy"))
    dx, dy = F.col("dx"), F.col("dy")
    s = (
        und.join(du, "u")
        .join(dv, "v")
        .agg(
            F.count("*").cast("bigint").alias("m2"),
            F.sum(dx).cast("bigint").alias("sx"),
            F.sum(dy).cast("bigint").alias("sy"),
            F.sum(dx.cast("decimal(38,0)") * dy)
            .cast("decimal(38,0)")
            .alias("sxy"),
            F.sum(dx.cast("decimal(38,0)") * dx)
            .cast("decimal(38,0)")
            .alias("sxx"),
            F.sum(dy.cast("decimal(38,0)") * dy)
            .cast("decimal(38,0)")
            .alias("syy"),
        )
    )
    nodes = deg.agg(F.count("*").cast("bigint").alias("n_nodes"))
    m2d = F.col("m2").cast("decimal(38,0)")
    num = m2d * F.col("sxy") - F.col("sx").cast("decimal(38,0)") * F.col("sy")
    vx = m2d * F.col("sxx") - F.col("sx").cast("decimal(38,0)") * F.col("sx")
    vy = m2d * F.col("syy") - F.col("sy").cast("decimal(38,0)") * F.col("sy")
    r = num.cast("double") / (
        F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
    )
    return (
        s.crossJoin(F.broadcast(nodes))
        .select(
            "n_nodes",
            F.expr("m2 div 2").cast("bigint").alias("n_edges"),
            F.when((vx > 0) & (vy > 0), r).alias("assortativity"),
        )
    )
