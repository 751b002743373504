"""Governance & graph wave 8 (SURVEY.md §2.19 extensions): a data-quality
constraint suite, distribution-rank window functions (ntile /
percent_rank / cume_dist), triangle counting with the global clustering
coefficient, and a partitioned-layout source proving partition-pruned
scans produce byte-identical results.

All [Q]: exact DuckDB twins. `source_partitioned_pruning` materializes a
partitioned copy as fixture setup (skip-listed in the no-jobs guard, like
the CSV/JSON round-trip) — its oracle reads the ORIGINAL parquet, so a
match proves the partitioned layout preserves values, not just shape.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions import text as T
from ..sources import load_table, scratch_dir
from ..sources.catalog import spread
from .registry import register


# ---------------------------------------------------------------------------
# data-quality constraint suite
# ---------------------------------------------------------------------------

@register(
    "rel_dq_constraints",
    oracle="""
SELECT 'orders_pk_unique' AS constraint_name,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_custkey_fk',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_quantity_not_null',
       CAST(count(*) - count(l_quantity) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'events_value_finite',
       CAST(sum(CASE WHEN value IS NULL OR isnan(value) OR isinf(value)
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM events
""",
)
def rel_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite: the dbt/Great-Expectations-style
    validation pass a pipeline runs on every snapshot — primary-key
    uniqueness, referential integrity (orders -> customer), accepted value
    range, not-null, and float finiteness — emitting one row per
    constraint with its violation count (0 = pass).

    Scale shape: each constraint is a single-scan aggregate; the FK check
    is a broadcast LEFT ANTI join (the dimension side broadcasts), never
    a NOT IN shuffle. The five scans union into one job; at 100 TB
    constraints over the same table fuse into one shared-scan aggregate
    exactly like `rel_table_profile`.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    pk = orders.agg(
        (F.count("*") - F.count_distinct(F.col("o_orderkey"))).alias("n")
    ).select(F.lit("orders_pk_unique").alias("constraint_name"),
             F.col("n").alias("n_violations"))
    fk = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("n"))
        .select(F.lit("orders_custkey_fk").alias("constraint_name"),
                F.col("n").alias("n_violations"))
    )
    rng = lineitem.agg(
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1
            ).otherwise(0)
        ).alias("n")
    ).select(F.lit("lineitem_discount_range").alias("constraint_name"),
             F.col("n").alias("n_violations"))
    nn = lineitem.agg(
        (F.count("*") - F.count("l_quantity")).alias("n")
    ).select(F.lit("lineitem_quantity_not_null").alias("constraint_name"),
             F.col("n").alias("n_violations"))
    fin = events.agg(
        F.sum(
            F.when(
                F.col("value").isNull()
                | F.isnan("value")
                | (F.abs("value") == float("inf")),
                1,
            ).otherwise(0)
        ).alias("n")
    ).select(F.lit("events_value_finite").alias("constraint_name"),
             F.col("n").alias("n_violations"))
    return pk.unionByName(fk).unionByName(rng).unionByName(nn).unionByName(fin)


# ---------------------------------------------------------------------------
# distribution-rank windows (ntile / percent_rank / cume_dist)
# ---------------------------------------------------------------------------

@register(
    "rel_window_ntile_ranks",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
       CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cume,
       CAST(dense_rank() OVER w AS BIGINT) AS drank
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
""",
)
def rel_window_ntile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family: quartile assignment (ntile),
    percentile rank, cumulative distribution, and dense rank per
    return-flag partition — the spread/rank quartet `rel_window_frames`'
    value-window family didn't cover. The ORDER BY is a total order
    (price, orderkey, linenumber), which ntile requires: it splits by row
    position, so tie order must be pinned or engines legitimately
    disagree.

    Scale shape: one partition-keyed shuffle + sort serves all four
    functions (Spark plans a single Window operator); partitions are the
    3 return flags, so at 100 TB the partition key is the skew concern —
    the same expressions over a finer key (e.g. flag x month) shard the
    sort, and ntile stays correct within each partition by definition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cume"),
        F.dense_rank().over(w).cast("bigint").alias("drank"),
    )


# ---------------------------------------------------------------------------
# triangle counting / global clustering coefficient
# ---------------------------------------------------------------------------

def _tri_edges_sql() -> str:
    """Undirected distinct word co-occurrence edges with w1 < w2."""
    return f"""
SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b FROM (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM (SELECT {T.tokens_sql('text')} AS t FROM documents)
        WHERE len(t) >= 2)
) WHERE w1 <> w2
"""


@register(
    "text_triangle_count",
    oracle=f"""
WITH edges AS ({_tri_edges_sql()}),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
  ) GROUP BY node
),
tr AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_triads FROM deg)
SELECT n_triangles, n_triads,
       CAST(round(3.0 * n_triangles / n_triads, 6) AS DOUBLE)
         AS clustering_coeff
FROM tri CROSS JOIN tr
""",
)
def text_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the word co-occurrence graph plus the global
    clustering coefficient (3 x triangles / connected triads) — the
    standard graph-density probe, and the canonical multi-way self-join:
    each triangle (a < b < c) is counted exactly once via the ordered-edge
    join e(a,b) ⋈ e(b,c) ⋈ e(a,c).

    Scale shape: the graph first reduces to DISTINCT ordered edges (the
    heavy dedup happens before any join); the two self-joins shuffle on
    single word keys. Edges are then DEGREE-ORIENTED — from the
    (degree, id)-smaller endpoint to the larger — before the join, the
    standard skew fix: every node's out-degree is O(sqrt(m)) in the
    oriented DAG, so the e1 ⋈ e2 fan-out on the shared middle vertex is
    bounded even when a hub word appears in millions of co-occurrence
    pairs (id-ordering alone leaves lexicographically-small hubs with
    huge forward degree). Each triangle {x,y,z} with orientation ranks
    x<y<z appears exactly once as x→y, y→z plus the closing x→z probe,
    so the count — and the id-ordered DuckDB oracle — is unchanged. The
    degree table is vocabulary-sized here (broadcast); at 100 TB node
    counts it becomes a shuffle join on the same keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = spread(docs).select(T.tokens("text").alias("t"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("w1"),
            F.element_at(F.col("t"), i + 1).alias("w2"),
        ),
    )
    bi = (
        toks.where(F.size("t") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .where(F.col("w1") != F.col("w2"))
    )
    from ..cache import persist_tracked

    # persisted: edges feed deg (twice via the union), both orientation
    # joins, and nothing else should re-run the corpus tokenize; deg feeds
    # the two orientation broadcasts plus the triads branch; oriented
    # feeds all three legs of the triangle join
    edges = persist_tracked(
        bi.select(
            F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
        ).distinct()
    )
    deg = persist_tracked(
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # orient a->b iff (d(a), a) < (d(b), b); edges already have a < b, so
    # the degree tie falls through to keeping the id order
    oriented = persist_tracked(
        edges.join(
            F.broadcast(deg.select(F.col("node").alias("a"), F.col("d").alias("da"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("b"), F.col("d").alias("db"))),
            "b",
        )
        .select(
            F.when(F.col("da") <= F.col("db"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("u"),
            F.when(F.col("da") <= F.col("db"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("v"),
        )
    )
    o2 = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    o3 = oriented.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        oriented.join(o2, "v")
        .join(o3, (F.col("u") == F.col("u3")) & (F.col("w") == F.col("w3")))
        .agg(F.count("*").alias("n_triangles"))
    )
    triads = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("bigint"))
        .cast("bigint")
        .alias("n_triads")
    )
    return tri.crossJoin(F.broadcast(triads)).select(
        "n_triangles",
        "n_triads",
        F.round(3.0 * F.col("n_triangles") / F.col("n_triads"), 6)
        .cast("double")
        .alias("clustering_coeff"),
    )


# ---------------------------------------------------------------------------
# partitioned-layout source with partition pruning
# ---------------------------------------------------------------------------

@register(
    "source_partitioned_pruning",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)
         AS total_value
FROM events
WHERE event_type IN ('click', 'view')
GROUP BY event_type
""",
)
def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout: rewrite events partitioned BY
    event_type, then aggregate two partitions through a filter the scan
    prunes at the directory level (PartitionFilters — asserted in
    tests/test_governance.py). The oracle reads the ORIGINAL unpartitioned
    parquet, so a hash match proves the partitioned layout preserves every
    value, not just the row count.

    Scale shape: partition-by on the filter column is THE 100 TB scan
    economizer — a two-partition query touches two directories of a
    thousand-partition table, no file footers elsewhere. The write
    shuffles by partition value (repartition before write avoids
    small-files explosion: one file per partition per task otherwise).
    The materializing write is fixture setup (skip-listed in the no-jobs
    guard, like the CSV/JSON round-trip).
    """
    import os

    e = load_table(spark, sf_dir, "events")
    work = os.path.join(
        scratch_dir("pv_part_"), "events_by_type"
    )
    (
        e.repartition("event_type")
        .write.partitionBy("event_type")
        .parquet(work)
    )
    part = spark.read.parquet(work)
    return (
        part.where(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")), 6
            )
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# privacy audits: k-anonymity / l-diversity ladder, DP noisy release
# ---------------------------------------------------------------------------

_KANON_K = 10


@register(
    "rel_k_anonymity_ladder",
    oracle=f"""
WITH qi AS (
  SELECT c.c_custkey, n.n_regionkey AS region, c.c_nationkey AS nation,
         c.c_mktsegment AS segment,
         CAST(floor(CAST(round(c.c_acctbal) AS BIGINT) / 1000.0) AS BIGINT)
           AS bal_band
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
ladder AS (
  SELECT CASE WHEN grouping(nation) = 0 THEN 0
              WHEN grouping(region) = 0 THEN 1 ELSE 2 END AS level,
         count(*) AS group_size,
         count(DISTINCT bal_band) AS l_div
  FROM qi
  GROUP BY GROUPING SETS ((nation, region, segment),
                          (region, segment), (segment))
)
SELECT level,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(group_size) AS BIGINT) AS min_group,
       CAST(sum(CASE WHEN group_size < {_KANON_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS unsafe_groups,
       CAST(min(l_div) AS BIGINT) AS min_ldiversity
FROM ladder GROUP BY level ORDER BY level
""",
)
def rel_k_anonymity_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk audit across a generalization ladder:
    k-anonymity (smallest quasi-identifier group, count of groups under
    k=10) and l-diversity (fewest distinct sensitive values — banded
    account balance — inside any QI group) at three generalization
    levels of the quasi-identifier (nation+segment → region+segment →
    segment). The release-readiness check a training-data pipeline runs
    before publishing user-derived tables: pick the coarsest level whose
    unsafe_groups is 0 and min_ldiversity clears policy.

    Scale shape: ONE aggregation pass computes all three levels via
    GROUPING SETS (the native expand operator — A12's machinery reused
    for privacy), with grouping() disambiguating the level; the ladder
    table is group-count-sized, so the risk rollup is trivial. The
    nation dimension broadcasts. count(DISTINCT band) inside grouping
    sets runs as Spark's expand+two-phase distinct aggregate — map-side
    partials, no row explosion beyond levels×rows."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    qi = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select(
        F.col("n_regionkey").alias("region"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(
            F.round(F.col("c_acctbal")).cast("bigint") / F.lit(1000.0)
        )
        .cast("bigint")
        .alias("bal_band"),
    )
    level = (
        F.when(F.grouping("nation") == 0, F.lit(0))
        .when(F.grouping("region") == 0, F.lit(1))
        .otherwise(F.lit(2))
    )
    ladder = (
        qi.groupingSets(
            [["nation", "region", "segment"], ["region", "segment"],
             ["segment"]],
            "nation", "region", "segment",
        )
        .agg(
            level.alias("level"),
            F.count("*").alias("group_size"),
            F.countDistinct("bal_band").alias("l_div"),
        )
    )
    return (
        ladder.groupBy("level")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.min("group_size").cast("bigint").alias("min_group"),
            F.sum(
                F.when(F.col("group_size") < _KANON_K, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("unsafe_groups"),
            F.min("l_div").cast("bigint").alias("min_ldiversity"),
        )
        .orderBy("level")
    )


_DP_EPSILON = 0.5  # Laplace scale b = 1/epsilon = 2.0 (sensitivity-1 count)


@register(
    "rel_dp_noisy_counts",
    oracle=f"""
WITH counts AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS true_count,
         ({T.char_hash_sql("concat('dp:', CAST(c_nationkey AS VARCHAR))")}
          + 1.0) / {T.HASH_MOD + 1}.0 AS u
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey,
       round(true_count + CASE WHEN u < 0.5
              THEN {1.0 / _DP_EPSILON} * ln(2.0 * u)
              ELSE -{1.0 / _DP_EPSILON} * ln(2.0 * (1.0 - u)) END, 6)
         AS noisy_count
FROM counts
""",
)
def rel_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism ARITHMETIC CHECK — NOT a private release: the
    noise is derived deterministically from a hash of the group key, so
    it is recoverable by anyone who knows the key and this query offers
    NO differential privacy as configured. What it verifies end-to-end
    is the mechanism's plumbing (sensitivity-1 counts, ε=0.5, Laplace
    noise b=1/ε by inverse-CDF) — per-nation customer counts plus the
    noise term, hash-uniform so the oracle can check the arithmetic
    exactly. A production release must substitute a secure RNG for the
    hash (mechanism, sensitivity accounting, and plan shape unchanged —
    only the uniform's source differs). u ∈ (0,1) strictly: (h+1)/(M+1)
    with h < M, so neither ln() argument can hit zero.

    Scale shape: one map-side-combinable count per group, noise as
    row-local arithmetic on the group-sized result — nothing beyond the
    count's own exchange. Inverse-CDF branches on u<0.5 with the same
    literal association in both engines; output rounded to 6 decimals."""
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("true_count")
    )
    u = (
        T.char_hash(
            F.concat(F.lit("dp:"), F.col("c_nationkey").cast("string"))
        )
        + F.lit(1.0)
    ) / F.lit(float(T.HASH_MOD + 1))
    b = F.lit(1.0 / _DP_EPSILON)
    noise = F.when(
        u < 0.5, b * F.log(F.lit(2.0) * u)
    ).otherwise(-b * F.log(F.lit(2.0) * (F.lit(1.0) - u)))
    return counts.select(
        "c_nationkey",
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
    )


# ---------------------------------------------------------------------------
# join-key skew diagnostics (staged r7 -> r8)
# ---------------------------------------------------------------------------

@register(
    "rel_skew_gini",
    oracle="""
WITH freqs AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
),
ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt, user_id) AS i,
         count(*) OVER () AS n,
         sum(cnt) OVER () AS s,
         max(cnt) OVER () AS mx
  FROM freqs
)
SELECT CAST(max(n) AS BIGINT) AS n_keys,
       CAST(max(s) AS BIGINT) AS n_rows,
       CAST(max(mx) AS BIGINT) AS max_freq,
       CAST(round(CAST(max(mx) AS DOUBLE) * max(n) / max(s), 6) AS DOUBLE)
         AS max_over_mean,
       CAST(round(CAST(sum((2 * i - n - 1) * cnt) AS DOUBLE)
                  / (CAST(max(n) AS DOUBLE) * max(s)), 6) AS DOUBLE) AS gini
FROM ranked
""",

)
def rel_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the pre-flight check before shuffling
    on a key at scale: key count, max key frequency, max/mean ratio (the
    straggler multiplier a shuffle on this key risks), and the Gini
    coefficient of the key-frequency distribution
    (sum((2i-n-1)*x_i)/(n*sum x) over ascending-sorted frequencies —
    0 = uniform, ->1 = one key owns everything). Feeds the choice
    between a plain shuffle, salting (rel_salted_skew_agg/join), or an
    AQE skew-join hint.

    Exactness: every Gini term is INTEGER arithmetic (rank, count) summed
    as integers; the only doubles are two final quotients — nothing
    order-dependent anywhere.

    Scale shape: one map-side-combinable key count reduces the corpus to
    the key-frequency table; the rank window sorts THAT table (|keys|
    rows — orders of magnitude below |rows|; for billion-key tables run
    the same query on a hash-sampled key subset). Single-row output."""
    freqs = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    w_rank = Window.orderBy("cnt", "user_id")
    w_all = Window.partitionBy()
    ranked = freqs.select(
        "cnt",
        F.row_number().over(w_rank).alias("i"),
        F.count("*").over(w_all).alias("n"),
        F.sum("cnt").over(w_all).alias("s"),
        F.max("cnt").over(w_all).alias("mx"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_keys"),
        F.max("s").cast("bigint").alias("n_rows"),
        F.max("mx").cast("bigint").alias("max_freq"),
        F.round(
            F.max("mx").cast("double") * F.max("n") / F.max("s"), 6
        ).cast("double").alias("max_over_mean"),
        F.round(
            F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("cnt"))
            .cast("double")
            / (F.max("n").cast("double") * F.max("s")),
            6,
        ).cast("double").alias("gini"),
    )


# ---------------------------------------------------------------------------
# column-pair mutual information (dependence profiling)
# ---------------------------------------------------------------------------

_MI_SQL = """
WITH pairs AS (
  SELECT event_type AS xv,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS yv
  FROM events
),
xy AS (SELECT xv, yv, count(*) AS nxy FROM pairs GROUP BY xv, yv),
mx AS (SELECT xv, sum(nxy) AS nx FROM xy GROUP BY xv),
my AS (SELECT yv, sum(nxy) AS ny FROM xy GROUP BY yv),
tot AS (SELECT sum(nxy) AS n FROM xy),
mi_terms AS (
  SELECT CAST(round(xy.nxy * ln(CAST(xy.nxy AS DOUBLE) * tot.n
                                / (CAST(mx.nx AS DOUBLE) * my.ny)), 9)
              AS DECIMAL(28,9)) AS t
  FROM xy JOIN mx USING (xv) JOIN my USING (yv), tot
),
hx_terms AS (
  SELECT CAST(round(-(nx * ln(CAST(nx AS DOUBLE) / tot.n)), 9)
              AS DECIMAL(28,9)) AS t
  FROM mx, tot
),
hy_terms AS (
  SELECT CAST(round(-(ny * ln(CAST(ny AS DOUBLE) / tot.n)), 9)
              AS DECIMAL(28,9)) AS t
  FROM my, tot
),
s AS (
  SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n,
         (SELECT CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
          FROM mi_terms) AS mi_n,
         (SELECT CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
          FROM hx_terms) AS hx_n,
         (SELECT CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
          FROM hy_terms) AS hy_n
)
SELECT n,
       mi_n / n AS mi,
       hx_n / n AS h_x,
       hy_n / n AS h_y,
       CASE WHEN hx_n > 0 AND hy_n > 0
            THEN mi_n / n / sqrt(hx_n / n * (hy_n / n)) END AS nmi
FROM s WHERE n > 0
"""


@register("rel_mutual_information", oracle=_MI_SQL)
def rel_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pair mutual information (built r10, staged r11) — the
    dependence profile behind physical-design choices: two columns
    with high NMI are redundant to cluster on separately (one predicts
    the other — Z-order on both wastes bits, rel_zorder_layout's
    companion question), and a feature column with near-zero MI
    against the label is a pruning candidate. Measured here between
    event_type and the engine-free epoch-mod-7 weekday. Every
    plogp/PMI term is round-9 DECIMAL over exact integer counts
    (N-scaled numerators so no quotient precedes the sum — the
    chi2/PSI discipline); MI, marginal entropies, and NMI =
    MI/sqrt(HxHy) are identical double expressions of the exact sums.
    ln stays on quotients of 64-bit-exact doubles (the safe
    transcendental).

    Scale shape: one (x, y)-keyed map-side-combinable count reduces
    the corpus; marginals and totals derive from the |X|·|Y| cell
    table (bounded by distinct categories), so everything after the
    first reduce is cell-sized."""
    ev = load_table(spark, sf_dir, "events")
    return mi_readout(mi_pair_counts(ev))


def mi_pair_counts(ev: DataFrame) -> DataFrame:
    """(xv, yv, nxy) cell counts between event_type and the engine-free
    epoch-mod-7 weekday — the complete ADDITIVE sufficient statistic of
    the MI profile (shared by the batch query and the streaming
    drain)."""
    pairs = ev.select(
        F.col("event_type").alias("xv"),
        (
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            % 7
        ).alias("yv"),
    )
    return pairs.groupBy("xv", "yv").agg(F.count("*").alias("nxy"))


def mi_readout(xy: DataFrame) -> DataFrame:
    """MI / marginal entropies / NMI as a pure function of the (xv, yv,
    nxy) cell table — round-9 DECIMAL plogp lattice, identical double
    readout expressions both engines."""
    from ..cache import persist_tracked

    xy = persist_tracked(xy)
    mx = xy.groupBy("xv").agg(F.sum("nxy").alias("nx"))
    my = xy.groupBy("yv").agg(F.sum("nxy").alias("ny"))
    tot = xy.agg(F.sum("nxy").alias("n"))
    mi_t = (
        xy.join(F.broadcast(mx), "xv")
        .join(F.broadcast(my), "yv")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.col("nxy")
                * F.log(
                    F.col("nxy").cast("double")
                    * F.col("n")
                    / (F.col("nx").cast("double") * F.col("ny"))
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("decimal(38,9)").cast("double").alias("mi_n"))
    )
    hx_t = (
        mx.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -(F.col("nx") * F.log(F.col("nx").cast("double") / F.col("n"))),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("decimal(38,9)").cast("double").alias("hx_n"))
    )
    hy_t = (
        my.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -(F.col("ny") * F.log(F.col("ny").cast("double") / F.col("n"))),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("decimal(38,9)").cast("double").alias("hy_n"))
    )
    n = F.col("n").cast("bigint")
    mi = F.col("mi_n") / n
    hx, hy = F.col("hx_n") / n, F.col("hy_n") / n
    return (
        tot.crossJoin(F.broadcast(mi_t))
        .crossJoin(F.broadcast(hx_t))
        .crossJoin(F.broadcast(hy_t))
        .where(n > 0)
        .select(
            n.alias("n"),
            mi.alias("mi"),
            hx.alias("h_x"),
            hy.alias("h_y"),
            F.when(
                (F.col("hx_n") > 0) & (F.col("hy_n") > 0),
                mi / F.sqrt(hx * hy),
            ).alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# chi-square independence + Cramér's V (built r11, staged r12)
# ---------------------------------------------------------------------------

_CHI2_INDEP_SQL = """
WITH pairs AS (
  SELECT event_type AS xv,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS yv
  FROM events
),
xy AS (SELECT xv, yv, count(*) AS nxy FROM pairs GROUP BY xv, yv),
mx AS (SELECT xv, sum(nxy) AS nx FROM xy GROUP BY xv),
my AS (SELECT yv, sum(nxy) AS ny FROM xy GROUP BY yv),
tot AS (SELECT sum(nxy) AS n FROM xy),
grid AS (
  SELECT mx.xv, my.yv, mx.nx, my.ny, COALESCE(xy.nxy, 0) AS o
  FROM mx CROSS JOIN my
  LEFT JOIN xy ON xy.xv = mx.xv AND xy.yv = my.yv
),
terms AS (
  SELECT CAST(round(
           (CAST(o AS DOUBLE) * tot.n - CAST(nx AS DOUBLE) * ny)
             * (CAST(o AS DOUBLE) * tot.n - CAST(nx AS DOUBLE) * ny)
             / (CAST(tot.n AS DOUBLE) * nx * ny), 9)
         AS DECIMAL(28,9)) AS t
  FROM grid, tot
),
s AS (
  SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n,
         (SELECT CAST(count(*) AS BIGINT) FROM mx) AS r,
         (SELECT CAST(count(*) AS BIGINT) FROM my) AS c,
         CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE) AS chi2
  FROM terms
)
SELECT n, r AS n_rows_cat, c AS n_cols_cat,
       (r - 1) * (c - 1) AS dof,
       chi2,
       CASE WHEN n > 0 AND LEAST(r, c) > 1 THEN
         sqrt(chi2 / (n * (LEAST(r, c) - 1)))
       END AS cramers_v
FROM s WHERE n > 0
"""


@register("rel_chi2_independence", oracle=_CHI2_INDEP_SQL)
def rel_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence + Cramér's V (built r11, staged
    r12) — the SIGNIFICANCE/effect-size companion to
    rel_mutual_information on the SAME contingency (event_type ×
    epoch-weekday): MI measures how much information the columns
    share; chi²/dof and V ∈ [0,1] say whether the dependence is
    distinguishable from noise and how strong it is on a normalized
    scale. ZERO cells matter here (expected-vs-observed on the FULL
    r×c grid — the margins' cross join left-joined against observed),
    unlike MI where 0·log0 = 0 drops them.

    Exactness: each cell term is the N-scaled form
    (oN − nx·ny)²/(N·nx·ny) — one fixed-shape double expression of
    exact <2^53 integers — rounded to 9dp DECIMAL before the exact
    sum (the chi2/PSI device); dof and V are closed-form readouts.

    Scale shape: one (x, y)-keyed map-side-combinable count; the grid
    is |X|·|Y|-bounded; everything after the first reduce is
    cell-sized."""
    ev = load_table(spark, sf_dir, "events")
    return chi2_readout(mi_pair_counts(ev))


def chi2_readout(xy: DataFrame) -> DataFrame:
    """chi² / dof / Cramér's V as a pure function of the (xv, yv, nxy)
    cell table — the SAME additive sufficient statistic mi_readout
    consumes, so the streaming drain gets the significance monitor as
    a SECOND readout of the standing MI state (refactored out of
    rel_chi2_independence's body in r12; the batch query re-proves as
    a refactor consumer)."""
    from ..cache import persist_tracked

    xy = persist_tracked(xy)
    mx = xy.groupBy("xv").agg(F.sum("nxy").alias("nx"))
    my = xy.groupBy("yv").agg(F.sum("nxy").alias("ny"))
    tot = xy.agg(F.sum("nxy").alias("n"))
    grid = (
        mx.crossJoin(my)
        .join(xy, ["xv", "yv"], "left")
        .select(
            "nx", "ny",
            F.coalesce(F.col("nxy"), F.lit(0)).alias("o"),
        )
    )
    dev = (
        F.col("o").cast("double") * F.col("n")
        - F.col("nx").cast("double") * F.col("ny")
    )
    terms = (
        grid.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                dev * dev
                / (
                    F.col("n").cast("double")
                    * F.col("nx")
                    * F.col("ny")
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("decimal(38,9)").cast("double").alias("chi2"))
    )
    r = mx.agg(F.count("*").alias("r"))
    c = my.agg(F.count("*").alias("c"))
    n = F.col("n").cast("bigint")
    rr, cc = F.col("r").cast("bigint"), F.col("c").cast("bigint")
    return (
        tot.crossJoin(F.broadcast(r))
        .crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(terms))
        .where(n > 0)
        .select(
            n.alias("n"),
            rr.alias("n_rows_cat"),
            cc.alias("n_cols_cat"),
            ((rr - 1) * (cc - 1)).alias("dof"),
            F.col("chi2"),
            F.when(
                (n > 0) & (F.least(rr, cc) > 1),
                F.sqrt(F.col("chi2") / (n * (F.least(rr, cc) - 1))),
            ).alias("cramers_v"),
        )
    )
