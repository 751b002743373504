"""Advanced operators beyond the reference surface (SURVEY.md §2 Tier C
extensions, second wave): classic multi-join analytics (TPC-H Q3/Q5 shapes),
an event-time AS-OF join, a salt-based skew-mitigated aggregation, a BPE-ish
regex tokenizer, and winnowing document fingerprints.

All [Q]: every query here has an exact DuckDB twin. Scale notes sit on each
operator — the as-of join is the one Spark lacks natively; it's expressed as
the classic union-merge (one shuffle by key, no range explosion), the shape
that survives 100 TB where a naive range join quadratically explodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions import text as T
from ..sources import load_table, spread
from .registry import register


def _dec_revenue() -> F.Column:
    """Exact order-insensitive revenue as a scaled-int64 sum (cents ×
    discount-hundredths; same pattern and rationale as
    queries_relational._dec_sum — exact ten-thousandths, ~2x faster than
    decimal aggregation, identical double result)."""
    return (
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        )
        / 10000.0
    ).cast("double")


_DEC_REVENUE_SQL = (
    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS DOUBLE)"
)


# ---------------------------------------------------------------------------
# TPC-H classics — multi-join analytics
# ---------------------------------------------------------------------------

@register(
    "rel_tpch_q3_priority",
    oracle=f"""
SELECT l_orderkey,
       {_DEC_REVENUE_SQL} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def rel_tpch_q3_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): 3-table join, filtered on both fact
    sides, revenue agg, top-10. Scale shape: customer is the small side
    (broadcast); orders⋈lineitem shuffles on orderkey — the join key equals
    the agg key, so the aggregation reuses the join's partitioning (one
    shuffle, verified in tests/test_plans.py)."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_revenue().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "rel_tpch_q5_region_volume",
    oracle=f"""
SELECT n_name, {_DEC_REVENUE_SQL} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
)
def rel_tpch_q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): 6-table join where every dimension
    (region, nation, customer, supplier) broadcasts and only
    orders⋈lineitem shuffles — the canonical star-join plan at 100 TB. The
    s_nationkey = c_nationkey residual keeps only same-nation sales."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(_dec_revenue().alias("revenue"))
    )


# ---------------------------------------------------------------------------
# AS-OF join (event-time point-in-time lookup)
# ---------------------------------------------------------------------------

@register(
    "events_asof_last_purchase",
    oracle="""
SELECT c.event_id, c.user_id, c.ts,
       p.ts AS last_purchase_ts,
       p.value AS last_purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join — for every click, the user's most recent purchase at or
    before the click (point-in-time-correct feature lookup; Spark has no
    native ASOF).

    Spark-first shape: UNION both sides tagged, ONE shuffle by user_id, and
    a last_value(ignoreNulls) window ordered by (ts, side) carries the most
    recent purchase forward onto each click row — the sort-merge form. Cost
    is one shuffle + one sort of clicks+purchases, independent of how many
    purchases precede each click; a naive range join explodes quadratically
    per user. Ties (click.ts == purchase.ts) take the purchase, matching
    DuckDB ASOF's >= bound (purchase sorts first via the side tag).
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("double").alias("p_value"),
        F.lit(1).alias("side"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id", "ts",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
        F.lit(0).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "event_id", "user_id", "ts", "side",
        F.last("p_ts", ignorenulls=True).over(w).alias("last_purchase_ts"),
        F.last("p_value", ignorenulls=True).over(w).alias("last_purchase_value"),
    )
    return merged.where(F.col("side") == 1).select(
        "event_id", "user_id", "ts", "last_purchase_ts", "last_purchase_value"
    )


# ---------------------------------------------------------------------------
# skew-mitigated aggregation (salting)
# ---------------------------------------------------------------------------

@register(
    "rel_salted_skew_agg",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(value), 6) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
""",
)
def rel_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (worst-skew) key:
    phase 1 aggregates (key, salt) — 16-way fan-out spreads each hot key
    over the cluster — phase 2 merges per key. With 5 distinct keys a plain
    groupBy would reduce on ≤5 partitions no matter the cluster size; the
    result is identical (count/sum are associative), which the oracle's
    plain GROUP BY proves. (Spark's partial aggregation makes this implicit
    for built-in aggs; the explicit salt is the pattern for the cases that
    can't partial-combine: collect_list, exact percentiles, UDAFs.)"""
    e = load_table(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("n_p"),
        F.sum(F.col("value")).alias("sum_p"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("n_p").cast("long").alias("n"),
        F.round(F.sum("sum_p"), 6).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (LLM token counting)
# ---------------------------------------------------------------------------

# Letter runs / digit runs / single punctuation marks — mutually exclusive
# alternatives, so Java (Spark) and RE2 (DuckDB) tokenize identically.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


@register(
    "text_bpe_token_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS tok
  FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bpe_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
       CAST(count(*) FILTER (WHERE tok ~ '^[0-9]+$') AS BIGINT) AS n_number_runs,
       CAST(count(*) FILTER (WHERE tok ~ '^[^a-z0-9]$') AS BIGINT) AS n_punct
FROM toks GROUP BY doc_id
""",
)
def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token counting with a BPE-ish regex (letter runs, digit runs,
    punctuation marks — the pre-tokenization split every BPE vocabulary
    applies before merges): per-doc token counts for cost estimation /
    length filtering. Pure regexp_extract_all + explode, entirely JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    # pattern passed as a Column literal — dodges SQL-string backslash
    # escaping differences between engines
    toks = spread(docs).select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(BPE_PATTERN), F.lit(0))
        ).alias("tok"),
    )
    return toks.groupBy("doc_id").agg(
        F.count("*").alias("n_bpe_tokens"),
        F.count_distinct("tok").alias("n_distinct"),
        F.sum(F.col("tok").rlike("^[0-9]+$").cast("long")).alias("n_number_runs"),
        F.sum(F.col("tok").rlike("^[^a-z0-9]$").cast("long")).alias("n_punct"),
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling-hash document sketch)
# ---------------------------------------------------------------------------

WINNOW_K = 5  # character k-gram length
WINNOW_W = 4  # winnowing window (guarantee: every W consecutive k-grams
#               contribute >= 1 fingerprint — Schleimer et al., SIGMOD'03)


@register(
    "text_winnowing_fingerprints",
    oracle=f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(length(lower(text)) - {WINNOW_K - 1}, 0)),
           gi -> {T.char_hash_sql(f'substr(lower(text), gi, {WINNOW_K})')}
         ) AS gh
  FROM documents
),
winnowed AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(gh) - {WINNOW_W - 1}, 0)),
           wi -> list_min(list_slice(gh, wi, wi + {WINNOW_W - 1}))
         )) AS fp
  FROM grams
)
SELECT DISTINCT doc_id, fp FROM winnowed
""",
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: hash every {WINNOW_K}-char gram of
    the lowercased text (rolling window), keep the minimum hash of each
    {WINNOW_W}-gram window, distinct per doc — the MOSS sketch. Guarantees
    any shared substring of length >= K+W-1 yields a shared fingerprint, at
    ~1/W the density of full k-gram shingling. All higher-order functions
    (no UDF); the portable char hash keeps it oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.lower(F.col("text"))
    # Spark's sequence(1, 0) DESCENDS to [1, 0] instead of yielding empty
    # (same quirk as functions/text.char_hash) — guard short/empty texts.
    n_grams = F.length(text) - (WINNOW_K - 1)
    gh = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: T.char_hash(text.substr(i, F.lit(WINNOW_K))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    grams = spread(docs).select("doc_id", gh.alias("gh"))
    n_windows = F.size("gh") - (WINNOW_W - 1)
    fps = F.when(
        n_windows > 0,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice("gh", i, WINNOW_W)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        grams.select("doc_id", F.explode(fps).alias("fp"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# funnel / conversion (sequential event pattern)
# ---------------------------------------------------------------------------

@register(
    "events_funnel_conversion",
    oracle="""
WITH signups AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
first_purchase AS (
  SELECT p.user_id, min(p.ts) AS first_purchase_ts
  FROM events p JOIN signups s
    ON p.user_id = s.user_id AND p.ts >= s.signup_ts
  WHERE p.event_type = 'purchase'
  GROUP BY p.user_id
)
SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
       COALESCE(p.first_purchase_ts <= s.signup_ts + INTERVAL 7 DAY, FALSE)
         AS converted_7d
FROM signups s LEFT JOIN first_purchase p ON s.user_id = p.user_id
""",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: per signed-up user, the first purchase AT OR AFTER signup and
    whether it converted within 7 days — the sequential-pattern shape
    (step1 -> step2 within horizon) of cohort/retention analytics. Two
    min-aggregations + one left join, all shuffling on user_id so AQE can
    coalesce to a single exchange reuse."""
    e = load_table(spark, sf_dir, "events")
    signups = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts")
    first_purchase = (
        purchases.join(signups, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return signups.join(first_purchase, "user_id", "left").select(
        "user_id",
        "signup_ts",
        "first_purchase_ts",
        F.coalesce(
            F.col("first_purchase_ts")
            <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"),
            F.lit(False),
        ).alias("converted_7d"),
    )


# ---------------------------------------------------------------------------
# statistical aggregates (quantiles / moments)
# ---------------------------------------------------------------------------

@register(
    "rel_stats_quantiles",
    oracle="""
SELECT l_returnflag,
       CAST(round(quantile_cont(l_quantity, 0.5), 6) AS DOUBLE) AS median_qty,
       CAST(round(quantile_cont(l_quantity, 0.9), 6) AS DOUBLE) AS p90_qty,
       CAST(round(quantile_cont(l_extendedprice, 0.99), 6) AS DOUBLE) AS p99_price
FROM lineitem GROUP BY l_returnflag
""",
)
def rel_stats_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (Spark `percentile` == DuckDB
    `quantile_cont`, both linear interpolation). The exact form needs a
    per-group sort — at 100 TB swap in approx_percentile (t-digest sketch,
    mergeable, one pass) and keep this as the accuracy oracle, mirroring the
    HLL/exact-count pair."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99_price"),
    )


_BISECT_PS = (0.5, 0.9, 0.99)
_BISECT_BUCKETS = 4096


@register(
    "rel_quantile_bisect",
    oracle=f"""
WITH stats AS (SELECT count(*) AS n FROM lineitem),
ks AS (
  SELECT p, CAST(floor((n - 1) * p) AS BIGINT) + 1 AS k
  FROM stats, (VALUES {", ".join(f"({p})" for p in _BISECT_PS)}) t(p)
),
ordered AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
         row_number() OVER (ORDER BY l_extendedprice) AS rn
  FROM lineitem
)
SELECT CAST(ks.p AS DOUBLE) AS p, ks.k AS k, ordered.v AS value
FROM ks JOIN ordered ON ordered.rn = ks.k
ORDER BY p
""",
)
def rel_quantile_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-statistic quantiles WITHOUT a global sort — the 100 TB
    exact path that completes the quantile triple (rel_stats_quantiles =
    exact-by-sort; its docstring's approx_percentile = sketch; this =
    exact-by-bisection). Two bounded passes:

      1. count/min/max (one 1-row aggregate); the k-th-smallest targets are
         k = floor((n-1)*p) + 1 — the discrete lower quantile, stated
         explicitly so both engines compute the same order statistic;
      2. a 4096-bucket histogram of the value range (one map-side-combinable
         groupBy producing <= 4096 rows); the driver walks the cumulative
         counts to find each k's bucket and in-bucket rank — driver state is
         O(buckets), never O(rows);
      3. rows of the (<= |ps|) candidate buckets join a broadcast target
         list and rank inside their bucket only — expected n/4096 rows per
         bucket cross the final exchange instead of n. A pathological
         single-value bucket degrades to that value's duplicate count, at
         which point every duplicate IS the answer and ranking ties are
         value-identical.

    Matches DuckDB's full-sort row_number twin exactly: the k-th smallest is
    well-defined under ties, and bucket boundaries only route rows (they
    never enter the answer), so internal float bucketing needs no
    cross-engine portability. Driver actions are bounded by construction
    (1 row + <= 4096 rows) — documented exception to the
    no-jobs-at-plan-build guard, like the KMeans/IVF fits."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    return quantiles_bisect(spark, li)


def quantiles_bisect(
    spark: SparkSession,
    li: DataFrame,
    ps: tuple[float, ...] = _BISECT_PS,
    nb: int = _BISECT_BUCKETS,
) -> DataFrame:
    """Core of rel_quantile_bisect over any single-column ``v`` relation
    (exposed for the crafted-distribution tests).

    NULL ``v`` rows are ignored (SQL order-statistic semantics: n counts
    non-null values only — previously count('*') included NULLs while
    min/max and ranking excluded them, silently skewing every k for a
    nullable caller). NaN raises loudly: NaN has engine-dependent sort
    order (Spark sorts it above +inf) and would corrupt the min/max range
    every bucket boundary derives from, so there is no portable answer to
    return."""
    from fractions import Fraction

    out_schema = "p double, k bigint, value double"
    li = li.where(F.col("v").isNotNull())
    stats = li.agg(
        F.count("*").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.sum(F.when(F.isnan("v"), 1).otherwise(0)).alias("nans"),
    ).first()
    if stats["nans"]:
        raise ValueError(
            "quantiles_bisect requires NaN-free v: NaN sort order is "
            f"engine-dependent and corrupts the bucket range ({stats['nans']}"
            " NaN rows)"
        )
    n = stats["n"]
    if n == 0:
        return spark.createDataFrame([], out_schema)
    lo, hi = float(stats["lo"]), float(stats["hi"])
    # k in EXACT rational arithmetic (Fraction(str(p)) is the decimal
    # literal, not the binary double): the oracle floors an exact DECIMAL
    # product, and binary floor((n-1)*p) sits within 1 ulp of the boundary
    # whenever (n-1)*p is an exact integer (e.g. p=.99, n-1 a multiple of
    # 100) — exactness here must not hinge on product-rounding luck.
    ks = {p: int((n - 1) * Fraction(str(p))) + 1 for p in ps}
    if lo == hi:  # degenerate range: every order statistic is the value
        return spark.createDataFrame(
            [(p, ks[p], lo) for p in sorted(ps)], out_schema
        )
    width = (hi - lo) / nb
    bucket = F.least(
        F.lit(nb - 1), F.floor((F.col("v") - F.lit(lo)) / F.lit(width))
    ).cast("long")
    hist = sorted(
        (r["b"], r["count"])
        for r in li.groupBy(bucket.alias("b")).count().collect()
    )
    targets = []  # (p, k, bucket, rank inside bucket)
    cum = 0
    it = iter(hist)
    b, c = next(it)
    for p in sorted(ps):
        k = ks[p]
        while cum + c < k:
            cum += c
            b, c = next(it)
        targets.append((p, k, b, k - cum))
    need = spark.createDataFrame(targets, "p double, k bigint, b long, r long")
    w = Window.partitionBy("p").orderBy("v")
    return (
        li.withColumn("b", bucket)
        .join(F.broadcast(need), "b")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == F.col("r"))
        .select("p", "k", F.col("v").alias("value"))
        .orderBy("p")
    )


@register(
    "rel_stats_moments",
    oracle="""
SELECT l_returnflag,
       CAST(round(stddev_samp(l_quantity), 6) AS DOUBLE) AS sd_qty,
       CAST(round(corr(l_quantity, l_extendedprice), 6) AS DOUBLE) AS corr_qty_price,
       CAST(round(covar_samp(l_quantity, l_discount), 6) AS DOUBLE) AS cov_qty_disc
FROM lineitem GROUP BY l_returnflag
""",
)
def rel_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (stddev / correlation / covariance) per
    group — single-pass mergeable accumulators in both engines, so they
    scale like any hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )


# ---------------------------------------------------------------------------
# fuzzy matching (edit-distance typo pairs)
# ---------------------------------------------------------------------------

@register(
    "text_typo_pairs",
    oracle=f"""
WITH vocab AS (
  SELECT DISTINCT unnest({T.tokens_sql('text')}) AS word FROM documents
),
blocked AS (
  SELECT word, substr(word, 1, 1) AS blk, length(word) AS ln FROM vocab
)
SELECT a.word AS word_a, b.word AS word_b,
       CAST(levenshtein(a.word, b.word) AS INTEGER) AS dist
FROM blocked a JOIN blocked b
  ON a.blk = b.blk AND b.ln BETWEEN a.ln - 2 AND a.ln + 2
WHERE a.word < b.word AND levenshtein(a.word, b.word) <= 2
""",
)
def text_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo/variant clustering: vocabulary word pairs within edit distance 2,
    blocked on (first char, length ±2) so the self-join never goes
    quadratic. The blocking trades recall for cost (pairs differing at the
    first character are missed — full recall needs a deletion-neighborhood
    join, documented dial); the OCR/typo normalization step of text
    cleaning."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(T.tokens("text")).alias("word")).distinct()
    )
    blocked = vocab.select(
        "word",
        F.substring("word", 1, 1).alias("blk"),
        F.length("word").alias("ln"),
    )
    a = blocked.select(
        F.col("word").alias("word_a"), "blk", F.col("ln").alias("ln_a")
    )
    b = blocked.select(
        F.col("word").alias("word_b"), "blk", F.col("ln").alias("ln_b")
    )
    return (
        a.join(b, "blk")
        .where(
            (F.col("ln_b") >= F.col("ln_a") - 2)
            & (F.col("ln_b") <= F.col("ln_a") + 2)
            & (F.col("word_a") < F.col("word_b"))
            & (F.levenshtein("word_a", "word_b") <= 2)
        )
        .select(
            "word_a",
            "word_b",
            F.levenshtein("word_a", "word_b").alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# range join (binned interval join)
# ---------------------------------------------------------------------------

@register(
    "events_range_join_clicks",
    oracle="""
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
),
hits AS (
  SELECT e.event_id, count(*) AS n
  FROM errors e JOIN clicks c
    ON e.user_id = c.user_id
   AND c.cts >= e.ts - INTERVAL '10 minutes'
   AND c.cts <  e.ts
  GROUP BY e.event_id
)
SELECT e.event_id, e.user_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS clicks_10m
FROM errors e LEFT JOIN hits h USING (event_id)
""",
)
def events_range_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, binned: for every error event, how many clicks the same
    user made in the preceding 10 minutes (error-attribution shape).

    Spark has no native range join, and the naive theta-join
    (`ON user_id = user_id AND cts BETWEEN ...`) degenerates to a
    broadcast-nested-loop or per-key cross product. The scalable form bins
    time into buckets equal to the window length: each probe row explodes to
    its own bucket plus the previous one (a (t-10min, t) window spans at
    most 2 such buckets), the join becomes a plain equi-join on
    (user_id, bucket) — shuffle ∝ data size, 2× probe fan-out, no
    quadratic blow-up — and the exact range predicate filters residuals
    after the equi-join. A click lands in exactly one bucket, so no
    dedup/double-count is possible. This generalizes to any interval join
    (IP ranges, genomic intervals) with bucket = max interval length.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "10 minutes")["start"]
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", bucket.alias("b0")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), bucket.alias("bin")
    )
    probe = errors.select(
        "event_id",
        "user_id",
        "ts",
        F.explode(
            F.array(F.col("b0"), F.col("b0") - F.expr("INTERVAL 10 MINUTES"))
        ).alias("bin"),
    )
    hits = (
        probe.join(clicks, ["user_id", "bin"])
        .where(
            (F.col("cts") >= F.col("ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("cts") < F.col("ts"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        errors.join(hits, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("clicks_10m"),
        )
    )


# ---------------------------------------------------------------------------
# salted skew join
# ---------------------------------------------------------------------------

@register(
    "rel_salted_skew_join",
    oracle=f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       {_DEC_REVENUE_SQL} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def rel_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-fact join: the anti-skew pattern for a join whose key
    distribution has hot values. The probe side gets a deterministic salt
    (pmod of a row attribute, 8-way); the build side replicates each row
    across all 8 salt values; the join key becomes (key, salt), so one hot
    key's rows spread over 8 reducers instead of one. The result is
    bit-identical to the plain join — proved by the oracle's unsalted SQL.

    At 100 TB you'd salt only the keys above a frequency threshold (AQE's
    skew-join split does the same at runtime); the uniform 8x replication
    here keeps the demo deterministic and oracle-checkable. The salt uses
    l_linenumber, not a hash of the key — salting must distribute ROWS OF
    ONE KEY, which any key-derived value cannot.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    n_salt = 8
    probe = li.withColumn("salt", F.pmod(F.col("l_linenumber"), F.lit(n_salt)))
    build = orders.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    joined = probe.join(
        build,
        (probe["l_orderkey"] == build["o_orderkey"])
        & (probe["salt"] == build["salt"]),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        _dec_revenue().alias("revenue"),
    )


@register(
    "rel_grouping_sets",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_pri,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_st,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
""",
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 completion: explicit GROUPING SETS (two one-dimension slices plus
    the grand total — the non-hierarchical shape cube/rollup can't express
    without computing unwanted combinations). GROUPING() flags distinguish
    'aggregated over' from a genuine NULL group value. One pass, one
    shuffle: Spark expands rows per matching set before the hash aggregate,
    exactly like cube/rollup."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "pv_orders_gsets"
    )
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_pri,
               CAST(grouping(o_orderstatus) AS INT) AS g_st,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM pv_orders_gsets
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """)


@register(
    "rel_custdist_histogram",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def rel_custdist_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): count-per-entity, then a
    histogram of the counts — the double aggregation that profiles long-tail
    engagement (customers with 0 non-urgent orders included via the outer
    join; count(col) skips the NULLs the join fills in).

    Scale shape: shuffle 1 keys c_custkey (fact pre-aggregated map-side),
    shuffle 2 keys the tiny c_count domain — cardinality collapses at each
    step, the opposite of a blow-up. The join-condition filter rides INTO
    the outer join (not a post-filter, which would turn outer into inner).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left_outer",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q10 — returned-item revenue report (top-k customer ranking)
# ---------------------------------------------------------------------------

@register(
    "rel_tpch_q10_returns",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       {_DEC_REVENUE_SQL} AS revenue
FROM customer
JOIN nation   ON n_nationkey = c_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def rel_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item revenue): which customers returned the most
    value in a quarter. Completes the TPC-H trio (Q3 priority, Q5 volume,
    Q13 custdist) with the top-k-after-join-agg shape.

    Scale shape: both selective predicates (returnflag on the fact,
    orderdate on orders) push into their scans BEFORE the one
    orders⋈lineitem shuffle; customer/nation broadcast onto the aggregated
    side. The final order-by-limit is a TakeOrderedAndProject — per
    partition top-20 then a single 20-row merge at the driver, never a
    global sort. Ties at the cut are impossible: (revenue, c_custkey)
    is a total order on customers."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name", "c_acctbal"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_dec_revenue().alias("revenue"))
        .select(
            "c_custkey", "c_name", "n_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H subquery shapes — EXISTS decorrelation, NOT IN, disjunctive
# pushdown, conditional-aggregate ratio (Q4 / Q14 / Q16 / Q19 analogs)
# ---------------------------------------------------------------------------

@register(
    "rel_tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def rel_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in a quarter-pair
    with at least one lineitem shipped >30 days after the order date — the
    canonical correlated EXISTS, decorrelated to a LEFT SEMI join (the
    rewrite Catalyst applies to EXISTS subqueries; here stated directly).
    The fixture lacks l_commitdate/l_receiptdate, so "late" is shipdate
    vs orderdate+30d (same correlated-comparison shape as the original's
    l_commitdate < l_receiptdate; reference has no subqueries at all —
    Tier C breadth).

    Scale shape: the date filter prunes orders BEFORE the semi join, the
    non-equi lateness predicate rides the equi-join on orderkey as a
    residual (never a range explosion), and a semi join carries no
    lineitem payload columns and stops probing an order on first match.
    One shuffle on orderkey; the priority agg is a 5-group hash agg."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "rel_tpch_q14_promo_share",
    oracle=f"""
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
             ELSE 0 END) AS DOUBLE)
       / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
       AS promo_share_pct,
       {_DEC_REVENUE_SQL} AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-06-01'
""",
)
def rel_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the revenue share of PROMO-type
    parts in a shipping quarter — two conditional aggregates folded into
    ONE pass (CASE inside sum), then a scalar ratio. The fixture's p_type
    is a single word, so the original's LIKE 'PROMO%' is equality here.

    Scale shape: one broadcast join (part is the dimension), zero extra
    shuffles — the conditional split costs nothing vs aggregating twice.
    Exactness: both sums are scaled-int64 (cents × discount-hundredths,
    see _dec_revenue) so the single double division at the end is the
    only FP op and is bit-identical across engines and partition orders."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"))
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(0))
    total = F.sum(cents)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0) * promo.cast("double") / total.cast("double")
            ).alias("promo_share_pct"),
            (total / 10000.0).cast("double").alias("total_revenue"),
        )
    )


@register(
    "rel_tpch_q19_disjunctive",
    oracle=f"""
SELECT {_DEC_REVENUE_SQL} AS revenue,
       count(*) AS qualifying_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def rel_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): an OR-of-ANDs predicate whose
    conjuncts span BOTH join sides — the classic disjunctive-pushdown
    test. Catalyst cannot push the cross-side disjunction to either scan,
    but it DOES push each side's projection of it: the brand/size
    disjunction to the part scan and the quantity-range disjunction to
    the lineitem scan (tests/test_plans.py asserts both land in
    PushedFilters). At 100 TB those per-side prefilters are the
    difference between pruning to 3 brands' row groups and scanning the
    whole fact table; the exact cross-side disjunction then runs as the
    post-join residual on the ~100× smaller survivor set."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            _dec_revenue().alias("revenue"),
            F.count("*").alias("qualifying_lineitems"),
        )
    )


@register(
    "rel_tpch_q16_dormant_parts",
    oracle="""
SELECT p_brand, count(*) AS dormant_parts
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                        WHERE l_shipdate >= TIMESTAMP '2001-04-01')
GROUP BY p_brand
ORDER BY p_brand
""",
)
def rel_tpch_q16_dormant_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier exclusion via NOT IN): parts with NO
    shipment since a cutoff — a NOT IN subquery. The oracle states NOT IN
    literally; the engine runs the rewrite every 100 TB plan needs:
    because l_partkey is non-null (guarded explicitly), NOT IN ≡ LEFT
    ANTI join. Raw NOT IN forces Spark into a null-aware anti join — a
    BROADCAST-only plan (null-aware semantics can't shuffle-partition:
    one null on the build side empties the whole result), which caps the
    build side at driver memory. The IS NOT NULL guard is what unlocks
    the shuffleable anti join; at 100 TB that's the difference between
    running and OOM.

    Scale shape: the date prefilter shrinks the build side to the recent
    slice before the anti join; anti joins carry no payload and
    short-circuit per probe key on first match."""
    p = load_table(spark, sf_dir, "part")
    recent = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") >= F.lit("2001-04-01").cast("timestamp"))
        .where(F.col("l_partkey").isNotNull())
        .select("l_partkey")
    )
    return (
        p.join(recent, p.p_partkey == recent.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("dormant_parts"))
        .orderBy("p_brand")
    )


@register(
    "rel_lateral_topk",
    oracle="""
SELECT n.n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name
         LIMIT 2) c
""",
)
def rel_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: for each nation, its top-2 customers by
    account balance, stated as a per-row subquery with ORDER BY + LIMIT —
    the lateral decorrelation path (Catalyst's DecorrelateInnerQuery
    class that rel_subquery_* queries don't reach, because LATERAL
    correlates a whole RELATION, not a scalar).

    Scale shape: the naive reading is "run a sorted limit per outer row";
    the decorrelated plan Catalyst produces is the one a 100 TB run
    needs — the per-row LIMIT becomes a WindowGroupLimit (group-local
    top-k pushed BELOW the shuffle, partial then final, never a global
    sort) + row_number filter partitioned by the correlation key, then
    ONE broadcast equi-join of the 25-row nation side. Stated in SQL on
    both engines; (c_acctbal DESC, c_name) is a total order per nation,
    so the top-2 cut is deterministic."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
        FROM nation n
        JOIN LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) c
        """
    )


@register(
    "rel_tpch_q7_nation_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       {_DEC_REVENUE_SQL} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, o_year
ORDER BY supp_nation, cust_nation, o_year
""",
)
def rel_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): cross-border trade between two
    nations by year — the DUAL-ROLE dimension (nation joined twice under
    different aliases, once for the supplier side, once for the
    customer side) with the symmetric OR-pair residual that cannot
    collapse to either single equi-join. The only §2.3 join shape the
    surface lacked: every prior star query joins each dimension once.

    Scale shape: nation broadcasts twice (two tiny hashed relations —
    dual-role never forces a self-join shuffle); the per-alias halves of
    the OR (n_name IN (N1, N2)) push into each broadcast BEFORE the
    join, so the residual evaluates on the ~2-nation survivor set; the
    one real shuffle stays orders⋈lineitem. Revenue is the scaled-int64
    sum; year() agrees cross-engine under the pinned UTC session."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = n.where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            _dec_revenue().alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("supp_nation", "cust_nation", "o_year")
    )


@register(
    "rel_tpch_q11_important_customers",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(cents / 100.0 AS DOUBLE) AS total_value
FROM per_cust
WHERE cents > (SELECT sum(cents) * 0.001 FROM per_cust)
ORDER BY total_value DESC, o_custkey
""",
)
def rel_tpch_q11_important_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q11 shape (important stock): groups whose aggregate exceeds
    a FRACTION OF THE GLOBAL aggregate of the same relation — the
    HAVING-vs-global-scalar pattern, distinct from
    rel_subquery_above_avg (row-level vs a scalar): here BOTH sides of
    the comparison are aggregates of the same grouped relation, so the
    plan must reuse one aggregation for the groups and broadcast a 1-row
    reaggregation of it for the threshold, never scanning orders twice.

    Exactness: per-customer sums are int64 cents; the threshold is the
    same exact bigint total pushed through identical double arithmetic
    (* 0.001) in both engines, so the > cut is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    per_cust = o.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    threshold = per_cust.agg(
        (F.sum("cents") * 0.001).alias("thr")
    )
    return (
        per_cust.join(F.broadcast(threshold))
        .where(F.col("cents") > F.col("thr"))
        .select(
            "o_custkey",
            (F.col("cents") / 100.0).cast("double").alias("total_value"),
        )
        .orderBy(F.desc("total_value"), "o_custkey")
    )


@register(
    "rel_tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0
            AS DOUBLE) AS revenue,
       count(*) AS qualifying_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def rel_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the revenue that
    would be recovered by eliminating small discounts on low-quantity
    orders in one year — a pure scan-filter-aggregate with THREE
    range predicates and no join, the canonical predicate-pushdown /
    row-group-pruning benchmark (reference has no predicate pushdown at
    all — Tier C breadth).

    Scale shape: every predicate is scan-pushable (date range, discount
    band, quantity cap all land in PushedFilters → parquet min/max
    row-group pruning); the aggregate is a 1-row map-side-combinable
    sum. At 100 TB this query is I/O-bound by exactly the row groups
    the date range admits — the plan has nothing else in it. Revenue is
    the exact cents×discount-hundredths int64 sum (price*discount, Q6's
    definition — not the (1-discount) revenue of Q5/Q14)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        F.col("l_discount") * 100
    ).cast("bigint")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents) / 10000.0).cast("double").alias("revenue"),
            F.count("*").alias("qualifying_lineitems"),
        )
    )


@register(
    "rel_tpch_q8_market_share",
    oracle="""
WITH volumes AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol,
         s.s_nationkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE cn.n_regionkey = 1
)
SELECT o_year,
       CAST(sum(CASE WHEN s_nationkey = 3 THEN vol ELSE 0 END) AS DOUBLE)
       / CAST(sum(vol) AS DOUBLE) AS mkt_share
FROM volumes GROUP BY o_year ORDER BY o_year
""",
)
def rel_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the yearly share of one
    supplier nation's revenue within one customer region's market — a
    five-table star join whose aggregate is a conditional-sum ratio
    (CASE inside sum, the Q14 device, over a grouped year instead of a
    global scalar). Fixture adaptation: no p_type market segment filter
    (the part dimension adds no selectivity here), region stated via
    the customer nation's regionkey.

    Scale shape: orders⋈lineitem is the one fact-fact join (orderkey
    shuffle); customer/nation/supplier broadcast; the region filter
    applies at the nation dimension BEFORE the join, pruning whole
    customer nations from the probe. Both sums are exact int64 revenue
    units aggregated in one pass; the single double division per year
    is the only FP op — bit-identical across engines and partition
    orders."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    vol = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    cust_in_region = cust.join(
        F.broadcast(nation.where(F.col("n_regionkey") == 1)),
        cust.c_nationkey == F.col("n_nationkey"),
        "left_semi",
    )
    volumes = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust_in_region),
            orders.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            "s_nationkey",
        )
    )
    return (
        volumes.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("s_nationkey") == 3, F.col("vol"))
                    .otherwise(0)
                ).cast("double")
                / F.sum("vol").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# multi-touch attribution (staged r7 -> r8)
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_DAYS = 3


@register(
    "events_funnel_attribution",
    oracle=f"""
WITH conv AS (
  SELECT user_id, ts AS conv_ts, event_id AS conv_id
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, ts, event_id, event_type
  FROM events WHERE event_type IN ('click', 'view')
),
pairs AS (
  SELECT t.event_type, t.ts, t.event_id, c.conv_id,
         count(*) OVER (PARTITION BY c.conv_id) AS n_touches,
         row_number() OVER (PARTITION BY c.conv_id
                            ORDER BY t.ts DESC, t.event_id DESC) AS rk
  FROM touch t JOIN conv c
    ON t.user_id = c.user_id
   AND t.ts <= c.conv_ts
   AND t.ts >= c.conv_ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_touch_assignments,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions_reached,
       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch_conversions,
       CAST(sum(CAST(round(1.0 / n_touches, 8) AS DECIMAL(18,8)))
            AS DOUBLE) AS linear_credit
FROM pairs GROUP BY event_type
""",

)
def events_funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: every purchase's credit is assigned to
    the click/view touchpoints in its 3-day lookback
    window under BOTH standard models at once — last-touch (the latest
    touchpoint takes 1.0, (ts, event_id)-tiebroken) and linear (each of
    the n touchpoints takes 1/n) — the marketing-analytics readout that
    decides channel budgets. A touchpoint may serve several conversions
    (standard MTA); conversions with no preceding touch take no credit.

    Exactness: linear credits are round(1/n, 8) DECIMALs (integer n, so
    the quotient is bit-identical cross-engine) summed exactly;
    last-touch counts are integers. Nothing order-dependent.

    Scale shape: one user-keyed range join (per-user touch x conversion
    pairs, bounded by the lookback horizon — the events_range_join_clicks
    shape), one conv_id-keyed window for n/last, one tiny event_type
    aggregate. At 100 TB the range join dominates and partitions cleanly
    by user."""
    e = load_table(spark, sf_dir, "events")
    conv = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("conv_ts"),
        F.col("event_id").alias("conv_id"),
    )
    touch = e.where(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    pairs = touch.join(
        conv,
        (touch["user_id"] == conv["user_id"])
        & (touch["ts"] <= conv["conv_ts"])
        & (
            touch["ts"]
            >= conv["conv_ts"] - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAY")
        ),
    ).select("event_type", "ts", "event_id", "conv_id")
    w_n = Window.partitionBy("conv_id")
    w_rk = Window.partitionBy("conv_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    scored = pairs.select(
        "event_type",
        F.count("*").over(w_n).alias("n_touches"),
        F.row_number().over(w_rk).alias("rk"),
        "conv_id",
    )
    return scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_touch_assignments"),
        F.count_distinct("conv_id").cast("bigint").alias(
            "n_conversions_reached"
        ),
        F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("last_touch_conversions"),
        F.sum(F.round(1.0 / F.col("n_touches"), 8).cast("decimal(18,8)"))
        .cast("double")
        .alias("linear_credit"),
    )
