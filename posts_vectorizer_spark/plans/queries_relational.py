"""Relational core queries over the TPC-H-ish fixture tables.

Covers SURVEY.md §2 ids: S1/S6, P1-P8, J1-J5, A1-A7/A12, W1-W3, L1/L4/L5,
U1/U2, F1-F3/F5-F7/F10-F13. The reference performs these imperatively against
MongoDB (filter/projection pushdown + Python dicts); here each is a single
declarative plan Catalyst optimizes (pushdown/pruning verified via
tests/test_plans.py).

Float discipline (SURVEY.md §7.4-1): money sums are computed in
DECIMAL(18,2) — exact, order-insensitive — then cast to double so both
engines emit bit-identical values; averages are double + round(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import register


def _dec_sum(col: str) -> F.Column:
    """Exact, order-insensitive sum of a 2-decimal money column -> double,
    as a scaled-int64 ("cents") sum: round(x*100) is unambiguous on both
    engines (a 2-decimal double ×100 is within 1e-10 of an integer, never
    at a .5 tie), the int64 sum is exact and order-free, and long-sum
    codegen runs ~2x faster than decimal aggregation (measured at sf0.1:
    0.88s vs 1.68s warm for the Q1 aggregate). Headroom: 6e9 rows × 5e7
    cents ≈ 3e17 < int64 max — safe at 100 TB."""
    return (F.sum(F.round(F.col(col) * 100).cast("bigint")) / 100.0).cast(
        "double"
    )


def _dec_sum_sql(expr: str) -> str:
    return (
        f"CAST(sum(CAST(round(({expr}) * 100) AS BIGINT)) / 100.0 AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# scans / filters / projections
# ---------------------------------------------------------------------------

@register(
    "rel_scan_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_discount > 0.05 AND l_quantity < 10
""",
)
def rel_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1: filtered+projected scan — filters and column pruning reach the
    parquet reader (reference: server-side find(filter, projection),
    worker.py:99)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") > 0.05)
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "rel_case_in_length",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END AS size_class,
       CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS closed_status,
       length(o_orderpriority) AS prio_len
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def rel_case_in_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (IN-list), P6 (CASE), P7 (null-producing conditional), F5 (length)
    — worker.py:90, calculate_idf_scores.py:77, enter_wordvecs.py:36."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("closed_status"),
        F.length("o_orderpriority").alias("prio_len"),
    )


@register(
    "rel_string_funcs",
    oracle="""
SELECT c_custkey,
       lower(c_name) AS name_lower,
       c_mktsegment || ' \n ' || c_name AS seg_concat,
       concat_ws('/', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_path,
       CAST(round(c_acctbal * 2.0 + 1.0 - 0.5, 6) AS DOUBLE) AS bal_math
FROM customer
""",
)
def rel_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (lower), F2 (concat with the reference's exact ' \\n ' separator,
    calculate_idf_scores.py:62), F10 (concat_ws URL-building, worker.py:26),
    F7 (arithmetic)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.concat(F.col("c_mktsegment"), F.lit(" \n "), F.col("c_name")).alias(
            "seg_concat"
        ),
        F.concat_ws("/", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias(
            "seg_path"
        ),
        F.round(F.col("c_acctbal") * 2.0 + 1.0 - 0.5, 6).cast("double").alias("bal_math"),
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

@register(
    "rel_groupby_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_dec_sum_sql('l_quantity')} AS sum_qty,
       {_dec_sum_sql('l_extendedprice')} AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       CAST(round(avg(l_quantity), 6) AS DOUBLE) AS avg_qty,
       CAST(round(avg(l_discount), 6) AS DOUBLE) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def rel_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (A1/A3 hash aggregation with partial+final combine —
    the reference's dict-accumulator aggregation, worker.py:42-46, at engine
    scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity").alias("sum_qty"),
            _dec_sum("l_extendedprice").alias("sum_base_price"),
            # Quantize each factor to its own integer grid BEFORE
            # multiplying (cents × discount-hundredths): the int64 product
            # sum is exact ten-thousandths — same value as the decimal
            # form, at long-sum codegen speed.
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                    * (
                        F.lit(100)
                        - F.round(F.col("l_discount") * 100).cast("bigint")
                    )
                )
                / 10000.0
            ).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).cast("double").alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).cast("double").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "rel_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: multi-granularity stats via CUBE (north-star analytics surface;
    no reference analog — SURVEY.md §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _dec_sum("l_quantity").alias("sum_qty")
    )


@register(
    "rel_rollup_dates",
    oracle="""
SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS order_year,
       CAST(date_part('month', o_orderdate) AS BIGINT) AS order_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (order_year, order_month)
""",
)
def rel_rollup_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 + F13: ROLLUP over calendar hierarchy (year, month) — date scalar
    functions are Tier-C (no reference semantics, SURVEY.md §1.3)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            "o_totalprice",
        )
        .rollup("order_year", "order_month")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "rel_date_trunc_agg",
    oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
GROUP BY 1, 2
""",
)
def rel_date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: date_trunc bucketing + grouped aggregation (time-series rollup)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            "o_orderstatus",
        )
        .agg(F.count("*").alias("n"), _dec_sum("o_totalprice").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

@register(
    "rel_join_broadcast_agg",
    oracle=f"""
SELECT c.c_mktsegment, n.n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       {_dec_sum_sql('o.o_totalprice')} AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY c.c_mktsegment, n.n_name
""",
)
def rel_join_broadcast_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: equi-joins with explicitly broadcast dimension tables (the
    reference's $in vocab lookup, worker.py:57, as a hash join). customer and
    nation are dims -> broadcast; orders streams through unshuffled until the
    final partial+final agg."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count("*").alias("n_orders"), _dec_sum("o_totalprice").alias("revenue"))
    )


@register(
    "rel_join_semi",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
)
def rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: LEFT SEMI membership join (the `if token in vocabs` filter,
    calculate_idf_scores.py:48-50)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "rel_join_anti",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: LEFT ANTI complement (the OOV-token skip, worker.py:80-81)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "rel_join_outer_fill",
    oracle="""
SELECT c.c_custkey,
       CAST(COALESCE(cnt.n_orders, 0) AS BIGINT) AS n_orders
FROM customer c
LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) cnt
       ON c.c_custkey = cnt.o_custkey
""",
)
def rel_join_outer_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: LEFT OUTER join + COALESCE-to-zero (the known/total pairing that
    known_tokens_ratio needs, worker.py:52,91)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cnt = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (
        c.join(cnt, c.c_custkey == cnt.o_custkey, "left")
        .select("c_custkey", F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
    )


@register(
    "rel_scalar_broadcast",
    oracle="""
SELECT o_orderkey, o_totalprice,
       CAST(round(o_totalprice / max(o_totalprice) OVER (), 6) AS DOUBLE)
         AS price_share_of_max
FROM orders
WHERE o_orderstatus = 'F'
""",
)
def rel_scalar_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/W2: one global scalar applied to every row (the min_idf broadcast,
    calculate_idf_scores.py:76-77). Implemented as a broadcast cross join of
    the 1-row aggregate, NOT an unpartitioned window — a global window
    funnels every row through a single partition, which dies at 100 TB; the
    broadcast plan keeps the fact side fully parallel."""
    o = load_table(spark, sf_dir, "orders")
    f_orders = o.where(F.col("o_orderstatus") == "F")
    mx = f_orders.agg(F.max("o_totalprice").alias("max_price"))
    return f_orders.crossJoin(F.broadcast(mx)).select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") / F.col("max_price"), 6)
        .cast("double")
        .alias("price_share_of_max"),
    )


# ---------------------------------------------------------------------------
# windows / sort / limit / top-k
# ---------------------------------------------------------------------------

@register(
    "rel_window_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""",
)
def rel_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/L5: top-k per group via ranking window with deterministic tiebreak
    (north-star similarity-search output shape, SURVEY.md §2.5)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "rel_window_running",
    oracle="""
SELECT user_id, event_id, value,
       CAST(round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
            AS DOUBLE) AS running_value,
       lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS prev_type
FROM events
WHERE user_id < 10
""",
)
def rel_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + analytic functions: running sum frame + lag (per-group ordered
    state — the pattern behind sessionization)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.where(F.col("user_id") < 10).select(
        "user_id",
        "event_id",
        "value",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6
        ).cast("double").alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@register(
    "rel_orderby_limit",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def rel_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1/L4: deterministic global top-N (cursor.limit, worker.py:108, made
    deterministic with a total order — Spark plans this as TakeOrdered, no
    full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

@register(
    "rel_union_distinct_except",
    oracle="""
WITH hi AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000),
     lo AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice < 5000),
     both_sides AS (SELECT custkey FROM hi INTERSECT SELECT custkey FROM lo)
SELECT custkey, 'union' AS src FROM (SELECT custkey FROM hi UNION SELECT custkey FROM lo)
EXCEPT
SELECT custkey, 'union' AS src FROM both_sides
""",
)
def rel_union_distinct_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2: UNION (distinct), INTERSECT, EXCEPT — customers with only-high
    or only-low orders (symmetric difference)."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.where(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey")
    )
    lo = o.where(F.col("o_totalprice") < 5000).select(
        F.col("o_custkey").alias("custkey")
    )
    both = hi.intersect(lo)
    return (
        hi.unionByName(lo)
        .distinct()
        .withColumn("src", F.lit("union"))
        .exceptAll(both.withColumn("src", F.lit("union")))
    )


# ---------------------------------------------------------------------------
# json / pivot
# ---------------------------------------------------------------------------

@register(
    "rel_json_extract",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
            AS DOUBLE) AS avg_k
FROM events
GROUP BY event_type
""",
)
def rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: JSON field extraction from a string column (the HTTP payload
    parse, worker.py:28) + aggregation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 6).cast("double").alias("avg_k"),
        )
    )


@register(
    "rel_pivot",
    oracle="""
SELECT user_id,
       CAST(round(COALESCE(sum(value) FILTER (WHERE event_type = 'click'), 0), 6) AS DOUBLE) AS click,
       CAST(round(COALESCE(sum(value) FILTER (WHERE event_type = 'view'), 0), 6) AS DOUBLE) AS "view",
       CAST(round(COALESCE(sum(value) FILTER (WHERE event_type = 'purchase'), 0), 6) AS DOUBLE) AS purchase
FROM events
WHERE user_id < 20
GROUP BY user_id
""",
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) with an explicit value list — avoids the
    extra distinct-values job and keeps the schema static for the oracle.
    Missing (user, type) cells are NULL out of the pivot; filled to 0 to
    match the oracle's COALESCE."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.where(F.col("user_id") < 20)
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.round(F.sum("value"), 6).cast("double"))
        .na.fill(0.0, ["click", "view", "purchase"])
    )


@register(
    "rel_subquery_above_avg",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
""",
)
def rel_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate (Catalyst rewrites to a broadcast of the
    1-row aggregate — the decorrelation class of §4 O12)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
        """
    )


@register(
    "rel_unpivot_stack",
    oracle="""
SELECT l_orderkey, l_linenumber, metric,
       CAST(amount AS DOUBLE) AS amount
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
  FROM lineitem WHERE l_orderkey < 100
)
UNPIVOT (amount FOR metric IN (l_extendedprice, l_discount, l_tax))
""",
)
def rel_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long) via the native unpivot/melt — the inverse of
    rel_pivot, used to normalize per-metric columns into (metric, amount)
    rows before generic per-metric aggregation. Row-local expansion: no
    shuffle, 3x fan-out, codegen'd."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey", "l_linenumber",
            "l_extendedprice", "l_discount", "l_tax",
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_extendedprice", "l_discount", "l_tax"],
            "metric",
            "amount",
        )
        .select(
            "l_orderkey", "l_linenumber", "metric",
            F.col("amount").cast("double").alias("amount"),
        )
    )


@register(
    "rel_nullsafe_join",
    oracle="""
WITH flags AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN NULL ELSE doc_id % 2 END AS flag
  FROM documents
),
ref AS (
  SELECT * FROM (VALUES (NULL, 'missing'), (0, 'even'), (1, 'odd'))
       AS t(flag, label)
)
SELECT f.doc_id, r.label
FROM flags f JOIN ref r ON f.flag IS NOT DISTINCT FROM r.flag
""",
)
def rel_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of vanishing — the semantics needed when NULL is a
    legitimate category (unknown lang, missing label) that must still find
    its dimension row. Spark plans <=> as a hash join key like any equality,
    so the broadcast dim-join shape survives."""
    docs = load_table(spark, sf_dir, "documents")
    flags = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("doc_id") % 2)
        .alias("flag"),
    )
    ref = docs.sparkSession.createDataFrame(
        [(None, "missing"), (0, "even"), (1, "odd")], "flag long, label string"
    )
    return flags.join(
        F.broadcast(ref), flags["flag"].eqNullSafe(ref["flag"])
    ).select("doc_id", "label")


@register(
    "rel_window_frames",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(round(avg(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS DOUBLE)
         AS avg_last3,
       first_value(o_orderpriority) OVER w AS first_pri,
       last_value(o_orderpriority) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_pri,
       nth_value(o_orderpriority, 2) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_pri
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def rel_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame completeness: an explicit ROWS sliding frame (trailing
    3-row average) plus first/last/nth value over the full-partition frame.
    last/nth need the UNBOUNDED FOLLOWING frame spelled out — the default
    frame stops at CURRENT ROW, a classic silent-wrong-answer trap in both
    engines. Deterministic ordering via the (date, key) tie-break."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    ordered = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    sliding = ordered.rowsBetween(-2, Window.currentRow)
    full = ordered.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.avg("o_totalprice").over(sliding), 6)
        .cast("double")
        .alias("avg_last3"),
        F.first("o_orderpriority").over(ordered).alias("first_pri"),
        F.last("o_orderpriority").over(full).alias("last_pri"),
        F.nth_value("o_orderpriority", 2).over(full).alias("second_pri"),
    )


@register(
    "rel_array_agg_sorted",
    oracle="""
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations,
       CAST(count(*) AS INTEGER) AS n
FROM nation GROUP BY n_regionkey
""",
)
def rel_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with a deterministic order: collect_list's arrival
    order is partition-dependent (never comparable), so the contract sorts
    the collected array — the only portable form of array_agg. The checked
    column is the sorted array joined to one string: the driver's
    canonicalizer hashes column VALUES and a nested array<string> is
    unhashable in pandas (r2's one red row), so the contract emits the
    hashable serialization; the true nested-array form is pinned by
    tests/test_oracle.py::test_array_agg_nested_form."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
            "nations"
        ),
        F.count("*").cast("int").alias("n"),
    )


_HIST_LO, _HIST_HI, _HIST_N = 900.0, 105000.0, 20

_HIST_BUCKET_SQL = f"""
CASE WHEN l_extendedprice < {_HIST_LO} THEN 0
     WHEN l_extendedprice >= {_HIST_HI} THEN {_HIST_N + 1}
     ELSE CAST(floor((l_extendedprice - {_HIST_LO})
               / (({_HIST_HI} - {_HIST_LO}) / {_HIST_N})) AS BIGINT) + 1 END
"""


@register(
    "rel_histogram_equi_width",
    oracle=f"""
SELECT {_HIST_BUCKET_SQL} AS bucket,
       count(*) AS n,
       CAST(round(min(l_extendedprice), 2) AS DOUBLE) AS lo,
       CAST(round(max(l_extendedprice), 2) AS DOUBLE) AS hi
FROM lineitem
GROUP BY 1
""",
)
def rel_histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (width_bucket semantics, spelled as explicit
    arithmetic because DuckDB has no width_bucket — under/overflow land in
    buckets 0 and n+1) — the value-distribution profile a pipeline runs
    before choosing clip bounds or partition ranges. Bucketing is a pure
    row-local expression: one scan, one tiny-keyed aggregate; data-driven
    bounds would come from a broadcast 1-row min/max aggregate, same as
    the engine's other scalar patterns."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    bucket = (
        F.when(x < _HIST_LO, F.lit(0))
        .when(x >= _HIST_HI, F.lit(_HIST_N + 1))
        .otherwise(
            F.floor(
                (x - _HIST_LO) / ((_HIST_HI - _HIST_LO) / _HIST_N)
            ).cast("bigint")
            + 1
        )
    )
    return (
        li.select(bucket.alias("bucket"), "l_extendedprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).cast("double").alias("lo"),
            F.round(F.max("l_extendedprice"), 2).cast("double").alias("hi"),
        )
    )


@register(
    "rel_map_type_ops",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
),
totals AS (
  SELECT user_id, sum(n) AS total FROM counts GROUP BY user_id
)
SELECT c.user_id, c.event_type, CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
FROM counts c JOIN totals t USING (user_id)
WHERE c.n >= 2
""",
)
def rel_map_type_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type higher-order functions in one plan: per user the
    event-type histogram is materialized as a MAP column
    (map_from_entries over collected structs), pruned with map_filter
    (types seen < 2 drop), reshaped with transform_values (count ->
    share of the user's total), and exploded back to rows — the
    map-column manipulation surface (map_from_entries / map_filter /
    transform_values / explode) a feature-store pipeline uses for
    per-entity feature bags. The oracle states the same result
    relationally, so the entire map round-trip is hash-checked; share is
    one exact integer division (bit-identical doubles).

    Scale shape: one user-keyed aggregation (map per user bounded by
    #event-types, never event count), then narrow map ops in codegen and
    a map_entries explode — no extra shuffle."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    total = F.aggregate(
        F.map_values("m"), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    shaped = as_map.select(
        "user_id",
        F.transform_values(
            F.map_filter("m", lambda k, v: v >= 2),
            lambda k, v: F.struct(
                v.alias("n"),
                (v.cast("double") / total.cast("double")).alias("share"),
            ),
        ).alias("m"),
    )
    return shaped.select(
        "user_id", F.explode("m").alias("event_type", "val")
    ).select(
        "user_id",
        "event_type",
        F.col("val.n").cast("bigint").alias("n"),
        F.col("val.share").alias("share"),
    )


@register(
    "rel_variant_json",
    oracle="""
SELECT o_orderkey,
       o_orderstatus AS status,
       CAST(o_totalprice AS DOUBLE) AS price,
       o_orderpriority AS priority,
       CAST(NULL AS DOUBLE) AS status_as_double
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
""",
)
def rel_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured round-trip (F14 family, Spark 4's native
    answer to the reference's JSON payload handling, worker.py:28): rows
    serialize to JSON, parse into the binary VARIANT encoding, and typed
    fields extract back via variant_get — the oracle recomputes the same
    columns straight from the table, so a hash match proves the
    round-trip is lossless. try_variant_get with a deliberately wrong
    target type ('$.o_orderstatus' as double) pins the null-not-error
    contract ANSI mode would otherwise break.

    Scale: at 100 TB the win over stringly JSON is that VARIANT parses
    ONCE at ingest into a binary form whose field reads are O(field),
    not O(re-parse); this whole pipeline is one narrow codegen'd pass —
    no shuffle, no UDF."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    payload = F.to_json(
        F.struct("o_orderstatus", "o_totalprice", "o_orderpriority")
    )
    v = o.select("o_orderkey", F.parse_json(payload).alias("v"))
    return v.select(
        "o_orderkey",
        F.variant_get("v", "$.o_orderstatus", "string").alias("status"),
        F.variant_get("v", "$.o_totalprice", "double").alias("price"),
        F.variant_get("v", "$.o_orderpriority", "string").alias("priority"),
        F.try_variant_get("v", "$.o_orderstatus", "double").alias(
            "status_as_double"
        ),
    ).orderBy("o_orderkey")


@register(
    "rel_xml_extract",
    oracle="""
SELECT o_orderkey,
       o_orderstatus AS status,
       CAST(o_totalprice AS DOUBLE) AS price
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
""",
)
def rel_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion (S6/F14 family): order rows rendered as XML documents,
    parsed back with from_xml against an explicit schema, fields
    extracted from the resulting struct. The oracle recomputes the same
    columns from the base table — a hash match proves parse-extract is
    lossless. DuckDB has no XML type, which is exactly why the oracle
    states the ROUND-TRIP property instead of replicating the parser.

    Scale: from_xml is a codegen'd expression over the string column —
    one narrow pass, the same shape as the JSON path; schema-on-read
    keeps the scan prunable to the xml column only."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    xml = F.concat(
        F.lit("<order><status>"), F.col("o_orderstatus"),
        F.lit("</status><price>"), F.col("o_totalprice").cast("string"),
        F.lit("</price></order>"),
    )
    parsed = o.select(
        "o_orderkey",
        F.from_xml(xml, "status STRING, price DOUBLE").alias("r"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("r.status").alias("status"),
        F.col("r.price").alias("price"),
    ).orderBy("o_orderkey")
